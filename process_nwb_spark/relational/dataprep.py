"""Training-corpus preparation operators on `documents`: deterministic
splits, stratified rebalancing, token-aware sequence packing, and
train/test contamination checks.

These are the corpus-assembly stages a large-scale training-data pipeline
runs after cleaning/dedup (llm_ops.py): decide which rows train, rebalance
over-represented strata, pack documents into fixed-token context windows,
and prove the held-out split is not leaked into train.

Cross-engine determinism: all randomness is md5-hash-derived (same trick as
llm_ops.py), so assignments are a pure function of the row key — stable
under reruns, resumable, and identical in Spark and the DuckDB oracle.

Scale notes (100 TB):
- split/sample are NARROW projections/filters — zero shuffle, and the
  filter sits directly on the scan so column pruning + predicate pushdown
  apply. This is why hash-splits beat `randomSplit` at scale: no global
  sample, no seed-ordering dependency, and adding data never reassigns
  existing rows.
- packing windows are PARTITIONED BY source — parallel across strata; no
  global single-partition window. Capacity arithmetic is a running sum,
  i.e. one shuffle on the partition key, same as any keyed window.
- contamination is an equi-join on the shingle hash: both sides are
  pre-deduped (DISTINCT) before the join, bounding fan-out; the train side
  is agg'd to a set of keys, so the join is key-key, not key-rows.
"""
from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .core import T, query, spread
from .llm_ops import _GOPHER_FLAGS_SQL, _SHINGLE_SQL, _shingles_df

# --- md5-derived bucket in [0, 256): first two hex nibbles of md5(key) ----
_HEX = "0123456789abcdef"


def _bucket(col):
    """Spark: 0..255 bucket from the first md5 byte of a string column."""
    return F.conv(F.substring(F.md5(col), 1, 2), 16, 10).cast("int")


def _bucket_sql(expr: str) -> str:
    """DuckDB equivalent (no CONV there): positional hex-digit arithmetic."""
    return (f"((STRPOS('{_HEX}', SUBSTR(MD5({expr}), 1, 1)) - 1) * 16"
            f" + (STRPOS('{_HEX}', SUBSTR(MD5({expr}), 2, 1)) - 1))")


_SPLIT_KEY = "CAST(doc_id AS VARCHAR) || ':split'"
_SPLIT_CASE = ("CASE WHEN bucket < 230 THEN 'train' "
               "WHEN bucket < 243 THEN 'valid' ELSE 'test' END")


def _with_split(df):
    """doc frame + (bucket, split) derived purely from doc_id."""
    key = F.concat(F.col("doc_id").cast("string"), F.lit(":split"))
    return (df.withColumn("bucket", _bucket(key))
              .withColumn("split",
                          F.when(F.col("bucket") < 230, "train")
                           .when(F.col("bucket") < 243, "valid")
                           .otherwise("test")))


# --------------------------------------------------------------------------
# Deterministic train/valid/test split
# --------------------------------------------------------------------------
@query(
    "split_train_test",
    f"""
    SELECT doc_id, bucket, {_SPLIT_CASE} AS split
    FROM (SELECT doc_id, {_bucket_sql(_SPLIT_KEY)} AS bucket
          FROM documents) t
    """,
    doc="deterministic ~90/5/5 train/valid/test split: md5(doc_id) bucket "
        "in [0,256) -> threshold CASE. Pure narrow projection (no shuffle, "
        "no RNG state); appending new docs never reassigns old ones",
)
def split_train_test(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    return _with_split(d.select("doc_id")).select("doc_id", "bucket", "split")


# --------------------------------------------------------------------------
# Stratified rebalancing sample
# --------------------------------------------------------------------------
_LANG_THRESH = {"en": 128, "de": 192, "fr": 192, "es": 192, "zh": 256}
_DEFAULT_THRESH = 256  # unknown strata kept whole

_SAMPLE_KEY = "CAST(doc_id AS VARCHAR) || ':sample'"
_THRESH_CASE_SQL = ("CASE lang " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in _LANG_THRESH.items())
    + f" ELSE {_DEFAULT_THRESH} END")


@query(
    "sample_stratified",
    f"""
    SELECT doc_id, lang, source
    FROM (SELECT doc_id, lang, source,
                 {_bucket_sql(_SAMPLE_KEY)} AS bucket,
                 {_THRESH_CASE_SQL} AS thresh
          FROM documents) t
    WHERE bucket < thresh
    """,
    doc="stratified downsampling of over-represented languages: keep en at "
        "50%, de/fr/es at 75%, zh at 100% via per-stratum hash-bucket "
        "thresholds. Narrow filter on the scan — the deterministic, "
        "restart-safe form of df.sampleBy()",
)
def sample_stratified(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    key = F.concat(F.col("doc_id").cast("string"), F.lit(":sample"))
    thresh = F.lit(_DEFAULT_THRESH)
    for lang, t in _LANG_THRESH.items():
        thresh = F.when(F.col("lang") == lang, t).otherwise(thresh)
    return (d.select("doc_id", "lang", "source",
                     _bucket(key).alias("bucket"), thresh.alias("thresh"))
             .filter(F.col("bucket") < F.col("thresh"))
             .select("doc_id", "lang", "source"))


# --------------------------------------------------------------------------
# Token-aware sequence packing
# --------------------------------------------------------------------------
_PACK_CAPACITY = 2048


@query(
    "pack_sequences",
    f"""
    WITH tok AS (
      SELECT doc_id, source,
             CAST(LEN(REGEXP_EXTRACT_ALL(text, '\\w+')) AS INT) AS n_tokens
      FROM documents
    )
    SELECT doc_id, source, n_tokens,
           CAST((SUM(n_tokens) OVER (PARTITION BY source ORDER BY doc_id
                                     ROWS UNBOUNDED PRECEDING)
                 - n_tokens) // {_PACK_CAPACITY} AS BIGINT) AS pack_id
    FROM tok
    """,
    doc=f"sequence packing: assign docs to {_PACK_CAPACITY}-token context "
        "windows by cumulative token count within each source (running-sum "
        "binning — the scalable approximation of first-fit, which is "
        "inherently sequential). Window PARTITIONED BY source, so packing "
        "parallelizes across strata instead of one global sort",
)
def pack_sequences(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    n_tok = F.regexp_count("text", F.lit(r"\w+")).alias("n_tokens")
    w = (Window.partitionBy("source").orderBy("doc_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    tok = d.select("doc_id", "source", n_tok)
    cum_before = F.sum("n_tokens").over(w) - F.col("n_tokens")
    return tok.select(
        "doc_id", "source", "n_tokens",
        F.floor(cum_before / _PACK_CAPACITY).cast("long").alias("pack_id"))


# --------------------------------------------------------------------------
# Train/test contamination check
# --------------------------------------------------------------------------
@query(
    "split_contamination",
    f"""
    WITH sh AS ({_SHINGLE_SQL}),
    tagged AS (
      SELECT sh.doc_id, sh.sh, {_SPLIT_CASE} AS split
      FROM (SELECT doc_id, sh,
                   {_bucket_sql(_SPLIT_KEY)} AS bucket FROM sh) sh
    ),
    train_sh AS (SELECT DISTINCT sh FROM tagged WHERE split = 'train'),
    test_sh AS (SELECT doc_id, sh FROM tagged WHERE split = 'test')
    SELECT t.doc_id,
           CAST(COUNT(*) AS INT) AS n_shingles,
           CAST(COUNT(tr.sh) AS INT) AS n_shared,
           ROUND(COUNT(tr.sh) / CAST(COUNT(*) AS DOUBLE), 4) AS contamination
    FROM test_sh t LEFT JOIN train_sh tr ON t.sh = tr.sh
    GROUP BY t.doc_id
    """,
    doc="decontamination audit: fraction of each TEST doc's word-3-gram "
        "shingles that also occur anywhere in TRAIN. Split is recomputed "
        "inline from doc_id (pure function — no join against the split "
        "assignment). Both join sides are pre-deduped shingle keys, so the "
        "equi-join on sh is key-to-key with bounded fan-out",
)
def split_contamination(spark, sf_dir):
    sh = _with_split(_shingles_df(spark, sf_dir))
    train_sh = sh.filter(F.col("split") == "train").select("sh").distinct()
    test_sh = sh.filter(F.col("split") == "test").select("doc_id", "sh")
    return contamination_fold(test_sh, train_sh)


def contamination_fold(test_sh, train_sh):
    """Per-test-doc contamination report from the two shingle SETS:
    `test_sh` = distinct (doc_id, sh) pairs of test documents,
    `train_sh` = distinct train shingle values. LEFT equi-join on the
    pre-deduped shingle key (key-to-key, bounded fan-out), then one
    hash-agg per test doc. SHARED VERBATIM by split_contamination and
    the streaming contamination_sink, so the live report cannot drift
    from the batch audit's definition."""
    joined = test_sh.join(train_sh.select("sh")
                          .withColumn("in_train", F.lit(1)),
                          "sh", "left")
    return joined.groupBy("doc_id").agg(
        F.count("*").cast("int").alias("n_shingles"),
        F.count("in_train").cast("int").alias("n_shared"),
        F.round(F.count("in_train") / F.count("*").cast("double"), 4)
         .alias("contamination"))


# --------------------------------------------------------------------------
# Changeset apply (MERGE / CDC upsert as a join program)
# --------------------------------------------------------------------------
def apply_changeset(snapshot, changes, key: str, payload: str):
    """MERGE semantics over plain tables: apply a CDC changeset
    (op in {'U','I','D'}, one row per key) to a snapshot.

    matched + op U/I -> take the change's payload; matched + op D -> drop
    the row; unmatched change (op I) -> insert; otherwise keep snapshot.
    One full-outer join shuffled on the key — the standard CDC-apply plan;
    when the changeset is small Spark broadcasts it and the snapshot never
    shuffles. This is what `MERGE INTO` lowers to on engines without
    row-level-update storage (plain parquet); rewriting the result
    partition-wise IS the upsert.
    """
    ch = changes.select(F.col(key).alias("_k"),
                        F.col(payload).alias("_new"), "op")
    joined = snapshot.join(ch, snapshot[key] == ch["_k"], "full_outer")
    kept = joined.filter((F.col("op").isNull()) | (F.col("op") != "D"))
    return kept.select(
        F.coalesce(snapshot[key], F.col("_k")).alias(key),
        F.round(F.when(F.col("op").isin("U", "I"), F.col("_new"))
                .otherwise(snapshot[payload]), 2).alias(payload))


_MERGE_SQL = """
    WITH changes AS (
        SELECT c_custkey AS k,
               CASE WHEN c_custkey % 13 = 0 THEN NULL
                    ELSE c_acctbal + 100 END AS new_bal,
               CASE WHEN c_custkey % 13 = 0 THEN 'D' ELSE 'U' END AS op
        FROM customer
        WHERE c_custkey % 13 = 0 OR c_custkey % 10 = 0
        UNION ALL
        SELECT c_custkey + 1000000, 50.0, 'I'
        FROM customer WHERE c_custkey % 97 = 0
    )
    SELECT COALESCE(s.c_custkey, c.k) AS c_custkey,
           ROUND(CASE WHEN c.op IN ('U', 'I') THEN c.new_bal
                      ELSE s.c_acctbal END, 2) AS c_acctbal
    FROM customer s
    FULL OUTER JOIN changes c ON s.c_custkey = c.k
    WHERE c.op IS NULL OR c.op <> 'D'
"""


@query(
    "merge_upsert_changeset",
    _MERGE_SQL,
    doc="MERGE/upsert as a CDC changeset apply (apply_changeset): "
        "updates (+100 to every 10th key), deletes (every 13th, which "
        "wins when both match), inserts (shifted keys). Asserted "
        "semantics: deleted keys absent, updated keys carry new values, "
        "inserted keys appear, everything else passes through untouched",
)
def merge_upsert_changeset(spark, sf_dir):
    cust = T(spark, sf_dir, "customer")
    k = F.col("c_custkey")
    changes = (cust.filter((k % 13 == 0) | (k % 10 == 0))
               .select(k.alias("c_custkey"),
                       F.when(k % 13 == 0, F.lit(None).cast("double"))
                       .otherwise(F.col("c_acctbal") + 100)
                       .alias("c_acctbal"),
                       F.when(k % 13 == 0, "D").otherwise("U").alias("op"))
               .unionAll(cust.filter(k % 97 == 0)
                         .select((k + 1000000).alias("c_custkey"),
                                 F.lit(50.0).alias("c_acctbal"),
                                 F.lit("I").alias("op"))))
    return apply_changeset(cust.select("c_custkey", "c_acctbal"), changes,
                           "c_custkey", "c_acctbal")


# --------------------------------------------------------------------------
# Scalable global row index (distributed zipWithIndex)
# --------------------------------------------------------------------------
def global_index(df, key: str, n_buckets: int = 32):
    """Assign a dense 1-based global index ordered by `key` WITHOUT the
    single-partition global window (row_number over an unpartitioned
    ORDER BY collapses every row onto one reducer — the classic scale
    killer).

    Plan: (1) driver collects min/max of the key (column-pruned scan,
    parquet stats make it near-free); (2) width_bucket derives a
    deterministic range bucket per row; (3) row_number runs per-bucket
    (one hash shuffle on ~n_buckets keys, all reducers busy); (4) bucket
    offsets come from a partially-aggregated count (shuffles n_buckets
    rows, cumsum over a n_buckets-row window is driver-scale) and
    broadcast-join back. Net: ONE full-data shuffle + a metadata-sized
    side plan, vs zipWithIndex's RDD hop or orderBy's 1-partition sort.
    """
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    lo, hi = df.agg(F.min(key), F.max(key)).first()
    if lo is None:  # empty input: keep the schema, emit no rows
        return df.withColumn("global_idx", F.lit(None).cast("bigint"))
    b = df.withColumn(
        "_b", F.width_bucket(F.col(key), F.lit(lo), F.lit(hi + 1),
                             F.lit(n_buckets)))
    local = F.row_number().over(Window.partitionBy("_b").orderBy(key))
    counts = b.groupBy("_b").agg(F.count("*").alias("_n"))
    woff = (Window.orderBy("_b")
            .rowsBetween(Window.unboundedPreceding, -1))
    offsets = counts.select(
        "_b", F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off"))
    return (b.join(F.broadcast(offsets), "_b")
            .withColumn("global_idx", F.col("_off") + local)
            .drop("_b", "_off"))


@query(
    "global_row_index",
    """
    SELECT c_custkey, c_name,
           ROW_NUMBER() OVER (ORDER BY c_custkey) AS global_idx
    FROM customer
    """,
    doc="distributed zipWithIndex: dense global index ordered by key via "
        "range-bucketed per-bucket row_number + broadcast bucket offsets "
        "(global_index()). The oracle is the semantic spec — ROW_NUMBER "
        "over a global ORDER BY — which DuckDB can afford single-node; "
        "the Spark plan never funnels rows through one partition. Used "
        "for stable example ids when sharding a 100 TB corpus",
)
def global_row_index(spark, sf_dir):
    cust = T(spark, sf_dir, "customer").select("c_custkey", "c_name")
    return global_index(cust, "c_custkey")


@query(
    "scd2_status_history",
    """
    WITH flagged AS (
        SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
               CASE WHEN LAG(o_orderstatus) OVER w IS NULL
                      OR LAG(o_orderstatus) OVER w <> o_orderstatus
                    THEN 1 ELSE 0 END AS chg
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    changes AS (
        SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey
        FROM flagged WHERE chg = 1
    )
    SELECT o_custkey AS custkey, o_orderstatus AS status,
           STRFTIME(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS valid_from,
           STRFTIME(LEAD(CAST(o_orderdate AS DATE)) OVER
                        (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey), '%Y-%m-%d')
               AS valid_to,
           CASE WHEN LEAD(o_orderdate) OVER
                        (PARTITION BY o_custkey
                         ORDER BY o_orderdate, o_orderkey) IS NULL
                THEN 1 ELSE 0 END AS is_current
    FROM changes
    """,
    doc="SCD type-2 dimension build: collapse each customer's order-status "
        "history into validity intervals [valid_from, valid_to) with an "
        "is_current flag. Gaps-and-islands: lag() flags status changes, "
        "the no-change rows drop, lead() closes each interval — both "
        "window passes share one custkey shuffle (the filter preserves "
        "partitioning, so the second Window adds no exchange). The "
        "warehouse-standard history table from an append-only changelog, "
        "no MERGE storage needed (cf. merge_upsert_changeset for the "
        "snapshot-apply form)",
)
def scd2_status_history(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderstatus").over(w)
    changes = (o.select("o_custkey", "o_orderstatus", "o_orderdate",
                        "o_orderkey")
               .withColumn("chg", F.when(prev.isNull()
                                         | (prev != F.col("o_orderstatus")), 1)
                           .otherwise(0))
               .filter(F.col("chg") == 1))
    nxt = F.lead(F.col("o_orderdate").cast("date")).over(w)
    return changes.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderstatus").alias("status"),
        F.date_format(F.col("o_orderdate").cast("date"), "yyyy-MM-dd")
         .alias("valid_from"),
        F.date_format(nxt, "yyyy-MM-dd").alias("valid_to"),
        F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"))


@query(
    "scd2_point_in_time",
    """
    WITH flagged AS (
        SELECT o_custkey, o_orderstatus, o_orderdate, o_orderkey,
               CASE WHEN LAG(o_orderstatus) OVER w IS NULL
                      OR LAG(o_orderstatus) OVER w <> o_orderstatus
                    THEN 1 ELSE 0 END AS chg
        FROM orders
        WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    ),
    scd AS (
        SELECT o_custkey AS custkey, o_orderstatus AS status,
               o_orderdate AS valid_from,
               COALESCE(LEAD(o_orderdate) OVER
                            (PARTITION BY o_custkey
                             ORDER BY o_orderdate, o_orderkey),
                        TIMESTAMP '9999-12-31') AS valid_to
        FROM flagged WHERE chg = 1
    )
    SELECT e.user_id, e.event_id, s.status AS status_at_event
    FROM events e
    JOIN scd s
      ON e.user_id = s.custkey
     AND e.ts + INTERVAL 9125 DAY >= s.valid_from
     AND e.ts + INTERVAL 9125 DAY < s.valid_to
    WHERE e.event_type = 'purchase'
    """,
    doc="point-in-time (temporal) join: each purchase event is enriched "
        "with the customer's order-status SCD2 interval in force at event "
        "time (events are 2024, order history 1995-2001, so event time is "
        "shifted back 9125 days = 25 years to overlap — the mechanics, "
        "not the calendar, are the point). Equi half (user = custkey) "
        "carries the shuffle; the interval containment is a residual "
        "range predicate evaluated inside the hash join, never a "
        "cross-product — the standard fact-to-history lookup at scale "
        "(cf. join_asof for the nearest-key form)",
)
def scd2_point_in_time(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    prev = F.lag("o_orderstatus").over(w)
    scd = (o.select("o_custkey", "o_orderstatus", "o_orderdate", "o_orderkey")
           .withColumn("chg", F.when(prev.isNull()
                                     | (prev != F.col("o_orderstatus")), 1)
                       .otherwise(0))
           .filter(F.col("chg") == 1)
           .select(F.col("o_custkey").alias("custkey"),
                   F.col("o_orderstatus").alias("status"),
                   F.col("o_orderdate").alias("valid_from"),
                   F.coalesce(F.lead("o_orderdate").over(
                       Window.partitionBy("o_custkey")
                       .orderBy("o_orderdate", "o_orderkey")),
                       F.lit("9999-12-31").cast("timestamp"))
                   .alias("valid_to")))
    e = (T(spark, sf_dir, "events")
         .filter(F.col("event_type") == "purchase")
         .withColumn("ts_shift", F.col("ts") + F.expr("INTERVAL 9125 DAYS")))
    return (e.join(scd, (e.user_id == scd.custkey)
                   & (e.ts_shift >= scd.valid_from)
                   & (e.ts_shift < scd.valid_to))
            .select("user_id", "event_id",
                    F.col("status").alias("status_at_event")))


@query(
    "dq_audit",
    """
    SELECT 'lineitem_null_orderkey' AS check_name,
           CAST((SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NULL)
                AS BIGINT) AS n_violations
    UNION ALL
    SELECT 'lineitem_dangling_order',
           CAST((SELECT COUNT(*) FROM lineitem l
                 WHERE NOT EXISTS (SELECT 1 FROM orders o
                                   WHERE o.o_orderkey = l.l_orderkey))
                AS BIGINT)
    UNION ALL
    SELECT 'orders_duplicate_pk',
           CAST((SELECT COUNT(*) FROM (SELECT o_orderkey FROM orders
                 GROUP BY o_orderkey HAVING COUNT(*) > 1) d) AS BIGINT)
    UNION ALL
    SELECT 'lineitem_discount_domain',
           CAST((SELECT COUNT(*) FROM lineitem
                 WHERE l_discount < 0 OR l_discount > 1) AS BIGINT)
    UNION ALL
    SELECT 'events_value_negative',
           CAST((SELECT COUNT(*) FROM events WHERE value < 0) AS BIGINT)
    """,
    doc="Deequ-style data-quality audit as one query: completeness (null "
        "keys), referential integrity (lineitem -> orders LEFT ANTI), "
        "primary-key uniqueness, value-domain checks — each a "
        "column-pruned aggregate, unioned into a (check_name, "
        "n_violations) report. The FK check is the only shuffle (anti "
        "join on the key, bloom-prunable); everything else partially "
        "aggregates to a scalar map-side. The pre-training gate a corpus "
        "pipeline runs before shipping a snapshot",
)
def dq_audit(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    o = T(spark, sf_dir, "orders")
    e = T(spark, sf_dir, "events")

    def one(name, df):
        return df.select(F.lit(name).alias("check_name"),
                         F.count("*").cast("bigint").alias("n_violations"))

    dangling = li.join(o, li.l_orderkey == o.o_orderkey, "left_anti")
    dup_pk = (o.groupBy("o_orderkey").count()
              .filter(F.col("count") > 1))
    checks = [
        one("lineitem_null_orderkey", li.filter(F.col("l_orderkey").isNull())),
        one("lineitem_dangling_order", dangling),
        one("orders_duplicate_pk", dup_pk),
        one("lineitem_discount_domain",
            li.filter((F.col("l_discount") < 0) | (F.col("l_discount") > 1))),
        one("events_value_negative", e.filter(F.col("value") < 0)),
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out.unionAll(c)
    return out


@query(
    "fuzzy_match_blocked",
    """
    WITH probes AS (
        SELECT p_partkey AS probe_id,
               SUBSTR(p_name, 1, 2) || SUBSTR(p_name, 4) AS probe_name
        FROM part WHERE p_partkey % 50 = 0
    )
    SELECT pr.probe_id, pr.probe_name, p.p_partkey AS match_key,
           p.p_name AS match_name,
           LEVENSHTEIN(pr.probe_name, p.p_name) AS dist
    FROM probes pr
    JOIN part p ON SUBSTR(pr.probe_name, 1, 2) = SUBSTR(p.p_name, 1, 2)
    WHERE LEVENSHTEIN(pr.probe_name, p.p_name) <= 1
    """,
    doc="entity resolution / fuzzy record linkage with blocking: probe "
        "names (deterministic one-char-deletion typos of every 50th part "
        "name) match against the catalog by levenshtein <= 1, but ONLY "
        "inside 2-char-prefix blocks — the equi-join on the block key "
        "carries the shuffle and the O(n^2) edit-distance comparison "
        "runs per block, never across the full cross product. The "
        "standard blocked-similarity-join shape; block key choice is the "
        "recall/cost knob at 100 TB",
)
def fuzzy_match_blocked(spark, sf_dir):
    p = T(spark, sf_dir, "part")
    probes = (p.filter(F.col("p_partkey") % 50 == 0)
              .select(F.col("p_partkey").alias("probe_id"),
                      F.concat(F.substring("p_name", 1, 2),
                               F.expr("substring(p_name, 4)"))
                      .alias("probe_name")))
    cand = probes.join(
        p, F.substring(F.col("probe_name"), 1, 2)
        == F.substring(F.col("p_name"), 1, 2))
    dist = F.levenshtein("probe_name", "p_name")
    return (cand.filter(dist <= 1)
            .select("probe_id", "probe_name",
                    F.col("p_partkey").alias("match_key"),
                    F.col("p_name").alias("match_name"),
                    dist.alias("dist")))


@query(
    "dq_benford_digits",
    """
    WITH digits AS (
        SELECT CAST(SUBSTR(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR),
                           1, 1) AS INT) AS d
        FROM orders WHERE o_totalprice >= 1
    )
    SELECT d AS first_digit, COUNT(*) AS n,
           ROUND(COUNT(*) / CAST((SELECT COUNT(*) FROM digits) AS DOUBLE),
                 4) AS observed_freq,
           ROUND(LOG10(1.0 + 1.0 / d), 4) AS benford_freq
    FROM digits
    GROUP BY d
    """,
    doc="Benford first-digit profile: distribution of leading digits of "
        "order totals against the Benford expectation log10(1 + 1/d) — "
        "the forensic screen for fabricated or truncated numeric columns. "
        "Digit extraction is a narrow string projection; the profile is "
        "one 9-bucket partial aggregate plus a scalar-subquery total "
        "(computed once, broadcast), so the audit costs a single scan at "
        "any corpus size. Complements dq_audit's rule checks with a "
        "distributional one",
)
def dq_benford_digits(spark, sf_dir):
    o = T(spark, sf_dir, "orders").filter(F.col("o_totalprice") >= 1)
    digits = o.select(
        F.substring(F.floor("o_totalprice").cast("bigint").cast("string"),
                    1, 1).cast("int").alias("d"))
    # total as an IN-PLAN broadcast scalar (window over the 9-row bucket
    # aggregate), not a driver-side count() — the eager count added a full
    # extra orders scan to every construction of this query
    from pyspark.sql.window import Window as _W

    return (digits.groupBy(F.col("d").alias("first_digit"))
            .agg(F.count("*").alias("n"))
            .withColumn("_total", F.sum("n").over(
                _W.partitionBy(F.lit(1))))
            .select("first_digit", "n",
                    F.round(F.col("n") / F.col("_total").cast("double"), 4)
                     .alias("observed_freq"),
                    F.round(F.log10(1.0 + 1.0 / F.col("first_digit")), 4)
                     .alias("benford_freq")))


# --------------------------------------------------------------------------
# Data-mixture rebalancing to target proportions
# --------------------------------------------------------------------------
_MIX_TARGETS = {"en": 0.4, "de": 0.2, "fr": 0.2, "es": 0.1, "zh": 0.1}
_MIX_KEY = "CAST(doc_id AS VARCHAR) || ':mix'"
_MIX_TGT_SQL = ("CASE lang " + " ".join(
    f"WHEN '{k}' THEN {v}" for k, v in _MIX_TARGETS.items()) + " END")


@query(
    "mix_to_target_weights",
    f"""
    WITH counts AS (SELECT lang, COUNT(*) AS c FROM documents GROUP BY lang),
    sized AS (
        SELECT lang, c, {_MIX_TGT_SQL} AS tgt,
               (SELECT MIN(c / ({_MIX_TGT_SQL.replace("lang", "c2.lang")}))
                FROM counts c2) AS out_size
        FROM counts
    ),
    rates AS (SELECT lang, tgt * out_size / c AS rate FROM sized)
    SELECT d.doc_id, d.lang
    FROM documents d JOIN rates r ON d.lang = r.lang
    WHERE {_bucket_sql(_MIX_KEY)} < r.rate * 256
    """,
    doc="data-mixture rebalancing: given target corpus proportions per "
        "language (en .4 / de .2 / fr .2 / es .1 / zh .1), the achievable "
        "output size is bounded by the scarcest stratum "
        "(min count/target); per-stratum keep-rates follow and rows are "
        "kept by deterministic md5-bucket threshold — so the mix is "
        "append-stable and restart-safe, unlike rate-based randomSplit. "
        "The rate table is strata-sized (broadcast); the filter is a "
        "narrow scan projection. This is the mixture step a training "
        "pipeline runs AFTER curation to hit its target data recipe "
        "(cf. sample_stratified's fixed thresholds)",
)
def mix_to_target_weights(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    counts = d.groupBy("lang").agg(F.count("*").alias("c"))
    tgt = F.lit(None).cast("double")
    for k, v in _MIX_TARGETS.items():
        tgt = F.when(F.col("lang") == k, v).otherwise(tgt)
    sized = counts.withColumn("tgt", tgt)
    rates = (sized.crossJoin(F.broadcast(
        sized.agg(F.min(F.col("c") / F.col("tgt")).alias("out_size"))))
        .select("lang",
                (F.col("tgt") * F.col("out_size") / F.col("c"))
                .alias("rate")))
    key = F.concat(F.col("doc_id").cast("string"), F.lit(":mix"))
    return (d.join(F.broadcast(rates), "lang")
            .filter(_bucket(key) < F.col("rate") * 256)
            .select("doc_id", "lang"))


@query(
    "snapshot_diff",
    """
    WITH old AS (
        SELECT doc_id, md5(text) AS h FROM documents WHERE doc_id % 7 <> 0
    ),
    new AS (
        SELECT doc_id,
               md5(CASE WHEN doc_id % 11 = 0 THEN text || ' edited'
                        ELSE text END) AS h
        FROM documents WHERE doc_id % 5 <> 0
    )
    SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
           CASE WHEN o.doc_id IS NULL THEN 'added'
                WHEN n.doc_id IS NULL THEN 'removed'
                ELSE 'changed' END AS change
    FROM old o FULL OUTER JOIN new n ON o.doc_id = n.doc_id
    WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.h <> n.h
    """,
    doc="snapshot diffing: two corpus snapshots (deterministically carved "
        "from documents — rows leave, rows arrive, every 11th text is "
        "edited) compare by content hash in one full-outer key join, "
        "emitting the added/removed/changed changeset. The INVERSE of "
        "merge_upsert_changeset (which applies one): diff derives the "
        "feed that incremental consumers replay, and only 16-byte hashes "
        "ride the join — never document bodies. Unchanged rows drop "
        "before the output, so result size tracks churn, not corpus size",
)
def snapshot_diff(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    old = (d.filter(F.col("doc_id") % 7 != 0)
           .select("doc_id", F.md5("text").alias("h")))
    new = (d.filter(F.col("doc_id") % 5 != 0)
           .select("doc_id",
                   F.md5(F.when(F.col("doc_id") % 11 == 0,
                                F.concat(F.col("text"), F.lit(" edited")))
                         .otherwise(F.col("text"))).alias("h")))
    o, n = old.alias("o"), new.alias("n")
    return (o.join(n, F.col("o.doc_id") == F.col("n.doc_id"), "full_outer")
            .filter(F.col("o.doc_id").isNull() | F.col("n.doc_id").isNull()
                    | (F.col("o.h") != F.col("n.h")))
            .select(F.coalesce(F.col("o.doc_id"), F.col("n.doc_id"))
                    .alias("doc_id"),
                    F.when(F.col("o.doc_id").isNull(), "added")
                    .when(F.col("n.doc_id").isNull(), "removed")
                    .otherwise("changed").alias("change")))


@query(
    "agg_entropy_mix",
    """
    WITH counts AS (
        SELECT source, lang, COUNT(*) AS c FROM documents GROUP BY 1, 2
    ),
    tot AS (SELECT source, SUM(c) AS t FROM counts GROUP BY source)
    SELECT c.source,
           CAST(COUNT(*) AS INT) AS n_langs,
           ROUND(-SUM((c.c / CAST(t.t AS DOUBLE))
                      * LOG2(c.c / CAST(t.t AS DOUBLE))), 4)
               AS lang_entropy_bits
    FROM counts c JOIN tot t ON c.source = t.source
    GROUP BY c.source
    """,
    doc="Shannon entropy of each source's language mix: two nested "
        "partially-aggregated counts (both shuffle O(sources x langs) "
        "after map-side combine), then -sum(p log2 p). The diversity "
        "profile a corpus dashboard tracks per snapshot — near-zero "
        "entropy flags a source collapsing to one language",
)
def agg_entropy_mix(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    counts = d.groupBy("source", "lang").agg(F.count("*").alias("c"))
    tot = counts.groupBy("source").agg(F.sum("c").alias("t"))
    p = F.col("c") / F.col("t").cast("double")
    return (counts.join(F.broadcast(tot), "source")
            .groupBy("source")
            .agg(F.count("*").cast("int").alias("n_langs"),
                 F.round(-F.sum(p * F.log2(p)), 4)
                  .alias("lang_entropy_bits")))


@query(
    "dq_profile_columns",
    """
    WITH src AS (
      SELECT col_name, x FROM (
        SELECT 'l_quantity' AS col_name, CAST(l_quantity AS DOUBLE) AS x
        FROM lineitem
        UNION ALL
        SELECT 'l_extendedprice', CAST(l_extendedprice AS DOUBLE)
        FROM lineitem
        UNION ALL
        SELECT 'l_discount', CAST(l_discount AS DOUBLE) FROM lineitem
        UNION ALL
        SELECT 'l_tax', CAST(l_tax AS DOUBLE) FROM lineitem)
    )
    SELECT col_name, COUNT(*) AS n_rows,
           CAST(COUNT(*) - COUNT(x) AS BIGINT) AS n_null,
           COUNT(DISTINCT x) AS n_distinct,
           ROUND(MIN(x), 4) AS min_v, ROUND(MAX(x), 4) AS max_v,
           ROUND(AVG(x), 4) AS avg_v
    FROM src GROUP BY col_name
    """,
    doc="one-scan multi-column data profile (the dashboard a table "
        "publisher checks before promoting a snapshot): stack() unpivots "
        "the four numeric lineitem measures inside a single Expand node — "
        "ONE parquet scan feeds all column profiles, vs the naive "
        "per-column loop that rescans the fact N times. min/max/avg/nulls "
        "partially aggregate map-side; COUNT(DISTINCT x) is the one "
        "expensive term (exact here for oracle parity — at 100 TB swap "
        "approx_count_distinct, same plan shape minus the distinct "
        "expand). The oracle replays it as 4 UNION ALL scans, which is "
        "exactly the rescan shape the Spark plan avoids",
)
def dq_profile_columns(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    stacked = li.select(F.expr(
        "stack(4, "
        "'l_quantity', CAST(l_quantity AS DOUBLE), "
        "'l_extendedprice', CAST(l_extendedprice AS DOUBLE), "
        "'l_discount', CAST(l_discount AS DOUBLE), "
        "'l_tax', CAST(l_tax AS DOUBLE)) AS (col_name, x)"))
    return (stacked.groupBy("col_name")
            .agg(F.count("*").alias("n_rows"),
                 (F.count("*") - F.count("x")).cast("bigint").alias("n_null"),
                 F.countDistinct("x").alias("n_distinct"),
                 F.round(F.min("x"), 4).alias("min_v"),
                 F.round(F.max("x"), 4).alias("max_v"),
                 F.round(F.avg("x"), 4).alias("avg_v")))


# --------------------------------------------------------------------------
# Upsample materialization: replicate under-represented strata
# --------------------------------------------------------------------------
# lang -> (whole copies, extra-copy md5 threshold out of 256); the
# fractional part of the target weight becomes a deterministic per-doc coin.
_UPSAMPLE = {"en": (1, 0), "zh": (1, 192), "es": (2, 0),
             "de": (2, 128), "fr": (3, 64)}


@query(
    "mix_upsample_repeat",
    f"""
    WITH planned AS (
      SELECT doc_id, lang,
             CASE lang WHEN 'en' THEN 1 WHEN 'zh' THEN 1 WHEN 'es' THEN 2
                       WHEN 'de' THEN 2 WHEN 'fr' THEN 3 END
             + CASE WHEN {_bucket_sql("CAST(doc_id AS VARCHAR) || ':up'")}
                    < CASE lang WHEN 'en' THEN 0 WHEN 'zh' THEN 192
                                WHEN 'es' THEN 0 WHEN 'de' THEN 128
                                WHEN 'fr' THEN 64 END
                    THEN 1 ELSE 0 END AS n_copies
      FROM documents
    )
    SELECT doc_id, lang, CAST(UNNEST(RANGE(1, n_copies + 1)) AS INT)
             AS copy_no
    FROM planned
    """,
    doc="data-mixture UPSAMPLING materialized: each document is "
        "replicated n_copies times where n_copies = floor(weight) plus a "
        "deterministic md5-coin for the fractional part (weights en 1.0 / "
        "zh 1.75 / es 2.0 / de 2.5 / fr 3.25 — the epochs-per-source "
        "dial of a training-mix spec). The replication is "
        "explode(sequence(1, n)) — a narrow Generate with NO shuffle and "
        "no data copy until the exploded rows are consumed downstream, "
        "which is exactly how oversampling should ship at 100 TB: the "
        "scan stays 1x, the fan-out happens inside the same stage as the "
        "consumer, and the copy ordinal rides along so downstream "
        "shuffles can decorrelate replicas (e.g. salt by copy_no). "
        "Complements mix_to_target_weights, which only DOWN-samples",
)
def mix_upsample_repeat(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    base = F.lit(None).cast("int")
    thresh = F.lit(None).cast("int")
    for lang, (b, t) in _UPSAMPLE.items():
        base = F.when(F.col("lang") == lang, b).otherwise(base)
        thresh = F.when(F.col("lang") == lang, t).otherwise(thresh)
    key = F.concat(F.col("doc_id").cast("string"), F.lit(":up"))
    n_copies = base + F.when(_bucket(key) < thresh, 1).otherwise(0)
    return (d.select("doc_id", "lang", n_copies.alias("n_copies"))
            .select("doc_id", "lang",
                    F.explode(F.sequence(F.lit(1), F.col("n_copies")))
                     .alias("copy_no"))
            .withColumn("copy_no", F.col("copy_no").cast("int")))


@query(
    "dq_ks_drift",
    """
    WITH g AS (
      SELECT value,
             SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS c1,
             SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS c2
      FROM events WHERE event_type IN ('view', 'click')
      GROUP BY value
    ),
    cum AS (
      SELECT SUM(c1) OVER (ORDER BY value) AS s1,
             SUM(c2) OVER (ORDER BY value) AS s2
      FROM g
    ),
    tot AS (
      SELECT CAST(SUM(c1) AS DOUBLE) AS n1, CAST(SUM(c2) AS DOUBLE) AS n2
      FROM g
    )
    SELECT ROUND(MAX(ABS(s1 / n1 - s2 / n2)), 6) AS ks_d,
           CAST(n1 AS BIGINT) AS n_view, CAST(n2 AS BIGINT) AS n_click
    FROM cum CROSS JOIN tot
    GROUP BY n1, n2
    """,
    doc="two-sample Kolmogorov-Smirnov distance between the value "
        "distributions of two event types — the distribution-drift gate "
        "behind 'did this release change user behavior' and trainset-vs-"
        "prod feature monitoring. One conditional-count aggregate "
        "collapses events to DISTINCT VALUES (the only rows the ECDF can "
        "step at), the empirical CDFs are cumulative sums over that "
        "bounded value table (state = distinct values, not events — the "
        "global ordered window never sees raw data), and D = max|F1-F2|. "
        "All inputs to the division are exact integers, so both engines "
        "compute bit-identical ECDF steps",
)
def dq_ks_drift(spark, sf_dir):
    e = (T(spark, sf_dir, "events")
         .filter(F.col("event_type").isin("view", "click")))
    g = e.groupBy("value").agg(
        F.sum(F.when(F.col("event_type") == "view", 1).otherwise(0))
         .alias("c1"),
        F.sum(F.when(F.col("event_type") == "click", 1).otherwise(0))
         .alias("c2"))
    tot = g.agg(F.sum("c1").cast("double").alias("n1"),
                F.sum("c2").cast("double").alias("n2"))
    w = Window.orderBy("value").rowsBetween(Window.unboundedPreceding, 0)
    cum = g.select(F.sum("c1").over(w).alias("s1"),
                   F.sum("c2").over(w).alias("s2"))
    return (cum.crossJoin(F.broadcast(tot))
            .groupBy("n1", "n2")
            .agg(F.round(F.max(F.abs(F.col("s1") / F.col("n1")
                                     - F.col("s2") / F.col("n2"))), 6)
                 .alias("ks_d"))
            .select("ks_d", F.col("n1").cast("bigint").alias("n_view"),
                    F.col("n2").cast("bigint").alias("n_click")))


@query(
    "agg_chi2_independence",
    """
    WITH cells AS (
      SELECT lang, source, CAST(COUNT(*) AS DOUBLE) AS n
      FROM documents GROUP BY lang, source
    ),
    m AS (
      SELECT lang, source, n,
             SUM(n) OVER (PARTITION BY lang) AS rt,
             SUM(n) OVER (PARTITION BY source) AS ct,
             SUM(n) OVER () AS nn
      FROM cells
    )
    SELECT ROUND(SUM(POW(n - (rt * ct) / nn, 2) / ((rt * ct) / nn)), 4)
             AS chi2,
           CAST((COUNT(DISTINCT lang) - 1) * (COUNT(DISTINCT source) - 1)
                AS BIGINT) AS dof,
           CAST(SUM(n) AS BIGINT) AS n_docs
    FROM m
    """,
    doc="chi-square test of independence for lang x source — 'is language "
        "mix the same across sources', the categorical complement of "
        "abtest_conversion_z and the balance check a corpus-mixing stage "
        "runs before training. The contingency table is ONE partial "
        "aggregate over the facts; row/column/grand totals are window "
        "sums over the BOUNDED cell table (|langs| x |sources| rows, "
        "never the corpus), and the statistic folds in a final "
        "single-row aggregate. Expected counts keep the same "
        "floating-point shape ((rt*ct)/nn) on both engines",
)
def agg_chi2_independence(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    cells = (d.groupBy("lang", "source")
             .agg(F.count("*").cast("double").alias("n")))
    m = (cells
         .withColumn("rt", F.sum("n").over(Window.partitionBy("lang")))
         .withColumn("ct", F.sum("n").over(Window.partitionBy("source")))
         .withColumn("nn", F.sum("n").over(
             Window.partitionBy(F.lit(1)))))
    exp = (F.col("rt") * F.col("ct")) / F.col("nn")
    return m.agg(
        F.round(F.sum(F.pow(F.col("n") - exp, 2) / exp), 4).alias("chi2"),
        ((F.countDistinct("lang") - 1) * (F.countDistinct("source") - 1))
        .cast("bigint").alias("dof"),
        F.sum("n").cast("bigint").alias("n_docs"))


# --------------------------------------------------------------------------
# Z-order layout locality (operators/layout.py face)
# --------------------------------------------------------------------------
_EPOCH0 = 1704067200  # 2024-01-01 00:00:00 UTC — events start here


def zorder_quantize_events(e):
    """The face's quantization recipe, shared with tests and the demo so
    the three cannot drift: user_id scaled into the 16-bit domain (439 is
    coprime to 65536 — injective for <=65536 users) and minute-of-month.
    Returns an (xq, yq) projection of an events DataFrame."""
    xq = ((F.col("user_id") * 439).bitwiseAND(F.lit(65535)).cast("int"))
    yq = F.expr(f"CAST((unix_timestamp(ts) - {_EPOCH0}) DIV 60 AS INT)")
    return e.select(xq.alias("xq"), yq.alias("yq"))


def _zorder_oracle() -> str:
    from ..operators.layout import zorder_key_sql
    x = "((user_id * 439) & 65535)"
    y = f"(((epoch_us(ts) // 1000000) - {_EPOCH0}) // 60)"
    z = zorder_key_sql(x, y)
    return f"""
    SELECT bucket, COUNT(*) AS n,
           MIN(xq) AS min_x, MAX(xq) AS max_x,
           MIN(yq) AS min_y, MAX(yq) AS max_y
    FROM (SELECT ({z}) >> 26 AS bucket, {x} AS xq, {y} AS yq
          FROM events) t
    GROUP BY bucket
    """


@query(
    "layout_zorder_locality",
    _zorder_oracle(),
    doc="Morton/Z-order clustering stats: events quantized to "
        "(user_id scaled to the 16-bit domain, minute-of-month), "
        "bit-interleaved into a "
        "32-bit key (operators/layout.py — pure shiftleft/and/or inside "
        "whole-stage codegen, no UDF), bucketed by the key's top 6 bits. "
        "Per bucket the min/max of BOTH dimensions are bounded rectangles "
        "(each z-prefix is a 2^13 x 2^13 tile) — the invariant that makes "
        "parquet min/max stats prune scans filtered on EITHER dimension "
        "after write_zordered lays files out by key range. Every column "
        "is integer bit arithmetic — bit-identical across engines",
)
def layout_zorder_locality(spark, sf_dir):
    from ..operators.layout import zorder_key

    q = zorder_quantize_events(T(spark, sf_dir, "events"))
    return (q.withColumn("bucket", F.shiftright(
                zorder_key(F.col("xq"), F.col("yq")), 26))
            .groupBy("bucket")
            .agg(F.count("*").alias("n"),
                 F.min("xq").alias("min_x"), F.max("xq").alias("max_x"),
                 F.min("yq").alias("min_y"), F.max("yq").alias("max_y")))


@query(
    "mix_temperature_weights",
    """
    WITH counts AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS c FROM documents GROUP BY lang
    ),
    arrs AS (
      SELECT LIST(c ORDER BY lang) AS cs, SUM(c) AS n FROM counts
    ),
    den AS (
      SELECT n, LIST_SUM(LIST_TRANSFORM(cs,
                 x -> SQRT(CAST(x AS DOUBLE) / n))) AS d
      FROM arrs
    )
    SELECT lang, c AS n_docs,
           ROUND(CAST(c AS DOUBLE) / n, 6) AS share,
           ROUND(SQRT(CAST(c AS DOUBLE) / n) / d, 6) AS temp_share,
           ROUND(SQRT(CAST(c AS DOUBLE) / n) / d
                 / (CAST(c AS DOUBLE) / n), 4) AS boost
    FROM counts CROSS JOIN den
    """,
    doc="temperature-based mixture reweighting at T=2 — the standard "
        "multilingual recipe (sample language i with probability "
        "p_i^(1/T) / sum_j p_j^(1/T)) that upweights low-resource strata "
        "without the hard caps of explicit targets "
        "(cf. mix_to_target_weights). 1/T = 0.5 makes the exponent a "
        "SQRT, which IEEE-754 requires to be correctly rounded — unlike "
        "libm POWER, which differs across engines — so the face is "
        "hash-exact; the denominator sum_j sqrt(p_j) is an ORDERED fold "
        "over the lang-sorted stratum list (strata-sized, one row) "
        "because a 5-element float SUM could still flip a last ulp "
        "between engines. One fact-scan groupBy; everything after is "
        "arithmetic on the broadcast stratum table. `boost` is the "
        "effective upsample factor temp_share/share a sampler would "
        "apply per stratum",
)
def mix_temperature_weights(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    # cached: the strata-sized count table feeds both the denominator fold
    # and the output rows; uncached, Spark would scan+aggregate the corpus
    # twice (self-referencing branches are not deduped)
    counts = (d.groupBy("lang").agg(F.count("*").cast("bigint").alias("c"))
              .cache())
    den = (counts
           .agg(F.array_sort(F.collect_list(F.struct("lang", "c")))
                .alias("arr"),
                F.sum("c").alias("n"))
           .select("n",
                   F.aggregate(
                       F.col("arr"), F.lit(0.0),
                       lambda acc, x: acc
                       + F.sqrt(x["c"].cast("double") / F.col("n")))
                   .alias("d")))
    p = F.col("c").cast("double") / F.col("n")
    w = F.sqrt(p) / F.col("d")
    return (counts.crossJoin(F.broadcast(den))
            .select("lang", F.col("c").alias("n_docs"),
                    F.round(p, 6).alias("share"),
                    F.round(w, 6).alias("temp_share"),
                    F.round(w / p, 4).alias("boost")))


@query(
    "layout_compaction_plan",
    """
    WITH shards AS (
      SELECT lang, source, CAST(SUM(n_chars) AS BIGINT) AS bytes,
             CAST(COUNT(*) AS BIGINT) AS n_docs
      FROM documents GROUP BY lang, source
    ),
    placed AS (
      SELECT lang, source, bytes, n_docs,
             CAST(COALESCE(SUM(bytes) OVER (ORDER BY lang, source
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum_before
      FROM shards
    )
    SELECT CAST(cum_before // 60000 AS BIGINT) AS file_id,
           CAST(COUNT(*) AS BIGINT) AS n_shards,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(SUM(bytes) AS BIGINT) AS total_bytes,
           ROUND(CAST(SUM(bytes) AS DOUBLE) / 60000.0, 6) AS fill_ratio
    FROM placed GROUP BY 1 ORDER BY file_id
    """,
    doc="small-file compaction planning — the lakehouse-ops step between "
        "source_file_lineage (which files are small) and write_zordered "
        "(how rows lay out inside them): shard-level size stats are "
        "sorted on the layout key and banded into target-size output "
        "files by cumulative-capacity cut (SUM OVER preceding, integer-"
        "DIV by the 60 KB target) — the deterministic sort-and-chunk "
        "strategy production compactors (Delta OPTIMIZE, Iceberg "
        "rewrite_data_files bin-pack) apply, expressed as one window + "
        "one groupBy. Integer division is written as explicit DIV in "
        "BOTH engines: plain '/' is double division in each, but "
        "Spark's double->bigint cast truncates while DuckDB's ROUNDS — "
        "a silent cross-engine off-by-one-file divergence this face "
        "deliberately sidesteps. Sorting by the layout key (not FFD) "
        "keeps key locality inside output files, so data-skipping "
        "min/max stats stay tight after compaction; fill_ratio is the "
        "auditable packing quality",
)
def layout_compaction_plan(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    shards = (d.groupBy("lang", "source")
              .agg(F.sum("n_chars").cast("bigint").alias("bytes"),
                   F.count("*").cast("bigint").alias("n_docs")))
    run = (Window.orderBy("lang", "source")
           .rowsBetween(Window.unboundedPreceding, -1))
    placed = shards.withColumn(
        "cum_before",
        F.coalesce(F.sum("bytes").over(run), F.lit(0)).cast("bigint"))
    return (placed
            .withColumn("file_id", F.expr("cum_before div 60000")
                        .cast("bigint"))
            .groupBy("file_id")
            .agg(F.count("*").cast("bigint").alias("n_shards"),
                 F.sum("n_docs").cast("bigint").alias("n_docs"),
                 F.sum("bytes").cast("bigint").alias("total_bytes"))
            .select("file_id", "n_shards", "n_docs", "total_bytes",
                    F.round(F.col("total_bytes").cast("double")
                            / F.lit(60000.0), 6).alias("fill_ratio"))
            .orderBy("file_id"))


@query(
    "dq_key_skew_profile",
    """
    WITH pairs AS (
      SELECT 'l_orderkey' AS key_col, l_orderkey AS v FROM lineitem
      UNION ALL SELECT 'l_partkey', l_partkey FROM lineitem
      UNION ALL SELECT 'l_suppkey', l_suppkey FROM lineitem
    ),
    byval AS (
      SELECT key_col, v, CAST(COUNT(*) AS BIGINT) AS c
      FROM pairs GROUP BY key_col, v
    )
    SELECT key_col,
           CAST(SUM(c) AS BIGINT) AS n_rows,
           CAST(COUNT(*) AS BIGINT) AS n_distinct,
           CAST(MAX(c) AS BIGINT) AS top_cnt,
           ROUND(CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE), 6)
             AS top_share,
           CAST(SUM(c) AS BIGINT) // COUNT(*) AS mean_rows_per_key
    FROM byval GROUP BY key_col
    """,
    doc="join-key skew profile: rows, exact NDV, hottest-key count/share "
        "and mean rows-per-key for each candidate join column of the "
        "fact table — THE query a 100 TB pipeline runs BEFORE choosing "
        "between plain shuffle, AQE skew split, and manual salting "
        "(bench_skew measures the strategies; this face is how you pick "
        "per key). One corpus pass: the columns fan out row-locally into "
        "(key_col, value) pairs inside the scan stage, the per-value "
        "count folds map-side on the (key_col, value) shuffle, and the "
        "profile re-agg is NDV-sized. top_share is one double division "
        "of exact integers — deterministic, no order pinning",
)
def dq_key_skew_profile(spark, sf_dir):
    li = T(spark, sf_dir, "lineitem")
    pairs = li.select(F.explode(F.array(*[
        F.struct(F.lit(c).alias("key_col"),
                 F.col(c).cast("bigint").alias("v"))
        for c in ("l_orderkey", "l_partkey", "l_suppkey")])).alias("p")
    ).select("p.key_col", "p.v")
    byval = pairs.groupBy("key_col", "v").agg(
        F.count("*").cast("bigint").alias("c"))
    return (byval.groupBy("key_col")
            .agg(F.sum("c").cast("bigint").alias("n_rows"),
                 F.count("*").cast("bigint").alias("n_distinct"),
                 F.max("c").cast("bigint").alias("top_cnt"))
            .select("key_col", "n_rows", "n_distinct", "top_cnt",
                    F.round(F.col("top_cnt").cast("double")
                            / F.col("n_rows").cast("double"), 6)
                    .alias("top_share"),
                    F.expr("n_rows div n_distinct")
                    .alias("mean_rows_per_key")))


@query(
    "dq_freshness_lag",
    """
    WITH per_type AS (
      SELECT event_type,
             MAX(EPOCH_US(ts)) AS last_us,
             CAST(COUNT(*) AS BIGINT) AS n_events
      FROM events GROUP BY event_type
    ),
    ref AS (SELECT MAX(last_us) AS ref_us FROM per_type)
    SELECT event_type, n_events,
           CAST((ref_us - last_us) // 3600000000 AS BIGINT)
             AS hours_behind,
           (ref_us - last_us) <= 24 * 3600000000 AS fresh_24h
    FROM per_type CROSS JOIN ref
    """,
    doc="data-freshness monitor: per-stream lag behind the newest event "
        "in the feed (the corpus high-water mark stands in for now() so "
        "the face is deterministic — a deployment binds the reference to "
        "the clock) with an integer hours-behind and a 24 h SLA boolean. "
        "One partial-agg pass builds the per-type high-water marks; the "
        "reference mark is a 1-row broadcast crossJoin (the established "
        "scalar-attach pattern). THE first query any pipeline-health "
        "dashboard runs; all-integer microsecond arithmetic, hash-exact",
)
def dq_freshness_lag(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    per_type = (e.groupBy("event_type")
                .agg(F.max(F.unix_micros("ts")).alias("last_us"),
                     F.count("*").cast("bigint").alias("n_events")))
    ref = per_type.agg(F.max("last_us").alias("ref_us"))
    hr = 3_600_000_000
    return (per_type.crossJoin(F.broadcast(ref))
            .select("event_type", "n_events",
                    F.expr(f"(ref_us - last_us) div {hr}").cast("bigint")
                    .alias("hours_behind"),
                    ((F.col("ref_us") - F.col("last_us")) <= 24 * hr)
                    .alias("fresh_24h")))


@query(
    "dq_join_cardinality",
    """
    WITH ca AS (SELECT o_custkey AS k, CAST(COUNT(*) AS BIGINT) AS c
                FROM orders GROUP BY 1),
    cb AS (SELECT c_custkey AS k, CAST(COUNT(*) AS BIGINT) AS c
           FROM customer WHERE c_acctbal > 0 GROUP BY 1)
    SELECT CAST(SUM(ca.c * cb.c) AS BIGINT) AS est_rows,
           (SELECT COUNT(*) FROM orders o JOIN customer c
            ON o.o_custkey = c.c_custkey AND c.c_acctbal > 0)
             AS actual_rows,
           CAST(SUM(ca.c * cb.c) AS BIGINT) =
           (SELECT COUNT(*) FROM orders o JOIN customer c
            ON o.o_custkey = c.c_custkey AND c.c_acctbal > 0)
             AS exact_match
    FROM ca JOIN cb ON cb.k = ca.k
    """,
    doc="join-output cardinality from per-key count tables BEFORE the "
        "join runs: |A ⋈ B| = Σ_k cnt_A(k)·cnt_B(k), computed by joining "
        "the two NDV-sized count rollups — the second join-planning "
        "number beside dq_key_skew_profile's hottest-key share (size "
        "says whether the join output fits; skew says whether it "
        "stragglers). For equi-joins the formula is an identity, which "
        "the face proves by ALSO running the join and emitting the "
        "match boolean — at 100 TB you run only the cheap half on the "
        "count tables (or their sketches) and skip the rehearsal",
)
def dq_join_cardinality(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    ca = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.count("*").cast("bigint").alias("ca"))
    cb = c.groupBy(F.col("c_custkey").alias("k")).agg(
        F.count("*").cast("bigint").alias("cb"))
    est = (ca.join(cb, "k")
           .agg(F.sum(F.col("ca") * F.col("cb")).cast("bigint")
                .alias("est_rows")))
    actual = (o.join(c, o.o_custkey == c.c_custkey)
              .agg(F.count("*").cast("bigint").alias("actual_rows")))
    return (est.crossJoin(F.broadcast(actual))
            .select("est_rows", "actual_rows",
                    (F.col("est_rows") == F.col("actual_rows"))
                    .alias("exact_match")))


_SCD2_CUT = "1997-07-01"       # history before, changeset on/after


@query(
    "scd2_apply_changeset",
    """
    WITH daily AS (
      SELECT o_custkey AS custkey, CAST(o_orderdate AS DATE) AS d,
             ARG_MAX(o_orderstatus, o_orderkey) AS status
      FROM orders GROUP BY 1, 2
    ),
    flagged AS (
      SELECT custkey, d, status,
             CASE WHEN LAG(status) OVER w IS NULL
                    OR LAG(status) OVER w <> status
                  THEN 1 ELSE 0 END AS chg
      FROM daily
      WINDOW w AS (PARTITION BY custkey ORDER BY d)
    ),
    pts AS (SELECT custkey, d, status FROM flagged WHERE chg = 1)
    SELECT custkey, status,
           STRFTIME(d, '%Y-%m-%d') AS valid_from,
           STRFTIME(LEAD(d) OVER (PARTITION BY custkey ORDER BY d),
                    '%Y-%m-%d') AS valid_to,
           CASE WHEN LEAD(d) OVER (PARTITION BY custkey ORDER BY d)
                  IS NULL THEN 1 ELSE 0 END AS is_current
    FROM pts
    """,
    doc=f"INCREMENTAL SCD2 maintenance, proven equal to the full "
        f"rebuild: the stored history (intervals from daily statuses "
        f"before {_SCD2_CUT}) absorbs a changeset (daily statuses "
        f"after) by re-deriving ONLY the keys the changeset touches — "
        "their old change-points (each interval's valid_from IS the "
        "event that opened it; re-deriving from change-points alone is "
        "sound here because the changeset is a MONOTONE date cut — "
        "every new event postdates every stored point, so no event can "
        "splice inside a collapsed same-status run. Out-of-order "
        "backfill needs the full point set: see "
        "streaming/ops.scd2_upsert_sink's sidecar) "
        "union the new events go back through "
        "one gaps-and-islands pass, formerly-current rows close, and "
        "the UNTOUCHED majority passes through as a window-free "
        "anti-join — at 100 TB that majority is the whole point (the "
        "naive rebuild re-windows every key every day). The oracle "
        "computes the straight full rebuild over all daily statuses; "
        "the hash match IS the incremental==full proof. Per-(key, day) "
        "status is the max_by(status, orderkey) argmax so both engines "
        "replay one deterministic event stream",
)
def scd2_apply_changeset(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    daily = (o.groupBy(F.col("o_custkey").alias("custkey"),
                       F.col("o_orderdate").cast("date").alias("d"))
             .agg(F.max_by("o_orderstatus", "o_orderkey").alias("status")))

    w = Window.partitionBy("custkey").orderBy("d")

    def islands(df):
        prev = F.lag("status").over(w)
        pts = (df.withColumn(
                   "chg", F.when(prev.isNull()
                                 | (prev != F.col("status")), 1)
                   .otherwise(0))
               .filter(F.col("chg") == 1))
        nxt = F.lead("d").over(w)
        return pts.select("custkey", "status", F.col("d").alias("vf"),
                          nxt.alias("vt"))

    cut = F.lit(_SCD2_CUT).cast("date")
    old_hist = islands(daily.filter(F.col("d") < cut))
    new_ev = daily.filter(F.col("d") >= cut)
    changed = new_ev.select("custkey").distinct()

    untouched = old_hist.join(changed, "custkey", "left_anti")
    old_pts = (old_hist.join(changed, "custkey", "semi")
               .select("custkey", F.col("vf").alias("d"), "status"))
    redone = islands(old_pts.unionByName(
        new_ev.select("custkey", "d", "status")))

    out = untouched.unionByName(redone)
    return out.select(
        "custkey", "status",
        F.date_format("vf", "yyyy-MM-dd").alias("valid_from"),
        F.date_format("vt", "yyyy-MM-dd").alias("valid_to"),
        F.when(F.col("vt").isNull(), 1).otherwise(0).alias("is_current"))


_PSI_CUT = "2024-01-16"        # baseline period before, current after


@query(
    "dq_psi_drift",
    f"""
    WITH cents AS (
      SELECT event_type,
             CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c,
             CAST(ts AS DATE) < DATE '{_PSI_CUT}' AS is_base
      FROM events
    ),
    edges AS (
      SELECT event_type,
             [QUANTILE_DISC(c, 0.1), QUANTILE_DISC(c, 0.2),
              QUANTILE_DISC(c, 0.3), QUANTILE_DISC(c, 0.4),
              QUANTILE_DISC(c, 0.5), QUANTILE_DISC(c, 0.6),
              QUANTILE_DISC(c, 0.7), QUANTILE_DISC(c, 0.8),
              QUANTILE_DISC(c, 0.9)] AS es
      FROM cents WHERE is_base GROUP BY event_type
    ),
    bucketed AS (
      SELECT x.event_type, x.is_base,
             LEN(LIST_FILTER(e.es, b -> b <= x.c)) AS bkt
      FROM cents x JOIN edges e ON e.event_type = x.event_type
    ),
    grid AS (
      SELECT e.event_type, g.bkt
      FROM edges e, (SELECT UNNEST(RANGE(0, 10)) AS bkt) g
    ),
    counts AS (
      SELECT g.event_type, g.bkt,
             COALESCE(SUM(CASE WHEN b.is_base THEN 1 ELSE 0 END), 0)
               AS cb,
             COALESCE(SUM(CASE WHEN NOT b.is_base THEN 1 ELSE 0 END), 0)
               AS cc
      FROM grid g LEFT JOIN bucketed b
        ON b.event_type = g.event_type AND b.bkt = g.bkt
      GROUP BY g.event_type, g.bkt
    ),
    tot AS (
      SELECT event_type,
             CAST(SUM(cb) AS BIGINT) AS nb, CAST(SUM(cc) AS BIGINT) AS nc
      FROM counts GROUP BY event_type
    )
    SELECT c.event_type, t.nb AS n_base, t.nc AS n_cur,
           ROUND(SUM(
             (CAST(c.cc + 1 AS DOUBLE) / (t.nc + 10)
              - CAST(c.cb + 1 AS DOUBLE) / (t.nb + 10))
             * LN((CAST(c.cc + 1 AS DOUBLE) / (t.nc + 10))
                  / (CAST(c.cb + 1 AS DOUBLE) / (t.nb + 10)))), 6)
             AS psi
    FROM counts c JOIN tot t ON t.event_type = c.event_type
    GROUP BY c.event_type, t.nb, t.nc
    """,
    doc=f"Population Stability Index drift monitor — the bucketed "
        "production-standard companion to dq_ks_drift's KS distance "
        "(KS = worst single point of ECDF divergence; PSI = "
        "distribution-wide reweighting cost, the number risk/feature "
        "platforms alert on at 0.1/0.25): per event type, the value "
        "distribution BEFORE the period cut is the baseline, its nine "
        "EXACT deciles (QUANTILE_DISC order statistics on integer "
        "cents — no interpolation float, no knife edges) define ten "
        "buckets, and both periods' populations land in those buckets "
        "by integer comparison; PSI folds over the FIXED 10-bucket "
        "grid with add-one smoothing (empty current buckets must not "
        "produce ln(0)). Scale: the only fact-sized work is one "
        "conditional-count pass per period; the decile table is "
        "event-type-sized and broadcast; the PSI fold runs on "
        "10 x n_types rows. The per-bucket sum is over a fixed tiny "
        "grid, so the float ln-sum has one deterministic "
        "evaluation order per group in both engines",
)
def dq_psi_drift(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    cents = ev.select(
        "event_type", psi_cent_col("value"),
        (F.col("ts").cast("date") < F.lit(_PSI_CUT).cast("date"))
        .alias("is_base"))
    edges = psi_edges(cents.filter("is_base"))
    # aggregate BEFORE the grid join (the streaming twin's shape,
    # guide §2.3): the conditional counts fold map-side to <= types x 10
    # rows, so the fact table is never join-shuffled on the ~50-value
    # (event_type, bkt) key — the old grid-LEFT-JOIN-facts plan either
    # broadcast the FACT side (local size estimate) or, at scale, would
    # shuffle the whole table onto 50 keys. The grid join then runs on
    # two grid-sized frames and only back-fills empty buckets with 0s.
    bc = (psi_bucketize(cents, edges)
          .groupBy("event_type", "bkt")
          .agg(F.sum(F.when(F.col("is_base"), 1).otherwise(0)).alias("b"),
               F.sum(F.when(~F.col("is_base"), 1).otherwise(0)).alias("n")))
    counts = (psi_grid(edges).join(bc, ["event_type", "bkt"], "left")
              .select("event_type", "bkt",
                      F.coalesce("b", F.lit(0)).alias("cb"),
                      F.coalesce("n", F.lit(0)).alias("cc")))
    # psi_fold references counts twice (totals + the PSI fold) and the
    # old plan re-executed the whole fact subtree per reference — 12
    # parquet scans / 8 percentile_disc passes in the before-plan. The
    # grid-sized persist makes it one bucketize pass + one decile pass.
    from .core import fresh_persist

    return psi_fold(fresh_persist("psi_counts", counts))


@query(
    "mix_lang_temperature",
    """
    WITH stats AS (
      SELECT lang, COUNT(*) AS n FROM documents GROUP BY lang
    ),
    tot AS (
      SELECT LIST_SUM(LIST(SQRT(CAST(n AS DOUBLE)) ORDER BY lang))
               AS w_all,
             SUM(n) AS n_all
      FROM stats
    ),
    targ AS (
      SELECT s.lang, s.n,
             CAST(FLOOR((CAST(t.n_all AS DOUBLE)
                         * SQRT(CAST(s.n AS DOUBLE))) / t.w_all)
                  AS BIGINT) AS target
      FROM stats s, tot t
    ),
    ranked AS (
      SELECT doc_id, lang,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY MD5(CAST(doc_id AS VARCHAR)),
                                         doc_id) AS r
      FROM documents
    )
    SELECT r.doc_id, r.lang,
           CAST(t.target // t.n
                + CASE WHEN r.r <= t.target % t.n THEN 1 ELSE 0 END
                AS BIGINT) AS n_copies
    FROM ranked r JOIN targ t ON t.lang = r.lang
    """,
    doc="TEMPERATURE-REWEIGHTED language mixing — the multilingual "
        "rebalancing step every large multilingual pipeline runs "
        "(XLM-R / mC4 alpha-sampling: p_l ∝ n_l^alpha with alpha < 1 "
        "up-weights low-resource languages; alpha = 0.5 here because "
        "IEEE sqrt is CORRECTLY ROUNDED, so both engines compute "
        "bit-identical weights — a pow() exponent would risk last-ulp "
        "divergence). Each doc gets an integer n_copies for the "
        "training mix: target_l = floor(N * sqrt(n_l) / W) with W an "
        "ORDERED fold over langs (LIST_SUM(LIST ... ORDER BY) / "
        "aggregate over array_sort — the ts_seasonal_strength "
        "determinism construction), then per-language deterministic "
        "selection by md5(doc_id) rank: every doc gets target div n "
        "copies and the target mod n smallest-hash docs one more — "
        "majority languages DOWN-sample (here en: some docs get 0 "
        "copies), low-resource languages UP-sample (copies of 2), "
        "seedlessly and reproducibly (the mix_epoch_shuffle property: "
        "any worker recomputes its shard's decision independently). "
        "Scale: one count pass, a lang-sized broadcast target table, "
        "and one hash-rank pass over the corpus via the SHARED "
        "bucketed_hash_rank (md5-prefix 256-way buckets + broadcast "
        "offsets, same as mix_epoch_shuffle) — NOT a per-lang window, "
        "because one language (en ~ half the web) would otherwise "
        "sort in a single task; plan-asserted in test_plans.py",
)
def mix_lang_temperature(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    stats = d.groupBy("lang").agg(F.count("*").alias("n"))
    w = F.sqrt(F.col("n").cast("double"))
    tot = (stats
           .agg(F.array_sort(F.collect_list(F.struct("lang",
                                                     w.alias("w"))))
                .alias("lw"),
                F.sum("n").alias("n_all"))
           .select(F.aggregate("lw", F.lit(0.0),
                               lambda a, s: a + s["w"]).alias("w_all"),
                   "n_all"))
    targ = (stats.crossJoin(F.broadcast(tot))
            .select("lang", "n",
                    F.floor((F.col("n_all").cast("double") * w)
                            / F.col("w_all")).cast("bigint")
                    .alias("target")))
    ranked = bucketed_hash_rank(
        d.select("doc_id", "lang",
                 F.md5(F.col("doc_id").cast("string")).alias("h")),
        ["lang"], "h", "doc_id").drop("h")
    return (ranked.join(F.broadcast(targ), "lang")
            .select("doc_id", "lang",
                    (F.expr("target div n")
                     + F.when(F.col("r") <= F.col("target") % F.col("n"),
                              1).otherwise(0)).cast("bigint")
                    .alias("n_copies")))


# -- PSI building blocks, shared with the streaming twin -----------------
# (streaming/ops.psi_drift_sink): the sink maintains current-period
# bucket counts incrementally and re-folds; using the SAME expressions
# guarantees its output is bit-identical to this batch face on the same
# points (the parity contract test_streaming.py pins).

def psi_cent_col(value_col: str):
    """Integer-cent quantization — exact order statistics, no float
    knife edges (the dq_psi_drift docstring's contract)."""
    return F.floor(F.col(value_col) * 100 + 0.5).cast("bigint").alias("c")


def psi_edges(cents):
    """Nine exact per-type decile edges of the baseline cents."""
    qs = [F.expr(f"percentile_disc({q / 10}) WITHIN GROUP (ORDER BY c)")
          .cast("bigint") for q in range(1, 10)]
    return cents.groupBy("event_type").agg(F.array(*qs).alias("es"))


def psi_bucketize(cents, edges):
    """Bucket id 0..9 by integer comparison against the broadcast decile
    table. INNER join: rows of event types absent from the baseline have
    no bucket grid and drop (both engines of the batch face agree)."""
    return (cents.join(F.broadcast(edges), "event_type")
            .withColumn("bkt", F.size(F.filter(
                "es", lambda b: b <= F.col("c")))))


def psi_grid(edges):
    """The fixed 10-bucket fold grid per baseline event type."""
    return edges.select(
        "event_type",
        F.explode(F.sequence(F.lit(0), F.lit(9))).alias("bkt"))


def psi_fold(counts):
    """PSI with add-one smoothing from complete-grid counts
    (event_type, bkt, cb, cc) — 10 rows per type, so the float ln-sum
    has one deterministic evaluation order per group."""
    tot = (counts.groupBy("event_type")
           .agg(F.sum("cb").cast("bigint").alias("nb"),
                F.sum("cc").cast("bigint").alias("nc")))
    pb = (F.col("cb") + 1).cast("double") / (F.col("nb") + 10)
    pc = (F.col("cc") + 1).cast("double") / (F.col("nc") + 10)
    return (counts.join(F.broadcast(tot), "event_type")
            .groupBy("event_type", F.col("nb").alias("n_base"),
                     F.col("nc").alias("n_cur"))
            .agg(F.round(F.sum((pc - pb) * F.log(pc / pb)), 6)
                 .alias("psi")))


_EPOCHS = 3


@query(
    "mix_epoch_shuffle",
    f"""
    WITH keyed AS (
      SELECT g.epoch, d.doc_id,
             MD5(CAST(g.epoch AS VARCHAR) || ':'
                 || CAST(d.doc_id AS VARCHAR)) AS k
      FROM documents d,
           (SELECT UNNEST(RANGE(0, {_EPOCHS})) AS epoch) g
    )
    SELECT CAST(epoch AS BIGINT) AS epoch,
           CAST(ROW_NUMBER() OVER (PARTITION BY epoch
                                   ORDER BY k, doc_id) AS BIGINT)
             AS position,
           doc_id
    FROM keyed
    """,
    doc=f"deterministic EPOCH SHUFFLE for training-data ordering: each "
        f"of {_EPOCHS} epochs orders the whole corpus by "
        "md5(epoch:doc_id) — a different, reproducible, seedless "
        "permutation per epoch, the standard way large training "
        "pipelines shuffle without RNG state (reshuffling = changing "
        "the epoch string; resuming mid-epoch = WHERE position > "
        "checkpoint, both pure recomputation). The hash key is "
        "engine-portable (md5 hex), the order total (tie-break "
        "doc_id). PLAN (the global_row_index pattern — a naive "
        "row_number over Window.partitionBy(epoch) would put each "
        "epoch's ENTIRE corpus in ONE sort task, since there are only "
        f"{_EPOCHS} epoch values; at 100 TB that is a single-task "
        "global sort): the first 2 hex chars of the md5 key are a "
        "256-way RANGE bucket that agrees with the sort order (the "
        "bucket is a key prefix, so ordering by (bucket, key) IS "
        "ordering by key, and md5 makes buckets uniform by "
        "construction — no min/max scan needed). row_number runs "
        "per-(epoch, bucket) — one hash exchange on 256*epochs keys, "
        "all reducers busy — and per-bucket counts (map-side combined "
        "to 256*epochs rows) cumsum into offsets on the driver-scale "
        "side, broadcast back. Any worker still recomputes its "
        "shard's order independently (the property RNG shuffles "
        "lose). Position is per-epoch dense rank 1..n, so downstream "
        "packing (pack_sequences) can consume fixed-size position "
        "ranges as deterministic micro-batches. Plan-asserted: no "
        "single-partition Sort/Window survives (test_plans.py)",
)
def mix_epoch_shuffle(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    epochs = spark.range(_EPOCHS).select(F.col("id").alias("epoch"))
    keyed = (d.crossJoin(F.broadcast(epochs))
             .select("epoch", "doc_id",
                     F.md5(F.concat(F.col("epoch").cast("string"),
                                    F.lit(":"),
                                    F.col("doc_id").cast("string")))
                     .alias("k")))
    ranked = bucketed_hash_rank(keyed, ["epoch"], "k", "doc_id",
                                out_col="position")
    return ranked.select(
        F.col("epoch").cast("bigint").alias("epoch"),
        F.col("position").cast("bigint").alias("position"), "doc_id")


@query(
    "mix_pack_epoch_stream",
    f"""
    WITH tok AS (
      SELECT doc_id,
             CAST(LEN(REGEXP_EXTRACT_ALL(text, '\\w+')) AS BIGINT)
               AS n_tokens
      FROM documents
    ),
    keyed AS (
      SELECT g.epoch, t.doc_id, t.n_tokens,
             MD5(CAST(g.epoch AS VARCHAR) || ':'
                 || CAST(t.doc_id AS VARCHAR)) AS k
      FROM tok t,
           (SELECT UNNEST(RANGE(0, {_EPOCHS})) AS epoch) g
    )
    SELECT CAST(epoch AS BIGINT) AS epoch,
           CAST(ROW_NUMBER() OVER (PARTITION BY epoch
                                   ORDER BY k, doc_id) AS BIGINT)
             AS position,
           doc_id, n_tokens,
           CAST((SUM(n_tokens) OVER (PARTITION BY epoch
                                     ORDER BY k, doc_id
                                     ROWS UNBOUNDED PRECEDING)
                 - n_tokens) // {_PACK_CAPACITY} AS BIGINT) AS pack_id
    FROM keyed
    """,
    doc=f"the TRAINING STREAM itself: each epoch's deterministic "
        f"md5-shuffled order (mix_epoch_shuffle) packed into "
        f"{_PACK_CAPACITY}-token context windows IN STREAM ORDER — "
        "pack_id is the exclusive running token count at the doc's "
        "position, integer-divided by capacity. PLAN: position AND the "
        "running token sum both come from ONE bucketed_hash_rank call "
        "(the md5-prefix 256-way bucket trick, extended with per-bucket "
        "weight totals broadcast as offsets), so the per-epoch prefix "
        "sum costs the same no-single-task-sort plan as the shuffle "
        "itself — at 100 TB no epoch ever serializes through one "
        "reducer. The streaming twin (streaming/ops.epoch_pack_sink) "
        "consumes contiguous position ranges as micro-batches with "
        "carry state and must reproduce these pack ids bit-exactly "
        "(the mid-epoch-resume contract, pinned in test_streaming.py)",
)
def mix_pack_epoch_stream(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    tok = d.select("doc_id",
                   F.regexp_count("text", F.lit(r"\w+")).cast("long")
                   .alias("n_tokens"))
    epochs = spark.range(_EPOCHS).select(F.col("id").alias("epoch"))
    keyed = (tok.crossJoin(F.broadcast(epochs))
             .select("epoch", "doc_id", "n_tokens",
                     F.md5(F.concat(F.col("epoch").cast("string"),
                                    F.lit(":"),
                                    F.col("doc_id").cast("string")))
                     .alias("k")))
    ranked = bucketed_hash_rank(keyed, ["epoch"], "k", "doc_id",
                                out_col="position",
                                weight_col="n_tokens", cum_col="_cb")
    return ranked.select(
        F.col("epoch").cast("bigint").alias("epoch"),
        F.col("position").cast("bigint").alias("position"),
        "doc_id", "n_tokens",
        F.floor(F.col("_cb") / _PACK_CAPACITY).cast("bigint")
        .alias("pack_id"))


# --------------------------------------------------------------------------
# Quality-ordered token-budget selection (curriculum pruning)
# --------------------------------------------------------------------------
_TOKEN_BUDGET = 800  # tokens kept per source (spec constant, like capacity)


@query(
    "mix_token_budget",
    f"""
    WITH tok AS (
      SELECT doc_id, source,
             CAST(LEN(REGEXP_EXTRACT_ALL(text, '\\w+')) AS BIGINT)
               AS n_tokens,
             CAST(LEN(LIST_DISTINCT(REGEXP_EXTRACT_ALL(LOWER(text),
                                                       '\\w+'))) AS BIGINT)
               AS n_dist
      FROM documents
    ),
    scored AS (
      SELECT doc_id, source, n_tokens,
             CAST((n_dist * 10000) // GREATEST(n_tokens, 1) AS BIGINT)
               AS score_key
      FROM tok
    ),
    ranked AS (
      SELECT doc_id, source, score_key, n_tokens,
             SUM(n_tokens) OVER (PARTITION BY source
                                 ORDER BY score_key DESC, doc_id
                                 ROWS UNBOUNDED PRECEDING) - n_tokens
               AS tok_before
      FROM scored
    )
    SELECT doc_id, source, score_key, n_tokens,
           CAST(tok_before AS BIGINT) AS tok_before
    FROM ranked
    WHERE tok_before < {_TOKEN_BUDGET}
    """,
    doc=f"quality-pruned token budget (the FineWeb-style 'keep the best N "
        f"tokens per domain' curriculum stage): rank each source's docs by "
        "a lexical-diversity quality score (distinct-word ratio as an "
        "exact integer key — (n_dist*10000) DIV n_tokens, so both engines "
        "agree bit-for-bit with no float division), then keep docs in "
        "score order while the source's EXCLUSIVE running token count is "
        f"under {_TOKEN_BUDGET}. The doc that straddles the boundary is "
        "kept (budget is a lower bound on selected tokens, the usual "
        "convention so a giant first doc is never starved to zero). PLAN: "
        "sources are low-cardinality, exactly the single-task-window trap "
        "— the running sum routes through bucketed_range_rank (the "
        "numeric-descending sibling of the mix faces' md5 trick: fixed "
        "score-grid buckets + broadcast per-bucket weight offsets), so no "
        "source ever serializes through one reducer. Plan-asserted in "
        "test_plans.py",
)
def mix_token_budget(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "source",
        F.regexp_count("text", F.lit(r"\w+")).cast("bigint")
        .alias("n_tokens"),
        F.size(F.array_distinct(
            F.regexp_extract_all(F.lower(F.col("text")),
                                 F.lit(r"\w+"), F.lit(0))))
        .cast("bigint").alias("n_dist"))
    scored = tok.select(
        "doc_id", "source", "n_tokens",
        F.expr("CAST((n_dist * 10000) DIV GREATEST(n_tokens, 1) AS BIGINT)")
        .alias("score_key"))
    ranked = bucketed_range_rank(scored, ["source"], "score_key", "doc_id",
                                 key_max=10000, n_buckets=40,
                                 out_col="_pos", weight_col="n_tokens",
                                 cum_col="tok_before")
    return (ranked.filter(F.col("tok_before") < _TOKEN_BUDGET)
            .select("doc_id", "source", "score_key", "n_tokens",
                    F.col("tok_before").cast("bigint").alias("tok_before")))


def bucketed_hash_rank(df, group_cols: list, hash_col: str, tie_col: str,
                       out_col: str = "r", weight_col: str | None = None,
                       cum_col: str | None = None):
    """Per-group dense rank 1..n ordered by (hash_col, tie_col) WITHOUT
    a single-task-per-group sort — the global_row_index pattern for
    LOW-CARDINALITY groups (epochs, languages): the first 2 hex chars
    of the md5-hex `hash_col` are a 256-way RANGE bucket that agrees
    with the sort order (a key prefix, uniform by construction — no
    min/max scan; pinned statistically in test_growth_laws.py), so
    row_number runs per-(group, bucket) — one hash exchange on 256 x
    |groups| keys, every reducer busy — and the per-bucket counts
    (map-side combined, metadata-sized) cumsum into offsets broadcast
    back. Shared by mix_epoch_shuffle (groups = epochs) and
    mix_lang_temperature (groups = languages, where one language can
    own half the corpus). Plan-asserted in test_plans.py: no
    SinglePartition, rank windows partition on (group, bucket).

    With `weight_col`/`cum_col`, additionally emits the EXCLUSIVE
    running sum of weight_col in the same (hash, tie) order through the
    SAME bucket decomposition (per-bucket local prefix sum + broadcast
    cumulative per-bucket weight totals) — the sequence-packing prefix
    sum (mix_pack_epoch_stream) at the same no-global-sort cost; both
    window expressions share one (group, bucket) window spec, so
    Catalyst plans a single Window node. Default call is unchanged."""
    b = df.withColumn("_b", F.substring(hash_col, 1, 2))
    return _bucketed_rank(
        b, group_cols,
        order_within=[F.col(hash_col).asc(), F.col(tie_col).asc()],
        bucket_asc=True, out_col=out_col,
        weight_col=weight_col, cum_col=cum_col)


def range_rank_step(key_max: int, n_buckets: int) -> int:
    """The fixed score-grid step bucketed_range_rank schedules:
    `key DIV step` with step = ceil-ish (key_max + n_buckets) DIV
    n_buckets. Exported so the growth-law pin (test_growth_laws.py)
    measures the grid the helper ACTUALLY plans — a tuned formula here
    retunes the pin automatically instead of silently diverging."""
    return max(1, (int(key_max) + n_buckets) // n_buckets)


def bucketed_range_rank(df, group_cols: list, key_col: str, tie_col: str,
                        *, key_max: int, n_buckets: int = 64,
                        out_col: str = "r", weight_col: str | None = None,
                        cum_col: str | None = None, cuts: str = "grid"):
    """bucketed_hash_rank's numeric sibling: per-group rank 1..n ordered
    by (key_col DESC, tie_col ASC) without a single-task-per-group sort,
    for an INTEGER key with a known range [0, key_max]. The bucket is a
    fixed grid `key DIV range_rank_step(key_max, n_buckets)` — a key
    prefix in the order's own units, so it agrees with the sort order
    exactly like the md5 hex prefix does for hash order; buckets
    accumulate offsets in DESCENDING bucket order to match. Unlike the
    hash variant the grid is NOT uniform by construction (real score
    distributions cluster), but a skewed bucket still bounds the
    per-task sort at 1/n_buckets-ish of the group instead of ALL of it,
    and n_buckets is a knob.

    `cuts='approx'` is the 100 TB answer to CLUSTERED score
    distributions: one cheap approxQuantile pass (eager, at
    plan-construction time) computes up to n_buckets-1 global cut
    points and the bucket becomes `#cuts <= key` (a monotone function
    of the key, so order still agrees); buckets are then ~equal-count
    by construction no matter how the scores cluster, at the cost of
    that extra pass. Identical rank/cumsum output either way (pinned in
    test_round11_faces.py) — only the task decomposition changes.
    Used by mix_token_budget (groups = sources, key = quality score)."""
    if cuts not in ("grid", "approx"):
        # a typo like cuts='quantile' must fail loudly, not silently
        # fall back to the grid path the caller meant to opt out of
        raise ValueError(
            f"cuts must be 'grid' or 'approx', got {cuts!r}")
    if cuts == "approx":
        probs = [i / n_buckets for i in range(1, n_buckets)]
        bounds = sorted({int(q) for q in
                         df.approxQuantile(key_col, probs, 0.001)})
        if bounds:
            arr = ", ".join(f"{v}L" for v in bounds)
            bexpr = (f"CAST(size(filter(array({arr}), "
                     f"b -> CAST({key_col} AS BIGINT) >= b)) AS BIGINT)")
        else:   # empty input or a single constant key: one bucket
            bexpr = "CAST(0 AS BIGINT)"
        b = df.withColumn("_b", F.expr(bexpr))
    else:
        step = range_rank_step(key_max, n_buckets)
        # integer DIV, not float division + cast: exact for any bigint key
        b = df.withColumn(
            "_b", F.expr(f"CAST({key_col} AS BIGINT) DIV {step}"))
    return _bucketed_rank(
        b, group_cols,
        order_within=[F.col(key_col).desc(), F.col(tie_col).asc()],
        bucket_asc=False, out_col=out_col,
        weight_col=weight_col, cum_col=cum_col)


def _bucketed_rank(b, group_cols: list, *, order_within: list,
                   bucket_asc: bool, out_col: str,
                   weight_col: str | None, cum_col: str | None):
    """Shared core of bucketed_hash_rank / bucketed_range_rank: `b`
    already carries the `_b` bucket column whose order agrees with
    `order_within`. One hash exchange on (group, _b), per-bucket counts
    (and weight totals) map-side combined and broadcast back as
    exclusive cumulative offsets taken over buckets in rank order."""
    aggs = [F.count("*").alias("_n")]
    if weight_col is not None:
        aggs.append(F.sum(weight_col).alias("_wn"))
    counts = b.groupBy(*group_cols, "_b").agg(*aggs)
    border = F.col("_b").asc() if bucket_asc else F.col("_b").desc()
    woff = (Window.partitionBy(*group_cols).orderBy(border)
            .rowsBetween(Window.unboundedPreceding, -1))
    off_cols = [*group_cols, "_b",
                F.coalesce(F.sum("_n").over(woff), F.lit(0)).alias("_off")]
    if weight_col is not None:
        off_cols.append(F.coalesce(F.sum("_wn").over(woff), F.lit(0))
                        .alias("_woff"))
    offsets = counts.select(*off_cols)
    wloc = Window.partitionBy(*group_cols, "_b").orderBy(*order_within)
    out = (b.join(F.broadcast(offsets), [*group_cols, "_b"])
           .withColumn(out_col,
                       F.col("_off") + F.row_number().over(wloc)))
    if weight_col is not None:
        local_cum = (F.sum(weight_col).over(
            wloc.rowsBetween(Window.unboundedPreceding, 0))
            - F.col(weight_col))
        out = (out.withColumn(cum_col, F.col("_woff") + local_cum)
               .drop("_woff"))
    return out.drop("_b", "_off")


# --------------------------------------------------------------------------
# DoReMi-style domain reweighting (multiplicative-weights update)
# --------------------------------------------------------------------------
_DOREMI_ETA = 10.0     # MW step size on the excess-loss proxy
_DOREMI_SMOOTH = 0.01  # uniform smoothing mass (the paper's u term)


@query(
    "mix_doremi_weights",
    f"""
    WITH tok AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(LEN(REGEXP_EXTRACT_ALL(text, '\\w+'))) AS BIGINT)
               AS n_tokens,
             CAST(SUM(LEN(LIST_DISTINCT(
                 REGEXP_EXTRACT_ALL(LOWER(text), '\\w+')))) AS BIGINT)
               AS n_dist
      FROM documents GROUP BY source
    ),
    tot AS (
      SELECT LIST({{'s': source, 't': n_tokens, 'd': n_dist}}
                  ORDER BY source) AS arr,
             SUM(n_tokens) AS all_t, SUM(n_dist) AS all_d,
             COUNT(*) AS k
      FROM tok
    ),
    den AS (
      SELECT all_t, all_d, k,
             LIST_SUM(LIST_TRANSFORM(arr, x ->
               (CAST(x.t AS DOUBLE) / GREATEST(all_t, 1))
               * (1.0 + {_DOREMI_ETA} * GREATEST(
                    CAST(all_d AS DOUBLE) / GREATEST(all_t, 1)
                    - CAST(x.d AS DOUBLE) / GREATEST(x.t, 1), 0.0)))) AS z
      FROM tot
    )
    SELECT source, n_docs, n_tokens,
           ROUND(CAST(n_tokens AS DOUBLE) / GREATEST(all_t, 1), 6)
             AS token_share,
           ROUND(GREATEST(CAST(all_d AS DOUBLE) / GREATEST(all_t, 1)
                          - CAST(n_dist AS DOUBLE) / GREATEST(n_tokens, 1),
                          0.0), 6)
             AS excess_loss,
           ROUND((1.0 - {_DOREMI_SMOOTH})
                 * ((CAST(n_tokens AS DOUBLE) / GREATEST(all_t, 1))
                    * (1.0 + {_DOREMI_ETA} * GREATEST(
                         CAST(all_d AS DOUBLE) / GREATEST(all_t, 1)
                         - CAST(n_dist AS DOUBLE) / GREATEST(n_tokens, 1),
                         0.0))
                    / (CASE WHEN z = 0.0 THEN 1.0 ELSE z END))
                 + {_DOREMI_SMOOTH} / k, 6) AS doremi_weight
    FROM tok CROSS JOIN den
    """,
    doc="DoReMi-style domain reweighting (Xie et al. 2023, 'DoReMi: "
        "Optimizing Data Mixtures Speeds Up Language Model Pretraining') "
        "with a deterministic one-step multiplicative-weights update: each "
        "domain's proxy excess loss is how far its lexical diversity "
        "(distinct-token / token ratio) falls BELOW the corpus ratio — "
        "low-diversity domains are the hard-to-compress ones the MW step "
        "upweights — clipped at 0 like the paper's excess loss; the update "
        "is the LINEARIZED exponential w_i <- base_i * (1 + eta*excess_i) "
        "(the classic Hedge approximation), normalized, then mixed with "
        f"{_DOREMI_SMOOTH} uniform mass exactly as the paper smooths its "
        "final weights. Hash-exactness: every corpus-sized aggregate is a "
        "BIGINT sum (token and distinct-token counts — no float folds over "
        "data order); the only float reduction is the normalizer z, an "
        "ORDERED fold over the source-sorted domain list (domains-sized, "
        "one row), the mix_temperature_weights discipline; everything else "
        "is +,*,/ and GREATEST on IEEE doubles, which both engines round "
        "identically (no libm transcendentals — the linearized update "
        "exists precisely to avoid EXP's cross-engine last-ulp risk). "
        "PLAN: one documents scan -> hash-agg to |domains| rows; the fold "
        "and the weight arithmetic run on a broadcast domain table; zero "
        "corpus-sized joins or windows — the 100 TB cost is the scan",
)
def mix_doremi_weights(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    tok = doremi_domain_counts(d).cache()
    return doremi_fold(tok)


def doremi_domain_counts(docs):
    """Per-source BIGINT count rollup (n_docs, n_tokens, n_dist) for ANY
    (source, text) frame — the one fact-sized reduction the DoReMi face
    AND its streaming twin (streaming/ops.doremi_weights_sink) share.
    n_dist is PER-DOC distinct tokens summed over docs, so it is
    additive across micro-batches (a corpus-level distinct would not
    be) — the property the incremental sink's count fold rests on."""
    return (docs.groupBy("source")
            .agg(F.count("*").cast("bigint").alias("n_docs"),
                 F.sum(F.regexp_count("text", F.lit(r"\w+")))
                 .cast("bigint").alias("n_tokens"),
                 F.sum(F.size(F.array_distinct(
                     F.regexp_extract_all(F.lower(F.col("text")),
                                          F.lit(r"\w+"), F.lit(0)))))
                 .cast("bigint").alias("n_dist")))


def doremi_fold(tok):
    """The linearized-MW weight fold over a (source, n_docs, n_tokens,
    n_dist) domain table — domains-sized arithmetic, shared verbatim by
    the batch face and the streaming twin so the twin cannot drift.

    Every token-count denominator is GREATEST(·, 1)-guarded (same
    discipline as the score-key faces): a source whose documents
    contain zero \\w tokens must yield excess 0 / weight = smoothed
    share, not an ANSI division error (or a NULL-vs-inf cross-engine
    split in non-ANSI mode). Hash-neutral whenever the corpus has any
    token at all — the guard only ever changes a 0 denominator."""

    def _g1(c):
        return F.greatest(c, F.lit(1))

    def _excess(t, dd, all_t, all_d):
        return F.greatest(
            all_d.cast("double") / _g1(all_t)
            - dd.cast("double") / _g1(t),
            F.lit(0.0))

    den = (tok
           .agg(F.array_sort(F.collect_list(
                    F.struct(F.col("source").alias("s"),
                             F.col("n_tokens").alias("t"),
                             F.col("n_dist").alias("d")))).alias("arr"),
                F.sum("n_tokens").alias("all_t"),
                F.sum("n_dist").alias("all_d"),
                F.count("*").alias("k"))
           .select("all_t", "all_d", "k",
                   F.aggregate(
                       F.col("arr"), F.lit(0.0),
                       lambda acc, x: acc
                       + (x["t"].cast("double") / _g1(F.col("all_t")))
                       * (F.lit(1.0) + _DOREMI_ETA
                          * _excess(x["t"], x["d"],
                                    F.col("all_t"), F.col("all_d"))))
                   .alias("z")))
    base = F.col("n_tokens").cast("double") / _g1(F.col("all_t"))
    exc = _excess(F.col("n_tokens"), F.col("n_dist"),
                  F.col("all_t"), F.col("all_d"))
    u = base * (F.lit(1.0) + _DOREMI_ETA * exc)
    # z == 0 only when EVERY source has zero tokens (all bases 0): the
    # guard avoids 0/0 = NaN weights — the degenerate corpus then gets
    # only the smoothing mass, a visible no-evidence signature instead
    # of a NaN table the streaming twin would persist
    z = F.when(F.col("z") == 0.0, F.lit(1.0)).otherwise(F.col("z"))
    return (tok.crossJoin(F.broadcast(den))
            .select("source", "n_docs", "n_tokens",
                    F.round(base, 6).alias("token_share"),
                    F.round(exc, 6).alias("excess_loss"),
                    F.round((1.0 - _DOREMI_SMOOTH) * (u / z)
                            + _DOREMI_SMOOTH / F.col("k"), 6)
                    .alias("doremi_weight")))


# --------------------------------------------------------------------------
# Curriculum ordering with round-robin domain interleave
# --------------------------------------------------------------------------
@query(
    "mix_curriculum_interleave",
    """
    WITH tok AS (
      SELECT doc_id, source,
             CAST(LEN(REGEXP_EXTRACT_ALL(text, '\\w+')) AS BIGINT)
               AS n_tokens,
             CAST(LEN(LIST_DISTINCT(REGEXP_EXTRACT_ALL(LOWER(text),
                                                       '\\w+'))) AS BIGINT)
               AS n_dist
      FROM documents
    ),
    scored AS (
      SELECT doc_id, source,
             CAST((n_dist * 10000) // GREATEST(n_tokens, 1) AS BIGINT)
               AS score_key
      FROM tok
    ),
    ranked AS (
      SELECT doc_id, source, score_key,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY score_key DESC, doc_id)
               AS rank_in_source
      FROM scored
    ),
    srcidx AS (
      SELECT source,
             CAST(ROW_NUMBER() OVER (ORDER BY source) - 1 AS BIGINT) AS si
      FROM (SELECT DISTINCT source FROM scored)
    ),
    sc AS (SELECT CAST(COUNT(*) AS BIGINT) AS s FROM srcidx)
    SELECT r.doc_id, r.source, r.score_key,
           CAST(r.rank_in_source AS BIGINT) AS rank_in_source,
           CAST((r.rank_in_source - 1) * sc.s + x.si AS BIGINT) AS slot
    FROM ranked r JOIN srcidx x USING (source) CROSS JOIN sc
    """,
    doc="curriculum ordering with round-robin domain interleave (Bengio "
        "et al. 2009 easy-to-hard scheduling, plus the interleaving that "
        "keeps any window of the schedule domain-balanced so no domain "
        "forms a contiguous run): docs rank within their source by the "
        "same exact integer lexical-diversity key as mix_token_budget "
        "(cleanest first), then slot = (rank-1)*|sources| + source_index "
        "assigns a SPARSE global position arithmetically — reading ORDER "
        "BY slot yields rank-1 of every domain, then rank-2, ... with "
        "gaps where a smaller domain is exhausted, and no global sort or "
        "row_number over the corpus ever runs. PLAN: the per-source rank "
        "routes through bucketed_range_rank (fixed score-grid buckets + "
        "broadcast offsets — no single-task-per-source window even if one "
        "source owns half the corpus); source_index is a row_number over "
        "the DISTINCT source table (|sources| rows, metadata-sized, the "
        "same class as the helper's offset table) broadcast back; slot is "
        "row-local arithmetic. All columns are exact integers — "
        "hash-exact by construction. Plan-asserted in test_plans.py",
)
def mix_curriculum_interleave(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id", "source",
        F.expr("CAST((CAST(size(array_distinct(regexp_extract_all("
               "lower(text), '\\\\w+', 0))) AS BIGINT) * 10000) DIV "
               "GREATEST(CAST(regexp_count(text, '\\\\w+') AS BIGINT), 1) "
               "AS BIGINT)").alias("score_key"))
    ranked = bucketed_range_rank(scored, ["source"], "score_key", "doc_id",
                                 key_max=10000, n_buckets=40,
                                 out_col="rank_in_source")
    # |sources| rows: a single-partition row_number here is the broadcast
    # offset table idiom, not a corpus-sized window
    srcidx = (scored.select("source").distinct()
              .select("source",
                      (F.row_number().over(Window.orderBy("source")) - 1)
                      .cast("bigint").alias("si")))
    sc = srcidx.agg(F.count("*").cast("bigint").alias("s"))
    return (ranked.join(F.broadcast(srcidx), "source")
            .crossJoin(F.broadcast(sc))
            .select("doc_id", "source", "score_key",
                    F.col("rank_in_source").cast("bigint")
                    .alias("rank_in_source"),
                    ((F.col("rank_in_source") - 1) * F.col("s")
                     + F.col("si")).cast("bigint").alias("slot")))


# --------------------------------------------------------------------------
# Two-phase main -> anneal training schedule
# --------------------------------------------------------------------------
_ANNEAL_CUT = 7000  # score_key >= cut defines the high-quality anneal set


@query(
    "mix_anneal_schedule",
    f"""
    WITH scored AS (
      SELECT doc_id,
             CAST(LEN(REGEXP_EXTRACT_ALL(text, '\\w+')) AS BIGINT)
               AS n_tokens,
             CAST((CAST(LEN(LIST_DISTINCT(REGEXP_EXTRACT_ALL(LOWER(text),
                        '\\w+'))) AS BIGINT) * 10000)
                  // GREATEST(CAST(LEN(REGEXP_EXTRACT_ALL(text, '\\w+'))
                              AS BIGINT), 1) AS BIGINT) AS score_key
      FROM documents
    ),
    ph AS (
      SELECT 0 AS phase, doc_id, n_tokens, score_key FROM scored
      UNION ALL
      SELECT 1, doc_id, n_tokens, score_key FROM scored
      WHERE score_key >= {_ANNEAL_CUT}
    ),
    keyed AS (
      SELECT phase, doc_id, n_tokens, score_key,
             MD5((CASE WHEN phase = 0 THEN 'main:' ELSE 'anneal:' END)
                 || CAST(doc_id AS VARCHAR)) AS k
      FROM ph
    ),
    n0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS c FROM keyed WHERE phase = 0)
    SELECT CAST(phase AS BIGINT) AS phase,
           CAST(ROW_NUMBER() OVER (PARTITION BY phase ORDER BY k, doc_id)
                + CASE WHEN phase = 1 THEN n0.c ELSE 0 END AS BIGINT)
             AS position,
           doc_id, n_tokens, score_key
    FROM keyed CROSS JOIN n0
    """,
    doc="two-phase main -> anneal training schedule (the midtraining "
        "recipe: a final phase re-showing only high-quality data — "
        "MiniCPM's WSD annealing data, Llama 3's quality-upsampled "
        "final phase, OLMo 2 midtraining): phase 0 streams the WHOLE "
        "corpus in md5('main:'||doc_id) order; phase 1 re-streams the "
        f"docs whose lexical-diversity score >= {_ANNEAL_CUT} (the mix "
        "tier's shared integer key) in a DIFFERENT md5('anneal:'||...) "
        "order; position is the global stream index (phase-1 offsets by "
        "the phase-0 count), so ORDER BY position is the entire "
        "training run and resume is WHERE position > checkpoint, pure "
        "recomputation — the same seedless-RNG contract as "
        "mix_epoch_shuffle, with the phase label replacing the epoch "
        "number in the hash. PLAN: the phase fan-out is a narrow "
        "union inside the scan; both phases rank through ONE "
        "bucketed_hash_rank call on (phase, md5-prefix bucket) — no "
        "single-task-per-phase sort (phases are the 2-value worst "
        "case); the phase-0 count joins back as a broadcast 1-row "
        "scalar. All-integer output, hash-exact. Plan-asserted in "
        "test_plans.py",
)
def mix_anneal_schedule(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    scored = d.select(
        "doc_id",
        F.regexp_count("text", F.lit(r"\w+")).cast("bigint")
        .alias("n_tokens"),
        F.expr("CAST((CAST(size(array_distinct(regexp_extract_all("
               "lower(text), '\\\\w+', 0))) AS BIGINT) * 10000) DIV "
               "GREATEST(CAST(regexp_count(text, '\\\\w+') AS BIGINT), 1) "
               "AS BIGINT)").alias("score_key"))
    ph = (scored.select(F.lit(0).alias("phase"), "doc_id", "n_tokens",
                        "score_key")
          .unionAll(scored.filter(F.col("score_key") >= _ANNEAL_CUT)
                    .select(F.lit(1).alias("phase"), "doc_id", "n_tokens",
                            "score_key")))
    keyed = ph.withColumn(
        "k", F.md5(F.concat(
            F.when(F.col("phase") == 0, F.lit("main:"))
            .otherwise(F.lit("anneal:")),
            F.col("doc_id").cast("string"))))
    ranked = bucketed_hash_rank(keyed, ["phase"], "k", "doc_id",
                                out_col="_r")
    n0 = (keyed.filter(F.col("phase") == 0)
          .agg(F.count("*").cast("bigint").alias("c")))
    return (ranked.crossJoin(F.broadcast(n0))
            .select(F.col("phase").cast("bigint").alias("phase"),
                    (F.col("_r")
                     + F.when(F.col("phase") == 1, F.col("c"))
                     .otherwise(F.lit(0))).cast("bigint")
                    .alias("position"),
                    "doc_id", "n_tokens", "score_key"))


# --------------------------------------------------------------------------
# Length-bucketed batching for padding-efficient training (r12)
# --------------------------------------------------------------------------
_LENBATCH_SIZE = 8          # docs per batch within a length bucket
_LENBUCKET_CAPS = (16, 32, 64, 128, 256, 512, 1024, 2048)

_CAPS_CASE_SQL = ("CASE "
                  + " ".join(f"WHEN n_tokens <= {c} THEN {c}"
                             for c in _LENBUCKET_CAPS[:-1])
                  + f" ELSE {_LENBUCKET_CAPS[-1]} END")


def length_bucket_cap_col(n_col: str = "n_tokens"):
    """Power-of-two padding-cap column over an integer length column —
    the explicit CASE grid mix_length_buckets schedules (no LOG2: libm
    rounding at exact powers of two could split engines). Exported so
    compositions (llm/curation.assemble_v3) reuse the grid instead of
    copying it; lengths beyond the largest cap land in that cap's
    bucket (the context limit) and carry a `truncated` flag at the
    call sites."""
    caps_col = F.lit(_LENBUCKET_CAPS[-1])
    for c in reversed(_LENBUCKET_CAPS[:-1]):
        caps_col = F.when(F.col(n_col) <= c, F.lit(c)).otherwise(caps_col)
    return caps_col.cast("bigint")


@query(
    "mix_length_buckets",
    f"""
    WITH tok AS (
      SELECT doc_id,
             CAST(LEN(REGEXP_EXTRACT_ALL(text, '\\w+')) AS BIGINT)
               AS n_tokens
      FROM documents
    ),
    capped AS (
      SELECT doc_id, n_tokens,
             CAST({_CAPS_CASE_SQL} AS BIGINT) AS bucket_cap
      FROM tok
    ),
    ranked AS (
      SELECT doc_id, n_tokens, bucket_cap,
             ROW_NUMBER() OVER (
               PARTITION BY bucket_cap
               ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
      FROM capped
    )
    SELECT doc_id, n_tokens, bucket_cap,
           CAST((rn - 1) // {_LENBATCH_SIZE} AS BIGINT) AS batch_no,
           CAST(GREATEST(bucket_cap - n_tokens, 0) AS BIGINT) AS pad_waste,
           CAST(n_tokens > bucket_cap AS INT) AS truncated
    FROM ranked
    """,
    doc="length-bucketed batching: assign every doc a power-of-two "
        "padding cap (explicit CASE grid — no LOG2, whose libm rounding "
        "could split engines at exact powers of two) and a batch number "
        "within its bucket, so fixed-shape training batches pad each doc "
        "only to its bucket cap instead of the corpus max — the standard "
        "padding-efficiency trick in sequence-training input pipelines "
        "(pad_waste is the per-doc cost the bucketing leaves on the "
        "table). The largest cap is also the context limit: a doc LONGER "
        "than it lands in that bucket with `truncated` = 1 (pad_waste 0) "
        "— the batch shape stays cap-exact and the consumer decides "
        "truncate-vs-split, explicitly, instead of discovering an "
        "oversized row at collate time. Batch membership inside a "
        "bucket is the seedless md5 order the mix tier shares, so "
        "batches are reproducible from doc_ids alone. Scale: ~8 caps "
        "make the bucket a LOW-cardinality group — the single-task-"
        "window trap — so the rank routes through bucketed_hash_rank "
        "((cap, md5-prefix) windows + broadcast offsets), never "
        "Window.partitionBy(cap) alone; plan-asserted in test_plans.py",
)
def mix_length_buckets(spark, sf_dir):
    d = T(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id",
        F.regexp_count("text", F.lit(r"\w+")).cast("bigint")
        .alias("n_tokens"))
    capped = tok.withColumn("bucket_cap", length_bucket_cap_col())
    keyed = capped.withColumn("h", F.md5(F.col("doc_id").cast("string")))
    ranked = bucketed_hash_rank(keyed, ["bucket_cap"], "h", "doc_id",
                                out_col="_r")
    return ranked.select(
        "doc_id", "n_tokens", "bucket_cap",
        F.expr(f"CAST((_r - 1) DIV {_LENBATCH_SIZE} AS BIGINT)")
        .alias("batch_no"),
        F.greatest(F.col("bucket_cap") - F.col("n_tokens"), F.lit(0))
        .cast("bigint").alias("pad_waste"),
        (F.col("n_tokens") > F.col("bucket_cap")).cast("int")
        .alias("truncated"))


# --------------------------------------------------------------------------
# r13: CCNet-style perplexity terciles + waterfilling budget allocation
# --------------------------------------------------------------------------
# words -> bigrams -> self-trained bigram LM -> per-doc INTEGER
# surprisal key ((s * 10000) DIV n_bigrams) — the `keyed` CTE SHARED
# VERBATIM by mix_perplexity_buckets (ranks it into terciles) and
# quality_lm_agreement (correlates it with the Gopher gate), so the
# two views score fluency identically. Docs need >= 1 bigram.
_SURPRISAL_KEYED_SQL = """words AS (SELECT doc_id, source, string_split(text, ' ') AS w
                   FROM documents),
    bg AS (
      SELECT doc_id, source, UNNEST(w[1:-2]) AS w1, UNNEST(w[2:]) AS w2
      FROM words
    ),
    pair_c AS (SELECT w1, w2, COUNT(*) AS c2 FROM bg GROUP BY 1, 2),
    head_c AS (SELECT w1, SUM(c2) AS c1 FROM pair_c GROUP BY 1),
    scored AS (
      SELECT b.doc_id, b.source,
             CAST(COUNT(*) AS BIGINT) AS n_bigrams,
             CAST(SUM(64 + CAST(FLOOR(LOG2(p.c2)) AS BIGINT)
                         - CAST(FLOOR(LOG2(h.c1)) AS BIGINT))
                  AS BIGINT) AS s
      FROM bg b
      JOIN pair_c p ON b.w1 = p.w1 AND b.w2 = p.w2
      JOIN head_c h ON b.w1 = h.w1
      GROUP BY 1, 2
    ),
    keyed AS (
      SELECT doc_id, source, n_bigrams,
             CAST((s * 10000) // n_bigrams AS BIGINT) AS score_key
      FROM scored
    )"""


def doc_surprisal_keys(docs):
    """(doc_id, source, n_bigrams, score_key) under the corpus's
    self-trained word-bigram LM — the integer surprisal proxy (per
    bigram 64 + floor(log2 c2) - floor(log2 c1), per doc
    (sum * 10000) DIV n_bigrams; see mix_perplexity_buckets' docstring
    for the determinism argument). Spark twin of _SURPRISAL_KEYED_SQL,
    shared verbatim by mix_perplexity_buckets and quality_lm_agreement.
    Scale: LM fit is the bigram-vocab shuffle; the scoring joins carry
    NO broadcast hint (the model tables grow with the vocabulary —
    AQE broadcasts them while small, shuffles past the threshold);
    then one doc-keyed agg."""
    d = docs.withColumn("w", F.split("text", " "))
    bg = (d.select(
        "doc_id", "source",
        F.explode(F.expr(
            "transform(slice(w, 1, size(w) - 1), "
            "(x, i) -> struct(x AS w1, w[i + 1] AS w2))")).alias("b"))
        .select("doc_id", "source",
                F.col("b.w1").alias("w1"), F.col("b.w2").alias("w2")))
    pair_c = bg.groupBy("w1", "w2").agg(F.count("*").alias("c2"))
    head_c = pair_c.groupBy("w1").agg(F.sum("c2").alias("c1"))
    sb = (F.lit(64)
          + F.floor(F.log2(F.col("c2").cast("double"))).cast("bigint")
          - F.floor(F.log2(F.col("c1").cast("double"))).cast("bigint"))
    scored = (bg.join(pair_c, ["w1", "w2"])
              .join(head_c, "w1")
              .groupBy("doc_id", "source")
              .agg(F.count("*").cast("bigint").alias("n_bigrams"),
                   F.sum(sb).cast("bigint").alias("s")))
    return scored.select(
        "doc_id", "source", "n_bigrams",
        F.expr("CAST((s * 10000) DIV n_bigrams AS BIGINT)")
        .alias("score_key"))


@query(
    "mix_perplexity_buckets",
    f"""
    WITH {_SURPRISAL_KEYED_SQL},
    ranked AS (
      SELECT *,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY score_key DESC, doc_id) AS r,
             COUNT(*) OVER (PARTITION BY source) AS n_src
      FROM keyed
    )
    SELECT doc_id, source, n_bigrams, score_key,
           CAST(r AS BIGINT) AS src_rank,
           CASE WHEN (r - 1) * 3 < n_src THEN 'head'
                WHEN (r - 1) * 3 < 2 * n_src THEN 'middle'
                ELSE 'tail' END AS ppl_bucket
    FROM ranked
    """,
    doc="CCNet-style head/middle/tail perplexity bucketing: score every "
        "document under the corpus's self-trained word-bigram LM "
        "(text_lm_score's model), then split EACH SOURCE into fluency "
        "terciles — the standard pre-LLM corpus partition (keep head, "
        "sample middle, drop tail) that filters per-domain instead of "
        "penalizing whole domains for their register. Cross-engine "
        "determinism: the score is an INTEGER surprisal proxy — per "
        "bigram 64 + floor(log2 c2) - floor(log2 c1) (within 1 bit of "
        "the true log-prob, and floor(log2) of an exact integer count "
        "agrees bit-for-bit across engines), per doc (sum*10000) DIV "
        "n_bigrams — so ranks never hinge on a float ulp; both operands "
        "of the DIV are non-negative, where Spark's truncate and "
        "DuckDB's floor semantics coincide. The tercile is rank "
        "arithmetic: (r-1)*3 DIV n_src. Docs need >= 1 bigram (single-"
        "word docs carry no LM evidence and are excluded, like "
        "text_lm_score). Spark ranks through bucketed_range_rank on "
        "the integer key (key_max 640000) — per-source terciles WITHOUT "
        "a single-task-per-source window; the |sources|-row doc counts "
        "attach by broadcast. Scale: LM fit is the bigram-vocab "
        "shuffle; scoring joins carry NO broadcast hint — the model "
        "tables grow with the vocabulary, so AQE broadcasts them while "
        "small and falls back to (w1, w2)/(w1)-shuffled hash joins past "
        "the threshold instead of hitting the 8 GB broadcast cap; then "
        "one doc-keyed agg; ranking is the bucketed-rank shape every "
        "mix face shares",
)
def mix_perplexity_buckets(spark, sf_dir):
    keyed = doc_surprisal_keys(spread(T(spark, sf_dir, "documents")))
    ranked = bucketed_range_rank(keyed, ["source"], "score_key",
                                 "doc_id", key_max=640000,
                                 out_col="src_rank")
    nsrc = keyed.groupBy("source").agg(F.count("*").alias("n_src"))
    return (ranked.join(F.broadcast(nsrc), "source")
            .select("doc_id", "source", "n_bigrams", "score_key",
                    F.col("src_rank").cast("bigint").alias("src_rank"),
                    F.when((F.col("src_rank") - 1) * 3 < F.col("n_src"),
                           "head")
                    .when((F.col("src_rank") - 1) * 3 < 2 * F.col("n_src"),
                          "middle")
                    .otherwise("tail").alias("ppl_bucket")))


_WATERFILL_FRAC = 0.5   # budget = this fraction of the corpus's tokens

# Closed-form waterfilling tail over a `caps` CTE carrying
# (source, cap_tokens [, extra columns — they ride through to the
# output untouched]) — SHARED VERBATIM by mix_source_caps (raw
# capacities) and mix_dedup_budget (unique capacities after exact
# dedup), so the two allocations can never drift in the fold itself.
# Ends in an `alloc` CTE the caller SELECTs from. rf-string: the ONE
# budget constant (_WATERFILL_FRAC) is interpolated so the Spark path
# and the DuckDB oracle can never silently diverge when it is edited
# (same pattern as embed_matryoshka_budget's _MATRYOSHKA_QUERY_BUDGET).
_WATERFILL_SQL_TAIL = rf"""tot AS (SELECT SUM(cap_tokens) AS total, COUNT(*) AS m FROM caps),
    b AS (SELECT GREATEST(CAST(FLOOR(total * {_WATERFILL_FRAC}) AS BIGINT), 1)
                   AS budget, m FROM tot),
    ordered AS (
      SELECT caps.*,
             ROW_NUMBER() OVER (ORDER BY cap_tokens, source) AS k,
             SUM(cap_tokens) OVER (ORDER BY cap_tokens, source
                                   ROWS UNBOUNDED PRECEDING) AS s,
             LAG(cap_tokens) OVER (ORDER BY cap_tokens, source)
               AS prev_cap
      FROM caps
    ),
    cand AS (
      SELECT o.*, b.budget,
             CAST(b.budget - (o.s - o.cap_tokens) AS DOUBLE)
               / (b.m - o.k + 1) AS t_cand
      FROM ordered o CROSS JOIN b
    ),
    lvl AS (SELECT MIN(t_cand) AS t FROM cand
            WHERE t_cand < cap_tokens
              AND (prev_cap IS NULL OR prev_cap <= t_cand)),
    mx AS (SELECT MAX(cap_tokens) AS mc FROM caps),
    alloc AS (
      SELECT c.* EXCLUDE (k, s, prev_cap, t_cand),
             ROUND(COALESCE(l.t, CAST(mx.mc AS DOUBLE)), 4)
               AS water_level,
             ROUND(LEAST(CAST(c.cap_tokens AS DOUBLE),
                         COALESCE(l.t, CAST(mx.mc AS DOUBLE))), 4)
               AS alloc_tokens,
             CAST(CASE WHEN CAST(c.cap_tokens AS DOUBLE)
                            <= COALESCE(l.t, CAST(mx.mc AS DOUBLE))
                       THEN 1 ELSE 0 END AS INT) AS capped
      FROM cand c CROSS JOIN lvl l CROSS JOIN mx
    )"""


def waterfill_alloc(caps):
    """Closed-form waterfilling allocation over a capacity frame
    (source, cap_tokens [, extra columns ride through to the output]):
    allocate each source min(cap, t) where the water level t solves
    sum(min(cap_i, t)) = budget (_WATERFILL_FRAC of total capacity).
    The Spark twin of _WATERFILL_SQL_TAIL, shared verbatim by
    mix_source_caps and mix_dedup_budget so the fold cannot drift
    between them. All windows run on the |sources|-row caps table
    (metadata-sized, plan-gated post-aggregation by the callers'
    tests); integer prefix sums are exact and t is ONE double
    division."""
    tot = caps.agg(F.sum("cap_tokens").alias("total"),
                   F.count("*").alias("m"))
    b = tot.select(
        F.greatest(F.floor(F.col("total") * _WATERFILL_FRAC)
                   .cast("bigint"), F.lit(1)).alias("budget"), "m")
    w = Window.orderBy("cap_tokens", "source")   # |sources| rows
    ordered = (caps
               .withColumn("k", F.row_number().over(w))
               .withColumn("s", F.sum("cap_tokens").over(
                   w.rowsBetween(Window.unboundedPreceding, 0)))
               .withColumn("prev_cap", F.lag("cap_tokens").over(w)))
    cand = (ordered.crossJoin(F.broadcast(b))
            .withColumn(
                "t_cand",
                (F.col("budget") - (F.col("s") - F.col("cap_tokens")))
                .cast("double") / (F.col("m") - F.col("k") + 1)))
    lvl = (cand.filter(
        (F.col("t_cand") < F.col("cap_tokens"))
        & (F.col("prev_cap").isNull()
           | (F.col("prev_cap") <= F.col("t_cand"))))
        .agg(F.min("t_cand").alias("t")))
    mx = caps.agg(F.max("cap_tokens").alias("mc"))
    level = F.coalesce(F.col("t"), F.col("mc").cast("double"))
    return (cand.crossJoin(F.broadcast(lvl)).crossJoin(F.broadcast(mx))
            .select(
                *caps.columns, "budget",
                F.round(level, 4).alias("water_level"),
                F.round(F.least(F.col("cap_tokens").cast("double"),
                                level), 4).alias("alloc_tokens"),
                (F.col("cap_tokens").cast("double") <= level)
                .cast("int").alias("capped")))


@query(
    "mix_source_caps",
    rf"""
    WITH caps AS (
      SELECT source,
             CAST(SUM(LEN(REGEXP_EXTRACT_ALL(text,
                  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]'))) AS BIGINT)
               AS cap_tokens
      FROM documents GROUP BY source
    ),
    {_WATERFILL_SQL_TAIL}
    SELECT * FROM alloc
    """,
    doc="waterfilling token-budget allocation across sources: given a "
        "budget (half the corpus's BPE-ish tokens, tokenizer_fertility's "
        "regex), allocate each source min(capacity, t) where the water "
        "level t solves sum(min(cap_i, t)) = budget — the max-min fair "
        "split a mixture owner uses to spend a token budget WITHOUT "
        "letting one giant source absorb it (the closed-form sibling of "
        "mix_to_target_weights' fixed targets: here the targets EMERGE "
        "from capacities). Closed form, no iteration: sort sources by "
        "capacity, prefix-sum, per row k the candidate level t_k = "
        "(budget - S_{k-1}) / (m - k + 1) is valid iff t_k < cap_k and "
        "prev_cap <= t_k — exactly one row is valid for budget < total "
        "(the min() is a guard, not a chooser); budget >= total "
        "degenerates to alloc = cap via the max-capacity fallback. "
        "Integer prefix sums are exact; t is ONE double division. "
        "Scale: ONE map-side-combined hash-agg to |sources| rows, then "
        "every window (row_number / running sum / lag) runs on that "
        "metadata-sized table — plan-pinned post-aggregation in "
        "test_r13_faces. The fold itself (waterfill_alloc / "
        "_WATERFILL_SQL_TAIL) is shared verbatim with mix_dedup_budget, "
        "which waterfills UNIQUE-token capacities instead",
)
def mix_source_caps(spark, sf_dir):
    d = spread(T(spark, sf_dir, "documents"))
    tok = F.regexp_count("text",
                         F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
    caps = (d.groupBy("source")
            .agg(F.sum(tok).cast("bigint").alias("cap_tokens")))
    return waterfill_alloc(caps)


@query(
    "mix_dedup_budget",
    rf"""
    WITH f AS (
      SELECT doc_id, source,
             CAST(LEN(REGEXP_EXTRACT_ALL(text,
                  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS toks,
             MD5(LOWER(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g')))) AS fp
      FROM documents
    ),
    r AS (
      SELECT source, toks,
             ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id)
               AS copy_rank
      FROM f
    ),
    caps0 AS (
      SELECT source,
             CAST(SUM(toks) AS BIGINT) AS raw_tokens,
             CAST(SUM(CASE WHEN copy_rank = 1 THEN toks ELSE 0 END)
               AS BIGINT) AS cap_tokens
      FROM r GROUP BY source
    ),
    caps AS (
      SELECT source, raw_tokens, cap_tokens,
             ROUND(CAST(raw_tokens - cap_tokens AS DOUBLE)
                   / GREATEST(raw_tokens, 1), 6) AS dup_token_share
      FROM caps0
    ),
    {_WATERFILL_SQL_TAIL}
    SELECT * FROM alloc
    """,
    doc="dedup-aware token-budget waterfilling: the allocation a mix "
        "owner actually spends AFTER dedup — each source's capacity is "
        "its UNIQUE token mass (tokens of its exact-duplicate cluster "
        "CANONICALS only: the min-doc_id copy under dedup_exact's "
        "normalize->md5 fingerprint, so a mirror source whose every doc "
        "duplicates another source's canonical contributes ZERO "
        "capacity), and the waterfill fold (waterfill_alloc / "
        "_WATERFILL_SQL_TAIL, shared verbatim with mix_source_caps) "
        "levels the budget across those unique capacities. "
        "raw_tokens vs cap_tokens plus dup_token_share make the dup "
        "tax visible per source: allocating on RAW capacity (what "
        "mix_source_caps does) overweights heavily-duplicated sources "
        "by exactly that share. Determinism: token counts and prefix "
        "sums are integers; dup_token_share and the level are single "
        "guarded divisions ROUNDed; cluster canonicals tie on doc_id. "
        "Scale: one scan computes (toks, fp) per doc, ONE shuffle on "
        "the high-cardinality fingerprint (per-task work = cluster "
        "size, the dedup_cluster_cap bound — never a single-task "
        "window), then ONE hash-agg to |sources| rows and the "
        "metadata-sized waterfill windows",
)
def mix_dedup_budget(spark, sf_dir):
    d = spread(T(spark, sf_dir, "documents"))
    tok = F.regexp_count("text",
                         F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
    fp = F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
    f = d.select("doc_id", "source", tok.cast("bigint").alias("toks"),
                 fp.alias("fp"))
    w = Window.partitionBy("fp").orderBy("doc_id")
    r = f.withColumn("copy_rank", F.row_number().over(w))
    keep_toks = (F.when(F.col("copy_rank") == 1, F.col("toks"))
                 .otherwise(F.lit(0)))
    caps = (r.groupBy("source")
            .agg(F.sum("toks").cast("bigint").alias("raw_tokens"),
                 F.sum(keep_toks).cast("bigint").alias("cap_tokens"))
            .withColumn(
                "dup_token_share",
                F.round((F.col("raw_tokens") - F.col("cap_tokens"))
                        .cast("double")
                        / F.greatest(F.col("raw_tokens"), F.lit(1)), 6)))
    return waterfill_alloc(caps)


# --------------------------------------------------------------------------
# r14: rule-gate vs LM-fluency agreement
# --------------------------------------------------------------------------
@query(
    "quality_lm_agreement",
    f"""
    WITH {_GOPHER_FLAGS_SQL},
    p AS (SELECT doc_id,
                 CAST((r1 + r2 + r3 + r4 + r5) = 5 AS INT) AS pass
          FROM r),
    {_SURPRISAL_KEYED_SQL},
    j AS (
      SELECT k.source, p.pass, k.score_key
      FROM keyed k JOIN p ON k.doc_id = p.doc_id
    ),
    m AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(pass) AS BIGINT) AS n_pass,
             CAST(SUM(CAST(pass AS DECIMAL(38,0))
                      * CAST(score_key AS DECIMAL(38,0)))
               AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(CAST(score_key AS DECIMAL(38,0)))
               AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(score_key AS DECIMAL(38,0))
                      * CAST(score_key AS DECIMAL(38,0)))
               AS DECIMAL(38,0)) AS syy
      FROM j GROUP BY source
    )
    SELECT source, n_docs, n_pass,
           ROUND(CAST(sxy AS DOUBLE) / NULLIF(n_pass, 0), 4)
             AS mean_score_pass,
           ROUND(CAST(sy - sxy AS DOUBLE)
                 / NULLIF(n_docs - n_pass, 0), 4) AS mean_score_fail,
           ROUND(CAST(CAST(n_docs AS DECIMAL(38,0)) * sxy
                      - CAST(n_pass AS DECIMAL(38,0)) * sy AS DOUBLE)
                 / NULLIF(SQRT(
                     CAST(CAST(n_docs AS DECIMAL(38,0))
                          * CAST(n_pass AS DECIMAL(38,0))
                          - CAST(n_pass AS DECIMAL(38,0))
                          * CAST(n_pass AS DECIMAL(38,0)) AS DOUBLE)
                     * CAST(CAST(n_docs AS DECIMAL(38,0)) * syy
                            - sy * sy AS DOUBLE)), 0), 6) AS pearson_r
    FROM m
    """,
    doc="rule-gate vs LM-fluency AGREEMENT: per source, does the Gopher "
        "gate's pass bit correlate with the bigram-LM surprisal the "
        "perplexity faces rank by? (The DataComp/CCNet filter-design "
        "question: two filters that agree are redundant — run the "
        "cheaper scan-only gate; two that disagree each earn their "
        "cost.) Reports docs with LM evidence, gate passes, mean "
        "surprisal key among passes vs fails, and the exact-moment "
        "Pearson r between the 0/1 pass bit and the integer surprisal "
        "key (negative r = the gate keeps fluent docs — lower surprisal "
        "— i.e. the filters agree). Both inputs shared VERBATIM with "
        "their owning faces: the pass bit is with_gopher_metrics / "
        "_GOPHER_FLAGS_SQL (the gate), the score is doc_surprisal_keys "
        "/ _SURPRISAL_KEYED_SQL (the terciles), so the agreement is "
        "measured on exactly what those faces enforce. Determinism: "
        "x is 0/1 and y is an integer key, so every moment (sxy, sy, "
        "syy) is an exact DECIMAL(38,0) integer sum (the burstiness "
        "idiom — order-free, overflow-safe at corpus scale); r is ONE "
        "double expression over those exact integers (SQRT is "
        "correctly-rounded IEEE in both engines), NULL when a source "
        "is all-pass/all-fail or constant-score (zero variance). "
        "Docs need >= 1 bigram (no LM evidence otherwise — same "
        "exclusion as the tercile face). Scale: the LM fit is the "
        "bigram-vocab shuffle (size-adaptive joins, no broadcast "
        "hints); the gate is a zero-exchange scan; ONE doc_id equi-join "
        "ties them; ONE hash-agg lands on |sources| rows",
)
def quality_lm_agreement(spark, sf_dir):
    from .llm_ops import GOPHER_RULES, with_gopher_metrics

    d = spread(T(spark, sf_dir, "documents"))
    flags = with_gopher_metrics(d.select("doc_id", "text"))
    tot = sum((F.col(a) for a in GOPHER_RULES[1:]),
              F.col(GOPHER_RULES[0]))
    p = flags.select("doc_id", (tot == 5).cast("int").alias("pass"))
    keyed = doc_surprisal_keys(d)
    j = keyed.join(p, "doc_id").select("source", "pass", "score_key")

    def dec(c):
        return c.cast("decimal(38,0)")

    m = j.groupBy("source").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.sum("pass").cast("bigint").alias("n_pass"),
        F.sum(dec(F.col("pass")) * dec(F.col("score_key")))
        .cast("decimal(38,0)").alias("sxy"),
        F.sum(dec(F.col("score_key")))
        .cast("decimal(38,0)").alias("sy"),
        F.sum(dec(F.col("score_key")) * dec(F.col("score_key")))
        .cast("decimal(38,0)").alias("syy"))
    nd, np_ = F.col("n_docs"), F.col("n_pass")
    sxy, sy, syy = F.col("sxy"), F.col("sy"), F.col("syy")
    num = (dec(nd) * sxy - dec(np_) * sy).cast("double")
    varx = (dec(nd) * dec(np_) - dec(np_) * dec(np_)).cast("double")
    vary = (dec(nd) * syy - sy * sy).cast("double")
    den = F.sqrt(varx * vary)
    return m.select(
        "source", "n_docs", "n_pass",
        F.round(F.when(np_ != 0, sxy.cast("double") / np_), 4)
        .alias("mean_score_pass"),
        F.round(F.when(nd - np_ != 0,
                       (sy - sxy).cast("double") / (nd - np_)), 4)
        .alias("mean_score_fail"),
        F.round(F.when(den != 0, num / den), 6).alias("pearson_r"))


_REPEAT_EPOCH_CAP = 4   # max useful epochs of repetition (Muennighoff
# et al. 2023: past ~4 epochs the return on repeating data collapses)


@query(
    "mix_repeat_budget",
    rf"""
    WITH f AS (
      SELECT doc_id, source,
             CAST(LEN(REGEXP_EXTRACT_ALL(text,
                  '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) AS BIGINT) AS toks,
             MD5(LOWER(TRIM(REGEXP_REPLACE(text, '\s+', ' ', 'g')))) AS fp
      FROM documents
    ),
    r AS (
      SELECT source, toks,
             ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id)
               AS copy_rank
      FROM f
    ),
    caps AS (
      SELECT source,
             CAST(SUM(CASE WHEN copy_rank = 1 THEN toks ELSE 0 END)
               AS BIGINT) AS unique_tokens,
             CAST({_REPEAT_EPOCH_CAP}
                  * SUM(CASE WHEN copy_rank = 1 THEN toks ELSE 0 END)
               AS BIGINT) AS cap_tokens
      FROM r GROUP BY source
    ),
    {_WATERFILL_SQL_TAIL}
    SELECT *,
           ROUND(alloc_tokens / NULLIF(unique_tokens, 0), 4) AS epochs
    FROM alloc
    """,
    doc="data-constrained REPETITION plan (Muennighoff et al. 2023, "
        "'Scaling Data-Constrained Language Models'): when the token "
        "budget exceeds the deduped corpus, repetition fills the gap — "
        "but only up to ~4 epochs pays. Each source's capacity is its "
        f"unique token mass x {_REPEAT_EPOCH_CAP} (the epoch ceiling), "
        "the budget is _WATERFILL_FRAC of that trainable mass (> the "
        "unique total — the data-constrained regime by construction), "
        "and the SAME closed-form fold as mix_source_caps / "
        "mix_dedup_budget (waterfill_alloc / _WATERFILL_SQL_TAIL, "
        "shared verbatim) levels it: epochs = alloc / unique is the "
        "per-source repetition count the plan actually schedules, "
        f"<= {_REPEAT_EPOCH_CAP} by the ceiling, NULL for a "
        "zero-unique mirror source. Unique capacity uses dedup_exact's "
        "canonical rule (min-doc_id per normalized-md5 cluster), "
        "identical to mix_dedup_budget so the two plans price the same "
        "dedup. Determinism: capacities and prefix sums are integers; "
        "the level and epochs are single guarded divisions ROUNDed. "
        "Scale: ONE fingerprint shuffle + ONE hash-agg to |sources| "
        "rows + metadata-sized waterfill windows — mix_dedup_budget's "
        "exact shape",
)
def mix_repeat_budget(spark, sf_dir):
    d = spread(T(spark, sf_dir, "documents"))
    tok = F.regexp_count("text",
                         F.lit(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"))
    fp = F.md5(F.lower(F.trim(F.regexp_replace("text", r"\s+", " "))))
    f = d.select("doc_id", "source", tok.cast("bigint").alias("toks"),
                 fp.alias("fp"))
    w = Window.partitionBy("fp").orderBy("doc_id")
    r = f.withColumn("copy_rank", F.row_number().over(w))
    keep_toks = (F.when(F.col("copy_rank") == 1, F.col("toks"))
                 .otherwise(F.lit(0)))
    caps = (r.groupBy("source")
            .agg(F.sum(keep_toks).cast("bigint").alias("unique_tokens"))
            .select("source", "unique_tokens",
                    (F.lit(_REPEAT_EPOCH_CAP) * F.col("unique_tokens"))
                    .cast("bigint").alias("cap_tokens")))
    alloc = waterfill_alloc(caps)
    return alloc.select(
        "*",
        F.round(F.col("alloc_tokens")
                / F.when(F.col("unique_tokens") != 0,
                         F.col("unique_tokens")), 4).alias("epochs"))
