"""Focused pins for the r14 OPTIMIZATION rewrites: each changed operator's
new internals are exercised on an edge fixture the sf testdata does not
cover, asserting value-equality against a straightforward reference
formulation (the shape the oracle SQL states).

Covered rewrites:
- agg_trimmed_mean: value-histogram selection vs rank-trim, with the trim
  boundary landing INSIDE a tied value run (the clamped-overlap case).
- join_asof: per-customer packed-array as-of pick vs the fan-out
  join+argmax, including an event with no qualifying order (must drop)
  and a tie-free latest-date pick.
- doc_fingerprint_winnow: row-local slice/array_min window vs the
  window-function formulation on a short doc whose tail windows truncate.
- simhash_fingerprints: one-agg 64-vote formulation vs the staged
  nibble-count fold on a tiny corpus (exact int64 fingerprints).
- text_token_counts: n_bpe_tokens == n_alpha + n_num + n_sym on
  mixed-alphabet text (disjoint-class structural identity).
- text_kgram_dup_profile: min!=max dup test + left-semi dup-position count
  + row-local n_grams vs the countDistinct+stats-join formulation, with a
  doc repeating its own gram (must not count as duplicated).
- agg_count_min_sketch: sketch folded from the vocab-count table vs the
  token-instance explode (cell-for-cell integer equality).
- dq_psi_drift: conditional counts aggregated BEFORE the grid join vs the
  grid-LEFT-JOIN-facts plan, including all-zero grid buckets.
- matryoshka cosines: shared products array slice-folds vs per-k zip_with
  recomputation (bit-exact, incl. the zero-norm NULL-guard path).
"""
from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def test_trimmed_mean_histogram_matches_rank_trim_on_tied_boundary(spark):
    # 40 rows of value 1.0 then 60 of 2.0 per flag: n=100, n_excl=3 —
    # the kept band [3, 97) cuts INSIDE both tied runs
    rows = ([("A", 1.0)] * 40 + [("A", 2.0)] * 60
            + [("B", 5.0)] * 3 + [("B", 7.0)] * 1)   # B: n=4, n_excl=1
    df = spark.createDataFrame(rows, "flag string, q double")

    # reference: the oracle's rank formulation
    w = Window.partitionBy("flag").orderBy("q")
    wc = Window.partitionBy("flag")
    n_excl = F.ceil(F.col("n") * F.lit(0.025)).cast("bigint")
    ref = (df.select("flag", "q", F.row_number().over(w).alias("rn"),
                     F.count("*").over(wc).alias("n"))
           .filter((F.col("rn") > n_excl)
                   & (F.col("rn") <= F.col("n") - n_excl))
           .groupBy("flag").agg(F.round(F.avg("q"), 4).alias("m")))

    # the rewrite's histogram formulation (same expressions as
    # tpch_core.agg_trimmed_mean, applied to this frame)
    hist = df.groupBy("flag", "q").agg(F.count("*").alias("cnt"))
    wf = Window.partitionBy("flag")
    wo = wf.orderBy("q").rowsBetween(Window.unboundedPreceding, 0)
    h = (hist.withColumn("n", F.sum("cnt").over(wf))
         .withColumn("cum", F.sum("cnt").over(wo)))
    ne = F.ceil(F.col("n") * F.lit(0.025)).cast("bigint")
    lo = F.greatest(F.col("cum") - F.col("cnt"), ne)
    hi = F.least(F.col("cum"), F.col("n") - ne)
    kept = F.greatest(hi - lo, F.lit(0).cast("bigint"))
    got = (h.groupBy("flag")
           .agg(F.sum(kept.cast("double") * F.col("q")).alias("_s"),
                F.sum(kept).alias("_k"))
           .filter(F.col("_k") > 0)
           .select("flag", F.round(F.col("_s") / F.col("_k").cast("double"),
                                   4).alias("m")))
    assert sorted(ref.collect()) == sorted(got.collect())


def test_join_asof_rowlocal_matches_fanout_join(spark):
    from process_nwb_spark.relational.core import all_queries

    sf = "/root/testdata/sf0.001"
    got = {r["event_id"]: (r["asof_orderkey"], r["asof_totalprice"])
           for r in all_queries()["join_asof"].fn(spark, sf).collect()}

    # reference: the pre-r14 fan-out formulation
    from process_nwb_spark.relational.core import T
    e = T(spark, sf, "events")
    o = T(spark, sf, "orders")
    j = e.join(o, (o.o_custkey == e.user_id) & (o.o_orderdate <= e.ts))
    packed = (F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
              .cast("bigint") * F.lit(10_000_000_000).cast("bigint")
              + F.col("o_orderkey"))
    best = (j.groupBy("event_id").agg(F.max(packed).alias("_pk"))
            .select("event_id",
                    (F.col("_pk") % F.lit(10_000_000_000).cast("bigint"))
                    .alias("asof_orderkey")))
    dim = o.select("o_orderkey", F.col("o_totalprice").cast("double")
                   .alias("asof_totalprice"))
    ref = {r["event_id"]: (r["asof_orderkey"], r["asof_totalprice"])
           for r in best.join(dim, best.asof_orderkey == dim.o_orderkey)
           .drop("o_orderkey").collect()}
    assert got == ref


def test_join_asof_drops_event_with_no_qualifying_order(spark):
    ev = spark.createDataFrame(
        [(1, "2020-01-01 00:00:00", 10), (2, "2020-01-01 00:00:00", 20)],
        "event_id long, ts string, user_id long"
    ).withColumn("ts", F.to_timestamp("ts"))
    od = spark.createDataFrame(
        [(100, 10, "2019-12-01", 5.0),    # qualifies for event 1
         (200, 20, "2021-01-01", 7.0)],   # AFTER event 2's ts: must drop
        "o_orderkey long, o_custkey long, o_orderdate string, "
        "o_totalprice double"
    ).withColumn("o_orderdate", F.to_date("o_orderdate"))

    packed = (F.datediff(F.col("o_orderdate"), F.lit("1970-01-01"))
              .cast("bigint") * F.lit(10_000_000_000).cast("bigint")
              + F.col("o_orderkey"))
    per_cust = (od.groupBy("o_custkey")
                .agg(F.collect_list(F.struct(
                    packed.alias("pk"),
                    F.col("o_orderdate").alias("d"),
                    F.col("o_totalprice").alias("p"))).alias("_orders")))
    best = F.array_max(F.transform(
        F.filter("_orders", lambda s: s["d"] <= F.col("ts")),
        lambda s: F.struct(s["pk"].alias("pk"), s["p"].alias("p"))))
    out = (ev.join(per_cust, ev.user_id == per_cust.o_custkey)
           .select("event_id", best.alias("_b"))
           .filter(F.col("_b").isNotNull())
           .select("event_id",
                   (F.col("_b.pk") % F.lit(10_000_000_000).cast("bigint"))
                   .alias("asof_orderkey"))).collect()
    assert [(r["event_id"], r["asof_orderkey"]) for r in out] == [(1, 100)]


def test_winnow_rowlocal_matches_window_formulation(spark):
    # 6-word doc -> 4 shingles -> 4 windows, the last three truncated
    docs = spark.createDataFrame(
        [(1, "a b c d e f"), (2, "x y z"), (3, "too short")],
        "doc_id long, text string")
    words = F.split("text", " ")
    k = 3
    sh = F.transform(F.sequence(F.lit(0), F.size(words) - k),
                     lambda i: F.array_join(F.slice(words, i + 1, k), " "))
    ref_rows = (docs.filter(F.size(words) >= k)
                .select("doc_id", F.posexplode(sh).alias("pos", "sh"))
                .select("doc_id", "pos", F.md5("sh").alias("h")))
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    ref = set(map(tuple, ref_rows
                  .select("doc_id", F.min("h").over(w).alias("fp"))
                  .distinct().collect()))

    shh = F.transform(F.sequence(F.lit(0), F.size(words) - k),
                      lambda i: F.md5(F.array_join(F.slice(words, i + 1, k),
                                                   " ")))
    wins = F.element_at(
        F.transform(F.array(F.struct(shh.alias("h"))),
                    lambda st: F.transform(
                        F.sequence(F.lit(1), F.size(st["h"])),
                        lambda i: F.array_min(F.slice(st["h"], i, 4)))), 1)
    got = set(map(tuple, docs.filter(F.size(words) >= k)
                  .select("doc_id",
                          F.explode(F.array_distinct(wins)).alias("fp"))
                  .collect()))
    assert got == ref and len(got) > 0
    # doc 2 (3 words -> 1 shingle) must contribute exactly one fp
    assert len([1 for d, _ in got if d == 2]) == 1


def test_simhash_one_agg_matches_staged_fold(spark):
    docs = spark.createDataFrame(
        [(1, "the quick brown fox"), (2, "the the the"), (3, "zz")],
        "doc_id long, text string")
    tok = (docs.select("doc_id", F.explode(F.split("text", " ")).alias("w"))
           .select("doc_id", F.md5("w").alias("h")))

    # staged (pre-r14) formulation
    nib = (tok.select("doc_id",
                      F.explode(F.sequence(F.lit(0), F.lit(15))).alias("p"),
                      "h")
           .select("doc_id", "p",
                   F.expr("CAST(conv(substr(h, p + 1, 1), 16, 10) AS INT)")
                   .alias("val")))
    cnt = nib.groupBy("doc_id", "p", "val").agg(F.count("*").alias("c"))
    votes = (cnt.select("doc_id", "p", "val", "c",
                        F.explode(F.sequence(F.lit(0), F.lit(3))).alias("j"))
             .select("doc_id", (F.col("p") * 4 + F.col("j")).alias("b"),
                     (F.col("c") * F.expr("((val >> j) & 1) * 2 - 1"))
                     .alias("sv"))
             .groupBy("doc_id", "b").agg(F.sum("sv").alias("v")))
    ref = dict(votes.groupBy("doc_id").agg(
        F.sum(F.when(
            F.col("v") > 0,
            F.expr("CASE WHEN b = 63 THEN (CAST(1 AS BIGINT) << 62) * -2 "
                   "ELSE CAST(1 AS BIGINT) << CAST(b AS INT) END"))
        .otherwise(0)).cast("long").alias("s")).collect())

    # one-agg (r14) formulation
    vote_aggs = []
    for p in range(16):
        nb = F.expr(f"CAST(conv(substr(h, {p + 1}, 1), 16, 10) AS INT)")
        for j in range(4):
            vote_aggs.append(
                F.sum(F.shiftright(nb, j).bitwiseAND(F.lit(1)) * 2 - 1)
                .alias(f"v{p * 4 + j}"))
    v = tok.groupBy("doc_id").agg(*vote_aggs)
    terms = [F.when(F.col(f"v{b}") > 0,
                    F.lit(((1 << 62) * -2) if b == 63 else (1 << b))
                    .cast("long")).otherwise(F.lit(0).cast("long"))
             for b in range(64)]
    fp = terms[0]
    for t in terms[1:]:
        fp = fp + t
    got = dict(v.select("doc_id", fp.cast("long").alias("s")).collect())
    assert got == ref


def test_bpe_token_count_is_sum_of_disjoint_classes(spark):
    docs = spark.createDataFrame(
        [(1, "abc123!?x y9 .."), (2, ""), (3, "  a1b2c3  ")],
        "doc_id long, text string")
    bpe = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"
    chk = docs.select(
        (F.regexp_count("text", F.lit(bpe))
         == (F.regexp_count("text", F.lit(r"[A-Za-z]+"))
             + F.regexp_count("text", F.lit(r"[0-9]+"))
             + F.regexp_count("text", F.lit(r"[^A-Za-z0-9\s]"))))
        .alias("ok"))
    assert all(r["ok"] for r in chk.collect())


def test_triangles_adjacency_closure_on_known_graph(spark, tmp_path):
    """graph_triangles' r14 closure (per-edge array_intersect of oriented
    adjacency arrays, no wedge table) on a hand-computable basket graph:
    K4 on parts 1-4 (one order holds all four, so every sub-pair edge
    exists) plus the isolated edge {5,6}, with duplicate co-purchases
    across orders to exercise the DISTINCT edge set. Expected:
    n_nodes=6, n_edges=7, n_wedges=sum d(d-1)/2=12, n_triangles=C(4,3)=4.
    Also pins value-equality against the pre-r14 wedge+semi-join
    formulation on the same fixture, and that the face's plan closes via
    array_intersect with no LeftSemi wedge join."""
    from process_nwb_spark.plans.inspect import formatted_plan
    from process_nwb_spark.relational.core import all_queries

    rows = [(1, 1), (1, 2), (1, 3),          # triangle {1,2,3}
            (3, 1), (3, 3),                  # duplicate edge {1,3}
            (4, 5), (4, 6),                  # isolated edge {5,6}
            (5, 1), (5, 2), (5, 3), (5, 4),  # K4 on {1,2,3,4}
            (5, 4)]                          # duplicate row entirely
    d = str(tmp_path / "tri")
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long") \
        .write.parquet(f"{d}/lineitem.parquet")

    got = all_queries()["graph_triangles"].fn(spark, d)
    row = got.collect()[0]
    assert (row["n_nodes"], row["n_edges"], row["n_wedges"],
            row["n_triangles"]) == (6, 7, 12, 4)

    # pre-r14 reference closure: enumerate oriented wedges, semi-join
    # back to the canonical edge set (the oracle SQL's shape)
    lines = (spark.read.parquet(f"{d}/lineitem.parquet")
             .select(F.col("l_orderkey").alias("ok"),
                     F.col("l_partkey").alias("pk")).distinct())
    b = lines.select(F.col("ok").alias("ok2"), F.col("pk").alias("pk2"))
    edges = (lines.join(b, (F.col("ok") == F.col("ok2"))
                        & (F.col("pk") < F.col("pk2")))
             .select(F.col("pk").alias("u"), F.col("pk2").alias("v"))
             .distinct())
    deg = (edges.select(F.col("u").alias("node"))
           .unionAll(edges.select(F.col("v").alias("node")))
           .groupBy("node").agg(F.count("*").alias("d")))
    du = deg.select(F.col("node").alias("un"), F.col("d").alias("ud"))
    dv = deg.select(F.col("node").alias("vn"), F.col("d").alias("vd"))
    u_first = ((F.col("ud") < F.col("vd"))
               | ((F.col("ud") == F.col("vd")) & (F.col("u") < F.col("v"))))
    oriented = (edges.join(du, F.col("u") == F.col("un"))
                .join(dv, F.col("v") == F.col("vn"))
                .select(F.when(u_first, F.col("u")).otherwise(F.col("v"))
                        .alias("src"),
                        F.when(u_first, F.col("v")).otherwise(F.col("u"))
                        .alias("dst")))
    o2 = oriented.select(F.col("src").alias("src2"),
                         F.col("dst").alias("dst2"))
    wedges = (oriented.join(o2, (F.col("src") == F.col("src2"))
                            & (F.col("dst") < F.col("dst2")))
              .select(F.col("dst").alias("wu"), F.col("dst2").alias("wv")))
    ref = (wedges.join(edges, (F.col("wu") == F.col("u"))
                       & (F.col("wv") == F.col("v")), "left_semi")
           .agg(F.count("*").alias("n")).collect()[0]["n"])
    assert ref == row["n_triangles"] == 4

    plan = formatted_plan(got, "simple")
    assert "array_intersect" in plan, plan
    assert "LeftSemi" not in plan, plan


def test_kgram_semi_join_matches_stats_join(spark, tmp_path):
    """text_kgram_dup_profile's r14 closure (min!=max dup test, left-semi
    dup-position count, row-local n_grams) against the pre-r14
    countDistinct+stats-join formulation, on a fixture the sf data does
    not cover: a doc REPEATING its own gram (same h twice in one doc must
    NOT count as duplicated), a doc with zero duplicated grams, and a
    shared 8-token gram across two docs."""
    from process_nwb_spark.relational.core import all_queries
    from process_nwb_spark.relational.llm_ops import _KG

    shared = " ".join(f"s{i}" for i in range(_KG))            # 8 tokens
    self_rep = " ".join(f"r{i}" for i in range(_KG)) + " x " \
        + " ".join(f"r{i}" for i in range(_KG))               # h twice, 1 doc
    rows = [(1, shared + " aa bb cc"),
            (2, "zz " + shared),
            (3, self_rep),
            (4, " ".join(f"u{i}" for i in range(_KG + 2))),   # all unique
            (5, "too short")]
    d = str(tmp_path / "kgram")
    spark.createDataFrame(rows, "doc_id long, text string") \
        .withColumn("source", F.lit("s")) \
        .write.parquet(f"{d}/documents.parquet")

    got = {r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_ratio"])
           for r in all_queries()["text_kgram_dup_profile"].fn(
               spark, d).collect()}

    # pre-r14 reference: df-count the gram table, join every position
    words = F.split("text", " ")
    sh = F.transform(
        F.sequence(F.lit(0), F.size(words) - _KG),
        lambda i: F.md5(F.array_join(F.slice(words, i + 1, _KG), " ")))
    g = (spark.read.parquet(f"{d}/documents.parquet")
         .filter(F.size(words) >= _KG)
         .select("doc_id", F.explode(sh).alias("h")))
    stats = g.groupBy("h").agg(F.countDistinct("doc_id").alias("ndocs"))
    dup = F.when(F.col("ndocs") >= 2, 1).otherwise(0)
    ref = {r["doc_id"]: (r["n_grams"], r["n_dup_grams"], r["dup_ratio"])
           for r in g.join(stats, "h").groupBy("doc_id")
           .agg(F.count("*").cast("bigint").alias("n_grams"),
                F.sum(dup).cast("bigint").alias("n_dup_grams"),
                F.round(F.sum(dup).cast("double") / F.count("*"), 4)
                .alias("dup_ratio")).collect()}
    assert got == ref
    assert got[3][1] == 0            # self-repeat is NOT a duplicate
    assert got[1][1] >= 1 and got[2][1] >= 1   # the shared gram is
    assert 5 not in got              # short doc drops on both paths


def test_cms_from_vocab_counts_matches_instance_fold(spark):
    """agg_count_min_sketch's r14 sketch build (sum of exact_cnt over the
    vocab table) is cell-for-cell the instance-explode fold it replaced:
    cms[r][idx] counts token INSTANCES either way."""
    docs = spark.createDataFrame(
        [(1, "a b a c"), (2, "b b a"), (3, "d")],
        "doc_id long, text string")
    tok = docs.select(F.explode(F.split("text", " ")).alias("w"))
    rows = F.explode(F.sequence(F.lit(0), F.lit(3))).alias("r")
    bucket = F.expr("CAST(conv(substr(md5(concat(w, ':', "
                    "CAST(r AS STRING))), 1, 2), 16, 10) AS INT)")
    ref = dict(((r["r"], r["idx"]), r["c"]) for r in
               tok.select("w", rows).select("r", bucket.alias("idx"))
               .groupBy("r", "idx")
               .agg(F.count("*").cast("bigint").alias("c")).collect())
    exact = tok.groupBy("w").agg(F.count("*").cast("bigint")
                                 .alias("exact_cnt"))
    got = dict(((r["r"], r["idx"]), r["c"]) for r in
               exact.select("w", "exact_cnt", rows)
               .select("r", bucket.alias("idx"), "exact_cnt")
               .groupBy("r", "idx")
               .agg(F.sum("exact_cnt").cast("bigint").alias("c")).collect())
    assert got == ref and len(got) > 0


def test_psi_aggregate_before_grid_matches_join_then_agg(spark):
    """dq_psi_drift's r14 shape (conditional counts folded BEFORE the
    grid join, the streaming twin's shape) produces the same complete
    (event_type, bkt, cb, cc) grid as the pre-r14 grid-LEFT-JOIN-facts
    plan — including all-zero buckets that exist only in the grid."""
    from process_nwb_spark.relational.dataprep import (
        psi_bucketize, psi_cent_col, psi_edges, psi_grid)

    ev = spark.createDataFrame(
        [("a", 0.01 * i, i >= 60) for i in range(100)]
        + [("b", 1.0, False)] * 10,            # type b: baseline only —
        "event_type string, value double, cur boolean")  # cc all zero
    cents = ev.select("event_type", psi_cent_col("value"),
                      (~F.col("cur")).alias("is_base"))
    edges = psi_edges(cents.filter("is_base"))

    ref = {(r["event_type"], r["bkt"]): (r["cb"], r["cc"]) for r in
           (psi_grid(edges)
            .join(psi_bucketize(cents, edges)
                  .select("event_type", "is_base", "bkt"),
                  ["event_type", "bkt"], "left")
            .groupBy("event_type", "bkt")
            .agg(F.coalesce(F.sum(F.when(F.col("is_base"), 1)
                                  .otherwise(0)), F.lit(0)).alias("cb"),
                 F.coalesce(F.sum(F.when(~F.col("is_base"), 1)
                                  .otherwise(0)), F.lit(0)).alias("cc"))
            ).collect()}
    bc = (psi_bucketize(cents, edges)
          .groupBy("event_type", "bkt")
          .agg(F.sum(F.when(F.col("is_base"), 1).otherwise(0)).alias("b"),
               F.sum(F.when(~F.col("is_base"), 1).otherwise(0)).alias("n")))
    got = {(r["event_type"], r["bkt"]): (r["cb"], r["cc"]) for r in
           (psi_grid(edges).join(bc, ["event_type", "bkt"], "left")
            .select("event_type", "bkt",
                    F.coalesce("b", F.lit(0)).alias("cb"),
                    F.coalesce("n", F.lit(0)).alias("cc"))).collect()}
    assert got == ref
    # the all-zero current side of type b survives the agg-first shape
    assert sum(cc for (t, _), (_, cc) in got.items() if t == "b") == 0
    assert sum(cb for (t, _), (cb, _) in got.items() if t == "b") == 10


def test_matryoshka_shared_products_cosines_bitexact(spark):
    """the r14 shared-products rewrite folds slices of ONE products array;
    each prefix sum adds the same doubles in the same order as the per-k
    zip_with recomputation, so cosines are bit-identical — exercised on a
    fixture with a zero-norm prefix (NULL-guard path)."""
    vecs = [(0, [1.0, 2.0, 3.0, 4.0]),
            (1, [0.0, 0.0, 1.0, -1.0]),     # zero-norm 2-prefix
            (2, [0.3, -0.7, 0.1, 0.9])]
    e = spark.createDataFrame(vecs, "vec_id long, emb array<double>")
    q = spark.createDataFrame([([0.5, -0.5, 2.0, 1.0],)],
                              "qv array<double>")
    pair = e.crossJoin(F.broadcast(q))

    def cos_old(k):
        dot = F.aggregate(
            F.zip_with(F.slice("emb", 1, k), F.slice("qv", 1, k),
                       lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x)
        nrm = lambda c: F.sqrt(F.aggregate(   # noqa: E731
            F.transform(F.slice(c, 1, k), lambda x: x * x),
            F.lit(0.0), lambda acc, x: acc + x))
        prod = nrm("emb") * nrm("qv")
        return F.round(dot / F.when(prod != 0.0, prod), 6)

    w = pair.select(
        "vec_id",
        F.zip_with("emb", "qv", lambda x, y: x * y).alias("_p"),
        F.transform("emb", lambda x: x * x).alias("_e"),
        F.transform("qv", lambda x: x * x).alias("_q"))

    def cos_new(k):
        fold = lambda c: F.aggregate(   # noqa: E731
            F.slice(c, 1, k), F.lit(0.0), lambda acc, x: acc + x)
        prod = F.sqrt(fold("_e")) * F.sqrt(fold("_q"))
        return F.round(fold("_p") / F.when(prod != 0.0, prod), 6)

    for k in (2, 4):
        old = {r["vec_id"]: r["c"] for r in
               pair.select("vec_id", cos_old(k).alias("c")).collect()}
        new = {r["vec_id"]: r["c"] for r in
               w.select("vec_id", cos_new(k).alias("c")).collect()}
        assert old == new
    # the zero-norm prefix really exercised the NULL guard
    assert {r["vec_id"]: r["c"] for r in
            w.select("vec_id", cos_new(2).alias("c")).collect()}[1] is None


def test_containment_shingle_table_is_persisted_once(spark):
    """text_ngram_containment's folded per-shingle doc-set table feeds
    two consumers (row-local sizes + pair explodes); the r14 persist pins
    the plan so each consumer reads the one cached table instead of
    recomputing the explode+df-cut+fold from the documents scan."""
    from process_nwb_spark.plans.inspect import formatted_plan
    from process_nwb_spark.relational.core import all_queries

    df = all_queries()["text_ngram_containment"].fn(
        spark, "/root/testdata/sf0.001")
    plan = formatted_plan(df, "simple")
    assert "InMemoryTableScan" in plan, plan
