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


def test_containment_shingle_table_is_persisted_once(spark):
    """text_ngram_containment's df-cut shingle table feeds three
    consumers (sizes + both self-join sides); the r14 persist pins the
    plan so each consumer reads the one cached table instead of
    recomputing the explode+df-cut join from the documents scan."""
    from process_nwb_spark.plans.inspect import formatted_plan
    from process_nwb_spark.relational.core import all_queries

    df = all_queries()["text_ngram_containment"].fn(
        spark, "/root/testdata/sf0.001")
    plan = formatted_plan(df, "simple")
    assert "InMemoryTableScan" in plan, plan
