"""Round-11 face pins: DoReMi reweighting, curriculum interleave, NDCG@10.

Each pin replays the face's math independently (pandas/python/numpy) or
asserts the invariant the face's docstring sells — the same discipline as
test_round{7b,8,9,10}_faces.py.
"""
import math

import numpy as np

from process_nwb_spark.relational.core import all_queries

SF = "/root/testdata/sf0.01"


# ---------------------------------------------------------------------------
# mix_doremi_weights
# ---------------------------------------------------------------------------
def test_doremi_weights_sum_to_one_and_upweight_hard_domains(spark):
    pdf = all_queries()["mix_doremi_weights"].fn(spark, SF).toPandas()
    assert len(pdf) == 20 and pdf.source.is_unique
    # weights are a distribution (up to the 6-dp output rounding)
    assert abs(pdf.doremi_weight.sum() - 1.0) < 2e-5
    assert (pdf.doremi_weight > 0).all()
    # excess loss is clipped at 0
    assert (pdf.excess_loss >= 0).all()
    # the MW update direction: among domains of ~equal token share, any
    # domain with strictly larger excess loss must get >= weight
    for _, a in pdf.iterrows():
        for _, b in pdf.iterrows():
            if (abs(a.token_share - b.token_share) < 1e-4
                    and a.excess_loss > b.excess_loss + 1e-4):
                assert a.doremi_weight >= b.doremi_weight, (a, b)


def test_doremi_weights_python_replay(spark):
    """Exact replay of the linearized-MW update from the raw corpus."""
    import re

    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("source", "text").toPandas())
    docs["t"] = docs.text.map(lambda s: len(re.findall(r"\w+", s)))
    docs["d"] = docs.text.map(
        lambda s: len(set(re.findall(r"\w+", s.lower()))))
    g = docs.groupby("source")[["t", "d"]].sum()
    all_t, all_d = int(g.t.sum()), int(g.d.sum())
    k = len(g)
    exc = {s: max(all_d / all_t - int(r.d) / int(r.t), 0.0)
           for s, r in g.iterrows()}
    u = {s: (int(g.loc[s].t) / all_t) * (1.0 + 10.0 * exc[s])
         for s in g.index}
    z = 0.0
    for s in sorted(u):        # ordered fold, like the query
        z += u[s]
    want = {s: round((1.0 - 0.01) * (u[s] / z) + 0.01 / k, 6)
            for s in g.index}
    pdf = all_queries()["mix_doremi_weights"].fn(spark, SF).toPandas()
    got = dict(zip(pdf.source, pdf.doremi_weight))
    assert got == want


def test_doremi_zero_token_source_yields_finite_smoothed_weight(spark,
                                                                tmp_path):
    """A source whose documents contain zero \\w tokens must not divide
    by zero (ANSI error / NULL-vs-inf cross-engine split): with the
    GREATEST(t, 1) guard its excess is clipped to the corpus ratio, its
    base share is 0, and its weight collapses to the smoothing term —
    finite, positive, and IDENTICAL between the Spark face and the
    DuckDB oracle SQL on the same corpus."""
    import duckdb
    import pandas as pd

    rows = [(0, "alpha beta gamma delta", "en", "web", 22),
            (1, "alpha alpha beta beta", "en", "web", 21),
            (2, "?!... --- !!!", "en", "noise", 13),   # zero \w tokens
            (3, "epsilon zeta eta theta iota", "en", "books", 27)]
    pdf_in = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    d = str(tmp_path / "zero_tok_corpus")
    spark.createDataFrame(pdf_in).write.parquet(f"{d}/documents.parquet")

    spec = all_queries()["mix_doremi_weights"]
    got = (spec.fn(spark, d).toPandas()
           .sort_values("source").reset_index(drop=True))
    assert got.doremi_weight.notna().all()
    assert np.isfinite(got.doremi_weight).all()
    assert abs(got.doremi_weight.sum() - 1.0) < 2e-5
    noise = got[got.source == "noise"].iloc[0]
    assert noise.n_tokens == 0
    # base share 0 -> the weight is the pure smoothing term u/k, k=3
    # distinct sources (web owns two docs)
    assert noise.doremi_weight == round(0.01 / 3, 6)

    con = duckdb.connect()
    con.register("documents", pdf_in)
    want = (con.execute(spec.oracle).df()
            .sort_values("source").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False)


def test_doremi_all_zero_token_corpus_yields_finite_weights(spark,
                                                            tmp_path):
    """The degenerate extreme: EVERY source has zero tokens, so the
    normalizer z is 0 and an unguarded u/z would be NaN — the exact
    table doremi_weights_sink would then persist until a token-bearing
    batch arrived. With the z guard each source gets exactly the
    smoothing mass, finite and identical across engines."""
    import duckdb
    import pandas as pd

    rows = [(0, "?!...", "en", "a", 5), (1, "--- !!!", "en", "b", 7)]
    pdf_in = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"])
    d = str(tmp_path / "all_zero_corpus")
    spark.createDataFrame(pdf_in).write.parquet(f"{d}/documents.parquet")
    spec = all_queries()["mix_doremi_weights"]
    got = (spec.fn(spark, d).toPandas()
           .sort_values("source").reset_index(drop=True))
    assert got.doremi_weight.notna().all()
    assert np.isfinite(got.doremi_weight).all()
    assert (got.doremi_weight == round(0.01 / 2, 6)).all()
    con = duckdb.connect()
    con.register("documents", pdf_in)
    want = (con.execute(spec.oracle).df()
            .sort_values("source").reset_index(drop=True))
    pd.testing.assert_frame_equal(
        got[sorted(got.columns)], want[sorted(want.columns)],
        check_dtype=False)


# ---------------------------------------------------------------------------
# mix_curriculum_interleave
# ---------------------------------------------------------------------------
def test_curriculum_interleave_slots_are_round_robin(spark):
    pdf = all_queries()["mix_curriculum_interleave"].fn(spark, SF).toPandas()
    assert len(pdf) == 500 and pdf.doc_id.is_unique
    # slots are globally unique (the sparse order is readable as-is)
    assert pdf.slot.is_unique
    s = pdf.source.nunique()
    # slot mod |sources| recovers the source index: every source owns one
    # residue class — the round-robin property
    res = pdf.groupby("source").slot.apply(lambda x: set(x % s))
    assert all(len(r) == 1 for r in res)
    assert sorted(next(iter(r)) for r in res) == list(range(s))
    # within a source, slots strictly increase with rank
    for _, grp in pdf.groupby("source"):
        grp = grp.sort_values("rank_in_source")
        assert (np.diff(grp.slot.to_numpy()) == s).all()


def test_curriculum_interleave_is_easy_to_hard(spark):
    """Reading ORDER BY slot, each source's docs appear in non-increasing
    quality-score order — the curriculum contract."""
    pdf = (all_queries()["mix_curriculum_interleave"].fn(spark, SF)
           .toPandas().sort_values("slot"))
    for _, grp in pdf.groupby("source"):
        assert (np.diff(grp.score_key.to_numpy()) <= 0).all()
    # and any window of |sources| consecutive OCCUPIED slots of the full
    # schedule touches |sources| distinct sources while all are unexhausted
    head = pdf.head(pdf.source.nunique() * 5)
    for i in range(0, len(head), head.source.nunique()):
        blk = head.iloc[i:i + head.source.nunique()]
        assert blk.source.nunique() == len(blk)


# ---------------------------------------------------------------------------
# rank_ndcg_eval
# ---------------------------------------------------------------------------
def test_ndcg_numpy_replay(spark):
    """Full NDCG@10 replay from the raw corpus with float log2 — the
    face's shared-literal discount table must reproduce the textbook
    number to float precision (and exactly at 6 dp)."""
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").toPandas())
    terms = ("spark", "window", "hash", "join")
    out = {}
    for t in terms:
        rows = []
        for _, r in docs.iterrows():
            ws = r.text.split(" ")
            tf = sum(1 for w in ws if w == t)
            if tf >= 1:
                rows.append((r.doc_id, min(tf, 3),
                             (tf * 10000) // max(len(ws), 1)))
        rows.sort(key=lambda x: (-x[2], x[0]))
        dcg = sum((2 ** rel - 1) / math.log2(p + 2)
                  for p, (_, rel, _) in enumerate(rows[:10]))
        ideal = sorted((rel for _, rel, _ in rows), reverse=True)[:10]
        idcg = sum((2 ** rel - 1) / math.log2(p + 2)
                   for p, rel in enumerate(ideal))
        out[t] = (len(rows), round(dcg, 6), round(idcg, 6),
                  round(dcg / idcg if idcg > 0 else 0.0, 6))
    pdf = all_queries()["rank_ndcg_eval"].fn(spark, SF).toPandas()
    got = {r.term: (r.n_matched, r.dcg10, r.idcg10, r.ndcg10)
           for r in pdf.itertuples()}
    assert got == out
    # the eval is non-vacuous: rankings are imperfect but far above random
    assert all(0.5 < v[3] <= 1.0 for v in got.values())
    assert any(v[3] < 1.0 for v in got.values())


def test_ndcg_bounds_and_perfect_ranking_scores_one(spark):
    """NDCG in (0, 1]; a system ranked BY relevance itself must score
    exactly 1 — pin by recomputing dcg against the ideal order."""
    pdf = all_queries()["rank_ndcg_eval"].fn(spark, SF).toPandas()
    assert len(pdf) == 4
    assert ((pdf.ndcg10 > 0) & (pdf.ndcg10 <= 1)).all()
    assert (pdf.idcg10 >= pdf.dcg10).all()


# ---------------------------------------------------------------------------
# quality_survival_curve
# ---------------------------------------------------------------------------
def test_survival_curve_monotone_and_anchored(spark):
    pdf = (all_queries()["quality_survival_curve"].fn(spark, SF)
           .toPandas().sort_values("threshold").reset_index(drop=True))
    assert list(pdf.threshold) == [i * 1000 for i in range(10)]
    # survival is non-increasing in the threshold
    assert (np.diff(pdf.n_docs_kept.to_numpy()) <= 0).all()
    assert (np.diff(pdf.n_tokens_kept.to_numpy()) <= 0).all()
    assert (np.diff(pdf.token_survival.to_numpy()) <= 0).all()
    # threshold 0 keeps everything
    assert pdf.n_docs_kept.iloc[0] == 500
    assert pdf.token_survival.iloc[0] == 1.0
    # the curve is non-vacuous on the fixture: some gate bites
    assert pdf.n_docs_kept.iloc[-1] < 500


def test_survival_curve_pandas_replay(spark):
    """Exact replay: per-threshold doc/token survival from raw text."""
    import re

    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("text").toPandas())
    docs["t"] = docs.text.map(lambda s: len(re.findall(r"\w+", s)))
    docs["dd"] = docs.text.map(
        lambda s: len(set(re.findall(r"\w+", s.lower()))))
    docs["score"] = (docs.dd * 10000) // docs.t.clip(lower=1)
    all_t = int(docs.t.sum())
    pdf = (all_queries()["quality_survival_curve"].fn(spark, SF)
           .toPandas().sort_values("threshold").reset_index(drop=True))
    for r in pdf.itertuples():
        kept = docs[docs.score >= r.threshold]
        assert r.n_docs_kept == len(kept), r.threshold
        assert r.n_tokens_kept == int(kept.t.sum()), r.threshold
        assert r.token_survival == round(int(kept.t.sum()) / all_t, 6)


# ---------------------------------------------------------------------------
# mix_anneal_schedule
# ---------------------------------------------------------------------------
def test_anneal_schedule_structure(spark):
    pdf = all_queries()["mix_anneal_schedule"].fn(spark, SF).toPandas()
    p0 = pdf[pdf.phase == 0].sort_values("position")
    p1 = pdf[pdf.phase == 1].sort_values("position")
    # phase 0 is the whole corpus once; phase 1 a strict high-quality subset
    assert len(p0) == 500 and p0.doc_id.is_unique
    assert 0 < len(p1) < 500 and p1.doc_id.is_unique
    assert (p1.score_key >= 7000).all()
    assert set(p1.doc_id) <= set(p0.doc_id)
    # position is one dense global stream: phase 0 then phase 1
    assert list(p0.position) == list(range(1, len(p0) + 1))
    assert list(p1.position) == list(
        range(len(p0) + 1, len(p0) + len(p1) + 1))


def test_anneal_schedule_orders_are_md5_and_distinct(spark):
    """Both phases follow their own md5 order (seedless, worker-
    recomputable), and the anneal permutation differs from main's
    restriction — the phase label genuinely reshuffles."""
    import hashlib

    pdf = all_queries()["mix_anneal_schedule"].fn(spark, SF).toPandas()
    for phase, pref in ((0, "main:"), (1, "anneal:")):
        grp = pdf[pdf.phase == phase].sort_values("position")
        want = sorted(grp.doc_id,
                      key=lambda d: (hashlib.md5(
                          f"{pref}{d}".encode()).hexdigest(), d))
        assert list(grp.doc_id) == want, phase
    p1 = pdf[pdf.phase == 1].sort_values("position").doc_id.tolist()
    p0_restricted = [d for d in
                     pdf[pdf.phase == 0].sort_values("position").doc_id
                     if d in set(p1)]
    assert p1 != p0_restricted


# ---------------------------------------------------------------------------
# dedup_cluster_stats
# ---------------------------------------------------------------------------
def test_cluster_stats_clean_corpus_is_all_singletons(spark):
    """The sf0.01 fixture has no exact duplicates: the histogram must be
    exactly one row {cluster_size 1, 500 clusters, 0 redundant} — and
    that emptiness must RECONCILE against dedup_exact (0 docs dropped)."""
    pdf = all_queries()["dedup_cluster_stats"].fn(spark, SF).toPandas()
    assert len(pdf) == 1
    r = pdf.iloc[0]
    assert (r.cluster_size, r.n_clusters, r.n_docs, r.n_redundant,
            r.doc_share) == (1, 500, 500, 0, 1.0)
    keep = all_queries()["dedup_exact"].fn(spark, SF)
    assert keep.count() == 500


def test_cluster_stats_histogram_on_injected_duplicates(spark, tmp_path):
    """Inject known duplicate clusters (3 copies of one doc, 2 of
    another) into a scratch corpus dir and pin the exact histogram plus
    the dedup_exact reconciliation sum(n_redundant) == docs_dropped."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SF}/documents.parquet")
    base = docs.limit(10)
    copies = (docs.filter(F.col("doc_id") == 0)
              .select((F.col("doc_id") + 10_000).alias("doc_id"), "text",
                      "lang", "source", "n_chars")
              .unionAll(docs.filter(F.col("doc_id") == 0)
                        .select((F.col("doc_id") + 10_001).alias("doc_id"),
                                "text", "lang", "source", "n_chars"))
              .unionAll(docs.filter(F.col("doc_id") == 1)
                        .select((F.col("doc_id") + 10_002).alias("doc_id"),
                                "text", "lang", "source", "n_chars")))
    d = str(tmp_path / "dup_corpus")
    base.select("doc_id", "text", "lang", "source", "n_chars") \
        .unionAll(copies).write.parquet(f"{d}/documents.parquet")

    pdf = (all_queries()["dedup_cluster_stats"].fn(spark, d)
           .toPandas().set_index("cluster_size").sort_index())
    # 13 docs: 8 singletons, one pair (doc 1 + copy), one triple (doc 0
    # + 2 copies)
    assert list(pdf.index) == [1, 2, 3]
    assert pdf.loc[1].n_clusters == 8 and pdf.loc[1].n_redundant == 0
    assert pdf.loc[2].n_clusters == 1 and pdf.loc[2].n_redundant == 1
    assert pdf.loc[3].n_clusters == 1 and pdf.loc[3].n_redundant == 2
    assert pdf.n_docs.sum() == 13
    keep = all_queries()["dedup_exact"].fn(spark, d)
    assert int(pdf.n_redundant.sum()) == 13 - keep.count()


# ---------------------------------------------------------------------------
# bucketed rank helpers: equivalence with the naive single-task window
# ---------------------------------------------------------------------------
def test_bucketed_ranks_equal_naive_window_on_random_inputs(spark):
    """The whole mix tier rests on bucketed_{hash,range}_rank producing
    EXACTLY the rank (and exclusive running weight sum) a naive
    Window.partitionBy(group).orderBy(...) would — the bucketing is a
    scheduling rewrite, not a semantics change. Prove it on seeded
    random frames with skewed groups, duplicate keys, and weights."""
    import hashlib

    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from process_nwb_spark.relational.dataprep import (
        bucketed_hash_rank, bucketed_range_rank)

    rng = np.random.default_rng(20260816)
    for draw in range(3):
        n = int(rng.integers(200, 600))
        groups = rng.choice(["a", "b", "c"], size=n,
                            p=[0.7, 0.2, 0.1])       # skewed on purpose
        ids = rng.permutation(n)
        keys = rng.integers(0, 10001, size=n)
        wts = rng.integers(1, 50, size=n)
        rows = [(str(groups[i]), int(ids[i]), int(keys[i]), int(wts[i]),
                 hashlib.md5(str(int(ids[i])).encode()).hexdigest())
                for i in range(n)]
        df = spark.createDataFrame(
            rows, "g string, tid long, k long, w long, h string")

        # range variant: rank + exclusive running sum, (k DESC, tid)
        got = (bucketed_range_rank(df, ["g"], "k", "tid", key_max=10000,
                                   n_buckets=40, out_col="r",
                                   weight_col="w", cum_col="cw")
               .select("g", "tid", "r", "cw").toPandas()
               .sort_values(["g", "tid"]).reset_index(drop=True))
        wspec = Window.partitionBy("g").orderBy(F.desc("k"), F.asc("tid"))
        want = (df.withColumn("r", F.row_number().over(wspec))
                .withColumn("cw", F.coalesce(
                    F.sum("w").over(wspec.rowsBetween(
                        Window.unboundedPreceding, -1)), F.lit(0)))
                .select("g", "tid", "r", "cw").toPandas()
                .sort_values(["g", "tid"]).reset_index(drop=True))
        import pandas as pd
        pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                      obj=f"range draw {draw}")

        # approx-quantile cuts: same rank/cumsum output as the fixed
        # grid — only the task decomposition differs (the docstring's
        # 100 TB escape hatch for clustered score distributions)
        got_q = (bucketed_range_rank(df, ["g"], "k", "tid", key_max=10000,
                                     n_buckets=40, out_col="r",
                                     weight_col="w", cum_col="cw",
                                     cuts="approx")
                 .select("g", "tid", "r", "cw").toPandas()
                 .sort_values(["g", "tid"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got_q, want, check_dtype=False,
                                      obj=f"approx-cuts draw {draw}")

        # hash variant: rank by (md5, tid)
        got_h = (bucketed_hash_rank(df, ["g"], "h", "tid", out_col="r")
                 .select("g", "tid", "r").toPandas()
                 .sort_values(["g", "tid"]).reset_index(drop=True))
        hspec = Window.partitionBy("g").orderBy(F.asc("h"), F.asc("tid"))
        want_h = (df.withColumn("r", F.row_number().over(hspec))
                  .select("g", "tid", "r").toPandas()
                  .sort_values(["g", "tid"]).reset_index(drop=True))
        pd.testing.assert_frame_equal(got_h, want_h, check_dtype=False,
                                        obj=f"hash draw {draw}")
