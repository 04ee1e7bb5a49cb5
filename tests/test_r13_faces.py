"""Behavioral pins for the r13 corpus-quality/domain-similarity tier
(text_unigram_entropy, corpus_crossentropy_matrix,
mix_perplexity_buckets, mix_source_caps) beyond the exact-oracle gate:
python replays of each face's math, structural claims (tercile balance,
row-min diagonal, waterfill feasibility), the capped branch on an
injected skewed corpus, and the metadata-sized-window plan pins."""
import math
import re
from collections import Counter

import numpy as np
import pytest
from pyspark.sql import functions as F

from process_nwb_spark.relational.core import all_queries

SF = "/root/testdata/sf0.01"
_BPE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def test_unigram_entropy_replay_and_bounds(spark):
    pdf = all_queries()["text_unigram_entropy"].fn(spark, SF).toPandas()
    assert len(pdf) == 500
    # 0 <= H <= log2(n_words); ttr in (0, 1]
    assert (pdf.unigram_entropy >= 0).all()
    # +5.1e-5: the face ROUNDs to 4, which can nudge an all-novel doc's
    # H a half-ulp-of-round above the un-rounded log2(n) bound
    assert (pdf.unigram_entropy
            <= np.log2(pdf.n_words) + 5.1e-5).all()
    assert ((pdf.type_token_ratio > 0)
            & (pdf.type_token_ratio <= 1)).all()
    # H == log2(n) iff every word distinct
    allnovel = pdf[pdf.n_types == pdf.n_words]
    for _, r in allnovel.iterrows():
        assert r.unigram_entropy == round(math.log2(r.n_words), 4)
    # python replay of a handful of docs
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").limit(8).toPandas())
    for _, r in docs.iterrows():
        ws = r.text.split(" ")
        c = Counter(ws)
        n = len(ws)
        h = math.log2(n) - sum(v * math.log2(v) for v in c.values()) / n
        row = pdf[pdf.doc_id == r.doc_id].iloc[0]
        assert row.n_words == n and row.n_types == len(c)
        assert row.unigram_entropy == pytest.approx(round(h, 4), abs=1e-4)
        assert row.type_token_ratio == round(len(c) / n, 4)


def test_crossentropy_matrix_shape_and_diagonal(spark):
    pdf = all_queries()["corpus_crossentropy_matrix"].fn(spark, SF) \
        .toPandas()
    piv = pdf.pivot(index="source_eval", columns="source_model",
                    values="cross_entropy_bits")
    # full |sources|^2 matrix, all entries positive
    assert piv.shape == (20, 20) and not piv.isna().any().any()
    assert (piv > 0).all().all()
    # each source's own model fits it best: the diagonal is the row min
    for s in piv.index:
        assert piv.loc[s, s] == piv.loc[s].min(), s
    # n_bigrams is a property of the EVAL side alone
    assert (pdf.groupby("source_eval").n_bigrams.nunique() == 1).all()


def test_crossentropy_one_cell_python_replay(spark):
    """Exact replay of one (eval, model) cell's Laplace-smoothed
    cross-entropy from the raw corpus."""
    pdf = all_queries()["corpus_crossentropy_matrix"].fn(spark, SF) \
        .toPandas()
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("source", "text").toPandas())
    bg = {}   # source -> list of bigrams
    for _, r in docs.iterrows():
        ws = r.text.split(" ")
        bg.setdefault(r.source, []).extend(zip(ws, ws[1:]))
    vocab = {w2 for bs in bg.values() for _, w2 in bs}
    ev, mo = "src0", "src1"
    pc = Counter(bg[mo])
    hc = Counter(w1 for w1, _ in bg[mo])
    v = len(vocab)
    logs = [math.log2((pc.get(b, 0) + 1.0) / (hc.get(b[0], 0) + v))
            for b in bg[ev]]
    h = -sum(logs) / len(logs)
    row = pdf[(pdf.source_eval == ev) & (pdf.source_model == mo)].iloc[0]
    assert row.n_bigrams == len(bg[ev])
    assert row.cross_entropy_bits == pytest.approx(round(h, 4), abs=1e-4)


def test_perplexity_buckets_terciles_and_order(spark):
    pdf = all_queries()["mix_perplexity_buckets"].fn(spark, SF).toPandas()
    for src, grp in pdf.groupby("source"):
        n = len(grp)
        sizes = grp.ppl_bucket.value_counts()
        # rank-arithmetic terciles: bucket b gets the ranks r with
        # (r-1)*3 DIV n == b — balanced within 1 by construction
        exp = Counter(min(3 * (r - 1) // n, 2) for r in range(1, n + 1))
        assert sizes.get("head", 0) == exp[0], src
        assert sizes.get("middle", 0) == exp[1], src
        assert sizes.get("tail", 0) == exp[2], src
        # ordering: every head score_key >= every tail score_key
        if exp[0] and exp[2]:
            assert (grp[grp.ppl_bucket == "head"].score_key.min()
                    >= grp[grp.ppl_bucket == "tail"].score_key.max()), src
        # src_rank is a dense 1..n permutation ordered by the key
        byr = grp.sort_values("src_rank")
        assert list(byr.src_rank) == list(range(1, n + 1))
        assert byr.score_key.is_monotonic_decreasing


def test_perplexity_score_key_python_replay(spark):
    """Integer-surprisal replay: 64 + floor(log2 c2) - floor(log2 c1)
    summed over a doc's bigrams, then (s*10000) // n."""
    pdf = all_queries()["mix_perplexity_buckets"].fn(spark, SF).toPandas()
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").toPandas())
    allbg = []
    perdoc = {}
    for _, r in docs.iterrows():
        ws = r.text.split(" ")
        bs = list(zip(ws, ws[1:]))
        perdoc[r.doc_id] = bs
        allbg.extend(bs)
    pc = Counter(allbg)
    hc = Counter(w1 for w1, _ in allbg)
    for doc_id in list(perdoc)[:8]:
        bs = perdoc[doc_id]
        s = sum(64 + int(math.floor(math.log2(pc[b])))
                - int(math.floor(math.log2(hc[b[0]]))) for b in bs)
        key = (s * 10000) // len(bs)
        row = pdf[pdf.doc_id == doc_id].iloc[0]
        assert row.n_bigrams == len(bs) and row.score_key == key, doc_id


def test_source_caps_waterfill_feasibility(spark):
    pdf = all_queries()["mix_source_caps"].fn(spark, SF).toPandas()
    budget = pdf.budget.iloc[0]
    # allocations are feasible and spend the whole budget (to rounding)
    assert (pdf.alloc_tokens <= pdf.cap_tokens + 1e-9).all()
    assert pdf.alloc_tokens.sum() == pytest.approx(
        budget, abs=0.0001 * len(pdf))
    # capped sources take exactly their capacity; uncapped sources all
    # sit at the common water level
    capped = pdf[pdf.capped == 1]
    assert (capped.alloc_tokens == capped.cap_tokens).all()
    un = pdf[pdf.capped == 0]
    assert un.alloc_tokens.nunique() <= 1
    assert (pdf.water_level.nunique() == 1)


def test_source_caps_capped_branch_on_skewed_corpus(spark, tmp_path):
    """The sf fixture's sources are near-uniform (nothing caps); inject
    a corpus with one tiny source so the capped branch and the
    redistribution arithmetic are both pinned: the tiny source is fully
    taken, the giants split the remainder equally."""
    rows = [(0, "a b", "en", "tiny", 0)]           # 2 tokens
    big = " ".join(["tok"] * 100)                  # 100 tokens
    for i in range(1, 4):
        rows.append((i, big, "en", f"big{i}", 0))
    d = str(tmp_path / "skewed")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long").write.parquet(f"{d}/documents.parquet")
    from process_nwb_spark.relational.dataprep import mix_source_caps

    pdf = mix_source_caps(spark, d).toPandas().set_index("source")
    # total 302, budget 151; tiny (cap 2) capped; level (151-2)/3
    assert pdf.budget.iloc[0] == 151
    assert pdf.loc["tiny"].capped == 1
    assert pdf.loc["tiny"].alloc_tokens == 2.0
    lvl = round((151 - 2) / 3, 4)
    for s in ("big1", "big2", "big3"):
        assert pdf.loc[s].capped == 0
        assert pdf.loc[s].alloc_tokens == lvl
        assert pdf.loc[s].water_level == lvl


def test_r13_metadata_windows_sit_above_aggregates(spark):
    """mix_source_caps' row_number/running-sum/lag windows are
    unpartitioned — acceptable ONLY on the post-aggregation
    |sources|-row table. Same pin class as vocab_growth_curve."""
    from process_nwb_spark.plans.inspect import windows_sit_above_aggregates

    fn = all_queries()["mix_source_caps"].fn
    for sf in (SF, "/root/testdata/sf0.001"):
        assert windows_sit_above_aggregates(fn(spark, sf)), sf


def test_r13_plan_shapes(spark):
    """Scale-shape contracts: no single-partition exchange anywhere in
    the perplexity bucketing (the bucketed-rank claim); the
    cross-entropy matrix touches the bigram stream with BROADCAST
    joins only (model tables + |sources| list), never a shuffled
    cartesian; entropy is two hash-aggs with map-side combine."""
    from process_nwb_spark.plans.inspect import (
        count_single_partition_exchanges, formatted_plan,
        has_partial_aggregation)

    qs = all_queries()
    pb = qs["mix_perplexity_buckets"].fn(spark, SF)
    assert count_single_partition_exchanges(pb) == 0, \
        formatted_plan(pb, "simple")
    cem = qs["corpus_crossentropy_matrix"].fn(spark, SF)
    plan = formatted_plan(cem, "simple")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" in plan, plan   # |sources| fan-out
    assert has_partial_aggregation(cem)
    ent = qs["text_unigram_entropy"].fn(spark, SF)
    assert has_partial_aggregation(ent)
    assert "Join" not in formatted_plan(ent, "simple")


def test_matryoshka_budget_equals_recall_at_matching_stride(spark):
    """The fixed-budget twin with budget = N DIV 10 plans stride k=10 —
    exactly embed_matryoshka_recall's query set — and must reproduce
    its output byte-for-byte; at the default budget the query count is
    bounded by ~budget regardless of corpus size (the linear-growth
    claim the sf1 block measures)."""
    from process_nwb_spark.relational.llm_ops import (
        _MATRYOSHKA_QUERY_BUDGET, embed_matryoshka_budget)

    qs = all_queries()
    n = spark.read.parquet(f"{SF}/embeddings.parquet").count()
    assert n // (n // 10) == 10   # stride sanity for this fixture
    want = (qs["embed_matryoshka_recall"].fn(spark, SF).toPandas()
            .sort_values("prefix_dim").reset_index(drop=True))
    got = (embed_matryoshka_budget(spark, SF, budget=n // 10).toPandas()
           .sort_values("prefix_dim").reset_index(drop=True))
    assert got.equals(want), (got, want)
    # default budget: ~budget queries (stride floor can overshoot by
    # <2x, never grows with N), computed in-plan (no driver action)
    deflt = qs["embed_matryoshka_budget"].fn(spark, SF).toPandas()
    k = max(1, n // _MATRYOSHKA_QUERY_BUDGET)
    exp_q = len([v for v in range(n) if v % k == 0])
    # vec_ids are 0..n-1 in the fixture, so the count is exact
    assert (deflt.n_queries == exp_q).all()
    assert exp_q <= 2 * _MATRYOSHKA_QUERY_BUDGET
