"""Behavioral pins for the r14 third-batch faces (mix_dedup_budget,
quality_gate_tradeoff, tokenizer_vocab_sweep, dedup_threshold_sweep,
quality_lm_agreement, mix_repeat_budget)
beyond the exact-oracle gate: pandas/numpy replays of each face's math,
cross-face consistency against the faces they calibrate or share folds
with, injected-corpus edge cases, and plan-shape contracts."""
import hashlib
import re

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from process_nwb_spark.relational.core import all_queries

SF = "/root/testdata/sf0.01"

_TOK_RE = re.compile(r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]")


def _fp(text: str) -> str:
    return hashlib.md5(
        re.sub(r"\s+", " ", text).strip().lower().encode()).hexdigest()


def _waterfill_np(caps: pd.DataFrame) -> pd.DataFrame:
    """Closed-form waterfill replay over (source, cap_tokens)."""
    total = int(caps.cap_tokens.sum())
    m = len(caps)
    budget = max(int(np.floor(total * 0.5)), 1)
    o = caps.sort_values(["cap_tokens", "source"]).reset_index(drop=True)
    s = o.cap_tokens.cumsum()
    t = None
    prev = None
    for k in range(m):
        cap = int(o.cap_tokens[k])
        t_cand = (budget - (int(s[k]) - cap)) / (m - k)
        if t_cand < cap and (prev is None or prev <= t_cand):
            t = t_cand if t is None else min(t, t_cand)
        prev = cap
    if t is None:
        t = float(o.cap_tokens.max())
    o["budget"] = budget
    o["water_level"] = round(t, 4)
    o["alloc_tokens"] = [round(min(float(c), t), 4) for c in o.cap_tokens]
    o["capped"] = (o.cap_tokens.astype(float) <= t).astype(int)
    return o


def test_dedup_budget_pandas_replay(spark):
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "source", "text").toPandas()
            .sort_values("doc_id").reset_index(drop=True))
    docs["toks"] = [len(_TOK_RE.findall(t)) for t in docs.text]
    docs["fp"] = [_fp(t) for t in docs.text]
    docs["copy_rank"] = docs.groupby("fp").cumcount() + 1
    caps = (docs.groupby("source")
            .apply(lambda g: pd.Series({
                "raw_tokens": int(g.toks.sum()),
                "cap_tokens": int(g.toks[g.copy_rank == 1].sum())}),
                include_groups=False)
            .reset_index())
    caps["dup_token_share"] = [
        round((r - c) / max(r, 1), 6)
        for r, c in zip(caps.raw_tokens, caps.cap_tokens)]
    want = _waterfill_np(caps).sort_values("source").reset_index(drop=True)

    got = (all_queries()["mix_dedup_budget"].fn(spark, SF).toPandas()
           .sort_values("source").reset_index(drop=True))
    for c in ("raw_tokens", "cap_tokens", "dup_token_share", "budget",
              "water_level", "alloc_tokens", "capped"):
        assert list(got[c]) == list(want[c]), (c, got[c], want[c])


def test_dedup_budget_consistency_and_mirror_source(spark, tmp_path):
    """raw_tokens must equal mix_source_caps' capacities (same token
    rule), and an injected 100%-duplicate mirror source gets ZERO
    capacity — the allocation dedup-blind waterfilling would have
    handed it goes to the unique sources instead."""
    raw = (all_queries()["mix_source_caps"].fn(spark, SF).toPandas()
           .set_index("source").sort_index())
    got = (all_queries()["mix_dedup_budget"].fn(spark, SF).toPandas()
           .set_index("source").sort_index())
    assert (got.raw_tokens == raw.cap_tokens).all()

    big = " ".join(["tok"] * 50)
    rows = [(0, big + " uniq0", "en", "orig", 0),
            (1, big + " uniq1", "en", "orig", 0),
            (2, big + " uniq0", "en", "mirror", 0),   # dup of doc 0
            (3, big + " uniq1", "en", "mirror", 0)]   # dup of doc 1
    d = str(tmp_path / "mirror")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long").write.parquet(f"{d}/documents.parquet")
    from process_nwb_spark.relational.dataprep import mix_dedup_budget

    pdf = mix_dedup_budget(spark, d).toPandas().set_index("source")
    # each doc = 50x "tok" + "uniqN" (2 BPE-ish tokens) = 52 tokens
    assert pdf.loc["mirror"].cap_tokens == 0
    assert pdf.loc["mirror"].raw_tokens == 104
    assert pdf.loc["mirror"].dup_token_share == 1.0
    assert pdf.loc["mirror"].alloc_tokens == 0.0
    assert pdf.loc["mirror"].capped == 1
    # unique total = orig's 104 only -> budget 52, all of it to orig
    assert pdf.budget.iloc[0] == 52
    assert pdf.loc["orig"].cap_tokens == 104
    assert pdf.loc["orig"].dup_token_share == 0.0
    assert pdf.loc["orig"].alloc_tokens == 52.0
    assert pdf.loc["orig"].capped == 0


def test_gate_tradeoff_consistency_with_gate(spark):
    """The curve must price exactly quality_gopher_rules' gate: row k
    equals the gate face filtered to n_rules_failed <= k, shares are
    against the k=5 totals, and both counts are monotone."""
    gate = (all_queries()["quality_gopher_rules"].fn(spark, SF)
            .toPandas())
    got = (all_queries()["quality_gate_tradeoff"].fn(spark, SF)
           .toPandas().sort_values("max_fail").reset_index(drop=True))
    tot_docs = len(gate)
    tot_tokens = int(gate.n_words.sum())
    assert list(got.max_fail) == list(range(6))
    for _, r in got.iterrows():
        sel = gate[gate.n_rules_failed <= r.max_fail]
        assert r.n_docs_kept == len(sel)
        assert r.n_tokens_kept == int(sel.n_words.sum())
        assert r.doc_share == round(len(sel) / max(tot_docs, 1), 6)
        assert r.token_share == round(
            int(sel.n_words.sum()) / max(tot_tokens, 1), 6)
    assert got.n_docs_kept.is_monotonic_increasing
    assert got.n_tokens_kept.is_monotonic_increasing
    assert got.n_docs_kept.iloc[-1] == tot_docs
    assert got.doc_share.iloc[-1] == 1.0 and got.token_share.iloc[-1] == 1.0
    # k=0 is the strict gate: exactly the passes bit
    assert got.n_docs_kept.iloc[0] == int(gate.passes.sum())


def test_vocab_sweep_replay_and_oov_consistency(spark):
    """Pandas replay of coverage at every cutoff, plus the cross-face
    identity at N=16 (= _OOV_VOCAB_TOPN): the oov face's total OOV
    token count must equal total_tf - covered_tf at vocab_n=16 — same
    vocabulary rule, so the two faces partition the same token mass."""
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("text").toPandas())
    from collections import Counter
    cnt = Counter()
    for t in docs.text:
        cnt.update(t.split(" "))
    ordered = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(cnt.values())

    got = (all_queries()["tokenizer_vocab_sweep"].fn(spark, SF)
           .toPandas().sort_values("vocab_n").reset_index(drop=True))
    assert list(got.vocab_n) == [4, 8, 16, 32, 64]
    for _, r in got.iterrows():
        top = ordered[: int(r.vocab_n)]
        assert r.n_types == len(top)
        assert r.covered_tf == sum(c for _, c in top)
        assert r.total_tf == total
        assert r.coverage == round(sum(c for _, c in top) / max(total, 1),
                                   6)
    assert got.coverage.is_monotonic_increasing

    oov = all_queries()["tokenizer_oov_rate"].fn(spark, SF).toPandas()
    at16 = got[got.vocab_n == 16].iloc[0]
    assert int(oov.n_oov.sum()) == at16.total_tf - at16.covered_tf
    assert int(oov.n_tokens.sum()) == at16.total_tf


def test_threshold_sweep_consistency_with_dedup_face(spark):
    """The sweep calibrates exactly dedup_embed_cosine's pairs: the
    0.35 row counts ALL of that face's pairs and distinct vecs, counts
    are monotone non-increasing in the threshold, and every reported
    threshold point replays from the face's own pair list through the
    same integer micro-cosine rule."""
    ded = (all_queries()["dedup_embed_cosine"].fn(spark, SF)
           .toPandas())
    got = (all_queries()["dedup_threshold_sweep"].fn(spark, SF)
           .toPandas().sort_values("threshold").reset_index(drop=True))
    assert got.threshold.iloc[0] == 0.35
    assert got.n_pairs.iloc[0] == len(ded)
    assert got.n_docs.iloc[0] == len(set(ded.vec_a) | set(ded.vec_b))
    assert got.n_pairs.is_monotonic_decreasing
    assert got.n_docs.is_monotonic_decreasing

    # replay every point from exact cosines (sequential fold = the
    # engines' array fold; np.dot matched it for every r14 face)
    emb = (spark.read.parquet(f"{SF}/embeddings.parquet")
           .select("vec_id", "embedding").toPandas())
    vecs = {int(r.vec_id): np.asarray(r.embedding, dtype=np.float64)
            for _, r in emb.iterrows()}
    micro = {}
    for _, r in ded.iterrows():
        a, b = vecs[int(r.vec_a)], vecs[int(r.vec_b)]
        cos = float(np.dot(a, b)) / (np.sqrt(np.dot(a, a))
                                     * np.sqrt(np.dot(b, b)))
        micro[(int(r.vec_a), int(r.vec_b))] = int(np.round(cos * 1e6))
    for _, r in got.iterrows():
        thr = int(np.round(r.threshold * 1e6))
        keep = {p for p, m in micro.items() if m >= thr}
        assert r.n_pairs == len(keep), (thr, r.n_pairs, len(keep))
        assert r.n_docs == len({v for p in keep for v in p})


def test_r14_third_batch_plan_shapes(spark):
    """dedup_budget: copy_rank window partitions on the
    high-cardinality fingerprint; tradeoff + vocab sweep: every window
    sits above an aggregation (metadata-sized input); threshold sweep:
    the pair frame is persisted (both folds read the cache, not two
    re-executions of the tile self-join)."""
    from process_nwb_spark.plans.inspect import (
        formatted_plan, windows_sit_above_aggregates)

    qs = all_queries()
    db = qs["mix_dedup_budget"].fn(spark, SF)
    plan = formatted_plan(db, "formatted")
    rn = [ln for ln in plan.splitlines()
          if "row_number()" in ln and "windowspecdefinition" in ln
          and "copy_rank" in ln]
    assert rn and all("fp#" in ln for ln in rn), rn

    for sf in (SF, "/root/testdata/sf0.001"):
        df = qs["quality_gate_tradeoff"].fn(spark, sf)
        assert windows_sit_above_aggregates(df), sf

    # vocab sweep: ranks come from bucketed_range_rank — the full-vocab
    # row_number window must partition on the bucket column (never a
    # global sort of the vocabulary); the only SinglePartition work
    # allowed is the bucket-offset window + the 1-row total fold
    vs = qs["tokenizer_vocab_sweep"].fn(spark, SF)
    plan = formatted_plan(vs, "formatted")
    rn = [ln for ln in plan.splitlines()
          if "row_number()" in ln and "windowspecdefinition" in ln]
    assert rn and all(re.search(r"\[_b#\d+L?\]", ln) for ln in rn), rn
    assert len(re.findall(r"SinglePartition", plan)) <= 2, plan

    ts = qs["dedup_threshold_sweep"].fn(spark, SF)
    assert "InMemoryTableScan" in formatted_plan(ts, "simple")


def test_lm_agreement_cross_face_replay(spark):
    """quality_lm_agreement must be computable from its two owning
    faces' outputs alone (shared-builder contract): pass bits from
    quality_gopher_rules, surprisal keys from mix_perplexity_buckets,
    exact integer moments, one sqrt."""
    import math

    gate = (all_queries()["quality_gopher_rules"].fn(spark, SF)
            .toPandas().set_index("doc_id"))
    ppl = all_queries()["mix_perplexity_buckets"].fn(spark, SF).toPandas()
    got = (all_queries()["quality_lm_agreement"].fn(spark, SF)
           .toPandas().set_index("source").sort_index())
    for src, g in ppl.groupby("source"):
        xs = [int(gate.loc[d].passes) for d in g.doc_id]
        ys = [int(s) for s in g.score_key]
        n, npass = len(xs), sum(xs)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sy, syy = sum(ys), sum(y * y for y in ys)
        row = got.loc[src]
        assert row.n_docs == n and row.n_pass == npass
        if npass:
            assert row.mean_score_pass == round(sxy / npass, 4)
        if n - npass:
            assert row.mean_score_fail == round((sy - sxy) / (n - npass),
                                                4)
        den = math.sqrt(float(n * npass - npass * npass)
                        * float(n * syy - sy * sy))
        if den == 0:
            assert pd.isna(row.pearson_r)
        else:
            assert row.pearson_r == round((n * sxy - npass * sy) / den, 6)


def test_repeat_budget_epochs_and_mirror(spark, tmp_path):
    """mix_repeat_budget prices the SAME dedup as mix_dedup_budget
    (unique capacities equal), ceilings are 4x unique, epochs =
    alloc/unique <= 4; on the mirror corpus the zero-unique source
    gets NULL epochs and the unique source trains exactly the
    data-constrained 2 epochs (budget = half the 4-epoch ceiling)."""
    ded = (all_queries()["mix_dedup_budget"].fn(spark, SF).toPandas()
           .set_index("source").sort_index())
    got = (all_queries()["mix_repeat_budget"].fn(spark, SF).toPandas()
           .set_index("source").sort_index())
    assert (got.unique_tokens == ded.cap_tokens).all()
    assert (got.cap_tokens == 4 * got.unique_tokens).all()
    nz = got[got.unique_tokens > 0]
    assert (nz.epochs <= 4.0 + 1e-9).all()
    assert all(nz.epochs == np.round(nz.alloc_tokens / nz.unique_tokens,
                                     4))

    big = " ".join(["tok"] * 50)
    rows = [(0, big + " uniq0", "en", "orig", 0),
            (1, big + " uniq1", "en", "orig", 0),
            (2, big + " uniq0", "en", "mirror", 0),
            (3, big + " uniq1", "en", "mirror", 0)]
    d = str(tmp_path / "mirror_rb")
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, "
              "n_chars long").write.parquet(f"{d}/documents.parquet")
    from process_nwb_spark.relational.dataprep import mix_repeat_budget

    pdf = mix_repeat_budget(spark, d).toPandas().set_index("source")
    assert pd.isna(pdf.loc["mirror"].epochs)
    assert pdf.loc["mirror"].alloc_tokens == 0.0
    # unique 104, ceiling 416, budget 208 -> orig trains 2.0 epochs
    assert pdf.budget.iloc[0] == 208
    assert pdf.loc["orig"].alloc_tokens == 208.0
    assert pdf.loc["orig"].epochs == 2.0


def test_jaccard_sweep_consistency_and_replay(spark):
    """jaccard_threshold_sweep calibrates exactly ngram_jaccard_pairs'
    candidates: the 0.1 row counts all of that face's pairs/docs,
    counts are monotone non-increasing, and every point replays from a
    pure-python shingle-set reconstruction through the same integer
    cross-multiplication rule (no float anywhere)."""
    pairs = (all_queries()["ngram_jaccard_pairs"].fn(spark, SF)
             .toPandas())
    got = (all_queries()["jaccard_threshold_sweep"].fn(spark, SF)
           .toPandas().sort_values("threshold").reset_index(drop=True))
    assert got.threshold.iloc[0] == 0.1
    assert got.n_pairs.iloc[0] == len(pairs)
    assert got.n_docs.iloc[0] == len(set(pairs.doc_a) | set(pairs.doc_b))
    assert got.n_pairs.is_monotonic_decreasing
    assert got.n_docs.is_monotonic_decreasing

    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").toPandas())
    sh = {}
    for _, r in docs.iterrows():
        ws = r.text.split(" ")
        if len(ws) >= 3:
            sh[int(r.doc_id)] = {" ".join(ws[i:i + 3])
                                 for i in range(len(ws) - 2)}
    from collections import Counter
    dfreq = Counter(g for s in sh.values() for g in s)
    sh = {d: {g for g in s if dfreq[g] <= 100} for d, s in sh.items()}
    inv = {}
    for d, s in sh.items():
        for g in s:
            inv.setdefault(g, []).append(d)
    cand = {}
    for g, ds in inv.items():
        ds = sorted(ds)
        for i in range(len(ds)):
            for j in range(i + 1, len(ds)):
                cand[(ds[i], ds[j])] = cand.get((ds[i], ds[j]), 0) + 1
    floored = {p: (s, len(sh[p[0]]) + len(sh[p[1]]) - s)
               for p, s in cand.items()
               if s / (len(sh[p[0]]) + len(sh[p[1]]) - s) >= 0.1}
    for _, r in got.iterrows():
        t10 = int(round(r.threshold * 10))
        keep = {p for p, (s, u) in floored.items() if s * 10 >= t10 * u}
        assert r.n_pairs == len(keep), (t10, r.n_pairs, len(keep))
        assert r.n_docs == len({d for p in keep for d in p})
