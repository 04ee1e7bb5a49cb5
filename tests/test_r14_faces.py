"""Behavioral pins for the r14 faces (embed_cell_balance,
embed_margin_bitext, tokenizer_oov_rate, quality_rule_ablation) beyond
the exact-oracle gate: numpy/pandas replays of each face's math, a
handcrafted hubness-suppression corpus for the margin face (the
semantics raw cosine cannot reproduce), cross-face consistency against
the gate the ablation attributes, and the plan-shape contracts."""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from process_nwb_spark.relational.core import all_queries

SF = "/root/testdata/sf0.01"


# ---------------------------------------------------------------------------
# numpy replay of the shared IVF assignment (embed_lsh._ivf_lists rule:
# label-mean centroids, L2 rounded to 9, ties on cid)
# ---------------------------------------------------------------------------
def _ivf_assign_np(emb, labels):
    cents = {}
    for lab in np.unique(labels):
        cents[int(lab)] = emb[labels == lab].astype(np.float64).mean(axis=0)
    cids = sorted(cents)
    cmat = np.stack([cents[c] for c in cids])
    d = np.sqrt(((emb[:, None, :].astype(np.float64)
                  - cmat[None, :, :]) ** 2).sum(axis=2))
    d = np.round(d, 9)
    # argmin with tie on cid: np.argmin takes the first (= smallest cid)
    return np.array([cids[i] for i in np.argmin(d, axis=1)])


def _load_emb(spark, sf):
    pdf = (spark.read.parquet(f"{sf}/embeddings.parquet")
           .toPandas().sort_values("vec_id").reset_index(drop=True))
    emb = np.stack(pdf.embedding.to_numpy())
    return pdf.vec_id.to_numpy(), emb, pdf.label.to_numpy()


def test_cell_balance_replay_and_identities(spark):
    vid, emb, lab = _load_emb(spark, SF)
    cid = _ivf_assign_np(emb, lab)
    want = pd.Series(cid).value_counts().sort_index()

    pdf = (all_queries()["embed_cell_balance"].fn(spark, SF)
           .toPandas().sort_values("cid").reset_index(drop=True))
    assert list(pdf.cid) == list(want.index)
    assert list(pdf.n_vecs) == list(want.values)
    assert pdf.n_vecs.sum() == len(vid)
    k, total = len(pdf), pdf.n_vecs.sum()
    assert np.allclose(pdf.share, np.round(pdf.n_vecs / total, 6))
    assert np.allclose(pdf.scaled_load,
                       np.round(pdf.n_vecs * k / total, 4))
    # shares partition the corpus; mean scaled_load is 1 by definition
    assert abs(pdf.share.sum() - 1.0) < 1e-4
    assert abs(pdf.scaled_load.mean() - 1.0) < 1e-3


def _margin_replay_np(vid, emb, cid, topk=4):
    """Full margin-mining replay: per-cell even-x/odd-y pairs, integer
    micro-cosines, top-k neighborhood sums, ratio margins, best per x."""
    n = emb.astype(np.float64)
    norm = np.sqrt((n * n).sum(axis=1))
    pairs = []   # (xid, yid, micro)
    for c in np.unique(cid):
        xs = [i for i in range(len(vid)) if cid[i] == c and vid[i] % 2 == 0]
        ys = [i for i in range(len(vid)) if cid[i] == c and vid[i] % 2 == 1]
        for i in xs:
            for j in ys:
                den = norm[i] * norm[j]
                if den == 0:
                    continue
                cos = float(np.dot(n[i], n[j])) / den
                pairs.append((vid[i], vid[j],
                              int(np.round(cos * 1_000_000))))
    df = pd.DataFrame(pairs, columns=["xid", "yid", "micro"])

    def topsum(g, by, other):
        g = g.sort_values(["micro", other], ascending=[False, True])
        h = g.head(topk)
        return pd.Series({"s": int(h.micro.sum()), "c": len(h)})

    fwd = df.groupby("xid").apply(topsum, by="xid", other="yid",
                                  include_groups=False)
    bwd = df.groupby("yid").apply(topsum, by="yid", other="xid",
                                  include_groups=False)
    out = {}
    for _, r in df.iterrows():
        sx, cx = fwd.loc[r.xid]
        sy, cy = bwd.loc[r.yid]
        den = sx * cy + sy * cx
        if den == 0:
            continue
        margin = round(r.micro * 2 * cx * cy / den, 6)
        cur = out.get(r.xid)
        if cur is None or (margin, -r.yid) > (cur[1], -cur[0]):
            out[r.xid] = (r.yid, margin, r.micro)
    return out


def test_margin_bitext_full_numpy_replay(spark):
    vid, emb, lab = _load_emb(spark, SF)
    cid = _ivf_assign_np(emb, lab)
    want = _margin_replay_np(vid, emb, cid)

    pdf = (all_queries()["embed_margin_bitext"].fn(spark, SF)
           .toPandas().sort_values("qid").reset_index(drop=True))
    assert set(pdf.qid) == set(want)
    for _, r in pdf.iterrows():
        yid, margin, micro = want[r.qid]
        assert r.match_id == yid, (r.qid, r.match_id, yid)
        assert r.cos_micro == micro, (r.qid, r.cos_micro, micro)
        assert abs(r.margin - margin) < 1e-9, (r.qid, r.margin, margin)
        assert r.accepted == int(r.margin >= 1.05)


def test_margin_bitext_suppresses_hubs(spark, tmp_path):
    """The reason margin ranking exists (Artetxe & Schwenk): a HUB
    vector (globally close to everything) wins the raw-cosine argmax
    but its inflated own-neighborhood mean cancels out of the ratio —
    the margin picks the DISCRIMINATIVE match instead. Handcrafted
    one-cell corpus: hub y=1 has cosine 0.5 to every x; y=3 is x=0's
    true match at 0.45 (and ~0 to everyone else); y=5 is noise.
    Raw cosine for x=0 ranks hub first; the margin must rank y=3
    first — and the replayed margins agree."""
    dim = 64
    rows = []

    def vec(*pairs):
        v = np.zeros(dim, dtype=np.float32)
        for i, x in pairs:
            v[i] = x
        return [float(t) for t in v]

    for k in range(4):                      # x side: e1..e4 (vec_id even)
        rows.append((2 * k, vec((k, 1.0)), 0))
    hub = vec(*[(i, 0.5) for i in range(4)])     # cos 0.5 to every x
    rows.append((1, hub, 0))
    rows.append((3, vec((0, 0.45), (4, float(np.sqrt(1 - 0.45 ** 2)))), 0))
    rows.append((5, vec((5, 1.0)), 0))
    d = str(tmp_path / "hub_corpus")
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int") \
        .write.parquet(f"{d}/embeddings.parquet")

    pdf = (all_queries()["embed_margin_bitext"].fn(spark, d)
           .toPandas().set_index("qid"))
    # raw cosine would pick the hub (0.5 > 0.45) — margin must not
    assert pdf.loc[0].match_id == 3, pdf
    assert pdf.loc[0].accepted == 1
    # every other x has no discriminative partner: their best IS the
    # hub, by margin as well (nothing else comes close)
    for q in (2, 4, 6):
        assert pdf.loc[q].match_id == 1, (q, pdf.loc[q])
    # and the numbers match the replay exactly
    vid = np.array([r[0] for r in rows])
    emb = np.stack([np.array(r[1], dtype=np.float32) for r in rows])
    lab = np.array([r[2] for r in rows])
    want = _margin_replay_np(vid, emb, _ivf_assign_np(emb, lab))
    for q, (yid, margin, micro) in want.items():
        assert pdf.loc[q].match_id == yid
        assert abs(pdf.loc[q].margin - margin) < 1e-9


def test_oov_rate_pandas_replay(spark):
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("source", "text").toPandas())
    tok = (docs.assign(w=docs.text.str.split(" ")).explode("w")
           .reset_index(drop=True))
    counts = (tok.groupby("w").size().reset_index(name="n")
              .sort_values(["n", "w"], ascending=[False, True]))
    vocab = set(counts.head(16).w)
    tok["oov"] = (~tok.w.isin(vocab)).astype(int)
    want = tok.groupby("source").agg(
        n_tokens=("w", "size"), n_oov=("oov", "sum"))
    want["n_oov_types"] = (tok[tok.oov == 1].groupby("source").w.nunique()
                           .reindex(want.index, fill_value=0))
    want["oov_rate"] = np.round(want.n_oov / want.n_tokens, 6)

    pdf = (all_queries()["tokenizer_oov_rate"].fn(spark, SF)
           .toPandas().set_index("source").sort_index())
    want = want.sort_index()
    assert list(pdf.n_tokens) == list(want.n_tokens)
    assert list(pdf.n_oov) == list(want.n_oov)
    assert list(pdf.n_oov_types) == list(want.n_oov_types)
    assert np.allclose(pdf.oov_rate, want.oov_rate)


def test_rule_ablation_consistent_with_gate_and_stats(spark):
    """Cross-face consistency: n_fail per rule must equal the gate's
    per-doc flags folded by hand AND quality_rule_stats' fail counts;
    sum of n_sole_fail must equal the number of docs the gate says
    fail EXACTLY one rule. The ablation can never disagree with the
    gate it attributes."""
    qs = all_queries()
    abl = qs["quality_rule_ablation"].fn(spark, SF).toPandas() \
        .set_index("rule")
    gate = qs["quality_gopher_rules"].fn(spark, SF).toPandas()
    stats = qs["quality_rule_stats"].fn(spark, SF).toPandas().iloc[0]

    rule_to_stat = {
        "r_word_count": "fail_word_count",
        "r_mean_word_len": "fail_mean_word_len",
        "r_symbol_ratio": "fail_symbol_ratio",
        "r_stopwords": "fail_stopwords",
        "r_dup_words": "fail_dup_words"}
    n_docs = len(gate)
    for rule, statcol in rule_to_stat.items():
        n_fail = int((gate[rule] == 0).sum())
        assert abl.loc[rule].n_fail == n_fail
        assert abl.loc[rule].n_fail == stats[statcol]
        sole = int(((gate[rule] == 0) & (gate.n_rules_failed == 1)).sum())
        assert abl.loc[rule].n_sole_fail == sole
        assert abl.loc[rule].n_sole_fail <= abl.loc[rule].n_fail
        assert abl.loc[rule].fail_share == round(n_fail / n_docs, 6)
    assert (abl.n_sole_fail.sum()
            == int((gate.n_rules_failed == 1).sum()))


def test_r14_plan_shapes(spark):
    """Scale contracts: cell-balance is hash-aggs + broadcasts (never a
    corpus-wide sort); oov joins the FIXED-SIZE vocab broadcast and
    partial-aggs; rule ablation is a zero-join scan into one 5-row
    agg; margin mining is cell-bounded (no cartesian), with every
    top-k window partitioned on the vector id — no single-partition
    window anywhere."""
    from process_nwb_spark.plans.inspect import (
        count_single_partition_exchanges, formatted_plan,
        has_broadcast_join, has_partial_aggregation)

    qs = all_queries()
    cb = qs["embed_cell_balance"].fn(spark, SF)
    assert has_broadcast_join(cb)
    assert has_partial_aggregation(cb)

    oov = qs["tokenizer_oov_rate"].fn(spark, SF)
    plan = formatted_plan(oov, "simple")
    assert "CartesianProduct" not in plan, plan
    assert has_broadcast_join(oov), plan
    assert has_partial_aggregation(oov), plan

    abl = qs["quality_rule_ablation"].fn(spark, SF)
    plan = formatted_plan(abl, "simple")
    assert "Join" not in plan, plan
    assert has_partial_aggregation(abl), plan

    mb = qs["embed_margin_bitext"].fn(spark, SF)
    plan = formatted_plan(mb, "formatted")
    assert "CartesianProduct" not in plan, plan
    assert count_single_partition_exchanges(mb) == 0, plan
    rn = [ln for ln in plan.splitlines()
          if "row_number()" in ln and "windowspecdefinition" in ln]
    assert rn, plan
    assert all(("xid#" in ln) or ("yid#" in ln) for ln in rn), rn
