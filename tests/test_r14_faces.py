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
    window anywhere. Since the r14 `_ivf_lists` rewrite the k
    centroids fold into ONE broadcast row, so exactly one
    SinglePartition exchange is allowed: the k-bounded centroid fold
    (map-side partial_collect_list below it, BroadcastExchange above
    it) — never a corpus-row funnel."""
    from process_nwb_spark.plans.inspect import (
        formatted_plan, has_broadcast_join, has_partial_aggregation)

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
    # Every SinglePartition exchange must be the k-bounded centroid fold
    # (ObjectHashAggregate partial_collect_list over the k-row centroid
    # cache) — the plan dump repeats that one cached node at each
    # reference site; what is forbidden is a corpus-row funnel.
    simple = formatted_plan(mb, "simple")
    slines = simple.splitlines()
    sp_sites = [i for i, ln in enumerate(slines)
                if "Exchange SinglePartition" in ln]
    assert sp_sites, simple  # the centroid fold must be present
    for i in sp_sites:
        nxt = slines[i + 1]
        assert ("ObjectHashAggregate" in nxt
                and "partial_collect_list" in nxt), simple
    rn = [ln for ln in plan.splitlines()
          if "row_number()" in ln and "windowspecdefinition" in ln]
    assert rn, plan
    assert all(("xid#" in ln) or ("yid#" in ln) for ln in rn), rn


# ---------------------------------------------------------------------------
# r14 second batch: bounded-duplication keep policy + word burstiness
# ---------------------------------------------------------------------------
def test_cluster_cap_on_injected_duplicates(spark, tmp_path):
    """Known cluster sizes 1/2/5: cluster_size and copy_rank are exact,
    kept = rank <= 2, and whitespace/case variants land in the SAME
    cluster (the dedup_exact-normalized fingerprint)."""
    rows = [(0, "solo doc")]
    rows += [(i, "twin doc") for i in (1, 2)]
    rows += [(10, "five doc"), (11, "FIVE  DOC "), (12, "five doc"),
             (13, " five DOC"), (14, "five doc")]
    d = str(tmp_path / "dup_corpus")
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(f"{d}/documents.parquet")
    pdf = (all_queries()["dedup_cluster_cap"].fn(spark, d)
           .toPandas().set_index("doc_id").sort_index())
    assert pdf.loc[0].cluster_size == 1 and pdf.loc[0].kept == 1
    assert (pdf.loc[[1, 2]].cluster_size == 2).all()
    assert (pdf.loc[[1, 2]].kept == 1).all()
    five = pdf.loc[10:14]
    assert (five.cluster_size == 5).all()
    assert five.fp.nunique() == 1       # normalization unifies variants
    assert list(five.sort_index().copy_rank) == [1, 2, 3, 4, 5]
    assert list(five.sort_index().kept) == [1, 1, 0, 0, 0]


def test_cluster_cap_consistent_with_dedup_exact(spark):
    """Cross-face: rank-1 members ARE dedup_exact's keep list (same
    normalized fingerprint, same min-doc_id canonical rule), and
    per-cluster kept counts are min(K, size)."""
    qs = all_queries()
    cap = qs["dedup_cluster_cap"].fn(spark, SF).toPandas()
    exact = qs["dedup_exact"].fn(spark, SF).toPandas()
    rank1 = cap[cap.copy_rank == 1]
    assert set(rank1.doc_id) == set(exact.keep_doc_id)
    sizes = cap.groupby("fp").agg(size=("cluster_size", "first"),
                                  kept=("kept", "sum"))
    assert (sizes.kept == np.minimum(sizes["size"], 2)).all()
    exact_sizes = exact.set_index("fp").n_copies
    assert sizes["size"].sort_index().equals(
        exact_sizes.sort_index().astype(sizes["size"].dtype))


def test_burstiness_pandas_replay_and_edge_cases(spark, tmp_path):
    """Exact pandas replay at sf0.01, plus the degenerate cases stated
    as data: a uniform word (one occurrence per containing doc) has
    fano 0; a df=1 word has fano NULL; a bursty word's fano matches
    the closed form."""
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").toPandas())
    tok = (docs.assign(w=docs.text.str.split(" ")).explode("w")
           .groupby(["doc_id", "w"]).size().reset_index(name="c"))
    g = tok.groupby("w").agg(df=("c", "size"), tf=("c", "sum"),
                             sc2=("c", lambda s: int((s.astype(object)
                                                      ** 2).sum())))
    want_mean = np.round(g.tf / g.df, 6)
    num = g.df.astype(object) * g.sc2 - g.tf.astype(object) ** 2
    den = (g.df - 1.0) * g.tf
    want_fano = pd.Series(
        [round(int(n) / d, 6) if d != 0 else None
         for n, d in zip(num, den)], index=g.index)

    pdf = (all_queries()["corpus_word_burstiness"].fn(spark, SF)
           .toPandas().set_index("w").sort_index())
    g = g.sort_index()
    assert list(pdf.df) == list(g.df)
    assert list(pdf.tf) == list(g.tf)
    assert np.allclose(pdf.mean_tf, want_mean.sort_index())
    wf = want_fano.sort_index()
    both = pd.concat([pdf.fano, wf], axis=1)
    assert ((both.iloc[:, 0].isna() & both.iloc[:, 1].isna())
            | (np.abs(both.iloc[:, 0] - both.iloc[:, 1]) < 1e-12)).all()

    # handcrafted: uniform / singleton / bursty
    rows = [(0, "uni burst"), (1, "uni burst burst burst burst"),
            (2, "uni solo")]
    d = str(tmp_path / "burst_corpus")
    spark.createDataFrame(rows, "doc_id long, text string") \
        .write.parquet(f"{d}/documents.parquet")
    got = (all_queries()["corpus_word_burstiness"].fn(spark, d)
           .toPandas().set_index("w"))
    assert got.loc["uni"].fano == 0.0            # c = (1,1,1): var 0
    assert pd.isna(got.loc["solo"].fano)         # df = 1: undefined
    # burst: c = (1, 4), df 2, tf 5, sc2 17 -> (2*17-25)/(1*5) = 1.8
    assert got.loc["burst"].fano == 1.8


def test_r14_second_batch_plan_shapes(spark):
    """cluster_cap: ONE shuffle, window partitioned on the
    high-cardinality fingerprint (never SinglePartition); burstiness:
    zero joins, two map-side-combined hash-aggs."""
    from process_nwb_spark.plans.inspect import (
        count_exchanges, formatted_plan, has_partial_aggregation)

    qs = all_queries()
    cc = qs["dedup_cluster_cap"].fn(spark, SF)
    plan = formatted_plan(cc, "formatted")
    assert "SinglePartition" not in plan, plan
    # exactly ONE hash shuffle (on fp) — both windows ride it; the
    # second exchange in the raw count is spread()'s test-scale
    # round-robin repartition of the single-file scan, not a plan cost
    simple = formatted_plan(cc, "simple")
    assert simple.count("Exchange hashpartitioning") == 1, simple
    rn = [ln for ln in plan.splitlines()
          if "row_number()" in ln and "windowspecdefinition" in ln]
    assert rn and all("fp#" in ln for ln in rn), rn

    wb = qs["corpus_word_burstiness"].fn(spark, SF)
    plan = formatted_plan(wb, "simple")
    assert "Join" not in plan, plan
    assert has_partial_aggregation(wb), plan


def test_mrr_pandas_replay_and_ndcg_consistency(spark):
    """Exact pandas replay of MRR@10 from the raw corpus (same scoring
    rule), plus cross-eval consistency: n_matched per term must equal
    rank_ndcg_eval's (shared _term_ranked frame), and any term with
    rr10 > 0 must have a relevant doc inside the replayed top-10."""
    docs = (spark.read.parquet(f"{SF}/documents.parquet")
            .select("doc_id", "text").toPandas())
    terms = ("spark", "window", "hash", "join")
    want = {}
    for t in terms:
        rows = []
        for _, r in docs.iterrows():
            ws = r.text.split(" ")
            tf = ws.count(t)
            if tf >= 1:
                rows.append((r.doc_id, min(tf, 3),
                             (tf * 10000) // max(len(ws), 1)))
        rows.sort(key=lambda x: (-x[2], x[0]))
        first = next((i + 1 for i, x in enumerate(rows[:10])
                      if x[1] >= 2), None)
        want[t] = (len(rows), first,
                   round(1.0 / first, 6) if first else 0.0)

    pdf = (all_queries()["rank_mrr_eval"].fn(spark, SF)
           .toPandas().set_index("term"))
    ndcg = (all_queries()["rank_ndcg_eval"].fn(spark, SF)
            .toPandas().set_index("term"))
    assert set(pdf.index) == set(terms)
    for t in terms:
        n, first, rr = want[t]
        assert pdf.loc[t].n_matched == n == ndcg.loc[t].n_matched
        got_first = pdf.loc[t].first_rel_pos
        assert (pd.isna(got_first) and first is None) \
            or got_first == first, (t, got_first, first)
        assert pdf.loc[t].rr10 == rr
