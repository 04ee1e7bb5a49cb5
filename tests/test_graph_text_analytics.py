"""Independent (non-DuckDB) replays for the round-7 graph/text/TS/embedding
additions: BFS distances vs a pure-Python Dijkstra-on-unit-weights, BPE pair
counts vs a literal dict recount, ACF vs numpy.corrcoef over the lag-aligned
series, and the hard-negative contract (different label, true top-k)."""
import collections

import numpy as np
import pandas as pd

from process_nwb_spark.relational.event_windows import ts_acf
from process_nwb_spark.relational.graph_ops import (_BFS_FANOUT, _BFS_HOPS,
                                                    _BFS_SRC, graph_bfs_hops)
from process_nwb_spark.relational.llm_ops import (bpe_pair_counts,
                                                  embed_hard_negatives)
from tests.conftest import SF_CORRECT


def test_bfs_hops_match_python_bfs(spark):
    """Replay the sparsified trade graph in pure Python and BFS it."""
    li = spark.read.parquet(f"{SF_CORRECT}/lineitem.parquet") \
        .select("l_orderkey", "l_suppkey")
    o = spark.read.parquet(f"{SF_CORRECT}/orders.parquet") \
        .select("o_orderkey", "o_custkey")
    c = spark.read.parquet(f"{SF_CORRECT}/customer.parquet") \
        .select("c_custkey", "c_nationkey")
    s = spark.read.parquet(f"{SF_CORRECT}/supplier.parquet") \
        .select("s_suppkey", "s_nationkey")
    pdf = (li.join(o, li.l_orderkey == o.o_orderkey)
           .join(c, o.o_custkey == c.c_custkey)
           .join(s, li.l_suppkey == s.s_suppkey)
           .select("c_nationkey", "s_nationkey").toPandas())
    cnt = collections.Counter(
        (int(a), int(b)) for a, b in pdf.itertuples(index=False)
        if a != b)
    by_src = collections.defaultdict(list)
    for (src, dst), w in cnt.items():
        by_src[src].append((-w, dst))
    g = {src: [d for _, d in sorted(lst)[:_BFS_FANOUT]]
         for src, lst in by_src.items()}
    dist = {_BFS_SRC: 0}
    frontier = [_BFS_SRC]
    for hop in range(1, _BFS_HOPS + 1):
        nxt = []
        for u in frontier:
            for v in g.get(u, ()):
                if v not in dist:
                    dist[v] = hop
                    nxt.append(v)
        frontier = nxt
    got = {int(r.nationkey): int(r.hops)
           for r in graph_bfs_hops(spark, SF_CORRECT).collect()}
    assert got == dist
    assert got[_BFS_SRC] == 0 and max(got.values()) >= 2


def test_bpe_pairs_match_dict_recount(spark):
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet") \
        .select("text").toPandas()
    counts = collections.Counter()
    for text in docs["text"]:
        for w in text.split(" "):
            for i in range(len(w) - 1):
                counts[w[i:i + 2]] += 1
    want = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [(r.pair, r.total)
           for r in bpe_pair_counts(spark, SF_CORRECT).collect()]
    assert got == want


def test_acf_matches_numpy_corrcoef(spark):
    ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet") \
        .select("event_type", "ts").toPandas()
    ev["di"] = (ev["ts"].dt.normalize()
                - pd.Timestamp("2024-01-01")).dt.days
    got = {(r.event_type, r.lag): (r.n_pairs, r.acf)
           for r in ts_acf(spark, SF_CORRECT).collect()}
    n_checked = 0
    for et, grp in ev.groupby("event_type"):
        daily = grp.groupby("di").size()
        for k in range(1, 8):
            x, y = [], []
            for di, cx in daily.items():
                if di + k in daily.index:
                    x.append(cx)
                    y.append(daily[di + k])
            if len(x) < 3 or len(set(x)) == 1 or len(set(y)) == 1:
                assert (et, k) not in got
                continue
            r = np.corrcoef(np.array(x, dtype=float),
                            np.array(y, dtype=float))[0, 1]
            n, acf = got[(et, k)]
            assert n == len(x)
            assert abs(acf - r) < 1e-6, (et, k, acf, r)
            n_checked += 1
    assert n_checked == len(got) > 0


def test_hard_negatives_contract(spark):
    emb = spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet").toPandas()
    vecs = {int(r.vec_id): (np.asarray(r.embedding, dtype=np.float64),
                            int(r.label))
            for r in emb.itertuples(index=False)}
    rows = embed_hard_negatives(spark, SF_CORRECT).collect()
    by_anchor = collections.defaultdict(list)
    for r in rows:
        assert r.neg_label != r.anchor_label
        by_anchor[int(r.anchor_id)].append(r)
    assert sorted(by_anchor) == [a for a in sorted(vecs) if a % 50 == 0]
    for aid, got in by_anchor.items():
        av, albl = vecs[aid]
        sims = []
        for vid, (v, lbl) in vecs.items():
            if lbl == albl:
                continue
            cos = float(av @ v / (np.linalg.norm(av) * np.linalg.norm(v)))
            sims.append((-round(cos, 6), vid))
        want = [vid for _, vid in sorted(sims)[:3]]
        assert [int(r.neg_id) for r in got] == want
        for r in got:
            ref = -[s for s, vid in sims if vid == int(r.neg_id)][0]
            assert abs(r.cosine - ref) < 2e-6


def test_bitmap_retention_matches_set_intersection(spark):
    from process_nwb_spark.relational.fn_extra import (
        bitmap_retention_intersect)
    ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet") \
        .select("user_id", "ts").toPandas()
    w1 = set(ev.loc[(ev.ts >= "2024-01-01") & (ev.ts < "2024-01-08"),
                    "user_id"])
    w2 = set(ev.loc[(ev.ts >= "2024-01-08") & (ev.ts < "2024-01-15"),
                    "user_id"])
    r = bitmap_retention_intersect(spark, SF_CORRECT).collect()[0]
    assert (r.n_week1, r.n_week2, r.n_retained) == \
        (len(w1), len(w2), len(w1 & w2))
    assert r.retention == round(len(w1 & w2) / len(w1), 6)


def test_temperature_weights_sum_to_one_and_boost_rare(spark):
    from process_nwb_spark.relational.dataprep import mix_temperature_weights
    rows = mix_temperature_weights(spark, SF_CORRECT).collect()
    shares = {r.lang: r.share for r in rows}
    temps = {r.lang: r.temp_share for r in rows}
    assert abs(sum(shares.values()) - 1.0) < 1e-5
    assert abs(sum(temps.values()) - 1.0) < 1e-5
    # T=2 compresses the distribution: rare strata boosted, common damped
    rare = min(shares, key=shares.get)
    common = max(shares, key=shares.get)
    assert temps[rare] > shares[rare]
    assert temps[common] < shares[common]
    for r in rows:
        want = (shares[r.lang] ** 0.5
                / sum(s ** 0.5 for s in shares.values()))
        assert abs(r.temp_share - want) < 1e-4
        assert abs(r.boost - r.temp_share / r.share) < 2e-3


def test_holt_linear_matches_python_recurrence(spark):
    from process_nwb_spark.relational.event_windows import ts_holt_linear
    ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet") \
        .select("event_type", "ts").toPandas()
    ev["d"] = ev["ts"].dt.normalize()
    got = {r.event_type: (r.n_days, r.level, r.trend, r.forecast_7d)
           for r in ts_holt_linear(spark, SF_CORRECT).collect()}
    for et, grp in ev.groupby("event_type"):
        xs = grp.groupby("d").size().sort_index().to_list()
        l, b = float(xs[0]), float(xs[1] - xs[0])
        for x in xs[1:]:
            nl = 0.5 * x + 0.5 * (l + b)
            b = 0.5 * (nl - l) + 0.5 * b
            l = nl
        n, lv, tr, fc = got[et]
        assert n == len(xs)
        assert lv == round(l, 4) and tr == round(b, 4)
        assert fc == round(l + 7 * b, 4)
