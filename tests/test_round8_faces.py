"""Independent (non-DuckDB) replays for the round-8 faces, plus the
convergence margin for the bounded-round k-core peel."""
import math

import numpy as np

from tests.conftest import SF_CORRECT


def _reg():
    from process_nwb_spark.relational.core import all_queries
    return all_queries()


def test_rolling_regression_matches_numpy(spark):
    """Replay the 14-day OLS slope with numpy lstsq over the collected
    daily series — independent of both engines' window machinery."""
    import pandas as pd
    from pyspark.sql import functions as F

    daily = (spark.read.parquet(f"{SF_CORRECT}/events.parquet")
             .groupBy("event_type", F.col("ts").cast("date").alias("d"))
             .agg(F.sum(F.round(F.col("value") * 100.0, 0).cast("bigint"))
                  .alias("yc"))
             .toPandas().sort_values(["event_type", "d"]))
    got = {(r.event_type, r.day): (r.slope_cents, r.rising)
           for r in _reg()["win_rolling_regression"]
           .fn(spark, SF_CORRECT).collect()}
    n_checked = 0
    for et, g in daily.groupby("event_type"):
        ds = pd.to_datetime(g["d"]).to_numpy()
        ys = g["yc"].to_numpy(dtype=np.float64)
        for i in range(13, len(g)):
            span = (ds[i] - ds[i - 13]) / np.timedelta64(1, "D")
            key = (et, str(pd.Timestamp(ds[i]).date()))
            if span != 13:
                assert key not in got, f"gapped window emitted: {key}"
                continue
            x = np.arange(14, dtype=np.float64)
            y = ys[i - 13:i + 1]
            slope = np.polyfit(x, y, 1)[0]
            assert key in got, key
            assert math.isclose(got[key][0], slope, rel_tol=1e-6,
                                abs_tol=1e-4), (key, got[key][0], slope)
            assert got[key][1] == int(slope > 0) or abs(slope) < 1e-6
            n_checked += 1
    assert n_checked >= 50   # the face actually covers real windows


def test_ann_recall_matches_numpy(spark):
    """Replay the probe-budget recall curve densely: per-label mean
    centroids, nearest-cell assignment (rounded L2, cid tie-break),
    exact cosine top-10 (rounded, vec_id tie-break), overlap counting."""
    pdf = (spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet")
           .select("vec_id", "label", "embedding").toPandas())
    V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    labels = pdf["label"].to_numpy()
    cids = sorted(set(labels))
    C = np.stack([V[labels == c].mean(axis=0) for c in cids])

    def l2r(a, b):
        return np.round(np.sqrt(((a - b) ** 2).sum(-1)), 9)

    # vector -> cell (min rounded L2, cid tie-break via sorted cids order)
    d2c = l2r(V[:, None, :], C[None, :, :])
    assign = {int(i): cids[int(r)] for i, r in zip(ids, d2c.argmin(axis=1))}

    overlap = {1: 0, 2: 0, 4: 0}
    anchors = [int(i) for i in ids if i % 50 == 0]
    for aid in anchors:
        ai = int(np.where(ids == aid)[0][0])
        mask = ids != aid
        cos = np.round(
            V[mask] @ V[ai]
            / (np.linalg.norm(V[mask], axis=1) * np.linalg.norm(V[ai])), 6)
        order = sorted(zip(-cos, ids[mask]))
        top10 = [int(v) for _, v in order[:10]]
        cell_rank = {cids[int(c)]: r + 1
                     for r, c in enumerate(np.lexsort(
                         (cids, l2r(C, V[ai]))))}
        for p in overlap:
            overlap[p] += sum(1 for v in top10
                              if cell_rank[assign[v]] <= p)
    got = {r.probe: r for r in _reg()["ann_recall_at_k"]
           .fn(spark, SF_CORRECT).collect()}
    for p in (1, 2, 4):
        assert got[p].sum_overlap == overlap[p], (p, got[p], overlap[p])
        assert got[p].n_anchors == len(anchors)
        assert got[p].recall_at_10 == overlap[p] / (10.0 * len(anchors))
    # the curve is monotone in probe budget and ends usefully high
    assert got[1].sum_overlap <= got[2].sum_overlap <= got[4].sum_overlap


def test_kcore_matches_python_peel_and_converges_with_margin(spark):
    """Pure-Python peel replay (same sparsified graph, run to FIXPOINT)
    must equal the face's bounded-round output — which also proves the
    5-round bound converged; the margin assertion pins convergence by
    round 3 (2x slack below the bound) so a fixture change can't
    silently turn 'bounded peel' into 'truncated peel'."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SF_CORRECT}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_CORRECT}/orders.parquet")
    c = spark.read.parquet(f"{SF_CORRECT}/customer.parquet")
    s = spark.read.parquet(f"{SF_CORRECT}/supplier.parquet")
    de = (ev.join(o, ev.l_orderkey == o.o_orderkey)
          .join(c, o.o_custkey == c.c_custkey)
          .join(s, ev.l_suppkey == s.s_suppkey)
          .filter(F.col("c_nationkey") != F.col("s_nationkey"))
          .groupBy(F.col("c_nationkey").alias("src"),
                   F.col("s_nationkey").alias("dst"))
          .agg(F.count("*").alias("w")).collect())
    by_src = {}
    for r in de:
        by_src.setdefault(r.src, []).append((-r.w, r.dst))
    edges = set()
    for src, lst in by_src.items():
        for _, dst in sorted(lst)[:3]:
            edges.add((min(src, dst), max(src, dst)))

    def peel(k):
        e = set(edges)
        rounds = 0
        while True:
            deg = {}
            for u, v in e:
                deg[u] = deg.get(u, 0) + 1
                deg[v] = deg.get(v, 0) + 1
            alive = {n for n, d in deg.items() if d >= k}
            e2 = {(u, v) for u, v in e if u in alive and v in alive}
            if e2 == e:
                return e, rounds
            e, rounds = e2, rounds + 1

    want, max_rounds = {}, 0
    for k in range(1, 5):
        ek, rounds = peel(k)
        max_rounds = max(max_rounds, rounds)
        for u, v in ek:
            for node in (u, v):
                want[node] = max(want.get(node, 0), k)
    # convergence margin: bound is 5 rounds, require fixpoint by 3
    assert max_rounds <= 3, max_rounds

    got = {r.nationkey: r.coreness for r in _reg()["graph_kcore_peel"]
           .fn(spark, SF_CORRECT).collect()}
    assert len(got) == 25
    for node in got:
        assert got[node] == want.get(node, 0), (node, got[node],
                                                want.get(node))
    assert max(got.values()) == 3      # fixture max coreness (cap is 4)


def test_range_bucket_join_is_equi_not_nested_loop(spark):
    """The bucketing rewrite exists to keep interval joins off the
    nested-loop path; gate the plan on it (4 bands won't hurt, a
    million IP ranges would)."""
    from process_nwb_spark.plans.inspect import formatted_plan

    df = _reg()["join_interval_bucketed"].fn(spark, SF_CORRECT)
    plan = formatted_plan(df, "simple")
    assert "CartesianProduct" not in plan
    # the interval match itself must be a HASH join on bucket with the
    # range condition as its residual — never a nested-loop over
    # probe x intervals
    join_lines = [l for l in plan.splitlines() if "Join" in l]
    hash_lines = [l for l in join_lines if "BroadcastHashJoin" in l
                  or "SortMergeJoin" in l]
    assert any("bucket" in l and "lo" in l and "hi" in l
               for l in hash_lines), join_lines
    # the only nested-loop joins allowed are the ONE-ROW width-scalar
    # attaches (the established broadcast-scalar crossJoin pattern) —
    # none may carry the interval predicate
    for l in join_lines:
        if "BroadcastNestedLoopJoin" in l:
            assert "lo" not in l and "hi" not in l, l


def test_range_bucket_matches_numpy(spark):
    import pandas as pd  # noqa: F401
    from pyspark.sql import functions as F

    t = (spark.read.parquet(f"{SF_CORRECT}/orders.parquet")
         .select(F.round(F.col("o_totalprice") * 100.0, 0).cast("bigint")
                 .alias("t")).toPandas()["t"].to_numpy())
    ts = np.sort(t)

    def disc(p):   # PERCENTILE_DISC: smallest value with cum_frac >= p
        idx = int(np.ceil(p * len(ts))) - 1
        return int(ts[max(idx, 0)])

    qs = [int(ts[0]), disc(0.25), disc(0.5), disc(0.75), int(ts[-1]) + 1]
    want = {}
    for b in range(4):
        lo, hi = qs[b], qs[b + 1]
        sel = t[(t >= lo) & (t < hi)]
        if len(sel):
            want[b] = (lo, hi, len(sel), int(sel.sum()))
    got = {r.band: (r.lo, r.hi, r.n_orders, r.sum_cents)
           for r in _reg()["join_interval_bucketed"].fn(spark, SF_CORRECT)
           .collect()}
    assert got == want
    assert sum(v[2] for v in got.values()) == len(t)  # partition covers all


def test_anomaly_mad_matches_numpy(spark):
    from pyspark.sql import functions as F

    daily = (spark.read.parquet(f"{SF_CORRECT}/events.parquet")
             .groupBy("event_type", F.col("ts").cast("date").alias("d"))
             .agg(F.count("*").alias("cnt")).toPandas())
    got = {(r.event_type, r.day): (r.cnt, r.med, r.mad, r.is_anomaly)
           for r in _reg()["ts_anomaly_mad"].fn(spark, SF_CORRECT)
           .collect()}
    assert len(got) == len(daily)
    n_anom = 0
    for et, g in daily.groupby("event_type"):
        cnt = np.sort(g["cnt"].to_numpy())

        def disc(arr, p=0.5):
            arr = np.sort(arr)
            return int(arr[max(int(np.ceil(p * len(arr))) - 1, 0)])

        med = disc(cnt)
        adev = np.abs(g["cnt"].to_numpy() - med)
        mad = disc(adev)
        for d, c, a in zip(g["d"], g["cnt"], adev):
            key = (et, str(d))
            assert got[key] == (c, med, mad, int(a > 3 * mad)), (
                key, got[key], (c, med, mad, int(a > 3 * mad)))
            n_anom += int(a > 3 * mad)
    assert n_anom >= 0   # flags replayed exactly (count pinned above)


def test_label_propagation_matches_python_lpa(spark):
    """Replay the synchronous min-tie-break LPA in pure Python over the
    same sparsified graph — independent of Spark's join/window
    machinery — and pin the structural invariants (labels are node ids;
    a node's community lies inside its connected component)."""
    from collections import Counter

    from pyspark.sql import functions as F

    got = {r.nationkey: r.community
           for r in _reg()["graph_label_propagation"]
           .fn(spark, SF_CORRECT).collect()}

    # rebuild the same graph: top-3 outgoing trade edges, undirected
    li = spark.read.parquet(f"{SF_CORRECT}/lineitem.parquet")
    o = spark.read.parquet(f"{SF_CORRECT}/orders.parquet")
    c = spark.read.parquet(f"{SF_CORRECT}/customer.parquet")
    s = spark.read.parquet(f"{SF_CORRECT}/supplier.parquet")
    w = (li.join(o, li.l_orderkey == o.o_orderkey)
         .join(c, o.o_custkey == c.c_custkey)
         .join(s, li.l_suppkey == s.s_suppkey)
         .filter(F.col("c_nationkey") != F.col("s_nationkey"))
         .groupBy(F.col("c_nationkey").alias("src"),
                  F.col("s_nationkey").alias("dst"))
         .agg(F.count("*").alias("w"))).collect()
    by_src = {}
    for r in w:
        by_src.setdefault(r.src, []).append((-r.w, r.dst))
    und = set()
    for src, lst in by_src.items():
        for _, dst in sorted(lst)[:3]:
            und.add((min(src, dst), max(src, dst)))
    adj = {}
    for u, v in und:
        adj.setdefault(u, []).append(v)
        adj.setdefault(v, []).append(u)

    labels = {n: n for n in adj}
    for _ in range(4):
        nxt = {}
        for n in adj:
            cnt = Counter(labels[nb] for nb in adj[n])
            best = max(cnt.items(), key=lambda kv: (kv[1], -kv[0]))
            nxt[n] = best[0]
        labels = nxt
    assert got == labels

    # invariants: community ids are node ids within the same component;
    # map every node to a canonical component representative
    reps = {}
    for start in adj:
        if start not in reps:
            stack, seen = [start], {start}
            while stack:
                x = stack.pop()
                reps[x] = start
                for nb in adj[x]:
                    if nb not in seen:
                        seen.add(nb)
                        stack.append(nb)
    for n, lbl in got.items():
        assert lbl in adj, "community id must be a node id"
        assert reps.get(lbl) == reps.get(n), \
            "community must stay within the connected component"


def test_kgram_profile_bounds_and_python_replay(spark):
    """dup counts bounded by gram counts; ratios in [0,1]; exact replay
    of a sample of docs with pure-Python hashing."""
    import hashlib

    rows = (_reg()["text_kgram_dup_profile"].fn(spark, SF_CORRECT)
            .collect())
    assert rows
    for r in rows:
        assert 0 <= r.n_dup_grams <= r.n_grams
        assert 0.0 <= r.dup_ratio <= 1.0

    docs = {r.doc_id: r.text for r in
            spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
            .select("doc_id", "text").collect()}
    grams = {}
    per_doc = {}
    for did, text in docs.items():
        toks = text.split(" ")
        hs = [hashlib.md5(" ".join(toks[i:i + 8]).encode()).hexdigest()
              for i in range(len(toks) - 7)]
        per_doc[did] = hs
        for h in hs:
            grams.setdefault(h, set()).add(did)
    want = {}
    for did, hs in per_doc.items():
        if not hs:
            continue
        dup = sum(1 for h in hs if len(grams[h]) >= 2)
        want[did] = (len(hs), dup)
    got = {r.doc_id: (r.n_grams, r.n_dup_grams) for r in rows}
    assert got == want


def test_chunk_overlap_tiles_every_token(spark):
    """Chunks must cover every token position (stride < chunk width) and
    the md5 ids must replay in pure Python for a sample of docs."""
    import hashlib

    rows = (_reg()["text_chunk_overlap"].fn(spark, SF_CORRECT)
            .filter("doc_id % 97 = 0").collect())
    docs = {r.doc_id: r.text.split(" ") for r in
            spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
            .filter("doc_id % 97 = 0").select("doc_id", "text").collect()}
    by_doc = {}
    for r in rows:
        by_doc.setdefault(r.doc_id, []).append(r)
    assert set(by_doc) == set(docs)
    for did, toks in docs.items():
        chunks = sorted(by_doc[did], key=lambda r: r.start_tok)
        covered = set()
        for r in chunks:
            piece = toks[r.start_tok:r.start_tok + 32]
            assert r.n_tok == len(piece)
            assert r.chunk_hash == hashlib.md5(
                " ".join(piece).encode()).hexdigest()
            covered.update(range(r.start_tok, r.start_tok + r.n_tok))
        assert covered == set(range(len(toks))), "chunks must tile the doc"


def test_lttb_matches_python_replay(spark):
    """Replay LTTB in pure Python (textbook formulation with float
    centroid areas) over the same daily rollup: the face's integer
    cross-multiplied argmax must select the identical points — the
    cross-multiplication is an algebraic identity, and this replay is
    the proof it was applied correctly."""
    from pyspark.sql import functions as F

    got = {}
    for r in (_reg()["ts_lttb_downsample"].fn(spark, SF_CORRECT)
              .collect()):
        got.setdefault(r.event_type, []).append((r.pick_no, r.d, r.y))
    ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet")
    daily = (ev.withColumn("ts", F.col("ts").cast("timestamp"))
             .groupBy("event_type", F.col("ts").cast("date").alias("d"))
             .agg(F.count("*").alias("y")).collect())
    series = {}
    for r in daily:
        series.setdefault(r.event_type, []).append((r.d, r.y))
    n_out, nb = 12, 10
    for et, pts in series.items():
        pts.sort()
        m = len(pts)
        if m < n_out:
            assert et not in got
            continue
        xs = [d.toordinal() - 719163 for d, _ in pts]  # epoch days
        # (1970-01-01 has ordinal 719163)
        ys = [y for _, y in pts]
        s = lambda k: 1 + (k * (m - 2)) // nb   # noqa: E731
        sel = [0]
        for j in range(nb):
            lo, hi = s(j), s(j + 1) - 1
            nlo, nhi = s(j + 1), min(s(j + 2) - 1, m - 1)
            cx = sum(xs[nlo:nhi + 1]) / (nhi - nlo + 1)
            cy = sum(ys[nlo:nhi + 1]) / (nhi - nlo + 1)
            px, py = xs[sel[-1]], ys[sel[-1]]
            best, barea = None, -1.0
            for i in range(lo, hi + 1):
                a = abs((px - cx) * (ys[i] - py)
                        - (px - xs[i]) * (cy - py))
                if a > barea + 1e-12:
                    best, barea = i, a
            sel.append(best)
        sel.append(m - 1)
        want = [(k + 1, pts[i][0].strftime("%Y-%m-%d"), pts[i][1])
                for k, i in enumerate(sel)]
        assert got[et] == want, et


def test_scd2_apply_interval_invariants(spark):
    """Structural SCD2 invariants on the incremental result: per key,
    exactly one current row; intervals chain exactly (each valid_to
    equals the next valid_from); adjacent intervals never share a
    status (else they'd be one island)."""
    rows = (_reg()["scd2_apply_changeset"].fn(spark, SF_CORRECT)
            .collect())
    assert rows
    by_key = {}
    for r in rows:
        by_key.setdefault(r.custkey, []).append(r)
    n_multi = 0
    for k, ivs in by_key.items():
        ivs.sort(key=lambda r: r.valid_from)
        assert sum(1 for r in ivs if r.is_current == 1) == 1, k
        assert ivs[-1].is_current == 1 and ivs[-1].valid_to is None, k
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from, (k, a, b)
            assert a.status != b.status, (k, a, b)
        if len(ivs) > 1:
            n_multi += 1
    assert n_multi > 100   # the history is real, not one-row-per-key
