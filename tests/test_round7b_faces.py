"""Independent (non-DuckDB) replays for the second round-7 face batch:
collocation PMI vs a Counter recount, n-gram containment vs Python set
intersection, Bollinger bands vs a pandas rolling recompute, and the MASE
backtest vs a literal dict walk over the daily counts."""
import collections
import math

import numpy as np
import pandas as pd

from process_nwb_spark.relational.event_windows import (ts_bollinger_daily,
                                                        ts_mase_backtest)
from process_nwb_spark.relational.llm_ops import (text_collocations_pmi,
                                                  text_ngram_containment)
from tests.conftest import SF_CORRECT


def _daily_counts(spark):
    ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet") \
        .selectExpr("event_type", "CAST(ts AS DATE) AS d").toPandas()
    return ev.groupby(["event_type", "d"]).size().to_dict()


def test_collocations_match_counter_recount(spark):
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet") \
        .select("text").toPandas()
    uni, big = collections.Counter(), collections.Counter()
    nb = 0
    for text in docs["text"]:
        ws = text.split(" ")
        uni.update(ws)
        if len(ws) >= 2:
            nb += len(ws) - 1
            big.update(zip(ws, ws[1:]))
    scored = sorted(
        ((float(c_ab) * float(nb) / (float(uni[a]) * float(uni[b])),
          a, b, c_ab)
         for (a, b), c_ab in big.items() if c_ab >= 5),
        key=lambda t: (-t[0], t[1], t[2]))[:20]
    got = text_collocations_pmi(spark, SF_CORRECT).collect()
    assert len(got) == len(scored)
    for row, (lift, a, b, c_ab) in zip(got, scored):
        assert (row.w1, row.w2) == (a, b)
        assert row.c_ab == c_ab
        assert (row.c_a, row.c_b) == (uni[a], uni[b])
        assert row.lift == round(lift, 6)


def _shingle_sets(docs):
    sets = {}
    for doc_id, text in docs.itertuples(index=False):
        ws = text.split(" ")
        if len(ws) < 3:
            continue
        sets[int(doc_id)] = {" ".join(ws[i:i + 3])
                             for i in range(len(ws) - 2)}
    return sets


def test_containment_matches_python_sets(spark):
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet") \
        .select("doc_id", "text").toPandas()
    sets = _shingle_sets(docs)
    # df <= 50 cut, identical to the face
    df = collections.Counter(sh for s in sets.values() for sh in s)
    sets = {d: {sh for sh in s if df[sh] <= 50} for d, s in sets.items()}
    want = {}
    ids = sorted(sets)
    inv = collections.defaultdict(set)  # shingle -> docs (candidate gen)
    for d in ids:
        for sh in sets[d]:
            inv[sh].add(d)
    cand = {(a, b) for docs_ in inv.values()
            for a in docs_ for b in docs_ if a < b}
    for a, b in cand:
        inter = len(sets[a] & sets[b])
        mn = min(len(sets[a]), len(sets[b]))
        if mn and inter * 10 >= mn * 3:
            want[(a, b)] = (inter, len(sets[a]), len(sets[b]),
                            round(inter / mn, 6))
    got = {(r.doc_a, r.doc_b): (r.n_common, r.size_a, r.size_b,
                                r.containment)
           for r in text_ngram_containment(spark, SF_CORRECT).collect()}
    assert got == want
    assert len(got) > 0  # the testdata plants near-dups; must find some


def test_bollinger_matches_pandas_rolling(spark):
    daily = _daily_counts(spark)
    pdf = (pd.Series(daily).rename("cnt").rename_axis(["event_type", "d"])
           .reset_index().sort_values(["event_type", "d"]))
    got = {(r.event_type, r.day): r
           for r in ts_bollinger_daily(spark, SF_CORRECT).collect()}
    n_checked = 0
    for et, grp in pdf.groupby("event_type"):
        cnt = grp["cnt"].to_numpy(np.int64)
        days = [str(d) for d in grp["d"]]
        for i in range(6, len(cnt)):
            w = cnt[i - 6:i + 1]
            s, s2 = int(w.sum()), int((w * w).sum())
            ma = s / 7.0
            sd = math.sqrt((7 * s2 - s * s) / 42.0)
            row = got[(et, days[i])]
            assert row.cnt == int(cnt[i])
            assert row.ma7 == round(ma, 6)
            assert row.upper_band == round(ma + 2.0 * sd, 6)
            assert row.lower_band == round(ma - 2.0 * sd, 6)
            assert row.breach_hi == int(cnt[i] > ma + 2.0 * sd)
            n_checked += 1
    assert n_checked == len(got) > 0


def test_mase_matches_dict_walk(spark):
    daily = _daily_counts(spark)
    mxd = max(d for _, d in daily)
    cutoff = mxd - pd.Timedelta(days=7)
    per_type = collections.defaultdict(dict)
    for (et, d), c in daily.items():
        per_type[et][d] = c
    got = {r.event_type: r
           for r in ts_mase_backtest(spark, SF_CORRECT).collect()}
    day = pd.Timedelta(days=1)
    for et, series in per_type.items():
        f_err = [abs(series[d] - series[d - 7 * day])
                 for d in series if d > cutoff and d - 7 * day in series]
        n_err = [abs(series[d] - series[d - day])
                 for d in series if d <= cutoff and d - day in series]
        if not f_err or not n_err or sum(n_err) == 0:
            assert et not in got
            continue
        mae_f = sum(f_err) / len(f_err)
        mae_n = sum(n_err) / len(n_err)
        row = got[et]
        assert row.n_test == len(f_err)
        assert row.n_train_steps == len(n_err)
        assert row.mae_forecast == round(mae_f, 6)
        assert row.mae_naive == round(mae_n, 6)
        assert row.mase == round(mae_f / mae_n, 6)
        # MASE is the scale-free metric: must be finite and positive
        assert 0 < row.mase < 100


def test_corr_matrix_matches_numpy(spark):
    daily = _daily_counts(spark)
    per_type = collections.defaultdict(dict)
    for (et, d), c in daily.items():
        per_type[et][d] = c
    types = sorted(per_type)
    got = {(r.type_a, r.type_b): r
           for r in __import__(
               "process_nwb_spark.relational.event_windows",
               fromlist=["ts_corr_matrix"])
           .ts_corr_matrix(spark, SF_CORRECT).collect()}
    n_pairs = 0
    for i, ta in enumerate(types):
        for tb in types[i + 1:]:
            days = sorted(set(per_type[ta]) & set(per_type[tb]))
            x = np.array([per_type[ta][d] for d in days], dtype=np.int64)
            y = np.array([per_type[tb][d] for d in days], dtype=np.int64)
            if len(days) < 3 or x.var() == 0 or y.var() == 0:
                assert (ta, tb) not in got
                continue
            # the exact integer-sum closed form the face evaluates
            n = len(days)
            sx, sy = int(x.sum()), int(y.sum())
            sxy = int((x * y).sum())
            sx2, sy2 = int((x * x).sum()), int((y * y).sum())
            r = float(n * sxy - sx * sy) / math.sqrt(
                float(n * sx2 - sx * sx) * float(n * sy2 - sy * sy))
            row = got[(ta, tb)]
            assert row.n_days == n
            assert row.r == round(r, 6)
            assert abs(row.r - np.corrcoef(x, y)[0, 1]) < 5e-7
            n_pairs += 1
    assert n_pairs == len(got) > 0


def test_welch_t_matches_formula(spark):
    from process_nwb_spark.relational.event_windows import abtest_welch_t
    o = spark.read.parquet(f"{SF_CORRECT}/orders.parquet") \
        .select("o_custkey", "o_totalprice").toPandas()
    c = spark.read.parquet(f"{SF_CORRECT}/customer.parquet") \
        .select("c_custkey", "c_mktsegment").toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    arms = {}
    for seg in ("BUILDING", "AUTOMOBILE"):
        cents = np.floor(
            j.loc[j.c_mktsegment == seg, "o_totalprice"].to_numpy()
            * 100 + 0.5).astype(np.int64)
        arms[seg] = cents
    a, b = arms["BUILDING"], arms["AUTOMOBILE"]
    va = a.var(ddof=1) / len(a)
    vb = b.var(ddof=1) / len(b)
    diff = a.mean() - b.mean()
    t = diff / math.sqrt(va + vb)
    df = (va + vb) ** 2 / (va * va / (len(a) - 1) + vb * vb / (len(b) - 1))
    row = abtest_welch_t(spark, SF_CORRECT).collect()[0]
    assert (row.n_a, row.n_b) == (len(a), len(b))
    assert abs(row.mean_diff_dollars - diff / 100.0) < 1e-3
    assert abs(row.t_stat - t) < 1e-5
    assert abs(row.welch_df - df) < 0.5


def test_link_predict_matches_python_graph(spark):
    from process_nwb_spark.relational.graph_ops import graph_link_predict
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
    w = collections.Counter((int(a), int(b))
                            for a, b in pdf.itertuples(index=False)
                            if a != b)
    und = set()
    by_src = collections.defaultdict(list)
    for (src, dst), cnt in w.items():
        by_src[src].append((-cnt, dst))
    for src, lst in by_src.items():
        for _, dst in sorted(lst)[:3]:
            und.add((min(src, dst), max(src, dst)))
    nbrs = collections.defaultdict(set)
    for a, b in und:
        nbrs[a].add(b)
        nbrs[b].add(a)
    want = {}
    nodes = sorted(nbrs)
    for i, a in enumerate(nodes):
        for b in nodes[i + 1:]:
            if (a, b) in und:
                continue
            common = len(nbrs[a] & nbrs[b])
            if common:
                want[(a, b)] = (common, len(nbrs[a]), len(nbrs[b]),
                                round(common / len(nbrs[a] | nbrs[b]), 6))
    got = {(r.a, r.b): (r.n_common, r.deg_a, r.deg_b, r.jaccard)
           for r in graph_link_predict(spark, SF_CORRECT).collect()}
    assert got == want
    assert len(got) > 0


def test_pacf_matches_numpy_durbin_levinson(spark):
    from process_nwb_spark.relational.event_windows import _PACF_K, ts_pacf
    daily = _daily_counts(spark)
    per_type = collections.defaultdict(dict)
    for (et, d), c in daily.items():
        per_type[et][d] = c
    got = {(r.event_type, r.lag): r
           for r in ts_pacf(spark, SF_CORRECT).collect()}
    K = _PACF_K
    n_series = 0
    for et, series in per_type.items():
        days = sorted(series)
        x = np.array([series[d] for d in days], dtype=float)
        n = len(x)
        contiguous = (days[-1] - days[0]).days + 1 == n
        if not contiguous or n <= K or x.var() == 0:
            assert not any((et, k) in got for k in range(1, K + 1))
            continue
        m = x.mean()
        gam = [((x[:n - k] - m) * (x[k:] - m)).sum() / n
               for k in range(K + 1)]
        rho = [g / gam[0] for g in gam]
        phi = {1: rho[1]}
        pacf = [rho[1]]
        for k in range(2, K + 1):
            num = rho[k] - sum(phi[j] * rho[k - j] for j in range(1, k))
            den = 1 - sum(phi[j] * rho[j] for j in range(1, k))
            a = num / den
            phi = {j: phi[j] - a * phi[k - j] for j in range(1, k)}
            phi[k] = a
            pacf.append(a)
        for k in range(1, K + 1):
            row = got[(et, k)]
            assert abs(row.acf - rho[k]) < 1e-6
            assert abs(row.pacf - pacf[k - 1]) < 1e-6
        assert got[(et, 1)].acf == got[(et, 1)].pacf  # D-L base case
        n_series += 1
    assert n_series * K == len(got) > 0


def test_kll_quantiles_contract_and_margin(spark):
    from process_nwb_spark.relational.fn_extra import agg_kll_quantiles
    rows = agg_kll_quantiles(spark, SF_CORRECT).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.n_exact == 1      # KLL tracks n EXACTLY — hard contract
        assert r.rank_ok == 1      # estimate within the 10%-wide rank band
    # margin check (VERDICT r6 ask #7 pattern): the estimate should sit
    # well inside the band, not on its edge — recompute the exact rank of
    # the sketch median per type and require >= 2x slack vs the 0.05 bound
    ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet") \
        .selectExpr("event_type",
                    "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c") \
        .toPandas()
    import pyspark.sql.functions as FN
    sk = (spark.read.parquet(f"{SF_CORRECT}/events.parquet")
          .selectExpr("event_type",
                      "CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS c")
          .groupBy("event_type")
          .agg(FN.expr("kll_sketch_get_quantile_bigint("
                       "kll_sketch_agg_bigint(c, 200), 0.5)").alias("est"))
          .collect())
    for r in sk:
        grp = ev.loc[ev.event_type == r.event_type, "c"].to_numpy()
        rank = (grp <= r.est).mean()
        assert abs(rank - 0.5) <= 0.025, (r.event_type, rank)


def test_theta_set_ops_contract(spark):
    from process_nwb_spark.relational.fn_extra import agg_theta_set_ops
    r = agg_theta_set_ops(spark, SF_CORRECT).collect()[0]
    assert r.union_ok == 1 and r.intersect_ok == 1
    # the click/purchase audiences genuinely overlap in the testdata
    assert 0 < r.exact_intersect <= min(r.exact_click, r.exact_purchase)
    assert r.exact_union <= r.exact_click + r.exact_purchase
    # inclusion-exclusion on the exact side
    assert (r.exact_union
            == r.exact_click + r.exact_purchase - r.exact_intersect)


def test_vshape_matches_python_scan(spark):
    from process_nwb_spark.relational.event_windows import seq_pattern_vshape
    daily = _daily_counts(spark)
    per_type = collections.defaultdict(list)
    for (et, d), c in sorted(daily.items()):
        per_type[et].append((d, c))
    got = {(r.event_type, r.decline_first_day, r.trough_day,
            r.recovery_end_day, r.decline_len, r.recovery_len,
            r.trough_value)
           for r in seq_pattern_vshape(spark, SF_CORRECT).collect()}
    # literal CEP scan: compress into signed runs, pair DOWN{2,}UP{2,};
    # decline_first_day is the first day whose diff is negative (run_start)
    want2 = set()
    for et, series in per_type.items():
        xs = series
        runs = []
        for i in range(1, len(xs)):
            (d0, x0), (d1, x1) = xs[i - 1], xs[i]
            s = 1 if x1 > x0 else (-1 if x1 < x0 else 0)
            if s == 0:
                runs.append(None)
                continue
            if runs and runs[-1] and runs[-1][0] == s:
                sign, fd, _, ln = runs[-1]
                runs[-1] = (sign, fd, d1, ln + 1)
            else:
                runs.append((s, d1, d1, 1))
        runs = [r for r in runs if r]
        vals = dict(xs)
        for r1, r2 in zip(runs, runs[1:]):
            if (r1[0] == -1 and r2[0] == 1 and r1[3] >= 2 and r2[3] >= 2
                    and r2[1] == r1[2] + pd.Timedelta(days=1)):
                want2.add((et, str(r1[1]), str(r1[2]), str(r2[2]),
                           r1[3], r2[3], vals[r1[2]]))
    assert got == want2
    assert len(got) > 0
    for r in got:   # trough is a genuine local minimum of the series
        vals = dict(per_type[r[0]])
        td = pd.Timestamp(r[2]).date()
        assert vals[td] == r[6]


def _embeddings(spark):
    return spark.read.parquet(f"{SF_CORRECT}/embeddings.parquet") \
        .select("vec_id", "embedding").toPandas()


def test_matryoshka_eval_matches_numpy(spark):
    from process_nwb_spark.relational.embed_lsh import embed_matryoshka_eval
    pdf = _embeddings(spark)
    V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    ids = pdf["vec_id"].to_numpy()
    got = {r.anchor_id: r
           for r in embed_matryoshka_eval(spark, SF_CORRECT).collect()}
    n_anchors = 0
    for ai, aid in enumerate(ids):
        if aid % 50 != 0:
            continue
        mask = ids != aid

        def topk(X, q):
            cos = X @ q / (np.linalg.norm(X, axis=1) * np.linalg.norm(q))
            # face ranks by ROUNDED cosine with vec_id tie-break
            order = sorted(zip(np.round(cos[mask], 6), -ids[mask]),
                           key=lambda t: (-t[0], -t[1]))
            return {int(-i) for _, i in order[:5]}

        full = topk(V, V[ai])
        trunc = topk(V[:, :16], V[ai, :16])
        row = got[aid]
        assert row.overlap_at_5 == len(full & trunc)
        assert row.recall_at_5 == round(len(full & trunc) / 5.0, 6)
        n_anchors += 1
    assert n_anchors == len(got) > 0
    # truncation must retain signal: average recall over anchors > 0
    assert sum(r.overlap_at_5 for r in got.values()) > 0


def test_binary_quant_matches_numpy_hamming(spark):
    from process_nwb_spark.relational.embed_lsh import embed_binary_quant
    pdf = _embeddings(spark)
    V = np.stack(pdf["embedding"].to_numpy())
    ids = pdf["vec_id"].to_numpy()
    bits = (V > 0)
    got = collections.defaultdict(list)
    for r in embed_binary_quant(spark, SF_CORRECT).collect():
        got[r.anchor_id].append((r.hamming, r.vec_id))
    n_anchors = 0
    for ai, aid in enumerate(ids):
        if aid % 50 != 0:
            continue
        ham = (bits != bits[ai]).sum(axis=1)
        cand = sorted((int(h), int(v)) for h, v in zip(ham, ids)
                      if v != aid)[:3]
        assert sorted(got[aid]) == cand
        n_anchors += 1
    assert n_anchors == len(got) > 0


def test_approx_top_k_contract_vs_counter(spark):
    from process_nwb_spark.relational.llm_ops import text_approx_top_k
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet") \
        .select("text").toPandas()
    freq = collections.Counter()
    for text in docs["text"]:
        freq.update(text.split(" "))
    counts = sorted(freq.values(), reverse=True)
    thf = counts[19]
    closure = sum(1 for v in freq.values() if v >= thf)
    r = text_approx_top_k(spark, SF_CORRECT).collect()[0]
    assert r.k == 20
    assert r.threshold_freq == thf
    assert r.closure_size == closure
    assert r.overlap_ok == 1 and r.counts_ok == 1


def test_holt_winters_matches_python_recurrence(spark):
    from process_nwb_spark.relational.event_windows import ts_holt_winters
    daily = _daily_counts(spark)
    per_type = collections.defaultdict(list)
    for (et, d), c in sorted(daily.items()):
        per_type[et].append(float(c))
    got = {r.event_type: r
           for r in ts_holt_winters(spark, SF_CORRECT).collect()}
    n_series = 0
    for et, xs in per_type.items():
        if len(xs) < 15:
            assert et not in got
            continue
        m1 = sum(xs[:7]) / 7.0
        m2 = sum(xs[7:14]) / 7.0
        l, b = m1, (m2 - m1) / 7.0
        s = [x - m1 for x in xs[:7]]
        for x in xs[7:]:
            lp = 0.5 * (x - s[0]) + 0.5 * (l + b)
            bp = 0.5 * (lp - l) + 0.5 * b
            sp = 0.5 * (x - lp) + 0.5 * s[0]
            l, b = lp, bp
            s = s[1:] + [sp]
        row = got[et]
        assert row.n_days == len(xs)
        assert abs(row.level - l) < 1e-4
        assert abs(row.trend - b) < 1e-4
        assert abs(row.season_next - s[0]) < 1e-4
        assert abs(row.forecast_1d - (l + b + s[0])) < 1e-4
        assert abs(row.forecast_7d - (l + 7 * b + s[6])) < 1e-4
        n_series += 1
    assert n_series == len(got) > 0


def test_revenue_concentration_matches_pandas(spark):
    from process_nwb_spark.relational.event_windows import (
        agg_revenue_concentration)
    o = spark.read.parquet(f"{SF_CORRECT}/orders.parquet") \
        .select("o_custkey", "o_totalprice").toPandas()
    c = spark.read.parquet(f"{SF_CORRECT}/customer.parquet") \
        .select("c_custkey", "c_mktsegment").toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = np.floor(j.o_totalprice.to_numpy() * 100 + 0.5) \
        .astype(np.int64)
    got = {r.seg: r
           for r in agg_revenue_concentration(spark, SF_CORRECT).collect()}
    for seg, grp in j.groupby("c_mktsegment"):
        rev = (grp.groupby("o_custkey")["cents"].sum()
               .sort_values(ascending=False))
        # ties broken by custkey ascending, like the face
        rev = rev.reset_index().sort_values(
            ["cents", "o_custkey"], ascending=[False, True])["cents"]
        cum = rev.cumsum().to_numpy()
        tot = int(rev.sum())
        n_top = int(np.argmax(cum * 5 >= tot * 4)) + 1
        row = got[seg]
        assert row.n_top == n_top
        assert row.n_customers == len(rev)
        assert row.top_fraction == round(n_top / len(rev), 6)
    assert len(got) == j.c_mktsegment.nunique()


def test_rolling_distinct_matches_python_sets(spark):
    from process_nwb_spark.relational.event_windows import (
        win_rolling_distinct_users)
    ev = spark.read.parquet(f"{SF_CORRECT}/events.parquet") \
        .selectExpr("CAST(ts AS DATE) AS d", "user_id").toPandas()
    by_day = collections.defaultdict(set)
    for d, u in ev.itertuples(index=False):
        by_day[d].add(int(u))
    got = {r.day: r.rolling_7d_users
           for r in win_rolling_distinct_users(spark, SF_CORRECT).collect()}
    days = sorted(by_day)
    for d in days:
        window_users = set()
        for k in range(7):
            window_users |= by_day.get(d - pd.Timedelta(days=k), set())
        assert got[str(d)] == len(window_users), d
    assert len(got) == len(days)
    # rolling WAU must be >= any single day's DAU in its window
    assert all(got[str(d)] >= len(by_day[d]) for d in days)


def test_mann_whitney_matches_numpy_ranks(spark):
    from process_nwb_spark.relational.event_windows import abtest_mann_whitney
    o = spark.read.parquet(f"{SF_CORRECT}/orders.parquet") \
        .select("o_custkey", "o_totalprice").toPandas()
    c = spark.read.parquet(f"{SF_CORRECT}/customer.parquet") \
        .select("c_custkey", "c_mktsegment").toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j = j[j.c_mktsegment.isin(["BUILDING", "AUTOMOBILE"])]
    v = np.floor(j.o_totalprice.to_numpy() * 100 + 0.5).astype(np.int64)
    is_a = (j.c_mktsegment == "BUILDING").to_numpy()
    # tie-averaged ranks via pandas (scipy absent in this container)
    ranks = pd.Series(v).rank(method="average").to_numpy()
    na, nb = int(is_a.sum()), int((~is_a).sum())
    r_a = ranks[is_a].sum()
    u = na * nb + na * (na + 1) / 2.0 - r_a
    n = na + nb
    _, t_counts = np.unique(v, return_counts=True)
    tie3 = float((t_counts.astype(np.float64) ** 3 - t_counts).sum())
    var = na * nb / 12.0 * ((n + 1.0) - tie3 / (n * (n - 1.0)))
    z = (u - na * nb / 2.0) / math.sqrt(var)
    row = abtest_mann_whitney(spark, SF_CORRECT).collect()[0]
    assert (row.na, row.nb) == (na, nb)
    assert row.u_stat == u
    assert abs(row.z - z) < 1e-6
    # coherence with the parametric test: same direction of effect
    from process_nwb_spark.relational.event_windows import abtest_welch_t
    t_row = abtest_welch_t(spark, SF_CORRECT).collect()[0]
    # U below its mean <-> arm A stochastically larger -> t positive
    assert (row.u_stat < na * nb / 2.0) == (t_row.t_stat > 0)


def test_sql_udf_inlined_and_exact(spark):
    from process_nwb_spark.relational.sql_surface import sql_udf_scalar
    from process_nwb_spark.plans.inspect import (formatted_plan,
                                                 has_partial_aggregation)
    df = sql_udf_scalar(spark, SF_CORRECT)
    plan = formatted_plan(df)
    # Catalyst must inline the SQL UDF body: no Python/eval nodes, and
    # the aggregate keeps map-side combine
    assert "Python" not in plan and "ArrowEval" not in plan
    assert has_partial_aggregation(df)
    li = spark.read.parquet(f"{SF_CORRECT}/lineitem.parquet") \
        .select("l_returnflag", "l_extendedprice", "l_discount").toPandas()
    cents = np.floor(li.l_extendedprice.to_numpy() * 100 + 0.5) \
        .astype(np.int64)
    disc = np.floor(li.l_discount.to_numpy() * 100 + 0.5).astype(np.int64)
    li["net"] = cents * (100 - disc)
    want = {flag: (len(g), round(float(g.net.sum()) / 10000.0, 2))
            for flag, g in li.groupby("l_returnflag")}
    got = {r.l_returnflag: (r.n_items, r.net_revenue)
           for r in df.collect()}
    assert got == want


def test_gini_matches_numpy(spark):
    from process_nwb_spark.relational.event_windows import (
        agg_gini_coefficient)
    o = spark.read.parquet(f"{SF_CORRECT}/orders.parquet") \
        .select("o_custkey", "o_totalprice").toPandas()
    c = spark.read.parquet(f"{SF_CORRECT}/customer.parquet") \
        .select("c_custkey", "c_mktsegment").toPandas()
    j = o.merge(c, left_on="o_custkey", right_on="c_custkey")
    j["cents"] = np.floor(j.o_totalprice.to_numpy() * 100 + 0.5) \
        .astype(np.int64)
    got = {r.seg: r for r in
           agg_gini_coefficient(spark, SF_CORRECT).collect()}
    for seg, grp in j.groupby("c_mktsegment"):
        x = np.sort(grp.groupby("o_custkey")["cents"].sum().to_numpy())
        n = len(x)
        gini = (2 * (np.arange(1, n + 1) * x).sum()
                - (n + 1) * x.sum()) / (n * x.sum())
        row = got[seg]
        assert row.n_customers == n
        assert abs(row.gini - gini) < 1e-6
        assert 0 <= row.gini < 1
    assert len(got) == j.c_mktsegment.nunique()


def test_file_lineage_counts(spark):
    from process_nwb_spark.relational.sources_queries import (
        source_file_lineage)
    rows = source_file_lineage(spark, SF_CORRECT).collect()
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    assert len(rows) == 1 and rows[0].file_name == "documents.parquet"
    assert rows[0].n_rows == docs.count()
    assert rows[0].min_id == 0


def test_schema_evolution_null_semantics(spark):
    from process_nwb_spark.relational.sources_queries import (
        source_schema_evolution)
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet") \
        .select("doc_id", "lang", "n_chars").toPandas()
    got = {r.lang: r
           for r in source_schema_evolution(spark, SF_CORRECT).collect()}
    for lang, grp in docs.groupby("lang"):
        odd = grp[grp.doc_id % 2 == 1]
        row = got[lang]
        assert row.n_docs == len(grp)
        assert row.n_with_chars == len(odd)       # evens read as NULL
        assert row.total_chars == int(odd.n_chars.sum())
    assert len(got) == docs.lang.nunique()


def test_calendar_gap_guards_fire(spark, tmp_path):
    """A missing day must not let ROWS frames, season rotation, or
    run-index adjacency silently bridge the gap (code-review findings)."""
    rows = []
    eid = 0
    # type 'gap': days 1..30 except day 10 missing; counts form a clean
    # V around day 20 (down 17..20, up 20..23) and one around day 8/11
    # that straddles the missing day and must NOT match
    for day in range(1, 31):
        if day == 10:
            continue
        base = 50
        if day in (8, 9):
            base = 50 - (day - 7) * 5      # decline into the gap
        if day in (11, 12):
            base = 35 + (day - 10) * 5     # recovery right after the gap
        if 17 <= day <= 20:
            base = 50 - (day - 16) * 5     # clean decline
        if 21 <= day <= 23:
            base = 30 + (day - 20) * 5     # clean recovery
        for _ in range(base):
            rows.append((eid, f"2024-01-{day:02d} 12:00:00", 1, "gap",
                         1.0, "{}"))
            eid += 1
    pdf = pd.DataFrame(rows, columns=["event_id", "ts", "user_id",
                                      "event_type", "value", "props"])
    pdf["ts"] = pd.to_datetime(pdf["ts"])
    sf = str(tmp_path)
    spark.createDataFrame(pdf).write.parquet(f"{sf}/events.parquet")

    from process_nwb_spark.relational.event_windows import (
        seq_pattern_vshape, ts_bollinger_daily, ts_holt_winters)
    # 1. bollinger: every emitted band spans exactly 6 calendar days —
    # the first 6 rows after the gap (windows containing day 10) drop
    bands = ts_bollinger_daily(spark, sf).collect()
    days = sorted(pd.Timestamp(r.day).day for r in bands)
    assert days, "gapless weeks exist and must emit"
    assert all(d >= 17 or d <= 9 for d in days), days  # 11..16 span the gap
    # 2. holt-winters: the gapped series is excluded entirely
    assert ts_holt_winters(spark, sf).collect() == []
    # 3. vshape: only the clean V (trough day 20) matches; the pair of
    # runs straddling the missing day 10 must not stitch
    vs = seq_pattern_vshape(spark, sf).collect()
    assert [r.trough_day for r in vs] == ["2024-01-20"]


def test_compaction_plan_matches_python_banding(spark):
    from process_nwb_spark.relational.dataprep import layout_compaction_plan
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet") \
        .select("lang", "source", "n_chars").toPandas()
    shards = (docs.groupby(["lang", "source"])
              .agg(bytes=("n_chars", "sum"), n_docs=("n_chars", "size"))
              .reset_index().sort_values(["lang", "source"]))
    cum_before = shards["bytes"].cumsum().shift(1, fill_value=0)
    shards["file_id"] = (cum_before // 60000).astype(np.int64)
    want = {int(fid): (len(g), int(g.n_docs.sum()), int(g.bytes.sum()),
                       round(float(g.bytes.sum()) / 60000.0, 6))
            for fid, g in shards.groupby("file_id")}
    got = {r.file_id: (r.n_shards, r.n_docs, r.total_bytes, r.fill_ratio)
           for r in layout_compaction_plan(spark, SF_CORRECT).collect()}
    assert got == want
    # every file except possibly the last is near target (sort-and-chunk
    # guarantees fill >= 1 - max_shard/target for interior files)
    fids = sorted(got)
    assert len(fids) >= 1 and fids == list(range(len(fids)))


def test_driver_priority_names_resolve():
    """Every DRIVER_PRIORITY entry must name a registered query (a typo
    here silently shrinks the driver's sampled prefix), with no dupes,
    and the whole registry must stay SQL-oracled."""
    import importlib.util
    import os
    spec = importlib.util.spec_from_file_location(
        "entry_mod", os.path.join(os.path.dirname(
            os.path.dirname(os.path.abspath(__file__))),
            "__spark_entry__.py"))
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    from process_nwb_spark.relational.core import all_queries
    reg = all_queries()
    missing = [n for n in m.DRIVER_PRIORITY if n not in reg]
    assert not missing, missing
    assert len(set(m.DRIVER_PRIORITY)) == len(m.DRIVER_PRIORITY)
    unoracled = [n for n, s in reg.items() if s.oracle is None]
    assert not unoracled, unoracled


def test_assortativity_matches_python_graph(spark):
    from process_nwb_spark.relational.graph_ops import graph_assortativity
    li = spark.read.parquet(f"{SF_CORRECT}/lineitem.parquet") \
        .select("l_orderkey", "l_partkey").toPandas()
    edges = set()
    by_order = collections.defaultdict(set)
    for ok, pk in li.itertuples(index=False):
        by_order[int(ok)].add(int(pk))
    for pks in by_order.values():
        ps = sorted(pks)
        for i, a in enumerate(ps):
            for b_ in ps[i + 1:]:
                edges.add((a, b_))
    deg = collections.Counter()
    for a, b_ in edges:
        deg[a] += 1
        deg[b_] += 1
    xs, ys = [], []
    for a, b_ in edges:
        xs += [deg[a], deg[b_]]
        ys += [deg[b_], deg[a]]
    x = np.array(xs, dtype=np.float64)
    y = np.array(ys, dtype=np.float64)
    r = np.corrcoef(x, y)[0, 1]
    row = graph_assortativity(spark, SF_CORRECT).collect()[0]
    assert row.n_edges == len(edges)
    assert abs(row.assortativity - r) < 1e-6
    assert -1 <= row.assortativity <= 1


def test_dim_variance_matches_numpy(spark):
    from process_nwb_spark.relational.embed_lsh import embed_dim_variance
    pdf = _embeddings(spark)
    V = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    q = np.round(V * 1e9).astype(np.int64)
    got = {r.dim: r for r in embed_dim_variance(spark, SF_CORRECT).collect()}
    assert len(got) == V.shape[1]
    for j in range(V.shape[1]):
        col = q[:, j]
        n = len(col)
        mean = col.sum() / (n * 1e9)
        var = (n * int((col.astype(object) ** 2).sum())
               - int(col.sum()) ** 2) / (n * (n - 1) * 1e18)
        row = got[j + 1]
        assert row.n == n
        assert row.mean_val == round(mean, 6)
        assert abs(row.var_val - var) < 1e-6
        # quantized variance tracks true float variance to ~1e-9 scale
        assert abs(var - V[:, j].var(ddof=1)) < 1e-6


def test_ttr_profile_matches_counter(spark):
    from process_nwb_spark.relational.llm_ops import text_ttr_profile
    docs = spark.read.parquet(f"{SF_CORRECT}/documents.parquet") \
        .select("source", "text").toPandas()
    per_src = collections.defaultdict(collections.Counter)
    for src, text in docs.itertuples(index=False):
        per_src[src].update(text.split(" "))
    got = {r.source: r for r in
           text_ttr_profile(spark, SF_CORRECT).collect()}
    for src, cnt in per_src.items():
        row = got[src]
        n_tokens = sum(cnt.values())
        n_types = len(cnt)
        n_hapax = sum(1 for v in cnt.values() if v == 1)
        assert (row.n_tokens, row.n_types, row.n_hapax) == \
            (n_tokens, n_types, n_hapax)
        assert row.ttr == round(n_types / n_tokens, 6)
        assert row.hapax_share == round(n_hapax / n_types, 6)
    assert len(got) == len(per_src)
