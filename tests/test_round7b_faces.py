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
