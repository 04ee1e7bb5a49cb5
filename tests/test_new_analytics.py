"""Direct replays for the round-7 late additions: the Misra-Gries
heavy-hitter guarantee under adversarial partitioning (the heavy token is
never locally dominant), and NumPy recurrence replays for the CUSUM fold
and the Theil-Sen pairwise-slope median."""
import numpy as np
import pandas as pd
import pytest

from process_nwb_spark.relational.event_windows import (ts_cusum_shift,
                                                        ts_theilsen_trend)
from process_nwb_spark.relational.llm_ops import text_heavy_hitters
from tests.conftest import SF_CORRECT


def _write_documents(spark, path, texts):
    pdf = pd.DataFrame({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts,
        "lang": "en",
        "source": "synthetic",
        "n_chars": [len(t) for t in texts],
    })
    (spark.createDataFrame(pdf).coalesce(4)
     .write.mode("overwrite").parquet(path))


def test_heavy_hitters_survive_adversarial_scatter(spark, tmp_path):
    """A token barely above the n/k threshold, drowned in a sea of
    near-distinct filler tokens so every partition's MG sketch prunes
    constantly, must still be reported with its exact count — the
    mergeable-summary superset guarantee, then the exact recount."""
    rng = np.random.default_rng(7)
    n_docs, words_per_doc = 400, 100
    n = n_docs * words_per_doc           # 40_000 tokens, threshold n/200=200
    heavy, freq = "zzheavy", 240         # > threshold, only 0.6% of tokens
    slots = set(map(int, rng.choice(n, size=freq, replace=False)))
    texts = []
    for d in range(n_docs):
        ws = [heavy if d * words_per_doc + i in slots
              else f"w{d * words_per_doc + i}"    # all fillers distinct
              for i in range(words_per_doc)]
        texts.append(" ".join(ws))
    _write_documents(spark, str(tmp_path / "documents.parquet"), texts)
    out = {r.token: (r.freq, r.share)
           for r in text_heavy_hitters(spark, str(tmp_path)).collect()}
    # no filler exceeds the threshold (each appears once), so the exact
    # answer is precisely the one heavy token with its exact count
    assert out == {heavy: (freq, round(freq / n, 6))}


def test_heavy_hitters_match_exact_groupby(spark, tmp_path):
    """Zipf-ish corpus: sketch+recount == plain exact GROUP BY/HAVING."""
    rng = np.random.default_rng(11)
    vocab = np.array([f"t{i}" for i in range(2000)])
    probs = 1.0 / np.arange(1, len(vocab) + 1)
    probs /= probs.sum()
    toks = rng.choice(vocab, size=30_000, p=probs)
    texts = [" ".join(toks[i:i + 60]) for i in range(0, len(toks), 60)]
    _write_documents(spark, str(tmp_path / "documents.parquet"), texts)
    got = {(r.token, r.freq)
           for r in text_heavy_hitters(spark, str(tmp_path)).collect()}
    cnt = pd.Series(toks).value_counts()
    want = {(t, int(c)) for t, c in cnt.items() if c * 200 > len(toks)}
    assert got == want and len(want) > 5


def test_cusum_matches_numpy_recurrence(spark):
    rows = ts_cusum_shift(spark, SF_CORRECT).collect()
    by_type: dict = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r)
    assert len(by_type) == 5
    flagged = 0
    for et, rs in by_type.items():
        rs.sort(key=lambda r: r.day)
        x = np.array([r.x for r in rs], dtype=np.float64)
        mu = round(float(np.sum(x[:7].astype(np.float64)) / min(7, len(x))), 2)
        # same left-fold order as the plan: seed 0.0, add in day order
        acc = 0.0
        for v in x[:7]:
            acc += v
        mu = round(acc / min(7, len(x)), 2)
        kappa, h = round(mu * 0.05, 2), round(mu * 0.25, 2)
        shi = slo = 0.0
        for r, v in zip(rs, x):
            shi = max(0.0, shi + (v - mu - kappa))
            slo = max(0.0, slo + (mu - kappa - v))
            assert abs(r.cusum_hi - shi) < 1e-9, (et, r.day)
            assert abs(r.cusum_lo - slo) < 1e-9, (et, r.day)
            want_flag = 1 if (shi > h or slo > h) else 0
            assert r.shift_flag == want_flag, (et, r.day)
            flagged += r.shift_flag
    # the synthetic daily totals swing well past the decision interval —
    # a detector that never fires would be vacuous
    assert flagged > 0


def test_theilsen_matches_numpy_median_of_slopes(spark):
    import duckdb
    got = {r.nation: (r.n_pairs, r.theil_slope)
           for r in ts_theilsen_trend(spark, SF_CORRECT).collect()}
    monthly = duckdb.sql(f"""
        SELECT n_name AS nation,
               YEAR(o_orderdate) * 12 + MONTH(o_orderdate) AS m,
               CAST(CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT))
                         AS BIGINT) AS DOUBLE) / 100.0 AS r
        FROM '{SF_CORRECT}/orders.parquet'
        JOIN '{SF_CORRECT}/customer.parquet' ON o_custkey = c_custkey
        JOIN '{SF_CORRECT}/nation.parquet' ON c_nationkey = n_nationkey
        GROUP BY 1, 2
    """).df()
    assert len(got) == 25
    for nation, g in monthly.groupby("nation"):
        m = g["m"].to_numpy(np.float64)
        r = g["r"].to_numpy(np.float64)
        i, j = np.triu_indices(len(m), k=1)
        slopes = np.sort((r[j] - r[i]) / (m[j] - m[i]))
        want = slopes[(len(slopes) + 1) // 2 - 1]   # lower median, 1-indexed
        n_pairs, slope = got[nation]
        assert n_pairs == len(slopes)
        assert abs(slope - round(want, 6)) < 1e-9, nation
