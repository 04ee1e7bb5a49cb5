"""Round-10 face pins: temperature language-mix invariants."""
import math

from pyspark.sql import functions as F

from process_nwb_spark.relational.core import all_queries

SF = "/root/testdata/sf0.01"


def test_lang_temperature_rebalances_and_conserves_budget(spark):
    """alpha=0.5 temperature mixing must actually MOVE mass (the
    non-vacuousness the fixture's skewed lang mix guarantees: en 218 /
    zh 75 / es 73 / de 70 / fr 64): the majority language down-samples
    (some docs at 0 copies), the smallest up-samples (some at 2), per-
    language totals hit floor(N * sqrt(n_l) / W) exactly, and the whole
    budget lands within one floor-loss per language of N."""
    pdf = all_queries()["mix_lang_temperature"].fn(spark, SF).toPandas()
    assert len(pdf) == 500 and pdf.doc_id.is_unique

    per = pdf.groupby("lang").n_copies.agg(["sum", "min", "max", "count"])
    n = per["count"]
    w = {l: math.sqrt(c) for l, c in n.items()}
    W = sum(w[l] for l in sorted(w))          # ordered fold, like the query
    N = int(n.sum())
    for l in n.index:
        assert int(per.loc[l, "sum"]) == math.floor(N * w[l] / W), l
    # majority down-sampled, minority up-sampled
    assert per.loc["en", "min"] == 0 and per.loc["en", "max"] == 1
    assert per.loc["fr", "max"] == 2 and per.loc["fr", "min"] >= 1
    # budget conservation up to one floor-loss per language
    assert N - len(n) < int(pdf.n_copies.sum()) <= N


def test_lang_temperature_selection_is_deterministic_hash_rank(spark):
    """The copies-of-2 (and copies-of-1 in a down-sampled language) must
    be exactly the smallest-md5 docs of their language — seedless,
    worker-recomputable selection, not an arbitrary subset."""
    import hashlib

    pdf = all_queries()["mix_lang_temperature"].fn(spark, SF).toPandas()
    h = {d: hashlib.md5(str(d).encode()).hexdigest()
         for d in pdf.doc_id}
    for lang, grp in pdf.groupby("lang"):
        grp = grp.copy()
        grp["h"] = grp.doc_id.map(h)
        grp = grp.sort_values(["h", "doc_id"]).reset_index(drop=True)
        # n_copies must be non-increasing along the hash rank
        assert (grp.n_copies.diff().dropna() <= 0).all(), lang
