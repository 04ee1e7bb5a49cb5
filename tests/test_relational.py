"""Relational surface spot checks at sf0.001 (fast); the exhaustive gate is
tests/run_oracle_check.py at sf0.01 (the driver's t2 replica)."""
import duckdb
import pytest

from process_nwb_spark.relational.core import TABLES, all_queries

SF = "/root/testdata/sf0.001"

FAST = ["proj_filter_case", "join_inner_broadcast", "join_asof",
        "agg_pricing_summary", "agg_trimmed_mean", "agg_rollup",
        "win_topk_per_group", "win_session", "set_except", "fn_array",
        "fn_json_map", "dedup_exact", "minhash_lsh_candidates",
        "simhash_fingerprints", "embed_cosine_topk", "sig_car_subtract",
        "sig_band_dim", "embed_ann_lsh", "dedup_embed_cosine",
        "text_token_counts", "doc_fingerprint_winnow", "scan_range",
        "agg_percentiles", "source_csv_roundtrip", "source_json_roundtrip",
        "udf_embed_norms", "udf_grouped_covar", "udf_python_fallback",
        "embed_ivf_topk", "join_sortmerge_large", "agg_salted_skew",
        "fn_bitwise_conditional", "udf_grouped_map_demean",
        "sig_electrode_region", "embed_ivf_probe2"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF}/{t}.parquet'")
    return con


@pytest.mark.parametrize("name", FAST)
def test_query_matches_oracle(spark, duck, name):
    import sys, os
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from tests.run_oracle_check import compare

    spec = all_queries()[name]
    sdf = spec.fn(spark, SF).toPandas()
    assert spec.oracle is not None
    ddf = duck.sql(spec.oracle).df()
    problems = compare(name, sdf, ddf)
    assert not problems, problems


def test_registry_complete():
    reg = all_queries()
    assert len(reg) >= 76
    # every oracle is non-trivial SQL and every fn is callable
    for name, spec in reg.items():
        assert callable(spec.fn)
        if spec.oracle is not None:
            assert "SELECT" in spec.oracle.upper()


def test_entry_contract(spark):
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "__spark_entry__",
        __file__.rsplit("/tests/", 1)[0] + "/__spark_entry__.py")
    m = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(m)
    df = m.entry(spark)
    assert df.count() > 0
    qs, osql = m.queries(), m.oracle_sql()
    assert set(osql) <= set(qs)
    assert len(qs) >= 55


def test_registry_imports_without_session():
    """The driver may import queries()/oracle_sql() before creating its
    SparkSession; the registry (incl. pandas_udf defs) must not require an
    active session at import time (DDL-string return types would)."""
    import subprocess
    import sys

    code = ("import sys; sys.path.insert(0, '.');"
            "import __spark_entry__ as E;"
            "q = E.queries(); o = E.oracle_sql();"
            "assert len(q) >= 76 and len(o) >= 74;"
            "print('ok', len(q), len(o))")
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True, cwd=__file__.rsplit("/tests/", 1)[0])
    assert r.returncode == 0, r.stderr[-2000:]
    assert "ok" in r.stdout
