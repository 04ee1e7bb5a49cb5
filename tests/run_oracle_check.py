"""Local replica of the driver's t2 gate: run every registry query in Spark
and its oracle SQL in DuckDB on the same parquet, compare row count, schema
width, and an order-insensitive EXACT value hash.

The driver hashes exact values; a tolerant (rtol) comparison here would
overstate `hash_match` and hide last-ulp knife-edge faces (this bit round 6:
three faces were "green" locally at rtol=1e-6 and red at the driver's exact
hash). So `hash_match` is now EXACT — float columns must match bit-for-bit
(NaN==NaN allowed, +0.0 != -0.0 flagged). A tolerant pass is still computed
and recorded as `close_match` for diagnostics: `close_match and not
hash_match` == "values agree numerically but would flip the driver hash".

Usage: python tests/run_oracle_check.py [sf_dir] [name ...]

Set ORACLE_JSON_OUT=<path> to also write a CORRECTNESS-shaped artifact
(per-query rows_match/schema_match/hash_match/close_match/spark_rows/
oracle_rows/err) so the full-registry local gate leaves a recorded,
diffable signal for queries past the driver's sampled prefix.
"""
from __future__ import annotations

import os
import sys
import time

import duckdb
import numpy as np
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def norm_frame(df: pd.DataFrame) -> pd.DataFrame:
    """Order-insensitive, type-tolerant normalization before comparison.

    Floats are NOT rounded — the driver compares exact values, so any
    rounding here would hide real hash divergence.
    """
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        s = df[c]
        if s.dtype == object:
            df[c] = s.astype(str)
        elif str(s.dtype).startswith(("datetime", "timestamp")):
            df[c] = s.astype(str)
        elif s.dtype.kind == "f":
            df[c] = s.astype("float64")
        elif s.dtype.kind in "iu":
            df[c] = s.astype("int64")
        elif s.dtype.kind == "b":
            df[c] = s.astype(int).astype("int64")
    return df.sort_values(list(df.columns), na_position="last").reset_index(drop=True)


def _exact_col_equal(a: pd.Series, b: pd.Series) -> bool:
    """Bit-exact float comparison: NaN==NaN (any payload), +0.0 != -0.0."""
    av = a.to_numpy(dtype="float64", copy=True)
    bv = b.to_numpy(dtype="float64", copy=True)
    nan_a, nan_b = np.isnan(av), np.isnan(bv)
    if not np.array_equal(nan_a, nan_b):
        return False
    av[nan_a] = 0.0
    bv[nan_b] = 0.0
    return bool(np.array_equal(av.view("uint64"), bv.view("uint64")))


def compare(name, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame):
    """Return (exact_problems, close_problems) string lists."""
    problems: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        problems.append(f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}")
    scols, dcols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if scols != dcols:
        problems.append(f"columns spark={scols} duck={dcols}")
        return problems, list(problems)
    a, b = norm_frame(spark_pdf), norm_frame(duck_pdf)
    close_problems = list(problems)
    if len(a) == len(b):
        # exact gate (driver-faithful)
        for c in a.columns:
            if a[c].dtype.kind == "f":
                ok = _exact_col_equal(a[c], b[c])
            else:
                ok = a[c].equals(b[c])
            if not ok:
                problems.append(f"exact mismatch in column {c!r}")
                if a[c].dtype.kind == "f":
                    av, bv = a[c].to_numpy("float64"), b[c].to_numpy("float64")
                    with np.errstate(invalid="ignore"):
                        neq = ~((av == bv) | (np.isnan(av) & np.isnan(bv)))
                    if neq.any():
                        i = int(np.argmax(neq))
                        problems.append(
                            f"  first diff row {i}: spark={av[i]!r} duck={bv[i]!r} "
                            f"(n_diff={int(neq.sum())}/{len(av)})")
                    else:
                        problems.append("  (sign-of-zero / NaN-payload only)")
        # tolerant diagnostic pass
        try:
            pd.testing.assert_frame_equal(a, b, check_dtype=False,
                                          check_exact=False, rtol=1e-6, atol=1e-9)
        except AssertionError as e:
            close_problems.append("values: " + str(e).split("\n")[0])
    return problems, close_problems


def main():
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    from process_nwb_spark.session import get_spark
    from process_nwb_spark.relational.core import all_queries, TABLES

    spark = get_spark("oracle-check")
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    registry = all_queries()
    n_pass = n_fail = n_rows_only = 0
    results: dict[str, dict] = {}
    for name, spec in registry.items():
        if only and name not in only:
            continue
        t0 = time.time()
        row = {"rows_match": False, "schema_match": False,
               "hash_match": False, "close_match": False,
               "spark_rows": None, "oracle_rows": None, "err": None}
        results[name] = row
        try:
            sdf = spec.fn(spark, sf_dir).toPandas()
            row["spark_rows"] = len(sdf)
        except Exception as e:
            print(f"FAIL  {name}: spark error: {e}")
            row["err"] = f"spark: {e}"[:300]
            n_fail += 1
            continue
        if spec.oracle is None:
            print(f"rows  {name}: {len(sdf)} rows (no oracle) [{time.time()-t0:.1f}s]")
            row["err"] = "no_oracle"
            n_rows_only += 1
            continue
        try:
            ddf = con.sql(spec.oracle).df()
            row["oracle_rows"] = len(ddf)
        except Exception as e:
            print(f"FAIL  {name}: duckdb error: {e}")
            row["err"] = f"duckdb: {e}"[:300]
            n_fail += 1
            continue
        problems, close_problems = compare(name, sdf, ddf)
        row["rows_match"] = len(sdf) == len(ddf)
        row["schema_match"] = sorted(sdf.columns) == sorted(ddf.columns)
        row["hash_match"] = not problems
        row["close_match"] = not close_problems
        if problems:
            knife = " (KNIFE-EDGE: tolerant pass, exact fail)" \
                if not close_problems else ""
            print(f"FAIL  {name}{knife} [{time.time()-t0:.1f}s]")
            for p in problems:
                print(f"      {p}")
            row["err"] = "; ".join(p.split("\n")[0] for p in problems)[:300]
            n_fail += 1
        else:
            print(f"ok    {name}: {len(sdf)} rows [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} ok, {n_rows_only} rows-only, {n_fail} FAIL")
    out = os.environ.get("ORACLE_JSON_OUT")
    if out:
        import json

        with open(out, "w") as f:
            json.dump({"sf_dir": sf_dir, "n_pass": n_pass,
                       "n_rows_only": n_rows_only, "n_fail": n_fail,
                       "queries": results}, f, indent=1)
        print(f"wrote {out} ({len(results)} rows)")
    spark.stop()
    sys.exit(1 if n_fail else 0)


if __name__ == "__main__":
    main()
