"""Order-sensitivity probe: hash each face's normalized output under two
different spark.sql.shuffle.partitions values (default 7 and 64) and diff.

A face whose hash moves with the partition count folds floats in an
engine-order-dependent way somewhere — exactly the defect class that made
three round-6 faces driver-red while the local rtol gate said green. The
full-registry exact gate (tests/run_oracle_check.py) catches Spark-vs-DuckDB
divergence; this probe catches Spark-vs-itself divergence, which is the
earlier symptom.

Usage: python scripts/check_hash_stability.py [name ...]   (default: all)
Exit 0 = all stable. Run time ~2 min per partition count for the full
registry at sf0.01. Set HASHSTAB_JSON_OUT=<path> to also write a
committed artifact: {"parts": [7, 64], "sf": ..., "n_stable": N,
"n_unstable": M, "unstable": [...], "hashes": {name: md5}} — the
hashes make a later run diffable face-by-face, not just pass/fail.
"""
import hashlib
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
PARTS = (7, 64)


def hashes(parts, names):
    from process_nwb_spark.relational.core import all_queries
    from process_nwb_spark.session import get_spark

    spark = get_spark(shuffle_partitions=parts)
    # AQE's partition coalescing would collapse BOTH configurations to
    # the same tiny post-shuffle layout at test scale, making the two
    # runs fold partial states in identical order and neutralizing the
    # perturbation this probe exists to apply — turn it off so the
    # partition counts actually differ
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    reg = all_queries()
    out = {}
    for n in names:
        pdf = reg[n].fn(spark, SF).toPandas()
        pdf = pdf[sorted(pdf.columns)].sort_values(
            sorted(pdf.columns)).reset_index(drop=True)
        out[n] = hashlib.md5(
            pdf.to_csv(index=False, float_format="%.17g").encode()
        ).hexdigest()
    spark.stop()
    return out


def main():
    from process_nwb_spark.relational.core import all_queries

    names = sys.argv[1:] or list(all_queries())
    a = hashes(PARTS[0], names)
    b = hashes(PARTS[1], names)
    bad = [n for n in names if a[n] != b[n]]
    for n in bad:
        print(f"UNSTABLE {n}: {a[n]} != {b[n]}")
    print(f"{len(names) - len(bad)} stable, {len(bad)} unstable "
          f"(shuffle.partitions {PARTS[0]} vs {PARTS[1]})")
    out = os.environ.get("HASHSTAB_JSON_OUT")
    if out:
        with open(out, "w") as f:
            json.dump({"parts": list(PARTS), "sf_dir": SF,
                       "n_stable": len(names) - len(bad),
                       "n_unstable": len(bad), "unstable": bad,
                       "hashes": a}, f, indent=1)
            f.write("\n")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
