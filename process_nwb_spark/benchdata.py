"""Bench-time data scaling: build larger, self-consistent variants of the
driver-provided testdata so the harness can measure how each plan's cost
GROWS, not just what it costs at one size.

Two generators, both deterministic and cached on disk:

- `gen_scaled_dir`: scale the TPC-H-ish directory by an integer factor K
  via key-shifted copies. Every foreign key is shifted by the same
  per-copy offset, so each copy is internally join-consistent and copies
  never cross-join — selectivities and per-key group sizes match the
  source, which is exactly what makes sf0.1 -> sf1 timing ratios read as
  SCALING exponents rather than workload changes. Shared dimensions
  (nation/region) are not duplicated, mirroring how TPC-H itself scales.
  Document text is content-mutated per copy (length-preserving character
  rotation) so dedup/LSH queries see K× distinct corpora, not a corpus
  with K-way duplicates (which would blow up candidate-pair outputs
  quadratically and masquerade as bad scaling); embeddings get a small
  per-copy deterministic perturbation for the same reason.

- `gen_skewed_events`: a single-hot-key (key, value) fact + uniform dim
  pair where ONE key owns `hot_share` of all rows and the remainder
  spreads uniformly — the cleanest straggler shape: the unsalted shuffle
  has exactly one pathological reducer. Used by the bench's
  salted-vs-unsalted section.
"""
from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# one offset per copy, far above any source key (sf0.1 max key ~600k;
# even sf10 stays < 10M per copy block)
KEY_OFFSET = 100_000_000

SHIFT_COLS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
SHARED_DIMS = ("region", "nation")

# length-preserving text mutation per copy: rotate two disjoint character
# classes (vowels by k%5, five common consonants by k//5) — every word
# changes, so word-shingle sets across copies share ~nothing and near-dup
# queries see genuinely distinct documents; (k%5, k//5) is injective for
# k < 25
_VOWELS = "aeiou"
_CONS = "rstln"


def _rot(s: str, k: int) -> str:
    k %= len(s)
    return s[k:] + s[:k]


def _mutate_text(col, k: int):
    if k == 0:
        return col
    src = _VOWELS + _CONS
    dst = _rot(_VOWELS, k % 5) + _rot(_CONS, k // 5)
    return F.translate(col, src, dst)


def _one_copy(t: str, df: DataFrame, k: int) -> DataFrame:
    out = df
    for c in SHIFT_COLS.get(t, ()):
        out = out.withColumn(c, F.col(c) + F.lit(k * KEY_OFFSET))
    if t == "documents" and k > 0:
        out = out.withColumn("text", _mutate_text(F.col("text"), k))
    if t == "embeddings" and k > 0:
        # deterministic small perturbation, distinct per copy and per dim:
        # keeps norms ~unchanged but breaks exact/near-exact vector ties
        out = out.withColumn(
            "embedding",
            F.transform(
                "embedding",
                lambda x, i: (x + F.sin((i + 1).cast("double")
                                        * float(k + 1)) * F.lit(0.01)
                              ).cast("float")))
    return out


def _marker_stamp(src_dir: str, params: str) -> str:
    """Cache key: parameters + source mtimes, so regenerated source data
    or changed parameters invalidate the cache instead of silently
    reusing a stale scale-up (the sf0.1 denominators would then compare
    against a DIFFERENT dataset's sf1 numerators)."""
    mt = []
    if os.path.isdir(src_dir):
        for name in sorted(os.listdir(src_dir)):
            p = os.path.join(src_dir, name)
            mt.append(f"{name}:{os.path.getmtime(p):.0f}")
    return f"{params}|{';'.join(mt)}"


def _marker_valid(marker: str, stamp: str) -> bool:
    try:
        with open(marker) as f:
            return f.read().strip() == stamp
    except OSError:
        return False


def gen_scaled_dir(spark: SparkSession, src_dir: str, factor: int,
                   dest_dir: str) -> str:
    """Write a `factor`x key-shifted copy-union of every table in
    `src_dir` to `dest_dir` (parquet, same filenames). Idempotent: reused
    only while the marker's recorded parameters AND source mtimes match."""
    if not 1 <= int(factor) <= 25:
        # (k%5, k//5) text mutation is injective only below 25; factor 26+
        # would silently produce duplicate corpora across copies — exactly
        # the dedup-blowup artifact the mutation exists to prevent
        raise ValueError(f"factor must be in [1, 25], got {factor}")
    marker = os.path.join(dest_dir, "_SCALED_OK")
    stamp = _marker_stamp(src_dir, f"src={src_dir} factor={factor}")
    if _marker_valid(marker, stamp):
        return dest_dir
    os.makedirs(dest_dir, exist_ok=True)
    tables = list(SHARED_DIMS) + list(SHIFT_COLS)
    for t in tables:
        src = os.path.join(src_dir, f"{t}.parquet")
        df = spark.read.parquet(src)
        if t in SHARED_DIMS:
            out = df
        else:
            copies = [_one_copy(t, df, k) for k in range(int(factor))]
            out = copies[0]
            for c in copies[1:]:
                out = out.unionByName(c)
        out.write.mode("overwrite").parquet(
            os.path.join(dest_dir, f"{t}.parquet"))
    with open(marker, "w") as f:
        f.write(stamp)
    return dest_dir


def gen_skewed_events(spark: SparkSession, dest_dir: str,
                      n_rows: int = 4_000_000, n_keys: int = 100_000,
                      hot_share: float = 0.35) -> str:
    """Write a single-hot-key fact table (`skew_facts.parquet`: key
    BIGINT, grp INT, value DOUBLE) and a matching uniform dimension
    (`skew_dims.parquet`: key BIGINT, attr STRING). Key 0 owns
    `hot_share` of all fact rows; the rest spread uniformly over
    `n_keys - 1` keys. Deterministic (xxhash64 of the row id seeds every
    choice). Idempotent via parameter-stamped marker file."""
    marker = os.path.join(dest_dir, "_SKEW_OK")
    facts_path = os.path.join(dest_dir, "skew_facts.parquet")
    dims_path = os.path.join(dest_dir, "skew_dims.parquet")
    stamp = f"n_rows={n_rows} n_keys={n_keys} hot={hot_share}"
    if _marker_valid(marker, stamp):
        return dest_dir
    os.makedirs(dest_dir, exist_ok=True)
    ids = spark.range(n_rows)
    u = (F.pmod(F.xxhash64("id"), F.lit(1_000_000)).cast("double")
         / 1_000_000.0)
    # exactly ONE hot key (0) with hot_share of the rows; the rest spread
    # uniformly over keys 1..n_keys-1 — the cleanest straggler shape: the
    # unsalted shuffle has one pathological reducer and the rest are even
    v = (u - F.lit(hot_share)) / F.lit(1.0 - hot_share)
    rest_key = (F.floor(v * F.lit(n_keys - 1)) + 1).cast("long")
    key = (F.when(u < F.lit(hot_share), F.lit(0).cast("long"))
           .otherwise(F.least(rest_key, F.lit(n_keys - 1).cast("long"))))
    facts = ids.select(
        key.alias("key"),
        F.pmod(F.xxhash64("id", F.lit(7)), F.lit(1000)).cast("int")
        .alias("grp"),
        (F.pmod(F.xxhash64("id", F.lit(13)), F.lit(100_000)).cast("double")
         / 1000.0).alias("value"))
    facts.write.mode("overwrite").parquet(facts_path)
    dims = spark.range(n_keys).select(
        F.col("id").alias("key"),
        F.concat(F.lit("attr_"), F.pmod(F.xxhash64("id"), F.lit(50))
                 .cast("string")).alias("attr"))
    dims.write.mode("overwrite").parquet(dims_path)
    with open(marker, "w") as f:
        f.write(stamp)
    return dest_dir
