"""Randomized micro-batch-cut soak for the six stateful streaming twins.

Each per-face parity test in test_streaming.py pins ONE hand-placed cut
pattern; this soak pins the CLASS: the same six twins (burst, peak,
CUSUM, rolling-OLS, sessionize, hysteresis) driven through a single run
whose cut points are drawn from a SEEDED rng, asserting bit-exact batch
parity on every one. A failure prints the seed-derived cut list, so any
counterexample is replayable verbatim.
"""
import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from tests.conftest import SF_CORRECT

SEED = 20260815


def _drain(spark, tmp_path, name, segments, schema, twin):
    """Write `segments` (ordered list of DataFrames) as one file each,
    stream them back one file per micro-batch through `twin`, return the
    drained memory table."""
    in_dir = str(tmp_path / f"in_{name}")
    for seg in segments:
        seg.coalesce(1).write.mode("append").parquet(in_dir)
    sdf = (spark.readStream.schema(schema)
           .option("maxFilesPerTrigger", 1).parquet(in_dir))
    q = (twin(sdf).writeStream.format("memory").queryName(f"soak_{name}")
         .outputMode("append")
         .option("checkpointLocation", str(tmp_path / f"ckpt_{name}"))
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(f"soak_{name}").toPandas()


def _random_cuts(rng, axis, n_segs):
    """n_segs-1 distinct interior cut points over the sorted axis."""
    idx = sorted(rng.choice(range(1, len(axis)), size=n_segs - 1,
                            replace=False))
    return [axis[i] for i in idx]


def _segments(df, col, cuts):
    bounds = [None, *cuts, None]
    segs = []
    for lo, hi in zip(bounds[:-1], bounds[1:]):
        p = F.lit(True)
        if lo is not None:
            p = p & (F.col(col) >= lo)
        if hi is not None:
            p = p & (F.col(col) < hi)
        segs.append(df.filter(p))
    return segs


def _eq(got, want, cols, keys, ctx):
    got = got.sort_values(keys).reset_index(drop=True)
    want = want.sort_values(keys).reset_index(drop=True)
    assert len(got) == len(want) > 0, (ctx, len(got), len(want))
    pd.testing.assert_frame_equal(got[cols], want[cols],
                                  check_dtype=False, check_exact=True,
                                  obj=str(ctx))


def test_stateful_twins_soak_random_cuts(spark, tmp_path):
    from process_nwb_spark.operators.bursts import detect_bursts
    from process_nwb_spark.operators.peaks import detect_peaks
    from process_nwb_spark.relational.core import all_queries
    from process_nwb_spark.relational.event_windows import (
        ts_cusum_shift, win_rolling_regression)
    from process_nwb_spark.streaming.ops import (
        SIGNALS_SCHEMA, stream_alert_hysteresis, stream_burst_detect,
        stream_cusum_shift, stream_peak_detect, stream_rolling_slope,
        stream_sessionize)

    rng = np.random.default_rng(SEED)
    qs = all_queries()
    ev = (spark.read.parquet(f"{SF_CORRECT}/events.parquet")
          .withColumn("ts", F.col("ts").cast("timestamp")))

    # --- CUSUM + rolling OLS: random cuts on the shared day axis ---
    daily_x = (ev.groupBy("event_type", F.col("ts").cast("date").alias("d"))
               .agg(F.sum(F.round(F.col("value") * 100.0, 0).cast("bigint"))
                    .cast("bigint").alias("xc")))
    days = sorted(r.d for r in daily_x.select("d").distinct().collect())
    for name, vcol, twin, batch, cols in [
        ("cusum", "xc", stream_cusum_shift,
         lambda: ts_cusum_shift(spark, SF_CORRECT),
         ["event_type", "day", "x", "cusum_hi", "cusum_lo", "shift_flag"]),
        ("slope", "yc", stream_rolling_slope,
         lambda: win_rolling_regression(spark, SF_CORRECT),
         ["event_type", "day", "slope_cents", "rising"]),
    ]:
        cuts = _random_cuts(rng, days, int(rng.integers(3, 7)))
        daily = daily_x.withColumnRenamed("xc", vcol) if vcol != "xc" \
            else daily_x
        got = _drain(spark, tmp_path, name,
                     _segments(daily, "d", cuts),
                     f"event_type string, d date, {vcol} long", twin)
        want = batch().toPandas()
        _eq(got, want, cols, ["event_type", "day"], (name, cuts))

    # --- sessionize: random cuts on event time; open sessions dropped
    # from the batch expectation (a stream cannot know they ended) ---
    sess_ev = ev.select("user_id", "event_id", "event_type",
                        F.unix_micros("ts").alias("us"))
    lo, hi = sess_ev.agg(F.min("us"), F.max("us")).first()
    fracs = sorted(rng.uniform(0.05, 0.95, size=int(rng.integers(2, 5))))
    cuts = [int(lo + f * (hi - lo)) for f in fracs]
    got = _drain(spark, tmp_path, "sess", _segments(sess_ev, "us", cuts),
                 "user_id long, event_id long, event_type string, us long",
                 stream_sessionize)
    want_all = qs["event_sessionize"].fn(spark, SF_CORRECT).toPandas()
    last = want_all.groupby("user_id")["session_no"].transform("max")
    want = want_all[want_all.session_no < last]
    _eq(got, want, ["user_id", "session_no", "n_events", "n_types",
                    "duration_s"], ["user_id", "session_no"],
        ("sess", cuts))

    # --- hysteresis: random cuts on the hour axis ---
    hourly = (qs["alert_hysteresis_state"].fn(spark, SF_CORRECT)
              .select("hour", "n_events", "n_errors")
              .withColumn("series", F.lit("all")))
    hrs = sorted(r.hour for r in hourly.select("hour").collect())
    cuts = _random_cuts(rng, hrs, int(rng.integers(3, 7)))
    got = _drain(spark, tmp_path, "hyst", _segments(hourly, "hour", cuts),
                 "hour string, n_events long, n_errors long, series string",
                 stream_alert_hysteresis)
    want = qs["alert_hysteresis_state"].fn(spark, SF_CORRECT).toPandas()
    _eq(got, want, ["hour", "n_events", "n_errors", "state", "fired"],
        ["hour"], ("hyst", cuts))
    assert got.state.nunique() == 2      # the soak exercised both states

    # --- burst + peak: random cuts on the sample axis of the fixture
    # signals (same signal content as the per-face tests, so bursts and
    # peak islands land at KNOWN offsets; the rng moves the cuts) ---
    n = 3000
    sig_rng = np.random.default_rng(23)
    x = sig_rng.standard_normal(n) * 0.3
    x[980:1060] += 2.0
    x[1990:2015] += 2.0
    x[300:303] += 3.0
    x[500:520] += 2.5
    x[-1] = 0.0
    burst_df = spark.createDataFrame(pd.DataFrame({
        "series_id": "s0", "channel": np.int32(0),
        "sample_idx": np.arange(n, dtype=np.int64), "value": x}))
    cuts = _random_cuts(rng, list(range(n)), int(rng.integers(3, 7)))
    got = _drain(spark, tmp_path, "bursts",
                 _segments(burst_df, "sample_idx", cuts), SIGNALS_SCHEMA,
                 lambda s: stream_burst_detect(s, threshold=1.0,
                                               min_duration=5))
    want = detect_bursts(burst_df, 1.0, min_duration=5).toPandas()
    _eq(got, want, ["start_idx", "end_idx", "duration", "peak"],
        ["start_idx"], ("bursts", cuts))

    sig_rng = np.random.default_rng(31)
    x = sig_rng.random(n) * 0.3
    x[999] += 1.5
    x[1030] += 1.2
    x[500] += 2.0
    x[503] += 1.6
    x[1995] += 1.8
    x[2500] += 1.4
    x[-1] = 0.0
    peak_df = spark.createDataFrame(pd.DataFrame({
        "series_id": "s0", "channel": np.int32(0),
        "sample_idx": np.arange(n, dtype=np.int64), "value": x}))
    cuts = _random_cuts(rng, list(range(n)), int(rng.integers(3, 7)))
    got = _drain(spark, tmp_path, "peaks",
                 _segments(peak_df, "sample_idx", cuts), SIGNALS_SCHEMA,
                 lambda s: stream_peak_detect(s, threshold=0.8,
                                              min_separation=50))
    want = detect_peaks(peak_df, threshold=0.8,
                        min_separation=50).toPandas()
    _eq(got, want, ["sample_idx", "island_size", "peak_value"],
        ["sample_idx"], ("peaks", cuts))


def test_foreachbatch_sinks_soak_random_cuts(spark, tmp_path):
    """Randomized-cut soak for the three foreachBatch SINKS (scd2
    point-set, dedup keep-list, PSI drift) — the sink analog of the
    stateful-twin soak above: each per-face test pins one hand-placed
    cut pattern; this drives SEEDED random batch counts, cut points,
    application ORDER, and a random RETRY through each sink, asserting
    the converged table equals the batch face bit-exactly every time.
    A failure prints the seed-derived draw, so any counterexample is
    replayable verbatim."""
    from process_nwb_spark.relational.core import all_queries
    from process_nwb_spark.relational.dataprep import _PSI_CUT
    from process_nwb_spark.streaming.ops import (dedup_keeplist_sink,
                                                 lsh_candidates_sink,
                                                 psi_drift_sink,
                                                 scd2_upsert_sink)

    rng = np.random.default_rng(SEED + 1)
    qs = all_queries()

    def eq(got_df, want_df, keys, ctx, fill=None):
        got, want = got_df.toPandas(), want_df.toPandas()
        if fill:
            got, want = got.fillna(fill), want.fillna(fill)
        cols = sorted(want.columns)
        _eq(got, want, cols, keys, ctx)

    def drive(mk_sink, segments, rounds_ctx):
        """Apply segments in a random order with one random verbatim
        retry; return the sink's out_dir."""
        out = str(tmp_path / f"out_{rounds_ctx}")
        sink = mk_sink(out)
        order = rng.permutation(len(segments))
        retry_at = int(rng.integers(0, len(segments)))
        for step, i in enumerate(order):
            sink(segments[int(i)], int(i))
            if step == retry_at:
                sink(segments[int(i)], int(i))   # verbatim retry
        return out, list(order), retry_at

    # ---- scd2_upsert_sink vs scd2_apply_changeset ----
    o = spark.read.parquet(f"{SF_CORRECT}/orders.parquet")
    daily = (o.groupBy(F.col("o_custkey").alias("custkey"),
                       F.col("o_orderdate").cast("date").alias("d"))
             .agg(F.max_by("o_orderstatus", "o_orderkey").alias("status"))
             .localCheckpoint())
    dates = [r.d for r in
             daily.select("d").distinct().orderBy("d").collect()]
    want_scd2 = qs["scd2_apply_changeset"].fn(spark, SF_CORRECT)
    for rnd in range(2):
        n_segs = int(rng.integers(2, 6))
        cuts = _random_cuts(rng, dates, n_segs)
        segs = _segments(daily, "d", cuts)
        out, order, retry = drive(scd2_upsert_sink, segs,
                                  f"scd2_{rnd}")
        eq(spark.read.parquet(out), want_scd2, ["custkey", "valid_from"],
           ("scd2", rnd, cuts, order, retry), fill={"valid_to": ""})

    # ---- dedup_keeplist_sink vs dedup_exact keepers ----
    docs = (spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
            .select("doc_id", "text").localCheckpoint())
    ids = [r.doc_id for r in
           docs.select("doc_id").orderBy("doc_id").collect()]
    want_keep = (qs["dedup_exact"].fn(spark, SF_CORRECT)
                 .select("fp", "keep_doc_id"))
    for rnd in range(2):
        n_segs = int(rng.integers(2, 6))
        cuts = _random_cuts(rng, ids, n_segs)
        segs = _segments(docs, "doc_id", cuts)
        out, order, retry = drive(dedup_keeplist_sink, segs,
                                  f"keep_{rnd}")
        eq(spark.read.parquet(out), want_keep, ["fp"],
           ("keeplist", rnd, cuts, order, retry))

    # ---- psi_drift_sink vs dq_psi_drift ----
    ev = (spark.read.parquet(f"{SF_CORRECT}/events.parquet")
          .select("event_type", "value",
                  F.col("ts").cast("date").alias("d")))
    base = ev.filter(F.col("d") < F.lit(_PSI_CUT).cast("date"))
    cur = (ev.filter(F.col("d") >= F.lit(_PSI_CUT).cast("date"))
           .localCheckpoint())
    cur_dates = [r.d for r in
                 cur.select("d").distinct().orderBy("d").collect()]
    want_psi = qs["dq_psi_drift"].fn(spark, SF_CORRECT)
    for rnd in range(2):
        n_segs = int(rng.integers(2, 6))
        cuts = _random_cuts(rng, cur_dates, n_segs)
        segs = [s.select("event_type", "value")
                for s in _segments(cur, "d", cuts)]
        out, order, retry = drive(
            lambda o: psi_drift_sink(base, o), segs, f"psi_{rnd}")
        eq(spark.read.parquet(out + "/psi"), want_psi, ["event_type"],
           ("psi", rnd, cuts, order, retry))

    # ---- lsh_candidates_sink vs minhash_lsh_candidates ----
    want_lsh = (qs["minhash_lsh_candidates"].fn(spark, SF_CORRECT)
                .select("doc_a", "doc_b"))
    for rnd in range(2):
        n_segs = int(rng.integers(2, 6))
        cuts = _random_cuts(rng, ids, n_segs)   # ids from the docs axis
        segs = _segments(docs, "doc_id", cuts)
        out, order, retry = drive(lsh_candidates_sink, segs,
                                  f"lsh_{rnd}")
        got = spark.read.parquet(out + "/pairs").select("doc_a", "doc_b")
        assert got.count() == got.distinct().count(), \
            ("lsh dup pair", rnd, cuts, order, retry)
        eq(got.distinct(), want_lsh, ["doc_a", "doc_b"],
           ("lsh", rnd, cuts, order, retry))

    # ---- epoch_pack_sink vs mix_pack_epoch_stream (IN-ORDER sink) ----
    # this sink's contract is increasing (batch_id, position) per epoch
    # (hysteresis-style high-water mark), so the soak randomizes CUT
    # POINTS plus one immediate and one delayed verbatim retry — not
    # application order
    from process_nwb_spark.relational.dataprep import _PACK_CAPACITY
    from process_nwb_spark.streaming.ops import epoch_pack_sink

    want_pack = (qs["mix_pack_epoch_stream"].fn(spark, SF_CORRECT)
                 .localCheckpoint())
    stream_in = want_pack.select("epoch", "position", "doc_id", "n_tokens")
    n_pos = int(stream_in.agg(F.max("position")).first()[0])
    positions = list(range(1, n_pos + 1))
    for rnd in range(2):
        n_segs = int(rng.integers(2, 6))
        cuts = _random_cuts(rng, positions, n_segs)
        segs = _segments(stream_in, "position", cuts)
        out = str(tmp_path / f"out_pack_{rnd}")
        sink = epoch_pack_sink(out, _PACK_CAPACITY)
        retry_at = int(rng.integers(0, len(segs)))
        for i, seg in enumerate(segs):
            sink(seg, i)
            if i == retry_at:
                sink(seg, i)          # immediate verbatim retry
        delayed = int(rng.integers(0, len(segs)))
        sink(segs[delayed], delayed)  # delayed verbatim retry at the end
        eq(spark.read.parquet(out + "/packs")
           .select("epoch", "position", "doc_id", "n_tokens", "pack_id"),
           want_pack, ["epoch", "position"],
           ("pack", rnd, cuts, retry_at, delayed))


def test_contamination_sink_soak_random_cuts(spark, tmp_path):
    """Randomized-cut soak for contamination_sink: seeded random batch
    counts, cut points, application order, and one immediate plus one
    delayed verbatim retry — the converged contamination table must
    equal split_contamination bit-exactly and the matched partitions
    must stay disjoint (raw == distinct) every round."""
    from process_nwb_spark.relational.core import all_queries
    from process_nwb_spark.relational.dataprep import _with_split
    from process_nwb_spark.streaming.ops import contamination_sink

    rng = np.random.default_rng(SEED + 2)
    qs = all_queries()

    docs = (_with_split(
        spark.read.parquet(f"{SF_CORRECT}/documents.parquet"))
        .select("doc_id", "text", "split").localCheckpoint())
    test_docs = docs.filter(F.col("split") == "test")
    train = (docs.filter(F.col("split") == "train")
             .select("doc_id", "text").localCheckpoint())
    ids = [r.doc_id for r in
           train.select("doc_id").orderBy("doc_id").collect()]
    want = (qs["split_contamination"].fn(spark, SF_CORRECT)
            .localCheckpoint())

    for rnd in range(2):
        n_segs = int(rng.integers(2, 6))
        cuts = _random_cuts(rng, ids, n_segs)
        segs = _segments(train, "doc_id", cuts)
        out = str(tmp_path / f"out_cont_{rnd}")
        sink = contamination_sink(test_docs, out)
        order = rng.permutation(len(segs))
        retry_at = int(rng.integers(0, len(segs)))
        for step, i in enumerate(order):
            sink(segs[int(i)], int(i))
            if step == retry_at:
                sink(segs[int(i)], int(i))      # immediate verbatim retry
        delayed = int(rng.integers(0, len(segs)))
        sink(segs[delayed], delayed)            # delayed verbatim retry
        raw = spark.read.parquet(out + "/matched").select("doc_id", "sh")
        assert raw.count() == raw.distinct().count(), \
            ("contamination dup pair", rnd, cuts, list(order), retry_at,
             delayed)
        got = spark.read.parquet(out + "/contamination")
        g, w = got.toPandas(), want.toPandas()
        cols = sorted(w.columns)
        _eq(g, w, cols, ["doc_id"],
            ("contamination", rnd, cuts, list(order), retry_at, delayed))


def test_doremi_weights_sink_soak_random_cuts(spark, tmp_path):
    """Randomized-cut soak for doremi_weights_sink: seeded random batch
    counts, doc_id cut points, application ORDER, one immediate AND one
    DELAYED verbatim retry (a late redelivery after other batches have
    landed — the r10 double-emit class) — the converged weights table
    must equal mix_doremi_weights bit-exactly every time (integer count
    sums commute, the retried batch overwrites its own partition)."""
    from process_nwb_spark.relational.core import all_queries
    from process_nwb_spark.streaming.ops import doremi_weights_sink

    rng = np.random.default_rng(SEED + 2)
    docs = (spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
            .select("doc_id", "source", "text").localCheckpoint())
    ids = [r.doc_id for r in
           docs.select("doc_id").orderBy("doc_id").collect()]
    want = (all_queries()["mix_doremi_weights"].fn(spark, SF_CORRECT)
            .toPandas())
    cols = sorted(want.columns)
    for rnd in range(3):
        n_segs = int(rng.integers(2, 6))
        cuts = _random_cuts(rng, ids, n_segs)
        segs = _segments(docs, "doc_id", cuts)
        out = str(tmp_path / f"out_doremi_{rnd}")
        sink = doremi_weights_sink(out)
        order = rng.permutation(len(segs))
        retry_at = int(rng.integers(0, len(segs)))
        for step, i in enumerate(order):
            sink(segs[int(i)], int(i))
            if step == retry_at:
                sink(segs[int(i)], int(i))   # immediate verbatim retry
        delayed = int(rng.integers(0, len(segs)))
        sink(segs[delayed], delayed)         # delayed verbatim retry
        got = spark.read.parquet(out + "/weights").toPandas()
        _eq(got, want, cols, ["source"],
            ("doremi", rnd, cuts, list(order), retry_at, delayed))


def test_survival_curve_sink_soak_random_cuts(spark, tmp_path):
    """Randomized-cut soak for survival_curve_sink: seeded random batch
    counts, cut points, order, one immediate and one DELAYED verbatim
    retry — converged curve equals quality_survival_curve bit-exactly
    every time."""
    from process_nwb_spark.relational.core import all_queries
    from process_nwb_spark.streaming.ops import survival_curve_sink

    rng = np.random.default_rng(SEED + 3)
    docs = (spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
            .select("doc_id", "text").localCheckpoint())
    ids = [r.doc_id for r in
           docs.select("doc_id").orderBy("doc_id").collect()]
    want = (all_queries()["quality_survival_curve"].fn(spark, SF_CORRECT)
            .toPandas())
    cols = sorted(want.columns)
    for rnd in range(3):
        n_segs = int(rng.integers(2, 6))
        cuts = _random_cuts(rng, ids, n_segs)
        segs = _segments(docs, "doc_id", cuts)
        out = str(tmp_path / f"out_surv_{rnd}")
        sink = survival_curve_sink(out)
        order = rng.permutation(len(segs))
        retry_at = int(rng.integers(0, len(segs)))
        for step, i in enumerate(order):
            sink(segs[int(i)], int(i))
            if step == retry_at:
                sink(segs[int(i)], int(i))   # immediate verbatim retry
        delayed = int(rng.integers(0, len(segs)))
        sink(segs[delayed], delayed)         # delayed verbatim retry
        got = spark.read.parquet(out + "/curve").toPandas()
        _eq(got, want, cols, ["threshold"],
            ("survival", rnd, cuts, list(order), retry_at, delayed))


def test_gopher_stats_sink_soak_random_cuts(spark, tmp_path):
    """Randomized-cut soak for gopher_stats_sink: seeded random batch
    counts, cut points, application order, one immediate and one
    DELAYED verbatim retry — the converged attribution report must
    equal quality_rule_stats bit-exactly every time (1-row BIGINT
    rollups are additive; the retried batch overwrites its own
    partition)."""
    from process_nwb_spark.relational.core import all_queries
    from process_nwb_spark.streaming.ops import gopher_stats_sink

    rng = np.random.default_rng(SEED + 5)
    docs = (spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
            .select("doc_id", "text").localCheckpoint())
    ids = [r.doc_id for r in
           docs.select("doc_id").orderBy("doc_id").collect()]
    want = (all_queries()["quality_rule_stats"].fn(spark, SF_CORRECT)
            .toPandas())
    assert int(want.n_docs.iloc[0]) == len(ids)
    cols = sorted(want.columns)
    for rnd in range(3):
        n_segs = int(rng.integers(2, 6))
        cuts = _random_cuts(rng, ids, n_segs)
        segs = _segments(docs, "doc_id", cuts)
        out = str(tmp_path / f"out_goph_{rnd}")
        sink = gopher_stats_sink(out)
        order = rng.permutation(len(segs))
        retry_at = int(rng.integers(0, len(segs)))
        for step, i in enumerate(order):
            sink(segs[int(i)], int(i))
            if step == retry_at:
                sink(segs[int(i)], int(i))   # immediate verbatim retry
        delayed = int(rng.integers(0, len(segs)))
        sink(segs[delayed], delayed)         # delayed verbatim retry
        got = spark.read.parquet(out + "/stats").toPandas()
        _eq(got, want, cols, ["n_docs"],
            ("gopher", rnd, cuts, list(order), retry_at, delayed))


def test_gopher_stats_sink_survives_empty_batch(spark, tmp_path):
    """An all-empty micro-batch writes the all-zero additive identity
    (not NULLs) and the report converges unchanged."""
    from process_nwb_spark.relational.core import all_queries
    from process_nwb_spark.streaming.ops import gopher_stats_sink

    docs = (spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
            .select("doc_id", "text").localCheckpoint())
    empty = docs.filter(F.lit(False))
    out = str(tmp_path / "out_goph_empty")
    sink = gopher_stats_sink(out)
    sink(empty, 0)                        # leading empty batch
    sink(docs, 1)
    sink(empty, 2)                        # trailing empty batch
    got = spark.read.parquet(out + "/stats").toPandas()
    want = (all_queries()["quality_rule_stats"].fn(spark, SF_CORRECT)
            .toPandas())
    cols = sorted(want.columns)
    _eq(got, want, cols, ["n_docs"], "gopher-empty")


def test_cluster_stats_sink_soak_random_cuts(spark, tmp_path):
    """Randomized-cut soak for cluster_stats_sink: seeded random batch
    counts, cut points, application order, one immediate and one
    DELAYED verbatim retry — the converged histogram must equal
    dedup_cluster_stats bit-exactly every time (per-batch fingerprint
    counts are additive and the retried batch overwrites its own
    partition). The sf0.01 corpus is all singletons, so duplicate
    clusters are INJECTED with far-apart doc_ids — the doc_id cuts then
    split clusters ACROSS batches, exercising the cross-batch count
    merge the sink's additivity claim rests on."""
    from process_nwb_spark.relational.core import all_queries
    from process_nwb_spark.streaming.ops import cluster_stats_sink

    rng = np.random.default_rng(SEED + 4)
    base = spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
    copies = (base.filter(F.col("doc_id") < 5)
              .select((F.col("doc_id") + 100_000).alias("doc_id"), "text",
                      "lang", "source", "n_chars")
              .unionAll(base.filter(F.col("doc_id") < 2)
                        .select((F.col("doc_id") + 200_000).alias("doc_id"),
                                "text", "lang", "source", "n_chars")))
    corpus_dir = str(tmp_path / "clst_corpus")
    (base.select("doc_id", "text", "lang", "source", "n_chars")
     .unionAll(copies).write.parquet(f"{corpus_dir}/documents.parquet"))
    docs = (spark.read.parquet(f"{corpus_dir}/documents.parquet")
            .select("doc_id", "text").localCheckpoint())
    ids = [r.doc_id for r in
           docs.select("doc_id").orderBy("doc_id").collect()]
    want = (all_queries()["dedup_cluster_stats"].fn(spark, corpus_dir)
            .toPandas())
    assert want.cluster_size.max() >= 3   # the injection took
    cols = sorted(want.columns)
    for rnd in range(3):
        n_segs = int(rng.integers(2, 6))
        cuts = _random_cuts(rng, ids, n_segs)
        segs = _segments(docs, "doc_id", cuts)
        out = str(tmp_path / f"out_clst_{rnd}")
        sink = cluster_stats_sink(out)
        order = rng.permutation(len(segs))
        retry_at = int(rng.integers(0, len(segs)))
        for step, i in enumerate(order):
            sink(segs[int(i)], int(i))
            if step == retry_at:
                sink(segs[int(i)], int(i))   # immediate verbatim retry
        delayed = int(rng.integers(0, len(segs)))
        sink(segs[delayed], delayed)         # delayed verbatim retry
        got = spark.read.parquet(out + "/stats").toPandas()
        _eq(got, want, cols, ["cluster_size"],
            ("cluster_stats", rnd, cuts, list(order), retry_at, delayed))


def test_lm_model_sink_soak_random_cuts(spark, tmp_path):
    """Randomized-cut soak for lm_model_sink: seeded random batch
    counts, cut points, application order, one immediate and one
    DELAYED verbatim retry — the converged cross-entropy matrix must
    equal corpus_crossentropy_matrix every time (the per-source bigram
    count table is additive; a retried batch overwrites its own
    partition; the matrix derives from the counts alone)."""
    from process_nwb_spark.relational.core import all_queries
    from process_nwb_spark.streaming.ops import lm_model_sink

    rng = np.random.default_rng(SEED + 7)
    docs = (spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
            .select("doc_id", "source", "text").localCheckpoint())
    ids = [r.doc_id for r in
           docs.select("doc_id").orderBy("doc_id").collect()]
    want = (all_queries()["corpus_crossentropy_matrix"]
            .fn(spark, SF_CORRECT).toPandas())
    cols = sorted(want.columns)
    for rnd in range(2):
        n_segs = int(rng.integers(2, 6))
        cuts = _random_cuts(rng, ids, n_segs)
        segs = _segments(docs, "doc_id", cuts)
        out = str(tmp_path / f"out_lm_{rnd}")
        sink = lm_model_sink(out)
        order = rng.permutation(len(segs))
        retry_at = int(rng.integers(0, len(segs)))
        for step, i in enumerate(order):
            sink(segs[int(i)], int(i))
            if step == retry_at:
                sink(segs[int(i)], int(i))   # immediate verbatim retry
        delayed = int(rng.integers(0, len(segs)))
        sink(segs[delayed], delayed)         # delayed verbatim retry
        got = spark.read.parquet(out + "/matrix").toPandas()
        _eq(got, want, cols, ["source_eval", "source_model"],
            ("lm_model", rnd, cuts, list(order), retry_at, delayed))
        # the maintained model equals the batch count table exactly
        from process_nwb_spark.relational.llm_ops import (
            source_bigram_counts)
        gm = (spark.read.parquet(out + "/model").toPandas()
              .sort_values(["source", "w1", "w2"])
              .reset_index(drop=True))
        wm = (source_bigram_counts(docs).toPandas()
              .sort_values(["source", "w1", "w2"])
              .reset_index(drop=True))
        assert gm.equals(wm), ("lm_model counts diverged", rnd)


def test_lm_model_sink_survives_empty_batch(spark, tmp_path):
    """Empty micro-batches are the additive identity: leading and
    trailing empties leave the converged matrix unchanged."""
    from process_nwb_spark.relational.core import all_queries
    from process_nwb_spark.streaming.ops import lm_model_sink

    docs = (spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
            .select("doc_id", "source", "text").localCheckpoint())
    empty = docs.filter(F.lit(False))
    out = str(tmp_path / "out_lm_empty")
    sink = lm_model_sink(out)
    sink(empty, 0)                        # leading empty batch
    sink(docs, 1)
    sink(empty, 2)                        # trailing empty batch
    got = spark.read.parquet(out + "/matrix").toPandas()
    want = (all_queries()["corpus_crossentropy_matrix"]
            .fn(spark, SF_CORRECT).toPandas())
    cols = sorted(want.columns)
    _eq(got, want, cols, ["source_eval", "source_model"], "lm-empty")


def test_lm_model_sink_growing_vocabulary(spark, tmp_path):
    """The 100 TB regime the sink's docstring argues about: later
    batches introduce MOSTLY-NOVEL bigrams (disjoint synthetic
    vocabularies per batch), so pair_counts grows with each batch's
    novel vocabulary — and the per-batch refold cost must stay
    vocabulary-sized. Pins, on exactly the plans the sink builds:

      * history touched ONCE: the model re-sum scans pair_counts
        exactly one time (one parquet scan over all batch_id
        partitions, one hash-agg);
      * the matrix refold NEVER rescans pair_counts history — its
        input is the re-summed model table only, and batch_id (the
        partition axis) does not appear anywhere in the fold's plan;
      * correctness under growth: the converged matrix equals the
        batch face on the union corpus, and pair_counts' row count is
        the SUM of per-batch novel-bigram counts (disjoint vocabs:
        nothing merged, nothing rescanned-and-duplicated)."""
    from process_nwb_spark.plans.inspect import count_scans, formatted_plan
    from process_nwb_spark.relational.core import all_queries
    from process_nwb_spark.relational.llm_ops import (
        crossentropy_matrix_fold)
    from process_nwb_spark.streaming.ops import lm_model_sink

    # 4 batches, 2 sources, batch k's tokens all carry a k-prefix so
    # every batch's bigram vocabulary is disjoint from every other's
    batches, all_rows = [], []
    for k in range(4):
        rows = []
        for d in range(6):
            toks = [f"b{k}w{(d * 7 + j) % 11}" for j in range(12)]
            rows.append((k * 100 + d, f"s{d % 2}", " ".join(toks)))
        all_rows.extend(rows)
        batches.append(spark.createDataFrame(
            rows, "doc_id long, source string, text string"))
    out = str(tmp_path / "out_lm_growth")
    sink = lm_model_sink(out)
    per_batch_vocab = []
    for k, b in enumerate(batches):
        sink(b, k)
        per_batch_vocab.append(
            spark.read.parquet(out + "/pair_counts")
            .filter(F.col("batch_id") == k).count())

    # pair_counts grew by each batch's NOVEL vocabulary (disjoint by
    # construction → total rows = sum of per-batch distinct bigrams)
    total = spark.read.parquet(out + "/pair_counts").count()
    assert total == sum(per_batch_vocab) and total > 0

    # (1) the model re-sum — the ONLY history reader — scans
    # pair_counts exactly once, whatever the batch_id partition count
    raw = spark.read.parquet(out + "/pair_counts")
    resum = (raw.groupBy("source", "w1", "w2")
             .agg(F.sum("c2").cast("bigint").alias("c2")))
    assert count_scans(resum, "parquet") == 1, formatted_plan(resum)

    # (2) the refold reads the re-summed MODEL only: pair_counts (and
    # its batch_id partition axis) never enter the fold's plan
    fold = crossentropy_matrix_fold(spark.read.parquet(out + "/model"))
    fold_plan = formatted_plan(fold)
    assert "pair_counts" not in fold_plan, fold_plan
    assert "batch_id" not in fold_plan, fold_plan

    # (3) converged matrix == batch face on the union corpus
    union = spark.createDataFrame(
        all_rows, "doc_id long, source string, text string")
    d = str(tmp_path / "union_corpus")
    union.write.parquet(f"{d}/documents.parquet")
    want = (all_queries()["corpus_crossentropy_matrix"].fn(spark, d)
            .toPandas().sort_values(["source_eval", "source_model"])
            .reset_index(drop=True))
    got = (spark.read.parquet(out + "/matrix").toPandas()
           .sort_values(["source_eval", "source_model"])
           .reset_index(drop=True))
    assert got[sorted(got.columns)].equals(want[sorted(want.columns)]), (
        got, want)


def test_oov_rate_sink_soak_random_cuts(spark, tmp_path):
    """Randomized-cut soak for oov_rate_sink: seeded random cut points,
    shuffled application order, one immediate and one DELAYED verbatim
    retry — the converged OOV report must equal tokenizer_oov_rate
    every time. The pin covers the non-additive part explicitly: the
    top-N vocabulary is re-derived from the summed counts each batch,
    so a word that entered the top-N only after later batches arrived
    still yields the batch face's exact report."""
    from process_nwb_spark.relational.core import all_queries
    from process_nwb_spark.streaming.ops import oov_rate_sink

    rng = np.random.default_rng(SEED + 8)
    docs = (spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
            .select("doc_id", "source", "text").localCheckpoint())
    ids = [r.doc_id for r in
           docs.select("doc_id").orderBy("doc_id").collect()]
    want = (all_queries()["tokenizer_oov_rate"]
            .fn(spark, SF_CORRECT).toPandas())
    cols = sorted(want.columns)
    for rnd in range(2):
        n_segs = int(rng.integers(2, 6))
        cuts = _random_cuts(rng, ids, n_segs)
        segs = _segments(docs, "doc_id", cuts)
        out = str(tmp_path / f"out_oov_{rnd}")
        sink = oov_rate_sink(out)
        order = rng.permutation(len(segs))
        retry_at = int(rng.integers(0, len(segs)))
        for step, i in enumerate(order):
            sink(segs[int(i)], int(i))
            if step == retry_at:
                sink(segs[int(i)], int(i))   # immediate verbatim retry
        delayed = int(rng.integers(0, len(segs)))
        sink(segs[delayed], delayed)         # delayed verbatim retry
        got = spark.read.parquet(out + "/oov").toPandas()
        _eq(got, want, cols, ["source"],
            ("oov", rnd, cuts, list(order), retry_at, delayed))
        # the maintained counts equal the batch builder's exactly
        from process_nwb_spark.relational.llm_ops import source_word_counts
        gm = (spark.read.parquet(out + "/counts").toPandas()
              .sort_values(["source", "w"]).reset_index(drop=True))
        wm = (source_word_counts(docs).toPandas()
              .sort_values(["source", "w"]).reset_index(drop=True))
        assert gm.equals(wm), ("oov counts diverged", rnd)


def test_oov_rate_sink_vocab_shift_and_empty_batch(spark, tmp_path):
    """The vocabulary-shift case stated as data: batch 0's corpus makes
    'aaa' the top word; batch 1 floods 'zzz' so the converged top-1
    vocab is {zzz} and batch-0 tokens become RETROACTIVELY oov — the
    refold must report against the final vocabulary, not the one each
    batch saw (plus leading/trailing empty batches = the additive
    identity). Verified against the batch face on the union corpus,
    with the vocab size monkeypatched to 1 so the shift is forced."""
    import process_nwb_spark.relational.llm_ops as llm
    from process_nwb_spark.streaming.ops import oov_rate_sink

    old = llm._OOV_VOCAB_TOPN
    llm._OOV_VOCAB_TOPN = 1
    try:
        b0 = spark.createDataFrame(
            [(0, "s0", "aaa aaa aaa bbb")],
            "doc_id long, source string, text string")
        b1 = spark.createDataFrame(
            [(1, "s1", "zzz zzz zzz zzz zzz bbb")],
            "doc_id long, source string, text string")
        empty = b0.filter(F.lit(False))
        out = str(tmp_path / "out_oov_shift")
        sink = oov_rate_sink(out)
        sink(empty, 0)
        sink(b0, 1)
        sink(b1, 2)
        sink(empty, 3)
        got = (spark.read.parquet(out + "/oov").toPandas()
               .set_index("source").sort_index())
        # converged vocab = {zzz} (5 > 3): ALL of batch 0 is now oov
        assert got.loc["s0"].n_oov == 4 and got.loc["s0"].n_tokens == 4
        assert got.loc["s0"].n_oov_types == 2          # aaa, bbb
        assert got.loc["s1"].n_oov == 1                # bbb only
        assert got.loc["s1"].n_oov_types == 1
        # equals the batch face on the union corpus
        d = str(tmp_path / "union_oov")
        b0.unionByName(b1).write.parquet(f"{d}/documents.parquet")
        from process_nwb_spark.relational.llm_ops import (
            oov_rate_fold, source_word_counts)
        want = (oov_rate_fold(source_word_counts(
            spark.read.parquet(f"{d}/documents.parquet")))
            .toPandas().set_index("source").sort_index())
        assert got.equals(want), (got, want)
    finally:
        llm._OOV_VOCAB_TOPN = old


def test_cluster_cap_sink_soak_random_cuts(spark, tmp_path):
    """Randomized-cut soak for cluster_cap_sink: seeded cuts, shuffled
    order, immediate + delayed verbatim retries — the converged kept
    table must equal dedup_cluster_cap's kept==1 rows every time (the
    bounded top-K-min fold is idempotent/commutative; sizes re-sum
    from batch-partitioned counts)."""
    from process_nwb_spark.relational.core import all_queries
    from process_nwb_spark.streaming.ops import cluster_cap_sink

    rng = np.random.default_rng(SEED + 9)
    docs = (spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
            .select("doc_id", "source", "text").localCheckpoint())
    ids = [r.doc_id for r in
           docs.select("doc_id").orderBy("doc_id").collect()]
    want = (all_queries()["dedup_cluster_cap"].fn(spark, SF_CORRECT)
            .toPandas())
    want = want[want.kept == 1]
    cols = sorted(want.columns)
    for rnd in range(2):
        n_segs = int(rng.integers(2, 6))
        cuts = _random_cuts(rng, ids, n_segs)
        segs = _segments(docs, "doc_id", cuts)
        out = str(tmp_path / f"out_cap_{rnd}")
        sink = cluster_cap_sink(out)
        order = rng.permutation(len(segs))
        retry_at = int(rng.integers(0, len(segs)))
        for step, i in enumerate(order):
            sink(segs[int(i)], int(i))
            if step == retry_at:
                sink(segs[int(i)], int(i))   # immediate verbatim retry
        delayed = int(rng.integers(0, len(segs)))
        sink(segs[delayed], delayed)         # delayed verbatim retry
        got = spark.read.parquet(out + "/kept").toPandas()
        _eq(got, want, cols, ["doc_id"],
            ("cap", rnd, cuts, list(order), retry_at, delayed))


def test_cluster_cap_sink_demotes_late_smaller_doc(spark, tmp_path):
    """The adversarial order the fold must survive: the cluster's
    SMALLEST doc_ids arrive LAST. After batch 0 the keepers of the
    5-doc cluster are (10, 11); batch 1 delivers 3 and 4, which demote
    both — converged keepers are (3, 4), exactly the batch face on the
    union (plus an empty-batch identity check)."""
    from process_nwb_spark.streaming.ops import cluster_cap_sink

    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, text string")
    b0 = mk([(10, "dup text"), (11, "dup text"), (12, "dup text")])
    b1 = mk([(3, "dup text"), (4, "dup text"), (20, "solo")])
    out = str(tmp_path / "out_cap_late")
    sink = cluster_cap_sink(out)
    sink(b0, 0)
    first = (spark.read.parquet(out + "/kept").toPandas()
             .sort_values("doc_id"))
    assert list(first[first.cluster_size >= 3].doc_id) == [10, 11]
    sink(b0.filter(F.lit(False)), 1)     # empty batch: identity
    sink(b1, 2)
    got = (spark.read.parquet(out + "/kept").toPandas()
           .sort_values("doc_id").reset_index(drop=True))
    dup = got[got.cluster_size == 5]
    assert list(dup.doc_id) == [3, 4], got
    assert list(dup.copy_rank) == [1, 2]
    solo = got[got.cluster_size == 1]
    assert list(solo.doc_id) == [20] and solo.iloc[0].copy_rank == 1


def test_split_contamination_sink_soak_random_cuts(spark, tmp_path):
    """Randomized-cut soak for split_contamination_sink: seeded cuts,
    SHUFFLED batch order (both state tables are set-union semilattices,
    so order must not matter), immediate + delayed verbatim retries —
    the converged report must equal split_contamination every time."""
    from process_nwb_spark.relational.core import all_queries
    from process_nwb_spark.streaming.ops import split_contamination_sink

    rng = np.random.default_rng(SEED + 10)
    docs = (spark.read.parquet(f"{SF_CORRECT}/documents.parquet")
            .select("doc_id", "text").localCheckpoint())
    ids = [r.doc_id for r in
           docs.select("doc_id").orderBy("doc_id").collect()]
    want = (all_queries()["split_contamination"]
            .fn(spark, SF_CORRECT).toPandas())
    cols = sorted(want.columns)
    for rnd in range(2):
        n_segs = int(rng.integers(2, 6))
        cuts = _random_cuts(rng, ids, n_segs)
        segs = _segments(docs, "doc_id", cuts)
        out = str(tmp_path / f"out_cont_{rnd}")
        sink = split_contamination_sink(out)
        order = rng.permutation(len(segs))
        retry_at = int(rng.integers(0, len(segs)))
        for step, i in enumerate(order):
            sink(segs[int(i)], int(i))
            if step == retry_at:
                sink(segs[int(i)], int(i))   # immediate verbatim retry
        delayed = int(rng.integers(0, len(segs)))
        sink(segs[delayed], delayed)         # delayed verbatim retry
        got = spark.read.parquet(out + "/report").toPandas()
        _eq(got, want, cols, ["doc_id"],
            ("cont", rnd, cuts, list(order), retry_at, delayed))


def test_split_contamination_sink_retroactive_rise(spark, tmp_path):
    """The non-additive part stated as data: a TEST doc's contamination
    RISES retroactively when a LATER train batch first contains one of
    its shingles — the refold must re-derive matches against the grown
    train set, not accumulate match counts (plus empty-batch identity
    and a verbatim retry after the rise)."""
    import hashlib

    from process_nwb_spark.streaming.ops import split_contamination_sink

    def bucket(i):
        return int(hashlib.md5(f"{i}:split".encode()).hexdigest()[:2],
                   16)

    test_id = next(i for i in range(10000) if bucket(i) >= 243)
    train_id = next(i for i in range(10000) if bucket(i) < 230)
    mk = lambda rows: spark.createDataFrame(  # noqa: E731
        rows, "doc_id long, text string")
    # test doc: shingles {"alpha beta gamma", "beta gamma delta"}
    b0 = mk([(test_id, "alpha beta gamma delta")])
    # later train doc contains ONE of them
    b1 = mk([(train_id, "alpha beta gamma")])
    out = str(tmp_path / "out_cont_rise")
    sink = split_contamination_sink(out)
    sink(b0, 0)
    first = spark.read.parquet(out + "/report").toPandas()
    assert len(first) == 1
    assert first.iloc[0].n_shingles == 2 and first.iloc[0].n_shared == 0
    assert first.iloc[0].contamination == 0.0
    sink(b0.filter(F.lit(False)), 1)     # empty batch: identity
    sink(b1, 2)
    sink(b1, 2)                          # verbatim retry after the rise
    got = spark.read.parquet(out + "/report").toPandas()
    assert len(got) == 1
    assert got.iloc[0].n_shingles == 2 and got.iloc[0].n_shared == 1
    assert got.iloc[0].contamination == 0.5
