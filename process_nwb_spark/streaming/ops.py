"""Structured Streaming tier on the `events` stream.

The reference has no streaming capability; its closest analog is the
chunked iterative writer (wavelet_transform.py:142-235), whose Spark
replacement is `foreachBatch` incremental sinks (see `foreach_batch_parquet`).
Everything here is built-in Structured Streaming: event-time windows,
watermarks + late-data drop, stateful dedup, stream-static joins.

Batch twins of these operators live in relational/event_windows.py where
DuckDB can replay them; tests/test_streaming.py checks stream == batch.
"""
from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_SCHEMA = ("event_id BIGINT, ts TIMESTAMP, user_id BIGINT, "
                 "event_type STRING, value DOUBLE, props STRING")


def read_events_stream(spark: SparkSession, sf_dir: str,
                       max_files_per_trigger: int | None = None) -> DataFrame:
    """events parquet as a file-source stream.

    A streaming reader needs a fixed user schema, but events.ts varies by
    producer: timestamp[us] (isAdjustedToUTC) reads as TIMESTAMP,
    timestamp[us] NTZ reads as TIMESTAMP_NTZ, and TIMESTAMP(NANOS) reads
    as BIGINT under the session's nanosAsLong guard. So probe the batch
    schema first — a parquet-footer-only read, no data scan — and declare
    the stream schema to match, converting to TIMESTAMP after the scan the
    same way the batch loader does (relational/core.py T()). This keeps
    the two tiers degrading symmetrically on every source flavor.
    """
    # point at the events file specifically: a bare directory glob would
    # sweep in the other tables' parquet and null-pad their rows
    path = sf_dir if sf_dir.endswith(".parquet") else f"{sf_dir}/events*.parquet"
    ts_type = dict(spark.read.parquet(path).dtypes).get("ts", "timestamp")
    schema = EVENTS_SCHEMA.replace("ts TIMESTAMP", f"ts {ts_type.upper()}")
    reader = spark.readStream.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    stream = reader.parquet(path)
    if ts_type == "bigint":      # TIMESTAMP(NANOS) under nanosAsLong: ns -> us
        stream = stream.withColumn(
            "ts", F.timestamp_micros(F.expr("ts div 1000")))
    elif ts_type == "timestamp_ntz":   # session tz UTC: wall-clock identity
        stream = stream.withColumn("ts", F.col("ts").cast("timestamp"))
    return stream


def tumbling_counts(events: DataFrame, width: str = "5 minutes",
                    watermark: str = "1 hour") -> DataFrame:
    """Tumbling event-time window counts with late-data drop."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width).alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type",
                "n", "total_value")
    )


def sliding_counts(events: DataFrame, width: str = "10 minutes",
                   slide: str = "5 minutes",
                   watermark: str = "1 hour") -> DataFrame:
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", width, slide).alias("w"))
        .agg(F.count("*").alias("n"),
             F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "n", "total_value")
    )


def session_counts(events: DataFrame, gap: str = "30 minutes",
                   watermark: str = "1 hour") -> DataFrame:
    """Session windows per user (gap-merged), the stateful window operator."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


def dedup_stream(events: DataFrame, watermark: str | None = "1 hour") -> DataFrame:
    """Stateful dedup: first event per (user_id, event_type).

    With a watermark, state for keys older than the horizon is evicted —
    bounded memory, but a key may re-emit after the horizon. That contract
    requires `dropDuplicatesWithinWatermark`: plain dropDuplicates only
    evicts state when the EVENT-TIME column is part of the dedup keys, so
    on bare (user_id, event_type) keys its state would grow without bound
    while the watermark silently did nothing. watermark=None keeps state
    unbounded for exact global dedup (dropDuplicates, the intended
    infinite-state form)."""
    if watermark is not None:
        return (events.withWatermark("ts", watermark)
                .dropDuplicatesWithinWatermark(["user_id", "event_type"]))
    return events.dropDuplicates(["user_id", "event_type"])


def enrich_with_customers(events: DataFrame, customers: DataFrame) -> DataFrame:
    """Stream-static join: enrich the event stream with the customer dim
    (static side is broadcast; no state needed)."""
    dim = customers.select(F.col("c_custkey").alias("user_id"),
                           "c_name", "c_mktsegment")
    # No F.broadcast() hint here: wrapping the static side of a
    # stream-static join in a broadcast hint breaks attribute remapping at
    # query start (Spark 4.1.2); the dim is below the auto-broadcast
    # threshold so the planner broadcasts it anyway.
    return events.join(dim, on="user_id").select(
        "event_id", "ts", "event_type", "c_name", "c_mktsegment")


def join_clicks_to_errors(clicks: DataFrame, errors: DataFrame,
                          within: str = "10 minutes") -> DataFrame:
    """Stream-stream inner join: click events matched to error events from
    the same user within `within` after the click.

    Both sides are watermarked and the join condition carries the
    event-time range bound — that pair is what lets Spark EVICT buffered
    state: a click older than (error watermark - within) can never match
    again and is dropped, so state is O(events in the time horizon), not
    O(stream). An equi-join without the time bound would buffer forever.
    Batch twin: `stream_stream_join` in relational/event_windows.py
    (DuckDB-replayed); tests assert stream == batch."""
    c = (clicks.withWatermark("ts", "1 hour")
         .select(F.col("event_id").alias("click_id"),
                 F.col("ts").alias("click_ts"), "user_id"))
    e = (errors.withWatermark("ts", "2 hours")
         .select(F.col("event_id").alias("error_id"),
                 F.col("ts").alias("error_ts"),
                 F.col("user_id").alias("e_user_id")))
    return (c.join(
        e,
        F.expr(f"""user_id = e_user_id
                   AND error_ts >= click_ts
                   AND error_ts <= click_ts + INTERVAL {within}"""))
        .select("click_id", "error_id", "user_id",
                F.date_format("click_ts", "yyyy-MM-dd HH:mm:ss")
                .alias("click_time"),
                F.date_format("error_ts", "yyyy-MM-dd HH:mm:ss")
                .alias("error_time")))


def running_user_totals(events: DataFrame) -> DataFrame:
    """Custom stateful operator via `applyInPandasWithState`: per-user
    running (count, sum(value)) maintained across micro-batches — the
    arbitrary-state API the built-in windows can't express (reference
    analog: the chunked writer's per-(channel,band) accumulator state,
    wavelet_transform.py:198-207).

    State is one (n, total) pair per user_id: O(distinct keys) memory,
    partitioned by the grouping key across executors at scale. Each
    micro-batch emits the updated totals for the users it touched
    (outputMode='update')."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, total))
        yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                            "total_value": [round(total, 2)]})

    return (events.groupBy("user_id").applyInPandasWithState(
        fn,
        outputStructType="user_id BIGINT, n_events BIGINT, total_value DOUBLE",
        stateStructType="n BIGINT, total DOUBLE",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout))


def stream_burst_detect(signals: DataFrame, threshold: float,
                        min_duration: int = 1) -> DataFrame:
    """Streaming burst/HFO detection with islands carried ACROSS
    micro-batches — the stateful twin of operators/bursts.detect_bursts.

    A burst that straddles a file cut cannot be detected batch-locally
    (each side would report a truncated island, or drop it under the
    min-duration gate). Here `applyInPandasWithState` keys state by
    (series_id, channel): the still-open island at a batch's tail
    (start, last, peak, area) persists in the state store and stitches
    onto the next batch when its first supra-threshold run continues at
    last+1. Only CLOSED islands are emitted (outputMode append): an
    island closes when a later sample (sub-threshold or gapped) proves
    it ended; a recording's final open island stays in state, exactly
    the semantics of a live stream where the burst may still be going.

    Contract: per (series, channel), micro-batches must land in
    increasing sample order (file source honors landing order under
    maxFilesPerTrigger); a batch overlapping carried state raises
    rather than silently double-counting. State is O(1) per key.
    Batch==stream equality is pinned in tests/test_streaming.py with a
    file cut through the middle of a burst."""
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    thr, mind = float(threshold), int(min_duration)
    if mind < 1:
        raise ValueError(f"need min_duration >= 1, got {min_duration}")

    def runs_of(idx, val):
        m = val >= thr
        if not m.any():
            return []
        mi, mv = idx[m], val[m]
        brk = np.nonzero(np.diff(mi) != 1)[0]
        starts = np.r_[0, brk + 1]
        ends = np.r_[brk, len(mi) - 1]
        return [(int(mi[s]), int(mi[e]), float(mv[s:e + 1].max()),
                 float((mv[s:e + 1] - thr).sum()))
                for s, e in zip(starts, ends)]

    def fn(key, pdfs, state: GroupState):
        sid, ch = key
        open_ = tuple(state.get) if state.exists else None
        # high-water mark across carried state AND every Arrow chunk of
        # this micro-batch: Spark does not guarantee cross-chunk order
        # after the groupBy shuffle, and an out-of-order chunk while no
        # island is open would silently split bursts straddling the
        # chunk boundary instead of raising
        max_seen = open_[1] if open_ is not None else None
        closed = []
        # buffer ALL Arrow chunks of the key's micro-batch and sort once:
        # Spark splits a key's batch at arrow.maxRecordsPerBatch with no
        # cross-chunk ordering, so per-chunk processing would raise the
        # out-of-order guard on valid input (the guard still fires across
        # micro-batches, which is the real contract)
        chunks = [p for p in pdfs if len(p)]
        for pdf in ([pd.concat(chunks, ignore_index=True)]
                    if chunks else []):
            pdf = pdf.sort_values("sample_idx")
            idx = pdf["sample_idx"].to_numpy(np.int64)
            val = pdf["value"].to_numpy(np.float64)
            if max_seen is not None and idx[0] <= max_seen:
                raise ValueError(
                    f"stream_burst_detect: batch for {sid!r}/ch{ch} starts "
                    f"at sample {int(idx[0])} but samples through "
                    f"{max_seen} were already processed — out-of-order "
                    f"landing")
            rs = runs_of(idx, val)
            if open_ is not None:
                if rs and rs[0][0] == open_[1] + 1:
                    s0, e0, p0, a0 = rs[0]
                    rs[0] = (open_[0], e0, max(p0, open_[2]), a0 + open_[3])
                else:
                    closed.append(open_)   # gap or sub-threshold closed it
                open_ = None
            batch_max = int(idx[-1])
            max_seen = batch_max
            for r in rs:
                if r[1] == batch_max:
                    open_ = r              # tail run: may continue next batch
                else:
                    closed.append(r)
        if open_ is not None:
            state.update(open_)
        elif state.exists:
            state.remove()
        keep = [c for c in closed if c[1] - c[0] + 1 >= mind]
        yield pd.DataFrame({
            "series_id": [sid] * len(keep),
            "channel": [ch] * len(keep),
            "start_idx": [c[0] for c in keep],
            "end_idx": [c[1] for c in keep],
            "duration": [c[1] - c[0] + 1 for c in keep],
            "peak": [c[2] for c in keep],
            "area": [c[3] for c in keep],
        })

    return (signals.groupBy("series_id", "channel").applyInPandasWithState(
        fn,
        outputStructType=("series_id STRING, channel INT, start_idx BIGINT, "
                          "end_idx BIGINT, duration BIGINT, peak DOUBLE, "
                          "area DOUBLE"),
        stateStructType="start BIGINT, last BIGINT, peak DOUBLE, area DOUBLE",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout))


def foreach_batch_parquet(out_dir: str):
    """Incremental partitioned-parquet sink — the Spark analog of the
    reference's chunked HDF5 writer (wavelet_transform.py:219: DataChunk
    appends addressed by (channel, band); here: epoch-partitioned append)."""

    def write_batch(batch_df: DataFrame, batch_id: int):
        (batch_df.withColumn("_batch", F.lit(batch_id))
         .write.mode("append").parquet(out_dir))

    return write_batch


def user_event_stats_tws(events: DataFrame) -> DataFrame:
    """Per-user running stats via `transformWithStateInPandas` (the Spark
    4.x arbitrary-state v2 API): ValueState holding (n, total, max_value),
    updated per micro-batch, emitting the running stats for touched keys.

    Complements `running_user_totals` (applyInPandasWithState, the v1
    API): v2 gives typed state handles, TTL support, and composable state
    variables — the forward path for custom stateful operators. State is
    O(distinct user_ids), partitioned by key across executors.

    Runtime requirements: the RocksDB state store provider
    (`spark.sql.streaming.stateStore.providerClass`) and the
    `protobuf` python package (absent from this container — the test
    skips; `running_user_totals` is the fully-exercised stateful path
    here)."""
    import pandas as pd
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor, StatefulProcessorHandle)

    class UserStats(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._state = handle.getValueState(
                "stats", "n BIGINT, total DOUBLE, max_value DOUBLE")

        def handleInputRows(self, key, rows, timerValues):
            n, total, mx = 0, 0.0, float("-inf")
            if self._state.exists():
                n, total, mx = self._state.get()
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
                mx = max(mx, float(pdf["value"].max()))
            self._state.update((n, total, mx))
            yield pd.DataFrame({"user_id": [key[0]], "n_events": [n],
                                "total_value": [round(total, 2)],
                                "max_value": [round(mx, 2)]})

        def close(self) -> None:
            pass

    return (events.groupBy("user_id").transformWithStateInPandas(
        UserStats(),
        outputStructType=("user_id BIGINT, n_events BIGINT, "
                          "total_value DOUBLE, max_value DOUBLE"),
        outputMode="Update",
        timeMode="None"))


SIGNALS_SCHEMA = ("series_id STRING, channel INT, sample_idx BIGINT, "
                  "value DOUBLE")


def stream_preprocess_signals(spark: SparkSession, signals_dir: str,
                              out_dir: str, rate: float,
                              noise_hz: float = 60.0,
                              seg_len: int = 4096, overlap: int = 1024,
                              max_files_per_trigger: int = 1):
    """Incremental ECoG preprocessing: stream long-signal parquet files in
    as they land, notch-filter each micro-batch with the bounded-memory
    segmented kernel, append partitioned parquet.

    This is the faithful streaming re-expression of the reference's
    chunked pipeline (ChannelBandIterator + iterative HDF5 write,
    wavelet_transform.py:142-235): data flows through in bounded blocks
    and the sink grows incrementally. Each arriving file must hold whole
    segments' worth of samples per channel (the file is the micro-batch
    boundary); segment overlap is handled inside the batch by
    segmented_notch.

    Returns the started StreamingQuery (caller awaits/stops)."""
    from ..operators.segmented import segmented_notch

    reader = (spark.readStream.schema(SIGNALS_SCHEMA)
              .option("maxFilesPerTrigger", max_files_per_trigger))
    sdf = reader.parquet(signals_dir)

    def process_batch(batch_df: DataFrame, batch_id: int):
        out = segmented_notch(batch_df, rate, noise_hz=noise_hz,
                              seg_len=seg_len, overlap=overlap)
        (out.withColumn("_batch", F.lit(batch_id))
         .write.mode("append").partitionBy("series_id", "channel")
         .parquet(out_dir))

    return (sdf.writeStream.foreachBatch(process_batch)
            .trigger(availableNow=True).start())


def stream_preprocess_full(spark: SparkSession, signals_dir: str,
                           out_dir: str, rate: float,
                           noise_hz: float = 60.0, mean_frac: float = 0.95,
                           filters: str = "rat", hg_only: bool = True,
                           seg_len: int = 4096, overlap: int = 1024,
                           precision: str = "single",
                           max_files_per_trigger: int = 1):
    """The ENTIRE reference pipeline as a stream: landing signal files ->
    notch -> CAR-subtract -> wavelet amplitude -> band-partitioned parquet
    append. Streaming re-expression of preprocess_block (pipelines.py:15-111)
    driven the way ChannelBandIterator drives the chunked writer
    (wavelet_transform.py:142-235): data flows in bounded blocks, the sink
    grows incrementally.

    Correctness boundary: CAR is per-timepoint across channels
    (common_referencing.py:11-42), so as long as each landing file carries
    ALL channels for its time range (the natural acquisition layout),
    computing it inside the micro-batch is exact — no cross-batch state.
    The FFT stages use the overlap-segmented kernels, so per-task memory
    stays bounded regardless of recording length; files must land cut on
    whole-segment boundaries (the file is the micro-batch boundary).

    Returns the started StreamingQuery (caller awaits/stops)."""
    from ..operators.car import subtract_car
    from ..operators.segmented import segmented_notch, segmented_wavelet_amp

    reader = (spark.readStream.schema(SIGNALS_SCHEMA)
              .option("maxFilesPerTrigger", max_files_per_trigger))
    sdf = reader.parquet(signals_dir)

    def process_batch(batch_df: DataFrame, batch_id: int):
        notched = segmented_notch(batch_df, rate, noise_hz=noise_hz,
                                  seg_len=seg_len, overlap=overlap,
                                  precision=precision)
        referenced = subtract_car(notched, mean_frac=mean_frac)
        amp = segmented_wavelet_amp(referenced, rate, filters=filters,
                                    hg_only=hg_only, seg_len=seg_len,
                                    overlap=overlap, precision=precision)
        (amp.withColumn("_batch", F.lit(batch_id))
         .write.mode("append").partitionBy("band")
         .parquet(out_dir))

    return (sdf.writeStream.foreachBatch(process_batch)
            .trigger(availableNow=True).start())


def stream_stft(spark: SparkSession, signals_dir: str, out_dir: str,
                frame_len: int, window: str = "hann",
                max_files_per_trigger: int = 1):
    """Incremental spectrogram: stream landing signal files, STFT each
    micro-batch (operators/stft.py), append channel-partitioned parquet
    (readers slice by electrode; per-channel files keep each partition's
    frames time-contiguous across micro-batches).

    Hop is pinned to frame_len (non-overlapping frames): then a file cut
    on any frame boundary never splits a frame, so the streaming result
    is EXACTLY the batch STFT of the concatenated data — no cross-batch
    state, no boundary numerics at all (unlike the resample/notch
    stages, whose overlap windows pay batch-local padding at cuts). An
    overlapping hop would split frames across micro-batches and is
    refused rather than silently computed batch-locally.

    Full frames only (include_partial=False): a NON-frame-aligned file
    cut truncates one frame, and the per-frame kernel would otherwise
    analyze that truncation as a plausible-looking 'trailing partial' on
    a wrong grid AND PERSIST it before the next micro-batch's
    misalignment check kills the stream — wrong rows left in the sink.
    Dropping partials means the split frame is never written (the next
    batch still fails loudly on the misaligned remainder), at the cost
    of also dropping a genuine end-of-recording partial frame.

    Returns the started StreamingQuery (caller awaits/stops)."""
    from ..operators.stft import stft_power

    reader = (spark.readStream.schema(SIGNALS_SCHEMA)
              .option("maxFilesPerTrigger", max_files_per_trigger))
    sdf = reader.parquet(signals_dir)

    def process_batch(batch_df: DataFrame, batch_id: int):
        out = stft_power(batch_df, frame_len=frame_len, hop=frame_len,
                         window=window, include_partial=False)
        (out.withColumn("_batch", F.lit(batch_id))
         .write.mode("append").partitionBy("channel")
         .parquet(out_dir))

    return (sdf.writeStream.foreachBatch(process_batch)
            .trigger(availableNow=True).start())


def run_to_memory(stream_df: DataFrame, name: str, spark: SparkSession,
                  mode: str = "complete"):
    """Drain a stream with availableNow into an in-memory table; returns the
    final batch DataFrame. mode='complete' for aggregations, 'append' for
    dedup/joins. Test/utility helper."""
    q = (stream_df.writeStream.format("memory").queryName(name)
         .outputMode(mode)
         .trigger(availableNow=True).start())
    q.awaitTermination()
    return spark.table(name)


def stream_peak_detect(signals: DataFrame, threshold: float,
                       min_separation: int = 1) -> DataFrame:
    """Streaming refractory peak detection — the stateful twin of
    operators/peaks.detect_peaks, with decisions carried ACROSS
    micro-batches.

    Two things cannot be decided batch-locally: (a) the last sample of a
    batch has no right neighbor yet, so its candidacy is pending until
    the next batch's first sample arrives (state carries the last two
    (idx, value) points for the 3-tap stencil); (b) a refractory island
    whose last candidate is within `min_separation` of the batch tail
    may still merge with a candidate early in the next batch, so only
    PROVEN-closed islands are emitted (append mode): an island closes
    once the stream has advanced `min_separation` samples past its last
    candidate, or a non-merging candidate arrives. A live recording's
    final pending island stays in state — exactly stream semantics
    (cf. stream_burst_detect).

    Contract: per (series_id, channel) batches must land in increasing
    sample order (a batch at or below the high-water mark raises —
    same guard as stream_burst_detect); within a batch any sample order
    is fine (sorted here). NaN samples are dropped, matching the batch
    operator's NaN policy, and the stencil then runs on the filtered
    adjacency exactly like the batch op's lag/lead. State is O(1) per
    key. Batch==stream equality is pinned in tests/test_streaming.py
    with cuts through a stencil boundary and through an open island.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    thr, sep = float(threshold), int(min_separation)
    if sep < 1:
        raise ValueError(f"need min_separation >= 1, got {min_separation}")

    def fn(key, pdfs, state: GroupState):
        sid, ch = key
        # state: last two points for the stencil + the open island
        if state.exists:
            (p1_idx, p1_val, p2_val, has_p2,
             b_idx, b_val, cnt, last_cand, has_isl) = tuple(state.get)
        else:
            p1_idx = None
            p2_val = has_p2 = b_idx = b_val = cnt = last_cand = None
            has_isl = False
        closed = []

        # same chunk-buffering as stream_burst_detect: sort the whole
        # micro-batch once so Spark's arbitrary Arrow chunk split can't
        # trip the high-water guard on valid in-order data
        chunks = [p for p in pdfs if len(p)]
        for pdf in ([pd.concat(chunks, ignore_index=True)]
                    if chunks else []):
            pdf = pdf.sort_values("sample_idx")
            v_all = pdf["value"].to_numpy(np.float64)
            keep = ~np.isnan(v_all)
            idx = pdf["sample_idx"].to_numpy(np.int64)[keep]
            val = v_all[keep]
            if not len(idx):
                continue
            if p1_idx is not None and idx[0] <= p1_idx:
                raise ValueError(
                    f"stream_peak_detect: batch for {sid!r}/ch{ch} starts "
                    f"at sample {int(idx[0])} but samples through "
                    f"{int(p1_idx)} were already processed — out-of-order "
                    f"landing")
            # prepend carried context so the carried p1 gets its stencil
            if p1_idx is not None:
                pre_i = [p1_idx - 1, p1_idx] if has_p2 else [p1_idx]
                pre_v = [p2_val, p1_val] if has_p2 else [p1_val]
                idx = np.concatenate([np.asarray(pre_i, np.int64), idx])
                val = np.concatenate([np.asarray(pre_v, np.float64), val])
            # 3-tap stencil over interior points (the filtered adjacency)
            if len(val) >= 3:
                m = ((val[1:-1] >= thr) & (val[1:-1] > val[:-2])
                     & (val[1:-1] >= val[2:]))
                cands = list(zip(idx[1:-1][m].tolist(),
                                 val[1:-1][m].tolist()))
            else:
                cands = []
            # skip candidates already decided in a previous batch: only
            # the carried p1 (and later) are undecided
            if p1_idx is not None and has_p2:
                cands = [(i, x) for (i, x) in cands if i >= p1_idx]
            for (c, x) in cands:
                if has_isl and c - last_cand < sep:
                    if x > b_val:
                        b_idx, b_val = c, x
                    cnt += 1
                    last_cand = c
                else:
                    if has_isl:
                        closed.append((b_idx, b_val, cnt))
                    b_idx, b_val, cnt, last_cand, has_isl = c, x, 1, c, True
            # island provably closed once the stream is `sep` past it
            if has_isl and int(idx[-1]) - last_cand >= sep:
                closed.append((b_idx, b_val, cnt))
                has_isl = False
                b_idx = b_val = cnt = last_cand = None
            # carry the stencil tail (len(idx) == 1 only on a first-ever
            # single-sample batch: no left neighbor exists yet)
            if len(idx) >= 2:
                p2_val, has_p2 = float(val[-2]), True
            else:
                p2_val, has_p2 = None, False
            p1_idx, p1_val = int(idx[-1]), float(val[-1])

        state.update((p1_idx, p1_val,
                      p2_val if has_p2 else None, bool(has_p2),
                      b_idx, b_val, cnt, last_cand, bool(has_isl)))
        yield pd.DataFrame({
            "series_id": [sid] * len(closed),
            "channel": [ch] * len(closed),
            "sample_idx": [c[0] for c in closed],
            "peak_value": [c[1] for c in closed],
            "island_size": [c[2] for c in closed],
        })

    return (signals.groupBy("series_id", "channel").applyInPandasWithState(
        fn,
        outputStructType=("series_id STRING, channel INT, "
                          "sample_idx BIGINT, peak_value DOUBLE, "
                          "island_size BIGINT"),
        stateStructType=("p1_idx BIGINT, p1_val DOUBLE, p2_val DOUBLE, "
                         "has_p2 BOOLEAN, best_idx BIGINT, "
                         "best_val DOUBLE, cnt BIGINT, last_cand BIGINT, "
                         "has_island BOOLEAN"),
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout))


def _spark_round(x, quantum: str) -> float:
    """Python replica of Spark's F.round on DOUBLE: BigDecimal.valueOf(x)
    (the SHORTEST decimal representation, like Python's repr) + setScale
    HALF_UP. A floor(x*100+0.5)/100 trick diverges on values like 1.005
    or 0.145 (floor: 0.14, Spark: 0.15), and Decimal(x) (the EXACT
    binary expansion) diverges on 2.675 (exact: 2.67, Spark: 2.68) —
    verified against Spark round. Decimal(repr(x)) reproduces Spark
    bit-for-bit on all of them, which is what keeps the streaming twins'
    claimed batch==stream parity exact (tests/test_streaming.py pins the
    knife-edge values)."""
    from decimal import ROUND_HALF_UP, Decimal

    return float(Decimal(repr(float(x)))
                 .quantize(Decimal(quantum), rounding=ROUND_HALF_UP))


def stream_cusum_shift(daily: DataFrame) -> DataFrame:
    """Streaming two-sided CUSUM level-shift detection — the stateful
    twin of relational/event_windows.ts_cusum_shift, with the recurrence
    carried ACROSS micro-batches. CUSUM is the textbook ONLINE detector;
    this is its natural streaming form.

    Input: the per-(event_type, day) EXACT integer-cent daily totals
    (`d` date, `xc` bigint) — in production the output of an upstream
    windowed aggregation; granularity matches the batch face so the two
    can be compared row-for-row.

    Semantics, replicated bit-for-bit from the batch fold: the baseline
    mu is the HALF-UP-rounded mean of the first seven days (buffered in
    state until all seven have arrived — nothing is emitted before
    that, then the buffer replays through the fold so days 1..7 are
    emitted too), kappa = round2(mu*0.05), h = round2(mu*0.25), and
    s_hi/s_lo advance via max(0, prev + delta) in day order — the same
    float ops in the same order as the batch's seeded LIST_REDUCE, so
    batch == stream exactly (pinned in tests/test_streaming.py with
    file cuts through the baseline and through the fold). Series with
    fewer than seven days total never leave the buffer — a stream
    cannot know the series ended (the batch face, which can, uses what
    exists; parity holds for >= 7-day series).

    Contract: per event_type, days must land in increasing order (a
    day at or below the high-water mark raises — the
    stream_burst_detect guard); within a micro-batch any order is fine
    (all Arrow chunks of the key's batch are buffered and sorted once,
    so the guard cannot trip on chunk-split reordering past
    arrow.maxRecordsPerBatch). State is O(1) per key (7-slot buffer +
    2 sums). Emits in append mode.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def r2(x):
        return _spark_round(x, "0.01")

    def r4(x):
        return _spark_round(x, "0.0001")

    def fn(key, pdfs, state: GroupState):
        (etype,) = key
        if state.exists:
            (buf_d, buf_x, mu, kappa, h, s_hi, s_lo, last_di,
             ready) = tuple(state.get)
            buf_d, buf_x = list(buf_d), list(buf_x)
        else:
            buf_d, buf_x = [], []
            mu = kappa = h = 0.0
            s_hi = s_lo = 0.0
            last_di = -(1 << 62)
            ready = False
        out = []

        def advance(di, xc):
            nonlocal s_hi, s_lo
            x = float(xc) / 100.0
            s_hi = max(0.0, s_hi + (x - mu - kappa))
            s_lo = max(0.0, s_lo + (mu - kappa - x))
            out.append((etype, pd.Timestamp(di, unit="D")
                        .strftime("%Y-%m-%d"), x,
                        r4(s_hi), r4(s_lo),
                        1 if (s_hi > h or s_lo > h) else 0))

        # applyInPandasWithState splits a key's micro-batch into multiple
        # Arrow chunks past arrow.maxRecordsPerBatch with NO cross-chunk
        # ordering — sorting each chunk independently would trip the
        # high-water-mark guard on valid input (e.g. a multi-year backfill
        # whose earlier days land in a later chunk). Buffer the whole
        # batch and sort ONCE: state is O(1), and the rows buffered here
        # are exactly the rows the executor already holds for this key.
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            rows = pd.concat(chunks, ignore_index=True).sort_values("d")
            for d, xc in zip(rows["d"], rows["xc"]):
                di = (pd.Timestamp(d) - pd.Timestamp("1970-01-01")).days
                if di <= last_di:
                    raise ValueError(
                        f"stream_cusum_shift: day {d} for {etype!r} at or "
                        f"below the high-water mark — out-of-order landing")
                last_di = di
                if not ready:
                    buf_d.append(di)
                    buf_x.append(int(xc))
                    if len(buf_d) == 7:
                        # seeded ordered sum, same assoc as the batch fold
                        acc = 0.0
                        for v in buf_x:
                            acc = acc + float(v) / 100.0
                        mu = r2(acc / float(len(buf_x)))
                        kappa = r2(mu * 0.05)
                        h = r2(mu * 0.25)
                        ready = True
                        for bdi, bxc in zip(buf_d, buf_x):
                            advance(bdi, bxc)
                        buf_d, buf_x = [], []
                else:
                    advance(di, int(xc))
        state.update((buf_d, buf_x, mu, kappa, h, s_hi, s_lo, last_di,
                      ready))
        if out:
            yield pd.DataFrame(out, columns=[
                "event_type", "day", "x", "cusum_hi", "cusum_lo",
                "shift_flag"])

    out_schema = ("event_type string, day string, x double, "
                  "cusum_hi double, cusum_lo double, shift_flag int")
    state_schema = ("buf_d array<long>, buf_x array<long>, mu double, "
                    "kappa double, h double, s_hi double, s_lo double, "
                    "last_di long, ready boolean")
    return (daily.groupBy("event_type")
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append",
                                    GroupStateTimeout.NoTimeout))


def stream_rolling_slope(daily: DataFrame) -> DataFrame:
    """Streaming 14-day rolling OLS slope — the stateful twin of
    relational/event_windows.win_rolling_regression, with the window
    buffer carried ACROSS micro-batches.

    Input: the per-(event_type, day) EXACT integer-cent daily totals
    (`d` date, `yc` bigint), the same upstream rollup as the batch face.

    Semantics, replicated bit-for-bit: a 14-slot (day, cents) ring per
    key; once 14 days are buffered AND they span exactly 13 calendar
    days (the batch face's gapless guard — ROWS frames must not bridge
    zero-revenue days), emit slope = (14*(Σ(d_i*y_i) - d0*Σy) - 91*Σy)
    / 3185 with the numerator in EXACT unbounded-int arithmetic
    (Python ints ≡ the batch's DECIMAL(38,0)), one float division, and
    Spark-round-identical 6-dp rounding (_spark_round). Gapped windows
    emit nothing but still slide — identical to the batch filter.

    Contract: per event_type, days must land in increasing order (a
    day at or below the high-water mark raises — the established
    guard); within a micro-batch any order is fine (all Arrow chunks
    are buffered and sorted once). State is O(1) per key (14-slot
    buffer). Emits in append mode.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        (etype,) = key
        if state.exists:
            buf_d, buf_y, last_di = tuple(state.get)
            buf_d, buf_y = list(buf_d), list(buf_y)
        else:
            buf_d, buf_y = [], []
            last_di = -(1 << 62)
        out = []
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            rows = pd.concat(chunks, ignore_index=True).sort_values("d")
            for d, yc in zip(rows["d"], rows["yc"]):
                di = (pd.Timestamp(d) - pd.Timestamp("1970-01-01")).days
                if di <= last_di:
                    raise ValueError(
                        f"stream_rolling_slope: day {d} for {etype!r} at "
                        f"or below the high-water mark — out-of-order "
                        f"landing")
                last_di = di
                buf_d.append(di)
                buf_y.append(int(yc))
                if len(buf_d) > 14:
                    buf_d.pop(0)
                    buf_y.pop(0)
                if len(buf_d) == 14 and buf_d[-1] - buf_d[0] == 13:
                    d0 = buf_d[0]
                    sy = sum(buf_y)                      # exact ints
                    sdy = sum(dd * yy for dd, yy in zip(buf_d, buf_y))
                    num = 14 * (sdy - d0 * sy) - 91 * sy
                    fnum = float(num)                    # == DECIMAL->DOUBLE
                    out.append((etype,
                                pd.Timestamp(di, unit="D")
                                .strftime("%Y-%m-%d"),
                                _spark_round(fnum / 3185.0, "0.000001"),
                                1 if fnum > 0.0 else 0))
        state.update((buf_d, buf_y, last_di))
        if out:
            yield pd.DataFrame(out, columns=[
                "event_type", "day", "slope_cents", "rising"])

    out_schema = ("event_type string, day string, slope_cents double, "
                  "rising int")
    state_schema = "buf_d array<long>, buf_y array<long>, last_di long"
    return (daily.groupBy("event_type")
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append",
                                    GroupStateTimeout.NoTimeout))


def stream_sessionize(events: DataFrame,
                      gap_us: int = 30 * 60 * 1_000_000) -> DataFrame:
    """Streaming gap-based sessionization — the stateful twin of
    relational/event_windows.event_sessionize, with the open session
    carried ACROSS micro-batches.

    Input: per-event rows (`user_id` bigint, `event_id` bigint,
    `event_type` string, `us` bigint event-time micros), the same
    projection the batch face starts from.

    Semantics, replicated exactly on the columns a fold CAN replicate:
    events per user in (us, event_id) order; a gap > 30 min closes the
    running session and opens the next (ordinals 1, 2, ... identical to
    the batch lag+flag-sum). A session is EMITTED when it closes —
    (user_id, session_no, n_events, n_types, duration_s) with
    duration_s = round((max_us - min_us)/1e6, 3) computed from exact
    integer micros via the Spark-round-identical _spark_round, so the
    emitted rows are bit-for-bit the batch face's rows for every closed
    session. Two deliberate asymmetries, both structural: (1) the batch
    face also emits each user's final STILL-OPEN session, which a
    stream cannot know is over (parity tests drop each user's last
    batch row); (2) the batch face's total_value is an order-sensitive
    DOUBLE sum — deterministic within one Spark plan but not a
    replayable fold contract — so the twin omits it (the exact-cents
    rollup used by stream_rolling_slope is the fix when a streamed
    revenue total is needed).

    Contract: per user_id, (us, event_id) must land in increasing order
    across micro-batches (at-or-below the high-water mark raises — the
    established guard); within a micro-batch any order is fine (all
    Arrow chunks are buffered and sorted once). State is O(1) per key
    plus the distinct event-type set of the OPEN session (bounded by
    the type vocabulary). Emits in append mode.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        (uid,) = key
        if state.exists:
            (sess_no, n_events, types, min_us, max_us,
             last_us, last_eid) = tuple(state.get)
            types = list(types)
        else:
            sess_no, n_events, types, min_us, max_us = 0, 0, [], 0, 0
            last_us, last_eid = -(1 << 62), -(1 << 62)
        out = []
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            rows = (pd.concat(chunks, ignore_index=True)
                    .sort_values(["us", "event_id"]))
            for eid, etype, us in zip(rows["event_id"],
                                      rows["event_type"], rows["us"]):
                us, eid = int(us), int(eid)
                if (us, eid) <= (last_us, last_eid):
                    raise ValueError(
                        f"stream_sessionize: event {eid} for user {uid} "
                        f"at or below the high-water mark — out-of-order "
                        f"landing")
                if sess_no == 0:
                    sess_no, n_events = 1, 1
                    types, min_us, max_us = [etype], us, us
                elif us - last_us > gap_us:
                    out.append((uid, sess_no, n_events, len(set(types)),
                                _spark_round((max_us - min_us) / 1e6,
                                             "0.001")))
                    sess_no += 1
                    n_events, types, min_us, max_us = 1, [etype], us, us
                else:
                    n_events += 1
                    if etype not in types:
                        types.append(etype)
                    max_us = us
                last_us, last_eid = us, eid
        state.update((sess_no, n_events, types, min_us, max_us,
                      last_us, last_eid))
        if out:
            yield pd.DataFrame(out, columns=[
                "user_id", "session_no", "n_events", "n_types",
                "duration_s"])

    out_schema = ("user_id long, session_no long, n_events long, "
                  "n_types long, duration_s double")
    state_schema = ("sess_no long, n_events long, types array<string>, "
                    "min_us long, max_us long, last_us long, "
                    "last_eid long")
    return (events.groupBy("user_id")
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append",
                                    GroupStateTimeout.NoTimeout))


def foreach_batch_parquet_idempotent(out_dir: str):
    """Exactly-once-per-batch parquet sink: rows land under their
    batch-id partition with DYNAMIC partition overwrite, so a RETRIED
    micro-batch (Spark re-runs a batch after executor/driver failure —
    foreachBatch only guarantees at-least-once) replaces its own
    partition instead of appending duplicates. The plain
    foreach_batch_parquet sink is the throughput path when downstream
    dedups anyway; this is the idempotent path a 100 TB pipeline points
    at tables consumed without a dedup."""

    def write_batch(batch_df: DataFrame, batch_id: int):
        sp = batch_df.sparkSession
        key = "spark.sql.sources.partitionOverwriteMode"
        prev = sp.conf.get(key, "static")
        sp.conf.set(key, "dynamic")
        try:
            (batch_df.withColumn("_batch", F.lit(batch_id))
             .write.mode("overwrite").partitionBy("_batch")
             .parquet(out_dir))
        finally:
            sp.conf.set(key, prev)

    return write_batch


def _read_if_exists(sp: SparkSession, path: str) -> DataFrame | None:
    """Shared first-batch probe for the foreachBatch sinks: read the
    parquet table at `path` if it exists, else None. Existence is asked
    of Hadoop's FileSystem FOR THE PATH'S OWN SCHEME (local, hdfs://,
    s3a://, abfss://, ...), so the short-circuit behaves identically on
    local disk and object storage — the r10 sinks used a driver-local
    os.path.exists that was only authoritative for local paths and made
    the try/except read the real branch on any remote FS. If the probe
    itself fails (exotic scheme, missing connector), the read decides;
    a failed read still means "no table yet" (e.g. a directory holding
    only _SUCCESS from an all-empty write — no schema to infer)."""
    try:
        jvm = sp._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        fs = hpath.getFileSystem(sp._jsc.hadoopConfiguration())
        if not fs.exists(hpath):
            return None
    except Exception:
        pass   # probe unavailable: fall through, the read decides
    try:
        return sp.read.parquet(path)
    except Exception:
        return None


def mv_upsert_sink(out_dir: str, keys: list[str]):
    """Streaming materialized-view maintenance: an UPDATE-mode aggregated
    stream hands foreachBatch the keys whose running totals changed this
    micro-batch; the sink UPSERTS them into a parquet MV (current rows
    minus touched keys, union the new rows). Because update-mode rows
    are RUNNING TOTALS — not increments — a retried micro-batch upserts
    the same values it wrote the first time: the sink is idempotent
    without a batch-id high-water mark (the increments formulation would
    double-count on retry; this is why production MV merges feed on
    totals). The MV is aggregate-sized, so the rewrite is O(result);
    localCheckpoint materializes the merge before the overwrite so the
    target can be both source and sink of the same batch. At 100 TB the
    same shape lands on a lakehouse MERGE INTO keyed by the group
    columns; this is the plain-parquet equivalent with the identical
    correctness contract (batch == streamed MV, pinned in
    test_streaming.py)."""

    def write_batch(batch_df: DataFrame, batch_id: int):
        sp = batch_df.sparkSession
        new = batch_df
        cur = _read_if_exists(sp, out_dir)
        if cur is not None:
            merged = cur.join(new, keys, "left_anti").unionByName(new)
        else:
            merged = new
        merged = merged.localCheckpoint()
        merged.write.mode("overwrite").parquet(out_dir)

    return write_batch


def stream_alert_hysteresis(hourly: DataFrame) -> DataFrame:
    """Streaming Schmitt-trigger alerting — the stateful twin of
    relational/event_windows.alert_hysteresis_state, with the on/off
    state carried ACROSS micro-batches.

    Input: per-(series, hour) counts (`series` string — the alerting
    key, e.g. a service; `hour` sortable string; `n_events`, `n_errors`
    bigint), i.e. the same hourly rollup the batch face builds.

    Semantics, replicated exactly (all-integer decisions): ON when
    n_errors*100 > 25*n_events, OFF when n_errors*100 < 15*n_events,
    otherwise carry the previous state (initially OFF); `fired` marks
    rising edges. Contract: per series, hours must land in increasing
    order across micro-batches (at-or-below the high-water mark
    raises); within a micro-batch any order is fine (chunks buffered
    and sorted once). State is two integers per series. Append mode.
    """
    import pandas as pd
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def fn(key, pdfs, state: GroupState):
        (series,) = key
        if state.exists:
            st, last_hour = tuple(state.get)
        else:
            st, last_hour = 0, ""
        out = []
        chunks = [p for p in pdfs if len(p)]
        if chunks:
            rows = (pd.concat(chunks, ignore_index=True)
                    .sort_values("hour"))
            for hour, n, e in zip(rows["hour"], rows["n_events"],
                                  rows["n_errors"]):
                if hour <= last_hour:
                    raise ValueError(
                        f"stream_alert_hysteresis: hour {hour} for "
                        f"{series!r} at or below the high-water mark — "
                        f"out-of-order landing")
                n, e = int(n), int(e)
                if e * 100 > 25 * n:
                    new = 1
                elif e * 100 < 15 * n:
                    new = 0
                else:
                    new = st
                fired = 1 if (new == 1 and st == 0) else 0
                out.append((series, hour, n, e, new, fired))
                st, last_hour = new, hour
        state.update((st, last_hour))
        if out:
            yield pd.DataFrame(out, columns=[
                "series", "hour", "n_events", "n_errors", "state",
                "fired"])

    out_schema = ("series string, hour string, n_events long, "
                  "n_errors long, state int, fired int")
    state_schema = "st int, last_hour string"
    return (hourly.groupBy("series")
            .applyInPandasWithState(fn, out_schema, state_schema,
                                    "append",
                                    GroupStateTimeout.NoTimeout))


def scd2_upsert_sink(out_dir: str):
    """foreachBatch SCD2 maintenance — the streaming form of
    relational/dataprep.scd2_apply_changeset: each micro-batch of daily
    statuses (`custkey` bigint, `d` date, `status` string — one FINAL
    status per (key, day), i.e. the upstream daily argmax rollup)
    merges into the parquet history at `out_dir`. Only the batch's keys
    re-derive; untouched keys pass through window-free.

    Backfill safety needs complete information: the interval table
    alone is NOT enough to splice a late batch, because it stores only
    change-points — a no-change observation inside a same-status run is
    dropped, and a later out-of-order event landing inside that run
    would re-derive the wrong chain (e.g. stored points {day1:A} from
    events {day1:A, day3:A}; late {day2:B} would yield [A,B] current B,
    while the truth is [A,B,A] current A). So the sink persists the
    FULL (custkey, d, status) point set in a sidecar table at
    `<out_dir>__points` and re-derives each changed key from that. The
    sidecar is O(events) for the changed keys — that is the honest
    price of order-free backfill; sinks that can guarantee per-key
    monotone batch order (the high-water-mark contract
    stream_alert_hysteresis uses) can stay change-point-sized.
    MIGRATION: if a history exists but the sidecar doesn't (a
    pre-sidecar deployment, or a lost sidecar), the point set is
    seeded from the history's own change-points, so upgrading never
    discards stored history — backfill splices into pre-migration
    same-status runs are change-point-grade until those keys
    re-observe, full-grade thereafter.

    Two properties a CDC consumer needs, both pinned in
    test_streaming.py (including an adversarial same-status-run splice
    the interval-only scheme gets wrong): RETRY-IDEMPOTENT
    (re-applying a batch merges the same points and re-derives the same
    rows) and BACKFILL-SAFE (batches in any order converge — the
    re-derivation sorts each key's complete point set by date). Same
    (key, day) in two batches with different statuses resolves
    max(status)-wins, mirroring the batch face's deterministic argmax
    contract. The interval history is change-point-sized; both rewrites
    are O(touched keys' events), localCheckpoint'ed so the targets can
    be source and sink of the same batch."""
    from pyspark.sql.window import Window

    pts_dir = out_dir.rstrip("/") + "__points"

    def write_batch(batch_df: DataFrame, batch_id: int):
        sp = batch_df.sparkSession

        new_ev = (batch_df.groupBy("custkey", "d")
                  .agg(F.max("status").alias("status")))
        changed = new_ev.select("custkey").distinct()
        hist = _read_if_exists(sp, out_dir)
        old_pts = _read_if_exists(sp, pts_dir)

        if old_pts is None and hist is not None:
            # FORMAT MIGRATION (r10, was a history-corruption bug): a
            # pre-sidecar deployment has an interval history but no
            # `__points` sidecar (so does a lost/partially-migrated
            # sidecar). Falling through to events = new_ev here would
            # DISCARD the changed keys' stored change-points and rebuild
            # their history from the batch alone. Seed the point set
            # from the history's change-points instead — (custkey,
            # valid_from, status) is exactly the information the
            # interval table holds. Within-run no-change observations
            # were already collapsed in that history, so the splice
            # guarantee for days BEFORE the migration is only
            # change-point-grade; it becomes full-grade for every point
            # observed from this batch on (pinned in test_streaming.py).
            old_pts = hist.select(
                "custkey",
                F.to_date("valid_from", "yyyy-MM-dd").alias("d"),
                "status")

        if old_pts is not None:
            kept_pts = old_pts.join(changed, "custkey", "left_anti")
            events = (old_pts.join(changed, "custkey", "semi")
                      .unionByName(new_ev)
                      .groupBy("custkey", "d")
                      .agg(F.max("status").alias("status")))
        else:
            kept_pts = None
            events = new_ev
        untouched = (None if hist is None
                     else hist.join(changed, "custkey", "left_anti"))

        all_pts = (events if kept_pts is None
                   else kept_pts.unionByName(events))
        all_pts = all_pts.localCheckpoint()

        w = Window.partitionBy("custkey").orderBy("d")
        prev = F.lag("status").over(w)
        pts = (events.withColumn(
                   "chg", F.when(prev.isNull()
                                 | (prev != F.col("status")), 1)
                   .otherwise(0))
               .filter(F.col("chg") == 1))
        nxt = F.lead("d").over(w)
        redone = pts.select(
            "custkey", "status",
            F.date_format("d", "yyyy-MM-dd").alias("valid_from"),
            F.date_format(nxt, "yyyy-MM-dd").alias("valid_to"),
            F.when(nxt.isNull(), 1).otherwise(0).alias("is_current"))
        out = (redone if untouched is None
               else untouched.unionByName(redone))
        out = out.localCheckpoint()
        all_pts.write.mode("overwrite").parquet(pts_dir)
        out.write.mode("overwrite").parquet(out_dir)

    return write_batch


def dedup_keeplist_sink(out_dir: str):
    """foreachBatch EXACT-DEDUP keep-list maintenance — the streaming
    form of relational/llm_ops.dedup_exact for a continuously-ingested
    corpus: each micro-batch of documents (`doc_id` bigint, `text`
    string) folds into a parquet keep-list at `out_dir` with one row
    per normalized-text fingerprint: (fp, keep_doc_id).

    The merge is a pure MIN-fold per fp — min is commutative,
    associative and idempotent, so the sink is RETRY-IDEMPOTENT and
    ORDER-FREE by algebra (no high-water mark, no point-set sidecar:
    any batch arrival order, with any retries, converges to the batch
    face's global min-doc_id keeper — pinned against dedup_exact in
    test_streaming.py). Copy COUNTS are deliberately not maintained:
    a count fold is not idempotent under retries and would need the
    batch-id bookkeeping this sink exists to avoid; count consumers
    run the batch face. The keep-list is fingerprint-sized; the
    rewrite is O(distinct fps), localCheckpoint'ed so the target can
    be source and sink of the same batch. At 100 TB the same shape
    lands on MERGE INTO ... WHEN MATCHED AND s.doc_id < t.keep_doc_id
    THEN UPDATE, keyed and bucketed by fp."""

    def write_batch(batch_df: DataFrame, batch_id: int):
        sp = batch_df.sparkSession
        fp = F.md5(F.lower(F.trim(
            F.regexp_replace("text", r"\s+", " "))))
        new = (batch_df.select(fp.alias("fp"), "doc_id")
               .groupBy("fp")
               .agg(F.min("doc_id").alias("keep_doc_id")))
        cur = _read_if_exists(sp, out_dir)
        merged = new if cur is None else (
            cur.unionByName(new)
            .groupBy("fp").agg(F.min("keep_doc_id").alias("keep_doc_id")))
        merged = merged.localCheckpoint()
        merged.write.mode("overwrite").parquet(out_dir)

    return write_batch


def psi_drift_sink(baseline: DataFrame, out_dir: str):
    """foreachBatch PSI drift monitor — the streaming twin of
    relational/dataprep.dq_psi_drift and the alerting deployment shape
    the batch face's docstring describes: the BASELINE period is
    static (its decile table and bucket counts are computed ONCE at
    sink construction, metadata-sized, frozen with localCheckpoint),
    while CURRENT-period events arrive as micro-batches. Each batch:

      1. buckets its rows against the broadcast decile table and
         reduces them to per-(event_type, bucket) counts — the only
         fact-sized work, one pass over the batch;
      2. appends those counts to `<out_dir>/cur_counts` PARTITIONED BY
         batch_id with dynamic partition overwrite, so a RETRIED batch
         replaces its own partition instead of double-counting (count
         increments are not idempotent by algebra — the partition-per-
         batch layout is what makes the fold retry-safe, the same
         pattern as the repo's raw event sink); batch order is
         irrelevant because integer counts commute — the sink is
         ORDER-FREE as well;
      3. re-folds PSI over the fixed 10-bucket grid from the frozen
         baseline counts plus the summed current counts — grid-sized
         work — and rewrites `<out_dir>/psi` (event_type, n_base,
         n_cur, psi), the table an alerting job thresholds at 0.1/0.25.

    Current rows of event types absent from the baseline drop, exactly
    as in the batch face (no decile grid exists for them). The fold
    reuses dq_psi_drift's own expressions (dataprep.psi_fold et al.),
    so after any batch the psi table is BIT-IDENTICAL to the batch
    face run on baseline + the points streamed so far — pinned in
    test_streaming.py together with retry idempotence and order
    freedom. At 100 TB: cur_counts is (types x 10 x batches) rows —
    metadata-sized forever — and the per-batch cost is one scan of the
    batch; compaction of old batch partitions is a cheap offline fold
    because integer counts merge associatively."""
    from process_nwb_spark.relational.dataprep import (
        psi_bucketize, psi_cent_col, psi_edges, psi_fold, psi_grid)

    cents_base = baseline.select("event_type", psi_cent_col("value"))
    edges = psi_edges(cents_base).localCheckpoint()
    base_counts = (
        psi_grid(edges)
        .join(psi_bucketize(cents_base, edges)
              .groupBy("event_type", "bkt")
              .agg(F.count("*").alias("n")),
              ["event_type", "bkt"], "left")
        .select("event_type", "bkt",
                F.coalesce("n", F.lit(0)).alias("cb"))
        .localCheckpoint())
    cur_dir = out_dir.rstrip("/") + "/cur_counts"
    psi_dir = out_dir.rstrip("/") + "/psi"

    def write_batch(batch_df: DataFrame, batch_id: int):
        sp = batch_df.sparkSession
        cnt = (psi_bucketize(
                   batch_df.select("event_type", psi_cent_col("value")),
                   edges)
               .groupBy("event_type", "bkt")
               .agg(F.count("*").alias("n"))
               .withColumn("batch_id", F.lit(int(batch_id))))
        (cnt.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(cur_dir))
        # guarded read-back: an all-empty first batch (no rows, or every
        # event type absent from the baseline) writes NO partition under
        # cur_dir, so a bare read would fail schema inference and crash
        # the streaming query; with no counts yet, PSI folds over cc=0
        raw = _read_if_exists(sp, cur_dir)
        cur = (None if raw is None else
               raw.groupBy("event_type", "bkt")
               .agg(F.sum("n").alias("cc")))
        if cur is None:
            counts = base_counts.withColumn(
                "cc", F.lit(0).cast("long"))
        else:
            counts = (base_counts.join(cur, ["event_type", "bkt"], "left")
                      .select("event_type", "bkt", "cb",
                              F.coalesce("cc", F.lit(0)).alias("cc")))
        psi = psi_fold(counts).localCheckpoint()
        psi.write.mode("overwrite").parquet(psi_dir)

    return write_batch


def epoch_pack_sink(out_dir: str, capacity: int):
    """foreachBatch TRAINING-STREAM PACKER — the streaming consumer of
    mix_epoch_shuffle's deterministic order and the twin of the batch
    face relational/dataprep.mix_pack_epoch_stream: micro-batches carry
    contiguous per-epoch POSITION RANGES (`epoch` bigint, `position`
    bigint — the shuffle's dense rank, consumed `WHERE position >
    checkpoint` exactly as the shuffle face's resume contract sells —
    `doc_id` bigint, `n_tokens` bigint), and the sink assigns each doc
    its GLOBAL pack id (exclusive running token count within the epoch,
    integer-divided by `capacity`) as if the whole epoch had been
    packed in one pass — bit-identical to the batch face, pinned in
    test_streaming.py.

    State is two integers per epoch (position high-water mark +
    cumulative token count), persisted as batch-id-PARTITIONED
    snapshots under `<out_dir>/state`; packed rows land batch-id-
    partitioned under `<out_dir>/packs` with dynamic overwrite. To
    apply batch b the sink folds state from the LATEST snapshot with
    batch_id < b per epoch, so a VERBATIM RETRY of any batch —
    immediate or delayed after later batches ran — recomputes its
    packs and snapshot bit-identically and overwrites its own
    partitions (retry-idempotent by construction; later batches'
    outputs were derived from the same snapshot chain and stay
    valid). Contract, mirroring stream_alert_hysteresis: NEW batches
    must arrive in increasing (batch_id, position) order per epoch —
    a fresh batch at-or-below the high-water mark raises. The
    per-batch window (cum-sum over position, partitioned by epoch)
    sorts only the micro-batch — O(batch) like every stateful sink
    here; the unbounded per-epoch prefix sum was already paid
    scalably by the batch face's bucketed plan."""
    from pyspark.sql.window import Window

    packs_dir = out_dir.rstrip("/") + "/packs"
    state_dir = out_dir.rstrip("/") + "/state"

    def write_batch(batch_df: DataFrame, batch_id: int):
        sp = batch_df.sparkSession
        bid = int(batch_id)
        snaps = _read_if_exists(sp, state_dir)
        st = None
        if snaps is not None:
            wlast = Window.partitionBy("epoch").orderBy(
                F.desc("batch_id"))
            st = (snaps.filter(F.col("batch_id") < bid)
                  .withColumn("_rn", F.row_number().over(wlast))
                  .filter(F.col("_rn") == 1)
                  .select("epoch", "hwm", "cum")
                  .localCheckpoint())
            n_viol = (batch_df.join(st, "epoch")
                      .filter(F.col("position") <= F.col("hwm")).count())
            if n_viol:
                raise ValueError(
                    f"epoch_pack_sink: batch {bid} has {n_viol} rows at "
                    "or below an epoch's position high-water mark — "
                    "out-of-order landing (retries must reuse their "
                    "original batch_id)")
        w = (Window.partitionBy("epoch").orderBy("position")
             .rowsBetween(Window.unboundedPreceding, 0))
        cum_loc = F.sum("n_tokens").over(w) - F.col("n_tokens")
        base = batch_df if st is None else batch_df.join(st, "epoch",
                                                         "left")
        carry = (F.lit(0).cast("long") if st is None
                 else F.coalesce(F.col("cum"), F.lit(0)))
        packed = base.select(
            "epoch", "position", "doc_id", "n_tokens",
            F.floor((carry + cum_loc) / capacity).cast("long")
            .alias("pack_id")).localCheckpoint()
        new_state = (packed.groupBy("epoch")
                     .agg(F.max("position").alias("hwm"),
                          F.sum("n_tokens").alias("_w")))
        if st is not None:
            new_state = (new_state
                         .join(st.select("epoch",
                                         F.col("cum").alias("_c")),
                               "epoch", "left")
                         .select("epoch", "hwm",
                                 (F.coalesce(F.col("_c"), F.lit(0))
                                  + F.col("_w")).alias("cum")))
        else:
            new_state = new_state.select("epoch", "hwm",
                                         F.col("_w").alias("cum"))
        new_state = (new_state.withColumn("batch_id", F.lit(bid))
                     .localCheckpoint())
        (packed.withColumn("batch_id", F.lit(bid))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(packs_dir))
        (new_state.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(state_dir))

    return write_batch


def lsh_candidates_sink(out_dir: str):
    """foreachBatch INCREMENTAL NEAR-DUP candidate detection — the LSH
    twin of dedup_keeplist_sink's exact dedup, for a continuously
    ingested corpus: each micro-batch of documents (`doc_id` bigint,
    `text` string) bands through the batch face's OWN construction
    (relational/llm_ops.lsh_band_keys — word-3-gram shingles, 8
    md5-salted min-hashes, 4 band keys), lands its band table at
    `<out_dir>/bands` PARTITIONED BY batch_id (dynamic overwrite: a
    retried batch replaces its own partition), probes the accumulated
    index, and writes this batch's candidate pairs to
    `<out_dir>/pairs`, also batch-partitioned.

    ORDER-FREE BY SET ALGEBRA: pair (x, y) is emitted by exactly one
    batch — the one where the LATER of x, y arrives (probe against the
    existing index) or their shared batch (within-batch self-join) —
    so under ANY application order the union of the pairs partitions
    is the same set: precisely minhash_lsh_candidates' pairs over the
    union corpus (pinned in test_streaming.py, with scrambled order
    and a verbatim retry). The probe EXCLUDES the current batch_id's
    own partition, which makes a retry recompute its pair partition
    bit-identically instead of seeing its first attempt's rows as
    'existing'. Probe exclusion alone is NOT enough for a DELAYED
    retry (batch i re-applied after a later batch j): the retried i
    now sees j's bands and would re-emit a cross pair j's in-order
    pass already owns — so candidates are also ANTI-JOINED against
    the pairs already emitted by OTHER partitions before writing,
    keeping every pair in exactly one partition (raw count ==
    distinct count) under any order WITH any retries, immediate or
    delayed (soak-pinned). At 100 TB: bands is the persistent LSH
    index (there, a table bucketed by (band, bkey) so the probe
    co-locates); pairs is pair-set-sized, so the anti-join is an
    equi-join against output, not input; the per-batch cost is
    banding the batch plus two index equi-joins — nothing global
    re-derives, and the index grows by O(batch)."""
    from process_nwb_spark.relational.llm_ops import lsh_band_keys

    bands_dir = out_dir.rstrip("/") + "/bands"
    pairs_dir = out_dir.rstrip("/") + "/pairs"

    def write_batch(batch_df: DataFrame, batch_id: int):
        sp = batch_df.sparkSession
        new = lsh_band_keys(
            batch_df.select("doc_id", "text")).localCheckpoint()
        old = _read_if_exists(sp, bands_dir)
        if old is not None:
            old = old.filter(F.col("batch_id") != int(batch_id))

        n = new.alias("n")
        m = new.alias("m")
        within = (n.join(m, (F.col("n.band") == F.col("m.band"))
                         & (F.col("n.bkey") == F.col("m.bkey"))
                         & (F.col("n.doc_id") < F.col("m.doc_id")))
                  .select(F.col("n.doc_id").alias("doc_a"),
                          F.col("m.doc_id").alias("doc_b")))
        if old is not None:
            o = old.alias("o")
            cross = (n.join(o, (F.col("n.band") == F.col("o.band"))
                            & (F.col("n.bkey") == F.col("o.bkey"))
                            & (F.col("n.doc_id") != F.col("o.doc_id")))
                     .select(F.least("n.doc_id", "o.doc_id").alias("doc_a"),
                             F.greatest("n.doc_id",
                                        "o.doc_id").alias("doc_b")))
            within = within.unionByName(cross)
        cand = within.distinct()
        # delayed-retry guard: drop candidates another partition already
        # owns (a retried batch i applied after batch j would otherwise
        # re-emit the cross pairs j's in-order pass claimed). Excluding
        # the own partition keeps verbatim retries bit-identical.
        prev = _read_if_exists(sp, pairs_dir)
        if prev is not None:
            cand = cand.join(
                prev.filter(F.col("batch_id") != int(batch_id))
                .select("doc_a", "doc_b"),
                ["doc_a", "doc_b"], "left_anti")
        pairs = (cand.withColumn("batch_id", F.lit(int(batch_id)))
                 .localCheckpoint())

        (new.withColumn("batch_id", F.lit(int(batch_id)))
         .write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(bands_dir))
        (pairs.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(pairs_dir))

    return write_batch


def contamination_sink(test_docs: DataFrame, out_dir: str):
    """foreachBatch DECONTAMINATION AUDIT — the streaming twin of
    relational/dataprep.split_contamination and the deployment shape a
    continuously-crawled corpus needs: the HELD-OUT side is static (its
    word-3-gram shingle table and per-doc totals are computed once at
    sink construction and frozen with localCheckpoint), while TRAIN
    documents arrive as micro-batches. Each batch:

      1. shingles the batch with the SAME doc_shingles construction the
         batch face uses (factored in relational/llm_ops so the twin
         cannot drift), semi-joins the static test shingles against the
         batch's distinct shingles — matched (doc_id, sh) pairs;
      2. anti-joins those hits against the pairs already owned by OTHER
         batch partitions, then writes its own partition of
         `<out_dir>/matched` with dynamic partition overwrite: every
         matched pair lives in exactly ONE partition (raw count ==
         distinct count), a verbatim retry — immediate or delayed —
         rewrites its partition bit-identically, and batch order is
         irrelevant because the union is a set (the lsh_candidates_sink
         algebra, reused);
      3. refolds the audit: distinct matched pairs -> per-test-doc
         n_shared, left-joined onto the frozen per-doc totals (docs with
         no hit yet report 0), and rewrites `<out_dir>/contamination`
         (doc_id, n_shingles, n_shared, contamination) — after any batch
         this table is BIT-IDENTICAL to split_contamination run on the
         test split plus every train doc streamed so far (pinned in
         test_streaming.py with scrambled order + delayed retries).

    An all-empty first batch writes no matched partition; the guarded
    read-back (_read_if_exists) then reports all-zero contamination
    instead of crashing on schema inference. At 100 TB: the test side is
    the SMALL side by construction (a held-out benchmark set), so the
    semi-join broadcasts it; `matched` is bounded by the test shingle
    count FOREVER (set semantics — re-matched shingles are anti-joined
    away); per-batch cost is shingling the batch plus two equi-joins
    against test-sized tables. Nothing global ever re-derives."""
    from process_nwb_spark.relational.llm_ops import doc_shingles

    test_sh = (doc_shingles(test_docs.select("doc_id", "text"))
               .localCheckpoint())
    totals = (test_sh.groupBy("doc_id")
              .agg(F.count("*").cast("int").alias("n_shingles"))
              .localCheckpoint())
    matched_dir = out_dir.rstrip("/") + "/matched"
    contam_dir = out_dir.rstrip("/") + "/contamination"

    def write_batch(batch_df: DataFrame, batch_id: int):
        sp = batch_df.sparkSession
        batch_sh = (doc_shingles(batch_df.select("doc_id", "text"))
                    .select("sh").distinct())
        hits = (test_sh.join(batch_sh, "sh", "left_semi")
                .select("doc_id", "sh"))
        prev = _read_if_exists(sp, matched_dir)
        if prev is not None:
            hits = hits.join(
                prev.filter(F.col("batch_id") != int(batch_id))
                .select("doc_id", "sh"),
                ["doc_id", "sh"], "left_anti")
        hits = (hits.withColumn("batch_id", F.lit(int(batch_id)))
                .localCheckpoint())
        (hits.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(matched_dir))

        cur = _read_if_exists(sp, matched_dir)
        if cur is None:
            rep = totals.select(
                "doc_id", "n_shingles",
                F.lit(0).cast("int").alias("n_shared"))
        else:
            shared = (cur.groupBy("doc_id")
                      .agg(F.count("*").cast("int").alias("n_shared")))
            rep = (totals.join(shared, "doc_id", "left")
                   .select("doc_id", "n_shingles",
                           F.coalesce("n_shared", F.lit(0)).cast("int")
                           .alias("n_shared")))
        rep = rep.withColumn(
            "contamination",
            F.round(F.col("n_shared") / F.col("n_shingles").cast("double"),
                    4)).localCheckpoint()
        rep.write.mode("overwrite").parquet(contam_dir)

    return write_batch


def doremi_weights_sink(out_dir: str):
    """foreachBatch INCREMENTAL DOMAIN REWEIGHTING — the streaming twin
    of relational/dataprep.mix_doremi_weights: maintain the DoReMi
    domain weights live as document micro-batches arrive, so a
    continuously-ingesting corpus always carries a current mixture
    prescription without re-scanning history.

    Each batch (doc_id, source, text rows):
      1. reduces to the per-source BIGINT rollup via the batch face's
         own doremi_domain_counts (n_docs, n_tokens, and per-doc
         distinct tokens summed — ADDITIVE across batches, which a
         corpus-level distinct would not be; that additivity is the
         whole design) — the only fact-sized work, one pass;
      2. appends the rollup to `<out_dir>/src_counts` PARTITIONED BY
         batch_id with dynamic partition overwrite — a RETRIED batch
         replaces its own partition (idempotent), and batch ORDER is
         irrelevant because integer sums commute;
      3. re-folds the weights over the summed counts with the batch
         face's own doremi_fold and rewrites `<out_dir>/weights`
         (source, n_docs, n_tokens, token_share, excess_loss,
         doremi_weight) — domains-sized work.

    Sharing doremi_domain_counts + doremi_fold verbatim means the
    weights table after any prefix of batches is BIT-IDENTICAL to the
    batch face run on the documents streamed so far — pinned in
    test_streaming.py with retry + scrambled-order + empty-first-batch
    cases and in the test_stream_soak.py random-cut soak. At 100 TB:
    src_counts grows one |domains|-row partition per batch (metadata-
    sized forever), the per-batch cost is one scan of the batch, and
    old partitions compact offline because the counts merge
    associatively."""
    from process_nwb_spark.relational.dataprep import (
        doremi_domain_counts, doremi_fold)

    cnt_dir = out_dir.rstrip("/") + "/src_counts"
    w_dir = out_dir.rstrip("/") + "/weights"

    def write_batch(batch_df: DataFrame, batch_id: int):
        sp = batch_df.sparkSession
        cnt = (doremi_domain_counts(batch_df)
               .withColumn("batch_id", F.lit(int(batch_id))))
        (cnt.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(cnt_dir))
        # guarded read-back: an all-empty first batch writes NO
        # partition, so fall back to an empty rollup (weights table
        # stays absent until data arrives — there is no meaningful
        # 0-domain weight row to emit)
        raw = _read_if_exists(sp, cnt_dir)
        if raw is None:
            return
        tok = (raw.groupBy("source")
               .agg(F.sum("n_docs").cast("bigint").alias("n_docs"),
                    F.sum("n_tokens").cast("bigint").alias("n_tokens"),
                    F.sum("n_dist").cast("bigint").alias("n_dist")))
        if not tok.head(1):
            return
        w = doremi_fold(tok).localCheckpoint()
        w.write.mode("overwrite").parquet(w_dir)

    return write_batch


def survival_curve_sink(out_dir: str):
    """foreachBatch INCREMENTAL QUALITY-SURVIVAL CURVE — the streaming
    twin of relational/llm_ops.quality_survival_curve: keep the
    gate-planning sweep (docs/tokens surviving each quality cut) live
    as document micro-batches arrive, so the decision table a corpus
    owner thresholds on is always current without rescanning history.

    Same incremental-count design as doremi_weights_sink (the two
    sinks and their batch faces share one additivity argument):
      1. each batch reduces to the 11-row score-bucket rollup via the
         batch face's own survival_bucket_rollup — BIGINT counts,
         additive across batches; the only fact-sized work;
      2. the rollup appends to `<out_dir>/bkt_counts` PARTITIONED BY
         batch_id (retried batch overwrites its own partition; order
         irrelevant, integer sums commute);
      3. the threshold sweep re-folds over the summed buckets with the
         batch face's own survival_fold and rewrites
         `<out_dir>/curve` — grid x bucket work.

    Bit-identical to quality_survival_curve on any streamed prefix
    (pinned in test_streaming.py; random-cut soak in
    test_stream_soak.py). At 100 TB: bkt_counts grows <= 11 rows per
    batch, per-batch cost is one scan of the batch."""
    from process_nwb_spark.relational.llm_ops import (
        survival_bucket_rollup, survival_fold)

    cnt_dir = out_dir.rstrip("/") + "/bkt_counts"
    curve_dir = out_dir.rstrip("/") + "/curve"

    def write_batch(batch_df: DataFrame, batch_id: int):
        sp = batch_df.sparkSession
        cnt = (survival_bucket_rollup(batch_df)
               .withColumn("batch_id", F.lit(int(batch_id))))
        (cnt.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(cnt_dir))
        raw = _read_if_exists(sp, cnt_dir)
        if raw is None:
            return
        bkt = (raw.groupBy("b")
               .agg(F.sum("nd").cast("bigint").alias("nd"),
                    F.sum("nt").cast("bigint").alias("nt")))
        if not bkt.head(1):
            return
        curve = survival_fold(bkt).localCheckpoint()
        curve.write.mode("overwrite").parquet(curve_dir)

    return write_batch


def cluster_stats_sink(out_dir: str):
    """foreachBatch DUPLICATE-CLUSTER HISTOGRAM — the incremental twin
    of relational/llm_ops.dedup_cluster_stats, and the counted
    complement of dedup_keeplist_sink (whose docstring deliberately
    excludes counts because a bare count fold is not retry-idempotent):
    counts ARE maintainable retry-safely with the batch-id-partition
    pattern the PSI/DoReMi/survival sinks share —
      1. each batch reduces to per-fingerprint BIGINT copy counts (the
         dedup_exact normalize->md5 fingerprint) — additive across
         batches since each doc is counted once in its own batch;
      2. counts append to `<out_dir>/fp_counts` PARTITIONED BY
         batch_id (retried batch overwrites its own partition; order
         irrelevant, sums commute);
      3. cluster sizes re-fold as SUM per fp, and the histogram
         (cluster_size, n_clusters, n_docs, n_redundant, doc_share)
         rewrites `<out_dir>/stats` — the second agg runs on the
         NDV-sized fingerprint table, exactly like the batch face.
    Bit-identical to dedup_cluster_stats on any streamed prefix
    (pinned in test_streaming.py). State is per-batch DISTINCT
    fingerprints — the same storage class as the keep-list itself; at
    100 TB old partitions compact offline because counts merge
    associatively."""
    cnt_dir = out_dir.rstrip("/") + "/fp_counts"
    stats_dir = out_dir.rstrip("/") + "/stats"

    def write_batch(batch_df: DataFrame, batch_id: int):
        sp = batch_df.sparkSession
        fp = F.md5(F.lower(F.trim(
            F.regexp_replace("text", r"\s+", " "))))
        cnt = (batch_df.select(fp.alias("fp"))
               .groupBy("fp").agg(F.count("*").cast("bigint").alias("k"))
               .withColumn("batch_id", F.lit(int(batch_id))))
        (cnt.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(cnt_dir))
        raw = _read_if_exists(sp, cnt_dir)
        if raw is None:
            return
        from process_nwb_spark.relational.llm_ops import (
            cluster_histogram)

        cl = (raw.groupBy("fp")
              .agg(F.sum("k").cast("bigint").alias("k")))
        if not cl.head(1):
            return
        stats = cluster_histogram(cl).localCheckpoint()
        stats.write.mode("overwrite").parquet(stats_dir)

    return write_batch


def gopher_stats_sink(out_dir: str):
    """foreachBatch INCREMENTAL GOPHER-GATE ATTRIBUTION — the streaming
    twin of relational/llm_ops.quality_rule_stats: keep the per-rule
    failure-share report live as document micro-batches arrive, so a
    continuously-ingesting corpus always shows which rule is doing the
    filtering without rescanning history.

    Same incremental-count design as the DoReMi/survival/cluster
    sinks (one shared additivity argument):
      1. each batch reduces to the 1-row BIGINT failure-count rollup
         via the batch face's own gopher_rule_counts (empty batches
         coalesce to all-zero rows — the additive identity) — the only
         fact-sized work, one scan of the batch;
      2. the rollup appends to `<out_dir>/rule_counts` PARTITIONED BY
         batch_id with dynamic overwrite (a retried batch replaces its
         own partition; order irrelevant, integer sums commute);
      3. the shares re-fold over the summed counts with the batch
         face's own gopher_stats_fold and rewrite `<out_dir>/stats` —
         1-row work.

    Sharing gopher_doc_flags -> gopher_rule_counts -> gopher_stats_fold
    verbatim makes the stats table after any prefix of batches
    BIT-IDENTICAL to quality_rule_stats run on the documents streamed
    so far (random-cut + retry soak in test_stream_soak.py). At
    100 TB: rule_counts grows ONE row per batch, forever
    metadata-sized; old partitions compact offline because the counts
    merge associatively."""
    from process_nwb_spark.relational.llm_ops import (
        gopher_rule_counts, gopher_stats_fold)

    cnt_dir = out_dir.rstrip("/") + "/rule_counts"
    stats_dir = out_dir.rstrip("/") + "/stats"

    def write_batch(batch_df: DataFrame, batch_id: int):
        sp = batch_df.sparkSession
        cnt = (gopher_rule_counts(batch_df)
               .withColumn("batch_id", F.lit(int(batch_id))))
        (cnt.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(cnt_dir))
        raw = _read_if_exists(sp, cnt_dir)
        if raw is None:
            return
        summed = raw.agg(
            *[F.coalesce(F.sum(c), F.lit(0)).cast("bigint").alias(c)
              for c in ("n_docs", "fail_word_count", "fail_mean_word_len",
                        "fail_symbol_ratio", "fail_stopwords",
                        "fail_dup_words", "n_pass")])
        stats = gopher_stats_fold(summed).localCheckpoint()
        stats.write.mode("overwrite").parquet(stats_dir)

    return write_batch


def lm_model_sink(out_dir: str):
    """foreachBatch INCREMENTAL BIGRAM-LM MAINTENANCE — the streaming
    twin of relational/llm_ops.corpus_crossentropy_matrix: keep the
    per-source bigram language models AND the cross-source
    cross-entropy matrix live as document micro-batches arrive, so a
    continuously-ingesting corpus always shows its domain-similarity
    map without rescanning history.

    The additivity argument is the count table's: (source, w1, w2)
    bigram counts are integer sums, and the batch face's ENTIRE output
    derives from that one table (crossentropy_matrix_fold computes the
    head counts, the smoothing vocabulary V and the source list from
    it) — so maintaining the counts maintains the matrix:

      1. each batch reduces to its own count table via the batch
         face's source_bigram_counts (one scan of the batch; the only
         fact-sized work); an empty batch contributes no rows — the
         additive identity — and is skipped without writing;
      2. the batch counts append to `<out_dir>/pair_counts`
         PARTITIONED BY batch_id with dynamic overwrite (a retried
         batch replaces its own partition; order irrelevant, integer
         sums commute);
      3. the model re-sums to `<out_dir>/model` (vocabulary-sized) and
         the matrix re-folds through crossentropy_matrix_fold to
         `<out_dir>/matrix` (|sources|^2 rows).

    Sharing source_bigram_counts -> crossentropy_matrix_fold verbatim
    makes the matrix after any prefix of batches equal to
    corpus_crossentropy_matrix run on the documents streamed so far
    (random-cut + retry soak in test_stream_soak.py). At 100 TB:
    pair_counts grows with each batch's NOVEL bigram vocabulary, not
    its token count, and old partitions compact offline because the
    counts merge associatively; the per-batch refold cost is the
    vocabulary-sized fold, never a history rescan."""
    from process_nwb_spark.relational.llm_ops import (
        crossentropy_matrix_fold, source_bigram_counts)

    cnt_dir = out_dir.rstrip("/") + "/pair_counts"
    model_dir = out_dir.rstrip("/") + "/model"
    matrix_dir = out_dir.rstrip("/") + "/matrix"

    def write_batch(batch_df: DataFrame, batch_id: int):
        sp = batch_df.sparkSession
        # materialize ONCE (eager localCheckpoint, like the sink's other
        # materializations): the isEmpty probe below is a separate
        # action, and without this it would recompute the batch's full
        # scan + bigram shuffle a second time for the write
        cnt = (source_bigram_counts(batch_df)
               .withColumn("batch_id", F.lit(int(batch_id)))
               .localCheckpoint())
        if cnt.isEmpty():
            # empty batch = the additive identity; nothing to replace
            # even on retry (a non-empty original can't replay empty —
            # foreachBatch retries are verbatim)
            return
        (cnt.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(cnt_dir))
        raw = _read_if_exists(sp, cnt_dir)
        if raw is None:
            return
        model = (raw.groupBy("source", "w1", "w2")
                 .agg(F.sum("c2").cast("bigint").alias("c2"))
                 .localCheckpoint())
        model.write.mode("overwrite").parquet(model_dir)
        matrix = crossentropy_matrix_fold(
            sp.read.parquet(model_dir)).localCheckpoint()
        matrix.write.mode("overwrite").parquet(matrix_dir)

    return write_batch


def oov_rate_sink(out_dir: str):
    """foreachBatch INCREMENTAL OOV-RATE MAINTENANCE — the streaming
    twin of relational/llm_ops.tokenizer_oov_rate: keep the per-source
    out-of-vocabulary report live as document micro-batches arrive,
    without rescanning history. Same design as lm_model_sink, same
    additivity argument one level down: the (source, word) count table
    is integer sums (source_word_counts), and the batch face's ENTIRE
    output — including the top-N vocabulary, which is NOT itself
    additive (a word can enter or leave the top-N as batches arrive) —
    derives from that one table through oov_rate_fold. So maintaining
    the counts maintains the report:

      1. each batch reduces to its own count table (one scan of the
         batch — the only fact-sized work), materialized ONCE (eager
         localCheckpoint) so the empty-batch probe does not recompute
         it; an empty batch is the additive identity and is skipped;
      2. batch counts append to `<out_dir>/word_counts` PARTITIONED BY
         batch_id with dynamic overwrite (a retried batch replaces its
         own partition; integer sums commute);
      3. the counts re-sum to `<out_dir>/counts` (vocabulary-sized per
         source) and the report re-folds through oov_rate_fold to
         `<out_dir>/oov` (|sources| rows).

    Sharing source_word_counts -> oov_rate_fold verbatim makes the
    report after any prefix of batches equal to tokenizer_oov_rate on
    the documents streamed so far (random-cut + retry soak in
    test_stream_soak.py). At 100 TB: word_counts grows with each
    batch's NOVEL vocabulary, not its token count; the per-batch refold
    cost is vocabulary-sized (the fold reads the re-summed counts, not
    the batch_id-partitioned history — same plan contract the lm sink
    pins)."""
    from process_nwb_spark.relational.llm_ops import (
        oov_rate_fold, source_word_counts)

    wc_dir = out_dir.rstrip("/") + "/word_counts"
    counts_dir = out_dir.rstrip("/") + "/counts"
    oov_dir = out_dir.rstrip("/") + "/oov"

    def write_batch(batch_df: DataFrame, batch_id: int):
        sp = batch_df.sparkSession
        cnt = (source_word_counts(batch_df)
               .withColumn("batch_id", F.lit(int(batch_id)))
               .localCheckpoint())
        if cnt.isEmpty():
            return
        (cnt.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(wc_dir))
        raw = _read_if_exists(sp, wc_dir)
        if raw is None:
            return
        summed = (raw.groupBy("source", "w")
                  .agg(F.sum("c").cast("bigint").alias("c"))
                  .localCheckpoint())
        summed.write.mode("overwrite").parquet(counts_dir)
        oov = oov_rate_fold(sp.read.parquet(counts_dir)).localCheckpoint()
        oov.write.mode("overwrite").parquet(oov_dir)

    return write_batch


def cluster_cap_sink(out_dir: str):
    """foreachBatch BOUNDED-DUPLICATION keep maintenance — the
    streaming twin of relational/llm_ops.dedup_cluster_cap: keep the
    up-to-K-copies-per-exact-cluster decision live as document
    micro-batches arrive. Two state tables, each with the right
    retry algebra for its fold:

      * `<out_dir>/keep_set` — at most K (doc_id) per fingerprint,
        maintained by a BOUNDED TOP-K-MIN fold: union the stored set
        with the batch's per-fp K smallest doc_ids, DISTINCT (so a
        verbatim retry re-adds the same pairs and changes nothing),
        re-rank, keep K. min-K-set union is commutative, associative
        and idempotent — dedup_keeplist_sink's semilattice argument
        generalized from K=1 — so ANY batch order with ANY retries
        converges; a later batch carrying a smaller doc_id DEMOTES an
        earlier keeper (rank shifts are re-derived each fold, pinned
        by the adversarial-order soak case). State is fingerprint-
        sized x K, never corpus-sized.
      * `<out_dir>/fp_counts` — per-batch (fp, n) copy counts
        PARTITIONED BY batch_id with dynamic overwrite (counts are not
        idempotent by algebra; the partition-per-batch layout makes
        the fold retry-safe — cluster_stats_sink's pattern); cluster
        sizes re-sum from it.

    `<out_dir>/kept` is the converged decision: keep_set joined with
    the summed sizes — row-for-row equal to dedup_cluster_cap's
    kept == 1 rows on the documents streamed so far (soak-pinned).
    Non-kept rows are deliberately not materialized: a doc's kept bit
    can flip as smaller doc_ids arrive, so only the (bounded) keep
    set is stable state; full-corpus rank consumers run the batch
    face."""
    from pyspark.sql.window import Window

    from process_nwb_spark.relational.llm_ops import _CLUSTER_CAP

    keep_dir = out_dir.rstrip("/") + "/keep_set"
    counts_dir = out_dir.rstrip("/") + "/fp_counts"
    kept_dir = out_dir.rstrip("/") + "/kept"

    def write_batch(batch_df: DataFrame, batch_id: int):
        sp = batch_df.sparkSession
        fp = F.md5(F.lower(F.trim(
            F.regexp_replace("text", r"\s+", " "))))
        b = batch_df.select(fp.alias("fp"), "doc_id").localCheckpoint()
        if b.isEmpty():
            return
        cnt = (b.groupBy("fp")
               .agg(F.count("*").cast("bigint").alias("n"))
               .withColumn("batch_id", F.lit(int(batch_id))))
        (cnt.write.mode("overwrite")
         .option("partitionOverwriteMode", "dynamic")
         .partitionBy("batch_id").parquet(counts_dir))
        w = Window.partitionBy("fp").orderBy("doc_id")
        cand = (b.withColumn("r", F.row_number().over(w))
                .filter(F.col("r") <= _CLUSTER_CAP)
                .select("fp", "doc_id"))
        cur = _read_if_exists(sp, keep_dir)
        pool = cand if cur is None else \
            cur.select("fp", "doc_id").unionByName(cand)
        merged = (pool.distinct()
                  .withColumn("copy_rank",
                              F.row_number().over(w).cast("bigint"))
                  .filter(F.col("copy_rank") <= _CLUSTER_CAP)
                  .localCheckpoint())
        merged.write.mode("overwrite").parquet(keep_dir)
        raw = _read_if_exists(sp, counts_dir)
        if raw is None:
            return
        sizes = (raw.groupBy("fp")
                 .agg(F.sum("n").cast("bigint").alias("cluster_size")))
        kept = (merged.join(sizes, "fp")
                .select("doc_id", "fp", "cluster_size", "copy_rank",
                        F.lit(1).cast("int").alias("kept"))
                .localCheckpoint())
        kept.write.mode("overwrite").parquet(kept_dir)

    return write_batch


def split_contamination_sink(out_dir: str):
    """foreachBatch INCREMENTAL DECONTAMINATION AUDIT with BOTH sides
    streamed — the second streaming twin of relational/dataprep.
    split_contamination, for the deployment contamination_sink (above)
    cannot serve: there, the held-out set is STATIC and frozen at sink
    construction; here every micro-batch may carry train AND test
    documents (the split recomputed inline from doc_id via _with_split,
    exactly like the batch face), so a test document that arrives
    AFTER train batches already contained its shingles still gets its
    report, retroactively correct. Two state tables, both SETS
    maintained by union + DISTINCT — idempotent, commutative,
    associative (cluster_cap_sink's semilattice argument), so ANY batch
    order with ANY verbatim retries converges:

      * `<out_dir>/train_sh` — distinct TRAIN shingle values seen so
        far (split derived purely from doc_id via _with_split, exactly
        like the batch face — no split-assignment join);
      * `<out_dir>/test_sh` — distinct (doc_id, sh) pairs of TEST
        documents seen so far.

    `<out_dir>/report` refolds through contamination_fold (shared
    verbatim with the batch face), so after any prefix of batches the
    report equals split_contamination on the documents streamed so far
    (random-cut + retry soak in test_stream_soak.py). Matched pairs are
    deliberately NOT kept as additive state: a test doc's contamination
    RISES retroactively when a later train batch first contains one of
    its shingles (pinned as data in the soak file), so only the two
    monotone shingle sets are stable state and the join is re-derived
    each fold. At 100 TB: the refold joins the full test set (the
    benchmark-sized side — small by construction) against the train
    shingle set on the pre-deduped shingle key; the train-set rewrite
    is shingle-set-sized per batch — the oov sink's counts-rewrite
    class — and a production layout would partition it by shingle
    prefix so a batch rewrites only touched partitions."""
    from process_nwb_spark.relational.dataprep import (
        _with_split, contamination_fold)
    from process_nwb_spark.relational.llm_ops import doc_shingles

    train_dir = out_dir.rstrip("/") + "/train_sh"
    test_dir = out_dir.rstrip("/") + "/test_sh"
    rep_dir = out_dir.rstrip("/") + "/report"

    def write_batch(batch_df: DataFrame, batch_id: int):
        sp = batch_df.sparkSession
        sh = (_with_split(
            doc_shingles(batch_df.select("doc_id", "text")))
            .localCheckpoint())
        if sh.isEmpty():
            return   # no shingles (empty batch / all-short docs) =
            # the identity of both set folds
        btr = (sh.filter(F.col("split") == "train")
               .select("sh").distinct())
        bte = (sh.filter(F.col("split") == "test")
               .select("doc_id", "sh"))
        cur_tr = _read_if_exists(sp, train_dir)
        tr = btr if cur_tr is None else \
            cur_tr.select("sh").unionByName(btr).distinct()
        tr = tr.localCheckpoint()
        tr.write.mode("overwrite").parquet(train_dir)
        cur_te = _read_if_exists(sp, test_dir)
        te = bte if cur_te is None else \
            cur_te.select("doc_id", "sh").unionByName(bte).distinct()
        te = te.localCheckpoint()
        te.write.mode("overwrite").parquet(test_dir)
        rep = contamination_fold(te, tr).localCheckpoint()
        rep.write.mode("overwrite").parquet(rep_dir)

    return write_batch
