"""Event-time windowing on `events` — the batch-checkable face of the
streaming tier (process_nwb_spark/streaming has the readStream versions;
these run the same operators in batch so DuckDB can replay them).

Window-origin note: Spark tumbling windows align to the 1970 epoch, DuckDB
time_bucket to 2000-01-01; both are midnight-aligned so any window width
dividing 24 h bucketizes identically.
"""
from __future__ import annotations

from pyspark.sql import functions as F
from pyspark.sql.window import Window

from .core import T, query, dim_broadcast

_TS_FMT = "yyyy-MM-dd HH:mm:ss"


@query(
    "win_tumbling",
    """
    SELECT STRFTIME(TIME_BUCKET(INTERVAL '5 minutes', ts),
                    '%Y-%m-%d %H:%M:%S') AS window_start,
           event_type, COUNT(*) AS n,
           ROUND(SUM(CAST(value AS DOUBLE)), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    doc="tumbling event-time window (F.window 5 min) + agg; streaming twin "
        "uses withWatermark + the same window expression",
)
def win_tumbling(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(F.count("*").alias("n"),
             F.round(F.sum(F.col("value").cast("double")), 2).alias("total_value"))
        .select(F.date_format("w.start", _TS_FMT).alias("window_start"),
                "event_type", "n", "total_value")
    )


@query(
    "win_sliding",
    """
    WITH buckets AS (
      SELECT TIME_BUCKET(INTERVAL '5 minutes', ts) AS ws, * FROM events
      UNION ALL
      SELECT TIME_BUCKET(INTERVAL '5 minutes', ts) - INTERVAL '5 minutes' AS ws, *
      FROM events
    )
    SELECT STRFTIME(ws, '%Y-%m-%d %H:%M:%S') AS window_start,
           COUNT(*) AS n,
           ROUND(SUM(CAST(value AS DOUBLE)), 2) AS total_value
    FROM buckets
    GROUP BY ws
    """,
    doc="sliding window (10 min length, 5 min slide): every event lands in "
        "two windows; oracle materializes both bucket assignments",
)
def win_sliding(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n"),
             # sum, not avg: 2-decimal inputs sum exactly in doubles, while a
             # rounded avg can land on a half-case and flip between engines
             F.round(F.sum(F.col("value").cast("double")), 2).alias("total_value"))
        .select(F.date_format("w.start", _TS_FMT).alias("window_start"),
                "n", "total_value")
    )


@query(
    "win_session",
    """
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       IS NULL
                  OR ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                       >= INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM events
    ),
    sessions AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id,
           STRFTIME(MIN(ts), '%Y-%m-%d %H:%M:%S') AS session_start,
           COUNT(*) AS n_events
    FROM sessions
    GROUP BY user_id, session_no
    """,
    doc="session windows (30 min gap) per user; oracle is the "
        "gaps-and-islands formulation of F.session_window",
)
def win_session(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    return (
        e.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select("user_id",
                F.date_format("w.start", _TS_FMT).alias("session_start"),
                "n_events")
    )


@query(
    "stream_dedup_first",
    """
    WITH ranked AS (
      SELECT user_id, event_type, event_id, ts,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts, event_id) AS rn
      FROM events
    )
    SELECT user_id, event_type, event_id AS first_event_id,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS first_ts
    FROM ranked WHERE rn = 1
    """,
    doc="stateful dedup semantics (dropDuplicates within watermark) made "
        "deterministic: keep the earliest event per (user_id, event_type)",
)
def stream_dedup_first(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type",
                F.col("event_id").alias("first_event_id"),
                F.date_format("ts", _TS_FMT).alias("first_ts"))
    )


@query(
    "stream_static_join",
    """
    SELECT e.event_id, e.event_type, c.c_name, c.c_mktsegment
    FROM events e
    JOIN customer c ON e.user_id = c.c_custkey
    WHERE e.event_type = 'purchase'
    """,
    doc="stream-static enrichment join (events stream x broadcast customer "
        "dim); batch-checkable twin of the streaming version",
)
def stream_static_join(spark, sf_dir):
    e = T(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    c = T(spark, sf_dir, "customer")
    return e.join(dim_broadcast(c, sf_dir, "customer"), e.user_id == c.c_custkey).select(
        "event_id", "event_type", "c_name", "c_mktsegment")


@query(
    "stream_stream_join",
    """
    SELECT c.event_id AS click_id, e.event_id AS error_id, c.user_id,
           STRFTIME(c.ts, '%Y-%m-%d %H:%M:%S') AS click_time,
           STRFTIME(e.ts, '%Y-%m-%d %H:%M:%S') AS error_time
    FROM events c
    JOIN events e
      ON c.user_id = e.user_id
     AND c.event_type = 'click' AND e.event_type = 'error'
     AND e.ts >= c.ts AND e.ts <= c.ts + INTERVAL 10 MINUTE
    """,
    doc="batch twin of the stream-stream join (streaming/ops.py "
        "join_clicks_to_errors): clicks matched to same-user errors within "
        "10 min. In batch this is a range join whose equi half (user_id) "
        "carries the shuffle; in streaming the watermark pair + time bound "
        "bounds the join state. test_streaming.py asserts stream == batch",
)
def stream_stream_join(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    c = (ev.filter(F.col("event_type") == "click")
         .select(F.col("event_id").alias("click_id"),
                 F.col("ts").alias("click_ts"), "user_id"))
    e = (ev.filter(F.col("event_type") == "error")
         .select(F.col("event_id").alias("error_id"),
                 F.col("ts").alias("error_ts"),
                 F.col("user_id").alias("e_user_id")))
    return (c.join(
        e,
        F.expr("""user_id = e_user_id
                  AND error_ts >= click_ts
                  AND error_ts <= click_ts + INTERVAL 10 MINUTES"""))
        .select("click_id", "error_id", "user_id",
                F.date_format("click_ts", _TS_FMT).alias("click_time"),
                F.date_format("error_ts", _TS_FMT).alias("error_time")))


@query(
    "win_gap_fill",
    """
    SELECT event_id, user_id,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           ROUND(LAST_VALUE(
                     CASE WHEN event_type = 'purchase' THEN value END
                     IGNORE NULLS)
                 OVER (PARTITION BY user_id ORDER BY ts, event_id
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
                 2) AS last_purchase_value
    FROM events
    """,
    doc="gap-fill / forward-fill: carry each user's most recent purchase "
        "value forward over their event timeline (LAST_VALUE ... IGNORE "
        "NULLS over a running frame). THE telemetry down-fill idiom: one "
        "keyed window shuffle, running state is a single value per "
        "partition — no self-join, no as-of lookup per row",
)
def win_gap_fill(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    purchase_val = F.when(F.col("event_type") == "purchase", F.col("value"))
    return e.select(
        "event_id", "user_id",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        F.round(F.last(purchase_val, ignorenulls=True).over(w), 2)
        .alias("last_purchase_value"),
    )


@query(
    "ts_linear_interp",
    """
    WITH pts AS (
        SELECT user_id, ts, AVG(value) AS val FROM events GROUP BY 1, 2
    ),
    grid AS (
        SELECT u.user_id, g.gts
        FROM (SELECT DISTINCT user_id FROM events) u
        CROSS JOIN (SELECT UNNEST(generate_series(
                        TIMESTAMP '2024-01-01', TIMESTAMP '2024-01-31',
                        INTERVAL 6 HOUR)) AS gts) g
    ),
    unioned AS (
        SELECT user_id, ts, val, 0 AS is_grid FROM pts
        UNION ALL
        SELECT user_id, gts AS ts, NULL AS val, 1 AS is_grid FROM grid
    ),
    w AS (
        SELECT user_id, ts, is_grid,
           LAST_VALUE(val IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts, is_grid
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
           FIRST_VALUE(val IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts, is_grid
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
           LAST_VALUE(CASE WHEN val IS NOT NULL THEN epoch_us(ts) END
                      IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts, is_grid
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pt,
           FIRST_VALUE(CASE WHEN val IS NOT NULL THEN epoch_us(ts) END
                       IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts, is_grid
                ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nt
        FROM unioned
    )
    SELECT user_id, STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS grid_ts,
           ROUND(CASE WHEN pt = nt THEN pv
                      ELSE pv + (nv - pv) *
                           (CAST(epoch_us(ts) - pt AS DOUBLE) /
                            CAST(nt - pt AS DOUBLE)) END, 2) AS value_interp
    FROM w WHERE is_grid = 1
    """,
    doc="time-series regularization: resample each user's irregular event "
        "series onto a fixed 6-hour grid with LINEAR interpolation between "
        "the surrounding observations (NULL outside the observed range). "
        "Grid rows union into the point stream, then forward/backward "
        "IGNORE-NULLS window scans pick the bracketing points — all four "
        "scans share ONE user_id shuffle+sort (same partitioning/ordering), "
        "no per-grid-point as-of join. The grid side is sequence()+explode "
        "over the distinct-user dim: per-user grid size is bounded by the "
        "time span, never by event count, so the plan survives 100 TB of "
        "events unchanged",
)
def ts_linear_interp(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    pts = (e.groupBy("user_id", "ts").agg(F.avg("value").alias("val"))
           .withColumn("is_grid", F.lit(0)))
    grid = (e.select("user_id").distinct()
            .select("user_id",
                    F.explode(F.sequence(
                        F.lit("2024-01-01 00:00:00").cast("timestamp"),
                        F.lit("2024-01-31 00:00:00").cast("timestamp"),
                        F.expr("INTERVAL 6 HOURS"))).alias("ts"),
                    F.lit(None).cast("double").alias("val"),
                    F.lit(1).alias("is_grid")))
    unioned = pts.select("user_id", "ts", "val", "is_grid").unionByName(grid)

    order = [F.col("ts"), F.col("is_grid")]
    wp = (Window.partitionBy("user_id").orderBy(*order)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wn = (Window.partitionBy("user_id").orderBy(*order)
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    obs_t = F.when(F.col("val").isNotNull(), F.unix_micros("ts"))
    pv = F.last("val", ignorenulls=True).over(wp)
    nv = F.first("val", ignorenulls=True).over(wn)
    pt = F.last(obs_t, ignorenulls=True).over(wp)
    nt = F.first(obs_t, ignorenulls=True).over(wn)
    frac = (F.unix_micros("ts") - pt).cast("double") / (nt - pt).cast("double")
    interp = F.when(pt == nt, pv).otherwise(pv + (nv - pv) * frac)
    return (unioned
            .select("user_id", "ts", "is_grid",
                    F.round(interp, 2).alias("value_interp"))
            .filter(F.col("is_grid") == 1)
            .select("user_id", F.date_format("ts", _TS_FMT).alias("grid_ts"),
                    "value_interp"))


@query(
    "funnel_conversion",
    """
    WITH s1 AS (
        SELECT user_id, ts, event_type,
               MIN(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS t_view
        FROM events
    ),
    s2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t_view
                           THEN ts END)
                      OVER (PARTITION BY user_id) AS t_click
        FROM s1
    ),
    s3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t_click
                           THEN ts END)
                      OVER (PARTITION BY user_id) AS t_purchase
        FROM s2
    ),
    per_user AS (
        SELECT user_id, MAX(t_view IS NOT NULL) AS r1,
               MAX(t_click IS NOT NULL) AS r2,
               MAX(t_purchase IS NOT NULL) AS r3
        FROM s3 GROUP BY user_id
    )
    SELECT COUNT(*) AS n_users,
           CAST(SUM(CASE WHEN r1 THEN 1 ELSE 0 END) AS BIGINT) AS reached_view,
           CAST(SUM(CASE WHEN r2 THEN 1 ELSE 0 END) AS BIGINT) AS reached_click,
           CAST(SUM(CASE WHEN r3 THEN 1 ELSE 0 END) AS BIGINT)
               AS reached_purchase,
           ROUND(CAST(SUM(CASE WHEN r3 THEN 1 ELSE 0 END) AS DOUBLE) /
                 COUNT(*), 4) AS full_conversion
    FROM per_user
    """,
    doc="strictly-ordered conversion funnel view -> click -> purchase: "
        "each stage's timestamp is the MIN event time AFTER the previous "
        "stage's, computed as three chained per-user window aggregates. "
        "All three windows share ONE user_id shuffle+sort (same "
        "partitioning), then a per-user rollup and a global count — the "
        "event-analytics staple, no self-joins, no per-stage re-scan",
)
def funnel_conversion(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    t_view = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    s1 = e.select("user_id", "ts", "event_type", t_view.alias("t_view"))
    t_click = F.min(F.when((F.col("event_type") == "click")
                           & (F.col("ts") > F.col("t_view")),
                           F.col("ts"))).over(w)
    s2 = s1.withColumn("t_click", t_click)
    t_purch = F.min(F.when((F.col("event_type") == "purchase")
                           & (F.col("ts") > F.col("t_click")),
                           F.col("ts"))).over(w)
    s3 = s2.withColumn("t_purchase", t_purch)
    per_user = s3.groupBy("user_id").agg(
        F.max(F.col("t_view").isNotNull()).alias("r1"),
        F.max(F.col("t_click").isNotNull()).alias("r2"),
        F.max(F.col("t_purchase").isNotNull()).alias("r3"))
    return per_user.agg(
        F.count("*").alias("n_users"),
        F.sum(F.when(F.col("r1"), 1).otherwise(0)).alias("reached_view"),
        F.sum(F.when(F.col("r2"), 1).otherwise(0)).alias("reached_click"),
        F.sum(F.when(F.col("r3"), 1).otherwise(0)).alias("reached_purchase"),
        F.round(F.sum(F.when(F.col("r3"), 1).otherwise(0)).cast("double")
                / F.count("*"), 4).alias("full_conversion"))


@query(
    "retention_cohorts",
    """
    WITH days AS (
        SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ),
    tagged AS (
        SELECT user_id, day,
               MIN(day) OVER (PARTITION BY user_id) AS cohort_day
        FROM days
    )
    SELECT STRFTIME(DATE_TRUNC('week', cohort_day), '%Y-%m-%d')
               AS cohort_week,
           CAST(FLOOR((day - cohort_day) / 7) AS INT) AS week_offset,
           COUNT(*) AS n_active
    FROM tagged
    GROUP BY 1, 2
    """,
    doc="cohort retention matrix: users bucketed by first-seen week, "
        "counted on each later week they were active. collect_set folds "
        "each user's active days in ONE shuffle (set size bounded by the "
        "calendar span, never by event count), array_min derives the "
        "cohort anchor without a second keyed pass, explode fans back out "
        "for the matrix rollup — 2 shuffles total vs the naive "
        "distinct + window + join-back's 3",
)
def retention_cohorts(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    per_user = (e.select("user_id", F.to_date("ts").alias("day"))
                .groupBy("user_id")
                .agg(F.collect_set("day").alias("days")))
    exploded = per_user.select(
        F.array_min("days").alias("cohort_day"),
        F.explode("days").alias("day"))
    return (exploded.groupBy(
        F.date_format(F.date_trunc("week", "cohort_day"), "yyyy-MM-dd")
         .alias("cohort_week"),
        F.floor(F.datediff("day", "cohort_day") / 7).cast("int")
         .alias("week_offset"))
        .agg(F.count("*").alias("n_active")))


@query(
    "win_trailing_range",
    """
    SELECT event_id, user_id,
           STRFTIME(ts, '%Y-%m-%d %H:%M:%S') AS ts_s,
           COUNT(*) OVER w AS n_trailing_30m,
           ROUND(SUM(CAST(value AS DOUBLE)) OVER w, 2) AS sum_trailing_30m
    FROM events
    WINDOW w AS (PARTITION BY user_id
                 ORDER BY CAST(FLOOR(EPOCH(ts)) AS BIGINT)
                 RANGE BETWEEN 1800 PRECEDING AND CURRENT ROW)
    """,
    doc="per-ROW trailing time window: for every event, the count and sum "
        "of the same user's events in the preceding 30 minutes — a RANGE "
        "frame over event-time seconds, NOT a bucketed tumbling window "
        "(each row gets its own trailing horizon; win_tumbling gives one "
        "row per bucket). One keyed shuffle; frame state is a sliding "
        "deque per partition. The load-burst / rate-limit detector shape. "
        "Spark range frames need a numeric ordering key, so ts lowers to "
        "epoch seconds on both engines",
)
def win_trailing_range(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    w = (Window.partitionBy("user_id")
         .orderBy(F.unix_timestamp("ts"))
         .rangeBetween(-1800, Window.currentRow))
    return e.select(
        "event_id", "user_id",
        F.date_format("ts", _TS_FMT).alias("ts_s"),
        F.count("*").over(w).alias("n_trailing_30m"),
        F.round(F.sum(F.col("value").cast("double")).over(w), 2)
         .alias("sum_trailing_30m"))


@query(
    "anomaly_mad_flags",
    """
    WITH med AS (
        SELECT user_id,
               QUANTILE_CONT(CAST(value AS DOUBLE), 0.5) AS m
        FROM events GROUP BY user_id
    ),
    dev AS (
        SELECT e.user_id, e.event_id, CAST(e.value AS DOUBLE) AS v,
               ABS(CAST(e.value AS DOUBLE) - med.m) AS ad, med.m
        FROM events e JOIN med ON e.user_id = med.user_id
    ),
    mad AS (
        SELECT user_id, QUANTILE_CONT(ad, 0.5) AS mad
        FROM dev GROUP BY user_id
    )
    SELECT d.event_id, d.user_id,
           ROUND(d.v, 2) AS value,
           ROUND((d.v - d.m) / (1.4826 * NULLIF(mad.mad, 0)), 4)
               AS robust_z
    FROM dev d JOIN mad ON d.user_id = mad.user_id
    WHERE ABS((d.v - d.m) / (1.4826 * NULLIF(mad.mad, 0))) > 2.5
    """,
    doc="robust anomaly detection: per-user median + MAD (median absolute "
        "deviation, x1.4826 for normal consistency) flag events whose "
        "robust z exceeds 2.5 — unlike mean/stddev z-scores "
        "(win_zscore), a burst of outliers can't inflate its own "
        "baseline. Two exact grouped medians join back keyed by user "
        "with NO forced broadcast (one row per user is unbounded at "
        "scale; both join-backs ride the same user_id shuffle, and AQE "
        "broadcasts when the stats table happens to fit). NULLIF guards "
        "degenerate all-identical series. The telemetry outlier gate at "
        "scan+two-agg cost",
)
def anomaly_mad_flags(spark, sf_dir):
    e = T(spark, sf_dir, "events").select(
        "event_id", "user_id", F.col("value").cast("double").alias("v"))
    med = e.groupBy("user_id").agg(F.median("v").alias("m"))
    dev = (e.join(med, "user_id")
           .withColumn("ad", F.abs(F.col("v") - F.col("m"))))
    mad = dev.groupBy("user_id").agg(F.median("ad").alias("mad"))
    rz = ((F.col("v") - F.col("m"))
          / (F.lit(1.4826) * F.nullif(F.col("mad"), F.lit(0.0))))
    return (dev.join(mad, "user_id")
            .withColumn("robust_z", rz)
            .filter(F.abs(F.col("robust_z")) > 2.5)
            .select("event_id", "user_id",
                    F.round("v", 2).alias("value"),
                    F.round("robust_z", 4).alias("robust_z")))


@query(
    "ts_time_weighted_avg",
    """
    WITH seq AS (
        SELECT user_id, CAST(value AS DOUBLE) AS v,
               CAST(epoch_us(LEAD(ts) OVER w) - epoch_us(ts) AS DOUBLE)
                   AS dur_us
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    )
    SELECT user_id,
           ROUND(SUM(v * dur_us) / SUM(dur_us), 4) AS twa,
           CAST(COUNT(dur_us) AS INT) AS n_intervals
    FROM seq WHERE dur_us IS NOT NULL
    GROUP BY user_id
    """,
    doc="time-weighted average per user: each observation weighted by its "
        "holding duration until the next one (lead over one user-keyed "
        "window; the final open-ended observation drops out). THE correct "
        "mean for irregularly-sampled series — a plain avg over-weights "
        "bursts — and the post-window groupBy reuses the window's "
        "partitioning, so the whole aggregate is one shuffle",
)
def ts_time_weighted_avg(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    dur = (F.unix_micros(F.lead("ts").over(w))
           - F.unix_micros("ts")).cast("double")
    seq = e.select("user_id", F.col("value").cast("double").alias("v"),
                   dur.alias("dur_us"))
    return (seq.filter(F.col("dur_us").isNotNull())
            .groupBy("user_id")
            .agg(F.round(F.sum(F.col("v") * F.col("dur_us"))
                         / F.sum("dur_us"), 4).alias("twa"),
                 F.count("dur_us").cast("int").alias("n_intervals")))


@query(
    "ts_ohlc_bars",
    """
    WITH ranked AS (
        SELECT user_id, TIME_BUCKET(INTERVAL '6 hours', ts) AS bucket,
               CAST(value AS DOUBLE) AS v,
               ROW_NUMBER() OVER (PARTITION BY user_id,
                                  TIME_BUCKET(INTERVAL '6 hours', ts)
                                  ORDER BY ts ASC, event_id ASC) AS rf,
               ROW_NUMBER() OVER (PARTITION BY user_id,
                                  TIME_BUCKET(INTERVAL '6 hours', ts)
                                  ORDER BY ts DESC, event_id DESC) AS rl
        FROM events
    )
    SELECT user_id,
           STRFTIME(bucket, '%Y-%m-%d %H:%M:%S') AS bar_start,
           ROUND(MAX(CASE WHEN rf = 1 THEN v END), 2) AS open,
           ROUND(MAX(v), 2) AS high,
           ROUND(MIN(v), 2) AS low,
           ROUND(MAX(CASE WHEN rl = 1 THEN v END), 2) AS close,
           COUNT(*) AS n_ticks
    FROM ranked
    GROUP BY user_id, bucket
    """,
    doc="OHLC bar aggregation: per (user, 6-hour bucket) the first/max/"
        "min/last value — open and close are argmin/argmax of (ts, "
        "event_id) via min_by/max_by over a struct, so ties are "
        "deterministic and the whole bar builds in ONE partially-"
        "aggregated groupBy (no window over raw ticks on the Spark "
        "side; the oracle uses the row_number formulation since DuckDB "
        "arg_min lacks composite ordering). The downsampling shape "
        "every tick store runs",
)
def ts_ohlc_bars(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    v = F.col("value").cast("double")
    key = F.struct("ts", "event_id")
    return (e.groupBy("user_id", F.window("ts", "6 hours").alias("w"))
            .agg(F.round(F.min_by(v, key), 2).alias("open"),
                 F.round(F.max(v), 2).alias("high"),
                 F.round(F.min(v), 2).alias("low"),
                 F.round(F.max_by(v, key), 2).alias("close"),
                 F.count("*").alias("n_ticks"))
            .select("user_id",
                    F.date_format("w.start", _TS_FMT).alias("bar_start"),
                    "open", "high", "low", "close", "n_ticks"))


@query(
    "seq_transition_matrix",
    """
    WITH seq AS (
        SELECT event_type AS cur,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS nxt
        FROM events
    ),
    pairs AS (
        SELECT cur, nxt, COUNT(*) AS n FROM seq
        WHERE nxt IS NOT NULL GROUP BY cur, nxt
    ),
    tot AS (SELECT cur, SUM(n) AS t FROM pairs GROUP BY cur)
    SELECT p.cur, p.nxt, p.n,
           ROUND(p.n / CAST(t.t AS DOUBLE), 4) AS p_next
    FROM pairs p JOIN tot t ON p.cur = t.cur
    """,
    doc="behavioral Markov transition matrix: P(next event type | current) "
        "estimated from each user's ordered event sequence — lead() on "
        "one user-keyed shuffle, then two event-type-cardinality "
        "aggregations (partial-agg'd, shuffle O(types^2)). The "
        "session-modeling / next-action-prediction baseline; funnel "
        "queries check one fixed path, this learns all of them",
)
def seq_transition_matrix(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = e.select(F.col("event_type").alias("cur"),
                   F.lead("event_type").over(w).alias("nxt"))
    pairs = (seq.filter(F.col("nxt").isNotNull())
             .groupBy("cur", "nxt").agg(F.count("*").alias("n")))
    tot = pairs.groupBy("cur").agg(F.sum("n").alias("t"))
    return (pairs.join(F.broadcast(tot), "cur")
            .select("cur", "nxt", "n",
                    F.round(F.col("n") / F.col("t").cast("double"), 4)
                     .alias("p_next")))


@query(
    "funnel_latency",
    """
    WITH s1 AS (
        SELECT user_id, ts, event_type,
               MIN(CASE WHEN event_type = 'view' THEN ts END)
                   OVER (PARTITION BY user_id) AS t_view
        FROM events
    ),
    s2 AS (
        SELECT *, MIN(CASE WHEN event_type = 'click' AND ts > t_view
                           THEN ts END)
                      OVER (PARTITION BY user_id) AS t_click
        FROM s1
    ),
    s3 AS (
        SELECT *, MIN(CASE WHEN event_type = 'purchase' AND ts > t_click
                           THEN ts END)
                      OVER (PARTITION BY user_id) AS t_purchase
        FROM s2
    ),
    per_user AS (
        SELECT user_id,
               MIN(CAST(epoch_us(t_purchase) - epoch_us(t_view) AS DOUBLE))
                   / 1000000.0 AS lat_s
        FROM s3 WHERE t_purchase IS NOT NULL
        GROUP BY user_id
    )
    SELECT CAST(COUNT(*) AS INT) AS n_converted,
           ROUND(QUANTILE_CONT(lat_s, 0.5), 2) AS median_s,
           ROUND(QUANTILE_CONT(lat_s, 0.9), 2) AS p90_s,
           ROUND(MIN(lat_s), 2) AS min_s
    FROM per_user
    """,
    doc="conversion latency: for users completing the strictly-ordered "
        "view -> click -> purchase funnel, the view-to-purchase elapsed "
        "time summarized as exact median / p90 / min. Same one-shuffle "
        "three-window chain as funnel_conversion plus a per-user rollup "
        "and a global exact-percentile aggregate — the time-to-convert "
        "metric product teams pair with the conversion rate",
)
def funnel_latency(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    w = Window.partitionBy("user_id")
    t_view = F.min(F.when(F.col("event_type") == "view", F.col("ts"))).over(w)
    s1 = e.select("user_id", "ts", "event_type", t_view.alias("t_view"))
    t_click = F.min(F.when((F.col("event_type") == "click")
                           & (F.col("ts") > F.col("t_view")),
                           F.col("ts"))).over(w)
    s2 = s1.withColumn("t_click", t_click)
    t_purch = F.min(F.when((F.col("event_type") == "purchase")
                           & (F.col("ts") > F.col("t_click")),
                           F.col("ts"))).over(w)
    s3 = s2.withColumn("t_purchase", t_purch)
    lat = ((F.unix_micros("t_purchase") - F.unix_micros("t_view"))
           .cast("double") / 1e6)
    per_user = (s3.filter(F.col("t_purchase").isNotNull())
                .groupBy("user_id").agg(F.min(lat).alias("lat_s")))
    return per_user.agg(
        F.count("*").cast("int").alias("n_converted"),
        F.round(F.percentile("lat_s", F.lit(0.5)), 2).alias("median_s"),
        F.round(F.percentile("lat_s", F.lit(0.9)), 2).alias("p90_s"),
        F.round(F.min("lat_s"), 2).alias("min_s"))


@query(
    "ts_seasonal_decompose",
    """
    WITH hourly AS (
        -- exact integer-cent sum: order-independent, so v is the SAME
        -- double in both engines before any trend/seasonal arithmetic
        -- (values are 2-dp generated; no *100 product sits on a .5
        -- rounding boundary at any sf -- verified)
        SELECT TIME_BUCKET(INTERVAL '1 hour', ts) AS h,
               CAST(SUM(CAST(ROUND(CAST(value AS DOUBLE) * 100)
                             AS BIGINT)) AS DOUBLE) / 100.0 AS v
        FROM events GROUP BY 1
    ),
    trended AS (
        SELECT h, v,
               LIST_SUM(LIST(v) OVER w) / LEN(LIST(v) OVER w) AS trend
        FROM hourly
        WINDOW w AS (ORDER BY h
                     ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
    ),
    seasonal AS (
        SELECT CAST(EXTRACT(hour FROM h) AS INT) AS hod,
               LIST_SUM(LIST(v - trend ORDER BY h))
                   / COUNT(*) AS s
        FROM trended GROUP BY 1
    )
    SELECT STRFTIME(t.h, '%Y-%m-%d %H:%M:%S') AS hour,
           ROUND(t.v, 2) AS value,
           ROUND(t.trend, 4) AS trend,
           ROUND(s.s, 4) AS seasonal,
           ROUND(t.v - t.trend - s.s, 4) AS residual
    FROM trended t
    JOIN seasonal s ON CAST(EXTRACT(hour FROM t.h) AS INT) = s.hod
    """,
    doc="additive seasonal decomposition (STL-lite) of the hourly event "
        "volume: trend = centered 25-hour moving average, seasonal = mean "
        "detrended deviation per hour-of-day, residual = the rest — the "
        "anomaly-vs-seasonality separation every ops dashboard needs. "
        "The global-ordered trend window runs on the HOURLY aggregate "
        "(bounded by the time span, not event volume); the seasonal "
        "profile is a 24-row broadcast joined back",
)
def ts_seasonal_decompose(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    # exact integer-cent sum -> v is bit-identical to DuckDB's regardless
    # of partitioning/summation order (r6 driver red: ROUND(.,4) over an
    # engine-order float sum flipped 1/720 residuals by an ulp)
    cents = F.round(F.col("value").cast("double") * 100).cast("bigint")
    hourly = (e.groupBy(F.window("ts", "1 hour").alias("w"))
              .agg((F.sum(cents).cast("double") / F.lit(100.0)).alias("v"))
              .select(F.col("w.start").alias("h"), "v"))
    wt = Window.orderBy("h").rowsBetween(-12, 12)
    # ordered sequential folds (not avg()) so the float summation order
    # is identical in both engines — see PQ/ADC for the same trick
    frame = F.collect_list("v").over(wt)
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda acc, x: acc + x)
    trended = hourly.withColumn("trend", fold(frame) / F.size(frame))
    dev_sorted = F.transform(
        F.array_sort(F.collect_list(F.struct("h", "dev"))),
        lambda t: t["dev"])
    seasonal = (trended
                .withColumn("dev", F.col("v") - F.col("trend"))
                .groupBy(F.hour("h").alias("hod"))
                .agg((fold(dev_sorted) / F.count("*")).alias("s")))
    return (trended.withColumn("hod", F.hour("h"))
            .join(F.broadcast(seasonal), "hod")
            .select(F.date_format("h", _TS_FMT).alias("hour"),
                    F.round("v", 2).alias("value"),
                    F.round("trend", 4).alias("trend"),
                    F.round("s", 4).alias("seasonal"),
                    F.round(F.col("v") - F.col("trend") - F.col("s"), 4)
                     .alias("residual")))


@query(
    "event_sessionize",
    """
    WITH ordered AS (
      SELECT user_id, event_id, event_type, value,
             EPOCH_US(ts) AS us,
             LAG(EPOCH_US(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      FROM events
    ), flagged AS (
      SELECT *, CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                     THEN 1 ELSE 0 END AS new_sess
      FROM ordered
    ), sess AS (
      SELECT *, SUM(new_sess) OVER
                  (PARTITION BY user_id ORDER BY us, event_id
                   ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id, CAST(session_no AS BIGINT) AS session_no,
           COUNT(*) AS n_events,
           COUNT(DISTINCT event_type) AS n_types,
           ROUND((MAX(us) - MIN(us)) / 1000000.0, 3) AS duration_s,
           ROUND(SUM(CAST(value AS DOUBLE)), 2) AS total_value
    FROM sess
    GROUP BY user_id, session_no
    """,
    doc="gap-based sessionization (30-min inactivity threshold): lag + "
        "cumulative flag-sum assigns session ordinals, then per-session "
        "stats. The batch twin of session_window/applyInPandasWithState — "
        "state is bounded per user_id, and the whole query is ONE "
        "user_id-keyed shuffle: both windows share it, and Catalyst "
        "reuses hashpartitioning(user_id) for the (user_id, session_no) "
        "groupBy (plan-asserted). At 100 TB this is the canonical "
        "partition-by-entity pattern: no global ordering anywhere",
)
def event_sessionize(spark, sf_dir):
    gap_us = 30 * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    e = (T(spark, sf_dir, "events")
         .select("user_id", "event_id", "event_type", "value",
                 F.unix_micros("ts").alias("us")))
    sess = (e.withColumn("prev_us", F.lag("us").over(w))
            .withColumn("new_sess",
                        F.when(F.col("prev_us").isNull()
                               | (F.col("us") - F.col("prev_us") > gap_us), 1)
                        .otherwise(0))
            .withColumn("session_no",
                        F.sum("new_sess").over(
                            w.rowsBetween(Window.unboundedPreceding, 0))))
    return (sess.groupBy("user_id",
                         F.col("session_no").cast("bigint").alias("session_no"))
            .agg(F.count("*").alias("n_events"),
                 F.countDistinct("event_type").alias("n_types"),
                 F.round((F.max("us") - F.min("us")) / F.lit(1_000_000.0), 3)
                  .alias("duration_s"),
                 F.round(F.sum(F.col("value").cast("double")), 2)
                  .alias("total_value")))


@query(
    "ts_rolling_median",
    """
    SELECT user_id, event_id,
           ROUND(MEDIAN(CAST(value AS DOUBLE)) OVER
                   (PARTITION BY user_id ORDER BY ts, event_id
                    ROWS BETWEEN 4 PRECEDING AND CURRENT ROW),
                 4) AS roll_median
    FROM events
    """,
    doc="trailing 5-row rolling median per user — the robust smoothing "
        "primitive (rolling mean is outlier-sensitive; median is the "
        "standard fix). percentile(0.5) over a ROWS frame; both engines "
        "interpolate percentile_cont-style so even-count prefixes match. "
        "One user_id-keyed shuffle, constant per-row state",
)
def ts_rolling_median(spark, sf_dir):
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(-4, 0))
    e = T(spark, sf_dir, "events")
    return e.select(
        "user_id", "event_id",
        F.round(F.expr("percentile(CAST(value AS DOUBLE), 0.5)").over(w), 4)
         .alias("roll_median"))


@query(
    "user_journey_paths",
    """
    WITH seq AS (
      SELECT user_id, event_type AS e0,
             LEAD(event_type, 1) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS e1,
             LEAD(event_type, 2) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS e2
      FROM events
    )
    SELECT e0 || ' > ' || e1 || ' > ' || e2 AS path, COUNT(*) AS n
    FROM seq
    WHERE e1 IS NOT NULL AND e2 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, path
    LIMIT 10
    """,
    doc="top-10 most common 3-step user journeys (event_type trigrams in "
        "per-user time order) — the product-analytics path report. Both "
        "LEADs share one user_id-keyed window shuffle; the path count is "
        "a partial-agg groupBy; the top-10 is TakeOrderedAndProject (no "
        "global sort materialized). Ties broken by path for determinism",
)
def user_journey_paths(spark, sf_dir):
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    e = T(spark, sf_dir, "events")
    seq = (e.select("user_id", F.col("event_type").alias("e0"),
                    F.lead("event_type", 1).over(w).alias("e1"),
                    F.lead("event_type", 2).over(w).alias("e2"))
           .filter(F.col("e1").isNotNull() & F.col("e2").isNotNull()))
    return (seq.select(F.concat_ws(" > ", "e0", "e1", "e2").alias("path"))
            .groupBy("path").agg(F.count("*").alias("n"))
            .orderBy(F.desc("n"), "path").limit(10))


@query(
    "win_cumulative_users",
    """
    WITH firstd AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS d FROM events GROUP BY 1
    ), perday AS (
      SELECT d, COUNT(*) AS n_new FROM firstd GROUP BY d
    )
    SELECT STRFTIME(d, '%Y-%m-%d') AS day, n_new,
           CAST(SUM(n_new) OVER (ORDER BY d
                ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_users
    FROM perday
    """,
    doc="cumulative distinct-user growth curve, the scale-right way: NOT "
        "a running COUNT(DISTINCT) window (whose state grows with "
        "history); instead each user's first-seen day (one partial-agg "
        "groupBy over the fact), a per-day count, then a cumulative sum "
        "over the tiny calendar-bounded day table — the global-ordered "
        "window runs on rows proportional to days, not events",
)
def win_cumulative_users(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    firstd = (e.groupBy("user_id")
              .agg(F.min(F.col("ts").cast("date")).alias("d")))
    perday = firstd.groupBy("d").agg(F.count("*").alias("n_new"))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    return (perday
            .select(F.date_format("d", "yyyy-MM-dd").alias("day"), "n_new",
                    F.sum("n_new").over(w).cast("bigint").alias("cum_users"))
            )


@query(
    "ts_ewma_daily",
    """
    WITH perday AS (
      SELECT CAST(o_orderdate AS DATE) AS d,
             ROUND(SUM(o_totalprice), 2) AS revenue
      FROM orders GROUP BY 1
    ),
    run AS (
      SELECT d, revenue,
             LIST(revenue) OVER (ORDER BY d
                 ROWS UNBOUNDED PRECEDING) AS l
      FROM perday
    )
    SELECT STRFTIME(d, '%Y-%m-%d') AS day, revenue,
           ROUND(list_reduce(l, (acc, x) -> x * 0.3 + acc * 0.7), 4) AS ewma
    FROM run
    """,
    doc="exponentially weighted moving average (alpha=0.3) of daily "
        "revenue — an inherently SEQUENTIAL recurrence (s_i = a*v_i + "
        "(1-a)*s_{i-1}) that a windowed SUM cannot express, computed as "
        "an ordered-array fold: collect_list over the running frame, then "
        "F.aggregate seeded with the first element. Runs AFTER the "
        "partial-agg day rollup, so the fold touches rows proportional to "
        "CALENDAR DAYS (bounded: 100 years = 36k), never raw facts; "
        "per-day sums are rounded to cents before the fold so both "
        "engines fold bit-identical inputs (sum order differs, the "
        "recurrence would amplify nothing but why risk it). DuckDB "
        "replays the same fold via list_reduce, whose seed is also the "
        "first element",
)
def ts_ewma_daily(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    perday = (o.groupBy(F.col("o_orderdate").cast("date").alias("d"))
              .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue")))
    w = Window.orderBy("d").rowsBetween(Window.unboundedPreceding, 0)
    arr = F.collect_list("revenue").over(w)
    ewma = F.aggregate(
        F.slice(arr, F.lit(2), F.greatest(F.size(arr) - 1, F.lit(0))),
        F.element_at(arr, 1).cast("double"),
        lambda acc, x: x * F.lit(0.3) + acc * F.lit(0.7))
    return perday.select(F.date_format("d", "yyyy-MM-dd").alias("day"),
                         "revenue", F.round(ewma, 4).alias("ewma"))


@query(
    "survival_km_churn",
    """
    WITH per_user AS (
      SELECT user_id,
             DATE_DIFF('day', CAST(MIN(ts) AS DATE), CAST(MAX(ts) AS DATE))
               AS lifetime,
             CASE WHEN MAX(ts) < (SELECT MAX(ts) FROM events)
                                 - INTERVAL 7 DAY
                  THEN 1 ELSE 0 END AS churned
      FROM events GROUP BY user_id
    ),
    steps AS (
      SELECT lifetime AS t, CAST(SUM(churned) AS BIGINT) AS d,
             COUNT(*) AS c
      FROM per_user GROUP BY lifetime
    ),
    risk AS (
      SELECT t, d,
             CAST(SUM(c) OVER (ORDER BY t ROWS BETWEEN CURRENT ROW
                               AND UNBOUNDED FOLLOWING) AS BIGINT) AS n_risk
      FROM steps
    ),
    fac AS (
      SELECT t, d, n_risk,
             ROUND(1.0 - d / CAST(n_risk AS DOUBLE), 6) AS factor
      FROM risk
    )
    SELECT t, n_risk, d AS d_churned,
           ROUND(LIST_REDUCE(LIST(factor)
                               OVER (ORDER BY t ROWS UNBOUNDED PRECEDING),
                             (a, b) -> a * b),
                 4) AS survival
    FROM fac
    """,
    doc="Kaplan-Meier survival curve of user engagement lifetime "
        "(first-to-last activity, days); a user is a churn EVENT if "
        "silent for >7 days before the observation end (global MAX(ts), "
        "broadcast as a one-row cross join), else right-censored. "
        "n-at-risk is a reverse cumulative count and S(t) the running "
        "product Π(1 - d/n), computed as an ORDERED product fold over the "
        "rounded factors (collect_list over the running frame + "
        "F.aggregate, DuckDB list_reduce) — identical multiplications in "
        "identical order are bit-identical across engines, where "
        "EXP(SUM(LN)) crossed two libm implementations and flipped a "
        "last-ulp ROUND boundary at the r6 driver. The d==n terminal "
        "step (factor 0) propagates exactly through the product. "
        "Everything after the per-user groupBy runs on rows proportional "
        "to DISTINCT LIFETIME DAYS — the curve itself is calendar-bounded",
)
def survival_km_churn(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    gmax = e.agg(F.max("ts").alias("gmax"))
    per_user = (e.groupBy("user_id")
                .agg(F.min("ts").alias("first_ts"),
                     F.max("ts").alias("last_ts"))
                .crossJoin(F.broadcast(gmax))
                .select(F.datediff(F.col("last_ts").cast("date"),
                                   F.col("first_ts").cast("date"))
                        .alias("lifetime"),
                        F.when(F.col("last_ts")
                               < F.col("gmax") - F.expr("INTERVAL 7 DAY"),
                               1).otherwise(0).alias("churned")))
    steps = (per_user.groupBy(F.col("lifetime").alias("t"))
             .agg(F.sum("churned").cast("bigint").alias("d"),
                  F.count("*").alias("c")))
    wrev = Window.orderBy("t").rowsBetween(0, Window.unboundedFollowing)
    wcum = Window.orderBy("t").rowsBetween(Window.unboundedPreceding, 0)
    risk = steps.withColumn("n_risk", F.sum("c").over(wrev))
    fac = risk.withColumn(
        "factor",
        F.round(F.lit(1.0) - F.col("d") / F.col("n_risk").cast("double"), 6))
    # ordered product fold seeded with the first element, matching
    # DuckDB's list_reduce exactly (same multiplications, same order ->
    # bit-identical survival before ROUND); see ts_ewma_daily for the idiom
    arr = F.collect_list("factor").over(wcum)
    prod = F.aggregate(
        F.slice(arr, F.lit(2), F.greatest(F.size(arr) - 1, F.lit(0))),
        F.element_at(arr, 1).cast("double"),
        lambda acc, x: acc * x)
    surv = F.round(prod, 4)
    return fac.select("t", "n_risk", F.col("d").alias("d_churned"),
                      surv.alias("survival"))


@query(
    "abtest_conversion_z",
    """
    WITH per_user AS (
      SELECT user_id % 2 AS variant,
             MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
               AS conv
      FROM events GROUP BY user_id
    ),
    arms AS (
      SELECT CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n0,
             CAST(SUM(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT)
               AS x0,
             CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(SUM(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT)
               AS x1
      FROM per_user
    )
    SELECT n0, x0, n1, x1,
           ROUND(x0 / CAST(n0 AS DOUBLE), 6) AS rate0,
           ROUND(x1 / CAST(n1 AS DOUBLE), 6) AS rate1,
           ROUND((x1 / CAST(n1 AS DOUBLE) - x0 / CAST(n0 AS DOUBLE))
                 / SQRT(((x0 + x1) / CAST(n0 + n1 AS DOUBLE))
                        * (1.0 - (x0 + x1) / CAST(n0 + n1 AS DOUBLE))
                        * (1.0 / n0 + 1.0 / n1)), 4) AS z_score
    FROM arms
    """,
    doc="two-proportion z-test for an A/B experiment read directly off "
        "the event log: variant = user_id % 2 (the deterministic stand-in "
        "for an assignment column), conversion = user ever purchased. "
        "One partial-agg groupBy(user) then conditional sums collapse "
        "both arms into a SINGLE row — no per-variant shuffle, no join "
        "between arms; the z statistic (pooled-variance normal "
        "approximation) is pure scalar arithmetic on that row, written "
        "with the identical expression shape on both engines so double "
        "rounding can't diverge. The full-funnel experiment readout a "
        "growth team runs daily at any scale",
)
def abtest_conversion_z(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    per_user = (e.groupBy("user_id")
                .agg(F.max(F.when(F.col("event_type") == "purchase", 1)
                           .otherwise(0)).alias("conv"))
                .select((F.col("user_id") % 2).alias("variant"), "conv"))
    arms = per_user.agg(
        F.sum(F.when(F.col("variant") == 0, 1).otherwise(0))
         .cast("bigint").alias("n0"),
        F.sum(F.when(F.col("variant") == 0, F.col("conv")).otherwise(0))
         .cast("bigint").alias("x0"),
        F.sum(F.when(F.col("variant") == 1, 1).otherwise(0))
         .cast("bigint").alias("n1"),
        F.sum(F.when(F.col("variant") == 1, F.col("conv")).otherwise(0))
         .cast("bigint").alias("x1"))
    # try_divide throughout: when every sampled user converts (p=1, as at
    # small sf) the pooled se is 0 and z is 0/0 — NULL under non-ANSI
    # division AND under try_divide, but a runtime DIVIDE_BY_ZERO error
    # under ANSI mode. try_divide keeps the same result in both modes
    # (the ANSI audit's one avoidable failure, SCALE.md).
    r0 = F.try_divide(F.col("x0"), F.col("n0").cast("double"))
    r1 = F.try_divide(F.col("x1"), F.col("n1").cast("double"))
    p = F.try_divide(F.col("x0") + F.col("x1"),
                     (F.col("n0") + F.col("n1")).cast("double"))
    se = F.sqrt(p * (F.lit(1.0) - p)
                * (F.try_divide(F.lit(1.0), F.col("n0"))
                   + F.try_divide(F.lit(1.0), F.col("n1"))))
    return arms.select("n0", "x0", "n1", "x1",
                       F.round(r0, 6).alias("rate0"),
                       F.round(r1, 6).alias("rate1"),
                       F.round(F.try_divide(r1 - r0, se), 4)
                       .alias("z_score"))


@query(
    "session_funnel",
    """
    WITH ordered AS (
      SELECT user_id, event_id, event_type, EPOCH_US(ts) AS us,
             LAG(EPOCH_US(ts)) OVER
               (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
      FROM events
    ), sess AS (
      SELECT user_id, event_id, event_type, us,
             SUM(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000
                      THEN 1 ELSE 0 END) OVER
               (PARTITION BY user_id ORDER BY us, event_id
                ROWS UNBOUNDED PRECEDING) AS session_no
      FROM ordered
    ), s1 AS (
      SELECT user_id, session_no,
             MIN(CASE WHEN event_type = 'view' THEN us END) AS t_view
      FROM sess GROUP BY user_id, session_no
    ), s2 AS (
      SELECT s1.user_id, s1.session_no, s1.t_view,
             MIN(CASE WHEN e.event_type = 'click' AND e.us > s1.t_view
                      THEN e.us END) AS t_click
      FROM s1 JOIN sess e ON s1.user_id = e.user_id
                         AND s1.session_no = e.session_no
      GROUP BY s1.user_id, s1.session_no, s1.t_view
    ), s3 AS (
      SELECT s2.user_id, s2.session_no, s2.t_view, s2.t_click,
             MIN(CASE WHEN e.event_type = 'purchase' AND e.us > s2.t_click
                      THEN e.us END) AS t_purchase
      FROM s2 JOIN sess e ON s2.user_id = e.user_id
                         AND s2.session_no = e.session_no
      GROUP BY s2.user_id, s2.session_no, s2.t_view, s2.t_click
    )
    SELECT COUNT(*) AS n_sessions,
           CAST(SUM(CASE WHEN t_view IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_view,
           CAST(SUM(CASE WHEN t_click IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_click_after_view,
           CAST(SUM(CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_purchase_after_click,
           ROUND(SUM(CASE WHEN t_purchase IS NOT NULL THEN 1 ELSE 0 END)
                 / CAST(NULLIF(SUM(CASE WHEN t_view IS NOT NULL
                                        THEN 1 ELSE 0 END), 0) AS DOUBLE),
                 6) AS p_view_to_purchase
    FROM s3
    """,
    doc="funnel scoped to SESSIONS, not lifetimes: gap-based 30-min "
        "sessionization (identical ordinals to event_sessionize), then "
        "strictly-ordered view -> click -> purchase inside each session "
        "via three chained conditional-min aggregates joined back on the "
        "session key. Every window, groupBy, and join in the chain is "
        "keyed on user_id(+session_no) — hashpartitioning(user_id) is "
        "established once by the sessionize window and every later stage "
        "reuses or refines it, so the whole funnel is one entity-keyed "
        "shuffle regardless of fact size. The session-scoped variant "
        "answers 'does the journey complete in one sitting' where "
        "funnel_conversion answers 'does it ever complete'",
)
def session_funnel(spark, sf_dir):
    gap_us = 30 * 60 * 1_000_000
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    e = (T(spark, sf_dir, "events")
         .select("user_id", "event_id", "event_type",
                 F.unix_micros("ts").alias("us")))
    sess = (e.withColumn("prev_us", F.lag("us").over(w))
            .withColumn("session_no",
                        F.sum(F.when(F.col("prev_us").isNull()
                                     | (F.col("us") - F.col("prev_us")
                                        > gap_us), 1).otherwise(0))
                        .over(w.rowsBetween(Window.unboundedPreceding, 0)))
            .select("user_id", "session_no", "event_type", "us"))
    key = ["user_id", "session_no"]
    s1 = (sess.groupBy(*key)
          .agg(F.min(F.when(F.col("event_type") == "view", F.col("us")))
               .alias("t_view")))
    s2 = (s1.join(sess, key)
          .groupBy(*key, "t_view")
          .agg(F.min(F.when((F.col("event_type") == "click")
                            & (F.col("us") > F.col("t_view")), F.col("us")))
               .alias("t_click")))
    s3 = (s2.join(sess, key)
          .groupBy(*key, "t_view", "t_click")
          .agg(F.min(F.when((F.col("event_type") == "purchase")
                            & (F.col("us") > F.col("t_click")), F.col("us")))
               .alias("t_purchase")))
    nv = F.sum(F.when(F.col("t_view").isNotNull(), 1).otherwise(0))
    np_ = F.sum(F.when(F.col("t_purchase").isNotNull(), 1).otherwise(0))
    return s3.agg(
        F.count("*").alias("n_sessions"),
        nv.cast("bigint").alias("n_view"),
        F.sum(F.when(F.col("t_click").isNotNull(), 1).otherwise(0))
         .cast("bigint").alias("n_click_after_view"),
        np_.cast("bigint").alias("n_purchase_after_click"),
        F.round(np_ / F.nullif(nv, F.lit(0)).cast("double"), 6)
         .alias("p_view_to_purchase"))


@query(
    "win_mom_growth",
    """
    WITH monthly AS (
      SELECT STRFTIME(DATE_TRUNC('month', o_orderdate), '%Y-%m-%d') AS month,
             ROUND(SUM(o_totalprice), 2) AS revenue
      FROM orders GROUP BY 1
    )
    SELECT month, revenue,
           ROUND((revenue - LAG(revenue, 1) OVER (ORDER BY month))
                 / LAG(revenue, 1) OVER (ORDER BY month) * 100, 4)
             AS mom_pct,
           ROUND((revenue - LAG(revenue, 12) OVER (ORDER BY month))
                 / LAG(revenue, 12) OVER (ORDER BY month) * 100, 4)
             AS yoy_pct
    FROM monthly
    """,
    doc="month-over-month and year-over-year revenue growth: the "
        "period-comparison staple. The fact table collapses to one row "
        "per month FIRST (partial-agg groupBy — the only stage that "
        "touches raw orders), then both LAG offsets run on the "
        "calendar-bounded month table; per-month sums are rounded to "
        "cents before the ratios so both engines difference identical "
        "numerators. The global-ordered window is safe for the same "
        "reason as win_cumulative_users: its input is months, not facts",
)
def win_mom_growth(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    monthly = (o.groupBy(F.date_format(
        F.date_trunc("month", "o_orderdate"), "yyyy-MM-dd").alias("month"))
        .agg(F.round(F.sum("o_totalprice"), 2).alias("revenue")))
    w = Window.orderBy("month")
    prev1 = F.lag("revenue", 1).over(w)
    prev12 = F.lag("revenue", 12).over(w)
    return monthly.select(
        "month", "revenue",
        F.round((F.col("revenue") - prev1) / prev1 * 100, 4).alias("mom_pct"),
        F.round((F.col("revenue") - prev12) / prev12 * 100, 4)
         .alias("yoy_pct"))


@query(
    "running_balance_clamped",
    """
    WITH amts AS (
      SELECT user_id, event_id, ts,
             FLOOR(CASE WHEN event_type = 'purchase'
                        THEN -CAST(value AS DOUBLE)
                        ELSE CAST(value AS DOUBLE) / 4 END * 100) / 100 AS amt
      FROM events
    ),
    run AS (
      SELECT user_id, event_id,
             LIST(amt) OVER (PARTITION BY user_id ORDER BY ts, event_id
                             ROWS UNBOUNDED PRECEDING) AS l
      FROM amts
    )
    SELECT user_id, event_id,
           ROUND(list_reduce(list_prepend(0.0, l),
                             (acc, x) -> GREATEST(0.0, acc + x)), 2)
             AS balance
    FROM run
    """,
    doc="running account balance that CLAMPS at zero (credits accrue at "
        "value/4, purchases debit full value, balance can never go "
        "negative) — a non-linear recurrence max(0, prev + x) that no "
        "windowed SUM or prefix trick can express, so it is an ordered "
        "fold like ts_ewma_daily but PER ENTITY: partitioned by user_id, "
        "every user folds in parallel on one keyed shuffle, and fold "
        "length is bounded by per-entity history, not table size. "
        "Amounts are FLOOR-truncated to cents pre-fold (floor, not round: "
        "the engines disagree on round-half of doubles but floor "
        "identically) so both fold identical inputs; the fold is seeded "
        "with an explicit 0.0 (list_prepend) so the first element is "
        "clamped too",
)
def running_balance_clamped(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    amt = F.floor(
        F.when(F.col("event_type") == "purchase",
               -F.col("value").cast("double"))
        .otherwise(F.col("value").cast("double") / 4) * 100) / 100
    w = (Window.partitionBy("user_id").orderBy("ts", "event_id")
         .rowsBetween(Window.unboundedPreceding, 0))
    arr = F.collect_list("amt").over(w)
    bal = F.aggregate(arr, F.lit(0.0),
                      lambda acc, x: F.greatest(F.lit(0.0), acc + x))
    return (e.withColumn("amt", amt)
            .select("user_id", "event_id",
                    F.round(bal, 2).alias("balance")))


@query(
    "win_streaks",
    """
    WITH days AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS d FROM events
    ),
    islands AS (
      SELECT user_id, d,
             DATE_DIFF('day', DATE '1970-01-01', d)
             - ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY d) AS grp
      FROM days
    ),
    streaks AS (
      SELECT user_id, grp, COUNT(*) AS len
      FROM islands GROUP BY user_id, grp
    )
    SELECT user_id, CAST(MAX(len) AS BIGINT) AS longest_streak,
           CAST(SUM(len) AS BIGINT) AS n_active_days,
           CAST(COUNT(*) AS BIGINT) AS n_streaks
    FROM streaks GROUP BY user_id
    """,
    doc="longest consecutive-day activity streak per user — the "
        "gaps-and-islands pattern: distinct active days, then the "
        "epoch-day-minus-row-number trick assigns every run of "
        "consecutive dates a constant island id, and two grouped "
        "aggregations finish it. Everything after the DISTINCT is keyed "
        "on user_id, so the window, both groupBys, and the final rollup "
        "share ONE user-keyed shuffle (hashpartitioning(user_id) "
        "satisfies every downstream (user_id, grp) requirement); "
        "per-user state is bounded by that user's active days. The "
        "engagement metric behind every retention dashboard",
)
def win_streaks(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    days = e.select("user_id", F.col("ts").cast("date").alias("d")).distinct()
    w = Window.partitionBy("user_id").orderBy("d")
    islands = days.withColumn(
        "grp", F.datediff("d", F.lit("1970-01-01").cast("date"))
        - F.row_number().over(w))
    streaks = islands.groupBy("user_id", "grp").agg(F.count("*").alias("len"))
    return (streaks.groupBy("user_id")
            .agg(F.max("len").cast("bigint").alias("longest_streak"),
                 F.sum("len").cast("bigint").alias("n_active_days"),
                 F.count("*").cast("bigint").alias("n_streaks")))


@query(
    "orders_gap_stats",
    """
    WITH gaps AS (
      SELECT o_custkey,
             DATE_DIFF('day',
                       LAG(CAST(o_orderdate AS DATE)) OVER
                         (PARTITION BY o_custkey
                          ORDER BY o_orderdate, o_orderkey),
                       CAST(o_orderdate AS DATE)) AS gap_days
      FROM orders
    )
    SELECT c.c_mktsegment AS segment,
           CAST(COUNT(*) AS BIGINT) AS n_gaps,
           ROUND(AVG(CAST(g.gap_days AS DOUBLE)), 4) AS avg_gap_days,
           ROUND(MEDIAN(CAST(g.gap_days AS DOUBLE)), 1) AS median_gap_days,
           CAST(MAX(g.gap_days) AS BIGINT) AS max_gap_days
    FROM gaps g JOIN customer c ON g.o_custkey = c.c_custkey
    WHERE g.gap_days IS NOT NULL
    GROUP BY c.c_mktsegment
    """,
    doc="inter-order gap statistics (repurchase cadence) by market "
        "segment: LAG over each customer's order history gives "
        "days-since-previous-order, then one grouped aggregate per "
        "segment after a BROADCAST join to the customer dim — the fact "
        "table is shuffled once on o_custkey for the window and never "
        "again (the segment groupBy re-aggregates only 5 groups of "
        "partial state). Exact MEDIAN runs per segment over the gap "
        "column; at 100 TB swap approx_percentile, same plan shape. The "
        "purchase-frequency readout behind CLV and churn models",
)
def orders_gap_stats(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    gaps = (o.select("o_custkey", "o_orderdate", "o_orderkey")
            .withColumn("gap_days",
                        F.datediff(F.col("o_orderdate").cast("date"),
                                   F.lag(F.col("o_orderdate").cast("date"))
                                   .over(w)))
            .filter(F.col("gap_days").isNotNull()))
    return (gaps.join(dim_broadcast(c.select("c_custkey", "c_mktsegment"), sf_dir, "customer"),
                      gaps.o_custkey == F.col("c_custkey"))
            .groupBy(F.col("c_mktsegment").alias("segment"))
            .agg(F.count("*").cast("bigint").alias("n_gaps"),
                 F.round(F.avg(F.col("gap_days").cast("double")), 4)
                  .alias("avg_gap_days"),
                 F.round(F.expr("median(CAST(gap_days AS DOUBLE))"), 1)
                  .alias("median_gap_days"),
                 F.max("gap_days").cast("bigint").alias("max_gap_days")))


@query(
    "alert_error_rate",
    """
    WITH hourly AS (
      SELECT STRFTIME(TIME_BUCKET(INTERVAL '1 hour', ts),
                      '%Y-%m-%d %H:%M:%S') AS hour,
             COUNT(*) AS n_events,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_errors
      FROM events GROUP BY 1
    )
    SELECT hour, n_events, n_errors,
           ROUND(n_errors / CAST(n_events AS DOUBLE), 6) AS error_rate,
           CASE WHEN n_errors / CAST(n_events AS DOUBLE) > 0.25
                THEN 1 ELSE 0 END AS alert
    FROM hourly
    """,
    doc="hourly error-rate monitor with threshold alerting — the ops "
        "dashboard query: ONE tumbling-window partial aggregate computes "
        "both the event count and the conditional error count (no "
        "self-join of errors vs totals, the classic mistake that doubles "
        "the scan and adds a shuffle), then the rate and the alert flag "
        "are row-local arithmetic on the bounded hourly rollup. "
        "Streaming twin: the same expressions behind withWatermark + "
        "window, emitting alerts per micro-batch",
)
def alert_error_rate(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    hourly = (e.groupBy(F.date_format(
        F.window("ts", "1 hour").start, _TS_FMT).alias("hour"))
        .agg(F.count("*").alias("n_events"),
             F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
              .cast("bigint").alias("n_errors")))
    rate = F.col("n_errors") / F.col("n_events").cast("double")
    return hourly.select(
        "hour", "n_events", "n_errors",
        F.round(rate, 6).alias("error_rate"),
        F.when(rate > 0.25, 1).otherwise(0).alias("alert"))


@query(
    "attribution_last_touch",
    """
    WITH ordered AS (
      SELECT user_id, event_type, EPOCH_US(ts) AS us,
             LAST_VALUE(CASE WHEN event_type IN ('view', 'click')
                             THEN event_type END IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_touch,
             LAST_VALUE(CASE WHEN event_type IN ('view', 'click')
                             THEN EPOCH_US(ts) END IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY ts, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS prev_touch_us
      FROM events
    )
    SELECT COALESCE(CASE WHEN us - prev_touch_us <= 604800000000
                         THEN prev_touch END, 'organic') AS touch,
           COUNT(*) AS n_purchases
    FROM ordered
    WHERE event_type = 'purchase'
    GROUP BY 1
    """,
    doc="last-touch marketing attribution: each purchase credits the "
        "most recent preceding view/click by the same user within a "
        "7-day lookback, else 'organic'. The carry-forward is LAG ... "
        "IGNORE NULLS over the user's event stream — the same "
        "forward-fill primitive as win_gap_fill, so attribution needs "
        "exactly ONE user-keyed shuffle and no self-join of purchases "
        "against touch events (the join formulation explodes on "
        "high-activity users; the window is linear in each user's "
        "history). Attribution-window arithmetic stays in integer "
        "microseconds",
)
def attribution_last_touch(spark, sf_dir):
    e = (T(spark, sf_dir, "events")
         .select("user_id", "event_id", "event_type",
                 F.unix_micros("ts").alias("us")))
    w = Window.partitionBy("user_id").orderBy("us", "event_id")
    is_touch = F.col("event_type").isin("view", "click")
    ordered = (e.withColumn("prev_touch",
                            F.last(F.when(is_touch, F.col("event_type")),
                                   ignorenulls=True)
                            .over(w.rowsBetween(Window.unboundedPreceding, -1)))
               .withColumn("prev_touch_us",
                           F.last(F.when(is_touch, F.col("us")),
                                  ignorenulls=True)
                           .over(w.rowsBetween(Window.unboundedPreceding, -1))))
    week_us = 7 * 24 * 3600 * 1_000_000
    touch = F.coalesce(
        F.when(F.col("us") - F.col("prev_touch_us") <= week_us,
               F.col("prev_touch")), F.lit("organic"))
    return (ordered.filter(F.col("event_type") == "purchase")
            .groupBy(touch.alias("touch"))
            .agg(F.count("*").alias("n_purchases")))


@query(
    "ts_cusum_shift",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT)
               AS xc
      FROM events GROUP BY 1, 2
    ),
    base AS (
      SELECT event_type, d, CAST(xc AS DOUBLE) / 100.0 AS x,
             ROUND(LIST_REDUCE(
                     LIST_PREPEND(CAST(0 AS DOUBLE),
                       LIST_TRANSFORM((LIST(xc) OVER all_w)[1:7],
                                      v -> CAST(v AS DOUBLE) / 100.0)),
                     (a, b) -> a + b)
                   / CAST(LEN((LIST(xc) OVER all_w)[1:7]) AS DOUBLE),
                   2) AS mu
      FROM daily
      WINDOW all_w AS (PARTITION BY event_type ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING
                                AND UNBOUNDED FOLLOWING)
    ),
    param AS (
      SELECT event_type, d, x, mu,
             ROUND(mu * CAST(0.05 AS DOUBLE), 2) AS kappa,
             ROUND(mu * CAST(0.25 AS DOUBLE), 2) AS h
      FROM base
    ),
    deltas AS (
      SELECT *, x - mu - kappa AS dhi, mu - kappa - x AS dlo
      FROM param
    ),
    folded AS (
      SELECT event_type, d, x, mu, h,
             LIST_REDUCE(LIST_PREPEND(CAST(0 AS DOUBLE),
                                      LIST(dhi) OVER run_w),
                         (a, b) -> GREATEST(CAST(0 AS DOUBLE), a + b))
               AS chi,
             LIST_REDUCE(LIST_PREPEND(CAST(0 AS DOUBLE),
                                      LIST(dlo) OVER run_w),
                         (a, b) -> GREATEST(CAST(0 AS DOUBLE), a + b))
               AS clo
      FROM deltas
      WINDOW run_w AS (PARTITION BY event_type ORDER BY d
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, STRFTIME(d, '%Y-%m-%d') AS day, x,
           ROUND(chi, 4) AS cusum_hi, ROUND(clo, 4) AS cusum_lo,
           CASE WHEN chi > h OR clo > h THEN 1 ELSE 0 END AS shift_flag
    FROM folded
    """,
    doc="two-sided CUSUM level-shift detector per event type over daily "
        "value totals: s_hi(t) = max(0, s_hi(t-1) + x_t - mu - kappa), "
        "s_lo symmetric, alarm when either side crosses h. Baseline mu is "
        "the mean of the first seven calendar days (reference period), "
        "kappa (slack) 5% and h (decision interval) 25% of it. Daily "
        "totals are EXACT integer cent sums (per-row ROUND(value*100) to "
        "BIGINT, then an order-free integer SUM) so the fold's inputs are "
        "bit-identical across engines regardless of aggregation order; "
        "the recurrence itself is an ORDERED fold seeded with 0 "
        "(F.aggregate over a running-frame collect_list vs DuckDB "
        "LIST_REDUCE(LIST_PREPEND(0, ...))) — same max/add steps in the "
        "same order are bit-identical, the r6 knife-edge lesson applied "
        "from the start. Scale: the only data-sized stage is the "
        "(type, day) partial-agg groupBy; everything after runs on rows "
        "bounded by event-types x calendar days, so the O(days^2) "
        "running-frame folds are calendar-bounded no matter how many "
        "raw events feed them",
)
def ts_cusum_shift(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    daily = (e.groupBy("event_type", F.col("ts").cast("date").alias("d"))
             .agg(F.sum(F.round(F.col("value") * 100.0, 0).cast("bigint"))
                  .cast("bigint").alias("xc")))
    wall = (Window.partitionBy("event_type").orderBy("d")
            .rowsBetween(Window.unboundedPreceding,
                         Window.unboundedFollowing))
    wrun = (Window.partitionBy("event_type").orderBy("d")
            .rowsBetween(Window.unboundedPreceding, 0))
    base7 = F.transform(F.slice(F.collect_list("xc").over(wall), 1, 7),
                        lambda v: v.cast("double") / F.lit(100.0))
    mu = F.round(
        F.aggregate(base7, F.lit(0.0), lambda a, v: a + v)
        / F.size(base7).cast("double"), 2)
    param = (daily
             .withColumn("x", F.col("xc").cast("double") / F.lit(100.0))
             .withColumn("mu", mu)
             .withColumn("kappa", F.round(F.col("mu") * F.lit(0.05), 2))
             .withColumn("h", F.round(F.col("mu") * F.lit(0.25), 2)))
    deltas = (param
              .withColumn("dhi", F.col("x") - F.col("mu") - F.col("kappa"))
              .withColumn("dlo", F.col("mu") - F.col("kappa") - F.col("x")))

    def cusum(col):
        return F.aggregate(F.collect_list(col).over(wrun), F.lit(0.0),
                           lambda a, v: F.greatest(F.lit(0.0), a + v))

    folded = (deltas.withColumn("chi", cusum("dhi"))
              .withColumn("clo", cusum("dlo")))
    return folded.select(
        "event_type", F.date_format("d", "yyyy-MM-dd").alias("day"), "x",
        F.round("chi", 4).alias("cusum_hi"),
        F.round("clo", 4).alias("cusum_lo"),
        F.when((F.col("chi") > F.col("h")) | (F.col("clo") > F.col("h")),
               1).otherwise(0).alias("shift_flag"))


@query(
    "ts_anomaly_mad",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    med AS (
      SELECT event_type,
             CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY cnt)
               AS BIGINT) AS med
      FROM daily GROUP BY event_type
    ),
    dev AS (
      SELECT d.event_type, d.d, d.cnt, m.med,
             ABS(d.cnt - m.med) AS adev
      FROM daily d JOIN med m ON m.event_type = d.event_type
    ),
    mad AS (
      SELECT event_type,
             CAST(PERCENTILE_DISC(0.5) WITHIN GROUP (ORDER BY adev)
               AS BIGINT) AS mad
      FROM dev GROUP BY event_type
    )
    SELECT v.event_type, CAST(v.d AS VARCHAR) AS day, v.cnt,
           CAST(v.med AS BIGINT) AS med, CAST(a.mad AS BIGINT) AS mad,
           CAST(v.adev > 3 * a.mad AS INT) AS is_anomaly
    FROM dev v JOIN mad a ON a.event_type = v.event_type
    ORDER BY v.event_type, day
    """,
    doc="robust (median/MAD) daily-count anomaly flags per event type — "
        "the outlier-resistant alternative to the z-score/Bollinger "
        "monitors (one bad day inflates a stddev and masks itself; it "
        "moves a median by at most one rank). EVERYTHING is an integer "
        "order statistic: daily counts are exact integers, the median "
        "and the median absolute deviation are PERCENTILE_DISC picks "
        "(no interpolation float), and the flag is the integer "
        "comparison adev > 3*mad — no float exists anywhere in the "
        "face, so cross-engine agreement is by construction. Scale "
        "shape: the fact table rolls up ONCE to (type, day); both "
        "medians and the flag join run on calendar-bounded rows "
        "(types x days), and the two broadcast join-backs carry "
        "types-sized model tables",
)
def ts_anomaly_mad(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type", F.col("ts").cast("date").alias("d"))
             .agg(F.count("*").cast("bigint").alias("cnt")))
    med = (daily.groupBy("event_type")
           .agg(F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY cnt)")
                .cast("bigint").alias("med")))
    dev = (daily.join(F.broadcast(med), "event_type")
           .withColumn("adev", F.abs(F.col("cnt") - F.col("med"))))
    mad = (dev.groupBy("event_type")
           .agg(F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY adev)")
                .cast("bigint").alias("mad")))
    return (dev.join(F.broadcast(mad), "event_type")
            .select("event_type", F.col("d").cast("string").alias("day"),
                    "cnt", "med", "mad",
                    (F.col("adev") > 3 * F.col("mad")).cast("int")
                    .alias("is_anomaly"))
            .orderBy("event_type", "day"))


@query(
    "ts_theilsen_trend",
    """
    WITH monthly AS (
      SELECT n_name AS nation,
             YEAR(o_orderdate) * 12 + MONTH(o_orderdate) AS m,
             CAST(CAST(SUM(CAST(ROUND(o_totalprice * 100.0) AS BIGINT))
                       AS BIGINT) AS DOUBLE) / 100.0 AS r
      FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT a.nation, (b.r - a.r) / CAST(b.m - a.m AS DOUBLE) AS slope
      FROM monthly a JOIN monthly b
        ON a.nation = b.nation AND b.m > a.m
    ),
    ranked AS (
      SELECT nation, slope,
             ROW_NUMBER() OVER (PARTITION BY nation ORDER BY slope) AS rn,
             COUNT(*) OVER (PARTITION BY nation) AS n_pairs
      FROM pairs
    )
    SELECT nation, CAST(n_pairs AS BIGINT) AS n_pairs,
           ROUND(slope, 6) AS theil_slope
    FROM ranked WHERE rn = (n_pairs + 1) // 2
    """,
    doc="Theil-Sen robust trend of monthly revenue per nation: the median "
        "of all pairwise slopes (r_j - r_i) / (m_j - m_i) over month "
        "indices, immune to outlier months where least squares is not "
        "(29% breakdown point). Monthly revenue is an exact integer cent "
        "sum (order-free), so every slope is bit-identical across "
        "engines; the median is the LOWER median selected by rank "
        "((n+1) DIV 2), a pure order statistic with NO averaging — "
        "selection of an existing value can never land on a rounding "
        "boundary, where a mean-of-two-middles could. Scale: ONE fact "
        "scan and ONE partial-agg shuffle — the pairwise expansion and "
        "the median selection both happen INSIDE a per-nation array of "
        "(month, revenue) points (calendar-bounded, ~80 elements -> ~3k "
        "slopes), via higher-order array functions in whole-stage "
        "codegen. A self-join formulation would recompute the "
        "fact-scan+agg subtree on both sides (Spark does not dedupe "
        "uncached self-join branches) and shuffle it twice; the array "
        "form cannot, and fact-table size only affects the one groupBy "
        "feeding it — the honest way to run Theil-Sen at 100 TB",
)
def ts_theilsen_trend(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    monthly = (o.join(c, o.o_custkey == c.c_custkey)
               .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
               .groupBy(F.col("n_name").alias("nation"),
                        (F.year("o_orderdate") * 12
                         + F.month("o_orderdate")).alias("m"))
               .agg((F.sum(F.round(F.col("o_totalprice") * 100.0, 0)
                           .cast("bigint")).cast("bigint")
                     .cast("double") / F.lit(100.0)).alias("r")))
    # per-nation (m, r) points in month order (array_sort on the struct
    # sorts by m first; months are distinct within a nation)
    pern = monthly.groupBy("nation").agg(
        F.array_sort(F.collect_list(F.struct("m", "r"))).alias("pts"))
    # all i<j pairwise slopes, generated in-array: for each point a at
    # 0-based index i, slice the points after it and map to slopes
    slopes = F.flatten(F.transform(
        F.col("pts"),
        lambda a, i: F.transform(
            F.slice(F.col("pts"), i + F.lit(2), F.size(F.col("pts"))),
            lambda b: (b["r"] - a["r"]) / (b["m"] - a["m"]).cast("double"))))
    return (pern.withColumn("slopes", F.array_sort(slopes))
            .select("nation",
                    F.size("slopes").cast("bigint").alias("n_pairs"),
                    F.round(F.element_at(
                        "slopes",
                        F.expr("CAST((size(slopes) + 1) DIV 2 AS INT)")), 6)
                    .alias("theil_slope")))


@query(
    "ts_acf",
    """
    WITH daily AS (
      SELECT event_type,
             DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS di,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    lags AS (SELECT UNNEST(RANGE(1, 8)) AS k),
    pairs AS (
      SELECT a.event_type, l.k, a.cnt AS x, b.cnt AS y
      FROM daily a CROSS JOIN lags l
      JOIN daily b ON b.event_type = a.event_type AND b.di = a.di + l.k
    ),
    s AS (
      SELECT event_type, k, CAST(COUNT(*) AS BIGINT) AS n,
             SUM(x) AS sx, SUM(y) AS sy, SUM(x*y) AS sxy,
             SUM(x*x) AS sx2, SUM(y*y) AS sy2
      FROM pairs GROUP BY 1, 2
    )
    SELECT event_type, CAST(k AS BIGINT) AS lag, n AS n_pairs,
           ROUND(CAST(n*sxy - sx*sy AS DOUBLE)
                 / SQRT(CAST(n*sx2 - sx*sx AS DOUBLE)
                        * CAST(n*sy2 - sy*sy AS DOUBLE)), 6) AS acf
    FROM s
    WHERE n >= 3 AND n*sx2 > sx*sx AND n*sy2 > sy*sy
    """,
    doc="sample autocorrelation of the per-type DAILY event count at lags "
        "1..7 — the standard seasonality/persistence diagnostic before "
        "fitting any forecast model. The fact table aggregates once into "
        "per-(type, day) integer counts; the lagged alignment is then an "
        "equi-join of that small aggregate with itself keyed on "
        "(type, day+k) after a 7-way lag fan-out, and Pearson r comes from "
        "the closed-form over six EXACT integer sums (n, Σx, Σy, Σxy, "
        "Σx², Σy²) — a partial-aggregable shuffle, never a window over raw "
        "events. Because every input to the float expression is an exact "
        "integer and the expression is evaluated identically in both "
        "engines, the face is hash-exact without any order pinning; "
        "variance factors are cast to double BEFORE multiplying so the "
        "product cannot overflow bigint at large scale. Constant series "
        "(zero variance) are excluded by the integer guard, not a float "
        "epsilon",
)
def ts_acf(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    # cached: the rollup feeds BOTH sides of the lag self-join, and Spark
    # does not dedupe uncached self-join branches — without the cache the
    # 100 TB fact would be scanned and aggregated twice
    daily = (ev.groupBy(F.col("event_type"),
                        F.datediff(F.col("ts").cast("date"),
                                   F.lit("2024-01-01").cast("date"))
                        .alias("di"))
             .agg(F.count("*").cast("bigint").alias("cnt"))
             .cache())
    lags = spark.range(1, 8).select(F.col("id").alias("k"))
    a = (daily.crossJoin(F.broadcast(lags))
         .select("event_type", "k", (F.col("di") + F.col("k")).alias("dj"),
                 F.col("cnt").alias("x")))
    b = daily.select(F.col("event_type").alias("et2"),
                     F.col("di").alias("dj2"), F.col("cnt").alias("y"))
    pairs = a.join(b, (F.col("event_type") == F.col("et2"))
                   & (F.col("dj") == F.col("dj2")))
    s = (pairs.groupBy("event_type", "k")
         .agg(F.count("*").cast("bigint").alias("n"),
              F.sum("x").alias("sx"), F.sum("y").alias("sy"),
              F.sum(F.col("x") * F.col("y")).alias("sxy"),
              F.sum(F.col("x") * F.col("x")).alias("sx2"),
              F.sum(F.col("y") * F.col("y")).alias("sy2")))
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) \
        .cast("double")
    vx = (F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")) \
        .cast("double")
    vy = (F.col("n") * F.col("sy2") - F.col("sy") * F.col("sy")) \
        .cast("double")
    return (s.filter((F.col("n") >= 3)
                     & (F.col("n") * F.col("sx2") > F.col("sx") * F.col("sx"))
                     & (F.col("n") * F.col("sy2") > F.col("sy") * F.col("sy")))
            .select("event_type", F.col("k").cast("bigint").alias("lag"),
                    F.col("n").alias("n_pairs"),
                    F.round(num / F.sqrt(vx * vy), 6).alias("acf")))


@query(
    "ts_holt_linear",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ),
    arrs AS (
      SELECT event_type, LIST(x ORDER BY d) AS xs,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM daily GROUP BY event_type HAVING COUNT(*) >= 2
    ),
    folded AS (
      SELECT event_type, n,
             LIST_REDUCE(
               LIST_PREPEND([xs[1], xs[2] - xs[1]],
                            LIST_TRANSFORM(xs[2:], x -> [x, 0.0])),
               (acc, e) -> [0.5 * e[1] + 0.5 * (acc[1] + acc[2]),
                            0.5 * ((0.5 * e[1] + 0.5 * (acc[1] + acc[2]))
                                   - acc[1]) + 0.5 * acc[2]]) AS st
      FROM arrs
    )
    SELECT event_type, n AS n_days,
           ROUND(st[1], 4) AS level, ROUND(st[2], 4) AS trend,
           ROUND(st[1] + 7 * st[2], 4) AS forecast_7d
    FROM folded
    """,
    doc="Holt's linear (double exponential) smoothing of the per-type "
        "daily count, alpha=beta=0.5, initialized with l0=x0, b0=x1-x0 — "
        "the level+trend recurrence a plain EWMA (ts_ewma_daily) cannot "
        "capture; forecast_7d extrapolates level + 7*trend. The "
        "2-component state rides as a 2-element double array through an "
        "ordered fold (F.aggregate vs DuckDB LIST_REDUCE over the "
        "identical element walk); alpha=1/2 makes every smoothing step a "
        "halving — exact in binary floating point — and the day counts "
        "are exact integers, so the fold is bit-identical across engines "
        "by construction, not by tolerance. Runs AFTER the partial-agg "
        "day rollup: the sequential part touches rows proportional to "
        "CALENDAR DAYS per type, never raw facts — the honest way to run "
        "any recurrence at 100 TB",
)
def ts_holt_linear(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type", F.col("ts").cast("date").alias("d"))
             .agg(F.count("*").cast("double").alias("x")))
    arrs = (daily.groupBy("event_type")
            .agg(F.array_sort(F.collect_list(F.struct("d", "x")))
                 .alias("pts"),
                 F.count("*").cast("bigint").alias("n"))
            .filter(F.col("n") >= 2)
            .withColumn("xs", F.transform("pts", lambda p: p["x"])))
    x0 = F.element_at("xs", 1)
    x1 = F.element_at("xs", 2)
    init = F.array(x0, x1 - x0)
    rest = F.transform(F.slice(F.col("xs"), 2, F.size("xs") - 1),
                       lambda x: F.array(x, F.lit(0.0)))

    def step(acc, e):
        new_l = F.lit(0.5) * e[0] + F.lit(0.5) * (acc[0] + acc[1])
        new_b = (F.lit(0.5) * ((F.lit(0.5) * e[0]
                                + F.lit(0.5) * (acc[0] + acc[1]))
                               - acc[0])
                 + F.lit(0.5) * acc[1])
        return F.array(new_l, new_b)

    st = F.aggregate(rest, init, step)
    return (arrs.select("event_type", F.col("n").alias("n_days"),
                        F.round(st[0], 4).alias("level"),
                        F.round(st[1], 4).alias("trend"),
                        F.round(st[0] + F.lit(7) * st[1], 4)
                        .alias("forecast_7d")))


@query(
    "ts_bollinger_daily",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, d, cnt,
             CAST(COUNT(*) OVER win AS BIGINT) AS n,
             MIN(d) OVER win AS d0,
             CAST(SUM(CAST(cnt AS DECIMAL(38,0))) OVER win
               AS DECIMAL(38,0)) AS s,
             CAST(SUM(CAST(cnt AS DECIMAL(38,0))
                      * CAST(cnt AS DECIMAL(38,0))) OVER win
               AS DECIMAL(38,0)) AS s2
      FROM daily
      WINDOW win AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, CAST(d AS VARCHAR) AS day, cnt,
           ROUND(CAST(s AS DOUBLE) / 7.0, 6) AS ma7,
           ROUND(CAST(s AS DOUBLE) / 7.0
                 + 2.0 * SQRT(CAST(7 * s2 - s * s AS DOUBLE) / 42.0), 6)
             AS upper_band,
           ROUND(CAST(s AS DOUBLE) / 7.0
                 - 2.0 * SQRT(CAST(7 * s2 - s * s AS DOUBLE) / 42.0), 6)
             AS lower_band,
           CAST(CAST(cnt AS DOUBLE) > CAST(s AS DOUBLE) / 7.0
                + 2.0 * SQRT(CAST(7 * s2 - s * s AS DOUBLE) / 42.0) AS INT)
             AS breach_hi
    FROM w WHERE n = 7 AND d - d0 = 6
    ORDER BY event_type, day
    """,
    doc="Bollinger bands on the per-type DAILY event count: 7-day rolling "
        "mean ± 2σ with a breach flag — the volatility-band anomaly "
        "monitor. The fact table rolls up ONCE to (type, day) integer "
        "counts; the rolling window then runs over ~days×types rows, "
        "never raw events, so the window shuffle is calendar-bounded at "
        "any corpus size. Mean and σ come from the closed form over "
        "EXACT integer window sums (n, Σx, Σx²) — every float op is an "
        "IEEE-correctly-rounded function of identical integer inputs, so "
        "bands AND the breach comparison (int count vs deterministic "
        "double band) land bit-identically in both engines; no ordered "
        "fold needed. Bessel-corrected σ: var = (7·Σx² − (Σx)²)/(7·6). "
        "Bands emit only for GAPLESS weeks (the 7-row frame must span "
        "exactly 6 calendar days): zero-count days have no rollup row, "
        "and a ROWS frame would otherwise silently bridge the gap",
)
def ts_bollinger_daily(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type", F.col("ts").cast("date").alias("d"))
             .agg(F.count("*").cast("bigint").alias("cnt")))
    win = (Window.partitionBy("event_type").orderBy("d")
           .rowsBetween(-6, 0))
    # quadratic window sums in DECIMAL(38,0): daily counts >= ~1.15e9
    # would wrap 7*Σcnt² past bigint (non-ANSI Spark wraps SILENTLY,
    # DuckDB raises — a divergence, not just a wrong band)
    dec = F.col("cnt").cast("decimal(38,0)")
    w = (daily
         .withColumn("n", F.count("*").over(win).cast("bigint"))
         .withColumn("d0", F.min("d").over(win))
         .withColumn("s", F.sum(dec).over(win).cast("decimal(38,0)"))
         .withColumn("s2", F.sum(dec * dec).over(win)
                     .cast("decimal(38,0)")))
    ma = F.col("s").cast("double") / F.lit(7.0)
    sd = F.sqrt((F.lit(7) * F.col("s2") - F.col("s") * F.col("s"))
                .cast("double") / F.lit(42.0))
    upper = ma + F.lit(2.0) * sd
    # n == 7 alone would let the 7-row frame span calendar gaps (a
    # zero-count day has no rollup row); require a gapless week
    return (w.filter((F.col("n") == 7)
                     & (F.datediff(F.col("d"), F.col("d0")) == 6))
            .select("event_type", F.col("d").cast("string").alias("day"),
                    "cnt",
                    F.round(ma, 6).alias("ma7"),
                    F.round(upper, 6).alias("upper_band"),
                    F.round(ma - F.lit(2.0) * sd, 6).alias("lower_band"),
                    (F.col("cnt").cast("double") > upper).cast("int")
                    .alias("breach_hi"))
            .orderBy("event_type", "day"))


@query(
    "win_rolling_regression",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(SUM(CAST(ROUND(value * 100.0) AS BIGINT)) AS BIGINT) AS yc
      FROM events GROUP BY 1, 2
    ),
    w AS (
      SELECT event_type, d, yc,
             CAST(COUNT(*) OVER win AS BIGINT) AS n,
             MIN(d) OVER win AS d0,
             CAST(SUM(CAST(yc AS DECIMAL(38,0))) OVER win
               AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(d - DATE '1970-01-01' AS DECIMAL(38,0))
                      * CAST(yc AS DECIMAL(38,0))) OVER win
               AS DECIMAL(38,0)) AS sdy
      FROM daily
      WINDOW win AS (PARTITION BY event_type ORDER BY d
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    )
    SELECT event_type, CAST(d AS VARCHAR) AS day,
           ROUND(CAST(14 * (sdy - CAST(d0 - DATE '1970-01-01'
                                       AS DECIMAL(38,0)) * sy)
                      - 91 * sy AS DOUBLE) / 3185.0, 6) AS slope_cents,
           CAST(CAST(14 * (sdy - CAST(d0 - DATE '1970-01-01'
                                      AS DECIMAL(38,0)) * sy)
                     - 91 * sy AS DOUBLE) > 0.0 AS INT) AS rising
    FROM w WHERE n = 14 AND d - d0 = 13
    ORDER BY event_type, day
    """,
    doc="14-day rolling OLS slope of per-type DAILY revenue — the "
        "trend-detection window a monitoring stack runs beside the "
        "Bollinger bands. Same scale shape as ts_bollinger_daily: the "
        "fact table rolls up ONCE to (type, day) integer cents, the "
        "window runs over calendar-bounded rows. The regression is the "
        "closed form over EXACT integer window sums: with gapless "
        "14-day frames the x design is fixed (x = day - window start in "
        "0..13, so sum x = 91, sum x^2 = 819, and 14*819 - 91^2 = 3185 "
        "is a CONSTANT denominator), and sum xy decomposes as "
        "sum(epoch_day * y) - d0 * sum(y) — two window sums, both in "
        "DECIMAL(38,0) (epoch-day x cents products cross bigint once "
        "daily cents pass ~3e13; non-ANSI Spark would wrap SILENTLY "
        "while DuckDB widens — the established divergence class). The "
        "slope is one double cast of an exact integer, so both the "
        "rounded value AND the rising comparison land bit-identically "
        "in both engines. Gapless guard: the 14-row frame must span "
        "exactly 13 calendar days (ROWS frames silently bridge "
        "zero-revenue days, which have no rollup row)",
)
def win_rolling_regression(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type", F.col("ts").cast("date").alias("d"))
             .agg(F.sum(F.round(F.col("value") * 100.0, 0).cast("bigint"))
                  .cast("bigint").alias("yc")))
    win = (Window.partitionBy("event_type").orderBy("d")
           .rowsBetween(-13, 0))
    epoch = F.datediff(F.col("d"), F.lit("1970-01-01"))
    dec = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    w = (daily
         .withColumn("n", F.count("*").over(win).cast("bigint"))
         .withColumn("d0", F.min("d").over(win))
         .withColumn("sy", F.sum(dec(F.col("yc"))).over(win)
                     .cast("decimal(38,0)"))
         .withColumn("sdy", F.sum(dec(epoch) * dec(F.col("yc"))).over(win)
                     .cast("decimal(38,0)")))
    e0 = dec(F.datediff(F.col("d0"), F.lit("1970-01-01")))
    num = (F.lit(14) * (F.col("sdy") - e0 * F.col("sy"))
           - F.lit(91) * F.col("sy")).cast("double")
    return (w.filter((F.col("n") == 14)
                     & (F.datediff(F.col("d"), F.col("d0")) == 13))
            .select("event_type", F.col("d").cast("string").alias("day"),
                    F.round(num / F.lit(3185.0), 6).alias("slope_cents"),
                    (num > F.lit(0.0)).cast("int").alias("rising"))
            .orderBy("event_type", "day"))


@query(
    "ts_mase_backtest",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    mx AS (SELECT MAX(d) AS mxd FROM daily),
    fc AS (
      SELECT a.event_type AS et, CAST(SUM(ABS(a.cnt - b.cnt)) AS BIGINT)
               AS sae_f,
             CAST(COUNT(*) AS BIGINT) AS n_f
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type AND b.d = a.d - 7
      CROSS JOIN mx WHERE a.d > mx.mxd - 7
      GROUP BY 1
    ),
    nv AS (
      SELECT a.event_type AS et, CAST(SUM(ABS(a.cnt - b.cnt)) AS BIGINT)
               AS sae_n,
             CAST(COUNT(*) AS BIGINT) AS n_n
      FROM daily a JOIN daily b
        ON b.event_type = a.event_type AND b.d = a.d - 1
      CROSS JOIN mx WHERE a.d <= mx.mxd - 7
      GROUP BY 1
    )
    SELECT f.et AS event_type, f.n_f AS n_test, n.n_n AS n_train_steps,
           ROUND(CAST(f.sae_f AS DOUBLE) / CAST(f.n_f AS DOUBLE), 6)
             AS mae_forecast,
           ROUND(CAST(n.sae_n AS DOUBLE) / CAST(n.n_n AS DOUBLE), 6)
             AS mae_naive,
           ROUND((CAST(f.sae_f AS DOUBLE) / CAST(f.n_f AS DOUBLE))
                 / (CAST(n.sae_n AS DOUBLE) / CAST(n.n_n AS DOUBLE)), 6)
             AS mase
    FROM fc f JOIN nv n ON n.et = f.et
    WHERE n.sae_n > 0
    ORDER BY event_type
    """,
    doc="forecast-accuracy backtest: seasonal-naive (ŷ_d = y_{d-7}) "
        "evaluated on the final week, scored by MASE — MAE of the model "
        "over MAE of the in-sample one-step naive walk, the scale-free "
        "metric that makes error comparable across series of different "
        "volume (MASE < 1 beats the naive baseline). The fact scan rolls "
        "up once to (type, day) integer counts (cached: it feeds both "
        "lag alignments); the 7-lag and 1-lag alignments are equi-joins "
        "of that calendar-sized aggregate with itself. Absolute errors "
        "are integer sums, MAEs exact-integer divisions, and MASE a "
        "division of those two deterministic doubles — bit-identical "
        "across engines with no order pinning. Zero-variance train "
        "series are excluded by an integer guard (sae_n > 0)",
)
def ts_mase_backtest(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type", F.col("ts").cast("date").alias("d"))
             .agg(F.count("*").cast("bigint").alias("cnt"))
             .cache())
    mx = daily.agg(F.max("d").alias("mxd"))
    base = daily.crossJoin(F.broadcast(mx))
    b = daily.select(F.col("event_type").alias("et2"),
                     F.col("d").alias("d2"), F.col("cnt").alias("prev"))

    def _align(df, lag, pred):
        j = df.join(b, (F.col("event_type") == F.col("et2"))
                    & (F.expr(f"date_add(d, -{lag})") == F.col("d2")))
        return (j.filter(pred)
                .groupBy(F.col("event_type").alias("et"))
                .agg(F.sum(F.abs(F.col("cnt") - F.col("prev")))
                     .cast("bigint").alias("sae"),
                     F.count("*").cast("bigint").alias("n")))

    fc = _align(base, 7, F.col("d") > F.expr("date_add(mxd, -7)"))
    nv = _align(base, 1, F.col("d") <= F.expr("date_add(mxd, -7)"))
    mae_f = F.col("sae_f").cast("double") / F.col("n_f").cast("double")
    mae_n = F.col("sae_n").cast("double") / F.col("n_n").cast("double")
    return (fc.select(F.col("et"), F.col("sae").alias("sae_f"),
                      F.col("n").alias("n_f"))
            .join(nv.select(F.col("et").alias("et2"),
                            F.col("sae").alias("sae_n"),
                            F.col("n").alias("n_n")),
                  F.col("et") == F.col("et2"))
            .filter(F.col("sae_n") > 0)
            .select(F.col("et").alias("event_type"),
                    F.col("n_f").alias("n_test"),
                    F.col("n_n").alias("n_train_steps"),
                    F.round(mae_f, 6).alias("mae_forecast"),
                    F.round(mae_n, 6).alias("mae_naive"),
                    F.round(mae_f / mae_n, 6).alias("mase"))
            .orderBy("event_type"))


@query(
    "ts_corr_matrix",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS cnt
      FROM events GROUP BY 1, 2
    ),
    p AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.cnt AS x, b.cnt AS y
      FROM daily a JOIN daily b ON b.d = a.d AND a.event_type < b.event_type
    ),
    s AS (
      SELECT type_a, type_b, CAST(COUNT(*) AS DECIMAL(38,0)) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
             CAST(SUM(CAST(y AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
               AS DECIMAL(38,0)) AS sxy,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
               AS DECIMAL(38,0)) AS sx2,
             CAST(SUM(CAST(y AS DECIMAL(38,0)) * CAST(y AS DECIMAL(38,0)))
               AS DECIMAL(38,0)) AS sy2
      FROM p GROUP BY 1, 2
    )
    SELECT type_a, type_b, CAST(n AS BIGINT) AS n_days,
           ROUND(CAST(n*sxy - sx*sy AS DOUBLE)
                 / SQRT(CAST(n*sx2 - sx*sx AS DOUBLE)
                        * CAST(n*sy2 - sy*sy AS DOUBLE)), 6) AS r
    FROM s WHERE n >= 3 AND n*sx2 > sx*sx AND n*sy2 > sy*sy
    ORDER BY type_a, type_b
    """,
    doc="cross-series co-movement: the Pearson correlation matrix between "
        "the DAILY counts of every event-type pair (upper triangle) — "
        "which metrics move together, the first question any metric "
        "dashboard answers. One fact rollup to (type, day) integer "
        "counts; same-day alignment is a self-equi-join on the day key of "
        "that calendar-bounded aggregate (types^2 x days rows, never raw "
        "events), and r comes from the closed form over six EXACT integer "
        "sums — hash-exact with no order pinning, zero-variance series "
        "excluded by integer guards. The sibling of ts_acf (auto- vs "
        "cross-correlation, both on the same rollup shape)",
)
def ts_corr_matrix(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type", F.col("ts").cast("date").alias("d"))
             .agg(F.count("*").cast("bigint").alias("cnt"))
             .cache())
    a = daily.select(F.col("event_type").alias("type_a"), "d",
                     F.col("cnt").alias("x"))
    b = daily.select(F.col("event_type").alias("type_b"),
                     F.col("d").alias("d2"), F.col("cnt").alias("y"))
    p = a.join(b, (F.col("d") == F.col("d2"))
               & (F.col("type_a") < F.col("type_b")))
    # Σx², Σxy and the n·Σx² − (Σx)² products in DECIMAL(38,0): daily
    # counts past ~1e9 wrap these in bigint (silently, in non-ANSI Spark)
    xd = F.col("x").cast("decimal(38,0)")
    yd = F.col("y").cast("decimal(38,0)")
    s = (p.groupBy("type_a", "type_b")
         .agg(F.count("*").cast("decimal(38,0)").alias("n"),
              F.sum(xd).cast("decimal(38,0)").alias("sx"),
              F.sum(yd).cast("decimal(38,0)").alias("sy"),
              F.sum(xd * yd).cast("decimal(38,0)").alias("sxy"),
              F.sum(xd * xd).cast("decimal(38,0)").alias("sx2"),
              F.sum(yd * yd).cast("decimal(38,0)").alias("sy2")))
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) \
        .cast("double")
    vx = (F.col("n") * F.col("sx2") - F.col("sx") * F.col("sx")) \
        .cast("double")
    vy = (F.col("n") * F.col("sy2") - F.col("sy") * F.col("sy")) \
        .cast("double")
    return (s.filter((F.col("n") >= 3)
                     & (F.col("n") * F.col("sx2") > F.col("sx") * F.col("sx"))
                     & (F.col("n") * F.col("sy2") > F.col("sy") * F.col("sy")))
            .select("type_a", "type_b",
                    F.col("n").cast("bigint").alias("n_days"),
                    F.round(num / F.sqrt(vx * vy), 6).alias("r"))
            .orderBy("type_a", "type_b"))


@query(
    "abtest_welch_t",
    """
    WITH x AS (
      SELECT c.c_mktsegment AS seg,
             CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    ),
    s AS (
      SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS s1,
             CAST(SUM(CAST(cents AS DECIMAL(38,0))
                      * CAST(cents AS DECIMAL(38,0))) AS DOUBLE) AS s2
      FROM x GROUP BY seg
    ),
    w AS (
      SELECT
        MAX(CASE WHEN seg = 'BUILDING' THEN CAST(n AS DOUBLE) END) AS na,
        MAX(CASE WHEN seg = 'BUILDING' THEN s1 END) AS sa,
        MAX(CASE WHEN seg = 'BUILDING' THEN s2 END) AS qa,
        MAX(CASE WHEN seg = 'AUTOMOBILE' THEN CAST(n AS DOUBLE) END) AS nb,
        MAX(CASE WHEN seg = 'AUTOMOBILE' THEN s1 END) AS sb,
        MAX(CASE WHEN seg = 'AUTOMOBILE' THEN s2 END) AS qb
      FROM s
    ),
    v AS (
      SELECT na, nb, sa, sb,
             ((qa - sa*sa/na) / (na - 1.0)) / na AS va,
             ((qb - sb*sb/nb) / (nb - 1.0)) / nb AS vb
      FROM w
    )
    SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
           ROUND((sa/na - sb/nb) / 100.0, 4) AS mean_diff_dollars,
           ROUND((sa/na - sb/nb) / SQRT(va + vb), 6) AS t_stat,
           ROUND((va + vb) * (va + vb)
                 / ((va * va) / (na - 1.0) + (vb * vb) / (nb - 1.0)), 2)
             AS welch_df
    FROM v
    """,
    doc="two-sample Welch t-test on order value between customer "
        "segments — the continuous-metric A/B readout beside "
        "abtest_conversion_z's proportion z-test. Prices fix to integer "
        "cents; the sum of squares is accumulated in DECIMAL(38,0) "
        "(bigint would wrap at ~1e19 — cents^2 crosses that near sf1, "
        "and non-ANSI Spark wraps SILENTLY) so both engines sum exactly "
        "in any order, then convert once to double (correctly-rounded in "
        "both). Each arm collapses to one (n, Σx, Σx²) row via partial "
        "agg — the whole test is a one-scan closed form; t, and the "
        "Welch-Satterthwaite df, use explicit multiplies (no libm POW). "
        "Degrees of freedom reported so a notebook can look up the "
        "critical value; |t| < 2 here == the segments spend the same",
)
def abtest_welch_t(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    x = (o.join(dim_broadcast(
            c.filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
            .select("c_custkey", F.col("c_mktsegment").alias("seg")),
            sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"))
         .select("seg", F.floor(F.col("o_totalprice") * 100 + 0.5)
                 .cast("bigint").alias("cents")))
    dec = F.col("cents").cast("decimal(19,0)")
    s = (x.groupBy("seg")
         .agg(F.count("*").cast("bigint").alias("n"),
              F.sum(dec).cast("double").alias("s1"),
              F.sum(dec * dec).cast("double").alias("s2")))

    def arm(seg, col):
        return F.max(F.when(F.col("seg") == seg, F.col(col)))

    w = s.agg(arm("BUILDING", "n").cast("double").alias("na"),
              arm("BUILDING", "s1").alias("sa"),
              arm("BUILDING", "s2").alias("qa"),
              arm("AUTOMOBILE", "n").cast("double").alias("nb"),
              arm("AUTOMOBILE", "s1").alias("sb"),
              arm("AUTOMOBILE", "s2").alias("qb"))
    na, nb = F.col("na"), F.col("nb")
    sa, sb = F.col("sa"), F.col("sb")
    va = ((F.col("qa") - sa * sa / na) / (na - F.lit(1.0))) / na
    vb = ((F.col("qb") - sb * sb / nb) / (nb - F.lit(1.0))) / nb
    v = w.select(na.alias("na"), nb.alias("nb"), sa.alias("sa"),
                 sb.alias("sb"), va.alias("va"), vb.alias("vb"))
    va, vb = F.col("va"), F.col("vb")
    na, nb, sa, sb = F.col("na"), F.col("nb"), F.col("sa"), F.col("sb")
    diff = sa / na - sb / nb
    return v.select(
        na.cast("bigint").alias("n_a"), nb.cast("bigint").alias("n_b"),
        F.round(diff / F.lit(100.0), 4).alias("mean_diff_dollars"),
        F.round(diff / F.sqrt(va + vb), 6).alias("t_stat"),
        F.round((va + vb) * (va + vb)
                / ((va * va) / (na - F.lit(1.0))
                   + (vb * vb) / (nb - F.lit(1.0))), 2).alias("welch_df"))


_PACF_K = 7


def _pacf_oracle() -> str:
    """Durbin-Levinson unrolled as chained CTEs (the graph_pagerank oracle
    pattern): level k derives phi_k / pacf_k from level k-1 with list ops
    whose folds walk in index order — the same order Spark's aggregate()
    uses, so every float op sees identical inputs in identical order."""
    K = _PACF_K
    ctes = ["""daily AS (
      SELECT event_type,
             DATEDIFF('day', DATE '2024-01-01', CAST(ts AS DATE)) AS di,
             CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    meta AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(CAST(x AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS s,
             CAST(SUM(CAST(x AS DECIMAL(38,0)) * CAST(x AS DECIMAL(38,0)))
               AS DECIMAL(38,0)) AS sxx,
             MIN(di) AS d0, MAX(di) AS d1
      FROM daily GROUP BY 1
    ),
    lagk AS (
      SELECT a.event_type AS et, l.k,
             CAST(SUM(CAST(a.x AS DECIMAL(38,0))
                      * CAST(b.x AS DECIMAL(38,0))) AS DECIMAL(38,0))
               AS sxy,
             CAST(SUM(CAST(a.x AS DECIMAL(38,0))) AS DECIMAL(38,0))
               AS shead,
             CAST(SUM(CAST(b.x AS DECIMAL(38,0))) AS DECIMAL(38,0))
               AS stail
      FROM daily a
      CROSS JOIN (SELECT UNNEST(RANGE(1, %d)) AS k) l
      JOIN daily b ON b.event_type = a.event_type AND b.di = a.di + l.k
      GROUP BY 1, 2
    ),
    gams AS (
      SELECT m.event_type,
             LIST(
               CAST(lagk.sxy AS DOUBLE)
               - (CAST(m.s AS DOUBLE) / CAST(m.n AS DOUBLE))
                 * CAST(lagk.shead + lagk.stail AS DOUBLE)
               + CAST(m.n - lagk.k AS DOUBLE)
                 * (CAST(m.s AS DOUBLE) / CAST(m.n AS DOUBLE))
                 * (CAST(m.s AS DOUBLE) / CAST(m.n AS DOUBLE))
               ORDER BY lagk.k) AS gam,
             MAX(CAST(m.sxx AS DOUBLE)
                 - CAST(m.n AS DOUBLE)
                   * (CAST(m.s AS DOUBLE) / CAST(m.n AS DOUBLE))
                   * (CAST(m.s AS DOUBLE) / CAST(m.n AS DOUBLE))) AS g0
      FROM lagk JOIN meta m ON m.event_type = lagk.et
      WHERE m.d1 - m.d0 + 1 = m.n AND m.n > %d
        AND CAST(m.n AS DECIMAL(38,0)) * m.sxx > m.s * m.s
      GROUP BY 1
    ),
    r AS (
      SELECT event_type, LIST_TRANSFORM(gam, g -> g / g0) AS rho FROM gams
    ),
    lvl1 AS (
      SELECT event_type, rho, [rho[1]] AS phi, [rho[1]] AS pacf FROM r
    )""" % (K + 1, K)]
    for k in range(2, K + 1):
        ctes.append(f"""a{k} AS (
      SELECT event_type, rho, phi, pacf,
             (rho[{k}] - LIST_SUM(LIST_TRANSFORM(RANGE(1, {k}),
                  j -> phi[CAST(j AS INT)] * rho[{k} - CAST(j AS INT)])))
             / (1.0 - LIST_SUM(LIST_TRANSFORM(RANGE(1, {k}),
                  j -> phi[CAST(j AS INT)] * rho[CAST(j AS INT)]))) AS a
      FROM lvl{k - 1}
    ),
    lvl{k} AS (
      SELECT event_type, rho,
             LIST_APPEND(LIST_TRANSFORM(RANGE(1, {k}),
                 j -> phi[CAST(j AS INT)] - a * phi[{k} - CAST(j AS INT)]),
               a) AS phi,
             LIST_APPEND(pacf, a) AS pacf
      FROM a{k}
    )""")
    return ("WITH " + ",\n".join(ctes) + f"""
    SELECT event_type, CAST(t.k AS BIGINT) AS lag,
           ROUND(rho[CAST(t.k AS INT)], 6) AS acf,
           ROUND(pacf[CAST(t.k AS INT)], 6) AS pacf
    FROM lvl{K}, UNNEST(RANGE(1, {K + 1})) AS t(k)
    ORDER BY event_type, lag
    """)


@query(
    "ts_pacf",
    _pacf_oracle(),
    doc="partial autocorrelation (PACF) of the per-type daily count at "
        "lags 1..7 via the Durbin-Levinson recursion — with ts_acf this "
        "completes the ACF/PACF pair every Box-Jenkins order-selection "
        "step reads (PACF cutting off at p identifies the AR(p)). The "
        "autocovariances come from EXACT integer sums (Σxᵢxᵢ₊ₖ, head/"
        "tail sums, n, S) over the same calendar-bounded lag fan-out as "
        "ts_acf (quadratic sums in DECIMAL(38,0): bigint wraps near "
        "1e9-count days) — biased estimator, closed form, no per-element float "
        "sums — and the D-L recursion is then unrolled over the "
        "lag-array column as 7 in-plan levels of array transforms + "
        "index-ordered folds (a recurrence windows cannot express; "
        "state = the φ coefficient array). Identical expression shapes "
        "walk identical doubles in identical order in both engines, so "
        "the face is hash-exact. Non-contiguous or constant series are "
        "excluded by integer guards; sequential depth is 7 regardless of "
        "corpus size, and everything upstream is partial-aggregable",
)
def ts_pacf(spark, sf_dir):
    K = _PACF_K
    ev = T(spark, sf_dir, "events")
    epoch = F.lit("2024-01-01").cast("date")
    daily = (ev.groupBy("event_type",
                        F.datediff(F.col("ts").cast("date"), epoch)
                        .alias("di"))
             .agg(F.count("*").cast("bigint").alias("x"))
             .cache())
    xdec = F.col("x").cast("decimal(38,0)")
    meta = (daily.groupBy("event_type")
            .agg(F.count("*").cast("bigint").alias("n"),
                 F.sum(xdec).cast("decimal(38,0)").alias("s"),
                 F.sum(xdec * xdec).cast("decimal(38,0)").alias("sxx"),
                 F.min("di").alias("d0"), F.max("di").alias("d1")))
    lags = spark.range(1, K + 1).select(F.col("id").alias("k"))
    a = (daily.crossJoin(F.broadcast(lags))
         .select("event_type", "k", (F.col("di") + F.col("k")).alias("dj"),
                 F.col("x").alias("xh")))
    b = daily.select(F.col("event_type").alias("et2"),
                     F.col("di").alias("dj2"), F.col("x").alias("xt"))
    hd = F.col("xh").cast("decimal(38,0)")
    td_ = F.col("xt").cast("decimal(38,0)")
    lagk = (a.join(b, (F.col("event_type") == F.col("et2"))
                   & (F.col("dj") == F.col("dj2")))
            .groupBy("event_type", "k")
            .agg(F.sum(hd * td_).cast("decimal(38,0)").alias("sxy"),
                 F.sum(hd).cast("decimal(38,0)").alias("shead"),
                 F.sum(td_).cast("decimal(38,0)").alias("stail")))
    m = F.col("s").cast("double") / F.col("n").cast("double")
    gam_k = (F.col("sxy").cast("double")
             - m * (F.col("shead") + F.col("stail")).cast("double")
             + (F.col("n") - F.col("k")).cast("double") * m * m)
    g0 = (F.col("sxx").cast("double")
          - F.col("n").cast("double") * m * m)
    gams = (lagk.join(meta, "event_type")
            .filter((F.col("d1") - F.col("d0") + 1 == F.col("n"))
                    & (F.col("n") > K)
                    & (F.col("n").cast("decimal(38,0)") * F.col("sxx")
                       > F.col("s") * F.col("s")))
            .groupBy("event_type")
            .agg(F.transform(
                     F.array_sort(F.collect_list(
                         F.struct(F.col("k"), gam_k.alias("g")))),
                     lambda x: x["g"]).alias("gam"),
                 F.max(g0).alias("g0")))
    lvl = (gams.select(
        "event_type",
        F.transform("gam", lambda g: g / F.col("g0")).alias("rho"))
        .withColumn("phi", F.array(F.element_at("rho", 1)))
        .withColumn("pacf", F.array(F.element_at("rho", 1))))
    for k in range(2, K + 1):
        num = (F.element_at("rho", k)
               - F.aggregate(F.sequence(F.lit(1), F.lit(k - 1)), F.lit(0.0),
                             lambda acc, j: acc + F.element_at("phi", j)
                             * F.element_at("rho", (F.lit(k) - j)
                                            .cast("int"))))
        den = (F.lit(1.0)
               - F.aggregate(F.sequence(F.lit(1), F.lit(k - 1)), F.lit(0.0),
                             lambda acc, j: acc + F.element_at("phi", j)
                             * F.element_at("rho", j)))
        lvl = (lvl.withColumn("a", num / den)
               .withColumn("phi", F.concat(
                   F.transform(F.sequence(F.lit(1), F.lit(k - 1)),
                               lambda j: F.element_at("phi", j)
                               - F.col("a")
                               * F.element_at("phi", (F.lit(k) - j)
                                              .cast("int"))),
                   F.array(F.col("a"))))
               .withColumn("pacf", F.concat("pacf", F.array(F.col("a"))))
               .drop("a"))
    return (lvl.select("event_type", "rho", "pacf",
                       F.explode(F.sequence(F.lit(1), F.lit(K)))
                       .alias("lag"))
            .select("event_type", F.col("lag").cast("bigint").alias("lag"),
                    F.round(F.element_at("rho", F.col("lag").cast("int")), 6)
                    .alias("acf"),
                    F.round(F.element_at("pacf", F.col("lag").cast("int")), 6)
                    .alias("pacf"))
            .orderBy("event_type", "lag"))


@query(
    "seq_pattern_vshape",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
      FROM events GROUP BY 1, 2
    ),
    diffs AS (
      SELECT event_type, d, x,
             CASE WHEN x > LAG(x) OVER w THEN 1
                  WHEN x < LAG(x) OVER w THEN -1 ELSE 0 END AS s,
             ROW_NUMBER() OVER w AS rn
      FROM daily
      WINDOW w AS (PARTITION BY event_type ORDER BY d)
    ),
    runs AS (
      SELECT event_type, s,
             MIN(d) AS run_start, MAX(d) AS run_end,
             CAST(COUNT(*) AS BIGINT) AS len,
             MIN(rn) AS rn0, MAX(rn) AS rn1
      FROM (SELECT *, rn - ROW_NUMBER() OVER (PARTITION BY event_type, s
                                              ORDER BY rn) AS grp
            FROM diffs WHERE s <> 0)
      GROUP BY event_type, s, grp
    ),
    vshapes AS (
      SELECT dn.event_type AS et,
             dn.run_start AS decline_first_day, dn.run_end AS trough_day,
             up.run_end AS recovery_end_day,
             dn.len AS decline_len, up.len AS recovery_len
      FROM runs dn JOIN runs up
        ON up.event_type = dn.event_type AND up.rn0 = dn.rn1 + 1
       AND up.run_start = dn.run_end + 1
       AND dn.s = -1 AND up.s = 1
      WHERE dn.run_end - dn.run_start + 1 = dn.len
        AND up.run_end - up.run_start + 1 = up.len
    )
    SELECT v.et AS event_type,
           CAST(v.decline_first_day AS VARCHAR) AS decline_first_day,
           CAST(v.trough_day AS VARCHAR) AS trough_day,
           CAST(v.recovery_end_day AS VARCHAR) AS recovery_end_day,
           v.decline_len, v.recovery_len, a.x AS trough_value
    FROM vshapes v JOIN daily a
      ON a.event_type = v.et AND a.d = v.trough_day
    WHERE v.decline_len >= 2 AND v.recovery_len >= 2
    ORDER BY event_type, decline_first_day
    """,
    doc="complex-event-processing pattern matching — the MATCH_RECOGNIZE "
        "/ Flink-CEP shape `DOWN{2,} UP{2,}` (a V: sustained decline into "
        "a trough, then sustained recovery) detected over the per-type "
        "daily count, with VARIABLE-length runs (fixed-width lag chains "
        "can't express 'one or more'). Spark has no MATCH_RECOGNIZE; the "
        "engine compiles the pattern to relational algebra: sign-of-diff "
        "-> gaps-and-islands run compression (both windows ride ONE "
        "type-keyed shuffle) -> adjacency self-join of the RUN table "
        "(rows = number of direction changes, calendar-bounded) pairing "
        "each maximal down-run with the up-run that starts where it "
        "ends — with the up-run required to START the calendar day "
        "after the trough and every run required to be day-contiguous "
        "(run-index adjacency alone would stitch a V across a missing "
        "day, since absent rollup rows keep rn consecutive). All "
        "comparisons are integer/date, so the face is hash-exact. "
        "At 100 TB the pattern runs on the rollup, never raw events — "
        "the same fact->state-table split as the CUSUM/streak faces",
)
def seq_pattern_vshape(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type", F.col("ts").cast("date").alias("d"))
             .agg(F.count("*").cast("bigint").alias("x"))
             .cache())
    w = Window.partitionBy("event_type").orderBy("d")
    diffs = (daily
             .withColumn("px", F.lag("x").over(w))
             .withColumn("s", F.when(F.col("x") > F.col("px"), 1)
                         .when(F.col("x") < F.col("px"), -1)
                         .otherwise(0))
             .withColumn("rn", F.row_number().over(w))
             .drop("px"))
    wg = Window.partitionBy("event_type", "s").orderBy("rn")
    runs = (diffs.filter(F.col("s") != 0)
            .withColumn("grp", F.col("rn") - F.row_number().over(wg))
            .groupBy("event_type", "s", "grp")
            .agg(F.min("d").alias("run_start"), F.max("d").alias("run_end"),
                 F.count("*").cast("bigint").alias("len"),
                 F.min("rn").alias("rn0"), F.max("rn").alias("rn1"))
            .drop("grp"))
    # run-index adjacency alone would stitch a V across a missing
    # calendar day (absent rollup rows keep rn consecutive); require
    # day-adjacency at the trough AND intra-run calendar contiguity
    contig = (F.datediff(F.col("run_end"), F.col("run_start")) + 1
              == F.col("len"))
    dn = (runs.filter((F.col("s") == -1) & contig)
          .select(F.col("event_type").alias("et"),
                  F.col("run_start").alias("decline_first_day"),
                  F.col("run_end").alias("trough_day"),
                  F.col("len").alias("decline_len"),
                  F.col("rn1")))
    up = (runs.filter((F.col("s") == 1) & contig)
          .select(F.col("event_type").alias("et2"),
                  F.col("run_start").alias("rstart"),
                  F.col("run_end").alias("recovery_end_day"),
                  F.col("len").alias("recovery_len"),
                  F.col("rn0")))
    v = dn.join(up, (F.col("et") == F.col("et2"))
                & (F.col("rn0") == F.col("rn1") + 1)
                & (F.col("rstart")
                   == F.expr("date_add(trough_day, 1)")))
    tr = daily.select(F.col("event_type").alias("et3"),
                      F.col("d").alias("td"),
                      F.col("x").alias("trough_value"))
    return (v.join(tr, (F.col("et") == F.col("et3"))
                   & (F.col("trough_day") == F.col("td")))
            .filter((F.col("decline_len") >= 2)
                    & (F.col("recovery_len") >= 2))
            .select(F.col("et").alias("event_type"),
                    F.col("decline_first_day").cast("string")
                    .alias("decline_first_day"),
                    F.col("trough_day").cast("string").alias("trough_day"),
                    F.col("recovery_end_day").cast("string")
                    .alias("recovery_end_day"),
                    "decline_len", "recovery_len", "trough_value")
            .orderBy("event_type", "decline_first_day"))


@query(
    "ts_holt_winters",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d, CAST(COUNT(*) AS DOUBLE) AS x
      FROM events GROUP BY 1, 2
    ),
    arrs AS (
      SELECT event_type, LIST(x ORDER BY d) AS xs,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM daily GROUP BY event_type
      HAVING COUNT(*) >= 15 AND MAX(d) - MIN(d) + 1 = COUNT(*)
    ),
    inits AS (
      SELECT event_type, xs, n,
             (xs[1]+xs[2]+xs[3]+xs[4]+xs[5]+xs[6]+xs[7]) / 7.0 AS m1,
             (xs[8]+xs[9]+xs[10]+xs[11]+xs[12]+xs[13]+xs[14]) / 7.0 AS m2
      FROM arrs
    ),
    folded AS (
      SELECT event_type, n,
             LIST_REDUCE(
               LIST_PREPEND(
                 [m1, (m2 - m1) / 7.0,
                  xs[1]-m1, xs[2]-m1, xs[3]-m1, xs[4]-m1,
                  xs[5]-m1, xs[6]-m1, xs[7]-m1],
                 LIST_TRANSFORM(xs[8:],
                   x -> [x, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0])),
               (acc, e) -> [
                 0.5 * (e[1] - acc[3]) + 0.5 * (acc[1] + acc[2]),
                 0.5 * ((0.5 * (e[1] - acc[3]) + 0.5 * (acc[1] + acc[2]))
                        - acc[1]) + 0.5 * acc[2],
                 acc[4], acc[5], acc[6], acc[7], acc[8], acc[9],
                 0.5 * (e[1] - (0.5 * (e[1] - acc[3])
                                + 0.5 * (acc[1] + acc[2])))
                   + 0.5 * acc[3]]) AS st
      FROM inits
    )
    SELECT event_type, n AS n_days,
           ROUND(st[1], 4) AS level, ROUND(st[2], 4) AS trend,
           ROUND(st[3], 4) AS season_next,
           ROUND(st[1] + st[2] + st[3], 4) AS forecast_1d,
           ROUND(st[1] + 7 * st[2] + st[9], 4) AS forecast_7d
    FROM folded
    """,
    doc="Holt-Winters ADDITIVE triple exponential smoothing (alpha=beta="
        "gamma=1/2, weekly season m=7) of the per-type daily count — "
        "completes the forecasting tier: seasonal-naive baseline "
        "(ts_mase_backtest), EWMA, Holt linear, and now level+trend+"
        "seasonality. State is a 9-element array [l, b, s1..s7] rotated "
        "through an ordered fold; every smoothing step is a HALVING "
        "(exact in binary floats) over values derived deterministically "
        "from exact integer day counts, and the init (two week means, "
        "week-1 seasonal offsets) is the same correctly-rounded "
        "expression tree in both engines — so the face is bit-identical "
        "by construction, the 9-state generalization of ts_holt_linear's "
        "argument. Gapped series are EXCLUDED by an integer contiguity "
        "guard (the season index rotates per observed row, so a missing "
        "day would silently shift every later seasonal slot off its "
        "weekday — the ts_pacf guard, same reason). h-step forecast = l + h*b + s_h; 1-day and 7-day "
        "horizons reported. Sequential depth = calendar days AFTER the "
        "partial-agg rollup — the only honest recurrence shape at 100 TB",
)
def ts_holt_winters(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type", F.col("ts").cast("date").alias("d"))
             .agg(F.count("*").cast("double").alias("x")))
    arrs = (daily.groupBy("event_type")
            .agg(F.array_sort(F.collect_list(F.struct("d", "x")))
                 .alias("pts"),
                 F.count("*").cast("bigint").alias("n"),
                 F.min("d").alias("d0"), F.max("d").alias("d1"))
            .filter((F.col("n") >= 15)
                    # the 7-slot season rotates once per OBSERVED row: a
                    # single missing day would shift s_i off its weekday
                    # for the rest of the series — require gapless input
                    & (F.datediff(F.col("d1"), F.col("d0")) + 1
                       == F.col("n")))
            .withColumn("xs", F.transform("pts", lambda p: p["x"])))
    e_ = F.element_at
    wk = lambda o: sum((e_("xs", i + o) for i in range(2, 8)),  # noqa: E731
                       e_("xs", 1 + o))
    inits = (arrs
             .withColumn("m1", wk(0) / F.lit(7.0))
             .withColumn("m2", wk(7) / F.lit(7.0)))
    init = F.array(*([F.col("m1"), (F.col("m2") - F.col("m1")) / F.lit(7.0)]
                     + [e_("xs", i) - F.col("m1") for i in range(1, 8)]))
    rest = F.transform(F.slice(F.col("xs"), 8, F.size("xs") - 7),
                       lambda x: F.array(*([x] + [F.lit(0.0)] * 8)))

    def step(acc, e):
        lp = (F.lit(0.5) * (e[0] - acc[2])
              + F.lit(0.5) * (acc[0] + acc[1]))
        bp = (F.lit(0.5) * ((F.lit(0.5) * (e[0] - acc[2])
                             + F.lit(0.5) * (acc[0] + acc[1])) - acc[0])
              + F.lit(0.5) * acc[1])
        sp = (F.lit(0.5) * (e[0] - (F.lit(0.5) * (e[0] - acc[2])
                                    + F.lit(0.5) * (acc[0] + acc[1])))
              + F.lit(0.5) * acc[2])
        return F.array(lp, bp, acc[3], acc[4], acc[5], acc[6], acc[7],
                       acc[8], sp)

    st = F.aggregate(rest, init, step)
    folded = inits.select("event_type", F.col("n").alias("n_days"),
                          st.alias("st"))
    return folded.select(
        "event_type", "n_days",
        F.round(e_("st", 1), 4).alias("level"),
        F.round(e_("st", 2), 4).alias("trend"),
        F.round(e_("st", 3), 4).alias("season_next"),
        F.round(e_("st", 1) + e_("st", 2) + e_("st", 3), 4)
        .alias("forecast_1d"),
        F.round(e_("st", 1) + F.lit(7) * e_("st", 2) + e_("st", 9), 4)
        .alias("forecast_7d"))


@query(
    "agg_revenue_concentration",
    """
    WITH rev AS (
      SELECT c.c_mktsegment AS seg, o.o_custkey AS ck,
             CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    r AS (
      SELECT seg, cents,
             ROW_NUMBER() OVER (PARTITION BY seg
                                ORDER BY cents DESC, ck) AS rk,
             SUM(cents) OVER (PARTITION BY seg
                              ORDER BY cents DESC, ck) AS cum,
             SUM(cents) OVER (PARTITION BY seg) AS tot,
             COUNT(*) OVER (PARTITION BY seg) AS n_cust
      FROM rev
    )
    SELECT seg, CAST(MIN(rk) AS BIGINT) AS n_top,
           CAST(MAX(n_cust) AS BIGINT) AS n_customers,
           ROUND(CAST(MIN(rk) AS DOUBLE) / CAST(MAX(n_cust) AS DOUBLE), 6)
             AS top_fraction
    FROM r WHERE cum * 5 >= tot * 4
    GROUP BY seg ORDER BY seg
    """,
    doc="revenue concentration (the Pareto 80/20 question): per segment, "
        "the minimum number of top customers whose cumulative revenue "
        "reaches 80% of the segment's total, and what fraction of the "
        "customer base that is — the whale-dependence metric every "
        "account team reads. Revenue fixes to integer cents and "
        "collapses to one row per (segment, customer); the ranking + "
        "running-sum + total windows all ride ONE segment-keyed shuffle "
        "over that customer-sized table, and the 80% selection is the "
        "integer cross-multiplication cum*5 >= tot*4 — no float "
        "threshold, deterministic ties via (cents DESC, custkey). "
        "top_fraction ~0.67 here (uniform synthetic spend); a real "
        "Zipf-spend book reads ~0.2 — the face measures exactly that "
        "deviation",
)
def agg_revenue_concentration(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    rev = (o.join(dim_broadcast(c.select("c_custkey",
                                          F.col("c_mktsegment").alias("seg")),
                              sf_dir, "customer"),
                  F.col("o_custkey") == F.col("c_custkey"))
           .groupBy("seg", F.col("o_custkey").alias("ck"))
           .agg(F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5)
                      .cast("bigint")).cast("bigint").alias("cents")))
    order = [F.desc("cents"), F.asc("ck")]
    run = (Window.partitionBy("seg").orderBy(*order)
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    seg = Window.partitionBy("seg")
    r = (rev.withColumn("rk", F.row_number().over(
            Window.partitionBy("seg").orderBy(*order)))
         .withColumn("cum", F.sum("cents").over(run))
         .withColumn("tot", F.sum("cents").over(seg))
         .withColumn("n_cust", F.count("*").over(seg)))
    return (r.filter(F.col("cum") * 5 >= F.col("tot") * 4)
            .groupBy("seg")
            .agg(F.min("rk").cast("bigint").alias("n_top"),
                 F.max("n_cust").cast("bigint").alias("n_customers"))
            .select("seg", "n_top", "n_customers",
                    F.round(F.col("n_top").cast("double")
                            / F.col("n_customers").cast("double"), 6)
                    .alias("top_fraction"))
            .orderBy("seg"))


@query(
    "win_rolling_distinct_users",
    """
    WITH du AS (SELECT DISTINCT CAST(ts AS DATE) AS d, user_id FROM events),
    days AS (SELECT DISTINCT d FROM du)
    SELECT CAST(days.d AS VARCHAR) AS day,
           CAST(COUNT(DISTINCT du.user_id) AS BIGINT) AS rolling_7d_users
    FROM days JOIN du ON du.d BETWEEN days.d - 6 AND days.d
    GROUP BY days.d ORDER BY days.d
    """,
    doc="rolling 7-day distinct users (weekly active users per day) — "
        "the canonical HARD window: COUNT(DISTINCT) doesn't distribute "
        "over sliding frames, and re-joining each day against its "
        "trailing week (the oracle's formulation) re-touches raw ids 7x. "
        "The engine instead ORs per-(bucket, day) EXACT Spark-4 bitmaps "
        "through a RANGE-framed window over a dense day x bucket grid: "
        "day bitmaps build once from one scan (the agg_bitmap_distinct "
        "rollup), each rolling union is fixed-size bit math, per-day "
        "totals sum bucket popcounts. The grid join keeps a bucket's "
        "older bitmaps in frame on days it gains no new users (RANGE, "
        "not ROWS, so calendar gaps can't silently shift the frame). "
        "EXACT — bitmaps, not sketches — and mergeable at 100 TB: day "
        "bitmaps persist once, any window length re-ORs them without "
        "touching raw ids",
)
def win_rolling_distinct_users(spark, sf_dir):
    ev = T(spark, sf_dir, "events")
    cell = (ev.select(F.col("ts").cast("date").alias("d"), "user_id")
            .distinct()
            .groupBy("d", F.expr("bitmap_bucket_number(user_id)")
                     .alias("bucket"))
            .agg(F.expr("bitmap_construct_agg(bitmap_bit_position(user_id))")
                 .alias("bm")))
    days = cell.select("d").distinct()
    buckets = cell.select("bucket").distinct()
    grid = (days.crossJoin(F.broadcast(buckets))
            .join(cell, ["d", "bucket"], "left")
            .withColumn("di", F.datediff(
                F.col("d"), F.lit("2024-01-01").cast("date"))))
    win = (Window.partitionBy("bucket").orderBy("di")
           .rangeBetween(-6, 0))
    rolled = (grid
              .withColumn("rolled_bm", F.expr("bitmap_or_agg(bm)").over(win))
              .withColumn("cnt", F.coalesce(
                  F.expr("bitmap_count(rolled_bm)").cast("bigint"),
                  F.lit(0).cast("bigint"))))
    return (rolled.groupBy("d")
            .agg(F.sum("cnt").cast("bigint").alias("rolling_7d_users"))
            .select(F.col("d").cast("string").alias("day"),
                    "rolling_7d_users")
            .orderBy("day"))


@query(
    "abtest_mann_whitney",
    """
    WITH x AS (
      SELECT c.c_mktsegment AS seg,
             CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS v
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      WHERE c.c_mktsegment IN ('BUILDING', 'AUTOMOBILE')
    ),
    g AS (
      SELECT v,
             CAST(SUM(CASE WHEN seg = 'BUILDING' THEN 1 ELSE 0 END)
               AS BIGINT) AS ca,
             CAST(COUNT(*) AS BIGINT) AS t
      FROM x GROUP BY v
    ),
    w AS (
      SELECT v, ca, t,
             CAST(COALESCE(SUM(t) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS cum
      FROM g
    ),
    s AS (
      SELECT CAST(SUM(ca) AS BIGINT) AS na,
             CAST(SUM(t - ca) AS BIGINT) AS nb,
             CAST(SUM(ca * (2 * cum + t + 1)) AS BIGINT) AS s2,
             CAST(SUM(CAST(t AS DECIMAL(38,0)) * CAST(t AS DECIMAL(38,0))
                      * CAST(t AS DECIMAL(38,0))
                      - CAST(t AS DECIMAL(38,0))) AS DOUBLE) AS tie3
      FROM w
    )
    SELECT na, nb,
           (2.0 * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
            + CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) + 1.0)
            - CAST(s2 AS DOUBLE)) / 2.0 AS u_stat,
           ROUND(
             ((2.0 * CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)
               + CAST(na AS DOUBLE) * (CAST(na AS DOUBLE) + 1.0)
               - CAST(s2 AS DOUBLE)) / 2.0
              - CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 2.0)
             / SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0
                    * ((CAST(na + nb AS DOUBLE) + 1.0)
                       - tie3 / (CAST(na + nb AS DOUBLE)
                                 * (CAST(na + nb AS DOUBLE) - 1.0)))), 6)
             AS z
    FROM s
    """,
    doc="Mann-Whitney U (Wilcoxon rank-sum) on order value between "
        "customer segments — the NONPARAMETRIC mate of abtest_welch_t "
        "for revenue metrics whose heavy tails break the t-test. The "
        "trick is the VALUE-DOMAIN rollup: instead of ranking raw rows "
        "(a global sort at 100 TB), rows collapse to one row per "
        "distinct cents value with per-arm counts, and the tie-averaged "
        "rank sum comes out of exact INTEGER arithmetic — 2·R_A = "
        "Σ ca·(2·cum + t + 1) over the bounded distinct-value table, so "
        "U = na·nb + na(na+1)/2 − R_A involves only integer sums and "
        "exact halvings. The normal approximation applies the standard "
        "tie correction, with Σ(t³−t) accumulated in DECIMAL(38,0) "
        "(t³ crosses bigint range on heavily tied domains at scale). "
        "One scan, one value-keyed window, one closed form — and "
        "bit-identical across engines with no order pinning because "
        "every float input is an exact integer or halving. The global "
        "cumulative window runs single-partition over the PRICE-DOMAIN "
        "rollup (same posture as dq_ks_drift's ECDF); past ~1e7 "
        "distinct values the two-phase bucketed-offsets pattern of "
        "global_row_index slots in unchanged",
)
def abtest_mann_whitney(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    x = (o.join(dim_broadcast(
            c.filter(F.col("c_mktsegment").isin("BUILDING", "AUTOMOBILE"))
            .select("c_custkey", F.col("c_mktsegment").alias("seg")),
            sf_dir, "customer"),
            F.col("o_custkey") == F.col("c_custkey"))
         .select("seg", F.floor(F.col("o_totalprice") * 100 + 0.5)
                 .cast("bigint").alias("v")))
    g = (x.groupBy("v")
         .agg(F.sum(F.when(F.col("seg") == "BUILDING", 1).otherwise(0))
              .cast("bigint").alias("ca"),
              F.count("*").cast("bigint").alias("t")))
    run = (Window.orderBy("v")
           .rowsBetween(Window.unboundedPreceding, -1))
    w = g.withColumn("cum", F.coalesce(F.sum("t").over(run),
                                       F.lit(0)).cast("bigint"))
    td = F.col("t").cast("decimal(38,0)")
    s = w.agg(
        F.sum("ca").cast("bigint").alias("na"),
        F.sum(F.col("t") - F.col("ca")).cast("bigint").alias("nb"),
        F.sum(F.col("ca") * (2 * F.col("cum") + F.col("t") + 1))
        .cast("bigint").alias("s2"),
        F.sum(td * td * td - td).cast("double").alias("tie3"))
    na = F.col("na").cast("double")
    nb = F.col("nb").cast("double")
    u = (F.lit(2.0) * na * nb + na * (na + F.lit(1.0))
         - F.col("s2").cast("double")) / F.lit(2.0)
    n = na + nb
    var = (na * nb / F.lit(12.0)
           * ((n + F.lit(1.0))
              - F.col("tie3") / (n * (n - F.lit(1.0)))))
    return s.select("na", "nb", u.alias("u_stat"),
                    F.round((u - na * nb / F.lit(2.0)) / F.sqrt(var), 6)
                    .alias("z"))


@query(
    "agg_gini_coefficient",
    """
    WITH rev AS (
      SELECT c.c_mktsegment AS seg, o.o_custkey AS ck,
             CAST(SUM(CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    r AS (
      SELECT seg, cents,
             ROW_NUMBER() OVER (PARTITION BY seg ORDER BY cents, ck) AS rk
      FROM rev
    ),
    s AS (
      SELECT seg, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(cents) AS BIGINT) AS sx,
             CAST(SUM(CAST(rk AS DECIMAL(38,0))
                      * CAST(cents AS DECIMAL(38,0)))
                  AS DECIMAL(38,0)) AS srx
      FROM r GROUP BY seg
    )
    SELECT seg, n AS n_customers,
           ROUND(CAST(2 * srx - (CAST(n AS DECIMAL(38,0)) + 1)
                      * CAST(sx AS DECIMAL(38,0)) AS DOUBLE)
                 / (CAST(n AS DOUBLE) * CAST(sx AS DOUBLE)), 6) AS gini
    FROM s ORDER BY seg
    """,
    doc="Gini coefficient of customer spend per segment — the standard "
        "inequality index (0 = everyone spends alike, ->1 = one whale), "
        "the continuous companion to agg_revenue_concentration's 80/20 "
        "cut, from the same customer-sized rollup and the same one "
        "segment-keyed shuffle. Uses the rank form G = (2·Σ rk·x − "
        "(n+1)·Σx) / (n·Σx) with ties pinned by (cents, custkey): rk·x "
        "accumulates in DECIMAL(38,0) (rank x cents crosses bigint near "
        "sf100) so the sum is exact in any order, then ONE cast to "
        "double and one division — deterministic in both engines. "
        "~0.20 here (uniform synthetic spend); a real book reads "
        "0.6-0.9 — this face is the drift monitor for that",
)
def agg_gini_coefficient(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    rev = (o.join(dim_broadcast(c.select("c_custkey",
                                          F.col("c_mktsegment").alias("seg")),
                              sf_dir, "customer"),
                  F.col("o_custkey") == F.col("c_custkey"))
           .groupBy("seg", F.col("o_custkey").alias("ck"))
           .agg(F.sum(F.floor(F.col("o_totalprice") * 100 + 0.5)
                      .cast("bigint")).cast("bigint").alias("cents")))
    r = rev.withColumn("rk", F.row_number().over(
        Window.partitionBy("seg").orderBy(F.asc("cents"), F.asc("ck"))))
    dec = lambda col: F.col(col).cast("decimal(38,0)")  # noqa: E731
    s = (r.groupBy("seg")
         .agg(F.count("*").cast("bigint").alias("n"),
              F.sum("cents").cast("bigint").alias("sx"),
              F.sum(dec("rk") * dec("cents")).cast("decimal(38,0)")
              .alias("srx")))
    num = (F.lit(2) * F.col("srx")
           - (F.col("n").cast("decimal(38,0)") + 1)
           * F.col("sx").cast("decimal(38,0)")).cast("double")
    den = F.col("n").cast("double") * F.col("sx").cast("double")
    return (s.select("seg", F.col("n").alias("n_customers"),
                     F.round(num / den, 6).alias("gini"))
            .orderBy("seg"))


_LTTB_OUT = 12                 # points kept per series
_LTTB_NB = _LTTB_OUT - 2       # interior buckets (endpoints always kept)


def _lttb_oracle() -> str:
    nb = _LTTB_NB
    # DuckDB lambdas cannot host correlated subqueries, so every helper
    # (bucket bounds, next-bucket sums, the max area) is expanded by
    # TEXTUAL macro substitution — the generated SQL is long but each
    # term is the same exact-integer expression the Spark side builds.
    # j and acc come from the LIST_REDUCE lambda (e = [j], prev =
    # acc[-1]); DuckDB lists are 1-based, so 0-based index i reads [i+1]
    s = lambda k: f"(1 + ({k} * (m - 2)) // {nb})"           # noqa: E731
    prev, j = "acc[-1]", "e[1]"
    lo, hi = s(j), f"({s(f'({j} + 1)')} - 1)"
    nlo = s(f"({j} + 1)")
    nhi = f"LEAST({s(f'({j} + 2)')} - 1, m - 1)"
    cnt = f"({nhi} - {nlo} + 1)"
    sx = f"LIST_SUM(ds[{nlo} + 1 : {nhi} + 1])"
    sy = f"LIST_SUM(ys[{nlo} + 1 : {nhi} + 1])"
    pre = (f"LIST_TRANSFORM(RANGE(0, {nb}), "
           "j -> [CAST(j AS BIGINT)])")

    def area(i):
        return (f"ABS((ds[{prev} + 1] * {cnt} - {sx}) * (ys[{i} + 1] "
                f"- ys[{prev} + 1]) - (ds[{prev} + 1] - ds[{i} + 1]) "
                f"* ({sy} - ys[{prev} + 1] * {cnt}))")

    amax = (f"LIST_AGGREGATE(LIST_TRANSFORM(RANGE({lo}, {hi} + 1), "
            f"i -> {area('i')}), 'max')")
    pick = (f"LIST_MIN(LIST_FILTER(RANGE({lo}, {hi} + 1), "
            f"i -> {area('i')} = {amax}))")
    return f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS d,
             CAST(COUNT(*) AS BIGINT) AS y
      FROM events GROUP BY 1, 2
    ),
    arrs AS (
      SELECT event_type, LIST(d ORDER BY d) AS dsd,
             LIST(y ORDER BY d) AS ys,
             CAST(COUNT(*) AS BIGINT) AS m
      FROM daily GROUP BY event_type HAVING COUNT(*) >= {_LTTB_OUT}
    ),
    conv AS (
      SELECT event_type, dsd, ys, m,
             LIST_TRANSFORM(dsd,
               x -> CAST(x - DATE '1970-01-01' AS BIGINT)) AS ds
      FROM arrs
    ),
    folded AS (
      SELECT event_type, dsd, ys, m,
             LIST_APPEND(
               LIST_REDUCE(LIST_PREPEND([CAST(0 AS BIGINT)], {pre}),
                           (acc, e) -> LIST_APPEND(acc, {pick})),
               m - 1) AS sel
      FROM conv
    )
    SELECT event_type, CAST(g.pick_no AS BIGINT) AS pick_no,
           STRFTIME(dsd[sel[g.pick_no] + 1], '%Y-%m-%d') AS d,
           ys[sel[g.pick_no] + 1] AS y
    FROM folded, (SELECT UNNEST(RANGE(1, {_LTTB_OUT} + 1)) AS pick_no) g
    """


@query(
    "ts_lttb_downsample",
    _lttb_oracle(),
    doc=f"LTTB downsampling (Steinarsson 2013, the Grafana/Timescale "
        f"visualization reducer): each per-type daily series keeps "
        f"{_LTTB_OUT} points — both endpoints plus, per interior bucket, "
        "the point forming the LARGEST TRIANGLE with the previously "
        "selected point and the next bucket's centroid, which preserves "
        "spikes and inflections a plain every-kth sample erases. The "
        "centroid division is eliminated by cross-multiplying the area "
        "comparison through the next-bucket count, so every candidate "
        "score is an exact |bigint| and the argmax (ties -> smallest "
        "index) is hash-exact with no float anywhere. Sequential "
        "dependency (each pick anchors the next triangle) rides as a "
        "growing index array through an ordered fold over the FIXED "
        f"{_LTTB_NB} buckets (F.aggregate vs LIST_REDUCE) — after the "
        "partial-agg day rollup, so the sequential work is bucket-count "
        "per series, never fact-sized: the honest shape for any "
        "visualization pipeline at 100 TB",
)
def ts_lttb_downsample(spark, sf_dir):
    nb = _LTTB_NB
    ev = T(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type", F.col("ts").cast("date").alias("d"))
             .agg(F.count("*").cast("bigint").alias("y")))
    arrs = (daily.groupBy("event_type")
            .agg(F.array_sort(F.collect_list(F.struct("d", "y")))
                 .alias("pts"),
                 F.count("*").cast("bigint").alias("m"))
            .filter(F.col("m") >= _LTTB_OUT)
            .withColumn("dsd", F.transform("pts", lambda p: p["d"]))
            .withColumn("ds", F.transform(
                "pts", lambda p: F.unix_date(p["d"]).cast("bigint")))
            .withColumn("ys", F.transform("pts", lambda p: p["y"])))

    div = lambda x: ((x - F.pmod(x, F.lit(nb))) / F.lit(nb)) \
        .cast("bigint")                                       # noqa: E731
    mm = F.col("m")
    s_at = lambda k: F.lit(1) + div(k * (mm - 2))             # noqa: E731

    def merge(acc, j):
        prev = F.element_at(acc, -1)
        lo = s_at(j)
        hi = s_at(j + 1) - 1
        nlo = s_at(j + 1)
        nhi = F.least(s_at(j + 2) - 1, mm - 1)
        cnt = nhi - nlo + 1
        zero = F.lit(0).cast("bigint")
        sx = F.aggregate(
            F.slice(F.col("ds"), (nlo + 1).cast("int"), cnt.cast("int")),
            zero, lambda a, x: a + x)
        sy = F.aggregate(
            F.slice(F.col("ys"), (nlo + 1).cast("int"), cnt.cast("int")),
            zero, lambda a, x: a + x)
        pd_ = F.element_at(F.col("ds"), (prev + 1).cast("int"))
        py_ = F.element_at(F.col("ys"), (prev + 1).cast("int"))

        def area(i):
            yi = F.element_at(F.col("ys"), (i + 1).cast("int"))
            di = F.element_at(F.col("ds"), (i + 1).cast("int"))
            return F.abs((pd_ * cnt - sx) * (yi - py_)
                         - (pd_ - di) * (sy - py_ * cnt))

        cands = F.sequence(lo, hi)
        amax = F.array_max(F.transform(cands, area))
        pick = F.array_min(F.filter(cands, lambda i: area(i) == amax))
        return F.concat(acc, F.array(pick))

    picks = F.aggregate(
        F.sequence(F.lit(0).cast("bigint"), F.lit(nb - 1).cast("bigint")),
        F.array(F.lit(0).cast("bigint")), merge)
    sel = F.concat(picks, F.array(mm - 1))
    out = (arrs.select("event_type", "dsd", "ys",
                       F.posexplode(sel).alias("pos", "idx")))
    return out.select(
        "event_type",
        (F.col("pos") + 1).cast("bigint").alias("pick_no"),
        F.date_format(F.element_at(F.col("dsd"),
                                   (F.col("idx") + 1).cast("int")),
                      "yyyy-MM-dd").alias("d"),
        F.element_at(F.col("ys"), (F.col("idx") + 1).cast("int"))
        .alias("y"))


@query(
    "alert_hysteresis_state",
    """
    WITH hourly AS (
      SELECT STRFTIME(TIME_BUCKET(INTERVAL '1 hour', ts),
                      '%Y-%m-%d %H:%M:%S') AS hour,
             CAST(COUNT(*) AS BIGINT) AS n_events,
             CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                  AS BIGINT) AS n_errors
      FROM events GROUP BY 1
    ),
    marked AS (
      SELECT *, CASE WHEN n_errors * 100 > 25 * n_events THEN 1
                     WHEN n_errors * 100 < 15 * n_events THEN 0
                     ELSE NULL END AS mark
      FROM hourly
    ),
    filled AS (
      SELECT hour, n_events, n_errors,
             COALESCE(LAST_VALUE(mark IGNORE NULLS) OVER
                        (ORDER BY hour ROWS UNBOUNDED PRECEDING),
                      0) AS state
      FROM marked
    )
    SELECT hour, n_events, n_errors, CAST(state AS INT) AS state,
           CAST(CASE WHEN state = 1 AND COALESCE(LAG(state) OVER
                       (ORDER BY hour), 0) = 0
                     THEN 1 ELSE 0 END AS INT) AS fired
    FROM filled
    """,
    doc="alerting with HYSTERESIS (Schmitt trigger): the alert turns ON "
        "above a 25% error rate and stays on until the rate drops below "
        "15% — the two-threshold debounce that stops a rate oscillating "
        "around one threshold from paging every hour. Definite states "
        "(above-high -> 1, below-low -> 0) are marked row-locally with "
        "INTEGER cross-multiplied comparisons (n_errors*100 vs "
        "k*n_events — no float rate on the decision path), the "
        "in-between rows carry the previous state via LAST_VALUE IGNORE "
        "NULLS, and `fired` flags the rising edges (the actual pages). "
        "The global window runs over the bounded HOURLY rollup (the "
        "value-domain escape hatch every global-window face documents: "
        "hours per retention window, never raw events); per-service "
        "alerting would partition the same window by service key",
)
def alert_hysteresis_state(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    hourly = (e.groupBy(F.date_format(
        F.window("ts", "1 hour").start, _TS_FMT).alias("hour"))
        .agg(F.count("*").cast("bigint").alias("n_events"),
             F.sum(F.when(F.col("event_type") == "error", 1).otherwise(0))
              .cast("bigint").alias("n_errors")))
    mark = (F.when(F.col("n_errors") * 100 > 25 * F.col("n_events"), 1)
            .when(F.col("n_errors") * 100 < 15 * F.col("n_events"), 0))
    w = Window.orderBy("hour").rowsBetween(Window.unboundedPreceding, 0)
    filled = (hourly.withColumn("mark", mark)
              .withColumn("state",
                          F.coalesce(F.last("mark", ignorenulls=True)
                                     .over(w), F.lit(0))))
    prev = F.lag("state").over(Window.orderBy("hour"))
    return filled.select(
        "hour", "n_events", "n_errors",
        F.col("state").cast("int").alias("state"),
        F.when((F.col("state") == 1) & (F.coalesce(prev, F.lit(0)) == 0),
               1).otherwise(0).cast("int").alias("fired"))


@query(
    "win_ratio_to_report",
    """
    WITH nat AS (
      SELECT n.n_regionkey AS regionkey, c.c_nationkey AS nationkey,
             CAST(SUM(CAST(ROUND(o.o_totalprice * 100.0) AS BIGINT))
                  AS BIGINT) AS cents
      FROM orders o
      JOIN customer c ON c.c_custkey = o.o_custkey
      JOIN nation n   ON n.n_nationkey = c.c_nationkey
      GROUP BY 1, 2
    )
    SELECT regionkey, nationkey, cents,
           ROUND(CAST(cents AS DOUBLE) /
                 CAST(SUM(cents) OVER (PARTITION BY regionkey)
                      AS DOUBLE), 6) AS share_in_region,
           CAST(RANK() OVER (PARTITION BY regionkey
                             ORDER BY cents DESC, nationkey) AS INT)
             AS rank_in_region
    FROM nat
    """,
    doc="ratio-to-report: each nation's share of its region's revenue "
        "plus its in-region rank — the classic BI percent-of-total "
        "window (Oracle's RATIO_TO_REPORT), spelled as a windowed sum "
        "over the NATION-sized rollup. The fact join+agg is the only "
        "corpus-scale work (exact integer cents); both windows share "
        "one regionkey shuffle of 25 rows, and the share is one double "
        "division of exact integers — deterministic, no order pinning",
)
def win_ratio_to_report(spark, sf_dir):
    o = T(spark, sf_dir, "orders")
    c = T(spark, sf_dir, "customer")
    n = T(spark, sf_dir, "nation")
    nat = (o.join(c, c.c_custkey == o.o_custkey)
           .join(F.broadcast(n), n.n_nationkey == c.c_nationkey)
           .groupBy(F.col("n_regionkey").alias("regionkey"),
                    F.col("c_nationkey").alias("nationkey"))
           .agg(F.sum(F.round(F.col("o_totalprice") * 100.0, 0)
                      .cast("bigint"))
                .cast("bigint").alias("cents")))
    wr = Window.partitionBy("regionkey")
    wk = Window.partitionBy("regionkey").orderBy(F.desc("cents"),
                                                 F.asc("nationkey"))
    return nat.select(
        "regionkey", "nationkey", "cents",
        F.round(F.col("cents").cast("double")
                / F.sum("cents").over(wr).cast("double"), 6)
        .alias("share_in_region"),
        F.rank().over(wk).cast("int").alias("rank_in_region"))


@query(
    "ts_seasonal_strength",
    """
    WITH hourly AS (
        SELECT TIME_BUCKET(INTERVAL '1 hour', ts) AS h,
               CAST(SUM(CAST(ROUND(CAST(value AS DOUBLE) * 100)
                             AS BIGINT)) AS DOUBLE) / 100.0 AS v
        FROM events GROUP BY 1
    ),
    trended AS (
        SELECT h, v,
               LIST_SUM(LIST(v) OVER w) / LEN(LIST(v) OVER w) AS trend
        FROM hourly
        WINDOW w AS (ORDER BY h
                     ROWS BETWEEN 12 PRECEDING AND 12 FOLLOWING)
    ),
    seasonal AS (
        SELECT CAST(EXTRACT(hour FROM h) AS INT) AS hod,
               LIST_SUM(LIST(v - trend ORDER BY h))
                   / COUNT(*) AS s
        FROM trended GROUP BY 1
    ),
    comp AS (
        SELECT t.h, t.v - t.trend - s.s AS r,
               t.v - s.s AS tr, t.v - t.trend AS sr
        FROM trended t
        JOIN seasonal s ON CAST(EXTRACT(hour FROM t.h) AS INT) = s.hod
    ),
    arrs AS (
        SELECT LIST(r ORDER BY h) AS ra, LIST(tr ORDER BY h) AS ta,
               LIST(sr ORDER BY h) AS sa,
               CAST(COUNT(*) AS DOUBLE) AS n
        FROM comp
    ),
    vars_ AS (
        SELECT n,
          LIST_SUM(LIST_TRANSFORM(ra, x -> (x - LIST_SUM(ra) / n)
                                        * (x - LIST_SUM(ra) / n))) / n
            AS vr,
          LIST_SUM(LIST_TRANSFORM(ta, x -> (x - LIST_SUM(ta) / n)
                                        * (x - LIST_SUM(ta) / n))) / n
            AS vt,
          LIST_SUM(LIST_TRANSFORM(sa, x -> (x - LIST_SUM(sa) / n)
                                        * (x - LIST_SUM(sa) / n))) / n
            AS vs
        FROM arrs
    )
    SELECT CAST(n AS BIGINT) AS n_hours,
           ROUND(GREATEST(0.0, 1.0 - vr / vt), 6) AS f_trend,
           ROUND(GREATEST(0.0, 1.0 - vr / vs), 6) AS f_seasonal
    FROM vars_
    """,
    doc="STRENGTH of trend and seasonality (Hyndman & Athanasopoulos "
        "FPP: F_T = max(0, 1 - Var(R)/Var(T+R)), F_S = max(0, 1 - "
        "Var(R)/Var(S+R))) — the one-number-per-series summary that "
        "turns ts_seasonal_decompose's component table into a "
        "triage score (feature stores compute exactly this to rank "
        "thousands of series by 'is seasonality worth modeling'). "
        "Reuses the decompose construction (exact integer-cent hourly "
        "sums, 25-hour centered trend, hour-of-day seasonal means); "
        "every float sum — components, means, squared-deviation "
        "variances — is an ORDERED list fold (LIST(x ORDER BY h) / "
        "array_sort(collect_list) + aggregate), so both engines "
        "accumulate in the identical order and the strengths match "
        "bitwise. The component table is time-span-sized (720 rows), "
        "so the global folds are metadata-scale; at 100 TB only the "
        "hourly rollup touches fact data",
)
def ts_seasonal_strength(spark, sf_dir):
    e = T(spark, sf_dir, "events")
    cents = F.round(F.col("value").cast("double") * 100).cast("bigint")
    hourly = (e.groupBy(F.window("ts", "1 hour").alias("w"))
              .agg((F.sum(cents).cast("double") / F.lit(100.0)).alias("v"))
              .select(F.col("w.start").alias("h"), "v"))
    wt = Window.orderBy("h").rowsBetween(-12, 12)
    frame = F.collect_list("v").over(wt)
    fold = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0.0), lambda acc, x: acc + x)
    trended = hourly.withColumn("trend", fold(frame) / F.size(frame))
    dev_sorted = F.transform(
        F.array_sort(F.collect_list(F.struct("h", "dev"))),
        lambda t: t["dev"])
    seasonal = (trended
                .withColumn("dev", F.col("v") - F.col("trend"))
                .groupBy(F.hour("h").alias("hod"))
                .agg((fold(dev_sorted) / F.count("*")).alias("s")))
    comp = (trended.withColumn("hod", F.hour("h"))
            .join(F.broadcast(seasonal), "hod")
            .select("h",
                    (F.col("v") - F.col("trend") - F.col("s")).alias("r"),
                    (F.col("v") - F.col("s")).alias("tr"),
                    (F.col("v") - F.col("trend")).alias("sr")))

    def arr(c):
        return F.transform(
            F.array_sort(F.collect_list(F.struct("h", c))), lambda t: t[c])

    arrs = comp.agg(arr("r").alias("ra"), arr("tr").alias("ta"),
                    arr("sr").alias("sa"),
                    F.count("*").cast("double").alias("n"))

    def var_(a):
        mean = fold(F.col(a)) / F.col("n")
        return fold(F.transform(F.col(a),
                                lambda x: (x - mean) * (x - mean))) \
            / F.col("n")

    return arrs.select(
        F.col("n").cast("bigint").alias("n_hours"),
        F.round(F.greatest(F.lit(0.0), 1.0 - var_("ra") / var_("ta")), 6)
        .alias("f_trend"),
        F.round(F.greatest(F.lit(0.0), 1.0 - var_("ra") / var_("sa")), 6)
        .alias("f_seasonal"))
