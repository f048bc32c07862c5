"""Batch twins of the reference's streaming semantics.

Each operator here is the oracle-checkable batch form of a streaming op in
``nsq2kinesis_spark.streaming``; SURVEY.md §2A maps each to its Go seed.
The streaming forms (withWatermark + dropDuplicatesWithinWatermark, windowed
aggregation, session_window on an unbounded source) are exercised in
tests/test_streaming.py — semantics are identical by construction because
both forms share these column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import table as t


@query(
    "q60_dedup_exact",
    oracle="""
    SELECT user_id, event_type, event_id, ts, value
    FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                   ORDER BY ts NULLS LAST, event_id NULLS LAST) AS rn
      FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
    ) WHERE rn = 1
    """,
    tags=("dedup", "streaming-twin"),
)
def q60_dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact keyed dedup keeping the earliest record per key — batch twin of
    the reference's generational dedup cache (deduper.go:25-38; streaming
    form: dropDuplicatesWithinWatermark in streaming/pipeline.py).

    Deterministic winner (min ts, event_id) rather than dropDuplicates'
    arbitrary survivor, so the oracle can hash-match. Scales as one shuffle
    on the dedup key + WindowGroupLimit (no full sort materialization).
    """
    ev = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(F.asc_nulls_last("ts"), F.asc_nulls_last("event_id"))
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("user_id", "event_type", "event_id", "ts", "value")
    )


@query(
    "q61_tumbling_window",
    oracle="""
    SELECT DATE_TRUNC('hour', ts) AS window_start, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
    FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events
          WHERE ts IS NOT NULL) events
    GROUP BY 1, 2
    """,
    tags=("streaming-twin", "window-agg"),
)
def q61_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour event-time window (seed: the reference's wall-clock
    batch flush cycle, kinesis_writer.go:142-147, re-expressed on event
    time). F.window aligns to the epoch so window.start == date_trunc.

    NULL-ts policy (pinned round 6): a record without event time cannot
    enter a time window — Spark's F.window drops such rows by
    construction (and the streaming form's watermark machinery could
    never admit them), so the exclusion is EXPLICIT on both twins; an
    unpinned oracle kept a phantom NULL bucket (caught by the planted
    probe)."""
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").cast("long").alias("n_events"),
            (F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast("double") / 100.0).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "sum_value")
    )


@query(
    "q62_sliding_window",
    oracle="""
    WITH buckets AS (
      SELECT e.*,
             TIME_BUCKET(INTERVAL '5 minutes', e.ts) - (k.k * INTERVAL '5 minutes') AS window_start
      FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events
            WHERE ts IS NOT NULL) e
      CROSS JOIN (SELECT UNNEST([0, 1]) AS k) k
    )
    SELECT window_start,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS DOUBLE) / 100.0 AS sum_value
    FROM buckets
    GROUP BY window_start
    """,
    tags=("streaming-twin", "window-agg"),
)
def q62_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding window: 10 min wide, 5 min slide — each event lands in 2
    windows (Spark Expand node; the oracle reproduces it with an explicit
    2-way unnest). NULL-ts policy pinned on both twins (q61's argument:
    no event time, no time window)."""
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(F.window("ts", "10 minutes", "5 minutes").alias("w"))
        .agg(
            F.count("*").cast("long").alias("n_events"),
            (F.sum(F.round(F.col("value") * 100, 0).cast("long")).cast("double") / 100.0).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "n_events", "sum_value")
    )


@query(
    "q63_session_window",
    oracle="""
    WITH flagged AS (
      SELECT user_id, ts,
             CASE WHEN ts - COALESCE(LAG(ts) OVER (PARTITION BY user_id ORDER BY ts),
                                     ts - INTERVAL '9999 hours')
                       > INTERVAL '30 minutes'
                  THEN 1 ELSE 0 END AS new_session
      FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events
            WHERE ts IS NOT NULL) events
    ), numbered AS (
      SELECT user_id, ts,
             SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                    ROWS UNBOUNDED PRECEDING) AS session_no
      FROM flagged
    )
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL '30 minutes' AS session_end,
           CAST(COUNT(*) AS BIGINT) AS n_events
    FROM numbered
    GROUP BY user_id, session_no
    """,
    tags=("streaming-twin", "session"),
)
def q63_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (30-min gap) per user via session_window — Spark
    merges adjacent events; end = last event + gap. Oracle rebuilds sessions
    with the lag/cumsum idiom. Streaming twin: same session_window on an
    unbounded source with a watermark.

    NULL-ts policy pinned on both twins (q61's argument): Spark's
    session_window drops NULL-ts rows by construction, while the
    oracle's NULLS LAST lag ordering silently folded them into the
    user's final session — the planted probe caught the off-by-one
    n_events before the explicit exclusion."""
    ev = t(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    return (
        ev.groupBy(F.session_window("ts", "30 minutes").alias("w"), "user_id")
        .agg(F.count("*").cast("long").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
        )
    )


@query(
    "q64_oversize_filter",
    oracle="""
    SELECT doc_id, n_chars, CAST(STRLEN(text) AS INTEGER) AS n_bytes
    FROM documents
    WHERE STRLEN(text) <= 256
    """,
    tags=("filter", "streaming-twin"),
)
def q64_oversize_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Oversize-record filter — batch twin of the reference's 1 MiB drop
    (kinesis_writer.go:167-170), scaled to the doc corpus (256 B cap).
    Byte length (octet_length), not character length, mirroring len(m.Body)."""
    d = t(spark, sf_dir, "documents")
    return (
        d.withColumn("n_bytes", F.octet_length("text").cast("int"))
        .filter(F.col("n_bytes") <= 256)
        .select("doc_id", "n_chars", "n_bytes")
    )


@query(
    "q65_partition_key",
    oracle="""
    SELECT doc_id,
           CASE WHEN key_candidate IS NOT NULL
                     AND LENGTH(key_candidate) BETWEEN 1 AND 255
                THEN key_candidate
                ELSE MD5(text) END AS partition_key
    FROM (
      SELECT doc_id, text, NULLIF(source, 'src0') AS key_candidate
      FROM documents
    )
    """,
    tags=("project", "streaming-twin"),
)
def q65_partition_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-key projection with hash fallback — twin of
    aggregator.go:119-130: caller key if valid (non-empty, ≤255 chars) else
    body hash. 'src0' keys are nulled to exercise the fallback branch.
    (Reference uses FNV-64a hex; we use md5 for engine portability —
    xxhash64 is the Spark-internal fast path, see q60.)"""
    d = t(spark, sf_dir, "documents")
    cand = F.nullif(F.col("source"), F.lit("src0"))
    return d.select(
        "doc_id",
        F.when(
            cand.isNotNull() & F.length(cand).between(1, 255), cand
        )
        .otherwise(F.md5("text"))
        .alias("partition_key"),
    )


@query(
    "q66_time_rollup",
    oracle="""
    SELECT event_type,
           CAST(DATE_TRUNC('day', ts) AS TIMESTAMP) AS day,
           CAST(DATE_TRUNC('hour', ts) AS TIMESTAMP) AS hour,
           CAST(GROUPING(DATE_TRUNC('day', ts)) * 2
                + GROUPING(DATE_TRUNC('hour', ts)) AS INTEGER) AS lvl,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
    FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
    GROUP BY event_type, ROLLUP(DATE_TRUNC('day', ts), DATE_TRUNC('hour', ts))
    """,
    tags=("streaming-twin", "rollup", "time"),
)
def q66_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical time rollup (the 'hypertable rollup' shape): hourly,
    daily, and total aggregates per event type in ONE pass via
    ROLLUP(day, hour) — grouping-set expansion with map-side partial
    aggregation, instead of three scans or a cascade of re-aggregations.
    grouping() bits disambiguate the level; value sums in exact cents.

    Spark SQL (not the DataFrame API) because only SQL expresses the
    partial-rollup form GROUP BY a, ROLLUP(b, c) — df.rollup() would also
    collapse event_type."""
    t(spark, sf_dir, "events").createOrReplaceTempView("nsq2k_events_rollup")
    return spark.sql(
        """
        SELECT event_type,
               date_trunc('day', ts) AS day,
               date_trunc('hour', ts) AS hour,
               CAST(grouping(date_trunc('day', ts)) * 2
                    + grouping(date_trunc('hour', ts)) AS INT) AS lvl,
               CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS value_cents
        FROM nsq2k_events_rollup
        GROUP BY event_type, ROLLUP(date_trunc('day', ts), date_trunc('hour', ts))
        """
    )


# -- q104: rolling 7-day active users ------------------------------------------

ROLLING_DAYS = 7


@query(
    "q104_rolling_active_users",
    oracle=f"""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), contrib AS (
      SELECT DISTINCT user_id, day + CAST(o.o AS INTEGER) AS report_day
      FROM ud CROSS JOIN
           (SELECT UNNEST(GENERATE_SERIES(0, {ROLLING_DAYS - 1})) AS o) o
    )
    SELECT report_day, CAST(COUNT(*) AS BIGINT) AS active_users_7d
    FROM contrib GROUP BY report_day
    """,
    tags=("window", "rolling", "distinct", "events"),
)
def q104_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day distinct active users per day — the metric every
    product pipeline computes, and the op Spark cannot express directly
    (COUNT(DISTINCT) OVER a moving frame is unsupported, and the
    size(collect_set) OVER workaround materializes every window's user
    set in executor memory — unbounded at 100 TB).

    The scale-safe decomposition: dedup to (user, active-day) — corpus
    shrinks to at most users x days rows — then each active day
    CONTRIBUTES to its next 7 report days (bounded x7 explode), dedup
    (user, report_day) since a user active on several days in one window
    must count once, and count per report day. Every step is a bounded
    map-side explode or a keyed aggregate; no per-window set state
    exists anywhere. Report days trail ROLLING_DAYS - 1 (six) days past
    the last activity by construction (the window is still moving off the
    data's edge) — consumers slice what they need."""
    e = t(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    contrib = (
        ud.select(
            "user_id",
            F.explode(
                F.sequence(F.lit(0), F.lit(ROLLING_DAYS - 1))
            ).alias("o"),
            "day",
        )
        .select("user_id", F.date_add("day", F.col("o")).alias("report_day"))
        .distinct()
    )
    return contrib.groupBy("report_day").agg(
        F.count("*").cast("long").alias("active_users_7d")
    )


# -- q109: retention cohorts ---------------------------------------------------


@query(
    "q109_retention_cohorts",
    oracle="""
    WITH ud AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events
    ), fc AS (
      SELECT user_id, MIN(day) AS cohort FROM ud GROUP BY user_id
    ), fl AS (
      SELECT f.user_id, f.cohort,
             MAX(CASE WHEN u.day = f.cohort + 1 THEN 1 ELSE 0 END) AS r1,
             MAX(CASE WHEN u.day = f.cohort + 7 THEN 1 ELSE 0 END) AS r7
      FROM fc f JOIN ud u USING (user_id)
      GROUP BY f.user_id, f.cohort
    )
    SELECT cohort, CAST(COUNT(*) AS BIGINT) AS cohort_size,
           CAST(SUM(r1) AS BIGINT) AS retained_d1,
           CAST(SUM(r7) AS BIGINT) AS retained_d7
    FROM fl GROUP BY cohort
    """,
    tags=("agg", "retention", "cohort", "events"),
)
def q109_retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-activity day, with day-1
    and day-7 return rates — the canonical product-analytics table q104's
    rolling actives complements. Every step is a keyed aggregate or an
    equi join on user_id: dedup to (user, active-day), min-day per user
    (map-side combinable), one hash join of the cohort back onto the
    activity set, per-user retention flags as conditional MAXes, and a
    tiny per-cohort rollup. No window over the event history, no
    per-cohort state larger than a day's users — the plan scales with
    users x active-days, not events."""
    e = t(spark, sf_dir, "events")
    ud = e.select("user_id", F.to_date("ts").alias("day")).distinct()
    fc = ud.groupBy("user_id").agg(F.min("day").alias("cohort"))
    # offsets written literally, mirroring the oracle's explicit +1/+7 —
    # changing the retention horizons means editing BOTH texts together
    fl = (
        fc.join(ud, "user_id")
        .groupBy("user_id", "cohort")
        .agg(
            F.max(
                F.when(F.col("day") == F.date_add("cohort", 1), 1).otherwise(0)
            ).alias("r1"),
            F.max(
                F.when(F.col("day") == F.date_add("cohort", 7), 1).otherwise(0)
            ).alias("r7"),
        )
    )
    return fl.groupBy("cohort").agg(
        F.count("*").cast("long").alias("cohort_size"),
        F.sum("r1").cast("long").alias("retained_d1"),
        F.sum("r7").cast("long").alias("retained_d7"),
    )


# -- q128: calendar gap fill ---------------------------------------------------


@query(
    "q128_gap_fill",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), bounds AS (
      SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM daily
      GROUP BY event_type
    ), cal AS (
      SELECT event_type, CAST(u.g AS DATE) AS day
      FROM bounds, UNNEST(GENERATE_SERIES(d0, d1, INTERVAL 1 DAY)) AS u(g)
    )
    SELECT c.event_type, c.day,
           COALESCE(d.n, 0) AS n,
           CAST(d.n IS NULL AS INTEGER) AS is_filled
    FROM cal c LEFT JOIN daily d
      ON c.event_type = d.event_type AND c.day = d.day
    """,
    tags=("timeseries", "gapfill", "events"),
)
def q128_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calendar gap fill: densify each event type's daily series over its
    own [min_day, max_day] span, zero-filling absent days — the step every
    downstream time-series op (q114's z-scores, q119's OLS trend, q120's
    Gini) silently assumes and dashboards require (a missing day IS a
    zero-volume observation; aggregating only observed days biases every
    statistic upward).

    Shape: the dense calendar is generated FROM THE AGGREGATE, never the
    raw table — day-keyed partial agg (|types|x|days| rows), per-type
    min/max bounds (|types| rows), sequence-explode of the span, then a
    left join back to the daily counts. Everything after the first agg is
    dimension-sized regardless of event volume; at 100 TB the explode
    emits |types| x |span_days| rows — thousands, not billions."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    bounds = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    cal = bounds.select(
        "event_type",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    return (
        cal.join(daily, ["event_type", "day"], "left")
        .select(
            "event_type",
            "day",
            F.coalesce("n", F.lit(0)).cast("long").alias("n"),
            F.col("n").isNull().cast("int").alias("is_filled"),
        )
    )


# -- q136: linear interpolation over the dense calendar ------------------------


INTERP_MIN_VALUE = 250  # the sparse high-value series (dense series have no gaps)


@query(
    "q136_interpolate",
    oracle=f"""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM events WHERE value > {INTERP_MIN_VALUE}
      GROUP BY event_type, CAST(ts AS DATE)
    ), bounds AS (
      SELECT event_type, MIN(day) AS d0, MAX(day) AS d1 FROM daily
      GROUP BY event_type
    ), cal AS (
      SELECT event_type, CAST(u.g AS DATE) AS day
      FROM bounds, UNNEST(GENERATE_SERIES(d0, d1, INTERVAL 1 DAY)) AS u(g)
    ), joined AS (
      SELECT c.event_type, c.day, d.n
      FROM cal c LEFT JOIN daily d
        ON c.event_type = d.event_type AND c.day = d.day
    ), bracketed AS (
      SELECT event_type, day, n,
             LAST_VALUE(CASE WHEN n IS NOT NULL THEN day END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_day,
             LAST_VALUE(CASE WHEN n IS NOT NULL THEN n END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_n,
             FIRST_VALUE(CASE WHEN n IS NOT NULL THEN day END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_day,
             FIRST_VALUE(CASE WHEN n IS NOT NULL THEN n END IGNORE NULLS)
               OVER (PARTITION BY event_type ORDER BY day
                     ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_n
      FROM joined
    )
    SELECT event_type, day,
           CASE WHEN n IS NOT NULL THEN CAST(n AS DOUBLE)
                ELSE (prev_n * (next_day - day) + next_n * (day - prev_day))
                     * 1.0 / (next_day - prev_day)
           END AS n_filled,
           CAST(n IS NULL AS INTEGER) AS is_interpolated
    FROM bracketed
    """,
    tags=("timeseries", "interpolation", "events"),
)
def q136_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Resample-and-interpolate: densify each type's HIGH-VALUE daily
    series (value > INTERP_MIN_VALUE — a genuinely sparse series; the
    all-events series is gap-free on this corpus, which would leave the
    interpolation arm vacuously untested) and LINEARLY INTERPOLATE
    missing days between their
    bracketing observations — the time-series preparation step for
    models that can't take zero-filled gaps at face value (q128's
    zero-fill says "nothing happened"; interpolation says "we didn't
    look"; which is correct depends on whether absence of data is
    absence of activity, so the engine offers both).

    The brackets come from two IGNORE NULLS running extremes per
    partition — last non-null (day, n) before, first after — so each gap
    row finds its neighbors in ONE pass over the dense calendar, no
    self-join on inequality (the naive bracketing join is quadratic in
    gap length). Interior days always have both brackets (the span ends
    are observed by construction), so no NULL arms survive. The
    interpolation weights are integer day differences; one division
    makes the result bit-identical across engines. All windows ride the
    |types|x|span| dense frame — dimension-sized at any event volume,
    same scale argument as q128."""
    e = t(spark, sf_dir, "events")
    daily = (
        e.filter(F.col("value") > INTERP_MIN_VALUE)
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count("*").cast("long").alias("n"))
    )
    bounds = daily.groupBy("event_type").agg(
        F.min("day").alias("d0"), F.max("day").alias("d1")
    )
    cal = bounds.select(
        "event_type",
        F.explode(F.expr("sequence(d0, d1, interval 1 day)")).alias("day"),
    )
    joined = cal.join(daily, ["event_type", "day"], "left")
    w_back = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    obs_day = F.when(F.col("n").isNotNull(), F.col("day"))
    obs_n = F.when(F.col("n").isNotNull(), F.col("n"))
    b = joined.select(
        "event_type",
        "day",
        "n",
        F.last(obs_day, ignorenulls=True).over(w_back).alias("prev_day"),
        F.last(obs_n, ignorenulls=True).over(w_back).alias("prev_n"),
        F.first(obs_day, ignorenulls=True).over(w_fwd).alias("next_day"),
        F.first(obs_n, ignorenulls=True).over(w_fwd).alias("next_n"),
    )
    span = F.datediff("next_day", "prev_day")
    interp = (
        F.col("prev_n") * F.datediff("next_day", F.col("day"))
        + F.col("next_n") * F.datediff(F.col("day"), "prev_day")
    ) * F.lit(1.0) / span
    return b.select(
        "event_type",
        "day",
        F.when(F.col("n").isNotNull(), F.col("n").cast("double"))
        .otherwise(interp)
        .alias("n_filled"),
        F.col("n").isNull().cast("int").alias("is_interpolated"),
    )


# -- q139: conversion-latency percentiles per cohort ---------------------------


@query(
    "q139_conversion_latency",
    oracle="""
    WITH fv AS (
      SELECT user_id, MIN(ts) AS first_view FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), fp AS (
      SELECT e.user_id, MIN(e.ts) AS first_purchase
      FROM events e JOIN fv ON e.user_id = fv.user_id
      WHERE e.event_type = 'purchase' AND e.ts >= fv.first_view
      GROUP BY e.user_id
    ), lat AS (
      SELECT CAST(fv.first_view AS DATE) AS cohort,
             CAST(FLOOR(EPOCH(fp.first_purchase)) - FLOOR(EPOCH(fv.first_view))
                  AS BIGINT) AS secs
      FROM fv JOIN fp ON fv.user_id = fp.user_id
    )
    SELECT cohort,
           CAST(COUNT(*) AS BIGINT) AS n_converted,
           QUANTILE_CONT(secs, 0.25) AS p25_secs,
           QUANTILE_CONT(secs, 0.5)  AS p50_secs,
           QUANTILE_CONT(secs, 0.75) AS p75_secs
    FROM lat GROUP BY cohort
    """,
    tags=("funnel", "percentile", "events"),
)
def q139_conversion_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion-latency distribution: for every user who purchased at or
    after their first view, the seconds from first view to first
    qualifying purchase, summarized as exact quartiles per first-view-day
    cohort — the "how long does conversion take" panel that q101's
    conversion COUNTS can't answer.

    Exactness: timestamps reduce to FLOOR(EPOCH()) integer seconds (the
    q35/q41 idiom — DuckDB's CAST rounds sub-second timestamps, Spark's
    unix_timestamp floors, so the floor is pinned on both sides);
    latencies are integer differences, and percentile_cont over integers
    interpolates to exactly-representable quarters (the q17/q135
    argument). Shape: two keyed min-aggregates (the purchase side
    pre-filtered by a user-keyed join against first views — at most one
    row per user each), one user-keyed join, then day-grouped exact
    percentiles over cohort-sized groups. No window over raw events."""
    e = t(spark, sf_dir, "events")
    fv = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_view"))
    )
    fp = (
        e.filter(F.col("event_type") == "purchase")
        .join(fv, "user_id")
        .filter(F.col("ts") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("first_purchase"))
    )
    lat = fv.join(fp, "user_id").select(
        F.to_date("first_view").alias("cohort"),
        (
            F.floor(F.unix_timestamp("first_purchase"))
            - F.floor(F.unix_timestamp("first_view"))
        )
        .cast("long")
        .alias("secs"),
    )
    return lat.groupBy("cohort").agg(
        F.count("*").cast("long").alias("n_converted"),
        F.percentile("secs", 0.25).alias("p25_secs"),
        F.percentile("secs", 0.5).alias("p50_secs"),
        F.percentile("secs", 0.75).alias("p75_secs"),
    )
