"""Window-function operators: ranking, analytic (lag/lead/first/last),
framed aggregates (running/moving), top-k per group.

Reference seed: the running size/count accounting of the batcher is a frame
aggregate (reference kinesis_writer.go:57, aggregator.go:183-205).

Scale notes: every window here partitions by a high-cardinality key
(supplier/customer/brand), so state per partition stays small and the single
shuffle distributes evenly. Never use a global (unpartitioned) window at
scale — all rows would land on one task.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import table as t


@query(
    "q30_window_rank",
    oracle="""
    SELECT * FROM (
      SELECT p_brand, p_partkey, p_name, p_retailprice,
             CAST(ROW_NUMBER() OVER w AS BIGINT) AS rn,
             CAST(RANK() OVER w AS BIGINT) AS rnk,
             CAST(DENSE_RANK() OVER w AS BIGINT) AS drnk,
             CAST(NTILE(4) OVER (PARTITION BY p_brand ORDER BY p_partkey) AS BIGINT) AS quartile
      FROM part
      WINDOW w AS (PARTITION BY p_brand ORDER BY p_retailprice DESC, p_partkey)
    ) WHERE rn <= 5
    """,
    tags=("window", "rank"),
)
def q30_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking battery: row_number/rank/dense_rank/ntile, top-5 per brand.
    p_retailprice is a raw stored double → cross-engine comparisons exact;
    p_partkey tie-break keeps row_number deterministic."""
    p = t(spark, sf_dir, "part")
    w = Window.partitionBy("p_brand").orderBy(F.col("p_retailprice").desc(), "p_partkey")
    wq = Window.partitionBy("p_brand").orderBy("p_partkey")
    return (
        p.select(
            "p_brand",
            "p_partkey",
            "p_name",
            "p_retailprice",
            F.row_number().over(w).cast("long").alias("rn"),
            F.rank().over(w).cast("long").alias("rnk"),
            F.dense_rank().over(w).cast("long").alias("drnk"),
            F.ntile(4).over(wq).cast("long").alias("quartile"),
        )
        .filter(F.col("rn") <= 5)
    )


@query(
    "q31_window_analytic",
    oracle="""
    SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice,
           LAG(o_totalprice) OVER w AS prev_price,
           LEAD(o_totalprice) OVER w AS next_price,
           FIRST_VALUE(o_totalprice) OVER w AS first_price,
           o_totalprice - COALESCE(LAG(o_totalprice) OVER w, o_totalprice) AS delta_vs_prev
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey
                 ORDER BY o_orderdate NULLS LAST, o_orderkey NULLS LAST)
    """,
    tags=("window", "analytic"),
)
def q31_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic battery: lag/lead/first_value + delta vs previous order.
    NULLS LAST pinned (round 6): a NULL o_orderdate under Spark's ASC
    default sorts FIRST and becomes the partition's first_value (and
    everyone's shifted lag neighbor) while DuckDB puts it last — the
    date-ordered sibling of the q34 price-window divergence."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.asc_nulls_last("o_orderdate"), F.asc_nulls_last("o_orderkey")
    )
    prev = F.lag("o_totalprice").over(w)
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
        prev.alias("prev_price"),
        F.lead("o_totalprice").over(w).alias("next_price"),
        F.first("o_totalprice").over(w).alias("first_price"),
        (F.col("o_totalprice") - F.coalesce(prev, F.col("o_totalprice"))).alias("delta_vs_prev"),
    )


@query(
    "q32_window_frames",
    oracle="""
    SELECT l_suppkey, l_orderkey, l_linenumber, l_shipdate,
           SUM(l_quantity) OVER w_run AS running_qty,
           SUM(l_quantity) OVER w_mov AS moving3_qty
    FROM lineitem
    WINDOW
      w_run AS (PARTITION BY l_suppkey
                ORDER BY l_shipdate NULLS LAST, l_orderkey NULLS LAST,
                         l_linenumber NULLS LAST, l_partkey NULLS LAST,
                         l_quantity NULLS LAST
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
      w_mov AS (PARTITION BY l_suppkey
                ORDER BY l_shipdate NULLS LAST, l_orderkey NULLS LAST,
                         l_linenumber NULLS LAST, l_partkey NULLS LAST,
                         l_quantity NULLS LAST
                ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "frame"),
)
def q32_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Framed aggregates: running sum + 3-row moving sum per supplier.
    Seed: the reference's running batch-size accounting
    (kinesis_writer.go:57) is exactly a running-sum frame.

    The ORDER BY must be a TOTAL order: ROWS frames over tied rows are
    tie-order-dependent, and the generator can emit two lineitems sharing
    (suppkey, shipdate, orderkey, linenumber) with different quantities
    (first seen at sf0.1 — one collision pair flips two running sums
    between engines). l_partkey breaks the observed tie; l_quantity
    guards the remainder (rows tied on ALL order columns contribute equal
    values, so any residual tie is value-neutral for the frame sums)."""
    li = t(spark, sf_dir, "lineitem")
    # NULLS LAST pinned (round 6): the total-order argument above assumed
    # non-null keys; a NULL l_shipdate would sort FIRST under Spark's ASC
    # default and LAST in DuckDB, sliding every frame in its partition
    order = [
        F.asc_nulls_last("l_shipdate"),
        F.asc_nulls_last("l_orderkey"),
        F.asc_nulls_last("l_linenumber"),
        F.asc_nulls_last("l_partkey"),
        F.asc_nulls_last("l_quantity"),
    ]
    base = Window.partitionBy("l_suppkey").orderBy(*order)
    return li.select(
        "l_suppkey",
        "l_orderkey",
        "l_linenumber",
        "l_shipdate",
        F.sum("l_quantity")
        .over(base.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("running_qty"),
        F.sum("l_quantity")
        .over(base.rowsBetween(-2, Window.currentRow))
        .alias("moving3_qty"),
    )


@query(
    "q33_topk_per_group",
    oracle="""
    SELECT * FROM (
      SELECT c_nationkey, c_custkey, c_acctbal,
             CAST(ROW_NUMBER() OVER (PARTITION BY c_nationkey
                  ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS rn
      FROM customer
    ) WHERE rn <= 3
    """,
    tags=("window", "topk"),
)
def q33_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per nation — the scalable top-k idiom
    (rank-and-filter; Spark pushes a per-partition limit via WindowGroupLimit)."""
    c = t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy(F.col("c_acctbal").desc(), "c_custkey")
    return (
        c.select(
            "c_nationkey",
            "c_custkey",
            "c_acctbal",
            F.row_number().over(w).cast("long").alias("rn"),
        )
        .filter(F.col("rn") <= 3)
    )


@query(
    "q34_window_distribution",
    oracle="""
    SELECT o_orderkey,
           o_orderpriority,
           PERCENT_RANK() OVER w AS pct_rank,
           CUME_DIST() OVER w AS cume,
           CAST(NTILE(10) OVER w AS BIGINT) AS decile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice NULLS LAST, o_orderkey NULLS LAST)
    """,
    tags=("window", "distribution"),
)
def q34_window_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank ((rank-1)/(n-1)) and
    cume_dist (rank/n) are exact small-integer ratios in double — engine
    order cannot perturb them under a total order (o_totalprice, o_orderkey
    tie-break). Completes the ranking battery of q30.

    NULLS LAST pinned (round 6 — the r5 pin closed the ts-ordered
    windows; this is the same class on a PRICE-ordered window): a NULL
    o_totalprice under Spark's ASC default sits FIRST and shifts every
    rank in its partition by one, which moves EVERY row's pct_rank/cume,
    not just the NULL row's."""
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_orderpriority").orderBy(
        F.asc_nulls_last("o_totalprice"), F.asc_nulls_last("o_orderkey")
    )
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(10).over(w).cast("long").alias("decile"),
    )


@query(
    "q35_window_range_frame",
    oracle="""
    SELECT event_id, user_id,
           CAST(COUNT(*) OVER w AS BIGINT) AS n_last_hour,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT) AS cents_last_hour
    FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
    WINDOW w AS (PARTITION BY user_id ORDER BY CAST(FLOOR(EPOCH(ts)) AS BIGINT) NULLS LAST
                 RANGE BETWEEN 3600 PRECEDING AND CURRENT ROW)
    """,
    tags=("window", "range-frame", "time"),
)
def q35_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame: per user, count and exact-cents sum of
    events in the trailing hour of EVENT TIME (value-based frame bounds,
    not row offsets — peers at equal timestamps aggregate together, which
    a ROWS frame gets wrong). Ordered on epoch seconds so both engines
    bound the frame identically."""
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc_nulls_last(F.unix_timestamp("ts")))
        .rangeBetween(-3600, Window.currentRow)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count("*").over(w).cast("long").alias("n_last_hour"),
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).over(w).cast("long").alias(
            "cents_last_hour"
        ),
    )


# -- q101: ordered event funnel ------------------------------------------------

FUNNEL_STAGES = ("view", "click", "purchase")


@query(
    "q101_event_funnel",
    oracle="""
    WITH o2 AS (
      SELECT user_id, event_type, seen_view,
             MAX(CASE WHEN event_type = 'click' AND seen_view = 1
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY rn
                     ROWS UNBOUNDED PRECEDING) AS seen_click
      FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                         ORDER BY ts NULLS LAST, event_id NULLS LAST) AS rn
            FROM (SELECT user_id, event_type, ts, event_id,
                         MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
                           OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id NULLS LAST
                                 ROWS UNBOUNDED PRECEDING) AS seen_view
                  FROM events))
    ), per_user AS (
      SELECT user_id,
             MAX(seen_view) AS s1,
             MAX(seen_click) AS s2,
             MAX(CASE WHEN event_type = 'purchase' AND seen_click = 1
                      THEN 1 ELSE 0 END) AS s3
      FROM o2 GROUP BY user_id
    )
    SELECT stage, stage_no, users FROM (
      SELECT 'view' AS stage, 1 AS stage_no, CAST(SUM(s1) AS BIGINT) AS users
      FROM per_user
      UNION ALL
      SELECT 'click', 2, CAST(SUM(s2) AS BIGINT) FROM per_user
      UNION ALL
      SELECT 'purchase', 3, CAST(SUM(s3) AS BIGINT) FROM per_user
    )
    """,
    tags=("window", "funnel", "events"),
)
def q101_event_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (view -> click-after-view ->
    purchase-after-click) computed in ONE pass over the events table: a
    single hash exchange on user_id, one sort per partition, running
    MAX-over-ROWS flags carrying the sequential stage dependency, then an
    ordinary per-user aggregate. The naive formulation is three
    self-joins (first view ⋈ first later click ⋈ first later purchase) —
    three shuffles of the full fact and a quadratic tie surface; the
    running-flag form is how funnels stay linear at 100 TB. Ordering ties
    broken by event_id so both engines walk identical sequences."""
    e = t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc_nulls_last("ts"), F.asc_nulls_last("event_id"))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    seen_view = F.max(
        F.when(F.col("event_type") == "view", 1).otherwise(0)
    ).over(w)
    o = e.withColumn("seen_view", seen_view)
    seen_click = F.max(
        F.when(
            (F.col("event_type") == "click") & (F.col("seen_view") == 1), 1
        ).otherwise(0)
    ).over(w)
    o2 = o.withColumn("seen_click", seen_click)
    per_user = o2.groupBy("user_id").agg(
        F.max("seen_view").alias("s1"),
        F.max("seen_click").alias("s2"),
        F.max(
            F.when(
                (F.col("event_type") == "purchase") & (F.col("seen_click") == 1), 1
            ).otherwise(0)
        ).alias("s3"),
    )
    totals = per_user.agg(
        F.sum("s1").cast("long").alias("view"),
        F.sum("s2").cast("long").alias("click"),
        F.sum("s3").cast("long").alias("purchase"),
    )
    stages = F.array(
        *[
            F.struct(
                F.lit(s).alias("stage"),
                F.lit(i + 1).alias("stage_no"),
                F.col(s).alias("users"),
            )
            for i, s in enumerate(FUNNEL_STAGES)
        ]
    )
    return (
        totals.select(F.explode(stages).alias("x"))
        .select("x.stage", "x.stage_no", "x.users")
    )


# -- q103: gaps and islands ----------------------------------------------------


@query(
    "q103_gaps_islands",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type,
             ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id NULLS LAST)
               AS rn_all,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts NULLS LAST, event_id NULLS LAST) AS rn_type
      FROM events
    ), islands AS (
      SELECT user_id, event_type, rn_all - rn_type AS grp,
             CAST(COUNT(*) AS BIGINT) AS run_len
      FROM seq GROUP BY user_id, event_type, rn_all - rn_type
    )
    SELECT user_id, event_type,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(MAX(run_len) AS BIGINT) AS longest_run
    FROM islands GROUP BY user_id, event_type
    """,
    tags=("window", "islands", "events"),
)
def q103_gaps_islands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: per user, maximal runs of consecutive events of
    the same type, summarized as island count and longest run. The
    rn_all - rn_type subtraction trick turns run detection into pure
    window arithmetic: both row_numbers ride the SAME exchange on
    user_id (the per-(user,type) window only sub-sorts within the
    partition), and the island/summary aggregates re-key by user_id so
    nothing ever shuffles the fact twice. Ties broken by event_id —
    both engines walk identical sequences."""
    e = t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w_all = Window.partitionBy("user_id").orderBy(F.asc_nulls_last("ts"), F.asc_nulls_last("event_id"))
    w_type = Window.partitionBy("user_id", "event_type").orderBy(F.asc_nulls_last("ts"), F.asc_nulls_last("event_id"))
    seq = e.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("grp"),
    )
    islands = seq.groupBy("user_id", "event_type", "grp").agg(
        F.count("*").cast("long").alias("run_len")
    )
    return islands.groupBy("user_id", "event_type").agg(
        F.count("*").cast("long").alias("n_islands"),
        F.max("run_len").cast("long").alias("longest_run"),
    )


# -- q107: top event paths (behavioral sequences) ------------------------------

PATH_TOP_K = 10


@query(
    "q107_event_paths",
    oracle=f"""
    WITH seq AS (
      SELECT user_id, event_type AS t1,
             LEAD(event_type, 1) OVER w AS t2,
             LEAD(event_type, 2) OVER w AS t3
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id NULLS LAST)
    )
    SELECT CONCAT(t1, '>', t2, '>', t3) AS path, CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE t1 IS NOT NULL AND t2 IS NOT NULL AND t3 IS NOT NULL
    GROUP BY CONCAT(t1, '>', t2, '>', t3)
    ORDER BY n DESC, path LIMIT {PATH_TOP_K}
    """,
    tags=("window", "paths", "events"),
)
def q107_event_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-PATH_TOP_K most frequent 3-step behavioral sequences
    (event-type trigram paths per user) — the path-analysis pass of
    product analytics. One exchange on user_id serves both LEADs; path
    counting is a map-side-partial aggregate; the final top-k is
    TakeOrderedAndProject (each partition forwards only its own top
    candidates — no global sort). Sequence boundaries respect users:
    LEAD never crosses the window partition, so no cross-user phantom
    paths. All three legs filtered non-null and joined with explicit
    separators (F.concat, not concat_ws, which silently DROPS a null
    leg and its separator — a null event_type would alias 'a>b' with a
    genuine 2-step path). Ties broken (count desc, path asc)."""
    e = t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.asc_nulls_last("ts"), F.asc_nulls_last("event_id"))
    seq = e.select(
        F.col("event_type").alias("t1"),
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    ).filter(
        F.col("t1").isNotNull()
        & F.col("t2").isNotNull()
        & F.col("t3").isNotNull()
    )
    path = F.concat("t1", F.lit(">"), "t2", F.lit(">"), "t3")
    return (
        seq.select(path.alias("path"))
        .groupBy("path")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "path")
        .limit(PATH_TOP_K)
    )


# -- q117: SCD-2 dimension build (validity intervals) --------------------------


@query(
    "q117_scd2_intervals",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id NULLS LAST)
               AS prev_type
      FROM events
    ), starts AS (
      SELECT user_id, event_type, ts AS valid_from, event_id
      FROM seq WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type, valid_from,
           LEAD(valid_from) OVER w AS valid_to,
           CAST(ROW_NUMBER() OVER w AS BIGINT) AS version,
           CAST(CASE WHEN LEAD(valid_from) OVER w IS NULL THEN 1 ELSE 0 END
                AS INTEGER) AS is_current
    FROM starts
    WINDOW w AS (PARTITION BY user_id ORDER BY valid_from NULLS LAST, event_id NULLS LAST)
    """,
    tags=("window", "scd2", "events"),
)
def q117_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type 2 build: collapse each user's event
    stream into versioned validity intervals — a row per maximal run of
    one event_type with [valid_from, valid_to) bounds, a per-user version
    number, and an is_current flag (open interval). The warehouse
    dimension-build op q103's run SUMMARY doesn't provide: this
    materializes the interval table an as-of join (q28) would probe.

    Shape: one exchange on user_id total — the change-detection lag, the
    post-filter version numbering, and the valid_to lead all ride the same
    user-keyed partitioning (later windows only re-sort locally). Change
    detection before the second window shrinks it to runs (#changes <<
    #events on real streams). Ties broken by event_id everywhere so both
    engines walk identical sequences."""
    e = t(spark, sf_dir, "events").select("user_id", "event_type", "ts", "event_id")
    w_seq = Window.partitionBy("user_id").orderBy(F.asc_nulls_last("ts"), F.asc_nulls_last("event_id"))
    seq = e.withColumn("prev_type", F.lag("event_type").over(w_seq))
    starts = seq.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    ).select("user_id", "event_type", F.col("ts").alias("valid_from"), "event_id")
    w_v = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_last("valid_from"), F.asc_nulls_last("event_id")
    )
    return starts.select(
        "user_id",
        "event_type",
        "valid_from",
        F.lead("valid_from").over(w_v).alias("valid_to"),
        F.row_number().over(w_v).cast("long").alias("version"),
        F.lead("valid_from").over(w_v).isNull().cast("int").alias("is_current"),
    )


# -- q120: Gini concentration of daily volume ----------------------------------


@query(
    "q120_volume_gini",
    oracle="""
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n
      FROM events GROUP BY event_type, CAST(ts AS DATE)
    ), ranked AS (
      SELECT event_type, n,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY n, day NULLS LAST) AS BIGINT) AS i
      FROM daily
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_days,
           CAST(SUM(n) AS BIGINT) AS total,
           CAST(2 * SUM(CAST(i AS HUGEINT) * n)
                - (COUNT(*) + 1) * SUM(CAST(n AS HUGEINT)) AS DOUBLE)
             / CAST(COUNT(*) * SUM(CAST(n AS HUGEINT)) AS DOUBLE) AS gini
    FROM ranked GROUP BY event_type
    HAVING SUM(n) > 0
    """,
    tags=("window", "gini", "events"),
)
def q120_volume_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concentration of an event type's volume across days — the Gini
    index from the rank-sum identity G = (2·Σ i·x_(i) − (n+1)·Σx)/(n·Σx)
    over ascending-sorted daily counts (0 = perfectly even across days,
    →1 = all volume on one day). Burstiness is a data-quality signal a
    training-event pipeline watches next to q114/q119. The ORDER BY (n,
    day) is total, and every term stays an exact 128-bit integer until
    the single final division, so the index is bit-identical across
    engines. Shape: day-keyed agg -> per-type ranking window over
    day-count-sized partitions -> type-keyed rollup."""
    e = t(spark, sf_dir, "events")
    daily = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count("*").cast("long").alias("n")
    )
    # day NULLS LAST pinned (round 6): the NULL-day bucket (NULL-ts
    # events) must rank identically when tied on n with a real day
    w = Window.partitionBy("event_type").orderBy(
        "n", F.asc_nulls_last("day")
    )
    wide = lambda c: c.cast("decimal(38,0)")  # noqa: E731
    ranked = daily.withColumn("i", F.row_number().over(w).cast("long"))
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count("*").cast("long").alias("n_days"),
            F.sum("n").cast("long").alias("total"),
            (
                (
                    2 * F.sum(wide(F.col("i")) * F.col("n"))
                    - (F.count("*") + 1) * F.sum(wide(F.col("n")))
                ).cast("double")
                / (F.count("*") * F.sum(wide(F.col("n")))).cast("double")
            ).alias("gini"),
        )
        .filter(F.col("total") > 0)
    )


# -- q129: cumulative-distinct growth curve ------------------------------------


@query(
    "q129_growth_curve",
    oracle="""
    WITH first_day AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS day FROM events GROUP BY user_id
    ), daily_new AS (
      SELECT day, CAST(COUNT(*) AS BIGINT) AS n_new FROM first_day GROUP BY day
    )
    SELECT day, n_new,
           CAST(SUM(n_new) OVER (ORDER BY day NULLS LAST
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
             AS cum_users
    FROM daily_new
    """,
    tags=("window", "growth", "distinct", "events"),
)
def q129_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cumulative distinct users over time — the product growth curve:
    for every day, how many distinct users have EVER been seen up to and
    including it.

    The naive formulation (COUNT(DISTINCT user) OVER (ORDER BY day)) is
    unsupported by Spark and unboundedly stateful anywhere: the window
    would carry every user id ever seen. The exact decomposition: a
    cumulative distinct count only grows when a user appears for the
    FIRST time, so reduce each user to min(day) (one keyed agg), count
    first-appearances per day (|days| rows), and run the cumulative sum
    over that dimension-sized frame. The only window is an unpartitioned
    ROWS cumsum over |days| rows — thousands at any corpus size — the
    same aggregate-then-tiny-window shape as q104's rolling actives.
    ORDER BY day is total (daily_new has one row per day), with NULLS
    LAST pinned explicitly — the engines' opposite NULL-ordering
    defaults are a parity trap on NULL-timestamp events."""
    e = t(spark, sf_dir, "events")
    first_day = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("day"))
    daily_new = first_day.groupBy("day").agg(
        F.count("*").cast("long").alias("n_new")
    )
    # NULLS LAST pinned on BOTH twins: Spark defaults NULLS FIRST and
    # DuckDB NULLS LAST, so an unpinned order diverges on any NULL-ts
    # event (every row's cumsum would differ, not just the NULL row)
    w = (
        Window.partitionBy()
        .orderBy(F.asc_nulls_last("day"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return daily_new.select(
        "day", "n_new", F.sum("n_new").over(w).cast("long").alias("cum_users")
    )


# -- q134: fact resolution against the SCD-2 dimension -------------------------


@query(
    "q134_scd2_resolve",
    oracle="""
    WITH seq AS (
      SELECT user_id, event_type, ts, event_id,
             LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id NULLS LAST)
               AS prev_type
      FROM events WHERE event_type <> 'purchase' AND ts IS NOT NULL
    ), starts AS (
      SELECT user_id, event_type, ts AS valid_from, event_id
      FROM seq WHERE prev_type IS NULL OR prev_type <> event_type
    ), iv AS (
      SELECT user_id, event_type AS state, valid_from,
             LEAD(valid_from) OVER w AS valid_to,
             CAST(ROW_NUMBER() OVER w AS BIGINT) AS version
      FROM starts
      WINDOW w AS (PARTITION BY user_id ORDER BY valid_from NULLS LAST, event_id NULLS LAST)
    )
    SELECT p.event_id, p.user_id, p.ts AS purchase_ts,
           iv.state, iv.version
    FROM events p JOIN iv
      ON p.user_id = iv.user_id
     AND iv.valid_from <= p.ts
     AND (iv.valid_to IS NULL OR p.ts < iv.valid_to)
    WHERE p.event_type = 'purchase'
    """,
    tags=("window", "scd2", "join", "events"),
)
def q134_scd2_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time fact resolution against the SCD-2 dimension — the
    composition q117 exists FOR: every purchase event is attributed to
    the behavioral state (the q117-style interval, built here from the
    non-purchase events) the user was in at purchase time. This is the
    warehouse-canonical fact-to-slowly-changing-dimension join: the
    intervals partition each user's timeline, so every fact resolves to
    AT MOST one row — no fanout, deterministic in both engines.

    Shape: the interval build rides one user-keyed exchange (q117's
    plan); the resolution is an equi hash join on user_id with the
    half-open interval test [valid_from, valid_to) as a residual
    predicate — per-user candidate fanout is (purchases x states) per
    user, bounded by per-user activity exactly like the q94 binned range
    join's argument, never by table size. Facts that precede the user's
    first state (or belong to users with no non-purchase history) drop
    out of the inner join by declared semantics."""
    e = t(spark, sf_dir, "events")
    # NULL-ts events are excluded on BOTH twins: an interval anchored at
    # an unknown time is meaningless, and an unpinned ORDER BY ts would
    # place the NULL row opposite ways in the two engines (the q129
    # NULLS-ordering trap), shifting every downstream version number
    nonp = (
        e.filter(F.col("event_type") != "purchase")
        .filter(F.col("ts").isNotNull())
        .select("user_id", "event_type", "ts", "event_id")
    )
    w_seq = Window.partitionBy("user_id").orderBy(F.asc_nulls_last("ts"), F.asc_nulls_last("event_id"))
    seq = nonp.withColumn("prev_type", F.lag("event_type").over(w_seq))
    starts = seq.filter(
        F.col("prev_type").isNull()
        | (F.col("prev_type") != F.col("event_type"))
    ).select(
        "user_id",
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        "event_id",
    )
    w_v = Window.partitionBy("user_id").orderBy(
        F.asc_nulls_last("valid_from"), F.asc_nulls_last("event_id")
    )
    iv = starts.select(
        "user_id",
        "state",
        "valid_from",
        F.lead("valid_from").over(w_v).alias("valid_to"),
        F.row_number().over(w_v).cast("long").alias("version"),
    )
    p = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("purchase_ts")
    )
    return (
        p.join(iv, "user_id")
        .filter(
            (F.col("valid_from") <= F.col("purchase_ts"))
            & (
                F.col("valid_to").isNull()
                | (F.col("purchase_ts") < F.col("valid_to"))
            )
        )
        .select("event_id", "user_id", "purchase_ts", "state", "version")
    )


# -- q140: top-k per group with an OTHERS remainder row ------------------------

TOPK_OTHERS_K = 3


@query(
    "q140_topk_others",
    oracle=f"""
    WITH totals AS (
      SELECT event_type, user_id,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
      FROM events GROUP BY event_type, user_id
    ), ranked AS (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY event_type
                                   ORDER BY cents DESC, user_id NULLS LAST) AS rk
      FROM totals
    ), top AS (
      -- CAST back to BIGINT: SUM(BIGINT) widens to HUGEINT in DuckDB, and
      -- the driver's value hash is type-sensitive (r6's only red row —
      -- values matched, the hash diverged on HUGEINT vs Spark's BIGINT)
      SELECT event_type, CAST(rk AS BIGINT) AS rk, user_id,
             CAST(cents AS BIGINT) AS cents, CAST(1 AS BIGINT) AS n_users
      FROM ranked WHERE rk <= {TOPK_OTHERS_K}
    ), tt AS (
      SELECT event_type, SUM(cents) AS all_cents,
             CAST(COUNT(*) AS BIGINT) AS all_users
      FROM totals GROUP BY event_type
    )
    SELECT * FROM top
    UNION ALL
    SELECT t.event_type, CAST(0 AS BIGINT) AS rk,
           CAST(-1 AS BIGINT) AS user_id,
           CAST(t.all_cents - s.top_cents AS BIGINT) AS cents,
           t.all_users - {TOPK_OTHERS_K} AS n_users
    FROM tt t JOIN (
      SELECT event_type, SUM(cents) AS top_cents FROM top GROUP BY event_type
    ) s USING (event_type)
    WHERE t.all_users > {TOPK_OTHERS_K}
    """,
    tags=("window", "topk", "report", "events"),
)
def q140_topk_others(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reporting staple: per event type, the top-{TOPK_OTHERS_K}
    users by exact total cents PLUS one 'OTHERS' row (rk=0, user_id=-1)
    folding everyone else — so the rows of each group sum to the group
    total and a dashboard pie has no missing slice.

    The scale point is what is NOT computed: the naive form ranks every
    user (full per-type sort) to know who is 'other'. Here OTHERS comes
    by SUBTRACTION — type-level totals are a map-side aggregate, the
    top-k rows come from the rank window whose rk <= k filter activates
    WindowGroupLimit (each task keeps k rows per type before the sort),
    and others_cents = all_cents - top_cents. No full ranking is ever
    materialized; the window's post-pushdown input is O(k x tasks) rows
    per type. Total-order tiebreak (cents DESC, user_id) keeps the
    boundary row engine-independent."""
    e = t(spark, sf_dir, "events")
    totals = e.groupBy("event_type", "user_id").agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("long")).alias("cents")
    )
    # NULLS LAST pinned on the tiebreak: a NULL-user row tying on cents
    # with a real user would otherwise rank first in Spark and last in
    # DuckDB (the engines' opposite ASC defaults), flipping the top-k
    # boundary
    w = Window.partitionBy("event_type").orderBy(
        F.col("cents").desc(), F.asc_nulls_last("user_id")
    )
    top = (
        totals.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= TOPK_OTHERS_K)
        .select(
            "event_type", "rk", "user_id", "cents",
            F.lit(1).cast("long").alias("n_users"),
        )
    )
    tt = totals.groupBy("event_type").agg(
        F.sum("cents").alias("all_cents"),
        F.count("*").cast("long").alias("all_users"),
    )
    top_sums = top.groupBy("event_type").agg(F.sum("cents").alias("top_cents"))
    others = (
        tt.join(top_sums, "event_type")
        .filter(F.col("all_users") > TOPK_OTHERS_K)
        .select(
            "event_type",
            F.lit(0).cast("long").alias("rk"),
            F.lit(-1).cast("long").alias("user_id"),
            (F.col("all_cents") - F.col("top_cents")).cast("long").alias("cents"),
            (F.col("all_users") - TOPK_OTHERS_K).alias("n_users"),
        )
    )
    return top.unionAll(others)
