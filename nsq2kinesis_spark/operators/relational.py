"""Core relational operators: scan, project, filter, sort/limit, set ops.

Reference seeds: the Go engine's only projection is the partition-key
computation (reference aggregator.go:124-130) and its only filter is the
1 MiB oversize predicate (reference kinesis_writer.go:167); SURVEY.md §2B
declares the full relational surface. All built-in Spark — Catalyst pushes
these predicates/projections into the parquet scan (verified in
tests/test_plans.py).

Scale notes: every query here is scan→narrow-transform (no shuffle) or a
single partial+final aggregation; filters and column pruning reach the
parquet reader, so at 100 TB the scan reads only referenced columns and
row-groups passing the pushed predicates.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table as t
from .scalars import (
    DUCK_JSON_STRICT_TAIL,
    JSON_MAX_OPENS,
    json_strict_tail,
    json_structural_opens,
    json_trailing_comma,
)

# Exact-aggregation idiom: the money columns in the testdata are cents-exact
# doubles (verified: max |x*100 - round(x*100)| < 1e-8 on every money column)
# and quantities are integral, so aggregation is done in exact BIGINT cents
# (or raw double for integral values — integer-valued double addition is
# order-independent). Summation order then cannot change the result, so Spark
# and the DuckDB oracle agree bit-for-bit with no rounding roulette. This is
# also the faster plan: long-sum beats decimal-sum in codegen.
#
# Declared overflow envelope (round-9 probe): a BIGINT-cents SUM holds
# ±9.2e18 cents ≈ 10^17 dollars — three orders of magnitude past world
# GDP, so no real ledger approaches it. Past the envelope the twins
# split by design: Spark-ANSI raises ARITHMETIC_OVERFLOW (probed) while
# DuckDB silently promotes SUM(BIGINT) to HUGEINT. Loud failure on
# impossible data is the behavior we want; a corpus that legitimately
# needs wider sums switches money_sum to decimal(38,2) (slower codegen)
# rather than relying on either engine's overflow personality.


def cents(col):
    """Exact BIGINT cents of a 2-decimal money double."""
    return F.round(col * 100, 0).cast("long")


def money_sum(col):
    """Exact SUM of a 2-decimal money column, returned as double."""
    return F.sum(cents(col)).cast("double") / F.lit(100.0)


def duck_cents(col: str) -> str:
    return f"CAST(ROUND({col} * 100) AS BIGINT)"


def duck_money_sum(col: str) -> str:
    return f"CAST(SUM({duck_cents(col)}) AS DOUBLE) / 100.0"


@query(
    "q01_pricing_summary",
    oracle=f"""
    SELECT l_returnflag, l_linestatus,
           SUM(l_quantity) AS sum_qty,
           {duck_money_sum("l_extendedprice")} AS sum_base_price,
           CAST(SUM({duck_cents("l_extendedprice")} * (100 - {duck_cents("l_discount")})) AS DOUBLE) / 10000.0 AS sum_disc_price,
           CAST(SUM({duck_cents("l_extendedprice")} * (100 - {duck_cents("l_discount")}) * (100 + {duck_cents("l_tax")})) AS DOUBLE) / 1000000.0 AS sum_charge,
           SUM(l_quantity) / COUNT(*) AS avg_qty,
           {duck_money_sum("l_extendedprice")} / COUNT(*) AS avg_price,
           CAST(SUM({duck_cents("l_discount")}) AS DOUBLE) / 100.0 / COUNT(*) AS avg_disc,
           CAST(COUNT(*) AS BIGINT) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    tags=("agg", "filter", "flagship"),
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-style pricing summary: scan→filter→groupBy→8 aggregates.

    The flagship end-to-end slice (SURVEY.md §7 M0). Shuffles once on the
    2-value group key after map-side partial aggregation — at 100 TB the
    shuffle carries only |groups|×|partitions| partial rows.
    """
    li = t(spark, sf_dir, "lineitem")
    ext_c = cents(F.col("l_extendedprice"))
    disc_c = cents(F.col("l_discount"))
    tax_c = cents(F.col("l_tax"))
    cnt = F.count("*")
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum("l_quantity").alias("sum_qty"),
            money_sum(F.col("l_extendedprice")).alias("sum_base_price"),
            (F.sum(ext_c * (100 - disc_c)).cast("double") / 10000.0).alias("sum_disc_price"),
            (F.sum(ext_c * (100 - disc_c) * (100 + tax_c)).cast("double") / 1000000.0).alias(
                "sum_charge"
            ),
            (F.sum("l_quantity") / cnt).alias("avg_qty"),
            (money_sum(F.col("l_extendedprice")) / cnt).alias("avg_price"),
            (F.sum(disc_c).cast("double") / 100.0 / cnt).alias("avg_disc"),
            cnt.cast("long").alias("count_order"),
        )
    )


@query(
    "q02_project_compute",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue,
           l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge,
           l_quantity * 2 AS double_qty
    FROM lineitem
    """,
    tags=("project",),
)
def q02_project_compute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Projection with computed/aliased columns (seed: aggregator.go:124-130).

    Narrow, zero-shuffle; ReadSchema prunes to the 6 referenced columns.
    Row-level double expressions are deterministic IEEE ops (identical
    operand order in both engines) — no quantization needed.
    """
    li = t(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        disc_price.alias("revenue"),
        (disc_price * (1 + F.col("l_tax"))).alias("charge"),
        (F.col("l_quantity") * 2).alias("double_qty"),
    )


@query(
    "q03_filter_battery",
    oracle="""
    SELECT o_orderkey, o_orderstatus, o_totalprice, o_orderpriority
    FROM orders
    WHERE o_orderstatus IN ('O', 'F')
      AND o_totalprice BETWEEN 1000 AND 150000
      AND (o_orderpriority LIKE '1-%' OR o_orderpriority LIKE '2-%')
      AND NOT (o_orderpriority = '2-HIGH' AND o_totalprice < 5000)
      AND o_custkey IS NOT NULL
    """,
    tags=("filter",),
)
def q03_filter_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Predicate battery: IN/BETWEEN/LIKE/AND/OR/NOT/IS NULL.

    Seed: the reference's single predicate (kinesis_writer.go:167-170).
    All predicates are pushdown-eligible (PushedFilters in the scan node).
    """
    o = t(spark, sf_dir, "orders")
    return o.filter(
        F.col("o_orderstatus").isin("O", "F")
        & F.col("o_totalprice").between(1000, 150000)
        & (F.col("o_orderpriority").like("1-%") | F.col("o_orderpriority").like("2-%"))
        & ~((F.col("o_orderpriority") == "2-HIGH") & (F.col("o_totalprice") < 5000))
        & F.col("o_custkey").isNotNull()
    ).select("o_orderkey", "o_orderstatus", "o_totalprice", "o_orderpriority")


@query(
    "q04_sort_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
    tags=("sort", "limit"),
)
def q04_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-N: Spark runs this as TakeOrderedAndProject — each task
    keeps 25 rows, the driver merges; no global sort materializes even at
    100 TB. Tie-broken on the unique key for cross-engine determinism
    (o_totalprice is a raw stored double, so comparisons are exact)."""
    o = t(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(25)
    )


@query(
    "q05_union_all",
    oracle="""
    SELECT * FROM (
      SELECT c_custkey AS entity_key, c_name AS entity_name, 'customer' AS kind
      FROM customer WHERE c_acctbal > 9000
      UNION ALL
      SELECT s_suppkey AS entity_key, s_name AS entity_name, 'supplier' AS kind
      FROM supplier WHERE s_acctbal > 9000
    )
    """,
    tags=("setop",),
)
def q05_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two filtered projections (schema-aligned)."""
    c = t(spark, sf_dir, "customer")
    s = t(spark, sf_dir, "supplier")
    left = c.filter(F.col("c_acctbal") > 9000).select(
        F.col("c_custkey").alias("entity_key"),
        F.col("c_name").alias("entity_name"),
        F.lit("customer").alias("kind"),
    )
    right = s.filter(F.col("s_acctbal") > 9000).select(
        F.col("s_suppkey").alias("entity_key"),
        F.col("s_name").alias("entity_name"),
        F.lit("supplier").alias("kind"),
    )
    return left.unionAll(right)


@query(
    "q06_intersect",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def q06_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (distinct): nations having both customers and suppliers.
    Plans as a shuffled left-semi aggregate; small key domain → tiny shuffle."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersect(s)


@query(
    "q07_except",
    oracle="""
    SELECT c_nationkey AS nationkey FROM customer
    EXCEPT
    SELECT s_nationkey AS nationkey FROM supplier
    """,
    tags=("setop",),
)
def q07_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (distinct): nations with customers but no suppliers.
    (`subtract` = EXCEPT DISTINCT; `exceptAll` would be bag semantics.)"""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.subtract(s)


@query(
    "q08_distinct",
    oracle="""
    SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders
    """,
    tags=("setop", "dedup"),
)
def q08_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection — partial-aggregate dedup before the shuffle, so
    the shuffle carries |distinct| rows per partition, not the table."""
    return t(spark, sf_dir, "orders").select("o_orderstatus", "o_orderpriority").distinct()


@query(
    "q09_set_ops_all",
    oracle="""
    SELECT nationkey, 'intersect_all' AS op FROM (
      SELECT c_nationkey AS nationkey FROM customer
      INTERSECT ALL
      SELECT s_nationkey FROM supplier
    )
    UNION ALL
    SELECT nationkey, 'except_all' AS op FROM (
      SELECT c_nationkey AS nationkey FROM customer
      EXCEPT ALL
      SELECT s_nationkey FROM supplier
    )
    """,
    tags=("setop", "bag"),
)
def q09_set_ops_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag-semantics set ops (INTERSECT ALL / EXCEPT ALL): each duplicate
    participates individually — min(multiplicity) for intersect,
    left-minus-right multiplicity for except. Completes q06/q07's DISTINCT
    variants; one tagged union returns both results."""
    c = t(spark, sf_dir, "customer").select(F.col("c_nationkey").alias("nationkey"))
    s = t(spark, sf_dir, "supplier").select(F.col("s_nationkey").alias("nationkey"))
    return c.intersectAll(s).withColumn("op", F.lit("intersect_all")).unionAll(
        c.exceptAll(s).withColumn("op", F.lit("except_all"))
    )


# -- q95: Z-order layout key --------------------------------------------------

Z_BITS = 8  # bits per dimension after bucket normalization; zkey spans 16


def _duck_z_terms(expr: str, offset: int) -> str:
    return " + ".join(
        f"((({expr} >> {i}) & 1) << {2 * i + offset})" for i in range(Z_BITS)
    )


def zorder_key(a, b):
    """Interleave the low Z_BITS bits of two integer dimensions into one
    Morton (Z-curve) key: a's bit i lands at position 2i, b's at 2i+1.
    Pure codegen bit arithmetic — no UDF."""
    from functools import reduce

    terms = [
        F.shiftleft(F.shiftright(a, i).bitwiseAND(F.lit(1)), 2 * i)
        for i in range(Z_BITS)
    ] + [
        F.shiftleft(F.shiftright(b, i).bitwiseAND(F.lit(1)), 2 * i + 1)
        for i in range(Z_BITS)
    ]
    return reduce(lambda x, y: x + y, terms)


_DUCK_Z_DIMS = f"""
    bounds AS (
      SELECT MIN(user_id) AS min_u, MAX(user_id) AS max_u,
             MIN(CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400) AS min_d,
             MAX(CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400) AS max_d
      FROM events
    ),
    dims AS (
      SELECT event_id,
             (user_id - min_u) * {(1 << Z_BITS) - 1}
               // GREATEST(1, max_u - min_u) AS dim_user,
             (CAST(FLOOR(EPOCH(ts)) AS BIGINT) // 86400 - min_d) * {(1 << Z_BITS) - 1}
               // GREATEST(1, max_d - min_d) AS dim_day
      FROM events CROSS JOIN bounds
    )
"""


@query(
    "q95_zorder_key",
    oracle=f"""
    WITH {_DUCK_Z_DIMS}
    SELECT event_id,
           CAST(dim_user AS BIGINT) AS dim_user,
           CAST(dim_day AS BIGINT) AS dim_day,
           CAST({_duck_z_terms("dim_user", 0)}
              + {_duck_z_terms("dim_day", 1)} AS BIGINT) AS zkey
    FROM dims
    """,
    tags=("layout", "zorder"),
)
def q95_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout key over (user_id, event day) — the
    multi-dimensional clustering technique for scan pruning at 100 TB:
    write a table range-partitioned and sorted by this key and every
    output file covers a bounded RECTANGLE in (user, day) space, so
    parquet min/max row-group statistics prune scans filtered on EITHER
    dimension (a single-column sort prunes only its own column).

    Raw column values interleave badly when the dimensions span different
    bit-widths (the wider one dominates the curve), so each dimension is
    first min-max normalized to a Z_BITS-wide bucket rank — the same
    equal-width normalization OPTIMIZE ZORDER performs. The min/max
    bounds ride a broadcast cross join (scalar row — no data moves to the
    driver); bucketing and interleaving are exact integer arithmetic
    inside whole-stage codegen, bit-identical to the SQL twin. The layout
    payoff is demonstrated in tests/test_plans.py (file-level min/max
    rectangles after a z-ordered write vs a single-dimension sort)."""
    ev = t(spark, sf_dir, "events")
    day = F.floor(F.unix_timestamp("ts") / 86400).cast("long")
    bounds = ev.agg(
        F.min("user_id").alias("min_u"),
        F.max("user_id").alias("max_u"),
        F.min(day).alias("min_d"),
        F.max(day).alias("max_d"),
    )
    top = (1 << Z_BITS) - 1
    with_bounds = ev.select("event_id", "user_id", day.alias("day")).crossJoin(
        F.broadcast(bounds)
    )
    # integer DIV, not double '/': past ~2^45-wide dimension ranges a
    # double quotient can round UP across the bucket boundary where the
    # oracle's integer // floors — DIV keeps both engines in exact i64
    # arithmetic (the (x−min)·top product must fit a long, i.e. dimension
    # ranges up to ~2^55 — the same domain the oracle's BIGINT // has)
    dim_user = F.expr(
        f"(user_id - min_u) * {top} div greatest(1, max_u - min_u)"
    ).cast("long")
    dim_day = F.expr(
        f"(day - min_d) * {top} div greatest(1, max_d - min_d)"
    ).cast("long")
    return with_bounds.select(
        "event_id",
        dim_user.alias("dim_user"),
        dim_day.alias("dim_day"),
        zorder_key(dim_user, dim_day).cast("long").alias("zkey"),
    )


# -- q123: data-quality rule report -------------------------------------------


@query(
    "q123_dq_report",
    oracle="""
    SELECT 'orders_nonneg_total' AS rule,
           CAST(SUM(CASE WHEN o_totalprice < 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violations,
           CAST(COUNT(*) AS BIGINT) AS n_checked
    FROM orders
    UNION ALL
    SELECT 'lineitem_fk_orders',
           CAST(COUNT(*) AS BIGINT),
           (SELECT CAST(COUNT(*) AS BIGINT) FROM lineitem)
    FROM lineitem l WHERE NOT EXISTS
      (SELECT 1 FROM orders o WHERE o.o_orderkey = l.l_orderkey)
    UNION ALL
    SELECT 'events_user_not_null',
           CAST(SUM(CASE WHEN user_id IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'documents_nonempty_text',
           CAST(SUM(CASE WHEN text IS NULL OR LENGTH(text) = 0 THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'part_pk_unique',
           CAST(COUNT(*) - COUNT(DISTINCT p_partkey) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM part
    UNION ALL
    SELECT 'lineitem_qty_in_range',
           CAST(SUM(CASE WHEN l_quantity <= 0 OR l_quantity > 100 THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'embeddings_vec_id_unique',
           CAST(COUNT(*) - COUNT(DISTINCT vec_id) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM embeddings
    UNION ALL
    SELECT 'documents_doc_id_unique',
           CAST(COUNT(*) - COUNT(DISTINCT doc_id) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM documents
    UNION ALL
    SELECT 'events_version_unique',
           CAST(COUNT(*) - (SELECT COUNT(*) FROM
             (SELECT DISTINCT user_id, event_type, CAST(ts AS TIMESTAMP) AS ts,
                     event_id
              FROM events)) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'events_props_parse_contract',
           CAST(SUM(CASE WHEN LENGTH(s)
                  - LENGTH(REPLACE(REPLACE(s, '{', ''), '[', '')) > 1000
                  THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM (SELECT regexp_replace(props, '"([^"\\\\]|\\\\.)*"', '""', 'g') AS s
          FROM events)
    UNION ALL
    SELECT 'events_props_surrogate_escapes',
           CAST(SUM(CASE WHEN regexp_matches(props, '\\\\u[dD][89a-fA-F]')
                  THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'events_props_nul_escapes',
           CAST(SUM(CASE WHEN regexp_matches(props, '\\\\u0000')
                  THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'events_props_trailing_garbage',
           CAST(SUM(CASE WHEN NOT (__DUCK_STRICT_TAIL__) THEN 1 ELSE 0 END)
                AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM (SELECT regexp_replace(regexp_replace(props, '\\\\.', '', 'g'),
                                '"[^"]*"', '""', 'g') AS stripped2
          FROM events)
    UNION ALL
    SELECT 'events_props_trailing_commas',
           CAST(SUM(CASE WHEN regexp_matches(
                  regexp_replace(regexp_replace(props, '\\\\.', '', 'g'),
                                 '"[^"]*"', '""', 'g'),
                  ',[ \\t\\n\\r]*[}\\]]') THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM events
    UNION ALL
    SELECT 'events_props_dupkeys',
           CAST(SUM(CASE WHEN
             CASE WHEN json_valid(props) THEN
               CASE WHEN json_type(props) = 'OBJECT' THEN
                 LEN(json_keys(props)) <> LEN(list_distinct(json_keys(props)))
               ELSE FALSE END
             ELSE FALSE END
             THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(*) AS BIGINT)
    FROM events
    """.replace(
        # the strict-tail depth scan is shared verbatim with q44's oracle
        # (scalars.DUCK_JSON_STRICT_TAIL) — spliced here because this
        # oracle is a plain (non-f) string whose own braces must stay raw
        "__DUCK_STRICT_TAIL__",
        DUCK_JSON_STRICT_TAIL.format(s="stripped2"),
    ),
    tags=("relational", "quality", "validation"),
)
def q123_dq_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality report (the Deequ/Great-Expectations
    pattern): a battery of table constraints — non-negativity, referential
    integrity, null checks, emptiness, key uniqueness, range bounds — each
    evaluated as a scan + aggregate and unioned into one (rule,
    n_violations, n_checked) result. Every rule is a map-side-combinable
    count, the FK rule is a keyed anti join (AQE-splittable), and the
    branches are independent scans Spark schedules concurrently — the
    shape a 100 TB nightly validation job wants (one pass per table,
    no row-level materialization of violations; a triage variant would
    add a per-rule violation sample via WindowGroupLimit)."""
    orders = t(spark, sf_dir, "orders")
    lineitem = t(spark, sf_dir, "lineitem")
    events = t(spark, sf_dir, "events")
    documents = t(spark, sf_dir, "documents")
    part = t(spark, sf_dir, "part")

    def rule(name: str, df: DataFrame, violation) -> DataFrame:
        return df.agg(
            F.lit(name).alias("rule"),
            F.sum(F.when(violation, 1).otherwise(0)).cast("long").alias(
                "n_violations"
            ),
            F.count("*").cast("long").alias("n_checked"),
        )

    n_li = lineitem.agg(F.count("*").cast("long").alias("n_checked"))
    fk = (
        lineitem.join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_anti",
        )
        .agg(F.count("*").cast("long").alias("n_violations"))
        .select(F.lit("lineitem_fk_orders").alias("rule"), "n_violations")
        .crossJoin(F.broadcast(n_li))
    )
    pk = part.agg(
        F.lit("part_pk_unique").alias("rule"),
        (F.count("*") - F.countDistinct("p_partkey")).cast("long").alias(
            "n_violations"
        ),
        F.count("*").cast("long").alias("n_checked"),
    )
    return (
        rule("orders_nonneg_total", orders, F.col("o_totalprice") < 0)
        .unionByName(fk)
        .unionByName(rule("events_user_not_null", events, F.col("user_id").isNull()))
        .unionByName(
            rule(
                "documents_nonempty_text",
                documents,
                F.col("text").isNull() | (F.length("text") == 0),
            )
        )
        .unionByName(pk)
        .unionByName(
            rule(
                "lineitem_qty_in_range",
                lineitem,
                (F.col("l_quantity") <= 0) | (F.col("l_quantity") > 100),
            )
        )
        .unionByName(
            # the vector family's unique-id PRECONDITION (round 7): id
            # uniqueness is a cross-row invariant — unlike the row-local
            # valid-vector contract it cannot be filtered per-row without
            # a shuffle in every vector query, so THIS report is the
            # declared enforcement point (see similarity.py's contract
            # comment). A duplicated vec_id makes "the vector with id X"
            # ambiguous, and q90/q98's per-id reductions pick
            # engine-dependent rows.
            t(spark, sf_dir, "embeddings").agg(
                F.lit("embeddings_vec_id_unique").alias("rule"),
                (F.count("*") - F.countDistinct("vec_id")).cast("long").alias(
                    "n_violations"
                ),
                F.count("*").cast("long").alias("n_checked"),
            )
        )
        .unionByName(
            # the document family's unique-id PRECONDITION (round 8,
            # completing the identity triptych: vec_id r7, CDC version
            # tuple r8 above): every per-doc reduction in the dedup/split
            # family (q75 pair keys, q85's salted split, q102's
            # first-occurrence keeper, q111's per-doc reassembly) assumes
            # "the document with id X" is one row; a duplicated doc_id
            # makes those reductions engine-dependent. Cross-row invariant
            # → enforced here, not re-shuffled in every document query.
            t(spark, sf_dir, "documents").agg(
                F.lit("documents_doc_id_unique").alias("rule"),
                (F.count("*") - F.countDistinct("doc_id")).cast("long").alias(
                    "n_violations"
                ),
                F.count("*").cast("long").alias("n_checked"),
            )
        )
        .unionByName(
            # the CDC family's total-order PRECONDITION (round 8): q126's
            # last-write-wins and q138's snapshots version each
            # (user_id, event_type) key by (ts, event_id) and declare that
            # order TOTAL. A duplicated full version tuple makes the
            # winner's payload engine-dependent (max_by ties break by
            # arrival order), so — like vec_id uniqueness for the vector
            # family — uniqueness is a cross-row invariant enforced HERE,
            # not re-checked with an extra shuffle inside every CDC query.
            # groupBy on the tuple (NULLs group together, matching the
            # oracle's SELECT DISTINCT) keeps the count NULL-safe where
            # countDistinct would drop NULL-bearing rows.
            events.groupBy("user_id", "event_type", "ts", "event_id")
            .agg(F.count("*").alias("n"))
            .agg(
                F.lit("events_version_unique").alias("rule"),
                (F.coalesce(F.sum("n"), F.lit(0)) - F.count("*"))
                .cast("long")
                .alias("n_violations"),
                F.coalesce(F.sum("n"), F.lit(0))
                .cast("long")
                .alias("n_checked"),
            )
        )
        .unionByName(
            # the JSON family's parse-contract rule (round 9, from the
            # deep-nesting probe): q44 declares payloads with more than
            # JSON_MAX_OPENS structural open brackets out of the parse
            # contract (Jackson's depth-1000 cap vs yyjson's unbounded
            # recursion — scalars.py). Like every contract above, the
            # report is where operators SEE the excluded slice instead of
            # mistaking contract NULLs for absent keys.
            rule(
                "events_props_parse_contract",
                events,
                json_structural_opens(F.col("props")) > JSON_MAX_OPENS,
            )
        )
        .unionByName(
            # round-10 escaped-surrogate rule (the lone-surrogate probe):
            # q44 excludes payloads carrying any uD8xx-uDFxx-shaped
            # escape because Jackson parses a LONE surrogate where
            # yyjson rejects the payload — this is where operators see
            # how much of the corpus that contract sets aside
            rule(
                "events_props_surrogate_escapes",
                events,
                F.col("props").rlike(r"\\u[dD][89a-fA-F]"),
            )
        )
        .unionByName(
            # round-11 NUL-escape rule (the control-char probe): q44
            # excludes payloads carrying a backslash-u0000 escape, as a key
            # decoding to an embedded NUL makes the sorted key join
            # engine-dependent (DuckDB's sort-key encoding truncates at
            # NUL while its =/< and Spark's sort are byte-exact) — this
            # is where operators see how much the contract sets aside
            rule(
                "events_props_nul_escapes",
                events,
                F.col("props").rlike(r"\\u0000"),
            )
        )
        .unionByName(
            # round-11 grammar-leniency rules (the parser-flags probe):
            # trailing garbage after the first JSON value — Jackson
            # parses the first value and ignores the rest, yyjson
            # rejects the payload; q44 excludes these via the
            # json_strict_tail depth scan, and this is where operators
            # see how much of the corpus that sets aside
            rule(
                "events_props_trailing_garbage",
                events,
                ~json_strict_tail(F.col("props")),
            )
        )
        .unionByName(
            # ...and the REVERSE direction: a trailing comma before a
            # closer is accepted by yyjson and rejected by Jackson
            rule(
                "events_props_trailing_commas",
                events,
                json_trailing_comma(F.col("props")),
            )
        )
        .unionByName(
            # round-10 twin of the rule above (the duplicate-key probe):
            # q44 declares duplicate-TOP-level-key payloads out of the
            # parse contract because Spark's struct from_json is
            # last-wins while yyjson's json_extract is first-wins — and
            # Spark's own get_json_object sides with yyjson. The dedup
            # detector reuses q44's: from_json(map) preserves duplicate
            # keys; NULL (unparseable / non-object) is not a violation.
            # round-11: the map is parsed ONCE through a projection (the
            # r10 verdict's double-from_json nit) with the same
            # allowSingleQuotes=false strictness as q44, so a
            # single-quoted dup-key payload cannot count here while the
            # yyjson-based oracle rule rejects it as invalid.
            rule(
                "events_props_dupkeys",
                events.select(
                    F.map_keys(
                        F.from_json(
                            "props",
                            "map<string,string>",
                            {"allowSingleQuotes": "false"},
                        )
                    ).alias("_keys")
                ),
                F.size("_keys") != F.size(F.array_distinct("_keys")),
            )
        )
    )


# -- q126: CDC changelog compaction (upsert/delete apply) ----------------------

CDC_DELETE_BELOW = 1.0  # rows with value < $1 are treated as tombstones


@query(
    "q126_cdc_apply",
    oracle=f"""
    WITH ranked AS (
      SELECT user_id, event_type, ts, event_id, value,
             CASE WHEN value < {CDC_DELETE_BELOW} THEN 'D' ELSE 'U' END AS op,
             ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                ORDER BY ts DESC, event_id DESC) AS rn,
             CAST(COUNT(*) OVER (PARTITION BY user_id, event_type) AS BIGINT)
               AS n_versions
      FROM events
    )
    SELECT user_id, event_type, {duck_cents("value")} AS last_cents,
           ts AS last_ts, n_versions
    FROM ranked WHERE rn = 1 AND op <> 'D'
    """,
    tags=("relational", "cdc", "upsert", "events"),
)
def q126_cdc_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Changelog compaction — the merge-on-read half of a lakehouse CDC
    apply: collapse a keyed changelog to its last-write-wins final state,
    dropping keys whose latest entry is a delete tombstone. The changelog
    here is the events stream keyed by (user_id, event_type), versioned
    by (ts, event_id) — a TOTAL order, so ties can't make the winner
    engine-dependent — with rows under ${CDC_DELETE_BELOW} acting as
    tombstones (a deterministic op column derived from the data).

    PRECONDITION (declared round 8): (user_id, event_type, ts, event_id)
    is unique — a duplicated full version tuple ties max_by and makes the
    winning payload engine-dependent. Enforcement lives in q123's
    events_version_unique DQ rule (the same cross-row-invariant pattern
    as the vector family's vec_id uniqueness): re-checking it here would
    cost a second shuffle per CDC query for an invariant the nightly
    report already certifies.

    The 100 TB shape is the point: last-write-wins is computed as ONE
    max_by aggregate over a lexicographic (ts, event_id) struct — a
    map-side-combinable hash aggregate that partial-merges inside the
    scan, AQE-splittable on skewed keys — deliberately NOT the window
    rn=1 idiom (which shuffles every version of every hot key to one
    task before discarding all but one row; same argument as q111's
    min-struct keeper). The oracle states the same semantics in the
    window form DuckDB optimizes fine at oracle scale. Tombstoned keys
    keep costing their aggregate row until filtered — exactly how
    Hudi/Iceberg merge-on-read compaction behaves before a rewrite.

    Garbage-value evaluation order (pinned round 6, HARDENED round 7):
    the cents cast raises loudly on NaN/Infinity (ANSI) — but max_by
    evaluates its value struct for every row that LEADS the running max
    at update time (the first row of each map-side partial, any interim
    leader), not just the final winner. Converting cents inside the
    struct therefore made the raise dependent on SCAN ORDER: a NaN row
    appended before its superseding correction — the natural CDC order —
    would raise in Spark while the oracle (cents on the rn=1 winner
    only) returns cleanly. The struct now carries the RAW double and
    cents is applied after the groupBy, so conversion is provably
    winner-only, mirroring the oracle exactly. q138's snapshots get the
    same treatment; the planted tests pin BOTH garbage orders (NaN
    preceding and following its correction)."""
    e = t(spark, sf_dir, "events")
    last = F.max_by(
        F.struct(
            F.col("value").alias("value"),
            F.col("ts").alias("ts"),
            # NULL value is an UPSERT carrying NULL cents, never a
            # tombstone — mirrors the oracle's CASE ELSE 'U' (a bare
            # `value < x` predicate is NULL for NULL input, and ~NULL
            # would silently drop the key; the q121 NULL-variant lesson)
            F.coalesce(
                F.col("value") < F.lit(CDC_DELETE_BELOW), F.lit(False)
            ).alias("is_delete"),
        ),
        F.struct(F.col("ts"), F.col("event_id")),
    )
    out = e.groupBy("user_id", "event_type").agg(
        last.alias("last"),
        F.count("*").cast("long").alias("n_versions"),
    )
    return (
        out.filter(~F.col("last.is_delete"))
        .select(
            "user_id",
            "event_type",
            cents(F.col("last.value")).alias("last_cents"),
            F.col("last.ts").alias("last_ts"),
            "n_versions",
        )
    )


# -- q138: snapshot diff (changelog generation) --------------------------------

SNAP_T1 = "2024-01-15 00:00:00"
SNAP_T2 = "2024-01-30 00:00:00"

_SNAP_SQL = f"""
      SELECT user_id, event_type, {duck_cents("value")} AS cents FROM (
        SELECT user_id, event_type, value,
               CASE WHEN value < {CDC_DELETE_BELOW} THEN 'D' ELSE 'U' END AS op,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events WHERE ts < TIMESTAMP '{{cut}}'
      ) WHERE rn = 1 AND op <> 'D'
"""


@query(
    "q138_snapshot_diff",
    oracle=f"""
    WITH s1 AS ({_SNAP_SQL.format(cut=SNAP_T1)}),
    s2 AS ({_SNAP_SQL.format(cut=SNAP_T2)})
    SELECT COALESCE(s1.user_id, s2.user_id) AS user_id,
           COALESCE(s1.event_type, s2.event_type) AS event_type,
           CASE WHEN s1.user_id IS NULL THEN 'I'
                WHEN s2.user_id IS NULL THEN 'D'
                ELSE 'U' END AS op,
           s1.cents AS old_cents, s2.cents AS new_cents
    FROM s1 FULL OUTER JOIN s2
      ON s1.user_id = s2.user_id AND s1.event_type = s2.event_type
    WHERE s1.user_id IS NULL OR s2.user_id IS NULL
       OR s1.cents IS DISTINCT FROM s2.cents
    """,
    tags=("relational", "cdc", "diff", "events"),
)
def q138_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot diff — q126's inverse: given the table state as of two
    points in time, GENERATE the changelog between them (insert / update
    / delete rows with old and new values). This is how a lakehouse
    backfills CDC for a table that never had one, and how incremental
    consumers catch up after an outage: diff two snapshots instead of
    replaying history.

    Each snapshot is the q126 compaction cut at its timestamp (last
    write wins under the total (ts, event_id) order; tombstoned keys are
    absent — so a key that was live at T1 and tombstoned by T2 correctly
    surfaces as a DELETE). Inherits q126's declared precondition: the
    (user_id, event_type, ts, event_id) version tuple is unique, enforced
    by q123's events_version_unique rule — a duplicate tuple would make
    both snapshots' winners engine-dependent. The diff is one full-outer hash join on the
    key with null-arm classification, and unchanged keys are filtered
    out so the output is the minimal changelog. Both snapshots are
    max_by aggregates (map-side combinable, no window — the q126 scale
    argument twice over); at 100 TB the two snapshot scans share the
    partition layout, and the join shuffles |keys| rows, not history."""
    e = t(spark, sf_dir, "events")

    def snapshot(cut: str) -> DataFrame:
        # raw value in the struct, cents() post-agg: winner-only
        # conversion regardless of scan order (see q126's docstring)
        last = F.max_by(
            F.struct(
                F.col("value").alias("value"),
                F.coalesce(
                    F.col("value") < F.lit(CDC_DELETE_BELOW), F.lit(False)
                ).alias("is_delete"),
            ),
            F.struct(F.col("ts"), F.col("event_id")),
        )
        return (
            e.filter(F.col("ts") < F.lit(cut).cast("timestamp"))
            .groupBy("user_id", "event_type")
            .agg(last.alias("last"))
            .filter(~F.col("last.is_delete"))
            .select(
                "user_id",
                "event_type",
                cents(F.col("last.value")).alias("cents"),
            )
        )

    s1 = snapshot(SNAP_T1).alias("s1")
    s2 = snapshot(SNAP_T2).alias("s2")
    joined = s1.join(
        s2,
        (F.col("s1.user_id") == F.col("s2.user_id"))
        & (F.col("s1.event_type") == F.col("s2.event_type")),
        "full_outer",
    )
    return (
        joined.select(
            F.coalesce(F.col("s1.user_id"), F.col("s2.user_id")).alias("user_id"),
            F.coalesce(F.col("s1.event_type"), F.col("s2.event_type")).alias(
                "event_type"
            ),
            F.when(F.col("s1.user_id").isNull(), "I")
            .when(F.col("s2.user_id").isNull(), "D")
            .otherwise("U")
            .alias("op"),
            F.col("s1.cents").alias("old_cents"),
            F.col("s2.cents").alias("new_cents"),
        )
        # null-SAFE change test: a present row can legitimately carry NULL
        # cents (the q126 NULL-value upsert), so a bare `old <> new` would
        # NULL out and silently drop (oracle) or spuriously keep (Spark)
        # such keys — IS DISTINCT FROM / eqNullSafe on both twins makes
        # NULL->value a 'U' and NULL->NULL unchanged in both engines;
        # I/D rows (op != 'U') pass unconditionally
        .filter(
            (F.col("op") != "U")
            | ~F.col("old_cents").eqNullSafe(F.col("new_cents"))
        )
    )
