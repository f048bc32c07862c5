"""Join operators: inner/outer/semi/anti equi-joins, theta joins, as-of.

The reference has no joins at all (SURVEY.md §2B, verified); the nearest
seed is the dedup complement test (reference deduper.go:33) ≈ anti-join.

Scale notes: dimension sides (nation/region/supplier/part) are broadcast —
no shuffle of the fact table. Fact-to-fact joins (lineitem⋈orders) shuffle
both sides on the join key; AQE handles skew splitting. Theta joins are
kept equi+residual (hash join on the equi part, predicate as residual) so
they never degrade to a broadcast-nested-loop over the fact table.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import table as t
from .relational import cents, duck_cents

# exact revenue aggregation in integer cents×basis-points (see relational.py)


def revenue_sum():
    """Exact SUM(l_extendedprice * (1 - l_discount)) via BIGINT units."""
    ext_c = cents(F.col("l_extendedprice"))
    disc_c = cents(F.col("l_discount"))
    return F.sum(ext_c * (100 - disc_c)).cast("double") / 10000.0


DUCK_REVENUE_SUM = (
    f"CAST(SUM({duck_cents('l_extendedprice')} * (100 - {duck_cents('l_discount')})) "
    "AS DOUBLE) / 10000.0"
)


@query(
    "q20_join_inner_broadcast",
    oracle=f"""
    SELECT n_name,
           {DUCK_REVENUE_SUM} AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_items
    FROM lineitem
    JOIN supplier ON l_suppkey = s_suppkey
    JOIN nation   ON s_nationkey = n_nationkey
    GROUP BY n_name
    """,
    tags=("join", "broadcast", "agg"),
)
def q20_join_inner_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact ⋈ broadcast(dim) ⋈ broadcast(dim): revenue by supplier nation.
    The lineitem scan never shuffles for the joins — only for the final agg."""
    li = t(spark, sf_dir, "lineitem")
    s = t(spark, sf_dir, "supplier")
    n = t(spark, sf_dir, "nation")
    return (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            revenue_sum().alias("revenue"),
            F.count("*").cast("long").alias("n_items"),
        )
    )


@query(
    "q21_join_shuffle_3way",
    oracle=f"""
    SELECT c_mktsegment,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_orders,
           {DUCK_REVENUE_SUM} AS revenue
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY c_mktsegment
    """,
    tags=("join", "agg"),
)
def q21_join_shuffle_3way(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact-to-fact shuffle join (lineitem⋈orders on o_orderkey) plus a
    customer join; TPC-H-Q3-shaped. At 100 TB both fact sides hash-shuffle
    on the same key; AQE picks SMJ/SHJ and splits skewed partitions.

    Partial aggregation is pushed BELOW the join: lineitem pre-aggregates
    revenue per orderkey (exact integer units, so the regroup is lossless),
    which (a) shuffles one row per order instead of every line item and
    (b) turns the top-level COUNT(DISTINCT o_orderkey) into a plain
    count(*) — no expand/two-phase distinct aggregation."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp")
    )
    li_agg = (
        t(spark, sf_dir, "lineitem")
        .groupBy("l_orderkey")
        .agg(
            F.sum(cents(F.col("l_extendedprice")) * (100 - cents(F.col("l_discount")))).alias(
                "rev_units"
            )
        )
    )
    return (
        c.join(o, c.c_custkey == o.o_custkey)
        .join(li_agg, li_agg.l_orderkey == o.o_orderkey)
        .groupBy("c_mktsegment")
        .agg(
            F.count("*").cast("long").alias("n_orders"),
            (F.sum("rev_units").cast("double") / 10000.0).alias("revenue"),
        )
    )


@query(
    "q22_join_left_outer",
    oracle=f"""
    SELECT c_custkey,
           CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders,
           CAST(COALESCE(SUM({duck_cents("o_totalprice")}), 0) AS DOUBLE) / 100.0 AS total_spent
    FROM customer
    LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey
    """,
    tags=("join", "outer"),
)
def q22_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT OUTER join preserving order-less customers (count = 0)."""
    c = t(spark, sf_dir, "customer")
    o = t(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").cast("long").alias("n_orders"),
            (F.coalesce(F.sum(cents(F.col("o_totalprice"))), F.lit(0)).cast("double") / 100.0)
            .alias("total_spent"),
        )
    )


@query(
    "q23_join_right_outer",
    oracle="""
    SELECT p_partkey, p_name,
           CAST(COUNT(l_orderkey) AS BIGINT) AS n_lineitems
    FROM lineitem
    RIGHT JOIN part ON l_partkey = p_partkey
    GROUP BY p_partkey, p_name
    """,
    tags=("join", "outer"),
)
def q23_join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RIGHT OUTER join preserving parts never ordered."""
    li = t(spark, sf_dir, "lineitem")
    p = t(spark, sf_dir, "part")
    return (
        li.join(p, li.l_partkey == p.p_partkey, "right")
        .groupBy("p_partkey", "p_name")
        .agg(F.count("l_orderkey").cast("long").alias("n_lineitems"))
    )


@query(
    "q24_join_full_outer",
    oracle="""
    WITH cust AS (
      SELECT c_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_customers
      FROM customer GROUP BY c_nationkey
    ), supp AS (
      SELECT s_nationkey AS nationkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers
      FROM supplier GROUP BY s_nationkey
    )
    SELECT COALESCE(cust.nationkey, supp.nationkey) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers
    FROM cust FULL OUTER JOIN supp ON cust.nationkey = supp.nationkey
    """,
    tags=("join", "outer"),
)
def q24_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join of two aggregated sides."""
    cust = (
        t(spark, sf_dir, "customer")
        .groupBy(F.col("c_nationkey").alias("nationkey"))
        .agg(F.count("*").cast("long").alias("n_customers"))
    )
    supp = (
        t(spark, sf_dir, "supplier")
        .groupBy(F.col("s_nationkey").alias("nationkey"))
        .agg(F.count("*").cast("long").alias("n_suppliers"))
    )
    joined = cust.join(supp, "nationkey", "full")
    return joined.select(
        F.col("nationkey"),
        F.coalesce("n_customers", F.lit(0)).cast("long").alias("n_customers"),
        F.coalesce("n_suppliers", F.lit(0)).cast("long").alias("n_suppliers"),
    )


@query(
    "q25_join_semi",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer
    WHERE c_custkey IN (
      SELECT user_id FROM events WHERE event_type = 'purchase'
    )
    """,
    tags=("join", "semi"),
)
def q25_join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS): customers who made a purchase event.
    Semi joins never duplicate the left side — no fanout at scale."""
    c = t(spark, sf_dir, "customer")
    ev = t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    return c.join(ev, c.c_custkey == ev.user_id, "left_semi").select("c_custkey", "c_name")


@query(
    "q26_join_anti",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM events e WHERE e.user_id = c.c_custkey)
    """,
    tags=("join", "anti"),
)
def q26_join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers with no events.
    Seed: the dedup complement (reference deduper.go:33).

    The oracle is NOT EXISTS, deliberately not NOT IN (round-7 planted
    probe): with even ONE NULL user_id in events — routine in a real
    event stream — `x NOT IN (...NULL...)` is never TRUE under
    three-valued logic, so the NOT IN form returns ZERO rows while
    Spark's left_anti (NOT EXISTS semantics: the join condition simply
    never matches on NULL) keeps every no-event customer. Both twins
    also agree a NULL-keyed customer row is kept: its equality never
    matches anything."""
    c = t(spark, sf_dir, "customer")
    ev = t(spark, sf_dir, "events")
    return c.join(ev, c.c_custkey == ev.user_id, "left_anti").select("c_custkey", "c_name")


@query(
    "q27_join_theta",
    oracle="""
    SELECT n_name,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM supplier
    JOIN customer ON s_nationkey = c_nationkey AND s_acctbal < c_acctbal
    JOIN nation   ON n_nationkey = s_nationkey
    GROUP BY n_name
    """,
    tags=("join", "theta"),
)
def q27_join_theta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta join = equi-key (nation) + range residual (acctbal <).
    Keeping the equi component makes this a hash join with a residual
    filter, NOT a nested-loop cross product — the pattern that survives
    100×: cardinality is bounded per nation bucket."""
    s = t(spark, sf_dir, "supplier")
    c = t(spark, sf_dir, "customer")
    n = t(spark, sf_dir, "nation")
    return (
        s.join(c, (s.s_nationkey == c.c_nationkey) & (s.s_acctbal < c.c_acctbal))
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(F.count("*").cast("long").alias("n_pairs"))
    )


@query(
    "q28_join_asof",
    oracle="""
    WITH ordered AS (
      SELECT user_id, ts, event_id, event_type, value,
             LAST_VALUE(CASE WHEN event_type = 'view' THEN value END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id NULLS LAST
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_value,
             LAST_VALUE(CASE WHEN event_type = 'view' THEN ts END IGNORE NULLS)
               OVER (PARTITION BY user_id ORDER BY ts NULLS LAST, event_id NULLS LAST
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_view_ts
      FROM (SELECT * REPLACE (CAST(ts AS TIMESTAMP) AS ts) FROM events) events
    )
    SELECT event_id, user_id, ts, value, last_view_value, last_view_ts
    FROM ordered WHERE event_type = 'purchase'
    """,
    tags=("join", "asof", "window"),
)
def q28_join_asof(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's most recent prior
    'view' event (event-time ordered, tie-broken on event_id).

    Implemented as a union-then-window single pass — one shuffle on user_id,
    no range join explosion. This is the scalable as-of pattern: state per
    key is O(1) (last seen view), unlike a time-bucketed range join.
    Reference seed: processing-time-only pipeline (SURVEY.md §1) generalized
    to event time.
    """
    ev = t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.asc_nulls_last("ts"), F.asc_nulls_last("event_id"))
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    view_val = F.when(F.col("event_type") == "view", F.col("value"))
    view_ts = F.when(F.col("event_type") == "view", F.col("ts"))
    return (
        ev.withColumn("last_view_value", F.last(view_val, ignorenulls=True).over(w))
        .withColumn("last_view_ts", F.last(view_ts, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "user_id", "ts", "value", "last_view_value", "last_view_ts")
    )


@query(
    "q29_exists_subquery",
    oracle="""
    SELECT c_custkey, c_mktsegment FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
                        AND o.o_totalprice > 500000)
    """,
    tags=("join", "subquery", "semi", "anti"),
)
def q29_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS / NOT EXISTS subqueries (SQL surface) — Catalyst
    rewrites them to left-semi and left-anti joins, the same physical plan
    as q25/q26's DataFrame forms; this query proves the SQL entry path.
    """
    t(spark, sf_dir, "customer").createOrReplaceTempView("nsq2k_q29_customer")
    t(spark, sf_dir, "orders").createOrReplaceTempView("nsq2k_q29_orders")
    return spark.sql(
        """
        SELECT c_custkey, c_mktsegment FROM nsq2k_q29_customer c
        WHERE EXISTS (SELECT 1 FROM nsq2k_q29_orders o
                      WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 300000)
          AND NOT EXISTS (SELECT 1 FROM nsq2k_q29_orders o
                          WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'F'
                            AND o.o_totalprice > 500000)
        """
    )


# -- q94: range join, bin-blocked ---------------------------------------------

RANGE_LOOKBACK_S = 1800  # 30-minute attribution window = 1 bin width


@query(
    "q94_range_join_binned",
    oracle=f"""
    SELECT p.event_id, p.user_id,
           CAST(COUNT(v.event_id) AS BIGINT) AS n_precursors,
           CAST(SUM(CASE WHEN v.event_type = 'view'  THEN 1 ELSE 0 END) AS BIGINT)
             AS n_views,
           CAST(SUM(CASE WHEN v.event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT)
             AS n_clicks
    FROM events p
    LEFT JOIN events v
      ON v.user_id = p.user_id
     AND v.event_type IN ('view', 'click')
     AND v.ts >= p.ts - INTERVAL {RANGE_LOOKBACK_S} SECOND
     AND v.ts <  p.ts
    WHERE p.event_type = 'purchase'
    GROUP BY p.event_id, p.user_id
    """,
    tags=("join", "range", "binned"),
)
def q94_range_join_binned(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range join (purchase ← same-user view/click within the preceding
    30 minutes — clickstream attribution), executed as a BIN-BLOCKED
    equi-join: both sides bucket time into lookback-width bins, each
    purchase probes its own and the previous bin (a 30-min window spans at
    most 2 bins after integer-second truncation), and the time range
    becomes a residual predicate on hash-join candidates.

    This is THE scale pattern for range joins: a plain (user, time-range)
    theta join either nested-loops or joins each user's ENTIRE history;
    binning bounds every probe to two (user, 30-min-bin) buckets no matter
    how many years of events a user has. The oracle is the unbinned range
    join itself, so parity proves the binning is lossless. One precursor
    lives in exactly one bin → no double counting across the two probe
    rows; purchases with no precursors survive via the left join (the two
    probe rows collapse in the final group-by)."""
    ev = t(spark, sf_dir, "events")
    bin_col = F.floor(F.unix_timestamp("ts") / RANGE_LOOKBACK_S)
    p = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.col("ts").alias("p_ts"), bin_col.alias("p_bin")
    )
    probes = p.select(
        "event_id",
        "user_id",
        "p_ts",
        F.explode(F.array(F.col("p_bin"), F.col("p_bin") - 1)).alias("probe_bin"),
    )
    v = ev.filter(F.col("event_type").isin("view", "click")).select(
        F.col("user_id").alias("v_user"),
        F.col("ts").alias("v_ts"),
        F.col("event_type").alias("v_type"),
        bin_col.alias("v_bin"),
    )
    joined = probes.join(
        v,
        (F.col("user_id") == F.col("v_user"))
        & (F.col("probe_bin") == F.col("v_bin"))
        & (F.col("v_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {RANGE_LOOKBACK_S} SECOND"))
        & (F.col("v_ts") < F.col("p_ts")),
        "left",
    )
    return joined.groupBy("event_id", "user_id").agg(
        F.count("v_ts").cast("long").alias("n_precursors"),
        F.coalesce(
            F.sum(F.when(F.col("v_type") == "view", 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("n_views"),
        F.coalesce(
            F.sum(F.when(F.col("v_type") == "click", 1).otherwise(0)), F.lit(0)
        ).cast("long").alias("n_clicks"),
    )


# -- q105: correlated scalar subqueries (decorrelation) ------------------------

# duck_cents generates SQL valid in BOTH dialects, so the shared query
# text stays on the codebase-wide exact-money convention
_Q105_SQL = f"""
SELECT o_orderkey, o_custkey, o_totalprice FROM {{orders}} o1
WHERE {duck_cents("o_totalprice")} *
        (SELECT COUNT(*) FROM {{orders}} o2 WHERE o2.o_custkey = o1.o_custkey)
      > (SELECT SUM({duck_cents("o_totalprice")})
         FROM {{orders}} o3 WHERE o3.o_custkey = o1.o_custkey)
"""


@query(
    "q105_scalar_subquery",
    oracle=_Q105_SQL.format(orders="orders"),
    tags=("join", "subquery", "scalar", "decorrelation"),
)
def q105_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Orders above their customer's average order value, written as two
    CORRELATED SCALAR SUBQUERIES (SQL surface; the oracle runs the very
    same text). Catalyst decorrelates both into per-customer aggregates
    hash-joined back to the fact — one pass over orders per aggregate,
    never a per-row re-scan (plan-pinned: no nested-loop, no cartesian).

    The predicate is the avg comparison cross-multiplied into exact
    integer cents (price*100*count > sum_cents): dividing in doubles
    would make boundary rows engine-dependent at the last ulp, which is
    the difference between a checkable operator and a flaky one."""
    t(spark, sf_dir, "orders").createOrReplaceTempView("nsq2k_q105_orders")
    return spark.sql(_Q105_SQL.format(orders="nsq2k_q105_orders"))


# -- q118: fuzzy (edit-distance) record linkage with blocking ------------------

FUZZY_MAX_DIST = 1  # Levenshtein threshold for a match


@query(
    "q118_fuzzy_match",
    oracle="""
    WITH ks AS (
      SELECT c_custkey, c_name,
             CASE WHEN u.i = 0 THEN c_name
                  ELSE SUBSTR(c_name, 1, u.i - 1) || SUBSTR(c_name, u.i + 1)
             END AS k
      FROM customer, UNNEST(RANGE(0, LEN(c_name) + 1)) AS u(i)
    ),
    cand AS (
      SELECT DISTINCT a.c_custkey AS custkey_a, x.c_custkey AS custkey_b,
             a.c_name AS name_a, x.c_name AS name_b
      FROM ks a JOIN ks x
        ON a.k = x.k AND a.c_custkey < x.c_custkey
    ),
    -- DuckDB's LEVENSHTEIN counts BYTES (levenshtein('e-acute','e')=2),
    -- Spark's counts CODE POINTS — the declared contract for name
    -- linkage (round-9 astral/combining probe). Remap each pair's
    -- combined codepoint alphabet onto single ASCII bytes (<=127
    -- distinct codepoints per name pair — names are short), so byte
    -- distance of the remapped strings IS codepoint distance.
    scored AS (
      SELECT custkey_a, custkey_b, name_a, name_b,
             CASE WHEN LEN(alpha) > 127 THEN CAST(ERROR(
               'q118 oracle domain violation: candidate-pair alphabet '
               || 'exceeds 127 distinct codepoints - the ASCII remap '
               || 'would silently degrade to byte distance') AS INTEGER)
             ELSE
             CAST(LEVENSHTEIN(
               list_aggregate(list_transform(string_split(name_a, ''),
                 c -> chr(list_position(alpha, c))), 'string_agg', ''),
               list_aggregate(list_transform(string_split(name_b, ''),
                 c -> chr(list_position(alpha, c))), 'string_agg', '')
             ) AS INTEGER) END AS dist
      FROM (SELECT *, list_sort(list_distinct(
              string_split(name_a || name_b, ''))) AS alpha
            FROM cand)
    )
    SELECT custkey_a, custkey_b, name_a, name_b, dist
    FROM scored WHERE dist <= 1
    """,
    tags=("join", "fuzzy", "linkage"),
)
def q118_fuzzy_match(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy record linkage: find ALL name pairs within Levenshtein
    distance 1, the data-cleaning join that completes the dedup modality
    set (exact q60, set-overlap q75/q76, bit-signature q77/q78, vector
    q80/q81, chunk q111 — and now character-level edit distance).

    The scale problem is that edit distance admits no hash: a naive
    formulation is an O(n^2) cross join running a dynamic program per
    pair. The round-4 prefix block was LOSSY (an edit inside the prefix
    split true pairs across blocks — 31% of real distance-1 pairs missed
    on this very table); this is the exact replacement: SYMMETRIC-DELETE
    blocking (the SymSpell scheme). Each name emits its identity plus
    every single-character deletion as block keys. Completeness is a
    two-line proof: if t substitutes s at position p, deleting p from
    both yields the same string; if t inserts into / deletes from s, the
    shorter string itself equals a 1-deletion of the longer (or, for
    dist 0, the identity keys match). So every pair at distance <= 1
    shares a key BY CONSTRUCTION — test_q118_blocking_is_lossless proves
    zero missed pairs against the unblocked join on real data.

    Scale shape: the key fanout is x(len+1) on the (short) name column
    only, and a key's block contains essentially just that key's true
    near-matches — no low-entropy giant block exists (the prefix scheme
    collapsed on this table's shared 'Customer#' stem; half-split
    pigeonholing would too). Plan: explode keys -> one hash self-join on
    the key -> Levenshtein verify (kills the rare distance-2 key
    collisions) -> DISTINCT to fold pairs found via several shared keys.

    Distance semantics (round-9 probe fix): the declared contract is
    unit-cost Levenshtein over CODE POINTS — the linguistically right
    unit for names, and what Spark's levenshtein() computes. DuckDB's
    LEVENSHTEIN counts BYTES of the UTF-8 encoding (probed on 1.0.0:
    levenshtein('é','e') = 2, emoji vs 'x' = 4), which silently agreed
    on the ASCII fixtures and diverges the moment an edit touches a
    multibyte character. The oracle therefore remaps each candidate
    pair's combined codepoint alphabet onto single ASCII bytes before
    LEVENSHTEIN — byte distance of the remapped strings equals codepoint
    distance exactly (the map is injective per pair; a name pair has far
    fewer than 127 distinct codepoints). Pinned by the multibyte
    near-pair fixture in tests/test_sketch_gates.py.

    Oracle-domain bound (not an engine bound): the remap needs the
    PAIR's combined alphabet to fit in chr(1..127) — past 127 distinct
    codepoints chr() emits multibyte UTF-8 and the remap degrades to
    byte distance again. The ENGINE computes codepoint distance for any
    input; only the DuckDB verification twin is domain-limited, and a
    within-threshold pair (edit distance <= 1) of >127-distinct-codepoint
    names means two ~128-codepoint-alphabet strings one edit apart —
    outside any name column this linkage targets. The bound is LOUD
    (round-10): the scored CTE raises via DuckDB ERROR() on any pair
    whose alphabet exceeds 127 codepoints, so a domain violation fails
    the parity run instead of silently verifying byte distance."""
    name = F.col("c_name")
    deletions = F.transform(
        F.sequence(F.lit(1), F.greatest(F.length(name), F.lit(1))),
        lambda i: F.concat(
            name.substr(F.lit(1), i - F.lit(1)),
            name.substr(i + F.lit(1), F.length(name) - i),
        ),
    )
    ks = (
        t(spark, sf_dir, "customer")
        .select("c_custkey", "c_name")
        .select(
            "c_custkey",
            "c_name",
            F.explode(F.concat(F.array(name), deletions)).alias("k"),
        )
    )
    a = ks.select(
        F.col("c_custkey").alias("custkey_a"),
        F.col("c_name").alias("name_a"),
        "k",
    )
    b = ks.select(
        F.col("c_custkey").alias("custkey_b"),
        F.col("c_name").alias("name_b"),
        "k",
    )
    # SORT-MERGE pinned: Catalyst's size estimate for an EXPLODE output
    # is its child's size, so it wrongly broadcasts the x(len+1) exploded
    # key side (measured 6.7 s vs 1.7 s SMJ at sf0.1 — the same
    # misestimate q106's salted join hit). At 100 TB a broadcast of the
    # exploded corpus would OOM outright, so the hint is also the only
    # correct-at-scale strategy.
    return (
        a.join(b.hint("merge"), "k")
        .filter(F.col("custkey_a") < F.col("custkey_b"))
        .withColumn(
            "dist", F.levenshtein(F.col("name_a"), F.col("name_b")).cast("int")
        )
        .filter(F.col("dist") <= FUZZY_MAX_DIST)
        .select("custkey_a", "custkey_b", "name_a", "name_b", "dist")
        .distinct()
    )


# -- q122: market-basket co-purchase pairs ------------------------------------

BASKET_TOP_K = 50


@query(
    "q122_copurchase",
    oracle=f"""
    WITH items AS (
      SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ), cx AS (
      SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS c FROM items
      GROUP BY l_partkey
    ), pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b,
             CAST(COUNT(*) AS BIGINT) AS n_orders
      FROM items a JOIN items b
        ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY a.l_partkey, b.l_partkey
    ), no AS (
      SELECT COUNT(DISTINCT l_orderkey) AS n FROM lineitem
    )
    SELECT part_a, part_b, n_orders, x.c AS c_a, y.c AS c_b,
           CAST(n_orders * (SELECT n FROM no) AS DOUBLE) / (x.c * y.c) AS lift
    FROM pairs JOIN cx x ON part_a = x.l_partkey JOIN cx y ON part_b = y.l_partkey
    ORDER BY n_orders DESC, part_a, part_b LIMIT {BASKET_TOP_K}
    """,
    tags=("join", "basket", "cooccurrence"),
)
def q122_copurchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket analysis: the top co-purchased part pairs with their
    association lift — q112's pair-mining shape applied to the FACT table,
    where the scale argument is different: the quadratic fanout is bounded
    by ORDER SIZE (a handful of items), not by a df-capped vocabulary, so
    the order-keyed self-join is linear-ish in line items at any corpus
    size. Shape: distinct (order, part) projection -> order-keyed equi
    self-join -> pair-keyed partial agg -> part-frequency attachment via
    broadcast (|parts|-sized) -> lift as one exact-integer-ratio division
    -> TakeOrderedAndProject top-{BASKET_TOP_K} under a total-order
    tiebreak (count DESC, then both part keys)."""
    li = t(spark, sf_dir, "lineitem")
    items = li.select("l_orderkey", "l_partkey").distinct()
    cx = items.groupBy("l_partkey").agg(F.count("*").cast("long").alias("c"))
    a = items.select("l_orderkey", F.col("l_partkey").alias("part_a"))
    b = items.select("l_orderkey", F.col("l_partkey").alias("part_b"))
    pairs = (
        a.join(b, "l_orderkey")
        .filter(F.col("part_a") < F.col("part_b"))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").cast("long").alias("n_orders"))
    )
    no = li.agg(F.countDistinct("l_orderkey").alias("n"))
    return (
        pairs.join(
            F.broadcast(cx.withColumnRenamed("l_partkey", "part_a")), "part_a"
        )
        .withColumnRenamed("c", "c_a")
        .join(
            F.broadcast(
                cx.withColumnRenamed("l_partkey", "part_b").withColumnRenamed(
                    "c", "c_b"
                )
            ),
            "part_b",
        )
        .crossJoin(F.broadcast(no))
        .select(
            "part_a",
            "part_b",
            "n_orders",
            "c_a",
            "c_b",
            (
                (F.col("n_orders") * F.col("n")).cast("double")
                / (F.col("c_a") * F.col("c_b"))
            ).alias("lift"),
        )
        .orderBy(F.col("n_orders").desc(), "part_a", "part_b")
        .limit(BASKET_TOP_K)
    )


# -- q127: audience-overlap Jaccard between event types ------------------------


@query(
    "q127_audience_overlap",
    oracle="""
    WITH ut AS (
      SELECT DISTINCT user_id, event_type FROM events
    ), sizes AS (
      SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM ut GROUP BY event_type
    ), inter AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             CAST(COUNT(*) AS BIGINT) AS n_common
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY a.event_type, b.event_type
    )
    SELECT type_a, type_b, sa.n AS n_a, sb.n AS n_b, n_common,
           CAST(n_common AS DOUBLE) / (sa.n + sb.n - n_common) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.event_type = type_a
    JOIN sizes sb ON sb.event_type = type_b
    """,
    tags=("join", "overlap", "events"),
)
def q127_audience_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise audience overlap between event types: Jaccard of the
    distinct-user sets of every type pair — the audience-similarity
    matrix (q75's set-overlap pattern applied to behavioral segments
    instead of shingles). Counts are exact integers; the one division is
    correctly rounded, so jaccard is bit-identical across engines.

    Scale shape: the quadratic is over EVENT TYPES, not users — the
    distinct (user, type) projection joins itself on user_id, so per-user
    fanout is (#types that user touches)^2, bounded by the type
    vocabulary squared regardless of user count; the |types|-row size
    table attaches by broadcast. One user-keyed shuffle for the distinct,
    one for the self-join's pair agg."""
    e = t(spark, sf_dir, "events")
    ut = e.select("user_id", "event_type").distinct()
    sizes = ut.groupBy("event_type").agg(F.count("*").cast("long").alias("n"))
    a = ut.select("user_id", F.col("event_type").alias("type_a"))
    b = ut.select("user_id", F.col("event_type").alias("type_b"))
    inter = (
        a.join(b, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    sa = sizes.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .select(
            "type_a",
            "type_b",
            "n_a",
            "n_b",
            "n_common",
            (
                F.col("n_common").cast("double")
                / (F.col("n_a") + F.col("n_b") - F.col("n_common"))
            ).alias("jaccard"),
        )
    )
