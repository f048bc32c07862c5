"""Scalar-function batteries: string / date-time / math / conditional /
JSON / array (higher-order) / hash.

Reference seeds: body-length checks (kinesis_writer.go:167), FNV hashing
(deduper.go:26-29), key fallback conditional (aggregator.go:128-130), the
partition-key dictionary (aggregator.go:161-170 → array ops), opaque JSON-ish
payload parsed on demand (proto/aggregation.proto:20 → from_json).

All built-in ``pyspark.sql.functions`` — JVM-side, whole-stage-codegen'd;
no Python in any hot path. Each battery is a pure narrow projection: zero
shuffles, scan-bound at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..registry import query
from ..tables import table as t


@query(
    "q40_string_battery",
    oracle="""
    SELECT p_partkey,
           CAST(LENGTH(p_name) AS INTEGER) AS name_len,
           -- LOUD oracle-domain guard (round-10 probe, the q118 ERROR()
           -- pattern): Java's UPPER applies Unicode SpecialCasing
           -- (eszett -> 'SS', ligature fi -> 'FI', multi-codepoint);
           -- DuckDB's utf8proc UPPER is the simple 1:1 map. The engine's
           -- declared semantics ARE Java full casing; a name containing
           -- any unconditional-SpecialCasing character is out of THIS
           -- VERIFIER's domain and must fail the parity run rather than
           -- silently verify the simple map. Class = SpecialCasing.txt
           -- unconditional uppercase expansions.
           CASE WHEN regexp_matches(p_name,
                  '[\\x{00DF}\\x{0149}\\x{01F0}\\x{0390}\\x{03B0}\\x{0587}\\x{1E96}-\\x{1E9A}\\x{1F50}\\x{1F52}\\x{1F54}\\x{1F56}\\x{1F80}-\\x{1FAF}\\x{1FB2}-\\x{1FB7}\\x{1FBC}\\x{1FC2}-\\x{1FC7}\\x{1FCC}\\x{1FD2}\\x{1FD3}\\x{1FD6}\\x{1FD7}\\x{1FE2}-\\x{1FE4}\\x{1FE6}\\x{1FE7}\\x{1FF2}-\\x{1FF7}\\x{1FFC}\\x{FB00}-\\x{FB06}\\x{FB13}-\\x{FB17}]')
                THEN CAST(ERROR('q40 oracle domain violation: p_name '
                  || 'contains a SpecialCasing uppercase expansion - '
                  || 'DuckDB simple UPPER diverges from Java full casing')
                  AS VARCHAR)
                ELSE UPPER(p_name) END AS name_upper,
           CASE WHEN p_brand LIKE '%' || CHR(304) || '%'
                THEN CAST(ERROR('q40 oracle domain violation: p_brand '
                  || 'contains dotted-I U+0130 - LOWER diverges')
                  AS VARCHAR)
                ELSE LOWER(p_brand) END AS brand_lower,
           SUBSTR(p_name, 1, 5) AS name_head,
           -- '||' not CONCAT() (round-11 extended probe): DuckDB's
           -- CONCAT() SKIPS NULL arguments (Postgres-style) while
           -- Spark's propagates NULL — a NULL name would TRIM to ''
           -- here and to NULL on Spark. '||' null-propagates on BOTH
           -- engines, matching F.concat; declared: NULL metadata =>
           -- NULL composite.
           TRIM('  ' || p_name || '  ') AS name_trimmed,
           p_brand || ':' || p_type AS brand_type,
           REGEXP_EXTRACT(p_brand, '([0-9]+)', 1) AS brand_num,
           REGEXP_REPLACE(p_name, '[aeiou]', '_', 'g') AS name_devoweled,
           CAST(p_name LIKE '%red%' AS BOOLEAN) AS is_red,
           CAST(STRPOS(p_name, ' ') AS INTEGER) AS space_pos
    FROM part
    """,
    tags=("scalar", "string"),
)
def q40_string_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String battery (seed: body-length predicate kinesis_writer.go:167).

    Case-mapping contract (round-10 Unicode probe): the engine computes
    JAVA FULL CASING — UPPER('ß') = 'SS', UPPER('ﬁ') = 'FI' (Unicode
    SpecialCasing, multi-codepoint) — while DuckDB's utf8proc applies
    the simple 1:1 map ('ẞ', 'ﬁ'). Rather than silently narrowing the
    engine's semantics, the ORACLE carries a loud domain guard: a name
    containing any unconditional-SpecialCasing character raises via
    ERROR(), so a fixture outside the verifier's domain fails the parity
    run instead of verifying the wrong map (the q118 pattern). Probed
    identical on both engines: É/ǅ titlecase, Σ/ς final sigma, ı, and
    every position/length/pad/trim/split function at multibyte inputs."""
    p = t(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.length("p_name").cast("int").alias("name_len"),
        F.upper("p_name").alias("name_upper"),
        F.lower("p_brand").alias("brand_lower"),
        F.substring("p_name", 1, 5).alias("name_head"),
        F.trim(F.concat(F.lit("  "), F.col("p_name"), F.lit("  "))).alias("name_trimmed"),
        # F.concat (NULL-propagating, mirrors the oracle's '||'), NOT
        # concat_ws (which SKIPS NULLs and would silently emit ':type'
        # vs the oracle under NULL metadata — round-11 extended probe)
        F.concat(F.col("p_brand"), F.lit(":"), F.col("p_type")).alias("brand_type"),
        F.regexp_extract("p_brand", r"([0-9]+)", 1).alias("brand_num"),
        F.regexp_replace("p_name", "[aeiou]", "_").alias("name_devoweled"),
        F.col("p_name").like("%red%").alias("is_red"),
        F.instr(F.col("p_name"), " ").cast("int").alias("space_pos"),
    )


@query(
    "q41_date_battery",
    oracle="""
    SELECT o_orderkey,
           CAST(YEAR(o_orderdate) AS INTEGER) AS order_year,
           CAST(MONTH(o_orderdate) AS INTEGER) AS order_month,
           CAST(DAY(o_orderdate) AS INTEGER) AS order_day,
           CAST(DAYOFWEEK(o_orderdate) + 1 AS INTEGER) AS order_dow,
           CAST(DATE_TRUNC('month', o_orderdate) AS TIMESTAMP) AS order_month_start,
           CAST(FLOOR(EPOCH(o_orderdate)) AS BIGINT) AS order_epoch,
           CAST(o_orderdate AS DATE) + 30 AS due_date,
           CAST(DATE_DIFF('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INTEGER) AS days_to_2002
    FROM orders
    """,
    tags=("scalar", "datetime"),
)
def q41_date_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time battery (seed: 120 s generation bucketing, main.go:113).

    Session TZ is pinned UTC so extraction matches DuckDB's naive-UTC read
    of the same parquet timestamps. DuckDB's DAYOFWEEK is 0-based from
    Sunday; Spark's is 1-based — the oracle compensates.
    """
    o = t(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("int").alias("order_year"),
        F.month("o_orderdate").cast("int").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("int").alias("order_day"),
        F.dayofweek("o_orderdate").cast("int").alias("order_dow"),
        F.date_trunc("month", "o_orderdate").alias("order_month_start"),
        F.unix_timestamp("o_orderdate").cast("long").alias("order_epoch"),
        F.date_add(F.col("o_orderdate").cast("date"), 30).alias("due_date"),
        F.datediff(F.lit("2002-01-01").cast("date"), F.col("o_orderdate").cast("date"))
        .cast("int")
        .alias("days_to_2002"),
    )


@query(
    "q42_math_battery",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           -- LOUD oracle-domain guard (round-11 extended probe, the q118
           -- ERROR() pattern): ROUND(double, n) is decimal-string HALF_UP
           -- on Spark (BigDecimal.valueOf of the shortest repr) but binary
           -- x*10^n half-away on DuckDB; for >2-decimal inputs the twins
           -- split on 0.46% of values (exhaustive 3-decimal sweep:
           -- 4,588/1,000,000 — e.g. 1.005 -> 1.01 vs 1.0). The 2-decimal
           -- money contract makes the column deterministic (305k-value
           -- sweep: exhaustive over [-1000, 1000] plus a 97-cent-stride
           -- sample to 200k dollars, zero mismatches), so a
           -- price with a sub-cent component is out of THIS VERIFIER's
           -- domain and must fail the parity run, not silently verify one
           -- engine's rounding personality.
           -- '+ 0.0' zero-sign normalization (same probe): DuckDB's binary
           -- ROUND preserves IEEE -0.0 for prices in (-0.05, 0) while
           -- Spark's BigDecimal path has no negative zero; x + 0.0 maps
           -- -0.0 -> 0.0 on both engines and is the identity elsewhere.
           CASE WHEN ABS(l_extendedprice * 100 - ROUND(l_extendedprice * 100)) > 1e-4
                THEN CAST(ERROR('q42 oracle domain violation: '
                  || 'l_extendedprice has a sub-cent component - '
                  || 'ROUND(double, n) diverges across engines past '
                  || 'the 2-decimal money contract') AS DOUBLE)
                ELSE ROUND(l_extendedprice, 1) + 0.0 END AS price_r1,
           ABS(l_discount - 0.05) AS disc_dev,
           CAST(FLOOR(l_extendedprice) AS BIGINT) AS price_floor,
           CAST(CEIL(l_extendedprice) AS BIGINT) AS price_ceil,
           POWER(l_quantity, 2) AS qty_sq,
           CASE WHEN l_extendedprice > -1
                THEN ROUND(LN(l_extendedprice + 1), 6) END AS price_ln,
           CASE WHEN l_quantity >= 0 THEN SQRT(l_quantity) END AS qty_sqrt,
           CAST(l_orderkey % 7 AS BIGINT) AS key_mod7
    FROM lineitem
    """,
    tags=("scalar", "math"),
)
def q42_math_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math battery (seed: size arithmetic, aggregator.go:140-177).
    Single-operation doubles are bit-identical across engines — no rounding
    needed except the explicit ROUND under test.

    Domain guards (round-7 probe): the engines disagree on out-of-domain
    math — DuckDB RAISES on SQRT(negative) / LN(non-positive) while Spark
    returns NaN / NULL, so a single garbage row (a planted negative
    quantity) aborted the oracle. Both twins now declare NULL for
    out-of-domain inputs via the identical CASE guard.

    Rounding contract (round-11 extended probe): ROUND(double, n) is only
    cross-engine deterministic inside the 2-decimal money contract —
    Spark rounds the shortest decimal repr HALF_UP (BigDecimal.valueOf)
    while DuckDB rounds x*10^n in binary, and 3-decimal inputs split the
    twins on 0.46% of values (1.005 -> 1.01 vs 1.0). The oracle guards
    the contract LOUDLY (sub-cent price => parity run fails), and both
    twins normalize the IEEE zero sign of the rounded output (+ 0.0:
    DuckDB preserves -0.0 for prices in (-0.05, 0), Spark's decimal path
    has no negative zero). price_ln's ROUND(·, 6) is the declared
    cross-library ulp idiom, not a money round: LN outputs are
    full-precision doubles whose shortest repr never terminates at the
    7th digit, so the decimal-vs-binary split has no purchase there."""
    li = t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        # + 0.0 mirrors the oracle's zero-sign normalization (a no-op here:
        # Spark's BigDecimal round never yields -0.0) so the twins' spelled
        # semantics stay symmetric; the 2-decimal domain guard lives on the
        # oracle side per the q118/q40 LOUD-verifier convention.
        (F.round("l_extendedprice", 1) + F.lit(0.0)).alias("price_r1"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.floor("l_extendedprice").cast("long").alias("price_floor"),
        F.ceil("l_extendedprice").cast("long").alias("price_ceil"),
        F.pow("l_quantity", 2).alias("qty_sq"),
        # ln differs in the last ulp across math libraries → round(6)
        F.when(
            F.col("l_extendedprice") > -1,
            F.round(F.log(F.col("l_extendedprice") + 1), 6),
        ).alias("price_ln"),
        F.when(F.col("l_quantity") >= 0, F.sqrt("l_quantity")).alias("qty_sqrt"),
        (F.col("l_orderkey") % 7).cast("long").alias("key_mod7"),
    )


@query(
    "q43_conditional_battery",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal >= 7500 THEN 'platinum'
                WHEN c_acctbal >= 5000 THEN 'gold'
                WHEN c_acctbal >= 2500 THEN 'silver'
                ELSE 'bronze' END AS tier,
           COALESCE(NULLIF(c_mktsegment, 'HOUSEHOLD'), 'OTHER') AS segment_or_other,
           CAST(c_acctbal > 5000 AS BOOLEAN) AS is_high,
           IF(c_nationkey % 2 = 0, 'even', 'odd') AS nation_parity
    FROM customer
    """,
    tags=("scalar", "conditional"),
)
def q43_conditional_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional battery (seed: partition-key fallback aggregator.go:128-130)."""
    c = t(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.when(F.col("c_acctbal") >= 7500, "platinum")
        .when(F.col("c_acctbal") >= 5000, "gold")
        .when(F.col("c_acctbal") >= 2500, "silver")
        .otherwise("bronze")
        .alias("tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("HOUSEHOLD")), F.lit("OTHER")).alias(
            "segment_or_other"
        ),
        (F.col("c_acctbal") > 5000).alias("is_high"),
        F.when(F.col("c_nationkey") % 2 == 0, "even").otherwise("odd").alias("nation_parity"),
    )


# Round-9 nesting contract for the JSON battery: payloads with more than
# this many STRUCTURAL open brackets (string literals stripped first) are
# out of the parse contract — every JSON column is NULL on both twins.
# Why a bracket COUNT and not a depth: Spark's Jackson parser hard-fails
# at nesting depth 1001 (probed: depth 1000 parses, 1001 returns NULL in
# PERMISSIVE mode) while DuckDB's yyjson parses kilodeep payloads happily
# — a silent twin split on adversarial input. True depth needs a stateful
# scan, but opens >= depth always, so capping OPENS at Jackson's depth
# limit guarantees every in-contract payload parses identically (depth <=
# opens <= 1000), at the price of also NULLing wide-but-flat payloads
# with >1000 containers — declared, tested, and far outside any sane
# event-props shape.
JSON_MAX_OPENS = 1000


# Explicit whitespace classes for regexes that run on DATA (round-11
# vertical-tab probe): Java's \s is [ \t\n\x0B\f\r] while RE2's is
# [ \t\n\f\r] — the \x0B delta silently split q72's dedup fingerprint
# and the trailing-comma detector. Never use \s in an oracle-twinned
# pattern; spell the class out. JAVA_WS is the full Java set (the
# engine's declared whitespace-normalization semantics); JSON_WS is the
# JSON grammar's inter-token set (matches the strict-tail scan).
JAVA_WS_CLASS = "[ \\t\\n\\x0B\\f\\r]"
JSON_WS_CLASS = "[ \\t\\n\\r]"


def strict_digit_int_sql(expr: str) -> str:
    """Cross-engine STRICT integer parse of a string expression (shared
    SQL, both engines).

    Round-11 extended probe: TRY_CAST(VARCHAR AS INTEGER) has a
    different GRAMMAR per engine — DuckDB leniently parses '1.5' -> 2,
    '1e2' -> 100, '0x1F' -> 31, '9.99' -> 10 where Spark-ANSI yields
    NULL — so a bare TRY_CAST twin is a silent split on any non-digit
    tail. This guard admits only ^[0-9]+$-shaped strings, on which the
    engines agree exactly (including overflow -> NULL), then TRY_CASTs.

    The guard is spelled with TRANSLATE (delete the digits; empty
    remainder == digits-only) rather than an anchored regex, for two
    probed reasons: (a) Java's '$' matches before a trailing line
    terminator while RE2's does not, so '^[0-9]+$' itself twin-splits
    on '7\\n' (Spark extracts '7', DuckDB rejects); (b) TRANSLATE needs
    no backslashes, so the one string literal parses identically under
    both engines' escaping rules. TRANSLATE deletion semantics are
    probed identical across engines (incl. Unicode digits, which stay
    and therefore fail the guard).

    Caller contract (r11 ADVICE): ``expr`` is interpolated THREE times
    into the generated SQL with no common-subexpression guarantee —
    pass only cheap, deterministic expressions (column refs, SUBSTR of
    a column). An expensive or non-deterministic argument would be
    evaluated up to three times, and a volatile one could disagree with
    itself between the guard and the cast."""
    return (
        f"CASE WHEN TRANSLATE({expr}, '0123456789', '') = '' "
        f"AND {expr} <> '' THEN TRY_CAST({expr} AS INTEGER) END"
    )


def json_structural_opens(col):
    """Count of structural '{'/'[' in a JSON payload: string literals are
    stripped first (same regex as the DuckDB oracles), so brackets inside
    values don't count. NULL input → NULL. Shared by q44's parse guard
    and q123's events_props_parse_contract rule."""
    stripped = F.regexp_replace(col, r'"([^"\\]|\\.)*"', '""')
    return F.length(stripped) - F.length(F.translate(stripped, "{[", ""))


def json_strict_tail(col):
    """TRUE iff the payload's structural scan finds exactly one balanced
    container and nothing but JSON whitespace after it — the round-11
    trailing-garbage contract (leniency probe): Jackson parses the FIRST
    value and ignores trailing content ('{"k":1}{"k":2}', '{"k":1}<SOH>',
    '{"k":1}}', '{"k":1},{"j":2}' all parse), while yyjson rejects the
    whole payload — a silent twin split in every JSON column. Trailing
    garbage is lexically undetectable by regex (comma-joined objects are
    locally legal at every adjacency), so this is a real depth scan: over
    the string-stripped payload, track depth, flag depth<0, record the
    first balanced close, and flag ANY non-whitespace character after it.
    One O(len) whole-stage-codegen higher-order aggregate per row; the
    DuckDB oracles run the IDENTICAL algorithm via list_reduce (shared
    SQL in DUCK_JSON_STRICT_TAIL). NULL input → NULL.

    The strip here is the TWO-STEP canonical form (remove backslash
    escape pairs first, then strip plain-quoted spans): the one-regex
    strip `"([^"\\\\]|\\\\.)*"` is ambiguous on pathological unbalanced
    quote/backslash garbage and Java-regex vs RE2 resolve it differently
    (found by the equivalence fuzz — 1/425 random strings split). After
    escape-pair removal, `"[^"]*"` is a deterministic leftmost scan on
    both engines. Valid payloads strip identically under both forms."""
    stripped = F.regexp_replace(
        F.regexp_replace(col, r"\\.", ""), '"[^"]*"', '""'
    )
    chars = F.split(stripped, "")

    def step(acc, c):
        delta = (
            F.when(c.isin("{", "["), 1).when(c.isin("}", "]"), -1).otherwise(0)
        )
        d2 = acc["d"] + delta
        return F.struct(
            d2.alias("d"),
            (acc["closed"] | ((d2 == 0) & c.isin("}", "]"))).alias("closed"),
            (
                acc["bad"]
                | (d2 < 0)
                | (acc["closed"] & ~c.isin(" ", "\t", "\n", "\r", ""))
            ).alias("bad"),
        )

    init = F.struct(
        F.lit(0).alias("d"),
        F.lit(False).alias("closed"),
        F.lit(False).alias("bad"),
    )
    return F.aggregate(
        chars, init, step, lambda acc: ~(acc["bad"] | (acc["d"] != 0))
    )


# The DuckDB twin of json_strict_tail, as a SQL expression template over a
# string-stripped payload column named by `{s}`: the same depth scan via a
# list comprehension + list_reduce. The scan state is packed into ONE
# BIGINT — bad*1e11 + closed*1e10 + (depth + 1e9) — because DuckDB 1.0's
# list_reduce MISBINDS STRUCT accumulators across 3+ elements (probed:
# each iteration alone computes correctly, the chained fold swaps field
# values; scalar accumulators chain correctly). Each char maps to
# (delta+1) + 4*nonws: '{{'/'[' -> 6, '}}'/']' -> 4, JSON whitespace -> 1,
# anything else -> 5. Strict iff the fold ends with bad=0 and depth=0.
# Kept beside the Spark form so the two cannot drift independently.
DUCK_JSON_STRICT_TAIL = """
((list_reduce(
  [CAST(1000000000 AS BIGINT)] ||
  [CAST(CASE WHEN c IN ('{{','[') THEN 6 WHEN c IN ('}}',']') THEN 4
             WHEN c IN (' ', CHR(9), CHR(10), CHR(13), '') THEN 1
             ELSE 5 END AS BIGINT)
   FOR c IN string_split({s}, '')],
  (acc, e) ->
    CASE WHEN acc // 100000000000 = 1
              OR acc % 10000000000 - 1000000000 + e % 4 - 1 < 0
              OR ((acc // 10000000000) % 10 = 1 AND e // 4 = 1)
         THEN 100000000000 ELSE 0 END
    + CASE WHEN (acc // 10000000000) % 10 = 1
                OR (acc % 10000000000 - 1000000000 + e % 4 - 1 = 0
                    AND e % 4 = 0)
           THEN 10000000000 ELSE 0 END
    + acc % 10000000000 + e % 4 - 1
)) IN (1000000000, 11000000000))
""".replace("\n", " ")


def json_trailing_comma(col):
    """TRUE iff the string-stripped payload carries a comma directly
    before a closing bracket — legal to yyjson (DuckDB accepts
    '{"k":1,}') but rejected by Jackson: the reverse-direction half of
    the round-11 leniency split. A comma never directly precedes a
    closer in spec-valid JSON, so the detector has zero false positives.
    Same two-step canonical strip as json_strict_tail; oracle twin uses
    the identical explicit JSON_WS_CLASS (never \\s — Java's \\s
    includes \\x0B, RE2's does not; round-11 vertical-tab probe)."""
    stripped = F.regexp_replace(
        F.regexp_replace(col, r"\\.", ""), '"[^"]*"', '""'
    )
    return stripped.rlike("," + JSON_WS_CLASS + r"*[}\]]")


# pre-formatted oracle fragments for q44's contract CTE (the f-string
# below must not re-scan their braces); stripped2 is the two-step
# canonical strip the round-11 grammar detectors run on (see
# json_strict_tail's docstring for why the one-regex strip is ambiguous)
_STRICT_TAIL_ON_STRIPPED = DUCK_JSON_STRICT_TAIL.format(s="stripped2")


@query(
    "q44_json_battery",
    oracle=f"""
    WITH guarded AS (
      SELECT *, regexp_replace(props, '"([^"\\\\]|\\\\.)*"', '""', 'g') AS stripped,
             regexp_replace(regexp_replace(props, '\\\\.', '', 'g'),
                            '"[^"]*"', '""', 'g') AS stripped2
      FROM events
    ),
    typed AS (
      -- CASE, not AND: DuckDB does not short-circuit, so json_type must
      -- never see a payload json_valid rejected. `shallow` is the
      -- round-9 nesting contract: more than {JSON_MAX_OPENS} STRUCTURAL
      -- open brackets (string literals stripped first, so brackets
      -- inside values don't count) puts the payload out of the parse
      -- contract — NULL everywhere on both twins (see the builder
      -- docstring; NULL props gives NULL shallow gives NULL columns).
      SELECT *,
             LENGTH(stripped)
               - LENGTH(REPLACE(REPLACE(stripped, '{{', ''), '[', ''))
               <= {JSON_MAX_OPENS} AS shallow,
             CASE WHEN json_valid(props) THEN json_type(props) = 'OBJECT'
                  ELSE FALSE END AS is_obj
      FROM guarded
    ),
    contract AS (
      -- round-10 duplicate-key pin: a payload with duplicate TOP-LEVEL
      -- keys is OUT of the parse contract (NULL everywhere on both
      -- twins). Without it, Spark's struct parse is last-wins ({{"k":1,
      -- "k":2}} -> 2) while yyjson's json_extract is first-wins (-> 1)
      -- — a silent twin split. Non-objects get NULL here, which the 3VL
      -- AND below propagates as NULL output, mirroring Spark's when().
      -- round-10 surrogate pin: payloads carrying an ESCAPED UTF-16
      -- surrogate (backslash-uD800 .. backslash-uDFFF) are also out of
      -- contract: Jackson tolerates a LONE surrogate (map parse yields
      -- keys) while yyjson rejects the whole payload as invalid. The
      -- detector is lexical (any uD8xx-uDFxx-shaped escape, even behind
      -- an escaped backslash), so escaped-but-valid PAIRS are
      -- conservatively excluded too; literal UTF-8 stays in contract.
      -- round-11 NUL pin: payloads carrying an escaped NUL
      -- (backslash-u0000) are out of contract too — a key decoding to
      -- an embedded U+0000 hits DuckDB's sort-key truncation (ORDER
      -- BY/LIST_SORT treat 'k'||chr(0) as TIED with 'k' while its own
      -- =/< are byte-exact; Spark sorts byte-exactly everywhere), so
      -- prop_keys' sorted join is engine-dependent. Lexical and
      -- conservative like the surrogate detector: an escaped NUL in a
      -- VALUE is excluded too; raw NUL is already invalid JSON on both.
      -- round-11 leniency pins (the grammar probe): (a) TRAILING
      -- GARBAGE — Jackson parses the first value and ignores the rest
      -- ('{{"k":1}}{{"k":2}}', a control byte, an extra brace, a
      -- comma-joined second object) while yyjson rejects the payload;
      -- detection needs a real depth scan (comma-joined forms are
      -- locally legal at every adjacency), run here by the list_reduce
      -- twin of the engine's json_strict_tail; (b) TRAILING COMMA
      -- before a closer — yyjson ACCEPTS '{{"k":1,}}' where Jackson
      -- rejects, the reverse direction; a comma never directly
      -- precedes a closer in spec JSON, so the regex has no false
      -- positives. (Single-quoted strings — Jackson's third leniency —
      -- are killed at the ROOT instead: the engine parses with
      -- allowSingleQuotes=false, so both parsers reject.)
      SELECT *,
             shallow
             AND NOT regexp_matches(props, '\\\\u[dD][89a-fA-F]')
             AND NOT regexp_matches(props, '\\\\u0000')
             AND {_STRICT_TAIL_ON_STRIPPED}
             AND NOT regexp_matches(stripped2, ',[ \\t\\n\\r]*[}}\\]]')
             AND CASE WHEN is_obj THEN
               LEN(json_keys(props)) = LEN(list_distinct(json_keys(props)))
             END AS in_contract
      FROM typed
    )
    SELECT event_id,
           -- the k-type guard mirrors Spark's typed struct field EXACTLY:
           -- from_json(IntegerType) accepts only raw integer JSON tokens
           -- (NULL for 12.5 / "12" / true / 1e2), while a bare TRY_CAST of
           -- the extracted STRING would round fractionals (12.5 -> 13) and
           -- parse quoted numbers — so only BIGINT/UBIGINT-typed values
           -- reach the cast (overflow past INT32 is NULL on both engines)
           CASE WHEN in_contract THEN
           TRY_CAST(CASE WHEN is_obj
                    AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
                    THEN JSON_EXTRACT_STRING(props, '$.k') END AS INTEGER)
           END AS prop_k,
           CASE WHEN in_contract THEN
           TRY_CAST(CASE WHEN is_obj
                    AND json_type(props, '$.k') IN ('BIGINT', 'UBIGINT')
                    THEN JSON_EXTRACT_STRING(props, '$.k') END AS INTEGER) % 10
           END AS prop_k_mod,
           CASE WHEN in_contract AND json_valid(props)
                THEN CAST(JSON_EXTRACT_STRING(props, '$.missing') AS VARCHAR)
           END AS prop_missing,
           CASE WHEN in_contract AND is_obj
                THEN COALESCE(ARRAY_TO_STRING(LIST_SORT(json_keys(props)), ','), '')
           END AS prop_keys,
           CASE WHEN in_contract AND is_obj
                THEN CAST(LEN(json_keys(props)) AS INTEGER) END AS n_props
    FROM contract
    """,
    tags=("scalar", "json", "map"),
)
def q44_json_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON/map battery over the events.props payload (seed: opaque bytes
    parsed on demand, proto/aggregation.proto:20). Uses from_json with both
    a StructType (schema'd parse, codegen) and a MapType (open schema →
    map_keys/map_values), plus get_json_object (path probe).

    Garbage-payload pins (round 6, from the planted-JSON probe — a crawl
    corpus WILL contain all of these):
    - malformed JSON: Spark's PERMISSIVE from_json/get_json_object
      degrade to NULL; DuckDB's json functions RAISE — the oracle now
      guards every column on json_valid;
    - valid-but-not-an-object ('[1,2,3]'): Spark's map/struct parse is
      NULL; the oracle's json_type(props)='OBJECT' test mirrors it;
    - non-numeric '$.k': Spark's typed struct field degrades to NULL;
      the oracle uses TRY_CAST;
    - empty object '{}': keys join to '' in Spark vs NULL via DuckDB's
      empty ARRAY_TO_STRING (the q73 class) — COALESCE pins '';
    - NULL props propagates NULL everywhere on both twins.

    Round-9 deep-nesting pin (the recursion-limit probe): payloads with
    more than JSON_MAX_OPENS structural open brackets are OUT of the
    parse contract — every JSON column NULL, identically on both twins.
    Without the guard, a 1001-deep payload is NULL on Spark (Jackson's
    nesting cap) but parses in DuckDB. Structural = after stripping
    string literals with the same regex on both engines, so brackets
    INSIDE values ('{"s":"[[[["}') stay in contract.

    Round-10 duplicate-key pin (the same silent-twin-split shape): for
    '{"k":1,"k":2}' Spark's struct from_json is LAST-wins (Jackson
    streaming parse -> 2) while DuckDB's json_extract is FIRST-wins
    (yyjson -> 1) — and Spark's own surface is internally split, since
    get_json_object returns 1. Payloads with duplicate TOP-level keys
    are therefore OUT of the parse contract: every JSON column NULL,
    identically on both twins (detector: from_json(map) preserves
    duplicate keys, so |keys| vs |distinct keys|; oracle: json_keys vs
    list_distinct). Surfaced to operators as q123's
    events_props_dupkeys rule.

    Round-11 NUL-escape pin (the control-char probe): a key carrying an
    escaped NUL ('{"k\\u0000":1,"k":7}') decodes to an embedded U+0000,
    and DuckDB's SORT path truncates sort keys at NUL — ORDER BY /
    LIST_SORT / RANK treat 'k'||chr(0) as TIED with 'k' (probed: equal
    RANK) even though its own =/< compare byte-exactly; Spark sorts
    byte-exactly everywhere. prop_keys' sorted join therefore read
    'k,k<NUL>' on Spark vs 'k<NUL>,k' on DuckDB. Payloads containing a
    \\u0000 escape are OUT of the parse contract on both twins — same
    lexical, conservative detector shape as the surrogate pin (a NUL
    escape in a value is excluded too; raw NUL is invalid JSON on both
    engines, probed). Every other control-char escape (u0001-u001F) and
    raw control byte probed identical. Surfaced as q123's
    events_props_nul_escapes rule.

    Round-11 grammar-leniency pins (the parser-flags probe — three
    different grammars in play: Jackson, yyjson, and Spark 4's variant
    parser, probed pairwise-inconsistent):
    - SINGLE QUOTES: Spark's from_json default enables Jackson's
      allowSingleQuotes, so '{{'k':1}}' parsed on Spark and not DuckDB.
      Killed at the ROOT: every props parse here and in q123 passes
      allowSingleQuotes=false — both engines now reject, no contract
      entry needed.
    - TRAILING GARBAGE: Jackson parses the FIRST value and ignores the
      rest ('{{"k":1}}{{"k":2}}', '{{"k":1}}<SOH>', '{{"k":1}}}}',
      comma-joined objects) while yyjson rejects the whole payload.
      Out of contract via json_strict_tail — a real depth scan (O(len)
      higher-order aggregate; regex cannot detect comma-joined forms),
      with the identical list_reduce algorithm in the oracle.
    - TRAILING COMMA: the REVERSE split — yyjson accepts '{{"k":1,}}'
      where Jackson rejects. Out of contract via json_trailing_comma
      (a comma never directly precedes a closer in spec JSON).
    Probed clean and pinned: BOM / NBSP prefixes, comments, unquoted
    names, bare scalars, array roots, whitespace padding (both engines
    agree on all)."""
    ev = t(spark, sf_dir, "events")
    strict_opts = {"allowSingleQuotes": "false"}
    parsed = F.from_json(
        "props",
        T.StructType([T.StructField("k", T.IntegerType())]),
        strict_opts,
    )
    as_map = F.from_json("props", "map<string,string>", strict_opts)
    shallow = json_structural_opens(F.col("props")) <= JSON_MAX_OPENS
    # round-10 duplicate-key pin: from_json(map) preserves duplicate
    # top-level keys, so equality with the deduplicated key list IS the
    # detector; NULL (unparseable / non-object) propagates NULL through
    # the AND into every column, same as before. round-10 surrogate pin:
    # escaped-surrogate payloads are excluded lexically (Jackson accepts
    # a lone \uD800 where yyjson rejects the payload — see the oracle).
    # round-11 NUL pin: escaped-NUL payloads are excluded lexically (an
    # embedded NUL in a key makes the sorted key join engine-dependent —
    # DuckDB's sort truncates at NUL; see the docstring). round-11
    # grammar pins: strict-tail depth scan + trailing-comma regex (see
    # the docstring).
    keys = F.map_keys(as_map)
    no_surrogate = ~F.col("props").rlike(r"\\u[dD][89a-fA-F]")
    no_nul_escape = ~F.col("props").rlike(r"\\u0000")
    in_contract = (
        shallow & no_surrogate & no_nul_escape
        & json_strict_tail(F.col("props"))
        & ~json_trailing_comma(F.col("props"))
        & (F.size(keys) == F.size(F.array_distinct(keys)))
    )
    return ev.select(
        "event_id",
        F.when(in_contract, parsed.getField("k")).alias("prop_k"),
        F.when(in_contract, parsed.getField("k") % 10).alias("prop_k_mod"),
        F.when(
            in_contract, F.get_json_object("props", "$.missing")
        ).alias("prop_missing"),
        F.when(
            in_contract, F.array_join(F.array_sort(keys), ",")
        ).alias("prop_keys"),
        F.when(in_contract, F.size(F.map_values(as_map)).cast("int")).alias(
            "n_props"
        ),
    )


@query(
    "q45_array_battery",
    oracle="""
    SELECT doc_id,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS INTEGER) AS n_tokens,
           CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS INTEGER) AS n_distinct_tokens,
           LIST_CONTAINS(STRING_SPLIT(text, ' '), 'spark') AS has_spark,
           CAST(COALESCE(LIST_POSITION(STRING_SPLIT(text, ' '), 'spark'), 0) AS BIGINT) AS spark_pos,
           STRING_SPLIT(text, ' ')[1] AS first_token,
           -- round-11 NUL guard on the SORT-VALUED column only: DuckDB's
           -- sort-key encoding truncates at an embedded U+0000 (a
           -- NUL-bearing token TIES with its prefix in LIST_SORT) while
           -- Spark's sort_array is byte-exact — so U+0000-bearing text
           -- is out of the vocabulary-sort contract (NULL on both
           -- twins); every other column is equality/count-based and
           -- probed identical on NUL-bearing text
           CASE WHEN NOT CONTAINS(text, chr(0))
                THEN ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(STRING_SPLIT(SUBSTR(text, 1, 40), ' '))), ',')
           END AS head_vocab
    FROM documents
    """,
    tags=("scalar", "array"),
)
def q45_array_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array battery (seed: partition-key dictionary, aggregator.go:161-170).
    size/distinct/contains/position/index/sort — all higher-order built-ins.

    Round-11 NUL pin (the control-char probe): head_vocab is the battery's
    one SORT-VALUED output, and DuckDB's ORDER BY/LIST_SORT sort-key
    encoding truncates strings at an embedded U+0000 ('ab'||chr(0) TIES
    with 'ab'; its own =/< compare byte-exactly) while Spark's sort_array
    is byte-exact — a silent twin split for NUL-bearing tokens. Declared
    contract: text containing U+0000 (binary contamination in a crawl
    corpus, never legitimate prose) gets NULL head_vocab on BOTH twins;
    the equality/count-based columns stay live and probed identical."""
    d = t(spark, sf_dir, "documents")
    words = F.split("text", " ")
    nul_free = ~F.contains(F.col("text"), F.expr("chr(0)"))
    return d.select(
        "doc_id",
        F.size(words).cast("int").alias("n_tokens"),
        F.size(F.array_distinct(words)).cast("int").alias("n_distinct_tokens"),
        F.array_contains(words, "spark").alias("has_spark"),
        F.array_position(words, "spark").cast("long").alias("spark_pos"),
        F.element_at(words, 1).alias("first_token"),
        F.when(
            nul_free,
            F.array_join(
                F.sort_array(F.array_distinct(F.split(F.substring("text", 1, 40), " "))), ","
            ),
        ).alias("head_vocab"),
    )


@query(
    "q46_hash_battery",
    oracle="""
    SELECT doc_id,
           MD5(text) AS text_md5,
           SHA256(text) AS text_sha256,
           -- '||' not CONCAT() (round-11 extended probe): DuckDB CONCAT
           -- skips NULLs (':42' for a NULL source) while the Spark side's
           -- old concat_ws skipped the separator too ('42') — md5s
           -- silently diverged under NULL source. Both twins now
           -- null-propagate: NULL source => NULL composite_md5, declared.
           MD5(source || ':' || CAST(doc_id AS VARCHAR)) AS composite_md5
    FROM documents
    """,
    tags=("scalar", "hash"),
)
def q46_hash_battery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hash battery (seed: FNV-64a dedup/partition hashing deduper.go:26-29,
    MD5 trailer aggregator.go:54-56). md5/sha2 are engine-portable; for
    Spark-internal keys we use xxhash64 (q60 dedup) which is faster but has
    no DuckDB twin.

    NULL contract (round-11 extended probe): composite_md5 is
    NULL-propagating on BOTH twins (F.concat here, '||' in the oracle) —
    the old concat_ws/CONCAT pairing silently split under a NULL source
    (concat_ws drops the separator with the NULL -> md5('42'); DuckDB's
    CONCAT keeps it -> md5(':42'))."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.md5("text").alias("text_md5"),
        F.sha2("text", 256).alias("text_sha256"),
        F.md5(
            F.concat(F.col("source"), F.lit(":"), F.col("doc_id").cast("string"))
        ).alias("composite_md5"),
    )
