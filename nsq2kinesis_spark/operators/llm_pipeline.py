"""Training-corpus pipeline operators: deterministic splits, sequence
packing, repetition metrics, and a composite quality gate.

These are the batch stages a pretraining-data pipeline runs after dedup /
decontamination (llm_dedup.py) and per-doc stats (llm_text.py):

- q85 train/val/test split: a pure function of document identity (salted
  md5 bucket), so re-runs and backfills land every doc in the same split
  with zero coordination — and zero shuffle.
- q86 sequence packing: assign docs to fixed token-budget training
  sequences by ordered cumulative token count within a bounded shard.
- q87 repetition metrics: duplicate-word / duplicate-n-gram fractions and
  top-word share — the C4/RefinedWeb-style boilerplate signals.
- q88 quality gate: a Gopher-style rule battery emitting per-rule flags
  plus the final verdict, thresholds in exact integer arithmetic.

Scale notes: q85/q87/q88 are shuffle-free narrow scans (linear,
partition-local, whole-stage codegen — pinned in tests/test_plans.py).
q86's only shuffle is its window, partitioned by (source, shard) where the
shard key bounds partition size by construction — no global sort.

North-star (BASELINE.json): the reference forwards opaque payloads
(main.go handler loop); this module is part of the corpus-preparation
surface the mandate adds on top of that transport core.

Portability: every hash that an oracle must reproduce uses the md5 idiom
(first N hex chars → BIGINT) shared with q77/q84 — DuckDB has no xxhash64.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table as t
from .llm_text import _expand_dotted_i, STOPWORDS, _count_in
from .scalars import strict_digit_int_sql

# -- q85: deterministic split ------------------------------------------------

SPLIT_SALT = "split-v1:"  # version the salt: bump → fresh re-split
SPLIT_BUCKETS = 100
SPLIT_VAL_LO, SPLIT_TEST_LO = 90, 95  # train <90, val 90-94, test 95-99


def _bucket(salt: str, col: F.Column, buckets: int) -> F.Column:
    """Salted md5 bucket in [0, buckets) — engine-portable (see q84)."""
    h = F.conv(F.substring(F.md5(F.concat(F.lit(salt), col.cast("string"))), 1, 8), 16, 10)
    return h.cast("long") % buckets


def _duck_bucket(salt: str, expr: str, buckets: int) -> str:
    return (
        f"CAST(CONCAT('0x', SUBSTR(MD5(CONCAT('{salt}', CAST({expr} AS VARCHAR))), 1, 8))"
        f" AS BIGINT) % {buckets}"
    )


@query(
    "q85_train_split",
    oracle=f"""
    WITH b AS (
      SELECT doc_id, source, {_duck_bucket(SPLIT_SALT, "doc_id", SPLIT_BUCKETS)} AS bucket
      FROM documents WHERE doc_id IS NOT NULL
    )
    SELECT doc_id, source, CAST(bucket AS INTEGER) AS bucket,
           CASE WHEN bucket < {SPLIT_VAL_LO} THEN 'train'
                WHEN bucket < {SPLIT_TEST_LO} THEN 'val'
                ELSE 'test' END AS split
    FROM b
    """,
    tags=("llm", "pipeline"),
)
def q85_train_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split (90/5/5) by salted hash bucket of
    doc_id. The split is a pure narrow projection — no shuffle, no state:
    any worker, any re-run, any backfill assigns the same doc to the same
    split, which is the property distributed corpus builds actually need
    (a random() split is neither reproducible nor backfill-stable).

    Declared id contract (round-7 probe): NULL doc_id rows are excluded —
    a doc without an id cannot be STABLY split (the whole point of the
    operator), and the engines in fact disagreed on its bucket: Spark's
    CONCAT(salt, NULL) is NULL (→ 'test' via the CASE fallthrough, NULL
    bucket) while DuckDB's CONCAT ignores NULL and hashed the bare salt
    (→ bucket 63, 'train')."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id").isNotNull())
    b = _bucket(SPLIT_SALT, F.col("doc_id"), SPLIT_BUCKETS)
    return d.select(
        "doc_id",
        "source",
        b.cast("int").alias("bucket"),
        F.when(b < SPLIT_VAL_LO, "train")
        .when(b < SPLIT_TEST_LO, "val")
        .otherwise("test")
        .alias("split"),
    )


# -- q86: sequence packing ---------------------------------------------------

PACK_BUDGET = 256  # tokens per training sequence
# Shard count is DERIVED from corpus size: shards = ceil(n_docs / TARGET),
# so each (source, shard) window partition holds O(TARGET) docs at ANY
# corpus size. A fixed shard count would make window-partition SIZE grow
# linearly with the corpus — the round-3 scale defect this replaces.
PACK_TARGET_DOCS_PER_SHARD = 125


def pack_shard_count(n_docs: int, target: int = PACK_TARGET_DOCS_PER_SHARD) -> int:
    """ceil(n_docs / target), min 1 — the data-derived packing shard count."""
    return max(1, -(-n_docs // target))


@query(
    "q86_sequence_packing",
    oracle=f"""
    WITH ns AS (
      SELECT GREATEST(1, CAST(CEIL(COUNT(*) / {PACK_TARGET_DOCS_PER_SHARD}.0) AS BIGINT))
             AS shards
      FROM documents
    ), d AS (
      SELECT doc_id, source,
             CAST(doc_id % (SELECT shards FROM ns) AS INTEGER) AS shard,
             CAST(LEN(STRING_SPLIT(text, ' ')) AS INTEGER) AS n_tokens
      FROM documents
    ), c AS (
      SELECT *, CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source, shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS cum_before
      FROM d
    )
    SELECT doc_id, source, shard, n_tokens,
           CAST(cum_before // {PACK_BUDGET} AS BIGINT) AS seq_id,
           CAST(cum_before % {PACK_BUDGET} AS BIGINT) AS seq_offset
    FROM c
    """,
    tags=("llm", "pipeline"),
)
def q86_sequence_packing(
    spark: SparkSession, sf_dir: str, shards: int | None = None
) -> DataFrame:
    """Pack documents into fixed token-budget training sequences: within
    each (source, shard), documents in doc_id order fill sequences by
    cumulative token count; a doc starting at running offset c belongs to
    sequence c // BUDGET at offset c % BUDGET (contiguous fill — docs may
    straddle a boundary, exactly like token-level packing does).

    100 TB shape: the shard count scales with the corpus
    (ceil(n_docs / PACK_TARGET_DOCS_PER_SHARD), overridable via
    ``shards``), so each window partition sorts O(TARGET) docs regardless
    of corpus size and there is NO global sort/cumsum (the classic packing
    scale-trap). Shards are independent packing domains, so the shard
    count changes layout, never correctness. The sizing count() is a
    metadata-cheap scalar job (parquet row counts), the same documented
    driver-side-scalar exception as q89's convergence probe — no data
    rows move to the driver. All arithmetic is exact integers →
    bit-identical to the oracle, which derives the identical shard count
    from COUNT(*)."""
    d0 = t(spark, sf_dir, "documents")
    if shards is None:
        shards = pack_shard_count(d0.count())
    d = d0.select(
        "doc_id",
        "source",
        (F.col("doc_id") % shards).cast("int").alias("shard"),
        F.size(F.split("text", " ")).cast("int").alias("n_tokens"),
    )
    w = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w), F.lit(0)).cast("long")
    return d.select(
        "doc_id",
        "source",
        "shard",
        "n_tokens",
        F.floor(cum / PACK_BUDGET).cast("long").alias("seq_id"),
        (cum % PACK_BUDGET).cast("long").alias("seq_offset"),
    )


# -- q87: repetition metrics -------------------------------------------------

REP_N = 3  # n-gram length for the duplicate-gram signal

# all-grams (NOT distinct — duplicates are the signal here, unlike the
# dedup shingles in llm_dedup.py)
_REP_GRAMS = f"""
  CASE WHEN size(words) >= {REP_N} THEN
    transform(sequence(0, size(words) - {REP_N}),
      i -> concat_ws(' ', {", ".join(f"words[i+{k}]" for k in range(REP_N))}))
  ELSE CAST(array() AS ARRAY<STRING>) END
"""

# top word share via higher-order functions: O(distinct × n) per doc —
# right for page-sized docs (stays codegen, zero shuffle); for book-length
# docs switch to array_sort + run-length scan (same narrow shape).
_TOP_COUNT = "array_max(transform(array_distinct(words), x -> size(filter(words, y -> y = x))))"
_DUCK_TOP_COUNT = (
    "LIST_MAX(LIST_TRANSFORM(LIST_DISTINCT(words), x -> LEN(LIST_FILTER(words, y -> y = x))))"
)


@query(
    "q87_repetition",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS words FROM documents
    ), g AS (
      SELECT doc_id, words,
             CASE WHEN LEN(words) >= {REP_N} THEN
               LIST_TRANSFORM(GENERATE_SERIES(1, LEN(words) - {REP_N - 1}),
                 i -> LIST_AGGREGATE(words[i:i+{REP_N - 1}], 'string_agg', ' '))
             ELSE [] END AS grams
      FROM w
    )
    SELECT doc_id,
           CAST(LEN(words) AS INTEGER) AS n_tokens,
           CAST(LEN(LIST_DISTINCT(words)) AS INTEGER) AS n_distinct,
           (LEN(words) - LEN(LIST_DISTINCT(words))) * 1.0 / LEN(words) AS dup_word_frac,
           CASE WHEN LEN(grams) > 0 THEN
             (LEN(grams) - LEN(LIST_DISTINCT(grams))) * 1.0 / LEN(grams) END AS dup_gram_frac,
           {_DUCK_TOP_COUNT} * 1.0 / LEN(words) AS top_word_share
    FROM g
    """,
    tags=("llm", "pipeline"),
)
def q87_repetition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Intra-document repetition metrics: duplicate-word fraction,
    duplicate {REP_N}-gram fraction, and top-word share — the standard
    boilerplate/degenerate-text signals (C4's repeated-line filter,
    RefinedWeb's duplicate-n-gram thresholds) as one shuffle-free scan.
    Everything is list arithmetic on the words array inside codegen; the
    only doubles are final divisions of exact ints."""
    d = t(spark, sf_dir, "documents").select("doc_id", F.split("text", " ").alias("words"))
    g = d.withColumn("grams", F.expr(_REP_GRAMS))
    n, nd = F.size("words"), F.size(F.array_distinct("words"))
    ng, ngd = F.size("grams"), F.size(F.array_distinct("grams"))
    top = F.expr(_TOP_COUNT)
    return g.select(
        "doc_id",
        n.cast("int").alias("n_tokens"),
        nd.cast("int").alias("n_distinct"),
        ((n - nd) * F.lit(1.0) / n).alias("dup_word_frac"),
        F.when(ng > 0, (ng - ngd) * F.lit(1.0) / ng).alias("dup_gram_frac"),
        (top * F.lit(1.0) / n).alias("top_word_share"),
    )


# -- q88: composite quality gate ---------------------------------------------

QF_MIN_TOKENS, QF_MAX_TOKENS = 20, 1000
QF_MIN_MWL, QF_MAX_MWL = 3.0, 5.0  # mean word length band
QF_MIN_STOPWORDS = 1  # at least one English stopword
QF_REP_MULT = 10  # top_count * 10 <= n  ⇔  top-word share ≤ 0.1
QF_TTR_NUM, QF_TTR_DEN = 2, 5  # distinct*5 >= n*2  ⇔  type-token ratio ≥ 0.4

_DUCK_STOP = (
    "LEN(LIST_FILTER(words, w -> LIST_CONTAINS(["
    + ", ".join(f"'{w}'" for w in STOPWORDS["en"])
    + "], w)))"
)


def quality_flags(words_col: str = "words") -> dict:
    """The five Gopher-style rule columns + their conjunction, as named
    Spark Columns over a words array — the ONE definition both q88 (per-
    rule flags) and q97's corpus-build gate consume, so the composed and
    standalone operators cannot diverge."""
    w = F.col(words_col)
    n, nd = F.size(w), F.size(F.array_distinct(w))
    sumlen = F.aggregate(F.transform(w, lambda x: F.length(x)), F.lit(0), lambda a, x: a + x)
    stop = _count_in(w, STOPWORDS["en"])
    top = F.expr(_TOP_COUNT.replace("words", words_col))
    mwl = sumlen * F.lit(1.0) / n
    flags = {
        "n": n,
        "ok_len": (n >= QF_MIN_TOKENS) & (n <= QF_MAX_TOKENS),
        "ok_word_len": (mwl >= QF_MIN_MWL) & (mwl <= QF_MAX_MWL),
        "ok_stopword": stop >= QF_MIN_STOPWORDS,
        "ok_repetition": top * QF_REP_MULT <= n,
        "ok_ttr": nd * QF_TTR_DEN >= n * QF_TTR_NUM,
    }
    flags["passes"] = (
        flags["ok_len"]
        & flags["ok_word_len"]
        & flags["ok_stopword"]
        & flags["ok_repetition"]
        & flags["ok_ttr"]
    )
    return flags


@query(
    "q88_quality_gate",
    oracle=f"""
    WITH w AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS words FROM documents
    ), m AS (
      SELECT doc_id,
             LEN(words) AS n,
             LEN(LIST_DISTINCT(words)) AS nd,
             LIST_SUM(LIST_TRANSFORM(words, x -> LENGTH(x))) AS sumlen,
             {_DUCK_STOP} AS stop,
             {_DUCK_TOP_COUNT} AS top
      FROM w
    )
    SELECT doc_id,
           CAST(n BETWEEN {QF_MIN_TOKENS} AND {QF_MAX_TOKENS} AS INTEGER) AS ok_len,
           CAST(sumlen * 1.0 / n BETWEEN {QF_MIN_MWL} AND {QF_MAX_MWL} AS INTEGER)
             AS ok_word_len,
           CAST(stop >= {QF_MIN_STOPWORDS} AS INTEGER) AS ok_stopword,
           CAST(top * {QF_REP_MULT} <= n AS INTEGER) AS ok_repetition,
           CAST(nd * {QF_TTR_DEN} >= n * {QF_TTR_NUM} AS INTEGER) AS ok_ttr,
           CAST((n BETWEEN {QF_MIN_TOKENS} AND {QF_MAX_TOKENS})
            AND (sumlen * 1.0 / n BETWEEN {QF_MIN_MWL} AND {QF_MAX_MWL})
            AND stop >= {QF_MIN_STOPWORDS}
            AND top * {QF_REP_MULT} <= n
            AND nd * {QF_TTR_DEN} >= n * {QF_TTR_NUM} AS INTEGER) AS passes
    FROM m
    """,
    tags=("llm", "pipeline"),
)
def q88_quality_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style quality-rule battery: token-count band, mean-word-length
    band, minimum stopword presence, top-word-share cap, type-token-ratio
    floor — per-rule flags plus the conjunction, for audit-friendly
    filtering (keep the flags, filter on `passes`, and you can later ask
    "which rule rejected how much per source" without a recompute).

    Thresholds are integer (or exact-ratio) comparisons so the verdicts are
    bit-identical across engines. Flags are INT 0/1, shuffle-free scan."""
    d = t(spark, sf_dir, "documents").select("doc_id", F.split("text", " ").alias("words"))
    q = quality_flags()
    return d.select(
        "doc_id",
        q["ok_len"].cast("int").alias("ok_len"),
        q["ok_word_len"].cast("int").alias("ok_word_len"),
        q["ok_stopword"].cast("int").alias("ok_stopword"),
        q["ok_repetition"].cast("int").alias("ok_repetition"),
        q["ok_ttr"].cast("int").alias("ok_ttr"),
        q["passes"].cast("int").alias("passes"),
    )


# -- q97: the whole corpus build as ONE plan ----------------------------------

_Q97_QUAL_SQL = f"""
      n BETWEEN {QF_MIN_TOKENS} AND {QF_MAX_TOKENS}
      AND sumlen * 1.0 / n BETWEEN {QF_MIN_MWL} AND {QF_MAX_MWL}
      AND stop >= {QF_MIN_STOPWORDS}
      AND top * {QF_REP_MULT} <= n
      AND nd * {QF_TTR_DEN} >= n * {QF_TTR_NUM}
"""


def _q97_oracle() -> str:
    from .llm_dedup import DECON_BENCH_STEP, DECON_N

    return f"""
    WITH w0 AS (
      SELECT doc_id, source, text, STRING_SPLIT(text, ' ') AS words FROM documents
    ), q AS (
      SELECT doc_id, source, text, words,
             LEN(words) AS n,
             LEN(LIST_DISTINCT(words)) AS nd,
             LIST_SUM(LIST_TRANSFORM(words, x -> LENGTH(x))) AS sumlen,
             {_DUCK_STOP} AS stop,
             {_DUCK_TOP_COUNT} AS top
      FROM w0
    ), qual AS (
      SELECT doc_id, source, text, CAST(n AS INTEGER) AS n_tokens FROM q
      WHERE doc_id % {DECON_BENCH_STEP} <> 0 AND ({_Q97_QUAL_SQL})
    ), grams AS (
      SELECT doc_id, UNNEST(CASE WHEN LEN(words) >= {DECON_N} THEN
          LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(words) - {DECON_N - 1}),
            i -> LIST_AGGREGATE(words[i:i+{DECON_N - 1}], 'string_agg', ' ')))
          ELSE [] END) AS g
      FROM w0
    ), bench AS (
      SELECT DISTINCT g FROM grams WHERE doc_id % {DECON_BENCH_STEP} = 0
    ), contaminated AS (
      SELECT DISTINCT doc_id FROM grams
      WHERE doc_id % {DECON_BENCH_STEP} <> 0 AND g IN (SELECT g FROM bench)
    ), clean AS (
      SELECT * FROM qual WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
    ), canon AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY MD5(LOWER(TRIM(REGEXP_REPLACE(
          REGEXP_REPLACE(text, CHR(304), 'i' || CHR(775), 'g'),
          '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))))
        ORDER BY doc_id) AS rn
      FROM clean
    ), ns AS (
      SELECT GREATEST(1, CAST(CEIL(COUNT(*) / {PACK_TARGET_DOCS_PER_SHARD}.0) AS BIGINT))
             AS shards
      FROM documents
    ), kept AS (
      SELECT doc_id, source, n_tokens,
             CAST(doc_id % (SELECT shards FROM ns) AS INTEGER) AS shard,
             {_duck_bucket(SPLIT_SALT, "doc_id", SPLIT_BUCKETS)} AS bucket
      FROM canon WHERE rn = 1
    ), c AS (
      SELECT *, CAST(COALESCE(SUM(n_tokens) OVER (
               PARTITION BY source, shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
             AS cum_before
      FROM kept
    )
    SELECT doc_id, source,
           CASE WHEN bucket < {SPLIT_VAL_LO} THEN 'train'
                WHEN bucket < {SPLIT_TEST_LO} THEN 'val'
                ELSE 'test' END AS split,
           shard, n_tokens,
           CAST(cum_before // {PACK_BUDGET} AS BIGINT) AS seq_id,
           CAST(cum_before % {PACK_BUDGET} AS BIGINT) AS seq_offset
    FROM c
    """


@query("q97_corpus_build", oracle=_q97_oracle(), tags=("llm", "pipeline", "composition"))
def q97_corpus_build(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE training-corpus build as one declarative plan — the
    composition proof that the pipeline operators stack: Gopher-style
    quality gate (q88) → benchmark decontamination (q83, any contaminated
    gram disqualifies) → exact-dedup canonical selection (q72 fingerprint,
    keep lowest doc_id) → deterministic train/val/test split (q85) →
    token-budget sequence packing (q86) over the surviving corpus.

    Plan shape at 100 TB: one corpus scan computes quality + fingerprint;
    decontamination stays a broadcast gram semi-join feeding a distinct
    doc-id set that anti-joins back (contaminated sets are benchmark-sized
    — tiny); canonical selection is one fingerprint-keyed window; packing
    is the (source, shard)-bounded window with the corpus-derived shard
    count. Catalyst fuses the narrow stages into the scan; total shuffles:
    contamination count, fingerprint window, packing window. Every stage
    is exact integer/hash arithmetic, so the five-stage composition still
    hash-matches its single SQL oracle."""
    from .llm_dedup import _SPARK_NGRAMS, DECON_BENCH_STEP

    d0 = t(spark, sf_dir, "documents")
    shards = pack_shard_count(d0.count())
    d = d0.select("doc_id", "source", "text", F.split("text", " ").alias("words"))

    q = quality_flags()
    qual = d.filter((F.col("doc_id") % DECON_BENCH_STEP != 0) & q["passes"]).select(
        "doc_id", "source", "text", q["n"].cast("int").alias("n_tokens")
    )

    # the SAME gram expression q83 uses — shared so the composed
    # decontamination stage can never diverge from the standalone operator
    grams = d.select("doc_id", F.explode(F.expr(_SPARK_NGRAMS)).alias("g_str")).select(
        "doc_id", F.xxhash64("g_str").alias("g")
    )
    bench = grams.filter(F.col("doc_id") % DECON_BENCH_STEP == 0).select("g").distinct()
    contaminated = (
        grams.filter(F.col("doc_id") % DECON_BENCH_STEP != 0)
        .join(F.broadcast(bench), "g")
        .select("doc_id")
        .distinct()
    )
    clean = qual.join(contaminated, "doc_id", "left_anti")

    # canonical-dedup key: dotted-I expanded explicitly on both twins
    # (round-10 pin, see llm_text._expand_dotted_i) — a fingerprint used
    # as a dedup PARTITION key must not be engine-dependent
    fp = F.md5(
        F.lower(F.trim(F.regexp_replace(_expand_dotted_i("text"), "[ \\t\\n\\x0B\\f\\r]+", " ")))
    )
    w_fp = Window.partitionBy("fp").orderBy("doc_id")
    kept = (
        clean.withColumn("fp", fp)
        .withColumn("rn", F.row_number().over(w_fp))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "source",
            "n_tokens",
            (F.col("doc_id") % shards).cast("int").alias("shard"),
            _bucket(SPLIT_SALT, F.col("doc_id"), SPLIT_BUCKETS).alias("bucket"),
        )
    )
    w_pack = (
        Window.partitionBy("source", "shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = F.coalesce(F.sum("n_tokens").over(w_pack), F.lit(0)).cast("long")
    return kept.select(
        "doc_id",
        "source",
        F.when(F.col("bucket") < SPLIT_VAL_LO, "train")
        .when(F.col("bucket") < SPLIT_TEST_LO, "val")
        .otherwise("test")
        .alias("split"),
        "shard",
        "n_tokens",
        F.floor(cum / PACK_BUDGET).cast("long").alias("seq_id"),
        (cum % PACK_BUDGET).cast("long").alias("seq_offset"),
    )


# -- q99: per-source document cap --------------------------------------------

# Corpus-mix curation: cap how many documents any one source contributes
# (the "domain cap" every web-scale corpus build applies so a single crawl
# host can't dominate the training mix — C4/RefinedWeb-style). Keep the
# best SOURCE_CAP docs per source, "best" = longest (n_chars), doc_id
# tie-break for determinism.
SOURCE_CAP = 10


@query(
    "q99_source_cap",
    oracle=f"""
    SELECT doc_id, source, n_chars, CAST(rk AS BIGINT) AS rk FROM (
      SELECT doc_id, source, n_chars,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY n_chars DESC, doc_id) AS rk
      FROM documents
    ) WHERE rk <= {SOURCE_CAP}
    """,
    tags=("llm", "pipeline", "curation"),
)
def q99_source_cap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source contribution cap: rank docs within each source and keep
    the top SOURCE_CAP. The rank-filter idiom compiles to WindowGroupLimit
    (pinned in test_plans.py): each shuffle partition retains only its
    per-source top-K candidates BEFORE the window sort, so the operator
    moves O(sources * cap) rows, not the corpus — the property that makes
    a domain cap runnable as a cheap pass over 100 TB. No other shuffle:
    one hash exchange on source."""
    d = t(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy(F.col("n_chars").desc(), "doc_id")
    return (
        d.select("doc_id", "source", "n_chars")
        .withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= SOURCE_CAP)
    )


# -- q102: incremental dedup against a corpus snapshot -------------------------

# The daily-ingest shape: a new batch of documents must be deduplicated
# (a) against everything already in the corpus and (b) within itself —
# without ever rewriting the existing corpus. Snapshot vs batch is split
# on the source index here (a real pipeline splits on ingest date).
SNAPSHOT_MAX_SRC = 14  # src0..src14 = corpus so far; src15+ = new batch


@query(
    "q102_incremental_dedup",
    oracle=f"""
    WITH fps AS (
      SELECT doc_id, source,
             {strict_digit_int_sql("SUBSTR(source, 4)")} AS src_idx,
             MD5(ARRAY_TO_STRING(LIST_SORT(LIST_DISTINCT(STRING_SPLIT(text, ' '))),
                 '|')) AS fp
      FROM documents WHERE doc_id IS NOT NULL
    ), snap AS (
      SELECT DISTINCT fp FROM fps WHERE src_idx <= {SNAPSHOT_MAX_SRC}
    ), batch AS (
      SELECT * FROM fps WHERE src_idx > {SNAPSHOT_MAX_SRC}
    ), fresh AS (
      SELECT b.* FROM batch b LEFT JOIN snap s USING (fp)
      WHERE s.fp IS NULL
    )
    SELECT doc_id, source, fp FROM (
      SELECT doc_id, source, fp,
             ROW_NUMBER() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      FROM fresh
    ) WHERE rn = 1
    """,
    tags=("llm", "pipeline", "dedup", "incremental"),
)
def q102_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: admit only batch documents whose fingerprint
    appears neither in the corpus snapshot nor earlier in the batch
    (min-doc_id canonical within the batch). The fingerprint is the
    BAG-OF-WORDS form — md5 of the sorted distinct token set — which
    collapses word-reorder/repetition edits that byte-exact
    fingerprints (q97's whitespace-collapse md5) treat as distinct;
    pick the key per corpus policy, the plan is identical.

    Scale shape: both the anti-join and the within-batch canonical pick
    key on the SAME column (fp), so the batch is shuffled once and the
    exchange is reused across the two steps; the snapshot side ships only
    its distinct fingerprints (map-side distinct before the shuffle), not
    document text. Nothing rewrites the snapshot — the admitted set is
    pure-append, which is what makes the op runnable per-ingest-batch
    against a 100 TB corpus.

    Round-7 probe pins: src_idx is a guarded TRY_CAST (a source id
    without the numeric suffix made the bare ANSI cast of '' abort the
    pass; such rows get NULL src_idx and fall outside BOTH the snapshot
    and the batch — outside the declared split universe — identically on
    both twins), and NULL doc_id rows are excluded (the canonical-pick
    tiebreak orders by doc_id, whose NULL placement is engine-dependent).

    Round-11 extended probe: the bare TRY_CAST twin was itself a silent
    split — DuckDB's lenient grammar parses 'src1.5' -> 2 / 'src0x1F'
    -> 31 where Spark yields NULL, silently placing the document inside
    the snapshot on one engine and outside the split universe on the
    other. Both twins now share strict_digit_int_sql (digits-only tails
    parse; everything else is NULL on BOTH engines)."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id").isNotNull())
    # no length cap: the oracle's SUBSTR(source, 4) reads to end-of-string,
    # so a capped substring here would let an 11+-digit suffix parse on
    # one twin and overflow-to-NULL on the other
    src_idx = F.expr(strict_digit_int_sql("substring(source, 4)"))
    fp = F.md5(F.array_join(F.array_sort(F.array_distinct(F.split("text", " "))), "|"))
    fps = d.select("doc_id", "source", src_idx.alias("src_idx"), fp.alias("fp"))
    snap = (
        fps.filter(F.col("src_idx") <= SNAPSHOT_MAX_SRC).select("fp").distinct()
    )
    batch = fps.filter(F.col("src_idx") > SNAPSHOT_MAX_SRC)
    fresh = batch.join(snap, "fp", "left_anti")
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        fresh.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "source", "fp")
    )


# -- q113: length-bucketed batching economics ---------------------------------

# Power-of-two sequence-length buckets for padded batch assembly. The CASE
# ladder is exact integer comparison in both engines (a log2/bit-trick
# derivation would drag transcendentals or engine-specific intrinsics into
# the oracle contract for zero gain — the ladder is fixed and tiny).
PAD_BUCKETS = (16, 32, 64, 128, 256, 512)


def _bucket_case_sql() -> str:
    arms = " ".join(
        f"WHEN n_tokens <= {b} THEN {b}" for b in PAD_BUCKETS[:-1]
    )
    return f"CASE {arms} ELSE {PAD_BUCKETS[-1]} END"


@query(
    "q113_length_buckets",
    oracle=f"""
    WITH sized AS (
      SELECT source, CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n_tokens
      FROM documents
    ), bucketed AS (
      SELECT source, n_tokens, CAST({_bucket_case_sql()} AS BIGINT) AS bucket,
             LEAST(n_tokens, CAST({_bucket_case_sql()} AS BIGINT)) AS fit_tokens
      FROM sized
    )
    SELECT source, bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(fit_tokens) AS BIGINT) AS fit_tokens,
           CAST(SUM(n_tokens - fit_tokens) AS BIGINT) AS trunc_tokens,
           CAST(bucket * COUNT(*) AS BIGINT) AS padded_tokens,
           CAST(bucket * COUNT(*) - SUM(fit_tokens) AS BIGINT) AS waste_tokens,
           CAST(bucket * COUNT(*) - SUM(fit_tokens) AS DOUBLE)
             / (bucket * COUNT(*)) AS waste_frac
    FROM bucketed GROUP BY source, bucket
    """,
    tags=("llm", "pipeline", "batching"),
)
def q113_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padded-batch economics for training/inference: assign every document
    to a power-of-two sequence-length bucket and report, per (source,
    bucket), how many pad tokens the bucketing wastes — the number that
    decides bucket boundaries on a real corpus. Documents longer than the
    top bucket are TRUNCATED to it (the standard max-sequence-length rule):
    waste counts pad slots only (bucket - fit length, always >= 0) and the
    tokens lost to truncation are reported separately as trunc_tokens —
    without the split, over-length docs would contribute NEGATIVE waste and
    silently cancel real padding in the same group. One codegen'd
    projection (token count + CASE ladder) and one keyed aggregation; group
    count is |sources| x |buckets| regardless of corpus size, and
    waste_frac is a single division of exact BIGINTs, so the whole result
    is bit-exact at any scale."""
    d = t(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " ")).cast("long")
    bucket = F.lit(PAD_BUCKETS[-1]).cast("long")
    for b in reversed(PAD_BUCKETS[:-1]):
        bucket = F.when(n_tokens <= b, F.lit(b).cast("long")).otherwise(bucket)
    sized = d.select(
        "source",
        n_tokens.alias("n_tokens"),
        bucket.alias("bucket"),
        F.least(n_tokens, bucket).alias("fit_tokens"),
    )
    return sized.groupBy("source", "bucket").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("fit_tokens").cast("long").alias("fit_tokens"),
        F.sum(F.col("n_tokens") - F.col("fit_tokens"))
        .cast("long")
        .alias("trunc_tokens"),
        (F.col("bucket") * F.count("*")).cast("long").alias("padded_tokens"),
        (F.col("bucket") * F.count("*") - F.sum("fit_tokens"))
        .cast("long")
        .alias("waste_tokens"),
        (
            (F.col("bucket") * F.count("*") - F.sum("fit_tokens")).cast("double")
            / (F.col("bucket") * F.count("*"))
        ).alias("waste_frac"),
    )


# -- q115: weighted dataset-mixture sampling ----------------------------------

# Mixture weight per source, derived deterministically from the source name
# (sources are "srcN"): weight = N % 3 + 1 in {1,2,3}. Integer weights keep
# every quota computation exact.
MIX_WEIGHT_MOD = 3


@query(
    "q115_dataset_mixture",
    oracle=f"""
    WITH w AS (
      SELECT source,
             COALESCE(TRY_CAST(REGEXP_EXTRACT(source, '[0-9]+') AS BIGINT), 0)
               % {MIX_WEIGHT_MOD} + 1 AS w,
             CAST(COUNT(*) AS BIGINT) AS avail
      FROM documents WHERE doc_id IS NOT NULL GROUP BY source
    ), t AS (
      SELECT MIN(avail // w) AS t FROM w
    ), q AS (
      SELECT source, w * (SELECT t FROM t) AS quota FROM w
    ), ranked AS (
      SELECT doc_id, source,
             ROW_NUMBER() OVER (PARTITION BY source
                                ORDER BY MD5(CAST(doc_id AS VARCHAR)), doc_id)
               AS rk
      FROM documents WHERE doc_id IS NOT NULL
    )
    SELECT r.doc_id, r.source, CAST(r.rk AS BIGINT) AS rk
    FROM ranked r JOIN q USING (source) WHERE r.rk <= q.quota
    """,
    tags=("llm", "pipeline", "mixture"),
)
def q115_dataset_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pile-style dataset mixture assembly: given integer mixture weights
    per source, select the LARGEST corpus that realizes the exact weight
    ratios within each source's availability — T = min(avail_i / w_i)
    mixture units, quota_i = w_i * T documents — and draw each source's
    quota as a deterministic uniform sample-without-replacement (rank by
    md5(doc_id): a fixed random permutation both engines reproduce).
    Everything before the draw is exact integer arithmetic on a
    |sources|-row aggregate.

    Shape: source-keyed count agg (tiny) -> one-row min scalar, both
    broadcast back -> per-source hash-rank window -> filter rk <= quota.
    The window partitions by source, so a giant source concentrates on one
    task; q124 is that giant-source path, executable: the exact rank is
    replaced with a hash-threshold filter (keep if md5 < quota/avail
    scaled into hash space — map-side, no window) at the cost of
    ±binomial jitter around the quota. The exact-rank form is kept here
    because quotas are part of the declared semantics and the oracle
    must reproduce them.

    Round-7 probe pins (shared with q124): the weight key is
    TRY_CAST + COALESCE — a source id without a numeric suffix made the
    bare ANSI cast of '' abort the whole mixture pass in BOTH engines;
    unindexed sources now take the declared minimal weight 1. NULL doc_id
    rows are excluded (declared id contract): the rank orders by
    md5(doc_id), whose NULL placement is engine-dependent (Spark NULLS
    FIRST vs DuckDB NULLS LAST in ASC), shifting every rank in that
    source by one."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id").isNotNull())
    w = (
        F.coalesce(
            F.expr("try_cast(regexp_extract(source, '[0-9]+', 0) AS bigint)"),
            F.lit(0),
        )
        % MIX_WEIGHT_MOD
        + 1
    )
    counts = d.groupBy("source").agg(
        F.count("*").cast("long").alias("avail")
    ).withColumn("w", w)
    # T = min over the |sources|-row aggregate, taken as an unpartitioned
    # window over that tiny frame so the quota derives inside the SAME
    # subtree — a separate agg + crossJoin would recompute the counts
    # branch and cost a third corpus scan. avail DIV w keeps the unit
    # count exact integer arithmetic (floor(double-div) can round at
    # magnitudes where the quotient's double is off by one ulp).
    t_units = F.min(F.expr("avail DIV w")).over(Window.partitionBy())
    quotas = counts.select("source", (F.col("w") * t_units).alias("quota"))
    rank_w = Window.partitionBy("source").orderBy(
        F.md5(F.col("doc_id").cast("string")), "doc_id"
    )
    ranked = d.select(
        "doc_id", "source", F.row_number().over(rank_w).cast("long").alias("rk")
    )
    return ranked.join(F.broadcast(quotas), "source").filter(
        F.col("rk") <= F.col("quota")
    ).select("doc_id", "source", "rk")


# 2^60: the md5-prefix hash space both engines can represent exactly in
# int64 (15 hex chars) — the unit for the q124 keep-threshold.
_MIX_HASH_SPACE = 1 << 60


@query(
    "q124_dataset_mixture_hash",
    oracle=f"""
    WITH w AS (
      SELECT source,
             COALESCE(TRY_CAST(REGEXP_EXTRACT(source, '[0-9]+') AS BIGINT), 0)
               % {MIX_WEIGHT_MOD} + 1 AS w,
             CAST(COUNT(*) AS BIGINT) AS avail
      FROM documents WHERE doc_id IS NOT NULL GROUP BY source
    ), t AS (
      SELECT MIN(avail // w) AS t FROM w
    ), q AS (
      SELECT source, avail,
             CAST((CAST(w * (SELECT t FROM t) AS HUGEINT) * {_MIX_HASH_SPACE})
                  // avail AS BIGINT) AS cutoff
      FROM w
    )
    SELECT d.doc_id, d.source
    FROM documents d JOIN q USING (source)
    WHERE d.doc_id IS NOT NULL
      AND CAST(CONCAT('0x', SUBSTR(MD5(CAST(d.doc_id AS VARCHAR)), 1, 15))
               AS BIGINT) < q.cutoff
    """,
    tags=("llm", "pipeline", "mixture", "sampling"),
)
def q124_dataset_mixture_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q115's dataset mixture at 100 TB: the hash-threshold draw.

    q115's exact-quota draw ranks every document inside a per-source
    window — correct, but a giant source serializes its sort on one task.
    This variant IS the documented at-scale path, executable and fully
    oracled: scale each source's keep probability quota/avail into the
    2^60 md5-prefix space (cutoff = floor(quota * 2^60 / avail), exact
    decimal/HUGEINT integer arithmetic) and keep a document iff
    hash60(doc_id) < cutoff — a MAP-SIDE filter with no window, no sort,
    no shuffle on the corpus scan. The achieved counts carry binomial
    jitter around the quotas (sigma ~ sqrt(quota); asserted within 5
    sigma by tests/test_sketch_gates.py) but the selected SET is fully
    deterministic — both engines evaluate the same md5 comparison, so
    unlike most sampling operators this one still gets an exact value
    oracle, not a rows-only check.

    Shape: tiny source-keyed agg -> integer cutoff per source ->
    broadcast-join back -> codegen'd filter. The only shuffle anywhere is
    the |sources|-row aggregate.

    Round-7 probe pins: same declared contracts as q115 (TRY_CAST'd
    weight key with default 1; NULL doc_id excluded — here the oracle's
    CONCAT('0x', NULL-md5) would collapse to the malformed literal '0x'
    under DuckDB's NULL-ignoring CONCAT and raise)."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id").isNotNull())
    w = (
        F.coalesce(
            F.expr("try_cast(regexp_extract(source, '[0-9]+', 0) AS bigint)"),
            F.lit(0),
        )
        % MIX_WEIGHT_MOD
        + 1
    )
    counts = d.groupBy("source").agg(
        F.count("*").cast("long").alias("avail")
    ).withColumn("w", w)
    t_units = F.min(F.expr("avail DIV w")).over(Window.partitionBy())
    cutoffs = counts.select(
        "source",
        ((F.col("w") * t_units).cast("decimal(38,0)") * F.lit(_MIX_HASH_SPACE))
        .alias("_num"),
        "avail",
    ).select("source", F.expr("_num DIV avail").alias("cutoff"))
    hash60 = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string")), 1, 15), 16, 10
    ).cast("long")
    return (
        d.select("doc_id", "source")
        .join(F.broadcast(cutoffs), "source")
        .filter(hash60 < F.col("cutoff"))
        .select("doc_id", "source")
    )
