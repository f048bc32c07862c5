"""Near-duplicate detection for LLM data pipelines: exact n-gram Jaccard,
MinHash+LSH, SimHash (+ banded SimHash pair generation).

North-star extension generalizing the reference's exact byte-hash dedup
(deduper.go:25-38) to *near*-dup detection over text. Design for 100 TB:

- shingle inverted-index joins carry a document-frequency cap (ultra-common
  shingles are dropped BEFORE the self-join — otherwise one hot shingle
  produces a quadratic join partition; the cap is part of the declared
  operator semantics and mirrored in every oracle);
- MinHash/LSH replaces the all-pairs comparison with band-bucket joins:
  candidate generation is linear in corpus size, exact Jaccard runs only on
  candidates;
- SimHash packs a document into one 60-bit signature; banded matching makes
  Hamming-neighbor search a hash join, not a cross join.

Portability: signatures hash via md5 (deterministic in both engines; hex →
BIGINT via conv/CAST) rather than Spark's faster xxhash64, so every step is
oracle-checkable. A production deployment would swap md5 → xxhash64
one-line; the plan shape is identical.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..registry import query
from ..tables import table as t

# Document-frequency cap for shingle postings (see module docstring).
MAX_DF = 50
# Exact Jaccard threshold for near-dup pairs.
JACCARD_T = 0.20
# MinHash: 16 hashes → 8 bands × 2 rows.
NUM_HASHES = 16
LSH_BANDS = 8
# SimHash: 60-bit signatures (15 hex chars of md5), 4 bands × 15 bits.
SIM_BITS = 60
SIM_BAND_BITS = 15
HAMMING_T = 12

_SPARK_SHINGLES = """
  CASE WHEN size(words) >= 3 THEN
    array_distinct(transform(sequence(0, size(words) - 3),
      i -> concat_ws(' ', words[i], words[i+1], words[i+2])))
  ELSE CAST(array() AS ARRAY<STRING>) END
"""

# DuckDB CTEs shared by the dedup oracles: distinct word-trigram shingles
# per doc, then the df-capped posting list and per-doc set sizes.
_DUCK_SHINGLE_CTES = f"""
    toks AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS words FROM documents
    ), sh_all AS (
      SELECT doc_id, UNNEST(CASE WHEN LEN(words) >= 3 THEN
          LIST_DISTINCT(LIST_TRANSFORM(GENERATE_SERIES(1, LEN(words) - 2),
            i -> words[i] || ' ' || words[i+1] || ' ' || words[i+2]))
          ELSE [] END) AS shingle
      FROM toks
    ), kept AS (
      SELECT shingle FROM sh_all GROUP BY shingle HAVING COUNT(*) <= {MAX_DF}
    ), sh AS (
      SELECT doc_id, shingle FROM sh_all WHERE shingle IN (SELECT shingle FROM kept)
    ), sizes AS (
      SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n FROM sh GROUP BY doc_id
    )
"""

_DUCK_EXACT_PAIRS = f"""
    WITH {_DUCK_SHINGLE_CTES},
    pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, CAST(COUNT(*) AS BIGINT) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_common,
           n_common * 1.0 / (na.n + nb.n - n_common) AS jaccard
    FROM pairs
    JOIN sizes na ON doc_a = na.doc_id
    JOIN sizes nb ON doc_b = nb.doc_id
    WHERE n_common * 1.0 / (na.n + nb.n - n_common) >= {JACCARD_T}
"""


def _shingle_postings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, shingle) postings: distinct word trigrams, df-capped.

    Persisted: downstream operators reference the postings 3+ times (both
    self-join sides + set sizes) — without materialization Spark recomputes
    the tokenize/shingle subtree per reference. On a cluster this would be a
    checkpoint to fast storage; MEMORY_AND_DISK is the local analog.
    """
    d = t(spark, sf_dir, "documents")
    sh_all = d.select("doc_id", F.split("text", " ").alias("words")).select(
        "doc_id", F.explode(F.expr(_SPARK_SHINGLES)).alias("shingle")
    )
    # df via a window over the shingle shuffle — one pass computes postings
    # AND their document frequency (no second scan for the cap).
    df_w = F.count("*").over(Window.partitionBy("shingle"))
    return sh_all.withColumn("df", df_w).filter(F.col("df") <= MAX_DF).persist()


_PAIR_EXPR = """
  flatten(transform(ds, (a, i) ->
    transform(slice(ds, i + 2, size(ds)), b -> struct(a AS doc_a, b AS doc_b))))
"""


def _exact_pairs(sh: DataFrame) -> DataFrame:
    """All-pairs Jaccard over a (doc_id, shingle) posting list.

    Inverted-index pattern without a self-join: group postings by shingle,
    emit each group's doc-pair combinations from the collected (sorted) doc
    list, then count pairs. One shuffle on shingle + one on the pair key —
    vs 3 shuffles and a join for the naive self-join formulation. The df cap
    bounds each group's fanout to MAX_DF²/2 at any corpus size.
    """
    sizes = sh.groupBy("doc_id").agg(F.count("*").cast("long").alias("n"))
    pairs = (
        sh.filter(F.col("df") >= 2)
        .groupBy("shingle")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .select(F.explode(F.expr(_PAIR_EXPR)).alias("p"))
        .groupBy(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .agg(F.count("*").cast("long").alias("n_common"))
    )
    na = sizes.alias("na")
    nb = sizes.alias("nb")
    return (
        pairs.join(na, F.col("doc_a") == F.col("na.doc_id"))
        .join(nb, F.col("doc_b") == F.col("nb.doc_id"))
        .select(
            "doc_a",
            "doc_b",
            "n_common",
            (F.col("n_common") * F.lit(1.0) / (F.col("na.n") + F.col("nb.n") - F.col("n_common"))).alias(
                "jaccard"
            ),
        )
        .filter(F.col("jaccard") >= JACCARD_T)
    )


@query("q75_neardup_jaccard", oracle=_DUCK_EXACT_PAIRS, tags=("llm", "dedup", "neardup"))
def q75_neardup_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact n-gram Jaccard near-dup pairs (trigram shingles, df-capped
    inverted-index self-join). The exact baseline the approximate variants
    (q76/q78) are graded against."""
    return _exact_pairs(_shingle_postings(spark, sf_dir))


def minhash_signatures(sh: DataFrame, num_hashes: int = NUM_HASHES) -> DataFrame:
    """Per-doc MinHash signature: sig[i] = min over shingles of
    H_i(shingle), with H_i = first 15 hex chars of md5(i ':' shingle) as a
    60-bit int. One aggregation, num_hashes mins — no per-doc Python."""
    hashes = [
        F.min(
            F.conv(F.substring(F.md5(F.concat_ws(":", F.lit(str(i)), F.col("shingle"))), 1, 15), 16, 10)
            .cast("long")
        ).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    return sh.groupBy("doc_id").agg(*hashes)


@query("q76_neardup_minhash_lsh", oracle=None, tags=("llm", "dedup", "neardup", "lsh"))
def q76_neardup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs: shingle → 16-slot MinHash signature →
    8 band buckets (2 rows each) → band-bucket self-join for candidates →
    exact Jaccard verification on candidates only.

    The 100 TB path: candidate generation is a hash join on band value —
    linear scan + shuffle, never all-pairs. Rows-only check (LSH recall is
    probabilistic, so no SQL oracle; tests/test_llm_dedup.py measures recall
    against q75's exact pairs instead).
    """
    sh = _shingle_postings(spark, sf_dir)
    sigs = minhash_signatures(sh)
    rows_per_band = NUM_HASHES // LSH_BANDS
    bands = sigs.select(
        "doc_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(bi).alias("band_idx"),
                        F.md5(
                            F.concat_ws(
                                ",",
                                *[
                                    F.col(f"h{bi * rows_per_band + r}").cast("string")
                                    for r in range(rows_per_band)
                                ],
                            )
                        ).alias("band_val"),
                    )
                    for bi in range(LSH_BANDS)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "band.band_idx", "band.band_val")
    candidates = (
        bands.groupBy("band_idx", "band_val")
        .agg(F.sort_array(F.collect_list("doc_id")).alias("ds"))
        .filter(F.size("ds") >= 2)
        .select(F.explode(F.expr(_PAIR_EXPR)).alias("p"))
        .select(F.col("p.doc_a").alias("doc_a"), F.col("p.doc_b").alias("doc_b"))
        .distinct()
    )
    # verify candidates with exact Jaccard on collected shingle sets
    docsets = sh.groupBy("doc_id").agg(
        F.collect_set("shingle").alias("sset"), F.count("*").cast("long").alias("n")
    )
    da = docsets.alias("da")
    db = docsets.alias("db")
    inter = F.size(F.array_intersect(F.col("da.sset"), F.col("db.sset"))).cast("long")
    jac = inter * F.lit(1.0) / (F.col("da.n") + F.col("db.n") - inter)
    return (
        candidates.join(da, F.col("doc_a") == F.col("da.doc_id"))
        .join(db, F.col("doc_b") == F.col("db.doc_id"))
        .select("doc_a", "doc_b", inter.alias("n_common"), jac.alias("jaccard"))
        .filter(F.col("jaccard") >= JACCARD_T)
    )


# --- SimHash -----------------------------------------------------------------

_DUCK_SIMHASH_CTES = f"""
    words AS (
      SELECT doc_id, UNNEST(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS w
      FROM documents
    ), hashed AS (
      SELECT doc_id, CAST(CONCAT('0x', SUBSTR(MD5(w), 1, 15)) AS BIGINT) AS h
      FROM words
    ), bitsum AS (
      SELECT doc_id, b.b AS b,
             SUM(CASE WHEN (h >> b.b) & 1 = 1 THEN 1 ELSE -1 END) AS s
      FROM hashed CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, {SIM_BITS - 1})) AS b) b
      GROUP BY 1, 2
    ), sig AS (
      SELECT doc_id,
             CAST(SUM(CASE WHEN s > 0 THEN (CAST(1 AS BIGINT) << b) ELSE 0 END) AS BIGINT) AS simhash
      FROM bitsum GROUP BY doc_id
    )
"""


def simhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash per doc over distinct word features (md5-derived bit
    votes). Explode-by-bit keeps everything in codegen'd SQL ops — 60 rows
    per feature, partial-aggregated before the doc_id shuffle."""
    d = t(spark, sf_dir, "documents")
    words = d.select("doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("w"))
    hashed = words.select(
        "doc_id", F.conv(F.substring(F.md5("w"), 1, 15), 16, 10).cast("long").alias("h")
    )
    bits = hashed.select("doc_id", "h", F.explode(F.sequence(F.lit(0), F.lit(SIM_BITS - 1))).alias("b"))
    bitsum = bits.groupBy("doc_id", "b").agg(
        F.sum(F.expr("CASE WHEN (h >> b) & 1 = 1 THEN 1 ELSE -1 END")).alias("s")
    )
    return bitsum.groupBy("doc_id").agg(
        F.sum(F.expr("CASE WHEN s > 0 THEN shiftleft(CAST(1 AS BIGINT), b) ELSE 0 END"))
        .cast("long")
        .alias("simhash")
    )


@query(
    "q77_simhash",
    oracle=f"""
    WITH {_DUCK_SIMHASH_CTES}
    SELECT doc_id, simhash FROM sig
    """,
    tags=("llm", "dedup", "simhash"),
)
def q77_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash signatures (bit-exact across engines — the oracle recomputes
    the same bit votes in SQL)."""
    return simhash_signatures(spark, sf_dir)


@query(
    "q78_simhash_pairs",
    oracle=f"""
    WITH {_DUCK_SIMHASH_CTES},
    bands AS (
      SELECT doc_id,
             k.k AS band_idx,
             (simhash >> (k.k * {SIM_BAND_BITS})) & {(1 << SIM_BAND_BITS) - 1} AS band_val,
             simhash
      FROM sig CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, 3)) AS k) k
    )
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(BIT_COUNT(XOR(a.simhash, b.simhash)) AS INTEGER) AS hamming
    FROM bands a
    JOIN bands b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
                AND a.doc_id < b.doc_id
    WHERE BIT_COUNT(XOR(a.simhash, b.simhash)) <= {HAMMING_T}
    """,
    tags=("llm", "dedup", "simhash", "lsh"),
)
def q78_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded SimHash near-dup pairs: 4×15-bit bands → hash-join candidate
    buckets → Hamming-distance verification (bit_count(xor)). Same
    linear-scan + hash-join shape as MinHash LSH, but for Hamming space."""
    sigs = simhash_signatures(spark, sf_dir)
    mask = (1 << SIM_BAND_BITS) - 1
    bands = sigs.select(
        "doc_id",
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(k).alias("band_idx"),
                        F.expr(f"shiftright(simhash, {k * SIM_BAND_BITS}) & {mask}").alias("band_val"),
                    )
                    for k in range(4)
                ]
            )
        ).alias("band"),
    ).select("doc_id", "simhash", "band.band_idx", "band.band_val")
    a = bands.alias("a")
    b = bands.alias("b")
    hamming = F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).cast("int")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            hamming.alias("hamming"),
        )
        .filter(F.col("hamming") <= HAMMING_T)
        .distinct()
    )
