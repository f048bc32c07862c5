"""User-defined function surface: scalar Python UDF, Arrow-vectorized
pandas UDF, grouped-map ``applyInPandas`` (UDAF-shaped), and Python UDTF.

SURVEY.md §2B last row: the reference's only "UDF" is its KPL packer
(reference pkg/aggregator/aggregator.go:33-65, which our sink reproduces in
streaming/kpl.py); this module demonstrates the full extension-point
surface a user of the engine gets, with DuckDB oracle twins proving each
path computes exactly what the declarative twin would.

Scale notes (100 TB):
- pandas UDF / applyInPandas / UDTF all move data over Arrow in batches —
  the acceptable Python path. The row-at-a-time ``F.udf`` demo exists for
  API completeness and is explicitly the slow path (q53's docstring); the
  same logic is expressible with built-ins, shown in its oracle.
- applyInPandas shuffles by the grouping key once; group cardinality
  (25 nations) is tiny relative to data, so each group streams through one
  task. For skewed/huge groups, pre-salt or use window functions instead.
"""

from __future__ import annotations

import hashlib
import re
import zlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf

from ..registry import query
from ..tables import table as t
from .llm_text import BPE_PATTERN


@query(
    "q50_pandas_udf_tokenize",
    oracle=f"""
    SELECT doc_id,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '{BPE_PATTERN}')) AS INTEGER) AS n_bpe_tokens,
           CASE WHEN text IS NULL THEN NULL
                ELSE MD5(COALESCE(
                  ARRAY_TO_STRING(REGEXP_EXTRACT_ALL(text, '{BPE_PATTERN}'), '|'), ''))
           END AS tokens_fp
    FROM documents
    """,
    tags=("udf", "pandas_udf", "llm"),
)
def q50_pandas_udf_tokenize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arrow-vectorized scalar pandas UDF: the BPE-ish tokenizer of
    q73_token_count_bpe re-implemented in Python (``re`` + hashlib) — the
    oracle is the same SQL, proving the UDF path is value-identical to the
    JVM regexp path. This is the template for tokenizers that outgrow
    regexp (real BPE merge tables, sentencepiece): batch in via Arrow,
    pure-Python per batch, two output columns.

    NULL contract (q73's, pinned round 6): NULL text propagates NULL
    outputs — the explicit None branch below is the struct-UDF spelling
    of ``na_action="ignore"`` (one NULL row must never kill a 10k-row
    batch).

    Optimization round 15 (guide §4, VERDICT r14 item 5): the two
    original scalar pandas UDFs each ran ``bpe.findall`` per row — the
    fingerprint UDF re-tokenized every document. ONE struct-returning
    pandas UDF tokenizes once and emits both columns: half the Python
    regex work, one ArrowEvalPython node, one text column across the
    boundary instead of two. Output bit-identical (same oracle)."""
    bpe = re.compile(BPE_PATTERN)

    @pandas_udf("n_bpe_tokens int, tokens_fp string")
    def tokenize(texts: pd.Series) -> pd.DataFrame:
        ns: list[int | None] = []
        fps: list[str | None] = []
        for s in texts:
            if s is None:
                ns.append(None)
                fps.append(None)
            else:
                toks = bpe.findall(s)
                ns.append(len(toks))
                fps.append(hashlib.md5("|".join(toks).encode()).hexdigest())
        return pd.DataFrame({"n_bpe_tokens": ns, "tokens_fp": fps})

    d = t(spark, sf_dir, "documents")
    return d.select("doc_id", tokenize("text").alias("tk")).select(
        "doc_id",
        F.col("tk.n_bpe_tokens").alias("n_bpe_tokens"),
        F.col("tk.tokens_fp").alias("tokens_fp"),
    )


@query(
    "q51_apply_in_pandas_median",
    oracle="""
    SELECT c_nationkey,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(ROUND(c_acctbal * 100) AS BIGINT)) AS BIGINT) AS sum_cents,
           CAST(QUANTILE_DISC(CAST(ROUND(c_acctbal * 100) AS BIGINT), 0.5) AS BIGINT)
             AS median_cents
    FROM customer GROUP BY c_nationkey
    """,
    tags=("udf", "apply_in_pandas", "udaf"),
)
def q51_apply_in_pandas_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-map ``applyInPandas`` as a UDAF: exact per-group median —
    an aggregate Spark has no exact built-in for (percentile_approx is a
    sketch). Balances are converted to integer cents so the result is
    bit-exact; the lower median (sorted[(n-1)//2]) matches DuckDB's
    QUANTILE_DISC(0.5). One shuffle on the grouping key, then each group
    streams through a single Arrow batch.

    NULL contract (round-6 pin, matching the SQL aggregate semantics the
    oracle states): COUNT(*) counts every row, SUM and QUANTILE skip
    NULL balances, and an all-NULL group yields NULL sum/median — the
    unguarded astype('int64') instead raised on the NaN a NULL balance
    becomes in pandas, killing the whole group's task."""

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        cents = (
            (pdf["c_acctbal"].dropna() * 100).round().astype("int64").sort_values()
        )
        return pd.DataFrame(
            {
                "c_nationkey": [pdf["c_nationkey"].iloc[0]],
                "n_customers": [len(pdf)],
                "sum_cents": [int(cents.sum()) if len(cents) else None],
                "median_cents": [
                    int(cents.iloc[(len(cents) - 1) // 2]) if len(cents) else None
                ],
            }
        )

    d = t(spark, sf_dir, "customer")
    return d.groupBy("c_nationkey").applyInPandas(
        per_group,
        "c_nationkey int, n_customers long, sum_cents long, median_cents long",
    )


@query(
    "q52_udtf_bigrams",
    oracle="""
    SELECT doc_id, u.pos AS pos, u.bigram AS bigram FROM (
      SELECT doc_id,
             UNNEST(LIST_TRANSFORM(RANGE(1, LEN(toks)),
                    i -> {'pos': i - 1, 'bigram': toks[i] || ' ' || toks[i + 1]})) AS u
      FROM (SELECT doc_id, STRING_SPLIT(text, ' ') AS toks FROM documents)
    )
    """,
    tags=("udf", "udtf", "llm"),
)
def q52_udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF (table function, Spark 3.5+): explode each document into
    word bigrams via LATERAL join — the one-row-in/many-rows-out extension
    point (shingling, sentence splitting, chunking for embedding models).
    Arrow-batched; no shuffle — rows expand in place on the scan tasks."""
    from pyspark.sql.functions import udtf

    @udtf(returnType="pos int, bigram string")
    class Bigrams:
        def eval(self, text: str):
            if text is None:
                # NULL text has no bigrams: emit nothing, matching the
                # oracle's UNNEST over a NULL transform (round-6 pin — an
                # unguarded .split crashed the whole UDTF batch)
                return
            toks = text.split(" ")
            for i in range(len(toks) - 1):
                yield i, toks[i] + " " + toks[i + 1]

    spark.udtf.register("nsq2k_bigrams", Bigrams)
    t(spark, sf_dir, "documents").createOrReplaceTempView("nsq2k_udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, b.pos, b.bigram "
        "FROM nsq2k_udtf_docs d, LATERAL nsq2k_bigrams(d.text) b"
    )


@query(
    "q53_python_udf_crc",
    oracle="""
    -- CODEPOINT reversal, spelled out: DuckDB's REVERSE flips GRAPHEME
    -- clusters (utf8proc), Python's s[::-1] flips codepoints — for
    -- 'e'+COMBINING-ACUTE the two disagree ('xé' vs 'x́e'; round-10
    -- probe). The declared contract is codepoint reversal (what the
    -- engine's UDF computes); STRING_SPLIT(s, '') splits codepoints, so
    -- this twin is exact.
    SELECT doc_id,
           ARRAY_TO_STRING(LIST_REVERSE(STRING_SPLIT(text, '')), '')
             AS reversed_text,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '[aeiou]')) AS INTEGER) AS n_vowels
    FROM documents
    """,
    tags=("udf", "python_udf"),
)
def q53_python_udf_crc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row-at-a-time Python UDF — deliberately the slow path, registered for
    API completeness only (SURVEY.md §2B). Both outputs are expressible
    with built-ins (see oracle); in production this shape should be a
    pandas UDF (q50) or stay JVM-side entirely. zlib.crc32 import shows the
    arbitrary-Python escape hatch even though the oracle checks only the
    SQL-expressible columns. NULL contract (round-6 pin): None in, None
    out — the SQL twin's REVERSE(NULL)/LEN(NULL) propagation, which an
    unguarded lambda instead turned into a task-killing TypeError."""
    _ = zlib.crc32  # the escape hatch a real deployment might use

    rev = F.udf(lambda s: s[::-1] if s is not None else None, "string")
    n_vowels = F.udf(
        lambda s: sum(1 for c in s if c in "aeiou") if s is not None else None,
        "int",
    )
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        rev("text").alias("reversed_text"),
        n_vowels("text").alias("n_vowels"),
    )
