"""Text-analysis operators for LLM data pipelines: token/quality stats,
language ID, document fingerprinting, BPE-ish token counting, multimodal
binary-column plumbing.

North-star extension (BASELINE.json): the reference treats payloads as
opaque bytes (proto/aggregation.proto:20); these operators are the "parse
on demand" analytics a 100 TB training-data pipeline needs. Everything is
built-in Spark SQL functions (codegen, zero Python): narrow projections that
scale linearly with the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import query
from ..tables import table as t
from .scalars import strict_digit_int_sql

STOPWORDS = {
    "en": ("the", "a", "of", "and", "is"),
    "de": ("der", "die", "das", "und", "ist"),
    "es": ("el", "los", "y", "es", "una"),
    "fr": ("le", "les", "et", "est", "une"),
}

# BPE-ish pre-tokenizer: letter runs | single digits | non-alnum symbols.
# Kept to syntax shared by Java regex (Spark) and RE2 (DuckDB).
BPE_PATTERN = "[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]"


def _expand_dotted_i(col) -> F.Column:
    """Unicode SpecialCasing, applied explicitly (round-10 pin): expand
    U+0130 (LATIN CAPITAL LETTER I WITH DOT ABOVE) to 'i' + U+0307
    BEFORE any LOWER. It is the one code point where the engines' case
    mappings disagree — Spark/Java lowercases it to the two-codepoint
    SpecialCasing form while DuckDB's utf8proc simple mapping drops the
    dot — so any case-normalized DEDUP KEY over text containing 'İ' is
    otherwise engine-dependent. The oracle twin is
    REGEXP_REPLACE(text, CHR(304), 'i' || CHR(775), 'g')."""
    return F.regexp_replace(col, "İ", "i̇")


def _count_in(words, vocab: tuple[str, ...]):
    """# tokens of `words` found in `vocab` (JVM-side higher-order filter)."""
    arr = F.array(*[F.lit(w) for w in vocab])
    return F.size(F.filter(words, lambda w: F.array_contains(arr, w)))


def _duck_count_in(vocab: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in vocab)
    return f"LEN(LIST_FILTER(STRING_SPLIT(text, ' '), w -> LIST_CONTAINS([{lst}], w)))"


@query(
    "q70_text_stats",
    oracle=f"""
    SELECT doc_id,
           CAST(LENGTH(text) AS INTEGER) AS n_chars_calc,
           CAST(LEN(STRING_SPLIT(text, ' ')) AS INTEGER) AS n_tokens,
           CAST(LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) AS INTEGER) AS n_distinct_tokens,
           LEN(LIST_DISTINCT(STRING_SPLIT(text, ' '))) * 1.0 / LEN(STRING_SPLIT(text, ' ')) AS type_token_ratio,
           LIST_SUM(LIST_TRANSFORM(STRING_SPLIT(text, ' '), w -> LENGTH(w))) * 1.0
             / LEN(STRING_SPLIT(text, ' ')) AS avg_token_len,
           {_duck_count_in(STOPWORDS["en"])} * 1.0 / LEN(STRING_SPLIT(text, ' ')) AS stopword_ratio
    FROM documents
    """,
    tags=("llm", "text"),
)
def q70_text_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-scoring stats per document: counts, type-token ratio, mean
    token length, stopword ratio. All exact int arithmetic + one final
    double division → bit-identical across engines."""
    d = t(spark, sf_dir, "documents")
    words = F.split("text", " ")
    n_tok = F.size(words)
    tok_len_sum = F.aggregate(
        F.transform(words, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
    )
    return d.select(
        "doc_id",
        F.length("text").cast("int").alias("n_chars_calc"),
        n_tok.cast("int").alias("n_tokens"),
        F.size(F.array_distinct(words)).cast("int").alias("n_distinct_tokens"),
        (F.size(F.array_distinct(words)) * F.lit(1.0) / n_tok).alias("type_token_ratio"),
        (tok_len_sum * F.lit(1.0) / n_tok).alias("avg_token_len"),
        (_count_in(words, STOPWORDS["en"]) * F.lit(1.0) / n_tok).alias("stopword_ratio"),
    )


@query(
    "q71_lang_id",
    oracle=f"""
    WITH scores AS (
      SELECT doc_id, lang,
             {_duck_count_in(STOPWORDS["en"])} AS c_en,
             {_duck_count_in(STOPWORDS["de"])} AS c_de,
             {_duck_count_in(STOPWORDS["es"])} AS c_es,
             {_duck_count_in(STOPWORDS["fr"])} AS c_fr
      FROM documents
    )
    SELECT doc_id, lang,
           CASE WHEN c_en >= c_de AND c_en >= c_es AND c_en >= c_fr AND c_en > 0 THEN 'en'
                WHEN c_de >= c_es AND c_de >= c_fr AND c_de > 0 THEN 'de'
                WHEN c_es >= c_fr AND c_es > 0 THEN 'es'
                WHEN c_fr > 0 THEN 'fr'
                ELSE 'unknown' END AS predicted_lang
    FROM scores
    """,
    tags=("llm", "text", "langid"),
)
def q71_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stopword-profile language ID (n-gram-heuristic family). Deterministic
    first-wins argmax so the SQL twin matches exactly. (The synthetic corpus
    shares one vocabulary across its lang labels, so predictions mostly say
    'en'/'unknown' — the operator contract, not corpus accuracy, is under
    test.)"""
    d = t(spark, sf_dir, "documents")
    words = F.split("text", " ")
    c = {k: _count_in(words, v) for k, v in STOPWORDS.items()}
    pred = (
        F.when((c["en"] >= c["de"]) & (c["en"] >= c["es"]) & (c["en"] >= c["fr"]) & (c["en"] > 0), "en")
        .when((c["de"] >= c["es"]) & (c["de"] >= c["fr"]) & (c["de"] > 0), "de")
        .when((c["es"] >= c["fr"]) & (c["es"] > 0), "es")
        .when(c["fr"] > 0, "fr")
        .otherwise("unknown")
    )
    return d.select("doc_id", "lang", pred.alias("predicted_lang"))


@query(
    "q72_fingerprint",
    oracle="""
    -- the REGEXP_REPLACE(... chr(304) ...) leg is the round-10 dotted-I
    -- pin: LOWER('I-with-dot-above' U+0130) is the one code point where
    -- the engines' case mappings disagree (Spark/Java applies Unicode
    -- SpecialCasing -> 'i' + COMBINING-DOT U+0307; DuckDB's utf8proc
    -- simple mapping -> bare 'i'). Both twins apply the SpecialCasing
    -- expansion EXPLICITLY before LOWER, so the normalized form -- and
    -- therefore the dedup fingerprint -- is engine-independent.
    WITH n AS (
      SELECT doc_id,
             LOWER(TRIM(REGEXP_REPLACE(
               REGEXP_REPLACE(text, CHR(304), 'i' || CHR(775), 'g'),
               '[ \\t\\n\\x0B\\f\\r]+', ' ', 'g'))) AS norm
      FROM documents
    )
    SELECT doc_id,
           MD5(norm) AS fingerprint,
           SUBSTR(MD5(norm), 1, 8) AS fp_prefix
    FROM n
    """,
    tags=("llm", "text", "fingerprint"),
)
def q72_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalized-content fingerprint (whitespace-collapse → lower → md5) —
    the canonical-form dedup key (generalizes deduper.go:26-29's body hash
    to normalized text). DuckDB needs the 'g' flag for global replace;
    Spark's regexp_replace is global by default.

    Round-10 dotted-I pin: U+0130 is expanded to 'i' + U+0307 explicitly
    on both twins before LOWER (see the oracle comment) — without it the
    fingerprint of any text containing 'İ' is engine-dependent, which for
    a DEDUP KEY means engine-dependent survivors. Shared with q97's
    canonical-dedup stage via _expand_dotted_i.

    Round-11 vertical-tab pin (the \\s probe): Java's \\s is
    [ \\t\\n\\x0B\\f\\r] while RE2's omits \\x0B — text containing a
    vertical tab normalized differently and the FINGERPRINT diverged
    (engine-dependent dedup survivors again). Both twins now spell the
    class out explicitly — the declared whitespace set is Java's; \\s
    never appears in an oracle-twinned pattern."""
    d = t(spark, sf_dir, "documents")
    norm = F.lower(F.trim(F.regexp_replace(_expand_dotted_i("text"), "[ \\t\\n\\x0B\\f\\r]+", " ")))
    fp = F.md5(norm)
    return d.select("doc_id", fp.alias("fingerprint"), F.substring(fp, 1, 8).alias("fp_prefix"))


@query(
    "q73_token_count_bpe",
    oracle=f"""
    SELECT doc_id,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '{BPE_PATTERN}')) AS INTEGER) AS n_bpe_tokens,
           CASE WHEN text IS NULL THEN NULL
                ELSE MD5(COALESCE(
                  ARRAY_TO_STRING(REGEXP_EXTRACT_ALL(text, '{BPE_PATTERN}'), '|'), ''))
           END AS tokens_fp
    FROM documents
    """,
    tags=("llm", "text", "tokenize"),
)
def q73_token_count_bpe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token counting (whitespace-free pre-tokenizer). The
    md5-of-token-stream column proves both engines extracted identical
    token sequences, not just equal counts.

    NULL/empty contract (pinned round 6 by the planted-NULL probe): NULL
    text propagates NULL count + NULL fingerprint on both twins; EMPTY
    text is zero tokens with the fingerprint of the empty stream (Spark's
    array_join([]) is '' while DuckDB's ARRAY_TO_STRING of an empty
    extract is NULL — hence the oracle's COALESCE)."""
    d = t(spark, sf_dir, "documents")
    toks = F.regexp_extract_all("text", F.lit(BPE_PATTERN), 0)
    return d.select(
        "doc_id",
        F.size(toks).cast("int").alias("n_bpe_tokens"),
        F.md5(F.array_join(toks, "|")).alias("tokens_fp"),
    )


@query(
    "q54_multimodal_decode",
    oracle="""
    SELECT doc_id,
           CASE WHEN COALESCE(STRLEN(text), 0) = 0 THEN 'empty'
                WHEN text LIKE 'GIF8%' THEN 'gif'
                WHEN text LIKE 'BM%'   THEN 'bmp'
                WHEN text LIKE 'RIFF%' THEN 'riff'
                WHEN text LIKE 'ID3%'  THEN 'mp3'
                ELSE 'unknown' END AS format,
           CASE WHEN COALESCE(STRLEN(text), 0) = 0 THEN NULL ELSE
             CAST(16 + CAST(CONCAT('0x', SUBSTR(SHA256(text), 1, 2)) AS INT) % 240 AS INTEGER)
           END AS width,
           CASE WHEN COALESCE(STRLEN(text), 0) = 0 THEN NULL ELSE
             CAST(16 + CAST(CONCAT('0x', SUBSTR(SHA256(text), 3, 2)) AS INT) % 240 AS INTEGER)
           END AS height,
           CAST(COALESCE(STRLEN(text), 0) AS BIGINT) AS n_bytes,
           CASE WHEN COALESCE(STRLEN(text), 0) = 0 THEN NULL ELSE MD5(text) END AS content_hash
    FROM documents
    """,
    tags=("llm", "multimodal", "mapInPandas"),
)
def q54_multimodal_decode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multimodal mapInPandas decode path (functions/multimodal.py),
    oracle-CHECKED: documents' text re-encoded as the opaque binary payload,
    run through extract_media_meta's Arrow-batched pipeline (format sniff +
    deterministic fake decode + hashes). The fake decode derives (width,
    height) from the payload's sha256, which DuckDB recomputes exactly —
    proving the Python batch plumbing (schema, batching, null handling)
    produces bit-identical results to a SQL respecification. Swapping
    fake_decode for a real codec keeps this plan and schema unchanged.

    NULL contract (oracle pinned round 6): a NULL payload degrades like
    an empty one — format 'empty', n_bytes 0, null dims/hash (the
    multimodal module's degrade-never-kill rule); the oracle states it
    via COALESCE(STRLEN, 0) so DuckDB's NULL STRLEN can't leak into the
    hex-cast arm (it crashed the unpinned oracle: CONCAT('0x', NULL) is
    '0x' in DuckDB)."""
    from ..functions.multimodal import extract_media_meta

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return extract_media_meta(d)


@query(
    "q74_multimodal_meta",
    oracle="""
    SELECT doc_id,
           CAST(STRLEN(text) AS BIGINT) AS payload_bytes,
           SUBSTR(HEX(ENCODE(text)), 1, 16) AS head_hex,
           CASE WHEN STRLEN(text) >= 256 THEN 'large' ELSE 'small' END AS size_class
    FROM documents
    """,
    tags=("llm", "multimodal"),
)
def q74_multimodal_meta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal-column plumbing: payload as an opaque BINARY column with
    typed metadata (byte length, magic-header hex, size class) — the schema
    pattern for image/audio blobs at 100 TB (decode stubs live in
    functions/multimodal.py; the corpus here is text re-encoded as bytes).
    Seed: the reference's opaque `bytes data` field (proto/aggregation.proto:20)."""
    d = t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.octet_length("text").cast("long").alias("payload_bytes"),
        F.hex(F.expr("substring(encode(text, 'UTF-8'), 1, 8)")).alias("head_hex"),
        F.when(F.octet_length("text") >= 256, "large").otherwise("small").alias("size_class"),
    )


@query(
    "q79_vocab_topk",
    oracle="""
    SELECT token, CAST(COUNT(*) AS BIGINT) AS n FROM (
      SELECT UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
    ) GROUP BY token ORDER BY n DESC, token LIMIT 100
    """,
    tags=("llm", "text", "vocab", "topk"),
)
def q79_vocab_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary: top-100 tokens by frequency (deterministic
    count-then-token tie-break) — the vocabulary-building pass of a
    tokenizer-training pipeline. explode → map-side partial count →
    one shuffle on token → TakeOrderedAndProject top-k (no global sort;
    each partition keeps only its top-100 candidates)."""
    d = t(spark, sf_dir, "documents")
    return (
        d.select(F.explode(F.split("text", " ")).alias("token"))
        .groupBy("token")
        .agg(F.count("*").cast("long").alias("n"))
        .orderBy(F.col("n").desc(), "token")
        .limit(100)
    )


# --- Stratified source sampling ---------------------------------------------

# Per-source sampling tiers for training-mix construction: source index
# mod 4 picks the keep-rate (100/70/40/10 %). A real pipeline reads these
# from a mix config; a literal policy keeps the operator deterministic.
SAMPLE_SALT = "sample:"


def _sample_rate_sql(col: str) -> str:
    """keep-rate percent for a source id 'srcNN' (shared SQL, both engines).

    TRY_CAST + COALESCE (round-7 probe): a source id without the numeric
    suffix ('web', NULL) made the bare CAST of '' raise under ANSI in
    BOTH engines — one odd source string aborting the whole sampling
    pass. Unindexed sources now take tier 0 (keep-rate 100%), declared.

    Strict digit grammar (round-11 extended probe): the bare TRY_CAST
    twin was itself a silent split — DuckDB leniently parses 'src1.5'
    -> 2 / 'src0x1F' -> 31 where Spark yields NULL, putting the same
    document in different sampling tiers per engine. strict_digit_int_sql
    admits only digits-only tails, on which the engines agree exactly;
    every other tail is tier 0 on BOTH."""
    return f"100 - 30 * (COALESCE({strict_digit_int_sql(f'SUBSTR({col}, 4)')}, 0) % 4)"


@query(
    "q84_stratified_sample",
    oracle=f"""
    SELECT doc_id, source, lang,
           CAST(CAST(CONCAT('0x', SUBSTR(MD5(CONCAT('{SAMPLE_SALT}', doc_id)), 1, 8)) AS BIGINT)
                % 100 AS BIGINT) AS sample_key
    FROM documents
    WHERE doc_id IS NOT NULL
      AND CAST(CONCAT('0x', SUBSTR(MD5(CONCAT('{SAMPLE_SALT}', doc_id)), 1, 8)) AS BIGINT)
          % 100 < {_sample_rate_sql("source")}
    """,
    tags=("llm", "sampling"),
)
def q84_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified source sampling for training-mix construction: each
    document keeps or drops by a DETERMINISTIC per-doc hash key compared
    against its source's keep-rate — re-running the pipeline (or running
    it on different cluster sizes/partitionings) selects the same sample,
    unlike rand()-based sampling.

    Scale shape: a pure narrow projection + filter on the scan (no
    shuffle, no sampling state); the rate policy is an expression, so
    Catalyst folds it and the filter runs inside whole-stage codegen.
    md5 is the hash here (not xxhash64) for the same oracle-portability
    reason as the SimHash signatures: DuckDB recomputes the identical
    key, making the sample value-checkable.

    Declared id contract (round-7 probe): rows with NULL doc_id are
    excluded up front — a deterministic per-doc key needs an id, and the
    engines disagree on the hash of a missing one (Spark's CONCAT
    propagates NULL, DuckDB's ignores it, so Spark dropped the row while
    DuckDB sampled it under the salt-only key)."""
    d = t(spark, sf_dir, "documents").filter(F.col("doc_id").isNotNull())
    key = F.conv(
        F.substring(F.md5(F.concat(F.lit(SAMPLE_SALT), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long") % 100
    rate = F.expr(_sample_rate_sql("source"))
    return (
        d.select("doc_id", "source", "lang", key.alias("sample_key"))
        .filter(F.col("sample_key") < rate)
    )


FRAME_BYTES = 64  # frame_sample slice size
MAX_FRAMES = 8


@query(
    "q91_frame_sample",
    oracle=f"""
    WITH f AS (
      SELECT doc_id, HEX(ENCODE(text)) AS hx,
             LEAST({MAX_FRAMES},
                   GREATEST(1, OCTET_LENGTH(ENCODE(text)) // {FRAME_BYTES})) AS n_frames
      FROM documents
      WHERE text IS NOT NULL
    )
    SELECT doc_id,
           CAST(i.i AS INTEGER) AS frame_no,
           CAST(LEN(SUBSTR(hx, i.i * {FRAME_BYTES} * 2 + 1, {FRAME_BYTES} * 2)) // 2
                AS BIGINT) AS n_bytes,
           SUBSTR(hx, i.i * {FRAME_BYTES} * 2 + 1, {FRAME_BYTES} * 2) AS frame_hex
    FROM f CROSS JOIN LATERAL (SELECT UNNEST(GENERATE_SERIES(0, n_frames - 1)) AS i) i
    """,
    tags=("llm", "multimodal", "mapInPandas"),
)
def q91_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over opaque binary payloads (functions/multimodal.py
    ``frame_sample``), oracle-CHECKED: documents' text re-encoded as the
    payload, sliced into up to {MAX_FRAMES} {FRAME_BYTES}-byte frames by
    the Arrow-batched mapInPandas explode — the row-multiplying plumbing a
    video frame-extraction pipeline needs (the codec call itself would
    replace the slicer; schema/batching/fan-out are what this proves).
    Frames compare by length + HEX rather than raw bytes so both engines
    emit plain strings/ints — and since round 6 the oracle slices the
    HEX of the UTF-8 encoding (2 hex chars = 1 byte), so the comparison
    is BYTE-faithful on any input, multibyte included (the earlier
    character-SUBSTR oracle was only valid on the ASCII fixtures).
    NULL contract (oracle pinned round 6): a NULL payload
    has no frames — frame_sample skips it, and the oracle now states the
    same exclusion (DuckDB's lateral UNNEST over the NULL series emitted
    a phantom all-NULL frame row before the pin)."""
    from ..functions.multimodal import frame_sample

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    frames = frame_sample(d, every_n_bytes=FRAME_BYTES, max_frames=MAX_FRAMES)
    return frames.select(
        "doc_id",
        "frame_no",
        F.octet_length("frame").cast("long").alias("n_bytes"),
        F.hex("frame").alias("frame_hex"),
    )


RESIZE_STRIDE = 4  # byte_resize keeps every 4th byte


@query(
    "q92_media_features",
    oracle="""
    WITH b AS (
      SELECT doc_id,
             OCTET_LENGTH(ENCODE(text)) AS nb,
             LIST_TRANSFORM(GENERATE_SERIES(1, OCTET_LENGTH(ENCODE(text))),
               i -> CAST(('0x' || SUBSTR(HEX(ENCODE(text)), 2 * i - 1, 2)) AS INTEGER))
               AS bytes
      FROM documents
    )
    SELECT doc_id,
           CAST(COALESCE(nb, 0) AS BIGINT) AS n_bytes,
           ROUND(LIST_SUM(bytes) * 1.0 / nb, 6) AS mean_byte,
           CAST(COALESCE(LEN(LIST_DISTINCT(bytes)), 0) AS INTEGER) AS n_distinct_bytes
    FROM b
    """,
    tags=("llm", "multimodal", "mapInPandas"),
)
def q92_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'feature-extract' verb of the multimodal pipeline
    (functions/multimodal.py ``byte_features``): per-payload byte
    statistics from an Arrow-batched mapInPandas pass, oracle-checked —
    the mean byte value and distinct-byte cardinality recompute exactly
    in SQL over the ASCII corpus. A real feature extractor (CLIP/wav2vec
    embedding) replaces the function body; schema, batching, and the
    shuffle-free shape are what this pins. NULL contract (oracle pinned
    round 6): byte_features degrades a NULL payload to (0 bytes, NULL
    mean, 0 distinct) exactly like an empty one — the oracle COALESCEs
    its NULL STRLEN arms to match."""
    from ..functions.multimodal import byte_features

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return byte_features(d)


@query(
    "q93_media_resize",
    oracle=f"""
    WITH thumbs AS (
      SELECT doc_id,
             CASE WHEN text IS NULL THEN NULL
                  ELSE COALESCE(ARRAY_TO_STRING(LIST_TRANSFORM(
                         GENERATE_SERIES(1, OCTET_LENGTH(ENCODE(text)), {RESIZE_STRIDE}),
                         i -> SUBSTR(HEX(ENCODE(text)), 2 * i - 1, 2)), ''), '')
             END AS thumb_hex
      FROM documents
    )
    SELECT doc_id,
           CAST(COALESCE(LEN(thumb_hex) // 2, 0) AS BIGINT) AS thumb_bytes,
           thumb_hex
    FROM thumbs
    """,
    tags=("llm", "multimodal", "mapInPandas"),
)
def q93_media_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 'resize' verb (functions/multimodal.py ``byte_resize``):
    every-{RESIZE_STRIDE}th-byte downsample as the deterministic stand-in
    for a pixel resampler, oracle-checked byte-for-byte (thumb length +
    md5 against DuckDB's strided-character reconstruction). cv2/PIL
    resize swaps in for the slice; the mapInPandas plumbing stays.
    The thumb compares as HEX of its bytes — byte-faithful on multibyte
    input since round 6 (the character-strided oracle was ASCII-only).
    NULL contract: NULL payload -> (0 bytes, NULL hex); EMPTY payload ->
    an empty hex string (DuckDB's strided series over '' collapsed both
    to NULL before the pin)."""
    from ..functions.multimodal import byte_resize

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.encode("text", "UTF-8").alias("payload")
    )
    return byte_resize(d, stride=RESIZE_STRIDE).select(
        "doc_id", "thumb_bytes", F.hex("thumb").alias("thumb_hex")
    )


# -- q100: TF-IDF top terms per document --------------------------------------

TFIDF_TOP_K = 3


@query(
    "q100_tfidf_topterms",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
    ), tf AS (
      SELECT doc_id, token, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks GROUP BY doc_id, token
    ), dfreq AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY token
    ), nd AS (
      SELECT COUNT(*) AS n_docs FROM documents
    ), scored AS (
      SELECT f.doc_id, f.token, f.tf, d.df,
             CAST(f.tf * ((SELECT n_docs FROM nd) + 1) AS DOUBLE) / (d.df + 1)
               AS score
      FROM tf f JOIN dfreq d USING (token)
    )
    SELECT doc_id, token, tf, df, score, CAST(rk AS BIGINT) AS rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                   ORDER BY score DESC, token) AS rk
      FROM scored
    ) WHERE rk <= {TFIDF_TOP_K}
    """,
    tags=("llm", "text", "tfidf"),
)
def q100_tfidf_topterms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Characteristic terms per document: tf-idf-style scoring with the
    smoothed INVERSE-FREQUENCY RATIO tf*(N+1)/(df+1) instead of the
    log-idf textbook form — IEEE double division is correctly rounded and
    therefore bit-identical across engines, while ln() is a transcendental
    whose last ulp may differ between libm implementations (and under a
    tf multiplier that ulp could flip a rank). The plan is the shape that
    scales: explode -> two map-side-partial aggregations (tf keyed by
    (doc, token), df keyed by token — df is vocabulary-sized, orders of
    magnitude smaller than the corpus) -> hash join tf<-df on token (AQE
    picks broadcast when the vocab fits) -> per-doc WindowGroupLimit
    top-K. No global sort, no driver state; the N-docs scalar is a
    broadcast one-row aggregate, not a collected constant."""
    d = t(spark, sf_dir, "documents")
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("token"))
    tf = toks.groupBy("doc_id", "token").agg(F.count("*").cast("long").alias("tf"))
    dfreq = tf.groupBy("token").agg(F.count("*").cast("long").alias("df"))
    nd = d.agg(F.count("*").alias("n_docs"))
    scored = (
        tf.join(dfreq, "token")
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            "token",
            "tf",
            "df",
            (
                (F.col("tf") * (F.col("n_docs") + 1)).cast("double")
                / (F.col("df") + 1)
            ).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "token")
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= TFIDF_TOP_K)
    )


# -- q110: PII detection + redaction ------------------------------------------

# Patterns kept to syntax shared by Java regex (Spark) and RE2 (DuckDB):
# char classes, bounded repetition, \d — no backreferences, no lookaround,
# and (round 11) NO \b: the word-boundary probe found Java's \b is
# UNICODE-aware (é / Arabic-Indic digits count as word chars, so
# 'é1.2.3.4é' has no boundary and Spark skipped the IP) while RE2's \b
# is ASCII (DuckDB redacted it) — a silent twin split on any multibyte
# char adjacent to the anchor. The IPv4 rule now declares explicit
# ASCII boundaries: an address must be delimited by start/end-of-text
# or a non-digit-non-dot character on each side (capture-group guards,
# identical on both engines; stricter than \b inside dotted chains like
# '1.2.3.4.5', which are now left alone — better PII behavior anyway).
# Because the trailing guard CONSUMES its character, two addresses one
# separator apart would leave the second unmatched in a single pass, so
# detection and redaction run TWO passes: pass 1 converts the first of
# each adjacent pair, isolating the rest for pass 2 (two passes reach
# the fixed point for any configuration — the alternating argument;
# asserted in the planted test).
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_CORE = r"\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}"
PII_IPV4_RE = rf"(^|[^0-9.])({PII_IPV4_CORE})($|[^0-9.])"
PII_LONGNUM_RE = r"\d{12,}"

# The synthetic corpus carries no natural PII, so the query plants
# deterministic doc_id-derived PII spans (email on every 3rd doc, IPv4 on
# every 4th, a 16-digit account number on every 5th) and the oracle plants
# the identical spans — the detector/redactor is then exercised on known
# ground truth rather than vacuously counting zeros.
_PII_AUG_SQL = (
    "text || CASE WHEN doc_id % 3 = 0 THEN ' reach user' || CAST(doc_id AS VARCHAR)"
    " || '@mail.example' ELSE '' END"
    " || CASE WHEN doc_id % 4 = 0 THEN ' from 10.' || CAST(doc_id % 200 AS VARCHAR)"
    " || '.0.' || CAST(doc_id % 250 AS VARCHAR) ELSE '' END"
    " || CASE WHEN doc_id % 5 = 0 THEN ' acct 411111111111' || CAST(1000 + doc_id % 1000 AS VARCHAR)"
    " ELSE '' END"
)


@query(
    "q110_pii_redaction",
    oracle=f"""
    WITH aug AS (
      SELECT doc_id, {_PII_AUG_SQL} AS text FROM documents
    ), staged AS (
      SELECT doc_id, text,
             -- counting pass 1 runs on the RAW text (counts keep their
             -- original raw-text semantics); redaction pass 1 runs on
             -- the email-redacted text (replacement order unchanged:
             -- email -> IP -> digit-run)
             REGEXP_REPLACE(text, '{PII_IPV4_RE}', '\\1<IP>\\3', 'g') AS cnt1,
             REGEXP_REPLACE(REGEXP_REPLACE(text, '{PII_EMAIL_RE}', '<EMAIL>', 'g'),
                            '{PII_IPV4_RE}', '\\1<IP>\\3', 'g') AS red1
      FROM aug
    )
    SELECT doc_id,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '{PII_EMAIL_RE}')) AS INTEGER) AS n_emails,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '{PII_IPV4_RE}', 2))
                + LEN(REGEXP_EXTRACT_ALL(cnt1, '{PII_IPV4_RE}', 2)) AS INTEGER) AS n_ips,
           CAST(LEN(REGEXP_EXTRACT_ALL(text, '{PII_LONGNUM_RE}')) AS INTEGER) AS n_longnums,
           REGEXP_REPLACE(
             REGEXP_REPLACE(red1, '{PII_IPV4_RE}', '\\1<IP>\\3', 'g'),
             '{PII_LONGNUM_RE}', '<NUM>', 'g') AS redacted
    FROM staged
    """,
    tags=("llm", "text", "pii"),
)
def q110_pii_redaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing for training corpora: count and redact email / IPv4 /
    long-digit-run spans per document. Entirely JVM regex inside one
    codegen'd projection — a narrow map-only scan with zero shuffle at any
    corpus size (the shape PII scrubbing must have at 100 TB: it runs over
    every byte, so anything beyond a single scan is waste). Patterns are
    restricted to the Java-regex/RE2 common subset so the DuckDB oracle is
    bit-identical; replacement order (email -> IP -> digit-run) is fixed so
    the narrower patterns can't eat inside wider spans first."""
    d = t(spark, sf_dir, "documents")
    aug = F.concat(
        F.col("text"),
        F.when(
            F.col("doc_id") % 3 == 0,
            F.concat(
                F.lit(" reach user"),
                F.col("doc_id").cast("string"),
                F.lit("@mail.example"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 4 == 0,
            F.concat(
                F.lit(" from 10."),
                (F.col("doc_id") % 200).cast("string"),
                F.lit(".0."),
                (F.col("doc_id") % 250).cast("string"),
            ),
        ).otherwise(F.lit("")),
        F.when(
            F.col("doc_id") % 5 == 0,
            F.concat(
                F.lit(" acct 411111111111"),
                (1000 + F.col("doc_id") % 1000).cast("string"),
            ),
        ).otherwise(F.lit("")),
    )
    def ip_pass(col):
        # keep the consumed boundary chars; '<IP>' carries no digits, so
        # passes compose without creating new matches
        return F.regexp_replace(col, PII_IPV4_RE, "$1<IP>$3")

    cnt1 = ip_pass(aug)  # counting pass 1: RAW text (raw-count semantics)
    red1 = ip_pass(F.regexp_replace(aug, PII_EMAIL_RE, "<EMAIL>"))
    return d.select(
        "doc_id",
        F.regexp_count(aug, F.lit(PII_EMAIL_RE)).cast("int").alias("n_emails"),
        # two-pass IP count: pass 1 on the raw text, pass 2 on pass 1's
        # output picks up addresses whose separator pass 1 consumed
        (
            F.regexp_count(aug, F.lit(PII_IPV4_RE))
            + F.regexp_count(cnt1, F.lit(PII_IPV4_RE))
        ).cast("int").alias("n_ips"),
        F.regexp_count(aug, F.lit(PII_LONGNUM_RE)).cast("int").alias("n_longnums"),
        F.regexp_replace(
            ip_pass(red1),
            PII_LONGNUM_RE,
            "<NUM>",
        ).alias("redacted"),
    )


# -- q112: token co-occurrence lift -------------------------------------------

LIFT_MIN_DF = 5  # df cap: tokens must appear in >= this many docs
LIFT_TOP_K = 50


@query(
    "q112_cooccurrence_lift",
    oracle=f"""
    WITH toks AS (
      SELECT DISTINCT doc_id, token FROM (
        SELECT doc_id, UNNEST(STRING_SPLIT(text, ' ')) AS token FROM documents
      )
    ), cx AS (
      SELECT token, CAST(COUNT(*) AS BIGINT) AS c FROM toks
      GROUP BY token HAVING COUNT(*) >= {LIFT_MIN_DF}
    ), toks2 AS (
      SELECT tk.doc_id, tk.token FROM toks tk JOIN cx USING (token)
    ), cab AS (
      SELECT a.token AS tok_a, b.token AS tok_b, CAST(COUNT(*) AS BIGINT) AS c_ab
      FROM toks2 a JOIN toks2 b
        ON a.doc_id = b.doc_id AND a.token < b.token
      GROUP BY a.token, b.token
    ), nd AS (
      SELECT COUNT(*) AS n_docs FROM documents
    )
    SELECT tok_a, tok_b, c_ab, x.c AS c_a, y.c AS c_b,
           CAST(c_ab * (SELECT n_docs FROM nd) AS DOUBLE) / (x.c * y.c) AS lift
    FROM cab JOIN cx x ON tok_a = x.token JOIN cx y ON tok_b = y.token
    ORDER BY lift DESC, tok_a, tok_b LIMIT {LIFT_TOP_K}
    """,
    tags=("llm", "text", "cooccurrence"),
)
def q112_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-pair association mining: document-level co-occurrence counts
    scored by lift P(a,b)/(P(a)P(b)) — the exp of PMI, kept as a pure
    ratio of exact integer counts so one IEEE division reproduces
    bit-identically (ln() would not). Shape: explode -> distinct (doc,
    token) -> broadcast df-cap semi-join (tokens under {LIFT_MIN_DF} docs
    are pruned BEFORE the pair join, which is what bounds the quadratic
    fanout on a real corpus: the surviving vocabulary is frequency-capped,
    and per-doc distinct tokens are bounded by it) -> doc-keyed self-join
    -> pair-keyed partial agg -> two broadcast joins to attach unary
    counts -> TakeOrderedAndProject top-{LIFT_TOP_K} (per-partition heads
    only, no global range sort)."""
    d = t(spark, sf_dir, "documents")
    toks = d.select(
        "doc_id", F.explode(F.split("text", " ")).alias("token")
    ).distinct()
    cx = (
        toks.groupBy("token")
        .agg(F.count("*").cast("long").alias("c"))
        .filter(F.col("c") >= LIFT_MIN_DF)
    )
    toks2 = toks.join(F.broadcast(cx.select("token")), "token")
    a = toks2.select("doc_id", F.col("token").alias("tok_a"))
    b = toks2.select("doc_id", F.col("token").alias("tok_b"))
    cab = (
        a.join(b, ["doc_id"])
        .filter(F.col("tok_a") < F.col("tok_b"))
        .groupBy("tok_a", "tok_b")
        .agg(F.count("*").cast("long").alias("c_ab"))
    )
    nd = d.agg(F.count("*").alias("n_docs"))
    scored = (
        cab.join(F.broadcast(cx.withColumnRenamed("token", "tok_a")), "tok_a")
        .withColumnRenamed("c", "c_a")
        .join(
            F.broadcast(
                cx.withColumnRenamed("token", "tok_b").withColumnRenamed("c", "c_b")
            ),
            "tok_b",
        )
        .crossJoin(F.broadcast(nd))
        .select(
            "tok_a",
            "tok_b",
            "c_ab",
            "c_a",
            "c_b",
            (
                (F.col("c_ab") * F.col("n_docs")).cast("double")
                / (F.col("c_a") * F.col("c_b"))
            ).alias("lift"),
        )
    )
    return scored.orderBy(
        F.col("lift").desc(), "tok_a", "tok_b"
    ).limit(LIFT_TOP_K)


# -- q130: overlapping sliding-window chunker (RAG ingestion) ------------------

CHUNK_TOKENS = 64
CHUNK_STRIDE = 48  # 16-token overlap between consecutive chunks


@query(
    "q130_rag_chunker",
    oracle=f"""
    WITH d AS (
      SELECT doc_id, STRING_SPLIT(text, ' ') AS words,
             CAST(LEN(STRING_SPLIT(text, ' ')) AS BIGINT) AS n
      FROM documents
    ), nc AS (
      SELECT doc_id, words, n,
             CASE WHEN n <= {CHUNK_TOKENS} THEN 1
                  ELSE 1 + (n - {CHUNK_TOKENS} + {CHUNK_STRIDE} - 1)
                           // {CHUNK_STRIDE}
             END AS n_chunks
      FROM d
    )
    SELECT doc_id, CAST(u.i AS BIGINT) AS chunk_idx,
           ARRAY_TO_STRING(words[u.i * {CHUNK_STRIDE} + 1 :
                                 u.i * {CHUNK_STRIDE} + {CHUNK_TOKENS}], ' ')
             AS chunk_text,
           CAST(LEAST({CHUNK_TOKENS}, n - u.i * {CHUNK_STRIDE}) AS BIGINT)
             AS n_tokens
    FROM nc, UNNEST(RANGE(0, n_chunks)) AS u(i)
    """,
    tags=("llm", "text", "chunking", "rag"),
)
def q130_rag_chunker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping sliding-window chunker — the RAG-ingestion primitive:
    split every document into {CHUNK_TOKENS}-token chunks advancing by
    {CHUNK_STRIDE} tokens (a {CHUNK_TOKENS}-{CHUNK_STRIDE}-token overlap
    so no semantic unit is cut without appearing whole in a neighbor).
    Distinct from q111's disjoint chunks: q111 partitions for DEDUP,
    this one overlaps for RETRIEVAL, and the two chunkers deliberately
    share nothing (different budgets, different boundary semantics).

    The chunk count is exact integer arithmetic (1 + ceil((n - chunk) /
    stride) via the add-and-floor-divide identity, computed identically
    in both engines), short docs emit exactly one chunk, and the final
    chunk is allowed to be short (n - i*stride tokens) rather than
    re-anchored — re-anchoring ("last chunk ends at n") is the other
    standard convention and would duplicate tail content at a different
    offset; pick one and state it.

    Scale shape: one narrow scan -> per-row sequence explode (fanout
    n/stride ≈ 2x the token count in CHARACTERS of extra rows, bounded
    and predictable) -> slice + join per chunk, all inside whole-stage
    codegen. Zero shuffles, zero joins, no Python."""
    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.split("text", " ").alias("words")
    )
    n = F.size("words").cast("long")
    n_chunks = F.when(n <= CHUNK_TOKENS, F.lit(1).cast("long")).otherwise(
        1
        + F.floor(
            (n - CHUNK_TOKENS + CHUNK_STRIDE - 1) / F.lit(CHUNK_STRIDE)
        ).cast("long")
    )
    chunked = d.select(
        "doc_id",
        "words",
        n.alias("n"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_idx"),
    )
    start = F.col("chunk_idx") * CHUNK_STRIDE
    return chunked.select(
        "doc_id",
        F.col("chunk_idx").cast("long").alias("chunk_idx"),
        F.array_join(
            F.slice(F.col("words"), (start + 1).cast("int"), CHUNK_TOKENS), " "
        ).alias("chunk_text"),
        F.least(F.lit(CHUNK_TOKENS).cast("long"), F.col("n") - start)
        .alias("n_tokens"),
    )
