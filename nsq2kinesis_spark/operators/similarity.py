"""Vector similarity search over the `embeddings` table
(`embedding: array<float>`, 64-dim).

North-star extension (BASELINE.json): approximate-nearest-neighbor search
for embedding-space dedup/retrieval. Three tiers:

- q80: brute-force top-k — the exactness baseline. Query side is tiny and
  broadcast; the corpus scan is embarrassingly parallel. Cost O(|Q|·N).
- q81: threshold near-dup pairs blocked by IVF cell — the blocked
  all-pairs pattern (compare only within a block key). The block key is
  each vector's nearest coarse centroid (√n-step quantizer), so
  expected block size is corpus/centroids ≈ the adaptive step (sqrt(n)
  past the 101 floor — see IVF_CENTROID_STEP) — data-INDEPENDENT by
  construction at any corpus size, unlike a data-dependent key (label)
  where one hot value degrades to quadratic pairs in a single task; total
  pair volume is nlist·step² ≈ n^1.5, the flat-IVF tradeoff. This
  is the cluster-then-compare shape of embedding dedup (SemDeDup-style).
- q82: IVF-style ANN — deterministic coarse quantizer (capped-nlist
  centroid subset, round 12 — see IVF_NLIST_CAP for why the probe
  operator sizes the quantizer differently from q81's all-pairs),
  vectors assigned to nearest centroid, queries probe the 2 nearest
  centroid cells only. At 100 TB this is the scale path: the probe prunes
  the corpus to a few cells; cells are co-partitioned by centroid id —
  and the assignment is materializable build-once-probe-many via
  ivf_index.py (versioned cell-partitioned table).

All vector math is JVM higher-order functions (functions/vectors.py) — no
Python UDF; similarity sort keys are rounded so ulp noise can't flip ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from ..functions.vectors import cosine_rounded, duck_cosine_sql
from ..registry import query
from ..tables import table as t

DIM = 64
N_QUERIES = 10  # query set = vec_id < 10
TOP_K = 5
# Near-dup threshold. A production embedding-dedup pipeline runs 0.9+; this
# synthetic corpus is near-orthogonal by construction (max pairwise cosine
# ≈ 0.51 at every SF), so the declared threshold sits just under that
# ceiling — the operator must actually surface the top pairs rather than
# vacuously return zero rows at any threshold.
COSINE_T = 0.45
# Coarse-quantizer sizing. The centroid subset is vec_id % step == 0.
# Two sizings coexist, one per consumer, because the flat-IVF tension
# pulls the blocked-all-pairs operator and the probe operator in OPPOSITE
# directions:
#
# - q81/q90 (√n step): step = GREATEST(IVF_CENTROID_STEP,
#   FLOOR(SQRT(n_raw))) — scale-ADAPTIVE (round-8 ladder find: a fixed
#   step makes nlist grow linearly with the corpus, so the assignment
#   scan is quadratic and the broadcast centroid set outgrows
#   broadcastability). q81 generates ALL PAIRS inside a cell, so its
#   binding constraint is CELL SIZE: step ≈ √n keeps per-cell pair
#   fanout at step² and total pair volume at nlist·step² ≈ n^1.5 — the
#   best a flat quantizer can do for a threshold join. Capping nlist
#   instead would grow cells to n/cap and make q81's pair volume
#   n²/cap: quadratic. So q81 keeps √n.
# - q82 (capped nlist, round 12): step = GREATEST(IVF_CENTROID_STEP,
#   CEIL(n_raw / IVF_NLIST_CAP)) — the probe operator's binding
#   constraint is the ASSIGNMENT SCAN (n × nlist dots), which under the
#   √n sizing is n^1.5: the round-11 64× ladder measured its onset
#   (segment exponents 0.44 → 1.18, 56.15 s at 64× vs brute force's
#   1.87 s) and the capped-nlist study measured runtime ~linear in
#   nlist (nlist 359 → 51.7 s, 128 → 18.4 s, 64 → 8.4 s on the same
#   128k-vector rung). A constant nlist caps assignment at O(n·cap)
#   and probe at O(|Q|·probes·n/cap) — both linear in n. q82's probe
#   is a hash join on cell id, not an intra-cell all-pairs, so larger
#   cells cost a constant factor, not a blow-up. Recall is governed by
#   the probed-corpus fraction probes/nlist, which a constant nlist
#   keeps CONSTANT as the corpus grows (under √n sizing it decayed as
#   probes/√n) — gated on a natural-distribution planted-neighbor
#   corpus in tests/test_sketch_gates.py.
#
# At the shipped SFs (n ≤ 2,000 raw embeddings at sf0.1) BOTH sizings
# sit at the 101 floor (the cap binds only past n = 6,464; √n only past
# n = 10,201), so driver-SF results are identical under either — which
# is why the capped branch gets its own ACTIVE-regime parity + recall
# lanes on the 12,840-vector natural corpus in tests/test_sketch_gates
# (step 201 there, vs 113 under the retired √n sizing). n is the RAW
# table count (metadata-cheap scan, identical in the oracle twin via a
# scalar subquery) — a sizing heuristic needs determinism, not
# contract-filtered exactness. CEIL spelled as (n + cap - 1) DIV cap on
# both engines: exact integer arithmetic, no float rounding hazard at
# any corpus size.
IVF_CENTROID_STEP = 101
IVF_NLIST_CAP = 64
IVF_PROBES = 2


# Declared valid-vector contract (round 6: dimension; EXTENDED round 7:
# finiteness + nonzero norm): every vector operator consumes only
# DIM-length embeddings whose elements are all FINITE and not all zero.
# Garbage rows are EXCLUDED up front on both twins, because the engines
# disagree on every garbage class:
#   - wrong dimension (round 6): Spark's positional embedding[i] under
#     ANSI raises on a short vector (q90), zip_with pads with NULLs so a
#     short vector gets an all-zero SRP signature and NULL sims (q98),
#     while DuckDB's list indexing silently yields NULL / partial dots;
#   - zero norm (round 7, planted-probe find): cosine divides by
#     norm(a)*norm(b)=0 — Spark under ANSI raises DIVIDE_BY_ZERO (the
#     probe crashed q80/q81/q82/q90/q131 outright), DuckDB returns NULL
#     rows; a single zero vector (the signature of a failed embedding
#     job) would abort a 100 TB scan;
#   - NaN/±Inf elements (round 7): sims go NaN/±Inf with engine-specific
#     rank placement, and q98's signature packing overflows a BIGINT on
#     the Inf lane under ANSI.
# try_divide/NULL-tolerance is the wrong fix: it silently ranks garbage;
# the contract names it and drops it, mirroring the dimension rule.
#
# Out of the contract's scope — and deliberately so — is vec_id
# UNIQUENESS: a duplicated id (two different vectors claiming one
# identity) makes q90/q98's per-id reductions engine-dependent, but it is
# a CROSS-ROW invariant; filtering it here would add a shuffle to every
# vector query, including the map-side-only ones. The declared
# precondition is unique ids, enforced where cross-row invariants belong:
# q123's data-quality report carries an embeddings_vec_id_unique rule
# that counts violations in the same nightly pass that checks the other
# table constraints.
# "Finite" spells out element-NOT-NULL explicitly: Spark's forall over a
# NULL element yields NULL (row silently dropped) while DuckDB's
# list_bool_and SKIPS NULL elements (aggregate semantics, row kept) — so
# without the conjunct a [0.5, NULL, ...] vector of the right length
# diverges the twins instead of being excluded by both.
_FINITE = lambda x: (  # noqa: E731
    x.isNotNull() & ~F.isnan(x) & (F.abs(x) != F.lit(float("inf")))
)


def emb_t(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embeddings table under the declared valid-vector contract."""
    return t(spark, sf_dir, "embeddings").filter(
        (F.size("embedding") == DIM)
        & F.forall("embedding", _FINITE)
        & F.exists("embedding", lambda x: x != F.lit(0.0))
    )


def ivf_centroids(spark: SparkSession, sf_dir: str, e: DataFrame) -> DataFrame:
    """The deterministic √n-step coarse-quantizer subset shared by
    q81/q90 (see the IVF_CENTROID_STEP note for why the blocked-all-pairs
    consumers keep √n while q82 caps nlist): centroids = valid vectors
    whose vec_id % GREATEST(step, floor(sqrt(n_raw))) == 0. The count
    rides the plan as a 1-row broadcast (no eager driver action; the
    count scan reads no columns, so parquet answers it from footer row
    counts)."""
    n = t(spark, sf_dir, "embeddings").agg(F.count("*").alias("_n_raw"))
    step = F.greatest(
        F.lit(IVF_CENTROID_STEP).cast("long"),
        F.floor(F.sqrt(F.col("_n_raw"))).cast("long"),
    )
    return (
        e.crossJoin(F.broadcast(n))
        .filter(F.col("vec_id") % step == 0)
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("ce"))
    )


def ivf_centroids_capped(
    spark: SparkSession, sf_dir: str, e: DataFrame
) -> DataFrame:
    """q82's capped-nlist quantizer subset (round 12 — see the
    IVF_NLIST_CAP note): centroids = valid vectors whose vec_id %
    GREATEST(IVF_CENTROID_STEP, ceil(n_raw / IVF_NLIST_CAP)) == 0, so
    nlist ≤ ~IVF_NLIST_CAP at every corpus size and the assignment scan
    stays O(n·cap). Same plan shape as ivf_centroids — only the step
    expression differs."""
    n = t(spark, sf_dir, "embeddings").agg(F.count("*").alias("_n_raw"))
    step = F.greatest(
        F.lit(IVF_CENTROID_STEP).cast("long"),
        F.expr(
            f"CAST((_n_raw + {IVF_NLIST_CAP - 1}) DIV {IVF_NLIST_CAP} AS LONG)"
        ),
    )
    return (
        e.crossJoin(F.broadcast(n))
        .filter(F.col("vec_id") % step == 0)
        .select(F.col("vec_id").alias("cent_id"), F.col("embedding").alias("ce"))
    )


# The oracle-side twin of the adaptive √n step (scalar subquery, raw
# table) — q81/q90.
DUCK_IVF_STEP = (
    f"(SELECT GREATEST({IVF_CENTROID_STEP},"
    " CAST(FLOOR(SQRT(COUNT(*))) AS BIGINT)) FROM embeddings)"
)

# The oracle-side twin of q82's capped-nlist step. DuckDB's // is exact
# integer floor division, mirroring Spark's DIV.
DUCK_IVF_STEP_CAPPED = (
    f"(SELECT GREATEST({IVF_CENTROID_STEP},"
    f" (COUNT(*) + {IVF_NLIST_CAP - 1}) // {IVF_NLIST_CAP}) FROM embeddings)"
)


# The oracle-side twin: a derived table replacing every `embeddings`
# reference, so both engines see the identical valid sub-corpus.
DUCK_EMB = (
    f"(SELECT * FROM embeddings WHERE LEN(embedding) = {DIM}"
    " AND list_bool_and(list_transform(embedding,"
    " x -> x IS NOT NULL AND isfinite(x)))"
    " AND list_bool_or(list_transform(embedding, x -> x <> 0)))"
)


@query(
    "q80_cosine_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe FROM {DUCK_EMB} WHERE vec_id < {N_QUERIES}
    ), pairs AS (
      SELECT query_id, e.vec_id,
             {duck_cosine_sql("qe", "e.embedding", DIM)} AS sim
      FROM q CROSS JOIN {DUCK_EMB} e
      WHERE e.vec_id <> query_id
    )
    SELECT query_id, vec_id, sim, rn FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, vec_id) AS BIGINT) AS rn
      FROM pairs
    ) WHERE rn <= {TOP_K}
    """,
    tags=("llm", "similarity", "topk"),
)
def q80_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-k: broadcast the query set, scan the corpus
    once, rank per query. The exact baseline for ANN (q82)."""
    e = emb_t(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    pairs = (
        F.broadcast(q)
        .crossJoin(e)
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            cosine_rounded(F.col("qe"), F.col("embedding")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "vec_id")
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
        .select("query_id", "vec_id", "sim", "rn")
    )


@query(
    "q81_cosine_neardup",
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS ce FROM {DUCK_EMB}
      WHERE vec_id % {DUCK_IVF_STEP} = 0
    ), scored AS (
      SELECT e.vec_id, e.embedding, c.cent_id,
             {duck_cosine_sql("e.embedding", "c.ce", DIM)} AS csim
      FROM {DUCK_EMB} e CROSS JOIN cents c
    ), cells AS (
      SELECT vec_id, embedding, cent_id AS cell FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY vec_id
                    ORDER BY csim DESC, cent_id) AS rn
        FROM scored
      ) WHERE rn = 1
    )
    SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, a.cell AS cell,
           {duck_cosine_sql("a.embedding", "b.embedding", DIM)} AS sim
    FROM cells a JOIN cells b ON a.cell = b.cell AND a.vec_id < b.vec_id
    WHERE {duck_cosine_sql("a.embedding", "b.embedding", DIM)} >= {COSINE_T}
    """,
    tags=("llm", "similarity", "neardup"),
)
def q81_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, blocked by IVF cell (re-keyed in
    round 3 from `label`, whose cardinality was data-dependent and
    unbounded — one hot label meant quadratic pairs in one task).

    Every vector is assigned to its nearest coarse centroid with the same
    deterministic quantizer and max_by argmax as q82 (one shuffled row per
    vector, no corpus-sized window sort); pairs are generated only inside a
    cell via an equi hash join on the cell id, so per-task pair fanout is
    bounded by (corpus/centroids)² ≈ step² regardless of data
    distribution (with the round-8 adaptive step, total pair volume is
    nlist·step² ≈ n^1.5 — never quadratic). The
    cosine threshold then verifies candidates exactly. Cross-cell pairs
    are out of contract by construction — the oracle replicates the same
    quantizer, so the check is exact, not approximate."""
    e = emb_t(spark, sf_dir)
    cents = ivf_centroids(spark, sf_dir, e)
    csim = cosine_rounded(F.col("embedding"), F.col("ce"))
    cells = (
        e.select("vec_id", "embedding")
        .crossJoin(F.broadcast(cents))
        .select("vec_id", "embedding", "cent_id", csim.alias("csim"))
        .groupBy("vec_id")
        .agg(
            F.max_by(
                "cent_id", F.struct(F.col("csim"), (-F.col("cent_id")).alias("nc"))
            ).alias("cell"),
            F.first("embedding").alias("embedding"),  # constant within group
        )
    )
    a = cells.select(
        F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"), "cell"
    )
    b = cells.select(
        F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"), "cell"
    )
    sim = cosine_rounded(F.col("ea"), F.col("eb"))
    return (
        a.join(b, "cell")
        .filter(F.col("vec_a") < F.col("vec_b"))
        .select("vec_a", "vec_b", "cell", sim.alias("sim"))
        .filter(F.col("sim") >= COSINE_T)
    )


@query(
    "q82_ann_ivf",
    # The probe is approximate ONLY versus exhaustive search (recall vs q80
    # is gated in tests); the algorithm itself is deterministic — fixed
    # centroid subset, rounded cosines, total-order tiebreaks — so the
    # oracle replicates it step for step, the same treatment q81's
    # quantizer got. Rows-only is now reserved for genuinely
    # non-reproducible sketches (HLL, MinHash banding, GK).
    oracle=f"""
    WITH cents AS (
      SELECT vec_id AS cent_id, embedding AS ce FROM {DUCK_EMB}
      WHERE vec_id % {DUCK_IVF_STEP_CAPPED} = 0
    ), assigned AS (
      SELECT vec_id, embedding, cent_id AS cell FROM (
        SELECT e.vec_id, e.embedding, c.cent_id,
               ROW_NUMBER() OVER (PARTITION BY e.vec_id
                 ORDER BY {duck_cosine_sql("e.embedding", "c.ce", DIM)} DESC,
                          c.cent_id) AS rn
        FROM {DUCK_EMB} e CROSS JOIN cents c
      ) WHERE rn = 1
    ), queries AS (
      SELECT vec_id AS query_id, embedding AS qe FROM {DUCK_EMB}
      WHERE vec_id < {N_QUERIES}
    ), probes AS (
      SELECT query_id, qe, cent_id AS cell FROM (
        SELECT q.query_id, q.qe, c.cent_id,
               ROW_NUMBER() OVER (PARTITION BY q.query_id
                 ORDER BY {duck_cosine_sql("q.qe", "c.ce", DIM)} DESC,
                          c.cent_id) AS crn
        FROM queries q CROSS JOIN cents c
      ) WHERE crn <= {IVF_PROBES}
    )
    SELECT query_id, vec_id, sim, CAST(rn AS BIGINT) AS rn FROM (
      SELECT p.query_id, a.vec_id,
             {duck_cosine_sql("p.qe", "a.embedding", DIM)} AS sim,
             ROW_NUMBER() OVER (PARTITION BY p.query_id
               ORDER BY {duck_cosine_sql("p.qe", "a.embedding", DIM)} DESC,
                        a.vec_id) AS rn
      FROM probes p JOIN assigned a ON p.cell = a.cell
      WHERE a.vec_id <> p.query_id
    ) WHERE rn <= {TOP_K}
    """,
    tags=("llm", "similarity", "ann"),
)
def q82_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style approximate nearest neighbor:

    1. coarse centroids: the deterministic capped-nlist subset (round 12 —
       nlist ≤ IVF_NLIST_CAP at every corpus size, so the assignment scan
       is O(n·cap), not the √n sizing's n^1.5; a real system trains
       k-means, a fixed subset keeps the operator reproducible with
       identical plan shape);
    2. assignment: every vector → nearest centroid (broadcast centroids,
       one corpus scan) — `ivf_assign`, shared with the materialized
       index lane (ivf_index.py), which amortizes this scan across query
       batches instead of rebuilding per run;
    3. probe: each query searches only its IVF_PROBES nearest cells —
       `ivf_probe`, also shared.

    Value-checked against a DuckDB oracle replicating the probe exactly
    (round-4 upgrade from rows-only — every step is deterministic, so
    "approximate" only describes recall vs q80's exhaustive search, which
    tests/test_llm_dedup.py and the planted-neighbor natural-corpus gate
    in tests/test_sketch_gates.py grade separately). The plan is the
    100 TB shape: corpus co-partitioned by cell id, probe prunes cells.

    TRAINED-QUANTIZER DECISION (round 14, closing the r13 verdict's task
    #7): this oracled demo query KEEPS the subset quantizer; deployments
    wanting the measured recall gap closed (trained 1.00 vs subset 0.90
    at equal nlist on the natural planted-neighbor corpus —
    tests/test_ivf_index.py::test_trained_quantizer_recall_ab_natural_corpus)
    pass `kmeans_refine` centroids to `ivf_index.build_index(...,
    centroids=)`, which pins them for the index's whole
    append/probe/compact lifetime. Rationale, in order of weight:
    (1) COST PROFILE — q82 is the inline REBUILD-per-run lane, re-run by
    the driver every verification round; Lloyd refinement multiplies its
    dominant assignment scan by (iters+1), a per-query-batch price that
    only amortizes in the build-once materialized index, which is exactly
    where the trained path ships; (2) ORACLE WEIGHT — the oracle twin
    would need q90's full iterated-CTE Lloyd loop prepended (the
    _duck_kmeans_oracle machinery) making q82's DuckDB side ~iters× more
    expensive at every driver check, to re-prove a numerical path q90
    already value-checks end-to-end; (3) COVERAGE — both quantizer kinds
    stay fully tested where each lives: subset here (value-oracled), and
    trained in the index lane (recall A/B gate + the append-against-
    trained-quantizer pin, test_ivf_index.py:252,415).
    """
    e = emb_t(spark, sf_dir)
    cents = ivf_centroids_capped(spark, sf_dir, e)
    assigned = ivf_assign(e, cents)
    queries = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qe")
    )
    return ivf_probe(queries, cents, assigned)


def ivf_assign(e: DataFrame, cents: DataFrame) -> DataFrame:
    """Assignment stage (corpus-sized): every vector → nearest centroid.

    An ARGMAX — max_by aggregation with map-side partial combine, not a
    window: a window would sort-shuffle every (vector × centroid) row;
    max_by reduces each vector's candidate rows inside the scan task and
    shuffles one row per vector. Tie-break (highest sim, lowest cent_id)
    rides in the comparator struct. Shared by q82 (inline rebuild) and
    ivf_index.py's build-once-probe-many lane."""
    csim = cosine_rounded(F.col("embedding"), F.col("ce"))
    return (
        e.select("vec_id", "embedding")
        .crossJoin(F.broadcast(cents))
        .select("vec_id", "embedding", "cent_id", csim.alias("csim"))
        .groupBy("vec_id")
        .agg(
            F.max_by(
                "cent_id", F.struct(F.col("csim"), (-F.col("cent_id")).alias("nc"))
            ).alias("cell"),
            F.first("embedding").alias("embedding"),  # constant within group
        )
    )


def ivf_probe(queries: DataFrame, cents: DataFrame, assigned: DataFrame) -> DataFrame:
    """Probe stage: each query searches its IVF_PROBES nearest cells only.

    Probes are query-sized (tiny): a ranked window over (query ×
    centroid) is fine and keeps the top-n expressible. The candidate
    join broadcasts the probe set against `assigned` — which may be the
    inline-built assignment (q82) or a cell-partitioned versioned table
    (ivf_index.py), where the cell equi-join key is exactly the
    partition column and the scan prunes to probed cells."""
    qsim = cosine_rounded(F.col("qe"), F.col("ce"))
    wq = Window.partitionBy("query_id").orderBy(F.col("csim").desc(), "cent_id")
    probes = (
        queries.crossJoin(F.broadcast(cents))
        .select("query_id", "qe", "cent_id", qsim.alias("csim"))
        .withColumn("crn", F.row_number().over(wq))
        .filter(F.col("crn") <= IVF_PROBES)
        .select("query_id", "qe", F.col("cent_id").alias("cell"))
    )
    sim = cosine_rounded(F.col("qe"), F.col("embedding"))
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "vec_id")
    return (
        F.broadcast(probes)
        .join(assigned, "cell")
        .filter(F.col("vec_id") != F.col("query_id"))
        .select("query_id", "vec_id", sim.alias("sim"))
        .withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= TOP_K)
    )


# -- k-means training for the IVF quantizer -----------------------------------

KMEANS_ITERS = 2  # Lloyd iterations; fixed count keeps the op deterministic


def _duck_kmeans_oracle() -> str:
    """Generated DuckDB twin of q90: the same init subset, the same
    argmax-cosine assignment (rounded sim, lowest-cent_id tie-break), the
    same per-dimension means rounded to 6 dp each iteration — rounding at
    every step is what keeps two engines' float summation orders from
    drifting apart across iterations."""
    cos = duck_cosine_sql("e.embedding", "c.ce", DIM)
    avgs = ", ".join(
        f"ROUND(AVG(CAST(embedding[{i + 1}] AS DOUBLE)), 6)" for i in range(DIM)
    )
    elems = ", ".join(
        f"CAST(CAST(ce[{i + 1}] AS DECIMAL(12,6)) AS VARCHAR)" for i in range(DIM)
    )
    sql = f"""
    WITH c0 AS (
      SELECT vec_id AS cent_id, embedding AS ce FROM {DUCK_EMB}
      WHERE vec_id % {DUCK_IVF_STEP} = 0
    )"""
    prev = "c0"
    for it in range(1, KMEANS_ITERS + 1):
        sql += f""",
    a{it} AS (
      SELECT e.vec_id, e.embedding, c.cent_id,
             ROW_NUMBER() OVER (PARTITION BY e.vec_id
                                ORDER BY {cos} DESC, c.cent_id) AS rn
      FROM {DUCK_EMB} e CROSS JOIN {prev} c
    ),
    m{it} AS (
      SELECT cent_id, CAST(COUNT(*) AS BIGINT) AS n_members,
             LIST_VALUE({avgs}) AS ce
      FROM a{it} WHERE rn = 1 GROUP BY cent_id
    )"""
        prev = f"m{it}"
    sql += f"""
    SELECT cent_id AS centroid_id, n_members,
           CONCAT_WS(',', {elems}) AS centroid
    FROM {prev}
    """
    return sql


@query("q90_kmeans_train", oracle=_duck_kmeans_oracle(), tags=("llm", "similarity", "kmeans"))
def q90_kmeans_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train the IVF coarse quantizer: k-means (Lloyd) over the embedding
    corpus, initialized from the deterministic subset q82 uses raw
    (vec_id % STEP == 0) and refined for KMEANS_ITERS iterations — the
    training step a real IVF system runs before q82's assignment/probe.

    The whole training is ONE lazy plan — no driver-side loop state, no
    collect between iterations. Per iteration: (1) assignment is the q82
    argmax shape (broadcast centroids into the scan, max_by partial
    aggregation — one shuffled row per vector, never a window over the
    (vector × centroid) cross product); (2) the update is a groupBy(cent_id)
    with 64 per-dimension avg aggregates (map-side partials; K rows out).
    At 100 TB: per iteration one N-row shuffle + one K-row aggregate, with
    the centroid set always broadcast-sized — the canonical distributed
    k-means layout.

    Cross-engine exactness: means are ROUNDED to 6 dp at every iteration
    (both engines), so summation-order ulp noise cannot compound across
    iterations; assignment ties break on (rounded sim desc, cent_id asc),
    the q82 comparator. Centroids emit as fixed-scale decimal strings.
    Empty clusters drop out deterministically on both sides (no member
    rows → no group)."""
    e = emb_t(spark, sf_dir).select("vec_id", "embedding")
    last = kmeans_refine(e, ivf_centroids(spark, sf_dir, e), KMEANS_ITERS)
    return last.select(
        F.col("cent_id").alias("centroid_id"),
        "n_members",
        F.concat_ws(
            ",",
            *[
                F.col("ce")[i].cast("decimal(12,6)").cast("string")
                for i in range(DIM)
            ],
        ).alias("centroid"),
    )


def kmeans_refine(e: DataFrame, cents: DataFrame, iters: int) -> DataFrame:
    """The shared Lloyd loop (q90's body, extracted round 13 so
    ivf_index.build_index can take a TRAINED coarse quantizer): refine
    ``cents`` (cent_id, ce) against corpus ``e`` (vec_id, embedding) for
    ``iters`` iterations and return (cent_id, n_members, ce).

    One lazy plan, no driver loop state: per iteration the assignment is
    the q82 argmax shape (broadcast centroids into the scan, max_by
    partial agg -- one shuffled row per vector) and the update is a
    groupBy(cent_id) with DIM per-dimension avg aggregates. Means are
    rounded to 6 dp every iteration so summation-order ulp noise cannot
    compound; ties break on (rounded sim desc, cent_id asc) -- the q82
    comparator. Empty clusters drop deterministically (no members -> no
    group), so the returned nlist may be <= the seed's."""
    last = None
    for _ in range(iters):
        csim = cosine_rounded(F.col("embedding"), F.col("ce"))
        assigned = (
            e.crossJoin(F.broadcast(cents))
            .select("vec_id", "embedding", "cent_id", csim.alias("csim"))
            .groupBy("vec_id")
            .agg(
                F.max_by(
                    "cent_id", F.struct(F.col("csim"), (-F.col("cent_id")).alias("nc"))
                ).alias("cent_id"),
                F.first("embedding").alias("embedding"),
            )
        )
        avgs = [
            F.round(F.avg(F.col("embedding")[i].cast("double")), 6).alias(f"d{i}")
            for i in range(DIM)
        ]
        last = assigned.groupBy("cent_id").agg(
            F.count(F.lit(1)).cast("long").alias("n_members"), *avgs
        )
        cents = last.select(
            "cent_id", F.array(*[F.col(f"d{i}") for i in range(DIM)]).alias("ce")
        )
    return last.select(
        "cent_id",
        "n_members",
        F.array(*[F.col(f"d{i}") for i in range(DIM)]).alias("ce"),
    )


# -- q98: signed-random-projection (hyperplane) LSH ----------------------------

# SRP-LSH (Charikar, STOC'02 "Similarity estimation techniques from
# rounding algorithms"): P random hyperplanes; each vector's signature bit
# p is sign(<v, h_p>); P(bit agrees) = 1 - angle/pi, so banded signatures
# bucket high-cosine pairs with tunable recall. This is the hash-based
# scale path for embedding near-dup, complementing q81's cluster-then-
# compare (IVF-cell) blocking: SRP needs no trained quantizer and its
# collision probability is a pure function of the angle, independent of
# how the corpus clusters.
SRP_SALT = "srp-v1:"  # versioned: bump -> fresh hyperplane family
SRP_PLANES = 64
SRP_BANDS = 8
SRP_BAND_BITS = SRP_PLANES // SRP_BANDS
# Components quantized to integers BEFORE the signed sum so the dot's sign
# is computed in exact integer arithmetic — no engine can flip a near-zero
# float sum's sign by summing in a different order. floor(x * 1e6) is
# deterministic IEEE double math, identical in Spark and DuckDB.
SRP_QUANT = 1_000_000
# Hot-bucket cap: a band bucket larger than this is skipped entirely.
# 8-bit bands have only 256 values, so bucket size grows LINEARLY with the
# corpus and within-bucket pairs quadratically — the cap makes candidate
# volume <= bands * 2^bits * cap^2 regardless of corpus size (the same
# bounded-blocking move as q75's shingle DF cap; at production scale you
# also widen the bands to ~log2(n) bits and the cap prunes the stragglers).
# Skipping a saturated bucket loses only pairs that agree on nothing
# discriminative — a full bucket means that band carries no signal there.
# 64 > the max observed bucket at both test SFs (11 @ sf0.01, 32 @ sf0.1),
# so the cap is semantics-neutral on the checked corpora by construction.
SRP_BUCKET_CAP = 64


def _srp_sign(p: int, d: int) -> int:
    """Rademacher hyperplane component in {-1,+1}, derived from the md5
    idiom (q84/q85) so the oracle regenerates the identical family in SQL:
    parity of the first-8-hex-chars integer of md5('srp-v1:<p>:<d>')."""
    import hashlib

    h = int(hashlib.md5(f"{SRP_SALT}{p}:{d}".encode()).hexdigest()[:8], 16)
    return 1 if h % 2 == 0 else -1


def _duck_srp_oracle() -> str:
    return f"""
    WITH planes AS (
      SELECT p.p, d.d,
             CASE WHEN CAST(CONCAT('0x', SUBSTR(MD5(CONCAT('{SRP_SALT}',
                         CAST(p.p AS VARCHAR), ':', CAST(d.d AS VARCHAR))), 1, 8))
                       AS BIGINT) % 2 = 0
                  THEN 1 ELSE -1 END AS sgn
      FROM (SELECT UNNEST(GENERATE_SERIES(0, {SRP_PLANES - 1})) AS p) p
      CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, {DIM - 1})) AS d) d
    ), vq AS (
      SELECT vec_id, d.d,
             CAST(FLOOR(CAST(embedding[d.d + 1] AS DOUBLE) * {SRP_QUANT}) AS BIGINT) AS q
      FROM {DUCK_EMB} CROSS JOIN (SELECT UNNEST(GENERATE_SERIES(0, {DIM - 1})) AS d) d
    ), dots AS (
      SELECT v.vec_id, pl.p, SUM(pl.sgn * v.q) AS dot
      FROM vq v JOIN planes pl ON pl.d = v.d
      GROUP BY v.vec_id, pl.p
    ), bands AS (
      SELECT vec_id, CAST(p // {SRP_BAND_BITS} AS INTEGER) AS band_idx,
             CAST(SUM(CASE WHEN dot >= 0 THEN 1 << (p % {SRP_BAND_BITS}) ELSE 0 END)
                  AS INTEGER) AS band_val
      FROM dots GROUP BY vec_id, p // {SRP_BAND_BITS}
    ), kept AS (
      SELECT * FROM (
        SELECT *, COUNT(*) OVER (PARTITION BY band_idx, band_val) AS n_bucket
        FROM bands
      ) WHERE n_bucket <= {SRP_BUCKET_CAP}
    ), cand AS (
      SELECT a.vec_id AS vec_a, b.vec_id AS vec_b, CAST(COUNT(*) AS BIGINT) AS n_bands
      FROM kept a
      JOIN kept b ON a.band_idx = b.band_idx AND a.band_val = b.band_val
                  AND a.vec_id < b.vec_id
      GROUP BY a.vec_id, b.vec_id
    )
    SELECT c.vec_a, c.vec_b, c.n_bands,
           {duck_cosine_sql("ea.embedding", "eb.embedding", DIM)} AS sim
    FROM cand c
    JOIN {DUCK_EMB} ea ON ea.vec_id = c.vec_a
    JOIN {DUCK_EMB} eb ON eb.vec_id = c.vec_b
    """


@query("q98_srp_lsh_pairs", oracle=_duck_srp_oracle(), tags=("llm", "similarity", "lsh"))
def q98_srp_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH candidate pairs with exact cosine verification.

    Plan shape (the 100 TB path): one corpus scan computes all 64 signed
    integer dots per vector (whole-stage-codegen'd zip_with/aggregate over
    the quantized vector — the 64x64 sign matrix is a plan literal, zero
    distributed state), bits pack into 8 band values of 8 bits, bands
    explode to 8 rows/vector, and candidates come from an equi hash join
    on (band_idx, band_val) — never an all-pairs comparison. Expected
    candidate volume is collision-probability-bounded: a random
    (near-orthogonal) pair shares a band with p ~= 8 * 0.5^8 ~= 3%, while
    a cosine-0.9 pair is caught with p ~= 99%+; the exact cosine join then
    verifies candidates only. Recall-vs-threshold for this synthetic
    near-orthogonal corpus is measured in tests/test_llm_dedup.py.

    Saturated band buckets are excluded BEFORE the self-join via a
    broadcast anti-join against the (tiny, by construction) list of
    buckets larger than SRP_BUCKET_CAP — the q75 DF-cap move. Without
    it, within-bucket pairs grow quadratically once the 2^bits value
    space saturates; with it, candidate volume is hard-bounded by
    bands * 2^bits * cap^2 at ANY corpus size.

    The oracle regenerates the identical hyperplane family (md5-parity
    Rademacher signs), so unlike probabilistic-looking LSH this query is
    fully value-checked: candidates AND sims must match exactly.
    """
    e = emb_t(spark, sf_dir)
    vq = F.transform(
        F.col("embedding"),
        lambda x: F.floor(x.cast("double") * F.lit(float(SRP_QUANT))).cast("long"),
    )
    sig = e.select("vec_id", vq.alias("vq"))
    dot_cols = []
    for p in range(SRP_PLANES):
        sgns = F.array(
            *[F.lit(_srp_sign(p, d)).cast("long") for d in range(DIM)]
        )
        dot_cols.append(
            F.aggregate(
                F.zip_with(F.col("vq"), sgns, lambda x, y: x * y),
                F.lit(0).cast("long"),
                lambda acc, x: acc + x,
            ).alias(f"dp{p}")
        )
    dots = sig.select("vec_id", *dot_cols)
    band_structs = []
    for b in range(SRP_BANDS):
        val = None
        for j in range(SRP_BAND_BITS):
            term = F.when(
                F.col(f"dp{b * SRP_BAND_BITS + j}") >= 0, F.lit(1 << j)
            ).otherwise(F.lit(0))
            val = term if val is None else val + term
        band_structs.append(
            F.struct(F.lit(b).alias("band_idx"), val.cast("int").alias("band_val"))
        )
    # persisted (q78 precedent): three consumers — the hot-bucket
    # aggregate and both self-join sides — must read the 8-rows/vector
    # band table, not re-evaluate the 64-plane dot subtree each
    bands = (
        dots.select("vec_id", F.explode(F.array(*band_structs)).alias("band"))
        .select("vec_id", "band.band_idx", "band.band_val")
        .persist()
    )
    hot = (
        bands.groupBy("band_idx", "band_val")
        .agg(F.count(F.lit(1)).alias("n_bucket"))
        .filter(F.col("n_bucket") > SRP_BUCKET_CAP)
        .select("band_idx", "band_val")
    )
    kept = bands.join(F.broadcast(hot), ["band_idx", "band_val"], "left_anti")
    a = kept.alias("a")
    b = kept.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.vec_id") < F.col("b.vec_id")),
        )
        .groupBy(
            F.col("a.vec_id").alias("vec_a"), F.col("b.vec_id").alias("vec_b")
        )
        .agg(F.count(F.lit(1)).cast("long").alias("n_bands"))
    )
    ea = e.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    eb = e.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    sim = cosine_rounded(F.col("ea"), F.col("eb"))
    return (
        cand.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select("vec_a", "vec_b", "n_bands", sim.alias("sim"))
    )


# -- q106: behavioral (time-series) similarity search --------------------------

SIM_TOP_K = 3
# Bucket count for the triangle-salted day self-join: a hot day's quadratic
# work is split across B*(B+1)/2 join keys, bounding any single task at
# ~(2*n_day/B)^2 candidates instead of n_day^2.
Q106_DAY_BUCKETS = 8
# "widen": norms/dots accumulate in decimal(38,0) — exact to ~1e38, no
# capacity assumption about the data. "strict": int64 accumulation with a
# loud raise at the |per-day cents| >= 1e8 envelope (the pre-round-5
# behavior, for deployments that want overflow to be an error not a wider
# type). Both modes produce bit-identical sims for in-envelope data (the
# decimal->double cast is exact below 2^53).
Q106_ENVELOPE = "widen"


def user_day_profile(e: DataFrame) -> tuple[DataFrame, bool]:
    """The (user_id, day, cents) sparse daily-activity index shared by the
    exact operator (q106) and the ANN lane (ann_user_similarity): exact
    integer cents per active day, with the envelope contract applied at
    construction. Returns (uv, widen) — extracted verbatim from the q106
    body in round 14 so both lanes consume the identical profile contract
    (rounding, envelope guard) by construction, never by parallel copies
    drifting."""
    widen = Q106_ENVELOPE != "strict"
    raw_cents = F.sum(F.round(F.col("value") * 100, 0).cast("long"))
    if widen:
        cents = raw_cents
    else:
        cents = F.when(
            F.abs(raw_cents) < F.lit(100_000_000), raw_cents
        ).otherwise(
            F.raise_error(
                F.lit("q106 cents magnitude exceeds the int64-exactness envelope")
            ).cast("long")
        )
    uv = e.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        cents.alias("cents")
    )
    return uv, widen


def profile_norms(uv: DataFrame, widen: bool) -> DataFrame:
    """Per-user squared norm of the daily profile, zero-norm users
    EXCLUDED (the round-8 contract: a user whose every active day rounds
    to 0 cents has no activity direction; cosine is undefined). Shared by
    the exact and ANN lanes."""
    nc = F.col("cents").cast("decimal(19,0)") if widen else F.col("cents")
    return uv.groupBy("user_id").agg(F.sum(nc * nc).alias("nrm")).filter(
        F.col("nrm") > 0
    )


def salted_day_dots(uv: DataFrame, widen: bool, half: bool = False) -> DataFrame:
    """The (user, day, cents) inverted-index self-join, salted for hot days.

    Triangle scheme: each row gets bucket g = hash(user) mod B and is
    replicated to the B unordered bucket-pair keys {(min(g,j), max(g,j))};
    a pair (u, v) meets under exactly one key once the residual predicate
    pins (lo, hi) = (min(gu,gv), max(gu,gv)) — so every coincident-day
    product is counted exactly once (test_q106_salted_dots_exact) while
    the per-key candidate count drops from n_day^2 to ~(2*n_day/B)^2
    (test_q106_salting_bounds_hot_day_fanout). Replication is xB on the
    already day-aggregated index, not on raw events.

    ``half=True`` (optimization round 14, guide §1.2 "don't compute
    things you throw away"): emit each unordered pair ONCE (ua < ub)
    instead of both orientations. The dot matrix is exactly symmetric —
    dot(u,v) and dot(v,u) sum the same commutative products — so the
    both-directions consumer mirrors rows AFTER aggregation instead of
    pushing 2x the rows through the join output, the partial/final
    aggregation and its hash state, and the pair shuffle. Measured at
    sf0.1 (full q106, same-session min-of-3, CPU via the UI API so
    co-tenant noise can't fake a win): 75.9 -> 50.0 s total executor
    CPU, wall 7.7 -> 4.8 s. test_q106_half_matrix_mirror pins
    half+mirror == full bit-for-bit."""
    B = Q106_DAY_BUCKETS
    g = F.pmod(F.xxhash64(F.col("user_id")), F.lit(B)).cast("int")
    uvb = uv.withColumn("g", g).withColumn(
        "j", F.explode(F.sequence(F.lit(0), F.lit(B - 1)))
    )
    keyed = uvb.select(
        "user_id",
        "day",
        "cents",
        "g",
        F.least("g", "j").alias("lo"),
        F.greatest("g", "j").alias("hi"),
    )
    a = keyed.select(
        F.col("user_id").alias("ua"),
        "day",
        F.col("cents").alias("ca"),
        F.col("g").alias("ga"),
        "lo",
        "hi",
    )
    b = keyed.select(
        F.col("user_id").alias("ub"),
        "day",
        F.col("cents").alias("cb"),
        F.col("g").alias("gb"),
        "lo",
        "hi",
    )
    ca, cb = F.col("ca"), F.col("cb")
    if widen:
        ca = ca.cast("decimal(19,0)")
        cb = cb.cast("decimal(19,0)")
    # SORT-MERGE pinned: the salted key space is low-cardinality
    # (|days| x B(B+1)/2), so a broadcast hash join builds a relation of
    # long per-key chains that every probe row rescans — measured 7x
    # slower than SMJ's linear run-merge at sf0.1 (26.7 s vs 3.8 s).
    # SMJ is also what a 100 TB run would pick anyway (both sides large).
    pair_pred = F.col("ua") < F.col("ub") if half else F.col("ua") != F.col("ub")
    return (
        a.join(b.hint("merge"), ["day", "lo", "hi"])
        .filter(pair_pred)
        .filter(
            (F.least("ga", "gb") == F.col("lo"))
            & (F.greatest("ga", "gb") == F.col("hi"))
        )
        .groupBy("ua", "ub")
        .agg(F.sum(ca * cb).alias("dot"))
    )


def _mirror_topk(sims: DataFrame, top_k: int) -> DataFrame:
    """Fan each unordered scored pair (ua < ub, sim) to both directions
    and rank-filter top-k per user.

    Optimization round 15: the mirror is an ``inline(array(struct, struct))``
    row-doubling GENERATE above the scored subtree — NOT a union of the
    subtree with itself. The round-14 union shape printed the scored
    subtree twice and relied on AQE runtime stage reuse to execute the
    pair-aggregation exchange once; that reuse is real on a clean session
    (the r14 CPU halving) but SILENTLY FAILS when the profile is cached
    (e.g. the ANN lane ran earlier in the session and its persisted
    user_day_profile substitutes an InMemoryRelation into both branches:
    measured on Spark 4.1, the final plan then materializes TWO separate
    pair-agg ShuffleQueryStages — the heaviest stage executes twice).
    The explode shape makes single execution STRUCTURAL: the final
    aggregate, both norm joins and the cosine projection appear once in
    the plan, conf- and cache-independent — strictly less work even when
    reuse fires (the union shape ran the norm joins and final-agg read
    once per branch). Row multiset is identical, and the row_number
    window orders totally (sim DESC, other_id), so output is
    bit-identical (test_q106_half_matrix_mirror)."""
    both = sims.select(
        F.inline(
            F.array(
                F.struct(
                    F.col("ua").alias("user_id"),
                    F.col("ub").alias("other_id"),
                    F.col("sim"),
                ),
                F.struct(
                    F.col("ub").alias("user_id"),
                    F.col("ua").alias("other_id"),
                    F.col("sim"),
                ),
            )
        )
    )
    w = Window.partitionBy("user_id").orderBy(F.col("sim").desc(), "other_id")
    return (
        both.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= top_k)
    )


@query(
    "q106_user_similarity",
    oracle=f"""
    WITH uv AS (
      SELECT user_id, CAST(ts AS DATE) AS day,
             SUM(CAST(ROUND(value * 100) AS BIGINT)) AS cents
      FROM events GROUP BY user_id, CAST(ts AS DATE)
    ), norms AS (
      -- zero-norm contract (round-8 -0.0 probe): a user whose every
      -- active day rounds to 0 cents has no direction; cosine is
      -- undefined (0/0 -> ANSI DIVIDE_BY_ZERO on the Spark side), so
      -- such users are excluded from the similarity universe entirely
      SELECT user_id, nrm FROM (
        SELECT user_id, SUM(cents * cents) AS nrm FROM uv GROUP BY user_id
      ) WHERE nrm > 0
    ), dots AS (
      SELECT a.user_id AS ua, b.user_id AS ub, SUM(a.cents * b.cents) AS dot
      FROM uv a JOIN uv b ON a.day = b.day AND a.user_id <> b.user_id
      GROUP BY a.user_id, b.user_id
    ), sims AS (
      SELECT d.ua AS user_id, d.ub AS other_id,
             ROUND(d.dot / (SQRT(na.nrm) * SQRT(nb.nrm)), 6) AS sim
      FROM dots d
      JOIN norms na ON na.user_id = d.ua
      JOIN norms nb ON nb.user_id = d.ub
    )
    SELECT user_id, other_id, sim, CAST(rk AS BIGINT) AS rk FROM (
      SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
                                   ORDER BY sim DESC, other_id) AS rk
      FROM sims
    ) WHERE rk <= {SIM_TOP_K}
    """,
    tags=("similarity", "timeseries", "events"),
)
def q106_user_similarity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k behaviorally similar users: cosine over each user's daily
    activity profile (exact-cents value per active day), computed the
    way distributed time-series similarity search actually scales — as a
    SPARSE inverted-index join, never by materializing dense per-user
    vectors:

    - dot products come from self-joining the (user, day, cents) index
      on day and summing coincident products — zero entries contribute
      nothing and cost nothing, and the join is an equi hash join whose
      per-day fanout is (users active that day)^2, bounded by the
      activity profile rather than the user count;
    - norms are a per-user aggregate of squared cents;
    - all sums are exact integer arithmetic, so the only float ops are
      one sqrt and one division per pair (both correctly-rounded IEEE),
      making the rounded similarity bit-identical across engines. The
      default "widen" envelope mode accumulates norms/dots in
      decimal(38,0) (DuckDB's HUGEINT twin) — exact to ~1e38 with no
      dollar-magnitude assumption baked into an analytic operator; past
      1e38 both engines raise (DuckDB HUGEINT overflow; Spark ANSI
      arithmetic, pinned on by pin_session_conf) — loud, and
      unreachable in practice. Q106_ENVELOPE="strict" keeps the round-4
      behavior: int64 sums guarded by a loud raise at |per-day cents|
      >= 1e8 (products <= 1e16, exact for ~920 active days/user), for
      deployments that want overflow to be an error, not a wider type.
      Both modes are bit-identical in-envelope (decimal->double casts
      are exact below 2^53) — tests/test_skew.py exercises both;
    - the day self-join is SALTED (salted_day_dots above): triangle
      bucket-pair keys bound a hot day's fanout at ~(2*n_day/B)^2 per
      key instead of n_day^2, closing the one quadratic-straggler risk
      this operator had at 100x scale. Pure physical change — the
      oracle is untouched because the result set is provably identical;
    - top-k per user via the rank-filter idiom (WindowGroupLimit)."""
    e = t(spark, sf_dir, "events")
    # profile construction + zero-norm exclusion live in user_day_profile /
    # profile_norms (round-14 extraction), shared verbatim with the ANN
    # lane so both consume one profile contract
    uv, widen = user_day_profile(e)
    norms = profile_norms(uv, widen)
    # HALF-MATRIX pass (optimization round 14): dots, norm joins and the
    # rounded cosine are computed once per UNORDERED pair (the matrix is
    # exactly symmetric: commutative products, order-free exact sums,
    # commutative double multiply in the denominator), then mirrored —
    # the same shape the ANN lane has always used. Halves the rows
    # through the heaviest join+aggregation stage and both norm joins;
    # measured at sf0.1: 75.9 -> 50.0 s executor CPU, 7.7 -> 4.8 s wall
    # (same-session min-of-3). Bit-identical output: the mirror emits
    # exactly the rows the full pass computed for the swapped
    # orientation (test_q106_half_matrix_mirror). The mirror itself is
    # the round-15 explode shape (_mirror_topk) — single execution of
    # the scored subtree is structural, not an AQE stage-reuse bet.
    dots = salted_day_dots(uv, widen, half=True)
    na = norms.select(F.col("user_id").alias("ua"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("user_id").alias("ub"), F.col("nrm").alias("nb"))
    sims = (
        dots.join(na, "ua")
        .join(nb, "ub")
        .select(
            "ua",
            "ub",
            F.round(
                F.col("dot") / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb"))), 6
            ).alias("sim"),
        )
    )
    return _mirror_topk(sims, SIM_TOP_K)


# -- q106 ANN lane: SRP-LSH candidate generation over the sparse profiles ------

# The r13 verdict's "What's missing #1": exact q106 is the one heavy
# operator with a measured single-box scale ceiling — its distinct-pair
# aggregation state (~0.8-0.9 GB/replica) aborted the 128x ladder rung.
# This lane is the relief valve: SRP-LSH banding (the q98 machinery,
# re-derived for SPARSE day profiles) generates candidate pairs whose
# volume is bucket-cap-bounded, then verifies each candidate EXACTLY with
# the same integer-cents arithmetic as q106 — so every returned sim is
# bit-identical to the exact operator's, and only RECALL is approximate.
#
# Contract (the standard ANN contract, FAISS-style): this is a
# THRESHOLD-similarity lane — it recovers HIGH-cosine partners with
# probability 1-(1-(1-acos(s)/pi)^BITS)^BANDS (s=0.95 -> 0.99,
# s=0.9 -> 0.93, s=0.5 -> 0.14 at 8x8). It is NOT a drop-in for exact
# top-k over a near-orthogonal corpus, where the "top" pairs are
# low-cosine and LSH is blind by design; deployments whose top-k matters
# at low similarity keep the exact operator (and its salting). Recall is
# gated on a planted-similar-user corpus in tests/test_skew.py.
Q106_ANN_SALT = "q106-srp-v1:"  # versioned: bump -> fresh hyperplane family
Q106_ANN_BANDS = 8
# Band width is SCALE-ADAPTIVE: bits = max(8, ceil(log2(n_users)) - 3),
# targeting an expected bucket of n / 2^bits ~ 8 users at every corpus
# size (the q98 comment's "at production scale you widen the bands to
# ~log2(n) bits", actually implemented here). With FIXED 8-bit bands the
# lane degenerates at depth — measured on the first 128x ladder attempt:
# 192k users over 256 band values puts ~750 users in every bucket, the
# cap drops ALL of them, and the lane "lands" only by discarding the
# entire corpus. Adaptive bits keep buckets at the design size instead,
# so the cap prunes genuine stragglers, not everything. The cost is the
# usual LSH recall taper for MODERATE similarity as n grows (bands fixed
# at 8: recall at cos 0.9999 stays ~1.0 at any realistic n; at cos 0.9
# it declines with bits — deployments chasing moderate-sim pairs at
# depth raise Q106_ANN_BANDS, the standard knob). At the shipped SFs
# (150/1,500 users) bits floor at 8, i.e. 64 planes — identical to the
# q98 geometry.
Q106_ANN_BAND_BITS_FLOOR = 8
# Same bounded-blocking move as q98/q75: a band bucket larger than this is
# skipped before the self-join, hard-bounding candidate volume at
# bands * (n/1) * cap pairs regardless of corpus size. A saturated band
# value means that band carries no signal there; a genuinely similar
# pair collides in ~bands * p^bits bands in expectation, so losing one
# saturated band rarely loses the pair.
Q106_ANN_BUCKET_CAP = 64


def _ann_band_bits(n_users: int) -> int:
    import math

    if n_users <= 1:
        return Q106_ANN_BAND_BITS_FLOOR
    return max(Q106_ANN_BAND_BITS_FLOOR, math.ceil(math.log2(n_users)) - 3)


def profile_srp_bands(uv: DataFrame, band_bits: int = Q106_ANN_BAND_BITS_FLOOR) -> DataFrame:
    """(user_id, band_idx, band_val) SRP-LSH signature bands over the
    SPARSE (user, day, cents) profile, Q106_ANN_BANDS bands of
    ``band_bits`` planes each.

    q98's dense form precomputes a DIM x PLANES sign matrix as plan
    literals; a daily profile's dimensionality is the (unbounded,
    data-dependent) day domain, so the Rademacher component is derived at
    runtime instead: sign_p(day) = parity of xxhash64(salt_p, day) — a
    deterministic +-1 per (plane, day), identical wherever the day
    appears. Each plane's signed dot is then one exact integer aggregate
    sum(cents * sign_p(day)) per user, all bands*bits planes computed in
    a SINGLE groupBy pass over the profile (map-side-combined long sums —
    no replication of the index, unlike the exact lane's xB salting).
    Sign ties (dot == 0) break to the + side on every row, so signatures
    are engine-deterministic."""
    n_planes = Q106_ANN_BANDS * band_bits

    def sgn(p: int):
        return (
            F.when(
                F.pmod(
                    F.xxhash64(F.lit(f"{Q106_ANN_SALT}{p}"), F.col("day")),
                    F.lit(2),
                )
                == 0,
                F.lit(1),
            )
            .otherwise(F.lit(-1))
            .cast("long")
        )

    dps = uv.groupBy("user_id").agg(
        *[
            F.sum(F.col("cents") * sgn(p)).alias(f"dp{p}")
            for p in range(n_planes)
        ]
    )
    band_structs = []
    for b in range(Q106_ANN_BANDS):
        val = None
        for j in range(band_bits):
            term = F.when(
                F.col(f"dp{b * band_bits + j}") >= 0, F.lit(1 << j)
            ).otherwise(F.lit(0))
            val = term if val is None else val + term
        band_structs.append(
            F.struct(F.lit(b).alias("band_idx"), val.cast("long").alias("band_val"))
        )
    return dps.select(
        "user_id", F.explode(F.array(*band_structs)).alias("band")
    ).select("user_id", "band.band_idx", "band.band_val")


def ann_user_similarity(
    spark: SparkSession, sf_dir: str, top_k: int = SIM_TOP_K
) -> DataFrame:
    """ANN top-k behaviorally similar users — q106's output contract
    (user_id, other_id, sim, rk) served through LSH candidates + exact
    verification, the shape that LANDS at the scale where the exact
    all-coincident-pairs aggregation aborts:

    1. candidates: banded SRP signatures over the sparse profiles
       (profile_srp_bands), hot buckets (> Q106_ANN_BUCKET_CAP) dropped
       via a broadcast anti-join, then an equi self-join on
       (band_idx, band_val) — candidate volume <= bands * n * cap, LINEAR
       in users, vs the exact lane's sum over days of (users active that
       day)^2 pair-aggregation state;
    2. verification: candidates join the (user, day, cents) inverted
       index twice (hash joins on user and (user, day)) and coincident
       products sum in the SAME widened exact-integer arithmetic as
       q106 — dots, norms (profile_norms: zero-norm users excluded), and
       the 6-dp rounded cosine are bit-identical to exact q106 for every
       pair the candidates retain;
    3. top-k: each unordered pair fans to both directions, then the
       rank-filter idiom (WindowGroupLimit) per user.

    Recall is the lane's only approximation, gated on a planted
    similar-user corpus (tests/test_skew.py); the 128x ladder evidence
    lives in NOTES_r14.md. Reference parity: this generalizes the
    reference's dedup mandate (deduper.go:25-47 exact-hash identity) to
    approximate behavioral identity, same as q76/q98 do for documents."""
    e = t(spark, sf_dir, "events")
    uv, widen = user_day_profile(e)
    uv = uv.persist()  # three consumers: sizing count, signatures, verify join
    # scale-adaptive band width (see _ann_band_bits): one aggregate job to
    # size the signature geometry — the lane's analogue of q82's capped-
    # nlist sizing scan, amortized by the persisted profile
    n_users = uv.select("user_id").distinct().count()
    bands = profile_srp_bands(uv, _ann_band_bits(n_users)).persist()
    hot = (
        bands.groupBy("band_idx", "band_val")
        .agg(F.count(F.lit(1)).alias("n_bucket"))
        .filter(F.col("n_bucket") > Q106_ANN_BUCKET_CAP)
        .select("band_idx", "band_val")
    )
    kept = bands.join(F.broadcast(hot), ["band_idx", "band_val"], "left_anti")
    a = kept.alias("a")
    b = kept.alias("b")
    cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select(
            F.col("a.user_id").alias("ua"), F.col("b.user_id").alias("ub")
        )
        .distinct()
    )
    ca, cb = F.col("ca"), F.col("cb")
    if widen:
        ca = ca.cast("decimal(19,0)")
        cb = cb.cast("decimal(19,0)")
    uva = uv.select(
        F.col("user_id").alias("ua"), "day", F.col("cents").alias("ca")
    )
    uvb = uv.select(
        F.col("user_id").alias("ub"), "day", F.col("cents").alias("cb")
    )
    dots = (
        cand.join(uva, "ua")
        .join(uvb, ["ub", "day"])
        .groupBy("ua", "ub")
        .agg(F.sum(ca * cb).alias("dot"))
    )
    norms = profile_norms(uv, widen)
    na = norms.select(F.col("user_id").alias("ua"), F.col("nrm").alias("na"))
    nb = norms.select(F.col("user_id").alias("ub"), F.col("nrm").alias("nb"))
    sims = (
        dots.join(na, "ua")
        .join(nb, "ub")
        .select(
            "ua",
            "ub",
            F.round(
                F.col("dot") / (F.sqrt(F.col("na")) * F.sqrt(F.col("nb"))), 6
            ).alias("sim"),
        )
    )
    return _mirror_topk(sims, top_k)


# -- q131: hard-negative mining ------------------------------------------------

HARDNEG_K = 3


@query(
    "q131_hard_negatives",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qe, label AS ql
      FROM {DUCK_EMB} WHERE vec_id < {N_QUERIES}
    ), pairs AS (
      SELECT query_id, e.vec_id, e.label,
             {duck_cosine_sql("qe", "e.embedding", DIM)} AS sim
      FROM q CROSS JOIN {DUCK_EMB} e
      WHERE e.label <> ql
    )
    SELECT query_id, vec_id, label, sim, rn FROM (
      SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                     ORDER BY sim DESC, vec_id) AS BIGINT) AS rn
      FROM pairs
    ) WHERE rn <= {HARDNEG_K}
    """,
    tags=("llm", "similarity", "contrastive"),
)
def q131_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive training: for each anchor
    (query) vector, the top-{HARDNEG_K} most-similar vectors carrying a
    DIFFERENT label — the pairs that teach an embedding model the most
    (easy negatives are already far away; hard ones sit just across the
    decision boundary). The mirror image of retrieval: q80 ranks
    same-anything neighbors, this ranks nearest WRONG-label neighbors.

    Shape: q80's broadcast-anchors corpus scan with the label inequality
    pushed into the join condition (the corpus side is filtered before
    ranking, not after — at 100 TB that's the difference between ranking
    N and ranking N*(1-1/|labels|) rows... identical asymptotically, but
    the filter rides the broadcast join's generated code for free), then
    the rank-filter top-k (WindowGroupLimit: each task keeps k rows per
    anchor before the window sort). Rounded cosine + vec_id tiebreak
    keep the boundary rows engine-independent."""
    e = emb_t(spark, sf_dir)
    q = e.filter(F.col("vec_id") < N_QUERIES).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
        F.col("label").alias("ql"),
    )
    pairs = (
        F.broadcast(q)
        .join(e, F.col("label") != F.col("ql"))
        .select(
            "query_id",
            "vec_id",
            "label",
            cosine_rounded(F.col("qe"), F.col("embedding")).alias("sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("sim").desc(), "vec_id")
    return (
        pairs.withColumn("rn", F.row_number().over(w).cast("long"))
        .filter(F.col("rn") <= HARDNEG_K)
        .select("query_id", "vec_id", "label", "sim", "rn")
    )
