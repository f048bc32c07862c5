"""Accuracy gates for the approximate operators: the rows-only-checked
queries (q76 MinHash LSH, q82 IVF ANN) are graded by RECALL against their
exact counterparts (q75, q80) — the check the DuckDB oracle can't do for
probabilistic results.
"""

from __future__ import annotations

import math

import pytest

from nsq2kinesis_spark.registry import all_queries

from .conftest import SF_CORRECTNESS

QUERIES = all_queries()


def test_minhash_lsh_recall_vs_exact(spark):
    """q76's verified pairs must recover ≥90% of q75's exact near-dup
    pairs (16 hashes / 8 bands × 2 rows: collision probability at the
    planted dups' j≈0.99 is ≈1 per band; missing any pair is a bug, the
    threshold just allows benign LSH variance on future corpora)."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["q75_neardup_jaccard"].builder(spark, SF_CORRECTNESS).collect()
    }
    lsh = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["q76_neardup_minhash_lsh"].builder(spark, SF_CORRECTNESS).collect()
    }
    assert exact, "exact baseline found no pairs — corpus changed?"
    recall = len(exact & lsh) / len(exact)
    assert recall >= 0.9, f"LSH recall {recall:.2f}: {sorted(exact - lsh)[:5]}"
    # verification stage guarantees no false positives above the threshold
    assert lsh <= exact | lsh  # (candidates already Jaccard-verified)


def test_simhash_pairs_recover_planted_dups(spark):
    """q78's Hamming-banded pairs must cover ≥80% of the exact Jaccard
    pairs — SimHash is the coarser signature (one 60-bit sketch per doc vs
    16 minhash slots), so its bound is looser."""
    exact = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["q75_neardup_jaccard"].builder(spark, SF_CORRECTNESS).collect()
    }
    sim = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["q78_simhash_pairs"].builder(spark, SF_CORRECTNESS).collect()
    }
    recall = len(exact & sim) / len(exact)
    assert recall >= 0.8, f"SimHash recall {recall:.2f}"


def test_ivf_ann_recall_vs_brute_force(spark):
    """q82's average recall vs q80's exact top-k must beat the
    probed-corpus-fraction floor. The synthetic embeddings are
    near-orthogonal (max pairwise cosine ≈0.51 — no cluster structure), so
    on THIS corpus any coarse quantizer's recall is bounded near
    n_probes/n_cells (nearest neighbors scatter uniformly across cells);
    the assertion proves the probe machinery works and the quantizer is at
    least as good as random cell choice. On real clustered embeddings the
    same plan's recall rises with locality, tuned via IVF_PROBES."""
    from collections import defaultdict

    from nsq2kinesis_spark.operators.similarity import (
        IVF_CENTROID_STEP,
        IVF_NLIST_CAP,
        IVF_PROBES,
    )
    from nsq2kinesis_spark.tables import table

    def topk(name):
        per_q = defaultdict(set)
        for r in QUERIES[name].builder(spark, SF_CORRECTNESS).collect():
            per_q[r.query_id].add(r.vec_id)
        return per_q

    exact, ann = topk("q80_cosine_topk"), topk("q82_ann_ivf")
    assert exact
    recalls = [
        len(exact[q] & ann.get(q, set())) / len(exact[q]) for q in exact
    ]
    avg = sum(recalls) / len(recalls)
    n_vecs = table(spark, SF_CORRECTNESS, "embeddings").count()
    # q82's round-12 capped-nlist step: GREATEST(fixed floor, ceil(n/cap))
    step = max(IVF_CENTROID_STEP, -(-n_vecs // IVF_NLIST_CAP))
    n_cells = sum(1 for v in range(n_vecs) if v % step == 0)
    floor = IVF_PROBES / n_cells
    assert avg >= floor, f"IVF avg recall {avg:.2f} below probe floor {floor:.2f}"


def test_misra_gries_survives_capacity_much_smaller_than_vocab(spark):
    """The MG guarantee under real pressure: 16 counters against a
    5000-token vocabulary still retains every true heavy hitter in its
    candidate set (the sf-scale corpus never overflows the default
    capacity, so this is where the decrement path earns its keep)."""
    from pyspark.sql import functions as F

    from nsq2kinesis_spark.operators.aggregates import misra_gries_summaries

    hot = [(f"hot{i}",) for i in range(3) for _ in range(1000)]
    tail = [(f"tail{i}",) for i in range(5000)]
    tokens = spark.createDataFrame(hot + tail, "token string").repartition(4)
    candidates = {
        r.token
        for r in misra_gries_summaries(tokens, capacity=16)
        .groupBy("token")
        .agg(F.sum("lb").alias("lb"))
        .collect()
    }
    assert {"hot0", "hot1", "hot2"} <= candidates
    assert len(candidates) <= 4 * 16  # bounded output per partition
    # exact recount of candidates reproduces the true heavy-hitter set
    n = tokens.count()
    exact = {
        r.token
        for r in tokens.groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") * 8 >= n)
        .collect()
    }
    cand_df = spark.createDataFrame([(c,) for c in candidates], "token string")
    refined = {
        r.token
        for r in tokens.join(F.broadcast(cand_df), "token")
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .filter(F.col("freq") * 8 >= n)
        .collect()
    }
    assert refined == exact == {"hot0", "hot1", "hot2"}


def test_srp_lsh_candidates_bounded_and_enriched(spark):
    """q98's LSH must (a) generate far fewer candidates than all-pairs —
    the 8-bands x 8-bit family's collision rate for this near-orthogonal
    corpus is ~3% (theory: 1-(1-0.5^8)^8 ≈ 0.031) — and (b) be enriched
    in genuinely similar pairs: at least half of ALL pairs with exact
    cosine ≥ 0.45 (computed by brute force here) must appear among the
    candidates, an order of magnitude above the base collision rate.
    Deterministic: fixed hyperplane family, fixed corpus."""
    from nsq2kinesis_spark.operators.similarity import COSINE_T
    from nsq2kinesis_spark.tables import table

    rows = QUERIES["q98_srp_lsh_pairs"].builder(spark, SF_CORRECTNESS).collect()
    n_vecs = table(spark, SF_CORRECTNESS, "embeddings").count()
    all_pairs = n_vecs * (n_vecs - 1) // 2
    frac = len(rows) / all_pairs
    assert frac <= 0.06, f"candidate fraction {frac:.3f} — LSH not pruning"

    from pyspark.sql import functions as F

    from nsq2kinesis_spark.functions.vectors import cosine_rounded

    e = table(spark, SF_CORRECTNESS, "embeddings")
    a = e.select(F.col("vec_id").alias("va"), F.col("embedding").alias("ea"))
    b = e.select(F.col("vec_id").alias("vb"), F.col("embedding").alias("eb"))
    exact = {
        (r.va, r.vb)
        for r in a.join(b, F.col("va") < F.col("vb"))
        .filter(cosine_rounded(F.col("ea"), F.col("eb")) >= COSINE_T)
        .collect()
    }
    assert exact, "corpus has no pairs above threshold — testdata changed?"
    caught = {(r.vec_a, r.vec_b) for r in rows if r.sim >= COSINE_T}
    recall = len(caught & exact) / len(exact)
    assert recall >= 0.5, f"SRP recall {recall:.2f} vs exact {len(exact)} pairs"


def test_srp_bucket_cap_parity_when_cap_bites(spark, duck, monkeypatch):
    """SRP_BUCKET_CAP=64 never fires on the checked corpora (max bucket 11
    at sf0.01), so the standard parity run can't distinguish a broken cap
    from a working one. Force the cap low enough to bite (4) and prove the
    Spark anti-join and the oracle's window-count filter still agree
    exactly — the formulation equivalence the 100 TB path depends on."""
    from nsq2kinesis_spark.operators import similarity as S

    monkeypatch.setattr(S, "SRP_BUCKET_CAP", 4)
    sdf = S.q98_srp_lsh_pairs(spark, SF_CORRECTNESS)
    cols = sorted(sdf.columns)
    srows = sorted(tuple(str(r[c]) for c in cols) for r in sdf.collect())
    con = duck(SF_CORRECTNESS)
    res = con.execute(S._duck_srp_oracle())  # regenerated with the patched cap
    dcols = [d[0] for d in res.description]
    order = sorted(range(len(dcols)), key=lambda i: dcols[i])
    drows = sorted(tuple(str(row[i]) for i in order) for row in res.fetchall())
    assert cols == sorted(dcols)
    assert srows == drows
    # the cap genuinely bit: fewer candidates than the uncapped run's 4462
    assert 0 < len(srows) < 4000, len(srows)


def test_chunk_dedup_invariants(spark):
    """Semantic invariants the DuckDB oracle can't express as one query:
    every kept chunk text is globally unique across the cleaned corpus,
    the lowest-doc_id document keeps exactly its own distinct chunks (no
    earlier doc exists to steal them), and clean_text is always a
    subsequence of the original chunking."""
    from pyspark.sql import functions as F

    from nsq2kinesis_spark.operators.llm_dedup import DEDUP_CHUNK_TOKENS as C

    def chunk_col():
        toks = F.split(F.col("text"), " ")
        n_chunks = F.floor((F.size(toks) + (C - 1)) / C).cast("int")
        return F.transform(
            F.sequence(F.lit(0), n_chunks - 1),
            lambda i: F.array_join(F.slice(toks, i * C + 1, C), " "),
        )

    df = QUERIES["q111_chunk_dedup"].builder(spark, SF_CORRECTNESS).cache()
    d = spark.read.parquet(f"{SF_CORRECTNESS}/documents.parquet")
    try:
        rows = df.collect()
        by_id = {r["doc_id"]: r for r in rows}
        total_chunks = sum(r["n_chunks"] for r in rows)
        total_kept = sum(r["n_kept"] for r in rows)
        assert total_kept < total_chunks  # dedup actually removed something
        # the lowest doc_id keeps one occurrence of each of its own distinct
        # chunks — derived from the data, not assumed (intra-doc repeats
        # after the first are removed even in the first document)
        first_id = min(by_id)
        first_doc = d.filter(F.col("doc_id") == first_id).select(
            F.explode(chunk_col()).alias("chunk")
        )
        assert by_id[first_id]["n_kept"] == first_doc.distinct().count()
        # kept counts bound: 0 <= n_kept <= n_chunks, and clean_text token
        # count is at most n_kept full chunks (final chunk may be short)
        for r in rows:
            assert 0 <= r["n_kept"] <= r["n_chunks"]
            n_tokens = len(r["clean_text"].split(" ")) if r["clean_text"] else 0
            assert n_tokens <= r["n_kept"] * C
        # global uniqueness, checked exactly: the number of distinct chunk
        # texts in the corpus equals the number of kept chunks
        n_distinct = (
            d.select(F.explode(chunk_col()).alias("chunk")).distinct().count()
        )
        assert n_distinct == total_kept
    finally:
        df.unpersist()


def test_pii_redaction_leaves_no_pii_behind(spark):
    """After redaction, none of the three PII patterns can match anywhere
    in any document — the property the per-pattern counts can't prove
    (a replacement that *rewrites* but doesn't *remove* a span would still
    count correctly)."""
    from pyspark.sql import functions as F

    from nsq2kinesis_spark.operators.llm_text import (
        PII_EMAIL_RE,
        PII_IPV4_RE,
        PII_LONGNUM_RE,
    )

    df = QUERIES["q110_pii_redaction"].builder(spark, SF_CORRECTNESS)
    leftovers = df.filter(
        (F.regexp_count("redacted", F.lit(PII_EMAIL_RE)) > 0)
        | (F.regexp_count("redacted", F.lit(PII_IPV4_RE)) > 0)
        | (F.regexp_count("redacted", F.lit(PII_LONGNUM_RE)) > 0)
    ).count()
    assert leftovers == 0
    # and the detector did fire: planted spans were found
    tot = df.agg(
        F.sum("n_emails").alias("e"), F.sum("n_ips").alias("i"), F.sum("n_longnums").alias("n")
    ).collect()[0]
    assert tot["e"] > 0 and tot["i"] > 0 and tot["n"] > 0


def _q118_unblocked_pairs(spark, sf_dir):
    """Ground truth for q118: the O(n^2) cross join the blocking exists to
    avoid — every (a < b) customer pair within Levenshtein distance 1."""
    from pyspark.sql import functions as F

    from nsq2kinesis_spark.tables import table

    c = table(spark, sf_dir, "customer").select("c_custkey", "c_name")
    a = c.select(
        F.col("c_custkey").alias("custkey_a"), F.col("c_name").alias("name_a")
    )
    b = c.select(
        F.col("c_custkey").alias("custkey_b"), F.col("c_name").alias("name_b")
    )
    return (
        a.crossJoin(b)
        .filter(F.col("custkey_a") < F.col("custkey_b"))
        .filter(F.levenshtein(F.col("name_a"), F.col("name_b")) <= 1)
        .select("custkey_a", "custkey_b")
    )


def _assert_q118_lossless(spark, sf_dir):
    got = {
        (r.custkey_a, r.custkey_b)
        for r in QUERIES["q118_fuzzy_match"].builder(spark, sf_dir).collect()
    }
    truth = {
        (r.custkey_a, r.custkey_b)
        for r in _q118_unblocked_pairs(spark, sf_dir).collect()
    }
    missed = truth - got
    extra = got - truth
    assert truth, "ground truth empty — test data regressed"
    assert not missed, f"blocking lost {len(missed)}/{len(truth)} true pairs"
    assert not extra, f"blocking invented {len(extra)} pairs"


def test_q118_blocking_is_lossless(spark):
    """The round-4 prefix block missed 31% of true distance-1 pairs; the
    symmetric-delete replacement must find EXACTLY the unblocked join's
    pairs (the q94 losslessness standard)."""
    from .conftest import SF_SMOKE

    _assert_q118_lossless(spark, SF_SMOKE)


@pytest.mark.slow
def test_q118_blocking_is_lossless_at_sf001(spark):
    """Same zero-missed-pairs assertion at sf0.01 — the scale where the
    old prefix block measurably lost 6,000 of 19,500 true pairs."""
    _assert_q118_lossless(spark, SF_CORRECTNESS)


@pytest.mark.slow
def test_q133_prefix_pruning_bites(spark):
    """The prefix filter must generate strictly fewer candidate pairs than
    the naive any-shared-token inverted index (the all-pairs baseline its
    lemma prunes), while the oracle-parity gate separately proves it
    still finds EVERY qualifying pair (the oracle is the unfiltered
    ground truth). This pins the 'filter actually prunes' half.

    Marked slow: the naive baseline is BY CONSTRUCTION an uncapped
    any-shared-token self-join — quadratic in the hottest posting list —
    so it stays out of the default lane where a grown fixture corpus
    would make it the suite's first quadratic blowup."""
    from pyspark.sql import functions as F

    from nsq2kinesis_spark.operators.llm_dedup import raw_postings

    sh = raw_postings(spark, SF_CORRECTNESS)
    # naive candidate count: pairs sharing ANY token
    naive = (
        sh.alias("a")
        .join(sh.alias("b"), "shingle")
        .filter(F.col("a.doc_id") < F.col("b.doc_id"))
        .select(F.col("a.doc_id"), F.col("b.doc_id"))
        .distinct()
        .count()
    )
    # prefix candidate count: the SHIPPED candidate stage (shared helper,
    # so this test can never drift from what q133 actually runs)
    from nsq2kinesis_spark.operators.llm_dedup import pp_candidates

    cands = pp_candidates(sh).count()
    assert cands < naive // 2, (cands, naive)
    assert cands > 0


def test_q133_docsets_are_a_projection_of_pp_ordered(spark):
    """Round-15 restructure pin: q133's verification docsets are derived
    from the shared pp_ordered aggregate (transform(toks, t -> t.shingle),
    n) instead of a separate collect_set scan — so the corpus is shingled
    once for the whole PPJoin pipeline. This holds only while postings are
    DISTINCT per doc and the df join drops no rows; pin both by comparing
    the projection against an independent collect_set build per doc."""
    from pyspark.sql import functions as F

    from nsq2kinesis_spark.operators.llm_dedup import pp_ordered, raw_postings

    sh = raw_postings(spark, SF_CORRECTNESS)
    via_ordered = {
        r.doc_id: (frozenset(r.sset), r.n)
        for r in pp_ordered(sh)
        .select(
            "doc_id",
            F.expr("transform(toks, t -> t.shingle)").alias("sset"),
            "n",
        )
        .collect()
    }
    via_collect_set = {
        r.doc_id: (frozenset(r.sset), r.n)
        for r in sh.groupBy("doc_id")
        .agg(
            F.collect_set("shingle").alias("sset"),
            F.count("*").cast("long").alias("n"),
        )
        .collect()
    }
    assert via_ordered == via_collect_set
    # and n really is the set size (distinctness of postings per doc)
    assert all(len(s) == n for s, n in via_ordered.values())


def test_corpus_size_probe_reads_directory_footers(spark, tmp_path):
    """The sizes-broadcast guard must learn the corpus row count from
    parquet FOOTERS for both layouts the engine serves — the driver's
    single-file testdata AND the directory-of-part-files layout
    ``df.write.parquet`` produces — without launching a Spark job (the
    fallback count would otherwise land inside the first caller's timed
    region and confound the dedup-family bench samples)."""
    from nsq2kinesis_spark.operators.llm_dedup import (
        _CORPUS_SIZE_MEMO,
        _corpus_is_dimension_sized,
    )
    from nsq2kinesis_spark.tables import table

    docs = table(spark, SF_CORRECTNESS, "documents")
    n_expected = docs.count()
    sf_dir = str(tmp_path)
    docs.repartition(3).write.parquet(f"{sf_dir}/documents.parquet")

    before = sorted(spark.sparkContext.statusTracker().getJobIdsForGroup())
    assert _corpus_is_dimension_sized(spark, sf_dir) is True
    assert _CORPUS_SIZE_MEMO[sf_dir] == n_expected
    # footer path: no Spark job may have run during the probe
    after = sorted(spark.sparkContext.statusTracker().getJobIdsForGroup())
    assert before == after, "directory probe launched a Spark job"


def test_corpus_size_probe_handles_partitioned_and_empty_layouts(spark, tmp_path):
    """Round-7 hardening: a ``partitionBy()`` layout nests part files in
    key=value subdirectories — a top-level glob undercounts it to 0 and
    silently classifies a corpus-sized table as dimension-sized (the
    broadcast-a-100TB-table failure). The probe must recurse; and a
    directory with no part files at all (only _SUCCESS) must fall back
    to the Spark count rather than report 0."""
    from nsq2kinesis_spark.operators.llm_dedup import (
        _CORPUS_SIZE_MEMO,
        _corpus_is_dimension_sized,
    )
    from nsq2kinesis_spark.tables import table

    docs = table(spark, SF_CORRECTNESS, "documents")
    n_expected = docs.count()

    part_dir = str(tmp_path / "partitioned")
    (tmp_path / "partitioned").mkdir()
    docs.write.partitionBy("lang").parquet(f"{part_dir}/documents.parquet")
    assert _corpus_is_dimension_sized(spark, part_dir) is True
    assert _CORPUS_SIZE_MEMO[part_dir] == n_expected

    # footer-only directory (no data files): must NOT memoize 0
    empty_dir = str(tmp_path / "footerless")
    (tmp_path / "footerless").mkdir()
    (tmp_path / "footerless" / "documents.parquet").mkdir()
    (tmp_path / "footerless" / "documents.parquet" / "_SUCCESS").touch()
    import shutil

    for name in ("region nation customer supplier part orders lineitem "
                 "events embeddings").split():
        shutil.copy(f"{SF_CORRECTNESS}/{name}.parquet",
                    f"{empty_dir}/{name}.parquet")
    try:
        n = _corpus_is_dimension_sized(spark, empty_dir)
    except Exception:
        # an empty parquet dir may legitimately fail the Spark read;
        # the contract is only that it never silently memoizes 0
        n = None
    assert _CORPUS_SIZE_MEMO.get(empty_dir, None) != 0, (
        "footerless directory memoized a zero corpus size", n)


def test_q118_blocking_lossless_on_random_adversarial_corpus(spark, tmp_path):
    """The symmetric-delete completeness proof is distribution-free; the
    fixture tests only exercise the 'Customer#...' name shape. This runs
    the SHIPPED q118 builder over a seeded random corpus engineered to be
    adversarial for blocking schemes — a 2-letter alphabet at lengths
    3-7, so distance-1 pairs are dense, many pairs share several deletion
    keys (DISTINCT dedup path), and length-crossing insert/delete pairs
    abound — and checks it against an O(n^2) pure-Python Levenshtein
    ground truth."""
    import random

    rng = random.Random(20260814)
    names = sorted({  # distinct names: identical strings are dist-0 noise
        "".join(rng.choice("ab") for _ in range(rng.randint(3, 7)))
        for _ in range(400)
    })
    sf_dir = str(tmp_path / "sf")
    spark.createDataFrame(
        [(i, n) for i, n in enumerate(names)], "c_custkey long, c_name string"
    ).coalesce(1).write.parquet(f"{sf_dir}/customer.parquet")

    def lev(s, t):
        if len(s) < len(t):
            s, t = t, s
        prev = list(range(len(t) + 1))
        for i, cs in enumerate(s, 1):
            cur = [i]
            for j, ct in enumerate(t, 1):
                cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                               prev[j - 1] + (cs != ct)))
            prev = cur
        return prev[-1]

    truth = {
        (i, j)
        for i in range(len(names))
        for j in range(i + 1, len(names))
        if lev(names[i], names[j]) <= 1
    }
    got = {
        (r.custkey_a, r.custkey_b)
        for r in QUERIES["q118_fuzzy_match"].builder(spark, sf_dir).collect()
    }
    assert truth, "random corpus produced no distance-1 pairs — tighten it"
    assert got == truth, (
        f"missed {len(truth - got)}, invented {len(got - truth)} "
        f"of {len(truth)} true pairs"
    )


def test_q133_ppjoin_exact_on_random_corpus(spark, tmp_path):
    """The prefix-filtering lemma, checked distribution-free: the shipped
    q133 builder over a seeded random corpus (150 random docs from a
    30-token vocab plus 40 planted single-token mutations — so true
    pairs exist at varied sizes, not just the fixtures' templated
    near-dups) must return EXACTLY the Jaccard >= 1/2 pairs computed by
    a brute-force Python ground truth over trigram-shingle sets. Unlike
    the sf-parity rows this also varies doc lengths 5-15 and lets ties
    in document frequency fall where they may (the lemma needs only a
    CONSISTENT total order, which the (df, shingle) sort provides)."""
    import random

    rng = random.Random(20260814)
    vocab = [f"w{i}" for i in range(30)]
    docs = [
        [rng.choice(vocab) for _ in range(rng.randint(5, 15))]
        for _ in range(150)
    ]
    for _ in range(40):  # planted near-dups: copy + mutate one token
        base = rng.choice(docs[:150])
        mut = list(base)
        mut[rng.randrange(len(mut))] = rng.choice(vocab)
        docs.append(mut)
    sf_dir = str(tmp_path / "sf")
    spark.createDataFrame(
        [(i, " ".join(d), "en", "rand", len(" ".join(d))) for i, d in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    shingles = [
        {" ".join(d[i : i + 3]) for i in range(len(d) - 2)} for d in docs
    ]
    truth = set()
    for i in range(len(docs)):
        if not shingles[i]:
            continue
        for j in range(i + 1, len(docs)):
            if not shingles[j]:
                continue
            inter = len(shingles[i] & shingles[j])
            union = len(shingles[i] | shingles[j])
            if inter * 2 >= union:
                truth.add((i, j))
    got = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["q133_ppjoin"].builder(spark, sf_dir).collect()
    }
    assert truth, "random corpus produced no qualifying pairs — tighten it"
    assert got == truth, (
        f"missed {len(truth - got)}, invented {len(got - truth)} "
        f"of {len(truth)} true pairs"
    )


def test_q133_prefix_filter_immune_to_universal_hot_token(spark, tmp_path):
    """The economic case for prefix filtering: a token present in EVERY
    document makes the naive any-shared-token index quadratic (every doc
    pair is a candidate), while rarest-first prefixes exclude the hot
    token from indexing entirely — its df is maximal, so it sorts last
    and never lands in any prefix once docs have enough rarer tokens.
    200 docs sharing one universal trigram must produce candidates that
    scale with the TRUE pair count, not n^2/2, and results must still be
    exact vs brute force."""
    import random

    rng = random.Random(99)
    # every doc starts with the same 5 tokens (=> 3 universal trigrams),
    # then a per-doc distinct tail twice as long (rare tokens) — prefix
    # length ~ n/2 stays inside the tail, so hot trigrams are never indexed
    docs = []
    for i in range(200):
        tail = [f"d{i}_t{k}" for k in range(10)]
        docs.append(["hot0", "hot1", "hot2", "hot3", "hot4"] + tail)
    for _ in range(10):  # a few true near-dup pairs via tail copy
        base = rng.randrange(200)
        mut = list(docs[base])
        mut[7] = "mutated"
        docs.append(mut)
    sf_dir = str(tmp_path / "sf")
    spark.createDataFrame(
        [(i, " ".join(d), "en", "rand", len(" ".join(d))) for i, d in enumerate(docs)],
        "doc_id long, text string, lang string, source string, n_chars long",
    ).coalesce(1).write.parquet(f"{sf_dir}/documents.parquet")

    from nsq2kinesis_spark.operators.llm_dedup import pp_candidates, raw_postings

    n = len(docs)
    cands = pp_candidates(raw_postings(spark, sf_dir)).count()
    # naive any-shared-token candidates = every pair (universal trigrams)
    assert cands < (n * (n - 1) // 2) // 20, (
        f"{cands} candidates — the hot token leaked into prefixes"
    )

    shingles = [
        {" ".join(d[i : i + 3]) for i in range(len(d) - 2)} for d in docs
    ]
    truth = {
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if 2 * len(shingles[i] & shingles[j])
        >= len(shingles[i] | shingles[j])
    }
    got = {
        (r.doc_a, r.doc_b)
        for r in QUERIES["q133_ppjoin"].builder(spark, sf_dir).collect()
    }
    assert truth and got == truth


def test_min_label_components_on_synthetic_graphs(spark):
    """The iterative core of q89, now factored as min_label_components,
    on graph shapes the near-dup fixtures never produce: a long chain
    (max rounds = eccentricity of the min node — the convergence-probe
    stress), a cycle, a star, and a seeded random graph, each checked
    against a pure-Python union-find ground truth."""
    import random

    def uf_truth(edges):
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in edges:
            ra, rb = find(a), find(b)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        return {x: find(x) for x in parent}

    from nsq2kinesis_spark.operators.llm_dedup import min_label_components

    rng = random.Random(7)
    chain = [(i, i + 1) for i in range(30)]          # diameter 30
    cycle = [(100 + i, 100 + (i + 1) % 12) for i in range(12)]
    star = [(200, 200 + i) for i in range(1, 20)]
    rand = [
        (300 + rng.randrange(40), 300 + rng.randrange(40)) for _ in range(60)
    ]
    rand = [(a, b) for a, b in rand if a != b]
    edges = chain + cycle + star + rand
    truth = uf_truth(edges)
    got = {
        r.doc_id: r.component
        for r in min_label_components(
            spark.createDataFrame(edges, "doc_a long, doc_b long")
        ).collect()
    }
    assert got == truth


def test_min_label_components_raises_when_rounds_exhausted(spark):
    """Exhausting max_iters must RAISE, not return wrong labels. With
    star contraction the guard is a true pathology bound — a 12-chain
    that the old min-label loop needed 12 rounds for now converges well
    inside single digits, so only an absurd cap can trip it."""
    from nsq2kinesis_spark.operators.llm_dedup import min_label_components

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(12)], "doc_a long, doc_b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        min_label_components(chain, max_iters=1)
    labels = min_label_components(chain, max_iters=8).collect()
    assert all(r.component == 0 for r in labels)


def test_star_contraction_converges_logarithmically_on_long_chain(spark):
    """The round-9 upgrade's reason to exist: a 1000-node chain — the
    adversarial borderline-near-dup shape that the old O(diameter)
    min-label loop would REFUSE at CC_MAX_ITERS=50 — must converge
    within ~2·log₂(n) ≈ 20 alternations and still label every node with
    the component minimum."""
    from nsq2kinesis_spark.operators.llm_dedup import min_label_components

    n = 1000
    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )
    labels = min_label_components(chain, max_iters=20).collect()
    assert len(labels) == n
    assert all(r.component == 0 for r in labels)
