"""Salted-join skew mitigation: result equivalence + spread verification."""

from __future__ import annotations

from pyspark.sql import functions as F

from nsq2kinesis_spark.functions.skew import SALT_COL, salted_join, with_salt
from nsq2kinesis_spark.tables import table


def test_salted_inner_join_equals_plain_join(spark):
    li = table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_partkey", "l_quantity"
    )
    o = table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_orderdate"
    ).withColumnRenamed("o_orderkey", "l_orderkey")
    plain = li.join(o, ["l_orderkey"]).groupBy("l_orderkey").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("q")
    )
    salted = salted_join(li, o, ["l_orderkey"], n_salts=8).groupBy("l_orderkey").agg(
        F.count("*").alias("n"), F.sum("l_quantity").alias("q")
    )
    assert sorted(map(tuple, plain.collect())) == sorted(map(tuple, salted.collect()))


def test_salted_left_join_preserves_unmatched(spark):
    a = spark.createDataFrame([(1, "x"), (2, "y"), (3, "z")], "k int, v string")
    b = spark.createDataFrame([(1, 10), (1, 11)], "k int, w int")
    out = salted_join(a, b, ["k"], n_salts=4, how="left")
    rows = sorted((r.k, r.v, r.w) for r in out.collect())
    assert rows == [(1, "x", 10), (1, "x", 11), (2, "y", None), (3, "z", None)]


def test_salt_spreads_hot_key(spark):
    # one key, 10k rows: salted partitioning must use >1 distinct salt
    hot = spark.range(10_000).select(F.lit(1).alias("k"), F.col("id"))
    n_distinct = with_salt(hot, 16).select(SALT_COL).distinct().count()
    assert n_distinct > 8  # the hot key now spans most of the 16 sub-keys


def _planted_hot_day(spark, n_users=96):
    """One hot day shared by every user (the q106 straggler scenario) plus
    a second quiet day for a handful of them."""
    rows = [(u, "2024-01-01", (u % 7) + 1) for u in range(n_users)]
    rows += [(u, "2024-01-02", u + 1) for u in range(5)]
    return spark.createDataFrame(
        rows, "user_id long, day string, cents long"
    ).withColumn("day", F.to_date("day"))


def test_q106_salted_dots_exact(spark):
    """The triangle-salted day self-join must return EXACTLY the plain
    join's dot products — salting is a physical change only."""
    from nsq2kinesis_spark.operators.similarity import salted_day_dots

    uv = _planted_hot_day(spark)
    a = uv.select(F.col("user_id").alias("ua"), "day", F.col("cents").alias("ca"))
    b = uv.select(F.col("user_id").alias("ub"), "day", F.col("cents").alias("cb"))
    plain = (
        a.join(b, "day")
        .filter(F.col("ua") != F.col("ub"))
        .groupBy("ua", "ub")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
    )
    for widen in (False, True):
        got = sorted(
            (r.ua, r.ub, int(r.dot))
            for r in salted_day_dots(uv, widen=widen).collect()
        )
        assert got == sorted(
            (r.ua, r.ub, int(r.dot)) for r in plain.collect()
        ), f"widen={widen}"


def test_q106_salting_bounds_hot_day_fanout(spark):
    """Under a planted hot day (n users all active), no single join key may
    carry the full n^2 candidate product: the triangle scheme caps each
    (day, lo, hi) key's A-side rows at ~2n/B, so per-key candidate work is
    ~(2n/B)^2 << n^2."""
    from nsq2kinesis_spark.operators.similarity import (
        Q106_DAY_BUCKETS as B,
        salted_day_dots,
    )

    n = 96
    uv = _planted_hot_day(spark, n_users=n)
    # reconstruct the exploded key frame exactly as salted_day_dots builds it
    g = F.pmod(F.xxhash64(F.col("user_id")), F.lit(B)).cast("int")
    keyed = (
        uv.withColumn("g", g)
        .withColumn("j", F.explode(F.sequence(F.lit(0), F.lit(B - 1))))
        .select(
            "day",
            F.least("g", "j").alias("lo"),
            F.greatest("g", "j").alias("hi"),
        )
    )
    per_key = keyed.groupBy("day", "lo", "hi").count()
    worst = max(r["count"] for r in per_key.collect())
    # per-key side size is bounded by the two buckets meeting there; with a
    # fair hash that's ~2n/B (allow 2x slack for hash imbalance), so the
    # worst per-key candidate count is (worst)^2 ≈ (2n/B)^2, far below n^2
    assert worst <= 4 * n // B, f"hot-day key carries {worst} rows (n={n}, B={B})"
    # and the salted join still computes every hot-day pair
    assert salted_day_dots(uv, widen=True).count() == n * (n - 1)


def test_q106_mirror_single_dots_execution(spark):
    """Round-15 pin (VERDICT r14 item 3): q106's half-matrix is cheap
    only while the salted-join + pair-aggregation subtree executes ONCE
    under the mirror. The round-14 union mirror relied on AQE runtime
    stage reuse for that — and a first version of this pin found the
    reuse SILENTLY FAILS when the profile is cached (the ANN lane's
    persisted user_day_profile substitutes an InMemoryRelation into both
    union branches; Spark 4.1 then materializes TWO separate pair-agg
    ShuffleQueryStages — the heaviest stage ran twice, with no test red).
    The mirror is now an inline(array(..)) row-doubling Generate
    (_mirror_topk), so single execution is STRUCTURAL; this pins it on
    the EXECUTED plan in BOTH session states that used to differ:

    - clean cache (the bench/driver state), and
    - after the ANN lane has persisted the profile (the state that broke
      stage reuse under the union shape).

    In each, the dots exchange (hashpartitioning on (ua, ub) carrying
    the dot partial-sum state) must appear exactly once in the final
    adaptive plan — materialized, never duplicated, no ReusedExchange
    needed."""
    import re

    from nsq2kinesis_spark.operators.similarity import ann_user_similarity
    from nsq2kinesis_spark.registry import all_queries

    def dots_exchange_count() -> int:
        df = all_queries()["q106_user_similarity"].builder(
            spark, "/root/testdata/sf0.001"
        )
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        # the executed string prints "== Final Plan ==" then "== Initial
        # Plan ==" — only the final section states what actually ran
        final = plan.split("== Initial Plan ==")[0]
        return len(re.findall(r"Exchange hashpartitioning\(ua#\d+L?, ub#\d+", final))

    spark.catalog.clearCache()
    assert dots_exchange_count() == 1
    # arm the cached-profile state (what an earlier ANN-lane build leaves
    # behind in a shared session), then re-check
    ann_user_similarity(spark, "/root/testdata/sf0.001")
    try:
        assert dots_exchange_count() == 1
    finally:
        spark.catalog.clearCache()


def test_q106_half_matrix_mirror(spark):
    """The round-14 half-matrix optimization: salted_day_dots(half=True)
    emits each unordered pair exactly once (ua < ub), and mirroring it
    reproduces the full both-directions matrix bit-for-bit — the
    equivalence q106 relies on to push half the rows through its
    heaviest join+aggregation stage."""
    from nsq2kinesis_spark.operators.similarity import salted_day_dots

    uv = _planted_hot_day(spark)
    for widen in (False, True):
        full = sorted(
            (r.ua, r.ub, int(r.dot))
            for r in salted_day_dots(uv, widen=widen).collect()
        )
        half_rows = salted_day_dots(uv, widen=widen, half=True).collect()
        assert all(r.ua < r.ub for r in half_rows), f"widen={widen}"
        mirrored = sorted(
            [(r.ua, r.ub, int(r.dot)) for r in half_rows]
            + [(r.ub, r.ua, int(r.dot)) for r in half_rows]
        )
        assert mirrored == full, f"widen={widen}"


def test_q106_envelope_modes(spark, tmp_path, monkeypatch):
    """Out-of-envelope data (> $1M/day of per-user cents): strict mode must
    raise loudly; the default widen mode must return the exact decimal
    result — the documented decimal(38,0) fallback is automatic, not a
    code edit."""
    import pytest as _pytest

    from nsq2kinesis_spark.operators import similarity as sim

    # two users, one shared day, each summing to 2e9 cents ($20M) — far past
    # the strict int64 envelope's 1e8 guard but trivially exact in decimal
    rows = [
        (i, "2024-03-0%d 00:00:00" % (1 + i % 2), u, "purchase", 1e7, "{}")
        for i in range(800)
        for u in (1, 2)
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string, value double, props string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/events.parquet")

    build = sim.q106_user_similarity
    monkeypatch.setattr(sim, "Q106_ENVELOPE", "strict")
    with _pytest.raises(Exception, match="int64-exactness envelope"):
        build(spark, sf_dir).collect()

    monkeypatch.setattr(sim, "Q106_ENVELOPE", "widen")
    out = {(r.user_id, r.other_id): r.sim for r in build(spark, sf_dir).collect()}
    # identical daily profiles -> cosine exactly 1.0 for both directions
    assert out == {(1, 2): 1.0, (2, 1): 1.0}


def test_decimal_moment_overflow_behavior(spark):
    """Pin the documented q114/q119/q120/q106 boundary semantics: past
    ~1e38 the decimal(38,0) wide lanes RAISE (ANSI arithmetic, pinned on
    by pin_session_conf) — matching DuckDB's HUGEINT error, never a
    silent non-ANSI NULL that a downstream filter would drop."""
    from decimal import Decimal

    import pytest as _pytest

    from nsq2kinesis_spark.session import pin_session_conf

    pin_session_conf(spark)
    df = spark.createDataFrame(
        [(Decimal(10**19),), (Decimal(10**9),)], "v decimal(38,0)"
    ).select((F.col("v") * F.col("v")).alias("sq"))
    with _pytest.raises(Exception, match="NUMERIC_VALUE_OUT_OF_RANGE"):
        df.collect()
    ok = spark.createDataFrame(
        [(Decimal(10**9),)], "v decimal(38,0)"
    ).select((F.col("v") * F.col("v")).alias("sq"))
    assert [int(r.sq) for r in ok.collect()] == [10**18]


def test_q106_salted_dots_exact_on_random_corpus(spark):
    """Triangle-salting exactness on a seeded RANDOM activity matrix (the
    planted-hot-day test covers one adversarial shape): 150 users x 12
    days with ~40% random fill, signed cents including zeros, and enough
    users that every unordered bucket pair (lo, hi) — including the
    g==j diagonal and hash-collision user pairs — actually carries
    traffic. Salted dots must equal the plain join's bit-for-bit in both
    envelope modes."""
    import random

    from nsq2kinesis_spark.operators.similarity import salted_day_dots

    rng = random.Random(20260814)
    rows = [
        (u, f"2024-02-{d + 1:02d}", rng.randint(-500, 500))
        for u in range(150)
        for d in range(12)
        if rng.random() < 0.4
    ]
    uv = spark.createDataFrame(
        rows, "user_id long, day string, cents long"
    ).withColumn("day", F.to_date("day"))
    a = uv.select(F.col("user_id").alias("ua"), "day", F.col("cents").alias("ca"))
    b = uv.select(F.col("user_id").alias("ub"), "day", F.col("cents").alias("cb"))
    plain = sorted(
        (r.ua, r.ub, int(r.dot))
        for r in a.join(b, "day")
        .filter(F.col("ua") != F.col("ub"))
        .groupBy("ua", "ub")
        .agg(F.sum(F.col("ca") * F.col("cb")).alias("dot"))
        .collect()
    )
    assert plain, "random fill produced no coincident-day pairs"
    for widen in (False, True):
        got = sorted(
            (r.ua, r.ub, int(r.dot))
            for r in salted_day_dots(uv, widen=widen).collect()
        )
        assert got == plain, f"widen={widen}"


# -- round 14: the q106 ANN lane (SRP-LSH over sparse daily profiles) ----------


def _planted_similar_users(spark, tmp_path, n_pairs=40, n_background=150,
                           n_days=30, seed=20260817):
    """Synthetic events corpus with PLANTED behaviorally-identical user
    pairs — the ivf_natural_corpus pattern transplanted to q106's domain.
    Each planted partner's daily profile is its twin's plus ~1% relative
    noise (cosine ~ 0.9999); background users draw independent zero-mean
    profiles, whose pairwise cosines concentrate near 0 (sd ~ 1/sqrt(30)),
    so every planted user's exact top-1 is its partner by a wide margin."""
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = []
    eid = 0

    def emit(user, profile):
        nonlocal eid
        for d in range(n_days):
            c = int(profile[d])
            if c == 0:
                continue
            rows.append(
                (eid, f"2024-03-{d + 1:02d} 12:00:00", user, "purchase",
                 c / 100.0, "{}")
            )
            eid += 1

    for p in range(n_pairs):
        base = rng.integers(-10_000, 10_000, size=n_days)
        noise = np.rint(base * rng.normal(0, 0.01, size=n_days)).astype(int)
        emit(2 * p, base)
        emit(2 * p + 1, base + noise)
    for u in range(n_background):
        emit(10_000 + u, rng.integers(-10_000, 10_000, size=n_days))

    df = spark.createDataFrame(
        rows,
        "event_id long, ts string, user_id long, event_type string, "
        "value double, props string",
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    sf_dir = str(tmp_path)
    df.write.parquet(f"{sf_dir}/events.parquet")
    return sf_dir, n_pairs


def test_ann_lane_planted_partner_recall(spark, tmp_path):
    """The lane's recall gate (r13 verdict task #2): on a corpus with real
    near-identical behavioral twins, the SRP-LSH candidates + exact
    verification must recover each planted user's partner at rank 1 —
    >= 90% gated (theory: >= 1-of-8-bands collision at cos ~ 0.9999 is
    ~1-3e-12, so the gate's slack covers only profile-noise tail cases).
    And every (user, other, sim) the lane returns must carry the sim the
    EXACT operator computes — verification is exact by construction."""
    from nsq2kinesis_spark.operators.similarity import (
        ann_user_similarity,
        q106_user_similarity,
    )

    sf_dir, n_pairs = _planted_similar_users(spark, tmp_path)
    ann = ann_user_similarity(spark, sf_dir)
    top1 = {
        r.user_id: r.other_id for r in ann.filter(F.col("rk") == 1).collect()
    }
    planted = [(2 * p, 2 * p + 1) for p in range(n_pairs)]
    hits = sum(
        1
        for a, b in planted
        if top1.get(a) == b and top1.get(b) == a
    )
    recall = hits / n_pairs
    assert recall >= 0.90, f"planted-partner recall {recall:.2f}"

    exact = {
        (r.user_id, r.other_id): r.sim
        for r in q106_user_similarity(spark, sf_dir).collect()
    }
    got = {(r.user_id, r.other_id): r.sim for r in ann.collect()}
    shared = set(got) & set(exact)
    assert shared, "ANN and exact top-k share no pairs?"
    mism = [k for k in shared if got[k] != exact[k]]
    assert not mism, f"ANN sims drifted from exact on {mism[:5]}"


def test_ann_lane_candidate_volume_is_cap_bounded(spark):
    """The blocking lemma, measured: post-cap candidate pairs never exceed
    bands * n_users * cap (each kept signature row meets <= cap partners
    in its bucket) — the bound that makes the lane LINEAR in users where
    the exact lane's pair state grows with sum(day_activity^2). Checked on
    the shipped sf0.01 corpus."""
    from nsq2kinesis_spark.operators.similarity import (
        Q106_ANN_BANDS,
        Q106_ANN_BUCKET_CAP,
        profile_srp_bands,
        user_day_profile,
    )
    from nsq2kinesis_spark.tables import table as t

    uv, _ = user_day_profile(t(spark, "/root/testdata/sf0.01", "events"))
    n_users = uv.select("user_id").distinct().count()
    bands = profile_srp_bands(uv)
    hot = (
        bands.groupBy("band_idx", "band_val")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > Q106_ANN_BUCKET_CAP)
    )
    kept = bands.join(
        F.broadcast(hot.select("band_idx", "band_val")),
        ["band_idx", "band_val"],
        "left_anti",
    )
    a, b = kept.alias("a"), kept.alias("b")
    n_cand = (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_val") == F.col("b.band_val"))
            & (F.col("a.user_id") < F.col("b.user_id")),
        )
        .select("a.user_id", "b.user_id")
        .distinct()
        .count()
    )
    assert n_cand <= Q106_ANN_BANDS * n_users * Q106_ANN_BUCKET_CAP
    # and far below all-pairs on this corpus
    assert n_cand < n_users * (n_users - 1) / 2


def test_ann_lane_output_contract_matches_q106(spark):
    """Schema + shape parity with the exact operator on the shipped
    corpus: same columns, same per-user row budget, rk dense from 1."""
    from nsq2kinesis_spark.operators.similarity import (
        SIM_TOP_K,
        ann_user_similarity,
    )

    out = ann_user_similarity(spark, "/root/testdata/sf0.01")
    assert out.columns == ["user_id", "other_id", "sim", "rk"]
    per_user = out.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n"), F.max("rk").alias("mx"), F.min("rk").alias("mn")
    )
    bad = per_user.filter(
        (F.col("n") > SIM_TOP_K) | (F.col("mx") != F.col("n")) | (F.col("mn") != 1)
    )
    assert bad.count() == 0


def test_ann_lane_adaptive_band_bits(spark, tmp_path):
    """The scale-adaptive geometry (round-14 fix after the first 128x
    ladder attempt degenerated): band bits grow as ~log2(n_users)-3 so
    expected bucket size stays ~8 at every corpus size — with FIXED 8-bit
    bands, 192k users put ~750 in every bucket and the cap discarded the
    whole corpus. Gate: on a corpus big enough that bits EXCEED the
    floor, planted behavioral twins are still recovered at rank 1."""
    from nsq2kinesis_spark.operators.similarity import (
        Q106_ANN_BAND_BITS_FLOOR,
        _ann_band_bits,
        ann_user_similarity,
    )

    # the sizing curve itself
    assert _ann_band_bits(150) == Q106_ANN_BAND_BITS_FLOOR
    assert _ann_band_bits(1_500) == Q106_ANN_BAND_BITS_FLOOR
    assert _ann_band_bits(3_080) == 9
    assert _ann_band_bits(192_000) == 15

    sf_dir, n_pairs = _planted_similar_users(
        spark, tmp_path, n_pairs=25, n_background=3_030
    )
    # 25*2 + 3030 = 3080 users -> 9-bit bands on this corpus
    ann = ann_user_similarity(spark, sf_dir)
    top1 = {
        r.user_id: r.other_id for r in ann.filter(F.col("rk") == 1).collect()
    }
    hits = sum(
        1
        for a, b in ((2 * p, 2 * p + 1) for p in range(n_pairs))
        if top1.get(a) == b and top1.get(b) == a
    )
    assert hits / n_pairs >= 0.90, f"adaptive-bits recall {hits / n_pairs:.2f}"


def test_ann_lane_degenerate_inputs(spark, tmp_path):
    """Degenerate-corpus contract: empty events, a single user (no pairs),
    and an all-zero-norm corpus (every user excluded by the shared
    profile_norms contract) each yield an EMPTY result — never an error,
    never a zero-norm user ranked."""
    from nsq2kinesis_spark.operators.similarity import ann_user_similarity

    schema = ("event_id long, ts string, user_id long, event_type string, "
              "value double, props string")

    def write(rows, name):
        d = str(tmp_path / name)
        df = spark.createDataFrame(rows, schema).withColumn(
            "ts", F.col("ts").cast("timestamp")
        )
        df.write.mode("overwrite").parquet(f"{d}/events.parquet")
        return d

    empty = write([], "empty")
    single = write([(1, "2024-03-01 00:00:00", 7, "p", 1.0, "{}")], "single")
    # 0.001 dollars rounds to 0 cents: all-zero profiles, all excluded
    zero = write(
        [(i, "2024-03-01 00:00:00", i % 3, "p", 0.001, "{}") for i in range(9)],
        "zero",
    )
    for d in (empty, single, zero):
        out = ann_user_similarity(spark, d)
        assert out.columns == ["user_id", "other_id", "sim", "rk"]
        assert out.count() == 0
