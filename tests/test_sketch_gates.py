"""Accuracy gates for the rows-only sketch aggregates: the oracle can't
value-check engine-specific sketches (q16 HLL++, q116 GK quantiles), so
these tests enforce each sketch's published error contract against the
exact companion values the same query row carries.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nsq2kinesis_spark.operators.aggregates import QSKETCH_ACCURACY
from nsq2kinesis_spark.operators.relational import cents
from nsq2kinesis_spark.registry import all_queries
from nsq2kinesis_spark.tables import table as t

from .conftest import SF_CORRECTNESS

QUERIES = all_queries()


def test_q16_hll_relative_error_gate(spark):
    """approx_count_distinct at rsd=0.01 — gate at 5 standard deviations."""
    rows = QUERIES["q16_approx_distinct"].builder(spark, SF_CORRECTNESS).collect()
    assert rows
    for r in rows:
        rel = abs(r["approx_parts"] - r["exact_parts"]) / max(1, r["exact_parts"])
        assert rel <= 0.05, (r["exact_parts"], r["approx_parts"])


def test_q116_quantile_sketch_rank_error_gate(spark):
    """percentile_approx guarantees relative rank error <= 1/accuracy: the
    estimate must be an input value whose rank lies within n/accuracy of
    the target rank — equivalently, it must sit between the EXACT
    percentiles at q -/+ eps (eps = 2/accuracy, doubled for slack plus
    the interpolation difference at tiny n)."""
    rows = (
        QUERIES["q116_approx_percentile"].builder(spark, SF_CORRECTNESS).collect()
    )
    assert rows
    eps = 2.0 / QSKETCH_ACCURACY
    e = t(spark, SF_CORRECTNESS, "events")
    c = cents(F.col("value"))
    for q, exact_col, approx_col in (
        (0.5, "exact_p50_cents", "approx_p50_cents"),
        (0.9, "exact_p90_cents", "approx_p90_cents"),
    ):
        lo_q, hi_q = max(0.0, q - eps), min(1.0, q + eps)
        bounds = {
            r["event_type"]: (r["lo"], r["hi"])
            for r in e.groupBy("event_type")
            .agg(
                F.percentile(c, lo_q).alias("lo"),
                F.percentile(c, hi_q).alias("hi"),
            )
            .collect()
        }
        for r in rows:
            lo, hi = bounds[r["event_type"]]
            assert lo - 1 <= r[approx_col] <= hi + 1, (
                r["event_type"],
                q,
                r[approx_col],
                (lo, hi),
            )


def test_q121_null_user_matches_oracle(spark, duck, tmp_path):
    """NULL user_id must land in variant 'B' in BOTH engines (the oracle's
    CASE ELSE branch) — the shipped fixtures carry no NULLs, so this pins
    the divergence a bare boolean split predicate would introduce."""
    import shutil

    import duckdb as _duck

    from nsq2kinesis_spark.registry import all_queries

    src = "/root/testdata/sf0.001"
    sf = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    for name in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        shutil.copy(f"{src}/{name}.parquet", f"{sf}/{name}.parquet")
    con = _duck.connect()
    # the NULL user is exposed but never converts: it must appear in
    # variant B's denominator (oracle CASE ELSE) in both engines, and its
    # non-conversion keeps the guard row alive (at sf0.001 every real user
    # converts, which would otherwise filter the single output row)
    con.execute(
        f"""
        COPY (
          SELECT * FROM '{src}/events.parquet'
          UNION ALL
          SELECT 999001, TIMESTAMP '2024-01-01 00:00:00', NULL, 'view', 1.0, '{{}}'
        ) TO '{sf}/events.parquet' (FORMAT PARQUET)
        """
    )
    q = all_queries()["q121_ab_test"]
    sdf = q.builder(spark, sf)
    srow = {c: str(v) for c, v in sdf.collect()[0].asDict().items()}
    con.execute(f"CREATE VIEW events AS SELECT * FROM '{sf}/events.parquet'")
    res = con.execute(q.oracle)
    cols = [d[0] for d in res.description]
    drow = {c: str(v) for c, v in zip(cols, res.fetchone())}
    assert srow == drow


def test_q124_hash_mixture_quota_jitter_gate(spark):
    """The hash-threshold draw must land each source's achieved count
    within 5 binomial sigma of q115's exact quota (sigma^2 =
    quota*(1-quota/avail)) — the declared tolerance that justifies calling
    it q115's at-scale variant."""
    exact = (
        QUERIES["q115_dataset_mixture"]
        .builder(spark, SF_CORRECTNESS)
        .groupBy("source")
        .agg(F.max("rk").alias("quota"))
        .collect()
    )
    quotas = {r.source: r.quota for r in exact}
    avail = {
        r.source: r.n
        for r in t(spark, SF_CORRECTNESS, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    got = {
        r.source: r.n
        for r in QUERIES["q124_dataset_mixture_hash"]
        .builder(spark, SF_CORRECTNESS)
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert set(got) == set(quotas)
    for src, q in quotas.items():
        p = q / avail[src]
        sigma = max(1.0, (q * (1 - p)) ** 0.5)
        assert abs(got[src] - q) <= 5 * sigma, (src, q, got[src], sigma)


def _null_variant_fixture(tmp_path, extra_rows_sql):
    """Copy sf0.001 with extra hand-planted event rows (the shipped
    fixtures carry no NULLs, so NULL-semantics parity needs its own
    data) — returns (sf_dir, duckdb connection with views)."""
    import shutil

    import duckdb as _duck

    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    for name in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        shutil.copy(f"{src}/{name}.parquet", f"{sf_dir}/{name}.parquet")
    con = _duck.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM '{src}/events.parquet'
          UNION ALL {extra_rows_sql}
        ) TO '{sf_dir}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM '{sf_dir}/events.parquet'"
    )
    for name in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return sf_dir, con


def _assert_null_variant_parity(spark, name, sf_dir, con):
    q = QUERIES[name]
    srows = sorted(
        tuple(str(v) for v in r) for r in q.builder(spark, sf_dir).collect()
    )
    drows = sorted(
        tuple(str(v) for v in row) for row in con.execute(q.oracle).fetchall()
    )
    assert srows == drows


def test_q126_null_value_is_upsert_not_tombstone(spark, tmp_path):
    """A key whose last-write winner carries NULL value must survive as an
    upsert with NULL last_cents in BOTH engines (oracle CASE ELSE 'U') —
    a bare `value < x` predicate is NULL for NULL input and ~NULL would
    silently drop the key on the Spark side only."""
    sf_dir, con = _null_variant_fixture(
        tmp_path,
        "SELECT 999001, TIMESTAMP '2030-01-01 00:00:00', 888001, "
        "'purchase', NULL, '{}'",
    )
    _assert_null_variant_parity(spark, "q126_cdc_apply", sf_dir, con)


def test_q129_null_day_ordering_matches_oracle(spark, tmp_path):
    """A NULL-ts event creates a NULL first-day row; the cumsum's ORDER BY
    must place it identically in both engines (NULLS LAST pinned — Spark
    defaults NULLS FIRST, DuckDB NULLS LAST, and an unpinned order shifts
    EVERY day's cum_users, not just the NULL row's)."""
    sf_dir, con = _null_variant_fixture(
        tmp_path,
        "SELECT 999002, NULL, 888002, 'view', 1.0, '{}'",
    )
    _assert_null_variant_parity(spark, "q129_growth_curve", sf_dir, con)


def test_q137_merged_hll_error_gate(spark):
    """The hourly->daily sketch MERGE must estimate within the HLL error
    envelope of the exact per-day distinct count (lgK=12 -> rse ~1.04/64
    ~ 1.6%; gate at 5 sigma = 8%), proving union loses no accuracy vs a
    single-pass sketch."""
    rows = QUERIES["q137_hll_rollup"].builder(spark, SF_CORRECTNESS).collect()
    assert rows
    for r in rows:
        rel = abs(r.approx_users - r.exact_users) / max(1, r.exact_users)
        assert rel <= 0.08, (r.day, r.exact_users, r.approx_users)


def test_q138_null_cents_change_matches_oracle(spark, tmp_path):
    """A key whose T1-winner carries NULL value and whose T2-winner is
    non-NULL must diff as 'U' in BOTH engines — the bare <> comparison
    would NULL out and drop it in DuckDB while Spark kept it (or vice
    versa); IS DISTINCT FROM / eqNullSafe is pinned on both twins. A
    NULL->NULL key must NOT appear."""
    sf_dir, con = _null_variant_fixture(
        tmp_path,
        # null-then-value inside (T1, T2): winner at T1 is NULL cents,
        # winner at T2 is 777 cents -> 'U'; plus a NULL->NULL key that
        # must stay absent from the diff
        "SELECT 999010, TIMESTAMP '2024-01-10 00:00:00', 888010, 'view', NULL, '{}' "
        "UNION ALL SELECT 999011, TIMESTAMP '2024-01-20 00:00:00', 888010, 'view', 7.77, '{}' "
        "UNION ALL SELECT 999012, TIMESTAMP '2024-01-10 00:00:00', 888011, 'click', NULL, '{}'",
    )
    _assert_null_variant_parity(spark, "q138_snapshot_diff", sf_dir, con)
    rows = QUERIES["q138_snapshot_diff"].builder(spark, sf_dir).collect()
    mine = {(r.user_id, r.event_type): r for r in rows}
    assert mine[(888010, "view")].op == "U"
    assert mine[(888010, "view")].old_cents is None
    assert (888011, "click") not in mine  # NULL -> NULL is unchanged


def test_q134_null_ts_excluded_matches_oracle(spark, tmp_path):
    """NULL-ts events must be excluded from the interval build in BOTH
    engines — an unpinned ORDER BY ts would place the NULL row opposite
    ways (Spark NULLS FIRST, DuckDB NULLS LAST) and shift every state
    boundary and version number downstream."""
    sf_dir, con = _null_variant_fixture(
        tmp_path,
        "SELECT 999020, NULL, 888020, 'view', 1.0, '{}' "
        "UNION ALL SELECT 999021, NULL, 0, 'click', 1.0, '{}'",
    )
    _assert_null_variant_parity(spark, "q134_scd2_resolve", sf_dir, con)


def test_q140_null_user_tiebreak_matches_oracle(spark, tmp_path):
    """A NULL-user aggregate row that TIES on cents with a real user must
    rank identically in both engines (NULLS LAST pinned on the tiebreak —
    Spark's ASC default is NULLS FIRST, DuckDB's NULLS LAST, and the tie
    sits exactly on the top-k boundary here)."""
    # craft: NULL user and user 888030 both total exactly 999999 cents in
    # a fresh event type, landing ranks 1-2 of that type
    sf_dir, con = _null_variant_fixture(
        tmp_path,
        "SELECT 999030, TIMESTAMP '2024-01-05 00:00:00', NULL, 'signup', 9999.99, '{}' "
        "UNION ALL SELECT 999031, TIMESTAMP '2024-01-05 00:00:00', 888030, 'signup', 9999.99, '{}'",
    )
    _assert_null_variant_parity(spark, "q140_topk_others", sf_dir, con)


import pytest as _pytest_mod


@_pytest_mod.mark.parametrize(
    "qname",
    [
        "q101_event_funnel",
        "q103_gaps_islands",
        "q107_event_paths",
        "q117_scd2_intervals",
        "q60_dedup_exact",
        "q28_join_asof",
        "q35_window_range_frame",
    ],
)
def test_null_ts_ordering_matches_oracle(spark, tmp_path, qname):
    """Every ts-ordered window in the events family now pins NULLS LAST on
    both twins (Spark defaults NULLS FIRST, DuckDB NULLS LAST — the q129/
    q140 trap class, closed wholesale in round 5): with a planted NULL-ts
    event per user-stream, full results must still hash-match."""
    sf_dir, con = _null_variant_fixture(
        tmp_path,
        "SELECT 999040, NULL, 0, 'view', 1.0, '{}' "
        "UNION ALL SELECT 999041, NULL, 1, 'purchase', 2.0, '{}'",
    )
    _assert_null_variant_parity(spark, qname, sf_dir, con)


def test_q126_null_ts_in_version_struct_matches_oracle(spark, tmp_path):
    """The max_by NULL-ts corner (the aggregate-ordered analog of the
    window NULLS LAST class closed in round 5): q126's last-write-wins
    orders by a (ts, event_id) STRUCT inside max_by, where Spark's struct
    comparison treats a NULL field as smallest, while the oracle's
    ROW_NUMBER orders ts DESC under DuckDB's NULLS LAST default. Both
    must resolve identically for (a) a key where a NULL-ts TOMBSTONE
    competes with an older real-ts upsert — NULL losing means the key
    SURVIVES; NULL winning would delete it in one engine only — and
    (b) a key whose rows are ALL NULL-ts, where the winner falls through
    to the event_id tiebreak."""
    sf_dir, con = _null_variant_fixture(
        tmp_path,
        # (a) real-ts upsert + NULL-ts tombstone on the same fresh key:
        # the NULL-ts row must LOSE in both engines (value 0.5 < delete
        # threshold would tombstone the key if it won)
        "SELECT 999050, TIMESTAMP '2024-01-10 00:00:00', 888050, 'view', 5.00, '{}' "
        "UNION ALL SELECT 999051, NULL, 888050, 'view', 0.50, '{}' "
        # (b) all-NULL-ts key: winner decided purely by event_id DESC
        # (999053 wins with 7.77; if the LOWER event_id won, last_cents
        # would read 3.33 instead)
        "UNION ALL SELECT 999052, NULL, 888051, 'click', 3.33, '{}' "
        "UNION ALL SELECT 999053, NULL, 888051, 'click', 7.77, '{}'",
    )
    _assert_null_variant_parity(spark, "q126_cdc_apply", sf_dir, con)
    rows = QUERIES["q126_cdc_apply"].builder(spark, sf_dir).collect()
    mine = {(r.user_id, r.event_type): r for r in rows}
    assert mine[(888050, "view")].last_cents == 500  # NULL-ts tombstone lost
    assert mine[(888051, "click")].last_cents == 777  # event_id tiebreak


def test_q138_null_ts_rows_invisible_to_snapshots(spark, tmp_path):
    """q138's snapshots cut on `ts < T`; a NULL ts fails the predicate in
    both engines, so NULL-ts rows — even ones that would be the key's
    last-write winner — must be invisible to BOTH snapshots and produce
    no diff row. Planted: a fresh key whose only in-window row is at T1
    (so it diffs as absent->absent: no row) plus a NULL-ts row that,
    were it admitted, would flip the key to an INSERT."""
    sf_dir, con = _null_variant_fixture(
        tmp_path,
        "SELECT 999060, NULL, 888060, 'view', 9.99, '{}' "
        # and a key live at T1, tombstoned by a NULL-ts delete that must
        # NOT apply: the key stays identical in s1 and s2 -> filtered out
        "UNION ALL SELECT 999061, TIMESTAMP '2024-01-10 00:00:00', 888061, 'click', 5.00, '{}' "
        "UNION ALL SELECT 999062, NULL, 888061, 'click', 0.10, '{}'",
    )
    _assert_null_variant_parity(spark, "q138_snapshot_diff", sf_dir, con)
    rows = QUERIES["q138_snapshot_diff"].builder(spark, sf_dir).collect()
    keys = {(r.user_id, r.event_type) for r in rows}
    assert (888060, "view") not in keys
    assert (888061, "click") not in keys


def test_q136_null_ts_outside_series_bounds_matches_oracle(spark, tmp_path):
    """NULL-ts events entering q136's bounds aggs: a NULL day groups into
    a phantom (type, NULL) daily row that min/max skip and the calendar
    equi-join can never match — in both engines. A type whose ONLY
    qualifying row is NULL-ts yields NULL bounds and an empty (dropped)
    calendar arm rather than a crash or a phantom series."""
    sf_dir, con = _null_variant_fixture(
        tmp_path,
        # NULL-ts high-value row for an existing type
        "SELECT 999070, NULL, 888070, 'view', 999.0, '{}' "
        # fresh type whose only high-value row is NULL-ts
        "UNION ALL SELECT 999071, NULL, 888071, 'ghost_type', 999.0, '{}'",
    )
    _assert_null_variant_parity(spark, "q136_interpolate", sf_dir, con)
    rows = QUERIES["q136_interpolate"].builder(spark, sf_dir).collect()
    assert not any(r.event_type == "ghost_type" for r in rows)
    assert not any(r.day is None for r in rows)


def test_q139_null_ts_excluded_from_min_aggs_matches_oracle(spark, tmp_path):
    """NULL-ts events entering q139's first-view/first-purchase MIN aggs:
    MIN skips NULLs in both engines, and a user whose only view is
    NULL-ts gets first_view = NULL, which then fails the `ts >=
    first_view` purchase predicate in both — the user converts nowhere.
    A NULL-ts purchase likewise drops from the qualifying set without
    disturbing the user's real first purchase."""
    sf_dir, con = _null_variant_fixture(
        tmp_path,
        # user whose ONLY view is NULL-ts, plus a real purchase after it
        "SELECT 999080, NULL, 888080, 'view', 1.0, '{}' "
        "UNION ALL SELECT 999081, TIMESTAMP '2024-01-12 00:00:00', 888080, 'purchase', 2.0, '{}' "
        # user with real view, a NULL-ts purchase, and a later real
        # purchase: latency must come from the real one
        "UNION ALL SELECT 999082, TIMESTAMP '2024-01-10 00:00:00', 888081, 'view', 1.0, '{}' "
        "UNION ALL SELECT 999083, NULL, 888081, 'purchase', 2.0, '{}' "
        "UNION ALL SELECT 999084, TIMESTAMP '2024-01-10 01:00:00', 888081, 'purchase', 2.0, '{}'",
    )
    _assert_null_variant_parity(spark, "q139_conversion_latency", sf_dir, con)


def test_q141_table_rollup_error_gate(spark):
    """The ad-hoc week rollup answered from the MATERIALIZED sketch
    table alone must estimate within the same 5-sigma HLL envelope as
    q137 (lgK=12 -> gate 8%) of the exact weekly distinct computed
    independently from the raw events — proving the write/read round-trip
    of the binary sketch column loses nothing. Keyed on the week's
    Monday DATE (date_trunc), not the bare ISO week number, so week-N
    cells from different years can never merge (round-7 fix)."""
    rows = QUERIES["q141_sketch_table_rollup"].builder(spark, SF_CORRECTNESS).collect()
    assert rows
    e = t(spark, SF_CORRECTNESS, "events").filter(F.col("ts").isNotNull())
    exact = {
        r.week_start: r.n
        for r in e.groupBy(
            F.date_trunc("week", F.to_date("ts")).cast("date").alias("week_start")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {r.week_start for r in rows} == set(exact)
    for r in rows:
        rel = abs(r.approx_users - exact[r.week_start]) / max(1, exact[r.week_start])
        assert rel <= 0.08, (r.week_start, exact[r.week_start], r.approx_users)


def _table_listing(path):
    """(name, size, mtime_ns) per file — size + nanosecond mtime so a
    same-second same-name rewrite can't false-pass on coarse-mtime
    filesystems (round-8 advice fix)."""
    import os

    out = []
    for f in os.listdir(path):
        st = os.stat(os.path.join(path, f))
        out.append((f, st.st_size, st.st_mtime_ns))
    return sorted(out)


def test_q141_materialization_is_memoized_per_sf_dir(spark):
    """Round-7 leak fix: repeated q141 invocations must reuse ONE
    materialized sketch table per (process, sf_dir, source fingerprint)
    — the prior mkdtemp-per-invocation leaked a table per parity sweep /
    plan test / driver round and re-ran the write job inside callers'
    timed regions."""
    from nsq2kinesis_spark.operators.aggregates import (
        _SKETCH_TABLE_MEMO,
        _events_memo_key,
    )

    build = QUERIES["q141_sketch_table_rollup"].builder
    build(spark, SF_CORRECTNESS).collect()
    key = _events_memo_key(SF_CORRECTNESS)
    path1 = _SKETCH_TABLE_MEMO[key[0]][1]
    listing = _table_listing(path1)
    df = build(spark, SF_CORRECTNESS)
    assert _SKETCH_TABLE_MEMO[key[0]][1] == path1, (
        "second build materialized a NEW table dir (the leak)"
    )
    assert listing == _table_listing(path1), (
        "second build rewrote the materialized table"
    )
    assert df.count() > 0


def test_q141_memo_rebuilds_when_table_dir_vanishes(spark):
    """A tmp-cleaner (or manual delete) removing the materialized table
    mid-process must trigger a transparent rebuild, not a read error —
    the memo checks existence on every lookup (round-8 verdict fix)."""
    import os
    import shutil

    from nsq2kinesis_spark.operators.aggregates import (
        _SKETCH_TABLE_MEMO,
        _events_memo_key,
    )

    build = QUERIES["q141_sketch_table_rollup"].builder
    build(spark, SF_CORRECTNESS).collect()
    key = _events_memo_key(SF_CORRECTNESS)
    old = _SKETCH_TABLE_MEMO[key[0]][1]
    shutil.rmtree(os.path.dirname(old))
    rows = build(spark, SF_CORRECTNESS).collect()
    assert rows, "rebuild after table-dir delete returned no rows"
    new = _SKETCH_TABLE_MEMO[key[0]][1]
    assert new != old and os.path.exists(new), (
        "memo served a vanished table path instead of rebuilding"
    )


def test_sketch_memo_key_tracks_source_fingerprint(spark, tmp_path):
    """An in-place rewrite/append of the source events must produce a
    DIFFERENT memo key (file listing + sizes + mtimes), so q141/q142
    rebuild instead of silently serving sketches of the old corpus
    (round-8 advice fix). Exercised on a writable copy — the shipped
    testdata is read-only."""
    import os
    import shutil

    from nsq2kinesis_spark.operators.aggregates import _events_memo_key

    sf = tmp_path / "sf_copy"
    sf.mkdir()
    src = os.path.join(SF_CORRECTNESS, "events.parquet")
    dst = sf / "events.parquet"
    shutil.copyfile(src, dst)
    k1 = _events_memo_key(str(sf))
    k2 = _events_memo_key(str(sf))
    assert k1 == k2, "fingerprint is not deterministic for unchanged data"
    # simulate an in-place append: grow the file and bump its mtime
    with open(dst, "ab") as fh:
        fh.write(b"\x00")
    os.utime(dst, ns=(1, 1))
    assert _events_memo_key(str(sf)) != k1, (
        "source rewrite did not change the memo key"
    )
    # and keys never collide across sf dirs even with identical bytes
    assert k1[0] != _events_memo_key(SF_CORRECTNESS)[0]


def test_sketch_memo_reclaims_stale_table_on_source_change(spark, tmp_path):
    """When the events source changes in-process, the memo must not
    merely rebuild under a new key — it must also rmtree the STALE table
    dir (round-8 advice: keying by (sf_dir, fingerprint) stranded one
    mkdtemp per source rewrite forever). Keyed by sf_dir with the
    fingerprint in the value, the mismatch path reclaims the old dir."""
    import os
    import shutil

    from nsq2kinesis_spark.operators.aggregates import (
        _SKETCH_TABLE_MEMO,
        _events_memo_key,
    )

    sf = tmp_path / "sf_copy"
    sf.mkdir()
    for tbl in ("events",):
        shutil.copyfile(
            os.path.join(SF_CORRECTNESS, f"{tbl}.parquet"),
            sf / f"{tbl}.parquet",
        )
    build = QUERIES["q141_sketch_table_rollup"].builder
    build(spark, str(sf)).collect()
    old = _SKETCH_TABLE_MEMO[str(sf)][1]
    assert os.path.exists(old)
    # in-place source rewrite: grow the file and move its mtime
    with open(sf / "events.parquet", "ab") as fh:
        pass  # open for append without corrupting the parquet footer...
    os.utime(sf / "events.parquet", ns=(12345, 12345))
    build(spark, str(sf)).collect()
    new = _SKETCH_TABLE_MEMO[str(sf)][1]
    assert new != old, "source change did not rebuild the table"
    assert not os.path.exists(os.path.dirname(old)), (
        "stale sketch-table dir was stranded instead of reclaimed"
    )
    assert os.path.exists(new)


def test_q142_incremental_equals_rebuild(spark):
    """The incrementally-maintained sketch table (base build + delta-hour
    append) must answer the ISO-week rollup EXACTLY like a full rebuild:
    the hour cells partition the rows identically in both builds, HLL
    register state is insertion-order-independent, and union is
    associative/commutative — so this is an equality gate, not an error
    envelope. Every week row must carry matched=True."""
    rows = QUERIES["q142_sketch_incremental"].builder(spark, SF_CORRECTNESS).collect()
    assert rows
    bad = [r for r in rows if not r.matched]
    assert not bad, f"incremental != rebuild for weeks {bad}"
    # and the estimates themselves sit in the same 5-sigma envelope as
    # q141 vs the independently-computed exact weekly distincts
    e = t(spark, SF_CORRECTNESS, "events").filter(F.col("ts").isNotNull())
    exact = {
        r.week_start: r.n
        for r in e.groupBy(
            F.date_trunc("week", F.to_date("ts")).cast("date").alias("week_start")
        )
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {r.week_start for r in rows} == set(exact)
    for r in rows:
        rel = abs(r.approx_incremental - exact[r.week_start]) / max(
            1, exact[r.week_start]
        )
        assert rel <= 0.08, (r.week_start, exact[r.week_start], r.approx_incremental)


def test_q142_append_touches_only_the_delta_cell(spark):
    """The maintenance step must be append-only: after the builder runs,
    the materialized table holds exactly the full hourly cell set (no
    duplicate or missing cells from the two-step build), and a second
    invocation reuses the table without rewriting any file — the same
    no-leak/no-rewrite contract as q141's memoization."""
    from nsq2kinesis_spark.operators.aggregates import (
        _INCR_SKETCH_MEMO,
        _events_memo_key,
    )

    from nsq2kinesis_spark.streaming.sketch_maintenance import read_sketch_table

    build = QUERIES["q142_sketch_incremental"].builder
    build(spark, SF_CORRECTNESS).collect()
    key = _events_memo_key(SF_CORRECTNESS)
    path = _INCR_SKETCH_MEMO[key[0]][1]
    # the table is manifest-versioned (round 11) — read like production does
    cells = read_sketch_table(spark, path).select("day", "hour").collect()
    assert len(cells) == len(set((r.day, r.hour) for r in cells)), (
        "append created duplicate hour cells"
    )
    e = t(spark, SF_CORRECTNESS, "events").filter(F.col("ts").isNotNull())
    n_expected = (
        e.select(F.to_date("ts").alias("day"), F.hour("ts").alias("hour"))
        .distinct()
        .count()
    )
    assert len(cells) == n_expected, "cell set differs from a full build"
    listing = _table_listing(path)
    build(spark, SF_CORRECTNESS).collect()
    assert _INCR_SKETCH_MEMO[key[0]][1] == path
    assert listing == _table_listing(path), (
        "second invocation rewrote the materialized table"
    )


@_pytest_mod.mark.parametrize(
    "qname",
    [
        # the three that DIVERGED before round 6's pin: Spark's window/
        # session_window drop NULL-ts rows by construction while the
        # unpinned oracles kept a phantom NULL bucket (q61/q62) or folded
        # the row into the user's last session (q63)
        "q61_tumbling_window",
        "q62_sliding_window",
        "q63_session_window",
        # the rest of the time-bucketed events family, locked in at their
        # current (already-agreeing) NULL-ts behavior
        "q66_time_rollup",
        "q104_rolling_active_users",
        "q108_daily_value_bands",
        "q114_daily_anomalies",
        "q119_daily_trend",
        "q120_volume_gini",
        "q128_gap_fill",
        "q135_daily_mad",
    ],
)
def test_null_ts_time_bucketing_matches_oracle(spark, tmp_path, qname):
    """Every time-BUCKETED query in the events family (window aggs,
    day-grouped aggs — the grouping analog of the ORDER BY class closed
    in round 5 and the max_by class closed earlier this round): with
    planted NULL-ts events, full results must still hash-match. For
    q61-q63 the policy is explicit NULL-ts exclusion on both twins — no
    event time, no time window."""
    sf_dir, con = _null_variant_fixture(
        tmp_path,
        "SELECT 999090, NULL, 0, 'view', 1.0, '{}' "
        "UNION ALL SELECT 999091, NULL, 1, 'purchase', 500.0, '{}'",
    )
    _assert_null_variant_parity(spark, qname, sf_dir, con)


def _null_docs_fixture(tmp_path):
    """Events-fixture analog for the documents/embeddings tables: copies
    sf0.001 with planted NULL-text, NULL-lang/source, EMPTY-text document
    rows and a NULL-embedding vector row — the payload corners a 100 TB
    crawl corpus will certainly contain and the shipped fixtures don't."""
    import shutil

    import duckdb as _duck

    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    for name in "region nation customer supplier part orders lineitem events".split():
        shutil.copy(f"{src}/{name}.parquet", f"{sf_dir}/{name}.parquet")
    con = _duck.connect()
    con.execute(
        f"""COPY (SELECT * FROM '{src}/documents.parquet'
            UNION ALL SELECT 999001, NULL, 'en', 'src1', 0
            UNION ALL SELECT 999002, 'alpha beta gamma delta epsilon', NULL, NULL, 30
            UNION ALL SELECT 999003, '', 'en', 'src1', 0)
            TO '{sf_dir}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT * FROM '{src}/embeddings.parquet'
            UNION ALL SELECT 999001, NULL,
              (SELECT label FROM '{src}/embeddings.parquet' LIMIT 1))
            TO '{sf_dir}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    return sf_dir, con


@_pytest_mod.mark.parametrize(
    "qname",
    [
        # crashed or diverged before the round-6 NULL-contract pins:
        "q50_pandas_udf_tokenize",  # pandas UDF died on None (na_action)
        "q52_udtf_bigrams",  # UDTF died on None.split
        "q53_python_udf_crc",  # row UDFs died on None slicing
        "q54_multimodal_decode",  # oracle crashed: CONCAT('0x', NULL)='0x'
        "q73_token_count_bpe",  # empty-stream fp: '' vs NULL ARRAY_TO_STRING
        "q91_frame_sample",  # oracle emitted a phantom NULL frame row
        "q92_media_features",  # degrade-to-(0,NULL,0) vs all-NULL oracle
        "q93_media_resize",  # NULL/empty thumbs collapsed to NULL in oracle
        # diverged in the round-11 extended CONCAT probe, now pinned:
        "q46_hash_battery",  # concat_ws vs CONCAT NULL fold split the md5
        # representative already-agreeing members, locked in:
        "q70_text_stats",
        "q72_fingerprint",
        "q79_vocab_topk",
        "q80_cosine_topk",
        "q110_pii_redaction",
        "q130_rag_chunker",
        "q133_ppjoin",
    ],
)
def test_null_payload_contract_matches_oracle(spark, tmp_path, qname):
    """The text/media/vector family under planted NULL-text, NULL-lang,
    EMPTY-text, and NULL-embedding rows: every oracled query must
    hash-match its twin — the UDF paths must degrade per the multimodal
    module's never-kill-the-batch rule instead of throwing, and the
    oracles must state the same NULL contract the Python side implements."""
    sf_dir, con = _null_docs_fixture(tmp_path)
    _assert_null_variant_parity(spark, qname, sf_dir, con)


def _null_tpch_fixture(tmp_path):
    """Planted-NULL variant of the relational tables: NULL name/balance/
    segment/nationkey customers, a fully-NULL order plus a NULL price in
    an existing priority partition and a NULL date under an existing
    customer, and lineitems with NULL measures/shipdate inside an
    existing supplier partition — aimed squarely at window ORDER BY
    columns and money aggregates."""
    import shutil

    import duckdb as _duck

    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    for name in "region nation supplier part events documents embeddings".split():
        shutil.copy(f"{src}/{name}.parquet", f"{sf_dir}/{name}.parquet")
    con = _duck.connect()
    con.execute(
        f"""COPY (SELECT * FROM '{src}/customer.parquet'
        UNION ALL SELECT 999901, NULL, NULL, NULL, NULL
        UNION ALL SELECT 999902, 'Customer#999902', 3, NULL, 'BUILDING')
        TO '{sf_dir}/customer.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT * FROM '{src}/orders.parquet'
        UNION ALL SELECT 999901, NULL, NULL, NULL, NULL, NULL
        UNION ALL SELECT 999902, 999902, 'O', NULL, TIMESTAMP '2024-03-01', '1-URGENT'
        UNION ALL SELECT 999903, 7, 'O', 123.45, NULL, '2-HIGH')
        TO '{sf_dir}/orders.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT * FROM '{src}/lineitem.parquet'
        UNION ALL SELECT 999901, NULL, NULL, 1, NULL, NULL, NULL, NULL, NULL, NULL, NULL
        UNION ALL SELECT 999902, 1, 1, 1, 5.0, NULL, 0.05, 0.02, 'N', 'O', TIMESTAMP '2024-03-02'
        UNION ALL SELECT 999903, 2, 1, 2, NULL, 77.0, 0.01, 0.01, 'N', 'O', NULL)
        TO '{sf_dir}/lineitem.parquet' (FORMAT PARQUET)"""
    )
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    return sf_dir, con


@_pytest_mod.mark.parametrize(
    "qname",
    [
        # diverged or crashed before the round-6 pins:
        "q34_window_distribution",  # NULL price shifted EVERY pct_rank/cume
        "q31_window_analytic",  # same class: NULL date as first_value
        "q32_window_frames",  # same class: NULL keys sliding ROWS frames
        "q51_apply_in_pandas_median",  # astype(int64) raised on NaN balance
        # representative already-agreeing members, locked in:
        "q01_pricing_summary",
        "q10_agg_global",
        "q17_percentiles",
        "q22_join_left_outer",
        "q24_join_full_outer",
        "q30_window_rank",
        "q33_topk_per_group",
        "q43_conditional_battery",
        "q105_scalar_subquery",
        "q118_fuzzy_match",
        "q122_copurchase",
    ],
)
def test_null_tpch_rows_match_oracle(spark, tmp_path, qname):
    """The relational/window/join family under planted NULLs in order
    keys, money columns, and join keys: results must hash-match. The
    window ORDER BY class (Spark ASC defaults NULLS FIRST, DuckDB NULLS
    LAST) is now pinned on the price/date-ordered windows too, not just
    the ts-ordered ones closed in round 5."""
    sf_dir, con = _null_tpch_fixture(tmp_path)
    _assert_null_variant_parity(spark, qname, sf_dir, con)


def test_nan_inf_losers_invisible_to_cdc_twins(spark, tmp_path):
    """Garbage-value evaluation order (the q126 docstring pin): a
    NaN/Infinity value whose row LOSES the last-write race must be
    invisible to both twins — Spark's max_by never materializes a losing
    row's cents and the oracle now converts cents on the rn=1 winner
    only (the pre-rank CTE form raised ConversionException in DuckDB
    while Spark returned rows: a one-sided failure the gate would read
    as corruption). Both engines must also still agree on q138's
    snapshot diff with the garbage rows in-window."""
    sf_dir, con = _null_variant_fixture(
        tmp_path,
        # losers: a real-ts row exists AFTER each garbage row on the
        # same (user, type) key in the base fixture (events run to
        # 2024-01-30; these sit mid-January)
        "SELECT 999095, TIMESTAMP '2024-01-20 12:00:00', 5, 'view', CAST('NaN' AS DOUBLE), '{}' "
        "UNION ALL SELECT 999096, TIMESTAMP '2024-01-20 13:00:00', 6, 'click', CAST('Infinity' AS DOUBLE), '{}'",
    )
    _assert_null_variant_parity(spark, "q126_cdc_apply", sf_dir, con)
    _assert_null_variant_parity(spark, "q138_snapshot_diff", sf_dir, con)


def test_nan_preceding_its_correction_invisible_to_cdc_twins(spark, tmp_path):
    """The round-7 hardening of the test above: a NaN row that comes
    FIRST in scan order for a brand-new key (the natural CDC append
    order — garbage written, then corrected) necessarily LEADS max_by's
    running max when it is scanned, so any conversion inside the value
    struct is evaluated for it even though it loses the final race.
    With cents() inside the struct (the round-6 form) Spark raised
    CAST_INVALID_INPUT here while the oracle returned cleanly; the
    struct now carries the raw double and cents is applied post-agg
    (winner-only), so both twins must agree. The keys are new
    (user 999777/999778) so the garbage row is the FIRST row of its
    group — the strongest 'interim leader' case."""
    sf_dir, con = _null_variant_fixture(
        tmp_path,
        # garbage FIRST, correction SECOND, on fresh keys
        "SELECT 999200, TIMESTAMP '2024-01-10 08:00:00', 999777, 'view', CAST('NaN' AS DOUBLE), '{}' "
        "UNION ALL SELECT 999201, TIMESTAMP '2024-01-11 08:00:00', 999777, 'view', 42.0, '{}' "
        "UNION ALL SELECT 999202, TIMESTAMP '2024-01-10 09:00:00', 999778, 'click', CAST('Infinity' AS DOUBLE), '{}' "
        "UNION ALL SELECT 999203, TIMESTAMP '2024-01-11 09:00:00', 999778, 'click', 7.5, '{}'",
    )
    _assert_null_variant_parity(spark, "q126_cdc_apply", sf_dir, con)
    _assert_null_variant_parity(spark, "q138_snapshot_diff", sf_dir, con)


def test_q44_garbage_json_matches_oracle(spark, tmp_path):
    """The q44 garbage-payload pins, end to end: empty object (keys join
    to '' not NULL), NULL props (NULL everywhere), malformed JSON
    (Spark PERMISSIVE NULLs vs DuckDB's raise — json_valid guard),
    valid-but-not-an-object, and a non-numeric '$.k' (typed-field
    degrade vs TRY_CAST). Round 7 adds the NUMERIC-but-not-integer
    corners: fractional ({"k":12.5} — DuckDB's string->int cast ROUNDS
    to 13 where Spark's IntegerType field degrades to NULL), quoted
    number ("12" — DuckDB parses, Spark NULLs), scientific (1e2), and
    boolean — all pinned by the oracle's json_type IN
    ('BIGINT','UBIGINT') guard; a plain negative integer must still
    convert on both. All corners must hash-match."""
    sf_dir, con = _null_variant_fixture(
        tmp_path,
        "SELECT 999097, TIMESTAMP '2024-01-21 08:00:00', 7, 'view', 1.0, '{}' "
        "UNION ALL SELECT 999098, TIMESTAMP '2024-01-21 09:00:00', 8, 'click', 2.0, NULL "
        "UNION ALL SELECT 999100, TIMESTAMP '2024-01-21 10:00:00', 9, 'view', 1.0, 'not json at all' "
        "UNION ALL SELECT 999101, TIMESTAMP '2024-01-21 11:00:00', 9, 'view', 1.0, '[1,2,3]' "
        "UNION ALL SELECT 999102, TIMESTAMP '2024-01-21 12:00:00', 9, 'view', 1.0, "
        "'{\"k\": \"xyz\"}' "
        "UNION ALL SELECT 999103, TIMESTAMP '2024-01-21 13:00:00', 9, 'view', 1.0, "
        "'{\"k\": 7, \"z\": {\"n\": 1}}' "
        "UNION ALL SELECT 999104, TIMESTAMP '2024-01-21 14:00:00', 9, 'view', 1.0, "
        "'{\"k\": 12.5}' "
        "UNION ALL SELECT 999105, TIMESTAMP '2024-01-21 15:00:00', 9, 'view', 1.0, "
        "'{\"k\": \"12\"}' "
        "UNION ALL SELECT 999106, TIMESTAMP '2024-01-21 16:00:00', 9, 'view', 1.0, "
        "'{\"k\": 1e2}' "
        "UNION ALL SELECT 999107, TIMESTAMP '2024-01-21 17:00:00', 9, 'view', 1.0, "
        "'{\"k\": true}' "
        "UNION ALL SELECT 999108, TIMESTAMP '2024-01-21 18:00:00', 9, 'view', 1.0, "
        "'{\"k\": -3}' "
        # INT32 overflow corners (probed clean late round 7, pinned): the
        # json_type guard passes BIGINT values through to TRY_CAST AS
        # INTEGER, which NULLs out-of-range on both twins exactly where
        # Spark's IntegerType struct field degrades — boundary values
        # survive, one-past-boundary and the INT64-overflow literal NULL
        "UNION ALL SELECT 999109, TIMESTAMP '2024-01-21 19:00:00', 9, 'view', 1.0, "
        "'{\"k\": 3000000000}' "
        "UNION ALL SELECT 999110, TIMESTAMP '2024-01-21 20:00:00', 9, 'view', 1.0, "
        "'{\"k\": -2147483649}' "
        "UNION ALL SELECT 999111, TIMESTAMP '2024-01-21 21:00:00', 9, 'view', 1.0, "
        "'{\"k\": 2147483647}' "
        "UNION ALL SELECT 999112, TIMESTAMP '2024-01-21 22:00:00', 9, 'view', 1.0, "
        "'{\"k\": -2147483648}' "
        "UNION ALL SELECT 999113, TIMESTAMP '2024-01-21 23:00:00', 9, 'view', 1.0, "
        "'{\"k\": 9223372036854775808}'",
    )
    _assert_null_variant_parity(spark, "q44_json_battery", sf_dir, con)


def test_q44_deep_nested_json_matches_oracle(spark, tmp_path):
    """Round-9 recursion-limit probe, pinned: Spark's Jackson parser
    hard-caps JSON nesting at depth 1000 (depth-1001 payloads go NULL in
    PERMISSIVE mode) while DuckDB's yyjson parses kilodeep payloads —
    a silent twin split. The declared contract NULLs every JSON column
    when a payload has more than JSON_MAX_OPENS STRUCTURAL open
    brackets, on both twins. Planted: depth 999 and exactly 1000
    (in contract — parse), depth 1001 arrays and a 1200-deep object
    (out), 1500 brackets INSIDE a string value (in contract — only
    structural brackets count), and a wide-but-flat 1100-container
    payload (out by declaration, though both parsers could handle it)."""
    deep = lambda n: f"'{{\"k\":7,\"deep\":' || REPEAT('[', {n}) || '1' || REPEAT(']', {n}) || '}}'"
    deep_obj = "'' || REPEAT('{\"a\":', 1200) || '1' || REPEAT('}', 1200)"
    wide = "'{\"k\":7,\"w\":[' || REPEAT('[1],', 1099) || '[1]]}'"
    strbr = "'{\"k\":7,\"s\":\"' || REPEAT('[', 1500) || '\"}'"
    sf_dir, con = _null_variant_fixture(
        tmp_path,
        f"SELECT 999120, TIMESTAMP '2024-01-22 10:00:00', 9, 'view', 1.0, {deep(999)} "
        f"UNION ALL SELECT 999121, TIMESTAMP '2024-01-22 11:00:00', 9, 'view', 1.0, {deep(1000)} "
        f"UNION ALL SELECT 999122, TIMESTAMP '2024-01-22 12:00:00', 9, 'view', 1.0, {deep(1001)} "
        f"UNION ALL SELECT 999123, TIMESTAMP '2024-01-22 13:00:00', 9, 'view', 1.0, {deep_obj} "
        f"UNION ALL SELECT 999124, TIMESTAMP '2024-01-22 14:00:00', 9, 'view', 1.0, {wide} "
        f"UNION ALL SELECT 999125, TIMESTAMP '2024-01-22 15:00:00', 9, 'view', 1.0, {strbr}",
    )
    _assert_null_variant_parity(spark, "q44_json_battery", sf_dir, con)
    got = {
        r.event_id: (r.prop_k, r.prop_keys)
        for r in QUERIES["q44_json_battery"].builder(spark, sf_dir).collect()
        if r.event_id >= 999120
    }
    # deep(999): opens = 1000 = cap, depth 1000 = Jackson's max — parses
    assert got[999120] == (7, "deep,k")
    assert got[999121] == (None, None)  # deep(1000): opens 1001 > cap
    assert got[999122] == (None, None)  # deep(1001): ditto (Jackson fails too)
    assert got[999123] == (None, None)  # 1200-deep object
    # wide-flat: 1102 opens but depth 3 — BOTH parsers handle it, the
    # declared conservative band NULLs it anyway, identically
    assert got[999124] == (None, None)
    assert got[999125] == (7, "k,s")  # brackets inside a string: in contract
    # and the DQ report SEES the excluded slice (events_props_parse_contract):
    # 999121/999122/999123/999124 are the four out-of-contract payloads
    # (the shared fixture registers only the events view — q123 reads more)
    for name in "region nation customer supplier part orders lineitem documents embeddings".split():
        con.execute(f"CREATE VIEW IF NOT EXISTS {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    _assert_null_variant_parity(spark, "q123_dq_report", sf_dir, con)
    dq = {
        r.rule: r.n_violations
        for r in QUERIES["q123_dq_report"].builder(spark, sf_dir).collect()
    }
    assert dq["events_props_parse_contract"] == 4


def _multibyte_docs_fixture(tmp_path):
    """Planted multibyte documents (Latin diacritics, Greek, CJK, an
    astral-plane emoji, a ligature) — the corpus shape the byte/char
    distinction actually bites on; the shipped fixtures are pure ASCII."""
    import shutil

    import duckdb as _duck

    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    for name in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        shutil.copy(f"{src}/{name}.parquet", f"{sf_dir}/{name}.parquet")
    con = _duck.connect()
    t1 = "héllo wörld héllo wörld καλημέρα κόσμε 日本語のテキスト です"
    t2 = "ascii mixed with émojis 🙂 and ligatures ﬁne"
    # round-9 probe extension — the surrogate-pair / combining-mark /
    # zero-width regime (Java strings are UTF-16, so astral chars are 2
    # code UNITS but 1 code POINT; probed: Spark length/split/substr/
    # regexp all count code points, matching DuckDB): an astral-run
    # word, DECOMPOSED accents (e + U+0301 — length counts the mark as
    # its own codepoint on both twins, no implicit NFC), and zero-width
    # spaces INSIDE tokens (must not split words on either side).
    t3 = (
        "\U0001f600\U0001f3d4\U0001f600 astral run "
        "cafe\u0301 de\u0301ja\u0300 "  # DECOMPOSED combining accents
        "zero\u200bwidth in\u200bside"  # ZWSP inside tokens
    )
    con.execute(
        f"""COPY (SELECT * FROM '{src}/documents.parquet'
        UNION ALL SELECT 999011, '{t1}', 'el', 'src1', {len(t1)}
        UNION ALL SELECT 999012, '{t2}', 'en', 'src2', {len(t2)}
        UNION ALL SELECT 999013, '{t3}', 'en', 'src3', {len(t3)}
        -- round-9 NUL-byte probe (clean class): both engines are
        -- binary-safe (length/split/md5/upper agree with NUL embedded
        -- mid-token and as a bare token); pinned so a C-string-truncating
        -- regression in either engine surfaces
        UNION ALL SELECT 999014,
          'nul' || CHR(0) || 'byte token ' || CHR(0) || ' end',
          'en', 'src4', 20)
        TO '{sf_dir}/documents.parquet' (FORMAT PARQUET)"""
    )
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    return sf_dir, con


@_pytest_mod.mark.parametrize(
    "qname",
    [
        # diverged before the round-6 byte/char pins:
        "q70_text_stats",  # token length: DuckDB STRLEN is BYTES -> LENGTH
        "q88_quality_gate",  # same (mean-word-length flag flipped)
        "q74_multimodal_meta",  # head_hex: 8 chars != 8 bytes
        "q91_frame_sample",  # frames are BYTE slices; oracle now slices hex
        "q92_media_features",  # byte stats vs ORD-of-codepoint
        "q93_media_resize",  # strided bytes vs strided chars
        # representative members locked in (md5 of whole strings hashes
        # the UTF-8 encoding identically in both engines):
        "q54_multimodal_decode",
        "q64_oversize_filter",
        "q72_fingerprint",
        "q73_token_count_bpe",
        "q79_vocab_topk",
        "q133_ppjoin",
    ],
)
def test_multibyte_text_matches_oracle(spark, tmp_path, qname):
    """Byte/character semantics, pinned per column class: linguistics
    (token lengths) count CHARACTERS on both twins; payload plumbing
    (byte counts, magic headers, frame/thumb slices, byte statistics)
    counts BYTES of the UTF-8 encoding on both — the oracles slice
    HEX(ENCODE(text)) two chars per byte, so they are byte-faithful on
    any input rather than only on the ASCII fixtures."""
    sf_dir, con = _multibyte_docs_fixture(tmp_path)
    _assert_null_variant_parity(spark, qname, sf_dir, con)


def test_byte_identical_twin_docs_canonical_selection(spark, tmp_path):
    """Round-9 probe (b): BYTE-IDENTICAL documents under DISTINCT doc_ids
    — content, not id, collides — through every canonical-selection
    path. The tie-breaks must be total and identical on both twins:
    q89 labels all twins with the min doc_id component (Jaccard 1 pairs
    close transitively), q102 admits only the min-doc_id twin of a batch
    fingerprint and drops ALL batch twins of a snapshot fingerprint, and
    q111 keeps each duplicated chunk at its (min doc_id, min pos) first
    occurrence. Planted: content A = one snapshot + two batch twins
    (all batch copies suppressed), content B = three batch twins (min
    admitted), ids deliberately NOT in insertion order."""
    import shutil

    import duckdb as _duck

    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    for name in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        shutil.copy(f"{src}/{name}.parquet", f"{sf_dir}/{name}.parquet")
    con = _duck.connect()
    ta = "twinprobe alpha lorem vextil quorat mindel sovern pliats krameth dolzen"
    tb = "twinprobe beta ulmira fenwick torvald quenson haplor vindex cromley stazen"
    con.execute(
        f"""COPY (SELECT * FROM '{src}/documents.parquet'
        UNION ALL SELECT 999033, '{ta}', 'en', 'src20', {len(ta)}
        UNION ALL SELECT 999031, '{ta}', 'en', 'src21', {len(ta)}
        UNION ALL SELECT 999032, '{ta}', 'en', 'src3',  {len(ta)}
        UNION ALL SELECT 999043, '{tb}', 'en', 'src22', {len(tb)}
        UNION ALL SELECT 999041, '{tb}', 'en', 'src23', {len(tb)}
        UNION ALL SELECT 999042, '{tb}', 'en', 'src24', {len(tb)})
        TO '{sf_dir}/documents.parquet' (FORMAT PARQUET)"""
    )
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    for qname in ("q89_dedup_components", "q102_incremental_dedup", "q111_chunk_dedup"):
        _assert_null_variant_parity(spark, qname, sf_dir, con)
    # teeth beyond parity: the selections themselves
    comp = {
        r.doc_id: (r.component, r.is_canonical)
        for r in QUERIES["q89_dedup_components"].builder(spark, sf_dir).collect()
    }
    assert comp[999031] == (999031, 1) and comp[999032] == (999031, 0)
    assert comp[999033] == (999031, 0)
    assert comp[999041] == (999041, 1) and comp[999043] == (999041, 0)
    admitted = {
        r.doc_id
        for r in QUERIES["q102_incremental_dedup"].builder(spark, sf_dir).collect()
        if r.doc_id >= 999000
    }
    # content A has a snapshot twin (999032, src3): every batch copy drops;
    # content B is batch-only: exactly the min doc_id survives
    assert admitted == {999041}, admitted


def test_wrong_dim_embeddings_and_duplicate_doc_ids(spark, tmp_path):
    """Garbage-input contracts on the vector family, pinned round 6 and
    EXTENDED round 7: (a) the declared-dimension rule — wrong-length
    embeddings (short, empty, NULL) are excluded on both twins up front;
    before the guard, Spark's ANSI positional indexing raised on q90
    while DuckDB silently computed partial dots, and q98's zip_with gave
    short vectors all-zero signatures; (b) round 7's valid-vector
    extension — a DIM-length ZERO vector (norm 0, the signature of a
    failed embedding job) crashed q80/q81/q82/q90/q131 outright under
    ANSI (DIVIDE_BY_ZERO in the cosine) while DuckDB returned NULL rows,
    and NaN/±Inf elements overflowed q98's BIGINT signature packing —
    finiteness + nonzero-norm are now part of the declared contract on
    both twins; (c) q111's chunk reassembly under a DUPLICATED doc_id —
    the (pos, chunk) sort keeps the interleaving total on both twins."""
    import shutil

    import duckdb as _duck

    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    for name in "region nation customer supplier part orders lineitem events".split():
        shutil.copy(f"{src}/{name}.parquet", f"{sf_dir}/{name}.parquet")
    con = _duck.connect()
    lbl = f"(SELECT label FROM '{src}/embeddings.parquet' LIMIT 1)"
    zeros64 = "list_transform(generate_series(1, 64), x -> 0.0::FLOAT)"
    tail63 = "list_transform(generate_series(1, 63), x -> 0.5::FLOAT)"
    con.execute(
        f"""COPY (SELECT * FROM '{src}/embeddings.parquet'
        UNION ALL SELECT 999010, [0.5, 0.5, 0.5]::FLOAT[], {lbl}
        UNION ALL SELECT 999011, []::FLOAT[], {lbl}
        UNION ALL SELECT 999012, NULL, {lbl}
        -- round-7 valid-vector extension: right LENGTH, garbage VALUES
        UNION ALL SELECT 999013, {zeros64}, {lbl}
        UNION ALL SELECT 999014, list_prepend('nan'::FLOAT, {tail63}), {lbl}
        UNION ALL SELECT 999015, list_prepend('inf'::FLOAT, {tail63}), {lbl}
        UNION ALL SELECT 999016, list_prepend('-inf'::FLOAT, {tail63}), {lbl}
        -- NULL element in a right-length vector: Spark's forall yields
        -- NULL (drops) but DuckDB's list_bool_and SKIPS NULLs (keeps)
        -- unless the contract spells out x IS NOT NULL — the post-review
        -- conjunct this row pins
        UNION ALL SELECT 999017, list_prepend(NULL::FLOAT, {tail63}), {lbl})
        TO '{sf_dir}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT * FROM '{src}/documents.parquet'
        UNION ALL SELECT 17, 'duplicate doc id with different text entirely here',
          'en', 'src1', 50)
        TO '{sf_dir}/documents.parquet' (FORMAT PARQUET)"""
    )
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    for qname in (
        "q80_cosine_topk", "q81_cosine_neardup", "q82_ann_ivf",
        "q90_kmeans_train", "q98_srp_lsh_pairs", "q131_hard_negatives",
        "q111_chunk_dedup",
    ):
        _assert_null_variant_parity(spark, qname, sf_dir, con)


def test_null_join_keys_match_oracle(spark, tmp_path):
    """NULL join keys across the whole join family (round-7 probe): a
    NULL user_id in events (routine in a real stream — anonymous traffic,
    parse failures), a NULL c_custkey, and a NULL o_custkey planted
    together. The probe found exactly one divergence: q26's oracle used
    `NOT IN`, which under three-valued logic is never TRUE once the
    subquery contains a single NULL — DuckDB returned ZERO rows while
    Spark's left_anti (NOT EXISTS semantics) kept all 136 no-event
    customers. The oracle is now NOT EXISTS; this pins the whole family
    (inner/outer/semi/anti/theta/as-of/EXISTS + the CDC pair) against
    the planted keys."""
    import shutil

    import duckdb as _duck

    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    for name in (
        "region nation supplier part lineitem documents embeddings"
    ).split():
        shutil.copy(f"{src}/{name}.parquet", f"{sf_dir}/{name}.parquet")
    con = _duck.connect()
    con.execute(
        f"""COPY (SELECT * FROM '{src}/events.parquet'
        UNION ALL SELECT 999001, TIMESTAMP '2024-01-05 12:00:00', NULL, 'view', 1.0, '{{}}'
        UNION ALL SELECT 999002, TIMESTAMP '2024-01-05 13:00:00', NULL, 'purchase', 2.0, '{{}}')
        TO '{sf_dir}/events.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT * FROM '{src}/customer.parquet'
        UNION ALL SELECT NULL, 'null-key customer', 1, 10.0, 'BUILDING')
        TO '{sf_dir}/customer.parquet' (FORMAT PARQUET)"""
    )
    con.execute(
        f"""COPY (SELECT * FROM '{src}/orders.parquet'
        UNION ALL SELECT 999900, NULL, 'O', 123.45, TIMESTAMP '2024-01-05', '1-URGENT')
        TO '{sf_dir}/orders.parquet' (FORMAT PARQUET)"""
    )
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    for qname in (
        "q20_join_inner_broadcast", "q21_join_shuffle_3way",
        "q22_join_left_outer", "q23_join_right_outer", "q24_join_full_outer",
        "q25_join_semi", "q26_join_anti", "q27_join_theta", "q28_join_asof",
        "q29_exists_subquery", "q126_cdc_apply", "q138_snapshot_diff",
    ):
        _assert_null_variant_parity(spark, qname, sf_dir, con)


def test_events_version_unique_counts_planted_duplicate(spark, tmp_path):
    """The CDC total-order precondition is ENFORCED, not just declared
    (round 8): q126/q138 version each key by (user_id, event_type, ts,
    event_id) and declare that tuple unique — a duplicate ties max_by
    and makes the winner engine-dependent. Plant an exact duplicate of
    one event row and prove (a) q123's events_version_unique rule counts
    it on BOTH twins (the report still hash-matches its oracle), and
    (b) the duplicated-payload case — the only duplicate shape the
    precondition permits through q126 deterministically — still leaves
    q126 in oracle parity (identical payload means the tie is
    value-invisible)."""
    import shutil

    import duckdb as _duck

    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    for name in (
        "region nation customer supplier part orders lineitem "
        "documents embeddings"
    ).split():
        shutil.copy(f"{src}/{name}.parquet", f"{sf_dir}/{name}.parquet")
    con = _duck.connect()
    con.execute(
        f"""COPY (SELECT * FROM '{src}/events.parquet'
        UNION ALL SELECT * FROM
          (SELECT * FROM '{src}/events.parquet' ORDER BY event_id LIMIT 1))
        TO '{sf_dir}/events.parquet' (FORMAT PARQUET)"""
    )
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    _assert_null_variant_parity(spark, "q123_dq_report", sf_dir, con)
    _assert_null_variant_parity(spark, "q126_cdc_apply", sf_dir, con)
    report = {
        r["rule"]: r["n_violations"]
        for r in QUERIES["q123_dq_report"].builder(spark, sf_dir).collect()
    }
    assert report["events_version_unique"] == 1


def test_null_doc_metadata_matches_oracle(spark, tmp_path):
    """NULL/garbage document metadata (round-7 probe): a NULL doc_id, a
    NULL lang, a NULL source, a NULL n_chars, and a source id WITHOUT the
    'srcN' numeric suffix, planted together. The probe found two classes:
    (a) the source-suffix policy keys (q84 tier, q102 snapshot index,
    q115/q124 mixture weight) aborted BOTH engines with an ANSI cast of
    '' — one odd source string killing the whole pass — now TRY_CAST with
    a declared default; (b) NULL doc_id made the salted md5 keys diverge
    (Spark CONCAT propagates NULL, DuckDB CONCAT ignores it: q85 split
    the row 'test'-vs-'train') and would shift q115's per-source ranks
    (NULLS FIRST vs LAST) — now a declared id-exclusion contract. This
    pins the whole probed family."""
    import shutil

    import duckdb as _duck

    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    for name in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        shutil.copy(f"{src}/{name}.parquet", f"{sf_dir}/{name}.parquet")
    con = _duck.connect()
    con.execute(
        f"""COPY (SELECT * FROM '{src}/documents.parquet'
        UNION ALL SELECT NULL, 'null doc id text with enough words to pass gates', 'en', 'web', 48
        UNION ALL SELECT 999100, 'null lang document text body', NULL, 'web', 28
        UNION ALL SELECT 999101, 'null source document text body', 'en', NULL, 30
        UNION ALL SELECT 999102, 'null nchars document text body', 'en', 'web', NULL)
        TO '{sf_dir}/documents.parquet' (FORMAT PARQUET)"""
    )
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    for qname in (
        "q84_stratified_sample", "q85_train_split", "q86_sequence_packing",
        "q97_corpus_build", "q99_source_cap", "q102_incremental_dedup",
        "q111_chunk_dedup", "q115_dataset_mixture", "q124_dataset_mixture_hash",
    ):
        _assert_null_variant_parity(spark, qname, sf_dir, con)


def test_math_domain_guards_match_oracle(spark, tmp_path):
    """Out-of-domain math (round-7 probe): DuckDB RAISES on SQRT(negative)
    and LN(non-positive) while Spark returns NaN/NULL — a single garbage
    row (negative quantity, price below -1) aborted q42's oracle. Both
    twins now declare NULL via the identical CASE domain guard; this
    plants both corners plus a NULL shipdate and zero price."""
    import shutil

    import duckdb as _duck

    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    for name in (
        "region nation customer supplier part orders events documents embeddings"
    ).split():
        shutil.copy(f"{src}/{name}.parquet", f"{sf_dir}/{name}.parquet")
    con = _duck.connect()
    con.execute(
        f"""COPY (SELECT * FROM '{src}/lineitem.parquet'
        UNION ALL SELECT 1, 1, 1, 99, -5.0, 100.0, 0.1, 0.05, 'R', 'F', NULL
        UNION ALL SELECT 2, 2, 2, 98, 3.0, -2.5, 0.0, 0.0, 'N', 'O',
                  TIMESTAMP '2024-02-01'
        UNION ALL SELECT 3, 3, 3, 97, 1.0, 0.0, 1.0, 0.0, 'N', 'O',
                  TIMESTAMP '1970-01-01')
        TO '{sf_dir}/lineitem.parquet' (FORMAT PARQUET)"""
    )
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    _assert_null_variant_parity(spark, "q42_math_battery", sf_dir, con)


def test_duplicate_vec_id_caught_by_dq_report(spark, tmp_path):
    """vec_id uniqueness is the vector family's declared PRECONDITION, not
    a per-query filter (a cross-row invariant would cost every vector
    query a shuffle); q123's data-quality report is the enforcement
    point. Plant two duplicated ids and assert the report counts them —
    and still hash-matches its oracle on the garbage input."""
    import shutil

    import duckdb as _duck

    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    for name in (
        "region nation customer supplier part orders lineitem events documents"
    ).split():
        shutil.copy(f"{src}/{name}.parquet", f"{sf_dir}/{name}.parquet")
    con = _duck.connect()
    con.execute(
        f"""COPY (SELECT * FROM '{src}/embeddings.parquet'
        UNION ALL SELECT 5, list_transform(generate_series(1, 64),
                         x -> 0.25::FLOAT), 1
        UNION ALL SELECT 450, list_transform(generate_series(1, 64),
                         x -> CAST(x % 3 AS FLOAT) / 3), 0)
        TO '{sf_dir}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    _assert_null_variant_parity(spark, "q123_dq_report", sf_dir, con)
    rows = {
        r.rule: r
        for r in QUERIES["q123_dq_report"].builder(spark, sf_dir).collect()
    }
    dq = rows["embeddings_vec_id_unique"]
    assert dq.n_violations == 2 and dq.n_checked == 502


def test_window_boundary_ties_match_oracle(spark, tmp_path):
    """Exact-boundary timestamps (round-7 probe, CLEAN — pinned so a
    regression surfaces): events precisely on tumbling-window edges, a
    pair exactly one session gap apart, duplicate (user_id, ts) rows
    differing only in event_id, and a microsecond past a window edge.
    The whole time-window/as-of/funnel/SCD family probed identical on
    both twins — the r5/r6 total-order tiebreaks (event_id everywhere a
    ts orders rows) and half-open bucket conventions carry these."""
    import shutil

    import duckdb as _duck

    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    for name in (
        "region nation customer supplier part orders lineitem documents embeddings"
    ).split():
        shutil.copy(f"{src}/{name}.parquet", f"{sf_dir}/{name}.parquet")
    con = _duck.connect()
    con.execute(
        f"""COPY (SELECT * FROM '{src}/events.parquet'
        UNION ALL SELECT 999010, TIMESTAMP '2024-01-03 00:00:00', 777001, 'view', 1.0, '{{}}'
        UNION ALL SELECT 999011, TIMESTAMP '2024-01-03 00:30:00', 777001, 'view', 2.0, '{{}}'
        UNION ALL SELECT 999012, TIMESTAMP '2024-01-03 01:00:00', 777001, 'purchase', 3.0, '{{}}'
        UNION ALL SELECT 999013, TIMESTAMP '2024-01-03 01:00:00', 777001, 'view', 4.0, '{{}}'
        UNION ALL SELECT 999014, TIMESTAMP '2024-01-03 01:00:00', 777002, 'view', 5.0, '{{}}'
        UNION ALL SELECT 999015, TIMESTAMP '2024-01-03 02:00:00.000001', 777002, 'purchase', 6.0, '{{}}')
        TO '{sf_dir}/events.parquet' (FORMAT PARQUET)"""
    )
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    for qname in (
        "q28_join_asof", "q60_dedup_exact", "q61_tumbling_window",
        "q62_sliding_window", "q63_session_window", "q66_time_rollup",
        "q101_event_funnel", "q103_gaps_islands", "q107_event_paths",
        "q117_scd2_intervals", "q129_growth_curve", "q134_scd2_resolve",
        "q139_conversion_latency", "q140_topk_others",
    ):
        _assert_null_variant_parity(spark, qname, sf_dir, con)


def test_multibyte_names_match_oracle(spark, tmp_path):
    """Unicode case-mapping/substring parity on the string battery and
    the fuzzy-linkage deletion keys: planted customer names exercise
    sharp-s, Greek capital/final sigma, CJK, and combining-free accents.
    Probed clean in round 6 (both engines are Unicode-aware); this pins
    it so a collation/ICU change in either engine surfaces."""
    import shutil

    import duckdb as _duck

    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    for name in (
        "region nation supplier part orders lineitem events documents embeddings"
    ).split():
        shutil.copy(f"{src}/{name}.parquet", f"{sf_dir}/{name}.parquet")
    con = _duck.connect()
    con.execute(
        f"""COPY (SELECT * FROM '{src}/customer.parquet'
        UNION ALL SELECT 999950, 'Müller, Þórður & 龍-ñandú ß', 3, 123.45, 'BUILDING'
        UNION ALL SELECT 999951, 'ÉCLAIR époque  ΣΙΣΥΦΟΣ σίσυφος', 4, 200.0, 'AUTOMOBILE'
        -- round-9 probe teeth: WITHIN-THRESHOLD pairs whose single edit
        -- touches (or sits beside) a multibyte character. DuckDB's raw
        -- byte-based LEVENSHTEIN scores the e->e-acute substitution 2 and
        -- would drop the pair the Spark side (codepoint distance 1)
        -- keeps; the oracle's alphabet-remap must agree with Spark on
        -- both membership and the dist value.
        UNION ALL SELECT 999952, 'Çelik#999952x', 5, 10.0, 'MACHINERY'
        UNION ALL SELECT 999953, 'Çelik#999952y', 5, 11.0, 'MACHINERY'
        UNION ALL SELECT 999954, 'Pair 😀 one', 6, 12.0, 'HOUSEHOLD'
        UNION ALL SELECT 999955, 'Pair 😀 oné', 6, 13.0, 'HOUSEHOLD')
        TO '{sf_dir}/customer.parquet' (FORMAT PARQUET)"""
    )
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    for qname in ("q40_string_battery", "q118_fuzzy_match"):
        _assert_null_variant_parity(spark, qname, sf_dir, con)
    # the multibyte near-pairs must actually be FOUND (distance 1 across
    # a multibyte boundary), not merely agreed-absent
    got = {
        (r.custkey_a, r.custkey_b, r.dist)
        for r in QUERIES["q118_fuzzy_match"].builder(spark, sf_dir).collect()
    }
    assert (999952, 999953, 1) in got, "multibyte substitution pair missed"
    assert (999954, 999955, 1) in got, "astral-adjacent accent pair missed"


def test_zero_norm_user_excluded_from_similarity(spark, tmp_path):
    """Round-8 -0.0 probe pin: a user whose every active day rounds to 0
    cents — an all-(-0.0) profile, or a day whose +5.00/-5.00 events
    cancel — has a zero activity direction. Cosine is then 0/0, which
    RAISED DIVIDE_BY_ZERO under ANSI on the Spark side while the oracle
    kept computing; both twins now exclude zero-norm users from the
    similarity universe (norms ... WHERE nrm > 0 — the behavioral twin
    of round 7's valid-vector contract). Plants all three shapes and
    asserts q106 hash-parity plus the planted users' absence."""
    sf_dir, con = _null_variant_fixture(
        tmp_path,
        "SELECT 999101, TIMESTAMP '2024-01-15 12:00:00.5', 888101, "
        "'purchase', -0.0, '{}' "
        "UNION ALL SELECT 999102, TIMESTAMP '2024-01-15 12:01:00.5', 888101, "
        "'view', -0.0, '{}' "
        "UNION ALL SELECT 999103, TIMESTAMP '2024-01-16 09:00:00', 888102, "
        "'purchase', -0.0, '{}' "
        "UNION ALL SELECT 999104, TIMESTAMP '2024-01-16 10:00:00', 888103, "
        "'purchase', 5.0, '{}' "
        "UNION ALL SELECT 999105, TIMESTAMP '2024-01-16 11:00:00', 888103, "
        "'purchase', -5.0, '{}'",
    )
    _assert_null_variant_parity(spark, "q106_user_similarity", sf_dir, con)
    got = QUERIES["q106_user_similarity"].builder(spark, sf_dir).collect()
    assert got, "similarity must still produce rows for the healthy users"
    planted = {888101, 888102, 888103}
    touched = {r.user_id for r in got} | {r.other_id for r in got}
    assert not (planted & touched), "zero-norm users leaked into the universe"


@_pytest_mod.mark.parametrize(
    "qname",
    [
        "q61_tumbling_window",
        "q62_sliding_window",
        "q63_session_window",
        "q66_time_rollup",
    ],
)
def test_exact_boundary_microsecond_ts_matches_oracle(spark, tmp_path, qname):
    """Round-8 probe, CLEAN class pinned as a regression test: the shipped
    generator's microsecond timestamps never land exactly ON a window
    boundary, so the half-open-interval edges were unprobed. Plants ts at
    an exact hour/10-min/5-min boundary and ±1 µs around it, a midnight
    edge, and session gaps of exactly 30 min and 30 min ± 1 µs (three
    users) — every bucketing and gap comparison must agree across the
    twins at full µs precision. Probed green across all 121 oracled
    queries in round 8; this pins the window family permanently."""
    sf_dir, con = _null_variant_fixture(
        tmp_path,
        "SELECT 999301, TIMESTAMP '2024-01-15 10:00:00.000000', 888301, 'view', 1.0, '{}' "
        "UNION ALL SELECT 999302, TIMESTAMP '2024-01-15 09:59:59.999999', 888301, 'view', 2.0, '{}' "
        "UNION ALL SELECT 999303, TIMESTAMP '2024-01-15 10:00:00.000001', 888301, 'view', 3.0, '{}' "
        "UNION ALL SELECT 999304, TIMESTAMP '2024-01-16 00:00:00.000000', 888302, 'purchase', 4.0, '{}' "
        "UNION ALL SELECT 999305, TIMESTAMP '2024-01-15 23:59:59.999999', 888302, 'purchase', 5.0, '{}' "
        "UNION ALL SELECT 999306, TIMESTAMP '2024-01-17 12:00:00.000000', 888303, 'view', 1.0, '{}' "
        "UNION ALL SELECT 999307, TIMESTAMP '2024-01-17 12:30:00.000000', 888303, 'view', 1.0, '{}' "
        "UNION ALL SELECT 999308, TIMESTAMP '2024-01-17 12:00:00.000000', 888304, 'view', 1.0, '{}' "
        "UNION ALL SELECT 999309, TIMESTAMP '2024-01-17 12:29:59.999999', 888304, 'view', 1.0, '{}' "
        "UNION ALL SELECT 999310, TIMESTAMP '2024-01-17 12:00:00.000000', 888305, 'view', 1.0, '{}' "
        "UNION ALL SELECT 999311, TIMESTAMP '2024-01-17 12:30:00.000001', 888305, 'view', 1.0, '{}'",
    )
    _assert_null_variant_parity(spark, qname, sf_dir, con)


@_pytest_mod.mark.parametrize(
    "qname",
    [
        "q61_tumbling_window",
        "q62_sliding_window",
        "q63_session_window",
        "q66_time_rollup",
        "q129_growth_curve",
    ],
)
def test_extreme_and_pregregorian_ts_matches_oracle(spark, tmp_path, qname):
    """Round-9 probe, CLEAN class pinned: pre-Gregorian-cutover
    timestamps (1582-10-04, and 1582-10-10 — a date that never existed
    under the historical Julian→Gregorian switch), year 0001, year 9999,
    and the 1899/1900 boundary, written to parquet by DuckDB and read by
    Spark. Both engines are proleptic Gregorian and the parquet int64
    micros carry no Spark legacy-rebase metadata, so to_date / hour /
    date_trunc('week') / year agree exactly (probed across all five
    before pinning). Each extreme row belongs to its own fresh user so
    no per-user day-range operator (gap fill) spans millennia.

    Domain-edge finding (documented, not planted): rows within ONE
    WINDOW-WIDTH of the timestamp domain edges (0001-01-01 /
    9999-12-31) produce window/session bounds OUTSIDE the domain —
    Spark computes them fine internally, but PySpark's collect()
    converts to datetime.datetime (MINYEAR/MAXYEAR 1..9999) and raises
    'year 0 is out of range'. The fixture therefore sits the extremes
    one day inside each edge; the first/last representable day is out
    of the windowed operators' client-visible contract."""
    sf_dir, con = _null_variant_fixture(
        tmp_path,
        "SELECT 999401, TIMESTAMP '1582-10-04 12:00:00', 888401, 'view', 1.0, '{}' "
        "UNION ALL SELECT 999402, TIMESTAMP '1582-10-10 12:00:00', 888402, 'view', 2.0, '{}' "
        "UNION ALL SELECT 999403, TIMESTAMP '0001-01-02 12:00:00', 888403, 'purchase', 3.0, '{}' "
        "UNION ALL SELECT 999404, TIMESTAMP '9999-12-30 12:00:00.000001', 888404, 'view', 4.0, '{}' "
        "UNION ALL SELECT 999405, TIMESTAMP '1899-12-31 23:59:59', 888405, 'purchase', 5.0, '{}' "
        "UNION ALL SELECT 999406, TIMESTAMP '1900-01-01 00:00:00', 888406, 'view', 6.0, '{}'",
    )
    _assert_null_variant_parity(spark, qname, sf_dir, con)


@_pytest_mod.mark.parametrize(
    "qname",
    [
        "q121_ab_test",  # user_id % 2 variant split — the direct % class
        "q106_user_similarity",  # pmod(xxhash64(user_id), B) salting
        "q103_gaps_islands",  # per-user window partitioning
        "q60_dedup_exact",  # keyed dedup on raw ids
    ],
)
def test_negative_and_min_bigint_ids_match_oracle(spark, tmp_path, qname):
    """Round-9 probe, CLEAN class pinned: NEGATIVE ids down to
    BIGINT MIN through the %-variant split, hash salting, window
    partitioning and keyed dedup. The hazard probed for: Java/DuckDB %
    is sign-preserving (-7 % 2 = -1) while Python's is floor-based
    (-7 % 2 = 1) — a driver-side % leaking into bucketing would split
    the twins, and ABS(BIGINT MIN) would raise under ANSI. Neither path
    exists: divisibility tests are sign-agnostic, true bucketing uses
    pmod(xxhash64(...)), and no id passes through abs(). Both engines'
    own % semantics agree (C-style), so even the signed-shard case is
    twin-consistent."""
    sf_dir, con = _null_variant_fixture(
        tmp_path,
        "SELECT 999501, TIMESTAMP '2024-01-18 10:00:00', -1, 'view', 1.0, '{}' "
        "UNION ALL SELECT 999502, TIMESTAMP '2024-01-18 10:05:00', -1, 'purchase', 2.0, '{}' "
        "UNION ALL SELECT 999503, TIMESTAMP '2024-01-18 11:00:00', "
        "-9223372036854775808, 'view', 3.0, '{}' "
        "UNION ALL SELECT 999504, TIMESTAMP '2024-01-18 11:30:00', "
        "-9223372036854775808, 'view', 4.0, '{}' "
        "UNION ALL SELECT -999505, TIMESTAMP '2024-01-18 12:00:00', "
        "-7, 'purchase', 5.0, '{}'",
    )
    _assert_null_variant_parity(spark, qname, sf_dir, con)


def _weird_string_docs_fixture(tmp_path):
    """Round-8 probe fixture: whitespace-only and control-character source
    ids / langs / text through the policy-key (TRY_CAST src-suffix),
    salted-md5, tokenizer, and shingle paths. All 121 oracled queries
    probed GREEN on this data in round 8; the parametrized pin below keeps
    the most string-exposed family locked."""
    import shutil

    import duckdb as _duck

    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    for name in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        shutil.copy(f"{src}/{name}.parquet", f"{sf_dir}/{name}.parquet")
    con = _duck.connect()
    con.execute(
        f"""COPY (SELECT * FROM '{src}/documents.parquet'
            UNION ALL SELECT 980001, '   ', 'en', 'src1', 3
            UNION ALL SELECT 980002,
              'alpha' || chr(1) || 'beta' || chr(7) || 'gamma', 'en', 'src2', 16
            UNION ALL SELECT 980003,
              'line1' || chr(13) || chr(10) || 'line2' || chr(9) || 'tail',
              'en', 'src3', 17
            UNION ALL SELECT 980004, 'ordinary text for the policy paths',
              'en', '   ', 34
            UNION ALL SELECT 980005, 'another ordinary document body', 'en',
              'src' || chr(9) || '7', 30
            UNION ALL SELECT 980006, 'body with empty source', '', '', 22
            UNION ALL SELECT 980007, 'leading zero source suffix', 'en',
              'src07', 26)
            TO '{sf_dir}/documents.parquet' (FORMAT PARQUET)"""
    )
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    return sf_dir, con


@_pytest_mod.mark.parametrize(
    "qname",
    [
        "q84_stratified_sample",  # TRY_CAST policy keys on garbage suffixes
        "q85_train_split",  # salted-md5 keying with weird source/doc text
        "q102_incremental_dedup",  # source-suffix policy path
        "q115_dataset_mixture",  # policy keys + ordering over weird strings
        "q124_dataset_mixture_hash",  # hash-quota keys
        "q70_text_stats",  # tokenizer over control chars / CRLF
        "q71_lang_id",  # n-gram heuristics over control chars
        "q73_token_count_bpe",  # regex tokenization over whitespace-only text
        "q75_neardup_jaccard",  # shingles of whitespace-only text
        "q88_quality_gate",  # punct/stopword ratios over control chars
    ],
)
def test_weird_string_metadata_matches_oracle(spark, tmp_path, qname):
    sf_dir, con = _weird_string_docs_fixture(tmp_path)
    _assert_null_variant_parity(spark, qname, sf_dir, con)


def test_duplicate_doc_id_caught_by_dq_report(spark, tmp_path):
    """doc_id uniqueness is the document family's declared PRECONDITION
    (round 8, completing the identity triptych after vec_id and the CDC
    version tuple): q75 pair keys, q85's salted split, q102's keeper and
    q111's per-doc reassembly all assume one row per id. Plant two
    duplicated doc_ids and assert q123's report counts them — and still
    hash-matches its oracle on the garbage input."""
    import shutil

    import duckdb as _duck

    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    for name in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        shutil.copy(f"{src}/{name}.parquet", f"{sf_dir}/{name}.parquet")
    con = _duck.connect()
    con.execute(
        f"""COPY (SELECT * FROM '{src}/documents.parquet'
        UNION ALL SELECT 7, 'a second document claiming id seven', 'en',
                         'src1', 35
        UNION ALL SELECT 42, 'and another claiming id forty-two', 'de',
                         'src2', 33)
        TO '{sf_dir}/documents.parquet' (FORMAT PARQUET)"""
    )
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    _assert_null_variant_parity(spark, "q123_dq_report", sf_dir, con)
    rows = {
        r.rule: r
        for r in QUERIES["q123_dq_report"].builder(spark, sf_dir).collect()
    }
    dq = rows["documents_doc_id_unique"]
    assert dq.n_violations == 2 and dq.n_checked > 2


@_pytest_mod.mark.parametrize(
    "qname",
    ["q80_cosine_topk", "q81_cosine_neardup", "q82_ann_ivf", "q90_kmeans_train", "q131_hard_negatives"],
)
def test_subnormal_embeddings_match_oracle(spark, tmp_path, qname):
    """Round-8 probe, CLEAN class pinned: subnormal floats (~1e-42) and
    the smallest normal float pass the valid-vector contract (finite,
    nonzero norm) and flow through the gradual-underflow regime of the
    cosine/norm math — float→double promotion plus 6-dp rounding must
    agree across the twins. Probed green over all 121 oracled queries;
    this pins the vector family permanently."""
    import shutil

    import duckdb as _duck

    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    for name in (
        "region nation customer supplier part orders lineitem events documents"
    ).split():
        shutil.copy(f"{src}/{name}.parquet", f"{sf_dir}/{name}.parquet")
    con = _duck.connect()
    con.execute(
        f"""COPY (SELECT * FROM '{src}/embeddings.parquet'
        UNION ALL SELECT 970001, list_transform(range(64),
                         i -> CAST(1e-42 AS FLOAT)), 2
        UNION ALL SELECT 970002, list_transform(range(64),
                         i -> CASE WHEN i = 0 THEN CAST(0.5 AS FLOAT)
                              ELSE CAST(-1e-42 AS FLOAT) END), 3
        UNION ALL SELECT 970003, list_transform(range(64),
                         i -> CAST(1.17549e-38 AS FLOAT)), 1)
        TO '{sf_dir}/embeddings.parquet' (FORMAT PARQUET)"""
    )
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    _assert_null_variant_parity(spark, qname, sf_dir, con)


# --- round-10 probe pins: hostile doubles, duplicate JSON keys, CDC ties ------


def test_q44_duplicate_key_payload_out_of_contract(spark, tmp_path):
    """Round-10 probe pin: for '{"k":1,"k":2}' Spark's struct from_json is
    LAST-wins (Jackson -> 2) while DuckDB's json_extract is FIRST-wins
    (yyjson -> 1) — and Spark's own get_json_object sides with yyjson, so
    no single answer is even internally consistent. Duplicate-TOP-level-key
    payloads are therefore OUT of the parse contract: every JSON column
    NULL, identically on both twins."""
    sf_dir, con = _null_variant_fixture(
        tmp_path,
        "SELECT 999105, TIMESTAMP '2024-02-10 14:00:00', 777005, 'view', "
        "2.0, '{\"k\":1,\"k\":2}' "
        "UNION ALL SELECT 999106, TIMESTAMP '2024-02-10 15:00:00', 777006, "
        "'view', 3.0, '{\"a\":1,\"k\":5,\"a\":2}'",
    )
    _assert_null_variant_parity(spark, "q44_json_battery", sf_dir, con)
    rows = {
        r.event_id: r
        for r in QUERIES["q44_json_battery"]
        .builder(spark, sf_dir)
        .filter(F.col("event_id").isin(999105, 999106))
        .collect()
    }
    for eid in (999105, 999106):
        r = rows[eid]
        assert (
            r.prop_k is None
            and r.prop_k_mod is None
            and r.prop_missing is None
            and r.prop_keys is None
            and r.n_props is None
        ), (eid, r)


def test_q123_dupkey_rule_flags_planted_payloads(spark, tmp_path):
    """The q44 contract's operator-facing surface: the q123 DQ report's
    events_props_dupkeys rule counts exactly the planted duplicate-key
    payloads, identically on both twins; unparseable and non-object
    payloads are NOT violations (they are out of contract for other,
    already-pinned reasons)."""
    sf_dir, con = _null_variant_fixture(
        tmp_path,
        "SELECT 999105, TIMESTAMP '2024-02-10 14:00:00', 777005, 'view', "
        "2.0, '{\"k\":1,\"k\":2}' "
        "UNION ALL SELECT 999106, TIMESTAMP '2024-02-10 15:00:00', 777006, "
        "'view', 3.0, 'not json at all'",
    )
    _assert_null_variant_parity(spark, "q123_dq_report", sf_dir, con)
    got = {
        r.rule: r.n_violations
        for r in QUERIES["q123_dq_report"].builder(spark, sf_dir).collect()
    }
    assert got["events_props_dupkeys"] == 1


def test_money_nan_inf_fail_loudly_on_both_twins(spark, tmp_path):
    """Round-10 probe pin (the NaN/Inf money sweep): a NaN or ±Infinity
    value entering the integer-cents path ABORTS both engines — Spark's
    ANSI cast raises, DuckDB's cast raises — rather than silently
    producing an engine-dependent row. Representative of the 8 queries
    the registry-wide sweep flagged (q35/q61/q62/q66/q106/q108/q126/
    q140); the remaining 113 hash-matched with the rows planted."""
    import pytest as _pytest

    sf_dir, con = _null_variant_fixture(
        tmp_path,
        "SELECT 999101, TIMESTAMP '2024-02-10 10:00:00', 777001, 'purchase', "
        "'NaN'::DOUBLE, '{}' "
        "UNION ALL SELECT 999103, TIMESTAMP '2024-02-10 12:00:00', 777003, "
        "'view', 'Infinity'::DOUBLE, '{}'",
    )
    for qname in ("q108_daily_value_bands", "q126_cdc_apply"):
        q = QUERIES[qname]
        with _pytest.raises(Exception):
            q.builder(spark, sf_dir).collect()
        with _pytest.raises(Exception):
            con.execute(q.oracle).fetchall()


def test_negzero_value_parity_through_value_family(spark, tmp_path):
    """Round-10 probe pin: -0.0 planted in events.value is CLEAN across
    the whole oracled registry (both engines normalize it identically
    through grouping, ordering, cents-casting and banding). Pinned here
    on the representative value-family queries so a future engine bump
    that changes -0.0 normalization fails a planted test, not the driver
    gate."""
    sf_dir, con = _null_variant_fixture(
        tmp_path,
        "SELECT 999102, TIMESTAMP '2024-02-10 11:00:00', 777002, 'purchase', "
        "-0.0, '{}'",
    )
    for qname in (
        "q108_daily_value_bands",
        "q126_cdc_apply",
        "q140_topk_others",
        "q61_tumbling_window",
    ):
        _assert_null_variant_parity(spark, qname, sf_dir, con)


def test_q123_version_unique_flags_duplicate_cdc_tuple(spark, tmp_path):
    """Round-10 probe pin (the CDC tie probe): two events with the SAME
    (user_id, event_type, ts, event_id) but different payloads violate
    the CDC family's declared total order — the loud failure is the q123
    events_version_unique rule counting them, identically on both twins.
    q126/q138 deliberately do NOT re-check the invariant per query (that
    would add a shuffle to every CDC read at 100 TB); this rule is the
    gate an operator runs first."""
    sf_dir, con = _null_variant_fixture(
        tmp_path,
        "SELECT 999107, TIMESTAMP '2024-02-10 16:00:00', 777007, 'purchase', "
        "50.0, '{}' "
        "UNION ALL SELECT 999107, TIMESTAMP '2024-02-10 16:00:00', 777007, "
        "'purchase', 0.5, '{}'",
    )
    _assert_null_variant_parity(spark, "q123_dq_report", sf_dir, con)
    got = {
        r.rule: r.n_violations
        for r in QUERIES["q123_dq_report"].builder(spark, sf_dir).collect()
    }
    assert got["events_version_unique"] == 1


def _documents_variant_fixture(tmp_path, extra_rows_sql):
    """Copy sf0.001 with extra hand-planted DOCUMENT rows (the shipped
    corpus is ASCII-only, so Unicode-semantics parity needs its own
    data) — returns (sf_dir, duckdb connection with all views)."""
    import shutil

    import duckdb as _duck

    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "embeddings"
    ).split():
        shutil.copy(f"{src}/{name}.parquet", f"{sf_dir}/{name}.parquet")
    con = _duck.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM '{src}/documents.parquet'
          UNION ALL {extra_rows_sql}
        ) TO '{sf_dir}/documents.parquet' (FORMAT PARQUET)
        """
    )
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return sf_dir, con


def test_q53_reverse_contract_is_codepoints(spark, tmp_path):
    """Round-10 probe pin: DuckDB's REVERSE flips grapheme clusters
    (utf8proc) while Python's s[::-1] — the engine's UDF — flips
    codepoints; for a combining-mark sequence the two disagree. The
    declared contract is CODEPOINT reversal, and the oracle spells it
    out via STRING_SPLIT(text, '') (codepoint-level, probed)."""
    combining = "cafe" + chr(0x0301) + " x"  # e + COMBINING ACUTE
    sf_dir, con = _documents_variant_fixture(
        tmp_path,
        f"SELECT 9990002, '{combining}', 'fr', 'web', 7",
    )
    _assert_null_variant_parity(spark, "q53_python_udf_crc", sf_dir, con)
    row = (
        QUERIES["q53_python_udf_crc"]
        .builder(spark, sf_dir)
        .filter(F.col("doc_id") == 9990002)
        .first()
    )
    assert row.reversed_text == combining[::-1]  # codepoint semantics


def test_q72_q97_dotted_i_fingerprint_engine_independent(spark, tmp_path):
    """Round-10 probe pin: LOWER(U+0130 'İ') is the one code point where
    the engines' case mappings disagree (Java SpecialCasing 'i'+U+0307
    vs utf8proc bare 'i') — and q72/q97 use the lowered text as a DEDUP
    key, so an 'İ'-bearing doc would get engine-dependent survivors.
    Both twins now expand the SpecialCasing form explicitly; the planted
    pair ('İstanbul…' vs its bare-'istanbul' twin) must stay DISTINCT
    under the fingerprint, identically on both engines."""
    sf_dir, con = _documents_variant_fixture(
        tmp_path,
        "SELECT 9990004, CHR(304) || 'stanbul kebap', 'tr', 'web', 14 "
        "UNION ALL SELECT 9990005, 'istanbul kebap', 'tr', 'web', 14",
    )
    for qname in ("q72_fingerprint", "q97_corpus_build"):
        _assert_null_variant_parity(spark, qname, sf_dir, con)
    fps = {
        r.doc_id: r.fingerprint
        for r in QUERIES["q72_fingerprint"]
        .builder(spark, sf_dir)
        .filter(F.col("doc_id").isin(9990004, 9990005))
        .collect()
    }
    assert fps[9990004] != fps[9990005]  # SpecialCasing form is preserved


def test_event_time_domain_parity_at_nanos_range_edges(spark, tmp_path):
    """Round-10 probe pin: the production events table is
    TIMESTAMP(NANOS) — int64 nanoseconds bounds its physically
    representable event times to ~[1677-09-21, 2262-04-11] — and the
    registry hash-matches across that ENTIRE domain (swept; rows planted
    at both edges here, through the window/rolling family whose date
    arithmetic reaches furthest). Timestamps a Python client cannot even
    hold (year 0/10000 after ±window arithmetic, the ValueError the
    out-of-domain sweep produced on collect) are unreachable in-domain:
    the storage type itself is the guard, no per-query filter needed."""
    sf_dir, con = _null_variant_fixture(
        tmp_path,
        "SELECT 9990205, TIMESTAMP '1677-09-22 00:30:00', 777205, 'view', "
        "1.5, '{}' "
        "UNION ALL SELECT 9990206, TIMESTAMP '2262-04-10 23:00:00', 777206, "
        "'purchase', 2.5, '{}'",
    )
    for qname in (
        "q104_rolling_active_users",
        "q62_sliding_window",
        "q63_session_window",
        "q66_time_rollup",
    ):
        _assert_null_variant_parity(spark, qname, sf_dir, con)


def test_empty_and_blank_event_type_parity(spark, tmp_path):
    """Round-10 probe pin: '' and ' ' event_type values flow through the
    whole registry hash-identically (swept clean) — grouping keys,
    funnels and CDC partitions treat the empty string as an ordinary
    value on both twins, never as NULL."""
    sf_dir, con = _null_variant_fixture(
        tmp_path,
        "SELECT 9990203, TIMESTAMP '2024-02-11 10:00:00', 777203, '', "
        "3.5, '{}' "
        "UNION ALL SELECT 9990204, TIMESTAMP '2024-02-11 11:00:00', 777204, "
        "' ', 4.5, '{}'",
    )
    for qname in ("q101_event_funnel", "q126_cdc_apply", "q66_time_rollup"):
        _assert_null_variant_parity(spark, qname, sf_dir, con)


def test_q40_special_casing_guard_is_loud(spark, tmp_path):
    """Round-10 probe pin: Java's UPPER applies SpecialCasing (ß -> 'SS',
    ﬁ -> 'FI') while DuckDB's simple map gives 'ẞ' / 'ﬁ'. The engine's
    declared semantics are Java full casing; the ORACLE refuses loudly
    on out-of-domain names instead of silently verifying the simple map.
    Planted 'straße' part: Spark computes 'STRASSE' (the contract), the
    oracle raises."""
    import shutil

    import duckdb as _duck

    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    for name in (
        "region nation customer supplier orders lineitem events "
        "documents embeddings"
    ).split():
        shutil.copy(f"{src}/{name}.parquet", f"{sf_dir}/{name}.parquet")
    con = _duck.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM '{src}/part.parquet'
          UNION ALL SELECT 9990301, 'straße linen', 'Brand#99', 'TYPE', 1, 1.0
        ) TO '{sf_dir}/part.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(f"CREATE VIEW part AS SELECT * FROM '{sf_dir}/part.parquet'")
    q = QUERIES["q40_string_battery"]
    row = (
        q.builder(spark, sf_dir).filter(F.col("p_partkey") == 9990301).first()
    )
    assert row.name_upper == "STRASSE LINEN"  # Java full casing, 2-for-1 ß
    with __import__("pytest").raises(Exception, match="domain violation"):
        con.execute(q.oracle).fetchall()


def _embeddings_variant_fixture(tmp_path, extra_rows_sql):
    """Copy sf0.001 with extra hand-planted EMBEDDING rows — returns
    (sf_dir, duckdb connection with all views)."""
    import shutil

    import duckdb as _duck

    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents"
    ).split():
        shutil.copy(f"{src}/{name}.parquet", f"{sf_dir}/{name}.parquet")
    con = _duck.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM '{src}/embeddings.parquet'
          UNION ALL {extra_rows_sql}
        ) TO '{sf_dir}/embeddings.parquet' (FORMAT PARQUET)
        """
    )
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return sf_dir, con


def test_hostile_embedding_elements_parity(spark, tmp_path):
    """Round-10 probe pin: vectors carrying a NaN element, an Infinity
    element, or a NULL element sweep CLEAN through the whole similarity
    family on both twins — the valid-vector contract (norm > 0 with
    identical NULL/NaN comparison semantics) and the spelled-out
    IS NOT NULL list predicates absorb them identically. Pinned on the
    family's representatives so an engine bump that changes NaN ordering
    or higher-order NULL handling fails here, not at the driver gate."""
    sf_dir, con = _embeddings_variant_fixture(
        tmp_path,
        "SELECT 9990501, LIST_TRANSFORM(RANGE(64), i -> CASE WHEN i = 0 "
        "THEN CAST('NaN' AS FLOAT) ELSE CAST(0.1 AS FLOAT) END), 3 "
        "UNION ALL SELECT 9990502, LIST_TRANSFORM(RANGE(64), i -> CASE "
        "WHEN i = 0 THEN CAST('Infinity' AS FLOAT) ELSE CAST(0.1 AS "
        "FLOAT) END), 3 "
        "UNION ALL SELECT 9990503, LIST_TRANSFORM(RANGE(64), i -> CASE "
        "WHEN i = 5 THEN CAST(NULL AS FLOAT) ELSE CAST(0.1 AS FLOAT) "
        "END), 3",
    )
    for qname in ("q80_cosine_topk", "q81_cosine_neardup", "q82_ann_ivf",
                  "q131_hard_negatives"):
        _assert_null_variant_parity(spark, qname, sf_dir, con)


def test_oversized_document_parity(spark, tmp_path):
    """Round-10 probe pin: a ~100 kB document (100× the fixture norm,
    ~19k tokens) sweeps CLEAN through the whole oracled registry — the
    text/chunking/quality family has no hidden length cliff on either
    twin. Pinned on the family's representatives. (At ~1 MB the sweep is
    bounded by the DUCKDB oracles' single-threaded all-pairs lists, not
    by the engine — an oracle-cost observation, not a divergence; noted
    in NOTES_r10.)"""
    big = "lorem ipsum straquat kebab 42 #x " * 3000 + "tail"
    sf_dir, con = _documents_variant_fixture(
        tmp_path,
        f"SELECT 9990401, '{big}', 'en', 'web', {len(big)}",
    )
    for qname in (
        "q70_text_stats",
        "q73_token_count_bpe",
        "q130_rag_chunker",
        "q88_quality_gate",
    ):
        _assert_null_variant_parity(spark, qname, sf_dir, con)


def test_q44_lone_surrogate_escape_out_of_contract(spark, tmp_path):
    """Round-10 probe pin: Jackson PARSES a payload whose string value
    carries a lone UTF-16 surrogate escape (map parse yields its keys)
    while yyjson rejects the whole payload as invalid — prop_keys was
    'k' vs NULL, a silent twin split. Payloads containing any
    uD8xx-uDFxx-shaped escape are OUT of the parse contract (lexical
    detector, conservatively including escaped-but-valid PAIRS; literal
    UTF-8 stays in contract), and the q123 surrogate rule counts them."""
    lone = '{"k":"' + chr(92) + 'ud800"}'
    pair = '{"k":"' + chr(92) + "ud83c" + chr(92) + 'udf89"}'
    sf_dir, con = _null_variant_fixture(
        tmp_path,
        "SELECT 9990601, TIMESTAMP '2024-02-12 10:00:00', 777601, 'view', "
        "1.0, '{\"k\":\"' || CHR(92) || 'ud800\"}' "
        "UNION ALL SELECT 9990602, TIMESTAMP '2024-02-12 11:00:00', "
        "777602, 'view', 2.0, "
        "'{\"k\":\"' || CHR(92) || 'ud83c' || CHR(92) || 'udf89\"}'",
    )
    _assert_null_variant_parity(spark, "q44_json_battery", sf_dir, con)
    _assert_null_variant_parity(spark, "q123_dq_report", sf_dir, con)
    rows = {
        r.event_id: r
        for r in QUERIES["q44_json_battery"]
        .builder(spark, sf_dir)
        .filter(F.col("event_id").isin(9990601, 9990602))
        .collect()
    }
    for eid in (9990601, 9990602):  # lone AND escaped-pair both excluded
        r = rows[eid]
        assert r.prop_keys is None and r.n_props is None, (eid, r)
    got = {
        r.rule: r.n_violations
        for r in QUERIES["q123_dq_report"].builder(spark, sf_dir).collect()
    }
    assert got["events_props_surrogate_escapes"] == 2


def test_control_char_customer_names_parity(spark, tmp_path):
    """Round-10 probe pin: control characters (SOH, newline, tab) inside
    c_name sweep CLEAN registry-wide — q118's symmetric-delete blocking,
    the join family and the conditionals treat them as ordinary bytes on
    both twins. Pinned on the name-handling representatives."""
    import shutil

    import duckdb as _duck

    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    for name in (
        "region nation supplier part orders lineitem events documents "
        "embeddings"
    ).split():
        shutil.copy(f"{src}/{name}.parquet", f"{sf_dir}/{name}.parquet")
    con = _duck.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM '{src}/customer.parquet'
          UNION ALL
          SELECT 9990701, 'Cust' || CHR(1) || 'omer#000000019', 1, 100.0,
                 'BUILDING'
          UNION ALL
          SELECT 9990702, 'Customer#000000019' || CHR(10), 1, 100.0,
                 'BUILDING'
        ) TO '{sf_dir}/customer.parquet' (FORMAT PARQUET)
        """
    )
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(
            f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    for qname in ("q118_fuzzy_match", "q43_conditional_battery"):
        _assert_null_variant_parity(spark, qname, sf_dir, con)


def _nul_plant_fixture(tmp_path):
    """Round-11 control-char fixture: raw U+0000 planted in every string
    surface the engines sort or group — document text tokens, customer
    names, event_type — plus props payloads carrying the ESCAPED form
    (raw NUL is invalid JSON on both engines, probed). Built with
    chr(0)-concatenation: a raw NUL byte cannot ride inside a SQL
    literal."""
    import shutil

    import duckdb as _duck

    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    for name in "region nation supplier part orders lineitem embeddings".split():
        shutil.copy(f"{src}/{name}.parquet", f"{sf_dir}/{name}.parquet")
    con = _duck.connect()
    con.execute(
        f"""
        COPY (
          SELECT * FROM '{src}/events.parquet'
          UNION ALL SELECT 9991101, TIMESTAMP '2024-02-12 10:00:00', 777101,
            'vi' || CHR(0) || 'ew', 1.0, '{{}}'
          UNION ALL SELECT 9991102, TIMESTAMP '2024-02-12 11:00:00', 777102,
            'vi', 2.0, '{{"k' || CHR(92) || 'u0000":1,"k":7}}'
          UNION ALL SELECT 9991103, TIMESTAMP '2024-02-12 12:00:00', 777103,
            'view', 3.0, '{{"s":"a' || CHR(92) || 'u0000b","k":2}}'
        ) TO '{sf_dir}/events.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT * FROM '{src}/documents.parquet'
          UNION ALL SELECT 9991101,
            'ab ab' || CHR(0) || ' a spark ab', 'en', 'web', 18
          UNION ALL SELECT 9991102,
            'zz zz' || CHR(0) || 'c zza wiki text', 'en', 'wiki', 20
        ) TO '{sf_dir}/documents.parquet' (FORMAT PARQUET)
        """
    )
    con.execute(
        f"""
        COPY (
          SELECT * FROM '{src}/customer.parquet'
          UNION ALL SELECT 9991101, 'Cust' || CHR(0) || 'omer#000000019',
            1, 100.0, 'BUILDING'
        ) TO '{sf_dir}/customer.parquet' (FORMAT PARQUET)
        """
    )
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    return sf_dir, con


@_pytest_mod.mark.parametrize(
    "qname",
    [
        # the two that DIVERGED before the round-11 pins — both are
        # sort-VALUED outputs (array_sort/LIST_SORT joined into a string):
        # DuckDB's sort-key encoding truncates at an embedded U+0000
        # ('k'||chr(0) TIES with 'k' in ORDER BY/LIST_SORT/RANK — probed —
        # while its own =/< compare byte-exactly), Spark sorts byte-exact
        "q44_json_battery",   # prop_keys: NUL-escape payloads now out of contract
        "q45_array_battery",  # head_vocab: NUL-bearing text now NULL both twins
        "q123_dq_report",     # carries the new events_props_nul_escapes rule
        # representatives of the SWEPT-CLEAN classes (registry-wide sweep
        # with these plants: zero divergences outside q44/q45): grouping,
        # equality, tokenizing and top-k over NUL-bearing strings agree —
        # only sort-derived VALUES were affected
        "q40_string_battery",
        "q79_vocab_topk",
        "q08_distinct",
        "q140_topk_others",
    ],
)
def test_embedded_nul_strings_match_oracle(spark, tmp_path, qname):
    """Round-11 probe pin (the control-char wave, NUL case): raw U+0000 in
    text/name/event_type and escaped backslash-u0000 in props must
    hash-match on both twins everywhere — the two queries that diverged
    carry their contract fixes, the clean classes are locked in."""
    sf_dir, con = _nul_plant_fixture(tmp_path)
    _assert_null_variant_parity(spark, qname, sf_dir, con)


def test_q44_nul_escape_payload_out_of_contract(spark, tmp_path):
    """Round-11 probe pin, the specifics: a payload whose KEY decodes to
    an embedded NUL ('{"k\\u0000":1,"k":7}') made prop_keys' sorted join
    engine-dependent ('k,k<NUL>' on Spark vs 'k<NUL>,k' on DuckDB — the
    sort-key truncation). Payloads containing a backslash-u0000 escape
    anywhere are OUT of the parse contract (NULL everywhere, both twins;
    conservative lexical detector like the surrogate pin), and the q123
    rule counts exactly the planted pair."""
    sf_dir, con = _nul_plant_fixture(tmp_path)
    rows = {
        r.event_id: r
        for r in QUERIES["q44_json_battery"]
        .builder(spark, sf_dir)
        .filter(F.col("event_id").isin(9991102, 9991103))
        .collect()
    }
    for eid in (9991102, 9991103):  # key-NUL AND value-NUL both excluded
        r = rows[eid]
        assert r.prop_keys is None and r.n_props is None, (eid, r)
    got = {
        r.rule: r.n_violations
        for r in QUERIES["q123_dq_report"].builder(spark, sf_dir).collect()
    }
    assert got["events_props_nul_escapes"] == 2


def test_q45_nul_text_head_vocab_out_of_contract(spark, tmp_path):
    """Round-11 probe pin: head_vocab (the battery's one sort-valued
    column) is NULL on both twins for U+0000-bearing text — binary
    contamination, never prose — while the equality/count columns stay
    live and identical (asserted by the parity test above)."""
    sf_dir, con = _nul_plant_fixture(tmp_path)
    rows = {
        r.doc_id: r
        for r in QUERIES["q45_array_battery"]
        .builder(spark, sf_dir)
        .filter(F.col("doc_id").isin(9991101, 9991102))
        .collect()
    }
    for did in (9991101, 9991102):
        r = rows[did]
        assert r.head_vocab is None, (did, r)
        assert r.n_tokens is not None and r.first_token is not None, (did, r)


def test_json_number_boundaries_match_oracle(spark, tmp_path):
    """Round-11 probe pin (the number-precision wave — SWEPT CLEAN, no
    contract change needed): int64 boundaries (±2^63±1), uint64 edges,
    20- and 40-digit integers, double overflow (±1e309), underflow
    (1e-400), double max, high-precision decimals, and every
    spec-invalid number form (leading zero, +12, 0x1F, 1., .5, bare -)
    agree between Jackson and yyjson through q44's full column set:
    in-range INT32 parses, everything else degrades to NULL prop_k with
    the payload still IN contract (keys live), and invalid JSON is NULL
    everywhere on both twins. NaN/Infinity literals are accepted by BOTH
    parsers (non-standard extensions that happen to agree) — pinned as
    in-contract with NULL prop_k."""
    payloads = [
        "2147483647", "2147483648", "9223372036854775807",
        "-9223372036854775808", "9223372036854775808",
        "-9223372036854775809", "18446744073709551615",
        "18446744073709551616", "99999999999999999999",
        "9999999999999999999999999999999999999999",
        "1e309", "-1e309", "1e-400", "1.7976931348623157e308",
        "0.30000000000000004444", "1E2", "1e+2", "12.0",
        "012", "+12", "0x1F", "NaN", "Infinity", "1.", ".5",
    ]
    extra = " UNION ALL ".join(
        f"SELECT {9991200 + i}, TIMESTAMP '2024-02-12 10:00:00', 777200, "
        f"'view', 1.0, '{{\"k\":{p}}}'"
        for i, p in enumerate(payloads)
    )
    sf_dir, con = _null_variant_fixture(tmp_path, extra)
    _assert_null_variant_parity(spark, "q44_json_battery", sf_dir, con)
    rows = {
        r.event_id: r
        for r in QUERIES["q44_json_battery"]
        .builder(spark, sf_dir)
        .filter(F.col("event_id") >= 9991200)
        .collect()
    }
    assert rows[9991200].prop_k == 2147483647  # INT32 max parses
    for i in range(1, 18):  # every valid-JSON out-of-INT32 form: NULL k, keys live
        r = rows[9991200 + i]
        assert r.prop_k is None and r.prop_keys == "k", (payloads[i], r)
    for i in range(18, 21):  # spec-invalid forms: NULL everywhere
        r = rows[9991200 + i]
        assert r.prop_keys is None, (payloads[i], r)
    for i in (21, 22):  # NaN/Infinity: both parsers accept (extension parity)
        r = rows[9991200 + i]
        assert r.prop_k is None and r.prop_keys == "k", (payloads[i], r)
    for i in (23, 24):  # trailing-dot / leading-dot: invalid on both
        r = rows[9991200 + i]
        assert r.prop_keys is None, (payloads[i], r)


def test_astral_and_escaped_unicode_keys_match_oracle(spark, tmp_path):
    """Round-11 probe pin (SWEPT CLEAN registry-wide): astral-plane vs
    high-BMP sort order, and unicode-ESCAPED JSON keys.

    Sort order: UTF-16 code-unit comparison (Java String.compareTo) puts
    astral chars (surrogate-pair lead 0xD800) BEFORE U+E000..U+FFFF,
    while UTF-8 byte order puts astral AFTER all of BMP — but BOTH
    engines' sort paths are UTF-8-byte/codepoint-ordered (Spark
    UTF8String binary compare, DuckDB byte order), so sorted-value
    outputs agree on 'a<U+1F600>' vs 'a<U+F8FF>' vs 'a<U+FFFF>' tokens
    and keys.

    Escapes: a key written as a \\u00e9 escape decodes to the same key
    string as literal UTF-8 on both parsers BEFORE the sorted join —
    and the escaped+literal pair of the SAME key trips the dup-key
    contract identically on both twins (both count the decoded keys)."""
    import shutil

    import duckdb as _duck

    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    for name in (
        "region nation customer supplier part orders lineitem embeddings"
    ).split():
        shutil.copy(f"{src}/{name}.parquet", f"{sf_dir}/{name}.parquet")
    con = _duck.connect()
    payloads = [
        (992001, '{"a\U0001F600":1,"a\uF8FF":2,"ab":3}'),
        (992002, '{"\u00e9":1,"e":2}'),
        (992003, '{"\\u00e9x":1,"\u00e9x":2}'),  # escaped+literal same key => dup
        (992004, '{"\\u00e9":1,"f":2}'),
        (992005, '{"z\uFFFD":1,"z\uFFFF":2}'),
    ]
    con.execute(f"CREATE TABLE pe AS SELECT * FROM '{src}/events.parquet' LIMIT 0")
    for eid, p in payloads:
        con.execute(
            "INSERT INTO pe VALUES (?, TIMESTAMP '2024-01-01 00:00:00', 1, "
            "'view', 1.0, ?)",
            [eid, p],
        )
    con.execute(
        f"""COPY (SELECT * FROM '{src}/events.parquet' UNION ALL
            SELECT * FROM pe) TO '{sf_dir}/events.parquet' (FORMAT PARQUET)"""
    )
    con.execute(f"CREATE TABLE pd AS SELECT * FROM '{src}/documents.parquet' LIMIT 0")
    con.execute(
        "INSERT INTO pd VALUES (992001, ?, 'en', 'web', 30)",
        ["a\U0001F600 a\uF8FF ab a\uFFFF spark"],
    )
    con.execute(
        f"""COPY (SELECT * FROM '{src}/documents.parquet' UNION ALL
            SELECT * FROM pd) TO '{sf_dir}/documents.parquet' (FORMAT PARQUET)"""
    )
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    for qname in ("q44_json_battery", "q45_array_battery", "q79_vocab_topk"):
        _assert_null_variant_parity(spark, qname, sf_dir, con)
    rows = {
        r.event_id: r
        for r in QUERIES["q44_json_battery"]
        .builder(spark, sf_dir)
        .filter(F.col("event_id") >= 992001)
        .collect()
    }
    # astral + private-use + noncharacter keys: in contract, sorted joins agree
    assert rows[992001].n_props == 3
    assert rows[992005].n_props == 2
    # escaped key decodes before the join: é sorts after 'e'/'f' identically
    assert rows[992002].prop_keys == "e,\u00e9"
    assert rows[992004].prop_keys == "f,\u00e9"
    # escaped+literal pair of the SAME decoded key = duplicate => excluded
    assert rows[992003].prop_keys is None and rows[992003].n_props is None


def test_json_grammar_leniency_contract(spark, tmp_path):
    """Round-11 probe pin (the parser-flags wave — THREE grammars in
    play, probed pairwise-inconsistent: Jackson, yyjson, and Spark 4's
    variant parser):

    - SINGLE QUOTES ('{'k':1}'): Jackson's allowSingleQuotes is ON by
      Spark default and OFF in this engine (killed at the root) — both
      twins now reject;
    - TRAILING GARBAGE ('{"k":1}{"k":2}', a control byte, an extra
      brace, a comma-joined object): Jackson parses the FIRST value and
      ignores the rest, yyjson rejects — out of contract via the
      json_strict_tail depth scan (regex cannot catch comma-joined
      forms), identical list_reduce algorithm in the oracle;
    - TRAILING COMMA ('{"k":1,}'): the REVERSE split — yyjson accepts,
      Jackson rejects — out of contract via json_trailing_comma;
    - swept clean and locked: BOM/NBSP prefixes, comments, unquoted
      names, bare scalars, array roots, whitespace padding.

    The q123 rules count exactly the planted out-of-grammar payloads."""
    payloads = [
        (9991301, "{'k':1}"),                  # single quotes
        (9991302, '{"k":1,"s":\'x\'}'),        # single-quoted value
        (9991303, '{"k":1,}'),                 # trailing comma (yyjson-legal)
        (9991304, '{"k":1}{"k":2}'),           # concatenated objects
        (9991305, '{"k":1}' + chr(1)),         # control byte after value
        (9991306, '{"k":1}}'),                 # extra closer
        (9991307, '{"k":1},{"j":2}'),          # comma-joined second object
        (9991308, '  {"k":1}  '),              # ws padding: IN contract
        (9991309, '[{"k":1}]'),                # array root: non-object
        (9991310, '{"k":1 /*c*/}'),            # comment: invalid both
    ]
    extra = " UNION ALL ".join(
        "SELECT {}, TIMESTAMP '2024-02-12 10:00:00', 777300, 'view', 1.0, '{}'".format(
            eid, p.replace("'", "''")
        )
        for eid, p in payloads
    )
    sf_dir, con = _null_variant_fixture(tmp_path, extra)
    _assert_null_variant_parity(spark, "q44_json_battery", sf_dir, con)
    _assert_null_variant_parity(spark, "q123_dq_report", sf_dir, con)
    rows = {
        r.event_id: r
        for r in QUERIES["q44_json_battery"]
        .builder(spark, sf_dir)
        .filter(F.col("event_id") >= 9991301)
        .collect()
    }
    for eid in (9991301, 9991302, 9991303, 9991304, 9991305, 9991306,
                9991307, 9991309, 9991310):
        r = rows[eid]
        assert r.prop_keys is None and r.prop_k is None, (eid, r)
    assert rows[9991308].prop_k == 1 and rows[9991308].prop_keys == "k"
    got = {
        r.rule: r.n_violations
        for r in QUERIES["q123_dq_report"].builder(spark, sf_dir).collect()
    }
    # trailing garbage: concat, ctrl-after, extra closer, comma-joined
    assert got["events_props_trailing_garbage"] == 4
    assert got["events_props_trailing_commas"] == 1


def test_q110_multibyte_boundary_and_ip_chains_match_oracle(spark, tmp_path):
    """Round-11 probe pin: Java's \\b is UNICODE-aware (é / Arabic-Indic
    digits are word chars — no boundary, no match) while RE2's \\b is
    ASCII — 'é1.2.3.4é' was redacted by the oracle and skipped by the
    engine. q110's IPv4 rule now declares explicit ASCII boundaries
    (start/end or non-digit-non-dot on each side, capture-group guards —
    no \\b anywhere in the engine's oracle-checked patterns) with
    two-pass detection/redaction reaching the fixed point for adjacent
    addresses. Dotted chains like '1.2.3.4.5' are now left alone
    (stricter than \\b, declared)."""
    import shutil

    import duckdb as _duck

    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    for name in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        shutil.copy(f"{src}/{name}.parquet", f"{sf_dir}/{name}.parquet")
    con = _duck.connect()
    texts = [
        (9994001, "é1.2.3.4é end"),            # multibyte-adjacent: redact
        (9994002, "١ 192.168.0.1١ x"),         # Arabic-Indic digit adjacent
        (9994003, "a 1.2.3.4 5.6.7.8 9.8.7.6 4.3.2.1 b"),  # chain: two-pass fixed point
        (9994004, "ver 1.2.3.4.5 notip"),                # dotted chain: left alone
        (9994005, "x11234.5.6.7 partial"),               # digit-prefixed: left alone
    ]
    con.execute(f"CREATE TABLE pd AS SELECT * FROM '{src}/documents.parquet' LIMIT 0")
    for did, txt in texts:
        con.execute(
            "INSERT INTO pd VALUES (?, ?, 'en', 'web', ?)", [did, txt, len(txt)]
        )
    con.execute(
        f"""COPY (SELECT * FROM '{src}/documents.parquet' UNION ALL
            SELECT * FROM pd) TO '{sf_dir}/documents.parquet' (FORMAT PARQUET)"""
    )
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    _assert_null_variant_parity(spark, "q110_pii_redaction", sf_dir, con)
    rows = {
        r.doc_id: r
        for r in QUERIES["q110_pii_redaction"]
        .builder(spark, sf_dir)
        .filter(F.col("doc_id") >= 9994001)
        .collect()
    }
    assert rows[9994001].n_ips == 1 and "<IP>" in rows[9994001].redacted
    assert rows[9994002].n_ips == 1
    # four addresses one separator apart: two passes catch all of them
    assert rows[9994003].n_ips == 4
    assert rows[9994003].redacted.count("<IP>") == 4
    # doc 9994004 is %4==0, so the aug step PLANTS one real IP — the
    # dotted chain itself stays untouched beside it
    assert rows[9994004].n_ips == 1
    assert "1.2.3.4.5" in rows[9994004].redacted
    assert rows[9994004].redacted.count("<IP>") == 1
    assert rows[9994005].n_ips == 0


def test_vertical_tab_whitespace_class_matches_oracle(spark, tmp_path):
    """Round-11 probe pin (the \\s-class wave): Java's \\s is
    [ \\t\\n\\x0B\\f\\r] while RE2's omits \\x0B — the shared
    whitespace-collapse normalization made q72's dedup FINGERPRINT (and
    q97's canonical-dedup partition key) engine-dependent for
    vertical-tab-bearing text: the engine collapsed 'alpha\\x0Bbeta' to
    'alpha beta' while the oracle left it intact. Both twins now spell
    the Java class out explicitly, and \\s appears in NO oracle-twinned
    pattern (the new trailing-comma detector got the same fix before a
    driver row ever covered it). Pinned: a \\x0B doc pair that collides
    under the declared normalization, a \\f pair (in BOTH engines' \\s —
    was never split), and a payload with \\x0B between comma and
    closer."""
    import shutil

    import duckdb as _duck

    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    for name in (
        "region nation customer supplier part orders lineitem embeddings"
    ).split():
        shutil.copy(f"{src}/{name}.parquet", f"{sf_dir}/{name}.parquet")
    con = _duck.connect()
    con.execute(f"CREATE TABLE pd AS SELECT * FROM '{src}/documents.parquet' LIMIT 0")
    for did, txt in [
        (995001, "alpha\x0bbeta gamma shared tail"),
        (995002, "alpha beta gamma shared tail"),
        (995003, "form\x0cfeed here"),
        (995004, "form feed here"),
    ]:
        con.execute("INSERT INTO pd VALUES (?, ?, 'en', 'web', ?)", [did, txt, len(txt)])
    con.execute(
        f"""COPY (SELECT * FROM '{src}/documents.parquet' UNION ALL
            SELECT * FROM pd) TO '{sf_dir}/documents.parquet' (FORMAT PARQUET)"""
    )
    con.execute(f"CREATE TABLE pe AS SELECT * FROM '{src}/events.parquet' LIMIT 0")
    con.execute(
        "INSERT INTO pe VALUES (995001, TIMESTAMP '2024-01-01', 1, 'view', 1.0, ?)",
        ['{"k":1 ,\x0b}'],
    )
    con.execute(
        f"""COPY (SELECT * FROM '{src}/events.parquet' UNION ALL
            SELECT * FROM pe) TO '{sf_dir}/events.parquet' (FORMAT PARQUET)"""
    )
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    for qname in ("q72_fingerprint", "q97_corpus_build", "q44_json_battery",
                  "q123_dq_report", "q45_array_battery"):
        _assert_null_variant_parity(spark, qname, sf_dir, con)
    fps = {
        r.doc_id: r.fingerprint
        for r in QUERIES["q72_fingerprint"]
        .builder(spark, sf_dir)
        .filter(F.col("doc_id") >= 995001)
        .collect()
    }
    # the declared (Java) whitespace set collapses \x0B and \f alike:
    # each planted pair shares one canonical form — on BOTH twins
    assert fps[995001] == fps[995002]
    assert fps[995003] == fps[995004]


def test_json_value_shapes_match_oracle(spark, tmp_path):
    """Round-11 probe pin (SWEPT CLEAN): JSON VALUE shapes through q44 —
    null values, empty/whitespace keys, nested containers as values,
    NESTED duplicate keys (in contract: only TOP-level dups split the
    parsers), booleans, quoted numbers, escape-bearing string values —
    all agree between Jackson and yyjson through the full column set."""
    payloads = [
        (996001, '{"k":null}'),
        (996002, '{"s":null,"k":3}'),
        (996003, '{"":1}'),
        (996004, '{" ":1}'),
        (996005, '{"":1,"k":5}'),
        (996006, '{"a":{"x":1},"k":6}'),
        (996007, '{"a":[1,2,3],"k":7}'),
        (996008, '{"k":true}'),
        (996009, '{"k":"12"}'),
        (996010, '{"a":{"x":1,"x":2},"k":10}'),
        (996011, '{"a":{},"k":11}'),
    ]
    extra = " UNION ALL ".join(
        f"SELECT {eid}, TIMESTAMP '2024-02-12 10:00:00', 777400, 'view', 1.0, "
        f"'{p}'" for eid, p in payloads
    )
    sf_dir, con = _null_variant_fixture(tmp_path, extra)
    _assert_null_variant_parity(spark, "q44_json_battery", sf_dir, con)
    _assert_null_variant_parity(spark, "q123_dq_report", sf_dir, con)
    rows = {
        r.event_id: r
        for r in QUERIES["q44_json_battery"]
        .builder(spark, sf_dir)
        .filter(F.col("event_id") >= 996001)
        .collect()
    }
    # spot checks: typed-int k only for raw integer tokens; nested dups
    # and container values stay in contract with live keys
    assert rows[996001].prop_k is None and rows[996001].n_props == 1  # null value
    assert rows[996002].prop_k == 3 and rows[996002].n_props == 2
    assert rows[996005].prop_k == 5 and rows[996005].prop_keys == ",k"
    assert rows[996010].prop_k == 10 and rows[996010].n_props == 2
    assert rows[996008].prop_k is None and rows[996009].prop_k is None


def test_json_grammar_detectors_cross_engine_equivalence(spark):
    """Permanent form of the round-11 equivalence fuzz: the
    json_strict_tail depth scan (Spark higher-order aggregate vs the
    oracle's packed-BIGINT list_reduce — DuckDB 1.0 misbinds STRUCT
    accumulators, hence the encoding) and the trailing-comma detector
    must agree on EVERY input: the curated grammar corpus plus 400
    seeded random bracket/quote/backslash/control-char strings. A DuckDB
    upgrade that changes list_reduce or regex semantics fails here, not
    in a silent q44 split."""
    import random

    import duckdb as _duck

    from nsq2kinesis_spark.operators.scalars import (
        DUCK_JSON_STRICT_TAIL,
        JSON_WS_CLASS,
        json_strict_tail,
        json_trailing_comma,
    )

    random.seed(20260815)
    alphabet = '{}[]"\\:,19ab \t\n\rx\x01é'
    cases = [
        '{"k":1}', '{"k":1}{"k":2}', '{"k":1},{"j":2}', '{"k":1}}',
        '{"k":1}]', '{"k":1},', '{"k":1} "x"', '{"k":1}42', '  {"k":1}  ',
        '{"a":{"b":[1,2]}}', '{"a":[1],"b":2}', '{"k":1}\x01', '[1,2]',
        '[1,2]x', '42', '', ' ', '{', '}', '{{}}', '{}{}', '{"s":"}"}',
        '{"s":"[["}', '[[[]]]', '[]]', '{"s":"a\\"b}"}', '{"s":"\\\\"}',
        '{"s":"\\\\"}x', '{"k":1,}', '{"k":1 ,\x0b}', '{"k":[1,2,],}',
    ]
    for _ in range(400):
        cases.append(
            "".join(random.choice(alphabet) for _ in range(random.randint(0, 24)))
        )
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, p string"
    )
    got = {
        r.i: (bool(r.tail_ok), bool(r.tcomma))
        for r in df.select(
            "i",
            json_strict_tail(F.col("p")).alias("tail_ok"),
            json_trailing_comma(F.col("p")).alias("tcomma"),
        ).collect()
    }
    con = _duck.connect()
    tail_expr = DUCK_JSON_STRICT_TAIL.format(s="stripped2")
    comma_expr = f"regexp_matches(stripped2, ',{JSON_WS_CLASS}*[}}\\]]')"
    strip = (
        """regexp_replace(regexp_replace(?, '\\\\.', '', 'g'),"""
        """ '"[^"]*"', '""', 'g') AS stripped2"""
    )
    mismatches = []
    for i, c in enumerate(cases):
        tail, comma = con.execute(
            f"SELECT {tail_expr}, {comma_expr} FROM (SELECT {strip})", [c]
        ).fetchone()
        if (bool(tail), bool(comma)) != got[i]:
            mismatches.append((repr(c), got[i], (tail, comma)))
    assert not mismatches, mismatches[:5]


# ---------------------------------------------------------------------------
# Round-11 extended probe: ROUND(double, n) across engines. Spark rounds
# the shortest decimal repr HALF_UP (BigDecimal.valueOf(double)); DuckDB
# rounds x*10^n in binary (std::round, half away from zero). Inside the
# 2-decimal money contract the two are provably identical; past it they
# split on 0.46% of 3-decimal values, and on the IEEE sign of a zero
# result for inputs in (-0.05, 0).


def _price_variant_fixture(tmp_path, extra_lineitem_rows_sql):
    """Copy the sf0.001 tables with extra planted lineitem rows."""
    import shutil

    import duckdb as _duck

    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    for name in (
        "region nation customer supplier part orders events documents embeddings"
    ).split():
        shutil.copy(f"{src}/{name}.parquet", f"{sf_dir}/{name}.parquet")
    con = _duck.connect()
    con.execute(
        f"""COPY (SELECT * FROM '{src}/lineitem.parquet'
        {extra_lineitem_rows_sql})
        TO '{sf_dir}/lineitem.parquet' (FORMAT PARQUET)"""
    )
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    return sf_dir, con


def test_negative_money_round_zero_sign_matches_oracle(spark, tmp_path):
    """The zero-sign split, pinned CLOSED by the '+ 0.0' normalization:
    a 2-decimal price in (-0.05, 0) rounds to +0.0 on Spark (BigDecimal
    has no negative zero) and to -0.0 on DuckDB's binary path, and the
    driver's value hash is sign-sensitive (repr). q42 must hash-match
    under planted negative prices covering the zero band, the exact
    -0.05 boundary, and ordinary negative money."""
    sf_dir, con = _price_variant_fixture(
        tmp_path,
        """
        UNION ALL SELECT 999901, 1, 1, 1, 1.0, -0.04, 0.0, 0.0, 'N', 'O', TIMESTAMP '2024-03-02'
        UNION ALL SELECT 999902, 1, 1, 1, 1.0, -0.01, 0.0, 0.0, 'N', 'O', TIMESTAMP '2024-03-02'
        UNION ALL SELECT 999903, 1, 1, 1, 1.0, -0.05, 0.0, 0.0, 'N', 'O', TIMESTAMP '2024-03-02'
        UNION ALL SELECT 999904, 1, 1, 1, 1.0, -12.35, 0.0, 0.0, 'N', 'O', TIMESTAMP '2024-03-02'
        UNION ALL SELECT 999905, 1, 1, 1, 1.0, -0.10, 0.0, 0.0, 'N', 'O', TIMESTAMP '2024-03-02'
        """,
    )
    _assert_null_variant_parity(spark, "q42_math_battery", sf_dir, con)


def test_subcent_price_fails_q42_oracle_loudly(spark, tmp_path):
    """The 3-decimal rounding split, pinned OUT of contract via the LOUD
    oracle-domain guard (the q118/q40 ERROR() convention): a sub-cent
    price must fail the parity run rather than silently verify one
    engine's rounding personality. The underlying split is asserted
    first so the guard's reason stays mechanical: round(1.005, 2) is
    1.01 on Spark (decimal-string HALF_UP) and 1.0 on DuckDB (binary
    half-away — the double is 1.00499999999999989...)."""
    import duckdb as _duck

    import pytest as _pytest

    s = spark.sql("SELECT round(CAST(1.005 AS DOUBLE), 2)").first()[0]
    d = _duck.connect().execute("SELECT ROUND(CAST(1.005 AS DOUBLE), 2)").fetchone()[0]
    assert (s, d) == (1.01, 1.0), "engines changed their rounding personality"

    sf_dir, con = _price_variant_fixture(
        tmp_path,
        "UNION ALL SELECT 999901, 1, 1, 1, 1.0, 1.005, 0.0, 0.0,"
        " 'N', 'O', TIMESTAMP '2024-03-02'",
    )
    q = QUERIES["q42_math_battery"]
    # the engine side still computes (its semantics are declared)...
    assert q.builder(spark, sf_dir).count() > 0
    # ...but the ORACLE refuses the domain, so the parity run fails loudly.
    with _pytest.raises(_duck.Error, match="domain violation"):
        con.execute(q.oracle).fetchall()


def test_money_rounding_grid_matches_oracle(spark):
    """CLEAN class pinned exhaustively: every 2-decimal money value in
    [-99.99, 999.99] agrees across engines through BOTH rounding idioms
    the engine ships — price_r1's ROUND(x, 1) + 0.0 (zero-sign
    normalized) and the exact-cents CAST(ROUND(x*100) AS BIGINT) — under
    a sign-sensitive compare. A regression in either engine's rounding
    (or in the normalization) fails here, not in a silent q42/q01
    split."""
    import duckdb as _duck
    import numpy as np
    import pandas as pd

    x = np.arange(-9999, 100000, dtype=np.int64) / 100.0
    pdf = pd.DataFrame({"x": x})
    got = (
        spark.createDataFrame(pdf)
        .select(
            (F.round("x", 1) + F.lit(0.0)).alias("r1"),
            F.round(F.col("x") * 100, 0).cast("long").alias("c"),
        )
        .toPandas()
    )
    want = _duck.connect().execute(
        "SELECT ROUND(x, 1) + 0.0 AS r1, CAST(ROUND(x * 100) AS BIGINT) AS c FROM pdf"
    ).df()
    sv, dv = got.r1.values, want.r1.values
    bad = np.nonzero(
        (sv != dv) | (np.signbit(sv) != np.signbit(dv)) | (got.c.values != want.c.values)
    )[0]
    assert len(bad) == 0, f"{len(bad)} mismatches, first inputs: {x[bad][:5]}"


def test_double_to_string_cast_split_pinned(spark):
    """KNOWN-SPLIT class pinned, declared OUT of oracle contract: Spark
    stringifies doubles in Java scientific form ('1.0E10', '1.0E-7',
    'Infinity', 'NaN', '-0.0') while DuckDB uses positional/C form
    ('10000000000.0', '1e-07', 'inf', 'nan') — stringified doubles must
    never feed an oracled column or a cross-engine fingerprint. Every
    cast("string") in the registry is over BIGINT ids, which the second
    half asserts stringify identically.

    Probe footnote: a true -0.0 double stringifies as '-0.0' on BOTH
    engines (agreement, pinned below) — but only when the value is
    PARSED from a string: both engines type a bare -0.0 literal as
    DECIMAL, which has no negative zero."""
    import duckdb as _duck

    con = _duck.connect()
    splits = 0
    for spark_lit, duck_lit in [
        ("CAST(1e10 AS DOUBLE)", "CAST(1e10 AS DOUBLE)"),
        ("CAST(1e-7 AS DOUBLE)", "CAST(1e-7 AS DOUBLE)"),
        ("CAST('Infinity' AS DOUBLE)", "CAST('inf' AS DOUBLE)"),
        ("CAST('NaN' AS DOUBLE)", "CAST('nan' AS DOUBLE)"),
    ]:
        s = spark.sql(f"SELECT CAST({spark_lit} AS STRING)").first()[0]
        d = con.execute(f"SELECT CAST({duck_lit} AS VARCHAR)").fetchone()[0]
        splits += s != d
    assert splits == 4, "engines now agree on double formatting — revisit the contract"
    s = spark.sql("SELECT CAST(CAST('-0.0' AS DOUBLE) AS STRING)").first()[0]
    d = con.execute("SELECT CAST(CAST('-0.0' AS DOUBLE) AS VARCHAR)").fetchone()[0]
    assert s == d == "-0.0"
    # The in-contract half: BIGINT stringification is identical.
    for v in [42, -7, 0, 2**63 - 1, -(2**63)]:
        s = spark.sql(f"SELECT CAST(CAST({v} AS BIGINT) AS STRING)").first()[0]
        d = con.execute(f"SELECT CAST(CAST({v} AS BIGINT) AS VARCHAR)").fetchone()[0]
        assert s == d == str(v)


def test_null_fold_and_integer_division_clean_class(spark):
    """CLEAN classes pinned (round-11 extended probe): greatest/least
    skip NULLs on both engines (NULL only when every argument is NULL);
    integer division truncates toward zero and % takes the dividend's
    sign on both (Spark `div` == DuckDB `//`)."""
    import duckdb as _duck

    con = _duck.connect()
    s = spark.sql(
        "SELECT greatest(1, NULL, 3), least(1, NULL, 3),"
        " greatest(CAST(NULL AS INT), CAST(NULL AS INT))"
    ).first()
    d = con.execute(
        "SELECT greatest(1, NULL, 3), least(1, NULL, 3),"
        " greatest(CAST(NULL AS INT), CAST(NULL AS INT))"
    ).fetchone()
    assert tuple(s) == d == (3, 1, None)
    for a, b in [(-7, 2), (7, -2), (-7, -2), (7, 2)]:
        s = spark.sql(f"SELECT {a} div {b}, {a} % {b}").first()
        d = con.execute(f"SELECT {a} // {b}, {a} % {b}").fetchone()
        assert tuple(s) == d, f"integer division split at ({a}, {b})"


def test_double_to_bigint_cast_split_pinned(spark):
    """KNOWN-SPLIT class pinned (round-11 extended probe, found by this
    suite's own first draft claiming it clean): CAST(DOUBLE AS BIGINT)
    TRUNCATES toward zero on Spark-ANSI (Java semantics) but rounds
    HALF-EVEN on DuckDB (2.7 -> 2 vs 3; 1.5 -> 1 vs 2; 2.5 -> 2 vs 2).
    The matching oracle spelling for Spark's cast is
    TRUNC(x)::BIGINT — asserted exactly here. Exposure swept at pin
    time: every integer cast in every oracle is integral by
    construction (LEN/ROW_NUMBER/SUM-of-flags/%/digit strings), so no
    oracled query rides either personality; any future oracle that
    casts a fractional double must spell TRUNC() explicitly."""
    import duckdb as _duck

    con = _duck.connect()
    split_seen = 0
    for v in [2.7, -2.7, 2.5, -2.5, 1.5, -0.5, 3.49999]:
        s = spark.sql(f"SELECT CAST(CAST({v} AS DOUBLE) AS BIGINT)").first()[0]
        d_cast, d_trunc = con.execute(
            f"SELECT CAST(CAST({v} AS DOUBLE) AS BIGINT),"
            f" CAST(TRUNC(CAST({v} AS DOUBLE)) AS BIGINT)"
        ).fetchone()
        assert s == int(v), f"Spark stopped truncating at {v}"
        assert d_trunc == s, f"TRUNC() equivalence broke at {v}"
        split_seen += d_cast != s
    assert split_seen >= 3, "DuckDB cast now truncates — retire this contract"


# ---------------------------------------------------------------------------
# Round-11 extended probe, second wave: string-parse grammars across engines.


def _docs_variant_fixture(tmp_path, rows):
    """Copy the sf0.001 tables with extra planted documents rows.
    Each row is (doc_id, text, lang, source)."""
    import shutil

    import duckdb as _duck

    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    for name in (
        "region nation customer supplier part orders lineitem events embeddings"
    ).split():
        shutil.copy(f"{src}/{name}.parquet", f"{sf_dir}/{name}.parquet")
    con = _duck.connect()
    con.execute(
        "CREATE TABLE extra (doc_id BIGINT, text VARCHAR, lang VARCHAR,"
        " source VARCHAR, n_chars BIGINT)"
    )
    for doc_id, text, lang, source in rows:
        con.execute(
            "INSERT INTO extra VALUES (?, ?, ?, ?, ?)",
            [doc_id, text, lang, source, len(text or "")],
        )
    con.execute(
        f"""COPY (SELECT * FROM '{src}/documents.parquet'
        UNION ALL SELECT * FROM extra)
        TO '{sf_dir}/documents.parquet' (FORMAT PARQUET)"""
    )
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    return sf_dir, con


_LENIENT_TAIL_SOURCES = [
    "src1.5",    # DuckDB TRY_CAST rounds to 2; Spark yields NULL
    "src0x1F",   # DuckDB parses hex to 31; Spark yields NULL
    "src1e2",    # DuckDB parses scientific to 100; Spark yields NULL
    "src9.99",   # DuckDB rounds to 10; Spark yields NULL
    "src 7",     # both trim: WOULD parse as 7 bare — strict guard says NULL
    "src+7",     # both parse bare +7 — strict guard says NULL
    "src07",     # digits-only: parses as 7 on both, in contract
    "src18",     # plain in-contract id (> SNAPSHOT_MAX_SRC, lands in batch)
    "srcNaN",    # no digits: NULL on both
    "src",       # empty tail: NULL on both
]


@_pytest_mod.mark.parametrize(
    "qname", ["q84_stratified_sample", "q102_incremental_dedup"]
)
def test_lenient_source_tails_match_oracle(spark, tmp_path, qname):
    """The TRY_CAST-grammar split, pinned CLOSED by strict_digit_int_sql:
    DuckDB's TRY_CAST(VARCHAR AS INTEGER) leniently parses '1.5' -> 2,
    '0x1F' -> 31, '1e2' -> 100, '9.99' -> 10 where Spark-ANSI yields
    NULL — so the bare shared-SQL TRY_CAST twins silently placed the
    same document in different sampling tiers (q84) or on different
    sides of the dedup-snapshot split (q102). Both twins now admit only
    digits-only tails (identical grammar, probed incl. overflow), and
    every hostile tail must hash-match."""
    rows = [
        (990000 + i, f"tail doc {i} words here", "en", s)
        for i, s in enumerate(_LENIENT_TAIL_SOURCES)
    ]
    sf_dir, con = _docs_variant_fixture(tmp_path, rows)
    _assert_null_variant_parity(spark, qname, sf_dir, con)


def test_caret_dollar_anchor_split_pinned(spark):
    """KNOWN-SPLIT class pinned (round-11 extended probe, found while
    designing the strict-digit guard): Java's '$' matches before a
    trailing line terminator while RE2's matches only at end of text,
    so '^[0-9]+$' extracts '7' from '7\\n' on Spark and '' on DuckDB.
    No oracle-twinned pattern may use a bare trailing '$' on data
    (same register as the \\s and \\b bans); \\A..\\z anchors and the
    TRANSLATE digits-guard are the probed-identical spellings."""
    import duckdb as _duck

    con = _duck.connect()
    s = spark.createDataFrame([("7\n",)], "x string").select(
        F.regexp_extract("x", "^[0-9]+$", 0)
    ).first()[0]
    d = con.execute(
        "SELECT REGEXP_EXTRACT(chr(55) || chr(10), '^[0-9]+$', 0)"
    ).fetchone()[0]
    assert (s, d) == ("7", ""), "engines changed their $ semantics — re-probe"
    # the probed-identical spellings, asserted on the same hostile input:
    sa = spark.createDataFrame([("7\n",)], "x string").select(
        F.regexp_extract("x", "\\A[0-9]+\\z", 0)
    ).first()[0]
    da = con.execute(
        r"SELECT REGEXP_EXTRACT(chr(55) || chr(10), '\A[0-9]+\z', 0)"
    ).fetchone()[0]
    assert sa == da == ""
    st = spark.sql("SELECT TRANSLATE('7\\n', '0123456789', '') = ''").first()[0]
    dt = con.execute(
        "SELECT TRANSLATE(chr(55) || chr(10), '0123456789', '') = ''"
    ).fetchone()[0]
    assert st == dt is False


def test_q110_line_terminator_ip_tails_match_oracle(spark, tmp_path):
    """CLEAN class pinned: q110's IPv4 rule carries a data-exposed
    trailing '$' alternative — but inside a RESTORED capture group
    ('(^|[^0-9.])(ip)($|[^0-9.])' -> '\\1<IP>\\3'), the Java
    zero-width-before-final-newline match and the RE2
    consume-the-newline match produce byte-identical output, and the
    group-2 counts agree. Pinned on IPs tailed by \\n, \\r\\n, \\r+text,
    space, end-of-text, and a two-IP chain."""
    texts = [
        "ip 1.2.3.4\n", "ip 1.2.3.4\r\n", "1.2.3.4\rX", "ip 1.2.3.4 ",
        "1.2.3.4", "ip 1.2.3.4tail", "a 1.2.3.4\nb 5.6.7.8\n",
    ]
    rows = [(991000 + i, t, "en", "src1") for i, t in enumerate(texts)]
    sf_dir, con = _docs_variant_fixture(tmp_path, rows)
    _assert_null_variant_parity(spark, "q110_pii_redaction", sf_dir, con)


def test_string_parse_leniency_splits_pinned(spark):
    """KNOWN-SPLIT classes pinned, declared out of oracle contract (no
    oracled query parses doubles or timestamps from data strings):
    Spark's string->double accepts Java numeric suffixes ('1d' -> 1.0;
    DuckDB NULL); Spark's timestamp parse trims outer whitespace
    (' 2024-03-01 ' parses; DuckDB NULL) while DuckDB accepts
    slash-dates ('2024/03/01' parses; Spark NULL). Agreement on the
    common grammar (ISO forms, T separator, fractional seconds, zone
    offsets, invalid dates -> NULL) is asserted alongside."""
    import duckdb as _duck

    con = _duck.connect()

    def pair(expr_s, expr_d):
        s = spark.sql(f"SELECT {expr_s}").first()[0]
        d = con.execute(f"SELECT {expr_d}").fetchone()[0]
        return s, d

    s, d = pair("TRY_CAST('1d' AS DOUBLE)", "TRY_CAST('1d' AS DOUBLE)")
    assert (s, d) == (1.0, None)
    s, d = pair(
        "TRY_CAST(' 2024-03-01 ' AS TIMESTAMP)",
        "TRY_CAST(' 2024-03-01 ' AS TIMESTAMP)",
    )
    assert s is not None and d is None
    s, d = pair(
        "TRY_CAST('2024/03/01' AS TIMESTAMP)",
        "TRY_CAST('2024/03/01' AS TIMESTAMP)",
    )
    assert s is None and d is not None
    for lit in [
        "'2024-03-01T12:00:00'",
        "'2024-03-01 12:00:00.123456789'",
        "'2024-03-01 12:00:00+05:30'",
        "'2024-13-01'",
        "'2024-02-30'",
        "'20240301'",
    ]:
        s, d = pair(
            f"CAST(TRY_CAST({lit} AS TIMESTAMP) AS STRING)",
            f"CAST(TRY_CAST({lit} AS TIMESTAMP) AS VARCHAR)",
        )
        assert str(s) == str(d), f"common-grammar timestamp split at {lit}"


def test_array_sort_ieee_ordering_clean_class(spark):
    """CLEAN class pinned (round-11 extended probe): array_sort /
    list_sort order NaN, ±Inf, -0.0-vs-0.0, and NULL identically
    (-inf < -0.0 < 0.0 < finite < nan < NULL, with -0.0 kept BEFORE 0.0
    and the zero signs preserved in the output)."""
    import math

    import duckdb as _duck

    s = spark.sql(
        "SELECT array_sort(array(CAST('nan' AS DOUBLE), 1.0D,"
        " CAST('-0.0' AS DOUBLE), 0.0D, CAST('-Infinity' AS DOUBLE), NULL))"
    ).first()[0]
    d = _duck.connect().execute(
        "SELECT list_sort([CAST('nan' AS DOUBLE), 1.0,"
        " CAST('-0.0' AS DOUBLE), 0.0, CAST('-inf' AS DOUBLE), NULL])"
    ).fetchone()[0]
    assert len(s) == len(d) == 6
    for a, b in zip(s, d):
        if a is None or b is None:
            assert a is None and b is None
        elif math.isnan(a) or math.isnan(b):
            assert math.isnan(a) and math.isnan(b)
        else:
            assert a == b and math.copysign(1, a) == math.copysign(1, b)


def test_null_part_metadata_matches_oracle(spark, tmp_path):
    """The CONCAT NULL-fold split, pinned CLOSED on q40: DuckDB's
    CONCAT() skips NULL arguments (a NULL p_name TRIMs to '' and a NULL
    p_brand yields ':type') while Spark's concat propagates NULL. Both
    twins now spell the composites with '||' / F.concat (NULL metadata
    => NULL composite, declared); planted NULL-name/brand/type part
    rows must hash-match."""
    import shutil

    import duckdb as _duck

    src = "/root/testdata/sf0.001"
    sf_dir = str(tmp_path / "sf")
    (tmp_path / "sf").mkdir()
    for name in (
        "region nation customer supplier orders lineitem events "
        "documents embeddings"
    ).split():
        shutil.copy(f"{src}/{name}.parquet", f"{sf_dir}/{name}.parquet")
    con = _duck.connect()
    # part schema: (p_partkey, p_name, p_brand, p_type, p_size,
    # p_retailprice DOUBLE) — the last value must stay numeric or the
    # UNION retypes the whole fixture column to VARCHAR
    con.execute(
        f"""COPY (SELECT * FROM '{src}/part.parquet'
        UNION ALL SELECT 999901, NULL, 'Brand#99', 'TYPE X', 1, 12.34
        UNION ALL SELECT 999902, 'null brand part', NULL, 'TYPE Y', 2, 5.00
        UNION ALL SELECT 999903, 'null type part', 'Brand#98', NULL, 3, 7.77
        UNION ALL SELECT 999904, NULL, NULL, NULL, NULL, NULL)
        TO '{sf_dir}/part.parquet' (FORMAT PARQUET)"""
    )
    for name in (
        "region nation customer supplier part orders lineitem events "
        "documents embeddings"
    ).split():
        con.execute(f"CREATE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'")
    _assert_null_variant_parity(spark, "q40_string_battery", sf_dir, con)


def test_concat_null_fold_split_pinned(spark):
    """KNOWN-SPLIT class pinned (round-11 extended probe): CONCAT()
    folds NULLs per engine personality — Spark propagates (NULL result),
    DuckDB skips the NULL but keeps every literal ('a'||NULL||'b' is
    NULL on both, but CONCAT('a', NULL, 'b') is NULL vs 'ab'). Never
    pair CONCAT() across the twins; '||' null-propagates identically
    and concat_ws/array_to_string null-SKIP identically (but concat_ws
    drops the separator with the NULL — not a '||' substitute)."""
    import duckdb as _duck

    con = _duck.connect()
    s = spark.sql(
        "SELECT CONCAT('a', NULL, 'b'), 'a' || NULL || 'b',"
        " concat_ws(':', 'a', NULL, 'b'), array_join(array('a', NULL, 'b'), '|')"
    ).first()
    d = con.execute(
        "SELECT CONCAT('a', NULL, 'b'), 'a' || NULL || 'b',"
        " concat_ws(':', 'a', NULL, 'b'), array_to_string(['a', NULL, 'b'], '|')"
    ).fetchone()
    assert (s[0], d[0]) == (None, "ab"), "CONCAT personalities changed — re-probe"
    assert s[1] is None and d[1] is None          # '||' agrees: propagate
    assert s[2] == d[2] == "a:b"                  # concat_ws agrees: skip
    assert s[3] == d[3] == "a|b"                  # array_to_string agrees: skip


def test_group_by_negative_zero_key_split_pinned(spark):
    """KNOWN-SPLIT class pinned, unexposed by construction: grouping on
    a raw DOUBLE key merges -0.0 with 0.0 on both engines (one group),
    but the REPRESENTATIVE key value differs — Spark normalizes the
    grouping key to +0.0 while DuckDB keeps the first-seen -0.0 — and
    the driver hash is sign-sensitive. Worse: DuckDB's representative is
    NONDETERMINISTIC — parallel hash aggregation keeps whichever
    thread's first-seen zero wins, so back-to-back identical runs here
    returned '-0.0' then '0.0' — meaning a raw-double group key isn't
    even self-consistent on ONE engine. No oracled query groups by a
    raw double (swept at pin time: every GROUP BY key is an id, a
    string, a date/hour bucket, or exact integer cents); any future one
    must band into exact integers first (the cents idiom). NaN grouping
    agrees (one group, 'nan' key) — but only for REAL NaN doubles: a
    pandas DataFrame registered into DuckDB reads float NaN as SQL NULL
    (the pandas missing-value sentinel), so NaN fixtures must be built
    in SQL or parquet, never via pandas round-trips."""
    import duckdb as _duck

    q = (
        "SELECT v, COUNT(*) AS n FROM ("
        "  SELECT CAST('-0.0' AS DOUBLE) v UNION ALL SELECT CAST('0.0' AS DOUBLE)"
        "  UNION ALL SELECT CAST('nan' AS DOUBLE) UNION ALL SELECT CAST('nan' AS DOUBLE)"
        ") GROUP BY v"
    )
    srows = {repr(r[0]): r[1] for r in spark.sql(q).collect()}
    assert srows == {"0.0": 2, "nan": 2}, "Spark stopped normalizing -0.0 keys"
    seen = set()
    for _ in range(8):
        drows = {repr(r[0]): r[1] for r in _duck.connect().execute(q).fetchall()}
        assert set(drows.values()) == {2} and len(drows) == 2
        (zero_key,) = [k for k in drows if k != "nan"]
        seen.add(zero_key)
    assert seen <= {"-0.0", "0.0"}, seen
    # If DuckDB ever starts normalizing deterministically to +0.0 the
    # class narrows from 'nondeterministic' to 'engine-split only';
    # either way a raw-double group key stays banned in oracled queries.


def test_nan_comparison_total_order_clean_class_pinned(spark):
    """CLEAN class pinned (round-14 probe, the follow-up the -0.0
    grouping pin suggested): NaN COMPARISON semantics agree across
    engines because BOTH abandon IEEE-754 for a total order — NaN = NaN
    is TRUE (not IEEE's false), NaN > Infinity, NaN > any finite, MAX
    picks NaN over finite values, equi-joins MATCH NaN keys (one row),
    null-safe equality (Spark <=> / DuckDB IS NOT DISTINCT FROM) is
    true, IN-lists hit, and ORDER BY ASC places NaN after +inf. An
    IEEE-trained reader would expect NaN = NaN to be false on at least
    one engine; it isn't on either, and a filter or join written under
    the IEEE assumption silently keeps NaN rows on BOTH twins the same
    way — so the class is clean, not hazardous, but only because the
    two engines deviate from the standard IDENTICALLY. NaN = NULL is
    NULL on both (three-valued logic outranks the total order). ±0.0
    equality and < agree too (IEEE, one match — distinct from the
    GROUPING-representative split pinned above). Pinned so an engine
    upgrade restoring IEEE comparison on one side fails here, not in a
    silent filter-cardinality drift."""
    import duckdb as _duck

    con = _duck.connect()
    probes = [
        # (spark SQL, duckdb SQL, expected)
        ("cast('nan' as double) = cast('nan' as double)",
         "'nan'::DOUBLE = 'nan'::DOUBLE", True),
        ("cast('nan' as double) > cast('inf' as double)",
         "'nan'::DOUBLE > 'inf'::DOUBLE", True),
        ("cast('nan' as double) > 1.0d", "'nan'::DOUBLE > 1.0", True),
        ("cast('nan' as double) <=> cast('nan' as double)",
         "'nan'::DOUBLE IS NOT DISTINCT FROM 'nan'::DOUBLE", True),
        ("cast('nan' as double) IN (cast('nan' as double), 1.0d)",
         "'nan'::DOUBLE IN ('nan'::DOUBLE, 1.0)", True),
        ("cast('nan' as double) = cast(NULL as double)",
         "'nan'::DOUBLE = NULL", None),
        ("cast('-0.0' as double) < 0.0d", "'-0.0'::DOUBLE < 0.0", False),
        ("cast('-0.0' as double) = 0.0d", "'-0.0'::DOUBLE = 0.0", True),
    ]
    for s_sql, d_sql, want in probes:
        s = spark.sql(f"SELECT {s_sql}").first()[0]
        d = con.execute(f"SELECT {d_sql}").fetchone()[0]
        assert s == d == want or (want is None and s is None and d is None), (
            s_sql, s, d, want)
    # MAX picks NaN over finite values; MIN ignores it — on both.
    s = spark.sql(
        "SELECT MIN(x), MAX(x) FROM VALUES (1.0d),"
        " (cast('nan' as double)), (2.0d) t(x)").first()
    d = con.execute(
        "SELECT MIN(x), MAX(x) FROM (VALUES (1.0),"
        " ('nan'::DOUBLE), (2.0)) t(x)").fetchone()
    import math
    assert s[0] == d[0] == 1.0 and math.isnan(s[1]) and math.isnan(d[1])
    # Equi-join MATCHES NaN keys on both engines (IEEE would match zero).
    s = spark.sql(
        "SELECT count(*) FROM (VALUES (cast('nan' as double))) a(x)"
        " JOIN (VALUES (cast('nan' as double))) b(y) ON a.x = b.y"
    ).first()[0]
    d = con.execute(
        "SELECT count(*) FROM (VALUES ('nan'::DOUBLE)) a(x)"
        " JOIN (VALUES ('nan'::DOUBLE)) b(y) ON a.x = b.y").fetchone()[0]
    assert s == d == 1
    # ORDER BY ASC: NaN lands after +inf on both (before NULLS LAST tail).
    s = [r[0] for r in spark.sql(
        "SELECT x FROM VALUES (1.0d), (cast('nan' as double)),"
        " (cast('inf' as double)) t(x) ORDER BY x").collect()]
    d = [r[0] for r in con.execute(
        "SELECT x FROM (VALUES (1.0), ('nan'::DOUBLE),"
        " ('inf'::DOUBLE)) t(x) ORDER BY x").fetchall()]
    assert s[0] == d[0] == 1.0
    assert s[1] == d[1] == float("inf")
    assert math.isnan(s[2]) and math.isnan(d[2])


def test_explode_unnest_edge_semantics_pinned(spark):
    """Pinned (round-14 probe, wave 4): the explode/UNNEST pairing that
    25+ oracle sites lean on (shingles, SimHash bits, band keys, chunk
    grids, token streams) agrees on every edge — empty array -> zero
    rows, NULL array -> zero rows, a CASE with no ELSE (NULL branch) ->
    zero rows (the llm_dedup `UNNEST(CASE WHEN len>=3 THEN ... ELSE []
    END)` guard is therefore belt-and-braces, not load-bearing), NULL
    ELEMENTS are kept as NULL rows on both, and unnesting an
    array<array> goes exactly ONE level on both (DuckDB's recursive
    flatten needs an explicit flag). The one SPLIT in the family is
    ordinality base: Spark posexplode's pos is 0-BASED while DuckDB's
    generate_subscripts is 1-BASED — a posexplode/generate_subscripts
    twin is an off-by-one on every row. Required spelling (q111, the
    only shipping posexplode): pair posexplode with 0-based RANGE(n) /
    GENERATE_SERIES(0, n-1) on the oracle side. Element access is
    1-based on BOTH (element_at / [] and array_position /
    list_position agree) — the 0-base is posexplode's alone."""
    import duckdb as _duck

    con = _duck.connect()
    # Edge cardinalities agree: [1,2] -> 2 rows, [] -> 0, NULL -> 0.
    s = spark.sql(
        "SELECT count(*) FROM (SELECT explode(a) FROM VALUES"
        " (array(1,2)), (array()), (cast(NULL as array<int>)) t(a))"
    ).first()[0]
    d = con.execute(
        "SELECT count(*) FROM (SELECT UNNEST(a) FROM (VALUES"
        " ([1,2]), ([]::INT[]), (NULL::INT[])) t(a))").fetchone()[0]
    assert s == d == 2
    # CASE with no ELSE -> NULL array -> zero rows on both.
    assert spark.sql(
        "SELECT explode(CASE WHEN 1=2 THEN array(1) END)").count() == 0
    assert con.execute(
        "SELECT count(*) FROM (SELECT UNNEST(CASE WHEN 1=2 THEN [1] END))"
    ).fetchone()[0] == 0
    # NULL elements survive as rows on both.
    s = [r[0] for r in spark.sql(
        "SELECT explode(array(1, NULL, 2))").collect()]
    d = [r[0] for r in con.execute(
        "SELECT UNNEST([1, NULL, 2])").fetchall()]
    assert s == d == [1, None, 2]
    # One-level unnest of nested arrays on both.
    s = [r[0] for r in spark.sql(
        "SELECT explode(array(array(1,2), array(3)))").collect()]
    d = [r[0] for r in con.execute(
        "SELECT UNNEST([[1,2],[3]])").fetchall()]
    assert s == d == [[1, 2], [3]]
    # THE SPLIT: ordinality bases differ by one.
    s_pos = [r[0] for r in spark.sql(
        "SELECT posexplode(array('a','b'))").collect()]
    d_sub = [r[0] for r in con.execute(
        "SELECT generate_subscripts(['a','b'], 1)").fetchall()]
    assert s_pos == [0, 1] and d_sub == [1, 2]
    # q111's actual pairing is 0-based on both sides.
    d_rng = [r[0] for r in con.execute(
        "SELECT UNNEST(RANGE(2))").fetchall()]
    assert d_rng == [0, 1] == s_pos
    # Element access stays 1-based on BOTH (the 0-base is posexplode's).
    assert spark.sql("SELECT element_at(array(7,8,9), 1)").first()[0] == 7
    assert con.execute("SELECT ([7,8,9])[1]").fetchone()[0] == 7
    assert spark.sql(
        "SELECT array_position(array(7,8,9), 8)").first()[0] == 2
    assert con.execute(
        "SELECT list_position([7,8,9], 8)").fetchone()[0] == 2


def test_higher_order_lambda_personalities_pinned(spark):
    """Pinned (round-14 probe, wave 4): the higher-order-function family
    the text/vector oracles twin (transform/LIST_TRANSFORM,
    filter/LIST_FILTER, aggregate-vs-UNNEST+SUM). CLEAN core — NULL
    ELEMENTS flow through transform lambdas with ordinary NULL
    arithmetic ([2,NULL,4] both), filter DROPS elements whose predicate
    is NULL (three-valued WHERE semantics inside the lambda — the
    q70-family LIST_FILTER oracles lean on this), transform/filter ON a
    NULL array return NULL (not zero rows, not an error), and
    zip_with/LIST_ZIP pad the shorter side with NULLs. Two SPLITS: (a)
    the TWO-ARG lambda index is 0-BASED on Spark (`transform(a, (x,i)
    -> i)` -> [0,1]) and 1-BASED on DuckDB (-> [1,2]) — same trap as
    posexplode/generate_subscripts; never twin an index lambda
    directly (zero shipping exposure: the one two-arg lambda,
    llm_dedup._PAIR_PACKED, is Spark-side only and its slice(ds, i+2)
    strictly-upper-triangle arithmetic DEPENDS on the 0-base pinned
    here). (b) reduce grammars differ structurally: Spark's reduce
    REQUIRES an init value and returns it on an empty array; DuckDB's
    LIST_REDUCE is a fold1 with NO init that RAISES on empty input — a
    reduce/list_reduce twin over possibly-empty arrays raises on
    exactly one side. Spelling: oracles twin F.aggregate with
    UNNEST+SUM (NULL-skipping, empty-safe), never LIST_REDUCE (zero
    shipping uses, swept at pin time)."""
    import duckdb as _duck

    con = _duck.connect()
    # Clean core: NULL element through the lambda.
    s = spark.sql(
        "SELECT transform(array(1, NULL, 3), x -> x + 1)").first()[0]
    d = con.execute(
        "SELECT LIST_TRANSFORM([1, NULL, 3], x -> x + 1)").fetchone()[0]
    assert s == d == [2, None, 3 + 1]
    # filter drops NULL-predicate elements on both.
    s = spark.sql(
        "SELECT filter(array(1, NULL, 3), x -> x > 1)").first()[0]
    d = con.execute(
        "SELECT LIST_FILTER([1, NULL, 3], x -> x > 1)").fetchone()[0]
    assert s == d == [3]
    # NULL array in -> NULL out (not zero rows) on both.
    assert spark.sql(
        "SELECT filter(cast(NULL as array<int>), x -> x > 1)"
    ).first()[0] is None
    assert con.execute(
        "SELECT LIST_FILTER(NULL::INT[], x -> x > 1)").fetchone()[0] is None
    # zip pads the short side with NULL on both.
    s = spark.sql(
        "SELECT zip_with(array(1,2,3), array(10,20), (a,b) -> b)"
    ).first()[0]
    d = [t[1] for t in con.execute(
        "SELECT LIST_ZIP([1,2,3], [10,20])").fetchone()[0]]
    assert s == d == [10, 20, None]
    # SPLIT (a): two-arg lambda index base.
    s = spark.sql("SELECT transform(array(10,20), (x, i) -> i)").first()[0]
    d = con.execute(
        "SELECT LIST_TRANSFORM([10,20], (x, i) -> i)").fetchone()[0]
    assert s == [0, 1] and d == [1, 2], (s, d)
    # SPLIT (b): empty-array reduce — Spark returns the init, DuckDB raises.
    assert spark.sql(
        "SELECT reduce(array(), 0, (a, b) -> a + b)").first()[0] == 0
    import pytest as _pt

    with _pt.raises(_duck.Error):
        con.execute("SELECT LIST_REDUCE([]::INT[], (a, b) -> a + b)")


def test_regexp_replace_scope_and_backref_splits_pinned(spark):
    """KNOWN-SPLIT class pinned (round-14 probe, wave 4): REGEXP_REPLACE
    twins carry two per-engine personalities the §3 pattern-grammar
    contract didn't cover because they live in the REPLACEMENT side of
    the call. (a) Default SCOPE: Spark replaces ALL matches always;
    DuckDB replaces the FIRST match only unless the 'g' option is
    passed — a bare twin silently diverges on any multi-hit string.
    Required spelling: every DuckDB-side REGEXP_REPLACE must pass 'g'
    (swept at pin time: all shipping oracle sites — the dotted-I
    casefold leg, the PII redaction battery — already do; this pin
    makes the implicit discipline a contract). (b) BACKREFERENCE
    spelling INVERTS: Spark/Java wants '$2$1' (and a '\\2' replacement
    is an ESCAPED LITERAL '2'); DuckDB/RE2 wants '\\2\\1' (and '$2$1'
    passes through as literal text) — each engine's spelling is
    silently wrong on the other, so replacement strings must NEVER be
    shared between twins (q110's IP redaction keeps separate
    per-engine replacement strings for exactly this reason). Clean:
    zero-width-match global replacement agrees ('x*' over 'ab' ->
    '-a-b-' on both)."""
    import duckdb as _duck

    con = _duck.connect()
    # (a) default scope splits; 'g' restores agreement.
    assert spark.sql(
        "SELECT regexp_replace('aaa', 'a', 'b')").first()[0] == "bbb"
    assert con.execute(
        "SELECT REGEXP_REPLACE('aaa', 'a', 'b')").fetchone()[0] == "baa"
    assert con.execute(
        "SELECT REGEXP_REPLACE('aaa', 'a', 'b', 'g')").fetchone()[0] == "bbb"
    # (b) backref spellings invert; each is literal-or-wrong on the other.
    pat = "([a-z])([0-9])"
    assert spark.sql(
        f"SELECT regexp_replace('a1', '{pat}', '$2$1')").first()[0] == "1a"
    assert spark.sql(
        rf"SELECT regexp_replace('a1', '{pat}', '\\2\\1')"
    ).first()[0] == "21"  # Java: escaped literals, NOT backrefs
    assert con.execute(
        f"SELECT REGEXP_REPLACE('a1', '{pat}', '\\2\\1', 'g')"
    ).fetchone()[0] == "1a"
    assert con.execute(
        f"SELECT REGEXP_REPLACE('a1', '{pat}', '$2$1', 'g')"
    ).fetchone()[0] == "$2$1"  # RE2: literal passthrough
    # Clean: zero-width global replacement agrees.
    assert spark.sql(
        "SELECT regexp_replace('ab', 'x*', '-')").first()[0] == "-a-b-"
    assert con.execute(
        "SELECT REGEXP_REPLACE('ab', 'x*', '-', 'g')").fetchone()[0] == "-a-b-"


def test_strict_digit_guard_cross_engine_equivalence(spark):
    """Permanent fuzz form of the strict-digit-grammar pin: the shared
    strict_digit_int_sql expression must return the IDENTICAL value on
    both engines for EVERY input — curated hostile tails plus 300
    seeded random strings over digits/signs/dots/hex/exponent chars/
    whitespace/line terminators/unicode digits. A DuckDB upgrade that
    changes TRY_CAST or TRANSLATE semantics fails here, not in a silent
    q84/q102 split."""
    import random

    import duckdb as _duck

    from nsq2kinesis_spark.operators.scalars import strict_digit_int_sql

    random.seed(20260816)
    alphabet = "0123456789+-.eExX \t\n\r\x0b٣۴"
    cases = [
        "7", "07", "0007", "", " ", "1.5", "9.99", "1e2", "0x1F", "+7",
        "-7", "7 ", " 7", "7\n", "7\r\n", "NaN", "inf", "2147483647",
        "2147483648", "99999999999999999999", "٣", "٣7", "1_000",
    ]
    for _ in range(300):
        cases.append(
            "".join(random.choice(alphabet) for _ in range(random.randint(0, 12)))
        )
    expr = strict_digit_int_sql("s")
    df = spark.createDataFrame(
        [(i, c) for i, c in enumerate(cases)], "i long, s string"
    )
    got = {r.i: r.v for r in df.selectExpr("i", f"{expr} AS v").collect()}
    con = _duck.connect()
    mismatches = []
    for i, c in enumerate(cases):
        d = con.execute(f"SELECT {expr} FROM (SELECT ? AS s)", [c]).fetchone()[0]
        if d != got[i]:
            mismatches.append((repr(c), got[i], d))
    assert not mismatches, mismatches[:5]


# -- q82 capped-nlist IVF: natural-distribution recall corpus (round 12) ------
#
# The r11 capped-nlist study measured RUNTIME on a 64x replica corpus but
# its recall column was structurally inflated: replicas carry 64 exact
# value-copies of every true neighbor scattered across cells, so ANY
# probed cell tends to hold one. This corpus is the defensible recall
# instrument: deterministic pseudo-random unit vectors (no copies, no
# cluster structure beyond what is planted) with 3 planted near
# neighbors per query at cosine ~0.98 -- far above the ~0.49 random
# ceiling a 64-dim corpus of this size exhibits -- and sized so q82's
# cap regime is ACTIVE (step = ceil(12840/64) = 201 > the 101 floor;
# the shipped SFs never leave the floor, so these gates are the only
# lanes exercising the capped branch end-to-end).

from .conftest import IVF_NAT_EPS, IVF_NAT_PLANTED, IVF_NAT_TOTAL  # noqa: E402,F401


def test_q82_capped_nlist_is_active_on_natural_corpus(spark, ivf_natural_corpus):
    """Regression guard on the round-12 sizing itself: on this corpus the
    capped step (ceil(n/cap) = 201) must differ from the retired sqrt(n)
    sizing (isqrt(12840) = 113) and produce exactly ceil(n/step) = 64
    centroids -- a silent revert to sqrt(n) fails here even though both
    sizings agree at every shipped SF (all under the 101 floor)."""
    import math

    from nsq2kinesis_spark.operators.similarity import (
        IVF_CENTROID_STEP,
        IVF_NLIST_CAP,
        emb_t,
        ivf_centroids_capped,
    )

    step = max(IVF_CENTROID_STEP, -(-IVF_NAT_TOTAL // IVF_NLIST_CAP))
    assert step == 201 != max(IVF_CENTROID_STEP, math.isqrt(IVF_NAT_TOTAL))
    e = emb_t(spark, ivf_natural_corpus)
    n_cents = ivf_centroids_capped(spark, ivf_natural_corpus, e).count()
    assert n_cents == len(range(0, IVF_NAT_TOTAL, step)) == 64


def test_q82_oracle_parity_in_capped_regime(spark, ivf_natural_corpus):
    """Value-exact q82 parity vs the DuckDB twin with the cap BINDING
    (step 201): the shipped-SF driver gate and parity sweeps all sit at
    the 101 floor where capped and sqrt sizings coincide, so this is the
    lane that proves the DUCK_IVF_STEP_CAPPED twin itself."""
    import duckdb as _duck

    con = _duck.connect()
    con.execute(
        "CREATE VIEW embeddings AS SELECT * FROM "
        f"'{ivf_natural_corpus}/embeddings.parquet'"
    )
    q = QUERIES["q82_ann_ivf"]
    srows = sorted(
        tuple(str(v) for v in r)
        for r in q.builder(spark, ivf_natural_corpus).collect()
    )
    drows = sorted(
        tuple(str(v) for v in row) for row in con.execute(q.oracle).fetchall()
    )
    assert srows == drows
    assert len(srows) == 50  # 10 queries x top-5: no probed cell came up dry


def test_q82_planted_neighbor_recall_natural_corpus(spark, ivf_natural_corpus):
    """The round-12 recall gate with the cap binding. Three reads:

    1. corpus sanity -- q80's exact top-3 per query IS the planted set
       (planted cos ~0.98 vs a ~0.49 random ceiling, so brute force must
       find exactly them; if this fails the corpus is broken, not q82);
    2. planted recall -- q82 must recover >= 0.85 of planted neighbors
       on average (measured 0.90 at the pinned seed: the probe exploits
       genuine locality; a quantizer no better than random cell choice
       would read ~probes/nlist = 0.03);
    3. overall recall@5 >= 0.5 (exact top-5 = 3 planted + 2 random
       near-orthogonal tails; the tails scatter uniformly across cells,
       so ~0.66 measured -- the honest flat-IVF number, not the replica
       corpus's structurally-inflated 1.0)."""
    from collections import defaultdict

    from nsq2kinesis_spark.operators.similarity import (
        IVF_NLIST_CAP,
        IVF_PROBES,
        N_QUERIES,
        TOP_K,
    )

    def topk(name):
        per = defaultdict(set)
        for r in QUERIES[name].builder(spark, ivf_natural_corpus).collect():
            per[r.query_id].add(r.vec_id)
        return per

    exact, ann = topk("q80_cosine_topk"), topk("q82_ann_ivf")
    assert set(exact) == set(range(N_QUERIES))
    planted_recalls, overall_recalls = [], []
    for q in range(N_QUERIES):
        planted = {
            N_QUERIES + IVF_NAT_PLANTED * q + i for i in range(IVF_NAT_PLANTED)
        }
        planted_recalls.append(len(ann[q] & planted) / IVF_NAT_PLANTED)
        overall_recalls.append(len(ann[q] & exact[q]) / len(exact[q]))
        assert planted <= exact[q], (q, planted, exact[q])  # read 1 (top-5 form)
    avg_planted = sum(planted_recalls) / N_QUERIES
    avg_overall = sum(overall_recalls) / N_QUERIES
    random_floor = IVF_PROBES / IVF_NLIST_CAP
    assert avg_planted >= 0.85 > random_floor, planted_recalls
    assert avg_overall >= 0.5 > random_floor, overall_recalls
    assert len(exact[0]) == TOP_K


def test_decimal_division_personality_pinned(spark):
    """KNOWN-SPLIT class pinned (round-12 probe): DECIMAL / DECIMAL and
    DECIMAL / INTEGER quotients have per-engine TYPES. DuckDB returns
    DOUBLE (binary quotient: DECIMAL(38,0) 1/3 -> 0.3333333333333333);
    Spark returns DECIMAL with a derived precision/scale, decimal-rounded
    at that scale (DECIMAL(38,0)/DECIMAL(38,0) -> DECIMAL(38,6) ->
    0.333333; DECIMAL(19,0)/DECIMAL(19,0) -> DECIMAL(38,19)) -- so both
    the values and the type-sensitive driver hash split on ANY decimal
    quotient. Spelling: oracle-twinned code divides only after casting
    BOTH operands' product/sum lanes to DOUBLE (the established wide-lane
    idiom). Exposure swept at pin time: every '/' in every oracle that
    rides a decimal/HUGEINT accumulation divides double-cast operands
    (q114 mean/z, q119 slope/intercept, q120 gini, q125 diversity, q106's
    sqrt path); q124's '//' is exact integer floor division, a separate
    construct with identical semantics on both engines."""
    import duckdb as _duck
    from decimal import Decimal
    from pyspark.sql.types import DecimalType, DoubleType

    con = _duck.connect()
    expr = "CAST(1 AS DECIMAL(38,0)) / CAST(3 AS DECIMAL(38,0))"
    sdf = spark.sql(f"SELECT {expr} AS v")
    srow = sdf.first()[0]
    # Spark: decimal-typed, decimal-rounded at derived scale 6
    assert isinstance(sdf.schema[0].dataType, DecimalType)
    assert srow == Decimal("0.333333")
    dval, dtype = con.execute(f"SELECT {expr}, typeof({expr})").fetchone()
    # DuckDB: binary DOUBLE -- a different VALUE and a different TYPE
    assert dtype == "DOUBLE" and abs(dval - 1 / 3) < 1e-15
    assert str(dval) != str(srow), "engines converged -- retire this contract"
    # the declared spelling agrees bit-exactly on both engines
    s_ok = spark.sql(
        "SELECT CAST(CAST(1 AS DECIMAL(38,0)) AS DOUBLE)"
        " / CAST(CAST(3 AS DECIMAL(38,0)) AS DOUBLE) AS v"
    ).first()[0]
    d_ok = con.execute(
        "SELECT CAST(CAST(1 AS DECIMAL(38,0)) AS DOUBLE)"
        " / CAST(CAST(3 AS DECIMAL(38,0)) AS DOUBLE)"
    ).fetchone()[0]
    assert isinstance(s_ok, float) and s_ok == d_ok == 1 / 3
    # DECIMAL / INTEGER rides the same split (DOUBLE vs DECIMAL(16,6))
    mixed = "CAST(7 AS DECIMAL(12,2)) / 2"
    assert con.execute(f"SELECT typeof({mixed})").fetchone()[0] == "DOUBLE"
    mdf = spark.sql(f"SELECT {mixed} AS v")
    assert isinstance(mdf.schema[0].dataType, DecimalType)


def test_invalid_utf8_parquet_strings_contract_pinned(spark, tmp_path):
    """KNOWN-SPLIT class pinned (round-12 probe): a parquet string column
    carrying INVALID UTF-8 byte sequences (stray 0xFF, truncated
    multibyte, overlong encodings, UTF-8-encoded surrogates -- all
    plantable via pyarrow's unvalidated from_buffers, i.e. by any
    upstream writer with a bug) splits the twins at the SCAN:

    - DuckDB REFUSES the read outright (Invalid Input Error on any
      access of the column), so an oracled parity run over such data
      fails LOUDLY -- it can never silently verify one personality;
    - Spark reads it and passes the raw bytes through (UTF8String is
      byte-based): length/substring/hash/sort operate on the original
      bytes, and only Java-String conversions (regex, upper) see
      U+FFFD replacement.

    Declared contract: invalid UTF-8 is OUT OF CONTRACT for oracle-
    twinned queries -- the loud oracle-side failure is the designed
    behavior (same philosophy as the q42 sub-cent guard: fail the
    parity run, never silently verify). The engine's own declared
    semantics is byte-passthrough, pinned here so an upgrade that
    starts mutating bytes (silent re-encode) gets caught."""
    import duckdb as _duck
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    vals = [b"valid text", b"bad\xffbyte", b"trunc\xc3", b"lone\x80cont"]
    offsets, data = [0], b""
    for v in vals:
        data += v
        offsets.append(len(data))
    arr = pa.StringArray.from_buffers(
        len(vals),
        pa.py_buffer(np.array(offsets, dtype=np.int32).tobytes()),
        pa.py_buffer(data),
    )
    path = str(tmp_path / "bad_utf8.parquet")
    pq.write_table(
        pa.table({"doc_id": pa.array(range(len(vals)), type=pa.int64()),
                  "text": arr}),
        path,
    )

    # oracle side: loud scan failure on any access of the column
    con = _duck.connect()
    import pytest as _pt

    with _pt.raises(_duck.InvalidInputException):
        con.execute(f"SELECT LENGTH(text) FROM '{path}'").fetchall()

    # engine side: byte-passthrough -- octet_length sees the original
    # byte counts, and a binary-cast round trip returns the exact bytes
    df = spark.read.parquet(path)
    got = {
        r.doc_id: (r.blen, bytes(r.raw))
        for r in df.selectExpr(
            "doc_id", "octet_length(text) AS blen", "CAST(text AS BINARY) AS raw"
        ).collect()
    }
    for i, v in enumerate(vals):
        assert got[i] == (len(v), v), (i, got[i], v)


def test_dst_transition_instants_clean_class_pinned(spark, tmp_path):
    """CLEAN class pinned (round-12 probe): event timestamps at DST
    transition instants sweep clean through the date/window/session
    family. Planted instants straddle the 2024 transitions of four
    hostile zones -- Europe (01:00Z spring-forward/fall-back), Chatham
    (45-minute zone), Santiago (midnight-local transition: the local
    day 2024-09-08 has no 00:00), Lord Howe (30-minute DST) -- and the
    ad-hoc probe ran ALL 36 event-reading oracled queries under
    Pacific/Chatham AND America/Santiago vanilla sessions: zero splits.

    Why clean, structurally: pin_session_conf pins the session TZ to
    UTC before any read, and no operator converts an instant through a
    local wall-clock (no from_utc_timestamp / string-parse of local
    times), so nonexistent/double LOCAL times can never arise -- UTC
    has no DST. The oracle's TIMESTAMP is naive micros over the same
    storage values. This pin keeps the representative windowed/date
    operators on transition-instant data in the permanent suite; the
    session-TZ half of the guarantee is the /verify hostile-TZ sweep's
    job."""
    instants = [
        "2024-03-31 00:59:59.999999", "2024-03-31 01:00:00",
        "2024-10-27 00:59:59.5", "2024-10-27 01:00:00",
        "2024-09-28 14:44:59", "2024-09-28 14:45:00",
        "2024-04-06 03:59:59", "2024-04-06 04:00:00",
        "2024-09-08 03:59:59.999999", "2024-09-08 04:00:00",
        "2024-10-05 13:59:59", "2024-10-05 14:30:00",
    ]
    rows = " UNION ALL ".join(
        f"SELECT {990100 + i}, TIMESTAMP '{ts}', {880100 + (i % 4)}, "
        f"'{['view', 'click', 'purchase', 'signup'][i % 4]}', "
        f"{round(1.25 + i * 0.25, 2)}, '{{}}'"
        for i, ts in enumerate(instants)
    )
    sf_dir, con = _null_variant_fixture(tmp_path, rows)
    for qname in (
        "q61_tumbling_window",
        "q63_session_window",
        "q66_time_rollup",
        "q104_rolling_active_users",
        "q128_gap_fill",
        "q136_interpolate",
        "q139_conversion_latency",
    ):
        _assert_null_variant_parity(spark, qname, sf_dir, con)


def test_integer_division_mod_negatives_clean_class_pinned(spark):
    """CLEAN class pinned (round-12 probe, the follow-up the decimal pin
    suggested): exact integer division and modulo on NEGATIVE operands
    agree across engines -- Spark's DIV and DuckDB's // both truncate
    toward zero (-7 DIV 2 = -3, NOT floor's -4), and both %'s take the
    dividend's sign (-7 % 2 = -1). Python's // floors, so a test author
    hand-computing an expected value in Python would get -4 -- the
    hazard is in the fixture author's head, not between the engines.
    Pinned so an engine upgrade moving to floor semantics (or a future
    oracle spelled with Python-computed expectations) gets caught."""
    import duckdb as _duck

    con = _duck.connect()
    for a, b in [(-7, 2), (7, -2), (-7, -2), (7, 2), (-1, 3)]:
        s_div = spark.sql(f"SELECT {a} DIV {b}").first()[0]
        s_mod = spark.sql(f"SELECT {a} % {b}").first()[0]
        d_div, d_mod = con.execute(f"SELECT {a} // {b}, {a} % {b}").fetchone()
        trunc = int(a / b)  # Python int() truncates toward zero
        assert s_div == d_div == trunc, (a, b, s_div, d_div)
        assert s_mod == d_mod == a - trunc * b, (a, b, s_mod, d_mod)


def test_nonfinite_math_domain_personalities_pinned(spark):
    """KNOWN-SPLIT class pinned (round-12 probe, wave 2): out-of-domain
    math builtins have three-way per-engine personalities -- DuckDB
    RAISES (Out of Range Error) on SQRT(-1), LN(0), LN(-1); Spark
    returns NaN for SQRT(-1) and NULL for LN(0)/LN(negative). Any
    oracle-twinned use of SQRT/LN/LOG over a data-dependent domain must
    guard the domain EXPLICITLY on both sides (q42's spelling: CASE
    WHEN x >= 0 THEN SQRT(x) END / WHEN x > -1 THEN LN(x+1) END).
    Exposure swept at pin time: q42 carries exactly those guards; every
    other SQRT runs on provably nonnegative arguments (norms under the
    zero-norm contract, exact-moment variances >= 0 by Cauchy-Schwarz,
    q121's pooled-variance positivity guard row, sqrt of COUNT(*))."""
    import duckdb as _duck
    import math

    con = _duck.connect()
    import pytest as _pt

    for bad in ("SQRT(-1.0)", "LN(0.0)", "LN(-1.0)"):
        with _pt.raises(_duck.OutOfRangeException):
            con.execute(f"SELECT {bad}").fetchone()
    assert math.isnan(spark.sql("SELECT SQRT(-1.0D)").first()[0])
    assert spark.sql("SELECT LN(0.0D)").first()[0] is None
    assert spark.sql("SELECT LN(-1.0D)").first()[0] is None
    # the q42 guard spelling agrees exactly on both engines
    guard = "CASE WHEN -4.0 >= 0 THEN SQRT(-4.0) END"
    assert spark.sql(f"SELECT {guard}").first()[0] is None
    assert con.execute(f"SELECT {guard}").fetchone()[0] is None


def test_string_to_double_cast_grammar_split_pinned(spark):
    """KNOWN-SPLIT class pinned (round-12 probe, wave 2): TRY_CAST
    (VARCHAR AS DOUBLE) has OPPOSITE leniencies per engine -- Spark
    accepts Java float suffixes ('1d' -> 1.0; DuckDB NULL) while DuckDB
    accepts underscore digit separators ('1_000' -> 1000.0; Spark
    NULL). A bare string->double twin is therefore a silent split in
    BOTH directions. Banned construct: no shipping oracle casts strings
    to double (swept: the only string->number twins are digits-only by
    construction -- strict_digit_int_sql and regexp-extracted digit
    runs); any future one needs a strict shared grammar guard first.
    Clean subset also pinned: 'Infinity'/'inf'/'NaN'/'.5'/'5.'/' 5 '/
    '+5' parse identically."""
    import duckdb as _duck
    import math

    con = _duck.connect()

    def both(lit):
        s = spark.sql(f"SELECT TRY_CAST('{lit}' AS DOUBLE)").first()[0]
        d = con.execute(f"SELECT TRY_CAST('{lit}' AS DOUBLE)").fetchone()[0]
        return s, d

    s, d = both("1d")
    assert s == 1.0 and d is None, (s, d)
    s, d = both("1_000")
    assert s is None and d == 1000.0, (s, d)
    for lit, want in [("Infinity", float("inf")), ("inf", float("inf")),
                      (".5", 0.5), ("5.", 5.0), (" 5 ", 5.0), ("+5", 5.0)]:
        s, d = both(lit)
        assert s == d == want, (lit, s, d)
    s, d = both("NaN")
    assert math.isnan(s) and math.isnan(d)


def test_array_index_out_of_bounds_personality_pinned(spark):
    """KNOWN-SPLIT class pinned (round-12 probe, wave 2): an
    out-of-bounds array index RAISES on Spark-ANSI (element_at /
    arr[i]) but yields NULL on DuckDB (list indexing). Banned unless
    bounded: every index in every oracle-twinned expression must be
    provably in range by construction -- swept at pin time: embedding[i]
    rides GENERATE_SERIES(1, 64) under the dimension contract
    (size == 64 pre-filtered on both twins), words[i] rides
    GENERATE_SERIES bounded by LEN(words), q45/q52 token indexing is
    LEN-bounded the same way."""
    import duckdb as _duck

    con = _duck.connect()
    assert con.execute("SELECT ([1,2,3])[99]").fetchone()[0] is None
    import pytest as _pt
    from pyspark.errors import PySparkException

    with _pt.raises(PySparkException):
        spark.sql("SELECT element_at(array(1,2,3), 99)").first()
    # the bounded-by-construction idiom agrees exactly
    s = spark.sql(
        "SELECT transform(sequence(1, size(array(7,8))),"
        " i -> element_at(array(7,8), i))"
    ).first()[0]
    d = con.execute(
        "SELECT LIST_TRANSFORM(GENERATE_SERIES(1, LEN([7,8])), i -> ([7,8])[i])"
    ).fetchone()[0]
    assert list(s) == list(d) == [7, 8]


def test_month_arithmetic_and_regex_nomatch_clean_classes_pinned(spark):
    """CLEAN classes pinned (round-12 probe, wave 2):

    - end-of-month clamping in month arithmetic agrees (2024-01-31 +1
      month -> 02-29 on both; leap day +12 months -> 02-28 on both) --
      with the TYPE nuance that DuckDB's DATE + INTERVAL returns
      TIMESTAMP while Spark returns DATE, so a twinned month-add must
      CAST the DuckDB side back to DATE or the stringified values
      split ('2024-02-29 00:00:00' vs '2024-02-29'); no shipping
      oracle does month arithmetic today (q41's month surface is
      date_trunc/extract only);
    - regexp_extract with NO match returns '' (empty string, not NULL)
      on both engines, including an empty-able capture group."""
    import duckdb as _duck

    con = _duck.connect()
    for expr, want in [
        ("CAST(DATE '2024-01-31' + INTERVAL 1 MONTH AS DATE)", "2024-02-29"),
        ("CAST(DATE '2024-03-31' - INTERVAL 1 MONTH AS DATE)", "2024-02-29"),
        ("CAST(DATE '2024-02-29' + INTERVAL 12 MONTH AS DATE)", "2025-02-28"),
    ]:
        assert str(spark.sql(f"SELECT {expr}").first()[0]) == want
        assert str(con.execute(f"SELECT {expr}").fetchone()[0]) == want
    for expr in ("regexp_extract('abc', '([0-9]+)', 1)",
                 "regexp_extract('x', '([0-9]*)', 1)"):
        s = spark.sql(f"SELECT {expr}").first()[0]
        d = con.execute(f"SELECT {expr}").fetchone()[0]
        assert s == d == ""


def test_split_delimiter_and_substr_zero_personalities_pinned(spark):
    """KNOWN-SPLIT classes pinned (round-12 probe, wave 3):

    - Spark's split() treats the delimiter as a Java REGEX while
      DuckDB's STRING_SPLIT is LITERAL: split('a.b.c', '.') explodes
      into empty strings on Spark ('.' matches every char) and
      ['a','b','c'] on DuckDB; '|' alternation splits between every
      char on Spark. Banned construct: twinned split delimiters must be
      regex-INERT literals. Exposure swept at pin time: every shipping
      twin splits on a single space (inert) -- q53's STRING_SPLIT(s,'')
      is a DuckDB-side-only codepoint idiom, not a twin.
    - SUBSTR with START=0 disagrees: Spark yields length-n from the
      first char ('abc'), DuckDB consumes one count unit ('ab').
      Banned: twinned substring starts are 1-based positive (all
      shipping ones are).

    Clean subsets pinned so engine upgrades surface: single-space
    split, trailing-empty-field behavior, negative substr-from-end."""
    import duckdb as _duck

    con = _duck.connect()
    # regex-vs-literal delimiter
    s_dot = spark.sql("SELECT split('a.b.c', '.')").first()[0]
    d_dot = con.execute("SELECT STRING_SPLIT('a.b.c', '.')").fetchone()[0]
    assert d_dot == ["a", "b", "c"] and s_dot != d_dot, (s_dot, d_dot)
    # the inert-literal subset agrees, including trailing empty fields
    for lit in ("'a b'", "'a,b,'"):
        delim = "' '" if " " in lit else "','"
        s = spark.sql(f"SELECT split({lit}, {delim})").first()[0]
        d = con.execute(f"SELECT STRING_SPLIT({lit}, {delim})").fetchone()[0]
        assert list(s) == list(d), (lit, s, d)
    # SUBSTR zero-start split; 1-based and negative-from-end agree
    assert spark.sql("SELECT SUBSTR('abcdef', 0, 3)").first()[0] == "abc"
    assert con.execute("SELECT SUBSTR('abcdef', 0, 3)").fetchone()[0] == "ab"
    for expr in ("SUBSTR('abcdef', 2, 3)", "SUBSTR('abcdef', -3)"):
        s = spark.sql(f"SELECT {expr}").first()[0]
        d = con.execute(f"SELECT {expr}").fetchone()[0]
        assert s == d, (expr, s, d)


def test_sort_array_null_placement_intra_spark_hazard_pinned(spark):
    """KNOWN-SPLIT class pinned (round-12 probe, wave 3) -- and the
    split is partly INSIDE Spark: sort_array() places NULL elements
    FIRST while array_sort() (and DuckDB's LIST_SORT default) place
    them LAST. A twinned sort over a NULL-bearing array therefore
    depends on which Spark spelling was chosen. Declared rule:
    sort_array is allowed ONLY over provably NULL-free arrays --
    exposure swept: every shipping sort_array wraps collect_list, which
    drops NULLs by definition, so placement is moot there; any future
    sort over a constructed array must use array_sort (the
    DuckDB-agreeing spelling)."""
    import duckdb as _duck

    con = _duck.connect()
    sa = spark.sql("SELECT sort_array(array(3, NULL, 1))").first()[0]
    ar = spark.sql("SELECT array_sort(array(3, NULL, 1))").first()[0]
    du = con.execute("SELECT LIST_SORT([3, NULL, 1])").fetchone()[0]
    assert sa == [None, 1, 3]  # NULLS FIRST -- the hazard spelling
    assert list(ar) == du == [1, 3, None]  # the agreeing spelling
    # NULL-free arrays: all three agree
    assert (
        list(spark.sql("SELECT sort_array(array(3, 1, 2))").first()[0])
        == list(spark.sql("SELECT array_sort(array(3, 1, 2))").first()[0])
        == con.execute("SELECT LIST_SORT([3, 1, 2])").fetchone()[0]
        == [1, 2, 3]
    )


def test_day_of_week_offset_and_date_part_clean_classes_pinned(spark):
    """KNOWN-SPLIT pinned (round-12 probe, wave 4): DAYOFWEEK/
    EXTRACT(DOW) is OFF BY ONE across engines -- Spark numbers
    Sunday=1..Saturday=7, DuckDB numbers Sunday=0..Saturday=6 -- a
    silent off-by-one on every day-of-week twin. The declared spelling
    (q41's, shipping since round 1) aligns the oracle with
    DAYOFWEEK(d) + 1. Clean classes pinned beside it: EXTRACT WEEK is
    ISO-week on BOTH (2023-01-01 -> 52, 2024-01-01 -> 1), DOY, QUARTER,
    LAST_DAY leap handling, and WEEKOFYEAR all agree. Capability
    differences (not silent): Spark lacks EXTRACT(EPOCH) (the pinned
    idiom is unix_timestamp vs FLOOR(EPOCH())) and DuckDB lacks
    two-arg DATEDIFF/'isodow' under Spark's names."""
    import duckdb as _duck

    con = _duck.connect()
    # the split: Sunday 2024-08-11, Monday 2024-08-12
    assert spark.sql("SELECT DAYOFWEEK(DATE '2024-08-11')").first()[0] == 1
    assert con.execute("SELECT DAYOFWEEK(DATE '2024-08-11')").fetchone()[0] == 0
    # the declared alignment
    for day, want in [("2024-08-11", 1), ("2024-08-12", 2), ("2024-08-16", 6)]:
        s = spark.sql(f"SELECT DAYOFWEEK(DATE '{day}')").first()[0]
        d = con.execute(f"SELECT DAYOFWEEK(DATE '{day}') + 1").fetchone()[0]
        assert s == d == want, (day, s, d)
    # clean classes
    for expr, want in [
        ("EXTRACT(WEEK FROM DATE '2023-01-01')", 52),
        ("EXTRACT(WEEK FROM DATE '2024-01-01')", 1),
        ("EXTRACT(DOY FROM DATE '2024-03-01')", 61),
        ("EXTRACT(QUARTER FROM DATE '2024-08-11')", 3),
        ("LAST_DAY(DATE '2024-02-10')", "2024-02-29"),
    ]:
        s = spark.sql(f"SELECT {expr}").first()[0]
        d = con.execute(f"SELECT {expr}").fetchone()[0]
        assert str(s) == str(d) == str(want), (expr, s, d)


def test_like_default_escape_and_literal_backslash_splits_pinned(spark):
    """KNOWN-SPLIT classes pinned (round-12 probe, wave 5):

    - LIKE's default escape INVERTS across engines: Spark treats
      backslash as the default escape (pattern a backslash-underscore c
      matches literal 'a_c', not 'a<bs>xc'); DuckDB has NO default
      escape (backslash is a literal char -- exactly the opposite
      matches). Probed with CHR(92)-built identical 4-char patterns so
      string-literal parsing can't confound. Banned construct: a
      backslash in a twinned LIKE pattern; spell ESCAPE explicitly on
      both sides or use the regex family. Exposure swept: every
      shipping LIKE pattern is escape-free ('GIF8%', '1-%', '%red%').
    - String-LITERAL backslash escapes split the SQL texts themselves:
      Spark interprets '\\t' inside a single-quoted literal as TAB
      (length 3); DuckDB keeps it literal (length 4) -- a SHARED twin
      SQL string containing a backslash denotes DIFFERENT strings per
      engine. This is why strict_digit_int_sql and the regex spellings
      are deliberately backslash-free (r11 note); pinned here as the
      general rule.

    Clean classes pinned beside: explicit ESCAPE '|' agrees, ILIKE
    agrees, INSTR/POSITION not-found -> 0 on both, empty-needle INSTR
    -> 1, CONCAT_WS skips NULLs on both, IN-list three-valued NULL
    semantics agree (2 IN (1, NULL) -> NULL both)."""
    import duckdb as _duck

    con = _duck.connect()
    pat = "CONCAT('a', CHR(92), '_c')"
    spat = "CONCAT('a', CHAR(92), '_c')"
    assert spark.sql(f"SELECT 'a_c' LIKE {spat}").first()[0] is True
    assert con.execute(f"SELECT 'a_c' LIKE {pat}").fetchone()[0] is False
    bsx = "CONCAT('a', CHR(92), 'xc')"
    sbsx = "CONCAT('a', CHAR(92), 'xc')"
    assert spark.sql(f"SELECT {sbsx} LIKE {spat}").first()[0] is False
    assert con.execute(f"SELECT {bsx} LIKE {pat}").fetchone()[0] is True
    # string-literal escape interpretation
    assert spark.sql(r"SELECT LENGTH('a\tb')").first()[0] == 3
    assert con.execute(r"SELECT LENGTH('a\tb')").fetchone()[0] == 4
    # clean subsets
    for expr, want in [
        ("'50%' LIKE '50|%' ESCAPE '|'", True),
        ("'ABC' ILIKE 'abc'", True),
        ("INSTR('abc', 'z')", 0),
        ("POSITION('z' IN 'abc')", 0),
        ("INSTR('abc', '')", 1),
        ("CONCAT_WS(',', 'a', NULL, 'b')", "a,b"),
        ("2 IN (1, NULL)", None),
        ("2 NOT IN (1, NULL)", None),
    ]:
        s = spark.sql(f"SELECT {expr}").first()[0]
        d = con.execute(f"SELECT {expr}").fetchone()[0]
        assert s == d == want, (expr, s, d)


def test_array_membership_null_semantics_split_pinned(spark):
    """KNOWN-SPLIT class pinned (round-12 probe, wave 5): array
    membership over NULL-bearing input diverges three ways -- Spark's
    array_contains returns NULL when the needle is absent from a
    NULL-bearing array (three-valued: the NULL element MIGHT match) and
    raises outright on a NULL needle; DuckDB's LIST_CONTAINS returns
    plain FALSE and NULL respectively. Rule: membership twins require
    null-FREE arrays and non-null needles by construction -- exposure
    swept: every shipping membership rides split() output (whose
    elements are never NULL) against literal vocabularies (q45,
    q70/q71/q88's stopword sets). The agreeing subset (needle present,
    or absent from a null-free array) is pinned clean."""
    import duckdb as _duck

    con = _duck.connect()
    # needle present among NULLs: both TRUE
    assert spark.sql("SELECT array_contains(array(1, NULL, 3), 3)").first()[0] is True
    assert con.execute("SELECT LIST_CONTAINS([1, NULL, 3], 3)").fetchone()[0] is True
    # needle ABSENT from a NULL-bearing array: Spark NULL vs DuckDB FALSE
    assert spark.sql("SELECT array_contains(array(1, NULL), 7)").first()[0] is None
    assert con.execute("SELECT LIST_CONTAINS([1, NULL], 7)").fetchone()[0] is False
    # null-free arrays agree in both directions
    for arr_s, arr_d, needle, want in [
        ("array(1, 2)", "[1, 2]", "2", True),
        ("array(1, 2)", "[1, 2]", "7", False),
    ]:
        s = spark.sql(f"SELECT array_contains({arr_s}, {needle})").first()[0]
        d = con.execute(f"SELECT LIST_CONTAINS({arr_d}, {needle})").fetchone()[0]
        assert s == d == want


# -- round 13 probe wave: timestamp-parse grammar, INTERVAL personalities,
# MAP/STRUCT semantics (the r12 verdict's task #5) --------------------------


def test_timestamp_parse_grammar_personality_pinned(spark):
    """Round-13 probe: string->TIMESTAMP cast leniency — the one big cast
    family not yet probed. Swept 32 grammar points under session TZ UTC
    on both engines; NINE split points and a broad clean core.

    SPLITS (each direction occurs — neither engine is uniformly
    stricter):
      * missing seconds ('12:34', with space or T): Spark fills :00,
        DuckDB rejects;
      * space BEFORE a zone offset ('... +02:00'): Spark accepts,
        DuckDB rejects;
      * hour 24: Spark rejects, DuckDB rolls to next day 00:00;
      * named-zone suffix other than literal ' UTC' (' GMT', ' CET',
        ' Europe/Paris'): Spark resolves the zone, DuckDB rejects;
      * lowercase ' utc': DuckDB accepts, Spark rejects (Spark's
        zone-id lookup is case-sensitive; DuckDB's special-cases UTC
        case-insensitively);
      * no space before 'UTC' ('...56UTC'): Spark accepts, DuckDB no;
      * non-padded offset '+2:00': Spark accepts, DuckDB rejects;
      * slash dates '2024/03/05': DuckDB accepts, Spark rejects;
      * leading '+' year: Spark accepts, DuckDB rejects.

    CLEAN core (pinned below as the DECLARED shared grammar for any
    future oracle-twinned string->timestamp parse):
      'YYYY-M-D[ |T]H:M:S[.f{1..9}][Z|+HH|±HH:MM|±HHMM| UTC]' plus
      bare dates, surrounding whitespace, sub-second truncation (not
      rounding) past 6 digits, and loud NULL on impossible dates.
    No shipping oracled query parses strings to timestamps today
    (events.ts is a parquet timestamp; every CAST(ts AS TIMESTAMP) in
    an oracle retypes a timestamp column) — this pin is the fence for
    when one does."""
    import duckdb as _duck

    con = _duck.connect()
    con.execute("SET TimeZone='UTC'")

    def s(lit):
        return spark.sql(
            f"SELECT CAST(TRY_CAST('{lit}' AS TIMESTAMP) AS STRING)"
        ).first()[0]

    def d(lit):
        return con.execute(
            f"SELECT CAST(TRY_CAST('{lit}' AS TIMESTAMP) AS VARCHAR)"
        ).fetchone()[0]

    # the nine split points, each asserted in its observed direction
    assert s("2024-03-05 12:34") == "2024-03-05 12:34:00" and d("2024-03-05 12:34") is None
    assert s("2024-03-05 12:34:56 +02:00") == "2024-03-05 10:34:56"
    assert d("2024-03-05 12:34:56 +02:00") is None
    assert s("2024-03-05 24:00:00") is None
    assert d("2024-03-05 24:00:00") == "2024-03-06 00:00:00"
    assert s("2024-03-05 12:34:56 CET") == "2024-03-05 11:34:56"
    assert d("2024-03-05 12:34:56 CET") is None
    assert s("2024-03-05 12:34:56 utc") is None
    assert d("2024-03-05 12:34:56 utc") == "2024-03-05 12:34:56"
    assert s("2024-03-05 12:34:56UTC") == "2024-03-05 12:34:56"
    assert d("2024-03-05 12:34:56UTC") is None
    assert s("2024-03-05 12:34:56+2:00") == "2024-03-05 10:34:56"
    assert d("2024-03-05 12:34:56+2:00") is None
    assert s("2024/03/05 12:34:56") is None
    assert d("2024/03/05 12:34:56") == "2024-03-05 12:34:56"
    assert s("+2024-03-05 12:34:56") == "2024-03-05 12:34:56"
    assert d("+2024-03-05 12:34:56") is None

    # the declared clean core agrees value-exactly
    for lit, want in [
        ("2024-03-05 12:34:56", "2024-03-05 12:34:56"),
        ("2024-03-05T12:34:56", "2024-03-05 12:34:56"),
        ("2024-03-05 12:34:56.123", "2024-03-05 12:34:56.123"),
        ("2024-03-05 12:34:56.123456789", "2024-03-05 12:34:56.123456"),
        ("2024-03-05", "2024-03-05 00:00:00"),
        ("2024-3-5 1:2:3", "2024-03-05 01:02:03"),
        ("2024-03-05 12:34:56Z", "2024-03-05 12:34:56"),
        ("2024-03-05 12:34:56+02:00", "2024-03-05 10:34:56"),
        ("2024-03-05T12:34:56+0200", "2024-03-05 10:34:56"),
        ("2024-03-05 12:34:56+02", "2024-03-05 10:34:56"),
        ("2024-03-05 12:34:56-02:30", "2024-03-05 15:04:56"),
        (" 2024-03-05 12:34:56 ", "2024-03-05 12:34:56"),
        ("2024-03-05 12:34:56 UTC", "2024-03-05 12:34:56"),
        ("2024-02-30 00:00:00", None),
        ("2024-03-05 12:34:60", None),
        ("20240305", None),
    ]:
        assert s(lit) == d(lit) == want, (lit, s(lit), d(lit))


def test_interval_arithmetic_personality_pinned(spark):
    """Round-13 probe: INTERVAL personalities. Spark has TWO interval
    classes (year-month, day-time) that never mix; DuckDB has ONE
    normalized INTERVAL (1 month == 30 days). Splits, with the banned /
    declared spelling for each:

      * DATE + INTERVAL: Spark keeps DATE for year-month/day units and
        widens to TIMESTAMP only for sub-day units; DuckDB ALWAYS
        returns TIMESTAMP — type- and value-hash split. Spelling: cast
        the date operand to TIMESTAMP on both twins before adding.
      * mixed-class arithmetic (INTERVAL MONTH + INTERVAL DAY, the
        '1 month 2 days' compound literal): Spark type-errors, DuckDB
        normalizes. BANNED in twinned code — chain single-class adds
        onto the timestamp instead (ts + INTERVAL month + INTERVAL day
        parses on both).
      * cross-class comparison (INTERVAL '1' MONTH = INTERVAL '30'
        DAY): Spark type-errors; DuckDB says TRUE via the 30-day
        normalization. BANNED.
      * EXTRACT(EPOCH ...): DuckDB returns DOUBLE seconds, Spark has
        no EPOCH field. Spelling: Spark unix_timestamp(ts) ==
        DuckDB CAST(FLOOR(EXTRACT(EPOCH FROM ts)) AS BIGINT).

    CLEAN classes pinned: month-end clamping (Jan 31 + 1 MONTH -> Feb
    29 on both), timestamp ± day-time intervals, interval * integer,
    same-class comparison, ts - ts (both yield a day-time interval
    value-equal across engines)."""
    import duckdb as _duck
    import pytest as _pt
    from pyspark.errors.exceptions.captured import AnalysisException
    from pyspark.errors.exceptions.base import PySparkException

    con = _duck.connect()
    con.execute("SET TimeZone='UTC'")

    # DATE + INTERVAL type split
    sdf = spark.sql("SELECT DATE '2024-01-31' + INTERVAL '1' MONTH AS v")
    assert sdf.schema[0].dataType.simpleString() == "date"
    assert str(sdf.first()[0]) == "2024-02-29"
    dv, dt = con.execute(
        "SELECT DATE '2024-01-31' + INTERVAL '1' MONTH AS v, typeof(v)"
    ).fetchone()
    assert dt == "TIMESTAMP" and str(dv) == "2024-02-29 00:00:00"
    # the declared spelling agrees (cast to TIMESTAMP first)
    fixed = "CAST(DATE '2024-01-31' AS TIMESTAMP) + INTERVAL '1' MONTH"
    assert (
        str(spark.sql(f"SELECT {fixed}").first()[0])
        == str(con.execute(f"SELECT {fixed}").fetchone()[0])
        == "2024-02-29 00:00:00"
    )

    # mixed-class arithmetic: Spark errors, DuckDB normalizes
    with _pt.raises(PySparkException):
        spark.sql("SELECT INTERVAL '1' MONTH + INTERVAL '1' DAY").collect()
    assert (
        str(con.execute("SELECT INTERVAL '1' MONTH + INTERVAL '1' DAY").fetchone()[0])
        == "31 days, 0:00:00"
    )
    # the chained spelling parses and agrees on both
    chain = "TIMESTAMP '2024-01-31 10:00:00' + INTERVAL '1' MONTH + INTERVAL '2' DAY"
    assert (
        str(spark.sql(f"SELECT {chain}").first()[0])
        == str(con.execute(f"SELECT {chain}").fetchone()[0])
        == "2024-03-02 10:00:00"
    )

    # cross-class comparison: Spark errors, DuckDB normalizes to TRUE
    with _pt.raises(PySparkException):
        spark.sql("SELECT INTERVAL '1' MONTH = INTERVAL '30' DAY").collect()
    assert con.execute("SELECT INTERVAL '1' MONTH = INTERVAL '30' DAY").fetchone()[0] is True

    # EXTRACT(EPOCH): duck-only; the aligned spelling
    with _pt.raises((AnalysisException, PySparkException)):
        spark.sql("SELECT EXTRACT(EPOCH FROM TIMESTAMP '2024-03-05 12:00:00')").collect()
    s_epoch = spark.sql(
        "SELECT unix_timestamp(TIMESTAMP '2024-03-05 12:00:00')"
    ).first()[0]
    d_epoch = con.execute(
        "SELECT CAST(FLOOR(EXTRACT(EPOCH FROM TIMESTAMP '2024-03-05 12:00:00')) AS BIGINT)"
    ).fetchone()[0]
    assert s_epoch == d_epoch == 1709640000

    # clean classes
    clamp = "TIMESTAMP '2024-01-31 10:00:00' + INTERVAL '1' MONTH"
    assert (
        str(spark.sql(f"SELECT {clamp}").first()[0])
        == str(con.execute(f"SELECT {clamp}").fetchone()[0])
        == "2024-02-29 10:00:00"
    )
    diff = "TIMESTAMP '2024-03-05 12:00:00' - TIMESTAMP '2024-03-01 06:30:00'"
    assert (
        str(spark.sql(f"SELECT {diff}").first()[0])
        == str(con.execute(f"SELECT {diff}").fetchone()[0])
    )
    cmp2 = "INTERVAL '2' DAY > INTERVAL '1' DAY"
    assert spark.sql(f"SELECT {cmp2}").first()[0] is True
    assert con.execute(f"SELECT {cmp2}").fetchone()[0] is True


def test_map_struct_semantics_pinned(spark):
    """Round-13 probe: MAP/STRUCT ordering + equality, now that struct
    comparators are load-bearing in max_by tie-breaks. Splits:

      * MAP ACCESS SHAPE: DuckDB 1.0's bracket/element_at returns a
        LIST (empty on miss: typeof = INTEGER[]); Spark returns the
        scalar or NULL. Declared spelling for twinned map access:
        Spark `m['k']` == DuckDB `m['k'][1]` (1-indexed list access
        NULLs on miss, matching Spark exactly — pinned below).
      * MAP EQUALITY: DuckDB compares maps; Spark raises
        INVALID_ORDERING_TYPE. BANNED in twinned code (compare
        map_entries of canonically sorted keys instead).
      * STRUCT COMPARISON WITH NULL FIELDS: Spark's struct comparator
        is null-safe per field (struct(1, NULL) = struct(1, NULL) is
        TRUE; NULL fields sort FIRST under ORDER BY); DuckDB
        propagates SQL NULL out of the comparison and sorts NULL
        fields LAST. Declared contract: fields inside twinned struct
        comparators (max_by/min_by tie-break keys, sort keys) must be
        NON-NULL — coalesce first. Every shipping comparator struct
        already rides non-null columns (q90/q82's (csim, -cent_id),
        q126's (ts, op_rank) after NOT-NULL CDC contract).
      * complex->string rendering differs everywhere (Spark '{1, 9}'
        vs DuckDB struct-literal syntax) — CAST(complex AS STRING)
        stays banned in twinned result columns.

    CLEAN classes pinned: map_keys/map_entries preserve insertion
    order on both; struct comparison/ordering over NON-NULL fields is
    field-lexicographic on both; duplicate map keys fail LOUDLY on
    both (Spark DUPLICATED_MAP_KEY under ANSI, DuckDB Invalid Input
    Error) — a dup-keyed map can never silently verify."""
    import duckdb as _duck
    import pytest as _pt
    from pyspark.errors.exceptions.base import PySparkException

    con = _duck.connect()

    # map access shape + aligned spelling
    assert con.execute("SELECT typeof((MAP {'a':1})['a'])").fetchone()[0] == "INTEGER[]"
    assert spark.sql("SELECT map('a',1)['missing']").first()[0] is None
    assert con.execute("SELECT (MAP {'a':1})['missing'][1]").fetchone()[0] is None
    assert (
        spark.sql("SELECT map('a',1)['a']").first()[0]
        == con.execute("SELECT (MAP {'a':1})['a'][1]").fetchone()[0]
        == 1
    )

    # map equality: banned (engine raises, oracle would normalize)
    with _pt.raises(PySparkException):
        spark.sql("SELECT map('a',1) = map('a',1)").collect()
    assert con.execute("SELECT MAP {'a':1} = MAP {'a':1}").fetchone()[0] is True

    # struct comparison with NULL fields: null-safe TRUE vs SQL NULL
    assert spark.sql(
        "SELECT named_struct('a',1,'b',CAST(NULL AS INT))"
        " = named_struct('a',1,'b',CAST(NULL AS INT))"
    ).first()[0] is True
    assert con.execute(
        "SELECT {'a':1,'b':NULL::INT} = {'a':1,'b':NULL::INT}"
    ).fetchone()[0] is None
    # ...and the ORDER BY placement inverts (NULL field first vs last)
    s_order = [
        r.s.a
        for r in spark.sql(
            "SELECT s FROM VALUES (named_struct('a',1)),"
            " (named_struct('a',CAST(NULL AS INT))) t(s) ORDER BY s"
        ).collect()
    ]
    d_order = [
        r[0]["a"]
        for r in con.execute(
            "SELECT s FROM (VALUES ({'a':1}), ({'a':NULL::INT})) t(s) ORDER BY s"
        ).fetchall()
    ]
    assert s_order == [None, 1] and d_order == [1, None]

    # clean: insertion order, non-null struct comparison, loud dup keys
    assert spark.sql("SELECT map_keys(map('b',1,'a',2))").first()[0] == ["b", "a"]
    assert con.execute("SELECT map_keys(MAP {'b':1,'a':2})").fetchone()[0] == ["b", "a"]
    for expr in (
        "named_struct('a',1,'b',2) < named_struct('a',1,'b',3)",
        "named_struct('a',1,'b',9) < named_struct('a',2,'b',1)",
    ):
        duck_expr = (
            expr.replace("named_struct('a',", "{'a':")
            .replace(",'b',", ",'b':")
            .replace(")", "}")
        )
        assert spark.sql(f"SELECT {expr}").first()[0] is True
        assert con.execute(f"SELECT {duck_expr}").fetchone()[0] is True
    with _pt.raises(PySparkException):
        spark.sql("SELECT map('a',1,'a',2)").collect()
    with _pt.raises(_duck.InvalidInputException):
        con.execute("SELECT MAP {'a':1,'a':2}").fetchall()


def test_percentile_nan_and_decimal_interpolation_splits_pinned(spark):
    """Round-13 wave-2 probe: exact-percentile personalities across the
    twins (q17/q108/q139 all twin Spark ``percentile`` with DuckDB
    ``QUANTILE_CONT``). Splits:

      * NAN PLACEMENT INVERTS: Spark's percentile sort places NaN
        HIGHEST (Java comparator: percentile([nan,1,2], 0.5) = 2.0);
        DuckDB's quantile_cont places NaN LOWEST (= 1.0). A NaN-bearing
        column silently shifts every quantile in opposite directions.
        Declared contract: percentile inputs must be NaN-free — every
        shipping percentile rides integer cents or integer epoch-second
        differences (q17/q108 cents, q139 unix_timestamp diffs), where
        NaN is untypeable.
      * DECIMAL INPUT ROUNDS THE INTERPOLANT: DuckDB's quantile_cont
        over a DECIMAL column returns DECIMAL at the INPUT's scale —
        quantile_cont(DECIMAL(10,1) [1..4], 0.25) = 1.7, the true 1.75
        interpolant rounded to scale 1 — while Spark's percentile always
        interpolates in DOUBLE (1.75). Declared spelling: never feed
        QUANTILE_CONT a DECIMAL — cast to DOUBLE/BIGINT first (the cents
        idiom already does; sweep at pin time found zero DECIMAL-typed
        percentile args in shipping oracles — q17/q108's l_quantity and
        cents columns are parquet DOUBLE/BIGINT).
      * DEFAULT QUANTILE IS DISC, NOT CONT, ON DUCKDB: quantile(x, p) ==
        quantile_disc(x, p) picks an order statistic (no interpolation);
        Spark's percentile interpolates. Twinned spelling must say
        QUANTILE_CONT explicitly (all three shipping oracles do).

    CLEAN classes pinned: INT and DOUBLE inputs interpolate identically
    in DOUBLE on both; NULLs are skipped (not counted) on both; +inf as
    a data value occupies the top rank identically on both."""
    import duckdb as _duck

    con = _duck.connect()

    # NaN placement inverts
    s = spark.sql(
        "SELECT percentile(x, 0.5) FROM VALUES"
        " (double('nan')),(CAST(1.0 AS DOUBLE)),(CAST(2.0 AS DOUBLE)) t(x)"
    ).first()[0]
    d = con.execute(
        "SELECT quantile_cont(x, 0.5) FROM"
        " (VALUES ('nan'::DOUBLE),(1.0::DOUBLE),(2.0::DOUBLE)) t(x)"
    ).fetchone()[0]
    assert (s, d) == (2.0, 1.0), "NaN quantile placement now agrees — revisit"

    # DECIMAL input rounds the interpolant to input scale on DuckDB only
    s = spark.sql(
        "SELECT percentile(x, 0.25) FROM VALUES"
        " (CAST(1 AS DECIMAL(10,1))),(CAST(2 AS DECIMAL(10,1)))"
        ",(CAST(3 AS DECIMAL(10,1))),(CAST(4 AS DECIMAL(10,1))) t(x)"
    ).first()[0]
    d = con.execute(
        "SELECT quantile_cont(x, 0.25) FROM (VALUES"
        " (1::DECIMAL(10,1)),(2::DECIMAL(10,1)),(3::DECIMAL(10,1))"
        ",(4::DECIMAL(10,1))) t(x)"
    ).fetchone()[0]
    assert s == 1.75 and str(d) == "1.7", "decimal interpolant scale — revisit"

    # bare quantile() is the DISC order statistic, not the interpolation
    assert (
        con.execute(
            "SELECT quantile(x, 0.5) FROM (VALUES (1::INT),(2),(3),(4)) t(x)"
        ).fetchone()[0]
        == 2
    )

    # clean: INT/DOUBLE interpolation, NULL skip, +inf top rank
    for s_sql, d_sql, want in [
        (
            "SELECT percentile(x, 0.25) FROM VALUES (1),(2),(3),(4) t(x)",
            "SELECT quantile_cont(x, 0.25) FROM (VALUES (1::INT),(2),(3),(4)) t(x)",
            1.75,
        ),
        (
            "SELECT percentile(x, 0.5) FROM VALUES"
            " (CAST(1.0 AS DOUBLE)),(CAST(2.0 AS DOUBLE)),(NULL) t(x)",
            "SELECT quantile_cont(x, 0.5) FROM"
            " (VALUES (1.0::DOUBLE),(2.0::DOUBLE),(NULL)) t(x)",
            1.5,
        ),
        (
            "SELECT percentile(x, 0.5) FROM VALUES"
            " (double('inf')),(CAST(1.0 AS DOUBLE)),(CAST(2.0 AS DOUBLE)) t(x)",
            "SELECT quantile_cont(x, 0.5) FROM"
            " (VALUES ('inf'::DOUBLE),(1.0::DOUBLE),(2.0::DOUBLE)) t(x)",
            2.0,
        ),
    ]:
        assert spark.sql(s_sql).first()[0] == con.execute(d_sql).fetchone()[0] == want


def test_sequence_generate_series_boundary_splits_pinned(spark):
    """Round-13 wave-2 probe: integer/date series construction across the
    twins (Spark ``sequence`` vs DuckDB ``generate_series``). Splits:

      * DESCENDING AUTO-STEP: Spark's 2-arg sequence(5,1) infers step -1
        and returns [5,4,3,2,1]; DuckDB's generate_series(5,1) returns
        EMPTY (step defaults to +1 regardless of bound order). An
        inverted bound pair silently yields a full descending array on
        one engine and nothing on the other. Declared contract: twinned
        series must prove start <= stop (guard or constant) or spell the
        step explicitly. Sweep at pin time: every shipping sequence site
        is guarded — shingle/n-gram sites sit under CASE size(words) >=
        N (llm_dedup/llm_pipeline), chunk counts are >= 1 by
        construction (llm_dedup q111, llm_text q121), day spines run
        min(ts)..max(ts) (streaming_twins), the rest are constants.
      * ZERO STEP IS LOUD VS SILENT-EMPTY: sequence(1,5,0) raises on
        Spark; generate_series(1,5,0) returns EMPTY on DuckDB 1.0 — a
        degenerate step can never silently verify, but only Spark makes
        it loud. Pinned as a personality (no shipping variable steps).
      * DATE SERIES TYPING: Spark sequence(DATE, DATE, INTERVAL day)
        returns ARRAY<DATE> (and has a 2-arg date form); DuckDB's
        generate_series over dates requires the 3-arg INTERVAL form and
        returns TIMESTAMP[] (and the 2-arg date form does not bind).
        Twinned day spines must cast the DuckDB side back to DATE (the
        shipping day-spine oracles do).

    CLEAN classes pinned: inclusive bounds on both ([1,5] has 5
    elements, [1,1] has 1); explicit negative step agrees; month
    stepping over dates agrees (clamp-free anchors)."""
    import duckdb as _duck
    import pytest as _pt
    from pyspark.errors.exceptions.base import PySparkException

    con = _duck.connect()

    # descending auto-step: full array vs empty
    assert spark.sql("SELECT sequence(5,1)").first()[0] == [5, 4, 3, 2, 1]
    assert con.execute("SELECT generate_series(5,1)").fetchone()[0] == []

    # zero step: loud vs silent-empty
    with _pt.raises(PySparkException):
        spark.sql("SELECT sequence(1,5,0)").collect()
    assert con.execute("SELECT generate_series(1,5,0)").fetchone()[0] == []

    # date series typing: ARRAY<DATE> vs TIMESTAMP[] (+ 2-arg binding)
    s_df = spark.sql(
        "SELECT sequence(DATE'2024-01-01', DATE'2024-01-07', interval 3 day) AS s"
    )
    assert s_df.schema["s"].dataType.simpleString() == "array<date>"
    assert con.execute(
        "SELECT typeof(generate_series(DATE '2024-01-01', DATE '2024-01-07',"
        " INTERVAL 3 DAY))"
    ).fetchone()[0] == "TIMESTAMP[]"
    assert spark.sql(
        "SELECT size(sequence(DATE'2024-01-01', DATE'2024-01-03'))"
    ).first()[0] == 3
    with _pt.raises(_duck.BinderException):
        con.execute(
            "SELECT generate_series(DATE '2024-01-01', DATE '2024-01-03')"
        ).fetchall()

    # clean: inclusive bounds, explicit negative step, month stepping
    assert (
        spark.sql("SELECT sequence(1,5)").first()[0]
        == con.execute("SELECT generate_series(1,5)").fetchone()[0]
        == [1, 2, 3, 4, 5]
    )
    assert (
        spark.sql("SELECT sequence(1,1)").first()[0]
        == con.execute("SELECT generate_series(1,1)").fetchone()[0]
        == [1]
    )
    assert (
        spark.sql("SELECT sequence(5,1,-2)").first()[0]
        == con.execute("SELECT generate_series(5,1,-2)").fetchone()[0]
        == [5, 3, 1]
    )
    s_months = spark.sql(
        "SELECT sequence(DATE'2024-01-01', DATE'2024-03-01', interval 1 month)"
    ).first()[0]
    d_months = con.execute(
        "SELECT generate_series(DATE '2024-01-01', DATE '2024-03-01',"
        " INTERVAL 1 MONTH)"
    ).fetchone()[0]
    assert [str(x) for x in s_months] == [str(x.date()) for x in d_months]


def test_log_mod_sign_week_personalities_pinned(spark):
    """Round-13 wave-3 probe: math/date scalar personalities. Splits:

      * 1-ARG LOG NAME COLLISION: Spark ``log(x)`` is the NATURAL log
        (log(100) = 4.605...); DuckDB ``log(x)`` is BASE-10 (= 2.0) — a
        silent ~2.3x factor on any twinned 1-arg LOG. Banned spelling;
        write LN / LOG10 / LOG2 explicitly (the one shipping twinned
        log, q42's price_ln, already spells F.log <-> LN). The 2-ARG
        form is CLEAN: both engines read log(base, x) base-first.
      * FMOD NAME TRAP: DuckDB ``fmod(-7.5, 2)`` = 0.5 is the FLOOR-mod
        — it equals Spark's ``pmod``, NOT Spark's ``mod``/%. The
        operator ``%`` itself agrees on doubles (dividend sign, -1.5
        both) — twins must spell %, never the fmod/pmod names.
      * SIGN: Spark returns DOUBLE preserving -0.0 and NaN (sign(-0.0)
        = -0.0, sign(NaN) = NaN); DuckDB returns TINYINT 0 for both —
        type AND value split on the IEEE edge cases. No shipping twin
        uses sign; pinned as a banned-unless-guarded personality.
      * CEIL/FLOOR RESULT TYPE: Spark returns BIGINT; DuckDB returns
        the input's family (DOUBLE in, DOUBLE out). Values agree on
        half-integers (ceil(-2.5) = -2, floor(-2.5) = -3 both); every
        shipping twin casts the DuckDB side to BIGINT (scalars q41's
        price_floor/price_ceil, the EPOCH() idiom).
      * DATE_TRUNC('week') TYPE: both truncate to MONDAY (value-clean,
        Sunday 2026-08-16 -> 08-10, Monday 08-17 fixed), but Spark
        returns TIMESTAMP and DuckDB DATE — a twinned week-trunc must
        cast (same nuance as month arithmetic, pinned clean there).

    CLEAN classes pinned: 2-arg log base-first on both; ln/log10/log2;
    weekofyear is ISO on both (2026-01-01 -> 1, 2027-01-01 -> 53);
    Spark extract(YEAROFWEEK) == DuckDB isoyear (2027-01-01 -> 2026);
    dayofyear; pow(0,0) = 1; exp/pow overflow to +inf SILENTLY on both
    (contrast: the LN/SQRT domain class raises on DuckDB — §2b); atan2
    is (y, x) on both."""
    import duckdb as _duck

    con = _duck.connect()

    # 1-arg log: ln vs log10
    s = spark.sql("SELECT log(100.0D)").first()[0]
    d = con.execute("SELECT log(100.0::DOUBLE)").fetchone()[0]
    assert abs(s - 4.605170185988092) < 1e-12 and d == 2.0, "log collision — revisit"
    # 2-arg log is base-first on both; named logs agree
    for s_sql, d_sql, want in [
        ("SELECT log(2, 8.0D)", "SELECT log(2, 8.0::DOUBLE)", 3.0),
        ("SELECT ln(8.0D)", "SELECT ln(8.0::DOUBLE)", 2.0794415416798357),
        ("SELECT log10(100.0D)", "SELECT log10(100.0::DOUBLE)", 2.0),
        ("SELECT log2(8.0D)", "SELECT log2(8.0::DOUBLE)", 3.0),
    ]:
        assert spark.sql(s_sql).first()[0] == con.execute(d_sql).fetchone()[0] == want

    # fmod name trap: duck fmod == spark pmod; % agrees
    assert con.execute("SELECT fmod(-7.5::DOUBLE, 2.0::DOUBLE)").fetchone()[0] == 0.5
    assert spark.sql("SELECT pmod(-7.5D, 2.0D)").first()[0] == 0.5
    assert (
        spark.sql("SELECT -7.5D % 2.0D").first()[0]
        == con.execute("SELECT -7.5::DOUBLE % 2.0::DOUBLE").fetchone()[0]
        == -1.5
    )

    # sign: double-preserving vs TINYINT-flattening
    import math as _math

    s = spark.sql("SELECT sign(double('nan')), sign(-0.0D)").first()
    assert _math.isnan(s[0]) and _math.copysign(1.0, s[1]) == -1.0
    d = con.execute(
        "SELECT sign('nan'::DOUBLE), sign(-0.0::DOUBLE),"
        " typeof(sign(-0.0::DOUBLE))"
    ).fetchone()
    assert d == (0, 0, "TINYINT")

    # ceil/floor: values agree, types split (BIGINT vs input family)
    s_df = spark.sql("SELECT ceil(-2.5D) AS c, floor(-2.5D) AS f")
    assert tuple(s_df.first()) == (-2, -3)
    assert [f.dataType.simpleString() for f in s_df.schema.fields] == [
        "bigint",
        "bigint",
    ]
    d = con.execute(
        "SELECT ceil(-2.5::DOUBLE), floor(-2.5::DOUBLE),"
        " typeof(ceil(-2.5::DOUBLE))"
    ).fetchone()
    assert d == (-2.0, -3.0, "DOUBLE")

    # date_trunc('week'): Monday on both, TIMESTAMP vs DATE type
    s_df = spark.sql("SELECT date_trunc('week', DATE '2026-08-16') AS w")
    assert str(s_df.first()[0]) == "2026-08-10 00:00:00"
    assert s_df.schema["w"].dataType.simpleString() == "timestamp"
    d = con.execute(
        "SELECT date_trunc('week', DATE '2026-08-16'),"
        " typeof(date_trunc('week', DATE '2026-08-16'))"
    ).fetchone()
    assert str(d[0]) == "2026-08-10" and d[1] == "DATE"

    # clean: ISO week fields, dayofyear, pow(0,0), silent inf overflow, atan2
    for s_sql, d_sql, want in [
        (
            "SELECT weekofyear(DATE '2027-01-01')",
            "SELECT weekofyear(DATE '2027-01-01')",
            53,
        ),
        (
            "SELECT extract(yearofweek FROM DATE '2027-01-01')",
            "SELECT isoyear(DATE '2027-01-01')",
            2026,
        ),
        (
            "SELECT dayofyear(DATE '2026-03-01')",
            "SELECT dayofyear(DATE '2026-03-01')",
            60,
        ),
        ("SELECT pow(0.0D, 0.0D)", "SELECT pow(0.0::DOUBLE, 0.0::DOUBLE)", 1.0),
        (
            "SELECT atan2(0.0D, -1.0D)",
            "SELECT atan2(0.0::DOUBLE, -1.0::DOUBLE)",
            3.141592653589793,
        ),
    ]:
        assert spark.sql(s_sql).first()[0] == con.execute(d_sql).fetchone()[0] == want
    assert spark.sql("SELECT exp(710.0D)").first()[0] == float("inf")
    assert con.execute("SELECT exp(710.0::DOUBLE)").fetchone()[0] == float("inf")


def test_bitwise_shift_and_caret_personalities_pinned(spark):
    """Round-13 wave-4 probe: bitwise personalities under the SimHash /
    packed-pair-key machinery (llm_dedup twins shiftleft/shiftright/&/
    bit_count with DuckDB <</>>/&/BIT_COUNT and Spark ^ with DuckDB
    XOR()). Splits:

      * THE CARET OPERATOR COLLIDES: ``5 ^ 3`` is bitwise XOR on Spark
        (6, BIGINT) and EXPONENTIATION on DuckDB (125.0, DOUBLE) — a
        silent value-and-type split on any shared-SQL caret. Banned in
        twinned spellings: Spark side may use ^ / bitwiseXOR, the
        DuckDB side must spell XOR(a, b) (llm_dedup's hamming oracle
        already does).
      * LEFT-SHIFT EDGES ARE SILENT-WRAP VS LOUD: Spark shiftleft
        wraps the count mod 64 (1L<<64 = 1, 1L<<65 = 2, count -1 ==
        count 63) and overflows into/past the sign bit silently
        (1L<<63 = 2L<<62 = Long.MIN_VALUE); DuckDB raises Out of Range
        on count >= 64, on negative counts, AND on sign-bit overflow
        (1::BIGINT << 63 errors). Declared domain for twinned shifts:
        count a constant in [0, 62] and the shifted value provably
        clear of the sign bit — the shipping uses are SIM_BITS-1 = 59
        band shifts and 32-bit id packing (max bit 62), swept.
      * BIT_COUNT WIDTH SENSITIVITY: over a NEGATIVE 32-bit INT, Spark
        widens to BIGINT first (bit_count(-1 INT) = 64) while DuckDB
        counts at the input width (= 32). Agrees on nonnegative values
        of any width (high bits zero) — the shipping bit_count rides
        XOR of two nonnegative 60-bit signatures, always nonnegative.

    CLEAN classes pinned: >> is the ARITHMETIC shift on both (-8 >> 1
    = -4, -1 >> 63 = -1 — why packed pair keys must stay nonnegative,
    llm_dedup.py's shiftrightunsigned note; shiftrightunsigned itself
    is Spark-only, no DuckDB twin); & and unary ~ agree; XOR spelled
    as Spark ^ == DuckDB XOR() on BIGINT."""
    import duckdb as _duck
    import pytest as _pt
    from pyspark.errors.exceptions.base import PySparkException  # noqa: F401

    con = _duck.connect()

    # caret collision: XOR vs POWER
    s_df = spark.sql("SELECT 5L ^ 3L AS x")
    assert s_df.first()[0] == 6
    assert s_df.schema["x"].dataType.simpleString() == "bigint"
    d = con.execute("SELECT 5::BIGINT ^ 3::BIGINT, typeof(5 ^ 3)").fetchone()
    assert d == (125.0, "DOUBLE"), "caret semantics changed — revisit"

    # left-shift edges: silent wrap vs loud out-of-range
    assert spark.sql("SELECT shiftleft(1L, 64)").first()[0] == 1
    assert spark.sql("SELECT shiftleft(1L, 65)").first()[0] == 2
    assert spark.sql("SELECT shiftleft(1L, -1)").first()[0] == -(2**63)
    assert spark.sql("SELECT shiftleft(1L, 63)").first()[0] == -(2**63)
    assert spark.sql("SELECT shiftleft(2L, 62)").first()[0] == -(2**63)
    for bad in ["1::BIGINT << 64", "1::BIGINT << -1", "1::BIGINT << 63"]:
        with _pt.raises(_duck.OutOfRangeException):
            con.execute(f"SELECT {bad}").fetchall()
    # in-domain agreement at the shipping maximum (bit 62)
    assert (
        spark.sql("SELECT shiftleft(1L, 62)").first()[0]
        == con.execute("SELECT 1::BIGINT << 62").fetchone()[0]
        == 2**62
    )

    # bit_count width: negative INT widens on Spark, not on DuckDB
    assert spark.sql("SELECT bit_count(CAST(-1 AS INT))").first()[0] == 64
    assert con.execute("SELECT bit_count((-1)::INT)").fetchone()[0] == 32
    # ...and agrees on nonnegative values and on BIGINT
    assert (
        spark.sql("SELECT bit_count(-1L)").first()[0]
        == con.execute("SELECT bit_count(-1::BIGINT)").fetchone()[0]
        == 64
    )
    assert (
        spark.sql("SELECT bit_count(CAST(1048575 AS INT))").first()[0]
        == con.execute("SELECT bit_count(1048575::INT)").fetchone()[0]
        == 20
    )

    # clean: arithmetic >>, &, ~, XOR under the twinned spelling
    for s_sql, d_sql, want in [
        ("SELECT shiftright(-8L, 1)", "SELECT -8::BIGINT >> 1", -4),
        ("SELECT shiftright(-1L, 63)", "SELECT (-1)::BIGINT >> 63", -1),
        ("SELECT 5L & -1L", "SELECT 5::BIGINT & -1::BIGINT", 5),
        ("SELECT ~5L", "SELECT ~5::BIGINT", -6),
        ("SELECT 5L ^ 3L", "SELECT xor(5::BIGINT, 3::BIGINT)", 6),
    ]:
        assert spark.sql(s_sql).first()[0] == con.execute(d_sql).fetchone()[0] == want
    # shiftrightunsigned exists only on Spark (logical shift); the packed
    # pair key stays nonnegative by construction so >> twins suffice
    assert spark.sql("SELECT shiftrightunsigned(-8L, 1)").first()[0] == 2**63 - 4


def test_implicit_coercion_personalities_pinned(spark):
    """Round-13 wave-5 probe: implicit type-coercion personalities —
    the family an oracle author hits by OMITTING a cast. Splits:

      * STRING-vs-INT EQUALITY COERCES IN DIFFERENT FAMILIES: DuckDB
        resolves '5.0' = 5 through the numeric family (TRUE); Spark-ANSI
        casts the string to the integer side's type and RAISES
        CAST_INVALID_INPUT on '5.0' (not a BIGINT literal). A fractional
        string against an integer column is loud on one engine and
        silently TRUE on the other. Declared contract: never compare
        strings to numbers in twinned code — cast explicitly (the
        strict-digit TRANSLATE guard is the worked idiom).
      * UNION BRANCH COERCION INVERTS DIRECTION: int UNION ALL string
        resolves to VARCHAR on DuckDB ('1','2' — lexicographic order,
        '10' < '2') but BIGINT on Spark (1, 2 — numeric order). A
        heterogeneous UNION silently flips both values' types and sort
        order. Banned: every twinned UNION branch must project
        identically-typed columns (the oracle type-fidelity sweep in
        test_oracle_parity.py enforces the OUTPUT types; this pin covers
        the intermediate-CTE hazard).
      * GREATEST/LEAST MIXED TYPES: DuckDB coerces (greatest(1,'2') =
        2); Spark raises DATATYPE_MISMATCH — loud-vs-silent again.

    CLEAN classes pinned: integer-grammar strings compare numerically on
    both ('5' = 5, '05' = 5, ' 5 ' = 5 — trimmed, zero-tolerant); 5 <
    '10' is numeric on both (never lexicographic); date-vs-string
    comparison parses the literal on both; non-numeric strings against
    numbers RAISE on both ('abc' = 5, '' = 0 — empty string is NOT 0);
    concat('a', 5) stringifies on both; 'true' = true parses on both."""
    import duckdb as _duck
    import pytest as _pt
    from pyspark.errors.exceptions.base import PySparkException

    con = _duck.connect()

    # '5.0' = 5: silent TRUE vs loud ANSI cast failure
    assert con.execute("SELECT '5.0' = 5").fetchone()[0] is True
    with _pt.raises(PySparkException):
        spark.sql("SELECT '5.0' = 5").collect()

    # UNION coercion direction: VARCHAR vs BIGINT
    assert (
        con.execute(
            "SELECT typeof(x) FROM (SELECT 1 AS x UNION ALL SELECT '2') t LIMIT 1"
        ).fetchone()[0]
        == "VARCHAR"
    )
    s_df = spark.sql("SELECT x FROM (SELECT 1 AS x UNION ALL SELECT '2') t")
    assert s_df.schema["x"].dataType.simpleString() == "bigint"
    # ...and the silent order inversion that follows ('10' vs 2)
    d_order = [
        r[0]
        for r in con.execute(
            "SELECT x FROM (SELECT 10 AS x UNION ALL SELECT '2') t ORDER BY x"
        ).fetchall()
    ]
    s_order = [
        r[0]
        for r in spark.sql(
            "SELECT x FROM (SELECT 10 AS x UNION ALL SELECT '2') t ORDER BY x"
        ).collect()
    ]
    assert d_order == ["10", "2"] and s_order == [2, 10]

    # greatest over mixed types: silent coercion vs loud mismatch
    assert con.execute("SELECT greatest(1, '2')").fetchone()[0] == 2
    with _pt.raises(Exception):
        spark.sql("SELECT greatest(1, '2')").collect()

    # clean classes
    for s_sql, d_sql, want in [
        ("SELECT '5' = 5", "SELECT '5' = 5", True),
        ("SELECT '05' = 5", "SELECT '05' = 5", True),
        ("SELECT ' 5 ' = 5", "SELECT ' 5 ' = 5", True),
        ("SELECT 5 < '10'", "SELECT 5 < '10'", True),
        (
            "SELECT DATE '2024-01-02' < '2024-01-03'",
            "SELECT DATE '2024-01-02' < '2024-01-03'",
            True,
        ),
        ("SELECT concat('a', 5)", "SELECT concat('a', 5)", "a5"),
        ("SELECT 'true' = true", "SELECT 'true' = true", True),
    ]:
        assert spark.sql(s_sql).first()[0] == con.execute(d_sql).fetchone()[0] == want
    for bad in ["'abc' = 5", "'' = 0"]:
        with _pt.raises(PySparkException):
            spark.sql(f"SELECT {bad}").collect()
        with _pt.raises(_duck.ConversionException):
            con.execute(f"SELECT {bad}").fetchall()


# -- round 14 probe wave: window-function personalities (the r13 verdict's
# task #6 — the one oracled family without a dedicated wave) ----------------


def test_window_null_ordering_personality_pinned(spark):
    """Round-14 probe, SPLIT CLASS 1 — default NULL placement in a window
    ORDER BY: Spark ASC defaults NULLS FIRST, DuckDB defaults NULLS LAST
    (every direction combination swept). The split cascades: it flips
    rank()/dense_rank() of NULL-key rows AND the default RANGE frame's
    peer content (Spark's only-NULL peer group sums to NULL where DuckDB's
    trailing-NULL rows see the whole partition). DESC agrees by
    coincidence (Spark flips to NULLS LAST on DESC; DuckDB stays NULLS
    LAST regardless). Both engines converge under EXPLICIT NULLS
    FIRST/LAST — the declared twinned spelling: any window ORDER BY over
    a NULLABLE key must spell the placement on both twins. The shipping
    exposure sweep is test_window_order_key_exposure_swept below."""
    import duckdb as _duck

    con = _duck.connect()
    basen = "(VALUES (1,10),(2,NULL),(3,20),(4,NULL)) AS t(id,k)"
    q = f"SELECT id, RANK() OVER (ORDER BY k) r FROM {basen} ORDER BY id"
    assert [tuple(r) for r in spark.sql(q).collect()] == [
        (1, 3), (2, 1), (3, 4), (4, 1)  # NULLS FIRST
    ]
    assert con.execute(q).fetchall() == [
        (1, 1), (2, 3), (3, 2), (4, 3)  # NULLS LAST
    ]
    qs = f"SELECT id, SUM(k) OVER (ORDER BY k) s FROM {basen} ORDER BY id"
    assert [tuple(r) for r in spark.sql(qs).collect()] == [
        (1, 10), (2, None), (3, 30), (4, None)
    ]
    assert con.execute(qs).fetchall() == [(1, 10), (2, 30), (3, 30), (4, 30)]
    # convergence under the declared spelling, both placements
    for place, expect_rank in (
        ("NULLS LAST", [(1, 1), (2, 3), (3, 2), (4, 3)]),
        ("NULLS FIRST", [(1, 3), (2, 1), (3, 4), (4, 1)]),
    ):
        qe = (f"SELECT id, RANK() OVER (ORDER BY k {place}) r FROM {basen} "
              "ORDER BY id")
        assert [tuple(r) for r in spark.sql(qe).collect()] == expect_rank
        assert con.execute(qe).fetchall() == expect_rank
    # DESC coincidental agreement
    qd = f"SELECT id, SUM(k) OVER (ORDER BY k DESC) s FROM {basen} ORDER BY id"
    assert [tuple(r) for r in spark.sql(qd).collect()] == con.execute(qd).fetchall()


def test_window_banned_constructs_pinned(spark):
    """Round-14 probe, SPLIT CLASSES 2-4 — three window constructs with NO
    twinned spelling, hereby BANNED from oracled SQL:

    * IGNORE/RESPECT NULLS: the grammars are DISJOINT — Spark parses only
      the postfix form `fn(v) IGNORE NULLS OVER ...`, DuckDB only the
      inner form `fn(v IGNORE NULLS) OVER ...`; each rejects the other's.
      Twinned code wanting skip-null window navigation expresses it
      differently (e.g. a conditional + max_by, or last_value over a
      filtered frame).
    * frame EXCLUDE (EXCLUDE CURRENT ROW / TIES / GROUP): DuckDB
      implements it, Spark has no grammar for it.
    * inverted frames (lower bound > upper bound, e.g. ROWS BETWEEN 2
      FOLLOWING AND 1 FOLLOWING): Spark rejects at analysis
      (SPECIFIED_WINDOW_FRAME_WRONG_COMPARISON), DuckDB evaluates the
      EMPTY frame and returns NULL — a loud-vs-silent split.
    Clean neighbors pinned: GROUPS frame mode fails LOUDLY on both
    (Spark parse error / DuckDB not-implemented), ntile(0) raises on
    both — no silent class there."""
    import duckdb as _duck

    import pytest as _pytest

    con = _duck.connect()
    basev = "(VALUES (1,NULL),(2,5),(3,NULL),(4,7)) AS t(id,v)"
    # postfix IGNORE NULLS: Spark yes, DuckDB no
    post = (f"SELECT id, FIRST_VALUE(v) IGNORE NULLS OVER (ORDER BY id) f "
            f"FROM {basev} ORDER BY id")
    assert [r.f for r in spark.sql(post).collect()] == [None, 5, 5, 5]
    with _pytest.raises(Exception, match="syntax error"):
        con.execute(post)
    # inner IGNORE NULLS: DuckDB yes, Spark no
    inner = (f"SELECT id, FIRST_VALUE(v IGNORE NULLS) OVER (ORDER BY id) f "
             f"FROM {basev} ORDER BY id")
    assert [r[1] for r in con.execute(inner).fetchall()] == [None, 5, 5, 5]
    with _pytest.raises(Exception, match="PARSE_SYNTAX_ERROR"):
        spark.sql(inner).collect()
    # EXCLUDE: DuckDB-only
    base = "(VALUES (1,10),(2,10),(3,20)) AS t(id,k)"
    excl = (f"SELECT id, SUM(k) OVER (ORDER BY k RANGE BETWEEN UNBOUNDED "
            f"PRECEDING AND CURRENT ROW EXCLUDE CURRENT ROW) s FROM {base} "
            "ORDER BY id")
    assert [r[1] for r in con.execute(excl).fetchall()] == [10, 10, 20]
    with _pytest.raises(Exception, match="PARSE_SYNTAX_ERROR"):
        spark.sql(excl).collect()
    # inverted frame: loud vs silent-empty
    inv = (f"SELECT id, SUM(k) OVER (ORDER BY k ROWS BETWEEN 2 FOLLOWING "
           f"AND 1 FOLLOWING) s FROM {base} ORDER BY id")
    assert [r[1] for r in con.execute(inv).fetchall()] == [None, None, None]
    with _pytest.raises(Exception, match="WRONG_COMPARISON"):
        spark.sql(inv).collect()
    # clean: GROUPS loud on both; ntile(0) loud on both
    grp = ("SELECT SUM(k) OVER (ORDER BY k GROUPS BETWEEN 1 PRECEDING AND "
           "CURRENT ROW) FROM (VALUES (1,1)) AS t(id,k)")
    with _pytest.raises(Exception):
        spark.sql(grp).collect()
    with _pytest.raises(Exception):
        con.execute(grp)
    with _pytest.raises(Exception, match="ntile"):
        spark.sql("SELECT NTILE(0) OVER (ORDER BY id) FROM (VALUES (1)) AS t(id)").collect()
    with _pytest.raises(Exception, match="ntile"):
        con.execute("SELECT NTILE(0) OVER (ORDER BY id) FROM (VALUES (1)) AS t(id)")


def test_window_clean_core_pinned(spark):
    """Round-14 probe — the CLEAN core, pinned so a future engine bump
    that breaks any of it fails here first. Verified identical on both
    engines across the sweep:

    * default-frame (RANGE UNBOUNDED..CURRENT ROW) peer semantics with
      duplicate order keys — peers share the frame on both;
    * ROWS frames with duplicate keys (deterministic here because every
      shipping ROWS window carries a total-order tiebreak — the round-4
      q32 find);
    * RANGE offset frames: numeric bounds, DESC direction, INTERVAL
      bounds over timestamps, and NULL-key rows (NULL frame -> NULL on
      both, any placement);
    * ntile remainder distribution (first tiles get the extra row) and
      fewer-rows-than-tiles (ranks 1..n);
    * percent_rank/cume_dist denominators incl. ties and the single-row
      partition (percent_rank 0);
    * lead/lag with explicit defaults and NEGATIVE offsets (lead(-1) ==
      lag(1)); nth_value under the default frame."""
    import duckdb as _duck

    con = _duck.connect()
    base = "(VALUES (1,10),(2,10),(3,20),(4,20),(5,30)) AS t(id, k)"
    basev = "(VALUES (1,NULL),(2,5),(3,NULL),(4,7)) AS t(id,v)"
    checks = [
        f"SELECT id, SUM(k) OVER (ORDER BY k) s FROM {base} ORDER BY id",
        f"SELECT id, SUM(k) OVER (ORDER BY k, id ROWS UNBOUNDED PRECEDING) s FROM {base} ORDER BY id",
        f"SELECT id, SUM(k) OVER (ORDER BY k RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) s FROM {base} ORDER BY id",
        f"SELECT id, SUM(k) OVER (ORDER BY k DESC RANGE BETWEEN 10 PRECEDING AND CURRENT ROW) s FROM {base} ORDER BY id",
        "SELECT id, SUM(x) OVER (ORDER BY ts RANGE BETWEEN INTERVAL 1 DAY PRECEDING AND CURRENT ROW) s"
        " FROM (VALUES (1, TIMESTAMP '2024-01-01 00:00:00', 1), (2, TIMESTAMP '2024-01-02 00:00:00', 2),"
        " (3, TIMESTAMP '2024-01-03 12:00:00', 4)) AS t(id, ts, x) ORDER BY id",
        "SELECT id, NTILE(3) OVER (ORDER BY id) n FROM (VALUES (1),(2),(3),(4),(5),(6),(7)) AS t(id) ORDER BY id",
        "SELECT id, NTILE(5) OVER (ORDER BY id) n FROM (VALUES (1),(2),(3)) AS t(id) ORDER BY id",
        f"SELECT id, PERCENT_RANK() OVER (ORDER BY k) p, CUME_DIST() OVER (ORDER BY k) c FROM {base} ORDER BY id",
        "SELECT PERCENT_RANK() OVER (ORDER BY id) p FROM (VALUES (1)) AS t(id)",
        f"SELECT id, LAG(v, 1, -1) OVER (ORDER BY id) l FROM {basev} ORDER BY id",
        f"SELECT id, LEAD(v, -1) OVER (ORDER BY id) l FROM {basev} ORDER BY id",
        f"SELECT id, NTH_VALUE(v, 2) OVER (ORDER BY id) f FROM {basev} ORDER BY id",
    ]
    for q in checks:
        s = [tuple(r) for r in spark.sql(q).collect()]
        d = con.execute(q).fetchall()
        assert s == d, f"clean-core drift on: {q}\n spark={s}\n duck={d}"


def test_window_order_key_exposure_swept(spark):
    """Exposure sweep for split class 1 over the shipping window queries
    (q30-q35, q101-q114 event families, q108/q120/q140): a plain-ASC
    window ORDER BY is only safe when its key is non-NULL. Audit result,
    asserted against the data:

    * every event-time ordering already spells F.asc_nulls_last (ts,
      event_id, day, valid_from) — matching DuckDB's default, written
      back in the rounds that built them;
    * the remaining plain-ASC keys are TPC-H keys/attributes
      (p_partkey, c_custkey, o_orderkey, l_orderkey, path/n aggregates)
      — aggregates are non-NULL by construction; the raw columns are
      asserted NULL-free here at sf0.01 so a future data regeneration
      that introduces NULLs trips this sweep instead of silently
      flipping rank order between the twins."""
    from nsq2kinesis_spark.tables import table as t

    sf = "/root/testdata/sf0.01"
    for tbl, cols in (
        ("part", ["p_partkey", "p_retailprice", "p_brand"]),
        ("customer", ["c_custkey", "c_acctbal", "c_nationkey"]),
        ("orders", ["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice", "o_orderpriority"]),
        ("lineitem", ["l_orderkey", "l_suppkey"]),
        ("events", ["event_id", "ts", "user_id", "event_type"]),
    ):
        df = t(spark, sf, tbl)
        nulls = df.select(
            [F.count(F.when(F.col(c).isNull(), 1)).alias(c) for c in cols]
        ).first()
        assert all(v == 0 for v in nulls), f"{tbl} has NULL order keys: {nulls}"


# -- round 14 probe wave 2: multi-row aggregate ordering + grouping-set
# personalities (beyond the ordered window wave — q11-q15/q111 neighbors) --


def test_agg_ordering_grammar_personality_pinned(spark):
    """Round-14 wave-2 probe, SPLIT: ordered string/array aggregation has
    NO spelling both engines parse — Spark (4.x) accepts ONLY the
    ordered-set form `STRING_AGG(x, sep) WITHIN GROUP (ORDER BY k)` (and
    LISTAGG alias) and REJECTS DuckDB's inline `STRING_AGG(x, sep ORDER
    BY k)`; DuckDB is the exact inverse (inline accepted, WITHIN GROUP
    'Unknown ordered aggregate'). ARRAY_AGG: same inversion. BANNED as a
    shared spelling; oracles (DuckDB-side SQL) keep inline ORDER BY,
    Spark-side plans express ordering via sort_array/window ordering —
    which every shipping query already does (q14 sort_array struct pack,
    q111 per-pos window), so exposure is zero by construction.

    Second SPLIT pinned: bare ARRAY_AGG NULL retention — Spark's
    array_agg/collect_list DROPS NULL elements, DuckDB KEEPS them
    (['c', NULL]); the shipping rule (TWIN_CONTRACTS §2b) of NULL-free
    array construction stands."""
    import duckdb as _duck

    import pytest as _pytest

    con = _duck.connect()
    base = "(VALUES (1,'a',10),(1,'b',20),(2,'c',5),(2,NULL,7)) AS t(g,s,v)"
    wg = (f"SELECT g, STRING_AGG(s, ',') WITHIN GROUP (ORDER BY v DESC) x "
          f"FROM {base} GROUP BY g")
    assert sorted((r.g, r.x) for r in spark.sql(wg).collect()) == [
        (1, "b,a"), (2, "c")
    ]
    with _pytest.raises(Exception, match="ordered aggregate"):
        con.execute(wg)
    inline = f"SELECT g, STRING_AGG(s, ',' ORDER BY v DESC) x FROM {base} GROUP BY g"
    assert sorted(con.execute(inline).fetchall()) == [(1, "b,a"), (2, "c")]
    with _pytest.raises(Exception, match="PARSE_SYNTAX_ERROR"):
        spark.sql(inline).collect()
    # ARRAY_AGG inversion + NULL retention split
    bare = f"SELECT g, ARRAY_AGG(s) x FROM {base} GROUP BY g"
    srows = {r.g: r.x for r in spark.sql(bare).collect()}
    drows = dict(con.execute(bare).fetchall())
    assert srows[2] == ["c"]          # Spark drops the NULL element
    assert drows[2] == ["c", None]    # DuckDB keeps it
    assert srows[1] == drows[1] == ["a", "b"]


def test_grouping_sets_clean_core_pinned(spark):
    """Round-14 wave-2 probe — the q11/q12/q13 neighborhood is CLEAN and
    hereby pinned:

    * ROLLUP/CUBE/GROUPING SETS over keys containing REAL NULLs:
      disambiguation via GROUPING() is identical (a data NULL keeps
      GROUPING()=0, a subtotal NULL gets 1) — the classic trap twinned
      correctly on both engines;
    * GROUPING_ID(a, b) exists on BOTH with identical bit order (a is
      the high bit), as does the explicit GROUPING(a)*2+GROUPING(b)
      composition — either is a safe twin for Spark's 1-arg-only
      GROUPING() (multi-arg GROUPING(a,b) is DuckDB-only: the one split
      here, with two clean twins);
    * bool_and/bool_or skip NULLs identically; COUNT(DISTINCT) of
      NULL-only input is 0 on both; SUM(DISTINCT) agrees; MEDIAN
      even-count interpolation, MODE, sample-default STDDEV/VARIANCE,
      COVAR_SAMP/CORR, and MIN/MAX over strings-with-NULLs all agree."""
    import duckdb as _duck

    con = _duck.connect()

    def norm(rows):
        return sorted(tuple(str(x) for x in r) for r in rows)

    rb = "(VALUES ('x',NULL,1),('x','b',2),(NULL,'b',4)) AS t(a, b, v)"
    checks = [
        f"SELECT a, b, GROUPING(a) ga, GROUPING(b) gb, SUM(v) s FROM {rb} "
        "GROUP BY ROLLUP(a, b)",
        f"SELECT a, GROUPING(a) ga, SUM(v) s FROM {rb} GROUP BY CUBE(a)",
        f"SELECT a, b, SUM(v) s FROM {rb} GROUP BY GROUPING SETS ((a), (b), ())",
        f"SELECT a, b, GROUPING_ID(a, b) gid, SUM(v) s FROM {rb} GROUP BY ROLLUP(a, b)",
        f"SELECT a, b, GROUPING(a)*2+GROUPING(b) gid, SUM(v) s FROM {rb} GROUP BY ROLLUP(a, b)",
        "SELECT BOOL_AND(x) a, BOOL_OR(x) o FROM (VALUES (true),(false),(NULL)) AS t(x)",
        "SELECT COUNT(DISTINCT x) c FROM (VALUES (NULL),(NULL)) AS t(x)",
        "SELECT SUM(DISTINCT x) s FROM (VALUES (1),(1),(2)) AS t(x)",
        "SELECT MEDIAN(x) m FROM (VALUES (1),(2),(3),(4)) AS t(x)",
        "SELECT MODE(x) m FROM (VALUES (1),(2),(2),(3)) AS t(x)",
        "SELECT ROUND(STDDEV(x),6) sd, ROUND(VARIANCE(x),6) v "
        "FROM (VALUES (1.0),(2.0),(4.0)) AS t(x)",
        "SELECT ROUND(COVAR_SAMP(x,y),6) c, ROUND(CORR(x,y),6) r "
        "FROM (VALUES (1.0,2.0),(2.0,4.0),(3.0,5.0)) AS t(x,y)",
        "SELECT MIN(x) mn, MAX(x) mx FROM (VALUES ('b'),(NULL),('a')) AS t(x)",
    ]
    for q in checks:
        s = norm(spark.sql(q).collect())
        d = norm(con.execute(q).fetchall())
        assert s == d, f"clean-core drift on: {q}\n spark={s}\n duck={d}"
    # the one split: multi-arg GROUPING() is DuckDB-only
    import pytest as _pytest

    multi = f"SELECT GROUPING(a, b) g FROM {rb} GROUP BY ROLLUP(a, b)"
    con.execute(multi)
    with _pytest.raises(Exception, match="WRONG_NUM_ARGS"):
        spark.sql(multi).collect()


def test_string_formatting_personality_pinned(spark):
    """Round-14 probe wave 3 — string formatting/slicing personalities.

    SPLITS (each asserted in its observed direction):
      * PRINTF arg typing: Spark's printf REJECTS a DECIMAL for %f
        (loud 'f != Decimal' runtime error) where DuckDB coerces —
        declared spelling: CAST printf args explicitly (DOUBLE for %f,
        BIGINT for %d), under which both agree byte-for-byte;
      * SUBSTRING with start 0 SILENTLY SPLITS: Spark treats 0 like 1
        (3 chars for len 3), DuckDB consumes one count reaching position
        1 (2 chars) — 1-based positive starts only in twinned SQL
        (every shipping SUBSTR is; negative starts agree and stay legal);
      * LEFT/RIGHT with negative n SILENTLY SPLITS: Spark returns '',
        DuckDB returns all-but-|n|-from-the-other-end — non-negative
        args only;
      * engine-only functions, never twinned: FORMAT('{}') is
        DuckDB-only; FORMAT_NUMBER / INITCAP / OVERLAY are Spark-only;
        TO_CHAR numeric masks are Spark-only (and hash-fill '####.##'
        on mask overflow — loud-ish, but nothing to twin against).

    CLEAN core pinned below: LPAD/RPAD multichar pads + truncation +
    negative length, REPEAT 0/negative, SPLIT_PART negative index,
    TRANSLATE with a shorter to-set, SUBSTRING 1-based/negative-start/
    no-length, and printf under the explicit-cast spelling."""
    import duckdb as _duck

    import pytest as _pytest

    con = _duck.connect()
    # printf typing split
    dec = "SELECT PRINTF('%05.2f', 3.14159) v"
    assert con.execute(dec).fetchone()[0] == "03.14"
    with _pytest.raises(Exception, match="Decimal"):
        spark.sql(dec).collect()
    # substring start-0 silent split
    z = "SELECT SUBSTRING('hello', 0, 3) v"
    assert spark.sql(z).first()[0] == "hel"
    assert con.execute(z).fetchone()[0] == "he"
    # left/right negative silent split
    neg = "SELECT LEFT('hello', -2) v, RIGHT('hello', -2) w"
    assert tuple(spark.sql(neg).first()) == ("", "")
    assert con.execute(neg).fetchone() == ("hel", "llo")
    # engine-only functions fail loudly on the other engine
    with _pytest.raises(Exception, match="UNRESOLVED_ROUTINE"):
        spark.sql("SELECT FORMAT('{}', 1)").collect()
    assert con.execute("SELECT FORMAT('{}|{}', 1, 'a')").fetchone()[0] == "1|a"
    for duck_missing in (
        "SELECT FORMAT_NUMBER(1234567.891, 2)",
        "SELECT INITCAP('ab cd')",
        "SELECT OVERLAY('hello' PLACING 'XX' FROM 2)",
        "SELECT TO_CHAR(1234.567, '9999.99')",
    ):
        spark.sql(duck_missing).collect()
        with _pytest.raises(Exception, match="does not exist"):
            con.execute(duck_missing)
    # clean core under the declared spellings
    checks = [
        "SELECT PRINTF('%05.2f|%d|%s', CAST(3.14159 AS DOUBLE), CAST(42 AS BIGINT), 'x') v",
        "SELECT LPAD('ab', 5, 'xy') v, RPAD('ab', 5, 'xy') w",
        "SELECT LPAD('abcdef', 3, 'x') v, LPAD('ab', -1, 'x') w",
        "SELECT REPEAT('ab', 3) v, REPEAT('ab', 0) w, REPEAT('ab', -1) z",
        "SELECT SPLIT_PART('a,b,c', ',', -1) v",
        "SELECT TRANSLATE('abcba', 'ab', 'x') v",
        "SELECT SUBSTRING('hello', 2, 3) v, SUBSTRING('hello', -3, 2) w, SUBSTRING('hello', 3) z",
        "SELECT LEFT('hello', 2) v, RIGHT('hello', 2) w, LEFT('hello', 0) z",
    ]
    for q in checks:
        s = [tuple(r) for r in spark.sql(q).collect()]
        d = con.execute(q).fetchall()
        assert s == d, f"clean-core drift on: {q}\n spark={s}\n duck={d}"


def test_array_construction_personalities_pinned(spark):
    """Round-14 probe wave 5 — array construction / set-op personalities.

    The array_join(array_sort(array_distinct(split(...)))) idiom and the
    size(array_intersect(...)) Jaccard core carry a dozen oracled
    queries; this wave probes the family's NULL/order/grammar edges.

    SPLITS (each asserted in its observed direction):
      * DISTINCT: Spark array_distinct keeps FIRST-OCCURRENCE order and
        keeps one NULL; DuckDB LIST_DISTINCT DROPS NULLs and its order
        is unspecified (observed sorted). Corollary: size(array_distinct)
        vs LEN(LIST_DISTINCT) disagree BY COUNT on NULL-bearing arrays —
        and DuckDB's LIST_UNIQUE is a COUNT (NULL-excluded), not a list,
        a spelling trap beside the list-returning Spark name. Declared
        discipline: distinct is twinned only over provably NULL-free
        elements (all shipping sites are split()/json_keys outputs) and
        only order-neutralized (under size()/LEN() or inside a sort).
      * INTERSECT: Spark array_intersect keeps the NULL when both sides
        hold one and preserves first-array order; DuckDB LIST_INTERSECT
        drops NULLs and reorders. Same discipline: NULL-free elements,
        order-neutralized (shipping sites are size(...) Jaccard cores
        over xxhash64 shingle sets — NULL-free by construction).
      * OVERLAP is 3VL vs 2VL: arrays_overlap returns NULL when there is
        no positive match and either side holds a NULL; LIST_HAS_ANY
        returns FALSE there — a silent filter-cardinality split. NULL-free
        inputs agree (asserted); only those may twin.
      * CONCAT function vs operator (the string CONCAT story, again):
        Spark concat(NULL, arr) → NULL but DuckDB LIST_CONCAT treats NULL
        as empty → arr; the || operator null-propagates IDENTICALLY on
        both. Declared spelling: || across twins, never the function name
        with possibly-NULL array args.
      * FLATTEN: a NULL inner array nulls the whole result on Spark but
        is silently dropped by DuckDB. NULL-free inners agree (asserted);
        the one shipping flatten (pair enumeration, llm_dedup.py:181)
        rides transform() output — never NULL.
      * SLICE third-arg grammar: Spark slice(arr, start, LENGTH) vs
        DuckDB list_slice / bracket-slice (arr, start, END-INDEX-
        INCLUSIVE). The same literal third argument silently returns
        different windows; every shipping twin spells the DuckDB side as
        an inclusive end-index bracket slice with end = start + len - 1
        (the chunk oracles' words[i*S+1 : i*S+C] against Spark
        slice(words, i*S+1, C) — llm_dedup.py:182,884,998;
        llm_text.py:876,825 — re-swept at pin time, all green under
        value-hash parity).
      * Engine-only names stay loud: array_union / array_except /
        array_compact / array_remove have NO DuckDB spelling (Catalog
        error, never a silent drift) — the NULL-semantics differences
        probed above therefore can't leak through those four names.

    CLEAN core pinned: array_position (found index / not-found 0 / NULL
    needle → NULL / position after a NULL prefix), element_at(arr,-1) ==
    DuckDB arr[-1] from-end indexing (bracket indexing itself stays
    banned per the OOB pin), NULL-free has_any/overlap, NULL-free ||,
    NULL-free flatten."""
    import duckdb as _duck

    import pytest as _pytest

    con = _duck.connect()
    # distinct: order + NULL personality
    sd = spark.sql("SELECT array_distinct(array('b','a','b',NULL,'a',NULL))").first()[0]
    assert sd == ["b", "a", None], "Spark array_distinct order/NULL changed — re-probe"
    dd = con.execute("SELECT LIST_DISTINCT(['b','a','b',NULL,'a',NULL])").fetchone()[0]
    assert sorted(dd) == ["a", "b"], "DuckDB LIST_DISTINCT stopped dropping NULLs"
    assert con.execute("SELECT LIST_UNIQUE(['b','a','b',NULL,'a',NULL])").fetchone()[0] == 2
    assert spark.sql("SELECT size(array_distinct(array('b','a',NULL)))").first()[0] == 3
    # intersect: NULL membership + order
    si = spark.sql(
        "SELECT array_intersect(array('x','b',NULL,'a'), array('a','b',NULL))"
    ).first()[0]
    assert si == ["b", None, "a"], "Spark array_intersect order/NULL changed"
    di = con.execute("SELECT LIST_INTERSECT(['x','b',NULL,'a'], ['a','b',NULL])").fetchone()[0]
    assert sorted(di) == ["a", "b"]
    # overlap 3VL vs 2VL
    assert spark.sql("SELECT arrays_overlap(array('a',NULL), array('b'))").first()[0] is None
    assert con.execute("SELECT LIST_HAS_ANY(['a',NULL], ['b'])").fetchone()[0] is False
    # concat function-vs-operator
    assert spark.sql(
        "SELECT concat(CAST(NULL AS array<string>), array('b'))"
    ).first()[0] is None
    assert con.execute("SELECT LIST_CONCAT(NULL, ['b'])").fetchone()[0] == ["b"]
    assert spark.sql("SELECT CAST(NULL AS array<string>) || array('b')").first()[0] is None
    assert con.execute("SELECT NULL || ['b']").fetchone()[0] is None
    # flatten NULL-inner
    assert spark.sql("SELECT flatten(array(array('a'), NULL, array('b')))").first()[0] is None
    assert con.execute("SELECT FLATTEN([['a'], NULL, ['b']])").fetchone()[0] == ["a", "b"]
    # slice grammar: same third literal, different window
    assert list(spark.sql("SELECT slice(array('a','b','c','d'), 2, 3)").first()[0]) == [
        "b", "c", "d"]
    assert con.execute("SELECT LIST_SLICE(['a','b','c','d'], 2, 3)").fetchone()[0] == ["b", "c"]
    # engine-only names are loud on DuckDB
    for spark_only in (
        "SELECT array_union(['a','b'], ['b','c'])",
        "SELECT array_except(['a','b'], ['b'])",
        "SELECT array_compact(['a', NULL, 'b'])",
        "SELECT array_remove(['a','b'], 'a')",
    ):
        with _pytest.raises(Exception, match="does not exist"):
            con.execute(spark_only)
    # clean core under the declared spellings
    pos = "SELECT array_position(array('a','b'),'b') v, array_position(array('a','b'),'z') w"
    assert tuple(spark.sql(pos).first()) == (2, 0)
    dpos = con.execute(
        "SELECT LIST_POSITION(['a','b'],'b') v, LIST_POSITION(['a','b'],'z') w"
    ).fetchone()
    assert tuple(dpos) == (2, 0)
    assert spark.sql("SELECT array_position(array('a',NULL), NULL)").first()[0] is None
    assert con.execute("SELECT LIST_POSITION(['a',NULL], NULL)").fetchone()[0] is None
    assert spark.sql("SELECT array_position(array(NULL,'a'), 'a')").first()[0] == 2
    assert con.execute("SELECT LIST_POSITION([NULL,'a'], 'a')").fetchone()[0] == 2
    assert spark.sql("SELECT element_at(array('a','b','c'), -1)").first()[0] == "c"
    assert con.execute("SELECT (['a','b','c'])[-1]").fetchone()[0] == "c"
    assert spark.sql("SELECT arrays_overlap(array('a','b'), array('b'))").first()[0] is True
    assert con.execute("SELECT LIST_HAS_ANY(['a','b'], ['b'])").fetchone()[0] is True
    assert list(spark.sql("SELECT array('a') || array('b','a')").first()[0]) == ["a", "b", "a"]
    assert con.execute("SELECT ['a'] || ['b','a']").fetchone()[0] == ["a", "b", "a"]
    assert list(spark.sql("SELECT flatten(array(array('a'), array('b')))").first()[0]) == [
        "a", "b"]
    assert con.execute("SELECT FLATTEN([['a'], ['b']])").fetchone()[0] == ["a", "b"]
