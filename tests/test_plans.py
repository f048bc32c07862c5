"""Plan-shape regression tests: the properties that decide 100 TB behavior.

These assert on the *physical plan*, not results — a query can stay correct
while silently regressing from broadcast to shuffle join or from a pruned
scan to a full-width scan; these tests catch that (SURVEY.md §4.1: all
optimization is delegated to Catalyst, so we verify Catalyst actually gets
the opportunities we designed for)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from nsq2kinesis_spark.plans.explain import (
    has_broadcast_join,
    has_whole_stage_codegen,
    n_shuffles,
    physical_plan,
    pushed_filters,
    scan_columns,
)
from nsq2kinesis_spark.registry import all_queries

from .conftest import SF_CORRECTNESS, SF_SMOKE

QUERIES = all_queries()


def build(name):
    return QUERIES[name].builder


from contextlib import contextmanager


@contextmanager
def _conf_override(spark, confs):
    """Temporarily set session confs; restore (or unset) on exit so no
    test leaks conf state into the shared session."""
    saved = {}
    for k, v in confs.items():
        saved[k] = spark.conf.get(k, None)
        spark.conf.set(k, v)
    try:
        yield
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)



def test_q01_filter_pushed_to_scan(spark):
    df = build("q01_pricing_summary")(spark, SF_CORRECTNESS)
    assert any("l_shipdate" in f for f in pushed_filters(df)), pushed_filters(df)


def test_q01_column_pruning(spark):
    df = build("q01_pricing_summary")(spark, SF_CORRECTNESS)
    cols = scan_columns(df)
    # only the 7 referenced columns reach the reader — not all 11
    assert "l_orderkey" not in cols and "l_partkey" not in cols, cols
    assert {"l_quantity", "l_extendedprice", "l_discount", "l_tax", "l_shipdate"} <= cols


def test_q01_single_shuffle(spark):
    # partial agg → one exchange on the group key → final agg
    df = build("q01_pricing_summary")(spark, SF_CORRECTNESS)
    assert n_shuffles(df) == 1, physical_plan(df)


def test_q02_projection_no_shuffle(spark):
    df = build("q02_project_compute")(spark, SF_CORRECTNESS)
    assert n_shuffles(df) == 0


def test_q03_predicates_pushed(spark):
    df = build("q03_filter_battery")(spark, SF_CORRECTNESS)
    pushed = " ".join(pushed_filters(df))
    assert "o_totalprice" in pushed and "o_orderstatus" in pushed, pushed


def test_q04_topn_no_global_sort(spark):
    # ORDER BY + LIMIT must plan as TakeOrderedAndProject, not a range
    # exchange + full sort
    df = build("q04_sort_limit")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "Exchange rangepartitioning" not in plan


def test_q20_dimension_joins_broadcast(spark):
    df = build("q20_join_inner_broadcast")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert plan.count("BroadcastHashJoin") == 2, plan
    # the fact table never shuffles for the joins — only the final agg
    assert n_shuffles(df) <= 1, plan


def test_q25_semi_join_planned_as_semi(spark):
    df = build("q25_join_semi")(spark, SF_CORRECTNESS)
    assert "LeftSemi" in physical_plan(df)


def test_q26_anti_join_planned_as_anti(spark):
    df = build("q26_join_anti")(spark, SF_CORRECTNESS)
    assert "LeftAnti" in physical_plan(df)


def test_q27_theta_join_is_hash_not_nested_loop(spark):
    # equi component must carry the join; range residual stays a filter
    df = build("q27_join_theta")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "NestedLoop" not in plan.replace("BroadcastNestedLoop", "") or "HashJoin" in plan, plan
    assert "Join" in plan


def test_q33_window_group_limit_pushdown(spark):
    # rank<=k filter should activate WindowGroupLimit (Spark 3.5+) so each
    # partition keeps only top-k rows before the window sort. (q30 mixes in
    # ntile over a different ordering, which legitimately blocks the rule —
    # q33 is the pure top-k idiom.)
    df = build("q33_topk_per_group")(spark, SF_CORRECTNESS)
    assert "WindowGroupLimit" in physical_plan(df)


def test_q60_dedup_single_shuffle(spark):
    df = build("q60_dedup_exact")(spark, SF_CORRECTNESS)
    assert n_shuffles(df) == 1, physical_plan(df)


def test_q80_query_side_broadcast(spark):
    df = build("q80_cosine_topk")(spark, SF_CORRECTNESS)
    assert has_broadcast_join(df)


def test_q81_blocks_on_cell_never_cross_joins(spark):
    """q81's pair generation must be an equi hash join on the IVF cell id
    (bounded blocks by construction) — never a cross/nested-loop product
    over the corpus, and the centroid side of the assignment broadcasts."""
    df = build("q81_cosine_neardup")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    # the only nested-loop allowed is the broadcast of the tiny centroid set
    assert has_broadcast_join(df), plan
    assert plan.count("HashJoin") >= 1 or "SortMergeJoin" in plan, plan
    # argmax assignment is an aggregate (max_by), not a corpus-wide window
    assert "Window" not in plan, plan


def test_q83_benchmark_grams_broadcast(spark):
    """Decontamination joins the corpus scan against BROADCAST benchmark
    grams — the corpus side must never shuffle for the join (only the
    final per-doc count aggregates)."""
    df = build("q83_decontamination")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert has_broadcast_join(df, plan), plan
    assert "CartesianProduct" not in plan, plan
    # now that n_shuffles counts RoundRobin exchanges too: the local
    # parallelism repartition gate appears once per consuming branch
    # (bench grams + corpus grams), plus the bench distinct and the
    # per-doc count aggregate; the JOIN itself stays broadcast (above)
    assert n_shuffles(df, plan) <= 4, plan


def test_q84_sample_is_scan_plus_filter(spark):
    """Stratified sampling is a pure narrow projection + filter: no
    shuffle, no join, inside whole-stage codegen."""
    df = build("q84_stratified_sample")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert n_shuffles(df) == 0, plan
    assert "Join" not in plan, plan
    assert has_whole_stage_codegen(df), plan


def test_q85_q87_q88_are_narrow_scans(spark):
    """Split assignment, repetition metrics, and the quality gate are pure
    per-row functions of the scan — any shuffle or Python stage appearing
    here is a scale regression."""
    for name in ("q85_train_split", "q87_repetition", "q88_quality_gate"):
        df = build(name)(spark, SF_CORRECTNESS)
        plan = physical_plan(df)
        assert n_shuffles(df) == 0, (name, plan)
        assert "Join" not in plan, (name, plan)
        assert has_whole_stage_codegen(df), (name, plan)


def test_q86_packing_single_bounded_window_shuffle(spark):
    """Sequence packing shuffles exactly once — the (source, shard) window
    — and must never degenerate to a global sort (a single-partition
    window over the corpus)."""
    df = build("q86_sequence_packing")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert n_shuffles(df) == 1, plan
    assert "hashpartitioning(source" in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_q86_shard_count_tracks_corpus_size(spark):
    """The packing shard count is data-derived (ceil(n_docs / target)), so
    window-partition size stays O(target) docs at any corpus size instead
    of growing linearly with a fixed shard constant. 500 docs at sf0.01 →
    4 shards; the explicit ``shards`` override changes the layout."""
    from nsq2kinesis_spark.operators.llm_pipeline import (
        PACK_TARGET_DOCS_PER_SHARD,
        pack_shard_count,
        q86_sequence_packing,
    )

    assert pack_shard_count(500) == 4
    assert pack_shard_count(5_000) == 40
    assert pack_shard_count(5_000_000) == 40_000  # 100× corpus → 100× shards
    assert pack_shard_count(1) == 1
    df = build("q86_sequence_packing")(spark, SF_CORRECTNESS)
    n_shards = df.select("shard").distinct().count()
    assert n_shards == pack_shard_count(500)
    # every shard's doc count is bounded by the target (doc_id is dense
    # here, so modulo spreads evenly; the bound is the design claim)
    from pyspark.sql import functions as F

    per_shard = df.groupBy("source", "shard").agg(F.count("*").alias("n"))
    assert per_shard.agg(F.max("n")).collect()[0][0] <= PACK_TARGET_DOCS_PER_SHARD
    # explicit override rules the layout
    assert (
        q86_sequence_packing(spark, SF_CORRECTNESS, shards=2)
        .select("shard")
        .distinct()
        .count()
        == 2
    )


def test_q90_kmeans_iterations_broadcast_no_window(spark):
    """k-means training: every iteration broadcasts the (tiny) centroid set
    into the corpus scan and reduces the argmax via max_by aggregation —
    never a window over the (vector × centroid) cross product, never a
    shuffled join of the corpus against centroids."""
    df = build("q90_kmeans_train")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "Window" not in plan, plan
    n_bcast = plan.count("BroadcastNestedLoopJoin") + plan.count("BroadcastHashJoin")
    assert n_bcast >= 2, plan  # one broadcast assignment per iteration
    assert "SortMergeJoin" not in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_codegen_everywhere(spark):
    # scalar batteries must stay inside whole-stage codegen (no Python)
    for name in ("q40_string_battery", "q42_math_battery", "q45_array_battery"):
        df = build(name)(spark, SF_CORRECTNESS)
        assert has_whole_stage_codegen(df), name
        assert "BatchEvalPython" not in physical_plan(df), name
        assert "ArrowEvalPython" not in physical_plan(df), name


def test_no_query_uses_row_python_udf(spark):
    """No registered query may fall back to row-at-a-time Python UDFs —
    the engine-wide 'stay JVM-side' invariant. Queries tagged 'python_udf'
    are exempt: they demo that API surface deliberately (q53's docstring
    marks it the slow path). 'udtf' is exempt too — a Python UDTF's eval
    node prints as BatchEvalPythonUDTF but runs Arrow-batched."""
    for name, q in QUERIES.items():
        if "python_udf" in q.tags or "udtf" in q.tags:
            continue
        plan = physical_plan(q.builder(spark, SF_CORRECTNESS))
        assert "BatchEvalPython" not in plan, f"{name} uses a Python UDF"


def test_bucketed_join_avoids_shuffle(spark, tmp_path):
    """Bucketing both fact tables on the join key makes the join
    exchange-free (co-located partitions) — the 100 TB pattern for repeated
    fact-fact joins: pay the shuffle once at write time, never per query.
    Broadcast is disabled so the assertion really proves bucket co-location
    (a broadcast join would also be exchange-free)."""
    from nsq2kinesis_spark.tables import table

    li = table(spark, "/root/testdata/sf0.001", "lineitem").select(
        "l_orderkey", "l_quantity"
    )
    o = table(spark, "/root/testdata/sf0.001", "orders").select(
        "o_orderkey", "o_orderdate"
    )
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").option(
        "path", str(tmp_path / "li_b")
    ).mode("overwrite").saveAsTable("li_bucketed")
    o.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").option(
        "path", str(tmp_path / "o_b")
    ).mode("overwrite").saveAsTable("o_bucketed")
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = (
            spark.table("li_bucketed")
            .join(
                spark.table("o_bucketed"),
                F.col("l_orderkey") == F.col("o_orderkey"),
            )
            .groupBy("o_orderdate")
            .agg(F.sum("l_quantity").alias("qty"))
        )
        plan = physical_plan(j)
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
        # join itself is exchange-free; only the final groupBy may shuffle
        assert n_shuffles(j) <= 1, plan
        assert j.count() > 0
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS li_bucketed")
        spark.sql("DROP TABLE IF EXISTS o_bucketed")


def test_partitioned_write_prunes_partitions(spark, tmp_path):
    """Hive-style partitioned layout (write.partitionBy) + a partition-key
    filter: the scan must prune to one directory — at 100 TB this is the
    difference between reading one date partition and the whole lake.
    PushedFilters don't apply (the key isn't in the files); pruning shows
    as a partition-filter count in the scan node."""
    from nsq2kinesis_spark.tables import table

    ev = table(spark, "/root/testdata/sf0.001", "events")
    out = tmp_path / "events_by_type"
    ev.write.partitionBy("event_type").parquet(str(out))
    df = (
        spark.read.parquet(str(out))
        .filter(F.col("event_type") == "purchase")
        .select("event_id", "value")
    )
    plan = physical_plan(df)
    # the scan enumerates exactly one of the five event_type partitions
    import re as _re

    m = _re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "event_type" in m.group(1), plan
    assert df.count() == ev.filter(F.col("event_type") == "purchase").count()


def test_q97_corpus_build_plan_shape(spark):
    """The five-stage corpus build keeps each stage's scale shape when
    composed: the decontamination gram join stays broadcast, nothing
    degenerates to a cartesian/nested-loop product, and the only windows
    are the fingerprint-canonical and bounded packing ones."""
    df = build("q97_corpus_build")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert has_broadcast_join(df, plan), plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("Window [") == 2, plan  # fingerprint rn + packing cumsum
    # the rn=1 canonical filter activates WindowGroupLimit pushdown: each
    # task keeps one row per fingerprint BEFORE the window sort
    assert "WindowGroupLimit" in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_q94_range_join_is_hash_not_nested_loop(spark):
    """The bin-blocked range join must execute as an equi hash join on
    (user_id, bin) with the time range as a residual predicate — a plain
    theta formulation degrades to a nested-loop join (the quadratic trap
    this operator exists to avoid)."""
    df = build("q94_range_join_binned")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "NestedLoop" not in plan, plan
    assert "Cartesian" not in plan, plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan




def _file_column_bounds(path, columns):
    """Per-file footer [min, max] of the given columns: the statistics a
    parquet reader's file-skipping consults. Returns {file: {col: (lo, hi)}}
    (files/columns without statistics omitted)."""
    import pyarrow.parquet as pq

    out = {}
    for f in sorted(path.glob("*.parquet")):
        bounds = {}
        meta = pq.ParquetFile(str(f)).metadata
        for rg in range(meta.num_row_groups):
            row_group = meta.row_group(rg)
            for ci in range(row_group.num_columns):
                col = row_group.column(ci)
                name = col.path_in_schema
                if col.statistics is None or name not in columns:
                    continue
                lo, hi = bounds.get(name, (col.statistics.min, col.statistics.max))
                bounds[name] = (
                    min(lo, col.statistics.min),
                    max(hi, col.statistics.max),
                )
        if bounds:
            out[f] = bounds
    return out


def test_q95_zorder_write_prunes_both_dimensions(spark, tmp_path):
    """The layout payoff of the z-key: after a z-ordered write, a point
    filter on EITHER dimension skips a substantial share of files (each
    file's parquet min/max covers a bounded slice of BOTH dimensions). A
    single-dimension sort prunes only its own column — every file spans
    the full range of the other. Metric: expected fraction of files whose
    [min, max] contains a uniform random point, per dimension — exactly
    what footer-based file skipping evaluates."""
    df = build("q95_zorder_key")(spark, "/root/testdata/sf0.001")
    full = 256.0  # normalized dimension width (2^Z_BITS)

    def write_and_measure(sorted_df, path):
        sorted_df.write.parquet(str(path))
        widths = {"dim_user": [], "dim_day": []}
        for bounds in _file_column_bounds(path, set(widths)).values():
            for name, (lo, hi) in bounds.items():
                widths[name].append(hi - lo + 1)
        return {
            name: sum(ws) / (full * len(ws)) for name, ws in widths.items() if ws
        }

    z = write_and_measure(
        df.repartitionByRange(8, "zkey").sortWithinPartitions("zkey"),
        tmp_path / "zorder",
    )
    by_day = write_and_measure(
        df.repartitionByRange(8, "dim_day").sortWithinPartitions("dim_day"),
        tmp_path / "bytime",
    )
    # single-dimension layout: cannot prune the OTHER dimension at all
    assert by_day["dim_user"] > 0.9, by_day
    # z-layout: a point filter on EITHER dimension skips a real share of
    # files — bounded scan fraction on both axes is the whole point
    assert z["dim_user"] < 0.75, z
    assert z["dim_day"] < 0.75, z


def test_q99_source_cap_window_group_limit(spark):
    # the domain-cap rank filter must activate WindowGroupLimit so each
    # partition keeps only its per-source top-K before the window sort —
    # the property that makes the cap O(sources * cap) data movement
    df = build("q99_source_cap")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "WindowGroupLimit" in plan, plan


def test_q100_tfidf_window_group_limit(spark):
    df = build("q100_tfidf_topterms")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "WindowGroupLimit" in plan, plan


def test_q98_srp_candidates_join_is_hash_not_nested_loop(spark):
    # the band self-join must execute as an equi join on
    # (band_idx, band_val) — if the conjuncts ever degrade to a
    # nested-loop/cartesian comparison the LSH loses its entire point
    df = build("q98_srp_lsh_pairs")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_dynamic_partition_pruning_on_partitioned_layout(spark, tmp_path):
    """Joining a hive-partitioned fact on its partition column against a
    selectively-filtered dim must inject a DynamicPruningSubquery into the
    fact scan — at 100 TB this is the difference between scanning every
    partition and scanning only the partitions the dim's survivors name.
    (Static pruning can't do this: the surviving keys are only known at
    runtime, after the dim's filter executes.)"""
    ev = spark.read.parquet(f"{SF_CORRECTNESS}/events.parquet")
    out = str(tmp_path / "ev_parted")
    ev.write.partitionBy("event_type").parquet(out)
    types = [r.event_type for r in ev.select("event_type").distinct().collect()]
    dim = spark.createDataFrame(
        [(t, float(i)) for i, t in enumerate(sorted(types))],
        "event_type string, w double",
    )
    big = spark.read.parquet(out)
    j = big.join(dim.filter(F.col("w") < 2.0), "event_type").agg(
        F.sum(F.col("value") * F.col("w")).alias("s")
    )
    assert "dynamicpruning" in physical_plan(j).lower(), physical_plan(j)


def test_runtime_bloom_filter_prunes_shuffle_join_probe(spark):
    """With broadcast off (the 100 TB fact-to-fact regime), a selective
    filter on one join side should inject a runtime bloom filter into the
    other side's scan (BloomFilterMightContain) — rows that cannot match
    are dropped BEFORE the shuffle, which is where fact-to-fact join cost
    lives at scale. Thresholds are lowered only because the test tables
    are tiny; the assertion is the plan shape, not the thresholds."""
    confs = {
        "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
        "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold": "10GB",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
        "spark.sql.autoBroadcastJoinThreshold": "-1",
    }
    with _conf_override(spark, confs):
        li = spark.read.parquet(f"{SF_CORRECTNESS}/lineitem.parquet")
        orders = spark.read.parquet(f"{SF_CORRECTNESS}/orders.parquet").filter(
            F.col("o_totalprice") > 400000
        )
        j = li.join(orders, li.l_orderkey == orders.o_orderkey).agg(
            F.count("*").alias("n")
        )
        plan = physical_plan(j).lower()
        assert "bloom_filter_agg" in plan, plan  # built from the filtered side
        assert "might_contain" in plan, plan  # probes on the fact side pre-shuffle


def test_q101_funnel_two_shuffles_only(spark):
    # running-flag funnel: ONE hash exchange on user_id feeds both window
    # passes and the per-user aggregate (same key -> exchange reuse), plus
    # the final single-partition 3-row aggregate. The naive 3-self-join
    # form would shuffle the fact three times.
    df = build("q101_event_funnel")(spark, SF_CORRECTNESS)
    assert n_shuffles(df) == 2, physical_plan(df)


def test_q102_incremental_dedup_batch_shuffles_once(spark):
    # anti-join and within-batch canonical both key on fp: the batch side
    # is exchanged once and reused; the snapshot contributes only its own
    # distinct-fp exchange. 2 total — and the admitted set must actually
    # be smaller than the batch (the corpus plants token-set collisions),
    # or the dedup would be vacuously green.
    df = build("q102_incremental_dedup")(spark, SF_CORRECTNESS)
    assert n_shuffles(df) == 2, physical_plan(df)
    # rn = 1 activates WindowGroupLimit: each map partition forwards ONE
    # row per fingerprint before the exchange, so a viral duplicate (one
    # fp with millions of copies) cannot create a hot sort partition
    assert "WindowGroupLimit" in physical_plan(df), physical_plan(df)
    from nsq2kinesis_spark.operators.llm_pipeline import SNAPSHOT_MAX_SRC
    from nsq2kinesis_spark.tables import table
    from pyspark.sql import functions as FF

    batch_n = (
        table(spark, SF_CORRECTNESS, "documents")
        .filter(FF.substring("source", 4, 10).cast("int") > SNAPSHOT_MAX_SRC)
        .count()
    )
    admitted = df.count()
    assert 0 < admitted < batch_n, (admitted, batch_n)


def test_q103_islands_single_exchange(spark):
    # both row_numbers, the island aggregate, and the summary aggregate all
    # cluster on user_id — ONE hash exchange carries the whole query
    # (hashpartitioning on a subset of each group key satisfies the
    # downstream clustering requirements)
    df = build("q103_gaps_islands")(spark, SF_CORRECTNESS)
    assert n_shuffles(df) == 1, physical_plan(df)


def test_q104_rolling_distinct_never_materializes_window_sets(spark):
    # the rolling-distinct decomposition is three keyed exchanges over
    # (user, day)-deduped data — and NO window operator: the unscalable
    # formulation (size(collect_set) OVER a moving frame) would hold every
    # window's full user set in executor memory
    df = build("q104_rolling_active_users")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "Window" not in plan, plan
    assert "collect_set" not in plan, plan
    assert n_shuffles(df) == 3, plan


def test_q105_subqueries_decorrelated_to_hash_joins(spark):
    # both correlated scalar subqueries must decorrelate into aggregate +
    # hash join — a per-row re-execution would appear as a nested loop /
    # cartesian over the fact
    df = build("q105_scalar_subquery")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # one hash join back to the fact PER subquery, and each decorrelated
    # aggregate prints as a partial+final pair — so 2 joins and >=4
    # aggregate nodes prove BOTH subqueries decorrelated (a single
    # surviving aggregate would show only 2 nodes and 1 join)
    assert plan.count("HashJoin") == 2, plan
    agg_nodes = plan.count("HashAggregate") + plan.count("SortAggregate")
    assert agg_nodes >= 4, plan


def test_q106_sparse_similarity_is_equi_join(spark):
    # the dot products must come from the day-keyed inverted-index equi
    # join — never a dense all-pairs product — and top-k must push the
    # per-partition limit
    df = build("q106_user_similarity")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "WindowGroupLimit" in plan, plan
    # the salted day join must stay SORT-MERGE: Catalyst sizes the
    # exploded sides at their child's size and would otherwise broadcast
    # a multi-million-row relation (the round-5 7x pathology)
    assert "SortMergeJoin" in plan, plan


def test_compaction_restores_file_layout(spark, tmp_path):
    """The small-files maintenance pass every 100 TB table needs: a
    fragmented write (many tiny files — the natural output of a
    high-parallelism or streaming job) is compacted by
    repartitionByRange(target, key) + sortWithinPartitions, which must
    (a) cut file count to the target, (b) preserve rows exactly, and
    (c) leave each file a DISJOINT key range so footer-based pruning
    serves point lookups from one file instead of all of them."""
    from nsq2kinesis_spark.tables import table

    docs = table(spark, SF_CORRECTNESS, "documents")
    frag = tmp_path / "fragmented"
    docs.repartition(64).write.parquet(str(frag))
    assert len(list(frag.glob("*.parquet"))) >= 32  # genuinely fragmented

    compacted = tmp_path / "compacted"
    (
        spark.read.parquet(str(frag))
        .repartitionByRange(4, "doc_id")
        .sortWithinPartitions("doc_id")
        .write.parquet(str(compacted))
    )
    files = sorted(compacted.glob("*.parquet"))
    assert len(files) <= 4, files

    got = spark.read.parquet(str(compacted))
    assert got.count() == docs.count()
    assert sorted(r.doc_id for r in got.select("doc_id").collect()) == sorted(
        r.doc_id for r in docs.select("doc_id").collect()
    )

    # disjoint per-file doc_id ranges → a point filter prunes to ONE file
    ranges = sorted(
        bounds["doc_id"]
        for bounds in _file_column_bounds(compacted, {"doc_id"}).values()
    )
    assert len(ranges) == len(files)
    for (_, prev_hi), (next_lo, _) in zip(ranges, ranges[1:]):
        assert prev_hi < next_lo, ranges  # no overlap between files


def test_aqe_splits_skewed_join_partition_at_runtime(spark):
    """The engine's skew story is two-tier: deterministic salting
    (functions/skew.py, tests/test_skew.py) where the hot key is known,
    and AQE's runtime skew-join split for the hot keys nobody predicted.
    This pins the second tier: a 90%-hot-key shuffle join must execute
    with the hot partition SPLIT (SortMergeJoin(skew=true) reading an
    'AQEShuffleRead skewed'), not with one straggler task processing 90%
    of the data. Thresholds are lowered only because the test data is
    tiny; the assertion is the runtime re-plan itself."""
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "64KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    with _conf_override(spark, confs):
        left = spark.range(200_000).select(
            F.when(F.col("id") % 10 < 9, 0).otherwise(F.col("id")).alias("k"),
            F.concat(F.lit("x" * 60), F.col("id").cast("string")).alias("pay"),
        )
        right = spark.range(5_000).select(
            F.col("id").alias("k"), F.lit("r").alias("rv")
        )
        j = left.join(right, "k")
        n = len(j.collect())  # AQE re-plans DURING execution — run, then inspect
        assert n == 180_500  # 180k hot-key matches + 500 tail matches
        plan = physical_plan(j)
        assert "isFinalPlan=true" in plan, plan
        assert "skew=true" in plan, plan
        assert "AQEShuffleRead skewed" in plan, plan


def test_q107_paths_topk_no_global_sort(spark):
    # path counting ends in TakeOrderedAndProject — partitions forward
    # only their own top candidates, never a corpus-wide range sort
    df = build("q107_event_paths")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_q108_daily_bands_single_shuffle(spark):
    # exact percentiles per day: one hash exchange on the day key, no
    # window over the event history
    df = build("q108_daily_value_bands")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert n_shuffles(df) == 1, plan
    assert "Window" not in plan, plan


def test_q109_retention_keyed_aggregates_only(spark):
    # cohort retention is three keyed exchanges ((user,day) dedup, per-user
    # min/flags riding the user key, per-cohort rollup) and an equi join —
    # never a window over the raw event history
    df = build("q109_retention_cohorts")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert n_shuffles(df) == 3, plan
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q110_pii_redaction_map_only_scan(spark):
    # PII scrubbing must be a single map-only codegen'd projection: it
    # touches every byte of a 100 TB corpus, so any exchange is waste
    df = build("q110_pii_redaction")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert n_shuffles(df) == 0, plan
    assert has_whole_stage_codegen(df), plan
    assert "pythonudf" not in plan.lower(), plan


def test_q111_chunk_dedup_aggregate_not_window(spark):
    # first-occurrence keeper is a map-side-combinable min(struct)
    # AGGREGATE + chunk-keyed join (AQE-skew-splittable on a hot
    # boilerplate chunk) — NEVER a window sort over the chunk key; the
    # chunker (transform over sequence) stays in the scan stage, and the
    # exchanges are chunk-agg / chunk-join / doc-reassembly only
    df = build("q111_chunk_dedup")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "Window" not in plan, plan
    assert n_shuffles(df) <= 3, plan
    assert "pythonudf" not in plan.lower(), plan


def test_q112_lift_unary_counts_broadcast(spark):
    # the df-cap semi-join and both unary-count attachments ride
    # broadcasts (vocab-sized); the only shuffles key the doc-id pair
    # join and the two aggregations; top-k is per-partition heads
    df = build("q112_cooccurrence_lift")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert has_broadcast_join(df), plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan
    assert "CartesianProduct" not in plan, plan


def test_q113_length_buckets_single_shuffle(spark):
    # token-count + CASE ladder fold into the scan projection; one hash
    # exchange on the (source, bucket) key and nothing else
    df = build("q113_length_buckets")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert n_shuffles(df) == 1, plan
    assert "Join" not in plan, plan
    assert "pythonudf" not in plan.lower(), plan


def test_q114_anomalies_no_window_broadcast_stats(spark):
    # two keyed aggregations and a broadcast join back — never a window
    # over the raw event history, never a second scan of events
    df = build("q114_daily_anomalies")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "Window" not in plan, plan
    assert has_broadcast_join(df), plan
    assert plan.lower().count("parquet") <= 2 or plan.count("FileScan") <= 2, plan


def test_q115_mixture_quota_joins_broadcast(spark):
    # the availability counts, the T scalar, and the quota table are all
    # |sources|-sized and must ride broadcasts; the only corpus-keyed work
    # is the per-source hash-rank window (one exchange on source); the
    # corpus scans exactly twice (rank branch + counts branch — the T
    # window derives inside the counts subtree, never a third scan)
    df = build("q115_dataset_mixture")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert has_broadcast_join(df), plan
    assert "CartesianProduct" not in plan, plan
    assert "pythonudf" not in plan.lower(), plan
    assert plan.count("FileScan") <= 2, plan


def test_q117_scd2_single_user_exchange(spark):
    # lag change-detection, version numbering, and the valid_to lead all
    # ride ONE user-keyed exchange (later windows only re-sort locally)
    df = build("q117_scd2_intervals")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert n_shuffles(df) == 1, plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_q118_fuzzy_join_blocked_not_cartesian(spark):
    # edit distance admits no hash, so the join MUST carry the equi block
    # key (hash/merge join) with Levenshtein as a post-filter — a
    # cross/nested-loop product over customers is the scale failure mode
    df = build("q118_fuzzy_match")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # must be the pinned sort-merge — a BroadcastHashJoin here means the
    # x(len+1) exploded key side got broadcast off its pre-explode size
    # estimate (4x slower at sf0.1, OOM at scale)
    assert "SortMergeJoin" in plan, plan
    assert "BroadcastHashJoin" not in plan, plan
    assert "pythonudf" not in plan.lower(), plan


def test_q122_basket_pairs_hash_join_topk(spark):
    # the pair join keys on order id (hash join, fanout bounded by order
    # size); part frequencies attach via broadcast; top-k is per-partition
    # heads, never a global range sort
    df = build("q122_copurchase")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert has_broadcast_join(df), plan
    assert "TakeOrderedAndProject" in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_q124_hash_mixture_is_map_side(spark):
    """The at-scale mixture draw must be window-free: the corpus scan
    feeds a broadcast join + codegen filter, never a per-source sort —
    that serialization is exactly what this variant replaces in q115."""
    df = build("q124_dataset_mixture_hash")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    # exactly one Window — the unpartitioned min over the |sources|-row
    # aggregate inside the broadcast branch, never over the corpus (q115's
    # per-source rank window is precisely what must NOT appear here)
    assert plan.count("Window") == 1, plan
    assert "row_number" not in plan.lower(), plan
    assert "rangepartitioning" not in plan.lower(), plan
    assert has_broadcast_join(df, plan), plan
    # only the |sources|-row quota aggregate shuffles; the corpus-side
    # scan->join->filter is shuffle-free
    assert n_shuffles(df) <= 2, plan
    assert "pythonudf" not in plan.lower(), plan


def test_q119_trend_is_two_stage_agg_no_window(spark):
    # OLS moments ride two keyed aggs over ONE scan — no per-type window
    # over the event history, no join, map-side arithmetic at the end
    df = build("q119_daily_trend")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "Window" not in plan, plan
    assert "Join" not in plan, plan
    assert plan.count("FileScan") == 1, plan
    assert n_shuffles(df) <= 2, plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_q120_gini_window_partitions_by_type(spark):
    # the only window ranks day-counts INSIDE an event_type partition
    # (day-count-sized, bounded); never a global rank/range sort
    df = build("q120_volume_gini")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert plan.count("Window") == 1, plan
    assert "rangepartitioning" not in plan.lower(), plan
    assert "Join" not in plan, plan
    assert plan.count("FileScan") == 1, plan


def test_q121_ab_test_is_agg_only(spark):
    # per-user flag agg -> global conditional rollup: no window, no join,
    # one events scan
    df = build("q121_ab_test")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "Window" not in plan, plan
    assert "Join" not in plan, plan
    assert plan.count("FileScan") == 1, plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_q123_dq_report_scans_and_anti_join_only(spark):
    # every rule is a scan+agg; the FK rule is the single join and it must
    # be an ANTI join (never a cartesian/nested-loop existence check);
    # no window anywhere
    df = build("q123_dq_report")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "Anti" in plan, plan
    # the one nested-loop allowed is the FK rule attaching its scalar
    # lineitem count to the 1-row violation aggregate (1-row x 1-row) —
    # the existence check itself must stay a hash anti join (above)
    assert plan.count("BroadcastNestedLoopJoin") <= 1, plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_q125_diversity_two_aggs_no_window(spark):
    # Gini-Simpson moments: (user,type) agg -> user rollup, map-side
    # arithmetic — no window, no join, one scan
    df = build("q125_user_diversity")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "Window" not in plan, plan
    assert "Join" not in plan, plan
    assert plan.count("FileScan") == 1, plan
    assert n_shuffles(df) <= 2, plan


def test_q126_cdc_apply_is_one_aggregate_not_window(spark):
    # last-write-wins MUST be the map-side-combinable max_by aggregate —
    # a window rn=1 formulation shuffles every version of every hot key
    # to one task first (the scale trap this operator exists to avoid)
    df = build("q126_cdc_apply")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "Window" not in plan, plan
    assert "max_by" in plan, plan
    assert "Join" not in plan, plan
    assert n_shuffles(df) == 1, plan
    assert plan.count("FileScan") == 1, plan


def test_q127_overlap_joins_on_user_sizes_broadcast(spark):
    # pair generation is a user-keyed equi self-join (per-user fanout
    # bounded by |types|^2); the |types|-row size table attaches via
    # broadcast; never a cartesian product
    df = build("q127_audience_overlap")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert has_broadcast_join(df, plan), plan
    assert "Window" not in plan, plan


def test_q128_gap_fill_calendar_from_aggregate(spark):
    # the dense calendar explodes from the |types|-row bounds aggregate,
    # never from the raw scan; one events scan feeds both join sides
    df = build("q128_gap_fill")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("FileScan") <= 2, plan  # daily + bounds branches
    assert "rangepartitioning" not in plan.lower(), plan


def test_q129_growth_curve_window_is_days_sized(spark):
    # cumulative distinct = first-touch agg + cumsum over |days| rows:
    # the single-partition window input must be the daily_new aggregate,
    # never the raw events (distinct-over-window is the unbounded-state
    # trap this decomposition avoids)
    df = build("q129_growth_curve")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert plan.count("Window") == 1, plan
    assert plan.count("FileScan") == 1, plan
    # two keyed aggs (user first-day, per-day count) + the SinglePartition
    # exchange feeding the tiny cumsum
    assert n_shuffles(df) <= 3, plan


def test_runtime_bloom_filter_injects_on_fact_fact_join(spark):
    """100 TB readiness check for Spark's runtime row-level filtering: a
    selective dimension-side predicate on a fact-fact shuffle join must be
    convertible into an injected bloom filter on the probe side's scan
    (semi-join pushdown at runtime) — at cluster scale the default
    thresholds (10 GB application-side scan) trigger this automatically;
    locally the thresholds are forced to prove the engine's plans are
    SHAPED so the optimization can fire (an expression the optimizer
    can't see through — e.g. a udf-wrapped key — would silently lose
    it)."""
    from nsq2kinesis_spark.tables import table

    with _conf_override(
        spark,
        {
            "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
            "spark.sql.optimizer.runtime.bloomFilter."
            "applicationSideScanSizeThreshold": "0",
            "spark.sql.autoBroadcastJoinThreshold": "-1",
        },
    ):
        li = table(spark, SF_CORRECTNESS, "lineitem")
        o = table(spark, SF_CORRECTNESS, "orders").filter(
            F.col("o_totalprice") > 400000
        )
        j = (
            li.join(o, li.l_orderkey == o.o_orderkey)
            .groupBy("l_returnflag")
            .count()
        )
        plan = physical_plan(j)
        assert "might_contain" in plan, plan
        assert "bloom_filter_agg" in plan, plan


def test_q130_chunker_is_narrow_explode(spark):
    # the RAG chunker must stay a pure scan -> sequence-explode -> slice
    # projection: zero shuffles, zero joins, no Python stage
    df = build("q130_rag_chunker")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert n_shuffles(df) == 0, plan
    assert "Join" not in plan, plan
    assert "Window" not in plan, plan
    assert "pythonudf" not in plan.lower(), plan


def test_q131_hard_negatives_broadcast_rank_filter(spark):
    # anchors broadcast over one corpus scan; wrong-label filter rides the
    # join; top-k activates WindowGroupLimit so tasks keep k rows per
    # anchor before the window sort
    df = build("q131_hard_negatives")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert has_broadcast_join(df, plan), plan
    assert "WindowGroupLimit" in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_q132_containment_shares_q75_plan_shape(spark):
    # containment scores the same shared overlap table as q75: equi join
    # on the shingle hash, packed-pair agg, size joins — never a cross
    # product, no window, no Python
    df = build("q132_containment")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Window" not in plan, plan
    assert "pythonudf" not in plan.lower(), plan


def test_q133_ppjoin_no_cartesian_no_python(spark):
    # prefix filtering must keep everything as equi joins on the token
    # hash / doc id: no cross product, no Python stage, no corpus window
    df = build("q133_ppjoin")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "Window" not in plan, plan
    assert "pythonudf" not in plan.lower(), plan


def test_q134_scd2_resolve_hash_join_with_residual(spark):
    # fact-to-SCD resolution: equi hash join on user_id with the interval
    # test as residual — never a nested-loop/cross product; the interval
    # build's windows all ride user-keyed exchanges (no range sort)
    df = build("q134_scd2_resolve")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "HashJoin" in plan or "SortMergeJoin" in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_q135_mad_aggregate_only_with_broadcast_backjoins(spark):
    # two exact percentile aggs over day-sized groups; the tiny med/mad
    # frames attach by broadcast; no window, no range sort
    df = build("q135_daily_mad")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "Window" not in plan, plan
    assert has_broadcast_join(df, plan), plan
    assert "CartesianProduct" not in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_q136_interpolation_arm_actually_fires(spark):
    # guard against vacuous parity: the sparse high-value series must
    # contain real gaps so the interpolation branch is exercised, and
    # every filled value must sit strictly between its brackets' bounds
    df = build("q136_interpolate")(spark, SF_CORRECTNESS)
    rows = df.collect()
    filled = [r for r in rows if r.is_interpolated == 1]
    assert filled, "no gaps at sf0.01 — interpolation arm untested"
    assert all(r.n_filled is not None for r in filled)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_q137_sketch_rollup_two_aggs_no_rescan(spark):
    # the daily estimate comes from MERGING hourly sketches — the merge
    # branch scans events once (the exact companion adds its own scan);
    # both aggregation levels are partial+final hash aggregates
    df = build("q137_hll_rollup")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert plan.count("FileScan") == 2, plan  # sketch branch + exact companion
    assert "Window" not in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan


def test_q138_snapshot_diff_aggs_plus_full_outer(spark):
    # both snapshots are window-free max_by compactions; the diff is one
    # full-outer HASH join on the key (never nested-loop), minimal output
    df = build("q138_snapshot_diff")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "Window" not in plan, plan
    assert "FullOuter" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("max_by") >= 2, plan
    # at sf0.01 all three change kinds must actually occur (non-vacuous
    # classification arms)
    ops = {r.op for r in df.collect()}
    assert ops == {"I", "U", "D"}, ops


def test_q139_latency_no_window_over_events(spark):
    # first-touch mins + one user-keyed join + cohort percentiles: no
    # window over raw events, no cartesian, no range sort
    df = build("q139_conversion_latency")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "Window" not in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan
    rows = df.collect()
    assert rows and all(r.n_converted > 0 for r in rows)


def test_q140_topk_others_windowgrouplimit_no_full_rank(spark):
    # the OTHERS row must come by subtraction, not a full ranking: the
    # only window carries the rk<=k filter (WindowGroupLimit pushdown),
    # and the group sums are plain hash aggregates
    df = build("q140_topk_others")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "WindowGroupLimit" in plan, plan
    assert "rangepartitioning" not in plan.lower(), plan
    assert "CartesianProduct" not in plan, plan
    # invariant: per type, top rows + others == group total
    from collections import defaultdict

    sums, totals = defaultdict(int), defaultdict(int)
    for r in df.collect():
        sums[r.event_type] += r.cents
    from nsq2kinesis_spark.tables import table
    from pyspark.sql import functions as F2

    for r in (
        table(spark, SF_CORRECTNESS, "events")
        .groupBy("event_type")
        .agg(F2.sum(F2.round(F2.col("value") * 100, 0).cast("long")).alias("c"))
        .collect()
    ):
        totals[r.event_type] = r.c
    assert sums == totals


def test_q141_rollup_reads_only_the_sketch_table(spark):
    """The materialize-once proof: the RETURNED rollup plan must scan only
    the written sketch parquet — never events — and merge sketches with
    hll_union_agg. If events leaked into the second query the whole
    economic argument (every future rollup costs |cells| tiny binaries,
    not a re-shuffle of the raw corpus) would be false."""
    df = build("q141_sketch_table_rollup")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "events" not in plan, plan
    assert "nsq2k_sketch_table_" in plan, plan
    assert "hll_union_agg" in plan, plan
    rows = df.collect()
    assert rows and all(r.approx_users > 0 and r.n_cells >= r.n_days for r in rows)


def test_q142_incremental_plan_reads_table_once_events_once(spark):
    """q142's returned plan joins the incrementally-maintained table's
    rollup (scans ONLY the sketch parquet) with the ground-truth rebuild
    (scans events exactly once): the incremental side must show the
    materialized table and no second events scan — the delta-append
    economics live in the materialization step, the returned comparison
    must not quietly re-derive the incremental side from raw events."""
    df = build("q142_sketch_incremental")(spark, SF_CORRECTNESS)
    plan = physical_plan(df)
    assert "nsq2k_incr_sketch_" in plan, plan
    assert plan.count("events.parquet") == 1, plan
    assert "hll_union_agg" in plan, plan


@pytest.mark.slow
def test_no_query_plans_a_cartesian_product(spark):
    """Registry-wide join-strategy invariant (round 6): NO query may ever
    plan a CartesianProduct — the strategy that turns two large sides
    into |A|x|B| work with no key at all — and BroadcastNestedLoopJoin
    (the crossJoin form) is allowed only for the declared whitelist,
    where the broadcast side is provably scalar- or dimension-sized
    (query sets, centroid tables, corpus-total scalars). A new query
    that accidentally cross-joins two corpus-sized sides trips this
    before it ever meets real data."""
    BNLJ_OK = {
        # broadcast side is a <=N_QUERIES query set or centroid table
        "q80_cosine_topk", "q81_cosine_neardup", "q82_ann_ivf",
        "q90_kmeans_train", "q131_hard_negatives",
        # broadcast side is a one-row corpus total / threshold scalar
        "q95_zorder_key", "q96_heavy_hitters_mg", "q100_tfidf_topterms",
        "q112_cooccurrence_lift", "q122_copurchase", "q123_dq_report",
    }
    offenders = {}
    for name, q in all_queries().items():
        plan = physical_plan(q.builder(spark, SF_SMOKE))
        if "CartesianProduct" in plan:
            offenders[name] = "CartesianProduct"
        elif "BroadcastNestedLoopJoin" in plan and name not in BNLJ_OK:
            offenders[name] = "undeclared BroadcastNestedLoopJoin"
    assert not offenders, offenders


def test_ann_lane_plan_shape(spark):
    """Round-14 ANN lane (ann_user_similarity) — the plan properties that
    make it the exact lane's scale relief valve:

    * NO cartesian product anywhere (candidates come from an equi
      self-join on (band_idx, band_val); verification is two hash joins
      against the day index);
    * the hot-bucket exclusion is a BROADCAST anti-join (the hot list is
      tiny by construction — bounded by distinct saturated bucket values);
    * signature generation is ONE aggregate pass over the profile (the
      plane dots are sum aggregates in a single keys=[user_id]
      HashAggregate carrying the salted xxhash64 Rademacher expression —
      never per-plane shuffles);
    * top-k uses the rank-filter idiom (WindowGroupLimit at runtime)."""
    from nsq2kinesis_spark.operators.similarity import (
        Q106_ANN_SALT,
        ann_user_similarity,
    )

    df = ann_user_similarity(spark, SF_SMOKE)
    plan = physical_plan(df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert plan.count("BroadcastHashJoin") >= 1, plan  # the anti-join
    assert "WindowGroupLimit" in plan, plan
    # signature pass: plane-0's salted Rademacher sum rides a
    # keys=[user_id] HashAggregate (explain truncates the function list,
    # so assert the aggregate's identity, not all 64 columns)
    sig_aggs = [
        ln for ln in plan.splitlines()
        if "HashAggregate(keys=[user_id#" in ln and f"{Q106_ANN_SALT}0" in ln
    ]
    assert sig_aggs, f"signature aggregate not found:\n{plan[:4000]}"
