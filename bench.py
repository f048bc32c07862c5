"""Benchmark harness: run the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and print ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is forced end-to-end with a noop sink (full materialization on
executors, nothing collected to the driver) — the same shape a cluster run
would have.

Methodology: steady-state measurement. One untimed pass over the full
headline list first (JVM JIT, codegen cache, parquet footers, OS page
cache), then the timed pass; ``spark.catalog.clearCache()`` runs before
every timed query so each timing is a self-contained cold-DataFrame-cache
execution and no query inherits another's persisted intermediate state.
This mirrors how a long-running cluster engine is actually measured —
per-query latency on a warm service, not JVM-cold-start.

Noise floor, measured (round 4): sub-second queries on this shared
32-thread box spread ±30% warm (q20 over n=6 isolated runs:
0.72-1.18 s, min 0.718 ≈ its round-2 best 0.70) — so min-of-2 deltas
under ~0.2 s between rounds (e.g. round 3's q20 "+31%" = +0.22 s) are
sampling noise, not plan changes. Treat cross-round deltas as real only
when they exceed the band or the plan diffs. ``kpl_pack_recs_per_s``
doubles as a HOST-SPEED CALIBRATION ANCHOR: it is identical single-thread
pure-Python code every round (round-4 samples on this box: 182k in a
quiet window, 118-158k under co-tenant load), so when two rounds' anchors
differ, normalize their query totals by the anchor ratio before calling a
delta real.

Round-5 note on the dedup family: the r4 regression (q75 +26%, postings
+31% vs r3) was bisected to 4e8be4a's removal of the sizes-join broadcast
hints; the hint is restored behind a corpus-size guard
(llm_dedup.SIZES_BROADCAST_MAX_DOCS). Isolated A/B at sf0.1 (same JVM,
min-of-3): family total 6.59 s unhinted -> 5.4-5.7 s hinted. Numbers
measured INSIDE the full bench run remain ~15-20% higher across the board
(postings 1.36 vs 1.06 isolated) — heap/codegen-cache state after the 14
preceding queries plus tenancy, not plan differences; cross-round
comparisons should use same-context numbers only.

One declared exception: the df-capped shingle postings are the shared
input artifact of the near-dup family — a real pipeline materializes them
once and both the exact (q75) and LSH (q76) passes read the artifact, so
charging the build to each query double-counts it. The build is timed as
its own line item ("shared_shingle_postings", counted once in the total)
and the cache clear is skipped before exactly q75/q76 so they read the
artifact they declared shared. Nothing else is exempt.

Round-10 addition: a PARALLEL host anchor ("spark_anchor_sec") — a fixed
fully-parallel JVM workload timed in the same warm session right before
the headline passes. The single-thread kpl_pack anchor calibrates CPU
speed but is blind to 32-thread contention (rounds 8/9 both drifted ±13%
raw at a flat kpl anchor, in opposite directions);
"headline_spark_anchor_normalized_sec" rescales the headline total by
the parallel anchor so cross-round deltas in that number are engine
deltas. Series reference epoch = round 10 (SPARK_ANCHOR_BASE_SEC).

Round-6 addition: an EXTENDED section ("extended" / "extended_total_sec"
keys) times the heavy round-4/5 algorithmic operators — q133 PPJoin
prefix filtering, q106 triangle-salted behavioral similarity, q118
symmetric-delete fuzzy linkage, q111 chunk dedup — with the same
warmup + min-of-3 methodology. It is deliberately NOT added to the fixed
headline list or its total: the headline set is frozen for cross-round
comparability (see memory rule), so regressions in these operators are
tracked via the separate extended dict instead of silently breaking the
round-over-round headline series.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nsq2kinesis_spark.registry import all_queries
from nsq2kinesis_spark.session import get_spark

# Round-1 host-speed anchor (BENCH_r01.json's kpl_pack_recs_per_s). The
# anchor-normalized headline is total × (this round's anchor / this
# constant) — "what would this round's total read on the r1 box".
R1_KPL_PACK_ANCHOR = 208_569

# Round-10 PARALLEL anchor base (builder box, quiet window, min-of-3).
# The kpl_pack anchor is single-thread pure Python, so it is blind to
# 32-thread contention — rounds 8 and 9 both saw ±13% raw headline drift
# at a flat kpl anchor, in OPPOSITE directions, and the delta had to be
# adjudicated by narrative. spark_anchor_sec times a FIXED fully-parallel
# JVM workload (64-partition range → hash shuffle on 9973 keys → 3
# aggregates → noop sink, zero I/O, zero Python) in the same session
# immediately after warmup, so it sees exactly the contention the
# headline queries see. Normalized headline = total × (this constant /
# this round's anchor): a contended box (anchor above base) has its raw
# total deflated to base-box-equivalent. Round 11 is the reference epoch
# for this series (fixed-JIT-depth protocol — see spark_anchor_sec's
# round-11 methodology note; the r10 base was 1.443 under the old
# min-of-3 protocol and its normalized points are comparable only to
# each other).
#
# CROSS-BOX CAVEAT (recorded round 11, from the r10 calibration read):
# the anchor corrects SAME-BOX contention well, but it is NOT a
# cross-box equalizer — at identical code, the r10 driver box
# normalized to 20.37 s while the builder box normalized to 17.77 s, a
# 14% disagreement (different memory/cache hierarchies move the anchor
# and the mixed headline differently). Never mix boxes within a
# comparison: read driver-run against driver-run, builder-run against
# builder-run.
SPARK_ANCHOR_BASE_SEC = 0.938  # builder box, 2026-08-15 (r11), fixed-depth
# protocol, min of 3 fresh-session measurements (0.938 / 0.948 / 1.088)

HEADLINE = [
    "q01_pricing_summary",  # scan→filter→agg→(8 aggregates)
    "q04_sort_limit",  # global top-N
    "q12_cube",  # grouping-set expansion
    "q20_join_inner_broadcast",  # fact ⋈ broadcast dims
    "q21_join_shuffle_3way",  # fact-to-fact shuffle join
    "q28_join_asof",  # as-of via single-pass window
    "q32_window_frames",  # running/moving frames
    "q60_dedup_exact",  # keyed dedup
    "q63_session_window",  # sessionization
    "q50_pandas_udf_tokenize",  # Arrow-batched pandas UDF path
    "q73_token_count_bpe",  # regex tokenization over documents
    "shared_shingle_postings",  # df-capped postings build (shared input of q75/q76)
    "q75_neardup_jaccard",  # exact shingle Jaccard (inverted index join)
    "q76_neardup_minhash_lsh",  # MinHash LSH candidates + verify
    "q78_simhash_pairs",  # banded SimHash pairs
    "q80_cosine_topk",  # brute-force vector top-k
    "q82_ann_ivf",  # IVF ANN probe
]

# Heavy algorithmic operators benched OUTSIDE the frozen headline set
# (module docstring, round-6 addition): tracked round-over-round in their
# own section so the headline total stays comparable across rounds.
EXTENDED = [
    "q133_ppjoin",  # rarest-first prefix filtering (no df cap)
    "q106_user_similarity",  # triangle-salted day self-join
    "q118_fuzzy_match",  # symmetric-delete blocked edit-distance join
    "q111_chunk_dedup",  # chunk-level near-dup keeper
    "q106_ann_lane",  # round 14: SRP-LSH candidates + exact verify (library lane)
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]
    spark = get_spark(app_name="nsq2kinesis_spark_bench")
    queries = all_queries()

    from nsq2kinesis_spark.operators.llm_dedup import shared_postings

    POSTINGS_READERS = {"q75_neardup_jaccard", "q76_neardup_minhash_lsh"}

    def run(name: str) -> None:
        if name == "shared_shingle_postings":
            # materialize (and re-persist after a cache clear) the shared
            # input artifact q75/q76 read
            df = shared_postings(spark, sf_dir)
            df.persist()
            df.count()
            return
        if name == "q106_ann_lane":
            # library lane (not a registered query): the q106 ANN relief
            # valve, benched so its round-over-round trend is mechanical
            from nsq2kinesis_spark.operators.similarity import (
                ann_user_similarity,
            )

            ann_user_similarity(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            return
        queries[name].builder(spark, sf_dir).write.format("noop").mode("overwrite").save()

    def timed_passes(names: list[str]) -> dict[str, float]:
        # three timed passes, report the min — single-shot local timings
        # carry 20-30% GC/scheduler/host-tenancy noise that min-of-N
        # suppresses (the round-4 noise-floor measurement above: even the
        # single-threaded packer throughput drifts ±20% between runs)
        out: dict[str, float] = {}
        for _ in range(3):
            for name in names:
                if name not in POSTINGS_READERS:
                    # no persisted state carries into a timing (except the
                    # declared shared artifact, for its declared readers)
                    spark.catalog.clearCache()
                start = time.perf_counter()
                run(name)
                elapsed = round(time.perf_counter() - start, 3)
                if name not in out or elapsed < out[name]:
                    out[name] = elapsed
        return out

    # untimed warmup pass: JIT, codegen cache, parquet footers, page cache
    for name in HEADLINE + EXTENDED:
        run(name)

    # parallel host anchor, timed in the SAME warm session immediately
    # before the headline passes so it samples the same contention regime
    sanchor = spark_anchor_sec(spark)

    timings = timed_passes(HEADLINE)
    # extended section AFTER the headline passes so its heavier heap
    # pressure can't bleed into the comparable series
    extended = timed_passes(EXTENDED)

    total = round(sum(timings.values()), 3)
    kpl_anchor = max(kpl_pack_throughput() for _ in range(3))
    result = {
        "metric": "headline_queries_total_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "extended": extended,
        "extended_total_sec": round(sum(extended.values()), 3),
        "sf": float(sf),
        "kpl_pack_recs_per_s": kpl_anchor,
        # Mechanical cross-round regression detection (round-8 verdict):
        # kpl_pack is identical single-thread pure-Python code every round,
        # so it calibrates host speed. headline_anchor_normalized_sec =
        # headline total rescaled to the ROUND-1 box (anchor 208,569
        # rec/s): compare THIS number across rounds — raw totals confound
        # ±30% host-tenancy drift with real engine deltas.
        "anchor_ratio_vs_r1": round(kpl_anchor / R1_KPL_PACK_ANCHOR, 4),
        "headline_anchor_normalized_sec": round(
            total * kpl_anchor / R1_KPL_PACK_ANCHOR, 3
        ),
        # Parallel-contention calibration (round-10, per the r9 verdict):
        # spark_anchor_sec is a fixed 32-thread JVM workload timed in this
        # same session; the normalized headline rescales the total to the
        # round-10 reference box, so cross-round deltas in THIS number are
        # engine deltas, not tenancy. Series starts at r10.
        "spark_anchor_sec": sanchor,
        "spark_anchor_ratio_vs_base": round(SPARK_ANCHOR_BASE_SEC / sanchor, 4),
        "headline_spark_anchor_normalized_sec": round(
            total * SPARK_ANCHOR_BASE_SEC / sanchor, 3
        ),
        "forward_path_recs_per_s": forward_path_throughput(spark),
        "watermark_dedup_recs_per_s": watermark_dedup_throughput(spark),
        "stateful_dedup_recs_per_s": stateful_dedup_throughput(spark),
    }
    # graceful engine shutdown BEFORE printing: every streaming query fully
    # terminated and the session stopped, so no TorrentBroadcast /
    # job-group-cancel ERROR lines from interpreter-exit teardown can land
    # in the driver's bench artifact (round-8 verdict fix). Guarded so a
    # shutdown failure can never discard the computed result (the one JSON
    # line IS the round's bench evidence), and per-query so one query's
    # bad terminal state can't abort stopping the rest.
    try:
        for active in spark.streams.active:
            try:
                active.stop()
                active.awaitTermination(30)
            except Exception:
                pass
        spark.stop()
    finally:
        print(json.dumps(result))


def forward_path_throughput(spark, n: int = 100_000) -> int:
    """End-to-end streaming hot path as a micro-batch: dedup → oversize →
    partition key → KPL pack → chunked PutRecords to an in-memory client,
    measured in records/sec on this machine. The reference's configured
    single-instance ceiling is ~500 recs/s (BASELINE.md: 1 batch/s × 500
    records); this measures the same contract on Spark's executor
    parallelism."""
    from pyspark.sql import functions as F

    from nsq2kinesis_spark.streaming.kinesis_sink import FakeKinesisClient, KinesisSink
    from nsq2kinesis_spark.streaming.pipeline import forwarding_transform

    df = spark.range(n).select(
        F.col("id").cast("string").alias("message_id"),
        F.encode(F.concat(F.lit("body-"), F.col("id")), "UTF-8").alias("body"),
        F.timestamp_millis(F.col("id") * 10).alias("ts"),
        F.lit(1).alias("attempts"),
        F.lit(None).cast("string").alias("key"),
    )
    transformed = forwarding_transform(df, streaming=False)
    sink = KinesisSink(stream="bench", client_factory=FakeKinesisClient)
    sink(transformed, 0)  # warmup
    # best-of-3 like every query timing: the single-shot r4 number moved
    # -22% while the host anchor moved +12%, i.e. one sample can't separate
    # a regression from GC/tenancy noise on this shared box
    best = 0.0
    for epoch in range(1, 4):
        start = time.perf_counter()
        sink(transformed, epoch)
        best = max(best, n / (time.perf_counter() - start))
    return int(best)


def _iso_to_epoch(ts: str) -> float:
    """StreamingQueryProgress.timestamp (ISO-8601 UTC, ms precision) →
    epoch seconds."""
    import datetime as dt

    fmt = "%Y-%m-%dT%H:%M:%S.%fZ" if "." in ts else "%Y-%m-%dT%H:%M:%SZ"
    return dt.datetime.strptime(ts, fmt).replace(tzinfo=dt.timezone.utc).timestamp()


def _data_elapsed(progresses, start_epoch: float) -> float:
    """Elapsed seconds from query start to the END of the last
    data-bearing batch (its trigger-start timestamp + triggerExecution
    duration). Wall-clock at empty-batch *detection* would also include
    that empty batch's trigger wait and execution — a constant bias that
    records throughput low and inflates run-to-run spread on a
    fast-draining run (round-8 advice fix)."""
    data = [p for p in progresses if p["numInputRows"] > 0]
    if not data:
        raise RuntimeError("no data-bearing progress entry — nothing to time")
    last = data[-1]
    end = _iso_to_epoch(last["timestamp"]) + last["durationMs"]["triggerExecution"] / 1000.0
    return max(end - start_epoch, 1e-6)


def watermark_dedup_throughput(spark, n: int = 200_000) -> int:
    """JVM production-path dedup throughput (round-8 addition, per the r7
    verdict): the same 200k-row 50%-duplicate feed through
    ``dropDuplicatesWithinWatermark`` — the watermark-scoped JVM state
    operator ``build_pipeline`` actually runs (pipeline.py
    dedup_transform, streaming=True) — reported beside
    ``stateful_dedup_recs_per_s`` (the applyInPandasWithState semantic
    mirror of reference deduper.go:17-47). The ratio between the two IS
    the measured price of the Python state protocol vs JVM state.

    Duplicate keys are ADJACENT in event time (ids 2k and 2k+1 share a
    body, 3 ms apart) so the second sighting always lands inside the
    4-minute watermark regardless of batching. Unlike the stateful path
    there are no processing-time timers, so trigger(availableNow)
    terminates by itself; elapsed is still measured to the end of the
    last data-bearing batch, like every streaming number."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    from nsq2kinesis_spark.streaming.pipeline import dedup_transform

    root = tempfile.mkdtemp(prefix="nsq2k_bench_wdedup_")
    src = os.path.join(root, "src")
    spark.range(n).select(
        F.col("id").cast("string").alias("message_id"),
        F.encode(
            F.concat(F.lit("b-"), F.floor(F.col("id") / 2).cast("string")), "UTF-8"
        ).alias("body"),
        F.timestamp_millis(F.col("id") * 3).alias("ts"),
    ).coalesce(8).write.parquet(src)

    best = 0.0
    try:
        for run in range(3):
            stream = spark.readStream.schema(
                "message_id string, body binary, ts timestamp"
            ).parquet(src)
            deduped = dedup_transform(stream, streaming=True)
            start_epoch = time.time()
            q = (
                deduped.writeStream.format("noop")
                .option("checkpointLocation", os.path.join(root, f"ckpt{run}"))
                .trigger(availableNow=True)
                .start()
            )
            if not q.awaitTermination(600):
                q.stop()
                raise RuntimeError(
                    "watermark_dedup bench: availableNow query did not "
                    "terminate within 600s"
                )
            best = max(best, n / _data_elapsed(q.recentProgress, start_epoch))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return int(best)


def stateful_dedup_throughput(spark, n: int = 200_000) -> int:
    """State-store path throughput (round-7 addition, per the r6 verdict):
    records/sec through ``generational_dedup`` — the applyInPandasWithState
    TTL cache that mirrors the reference's two-generation deduper
    (reference pkg/deduper/deduper.go:17-47), the reference's core stateful
    concern. forward_path covers the stateless hot path; this tracks the
    keyed-state one: shuffle on body_hash, Arrow transfer into the Python
    state function, per-key GroupState read/update/timeout bookkeeping.

    Methodology matches the other streaming numbers: the input (50% key
    duplication, so the dedup branch and the refresh branch both execute)
    is written once outside the timed region; each run starts a FRESH
    checkpoint + state store (state rebuild is the dominant real cost of
    the operator — reusing state would measure a no-op pass), streams the
    directory into the noop sink, and times query start → end of the
    data-bearing batch (progress timestamps — detection-poll wall-clock
    would add a trigger wait as a constant low bias).

    Stop discipline (round-8 fix for the ERROR lines in the r7 driver
    bench tail): a query over this operator NEVER terminates on its own —
    with ProcessingTimeTimeout even trigger(availableNow) loops "no new
    data but cleaning up state" batches back-to-back forever (measured:
    still looping 600 s after a 10 s TTL expired), so stop() under
    availableNow always interrupts a state-store commit mid-flight
    (CANNOT_COMMIT + TorrentBroadcast aborts). Instead the bench uses a
    processingTime trigger LONGER than any data batch (300 s): the whole
    feed arrives in batch 0 (file source, no maxFilesPerTrigger), drain
    is detected as cumulative input rows == n, and the stop lands in the
    guaranteed ≥200 s idle window before the first cleanup batch could
    fire — no job in flight, nothing to interrupt, a clean artifact.
    Best-of-3 like every other number."""
    import shutil
    import tempfile

    from pyspark.sql import functions as F

    root = tempfile.mkdtemp(prefix="nsq2k_bench_dedup_")
    src = os.path.join(root, "src")
    # 50% duplicate keys: ids map pairwise onto n/2 body hashes, and the
    # second sighting lands within the TTL so it is genuinely dropped
    spark.range(n).select(
        (F.col("id") % (n // 2)).cast("long").alias("body_hash"),
        F.col("id").cast("string").alias("message_id"),
        F.timestamp_millis(F.col("id") * 3).alias("ts"),
    ).coalesce(8).write.parquet(src)

    from nsq2kinesis_spark.streaming.stateful import (
        DEDUP_OUTPUT_SCHEMA,
        generational_dedup,
    )

    best = 0.0
    try:
        for run in range(3):
            # input schema == operator output schema (hash, id, ts)
            stream = spark.readStream.schema(DEDUP_OUTPUT_SCHEMA).parquet(src)
            deduped = generational_dedup(stream)
            start_epoch = time.time()
            q = (
                deduped.writeStream.format("noop")
                .option("checkpointLocation", os.path.join(root, f"ckpt{run}"))
                .trigger(processingTime="300 seconds")
                .start()
            )
            # drain detection over recentProgress (a cumulative list, so a
            # fast data batch can't be overwritten between polls the way a
            # lastProgress snapshot can): all n rows processed
            drained = False
            deadline = start_epoch + 600
            progresses = []
            while q.isActive and time.time() < deadline:
                progresses = q.recentProgress
                if sum(p["numInputRows"] for p in progresses) >= n:
                    drained = True
                    break
                time.sleep(0.05)
            # the stop lands inside the long inter-trigger window with no
            # job in flight (docstring) — belt-and-braces: confirm idle
            idle_deadline = time.time() + 60
            while (
                q.isActive
                and q.status.get("isTriggerActive")
                and time.time() < idle_deadline
            ):
                time.sleep(0.02)
            q.stop()
            q.awaitTermination(60)
            if not drained:
                raise RuntimeError(
                    "stateful_dedup bench: input not fully processed "
                    "within 600s — refusing to record a partial run"
                )
            best = max(best, n / _data_elapsed(progresses, start_epoch))
    finally:
        shutil.rmtree(root, ignore_errors=True)
    return int(best)


def spark_anchor_sec(spark) -> float:
    """Fixed parallel JVM anchor workload (round-10, per the r9 verdict):
    a 48M-row 64-partition range, two integer expressions, a hash shuffle
    onto 9,973 keys, three aggregates, noop sink. Identical plan every
    round and every box; no I/O, no Python in the hot path, saturates all
    local[32] threads — so its timing moves with exactly the co-tenancy /
    contention the headline queries experience and the single-thread
    kpl_pack anchor cannot see.

    Round-11 methodology fix: the original one-warm-run + min-of-3 sat on
    a still-DESCENDING JIT curve — probed in a fresh session, repeated
    runs read 1.235 → 1.074 → 0.946 → 0.837 → 0.752 over ~20 executions
    — so min-of-3 measured how much anchor-shaped JIT warmup had
    happened, not box speed (the r10→r11 'anchor moved 31% while kpl
    moved 7%' artifact). A convergence rule (stop when two consecutive
    runs agree within 5%) was probed and rejected: it stops at DIFFERENT
    depths of that curve depending on noise (fresh sessions plateaued at
    ~1.1 which deeper JIT later beat by 30%). The fix is a FIXED warmup
    depth: exactly 10 runs, min of the last 3 — deterministic JIT depth,
    comparable across rounds and boxes, ~10 s total (noise next to the
    bench). The fixed-depth series starts at round 11 (SPARK_ANCHOR_
    BASE_SEC re-based accordingly); r10's normalized points are
    comparable only to each other."""
    from pyspark.sql import functions as F

    df = spark.range(0, 48_000_000, 1, 64).select(
        (F.col("id") % 9973).alias("k"),
        F.pmod(F.col("id") * F.lit(2654435761), F.lit(1 << 31)).alias("v"),
    )

    def once() -> float:
        start = time.perf_counter()
        (
            df.groupBy("k")
            .agg(
                F.sum("v").alias("s"),
                F.count(F.lit(1)).alias("c"),
                F.avg("v").alias("a"),
            )
            .write.format("noop")
            .mode("overwrite")
            .save()
        )
        return time.perf_counter() - start

    times = [once() for _ in range(10)]
    return round(min(times[-3:]), 3)


def kpl_pack_throughput(n_records: int = 1000, body_bytes: int = 1000) -> int:
    """Sink-side packer throughput, the analog of the reference's
    BenchmarkPut1000 (reference aggregator_test.go:218-252): pack n 1 KB
    bodies under one key, drain, repeat for ≥0.5 s; returns records/sec.
    Single-core number — the sink runs one packer per executor task, so
    cluster throughput is this × task parallelism."""
    from nsq2kinesis_spark.streaming.kpl import KplAggregator

    body = b"x" * body_bytes
    deadline = time.perf_counter() + 0.5
    done = 0
    while time.perf_counter() < deadline:
        agg = KplAggregator()
        for _ in range(n_records):
            agg.put(body, "a")
        entries = agg.drain()
        assert len(entries) == 42  # the reference's packing invariant
        done += n_records
    elapsed = time.perf_counter() - (deadline - 0.5)
    return int(done / elapsed)


if __name__ == "__main__":
    main()
