"""Custom stateful streaming operators via applyInPandasWithState.

Two reference semantics that Spark's built-ins can't express directly:

1. ``generational_dedup`` — the reference's time-rotated two-generation
   dedup cache (reference pkg/deduper/deduper.go:17-47 + main.go:110-120):
   a record is a duplicate iff its key was seen within the TTL (2 rotation
   periods = 240 s); every sighting refreshes the mark (Test() always marks
   the current generation). ``dropDuplicatesWithinWatermark`` approximates
   this but couples the window to the watermark; this operator keeps the
   TTL an independent knob, exactly like the reference's rotation ticker.

2. ``count_size_trigger`` — the reference's count/size-bounded batch
   trigger (reference kinesis_writer.go:52-76, 134-205): emit a batch
   marker whenever accumulated records reach max_count OR accumulated bytes
   reach max_size. Spark triggers are time-based only; this reproduces the
   count/size dimension as keyed state.

State shards by key across executors (the reference serialized everything
through one mutex-guarded map, deduper.go:18 — the Spark form scales
horizontally; at 100 TB switch the state store to RocksDB — exercised in
tests/test_stateful.py's RocksDB lane).

applyInPandasWithState is deliberately the SINGLE custom-state path. A
transformWithState backend (Spark 4's forward API: per-variable TTL,
composable state types) was prototyped in rounds 3-5 but could never
execute here — its state-server protocol is protobuf-framed and
google.protobuf is absent from this image — and shipped-but-never-run
code is a liability, so it was removed in round 6. Porting is mechanical
when the dependency exists: the keep/refresh loop below moves into a
StatefulProcessor.handleInputRows and eviction delegates to
getValueState(..., ttlDurationMs) instead of the hasTimedOut branch.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

DEDUP_TTL_S = 240  # 2 × 120 s generations (reference main.go:113)

DEDUP_OUTPUT_SCHEMA = "body_hash long, message_id string, ts timestamp"
DEDUP_STATE_SCHEMA = "last_seen_s double"


def make_dedup_fn(ttl_s: int = DEDUP_TTL_S):
    """Returns the applyInPandasWithState function for TTL dedup: keep a
    record iff its key is unseen or last seen ≥ ttl_s ago (event time).
    Every sighting refreshes last-seen (reference Test() marks the current
    generation even for dupes, deduper.go:25-38).

    Timeout = state EVICTION (the reference's Trim() generation drop,
    deduper.go:42-47): without the remove() branch, every key ever seen
    would hold state forever and the store would grow unboundedly at scale.

    Clock contract: the keep/drop COMPARISON is event-time; EVICTION is
    wall-clock (ProcessingTimeTimeout — exactly the reference's ticker-
    driven Trim). Consequence: if the source stalls for more than ttl_s of
    wall time, evicted keys can re-admit an event-time duplicate — the
    same best-effort-cache behavior the reference has, and safe under the
    pipeline's at-least-once contract (dedup here is a cost optimization,
    not a correctness gate).

    Round-11 vectorization: the original per-row itertuples loop is
    replaced by a numpy prefix-max. With rows sorted ascending by ts, the
    reference mark each row compares against is max(state, all earlier
    ts) — a ``maximum.accumulate`` over [state, ts[0..n-2]] — so
    keep[i] = ts[i] − prefix_max[i] ≥ ttl, identical row-for-row to the
    loop (ties: the second of two equal-ts rows sees gap 0 and drops, as
    before; a late out-of-order record still cannot regress the mark,
    because the prefix max carries the state forward). Measured on the
    bench feed (200k rows, 100k 2-row groups, fresh sessions):
    14.5k → 16.4k rec/s (+13%). The remaining ~8× gap to
    ``dropDuplicatesWithinWatermark`` (125k rec/s, same box) is
    per-GROUP Python dispatch — one function call + GroupState
    read/update round-trip per key per batch — and is NOT reducible by
    batch sizing (arrow maxRecordsPerBatch 10k→100k measured −7%).
    Production guidance: ``dropDuplicatesWithinWatermark`` (JVM state,
    watermark-coupled window) is the recommended path when its
    window-follows-watermark semantics fit; THIS operator is the
    flexible-semantics tier — independent TTL knob, refresh-on-sighting,
    reference-exact generational behavior — at the measured ~8× state-op
    cost. The forwarding pipeline defaults to the watermark tier
    (streaming/pipeline.py) and reserves this one for semantics the
    built-in can't express.
    """
    import numpy as np

    def dedup_fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (last_seen,) = state.get if state.exists else (None,)
        frames = [p for p in pdfs if len(p)]
        if not frames:
            state.update((last_seen,))
            state.setTimeoutDuration(ttl_s * 1000)
            return
        pdf = frames[0] if len(frames) == 1 else pd.concat(frames, ignore_index=True)
        ts_ns = pdf["ts"].to_numpy(dtype="datetime64[ns]").astype("int64")
        order = np.argsort(ts_ns, kind="stable")
        ts_s = ts_ns[order].astype("float64") / 1e9
        init = -np.inf if last_seen is None else last_seen
        # the mark row i compares against: max(state, every earlier ts) —
        # never BACKWARD, so a late out-of-order record cannot open a
        # leak for a duplicate arriving ttl_s after it
        prev = np.maximum.accumulate(np.concatenate(([init], ts_s[:-1])))
        keep = ts_s - prev >= ttl_s
        state.update((max(init, ts_s[-1]),))
        state.setTimeoutDuration(ttl_s * 1000)
        if keep.any():
            yield pdf.iloc[order[keep]][["body_hash", "message_id", "ts"]]

    return dedup_fn


def generational_dedup(df, ttl_s: int = DEDUP_TTL_S):
    """df must have (body_hash, message_id, ts); emits survivors deduped
    within a ttl_s window (factory closure — ttl_s actually parameterizes
    the state function, it isn't a decorative default)."""
    return (
        df.groupBy("body_hash")
        .applyInPandasWithState(
            make_dedup_fn(ttl_s),
            outputStructType=DEDUP_OUTPUT_SCHEMA,
            stateStructType=DEDUP_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.ProcessingTimeTimeout,
        )
    )


TRIGGER_OUTPUT_SCHEMA = "key string, batch_no long, n_records long, n_bytes long"
TRIGGER_STATE_SCHEMA = "batch_no long, n_records long, n_bytes long"

MAX_COUNT = 500  # reference kinesis_writer.go:57
MAX_BYTES = 4_900_000


def make_count_size_trigger(
    max_count: int = MAX_COUNT,
    max_bytes: int = MAX_BYTES,
    max_delay_ms: int | None = None,
):
    """Returns the applyInPandasWithState function for count/size-triggered
    batch sealing: rows accumulate per key; whenever adding a row would
    exceed max_count records or max_bytes bytes, the open batch seals and a
    summary row is emitted (the reference's Add→ErrBatchTooBig→Send cycle,
    kinesis_writer.go:52-76). With ``max_delay_ms`` set, an idle key's open
    batch also seals after that long without new rows — the reference's
    MaxDelay flush timer (kinesis_writer.go:142-147) — via the state
    timeout's hasTimedOut branch."""

    def trigger_fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            # Flush-on-idle: seal whatever is open. batch_no must survive
            # the flush — removing the state would restart numbering at 0
            # and a later batch would reuse an already-emitted
            # (key, batch_no) identity. The emptied counter lingers for a
            # cleanup grace (10× the flush delay, min 60 s) and is only
            # dropped by a timeout that finds NOTHING open — so numbering
            # is continuous across any idle gap shorter than the grace,
            # and dead keys still cannot hold state forever.
            batch_no, n_records, n_bytes = state.get if state.exists else (0, 0, 0)
            if n_records:
                state.update((batch_no + 1, 0, 0))
                if max_delay_ms is not None:
                    state.setTimeoutDuration(max(10 * max_delay_ms, 60_000))
                yield pd.DataFrame(
                    [(key[0], batch_no, n_records, n_bytes)],
                    columns=["key", "batch_no", "n_records", "n_bytes"],
                )
            else:
                state.remove()
            return
        batch_no, n_records, n_bytes = state.get if state.exists else (0, 0, 0)
        sealed = []
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                size = int(row.n_bytes)
                if n_records and (
                    n_records + 1 > max_count or n_bytes + size > max_bytes
                ):
                    # would-overflow seal — only for a NON-empty batch (a
                    # single over-limit row otherwise emitted a phantom
                    # 0-record summary before landing in the next batch)
                    sealed.append((key[0], batch_no, n_records, n_bytes))
                    batch_no += 1
                    n_records, n_bytes = 0, 0
                n_records += 1
                n_bytes += size
                if n_records >= max_count or n_bytes >= max_bytes:
                    # seal AT the limit, not one row later: an exactly-full
                    # batch with no successor row must still emit (without
                    # this, max_delay_ms=None would hold it open forever)
                    sealed.append((key[0], batch_no, n_records, n_bytes))
                    batch_no += 1
                    n_records, n_bytes = 0, 0
        state.update((batch_no, n_records, n_bytes))
        if max_delay_ms is not None:
            # open batch → flush timer; NOTHING open (an at-limit seal just
            # emptied it) → the long cleanup grace. Arming the short timer
            # on an empty counter would let its timeout's remove() discard
            # batch_no after only the flush delay — and the next batch
            # would reuse an already-emitted (key, batch_no) identity.
            state.setTimeoutDuration(
                max_delay_ms if n_records else max(10 * max_delay_ms, 60_000)
            )
        if sealed:
            yield pd.DataFrame(sealed, columns=["key", "batch_no", "n_records", "n_bytes"])

    return trigger_fn


def count_size_trigger(
    df,
    max_count: int = MAX_COUNT,
    max_bytes: int = MAX_BYTES,
    max_delay_ms: int | None = None,
):
    """df must have (key, n_bytes); emits sealed-batch summaries.

    Without ``max_delay_ms``, NoTimeout applies: the key space here is the
    sink-batch routing key (bounded, typically stream/shard names), so
    state is O(#keys) and an open batch simply waits for more rows. With
    ``max_delay_ms``, idle keys flush their open batch after that delay
    (processing-time timeout), matching the reference's MaxDelay contract —
    the right mode for unbounded or long-tailed key spaces."""
    return df.groupBy("key").applyInPandasWithState(
        make_count_size_trigger(max_count, max_bytes, max_delay_ms),
        outputStructType=TRIGGER_OUTPUT_SCHEMA,
        stateStructType=TRIGGER_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout
        if max_delay_ms is None
        else GroupStateTimeout.ProcessingTimeTimeout,
    )
