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
horizontally; at 100 TB switch the state store to RocksDB).
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
    """

    def dedup_fn(
        key: tuple[Any, ...], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.hasTimedOut:
            state.remove()
            return
        (last_seen,) = state.get if state.exists else (None,)
        kept = []
        for pdf in pdfs:
            for row in pdf.sort_values("ts").itertuples(index=False):
                ts_s = row.ts.timestamp()
                if last_seen is None or (ts_s - last_seen) >= ttl_s:
                    kept.append((row.body_hash, row.message_id, row.ts))
                last_seen = ts_s  # refresh on every sighting
        state.update((last_seen,))
        state.setTimeoutDuration(ttl_s * 1000)
        if kept:
            yield pd.DataFrame(kept, columns=["body_hash", "message_id", "ts"])

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
            # flush-on-idle: seal whatever is open, then drop the state
            batch_no, n_records, n_bytes = state.get if state.exists else (0, 0, 0)
            state.remove()
            if n_records:
                yield pd.DataFrame(
                    [(key[0], batch_no, n_records, n_bytes)],
                    columns=["key", "batch_no", "n_records", "n_bytes"],
                )
            return
        batch_no, n_records, n_bytes = state.get if state.exists else (0, 0, 0)
        sealed = []
        for pdf in pdfs:
            for row in pdf.itertuples(index=False):
                size = int(row.n_bytes)
                if n_records + 1 > max_count or n_bytes + size > max_bytes:
                    sealed.append((key[0], batch_no, n_records, n_bytes))
                    batch_no += 1
                    n_records, n_bytes = 0, 0
                n_records += 1
                n_bytes += size
        state.update((batch_no, n_records, n_bytes))
        if max_delay_ms is not None:
            state.setTimeoutDuration(max_delay_ms)
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
