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

import sys as _sys
from collections.abc import Iterator
from typing import Any

import pandas as pd
import pyspark.cloudpickle as _cloudpickle
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

# transformWithState ships the StatefulProcessor CLASS to a dedicated
# Python driver worker that doesn't import user packages from disk —
# pickle this module by value so the class travels inside the pickle
# (same contract as sources/nsq.py's DataSource classes). The
# applyInPandasWithState closures never needed this: cloudpickle
# serializes closures by value already.
_cloudpickle.register_pickle_by_value(_sys.modules[__name__])

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
                # refresh on every sighting — but never BACKWARD: a late
                # out-of-order record must not regress the mark, or a
                # duplicate arriving ttl_s after the LATE record (yet
                # within ttl_s of the true latest sighting) leaks through
                last_seen = ts_s if last_seen is None else max(last_seen, ts_s)
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


try:  # Spark 4 transformWithState API. Two gates: the API itself, and
    # google.protobuf — the TWS state-server protocol is protobuf-framed
    # (pyspark/sql/streaming/proto/StateMessage_pb2) and crashes the
    # dedicated driver worker without it. protobuf is absent from this
    # image, so the backend is import-gated exactly like the optional
    # codec path in functions/multimodal.py: implementation + equivalence
    # test ship now, the test runs wherever the dependency exists.
    from google.protobuf import descriptor as _pb_descriptor  # noqa: F401
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    HAS_TRANSFORM_WITH_STATE = True
except ImportError:  # pragma: no cover - protobuf not in this image
    StatefulProcessor = object  # type: ignore[assignment,misc]
    HAS_TRANSFORM_WITH_STATE = False


class TtlDedupProcessor(StatefulProcessor):
    """``transformWithState`` backend of the generational dedup — same
    semantics as ``make_dedup_fn`` (keep iff unseen or last sighting
    ≥ ttl_s ago in EVENT time; every sighting refreshes), but state
    EVICTION is delegated to the state store's native TTL
    (``getValueState(..., ttlDurationMs)``) instead of a hand-rolled
    timeout branch — the store's TTL is precisely the reference's
    generational Trim (deduper.go:42-47) done by the engine. This is the
    forward API: per-state-variable TTL, composable state types, and
    RocksDB-native expiry at scale."""

    def __init__(self, ttl_s: int = DEDUP_TTL_S) -> None:
        self.ttl_s = ttl_s

    def init(self, handle: "StatefulProcessorHandle") -> None:
        self._last = handle.getValueState(
            "last_seen", DEDUP_STATE_SCHEMA, ttlDurationMs=self.ttl_s * 1000
        )

    def handleInputRows(self, key, rows, timerValues: "TimerValues"):
        value = self._last.get() if self._last.exists() else None
        last_seen = value[0] if value is not None else None
        kept = []
        for pdf in rows:
            for row in pdf.sort_values("ts").itertuples(index=False):
                ts_s = row.ts.timestamp()
                if last_seen is None or (ts_s - last_seen) >= self.ttl_s:
                    kept.append((row.body_hash, row.message_id, row.ts))
                # never regress on late out-of-order records (see dedup_fn)
                last_seen = ts_s if last_seen is None else max(last_seen, ts_s)
        self._last.update((last_seen,))
        if kept:
            yield pd.DataFrame(kept, columns=["body_hash", "message_id", "ts"])

    def close(self) -> None:
        pass


def generational_dedup_tws(df, ttl_s: int = DEDUP_TTL_S):
    """generational_dedup on the transformWithState API (Spark 4) — drop-in
    output-equivalent alternative to the applyInPandasWithState form."""
    return df.groupBy("body_hash").transformWithStateInPandas(
        statefulProcessor=TtlDedupProcessor(ttl_s),
        outputStructType=DEDUP_OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="ProcessingTime",
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
