"""NSQ streaming source as a PySpark Python DataSource (DataSource V2 API).

Replaces the reference's go-nsq consumer wiring (reference main.go:61-75,
122-126) with a Spark-native source:

    spark.dataSource.register(NsqDataSource)
    df = (spark.readStream.format("nsq")
          .option("topic", "events").option("channel", "spark")
          .option("nsqd_tcp_address", "127.0.0.1:4150")
          .load())

Offset / replay contract (SURVEY.md §7 hard-part #1): NSQ has no replay —
messages not FINished redeliver after the server's msg-timeout. We use
``SimpleDataSourceStreamReader``, whose prefetch-and-cache contract keeps
read batches in the checkpoint until committed; ``commit(offset)`` FINs the
messages consumed up to that offset, giving at-least-once end-to-end (the
reference's own guarantee, §2A op14; dedup downstream absorbs redelivery).

The NSQ TCP wire protocol spoken here (V2 magic, SUB/RDY/FIN/REQ/TOUCH/
NOP, 4-byte size + frame-type framing, 26-byte message header) is the
public protocol documented at https://nsq.io/clients/tcp_protocol_spec.html.

Two reader tiers, same schema and at-least-once contract:

- default: ``SimpleDataSourceStreamReader`` — one connection on the
  driver; simplest, fine for modest topics.
- ``.option("partitioned", "true")`` (+ ``num_partitions``): full
  ``DataSourceStreamReader`` — N executor-side connections consuming the
  same channel in parallel (nsqd load-balances a channel across its
  connections), mirroring the reference's 20 concurrent handlers
  (main.go:122). This is the 100 TB ingest path: the driver only issues
  batch seqs and the committed watermark; all socket I/O is on executors.
"""

from __future__ import annotations

import socket
import struct
import time
from datetime import datetime, timezone

import pyspark.cloudpickle as _cloudpickle
from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# The registered DataSource is pickled into Spark's dedicated Python
# planner/worker processes, which don't import user packages from disk.
# Pickle this module by value so the classes travel inside the pickle —
# no PYTHONPATH/--py-files coupling for the source.
import sys as _sys

from .. import observability as _obs

_cloudpickle.register_pickle_by_value(_sys.modules[__name__])
_cloudpickle.register_pickle_by_value(_obs)

FRAME_TYPE_RESPONSE = 0
FRAME_TYPE_ERROR = 1
FRAME_TYPE_MESSAGE = 2

# Requeue policy (reference main.go:66-67: DefaultRequeueDelay = 1 s with a
# jittered backoff; go-nsq's MaxAttempts default of 5 for the dead-letter
# cap). Overridable per source via options of the same names.
DEFAULT_REQUEUE_BASE_MS = 1000
DEFAULT_REQUEUE_MAX_MS = 60_000
DEFAULT_MAX_ATTEMPTS = 5


def requeue_delay_ms(
    msg_id: str,
    attempts: int,
    base_ms: int = DEFAULT_REQUEUE_BASE_MS,
    max_ms: int = DEFAULT_REQUEUE_MAX_MS,
) -> int:
    """Exponential backoff with half-jitter: delay ∈ [exp/2, exp) where
    exp = min(base · 2^(attempts−1), max).

    A persistently failing batch (poison message, sink outage) must not
    hot-loop REQ → instant redelivery → fail; the delay grows with the
    server-reported delivery ``attempts``. Jitter decorrelates the retry
    times of messages that failed together (same motive as full-jitter
    backoff, but keeping a ≥exp/2 floor so the first retry is never
    near-immediate). The jitter fraction is derived from
    crc32(msg_id:attempts) rather than a PRNG: uniform enough across ids,
    and deterministic so retry schedules are reproducible under test."""
    import zlib

    shift = min(max(attempts - 1, 0), 20)
    exp = min(base_ms << shift, max_ms)
    half = exp // 2
    frac = (zlib.crc32(f"{msg_id}:{attempts}".encode()) & 0xFFFFFFFF) / 2**32
    return half + int((exp - half) * frac)


def requeue_failed(
    conn: "NsqConnection",
    failed: list[tuple[str, int]],
    base_ms: int,
    max_ms: int,
    max_attempts: int,
) -> int:
    """REQ each failed (msg_id, attempts) with backoff; messages at the
    attempts cap are dead-lettered instead — FINed (removed from the
    queue) and logged as a structured ``dead_letter`` event, the go-nsq
    MaxAttempts → LogFailedMessage → FIN contract. Returns the number
    dead-lettered. A poison message therefore makes exactly
    ``max_attempts`` delivery attempts, each spaced further apart, then
    leaves the queue without blocking the healthy stream."""
    n_dead = 0
    for msg_id, attempts in failed:
        if attempts >= max_attempts:
            conn.finish(msg_id)
            n_dead += 1
            _obs.log_event(
                "nsq_source", "dead_letter", msg_id=msg_id, attempts=attempts
            )
        else:
            conn.requeue(
                msg_id, delay_ms=requeue_delay_ms(msg_id, attempts, base_ms, max_ms)
            )
    return n_dead

MESSAGE_SCHEMA = StructType(
    [
        StructField("message_id", StringType()),
        StructField("body", BinaryType()),
        StructField("ts", TimestampType()),
        StructField("attempts", IntegerType()),
        StructField("key", StringType()),
    ]
)


class NsqConnection:
    """Minimal NSQ TCP client: SUB → RDY → stream of messages + FIN acks.

    All socket reads land in ``self._buf`` and frames are only parsed once
    complete, so a poll timeout that fires mid-frame (between the 4-byte
    size and the payload) leaves the partial bytes buffered for the next
    poll instead of desynchronizing the stream."""

    # nsqd's default heartbeat interval is 30 s; go-nsq declares a
    # connection dead after ~2 missed heartbeats. 70 s = 2 intervals plus
    # margin. This catches HALF-OPEN connections (silent network
    # partition: no RST, recv just times out forever, sends land in the
    # local buffer) that no socket error would ever surface — without the
    # deadline the reader would poll a dead socket for the kernel's
    # ~15-minute retransmission timeout before noticing.
    STALE_AFTER_S = 70.0

    def __init__(self, addr: str, topic: str, channel: str, rdy: int = 200) -> None:
        host, port = addr.rsplit(":", 1)
        self.sock = socket.create_connection((host, int(port)), timeout=10)
        self._buf = bytearray()
        self._rdy = rdy
        self._last_frame = time.monotonic()
        self.sock.sendall(b"  V2")
        self._command(f"SUB {topic} {channel}\n".encode(), expect_response=True)
        self._command(f"RDY {rdy}\n".encode())

    def _command(self, cmd: bytes, expect_response: bool = False) -> None:
        self.sock.sendall(cmd)
        if expect_response:
            ftype, payload = self._read_frame()
            if ftype == FRAME_TYPE_ERROR:
                raise RuntimeError(f"nsqd error: {payload!r}")

    def _recv_more(self, timeout: float) -> bool:
        """Pull whatever bytes are available into the buffer. Returns False
        on timeout (buffer left as-is, possibly holding a partial frame)."""
        self.sock.settimeout(timeout)
        try:
            chunk = self.sock.recv(65536)
        except (TimeoutError, socket.timeout):
            return False
        if not chunk:
            raise ConnectionError("nsqd closed connection")
        self._buf += chunk
        return True

    def _try_parse_frame(self) -> tuple[int, bytes] | None:
        """Pop one complete frame off the buffer, or None if incomplete."""
        if len(self._buf) < 4:
            return None
        size = struct.unpack(">i", bytes(self._buf[:4]))[0]
        if len(self._buf) < 4 + size:
            return None
        payload = bytes(self._buf[4 : 4 + size])
        del self._buf[: 4 + size]
        self._last_frame = time.monotonic()  # any frame proves liveness
        return struct.unpack(">i", payload[:4])[0], payload[4:]

    def _read_frame(self, timeout: float = 10.0) -> tuple[int, bytes]:
        """Blocking read of one frame (used for command responses)."""
        deadline = time.monotonic() + timeout
        while True:
            frame = self._try_parse_frame()
            if frame is not None:
                return frame
            remaining = deadline - time.monotonic()
            if remaining <= 0 or not self._recv_more(remaining):
                raise TimeoutError("timed out waiting for nsqd frame")

    def poll(self, max_messages: int, max_wait_s: float) -> list[tuple[str, bytes, datetime, int]]:
        """Drain up to max_messages within max_wait_s. Replies NOP to
        heartbeats. Returns (id, body, ts, attempts).

        RDY is re-issued on every poll: nsqd decrements the ready count per
        delivery and deferred-ack FINs never restore it, so a
        set-RDY-once consumer silently starves after the first
        ready-count's worth of messages."""
        if time.monotonic() - self._last_frame > self.STALE_AFTER_S:
            raise ConnectionError(
                f"no frame (not even a heartbeat) from nsqd in "
                f"{self.STALE_AFTER_S:.0f}s — connection presumed half-open"
            )
        self.sock.sendall(f"RDY {self._rdy}\n".encode())
        out: list[tuple[str, bytes, datetime, int]] = []
        deadline = time.monotonic() + max_wait_s
        while len(out) < max_messages:
            frame = self._try_parse_frame()
            if frame is None:
                remaining = deadline - time.monotonic()
                if remaining <= 0 or not self._recv_more(remaining):
                    break  # partial bytes stay buffered for the next poll
                continue
            ftype, payload = frame
            if ftype == FRAME_TYPE_MESSAGE:
                ts_ns = struct.unpack(">q", payload[:8])[0]
                attempts = struct.unpack(">H", payload[8:10])[0]
                msg_id = payload[10:26].decode("ascii")
                body = payload[26:]
                ts = datetime.fromtimestamp(ts_ns / 1e9, tz=timezone.utc).replace(tzinfo=None)
                out.append((msg_id, body, ts, attempts))
            elif ftype == FRAME_TYPE_RESPONSE and payload == b"_heartbeat_":
                self.sock.sendall(b"NOP\n")
            elif ftype == FRAME_TYPE_ERROR:
                # Ack races are non-fatal: FIN/REQ/TOUCH for a message the
                # server already timed out just means it will redeliver
                # (at-least-once noise, absorbed downstream).
                if not payload.startswith(
                    (b"E_FIN_FAILED", b"E_REQ_FAILED", b"E_TOUCH_FAILED")
                ):
                    raise RuntimeError(f"nsqd error frame: {payload!r}")
        self.sock.settimeout(10)
        return out

    def finish(self, msg_id: str) -> None:
        self.sock.sendall(f"FIN {msg_id}\n".encode())

    def requeue(self, msg_id: str, delay_ms: int = 0) -> None:
        """REQ: return an un-acked message to the queue after delay_ms —
        immediate redelivery instead of waiting out the server msg-timeout
        (reference kinesis_writer.go:114-126 failed-slot requeue)."""
        self.sock.sendall(f"REQ {msg_id} {delay_ms}\n".encode())

    def touch(self, msg_id: str) -> None:
        """TOUCH: reset the server-side msg-timeout for a long-running
        batch so it isn't requeued mid-processing (reference main.go:65-67
        relies on a raised MsgTimeout for the same purpose)."""
        self.sock.sendall(f"TOUCH {msg_id}\n".encode())

    def close(self) -> None:
        try:
            self.sock.sendall(b"CLS\n")
        finally:
            self.sock.close()


class NsqStreamReader(SimpleDataSourceStreamReader):
    """Prefetch-and-cache reader: each read() drains currently-available
    messages; commit(offset) FINs everything consumed up to that offset
    (deferred ack — the reference's DisableAutoResponse + sink-side Finish,
    handler.go:19 / kinesis_writer.go:114-126)."""

    def __init__(self, options: dict) -> None:
        self.addr = options.get("nsqd_tcp_address", "127.0.0.1:4150")
        self.topic = options["topic"]
        self.channel = options.get("channel", "spark")
        self.batch_size = int(options.get("max_records_per_trigger", "1000"))
        self.poll_wait_s = float(options.get("poll_wait_s", "0.5"))
        self.requeue_base_ms = int(options.get("requeue_base_ms", DEFAULT_REQUEUE_BASE_MS))
        self.requeue_max_ms = int(options.get("requeue_max_ms", DEFAULT_REQUEUE_MAX_MS))
        self.max_attempts = int(options.get("max_attempts", DEFAULT_MAX_ATTEMPTS))
        self.dead_lettered = 0
        self._conn: NsqConnection | None = None
        # seq → [(msg_id, attempts)] awaiting FIN (attempts kept for the
        # requeue-backoff / dead-letter decision on batch failure)
        self._pending: dict[int, list[tuple[str, int]]] = {}

    def _connection(self) -> NsqConnection:
        if self._conn is None:
            self._conn = NsqConnection(self.addr, self.topic, self.channel, rdy=self.batch_size)
        return self._conn

    def _reset_connection(self) -> None:
        """Drop a dead connection and all its per-connection ack state.

        Pending (un-FINned) message ids are only meaningful on the
        connection that delivered them — after a disconnect nsqd requeues
        that connection's in-flight messages itself, so clearing `_pending`
        loses nothing: the same messages redeliver on the next connection
        (at-least-once; duplicates absorbed by the dedup operator). The
        reference inherits this behavior from go-nsq's automatic
        reconnect+redelivery (main.go:61-68 config, nsq.io protocol)."""
        if self._conn is not None:
            try:
                self._conn.sock.close()
            except OSError:
                pass
            self._conn = None
        self._pending.clear()

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def read(self, start: dict):
        seq = start["seq"]
        try:
            conn = self._connection()
            if seq in self._pending:
                # Re-reading a seq whose previous attempt never committed
                # (the batch failed downstream): REQ that attempt's
                # messages with attempts-scaled backoff — immediate enough
                # not to wait out the server msg-timeout, delayed enough
                # not to hot-loop on a poison message; past the attempts
                # cap they dead-letter (reference kinesis_writer.go:114-126
                # + main.go:66-67).
                self.dead_lettered += requeue_failed(
                    conn,
                    self._pending.pop(seq),
                    self.requeue_base_ms,
                    self.requeue_max_ms,
                    self.max_attempts,
                )
            # Batches polled but not yet committed are still being
            # processed — TOUCH resets their msg-timeout so a slow sink
            # doesn't trigger spurious redelivery mid-flight (reference
            # main.go:65-67).
            for ids in self._pending.values():
                for msg_id, _attempts in ids:
                    conn.touch(msg_id)
            msgs = conn.poll(self.batch_size, self.poll_wait_s)
        except (ConnectionError, OSError) as e:
            # nsqd went away (restart, network blip): reconnect on the
            # next micro-batch instead of failing the query — go-nsq
            # semantics. This batch is empty; un-FINned messages redeliver.
            # Logged so a PERMANENT failure (typo'd address → gaierror
            # every batch) is visible as a stream of these events rather
            # than indistinguishable from a quiet topic.
            _obs.log_event(
                "nsq_source", "connection_lost", addr=self.addr, error=str(e)
            )
            self._reset_connection()
            return iter([]), {"seq": seq + 1}
        self._pending[seq] = [(m[0], m[3]) for m in msgs]
        rows = [(m[0], m[1], m[2], m[3], None) for m in msgs]
        return iter(rows), {"seq": seq + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        """Replay of an uncommitted batch after a restart.

        NSQ has no offset-addressed replay: messages from the crashed run
        that were never FINed are still unacked server-side and redeliver
        on this (new) connection after the server's msg-timeout. Returning
        an empty iterator here is therefore correct for the at-least-once
        contract — the same rows arrive again in a later batch — and it
        keeps the restart from poisoning the checkpoint (the default
        implementation raises PySparkNotImplementedError, which would fail
        the replayed batch forever; reference recovery analog:
        kinesis_writer.go:114-126 requeue + main.go:66 MsgTimeout)."""
        return iter([])

    def commit(self, end: dict) -> None:
        # FIN every message from batches strictly before the committed seq.
        # After a restart the replayed batch has no pending entries — skip
        # connecting just to FIN nothing.
        to_fin = sorted(k for k in self._pending if k < end["seq"])
        if not to_fin:
            return
        try:
            conn = self._connection()
            for seq in to_fin:
                for msg_id, _attempts in self._pending.pop(seq):
                    conn.finish(msg_id)
        except (ConnectionError, OSError) as e:
            # Connection died before the acks landed: the un-FINned
            # messages redeliver after msg-timeout and the dedup operator
            # absorbs them — at-least-once, not at-most-once, so dropping
            # the FINs is safe and failing the query here is not.
            _obs.log_event(
                "nsq_source", "commit_connection_lost", addr=self.addr, error=str(e)
            )
            self._reset_connection()


class NsqInputPartition(InputPartition):
    """One executor-side NSQ consumer slot for one microbatch. Carries the
    batch's seq and the driver's committed watermark so the executor knows
    which earlier batches' messages are safe to FIN."""

    def __init__(self, pid: int, batch_seq: int, committed_seq: int, rdy: int) -> None:
        self.pid = pid
        self.batch_seq = batch_seq
        self.committed_seq = committed_seq
        self.rdy = rdy


class _ExecutorConsumer:
    """Per-(source, partition) consumer living in an executor Python worker
    process, persisting across microbatch tasks via the builtins-anchored
    cache (_executor_consumers below) — Spark reuses worker processes, so
    in steady state each partition keeps one long-lived connection, like
    one of the reference's 20 concurrent handlers, main.go:122."""

    def __init__(self, addr: str, topic: str, channel: str, rdy: int) -> None:
        self.conn = NsqConnection(addr, topic, channel, rdy=rdy)
        # batch_seq -> [(msg_id, attempts)]
        self.pending: dict[int, list[tuple[str, int]]] = {}
        self.dead_lettered = 0
        self.last_used = time.monotonic()


# A stopped/restarted query's consumers are never read again, but their
# sockets would otherwise stay open until nsqd's missed-heartbeat
# disconnect. Entries idle this long are closed by whichever task next
# runs in the same worker; their un-FINned messages redeliver (the normal
# at-least-once orphan path).
CONSUMER_IDLE_EVICT_S = 300.0


def _evict_idle_consumers(
    consumers: dict, now: float, ttl_s: float = CONSUMER_IDLE_EVICT_S
) -> None:
    # Only consumers with no message awaiting FIN are evictable: a live
    # query with a trigger interval longer than the TTL legitimately
    # leaves its consumer idle between micro-batches, and closing it
    # while batches await their deferred FIN would redeliver EVERY batch
    # forever (the FIN rides the delivering connection). A truly orphaned
    # consumer with pending messages stops answering heartbeats, so nsqd
    # reaps the connection itself; the dead cache entry then fails its
    # next use (if any) and is dropped by read()'s ConnectionError path.
    # NOTE: read() always records a batch entry (possibly an EMPTY list on
    # a quiet topic), so the check must be "no message ids anywhere", not
    # "dict empty" — the latter never holds for an abandoned consumer.
    for key in [
        k
        for k, c in consumers.items()
        if now - c.last_used > ttl_s and not any(c.pending.values())
    ]:
        stale = consumers.pop(key)
        try:
            stale.conn.close()
        except OSError:
            pass


def _executor_consumers() -> dict[tuple, _ExecutorConsumer]:
    """Process-global consumer cache for executor Python workers.

    This module travels pickled BY VALUE (see register_pickle_by_value
    above), so a plain module global would be rebuilt on every task
    deserialization — connections and pending-FIN state would die with
    each task and no FIN would ever be sent. Anchoring the dict on
    ``builtins`` (always imported, never re-created) makes it genuinely
    process-scoped: it survives across microbatch tasks in a reused
    worker, which is what keeps one long-lived connection per partition."""
    import builtins

    cache = getattr(builtins, "_nsq2kinesis_executor_consumers", None)
    if cache is None:
        cache = {}
        builtins._nsq2kinesis_executor_consumers = cache
    return cache


class NsqPartitionedStreamReader(DataSourceStreamReader):
    """Executor-parallel NSQ reader: N partitions → N nsqd connections
    consuming the same channel (nsqd load-balances a channel's messages
    across its connections — the reference's AddConcurrentHandlers(h, 20),
    main.go:122, is the same fan-out inside one process).

    At-least-once without offset replay (same contract as the simple
    reader): each executor task polls its partition's connection, the
    driver embeds the committed batch watermark in the NEXT batch's
    partitions, and the executor FINs a batch's messages only once that
    watermark passes it — deferred ack, one batch of lag. Whenever the
    partition→worker-process mapping shifts (task retry, worker churn,
    restart), the orphaned connection's un-FINned messages redeliver via
    NSQ msg-timeout to whichever connection now serves the channel, and
    the downstream dedup stage absorbs the duplicates. FIN must ride the
    connection that received the message, so cross-worker acks are
    impossible by protocol — redelivery-plus-dedup is the NSQ-native
    recovery path, not a shortcut."""

    def __init__(self, options: dict) -> None:
        self.addr = options.get("nsqd_tcp_address", "127.0.0.1:4150")
        self.topic = options["topic"]
        self.channel = options.get("channel", "spark")
        self.num_partitions = int(options.get("num_partitions", "4"))
        self.batch_size = int(options.get("max_records_per_trigger", "1000"))
        self.poll_wait_s = float(options.get("poll_wait_s", "0.5"))
        self.requeue_base_ms = int(options.get("requeue_base_ms", DEFAULT_REQUEUE_BASE_MS))
        self.requeue_max_ms = int(options.get("requeue_max_ms", DEFAULT_REQUEUE_MAX_MS))
        self.max_attempts = int(options.get("max_attempts", DEFAULT_MAX_ATTEMPTS))
        # Namespaces the executor-side consumer cache. Default "" shares
        # consumers per (addr, topic, channel, pid) ACROSS query restarts —
        # that is what lets a restart replaying a batch into a still-alive
        # worker find its pending map and REQ the failed attempt instead of
        # waiting out msg-timeout. Two CONCURRENT queries on the same
        # topic+channel in one app (a degenerate config — they'd split the
        # stream anyway) must set distinct ids to keep their pending-FIN
        # maps disjoint; there is no Spark-provided stable query id visible
        # to a Python DataSource, so this is an explicit option rather than
        # an inferred one.
        self.instance_id = options.get("consumer_instance_id", "")
        self._seq = 0
        self._committed = 0

    # -- driver side --

    def initialOffset(self) -> dict:
        return {"seq": 0}

    def latestOffset(self) -> dict:
        self._seq += 1
        return {"seq": self._seq}

    def partitions(self, start: dict, end: dict) -> list[NsqInputPartition]:
        # On restart self._seq resumes behind the checkpoint; keep issuing
        # offsets ahead of the replayed batch.
        self._seq = max(self._seq, end["seq"])
        per_part = max(1, self.batch_size // self.num_partitions)
        return [
            NsqInputPartition(i, start["seq"], self._committed, per_part)
            for i in range(self.num_partitions)
        ]

    def commit(self, end: dict) -> None:
        self._committed = end["seq"]

    def stop(self) -> None:
        pass

    # -- executor side --

    def read(self, partition: NsqInputPartition):
        consumers = _executor_consumers()
        _evict_idle_consumers(consumers, time.monotonic())
        key = (self.addr, self.topic, self.channel, self.instance_id, partition.pid)
        consumer = consumers.get(key)
        if consumer is None:
            try:
                consumer = _ExecutorConsumer(
                    self.addr, self.topic, self.channel, partition.rdy
                )
            except (ConnectionError, OSError) as e:
                # broker down (restart in progress): this batch is empty;
                # the next task retries the connection — failing the TASK
                # here would fail the whole query on a transient outage
                _obs.log_event(
                    "nsq_source",
                    "connect_failed",
                    addr=self.addr,
                    partition=partition.pid,
                    error=str(e),
                )
                return iter([])
            consumers[key] = consumer
        consumer.last_used = time.monotonic()
        try:
            # ack batches the driver has committed (deferred FIN)
            for seq in sorted(s for s in consumer.pending if s < partition.committed_seq):
                for msg_id, _attempts in consumer.pending.pop(seq):
                    consumer.conn.finish(msg_id)
            if partition.batch_seq in consumer.pending:
                # This batch seq ran before on this consumer and never
                # committed (task retry, or a crash-restart replaying the
                # batch into a still-alive worker): REQ the failed
                # attempt's messages with attempts-scaled backoff — sooner
                # than msg-timeout, but never a hot loop; past the cap
                # they dead-letter (reference kinesis_writer.go:114-126 +
                # main.go:66-67).
                consumer.dead_lettered += requeue_failed(
                    consumer.conn,
                    consumer.pending.pop(partition.batch_seq),
                    self.requeue_base_ms,
                    self.requeue_max_ms,
                    self.max_attempts,
                )
            # keep not-yet-committed batches alive while the sink works
            for ids in consumer.pending.values():
                for msg_id, _attempts in ids:
                    consumer.conn.touch(msg_id)
            msgs = consumer.conn.poll(partition.rdy, self.poll_wait_s)
        except (ConnectionError, OSError) as e:
            # Reconnect on the next task; this connection's un-FINned
            # messages redeliver via msg-timeout (at-least-once holds).
            _obs.log_event(
                "nsq_source",
                "connection_lost",
                addr=self.addr,
                partition=partition.pid,
                error=str(e),
            )
            consumers.pop(key, None)
            try:
                consumer.conn.sock.close()
            except OSError:
                pass
            return iter([])
        consumer.pending[partition.batch_seq] = [(m[0], m[3]) for m in msgs]
        return iter([(m[0], m[1], m[2], m[3], None) for m in msgs])


class NsqDataSource(DataSource):
    """``spark.readStream.format("nsq")`` — options: topic, channel,
    nsqd_tcp_address, max_records_per_trigger, poll_wait_s, requeue_base_ms
    / requeue_max_ms / max_attempts (failed-batch backoff + dead-letter
    policy), partitioned=true (+ num_partitions) for the executor-parallel
    reader, and consumer_instance_id to namespace the executor consumer
    cache when several partitioned queries share one topic+channel."""

    @classmethod
    def name(cls) -> str:
        return "nsq"

    def schema(self) -> StructType:
        return MESSAGE_SCHEMA

    def streamReader(self, schema: StructType) -> NsqPartitionedStreamReader:
        if self.options.get("partitioned", "false").lower() != "true":
            # Signals pyspark's _streamReader to fall back to the simple
            # driver-side reader below.
            from pyspark.errors import PySparkNotImplementedError

            raise PySparkNotImplementedError(
                errorClass="NOT_IMPLEMENTED",
                messageParameters={"feature": "streamReader"},
            )
        return NsqPartitionedStreamReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> NsqStreamReader:
        return NsqStreamReader(self.options)
