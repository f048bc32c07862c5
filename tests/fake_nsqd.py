"""Minimal in-process nsqd speaking the public NSQ TCP protocol subset the
engine's source uses (V2 magic, SUB/RDY/FIN/REQ/TOUCH/NOP/CLS).

Protocol framing per https://nsq.io/clients/tcp_protocol_spec.html:
frame = size(int32 BE) + frame_type(int32 BE) + payload;
message payload = ts_ns(int64) + attempts(uint16) + id(16 ascii) + body.

Models a single topic+channel the way nsqd does:

- one shared pending queue; concurrent consumer connections of the channel
  are load-balanced (each delivery goes to exactly one connection with RDY
  budget) — this is what makes multi-partition source tests meaningful;
- RDY is a per-connection budget decremented per delivery (a deferred-ack
  consumer must re-issue RDY to keep flowing, like real nsqd);
- delivered messages sit in-flight until FIN; msg_timeout (or consumer
  disconnect, or explicit REQ) requeues them with attempts+1 — the
  redelivery path the engine's at-least-once restart contract relies on;
- TOUCH resets the in-flight deadline;
- ids listed in ``deliver_twice`` are sent twice on first delivery
  (duplicate-delivery noise for dedup tests).
"""

from __future__ import annotations

import socket
import struct
import threading
import time
from collections import deque


def _frame(ftype: int, payload: bytes) -> bytes:
    return struct.pack(">ii", len(payload) + 4, ftype) + payload


def _message_frame(msg_id: str, body: bytes, attempts: int = 1) -> bytes:
    payload = (
        struct.pack(">q", time.time_ns())
        + struct.pack(">H", attempts)
        + msg_id.encode("ascii")
        + body
    )
    return _frame(2, payload)


class FakeNsqd(threading.Thread):
    """Fake nsqd for one topic+channel; see module docstring for semantics.

    ``messages`` is a list of (msg_id, body). Observable state for tests:
    ``finished`` (FINed ids, in order), ``requeued`` (ids REQed by
    consumers), ``n_connections``, ``subscribed``.
    """

    def __init__(
        self,
        messages: list[tuple[str, bytes]],
        deliver_twice: set[str] | None = None,
        msg_timeout_s: float = 3.0,
        port: int = 0,
    ):
        super().__init__(daemon=True)
        self.deliver_twice = deliver_twice or set()
        self.msg_timeout_s = msg_timeout_s
        self.finished: list[str] = []
        self.requeued: list[str] = []
        self.touched: list[str] = []
        self.subscribed: tuple[str, str] | None = None
        self.n_connections = 0
        self._lock = threading.Lock()
        # pending: FIFO of (msg_id, body, attempts) awaiting delivery
        self._pending: deque[tuple[str, bytes, int]] = deque(
            (mid, body, 1) for mid, body in messages
        )
        # in-flight: msg_id -> (body, attempts, deadline, conn_id)
        self._in_flight: dict[str, tuple[bytes, int, float, int]] = {}
        # REQ with delay parks messages here until ready_time
        self._deferred: list[tuple[float, str, bytes, int]] = []
        self._fin_set: set[str] = set()
        self._dup_sent: set[str] = set()
        self.server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        # port=0 → ephemeral; a fixed port lets a test "restart nsqd" at
        # the same address a consumer is configured with
        self.server.bind(("127.0.0.1", port))
        self.server.listen(8)
        self.addr = f"127.0.0.1:{self.server.getsockname()[1]}"
        self._stop = threading.Event()

    # -- channel state transitions (all under self._lock) --

    def _requeue_locked(self, msg_id: str, front: bool = True) -> None:
        body, attempts, _dl, _cid = self._in_flight.pop(msg_id)
        if msg_id in self._fin_set:
            return
        item = (msg_id, body, attempts + 1)
        self._pending.appendleft(item) if front else self._pending.append(item)

    def _expire_locked(self) -> None:
        now = time.monotonic()
        for mid, (_b, _a, deadline, _c) in list(self._in_flight.items()):
            if deadline <= now:
                self._requeue_locked(mid)
        still = []
        for ready, mid, body, attempts in self._deferred:
            if ready <= now:
                if mid not in self._fin_set:
                    self._pending.append((mid, body, attempts + 1))
            else:
                still.append((ready, mid, body, attempts))
        self._deferred = still

    def _next_for_delivery_locked(self, conn_id: int) -> tuple[str, bytes, int] | None:
        while self._pending:
            mid, body, attempts = self._pending.popleft()
            if mid in self._fin_set:
                continue
            deadline = time.monotonic() + self.msg_timeout_s
            self._in_flight[mid] = (body, attempts, deadline, conn_id)
            return mid, body, attempts
        return None

    def run(self) -> None:
        self.server.settimeout(0.1)
        while not self._stop.is_set():
            with self._lock:
                self._expire_locked()
            try:
                conn, _ = self.server.accept()
            except (TimeoutError, socket.timeout):
                continue
            except OSError:
                return
            self.n_connections += 1
            threading.Thread(
                target=self._serve, args=(conn, self.n_connections), daemon=True
            ).start()

    def _serve(self, conn: socket.socket, conn_id: int) -> None:
        conn.settimeout(0.1)
        buf = b""
        rdy = 0

        def read_more() -> bool:
            nonlocal buf
            try:
                chunk = conn.recv(4096)
            except (TimeoutError, socket.timeout):
                return True
            except OSError:
                return False
            if not chunk:
                return False
            buf += chunk
            return True

        try:
            # magic
            while len(buf) < 4 and not self._stop.is_set():
                if not read_more():
                    return
            if buf[:4] != b"  V2":
                return
            buf = buf[4:]

            while not self._stop.is_set():
                # drain any complete command lines
                while b"\n" in buf:
                    line, buf = buf.split(b"\n", 1)
                    parts = line.decode("ascii").split(" ")
                    cmd = parts[0]
                    if cmd == "SUB":
                        self.subscribed = (parts[1], parts[2])
                        conn.sendall(_frame(0, b"OK"))
                    elif cmd == "RDY":
                        rdy = int(parts[1])
                    elif cmd == "FIN":
                        with self._lock:
                            self._fin_set.add(parts[1])
                            self._in_flight.pop(parts[1], None)
                        self.finished.append(parts[1])
                    elif cmd == "REQ":
                        delay_ms = int(parts[2]) if len(parts) > 2 else 0
                        with self._lock:
                            if parts[1] in self._in_flight:
                                body, attempts, _dl, _c = self._in_flight.pop(parts[1])
                                self._deferred.append(
                                    (
                                        time.monotonic() + delay_ms / 1000.0,
                                        parts[1],
                                        body,
                                        attempts,
                                    )
                                )
                        self.requeued.append(parts[1])
                    elif cmd == "TOUCH":
                        self.touched.append(parts[1])
                        with self._lock:
                            if parts[1] in self._in_flight:
                                body, attempts, _dl, cid = self._in_flight[parts[1]]
                                self._in_flight[parts[1]] = (
                                    body,
                                    attempts,
                                    time.monotonic() + self.msg_timeout_s,
                                    cid,
                                )
                    elif cmd == "CLS":
                        try:
                            conn.sendall(_frame(0, b"CLOSE_WAIT"))
                        except OSError:
                            # client sent CLS and closed without reading the
                            # ack — same as real nsqd seeing EPIPE on a
                            # closing connection; nothing to clean up here
                            pass
                        return
                # deliver while this connection has RDY budget
                while rdy > 0:
                    with self._lock:
                        self._expire_locked()
                        nxt = self._next_for_delivery_locked(conn_id)
                    if nxt is None:
                        break
                    mid, body, attempts = nxt
                    conn.sendall(_message_frame(mid, body, attempts=attempts))
                    rdy -= 1
                    if mid in self.deliver_twice and mid not in self._dup_sent:
                        self._dup_sent.add(mid)
                        conn.sendall(_message_frame(mid, body, attempts=attempts + 1))
                if not read_more():
                    return
        finally:
            # consumer went away: its un-FINned in-flight requeues (what a
            # real nsqd does on client disconnect)
            with self._lock:
                for mid, (_b, _a, _d, cid) in list(self._in_flight.items()):
                    if cid == conn_id:
                        self._requeue_locked(mid)
            conn.close()

    def stop(self) -> None:
        self._stop.set()
        self.server.close()
