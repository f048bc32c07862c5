"""Minimal in-process nsqd speaking the public NSQ TCP protocol subset the
engine's source uses (V2 magic, SUB/RDY/FIN/NOP/CLS, heartbeats off).

Protocol framing per https://nsq.io/clients/tcp_protocol_spec.html:
frame = size(int32 BE) + frame_type(int32 BE) + payload;
message payload = ts_ns(int64) + attempts(uint16) + id(16 ascii) + body.

Supports scripted duplicate delivery (simulating NSQ redelivery) so tests
can assert the pipeline's dedup stage absorbs at-least-once noise.
"""

from __future__ import annotations

import socket
import struct
import threading
import time


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
    """Fake nsqd accepting any number of sequential/concurrent consumer
    connections. ``messages`` is a list of (msg_id, body); ids listed in
    ``deliver_twice`` are sent twice on first delivery (redelivery noise).

    NSQ redelivery semantics: each new connection's RDY receives every
    message not yet FINished — so a consumer that reconnects (e.g. a
    restarted streaming query) sees exactly the messages it never acked,
    like a real nsqd re-queueing after client disconnect.
    """

    def __init__(self, messages: list[tuple[str, bytes]], deliver_twice: set[str] | None = None):
        super().__init__(daemon=True)
        self.messages = messages
        self.deliver_twice = deliver_twice or set()
        self.finished: list[str] = []
        self.subscribed: tuple[str, str] | None = None
        self.n_connections = 0
        self.server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.server.bind(("127.0.0.1", 0))
        self.server.listen(4)
        self.addr = f"127.0.0.1:{self.server.getsockname()[1]}"
        self._stop = threading.Event()

    def run(self) -> None:
        self.server.settimeout(0.2)
        while not self._stop.is_set():
            try:
                conn, _ = self.server.accept()
            except (TimeoutError, socket.timeout):
                continue
            except OSError:
                return
            self.n_connections += 1
            threading.Thread(target=self._serve, args=(conn,), daemon=True).start()

    def _serve(self, conn: socket.socket) -> None:
        conn.settimeout(0.2)
        buf = b""

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

        # magic
        while len(buf) < 4 and not self._stop.is_set():
            if not read_more():
                return
        if buf[:4] != b"  V2":
            conn.close()
            return
        buf = buf[4:]

        delivered = False
        while not self._stop.is_set():
            if b"\n" not in buf:
                if not read_more():
                    break
                continue
            line, buf = buf.split(b"\n", 1)
            parts = line.decode("ascii").split(" ")
            cmd = parts[0]
            if cmd == "SUB":
                self.subscribed = (parts[1], parts[2])
                conn.sendall(_frame(0, b"OK"))
            elif cmd == "RDY" and not delivered:
                delivered = True
                fin = set(self.finished)
                for msg_id, body in self.messages:
                    if msg_id in fin:
                        continue  # acked — a real nsqd never redelivers these
                    attempts = 1 if self.n_connections == 1 else 2
                    conn.sendall(_message_frame(msg_id, body, attempts=attempts))
                    if msg_id in self.deliver_twice and self.n_connections == 1:
                        conn.sendall(_message_frame(msg_id, body, attempts=2))
            elif cmd == "FIN":
                self.finished.append(parts[1])
            elif cmd == "CLS":
                try:
                    conn.sendall(_frame(0, b"CLOSE_WAIT"))
                finally:
                    break
        conn.close()

    def stop(self) -> None:
        self._stop.set()
        self.server.close()
