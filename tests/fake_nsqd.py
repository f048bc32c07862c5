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
    """One-connection fake nsqd. ``messages`` is a list of (msg_id, body);
    ids listed in ``deliver_twice`` are sent twice (redelivery simulation).
    """

    def __init__(self, messages: list[tuple[str, bytes]], deliver_twice: set[str] | None = None):
        super().__init__(daemon=True)
        self.messages = messages
        self.deliver_twice = deliver_twice or set()
        self.finished: list[str] = []
        self.subscribed: tuple[str, str] | None = None
        self.server = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self.server.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self.server.bind(("127.0.0.1", 0))
        self.server.listen(1)
        self.addr = f"127.0.0.1:{self.server.getsockname()[1]}"
        self._stop = threading.Event()

    def run(self) -> None:
        conn, _ = self.server.accept()
        conn.settimeout(0.2)
        buf = b""

        def read_more() -> bool:
            nonlocal buf
            try:
                chunk = conn.recv(4096)
            except (TimeoutError, socket.timeout):
                return True
            if not chunk:
                return False
            buf += chunk
            return True

        # magic
        while len(buf) < 4 and not self._stop.is_set():
            if not read_more():
                return
        assert buf[:4] == b"  V2", buf[:4]
        buf = buf[4:]

        delivered = False
        while not self._stop.is_set():
            if b"\n" not in buf:
                if not read_more():
                    return
                continue
            line, buf = buf.split(b"\n", 1)
            parts = line.decode("ascii").split(" ")
            cmd = parts[0]
            if cmd == "SUB":
                self.subscribed = (parts[1], parts[2])
                conn.sendall(_frame(0, b"OK"))
            elif cmd == "RDY" and not delivered:
                delivered = True
                for msg_id, body in self.messages:
                    conn.sendall(_message_frame(msg_id, body))
                    if msg_id in self.deliver_twice:
                        conn.sendall(_message_frame(msg_id, body, attempts=2))
            elif cmd == "FIN":
                self.finished.append(parts[1])
            elif cmd == "CLS":
                conn.sendall(_frame(0, b"CLOSE_WAIT"))
                break
        conn.close()

    def stop(self) -> None:
        self._stop.set()
        self.server.close()
