"""K6: a from-scratch AMQP 0-9-1 publisher (the RabbitMQ wire protocol).

The reference publishes every item as a JSON message with routing key
``<prefix>.<ItemClass>`` through pika (plugins/rabbit/pipelines.py:24-60).
This module implements the client side of the protocol itself with
stdlib sockets — protocol header, Connection.Start/Tune/Open and
Channel.Open negotiation (PLAIN auth, empty client-properties table),
``Basic.Publish`` as the method + content-header + content-body frame
triple, frame-max-aware body splitting, and clean Connection.Close —
so the only thing environment-gated is a live broker; the bytes on the
wire are real and pinned against a loopback AMQP server in
tests/test_amqp.py (which asserts the exact frame grammar a broker
would parse).

Scale shape: one connection per executor partition
(``foreachPartition``), messages streamed frame-by-frame — the driver
never sees a message body, matching the sinks.publish_to_queue
contract.
"""

from __future__ import annotations

import socket
import struct
from collections.abc import Iterable

PROTOCOL_HEADER = b"AMQP\x00\x00\x09\x01"

FRAME_METHOD = 1
FRAME_HEADER = 2
FRAME_BODY = 3
FRAME_END = 0xCE

CLASS_CONNECTION = 10
CLASS_CHANNEL = 20
CLASS_BASIC = 60

METH_CONN_START, METH_CONN_START_OK = 10, 11
METH_CONN_TUNE, METH_CONN_TUNE_OK = 30, 31
METH_CONN_OPEN, METH_CONN_OPEN_OK = 40, 41
METH_CONN_CLOSE, METH_CONN_CLOSE_OK = 50, 51
METH_CHAN_OPEN, METH_CHAN_OPEN_OK = 10, 11
METH_CHAN_CLOSE, METH_CHAN_CLOSE_OK = 40, 41
METH_BASIC_PUBLISH = 40


class AmqpError(OSError):
    pass


def _shortstr(s: str) -> bytes:
    b = s.encode("utf-8")
    if len(b) > 255:
        raise AmqpError("shortstr longer than 255 bytes")
    return bytes([len(b)]) + b


def _longstr(b: bytes) -> bytes:
    return struct.pack(">I", len(b)) + b


def _frame(ftype: int, channel: int, payload: bytes) -> bytes:
    return struct.pack(">BHI", ftype, channel, len(payload)) + payload + bytes([FRAME_END])


def _method(channel: int, class_id: int, method_id: int, args: bytes = b"") -> bytes:
    return _frame(FRAME_METHOD, channel, struct.pack(">HH", class_id, method_id) + args)


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise AmqpError(f"peer closed mid-frame ({len(buf)}/{n})")
        buf += chunk
    return buf


def read_frame(sock: socket.socket) -> tuple[int, int, bytes]:
    """One frame off the wire → (type, channel, payload)."""
    ftype, channel, size = struct.unpack(">BHI", _recv_exact(sock, 7))
    payload = _recv_exact(sock, size)
    (end,) = _recv_exact(sock, 1)
    if end != FRAME_END:
        raise AmqpError(f"missing frame-end octet (got {end:#x})")
    return ftype, channel, payload


def _raise_broker_close(cid: int, mid: int, args: bytes) -> None:
    """Channel.Close / Connection.Close args: reply-code (short),
    reply-text (shortstr), offending class-id + method-id. Surface the
    broker's own words instead of a method-mismatch error."""
    (reply_code,) = struct.unpack_from(">H", args, 0)
    tlen = args[2]
    reply_text = args[3:3 + tlen].decode("utf-8", "replace")
    fcid, fmid = struct.unpack_from(">HH", args, 3 + tlen)
    scope = "connection" if cid == CLASS_CONNECTION else "channel"
    raise AmqpError(
        f"broker closed the {scope}: reply-code={reply_code} "
        f"reply-text={reply_text!r} (offending method {fcid}.{fmid})"
    )


def _expect_method(sock: socket.socket, class_id: int, method_id: int) -> bytes:
    ftype, _chan, payload = read_frame(sock)
    if ftype != FRAME_METHOD:
        raise AmqpError(f"expected method frame, got type {ftype}")
    cid, mid = struct.unpack_from(">HH", payload, 0)
    if (cid, mid) != (class_id, method_id):
        if (cid, mid) in ((CLASS_CONNECTION, METH_CONN_CLOSE), (CLASS_CHANNEL, METH_CHAN_CLOSE)):
            _raise_broker_close(cid, mid, payload[4:])
        raise AmqpError(f"expected method {class_id}.{method_id}, got {cid}.{mid}")
    return payload[4:]


class AmqpPublisher:
    """Minimal publish-only AMQP 0-9-1 client: connect → negotiate →
    ``publish()`` any number of messages on channel 1 → ``close()``."""

    def __init__(self, host: str, port: int = 5672, user: str = "guest",
                 password: str = "guest", vhost: str = "/", timeout: float = 10.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        self.frame_max = 131072
        try:
            self.sock.sendall(PROTOCOL_HEADER)
            _expect_method(self.sock, CLASS_CONNECTION, METH_CONN_START)
            # Start-Ok: empty client-properties table, PLAIN response
            args = struct.pack(">I", 0)                       # client-properties
            args += _shortstr("PLAIN")
            args += _longstr(b"\x00" + user.encode() + b"\x00" + password.encode())
            args += _shortstr("en_US")
            self.sock.sendall(_method(0, CLASS_CONNECTION, METH_CONN_START_OK, args))
            tune = _expect_method(self.sock, CLASS_CONNECTION, METH_CONN_TUNE)
            channel_max, frame_max, heartbeat = struct.unpack_from(">HIH", tune, 0)
            self.frame_max = min(frame_max or 131072, 131072)
            self.sock.sendall(_method(
                0, CLASS_CONNECTION, METH_CONN_TUNE_OK,
                struct.pack(">HIH", channel_max, self.frame_max, 0)))  # heartbeat off
            self.sock.sendall(_method(
                0, CLASS_CONNECTION, METH_CONN_OPEN,
                _shortstr(vhost) + _shortstr("") + b"\x00"))
            _expect_method(self.sock, CLASS_CONNECTION, METH_CONN_OPEN_OK)
            self.sock.sendall(_method(1, CLASS_CHANNEL, METH_CHAN_OPEN, _shortstr("")))
            _expect_method(self.sock, CLASS_CHANNEL, METH_CHAN_OPEN_OK)
        except BaseException:
            self.sock.close()
            raise

    def _poll_broker_frames(self) -> None:
        """Drain any broker-initiated frames without blocking. Publish
        is async in AMQP, so an error (e.g. publish to a nonexistent
        exchange) arrives as an unsolicited Channel.Close/
        Connection.Close — surface it here with the broker's
        reply-code/reply-text instead of dropping later messages
        silently and failing confusingly at close()."""
        import select

        while True:
            readable, _, _ = select.select([self.sock], [], [], 0)
            if not readable:
                return
            ftype, _chan, payload = read_frame(self.sock)
            if ftype != FRAME_METHOD:
                continue  # stray heartbeat/body frame: ignore
            cid, mid = struct.unpack_from(">HH", payload, 0)
            if (cid, mid) in ((CLASS_CONNECTION, METH_CONN_CLOSE), (CLASS_CHANNEL, METH_CHAN_CLOSE)):
                _raise_broker_close(cid, mid, payload[4:])

    def publish(self, exchange: str, routing_key: str, body: bytes,
                content_type: str = "application/json") -> None:
        """Basic.Publish: method frame, content header (content-type +
        delivery-mode 2 = persistent), body split at frame-max. Checks
        for pending broker-initiated Close frames first."""
        self._poll_broker_frames()
        self.sock.sendall(_method(
            1, CLASS_BASIC, METH_BASIC_PUBLISH,
            struct.pack(">H", 0) + _shortstr(exchange) + _shortstr(routing_key)
            + b"\x00"))  # mandatory/immediate bits clear
        # property flags: content-type (1<<15) + delivery-mode (1<<12)
        props = _shortstr(content_type) + bytes([2])
        header = struct.pack(">HHQH", CLASS_BASIC, 0, len(body), (1 << 15) | (1 << 12)) + props
        self.sock.sendall(_frame(FRAME_HEADER, 1, header))
        max_chunk = self.frame_max - 8  # frame overhead
        # zero-length content sends the header only, no body frame
        for off in range(0, len(body), max_chunk):
            self.sock.sendall(_frame(FRAME_BODY, 1, body[off:off + max_chunk]))

    def close(self) -> None:
        try:
            self._poll_broker_frames()  # surface a pending async Close first
            self.sock.sendall(_method(
                0, CLASS_CONNECTION, METH_CONN_CLOSE,
                struct.pack(">H", 0) + _shortstr("") + struct.pack(">HH", 0, 0)))
            _expect_method(self.sock, CLASS_CONNECTION, METH_CONN_CLOSE_OK)
        finally:
            self.sock.close()


def publish_partition(rows: Iterable, host: str, port: int, exchange: str,
                      user: str = "guest", password: str = "guest") -> int:
    """foreachPartition body: one connection per partition, one
    Basic.Publish per (routing_key, body) row. Returns messages sent
    (for tests; Spark discards it)."""
    it = iter(rows)
    first = next(it, None)
    if first is None:
        return 0
    pub = AmqpPublisher(host, port, user=user, password=password)
    sent = 0
    try:
        for row in [first, *it]:
            pub.publish(exchange, row.routing_key, row.body.encode("utf-8"))
            sent += 1
    finally:
        pub.close()
    return sent
