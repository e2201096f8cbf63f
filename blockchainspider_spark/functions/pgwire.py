"""K7: a from-scratch PostgreSQL wire-protocol (v3) client with the
COPY bulk-load path.

The reference persists items through SQLAlchemy models
(plugins/database/models.py:14-36). The Spark-shaped equivalent of an
ORM insert loop is a bulk sink: this module speaks the actual frontend/
backend protocol — StartupMessage, AuthenticationOk / cleartext-
password handling, the simple-query cycle ('Q' → CommandComplete →
ReadyForQuery), and ``COPY table FROM STDIN`` streaming (CopyInResponse
→ CopyData rows in text format with the documented escaping → CopyDone)
— which is Postgres's fastest ingest path and the one a 100-TB sink
would actually use. Only a live server stays environment-gated; the
bytes are pinned against a loopback backend in tests/test_pgwire.py.

Scale shape: ``write_pg_copy`` runs one connection per partition via
``foreachPartition``, rows streamed straight from the Arrow batches;
the driver only issues the one-time DDL.
"""

from __future__ import annotations

import socket
import struct
from collections.abc import Iterable, Iterator

PROTOCOL_V3 = 196608  # (3 << 16)


class PgError(OSError):
    pass


def _msg(tag: bytes, payload: bytes) -> bytes:
    return tag + struct.pack(">I", len(payload) + 4) + payload


def _cstr(s: str) -> bytes:
    return s.encode("utf-8") + b"\x00"


def _recv_exact(sock: socket.socket, n: int) -> bytes:
    buf = b""
    while len(buf) < n:
        chunk = sock.recv(n - len(buf))
        if not chunk:
            raise PgError(f"server closed mid-message ({len(buf)}/{n})")
        buf += chunk
    return buf


def read_message(sock: socket.socket) -> tuple[bytes, bytes]:
    """One backend message → (type byte, payload)."""
    tag = _recv_exact(sock, 1)
    (size,) = struct.unpack(">I", _recv_exact(sock, 4))
    return tag, _recv_exact(sock, size - 4)


def copy_escape(v) -> str:
    """COPY text-format field: NULL → \\N; escape backslash, tab,
    newline, carriage return (the documented text-format grammar)."""
    if v is None:
        return "\\N"
    if isinstance(v, (bytes, bytearray, memoryview)):
        # BYTEA hex input format — str() would emit the Python repr
        return "\\\\x" + bytes(v).hex()
    s = str(v)
    return (s.replace("\\", "\\\\").replace("\t", "\\t")
            .replace("\n", "\\n").replace("\r", "\\r"))


class PgClient:
    """Minimal frontend: startup + simple query + COPY IN."""

    def __init__(self, host: str, port: int = 5432, user: str = "postgres",
                 database: str = "postgres", password: str = "",
                 timeout: float = 10.0):
        self.sock = socket.create_connection((host, port), timeout=timeout)
        try:
            params = _cstr("user") + _cstr(user) + _cstr("database") + _cstr(database) + b"\x00"
            payload = struct.pack(">I", PROTOCOL_V3) + params
            self.sock.sendall(struct.pack(">I", len(payload) + 4) + payload)
            while True:
                tag, body = read_message(self.sock)
                if tag == b"R":
                    (code,) = struct.unpack_from(">I", body, 0)
                    if code == 0:
                        continue                      # AuthenticationOk
                    if code == 3:                     # cleartext password
                        self.sock.sendall(_msg(b"p", _cstr(password)))
                        continue
                    raise PgError(f"unsupported auth method {code}")
                if tag == b"S" or tag == b"K":
                    continue                          # ParameterStatus / BackendKeyData
                if tag == b"Z":
                    break                             # ReadyForQuery
                if tag == b"E":
                    raise PgError(f"startup error: {body!r}")
                raise PgError(f"unexpected startup message {tag!r}")
        except BaseException:
            self.sock.close()
            raise

    def query(self, sql: str) -> str:
        """Simple-query cycle; returns the CommandComplete tag (row
        data from SELECTs is drained and discarded — this is a sink)."""
        self.sock.sendall(_msg(b"Q", _cstr(sql)))
        tag_text = ""
        while True:
            tag, body = read_message(self.sock)
            if tag == b"C":
                tag_text = body.rstrip(b"\x00").decode()
            elif tag == b"E":
                # drain to ReadyForQuery, then raise
                while read_message(self.sock)[0] != b"Z":
                    pass
                raise PgError(f"query failed: {body!r}")
            elif tag == b"Z":
                return tag_text
            # 'T'/'D'/'N' row data + notices: drained

    def copy_in(self, table: str, columns: list[str],
                rows: Iterable[tuple]) -> int:
        """COPY table(cols) FROM STDIN: stream rows in text format,
        return the count from the server's CommandComplete tag."""
        cols = ", ".join(columns)
        self.sock.sendall(_msg(b"Q", _cstr(f"COPY {table} ({cols}) FROM STDIN")))
        tag, body = read_message(self.sock)
        if tag != b"G":
            if tag == b"E":
                while read_message(self.sock)[0] != b"Z":
                    pass
                raise PgError(f"COPY rejected: {body!r}")
            raise PgError(f"expected CopyInResponse, got {tag!r}")
        n = 0
        buf = bytearray()
        for row in rows:
            buf += ("\t".join(copy_escape(v) for v in row) + "\n").encode("utf-8")
            n += 1
            if len(buf) >= 65536:
                self.sock.sendall(_msg(b"d", bytes(buf)))
                buf.clear()
        if buf:
            self.sock.sendall(_msg(b"d", bytes(buf)))
        self.sock.sendall(_msg(b"c", b""))            # CopyDone
        tag_text = ""
        while True:
            tag, body = read_message(self.sock)
            if tag == b"C":
                tag_text = body.rstrip(b"\x00").decode()
            elif tag == b"E":
                while read_message(self.sock)[0] != b"Z":
                    pass
                raise PgError(f"COPY failed: {body!r}")
            elif tag == b"Z":
                break
        if not tag_text.startswith("COPY"):
            raise PgError(f"unexpected COPY completion tag {tag_text!r}")
        return int(tag_text.split()[1]) if " " in tag_text else n

    def close(self) -> None:
        try:
            self.sock.sendall(_msg(b"X", b""))        # Terminate
        finally:
            self.sock.close()


def write_pg_copy(df, host: str, port: int, table: str,
                  user: str = "postgres", database: str = "postgres",
                  password: str = "", create: bool = True) -> None:
    """K7 bulk sink: one-time DDL from the driver (sinks.table_ddl type
    discipline), then COPY per partition — rows never pass through the
    driver."""
    from blockchainspider_spark.operators.sinks import table_ddl

    columns = list(df.columns)
    if create:
        ddl_client = PgClient(host, port, user=user, database=database,
                              password=password)
        try:
            ddl_client.query(table_ddl(df, table))
        finally:
            ddl_client.close()

    def sink(rows: Iterator) -> None:
        it = iter(rows)
        first = next(it, None)
        if first is None:
            return
        client = PgClient(host, port, user=user, database=database,
                          password=password)
        try:
            client.copy_in(table, columns,
                           (tuple(r[c] for c in columns) for r in [first, *it]))
        finally:
            client.close()

    df.foreachPartition(sink)
