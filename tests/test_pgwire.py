"""K7 Postgres wire protocol: the from-scratch frontend against a
loopback backend that parses the real v3 message grammar (startup,
cleartext auth, simple query, COPY IN with text-format escaping)."""

import socketserver
import struct
import threading

import pytest

from blockchainspider_spark.functions.pgwire import (
    PgClient,
    PgError,
    copy_escape,
    read_message,
    write_pg_copy,
)


def _msg(tag: bytes, payload: bytes) -> bytes:
    return tag + struct.pack(">I", len(payload) + 4) + payload


class _Backend(socketserver.BaseRequestHandler):
    """Server side: demands a cleartext password, then serves the
    simple-query and COPY-IN cycles. Records SQL and copied rows."""

    def handle(self):
        s = self.request
        (size,) = struct.unpack(">I", s.recv(4))
        startup = s.recv(size - 4)
        (proto,) = struct.unpack_from(">I", startup, 0)
        assert proto == 196608
        params = dict(zip(*[iter(startup[4:-1].decode().split("\x00"))] * 2))
        assert params["user"] == "u1"
        self.server.databases.append(params["database"])
        s.sendall(_msg(b"R", struct.pack(">I", 3)))        # cleartext password
        tag, body = read_message(s)
        assert tag == b"p" and body == b"pw\x00"
        s.sendall(_msg(b"R", struct.pack(">I", 0)))        # AuthenticationOk
        s.sendall(_msg(b"S", b"server_version\x0016.0\x00"))
        s.sendall(_msg(b"Z", b"I"))
        while True:
            try:
                tag, body = read_message(s)
            except OSError:
                return
            if tag == b"X":
                return
            assert tag == b"Q"
            sql = body.rstrip(b"\x00").decode()
            self.server.queries.append(sql)
            if sql.upper().startswith("COPY"):
                s.sendall(_msg(b"G", b"\x00" + struct.pack(">H", 0)))
                data = b""
                while True:
                    tag, body = read_message(s)
                    if tag == b"d":
                        data += body
                    elif tag == b"c":
                        break
                rows = [ln.split("\t") for ln in data.decode().splitlines()]
                self.server.copied.extend(rows)
                s.sendall(_msg(b"C", f"COPY {len(rows)}\x00".encode()))
            else:
                s.sendall(_msg(b"C", b"CREATE TABLE\x00"))
            s.sendall(_msg(b"Z", b"I"))


@pytest.fixture()
def backend():
    srv = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _Backend)
    srv.queries, srv.copied, srv.databases = [], [], []
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield srv.server_address[1], srv
    srv.shutdown()


def test_startup_auth_query_copy(backend):
    port, srv = backend
    c = PgClient("127.0.0.1", port, user="u1", database="db9", password="pw")
    assert c.query("CREATE TABLE t (a TEXT)") == "CREATE TABLE"
    n = c.copy_in("t", ["a", "b"], [
        ("plain", 1),
        ("tab\there", None),                 # escaping + NULL
        ("line\nbreak", "back\\slash"),
    ])
    c.close()
    assert n == 3
    assert srv.databases == ["db9"]
    assert srv.copied == [
        ["plain", "1"],
        ["tab\\there", "\\N"],
        ["line\\nbreak", "back\\\\slash"],
    ]


def test_copy_escape_grammar():
    assert copy_escape(None) == "\\N"
    assert copy_escape("a\tb\nc\rd\\e") == "a\\tb\\nc\\rd\\\\e"
    # binary values go as PostgreSQL hex-format bytea, not the Python
    # repr: field text \x0a1b (escaped backslash on the COPY wire)
    assert copy_escape(b"\x0a\x1b") == "\\\\x0a1b"
    assert copy_escape(bytearray(b"\xff")) == "\\\\xff"
    assert copy_escape(memoryview(b"\x00")) == "\\\\x00"


def test_dead_port_raises():
    with pytest.raises(OSError):
        PgClient("127.0.0.1", 1, user="u1")


def test_spark_write_pg_copy(spark, backend):
    """K7 end-to-end: DDL once from the driver (table_ddl type
    discipline), then per-partition COPY streams every row."""
    port, srv = backend
    df = spark.createDataFrame(
        [(i, f"0x{i:x}", float(i) / 2) for i in range(9)],
        "n long, addr string, score double",
    ).coalesce(2)
    write_pg_copy(df, "127.0.0.1", port, "transfers",
                  user="u1", database="db9", password="pw")
    assert any(q.startswith("CREATE TABLE IF NOT EXISTS transfers") and
               "n BIGINT" in q and "addr TEXT" in q and
               "score DOUBLE PRECISION" in q for q in srv.queries)
    got = sorted(int(r[0]) for r in srv.copied)
    assert got == list(range(9))
