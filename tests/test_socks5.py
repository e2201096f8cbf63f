"""S17 SOCKS5 hop: the RFC 1928 client against a loopback SOCKS5
server tunneling to a loopback HTTP server — the protocol is real and
fully exercised; only the actual Tor daemon stays environment-gated
(reference middlewares/tor.py:13-72)."""

import http.server
import socket
import socketserver
import threading

import pytest

from blockchainspider_spark.functions.socks5 import (
    FETCH_SCHEMA,
    Socks5Error,
    http_get_over_socks5,
    socks5_connect,
    socks5_fetch_kernel,
)


class _Http(http.server.BaseHTTPRequestHandler):
    def do_GET(self):  # noqa: N802 — stdlib handler name
        if self.path.startswith("/chunked"):
            # hand-rolled chunked framing (with a chunk extension) so the
            # client's de-chunker is exercised against real RFC 9112 bytes
            self.send_response(200)
            self.send_header("Transfer-Encoding", "chunked")
            self.end_headers()
            self.wfile.write(b"6\r\nhello:\r\n")
            tail = self.path.encode()
            self.wfile.write(b"%x;ext=1\r\n%s\r\n" % (len(tail), tail))
            self.wfile.write(b"0\r\nX-Trailer: t\r\n\r\n")
            return
        body = f"hello:{self.path}".encode()
        self.send_response(200)
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def log_message(self, *a):
        pass


class _Socks5Handler(socketserver.BaseRequestHandler):
    """Server side of RFC 1928: no-auth negotiation, CONNECT with
    DOMAIN/IPv4 address types, success or refused reply, then raw
    byte tunneling. Records each CONNECT for assertions."""

    def handle(self):
        s = self.request
        ver, nmeth = s.recv(2)
        assert ver == 5
        s.recv(nmeth)
        s.sendall(b"\x05\x00")  # no-auth
        ver, cmd, _rsv, atyp = s.recv(4)
        assert ver == 5 and cmd == 1
        if atyp == 3:
            (alen,) = s.recv(1)
            host = s.recv(alen).decode()
        elif atyp == 1:
            host = socket.inet_ntoa(s.recv(4))
        else:
            s.sendall(b"\x05\x08\x00\x01" + b"\x00" * 6)
            return
        port = int.from_bytes(s.recv(2), "big")
        self.server.connects.append((atyp, host, port))
        try:
            upstream = socket.create_connection((host, port), timeout=5)
        except OSError:
            s.sendall(b"\x05\x05\x00\x01" + b"\x00" * 6)  # connection refused
            return
        s.sendall(b"\x05\x00\x00\x01" + b"\x00" * 6)
        # bidirectional pump until either side closes
        def pump(src, dst):
            try:
                while True:
                    data = src.recv(65536)
                    if not data:
                        break
                    dst.sendall(data)
            except OSError:
                pass
            finally:
                try:
                    dst.shutdown(socket.SHUT_WR)
                except OSError:
                    pass

        t = threading.Thread(target=pump, args=(upstream, s), daemon=True)
        t.start()
        pump(s, upstream)
        t.join(timeout=5)
        upstream.close()


@pytest.fixture(scope="module")
def loopback():
    httpd = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _Http)
    socksd = socketserver.ThreadingTCPServer(("127.0.0.1", 0), _Socks5Handler)
    socksd.connects = []
    for srv in (httpd, socksd):
        threading.Thread(target=srv.serve_forever, daemon=True).start()
    yield httpd.server_address[1], socksd.server_address[1], socksd
    httpd.shutdown()
    socksd.shutdown()


def test_connect_uses_domain_addressing(loopback):
    http_port, socks_port, socksd = loopback
    sock = socks5_connect("127.0.0.1", socks_port, "localhost", http_port)
    sock.close()
    atyp, host, port = socksd.connects[-1]
    # DOMAIN type always: the proxy resolves names (the .onion contract)
    assert (atyp, host, port) == (3, "localhost", http_port)


def test_http_get_through_tunnel(loopback):
    http_port, socks_port, _ = loopback
    status, body = http_get_over_socks5(
        f"http://127.0.0.1:{http_port}/page1", ("127.0.0.1", socks_port))
    assert status == 200
    assert body == b"hello:/page1"


def test_chunked_transfer_encoding_dechunked(loopback):
    http_port, socks_port, _ = loopback
    status, body = http_get_over_socks5(
        f"http://127.0.0.1:{http_port}/chunked/a", ("127.0.0.1", socks_port))
    assert status == 200
    # framing bytes (hex sizes, CRLFs, extension, trailer) must NOT leak
    assert body == b"hello:/chunked/a"


def test_dechunk_rejects_malformed_framing():
    from blockchainspider_spark.functions.socks5 import _dechunk

    assert _dechunk(b"3\r\nabc\r\n0\r\n\r\n") == b"abc"
    with pytest.raises(Socks5Error, match="chunk size"):
        _dechunk(b"zz\r\nabc\r\n0\r\n\r\n")
    with pytest.raises(Socks5Error, match="cut short"):
        _dechunk(b"10\r\nabc\r\n")
    with pytest.raises(Socks5Error, match="missing data CRLF"):
        _dechunk(b"3\r\nabcXX0\r\n\r\n")


def test_idna_hostname_goes_as_punycode(loopback):
    _, socks_port, socksd = loopback
    # the proxy can't resolve it (refused reply), but the DOMAIN field
    # must carry the IDNA (punycode) form — raw UTF-8 is unresolvable
    with pytest.raises(Socks5Error):
        socks5_connect("127.0.0.1", socks_port, "bücher.example", 80)
    atyp, host, _ = socksd.connects[-1]
    assert (atyp, host) == (3, "xn--bcher-kva.example")


def test_ascii_hostname_bypasses_idna_codec(loopback):
    _, socks_port, socksd = loopback
    # '_' is rejected by the idna codec but is a legal-enough DNS label
    # in the wild — ASCII names must pass through verbatim
    with pytest.raises(Socks5Error):
        socks5_connect("127.0.0.1", socks_port, "my_host.example", 80)
    assert socksd.connects[-1][1] == "my_host.example"


def test_connect_refused_maps_to_rfc_name(loopback):
    _, socks_port, _ = loopback
    # port 1 on loopback: nothing listens — server replies REP=5
    with pytest.raises(Socks5Error, match="connection refused"):
        socks5_connect("127.0.0.1", socks_port, "127.0.0.1", 1)


def test_non_socks_peer_rejected(loopback):
    http_port, _, _ = loopback
    # an HTTP server is not a SOCKS5 proxy: it waits for a full request
    # line our 3-byte greeting never completes, so the client times out
    # (a peer that replies garbage raises Socks5Error on the version
    # byte instead — both are OSError)
    with pytest.raises(OSError):
        socks5_connect("127.0.0.1", http_port, "127.0.0.1", 80, timeout=1.0)


def test_spark_fetch_kernel_end_to_end(spark, loopback):
    http_port, socks_port, _ = loopback
    urls = spark.createDataFrame(
        [(f"http://127.0.0.1:{http_port}/doc{i}",) for i in range(6)]
        + [("http://127.0.0.1:1/refused",)],
        "url string",
    )
    out = urls.mapInPandas(
        socks5_fetch_kernel(("127.0.0.1", socks_port)), FETCH_SCHEMA
    ).collect()
    rows = {r.url: r for r in out}
    assert len(rows) == 7
    for i in range(6):
        r = rows[f"http://127.0.0.1:{http_port}/doc{i}"]
        assert r.status == 200 and bytes(r.body) == f"hello:/doc{i}".encode()
        assert r.err is None
    bad = rows["http://127.0.0.1:1/refused"]
    assert bad.status is None and "connection refused" in bad.err
