"""WARC 1.1 (ISO 28500) record codec + SURT keys for the crawl tier.

The reference crawler (BlockchainSpider's web spiders, e.g.
spiders/labels/web.py) keeps fetched pages only as in-flight Scrapy
responses; an archival crawl at 10^10-URL scale persists them as WARC —
the interchange format every large public crawl (Common Crawl, IA)
ships, one gzip member per record so readers can random-access records
by byte offset. This module is the pure-bytes core (shared by the
Spark source/sink in sources/warc.py and by tests): a strict writer and
a strict parser for the subset of WARC 1.1 the crawl engine emits —
``warcinfo``, ``request`` and ``response`` records with
``application/http`` blocks — plus the SURT canonical key used by the
CDX index.

Determinism contract (same argument as operators/multimodal.py's
augment seeds): record IDs are urn:uuid values derived from
md5(type, target-uri, date), NOT random UUIDs, so a re-run, a task
retry, or a second engine produces byte-identical archives.

Grammar notes (warc-specifications / ISO 28500 §4):
- record = version line ``WARC/1.1`` CRLF, named fields, CRLF,
  Content-Length block bytes, CRLF CRLF.
- field names are case-insensitive; a line starting with SP/HT is a
  continuation of the previous field's value (folding).
- ``WARC-Payload-Digest`` is ``sha1:`` + RFC 4648 base32 of the HTTP
  payload (the bytes AFTER the HTTP header block), not of the block.
- a .warc.gz is a concatenation of independent gzip members; the parser
  sniffs the 0x1f 0x8b magic at each record boundary, so plain and
  gzip records may be mixed in one stream.

Everything fails loudly: truncated blocks, bad version lines, missing
mandatory fields and digest mismatches raise ``WarcError`` — never a
silently-skipped record (the repo's loud-gate discipline).
"""

from __future__ import annotations

import base64
import gzip
import hashlib
import io
import zlib
from urllib.parse import parse_qsl, urlencode, urlsplit

CRLF = b"\r\n"
_VERSIONS = (b"WARC/1.1", b"WARC/1.0")
_GZIP_MAGIC = b"\x1f\x8b"


class WarcError(ValueError):
    pass


# --------------------------------------------------------------------------
# helpers
# --------------------------------------------------------------------------

def deterministic_record_id(warc_type: str, target_uri: str, date: str) -> str:
    """``<urn:uuid:...>`` derived from md5 — rerun/retry stable."""
    hx = hashlib.md5(f"{warc_type}\x00{target_uri}\x00{date}".encode()).hexdigest()
    return (f"<urn:uuid:{hx[0:8]}-{hx[8:12]}-{hx[12:16]}-"
            f"{hx[16:20]}-{hx[20:32]}>")


def payload_digest(payload: bytes) -> str:
    """``sha1:`` + base32(sha1(payload)) — the labelled form WARC uses."""
    return "sha1:" + base64.b32encode(hashlib.sha1(payload).digest()).decode()


def http_response_block(status: int, reason: str, content_type: str,
                        payload: bytes) -> bytes:
    """Minimal HTTP/1.1 response block for a WARC response record."""
    head = (f"HTTP/1.1 {status} {reason}\r\n"
            f"Content-Type: {content_type}\r\n"
            f"Content-Length: {len(payload)}\r\n\r\n").encode()
    return head + payload


def http_request_block(method: str, path: str, host: str) -> bytes:
    return (f"{method} {path} HTTP/1.1\r\nHost: {host}\r\n\r\n").encode()


# --------------------------------------------------------------------------
# writer
# --------------------------------------------------------------------------

def build_record(warc_type: str, block: bytes, *, target_uri: str | None = None,
                 date: str = "2026-01-01T00:00:00Z",
                 content_type: str = "application/http;msgtype=response",
                 extra_fields: dict[str, str] | None = None,
                 gzip_member: bool = False) -> bytes:
    """Serialize one WARC record; ``gzip_member=True`` wraps it in its
    own gzip member (mtime pinned to 0 for byte determinism)."""
    extra = extra_fields or {}
    # extra fields join the id derivation so records that differ only in
    # them (e.g. per-shard warcinfo via WARC-Filename) get distinct ids;
    # with no extras the salt reduces to the target URI (ids stable)
    id_salt = (target_uri or "") + "".join(
        f"\x01{k}\x02{v}" for k, v in sorted(extra.items()))
    fields = [
        ("WARC-Type", warc_type),
        ("WARC-Record-ID", deterministic_record_id(warc_type, id_salt, date)),
        ("WARC-Date", date),
    ]
    if target_uri is not None:
        fields.append(("WARC-Target-URI", target_uri))
    if content_type.startswith("application/http"):
        head, sep, payload = block.partition(b"\r\n\r\n")
        if not sep:
            raise WarcError("application/http block has no header terminator")
        fields.append(("WARC-Payload-Digest", payload_digest(payload)))
    for k, v in extra.items():
        fields.append((k, v))
    fields.append(("Content-Type", content_type))
    fields.append(("Content-Length", str(len(block))))
    for k, v in fields:
        # a CR/LF smuggled into a field value (e.g. a hostile URL)
        # would corrupt the record framing — refuse, never emit
        if "\r" in str(v) or "\n" in str(v) or "\r" in k or "\n" in k:
            raise WarcError(f"CR/LF in WARC header field {k!r}")
    raw = b"WARC/1.1" + CRLF
    raw += b"".join(f"{k}: {v}".encode() + CRLF for k, v in fields)
    raw += CRLF + block + CRLF + CRLF
    if gzip_member:
        buf = io.BytesIO()
        with gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(raw)
        return buf.getvalue()
    return raw


def build_response_record(target_uri: str, status: int, reason: str,
                          content_type: str, payload: bytes, *,
                          date: str = "2026-01-01T00:00:00Z",
                          gzip_member: bool = False) -> bytes:
    return build_record(
        "response", http_response_block(status, reason, content_type, payload),
        target_uri=target_uri, date=date, gzip_member=gzip_member)


# --------------------------------------------------------------------------
# parser
# --------------------------------------------------------------------------

def _parse_headers(head: bytes) -> dict[str, str]:
    """Named-field block → dict (case-insensitive keys lowered;
    SP/HT-led continuation lines folded per the grammar)."""
    fields: dict[str, str] = {}
    last: str | None = None
    for line in head.split(CRLF):
        if not line:
            continue
        if line[:1] in (b" ", b"\t"):
            if last is None:
                raise WarcError("continuation line before any field")
            fields[last] += " " + line.strip().decode("utf-8", "replace")
            continue
        name, sep, value = line.partition(b":")
        if not sep:
            raise WarcError(f"malformed WARC header line: {line!r}")
        last = name.strip().decode().lower()
        fields[last] = value.strip().decode("utf-8", "replace")
    return fields


def _split_http_block(block: bytes) -> tuple[int | None, bytes]:
    """(status, payload) of an application/http block."""
    head, sep, payload = block.partition(b"\r\n\r\n")
    if not sep:
        raise WarcError("http block missing header terminator")
    status_line = head.split(CRLF, 1)[0].decode("latin-1")
    parts = status_line.split(" ", 2)
    status = int(parts[1]) if parts[0].startswith("HTTP/") and len(parts) > 1 else None
    return status, payload


def parse_warc(data: bytes, *, verify_digest: bool = True) -> list[dict]:
    """Concatenated WARC records (plain and/or per-record gzip members,
    sniffed at each boundary) → list of record dicts with the raw block,
    the decoded HTTP status/payload, and the byte ``offset``/``length``
    of each record in the input (the CDX columns)."""
    records: list[dict] = []
    pos = 0
    n = len(data)
    while pos < n:
        offset = pos
        if data[pos:pos + 2] == _GZIP_MAGIC:
            # one gzip member: decompressobj(31) stops at the member
            # trailer and reports the exact remainder in .unused_data
            # (GzipFile's read-ahead would overshoot the boundary)
            d = zlib.decompressobj(31)
            try:
                raw = d.decompress(data[pos:])
            except zlib.error as e:
                raise WarcError(f"bad gzip member at offset {pos}: {e}") from e
            if not d.eof:
                raise WarcError(f"truncated gzip member at offset {pos}")
            member_len = (n - pos) - len(d.unused_data)
            rec, consumed = _parse_one(raw, 0)
            if consumed != len(raw):
                raise WarcError(
                    f"gzip member at offset {pos} holds {len(raw) - consumed} "
                    "trailing bytes after its record (one record per member)")
            pos += member_len
        else:
            rec, consumed = _parse_one(data, pos)
            pos = consumed
        rec["offset"] = offset
        rec["length"] = pos - offset
        if verify_digest and rec["fields"].get("warc-payload-digest") and rec["payload"] is not None:
            want = rec["fields"]["warc-payload-digest"]
            got = payload_digest(rec["payload"])
            if want != got:
                raise WarcError(
                    f"payload digest mismatch for {rec['fields'].get('warc-record-id')}: "
                    f"header {want}, computed {got}")
        records.append(rec)
    return records


def _parse_one(data: bytes, pos: int) -> tuple[dict, int]:
    """One plain record starting at ``pos`` → (record dict, end offset)."""
    eol = data.find(CRLF, pos)
    if eol < 0:
        raise WarcError(f"truncated record at offset {pos}: no version line")
    version = data[pos:eol]
    if version not in _VERSIONS:
        raise WarcError(f"not a WARC record at offset {pos}: {version!r}")
    head_end = data.find(CRLF + CRLF, eol)
    if head_end < 0:
        raise WarcError(f"truncated record at offset {pos}: unterminated header")
    fields = _parse_headers(data[eol + 2:head_end])
    for required in ("warc-type", "warc-record-id", "warc-date", "content-length"):
        if required not in fields:
            raise WarcError(f"record at offset {pos} missing {required}")
    try:
        block_len = int(fields["content-length"])
    except ValueError as e:
        raise WarcError(f"bad Content-Length {fields['content-length']!r}") from e
    block_start = head_end + 4
    block_end = block_start + block_len
    if data[block_end:block_end + 4] != CRLF + CRLF:
        raise WarcError(
            f"record at offset {pos}: block not followed by CRLFCRLF "
            "(truncated or wrong Content-Length)")
    block = data[block_start:block_end]
    status, payload = (None, None)
    if fields.get("content-type", "").startswith("application/http"):
        status, payload = _split_http_block(block)
    return {
        "version": version.decode(),
        "fields": fields,
        "warc_type": fields["warc-type"],
        "target_uri": fields.get("warc-target-uri"),
        "date": fields["warc-date"],
        "record_id": fields["warc-record-id"],
        "block": block,
        "http_status": status,
        "payload": payload,
    }, block_end + 4


# --------------------------------------------------------------------------
# SURT (Sort-friendly URI Reordering Transform) — the CDX sort key
# --------------------------------------------------------------------------

def surt(url: str) -> str:
    """``http://www.Example.test:80/a?b=2&a=1`` →
    ``test,example,www)/a?a=1&b=2`` — host labels reversed and
    comma-joined so one host's records sort adjacent; scheme and default
    port dropped; query keys sorted (same canonical query convention as
    functions/fingerprint.canonicalize_one, so the seen-set key and the
    archive key agree)."""
    parts = urlsplit(url.strip())
    host = (parts.hostname or "").lower()
    key = ",".join(reversed(host.split("."))) if host else ""
    port = parts.port
    if port is not None and port not in (80, 443):
        key += f":{port}"
    key += ")" + (parts.path or "/")
    query = urlencode(sorted(parse_qsl(parts.query, keep_blank_values=True)))
    if query:
        key += "?" + query
    return key
