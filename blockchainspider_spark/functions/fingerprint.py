"""URL canonicalization + request fingerprints (the URL-seen key).

Reference parity: Scrapy's ``RFPDupeFilter`` with fingerprint impl 2.7
(settings.py:95) = sha1 over (method, w3lib-canonicalized URL, body).
Canonicalization: lowercase scheme+host, strip default port, strip
fragment, sort query parameters, keep blank values.

Spark-first split: the string surgery runs as an Arrow-batched pandas
UDF (``canonicalize_url``); the hash itself stays JVM-side via the
built-in ``sha1``/``sha2`` over the canonical string, so the hot path is
whole-stage-codegen'd except one vectorized exchange.
"""

from __future__ import annotations

from urllib.parse import parse_qsl, urlencode, urlsplit, urlunsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

_DEFAULT_PORTS = {"http": 80, "https": 443, "ftp": 21, "img": 0}


def canonicalize_one(url: str) -> str:
    """Canonical form of one URL (driver/oracle-side twin of the UDF)."""
    if url is None:
        return None
    parts = urlsplit(url.strip())
    scheme = parts.scheme.lower()
    host = (parts.hostname or "").lower()
    port = parts.port
    netloc = host if port is None or _DEFAULT_PORTS.get(scheme) == port else f"{host}:{port}"
    query = urlencode(sorted(parse_qsl(parts.query, keep_blank_values=True)))
    path = parts.path or "/"
    return urlunsplit((scheme, netloc, path, query, ""))


@pandas_udf(StringType())
def canonicalize_url(urls: pd.Series) -> pd.Series:
    # Arrow-batched: one Python invocation per ~10k-row batch.
    return urls.map(canonicalize_one)


def request_fingerprint(url_col: Column, method: Column | str = "GET", body: Column | str = "") -> Column:
    """sha1(method || canonical-url || body) — computed JVM-side."""
    method_c = F.lit(method) if isinstance(method, str) else method
    body_c = F.lit(body) if isinstance(body, str) else body
    return F.sha1(F.concat_ws("\x00", method_c, canonicalize_url(url_col), body_c))


def node_fingerprint(node_col: Column) -> Column:
    """Seen-set key for graph nodes: addresses are already canonical
    (lowercased at ingest, F17), so the fingerprint is a plain JVM sha1 —
    no Python exchange on the frontier hot path."""
    return F.sha1(node_col)


def transfer_id(
    from_c: Column, to_c: Column, value_c: Column, hash_c: Column,
    trace_c: Column, symbol_c: Column, contract_c: Column, token_c: Column,
) -> Column:
    """Exact-dedup key of a transfer row: sha1 over '_'-joined identity
    fields (reference external.py:124-131) — built-in, codegen'd.

    NB: ``concat_ws`` skips NULLs while the reference joins the literal
    string — callers must coalesce NULLs to '' first to match."""
    return F.sha1(F.concat_ws("_", from_c, to_c, value_c, hash_c, trace_c, symbol_c, contract_c, token_c))
