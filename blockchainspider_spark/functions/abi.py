"""ABI decode + keccak selectors (F7/F8) — dependency-free kernels.

Round 1 gated both behind missing libraries; round 2 implements them
from the public specs instead:

* keccak-256 — functions/keccak.py, a pure-Python keccak-f[1600]
  (``hashlib.sha3_256`` is FIPS SHA-3, NOT the legacy keccak the EVM
  uses, so it was never substitutable).
* ABI decode — head/tail decoding of the standard contract ABI
  encoding: static types (uintN/intN/address/bool/bytesN) plus dynamic
  ``string``/``bytes`` and arrays. This covers every output type the
  reference actually decodes (``/root/reference/BlockchainSpider/
  utils/web3.py:44-61`` decodes ["string"], ["bytes32"], ["uint8"],
  ["uint256"] via Web3().codec; utils/token.py:110,143 derives
  selectors with Web3.keccak).

If ``eth_abi`` is installed it is preferred for exotic nested types;
the built-in decoder handles the reference's entire surface without it.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

from blockchainspider_spark.functions.keccak import keccak256_hex

try:  # pragma: no cover - optional; the built-in decoder is the default path
    from eth_abi import decode as _eth_abi_decode  # type: ignore
except ImportError:
    _eth_abi_decode = None


def decode_address_word(word: Column) -> Column:
    """32-byte hex word → checksummed-lowercase address (F5)."""
    return F.lower(F.concat(F.lit("0x"), F.substring(word, -40, 40)))


def decode_uint_word(word: Column) -> Column:
    """32-byte hex word → decimal string (≤63-bit values exact; larger
    values need the pandas int path below)."""
    return F.conv(F.regexp_replace(word, "^0x", ""), 16, 10)


def decode_uint256_series(words: pd.Series) -> pd.Series:
    """Arrow-batched exact uint256 decode via Python ints → decimal
    strings (the uint256-safe path, SURVEY §7 hard point 3)."""
    return words.map(lambda w: str(int(w, 16)) if w and w != "0x" else "0")


def keccak_selector(signature: str) -> str:
    """keccak256(signature)[:4] as 0x-hex (F8) — e.g. name() → 0x06fdde03,
    matching the reference's ``Web3.keccak(text=…).hex()[:10]``."""
    return "0x" + keccak256_hex(signature)[:8]


def keccak_topic(signature: str) -> str:
    """Full 32-byte event topic0, e.g. Transfer(address,address,uint256)
    → 0xddf252ad… (the P6 dispatch constants)."""
    return "0x" + keccak256_hex(signature)


# --------------------------------------------------------------------------
# ABI head/tail decoding (contract ABI spec)
# --------------------------------------------------------------------------

def _is_dynamic(typ: str) -> bool:
    if typ in ("string", "bytes"):
        return True
    if typ.endswith("[]"):
        return True
    if "[" in typ:  # fixed array T[k]: dynamic iff T is dynamic
        return _is_dynamic(typ[: typ.index("[")])
    return False


def _static_size(typ: str) -> int:
    """Head size in bytes for a static type."""
    if "[" in typ and not typ.endswith("[]"):
        base, _, rest = typ.partition("[")
        k = int(rest.rstrip("]"))
        return k * _static_size(base)
    return 32


def _decode_static(typ: str, word: bytes):
    if typ == "address":
        return "0x" + word[12:].hex()
    if typ == "bool":
        return bool(int.from_bytes(word, "big"))
    if typ.startswith("uint"):
        return int.from_bytes(word, "big")
    if typ.startswith("int"):
        v = int.from_bytes(word, "big")
        bits = int(typ[3:] or 256)
        if v >= 1 << (bits - 1):
            v -= 1 << bits
        return v
    if typ.startswith("bytes"):  # fixed bytesN, left-aligned
        n = int(typ[5:])
        return word[:n]
    raise NotImplementedError(f"unsupported ABI type: {typ}")


def _decode_at(typ: str, data: bytes, offset: int):
    """Decode one value of ``typ`` whose head/data starts at ``offset``."""
    if typ in ("string", "bytes"):
        length = int.from_bytes(data[offset:offset + 32], "big")
        raw = data[offset + 32:offset + 32 + length]
        return raw.decode("utf-8", errors="replace") if typ == "string" else raw
    if typ.endswith("[]"):
        base = typ[:-2]
        count = int.from_bytes(data[offset:offset + 32], "big")
        return _decode_tuple([base] * count, data, offset + 32)
    if "[" in typ:  # fixed T[k]
        base, _, rest = typ.partition("[")
        k = int(rest.rstrip("]"))
        return _decode_tuple([base] * k, data, offset)
    return _decode_static(typ, data[offset:offset + 32])


def _decode_tuple(types: list[str], data: bytes, base: int = 0) -> list:
    """Head/tail decode of a sequence of types starting at ``base``."""
    out, head = [], base
    for typ in types:
        if _is_dynamic(typ):
            rel = int.from_bytes(data[head:head + 32], "big")
            out.append(_decode_at(typ, data, base + rel))
            head += 32
        else:
            out.append(_decode_at(typ, data, head))
            head += _static_size(typ)
    return out


def abi_decode(types: list[str], data: bytes) -> tuple:
    """Decode ABI-encoded ``data`` per ``types`` (the built-in path;
    ``eth_abi``-compatible results for the supported surface)."""
    if _eth_abi_decode is not None:  # pragma: no cover
        return _eth_abi_decode(types, bytes(data))
    return tuple(_decode_tuple(types, bytes(data)))


def abi_decode_hex(types: list[str], hexdata: str) -> tuple | None:
    """Reference parse_bytes_data semantics (web3.py:44-61): None on
    '0x'/non-string input or decode failure, else the decoded tuple."""
    if not isinstance(hexdata, str) or hexdata in ("0x", ""):
        return None
    try:
        return abi_decode(types, bytes.fromhex(hexdata[2:]))
    except Exception:
        return None


def abi_decode_series(types: list[str], payloads: pd.Series) -> pd.Series:
    """Arrow-batched ABI decode over a binary column."""
    return payloads.map(lambda b: abi_decode(types, bytes(b)))
