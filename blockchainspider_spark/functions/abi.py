"""ABI decode + keccak selectors (F7/F8) — gated kernels.

Neither ``eth_abi`` nor a keccak-256 implementation ships in this
container (``hashlib.sha3_256`` is SHA-3 with the 0x06 padding, NOT the
legacy keccak the EVM uses — silently substituting it would produce
wrong selectors, so we refuse instead). The vectorized-UDF contracts are
fixed here; drop in the real primitives where available.

What IS implemented without external deps: the word-level decoding the
reference does by hand for common log shapes — address words, uint words
(utils/web3.py:44-102) — see ``decode_address_word``/``decode_uint_word``
and the block-ETL topic decoders (operators/block_etl.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F

try:  # pragma: no cover - not present in this container
    from eth_abi import decode as _eth_abi_decode  # type: ignore
except ImportError:
    _eth_abi_decode = None

try:  # pragma: no cover
    from Crypto.Hash import keccak as _keccak  # type: ignore
except ImportError:
    _keccak = None


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
    """keccak256(signature)[:4] as 0x-hex — requires a keccak impl."""
    if _keccak is None:
        raise NotImplementedError(
            "keccak-256 unavailable (hashlib sha3 is NOT keccak); "
            "install pycryptodome to enable selectors"
        )
    h = _keccak.new(digest_bits=256)
    h.update(signature.encode())
    return "0x" + h.hexdigest()[:8]


def abi_decode_series(types: list[str], payloads: pd.Series) -> pd.Series:
    """Arrow-batched ABI decode — requires eth_abi."""
    if _eth_abi_decode is None:
        raise NotImplementedError("eth_abi unavailable in this container")
    return payloads.map(lambda b: _eth_abi_decode(types, bytes(b)))
