"""Pure-Python keccak-256 (legacy Keccak padding, as used by the EVM).

``hashlib.sha3_256`` implements FIPS-202 SHA-3 (0x06 domain padding) —
NOT the pre-standardization Keccak (0x01 padding) Ethereum uses, so it
cannot be substituted. This is a dependency-free keccak-f[1600] sponge:
25 64-bit lanes, rate 1088 bits / capacity 512 for the 256-bit output,
multi-rate padding ``0x01 … 0x80``.

Used for event-topic derivation and 4-byte function selectors
(reference: /root/reference/BlockchainSpider/utils/token.py:110,143 uses
Web3.keccak for the same purpose). Per-call cost is irrelevant at scale:
selectors/topics are computed once per *signature* (a dimension of a few
hundred rows), never per data row.

Verified against the canonical vectors in tests/test_traces_abi.py:
keccak256('') = c5d24601…, selector('name()') = 0x06fdde03,
topic('Transfer(address,address,uint256)') = 0xddf252ad….
"""

from __future__ import annotations

_MASK = (1 << 64) - 1

_RC = [
    0x0000000000000001, 0x0000000000008082, 0x800000000000808A, 0x8000000080008000,
    0x000000000000808B, 0x0000000080000001, 0x8000000080008081, 0x8000000000008009,
    0x000000000000008A, 0x0000000000000088, 0x0000000080008009, 0x000000008000000A,
    0x000000008000808B, 0x800000000000008B, 0x8000000000008089, 0x8000000000008003,
    0x8000000000008002, 0x8000000000000080, 0x000000000000800A, 0x800000008000000A,
    0x8000000080008081, 0x8000000000008080, 0x0000000080000001, 0x8000000080008008,
]

# rotation offsets r[x][y], lane index = x + 5*y
_ROT = [
    [0, 36, 3, 41, 18],
    [1, 44, 10, 45, 2],
    [62, 6, 43, 15, 61],
    [28, 55, 25, 21, 56],
    [27, 20, 39, 8, 14],
]


def _rol(v: int, n: int) -> int:
    n %= 64
    return ((v << n) | (v >> (64 - n))) & _MASK


def _keccak_f(a: list[int]) -> None:
    """keccak-f[1600] permutation in place over 25 lanes a[x + 5y]."""
    for rc in _RC:
        # θ: column parities
        c = [a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20] for x in range(5)]
        d = [c[(x - 1) % 5] ^ _rol(c[(x + 1) % 5], 1) for x in range(5)]
        for x in range(5):
            for y in range(5):
                a[x + 5 * y] ^= d[x]
        # ρ + π: b[y, 2x+3y] = rot(a[x, y])
        b = [0] * 25
        for x in range(5):
            for y in range(5):
                b[y + 5 * ((2 * x + 3 * y) % 5)] = _rol(a[x + 5 * y], _ROT[x][y])
        # χ
        for x in range(5):
            for y in range(5):
                a[x + 5 * y] = b[x + 5 * y] ^ (
                    (~b[(x + 1) % 5 + 5 * y] & _MASK) & b[(x + 2) % 5 + 5 * y]
                )
        # ι
        a[0] ^= rc


def keccak256(data: bytes) -> bytes:
    """Legacy keccak-256 digest (32 bytes)."""
    rate = 136  # bytes; 1600/8 - 2*32
    state = [0] * 25
    # absorb with multi-rate padding 0x01 … 0x80
    padded = bytearray(data)
    pad_len = rate - (len(padded) % rate)
    padded += b"\x01" + b"\x00" * (pad_len - 2) + b"\x80" if pad_len >= 2 else b"\x81"
    for off in range(0, len(padded), rate):
        block = padded[off:off + rate]
        for i in range(rate // 8):
            state[i] ^= int.from_bytes(block[8 * i:8 * i + 8], "little")
        _keccak_f(state)
    # squeeze (32 bytes < rate → one block)
    out = b"".join(lane.to_bytes(8, "little") for lane in state[:4])
    return out


def keccak256_hex(data: bytes | str) -> str:
    if isinstance(data, str):
        data = data.encode()
    return keccak256(data).hex()


def selector(signature: str) -> str:
    """4-byte function selector: '0x' + keccak256(sig)[:4] (F8)."""
    return "0x" + keccak256_hex(signature)[:8]


def event_topic(signature: str) -> str:
    """32-byte event topic0: '0x' + keccak256(sig)."""
    return "0x" + keccak256_hex(signature)
