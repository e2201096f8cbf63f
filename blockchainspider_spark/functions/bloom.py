"""Numpy-backed Bloom filter (broadcastable into pandas UDFs).

PySpark 4.x dropped ``DataFrameStatFunctions.bloomFilter`` from the
Python API, so the two-phase dedup (U5: approximate pre-filter + exact
anti-join authority) uses this implementation: k hash probes derived by
double hashing from one md5 digest, bit array in a numpy uint8 buffer.
Vectorized membership over Arrow batches; serializes with the closure,
so a broadcast to executors is just the UDF capture.
"""

from __future__ import annotations

import hashlib
import math

import numpy as np
import pandas as pd


class NumpyBloom:
    def __init__(self, capacity: int, fpp: float = 1e-4):
        capacity = max(capacity, 64)
        m = int(-capacity * math.log(fpp) / (math.log(2) ** 2))
        self.n_bits = max(64, m)
        self.k = max(1, int(round(m / capacity * math.log(2))))
        self.bits = np.zeros((self.n_bits + 7) // 8, dtype=np.uint8)

    def _probes(self, key: str) -> np.ndarray:
        d = hashlib.md5(key.encode()).digest()
        h1 = int.from_bytes(d[:8], "big")
        h2 = int.from_bytes(d[8:], "big") | 1
        return (h1 + np.arange(self.k, dtype=np.uint64) * np.uint64(h2)) % np.uint64(self.n_bits)

    def add(self, key: str) -> None:
        idx = self._probes(key)
        np.bitwise_or.at(self.bits, idx // 8, (1 << (idx % 8)).astype(np.uint8))

    def add_many(self, keys) -> None:
        for key in keys:
            self.add(key)

    def might_contain(self, key: str) -> bool:
        idx = self._probes(key)
        return bool(np.all(self.bits[idx // 8] & (1 << (idx % 8)).astype(np.uint8)))

    def might_contain_series(self, keys: pd.Series) -> pd.Series:
        return keys.map(self.might_contain)
