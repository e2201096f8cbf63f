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

    def union_from_dataframe(self, df, col: str) -> None:
        """Distributed bulk insert: each partition builds a local bit
        array over its keys (executor-side), the driver ORs the partial
        arrays together. Driver traffic is bounded by
        ``n_partitions × n_bits/8`` bytes — independent of row count —
        so the bloom stays usable at 10^8-row waves where a per-key
        driver loop (``add_many``) would not."""
        n_bits, k, nbytes = self.n_bits, self.k, len(self.bits)

        def build(batches):
            local = np.zeros(nbytes, dtype=np.uint8)
            seen_any = False
            for pdf in batches:
                for key in pdf[col]:
                    d = hashlib.md5(str(key).encode()).digest()
                    h1 = int.from_bytes(d[:8], "big")
                    h2 = int.from_bytes(d[8:], "big") | 1
                    idx = (h1 + np.arange(k, dtype=np.uint64) * np.uint64(h2)) % np.uint64(n_bits)
                    np.bitwise_or.at(local, idx // 8, (1 << (idx % 8)).astype(np.uint8))
                    seen_any = True
            if seen_any:
                yield pd.DataFrame({"bits": [local.tobytes()]})

        for r in df.select(col).mapInPandas(build, "bits binary").collect():
            self.bits |= np.frombuffer(r["bits"], dtype=np.uint8)
