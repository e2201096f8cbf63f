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
import os
import tempfile

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


def _probe_positions(key: str, n_bits: int, k: int) -> np.ndarray:
    d = hashlib.md5(str(key).encode()).digest()
    h1 = int.from_bytes(d[:8], "big")
    h2 = int.from_bytes(d[8:], "big") | 1
    return (h1 + np.arange(k, dtype=np.uint64) * np.uint64(h2)) % np.uint64(n_bits)


class ShardedBloomTable:
    """URL-seen Bloom sharded by fingerprint range — the 10^10-key form.

    A monolithic filter for 10^10 keys @ 1e-4 is ~24 GB: unbroadcastable
    and un-collectable. Here the key space is split into ``n_shards`` by
    the fingerprint's leading hex digits; each shard's bit array lives as
    ONE row of a (shard, bits) DataFrame that never leaves the executors:

    * ``add`` — delta bit arrays built per shard (repartition on shard →
      one numpy blob per shard) and OR-merged into the table with a
      grouped reduce kernel. Driver sees nothing.
    * ``might_contain`` — candidates cogrouped with their shard's single
      bits row (``groupby.cogroup.applyInPandas``): the blob is NOT
      replicated per candidate row the way a plain join would.

    Semantics match NumpyBloom (same double-hash probes) per shard, so
    the exact anti-join remains the correctness authority — this only
    prunes its probe side (U5 contract)."""

    def __init__(self, spark, capacity_per_shard: int = 1_000_000,
                 fpp: float = 1e-4, n_shards: int = 64, compact_every: int = 8):
        proto = NumpyBloom(capacity_per_shard, fpp)
        self.spark = spark
        self.n_bits, self.k = proto.n_bits, proto.k
        self.n_bytes = len(proto.bits)
        self.n_shards = n_shards
        self.bits_df = spark.createDataFrame([], "shard int, bits binary")
        # plan hygiene (same pattern as functions/cuckoo.py): each add()
        # nests one more union+groupBy into the bits plan; flush to
        # parquet every `compact_every` rewrites to keep analysis O(1)
        # per wave on long crawls
        self.compact_every = compact_every
        self._n_rewrites = 0
        self._scratch: str | None = None

    def _swap_in(self, merged) -> None:
        old = self.bits_df
        self._n_rewrites += 1
        if self.compact_every and self._n_rewrites % self.compact_every == 0:
            if self._scratch is None:
                self._scratch = tempfile.mkdtemp(prefix="bloom-bits-")
            d = os.path.join(self._scratch, f"gen_{self._n_rewrites:06d}")
            merged.write.mode("overwrite").parquet(d)
            self.bits_df = self.spark.read.parquet(d)
        else:
            self.bits_df = merged
        self.bits_df = self.bits_df.persist()
        self.bits_df.count()
        old.unpersist()

    def meta(self) -> dict:
        """Geometry that must survive a checkpoint: shard routing and
        probe parameters. A table reloaded under different geometry would
        hash probes to the wrong shard/bit — silent false negatives."""
        return {"kind": "bloom", "n_shards": self.n_shards, "n_bits": self.n_bits,
                "k": self.k, "n_bytes": self.n_bytes}

    @classmethod
    def from_meta(cls, spark, meta: dict, bits_df) -> "ShardedBloomTable":
        """Reconstruct a table from checkpointed geometry + bits rows —
        never re-derive geometry from live session config (shard count
        and probe params are properties of the persisted bits, not of
        the resuming session)."""
        self = cls.__new__(cls)
        self.spark = spark
        self.n_shards = int(meta["n_shards"])
        self.n_bits = int(meta["n_bits"])
        self.k = int(meta["k"])
        self.n_bytes = int(meta["n_bytes"])
        self.bits_df = bits_df
        self.compact_every = 8
        self._n_rewrites = 0
        self._scratch = None
        return self

    def _shard_col(self, col):
        from pyspark.sql import functions as F

        return F.pmod(F.conv(F.substring(col, 1, 6), 16, 10).cast("long"),
                      F.lit(self.n_shards)).cast("int")

    def add(self, df, col: str) -> None:
        """OR a delta of keys into the table (all executor-side)."""
        from pyspark.sql import functions as F

        n_bits, k, n_bytes = self.n_bits, self.k, self.n_bytes

        def build(batches):
            local: dict[int, np.ndarray] = {}
            for pdf in batches:
                for shard, key in zip(pdf["shard"], pdf[col]):
                    arr = local.setdefault(int(shard), np.zeros(n_bytes, dtype=np.uint8))
                    idx = _probe_positions(key, n_bits, k)
                    np.bitwise_or.at(arr, idx // 8, (1 << (idx % 8)).astype(np.uint8))
            if local:
                yield pd.DataFrame({
                    "shard": list(local), "bits": [a.tobytes() for a in local.values()],
                })

        delta = (
            df.select(self._shard_col(F.col(col)).alias("shard"), col)
            .repartition("shard")
            .mapInPandas(build, "shard int, bits binary")
        )

        def or_reduce(pdf: pd.DataFrame) -> pd.DataFrame:
            acc = np.zeros(n_bytes, dtype=np.uint8)
            for b in pdf["bits"]:
                acc |= np.frombuffer(b, dtype=np.uint8)
            return pd.DataFrame({"shard": [int(pdf["shard"].iloc[0])], "bits": [acc.tobytes()]})

        merged = (
            self.bits_df.unionByName(delta)
            .groupBy("shard")
            .applyInPandas(or_reduce, "shard int, bits binary")
        )
        self._swap_in(merged)

    def might_contain(self, candidates, col: str):
        """candidates + boolean ``_maybe`` column (False = definitely new)."""
        from pyspark.sql import functions as F

        n_bits, k = self.n_bits, self.k
        out_cols = candidates.columns

        def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if not len(left):
                return left.assign(_maybe=pd.Series([], dtype=bool))
            if not len(right):
                return left.assign(_maybe=False)
            arr = np.frombuffer(right["bits"].iloc[0], dtype=np.uint8)

            def test(key):
                idx = _probe_positions(key, n_bits, k)
                return bool(np.all(arr[idx // 8] & (1 << (idx % 8)).astype(np.uint8)))

            return left.assign(_maybe=left[col].map(test))

        from pyspark.sql.types import BooleanType, StructField, StructType

        keyed = candidates.withColumn("shard", self._shard_col(F.col(col)))
        schema = StructType(list(keyed.schema.fields) + [StructField("_maybe", BooleanType())])
        return (
            keyed.groupby("shard")
            .cogroup(self.bits_df.groupby("shard"))
            .applyInPandas(probe, schema)
            .select(*out_cols, "_maybe")
        )
