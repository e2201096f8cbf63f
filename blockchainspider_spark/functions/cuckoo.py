"""Numpy-backed cuckoo filter — the deletable URL-seen form.

The north rule's seen-set is "Bloom/cuckoo": functions/bloom.py covers
the append-only side; this module adds the cuckoo filter (partial-key
cuckoo hashing per Fan et al. 2014, "Cuckoo Filter: Practically Better
Than Bloom") for the one crawl semantic a Bloom cannot express —
**eviction**. A terminally-failed fetch can be deleted from the seen
filter so a later wave or resumed crawl re-attempts the URL, instead of
the Bloom behavior where a URL once seen is seen forever.

Same probe-side contract as the Bloom (U5): the filter only PRUNES the
exact anti-join (no false negatives for inserted-and-not-deleted keys),
the exact join stays the authority for maybe-hits. Deletion carries the
classic cuckoo-filter contract: only keys that were actually inserted
may be deleted — each insert stores its own fingerprint copy, so
deleting an inserted key never creates a false negative for a
different inserted key, but deleting a never-inserted key can.
``ShardedCuckooTable`` enforces this loudly (strict delete raises on a
missing fingerprint).

Determinism: all hashing is md5-derived (like functions/bloom.py) and
the eviction path picks victim slots round-robin, so the same insert
order always yields byte-identical tables — checkpoints are
reproducible and tests can pin exact bytes.
"""

from __future__ import annotations

import hashlib
import os
import tempfile

import numpy as np
import pandas as pd

_FP_ODD_MULT = 0x5BD1E995  # MurmurHash2 odd constant — fp → bucket offset


class CuckooFullError(RuntimeError):
    """Insert failed after max_kicks evictions — the filter is past its
    load ceiling. Loud by design: a silently-dropped key would be a
    seen-set false negative (re-crawled URL) with no trace."""


class CuckooDeleteError(KeyError):
    """Strict delete of a fingerprint that is not in the filter — the
    caller broke the only-delete-what-you-inserted contract."""


def _fp_i1(key: str, n_buckets: int) -> tuple[int, int]:
    """(fingerprint, primary bucket) from one md5 digest. Fingerprints
    are 16-bit and never 0 (0 is the empty-slot sentinel)."""
    d = hashlib.md5(str(key).encode()).digest()
    fp = (int.from_bytes(d[:2], "big") % 0xFFFF) + 1
    i1 = int.from_bytes(d[8:16], "big") & (n_buckets - 1)
    return fp, i1


def _alt_index(i: int | np.ndarray, fp: int | np.ndarray, n_buckets: int):
    """Partial-key displacement (Fan et al. §3.1): the alternate bucket
    depends only on (current bucket, fingerprint), so entries relocate
    without the original key. n_buckets is a power of two, which keeps
    the xor closed over the bucket range and the pairing involutive."""
    return i ^ ((fp * _FP_ODD_MULT) & (n_buckets - 1))


class NumpyCuckoo:
    """In-core cuckoo filter: (n_buckets × bucket_size) uint16 table.

    ~2 bytes/slot at 95% target load ≈ 2.1 bytes/key — denser than a
    1e-4 Bloom (2.4 bytes/key) *and* deletable. Sized like NumpyBloom:
    pass the expected key count, geometry is derived."""

    def __init__(self, capacity: int, bucket_size: int = 4, max_kicks: int = 500):
        n = 1
        while n * bucket_size * 0.95 < max(capacity, 64):
            n <<= 1
        self.n_buckets = n
        self.bucket_size = bucket_size
        self.max_kicks = max_kicks
        self.table = np.zeros((n, bucket_size), dtype=np.uint16)
        self.n_items = 0

    # -------------------------------------------------------------- geometry

    def meta(self) -> dict:
        return {
            "kind": "cuckoo",
            "n_buckets": self.n_buckets,
            "bucket_size": self.bucket_size,
            "max_kicks": self.max_kicks,
        }

    def to_bytes(self) -> bytes:
        return self.table.tobytes()

    @classmethod
    def from_parts(cls, meta: dict, buf: bytes | None = None) -> "NumpyCuckoo":
        """Rebuild from checkpointed geometry + table bytes. Geometry
        always comes from the checkpoint, never live config — a table
        probed under different geometry silently misses keys."""
        self = cls.__new__(cls)
        self.n_buckets = int(meta["n_buckets"])
        self.bucket_size = int(meta["bucket_size"])
        self.max_kicks = int(meta["max_kicks"])
        if buf is None:
            self.table = np.zeros((self.n_buckets, self.bucket_size), dtype=np.uint16)
        else:
            self.table = (
                np.frombuffer(buf, dtype=np.uint16)
                .reshape(self.n_buckets, self.bucket_size)
                .copy()
            )
        self.n_items = int(np.count_nonzero(self.table))
        return self

    # -------------------------------------------------------------- mutation

    def add(self, key: str) -> None:
        fp, i1 = _fp_i1(key, self.n_buckets)
        self._insert_fp(fp, i1)

    def add_many(self, keys) -> None:
        for key in keys:
            self.add(key)

    def _place(self, bucket: int, fp: int) -> bool:
        row = self.table[bucket]
        empties = np.flatnonzero(row == 0)
        if len(empties):
            row[empties[0]] = fp
            return True
        return False

    def _insert_fp(self, fp: int, i1: int) -> None:
        i2 = _alt_index(i1, fp, self.n_buckets)
        if self._place(i1, fp) or self._place(i2, fp):
            self.n_items += 1
            return
        # both buckets full: displace round-robin (deterministic, unlike
        # the paper's random victim — determinism buys reproducible
        # checkpoints and costs nothing measurable at 95% load)
        cur_i, cur_fp = i1, fp
        for kick in range(self.max_kicks):
            slot = kick % self.bucket_size
            victim = int(self.table[cur_i, slot])
            self.table[cur_i, slot] = cur_fp
            cur_fp = victim
            cur_i = _alt_index(cur_i, cur_fp, self.n_buckets)
            if self._place(cur_i, cur_fp):
                self.n_items += 1
                return
        raise CuckooFullError(
            f"cuckoo filter full after {self.max_kicks} kicks "
            f"({self.n_items}/{self.n_buckets * self.bucket_size} slots, "
            f"load {self.n_items / (self.n_buckets * self.bucket_size):.2f}) — "
            "resize capacity; a dropped key would be a silent re-crawl"
        )

    def delete(self, key: str, strict: bool = True) -> bool:
        """Remove ONE stored copy of the key's fingerprint. Only valid
        for previously-inserted keys (module docstring); strict mode
        raises when nothing matches instead of returning False."""
        fp, i1 = _fp_i1(key, self.n_buckets)
        for b in (i1, _alt_index(i1, fp, self.n_buckets)):
            row = self.table[b]
            hits = np.flatnonzero(row == fp)
            if len(hits):
                row[hits[0]] = 0
                self.n_items -= 1
                return True
        if strict:
            raise CuckooDeleteError(
                f"delete of a fingerprint not in the filter (key={key!r}) — "
                "only previously-inserted keys may be deleted"
            )
        return False

    def delete_many(self, keys, strict: bool = True) -> int:
        return sum(1 for key in keys if self.delete(key, strict=strict))

    # -------------------------------------------------------------- probes

    def might_contain(self, key: str) -> bool:
        fp, i1 = _fp_i1(key, self.n_buckets)
        i2 = _alt_index(i1, fp, self.n_buckets)
        return bool((self.table[i1] == fp).any() or (self.table[i2] == fp).any())

    def might_contain_many(self, keys) -> np.ndarray:
        """Vectorized membership: md5 per key (the only per-key Python),
        then two numpy gathers over the whole batch."""
        n = len(keys)
        if not n:
            return np.zeros(0, dtype=bool)
        fps = np.empty(n, dtype=np.uint64)
        i1s = np.empty(n, dtype=np.int64)
        for j, key in enumerate(keys):
            fps[j], i1s[j] = _fp_i1(key, self.n_buckets)
        i2s = _alt_index(i1s, fps.astype(np.int64), self.n_buckets)
        want = fps.astype(np.uint16)[:, None]
        return (self.table[i1s] == want).any(axis=1) | (self.table[i2s] == want).any(axis=1)

    def might_contain_series(self, keys: pd.Series) -> pd.Series:
        return pd.Series(self.might_contain_many(list(keys)), index=keys.index)


class ShardedCuckooTable:
    """URL-seen cuckoo sharded by fingerprint range — the 10^10-key form.

    Same layout/scale story as functions/bloom.ShardedBloomTable: one
    (shard, bits) row per shard, blobs executor-resident, candidates
    probed via ``groupby.cogroup.applyInPandas``. The structural
    difference: a cuckoo table is not OR-mergeable, so ``add``/``delete``
    cogroup the delta keys with the shard's current blob and rewrite
    that blob in the kernel. Per-wave cost is O(touched-shard blobs +
    delta keys) — untouched shards pass through unrewritten — versus the
    Bloom's O(delta); the price buys deletability.

    Checkpoint format matches the Bloom's (bits_df parquet + ``meta()``
    geometry) so engine snapshots handle both backends uniformly; the
    ``kind`` field in meta disambiguates on resume."""

    def __init__(self, spark, capacity_per_shard: int = 1_000_000,
                 bucket_size: int = 4, max_kicks: int = 500, n_shards: int = 64,
                 compact_every: int = 8):
        proto = NumpyCuckoo(capacity_per_shard, bucket_size, max_kicks)
        self.spark = spark
        self.n_buckets = proto.n_buckets
        self.bucket_size = proto.bucket_size
        self.max_kicks = proto.max_kicks
        self.n_shards = n_shards
        self.bits_df = spark.createDataFrame([], "shard int, bits binary")
        # plan hygiene: every rewrite nests one more cogroup in the bits
        # plan (persist caches rows, not plan depth — Catalyst re-analyzes
        # the whole chain each wave). Every `compact_every` rewrites the
        # table is flushed to parquet and read back flat, same pattern as
        # the engines' seen compaction (engine/batch_bfs.py:311).
        self.compact_every = compact_every
        self._n_rewrites = 0
        self._scratch: str | None = None

    def _swap_in(self, merged) -> None:
        old = self.bits_df
        self._n_rewrites += 1
        if self.compact_every and self._n_rewrites % self.compact_every == 0:
            if self._scratch is None:
                self._scratch = tempfile.mkdtemp(prefix="cuckoo-bits-")
            d = os.path.join(self._scratch, f"gen_{self._n_rewrites:06d}")
            merged.write.mode("overwrite").parquet(d)
            self.bits_df = self.spark.read.parquet(d)
        else:
            self.bits_df = merged
        self.bits_df = self.bits_df.persist()
        self.bits_df.count()
        old.unpersist()

    def meta(self) -> dict:
        return {
            "kind": "cuckoo",
            "n_shards": self.n_shards,
            "n_buckets": self.n_buckets,
            "bucket_size": self.bucket_size,
            "max_kicks": self.max_kicks,
        }

    @classmethod
    def from_meta(cls, spark, meta: dict, bits_df) -> "ShardedCuckooTable":
        if meta.get("kind") != "cuckoo":
            raise ValueError(f"not a cuckoo checkpoint: kind={meta.get('kind')!r}")
        self = cls.__new__(cls)
        self.spark = spark
        self.n_shards = int(meta["n_shards"])
        self.n_buckets = int(meta["n_buckets"])
        self.bucket_size = int(meta["bucket_size"])
        self.max_kicks = int(meta["max_kicks"])
        self.bits_df = bits_df
        self.compact_every = 8
        self._n_rewrites = 0
        self._scratch = None
        return self

    def _shard_col(self, col):
        from pyspark.sql import functions as F

        return F.pmod(F.conv(F.substring(col, 1, 6), 16, 10).cast("long"),
                      F.lit(self.n_shards)).cast("int")

    def _rewrite(self, df, col: str, op: str) -> None:
        """Cogroup delta keys with their shard's blob, run the NumpyCuckoo
        kernel, and swap in the rewritten table (persist → count →
        unpersist old, as the Bloom does)."""
        from pyspark.sql import functions as F

        geo = self.meta()

        def kern(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            blob = right["bits"].iloc[0] if len(right) else None
            if not len(left):  # untouched shard: blob passes through as-is
                return right[["shard", "bits"]]
            filt = NumpyCuckoo.from_parts(geo, blob)
            if op == "add":
                filt.add_many(left[col])
            else:
                filt.delete_many(left[col], strict=True)
            shard = int(left["shard"].iloc[0])
            return pd.DataFrame({"shard": [shard], "bits": [filt.to_bytes()]})

        keyed = df.select(self._shard_col(F.col(col)).alias("shard"), col)
        merged = (
            keyed.groupby("shard")
            .cogroup(self.bits_df.groupby("shard"))
            .applyInPandas(kern, "shard int, bits binary")
        )
        self._swap_in(merged)

    def add(self, df, col: str) -> None:
        self._rewrite(df, col, "add")

    def delete(self, df, col: str) -> None:
        """Evict previously-inserted keys (e.g. terminally-failed fetches
        being released for re-crawl). Strict: a key whose fingerprint is
        absent raises CuckooDeleteError inside the task."""
        self._rewrite(df, col, "delete")

    def might_contain(self, candidates, col: str):
        """candidates + boolean ``_maybe`` column (False = definitely
        new). Identical cogroup shape to the Bloom probe — the blob is
        never replicated per candidate row."""
        from pyspark.sql import functions as F
        from pyspark.sql.types import BooleanType, StructField, StructType

        geo = self.meta()
        out_cols = candidates.columns

        def probe(left: pd.DataFrame, right: pd.DataFrame) -> pd.DataFrame:
            if not len(left):
                return left.assign(_maybe=pd.Series([], dtype=bool))
            if not len(right):
                return left.assign(_maybe=False)
            filt = NumpyCuckoo.from_parts(geo, right["bits"].iloc[0])
            return left.assign(_maybe=filt.might_contain_many(list(left[col])))

        keyed = candidates.withColumn("shard", self._shard_col(F.col(col)))
        schema = StructType(list(keyed.schema.fields) + [StructField("_maybe", BooleanType())])
        return (
            keyed.groupby("shard")
            .cogroup(self.bits_df.groupby("shard"))
            .applyInPandas(probe, schema)
            .select(*out_cols, "_maybe")
        )
