"""pHash banded near-dup + connected-component dedup groups.

Two independent oracles: a pure-Python brute-force hamming scan for the
banded join (the pigeonhole no-false-negative claim), and a union-find
for the label-propagation components (a different algorithm family than
both the Spark pointer-jumping loop and the gate's recursive-CTE
oracle).
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import functions as F

from blockchainspider_spark.operators.dedup import dedup_groups, phash_near_duplicates


def _brute_pairs(hashes: dict[int, int], max_hamming: int) -> set[tuple[int, int, int]]:
    out = set()
    ids = sorted(hashes)
    for i, a in enumerate(ids):
        for b in ids[i + 1 :]:
            h = bin(hashes[a] ^ hashes[b]).count("1")
            if h <= max_hamming:
                out.add((a, b, h))
    return out


def _rand_hashes(seed: int, n: int = 120) -> dict[int, int]:
    """Random 60-bit values + planted near-pairs at every hamming in
    [0, 10] so the threshold boundary (7 vs 8) is always exercised."""
    rng = random.Random(seed)
    hashes = {i: rng.getrandbits(60) for i in range(n)}
    nid = n
    for d in range(11):
        base = hashes[rng.randrange(n)]
        flip = 0
        for bit in rng.sample(range(60), d):
            flip |= 1 << bit
        hashes[nid] = base ^ flip
        nid += 1
    return hashes


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_banded_join_equals_brute_force(spark, seed):
    hashes = _rand_hashes(seed)
    df = spark.createDataFrame(list(hashes.items()), "img long, phash long")
    got = {
        (r.id_a, r.id_b, r.hamming)
        for r in phash_near_duplicates(
            df, id_col="img", phash_col="phash", max_hamming=7
        ).collect()
    }
    assert got == _brute_pairs(hashes, 7)


def test_band_count_must_exceed_threshold(spark):
    df = spark.createDataFrame([(0, 0)], "img long, phash long")
    with pytest.raises(ValueError, match="pigeonhole"):
        phash_near_duplicates(df, id_col="img", phash_col="phash",
                              max_hamming=10, n_bands=10)


class _UnionFind:
    def __init__(self, nodes):
        self.p = {n: n for n in nodes}

    def find(self, x):
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def _uf_expected(nodes, edges):
    uf = _UnionFind(nodes)
    for a, b in edges:
        uf.union(a, b)
    comp: dict[int, list[int]] = {}
    for n in nodes:
        comp.setdefault(uf.find(n), []).append(n)
    out = {}
    for members in comp.values():
        canon = min(members)
        for n in members:
            out[n] = (canon, len(members))
    return out


@pytest.mark.parametrize("seed", [0, 1])
def test_dedup_groups_random_graph(spark, seed):
    rng = random.Random(seed)
    nodes = list(range(80))
    edges = [(rng.randrange(80), rng.randrange(80)) for _ in range(40)]
    # A long chain forces multi-round transitive closure (pointer jumping).
    edges += [(i, i + 1) for i in range(60, 79)]
    edges = [(a, b) for a, b in edges if a != b]
    got = {
        r.node: (r.canonical_id, r.group_size)
        for r in dedup_groups(
            spark.createDataFrame(edges, "id_a long, id_b long"),
            spark.createDataFrame([(n,) for n in nodes], "node long"),
        ).collect()
    }
    assert got == _uf_expected(nodes, edges)


def test_dedup_groups_no_edges_all_singletons(spark):
    nodes = spark.range(10).select(F.col("id").alias("node"))
    empty = spark.createDataFrame([], "id_a long, id_b long")
    rows = dedup_groups(empty, nodes).collect()
    assert all(r.canonical_id == r.node and r.group_size == 1 for r in rows)
    assert len(rows) == 10
