"""Exact >64-bit value arithmetic (functions/uint256.py).

The reference sums wei values as arbitrary-precision Python ints
(middlewares/txs/blockscan/external.py:137, utils/web3.py:74-80); these
tests pin the distributed equivalents against an independent Python-int
oracle, including values past 2^127 where even DuckDB's HUGEINT oracle
cannot follow (the gate row f4b_uint256_sum covers the HUGEINT-checkable
subrange).
"""

import random

import pytest
from pyspark.sql import functions as F

from blockchainspider_spark.functions.uint256 import (
    hex_to_decimal38,
    sum_uint256,
    uint256_limbs,
)


@pytest.fixture(scope="module")
def big_values():
    rng = random.Random(17)
    vals = [rng.getrandbits(bits) for bits in (40, 63, 64, 80, 104, 180, 250, 256)
            for _ in range(8)]
    vals += [0, 1, 2**63, 2**63 - 1, 2**104 - 1, 2**256 - 1]
    return vals


def test_hex_to_decimal38_exact_to_104_bits(spark):
    vals = [0, 1, 2**52, 2**63, 2**63 + 12345, 2**80 + 7, 2**104 - 1,
            10**26]  # ≈ total ETH supply in wei
    df = spark.createDataFrame([(hex(v),) for v in vals], "h string")
    got = [int(r.v) for r in
           df.select(hex_to_decimal38(F.col("h")).cast("string").alias("v")).collect()]
    assert got == vals


def test_uint256_limbs_roundtrip(spark, big_values):
    df = spark.createDataFrame([(hex(v),) for v in big_values], "h string")
    rows = df.select(*uint256_limbs(F.col("h"))).collect()
    base = 16 ** 13
    got = []
    for r in rows:
        acc = 0
        for i in range(5):
            acc = acc * base + r[f"_limb{i}"]
        got.append(acc)
    assert got == big_values


def test_sum_uint256_full_range_matches_python_ints(spark, big_values):
    """Grouped sums over values up to 2^256−1: per-limb Decimal partial
    aggregation + exact recombination equals the Python-int oracle —
    including group sums far beyond int128."""
    rows = [(f"g{i % 3}", hex(v)) for i, v in enumerate(big_values)]
    df = spark.createDataFrame(rows, "grp string, h string").repartition(8)
    got = {r.grp: int(r.value_sum)
           for r in sum_uint256(df, "h", group_cols=["grp"]).collect()}
    want = {}
    for g, h in rows:
        want[g] = want.get(g, 0) + int(h, 16)
    assert got == want
    assert max(want.values()) > 2**127, "fixture must exceed the HUGEINT range"


def test_sum_uint256_ungrouped(spark, big_values):
    df = spark.createDataFrame([(hex(v),) for v in big_values], "h string")
    [row] = sum_uint256(df, "h").collect()
    assert int(row.value_sum) == sum(big_values)


def test_sum_uint256_empty_input(spark):
    empty = spark.createDataFrame([], "h string")
    [row] = sum_uint256(empty, "h").collect()
    assert int(row.value_sum) == 0
    assert sum_uint256(empty, "h", group_cols=["h"]).count() == 0
