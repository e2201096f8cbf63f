"""Exact >64-bit value arithmetic (SURVEY §7 hard point 3).

Real wei values exceed 2^63, so the ``conv``-based ``hex_to_dec``
(operators/block_etl.py — exact only to 63 bits) cannot carry value
SUMS. The reference sums arbitrary-precision Python ints per row
(/root/reference/BlockchainSpider/middlewares/txs/blockscan/external.py:137,
utils/web3.py:74-80 — hex → ``int`` → arithmetic); the Spark-first
equivalents here keep the hot path JVM-side:

* ``hex_to_decimal38`` — chunked ``conv`` → ``Decimal(38,0)`` column,
  exact to 26 hex digits (2^104): two 52-bit chunks recombined with
  decimal arithmetic, whole-stage-codegen'd, no Python. Covers every
  realistic wei amount (total ETH supply ≈ 1.2e26 wei ≈ 2^87) and has a
  DuckDB HUGEINT oracle (int128) for the gate.
* ``sum_uint256`` — the FULL uint256 range, distributed: split each
  value into five 52-bit limbs (JVM substring+conv), sum each limb
  independently as Decimal(38,0) (map-side partial aggregation, one
  shuffle), then recombine the ≤5 per-group limb sums with exact Python
  ints in one Arrow batch — Python touches one row per GROUP, never one
  row per value.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

LIMB_HEX = 13          # 13 hex digits = 52 bits per limb
N_LIMBS = 5            # 5 × 13 = 65 hex digits ≥ uint256's 64


def _clean_hex(col: Column) -> Column:
    return F.lpad(F.lower(F.regexp_replace(col, "^0x", "")), N_LIMBS * LIMB_HEX, "0")


def hex_to_decimal38(col: Column) -> Column:
    """0x-hex string → exact ``Decimal(38,0)``, valid to 26 hex digits
    (2^104). Two 52-bit ``conv`` chunks — each far inside conv's 64-bit
    window — recombined in decimal arithmetic. Inputs longer than 26
    significant hex digits would silently truncate; use ``sum_uint256``
    for the full range."""
    h = F.lpad(F.lower(F.regexp_replace(col, "^0x", "")), 2 * LIMB_HEX, "0")
    hi = F.conv(F.substring(h, 1, LIMB_HEX), 16, 10).cast("decimal(38,0)")
    lo = F.conv(F.substring(h, LIMB_HEX + 1, LIMB_HEX), 16, 10).cast("decimal(38,0)")
    return (hi * F.lit(16 ** LIMB_HEX).cast("decimal(20,0)") + lo).cast("decimal(38,0)")


def uint256_limbs(col: Column) -> list[Column]:
    """Five 52-bit limb columns (most-significant first), each exact in a
    long — the shuffle-friendly representation of a uint256."""
    h = _clean_hex(col)
    return [
        F.conv(F.substring(h, 1 + i * LIMB_HEX, LIMB_HEX), 16, 10)
        .cast("long")
        .alias(f"_limb{i}")
        for i in range(N_LIMBS)
    ]


def sum_uint256(df: DataFrame, value_col: str, group_cols: list[str] | None = None,
                out_col: str = "value_sum") -> DataFrame:
    """Exact distributed sum of full-range uint256 hex values.

    Per-limb sums are Decimal(38,0) — a limb is < 2^52, so the partial
    sums stay exact past 10^22 rows — and the only Python work is the
    limb recombination, one row per group (or one row total), via exact
    arbitrary-precision ints. Output is the decimal string of the sum
    (a uint256 sum can exceed every fixed-width SQL type)."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import StringType

    group_cols = group_cols or []
    limbs = uint256_limbs(F.col(value_col))
    limbed = df.select(*group_cols, *limbs)
    # coalesce: an ungrouped agg over zero rows yields NULL sums — the
    # empty sum is 0
    aggs = [
        F.coalesce(
            F.sum(F.col(f"_limb{i}").cast("decimal(38,0)")),
            F.lit(0).cast("decimal(38,0)"),
        ).alias(f"_s{i}")
        for i in range(N_LIMBS)
    ]
    summed = (limbed.groupBy(*group_cols).agg(*aggs) if group_cols
              else limbed.agg(*aggs))

    @pandas_udf(StringType())
    def combine(s0: pd.Series, s1: pd.Series, s2: pd.Series,
                s3: pd.Series, s4: pd.Series) -> pd.Series:
        base = 16 ** LIMB_HEX
        out = []
        for row in zip(s0, s1, s2, s3, s4):
            acc = 0
            for s in row:  # most-significant limb first
                acc = acc * base + int(s)
            out.append(str(acc))
        return pd.Series(out)

    return summed.select(
        *group_cols, combine(*[F.col(f"_s{i}") for i in range(N_LIMBS)]).alias(out_col)
    )
