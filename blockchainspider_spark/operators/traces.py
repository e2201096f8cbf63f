"""Trace-tree flatten (S12/X4): nested call trees → rows per call.

``debug_traceBlockByNumber`` returns one nested call tree per tx
(reference middlewares/trans/trace.py:27-90); the DCFG tracer returns a
similar nested block/edge document (dcfg.py:146-258). Relational
flattening: parse with a depth-``k`` schema'd ``from_json`` and run an
iterative frontier of ``posexplode`` steps — one DataFrame pass per
depth level, no recursion in Python, no UDF. Depth is bounded per level
(EVM call depth ≤1024, practical traces ≪ that); each level is a lazy
union branch, so Catalyst sees one plan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _call_schema(depth: int) -> str:
    """type/from/to/value/gas + nested calls[] up to ``depth`` levels."""
    core = "type string, `from` string, `to` string, value string, gas string"
    schema = core
    for _ in range(depth):
        schema = f"{core}, calls array<struct<{schema}>>"
    return schema


def flatten_call_trees(traces: DataFrame, tx_col: str = "transaction_hash",
                       json_col: str = "trace_json", max_depth: int = 6) -> DataFrame:
    """One row per call with (tx, path, depth, type, from, to, value, gas).

    ``path`` is the position chain ("0.2.1") — the deterministic call id
    the reference derives from traversal order.
    """
    parsed = traces.select(
        F.col(tx_col).alias("tx"),
        F.from_json(F.col(json_col), f"struct<{_call_schema(max_depth)}>").alias("call"),
    )
    def flat(level_df):
        # nested struct widths differ per level → project to plain
        # columns before the union so all branches share one schema
        return level_df.select(
            "tx", "path", "depth",
            F.col("call.type").alias("call_type"),
            F.col("call.from").alias("address_from"),
            F.col("call.to").alias("address_to"),
            F.col("call.value").alias("value"),
            F.col("call.gas").alias("gas"),
        )

    root = parsed.select(
        "tx", F.lit("0").alias("path"), F.lit(0).alias("depth"), F.col("call"),
    )
    flat_levels = [flat(root)]
    frontier = root
    for _ in range(max_depth):
        call_fields = frontier.schema["call"].dataType.fieldNames()
        if "calls" not in call_fields:  # deepest schema level reached
            break
        children = (
            frontier.where(F.col("call.calls").isNotNull())
            .select(
                "tx", "path", "depth",
                F.posexplode("call.calls").alias("pos", "child"),
            )
            .select(
                "tx",
                F.concat_ws(".", "path", F.col("pos").cast("string")).alias("path"),
                (F.col("depth") + 1).alias("depth"),
                F.col("child").alias("call"),
            )
        )
        flat_levels.append(flat(children))
        frontier = children
    out = flat_levels[0]
    for lvl in flat_levels[1:]:
        out = out.unionByName(lvl)
    return out.where(F.col("call_type").isNotNull())
