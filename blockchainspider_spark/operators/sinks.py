"""Compat sinks (SURVEY §2.2): reference CSV/JSONL output contracts.

The primary sink of the engine is the parquet snapshot (batch_bfs
checkpoints); these exporters reproduce the reference's file contracts
for drop-in consumers:

* K1 transfers CSV — header = sorted field names, ``id`` dropped
  (pipelines/subgraph.py:37-39,54)
* K3 rank CSV — full rewrite, rank desc (pipelines/subgraph.py:108-118)
* K4 per-class fan-out — one directory per item class
  (pipelines/trans.py:48-85) via partitionBy
* K5 label reports JSONL (pipelines/label.py:18-30)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def transfers_csv_columns(df: DataFrame) -> DataFrame:
    """K1 column contract: sorted field names, id dropped."""
    cols = sorted(c for c in df.columns if c != "id")
    return df.select(*cols)


def write_transfers_csv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    transfers_csv_columns(df).write.mode(mode).option("header", True).csv(path)


def write_rank_csv(ranks: DataFrame, path: str) -> None:
    """K3: snapshot rewrite, ordered by rank desc (node asc tiebreak —
    reference order is dict order; the export contract is the sort)."""
    (
        ranks.select("node", "rank")
        .orderBy(F.desc("rank"), F.asc("node"))
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .csv(path)
    )


def write_per_class(df: DataFrame, class_col: str, path: str) -> None:
    """K4: per-item-class fan-out as a partitioned write."""
    df.write.mode("overwrite").partitionBy(class_col).parquet(path)


def write_reports_jsonl(reports: DataFrame, path: str) -> None:
    """K5: JSON-lines label reports."""
    reports.write.mode("overwrite").json(path)
