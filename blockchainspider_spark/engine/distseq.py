"""Distributed dense sequence assignment.

Replaces the global ``Window.orderBy`` (a single-task sort) + driver
``collect()`` pattern for assigning a contiguous, globally ordered
``seq`` to the new frontier of a crawl wave. At the 10^10-URL design
point a wave can carry ~10^8 rows — far beyond driver memory and far
beyond one sort task — so the assignment must stay on the executors:

1. ``repartitionByRange`` on the ordering key + ``sortWithinPartitions``
   — a distributed range sort; partition p holds a contiguous key range
   and ranges are ordered by partition id.
2. per-partition row counts — the ONLY thing the driver sees is one row
   per partition (≤ ``n_partitions`` rows, independent of data size).
3. prefix-sum the counts into per-partition offsets, broadcast them as
   a map literal, and assign ``seq = base + offset[pid] + row_number``
   with a ``Window.partitionBy(pid)`` — a per-partition window, never a
   global one.

The intermediate is persisted between steps 2 and 3 because
``repartitionByRange`` samples range boundaries per job; without the
persist the counts job and the downstream job could disagree on which
partition a row landed in.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


@dataclass
class SeqAssignment:
    df: DataFrame          # input columns + `seq_col` (long), `key_cols` intact
    total: int             # number of rows that received a seq
    driver_rows: int       # rows materialized on the driver (≤ n_partitions)
    _persisted: tuple[DataFrame, ...] = ()

    def cleanup(self) -> None:
        """Unpersist the internal intermediates. Call after ``df`` has
        been materialized (e.g. written to parquet)."""
        for df in self._persisted:
            df.unpersist()
        self._persisted = ()


def assign_global_seq(
    df: DataFrame,
    key_cols: list[str],
    base_seq: int = 0,
    n_partitions: int | None = None,
    seq_col: str = "seq",
) -> SeqAssignment:
    """Assign ``seq = base_seq + 1 .. base_seq + N`` by the total order of
    ``key_cols`` (which must be unique per row), fully distributed.

    The driver materializes only the per-partition count rows; the data
    itself never leaves the executors.
    """
    spark = df.sparkSession
    if n_partitions is None:
        n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    keys = [F.col(c).asc() for c in key_cols]

    # persist the INPUT before the range exchange: RangePartitioner runs a
    # sampling pass over its child, so an unpersisted input would have its
    # whole upstream pipeline (expand join, anti-join, groupBy) computed
    # twice — once for boundary sampling, once for the real exchange. With
    # the input cached, the sampling scan fills the cache and every later
    # pass reads it.
    src = df.persist()
    ranged = (
        src.repartitionByRange(n_partitions, *[F.col(c) for c in key_cols])
        .sortWithinPartitions(*keys)
        .withColumn("_pid", F.spark_partition_id())
        .persist()
    )
    counts = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    total = int(sum(counts.values()))
    if total == 0:
        ranged.unpersist()
        src.unpersist()
        empty = df.limit(0).withColumn(seq_col, F.lit(None).cast("long"))
        return SeqAssignment(df=empty, total=0, driver_rows=len(counts))

    offsets: dict[int, int] = {}
    acc = 0
    for pid in sorted(counts):
        offsets[pid] = acc
        acc += counts[pid]
    offset_map = F.create_map(
        *[x for pid, off in offsets.items() for x in (F.lit(pid), F.lit(off))]
    )
    w = Window.partitionBy("_pid").orderBy(*keys)
    out = (
        ranged.withColumn("_rn", F.row_number().over(w))
        .withColumn(
            seq_col,
            (F.lit(base_seq) + offset_map[F.col("_pid")] + F.col("_rn")).cast("long"),
        )
        .drop("_pid", "_rn")
    )
    return SeqAssignment(df=out, total=total, driver_rows=len(counts),
                         _persisted=(ranged, src))
