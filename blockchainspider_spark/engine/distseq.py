"""Distributed dense sequence assignment.

Replaces the global ``Window.orderBy`` (a single-task sort) + driver
``collect()`` pattern for assigning a contiguous, globally ordered
``seq`` to the new frontier of a crawl wave. At the 10^10-URL design
point a wave can carry ~10^8 rows — far beyond driver memory and far
beyond one sort task — so the assignment must stay on the executors.

Two paths, chosen by measured wave size (one ``count()`` over the
persisted input decides):

* **small wave** (≤ ``small_threshold`` rows — the common interactive
  case: seed waves, crawl tails, toy scales): a single-task sort via
  ``row_number`` over a constant-partition window. Still executor-side
  (the driver sees only the count scalar), but skips the range-boundary
  sampling pass and the per-partition counts collect — two whole jobs
  of fixed cost the big path pays per wave.
* **big wave**: fully distributed —
  1. ``repartitionByRange`` on the ordering key + ``sortWithinPartitions``
     — a distributed range sort; partition p holds a contiguous key range
     and ranges are ordered by partition id.
  2. per-partition row counts — the ONLY thing the driver sees is one row
     per partition (≤ ``n_partitions`` rows, independent of data size).
  3. prefix-sum the counts into per-partition offsets, broadcast them as
     a map literal, and assign ``seq = base + offset[pid] + row_number``
     with a ``Window.partitionBy(pid)`` — a per-partition window, never a
     global one.

The big path's ranged intermediate is ``localCheckpoint(eager=True)``-ed,
not merely persisted: ``spark_partition_id`` is captured per
materialization and ``repartitionByRange`` re-samples boundaries per
job, so on a real cluster an executor loss that evicted cached blocks
could silently recompute rows into different pids than the collected
counts. A local checkpoint truncates lineage — an evicted block is a
loud failure, never a silent re-shuffle. (Checkpoint blocks are freed by
the ContextCleaner once the assignment DataFrame is dropped.)
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# Below this many rows a single-task sort is cheaper than the range
# exchange's two extra fixed-cost jobs. 200k rows × ~100B key rows is
# ~20 MB in one task — comfortably below task limits; the big path takes
# over well before a single sort task could become memory- or time-bound.
SMALL_WAVE_THRESHOLD = 200_000


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
    small_threshold: int = SMALL_WAVE_THRESHOLD,
) -> SeqAssignment:
    """Assign ``seq = base_seq + 1 .. base_seq + N`` by the total order of
    ``key_cols`` (which must be unique per row), fully distributed.

    The driver materializes only the wave count plus (big waves only) the
    per-partition count rows; the data itself never leaves the executors.
    """
    spark = df.sparkSession
    if n_partitions is None:
        n_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    keys = [F.col(c).asc() for c in key_cols]

    # persist the INPUT first: both paths read it at least twice (size
    # count + assignment; the big path adds the RangePartitioner's
    # boundary-sampling scan), and without the cache every pass would
    # recompute the whole upstream pipeline (expand join, anti-join,
    # groupBy).
    src = df.persist()
    total = src.count()
    if total == 0:
        src.unpersist()
        empty = df.limit(0).withColumn(seq_col, F.lit(None).cast("long"))
        return SeqAssignment(df=empty, total=0, driver_rows=1)

    if total <= small_threshold:
        # single-task sort: all rows share the constant partition key, so
        # the window runs in one task over ≤ small_threshold rows. No
        # range sampling, no counts collect — the driver saw only the
        # count scalar above.
        w = Window.partitionBy(F.lit(0)).orderBy(*keys)
        out = src.withColumn(
            seq_col, (F.lit(base_seq) + F.row_number().over(w)).cast("long")
        )
        return SeqAssignment(df=out, total=total, driver_rows=1, _persisted=(src,))

    ranged = (
        src.repartitionByRange(n_partitions, *[F.col(c) for c in key_cols])
        .sortWithinPartitions(*keys)
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    counts = {
        r["_pid"]: r["n"]
        for r in ranged.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
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
    return SeqAssignment(df=out, total=total, driver_rows=1 + len(counts),
                         _persisted=(src,))
