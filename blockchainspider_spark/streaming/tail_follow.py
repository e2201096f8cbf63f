"""Chain-head tail-follow: checkpointed micro-batch cursor (S7/T3).

Reference semantics (spiders/trans/evm/blocks.py:152-189): poll the
head, emit requests for ``[cursor, head]``, advance the cursor to
head+1, repeat. Here the cursor is a tiny JSON checkpoint (≅ a stream
offset) and each poll is one bounded DataFrame — the micro-batch that
feeds the block-ETL DAG. Restart-safe: a new instance resumes from the
checkpointed cursor (T5 state lives on disk, not in memory).

Structured Streaming note: at cluster scale the same contract is a
rate-limited ``readStream`` source; the driver-side poll loop is the
sandbox-faithful equivalent (no long-running stream in tests), with the
identical offset semantics.
"""

from __future__ import annotations

import json
import os
from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


class TailFollowCursor:
    def __init__(self, checkpoint_path: str, start_block: int):
        self.checkpoint_path = checkpoint_path
        self._cursor = start_block
        if os.path.exists(checkpoint_path):
            with open(checkpoint_path) as fh:
                self._cursor = json.load(fh)["cursor"]

    @property
    def cursor(self) -> int:
        return self._cursor

    def advance(self, new_cursor: int) -> None:
        self._cursor = new_cursor
        tmp = self.checkpoint_path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump({"cursor": new_cursor}, fh)
        os.replace(tmp, self.checkpoint_path)  # atomic offset commit


class TailFollowSource:
    """Poll-based micro-batch source over a blocks table."""

    def __init__(
        self,
        blocks: DataFrame,
        head_fn: Callable[[], int],
        checkpoint_path: str,
        start_block: int,
        max_batch: int = 1000,
    ):
        self.blocks = blocks
        self.head_fn = head_fn
        self.cursor = TailFollowCursor(checkpoint_path, start_block)
        self.max_batch = max_batch

    def poll(self) -> DataFrame | None:
        """One micro-batch: blocks in [cursor, min(head, cursor+max_batch)],
        ascending (the reference's 2^32−blk priority); None if caught up."""
        head = self.head_fn()
        lo = self.cursor.cursor
        if head < lo:
            return None
        hi = min(head, lo + self.max_batch - 1)
        batch = self.blocks.where(
            (F.col("block_number") >= lo) & (F.col("block_number") <= hi)
        ).orderBy("block_number")
        self.cursor.advance(hi + 1)
        return batch
