"""Plugin surfaces (SURVEY §2.11 X1-X3).

* ``load_strategy`` — the reference's ``-a strategy=`` dotted-path
  loading (spiders/txs/blockscan.py:78-80): users point at their own
  strategy class; it must expose push/pop (the PushPopModel contract,
  strategies/txs/push_pop.py:4-37). Engine-side classes additionally
  take pandas batches (engine/strategies_vec.VecStrategy shape).
* ``WaveHooks`` — pipeline/middleware hooks (X2/X3): DataFrame→DataFrame
  transforms applied to each wave's emitted transfers / fetched rows
  (≅ process_item / process_spider_output), enabled per run like the
  reference's ``-a enable=``.
"""

from __future__ import annotations

import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame

from blockchainspider_spark.engine.strategies_vec import VEC_REGISTRY


def load_strategy(path_or_name: str):
    """Resolve a strategy class: a registry name ('BFS', 'TTRTime', …)
    or a dotted path 'package.module:ClassName' (custom plugin)."""
    if path_or_name in VEC_REGISTRY:
        return VEC_REGISTRY[path_or_name]
    if "." not in path_or_name and ":" not in path_or_name:
        raise ValueError(
            f"unknown strategy {path_or_name!r}: expected one of "
            f"{sorted(VEC_REGISTRY)} or a dotted path 'pkg.module:Class'"
        )
    module_name, _, cls_name = path_or_name.replace(":", ".").rpartition(".")
    module = importlib.import_module(module_name)
    cls = getattr(module, cls_name)
    for required in ("push", "pop"):
        if not callable(getattr(cls, required, None)):
            raise TypeError(f"strategy {path_or_name} lacks {required}()")
    return cls


@dataclass
class WaveHooks:
    """Ordered DataFrame transforms per wave output."""

    on_transfers: list[Callable[[DataFrame], DataFrame]] = field(default_factory=list)
    on_fetched: list[Callable[[DataFrame], DataFrame]] = field(default_factory=list)

    def apply_transfers(self, df: DataFrame) -> DataFrame:
        for hook in self.on_transfers:
            df = hook(df)
        return df

    def apply_fetched(self, df: DataFrame) -> DataFrame:
        for hook in self.on_fetched:
            df = hook(df)
        return df
