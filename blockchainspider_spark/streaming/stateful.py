"""Custom stateful streaming operator: cross-batch first-seen dedup.

The crawl engine's URL-seen set, as a Structured Streaming stateful
operator (SURVEY engine mapping: ``applyInPandasWithState`` for custom
state): keys are hash-bucketed; each bucket's state holds the
fingerprints seen so far; only first occurrences pass through. This is
the streaming twin of the batch anti-join J7 — same semantics, state
partitioned exactly like the batch seen table (hash on fingerprint).

State size note: at 10^10-URL scale, per-bucket state would hold a
Bloom/cuckoo digest + spill table rather than the raw list kept here;
the operator contract (bucket key → state → passed-through rows) stays
identical.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def first_seen_dedup(
    stream: DataFrame, key_col: str, n_buckets: int = 16
) -> DataFrame:
    """Emit only the first row per distinct ``key_col`` across the whole
    stream; state persists across micro-batches via the checkpoint."""
    out_schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in stream.schema.fields)

    def dedup_fn(key, pdfs, state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            keys = pdf[key_col].astype(str)
            fresh = pdf[~keys.isin(seen)].drop_duplicates(subset=[key_col])
            seen.update(fresh[key_col].astype(str).tolist())
            if len(fresh):
                yield fresh.drop(columns=["_bucket"])
        state.update((sorted(seen),))

    with_bucket = stream.withColumn(
        "_bucket", F.pmod(F.xxhash64(F.col(key_col).cast("string")), F.lit(n_buckets))
    )
    return with_bucket.groupBy("_bucket").applyInPandasWithState(
        dedup_fn,
        outputStructType=out_schema,
        stateStructType="seen array<string>",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
