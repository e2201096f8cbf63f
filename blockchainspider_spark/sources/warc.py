"""WARC archive source/sink + CDX index for the crawl tier.

The reference keeps fetched pages as transient Scrapy responses
(BlockchainSpider spiders/labels/web.py); an archival crawl persists
them. This module puts the pure codec (functions/warc.py) on Spark:

* ``write_warc`` — fetched pages → sharded ``.warc.gz`` files, one gzip
  member per record (the random-access layout Common Crawl uses), one
  shard per partition, written on the executors (the driver never sees
  a page body).
* ``read_warc`` — ``.warc(.gz)`` shards → a records DataFrame with the
  HTTP status/payload split out and per-record (filename, offset,
  length) — exactly the columns a CDX line needs.
* ``cdx_index`` — records → the SURT-sorted lookup index.

Scale shape: a shard is one ``binaryFile`` row, so parallelism = number
of shards (real crawls cap shards at ~1 GiB for exactly this reason —
document and keep that contract: ``write_warc`` starts a new shard
every ``max_shard_bytes``). Parsing is an Arrow-batched ``mapInPandas``
kernel over shard bytes; the CDX sort is a plain ``orderBy`` on the
SURT key (a range-partitioned shuffle — scale-safe, no driver sort).
"""

from __future__ import annotations

import os
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import StringType

from blockchainspider_spark.functions.warc import (
    build_record, build_response_record, parse_warc, surt,
)

WARC_RECORD_SCHEMA = (
    "filename string, offset long, length long, warc_type string, "
    "record_id string, target_uri string, date string, http_status int, "
    "payload binary, payload_digest string, block_len long"
)


# --------------------------------------------------------------------------
# sink
# --------------------------------------------------------------------------

def write_warc(pages: DataFrame, out_dir: str, *,
               date: str = "2026-01-01T00:00:00Z",
               max_shard_bytes: int = 1 << 30,
               warcinfo: bool = True) -> None:
    """Pages ``(url string, status int, content_type string,
    payload binary)`` → ``<out_dir>/part-<pid>-<k>.warc.gz`` shards.

    Executor-side only: each task streams its partition into gzip
    members and rolls to a new shard file when the current one passes
    ``max_shard_bytes`` (the ~1 GiB contract that keeps one shard ≈ one
    read task downstream). Each shard opens with a ``warcinfo`` record
    (the spec's recommended layout; ``warcinfo=False`` disables it).
    Record IDs and gzip headers are deterministic (functions/warc.py),
    so a retried task rewrites an identical shard."""
    reasons = {200: "OK", 301: "Moved Permanently", 304: "Not Modified",
               404: "Not Found", 500: "Internal Server Error"}
    info_block = (b"software: blockchainspider-spark\r\n"
                  b"format: WARC File Format 1.1\r\n")

    def write_partition(rows) -> None:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        os.makedirs(out_dir, exist_ok=True)
        shard_no, written, fh = 0, 0, None
        try:
            for row in rows:
                rec = build_response_record(
                    row["url"], int(row["status"]),
                    reasons.get(int(row["status"]), "Unknown"),
                    row["content_type"], bytes(row["payload"]),
                    date=date, gzip_member=True)
                if fh is None or written + len(rec) > max_shard_bytes:
                    if fh is not None:
                        fh.close()
                    name = f"part-{pid:05d}-{shard_no}.warc.gz"
                    fh = open(os.path.join(out_dir, name), "wb")
                    shard_no, written = shard_no + 1, 0
                    if warcinfo:
                        info = build_record(
                            "warcinfo", info_block, date=date,
                            content_type="application/warc-fields",
                            extra_fields={"WARC-Filename": name},
                            gzip_member=True)
                        fh.write(info)
                        written += len(info)
                fh.write(rec)
                written += len(rec)
        finally:
            if fh is not None:
                fh.close()

    pages.select("url", "status", "content_type", "payload") \
         .foreachPartition(write_partition)


# --------------------------------------------------------------------------
# source
# --------------------------------------------------------------------------

def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """``.warc(.gz)`` shards → records DataFrame (one input row per
    shard via ``binaryFile``; the parse kernel is Arrow-batched and
    emits per-record byte offsets for the CDX index)."""
    shards = spark.read.format("binaryFile").load(path) \
                  .select("path", "content")

    def kernel(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cols = ["filename", "offset", "length", "warc_type", "record_id",
                "target_uri", "date", "http_status", "payload",
                "payload_digest", "block_len"]
        for pdf in batches:
            rows = []
            for path_, content in zip(pdf["path"], pdf["content"]):
                fname = os.path.basename(path_)
                for rec in parse_warc(bytes(content)):
                    rows.append({
                        "filename": fname,
                        "offset": rec["offset"],
                        "length": rec["length"],
                        "warc_type": rec["warc_type"],
                        "record_id": rec["record_id"],
                        "target_uri": rec["target_uri"],
                        "date": rec["date"],
                        "http_status": rec["http_status"],
                        "payload": rec["payload"],
                        "payload_digest": rec["fields"].get("warc-payload-digest"),
                        "block_len": len(rec["block"]),
                    })
            yield pd.DataFrame(rows, columns=cols)

    return shards.mapInPandas(kernel, WARC_RECORD_SCHEMA)


# --------------------------------------------------------------------------
# CDX index
# --------------------------------------------------------------------------

@pandas_udf(StringType())
def surt_key(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: surt(u) if u is not None else None)


def cdx_index(records: DataFrame) -> DataFrame:
    """Records → the CDX lookup index: one row per response record,
    keyed by (SURT, 14-digit timestamp), carrying everything a reader
    needs to random-access the record (filename, offset, length).
    The global sort is Spark's range-partitioned orderBy — each output
    file is internally sorted and files are range-disjoint, which is
    the binary-searchable layout real CDX readers expect."""
    ts14 = F.regexp_replace(F.col("date"), "[^0-9]", "").substr(1, 14)
    return (
        records.where(F.col("warc_type") == "response")
        .select(
            surt_key(F.col("target_uri")).alias("surt"),
            ts14.alias("ts"),
            F.col("target_uri").alias("original"),
            F.col("http_status").alias("status"),
            F.col("payload_digest").alias("digest"),
            F.col("filename"), F.col("offset"), F.col("length"),
        )
        .orderBy("surt", "ts")
    )
