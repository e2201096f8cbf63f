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


# --------------------------------------------------------------------- K6/K7
#
# The reference publishes items to RabbitMQ (plugins/rabbit/pipelines.py:
# 24-60 — JSON body, routing key ``<prefix>.<ItemClass>``) and upserts
# rows into Postgres models (plugins/database/models.py:14-36). Neither a
# broker nor a database exists in this container, so both sinks run
# against file-backed doubles by URI scheme; the Spark-side plumbing
# (row→JSON serialization, routing-key partitioning, foreachBatch wiring,
# schema→DDL mapping, JDBC writer config) is real and tested.


def publish_to_queue(df: DataFrame, queue_uri: str, routing_prefix: str,
                     item_class: str) -> None:
    """K6: publish every row as one JSON message under routing key
    ``<prefix>.<ItemClass>`` (the reference's process_item contract).
    Serialization (``to_json(struct(*))``) and partitioning stay on the
    executors — the driver never sees a message.

    ``queue_uri`` schemes: ``file-queue://<dir>`` appends messages as
    text files under ``<dir>/routing_key=<key>/`` (the test double);
    ``amqp://`` would slot a foreachPartition publisher here and raises
    until a broker exists."""
    key = f"{routing_prefix}.{item_class}"
    messages = df.select(
        F.lit(key).alias("routing_key"),
        F.to_json(F.struct(*[F.col(c) for c in df.columns])).alias("body"),
    )
    if queue_uri.startswith("file-queue://"):
        out = queue_uri[len("file-queue://"):]
        messages.write.mode("append").partitionBy("routing_key").text(out)
    elif queue_uri.startswith("amqp://"):
        # REAL wire protocol since round 5 (functions/amqp.py, loopback-
        # tested): amqp://[user:pass@]host:port/exchange — one AMQP
        # connection per partition, one Basic.Publish per row; the
        # driver never sees a message body
        from urllib.parse import urlsplit

        from blockchainspider_spark.functions.amqp import publish_partition

        parts = urlsplit(queue_uri)
        host = parts.hostname or "127.0.0.1"
        port = parts.port or 5672
        user = parts.username or "guest"
        password = parts.password or "guest"
        exchange = (parts.path or "/").lstrip("/")
        messages.foreachPartition(
            lambda rows: publish_partition(rows, host, port, exchange,
                                           user=user, password=password)
        )
    else:
        raise ValueError(f"unknown queue uri scheme: {queue_uri}")


def make_queue_publisher(queue_uri: str, routing_prefix: str, item_class: str):
    """K6 streaming wiring: a ``foreachBatch`` callable —
    ``writeStream.foreachBatch(make_queue_publisher(...))`` publishes
    each micro-batch through the same path as the batch sink."""

    def publish(batch_df: DataFrame, batch_id: int) -> None:
        publish_to_queue(batch_df, queue_uri, routing_prefix, item_class)

    return publish


# Spark type → Postgres DDL type, following the reference models
# (plugins/database/models.py): Numeric(78,0) for uint256 values,
# BigInteger for blocks/timestamps, String(n) for addresses/hashes.
_PG_TYPES = {
    "string": "TEXT",
    "long": "BIGINT",
    "bigint": "BIGINT",
    "int": "INTEGER",
    "double": "DOUBLE PRECISION",
    "boolean": "BOOLEAN",
    "decimal(38,0)": "NUMERIC(78,0)",
    "binary": "BYTEA",
    "timestamp": "TIMESTAMP",
}


def table_ddl(df: DataFrame, table: str) -> str:
    """K7 model mapping: CREATE TABLE mirroring the reference's
    SQLAlchemy models' type discipline for this DataFrame's schema."""
    cols = ", ".join(
        f"{f.name} {_PG_TYPES.get(f.dataType.simpleString(), 'TEXT')}"
        for f in df.schema.fields
    )
    return f"CREATE TABLE IF NOT EXISTS {table} ({cols})"


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append",
               properties: dict | None = None) -> None:
    """K7: JDBC writer. ``jdbc:`` URLs go through Spark's real JDBC sink
    (numPartitions/batchsize from ``properties``); ``file-db://<dir>``
    is the test double — parquet per table + the DDL the real path would
    issue, so the writer config and schema mapping are exercised without
    a database."""
    if url.startswith("file-db://"):
        import os

        base = os.path.join(url[len("file-db://"):], table)
        df.write.mode(mode).parquet(os.path.join(base, "rows"))
        os.makedirs(base, exist_ok=True)
        with open(os.path.join(base, "schema.sql"), "w") as fh:
            fh.write(table_ddl(df, table) + "\n")
    elif url.startswith("jdbc:"):
        writer = df.write.mode(mode).format("jdbc").option("url", url).option(
            "dbtable", table
        )
        for k, v in (properties or {}).items():
            writer = writer.option(k, v)
        writer.save()
    else:
        raise ValueError(f"unknown jdbc url scheme: {url}")
