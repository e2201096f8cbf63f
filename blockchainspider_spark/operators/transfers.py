"""Transfer-table operators: projection, adaptation, filters (SURVEY §2.3).

All pure DataFrame transforms — no Python UDFs; every expression stays
inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

ZERO_ADDR = "0x" + "0" * 40

#: canonical expansion order — total ordering of a node's transfers
#: (Etherscan sort=asc made total; shared with oracle/crawl.py)
CANONICAL_ORDER_COLS = ["block_number", "timestamp", "id"]


def project_raw_transfers(raw: DataFrame) -> DataFrame:
    """Raw scan rows → transfer schema: renames, casts, defaults (P2,
    reference external.py:132-148): ``from→address_from``, empty contract
    → zero address, missing symbol → 'native', missing decimals → 18."""
    return raw.select(
        F.lower(F.col("from")).alias("address_from"),
        F.lower(F.col("to")).alias("address_to"),
        F.col("value").cast("string").alias("value"),
        F.coalesce(F.col("tokenID"), F.lit("")).alias("token_id"),
        F.col("timeStamp").cast("long").alias("timestamp"),
        F.col("blockNumber").cast("long").alias("block_number"),
        F.when(F.coalesce(F.col("contractAddress"), F.lit("")) == "", F.lit(ZERO_ADDR))
        .otherwise(F.lower(F.col("contractAddress")))
        .alias("contract_address"),
        F.coalesce(F.col("tokenSymbol"), F.lit("native")).alias("symbol"),
        F.coalesce(F.col("tokenDecimal").cast("int"), F.lit(18)).alias("decimals"),
        F.col("hash"),
        F.col("gas").cast("string").alias("gas"),
        F.col("gasPrice").cast("string").alias("gas_price"),
    ).where((F.col("address_from") != "") & (F.col("address_to") != ""))  # P1


def with_symbol_identity(transfers: DataFrame) -> DataFrame:
    """Edge adaptation P3/F20 (reference push_pop.py:17-27): strategy
    symbol = ``symbol_contract[_tokenid]``; value as double for kernels."""
    identity = F.when(
        F.col("token_id") != "",
        F.concat_ws("_", "symbol", "contract_address", "token_id"),
    ).otherwise(F.concat_ws("_", "symbol", "contract_address"))
    return transfers.withColumn("symbol_identity", identity).withColumn(
        "value_d", F.col("value").cast("double")
    )


def endpoint_exploded(transfers: DataFrame) -> DataFrame:
    """Edge table pre-exploded to (endpoint, edge...) — turns the
    two-sided frontier-expansion join J1 into ONE equi-join. At cluster
    scale this view is what you bucket/partition by ``endpoint`` so the
    expand join co-locates without a shuffle per wave."""
    return transfers.selectExpr(
        "stack(2, address_from, address_to) as endpoint", "*"
    )


def write_bucketed_touch(transfers: DataFrame, table: str, n_buckets: int = 8,
                         path: str | None = None) -> DataFrame:
    """Materialize the endpoint-exploded view as a BUCKETED table on the
    expand-join key — the 100-TB layout: when the frontier outgrows
    broadcast, the per-wave sort-merge expand join reads the edge side
    already hash-distributed on ``endpoint`` (bucket metadata), so ONLY
    the (much smaller) frontier side shuffles — the multi-TB edge table
    never re-exchanges, wave after wave. Returns the table as a
    DataFrame. (Parquet + bucket metadata via the session catalog; on a
    real deployment this is the Iceberg table's bucket partition spec.)"""
    spark = transfers.sparkSession
    spark.sql(f"DROP TABLE IF EXISTS {table}")
    writer = (
        endpoint_exploded(transfers)
        .write.mode("overwrite")
        .bucketBy(n_buckets, "endpoint")
        .sortBy("endpoint")
    )
    if path is not None:  # external table (no warehouse-dir dependency)
        writer = writer.option("path", path)
    writer.saveAsTable(table)
    return spark.table(table)


def allow_list_filter(transfers: DataFrame, allowed: DataFrame | None) -> DataFrame:
    """Token allow-list (P4/J9, reference filter.py:6-30): left-semi join
    against the (small, broadcast) allow-list of
    ``contract_address[_token_id]`` identities; None = allow all."""
    if allowed is None:
        return transfers
    identity = F.when(
        F.col("token_id") != "",
        F.concat_ws("_", "contract_address", "token_id"),
    ).otherwise(F.col("contract_address"))
    keyed = transfers.withColumn("_token_identity", identity)
    return (
        keyed.join(
            F.broadcast(allowed.select(F.col("token_identity").alias("_token_identity"))),
            on="_token_identity",
            how="left_semi",
        ).drop("_token_identity")
    )


def utxo_to_edges(utxo: DataFrame) -> DataFrame:
    """UTXO adaptation (reference push_pop.py:31-40): only spent outputs
    become edges; tx ids act as graph nodes; empty symbol."""
    return utxo.where(F.col("is_spent")).select(
        F.col("id"),
        F.col("tx_from").alias("address_from"),
        F.col("tx_to").alias("address_to"),
        F.col("value").cast("string").alias("value"),
        F.lit("").alias("token_id"),
        F.col("timestamp"),
        F.col("block_number"),
        F.lit("").alias("contract_address"),
        F.lit("").alias("symbol"),
    )
