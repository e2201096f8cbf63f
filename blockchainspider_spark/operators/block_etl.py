"""Block-ETL enrichment pipeline (trans.* family) as DataFrame stages.

The reference's middleware chain (SURVEY §3.2) — receipts → logs →
token-transfer topic dispatch → contract dim join → created-contract
filter — becomes a linear DAG of joins/explodes/projections, naturally
parallel over blocks. The per-contract "waiting room" (reference
token.py:380-402) dissolves: the wave barrier builds ``contract_dim``
first, then one broadcast join (J3/T8).

All topic routing and word decoding is built-in-function only (P6/P7,
F4/F5): element_at + when dispatch, substring/conv word decode — fully
whole-stage-codegen'd.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from blockchainspider_spark.fixtures.chain import (
    TOPIC_1155_BATCH,
    TOPIC_1155_SINGLE,
    TOPIC_TRANSFER,
)


def scan_block_range(blocks: DataFrame, start_blk: int, end_blk: int) -> DataFrame:
    """S6: block-range scan, ascending block priority (2^32−blk ≅ asc)."""
    return blocks.where(
        (F.col("block_number") >= start_blk) & (F.col("block_number") <= end_blk)
    ).orderBy("block_number")


def txs_with_receipts(transactions: DataFrame, receipts: DataFrame) -> DataFrame:
    """S11/J2: batched receipt enrichment — one join on transaction_hash
    instead of N per-tx RPCs (the eth_getBlockReceipts fast path)."""
    return transactions.join(
        receipts.withColumnRenamed("block_number", "r_block_number"),
        transactions.hash == receipts.transaction_hash,
        "left",
    ).drop("r_block_number")


def word_to_address(word_col):
    """F5: 32-byte topic word → 0x + last 40 hex chars, lowercased."""
    return F.lower(F.concat(F.lit("0x"), F.substring(word_col, -40, 40)))


def hex_to_dec(hex_col):
    """F4: 0x-hex → decimal string — exact ONLY to 63 bits (``conv`` is
    64-bit); the gate fixtures for this path fit 63 bits by construction.
    For real wei values (> 2^63) use ``functions/uint256.py``:
    ``hex_to_decimal38`` (exact to 2^104, gate row f4b_uint256_sum) or
    ``sum_uint256`` (full uint256 range via 52-bit limbs)."""
    return F.conv(F.regexp_replace(hex_col, "^0x", ""), 16, 10)


def token_transfers_from_logs(logs: DataFrame) -> DataFrame:
    """P6+P7: route logs by topics[0] and shape, decode transfer rows.

    * ERC-20 : Transfer topic, 3 topics, amount in data
    * ERC-721: Transfer topic, 4 topics, token id in topics[4]
    * ERC-1155 single: value+id packed in data words
    malformed shapes are dropped (reference token.py:94-124).
    """
    t0 = F.element_at("topics", 1)
    n = F.size("topics")
    erc20 = (
        logs.where((t0 == TOPIC_TRANSFER) & (n == 3))
        .select(
            "transaction_hash", "block_number", "log_index",
            F.col("address").alias("contract_address"),
            word_to_address(F.element_at("topics", 2)).alias("address_from"),
            word_to_address(F.element_at("topics", 3)).alias("address_to"),
            hex_to_dec(F.col("data")).alias("value"),
            F.lit("").alias("token_id"),
            F.lit("erc20").alias("standard"),
        )
    )
    erc721 = (
        logs.where((t0 == TOPIC_TRANSFER) & (n == 4))
        .select(
            "transaction_hash", "block_number", "log_index",
            F.col("address").alias("contract_address"),
            word_to_address(F.element_at("topics", 2)).alias("address_from"),
            word_to_address(F.element_at("topics", 3)).alias("address_to"),
            F.lit("1").alias("value"),
            hex_to_dec(F.element_at("topics", 4)).alias("token_id"),
            F.lit("erc721").alias("standard"),
        )
    )
    erc1155s = (
        logs.where((t0 == TOPIC_1155_SINGLE) & (n == 4))
        .select(
            "transaction_hash", "block_number", "log_index",
            F.col("address").alias("contract_address"),
            word_to_address(F.element_at("topics", 3)).alias("address_from"),
            word_to_address(F.element_at("topics", 4)).alias("address_to"),
            hex_to_dec(F.substring(F.col("data"), 67, 64)).alias("value"),
            hex_to_dec(F.substring(F.col("data"), 3, 64)).alias("token_id"),
            F.lit("erc1155").alias("standard"),
        )
    )
    batch = (
        logs.where((t0 == TOPIC_1155_BATCH) & (n == 4))
        .select(
            "transaction_hash", "block_number", "log_index",
            F.col("address").alias("contract_address"),
            word_to_address(F.element_at("topics", 3)).alias("address_from"),
            word_to_address(F.element_at("topics", 4)).alias("address_to"),
            F.lit("0").alias("value"),
            F.lit("").alias("token_id"),
            F.lit("erc1155-batch").alias("standard"),
        )
    )
    return erc20.unionByName(erc721).unionByName(erc1155s).unionByName(batch)


def _fetch_properties(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """S14: batched 'eth_call' property fetch — one Python invocation per
    Arrow batch of distinct contracts (≅ one RPC batch per partition)."""
    from blockchainspider_spark.fixtures.chain import token_properties_for

    for pdf in batches:
        yield pd.DataFrame([token_properties_for(c) for c in pdf["contract_address"]])


CONTRACT_DIM_SCHEMA = (
    "contract_address string, name string, token_symbol string, "
    "decimals int, total_supply string"
)


def build_contract_dim(token_transfers: DataFrame) -> DataFrame:
    """S14/J3: distinct contracts of the wave → batched property fetch.
    Result is a small dim table — broadcast it at the join site."""
    return (
        token_transfers.select("contract_address")
        .distinct()
        .mapInPandas(_fetch_properties, CONTRACT_DIM_SCHEMA)
    )


def enrich_with_properties(token_transfers: DataFrame, contract_dim: DataFrame) -> DataFrame:
    """J3: fact ⋈ broadcast contract dim (the dissolved waiting room)."""
    return token_transfers.join(F.broadcast(contract_dim), on="contract_address", how="left")


def _fetch_token_uris(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """S15 stage 1: batched 'tokenURI/uri(tokenId)' calls — deterministic
    fixture stand-in (ipfs:// URI derived from contract+token; md5 so the
    DuckDB gate oracle can derive the identical URI)."""
    import hashlib

    for pdf in batches:
        yield pd.DataFrame({
            "contract_address": pdf["contract_address"],
            "token_id": pdf["token_id"],
            "token_uri": [
                "ipfs://" + hashlib.md5(f"{c}/{t}".encode()).hexdigest()
                for c, t in zip(pdf["contract_address"], pdf["token_id"])
            ],
        })


def nft_metadata_enrich(nft_transfers: DataFrame) -> DataFrame:
    """S15/J5/F13/F14: two-stage NFT metadata lookup — distinct
    (contract, token_id) → batched tokenURI fetch → gateway URL rewrite
    (ipfs:// → https://ipfs.io/ipfs/, reference metadata.py:87-93) +
    zero-padded token word (metadata.py:133) → broadcast-join back onto
    the transfer facts on (contract_address, token_id)."""
    keys = nft_transfers.select("contract_address", "token_id").distinct()
    uris = keys.mapInPandas(
        _fetch_token_uris,
        "contract_address string, token_id string, token_uri string",
    )
    dim = uris.select(
        "contract_address", "token_id",
        F.regexp_replace("token_uri", "^ipfs://", "https://ipfs.io/ipfs/").alias("metadata_url"),
        F.lpad(F.lower(F.conv(F.col("token_id"), 10, 16)), 64, "0").alias("token_id_word"),
    )
    return nft_transfers.join(F.broadcast(dim), on=["contract_address", "token_id"], how="left")


def created_contracts(receipts: DataFrame) -> DataFrame:
    """P10/S13: receipts that deployed a contract → code-scan work list."""
    return receipts.where(F.col("created_contract") != "").select(
        "transaction_hash", "block_number", "created_contract"
    )


def traceable_txs(transactions: DataFrame) -> DataFrame:
    """P8/S12: only txs with gas > 21000 are trace candidates."""
    return transactions.where(F.col("gas") > 21000)


def bloom_dedup_new_contracts(
    contract_dim: DataFrame, known: DataFrame, fpp: float = 1e-4
) -> DataFrame:
    """U5: two-phase dedup — broadcast Bloom pre-filter (approximate, ≅
    the reference's ScalableBloomFilter) then exact anti-join limited to
    the Bloom-positive survivors. new = bloom-negative ∪ (bloom-positive
    ∖ known): the Bloom only cuts the anti-join probe volume; exactness
    comes from the anti-join (SURVEY U5 contract)."""
    from blockchainspider_spark.functions.bloom import NumpyBloom

    n_known = known.count()
    if not n_known:
        return contract_dim
    # distributed build: per-partition bit arrays OR-merged on the driver
    # — driver traffic is n_partitions × n_bits/8, independent of row
    # count, so a large `known` dimension never lands on the driver
    bloom = NumpyBloom(n_known, fpp)
    bloom.union_from_dataframe(known, "contract_address")

    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import BooleanType

    @pandas_udf(BooleanType())
    def might_contain(addrs: pd.Series) -> pd.Series:
        return bloom.might_contain_series(addrs)

    flagged = contract_dim.withColumn("_maybe_dup", might_contain(F.col("contract_address")))
    definitely_new = flagged.where(~F.col("_maybe_dup")).drop("_maybe_dup")
    survivors = (
        flagged.where(F.col("_maybe_dup"))
        .drop("_maybe_dup")
        .join(known.select("contract_address"), on="contract_address", how="left_anti")
    )
    return definitely_new.unionByName(survivors)
