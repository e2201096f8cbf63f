"""Block-ETL enrichment DAG vs a pandas-computed expectation."""

import pandas as pd
import pytest

from blockchainspider_spark.fixtures.chain import (
    TOPIC_1155_SINGLE,
    TOPIC_TRANSFER,
    make_chain,
    token_properties_for,
)
from blockchainspider_spark.operators import block_etl as E


@pytest.fixture(scope="module")
def chain(spark):
    blocks, txs, receipts, logs = make_chain(n_blocks=15, txs_per_block=6, seed=11)
    return {
        "pdf": (blocks, txs, receipts, logs),
        "blocks": spark.createDataFrame(blocks),
        "txs": spark.createDataFrame(txs),
        "receipts": spark.createDataFrame(receipts),
        "logs": spark.createDataFrame(logs),
    }


def test_block_range_scan(chain):
    got = E.scan_block_range(chain["blocks"], 1_000_002, 1_000_005).collect()
    assert [r.block_number for r in got] == [1_000_002, 1_000_003, 1_000_004, 1_000_005]


def test_receipt_enrichment_complete(chain):
    enriched = E.txs_with_receipts(chain["txs"], chain["receipts"])
    assert enriched.where("transaction_hash IS NULL").count() == 0
    assert enriched.count() == chain["txs"].count()


def test_topic_dispatch_and_shape_guards(chain):
    _, _, _, logs_pdf = chain["pdf"]
    tt = E.token_transfers_from_logs(chain["logs"]).toPandas()

    want_erc20 = sum(
        1 for t in logs_pdf["topics"] if t[0] == TOPIC_TRANSFER and len(t) == 3
    )
    want_erc721 = sum(
        1 for t in logs_pdf["topics"] if t[0] == TOPIC_TRANSFER and len(t) == 4
    )
    want_1155 = sum(
        1 for t in logs_pdf["topics"] if t[0] == TOPIC_1155_SINGLE and len(t) == 4
    )
    by_std = tt.groupby("standard").size().to_dict()
    assert by_std.get("erc20", 0) == want_erc20
    assert by_std.get("erc721", 0) == want_erc721
    assert by_std.get("erc1155", 0) == want_1155
    # malformed 5-topic Transfer logs must be dropped
    malformed = sum(1 for t in logs_pdf["topics"] if t[0] == TOPIC_TRANSFER and len(t) == 5)
    assert malformed > 0 and len(tt) == want_erc20 + want_erc721 + want_1155


def test_word_decode_roundtrip(chain):
    _, _, _, logs_pdf = chain["pdf"]
    tt = E.token_transfers_from_logs(chain["logs"]).toPandas()
    row = tt[tt["standard"] == "erc20"].iloc[0]
    src_log = logs_pdf[
        (logs_pdf["transaction_hash"] == row["transaction_hash"])
        & (logs_pdf["log_index"] == row["log_index"])
    ].iloc[0]
    assert row["address_from"] == "0x" + src_log["topics"][1][-40:]
    assert int(row["value"]) == int(src_log["data"], 16)


def test_contract_dim_and_enrichment(chain):
    tt = E.token_transfers_from_logs(chain["logs"])
    dim = E.build_contract_dim(tt)
    dim_rows = {r.contract_address: r for r in dim.collect()}
    assert len(dim_rows) == tt.select("contract_address").distinct().count()
    some = next(iter(dim_rows))
    assert dim_rows[some].token_symbol == token_properties_for(some)["token_symbol"]
    enriched = E.enrich_with_properties(tt, dim)
    assert enriched.where("token_symbol IS NULL").count() == 0


def test_created_contract_filter(chain):
    _, _, receipts_pdf, _ = chain["pdf"]
    got = E.created_contracts(chain["receipts"]).count()
    assert got == (receipts_pdf["created_contract"] != "").sum() > 0


def test_gas_trace_filter(chain):
    _, txs_pdf, _, _ = chain["pdf"]
    assert E.traceable_txs(chain["txs"]).count() == (txs_pdf["gas"] > 21000).sum()


def test_bloom_two_phase_dedup(spark, chain):
    tt = E.token_transfers_from_logs(chain["logs"])
    dim = E.build_contract_dim(tt)
    known = dim.limit(3).select("contract_address")
    new = E.bloom_dedup_new_contracts(dim, known)
    want = {r.contract_address for r in dim.join(known, "contract_address", "left_anti").collect()}
    assert {r.contract_address for r in new.collect()} == want


def test_priority_pagination_parity(chain):
    """S6 ordering: ascending block priority with row_number paging."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    w = Window.orderBy("block_number")
    paged = (
        chain["blocks"].withColumn("rn", F.row_number().over(w))
        .where((F.col("rn") > 5) & (F.col("rn") <= 10))
    )
    got = [r.block_number for r in paged.collect()]
    assert got == sorted(got) and len(got) == 5


def test_nft_metadata_enrichment(chain):
    tt = E.token_transfers_from_logs(chain["logs"])
    nft = tt.where(tt.standard == "erc721")
    enriched = E.nft_metadata_enrich(nft)
    rows = enriched.collect()
    assert len(rows) == nft.count() > 0
    for r in rows[:5]:
        assert r.metadata_url.startswith("https://ipfs.io/ipfs/")
        assert len(r.token_id_word) == 64
        assert int(r.token_id_word, 16) == int(r.token_id)
