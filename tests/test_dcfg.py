"""X4 DCFG tracer operators: request construction + response flatten
(reference middlewares/trans/dcfg.py:190-258; the gate row
x4_dcfg_tracer_roundtrip pins the tx-request path end-to-end)."""

import json

import pandas as pd
from pyspark.sql import functions as F

from blockchainspider_spark.operators.dcfg import (
    DCFG_TRACER_JS,
    dcfg_block_requests,
    dcfg_trace_requests,
    flatten_dcfg_blocks,
)


def test_block_requests_hex_tag_and_priority(spark):
    blocks = spark.createDataFrame(pd.DataFrame({"block_number": [255, 16_000_000]}))
    rows = {r.block_number: r for r in dcfg_block_requests(blocks).collect()}
    body = json.loads(rows[255].body)
    assert body["method"] == "debug_traceBlockByNumber"
    # params[0] is the BARE hex tag per the JSON-RPC debug_trace* spec
    # (ADVICE r4 — an object wrapper is rejected by real providers)
    assert body["params"][0] == "0xff"
    assert body["params"][1]["tracer"] == DCFG_TRACER_JS
    # ascending block order via 2^32 − block (reference blocks.py:134)
    assert rows[255].priority > rows[16_000_000].priority


def test_trace_requests_gas_filter_strict(spark):
    txs = spark.createDataFrame(pd.DataFrame({
        "hash": ["a", "b", "c"], "gas": ["21000", "21001", "50000"],
    }))
    got = {r.transaction_hash for r in dcfg_trace_requests(txs).collect()}
    assert got == {"b", "c"}  # bare transfers (gas == 21000) excluded


def test_flatten_blocks_drops_unknown_opcodes(spark):
    resp = spark.createDataFrame(pd.DataFrame({
        "transaction_hash": ["t"],
        "result_json": [json.dumps({
            "blocks": [{"contract_address": "0xc", "start_pc": 4,
                        "operations": [0x60, 0x9999, 0x56]}],
            "edges": [],
        })],
    }))
    rows = flatten_dcfg_blocks(resp).collect()
    assert len(rows) == 1
    # unknown 0x9999 dropped, like the reference's NUM2OP_NAME.get guard
    assert rows[0].operations == ["PUSH1", "JUMP"]
    assert rows[0].start_pc == 4
