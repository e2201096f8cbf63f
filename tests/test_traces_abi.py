"""Call-tree flatten (S12/X4) + ABI word decode gating (F7/F8)."""

import json

import pandas as pd
import pytest

from blockchainspider_spark.functions import abi
from blockchainspider_spark.operators.traces import flatten_call_trees


def _tree():
    return {
        "type": "CALL", "from": "0xa", "to": "0xb", "value": "0x1", "gas": "0x5208",
        "calls": [
            {"type": "STATICCALL", "from": "0xb", "to": "0xc", "value": "0x0",
             "gas": "0x100",
             "calls": [
                 {"type": "DELEGATECALL", "from": "0xc", "to": "0xd",
                  "value": "0x0", "gas": "0x80"},
             ]},
            {"type": "CALL", "from": "0xb", "to": "0xe", "value": "0x2", "gas": "0x200"},
        ],
    }


def test_flatten_call_tree(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"transaction_hash": ["t1"], "trace_json": [json.dumps(_tree())]})
    )
    rows = {r.path: r for r in flatten_call_trees(df, max_depth=4).collect()}
    assert set(rows) == {"0", "0.0", "0.0.0", "0.1"}
    assert rows["0"].call_type == "CALL" and rows["0"].depth == 0
    assert rows["0.0.0"].call_type == "DELEGATECALL" and rows["0.0.0"].depth == 2
    assert rows["0.1"].address_to == "0xe"


def test_flatten_depth_guard(spark):
    """Calls below max_depth are dropped, not mis-attributed."""
    deep = {"type": "CALL", "from": "a", "to": "b", "value": "0x0", "gas": "0x1"}
    node = deep
    for _ in range(5):
        node["calls"] = [{"type": "CALL", "from": "a", "to": "b", "value": "0x0", "gas": "0x1"}]
        node = node["calls"][0]
    df = spark.createDataFrame(
        pd.DataFrame({"transaction_hash": ["t1"], "trace_json": [json.dumps(deep)]})
    )
    got = flatten_call_trees(df, max_depth=2).collect()
    assert max(r.depth for r in got) == 2


def test_uint256_exact_decode():
    big = 2**200 + 12345
    s = pd.Series([hex(big), "0x0", "0x"])
    out = abi.decode_uint256_series(s)
    assert out.tolist() == [str(big), "0", "0"]


def test_keccak_and_abi_gated():
    with pytest.raises(NotImplementedError):
        abi.keccak_selector("name()")
    with pytest.raises(NotImplementedError):
        abi.abi_decode_series(["uint256"], pd.Series([b"\x00"]))
