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


def _w(v: int) -> bytes:
    return v.to_bytes(32, "big")


def test_keccak_selectors_match_known_vectors():
    """F8: the exact selectors the reference derives with Web3.keccak
    (utils/token.py:110,143) — canonical ERC20 values."""
    assert abi.keccak_selector("name()") == "0x06fdde03"
    assert abi.keccak_selector("symbol()") == "0x95d89b41"
    assert abi.keccak_selector("decimals()") == "0x313ce567"
    assert abi.keccak_selector("totalSupply()") == "0x18160ddd"
    assert abi.keccak_selector("transfer(address,uint256)") == "0xa9059cbb"


def test_keccak_event_topics_match_dispatch_constants():
    """P6: topic0 constants (reference utils/token.py:9-14) derive from
    our keccak rather than being copied."""
    assert abi.keccak_topic("Transfer(address,address,uint256)") == (
        "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
    )
    assert abi.keccak_topic("ApprovalForAll(address,address,bool)") == (
        "0x17307eab39ab6107e8899845ad3d59bd9653f200f220920489ca2b5937696c31"
    )


def test_abi_decode_static_tuple():
    data = _w(123456) + _w(0xABCDEF) + _w(1)
    got = abi.abi_decode(["uint256", "uint256", "bool"], data)
    assert got == (123456, 0xABCDEF, True)


def test_abi_decode_address_and_bytes32():
    addr = "0x" + "ab" * 20
    data = _w(int(addr, 16)) + b"MKR".ljust(32, b"\x00")
    got = abi.abi_decode(["address", "bytes32"], data)
    assert got[0] == addr
    assert got[1].rstrip(b"\x00") == b"MKR"


def test_abi_decode_negative_int():
    data = _w((1 << 256) - 5)  # -5 two's complement
    assert abi.abi_decode(["int256"], data) == (-5,)


def test_abi_decode_dynamic_string():
    """The reference's token-name decode: parse_bytes_data(data, ['string'])
    (web3.py:44-61)."""
    payload = _w(0x20) + _w(7) + b"Uniswap".ljust(32, b"\x00")
    assert abi.abi_decode(["string"], payload) == ("Uniswap",)
    assert abi.abi_decode_hex(["string"], "0x" + payload.hex()) == ("Uniswap",)
    assert abi.abi_decode_hex(["string"], "0x") is None
    assert abi.abi_decode_hex(["string"], None) is None


def test_abi_decode_uint_array_and_mixed():
    # (uint256, uint256[]) — dynamic tail after static head
    arr = [7, 8, 9]
    data = _w(42) + _w(0x40) + _w(len(arr)) + b"".join(_w(x) for x in arr)
    got = abi.abi_decode(["uint256", "uint256[]"], data)
    assert got == (42, [7, 8, 9])


def test_abi_decode_series_batched():
    payload = _w(0x20) + _w(3) + b"abc".ljust(32, b"\x00")
    out = abi.abi_decode_series(["string"], pd.Series([payload, payload]))
    assert list(out) == [("abc",), ("abc",)]
