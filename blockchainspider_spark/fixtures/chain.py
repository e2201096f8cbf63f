"""Deterministic synthetic EVM-ish chain fixtures for the block-ETL
pipeline (≅ reference items/evm.py schemas, seed-pure)."""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd

# public event-signature topics (ERC-20/721/1155 standards), derived
# with our own keccak-256 rather than hardcoded (values: 0xddf252ad…,
# 0xc3d58168…, 0x4a39dc06… — pinned in tests/test_traces_abi.py)
from blockchainspider_spark.functions.keccak import event_topic

TOPIC_TRANSFER = event_topic("Transfer(address,address,uint256)")
TOPIC_1155_SINGLE = event_topic("TransferSingle(address,address,address,uint256,uint256)")
TOPIC_1155_BATCH = event_topic("TransferBatch(address,address,address,uint256[],uint256[])")
TOPIC_OTHER = "0x" + "ab" * 32


def _addr(tag: str) -> str:
    return "0x" + hashlib.sha1(tag.encode()).hexdigest()[:40]


def _word(addr: str) -> str:
    return "0x" + addr[2:].rjust(64, "0")


def _hexval(v: int) -> str:
    return "0x" + format(v, "x")


def make_chain(n_blocks: int = 20, txs_per_block: int = 5, seed: int = 42):
    """Returns (blocks, transactions, receipts, logs) pandas DataFrames."""
    rng = np.random.default_rng(seed)
    accounts = [_addr(f"acct-{i}") for i in range(30)]
    erc20s = [_addr(f"erc20-{i}") for i in range(4)]
    erc721s = [_addr(f"erc721-{i}") for i in range(2)]
    erc1155 = _addr("erc1155-0")

    blocks, txs, receipts, logs = [], [], [], []
    for b in range(n_blocks):
        bn = 1_000_000 + b
        bhash = "0x" + hashlib.sha256(f"blk-{seed}-{bn}".encode()).hexdigest()
        blocks.append({
            "block_number": bn,
            "block_hash": bhash,
            "timestamp": 1_600_000_000 + 12 * b,
            "miner": accounts[b % 7],
            "gas_used": int(rng.integers(1_000_000, 15_000_000)),
            "transaction_count": txs_per_block,
        })
        for i in range(txs_per_block):
            th = "0x" + hashlib.sha256(f"tx-{seed}-{bn}-{i}".encode()).hexdigest()
            frm = accounts[int(rng.integers(0, len(accounts)))]
            is_create = rng.random() < 0.08
            to = "" if is_create else accounts[int(rng.integers(0, len(accounts)))]
            gas = int(rng.integers(21_000, 400_000))
            txs.append({
                "hash": th, "block_number": bn, "transaction_index": i,
                "address_from": frm, "address_to": to,
                "value": str(int(rng.integers(0, 10**18))),
                "gas": gas, "is_create": bool(is_create),
            })
            created = _addr(f"created-{th}") if is_create else ""
            n_logs = int(rng.integers(0, 4))
            receipts.append({
                "transaction_hash": th, "block_number": bn,
                "gas_used": int(gas * rng.uniform(0.4, 1.0)),
                "created_contract": created, "status": 1, "log_count": n_logs,
            })
            for li in range(n_logs):
                kind = rng.random()
                a1, a2 = (accounts[int(rng.integers(0, len(accounts)))] for _ in range(2))
                amount = int(rng.integers(1, 10**6))
                if kind < 0.4:   # ERC20: Transfer topic + 2 indexed addrs, amount in data
                    logs.append({
                        "transaction_hash": th, "block_number": bn, "log_index": li,
                        "address": erc20s[int(rng.integers(0, len(erc20s)))],
                        "topics": [TOPIC_TRANSFER, _word(a1), _word(a2)],
                        "data": _hexval(amount),
                    })
                elif kind < 0.6:  # ERC721: Transfer topic + 3 indexed (token id last)
                    logs.append({
                        "transaction_hash": th, "block_number": bn, "log_index": li,
                        "address": erc721s[int(rng.integers(0, len(erc721s)))],
                        "topics": [TOPIC_TRANSFER, _word(a1), _word(a2),
                                   "0x" + format(int(rng.integers(1, 5000)), "064x")],
                        "data": "0x",
                    })
                elif kind < 0.7:  # ERC1155 single
                    logs.append({
                        "transaction_hash": th, "block_number": bn, "log_index": li,
                        "address": erc1155,
                        "topics": [TOPIC_1155_SINGLE, _word(accounts[0]), _word(a1), _word(a2)],
                        "data": "0x" + format(int(rng.integers(1, 100)), "064x")
                                + format(amount, "064x"),
                    })
                elif kind < 0.8:  # malformed ERC20 (extra topic) → shape guard drops
                    logs.append({
                        "transaction_hash": th, "block_number": bn, "log_index": li,
                        "address": erc20s[0],
                        "topics": [TOPIC_TRANSFER, _word(a1), _word(a2), _word(a2), _word(a1)],
                        "data": _hexval(amount),
                    })
                else:             # unrelated event
                    logs.append({
                        "transaction_hash": th, "block_number": bn, "log_index": li,
                        "address": accounts[0],
                        "topics": [TOPIC_OTHER, _word(a1)],
                        "data": "0x00",
                    })
    return (
        pd.DataFrame(blocks), pd.DataFrame(txs),
        pd.DataFrame(receipts), pd.DataFrame(logs),
    )


def token_properties_for(contract: str) -> dict:
    """Deterministic stand-in for the 8 eth_call property fetches
    (reference middlewares/trans/token.py:344-362): pure function of the
    contract address — the fixture world's 'chain state'."""
    h = hashlib.sha256(contract.encode()).hexdigest()
    return {
        "contract_address": contract,
        "name": f"Token{h[:6]}",
        "token_symbol": f"TK{h[:4].upper()}",
        "decimals": 6 + int(h[6], 16) % 13,
        "total_supply": str(int(h[:12], 16)),
    }
