"""Regression pins for the round-3 ADVICE findings on the wave engines.

1. TTRTime backward recycle: a popped node with NO in-edges must recycle
   its in-sentinel chip (ts = 2^63-1) instead of consuming it — the
   sequential kernel (strategies_vec.VecTtrTime._flow) compares against
   int64 max with strict >, so an empty edge set never consumes. The old
   wave predicate coalesced the missing bound to 2^62 and silently
   dropped the sentinel's residual mass.
2. APPR drain: crawled nodes with zero distinct neighbors are excluded
   from the drain (the reference's falsy-cache skip in appr.py pop());
   their push happens at pop time (p += α·r, r = 0, empty scatter) and
   they re-pop if they ever regain mass.
"""

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from blockchainspider_spark.engine.exact import ExactCrawlEngine
from blockchainspider_spark.engine.wave_weighted import (
    APPR_STATE_SCHEMA,
    ApprWaveEngine,
    TtrTimeWaveEngine,
)


def _edge(frm, to, value, ts, i):
    tx = "0x" + hashlib.sha1(f"advice-tx-{i}".encode()).hexdigest()
    return {
        "id": "0x" + hashlib.sha1(f"advice-id-{i}".encode()).hexdigest(),
        "hash": tx,
        "address_from": frm,
        "address_to": to,
        "value": f"{value:.6f}",
        "token_id": "",
        "timestamp": int(ts),
        "block_number": 15_000_000 + i,
        "contract_address": "0x" + "0" * 40,
        "symbol": "native",
        "decimals": 18,
        "gas": "21000",
        "gas_price": "1000000000",
    }


A, B, C = ("0x" + c * 40 for c in "abc")


@pytest.fixture(scope="module")
def no_inedge_edges(spark):
    """Source A has out-edges only — the seed creates an in-sentinel chip
    at ts=2^63-1, and A re-pops right after the seed wave (it still holds
    all (1-α) mass), exercising the empty-in-edge backward flow."""
    rows = [
        _edge(A, B, 1.0, 100, 0),
        _edge(A, C, 1.0, 150, 1),
        _edge(B, C, 2.0, 200, 2),
    ]
    df = spark.createDataFrame(pd.DataFrame(rows))
    df.persist().count()
    return df


def test_ttrtime_no_inedge_source_recycles_sentinel(spark, no_inedge_edges):
    eps = 5e-2
    seq = ExactCrawlEngine(spark, no_inedge_edges, "TTRTime",
                           {"epsilon": eps}).run(A)
    wave = TtrTimeWaveEngine(spark, no_inedge_edges, epsilon=eps).run(A)
    assert wave.pop_log == [(s, n) for s, n, _ in seq.pop_log]
    # A re-popped after the seed wave — that pop ran the empty-in-edge
    # backward flow this test exists for
    pops = [n for _, n in wave.pop_log]
    assert pops[0] == pops[1] == A
    ranks = wave.ranks()
    want = {k: v for k, v in seq.ranks.items() if v > 0}
    assert set(ranks) == set(want)
    for node, p in ranks.items():
        assert abs(p - want[node]) < 1e-9, node


def test_ttrtime_chip_mass_conserved_without_inedges(spark, no_inedge_edges):
    """Σp + Σchips == 1: the dropped-sentinel bug leaked (1-α)(1-β) of
    the popped node's residual out of the system on every re-pop."""
    wave = TtrTimeWaveEngine(spark, no_inedge_edges, epsilon=5e-2).run(A)
    chips = wave.chips.agg(F.sum("val")).collect()[0][0] or 0.0
    p = wave.meta.agg(F.sum("p")).collect()[0][0] or 0.0
    assert abs((chips + p) - 1.0) < 1e-9


@pytest.fixture(scope="module")
def selfloop_edges(spark):
    """Source A only has a self-loop: zero distinct neighbors."""
    df = spark.createDataFrame(pd.DataFrame([_edge(A, A, 5.0, 100, 0)]))
    df.persist().count()
    return df


def test_appr_isolated_source_matches_sequential(spark, selfloop_edges):
    eps = 1e-2
    seq = ExactCrawlEngine(spark, selfloop_edges, "APPR",
                           {"epsilon": eps}).run(A, max_steps=4)
    wave = ApprWaveEngine(spark, selfloop_edges, epsilon=eps).run(
        A, max_pops=4)
    assert wave.pop_log == [(s, n) for s, n, _ in seq.pop_log]
    assert [n for _, n in wave.pop_log] == [A]
    row = wave.node_state.where(F.col("node") == A).collect()[0]
    # pop-time push applied: p = α·1, r zeroed, flagged isolated
    assert row.isolated and row.fetched
    assert row.r == 0.0
    assert abs(row.p - 0.15) < 1e-12


def test_appr_drain_skips_isolated_nodes(spark, selfloop_edges):
    """Direct pin of the drain exclusion: a fetched+isolated node above
    epsilon is NOT drained (it waits to re-pop), while a fetched
    non-isolated node is."""
    eng = ApprWaveEngine(spark, selfloop_edges, epsilon=1e-2)
    state = spark.createDataFrame(
        [
            (A, 0.5, 0.0, (0, -1, -1), True, True),    # isolated: untouched
            (B, 0.0, 0.0, (0, -1, -1), False, False),
        ],
        APPR_STATE_SCHEMA,
    ).localCheckpoint(eager=True)
    new_state, n_pushed = eng._drain_once(state, wave=1)
    assert n_pushed == 0
    got = {r.node: r.r for r in new_state.collect()}
    assert got[A] == 0.5
