"""Property-based equivalence: wave engines at k=1 vs the sequential
exact engine on random graphs (VERDICT r4 next-round #3 — the fixed
fixtures in tests/test_wave_*.py pin known shapes; the APPR ulp-tie
counterexample proved random graphs catch what fixtures miss).

Contract per engine: identical pop sequence (seq, node), and — when the
sequential run terminates NATURALLY inside the step cap — identical
positive rank mass to 1e-9 (a capped run leaves the sequential engine's
last pop unpushed while the wave engine pushed it, the r3-documented
comparison rule, so ranks are only compared on natural termination).

Graphs are kept small (≤14 edges over 6 nodes) and epsilons high so a
wave run is a handful of Spark waves; 15 examples per engine is the
floor VERDICT asked for."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from blockchainspider_spark.engine.exact import ExactCrawlEngine
from blockchainspider_spark.engine.wave_haircut import HaircutWaveEngine
from blockchainspider_spark.engine.wave_redirect import TtrRedirectWaveEngine
from blockchainspider_spark.engine.wave_weighted import (
    ApprWaveEngine,
    TtrTimeWaveEngine,
    TtrWaveEngine,
)

NODES = [f"n{i}" for i in range(6)]
CAP = 14  # sequential step cap: bounds wall-clock per example


@st.composite
def edge_lists(draw):
    n = draw(st.integers(3, 14))
    rows = []
    for i in range(n):
        src = draw(st.sampled_from(NODES))
        dst = draw(st.sampled_from(NODES))  # self-loops allowed
        rows.append({
            "id": f"e{i}",
            "hash": f"h{draw(st.integers(0, 6))}",
            "address_from": src,
            "address_to": dst,
            "value": f"{draw(st.integers(1, 50))}.{draw(st.integers(0, 9))}",
            "token_id": "",
            "timestamp": draw(st.integers(1, 30)),
            "block_number": draw(st.integers(1, 10)),
            "contract_address": "0x" + "0" * 40,
            "symbol": draw(st.sampled_from(["native", "TOK1"])),
            "decimals": 18,
            "gas": "0",
            "gas_price": "0",
        })
    return pd.DataFrame(rows)


def _drive(spark, edges_pdf, strategy, params, make_wave, wave_ranks):
    edges = spark.createDataFrame(edges_pdf)
    seq = ExactCrawlEngine(spark, edges, strategy, params).run("n0", max_steps=CAP)
    seq_pops = [(s, n) for s, n, _ in seq.pop_log]
    natural = len(seq_pops) < CAP + 1  # pop_log includes the seed at step 0
    wave = make_wave(spark, edges).run(
        "n0", max_pops=None if natural else len(seq_pops))
    assert wave.pop_log == seq_pops, (strategy, wave.pop_log, seq_pops)
    if natural:
        got = wave_ranks(wave)
        want = {k: v for k, v in seq.ranks.items() if v > 0}
        assert set(got) == set(want), (strategy, set(got) ^ set(want))
        for node, p in want.items():
            assert abs(got[node] - p) < 1e-9, (strategy, node)


def _positive(d: dict) -> dict:
    return {k: v for k, v in d.items() if v > 0}


@settings(max_examples=15, deadline=None)
@given(edges=edge_lists())
def test_wave_haircut_property(spark, edges):
    _drive(
        spark, edges, "Haircut", {"min_weight": 5e-2},
        lambda sp, e: HaircutWaveEngine(sp, e, k=1, min_weight=5e-2),
        lambda w: _positive({r.node: r.weight for r in w.node_state.collect()}),
    )


@settings(max_examples=15, deadline=None)
@given(edges=edge_lists())
def test_wave_appr_property(spark, edges):
    """APPR is the one engine whose wave drain is DOCUMENTED as Jacobi
    (simultaneous) push iterations vs the sequential engine's
    one-at-a-time Gauss-Seidel drain (ApprWaveEngine docstring): both
    converge to the same ε→0 limit, but the sub-epsilon residual state
    at termination differs, so exact pop order and 1e-9 rank parity are
    NOT the contract on adversarial graphs (random graphs here confirm
    they genuinely diverge at ε=0.1). The property contract is the
    order-independent invariant set the engine documents:

    * mass conservation: Σr + Σp + dropped == 1 (to float tolerance),
      where dropped = (1−α)·Σ residuals of ISOLATED pops — a push with
      an empty distinct-neighbor set keeps only the α share (reference
      semantics; a source with no edges ends at Σp = α alone)
    * drained termination: every fetched non-isolated node ends ≤ ε
    * pop seqs dense from 0
    * rank agreement with the sequential twin within the local-push
      theory envelope (per-node |Δp| ≤ 2ε — each engine's p is within
      the ε-residual approximation band of the same limit)"""
    eps = 1e-1
    edges_df = spark.createDataFrame(edges)
    seq = ExactCrawlEngine(spark, edges_df, "APPR",
                           {"alpha": 0.15, "epsilon": eps}).run("n0", max_steps=CAP)
    wave = ApprWaveEngine(spark, edges_df, epsilon=eps).run(
        "n0", max_pops=CAP)
    seqs = [s for s, _ in wave.pop_log]
    assert seqs == list(range(len(seqs)))
    from pyspark.sql import functions as F
    row = wave.node_state.agg(F.sum("r").alias("r"), F.sum("p").alias("p")).collect()[0]
    iso = {r.node for r in wave.node_state.where(F.col("isolated")).collect()}
    dropped = sum(
        (1 - 0.15) * r.residual
        for r in wave.pop_log_df.collect() if r.node in iso
    )
    assert abs((row.r + row.p + dropped) - 1.0) < 1e-9
    drained = wave.node_state.where(
        F.col("fetched") & (~F.col("isolated")) & (F.col("r") > eps)
    ).count()
    assert drained == 0
    got, want = wave.ranks(), {k: v for k, v in seq.ranks.items() if v > 0}
    for node in set(got) | set(want):
        assert abs(got.get(node, 0.0) - want.get(node, 0.0)) < 2 * eps, node


@settings(max_examples=15, deadline=None)
@given(edges=edge_lists())
def test_wave_ttrweight_property(spark, edges):
    _drive(
        spark, edges, "TTRWeight", {"epsilon": 1e-1},
        lambda sp, e: TtrWaveEngine(sp, e, weighted=True, epsilon=1e-1),
        lambda w: w.ranks(),
    )


@settings(max_examples=15, deadline=None)
@given(edges=edge_lists())
def test_wave_ttrtime_property(spark, edges):
    _drive(
        spark, edges, "TTRTime", {"epsilon": 1e-1},
        lambda sp, e: TtrTimeWaveEngine(sp, e, epsilon=1e-1),
        lambda w: w.ranks(),
    )


@settings(max_examples=15, deadline=None)
@given(edges=edge_lists())
def test_wave_ttrredirect_property(spark, edges):
    _drive(
        spark, edges, "TTRRedirect", {"epsilon": 1e-1},
        lambda sp, e: TtrRedirectWaveEngine(sp, e, epsilon=1e-1),
        lambda w: w.ranks(),
    )


@settings(max_examples=15, deadline=None)
@given(edges=edge_lists())
def test_wave_bfs_property(spark, edges):
    """Flagship engine on random graphs: BfsWaveEngine's pop order,
    per-pop depth, and seen membership equal the in-memory reference
    oracle (oracle/crawl.run_crawl). The fixture test pins one 60-node
    graph; this drives the FIFO tiebreak and the frontier dedup across
    arbitrary shapes incl. self-loops and multi-edges."""
    from blockchainspider_spark.engine.batch_bfs import BfsWaveEngine
    from blockchainspider_spark.oracle.crawl import run_crawl

    oracle = run_crawl(edges, "n0", "BFS", {"depth": 2})
    engine = BfsWaveEngine(spark, spark.createDataFrame(edges), max_depth=2)
    state, _, _ = engine.run("n0", collect_transfers=False)
    got = [(seq, node) for seq, node, _ in state.pop_log]
    want = [(step, node) for step, node, _ in oracle.pop_log]
    assert got == want
    got_depth = {node: depth for _, node, depth in state.pop_log}
    want_depth = {node: ctx.get("depth", 0) for _, node, ctx in oracle.pop_log}
    assert got_depth == want_depth
    seen_nodes = {r.node for r in state.seen.select("node").collect()}
    assert seen_nodes == oracle.seen
