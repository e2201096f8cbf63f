"""Wave-batched TTRRedirect vs the sequential exact engine.

The wave engine keeps chips in a DataFrame, pops top-k via one
TakeOrderedAndProject, runs A9 (seed symbol sums) and A10 (chip merges)
as DataFrame aggregations, and executes the J8 netting + temporal
distribution + A11 swap walk as one applyInPandas kernel per popped
node — sharing the per-node numeric core with the exact engine, while
the oracle/ ports stay the independent implementation (pinned against
both in tests/test_oracle.py)."""

import pytest
from pyspark.sql import functions as F

from blockchainspider_spark.engine.exact import ExactCrawlEngine
from blockchainspider_spark.engine.wave_redirect import TtrRedirectWaveEngine

EPS = 5e-3


@pytest.fixture(scope="module")
def seq(spark, edges_df, source):
    return ExactCrawlEngine(spark, edges_df, "TTRRedirect", {"epsilon": EPS}).run(
        source, max_steps=10
    )


@pytest.fixture(scope="module")
def wave(spark, edges_df, source):
    return TtrRedirectWaveEngine(spark, edges_df, epsilon=EPS).run(
        source, max_pops=11
    )


def test_k1_pop_order_matches_sequential(seq, wave):
    want = [(s, n) for s, n, _ in seq.pop_log]
    assert wave.pop_log[: len(want)] == want


def test_k1_pop_residuals_match_sequential(seq, wave):
    """Chip-sum residuals at pop time agree to float-reassociation
    tolerance (the DataFrame sum reorders additions)."""
    want = {s: ctx.get("residual") for s, _, ctx in seq.pop_log if ctx}
    got = {r.seq: r.residual for r in wave.pop_log_df.collect()}
    for s, res in want.items():
        assert abs(got[s] - res) < 1e-9, s


def test_k1_ranks_match_sequential(spark, edges_df, source):
    """Natural-termination run: p-mass per node equals the sequential
    engine to 1e-9 (same push math, float order aside)."""
    eps = 2e-2
    seq = ExactCrawlEngine(spark, edges_df, "TTRRedirect", {"epsilon": eps}).run(source)
    wave = TtrRedirectWaveEngine(spark, edges_df, epsilon=eps).run(source)
    assert wave.pop_log == [(s, n) for s, n, _ in seq.pop_log]
    ranks = wave.ranks()
    want = {k: v for k, v in seq.ranks.items() if v > 0}
    assert set(ranks) == set(want)
    for node, p in ranks.items():
        assert abs(p - want[node]) < 1e-9, node


def test_batched_k3_terminates_and_is_dense(spark, edges_df, source):
    # 10 = seed wave (1 pop) + 3 full k=3 waves (wave-aligned budget)
    wave = TtrRedirectWaveEngine(spark, edges_df, epsilon=EPS, k=3).run(
        source, max_pops=10
    )
    seqs = [s for s, _ in wave.pop_log]
    assert seqs == list(range(len(seqs)))
    assert all(rec["pops"] <= 3 for rec in wave.lineage)
    # chips are merged per (node, symbol, ts): no duplicate keys survive
    dup = (
        wave.chips.groupBy("node", "symbol", "ts").count()
        .where(F.col("count") > 1).count()
    )
    assert dup == 0


def test_k1_parity_on_adversarial_graph(spark):
    """Quirk-heavy graph: self-loops on the source (in_sum QUIRK),
    zero-value edges (skipped by seed scatter and netting), multi-leg
    swaps sharing a hash (J8 move-to-end + sign-flip-ts), a sink with no
    out-edges, and two symbols — wave k=1 must still replay the
    sequential engine exactly."""
    import hashlib

    import pandas as pd

    def edge(i, frm, to, value, ts, hsh, sym):
        return {
            "id": "0x" + hashlib.sha1(f"adv-{i}".encode()).hexdigest(),
            "hash": hsh, "address_from": frm, "address_to": to,
            "value": f"{value:.6f}", "token_id": "",
            "timestamp": ts, "block_number": 100 + i,
            "contract_address": "0x" + "0" * 40, "symbol": sym,
            "decimals": 18, "gas": "0", "gas_price": "0",
        }

    A, B, C, D = ("0x" + c * 40 for c in "abcd")
    rows = [
        edge(0, A, A, 3.0, 100, "h0", "native"),    # source self-loop
        edge(1, A, B, 2.0, 110, "h1", "native"),
        edge(2, B, A, 1.5, 115, "h1", "TOK1"),      # multi-leg swap with 1
        edge(3, A, C, 0.0, 120, "h2", "native"),    # zero-value edge
        edge(4, B, C, 2.5, 130, "h3", "TOK1"),
        edge(5, C, B, 2.5, 135, "h3", "native"),    # netting pair
        edge(6, B, D, 1.0, 140, "h4", "native"),    # D is a pure sink
        edge(7, C, A, 0.5, 150, "h5", "TOK1"),
    ]
    edges = spark.createDataFrame(pd.DataFrame(rows))
    edges.persist().count()
    # natural termination on both sides: a max_steps cut would leave the
    # sequential engine's final pop unpushed and ranks would differ by
    # exactly that pop's α·r (the r3-documented comparison rule)
    eps = 2e-2
    seq = ExactCrawlEngine(spark, edges, "TTRRedirect", {"epsilon": eps}).run(A)
    wave = TtrRedirectWaveEngine(spark, edges, epsilon=eps).run(A)
    assert wave.pop_log == [(s, n) for s, n, _ in seq.pop_log]
    ranks = wave.ranks()
    for node, p in {k: v for k, v in seq.ranks.items() if v > 0}.items():
        assert abs(ranks.get(node, 0.0) - p) < 1e-9, node


def test_hub_node_skew_guard(spark):
    """Round-6 fix of the r4/r5 scale-killer: a popped hub whose edge
    slice exceeds ``max_push_edges`` no longer aborts the crawl — it is
    routed through the two-stage push (distributed per-hash-bucket J8
    netting, then the sequential walk over the surviving legs only) and
    must produce EXACTLY the same pops and ranks as the one-kernel fast
    path. Star graph: source s feeds hub h, h fans out to 50k leaves;
    popping h hands the push a 50,001-edge slice."""
    n_leaves = 50_000
    s, h = "0x" + "e" * 40, "0x" + "f" * 40
    leaves = spark.range(n_leaves).select(
        F.sha1(F.concat_ws("_", F.lit("hub"), "id")).alias("id"),
        F.sha1(F.concat_ws("#", F.lit("hub"), "id")).alias("hash"),
        F.lit(h).alias("address_from"),
        F.concat(F.lit("leaf"), F.col("id")).alias("address_to"),
        F.lit("1.0").alias("value"), F.lit("").alias("token_id"),
        (F.lit(200) + F.col("id")).cast("long").alias("timestamp"),
        (F.lit(10) + F.col("id")).cast("long").alias("block_number"),
        F.lit("0x" + "0" * 40).alias("contract_address"),
        F.lit("native").alias("symbol"),
        F.lit(18).alias("decimals"),
        F.lit("0").alias("gas"), F.lit("0").alias("gas_price"),
    )
    feed = spark.createDataFrame(
        [("0xseed", "hseed", s, h, "1.0", "", 100, 1,
          "0x" + "0" * 40, "native", 18, "0", "0")],
        leaves.schema,
    )
    edges = feed.unionByName(leaves)
    edges.persist().count()

    # cap below the hub degree: h routes through the two-stage path and
    # the crawl COMPLETES (r5 behavior was a crawl-killing abort)
    tight = TtrRedirectWaveEngine(spark, edges, epsilon=1e-6,
                                  max_push_edges=10_000)
    routed = tight.run(s, max_pops=2)
    assert [n for _, n in routed.pop_log] == [s, h]

    # default cap admits the hub through the one-kernel fast path; both
    # paths agree exactly on pops and surviving chip mass
    ok = TtrRedirectWaveEngine(spark, edges, epsilon=1e-6).run(s, max_pops=2)
    assert [n for _, n in ok.pop_log] == [s, h]
    assert routed.ranks() == ok.ranks()
    want_chips = {(r.node, r.symbol, r.ts): r.val for r in ok.chips.collect()}
    got_chips = {(r.node, r.symbol, r.ts): r.val for r in routed.chips.collect()}
    assert set(got_chips) == set(want_chips)
    for key, v in want_chips.items():
        assert abs(got_chips[key] - v) < 1e-12, key
    edges.unpersist()


def test_hub_path_full_parity_on_adversarial_graph(spark):
    """Force EVERY pop through the two-stage hub path
    (max_push_edges=0) on the quirk-heavy adversarial graph: pops,
    ranks, and chips must replay the sequential exact engine — the
    distributed netting + creation-triple swap reassembly is
    bit-faithful to the in-kernel fold."""
    import hashlib

    import pandas as pd

    def edge(i, frm, to, value, ts, hsh, sym):
        return {
            "id": "0x" + hashlib.sha1(f"hubadv-{i}".encode()).hexdigest(),
            "hash": hsh, "address_from": frm, "address_to": to,
            "value": f"{value:.6f}", "token_id": "",
            "timestamp": ts, "block_number": 100 + i,
            "contract_address": "0x" + "0" * 40, "symbol": sym,
            "decimals": 18, "gas": "0", "gas_price": "0",
        }

    A, B, C, D = ("0x" + c * 40 for c in "abcd")
    rows = [
        edge(0, A, A, 3.0, 100, "h0", "native"),
        edge(1, A, B, 2.0, 110, "h1", "native"),
        edge(2, B, A, 1.5, 115, "h1", "TOK1"),
        edge(3, A, C, 0.0, 120, "h2", "native"),
        edge(4, B, C, 2.5, 130, "h3", "TOK1"),
        edge(5, C, B, 2.5, 135, "h3", "native"),   # nets to zero
        edge(6, B, D, 1.0, 140, "h4", "native"),
        edge(7, C, A, 0.5, 150, "h5", "TOK1"),
        # same-hash re-creation: h3 re-enters the legs dict after its
        # netting delete — the creation triple must move to edge 8
        edge(8, B, C, 0.75, 160, "h3", "native"),
    ]
    edges = spark.createDataFrame(pd.DataFrame(rows))
    edges.persist().count()
    eps = 2e-2
    seq = ExactCrawlEngine(spark, edges, "TTRRedirect", {"epsilon": eps}).run(A)
    wave = TtrRedirectWaveEngine(spark, edges, epsilon=eps,
                                 max_push_edges=0, hub_buckets=3).run(A)
    assert wave.pop_log == [(s, n) for s, n, _ in seq.pop_log]
    ranks = wave.ranks()
    for node, p in {k: v for k, v in seq.ranks.items() if v > 0}.items():
        assert abs(ranks.get(node, 0.0) - p) < 1e-9, node
    edges.unpersist()


def test_two_million_edge_hub_completes(spark):
    """VERDICT r5 done-criterion: a popped hub with 2M touching edges
    COMPLETES (r5 aborted the crawl). 95% of the hub's edges pair up
    and net to zero inside their tx hash — the realistic exchange-hub
    shape — so the distributed stage-A netting shrinks the slice from
    2M raw edges to 100k surviving legs before the sequential walk ever
    sees it; the wave engine pops source then hub and accounts every
    surviving chip."""
    n_pairs, n_single = 950_000, 100_000
    s, h = "0x" + "e" * 40, "0x" + "f" * 40
    zero_addr = "0x" + "0" * 40

    def leg(prefix, frm, to, ts_off):
        return spark.range(n_pairs).select(
            F.concat(F.lit(prefix), F.col("id")).alias("id"),
            F.concat(F.lit("cancel#"), F.col("id")).alias("hash"),
            frm.alias("address_from"), to.alias("address_to"),
            F.lit("2.0").alias("value"), F.lit("").alias("token_id"),
            (F.lit(1000) + F.col("id") * 2 + ts_off).cast("long").alias("timestamp"),
            (F.lit(10) + F.col("id")).cast("long").alias("block_number"),
            F.lit(zero_addr).alias("contract_address"),
            F.lit("native").alias("symbol"), F.lit(18).alias("decimals"),
            F.lit("0").alias("gas"), F.lit("0").alias("gas_price"),
        )

    leaf = F.concat(F.lit("leaf"), F.col("id"))
    cancels = leg("out", F.lit(h), leaf, F.lit(0)).unionByName(
        leg("in", leaf, F.lit(h), F.lit(1)))
    survivors = spark.range(n_single).select(
        F.concat(F.lit("sv"), F.col("id")).alias("id"),
        F.concat(F.lit("keep#"), F.col("id")).alias("hash"),
        F.lit(h).alias("address_from"),
        F.concat(F.lit("sleaf"), F.col("id")).alias("address_to"),
        F.lit("1.0").alias("value"), F.lit("").alias("token_id"),
        (F.lit(9_000_000) + F.col("id")).cast("long").alias("timestamp"),
        (F.lit(5_000_000) + F.col("id")).cast("long").alias("block_number"),
        F.lit(zero_addr).alias("contract_address"),
        F.lit("native").alias("symbol"), F.lit(18).alias("decimals"),
        F.lit("0").alias("gas"), F.lit("0").alias("gas_price"),
    )
    feed = spark.createDataFrame(
        [("0xseed", "hseed", s, h, "1.0", "", 100, 1,
          zero_addr, "native", 18, "0", "0")],
        survivors.schema,
    )
    edges = feed.unionByName(cancels).unionByName(survivors)
    edges = edges.repartition(32).persist()
    n_edges = edges.count()
    assert n_edges == 2 * n_pairs + n_single + 1

    eng = TtrRedirectWaveEngine(spark, edges, epsilon=1e-9, k=1)
    assert n_edges - 1 > eng.max_push_edges  # h IS above the default cap
    got = eng.run(s, max_pops=2)
    assert [n for _, n in got.pop_log] == [s, h]
    # stage A netted 1.9M cancel edges away: surviving non-hub chips are
    # exactly the 100k single-leg targets (+ the seed chip on h's side)
    pushed_targets = got.chips.where(
        F.col("node").startswith("sleaf")).count()
    assert pushed_targets == n_single
    edges.unpersist()


def test_hub_walk_legs_cap_is_loud(spark, edges_df, source):
    """The irreducible residue — the sequential A11 walk over netted
    legs — keeps a loud bound: a pathological hub whose legs survive
    netting above ``max_walk_legs`` raises naming the node and the
    knob, instead of silently stalling the wave."""
    eng = TtrRedirectWaveEngine(spark, edges_df, epsilon=5e-3,
                                max_push_edges=0, max_walk_legs=1)
    with pytest.raises(Exception, match="max_walk_legs"):
        eng.run(source, max_pops=3)
