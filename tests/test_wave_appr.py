"""Wave-batched APPR vs the sequential exact engine.

APPR's drain is the one place the wave engine is deliberately NOT
order-identical in general: the reference drains one known node at a
time (Gauss-Seidel, insertion order), the wave engine pushes every
eligible known node simultaneously (Jacobi) — same ε→0 limit, but the
sub-epsilon residual state at drain termination can differ, which can
eventually flip an argmax. The pins here are (a) fixture-level pop-order
equality over a prefix (it holds for the first 12 pops on this graph —
the divergence at pop 12 is recorded below), and (b) the
order-independent invariants that hold for ANY drain order."""

import pytest

from blockchainspider_spark.engine.exact import ExactCrawlEngine
from blockchainspider_spark.engine.wave_weighted import ApprWaveEngine

EPS = 1e-2


@pytest.fixture(scope="module")
def seq(spark, edges_df, source):
    return ExactCrawlEngine(spark, edges_df, "APPR", {"epsilon": EPS}).run(
        source, max_steps=11
    )


@pytest.fixture(scope="module")
def wave(spark, edges_df, source):
    return ApprWaveEngine(spark, edges_df, epsilon=EPS).run(source, max_pops=12)


def test_k1_pop_order_prefix_matches_sequential(seq, wave):
    """First 12 pops identical on the fixture (empirically the Jacobi /
    Gauss-Seidel drain states first diverge visibly at pop 12)."""
    assert wave.pop_log == [(s, n) for s, n, _ in seq.pop_log]


def test_mass_conservation_and_drained_state(spark, wave):
    """Order-independent invariants: Σr + Σp == 1 exactly-ish, no
    crawled node retains residual above epsilon after the final drain,
    and every pop was above epsilon when popped."""
    from pyspark.sql import functions as F

    row = wave.node_state.agg(
        F.sum("r").alias("r"), F.sum("p").alias("p")
    ).collect()[0]
    assert abs((row.r + row.p) - 1.0) < 1e-9
    crawled_hot = wave.node_state.where(
        F.col("fetched") & (F.col("r") > EPS)
    ).count()
    assert crawled_hot == 0
    assert wave.pop_log_df.where(F.col("residual") <= EPS).count() == 0


def test_ranks_close_to_sequential(seq, wave):
    """p-mass agrees with the sequential engine within the local-push
    error envelope (differences stem only from which sub-ε residuals
    remain unpushed)."""
    ranks_w = wave.ranks()
    ranks_s = {k: v for k, v in seq.ranks.items() if v > 0}
    for node in set(ranks_w) | set(ranks_s):
        dw, ds = ranks_w.get(node, 0.0), ranks_s.get(node, 0.0)
        assert abs(dw - ds) < 5 * EPS, (node, dw, ds)
