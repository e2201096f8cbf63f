"""Property tests of the golden oracle (SURVEY §5.4 invariants)."""

import math

import pytest

from blockchainspider_spark.fixtures.generators import make_edges, node_address
from blockchainspider_spark.oracle.crawl import STRATEGY_REGISTRY, run_crawl


@pytest.fixture(scope="module")
def edges():
    return make_edges(n_nodes=40, n_edges=250, seed=7)


@pytest.fixture(scope="module")
def src():
    return node_address(0)


def test_bfs_depth_monotone_and_terminates(edges, src):
    r = run_crawl(edges, src, "BFS", {"depth": 2})
    depths = [ctx.get("depth", 0) for _, _, ctx in r.pop_log]
    assert depths == sorted(depths), "BFS pops must be depth-monotone (FIFO levels)"
    assert max(depths) <= 2
    assert r.pop_log[0][1] == src


def test_poison_subset_of_bfs(edges, src):
    bfs = run_crawl(edges, src, "BFS", {"depth": 3})
    poison = run_crawl(edges, src, "Poison", {"depth": 3})
    assert poison.seen <= bfs.seen, "forward-only taint reaches a subset of BFS"


def test_haircut_weight_conservation(edges, src):
    r = run_crawl(edges, src, "Haircut", {"min_weight": 1e-3}, max_steps=500)
    total = sum(r.ranks.values())
    assert total <= 1.0 + 1e-9, "haircut mass never exceeds the seed weight"
    assert all(w >= 0 for w in r.ranks.values())


def test_appr_mass_conservation(edges, src):
    r = run_crawl(edges, src, "APPR", {"alpha": 0.15, "epsilon": 1e-4}, max_steps=500)
    # residual mass may leak to never-expanded leaves; p+r never exceeds 1
    snap = r.snapshots[-1]
    mass = sum(snap["p"].values()) + sum(snap["r"].values())
    assert mass <= 1.0 + 1e-9
    assert mass > 0.5


@pytest.mark.parametrize("strategy", ["TTRBase", "TTRWeight", "TTRTime", "TTRRedirect"])
def test_ttr_terminates_and_ranks_positive(edges, src, strategy):
    r = run_crawl(edges, src, strategy, {"epsilon": 5e-3}, max_steps=3000)
    assert len(r.pop_log) < 3000, f"{strategy} did not converge"
    assert r.ranks, "rank vector must be non-empty"
    assert all(v >= 0 or math.isclose(v, 0, abs_tol=1e-12) for v in r.ranks.values())


def test_dedup_idempotent(edges, src):
    r1 = run_crawl(edges, src, "BFS", {"depth": 2})
    r2 = run_crawl(edges, src, "BFS", {"depth": 2})
    assert r1.pop_log == r2.pop_log
    assert r1.edges_emitted == r2.edges_emitted
    assert len(r1.edges_emitted) == len(set(r1.edges_emitted)), "sink dedup is exact"


def test_registry_complete():
    assert set(STRATEGY_REGISTRY) == {
        "BFS", "Poison", "Haircut", "APPR", "TTRBase", "TTRWeight", "TTRTime", "TTRRedirect"
    }
