"""The oracle is pinned against committed golden artifacts.

Regenerate deliberately with ``python tools/make_golden.py`` — a diff in
tests/golden/ is a *semantic change to the correctness authority* and
must be intentional.
"""

import json
import math
import os

import pytest

from blockchainspider_spark.fixtures.generators import make_edges, node_address
from blockchainspider_spark.oracle.crawl import run_crawl

GOLDEN = os.path.join(os.path.dirname(__file__), "golden")
CASES = [
    ("BFS", {"depth": 2}),
    ("Poison", {"depth": 2}),
    ("Haircut", {"min_weight": 1e-3}),
    ("APPR", {"alpha": 0.15, "epsilon": 1e-4}),
    ("TTRBase", {"epsilon": 5e-3}),
    ("TTRWeight", {"epsilon": 5e-3}),
    ("TTRTime", {"epsilon": 5e-3}),
    ("TTRRedirect", {"epsilon": 5e-3}),
]


@pytest.fixture(scope="module")
def fixture_edges():
    return make_edges(n_nodes=60, n_edges=400, seed=42)


@pytest.mark.parametrize("strategy,params", CASES, ids=[c[0] for c in CASES])
def test_oracle_matches_golden(fixture_edges, strategy, params):
    res = run_crawl(fixture_edges, node_address(0), strategy, params, max_steps=120)
    d = os.path.join(GOLDEN, strategy)

    want_pops = [json.loads(ln) for ln in open(os.path.join(d, "pop_log.jsonl"))]
    got_pops = [{"step": s, "node": n, "ctx": c} for s, n, c in res.pop_log]
    assert got_pops == want_pops, f"{strategy}: pop log diverged from golden"

    want_seen = set(open(os.path.join(d, "seen.txt")).read().split())
    assert res.seen == want_seen

    want_ranks = {}
    with open(os.path.join(d, "ranks.csv")) as fh:
        next(fh)
        for line in fh:
            node, rank = line.rsplit(",", 1)
            want_ranks[node] = float(rank)
    assert set(res.ranks) == set(want_ranks)
    for k, v in want_ranks.items():
        assert math.isclose(res.ranks[k], v, rel_tol=0, abs_tol=0) or res.ranks[k] == v, (
            f"{strategy}: rank for {k} changed bit-for-bit"
        )
