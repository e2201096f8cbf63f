"""Exact-order engine (all 8 strategies) vs the golden oracle.

Pop sequence must match exactly; rank vectors to 1e-9 (numpy pairwise
summation vs the oracle's left fold — same math, different float
association)."""

import numpy as np
import pytest

from blockchainspider_spark.engine.exact import ExactCrawlEngine
from blockchainspider_spark.oracle.crawl import run_crawl

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


@pytest.mark.parametrize("strategy,params", CASES, ids=[c[0] for c in CASES])
def test_exact_engine_matches_oracle(spark, edges_df, edges_pdf, source, strategy, params):
    want = run_crawl(edges_pdf, source, strategy, params, max_steps=120)
    engine = ExactCrawlEngine(spark, edges_df, strategy, params)
    got = engine.run(source, max_steps=120)

    assert [(s, n) for s, n, _ in got.pop_log] == [(s, n) for s, n, _ in want.pop_log], (
        f"{strategy}: pop order diverged"
    )
    assert got.seen == want.seen
    assert got.emitted_ids == want.edges_emitted

    if want.ranks:
        assert set(got.ranks) == set(want.ranks)
        w = np.array([want.ranks[k] for k in want.ranks])
        g = np.array([got.ranks[k] for k in want.ranks])
        np.testing.assert_allclose(g, w, rtol=1e-9, atol=1e-12)
