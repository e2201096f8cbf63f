"""Dump golden oracle artifacts (FIXTURES.md §7) to tests/golden/.

Per strategy on the seed-42 fixture graph: pop_log.jsonl (crawl-order
contract), seen.txt (sorted membership), ranks.csv (node,rank desc).
Committed to the repo; tests/test_golden.py pins the oracle against
them so silent oracle edits can't shift the correctness authority.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from blockchainspider_spark.fixtures.generators import make_edges, node_address  # noqa: E402
from blockchainspider_spark.oracle.crawl import run_crawl  # noqa: E402

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

MAX_STEPS = 120


def main():
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                           "tests", "golden")
    os.makedirs(out_dir, exist_ok=True)
    edges = make_edges(n_nodes=60, n_edges=400, seed=42)
    source = node_address(0)
    for strategy, params in CASES:
        res = run_crawl(edges, source, strategy, params, max_steps=MAX_STEPS)
        d = os.path.join(out_dir, strategy)
        os.makedirs(d, exist_ok=True)
        with open(os.path.join(d, "pop_log.jsonl"), "w") as fh:
            for step, node, ctx in res.pop_log:
                fh.write(json.dumps({"step": step, "node": node, "ctx": ctx}) + "\n")
        with open(os.path.join(d, "seen.txt"), "w") as fh:
            fh.write("\n".join(sorted(res.seen)) + "\n")
        with open(os.path.join(d, "ranks.csv"), "w") as fh:
            fh.write("node,rank\n")
            for node, rank in sorted(res.ranks.items(), key=lambda kv: (-kv[1], kv[0])):
                fh.write(f"{node},{rank!r}\n")
        print(f"{strategy}: {len(res.pop_log)} pops, {len(res.seen)} seen, {len(res.ranks)} ranks")


if __name__ == "__main__":
    main()
