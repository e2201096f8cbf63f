"""MoTS motif vectors vs hand-derived oracles (K8/A15 parity).

Every expected vector below is derived by hand on paper from the motif
definitions (reference plugins/mots/highorder.py) — an oracle fully
independent of the implementation's matrix algebra.
"""

import pandas as pd
import pytest

from blockchainspider_spark.operators.motif import motif_vector, motif_vectors_by_tx


def vec(edges):
    return motif_vector([u for u, _ in edges], [v for _, v in edges])


def test_single_edge_early_return():
    assert vec([("a", "b")]) == {1: 1.0, **{i: 0.0 for i in range(2, 17)}}


def test_bidirectional_pair_with_multiplicity():
    # a→b ×3, b→a ×1: bidirectional mask, weighted adjacency 3+1 over |B|=2
    got = vec([("a", "b"), ("a", "b"), ("a", "b"), ("b", "a")])
    assert got[2] == 2.0 and got[1] == 0.0
    assert all(got[i] == 0.0 for i in range(3, 17))


def test_cyclic_triangle_is_m1():
    got = vec([("a", "b"), ("b", "c"), ("c", "a")])
    assert got[1] == 3.0 and got[3] == 1.0
    assert all(got[i] == 0.0 for i in set(range(2, 17)) - {3})


def test_feed_forward_loop_is_m5():
    got = vec([("a", "b"), ("a", "c"), ("b", "c")])
    assert got[1] == 3.0 and got[7] == 1.0
    assert all(got[i] == 0.0 for i in set(range(2, 17)) - {7})


def test_out_wedge_is_m8_and_in_wedge_is_m10():
    out_w = vec([("a", "b"), ("a", "c")])
    assert out_w[1] == 2.0 and out_w[10] == 1.0
    assert all(out_w[i] == 0.0 for i in set(range(2, 17)) - {10})
    in_w = vec([("b", "a"), ("c", "a")])
    assert in_w[1] == 2.0 and in_w[12] == 1.0
    assert all(in_w[i] == 0.0 for i in set(range(2, 17)) - {12})


def test_path_through_is_m9():
    got = vec([("a", "b"), ("b", "c")])  # a→b→c, a–c non-adjacent
    assert got[1] == 2.0 and got[11] == 1.0
    assert all(got[i] == 0.0 for i in set(range(2, 17)) - {11})


def test_bifan():
    got = vec([("s0", "t0"), ("s0", "t1"), ("s1", "t0"), ("s1", "t1")])
    # 4 U-edges, two out-wedges (s0, s1), two in-wedges (t0, t1), one bifan
    assert got[1] == 4.0 and got[10] == 2.0 and got[12] == 2.0 and got[16] == 1.0
    assert all(got[i] == 0.0 for i in set(range(2, 17)) - {10, 12, 16})


def test_empty_endpoint_collapses():
    got = vec([(None, "b"), ("", "c")])  # both sources collapse to ''
    assert got[1] == 2.0 and got[10] == 1.0  # an out-wedge centered on ''


def test_motif_vectors_by_tx_spark(spark):
    pdf = pd.DataFrame({
        "transaction_hash": ["t1"] * 3 + ["t2"] * 4,
        "address_from": ["a", "b", "c", "s0", "s0", "s1", "s1"],
        "address_to": ["b", "c", "a", "t0", "t1", "t0", "t1"],
    })
    rows = {r.transaction_hash: r for r in
            motif_vectors_by_tx(spark.createDataFrame(pdf)).collect()}
    assert rows["t1"].M1 == 3.0 and rows["t1"].M3 == 1.0
    assert rows["t2"].M16 == 1.0 and rows["t2"].M10 == 2.0 and rows["t2"].M12 == 2.0


@pytest.mark.parametrize("n", [8, 15])
def test_random_graph_sanity(n):
    """Invariants on random multigraphs: non-negative scores; the U/B
    scores equal the weighted uni/bi edge masses."""
    import numpy as np

    rng = np.random.default_rng(n)
    edges = [(f"n{rng.integers(0, 6)}", f"n{rng.integers(0, 6)}") for _ in range(n)]
    edges = [(u, v) for u, v in edges if u != v]
    if len(edges) < 2:
        return
    got = vec(edges)
    assert all(val >= 0.0 for val in got.values())
    # independent U/B mass computation
    from collections import Counter

    w = Counter(edges)
    uni = sum(c for (u, v), c in w.items() if (v, u) not in w)
    bi = sum(c for (u, v), c in w.items() if (v, u) in w)
    assert got[1] == pytest.approx(uni)
    assert got[2] == pytest.approx(bi / 2)
