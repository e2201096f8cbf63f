"""MoTS 16-dim motif vectors per transaction subgraph (K8/A15).

Faithful numpy re-derivation of the reference's higher-order motif
counter (/root/reference/plugins/mots/highorder.py:6-222, wired per tx
hash by plugins/mots/pipelines.py:30-71): per transaction, build the
multigraph of its transfers, then score 16 motif classes — 2-node
unidirectional/bidirectional, the thirteen 3-node motifs M1–M13
(triangles via masked matrix products, wedges via neighborhood scans),
and the 4-node bifan — each as sum(adjacency ⊙ motif-matrix)/|motif
edges|. The adjacency keeps edge multiplicity as weight (the
reference's MultiDiGraph→DiGraph collapse), masks are boolean.

Semantics preserved exactly:
* one single edge in the multigraph → {M1: 1.0, rest 0} early return;
* falsy endpoints collapse to '' nodes;
* wedge motifs (M8–M13) count only endpoint pairs with NO edge in
  either direction; the bifan scans non-adjacent source pairs.

Per-tx subgraphs are small (tens of nodes), so the dense O(N³) kernels
run per group inside applyInPandas — the genuinely-heavy-group shape
(contrast operators/block_etl's many-small-groups stats kernel).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

#: |edges| of each motif class, in vector order (reference highorder.py:8-24)
DIVISORS = [1, 2, 3, 4, 5, 6, 3, 4, 4, 2, 2, 2, 3, 3, 4, 4]

MOTIF_SCHEMA = "transaction_hash string, " + ", ".join(
    f"M{i} double" for i in range(1, 17)
)


def _bu(a: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    b = a * a.T
    return b, a - b


def _wedge_scan(a: np.ndarray, rows_of: np.ndarray) -> np.ndarray:
    """Shared M8/M10/M13 shape: for each center i, every unordered pair
    (k1, k2) of its ``rows_of[i]`` neighbors with no edge between them
    adds one wedge touching (i,k1), (i,k2), (k1,k2)."""
    n = a.shape[0]
    w = np.zeros_like(a, dtype=np.float64)
    for i in range(n):
        nbrs = np.nonzero(rows_of[i])[0]
        for j1 in range(len(nbrs)):
            for j2 in range(j1 + 1, len(nbrs)):
                k1, k2 = nbrs[j1], nbrs[j2]
                if a[k1, k2] == 0 and a[k2, k1] == 0:
                    w[i, k1] += 1
                    w[i, k2] += 1
                    w[k1, k2] += 1
    return w + w.T


def _pair_scan(a: np.ndarray, rows1: np.ndarray, rows2: np.ndarray) -> np.ndarray:
    """Shared M9/M11 shape: centers pair one neighbor from each of two
    (disjoint) neighbor sets."""
    n = a.shape[0]
    w = np.zeros_like(a, dtype=np.float64)
    for i in range(n):
        n1 = np.nonzero(rows1[i])[0]
        n2 = np.nonzero(rows2[i])[0]
        for k1 in n1:
            for k2 in n2:
                if a[k1, k2] == 0 and a[k2, k1] == 0:
                    w[i, k1] += 1
                    w[i, k2] += 1
                    w[k1, k2] += 1
    return w + w.T


def _bifan(a: np.ndarray, u: np.ndarray) -> np.ndarray:
    na = (a == 0) & (a.T == 0)
    w = np.zeros_like(a, dtype=np.float64)
    xs, ys = np.nonzero(np.triu(na, 1))
    for x, y in zip(xs, ys):
        common = np.nonzero(u[x] * u[y])[0]
        for i in range(len(common)):
            for j in range(i + 1, len(common)):
                cw, cv = common[i], common[j]
                if na[cw, cv]:
                    for p, q in ((x, y), (x, cw), (x, cv), (y, cw), (y, cv), (cw, cv)):
                        w[p, q] += 1
    return w + w.T


def motif_vector(srcs, dsts) -> dict[int, float]:
    """16-dim motif scores {1..16} for one transaction's transfer edges."""
    srcs = ["" if not u else u for u in srcs]
    dsts = ["" if not v else v for v in dsts]
    if len(srcs) == 1:
        return {1: 1.0, **{i: 0.0 for i in range(2, 17)}}
    index: dict[str, int] = {}
    for u, v in zip(srcs, dsts):
        index.setdefault(u, len(index))
        index.setdefault(v, len(index))
    n = len(index)
    adj = np.zeros((n, n), dtype=np.float64)  # multiplicity-weighted
    for u, v in zip(srcs, dsts):
        adj[index[u], index[v]] += 1.0
    a = (adj > 0).astype(np.int64)
    b, u = _bu(a)

    mats: list[np.ndarray] = [u.astype(np.float64), b.astype(np.float64)]
    c = (u @ u) * u.T
    mats.append(c + c.T)                                             # M1
    c = (b @ u) * u.T + (u @ b) * u.T + (u @ u) * b
    mats.append(c + c.T)                                             # M2
    c = (b @ b) * u + (b @ u) * b + (u @ b) * b
    mats.append(c + c.T)                                             # M3
    mats.append(((b @ b) * b).astype(np.float64))                    # M4
    c = (u @ u) * u + (u @ u.T) * u + (u.T @ u) * u
    mats.append(c + c.T)                                             # M5
    mats.append(((u @ b) * u + (b @ u.T) * u.T + (u.T @ u) * b).astype(np.float64))    # M6
    mats.append(((u.T @ b) * u.T + (b @ u) * u + (u @ u.T) * b).astype(np.float64))    # M7
    mats.append(_wedge_scan(a, u))                                   # M8 (out-wedge)
    mats.append(_pair_scan(a, u, u.T))                               # M9
    bt, ut = _bu(a.T)
    mats.append(_wedge_scan(a.T, ut))                                # M10 (in-wedge)
    mats.append(_pair_scan(a, b, u))                                 # M11
    mats.append(_pair_scan(a.T, bt, ut))                             # M12
    mats.append(_wedge_scan(a, b))                                   # M13
    mats.append(_bifan(a, u))                                        # bifan

    return {
        i + 1: float((adj * mats[i]).sum() / DIVISORS[i]) for i in range(16)
    }


def motif_vectors_by_tx(
    transfers: DataFrame, tx_col: str = "transaction_hash"
) -> DataFrame:
    """One 16-dim motif row per transaction: applyInPandas per tx group —
    groups do genuine O(N³) matrix work, so the per-group shape is right
    here (the reference offloads the same groups to a process pool,
    pipelines.py:36,70)."""

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        vec = motif_vector(pdf["address_from"].tolist(), pdf["address_to"].tolist())
        row = {"transaction_hash": [pdf[tx_col].iloc[0]]}
        row.update({f"M{i}": [vec[i]] for i in range(1, 17)})
        return pd.DataFrame(row)

    return transfers.groupBy(tx_col).applyInPandas(kernel, MOTIF_SCHEMA)
