"""Unit-level (no Spark) property pin of the hub push's distributed
netting: stage A's per-hash-bucket kernel + stage B's creation-triple
reassembly must reproduce ``VecTtrRedirect._aggregate``'s swap list —
same swaps, same hash order, same newest-first legs, same values and
sign-flip-adopted timestamps — for ANY bucketing of the hashes. This is
the exact-parity claim the Spark tests exercise end-to-end, pinned here
directly on random inputs at property-test speed (hundreds of examples,
milliseconds each)."""

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from blockchainspider_spark.engine.strategies_vec import VecTtrRedirect
from blockchainspider_spark.engine.wave_redirect import _netting_kernel

NODE = "hub"
PEERS = ["p0", "p1", "p2", NODE]  # self-loops included


@st.composite
def edge_batches(draw):
    n = draw(st.integers(1, 24))
    rows = []
    for i in range(n):
        frm = draw(st.sampled_from([NODE, "p0", "p1"]))
        to = draw(st.sampled_from(PEERS)) if frm == NODE else NODE
        rows.append({
            "id": f"e{i:02d}",
            "hash": f"h{draw(st.integers(0, 5))}",
            "from": frm, "to": to,
            # includes 0 and exact-cancel candidates
            "value": float(draw(st.sampled_from([0, 1, 2, 3, 5]))),
            "timeStamp": draw(st.integers(1, 20)),
            "symbol": draw(st.sampled_from(["native", "TOK1"])),
            "_bn": draw(st.integers(1, 6)),
            "_pseq": 7,
            "_node": NODE,
        })
    return pd.DataFrame(rows)


def _reference_swaps(batch: pd.DataFrame):
    model = VecTtrRedirect("\x00-none", epsilon=1e-9)
    ed = batch.sort_values(["_bn", "timeStamp", "id"], kind="mergesort")
    return model._aggregate(NODE, ed)


def _reassembled_swaps(batch: pd.DataFrame, n_buckets: int):
    """Stage A over hash buckets + stage B ordering, as the engine does."""
    kernel = _netting_kernel()
    parts = []
    for b in range(n_buckets):
        grp = batch[batch["hash"].map(hash) % n_buckets == b]
        if len(grp):
            parts.append(kernel(grp.copy()))
    if not parts:
        return []
    net = pd.concat(parts).sort_values(
        ["cbn", "cts", "cid", "ord"], kind="mergesort")
    swaps = []
    cur = None
    for r in net.itertuples(index=False):
        key = (r.cbn, r.cts, r.cid)
        if key != cur:
            swaps.append([])
            cur = key
        swaps[-1].append((r.cp, float(r.value), int(r.ts), r.symbol))
    return swaps


@settings(max_examples=200, deadline=None)
@given(batch=edge_batches(), n_buckets=st.integers(1, 4))
def test_bucketed_netting_equals_sequential_aggregate(batch, n_buckets):
    want = [
        [(p.address, float(p.value), int(p.timestamp), p.symbol)
         for p in swap.profits]
        for swap in _reference_swaps(batch)
    ]
    got = _reassembled_swaps(batch, n_buckets)
    assert got == want
