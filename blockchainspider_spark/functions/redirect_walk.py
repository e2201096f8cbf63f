"""The TTRRedirect swap-leg walk (SURVEY A11) — the ONE shared kernel.

This stack DFS over per-symbol swap indexes is a genuine sequential
data dependency (reference strategies/txs/ttr.py:644-698): each hop
follows the single counter-leg of a swap to the swaps that sourced or
consumed that symbol, so it cannot be expressed as a relational
operator. It is therefore the only code shared between the golden
oracle (oracle/ttr_redirect.py) and the vectorized engine strategy
(engine/strategies_vec.VecTtrRedirect) — everything relational around
it (symbol sums A9, chip merges A10, temporal W/density distribution)
is implemented independently on each side, which is what makes the
engine-vs-oracle equivalence tests meaningful.

Swaps are duck-typed: any object with a ``profits`` list of objects
carrying ``address / value / timestamp / symbol``.

Reference quirks preserved (see oracle/ttr_redirect.py header):
the distribution index is built from *output* profits for both
directions, and advances at most one step per slot.
"""

from __future__ import annotations


class Profit:
    __slots__ = ("address", "value", "timestamp", "symbol")

    def __init__(self, address, value, timestamp, symbol):
        self.address = address
        self.value = value
        self.timestamp = timestamp
        self.symbol = symbol


def symbol_index(swaps, forward: bool):
    """Per symbol: the swap indexes holding an *output* profit of that
    symbol (QUIRK: outputs for both directions), plus the running
    distribution index used to slice 'later'/'earlier' swaps."""
    sym_idx: dict = {}
    for i, swap in enumerate(swaps):
        for profit in swap.profits:
            if profit.value < 0:
                sym_idx.setdefault(profit.symbol, []).append(i)
    dist_idx: dict = {}
    for sym, es_idx in sym_idx.items():
        index = [0] * len(swaps)
        if forward:
            j = 0
            for i in range(len(index)):
                if j < len(es_idx) and es_idx[j] <= i:
                    j += 1 if j < len(es_idx) else 0
                index[i] = j
        else:
            j = len(es_idx) - 1
            for i in range(len(index) - 1, -1, -1):
                if j > 0 and es_idx[j] >= i:
                    j -= 1 if j > 0 else 0
                index[i] = j
        dist_idx[sym] = index
    return sym_idx, dist_idx


def redirect_targets(
    direction: int, symbol: str, start: int,
    swaps, dist_idx: dict, sym_idx: dict, chip_value: float, epsilon: float,
) -> list[Profit]:
    """Stack walk across swap legs: follow the single counter-leg of a
    1-input swap to the swaps that sourced/consumed that symbol."""
    result: list[Profit] = []
    stack = [(direction, symbol, start)]
    visited: set = set()
    while stack:
        frame = stack.pop()
        if frame in visited:
            continue
        visited.add(frame)
        direction, symbol, idx = frame
        swap = swaps[idx]
        same_dir = [p for p in swap.profits if p.value * direction > 0]
        counter = [p for p in swap.profits if p.value * direction < 0]

        if stack and chip_value / len(stack) < epsilon:
            return [p for p in same_dir if p.symbol == symbol]

        if len(counter) == 1:
            leg = counter[0]
            leg_es_idx = sym_idx.get(leg.symbol)
            leg_dist = dist_idx.get(leg.symbol)
            if leg_es_idx is None or leg_dist is None:
                continue
            if direction < 0:
                follow = leg_es_idx[leg_dist[idx]:]
            else:
                follow = leg_es_idx[:leg_dist[idx]]
            for nxt in follow:
                stack.append((direction, leg.symbol, nxt))
        else:
            result.extend(p for p in same_dir if p.symbol == symbol)
    return result
