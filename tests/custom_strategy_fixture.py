"""User-plugin example strategy for the X1 extension-point test: expand
out-neighbors of the seed only (one hop), FIFO order."""

from collections import deque


class OutOnlyOnce:
    def __init__(self, source, **_):
        self.source = source
        self._fifo = deque()
        self.visited = {source}

    def push(self, node, batch, **ctx):
        if ctx.get("depth", 0) >= 1:
            return
        for dst in batch.loc[batch["from"] == node, "to"]:
            self._fifo.append(dst)

    def pop(self):
        while self._fifo:
            node = self._fifo.popleft()
            if node in self.visited:
                continue
            self.visited.add(node)
            return node, {"depth": 1}
        return None, {}

    def ranks(self):
        return {}

    def state_rows(self):
        import pandas as pd

        return pd.DataFrame({"node": list(self.visited), "r": 0.0, "p": 0.0})
