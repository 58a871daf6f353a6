"""KLL quantile sketch (Karnin, Lang & Liberty 2016) — deterministic variant.

Levels of sorted buffers; items at level i carry weight 2^i. When a level
overflows its (geometrically shrinking) capacity it is compacted: every
other item of the sorted buffer is promoted to the next level, the rest are
discarded. This implementation alternates the surviving parity per level
(deterministic compaction) so results are reproducible across runs and merge
orders at the cost of a slightly weaker worst-case bound — the right trade
for a correctness-gated distributed engine.

Mergeable: level-wise concatenation + re-compaction. Serializes to bytes for
transport through Arrow binary columns.
"""

from __future__ import annotations

import pickle
from typing import List, Optional, Sequence

import numpy as np


class KLL:
    __slots__ = ("k", "levels", "n", "flips")

    def __init__(self, k: int = 800):
        self.k = k
        self.levels: List[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.n = 0
        self.flips: List[bool] = [False]

    # --- construction ------------------------------------------------------

    def add_many(self, values) -> "KLL":
        v = np.asarray(values, dtype=np.float64)
        v = v[~np.isnan(v)]
        if v.size == 0:
            return self
        self.levels[0] = np.concatenate([self.levels[0], v])
        self.n += int(v.size)
        self._compress()
        return self

    def _cap(self, level: int) -> int:
        depth = len(self.levels)
        return max(8, int(self.k * (2.0 / 3.0) ** (depth - 1 - level)))

    def _compress(self) -> None:
        total_cap = sum(self._cap(i) for i in range(len(self.levels)))
        if sum(len(l) for l in self.levels) <= total_cap:
            return
        i = 0
        while i < len(self.levels):
            if len(self.levels[i]) > self._cap(i):
                buf = np.sort(self.levels[i])
                offset = 1 if self.flips[i] else 0
                self.flips[i] = not self.flips[i]
                promoted = buf[offset::2]
                self.levels[i] = np.empty(0, dtype=np.float64)
                if i + 1 == len(self.levels):
                    self.levels.append(np.empty(0, dtype=np.float64))
                    self.flips.append(False)
                self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])
            i += 1

    # --- merge -------------------------------------------------------------

    def merge(self, other: "KLL") -> "KLL":
        out = KLL(min(self.k, other.k))
        depth = max(len(self.levels), len(other.levels))
        out.levels = []
        out.flips = []
        for i in range(depth):
            a = self.levels[i] if i < len(self.levels) else np.empty(0)
            b = other.levels[i] if i < len(other.levels) else np.empty(0)
            out.levels.append(np.concatenate([a, b]).astype(np.float64))
            fa = self.flips[i] if i < len(self.flips) else False
            fb = other.flips[i] if i < len(other.flips) else False
            out.flips.append(fa ^ fb)
        out.n = self.n + other.n
        out._compress()
        return out

    # --- queries -----------------------------------------------------------

    def _weighted(self):
        items, weights = [], []
        for i, buf in enumerate(self.levels):
            if len(buf):
                items.append(buf)
                weights.append(np.full(len(buf), 1 << i, dtype=np.float64))
        if not items:
            return np.empty(0), np.empty(0)
        it = np.concatenate(items)
        wt = np.concatenate(weights)
        order = np.argsort(it, kind="stable")
        return it[order], wt[order]

    def quantile(self, q: float) -> Optional[float]:
        it, wt = self._weighted()
        if it.size == 0:
            return None
        cum = np.cumsum(wt)
        target = q * cum[-1]
        idx = int(np.searchsorted(cum, target, side="left"))
        return float(it[min(idx, it.size - 1)])

    def quantiles(self, qs: Sequence[float]):
        return [self.quantile(q) for q in qs]

    def cdf(self, xs) -> np.ndarray:
        """P(X <= x) for each x (from the sketch's weighted sample)."""
        it, wt = self._weighted()
        xs = np.asarray(xs, dtype=np.float64)
        if it.size == 0:
            return np.zeros(xs.shape)
        cum = np.cumsum(wt)
        idx = np.searchsorted(it, xs, side="right")
        out = np.where(idx > 0, cum[np.maximum(idx - 1, 0)], 0.0)
        return out / cum[-1]

    def support(self) -> np.ndarray:
        """All retained items (sorted) — evaluation points for KS."""
        return self._weighted()[0]

    # --- serialization -----------------------------------------------------

    def to_bytes(self) -> bytes:
        return pickle.dumps((self.k, self.n, self.flips, [l for l in self.levels]))

    @classmethod
    def from_bytes(cls, buf: bytes) -> "KLL":
        k, n, flips, levels = pickle.loads(buf)
        out = cls(k)
        out.n = n
        out.flips = flips
        out.levels = levels
        return out
