"""Misra-Gries heavy-hitters sketch (Misra & Gries 1982; mergeability per
Agarwal et al., "Mergeable Summaries", PODS 2012).

Bounded-memory frequent-item summary: at most ``capacity`` counters; after
any sequence of adds/merges, every item's estimate satisfies

    true_count - err <= estimate <= true_count,   err <= n / (capacity + 1)

where ``n`` is the total weight seen. Consequence used by the exact
two-pass top-k: any item with true count > n/(capacity+1) is GUARANTEED to
be present in the sketch, so the sketch's keys are a superset of the true
heavy hitters — recount just those keys exactly in a second pass and the
top-k is exact whenever the k-th count clears the bound (asserted in-run).

Adds are weighted (value_counts partials feed in batch), merges are the
counter-sum + batch-decrement form from Mergeable Summaries: sum counters,
and if more than ``capacity`` survive, subtract the (capacity+1)-th
largest count from all and drop the non-positive ones.
"""

from __future__ import annotations

from typing import Dict, Iterable, Tuple


class MisraGries:
    __slots__ = ("capacity", "counters", "n", "decremented")

    def __init__(self, capacity: int = 4096):
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        self.capacity = capacity
        self.counters: Dict[object, int] = {}
        self.n = 0  # total weight offered (for the error bound)
        self.decremented = 0  # total decrement applied (actual error bound)

    def _trim(self) -> None:
        if len(self.counters) <= self.capacity:
            return
        counts = sorted(self.counters.values(), reverse=True)
        d = counts[self.capacity]  # (capacity+1)-th largest
        self.counters = {k: v - d for k, v in self.counters.items() if v > d}
        self.decremented += d

    def add_counts(self, pairs: Iterable[Tuple[object, int]]) -> "MisraGries":
        c = self.counters
        for key, w in pairs:
            w = int(w)
            self.n += w
            if key in c:
                c[key] += w
            else:
                c[key] = w
        self._trim()
        return self

    def merge(self, other: "MisraGries") -> "MisraGries":
        assert self.capacity == other.capacity
        out = MisraGries(self.capacity)
        out.counters = dict(self.counters)
        for k, v in other.counters.items():
            out.counters[k] = out.counters.get(k, 0) + v
        out.n = self.n + other.n
        out.decremented = self.decremented + other.decremented
        out._trim()
        return out

    def error_bound(self) -> int:
        """Max undercount of any estimate: the ACTUAL total decrement, which
        is always <= n // (capacity + 1)."""
        return self.decremented

    def candidates(self):
        """(key, estimate) pairs, estimate-descending. Superset of every
        item with true count > error_bound()."""
        return sorted(self.counters.items(), key=lambda kv: (-kv[1], str(kv[0])))
