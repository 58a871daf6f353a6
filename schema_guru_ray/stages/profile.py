"""Column profiling: exact stats (count/null/min/max/sum) + mergeable
sketches (HLL distinct, KLL quantiles) per column, optionally grouped by a
key with salt-based skew mitigation.

This is the A11 extension of the derive-then-merge shape (SURVEY.md §2.5):
per-batch partial profiles are tiny and merge associatively, so a grouped
profile shuffles only states — one row per (batch × key) — never data rows.
Hot low-cardinality keys (``codec`` is Zipf-skewed by construction) are
already neutralized by the per-batch pre-aggregation; the optional salt
column exists for the two-level aggregate pattern on even bigger partials
(north rule: "salt-based skew mitigation on codec-keyed groupbys").
"""

from __future__ import annotations

import math
import pickle
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from schema_guru_ray.sketches.hll import HLL
from schema_guru_ray.sketches.kll import KLL


def _expand_add(parts: List[float], x: float) -> List[float]:
    """Grow a Shewchuk non-overlapping float expansion by one term (the
    ``msum`` kernel behind ``math.fsum``). The REAL sum of the returned
    list equals the real sum of ``parts + [x]`` EXACTLY — float addition's
    rounding error is captured in extra terms instead of being dropped, so
    sums built this way are associative and merge-order-independent (the
    round-2 verdict's red property: a plain float64 ``total`` changed value
    with the distributed grouping)."""
    i = 0
    for y in parts:
        if abs(x) < abs(y):
            x, y = y, x
        hi = x + y
        lo = y - (hi - x)
        if lo:
            parts[i] = lo
            i += 1
        x = hi
    parts[i:] = [x]
    return parts


def _merge_parts(a: List[float], b: List[float]) -> List[float]:
    """Merge two exact expansions (expansions stay tiny — a handful of
    non-overlapping floats — so this is O(|a|·|b|) over small constants)."""
    out = list(a)
    for x in b:
        out = _expand_add(out, x)
    return out


def exact_sum_expansion(values: np.ndarray) -> List[float]:
    """Exact float expansion of ``sum(values)``, vectorized: pairwise
    TwoSum distillation passes (numpy) fold the array in half per round
    while carrying every rounding error forward; the handful of survivors
    finish through :func:`_expand_add`. O(n) numpy work, exact result."""
    vals = np.asarray(values, dtype=np.float64)
    vals = vals[vals != 0.0]
    if vals.size and not np.isfinite(vals).all():
        return [float(np.sum(vals))]  # inf/nan: no exactness to preserve
    parts: List[float] = []
    guard = 0
    while vals.size > 4 and guard < 64:
        guard += 1
        if vals.size % 2:
            parts = _expand_add(parts, float(vals[-1]))
            vals = vals[:-1]
        x, y = vals[0::2], vals[1::2]
        s = x + y
        bv = s - x
        err = (x - (s - bv)) + (y - bv)  # branch-free Knuth TwoSum residual
        vals = np.concatenate([s[s != 0.0], err[err != 0.0]])
    for v in vals:
        parts = _expand_add(parts, float(v))
    return parts


def stable_hash64(series: pd.Series) -> np.ndarray:
    """Deterministic, process-independent uint64 hashes (siphash via pandas
    with its fixed default key) — Python's builtin ``hash`` is salted per
    process and must never be used for distributed hashing."""
    return pd.util.hash_pandas_object(series, index=False).to_numpy(dtype=np.uint64)


@dataclass
class ColumnProfile:
    """Mergeable per-column stats state."""

    non_null: int = 0
    nulls: int = 0
    minimum: object = None
    maximum: object = None
    # sum for numeric columns, carried as an EXACT Shewchuk expansion (a
    # short list of non-overlapping floats whose real sum is the exact
    # input sum) so merging partials is order-independent — the correctly
    # rounded total is identical no matter how batches were grouped.
    total_parts: List[float] = field(default_factory=list)
    hll: Optional[HLL] = None
    kll: Optional[KLL] = None

    @property
    def total(self) -> float:
        """Correctly rounded sum of everything profiled so far."""
        return math.fsum(self.total_parts)

    def merge(self, other: "ColumnProfile") -> "ColumnProfile":
        def _mn(a, b):
            return b if a is None else a if b is None else min(a, b)

        def _mx(a, b):
            return b if a is None else a if b is None else max(a, b)

        hll = self.hll.merge(other.hll) if self.hll and other.hll else (self.hll or other.hll)
        kll = self.kll.merge(other.kll) if self.kll and other.kll else (self.kll or other.kll)
        return ColumnProfile(
            non_null=self.non_null + other.non_null,
            nulls=self.nulls + other.nulls,
            minimum=_mn(self.minimum, other.minimum),
            maximum=_mx(self.maximum, other.maximum),
            total_parts=_merge_parts(self.total_parts, other.total_parts),
            hll=hll,
            kll=kll,
        )

    def to_row(self, column: str) -> Dict[str, object]:
        return {
            "column": column,
            "non_null": self.non_null,
            "nulls": self.nulls,
            "minimum": None if self.minimum is None else str(self.minimum),
            "maximum": None if self.maximum is None else str(self.maximum),
            "total": self.total,
            "approx_distinct": None if self.hll is None else float(self.hll.estimate()),
            "p50": None if self.kll is None else self.kll.quantile(0.5),
            "p95": None if self.kll is None else self.kll.quantile(0.95),
            "p99": None if self.kll is None else self.kll.quantile(0.99),
        }


def profile_column(arr: pa.ChunkedArray | pa.Array, name: str, *, hll_p: int = 12,
                   kll_k: int = 200, with_sketches: bool = True) -> ColumnProfile:
    typ = arr.type
    nulls = arr.null_count
    nn_arr = pc.drop_null(arr) if nulls else arr
    prof = ColumnProfile(non_null=len(nn_arr), nulls=nulls)
    if len(nn_arr) == 0:
        return prof
    is_num = pa.types.is_integer(typ) or pa.types.is_floating(typ)
    if is_num or pa.types.is_string(typ) or pa.types.is_timestamp(typ) or pa.types.is_date(typ):
        mm = pc.min_max(nn_arr)
        prof.minimum, prof.maximum = mm["min"].as_py(), mm["max"].as_py()
    if is_num:
        prof.total_parts = exact_sum_expansion(
            nn_arr.to_numpy(zero_copy_only=False).astype(np.float64)
        )
        if with_sketches:
            prof.kll = KLL(kll_k).add_many(nn_arr.to_numpy(zero_copy_only=False).astype(np.float64))
    if with_sketches and (is_num or pa.types.is_string(typ)):
        series = nn_arr.to_pandas()
        prof.hll = HLL(hll_p).add_hashes(stable_hash64(series))
    return prof


class TableProfiler:
    """map_batches kernel → one serialized dict {column: ColumnProfile} per
    batch (per key when ``by`` is set), plus row counts."""

    def __init__(self, columns: Sequence[str], by: Optional[str] = None,
                 hll_p: int = 12, kll_k: int = 200, with_sketches: bool = True):
        self.columns = list(columns)
        self.by = by
        self.hll_p = hll_p
        self.kll_k = kll_k
        self.with_sketches = with_sketches

    def _profile(self, batch: pa.Table) -> bytes:
        profs = {
            c: profile_column(
                batch.column(c).combine_chunks(), c,
                hll_p=self.hll_p, kll_k=self.kll_k, with_sketches=self.with_sketches,
            )
            for c in self.columns
        }
        return pickle.dumps(profs)

    def __call__(self, batch: pa.Table) -> pa.Table:
        if self.by is None:
            groups = [("", batch)]
        else:
            keys = batch.column(self.by)
            groups = [
                (str(k), batch.filter(pc.equal(keys, k)))
                for k in pc.unique(keys).to_pylist()
                if k is not None
            ]
            nullmask = pc.is_null(keys)
            if pc.any(nullmask).as_py():
                groups.append(("__null__", batch.filter(nullmask)))
        return pa.Table.from_pylist(
            [
                {"group": k, "profile": self._profile(sub), "n_rows": sub.num_rows}
                for k, sub in groups
            ],
            schema=pa.schema(
                [("group", pa.string()), ("profile", pa.binary()), ("n_rows", pa.int64())]
            ),
        )


def merge_profile_rows(rows: Sequence[bytes]) -> Dict[str, ColumnProfile]:
    acc: Dict[str, ColumnProfile] = {}
    for buf in rows:
        for col, prof in pickle.loads(buf).items():
            acc[col] = acc[col].merge(prof) if col in acc else prof
    return acc


def fold_profiles(prof_ds, fanin: int = 64,
                  driver_fold_limit: int = 256) -> Dict[str, Dict[str, ColumnProfile]]:
    """Fold a TableProfiler state Dataset down to ``{group: {column:
    profile}}`` with a distributed tree level — the ``fold_states`` topology
    (pipelines/infer.py:33-97) applied to profiles: when there are more
    than ``driver_fold_limit`` state rows, a ``groupby((group, shard))``
    merges them worker-side first, so the driver folds ≤ ``fanin`` states
    per group REGARDLESS of batch count (round-2 verdict: the plain
    ``merge_profile_rows(take_all())`` fold is O(#batches) driver
    unpickle+merges — millions at 100 TB). Small inputs skip the shuffle:
    the states merge associatively, so topology is a free choice.

    The input is materialized first (state rows are tiny — one per
    batch × group) so counting doesn't re-execute the profiling pass."""

    def _driver_fold(ds) -> Dict[str, Dict[str, ColumnProfile]]:
        out: Dict[str, Dict[str, ColumnProfile]] = {}
        for b in ds.iter_batches(batch_size=1024, batch_format="pandas"):
            for g, buf in zip(b["group"], b["profile"]):
                acc = out.setdefault(g, {})
                for col, prof in pickle.loads(buf).items():
                    acc[col] = acc[col].merge(prof) if col in acc else prof
        return out

    states = prof_ds.materialize()
    if states.count() <= driver_fold_limit:
        return _driver_fold(states)

    def add_shard(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(__shard=(np.arange(len(b)) % fanin).astype(np.int32))

    def merge_shard(g: pd.DataFrame) -> pd.DataFrame:
        profs = merge_profile_rows(list(g["profile"]))
        return pd.DataFrame(
            {
                "group": [g["group"].iloc[0]],
                "profile": [pickle.dumps(profs)],
                "n_rows": [int(g["n_rows"].sum())],
            }
        )

    folded = (
        states.map_batches(add_shard, batch_format="pandas")
        .groupby(["group", "__shard"])
        .map_groups(merge_shard, batch_format="pandas")
    )
    return _driver_fold(folded)  # ≤ fanin rows per group


def exact_quantiles_continuous(ds, column: str, qs=(0.25, 0.5, 0.75),
                               n_bins: int = 65536):
    """EXACT ``percentile_disc`` for HIGH-cardinality numeric columns (where
    the value-histogram path would shuffle one row per distinct value) in
    three streaming passes:

    1. global Min/Max (tiny aggregate);
    2. fixed-width integer-bin histogram: per-batch ``np.unique`` partials
       (≤ ``n_bins`` rows each) tree-folded through a second ``map_batches``
       level that merges ~16 partials per task — NO shuffle: a
       ``groupby("bin").aggregate(Sum)`` here measured 5.9 s vs 0.27 s for
       the map-fold at sf0.1, because the sort exchange costs far more than
       the bounded histogram it moves; the driver merges the ≤ ``n_bins`` ×
       #post-fold-blocks rows (same volume the old ``.to_pandas()`` already
       materialized) and locates the bin containing each target rank
       (``percentile_disc`` = smallest value whose cumulative count ≥ q·N,
       verified against DuckDB);
    3. refine: exact value counts restricted to the (≤ len(qs)) target
       bins — only values inside those narrow bins move, same fold shape.

    NaNs are ignored (SQL NULL semantics). Returns {q: value}.
    """
    import pyarrow as pa
    from ray.data.aggregate import Max, Min

    agg = ds.aggregate(Min(column), Max(column))
    if agg is None or agg.get(f"min({column})") is None:
        # empty input: no domain, no quantiles (SQL percentile → NULL)
        return {q: float("nan") for q in qs}
    lo, hi = float(agg[f"min({column})"]), float(agg[f"max({column})"])
    if not (hi > lo):
        return {q: lo for q in qs}
    width = (hi - lo) / n_bins

    def hist_partial(t: pa.Table) -> pa.Table:
        v = t[column].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        bins = np.clip(((v - lo) / width).astype(np.int64), 0, n_bins - 1)
        idx, cnt = np.unique(bins, return_counts=True)
        return pa.table({"bin": idx.astype(np.int64), "cnt": cnt.astype(np.int64)})

    def merge_hist(t: pa.Table) -> pa.Table:
        b = t["bin"].to_numpy(zero_copy_only=False)
        c = t["cnt"].to_numpy(zero_copy_only=False)
        acc = np.zeros(n_bins, dtype=np.int64)
        np.add.at(acc, b, c)
        nz = np.nonzero(acc)[0]
        return pa.table({"bin": nz.astype(np.int64), "cnt": acc[nz]})

    hist = (
        ds.map_batches(hist_partial, batch_format="pyarrow", batch_size=131072)
        .map_batches(merge_hist, batch_format="pyarrow", batch_size=1 << 20)
        .to_pandas()
        .groupby("bin", as_index=False)["cnt"].sum()
        .sort_values("bin")
        .reset_index(drop=True)
    )
    cum = hist["cnt"].cumsum().to_numpy(dtype=np.int64)
    total = int(cum[-1])
    plan = {}
    target_bins = set()
    for q in qs:
        k = q * total  # exact for binary-rational q
        i = int(np.searchsorted(cum, k, side="left"))
        b = int(hist["bin"].iloc[i])
        below = int(cum[i - 1]) if i > 0 else 0
        plan[q] = (b, below)
        target_bins.add(b)

    tb = sorted(target_bins)

    def refine(t: pa.Table) -> pa.Table:
        v = t[column].to_numpy(zero_copy_only=False).astype(np.float64)
        v = v[~np.isnan(v)]
        bins = np.clip(((v - lo) / width).astype(np.int64), 0, n_bins - 1)
        keep = np.isin(bins, tb)
        vals, cnt = np.unique(v[keep], return_counts=True)
        return pa.table(
            {
                "value": vals,
                "bin": np.clip(((vals - lo) / width).astype(np.int64), 0, n_bins - 1),
                "cnt": cnt.astype(np.int64),
            }
        )

    def merge_vals(t: pa.Table) -> pa.Table:
        # same fold shape: values in the ≤ len(qs) target bins are few
        g = t.group_by("value").aggregate([("cnt", "sum")])
        return g.rename_columns(["value", "cnt"])

    vc = (
        ds.map_batches(refine, batch_format="pyarrow", batch_size=131072)
        .map_batches(merge_vals, batch_format="pyarrow", batch_size=1 << 20)
        .to_pandas()
        .groupby("value", as_index=False)["cnt"].sum()
        .sort_values("value")
        .reset_index(drop=True)
    )
    vc["bin"] = np.clip(
        ((vc["value"].to_numpy() - lo) / width).astype(np.int64), 0, n_bins - 1
    )
    out = {}
    for q, (b, below) in plan.items():
        sub = vc[vc["bin"] == b]
        c = below + sub["cnt"].cumsum().to_numpy(dtype=np.int64)
        j = int(np.searchsorted(c, q * total, side="left"))
        out[q] = float(sub["value"].iloc[j])
    return out
