"""Join + window operators.

* :func:`broadcast_join` — small side shipped once via ``ray.put``, pandas
  merge per batch. No shuffle. (The guide's default for dimension tables.)
* :func:`hash_join` — both sides large: Ray Data's native hash-partitioned
  ``Dataset.join`` when present (Ray >= 2.46), else the portable explicit
  pattern: add ``bucket = hash(key) % B`` to both sides, group each bucket,
  merge pairwise inside ``map_groups``.
* :func:`asof_join` — per-key ordered as-of join: hash-bucket by key, sort
  inside the bucket, ``pd.merge_asof`` per bucket (the guide's as-of
  pattern). Assumes each key's rows fit a bucket worker — document B for
  hot keys.
* :func:`tumbling_window_agg` — event-time tumbling windows as a computed
  window key + vectorized per-batch partial aggregation + small groupby (no
  watermark machinery: batch semantics over an ordered log).
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import numpy as np
import pandas as pd
import pyarrow as pa

from schema_guru_ray.stages.profile import stable_hash64


def broadcast_join(ds, small_df: pd.DataFrame, on: str, how: str = "inner"):
    """Join a Dataset against a SMALL pandas side (broadcast via ray.put)."""
    import ray

    ref = ray.put(small_df)

    def join_batch(batch: pd.DataFrame) -> pd.DataFrame:
        right = ray.get(ref)
        return batch.merge(right, on=on, how=how)

    return ds.map_batches(join_batch, batch_format="pandas")


def hash_join(left, right, on: str, num_partitions: int = 16,
              join_type: str = "inner"):
    """Distributed hash join of two Datasets on one key column."""
    if hasattr(left, "join"):
        return left.join(
            right, join_type=join_type, num_partitions=num_partitions, on=(on,)
        )
    return bucketed_hash_join(left, right, on, num_partitions, join_type)


def bucketed_hash_join(left, right, on: str, num_buckets: int = 16,
                       join_type: str = "inner"):
    """Portable explicit hash join: tag both sides with ``bucket =
    hash(key) % B``, union, group by bucket, pandas-merge the two sides
    inside each bucket. Salt hot keys by raising B."""

    left_cols = list(left.schema().names)
    right_cols = list(right.schema().names)

    def tag(side: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["__bucket"] = (stable_hash64(b[on]) % np.uint64(num_buckets)).astype(np.int32)
            b["__side"] = side
            return b

        return fn

    lt = left.map_batches(tag("l"), batch_format="pandas")
    rt = right.map_batches(tag("r"), batch_format="pandas")
    both = lt.union(rt)  # schemas unify; missing columns null-fill per block

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        l = g[g["__side"] == "l"].reindex(columns=left_cols)
        r = g[g["__side"] == "r"].reindex(columns=right_cols)
        if r[on].dtype != l[on].dtype and len(l) and len(r):
            r = r.astype({on: l[on].dtype})
        return l.merge(r, on=on, how=join_type)

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")


def asof_join(left, right, key: str, left_ts: str, right_ts: str,
              num_buckets: int = 16, direction: str = "backward",
              right_columns: Optional[Sequence[str]] = None):
    """As-of join: for each left row, the latest right row of the same key
    with right_ts <= left_ts (direction='backward'). Inner semantics (left
    rows without a match are dropped)."""

    left_cols = list(left.schema().names)
    right_cols = [key, right_ts] + [
        c for c in (right_columns or right.schema().names) if c not in (key, right_ts)
    ]

    def tag(side: str):
        def fn(b: pd.DataFrame) -> pd.DataFrame:
            b = b.copy()
            b["__bucket"] = (stable_hash64(b[key]) % np.uint64(num_buckets)).astype(np.int32)
            b["__side"] = side
            return b

        return fn

    lt = left.map_batches(tag("l"), batch_format="pandas")
    rt = right.select_columns(right_cols).map_batches(tag("r"), batch_format="pandas")
    both = lt.union(rt)  # schemas unify; the other side's columns null-fill

    out_cols = left_cols + [c for c in right_cols if c not in left_cols]

    def join_bucket(g: pd.DataFrame) -> pd.DataFrame:
        # blocks that came wholly from one side may lack the other side's
        # columns entirely — reindex fills them before slicing
        l = (
            g[g["__side"] == "l"].reindex(columns=left_cols)
            .sort_values(left_ts, kind="stable")
        )
        # secondary sort keys make ties at equal right_ts deterministic:
        # merge_asof(backward) picks the LAST row ≤ ts, i.e. the max of the
        # remaining columns — no separate dedupe shuffle needed upstream
        r = (
            g[g["__side"] == "r"].reindex(columns=right_cols)
            .sort_values(
                [right_ts, *[c for c in right_cols if c != right_ts]], kind="stable"
            )
        )
        if l.empty or r.empty:
            return pd.DataFrame({c: pd.Series(dtype="object") for c in out_cols})
        if key in l.columns and l[key].dtype != r[key].dtype:
            r = r.astype({key: l[key].dtype})
        # unify timestamp resolutions (parquet us vs pandas s after unions)
        for frame, col in ((l, left_ts), (r, right_ts)):
            if str(frame[col].dtype).startswith("datetime64"):
                frame[col] = frame[col].astype("datetime64[us]")
        out = pd.merge_asof(
            l, r, left_on=left_ts, right_on=right_ts, by=key, direction=direction
        )
        return out.dropna(subset=[right_ts])[out_cols]

    return both.groupby("__bucket").map_groups(join_bucket, batch_format="pandas")


def tumbling_window_agg(ds, ts_col: str, window_sec: int,
                        keys: Sequence[str], value_col: str):
    """Tumbling event-time windows: per (keys..., window_start) count + sum
    (integer-milli). Vectorized partial agg per batch → tiny groupby."""
    from ray.data.aggregate import Sum

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.copy()
        # resolution-proof epoch seconds (parquet us vs pandas ns)
        epoch = b[ts_col].to_numpy().astype("datetime64[s]").astype(np.int64)
        b["window_start"] = pd.to_datetime(
            (epoch // window_sec) * window_sec, unit="s"
        ).astype("datetime64[us]")
        with np.errstate(invalid="ignore"):
            b["value_milli"] = pd.Series(
                np.floor(b[value_col].to_numpy() * 1000 + 0.5), index=b.index
            ).astype("Int64")  # NaN-safe: NULLs skipped by the sum, like SQL
        g = b.groupby([*keys, "window_start"], as_index=False).agg(
            n=("value_milli", "size"), sum_value_milli=("value_milli", "sum")
        )
        g["sum_value_milli"] = g["sum_value_milli"].astype("int64")
        return g

    partials = ds.map_batches(partial, batch_format="pandas")
    return partials.groupby([*keys, "window_start"]).aggregate(
        Sum("n", alias_name="n"),
        Sum("sum_value_milli", alias_name="sum_value_milli"),
    )
