"""Named query/operator catalog backing ``__ray_entry__.queries()``.

Every function takes ``sf_dir`` and returns a Dataset / pandas DataFrame /
pyarrow Table. Numeric aggregate outputs use integer cents / explicit
rounding so the Ray result and the DuckDB oracle hash identically despite
floating-point summation order (driver compares row-count + schema +
order-insensitive value hash; column names must match the SQL aliases
EXACTLY).

None of these call ray.init — the driver owns the session.
"""

from __future__ import annotations

import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from schema_guru_ray.context import SchemaContext
from schema_guru_ray.stages.joins import sorted_lookup


def _read(sf_dir: str, table: str, columns=None):
    import ray.data as rd

    return rd.read_parquet(os.path.join(sf_dir, f"{table}.parquet"), columns=columns)



def _meta_rows(sf_dir: str, table: str) -> int:
    """Row count from parquet FOOTER metadata — free, no plan execution.
    Used to size join buckets for DERIVED datasets (whose ``.count()``
    would execute the upstream plan once just to pick a bucket count,
    then the join would execute it again)."""
    import pyarrow.parquet as pq

    return pq.ParquetFile(os.path.join(sf_dir, f"{table}.parquet")).metadata.num_rows


def _int_units(values: np.ndarray, scale: int) -> pd.Series:
    """NaN-safe half-up integer conversion (SQL round semantics): NULLs stay
    NA and are skipped by pandas group sums, like SQL sum()."""
    with np.errstate(invalid="ignore"):
        return pd.Series(np.floor(values * scale + 0.5)).astype("Int64")


# --- relational aggregates (partial-agg over Arrow batches) -----------------


def q1_lineitem_agg(sf_dir: str):
    """TPC-H Q1 shape: per-batch partial aggregation inside map_batches
    (integer-cents arithmetic → order-independent), then a tiny groupby
    merge. The wide shuffle moves one row per (batch × group)."""
    ds = _read(
        sf_dir, "lineitem",
        ["l_returnflag", "l_linestatus", "l_quantity", "l_extendedprice", "l_discount"],
    )

    def partial(t: pa.Table) -> pa.Table:
        # pure-Arrow kernels end-to-end (zero-copy in, C++ group_by):
        # measured 2.0x over the pandas-groupby version of this partial
        def units(arr, scale):
            return pc.cast(pc.floor(pc.add(pc.multiply(arr, scale), 0.5)), pa.int64())

        tt = pa.table(
            {
                "l_returnflag": t["l_returnflag"],
                "l_linestatus": t["l_linestatus"],
                "qty": units(t["l_quantity"], 1.0),
                "price_c": units(t["l_extendedprice"], 100.0),
                "disc_price_c": units(
                    pc.multiply(
                        t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"]),
                    ),
                    100.0,
                ),
            }
        )
        g = tt.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [
                ("qty", "sum"),
                ("price_c", "sum"),
                ("disc_price_c", "sum"),
                ("qty", "count", pc.CountOptions(mode="all")),
            ]
        )
        return g.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty", "sum_price_cents",
             "sum_disc_price_cents", "n"]
        )

    partials = ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
    from ray.data.aggregate import Sum

    out = partials.groupby(["l_returnflag", "l_linestatus"]).aggregate(
        Sum("sum_qty", alias_name="sum_qty"),
        Sum("sum_price_cents", alias_name="sum_price_cents"),
        Sum("sum_disc_price_cents", alias_name="sum_disc_price_cents"),
        Sum("n", alias_name="n"),
    )
    return out


Q1_SQL = """
SELECT l_returnflag, l_linestatus,
       CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_price_cents,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_price_cents,
       count(*) AS n
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def rollup_revenue_lineitem(sf_dir: str):
    """Multi-level aggregate (SQL ``GROUP BY ROLLUP``): revenue and row
    counts at (ship year, returnflag), (ship year), and grand-total
    levels. ONE pass + ONE shuffle: the per-batch Arrow partial and the
    groupby run only at the finest level; the coarser levels are derived
    from the finest AGGREGATE (tens of rows — cube composition is
    driver-cheap by construction, never a second scan). Rollup rows use
    year = -1 / l_returnflag = 'ALL' sentinels so the integer/string
    columns stay non-nullable."""
    ds = _read(sf_dir, "lineitem", ["l_shipdate", "l_returnflag", "l_extendedprice", "l_discount"])

    def partial(t: pa.Table) -> pa.Table:
        def units(arr, scale):
            return pc.cast(pc.floor(pc.add(pc.multiply(arr, scale), 0.5)), pa.int64())

        tt = pa.table(
            {
                "year": pc.cast(pc.year(t["l_shipdate"]), pa.int64()),
                "l_returnflag": t["l_returnflag"],
                "rev_c": units(
                    pc.multiply(
                        t["l_extendedprice"],
                        pc.subtract(pa.scalar(1.0), t["l_discount"]),
                    ),
                    100.0,
                ),
            }
        )
        g = tt.group_by(["year", "l_returnflag"]).aggregate(
            [("rev_c", "sum"), ("rev_c", "count", pc.CountOptions(mode="all"))]
        )
        return g.rename_columns(["year", "l_returnflag", "rev_cents", "n"])

    from ray.data.aggregate import Sum

    fine = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["year", "l_returnflag"])
        .aggregate(Sum("rev_cents", alias_name="rev_cents"), Sum("n", alias_name="n"))
        .to_pandas()
    )
    by_year = (
        fine.groupby("year", as_index=False)[["rev_cents", "n"]].sum()
        .assign(l_returnflag="ALL")
    )
    total = pd.DataFrame(
        {"year": [-1], "l_returnflag": ["ALL"],
         "rev_cents": [fine["rev_cents"].sum()], "n": [fine["n"].sum()]}
    )
    out = pd.concat([fine, by_year, total], ignore_index=True)
    return pd.DataFrame(
        {
            "year": out["year"].astype("int64"),
            "l_returnflag": out["l_returnflag"],
            "rev_cents": out["rev_cents"].astype("int64"),
            "n": out["n"].astype("int64"),
        }
    )


ROLLUP_REVENUE_LINEITEM_SQL = """
SELECT coalesce(CAST(year(l_shipdate) AS BIGINT), -1) AS year,
       coalesce(l_returnflag, 'ALL') AS l_returnflag,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT)
           AS rev_cents,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (year(l_shipdate), l_returnflag)
"""


def value_drift_events(sf_dir: str):
    """EXACT distribution-drift scores, oracle-checkable: split ``events``
    at the midpoint of its time range (baseline = first half, current =
    second half) and score how the ``value`` distribution shifted —
    PSI over 10 equal-width bins spanning the BASELINE's [min, max]
    (clamped, epsilon 1e-6) and a binned two-sample KS statistic over 256
    bins. Companion to the sketch-based ``sketches/drift.py`` path the
    clips pipeline uses (reference semantics: schema-guru derives
    per-column range annotations, `SchemaGuru.scala:50-63`; drift scoring
    is our 100-TB extension): this variant trades the mergeable-sketch
    flexibility for bit-exact reproducibility, so DuckDB can replay it.

    Scale shape: three pruned 2-column passes — (1) global ts min/max,
    (2) baseline value min/max, (3) per-batch integer histograms — each
    reducing through a partial aggregate; only O(bins) integer counts ever
    reach the driver, and all float math happens on ≤266 bin counts with a
    fixed operation order mirrored in the SQL (micro-unit rounding absorbs
    the last-ulp summation noise).
    """
    from ray.data.aggregate import Sum

    PSI_BINS, KS_BINS = 10, 256

    def ts_range(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        return pa.table({"lo": [pc.min(us).as_py()], "hi": [pc.max(us).as_py()]})

    rng = _read(sf_dir, "events", ["ts"]).map_batches(
        ts_range, batch_format="pyarrow"
    ).to_pandas()  # two int64s per batch
    lo, hi = int(rng["lo"].min()), int(rng["hi"].max())
    mid = lo + (hi - lo) // 2

    def base_vrange(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64())
        v = pc.filter(t["value"], pc.and_(pc.less(us, mid), pc.is_valid(t["value"])))
        if len(v) == 0:
            return pa.table({"vlo": pa.array([], pa.float64()),
                             "vhi": pa.array([], pa.float64())})
        return pa.table({"vlo": [pc.min(v).as_py()], "vhi": [pc.max(v).as_py()]})

    vr = _read(sf_dir, "events", ["ts", "value"]).map_batches(
        base_vrange, batch_format="pyarrow"
    ).to_pandas()
    vlo, vhi = float(vr["vlo"].min()), float(vr["vhi"].max())
    span = vhi - vlo

    def hist(t: pa.Table) -> pa.Table:
        us = pc.cast(t["ts"], pa.int64()).to_numpy(zero_copy_only=False)
        v = t["value"].to_numpy(zero_copy_only=False)
        ok = ~np.isnan(v)
        us, v = us[ok], v[ok]
        pop = (us >= mid).astype(np.int64)
        kinds, pops, bins, ns = [], [], [], []
        for nb, kind in ((PSI_BINS, "psi"), (KS_BINS, "ks")):
            if span > 0:
                # same op order as the SQL: (v - vlo) * nb, then / span
                b = np.clip(np.floor((v - vlo) * float(nb) / span), 0, nb - 1)
                b = b.astype(np.int64)
            else:
                b = np.zeros(len(v), dtype=np.int64)
            for p in (0, 1):
                cnt = np.bincount(b[pop == p], minlength=nb)
                kinds.extend([kind] * nb)
                pops.extend([p] * nb)
                bins.extend(range(nb))
                ns.extend(cnt.tolist())
        return pa.table({"kind": pa.array(kinds, pa.string()),
                         "pop": pa.array(pops, pa.int64()),
                         "bin": pa.array(bins, pa.int64()),
                         "n": pa.array(ns, pa.int64())})

    counts = (
        _read(sf_dir, "events", ["ts", "value"])
        .map_batches(hist, batch_format="pyarrow", batch_size=65536)
        .groupby(["kind", "pop", "bin"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # <= 2*(10+256) integer rows
    )

    def vec(kind: str, p: int, nb: int) -> np.ndarray:
        sub = counts[(counts["kind"] == kind) & (counts["pop"] == p)]
        out = np.zeros(nb, dtype=np.int64)
        out[sub["bin"].to_numpy()] = sub["n"].to_numpy()
        return out

    cb10, cc10 = vec("psi", 0, PSI_BINS), vec("psi", 1, PSI_BINS)
    n_base, n_cur = int(cb10.sum()), int(cc10.sum())
    psi = 0.0
    for i in range(PSI_BINS):  # fixed ascending order, 10 terms
        p = max(float(cb10[i]) / n_base, 1e-6)
        q = max(float(cc10[i]) / n_cur, 1e-6)
        psi += (p - q) * float(np.log(p / q))
    cb = np.cumsum(vec("ks", 0, KS_BINS))  # exact int cumsums
    cc = np.cumsum(vec("ks", 1, KS_BINS))
    ks = float(np.max(np.abs(cb.astype(np.float64) / n_base
                             - cc.astype(np.float64) / n_cur)))
    return pd.DataFrame({
        "n_base": pd.Series([n_base], dtype="int64"),
        "n_cur": pd.Series([n_cur], dtype="int64"),
        "psi_micro": pd.Series([int(round(psi * 1e6))], dtype="int64"),
        "ks_micro": pd.Series([int(round(ks * 1e6))], dtype="int64"),
    })


VALUE_DRIFT_EVENTS_SQL = """
WITH tr AS (SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi FROM events),
mid AS (SELECT lo + (hi - lo) // 2 AS m FROM tr),
pts AS (
  SELECT value, CASE WHEN epoch_us(ts) < (SELECT m FROM mid) THEN 0 ELSE 1 END AS pop
  FROM events WHERE value IS NOT NULL AND NOT isnan(value)
),
vr AS (SELECT min(value) AS vlo, max(value) AS vhi FROM pts WHERE pop = 0),
tot AS (
  SELECT sum(CASE WHEN pop = 0 THEN 1 ELSE 0 END) AS n_base,
         sum(CASE WHEN pop = 1 THEN 1 ELSE 0 END) AS n_cur
  FROM pts
),
b10 AS (
  SELECT pop,
         CAST(least(greatest(floor((value - vlo) * 10.0 / (vhi - vlo)), 0), 9) AS BIGINT) AS bin,
         count(*) AS n
  FROM pts, vr GROUP BY 1, 2
),
g10 AS (
  SELECT s.bin,
         coalesce(b.n0, 0) AS nb, coalesce(b.n1, 0) AS nc
  FROM (SELECT range AS bin FROM range(10)) s
  LEFT JOIN (SELECT bin,
                    sum(CASE WHEN pop = 0 THEN n ELSE 0 END) AS n0,
                    sum(CASE WHEN pop = 1 THEN n ELSE 0 END) AS n1
             FROM b10 GROUP BY bin) b USING (bin)
),
psi AS (
  SELECT sum((p - q) * ln(p / q)) AS v FROM (
    SELECT greatest(CAST(nb AS DOUBLE) / (SELECT n_base FROM tot), 1e-6) AS p,
           greatest(CAST(nc AS DOUBLE) / (SELECT n_cur FROM tot), 1e-6) AS q
    FROM g10)
),
b256 AS (
  SELECT pop,
         CAST(least(greatest(floor((value - vlo) * 256.0 / (vhi - vlo)), 0), 255) AS BIGINT) AS bin,
         count(*) AS n
  FROM pts, vr GROUP BY 1, 2
),
g256 AS (
  SELECT s.bin,
         coalesce(b.n0, 0) AS nb, coalesce(b.n1, 0) AS nc
  FROM (SELECT range AS bin FROM range(256)) s
  LEFT JOIN (SELECT bin,
                    sum(CASE WHEN pop = 0 THEN n ELSE 0 END) AS n0,
                    sum(CASE WHEN pop = 1 THEN n ELSE 0 END) AS n1
             FROM b256 GROUP BY bin) b USING (bin)
),
ks AS (
  SELECT max(abs(CAST(cb AS DOUBLE) / (SELECT n_base FROM tot)
               - CAST(cc AS DOUBLE) / (SELECT n_cur FROM tot))) AS v
  FROM (SELECT sum(nb) OVER (ORDER BY bin) AS cb,
               sum(nc) OVER (ORDER BY bin) AS cc
        FROM g256)
)
SELECT CAST((SELECT n_base FROM tot) AS BIGINT) AS n_base,
       CAST((SELECT n_cur FROM tot) AS BIGINT) AS n_cur,
       CAST(round((SELECT v FROM psi) * 1e6) AS BIGINT) AS psi_micro,
       CAST(round((SELECT v FROM ks) * 1e6) AS BIGINT) AS ks_micro
"""


def customers_without_orders(sf_dir: str):
    """Left anti join under oracle: customers with NO high-value order
    (o_totalprice > 450000, ~35% of customers in this corpus), counted per
    market segment. Drives :func:`stages.joins.bucketed_anti_join` — one
    hash-bucket shuffle of both sides, vectorized in-bucket ``isin`` —
    with the key side pre-filtered AT THE READ (predicate pushed into the
    batch filter so only qualifying o_custkeys enter the shuffle), then
    the usual tiny groupby-count."""
    from ray.data.aggregate import Sum
    from schema_guru_ray.stages.joins import bucketed_anti_join

    cust = _read(sf_dir, "customer", ["c_custkey", "c_mktsegment"])
    okeys = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"]).map_batches(
        lambda t: t.filter(pc.greater(t["o_totalprice"], 450000.0)).select(["o_custkey"]),
        batch_format="pyarrow",
    )
    inactive = bucketed_anti_join(cust, okeys, on="c_custkey", key_column="o_custkey")

    def partial(t: pa.Table) -> pa.Table:
        g = t.group_by(["c_mktsegment"]).aggregate(
            [("c_custkey", "count", pc.CountOptions(mode="all"))]
        )
        return g.rename_columns(["c_mktsegment", "n"])

    return (
        inactive.map_batches(partial, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Sum("n", alias_name="n"))
    )


CUSTOMERS_WITHOUT_ORDERS_SQL = """
SELECT c_mktsegment, count(*) AS n
FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 450000)
GROUP BY c_mktsegment
"""


def approx_distinct_users_events(sf_dir: str):
    """Per-group HLL distinct VERIFIED in-run against the exact distinct
    computed in the same job (north-star: HLL sketches for clip_id
    uniqueness; this is the oracle-checkable table twin). Output carries
    the exact per-event-type user count plus ``hll_within_5pct`` — the SQL
    oracle emits literal TRUE, so a hash match PROVES the measured HLL
    error bound held, the same in-run-measurement discipline as the IVF
    recall check.

    Scale shape: the HLL side ships one p=12 sketch (4 KB) per
    (batch × group) into a 5-group merge; the exact side is the
    coarse-shard nunique pattern from :func:`distinct_counts` — a user's
    duplicates co-locate in one shard, per-shard vectorized per-type
    nunique, only scalar rows reach the driver."""
    from schema_guru_ray.sketches.hll import HLL
    from schema_guru_ray.stages.profile import stable_hash64
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_type", "user_id"])
    n_shards = 64

    def sketch_partial(df: pd.DataFrame) -> pd.DataFrame:
        rows = [
            (et, HLL(12).add_hashes(stable_hash64(g["user_id"])).to_bytes())
            for et, g in df.groupby("event_type", sort=False)
        ]
        return pd.DataFrame({"event_type": [r[0] for r in rows],
                             "sketch": [r[1] for r in rows]})

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        h = HLL.from_bytes(g["sketch"].iloc[0])
        for buf in g["sketch"].iloc[1:]:
            h = h.merge(HLL.from_bytes(buf))
        return pd.DataFrame({"event_type": [g["event_type"].iloc[0]],
                             "n_hll": [float(h.estimate())]})

    hll_df = (
        ds.map_batches(sketch_partial, batch_format="pandas", batch_size=65536)
        .groupby("event_type")
        .map_groups(merge_group, batch_format="pandas")
        .to_pandas()  # one row per event type
    )

    def exact_partial(df: pd.DataFrame) -> pd.DataFrame:
        u = df.drop_duplicates()
        return pd.DataFrame({
            "shard": (stable_hash64(u["user_id"]) % np.uint64(n_shards)).astype(np.int32),
            "event_type": u["event_type"].to_numpy(),
            "user_id": u["user_id"].to_numpy(),
        })

    def shard_counts(g: pd.DataFrame) -> pd.DataFrame:
        c = g.groupby("event_type", sort=False)["user_id"].nunique()
        return pd.DataFrame({"event_type": c.index, "n": c.to_numpy(dtype=np.int64)})

    exact_df = (
        ds.map_batches(exact_partial, batch_format="pandas", batch_size=131072)
        .groupby("shard")
        .map_groups(shard_counts, batch_format="pandas")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n_users"))
        .to_pandas()
    )

    out = exact_df.merge(hll_df, on="event_type")
    within = (np.abs(out["n_hll"] - out["n_users"]) <= 0.05 * out["n_users"])
    return pd.DataFrame({
        "event_type": out["event_type"],
        "n_users": out["n_users"].astype("int64"),
        "hll_within_5pct": within.astype(bool),
    })


APPROX_DISTINCT_USERS_EVENTS_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS n_users,
       true AS hll_within_5pct
FROM events
GROUP BY event_type
"""


def pivot_events_daily(sf_dir: str):
    """Pivot (long → wide): daily event counts with one column per event
    type. The category set is DISCOVERED from the data (a tiny distinct
    pass over the pre-aggregated partials), so the operator generalizes
    beyond a hard-coded column list; the count matrix itself moves as
    per-batch (day × type) partial rows through one groupby shuffle, and
    only the final O(days × types) aggregate is laid out wide."""
    from ray.data.aggregate import Sum

    DAY_US = 86_400_000_000
    ds = _read(sf_dir, "events", ["ts", "event_type"])

    def partial(t: pa.Table) -> pa.Table:
        tt = pa.table({
            "day": pc.divide(pc.cast(t["ts"], pa.int64()), DAY_US),
            "event_type": t["event_type"],
        })
        g = tt.group_by(["day", "event_type"]).aggregate(
            [("event_type", "count", pc.CountOptions(mode="all"))]
        )
        return g.rename_columns(["day", "event_type", "n"])

    agg = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby(["day", "event_type"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()  # O(days x types)
    )
    wide = agg.pivot_table(index="day", columns="event_type", values="n",
                           fill_value=0, aggfunc="sum")
    wide = wide[sorted(wide.columns)].astype("int64")
    wide.columns = [f"n_{c}" for c in wide.columns]
    return wide.reset_index().astype({"day": "int64"})


PIVOT_EVENTS_DAILY_SQL = """
SELECT epoch_us(ts) // 86400000000 AS day,
       CAST(sum(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_click,
       CAST(sum(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_error,
       CAST(sum(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS n_purchase,
       CAST(sum(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS BIGINT) AS n_signup,
       CAST(sum(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_view
FROM events
GROUP BY 1
"""


def melt_lineitem_measures(sf_dir: str):
    """Unpivot (wide → long): lineitem's measure columns become
    (l_orderkey, l_linenumber, measure, value_units) rows — quantity in
    whole units, extendedprice in cents, discount in basis points, all
    integers for hash-exact parity. Stateless vectorized map_batches,
    ZERO shuffle: each batch emits its own melted rows and streams on."""
    ds = _read(
        sf_dir, "lineitem",
        ["l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice", "l_discount"],
    )
    MEASURES = (("quantity", "l_quantity", 1.0),
                ("extendedprice_cents", "l_extendedprice", 100.0),
                ("discount_bp", "l_discount", 10000.0))

    def melt(t: pa.Table) -> pa.Table:
        parts = []
        for name, col, scale in MEASURES:
            parts.append(pa.table({
                "l_orderkey": t["l_orderkey"],
                "l_linenumber": pc.cast(t["l_linenumber"], pa.int64()),
                "measure": pa.array([name] * t.num_rows, pa.string()),
                "value_units": pc.cast(
                    pc.floor(pc.add(pc.multiply(t[col], scale), 0.5)), pa.int64()
                ),
            }))
        return pa.concat_tables(parts)

    return ds.map_batches(melt, batch_format="pyarrow", batch_size=65536)


MELT_LINEITEM_MEASURES_SQL = """
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       'quantity' AS measure,
       CAST(round(l_quantity) AS BIGINT) AS value_units
FROM lineitem
UNION ALL
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       'extendedprice_cents' AS measure,
       CAST(round(l_extendedprice * 100) AS BIGINT) AS value_units
FROM lineitem
UNION ALL
SELECT l_orderkey, CAST(l_linenumber AS BIGINT) AS l_linenumber,
       'discount_bp' AS measure,
       CAST(round(l_discount * 10000) AS BIGINT) AS value_units
FROM lineitem
"""


def grouped_stats_events(sf_dir: str):
    """Grouped stats with the two-level pattern on a skewed-ish key."""
    ds = _read(sf_dir, "events", ["event_type", "value", "ts"])

    def partial(t: pa.Table) -> pa.Table:
        # pure-Arrow partial (C++ group_by; arrow sum skips nulls like SQL,
        # count mode="all" matches count(*))
        milli = pc.cast(
            pc.floor(pc.add(pc.multiply(t["value"], 1000.0), 0.5)), pa.int64()
        )
        tt = pa.table(
            {"event_type": t["event_type"], "value_milli": milli, "ts": t["ts"]}
        )
        g = tt.group_by("event_type").aggregate(
            [
                ("value_milli", "count", pc.CountOptions(mode="all")),
                ("value_milli", "sum"),
                ("ts", "min"),
                ("ts", "max"),
            ]
        )
        return g.rename_columns(
            ["event_type", "n", "sum_value_milli", "min_ts", "max_ts"]
        )

    from ray.data.aggregate import Max, Min, Sum

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("event_type")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_value_milli", alias_name="sum_value_milli"),
            Min("min_ts", alias_name="min_ts"),
            Max("max_ts", alias_name="max_ts"),
        )
    )


GROUPED_STATS_EVENTS_SQL = """
SELECT event_type,
       count(*) AS n,
       CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_milli,
       min(ts) AS min_ts,
       max(ts) AS max_ts
FROM events
GROUP BY event_type
"""


def column_stats_lineitem(sf_dir: str):
    """Per-column profile rows (the reference's min/max/null derive as exact
    stats; SURVEY.md §2.5 A11) via mergeable ColumnProfile states."""
    from schema_guru_ray.stages.profile import TableProfiler, fold_profiles

    cols = ["l_orderkey", "l_quantity", "l_returnflag", "l_shipdate"]
    ds = _read(sf_dir, "lineitem", cols)
    prof_ds = ds.map_batches(
        TableProfiler(cols, with_sketches=False), batch_format="pyarrow", batch_size=65536
    )
    # tree-fold: the driver merges ≤ fanin states no matter the batch count
    profs = fold_profiles(prof_ds)[""]
    rows = []
    for c in cols:
        p = profs[c]
        rows.append(
            {
                "column": c,
                "non_null": p.non_null,
                "nulls": p.nulls,
                "minimum": str(p.minimum),
                "maximum": str(p.maximum),
            }
        )
    return pd.DataFrame(rows)


COLUMN_STATS_LINEITEM_SQL = """
SELECT 'l_orderkey' AS column, count(l_orderkey) AS non_null,
       count(*) - count(l_orderkey) AS nulls,
       CAST(min(l_orderkey) AS VARCHAR) AS minimum, CAST(max(l_orderkey) AS VARCHAR) AS maximum
FROM lineitem
UNION ALL
SELECT 'l_quantity', count(l_quantity), count(*) - count(l_quantity),
       CAST(min(l_quantity) AS VARCHAR), CAST(max(l_quantity) AS VARCHAR) FROM lineitem
UNION ALL
SELECT 'l_returnflag', count(l_returnflag), count(*) - count(l_returnflag),
       min(l_returnflag), max(l_returnflag) FROM lineitem
UNION ALL
SELECT 'l_shipdate', count(l_shipdate), count(*) - count(l_shipdate),
       CAST(min(l_shipdate) AS VARCHAR), CAST(max(l_shipdate) AS VARCHAR) FROM lineitem
"""


def distinct_counts(sf_dir: str, n_shards: int = 64):
    """Exact distincts, distributed end-to-end and shard-parallel:
    per-batch ``pc.unique`` pre-reduction → shuffle into ``n_shards``
    COARSE hash shards (a value's duplicates all land in one shard) →
    vectorized per-shard ``nunique`` → sum of ≤ n_shards partial counts.
    Only scalar counts reach the driver — no distinct-value list ever
    materializes there, and no per-distinct-key reducer group exists
    (a ``groupby(col).count()`` over 10^9 keys is itself the bottleneck —
    measured 18.7 s vs 3 s for this shape at sf0.1)."""
    from schema_guru_ray.stages.profile import stable_hash64

    rows = []
    for table, col in (("lineitem", "l_orderkey"), ("orders", "o_custkey"),
                       ("events", "user_id")):
        ds = _read(sf_dir, table, [col])

        def partial(t: pa.Table, c=col) -> pd.DataFrame:
            u = pc.unique(t[c]).to_pandas()
            return pd.DataFrame(
                {
                    "shard": (stable_hash64(u) % np.uint64(n_shards)).astype(np.int32),
                    "value": u,
                }
            )

        def shard_nunique(g: pd.DataFrame) -> pd.DataFrame:
            return pd.DataFrame({"n": [int(g["value"].nunique())]})

        shards = (
            ds.map_batches(partial, batch_format="pyarrow", batch_size=131072)
            .groupby("shard")
            .map_groups(shard_nunique, batch_format="pandas")
        )
        n = int(shards.to_pandas()["n"].sum())  # ≤ n_shards scalar rows
        rows.append({"table_col": f"{table}.{col}", "n_distinct": n})
    return pd.DataFrame(rows)


DISTINCT_COUNTS_SQL = """
SELECT 'lineitem.l_orderkey' AS table_col, count(DISTINCT l_orderkey) AS n_distinct FROM lineitem
UNION ALL
SELECT 'orders.o_custkey', count(DISTINCT o_custkey) FROM orders
UNION ALL
SELECT 'events.user_id', count(DISTINCT user_id) FROM events
"""


def exact_quantiles_quantity(sf_dir: str):
    """EXACT quantiles for a low-cardinality numeric column via a value
    histogram: per-batch value_counts pre-agg → tiny groupby sum → driver
    cumsum over the (few) distinct values. Complements the KLL sketch path
    with an exact answer where cardinality allows."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", ["l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        # pure-Arrow histogram partial: C++ value_counts, zero-copy in
        vc = pc.value_counts(t["l_quantity"])
        return pa.table(
            {
                "value": pc.cast(vc.field("values"), pa.float64()),
                "cnt": pc.cast(vc.field("counts"), pa.int64()),
            }
        )

    hist = (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=131072)
        .groupby("value")
        .aggregate(Sum("cnt", alias_name="cnt"))
        .to_pandas()
        .sort_values("value")
    )
    cum = hist["cnt"].cumsum()
    total = int(cum.iloc[-1])
    rows = []
    for q in (0.25, 0.5, 0.75):
        # quantile_disc semantics: smallest value with cum >= q * total
        target = q * total
        v = float(hist["value"][(cum >= target)].iloc[0])
        rows.append({"q": q, "value": v})
    return pd.DataFrame(rows)


EXACT_QUANTILES_QUANTITY_SQL = """
SELECT 0.25 AS q, quantile_disc(l_quantity, 0.25) AS value FROM lineitem
UNION ALL
SELECT 0.5, quantile_disc(l_quantity, 0.5) FROM lineitem
UNION ALL
SELECT 0.75, quantile_disc(l_quantity, 0.75) FROM lineitem
"""


def approx_quantiles_extendedprice(sf_dir: str):
    """KLL approximate quantiles over a HIGH-cardinality numeric column
    (l_extendedprice) — the regime where ``exact_quantiles_quantity``'s
    value-histogram would shuffle a histogram nearly as large as the
    column itself, i.e. the 100-TB quantile path (north star: "KLL
    quantile sketches for dur_ms/sr_hz"). Topology: per-batch KLL
    partials (tiny states) → tree fold → driver reads three quantiles.

    Rows-only BUT self-certifying (the minhash/ivf checked-invariant
    pattern): each approximate value carries its MEASURED rank error —
    one vectorized count-≤-v pass over the column computes the true rank
    of the sketch's answer in the same run, so the result row states
    exactly how wrong the sketch is, and pytest bounds it against the
    KLL k=800 design error."""
    from schema_guru_ray.stages.profile import TableProfiler, fold_profiles

    col = "l_extendedprice"
    ds = _read(sf_dir, "lineitem", [col]).materialize()  # reused by both passes
    prof_ds = ds.map_batches(
        TableProfiler([col], kll_k=800), batch_format="pyarrow", batch_size=65536
    )
    kll = fold_profiles(prof_ds)[""][col].kll
    qs = (0.25, 0.5, 0.75, 0.95)
    vals = np.array([kll.quantile(q) for q in qs], dtype=np.float64)

    def rank_partial(t: pa.Table) -> pa.Table:
        x = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
        le = np.array([(x <= v).sum() for v in vals], dtype=np.int64)
        return pa.table(
            {
                "i": np.arange(len(vals), dtype=np.int64),
                "le": le,
                "n": np.full(len(vals), len(x), dtype=np.int64),
            }
        )

    ranks = (
        ds.map_batches(rank_partial, batch_format="pyarrow", batch_size=131072)
        .to_pandas()
        .groupby("i")
        .sum()
    )
    total = int(ranks["n"].iloc[0])  # per-i sum of batch sizes = row count
    return pd.DataFrame(
        {
            "q": list(qs),
            "approx_value": vals,
            "rank_error": (ranks["le"] / total - np.array(qs)).abs().to_numpy(),
            "n": total,
        }
    )


def referential_orphans(sf_dir: str, exact_broadcast_limit: int = 50_000_000):
    """Anti-join (SURVEY.md §2.4 J3 referential checks), two regimes:

    * key side fits a broadcast → exact: ship the key array once via
      ``ray.put``, vectorized ``pc.is_in`` per batch (no shuffle, no
      per-row Python loop);
    * key side too big → EXACT and fully distributed: per-batch
      ``value_counts`` pre-reduce orders rows to (key, cnt) partials; keys
      the Bloom reports ABSENT from customer are DEFINITE orphans (the
      filter has no false negatives: present keys always probe true), so
      their row counts sum immediately; keys the Bloom reports present —
      the only side a false positive can hide in — are resolved exactly by
      a bucketed hash ANTI-join of the distinct maybe-keys against the
      customer key column. Nothing is ever broadcast or collected whole:
      the shuffle moves distinct keys, not rows. (Round-2 ADVICE: the old
      branch inverted this — it treated the definitely-absent side as the
      maybe side, so Bloom false-positive orphans were silently dropped
      and the survivor probe was vacuous.)"""
    import ray

    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])
    n_keys = cust.count()

    if n_keys > exact_broadcast_limit:
        from schema_guru_ray.sketches.bloom import build_bloom
        from schema_guru_ray.stages.joins import derive_num_buckets
        from schema_guru_ray.stages.profile import stable_hash64

        bloom_ref = ray.put(build_bloom(cust, "c_custkey").to_bytes())

        def key_counts(t: pa.Table) -> pd.DataFrame:
            from schema_guru_ray.sketches.bloom import BloomFilter

            vc = pc.value_counts(t["o_custkey"])
            keys = vc.field("values").to_pandas()
            cnts = vc.field("counts").to_numpy()
            bf = BloomFilter.from_bytes(ray.get(bloom_ref))
            maybe = bf.contains_many(keys)
            return pd.DataFrame(
                {"key": keys, "cnt": cnts.astype(np.int64), "maybe": maybe}
            )

        partials = orders.map_batches(
            key_counts, batch_format="pyarrow", batch_size=131072
        ).materialize()  # tiny: distinct keys per batch, reused twice below

        # contains == False ⇒ definitely not a customer ⇒ orphan rows
        n_definite = int(
            partials.map_batches(
                lambda b: pd.DataFrame({"s": [int(b.loc[~b["maybe"], "cnt"].sum())]}),
                batch_format="pandas",
            ).to_pandas()["s"].sum()
        )

        # contains == True side: exact distributed anti-join on distinct keys
        maybe_keys = partials.map_batches(
            lambda b: b.loc[b["maybe"], ["key", "cnt"]], batch_format="pandas"
        )
        nb = derive_num_buckets(orders.count() + n_keys)

        def tag(side: str):
            def fn(b: pd.DataFrame) -> pd.DataFrame:
                b = b.assign(
                    __side=side,
                    __bucket=(stable_hash64(b["key"]) % np.uint64(nb)).astype(np.int32),
                )
                return b
            return fn

        m_tagged = maybe_keys.map_batches(tag("m"), batch_format="pandas")
        c_tagged = cust.map_batches(
            lambda b: pd.DataFrame({"key": b["c_custkey"], "cnt": np.int64(0)}),
            batch_format="pandas",
        ).map_batches(tag("c"), batch_format="pandas")

        def anti_count(g: pd.DataFrame) -> pd.DataFrame:
            m = g[g["__side"] == "m"]
            present = g.loc[g["__side"] == "c", "key"]
            n = int(m.loc[~m["key"].isin(present), "cnt"].sum())
            return pd.DataFrame({"n": [n]})

        fp_orphans = (
            m_tagged.union(c_tagged)
            .groupby("__bucket")
            .map_groups(anti_count, batch_format="pandas")
        )
        n_fp = int(fp_orphans.to_pandas()["n"].sum())  # ≤ nb scalar rows
        return pd.DataFrame({"n_orphans": [n_definite + n_fp]})

    keys_ref = ray.put(
        pa.Table.from_pandas(cust.to_pandas())["c_custkey"].combine_chunks()
    )

    def anti(t: pa.Table) -> pa.Table:
        ks = ray.get(keys_ref)
        return t.filter(pc.invert(pc.is_in(t["o_custkey"], value_set=ks)))

    n = orders.map_batches(anti, batch_format="pyarrow").count()
    return pd.DataFrame({"n_orphans": [n]})


REFERENTIAL_ORPHANS_SQL = """
SELECT count(*) AS n_orphans
FROM orders o WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
"""


def sessionize_events(sf_dir: str, gap_sec: int = 1800, n_buckets: int = None):
    """Stream-shaped op: per-user session count with a 30-min gap rule.

    Users are hash-bucketed into DATA-SCALED coarse groups (~250k rows per
    bucket, not a fixed constant — round-1 verdict: 64 fixed buckets mean
    ~1.6 TB per group at 100 TB) instead of one Python map_groups call per
    user; inside a bucket the whole computation is a vectorized pandas
    sort + shift — session starts are rows where the user changes or the
    in-user gap exceeds the threshold."""
    from schema_guru_ray.stages.joins import derive_num_buckets
    from schema_guru_ray.stages.profile import stable_hash64

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    if n_buckets is None:
        n_buckets = derive_num_buckets(ds.count())

    def add_bucket(b: pd.DataFrame) -> pd.DataFrame:
        return b.assign(
            bucket=(stable_hash64(b["user_id"]) % np.uint64(n_buckets)).astype(np.int32)
        )

    def sessions_bucket(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["user_id", "ts"], kind="stable")
        new_user = g["user_id"].ne(g["user_id"].shift())
        gap = g["ts"].diff().dt.total_seconds() > gap_sec
        starts = new_user | (gap & ~new_user)
        out = starts.groupby(g["user_id"], sort=False).sum()
        return pd.DataFrame(
            {"user_id": out.index.to_numpy(), "n_sessions": out.to_numpy().astype("int64")}
        )

    return (
        ds.map_batches(add_bucket, batch_format="pandas")
        .groupby("bucket")
        .map_groups(sessions_bucket, batch_format="pandas")
    )


SESSIONIZE_EVENTS_SQL = """
WITH d AS (
  SELECT user_id, ts, lag(ts) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
)
SELECT user_id,
       CAST(sum(CASE WHEN prev_ts IS NULL OR epoch(ts - prev_ts) > 1800 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions
FROM d GROUP BY user_id
"""


def top_customers_revenue(sf_dir: str, k: int = 10):
    """Top-k by grouped sum; broadcast join of the (small) customer side for
    names — no row shuffle of the fact table beyond the pre-agged partials."""
    import ray

    cust = _read(sf_dir, "customer", ["c_custkey", "c_name"]).to_pandas()
    name_ref = ray.put(dict(zip(cust["c_custkey"], cust["c_name"])))
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(t: pa.Table) -> pa.Table:
        # pure-Arrow: high-cardinality group key is C++ hash-agg's best case
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(t["o_totalprice"], 100.0), 0.5)),
            pa.int64(),
        )
        tt = pa.table({"o_custkey": t["o_custkey"], "cents": cents})
        g = tt.group_by("o_custkey").aggregate([("cents", "sum")])
        return g.rename_columns(["o_custkey", "revenue_cents"])

    from ray.data.aggregate import Sum

    agg = (
        orders.map_batches(partial, batch_format="pyarrow", batch_size=65536)
        .groupby("o_custkey")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    )
    top = agg.sort("revenue_cents", descending=True).limit(k).to_pandas()
    names = ray.get(name_ref)
    top["c_name"] = top["o_custkey"].map(names)
    return top[["o_custkey", "c_name", "revenue_cents"]]


TOP_CUSTOMERS_REVENUE_SQL = """
SELECT o_custkey, c_name,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS revenue_cents
FROM orders JOIN customer ON c_custkey = o_custkey
GROUP BY o_custkey, c_name
ORDER BY revenue_cents DESC LIMIT 10
"""


# --- text / dedup operators -------------------------------------------------


def token_counts_documents(sf_dir: str):
    from schema_guru_ray.stages.text import TokenCounter

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(TokenCounter(), batch_format="pandas")
    return out.select_columns(["doc_id", "n_tokens"])


TOKEN_COUNTS_DOCUMENTS_SQL = """
SELECT doc_id, CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
FROM documents
"""


def pack_documents(sf_dir: str, seq_len: int = 512):
    """Sequence packing (concat-and-chunk), the layout step of an LLM
    training pipeline: documents are concatenated in doc_id order and cut
    into fixed ``seq_len``-token training sequences; each document gets its
    global token offset, its first sequence id, and how many sequences it
    spans. The core primitive is a DISTRIBUTED ORDERED PREFIX-SUM:

    1. per-doc token counts (vectorized TokenCounter, pruned read);
    2. contiguous doc_id RANGE buckets (width data-scaled) → per-bucket
       token totals via one tiny groupby;
    3. driver computes the exclusive prefix over the ≤ #buckets totals and
       broadcasts the offsets once (``ray.put``);
    4. per-bucket ``map_groups``: sort by doc_id within the bucket, local
       cumsum + bucket offset — global order = bucket order + local order,
       so no global sort ever runs.

    Only O(#buckets) scalars touch the driver; the wide data moves through
    exactly one groupby shuffle. Oracle: the same arithmetic as one SQL
    window ``sum() OVER (ORDER BY doc_id)``."""
    import ray
    from ray.data.aggregate import Sum
    from schema_guru_ray.stages.text import TokenCounter
    from schema_guru_ray.stages.joins import derive_num_buckets

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    counts = ds.map_batches(TokenCounter(), batch_format="pandas").select_columns(
        ["doc_id", "n_tokens"]
    )
    max_id = int(counts.max("doc_id"))
    nb = derive_num_buckets(max_id + 1)
    width = (max_id // nb) + 1

    def tag(df: pd.DataFrame) -> pd.DataFrame:
        df = df.copy()
        df["bucket"] = (df["doc_id"] // width).astype(np.int32)
        return df

    tagged = counts.map_batches(tag, batch_format="pandas")
    totals = (
        tagged.groupby("bucket")
        .aggregate(Sum("n_tokens", alias_name="tok"))
        .to_pandas()
        .sort_values("bucket")
    )
    cum = np.concatenate([[0], np.cumsum(totals["tok"].to_numpy(dtype=np.int64))[:-1]])
    offsets_ref = ray.put(dict(zip(totals["bucket"].tolist(), cum.tolist())))

    def pack_bucket(g: pd.DataFrame) -> pd.DataFrame:
        offsets = ray.get(offsets_ref)
        g = g.sort_values("doc_id")
        n = g["n_tokens"].to_numpy(dtype=np.int64)
        start = offsets[int(g["bucket"].iloc[0])] + np.concatenate([[0], np.cumsum(n)[:-1]])
        seq_first = start // seq_len
        last = (start + np.maximum(n, 1) - 1) // seq_len
        n_seqs = np.where(n > 0, last - seq_first + 1, 0)
        return pd.DataFrame({
            "doc_id": g["doc_id"].to_numpy(),
            "n_tokens": n,
            "start_tok": start,
            "seq_first": seq_first,
            "n_seqs": n_seqs.astype(np.int64),
        })

    return (
        tagged.groupby("bucket")
        .map_groups(pack_bucket, batch_format="pandas")
        .select_columns(["doc_id", "n_tokens", "start_tok", "seq_first", "n_seqs"])
    )


PACK_DOCUMENTS_SQL = """
WITH c AS (
  SELECT doc_id, CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens
  FROM documents
),
p AS (
  SELECT doc_id, n_tokens,
         CAST(coalesce(sum(n_tokens) OVER (ORDER BY doc_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS start_tok
  FROM c
)
SELECT doc_id, n_tokens, start_tok,
       start_tok // 512 AS seq_first,
       CAST(CASE WHEN n_tokens = 0 THEN 0
            ELSE (start_tok + n_tokens - 1) // 512 - start_tok // 512 + 1
       END AS BIGINT) AS n_seqs
FROM p
"""


def token_frequencies_documents(sf_dir: str):
    """Global token frequency table (the vocabulary-count primitive of a
    training-data pipeline): per-batch vectorized counts pre-aggregate, then
    a tiny groupby sum — only (token, count) partials shuffle."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].fillna("").str.lower().str.findall(r"[\w']+").explode()
        counts = toks.value_counts()
        return pd.DataFrame({"token": counts.index, "n": counts.to_numpy()})

    return (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
    )


TOKEN_FREQUENCIES_DOCUMENTS_SQL = """
SELECT token, CAST(count(*) AS BIGINT) AS n
FROM (SELECT unnest(regexp_extract_all(lower(text), '[\\w'']+')) AS token FROM documents)
GROUP BY token
"""


def vocab_documents(sf_dir: str, min_freq: int = 5):
    """Vocabulary construction with DISTRIBUTED id assignment: global token
    frequencies (per-batch partials → groupby Sum), frequency floor, then
    ``vocab_id = row_number() ORDER BY (freq DESC, token)`` without a
    global sort — the pack_documents ordered-prefix-sum pattern on a
    composite key:

    1. band every surviving token by ``(-freq, first-byte band)`` — bands
       are totally ordered consistently with the target sort order;
    2. one tiny multi-key groupby counts tokens per band; the driver
       prefix-sums the ≤ (#distinct freqs × 256) band counts and
       broadcasts the exclusive offsets;
    3. per-band ``map_groups`` sorts locally by token and adds the band
       offset — global rank = band offset + local rank.

    At web scale the vocabulary is ~10^7-10^8 rows; the only driver state
    is band counts, and the heaviest pandas group is one (freq, first-byte)
    band (the freq=min_freq singleton tail splits across 256 bands)."""
    import ray
    from ray.data.aggregate import Count, Sum

    ds = _read(sf_dir, "documents", ["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].fillna("").str.lower().str.findall(r"[\w']+").explode()
        counts = toks.value_counts()
        return pd.DataFrame({"token": counts.index, "n": counts.to_numpy()})

    freq = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("n", alias_name="freq"))
    )

    def band(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b["freq"] >= min_freq].copy()
        b["negfreq"] = -b["freq"].astype("int64")
        first = b["token"].str.slice(0, 1).map(lambda s: ord(s) if s else 0)
        b["band"] = first.clip(0, 255).astype("int64")
        return b[["token", "freq", "negfreq", "band"]]

    banded = freq.map_batches(band, batch_format="pandas")
    counts = (
        banded.groupby(["negfreq", "band"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values(["negfreq", "band"])
    )
    cum = np.concatenate([[0], np.cumsum(counts["n"].to_numpy(dtype=np.int64))[:-1]])
    offsets_ref = ray.put(
        {
            (int(nf), int(bd)): int(off)
            for nf, bd, off in zip(counts["negfreq"], counts["band"], cum)
        }
    )

    def rank_band(g: pd.DataFrame) -> pd.DataFrame:
        offsets = ray.get(offsets_ref)
        g = g.sort_values("token")
        off = offsets[(int(g["negfreq"].iloc[0]), int(g["band"].iloc[0]))]
        return pd.DataFrame(
            {
                "token": g["token"].to_numpy(),
                "freq": g["freq"].astype("int64").to_numpy(),
                "vocab_id": off + 1 + np.arange(len(g), dtype=np.int64),
            }
        )

    return banded.groupby(["negfreq", "band"]).map_groups(
        rank_band, batch_format="pandas"
    )


VOCAB_DOCUMENTS_SQL = """
WITH tf AS (
    SELECT token, count(*) AS c
    FROM (SELECT unnest(regexp_extract_all(lower(text), '[\\w'']+')) AS token
          FROM documents)
    GROUP BY 1
)
SELECT token, CAST(c AS BIGINT) AS freq,
       CAST(row_number() OVER (ORDER BY c DESC, token) AS BIGINT) AS vocab_id
FROM tf
WHERE c >= 5
"""


def quantile_buckets_extendedprice(sf_dir: str):
    """Quantile discretization of a HIGH-cardinality continuous column:
    exact quartile boundaries via the 3-pass bin-refinement operator
    (stages/profile.py exact_quantiles_continuous — shuffle bounded by
    n_bins, not by distinct values), then a streaming bucket-assignment +
    partial aggregate. Boundaries are actual data values, so the ``v <=
    boundary`` comparisons replay float-exactly in the percentile_disc
    oracle."""
    from ray.data.aggregate import Sum

    from schema_guru_ray.stages.profile import exact_quantiles_continuous

    ds = _read(sf_dir, "lineitem", ["l_extendedprice"])
    qv = exact_quantiles_continuous(ds, "l_extendedprice")
    bounds = np.array([qv[0.25], qv[0.5], qv[0.75]])

    def partial(t: pa.Table) -> pd.DataFrame:
        v = t["l_extendedprice"].to_numpy(zero_copy_only=False).astype(np.float64)
        bucket = np.searchsorted(bounds, v, side="left")
        cents = np.floor(v * 100 + 0.5).astype(np.int64)
        df = pd.DataFrame({"bucket": bucket.astype("int64"), "n": 1, "cents": cents})
        return df.groupby("bucket", as_index=False).agg(
            n=("n", "sum"), cents=("cents", "sum")
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Sum("n", alias_name="n"), Sum("cents", alias_name="sum_cents"))
    )


QUANTILE_BUCKETS_EXTENDEDPRICE_SQL = """
WITH b AS (
    SELECT percentile_disc(0.25) WITHIN GROUP (ORDER BY l_extendedprice) AS q1,
           percentile_disc(0.50) WITHIN GROUP (ORDER BY l_extendedprice) AS q2,
           percentile_disc(0.75) WITHIN GROUP (ORDER BY l_extendedprice) AS q3
    FROM lineitem
)
SELECT CAST(CASE WHEN l_extendedprice <= q1 THEN 0
                 WHEN l_extendedprice <= q2 THEN 1
                 WHEN l_extendedprice <= q3 THEN 2
                 ELSE 3 END AS BIGINT) AS bucket,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_cents
FROM lineitem, b
GROUP BY 1
"""


def corr_stats_lineitem(sf_dir: str):
    """Distributed correlation/covariance via INTEGER sufficient statistics
    (n, Σx, Σy, Σxy, Σx², Σy² with x = quantity units, y = price cents):
    one streaming pass of per-batch partial sums, one tiny groupby — the
    associative-monoid shape of A11 applied to second moments. Pearson r /
    covariance derive client-side from the exact integers, so the oracle
    compares bit-exact sums instead of float-rounded r."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "lineitem", ["l_quantity", "l_extendedprice"])

    def partial(t: pa.Table) -> pd.DataFrame:
        x = t["l_quantity"].to_numpy(zero_copy_only=False).astype(np.int64)
        y = np.floor(
            t["l_extendedprice"].to_numpy(zero_copy_only=False) * 100 + 0.5
        ).astype(np.int64)
        return pd.DataFrame(
            {
                "n": [np.int64(len(x))],
                "sum_x": [x.sum()],
                "sum_y": [y.sum()],
                "sum_xy": [(x * y).sum()],
                "sum_x2": [(x * x).sum()],
                "sum_y2": [(y * y).sum()],
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow", batch_size=131072)
        .map_batches(lambda b: b.assign(k=0), batch_format="pandas")
        .groupby("k")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("sum_x", alias_name="sum_x"),
            Sum("sum_y", alias_name="sum_y"),
            Sum("sum_xy", alias_name="sum_xy"),
            Sum("sum_x2", alias_name="sum_x2"),
            Sum("sum_y2", alias_name="sum_y2"),
        )
        .map_batches(lambda t: t.drop_columns(["k"]), batch_format="pyarrow")
    )


CORR_STATS_LINEITEM_SQL = """
SELECT CAST(count(*) AS BIGINT) AS n,
       CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_x,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_y,
       CAST(sum(CAST(l_quantity AS BIGINT)
                * CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_xy,
       CAST(sum(CAST(l_quantity AS BIGINT) * CAST(l_quantity AS BIGINT))
            AS BIGINT) AS sum_x2,
       CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)
                * CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
           AS sum_y2
FROM lineitem
"""


def split_assign_documents(sf_dir: str):
    """Deterministic train/val/test split — the standard content-addressed
    80/10/10 assignment: split by md5(doc_id) hex thresholds, so membership
    is a pure function of the id (stable across runs, machines, and corpus
    growth). Pure streaming map; oracle replays the same hex comparison."""
    from schema_guru_ray.stages.sample import md5_split_assign

    ds = _read(sf_dir, "documents", ["doc_id"])

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "split": md5_split_assign(b["doc_id"]),
            }
        )

    return ds.map_batches(assign, batch_format="pandas")


SPLIT_ASSIGN_DOCUMENTS_SQL = """
SELECT doc_id,
       CASE WHEN md5(CAST(doc_id AS VARCHAR)) < 'c{c31}'
            THEN 'train'
            WHEN md5(CAST(doc_id AS VARCHAR)) < 'e{six31}'
            THEN 'val'
            ELSE 'test' END AS split
FROM documents
""".replace("{c31}", "c" * 31).replace("{six31}", "6" * 31)


def groupwise_dev_events(sf_dir: str):
    """Group-wise normalization with INTEGER-exact arithmetic: per event
    row, its deviation from the group mean scaled by the group size —
    ``dev_n_milli = n_g * value_milli - sum_g_milli`` (the z-score
    numerator times n, exact in int64, so no float mean ever enters the
    comparison). Two-phase broadcast pattern: the per-group (n, sum) table
    is a tiny aggregate shipped once via ``ray.put``; the normalization
    pass is a shuffle-free map — the standard alternative to a window
    shuffle when the group-stat side is small."""
    import ray
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value"])

    def partial(t: pa.Table) -> pd.DataFrame:
        df = pd.DataFrame(
            {
                "event_type": t["event_type"].to_pylist(),
                "v": np.floor(
                    t["value"].to_numpy(zero_copy_only=False) * 1000 + 0.5
                ).astype(np.int64),
                "n": 1,
            }
        )
        return df.groupby("event_type", as_index=False).agg(
            n=("n", "sum"), s=("v", "sum")
        )

    stats = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Sum("s", alias_name="s"))
        .to_pandas()
    )
    ref = ray.put(
        {r["event_type"]: (int(r["n"]), int(r["s"])) for _, r in stats.iterrows()}
    )

    def dev(t: pa.Table) -> pd.DataFrame:
        table = ray.get(ref)
        et = t["event_type"].to_pylist()
        v = np.floor(t["value"].to_numpy(zero_copy_only=False) * 1000 + 0.5).astype(
            np.int64
        )
        n = np.array([table[e][0] for e in et], dtype=np.int64)
        s = np.array([table[e][1] for e in et], dtype=np.int64)
        return pd.DataFrame(
            {
                "event_id": t["event_id"].to_numpy(),
                "dev_n_milli": n * v - s,
            }
        )

    return ds.map_batches(dev, batch_format="pyarrow")


GROUPWISE_DEV_EVENTS_SQL = """
SELECT event_id,
       CAST(count(*) OVER w * CAST(round(value * 1000) AS BIGINT)
            - sum(CAST(round(value * 1000) AS BIGINT)) OVER w AS BIGINT)
           AS dev_n_milli
FROM events
WINDOW w AS (PARTITION BY event_type)
"""


def shuffle_positions_documents(sf_dir: str):
    """Deterministic global shuffle for training-data export: every doc
    gets a content-addressed shuffle key ``md5(doc_id)``, a 256-way shard
    (first hex byte) and its EXACT global position in the shuffled order —
    reproducible across runs and resumable per shard, unlike
    ``random_shuffle``. Position assignment is the banded distributed
    row-number (shards are totally ordered by their hex prefix): per-shard
    counts → driver prefix-sum over 256 scalars → per-shard local sort.
    No global sort, no driver materialization. Oracle: ``row_number() OVER
    (ORDER BY md5, doc_id)``."""
    import hashlib

    import ray
    from ray.data.aggregate import Count

    ds = _read(sf_dir, "documents", ["doc_id"])

    def key(b: pd.DataFrame) -> pd.DataFrame:
        h = [hashlib.md5(str(i).encode()).hexdigest() for i in b["doc_id"]]
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"].astype("int64"),
                "h": h,
                "shard": [x[:2] for x in h],
            }
        )

    keyed = ds.map_batches(key, batch_format="pandas")
    counts = (
        keyed.groupby("shard")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values("shard")
    )
    cum = np.concatenate([[0], np.cumsum(counts["n"].to_numpy(dtype=np.int64))[:-1]])
    offsets_ref = ray.put(dict(zip(counts["shard"], cum.tolist())))

    def rank_shard(g: pd.DataFrame) -> pd.DataFrame:
        offsets = ray.get(offsets_ref)
        g = g.sort_values(["h", "doc_id"])
        off = offsets[g["shard"].iloc[0]]
        return pd.DataFrame(
            {
                "doc_id": g["doc_id"].to_numpy(),
                "shard": g["shard"].to_numpy(),
                "pos": off + 1 + np.arange(len(g), dtype=np.int64),
            }
        )

    return keyed.groupby("shard").map_groups(rank_shard, batch_format="pandas")


SHUFFLE_POSITIONS_DOCUMENTS_SQL = """
WITH k AS (SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents)
SELECT doc_id, substr(h, 1, 2) AS shard,
       CAST(row_number() OVER (ORDER BY h, doc_id) AS BIGINT) AS pos
FROM k
"""


def quality_documents(sf_dir: str):
    from schema_guru_ray.stages.text import QualityScorer

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(QualityScorer(), batch_format="pandas")
    return out.select_columns(["doc_id", "n_chars", "n_words"])


QUALITY_DOCUMENTS_SQL = """
SELECT doc_id, CAST(len(text) AS BIGINT) AS n_chars,
       CAST(len(regexp_extract_all(lower(text), '[\\w'']+')) AS BIGINT) AS n_words
FROM documents
"""


def fingerprint_documents(sf_dir: str):
    from schema_guru_ray.stages.text import Fingerprinter

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(Fingerprinter(), batch_format="pandas")
    return out.select_columns(["doc_id", "fp_md5"])


FINGERPRINT_DOCUMENTS_SQL = """
SELECT doc_id, md5(trim(lower(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp_md5
FROM documents
"""


def clean_documents(sf_dir: str):
    """Text normalization stage: NFC + control-strip + whitespace collapse,
    emitting md5 + length of the cleaned text (normalization-stable dedup
    keys). Pure map — no shuffle."""
    from schema_guru_ray.stages.text import TextCleaner

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    out = ds.map_batches(TextCleaner(), batch_format="pandas")
    return out.map_batches(
        lambda b: b[["doc_id", "clean_md5", "n_chars_clean"]],
        batch_format="pandas",
    )


CLEAN_DOCUMENTS_SQL = r"""
SELECT doc_id,
       md5(trim(regexp_replace(regexp_replace(nfc_normalize(text),
           '[\x00-\x1f\x7f]', '', 'g'), '\s+', ' ', 'g'))) AS clean_md5,
       CAST(len(trim(regexp_replace(regexp_replace(nfc_normalize(text),
           '[\x00-\x1f\x7f]', '', 'g'), '\s+', ' ', 'g'))) AS BIGINT) AS n_chars_clean
FROM documents
"""


def bigram_frequencies_documents(sf_dir: str, min_count: int = 5):
    """Global bigram frequency table (n-gram statistics beyond unigrams):
    per-batch vectorized counts pre-aggregate, tiny groupby sum, frequency
    floor to bound output size."""
    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].fillna("").str.lower().str.findall(r"[\w']+")
        bigrams = toks.map(
            lambda ws: [f"{a} {b_}" for a, b_ in zip(ws, ws[1:])]
        ).explode().dropna()
        counts = bigrams.value_counts()
        return pd.DataFrame({"bigram": counts.index, "n": counts.to_numpy()})

    agg = (
        ds.map_batches(partial, batch_format="pandas")
        .groupby("bigram")
        .aggregate(Sum("n", alias_name="n"))
    )
    return agg.map_batches(
        lambda t: t.filter(pc.greater_equal(t["n"], min_count)),
        batch_format="pyarrow",
    )


BIGRAM_FREQUENCIES_DOCUMENTS_SQL = r"""
WITH toks AS (
  SELECT regexp_extract_all(lower(text), '[\w'']+') AS tk FROM documents
),
bg AS (
  SELECT unnest(list_transform(generate_series(1, len(tk) - 1),
                               i -> tk[i] || ' ' || tk[i+1])) AS bigram
  FROM toks
)
SELECT bigram, CAST(count(*) AS BIGINT) AS n
FROM bg GROUP BY bigram HAVING count(*) >= 5
"""


def heavy_hitters_tokens(sf_dir: str, k: int = 20, capacity: int = 8192):
    """EXACT global top-k tokens without a full-vocabulary shuffle, via a
    Misra-Gries sketch (sketches/heavy.py) + exact recount.

    Pass 1: per-batch ``value_counts`` feeds a bounded MG sketch (one tiny
    pickled state per batch), tree-folded to one global sketch — every
    token with true count > n/(capacity+1) is provably among its keys.
    Pass 2: the ≤``capacity`` surviving keys broadcast via ``ray.put`` and
    are recounted EXACTLY with a filtered partial + tiny groupby (shuffle
    volume: #batches × #candidates rows, never the vocabulary). The result
    is the exact top-k whenever the k-th exact count clears the sketch's
    measured decrement bound — asserted in-run, so a capacity too small
    for the distribution fails loudly instead of silently approximating.
    Contrast ``token_frequencies_documents``: that shuffles the WHOLE
    vocabulary; this shuffles 8k candidate rows per batch regardless of
    vocabulary size — the 100 TB shape for "top 1000 tokens of the crawl".
    """
    import pickle

    import ray
    from ray.data.aggregate import Sum

    from schema_guru_ray.sketches import MisraGries, fold_sketch_states

    ds = _read(sf_dir, "documents", ["text"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        toks = b["text"].fillna("").str.lower().str.findall(r"[\w']+").explode().dropna()
        counts = toks.value_counts()
        mg = MisraGries(capacity).add_counts(
            zip(counts.index.to_list(), counts.to_numpy())
        )
        return pd.DataFrame({"state": [pickle.dumps(mg)]})

    mg = fold_sketch_states(ds.map_batches(partial, batch_format="pandas"))
    if mg is None:
        return pd.DataFrame({"token": [], "n": [], "rk": []})
    cand_ref = ray.put(frozenset(k_ for k_, _ in mg.candidates()))

    def recount(b: pd.DataFrame) -> pd.DataFrame:
        cand = ray.get(cand_ref)
        toks = b["text"].fillna("").str.lower().str.findall(r"[\w']+").explode().dropna()
        counts = toks[toks.isin(cand)].value_counts()
        return pd.DataFrame({"token": counts.index, "n": counts.to_numpy()})

    exact = (
        ds.map_batches(recount, batch_format="pandas")
        .groupby("token")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    topk = (
        exact.sort_values(["n", "token"], ascending=[False, True])
        .head(k)
        .reset_index(drop=True)
    )
    # exactness guard: all true top-k are among the candidates iff the k-th
    # exact count exceeds the sketch's total decrement (max undercount)
    if len(topk) == k and int(topk["n"].iloc[-1]) <= mg.error_bound():
        raise AssertionError(
            f"MG capacity {capacity} too small: k-th count {topk['n'].iloc[-1]}"
            f" <= decrement bound {mg.error_bound()}; raise capacity"
        )
    return pd.DataFrame(
        {
            "token": topk["token"],
            "n": topk["n"].astype("int64"),
            "rk": np.arange(1, len(topk) + 1, dtype=np.int64),
        }
    )


HEAVY_HITTERS_TOKENS_SQL = """
WITH tok AS (
  SELECT unnest(regexp_extract_all(lower(text), '[\\w'']+')) AS token FROM documents
),
counts AS (
  SELECT token, CAST(count(*) AS BIGINT) AS n FROM tok GROUP BY token
)
SELECT token, n,
       CAST(row_number() OVER (ORDER BY n DESC, token) AS BIGINT) AS rk
FROM counts
ORDER BY n DESC, token
LIMIT 20
"""


def tfidf_top_terms_documents(sf_dir: str, k: int = 5):
    """Per-document top-k terms by tf-idf (linear idf: score = tf/df —
    monotone in tf·(N/df); a single IEEE division, so bit-exact against the
    SQL oracle, unlike log-idf where libm rounding differs across engines).

    Document frequencies: per-batch UNIQUE (doc, term) partials → tiny
    ``groupby(term)`` sum (exact — a doc's row lives in exactly one batch).
    The df table broadcasts once via ``ray.put`` (the guide's small-side
    lookup pattern: vocabulary ≪ corpus; at open-web scale, cut the
    broadcast with a min_df floor or switch to a term-keyed semi-join —
    the rarest terms have df=1 and score tf/1, computable locally). Scoring
    + per-doc top-k is then a pure ``map_batches``: docs never split across
    batches, so NO shuffle touches the (doc, term, tf) triples."""
    import ray

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def pairs(b: pd.DataFrame):
        toks = b["text"].fillna("").str.lower().str.findall(r"[\w']+")
        n = toks.str.len().to_numpy()
        return pd.DataFrame(
            {
                "doc_id": np.repeat(b["doc_id"].to_numpy(), n),
                "term": np.concatenate([np.array(t, dtype=object) for t in toks])
                if n.sum()
                else np.array([], dtype=object),
            }
        )

    def df_partial(b: pd.DataFrame) -> pd.DataFrame:
        p = pairs(b).drop_duplicates()
        counts = p["term"].value_counts()
        return pd.DataFrame({"term": counts.index, "df": counts.to_numpy()})

    df_tbl = (
        ds.map_batches(df_partial, batch_format="pandas")
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
        .to_pandas()
    )
    df_ref = ray.put(dict(zip(df_tbl["term"], df_tbl["df"].astype("int64"))))

    def score(b: pd.DataFrame) -> pd.DataFrame:
        dfs = ray.get(df_ref)
        p = pairs(b)
        if p.empty:
            return pd.DataFrame(
                {"doc_id": pd.Series([], dtype=b["doc_id"].dtype),
                 "term": pd.Series([], dtype=object),
                 "tf": pd.Series([], dtype="int64"),
                 "df": pd.Series([], dtype="int64"),
                 "score": pd.Series([], dtype="float64")}
            )
        tf = p.groupby(["doc_id", "term"], sort=False).size().reset_index(name="tf")
        tf["df"] = tf["term"].map(dfs).astype("int64")
        tf["score"] = tf["tf"].to_numpy().astype("float64") / tf["df"].to_numpy()
        tf = tf.sort_values(
            ["doc_id", "score", "term"], ascending=[True, False, True], kind="stable"
        )
        out = tf.groupby("doc_id", sort=False).head(k)
        return out.assign(tf=out["tf"].astype("int64")).reset_index(drop=True)

    return ds.map_batches(score, batch_format="pandas")


TFIDF_TOP_TERMS_DOCUMENTS_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(regexp_extract_all(lower(text), '[\\w'']+')) AS term
  FROM documents
),
tf AS (
  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, term
),
df AS (
  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY term
)
SELECT doc_id, term, tf, df, CAST(tf AS DOUBLE) / df AS score
FROM tf JOIN df USING (term)
QUALIFY row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) <= 5
"""


def dedup_exact_documents(sf_dir: str):
    from schema_guru_ray.stages.dedup import exact_dedup

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return exact_dedup(ds)


DEDUP_EXACT_DOCUMENTS_SQL = """
SELECT md5(trim(lower(regexp_replace(text, '\\s+', ' ', 'g')))) AS fp_md5,
       min(doc_id) AS keeper_id,
       count(*) AS n_copies
FROM documents
GROUP BY 1
"""


def minhash_dedup_documents(sf_dir: str, measure_recall: bool = True):
    """Near-dup candidate pairs (MinHash+LSH, default 64-perm × 16-band
    signer). LSH output is approximate by design (no SQL oracle), but the
    result carries a MEASURED recall against the verified exact-jaccard
    ≥ 0.8 pair set computed IN THE SAME RUN with the recall-exhaustive
    21×3-band signer — the truth set near_dup_pairs_documents
    oracle-checks — so the rows-only record is a checked invariant and
    pytest bounds it (the ivf_topk_embeddings pattern).
    ``measure_recall=False`` skips the truth-set harness (~3x the
    operator's own work) — bench.py times the bare operator."""
    from schema_guru_ray.stages.dedup import (
        MinHashSigner,
        minhash_candidate_pairs,
        verify_pairs_jaccard_distributed,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).repartition(8).materialize()
    cands = minhash_candidate_pairs(
        ds, MinHashSigner(), min_est_jaccard=0.5
    ).to_pandas()
    if not measure_recall:
        return cands
    truth_cands = minhash_candidate_pairs(
        ds, MinHashSigner(num_perm=63, bands=21), min_est_jaccard=0.5
    )
    truth = verify_pairs_jaccard_distributed(truth_cands, ds, threshold=0.8).to_pandas()
    truth_pairs = set(zip(truth["id_a"].astype(int), truth["id_b"].astype(int)))
    cand_pairs = set(zip(cands["id_a"].astype(int), cands["id_b"].astype(int)))
    recall = (
        len(truth_pairs & cand_pairs) / len(truth_pairs) if truth_pairs else 1.0
    )
    out = cands.copy()
    out["recall_vs_verified"] = float(recall)
    return out


def near_dup_pairs_documents(sf_dir: str):
    """End-to-end distributed near-dup detection with an EXACT answer:
    MinHash+LSH candidate generation (21 bands × 3 rows — miss probability
    at jaccard 0.8 is (1-0.8³)^21 ≈ 3e-7, i.e. recall-exhaustive for this
    threshold) → distributed exact shingle-set verification
    (verify_pairs_jaccard_distributed) → pairs with word-3-gram jaccard
    >= 0.8. Output is pure integers (n_inter, n_union), so the DuckDB
    brute-force oracle hash-matches exactly."""
    from schema_guru_ray.stages.dedup import (
        MinHashSigner,
        minhash_candidate_pairs,
        verify_pairs_jaccard_distributed,
    )

    # small single-file test corpora arrive as ONE block — repartition so
    # the signing stage parallelizes (real corpora are multi-block already)
    ds = _read(sf_dir, "documents", ["doc_id", "text"]).repartition(8)
    signer = MinHashSigner(num_perm=63, bands=21)
    cands = minhash_candidate_pairs(ds, signer, min_est_jaccard=0.5)
    # NB: no select_columns here — the verify output is exactly
    # (id_a, id_b, n_inter, n_union), and select_columns would fetch the
    # schema, executing the whole shuffle a second time
    return verify_pairs_jaccard_distributed(cands, ds, threshold=0.8)


NEAR_DUP_PAIRS_DOCUMENTS_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS tk FROM documents
),
sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(tk) < 3 THEN [list_aggregate(tk, 'string_agg', ' ')]
         ELSE list_transform(generate_series(1, len(tk)-2),
                             i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
    END)) AS s
  FROM toks
),
counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_inter, ca.n + cb.n - n_inter AS n_union
FROM inter
JOIN counts ca ON ca.doc_id = id_a
JOIN counts cb ON cb.doc_id = id_b
WHERE n_inter * 5 >= (ca.n + cb.n - n_inter) * 4
"""


def dup_components_documents(sf_dir: str):
    """Duplicate clusters: distributed min-label propagation
    (connected_components_distributed) over the exact-verified near-dup
    pairs. Oracle: recursive-CTE transitive closure in DuckDB — this is
    the correctness check for the distributed components operator
    itself."""
    from schema_guru_ray.stages.dedup import (
        MinHashSigner,
        connected_components_distributed,
        minhash_candidate_pairs,
        verify_pairs_jaccard_distributed,
    )

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).repartition(8)
    signer = MinHashSigner(num_perm=63, bands=21)
    cands = minhash_candidate_pairs(ds, signer, min_est_jaccard=0.5)
    pairs = verify_pairs_jaccard_distributed(cands, ds, threshold=0.8)
    labels = connected_components_distributed(pairs)
    return labels.map_batches(
        lambda b: b.assign(
            node=b["node"].astype("int64"), label=b["label"].astype("int64")
        ),
        batch_format="pandas",
    )


DUP_COMPONENTS_DOCUMENTS_SQL = (
    "WITH RECURSIVE pairs AS (" + NEAR_DUP_PAIRS_DOCUMENTS_SQL + r"""),
edges AS (
  SELECT id_a AS a, id_b AS b FROM pairs
  UNION ALL
  SELECT id_b, id_a FROM pairs
),
walk AS (
  SELECT DISTINCT a AS src, a AS reach FROM edges
  UNION
  SELECT w.src, e.b FROM walk w JOIN edges e ON e.a = w.reach
)
SELECT src AS node, min(reach) AS label FROM walk GROUP BY src
"""
)


def simhash_documents(sf_dir: str):
    """SimHash near-dup pairs with a FULL DuckDB oracle: the md5 token
    hash lets SQL rebuild every 64-bit signature bit-for-bit, re-derive
    the chunk candidates (pigeonhole: hamming ≤ 3 ⇒ some 16-bit chunk is
    equal) and check ``bit_count(xor(sig_a, sig_b))`` — this moved from
    the no-oracle tail in round 3."""
    from schema_guru_ray.stages.dedup import simhash_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return simhash_pairs(ds, max_hamming=3)


SIMHASH_DOCUMENTS_SQL = r"""
WITH tokens AS (
  SELECT doc_id,
         unnest(string_split(
           trim(regexp_replace(lower(coalesce(text, '')), '\s+', ' ', 'g')),
           ' ')) AS tok
  FROM documents
),
tokhash AS (
  SELECT doc_id,
         CAST(concat('0x', substr(md5(tok), 1, 16)) AS UBIGINT) AS h
  FROM tokens
),
bitsum AS (
  SELECT doc_id, gs.b,
         sum(CASE WHEN ((h >> gs.b) & 1) = 1 THEN 1 ELSE -1 END) AS s
  FROM tokhash, generate_series(0, 63) AS gs(b)
  GROUP BY doc_id, gs.b
),
sig AS (
  SELECT doc_id,
         CAST(sum(CASE WHEN s > 0 THEN (1::HUGEINT << b) ELSE 0::HUGEINT END)
              AS UBIGINT) AS sig
  FROM bitsum GROUP BY doc_id
),
chunks AS (
  SELECT doc_id, sig, g2.c,
         CAST((sig >> (16 * g2.c)) & 65535 AS INT) AS cv
  FROM sig, generate_series(0, 3) AS g2(c)
),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
         a.sig AS sa, b.sig AS sb
  FROM chunks a
  JOIN chunks b ON a.c = b.c AND a.cv = b.cv AND a.doc_id < b.doc_id
)
SELECT id_a, id_b, CAST(bit_count(xor(sa, sb)) AS BIGINT) AS hamming
FROM cand
WHERE bit_count(xor(sa, sb)) <= 3
"""


def langid_documents(sf_dir: str):
    from schema_guru_ray.stages.text import LangId

    ds = _read(sf_dir, "documents", ["doc_id", "text"])
    return ds.map_batches(LangId(), batch_format="pandas")


def curate_documents(sf_dir: str):
    """FLAGSHIP COMPOSITION: the full curation chain — exact dedup →
    verified near-dup removal → quality filter (n_words ∈ [30, 100k]) →
    deterministic 50% sample — end-to-end distributed, with the DuckDB
    oracle replaying the ENTIRE chain as one CTE. Every stage is
    deterministic, so the final kept set hash-matches exactly."""
    from schema_guru_ray.pipelines.curate import curate_documents as _curate

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).repartition(8)
    return _curate(ds)


CURATE_DOCUMENTS_SQL = r"""
WITH keepers AS (
  SELECT min(doc_id) AS doc_id
  FROM documents
  GROUP BY md5(trim(lower(regexp_replace(text, '\s+', ' ', 'g'))))
),
kept AS (SELECT d.doc_id, d.text FROM documents d JOIN keepers USING (doc_id)),
toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS tk FROM kept
),
sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(tk) < 3 THEN [list_aggregate(tk, 'string_agg', ' ')]
         ELSE list_transform(generate_series(1, len(tk)-2),
                             i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
    END)) AS s
  FROM toks
),
counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN counts ca ON ca.doc_id = id_a
  JOIN counts cb ON cb.doc_id = id_b
  WHERE n_inter * 5 >= (ca.n + cb.n - n_inter) * 4
),
survivors AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(text), '[\w'']+')) AS BIGINT) AS n_words
  FROM kept
  WHERE doc_id NOT IN (SELECT id_b FROM pairs)
)
SELECT doc_id, n_words
FROM survivors
WHERE n_words BETWEEN 30 AND 100000
  AND substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) < '800000000000000'
"""


# --- deterministic sampling (training-data curation) ------------------------


def sample_documents(sf_dir: str, rate: float = 0.2):
    """Content-addressed 20% Bernoulli sample of documents — deterministic
    (two runs, or Ray and DuckDB, select the SAME rows), no shuffle."""
    from schema_guru_ray.stages.sample import deterministic_sample

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    return deterministic_sample(ds, "doc_id", rate)


SAMPLE_DOCUMENTS_SQL = """
SELECT doc_id, lang
FROM documents
WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) < '333333333333333'
"""


def mixture_documents(sf_dir: str):
    """Corpus mixture weighting: keep 100% of lang='en' documents, 25% of
    everything else — per-stratum deterministic Bernoulli rates (the
    upsample/downsample primitive of pre-training data mixes). Pure
    filter, no shuffle, exactly SQL-replayable."""
    from schema_guru_ray.stages.sample import stratified_sample

    ds = _read(sf_dir, "documents", ["doc_id", "lang"])
    return stratified_sample(ds, "lang", "doc_id", {"en": 1.0}, default_rate=0.25)


MIXTURE_DOCUMENTS_SQL = """
SELECT doc_id, lang
FROM documents
WHERE lang = 'en'
   OR substr(md5(CAST(doc_id AS VARCHAR)), 1, 15) < '400000000000000'
"""


def stratified_cap_events(sf_dir: str, cap: int = 50):
    """Per-event-type cap: keep at most 50 events per type, chosen by
    ascending (md5(event_id), event_id) — the 'max N docs per domain'
    curation rule, exactly SQL-replayable. Distributed per-group top-k:
    per-batch local caps, then a stratum groupby over the survivors."""
    from schema_guru_ray.stages.sample import stratified_cap

    ds = _read(sf_dir, "events", ["event_id", "event_type"])
    out = stratified_cap(ds, "event_type", "event_id", cap, rank_alias="rk")
    return out.map_batches(
        lambda b: b.astype({"event_id": "int64", "rk": "int64"}),
        batch_format="pandas",
    )


STRATIFIED_CAP_EVENTS_SQL = """
SELECT event_id, event_type,
       CAST(row_number() OVER (
           PARTITION BY event_type
           ORDER BY md5(CAST(event_id AS VARCHAR)), event_id
       ) AS BIGINT) AS rk
FROM events
QUALIFY rk <= 50
"""


# --- similarity search ------------------------------------------------------


def _load_queries(sf_dir: str, n: int = 3) -> np.ndarray:
    import pyarrow.parquet as pq

    tab = pq.read_table(
        os.path.join(sf_dir, "embeddings.parquet"), columns=["vec_id", "embedding"]
    )
    df = tab.to_pandas().sort_values("vec_id").head(n)
    return np.stack(df["embedding"].to_numpy())


def ann_topk_embeddings(sf_dir: str, k: int = 10):
    """Brute-force cosine top-k (exact baseline) for queries = embeddings of
    vec_id 0..2. Scores rounded to 4 dp to match the SQL oracle despite
    float32/float64 path differences."""
    from schema_guru_ray.stages.similarity import brute_force_topk

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    out = brute_force_topk(ds, _load_queries(sf_dir), k=k)
    # integer basis points → float-representation-proof oracle compare
    out["score_bp"] = np.floor(out["score"] * 10000 + 0.5).astype("int64")
    out["query_idx"] = out["query_idx"].astype("int64")
    out["vec_id"] = out["vec_id"].astype("int64")
    return out[["query_idx", "vec_id", "score_bp"]]


ANN_TOPK_EMBEDDINGS_SQL = """
WITH q AS (SELECT vec_id AS query_idx, embedding AS qe FROM embeddings WHERE vec_id < 3)
SELECT query_idx, vec_id,
       CAST(round(list_cosine_similarity(qe, embedding) * 10000) AS BIGINT) AS score_bp
FROM q CROSS JOIN embeddings
QUALIFY row_number() OVER (PARTITION BY query_idx ORDER BY list_cosine_similarity(qe, embedding) DESC, vec_id) <= 10
"""


def ivf_topk_embeddings(sf_dir: str, k: int = 10):
    """IVF approximate top-k. Approximate by design (no SQL oracle), but
    the result carries a MEASURED per-query recall against the exact
    brute-force top-k computed in the same run — the rows-only record is
    therefore a checked invariant, and pytest bounds it."""
    from schema_guru_ray.stages.similarity import brute_force_topk, ivf_topk

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    queries = _load_queries(sf_dir)
    # random (cluster-free) embeddings are IVF's worst case — probe half
    # the cells; real clustered corpora reach the same recall with fewer
    approx = ivf_topk(ds, queries, k=k, n_cells=16, n_probe=8)
    exact = brute_force_topk(ds, queries, k=k)
    recall = {
        int(q): len(
            set(approx[approx["query_idx"] == q]["vec_id"])
            & set(exact[exact["query_idx"] == q]["vec_id"])
        )
        / max(1, (exact["query_idx"] == q).sum())
        for q in exact["query_idx"].unique()
    }
    approx = approx.copy()
    approx["recall_vs_exact"] = approx["query_idx"].map(recall).astype("float64")
    return approx


def embedding_near_dup(sf_dir: str):
    """Cosine near-dup pairs (multi-table hyperplane LSH, 16 tables × 6
    bits → miss probability ≈ 6e-6 at cosine 0.95) + in-bucket exact
    cosine. Integer basis points → hash-exact DuckDB brute-force oracle."""
    from schema_guru_ray.stages.dedup import embedding_near_dup_pairs

    ds = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    pairs = embedding_near_dup_pairs(
        ds, dim=64, threshold=0.95, n_bits=6, n_tables=16
    ).to_pandas()
    if pairs.empty:  # empty aggregates drop their schema in to_pandas
        return pd.DataFrame(
            {
                "id_a": pd.Series(dtype="int64"),
                "id_b": pd.Series(dtype="int64"),
                "cosine_bp": pd.Series(dtype="int64"),
            }
        )
    pairs["cosine_bp"] = np.floor(pairs["cosine"] * 10000 + 0.5).astype("int64")
    return pairs[["id_a", "id_b", "cosine_bp"]]


EMBEDDING_NEAR_DUP_SQL = """
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
       CAST(round(list_cosine_similarity(a.embedding, b.embedding) * 10000) AS BIGINT) AS cosine_bp
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.95
"""


# --- schema inference -------------------------------------------------------


def schema_infer_lineitem(sf_dir: str):
    """Merged JSON Schema of the lineitem table (rows-only: JSON output)."""
    from schema_guru_ray.pipelines.infer import infer_schema

    ds = _read(sf_dir, "lineitem")
    res = infer_schema(ds, SchemaContext(enum_cardinality=5))
    return pd.DataFrame(
        {
            "schema_json": [json.dumps(res["schema"], sort_keys=True)],
            "n_rows": [res["n_rows"]],
            "n_errors": [res["n_errors"]],
        }
    )


def schema_infer_events_props(sf_dir: str):
    """Schema of the JSON documents in events.props (the reference's exact
    input shape: a corpus of JSON instances)."""
    from schema_guru_ray.pipelines.infer import infer_schema

    ds = _read(sf_dir, "events", ["props"])
    res = infer_schema(ds, SchemaContext(enum_cardinality=4), json_column="props")
    return pd.DataFrame(
        {
            "schema_json": [json.dumps(res["schema"], sort_keys=True)],
            "n_rows": [res["n_rows"]],
            "n_errors": [res["n_errors"]],
        }
    )


def schema_segmented_events(sf_dir: str):
    """Per-event-type schema (the reference's --schema-by). The n_rows
    accounting is SQL-checkable; schemas ride along as JSON."""
    from schema_guru_ray.pipelines.infer import infer_schema_segmented

    ds = _read(sf_dir, "events")
    out = infer_schema_segmented(ds, "event_type", SchemaContext()).to_pandas()
    return out[["segment", "n_rows"]].astype({"n_rows": "int64"})


SCHEMA_SEGMENTED_EVENTS_SQL = """
SELECT event_type AS segment, count(*) AS n_rows FROM events GROUP BY event_type
"""


def schema_evolution_events(sf_dir: str):
    """Schema-evolution closed loop: infer v1 from a projected events table
    and v2 from the full table, then run the migration diff
    (schema/ddl.schema_diff — added/modified/removed, Migrations.scala
    semantics). The added set must equal the projected-away columns, which
    the oracle reads from information_schema."""
    from schema_guru_ray.pipelines.infer import infer_schema
    from schema_guru_ray.schema.ddl import schema_diff

    v1_cols = ["event_id", "event_type", "ts"]
    v1 = infer_schema(_read(sf_dir, "events", v1_cols), SchemaContext())["schema"]
    v2 = infer_schema(_read(sf_dir, "events"), SchemaContext())["schema"]
    d = schema_diff(v1, [v2])
    rows = (
        [("added", p) for p, _ in d["added"]]
        + [("modified", p) for p, _ in d["modified"]]
        + [("removed", p) for p in d["removed"]]
    )
    return pd.DataFrame(rows, columns=["change", "property"])


SCHEMA_EVOLUTION_EVENTS_SQL = """
SELECT 'added' AS change, column_name AS property
FROM information_schema.columns
WHERE table_name = 'events'
  AND column_name NOT IN ('event_id', 'event_type', 'ts')
"""


# --- clips flagship (rows-only: engine-generated input) ---------------------


def clips_codec_verdicts(sf_dir: str):
    """Flagship: validate the deterministic clips corpus for this scale
    factor; per-codec pass/fail verdict rows."""
    import ray.data as rd

    from schema_guru_ray.pipelines.validate import (
        ValidationConfig,
        codec_verdicts,
        validate_clips,
    )
    from schema_guru_ray.sources.clips import ensure_clips

    path = ensure_clips(sf_dir)
    ds = rd.read_parquet(path)
    cfg = ValidationConfig()
    cv = codec_verdicts(validate_clips(ds, cfg), cfg)
    cv["violations_by_kind"] = cv["violations_by_kind"].map(
        lambda d: json.dumps(d, sort_keys=True)
    )
    return cv


def clips_violations(sf_dir: str):
    import ray.data as rd

    from schema_guru_ray.pipelines.validate import ValidationConfig, validate_clips, violations_dataset
    from schema_guru_ray.sources.clips import ensure_clips

    path = ensure_clips(sf_dir)
    return violations_dataset(validate_clips(rd.read_parquet(path), ValidationConfig()))


def clips_duplicate_ids(sf_dir: str):
    import ray.data as rd

    from schema_guru_ray.pipelines.validate import ValidationConfig, duplicate_clip_ids, validate_clips
    from schema_guru_ray.sources.clips import ensure_clips

    path = ensure_clips(sf_dir)
    return duplicate_clip_ids(validate_clips(rd.read_parquet(path), ValidationConfig()))


def schema_roundtrip_validate_events(sf_dir: str):
    """The inference→validation closed loop: derive a schema from the
    events table, then (a) validate the table against it — zero violations
    by the round-trip contract — and (b) validate a deterministically
    perturbed copy — violations flagged. Returns per-scenario violation
    counts (rows-only)."""
    from schema_guru_ray.pipelines.infer import infer_schema
    from schema_guru_ray.pipelines.validate_schema import validate_against_schema

    ds = _read(sf_dir, "events", ["event_id", "event_type", "value", "user_id"])
    schema = infer_schema(ds, SchemaContext(enum_cardinality=8))["schema"]

    clean_violations = validate_against_schema(ds, schema, id_column="event_id").count()

    def perturb(t: pa.Table) -> pa.Table:
        import pandas as pd_

        df = t.to_pandas()
        # deterministic corruption: every 10th row gets an out-of-range value
        # and an unseen event_type
        idx = df.index[df["event_id"] % 10 == 0]
        df.loc[idx, "value"] = 1e12
        df.loc[idx, "event_type"] = "___corrupted___"
        return pa.Table.from_pandas(df, preserve_index=False)

    perturbed = ds.map_batches(perturb, batch_format="pyarrow")
    bad_violations = validate_against_schema(perturbed, schema, id_column="event_id").count()
    return pd.DataFrame(
        {
            "scenario": ["clean", "perturbed"],
            "n_violations": [clean_violations, bad_violations],
        }
    )


def image_featurize_documents(sf_dir: str):
    """Multimodal plumbing demo: a deterministic binary media column (doc
    text bytes stand in for image payloads) through the ImageFeaturizer
    actor pool — decode(stub) → resize → featurize. Rows-only."""
    from schema_guru_ray.stages.multimodal import ImageFeaturizer

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def to_media(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": b["doc_id"], "media": [t.encode() for t in b["text"]]}
        )

    media = ds.map_batches(to_media, batch_format="pandas")
    out = media.map_batches(
        ImageFeaturizer,
        batch_format="pandas",
        batch_size=64,  # small batches: wide binary rows
        concurrency=(1, 4),
        num_cpus=1,
    )
    return out.map_batches(
        lambda b: pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "height": b["height"],
                "width": b["width"],
                "feat_norm": [float(np.linalg.norm(f)) for f in b["features"]],
            }
        ),
        batch_format="pandas",
    )


# --- joins / windows --------------------------------------------------------


def join_orders_customers(sf_dir: str):
    """Distributed hash join (both sides as Datasets; Ray's native
    hash-partitioned join)."""
    from schema_guru_ray.stages.joins import hash_join

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_totalprice"])

    def cents(t: pa.Table) -> pa.Table:
        c = _int_units(t["o_totalprice"].to_numpy(zero_copy_only=False), 100)
        return t.drop_columns(["o_totalprice"]).append_column(
            "price_cents", pa.Array.from_pandas(c)
        )

    orders = orders.map_batches(cents, batch_format="pyarrow")
    cust = _read(sf_dir, "customer", ["c_custkey", "c_name", "c_mktsegment"]).rename_columns(
        {"c_custkey": "o_custkey"}
    )
    out = hash_join(orders, cust, on="o_custkey", num_partitions=8)
    return out.select_columns(["o_orderkey", "o_custkey", "c_name", "c_mktsegment", "price_cents"])


JOIN_ORDERS_CUSTOMERS_SQL = """
SELECT o_orderkey, o_custkey, c_name, c_mktsegment,
       CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents
FROM orders JOIN customer ON c_custkey = o_custkey
"""


def asof_latest_order_before_event(sf_dir: str):
    """As-of join: for each event, the latest order of the same key placed
    at or before the event time (bucketed pd.merge_asof; DuckDB ASOF JOIN
    oracle with a max-orderkey dedupe CTE; the Ray side achieves the same
    tie semantics via the in-bucket secondary sort — no extra shuffle)."""
    from schema_guru_ray.stages.joins import asof_join, derive_num_buckets

    events = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    # row counts BEFORE the rename: count() on a bare parquet read is a
    # metadata lookup; after a Project it would execute the read
    n_rows = events.count() + _read(sf_dir, "orders", ["o_orderkey"]).count()
    # no dedupe shuffle needed: asof_join's in-bucket secondary sort makes
    # merge_asof pick the max o_orderkey among equal (key, date) rows,
    # matching the oracle's max() dedupe CTE
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).rename_columns(
        {"o_custkey": "user_id"}
    )
    out = asof_join(
        events, orders, key="user_id", left_ts="ts", right_ts="o_orderdate",
        right_columns=["o_orderkey"], num_buckets=derive_num_buckets(n_rows),
    )
    # lazy projection — select_columns would fetch the schema and execute
    # the whole bucketed shuffle an extra time
    return out.map_batches(
        lambda t: t.select(["event_id", "user_id", "o_orderkey"]),
        batch_format="pyarrow",
    )


ASOF_LATEST_ORDER_SQL = """
WITH orders_d AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, o.o_orderkey
FROM events e ASOF JOIN orders_d o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
"""


def asof_orders_bounded(sf_dir: str):
    """Bounded as-of (interval) join: the latest order of the same user no
    more than 8,500 days before the event — merge_asof tolerance, the
    range-join primitive. (The synthetic events sit ~8,200-9,800 days
    after the TPC-H order dates, so this bound meaningfully splits the
    matches.) Same bucketed topology as the unbounded as-of."""
    from schema_guru_ray.stages.joins import asof_join, derive_num_buckets

    events = _read(sf_dir, "events", ["event_id", "user_id", "ts"])
    n_rows = events.count() + _read(sf_dir, "orders", ["o_orderkey"]).count()
    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey", "o_orderdate"]).rename_columns(
        {"o_custkey": "user_id"}
    )
    out = asof_join(
        events, orders, key="user_id", left_ts="ts", right_ts="o_orderdate",
        right_columns=["o_orderkey"], num_buckets=derive_num_buckets(n_rows),
        tolerance_sec=8500 * 86400,
    )
    return out.map_batches(
        lambda t: t.select(["event_id", "user_id", "o_orderkey"]),
        batch_format="pyarrow",
    )


ASOF_ORDERS_BOUNDED_SQL = """
WITH orders_d AS (
  SELECT o_custkey, o_orderdate, max(o_orderkey) AS o_orderkey
  FROM orders GROUP BY o_custkey, o_orderdate
)
SELECT e.event_id, e.user_id, o.o_orderkey
FROM events e ASOF JOIN orders_d o
  ON e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
WHERE e.ts - o.o_orderdate <= INTERVAL 8500 DAY
"""


def range_join_clicks_after_signup(sf_dir: str, broadcast_limit: int = 5_000_000):
    """General interval/range join (stages/joins.range_join): for every
    signup event, the number of click events inside the hour that follows
    it ([ts, ts + 1h], inclusive BETWEEN). Range-partitioned by the click
    timestamp domain — each click lands in one bucket, each 1-hour signup
    window replicates to the 1-2 buckets it overlaps — then a vectorized
    searchsorted sweep per bucket. Signups with zero clicks are kept
    (count 0) via a TWO-REGIME zero-fill on the materialized per-signup
    count side: ≤ ``broadcast_limit`` signups-with-clicks → sorted-array
    lookup broadcast into a streaming map over the signup ids; larger →
    bucketed LEFT join. Nothing signup-sized ever lands on the driver."""
    import ray

    from schema_guru_ray.stages.joins import (
        bucketed_hash_join,
        range_join,
        sorted_lookup,
    )

    events = _read(sf_dir, "events", ["event_id", "ts", "event_type"])

    def _only(kind):
        def fn(t: pa.Table) -> pa.Table:
            return t.filter(pc.equal(t["event_type"], kind)).select(
                ["event_id", "ts"]
            )

        return fn

    clicks = events.map_batches(_only("click"), batch_format="pyarrow")
    signups = events.map_batches(_only("signup"), batch_format="pyarrow")

    def to_interval(t: pa.Table) -> pa.Table:
        ts = t["ts"].combine_chunks().cast(pa.timestamp("us"))
        hi = pc.add(ts, pa.scalar(3_600_000_000, pa.duration("us")))
        return pa.table({"event_id": t["event_id"], "lo": ts, "hi": hi})

    intervals = signups.map_batches(to_interval, batch_format="pyarrow")
    pairs = range_join(
        clicks, intervals, point_col="ts", lo_col="lo", hi_col="hi",
        point_columns=["event_id", "ts"],
        interval_columns=["event_id", "lo", "hi"],
    )
    # per-signup click counts: per-batch Arrow partials, then one vectorized
    # pandas sum per coarse reducer bucket (~250k signups each) — never one
    # sort-aggregate group per signup id
    nbk = max(8, _meta_rows(sf_dir, "events") // 250_000 + 1)

    def per_signup(t: pa.Table) -> pa.Table:
        g = t.select(["event_id"]).group_by("event_id").aggregate(
            [("event_id", "count", pc.CountOptions(mode="all"))]
        )
        return g.rename_columns(["event_id", "n_clicks"])

    def tagk(t: pa.Table) -> pa.Table:
        b = (t["event_id"].to_numpy(zero_copy_only=False) % nbk).astype(np.int32)
        return t.append_column("__b", pa.array(b, pa.int32()))

    def sum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("event_id", as_index=False)["n_clicks"].sum()
        return s.astype({"event_id": "int64", "n_clicks": "int64"})

    counts = (
        pairs.map_batches(per_signup, batch_format="pyarrow")
        .map_batches(tagk, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(sum_bucket, batch_format="pandas")
        .materialize()  # ≤ one row per signup that saw a click
    )
    ids = signups.select_columns(["event_id"])

    if counts.count() <= broadcast_limit:
        # broadcast regime: event_id → click-count sorted lookup shipped
        # once; signup ids stream through one vectorized zero-fill map
        cc = counts.to_pandas()
        keys = cc["event_id"].to_numpy(np.int64)
        vals = cc["n_clicks"].to_numpy(np.int64)
        order = np.argsort(keys, kind="stable")
        lut_ref = ray.put((keys[order], vals[order]))

        def bfill(t: pa.Table) -> pa.Table:
            k_arr, v_arr = ray.get(lut_ref)
            v = t["event_id"].to_numpy(zero_copy_only=False)
            i, hit = sorted_lookup(k_arr, v)
            n = np.where(hit, v_arr[i], 0)
            return pa.table(
                {"event_id": t["event_id"], "n_clicks": pa.array(n, pa.int64())}
            )

        return ids.map_batches(bfill, batch_format="pyarrow")

    # distributed regime: bucketed LEFT join (ids ⟕ counts) + streamed
    # zero-fill; schema hints keep ds.schema() from executing the
    # coarse-bucket shuffle twice
    out = bucketed_hash_join(
        ids,
        counts,
        on="event_id",
        join_type="left",
        left_schema=pa.schema([("event_id", pa.int64())]),
        right_schema=pa.schema(
            [("event_id", pa.int64()), ("n_clicks", pa.int64())]
        ),
    )

    def zfill(t: pa.Table) -> pa.Table:
        n = pc.fill_null(t["n_clicks"], 0).cast(pa.int64())
        return pa.table({"event_id": t["event_id"], "n_clicks": n})

    return out.map_batches(zfill, batch_format="pyarrow")


RANGE_JOIN_CLICKS_SQL = """
SELECT s.event_id AS event_id, count(c.event_id) AS n_clicks
FROM events s LEFT JOIN events c
  ON c.event_type = 'click' AND c.ts >= s.ts AND c.ts <= s.ts + INTERVAL 1 HOUR
WHERE s.event_type = 'signup'
GROUP BY s.event_id
ORDER BY event_id
"""


def windowed_events_daily(sf_dir: str):
    """Tumbling 1-day event-time windows per event_type (count + integer
    milli sum) — batch semantics over the ordered log."""
    from schema_guru_ray.stages.joins import tumbling_window_agg

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])
    return tumbling_window_agg(ds, "ts", 86400, ["event_type"], "value")


WINDOWED_EVENTS_DAILY_SQL = """
SELECT event_type,
       to_timestamp(CAST(floor(epoch(ts) / 86400) * 86400 AS BIGINT))::TIMESTAMP AS window_start,
       count(*) AS n,
       CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_milli
FROM events
GROUP BY 1, 2
"""


def hopping_events_daily_6h(sf_dir: str):
    """Hopping windows: 1-day windows advancing every 6 h (each event in
    exactly 4 windows) per event_type — count + integer-milli sum. The
    expansion is a vectorized repeat; only per-(batch,key,window) partials
    shuffle."""
    from schema_guru_ray.stages.joins import hopping_window_agg

    ds = _read(sf_dir, "events", ["event_type", "ts", "value"])
    return hopping_window_agg(ds, "ts", 86400, 21600, ["event_type"], "value")


HOPPING_EVENTS_DAILY_6H_SQL = """
SELECT event_type,
       to_timestamp(w)::TIMESTAMP AS window_start,
       count(*) AS n,
       CAST(sum(CAST(round(value * 1000) AS BIGINT)) AS BIGINT) AS sum_value_milli
FROM events,
     unnest(generate_series(
         CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT) - 3 * 21600,
         CAST(floor(epoch(ts) / 21600) * 21600 AS BIGINT),
         21600)) AS t(w)
GROUP BY 1, 2
"""


def top_orders_per_customer(sf_dir: str, k: int = 3):
    """Per-group top-k without a global sort: each customer's 3 highest
    orders by price (ties by orderkey). Distributed as per-batch local
    top-k + a groupby merge over the tiny survivors."""
    from schema_guru_ray.stages.joins import grouped_topk

    orders = _read(sf_dir, "orders", ["o_custkey", "o_orderkey", "o_totalprice"])
    out = grouped_topk(
        orders, "o_custkey", "o_totalprice", k,
        descending=True, tie_col="o_orderkey", rank_alias="rk",
    )

    def cents(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "o_custkey": b["o_custkey"].astype("int64"),
                "o_orderkey": b["o_orderkey"].astype("int64"),
                "price_cents": _int_units(
                    b["o_totalprice"].to_numpy(), 100
                ).astype("int64").to_numpy(),
                "rk": b["rk"].astype("int64"),
            }
        )

    return out.map_batches(cents, batch_format="pandas")


TOP_ORDERS_PER_CUSTOMER_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(round(o_totalprice * 100) AS BIGINT) AS price_cents,
       CAST(row_number() OVER (
           PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey
       ) AS BIGINT) AS rk
FROM orders
QUALIFY rk <= 3
"""


def window_functions_orders(sf_dir: str):
    """Analytic window functions over orders — running revenue, row number,
    and days-since-previous-order per customer, ordered by
    (o_orderdate, o_orderkey). One ``partitioned_window`` pass covers the
    SQL ``SUM() OVER``, ``row_number()`` and ``lag()`` family: hash-bucket
    by customer, one vectorized sort + groupby-transform per coarse bucket
    (no global sort, no per-key dispatch). ``gap_days`` uses -1 for the
    first order (instead of NULL) so the integer column stays non-nullable
    end-to-end."""
    from schema_guru_ray.stages.joins import partitioned_window

    orders = _read(
        sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]
    )

    def analytics(g: pd.DataFrame) -> pd.DataFrame:
        # g arrives sorted by (o_custkey, o_orderdate, o_orderkey), stable
        cents = _int_units(g["o_totalprice"].to_numpy(), 100).astype("int64")
        grp_key = g["o_custkey"].to_numpy()
        grp = pd.Series(cents.to_numpy(), index=g.index).groupby(grp_key, sort=False)
        by_cust = g.groupby("o_custkey", sort=False)
        prev_date = by_cust["o_orderdate"].shift(1)
        gap = (g["o_orderdate"] - prev_date).dt.days
        return pd.DataFrame(
            {
                "o_custkey": g["o_custkey"].astype("int64"),
                "o_orderkey": g["o_orderkey"].astype("int64"),
                "run_cents": grp.cumsum().astype("int64"),
                "rn": (by_cust.cumcount() + 1).astype("int64"),
                "gap_days": gap.fillna(-1).astype("int64"),
            }
        )

    return partitioned_window(
        orders, "o_custkey", ["o_orderdate", "o_orderkey"], analytics
    )


WINDOW_FUNCTIONS_ORDERS_SQL = """
SELECT o_custkey, o_orderkey,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT)
           AS run_cents,
       CAST(row_number() OVER w AS BIGINT) AS rn,
       CAST(coalesce(
           date_diff('day', lag(o_orderdate) OVER w, o_orderdate), -1
       ) AS BIGINT) AS gap_days
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
"""


def clips_schema_infer(sf_dir: str):
    """Schema inference over the clips table itself — exercises the binary
    and product(null) extension states (rows-only)."""
    import ray.data as rd

    from schema_guru_ray.pipelines.infer import infer_schema
    from schema_guru_ray.sources.clips import ensure_clips

    path = ensure_clips(sf_dir)
    res = infer_schema(rd.read_parquet(path), SchemaContext(enum_cardinality=8))
    return pd.DataFrame(
        {
            "schema_json": [json.dumps(res["schema"], sort_keys=True)],
            "n_rows": [res["n_rows"]],
            "n_errors": [res["n_errors"]],
        }
    )


def clips_profile(sf_dir: str):
    """Per-column profiles (exact stats + HLL distinct + KLL quantiles) over
    the clips table, grouped per codec (rows-only: sketch outputs)."""
    import ray.data as rd

    from schema_guru_ray.sources.clips import ensure_clips
    from schema_guru_ray.stages.profile import TableProfiler, merge_profile_rows

    path = ensure_clips(sf_dir)
    cols = ["clip_id", "sr_hz", "dur_ms"]
    ds = rd.read_parquet(path, columns=cols + ["codec"])
    prof_ds = ds.map_batches(
        TableProfiler(cols, by="codec"), batch_format="pyarrow", batch_size=8192
    )

    def merge_group(g: pd.DataFrame) -> pd.DataFrame:
        profs = merge_profile_rows(list(g["profile"]))
        rows = []
        for c in cols:
            row = profs[c].to_row(c)
            row["codec"] = g["group"].iloc[0]
            rows.append(row)
        return pd.DataFrame(rows)

    return prof_ds.groupby("group").map_groups(merge_group, batch_format="pandas")


def clips_drift(sf_dir: str):
    """PSI/KS drift verdicts: baseline sketches from the corpus itself (self
    drift ≈ 0) plus a deliberately duration-shifted comparison corpus
    (PSI > 0.25 → failed verdict). Rows-only."""
    import ray.data as rd

    from schema_guru_ray.pipelines.validate import (
        ValidationConfig,
        build_baseline,
        codec_verdicts,
        validate_clips,
    )
    from schema_guru_ray.sources.clips import ClipsConfig, clips_dataset, ensure_clips

    path = ensure_clips(sf_dir)
    cfg = ValidationConfig()
    # decode+SNR runs ONCE: the materialized verdicts feed both the
    # baseline build and the self-comparison
    verdicts = validate_clips(rd.read_parquet(path), cfg).materialize()
    baseline = build_baseline(verdicts, cfg)

    shifted_cfg = ClipsConfig(median_dur_ms=600.0, seed=43)
    shifted = validate_clips(clips_dataset(2000, shifted_cfg), cfg)
    self_cv = codec_verdicts(verdicts, cfg, baseline=baseline)
    shift_cv = codec_verdicts(shifted, cfg, baseline=baseline)
    self_cv["comparison"] = "self"
    shift_cv["comparison"] = "duration_shifted"
    out = pd.concat([self_cv, shift_cv], ignore_index=True)
    out["violations_by_kind"] = out["violations_by_kind"].map(
        lambda d: json.dumps(d, sort_keys=True)
    )
    return out


def clips_audio_features(sf_dir: str):
    """Real-DSP log-filterbank features per clip (rows-only)."""
    from schema_guru_ray.sources.clips import ensure_clips, read_clips
    from schema_guru_ray.stages.audio_features import audio_features

    path = ensure_clips(sf_dir)
    return audio_features(read_clips(path))


def clips_segments(sf_dir: str):
    """Energy-based voice-activity segmentation per clip: (clip_id,
    seg_idx, start_ms, end_ms, rms_db) rows from frame-RMS gating with
    gap-bridging hysteresis (rows-only; boundary ground truth is
    pytest-checked on synthesized tone/silence layouts)."""
    from schema_guru_ray.sources.clips import ensure_clips, read_clips
    from schema_guru_ray.stages.audio_transform import segment_clips

    path = ensure_clips(sf_dir)
    return segment_clips(read_clips(path))


def clips_windows(sf_dir: str):
    """Fixed-length training-window chunking (250 ms window / 100 ms hop)
    over every decodable clip: (clip_id, win_idx, start_ms, end_ms, rms_db)
    rows — the layout stage a speech-training pipeline runs before packing
    windows into shards. Per-window RMS is one cumulative-sum pass per clip
    (O(n) regardless of overlap); bytes stay inside the stage (rows-only;
    layout and RMS ground truth are pytest-checked on synthesized clips)."""
    from schema_guru_ray.sources.clips import ensure_clips, read_clips
    from schema_guru_ray.stages.audio_transform import window_clips

    path = ensure_clips(sf_dir)
    return window_clips(read_clips(path))


def clips_feature_prep(sf_dir: str):
    """Feature-space training prep over the clips corpus: SpecAugment-
    masked log-filterbank features (deterministic per clip_id — same clip,
    same masks, exact resume) → corpus CMVN gather (one sufficient-stat
    row per batch to the driver) → broadcast normalize → in-run
    verification that every feature dimension of the normalized corpus has
    mean 0 / std 1 (milli-units). Rows-only (engine-generated input);
    masking determinism, mean-fill, and CMVN exactness are
    pytest-checked."""
    from schema_guru_ray.sources.clips import ensure_clips, read_clips
    from schema_guru_ray.stages.audio_features import (
        SpecAugmentFeaturizer, apply_cmvn, cmvn_stats,
    )

    path = ensure_clips(sf_dir)
    feats = (
        read_clips(path)
        .map_batches(
            SpecAugmentFeaturizer, batch_format="pyarrow", batch_size=256,
            concurrency=(1, 16), num_cpus=1,
        )
        .map_batches(
            lambda t: t.filter(t["decodable"]), batch_format="pyarrow"
        )
        .materialize()  # tiny feature rows; the stats + apply passes both
        # read them, and the decode pool must not share a plan with them
    )
    mean, std = cmvn_stats(feats)
    normed = apply_cmvn(feats, mean, std)

    # verification gather reuses the SAME sufficient-stats fold, unclamped
    mu, sd = cmvn_stats(normed, clamp=False)
    return pd.DataFrame(
        {
            "dim": np.arange(len(mu), dtype="int64"),
            "mean_milli": np.rint(mu * 1000).astype("int64"),
            "std_milli": np.rint(sd * 1000).astype("int64"),
        }
    )


def clips_resample_stats(sf_dir: str):
    """Resample + RMS-normalize every clip to 16 kHz / -20 dBFS, then
    verify the transform's own invariants per codec over the TRANSFORMED
    table (which keeps the clips-table shape): every output sr is 16 kHz,
    duration drift vs the source metadata is < 2 ms, and achieved RMS is
    within 3 dB of target for non-clipping clips. A per-batch decode
    partial feeds a tiny codec groupby — bytes never shuffle (rows-only;
    resampler/normalizer unit properties are pytest-checked)."""
    import ray.data as rd
    from ray.data.aggregate import Max, Sum

    from schema_guru_ray.audio.wav import decode_wav
    from schema_guru_ray.sources.clips import ensure_clips
    from schema_guru_ray.stages.audio_transform import resample_clips

    path = ensure_clips(sf_dir)
    resampled = resample_clips(rd.read_parquet(path), sr_out=16000)

    def partial(t: pa.Table) -> pd.DataFrame:
        rows = []
        for codec, buf, sr_col, dur_col in zip(
            t["codec"].to_pylist(), t["bytes"].to_pylist(),
            t["sr_hz"].to_pylist(), t["dur_ms"].to_pylist(),
        ):
            try:
                pcm, sr = decode_wav(buf)
            except Exception:
                rows.append((codec, 1, 0, 1, 0.0))
                continue
            x = pcm.astype(np.float64) / 32768.0
            rms = float(np.sqrt(np.square(x).mean())) if len(x) else 0.0
            rms_db = 20.0 * np.log10(max(rms, 1e-9))
            dur_drift = abs(round(len(pcm) / sr * 1000.0) - dur_col)
            rows.append((codec, 1, int(sr != 16000 or sr_col != 16000),
                         dur_drift, abs(rms_db - (-20.0))))
        df = pd.DataFrame(
            rows, columns=["codec", "n", "bad_sr", "dur_drift_ms", "rms_err_db"]
        )
        return (
            df.groupby("codec", as_index=False)
            .agg(n=("n", "sum"), bad_sr=("bad_sr", "sum"),
                 max_dur_drift_ms=("dur_drift_ms", "max"),
                 max_rms_err_db=("rms_err_db", "max"))
        )

    return (
        resampled.map_batches(partial, batch_format="pyarrow")
        .groupby("codec")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("bad_sr", alias_name="bad_sr"),
            Max("max_dur_drift_ms", alias_name="max_dur_drift_ms"),
            Max("max_rms_err_db", alias_name="max_rms_err_db"),
        )
    )


def image_phash_dedup_documents(sf_dir: str):
    """Image near-dup pairs by 64-bit DCT perceptual hash over the
    synthetic media column (doc text bytes as payloads, fake decoder —
    real plumbing): actor-pool decode+hash, then the shared 16-bit-chunk
    pigeonhole pairing (exact for hamming ≤ 3). Identical payloads (the
    corpus' exact-dup docs) land at hamming 0. Rows-only: the fake decoder
    is environment-dependent by design; ground truth in
    tests/test_multimodal.py."""
    from schema_guru_ray.stages.multimodal import phash_dup_pairs

    ds = _read(sf_dir, "documents", ["doc_id", "text"])

    def to_media(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": b["doc_id"], "media": [t.encode() for t in b["text"]]}
        )

    media = ds.map_batches(to_media, batch_format="pandas")
    return phash_dup_pairs(media, max_hamming=3)


def clips_integrity(sf_dir: str):
    """Per-codec audio integrity report: clipping / silence / DC-offset /
    peak-level signals (stages/audio_features.py integrity_signals),
    integer-scaled per clip and merged with a partial-agg groupby (one row
    per batch × codec shuffles; bytes dropped in the decode stage).
    Rows-only: clips are engine-generated; ground truth in
    tests/test_audio_features.py."""
    from ray.data.aggregate import Max, Sum

    from schema_guru_ray.sources.clips import ensure_clips, read_clips
    from schema_guru_ray.stages.audio_features import audio_integrity

    path = ensure_clips(sf_dir)
    sig = audio_integrity(read_clips(path))

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = b.assign(
            n=1,
            n_undecodable=(~b["decodable"]).astype("int64"),
            n_clipped=(b["clip_ppm"] > 0).astype("int64"),
            abs_dc_milli=b["dc_milli"].abs(),
        )
        return b.groupby("codec", as_index=False).agg(
            n=("n", "sum"),
            n_undecodable=("n_undecodable", "sum"),
            n_clipped=("n_clipped", "sum"),
            max_clip_ppm=("clip_ppm", "max"),
            max_silence_ppm=("silence_ppm", "max"),
            max_abs_dc_milli=("abs_dc_milli", "max"),
            max_peak_dbfs_centi=("peak_dbfs_centi", "max"),
        )

    return (
        sig.map_batches(partial, batch_format="pandas")
        .groupby("codec")
        .aggregate(
            Sum("n", alias_name="n"),
            Sum("n_undecodable", alias_name="n_undecodable"),
            Sum("n_clipped", alias_name="n_clipped"),
            Max("max_clip_ppm", alias_name="max_clip_ppm"),
            Max("max_silence_ppm", alias_name="max_silence_ppm"),
            Max("max_abs_dc_milli", alias_name="max_abs_dc_milli"),
            Max("max_peak_dbfs_centi", alias_name="max_peak_dbfs_centi"),
        )
    )


def curate_clips_summary(sf_dir: str):
    """Flagship AUDIO curation chain (pipelines/curate_clips.py):
    validate-and-filter → exact dedup by clip_id → content near-dup
    removal → resample/normalize, reported as exact per-stage row counts.
    Rows-only (clips are engine-generated); stage ground truth in
    tests/test_curate_clips.py."""
    import ray.data as rd

    from schema_guru_ray.pipelines.curate_clips import curate_clips
    from schema_guru_ray.sources.clips import ensure_clips

    path = ensure_clips(sf_dir)
    _, summary = curate_clips(rd.read_parquet(path))
    return summary


def clips_content_dedup(sf_dir: str):
    """Content-based audio near-dup pairs: same-signal clips found via
    feature-vector LSH regardless of clip_id (rows-only)."""
    from schema_guru_ray.sources.clips import ensure_clips, read_clips
    from schema_guru_ray.stages.audio_features import content_dedup_pairs

    path = ensure_clips(sf_dir)
    return content_dedup_pairs(read_clips(path))


def repetition_documents(sf_dir: str):
    """Per-document repetition concentration (Gopher-rule family): integer
    counts of the most frequent token/bigram. Pure streaming map — no
    shuffle, per-batch vectorized numpy unique (stages/text.py
    RepetitionScorer)."""
    from schema_guru_ray.stages.text import RepetitionScorer

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    return docs.map_batches(RepetitionScorer(), batch_format="pandas")


REPETITION_DOCUMENTS_SQL = """
WITH toks AS (
    SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t FROM documents
),
uc AS (
    SELECT doc_id, tok, count(*) AS c
    FROM (SELECT doc_id, unnest(t) AS tok FROM toks) GROUP BY 1, 2
),
ustats AS (
    SELECT doc_id, count(*) AS n_distinct, max(c) AS top_token_n
    FROM uc GROUP BY 1
),
bc AS (
    SELECT doc_id, bg, count(*) AS c
    FROM (
        SELECT doc_id, t[i] || ' ' || t[i+1] AS bg
        FROM toks, UNNEST(range(1, len(t))) AS u(i)
        WHERE len(t) >= 2
    ) GROUP BY 1, 2
),
bstats AS (SELECT doc_id, max(c) AS top_bigram_n FROM bc GROUP BY 1)
SELECT toks.doc_id,
       CAST(len(t) AS BIGINT) AS n_tokens,
       CAST(coalesce(ustats.n_distinct, 0) AS BIGINT) AS n_distinct,
       CAST(coalesce(ustats.top_token_n, 0) AS BIGINT) AS top_token_n,
       CAST(coalesce(bstats.top_bigram_n, 0) AS BIGINT) AS top_bigram_n
FROM toks
LEFT JOIN ustats USING (doc_id)
LEFT JOIN bstats USING (doc_id)
"""


def users_active_both_halves(sf_dir: str):
    """Set intersection as a distributed flag-aggregate: users with events
    in BOTH halves of the corpus time range. One tiny Min/Max pass fixes
    the integer-microsecond midpoint, then a per-batch pre-aggregate emits
    ≤2 bool flags per (batch, user) and a groupby Max merges them — the
    shuffle moves flag rows, never events, and no distinct-list ever
    forms. Oracle: SQL INTERSECT over the same integer midpoint."""
    from ray.data.aggregate import Max, Min

    ds = _read(sf_dir, "events", ["user_id", "ts"])
    agg = ds.aggregate(Min("ts"), Max("ts"))
    mn = pd.Timestamp(agg["min(ts)"]).value // 1000
    mx = pd.Timestamp(agg["max(ts)"]).value // 1000
    mid = (mn + mx) // 2

    def partial(t: pa.Table) -> pd.DataFrame:
        us = t["ts"].cast(pa.int64()).to_numpy()
        df = pd.DataFrame(
            {
                "user_id": t["user_id"].to_numpy(),
                "f": (us < mid).astype("int64"),
                "s": (us >= mid).astype("int64"),
            }
        )
        return df.groupby("user_id", as_index=False).agg(
            f=("f", "max"), s=("s", "max")
        )

    both = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(Max("f", alias_name="f"), Max("s", alias_name="s"))
    )

    def final(t: pa.Table) -> pa.Table:
        keep = pc.and_(pc.equal(t["f"], 1), pc.equal(t["s"], 1))
        return pa.table({"user_id": t.filter(keep)["user_id"]})

    return both.map_batches(final, batch_format="pyarrow")


USERS_ACTIVE_BOTH_HALVES_SQL = """
WITH bounds AS (
    SELECT (min(epoch_us(ts)) + max(epoch_us(ts))) // 2 AS mid FROM events
)
SELECT user_id FROM events, bounds WHERE epoch_us(ts) < mid
INTERSECT
SELECT user_id FROM events, bounds WHERE epoch_us(ts) >= mid
"""


def left_join_customer_orders(sf_dir: str):
    """LEFT OUTER join through the bucketed hash join: every customer with
    their order count + revenue, customers WITHOUT orders kept with zero
    fill. The right side is pre-aggregated (per-batch partials → groupby
    Sum) before the join, so the exchange moves one row per customer, not
    per order; the null-fill happens post-join in a vectorized map, keeping
    the output non-nullable int64 end-to-end."""
    from ray.data.aggregate import Sum

    from schema_guru_ray.stages.joins import bucketed_hash_join

    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_custkey", "o_totalprice"])

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        b = pd.DataFrame(
            {
                "c_custkey": b["o_custkey"].astype("int64"),
                "n": 1,
                "cents": _int_units(b["o_totalprice"].to_numpy(), 100)
                .astype("int64")
                .to_numpy(),
            }
        )
        return b.groupby("c_custkey", as_index=False).agg(
            n=("n", "sum"), cents=("cents", "sum")
        )

    per_cust = (
        orders.map_batches(partial, batch_format="pandas")
        .groupby("c_custkey")
        .aggregate(Sum("n", alias_name="n"), Sum("cents", alias_name="cents"))
    ).materialize()  # small aggregate; the join's bucket-count derivation
    # calls .count() on both sides — without this the whole aggregate
    # pipeline would execute twice (measured 10.6s → 3.5s at sf0.01)
    joined = bucketed_hash_join(cust, per_cust, on="c_custkey", join_type="left")

    def fill(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "c_custkey": b["c_custkey"].astype("int64"),
                "n_orders": b["n"].fillna(0).astype("int64"),
                "revenue_cents": b["cents"].fillna(0).astype("int64"),
            }
        )

    return joined.map_batches(fill, batch_format="pandas")


LEFT_JOIN_CUSTOMER_ORDERS_SQL = """
SELECT c.c_custkey,
       CAST(coalesce(o.n, 0) AS BIGINT) AS n_orders,
       CAST(coalesce(o.cents, 0) AS BIGINT) AS revenue_cents
FROM customer c
LEFT JOIN (
    SELECT o_custkey, count(*) AS n,
           sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS cents
    FROM orders GROUP BY 1
) o ON c.c_custkey = o.o_custkey
"""


def cluster_assign_embeddings(sf_dir: str, k: int = 8):
    """Nearest-centroid assignment with integer-milli quantized dot
    products (stages/cluster.py): centroids are the embeddings of the 8
    smallest vec_ids; every product/sum is int64-exact so the argmax (and
    its tie-break to the lowest centroid id) is bit-deterministic and the
    DuckDB ``list_dot_product`` oracle replays it exactly. Centroid matrix
    broadcast once; corpus pass is shuffle-free."""
    from schema_guru_ray.stages.cluster import assign_to_centroids

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    seed = emb.sort("vec_id").limit(k).take_all()
    cids = np.array([r["vec_id"] for r in seed], dtype=np.int64)
    cvecs = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in seed])
    return assign_to_centroids(emb, cids, cvecs)


CLUSTER_ASSIGN_EMBEDDINGS_SQL = """
WITH q AS (
    SELECT vec_id,
           list_transform(embedding,
                          x -> CAST(floor(x * 1000 + 0.5) AS BIGINT)) AS e
    FROM embeddings
),
cents AS (SELECT vec_id AS cid, e AS ce FROM q ORDER BY vec_id LIMIT 8),
sims AS (
    SELECT q.vec_id, cents.cid,
           CAST(list_dot_product(q.e, cents.ce) AS BIGINT) AS dp
    FROM q, cents
)
SELECT vec_id, CAST(cid AS BIGINT) AS cluster_id, dp AS dot_milli2
FROM (
    SELECT vec_id, cid, dp,
           row_number() OVER (PARTITION BY vec_id ORDER BY dp DESC, cid) AS rn
    FROM sims
)
WHERE rn = 1
"""


def kmeans_embeddings(sf_dir: str):
    """Distributed Lloyd k-means over the embeddings table (rows-only:
    iterative float algorithm, not SQL-expressible) — per-cluster sizes
    after 5 rounds from the deterministic lowest-id init. pytest checks
    inertia monotonicity and exact agreement with a driver-side numpy
    reference on separated blobs."""
    from schema_guru_ray.stages.cluster import kmeans_summary

    emb = _read(sf_dir, "embeddings", ["vec_id", "embedding"])
    return kmeans_summary(emb, k=8, iters=5)


def scrub_pii_documents(sf_dir: str):
    """PII redaction over the documents table. The synthetic corpus carries
    no PII, so the query first APPENDS deterministic doc_id-keyed PII
    (email / dotted-quad / long number, each present for a different
    doc_id residue class) — replayed identically by the SQL oracle — then
    runs the real vectorized scrub stage (stages/text.py PiiScrubber).
    Output is redaction counts + an md5 of the scrubbed text so the oracle
    checks the rewritten bytes, not just the counts."""
    import hashlib

    from schema_guru_ray.stages.text import PiiScrubber

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def augment(b: pd.DataFrame) -> pd.DataFrame:
        ids = b["doc_id"].astype("int64")
        sid = ids.astype(str)
        email = (" u" + sid + "@mail.example").where(ids % 3 > 0, "")
        ip = (" from 10." + (ids % 200).astype(str) + ".0."
              + (ids % 250).astype(str)).where(ids % 2 == 0, "")
        num = (" ref " + (10000000 + ids).astype(str)).where(ids % 5 > 0, "")
        return pd.DataFrame(
            {"doc_id": ids, "text": b["text"].fillna("") + email + ip + num}
        )

    scrubbed = docs.map_batches(augment, batch_format="pandas").map_batches(
        PiiScrubber(), batch_format="pandas"
    )

    def digest(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "n_emails": b["n_emails"],
                "n_ips": b["n_ips"],
                "n_nums": b["n_nums"],
                "scrubbed_md5": [
                    hashlib.md5(s.encode()).hexdigest() for s in b["scrubbed"]
                ],
            }
        )

    return scrubbed.map_batches(digest, batch_format="pandas")


SCRUB_PII_DOCUMENTS_SQL = """
WITH aug AS (
    SELECT doc_id,
           text
           || CASE WHEN doc_id % 3 > 0
                   THEN ' u' || doc_id || '@mail.example' ELSE '' END
           || CASE WHEN doc_id % 2 = 0
                   THEN ' from 10.' || (doc_id % 200) || '.0.' || (doc_id % 250)
                   ELSE '' END
           || CASE WHEN doc_id % 5 > 0
                   THEN ' ref ' || (10000000 + doc_id) ELSE '' END AS t
    FROM documents
),
s1 AS (
    SELECT doc_id, t,
           regexp_replace(t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}',
                          '[EMAIL]', 'g') AS r1
    FROM aug
),
s2 AS (
    SELECT doc_id, t, r1,
           regexp_replace(r1, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b',
                          '[IP]', 'g') AS r2
    FROM s1
)
SELECT doc_id,
       CAST(len(regexp_extract_all(
           t, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}')) AS BIGINT)
           AS n_emails,
       CAST(len(regexp_extract_all(
           r1, '\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b')) AS BIGINT)
           AS n_ips,
       CAST(len(regexp_extract_all(r2, '\\d{7,}')) AS BIGINT) AS n_nums,
       md5(regexp_replace(r2, '\\d{7,}', '[NUM]', 'g')) AS scrubbed_md5
FROM s2
"""


def decontaminate_documents(sf_dir: str, n: int = 3):
    """Benchmark n-gram decontamination: docs with ``doc_id % 97 == 0``
    stand in for the benchmark suite; every other document is flagged with
    its count of DISTINCT shared token n-grams. The benchmark gram set is
    built once and broadcast (``ray.put``); the corpus pass is a pure
    streaming map — no shuffle (stages/contamination.py). n=3 here because
    the synthetic vocabulary is tiny; real deployments use 8–13."""
    from schema_guru_ray.stages.contamination import (
        build_benchmark_grams,
        flag_contaminated,
    )

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def _mod_split(t: pa.Table, keep_bench: bool) -> pa.Table:
        mask = (t["doc_id"].to_numpy() % 97) == 0
        return t.filter(pa.array(mask if keep_bench else ~mask))

    bench = docs.map_batches(
        _mod_split, fn_kwargs=dict(keep_bench=True), batch_format="pyarrow"
    )
    corpus = docs.map_batches(
        _mod_split, fn_kwargs=dict(keep_bench=False), batch_format="pyarrow"
    )
    grams = build_benchmark_grams(bench, n)
    return flag_contaminated(corpus, grams, n)


DECONTAMINATE_DOCUMENTS_SQL = """
WITH toks AS (
    SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t FROM documents
),
grams AS (
    SELECT doc_id, array_to_string(t[i:i+2], ' ') AS g
    FROM toks, UNNEST(range(1, len(t) - 1)) AS u(i)
    WHERE len(t) >= 3
),
bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0),
hits AS (
    SELECT dg.doc_id, count(*) AS n_hits
    FROM (SELECT DISTINCT doc_id, g FROM grams WHERE doc_id % 97 <> 0) dg
    JOIN bench USING (g)
    GROUP BY 1
)
SELECT d.doc_id,
       CAST(coalesce(h.n_hits, 0) AS BIGINT) AS n_hits,
       CAST(coalesce(h.n_hits, 0) > 0 AS BIGINT) AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % 97 <> 0
"""


def _revenue_by_region_broadcast(sf_dir: str, nk_to_region: dict):
    """Broadcast regime of :func:`revenue_by_region`: build the
    orderkey → region-code lookup once on the driver from SLIM projections
    (two int64/int8 arrays, sorted for ``searchsorted``), ship it via
    ``ray.put``, and stream lineitem through one map + partial aggregate.
    Orphan order keys (custkey not in customer — the referential_orphans
    case) miss the lookup and are dropped, matching the oracle's inner
    join.

    The broadcast-side tables are read with PLAIN pyarrow on the driver —
    by the regime's own precondition they fit in driver memory, and a Ray
    read of a 15k-row dimension costs ~2 s of task/consolidation overhead
    vs ~20 ms for ``pq.read_table`` (measured sf0.1)."""
    import pyarrow.dataset as pads
    import pyarrow.parquet as pq
    import ray

    from ray.data.aggregate import Sum

    region_names = sorted(set(nk_to_region.values()))
    code_of = {r: i for i, r in enumerate(region_names)}

    cust = pq.read_table(
        os.path.join(sf_dir, "customer.parquet"),
        columns=["c_custkey", "c_nationkey"],
    )
    ckeys = cust["c_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    nk = cust["c_nationkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    uniq, inv = np.unique(nk, return_inverse=True)
    ccodes = np.array(
        [code_of[nk_to_region[int(k)]] for k in uniq], dtype=np.int8
    )[inv]
    order_c = np.argsort(ckeys, kind="stable")
    ckeys, ccodes = ckeys[order_c], ccodes[order_c]

    orders = pq.read_table(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey"],
        filters=(
            (pads.field("o_orderdate") >= pa.scalar(pd.Timestamp("1996-01-01")))
            & (pads.field("o_orderdate") < pa.scalar(pd.Timestamp("1997-01-01")))
        ),
    )
    okeys = orders["o_orderkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    ocust = orders["o_custkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    idx, hit = sorted_lookup(ckeys, ocust)
    okeys, ocodes = okeys[hit], ccodes[idx[hit]]
    order_o = np.argsort(okeys, kind="stable")
    lut_ref = ray.put((okeys[order_o], ocodes[order_o]))
    n_regions = len(region_names)

    def partial(t: pa.Table) -> pa.Table:
        keys, codes = ray.get(lut_ref)
        k = t["l_orderkey"].to_numpy(zero_copy_only=False)
        i, hit = sorted_lookup(keys, k)
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)[hit]
        disc = t["l_discount"].to_numpy(zero_copy_only=False)[hit]
        rev = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
        code = codes[i[hit]]
        sums = np.zeros(n_regions, np.int64)
        np.add.at(sums, code, rev)
        counts = np.bincount(code, minlength=n_regions)
        nz = counts > 0
        return pa.table(
            {
                "r_name": pa.array(
                    [region_names[j] for j in np.flatnonzero(nz)], pa.string()
                ),
                "revenue_cents": pa.array(sums[nz], pa.int64()),
                "n": pa.array(counts[nz].astype(np.int64), pa.int64()),
            }
        )

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]
    )
    return li.map_batches(partial, batch_format="pyarrow").groupby(
        "r_name"
    ).aggregate(
        Sum("revenue_cents", alias_name="revenue_cents"),
        Sum("n", alias_name="n"),
    )


def revenue_by_region(sf_dir: str, broadcast_limit: int = 5_000_000):
    """TPC-H Q5-style multi-way join chain: region ⨝ nation ⨝ customer ⨝
    orders ⨝ lineitem → revenue per region for one order year.

    TWO REGIMES (the referential_orphans pattern), chosen from parquet
    footer row counts:

    * **Broadcast** (orders AND customer ≤ ``broadcast_limit`` rows): the
      orderkey → region-code map is built once from slim driver-side
      projections (int64 keys + int8 codes, sorted-array ``searchsorted``
      lookup) and shipped via ``ray.put``; lineitem streams through ONE
      pure map + partial aggregate — zero shuffles of fact data. Measured
      8.8 s → ~1 s at sf0.1 over the bucketed path.
    * **Bucketed** (either side too big to broadcast): the two TINY
      dimensions (region×nation) broadcast and annotate customer in a pure
      map; the two genuinely big-big joins (orders ⨝ customer on custkey,
      lineitem ⨝ orders on orderkey) run as bucketed hash joins over SLIM
      projections — the fact columns never ride through a shuffle they
      don't need.

    In both regimes the date filter is pushed into the parquet read
    (row-group pruning) and the final aggregate is partial-per-batch
    (integer cents) before a ≤|regions|-row groupby."""
    import pyarrow.parquet as pq
    import ray

    # ≤ a-few-hundred-row dimensions: plain pyarrow driver reads (a Ray
    # read of a tiny table is ~2 s of pure overhead)
    nation = pq.read_table(
        os.path.join(sf_dir, "nation.parquet"),
        columns=["n_nationkey", "n_regionkey"],
    ).to_pandas()
    region = pq.read_table(
        os.path.join(sf_dir, "region.parquet"),
        columns=["r_regionkey", "r_name"],
    ).to_pandas()
    nk_to_region = dict(
        zip(
            nation["n_nationkey"].astype("int64"),
            region.set_index("r_regionkey")["r_name"].reindex(
                nation["n_regionkey"]
            ).to_numpy(),
        )
    )
    if (
        _meta_rows(sf_dir, "orders") <= broadcast_limit
        and _meta_rows(sf_dir, "customer") <= broadcast_limit
    ):
        return _revenue_by_region_broadcast(sf_dir, nk_to_region)
    nk_ref = ray.put(nk_to_region)

    def tag_customer(t: pa.Table) -> pa.Table:
        m = ray.get(nk_ref)
        nk = t["c_nationkey"].to_numpy(zero_copy_only=False)
        uniq, inv = np.unique(nk, return_inverse=True)
        names = np.array([m[int(k)] for k in uniq], dtype=object)[inv]
        return pa.table(
            {
                "o_custkey": t["c_custkey"],  # join-key name shared with orders
                "r_name": pa.array(names, type=pa.string()),
            }
        )

    cust = _read(sf_dir, "customer", ["c_custkey", "c_nationkey"]).map_batches(
        tag_customer, batch_format="pyarrow"
    )

    import pyarrow.dataset as pads
    import ray.data as rd

    orders = rd.read_parquet(
        os.path.join(sf_dir, "orders.parquet"),
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
        filter=(
            (pads.field("o_orderdate") >= pa.scalar(pd.Timestamp("1996-01-01")))
            & (pads.field("o_orderdate") < pa.scalar(pd.Timestamp("1997-01-01")))
        ),
    ).select_columns(["o_orderkey", "o_custkey"])

    from schema_guru_ray.stages.joins import bucketed_hash_join, derive_num_buckets

    # bucket counts from parquet FOOTER row counts — a .count() on these
    # derived sides would execute the filter/tag plans once extra
    nb1 = derive_num_buckets(_meta_rows(sf_dir, "orders") + _meta_rows(sf_dir, "customer"))
    nb2 = derive_num_buckets(_meta_rows(sf_dir, "lineitem") + _meta_rows(sf_dir, "orders"))

    # orders ⨝ customer on o_custkey → (o_orderkey, r_name); rename the
    # order key to the lineitem join-key name before the second join
    orders_region = bucketed_hash_join(
        orders, cust, on="o_custkey", num_buckets=nb1
    ).select_columns(["o_orderkey", "r_name"])

    def _rekey(t: pa.Table) -> pa.Table:
        return t.rename_columns(["l_orderkey", "r_name"])

    orders_region = orders_region.map_batches(_rekey, batch_format="pyarrow")

    li = _read(
        sf_dir, "lineitem", ["l_orderkey", "l_extendedprice", "l_discount"]
    )
    # schema HINT for the derived right side: its plan contains the first
    # join's all-to-all, so ds.schema() would execute that whole shuffle
    # once just for type inference
    joined = bucketed_hash_join(
        li, orders_region, on="l_orderkey", num_buckets=nb2,
        right_schema=pa.schema(
            [("l_orderkey", pa.int64()), ("r_name", pa.string())]
        ),
    )

    def partial(t: pa.Table) -> pa.Table:
        rev = pc.cast(
            pc.floor(
                pc.add(
                    pc.multiply(
                        pc.multiply(
                            t["l_extendedprice"],
                            pc.subtract(pa.scalar(1.0), t["l_discount"]),
                        ),
                        100.0,
                    ),
                    0.5,
                )
            ),
            pa.int64(),
        )
        g = (
            pa.table({"r_name": t["r_name"], "revenue_cents": rev})
            .group_by("r_name")
            .aggregate(
                [("revenue_cents", "sum"),
                 ("revenue_cents", "count", pc.CountOptions(mode="all"))]
            )
        )
        return g.rename_columns(["r_name", "revenue_cents", "n"])

    partials = joined.map_batches(partial, batch_format="pyarrow")
    from ray.data.aggregate import Sum

    return partials.groupby("r_name").aggregate(
        Sum("revenue_cents", alias_name="revenue_cents"),
        Sum("n", alias_name="n"),
    )


REVENUE_BY_REGION_SQL = """
SELECT r_name,
       CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT))
            AS BIGINT) AS revenue_cents,
       count(*) AS n
FROM region
JOIN nation   ON n_regionkey = r_regionkey
JOIN customer ON c_nationkey = n_nationkey
JOIN orders   ON o_custkey   = c_custkey
JOIN lineitem ON l_orderkey  = o_orderkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1997-01-01'
GROUP BY r_name
"""


def grouped_median_quantity(sf_dir: str):
    """Per-group EXACT discrete percentiles (SQL ``percentile_disc``) of
    l_quantity by return flag. 100-TB shape: the raw column never shuffles —
    each batch emits (group, value) → count partials via Arrow C++
    group_by, the groupby merges ≤ |groups|×|distinct| count rows, and the
    percentile selection runs per group inside map_groups over sorted
    cumulative counts with INTEGER threshold comparisons
    (``cum*b ≥ n*a`` for q=a/b — no float cumulative-distribution
    edge cases). Only works this cheaply because l_quantity is
    low-cardinality; high-cardinality columns route to the KLL sketch
    (approx_quantiles) or the 3-pass bin refinement
    (quantile_buckets)."""
    ds = _read(sf_dir, "lineitem", ["l_returnflag", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        qty = pc.cast(pc.floor(pc.add(t["l_quantity"], 0.5)), pa.int64())
        g = (
            pa.table({"l_returnflag": t["l_returnflag"], "qty": qty})
            .group_by(["l_returnflag", "qty"])
            .aggregate([("qty", "count", pc.CountOptions(mode="all"))])
        )
        return g.rename_columns(["l_returnflag", "qty", "cnt"])

    from ray.data.aggregate import Sum

    counts = (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby(["l_returnflag", "qty"])
        .aggregate(Sum("cnt", alias_name="cnt"))
    )

    def pick(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("qty")
        cum = g["cnt"].to_numpy().cumsum()
        n = int(cum[-1])
        vals = g["qty"].to_numpy()

        def disc(a: int, b: int) -> int:
            # percentile_disc(a/b): first value with cum_dist >= a/b
            return int(vals[np.searchsorted(cum * b, n * a, side="left")])

        return pd.DataFrame(
            {
                "l_returnflag": [g["l_returnflag"].iloc[0]],
                "q25": [disc(1, 4)],
                "median": [disc(1, 2)],
                "q75": [disc(3, 4)],
            }
        )

    return counts.groupby("l_returnflag").map_groups(pick, batch_format="pandas")


GROUPED_MEDIAN_QUANTITY_SQL = """
SELECT l_returnflag,
       CAST(percentile_disc(0.25) WITHIN GROUP
            (ORDER BY CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q25,
       CAST(percentile_disc(0.5) WITHIN GROUP
            (ORDER BY CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS median,
       CAST(percentile_disc(0.75) WITHIN GROUP
            (ORDER BY CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q75
FROM lineitem
GROUP BY l_returnflag
"""


def rolling_revenue_customer(sf_dir: str, window_days: int = 7):
    """Per-customer trailing 7-day revenue at every order (SQL ``RANGE
    BETWEEN INTERVAL 7 DAY PRECEDING AND CURRENT ROW`` — peer rows with the
    SAME date are all included, unlike a ROWS window). One
    partitioned_window pass: hash-bucket by customer, sort
    (custkey, date) inside the bucket, then a FUSED-KEY searchsorted over
    the whole bucket — ``custkey * 2^21 + day`` packs (customer, day) into
    one sortable int64 (valid while day-since-epoch < 2^21 ≈ year 7700 and
    custkey < 2^42), so the per-row window bounds come from two vectorized
    searchsorted calls over the bucket, not a per-customer Python loop.
    o_orderdate is date-granular (midnight timestamps), so day encoding is
    exact."""
    from schema_guru_ray.stages.joins import partitioned_window

    orders = _read(
        sf_dir, "orders", ["o_custkey", "o_orderkey", "o_orderdate", "o_totalprice"]
    )

    def trailing(g: pd.DataFrame) -> pd.DataFrame:
        # g sorted by (o_custkey, o_orderdate); searchsorted needs the fused
        # key monotone within the frame, which (custkey, day) sort gives
        days = (
            g["o_orderdate"].to_numpy().astype("datetime64[D]").astype(np.int64)
        )
        cust = g["o_custkey"].to_numpy().astype(np.int64)
        # days must be non-negative too: a pre-1970 date would make the
        # fused key non-monotone and silently corrupt the trailing windows
        assert (days >= 0).all() and (days < (1 << 21)).all() and (cust < (1 << 42)).all()
        fused = cust * (1 << 21) + days
        cents = _int_units(g["o_totalprice"].to_numpy(), 100).to_numpy(np.int64)
        prefix = np.concatenate([[0], cents.cumsum()])
        lo = np.searchsorted(fused, cust * (1 << 21) + (days - window_days), "left")
        hi = np.searchsorted(fused, fused, "right")
        return pd.DataFrame(
            {
                "o_orderkey": g["o_orderkey"].astype("int64"),
                "trailing_cents": (prefix[hi] - prefix[lo]).astype("int64"),
                "n_in_window": (hi - lo).astype("int64"),
            }
        )

    return partitioned_window(
        orders, "o_custkey", ["o_orderdate"], trailing,
        n_rows=_meta_rows(sf_dir, "orders"),
    )


ROLLING_REVENUE_CUSTOMER_SQL = """
SELECT o_orderkey,
       CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) OVER w AS BIGINT)
           AS trailing_cents,
       CAST(count(*) OVER w AS BIGINT) AS n_in_window
FROM orders
WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate
             RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
"""


def nation_balance_full_outer(sf_dir: str):
    """FULL OUTER join of two independently-aggregated sides: per-nation
    high-balance customer totals vs per-nation high-balance supplier
    totals. The thresholds are chosen so BOTH sides have nations the other
    lacks at every test scale — the join must synthesize rows from each
    unmatched side (COALESCE key + zero-fill). 100-TB shape: both sides
    pre-aggregate to ≤ |nations| rows via batch partials before the join;
    the outer join itself is the bucketed tagged-union pattern with pandas
    ``how='outer'`` inside the bucket."""
    from ray.data.aggregate import Sum

    from schema_guru_ray.stages.joins import bucketed_hash_join

    def agg_side(table: str, key: str, bal: str, thresh: float, prefix: str):
        ds = _read(sf_dir, table, [key, bal])

        def partial(t: pa.Table) -> pa.Table:
            keep = pc.greater(t[bal], pa.scalar(thresh))
            t = t.filter(keep)
            cents = pc.cast(
                pc.floor(pc.add(pc.multiply(t[bal], 100.0), 0.5)), pa.int64()
            )
            g = (
                pa.table({"nationkey": pc.cast(t[key], pa.int64()), "c": cents})
                .group_by("nationkey")
                .aggregate(
                    [("c", "sum"), ("c", "count", pc.CountOptions(mode="all"))]
                )
            )
            return g.rename_columns(
                ["nationkey", f"{prefix}_cents", f"n_{prefix}"]
            )

        return ds.map_batches(partial, batch_format="pyarrow").groupby(
            "nationkey"
        ).aggregate(
            Sum(f"{prefix}_cents", alias_name=f"{prefix}_cents"),
            Sum(f"n_{prefix}", alias_name=f"n_{prefix}"),
        )

    cust = agg_side("customer", "c_nationkey", "c_acctbal", 9900.0, "cust")
    supp = agg_side("supplier", "s_nationkey", "s_acctbal", 5000.0, "supp")
    # both sides are ≤|nations|-row aggregates; explicit tiny bucket count
    # and schema hints (a .count()/.schema() here would execute each
    # aggregate once extra — their plans end in an all-to-all)
    joined = bucketed_hash_join(
        cust, supp, on="nationkey", join_type="outer", num_buckets=8,
        left_schema=pa.schema(
            [("nationkey", pa.int64()), ("cust_cents", pa.int64()),
             ("n_cust", pa.int64())]
        ),
        right_schema=pa.schema(
            [("nationkey", pa.int64()), ("supp_cents", pa.int64()),
             ("n_supp", pa.int64())]
        ),
    )

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        out = pd.DataFrame({"nationkey": b["nationkey"].astype("int64")})
        for c in ("n_cust", "cust_cents", "n_supp", "supp_cents"):
            out[c] = b[c].fillna(0).astype("int64")
        return out

    return joined.map_batches(finish, batch_format="pandas")


NATION_BALANCE_FULL_OUTER_SQL = """
WITH c AS (
    SELECT CAST(c_nationkey AS BIGINT) AS nationkey,
           count(*) AS n_cust,
           sum(CAST(round(c_acctbal * 100) AS BIGINT)) AS cust_cents
    FROM customer WHERE c_acctbal > 9900 GROUP BY 1
), s AS (
    SELECT CAST(s_nationkey AS BIGINT) AS nationkey,
           count(*) AS n_supp,
           sum(CAST(round(s_acctbal * 100) AS BIGINT)) AS supp_cents
    FROM supplier WHERE s_acctbal > 5000 GROUP BY 1
)
SELECT COALESCE(c.nationkey, s.nationkey) AS nationkey,
       CAST(COALESCE(c.n_cust, 0) AS BIGINT) AS n_cust,
       CAST(COALESCE(c.cust_cents, 0) AS BIGINT) AS cust_cents,
       CAST(COALESCE(s.n_supp, 0) AS BIGINT) AS n_supp,
       CAST(COALESCE(s.supp_cents, 0) AS BIGINT) AS supp_cents
FROM c FULL OUTER JOIN s USING (nationkey)
"""


def edit_distance_adjacent_docs(sf_dir: str, cap: int = 48):
    """Levenshtein edit distance over document pairs (here: adjacent
    doc_ids, a deterministic SQL-expressible pairing; production pairs
    come from the near-dup candidate stage). The distance kernel is the
    classic DP VECTORIZED ACROSS THE PAIR BATCH — a (cap×cap) loop of
    O(batch) numpy ops, not a per-pair Python loop — on texts truncated to
    ``cap`` characters (SQL substr parity). The pairing join ships only
    (doc_id, 48-char prefix) slim projections through one bucketed hash
    join."""
    from schema_guru_ray.stages.text import batch_levenshtein

    from schema_guru_ray.stages.joins import bucketed_hash_join

    docs = _read(sf_dir, "documents", ["doc_id", "text"])

    def left_side(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pair_key": pc.add(t["doc_id"], pa.scalar(1, pa.int64())),
                "doc_a": t["doc_id"],
                "text_a": pc.utf8_slice_codeunits(t["text"], 0, cap),
            }
        )

    def right_side(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "pair_key": t["doc_id"],
                "text_b": pc.utf8_slice_codeunits(t["text"], 0, cap),
            }
        )

    from schema_guru_ray.stages.joins import derive_num_buckets

    left = docs.map_batches(left_side, batch_format="pyarrow")
    right = docs.map_batches(right_side, batch_format="pyarrow")
    pairs = bucketed_hash_join(
        left, right, on="pair_key",
        num_buckets=derive_num_buckets(2 * _meta_rows(sf_dir, "documents")),
    )

    def dist(b: pd.DataFrame) -> pd.DataFrame:
        # utf-8 bytes: DuckDB levenshtein() is byte-unit over UTF-8
        d = batch_levenshtein(
            [s.encode("utf-8") for s in b["text_a"]],
            [s.encode("utf-8") for s in b["text_b"]],
        )
        return pd.DataFrame(
            {
                "doc_a": b["doc_a"].astype("int64"),
                "doc_b": b["pair_key"].astype("int64"),
                "dist": d.astype("int64"),
            }
        )

    return pairs.map_batches(dist, batch_format="pandas")


EDIT_DISTANCE_ADJACENT_DOCS_SQL = """
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       CAST(levenshtein(substr(a.text, 1, 48), substr(b.text, 1, 48))
            AS BIGINT) AS dist
FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
"""


def order_priority_exists(sf_dir: str, broadcast_limit: int = 5_000_000):
    """TPC-H Q4 shape: count orders per priority where EXISTS a returned
    lineitem (l_returnflag = 'R'). TWO REGIMES from the orders footer row
    count (the distinct qualifying key set is bounded by |orders|):

    * **Broadcast semi-filter** (orders ≤ ``broadcast_limit``): per-batch
      ``pc.unique`` partials collect to a sorted driver key array shipped
      via ``ray.put``; orders stream through one vectorized
      ``searchsorted`` membership filter + partial count — no shuffle of
      either table.
    * **Distributed semi-join** (orders too big): distinct keys via a Count
      groupby (each key crosses the exchange once no matter how many
      lineitems match) → bucketed hash join with a schema hint (the key
      side's plan ends in an all-to-all; ``ds.schema()`` would run it
      once extra).

    Both push the returnflag filter into the parquet read and count
    partial-per-batch."""
    import pyarrow.dataset as pads
    import ray
    import ray.data as rd

    from ray.data.aggregate import Count, Sum

    from schema_guru_ray.stages.joins import bucketed_hash_join, derive_num_buckets

    li = rd.read_parquet(
        os.path.join(sf_dir, "lineitem.parquet"),
        columns=["l_orderkey"],
        filter=(pads.field("l_returnflag") == "R"),
    )

    def uniq(t: pa.Table) -> pa.Table:
        return pa.table({"o_orderkey": pc.unique(t["l_orderkey"])})

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_orderpriority"])

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.select(["o_orderpriority"])
            .group_by("o_orderpriority")
            .aggregate([("o_orderpriority", "count", pc.CountOptions(mode="all"))])
        )
        return g.rename_columns(["o_orderpriority", "n_orders"])

    if _meta_rows(sf_dir, "orders") <= broadcast_limit:
        parts = li.map_batches(uniq, batch_format="pyarrow").to_pandas()
        keys = np.unique(parts["o_orderkey"].to_numpy(np.int64))
        ref = ray.put(keys)

        def semi(t: pa.Table) -> pa.Table:
            k = ray.get(ref)
            v = t["o_orderkey"].to_numpy(zero_copy_only=False)
            i, hit = sorted_lookup(k, v)
            return partial(t.filter(pa.array(hit)))

        return (
            orders.map_batches(semi, batch_format="pyarrow")
            .groupby("o_orderpriority")
            .aggregate(Sum("n_orders", alias_name="n_orders"))
        )

    # one row per distinct qualifying order key (semi-join key set)
    keys = (
        li.map_batches(uniq, batch_format="pyarrow")
        .groupby("o_orderkey")
        .aggregate(Count(alias_name="__c"))
        .select_columns(["o_orderkey"])
    )

    nb = derive_num_buckets(2 * _meta_rows(sf_dir, "orders"))
    joined = bucketed_hash_join(
        orders, keys, on="o_orderkey", num_buckets=nb,
        right_schema=pa.schema([("o_orderkey", pa.int64())]),
    )

    return (
        joined.map_batches(partial, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n_orders", alias_name="n_orders"))
    )


ORDER_PRIORITY_EXISTS_SQL = """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders
WHERE EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
GROUP BY o_orderpriority
"""


def customer_order_distribution(sf_dir: str, broadcast_limit: int = 5_000_000):
    """TPC-H Q13 shape: the distribution-of-a-distribution — how many
    customers placed exactly k orders, INCLUDING k = 0. Orders pre-aggregate
    to one (custkey, count) row per customer (the exchange moves one row per
    customer, never per order); the zero-fill join then has TWO REGIMES on
    the materialized count-side size: ≤ ``broadcast_limit`` ordering
    customers → sorted-array lookup broadcast into a customer map; larger →
    bucketed LEFT join. The outer distribution is another partial-per-batch
    count whose final groupby has ≤ max-orders-per-customer rows."""
    from ray.data.aggregate import Sum

    from schema_guru_ray.stages.joins import bucketed_hash_join, derive_num_buckets

    cust = _read(sf_dir, "customer", ["c_custkey"])
    orders = _read(sf_dir, "orders", ["o_custkey"])

    def per_cust(t: pa.Table) -> pa.Table:
        g = (
            t.group_by("o_custkey")
            .aggregate([("o_custkey", "count", pc.CountOptions(mode="all"))])
        )
        return g.rename_columns(["c_custkey", "c_count"])

    # coarse-bucket merge of the per-batch partials (one vectorized pandas
    # sum per ~250k-customer reducer group) instead of a 1-group-per-
    # customer sort aggregate
    nbk = max(8, _meta_rows(sf_dir, "customer") // 250_000 + 1)

    def tagk(t: pa.Table) -> pa.Table:
        b = (t["c_custkey"].to_numpy(zero_copy_only=False) % nbk).astype(np.int32)
        return t.append_column("__b", pa.array(b, pa.int32()))

    def sum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("c_custkey", as_index=False)["c_count"].sum()
        return s.astype({"c_custkey": "int64", "c_count": "int64"})

    counts = (
        orders.map_batches(per_cust, batch_format="pyarrow")
        .map_batches(tagk, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(sum_bucket, batch_format="pandas")
        .materialize()  # one row per ordering customer; counting is free
    )

    if counts.count() <= broadcast_limit:
        # broadcast regime: custkey → order-count sorted lookup; customers
        # stream through one vectorized map (zero-fill on miss) — the only
        # shuffle left is the ≤ max-orders-per-customer-row distribution
        import ray

        cc = counts.to_pandas()
        keys = cc["c_custkey"].to_numpy(np.int64)
        vals = cc["c_count"].to_numpy(np.int64)
        order = np.argsort(keys, kind="stable")
        lut_ref = ray.put((keys[order], vals[order]))

        def bdist(t: pa.Table) -> pd.DataFrame:
            k_arr, v_arr = ray.get(lut_ref)
            v = t["c_custkey"].to_numpy(zero_copy_only=False)
            i, hit = sorted_lookup(k_arr, v)
            k = np.where(hit, v_arr[i], 0)
            u, n = np.unique(k, return_counts=True)
            return pd.DataFrame(
                {"c_count": u.astype("int64"), "n_cust": n.astype("int64")}
            )

        return (
            cust.map_batches(bdist, batch_format="pyarrow")
            .groupby("c_count")
            .aggregate(Sum("n_cust", alias_name="n_cust"))
        )

    nb = derive_num_buckets(_meta_rows(sf_dir, "customer") + counts.count())
    joined = bucketed_hash_join(cust, counts, on="c_custkey",
                                join_type="left", num_buckets=nb)

    def dist_partial(b: pd.DataFrame) -> pd.DataFrame:
        k = b["c_count"].fillna(0).astype("int64")
        out = k.value_counts().reset_index()
        out.columns = ["c_count", "n_cust"]
        return out.astype({"c_count": "int64", "n_cust": "int64"})

    return (
        joined.map_batches(dist_partial, batch_format="pandas")
        .groupby("c_count")
        .aggregate(Sum("n_cust", alias_name="n_cust"))
    )


CUSTOMER_ORDER_DISTRIBUTION_SQL = """
WITH per_cust AS (
    SELECT c_custkey, count(o_orderkey) AS c_count
    FROM customer LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
)
SELECT CAST(c_count AS BIGINT) AS c_count, count(*) AS n_cust
FROM per_cust GROUP BY c_count
"""


def promo_revenue(sf_dir: str, broadcast_limit: int = 20_000_000):
    """TPC-H Q14 shape: conditional aggregation across a join — the share of
    revenue from PROMO parts, as one global row. TWO REGIMES on the part
    footer row count:

    * **Broadcast** (part ≤ ``broadcast_limit``): the part side reduces to
      a sorted int64 key array + bool flag array (9 bytes/part — 20M parts
      ≈ 180 MB, one ``ray.put``); lineitem streams through one vectorized
      ``searchsorted`` lookup + 2-int partial — zero shuffles.
    * **Bucketed** (part too big): a SLIM (partkey, is_promo:bool)
      projection through the bucketed join.

    Revenue is integer cents with the CASE folded into the per-batch
    partial, so the final exchange is one 2-int row per batch; the ratio is
    integer basis points (floor division) for bit-exact oracle
    comparison."""
    import ray

    from ray.data.aggregate import Sum

    from schema_guru_ray.stages.joins import bucketed_hash_join, derive_num_buckets

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_extendedprice", "l_discount"])

    if _meta_rows(sf_dir, "part") <= broadcast_limit:
        import pyarrow.parquet as pq

        part_t = pq.read_table(
            os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_type"]
        )
        pkeys = part_t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        promo = pc.starts_with(part_t["p_type"], "PROMO").to_numpy(
            zero_copy_only=False
        )
        order = np.argsort(pkeys, kind="stable")
        lut_ref = ray.put((pkeys[order], promo[order]))

        def bpartial(t: pa.Table) -> pa.Table:
            keys, flags = ray.get(lut_ref)
            k = t["l_partkey"].to_numpy(zero_copy_only=False)
            i, hit = sorted_lookup(keys, k)
            price = t["l_extendedprice"].to_numpy(zero_copy_only=False)[hit]
            disc = t["l_discount"].to_numpy(zero_copy_only=False)[hit]
            cents = np.floor(price * (1.0 - disc) * 100.0 + 0.5).astype(np.int64)
            is_p = flags[i[hit]]
            return pa.table(
                {
                    "promo_cents": pa.array([int(cents[is_p].sum())], pa.int64()),
                    "total_cents": pa.array([int(cents.sum())], pa.int64()),
                }
            )

        sums = li.map_batches(bpartial, batch_format="pyarrow").aggregate(
            Sum("promo_cents", alias_name="promo_cents"),
            Sum("total_cents", alias_name="total_cents"),
        )
        promo_c, total_c = int(sums["promo_cents"]), int(sums["total_cents"])
        return pd.DataFrame(
            {
                "promo_cents": [promo_c],
                "total_cents": [total_c],
                "promo_bp": [promo_c * 10000 // total_c],
            }
        )

    part = _read(sf_dir, "part", ["p_partkey", "p_type"])

    def slim_part(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_partkey": t["p_partkey"],
                "is_promo": pc.starts_with(t["p_type"], "PROMO"),
            }
        )

    nb = derive_num_buckets(
        _meta_rows(sf_dir, "lineitem") + _meta_rows(sf_dir, "part")
    )
    joined = bucketed_hash_join(
        li, part.map_batches(slim_part, batch_format="pyarrow"),
        on="l_partkey", num_buckets=nb,
    )

    def partial(b: pd.DataFrame) -> pd.DataFrame:
        cents = _int_units(
            (b["l_extendedprice"] * (1.0 - b["l_discount"])).to_numpy(), 100
        ).astype("int64")
        promo = cents.where(b["is_promo"].astype(bool).to_numpy(), 0)
        return pd.DataFrame(
            {"promo_cents": [int(promo.sum())], "total_cents": [int(cents.sum())]}
        )

    sums = (
        joined.map_batches(partial, batch_format="pandas")
        .aggregate(
            Sum("promo_cents", alias_name="promo_cents"),
            Sum("total_cents", alias_name="total_cents"),
        )
    )
    promo_c, total_c = int(sums["promo_cents"]), int(sums["total_cents"])
    return pd.DataFrame(
        {
            "promo_cents": [promo_c],
            "total_cents": [total_c],
            "promo_bp": [promo_c * 10000 // total_c],
        }
    )


PROMO_REVENUE_SQL = """
WITH s AS (
    SELECT
      sum(CASE WHEN p_type LIKE 'PROMO%'
               THEN CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)
               ELSE 0 END) AS promo_cents,
      sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS total_cents
    FROM lineitem JOIN part ON p_partkey = l_partkey
)
SELECT CAST(promo_cents AS BIGINT) AS promo_cents,
       CAST(total_cents AS BIGINT) AS total_cents,
       CAST(promo_cents * 10000 // total_cents AS BIGINT) AS promo_bp
FROM s
"""


def large_orders_having(sf_dir: str, min_qty: int = 200,
                        broadcast_limit: int = 5_000_000):
    """TPC-H Q18 shape: GROUP BY + HAVING over the fact table, joined back
    to the dimension for context. The quantity sum is partial-per-batch
    (integer units) so the groupby exchanges one row per (batch × order),
    and the HAVING filter runs BEFORE the join back. The join back itself
    has TWO REGIMES on the (materialized, so counting is free) survivor
    set: ≤ ``broadcast_limit`` survivors → sorted-array lookup broadcast
    into an orders map (HAVING survivors are a tiny fraction by
    construction — this is the expected path at any scale); larger →
    bucketed hash join."""
    import ray

    from ray.data.aggregate import Sum

    from schema_guru_ray.stages.joins import bucketed_hash_join, derive_num_buckets

    li = _read(sf_dir, "lineitem", ["l_orderkey", "l_quantity"])

    def partial(t: pa.Table) -> pa.Table:
        qty = pc.cast(pc.floor(pc.add(t["l_quantity"], 0.5)), pa.int64())
        g = (
            pa.table({"o_orderkey": t["l_orderkey"], "sum_qty": qty})
            .group_by("o_orderkey")
            .aggregate([("sum_qty", "sum")])
        )
        return g.rename_columns(["o_orderkey", "sum_qty"])

    # coarse-bucket aggregate instead of a 1-group-per-order sort: the
    # shuffle has ~|orders|/250k reducer groups, each summed + HAVING-
    # filtered by one vectorized pandas groupby (measured 5.9s → 2.4s at
    # sf0.1 over groupby(o_orderkey).aggregate)
    nb = max(8, _meta_rows(sf_dir, "orders") // 250_000 + 1)

    def tag(t: pa.Table) -> pa.Table:
        b = (t["o_orderkey"].to_numpy(zero_copy_only=False) % nb).astype(np.int32)
        return t.append_column("__b", pa.array(b, pa.int32()))

    def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
        s = g.groupby("o_orderkey", as_index=False)["sum_qty"].sum()
        s = s[s["sum_qty"] > int(min_qty)]
        return s.astype({"o_orderkey": "int64", "sum_qty": "int64"})

    big = (
        li.map_batches(partial, batch_format="pyarrow")
        .map_batches(tag, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(reduce_bucket, batch_format="pandas")
        .materialize()  # tiny survivor set; avoids re-running the aggregate
    )

    orders = _read(sf_dir, "orders", ["o_orderkey", "o_custkey"])

    if big.count() <= broadcast_limit:
        surv = big.to_pandas()
        keys = surv["o_orderkey"].to_numpy(np.int64)
        qtys = surv["sum_qty"].to_numpy(np.int64)
        order = np.argsort(keys, kind="stable")
        lut_ref = ray.put((keys[order], qtys[order]))

        def attach(t: pa.Table) -> pa.Table:
            k_arr, q_arr = ray.get(lut_ref)
            v = t["o_orderkey"].to_numpy(zero_copy_only=False)
            i, hit = sorted_lookup(k_arr, v)
            t = t.filter(pa.array(hit))
            return t.append_column(
                "sum_qty", pa.array(q_arr[i[hit]], pa.int64())
            )

        return orders.map_batches(attach, batch_format="pyarrow")

    nb = derive_num_buckets(2 * _meta_rows(sf_dir, "orders"))
    return bucketed_hash_join(orders, big, on="o_orderkey", num_buckets=nb)


LARGE_ORDERS_HAVING_SQL = """
SELECT o_orderkey, o_custkey, sum_qty
FROM orders
JOIN (SELECT l_orderkey,
             CAST(sum(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING sum(CAST(round(l_quantity) AS BIGINT)) > 200) q
  ON q.l_orderkey = o_orderkey
"""


def brand_supplier_distinct(sf_dir: str, broadcast_limit: int = 20_000_000):
    """TPC-H Q16 shape: COUNT(DISTINCT supplier) per part brand across a
    join. TWO REGIMES on the part footer row count:

    * **Broadcast** (part ≤ ``broadcast_limit``): partkey → brand-code
      lookup (sorted int64 keys + int16 codes) ships once via ``ray.put``;
      lineitem streams through annotate + per-batch distinct — the only
      shuffle is the (brand, suppkey) distinct groupby over per-batch-
      deduped pairs (≤ |brands| × |suppliers| rows).
    * **Bucketed** (part too big): lineitem reduces to distinct (partkey,
      suppkey) pairs PER BATCH before the join (the join moves pairs, not
      lineitems), then the same distinct-pair groupby.

    In both regimes the per-brand count is partial-per-batch over the
    distinct pair set — the sets themselves never assemble on one node."""
    import ray

    from ray.data.aggregate import Count, Sum

    from schema_guru_ray.stages.joins import bucketed_hash_join, derive_num_buckets

    li = _read(sf_dir, "lineitem", ["l_partkey", "l_suppkey"])

    def per_brand(t: pa.Table) -> pa.Table:
        g = (
            t.select(["p_brand"])
            .group_by("p_brand")
            .aggregate([("p_brand", "count", pc.CountOptions(mode="all"))])
        )
        return g.rename_columns(["p_brand", "n_supp"])

    if _meta_rows(sf_dir, "part") <= broadcast_limit:
        import pyarrow.parquet as pq

        part_t = pq.read_table(
            os.path.join(sf_dir, "part.parquet"), columns=["p_partkey", "p_brand"]
        )
        pkeys = part_t["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
        brands = part_t["p_brand"].to_pandas()
        cats = pd.Categorical(brands)
        brand_names = list(cats.categories)
        codes = cats.codes.astype(np.int16)
        order = np.argsort(pkeys, kind="stable")
        lut_ref = ray.put((pkeys[order], codes[order]))

        def annotate(t: pa.Table) -> pa.Table:
            keys, cds = ray.get(lut_ref)
            k = t["l_partkey"].to_numpy(zero_copy_only=False)
            i, hit = sorted_lookup(keys, k)
            sup = t["l_suppkey"].to_numpy(zero_copy_only=False)[hit]
            bc = cds[i[hit]].astype(np.int64)
            # per-batch distinct via ONE composite int64 (suppkey is bounded
            # far below 2e9 in any TPC-H-shaped corpus; guarded) — and the
            # composite itself is what shuffles: a single-int64 groupby
            # sorts ~3x faster than a (string, int64) pair
            assert len(sup) == 0 or sup.max() < 2_000_000_000
            comp = np.unique(bc * 2_000_000_000 + sup)
            return pa.table({"comp": pa.array(comp, pa.int64())})

        # coarse-bucket distinct: ~250k composite keys per reducer group,
        # deduped + counted by one vectorized np.unique per group — not a
        # 1-group-per-pair sort aggregate
        nbk = max(8, (_meta_rows(sf_dir, "supplier") * 32) // 250_000 + 1)

        def tagc(t: pa.Table) -> pa.Table:
            b = (t["comp"].to_numpy(zero_copy_only=False) % nbk).astype(np.int32)
            return t.append_column("__b", pa.array(b, pa.int32()))

        def reduce_bucket(g: pd.DataFrame) -> pd.DataFrame:
            u = np.unique(g["comp"].to_numpy())
            bc, n = np.unique(u // 2_000_000_000, return_counts=True)
            return pd.DataFrame(
                {"bc": bc.astype("int64"), "n_supp": n.astype("int64")}
            )

        agg = (
            li.map_batches(annotate, batch_format="pyarrow")
            .map_batches(tagc, batch_format="pyarrow")
            .groupby("__b")
            .map_groups(reduce_bucket, batch_format="pandas")
            .groupby("bc")
            .aggregate(Sum("n_supp", alias_name="n_supp"))
        )

        def to_names(t: pa.Table) -> pa.Table:
            bc = t["bc"].to_numpy(zero_copy_only=False)
            return pa.table(
                {
                    "p_brand": pa.array(
                        [brand_names[int(c)] for c in bc], pa.string()
                    ),
                    "n_supp": t["n_supp"],
                }
            )

        return agg.map_batches(to_names, batch_format="pyarrow")

    def uniq_pairs(t: pa.Table) -> pa.Table:
        g = t.group_by(["l_partkey", "l_suppkey"]).aggregate([])
        return g

    pairs = li.map_batches(uniq_pairs, batch_format="pyarrow")

    part = _read(sf_dir, "part", ["p_partkey", "p_brand"])

    def rekey(t: pa.Table) -> pa.Table:
        return t.rename_columns(["l_partkey", "p_brand"])

    nb = derive_num_buckets(
        _meta_rows(sf_dir, "lineitem") + _meta_rows(sf_dir, "part")
    )
    joined = bucketed_hash_join(
        pairs, part.map_batches(rekey, batch_format="pyarrow"),
        on="l_partkey", num_buckets=nb,
    )

    # global distinct (brand, suppkey) — one row per pair after this groupby
    distinct_pairs = (
        joined.select_columns(["p_brand", "l_suppkey"])
        .groupby(["p_brand", "l_suppkey"])
        .aggregate(Count(alias_name="__c"))
    )

    return (
        distinct_pairs.map_batches(per_brand, batch_format="pyarrow")
        .groupby("p_brand")
        .aggregate(Sum("n_supp", alias_name="n_supp"))
    )


BRAND_SUPPLIER_DISTINCT_SQL = """
SELECT p_brand, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_supp
FROM part JOIN lineitem ON l_partkey = p_partkey
GROUP BY p_brand
"""


def modal_event_type_user(sf_dir: str):
    """Grouped MODE (argmax-by-count) with deterministic tie-breaking: each
    user's most frequent event type; ties go to the lexicographically
    smallest type, matching the oracle's ``row_number() OVER (ORDER BY cnt
    DESC, event_type ASC)``. 100-TB shape: counts are partial-per-batch so
    the ONE shuffle moves (user, type, n) partials — ≤ |event types| rows
    per user per batch — into COARSE user-hash buckets (~250k users per
    reducer group, not one pandas dispatch per user: millions of users
    would mean millions of per-group Python calls); inside a bucket one
    vectorized sort + drop_duplicates merges partials and takes every
    user's argmax at once."""
    ds = _read(sf_dir, "events", ["user_id", "event_type"])
    nb = max(8, _meta_rows(sf_dir, "events") // 250_000 + 1)

    def partial(t: pa.Table) -> pa.Table:
        g = (
            t.group_by(["user_id", "event_type"])
            .aggregate([("event_type", "count", pc.CountOptions(mode="all"))])
        )
        g = g.rename_columns(["user_id", "event_type", "cnt"])
        b = (g["user_id"].to_numpy(zero_copy_only=False) % nb).astype(np.int32)
        return g.append_column("__b", pa.array(b, pa.int32()))

    def bucket_pick(g: pd.DataFrame) -> pd.DataFrame:
        m = g.groupby(["user_id", "event_type"], as_index=False)["cnt"].sum()
        m = m.sort_values(
            ["user_id", "cnt", "event_type"], ascending=[True, False, True]
        )
        top = m.drop_duplicates("user_id", keep="first")
        return pd.DataFrame(
            {
                "user_id": top["user_id"].astype("int64"),
                "modal_type": top["event_type"],
                "cnt": top["cnt"].astype("int64"),
            }
        )

    return (
        ds.map_batches(partial, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(bucket_pick, batch_format="pandas")
    )


MODAL_EVENT_TYPE_USER_SQL = """
WITH counts AS (
    SELECT user_id, event_type, count(*) AS cnt
    FROM events GROUP BY user_id, event_type
), ranked AS (
    SELECT user_id, event_type, cnt,
           row_number() OVER (PARTITION BY user_id
                              ORDER BY cnt DESC, event_type ASC) AS rn
    FROM counts
)
SELECT user_id, event_type AS modal_type, CAST(cnt AS BIGINT) AS cnt
FROM ranked WHERE rn = 1
"""


def duplicate_passages_documents(sf_dir: str, n: int = 5, min_docs: int = 2):
    """Repeated-passage detection (the exact-substring dedup signal of Lee
    et al. 2022, "Deduplicating Training Data Makes Language Models
    Better", at n-gram granularity): every token ``n``-gram appearing in ≥
    ``min_docs`` DISTINCT documents, with its document count. 100-TB
    shape — the Misra-Gries broadcast-recount pattern, NOT a gram-text
    shuffle (a naive groupby(gram_text) moved GBs of strings and measured
    38.6 s at sf0.1; this form is ~6x faster and the exchange is bounded
    by the SURVIVOR set, not the vocabulary):

      1. hash pass: per-batch distinct grams per doc → 64-bit gram-hash
         counts (ints shuffle, never text); collisions only MERGE counts
         upward, so hashes with count ≥ min_docs are a SUPERSET of the
         true repeated grams — no misses;
      2. exact recount: the surviving hash set broadcasts; a second
         streaming pass emits (gram_text, 1) only for grams whose hash
         survived, and one tiny groupby recounts EXACTLY by text — hash
         collisions are eliminated here, so the result is byte-exact vs
         the oracle.

    Tokenization is the decontamination stage's ``\\S+`` over lowercased
    text (same oracle-replayable normalization). Both passes are
    vectorized: per-batch token hashing + a rolling n-window combine give
    every gram hash with numpy ops (no per-gram Python string building);
    gram TEXT is materialized only for survivor hits in pass 2."""
    from collections import Counter
    from itertools import chain

    import ray

    from ray.data.aggregate import Sum

    from schema_guru_ray.stages.profile import stable_hash64

    docs = _read(sf_dir, "documents", ["doc_id", "text"])
    # odd multipliers make the n-window combine position-sensitive
    combine = np.array(
        [0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F, 0x165667B19E3779F9,
         0x27D4EB2F165667C5, 0x85EBCA77C2B2AE63, 0x2545F4914F6CDD1D,
         0x100000001B3, 0xC6A4A7935BD1E995][:n],
        dtype=np.uint64,
    )

    def _gram_hashes(b: pd.DataFrame):
        """Flat per-token hashes + valid n-window gram hashes + bookkeeping
        (doc index per window, flat token list, window start positions)."""
        tok_lists = b["text"].fillna("").str.lower().str.findall(r"\S+")
        lengths = tok_lists.map(len).to_numpy()
        flat = list(chain.from_iterable(tok_lists))
        if len(flat) < n:
            return None
        codes, uniq = pd.factorize(pd.Series(flat, dtype="object"))
        th = stable_hash64(pd.Series(uniq)).astype(np.uint64)[codes]
        doc_idx = np.repeat(np.arange(len(b)), lengths)
        n_win = len(flat) - n + 1
        with np.errstate(over="ignore"):
            gh = np.zeros(n_win, np.uint64)
            for j in range(n):
                gh += th[j : j + n_win] * combine[j]
        valid = doc_idx[:n_win] == doc_idx[n - 1 :]
        return gh[valid], doc_idx[:n_win][valid], flat, np.flatnonzero(valid)

    # coarse hash-bucket counts: a groupby(h) would be one reducer group
    # per distinct gram (measured 43.8 s for 238k groups at sf0.1); ~64
    # buckets co-locate each hash, and the in-bucket sum + HAVING are one
    # vectorized np.unique per bucket (measured ~1 s)
    nbk = max(16, _meta_rows(sf_dir, "documents") // 1000)

    def hash_partial(b: pd.DataFrame) -> pd.DataFrame:
        r = _gram_hashes(b)
        if r is None:
            return pd.DataFrame({"h": pd.Series(dtype="int64"),
                                 "n": pd.Series(dtype="int64"),
                                 "__b": pd.Series(dtype="int32")})
        gh, didx, _, _ = r
        # distinct (doc, gram) via one lexsort, then counts per gram
        order = np.lexsort((gh, didx))
        gs, ds_ = gh[order], didx[order]
        first = np.ones(len(gs), bool)
        first[1:] = (gs[1:] != gs[:-1]) | (ds_[1:] != ds_[:-1])
        u, cnt = np.unique(gs[first], return_counts=True)
        return pd.DataFrame(
            {"h": u.astype(np.int64), "n": cnt.astype(np.int64),
             "__b": (u % np.uint64(nbk)).astype(np.int32)}
        )

    def sum_bucket(g: pd.DataFrame) -> pd.DataFrame:
        u, inv = np.unique(g["h"].to_numpy(np.int64), return_inverse=True)
        sums = np.zeros(len(u), np.int64)
        np.add.at(sums, inv, g["n"].to_numpy(np.int64))
        keep = sums >= int(min_docs)
        return pd.DataFrame({"h": u[keep], "n": sums[keep]})

    surv = (
        docs.map_batches(hash_partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(sum_bucket, batch_format="pandas")
        .to_pandas()
    )
    surv_ref = ray.put(np.sort(surv["h"].to_numpy(np.int64).astype(np.uint64)))

    def recount_partial(b: pd.DataFrame) -> pd.DataFrame:
        r = _gram_hashes(b)
        k = ray.get(surv_ref)
        c: Counter = Counter()
        if r is not None and len(k):
            gh, didx, flat, starts = r
            _, hit = sorted_lookup(k, gh)
            seen = set()
            for pos, d in zip(starts[hit], didx[hit]):
                g = " ".join(flat[pos : pos + n])
                if (d, g) not in seen:  # distinct per doc
                    seen.add((d, g))
                    c[g] += 1
        df = pd.DataFrame(
            {"g": list(c.keys()),
             "n_docs": pd.Series(list(c.values()), dtype="int64")}
        )
        from schema_guru_ray.stages.profile import stable_hash64 as _h

        df["__b"] = (
            (_h(df["g"]) % np.uint64(nbk)).astype("int32")
            if len(df) else pd.Series(dtype="int32")
        )
        return df

    def text_bucket(g: pd.DataFrame) -> pd.DataFrame:
        out = g.groupby("g", as_index=False)["n_docs"].sum()
        out = out[out["n_docs"] >= int(min_docs)]
        return out.astype({"n_docs": "int64"})

    return (
        docs.map_batches(recount_partial, batch_format="pandas")
        .groupby("__b")
        .map_groups(text_bucket, batch_format="pandas")
    )


DUPLICATE_PASSAGES_DOCUMENTS_SQL = """
WITH toks AS (
    SELECT doc_id, regexp_extract_all(lower(text), '\\S+') AS t FROM documents
),
grams AS (
    SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS g
    FROM toks, UNNEST(range(1, len(t) - 3)) AS u(i)
    WHERE len(t) >= 5
)
SELECT g, count(*) AS n_docs
FROM grams GROUP BY g HAVING count(*) >= 2
"""


def group_split_events(sf_dir: str):
    """GROUP-preserving train/val/test split — the leakage-safe variant of
    split_assign_documents: membership is a function of md5(user_id), so
    ALL of a user's events land in the same split (no user straddles
    train and test). Pure streaming map, md5 computed once per distinct
    user per batch; the oracle replays the identical hex thresholds."""
    from schema_guru_ray.stages.sample import md5_split_assign

    ds = _read(sf_dir, "events", ["event_id", "user_id"])

    def assign(b: pd.DataFrame) -> pd.DataFrame:
        u = b["user_id"].astype("int64")
        uniq = u.unique()
        lab = pd.Series(md5_split_assign(uniq), index=uniq)
        split = u.map(lab).to_numpy()
        return pd.DataFrame(
            {
                "event_id": b["event_id"].astype("int64"),
                "user_id": u,
                "split": split,
            }
        )

    return ds.map_batches(assign, batch_format="pandas")


GROUP_SPLIT_EVENTS_SQL = """
SELECT event_id, user_id,
       CASE WHEN md5(CAST(user_id AS VARCHAR)) < 'c{c31}'
            THEN 'train'
            WHEN md5(CAST(user_id AS VARCHAR)) < 'e{six31}'
            THEN 'val'
            ELSE 'test' END AS split
FROM events
""".replace("{c31}", "c" * 31).replace("{six31}", "6" * 31)


def funnel_conversions_events(sf_dir: str, window_sec: int = 3600):
    """Funnel conversion (the standard product-analytics shape): per user,
    how many 'view' events were followed by at least one 'purchase'
    STRICTLY after the view and within the window. 100-TB shape: the type
    filter is pushed into the parquet read; slim (user, ts, type) rows
    shuffle ONCE into user-hash buckets (a user's events co-locate); inside
    a bucket one ``pd.merge_asof(direction='forward', by=user,
    tolerance=window, allow_exact_matches=False)`` finds every view's next
    purchase vectorized, then a bucket-local pandas groupby emits the
    per-user counts."""
    import pyarrow.dataset as pads
    import ray.data as rd

    ds = rd.read_parquet(
        os.path.join(sf_dir, "events.parquet"),
        columns=["user_id", "ts", "event_type"],
        filter=pads.field("event_type").isin(["view", "purchase"]),
    )
    nb = max(8, _meta_rows(sf_dir, "events") // 250_000 + 1)

    def tag(t: pa.Table) -> pa.Table:
        b = (t["user_id"].to_numpy(zero_copy_only=False) % nb).astype(np.int32)
        return t.append_column("__b", pa.array(b, pa.int32()))

    tol = pd.Timedelta(seconds=window_sec)

    def funnel_bucket(g: pd.DataFrame) -> pd.DataFrame:
        v = g[g["event_type"] == "view"][["user_id", "ts"]].sort_values("ts")
        p = g[g["event_type"] == "purchase"][["user_id", "ts"]].sort_values("ts")
        if v.empty:
            return pd.DataFrame(
                {
                    "user_id": pd.Series(dtype="int64"),
                    "n_views": pd.Series(dtype="int64"),
                    "n_converted": pd.Series(dtype="int64"),
                }
            )
        m = pd.merge_asof(
            v, p.rename(columns={"ts": "p_ts"}), left_on="ts",
            right_on="p_ts", by="user_id", direction="forward",
            tolerance=tol, allow_exact_matches=False,
        )
        out = m.groupby("user_id", as_index=False).agg(
            n_views=("ts", "size"), n_converted=("p_ts", "count")
        )
        return out.astype(
            {"user_id": "int64", "n_views": "int64", "n_converted": "int64"}
        )

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__b")
        .map_groups(funnel_bucket, batch_format="pandas")
    )


def prepare_training_corpus(sf_dir: str):
    """Flagship TEXT training-data preparation chain — the full
    pre-training hygiene pipeline as ONE composition, each stage the
    library's own operator, with the whole chain replayed by a single
    DuckDB CTE:

      1. exact dedup (whitespace-normalized md5, min doc_id kept);
      2. verified near-dup removal (MinHash 21×3 → exact shingle-Jaccard
         ≥ 0.8, higher doc_id dropped);
      3. benchmark decontamination (3-gram overlap with the held-out
         doc_id % 97 == 0 suite; contaminated docs AND the suite itself
         dropped);
      4. PII scrub (email → [EMAIL], dotted quad → [IP], 7+ digits →
         [NUM], in that order);
      5. quality filter (30 ≤ words ≤ 100k on the SCRUBBED text);
      6. leakage-stable split assignment (md5(doc_id) 80/10/10).

    100-TB shape: two shuffles total (exact-dedup buckets; the LSH/verify
    exchange over candidate ids + pruned texts) — stages 3-6 are pure
    streaming maps over broadcast state. Output: (doc_id, n_words, split,
    scrubbed_md5) — the md5 pins the exact training BYTES."""
    import hashlib

    import ray

    from schema_guru_ray.pipelines.curate import (
        _confirmed_drop_ids, _exact_dedup, _remove_drops,
    )
    from schema_guru_ray.stages.contamination import (
        build_benchmark_grams, hash_gram_strings,
    )
    from schema_guru_ray.stages.text import WORD_RE, PiiScrubber

    ds = _read(sf_dir, "documents", ["doc_id", "text"]).repartition(8)
    bench = ds.map_batches(
        lambda b: b[b["doc_id"] % 97 == 0], batch_format="pandas"
    )
    kept = _exact_dedup(ds, 64).materialize()
    drops = _confirmed_drop_ids(kept, 0.8)
    survivors = _remove_drops(kept, drops, drops.count(), 1_000_000)

    bench_grams = build_benchmark_grams(bench, 3)
    probe_ref = ray.put((hash_gram_strings(bench_grams, 3), bench_grams))

    def decontam(b: pd.DataFrame) -> pd.DataFrame:
        # vectorized hash probe + exact recount for flagged docs only,
        # over the broadcast (sorted-hash-array, frozenset) probe pair —
        # per-worker deserialize-once via the stage's own cache
        from schema_guru_ray.stages.contamination import (
            _get_probe, exact_hit_counts,
        )

        hash_arr, grams = _get_probe(probe_ref)
        hits = exact_hit_counts(b["text"].fillna(""), hash_arr, grams, 3)
        mask = (b["doc_id"].to_numpy(np.int64) % 97 != 0) & (hits == 0)
        return b[pd.Series(mask, index=b.index)]

    clean = survivors.map_batches(decontam, batch_format="pandas")

    from schema_guru_ray.stages.sample import md5_split_assign

    def finish(b: pd.DataFrame) -> pd.DataFrame:
        scr = PiiScrubber()(b)
        s = scr["scrubbed"].fillna("")
        out = pd.DataFrame(
            {
                "doc_id": scr["doc_id"].astype("int64"),
                "n_words": s.str.lower().str.findall(WORD_RE).map(len)
                .astype("int64"),
                "scrubbed_md5": s.map(
                    lambda x: hashlib.md5(x.encode()).hexdigest()
                ),
            }
        )
        out = out[(out["n_words"] >= 30) & (out["n_words"] <= 100_000)]
        out["split"] = md5_split_assign(out["doc_id"])
        return out

    return clean.map_batches(finish, batch_format="pandas")


PREPARE_TRAINING_CORPUS_SQL = r"""
WITH keepers AS (
  SELECT min(doc_id) AS doc_id
  FROM documents
  GROUP BY md5(trim(lower(regexp_replace(text, '\s+', ' ', 'g'))))
),
kept AS (SELECT d.doc_id, d.text FROM documents d JOIN keepers USING (doc_id)),
toks AS (
  SELECT doc_id, regexp_extract_all(lower(text), '\S+') AS tk FROM kept
),
sh AS (
  SELECT doc_id, unnest(list_distinct(
    CASE WHEN len(tk) < 3 THEN [list_aggregate(tk, 'string_agg', ' ')]
         ELSE list_transform(generate_series(1, len(tk)-2),
                             i -> tk[i] || ' ' || tk[i+1] || ' ' || tk[i+2])
    END)) AS s
  FROM toks
),
counts AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT id_a, id_b
  FROM inter
  JOIN counts ca ON ca.doc_id = id_a
  JOIN counts cb ON cb.doc_id = id_b
  WHERE n_inter * 5 >= (ca.n + cb.n - n_inter) * 4
),
survivors AS (
  SELECT doc_id, text FROM kept
  WHERE doc_id NOT IN (SELECT id_b FROM pairs)
),
btoks AS (
  SELECT regexp_extract_all(lower(text), '\S+') AS t
  FROM documents WHERE doc_id % 97 = 0
),
bgrams AS (
  SELECT DISTINCT array_to_string(t[i:i+2], ' ') AS g
  FROM btoks, UNNEST(range(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 3
),
stoks AS (
  SELECT doc_id, text, regexp_extract_all(lower(text), '\S+') AS t
  FROM survivors WHERE doc_id % 97 <> 0
),
sgrams AS (
  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS g
  FROM stoks, UNNEST(range(1, len(t) - 1)) AS u(i)
  WHERE len(t) >= 3
),
contaminated AS (SELECT DISTINCT doc_id FROM sgrams JOIN bgrams USING (g)),
clean AS (
  SELECT doc_id, text FROM stoks
  WHERE doc_id NOT IN (SELECT doc_id FROM contaminated)
),
scrub AS (
  SELECT doc_id,
         regexp_replace(
           regexp_replace(
             regexp_replace(text,
               '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '[EMAIL]', 'g'),
             '\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b', '[IP]', 'g'),
           '\d{7,}', '[NUM]', 'g') AS s
  FROM clean
),
final AS (
  SELECT doc_id,
         CAST(len(regexp_extract_all(lower(s), '[\w'']+')) AS BIGINT) AS n_words,
         md5(s) AS scrubbed_md5
  FROM scrub
)
SELECT doc_id, n_words, scrubbed_md5,
       CASE WHEN md5(CAST(doc_id AS VARCHAR)) < '{c31}'
            THEN 'train'
            WHEN md5(CAST(doc_id AS VARCHAR)) < '{six31}'
            THEN 'val'
            ELSE 'test' END AS split
FROM final
WHERE n_words BETWEEN 30 AND 100000
""".replace("{c31}", "c" * 32).replace("{six31}", "e" + "6" * 31)


def cohort_retention_events(sf_dir: str, broadcast_limit: int = 20_000_000):
    """Cohort retention (the other standard product-analytics shape): users
    bucketed by signup DAY (their first 'signup' event), counted as
    retained in each subsequent day offset where they have ANY event.
    Output: (cohort_day, day_offset, n_users). TWO REGIMES on the events
    footer row count (the signup map is bounded by |users|):

    * **Broadcast**: the user → signup-day map (per-batch min partials →
      driver fold → sorted arrays via ``ray.put``) annotates every event in
      one streaming map; distinct (user, offset) pre-dedupes per batch and
      one groupby counts the matrix.
    * **Bucketed**: signup days and events co-shuffle into user-hash
      buckets; the in-bucket join + dedup is vectorized pandas.
    """
    import ray
    import ray.data as rd

    from ray.data.aggregate import Sum

    ds = _read(sf_dir, "events", ["user_id", "ts", "event_type"])

    def signup_partial(t: pa.Table) -> pa.Table:
        mask = pc.equal(t["event_type"], "signup")
        t = t.filter(mask)
        g = (
            pa.table({"user_id": t["user_id"], "ts": t["ts"]})
            .group_by("user_id")
            .aggregate([("ts", "min")])
        )
        return g.rename_columns(["user_id", "signup_ts"])

    n_events = _meta_rows(sf_dir, "events")

    if n_events <= broadcast_limit:
        su = (
            ds.map_batches(signup_partial, batch_format="pyarrow")
            .to_pandas()
            .groupby("user_id", as_index=False)["signup_ts"].min()
        )
        keys = su["user_id"].to_numpy(np.int64)
        days = (su["signup_ts"].to_numpy().astype("datetime64[D]")
                .astype(np.int64))
        order = np.argsort(keys, kind="stable")
        lut_ref = ray.put((keys[order], days[order]))

        def offsets(t: pa.Table) -> pd.DataFrame:
            k_arr, d_arr = ray.get(lut_ref)
            u = t["user_id"].to_numpy(zero_copy_only=False)
            i, hit = sorted_lookup(k_arr, u)
            ev_day = (t["ts"].to_numpy(zero_copy_only=False)
                      .astype("datetime64[D]").astype(np.int64))[hit]
            cohort = d_arr[i[hit]]
            off = ev_day - cohort
            keep = off >= 0
            # distinct (cohort, offset, user) per batch, then count partial
            trip = np.unique(
                np.stack([cohort[keep], off[keep], u[hit][keep]], axis=1),
                axis=0,
            )
            df = pd.DataFrame(
                {"cohort_day": trip[:, 0], "day_offset": trip[:, 1],
                 "user_id": trip[:, 2]}
            ).astype("int64")
            # coarse user-hash bucket: a user's triplets co-locate, so the
            # in-bucket dedup is globally exact — a (cohort, offset, user)
            # sort aggregate would be one reducer group per triplet
            nb = max(8, n_events // 250_000 + 1)
            df["__b"] = (df["user_id"] % nb).astype("int32")
            return df

        def bucket_count(g: pd.DataFrame) -> pd.DataFrame:
            d = g.drop_duplicates(["cohort_day", "day_offset", "user_id"])
            out = d.groupby(["cohort_day", "day_offset"], as_index=False).agg(
                n_users=("user_id", "size")
            )
            return out.astype("int64")

        return (
            ds.map_batches(offsets, batch_format="pyarrow")
            .groupby("__b")
            .map_groups(bucket_count, batch_format="pandas")
            .groupby(["cohort_day", "day_offset"])
            .aggregate(Sum("n_users", alias_name="n_users"))
        )

    # bucketed regime: co-shuffle signup rows and events by user hash
    nb = max(8, n_events // 250_000 + 1)

    def tag_events(t: pa.Table) -> pa.Table:
        b = (t["user_id"].to_numpy(zero_copy_only=False) % nb).astype(np.int32)
        return t.append_column("__b", pa.array(b, pa.int32()))

    tagged = ds.map_batches(tag_events, batch_format="pyarrow")

    def bucket_retention(g: pd.DataFrame) -> pd.DataFrame:
        su = (
            g[g["event_type"] == "signup"]
            .groupby("user_id", as_index=False)["ts"].min()
            .rename(columns={"ts": "signup_ts"})
        )
        m = g.merge(su, on="user_id", how="inner")
        cohort = m["signup_ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        ev = m["ts"].to_numpy().astype("datetime64[D]").astype(np.int64)
        off = ev - cohort
        keep = off >= 0
        df = pd.DataFrame(
            {"cohort_day": cohort[keep], "day_offset": off[keep],
             "user_id": m["user_id"].to_numpy(np.int64)[keep]}
        ).drop_duplicates()
        out = df.groupby(["cohort_day", "day_offset"], as_index=False).agg(
            n_users=("user_id", "nunique")
        )
        return out.astype("int64")

    # users are co-located per bucket, so per-bucket counts are final
    from ray.data.aggregate import Sum as _Sum

    return (
        tagged.groupby("__b")
        .map_groups(bucket_retention, batch_format="pandas")
        .groupby(["cohort_day", "day_offset"])
        .aggregate(_Sum("n_users", alias_name="n_users"))
    )


COHORT_RETENTION_EVENTS_SQL = """
WITH su AS (
    SELECT user_id, CAST(min(ts) AS DATE) AS cohort_date
    FROM events WHERE event_type = 'signup' GROUP BY user_id
),
act AS (
    SELECT DISTINCT
        CAST(datediff('day', DATE '1970-01-01', cohort_date) AS BIGINT)
            AS cohort_day,
        CAST(datediff('day', cohort_date, CAST(e.ts AS DATE)) AS BIGINT)
            AS day_offset,
        e.user_id
    FROM events e JOIN su USING (user_id)
    WHERE CAST(e.ts AS DATE) >= cohort_date
)
SELECT cohort_day, day_offset, count(*) AS n_users
FROM act GROUP BY cohort_day, day_offset
"""


FUNNEL_CONVERSIONS_EVENTS_SQL = """
WITH v AS (SELECT user_id, ts FROM events WHERE event_type = 'view'),
p AS (SELECT user_id, ts FROM events WHERE event_type = 'purchase')
SELECT v.user_id,
       count(*) AS n_views,
       CAST(sum(CASE WHEN EXISTS (
           SELECT 1 FROM p
           WHERE p.user_id = v.user_id
             AND p.ts > v.ts
             AND p.ts <= v.ts + INTERVAL 1 HOUR)
         THEN 1 ELSE 0 END) AS BIGINT) AS n_converted
FROM v GROUP BY v.user_id
"""


# Ordering contract: the correctness driver samples the FIRST 50 entries of
# this dict in insertion order. Keep every oracle-backed query (in ORACLES)
# ahead of the rows-only entries so the sampled window is 50/50 oracle-checked;
# flagship compositions lead so they always get a driver row.
QUERIES = {
    "prepare_training_corpus": prepare_training_corpus,
    "curate_documents": curate_documents,
    "melt_lineitem_measures": melt_lineitem_measures,
    "decontaminate_documents": decontaminate_documents,
    "repetition_documents": repetition_documents,
    "scrub_pii_documents": scrub_pii_documents,
    "cluster_assign_embeddings": cluster_assign_embeddings,
    "users_active_both_halves": users_active_both_halves,
    "left_join_customer_orders": left_join_customer_orders,
    "vocab_documents": vocab_documents,
    "quantile_buckets_extendedprice": quantile_buckets_extendedprice,
    "shuffle_positions_documents": shuffle_positions_documents,
    "corr_stats_lineitem": corr_stats_lineitem,
    "split_assign_documents": split_assign_documents,
    "groupwise_dev_events": groupwise_dev_events,
    "revenue_by_region": revenue_by_region,
    "grouped_median_quantity": grouped_median_quantity,
    "rolling_revenue_customer": rolling_revenue_customer,
    "nation_balance_full_outer": nation_balance_full_outer,
    "edit_distance_adjacent_docs": edit_distance_adjacent_docs,
    "order_priority_exists": order_priority_exists,
    "customer_order_distribution": customer_order_distribution,
    "promo_revenue": promo_revenue,
    "large_orders_having": large_orders_having,
    "brand_supplier_distinct": brand_supplier_distinct,
    "modal_event_type_user": modal_event_type_user,
    "duplicate_passages_documents": duplicate_passages_documents,
    "group_split_events": group_split_events,
    "funnel_conversions_events": funnel_conversions_events,
    "cohort_retention_events": cohort_retention_events,
    "q1_lineitem_agg": q1_lineitem_agg,
    "grouped_stats_events": grouped_stats_events,
    "column_stats_lineitem": column_stats_lineitem,
    "distinct_counts": distinct_counts,
    "exact_quantiles_quantity": exact_quantiles_quantity,
    "referential_orphans": referential_orphans,
    "sessionize_events": sessionize_events,
    "top_customers_revenue": top_customers_revenue,
    "token_counts_documents": token_counts_documents,
    "token_frequencies_documents": token_frequencies_documents,
    "quality_documents": quality_documents,
    "fingerprint_documents": fingerprint_documents,
    "clean_documents": clean_documents,
    "bigram_frequencies_documents": bigram_frequencies_documents,
    "dedup_exact_documents": dedup_exact_documents,
    "sample_documents": sample_documents,
    "mixture_documents": mixture_documents,
    "stratified_cap_events": stratified_cap_events,
    "near_dup_pairs_documents": near_dup_pairs_documents,
    "dup_components_documents": dup_components_documents,
    "simhash_documents": simhash_documents,
    "ann_topk_embeddings": ann_topk_embeddings,
    "embedding_near_dup": embedding_near_dup,
    "schema_segmented_events": schema_segmented_events,
    "schema_evolution_events": schema_evolution_events,
    "join_orders_customers": join_orders_customers,
    "asof_latest_order_before_event": asof_latest_order_before_event,
    "asof_orders_bounded": asof_orders_bounded,
    "range_join_clicks_after_signup": range_join_clicks_after_signup,
    "windowed_events_daily": windowed_events_daily,
    "hopping_events_daily_6h": hopping_events_daily_6h,
    "top_orders_per_customer": top_orders_per_customer,
    "window_functions_orders": window_functions_orders,
    "heavy_hitters_tokens": heavy_hitters_tokens,
    "tfidf_top_terms_documents": tfidf_top_terms_documents,
    "rollup_revenue_lineitem": rollup_revenue_lineitem,
    "value_drift_events": value_drift_events,
    "customers_without_orders": customers_without_orders,
    "approx_distinct_users_events": approx_distinct_users_events,
    "pack_documents": pack_documents,
    "pivot_events_daily": pivot_events_daily,
    "approx_quantiles_extendedprice": approx_quantiles_extendedprice,
    "minhash_dedup_documents": minhash_dedup_documents,
    "langid_documents": langid_documents,
    "ivf_topk_embeddings": ivf_topk_embeddings,
    "schema_infer_lineitem": schema_infer_lineitem,
    "schema_infer_events_props": schema_infer_events_props,
    "clips_segments": clips_segments,
    "clips_resample_stats": clips_resample_stats,
    "clips_codec_verdicts": clips_codec_verdicts,
    "clips_violations": clips_violations,
    "clips_duplicate_ids": clips_duplicate_ids,
    "schema_roundtrip_validate_events": schema_roundtrip_validate_events,
    "image_featurize_documents": image_featurize_documents,
    "clips_schema_infer": clips_schema_infer,
    "clips_profile": clips_profile,
    "clips_drift": clips_drift,
    "clips_audio_features": clips_audio_features,
    "clips_content_dedup": clips_content_dedup,
    "kmeans_embeddings": kmeans_embeddings,
    "clips_integrity": clips_integrity,
    "image_phash_dedup_documents": image_phash_dedup_documents,
    "curate_clips_summary": curate_clips_summary,
    "clips_windows": clips_windows,
    "clips_feature_prep": clips_feature_prep,
}

ORACLES = {
    "q1_lineitem_agg": Q1_SQL,
    "grouped_stats_events": GROUPED_STATS_EVENTS_SQL,
    "column_stats_lineitem": COLUMN_STATS_LINEITEM_SQL,
    "distinct_counts": DISTINCT_COUNTS_SQL,
    "exact_quantiles_quantity": EXACT_QUANTILES_QUANTITY_SQL,
    "referential_orphans": REFERENTIAL_ORPHANS_SQL,
    "sessionize_events": SESSIONIZE_EVENTS_SQL,
    "top_customers_revenue": TOP_CUSTOMERS_REVENUE_SQL,
    "token_counts_documents": TOKEN_COUNTS_DOCUMENTS_SQL,
    "token_frequencies_documents": TOKEN_FREQUENCIES_DOCUMENTS_SQL,
    "quality_documents": QUALITY_DOCUMENTS_SQL,
    "fingerprint_documents": FINGERPRINT_DOCUMENTS_SQL,
    "clean_documents": CLEAN_DOCUMENTS_SQL,
    "bigram_frequencies_documents": BIGRAM_FREQUENCIES_DOCUMENTS_SQL,
    "dedup_exact_documents": DEDUP_EXACT_DOCUMENTS_SQL,
    "near_dup_pairs_documents": NEAR_DUP_PAIRS_DOCUMENTS_SQL,
    "dup_components_documents": DUP_COMPONENTS_DOCUMENTS_SQL,
    "embedding_near_dup": EMBEDDING_NEAR_DUP_SQL,
    "sample_documents": SAMPLE_DOCUMENTS_SQL,
    "mixture_documents": MIXTURE_DOCUMENTS_SQL,
    "stratified_cap_events": STRATIFIED_CAP_EVENTS_SQL,
    "curate_documents": CURATE_DOCUMENTS_SQL,
    "simhash_documents": SIMHASH_DOCUMENTS_SQL,
    "ann_topk_embeddings": ANN_TOPK_EMBEDDINGS_SQL,
    "join_orders_customers": JOIN_ORDERS_CUSTOMERS_SQL,
    "asof_latest_order_before_event": ASOF_LATEST_ORDER_SQL,
    "asof_orders_bounded": ASOF_ORDERS_BOUNDED_SQL,
    "range_join_clicks_after_signup": RANGE_JOIN_CLICKS_SQL,
    "windowed_events_daily": WINDOWED_EVENTS_DAILY_SQL,
    "hopping_events_daily_6h": HOPPING_EVENTS_DAILY_6H_SQL,
    "top_orders_per_customer": TOP_ORDERS_PER_CUSTOMER_SQL,
    "window_functions_orders": WINDOW_FUNCTIONS_ORDERS_SQL,
    "heavy_hitters_tokens": HEAVY_HITTERS_TOKENS_SQL,
    "tfidf_top_terms_documents": TFIDF_TOP_TERMS_DOCUMENTS_SQL,
    "rollup_revenue_lineitem": ROLLUP_REVENUE_LINEITEM_SQL,
    "value_drift_events": VALUE_DRIFT_EVENTS_SQL,
    "customers_without_orders": CUSTOMERS_WITHOUT_ORDERS_SQL,
    "approx_distinct_users_events": APPROX_DISTINCT_USERS_EVENTS_SQL,
    "pack_documents": PACK_DOCUMENTS_SQL,
    "pivot_events_daily": PIVOT_EVENTS_DAILY_SQL,
    "melt_lineitem_measures": MELT_LINEITEM_MEASURES_SQL,
    "schema_segmented_events": SCHEMA_SEGMENTED_EVENTS_SQL,
    "schema_evolution_events": SCHEMA_EVOLUTION_EVENTS_SQL,
    "decontaminate_documents": DECONTAMINATE_DOCUMENTS_SQL,
    "repetition_documents": REPETITION_DOCUMENTS_SQL,
    "scrub_pii_documents": SCRUB_PII_DOCUMENTS_SQL,
    "cluster_assign_embeddings": CLUSTER_ASSIGN_EMBEDDINGS_SQL,
    "users_active_both_halves": USERS_ACTIVE_BOTH_HALVES_SQL,
    "left_join_customer_orders": LEFT_JOIN_CUSTOMER_ORDERS_SQL,
    "vocab_documents": VOCAB_DOCUMENTS_SQL,
    "quantile_buckets_extendedprice": QUANTILE_BUCKETS_EXTENDEDPRICE_SQL,
    "shuffle_positions_documents": SHUFFLE_POSITIONS_DOCUMENTS_SQL,
    "corr_stats_lineitem": CORR_STATS_LINEITEM_SQL,
    "split_assign_documents": SPLIT_ASSIGN_DOCUMENTS_SQL,
    "groupwise_dev_events": GROUPWISE_DEV_EVENTS_SQL,
    "revenue_by_region": REVENUE_BY_REGION_SQL,
    "grouped_median_quantity": GROUPED_MEDIAN_QUANTITY_SQL,
    "rolling_revenue_customer": ROLLING_REVENUE_CUSTOMER_SQL,
    "nation_balance_full_outer": NATION_BALANCE_FULL_OUTER_SQL,
    "edit_distance_adjacent_docs": EDIT_DISTANCE_ADJACENT_DOCS_SQL,
    "order_priority_exists": ORDER_PRIORITY_EXISTS_SQL,
    "customer_order_distribution": CUSTOMER_ORDER_DISTRIBUTION_SQL,
    "promo_revenue": PROMO_REVENUE_SQL,
    "large_orders_having": LARGE_ORDERS_HAVING_SQL,
    "brand_supplier_distinct": BRAND_SUPPLIER_DISTINCT_SQL,
    "modal_event_type_user": MODAL_EVENT_TYPE_USER_SQL,
    "duplicate_passages_documents": DUPLICATE_PASSAGES_DOCUMENTS_SQL,
    "group_split_events": GROUP_SPLIT_EVENTS_SQL,
    "funnel_conversions_events": FUNNEL_CONVERSIONS_EVENTS_SQL,
    "cohort_retention_events": COHORT_RETENTION_EVENTS_SQL,
    "prepare_training_corpus": PREPARE_TRAINING_CORPUS_SQL,
}
