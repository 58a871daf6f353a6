"""Randomized differential testing of the distributed join/aggregate
operators against DuckDB on identical in-memory tables.

The structured oracle suite (test_oracle_parity) checks the CATALOG's
fixed shapes; this module fuzzes the OPERATORS themselves — random key
cardinalities, skew (70%-one-key), timestamp layouts and interval widths,
always through the bucketed/distributed regime (tiny num_buckets so every
bucket is multi-key, plus the salted path on skewed draws) — and demands
row-for-row equality with DuckDB's answer. Seeds are fixed: failures
reproduce exactly.
"""

import duckdb
import numpy as np
import pandas as pd
import pytest

SEEDS = [11, 23, 37, 58, 71, 94]


def _canon(df: pd.DataFrame, cols) -> pd.DataFrame:
    df = df.copy()
    out = {}
    for c in cols:
        s = df[c]
        if pd.api.types.is_datetime64_any_dtype(s):
            out[c] = s.astype("datetime64[us]")
        elif pd.api.types.is_numeric_dtype(s) or s.isna().any():
            out[c] = s.astype("float64")  # exact for int64 magnitudes used here
        else:
            out[c] = s
    cdf = pd.DataFrame(out)[list(cols)]
    return cdf.sort_values(list(cols)).reset_index(drop=True)


def _assert_same(got: pd.DataFrame, want: pd.DataFrame, cols, ctx: str):
    g, w = _canon(got, cols), _canon(want, cols)
    assert len(g) == len(w), f"{ctx}: {len(g)} rows vs duckdb {len(w)}"
    pd.testing.assert_frame_equal(g, w, check_dtype=False, obj=ctx)


def _keys(rng, n, card):
    k = rng.integers(0, card, n).astype(np.int64)
    if rng.random() < 0.5 and card > 1:  # skewed draw: 70% of rows on one key
        k[rng.random(n) < 0.7] = int(rng.integers(0, card))
    return k


@pytest.mark.usefixtures("ray_session")
class TestHashJoinDifferential:
    @pytest.mark.parametrize("seed", SEEDS)
    def test_inner_and_left_match_duckdb(self, seed):
        import ray.data as rd

        from schema_guru_ray.stages.joins import bucketed_hash_join

        rng = np.random.default_rng(seed)
        nl, nr = int(rng.integers(5, 400)), int(rng.integers(5, 400))
        card = int(rng.integers(1, 40))
        left = pd.DataFrame({"k": _keys(rng, nl, card),
                             "lv": rng.integers(-10**6, 10**6, nl).astype(np.int64)})
        right = pd.DataFrame({"k": _keys(rng, nr, card),
                              "rv": rng.integers(-10**6, 10**6, nr).astype(np.int64)})
        con = duckdb.connect()
        con.register("l", left)
        con.register("r", right)
        for how, sql in (
            ("inner", "SELECT l.k, l.lv, r.rv FROM l JOIN r USING (k)"),
            ("left", "SELECT l.k, l.lv, r.rv FROM l LEFT JOIN r USING (k)"),
        ):
            want = con.execute(sql).df()
            # hot_key_threshold on every other draw: the salted regime must
            # be answer-invariant whether or not any key actually is hot
            kw = {"hot_key_threshold": 50, "hot_salt": 4} if seed % 2 else {}
            got = bucketed_hash_join(
                rd.from_pandas(left).repartition(3),
                rd.from_pandas(right).repartition(2),
                on="k", num_buckets=4, join_type=how, **kw,
            ).to_pandas()
            _assert_same(got, want, ["k", "lv", "rv"], f"hash_join/{how}/seed{seed}")


@pytest.mark.usefixtures("ray_session")
class TestAsofJoinDifferential:
    @pytest.mark.parametrize("seed", SEEDS)
    def test_backward_asof_matches_duckdb(self, seed):
        import ray.data as rd

        from schema_guru_ray.stages.joins import asof_join

        rng = np.random.default_rng(seed)
        nl, nr = int(rng.integers(5, 300)), int(rng.integers(5, 300))
        card = int(rng.integers(1, 20))
        base = pd.Timestamp("2024-01-01")
        left = pd.DataFrame({
            "k": _keys(rng, nl, card),
            "ts": base + pd.to_timedelta(rng.integers(0, 10**6, nl), unit="s"),
            "lv": np.arange(nl, dtype=np.int64),
        })
        # unique rts per key: merge_asof and DuckDB may break exact-tie
        # groups differently, and ties are not what this test is about
        rts = rng.choice(10**6, size=nr, replace=False)
        right = pd.DataFrame({
            "k": _keys(rng, nr, card),
            "rts": base + pd.to_timedelta(rts, unit="s"),
            "rv": np.arange(nr, dtype=np.int64),
        })
        right = right.drop_duplicates(["k", "rts"])
        tol = int(rng.integers(10**3, 10**6)) if seed % 2 else None
        con = duckdb.connect()
        con.register("l", left)
        con.register("r", right)
        sql = ("SELECT l.k, l.ts, l.lv, r.rts, r.rv "
               "FROM l ASOF JOIN r ON l.k = r.k AND l.ts >= r.rts")
        want = con.execute(sql).df()
        if tol is not None:
            # DuckDB folds a WHERE on the ASOF output back into the join
            # ("Multiple ASOF JOIN inequalities"); apply the window filter
            # to the fetched frame instead — same semantics as the
            # operator's tolerance_sec (latest match, then window check)
            want = want[want["rts"] >= want["ts"] - pd.Timedelta(seconds=tol)]
        got = asof_join(
            rd.from_pandas(left).repartition(3),
            rd.from_pandas(right).repartition(2),
            key="k", left_ts="ts", right_ts="rts", num_buckets=4,
            tolerance_sec=tol,
        ).to_pandas()
        _assert_same(got, want, ["k", "ts", "lv", "rts", "rv"],
                     f"asof_join/seed{seed}/tol={tol}")

    @pytest.mark.parametrize("seed", SEEDS[:3])
    def test_forward_asof_matches_duckdb(self, seed):
        """direction='forward': earliest right row with rts >= ts."""
        import ray.data as rd

        from schema_guru_ray.stages.joins import asof_join

        rng = np.random.default_rng(seed)
        nl, nr = int(rng.integers(5, 300)), int(rng.integers(5, 300))
        card = int(rng.integers(1, 20))
        base = pd.Timestamp("2024-01-01")
        left = pd.DataFrame({
            "k": rng.integers(0, card, nl).astype(np.int64),
            "ts": base + pd.to_timedelta(rng.integers(0, 10**6, nl), unit="s"),
            "lv": np.arange(nl, dtype=np.int64),
        })
        rts = rng.choice(10**6, size=nr, replace=False)
        right = pd.DataFrame({
            "k": rng.integers(0, card, nr).astype(np.int64),
            "rts": base + pd.to_timedelta(rts, unit="s"),
            "rv": np.arange(nr, dtype=np.int64),
        }).drop_duplicates(["k", "rts"])
        con = duckdb.connect()
        con.register("l", left)
        con.register("r", right)
        want = con.execute(
            "SELECT l.k, l.ts, l.lv, r.rts, r.rv "
            "FROM l ASOF JOIN r ON l.k = r.k AND l.ts <= r.rts").df()
        got = asof_join(
            rd.from_pandas(left).repartition(3),
            rd.from_pandas(right).repartition(2),
            key="k", left_ts="ts", right_ts="rts", num_buckets=4,
            direction="forward",
        ).to_pandas()
        _assert_same(got, want, ["k", "ts", "lv", "rts", "rv"],
                     f"forward_asof/seed{seed}")


@pytest.mark.usefixtures("ray_session")
class TestRangeJoinDifferential:
    @pytest.mark.parametrize("seed", SEEDS)
    def test_between_join_matches_duckdb(self, seed):
        import ray.data as rd

        from schema_guru_ray.stages.joins import range_join

        rng = np.random.default_rng(seed)
        npts, nint = int(rng.integers(5, 400)), int(rng.integers(2, 60))
        points = pd.DataFrame({
            "p": rng.integers(0, 10**4, npts).astype(np.int64),
            "pid": np.arange(npts, dtype=np.int64),
        })
        lo = rng.integers(0, 10**4, nint).astype(np.int64)
        width = rng.integers(0, int(rng.choice([50, 500, 5000])), nint)
        intervals = pd.DataFrame({
            "lo": lo, "hi": (lo + width).astype(np.int64),
            "iid": np.arange(nint, dtype=np.int64),
        })
        con = duckdb.connect()
        con.register("p", points)
        con.register("i", intervals)
        want = con.execute(
            "SELECT i.iid, i.lo, i.hi, p.pid, p.p FROM i JOIN p "
            "ON p.p BETWEEN i.lo AND i.hi"
        ).df()
        got = range_join(
            rd.from_pandas(points).repartition(3),
            rd.from_pandas(intervals).repartition(2),
            point_col="p", lo_col="lo", hi_col="hi", num_buckets=4,
        ).to_pandas()
        _assert_same(got, want, ["iid", "lo", "hi", "pid", "p"],
                     f"range_join/seed{seed}")


@pytest.mark.usefixtures("ray_session")
class TestBucketedAggregateDifferential:
    @pytest.mark.parametrize("seed", SEEDS)
    def test_groupby_matches_duckdb(self, seed):
        import ray.data as rd

        from schema_guru_ray.stages.joins import bucketed_aggregate

        rng = np.random.default_rng(seed)
        n = int(rng.integers(10, 2000))
        card = int(rng.integers(1, max(2, n)))  # up to groups≈rows
        df = pd.DataFrame({
            "k": _keys(rng, n, card),
            "v": rng.integers(-10**6, 10**6, n).astype(np.int64),
        })
        con = duckdb.connect()
        con.register("t", df)
        want = con.execute(
            "SELECT k, sum(v) AS s, min(v) AS mn, max(v) AS mx, "
            "count(*) AS n FROM t GROUP BY k"
        ).df()
        got = bucketed_aggregate(
            rd.from_pandas(df).repartition(3), "k",
            {"s": ("v", "sum"), "mn": ("v", "min"), "mx": ("v", "max"),
             "n": ("v", "count")},
            n_buckets=4,
        ).to_pandas()
        _assert_same(got, want, ["k", "s", "mn", "mx", "n"],
                     f"bucketed_aggregate/seed{seed}")

    @pytest.mark.parametrize("seed", SEEDS[:3])
    def test_multikey_groupby_matches_duckdb(self, seed):
        """Composite (int, string) grouping keys — the XOR-hash tag path."""
        import ray.data as rd

        from schema_guru_ray.stages.joins import bucketed_aggregate

        rng = np.random.default_rng(seed)
        n = int(rng.integers(10, 3000))
        df = pd.DataFrame({
            "k1": rng.integers(0, int(rng.integers(1, 40)), n).astype(np.int64),
            "k2": rng.choice(["a", "b", "c", "d"], n),
            "v": rng.integers(-10**6, 10**6, n).astype(np.int64),
        })
        con = duckdb.connect()
        con.register("t", df)
        want = con.execute(
            "SELECT k1, k2, sum(v) AS s, min(v) AS mn, count(*) AS n "
            "FROM t GROUP BY 1, 2").df()
        got = bucketed_aggregate(
            rd.from_pandas(df).repartition(3), ["k1", "k2"],
            {"s": ("v", "sum"), "mn": ("v", "min"), "n": ("v", "count")},
            n_buckets=4,
        ).to_pandas()
        _assert_same(got, want, ["k1", "k2", "s", "mn", "n"],
                     f"multikey_aggregate/seed{seed}")


@pytest.mark.usefixtures("ray_session")
class TestFullOuterJoinDifferential:
    @pytest.mark.parametrize("seed", SEEDS)
    def test_full_outer_matches_duckdb(self, seed):
        import ray.data as rd

        from schema_guru_ray.stages.joins import bucketed_hash_join

        rng = np.random.default_rng(seed)
        nl, nr = int(rng.integers(5, 300)), int(rng.integers(5, 300))
        # disjoint-ish cardinality windows so both null-extension
        # directions (left-only and right-only keys) actually occur
        left = pd.DataFrame({"k": _keys(rng, nl, int(rng.integers(2, 30))),
                             "lv": rng.integers(-10**6, 10**6, nl).astype(np.int64)})
        right = pd.DataFrame({"k": _keys(rng, nr, int(rng.integers(2, 30))) + 10,
                              "rv": rng.integers(-10**6, 10**6, nr).astype(np.int64)})
        con = duckdb.connect()
        con.register("l", left)
        con.register("r", right)
        want = con.execute(
            "SELECT k, l.lv, r.rv FROM l FULL JOIN r USING (k)").df()
        got = bucketed_hash_join(
            rd.from_pandas(left).repartition(3),
            rd.from_pandas(right).repartition(2),
            on="k", num_buckets=4, join_type="outer",
        ).to_pandas()
        _assert_same(got, want, ["k", "lv", "rv"], f"full_outer/seed{seed}")

    @pytest.mark.parametrize("how", ["outer", "right"])
    @pytest.mark.parametrize("seed", SEEDS[:3])
    def test_salted_outer_flavors_match_duckdb(self, how, seed):
        """Regression (round-5 fuzz find): the salted skew regime used to
        null-extend a REPLICATED right row once per sub-bucket whose
        spread slice was empty — full outer returned 1778 rows where the
        oracle says 515. Hot keys on both sides, including keys present
        ONLY on the right (the left-absent branch must null-extend the
        replicas exactly once)."""
        import ray.data as rd

        from schema_guru_ray.stages.joins import bucketed_hash_join, last_regime

        rng = np.random.default_rng(seed)
        nl, nr = 300, 400
        lk = rng.integers(0, 6, nl).astype(np.int64)
        lk[rng.random(nl) < 0.6] = 2          # hot on left
        rk = rng.integers(0, 6, nr).astype(np.int64)
        rk[rng.random(nr) < 0.5] = 100        # hot key ABSENT on left
        left = pd.DataFrame({"k": lk, "lv": rng.integers(0, 10**6, nl).astype(np.int64)})
        right = pd.DataFrame({"k": rk, "rv": rng.integers(0, 10**6, nr).astype(np.int64)})
        con = duckdb.connect()
        con.register("l", left)
        con.register("r", right)
        sql = ("SELECT k, l.lv, r.rv FROM l FULL JOIN r USING (k)" if how == "outer"
               else "SELECT k, l.lv, r.rv FROM l RIGHT JOIN r USING (k)")
        want = con.execute(sql).df()
        got = bucketed_hash_join(
            rd.from_pandas(left).repartition(3),
            rd.from_pandas(right).repartition(2),
            on="k", num_buckets=4, join_type=how,
            hot_key_threshold=50, hot_salt=4,
        ).to_pandas()
        assert last_regime.get("hot_keys"), "salted regime must engage"
        _assert_same(got, want, ["k", "lv", "rv"], f"salted_{how}/seed{seed}")


@pytest.mark.usefixtures("ray_session")
class TestAntiJoinDifferential:
    @pytest.mark.parametrize("seed", SEEDS)
    def test_anti_join_matches_duckdb(self, seed):
        import ray.data as rd

        from schema_guru_ray.stages.joins import bucketed_anti_join

        rng = np.random.default_rng(seed)
        nl = int(rng.integers(5, 500))
        # every other seed: key side empty (nothing may drop); otherwise a
        # key list with duplicates and partial overlap
        nk = 0 if seed % 2 == 0 else int(rng.integers(1, 200))
        left = pd.DataFrame({"k": _keys(rng, nl, int(rng.integers(1, 50))),
                             "lv": rng.integers(-10**6, 10**6, nl).astype(np.int64)})
        keys = pd.DataFrame({"k": _keys(rng, max(nk, 1), 60)[:nk]})
        con = duckdb.connect()
        con.register("l", left)
        con.register("ks", keys)
        want = con.execute(
            "SELECT l.k, l.lv FROM l WHERE l.k NOT IN "
            "(SELECT k FROM ks WHERE k IS NOT NULL)").df()
        keys_ds = (rd.from_pandas(keys) if nk
                   else rd.from_pandas(keys).filter(lambda r: False))
        got = bucketed_anti_join(
            rd.from_pandas(left).repartition(3), keys_ds, on="k",
            num_buckets=4,
        ).to_pandas()
        _assert_same(got, want, ["k", "lv"], f"anti_join/seed{seed}")
