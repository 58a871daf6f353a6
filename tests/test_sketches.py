"""HLL / KLL / drift sketch properties: accuracy bounds, merge = whole,
serialization round-trip, determinism."""

import numpy as np
import pandas as pd
import pytest

from schema_guru_ray.sketches import HLL, KLL, ks_statistic, psi
from schema_guru_ray.stages.profile import stable_hash64


def _hashes(n, prefix="v"):
    return stable_hash64(pd.Series([f"{prefix}{i}" for i in range(n)]))


class TestHLL:
    def test_accuracy(self):
        sk = HLL(12).add_hashes(_hashes(50000))
        assert abs(sk.estimate() - 50000) / 50000 < 0.05

    def test_small_range_exactish(self):
        sk = HLL(12).add_hashes(_hashes(200))
        assert abs(sk.estimate() - 200) < 10

    def test_merge_equals_whole(self):
        h = _hashes(10000)
        a = HLL(12).add_hashes(h[:6000])
        b = HLL(12).add_hashes(h[4000:])
        whole = HLL(12).add_hashes(h)
        assert a.merge(b).estimate() == whole.estimate()

    def test_serialization(self):
        sk = HLL(12).add_hashes(_hashes(1000))
        assert HLL.from_bytes(sk.to_bytes()).estimate() == sk.estimate()

    def test_duplicates_do_not_inflate(self):
        h = np.tile(_hashes(100), 50)
        sk = HLL(12).add_hashes(h)
        assert abs(sk.estimate() - 100) < 10


class TestKLL:
    def test_quantile_accuracy(self):
        rng = np.random.default_rng(7)
        data = rng.normal(0, 1, 100000)
        sk = KLL(200)
        for chunk in np.array_split(data, 23):
            sk.add_many(chunk)
        for q in (0.1, 0.5, 0.9):
            assert abs(sk.quantile(q) - np.quantile(data, q)) < 0.08
        assert sk.n == 100000

    def test_merge_accuracy(self):
        rng = np.random.default_rng(8)
        data = rng.uniform(0, 100, 60000)
        a = KLL(200).add_many(data[:30000])
        b = KLL(200).add_many(data[30000:])
        m = a.merge(b)
        assert abs(m.quantile(0.5) - 50) < 3
        assert m.n == 60000

    def test_bounded_memory(self):
        sk = KLL(200)
        for chunk in np.array_split(np.arange(500000, dtype=float), 100):
            sk.add_many(chunk)
        assert sum(len(l) for l in sk.levels) < 3000

    def test_serialization(self):
        sk = KLL(100).add_many(np.arange(1000, dtype=float))
        rt = KLL.from_bytes(sk.to_bytes())
        assert rt.quantile(0.5) == sk.quantile(0.5)

    def test_empty(self):
        assert KLL().quantile(0.5) is None


class TestDrift:
    def test_psi_zero_on_identical(self):
        sk = KLL().add_many(np.random.default_rng(0).normal(0, 1, 10000))
        assert psi(sk, sk) == pytest.approx(0.0, abs=1e-9)
        assert ks_statistic(sk, sk) == 0.0

    def test_psi_detects_shift(self):
        rng = np.random.default_rng(1)
        base = KLL().add_many(rng.normal(0, 1, 50000))
        same = KLL().add_many(rng.normal(0, 1, 50000))
        shifted = KLL().add_many(rng.normal(0.6, 1, 50000))
        assert psi(base, same) < 0.05
        assert psi(base, shifted) > 0.25
        assert ks_statistic(base, shifted) > 0.15


@pytest.mark.usefixtures("ray_session")
class TestApproxQuantilesQuery:
    def test_measured_rank_error_within_design_bound(self, sf_dir):
        """The distributed KLL quantile query certifies itself: its
        reported rank error (true rank of the sketch answer vs requested
        q, measured over the full column in-run) must sit inside the
        k=800 design envelope with headroom."""
        from schema_guru_ray.pipelines.queries import (
            approx_quantiles_extendedprice,
        )

        out = approx_quantiles_extendedprice(sf_dir)
        assert list(out["q"]) == [0.25, 0.5, 0.75, 0.95]
        assert int(out["n"].iloc[0]) > 0
        # k=800 single-level eps ~ O(1/k); allow generous slack for the
        # deterministic-compaction variant + merge depth
        assert (out["rank_error"] <= 0.02).all(), out.to_dict("records")
        # the approximate values are real data values within column range
        assert out["approx_value"].is_monotonic_increasing


class TestMisraGries:
    def test_guarantee_superset_and_bounds(self):
        """Every item with true count > n/(cap+1) survives, and estimates
        undercount by at most error_bound() <= n/(cap+1)."""
        from schema_guru_ray.sketches.heavy import MisraGries

        rng = np.random.default_rng(7)
        # zipf-ish stream over 2000 distinct keys, capacity 50
        keys = rng.zipf(1.3, size=20000) % 2000
        true = pd.Series(keys).value_counts()
        mg = MisraGries(50)
        for chunk in np.array_split(keys, 13):
            counts = pd.Series(chunk).value_counts()
            mg.add_counts(zip(counts.index.to_list(), counts.to_numpy()))
        n = len(keys)
        assert mg.n == n
        assert mg.error_bound() <= n // 51
        est = dict(mg.counters)
        for k_, t in true.items():
            if t > n // 51:
                assert k_ in est, f"heavy key {k_} (count {t}) evicted"
            if k_ in est:
                assert est[k_] <= t
                assert est[k_] >= t - mg.error_bound()

    def test_merge_equals_single_stream(self):
        """Merge of per-part sketches keeps the deterministic guarantee:
        merged keys ⊇ heavy items, estimates within the summed bound."""
        from schema_guru_ray.sketches.heavy import MisraGries

        rng = np.random.default_rng(11)
        keys = (rng.zipf(1.5, size=9000) % 500).tolist()
        parts = [keys[i::4] for i in range(4)]
        sketches = []
        for p in parts:
            counts = pd.Series(p).value_counts()
            sketches.append(
                MisraGries(40).add_counts(zip(counts.index.to_list(), counts.to_numpy()))
            )
        merged = sketches[0]
        for s in sketches[1:]:
            merged = merged.merge(s)
        true = pd.Series(keys).value_counts()
        n = len(keys)
        assert merged.n == n
        assert merged.error_bound() <= n // 41
        for k_, t in true.items():
            if t > merged.error_bound():
                assert k_ in merged.counters
            if k_ in merged.counters:
                assert merged.counters[k_] <= t

    def test_capacity_one_majority(self):
        from schema_guru_ray.sketches.heavy import MisraGries

        mg = MisraGries(1).add_counts([("a", 6), ("b", 2), ("c", 1)])
        # majority element survives as the single counter
        assert list(mg.counters) == ["a"]


class TestDriftTracksExact:
    """The sketch-based PSI/KS (what clips_drift runs at scale) must track
    the EXACT statistics computed from the raw samples — the same
    measured-error discipline the IVF recall check uses. The exact PSI
    here replays sketches/drift.py's decile-bin construction with true
    numpy quantiles; exact KS is the classic two-sample sup-distance."""

    def _data(self):
        rng = np.random.default_rng(7)
        base = rng.normal(0.0, 1.0, 20000)
        cur = rng.normal(0.3, 1.1, 20000)
        return base, cur

    @staticmethod
    def _exact_psi(base, cur, n_bins=10, eps=1e-6):
        edges = np.unique(np.quantile(base, np.linspace(0, 1, n_bins + 1)[1:-1]))
        def props(x):
            cdf = np.searchsorted(np.sort(x), edges, side="right") / x.size
            return np.clip(np.diff(np.concatenate([[0.0], cdf, [1.0]])), eps, None)
        p, q = props(base), props(cur)
        p, q = p / p.sum(), q / q.sum()
        return float(np.sum((p - q) * np.log(p / q)))

    @staticmethod
    def _exact_ks(base, cur):
        xs = np.unique(np.concatenate([base, cur]))
        fb = np.searchsorted(np.sort(base), xs, side="right") / base.size
        fc = np.searchsorted(np.sort(cur), xs, side="right") / cur.size
        return float(np.max(np.abs(fb - fc)))

    def test_psi_within_sketch_error(self):
        base, cur = self._data()
        skb = KLL(200).add_many(base)
        skc = KLL(200).add_many(cur)
        exact = self._exact_psi(base, cur)
        assert exact > 0.05  # the shift is real
        assert abs(psi(skb, skc) - exact) < 0.25 * exact + 0.01

    def test_ks_within_sketch_error(self):
        base, cur = self._data()
        skb = KLL(200).add_many(base)
        skc = KLL(200).add_many(cur)
        exact = self._exact_ks(base, cur)
        assert exact > 0.05
        # KLL(k=200) rank error ~1.7/k per side
        assert abs(ks_statistic(skb, skc) - exact) < 0.03


@pytest.mark.usefixtures("ray_session")
class TestExactQuantilesContinuous:
    def test_matches_numpy_disc_quantiles(self):
        import numpy as np
        import pandas as pd
        import ray.data as rd

        from schema_guru_ray.stages.profile import exact_quantiles_continuous

        rng = np.random.default_rng(11)
        v = np.concatenate([rng.lognormal(3, 1, 5001), [0.0, 1e6]])
        ds = rd.from_pandas(pd.DataFrame({"x": v})).repartition(5)
        got = exact_quantiles_continuous(ds, "x", n_bins=256)
        s = np.sort(v)
        n = len(s)
        for q, val in got.items():
            k = int(np.ceil(q * n))  # smallest rank with cum >= q*n
            assert val == s[k - 1], (q, val, s[k - 1])

    def test_constant_column(self):
        import pandas as pd
        import ray.data as rd

        from schema_guru_ray.stages.profile import exact_quantiles_continuous

        ds = rd.from_pandas(pd.DataFrame({"x": [7.5] * 100}))
        got = exact_quantiles_continuous(ds, "x")
        assert all(val == 7.5 for val in got.values())
