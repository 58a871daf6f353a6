"""Bloom filter: membership guarantees, FP rate, merge, semi/anti join."""

import numpy as np
import pandas as pd
import pytest

from schema_guru_ray.sketches.bloom import BloomFilter, build_bloom, semi_join_bloom


class TestBloomFilter:
    def test_no_false_negatives(self):
        f = BloomFilter.sized_for(1000)
        vals = pd.Series([f"key-{i}" for i in range(1000)])
        f.add_many(vals)
        assert f.contains_many(vals).all()

    def test_fp_rate_bounded(self):
        f = BloomFilter.sized_for(5000, fp_rate=0.01)
        f.add_many(pd.Series([f"in-{i}" for i in range(5000)]))
        probes = pd.Series([f"out-{i}" for i in range(20000)])
        fp = f.contains_many(probes).mean()
        assert fp < 0.03

    def test_merge_equals_whole(self):
        vals = pd.Series([f"k{i}" for i in range(2000)])
        proto = BloomFilter.sized_for(2000)
        a = BloomFilter(proto.n_bits, proto.n_hashes).add_many(vals[:1200])
        b = BloomFilter(proto.n_bits, proto.n_hashes).add_many(vals[1000:])
        whole = BloomFilter(proto.n_bits, proto.n_hashes).add_many(vals)
        assert np.array_equal(a.merge(b).bits, whole.bits)

    def test_serialization(self):
        f = BloomFilter.sized_for(100).add_many(pd.Series(["a", "b"]))
        rt = BloomFilter.from_bytes(f.to_bytes())
        assert rt.contains_many(pd.Series(["a", "b"])).all()
        assert not rt.contains_many(pd.Series(["zqx"])).any()

    def test_int_keys(self):
        f = BloomFilter.sized_for(100).add_many(pd.Series([1, 2, 3]))
        assert f.contains_many(pd.Series([1, 2, 3])).all()


@pytest.mark.usefixtures("ray_session")
class TestSemiJoinBloom:
    def test_semi_and_anti(self, sf_dir):
        import ray.data as rd

        orders = rd.read_parquet(f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
        customers = rd.read_parquet(f"{sf_dir}/customer.parquet", columns=["c_custkey"])
        semi = semi_join_bloom(orders, customers, on="o_custkey", keys_column="c_custkey")
        anti = semi_join_bloom(orders, customers, on="o_custkey", keys_column="c_custkey", anti=True)
        n_semi, n_anti, n_all = semi.count(), anti.count(), orders.count()
        assert n_semi + n_anti == n_all
        # exact check: every semi survivor's custkey is (probably) a customer;
        # verify against the exact set, allowing the documented FP slack
        keys = set(r["c_custkey"] for r in customers.take_all())
        fp = sum(1 for r in semi.take_all() if r["o_custkey"] not in keys)
        assert fp <= max(5, 0.03 * n_all)


@pytest.mark.usefixtures("ray_session")
class TestReferentialOrphansRegimes:
    def test_bloom_regime_matches_exact(self, sf_dir):
        """Forcing the huge-key-side regime (Bloom prune + survivor probe)
        must give the same orphan count as the exact broadcast regime."""
        from schema_guru_ray.pipelines.queries import referential_orphans

        exact = referential_orphans(sf_dir)
        bloom = referential_orphans(sf_dir, exact_broadcast_limit=0)
        assert int(exact["n_orphans"].iloc[0]) == int(bloom["n_orphans"].iloc[0])
