"""Deterministic sampling operators (stages/sample.py): content-addressed
Bernoulli sampling and per-stratum caps — reproducibility is the contract."""

import numpy as np
import pandas as pd
import pytest


class TestHexMath:
    def test_rate_threshold_exact(self):
        from schema_guru_ray.stages.sample import rate_threshold_hex

        assert rate_threshold_hex(0.2) == "333333333333333"
        assert rate_threshold_hex(0.5) == "800000000000000"
        # rate=1.0 overflows to 16 chars; every 15-digit prefix is smaller,
        # so the `prefix < threshold` compare keeps all rows
        assert rate_threshold_hex(1.0) == "1000000000000000"
        assert len(rate_threshold_hex(0.25)) == 15

    def test_md5_matches_hashlib(self):
        import hashlib

        from schema_guru_ray.stages.sample import md5_hex

        s = pd.Series([1, 2, "abc"])
        assert list(md5_hex(s)) == [
            hashlib.md5(str(x).encode()).hexdigest() for x in [1, 2, "abc"]
        ]


@pytest.mark.usefixtures("ray_session")
class TestSampling:
    def test_sample_rate_and_determinism(self, sf_dir):
        import ray.data as rd

        from schema_guru_ray.stages.sample import deterministic_sample

        ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        a = sorted(deterministic_sample(ds, "doc_id", 0.2).to_pandas()["doc_id"])
        b = sorted(
            deterministic_sample(ds.repartition(5), "doc_id", 0.2).to_pandas()["doc_id"]
        )
        assert a == b  # partitioning-independent
        n = ds.count()
        assert 0.1 * n < len(a) < 0.3 * n  # rate ballpark on 500 docs

    def test_sample_is_nested(self, sf_dir):
        """A 10% sample is a subset of the 20% sample (threshold
        monotonicity) — the property that makes staged curation sane."""
        import ray.data as rd

        from schema_guru_ray.stages.sample import deterministic_sample

        ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id"])
        small = set(deterministic_sample(ds, "doc_id", 0.1).to_pandas()["doc_id"])
        big = set(deterministic_sample(ds, "doc_id", 0.2).to_pandas()["doc_id"])
        assert small <= big

    def test_stratified_cap_matches_pandas(self, sf_dir):
        import ray.data as rd

        from schema_guru_ray.stages.sample import md5_hex, stratified_cap

        ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "event_type"])
        got = (
            stratified_cap(ds.repartition(4), "event_type", "event_id", 7)
            .to_pandas()
            .sort_values(["event_type", "event_id"])
            .reset_index(drop=True)
        )
        df = ds.to_pandas()
        df["__md5"] = md5_hex(df["event_id"])
        want = (
            df.sort_values(["__md5", "event_id"], kind="stable")
            .groupby("event_type", sort=False)
            .head(7)
            .drop(columns="__md5")
            .sort_values(["event_type", "event_id"])
            .reset_index(drop=True)
        )
        assert got[["event_id", "event_type"]].equals(want)
        assert (got.groupby("event_type")["event_id"].count() <= 7).all()

    def test_cap_independent_of_batching(self, sf_dir):
        import ray.data as rd

        from schema_guru_ray.stages.sample import stratified_cap

        ds = rd.read_parquet(f"{sf_dir}/events.parquet", columns=["event_id", "event_type"])
        a = stratified_cap(ds, "event_type", "event_id", 5).to_pandas()
        b = stratified_cap(ds.repartition(9), "event_type", "event_id", 5).to_pandas()
        key = lambda d: sorted(map(tuple, d[["event_type", "event_id"]].to_numpy()))
        assert key(a) == key(b)


@pytest.mark.usefixtures("ray_session")
class TestStratifiedSample:
    def test_mixture_rates(self, sf_dir):
        import ray.data as rd

        from schema_guru_ray.stages.sample import stratified_sample

        ds = rd.read_parquet(f"{sf_dir}/documents.parquet", columns=["doc_id", "lang"])
        out = stratified_sample(ds, "lang", "doc_id", {"en": 1.0}, 0.25).to_pandas()
        full = ds.to_pandas()
        # rate-1.0 stratum keeps EVERYTHING (the 16-char-threshold edge)
        assert (out["lang"] == "en").sum() == (full["lang"] == "en").sum()
        others_full = (full["lang"] != "en").sum()
        others_kept = (out["lang"] != "en").sum()
        assert 0.1 * others_full < others_kept < 0.45 * others_full
        # kept non-en set == the plain 25% sample of non-en (same rule)
        from schema_guru_ray.stages.sample import deterministic_sample

        plain = deterministic_sample(ds, "doc_id", 0.25).to_pandas()
        assert set(out[out["lang"] != "en"]["doc_id"]) == set(
            plain[plain["lang"] != "en"]["doc_id"]
        )


class TestSamplingProperties:
    """Hypothesis properties of the deterministic-sampling primitives."""

    def test_threshold_monotone_and_exact(self):
        from hypothesis import given, strategies as st

        from schema_guru_ray.stages.sample import rate_threshold_hex

        @given(st.floats(min_value=0.0, max_value=0.999999, allow_nan=False))
        def check(rate):
            th = rate_threshold_hex(rate)
            assert len(th) == 15
            # limit_denominator(1e9) approximation error ≤ ~1e-9
            assert abs(int(th, 16) / 16 ** 15 - rate) < 1e-8
        check()

    def test_sample_rate_statistics(self):
        """Over many keys, the kept fraction concentrates near the rate
        (md5 uniformity), and lower rates are strict subsets."""
        import pandas as pd

        from schema_guru_ray.stages.sample import md5_hex, rate_threshold_hex

        keys = pd.Series(range(20_000))
        h = md5_hex(keys).str[:15]
        for rate in (0.1, 0.5, 0.9):
            kept = (h < rate_threshold_hex(rate)).mean()
            assert abs(kept - rate) < 0.02
        kept_10 = set(keys[h < rate_threshold_hex(0.1)])
        kept_50 = set(keys[h < rate_threshold_hex(0.5)])
        assert kept_10 < kept_50
