"""corr_stats_lineitem must stay EXACT past int64: Σy² over 10^7-cent
prices crosses 2^63 at ~10^5 rows (the round-4 full-catalog bench caught
this at sf0.1), so the sums ride as decimal strings through a Python-int
tree merge while DuckDB promotes to HUGEINT. This pins the behavior on a
synthetic table engineered to overflow int64 in every sum path."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pytest


class TestCorrOverflow:
    @pytest.fixture(scope="class")
    def big_sf_dir(self, tmp_path_factory):
        """A lineitem table whose Σy² ≈ 2×10^21 — 200× past int64."""
        d = tmp_path_factory.mktemp("corr_overflow")
        rng = np.random.default_rng(7)
        n = 200_000
        pd.DataFrame(
            {
                "l_quantity": rng.integers(1, 51, n).astype("int64"),
                # ~1e5 dollars → 1e7 cents → y² ≈ 1e14 per row
                "l_extendedprice": rng.uniform(90_000.0, 110_000.0, n),
            }
        ).to_parquet(d / "lineitem.parquet", index=False)
        return str(d)

    def test_exact_past_int64(self, ray_session, big_sf_dir):
        from schema_guru_ray.pipelines.queries import corr_stats_lineitem

        out = corr_stats_lineitem(big_sf_dir).to_pandas()
        assert len(out) == 1

        # exact reference with unbounded Python ints
        df = pd.read_parquet(big_sf_dir + "/lineitem.parquet")
        x = [int(v) for v in df["l_quantity"]]
        y = [int(np.floor(v * 100 + 0.5)) for v in df["l_extendedprice"]]
        exp = {
            "n": len(x),
            "sum_x": sum(x),
            "sum_y": sum(y),
            "sum_xy": sum(a * b for a, b in zip(x, y)),
            "sum_x2": sum(a * a for a in x),
            "sum_y2": sum(b * b for b in y),
        }
        assert exp["sum_y2"] > 2**63  # the fixture really overflows
        assert int(out["n"].iloc[0]) == exp["n"]
        for c in ("sum_x", "sum_y", "sum_xy", "sum_x2", "sum_y2"):
            assert int(out[c].iloc[0]) == exp[c], c
