"""Unit tests for stages/warm.py — warm-task kernel execution."""

import pandas as pd
import pyarrow as pa

from schema_guru_ray.stages import warm
from schema_guru_ray.stages.warm import warm_kernel


class _CountingKernel:
    constructions = 0

    def __init__(self, scale: int = 1):
        type(self).constructions += 1
        self.scale = scale

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        return batch.set_column(
            0, "n", pc.multiply(batch["n"], self.scale)
        )


class TestWarmKernel:
    def test_constructs_once_per_config(self):
        warm._CACHE.clear()
        _CountingKernel.constructions = 0
        fn = warm_kernel(_CountingKernel, scale=3)
        batch = pa.table({"n": [1, 2, 3]})
        out1 = fn(batch)
        out2 = fn(batch)
        assert _CountingKernel.constructions == 1
        assert out1["n"].to_pylist() == [3, 6, 9]
        assert out2["n"].to_pylist() == [3, 6, 9]

    def test_distinct_configs_distinct_instances(self):
        warm._CACHE.clear()
        _CountingKernel.constructions = 0
        f2 = warm_kernel(_CountingKernel, scale=2)
        f5 = warm_kernel(_CountingKernel, scale=5)
        batch = pa.table({"n": [10]})
        assert f2(batch)["n"].to_pylist() == [20]
        assert f5(batch)["n"].to_pylist() == [50]
        assert _CountingKernel.constructions == 2

    def test_name_reflects_kernel(self):
        fn = warm_kernel(_CountingKernel)
        assert fn.__name__ == "warm__CountingKernel"

    def test_through_map_batches(self, ray_session):
        import ray.data as rd

        # Defined inside the test so cloudpickle ships the class by value —
        # Ray workers cannot import the test module itself.
        class ScaleKernel:
            def __init__(self, scale: int = 1):
                self.scale = scale

            def __call__(self, batch: pa.Table) -> pa.Table:
                import pyarrow.compute as pc

                return batch.set_column(0, "n", pc.multiply(batch["n"], self.scale))

        # Regression: a driver-side cached instance of a class workers can't
        # import (this test module) must NOT ship with the serialized UDF.
        warm_kernel(_CountingKernel, scale=7)(pa.table({"n": [1]}))
        assert any(k[0] == __name__ for k in warm._CACHE)

        ds = rd.from_pandas(pd.DataFrame({"n": range(32)}))
        out = ds.map_batches(
            warm_kernel(ScaleKernel, scale=4),
            batch_format="pyarrow", batch_size=8,
        ).to_pandas()
        assert sorted(out["n"]) == [i * 4 for i in range(32)]
