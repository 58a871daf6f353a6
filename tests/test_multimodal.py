"""Multimodal plumbing: deterministic fake image decode, resize, featurize
through a Ray actor pool; video stub contract."""

import numpy as np
import pandas as pd
import pytest

from schema_guru_ray.stages.multimodal import (
    FrameSampler,
    ImageFeaturizer,
    fake_decode_image,
    resize_nearest,
)


class TestFakeDecode:
    def test_deterministic(self):
        assert np.array_equal(fake_decode_image(b"abc"), fake_decode_image(b"abc"))
        assert not np.array_equal(fake_decode_image(b"abc"), fake_decode_image(b"abd"))

    def test_resize(self):
        img = np.arange(64 * 48 * 3, dtype=np.uint8).reshape(64, 48, 3)
        out = resize_nearest(img, (16, 16))
        assert out.shape == (16, 16, 3)


class TestImageFeaturizer:
    def test_batch_contract(self):
        batch = pd.DataFrame({"doc_id": [1, 2], "media": [b"img-a", b"img-b"]})
        out = ImageFeaturizer()(batch)
        assert list(out.columns) == ["doc_id", "height", "width", "features"]
        assert out["features"][0].shape == (11,)  # 3 channel means + 8 hist bins
        assert out["features"][0].dtype == np.float32

    def test_strict_mode_marks_stub(self):
        # PIL is absent in this container → strict construction must raise
        try:
            import PIL  # noqa: F401

            pytest.skip("PIL available; stub gate not applicable")
        except ImportError:
            pass
        with pytest.raises(NotImplementedError):
            ImageFeaturizer(strict=True)

    @pytest.mark.usefixtures("ray_session")
    def test_actor_pool_integration(self):
        import ray.data as rd

        df = pd.DataFrame(
            {"doc_id": range(40), "media": [f"payload-{i}".encode() for i in range(40)]}
        )
        ds = rd.from_pandas(df).repartition(4)
        out = ds.map_batches(
            ImageFeaturizer,
            batch_format="pandas",
            batch_size=8,  # small batches: wide binary rows
            concurrency=2,
            num_cpus=1,
        ).to_pandas()
        assert len(out) == 40
        assert (out["height"] == 32).all()


def test_frame_sampler_stub():
    with pytest.raises(NotImplementedError):
        FrameSampler()(pd.DataFrame({"doc_id": [1], "media": [b"x"]}))
