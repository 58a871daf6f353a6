"""Multimodal plumbing: the decode chain (real PNG, PIL plug-in, fake
fallback), resize, featurize through a Ray actor pool; real Y4M frame
sampling; ffmpeg plug-in contract for compressed video."""

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
        # PIL is absent in this container → strict mode must raise at
        # decode time for NON-PNG payloads (PNG decodes natively via
        # media/png.py, so strict construction is fine)
        try:
            import PIL  # noqa: F401

            pytest.skip("PIL available; stub gate not applicable")
        except ImportError:
            pass
        feat = ImageFeaturizer(strict=True)
        with pytest.raises(NotImplementedError):
            feat(pd.DataFrame({"doc_id": [1], "media": [b"not-a-png"]}))

    def test_strict_mode_decodes_png_without_pil(self):
        from schema_guru_ray.media.png import encode_png

        img = np.arange(10 * 8 * 3, dtype=np.uint8).reshape(10, 8, 3)
        batch = pd.DataFrame({"doc_id": [7], "media": [encode_png(img)]})
        out = ImageFeaturizer(strict=True)(batch)
        assert int(out["height"][0]) == 10 and int(out["width"][0]) == 8
        # features come from the REAL pixels: channel means match directly
        small = resize_nearest(img, (16, 16)).astype(np.float32)
        want = small.reshape(-1, 3).mean(axis=0) / 255.0
        assert np.allclose(out["features"][0][:3], want, atol=1e-6)

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


def test_frame_sampler_stub_for_compressed():
    # non-Y4M payloads still mark the ffmpeg plug-in point
    with pytest.raises(NotImplementedError):
        FrameSampler()(pd.DataFrame({"doc_id": [1], "media": [b"x"]}))


class TestFrameSampler:
    def test_real_y4m_sampling(self):
        from schema_guru_ray.media.png import decode_png
        from schema_guru_ray.media.y4m import encode_y4m

        rng = np.random.default_rng(3)
        gray = rng.integers(0, 256, size=(7, 6, 8), dtype=np.uint8)
        frames = np.repeat(gray[:, :, :, None], 3, axis=3)
        batch = pd.DataFrame(
            {"doc_id": [5], "media": [encode_y4m(frames)]}
        )
        out = FrameSampler(every_n_frames=3)(batch)
        assert list(out["frame_idx"]) == [0, 3, 6]
        assert (out["height"] == 6).all() and (out["width"] == 8).all()
        # gray content survives YUV420 + PNG byte-exactly
        for _, row in out.iterrows():
            assert np.array_equal(decode_png(row["frame"]), frames[row["frame_idx"]])

    def test_synth_video_determinism_and_motion(self):
        from schema_guru_ray.media.y4m import decode_y4m
        from schema_guru_ray.stages.multimodal import synth_media_y4m

        a, b = synth_media_y4m(b"doc"), synth_media_y4m(b"doc")
        assert a == b
        assert synth_media_y4m(b"doc") != synth_media_y4m(b"other")
        frames = decode_y4m(a)
        assert frames.shape == (6, 16, 16, 3)
        assert not np.array_equal(frames[0], frames[1])  # real motion


class TestPHash:
    @staticmethod
    def _img(seed):
        r = np.random.default_rng(seed)
        y, x = np.mgrid[0:64, 0:64]
        img = np.zeros((64, 64))
        for _ in range(6):
            fx, fy = r.uniform(0.2, 3, 2)
            img += r.uniform(50, 100) * np.cos(
                2 * np.pi * (fx * x / 64 + fy * y / 64) + r.uniform(0, 6)
            )
        return img - img.min()

    def test_noise_robust_and_discriminative(self):
        from schema_guru_ray.stages.multimodal import phash64

        ham = lambda p, q: bin(int(p) ^ int(q)).count("1")
        a = self._img(1)
        noisy = a + np.random.default_rng(99).normal(0, 2.0, a.shape)
        assert ham(phash64(a), phash64(a)) == 0
        assert ham(phash64(a), phash64(noisy)) <= 3
        assert ham(phash64(a), phash64(self._img(2))) > 10

    def test_dup_pairs_over_media(self, ray_session):
        import ray.data as rd

        from schema_guru_ray.stages.multimodal import phash_dup_pairs

        # identical payloads → identical fake-decoded pixels → hamming 0
        rows = [
            {"doc_id": 1, "media": b"payload-A"},
            {"doc_id": 2, "media": b"payload-B"},
            {"doc_id": 3, "media": b"payload-A"},   # dup of 1
            {"doc_id": 4, "media": b"payload-C"},
        ]
        pairs = phash_dup_pairs(rd.from_items(rows)).to_pandas()
        assert len(pairs) == 1
        assert (int(pairs["id_a"][0]), int(pairs["id_b"][0])) == (1, 3)
        assert int(pairs["hamming"][0]) == 0
