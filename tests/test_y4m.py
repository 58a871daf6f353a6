"""Pure-stdlib Y4M video codec (media/y4m.py): round-trips, colorspace
handling, streaming frame iteration, and the strict decode-error surface."""

import numpy as np
import pytest

from schema_guru_ray.media.y4m import (
    Y4mDecodeError,
    decode_y4m,
    encode_y4m,
    iter_y4m_frames,
)


def _gray_frames(n, h, w, seed=5):
    rng = np.random.Generator(np.random.PCG64(seed))
    g = rng.integers(0, 256, size=(n, h, w), dtype=np.uint8)
    return np.repeat(g[:, :, :, None], 3, axis=3)


class TestRoundTrip:
    def test_gray_is_byte_exact(self):
        # Cb=Cr=128 for gray content, so 4:2:0 subsampling is lossless
        frames = _gray_frames(3, 6, 8)
        out = decode_y4m(encode_y4m(frames))
        assert out.shape == frames.shape
        assert np.array_equal(out, frames)

    def test_block_constant_color_within_rounding(self):
        rng = np.random.Generator(np.random.PCG64(9))
        small = rng.integers(0, 256, size=(2, 3, 4, 3), dtype=np.uint8)
        frames = np.repeat(np.repeat(small, 2, axis=1), 2, axis=2)
        out = decode_y4m(encode_y4m(frames))
        assert int(np.abs(out.astype(int) - frames.astype(int)).max()) <= 2

    def test_c444_no_subsampling(self):
        rng = np.random.Generator(np.random.PCG64(10))
        frames = rng.integers(0, 256, size=(2, 5, 7, 3), dtype=np.uint8)
        out = decode_y4m(encode_y4m(frames, colorspace="444"))
        assert int(np.abs(out.astype(int) - frames.astype(int)).max()) <= 2

    def test_deterministic_bytes(self):
        frames = _gray_frames(2, 4, 4)
        assert encode_y4m(frames) == encode_y4m(frames)


class TestStreaming:
    def test_iter_counts_frames(self):
        buf = encode_y4m(_gray_frames(7, 4, 6))
        assert sum(1 for _ in iter_y4m_frames(buf)) == 7

    def test_iter_matches_decode(self):
        frames = _gray_frames(4, 6, 8)
        buf = encode_y4m(frames)
        for got, want in zip(iter_y4m_frames(buf), frames):
            assert np.array_equal(got, want)


class TestStrictness:
    def test_garbage_and_truncation(self):
        buf = encode_y4m(_gray_frames(2, 4, 4))
        for bad in [b"nope", buf[:8], buf[:-5], buf[: len(buf) - 40]]:
            with pytest.raises(Y4mDecodeError):
                decode_y4m(bad)

    def test_odd_dims_reject_420(self):
        with pytest.raises(ValueError):
            encode_y4m(_gray_frames(1, 5, 4))
        # hand-built odd-dimension 420 header
        with pytest.raises(Y4mDecodeError):
            decode_y4m(b"YUV4MPEG2 W5 H4 F25:1 Ip A1:1 C420jpeg\nFRAME\n" + b"\x00" * 40)

    def test_unsupported_colorspace(self):
        with pytest.raises(Y4mDecodeError):
            decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 C422\nFRAME\n" + b"\x00" * 32)

    def test_empty_stream_rejected(self):
        with pytest.raises(Y4mDecodeError):
            decode_y4m(b"YUV4MPEG2 W4 H4 F25:1 C420jpeg\n")

    def test_corrupt_frame_marker(self):
        buf = encode_y4m(_gray_frames(2, 4, 4))
        bad = buf.replace(b"FRAME\n", b"FRAMR\n", 1)
        with pytest.raises(Y4mDecodeError):
            decode_y4m(bad)
