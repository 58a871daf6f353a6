"""Pure-stdlib PNG codec (media/png.py): round-trips, all five scanline
filters against a scalar reference decoder, palette images, and the
strict decode-error surface."""

import struct
import zlib

import numpy as np
import pytest

from schema_guru_ray.media.png import (
    PngDecodeError,
    _SIGNATURE,
    _chunk,
    decode_png,
    encode_png,
    to_rgb,
)


def _ref_predict(ft, a, b, c):
    """Scalar per-byte PNG filter predictor (the spec's reference form)."""
    if ft == 0:
        return 0
    if ft == 1:
        return a
    if ft == 2:
        return b
    if ft == 3:
        return (a + b) // 2
    q = a + b - c
    pa, pb, pc = abs(q - a), abs(q - b), abs(q - c)
    return a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)


def _filter_image(img, filter_types):
    """Apply per-row filters to a (H, W, C) image, returning scanlines."""
    h, w, c = img.shape
    flat = img.reshape(h, w * c).astype(np.int32)
    rows = np.zeros((h, 1 + w * c), dtype=np.uint8)
    for r in range(h):
        ft = filter_types[r]
        rows[r, 0] = ft
        for x in range(w * c):
            a = flat[r, x - c] if x >= c else 0
            b = flat[r - 1, x] if r > 0 else 0
            cc = flat[r - 1, x - c] if (r > 0 and x >= c) else 0
            rows[r, 1 + x] = (flat[r, x] - _ref_predict(ft, a, b, cc)) & 0xFF
    return rows


def _wrap(rows, w, h, color_type, plte=None):
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    body = _SIGNATURE + _chunk(b"IHDR", ihdr)
    if plte is not None:
        body += _chunk(b"PLTE", plte)
    return body + _chunk(b"IDAT", zlib.compress(rows.tobytes())) + _chunk(b"IEND", b"")


class TestRoundTrip:
    @pytest.mark.parametrize(
        "shape", [(5, 7), (8, 3, 3), (4, 6, 4), (1, 1), (2, 2, 3), (32, 32, 3)]
    )
    def test_encode_decode(self, shape):
        rng = np.random.Generator(np.random.PCG64(7))
        img = rng.integers(0, 256, size=shape, dtype=np.uint8)
        out = decode_png(encode_png(img))
        assert out.shape == img.shape
        assert np.array_equal(out, img)

    def test_deterministic_bytes(self):
        img = np.arange(48, dtype=np.uint8).reshape(4, 4, 3)
        assert encode_png(img) == encode_png(img)


class TestFilters:
    def test_all_five_filters_decode(self):
        rng = np.random.Generator(np.random.PCG64(11))
        img = rng.integers(0, 256, size=(6, 5, 3), dtype=np.uint8)
        rows = _filter_image(img, [0, 1, 2, 3, 4, 4])
        got = decode_png(_wrap(rows, 5, 6, color_type=2))
        assert np.array_equal(got, img)

    def test_gray_alpha_filters(self):
        rng = np.random.Generator(np.random.PCG64(12))
        img = rng.integers(0, 256, size=(5, 4, 2), dtype=np.uint8)
        rows = _filter_image(img, [4, 3, 1, 2, 0])
        got = decode_png(_wrap(rows, 4, 5, color_type=4))
        assert np.array_equal(got, img)
        assert to_rgb(got).shape == (5, 4, 3)


class TestPalette:
    def test_palette_lookup(self):
        rng = np.random.Generator(np.random.PCG64(13))
        pal = rng.integers(0, 256, size=(4, 3), dtype=np.uint8)
        idx = rng.integers(0, 4, size=(3, 4), dtype=np.uint8)
        rows = np.zeros((3, 1 + 4), dtype=np.uint8)
        rows[:, 1:] = idx
        got = decode_png(_wrap(rows, 4, 3, color_type=3, plte=pal.tobytes()))
        assert np.array_equal(got, pal[idx])

    def test_out_of_range_index_raises(self):
        pal = np.zeros((2, 3), dtype=np.uint8)
        rows = np.zeros((1, 2), dtype=np.uint8)
        rows[0, 1] = 5  # index 5 into a 2-entry palette
        with pytest.raises(PngDecodeError):
            decode_png(_wrap(rows, 1, 1, color_type=3, plte=pal.tobytes()))


class TestStrictness:
    def test_garbage_and_truncation(self):
        img = np.zeros((4, 4, 3), dtype=np.uint8)
        buf = encode_png(img)
        for bad in [b"nope", buf[:8], buf[:-5], buf[: len(buf) // 2]]:
            with pytest.raises(PngDecodeError):
                decode_png(bad)

    def test_crc_corruption(self):
        b = bytearray(encode_png(np.zeros((4, 4, 3), dtype=np.uint8)))
        b[40] ^= 0xFF
        with pytest.raises(PngDecodeError):
            decode_png(bytes(b))

    def test_unsupported_depth_and_interlace(self):
        rows = np.zeros((1, 4), dtype=np.uint8)
        for depth, interlace in [(16, 0), (8, 1)]:
            ihdr = struct.pack(">IIBBBBB", 1, 1, depth, 2, 0, 0, interlace)
            buf = (
                _SIGNATURE
                + _chunk(b"IHDR", ihdr)
                + _chunk(b"IDAT", zlib.compress(rows.tobytes()))
                + _chunk(b"IEND", b"")
            )
            with pytest.raises(PngDecodeError):
                decode_png(buf)


class TestDecoderChain:
    def test_phash_runs_on_real_png(self):
        from schema_guru_ray.stages.multimodal import decode_image, phash64

        y, x = np.mgrid[0:40, 0:40]
        img = ((np.cos(x / 5) + np.cos(y / 7) + 2) * 60).astype(np.uint8)
        rgb = np.repeat(img[:, :, None], 3, axis=2)
        buf = encode_png(rgb)
        assert np.array_equal(decode_image(buf), rgb)
        # same pixels → same hash whether fed as array or via PNG bytes
        assert phash64(decode_image(buf)) == phash64(rgb)
