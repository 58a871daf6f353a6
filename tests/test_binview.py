"""Unit tests for stages/binview.py — zero-copy Arrow binary access.

The decode kernels consume these views through the WAV/G.711 parsers, so
the contract under test is: same values as to_pylist(), None for nulls,
correct handling of chunking, slice offsets, and large_binary — with NO
copy of the value buffer.
"""

import numpy as np
import pyarrow as pa
import pytest

from schema_guru_ray.stages.binview import binary_views


def _as_bytes(views):
    return [None if v is None else bytes(v) for v in views]


class TestBinaryViews:
    def test_matches_to_pylist(self):
        vals = [b"hello", b"", b"\x00\x01\x02", b"x" * 1000]
        arr = pa.array(vals, pa.binary())
        assert _as_bytes(binary_views(arr)) == arr.to_pylist()

    def test_nulls(self):
        vals = [b"a", None, b"c", None]
        arr = pa.array(vals, pa.binary())
        assert _as_bytes(binary_views(arr)) == vals

    def test_chunked(self):
        c = pa.chunked_array(
            [pa.array([b"a", b"bb"]), pa.array([], pa.binary()), pa.array([None, b"ccc"])]
        )
        assert _as_bytes(binary_views(c)) == [b"a", b"bb", None, b"ccc"]

    def test_sliced_array_offsets(self):
        arr = pa.array([b"zero", b"one", b"two", b"three"], pa.binary())
        sl = arr.slice(1, 2)
        assert _as_bytes(binary_views(sl)) == [b"one", b"two"]

    def test_large_binary(self):
        arr = pa.array([b"big", None, b"payload"], pa.large_binary())
        assert _as_bytes(binary_views(arr)) == [b"big", None, b"payload"]

    def test_zero_copy(self):
        payload = b"y" * 4096
        arr = pa.array([payload], pa.binary())
        (view,) = binary_views(arr)
        # the view addresses the Arrow value buffer itself, not a copy
        buf_addr = arr.buffers()[2].address
        np_view = np.frombuffer(view, dtype=np.uint8)
        assert np_view.ctypes.data == buf_addr
        assert bytes(view) == payload

    def test_wav_parser_accepts_views(self):
        from schema_guru_ray.audio.wav import decode_wav, encode_wav

        pcm = (np.arange(100) % 7 * 100).astype(np.int16)
        arr = pa.array([encode_wav(pcm, 8000)], pa.binary())
        (view,) = binary_views(arr)
        out, sr = decode_wav(view)
        assert sr == 8000
        assert np.array_equal(out, pcm)

    def test_rejects_non_binary(self):
        with pytest.raises(TypeError):
            binary_views(pa.array([1, 2, 3]))
