"""G.711 µ-law / A-law codec in pure numpy — a REAL non-PCM codec behind
the validator's decoder registry (round-4 verdict #9: prove the registry's
extension surface with an actual decode path, not a stub).

The companding formulas are the public ITU-T G.711 tables (same values as
CPython's ``audioop.ulaw2lin`` / ``alaw2lin``, pinned in tests against that
stdlib oracle). Decode is a single 256-entry table gather; encode is exact
nearest-codeword via ``searchsorted`` over the sorted decode table — correct
by construction, no segment-boundary logic to get wrong.

WAV container: RIFF fmt tags 7 (µ-law) and 6 (A-law), mono, 8 bits/sample
(the standard way these codecs travel in .wav files).
"""

from __future__ import annotations

import struct
from typing import Tuple

import numpy as np

from schema_guru_ray.audio.wav import WavDecodeError

WAVE_FORMAT_ALAW = 6
WAVE_FORMAT_MULAW = 7


def _ulaw_table() -> np.ndarray:
    """256 int16 decode values (ITU-T G.711 µ-law expansion)."""
    c = (~np.arange(256, dtype=np.uint8)) & 0xFF
    exp = (c >> 4) & 0x07
    man = (c & 0x0F).astype(np.int32)
    mag = (((man << 3) + 0x84) << exp) - 0x84
    return np.where((c & 0x80) != 0, -mag, mag).astype(np.int16)


def _alaw_table() -> np.ndarray:
    """256 int16 decode values (ITU-T G.711 A-law expansion)."""
    a = np.arange(256, dtype=np.uint8) ^ 0x55
    exp = (a >> 4) & 0x07
    man = (a & 0x0F).astype(np.int32)
    t = np.where(
        exp == 0, (man << 4) + 8, ((man << 4) + 0x108) << np.maximum(exp - 1, 0)
    )
    return np.where((a & 0x80) != 0, t, -t).astype(np.int16)


ULAW_TABLE = _ulaw_table()
ALAW_TABLE = _alaw_table()

# nearest-codeword encoders: sort the decode table once; an input sample
# maps to the codeword whose decoded value is closest (ties to the lower
# midpoint side — deterministic)
def _build_encoder(table: np.ndarray):
    order = np.argsort(table, kind="stable")
    values = table[order].astype(np.int32)
    mids = (values[:-1] + values[1:] + 1) // 2  # decision boundaries

    def encode(pcm: np.ndarray) -> np.ndarray:
        idx = np.searchsorted(mids, pcm.astype(np.int32), side="left")
        return order[idx].astype(np.uint8)

    return encode


_ulaw_encode = _build_encoder(ULAW_TABLE)
_alaw_encode = _build_encoder(ALAW_TABLE)


def ulaw_decode(codes: np.ndarray) -> np.ndarray:
    return ULAW_TABLE[np.asarray(codes, dtype=np.uint8)]


def alaw_decode(codes: np.ndarray) -> np.ndarray:
    return ALAW_TABLE[np.asarray(codes, dtype=np.uint8)]


def ulaw_encode(pcm: np.ndarray) -> np.ndarray:
    return _ulaw_encode(pcm)


def alaw_encode(pcm: np.ndarray) -> np.ndarray:
    return _alaw_encode(pcm)


def encode_wav_g711(pcm: np.ndarray, sample_rate: int, law: str = "ulaw") -> bytes:
    """int16 mono samples → RIFF/WAVE bytes with G.711 payload."""
    if pcm.dtype != np.int16:
        raise ValueError("pcm must be int16")
    if law == "ulaw":
        data = ulaw_encode(pcm).tobytes()
        tag = WAVE_FORMAT_MULAW
    elif law == "alaw":
        data = alaw_encode(pcm).tobytes()
        tag = WAVE_FORMAT_ALAW
    else:
        raise ValueError(f"unknown law {law!r}")
    fmt = struct.pack("<HHIIHH", tag, 1, sample_rate, sample_rate, 1, 8)
    chunks = b"".join(
        [
            b"fmt ", struct.pack("<I", len(fmt)), fmt,
            b"data", struct.pack("<I", len(data)), data,
        ]
    )
    return b"RIFF" + struct.pack("<I", 4 + len(chunks)) + b"WAVE" + chunks


def decode_wav_g711(buf: bytes) -> Tuple[np.ndarray, int]:
    """RIFF/WAVE with a G.711 payload (fmt tag 6/7, mono, 8-bit) →
    (int16 samples, sample_rate). Strict, mirroring ``wav.decode_wav``'s
    contract: anything malformed raises WavDecodeError."""
    if len(buf) < 12 or buf[:4] != b"RIFF" or buf[8:12] != b"WAVE":
        raise WavDecodeError("bad RIFF header")
    (riff_size,) = struct.unpack_from("<I", buf, 4)
    if riff_size + 8 != len(buf):
        raise WavDecodeError("truncated RIFF payload")
    pos, sample_rate, data, tag = 12, None, None, None
    while pos + 8 <= len(buf):
        cid = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8 : pos + 8 + size]
        if len(body) != size:
            raise WavDecodeError("truncated chunk")
        if cid == b"fmt ":
            if size < 16:
                raise WavDecodeError("short fmt chunk")
            tag, channels, sample_rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", body, 0
            )
            if tag not in (WAVE_FORMAT_MULAW, WAVE_FORMAT_ALAW):
                raise WavDecodeError("not a G.711 payload")
            if channels != 1 or bits != 8:
                raise WavDecodeError("not mono 8-bit G.711")
            if sample_rate <= 0:
                raise WavDecodeError("bad sample rate")
        elif cid == b"data":
            data = body
        pos += 8 + size + (size & 1)  # chunks are word-aligned
    if sample_rate is None or data is None or tag is None:
        raise WavDecodeError("missing fmt/data chunk")
    codes = np.frombuffer(data, dtype=np.uint8)
    table = ULAW_TABLE if tag == WAVE_FORMAT_MULAW else ALAW_TABLE
    return table[codes], sample_rate
