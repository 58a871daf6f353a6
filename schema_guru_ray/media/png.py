"""Minimal PNG encode/decode in pure stdlib zlib + numpy.

Scope (deliberate, like the audio G.711 path): 8-bit depth, color types
0 (gray), 2 (RGB), 3 (palette), 4 (gray+alpha), 6 (RGBA), non-interlaced
— the overwhelmingly common subset. 16-bit depth and Adam7 interlace
raise :class:`PngDecodeError` with a clear message, as do CRC/length/
signature corruption, so the validation stages can map failures to
"not decodable" exactly like the WAV path.

All five scanline filters decode. The two vectorizable ones (Sub via
per-phase uint8 cumsum, Up via wrapping row add) cover everything this
repo's own encoder emits (filter 0/None rows); Average and Paeth fall to
a per-pixel loop vectorized across channels — images through the
featurize/pHash stages are thumbnails, so the loop is bounded.
"""

from __future__ import annotations

import struct
import zlib
from typing import Dict, Tuple

import numpy as np

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

# channels per pixel by PNG color type (bit depth 8 only)
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngDecodeError(ValueError):
    """Raised when bytes are not a decodable (supported-subset) PNG."""


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload))
        + tag
        + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(img: np.ndarray) -> bytes:
    """uint8 array (H,W) gray, (H,W,3) RGB, or (H,W,4) RGBA -> PNG bytes.

    Rows use filter 0 (None); zlib default level. Deterministic for a
    given array, so digest-pinned corpora stay stable.
    """
    if img.dtype != np.uint8:
        raise ValueError("img must be uint8")
    if img.ndim == 2:
        color_type, arr = 0, img[:, :, None]
    elif img.ndim == 3 and img.shape[2] == 3:
        color_type, arr = 2, img
    elif img.ndim == 3 and img.shape[2] == 4:
        color_type, arr = 6, img
    else:
        raise ValueError(f"unsupported image shape {img.shape}")
    h, w, c = arr.shape
    # one filter-type byte (0) prefixed to each scanline
    raw = np.empty((h, 1 + w * c), dtype=np.uint8)
    raw[:, 0] = 0
    raw[:, 1:] = arr.reshape(h, w * c)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (
        _SIGNATURE
        + _chunk(b"IHDR", ihdr)
        + _chunk(b"IDAT", zlib.compress(raw.tobytes()))
        + _chunk(b"IEND", b"")
    )


def _unfilter(rows: np.ndarray, bpp: int) -> np.ndarray:
    """(H, 1+stride) filtered scanlines -> (H, stride) reconstructed bytes."""
    h, stride = rows.shape[0], rows.shape[1] - 1
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    npx = stride // bpp
    for r in range(h):
        ftype = int(rows[r, 0])
        raw = rows[r, 1:]
        if ftype == 0:
            rec = raw.copy()
        elif ftype == 1:  # Sub: recon[x] = raw[x] + recon[x-bpp] == mod-256 cumsum per phase
            rec = raw.copy()
            for p in range(bpp):
                np.cumsum(rec[p::bpp], dtype=np.uint8, out=rec[p::bpp])
        elif ftype == 2:  # Up
            rec = raw + prev  # uint8 wraps mod 256
        elif ftype in (3, 4):  # Average / Paeth: sequential along x
            rec = np.zeros(stride, dtype=np.uint8)
            px = raw.reshape(npx, bpp).astype(np.int16)
            pv = prev.reshape(npx, bpp).astype(np.int16)
            left = np.zeros(bpp, dtype=np.int16)
            upleft = np.zeros(bpp, dtype=np.int16)
            rv = rec.reshape(npx, bpp)
            for i in range(npx):
                up = pv[i]
                if ftype == 3:
                    pred = (left + up) >> 1
                else:
                    pq = left + up - upleft
                    pa, pb, pc = np.abs(pq - left), np.abs(pq - up), np.abs(pq - upleft)
                    pred = np.where((pa <= pb) & (pa <= pc), left, np.where(pb <= pc, up, upleft))
                cur = (px[i] + pred) & 0xFF
                rv[i] = cur.astype(np.uint8)
                upleft = up
                left = cur
        else:
            raise PngDecodeError(f"unknown scanline filter type {ftype}")
        out[r] = rec
        prev = rec
    return out


def decode_png(buf: bytes) -> np.ndarray:
    """PNG bytes -> uint8 array: (H,W) for gray, (H,W,2) gray+alpha,
    (H,W,3) for RGB/palette, (H,W,4) RGBA. Strict on structure."""
    if len(buf) < 8 or buf[:8] != _SIGNATURE:
        raise PngDecodeError("missing PNG signature")
    pos, ihdr, plte = 8, None, None
    idat: list = []
    seen_end = False
    while pos + 8 <= len(buf):
        (length,) = struct.unpack_from(">I", buf, pos)
        tag = buf[pos + 4 : pos + 8]
        body = buf[pos + 8 : pos + 8 + length]
        if len(body) != length or pos + 12 + length > len(buf):
            raise PngDecodeError(f"truncated {tag!r} chunk")
        (crc,) = struct.unpack_from(">I", buf, pos + 8 + length)
        if zlib.crc32(tag + body) & 0xFFFFFFFF != crc:
            raise PngDecodeError(f"bad CRC on {tag!r} chunk")
        if tag == b"IHDR":
            ihdr = body
        elif tag == b"PLTE":
            plte = body
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            seen_end = True
            break
        pos += 12 + length
    if ihdr is None or not idat or not seen_end:
        raise PngDecodeError("missing IHDR/IDAT/IEND")
    w, h, depth, color_type, comp, filt, interlace = struct.unpack(">IIBBBBB", ihdr)
    if depth != 8:
        raise PngDecodeError(f"unsupported bit depth {depth} (only 8)")
    if color_type not in _CHANNELS:
        raise PngDecodeError(f"unsupported color type {color_type}")
    if comp != 0 or filt != 0:
        raise PngDecodeError("unsupported compression/filter method")
    if interlace != 0:
        raise PngDecodeError("Adam7 interlace unsupported")
    if w == 0 or h == 0:
        raise PngDecodeError("zero-dimension image")
    bpp = _CHANNELS[color_type]
    try:
        raw = zlib.decompress(b"".join(idat))
    except zlib.error as e:
        raise PngDecodeError(f"IDAT inflate failed: {e}") from e
    stride = w * bpp
    if len(raw) != h * (1 + stride):
        raise PngDecodeError(
            f"IDAT size {len(raw)} != expected {h * (1 + stride)}"
        )
    rows = np.frombuffer(raw, dtype=np.uint8).reshape(h, 1 + stride)
    rec = _unfilter(rows, bpp)
    if color_type == 3:
        if plte is None or len(plte) % 3:
            raise PngDecodeError("palette image without valid PLTE")
        pal = np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        idx = rec.reshape(h, w)
        if int(idx.max()) >= pal.shape[0]:
            raise PngDecodeError("palette index out of range")
        return pal[idx]
    if bpp == 1:
        return rec.reshape(h, w)
    return rec.reshape(h, w, bpp)


def to_rgb(img: np.ndarray) -> np.ndarray:
    """Any decode_png output -> (H,W,3) RGB (alpha dropped, gray stacked)."""
    if img.ndim == 2:
        return np.repeat(img[:, :, None], 3, axis=2)
    if img.shape[2] == 2:  # gray+alpha
        return np.repeat(img[:, :, :1], 3, axis=2)
    if img.shape[2] == 4:
        return img[:, :, :3]
    return img
