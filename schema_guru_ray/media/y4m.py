"""Minimal YUV4MPEG2 (.y4m) video decode/encode in pure numpy.

Y4M is the uncompressed raw-video interchange format used throughout the
ffmpeg/x264 toolchain: a text header (``YUV4MPEG2 W<w> H<h> F<n>:<d> ...``)
followed by ``FRAME`` records of raw planar YUV. Scope here (the honest
subset, like the WAV/G.711/PNG codecs): 8-bit ``C420jpeg``/``C420``/
``C420mpeg2`` (4:2:0, the default) and ``C444``; anything else raises
:class:`Y4mDecodeError`, as do header/frame truncation — so validation
stages can map failures to "not decodable" exactly like the audio path.

Color math is the full-range JPEG/BT.601 matrix (what ``C420jpeg``
specifies); chroma subsampling is 2×2 box average on encode and nearest
(pixel-replication) upsample on decode. Grayscale content (Cb=Cr=128)
round-trips Y byte-exactly; color content round-trips within chroma
quantization (±2 per channel, pinned in tests).
"""

from __future__ import annotations

from typing import Dict, Iterator, List, Tuple

import numpy as np

_MAGIC = b"YUV4MPEG2 "


class Y4mDecodeError(ValueError):
    """Raised when bytes are not a decodable (supported-subset) Y4M."""


def _rgb_to_yuv(frame: np.ndarray) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    r = frame[:, :, 0].astype(np.float32)
    g = frame[:, :, 1].astype(np.float32)
    b = frame[:, :, 2].astype(np.float32)
    y = 0.299 * r + 0.587 * g + 0.114 * b
    cb = 128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b
    cr = 128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b
    clip = lambda p: np.clip(p + 0.5, 0, 255).astype(np.uint8)
    return clip(y), clip(cb), clip(cr)


def _yuv_to_rgb(y: np.ndarray, cb: np.ndarray, cr: np.ndarray) -> np.ndarray:
    yf = y.astype(np.float32)
    cbf = cb.astype(np.float32) - 128.0
    crf = cr.astype(np.float32) - 128.0
    r = yf + 1.402 * crf
    g = yf - 0.344136 * cbf - 0.714136 * crf
    b = yf + 1.772 * cbf
    out = np.stack([r, g, b], axis=2)
    return np.clip(out + 0.5, 0, 255).astype(np.uint8)


def encode_y4m(frames: np.ndarray, fps: Tuple[int, int] = (25, 1),
               colorspace: str = "420jpeg") -> bytes:
    """(N, H, W, 3) uint8 RGB frames -> .y4m bytes (C420jpeg or C444).

    4:2:0 requires even H and W. Deterministic for a given array."""
    if frames.dtype != np.uint8 or frames.ndim != 4 or frames.shape[3] != 3:
        raise ValueError("frames must be (N, H, W, 3) uint8")
    n, h, w, _ = frames.shape
    if colorspace.startswith("420") and (h % 2 or w % 2):
        raise ValueError("4:2:0 needs even frame dimensions")
    head = f"YUV4MPEG2 W{w} H{h} F{fps[0]}:{fps[1]} Ip A1:1 C{colorspace}\n"
    parts: List[bytes] = [head.encode("ascii")]
    for i in range(n):
        y, cb, cr = _rgb_to_yuv(frames[i])
        parts.append(b"FRAME\n")
        if colorspace.startswith("420"):
            # 2x2 box-average chroma subsample
            cb = ((cb[0::2, 0::2].astype(np.uint16) + cb[0::2, 1::2]
                   + cb[1::2, 0::2] + cb[1::2, 1::2] + 2) >> 2).astype(np.uint8)
            cr = ((cr[0::2, 0::2].astype(np.uint16) + cr[0::2, 1::2]
                   + cr[1::2, 0::2] + cr[1::2, 1::2] + 2) >> 2).astype(np.uint8)
        parts.extend([y.tobytes(), cb.tobytes(), cr.tobytes()])
    return b"".join(parts)


def _parse_header(buf: bytes) -> Tuple[Dict[str, str], int]:
    if buf[: len(_MAGIC)] != _MAGIC:
        raise Y4mDecodeError("missing YUV4MPEG2 magic")
    nl = buf.find(b"\n", 0, 4096)
    if nl < 0:
        raise Y4mDecodeError("unterminated stream header")
    params: Dict[str, str] = {}
    try:
        for tok in buf[len(_MAGIC):nl].decode("ascii").split():
            params[tok[0]] = tok[1:]
    except UnicodeDecodeError as e:
        raise Y4mDecodeError("non-ASCII stream header") from e
    return params, nl + 1


def iter_y4m_frames(buf: bytes) -> Iterator[np.ndarray]:
    """Yield (H, W, 3) uint8 RGB frames from .y4m bytes, streaming —
    frame-sampling stages can skip decode work for unsampled frames by
    advancing the iterator, but never hold more than one frame's pixels."""
    params, pos = _parse_header(buf)
    try:
        w, h = int(params["W"]), int(params["H"])
    except (KeyError, ValueError) as e:
        raise Y4mDecodeError("header missing W/H") from e
    if w <= 0 or h <= 0:
        raise Y4mDecodeError("non-positive frame dimensions")
    cs = params.get("C", "420jpeg")
    if cs.startswith("420"):
        if h % 2 or w % 2:
            raise Y4mDecodeError("4:2:0 with odd dimensions")
        cw, ch = w // 2, h // 2
    elif cs == "444":
        cw, ch = w, h
    else:
        raise Y4mDecodeError(f"unsupported colorspace C{cs} (420*/444 only)")
    fsize = w * h + 2 * cw * ch
    while pos < len(buf):
        nl = buf.find(b"\n", pos, pos + 256)
        if buf[pos : pos + 5] != b"FRAME" or nl < 0:
            raise Y4mDecodeError("corrupt FRAME marker")
        pos = nl + 1
        if pos + fsize > len(buf):
            raise Y4mDecodeError("truncated frame payload")
        y = np.frombuffer(buf, np.uint8, w * h, pos).reshape(h, w)
        cb = np.frombuffer(buf, np.uint8, cw * ch, pos + w * h).reshape(ch, cw)
        cr = np.frombuffer(buf, np.uint8, cw * ch, pos + w * h + cw * ch).reshape(ch, cw)
        if cs.startswith("420"):  # nearest (replication) upsample
            cb = np.repeat(np.repeat(cb, 2, axis=0), 2, axis=1)
            cr = np.repeat(np.repeat(cr, 2, axis=0), 2, axis=1)
        yield _yuv_to_rgb(y, cb, cr)
        pos += fsize


def decode_y4m(buf: bytes) -> np.ndarray:
    """All frames at once: .y4m bytes -> (N, H, W, 3) uint8 RGB."""
    frames = list(iter_y4m_frames(buf))
    if not frames:
        raise Y4mDecodeError("stream has no frames")
    return np.stack(frames)
