"""HyperLogLog distinct-count sketch (Flajolet et al. 2007, with the
small-range linear-counting correction from the HLL++ paper's public
description). Vectorized over uint64 hash arrays; register-wise max merge.

Used for global clip_id-uniqueness estimation where the exact
groupby-count would be a full shuffle (SURVEY.md §2.7 D4): per-batch
sketches merge to a global estimate; exact per-group dedup stays available
as a separate operator.
"""

from __future__ import annotations

import numpy as np


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact vectorized bit length for uint64 (no float round-off)."""
    x = x.copy()
    r = np.zeros(x.shape, dtype=np.uint64)
    for shift in (32, 16, 8, 4, 2, 1):
        s = np.uint64(shift)
        mask = x >= (np.uint64(1) << s)
        r[mask] += s
        x[mask] >>= s
    return r + (x > 0)


class HLL:
    __slots__ = ("p", "m", "registers")

    def __init__(self, p: int = 12):
        self.p = p
        self.m = 1 << p
        self.registers = np.zeros(self.m, dtype=np.uint8)

    def add_hashes(self, hashes: np.ndarray) -> "HLL":
        h = hashes.astype(np.uint64, copy=False)
        idx = (h >> np.uint64(64 - self.p)).astype(np.int64)
        w = h & ((np.uint64(1) << np.uint64(64 - self.p)) - np.uint64(1))
        # rho = leading zeros within the (64-p)-bit suffix, + 1
        rho = (np.uint64(64 - self.p) - _bit_length_u64(w) + np.uint64(1)).astype(np.uint8)
        np.maximum.at(self.registers, idx, rho)
        return self

    def merge(self, other: "HLL") -> "HLL":
        assert self.p == other.p
        out = HLL(self.p)
        np.maximum(self.registers, other.registers, out=out.registers)
        return out

    def estimate(self) -> float:
        m = float(self.m)
        alpha = 0.7213 / (1.0 + 1.079 / m)
        est = alpha * m * m / float(np.sum(np.ldexp(1.0, -self.registers.astype(np.int64))))
        if est <= 2.5 * m:
            zeros = int(np.count_nonzero(self.registers == 0))
            if zeros:
                return m * np.log(m / zeros)
        return est

    # --- serialization (compact; flows through Arrow binary columns) ------
    def to_bytes(self) -> bytes:
        return bytes([self.p]) + self.registers.tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "HLL":
        out = cls(buf[0])
        out.registers = np.frombuffer(buf[1:], dtype=np.uint8).copy()
        return out
