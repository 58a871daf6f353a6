"""Mergeable Bloom filter (vectorized numpy bit array).

The scale path for semi/anti joins when the key side is too big to
broadcast as an exact set (ray guide "Semi / anti join"): build per-batch
filters over the key column, OR-merge them (a commutative monoid, same
transport as the other sketches), broadcast the result once via ``ray.put``
and probe inside ``map_batches``. False positives only (rate ~
(1-e^{-kn/m})^k); no false negatives, so ANTI-join results may keep a few
extra rows but never drop a match — callers needing exactness re-check the
survivors against the exact set.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from schema_guru_ray.stages.profile import stable_hash64


class BloomFilter:
    __slots__ = ("n_bits", "n_hashes", "bits")

    def __init__(self, n_bits: int = 1 << 20, n_hashes: int = 5):
        self.n_bits = n_bits
        self.n_hashes = n_hashes
        self.bits = np.zeros((n_bits + 7) // 8, dtype=np.uint8)

    @classmethod
    def sized_for(cls, n_items: int, fp_rate: float = 0.01) -> "BloomFilter":
        n_bits = max(64, int(-n_items * np.log(fp_rate) / (np.log(2) ** 2)))
        n_hashes = max(1, round(n_bits / max(1, n_items) * np.log(2)))
        return cls(n_bits=n_bits, n_hashes=min(8, n_hashes))

    def _positions(self, values: pd.Series) -> np.ndarray:
        """(n_values × n_hashes) bit positions via double hashing
        h1 + i*h2 (Kirsch-Mitzenmacher)."""
        h1 = stable_hash64(values)
        h2 = stable_hash64(values.astype(str) + "\x1f")  # independent stream
        i = np.arange(self.n_hashes, dtype=np.uint64)
        with np.errstate(over="ignore"):
            return ((h1[:, None] + i[None, :] * h2[:, None]) % np.uint64(self.n_bits)).astype(
                np.int64
            )

    def add_many(self, values: pd.Series) -> "BloomFilter":
        pos = self._positions(values).reshape(-1)
        np.bitwise_or.at(self.bits, pos >> 3, (1 << (pos & 7)).astype(np.uint8))
        return self

    def contains_many(self, values: pd.Series) -> np.ndarray:
        pos = self._positions(values)
        byte = self.bits[pos >> 3]
        hit = (byte >> (pos & 7).astype(np.uint8)) & 1
        return hit.all(axis=1)

    def merge(self, other: "BloomFilter") -> "BloomFilter":
        assert self.n_bits == other.n_bits and self.n_hashes == other.n_hashes
        out = BloomFilter(self.n_bits, self.n_hashes)
        np.bitwise_or(self.bits, other.bits, out=out.bits)
        return out

    def to_bytes(self) -> bytes:
        head = np.array([self.n_bits, self.n_hashes], dtype=np.int64).tobytes()
        return head + self.bits.tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "BloomFilter":
        n_bits, n_hashes = np.frombuffer(buf[:16], dtype=np.int64)
        out = cls(int(n_bits), int(n_hashes))
        out.bits = np.frombuffer(buf[16:], dtype=np.uint8).copy()
        return out


def build_bloom(ds, column: str, n_items_hint: int = None, fp_rate: float = 0.01):
    """Distributed build: per-batch filters OR-merged on the driver (each is
    a fixed-size bit array; #batches × size bytes stream through)."""
    n_items = n_items_hint or ds.count()
    proto = BloomFilter.sized_for(n_items, fp_rate)

    def per_batch(b: pd.DataFrame) -> pd.DataFrame:
        f = BloomFilter(proto.n_bits, proto.n_hashes).add_many(b[column])
        return pd.DataFrame({"bloom": [f.to_bytes()]})

    acc = None
    parts = ds.map_batches(per_batch, batch_format="pandas")
    for b in parts.iter_batches(batch_size=64, batch_format="pandas"):
        for buf in b["bloom"]:
            f = BloomFilter.from_bytes(buf)
            acc = f if acc is None else acc.merge(f)
    return acc or proto


def semi_join_bloom(ds, keys_ds, on: str, keys_column: str = None,
                    anti: bool = False, fp_rate: float = 0.01):
    """Semi (or anti) join via a broadcast Bloom filter of the key side.
    Semi results may contain false positives at ~fp_rate; anti results may
    MISS ~fp_rate of true anti rows (callers needing exactness re-check)."""
    import ray

    bloom = build_bloom(keys_ds, keys_column or on, fp_rate=fp_rate)
    ref = ray.put(bloom.to_bytes())

    def probe(b: pd.DataFrame) -> pd.DataFrame:
        f = BloomFilter.from_bytes(ray.get(ref))
        hit = f.contains_many(b[on])
        return b[~hit] if anti else b[hit]

    return ds.map_batches(probe, batch_format="pandas")
