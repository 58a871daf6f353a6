"""Deterministic reference-signal + transcript synthesis keyed by clip_id.

Every clip's ground-truth content is a pure function of its ``clip_id``
string: a stable 64-bit digest seeds a PCG64 generator that draws the sine
mixture (1-3 components: freq/amp/phase) and the transcript word salad.
The validation stage re-synthesizes the expected PCM from (clip_id,
sample_rate, n_samples) alone and checks decoded-PCM allclose via SNR>=30dB
plus transcript equality (BASELINE.json north_star) — no side-channel
ground-truth table is needed at validation time.
"""

from __future__ import annotations

import hashlib

import numpy as np

# vocabulary for deterministic word-salad transcripts
_WORDS = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet kilo lima "
    "mike november oscar papa quebec romeo sierra tango uniform victor whiskey "
    "xray yankee zulu amber birch cedar dune ember flint grove harbor iris "
    "jasper kelp lotus maple nectar onyx pearl quartz reed slate timber umber "
    "violet willow yarrow zephyr"
).split()

AMPLITUDE = 0.6 * 32767.0


def clip_seed(clip_id: str) -> int:
    """Stable 64-bit seed from a clip_id (process-independent, unlike
    Python's salted ``hash``)."""
    return int.from_bytes(hashlib.blake2b(clip_id.encode(), digest_size=8).digest(), "little")


def _rng(clip_id: str) -> np.random.Generator:
    return np.random.Generator(np.random.PCG64(clip_seed(clip_id)))


def signal_params(clip_id: str):
    """(freqs, amps, phases) of the clip's sine mixture."""
    rng = _rng(clip_id)
    k = int(rng.integers(1, 4))
    freqs = rng.uniform(80.0, 3400.0, size=k)
    amps = rng.dirichlet(np.ones(k))
    phases = rng.uniform(0.0, 2 * np.pi, size=k)
    return freqs, amps, phases


def reference_pcm(clip_id: str, sample_rate: int, n_samples: int) -> np.ndarray:
    """The expected int16 PCM for a clip at a given rate/length."""
    freqs, amps, phases = signal_params(clip_id)
    t = np.arange(n_samples, dtype=np.float64) / float(sample_rate)
    sig = np.zeros(n_samples, dtype=np.float64)
    for f, a, p in zip(freqs, amps, phases):
        sig += a * np.sin(2 * np.pi * f * t + p)
    return np.clip(sig * AMPLITUDE, -32768, 32767).astype(np.int16)


_TRANSCRIPT_SALT = 0x5EED7EC70FA0D10


def reference_transcript(clip_id: str) -> str:
    """The expected word-salad transcript for a clip (5-12 words). Uses a
    salted seed stream so it is independent of the signal draws."""
    rng = np.random.Generator(np.random.PCG64(clip_seed(clip_id) ^ _TRANSCRIPT_SALT))
    n = int(rng.integers(5, 13))
    idx = rng.integers(0, len(_WORDS), size=n)
    return " ".join(_WORDS[i] for i in idx)
