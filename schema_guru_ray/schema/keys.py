"""Key extraction + likely-duplicate-key detection.

Re-implements the reference's warning pass (SchemaGuru.scala:81):
``extractKeys`` (Helpers.scala:133-142) collects every object key in the
merged schema; ``duplicate_key_pairs`` (LevenshteinAnnotator.scala:19-115)
flags key pairs whose *uniformed* forms (lowercased, ``-``/``_`` stripped)
are within Levenshtein distance 1, skipping keys of length <= 3.

This runs driver-side on the final merged state — the key set is tiny
(schema width), never data-scale.
"""

from __future__ import annotations

from typing import Set, Tuple

from schema_guru_ray.schema.states import (
    ArrayState,
    ObjectState,
    ProductState,
    State,
)

THRESHOLD_LENGTH = 3  # LevenshteinAnnotator.scala:26
THRESHOLD_DISTANCE = 1  # LevenshteinAnnotator.scala:31


def extract_keys(state: State) -> Set[str]:
    """All object keys anywhere in the schema tree (Helpers.scala:133-142)."""
    if isinstance(state, ObjectState):
        keys = set(state.properties)
        for v in state.properties.values():
            keys |= extract_keys(v)
        return keys
    if isinstance(state, ArrayState):
        return extract_keys(state.items)
    if isinstance(state, ProductState):
        keys: Set[str] = set()
        for s in state.slots.values():
            keys |= extract_keys(s)
        return keys
    return set()


def levenshtein(a: str, b: str) -> int:
    """Classic DP edit distance (LevenshteinAnnotator.scala:56-61)."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(cur[-1] + 1, prev[j] + 1, prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _uniform(s: str) -> str:
    """Strip ``-``/``_`` and lowercase (LevenshteinAnnotator.scala:87-89)."""
    return s.replace("-", "").replace("_", "").lower()


def duplicate_key_pairs(keys: Set[str]) -> Set[Tuple[str, str]]:
    """Canonically-ordered pairs of likely-duplicate keys
    (LevenshteinAnnotator.scala:33-43,96-115)."""
    out: Set[Tuple[str, str]] = set()
    candidates = [k for k in keys if len(k) > THRESHOLD_LENGTH]
    for i, a in enumerate(candidates):
        ua = _uniform(a)
        for b in candidates[i + 1 :]:
            if a == b:
                continue
            if levenshtein(ua, _uniform(b)) <= THRESHOLD_DISTANCE:
                out.add((a, b) if a <= b else (b, a))
    return out
