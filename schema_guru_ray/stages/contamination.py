"""Benchmark n-gram decontamination for training corpora.

The standard pre-training hygiene step (GPT-3 appendix-C style): extract
token n-grams from a *benchmark* suite, then drop / flag every corpus
document that shares an n-gram with it. Shape at 100 TB:

* the benchmark side is a fixed, small asset (MBs of eval sets) at ANY
  corpus scale — its distinct gram set is built once and broadcast via
  ``ray.put`` (read once per worker, never re-shipped per batch);
* the corpus side streams: one stateless ``map_batches`` pass computes the
  per-document hit count against the broadcast set — NO shuffle, no
  materialization, output is (id, n_hits, contaminated) rows.

Real deployments use 8–13-gram windows; ``n`` is a parameter (the catalog
query uses 3 because the synthetic corpus' tiny vocabulary makes longer
windows collision-free and the check vacuous).

Tokenization is ``\\S+`` over lowercased text — chosen to be exactly
replayable by the DuckDB oracle (``regexp_extract_all(lower(text),
'\\S+')``), mirroring the reference's "conformance requires identical
normalization" discipline (JsonPathExtractor.scala:45).
"""

from __future__ import annotations

import re
from typing import FrozenSet, Set

import pandas as pd

TOKEN_RE = re.compile(r"\S+")


def doc_grams(text: str, n: int) -> Set[str]:
    """Distinct space-joined token n-grams of one document."""
    toks = TOKEN_RE.findall(text.lower())
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


class GramSetExtractor:
    """Per-batch DISTINCT gram emitter (pre-dedup before any exchange)."""

    def __init__(self, n: int, column: str = "text"):
        self.n = n
        self.column = column

    def __call__(self, batch: pd.DataFrame) -> pd.DataFrame:
        grams: Set[str] = set()
        for t in batch[self.column].fillna(""):
            grams |= doc_grams(t, self.n)
        return pd.DataFrame({"g": sorted(grams)})


def build_benchmark_grams(bench_ds, n: int, column: str = "text") -> FrozenSet[str]:
    """Distinct n-grams of the benchmark suite. Per-batch sets pre-dedup,
    then ``Dataset.unique`` does the (tiny) global distinct; the result is
    a driver-side frozenset because the benchmark side is small by
    construction — the CORPUS never takes this path."""
    gram_ds = bench_ds.map_batches(
        GramSetExtractor(n, column), batch_format="pandas"
    )
    return frozenset(gram_ds.unique("g"))


_GRAM_CACHE: dict = {}


def _score_batch(batch: pd.DataFrame, *, grams_ref, n: int, column: str,
                 id_column: str) -> pd.DataFrame:
    """Stateless scoring kernel; the broadcast gram set is fetched from the
    object store once per worker process and cached (zero-copy for the
    ref, one deserialization per worker)."""
    import ray

    key = getattr(grams_ref, "hex", lambda: id(grams_ref))()
    grams = _GRAM_CACHE.get(key)
    if grams is None:
        grams = ray.get(grams_ref)
        _GRAM_CACHE[key] = grams
    hits = [len(doc_grams(t, n) & grams) for t in batch[column].fillna("")]
    out = pd.DataFrame(
        {
            id_column: batch[id_column].astype("int64"),
            "n_hits": pd.Series(hits, dtype="int64"),
        }
    )
    out["contaminated"] = (out["n_hits"] > 0).astype("int64")
    return out


def flag_contaminated(corpus_ds, bench_grams: FrozenSet[str], n: int,
                      column: str = "text", id_column: str = "doc_id"):
    """Flag every corpus document sharing an n-gram with the benchmark set.

    Returns a Dataset of (id, n_hits, contaminated) — ``n_hits`` counts
    DISTINCT shared grams. Pure streaming map; callers drop flagged rows
    with a semi-join on ``contaminated == 0`` or filter inline.
    """
    import ray

    ref = ray.put(bench_grams)
    return corpus_ds.map_batches(
        _score_batch,
        fn_kwargs=dict(grams_ref=ref, n=n, column=column, id_column=id_column),
        batch_format="pandas",
    )
