"""End-to-end corpus-curation pipeline — the flagship COMPOSITION demo.

A real pre-training data pipeline is not one operator but a chain; this
module wires the repo's operators into the canonical curation sequence,
every stage of which is deterministic and exactly SQL-replayable (the
DuckDB oracle replays the whole chain as one CTE):

    1. exact dedup      — keep min(doc_id) per normalized-content md5;
    2. near-dup removal — MinHash(21×3) candidates → distributed exact
                          shingle-Jaccard verify ≥ 0.8 → drop the HIGHER
                          doc_id of every confirmed pair
                          (stages/dedup.verify_pairs_jaccard_distributed);
    3. quality filter   — keep documents with n_words in [lo, hi]
                          (stages/text.QualityScorer semantics);
    4. deterministic sample — content-addressed Bernoulli keep-rate
                          (stages/sample semantics).

Shuffle budget of the whole chain: ONE full shuffle of the corpus (the
exact-dedup group-keep, coarse-bucketed so reducers see whole buckets,
not per-fingerprint groups), the LSH band shuffle over signatures, one
semi-join of candidate texts, and stateless filters. The deduped corpus
is materialized once because three downstream stages consume it —
at scale this is the natural checkpoint boundary (write-parquet instead
of materialize for a resumable run).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd


def curate_documents(ds, *, jaccard_threshold: float = 0.8,
                     min_words: int = 30, max_words: int = 100_000,
                     sample_rate: float = 0.5, n_buckets: int = 64,
                     drop_broadcast_limit: int = 1_000_000):
    """documents Dataset (doc_id, text) → curated Dataset of
    (doc_id, n_words) surviving all four stages. Deterministic.

    The near-dup DROP set switches regime on its size (round-2 verdict:
    the unconditional ``to_pandas()`` + frozenset broadcast is O(corpus)
    on duplicate-heavy crawls):

    * ≤ ``drop_broadcast_limit`` ids → exact frozenset broadcast, fused
      into the quality+sample pass (zero extra shuffles);
    * bigger → a Bloom filter of the drop ids prunes the corpus (rows
      probing ABSENT are definitely kept — no false negatives), and only
      the maybe-dropped rows (true drops + ~fp_rate of the corpus) shuffle
      through an exact :func:`stages.joins.bucketed_anti_join`. The drop
      set is never collected to the driver."""
    import ray

    from schema_guru_ray.stages.dedup import (
        MinHashSigner,
        _normalize,
        minhash_candidate_pairs,
        verify_pairs_jaccard_distributed,
    )
    from schema_guru_ray.stages.profile import stable_hash64
    from schema_guru_ray.stages.sample import md5_hex, rate_threshold_hex
    from schema_guru_ray.stages.text import WORD_RE

    # --- stage 1: exact dedup, keep the min-doc_id row per content hash ----
    def tag_fp(b: pd.DataFrame) -> pd.DataFrame:
        fp = b["text"].fillna("").map(
            lambda s: hashlib.md5(_normalize(s).encode()).hexdigest()
        )
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "text": b["text"],
                "fp": fp,
                "bucket": (stable_hash64(fp) % np.uint64(n_buckets)).astype(np.int32),
            }
        )

    def keep_min(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values("doc_id", kind="stable")
        return g.drop_duplicates("fp", keep="first")[["doc_id", "text"]]

    kept = (
        ds.map_batches(tag_fp, batch_format="pandas")
        .groupby("bucket")
        .map_groups(keep_min, batch_format="pandas")
        .materialize()  # reused by 3 downstream stages
    )

    # --- stage 2: near-dup removal (drop id_b of each verified pair) -------
    from schema_guru_ray.stages.joins import derive_num_buckets

    signer = MinHashSigner(num_perm=63, bands=21)
    cands = minhash_candidate_pairs(kept, signer, min_est_jaccard=0.5)
    pairs = verify_pairs_jaccard_distributed(
        cands, kept, threshold=jaccard_threshold,
        num_partitions=derive_num_buckets(kept.count()),  # kept is materialized
    )
    # distinct drop ids as a (tiny-state) materialized Dataset — never the
    # driver; materializing lets count() choose the regime without
    # re-running the verification pass
    drops = pairs.map_batches(
        lambda b: pd.DataFrame({"id_b": b["id_b"].astype("int64")}),
        batch_format="pandas",
    ).materialize()
    n_drop = drops.count()

    # --- stages 3+4: quality filter + deterministic sample (one pass) ------
    threshold_hex = rate_threshold_hex(sample_rate)
    nhex = len(threshold_hex)

    def filter_and_sample(b: pd.DataFrame, drop_ref=None) -> pd.DataFrame:
        if drop_ref is not None:
            b = b[~b["doc_id"].isin(ray.get(drop_ref))]
        n_words = (
            b["text"].fillna("").str.lower().str.findall(WORD_RE).map(len)
        ).astype("int64")
        b = b.assign(n_words=n_words)
        b = b[(b["n_words"] >= min_words) & (b["n_words"] <= max_words)]
        b = b[md5_hex(b["doc_id"]).str[:nhex] < threshold_hex]
        return b[["doc_id", "n_words"]].astype({"doc_id": "int64"})

    if n_drop <= drop_broadcast_limit:
        drop_ref = (
            ray.put(frozenset(int(b) for b in drops.to_pandas()["id_b"]))
            if n_drop
            else None
        )
        return kept.map_batches(
            filter_and_sample, fn_kwargs={"drop_ref": drop_ref},
            batch_format="pandas",
        )

    # scale regime: Bloom prune (definitely-kept rows never shuffle), exact
    # bucketed anti-join only over the maybe-dropped remainder
    from schema_guru_ray.sketches.bloom import build_bloom
    from schema_guru_ray.stages.joins import bucketed_anti_join

    bloom_ref = ray.put(build_bloom(drops, "id_b", fp_rate=0.001).to_bytes())

    def bloom_split(b: pd.DataFrame, want_maybe: bool) -> pd.DataFrame:
        from schema_guru_ray.sketches.bloom import BloomFilter

        hit = BloomFilter.from_bytes(ray.get(bloom_ref)).contains_many(b["doc_id"])
        return b[hit] if want_maybe else b[~hit]

    definite_keep = kept.map_batches(
        bloom_split, fn_kwargs={"want_maybe": False}, batch_format="pandas"
    )
    maybe = kept.map_batches(
        bloom_split, fn_kwargs={"want_maybe": True}, batch_format="pandas"
    )
    fp_survivors = bucketed_anti_join(maybe, drops, on="doc_id", key_column="id_b")
    return definite_keep.union(fp_survivors).map_batches(
        filter_and_sample, batch_format="pandas"
    )
