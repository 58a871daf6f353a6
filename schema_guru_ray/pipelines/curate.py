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
is materialized once because three downstream stages consume it.

:func:`curate_documents_checkpointed` is the resumable form: the two
global stages (dedup survivors, verified drop ids) and the final
per-partition filter+sample pass each commit through
``state/checkpoint.run_partitioned`` (atomic rename, lineage + config
hash), so a crash resumes without repeating finished work — in
particular the expensive LSH+verify stage is never recomputed once its
checkpoint exists.
"""

from __future__ import annotations

import hashlib
import os

import numpy as np
import pandas as pd


def _exact_dedup(ds, n_buckets: int = 64):
    """Stage 1: keep the min-doc_id row per normalized-content md5.
    Returns a LAZY Dataset of (doc_id, text)."""
    from schema_guru_ray.stages.dedup import _normalize
    from schema_guru_ray.stages.profile import stable_hash64

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

    return (
        ds.map_batches(tag_fp, batch_format="pandas")
        .groupby("bucket")
        .map_groups(keep_min, batch_format="pandas")
    )


def _confirmed_drop_ids(kept, jaccard_threshold: float = 0.8):
    """Stage 2 decision: MinHash(21×3) candidates → distributed exact
    shingle-Jaccard verify → MATERIALIZED Dataset of drop ids (the higher
    doc_id of every confirmed pair). ``kept`` must be materialized."""
    from schema_guru_ray.stages.dedup import (
        MinHashSigner,
        minhash_candidate_pairs,
        verify_pairs_jaccard_distributed,
    )
    from schema_guru_ray.stages.joins import derive_num_buckets

    signer = MinHashSigner(num_perm=63, bands=21)
    cands = minhash_candidate_pairs(kept, signer, min_est_jaccard=0.5)
    pairs = verify_pairs_jaccard_distributed(
        cands, kept, threshold=jaccard_threshold,
        num_partitions=derive_num_buckets(kept.count()),
    )
    # distinct drop ids as a (tiny-state) materialized Dataset — never the
    # driver; materializing lets count() choose the regime without
    # re-running the verification pass
    return pairs.map_batches(
        lambda b: pd.DataFrame({"id_b": b["id_b"].astype("int64")}),
        batch_format="pandas",
    ).materialize()


def _remove_drops(kept, drops, n_drop: int, drop_broadcast_limit: int):
    """Stage 2 application, two regimes (round-2 verdict: an unconditional
    driver broadcast is O(corpus) on duplicate-heavy crawls):

    * ≤ ``drop_broadcast_limit`` ids → exact frozenset broadcast filter;
    * bigger → a Bloom filter of the drop ids prunes the corpus (rows
      probing ABSENT are definitely kept — no false negatives), and only
      the maybe-dropped rows (true drops + ~fp_rate of the corpus)
      shuffle through an exact :func:`stages.joins.bucketed_anti_join`.
      The drop set is never collected to the driver."""
    import ray

    if n_drop == 0:
        return kept
    if n_drop <= drop_broadcast_limit:
        drop_ref = ray.put(frozenset(int(b) for b in drops.to_pandas()["id_b"]))

        def drop_filter(b: pd.DataFrame) -> pd.DataFrame:
            return b[~b["doc_id"].isin(ray.get(drop_ref))]

        return kept.map_batches(drop_filter, batch_format="pandas")

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
    return definite_keep.union(fp_survivors)


def _quality_sample_fn(min_words: int, max_words: int, sample_rate: float):
    """Stages 3+4 as one vectorized batch fn: word-count quality gate +
    content-addressed Bernoulli sample → (doc_id, n_words)."""
    from schema_guru_ray.stages.sample import md5_hex, rate_threshold_hex
    from schema_guru_ray.stages.text import WORD_RE

    threshold_hex = rate_threshold_hex(sample_rate)
    nhex = len(threshold_hex)

    def filter_and_sample(b: pd.DataFrame) -> pd.DataFrame:
        n_words = (
            b["text"].fillna("").str.lower().str.findall(WORD_RE).map(len)
        ).astype("int64")
        b = b.assign(n_words=n_words)
        b = b[(b["n_words"] >= min_words) & (b["n_words"] <= max_words)]
        b = b[md5_hex(b["doc_id"]).str[:nhex] < threshold_hex]
        return b[["doc_id", "n_words"]].astype({"doc_id": "int64"})

    return filter_and_sample


def curate_documents(ds, *, jaccard_threshold: float = 0.8,
                     min_words: int = 30, max_words: int = 100_000,
                     sample_rate: float = 0.5, n_buckets: int = 64,
                     drop_broadcast_limit: int = 1_000_000):
    """documents Dataset (doc_id, text) → curated Dataset of
    (doc_id, n_words) surviving all four stages. Deterministic."""
    kept = _exact_dedup(ds, n_buckets).materialize()  # reused by 3 stages
    drops = _confirmed_drop_ids(kept, jaccard_threshold)
    survivors = _remove_drops(kept, drops, drops.count(), drop_broadcast_limit)
    return survivors.map_batches(
        _quality_sample_fn(min_words, max_words, sample_rate),
        batch_format="pandas",
    )


def curate_documents_checkpointed(
    input_files, out_dir: str, *, jaccard_threshold: float = 0.8,
    min_words: int = 30, max_words: int = 100_000, sample_rate: float = 0.5,
    n_buckets: int = 64, drop_broadcast_limit: int = 1_000_000,
    num_partitions: int = 8, log=None,
):
    """Resumable curate over a parquet file list. Three checkpointed
    stages under ``out_dir`` (each with atomic commit + lineage + config
    hash via ``run_partitioned``):

      dedup/  — stage 1 survivors as partitioned parquet (GLOBAL: the
                group-keep shuffles the whole corpus; one atomic unit);
      drops/  — stage 2 verified near-dup drop ids (GLOBAL: LSH + verify
                interact across the corpus; the expensive stage a resume
                must never repeat);
      final/  — stages 3+4 over the dedup output files, PER PARTITION
                (embarrassingly parallel given the drop set, so a crash
                mid-pass finishes only the remainder).

    Returns {result: Dataset over final/, manifest: {stage: summary}}.
    A completed run's output equals ``curate_documents`` on the same
    corpus (tested, including crash-mid-run resume)."""
    import ray.data as rd

    from schema_guru_ray.state.checkpoint import config_hash, run_partitioned

    cfg = {
        "jaccard_threshold": jaccard_threshold, "min_words": min_words,
        "max_words": max_words, "sample_rate": sample_rate,
        "n_buckets": n_buckets,
    }
    manifest = {}

    dedup_dir = os.path.join(out_dir, "dedup")
    cfg_dedup = config_hash({"stage": "dedup", "n_buckets": n_buckets})

    def run_dedup(files, tmp_dir):
        kept = _exact_dedup(rd.read_parquet(files), n_buckets)
        kept.write_parquet(tmp_dir)
        if not any(n.endswith(".parquet") for n in os.listdir(tmp_dir)):
            # write_parquet emits NO files for an empty dataset, which
            # would leave the downstream stages with an empty read list —
            # floor the stage with a typed empty file (input's own schema)
            import pyarrow.parquet as _pq

            _pq.write_table(
                _pq.ParquetFile(files[0]).schema_arrow.empty_table(),
                os.path.join(tmp_dir, "empty.parquet"),
            )
        return {}

    manifest["dedup"] = run_partitioned(
        list(input_files), dedup_dir, run_dedup, cfg_hash=cfg_dedup,
        num_partitions=1, log=log,
    )
    dedup_files = sorted(
        os.path.join(dedup_dir, "partition=0000", n)
        for n in os.listdir(os.path.join(dedup_dir, "partition=0000"))
        if n.endswith(".parquet")
    )

    drops_dir = os.path.join(out_dir, "drops")
    cfg_drops = config_hash(
        {"stage": "drops", "jaccard_threshold": jaccard_threshold,
         "dedup_cfg": cfg_dedup}
    )

    def run_drops(files, tmp_dir):
        kept = rd.read_parquet(files).materialize()
        drops = _confirmed_drop_ids(kept, jaccard_threshold)
        drops.write_parquet(tmp_dir)
        return {"n_drops": drops.count()}

    manifest["drops"] = run_partitioned(
        dedup_files, drops_dir, run_drops, cfg_hash=cfg_drops,
        num_partitions=1, log=log,
    )
    drops_part = os.path.join(drops_dir, "partition=0000")
    drop_files = sorted(
        os.path.join(drops_part, n)
        for n in os.listdir(drops_part)
        if n.endswith(".parquet")
    )

    final_dir = os.path.join(out_dir, "final")
    cfg_final = config_hash({"stage": "final", **cfg, "drops_cfg": cfg_drops})

    def run_final(files, tmp_dir):
        part = rd.read_parquet(files)
        drops = (
            rd.read_parquet(drop_files)
            if drop_files
            else rd.from_pandas(pd.DataFrame({"id_b": pd.Series([], dtype="int64")}))
        )
        survivors = _remove_drops(part, drops, drops.count(), drop_broadcast_limit)
        out = survivors.map_batches(
            _quality_sample_fn(min_words, max_words, sample_rate),
            batch_format="pandas",
        ).materialize()  # one execution feeds both the write and the metric
        out.write_parquet(tmp_dir)
        return {"n_out": out.count()}

    manifest["final"] = run_partitioned(
        dedup_files, final_dir, run_final, cfg_hash=cfg_final,
        num_partitions=num_partitions, log=log,
    )
    final_files = sorted(
        os.path.join(final_dir, d, n)
        for d in os.listdir(final_dir)
        if d.startswith("partition=")
        for n in os.listdir(os.path.join(final_dir, d))
        if n.endswith(".parquet")
    )
    if not final_files:  # every partition curated down to zero rows
        import pyarrow as pa

        result = rd.from_arrow(pa.schema(
            [("doc_id", pa.int64()), ("n_words", pa.int64())]
        ).empty_table())
        return {"result": result, "manifest": manifest}
    return {"result": rd.read_parquet(final_files), "manifest": manifest}
