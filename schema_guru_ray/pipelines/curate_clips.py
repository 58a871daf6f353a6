"""Flagship AUDIO curation chain — the clips-table mirror of the text
curation composition (pipelines/curate.py), built from the stages the
north star demands (BASELINE.json: validation + dedup + transform over
audio clip + transcript pairs):

    1. validate-and-sign — ONE decode per clip yields both the SNR/
       transcript/referential verdict (stages/audio.ClipValidator
       semantics) AND the 256-bit content signature; passing rows keep
       their bytes plus sig/vec_id. Deliberately NOT a verdict-join: the
       keep set is O(corpus) at 10^12 clips, so no broadcast or join can
       carry it — the ok-mask must ride in the same task that decoded the
       clip. The signature rides the same pcm for the same reason: the
       unfused chain paid a SECOND full decode pass in the signer
       (round-4 fusion, ~1.4x on the whole chain).
    2. exact dedup by clip_id — hash-bucket shuffle, keep one row per id
       (generator duplicates are byte-identical; D4 of SURVEY.md §2.7).
       The chain's ONE corpus-wide shuffle; materialized afterwards as
       the natural checkpoint boundary (same call the text chain makes).
    3. content near-dup removal — scalar signature-cluster collapse over
       the precomputed (vec_id, sig) columns: keep each cluster's minimum
       hashed id, drop the rest. Drop ids are corpus-tiny; broadcast
       regime with the bucketed-anti-join escape hatch above
       ``drop_broadcast_limit`` (the curate.py two-regime rule).
    4. resample + loudness-normalize the survivors to a uniform training
       format (stages/audio_transform.resample_clips).

Returns the curated Dataset plus a summary of exact integer counts per
stage (pytest pins them against generator ground-truth labels).
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np
import pandas as pd

from schema_guru_ray.stages.binview import binary_views
import pyarrow as pa

from schema_guru_ray.pipelines.validate import ValidationConfig


@dataclass
class ClipCurationConfig:
    validation: ValidationConfig = field(default_factory=ValidationConfig)
    dedup_threshold: float = 0.999
    dedup_bits: int = 10
    sr_out: int = 16000
    target_dbfs: float = -20.0
    drop_broadcast_limit: int = 2_000_000


def filter_valid_clips(clips_ds, vcfg: ValidationConfig):
    """Validate and KEEP passing rows with their bytes, one streaming pass
    (decode happens exactly once; see module docstring for why this is not
    a verdict join)."""
    from schema_guru_ray.stages.audio import validate_batch_task

    def fv(batch: pa.Table) -> pa.Table:
        verdict = validate_batch_task(
            batch,
            snr_threshold_db=vcfg.snr_threshold_db,
            check_transcript=vcfg.check_transcript,
            strict_codecs=vcfg.strict_codecs,
        )
        return batch.filter(verdict["ok"])

    return clips_ds.map_batches(
        fv, batch_format="pyarrow", batch_size=vcfg.validator_batch_size
    )


class _ValidateAndSign:
    """Fused chain stage: ONE decode per clip serves both the validation
    verdict and the content signature. The unfused chain paid two full
    decode passes (validate, then ContentSigner re-decoding every
    survivor) — at 10^12 clips the decode IS the corpus-scale cost, so
    stage fusion over the same pcm is the single biggest lever. Passing
    rows come out with their original columns plus ``sig`` (256-bit
    hyperplane hash, hex — bit-identical to ContentSigner's) and
    ``vec_id`` (= stable_hash64(clip_id), the dedup drop key)."""

    def __init__(self, snr_threshold_db: float = 30.0,
                 check_transcript: bool = True, strict_codecs: bool = False):
        from schema_guru_ray.stages.audio import ClipValidator
        from schema_guru_ray.stages.audio_features import (
            FEATURE_DIM, _sign_planes,
        )

        self.validator = ClipValidator(
            snr_threshold_db=snr_threshold_db,
            check_transcript=check_transcript,
            strict_codecs=strict_codecs,
        )
        self.planes = _sign_planes(FEATURE_DIM, 256)

    def __call__(self, batch: pa.Table) -> pa.Table:
        from schema_guru_ray.stages.audio_features import clip_features
        from schema_guru_ray.stages.profile import stable_hash64

        ids = batch["clip_id"].to_pylist()
        bufs = binary_views(batch["bytes"])
        srs = batch["sr_hz"].to_pylist()
        durs = batch["dur_ms"].to_pylist()
        codecs = batch["codec"].to_pylist()
        transcripts = batch["transcript"].to_pylist()
        keep = np.zeros(len(ids), dtype=bool)
        sigs = []
        for i in range(len(ids)):
            _, _, viols, pcm, sr = self.validator._validate_row_full(
                ids[i], bufs[i], srs[i], durs[i], codecs[i], transcripts[i]
            )
            if viols:
                continue
            keep[i] = True
            f = clip_features(pcm, sr).astype(np.float64)
            sigs.append(np.packbits((self.planes @ f) > 0).tobytes().hex())
        out = batch.filter(pa.array(keep))
        kept_ids = pd.Series(np.asarray(ids, dtype=object)[keep])
        vec_id = (
            stable_hash64(kept_ids).astype(np.int64)
            if len(kept_ids) else np.array([], dtype=np.int64)
        )
        return out.append_column(
            "sig", pa.array(sigs, pa.string())
        ).append_column("vec_id", pa.array(vec_id, pa.int64()))


_FUSED_CACHE: dict = {}


def _validate_sign_task(batch: pa.Table, *, snr_threshold_db: float,
                        check_transcript: bool, strict_codecs: bool) -> pa.Table:
    """Stateless-task wrapper around :class:`_ValidateAndSign`, cached per
    WORKER PROCESS by config — the same pattern as
    ``stages/audio.validate_batch_task``, which measured ~4x faster
    end-to-end than the actor-pool form (warm workers persist; no
    per-execution actor spin-up)."""
    key = (snr_threshold_db, check_transcript, strict_codecs)
    k = _FUSED_CACHE.get(key)
    if k is None:
        k = _ValidateAndSign(
            snr_threshold_db=snr_threshold_db,
            check_transcript=check_transcript,
            strict_codecs=strict_codecs,
        )
        _FUSED_CACHE[key] = k
    return k(batch)


def filter_valid_and_sign(clips_ds, vcfg: ValidationConfig):
    """The chain's stage-1: :func:`filter_valid_clips` fused with content
    signing over the same decode (see :class:`_ValidateAndSign`)."""
    import functools

    fn = functools.partial(
        _validate_sign_task,
        snr_threshold_db=vcfg.snr_threshold_db,
        check_transcript=vcfg.check_transcript,
        strict_codecs=vcfg.strict_codecs,
    )
    return clips_ds.map_batches(
        fn, batch_format="pyarrow", batch_size=vcfg.validator_batch_size
    )


def exact_dedup_clips(ds, rows_per_bucket: int = 1024,
                      n_rows: int | None = None):
    """One row per clip_id: tag with hash(clip_id) bucket, groupby bucket,
    vectorized drop_duplicates inside each bucket — per-bucket memory is
    bounded by ``rows_per_bucket`` × row width as the corpus grows.

    ``rows_per_bucket`` is sized for WIDE rows: these carry the audio
    payload (~0.1-1 MB each at production), so 1024 rows ≈ 0.1-1 GB per
    reduce group. It also sets downstream parallelism — the bucket blocks
    are what the signer/resample decode pools consume, and the old 65536
    default collapsed a 60k-clip corpus into 8 fat blocks that ran the
    next decode stage 8-wide on a 16-actor pool (measured 2x wall time on
    the signer; round-4 finding).

    ``n_rows``: pass the known row count (e.g. parquet FOOTER metadata for a
    fresh-read input) so sizing the buckets never executes the upstream
    plan; defaults to ``ds.count()`` (cheap on the already-materialized
    chain input, metadata-only on a bare read)."""
    from schema_guru_ray.stages.joins import derive_num_buckets
    from schema_guru_ray.stages.profile import stable_hash64

    nb = derive_num_buckets(
        ds.count() if n_rows is None else n_rows,
        rows_per_bucket=rows_per_bucket,
    )

    # Arrow end-to-end: these rows carry the audio ``bytes`` through the
    # chain's ONE corpus-wide shuffle, and pandas blocks would (a) copy
    # every payload into object arrays and (b) hit Ray's slow pandas sort
    # path (measured ~5x on row-identical plans, round-4 bench root cause).
    def tag(t: pa.Table) -> pa.Table:
        h = stable_hash64(pd.Series(t["clip_id"].to_pandas()))
        return t.append_column(
            "__bucket", pa.array((h % np.uint64(nb)).astype(np.int64), pa.int64())
        )

    def keep_one(t: pa.Table) -> pa.Table:
        ids = t["clip_id"].to_numpy(zero_copy_only=False)
        order = np.argsort(ids, kind="stable")
        sorted_ids = ids[order]
        first = np.ones(len(ids), dtype=bool)
        first[1:] = sorted_ids[1:] != sorted_ids[:-1]
        return t.take(order[first]).drop_columns(["__bucket"])

    return (
        ds.map_batches(tag, batch_format="pyarrow")
        .groupby("__bucket")
        .map_groups(keep_one, batch_format="pyarrow")
    )


def _near_dup_drop_hashes(deduped, cfg: ClipCurationConfig):
    """Content-dedup drop set via 64-bit signature cluster-collapse: each
    same-content cluster keeps its minimum hashed id, the rest drop.
    LINEAR in corpus size — the all-pairs LSH operator is inherently
    quadratic inside near-identical clusters (measured 7.6/18/59 s at
    5k/10k/20k clips) and belongs on bounded candidate sets, not the
    corpus-wide chain.

    If the rows already carry ``sig``/``vec_id`` (the fused
    validate-and-sign stage), this is a pure scalar collapse over a
    2-column projection — no decode; otherwise it falls back to
    ``content_dedup_drop_hashes`` (signer pass + collapse)."""
    from schema_guru_ray.stages.audio_features import (
        collapse_drop_hashes, content_dedup_drop_hashes,
    )

    if "sig" in deduped.schema().names:
        return collapse_drop_hashes(deduped.select_columns(["vec_id", "sig"]))
    return content_dedup_drop_hashes(deduped)


def _remove_by_hash(ds, drops, n_drop: int, limit: int):
    """Two-regime removal of clips whose hashed id is in ``drops``:
    broadcast frozenset below ``limit``, exact bucketed anti-join above
    (the drop set never lands on the driver in the scale regime). Rows
    with a precomputed ``vec_id`` column skip the rehash."""
    import ray

    from schema_guru_ray.stages.profile import stable_hash64

    if n_drop == 0:
        return ds

    has_vec = "vec_id" in ds.schema().names

    if n_drop <= limit:
        # broadcast a SORTED int64 array (np.isin probe), and filter the
        # Arrow block directly — pandas here would copy every audio payload
        # into object arrays just to drop a few rows
        drop_arr = np.sort(
            drops.to_pandas()["drop_h"].to_numpy(dtype=np.int64)
        )
        ref = ray.put(drop_arr)

        def drop_filter(t: pa.Table) -> pa.Table:
            darr = ray.get(ref)
            if has_vec:
                h = t["vec_id"].to_numpy(zero_copy_only=False)
            else:
                h = stable_hash64(
                    pd.Series(t["clip_id"].to_pandas())
                ).astype(np.int64)
            idx = np.searchsorted(darr, h)
            idx[idx == len(darr)] = 0
            hit = darr[idx] == h if len(darr) else np.zeros(len(h), bool)
            return t.filter(pa.array(~hit))

        return ds.map_batches(drop_filter, batch_format="pyarrow")

    # Scale regime: ARROW-NATIVE bucketed anti join. The generic
    # bucketed_anti_join round-trips groups through pandas, which degrades
    # the binary ``bytes`` payload column; this variant keeps every block
    # Arrow end-to-end (tag → union-with-null-fill → per-bucket pc.is_in +
    # filter), so wide binary rows shuffle exactly once, zero-copy.
    import pyarrow.compute as pc

    from schema_guru_ray.stages.joins import _tag_fn, derive_num_buckets

    nb = derive_num_buckets(ds.count() + n_drop)

    def with_hash(t: pa.Table) -> pa.Table:
        if has_vec:
            return t.append_column("__h", t["vec_id"].cast(pa.int64()))
        h = stable_hash64(pd.Series(t["clip_id"].to_pylist())).astype(np.int64)
        return t.append_column("__h", pa.array(h, pa.int64()))

    left = ds.map_batches(with_hash, batch_format="pyarrow").map_batches(
        _tag_fn("l", "__h", nb), batch_format="pyarrow"
    )
    keys = drops.map_batches(_tag_fn("r", "drop_h", nb), batch_format="pyarrow")

    def anti_bucket(t: pa.Table) -> pa.Table:
        lmask = pc.equal(t["__side"], "l")
        l = t.filter(lmask)
        dropset = t.filter(pc.invert(lmask))["drop_h"].combine_chunks()
        keep = pc.invert(pc.is_in(l["__h"].combine_chunks(), value_set=dropset))
        return l.filter(keep).drop_columns(
            [c for c in ("__side", "__bucket", "__h", "drop_h") if c in l.column_names]
        )

    return (
        left.union(keys)
        .groupby("__bucket")
        .map_groups(anti_bucket, batch_format="pyarrow")
    )


def curate_clips(clips_ds, cfg: ClipCurationConfig = ClipCurationConfig()):
    """Run the full chain. Returns ``(curated_ds, summary_df)`` — summary
    rows are exact integer counts per stage."""
    from schema_guru_ray.stages.audio_transform import resample_clips

    n_in = clips_ds.count()
    # materialize between the heavy decode map and the dedup shuffle: a
    # sort-based groupby sharing one streaming plan with a decode map
    # starves the map via the all-to-all's resource reservation (the
    # codec_verdicts finding, pipelines/validate.py) — measured >10min vs
    # ~1min at sf0.1 with the split plans. Also makes n_valid free.
    # fused stage 1: ONE decode yields both the verdict and the content
    # signature (sig/vec_id ride the rows from here) — the unfused chain
    # re-decoded every survivor in the signer, a second full corpus pass
    valid = filter_valid_and_sign(clips_ds, cfg.validation).materialize()
    n_valid = valid.count()
    if n_valid == 0:
        # an all-invalid (or empty) shard: every downstream stage would see
        # a schema-erased empty Dataset (Ray: UDFs never run on 0-row
        # blocks, schema() → None) — return the typed empty result directly
        import ray.data as rd

        from schema_guru_ray.sources.clips import CLIPS_SCHEMA

        summary = pd.DataFrame(
            {
                "stage": ["input", "valid", "exact_dedup", "near_dup", "curated"],
                "n": np.array([n_in, 0, 0, 0, 0], dtype="int64"),
            }
        )
        return rd.from_arrow(CLIPS_SCHEMA.empty_table()), summary
    deduped = exact_dedup_clips(valid).materialize()  # checkpoint boundary
    n_dedup = deduped.count()

    drops = _near_dup_drop_hashes(deduped, cfg).materialize()
    n_drop = drops.count()
    survivors = _remove_by_hash(
        deduped, drops, n_drop, cfg.drop_broadcast_limit
    ).map_batches(
        lambda t: t.drop_columns(["sig", "vec_id"]), batch_format="pyarrow"
    ).materialize()
    n_surv = survivors.count()

    curated = resample_clips(
        survivors, sr_out=cfg.sr_out, target_dbfs=cfg.target_dbfs
    ).materialize()
    n_out = curated.count()

    summary = pd.DataFrame(
        {
            "stage": ["input", "valid", "exact_dedup", "near_dup", "curated"],
            "n": [n_in, n_valid, n_dedup, n_surv, n_out],
        }
    )
    summary["n"] = summary["n"].astype("int64")
    return curated, summary


def curate_clips_checkpointed(input_files, out_dir: str,
                              cfg: ClipCurationConfig = ClipCurationConfig(),
                              num_partitions: int = 8, log=None):
    """Resumable audio curation over a parquet file list — four
    checkpointed stages under ``out_dir`` (atomic commit + lineage +
    config hash via ``state/checkpoint.run_partitioned``):

      valid/  — validate-and-filter, PER PARTITION over the input files
                (embarrassingly parallel; a crash re-decodes only the
                unfinished partitions — the expensive stage at 10^12);
      dedup/  — exact dedup by clip_id over the valid files (GLOBAL: the
                keep-one shuffle is one atomic unit);
      drops/  — content-signature drop ids (GLOBAL);
      final/  — drop removal + resample/normalize, PER PARTITION over the
                dedup output files.

    Returns {result: Dataset over final/, manifest: {stage: summary}}. A
    completed run's row set equals :func:`curate_clips` on the same
    corpus (tested, including crash-mid-run resume)."""
    import os

    import ray.data as rd

    from schema_guru_ray.state.checkpoint import config_hash, run_partitioned
    from schema_guru_ray.stages.audio_transform import resample_clips

    manifest = {}

    def _stage_files(stage_dir):
        return sorted(
            os.path.join(stage_dir, d, n)
            for d in os.listdir(stage_dir)
            if d.startswith("partition=")
            for n in os.listdir(os.path.join(stage_dir, d))
            if n.endswith(".parquet")
        )

    valid_dir = os.path.join(out_dir, "valid")
    # "op" versions the stage's OUTPUT SCHEMA, not just its parameters:
    # the fused validate-and-sign stage added sig/vec_id columns that the
    # drops stage reads back, so checkpoints written by the pre-fusion
    # code must invalidate (config-change semantics) instead of resuming
    # into a missing-column read.
    cfg_valid = config_hash({"stage": "valid", "op": "validate_and_sign_v2",
                             "v": vars(cfg.validation)})

    def run_valid(files, tmp_dir):
        # fused decode: verdict + content signature in one pass; the sig /
        # vec_id columns persist into the checkpoint so the drops stage is
        # a column-pruned scalar read, not a re-decode of the corpus
        out = filter_valid_and_sign(
            rd.read_parquet(files), cfg.validation
        ).materialize()
        out.write_parquet(tmp_dir)
        return {"n_valid": out.count()}

    manifest["valid"] = run_partitioned(
        list(input_files), valid_dir, run_valid, cfg_hash=cfg_valid,
        num_partitions=num_partitions, log=log,
    )

    valid_files = _stage_files(valid_dir)
    if not valid_files:
        # every partition validated to zero survivors (empty / all-invalid
        # shard): Ray writes no parquet for an empty Dataset, so the
        # downstream stages would read an empty path list — return the
        # typed empty result with the manifest as-is (resume semantics
        # hold: the valid checkpoints exist and record zero rows)
        from schema_guru_ray.sources.clips import CLIPS_SCHEMA

        for stage in ("dedup", "drops", "final"):
            manifest[stage] = {"config_hash": None, "partitions": [],
                               "skipped": 0, "ran": 0}
        return {"result": rd.from_arrow(CLIPS_SCHEMA.empty_table()),
                "manifest": manifest}

    dedup_dir = os.path.join(out_dir, "dedup")
    cfg_dedup = config_hash({"stage": "dedup", "valid_cfg": cfg_valid})

    def run_dedup(files, tmp_dir):
        # bucket count from parquet FOOTER metadata (the _meta_rows
        # pattern) — no plan-executing count() ahead of the shuffle
        import pyarrow.parquet as pq

        n = sum(pq.ParquetFile(f).metadata.num_rows for f in files)
        out = exact_dedup_clips(rd.read_parquet(files), n_rows=n).materialize()
        out.write_parquet(tmp_dir)
        return {"n_dedup": out.count()}

    manifest["dedup"] = run_partitioned(
        valid_files, dedup_dir, run_dedup, cfg_hash=cfg_dedup,
        num_partitions=1, log=log,
    )
    dedup_files = _stage_files(dedup_dir)

    drops_dir = os.path.join(out_dir, "drops")
    cfg_drops = config_hash({"stage": "drops", "dedup_cfg": cfg_dedup})

    def run_drops(files, tmp_dir):
        # 2-column pruned read of the dedup checkpoint (sig/vec_id were
        # computed by the fused valid stage) — pure scalar collapse
        sigs = rd.read_parquet(files, columns=["vec_id", "sig"])
        from schema_guru_ray.stages.audio_features import collapse_drop_hashes

        drops = collapse_drop_hashes(sigs).materialize()
        drops.write_parquet(tmp_dir)
        return {"n_drops": drops.count()}

    manifest["drops"] = run_partitioned(
        dedup_files, drops_dir, run_drops, cfg_hash=cfg_drops,
        num_partitions=1, log=log,
    )
    drop_files = _stage_files(drops_dir)

    final_dir = os.path.join(out_dir, "final")
    cfg_final = config_hash(
        {"stage": "final", "sr_out": cfg.sr_out, "dbfs": cfg.target_dbfs,
         "drops_cfg": cfg_drops}
    )

    def run_final(files, tmp_dir):
        part = rd.read_parquet(files)
        if drop_files:
            drops = rd.read_parquet(drop_files)
            part = _remove_by_hash(
                part, drops, drops.count(), cfg.drop_broadcast_limit
            )
        part = part.map_batches(
            lambda t: t.drop_columns(
                [c for c in ("sig", "vec_id") if c in t.column_names]
            ),
            batch_format="pyarrow",
        )
        out = resample_clips(
            part, sr_out=cfg.sr_out, target_dbfs=cfg.target_dbfs
        ).materialize()
        out.write_parquet(tmp_dir)
        return {"n_out": out.count()}

    manifest["final"] = run_partitioned(
        dedup_files, final_dir, run_final, cfg_hash=cfg_final,
        num_partitions=num_partitions, log=log,
    )
    return {"result": rd.read_parquet(_stage_files(final_dir)), "manifest": manifest}
