"""Flagship constraint-validation pipeline over the clips table.

Topology (SURVEY.md §3.5):

    read clips → map_batches(ClipValidator, actor pool)   [bytes dropped here]
      → verdicts Dataset (streams; audio never crosses a shuffle)
      ├─ write/consume verdict rows + exploded violation rows
      ├─ exact clip_id dedup: groupby(clip_id) count>1     [hash shuffle of ids only]
      └─ per-codec aggregate: per-batch partials keyed by (codec, salt)
         → groupby([codec, salt]) merge → groupby(codec) merge+finalize
         (two-level salted aggregate — codec is Zipf-skewed by construction;
         the salt bounds any single reducer's load, north rule)

Only tiny pickled aggregate states shuffle; the wide ``bytes`` column is
projected away by the validator stage itself.
"""

from __future__ import annotations

import pickle
from collections import Counter
from dataclasses import dataclass, field
from typing import Dict, Optional

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from schema_guru_ray.sketches.drift import ks_statistic, psi
from schema_guru_ray.sketches.hll import HLL
from schema_guru_ray.sketches.kll import KLL
from schema_guru_ray.stages.audio import ClipValidator, explode_violations
from schema_guru_ray.stages.profile import stable_hash64


@dataclass(frozen=True)
class ValidationConfig:
    snr_threshold_db: float = 30.0
    check_transcript: bool = True
    strict_codecs: bool = False
    pass_violation_rate: float = 0.02  # per-codec verdict threshold
    pass_psi: float = 0.25  # drift verdict threshold (industry convention)
    n_salts: int = 8
    hll_p: int = 12
    kll_k: int = 800  # tail accuracy: q0.99 err 2% vs 12.5% at k=200, state ~15 KB
    validator_batch_size: int = 512
    # "tasks": warm-worker cached state (fast start; right when the decoder
    # state is cheap to build, as here). "actors": explicit actor pool —
    # right when per-actor state is expensive (real codec libs, broadcast
    # baseline sketch stores); pays pool spin-up per execution.
    validator_mode: str = "tasks"
    # actor-pool sizing (mode="actors"): autoscaling, min 1 so the stage can
    # always start even when the pool would otherwise reserve every CPU
    # (4-CPU test sessions).
    validator_concurrency: object = (1, 24)  # int or (min, max)
    validator_num_cpus: float = 1.0


def validate_clips(ds, cfg: ValidationConfig = ValidationConfig()):
    """clips Dataset → verdicts Dataset (lazy). The validator state (decoder
    registry + thresholds) loads once per worker/actor; audio bytes do not
    flow past this stage."""
    kwargs = dict(
        snr_threshold_db=cfg.snr_threshold_db,
        check_transcript=cfg.check_transcript,
        strict_codecs=cfg.strict_codecs,
    )
    if cfg.validator_mode == "tasks":
        from schema_guru_ray.stages.audio import validate_batch_task

        return ds.map_batches(
            validate_batch_task,
            fn_kwargs=kwargs,
            batch_format="pyarrow",
            batch_size=cfg.validator_batch_size,
        )
    return ds.map_batches(
        ClipValidator,
        fn_constructor_kwargs=kwargs,
        batch_format="pyarrow",
        batch_size=cfg.validator_batch_size,
        concurrency=cfg.validator_concurrency,
        num_cpus=cfg.validator_num_cpus,
    )


def violations_dataset(verdicts):
    """Long-format violation rows (clip_id, codec, kind) — the error sink
    analogue (reference SchemaDerive.scala:58-62), written as a Dataset,
    never collected to the driver."""
    return verdicts.map_batches(explode_violations, batch_format="pyarrow")


def duplicate_clip_ids(verdicts):
    """Exact uniqueness check on clip_id (SURVEY.md §2.7 D4): hash-shuffle of
    the id column only → groups with count > 1. The id projection is
    materialized first so the decode-heavy validate map never shares a
    streaming plan with the groupby's all-to-all (whose resource
    reservation would starve it — see codec_verdicts)."""
    from schema_guru_ray.stages.joins import bucketed_aggregate, derive_num_buckets

    ids = verdicts.select_columns(["clip_id"]).materialize()
    # clip_id is a groups≈rows key: bucketed vectorized count, not the
    # native per-group aggregate (round-5 trap — see bucketed_aggregate)
    counts = bucketed_aggregate(
        ids, "clip_id", {"n_copies": ("clip_id", "size")},
        n_buckets=derive_num_buckets(ids.count()),
    )
    return counts.map_batches(
        lambda t: t.filter(pc.greater(t["n_copies"], 1)),
        batch_format="pyarrow",
    )


# --- per-codec aggregate ----------------------------------------------------


@dataclass
class CodecAgg:
    """Mergeable per-codec validation aggregate."""

    n: int = 0
    n_ok: int = 0
    viol_counts: Counter = field(default_factory=Counter)
    clip_hll: Optional[HLL] = None
    dur_kll: Optional[KLL] = None
    sr_kll: Optional[KLL] = None
    snr_kll: Optional[KLL] = None

    def merge(self, other: "CodecAgg") -> "CodecAgg":
        def m(a, b):
            return a.merge(b) if a is not None and b is not None else (a or b)

        out = CodecAgg(
            n=self.n + other.n,
            n_ok=self.n_ok + other.n_ok,
            viol_counts=self.viol_counts + other.viol_counts,
            clip_hll=m(self.clip_hll, other.clip_hll),
            dur_kll=m(self.dur_kll, other.dur_kll),
            sr_kll=m(self.sr_kll, other.sr_kll),
            snr_kll=m(self.snr_kll, other.snr_kll),
        )
        return out


# sentinel key for a NULL codec inside the two groupby levels (sort-based
# shuffles need a totally ordered string key); decoded back to None when the
# per-codec verdict rows are finalized. The \x00 prefix cannot collide with a
# real codec label.
NULL_CODEC = "\x00<null>"

# codec_verdicts takes the driver-fold fast path when the partial-state row
# count is at most this (each row ~50 KB of pickled sketches: bounded pull).
# A full-corpus run (hundreds of blocks × codecs × salts) stays on the
# distributed two-level groupby; a checkpoint chunk of a few blocks skips
# two all-to-all plan executions of pure fixed overhead.
DRIVER_FOLD_PARTIALS = 512


class CodecPartialAggregator:
    """map_batches kernel over verdict batches → one pickled CodecAgg per
    (codec, salt) per batch. The salt (stable hash of clip_id mod S) spreads
    a hot codec over S reducers for the first-level merge."""

    def __init__(self, cfg: ValidationConfig):
        self.cfg = cfg

    def __call__(self, batch: pa.Table) -> pa.Table:
        cfg = self.cfg
        hashes = stable_hash64(batch["clip_id"].to_pandas())
        salts = (hashes % np.uint64(cfg.n_salts)).astype(np.int32)
        # a null codec (broken upstream field) is one GROUP, per SQL GROUP BY
        # semantics — encoded as a sentinel string so the two sort-based
        # groupby levels see a totally ordered key; decoded back to None in
        # the finalize loop. np.unique over a None-bearing object array would
        # TypeError here; fill_null keeps the encoding vectorized.
        codecs = np.asarray(
            pc.fill_null(batch["codec"], NULL_CODEC).to_pylist()
        )
        oks = batch["ok"].to_numpy(zero_copy_only=False)
        # int32-with-nulls converts to float64 NaN; NaN must not enter the
        # KLLs (it poisons every quantile comparison downstream)
        durs = batch["dur_ms"].to_numpy(zero_copy_only=False).astype(np.float64)
        srs = batch["sr_hz"].to_numpy(zero_copy_only=False).astype(np.float64)
        snrs = batch["snr_db"].to_numpy(zero_copy_only=False)

        def _finite(x):
            return x[~np.isnan(x)]

        viols = batch["violations"].to_pylist()

        rows = []
        for codec in np.unique(codecs):
            cmask = codecs == codec
            for salt in np.unique(salts[cmask]):
                mask = cmask & (salts == salt)
                agg = CodecAgg(
                    n=int(mask.sum()),
                    n_ok=int(oks[mask].sum()),
                    viol_counts=Counter(
                        k for i in np.nonzero(mask)[0] for k in viols[i]
                    ),
                    clip_hll=HLL(cfg.hll_p).add_hashes(hashes[mask]),
                    dur_kll=KLL(cfg.kll_k).add_many(_finite(durs[mask])),
                    sr_kll=KLL(cfg.kll_k).add_many(_finite(srs[mask])),
                    snr_kll=KLL(cfg.kll_k).add_many(_finite(snrs[mask])),
                )
                rows.append(
                    {"codec": str(codec), "salt": int(salt), "agg": pickle.dumps(agg)}
                )
        return pa.Table.from_pylist(
            rows,
            schema=pa.schema(
                [("codec", pa.string()), ("salt", pa.int32()), ("agg", pa.binary())]
            ),
        )


def _merge_agg_group(g: pd.DataFrame) -> pd.DataFrame:
    acc: Optional[CodecAgg] = None
    for buf in g["agg"]:
        a = pickle.loads(buf)
        acc = a if acc is None else acc.merge(a)
    return pd.DataFrame(
        {"codec": [g["codec"].iloc[0]], "salt": [0], "agg": [pickle.dumps(acc)]}
    )


def _local_merge_batch(b: pd.DataFrame) -> pd.DataFrame:
    """Combiner level: merge a batch's states by (codec, salt) WITHOUT a
    shuffle — a batch of a few thousand per-block partials collapses to ≤
    codecs × salts rows, so the sort-based groupby that follows moves
    dozens of states instead of one per (block × codec × salt). By
    associativity the result is identical."""
    out = []
    for (codec, salt), g in b.groupby(["codec", "salt"], sort=False):
        acc: Optional[CodecAgg] = None
        for buf in g["agg"]:
            a = pickle.loads(buf)
            acc = a if acc is None else acc.merge(a)
        out.append({"codec": codec, "salt": int(salt), "agg": pickle.dumps(acc)})
    return pd.DataFrame(out)


def codec_verdicts(
    verdicts,
    cfg: ValidationConfig = ValidationConfig(),
    baseline: Optional[Dict[str, Dict[str, bytes]]] = None,
    return_store: bool = False,
):
    """verdicts Dataset → per-codec pass/fail verdict table (small, pandas).

    ``return_store=True`` additionally returns the baseline sketch store
    {codec: {col: KLL bytes}} extracted from the SAME aggregation pass
    (zero extra execution) as ``(cv_df, store)`` — the checkpointed runner
    commits it per partition so baseline refreshes never re-aggregate
    verdict rows.

    Two-level salted aggregate: groupby([codec, salt]) merges the per-batch
    partials, then groupby(codec) merges the ≤ n_salts survivors and
    finalizes (counts, HLL distinct, KLL quantiles, PSI/KS drift vs the
    broadcast baseline store, pass/fail).

    Two execution-shape choices here are load-bearing (both measured on
    the 250k-clip scaling corpus at 8 CPUs):

    * ``batch_size=None`` on the partial aggregator: inherit the upstream
      (validator) batching. A fixed large batch_size LOOKS harmless — the
      aggregator reads tiny verdict rows — but map-fusion propagates it UP
      into the fused read→validate→aggregate task and re-batches the wide
      binary clips into ~batch_size×38KB bundles.
    * ``materialize()`` of the partial states BEFORE the groupby: when the
      sort-based groupby shares one streaming plan with the heavy fused
      decode map, the all-to-all's resource reservation starves the map
      operator down to ~1 concurrent task at small CPU counts (measured:
      271s wall for 260 CPU-s — serial; the same map runs at full
      concurrency alone). Splitting the plan costs one materialization of
      KB-scale state rows (distributed, spillable — never the clips) and
      restored 8-CPU wall time from 274s to 55s (5x).

    A shuffle-free combiner (``_local_merge_batch``) then collapses the
    per-block states to ≤ codecs × salts per 4096-state batch, so the
    sort-based groupby moves dozens of rows — the aggregate tail stays
    O(seconds) regardless of block count (the Amdahl term of the N-vs-4N
    scaling measurement).

    Small-partition fast path: when the materialized partials hold at
    most ``DRIVER_FOLD_PARTIALS`` state rows (a checkpoint CHUNK of a few
    blocks — the shape the incremental runner executes dozens of times
    per resubmission), the two sort-based groupby levels are replaced by
    one ``take_all`` + driver fold: the merge is associative, the pull is
    ≤ limit × ~50 KB, and the two all-to-all plan executions (~1-2 s of
    fixed overhead each at tiny data) disappear.
    """
    partials = verdicts.map_batches(
        CodecPartialAggregator(cfg), batch_format="pyarrow", batch_size=None
    ).materialize()
    if partials.count() <= DRIVER_FOLD_PARTIALS:
        merged: Dict[str, CodecAgg] = {}
        for row in partials.take_all():
            a = pickle.loads(row["agg"])
            c = row["codec"]
            merged[c] = merged[c].merge(a) if c in merged else a
        level2_rows = [
            {"codec": c, "agg": pickle.dumps(a)} for c, a in sorted(merged.items())
        ]
    else:
        combined = partials.map_batches(
            _local_merge_batch, batch_format="pandas", batch_size=4096
        )
        level1 = combined.groupby(["codec", "salt"]).map_groups(
            _merge_agg_group, batch_format="pandas"
        )
        level2 = level1.groupby("codec").map_groups(
            _merge_agg_group, batch_format="pandas")
        level2_rows = level2.take_all()  # one row per codec — tiny
    rows = []
    store: Dict[Optional[str], Dict[str, bytes]] = {}
    for row in level2_rows:
        codec = None if row["codec"] == NULL_CODEC else row["codec"]
        agg: CodecAgg = pickle.loads(row["agg"])
        if return_store:
            store[codec] = {
                "dur_ms": agg.dur_kll.to_bytes(),
                "sr_hz": agg.sr_kll.to_bytes(),
            }
        viol_total = sum(agg.viol_counts.values())
        rate = viol_total / max(1, agg.n)
        distinct = agg.clip_hll.estimate() if agg.clip_hll else 0.0
        rec = {
            "codec": codec,
            "n_clips": agg.n,
            "n_ok": agg.n_ok,
            "n_violations": viol_total,
            "violation_rate": rate,
            "violations_by_kind": dict(sorted(agg.viol_counts.items())),
            "approx_distinct_clips": distinct,
            "approx_dup_ratio": max(0.0, 1.0 - distinct / max(1, agg.n)),
            "dur_p50": agg.dur_kll.quantile(0.5) if agg.dur_kll and agg.dur_kll.n else None,
            "dur_p95": agg.dur_kll.quantile(0.95) if agg.dur_kll and agg.dur_kll.n else None,
            "snr_p50": agg.snr_kll.quantile(0.5) if agg.snr_kll and agg.snr_kll.n else None,
        }
        drift_fail = False
        if baseline and codec in baseline:
            base = baseline[codec]
            for col, sk in (("dur_ms", agg.dur_kll), ("sr_hz", agg.sr_kll)):
                # sk.n == 0 ⇔ the column was all-NULL for this codec group:
                # there is no current distribution to drift-score
                if col in base and sk is not None and sk.n:
                    b = KLL.from_bytes(base[col])
                    rec[f"psi_{col}"] = psi(b, sk)
                    rec[f"ks_{col}"] = ks_statistic(b, sk)
                    drift_fail = drift_fail or rec[f"psi_{col}"] > cfg.pass_psi
        rec["passed"] = bool(rate <= cfg.pass_violation_rate and not drift_fail)
        rows.append(rec)
    if not rows:
        # empty shard-day: typed zero-row verdict table, not a KeyError on
        # sort_values over a columnless frame (Ray yields no groups at all)
        cv = pd.DataFrame(
            {
                "codec": pd.Series(dtype=object),
                "n_clips": pd.Series(dtype="int64"),
                "n_ok": pd.Series(dtype="int64"),
                "n_violations": pd.Series(dtype="int64"),
                "violation_rate": pd.Series(dtype="float64"),
                "violations_by_kind": pd.Series(dtype=object),
                "approx_distinct_clips": pd.Series(dtype="float64"),
                "approx_dup_ratio": pd.Series(dtype="float64"),
                "dur_p50": pd.Series(dtype="float64"),
                "dur_p95": pd.Series(dtype="float64"),
                "snr_p50": pd.Series(dtype="float64"),
                "passed": pd.Series(dtype="bool"),
            }
        )
        return (cv, store) if return_store else cv
    # None codec sorts last (na_position default) — deterministic order
    cv = pd.DataFrame(rows).sort_values("codec", na_position="last").reset_index(drop=True)
    return (cv, store) if return_store else cv


def run_validation_checkpointed(
    clips_dir: str,
    out_dir: str,
    cfg: ValidationConfig = ValidationConfig(),
    baseline: Optional[Dict[str, Dict[str, bytes]]] = None,
    num_partitions: int = 8,
    files_per_partition: Optional[int] = None,
    gc_orphans: bool = False,
    log=None,
):
    """Checkpointed flagship run: the clips parquet files are grouped into
    partitions; each partition streams read → validate → write
    (verdicts/violations parquet + codec verdict csv) and commits an atomic
    ``_SUCCESS.json`` with lineage + metrics. A rerun skips finished
    partitions (see state/checkpoint.py).

    ``files_per_partition`` switches to the APPEND-AWARE incremental mode
    (content-addressed partitions): a nightly resubmission over a grown
    corpus re-validates only the chunks whose file membership changed,
    instead of every round-robin stripe."""
    import glob
    import os

    import ray.data as rd

    from schema_guru_ray.state.checkpoint import (
        config_hash,
        run_incremental,
        run_partitioned,
    )

    files = sorted(glob.glob(os.path.join(clips_dir, "*.parquet")))
    if not files:
        raise FileNotFoundError(f"no parquet files under {clips_dir}")

    def process(part_files, tmp_dir):
        ds = rd.read_parquet(part_files)
        verdicts = validate_clips(ds, cfg).materialize()  # per-partition working set
        verdicts.write_parquet(os.path.join(tmp_dir, "verdicts"))
        violations_dataset(verdicts).write_parquet(os.path.join(tmp_dir, "violations"))
        cv, store = codec_verdicts(
            verdicts, cfg, baseline=baseline, return_store=True)
        cv.assign(
            violations_by_kind=cv["violations_by_kind"].map(
                lambda d: __import__("json").dumps(d)
            )
        ).to_parquet(os.path.join(tmp_dir, "codec_verdicts.parquet"))
        n = verdicts.count()
        # per-partition sketch blobs (from the SAME aggregation pass that
        # produced cv): a corpus baseline refresh merges these
        # O(#partitions) KB-sized stores instead of re-aggregating
        # corpus-scale verdict ROWS (see sketch_store.merge_stores)
        from schema_guru_ray.state.sketch_store import save_baseline, sketch_cfg_hash

        save_baseline(
            store,
            os.path.join(tmp_dir, "sketches.json"),
            source=";".join(part_files[:2]) + ("..." if len(part_files) > 2 else ""),
            cfg_hash=sketch_cfg_hash(cfg),
            meta={"n_clips": n},
        )
        return {
            "n_clips": n,
            "n_ok": int(cv["n_ok"].sum()),
            "n_violations": int(cv["n_violations"].sum()),
            "codecs_passed": int(cv["passed"].sum()),
            "codecs_total": int(len(cv)),
        }

    cfg_h = config_hash(vars(cfg) | {"baseline": baseline is not None})
    if files_per_partition is not None:
        return run_incremental(
            files, out_dir, process, cfg_hash=cfg_h,
            files_per_partition=files_per_partition,
            gc_orphans=gc_orphans, log=log,
        )
    return run_partitioned(
        files,
        out_dir,
        process,
        cfg_hash=cfg_h,
        num_partitions=num_partitions,
        log=log,
    )


def build_baseline(verdicts, cfg: ValidationConfig = ValidationConfig()):
    """Build a baseline sketch store {codec: {col: KLL bytes}} from a
    reference run. Small (KBs/codec); broadcast with ray.put at use time.
    One aggregation pass shared with the verdict table — see
    codec_verdicts(return_store=True)."""
    return codec_verdicts(verdicts, cfg, return_store=True)[1]


def _sketch_part_dirs(out_dir: str, active: Optional[list]):
    import glob
    import os

    if active is not None:
        return [os.path.join(out_dir, f"partition={d}") for d in active]
    return sorted(glob.glob(os.path.join(out_dir, "partition=*")))


def _require_sketches(part_dirs) -> None:
    """Driver-side existence pre-check: raise a CATCHABLE FileNotFoundError
    for legacy trees (partitions committed before per-partition sketches)
    BEFORE any fan-out — inside a Ray task the same raise would surface as
    RayTaskError and slip past the caller's typed fallback."""
    import os

    missing = [p for p in part_dirs
               if not os.path.exists(os.path.join(p, "sketches.json"))]
    if missing:
        raise FileNotFoundError(
            f"{len(missing)} partition(s) lack sketches.json (first: "
            f"{missing[0]}) — they predate per-partition sketches; rebuild "
            "from verdict rows instead")


# above this many partitions the sketch loads/merges fan out as Ray tasks
# (each KB-sized, so thousands are fine on the driver; a 10^12-clip tree
# has ~10^5 partitions and 10s of GB of blobs — that must parallelize)
DRIVER_SKETCH_DIRS = 256


def merge_partition_baselines(
    out_dir: str,
    active: Optional[list] = None,
    cfg: ValidationConfig = ValidationConfig(),
    driver_limit: int = DRIVER_SKETCH_DIRS,
):
    """Rebuild a corpus baseline store by merging the per-partition
    ``sketches.json`` blobs a checkpointed run commits alongside each
    partition's verdicts. Cost is O(#partitions × codecs) KB-sized loads
    — never touches verdict rows. ``active`` restricts to the manifest's
    active set (incremental mode leaves orphans on disk). Returns
    ``(store, total_clips)``; raises FileNotFoundError when any selected
    partition predates per-partition sketches (caller falls back to the
    row-level rebuild).

    Two regimes: up to ``driver_limit`` partitions load sequentially on
    the driver; above it the loads+merges fan out as a ``map_batches``
    over the dir list, each task emitting ONE pre-merged store, and the
    driver folds ≤ #tasks results (KLL merge is associative and
    order-insensitive for quantile queries — same tree-fold argument as
    the cmvn/label fanin patterns)."""
    import os

    from schema_guru_ray.state.sketch_store import (
        load_baseline,
        merge_stores,
        sketch_cfg_hash,
    )

    part_dirs = _sketch_part_dirs(out_dir, active)
    _require_sketches(part_dirs)
    expect = sketch_cfg_hash(cfg)

    def load_one(p: str):
        return load_baseline(
            os.path.join(p, "sketches.json"), expect_cfg_hash=expect)

    if len(part_dirs) <= driver_limit:
        stores, n_clips = [], 0
        for p in part_dirs:
            store, meta = load_one(p)
            stores.append(store)
            n_clips += int(meta.get("meta", {}).get("n_clips", 0))
        return merge_stores(stores), n_clips

    import ray.data as rd

    def merge_task(b: pd.DataFrame) -> pd.DataFrame:
        loaded = [load_one(p) for p in b["dir"]]
        merged = merge_stores([s for s, _ in loaded])
        n = sum(int(m.get("meta", {}).get("n_clips", 0)) for _, m in loaded)
        return pd.DataFrame({"store": [pickle.dumps(merged)], "n": [n]})

    parts = rd.from_items(
        [{"dir": p} for p in part_dirs]
    ).map_batches(merge_task, batch_format="pandas", batch_size=64)
    try:
        rows = parts.take_all()  # ≤ #tasks rows, one pre-merged store each
    except Exception as exc:
        # a failure inside a Ray task surfaces as RayTaskError, which the
        # caller's typed fallback (ValueError/OSError/...) would NOT catch
        # — normalize so the slow-but-always-correct row-level rebuild
        # engages in the distributed regime too
        raise ValueError(
            f"distributed sketch merge failed: {exc}") from exc
    return (
        merge_stores([pickle.loads(r["store"]) for r in rows]),
        int(sum(r["n"] for r in rows)),
    )


def drift_by_partition(
    out_dir: str,
    baseline: Dict[str, Dict[str, bytes]],
    cfg: ValidationConfig = ValidationConfig(),
    active: Optional[list] = None,
    min_n: int = 100,
    driver_limit: int = DRIVER_SKETCH_DIRS,
) -> pd.DataFrame:
    """Localize distribution drift to PARTITIONS: score every committed
    partition's sketch blobs against the corpus baseline store and return
    one row per (partition, codec, column) with PSI/KS and a drifted
    flag. The corpus-level drift verdict (``codec_verdicts(baseline=…)``)
    says THAT a codec drifted; this says WHERE — which chunk of last
    night's append moved — without touching a single verdict row.

    Two regimes like :func:`merge_partition_baselines`: ≤ ``driver_limit``
    partitions score on the driver; above it the scoring fans out as a
    ``map_batches`` over the dir list with the baseline store BROADCAST
    once via ``ray.put`` (the report is embarrassingly parallel per
    partition — no shuffle).

    ``min_n``: a (partition, codec) slice with fewer than this many
    values is never FLAGGED (PSI over quantile bins is noise at small
    support — measured: a 300-clip partition's minority codec scores
    PSI 0.39 against its own corpus). The psi/ks values and the slice
    size (``n``) are still reported, so a caller can apply its own bar."""
    import os

    from schema_guru_ray.state.sketch_store import load_baseline, sketch_cfg_hash

    part_dirs = _sketch_part_dirs(out_dir, active)
    _require_sketches(part_dirs)
    expect = sketch_cfg_hash(cfg)

    def score_dir(p: str, base: Dict) -> list:
        name = os.path.basename(p).split("=", 1)[1]
        store, meta = load_baseline(
            os.path.join(p, "sketches.json"), expect_cfg_hash=expect)
        n = int(meta.get("meta", {}).get("n_clips", 0))
        out = []
        for codec, cols in store.items():
            base_cols = base.get(codec, {})
            for col, raw in cols.items():
                cur = KLL.from_bytes(raw)
                rec = {"partition": name, "codec": codec, "col": col,
                       "n_clips": n, "n": int(cur.n),
                       "psi": None, "ks": None, "drifted": False}
                if col in base_cols and cur.n:
                    b = KLL.from_bytes(base_cols[col])
                    rec["psi"] = psi(b, cur)
                    rec["ks"] = ks_statistic(b, cur)
                    rec["drifted"] = bool(
                        cur.n >= min_n and rec["psi"] > cfg.pass_psi)
                out.append(rec)
        return out

    if len(part_dirs) <= driver_limit:
        rows = [r for p in part_dirs for r in score_dir(p, baseline)]
    else:
        import ray
        import ray.data as rd

        base_ref = ray.put(baseline)  # broadcast once, not per task

        def score_task(b: pd.DataFrame) -> pd.DataFrame:
            base = ray.get(base_ref)
            return pd.DataFrame(
                [r for p in b["dir"] for r in score_dir(p, base)])

        try:
            rows = rd.from_items(
                [{"dir": p} for p in part_dirs]
            ).map_batches(score_task, batch_format="pandas",
                          batch_size=64).take_all()
        except Exception as exc:
            # normalize RayTaskError for typed callers (see _require_sketches)
            raise ValueError(
                f"distributed drift scoring failed: {exc}") from exc
    if not rows:
        return pd.DataFrame({
            "partition": pd.Series(dtype=object),
            "codec": pd.Series(dtype=object),
            "col": pd.Series(dtype=object),
            "n_clips": pd.Series(dtype="int64"),
            "n": pd.Series(dtype="int64"),
            "psi": pd.Series(dtype="float64"),
            "ks": pd.Series(dtype="float64"),
            "drifted": pd.Series(dtype="bool"),
        })
    return (pd.DataFrame(rows)
            .sort_values(["partition", "codec", "col"])
            .reset_index(drop=True))
