"""Mega-scale stress: the headline validation pipeline over a 1M-clip
corpus (~37 GB of WAV payloads) — deliberately LARGER than this node's
37.6 GB object store, so the run only completes if the pipeline truly
streams (blocks enter, verdict rows leave, payloads are dropped at the
validator; nothing corpus-sized ever materializes).

    python jobs/megascale_stress.py [--n 1000000] [--cpus 32] [--keep]

Generates the corpus once (atomic _ensure cache under
/tmp/graft_clips/mega), times generation, headline validation
(validate_clips + codec_verdicts), and the exact duplicate-id pass
(shuffles only (clip_id, md5) rows), prints one JSON line, and deletes
the corpus unless --keep. Results recorded in BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

MEGA_PATH = "/tmp/graft_clips/mega"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1_000_000)
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--keep", action="store_true")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=args.cpus, include_dashboard=False,
                 logging_level="ERROR", log_to_driver=False)
    from ray.data import DataContext

    DataContext.get_current().enable_progress_bars = False

    from schema_guru_ray.sources.clips import SCALING_CFG, _ensure, read_clips
    from schema_guru_ray.pipelines.validate import (
        ValidationConfig,
        codec_verdicts,
        validate_clips,
    )

    t0 = time.perf_counter()
    path = _ensure(MEGA_PATH, args.n, SCALING_CFG)
    gen_sec = time.perf_counter() - t0
    du = sum(
        os.path.getsize(os.path.join(path, f)) for f in os.listdir(path)
    )

    vcfg = ValidationConfig()
    t0 = time.perf_counter()
    cv = codec_verdicts(validate_clips(read_clips(path), vcfg), vcfg)
    val_sec = time.perf_counter() - t0
    n_clips = int(cv["n_clips"].sum())

    # duplicate-id pass: only (clip_id, md5) rows shuffle, never payloads
    from schema_guru_ray.pipelines.validate import duplicate_clip_ids

    t0 = time.perf_counter()
    dups = duplicate_clip_ids(read_clips(path, columns=["clip_id"]))
    n_dup = dups.count()
    dup_sec = time.perf_counter() - t0

    out = {
        "metric": "mega-scale streaming validation (corpus > object store)",
        "n_clips": n_clips,
        "corpus_gb": round(du / 2**30, 1),
        "num_cpus": args.cpus,
        "gen_sec": round(gen_sec, 1),
        "validate_sec": round(val_sec, 1),
        "clips_per_sec": round(n_clips / val_sec, 1),
        "dup_ids_sec": round(dup_sec, 1),
        "n_duplicate_ids": int(n_dup),
    }
    print(json.dumps(out))
    ray.shutdown()
    if not args.keep:
        shutil.rmtree(path, ignore_errors=True)


if __name__ == "__main__":
    main()
