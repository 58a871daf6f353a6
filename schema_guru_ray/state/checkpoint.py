"""Resumable partitioned execution (north rule: "resumable from checkpoint
with per-partition lineage + metrics").

The reference has no checkpointing at all (SURVEY.md §4). Our layout:

    out_dir/
      partition=0000/
        <outputs>.parquet ...
        _SUCCESS.json     ← lineage (input files + config hash) + metrics
      partition=0001/ ...
      _MANIFEST.json      ← run-level summary, written last

A partition directory is written to a ``.tmp-`` sibling and atomically
renamed, so a crash mid-partition leaves no half-trusted output. On resume,
partitions whose ``_SUCCESS.json`` exists AND matches the current config
hash + input lineage are skipped; a config change invalidates every
checkpoint (a resumed run never mixes configs — SURVEY.md §7.4).

Partitions are input-file groups: the natural resumability unit for a
100 TB corpus where each shard is independently re-creatable from its
fragment list.
"""

from __future__ import annotations

import hashlib
import json
import os
import shutil
import time
from typing import Callable, Dict, List, Optional, Sequence

SUCCESS = "_SUCCESS.json"
MANIFEST = "_MANIFEST.json"


def config_hash(obj) -> str:
    """Stable digest of a (dataclass-ish or dict) config."""
    try:
        payload = json.dumps(obj, sort_keys=True, default=lambda o: vars(o))
    except TypeError:
        payload = repr(obj)
    return hashlib.sha256(payload.encode()).hexdigest()[:16]


def partition_inputs(files: Sequence[str], num_partitions: int) -> List[List[str]]:
    """Deterministic grouping of input files into partitions."""
    files = sorted(files)
    num_partitions = max(1, min(num_partitions, len(files)))
    return [list(files[i::num_partitions]) for i in range(num_partitions)]


def _partition_dir(out_dir: str, idx: int) -> str:
    return os.path.join(out_dir, f"partition={idx:04d}")


def is_partition_done(out_dir: str, idx: int, cfg_hash: str, files: Sequence[str]) -> bool:
    p = os.path.join(_partition_dir(out_dir, idx), SUCCESS)
    if not os.path.exists(p):
        return False
    try:
        with open(p) as f:
            meta = json.load(f)
    except (OSError, ValueError):
        return False
    return meta.get("config_hash") == cfg_hash and meta.get("inputs") == sorted(files)


def run_partitioned(
    input_files: Sequence[str],
    out_dir: str,
    process_partition: Callable[[List[str], str], Dict],
    cfg_hash: str,
    num_partitions: int = 8,
    log: Optional[Callable[[str], None]] = None,
) -> Dict:
    """Run ``process_partition(files, tmp_dir) -> metrics`` for every
    partition not already checkpointed; commit each atomically. Returns the
    run manifest (also written to ``out_dir/_MANIFEST.json``)."""
    os.makedirs(out_dir, exist_ok=True)
    parts = partition_inputs(input_files, num_partitions)
    summary = {"config_hash": cfg_hash, "partitions": [], "skipped": 0, "ran": 0}
    for idx, files in enumerate(parts):
        final_dir = _partition_dir(out_dir, idx)
        if is_partition_done(out_dir, idx, cfg_hash, files):
            summary["skipped"] += 1
            summary["partitions"].append({"idx": idx, "status": "skipped"})
            if log:
                log(f"partition {idx}: checkpoint hit, skipping")
            continue
        tmp_dir = os.path.join(out_dir, f".tmp-partition={idx:04d}")
        shutil.rmtree(tmp_dir, ignore_errors=True)
        os.makedirs(tmp_dir)
        t0 = time.time()
        metrics = process_partition(list(files), tmp_dir)
        meta = {
            "partition": idx,
            "inputs": sorted(files),
            "config_hash": cfg_hash,
            "wall_sec": round(time.time() - t0, 3),
            "metrics": metrics,
        }
        with open(os.path.join(tmp_dir, SUCCESS), "w") as f:
            json.dump(meta, f, indent=1, sort_keys=True)
        shutil.rmtree(final_dir, ignore_errors=True)
        os.replace(tmp_dir, final_dir)
        summary["ran"] += 1
        summary["partitions"].append(
            {"idx": idx, "status": "ran", "wall_sec": meta["wall_sec"], "metrics": metrics}
        )
        if log:
            log(f"partition {idx}: done in {meta['wall_sec']}s")
    with open(os.path.join(out_dir, MANIFEST), "w") as f:
        json.dump(summary, f, indent=1, sort_keys=True, default=str)
    return summary
