"""Persistent baseline sketch store: on-disk round-trip, stale-parameter
rejection, and cross-run drift scoring against a loaded (not in-memory)
baseline — the north star's "baseline sketch store" made durable."""

import glob
import json
import os

import pytest

from schema_guru_ray.state.sketch_store import (
    load_baseline,
    save_baseline,
    sketch_cfg_hash,
)


@pytest.fixture(scope="module")
def clips_dir(tmp_path_factory):
    from schema_guru_ray.sources.clips import ClipsConfig, generate_clips_table

    d = tmp_path_factory.mktemp("clips")
    tab = generate_clips_table(600, ClipsConfig(seed=7))
    import pyarrow.parquet as pq

    pq.write_table(tab.slice(0, 300), str(d / "a.parquet"))
    pq.write_table(tab.slice(300), str(d / "b.parquet"))
    return str(d)


def test_roundtrip_and_reject(tmp_path):
    store = {"pcm16": {"dur_ms": b"\x01\x02", "sr_hz": b"\xff"}}
    path = str(tmp_path / "base.json")
    save_baseline(store, path, source="corpus-a", cfg_hash="abc",
                  meta={"n_clips": 600})
    loaded, meta = load_baseline(path, expect_cfg_hash="abc")
    assert loaded == store
    assert meta["source"] == "corpus-a" and meta["meta"]["n_clips"] == 600

    with pytest.raises(ValueError, match="different sketch parameters"):
        load_baseline(path, expect_cfg_hash="other")

    manifest = json.load(open(path))
    manifest["version"] = 99
    json.dump(manifest, open(path, "w"))
    with pytest.raises(ValueError, match="version"):
        load_baseline(path)


def test_sketch_cfg_hash_scope():
    """Only sketch-shaping params invalidate a store."""
    from schema_guru_ray.pipelines.validate import ValidationConfig

    base = sketch_cfg_hash(ValidationConfig())
    assert sketch_cfg_hash(ValidationConfig(pass_psi=0.9)) == base
    assert sketch_cfg_hash(ValidationConfig(kll_k=200)) != base


@pytest.mark.usefixtures("ray_session")
def test_cross_run_drift_with_persisted_baseline(clips_dir, tmp_path):
    """Run 1 validates a corpus and persists the baseline; run 2 (fresh
    store loaded from disk) scores a duration-shifted corpus against it:
    self-drift passes, shifted corpus fails on PSI."""
    import ray.data as rd

    from schema_guru_ray.pipelines.validate import (
        ValidationConfig,
        build_baseline,
        codec_verdicts,
        run_validation_checkpointed,
        validate_clips,
    )
    from schema_guru_ray.sources.clips import ClipsConfig, clips_dataset

    cfg = ValidationConfig()
    out = str(tmp_path / "run1")
    run_validation_checkpointed(clips_dir, out, cfg, num_partitions=2)
    verdict_files = sorted(
        glob.glob(os.path.join(out, "partition=*", "verdicts", "*.parquet"))
    )
    assert verdict_files
    store = build_baseline(rd.read_parquet(verdict_files), cfg)
    path = str(tmp_path / "baseline.json")
    save_baseline(store, path, source=clips_dir,
                  cfg_hash=sketch_cfg_hash(cfg))

    loaded, _ = load_baseline(path, expect_cfg_hash=sketch_cfg_hash(cfg))
    assert {c: set(v) for c, v in loaded.items()} == {
        c: set(v) for c, v in store.items()
    }

    # self comparison: tiny drift
    self_cv = codec_verdicts(
        validate_clips(rd.read_parquet(sorted(glob.glob(clips_dir + "/*.parquet"))), cfg),
        cfg, baseline=loaded,
    )
    assert "psi_dur_ms" in self_cv.columns
    assert (self_cv["psi_dur_ms"].dropna() < 0.05).all()

    # duration-shifted corpus: drift verdict fails
    shifted = validate_clips(
        clips_dataset(800, ClipsConfig(median_dur_ms=600.0, seed=43)), cfg
    )
    shift_cv = codec_verdicts(shifted, cfg, baseline=loaded)
    assert (shift_cv["psi_dur_ms"].dropna() > 0.25).any()
    assert not shift_cv["passed"].all()
