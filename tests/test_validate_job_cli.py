"""End-to-end test of the cluster entry point ``jobs/validate_job.py`` —
the `ray job submit` surface — driven exactly as a deployment would:
fresh subprocesses (each owns its own standalone Ray session), a real
output tree, and a rerun that must resume by skipping every finished
partition. The in-container job server (aiohttp) is absent, so the
submit transport itself can't run here; this exercises everything below
it (arg parsing, session bootstrap, checkpointed run, baseline
write/read, summary JSON on stdout)."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
JOB = os.path.join(REPO, "jobs", "validate_job.py")


def _run(args):
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # force the standalone bootstrap branch
    out = subprocess.run(
        [sys.executable, JOB, *args], capture_output=True, text=True,
        env=env, cwd=REPO, timeout=600,
    )
    assert out.returncode == 0, out.stderr[-2000:]
    return json.loads(out.stdout.strip().splitlines()[-1]), out.stderr


@pytest.fixture(scope="module")
def clips_path():
    from schema_guru_ray.sources.clips import ensure_clips

    return ensure_clips("/root/testdata/sf0.001")


def test_job_runs_resumes_and_writes_baseline(clips_path, tmp_path_factory):
    out_dir = str(tmp_path_factory.mktemp("vjob"))
    base = os.path.join(out_dir, "baseline.json")

    summary, _ = _run([clips_path, "--out", out_dir, "--partitions", "3",
                       "--num-cpus", "4", "--write-baseline", base])
    n_parts = len(summary["partitions"])  # bounded by the corpus file count
    assert n_parts >= 2
    assert summary["ran"] == n_parts and summary["skipped"] == 0
    # per-partition lineage + metrics on disk
    for idx in range(n_parts):
        man = os.path.join(out_dir, f"partition={idx:04d}", "_SUCCESS.json")
        meta = json.load(open(man))
        assert meta["config_hash"] == summary["config_hash"]
        assert meta["metrics"]["n_clips"] > 0
        assert meta["inputs"]  # lineage: the partition's source files
    store = json.load(open(base))
    assert store["n_codecs"] > 0 and store["sketches"]

    # identical resubmission: pure resume, nothing re-executes
    summary2, _ = _run([clips_path, "--out", out_dir, "--partitions", "3",
                        "--num-cpus", "4"])
    assert summary2["ran"] == 0 and summary2["skipped"] == n_parts

    # a config change (baseline now present) invalidates the checkpoints:
    # the drift-scored rerun must NOT silently reuse un-scored partitions
    summary3, _ = _run([clips_path, "--out", out_dir, "--partitions", "3",
                        "--num-cpus", "4", "--baseline", base])
    assert summary3["ran"] == n_parts and summary3["skipped"] == 0
