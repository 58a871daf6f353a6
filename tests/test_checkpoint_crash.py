"""Crash-mid-run resume semantics of the partitioned checkpoint runner
(state/checkpoint.py): a failure between partitions must leave committed
work trusted, uncommitted work invisible, and a rerun must finish only
the remainder."""

import json
import os

import pytest

from schema_guru_ray.state.checkpoint import config_hash, run_partitioned


def _mk_files(tmp_path, n=6):
    files = []
    for i in range(n):
        f = tmp_path / f"in{i}.txt"
        f.write_text(str(i))
        files.append(str(f))
    return files


class TestCrashResume:
    def test_crash_then_resume_completes_remainder(self, tmp_path):
        files = _mk_files(tmp_path)
        out = str(tmp_path / "out")
        state = {"calls": 0, "crashed": False}

        def boom_on_second(part_files, tmp_dir):
            state["calls"] += 1
            if state["calls"] == 2 and not state["crashed"]:
                state["crashed"] = True
                raise RuntimeError("simulated worker crash")
            with open(os.path.join(tmp_dir, "result.json"), "w") as f:
                json.dump({"files": sorted(part_files)}, f)
            return {"n": len(part_files)}

        cfg = config_hash({"v": 1})
        with pytest.raises(RuntimeError, match="simulated"):
            run_partitioned(files, out, boom_on_second, cfg, num_partitions=3)

        # partition 0 committed; the crashed partition left NO trusted dir
        names = sorted(os.listdir(out))
        assert "partition=0000" in names
        assert "partition=0001" not in names  # tmp dir only, not committed
        assert all(not n.startswith("partition=0001") or n.startswith(".tmp")
                   for n in names if "0001" in n)

        summary = run_partitioned(files, out, boom_on_second, cfg, num_partitions=3)
        assert summary["skipped"] == 1 and summary["ran"] == 2
        # every partition now has a committed result + matching lineage
        for i in range(3):
            pdir = os.path.join(out, f"partition={i:04d}")
            with open(os.path.join(pdir, "_SUCCESS.json")) as f:
                meta = json.load(f)
            with open(os.path.join(pdir, "result.json")) as f:
                res = json.load(f)
            assert res["files"] == meta["inputs"]

    def test_leftover_tmp_dir_is_cleaned_on_retry(self, tmp_path):
        files = _mk_files(tmp_path, 2)
        out = str(tmp_path / "out2")
        os.makedirs(os.path.join(out, ".tmp-partition=0000"))
        with open(os.path.join(out, ".tmp-partition=0000", "junk"), "w") as f:
            f.write("stale")

        def proc(part_files, tmp_dir):
            assert not os.path.exists(os.path.join(tmp_dir, "junk"))
            return {"n": len(part_files)}

        summary = run_partitioned(files, out, proc, config_hash({}), num_partitions=2)
        assert summary["ran"] == 2
