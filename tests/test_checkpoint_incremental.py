"""Append-aware incremental checkpoints (state/checkpoint.py
run_incremental): content-addressed contiguous chunks so a nightly append
to a 100 TB corpus re-validates only the chunks whose file membership
changed — the round-robin stripes of run_partitioned shift EVERY
partition's lineage on append and re-run the world.

Covers: (1) pure-python chunk/digest semantics, (2) the append fast path
(full chunks skip, only trailing-partial + new chunks run, the stale
partial is reported orphaned), (3) config-change invalidation, and (4) an
end-to-end run through the real validation pipeline with an appended
parquet file."""

import json
import os

import pytest

from schema_guru_ray.state.checkpoint import (
    config_hash,
    partition_chunks,
    partition_digest,
    run_incremental,
)


def _mk_files(tmp_path, names):
    files = []
    for n in names:
        f = tmp_path / f"{n}.txt"
        f.write_text(n)
        files.append(str(f))
    return files


def _record(calls):
    def proc(part_files, tmp_dir):
        calls.append(sorted(part_files))
        with open(os.path.join(tmp_dir, "result.json"), "w") as f:
            json.dump(sorted(part_files), f)
        return {"n": len(part_files)}

    return proc


class TestChunking:
    def test_contiguous_chunks_and_digest_stability(self, tmp_path):
        files = _mk_files(tmp_path, [f"in{i:02d}" for i in range(7)])
        chunks = partition_chunks(files, 3)
        assert [len(c) for c in chunks] == [3, 3, 1]
        assert chunks[0] == sorted(files)[:3]
        # digest depends only on membership, not order
        assert partition_digest(chunks[0]) == partition_digest(chunks[0][::-1])
        assert partition_digest(chunks[0]) != partition_digest(chunks[1])

    def test_append_preserves_full_chunk_digests(self, tmp_path):
        files = _mk_files(tmp_path, [f"in{i:02d}" for i in range(7)])
        before = partition_chunks(files, 3)
        grown = files + _mk_files(tmp_path, ["in07", "in08"])
        after = partition_chunks(grown, 3)
        # the two full chunks keep their identity; only the tail changes
        assert after[0] == before[0] and after[1] == before[1]
        assert partition_digest(after[2]) != partition_digest(before[2])


class TestIncrementalRun:
    def test_append_reruns_only_changed_chunks(self, tmp_path):
        files = _mk_files(tmp_path, [f"in{i:02d}" for i in range(7)])
        out = str(tmp_path / "out")
        cfg = config_hash({"v": 1})

        calls = []
        s1 = run_incremental(files, out, _record(calls), cfg, files_per_partition=3)
        assert s1["ran"] == 3 and s1["skipped"] == 0 and s1["orphaned"] == 0
        assert len(s1["active"]) == 3
        stale_partial = partition_digest(sorted(files)[6:])

        # nightly append: the partial chunk fills up + one new file arrives
        grown = files + _mk_files(tmp_path, ["in07", "in08", "in09"])
        calls2 = []
        s2 = run_incremental(grown, out, _record(calls2), cfg, files_per_partition=3)
        # chunks 0 and 1 are untouched full chunks → pure checkpoint hits
        assert s2["skipped"] == 2
        # only the re-shaped tail (in06..08) and the new chunk (in09) run
        assert s2["ran"] == 2
        assert calls2 == [sorted(grown)[6:9], sorted(grown)[9:]]
        # the superseded partial chunk is reported orphaned, left on disk
        assert s2["orphaned"] == 1
        assert s2["orphans"] == [f"partition={stale_partial}"]
        assert os.path.isdir(os.path.join(out, f"partition={stale_partial}"))
        # consumers read the ACTIVE set from the manifest, never a glob
        man = json.load(open(os.path.join(out, "_MANIFEST.json")))
        assert man["active"] == s2["active"] and len(man["active"]) == 4
        assert stale_partial not in man["active"]

    def test_identical_resubmission_is_pure_resume(self, tmp_path):
        files = _mk_files(tmp_path, [f"in{i}" for i in range(4)])
        out = str(tmp_path / "out")
        cfg = config_hash({"v": 1})
        run_incremental(files, out, _record([]), cfg, files_per_partition=2)
        calls = []
        s = run_incremental(files, out, _record(calls), cfg, files_per_partition=2)
        assert s["ran"] == 0 and s["skipped"] == 2 and calls == []

    def test_gc_orphans_removes_superseded_partitions(self, tmp_path):
        files = _mk_files(tmp_path, [f"in{i:02d}" for i in range(5)])
        out = str(tmp_path / "out")
        cfg = config_hash({"v": 1})
        run_incremental(files, out, _record([]), cfg, files_per_partition=3)
        stale = partition_digest(sorted(files)[3:])

        grown = files + _mk_files(tmp_path, ["in05"])
        s = run_incremental(grown, out, _record([]), cfg,
                            files_per_partition=3, gc_orphans=True)
        assert s["gc_removed"] == 1
        assert not os.path.exists(os.path.join(out, f"partition={stale}"))
        # the active set on disk is exactly the manifest's
        on_disk = sorted(p for p in os.listdir(out) if p.startswith("partition="))
        assert on_disk == sorted(f"partition={d}" for d in s["active"])

    def test_config_change_invalidates_all(self, tmp_path):
        files = _mk_files(tmp_path, [f"in{i}" for i in range(4)])
        out = str(tmp_path / "out")
        run_incremental(files, out, _record([]), config_hash({"v": 1}),
                        files_per_partition=2)
        s = run_incremental(files, out, _record([]), config_hash({"v": 2}),
                            files_per_partition=2)
        assert s["ran"] == 2 and s["skipped"] == 0

    def test_crash_commits_nothing_half_done(self, tmp_path):
        files = _mk_files(tmp_path, [f"in{i}" for i in range(4)])
        out = str(tmp_path / "out")
        cfg = config_hash({})
        state = {"calls": 0}

        def boom(part_files, tmp_dir):
            state["calls"] += 1
            if state["calls"] == 2:
                raise RuntimeError("simulated crash")
            return {"n": len(part_files)}

        with pytest.raises(RuntimeError, match="simulated"):
            run_incremental(files, out, boom, cfg, files_per_partition=2)
        committed = [p for p in os.listdir(out) if p.startswith("partition=")]
        assert len(committed) == 1  # only the first chunk committed
        s = run_incremental(files, out, _record([]), cfg, files_per_partition=2)
        assert s["skipped"] == 1 and s["ran"] == 1


class TestIncrementalProperty:
    """Hypothesis: under ANY sequence of corpus mutations (appends,
    removals, mid-list inserts) and reruns, the invariants hold —
    (1) the active set partitions exactly the current file list into
    contiguous chunks, (2) every active partition's committed result was
    computed from exactly its current inputs (never a stale membership),
    (3) a chunk whose membership didn't change never re-executes."""

    def test_arbitrary_mutation_sequences(self, tmp_path):
        from hypothesis import HealthCheck, given, settings
        from hypothesis import strategies as st

        mutation = st.tuples(
            st.sampled_from(["add", "remove"]),
            st.integers(0, 999),
        )

        @settings(max_examples=25, deadline=None,
                  suppress_health_check=[HealthCheck.function_scoped_fixture])
        @given(st.lists(st.lists(mutation, min_size=1, max_size=6),
                        min_size=1, max_size=4),
               st.integers(1, 4))
        def run(rounds, fpp):
            import shutil
            import tempfile

            root = tempfile.mkdtemp(dir=str(tmp_path))
            try:
                src = os.path.join(root, "src")
                out = os.path.join(root, "out")
                os.makedirs(src)
                cfg = config_hash({"v": 1})
                current = set()
                executed_for = {}  # digest -> (inputs computed from, exec count)
                prev_active = set()  # digests with a live checkpoint dir

                def proc(part_files, tmp_dir):
                    d = partition_digest(part_files)
                    n_prev = executed_for.get(d, (None, 0))[1]
                    executed_for[d] = (sorted(part_files), n_prev + 1)
                    with open(os.path.join(tmp_dir, "result.json"), "w") as f:
                        json.dump(sorted(part_files), f)
                    return {"n": len(part_files)}

                for ops in rounds:
                    for op, i in ops:
                        name = os.path.join(src, f"f{i:03d}.txt")
                        if op == "add":
                            with open(name, "w") as f:
                                f.write(str(i))
                            current.add(name)
                        elif name in current:
                            os.remove(name)
                            current.discard(name)
                    if not current:
                        continue
                    files = sorted(current)
                    before = dict(executed_for)
                    s = run_incremental(files, out, proc, cfg,
                                        files_per_partition=fpp,
                                        gc_orphans=True)
                    # (1) active set == contiguous chunking of the corpus
                    chunks = [files[i:i + fpp] for i in range(0, len(files), fpp)]
                    assert s["active"] == [partition_digest(c) for c in chunks]
                    for c in chunks:
                        d = partition_digest(c)
                        pdir = os.path.join(out, f"partition={d}")
                        meta = json.load(
                            open(os.path.join(pdir, "_SUCCESS.json")))
                        res = json.load(
                            open(os.path.join(pdir, "result.json")))
                        # (2) committed result matches current membership
                        assert meta["inputs"] == c and res == c
                        # (3) a chunk already checkpointed (live dir from
                        # the previous round) never re-executes: its
                        # execution COUNT must not grow on a hit
                        if d in prev_active:
                            assert executed_for[d][1] == before[d][1]
                    skipped = [p for p in s["partitions"]
                               if p["status"] == "skipped"]
                    assert len(skipped) == sum(
                        1 for c in chunks if partition_digest(c) in prev_active)
                    prev_active = set(s["active"])
            finally:
                shutil.rmtree(root, ignore_errors=True)

        run()


class TestValidatePipelineIncremental:
    """End-to-end: the real audio-validation pipeline in incremental mode,
    with a genuine parquet append between runs."""

    def test_append_only_validates_new_chunks(self, ray_session, tmp_path):
        import pyarrow.parquet as pq

        from schema_guru_ray.pipelines.validate import (
            ValidationConfig,
            run_validation_checkpointed,
        )
        from schema_guru_ray.sources.clips import generate_clips_table

        clips_dir = tmp_path / "clips"
        clips_dir.mkdir()
        tbl = generate_clips_table(120)
        for i in range(4):  # four 30-clip shards
            pq.write_table(tbl.slice(i * 30, 30), clips_dir / f"part-{i:03d}.parquet")

        out = str(tmp_path / "out")
        cfg = ValidationConfig()
        s1 = run_validation_checkpointed(
            str(clips_dir), out, cfg, files_per_partition=2)
        assert s1["ran"] == 2 and s1["skipped"] == 0
        assert sum(p["metrics"]["n_clips"] for p in s1["partitions"]) == 120

        # nightly append: one new shard lands after the existing ones
        pq.write_table(tbl.slice(0, 30), clips_dir / "part-004.parquet")
        s2 = run_validation_checkpointed(
            str(clips_dir), out, cfg, files_per_partition=2)
        # both full 2-file chunks are checkpoint hits; only the new
        # 1-file chunk decodes
        assert s2["skipped"] == 2 and s2["ran"] == 1
        ran = [p for p in s2["partitions"] if p["status"] == "ran"]
        assert ran[0]["metrics"]["n_clips"] == 30
        assert s2["orphaned"] == 0  # append aligned with chunk boundary

        # the active partitions carry real verdict parquet + lineage
        for d in s2["active"]:
            pdir = os.path.join(out, f"partition={d}")
            meta = json.load(open(os.path.join(pdir, "_SUCCESS.json")))
            assert meta["config_hash"] == s2["config_hash"]
            vd = os.path.join(pdir, "verdicts")
            assert any(f.endswith(".parquet") for f in os.listdir(vd))
