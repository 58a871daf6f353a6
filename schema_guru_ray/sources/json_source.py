"""JSON corpus sources (the reference's primary input shape).

* :func:`read_json_dir` — recursive directory of one-JSON-per-file
  (FileSystemJsonGetters.scala:66-119): dotfiles skipped, parse errors kept
  as rows, not exceptions.
* :func:`read_ndjson` — newline-delimited JSON, one document per line with
  line-number error capture (FileSystemJsonGetters.scala:151-179).

Both return a Dataset of rows ``(path, doc, valid, error)`` where ``doc`` is
the raw JSON string (parsed downstream inside the derive kernel — parsing
twice would waste the batch). Reading is ``read_binary_files`` /
``read_text`` so listing + IO parallelize across the cluster.
"""

from __future__ import annotations

import os
from typing import List, Optional

import pyarrow as pa


def _validate_batch(batch: pa.Table, path_col: Optional[str]) -> pa.Table:
    import json

    docs = batch["doc"].to_pylist()
    paths = batch[path_col].to_pylist() if path_col else [""] * len(docs)
    valid, errors = [], []
    for p, d in zip(paths, docs):
        try:
            json.loads(d)
            valid.append(True)
            errors.append(None)
        except (ValueError, TypeError) as e:
            valid.append(False)
            errors.append(f"{p}: invalid JSON: {e}")
    return pa.Table.from_arrays(
        [
            pa.array([str(p) for p in paths], pa.string()),
            pa.array(docs, pa.string()),
            pa.array(valid),
            pa.array(errors, pa.string()),
        ],
        names=["path", "doc", "valid", "error"],
    )


def read_json_dir(path: str):
    """Recursive dir of JSON files → (path, doc, valid, error) rows.
    Dotfiles are skipped (FileSystemJsonGetters.scala:73-77)."""
    import ray.data as rd

    files: List[str] = []
    for root, _dirs, names in os.walk(path):
        for n in sorted(names):
            if not n.startswith("."):
                files.append(os.path.join(root, n))
    if not files:
        raise FileNotFoundError(f"no JSON files under {path}")
    ds = rd.read_binary_files(files, include_paths=True)

    def decode(batch: pa.Table) -> pa.Table:
        docs = [b.decode("utf-8", "replace") for b in batch["bytes"].to_pylist()]
        t = pa.Table.from_arrays(
            [batch["path"], pa.array(docs, pa.string())], names=["path", "doc"]
        )
        return _validate_batch(t, "path")

    return ds.map_batches(decode, batch_format="pyarrow")


def read_ndjson(path: str):
    """NDJSON file(s) → one (path, doc, valid, error) row per line."""
    import ray.data as rd

    ds = rd.read_text(path)

    def tag(batch: pa.Table) -> pa.Table:
        t = pa.Table.from_arrays([batch["text"]], names=["doc"])
        return _validate_batch(t, None)

    return ds.map_batches(tag, batch_format="pyarrow")


def valid_docs(ds):
    """The success side of the Validation split (SchemaGuru.scala:46-55)."""
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda t: t.filter(t["valid"]).select(["doc"]), batch_format="pyarrow"
    )


def error_rows(ds):
    """The failure side — write with ds.write_parquet(errors_path), the
    reference's --errors-path sink (SchemaDerive.scala:58-62)."""
    import pyarrow.compute as pc

    return ds.map_batches(
        lambda t: t.filter(pc.invert(t["valid"])).select(["path", "error"]),
        batch_format="pyarrow",
    )
