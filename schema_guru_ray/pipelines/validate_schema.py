"""Row-level constraint validation against a JSON Schema — the closed loop
between inference and validation: derive a schema from a reference corpus,
then stream any corpus through it and emit one violation row per failed
constraint.

This is the engine's generalization of the reference's round-trip contract
(RandomValidSpec.scala:35-69: every instance validates against its own
derived schema) into a production validation stage: the schema dict is tiny
and ships in the task closure; rows never leave their batch; violations are
a Dataset (never collected to the driver).
"""

from __future__ import annotations

import datetime as _dt
import json
from typing import Any, Dict, List, Optional

import pyarrow as pa

from schema_guru_ray.schema.finalize import validate_instance


def _validate_json_batch(batch: pa.Table, *, schema: Dict[str, Any],
                         json_column: str, id_column: Optional[str]) -> pa.Table:
    ids = (
        batch.column(id_column).to_pylist()
        if id_column
        else list(range(batch.num_rows))
    )
    out_ids: List[Any] = []
    out_errs: List[str] = []
    for rid, s in zip(ids, batch.column(json_column).to_pylist()):
        if s is None:
            continue
        try:
            doc = json.loads(s)
        except (ValueError, TypeError) as e:
            out_ids.append(rid)
            out_errs.append(f"$: invalid JSON: {e}")
            continue
        for err in validate_instance(doc, schema):
            out_ids.append(rid)
            out_errs.append(err)
    return pa.Table.from_arrays(
        [pa.array([str(i) for i in out_ids], pa.string()), pa.array(out_errs, pa.string())],
        names=["row_id", "violation"],
    )


def _validate_row_batch(batch: pa.Table, *, schema: Dict[str, Any],
                        id_column: Optional[str]) -> pa.Table:
    """Typed-table path: each row validated as an object of its columns
    (binary columns skipped — content checks live in the audio stage)."""
    cols = [
        c for c in batch.column_names
        if not pa.types.is_binary(batch.schema.field(c).type)
        and not pa.types.is_large_binary(batch.schema.field(c).type)
    ]
    data = {c: batch.column(c).to_pylist() for c in cols}
    ids = data.get(id_column, list(range(batch.num_rows))) if id_column else list(
        range(batch.num_rows)
    )
    props = schema.get("properties", {})
    out_ids: List[Any] = []
    out_errs: List[str] = []
    for i in range(batch.num_rows):
        for c in cols:
            sub = props.get(c)
            if sub is None:
                continue
            v = data[c][i]
            if isinstance(v, float) and v != v:  # NaN → null semantics
                v = None
            elif isinstance(v, (_dt.datetime, _dt.date)):
                v = v.isoformat()  # timestamps render as date-time strings
            for err in validate_instance(v, sub, path=f"$.{c}"):
                out_ids.append(ids[i])
                out_errs.append(err)
    return pa.Table.from_arrays(
        [pa.array([str(i) for i in out_ids], pa.string()), pa.array(out_errs, pa.string())],
        names=["row_id", "violation"],
    )


def validate_against_schema(ds, schema: Dict[str, Any],
                            json_column: Optional[str] = None,
                            id_column: Optional[str] = None,
                            batch_size: int = 8192):
    """Stream a Dataset through a JSON Schema; returns a violations Dataset
    (row_id, violation). ``json_column``: validate parsed documents from
    that string column; otherwise validate typed rows column-wise."""
    if json_column is not None:
        return ds.map_batches(
            _validate_json_batch,
            fn_kwargs=dict(schema=schema, json_column=json_column, id_column=id_column),
            batch_format="pyarrow",
            batch_size=batch_size,
        )
    return ds.map_batches(
        _validate_row_batch,
        fn_kwargs=dict(schema=schema, id_column=id_column),
        batch_format="pyarrow",
        batch_size=batch_size,
    )
