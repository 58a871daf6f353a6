"""Row-level schema validation (the inference→validation closed loop)."""

import json

import pandas as pd
import pytest

from schema_guru_ray.context import SchemaContext


@pytest.mark.usefixtures("ray_session")
class TestValidateAgainstSchema:
    def test_roundtrip_zero_violations_typed(self, sf_dir):
        import ray.data as rd

        from schema_guru_ray.pipelines.infer import infer_schema
        from schema_guru_ray.pipelines.validate_schema import validate_against_schema

        ds = rd.read_parquet(f"{sf_dir}/lineitem.parquet")
        schema = infer_schema(ds, SchemaContext(enum_cardinality=5))["schema"]
        assert validate_against_schema(ds, schema, id_column="l_orderkey").count() == 0

    def test_violations_detected_typed(self, ray_session):
        import ray.data as rd

        from schema_guru_ray.pipelines.validate_schema import validate_against_schema

        schema = {
            "type": "object",
            "properties": {
                "id": {"type": "integer", "minimum": 0, "maximum": 100},
                "tag": {"type": "string", "enum": ["a", "b"], "minLength": 1, "maxLength": 1},
            },
            "additionalProperties": False,
        }
        df = pd.DataFrame({"id": [5, 500, -3], "tag": ["a", "zz", "b"]})
        out = validate_against_schema(
            rd.from_pandas(df), schema, id_column="id"
        ).to_pandas()
        msgs = " | ".join(out["violation"])
        assert "500 > maximum" in msgs
        assert "-3 < minimum" in msgs
        assert "not in enum" in msgs and "maxLength" in msgs

    def test_json_column_violations(self, ray_session):
        import ray.data as rd

        from schema_guru_ray.pipelines.infer import infer_schema
        from schema_guru_ray.pipelines.validate_schema import validate_against_schema

        good = [{"doc": json.dumps({"k": i})} for i in range(20)]
        ds = rd.from_items(good)
        schema = infer_schema(ds, SchemaContext(), json_column="doc")["schema"]
        bad = rd.from_items(
            good + [{"doc": json.dumps({"k": "not an int"})}, {"doc": "{broken"}]
        )
        out = validate_against_schema(bad, schema, json_column="doc").to_pandas()
        assert len(out) == 2
        assert any("type string" in v for v in out["violation"])
        assert any("invalid JSON" in v for v in out["violation"])

    def test_query_entry(self, sf_dir):
        from schema_guru_ray.pipelines.queries import schema_roundtrip_validate_events

        out = schema_roundtrip_validate_events(sf_dir)
        by = dict(zip(out["scenario"], out["n_violations"]))
        assert by["clean"] == 0
        assert by["perturbed"] > 0


class TestNullEnumProduct:
    def test_null_in_nullable_enum_schema_is_valid(self):
        """Round-trip with enums + nulls: a corpus containing nulls must
        validate against its own derived schema — the enum annotation
        belongs to the string slot of the null+string product, not to the
        null slot."""
        from schema_guru_ray.context import SchemaContext
        from schema_guru_ray.schema.finalize import merge_and_transform, validate_instance
        from schema_guru_ray.schema.states import derive_with_errors

        ctx = SchemaContext(enum_cardinality=4, quantity=3)
        docs = [{"b": "x"}, {"b": "y"}, {"b": None}]
        state, errs = derive_with_errors(docs, ctx)
        assert errs == []
        schema = merge_and_transform(state, ctx)
        assert sorted(schema["properties"]["b"]["type"]) == ["null", "string"]
        for d in docs:
            assert validate_instance(d, schema) == [], d
        # non-enum values still rejected
        assert validate_instance({"b": "z"}, schema) != []


class TestVectorizedPrefilterParity:
    """The vectorized candidate prefilter must agree EXACTLY with the naive
    per-(row, column) validate_instance loop — including the adversarial
    cases the mask could get wrong (bool-vs-int enum entries, NaN-as-null,
    nulls under non-nullable types, boundary values)."""

    def _naive(self, batch, schema, id_column):
        import datetime as _dt

        from schema_guru_ray.schema.finalize import validate_instance

        cols = list(batch.column_names)
        data = {c: batch.column(c).to_pylist() for c in cols}
        ids = data.get(id_column) if id_column else list(range(batch.num_rows))
        props = schema.get("properties", {})
        out = []
        for i in range(batch.num_rows):
            for c in cols:
                sub = props.get(c)
                if sub is None:
                    continue
                v = data[c][i]
                if isinstance(v, float) and v != v:
                    v = None
                elif isinstance(v, (_dt.datetime, _dt.date)):
                    v = v.isoformat()
                for err in validate_instance(v, sub, path=f"$.{c}"):
                    out.append((str(ids[i]), err))
        return out

    def test_agrees_with_naive_loop(self):
        import numpy as np
        import pyarrow as pa

        from schema_guru_ray.pipelines.validate_schema import _validate_row_batch

        batch = pa.table(
            {
                "rid": pa.array(list(range(8)), pa.int64()),
                "i": pa.array([1, 5, 0, 100, None, 7, 2, 3], pa.int64()),
                "f": pa.array([0.5, float("nan"), 2.5, -1.0, 0.0, 9.9, 1.0, 2.0]),
                "s": pa.array(["a", "bb", None, "ddd", "e", "ff", "g", "hhhh"]),
                "ts": pa.array(
                    [None] * 8, pa.timestamp("us")
                ),  # timestamp column → exact-loop fallback path
            }
        )
        schema = {
            "type": "object",
            "properties": {
                "i": {"type": "integer", "minimum": 1, "maximum": 50,
                      "enum": [True, 1, 2, 3, 5, 7]},  # bool enum entry trap
                "f": {"type": ["number", "null"], "minimum": 0.0,
                      "maximum": 5.0},
                "s": {"type": "string", "minLength": 1, "maxLength": 3,
                      "enum": ["a", "bb", "ddd", "e", "ff", "g"]},
                "ts": {"type": ["string", "null"]},
            },
        }
        got = _validate_row_batch(batch, schema=schema, id_column="rid")
        got_pairs = list(zip(got["row_id"].to_pylist(),
                             got["violation"].to_pylist()))
        assert got_pairs == self._naive(batch, schema, "rid")
        assert len(got_pairs) > 0  # the fixture genuinely violates

    def test_clean_batch_has_zero_candidates_and_zero_violations(self):
        import pyarrow as pa

        from schema_guru_ray.pipelines.validate_schema import (
            _candidate_mask, _validate_row_batch,
        )

        batch = pa.table(
            {
                "i": pa.array([1, 2, 3], pa.int64()),
                "s": pa.array(["a", "b", "a"]),
            }
        )
        schema = {
            "type": "object",
            "properties": {
                "i": {"type": "integer", "minimum": 1, "maximum": 3},
                "s": {"type": "string", "minLength": 1, "maxLength": 1,
                      "enum": ["a", "b"]},
            },
        }
        for c in ("i", "s"):
            mask = _candidate_mask(batch, c, schema["properties"][c])
            assert mask is not None and not mask.any()
        out = _validate_row_batch(batch, schema=schema, id_column=None)
        assert out.num_rows == 0
