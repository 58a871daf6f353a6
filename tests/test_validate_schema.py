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
