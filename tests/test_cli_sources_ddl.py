"""JSON corpus sources, CLI surface, and the DDL compile back-end."""

import json
import os
import subprocess
import sys

import pytest

from schema_guru_ray.schema.ddl import (
    added_columns,
    build_migrations,
    column_type,
    flatten_schema,
    jsonpaths,
    migration_ddl,
    snakify,
    table_ddl,
)

DOCS = [
    {"id": "f0e89550-7fda-11e4-bbe8-22000ad9bf74", "count": 3, "nested": {"ip": "10.0.0.1"}},
    {"id": "aaaa9550-7fda-11e4-bbe8-22000ad9bf74", "count": 45000, "nested": {"ip": "10.0.0.2"}},
]


@pytest.fixture()
def json_dir(tmp_path):
    d = tmp_path / "corpus"
    d.mkdir()
    for i, doc in enumerate(DOCS):
        (d / f"doc{i}.json").write_text(json.dumps(doc))
    (d / "broken.json").write_text("{not json")
    (d / ".hidden.json").write_text(json.dumps({"skip": "me"}))
    return str(d)


@pytest.mark.usefixtures("ray_session")
class TestJsonSources:
    def test_dir_reader_with_errors(self, json_dir):
        from schema_guru_ray.sources.json_source import error_rows, read_json_dir, valid_docs

        ds = read_json_dir(json_dir)
        assert valid_docs(ds).count() == 2  # dotfile skipped, broken split out
        errs = error_rows(ds).to_pandas()
        assert len(errs) == 1
        assert "broken.json" in errs["path"][0]

    def test_ndjson_reader(self, tmp_path):
        from schema_guru_ray.sources.json_source import read_ndjson, valid_docs

        p = tmp_path / "docs.ndjson"
        p.write_text("\n".join(json.dumps(d) for d in DOCS) + "\nnot-json\n")
        ds = read_ndjson(str(p))
        assert ds.count() == 3
        assert valid_docs(ds).count() == 2


class TestCli:
    def test_schema_command_json_dir(self, json_dir, tmp_path):
        out = tmp_path / "schema.json"
        r = subprocess.run(
            [sys.executable, "-m", "schema_guru_ray.cli", "schema", json_dir,
             "--output", str(out), "--vendor", "com.example", "--name", "thing"],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        schema = json.loads(out.read_text())
        assert schema["self"]["vendor"] == "com.example"
        assert schema["properties"]["id"]["format"] == "uuid"
        assert schema["properties"]["nested"]["properties"]["ip"]["format"] == "ipv4"


class TestCliOptions:
    def test_checkpoint_dir_rejects_json_input(self, json_dir, tmp_path):
        """--checkpoint-dir is keyed on parquet partition files; combined
        with a JSON dir (or --ndjson) it must fail FAST with a clear
        message instead of parsing the whole corpus and then crashing on
        an empty parquet glob (round-2 ADVICE)."""
        r = subprocess.run(
            [sys.executable, "-m", "schema_guru_ray.cli", "schema", json_dir,
             "--checkpoint-dir", str(tmp_path / "ckpt")],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r.returncode == 2
        assert "requires parquet input" in r.stderr
        assert not (tmp_path / "ckpt").exists()

    def test_no_length_and_enum(self, json_dir, tmp_path):
        out = tmp_path / "schema.json"
        r = subprocess.run(
            [sys.executable, "-m", "schema_guru_ray.cli", "schema", json_dir,
             "--output", str(out), "--no-length", "--enum", "5"],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        schema = json.loads(out.read_text())
        cnt = schema["properties"]["count"]
        assert "minLength" not in schema["properties"]["id"]
        assert set(cnt["enum"]) == {3, 45000}

    def test_ndjson_and_errors_path(self, tmp_path):
        nd = tmp_path / "docs.ndjson"
        nd.write_text("\n".join(json.dumps(d) for d in DOCS) + "\nnot json\n")
        errs = tmp_path / "errors"
        out = tmp_path / "schema.json"
        r = subprocess.run(
            [sys.executable, "-m", "schema_guru_ray.cli", "schema", str(nd),
             "--ndjson", "--output", str(out), "--errors-path", str(errs)],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        assert json.loads(out.read_text())["type"] == "object"
        import glob

        assert glob.glob(f"{errs}/*.parquet")

    def test_user_enum_set_file(self, json_dir, tmp_path):
        """User-defined enum set JSON file (reference SchemaCommand.scala:71-84)."""
        enum_file = tmp_path / "ips.json"
        enum_file.write_text(json.dumps(["10.0.0.1", "10.0.0.2", "10.0.0.3"]))
        out = tmp_path / "schema.json"
        r = subprocess.run(
            [sys.executable, "-m", "schema_guru_ray.cli", "schema", json_dir,
             "--output", str(out), "--enum-sets", str(enum_file)],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        schema = json.loads(out.read_text())
        # both observed ips are in the user set → substituted with the FULL set
        assert set(schema["properties"]["nested"]["properties"]["ip"]["enum"]) == {
            "10.0.0.1", "10.0.0.2", "10.0.0.3",
        }


class TestDdl:
    SCHEMA = {
        "type": "object",
        "properties": {
            "userId": {"type": "string", "format": "uuid"},
            "ip": {"type": "string", "format": "ipv4"},
            "when": {"type": "string", "format": "date-time"},
            "flag": {"type": "boolean"},
            "count": {"type": "integer", "minimum": 0, "maximum": 32767},
            "big": {"type": "integer", "minimum": 0, "maximum": 2**40},
            "ratio": {"type": "number", "minimum": 0},
            "code": {"type": "string", "minLength": 2, "maxLength": 2},
            "maybe": {"type": ["null", "string"], "maxLength": 10},
            "nested": {
                "type": "object",
                "properties": {"inner": {"type": "string", "maxLength": 5}},
                "additionalProperties": False,
            },
        },
        "additionalProperties": False,
    }

    def test_snakify(self):
        assert snakify("someColumnName") == "some_column_name"
        assert snakify("HTTPResponse") == "http_response"
        assert snakify("with-dash.dot") == "with_dash_dot"

    def test_flatten(self):
        paths = [p for p, _ in flatten_schema(self.SCHEMA)]
        assert "nested.inner" in paths and "userId" in paths

    def test_column_types(self):
        ddl = table_ddl(self.SCHEMA, "events_1")
        assert '"user_id" CHAR(36) NOT NULL' in ddl
        assert '"ip" VARCHAR(14) NOT NULL' in ddl
        assert '"when" TIMESTAMP NOT NULL' in ddl
        assert '"flag" BOOLEAN NOT NULL' in ddl
        assert '"count" SMALLINT NOT NULL' in ddl
        assert '"big" BIGINT NOT NULL' in ddl
        assert '"ratio" DOUBLE PRECISION NOT NULL' in ddl
        assert '"code" CHAR(2) NOT NULL' in ddl
        assert '"maybe" VARCHAR(10)' in ddl and "maybe\" VARCHAR(10) NOT NULL" not in ddl
        assert '"nested_inner" VARCHAR(5) NOT NULL' in ddl
        assert ddl.startswith("CREATE SCHEMA IF NOT EXISTS atomic;")

    def test_jsonpaths(self):
        jp = json.loads(jsonpaths(self.SCHEMA))
        assert "$.nested.inner" in jp["jsonpaths"]

    def test_migration(self):
        old = {"type": "object", "properties": {"a": {"type": "integer", "minimum": 0, "maximum": 5}}}
        new = {
            "type": "object",
            "properties": {
                "a": {"type": "integer", "minimum": 0, "maximum": 5},
                "b": {"type": "string", "maxLength": 4},
            },
        }
        adds = added_columns(old, new)
        assert [p for p, _ in adds] == ["b"]
        sql = migration_ddl(old, new, "t_1", "1-0-0", "1-0-1")
        assert 'ADD COLUMN "b" VARCHAR(4)' in sql
        assert "BEGIN TRANSACTION;" in sql and "END TRANSACTION;" in sql
        migs = build_migrations({"1-0-0": old, "1-0-1": new}, "t_1")
        assert ("1-0-0", "1-0-1") in migs

    def test_ddl_cli(self, tmp_path):
        schema_file = tmp_path / "com.example" / "thing.json"
        schema_file.parent.mkdir()
        schema_file.write_text(
            json.dumps(
                {
                    "$schema": "x",
                    "self": {"vendor": "com.example", "name": "thing", "format": "jsonschema", "version": "1-0-0"},
                    **self.SCHEMA,
                }
            )
        )
        out_dir = tmp_path / "out"
        r = subprocess.run(
            [sys.executable, "-m", "schema_guru_ray.cli", "ddl", str(tmp_path),
             "--output", str(out_dir), "--with-json-paths"],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r.returncode == 0, r.stderr[-2000:]
        sqls = os.listdir(out_dir / "sql")
        assert any(f.startswith("com_example_thing_1") for f in sqls)
        assert os.listdir(out_dir / "jsonpaths")


class TestDdlRound2:
    """Migration diff (added/modified/removed through intermediates,
    Migrations.scala:101-146), insertion-ordered flatten (package.scala:70
    ListMap), --split-product (README.md:266), --no-header."""

    def test_flatten_preserves_insertion_order(self):
        from schema_guru_ray.schema.ddl import flatten_schema

        schema = {
            "type": "object",
            "properties": {
                "zeta": {"type": "integer"},
                "alpha": {"type": "string"},
                "mid": {"type": "object",
                        "properties": {"b": {"type": "integer"}, "a": {"type": "string"}}},
            },
        }
        paths = [p for p, _ in flatten_schema(schema)]
        assert paths == ["zeta", "alpha", "mid.b", "mid.a"]

    def test_schema_diff_added_modified_removed(self):
        from schema_guru_ray.schema.ddl import schema_diff

        v100 = {"type": "object", "properties": {
            "a": {"type": "integer", "minimum": 0, "maximum": 5},
            "gone": {"type": "string", "maxLength": 3},
        }}
        v101 = {"type": "object", "properties": {
            "a": {"type": "integer", "minimum": 0, "maximum": 5},
            "b": {"type": "string", "maxLength": 4},
        }}
        v102 = {"type": "object", "properties": {
            "a": {"type": "integer", "minimum": 0, "maximum": 99999},  # modified
            "b": {"type": "string", "maxLength": 8},  # added in 1-0-1, modified later
            "c": {"type": "boolean"},
        }}
        d = schema_diff(v100, [v101, v102])
        # added: first-appearance order; attrs from the FINAL target; a
        # property added then modified stays in added (Migrations.scala:47-49)
        assert [p for p, _ in d["added"]] == ["b", "c"]
        assert dict(d["added"])["b"]["maxLength"] == 8
        assert [p for p, _ in d["modified"]] == ["a"]
        assert d["removed"] == ["gone"]

    def test_migration_warns_on_modified_and_removed(self):
        from schema_guru_ray.schema.ddl import migration_ddl

        old = {"type": "object", "properties": {
            "a": {"type": "integer", "minimum": 0, "maximum": 5},
            "gone": {"type": "string", "maxLength": 3}}}
        new = {"type": "object", "properties": {
            "a": {"type": "integer", "minimum": 0, "maximum": 99999}}}
        sql = migration_ddl(old, new, "t_1", "1-0-0", "1-0-1")
        # no added columns -> the reference's explicit placeholder, not an
        # empty (silently wrong) transaction (RedshiftMigration.scala:92)
        assert "NO ADDED COLUMNS CAN BE EXPRESSED IN SQL MIGRATION" in sql
        assert "property 'a' changed its definition" in sql
        assert "property 'gone' was removed" in sql

    def test_migration_order_through_intermediates(self):
        from schema_guru_ray.schema.ddl import build_migrations

        v0 = {"type": "object", "properties": {"a": {"type": "integer"}}}
        v1 = {"type": "object", "properties": {"a": {"type": "integer"},
                                               "z_first": {"type": "integer"}}}
        v2 = {"type": "object", "properties": {"a": {"type": "integer"},
                                               "z_first": {"type": "integer"},
                                               "b_second": {"type": "integer"}}}
        migs = build_migrations({"1-0-0": v0, "1-0-1": v1, "1-0-2": v2}, "t_1")
        sql = migs[("1-0-0", "1-0-2")]
        # append order = first appearance (z_first before b_second), NOT
        # alphabetical (Migrations.scala:191-198)
        assert sql.index('"z_first"') < sql.index('"b_second"')

    def test_split_product(self):
        from schema_guru_ray.schema.ddl import flatten_schema, table_ddl

        schema = {"type": "object", "properties": {
            "v": {"type": ["integer", "string"], "maximum": 5, "minimum": 0,
                  "maxLength": 12},
        }}
        cols = dict(flatten_schema(schema, split_product=True))
        assert set(cols) == {"v.integer", "v.string"}
        assert cols["v.integer"] == {"type": ["integer", "null"], "minimum": 0, "maximum": 5}
        assert cols["v.string"] == {"type": ["string", "null"], "maxLength": 12}
        ddl = table_ddl(schema, "t_1", split_product=True)
        assert '"v_integer" SMALLINT' in ddl and '"v_string" VARCHAR(12)' in ddl
        assert "NOT NULL" not in ddl  # split columns are nullable
        lumped = table_ddl(schema, "t_1")
        assert '"v" VARCHAR(4096)' in lumped

    def test_cli_header_and_no_header(self, tmp_path):
        import subprocess
        import sys as _sys

        schema_file = tmp_path / "raw.json"
        schema_file.write_text(json.dumps(
            {"type": "object", "properties": {"a": {"type": "integer"}}}))
        for flag, expect_header in (([], True), (["--no-header"], False)):
            out_dir = tmp_path / ("out_h" if expect_header else "out_nh")
            r = subprocess.run(
                [_sys.executable, "-m", "schema_guru_ray.cli", "ddl",
                 str(schema_file), "--output", str(out_dir), "--raw-mode", *flag],
                capture_output=True, text=True, cwd="/root/repo",
            )
            assert r.returncode == 0, r.stderr[-2000:]
            text = (out_dir / "sql" / "raw.sql").read_text()
            assert ("AUTO-GENERATED" in text) == expect_header

    def test_cli_split_product_excludes_jsonpaths(self, tmp_path):
        import subprocess
        import sys as _sys

        schema_file = tmp_path / "raw.json"
        schema_file.write_text(json.dumps({"type": "object", "properties": {}}))
        r = subprocess.run(
            [_sys.executable, "-m", "schema_guru_ray.cli", "ddl", str(schema_file),
             "--output", str(tmp_path / "o"), "--split-product", "--with-json-paths"],
            capture_output=True, text=True, cwd="/root/repo",
        )
        assert r.returncode == 1
        assert "cannot be used together" in r.stdout + r.stderr

    def test_multiple_of_decimal(self):
        """Number with multipleOf 0.01 becomes DECIMAL (README.md:267)."""
        from schema_guru_ray.schema.ddl import column_type

        assert column_type({"type": "number", "multipleOf": 0.01}) == "DECIMAL(36,2)"
        assert column_type({"type": "number"}) == "DOUBLE PRECISION"
