"""DDL compile back-end (SURVEY.md §2.9): JSON Schema → Redshift
``CREATE TABLE`` + JSONPaths + version-to-version migrations.

Driver-scale post-processing over one small schema object — mirrors the
reference's ``ddl`` command behavior (DdlCommand.scala:66-83, type mapping
per README.md:256-270, migrations per Migrations.scala) without copying its
implementation:

* flatten nested properties to dotted paths (C1);
* type mapping: uuid → CHAR(36), ipv4 → VARCHAR(14), ipv6 → VARCHAR(39),
  date-time → TIMESTAMP, minLength==maxLength → CHAR(n), integer bands →
  SMALLINT/INT/BIGINT, number → DOUBLE PRECISION, boolean → BOOLEAN,
  enum-only → VARCHAR(max enum len), product/object-without-properties →
  VARCHAR(varchar_size) (C2);
* migration diff: added columns between self-describing versions rendered
  as ``ALTER TABLE ... ADD COLUMN`` transactions (C3-C5); columns are only
  ever appended at the end, never mid-table (C6).
"""

from __future__ import annotations

import json
import os
import re
from typing import Dict, List, Optional, Tuple

INT16_MAX = 32767
INT32_MAX = 2147483647


def snakify(name: str) -> str:
    """camelCase / dashed names → snake_case column names."""
    s = re.sub(r"([A-Z]+)([A-Z][a-z])", r"\1_\2", name)
    s = re.sub(r"([a-z\d])([A-Z])", r"\1_\2", s)
    return s.replace("-", "_").replace(".", "_").lower()


def flatten_schema(schema: dict, prefix: str = "") -> List[Tuple[str, dict]]:
    """JSON Schema object → ordered flat list of (dotted.path, attrs)
    (the reference's PropertyList, package.scala:70). Arrays and objects
    without properties terminate as opaque columns."""
    out: List[Tuple[str, dict]] = []
    props = schema.get("properties")
    if props is None:
        return [(prefix or "root", schema)]
    for key in sorted(props):
        sub = props[key]
        path = f"{prefix}.{key}" if prefix else key
        types = sub.get("type")
        tlist = types if isinstance(types, list) else [types]
        if "object" in tlist and sub.get("properties"):
            out.extend(flatten_schema(sub, path))
        else:
            out.append((path, sub))
    return out


def column_type(attrs: dict, varchar_size: int = 4096) -> str:
    types = attrs.get("type")
    tlist = [t for t in (types if isinstance(types, list) else [types]) if t]
    non_null = [t for t in tlist if t != "null"]
    fmt = attrs.get("format")
    if len(non_null) != 1:
        return f"VARCHAR({varchar_size})"  # product type / unknown
    t = non_null[0]
    if t == "string":
        if fmt == "uuid":
            return "CHAR(36)"
        if fmt == "ipv4":
            return "VARCHAR(14)"
        if fmt == "ipv6":
            return "VARCHAR(39)"
        if fmt == "date-time":
            return "TIMESTAMP"
        mn, mx = attrs.get("minLength"), attrs.get("maxLength")
        if mn is not None and mn == mx:
            return f"CHAR({mx})"
        if mx is not None:
            return f"VARCHAR({mx})"
        if attrs.get("enum"):
            longest = max(len(str(e)) for e in attrs["enum"])
            return f"VARCHAR({longest})"
        return f"VARCHAR({varchar_size})"
    if t == "integer":
        mn, mx = attrs.get("minimum"), attrs.get("maximum")
        if mn is not None and mx is not None:
            if mn >= -INT16_MAX - 1 and mx <= INT16_MAX:
                return "SMALLINT"
            if mn >= -INT32_MAX - 1 and mx <= INT32_MAX:
                return "INT"
        return "BIGINT"
    if t == "number":
        return "DOUBLE PRECISION"
    if t == "boolean":
        return "BOOLEAN"
    if t in ("object", "array"):
        return f"VARCHAR({varchar_size})"
    return f"VARCHAR({varchar_size})"


def _nullable(attrs: dict) -> bool:
    types = attrs.get("type")
    tlist = types if isinstance(types, list) else [types]
    return "null" in tlist


def table_ddl(schema: dict, table_name: str, db_schema: Optional[str] = "atomic",
              varchar_size: int = 4096, raw: bool = False) -> str:
    cols = flatten_schema(schema)
    lines = []
    for path, attrs in cols:
        col = snakify(path)
        typ = column_type(attrs, varchar_size)
        null = "" if _nullable(attrs) else " NOT NULL"
        lines.append(f'    "{col}" {typ}{null}')
    qualified = f"{db_schema}.{table_name}" if db_schema else table_name
    body = ",\n".join(lines)
    parts = []
    if db_schema:
        parts.append(f"CREATE SCHEMA IF NOT EXISTS {db_schema};\n")
    parts.append(f"CREATE TABLE IF NOT EXISTS {qualified} (\n{body}\n);")
    return "\n".join(parts)


def jsonpaths(schema: dict) -> str:
    cols = flatten_schema(schema)
    paths = [f"$.{path}" for path, _ in cols]
    return json.dumps({"jsonpaths": paths}, indent=4)


# --- migrations -------------------------------------------------------------


def parse_schemaver(v: str) -> Tuple[int, int, int]:
    m = re.match(r"^(\d+)-(\d+)-(\d+)$", v)
    if not m:
        raise ValueError(f"bad SchemaVer: {v}")
    return tuple(int(x) for x in m.groups())  # type: ignore[return-value]


def added_columns(old: dict, new: dict) -> List[Tuple[str, dict]]:
    """Properties present in ``new`` but not ``old`` (order preserved,
    appended at the end — Migrations.scala:117-122, DdlCommand.scala:328-336)."""
    old_paths = {p for p, _ in flatten_schema(old)}
    return [(p, a) for p, a in flatten_schema(new) if p not in old_paths]


def migration_ddl(old: dict, new: dict, table_name: str,
                  old_ver: str, new_ver: str,
                  db_schema: Optional[str] = "atomic",
                  varchar_size: int = 4096) -> str:
    """ALTER TABLE transaction for a version step
    (RedshiftMigration.scala:77-109)."""
    adds = added_columns(old, new)
    qualified = f"{db_schema}.{table_name}" if db_schema else table_name
    alters = "\n".join(
        f'  ALTER TABLE {qualified}\n    ADD COLUMN "{snakify(p)}" {column_type(a, varchar_size)};'
        for p, a in adds
    )
    return (
        f"-- WARNING: only apply this file to your database if the table"
        f" {qualified} is at version {old_ver}\n\n"
        "BEGIN TRANSACTION;\n\n"
        f"{alters}\n\n"
        f"  COMMENT ON TABLE {qualified} IS '{new_ver}';\n\n"
        "END TRANSACTION;"
    )


def build_migrations(versions: Dict[str, dict], table_name: str,
                     db_schema: Optional[str] = "atomic",
                     varchar_size: int = 4096) -> Dict[Tuple[str, str], str]:
    """Every version → every forward target (Migrations.scala:157-181,
    225-234). Returns {(from, to): migration sql}."""
    ordered = sorted(versions, key=parse_schemaver)
    out: Dict[Tuple[str, str], str] = {}
    for i, src in enumerate(ordered):
        for dst in ordered[i + 1 :]:
            out[(src, dst)] = migration_ddl(
                versions[src], versions[dst], table_name, src, dst,
                db_schema, varchar_size,
            )
    return out


# --- CLI entry --------------------------------------------------------------


def _table_name_from_self(desc: dict) -> str:
    ver = desc.get("version", "1-0-0")
    model = ver.split("-")[0]
    return f"{snakify(desc.get('vendor', 'vendor'))}_{snakify(desc.get('name', 'event'))}_{model}"


def process_ddl(args) -> int:
    """CLI `ddl` command: read JSON Schema file(s), write sql/ + jsonpaths/
    trees (DdlCommand.scala:251-268)."""
    inputs: List[str] = []
    if os.path.isdir(args.input):
        for root, _d, names in os.walk(args.input):
            inputs.extend(os.path.join(root, n) for n in sorted(names) if n.endswith(".json"))
    else:
        inputs = [args.input]

    by_table: Dict[str, Dict[str, dict]] = {}
    raw_tables: List[Tuple[str, dict]] = []
    for path in inputs:
        with open(path) as f:
            schema = json.load(f)
        self_desc = schema.get("self")
        if self_desc and not args.raw_mode:
            data = {k: v for k, v in schema.items() if k not in ("self", "$schema", "description")}
            tname = _table_name_from_self(self_desc)
            by_table.setdefault(tname, {})[self_desc.get("version", "1-0-0")] = data
        else:
            name = snakify(os.path.splitext(os.path.basename(path))[0])
            raw_tables.append((name, schema))

    sql_dir = os.path.join(args.output, "sql")
    jp_dir = os.path.join(args.output, "jsonpaths")
    os.makedirs(sql_dir, exist_ok=True)

    def write(path: str, content: str):
        if os.path.exists(path) and not args.force:
            with open(path) as f:
                if f.read() != content:
                    print(f"skipping {path}: exists with different content (use --force)")
                    return
        with open(path, "w") as f:
            f.write(content + "\n")

    for tname, versions in by_table.items():
        latest = max(versions, key=parse_schemaver)
        write(os.path.join(sql_dir, f"{tname}.sql"),
              table_ddl(versions[latest], tname, varchar_size=args.varchar_size))
        for (src, dst), sql in build_migrations(versions, tname,
                                                varchar_size=args.varchar_size).items():
            write(os.path.join(sql_dir, f"{tname}_{src}_to_{dst}.sql"), sql)
        if args.with_json_paths:
            os.makedirs(jp_dir, exist_ok=True)
            write(os.path.join(jp_dir, f"{tname}.json"), jsonpaths(versions[latest]))
    for name, schema in raw_tables:
        write(os.path.join(sql_dir, f"{name}.sql"),
              table_ddl(schema, name, db_schema=None, varchar_size=args.varchar_size, raw=True))
        if args.with_json_paths:
            os.makedirs(jp_dir, exist_ok=True)
            write(os.path.join(jp_dir, f"{name}.json"), jsonpaths(schema))
    return 0
