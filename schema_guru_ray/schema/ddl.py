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


# attrs that remain meaningful for each primitive type when a product
# column is split into one column per type (README.md:266 "Can split
# product types"; schema-ddl 0.3.x splitProductTypes semantics)
_SPLIT_ATTRS = {
    "string": ("format", "pattern", "minLength", "maxLength", "enum"),
    "integer": ("minimum", "maximum", "enum"),
    "number": ("minimum", "maximum", "enum"),
    "boolean": (),
    "object": ("properties", "additionalProperties"),
    "array": ("items",),
}


def split_product_types(cols: List[Tuple[str, dict]]) -> List[Tuple[str, dict]]:
    """Product-typed properties → one column per member type
    (``prop_string``, ``prop_integer``, …), each carrying only the attrs
    meaningful for that type. Split columns are always nullable: when the
    value is one of the other member types, this column is NULL."""
    out: List[Tuple[str, dict]] = []
    for path, attrs in cols:
        types = attrs.get("type")
        tlist = [t for t in (types if isinstance(types, list) else [types]) if t]
        non_null = [t for t in tlist if t != "null"]
        if len(non_null) <= 1:
            out.append((path, attrs))
            continue
        for t in non_null:
            narrowed = {"type": [t, "null"]}
            for k in _SPLIT_ATTRS.get(t, ()):
                if k in attrs:
                    narrowed[k] = attrs[k]
            out.append((f"{path}.{t}", narrowed))
    return out


def flatten_schema(schema: dict, prefix: str = "",
                   split_product: bool = False) -> List[Tuple[str, dict]]:
    """JSON Schema object → ordered flat list of (dotted.path, attrs)
    (the reference's PropertyList, package.scala:70). Order is the schema's
    own property INSERTION order — preserved through json round-trips by
    Python dicts, matching the reference's ListMap (a user's existing
    column order survives). Arrays and objects without properties
    terminate as opaque columns."""
    out: List[Tuple[str, dict]] = []
    props = schema.get("properties")
    if props is None:
        return [(prefix or "root", schema)]
    for key, sub in props.items():
        path = f"{prefix}.{key}" if prefix else key
        types = sub.get("type")
        tlist = types if isinstance(types, list) else [types]
        if "object" in tlist and sub.get("properties"):
            out.extend(flatten_schema(sub, path))
        else:
            out.append((path, sub))
    return split_product_types(out) if split_product else out


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
        # "Number with multiplyOf 0.01 becomes DECIMAL" (README.md:267,
        # via the schema-ddl backend): fixed-point money-style columns
        if attrs.get("multipleOf") == 0.01:
            return "DECIMAL(36,2)"
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


DDL_HEADER = (
    "-- AUTO-GENERATED BY schema-guru-ray DO NOT EDIT\n"
    "-- Generator: schema-guru-ray ddl command\n"
)


def table_ddl(schema: dict, table_name: str, db_schema: Optional[str] = "atomic",
              varchar_size: int = 4096, raw: bool = False,
              split_product: bool = False) -> str:
    cols = flatten_schema(schema, split_product=split_product)
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


def schema_diff(source: dict, successive: List[dict]) -> Dict[str, object]:
    """Full diff from ``source`` to the LAST schema in ``successive``,
    walked through every intermediate version (Migrations.scala:101-146
    ``diffMaps``):

    * ``added``   — ordered (path, attrs) list; order of FIRST appearance
      across the successive schemas (``getAddedKeys``, :117-122), attrs
      from the final target; a property added then modified later appears
      here, not in modified;
    * ``modified`` — (path, attrs) pairs present in both source and target
      whose attrs changed (``getModifiedProperties``, :131-141);
    * ``removed`` — paths present in source but gone from the target.
    """
    src_cols = dict(flatten_schema(source))
    chains = [dict(flatten_schema(s)) for s in successive]
    target = chains[-1]

    added_keys: List[str] = []
    prev = set(src_cols)
    for cur in chains:
        for p in cur:
            if p not in prev and p not in added_keys:
                added_keys.append(p)
        prev = set(cur)
    added = [(p, target[p]) for p in added_keys if p in target]
    modified = [
        (p, a) for p, a in target.items()
        if p not in added_keys and p in src_cols and src_cols[p] != a
    ]
    removed = sorted(set(src_cols) - set(target))
    return {"added": added, "modified": modified, "removed": removed}


def added_columns(old: dict, new: dict) -> List[Tuple[str, dict]]:
    """Properties present in ``new`` but not ``old`` (order preserved,
    appended at the end — Migrations.scala:117-122, DdlCommand.scala:328-336)."""
    return schema_diff(old, [new])["added"]  # type: ignore[return-value]


def migration_ddl(old: dict, new: dict, table_name: str,
                  old_ver: str, new_ver: str,
                  db_schema: Optional[str] = "atomic",
                  varchar_size: int = 4096,
                  intermediates: Optional[List[dict]] = None) -> str:
    """ALTER TABLE transaction for a version step
    (RedshiftMigration.scala:77-109). Only added columns are expressible as
    SQL migration (the reference's own rule, RedshiftMigration.scala:86-92);
    modified/removed properties are surfaced as explicit warnings so a
    type-narrowing change no longer produces a silently-empty migration."""
    diff = schema_diff(old, (intermediates or []) + [new])
    qualified = f"{db_schema}.{table_name}" if db_schema else table_name
    if diff["added"]:
        alters = "\n".join(
            f'  ALTER TABLE {qualified}\n    ADD COLUMN "{snakify(p)}" {column_type(a, varchar_size)};'
            for p, a in diff["added"]
        )
    else:
        alters = "   -- NO ADDED COLUMNS CAN BE EXPRESSED IN SQL MIGRATION"
    warnings = []
    for p, _a in diff["modified"]:
        warnings.append(
            f"-- WARNING: property '{p}' changed its definition between"
            f" {old_ver} and {new_ver}; manual column review required"
        )
    for p in diff["removed"]:
        warnings.append(
            f"-- WARNING: property '{p}' was removed in {new_ver};"
            f" the column is NOT dropped automatically"
        )
    warn_block = ("\n".join(warnings) + "\n\n") if warnings else ""
    return (
        f"-- WARNING: only apply this file to your database if the table"
        f" {qualified} is at version {old_ver}\n\n"
        f"{warn_block}"
        "BEGIN TRANSACTION;\n\n"
        f"{alters}\n\n"
        f"  COMMENT ON TABLE {qualified} IS '{new_ver}';\n\n"
        "END TRANSACTION;"
    )


def build_migrations(versions: Dict[str, dict], table_name: str,
                     db_schema: Optional[str] = "atomic",
                     varchar_size: int = 4096) -> Dict[Tuple[str, str], str]:
    """Every version → every forward target (Migrations.scala:157-181,
    225-234), each walked through its intermediate versions so added-column
    ORDER follows first appearance (Migrations.scala:191-198).
    Returns {(from, to): migration sql}."""
    ordered = sorted(versions, key=parse_schemaver)
    out: Dict[Tuple[str, str], str] = {}
    for i, src in enumerate(ordered):
        for j, dst in enumerate(ordered[i + 1 :], start=i + 1):
            out[(src, dst)] = migration_ddl(
                versions[src], versions[dst], table_name, src, dst,
                db_schema, varchar_size,
                intermediates=[versions[v] for v in ordered[i + 1 : j]],
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
    split_product = getattr(args, "split_product", False)
    no_header = getattr(args, "no_header", False)
    if split_product and args.with_json_paths:
        # the reference rejects this combination (Parser.scala:181-182):
        # split columns have no single JSONPath
        print("Options --with-json-paths and --split-product cannot be used together")
        return 1
    header = "" if no_header else DDL_HEADER + "\n"

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
              header + table_ddl(versions[latest], tname, varchar_size=args.varchar_size,
                                 split_product=split_product))
        # migrations are always built over the UNSPLIT property list, even
        # under --split-product — mirroring the reference, whose
        # buildMigration hardcodes splitProduct = false
        # (Migrations.scala:80-81)
        for (src, dst), sql in build_migrations(versions, tname,
                                                varchar_size=args.varchar_size).items():
            write(os.path.join(sql_dir, f"{tname}_{src}_to_{dst}.sql"), sql)
        if args.with_json_paths:
            os.makedirs(jp_dir, exist_ok=True)
            write(os.path.join(jp_dir, f"{tname}.json"), jsonpaths(versions[latest]))
    for name, schema in raw_tables:
        write(os.path.join(sql_dir, f"{name}.sql"),
              header + table_ddl(schema, name, db_schema=None,
                                 varchar_size=args.varchar_size, raw=True,
                                 split_product=split_product))
        if args.with_json_paths:
            os.makedirs(jp_dir, exist_ok=True)
            write(os.path.join(jp_dir, f"{name}.json"), jsonpaths(schema))
    return 0
