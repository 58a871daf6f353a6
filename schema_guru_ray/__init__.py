"""schema_guru_ray — a Ray-Data-native schema-inference + constraint-validation engine.

Re-expresses the capabilities of snowplow-archive/schema-guru (reference at
/root/reference, Scala) as an idiomatic Ray Data pipeline library:

* micro-schema derivation per JSON value (reference SchemaGenerator.scala:54-150)
  becomes a per-batch partial aggregation inside ``map_batches`` over Arrow;
* the commutative monoid merge (reference Helpers.scala:209-224) becomes
  ``groupby().map_groups`` over tiny serialized states / a driver fold of
  per-batch states;
* finalization transforms (numeric-range encasing, maxLength correction, enum
  substitution, reference SchemaGuru.scala:73-79) run on the merged state;
* constraint validation over large Arrow tables (column stats, HLL/KLL
  sketches, referential checks, distribution drift, stateful audio decode)
  extends the same derive-then-merge shape to the 100 TB scale path.

No code is copied from the reference; semantics are re-implemented from its
observable behavior and test suite (see SURVEY.md for file:line citations).
"""

from schema_guru_ray.context import SchemaContext
from schema_guru_ray.schema.states import (
    ArrayState,
    BoolState,
    IntState,
    NullState,
    NumState,
    ObjectState,
    ProductState,
    StringState,
    ZeroState,
    derive,
    merge,
)
from schema_guru_ray.schema.finalize import finalize, to_json_schema

__all__ = [
    "SchemaContext",
    "derive",
    "merge",
    "finalize",
    "to_json_schema",
    "StringState",
    "IntState",
    "NumState",
    "BoolState",
    "NullState",
    "ObjectState",
    "ArrayState",
    "ProductState",
    "ZeroState",
]
