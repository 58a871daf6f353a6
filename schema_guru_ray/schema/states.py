"""The schema-state lattice: derive / merge (the commutative monoid core).

Re-implements the reference's nine-node JsonSchema ADT
(``schema/JsonSchema.scala:34-118`` + ``schema/types/*.scala``) as picklable
Python dataclasses with an associative, commutative ``merge`` so partial
states can flow through Ray Data ``map_batches`` + ``groupby().aggregate()``.

Merge semantics (all cited against the reference):

* ``format``/``pattern``: eq-or-None (JsonSchema.scala:160-163).
* ``minLength``/``minimum``: min-or-None; ``maxLength``/``maximum``:
  max-or-None — **None is absorbing** (JsonSchema.scala:134-152).
* enums: set union while ``|set| <= ctx.enum_keep_threshold``, then a None
  tombstone that absorbs all later merges (SchemaWithEnum.scala:57-70).
  Keeping exact sets up to ``max(cardinality, biggest predefined set)`` and
  applying the cap/predefined-substitution in finalize makes the distributed
  merge order-independent (SURVEY.md §7.4) while producing the same final
  schema as the reference's per-merge cap.
* integer ⊔ number → number with int bounds cast to float
  (NumberSchema.scala:49-62; the numeric lattice ``integer ⊑ number``).
* different types → ProductState with one slot per type; number's presence
  absorbs the integer slot (ProductSchema.scala:90-102,139-159). We use the
  symmetric closure of the reference's rule so merge order cannot matter.
* ZeroState is the monoid identity (ZeroSchema.scala:32-34).
"""

from __future__ import annotations

from dataclasses import dataclass, field, replace
from typing import Dict, FrozenSet, Optional, Union

from schema_guru_ray.context import SchemaContext
from schema_guru_ray.schema import formats as fmt

EnumVal = Union[str, int, float, bool]
# None = tombstone (absorbing); frozenset = exact value set so far
EnumState = Optional[FrozenSet[EnumVal]]


def _min_or_none(a, b):
    """None-absorbing min (reference minOrNone, JsonSchema.scala:146-152)."""
    return None if a is None or b is None else min(a, b)


def _max_or_none(a, b):
    return None if a is None or b is None else max(a, b)


def _eq_or_none(a, b):
    return a if a == b else None


def _merge_enums(a: EnumState, b: EnumState, ctx: SchemaContext) -> EnumState:
    """Union with tombstone past the keep threshold (SchemaWithEnum.scala:57-70).
    Either side None → None (the reference's applicative ``|@|``)."""
    if a is None or b is None:
        return None
    u = a | b
    return u if len(u) <= ctx.enum_keep_threshold else None


def _construct_enum(value: EnumVal, ctx: SchemaContext) -> EnumState:
    """constructEnum (SchemaGenerator.scala:231-240): wrap a single value iff
    cardinality > 0 or the value belongs to a predefined set."""
    if ctx.enum_cardinality == 0 and not ctx.enum_sets:
        return None
    if ctx.enum_cardinality > 0 or ctx.in_any_enum_set(value):
        return frozenset((value,))
    return None


# --- node states ------------------------------------------------------------


@dataclass(frozen=True)
class ZeroState:
    """Monoid identity; renders as {} (ZeroSchema.scala:27-38)."""

    type_tag = "zero"


@dataclass(frozen=True)
class NullState:
    type_tag = "null"


@dataclass(frozen=True)
class BoolState:
    type_tag = "boolean"


@dataclass(frozen=True)
class StringState:
    """StringSchema.scala:37-57."""

    format: Optional[str] = None
    pattern: Optional[str] = None
    min_length: Optional[int] = None
    max_length: Optional[int] = None
    enum: EnumState = frozenset()

    type_tag = "string"


@dataclass(frozen=True)
class IntState:
    """IntegerSchema.scala:36-50. Python ints are arbitrary precision, like
    the reference's BigInt."""

    minimum: Optional[int] = None
    maximum: Optional[int] = None
    enum: EnumState = frozenset()

    type_tag = "integer"


@dataclass(frozen=True)
class NumState:
    """NumberSchema.scala:36-62."""

    minimum: Optional[float] = None
    maximum: Optional[float] = None
    enum: EnumState = frozenset()

    type_tag = "number"


@dataclass(frozen=True)
class ObjectState:
    """ObjectSchema.scala:33-46; properties merge key-wise (shared keys merge
    recursively, disjoint keys union)."""

    properties: Dict[str, "State"] = field(default_factory=dict)

    type_tag = "object"

    def __hash__(self):  # dict field; hash by identity is fine (not interned)
        return id(self)


@dataclass(frozen=True)
class ArrayState:
    """ArraySchema.scala:28-36; single-item schema, no tuple validation."""

    items: "State" = field(default_factory=ZeroState)

    type_tag = "array"

    def __hash__(self):
        return id(self)


@dataclass(frozen=True)
class TimestampState:
    """Engine extension (no reference analogue — JSON has no timestamp type;
    Arrow does). Carries min/max as epoch-microseconds; renders as
    ``{"type": "string", "format": "date-time"}`` to stay inside the
    reference's vocabulary."""

    minimum: Optional[int] = None
    maximum: Optional[int] = None

    type_tag = "timestamp"


@dataclass(frozen=True)
class BinaryState:
    """Engine extension for Arrow binary columns (audio/image payloads):
    byte-length bounds only — content checks live in the validation stages."""

    min_length: Optional[int] = None
    max_length: Optional[int] = None

    type_tag = "binary"


# slot order is the canonical rendering order for product types
PRODUCT_SLOTS = (
    "object",
    "array",
    "string",
    "integer",
    "number",
    "boolean",
    "timestamp",
    "binary",
    "null",
)


@dataclass(frozen=True)
class ProductState:
    """ProductSchema.scala:41-102 — the union/sum type; one slot per type."""

    slots: Dict[str, "State"] = field(default_factory=dict)

    type_tag = "product"

    def __hash__(self):
        return id(self)


State = Union[
    ZeroState,
    NullState,
    BoolState,
    StringState,
    IntState,
    NumState,
    ObjectState,
    ArrayState,
    ProductState,
    TimestampState,
    BinaryState,
]

ZERO = ZeroState()
NULL = NullState()
BOOL = BoolState()


# --- merge ------------------------------------------------------------------


def _merge_string(a: StringState, b: StringState, ctx) -> StringState:
    return StringState(
        format=_eq_or_none(a.format, b.format),
        pattern=_eq_or_none(a.pattern, b.pattern),
        min_length=_min_or_none(a.min_length, b.min_length),
        max_length=_max_or_none(a.max_length, b.max_length),
        enum=_merge_enums(a.enum, b.enum, ctx),
    )


def _merge_int(a: IntState, b: IntState, ctx) -> IntState:
    return IntState(
        minimum=_min_or_none(a.minimum, b.minimum),
        maximum=_max_or_none(a.maximum, b.maximum),
        enum=_merge_enums(a.enum, b.enum, ctx),
    )


def _int_to_num(a: IntState) -> NumState:
    return NumState(
        minimum=None if a.minimum is None else float(a.minimum),
        maximum=None if a.maximum is None else float(a.maximum),
        enum=a.enum,
    )


def _merge_num(a: NumState, b: NumState, ctx) -> NumState:
    return NumState(
        minimum=_min_or_none(a.minimum, b.minimum),
        maximum=_max_or_none(a.maximum, b.maximum),
        enum=_merge_enums(a.enum, b.enum, ctx),
    )


def _merge_object(a: ObjectState, b: ObjectState, ctx) -> ObjectState:
    props = dict(a.properties)
    for k, v in b.properties.items():
        props[k] = merge(props[k], v, ctx) if k in props else v
    return ObjectState(props)


def _merge_array(a: ArrayState, b: ArrayState, ctx) -> ArrayState:
    return ArrayState(merge(a.items, b.items, ctx))


def _to_slots(s: State) -> Dict[str, State]:
    """View any non-zero state as product slots."""
    if isinstance(s, ProductState):
        return dict(s.slots)
    return {s.type_tag: s}


def _merge_product(a: State, b: State, ctx) -> ProductState:
    """Slot-wise merge with int→number absorption: if either side contributes
    a number, every integer contribution is promoted into the number slot and
    the integer slot is dropped (symmetric closure of
    ProductSchema.scala:90-102,139-159 — order-independent by construction)."""
    sa, sb = _to_slots(a), _to_slots(b)
    out: Dict[str, State] = {}
    has_number = "number" in sa or "number" in sb
    for tag in PRODUCT_SLOTS:
        x, y = sa.get(tag), sb.get(tag)
        if tag == "integer" and has_number:
            continue  # absorbed into the number slot below
        if tag == "number" and has_number:
            parts = [p for p in (sa.get("number"), sb.get("number"),
                                 sa.get("integer"), sb.get("integer")) if p is not None]
            num = parts[0] if isinstance(parts[0], NumState) else _int_to_num(parts[0])
            for p in parts[1:]:
                num = _merge_num(num, p if isinstance(p, NumState) else _int_to_num(p), ctx)
            out["number"] = num
            continue
        if x is not None and y is not None:
            out[tag] = merge(x, y, ctx)
        elif x is not None:
            out[tag] = x
        elif y is not None:
            out[tag] = y
    return ProductState(out)


def merge(a: State, b: State, ctx: SchemaContext) -> State:
    """The monoid append: mergeSameType orElse mergeWithZero orElse
    mergeToProduct orElse createProduct (JsonSchema.scala:116-118)."""
    if isinstance(a, ZeroState):
        return b
    if isinstance(b, ZeroState):
        return a
    ta, tb = type(a), type(b)
    if ta is tb and ta is not ProductState:
        if ta is StringState:
            return _merge_string(a, b, ctx)
        if ta is IntState:
            return _merge_int(a, b, ctx)
        if ta is NumState:
            return _merge_num(a, b, ctx)
        if ta is ObjectState:
            return _merge_object(a, b, ctx)
        if ta is ArrayState:
            return _merge_array(a, b, ctx)
        if ta is TimestampState:
            return TimestampState(
                _min_or_none(a.minimum, b.minimum), _max_or_none(a.maximum, b.maximum)
            )
        if ta is BinaryState:
            return BinaryState(
                _min_or_none(a.min_length, b.min_length),
                _max_or_none(a.max_length, b.max_length),
            )
        return a  # Bool/Null: no fields
    # integer ⊔ number → number (IntegerSchema.scala:49, NumberSchema.scala:54-61)
    if ta is IntState and tb is NumState:
        return _merge_num(_int_to_num(a), b, ctx)
    if ta is NumState and tb is IntState:
        return _merge_num(a, _int_to_num(b), ctx)
    # anything else: product-land
    return _merge_product(a, b, ctx)


# --- derive -----------------------------------------------------------------


def derive_value(value, ctx: SchemaContext) -> State:
    """Micro-schema for ONE parsed JSON value (jsonToSchema recursion,
    SchemaGenerator.scala:93-148 + Annotations :152-275)."""
    if value is None:
        return NULL
    if isinstance(value, bool):  # must precede int: bool is a subtype of int
        return BOOL
    if isinstance(value, str):
        return StringState(
            format=fmt.suggest_format(value),
            pattern=fmt.suggest_pattern(value, ctx.quantity),
            min_length=len(value) if ctx.derive_length else None,
            max_length=len(value) if ctx.derive_length else None,
            enum=_construct_enum(value, ctx),
        )
    if isinstance(value, int):
        return IntState(minimum=value, maximum=value, enum=_construct_enum(value, ctx))
    if isinstance(value, float):
        return NumState(minimum=value, maximum=value, enum=_construct_enum(value, ctx))
    if isinstance(value, dict):
        return ObjectState({k: derive_value(v, ctx) for k, v in value.items()})
    if isinstance(value, (list, tuple)):
        items: State = ZERO
        for v in value:
            items = merge(items, derive_value(v, ctx), ctx)
        return ArrayState(items)
    raise TypeError(f"unsupported JSON value type: {type(value)!r}")


def derive_instance(value, ctx: SchemaContext) -> State:
    """Top-level derive: only object or array instances are schema-derivable
    (SchemaGenerator.scala:54-59)."""
    if not isinstance(value, (dict, list, tuple)):
        raise ValueError("JSON instance must be an object or array at top level")
    return derive_value(value, ctx)


def derive(values, ctx: SchemaContext) -> State:
    """Derive and fold a collection of parsed JSON instances into one state
    (the per-batch partial-aggregation kernel; reference ``schemas.suml``,
    SchemaGuru.scala:71). Invalid top-level instances raise — callers that
    need error capture use :func:`derive_with_errors`."""
    acc: State = ZERO
    for v in values:
        acc = merge(acc, derive_instance(v, ctx), ctx)
    return acc


def derive_with_errors(values, ctx: SchemaContext):
    """Like :func:`derive` but collects per-instance error strings instead of
    raising (the reference's Validation split, SchemaGuru.scala:46-55)."""
    acc: State = ZERO
    errors = []
    for i, v in enumerate(values):
        try:
            acc = merge(acc, derive_instance(v, ctx), ctx)
        except (ValueError, TypeError) as e:
            errors.append(f"instance {i}: {e}")
    return acc, errors
