"""Enum cardinality + predefined-set conformance vectors
(src/test/scala/EnumSpec.scala:36-83; Helpers.scala:94-107;
SchemaWithEnum.scala:57-70). FIXTURES.md §B2."""

from schema_guru_ray.context import SchemaContext
from schema_guru_ray.schema.finalize import merge_and_transform
from schema_guru_ray.schema.predefined import get_enum_sets
from schema_guru_ray.schema.states import ZERO, derive_value, merge


def fold(vals, ctx):
    acc = ZERO
    for v in vals:
        acc = merge(acc, derive_value(v, ctx), ctx)
    return acc


def test_cardinality_zero_no_enum():
    # EnumSpec.scala:56-61
    ctx = SchemaContext(enum_cardinality=0)
    s = merge_and_transform(fold(["AB", "AB"], ctx), ctx)
    assert "enum" not in s


def test_same_value_dedup():
    # EnumSpec.scala:63-68
    ctx = SchemaContext(enum_cardinality=5)
    s = merge_and_transform(fold(["AB", "AB"], ctx), ctx)
    assert s["enum"] == ["AB"]


def test_three_values_within_cap():
    # EnumSpec.scala:70-75 (set comparison — order caveat at EnumSpec.scala:74)
    ctx = SchemaContext(enum_cardinality=5)
    s = merge_and_transform(fold(["AB", "AB", "AC", "AD"], ctx), ctx)
    assert set(s["enum"]) == {"AB", "AC", "AD"}


def test_three_values_beyond_cap_eliminated():
    # EnumSpec.scala:77-82
    ctx = SchemaContext(enum_cardinality=2)
    s = merge_and_transform(fold(["AB", "AB", "AC", "AD"], ctx), ctx)
    assert "enum" not in s


def test_predefined_subset_survives_cap_and_substitutes():
    # Helpers.scala:94-107 + SchemaWithEnum.scala:64-66: merged enum that is a
    # subset of a predefined set survives the cap and becomes the FULL set
    ctx = SchemaContext(enum_cardinality=2, enum_sets=get_enum_sets("iso_4217"))
    s = merge_and_transform(fold(["USD", "EUR", "GBP", "JPY"], ctx), ctx)
    iso = get_enum_sets("iso_4217")[0]
    assert set(s["enum"]) == set(iso.values)


def test_non_subset_beyond_cap_eliminated_even_with_sets():
    ctx = SchemaContext(enum_cardinality=2, enum_sets=get_enum_sets("iso_4217"))
    s = merge_and_transform(fold(["USD", "EUR", "NOT_A_CCY"], ctx), ctx)
    assert "enum" not in s


def test_enum_tombstone_is_absorbing():
    # SchemaWithEnum.scala:33-34: None eliminates all following merges
    ctx = SchemaContext(enum_cardinality=1)
    st = fold(["A", "B"], ctx)  # exceeds keep threshold → tombstone
    assert st.enum is None
    st2 = merge(st, derive_value("A", ctx), ctx)
    assert st2.enum is None


def test_integer_enums():
    ctx = SchemaContext(enum_cardinality=3)
    s = merge_and_transform(fold([1, 2, 1], ctx), ctx)
    assert set(s["enum"]) == {1, 2}


def test_order_independent_cap_crossing():
    """Two partials each at the cap merge to beyond-cap → eliminated,
    regardless of grouping (SURVEY.md §7.4 watch list)."""
    ctx = SchemaContext(enum_cardinality=2)
    left = fold(["A", "B"], ctx)
    right = fold(["C", "D"], ctx)
    s = merge_and_transform(merge(left, right, ctx), ctx)
    assert "enum" not in s
