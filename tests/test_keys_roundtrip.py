"""Duplicate-key detection (DuplicatedKeysSpec.scala:22-75, FIXTURES.md §B6)
and the hypothesis round-trip contract (RandomValidSpec.scala:35-69, §B7)."""

import json

from hypothesis import given, settings
from hypothesis import strategies as st

from schema_guru_ray.context import SchemaContext
from schema_guru_ray.schema.finalize import merge_and_transform, validate_instance
from schema_guru_ray.schema.keys import duplicate_key_pairs, extract_keys, levenshtein
from schema_guru_ray.schema.states import ZERO, derive_instance, merge

CTX = SchemaContext(enum_cardinality=0)


class TestDuplicateKeys:
    def test_case_variants_flagged(self):
        pairs = duplicate_key_pairs({"differentCase", "different_case"})
        assert pairs == {("differentCase", "different_case")}

    def test_one_typo_flagged(self):
        assert duplicate_key_pairs({"oneTypo", "oneType"}) == {("oneType", "oneTypo")}

    def test_two_typos_not_flagged(self):
        assert duplicate_key_pairs({"twoTypos", "twoTyped"}) == set()

    def test_short_keys_skipped(self):
        assert duplicate_key_pairs({"abc", "abd"}) == set()

    def test_levenshtein(self):
        assert levenshtein("kitten", "sitting") == 3
        assert levenshtein("", "abc") == 3
        assert levenshtein("same", "same") == 0

    def test_extract_keys_recursive(self):
        # JsonObjectAnnotatorSpec.scala:33-64 — deep recursion over objects,
        # arrays and products
        st_ = derive_instance(
            {"top": {"mid": [{"leaf": 1}]}, "other": 2}, CTX
        )
        st_ = merge(st_, derive_instance({"top": "now a string"}, CTX), CTX)
        assert extract_keys(st_) == {"top", "mid", "leaf", "other"}


# --- property-based round-trip (RandomValidSpec port) -----------------------

scalars = st.one_of(
    st.text(max_size=20),
    st.integers(min_value=-(2**62), max_value=2**62),
    st.booleans(),
    st.none(),
    st.floats(allow_nan=False, allow_infinity=False, width=32),
    st.uuids().map(str),
    st.datetimes().map(lambda d: d.isoformat()),
)

json_values = st.recursive(
    scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(st.text(min_size=1, max_size=10), inner, max_size=4),
    ),
    max_leaves=12,
)

instances = st.one_of(
    st.dictionaries(st.text(min_size=1, max_size=10), json_values, max_size=5),
    st.lists(json_values, max_size=5),
)


@given(instances)
@settings(max_examples=150, deadline=None)
def test_derived_schema_validates_own_instance(value):
    # RandomValidSpec.scala:45-50
    state = derive_instance(value, CTX)
    schema = merge_and_transform(state, CTX)
    assert validate_instance(value, schema) == []


@given(st.lists(instances, min_size=1, max_size=6))
@settings(max_examples=60, deadline=None)
def test_merged_schema_validates_all_instances(values):
    acc = ZERO
    for v in values:
        acc = merge(acc, derive_instance(v, CTX), CTX)
    schema = merge_and_transform(acc, CTX)
    for v in values:
        assert validate_instance(v, schema) == []


@given(instances)
@settings(max_examples=50, deadline=None)
def test_everything_validates_against_empty_schema(value):
    # RandomValidSpec.scala:52-55: any JSON validates against {}
    assert validate_instance(value, {}) == []


def test_mismatched_type_fails():
    # RandomValidSpec.scala:57-60
    schema = merge_and_transform(derive_instance({"k": 1}, CTX), CTX)
    assert validate_instance({"k": "str"}, schema) != []
    assert validate_instance({"other": 1}, schema) != []


ENUM_CTX = SchemaContext(enum_cardinality=4)


@given(st.lists(instances, min_size=1, max_size=6))
@settings(max_examples=60, deadline=None)
def test_merged_schema_validates_all_instances_with_enums(values):
    """Round-trip with ENUMS ENABLED — the regime where the null+product
    enum hole hid (enum_cardinality=0 above never renders enums)."""
    acc = ZERO
    for v in values:
        acc = merge(acc, derive_instance(v, ENUM_CTX), ENUM_CTX)
    schema = merge_and_transform(acc, ENUM_CTX)
    for v in values:
        assert validate_instance(v, schema) == [], (v, schema)
