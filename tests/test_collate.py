"""Property tests for the collation codec (SURVEY.md §5.2 item 2).

The codec is the engine's highest-risk component: every range query,
sort, group and group_level in the engine rides on
``lexicographic(enc(a), enc(b)) == collate(a, b)``.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from mapreduce_spark.collate import (
    collate,
    encode_array_prefix,
    normalize_key,
    parse_indexable_string,
    to_indexable_string,
)

# --- strategies -------------------------------------------------------------

scalars = st.one_of(
    st.none(),
    st.booleans(),
    st.floats(allow_nan=True, allow_infinity=True),  # normalized to null
    st.integers(min_value=-(2**53), max_value=2**53),
    st.text(max_size=12),
    # force coverage of the UTF-16 order edge: astral + private-use + bounds
    st.text(
        alphabet=st.sampled_from(
            ["a", "\x00", "\x01", "\x02", "퟾", "퟿", "",
             "￿", "😀", "\U0010ffff", "\U00010000"]
        ),
        max_size=6,
    ),
)

json_keys = st.recursive(
    scalars,
    lambda inner: st.one_of(
        st.lists(inner, max_size=4),
        st.dictionaries(st.text(max_size=6), inner, max_size=3),
    ),
    max_leaves=8,
)


# --- properties -------------------------------------------------------------

@settings(max_examples=500)
@given(json_keys)
def test_roundtrip(k):
    n = normalize_key(k)
    assert parse_indexable_string(to_indexable_string(k)) == n


@settings(max_examples=500)
@given(json_keys, json_keys)
def test_encode_order_equals_collate(a, b):
    c = collate(a, b)
    ea, eb = to_indexable_string(a), to_indexable_string(b)
    if c < 0:
        assert ea < eb
    elif c > 0:
        assert ea > eb
    else:
        assert ea == eb


@settings(max_examples=300)
@given(json_keys, json_keys, json_keys)
def test_collate_total_order(a, b, c):
    # antisymmetry + transitivity spot-check
    assert collate(a, b) == -collate(b, a)
    if collate(a, b) <= 0 and collate(b, c) <= 0:
        assert collate(a, c) <= 0


@settings(max_examples=200)
@given(st.lists(st.one_of(st.none(), st.booleans(), st.floats(allow_nan=False,
       allow_infinity=False), st.text(max_size=8)), min_size=1, max_size=5))
def test_array_prefix_compositional(arr):
    # enc(arr[:n]) without terminator is a string prefix of enc(arr)
    full = to_indexable_string(arr)
    for n in range(len(arr) + 1):
        assert full.startswith(encode_array_prefix(arr[:n]))


def test_cross_type_ladder():
    ladder = [None, False, True, -1e308, -1.5, 0.0,
              3.0, 1e308, "", "a", "aa", "b", [], [None], ["a"], ["a", "b"],
              {}, {"a": 1.0}]
    enc = [to_indexable_string(k) for k in ladder]
    assert enc == sorted(enc)
    for i in range(len(ladder) - 1):
        assert collate(ladder[i], ladder[i + 1]) < 0


def test_normalization_rules():
    assert normalize_key(float("nan")) is None
    assert normalize_key(float("inf")) is None
    assert normalize_key(float("-inf")) is None
    assert normalize_key(-0.0) == 0.0
    assert str(normalize_key(-0.0)) == "0.0"
    assert normalize_key([1, float("nan"), "x"]) == [1.0, None, "x"]
    import datetime
    assert normalize_key(datetime.datetime(2024, 1, 2, 3, 4, 5)) == \
        "2024-01-02T03:04:05"
    assert collate(1, 1.0) == 0
    assert to_indexable_string(1) == to_indexable_string(1.0)


def test_utf16_code_unit_string_order():
    # PouchDB deviation: UTF-16 code-unit order. U+E000 sorts AFTER U+10000
    # (whose first UTF-16 unit is a 0xD800-range surrogate).
    assert collate("\U00010000", "") < 0
    assert to_indexable_string("\U00010000") < to_indexable_string("")
    assert collate("퟿", "\U00010000") < 0
    assert collate("￿", "\U00010000") > 0
    # plain code-point order would disagree on all three
    assert "\U00010000" > ""


def test_number_ordering_extremes():
    nums = [-1.7976931348623157e308, -1e10, -2.5, -2.2250738585072014e-308,
            -5e-324, 0.0, 5e-324, 2.2250738585072014e-308, 1.0, 1.5,
            2.0**53, 1.7976931348623157e308]
    enc = [to_indexable_string(n) for n in nums]
    assert enc == sorted(enc)
    for n in nums:
        assert parse_indexable_string(to_indexable_string(n)) == n


def test_object_entry_order_significant():
    # objects compare entries in insertion order (upstream objectCollate)
    assert collate({"a": 1, "b": 2}, {"b": 2, "a": 1}) < 0  # 'a' < 'b'
    assert collate({"a": 1}, {"a": 1, "b": 2}) < 0  # prefix smaller


def test_unsupported_type_raises():
    with pytest.raises(TypeError):
        to_indexable_string({1, 2})
