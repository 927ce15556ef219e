"""Vectorized Spark-side encoders must agree byte-for-byte with the
property-tested pure-Python codec (caught live: numpy object-array `+`
silently drops '\\x00' terminators)."""

import math

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from mapreduce_spark.collate import to_indexable_string
from mapreduce_spark.functions.encode import (
    enc_num_series,
    enc_str_series,
)


@settings(max_examples=200)
@given(st.lists(st.one_of(st.none(), st.floats(allow_nan=False,
       allow_infinity=False)), min_size=1, max_size=20))
def test_num_encoder_parity(xs):
    got = enc_num_series(pd.Series(xs, dtype="float64")).tolist()
    exp = ["1" if x is None else to_indexable_string(x) for x in xs]
    assert got == exp


@settings(max_examples=200)
@given(st.lists(st.one_of(st.none(), st.text(max_size=10), st.text(
    alphabet=st.sampled_from(["a", "\x00", "\x01", "\x02", "\ud7fe",
                              "\ud7ff", "\ue000", "\uffff", "\U0001f600",
                              "\U0010ffff"]), max_size=5)),
    min_size=1, max_size=20))
def test_str_encoder_parity(xs):
    got = enc_str_series(pd.Series(xs, dtype=object)).tolist()
    exp = ["1" if x is None else to_indexable_string(x) for x in xs]
    assert got == exp


def test_nul_terminator_survives():
    out = enc_str_series(pd.Series(["x"])).tolist()
    assert out == ["4x\x00"]
