"""JS design-doc compilation (F1): the common-subset compiler must
produce MapSpecs equal in behavior to hand-written ones, and reject
out-of-subset constructs with a clear error."""

import pytest

from mapreduce_spark.engine import Engine
from mapreduce_spark.functions.jscompile import (
    JSCompileError,
    compile_js_map,
    looks_like_js,
)
from mapreduce_spark.operators.mapphase import MapSpec


@pytest.fixture(scope="module")
def orders_schema(spark, sf_dir):
    from mapreduce_spark.sources.docs import load_table

    return load_table(spark, sf_dir, "orders").schema


def test_simple_field_emit(orders_schema):
    spec = compile_js_map(
        "function(doc) { emit(doc.o_orderpriority, doc.o_totalprice); }",
        "orders", orders_schema,
    )
    assert spec == MapSpec("orders", ("str", "o_orderpriority"),
                           ("num", "o_totalprice"))


def test_array_key_guard_and_literals(orders_schema):
    spec = compile_js_map(
        """function(doc) {
             if (doc.o_orderstatus === 'O' && doc.o_totalprice > 10) {
               emit([doc.o_orderpriority, 'x', 2, null], 1);
             }
           }""",
        "orders", orders_schema,
    )
    assert spec.key == [("str", "o_orderpriority"), ("str", "'x'"),
                        ("num", "2.0"), ("null", "null")]
    assert spec.value == ("num", "1.0")
    assert "o_orderstatus = 'O'" in spec.where
    assert "o_totalprice > 10" in spec.where


def test_multi_emit_and_doc_id_and_link(orders_schema):
    specs = compile_js_map(
        """function(doc) {
             emit(doc._id, null);
             emit(doc.o_orderkey, {_id: doc.o_orderpriority});
           }""",
        "orders", orders_schema,
    )
    assert isinstance(specs, list) and len(specs) == 2
    assert specs[0].key == (
        "str", "format_string('orders:%09d', o_orderkey)"
    )
    assert specs[1].value == ("link", "o_orderpriority")


def test_timestamp_fields_compile_to_iso(orders_schema):
    spec = compile_js_map(
        """function(doc) {
             if (doc.o_orderdate >= '1995-01-01') {
               emit(doc.o_orderdate, null);
             }
           }""",
        "orders", orders_schema,
    )
    assert spec.key == ("iso", "o_orderdate")
    assert "date_format(o_orderdate" in spec.where


@pytest.mark.parametrize(
    "src, hint",
    [
        ("function(doc) { for (var i;;) emit(1, 1); }", "for"),
        ("function(doc) { var x = 1; emit(x, 1); }", "var"),
        ("function(doc) { emit(doc.a.b, 1); }", "nested"),
        ("function(doc) { if (doc.o_orderkey) emit(1,1); else emit(2,1); }",
         "else"),
        ("function(doc) { emit(doc.o_orderkey + 1, 1); }", "+"),
        ("function(doc) { }", "no emit"),
        ("function(doc) { emit(doc.nope, 1); }", "does not exist"),
    ],
)
def test_unsupported_constructs_raise(orders_schema, src, hint):
    with pytest.raises(JSCompileError):
        compile_js_map(src, "orders", orders_schema)


def test_looks_like_js_discriminates():
    assert looks_like_js(("orders", "function(doc) { emit(1,1); }"))
    assert not looks_like_js(("orders", lambda d, e: None))
    assert not looks_like_js(MapSpec("orders", ("num", "o_orderkey")))
    assert not looks_like_js("orders/view")


def test_js_view_end_to_end_matches_mapspec(spark, sf_dir, tmp_path):
    """The compiled JS view and the equivalent hand-written MapSpec
    view return identical reduced results through the engine."""
    eng = Engine(spark, sf_dir, str(tmp_path))
    js = {
        "map": (
            "orders",
            """function(doc) {
                 if (doc.o_orderstatus !== 'O') {
                   emit(doc.o_orderpriority, doc.o_totalprice);
                 }
               }""",
        ),
        "reduce": "_sum",
    }
    hand = {
        "map": MapSpec("orders", ("str", "o_orderpriority"),
                       ("num", "o_totalprice"),
                       where="(NOT (o_orderstatus = 'O'))"),
        "reduce": "_sum",
    }
    want = {
        (r["key"], round(r["value"], 6))
        for r in eng.query(hand, group=True).rows()
    }
    got = {
        (r["key"], round(r["value"], 6))
        for r in eng.query(js, group=True).rows()
    }
    assert got == want and want


def test_js_view_persists_and_truthiness_guard(spark, sf_dir, tmp_path):
    """JS views register via put_design like any other; a truthiness
    guard on a string field compiles to NOT NULL/non-empty."""
    eng = Engine(spark, sf_dir, str(tmp_path))
    eng.put_design(
        "d",
        {"v": {"map": ("nation",
                       "function(doc) { if (doc.n_name) "
                       "emit(doc.n_name, doc.n_regionkey); }")}},
    )
    eng.update_view("d/v")
    rows = eng.query("d/v", stale="ok").rows()
    n = eng.spark.read.parquet(f"{sf_dir}/nation.parquet").count()
    assert len(rows) == n
    assert all(isinstance(r["key"], str) and r["key"] for r in rows)
