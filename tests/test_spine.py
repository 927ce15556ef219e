"""End-to-end spine test (SURVEY.md §7.2 minimum slice):

lineitem → emit([l_returnflag, l_linestatus], l_quantity) / _sum →
query(group_level=2) → values match the DuckDB oracle.

Exercises: collation encoding, structured map build, grouping, a
native-agg reduce, ordering, result shaping — the engine's whole spine.
"""

import json

import pytest

from mapreduce_spark.engine import Engine
from mapreduce_spark.operators.mapphase import MapSpec

V_FLAG_STATUS_QTY = MapSpec(
    table="lineitem",
    key=[("str", "l_returnflag"), ("str", "l_linestatus")],
    value=("num", "l_quantity"),
)


def test_spine_q2(engine, duck):
    res = engine.query(
        {"map": V_FLAG_STATUS_QTY, "reduce": "_sum"}, group_level=2
    )
    got = {
        (tuple(json.loads(r["key_json"]))): r["value_num"]
        for r in res.df.collect()
    }
    exp = {
        (rf, ls): sv
        for rf, ls, sv in duck.execute(
            "SELECT l_returnflag, l_linestatus, "
            "sum(CAST(l_quantity AS DOUBLE)) FROM lineitem "
            "GROUP BY 1, 2 ORDER BY 1, 2"
        ).fetchall()
    }
    assert set(got) == set(exp)
    for k, v in exp.items():
        assert got[k] == pytest.approx(v, rel=1e-12)


def test_spine_map_range(engine, duck):
    spec = MapSpec(
        table="orders",
        key=("iso", "o_orderdate"),
        value=("num", "o_totalprice"),
    )
    res = engine.query(
        spec, startkey="1995-01-01", endkey="1995-12-31"
    )
    rows = res.df.collect()
    exp = duck.execute(
        "SELECT strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') AS k "
        "FROM orders WHERE strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S') "
        ">= '1995-01-01' AND strftime(o_orderdate, '%Y-%m-%dT%H:%M:%S')"
        " <= '1995-12-31' ORDER BY 1"
    ).fetchall()
    assert len(rows) == len(exp)
    got_keys = [json.loads(r["key_json"]) for r in rows]
    assert got_keys == [e[0] for e in exp]
    assert got_keys == sorted(got_keys)


def test_tier_witnesses(spark, sf_dir, engine):
    """VERDICT r11 #6: every tagged inventory row's tier witness is
    asserted mechanically — a compile-tier widening that silently
    compiles a previously-interpreted source (round 11's var-alias
    incident) must fail HERE, not be caught by hand.  The raw-source
    (q31) witnesses — interpreter, variant-compiled, shredded-layout —
    assert inside _raw_source_env itself."""
    from mapreduce_spark.inventory import (
        REDUCE_WITNESSES,
        TIER_WITNESSES,
        _raw_source_env,
        assert_tier_witness,
    )

    for view in (*TIER_WITNESSES, *REDUCE_WITNESSES):
        assert_tier_witness(engine, view)
    # building the raw env runs its three witness asserts (cached per
    # session+sf_dir, so the contract run shares the work)
    _raw_source_env(spark, sf_dir)


def test_tier_witness_detects_theft(engine):
    """The checker itself must catch a stolen witness: a trivially
    compilable source under q35's 'interpreted' claim fails."""
    from mapreduce_spark.inventory import (
        VIEW_DEFS,
        assert_tier_witness,
    )

    stolen = dict(VIEW_DEFS["js_interp"])
    stolen["map"] = (
        "events", "function(doc){ emit(doc.event_type, 1); }"
    )
    orig = VIEW_DEFS["js_interp"]
    VIEW_DEFS["js_interp"] = stolen
    try:
        with pytest.raises(AssertionError, match="witness lost"):
            assert_tier_witness(engine, "js_interp")
    finally:
        VIEW_DEFS["js_interp"] = orig
