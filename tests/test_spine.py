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
