"""JS custom-reduce ingestion (SURVEY §2 A4/F1 — upstream compiles the
``reduce`` member of a ddoc too, ``[U #evalFunc/#reduceView]``)."""

import pickle

import pytest

from mapreduce_spark.engine import Engine
from mapreduce_spark.functions.jsreduce import (
    JSReduceError,
    JSReduceFunction,
    compile_js_reduce,
    looks_like_js_reduce,
)
from mapreduce_spark.operators.mapphase import MapSpec

SUM_JS = "function(keys, values) { return sum(values); }"
COUNT_JS = "function(keys, values) { return values.length; }"
GUARDED_COUNT_JS = (
    "function(keys, values, rereduce) {"
    "  if (rereduce) { return sum(values); }"
    "  else { return values.length; }"
    "}"
)
STATS_JS = """
    function (keys, values, rereduce) {
      if (rereduce) {
        var s = 0;
        var c = 0;
        for (var i = 0; i < values.length; i++) {
          s += values[i].sum;
          c += values[i].count;
        }
        return {sum: s, count: c};
      } else {
        return {sum: sum(values), count: values.length};
      }
    }
"""


# ---------------------------------------------------------------------------
# lowering + interpreter units
# ---------------------------------------------------------------------------


def test_builtin_lowering():
    assert compile_js_reduce(SUM_JS) == "_sum"
    assert compile_js_reduce(COUNT_JS) == "_count"
    assert compile_js_reduce(GUARDED_COUNT_JS) == "_count"
    assert compile_js_reduce(
        "function(k, v, r) { return r ? sum(v) : v.length; }"
    ) == "_count"
    # no-block / fallthrough forms
    assert compile_js_reduce(
        "function(k, v, r) { if (r) return sum(v); return v.length; }"
    ) == "_count"


def test_interpreted_rereduce_accumulator():
    # round 6: compile_js_reduce LOWERS this canonical shape to the
    # _sum_count builtin; the interpreter (instantiated directly) must
    # still implement the identical semantics (the lowering property
    # tests depend on this equivalence)
    assert compile_js_reduce(STATS_JS) == "_sum_count"
    f = JSReduceFunction(STATS_JS)
    p1 = f([["a", "d1"], ["a", "d2"]], [3, 5], False)
    p2 = f([["a", "d3"]], [10], False)
    assert p1 == {"sum": 8.0, "count": 2.0}
    assert f(None, [p1, p2], True) == {"sum": 18.0, "count": 3.0}
    # picklable (ships to executors inside reduce_custom closures)
    f2 = pickle.loads(pickle.dumps(f))
    assert f2(None, [p1, p2], True) == {"sum": 18.0, "count": 3.0}


def test_interpreter_js_semantics():
    # arithmetic, ternary, Math, string concat, array methods
    avg = compile_js_reduce(
        "function(k, v, r) { var s = sum(v); return s / v.length; }"
    )
    assert avg(None, [2.0, 4.0, 6.0], False) == 4.0
    mx = compile_js_reduce(
        "function(k, v, r) {"
        "  var m = null;"
        "  for (var i = 0; i < v.length; i++) {"
        "    if (m === null || v[i] > m) m = v[i];"
        "  }"
        "  return m;"
        "}"
    )
    assert mx(None, [3.0, 9.0, 1.0], False) == 9.0
    assert mx(None, [], False) is None
    misc = compile_js_reduce(
        "function(k, v, r) { return Math.max(1, 5, 3) + Math.min(2, 0); }"
    )
    assert misc(None, [], False) == 5.0
    concat = compile_js_reduce(
        "function(k, v, r) { return 'n=' + v.length; }"
    )
    assert concat(None, [1, 2], False) == "n=2"
    # element-wise array sum (CouchDB sum() parity)
    arr = compile_js_reduce(SUM_JS.replace("sum(values)", "sum(values)"))
    assert arr == "_sum"
    f = JSReduceFunction("function(k, v) { return sum(v); }")
    assert f(None, [[1, 2], [3, 4, 5]], False) == [4.0, 6.0, 5.0]


def test_reduce_callback_and_apply_idioms():
    """Round-5 subset widening: values.reduce(cb) sums lower to the
    builtin; Math.max.apply(null, values) and non-sum callbacks run
    interpreted with enclosing-scope capture."""
    assert compile_js_reduce(
        "function(k, v) { return v.reduce(function(a,b){return a+b;}, 0); }"
    ) == "_sum"
    assert compile_js_reduce(
        "function(k, v) { return v.reduce(function(a,b){return a+b;}); }"
    ) == "_sum"
    # round 6: the apply idiom now LOWERS to the JVM _max builtin;
    # the interpreter still executes it identically (property test
    # below), e.g. when embedded in a larger non-lowerable body
    assert compile_js_reduce(
        "function(k, v, r) { return Math.max.apply(null, v); }"
    ) == "_max"
    mx = JSReduceFunction(
        "function(k, v, r) { return Math.max.apply(null, v); }"
    )
    assert mx(None, [3.0, 9.0, 1.0], False) == 9.0
    # rereduce-safe: max of maxes
    assert mx(None, [9.0, 7.5], True) == 9.0
    prod = compile_js_reduce(
        "function(k, v) { return v.reduce(function(a,b){return a*b;}, 1); }"
    )
    assert prod(None, [2.0, 3.0, 4.0], False) == 24.0
    closure = compile_js_reduce(
        "function(k, v) { var t = 10;"
        "  return v.reduce(function(a,b){return a+b+t;}, 0); }"
    )
    assert closure(None, [1.0, 2.0], False) == 23.0
    assert pickle.loads(pickle.dumps(closure))(None, [1.0, 2.0],
                                               False) == 23.0


def test_closure_writeback_and_undefined_pickle():
    """Review round-5 findings: (1) assignment to a captured variable
    inside a callback must update the OUTER binding (JS closure
    semantics, scope chain); (2) the `undefined` literal must survive
    pickling as the same sentinel (compiled reduces ship to
    executors)."""
    acc = compile_js_reduce(
        "function(k, v) { var t = 0;"
        "  v.reduce(function(a,b){ t = t + b; return 0; }, 0);"
        "  return t; }"
    )
    assert acc(None, [1.0, 2.0, 3.0], False) == 6.0
    assert pickle.loads(pickle.dumps(acc))(None, [1.0, 2.0, 3.0],
                                           False) == 6.0
    und = compile_js_reduce(
        "function(k, v) {"
        "  if (v[0] === undefined) { return 'undef'; } return 'def'; }"
    )
    assert und(None, [], False) == "undef"
    assert pickle.loads(pickle.dumps(und))(None, [], False) == "undef"
    assert pickle.loads(pickle.dumps(und))(None, [1.0], False) == "def"


def test_math_nan_semantics():
    """JS Math edge semantics: errors become NaN, never Python
    exceptions that would fail the whole Spark job."""
    import math

    run = lambda src: compile_js_reduce(src)(None, [], False)  # noqa: E731
    # non-finite results cross the JSON boundary as null (round 6:
    # JSON.stringify semantics — NaN/±Infinity stringify to null), so
    # the observable return is None, never a Python exception
    assert run("function(k,v){ return Math.sqrt(0-1); }") is None
    assert run("function(k,v){ return Math.round(0/0); }") is None
    assert run("function(k,v){ return Math.floor(1/0); }") is None
    assert run("function(k,v){ return Math.min(1, 0/0); }") is None
    assert run("function(k,v){ return Math.pow(0-8, 0.5); }") is None
    # finite results keep their value — the nulling is only at the
    # non-finite edge
    assert run("function(k,v){ return Math.pow(2, 10); }") == 1024.0
    # and the interpreter's INTERNAL value is a true NaN (flows
    # through arithmetic as NaN before serialization)
    assert run(
        "function(k,v){ var x = Math.sqrt(0-1);"
        " return (x === x) ? 1 : 2; }"
    ) == 2.0


def test_out_of_subset_raises():
    for src in (
        # round 8 closed the Array long tail (incl. the ES2023
        # toSorted/findLast family); localeCompare stays the loud
        # witness — its ICU order is the documented non-goal
        "function(k, v) { return 'a'.localeCompare('b'); }",
        "function(k, v) { throw 'no'; }",
    ):
        with pytest.raises(JSReduceError):
            fn = compile_js_reduce(src)
            if callable(fn):  # parse may defer to call time
                fn(None, [1], False)


def test_es2023_array_methods():
    """ES2022/23 additions (round 8) — expected values are the real
    JS answers; the to* forms must not mutate their receiver."""
    fn = compile_js_reduce(
        "function(k, v) { var a = v.toSorted(function(x, y)"
        " { return y - x; }); return a[0] * 100 + v[0]; }"
    )
    assert fn(None, [1.0, 3.0, 2.0], False) == 301.0  # max 3, v intact
    fn2 = compile_js_reduce(
        "function(k, v) { return v.findLast(function(x)"
        " { return x < 3; }) * 10 + v.findLastIndex(function(x)"
        " { return x < 3; }); }"
    )
    # [1,2,5]: findLast <3 → 2 (index 1)
    assert fn2(None, [1.0, 2.0, 5.0], False) == 21.0
    fn3 = compile_js_reduce(
        "function(k, v) { var b = v.toSpliced(1, 1, 9);"
        " return b.join('-') + '|' + v.join('-'); }"
    )
    assert fn3(None, [1.0, 2.0, 3.0], False) == "1-9-3|1-2-3"
    fn4 = compile_js_reduce(
        "function(k, v) { return v.with(-1, 7).join(',') + '|'"
        " + v.toReversed().join(',') + '|' + v.join(','); }"
    )
    assert fn4(None, [1.0, 2.0], False) == "1,7|2,1|1,2"


def test_looks_like_js_reduce_discriminates():
    assert looks_like_js_reduce(SUM_JS)
    assert not looks_like_js_reduce("_sum")
    assert not looks_like_js_reduce(lambda k, v, r: 0)
    assert not looks_like_js_reduce(None)


# ---------------------------------------------------------------------------
# engine end-to-end
# ---------------------------------------------------------------------------


def test_lowered_js_reduce_equals_builtin(spark, sf_dir, tmp_path):
    """A ddoc whose reduce is JS ``sum(values)`` must produce exactly
    the builtin ``_sum`` result (it lowers to the JVM fast path)."""
    eng = Engine(spark, sf_dir, str(tmp_path))
    spec = MapSpec(
        "lineitem",
        [("str", "l_returnflag"), ("str", "l_linestatus")],
        ("num", "l_quantity"),
    )
    want = {
        (tuple(r["key"]), round(r["value"], 6))
        for r in eng.query({"map": spec, "reduce": "_sum"},
                           group_level=2).rows()
    }
    got = {
        (tuple(r["key"]), round(r["value"], 6))
        for r in eng.query({"map": spec, "reduce": SUM_JS},
                           group_level=2).rows()
    }
    assert got == want and want


def test_interpreted_js_reduce_matches_builtin_pair(spark, sf_dir,
                                                    tmp_path):
    """The interpreted {sum, count} accumulator through the REAL
    distributed partial/final phases must agree with the _sum and
    _count builtins computed separately — the property the rereduce
    contract guarantees."""
    eng = Engine(spark, sf_dir, str(tmp_path))
    spec = MapSpec("orders", ("str", "o_orderpriority"),
                   ("num", "o_totalprice"))
    stats = {
        r["key"]: (round(r["value"]["sum"], 2), r["value"]["count"])
        for r in eng.query({"map": spec, "reduce": STATS_JS},
                           group=True).rows()
    }
    sums = {
        r["key"]: round(r["value"], 2)
        for r in eng.query({"map": spec, "reduce": "_sum"},
                           group=True).rows()
    }
    counts = {
        r["key"]: r["value"]
        for r in eng.query({"map": spec, "reduce": "_count"},
                           group=True).rows()
    }
    assert stats and set(stats) == set(sums) == set(counts)
    for k, (s, c) in stats.items():
        assert s == sums[k]
        assert c == counts[k]


def test_full_js_ddoc_persisted(spark, sf_dir, tmp_path):
    """put_design with BOTH members as JS source; persisted build +
    incremental query path."""
    eng = Engine(spark, sf_dir, str(tmp_path))
    eng.put_design(
        "jsd",
        {
            "v": {
                "map": (
                    "orders",
                    "function(doc) { emit(doc.o_orderstatus, "
                    "doc.o_totalprice); }",
                ),
                "reduce": STATS_JS,
            }
        },
    )
    rows = eng.query("jsd/v", group=True).rows()
    assert rows
    for r in rows:
        assert set(r["value"]) == {"sum", "count"}
        assert r["value"]["count"] > 0
    # registry signature is stable: re-putting the same ddoc must not
    # change the signature (no spurious rebuild)
    sig_before = eng.registry.resolve("jsd", "v")
    eng.put_design(
        "jsd",
        {
            "v": {
                "map": (
                    "orders",
                    "function(doc) { emit(doc.o_orderstatus, "
                    "doc.o_totalprice); }",
                ),
                "reduce": STATS_JS,
            }
        },
    )
    assert eng.registry.resolve("jsd", "v") == sig_before


def test_property_stats_accumulator_rereduce_invariant():
    """Hypothesis: for ANY value list and ANY partition of it into
    partial groups, the interpreted {sum, count} accumulator's
    partial→final fold equals the direct single-pass result — the
    associativity contract reduce_custom relies on.  (Round 6:
    compile_js_reduce lowers this shape, so the interpreter under
    test is instantiated directly.)"""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    f = JSReduceFunction(STATS_JS)

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.floats(-1e6, 1e6, allow_nan=False, width=32),
            min_size=1, max_size=24,
        ),
        st.integers(1, 5),
    )
    def check(vals, nparts):
        direct = f(None, vals, False)
        assert direct["count"] == float(len(vals))
        assert direct["sum"] == pytest.approx(sum(vals), rel=1e-9,
                                              abs=1e-9)
        # arbitrary partition → partials → rereduce
        k = max(1, len(vals) // nparts)
        chunks = [vals[i:i + k] for i in range(0, len(vals), k)]
        partials = [f(None, c, False) for c in chunks]
        folded = f(None, partials, True)
        assert folded["count"] == direct["count"]
        assert folded["sum"] == pytest.approx(direct["sum"], rel=1e-9,
                                              abs=1e-9)

    check()


@pytest.mark.parametrize("nvals", [1, 2, 7, 40])
def test_property_interpreted_sum_loop_equals_builtin(nvals):
    """A hand-rolled for-loop sum in JS equals Python sum for random
    value lists, including through a simulated partial/final split."""
    import random

    rng = random.Random(20260813 + nvals)
    loop_sum = compile_js_reduce(
        "function(keys, values, rereduce) {"
        "  var s = 0;"
        "  for (var i = 0; i < values.length; i++) { s += values[i]; }"
        "  return s;"
        "}"
    )
    vals = [round(rng.uniform(-100, 100), 3) for _ in range(nvals)]
    direct = loop_sum(None, vals, False)
    assert direct == pytest.approx(sum(vals))
    # split into partials then rereduce
    cut = nvals // 2
    p1 = loop_sum(None, vals[:cut], False)
    p2 = loop_sum(None, vals[cut:], False)
    assert loop_sum(None, [p1, p2], True) == pytest.approx(sum(vals))


def test_nonfinite_reduce_results_serialize_as_null():
    """Round 6 (ADVICE): NaN/±Infinity escaping an interpreted reduce
    must come out as JSON null (JSON.stringify semantics, matching
    collate.py's key rule) — never the non-standard 'NaN'/'Infinity'
    tokens json.dumps would emit by default."""
    import json

    from mapreduce_spark.functions.jsreduce import compile_js_reduce

    fn = compile_js_reduce(
        "function(keys, values, rereduce) { return values[0] / 0; }"
    )
    out = fn(None, [1.0], False)
    assert out is None  # Infinity → null
    fn2 = compile_js_reduce(
        "function(keys, values, rereduce) {"
        "  return {m: Math.max.apply(null, []), a: [0/0, 1]}; }"
    )
    out2 = fn2(None, [], False)
    assert out2 == {"m": None, "a": [None, 1.0]}
    assert "NaN" not in json.dumps(out2)


def test_minmax_lowering_recognition():
    """Round 6: Math.min/max.apply and the canonical accumulator loop
    lower to the JVM _min/_max builtins; near-miss shapes interpret."""
    from mapreduce_spark.functions.jsreduce import compile_js_reduce

    assert compile_js_reduce(
        "function(k, v) { return Math.min.apply(null, v); }"
    ) == "_min"
    assert compile_js_reduce(
        "function(keys, values, rr) "
        "{ return Math.max.apply(Math, values); }"
    ) == "_max"
    loop_min = """function(keys, values, rereduce) {
        var m = values[0];
        for (var i = 1; i < values.length; i++) {
            if (values[i] < m) { m = values[i]; }
        }
        return m;
    }"""
    assert compile_js_reduce(loop_min) == "_min"
    loop_max_swapped = """function(keys, values, rereduce) {
        var m = values[0];
        for (var i = 1; i < values.length; i++) {
            if (m < values[i]) { m = values[i]; }
        }
        return m;
    }"""
    assert compile_js_reduce(loop_max_swapped) == "_max"
    inf_seed_min = """function(keys, values, rereduce) {
        var m = Infinity;
        for (var i = 0; i < values.length; i++) {
            if (values[i] < m) { m = values[i]; }
        }
        return m;
    }"""
    assert compile_js_reduce(inf_seed_min) == "_min"
    # near-miss: wrong seed direction for the comparison — interpreted
    wrong = inf_seed_min.replace("var m = Infinity",
                                 "var m = 0 - Infinity")
    assert callable(compile_js_reduce(wrong))
    # near-miss: loop mutates something else too — interpreted
    extra = """function(keys, values, rereduce) {
        var m = values[0];
        var n = 0;
        for (var i = 1; i < values.length; i++) {
            if (values[i] < m) { m = values[i]; }
        }
        return m;
    }"""
    assert callable(compile_js_reduce(extra))


def test_property_minmax_lowered_equals_interpreted():
    """The lowering must be semantically invisible: the INTERPRETED
    loop/apply forms (run through a partial/final split at any cut)
    agree with plain min/max — which is what the _min/_max builtins
    compute JVM-side."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mapreduce_spark.functions.jsreduce import JSReduceFunction

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.floats(-1e6, 1e6, allow_nan=False, width=32),
            min_size=1, max_size=40,
        ),
        st.integers(0, 39),
    )
    def check(vals, cut_raw):
        cut = min(cut_raw, len(vals))
        for src, py in (
            ("function(k, v) { return Math.min.apply(null, v); }",
             min),
            ("""function(k, values, rr) {
                  var m = values[0];
                  for (var i = 1; i < values.length; i++) {
                    if (values[i] > m) { m = values[i]; }
                  }
                  return m;
                }""", max),
        ):
            fn = JSReduceFunction(src)  # bypass lowering: interpreter
            parts = [p for p in (vals[:cut], vals[cut:]) if p]
            partials = [fn(None, p, False) for p in parts]
            assert fn(None, partials, True) == pytest.approx(py(vals))

    check()


def test_minmax_lowered_plan_is_jvm_only(spark, sf_dir, tmp_path):
    """Engine end-to-end: a JS Math.max.apply reduce over a MapSpec
    view equals the _max builtin and its physical plan contains no
    Python evaluation (BatchEvalPython/ArrowEvalPython/FlatMapsInPandas
    would mean the lowering regressed)."""
    eng = Engine(spark, sf_dir, str(tmp_path))
    spec = MapSpec("events", ("str", "event_type"), ("num", "value"))
    js = "function(keys, values, rr) " \
         "{ return Math.max.apply(null, values); }"
    res = eng.query({"map": spec, "reduce": js}, group=True)
    want = {
        r["key"]: round(r["value"], 6)
        for r in eng.query({"map": spec, "reduce": "_max"},
                           group=True).rows()
    }
    got = {r["key"]: round(r["value"], 6) for r in res.rows()}
    assert got == want and got
    plan = res.df._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "InPandas"):
        assert marker not in plan


_SUM_COUNT_JS = """function (keys, values, rereduce) {
  if (rereduce) {
    var s = 0;
    var c = 0;
    for (var i = 0; i < values.length; i++) {
      s += values[i].sum;
      c += values[i].count;
    }
    return {sum: s, count: c};
  } else {
    return {sum: sum(values), count: values.length};
  }
}"""


def test_sum_count_lowering_recognition():
    """Round 6: the canonical CouchDB average accumulator lowers to
    the _sum_count JVM builtin; near-miss shapes interpret."""
    from mapreduce_spark.functions.jsreduce import compile_js_reduce

    assert compile_js_reduce(_SUM_COUNT_JS) == "_sum_count"
    # variants: swapped accumulation order, expanded assignment,
    # object key order, one var statement
    v = _SUM_COUNT_JS.replace(
        "s += values[i].sum;\n      c += values[i].count;",
        "c = c + values[i].count;\n      s = s + values[i].sum;",
    ).replace("{sum: s, count: c}", "{count: c, sum: s}")
    assert compile_js_reduce(v) == "_sum_count"
    v2 = _SUM_COUNT_JS.replace(
        "var s = 0;\n    var c = 0;", "var s = 0, c = 0;"
    )
    assert compile_js_reduce(v2) == "_sum_count"
    # near-miss: a third tracked field (q33's {sum,count,min} form)
    # must stay interpreted
    v3 = _SUM_COUNT_JS.replace(
        "var c = 0;", "var c = 0;\n    var m = Infinity;"
    ).replace(
        "c += values[i].count;",
        "c += values[i].count;\n      "
        "if (values[i].min < m) { m = values[i].min; }",
    ).replace("{sum: s, count: c}", "{sum: s, count: c, min: m}"
    ).replace(
        "{sum: sum(values), count: values.length}",
        "{sum: sum(values), count: values.length, "
        "min: Math.min.apply(null, values)}",
    )
    assert callable(compile_js_reduce(v3))
    # near-miss: wrong field pulled in the loop — interpreted
    v4 = _SUM_COUNT_JS.replace("values[i].count", "values[i].cnt")
    assert callable(compile_js_reduce(v4))
    # near-miss: accumulator seeded with 1 — interpreted
    v5 = _SUM_COUNT_JS.replace("var c = 0;", "var c = 1;")
    assert callable(compile_js_reduce(v5))


def test_property_sum_count_lowered_equals_interpreted():
    """The lowering must be semantically invisible: the INTERPRETED
    accumulator, run through a partial/final split at any cut, agrees
    with plain (sum, count) — which is what _sum_count computes
    JVM-side."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mapreduce_spark.functions.jsreduce import JSReduceFunction

    fn = JSReduceFunction(_SUM_COUNT_JS)

    @settings(max_examples=60, deadline=None)
    @given(
        st.lists(
            st.floats(-1e6, 1e6, allow_nan=False), min_size=1,
            max_size=12,
        ),
        st.data(),
    )
    def check(vals, data):
        cut = data.draw(st.integers(0, len(vals)))
        parts = []
        for chunk in (vals[:cut], vals[cut:]):
            if chunk:
                parts.append(fn(None, chunk, False))
        out = fn(None, parts, True) if len(parts) > 1 else parts[0]
        assert out["count"] == len(vals)
        assert abs(out["sum"] - sum(vals)) < 1e-6 * max(
            1.0, abs(sum(vals))
        )

    check()


def test_sum_count_lowered_plan_is_jvm_only(spark, sf_dir, tmp_path):
    """Engine end-to-end: the canonical accumulator ddoc over a
    MapSpec view equals sum+count of the builtin pair and contains no
    Python evaluation in the physical plan."""
    import json

    eng = Engine(spark, sf_dir, str(tmp_path))
    spec = MapSpec("events", ("str", "event_type"), ("num", "value"))
    res = eng.query({"map": spec, "reduce": _SUM_COUNT_JS}, group=True)
    want_sum = {
        r["key"]: round(r["value"], 6)
        for r in eng.query({"map": spec, "reduce": "_sum"},
                           group=True).rows()
    }
    want_cnt = {
        r["key"]: r["value"]
        for r in eng.query({"map": spec, "reduce": "_count"},
                           group=True).rows()
    }
    got = {r["key"]: r["value"] for r in res.rows()}
    assert {k: round(v["sum"], 6) for k, v in got.items()} == want_sum
    assert {k: v["count"] for k, v in got.items()} == want_cnt
    assert got
    plan = res.df._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "InPandas"):
        assert marker not in plan


def test_real_js_bindings_and_array_length():
    """Round 6 (review 3): `this`/`arguments`/named-function-expression
    self-names are REAL JS bindings (not ReferenceErrors that would
    silently skip docs), and `a.length = n` truncates/extends like JS
    while non-length array member writes stay invisible properties."""
    fn = JSReduceFunction(
        """function (keys, values, rereduce) {
             var f = function fact(n) {
               return n < 2 ? 1 : n * fact(n - 1);
             };
             var a = [];
             for (var i = 0; i < values.length; i++) { a.push(values[i]); }
             a.length = 2;               // JS truncation
             a.junk = 9;                 // property: invisible
             return [f(4), this.x, arguments.length, a];
           }"""
    )
    out = fn(None, [10.0, 20.0, 30.0], False)
    assert out[0] == 24.0            # named fn self-recursion
    assert out[1] is None            # this.x → undefined → null
    assert out[2] == 3.0             # arguments bound
    assert out[3] == [10.0, 20.0]    # length assignment truncated

    # extension pads with undefined → null after de-undef
    fn2 = JSReduceFunction(
        "function (k, v) { var a = [1]; a.length = 3; return a; }"
    )
    assert fn2(None, [0], False) == [1.0, None, None]


_STATS_JS = """function(keys, values, rereduce) {
  if (rereduce) {
    return {
      'sum': values.reduce(function(a, b) { return a + b.sum }, 0),
      'min': values.reduce(function(a, b) { return Math.min(a, b.min) }, Infinity),
      'max': values.reduce(function(a, b) { return Math.max(a, b.max) }, -Infinity),
      'count': values.reduce(function(a, b) { return a + b.count }, 0),
      'sumsqr': values.reduce(function(a, b) { return a + b.sumsqr }, 0)
    }
  } else {
    return {
      'sum': sum(values),
      'min': Math.min.apply(null, values),
      'max': Math.max.apply(null, values),
      'count': values.length,
      'sumsqr': (function() {
        var sumsqr = 0;
        values.forEach(function (value) { sumsqr += value * value });
        return sumsqr;
      })()
    }
  }
}"""


def test_stats_lowering_recognition():
    """Round 6 (late): the EXACT canonical stats reduce from the
    CouchDB "Reduce/Rereduce" docs lowers to the _stats builtin;
    near-miss shapes interpret."""
    from mapreduce_spark.functions.jsreduce import compile_js_reduce

    assert compile_js_reduce(_STATS_JS) == "_stats"
    # indexed for-loop sumsqr variant also lowers
    v = _STATS_JS.replace(
        """(function() {
        var sumsqr = 0;
        values.forEach(function (value) { sumsqr += value * value });
        return sumsqr;
      })()""",
        """(function() {
        var s = 0;
        for (var i = 0; i < values.length; i++) {
          s += values[i] * values[i];
        }
        return s;
      })()""",
    )
    assert compile_js_reduce(v) == "_stats"
    # near-miss: min rereduce seeded 0 (changes semantics) — interpret
    assert callable(compile_js_reduce(
        _STATS_JS.replace("}, Infinity)", "}, 0)")
    ))
    # near-miss: sumsqr accumulates value (not value*value) — interpret
    assert callable(compile_js_reduce(
        _STATS_JS.replace("sumsqr += value * value", "sumsqr += value")
    ))
    # near-miss: wrong rereduce field pulled (b.sum into sumsqr) —
    # interpret
    assert callable(compile_js_reduce(
        _STATS_JS.replace("return a + b.sumsqr", "return a + b.sum")
    ))


def test_property_stats_lowered_equals_interpreted():
    """The interpreted canonical stats accumulator, split at any
    partial/final cut, equals the plain (sum, count, min, max,
    sumsqr) — what _stats computes JVM-side."""
    from hypothesis import given, settings
    from hypothesis import strategies as st

    from mapreduce_spark.functions.jsreduce import JSReduceFunction

    fn = JSReduceFunction(_STATS_JS)

    @settings(max_examples=50, deadline=None)
    @given(
        st.lists(
            st.floats(-1e6, 1e6, allow_nan=False), min_size=1,
            max_size=12,
        ),
        st.data(),
    )
    def check(vals, data):
        cut = data.draw(st.integers(0, len(vals)))
        parts = [fn(None, c, False)
                 for c in (vals[:cut], vals[cut:]) if c]
        out = fn(None, parts, True) if len(parts) > 1 else parts[0]
        assert out["count"] == len(vals)
        assert out["min"] == min(vals)
        assert out["max"] == max(vals)
        tol = 1e-6 * max(1.0, abs(sum(vals)))
        assert abs(out["sum"] - sum(vals)) < tol
        sq = sum(v * v for v in vals)
        assert abs(out["sumsqr"] - sq) < 1e-6 * max(1.0, sq)

    check()


def test_stats_lowered_plan_is_jvm_only(spark, sf_dir, tmp_path):
    """Engine end-to-end: the canonical stats ddoc over a MapSpec view
    equals the _stats builtin exactly and evaluates no Python."""
    eng = Engine(spark, sf_dir, str(tmp_path))
    spec = MapSpec("events", ("str", "event_type"), ("num", "value"))
    res = eng.query({"map": spec, "reduce": _STATS_JS}, group=True)
    want = {
        r["key"]: r["value"]
        for r in eng.query({"map": spec, "reduce": "_stats"},
                           group=True).rows()
    }
    got = {r["key"]: r["value"] for r in res.rows()}
    assert got == want and got
    assert set(next(iter(got.values()))) == {
        "sum", "count", "min", "max", "sumsqr"
    }
    plan = res.df._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "InPandas"):
        assert marker not in plan


def test_array_methods_js_semantics():
    """Round 6 (late): sort (ToString default order, comparator form,
    stability contract), reverse, every/some (vacuous truths),
    find/findIndex, includes (SameValueZero: NaN matches) vs indexOf
    (strict: NaN never matches), lastIndexOf, pop/shift/unshift,
    toString."""
    from mapreduce_spark.functions.jsreduce import JSReduceFunction

    fn = JSReduceFunction("""function(keys, values, rereduce) {
      var a = [3, 1, 2];
      var out = [];
      out.push(a.sort().join('-'));
      out.push([10, 9, 1].sort().join('-'));      // ToString order!
      out.push([10, 9, 1].sort(function(x, y){ return x - y; })
               .join('-'));
      out.push(a.reverse().join('-'));
      out.push([1, 2, 3].every(function(x){ return x > 0; }));
      out.push([1, 2, 3].some(function(x){ return x > 2; }));
      out.push([].every(function(x){ return false; }));
      out.push([].some(function(x){ return true; }));
      out.push([5, 6, 7].find(function(x){ return x > 5; }));
      out.push([5, 6, 7].findIndex(function(x){ return x > 5; }));
      out.push([5, 6].find(function(x){ return x > 9; }));
      out.push([1, 0/0, 2].includes(0/0));  // SameValueZero
      out.push([1, 0/0, 2].indexOf(0/0));   // strict: -1
      out.push([1, 2, 1].lastIndexOf(1));
      var b = [1, 2, 3];
      out.push(b.pop()); out.push(b.shift());
      out.push(b.unshift(9, 8));
      out.push(b.toString());
      return out;
    }""")
    assert fn(None, [], False) == [
        "1-2-3", "1-10-9", "1-9-10", "3-2-1", True, True, True,
        False, 6.0, 1.0, None, True, -1.0, 2.0, 3.0, 1.0, 3.0,
        "9,8,2",
    ]
    # round 7: splice/flat/reduceRight joined the subset; flatMap
    # stays a LOUD out-of-subset error, not a silent skip
    ok = JSReduceFunction(
        "function(k, v, r) { var a = [1, [2, [3]], 4]; "
        "a.splice(0, 1); return [a.flat(), "
        "[1, 2, 3].reduceRight(function(x, y){ return x + y; }, 0)]; }"
    )
    assert ok(None, [], False) == [[2.0, [3.0], 4.0], 6.0]
    import pytest

    from mapreduce_spark.functions.jsreduce import JSReduceError

    bad = JSReduceFunction(
        "function(k, v, r) { var a = [1]; return a.flatMap(null); }"
    )
    with pytest.raises(JSReduceError, match="flatMap"):
        bad(None, [], False)


def test_while_dowhile_break_continue():
    """Round 6 (late): while / do-while / break / continue with JS
    semantics (break/continue bind to the innermost loop; do-while
    runs its body once before the test)."""
    fn = JSReduceFunction("""function(k, values, r) {
      var out = [];
      var i = 0;
      while (i < values.length) {
        if (values[i] === 3) { i++; continue; }
        if (values[i] > 8) { break; }
        out.push(values[i]);
        i++;
      }
      var j = 0;
      do { out.push('d' + j); j++; } while (j < 2);
      for (var q = 0; q < 10; q++) {
        if (q === 2) continue;
        if (q === 4) break;
        out.push(q);
      }
      return out;
    }""")
    assert fn(None, [1.0, 3.0, 5.0, 9.0, 2.0], False) == [
        1.0, 5.0, "d0", "d1", 0.0, 1.0, 3.0
    ]


def test_throw_try_catch_finally_and_fn_decls():
    """Round 6 (late): user throw (tryMap doc-skip parity), try/catch
    binding the thrown value (objects, null, engine Error shapes),
    finally on fall-through and return, and statement-level function
    declarations (recursive helpers)."""
    from mapreduce_spark.functions.jsmap import JSMapFunctionFull
    from mapreduce_spark.functions.jsreduce import JSRuntimeThrow

    fn = JSReduceFunction("""function(k, v, r) {
      var out = [];
      try { out.push(JSON.parse('{bad')); }
      catch (e) { out.push('caught:' + e.name); }
      finally { out.push('fin'); }
      try { throw {code: 42}; } catch (err) { out.push(err.code); }
      try { throw null; } catch (z) { out.push(z === null); }
      function f(n) { return n < 2 ? 1 : n * f(n - 1); }
      out.push(f(4));
      return out;
    }""")
    assert fn(None, [], False) == [
        "caught:Error", "fin", 42.0, True, 24.0
    ]
    # uncaught throw in a MAP fn: doc skipped, earlier emits stand
    out = []
    JSMapFunctionFull(
        "function(doc){ emit('before', 1); throw 'skip'; }"
    )({}, lambda k, v: out.append(k))
    assert out == ["before"]
    # uncaught throw in a reduce propagates with the thrown value
    with pytest.raises(JSRuntimeThrow) as ei:
        JSReduceFunction(
            "function(k,v,r){ throw 'boom'; }"
        )(None, [], False)
    assert ei.value.js_value == "boom"


def test_review_findings_round6_late():
    """Adversarial-review regressions: catch param is BLOCK-scoped
    (outer binding restored), thrown values stay LIVE (a caught Date
    keeps its methods, thrown undefined binds undefined), impossible
    ISO dates are Invalid Date (no month roll), Infinity % x is NaN
    without a Python ValueError, and default sort stringifies objects
    as [object Object]."""
    from mapreduce_spark.functions.jsmap import JSMapFunctionFull

    out = JSReduceFunction("""function(k,v,r){
      var e = 'outer';
      try { JSON.parse('{bad'); } catch (e) {}
      var a; var b;
      try { throw new Date(5); } catch (err) { a = err.getTime(); }
      try { throw undefined; } catch (u) { b = (u === undefined); }
      var inf = 1 / 0;
      return [e, a, b, inf % 3 !== inf % 3,
              ['a', {}, 'Z'].sort().join('|')];
    }""")(None, [], False)
    assert out == ["outer", 5.0, True, True,
                   "Z|[object Object]|a"], out
    emits = []
    JSMapFunctionFull(
        "function(doc){ emit([new Date('2019-02-29').toJSON(), "
        "new Date('2020-02-29').getUTCDate()], 1); }"
    )({}, lambda k, v: emits.append(k))
    assert emits == [[None, 29.0]]


def test_reduce_with_regex_literal():
    """Round 7: regex literals work in reduce sources too (shared
    statement interpreter + jsregex)."""
    fn = JSReduceFunction("""function(keys, values, rereduce) {
      var n = 0;
      for (var i = 0; i < values.length; i++) {
        if (String(values[i]).match(/^err:[0-9]+$/)) { n += 1; }
      }
      return n;
    }""")
    assert fn(None, ["err:12", "ok", "err:x", "err:7"], False) == 2.0


def test_stdlib_long_tail_round8():
    """Round-8 JS stdlib long tail — every expected value below is the
    literal answer a real JS engine gives (checked against Node
    semantics by hand): Array.flatMap/keys/values/entries/fill/
    copyWithin/at, String.padStart/padEnd/repeat/normalize/at/
    trimStart/trimEnd/codePointAt/replaceAll/matchAll, and the for…of
    loop that consumes the iterator-shaped ones."""
    out = JSReduceFunction("""function(k, v, r) {
      var fm = [1,2,3].flatMap(function(x){ return [x, x*2]; });
      var fm2 = [1,[2]].flatMap(function(x){ return x; });
      var ksum = 0;
      for (var i of ['a','b','c'].keys()) { ksum += i; }
      var ent = '';
      for (var e of ['a','b'].entries()) { ent += e[0] + e[1]; }
      var vals = '';
      for (var x of ['p','q'].values()) { vals += x; }
      var chars = '';
      for (var c of 'xyz') { chars += c + '.'; }
      return [
        fm.join(','), fm2.join(','), ksum, ent, vals, chars,
        [1,2,3,4].fill(0,1,3).join(','),
        [1,2,3,4].fill(7,-2).join(','),
        [1,2,3,4,5].copyWithin(0,3).join(','),
        [1,2,3,4,5].copyWithin(1,3,4).join(','),
        [1,2,3,4,5].copyWithin(-2).join(','),
        [1,2,3].at(-1), 'abc'.at(-2), [1,2].at(5) === undefined,
        '5'.padStart(3,'0'), 'a'.padEnd(4,'xy'), 'a'.padStart(3),
        'abc'.padStart(2),
        'ab'.repeat(3), 'ab'.repeat(0),
        'e\\u0301'.normalize('NFC') === '\\u00e9',
        '  x  '.trimStart(), '  x  '.trimEnd(),
        'a'.codePointAt(0), 'a'.codePointAt(9) === undefined,
        'a.b.c'.replaceAll('.', '-'),
        'a1b2'.replaceAll(/[0-9]/g, '#'),
        'abc'.valueOf()
      ];
    }""")(None, [], False)
    assert out == [
        "1,2,2,4,3,6", "1,2", 3.0, "0a1b", "pq", "x.y.z.",
        "1,0,0,4", "1,2,7,7", "4,5,3,4,5", "1,4,3,4,5", "1,2,3,1,2",
        3.0, "b", True,
        "005", "axyx", "  a", "abc",
        "ababab", "",
        True, "x  ", "  x", 97.0, True,
        "a-b-c", "a#b#", "abc",
    ], out


def test_stdlib_long_tail_throws_round8():
    """The spec'd error paths are CATCHABLE JS exceptions (RangeError /
    TypeError), not engine errors: repeat(-1), normalize('bogus'),
    replaceAll / matchAll with a non-global regex, for…of over a
    non-iterable."""
    out = JSReduceFunction("""function(k, v, r) {
      var a = [];
      try { 'x'.repeat(-1); a.push('no'); }
      catch (e) { a.push('repeat'); }
      try { 'x'.normalize('bogus'); a.push('no'); }
      catch (e) { a.push('norm'); }
      try { 'x'.replaceAll(/x/, 'y'); a.push('no'); }
      catch (e) { a.push('replaceAll'); }
      try { 'x'.matchAll(/x/); a.push('no'); }
      catch (e) { a.push('matchAll'); }
      try { for (var z of 42) {} a.push('no'); }
      catch (e) { a.push('forof'); }
      return a.join(',');
    }""")(None, [], False)
    assert out == "repeat,norm,replaceAll,matchAll,forof", out


def test_matchall_round8():
    """matchAll yields full exec-shaped results (groups + .index); the
    iterator's internal clone INHERITS lastIndex (iteration starts
    there, spec 22.2.6.14) while the original regex's lastIndex stays
    untouched; a string argument is implicitly new RegExp(arg, 'g')."""
    out = JSReduceFunction("""function(k, v, r) {
      var re = /([a-z])([0-9]+)/g;
      var o = [];
      for (var m of 'a1b22'.matchAll(re)) {
        o.push(m[0] + '/' + m[1] + '/' + m[2] + '@' + m.index);
      }
      re.lastIndex = 2;
      var o2 = [];
      for (var m2 of 'a1b22'.matchAll(re)) { o2.push(m2[0]); }
      var n = 0;
      for (var m3 of 'a-b-a'.matchAll('a')) { n += 1; }
      return [o.join(' '), o2.join(' '), re.lastIndex, n];
    }""")(None, [], False)
    assert out == ["a1/a/1@0 b22/b/22@2", "b22", 2.0, 2.0], out


def test_stdlib_long_tail_fuzz_round8():
    """Metamorphic fuzz over the round-8 stdlib additions: every
    identity below holds in real JS between INDEPENDENT subset
    implementations, so a bug in either side breaks the pair —
    a.flatMap(f) ≡ a.map(f).flat(), entries ≡ zip(keys, values),
    for…of ≡ the C-style index loop, fill/copyWithin length
    invariance, padStart/padEnd/repeat length algebra, matchAll[i][0]
    ≡ match(g) — across seeded random arrays and strings."""
    import random

    rng = random.Random(20260814)
    alpha = "ab1 -x.Z"
    for trial in range(60):
        arr = [round(rng.uniform(-5, 5), 2) for _ in
               range(rng.randint(0, 6))]
        s = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 12)))
        n = rng.randint(0, 4)
        st = rng.randint(-4, 4)
        en = rng.randint(-4, 4)
        arr_js = "[" + ",".join(repr(x) for x in arr) + "]"
        s_js = "'" + s + "'"
        out = JSReduceFunction(f"""function(k, v, r) {{
          var a = {arr_js};
          var flatmap_eq =
            a.flatMap(function(x){{ return [x, -x]; }}).join('|') ===
            a.map(function(x){{ return [x, -x]; }}).flat().join('|');
          var ent_eq = true;
          var ks = a.keys(); var vs = a.values();
          var i = 0;
          for (var e of a.entries()) {{
            if (e[0] !== ks[i] || e[1] !== vs[i]) {{ ent_eq = false; }}
            i += 1;
          }}
          var fo = ''; var fc = '';
          for (var x of a) {{ fo += x + ';'; }}
          for (var j = 0; j < a.length; j++) {{ fc += a[j] + ';'; }}
          var b = a.slice(); var c = a.slice();
          b.fill(9, {st}, {en}); c.copyWithin({st}, {en});
          var pads = {s_js}.padStart({n} + {s_js}.length, '_');
          var pade = {s_js}.padEnd({n} + {s_js}.length, 'xy');
          return [flatmap_eq, ent_eq && i === a.length, fo === fc,
                  b.length === a.length, c.length === a.length,
                  pads.length, pade.length,
                  {s_js}.repeat({n}).length,
                  {s_js}.trimStart().length <= {s_js}.length,
                  {s_js}.matchAll(/[a-z]+/g).map(
                    function(m){{ return m[0]; }}).join(',')];
        }}""")(None, [], False)
        want_len = float(n + len(s))
        mm = [m for m in __import__("re").findall(r"[a-z]+", s)]
        assert out[:5] == [True, True, True, True, True], (trial, out)
        assert out[5] == want_len and out[6] == want_len, (trial, out)
        assert out[7] == float(n * len(s)), (trial, out)
        assert out[8] is True, (trial, out)
        assert out[9] == ",".join(mm), (trial, s, out)
