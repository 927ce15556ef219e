"""Grammar fuzz for the raw-doc Variant tier (functions/jsvariant.py).

Random kind-correct JS map sources over a corner-rich RAW JSON corpus
(nulls, missing fields, nested objects, numeric extremes, empty
strings, regex-trap values): every source the variant compiler ACCEPTS
must emit identically to the statement interpreter — they are fully
independent implementations (JVM variant_get SQL vs a Python JS
interpreter), so any divergence is a real bug in one of them.

Sources the compiler rejects (JSCompileError) are fine — the engine
falls back — but are counted: the subset must actually exercise.
"""

import json
import math
import os
import random

import pytest

from mapreduce_spark.functions.jscompile import JSCompileError
from mapreduce_spark.functions.jsmap import compile_js_map_full
from mapreduce_spark.functions.jsvariant import compile_js_map_variant
from mapreduce_spark.operators.mapphase import (
    build_view_structured_on,
    map_docs_to_rows,
)
from mapreduce_spark.sources.docs import raw_doc_table, register_table

N_DOCS = 40
N_SRC = 120


def _mkcorpus(rng):
    docs = []
    for i in range(N_DOCS):
        d = {
            "_id": f"f:{i:03d}",
            "s": rng.choice(["alpha", "", "user:1", "null", "x-9",
                             "Beta Gamma"]),
            "t": rng.choice(["en", "fr", "de"]),
            "n": rng.choice([0.0, -1.5, 2.0, 1e18, 0.1, 7.0]),
            "m": rng.choice([0.0, 3.0, -2.0, 10.0]),
            "b": rng.random() < 0.5,
            "meta": {"k": rng.choice(["p", "q"]),
                     "v": float(rng.randint(0, 9))},
        }
        if rng.random() < 0.3:
            d["z"] = None  # JSON null (present), never missing
        d["dts"] = (f"2024-0{rng.randint(1, 9)}-"
                    f"{rng.randint(1, 27):02d}T"
                    f"{rng.randint(0, 23):02d}:15:00Z")
        # array fields for the loop grammar (round 10): kind-pure per
        # field (mixed elements reject at inference), lengths 0..4,
        # sometimes missing/null — JS throws at .forEach / .length →
        # tryMap skip, compiled NULL-explode → zero rows, same answer
        r = rng.random()
        if r < 0.15:
            pass  # missing
        elif r < 0.25:
            d["arr"] = None
        else:
            d["arr"] = [rng.choice([0.0, -2.5, 3.0, 1e9])
                        for _ in range(rng.randint(0, 4))]
        if rng.random() < 0.85:
            d["tags"] = [rng.choice(["red", "", "en", "x:y"])
                         for _ in range(rng.randint(0, 3))]
        # object fields for the for-in grammar (round 10): 'props' is
        # kind-pure numeric (entry-value reads compile), with
        # integer-like keys whose ES order differs from the variant
        # dictionary order; 'mix' alternates object/array per doc
        # (inference says VARIANT → only key-enumeration compiles,
        # runtime CASE dispatches each row)
        r = rng.random()
        if r < 0.15:
            pass  # missing
        elif r < 0.25:
            d["props"] = None
        elif r < 0.35:
            d["props"] = {}
        else:
            d["props"] = {
                k: float(rng.randint(-3, 9))
                for k in rng.sample(["alpha", "beta", "2", "10", ""],
                                    rng.randint(1, 4))
            }
        if rng.random() < 0.8:
            d["mix"] = (
                {"u": float(rng.randint(0, 5)), "v": 1.5}
                if rng.random() < 0.5
                else [float(rng.randint(0, 5))
                      for _ in range(rng.randint(0, 3))]
            )
        docs.append(d)
    return docs


def _gen_source(rng):
    def num(depth):
        c = rng.randint(0, 4 if depth > 0 else 1)
        if c == 0:
            return rng.choice(["doc.n", "doc.m", "doc.meta.v"])
        if c == 1:
            return rng.choice(["2", "0.5", "10"])
        if c == 2:
            op = rng.choice(["+", "-", "*", "/", "%"])
            return f"({num(depth - 1)} {op} {num(depth - 1)})"
        if c == 3:
            f = rng.choice(["floor", "abs", "round"])
            return f"Math.{f}({num(depth - 1)})"
        if c == 4 and rng.random() < 0.5:
            g = rng.choice(["getUTCMonth", "getUTCDay", "getUTCDate",
                            "getUTCHours", "getUTCFullYear"])
            return f"new Date(doc.dts).{g}()"
        return rng.choice(["doc.s.length", "doc.t.length"])

    def strx(depth):
        c = rng.randint(0, 3 if depth > 0 else 1)
        if c == 0:
            return rng.choice(["doc.s", "doc.t", "doc.meta.k"])
        if c == 1:
            return rng.choice(["'lit'", "'en'"])
        if c == 2:
            m = rng.choice(["toLowerCase()", "toUpperCase()",
                            "substring(0, 2)"])
            return f"doc.{rng.choice(['s', 't'])}.{m}"
        return f"({strx(depth - 1)} + 'x')"

    def cond(depth):
        c = rng.randint(0, 5 if depth > 0 else 1)
        if c == 0:
            op = rng.choice(["===", "!==", "<", ">", "<=", ">="])
            return f"{num(depth - 1)} {op} {num(depth - 1)}"
        if c == 1:
            op = rng.choice(["===", "!=="])
            return f"{strx(depth - 1)} {op} 'en'"
        if c == 2:
            return f"({cond(depth - 1)} && {cond(depth - 1)})"
        if c == 3:
            return f"({cond(depth - 1)} || {cond(depth - 1)})"
        if c == 4:
            m = rng.choice(["startsWith('u')", "includes('a')",
                            "endsWith('a')", "match(/^a/)",
                            "match(/null/)"])
            return f"doc.{rng.choice(['s', 't'])}.{m}"
        return f"!({cond(depth - 1)})"

    def loop_source():
        # guarded array-emit loops (round 10, VERDICT r9 #7): forEach
        # and the C-style for idiom, outer doc guards, inner element/
        # index guards, elem/index in keys and values
        shape = rng.randint(0, 2)
        if shape == 2:
            # for-in over an object field (round-10 entry explode),
            # in all four spellings (round 11, VERDICT r10 #7):
            # bare for-in, Object.keys().forEach, Object.entries()
            # with e[0]/e[1], Object.entries() destructured [k, v] —
            # plus an optional local alias `var v0 = <entry value>;`.
            # Keys are order-safe (bare key as a component) ~85% of
            # the time; the rest exercise the loud order rejection
            field = rng.choice(["props", "props", "mix"])
            spelling = rng.randint(0, 3)
            if spelling == 0:
                kref, elem = "k", f"doc.{field}[k]"
                opener = f"for (var k in doc.{field}) {{ "
                closer = " }"
            elif spelling == 1:
                kref, elem = "k", f"doc.{field}[k]"
                opener = (f"Object.keys(doc.{field}).forEach("
                          "function (k) { ")
                closer = " });"
            elif spelling == 2:
                kref, elem = "e[0]", "e[1]"
                opener = (f"Object.entries(doc.{field}).forEach("
                          "function (e) { ")
                closer = " });"
            else:
                kref, elem = "k", "v"
                opener = (f"Object.entries(doc.{field}).forEach("
                          "function ([k, v]) { ")
                closer = " });"
            alias = ""
            if rng.random() < 0.3:
                alias, elem = f"var v0 = {elem}; ", "v0"
            iconds = []
            if rng.random() < 0.4:
                iconds.append(f"{kref} !== 'alpha'")
            if field == "props" and rng.random() < 0.4:
                iconds.append(f"{elem} > 0")
            if rng.random() < 0.3:
                iconds.append(cond(1))
            inner = "".join(f"if ({c}) {{ " for c in iconds)
            key = rng.choice(
                [kref, kref, kref, f"[doc.t, {kref}]",
                 f"[{kref}, {num(1)}]",
                 "doc.t"]  # last: order-unsafe, must reject
            )
            val = rng.choice(
                ["1", "null", kref]
                + ([elem, num(1)] if field == "props" else [])
            )
            outer = "".join(
                f"if ({cond(1)}) {{ "
                for _ in range(rng.randint(0, 1))
            )
            return ("function(doc) { " + outer + opener + alias
                    + inner
                    + f"emit({key}, {val});" + " }" * len(iconds)
                    + closer + " }" * outer.count("{") + " }")
        field = rng.choice(["arr", "tags"])
        fe = shape == 0
        if fe:
            elem, idx = "x", None
            opener = f"doc.{field}.forEach(function (x) {{ "
            closer = " });"
        else:
            elem, idx = f"doc.{field}[i]", "i"
            opener = (f"for (var i = 0; i < doc.{field}.length; "
                      "i++) { ")
            closer = " }"
        econd = (f"{elem} > 0" if field == "arr"
                 else f"{elem} !== 'en'")
        iconds = []
        if rng.random() < 0.6:
            iconds.append(econd)
        if idx is not None and rng.random() < 0.4:
            iconds.append(f"{idx} % 2 === 0")
        if rng.random() < 0.3:
            iconds.append(cond(1))  # doc-level cond inside the loop
        inner = "".join(f"if ({c}) {{ " for c in iconds)
        key = rng.choice(
            [elem, f"[doc.t, {elem}]"]
            + ([f"[{idx}, {elem}]", idx] if idx is not None else [])
        )
        val = rng.choice(["1", "null", elem,
                          num(1) if field == "arr" else strx(1)])
        outer = "".join(
            f"if ({cond(1)}) {{ " for _ in range(rng.randint(0, 1))
        )
        return ("function(doc) { " + outer + opener + inner
                + f"emit({key}, {val});" + " }" * len(iconds)
                + closer + " }" * outer.count("{") + " }")

    if rng.random() < 0.3:
        return loop_source()
    # function-level single-assignment alias (round 11): `var a0 = …;`
    # substitutes into guards/keys/values
    pre = ""
    if rng.random() < 0.25:
        pre = f"var a0 = {strx(1)}; "
    guards = "".join(
        f"if ({cond(1)}) {{ " for _ in range(rng.randint(0, 2))
    )
    key = rng.choice([num(2), strx(2),
                      f"[{strx(1)}, {num(1)}]"]
                     + (["a0", f"[a0, {num(1)}]"] if pre else []))
    val = rng.choice([num(2), "null", "1", strx(1),
                      f"[{num(1)}, {num(1)}]"]
                     + (["a0"] if pre else []))
    emits = f"emit({key}, {val});"
    if rng.random() < 0.3:
        emits += f" emit({strx(1)}, {num(1)});"
    return ("function(doc) { " + pre + guards + emits +
            " }" * guards.count("{") + " }")


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v) or math.isinf(v):
            return None
        return round(v, 6)
    if isinstance(v, list):
        return tuple(_norm(x) for x in v)
    return v


_FUZZ_SEEDS = [20260814, 0x0A10] + [
    int(s) for s in
    os.environ.get("SPARK_GRAFT_FUZZ_SEEDS", "").split(",") if s
]


@pytest.mark.parametrize("seed", _FUZZ_SEEDS)
def test_variant_fuzz_compiled_vs_interpreter(spark, tmp_path, seed):
    rng = random.Random(seed)
    docs = _mkcorpus(rng)
    rows = [(d["_id"], i, json.dumps(d)) for i, d in enumerate(docs)]
    sf = str(tmp_path / "vf")
    df = spark.createDataFrame(rows, ["_id", "seq", "doc_json"])
    df.write.mode("overwrite").parquet(f"{sf}/vfz.parquet")
    register_table(raw_doc_table("vfz"))

    compiled_n = 0
    compiled_loops = 0
    compiled_forin = 0
    for i in range(N_SRC):
        src = _gen_source(rng)
        try:
            view = compile_js_map_variant(spark, sf, "vfz", src)
        except JSCompileError:
            continue
        compiled_n += 1
        if "forEach" in src or "for (" in src:
            compiled_loops += 1
        # the object-entry explode family: all four spellings
        # (round 11 — for-in, Object.keys, Object.entries plain and
        # destructured) lower to the same 4-tuple explode
        if ("for (var k in" in src or "Object.keys(" in src
                or "Object.entries(" in src):
            compiled_forin += 1
        specs = view.specs if isinstance(view.specs, list) \
            else [view.specs]
        got = set()
        for spec in specs:
            for r in build_view_structured_on(df, spec).collect():
                got.add((r["id"], r["key_enc"],
                         _norm_json(r["value_json"])))
        fn = compile_js_map_full(src)
        want = set()
        for r in map_docs_to_rows(docs, fn):
            want.add((r["id"], r["key_enc"],
                      _norm_json(r["value_json"])))
        assert got == want, (src, sorted(got - want)[:3],
                             sorted(want - got)[:3])
    assert compiled_n >= 30, compiled_n
    # the loop grammar must actually exercise the posexplode tier
    assert compiled_loops >= 8, (compiled_loops, compiled_n)
    # ... and the round-10 object-entry (for-in) tier
    assert compiled_forin >= 3, (compiled_forin, compiled_n)


def _norm_json(vj):
    if vj is None:
        return None
    return _norm(json.loads(vj))
