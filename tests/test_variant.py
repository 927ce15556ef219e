"""Variant-compiled raw-JS tier (functions/jsvariant.py).

Upstream runs arbitrary JS per doc over schema-less JSON
[U pouchdb-abstract-mapreduce#evalFunc]; the engine compiles the
subset to drift-guarded JVM Variant expressions and must (a) produce
byte-identical view rows vs the interpreter tier, (b) keep Python out
of the build plan, (c) fall back transparently — same registry
signature — the moment a doc violates the sampled field contract.
"""

import json

import pytest

from mapreduce_spark.engine import Engine
from mapreduce_spark.functions.jscompile import (
    JSCompileError,
    compile_js_map_fn,
)
from mapreduce_spark.functions.jsvariant import (
    VariantJSView,
    compile_js_map_variant,
    infer_variant_types,
    referenced_doc_fields,
)
from mapreduce_spark.sources.docs import raw_doc_table, register_table

JS = ("function(doc) { if (doc.lang !== 'en') "
      "{ emit([doc.lang, doc.n % 10], doc.n); } }")


def _mkdocs(n=200):
    docs = []
    for i in range(n):
        d = {"_id": f"d:{i:04d}", "lang": ["en", "fr", "de"][i % 3],
             "n": float(i), "flag": i % 2 == 0}
        if i % 5 == 0:
            d["extra"] = None
        docs.append((d["_id"], i, json.dumps(d)))
    return docs


@pytest.fixture()
def raw_sf(spark, tmp_path):
    df = spark.createDataFrame(_mkdocs(), ["_id", "seq", "doc_json"])
    sf = str(tmp_path / "raw")
    df.write.mode("overwrite").parquet(f"{sf}/vdocs.parquet")
    register_table(raw_doc_table("vdocs"))
    return sf


def _group_rows(eng, name):
    res = eng.query(name, group=True, stale="ok")
    return {tuple(r["key"]): r["value"] for r in res.rows()}


def test_referenced_fields():
    assert referenced_doc_fields(JS) == ["lang", "n"]
    assert referenced_doc_fields("function(doc){}") is None
    # nested paths carry dotted (round-7: the variant tier compiles
    # them to '$.a.b' extraction paths)
    assert referenced_doc_fields(
        "function(doc){ emit(doc.a.b, 1); }"
    ) == ["a.b"]


def test_nested_paths_compile_and_match_interpreter(spark, tmp_path):
    """doc.meta.lang / doc.meta.stats.n on raw nested JSON compile to
    '$.meta.lang' variant extractions and equal the interpreter."""
    docs = []
    for i in range(60):
        d = {"_id": f"n:{i:03d}",
             "meta": {"lang": ["en", "fr"][i % 2],
                      "stats": {"n": float(i)}}}
        docs.append((d["_id"], i, json.dumps(d)))
    sf = str(tmp_path / "nested")
    spark.createDataFrame(docs, ["_id", "seq", "doc_json"]).write.mode(
        "overwrite").parquet(f"{sf}/ndocs.parquet")
    register_table(raw_doc_table("ndocs"))
    js = ("function(doc) { if (doc.meta.lang === 'fr') "
          "{ emit(doc.meta.lang, doc.meta.stats.n); } }")
    eng = Engine(spark, sf, str(tmp_path / "nv"))
    eng.put_design("dd", {"v": {"map": ("ndocs", js),
                                "reduce": "_sum"}})
    vd = next(iter(eng._defs.values()))
    assert isinstance(vd.map_def, VariantJSView)
    eng.update_view("dd/v")
    rows = eng.query("dd/v", group=True, stale="ok").rows()
    assert rows == [{"key": "fr", "value": sum(
        float(i) for i in range(60) if i % 2 == 1)}]


def test_inference(spark, raw_sf):
    from mapreduce_spark.sources.docs import load_table

    df = load_table(spark, raw_sf, "vdocs")
    kinds = infer_variant_types(df, ["lang", "n", "flag", "extra"])
    assert kinds == {
        "lang": "str", "n": "num", "flag": "bool", "extra": "num",
    }  # all-null field defaults to num (JS ToNumber(null) = 0)
    assert infer_variant_types(df, ["nope"]) is None


def test_compiles_and_matches_interpreter(spark, raw_sf, tmp_path):
    eng = Engine(spark, raw_sf, str(tmp_path / "v1"))
    eng.put_design("dd", {"v": {"map": ("vdocs", JS), "reduce": "_sum"}})
    vd = next(iter(eng._defs.values()))
    assert isinstance(vd.map_def, VariantJSView)
    eng.update_view("dd/v")
    compiled = _group_rows(eng, "dd/v")

    eng2 = Engine(spark, raw_sf, str(tmp_path / "v2"))
    eng2.put_design(
        "dd", {"v": {"map": ("vdocs", compile_js_map_fn(JS)),
                     "reduce": "_sum"}})
    eng2.update_view("dd/v")
    assert compiled == _group_rows(eng2, "dd/v")
    assert len(compiled) == 20


def test_signature_stable_across_tiers(spark, raw_sf):
    v = compile_js_map_variant(spark, raw_sf, "vdocs", JS)
    assert repr(v) == repr(("vdocs", compile_js_map_fn(JS)))


def test_build_plan_has_no_python(spark, raw_sf):
    from mapreduce_spark.operators.mapphase import (
        build_view_structured_on,
    )
    from mapreduce_spark.sources.docs import load_table

    v = compile_js_map_variant(spark, raw_sf, "vdocs", JS)
    specs = v.specs if isinstance(v.specs, list) else [v.specs]
    for spec in specs:
        plan = build_view_structured_on(
            load_table(spark, raw_sf, "vdocs"), spec
        )._jdf.queryExecution().executedPlan().toString()
        for bad in ("BatchEvalPython", "ArrowEvalPython",
                    "MapInPandas", "PythonUDF"):
            assert bad not in plan, f"{bad} in compiled build plan"


def test_build_plan_parses_doc_once(spark, raw_sf):
    """Round-8: the parsed Variant is materialized ONCE in a dedicated
    Project below the emit projection — the guard shape references it
    up to 3× per field and the emit projection multiplies that across
    key+value+json rendering, previously saved only by codegen CSE
    (fragile off the codegen path, PLANS.md round-7 lesson #1).

    The WHERE filter is the one place textual copies remain: Catalyst
    pushes deterministic predicates through the _vdoc Project with
    aliases inlined (pushdown has no cost model), and an early filter
    below the wide emit projection is the right trade — so the pin is
    (a) the emit Project itself carries ZERO parses, (b) exactly one
    _vdoc materialization exists, (c) the fused ddoc frame (where the
    WHERE is a CASE guard, the 100 TB build path) is single-parse
    end-to-end."""
    from mapreduce_spark.engine import Engine, ViewDef
    from mapreduce_spark.operators.mapphase import (
        build_view_structured_on,
    )
    from mapreduce_spark.sources.docs import load_table

    v = compile_js_map_variant(spark, raw_sf, "vdocs", JS)
    specs = v.specs if isinstance(v.specs, list) else [v.specs]
    for spec in specs:
        plan = build_view_structured_on(
            load_table(spark, raw_sf, "vdocs"), spec
        )._jdf.queryExecution().optimizedPlan().toString()
        # parse_json prints as VariantExpressionEvalUtils.parseJson;
        # one line per node in the optimized plan string
        emit_project = next(
            ln for ln in plan.splitlines() if "AS key_enc" in ln
        )
        assert "parseJson" not in emit_project, emit_project[:1500]
        assert plan.count("AS _vdoc") == 1, plan[:1500]

    # fused ddoc frame: WHERE folds into the CASE guard → the WHOLE
    # plan carries exactly one parse
    import tempfile

    eng = Engine(spark, raw_sf, tempfile.mkdtemp())
    vd = ViewDef(v)
    fused = eng._fused_frame([vd, vd], eng._source_df(vd))
    fplan = fused._jdf.queryExecution().optimizedPlan().toString()
    assert fplan.count("parseJson") == 1, fplan[:1500]


def test_drift_falls_back_same_sig(spark, raw_sf, tmp_path):
    eng = Engine(spark, raw_sf, str(tmp_path / "v3"))
    eng.put_design("dd", {"v": {"map": ("vdocs", JS), "reduce": "_sum"}})
    vd = next(iter(eng._defs.values()))
    eng.update_view("dd/v")
    sig = vd.sig

    drift = [("d:9999", 10_000, json.dumps(
        {"_id": "d:9999", "lang": 42, "n": 1.0, "flag": True}))]
    spark.createDataFrame(
        drift, ["_id", "seq", "doc_json"]
    ).write.mode("append").parquet(f"{raw_sf}/vdocs.parquet")
    eng.update_view("dd/v")  # raises inside, retries interpreted
    assert vd.sig == sig
    assert not isinstance(vd.map_def, VariantJSView)
    got = _group_rows(eng, "dd/v")
    assert got[(42, 1.0)] == 1.0  # the mixed-type doc, via interpreter


def test_sparse_field_rejected_by_validation(spark, tmp_path):
    # 'maybe' appears on half the docs and feeds the KEY unguarded:
    # JS emits undefined→null for the others, which the compiled tier
    # cannot represent (flavor-b raises) — the sample validation build
    # must reject the compile up front
    docs = []
    for i in range(100):
        d = {"_id": f"s:{i:03d}", "k": float(i)}
        if i % 2 == 0:
            d["maybe"] = f"m{i}"
        docs.append((d["_id"], i, json.dumps(d)))
    sf = str(tmp_path / "sparse")
    spark.createDataFrame(docs, ["_id", "seq", "doc_json"]).write.mode(
        "overwrite").parquet(f"{sf}/sdocs.parquet")
    register_table(raw_doc_table("sdocs"))
    with pytest.raises(JSCompileError):
        compile_js_map_variant(
            spark, sf, "sdocs",
            "function(doc) { emit(doc.maybe, doc.k); }",
        )
    # engine path: falls back silently to the interpreter tier
    eng = Engine(spark, sf, str(tmp_path / "v4"))
    eng.put_design("dd", {"v": {"map": (
        "sdocs", "function(doc) { emit(doc.maybe, doc.k); }")}})
    vd = next(iter(eng._defs.values()))
    assert not isinstance(vd.map_def, VariantJSView)
    eng.update_view("dd/v")
    rows = eng.query("dd/v", stale="ok", reduce=False).rows()
    assert len(rows) == 100  # undefined keys normalize to null rows
    assert sum(1 for r in rows if r["key"] is None) == 50


def test_json_null_behaves_as_typed_null(spark, raw_sf, tmp_path):
    # doc.extra is JSON null on every 5th doc and absent otherwise —
    # absent from the REFERENCED set here uses only 'n'; emit value
    # arithmetic over an always-present field with occasional nulls is
    # the typed-table nullable-column semantics, proven equal to the
    # interpreter on the same corpus
    js = "function(doc) { emit(doc._id, doc.n + 1); }"
    eng = Engine(spark, raw_sf, str(tmp_path / "v5"))
    eng.put_design("dd", {"v": {"map": ("vdocs", js)}})
    vd = next(iter(eng._defs.values()))
    assert isinstance(vd.map_def, VariantJSView)
    eng.update_view("dd/v")
    got = {r["key"]: r["value"]
           for r in eng.query("dd/v", stale="ok", reduce=False).rows()}

    eng2 = Engine(spark, raw_sf, str(tmp_path / "v6"))
    eng2.put_design(
        "dd", {"v": {"map": ("vdocs", compile_js_map_fn(js))}})
    eng2.update_view("dd/v")
    want = {r["key"]: r["value"]
            for r in eng2.query("dd/v", stale="ok", reduce=False).rows()}
    assert got == want


def test_build_ddoc_fused_drift_falls_back(spark, tmp_path):
    """A fused ddoc build over a raw table whose corpus violates the
    sampled contract beyond the sample (mixed-typed field in the
    tail) must fall back to per-view builds and still answer
    correctly through the interpreter tier."""
    docs = []
    for i in range(300):
        d = {"_id": f"t:{i:04d}", "lang": "fr" if i % 2 else "en",
             "n": float(i)}
        docs.append((d["_id"], i, json.dumps(d)))
    # tail doc drifts: lang becomes a number (beyond the 10k sample
    # cap is impossible at this size, so force drift by writing the
    # drifting doc AFTER registration/build starts is racy — instead
    # register with a clean table, then append before build)
    sf = str(tmp_path / "fd")
    spark.createDataFrame(docs, ["_id", "seq", "doc_json"]).write.mode(
        "overwrite").parquet(f"{sf}/fdocs.parquet")
    register_table(raw_doc_table("fdocs"))
    eng = Engine(spark, sf, str(tmp_path / "fdv"))
    eng.put_design("dd", {
        "a": {"map": ("fdocs", "function(doc){ emit(doc.lang, 1); }"),
              "reduce": "_count"},
        "b": {"map": ("fdocs",
                      "function(doc){ emit(doc.lang, doc.n); }"),
              "reduce": "_sum"},
    })
    for name in ("a", "b"):
        vd = eng._defs[eng.registry.resolve("dd", name)]
        assert isinstance(vd.map_def, VariantJSView), name
    drift = [("t:9999", 10_000, json.dumps(
        {"_id": "t:9999", "lang": 42, "n": 1.0}))]
    spark.createDataFrame(drift, ["_id", "seq", "doc_json"]).write.mode(
        "append").parquet(f"{sf}/fdocs.parquet")
    eng.build_ddoc("dd")
    a = {r["key"]: r["value"]
         for r in eng.query("dd/a", stale="ok", group=True).rows()}
    assert a[42] == 1.0 and a["en"] == 150.0 and a["fr"] == 150.0
    b = {r["key"]: r["value"]
         for r in eng.query("dd/b", stale="ok", group=True).rows()}
    assert b[42] == 1.0


def test_iso_date_bucketing_compiles(spark, tmp_path):
    """new Date(doc.ts).getUTC*() over a raw ISO-STRING field compiles
    (sampled all-ISO) and equals the interpreter; a shape-valid but
    impossible date in the tail drifts to the interpreter, which
    reproduces the JS Invalid-Date → NaN-key semantics."""
    docs = []
    for i in range(120):
        d = {"_id": f"ts:{i:03d}",
             "ts": f"2024-0{1 + i % 9}-{1 + i % 27:02d}"
                   f"T{i % 24:02d}:30:00Z",
             "v": float(i)}
        docs.append((d["_id"], i, json.dumps(d)))
    sf = str(tmp_path / "iso")
    spark.createDataFrame(docs, ["_id", "seq", "doc_json"]).write.mode(
        "overwrite").parquet(f"{sf}/idocs.parquet")
    register_table(raw_doc_table("idocs"))
    js = ("function(doc) { var d = new Date(doc.ts); "
          "emit([d.getUTCMonth(), d.getUTCDay()], doc.v); }")
    # `var` is out of subset — use the expression form for compile
    js = ("function(doc) { "
          "emit([new Date(doc.ts).getUTCMonth(), "
          "new Date(doc.ts).getUTCDay()], doc.v); }")
    eng = Engine(spark, sf, str(tmp_path / "iv"))
    eng.put_design("dd", {"v": {"map": ("idocs", js),
                                "reduce": "_sum"}})
    vd = next(iter(eng._defs.values()))
    assert isinstance(vd.map_def, VariantJSView)
    eng.update_view("dd/v")
    compiled = _group_rows(eng, "dd/v")

    eng2 = Engine(spark, sf, str(tmp_path / "iv2"))
    eng2.put_design("dd", {"v": {"map": (
        "idocs", compile_js_map_fn(js)), "reduce": "_sum"}})
    eng2.update_view("dd/v")
    assert compiled == _group_rows(eng2, "dd/v") and compiled

    # drift: impossible date (matches the shape regex, invalid value)
    bad = [("ts:9999", 10_000, json.dumps(
        {"_id": "ts:9999", "ts": "2024-13-45T00:00:00Z", "v": 1.0}))]
    spark.createDataFrame(bad, ["_id", "seq", "doc_json"]).write.mode(
        "append").parquet(f"{sf}/idocs.parquet")
    eng.update_view("dd/v")
    assert not isinstance(vd.map_def, VariantJSView)
    rows = eng.query("dd/v", group=True, stale="ok").rows()
    # JS: Invalid Date → NaN getters → key [null, null]
    assert any(r["key"] == [None, None] for r in rows)


def test_non_iso_strings_stay_interpreted(spark, tmp_path):
    docs = [(f"x:{i}", i, json.dumps(
        {"_id": f"x:{i}", "ts": "01/02/2024", "v": 1.0}))
        for i in range(30)]
    sf = str(tmp_path / "noniso")
    spark.createDataFrame(docs, ["_id", "seq", "doc_json"]).write.mode(
        "overwrite").parquet(f"{sf}/xdocs.parquet")
    register_table(raw_doc_table("xdocs"))
    with pytest.raises(JSCompileError):
        compile_js_map_variant(
            spark, sf, "xdocs",
            "function(doc) { emit(new Date(doc.ts).getUTCDate(), 1); }",
        )


def test_num_array_values_compile(spark, raw_sf, tmp_path):
    """emit(k, [doc.a, doc.b]) — the CouchDB _sum array shape —
    compiles on the variant tier with correct value_num_arr."""
    js = "function(doc) { emit(doc.lang, [doc.n, doc.n + 1]); }"
    eng = Engine(spark, raw_sf, str(tmp_path / "arr"))
    eng.put_design("dd", {"v": {"map": ("vdocs", js),
                                "reduce": "_sum"}})
    vd = next(iter(eng._defs.values()))
    assert isinstance(vd.map_def, VariantJSView)
    eng.update_view("dd/v")
    got = {r["key"]: r["value"]
           for r in eng.query("dd/v", group=True, stale="ok").rows()}
    want_en = [sum(float(i) for i in range(0, 200, 3)),
               sum(float(i) + 1 for i in range(0, 200, 3))]
    assert got["en"] == want_en
