"""JS regex support in the interpreter tiers (functions/jsregex.py).

Expected values below are the real ECMAScript results (checked
against the spec semantics the module implements: non-``u``-mode
character classes, g-flag lastIndex statefulness, the split
algorithm with captures, $-expansion in replace).
"""

import pytest

from mapreduce_spark.functions.jsmap import JSMapFunctionFull
from mapreduce_spark.functions.jsregex import translate
from mapreduce_spark.functions.jsreduce import JSReduceError


def run_map(src, doc):
    out = []
    JSMapFunctionFull(src)(doc, lambda k, v: out.append((k, v)))
    return out


def ev(expr, doc=None):
    """Evaluate a JS expression via a one-emit map fn."""
    rows = run_map(f"function(doc) {{ emit({expr}, null); }}",
                   doc or {})
    return rows[0][0]


# -- translation -----------------------------------------------------------

def test_char_classes_are_ecmascript_not_unicode():
    assert ev(r"/\d+/.test('42')") is True
    assert ev(r"/^\d+$/.test('٣')") is False  # arabic digit
    assert ev(r"/\s/.test(' ')") is True      # nbsp IS JS \s
    assert ev(r"/\w+/.test('a_1')") is True
    assert ev(r"/^\w$/.test('é')") is False   # é not JS \w
    assert ev(r"/h\b/.test('héllo')") is True  # ascii boundary


def test_class_edge_forms():
    assert ev(r"/x[]y/.test('xy')") is False   # [] matches nothing
    assert ev(r"/x[^]y/.test('x\ny')") is True  # [^] matches anything
    assert ev(r"/[\d-]+/.test('1-2')") is True


def test_flags():
    assert ev("/ab/i.test('AB')") is True
    assert ev("/^b/m.test('a\\nb')") is True
    assert ev("/a.b/s.test('a\\nb')") is True
    with pytest.raises(JSReduceError):
        translate("[ab]", "v")  # v-mode class set operations: loud
    with pytest.raises(JSReduceError):
        translate(r"\p{L}", "")  # \p without u: loud (identity
        # escape in real JS, but the author meant the property)
    # d (hasIndices) is behavioral since round 10 — see
    # test_d_flag_indices_round10


def test_duplicate_flags_are_syntax_errors():
    """/a/ii is a JS SyntaxError at literal parse — both the
    interpreter translate() and the compiled tier must stay loud
    instead of silently deduping the flags."""
    from mapreduce_spark.functions.jsreduce import JSRuntimeThrow

    with pytest.raises(JSRuntimeThrow):
        translate("a", "ii")
    with pytest.raises(JSRuntimeThrow):
        translate("a", "gg")
    with pytest.raises(JSRuntimeThrow):
        translate("a", "igi")
    from mapreduce_spark.functions.jscompile import (
        JSCompileError,
        _literal_regex,
    )

    with pytest.raises(JSCompileError):
        _literal_regex("a", "ii")
    with pytest.raises(JSCompileError):
        _literal_regex("a", "uu")


def test_sticky_round8():
    """y flag — every expected value is the real ECMAScript answer
    (spec RegExpBuiltinExec with sticky: the match must start AT
    lastIndex, which advances on success and zeroes on failure)."""
    # anchored-at-lastIndex exec loop over contiguous matches
    assert ev(
        "(function(){ var re = /\\d/y; var s = '12a34'; var n = 0;"
        " while (re.exec(s) !== null) { n += 1; } return n; })()"
    ) == 2.0  # stops at 'a' — a g regex would find all four
    # failure zeroes lastIndex
    assert ev(
        "(function(){ var re = /b/y; re.lastIndex = 1;"
        " re.exec('aab'); return re.lastIndex; })()"
    ) == 0.0
    # success from a manually-set lastIndex
    assert ev(
        "(function(){ var re = /b/y; re.lastIndex = 2;"
        " return re.test('aab'); })()"
    ) is True
    # String.prototype.match with g+y: contiguous prefix only
    assert ev("'12a34'.match(/\\d/gy)") == ["1", "2"]
    assert ev("'a12'.match(/\\d/gy)") is None
    # non-global sticky match = one anchored exec, advances lastIndex
    assert ev(
        "(function(){ var re = /a/y; 'aa'.match(re);"
        " return re.lastIndex; })()"
    ) == 1.0
    # search ignores (saves/zeroes/restores) lastIndex: anchors at 0
    assert ev("'ab'.search(/b/y)") == -1.0
    assert ev("'ba'.search(/b/y)") == 0.0
    # replace: non-global sticky anchors at lastIndex
    assert ev(
        "(function(){ var re = /a/y; re.lastIndex = 1;"
        " return 'aaa'.replace(re, 'X'); })()"
    ) == "aXa"
    # replace with g+y: contiguous run only
    assert ev("'aab'.replace(/a/gy, 'X')") == "XXb"
    assert ev("'baa'.replace(/a/gy, 'X')") == "baa"
    # split ignores the original's y (the spec splitter re-clones)
    assert ev("'a1b2c'.split(/\\d/y)") == ["a", "b", "c"]
    # property + flags round-trip
    assert ev("/a/y.sticky") is True
    assert ev("/a/g.sticky") is False
    assert ev("/a/u.unicode") is True
    assert ev("/a/uy.flags") == "uy"
    # ^ in sticky mode still asserts position 0, not lastIndex
    assert ev(
        "(function(){ var re = /^a/y; re.lastIndex = 1;"
        " return re.test('aa'); })()"
    ) is False


def test_prop_escapes_round8():
    """u-mode \\p{…}/\\P{…} General_Category classes — expected
    values are the real ECMAScript answers."""
    assert ev(r"/^\p{L}+$/u.test('Grüße中λ')") is True
    assert ev(r"/^\p{L}+$/u.test('ab1')") is False
    assert ev(r"/^\p{Lu}$/u.test('Ä')") is True
    assert ev(r"/^\p{Lu}$/u.test('ä')") is False
    # long form, gc= and General_Category= key forms
    assert ev(r"/^\p{Letter}$/u.test('x')") is True
    assert ev(r"/^\p{gc=Nd}$/u.test('٣')") is True
    assert ev(r"/^\p{General_Category=Letter}$/u.test('q')") is True
    # \p composes inside classes
    assert ev(r"'héllo_9 wörld!'.match(/[\p{L}\p{Nd}_]+/gu)") \
        == ["héllo_9", "wörld"]
    # negated \P outside a class
    assert ev(r"'a.b!'.match(/\P{L}/gu)") == [".", "!"]
    # astral code points are single atoms under \p in u-mode
    assert ev(r"/^\p{So}$/u.test('😀')") is True
    # binary properties with exact stdlib semantics
    assert ev(r"/^\p{ASCII}+$/u.test('abc')") is True
    assert ev(r"/^\p{ASCII}+$/u.test('abé')") is False
    assert ev(r"/^\p{White_Space}$/u.test(' ')") is True
    assert ev(r"/^\p{White_Space}$/u.test('﻿')") is False  # BOM
    assert ev(r"/^\s$/.test('﻿')") is True   # …but JS \s has it
    assert ev(r"/^\p{Hex_Digit}$/u.test('f')") is True
    assert ev(r"/^\p{Any}$/u.test('\u0000')") is True
    # case-sensitive property names, scripts and non-gc binaries loud
    with pytest.raises(JSReduceError):
        translate(r"\p{letter}", "u")  # lowercase long form: loud
    with pytest.raises(JSReduceError):
        translate(r"\p{Alphabetic}", "u")  # needs UCD tables
    # negated sets inside classes expand via complement ranges
    # (round 10) — real ECMAScript answers
    assert ev(r"/^[\P{L}\d]+$/u.test('12!')") is True
    assert ev(r"/^[\P{L}]$/u.test('a')") is False
    assert ev(r"/^[^\P{L}]$/u.test('x')") is True   # ¬¬L = L
    assert ev(r"/^[^\P{L}]$/u.test('1')") is False
    assert ev(r"'a1 b'.match(/[\D]/g)") == ["a", " ", "b"]
    assert ev(r"/^[\W]$/.test('!')") is True
    assert ev(r"/^[\W]$/.test('_')") is False
    assert ev(r"/^[\S]$/u.test('x')") is True
    assert ev(r"/^[\S]$/u.test(' ')") is False
    assert ev(r"/^[\D\s]+$/u.test('a b')") is True
    assert ev(r"/^[\D\s]+$/u.test('a 1')") is False
    from mapreduce_spark.functions.jsreduce import JSRuntimeThrow

    with pytest.raises(JSRuntimeThrow):
        translate(r"\p", "u")       # missing {…}: SyntaxError
    with pytest.raises(JSRuntimeThrow):
        translate(r"\p{L", "u")     # unterminated: SyntaxError


def test_prop_and_sticky_fuzz_round8():
    """Differential fuzz for the round-8 additions.

    \\p classes: the translated range classes must agree with a
    per-character ``unicodedata.category`` check (independent code
    path — ranges are built by run-length scanning, the oracle asks
    the table point-wise) across random code points incl. astral.

    Sticky: a g+y match must equal the longest CONTIGUOUS chain of
    non-sticky matches starting at 0 — derived here from matchAll
    positions, not from the sticky engine."""
    import random
    import unicodedata

    from mapreduce_spark.functions.jsregex import JSRegExp

    U = object()
    rng = random.Random(0x8888)
    cps = []
    while len(cps) < 600:
        c = rng.randrange(0x110000)
        if not (0xD800 <= c <= 0xDFFF):
            cps.append(c)
    s = "".join(map(chr, cps))
    for prop in ("L", "Lu", "Ll", "Lo", "M", "N", "Nd", "P", "Po",
                 "S", "So", "Z", "C", "Cf"):
        got = set(JSRegExp(f"\\p{{{prop}}}", "gu").match(s, U) or [])
        want = {ch for ch in s
                if unicodedata.category(ch).startswith(prop)}
        assert got == want, (prop, got ^ want)
        gotn = set(JSRegExp(f"\\P{{{prop}}}", "gu").match(s, U) or [])
        assert gotn == set(s) - want, prop
        # in-class negated form (round 10: complement-range expansion
        # — an independent code path from [^…])
        gotc = set(JSRegExp(f"[\\P{{{prop}}}]", "gu").match(s, U)
                   or [])
        assert gotc == set(s) - want, prop
        # and double negation: [^\P{p}] must equal \p{p}
        gotdn = set(JSRegExp(f"[^\\P{{{prop}}}]", "gu").match(s, U)
                    or [])
        assert gotdn == want, prop

    pats = ["a", "ab", "a+", "b?a", "(a|b)c?", "\\d", "a*b"]
    alpha = "aabbc1 "
    for _ in range(200):
        p = rng.choice(pats)
        txt = "".join(rng.choice(alpha) for _ in range(rng.randint(0, 9)))
        sticky = JSRegExp(p, "gy").match(txt, U) or []
        spans = [(int(m.index), m[0])
                 for m in JSRegExp(p, "g").match_all(txt, U)]
        chain, pos = [], 0
        for start, full in spans:
            if start != pos:
                if start > pos:
                    break
                continue  # an empty match we already stepped past
            chain.append(full)
            pos = start + len(full) + (0 if full else 1)
        assert list(sticky) == chain, (p, txt, sticky, chain)


def test_u_mode_round8():
    """u-flag subset (round 8) — every expected value is the real
    ECMAScript answer.  Python is code-point native, so u-mode's
    units-vs-code-points core comes for free; what the translation
    adds is \\u{…}, surrogate-pair combining, and strictness."""
    # the flag alone: classes/dot/quantifiers over code points
    assert ev(r"/^.$/u.test('é')") is True
    assert ev(r"/^\d+$/u.test('42')") is True
    assert ev(r"/^\d$/u.test('٣')") is False  # \d stays ASCII in u
    # \u{…} code-point escapes (only legal WITH u)
    assert ev(r"/\u{48}/u.test('H')") is True
    assert ev(r"/^\u{1F600}$/u.test('😀')") is True
    # astral literals: in u-mode a quantifier binds the full code
    # point (non-u JS would bind the trailing low surrogate)
    assert ev(r"/^😀$/u.test('😀')") is True
    assert ev(r"/^😀{2}$/u.test('😀😀')") is True
    # explicit surrogate-pair ESCAPES combine to one code point too
    assert ev(r"/^\uD83D\uDE00$/u.test('😀')") is True
    assert ev(r"/^\uD83D\uDE00{2}$/u.test('😀😀')") is True
    # class ranges over astral code points (impossible without u)
    assert ev(r"/^[\u{1F600}-\u{1F64F}]$/u.test('😀')") is True
    assert ev(r"/^[\u{1F600}-\u{1F64F}]$/u.test('x')") is False
    # g+u composes (lastIndex statefulness unchanged)
    assert ev(
        "(function(){ var re = /\\u{61}/gu; var n = 0;"
        " while (re.exec('aaa') !== null) { n += 1; } return n; })()"
    ) == 3.0
    # u-mode strictness: escapes JS rejects are errors, not matchers
    from mapreduce_spark.functions.jsreduce import JSRuntimeThrow

    with pytest.raises(JSRuntimeThrow):
        translate(r"\q", "u")       # identity escape: SyntaxError
    with pytest.raises(JSRuntimeThrow):
        translate(r"\u12", "u")     # short \uXXXX: SyntaxError
    with pytest.raises(JSRuntimeThrow):
        translate(r"\u{110000}", "u")  # beyond Unicode
    with pytest.raises(JSRuntimeThrow):
        translate(r"[\q]", "u")     # class identity escape
    with pytest.raises(JSRuntimeThrow):
        translate(r"\-", "u")       # \- outside a class: u-mode only
    # …but annex-B-lenient WITHOUT u, as before
    assert ev(r"/\-/.test('-')") is True


def test_named_groups():
    assert ev(r"'ab'.replace(/(?<x>a)/, '[$<x>]')") == "[a]b"
    assert ev(r"/(?<x>a)\k<x>/.test('aa')") is True


# -- methods ---------------------------------------------------------------

def test_match_non_global():
    m = ev(r"'a1b22c'.match(/(\d+)b(\d+)/)")
    assert list(m) == ["1b22", "1", "22"]
    assert ev(r"'a1b22c'.match(/(\d+)b(\d+)/).index") == 1.0
    assert ev(r"'abc'.match(/z/)") is None


def test_match_global():
    assert ev(r"'a1b22c'.match(/\d+/g)") == ["1", "22"]
    assert ev(r"'abc'.match(/z/g)") is None
    # zero-width global match must terminate and cover each position
    assert ev(r"'ab'.match(/(?:)/g)") == ["", "", ""]


def test_search_and_test():
    assert ev(r"'xxabc'.search(/abc/)") == 2.0
    assert ev(r"'xxabc'.search(/z/)") == -1.0
    assert ev(r"/^ab/.test('abc')") is True
    assert ev(r"/^ab/.test('cab')") is False


def test_replace():
    assert ev(r"'abcabc'.replace(/b/, 'X')") == "aXcabc"
    assert ev(r"'abcabc'.replace(/b/g, 'X')") == "aXcaXc"
    assert ev(
        r"'John Smith'.replace(/(\w+) (\w+)/, '$2 $1')"
    ) == "Smith John"
    assert ev(r"'abc'.replace(/b/, '[$&][$`][$\x27]')") == "a[b][a][c]c"
    assert ev(r"'abc'.replace(/b/, '$$')") == "a$c"
    # callback replacement: (match, groups…, offset, string)
    assert ev(
        "'a1b2'.replace(/([0-9])/g, "
        "function(m, g, off) { return '<' + g + '@' + off + '>'; })"
    ) == "a<1@1>b<2@3>"


def test_split_regex():
    assert ev(r"'x-y_z'.split(/[-_]/)") == ["x", "y", "z"]
    assert ev(r"'a1b'.split(/(\d)/)") == ["a", "1", "b"]
    assert ev(r"'ab'.split(/(?:)/)") == ["a", "b"]
    assert ev(r"'a,b,'.split(/,/)") == ["a", "b", ""]
    assert ev(r"',a'.split(/,/)") == ["", "a"]
    assert ev(r"'a1b2c'.split(/\d/, 2)") == ["a", "b"]


def test_exec_lastindex_loop():
    src = """
    function(doc) {
      var re = /[a-z]+/g, m;
      while ((m = re.exec(doc.s)) !== null) {
        emit(m[0], re.lastIndex);
      }
    }
    """
    rows = run_map(src, {"s": "ab 12 cd"})
    assert rows == [("ab", 2.0), ("cd", 8.0)]


def test_regexp_constructor_and_props():
    assert ev(r"new RegExp('a+', 'i').test('AAA')") is True
    assert ev(r"new RegExp('\\d+').source") == "\\d+"
    assert ev(r"/ab/gi.flags") == "gi"
    assert ev(r"/ab/g.global") is True
    assert ev(r"/ab/.global") is False
    # runtime-malformed constructor pattern: a JS SyntaxError — a
    # runtime throw, so tryMap skips the doc (no emits), not the build
    assert run_map(
        "function(doc) { emit(new RegExp('(', '').test('x'), null); }",
        {},
    ) == []


def test_division_still_division():
    assert ev("10 / 2 / 5") == 1.0
    assert ev("(4) / 2") == 2.0
    rows = run_map(
        "function(doc) { var x = doc.a / doc.b; emit(x, null); }",
        {"a": 6.0, "b": 3.0},
    )
    assert rows[0][0] == 2.0


def test_regex_after_operators_and_keywords():
    assert ev("true && /a/.test('a')") is True
    assert ev("1 ? /a/.test('b') : true") is False
    rows = run_map(
        "function(doc) { if (!/^en$/.test(doc.lang)) "
        "{ emit(doc.lang, 1); } }",
        {"lang": "fr"},
    )
    assert rows == [("fr", 1.0)]


def test_string_coerced_patterns():
    assert ev(r"'a.b'.match('a.b')[0]") == "a.b"  # '.' stays a wildcard
    assert ev(r"'axb'.search('a.b')") == 0.0


def test_regex_emitted_as_value_is_empty_object():
    # JSON.stringify(/re/) === '{}'
    rows = run_map("function(doc) { emit('k', /re/g); }", {})
    assert rows[0][1] == {}


def test_compiled_anchored_literal_rewrites(spark, sf_dir):
    """Anchored-literal regex idioms on TYPED tables compile to
    pushable startswith/endswith/contains/equality MapSpecs (no
    interpreter), and each compiled predicate equals the interpreted
    result."""
    from mapreduce_spark.engine import Engine
    from mapreduce_spark.functions.jscompile import compile_js_map
    from mapreduce_spark.operators.mapphase import MapSpec
    from mapreduce_spark.sources.docs import load_table

    schema = load_table(spark, sf_dir, "orders").schema
    cases = {
        "if (doc.o_orderpriority.match(/^1/)) { emit(doc._id, 1); }":
            "startswith",
        "if (doc.o_orderpriority.match(/URGENT$/)) { emit(doc._id, 1); }":
            "endswith",
        "if (/^2-HIGH$/.test(doc.o_orderpriority)) { emit(doc._id, 1); }":
            "=",
        "if (doc.o_orderpriority.match(/HI/) !== null) "
        "{ emit(doc._id, 1); }": "contains",
        # i-flag (round 8): compiles to an ASCII-folding rlike
        # instead of sinking the view to the interpreter tier
        "if (doc.o_orderpriority.match(/^1-urgent$/i)) "
        "{ emit(doc._id, 1); }": "RLIKE",
        "if (/high$/i.test(doc.o_orderpriority)) "
        "{ emit(doc._id, 1); }": "RLIKE",
        "if (doc.o_orderpriority.match(/urg/i) !== null) "
        "{ emit(doc._id, 1); }": "RLIKE",
    }
    eng = Engine(spark, sf_dir, None)
    for body, frag in cases.items():
        src = "function(doc) { %s }" % body
        spec = compile_js_map(src, "orders", schema)
        assert isinstance(spec, MapSpec), src
        assert frag in spec.where, (src, spec.where)
        compiled = {r["key"] for r in eng.query(
            {"map": spec, "reduce": None}, reduce=False).rows()}
        from mapreduce_spark.functions.jscompile import (
            compile_js_map_fn,
        )
        interp = {r["key"] for r in eng.query(
            {"map": ("orders", compile_js_map_fn(src)),
             "reduce": None}, reduce=False).rows()}
        assert compiled == interp and compiled, src


def test_non_literal_regex_falls_back(spark, sf_dir):
    from mapreduce_spark.functions.jscompile import (
        JSCompileError,
        compile_js_map,
    )
    from mapreduce_spark.sources.docs import load_table

    schema = load_table(spark, sf_dir, "orders").schema
    for body in (
        "if (doc.o_orderpriority.match(/^\\d/)) { emit(doc._id, 1); }",
        # g stays excluded even with a literal body: test() on a
        # g-regex is stateful (i compiles since round 8)
        "if (doc.o_orderpriority.match(/^a/g)) { emit(doc._id, 1); }",
        "emit(doc.o_orderpriority.match(/^1/), 1);",  # array position
    ):
        with pytest.raises(JSCompileError):
            compile_js_map("function(doc) { %s }" % body,
                           "orders", schema)


def test_regex_fuzz_compiled_vs_interpreter(spark, tmp_path):
    """Grammar fuzz over the regex-in-cond subset: random anchored
    patterns (literal and not), match/test idioms, negation,
    null-comparison — every source the COMPILER accepts must emit
    identically to the statement interpreter over a corner-rich
    corpus (nulls, empties, pattern-shaped values like 'null')."""
    import random

    from mapreduce_spark.functions.jscompile import (
        JSCompileError,
        compile_js_map,
    )
    from mapreduce_spark.functions.jsmap import compile_js_map_full
    from mapreduce_spark.operators.mapphase import map_docs_to_rows
    from mapreduce_spark.sources.docs import DocTable, register_table

    rows = [
        ("d0", "user:1", "Alpha"),
        ("d1", None, "beta$x"),
        ("d2", "", "null"),          # the ToString(null) trap value
        ("d3", "user:22", None),
        ("d4", "x^y", "ul"),
        ("d5", "nullable", "user:"),
        # unicode fold traps: KELVIN K (U+212A), dotless ı, İ, ſ —
        # i-flag folding must stay ASCII-only on BOTH tiers
        ("d6", "KKuser:İ", "ılſUL"),
    ]
    df = spark.createDataFrame(rows, "tk string, s string, t string")
    sf2 = str(tmp_path / "re")
    df.write.parquet(f"{sf2}/retab.parquet")
    register_table(DocTable("retab", "retab:%s", ("tk",),
                            "abs(hash(tk))"))

    rng = random.Random(20260814)
    lits = ["user:", "ul", "null", "x", "a$b", "1", ""]

    def pat():
        body = rng.choice(lits)
        if rng.random() < 0.25:
            body = "\\d" + body  # out of the literal subset
        pre = "^" if rng.random() < 0.5 else ""
        suf = "$" if rng.random() < 0.5 else ""
        r = rng.random()
        # u joined the subset in round 8 (bare-u anchored literals
        # COMPILE; everything else u runs interpreted) — fuzz both
        fl = "i" if r < 0.15 else "u" if r < 0.3 else ""
        return f"/{pre}{body}{suf}/{fl}"

    def cond():
        f = rng.choice(["s", "t"])
        form = rng.randint(0, 4)
        if form == 0:
            return f"doc.{f}.match({pat()})"
        if form == 1:
            return f"/{rng.choice(lits)}/.test(doc.{f})"
        if form == 2:
            return f"doc.{f}.match({pat()}) {rng.choice(['===', '!=='])} null"
        if form == 3:
            return f"!doc.{f}.match({pat()})"
        return (f"(doc.{f}.match({pat()}) && "
                f"doc.{rng.choice(['s', 't'])}.match({pat()}))")

    import pyspark.sql.functions as F

    compiled_n = 0
    for i in range(120):
        src = ("function(doc) { if (%s) { emit(doc.tk, 1); } }"
               % cond())
        try:
            spec = compile_js_map(src, "retab", df.schema)
        except JSCompileError:
            continue
        compiled_n += 1
        sel = df.filter(F.expr(spec.where)) if spec.where else df
        got = {r["tk"] for r in sel.select("tk").collect()}
        fn = compile_js_map_full(src)
        docs = [
            {"_id": tk, "tk": tk, "s": s, "t": t}
            for tk, s, t in rows
        ]
        want = {r["id"] for r in map_docs_to_rows(docs, fn)}
        assert got == want, (src, got, want)
    assert compiled_n >= 25  # the subset must actually exercise


def test_typed_table_regex_ddoc_end_to_end(spark, sf_dir, tmp_path):
    """A regex-filtering ddoc over a TYPED table runs on the
    interpreter tier and equals the plain-string-method formulation."""
    from mapreduce_spark.engine import Engine

    eng = Engine(spark, sf_dir, str(tmp_path / "v"))
    js = ("function(doc) { var m = doc.o_orderpriority"
          ".match(/^(\\d+)-/); if (m) "
          "{ emit(parseInt(m[1]), 1); } }")
    res = eng.query({"map": ("orders", js), "reduce": "_count"},
                    group=True)
    got = {r["key"]: r["value"] for r in res.rows()}
    js2 = ("function(doc) { var p = doc.o_orderpriority.split('-')[0];"
           " emit(parseInt(p), 1); }")
    res2 = eng.query({"map": ("orders", js2), "reduce": "_count"},
                     group=True)
    assert got == {r["key"]: r["value"] for r in res2.rows()}
    assert got and set(got) <= {1.0, 2.0, 3.0, 4.0, 5.0}


def test_line_terminator_semantics():
    """Round-7 review fixes: JS '.'/multiline anchors treat \\r and
    U+2028/U+2029 as line terminators; Python only \\n."""
    assert ev(r"/a.b/.test('a\rb')") is False       # JS: . excludes \r
    assert ev(r"/a.b/s.test('a\rb')") is True
    assert ev(r"/^b/m.test('a\rb')") is True        # anchor after \r
    assert ev(r"/a$/m.test('a\rb')") is True        # anchor before \r
    assert ev(r"/a.b/.test('a b')") is False
    assert ev(r"/^b/m.test('a b')") is True


def test_split_limit_coercion():
    # JS ToUint32: -1 wraps to 2^32-1 (no limit); NaN -> 0 -> []
    assert ev(r"'a,b,c'.split(/,/, -1)") == ["a", "b", "c"]
    assert ev(r"'a,b,c'.split(/,/, 0/0)") == []
    assert ev(r"'a,b,c'.split(/,/, '2')") == ["a", "b"]


def test_named_replacement_edge_cases():
    # no named captures at all: '$<x>' stays literal
    assert ev(r"'ab'.replace(/b/, '$<x>')") == "a$<x>"
    # named captures exist, name unknown: empty string
    assert ev(r"'ab'.replace(/(?<g>b)/, '[$<nope>]')") == "a[]"


def test_duplicate_sig_ddoc_builds(spark, sf_dir, tmp_path):
    """Two views naming the IDENTICAL definition share one signature;
    build_ddoc must not self-deadlock on the shared view lock."""
    from mapreduce_spark.engine import Engine
    from mapreduce_spark.operators.mapphase import MapSpec

    eng = Engine(spark, sf_dir, str(tmp_path / "dup"))
    v = {"map": MapSpec("nation", ("str", "n_name"), None),
         "reduce": "_count"}
    eng.put_design("dd", {"a": dict(v), "b": dict(v)})
    eng.build_ddoc("dd")
    a = eng.query("dd/a", stale="ok", group=True).rows()
    b = eng.query("dd/b", stale="ok", group=True).rows()
    assert a == b and len(a) == 25


def test_script_properties_round10():
    """u-mode \\p{Script=…}/\\p{sc=…} over the generated JDK
    UnicodeScript table — expected values are real ECMAScript answers
    (V8-checked; script assignments for these characters are stable
    across Unicode versions)."""
    assert ev(r"/^\p{Script=Han}+$/u.test('中文漢字')") is True
    assert ev(r"/\p{Script=Han}/u.test('の')") is False  # Hiragana
    assert ev(r"/^\p{Script=Hiragana}+$/u.test('ひらがな')") is True
    assert ev(r"/^\p{Script=Katakana}+$/u.test('カタカナ')") is True
    assert ev(r"/^\p{Script=Hangul}+$/u.test('한국어')") is True
    assert ev(r"/^\p{Script=Greek}+$/u.test('ελληνικά')") is True
    assert ev(r"/^\p{sc=Cyrl}+$/u.test('Москва')") is True
    assert ev(r"/^\p{Script=Arabic}+$/u.test('العربية')") is True
    assert ev(r"/^\p{Script=Hebrew}+$/u.test('עברית')") is True
    assert ev(r"/^\p{Script=Thai}+$/u.test('ไทย')") is True
    assert ev(r"/^\p{Script=Devanagari}+$/u.test('हिनदी')") is True
    assert ev(r"/^\p{Script=Latin}+$/u.test('abcÆz')") is True
    # digits / punctuation / space are Script=Common, not Latin
    assert ev(r"/\p{Script=Latin}/u.test('123! ')") is False
    assert ev(r"/^\p{Script=Common}$/u.test('!')") is True
    # combining marks are Inherited
    assert ev(r"/^\p{Script=Inherited}$/u.test('́')") is True
    # negated form + extraction over mixed-script text
    assert ev(r"/^\P{Script=Latin}$/u.test('中')") is True
    assert ev(r"'abc中def漢'.match(/\p{Script=Han}/gu)") == ["中", "漢"]
    # aliases are case-sensitive canonical forms, like real JS
    assert ev(r"/\p{sc=Hani}/u.test('中')") is True
    with pytest.raises(JSReduceError):
        translate(r"\p{Script=han}", "u")  # wrong case: loud
    with pytest.raises(JSReduceError):
        translate(r"\p{Script=Cherokee}", "u")  # outside the table
    # scx= resolves since round 11 — see test_script_extensions_round11
    assert ev(r"/\p{scx=Han}/u.test('中')") is True
    with pytest.raises(JSReduceError):
        translate(r"\p{Script=Han}", "")  # \p without u: identity


def test_script_ranges_fuzz_round10():
    """Differential check of the \\p{Script=…} machinery: regex
    membership (run through translate → re, the production path) must
    equal pointwise interval lookup in the generated RANGES table for
    random code points incl. astral — catches escaping/range-body
    bugs independently of the compiled class shape.  Data accuracy is
    pinned by the curated known-JS answers above; plus name-prefix
    spot oracles here for unambiguous families."""
    import random
    import unicodedata

    from mapreduce_spark.functions import _script_ranges as S
    from mapreduce_spark.functions.jsregex import JSRegExp

    U = object()
    rng = random.Random(0x1010)
    cps = []
    while len(cps) < 800:
        c = rng.randrange(0x110000)
        if not (0xD800 <= c <= 0xDFFF):
            cps.append(c)
    # bias: sample inside each script's ranges too
    for name, rs in S.RANGES.items():
        for _ in range(8):
            a, b = rs[rng.randrange(len(rs))]
            cps.append(rng.randint(a, b))
    s = "".join(map(chr, cps))
    for name, rs in S.RANGES.items():
        spellings = [name.title()] + [
            al.title() for al, lng in S.ALIASES.items() if lng == name
        ]
        pat = rng.choice(spellings)
        got = set(JSRegExp(f"\\p{{Script={pat}}}", "gu").match(s, U)
                  or [])
        want = {ch for ch in s
                if any(a <= ord(ch) <= b for a, b in rs)}
        assert got == want, (name, got ^ want)
    # name-prefix oracles: these Unicode name families map 1:1 to a
    # script, independent of the JDK dump
    han = set(JSRegExp(r"\p{Script=Han}", "gu").match(s, U) or [])
    hira = set(JSRegExp(r"\p{Script=Hiragana}", "gu").match(s, U) or [])
    hang = set(JSRegExp(r"\p{Script=Hangul}", "gu").match(s, U) or [])
    for ch in set(s):
        nm = unicodedata.name(ch, "")
        if nm.startswith("CJK UNIFIED IDEOGRAPH"):
            assert ch in han, hex(ord(ch))
        if nm.startswith("HIRAGANA LETTER"):
            assert ch in hira, hex(ord(ch))
        if nm.startswith("HANGUL SYLLABLE"):
            assert ch in hang, hex(ord(ch))


def test_script_extensions_round11():
    """\\p{Script_Extensions=…}/\\p{scx=…} (round 11, VERDICT r10
    #6) over the generated `regex`-package UCD table.  Expected
    values are real ECMAScript answers: scx ⊇ sc, and the shared
    punctuation/marks carry the extension sets sc= misses."""
    # U+30FC PROLONGED SOUND MARK: sc=Common, scx={Hira, Kana}
    assert ev(r"/\p{scx=Hiragana}/u.test('ー')") is True
    assert ev(r"/\p{scx=Katakana}/u.test('ー')") is True
    assert ev(r"/\p{Script=Hiragana}/u.test('ー')") is False
    assert ev(r"/\p{Script_Extensions=Hiragana}/u.test('ー')") is True
    # U+0964 DEVANAGARI DANDA is shared across the Indic scripts
    assert ev(r"/\p{scx=Bengali}/u.test('।')") is True
    assert ev(r"/\p{scx=Devanagari}/u.test('।')") is True
    assert ev(r"/\p{Script=Bengali}/u.test('।')") is False
    # scx ⊇ sc on plain letters
    assert ev(r"/^\p{scx=Latin}+$/u.test('abc')") is True
    assert ev(r"/^\p{scx=Han}+$/u.test('汉字')") is True
    # ISO aliases + negation + in-class forms work like Script=
    assert ev(r"/\p{scx=Hira}/u.test('ー')") is True
    assert ev(r"/^\P{scx=Latin}$/u.test('9')") is True
    assert ev(r"/^[\p{scx=Latin}\d]+$/u.test('ab12')") is True
    # outside the 28-script table / non-canonical case: loud
    with pytest.raises(JSReduceError):
        translate(r"\p{scx=Ogham}", "u")
    with pytest.raises(JSReduceError):
        translate(r"\p{scx=hiragana}", "u")
    with pytest.raises(JSReduceError):
        translate(r"\p{Script_Extensions=HIRAGANA}", "u")


def test_scx_superset_of_script_fuzz_round11():
    """Property check over the two generated tables: for every
    script, the scx set contains the sc set (UCD invariant), modulo
    the handful of code points newly assigned between the JDK-17
    (Unicode 13) and regex-package UCD snapshots — those may appear
    in scx only, never the reverse direction in bulk."""
    from mapreduce_spark.functions import _script_ranges as S
    from mapreduce_spark.functions import _scx_ranges as X

    for name, sc in S.RANGES.items():
        if name in ("COMMON", "INHERITED"):
            # scx=Common/Inherited are the chars with NO extensions —
            # strictly smaller than sc=, by definition
            continue
        scx = X.SCX_RANGES[name]

        def member(cp, rs):
            return any(a <= cp <= b for a, b in rs)

        missing = [
            cp
            for a, b in sc
            for cp in range(a, min(b, a + 500) + 1)
            if not member(cp, scx)
        ]
        assert not missing, (name, [hex(c) for c in missing[:5]])


def test_scx_differential_fuzz_round11():
    """Differential check of \\p{scx=…} against the `regex` package —
    an INDEPENDENT oracle: the generated table was dumped from
    regex's UCD data, but the production path here goes through
    translate → range-class rendering → Python re, so a mismatch
    catches generator truncation, merging or escaping bugs.  Random
    code points including astral + every range boundary of three
    scripts."""
    import random

    _rx = pytest.importorskip(
        "regex"
    )  # optional: only the table GENERATOR needs it, not the library

    from mapreduce_spark.functions import _scx_ranges as X
    from mapreduce_spark.functions.jsregex import JSRegExp

    rng = random.Random(20260815)
    U = object()
    names = ["HIRAGANA", "KATAKANA", "BENGALI", "LATIN", "HAN",
             "ARABIC", "CYRILLIC", "DEVANAGARI"]
    cps = [rng.randint(0, 0x10FFFF) for _ in range(400)]
    # surrogates are not valid re targets — skip them like real text
    cps = [c for c in cps if not (0xD800 <= c <= 0xDFFF)]
    for name in names:
        for lo, hi in X.SCX_RANGES[name][:40]:
            cps += [lo, hi, max(0, lo - 1), min(0x10FFFF, hi + 1)]
    cps = sorted({c for c in cps if not (0xD800 <= c <= 0xDFFF)})
    for name in names:
        ours = JSRegExp(f"\\p{{scx={name.title()}}}", "u")
        oracle = _rx.compile(rf"\p{{scx={name}}}")
        bad = [
            hex(cp) for cp in cps
            if ours.test(chr(cp), U) != bool(oracle.match(chr(cp)))
        ]
        assert not bad, (name, bad[:8])


def test_v_flag_class_free_subset_round10():
    """ES2024 `v` (unicodeSets): every v-vs-u divergence lives in
    class syntax, so CLASS-FREE v patterns run with u semantics
    (round 10); classes, \\q{…} and the u+v combination stay loud.
    Expected values are real ECMAScript answers."""
    from mapreduce_spark.functions.jsreduce import JSRuntimeThrow

    assert ev(r"/^\d+$/v.test('42')") is True
    assert ev(r"/^\p{Script=Han}+$/v.test('汉字')") is True
    assert ev(r"/^\p{L}$/v.test('é')") is True
    assert ev(r"/\u{1F600}/v.test('😀')") is True
    assert ev(r"/a/v.unicodeSets") is True
    assert ev(r"/a/u.unicodeSets") is False
    assert ev(r"/a/v.unicode") is False
    assert ev(r"/a/v.flags") == "v"
    with pytest.raises(JSReduceError):
        translate(r"[\p{L}]", "v")   # any class stays loud under v
    with pytest.raises(JSReduceError):
        translate(r"\q{abc}", "v")
    with pytest.raises(JSRuntimeThrow):
        translate("a", "uv")         # real JS SyntaxError


def test_d_flag_indices_round10():
    """The d (hasIndices) flag: match results carry per-group
    [start, end] spans; undefined for non-participating groups and
    without the flag.  Expected values are real ECMAScript answers."""
    assert ev(r"/(\d+)-(\d+)/d.exec('a12-34').indices[0]") == [1, 6]
    assert ev(r"/(\d+)-(\d+)/d.exec('a12-34').indices[1]") == [1, 3]
    assert ev(r"/(\d+)-(\d+)/d.exec('a12-34').indices[2]") == [4, 6]
    # without d, .indices is undefined (emitted as null)
    assert ev(r"/(\d+)/.exec('a12').indices") is None
    # non-participating group -> undefined entry
    assert ev(r"/(a)|(b)/d.exec('xa').indices[2]") is None
    assert ev(r"/(a)|(b)/d.exec('xa').indices[1]") == [1, 2]
    assert ev(r"/a/d.hasIndices") is True
    assert ev(r"/a/.hasIndices") is False
    assert ev(r"/a/dg.flags") == "dg"
    # d composes with g statefulness and with u
    assert ev(
        "(function(){ var re = /\\d/dg; re.exec('a1b2');"
        " return re.exec('a1b2').indices[0]; })()"
    ) == [3, 4]
    assert ev(r"/\p{L}/du.exec('9é').indices[0]") == [1, 2]
    # named groups + d stay loud (.indices.groups is an object there)
    with pytest.raises(JSReduceError):
        translate(r"(?<y>\d)", "d")
    # lookbehind is not a named group — still admitted
    assert ev(r"/(?<=a)b/d.exec('ab').indices[0]") == [1, 2]
    # matchAll results carry indices too
    assert ev(r"'a1b2'.matchAll(/\d/dg)[1].indices[0]") == [3, 4]
    # String.prototype.match with a NON-global d regex (ADVICE r10):
    # one RegExpExec, so the result carries indices exactly like exec
    assert ev(r"'a12'.match(/(\d+)/d).indices[0]") == [1, 3]
    assert ev(r"'a12'.match(/(\d+)/d).indices[1]") == [1, 3]
    assert ev(r"'a12'.match(/(\d+)/).indices") is None
    # ... and the non-global STICKY path (delegates to exec)
    assert ev(r"'12a'.match(/(\d+)/dy).indices[1]") == [0, 2]


def test_empty_property_class_round11():
    """A property class that expands to the empty set is VALID
    never-matching JS (ADVICE r10 low): [\\P{Any}] must compile and
    match nothing; [^\\P{Any}] matches everything; members beside the
    empty expansion behave as their union."""
    assert ev(r"/[\P{Any}]/u.test('x')") is False
    assert ev(r"/[\P{Any}]/u.test('\u0000')") is False
    assert ev(r"/[^\P{Any}]/u.test('x')") is True
    assert ev(r"/[\P{Any}x]/u.test('x')") is True
    assert ev(r"/[\P{Any}x]/u.test('y')") is False
    # outside a class: \P{Any} never matches, \p{Any} always does
    assert ev(r"/\P{Any}/u.test('x')") is False
    assert ev(r"/\p{Any}/u.test('x')") is True
