"""Compile CouchDB/PouchDB JS map-function source into MapSpec(s).

Upstream design documents define views as JavaScript source strings
(``[U pouchdb-abstract-mapreduce#evalFunc]``, SURVEY.md §2 F1) — every
real CouchDB/PouchDB ddoc is a JS string.  This engine's structured
fast path is the declarative ``MapSpec``; this module compiles the
design-doc subset that covers the overwhelmingly common emit patterns
straight to MapSpec, so a JS-defined view runs fully JVM-side with
predicate pushdown — no JS engine anywhere:

    function (doc) {
      if (doc.status === 'open' && doc.total > 1000) {
        emit([doc.priority, doc.created], doc.total);
      }
      if (doc.status !== 'open') emit(['closed', doc.id], 1);
    }

Supported subset (each maps 1:1 onto a MapSpec capability):

- flat doc field references: ``doc.f`` / ``doc["f"]`` / ``doc._id``;
- literal keys/values: numbers, strings, ``true``/``false``/``null``;
- array keys (``emit([a, b], …)``) and numeric array values;
- linked-document values ``{_id: doc.f}`` (J2);
- guarded emits: ``if``/``else`` (and ``else if`` chains) with
  ``=== == !== != < <= > >=``, ``&&``, ``||``, ``!``, truthiness
  tests, nested ifs; guards (and negated else-guards) compile into
  ``MapSpec.where`` so Catalyst pushes them into the parquet scan;
- arithmetic ``+ - * / %`` on same-kind operands (JS null→0 coercion
  compiled as ``coalesce``; string ``+`` concat with null→``'null'``;
  ``/`` and ``%`` compiled to TRUE IEEE-754 semantics — x/0 → ±Inf,
  0/0 → NaN, x%0 → NaN, x%±Inf → x — with non-finites CARRIED through
  further arithmetic like JS doubles (x / Infinity is 0, not null)
  and folded to JSON null only at the emit boundary, exactly where
  JSON.stringify folds them);
- string methods ``.substring/.slice`` (literal non-negative offsets),
  ``.toLowerCase/.toUpperCase``, ``.indexOf`` (literal needle;
  ``instr()-1``, with the ``=== 0`` / ``>= 0`` / ``=== -1`` idioms
  rewritten to pushable ``startswith``/``contains`` predicates — the
  canonical ``doc._id.indexOf('user:') === 0`` type-scoping guard
  prunes at the scan) and ES6 ``.startsWith/.endsWith/.includes`` —
  a method call on a null field compiles to a ``IS NOT NULL`` guard,
  reproducing upstream tryMap's throw→skip semantics;
- ``doc.f.length`` on string fields (null receiver → NOT NULL guard,
  same throw→skip rule) and ``Math.floor/ceil/abs/sqrt/round/pow``
  (JS ``Math.round`` half-up-toward-+∞ compiled as
  ``floor(x + 0.5)``; sqrt(neg)/pow corners carry real IEEE
  NaN/Infinity).  In GUARD comparisons an Infinity operand compares
  natively like JS; a NaN operand is nulled out (``nanvl``) because
  Spark orders NaN greatest where JS compares it false — both tiers
  agree on every comparison outcome;
- the conditional operator ``c ? a : b`` in keys and values
  (``CASE WHEN``; same-kind branches; branch throw-guards gated on
  the condition — JS evaluates only the taken branch);
- ``log(...)`` calls (upstream sandbox global) parsed and discarded;
- multiple emits (one MapSpec per emit, unioned with emit ordinals).

Anything outside the subset raises :class:`JSCompileError` naming the
construct and its position — the deliberate fallback contract: express
that view as a Python map fn (the generic path) instead of silently
mis-compiling.  Loops, variable bindings, general function calls, and
nested doc paths are out of the subset.
"""

from __future__ import annotations

import math
import re
from typing import Any

from mapreduce_spark.errors import QueryParseError


class JSCompileError(QueryParseError):
    """JS source uses a construct outside the compilable subset."""


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+|//[^\n]*|/\*.*?\*/)
  | (?P<num>\d+(?:\.\d+)?(?:[eE][+-]?\d+)?)
  | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<ident>[A-Za-z_$][A-Za-z0-9_$]*)
  | (?P<punct>===|!==|==|!=|<=|>=|&&|\|\||[-+*/%(){}\[\],;.:<>!=?])
    """,
    re.VERBOSE | re.DOTALL,
)


def _tokenize(src: str) -> list[tuple[str, str, int]]:
    out, pos = [], 0
    while pos < len(src):
        if src[pos] == "/" and src[pos + 1:pos + 2] not in ("/", "*"):
            # regex literal vs division: same lexer heuristic as the
            # statement interpreter (jsreduce), shared helpers
            from mapreduce_spark.functions.jsreduce import (
                JSReduceError,
                _lex_regex,
                _regex_allowed,
            )

            if _regex_allowed(out[-1] if out else None):
                try:
                    tok, end = _lex_regex(src, pos)
                except JSReduceError as ex:
                    raise JSCompileError(str(ex)) from None
                out.append(("regex", tok, pos))
                pos = end
                continue
        m = _TOKEN_RE.match(src, pos)
        if m is None:
            raise JSCompileError(
                f"unrecognized character {src[pos]!r} at offset {pos}"
            )
        pos = m.end()
        if m.lastgroup != "ws":
            out.append((m.lastgroup, m.group(), m.start()))
    return out


_ESCAPES = {"n": "\n", "t": "\t", "r": "\r", "b": "\b", "f": "\f",
            "v": "\v", "0": "\0"}


def _unquote(tok: str) -> str:
    """Decode a JS string literal: standard escapes (\\n, \\t, \\r,
    \\b, \\f, \\v, \\0, \\uXXXX, \\xNN) decode to their characters;
    any other escaped character (\\\\, \\', \\", \\/ …) is itself."""
    body = tok[1:-1]
    out: list[str] = []
    i = 0
    try:
        while i < len(body):
            c = body[i]
            if c != "\\":
                out.append(c)
                i += 1
                continue
            e = body[i + 1]  # tokenizer guarantees a char after '\'
            if e == "u":
                out.append(chr(int(body[i + 2:i + 6], 16)))
                i += 6
            elif e == "x":
                out.append(chr(int(body[i + 2:i + 4], 16)))
                i += 4
            else:
                out.append(_ESCAPES.get(e, e))
                i += 2
    except (ValueError, IndexError):
        raise JSCompileError(
            f"malformed escape sequence in string literal {tok}"
        ) from None
    return "".join(out)


class _Parser:
    """Recursive-descent parser for the map-fn subset → emit list.

    Produces ``[(guards, key_ast, value_ast), …]`` where guards is the
    conjunction (list) of enclosing if-conditions and ASTs are tuples:
    ``('lit', v) | ('doc', field) | ('arr', [ast]) | ('obj', {k: ast})``
    and conditions ``('cmp', op, l, r) | ('and'|'or', l, r) |
    ('not', c) | ('truthy', ast)``.
    """

    def __init__(self, src: str) -> None:
        self.toks = _tokenize(src)
        self.i = 0
        # inside a forEach callback: (param_name, array_field, serial)
        self._elem: tuple[str, str, int] | None = None
        # inside a compiled C-style for body: (index_var, field, serial)
        self._idx: tuple[str, str, int] | None = None
        # inside a compiled for-in body: (key_var, field, serial)
        self._inkey: tuple[str, str, int] | None = None
        # inside Object.entries(doc.f).forEach(function (e) {…}):
        # (pair_var, field, serial) — e[0] is the key, e[1] the value
        self._entry: tuple[str, str, int] | None = None
        # single-assignment local aliases (round 11): `var v = expr;`
        # binds v to the parsed expression node; later uses substitute
        # it (sound: subset expressions are pure).  Block-scoped
        # conservatively — a var bound inside an if-arm or loop body
        # is forgotten at the block's end, so the conditionally-
        # assigned / out-of-explode-scope cases fall to the
        # interpreter instead of compiling wrong.
        self._aliases: dict[str, Any] = {}
        self._foreach_serial = 0

    def _in_loop(self) -> bool:
        return (self._elem is not None or self._idx is not None
                or self._inkey is not None or self._entry is not None)

    def _bound_names(self) -> set[str]:
        out = set(self._aliases)
        for b in (self._elem, self._idx, self._inkey, self._entry):
            if b is not None:
                out.add(b[0])
        return out

    # -- token helpers --------------------------------------------------
    def _peek(self) -> tuple[str, str, int]:
        if self.i >= len(self.toks):
            raise JSCompileError("unexpected end of map function source")
        return self.toks[self.i]

    def _next(self) -> tuple[str, str, int]:
        t = self._peek()
        self.i += 1
        return t

    def _expect(self, text: str) -> None:
        kind, tok, off = self._next()
        if tok != text:
            raise JSCompileError(
                f"expected {text!r} but found {tok!r} at offset {off}"
            )

    def _at(self, text: str) -> bool:
        return self.i < len(self.toks) and self.toks[self.i][1] == text

    def _eat(self, text: str) -> bool:
        if self._at(text):
            self.i += 1
            return True
        return False

    # -- grammar --------------------------------------------------------
    def parse(self) -> list[tuple[list, Any, Any]]:
        self._expect("function")
        if self._peek()[0] == "ident" and not self._at("("):
            self._next()  # optional function name
        self._expect("(")
        while not self._eat(")"):
            self._next()  # parameter names (doc[, meta])
        self._expect("{")
        emits: list[tuple[list, Any, Any]] = []
        self._stmts(emits, guards=[], end="}")
        return emits

    def _stmts(self, emits: list, guards: list, end: str) -> None:
        while not self._eat(end):
            self._stmt(emits, guards)

    def _scoped_stmts(self, emits: list, guards: list,
                      end: str) -> None:
        """Block body: aliases declared inside are forgotten at the
        end (see ``_aliases``)."""
        saved = dict(self._aliases)
        try:
            self._stmts(emits, guards, end)
        finally:
            self._aliases = saved

    def _scoped_stmt(self, emits: list, guards: list) -> None:
        saved = dict(self._aliases)
        try:
            self._stmt(emits, guards)
        finally:
            self._aliases = saved

    def _stmt(self, emits: list, guards: list) -> None:
        if self._eat(";"):
            return
        kind, tok, off = self._peek()
        if tok in ("var", "let", "const"):
            # single-assignment local alias(es): `var v = expr, w = …;`
            # — substitution is sound because subset expressions are
            # pure; anything mutated later fails compile (a bare
            # `v = …` statement is outside the grammar) and runs on
            # the interpreter
            self._next()
            while True:
                k2, name, o2 = self._next()
                if k2 != "ident" or name in ("doc", "emit", "log"):
                    raise JSCompileError(
                        f"unsupported declaration target at offset "
                        f"{o2}"
                    )
                if name in self._bound_names():
                    raise JSCompileError(
                        f"redeclaration of {name!r} at offset {o2} is "
                        "outside the compiled subset; the interpreter "
                        "tier runs it"
                    )
                if not self._eat("="):
                    raise JSCompileError(
                        f"uninitialized declaration of {name!r} is "
                        "outside the compiled subset (undefined-until-"
                        "assigned); the interpreter tier runs it"
                    )
                self._aliases[name] = self._expr()
                if not self._eat(","):
                    break
            self._eat(";")
            return
        if tok == "emit":
            self._next()
            self._expect("(")
            key = self._expr()
            value = self._expr() if self._eat(",") else ("lit", None)
            self._expect(")")
            self._eat(";")
            emits.append((list(guards), key, value))
            return
        if tok == "if":
            self._next()
            self._expect("(")
            cond = self._cond()
            self._expect(")")
            inner = guards + [cond]
            if self._eat("{"):
                self._scoped_stmts(emits, inner, end="}")
            else:
                self._scoped_stmt(emits, inner)
            if self._eat("else"):
                # else ≡ the negated guard; an `else if` chain recurses
                # through this same statement handler naturally
                neg = guards + [("not", cond)]
                if self._eat("{"):
                    self._scoped_stmts(emits, neg, end="}")
                else:
                    self._scoped_stmt(emits, neg)
            return
        if tok == "log":
            # upstream sandbox global (F1): debugging output, no
            # effect on the view — parse and discard the balanced call
            self._next()
            self._expect("(")
            depth = 1
            while depth:
                _k, t, _o = self._next()
                if t == "(":
                    depth += 1
                elif t == ")":
                    depth -= 1
            self._eat(";")
            return
        if tok == "for":
            self._next()
            self._parse_for(emits, guards)
            return
        if tok == "doc":
            # doc.f.forEach(function (x) { … }) — the canonical
            # array-emit ddoc (tag index).  Emits parsed inside the
            # callback carry a ('foreach', field, serial) marker in
            # their guard list at the position the loop opened;
            # element references parse as ('elem', field) nodes.
            self._next()
            parts = self._field_path(off)
            field = ".".join(parts)
            self._expect(".")
            _k2, m, moff = self._next()
            if m != "forEach":
                raise JSCompileError(
                    f"statement-level doc.{field}.{m} at offset "
                    f"{moff} is outside the compiled subset (only "
                    ".forEach(function (x) {…}) compiles)"
                )
            if self._in_loop():
                raise JSCompileError(
                    "nested loops are outside the compiled subset"
                )
            self._expect("(")
            self._expect("function")
            if self._peek()[0] == "ident" and not self._at("("):
                self._next()  # optional callback name
            self._expect("(")
            params = []
            while not self._eat(")"):
                k3, p, _o3 = self._next()
                if k3 == "ident":
                    params.append(p)
                self._eat(",")
            if len(params) != 1:
                raise JSCompileError(
                    "forEach callbacks with index/array parameters "
                    "are outside the compiled subset"
                )
            self._expect("{")
            serial = self._foreach_serial
            self._foreach_serial += 1
            self._elem = (params[0], field, serial)
            try:
                self._scoped_stmts(
                    emits,
                    guards + [("foreach", field, serial)],
                    end="}",
                )
            finally:
                self._elem = None
            self._expect(")")
            self._eat(";")
            return
        if tok == "Object":
            # Object.keys(doc.f).forEach(function (k) { … }) — the
            # modern spelling of the for-in idiom: same key space,
            # same ES enumeration order, so it compiles to the SAME
            # ('forin', field, serial) object-entry explode.  The one
            # semantic difference — Object.keys(null) THROWS where
            # for-in iterates zero times — is unobservable in the
            # compiled output: every emit site lives inside the loop,
            # so the doc contributes zero rows either way.
            self._next()
            self._expect(".")
            _k2, m, moff = self._next()
            if m not in ("keys", "entries") or not self._eat("("):
                raise JSCompileError(
                    f"statement-level Object.{m} at offset {moff} is "
                    "outside the compiled subset (only Object.keys/"
                    "Object.entries(doc.<f>).forEach(function (…) "
                    "{…}) compile)"
                )
            _k3, d, o3 = self._next()
            if d != "doc":
                raise JSCompileError(
                    f"Object.keys target at offset {o3} is not a doc "
                    "field; the interpreter tier runs it"
                )
            parts = self._field_path(o3)
            if not parts:
                raise JSCompileError(
                    "Object.keys over the whole doc is outside the "
                    "compiled subset; the interpreter tier runs it"
                )
            field = ".".join(parts)
            self._expect(")")
            self._expect(".")
            _k4, m2, m2off = self._next()
            if m2 != "forEach":
                raise JSCompileError(
                    f"Object.keys(doc.{field}).{m2} at offset "
                    f"{m2off} is outside the compiled subset as a "
                    "statement (only .forEach(function (k) {…}) "
                    "compiles)"
                )
            if self._in_loop():
                raise JSCompileError(
                    "nested loops are outside the compiled subset"
                )
            self._expect("(")
            self._expect("function")
            if self._peek()[0] == "ident" and not self._at("("):
                self._next()  # optional callback name
            self._expect("(")
            serial = self._foreach_serial
            self._foreach_serial += 1
            entry_alias = None
            if m == "entries" and self._at("["):
                # destructured pair: function ([k, v]) {…} — k is the
                # object-entry key, v the value (an alias on the
                # existing elem node; same lowering as doc.f[k])
                self.i += 1
                k5, kn, o5 = self._next()
                self._expect(",")
                k6, vn, o6 = self._next()
                self._expect("]")
                self._expect(")")
                if (k5 != "ident" or k6 != "ident" or kn == vn
                        or {kn, vn} & {"doc", "emit", "log"}):
                    raise JSCompileError(
                        f"unsupported entries destructuring at offset "
                        f"{o5}"
                    )
                self._inkey = (kn, field, serial)
                entry_alias = vn
            else:
                params = []
                while not self._eat(")"):
                    k5, p, _o5 = self._next()
                    if k5 == "ident":
                        params.append(p)
                    self._eat(",")
                if len(params) != 1:
                    raise JSCompileError(
                        f"Object.{m}().forEach callbacks with index/"
                        "array parameters are outside the compiled "
                        "subset"
                    )
                if m == "entries":
                    self._entry = (params[0], field, serial)
                else:
                    self._inkey = (params[0], field, serial)
            self._expect("{")
            saved_alias = dict(self._aliases)
            if entry_alias is not None:
                self._aliases[entry_alias] = ("elem", field)
            try:
                self._stmts(
                    emits,
                    # 'throw' tag: Object.keys/entries(null) THROWS
                    # (tryMap doc skip) where bare for-in iterates
                    # zero times — same compiled rows, but the Python
                    # mark executor honors the distinction
                    guards + [("forin", field, serial, "throw")],
                    end="}",
                )
            finally:
                self._inkey = None
                self._entry = None
                self._aliases = saved_alias
            self._expect(")")
            self._eat(";")
            return
        raise JSCompileError(
            f"unsupported construct {tok!r} at offset {off} — the "
            "compilable subset is emit(...), if/else guards and log(); "
            "use a Python map function for anything else"
        )

    def _parse_for(self, emits: list, guards: list) -> None:
        """``for (var i = 0; i < doc.f.length; i++) { … }`` — the
        pre-ES5 array-emit idiom, compiled to the same posexplode
        shape as ``.forEach()``.  The compiled pattern is strict
        (init 0; bound ``i < doc.f.length`` or ``doc.f.length > i``;
        step ``i++``/``++i``/``i += 1``/``i = i + 1``; braced body;
        no index mutation inside) — anything looser raises and runs
        on the statement interpreter (functions/jsmap.py), which
        executes arbitrary C-style loops.  Inside the body, bare
        ``i`` parses as ('epos',) (the posexplode position) and
        ``doc.f[i]`` as ('elem', f); indexing any OTHER array with
        ``i`` rejects the compile."""
        if self._in_loop():
            raise JSCompileError(
                "nested loops are outside the compiled subset"
            )
        self._expect("(")
        if self._peek()[1] in ("var", "let"):
            self._next()
        k, ivar, o = self._next()
        if k != "ident" or ivar in ("doc", "emit", "log"):
            raise JSCompileError(
                f"unsupported for-loop index variable at offset {o}"
            )
        if self._peek()[1] == "in":
            # for (var k in doc.f) { … } — object-key enumeration,
            # compiled to an object-entry explode (jsvariant
            # forin_object_sql); `k` parses as ('ekey',), `doc.f[k]`
            # as ('elem', f).  The emit-order soundness condition
            # (bare `k` must be a key component) is enforced at
            # lowering, where the emitted keys are visible.
            self._next()
            _k2, d, o2 = self._next()
            if d != "doc":
                raise JSCompileError(
                    f"for-in target at offset {o2} is not a doc "
                    "field; the interpreter tier runs it"
                )
            parts = self._field_path(o2)
            if not parts:
                raise JSCompileError(
                    "for-in over the whole doc is outside the "
                    "compiled subset; the interpreter tier runs it"
                )
            field = ".".join(parts)
            self._expect(")")
            self._expect("{")
            serial = self._foreach_serial
            self._foreach_serial += 1
            self._inkey = (ivar, field, serial)
            try:
                self._scoped_stmts(
                    emits, guards + [("forin", field, serial)],
                    end="}",
                )
            finally:
                self._inkey = None
            self._eat(";")
            return
        self._expect("=")
        k, z, o = self._next()
        if k != "num" or float(z) != 0:
            raise JSCompileError(
                "for-loops must start at index 0 to compile; the "
                "interpreter tier runs other bounds"
            )
        self._expect(";")
        k, t, o = self._peek()
        if t == ivar:  # i < doc.f.length
            self._next()
            self._expect("<")
            k2, d, o2 = self._next()
            if d != "doc":
                raise JSCompileError(
                    f"for-loop bound at offset {o2} is not a doc "
                    "array length; the interpreter tier runs it"
                )
            parts = self._field_path(o2)
        elif t == "doc":  # doc.f.length > i
            self._next()
            parts = self._field_path(o)
            self._expect(">")
            k2, v2, o2 = self._next()
            if v2 != ivar:
                raise JSCompileError(
                    f"for-loop bound at offset {o2} does not test "
                    "the loop index; the interpreter tier runs it"
                )
        else:
            raise JSCompileError(
                f"for-loop bound at offset {o} is outside the "
                "compiled subset (i < doc.f.length only)"
            )
        if len(parts) < 2 or parts[-1] != "length":
            raise JSCompileError(
                "for-loop bounds must be doc.<field>.length to "
                "compile; the interpreter tier runs other bounds"
            )
        field = ".".join(parts[:-1])
        self._expect(";")
        nxt = [self.toks[self.i + j][1]
               if self.i + j < len(self.toks) else None
               for j in range(5)]
        if nxt[:3] == [ivar, "+", "+"] or nxt[:3] == ["+", "+", ivar]:
            self.i += 3
        elif nxt[:4] == [ivar, "+", "=", "1"]:
            self.i += 4
        elif nxt[:5] == [ivar, "=", ivar, "+", "1"]:
            self.i += 5
        else:
            raise JSCompileError(
                "only i++ / ++i / i += 1 / i = i + 1 for-loop steps "
                "compile; the interpreter tier runs other steps"
            )
        self._expect(")")
        self._expect("{")
        serial = self._foreach_serial
        self._foreach_serial += 1
        self._idx = (ivar, field, serial)
        try:
            self._scoped_stmts(
                emits, guards + [("forloop", field, serial)], end="}"
            )
        finally:
            self._idx = None
        self._eat(";")

    def _cond(self) -> Any:
        left = self._and()
        while self._eat("||"):
            left = ("or", left, self._and())
        return left

    def _and(self) -> Any:
        left = self._cmp()
        while self._eat("&&"):
            left = ("and", left, self._cmp())
        return left

    def _cmp(self) -> Any:
        if self._eat("!"):
            return ("not", self._cmp())
        if self._eat("("):
            c = self._cond()
            self._expect(")")
            return c
        left = self._add_expr()
        if self._peek()[1] in ("===", "==", "!==", "!=", "<=", ">=",
                               "<", ">"):
            op = self._next()[1]
            return ("cmp", op, left, self._add_expr())
        return ("truthy", left)

    def _expr(self) -> Any:
        """Value expression, with the JS conditional operator: first
        tries ``<condition> ? <expr> : <expr>`` (backtracking when no
        ``?`` follows — conditions and value expressions share their
        additive prefix).  Comparison OPERANDS parse via ``_add_expr``
        to keep the grammar finite; nested/chained ternaries associate
        right like JS."""
        save = self.i
        try:
            cond = self._cond()
            if self._at("?"):
                self._next()
                t = self._expr()
                self._expect(":")
                f = self._expr()
                return ("ternary", cond, t, f)
        except JSCompileError:
            pass
        self.i = save
        return self._add_expr()

    def _add_expr(self) -> Any:
        """Additive expression: primary/method chains joined by
        ``+``/``-`` over multiplicative ``*``/``/``/``%`` chains."""
        left = self._mul()
        while self.i < len(self.toks) and self.toks[self.i][1] in (
            "+", "-",
        ):
            op = self._next()[1]
            left = ("bin", op, left, self._mul())
        return left

    def _mul(self) -> Any:
        left = self._postfix()
        while self.i < len(self.toks) and self.toks[self.i][1] in (
            "*", "/", "%",
        ):
            op = self._next()[1]
            left = ("bin", op, left, self._postfix())
        return left

    def _postfix(self) -> Any:
        e = self._primary()
        # method calls on doc fields / computed strings:
        # .substring/.slice/.toLowerCase/.toUpperCase
        while (
            self._at(".")
            and self.i + 1 < len(self.toks)
            and self.toks[self.i + 1][0] == "ident"
            and self.i + 2 < len(self.toks)
            and self.toks[self.i + 2][1] == "("
        ):
            self._next()  # .
            _k, name, off = self._next()
            self._next()  # (
            args = []
            while not self._eat(")"):
                args.append(self._expr())
                self._eat(",")
            e = ("method", e, name, args)
        return e

    def _primary(self) -> Any:
        kind, tok, off = self._next()
        if kind == "num":
            return ("lit", float(tok) if "." in tok or "e" in tok.lower()
                    else int(tok))
        if tok == "-" and self.i < len(self.toks) \
                and self.toks[self.i][0] == "num":
            _k, n, _o = self._next()
            return ("lit", -(float(n) if "." in n or "e" in n.lower()
                             else int(n)))
        if kind == "str":
            return ("lit", _unquote(tok))
        if kind == "regex":
            body, _, flags = tok[1:].rpartition("/")
            return ("regexlit", body, flags)
        if kind == "ident":
            if tok == "null":
                return ("lit", None)
            if tok == "true":
                return ("lit", True)
            if tok == "false":
                return ("lit", False)
            if self._elem is not None and tok == self._elem[0]:
                # forEach callback parameter: the current array element
                return ("elem", self._elem[1])
            if self._idx is not None and tok == self._idx[0]:
                # for-loop index variable: the posexplode position
                return ("epos",)
            if self._inkey is not None and tok == self._inkey[0]:
                # for-in loop variable: the object-entry key string
                return ("ekey",)
            if self._entry is not None and tok == self._entry[0]:
                # Object.entries pair param: only e[0] (key) and e[1]
                # (value) are in the subset — the bare pair (an array
                # value) would need a compiled 2-element array of
                # mixed provenance, which no ddoc in the corpus uses
                if not self._at("["):
                    raise JSCompileError(
                        f"bare use of the entries pair "
                        f"{self._entry[0]!r} is outside the compiled "
                        "subset (only [0]/[1] indexing); the "
                        "interpreter tier runs it"
                    )
                self.i += 1
                k2, idx, o2 = self._next()
                if k2 != "num" or float(idx) not in (0.0, 1.0):
                    raise JSCompileError(
                        f"entries pair index at offset {o2} must be "
                        "the literal 0 or 1; the interpreter tier "
                        "runs it"
                    )
                self._expect("]")
                return (("ekey",) if float(idx) == 0.0
                        else ("elem", self._entry[1]))
            if tok in self._aliases:
                # single-assignment local: substitute the bound node
                return self._aliases[tok]
            if tok == "doc":
                parts = self._field_path(off)
                if (
                    self._inkey is not None
                    and self._at("[")
                    and self.i + 1 < len(self.toks)
                    and self.toks[self.i + 1][1] == self._inkey[0]
                    and self.i + 2 < len(self.toks)
                    and self.toks[self.i + 2][1] == "]"
                ):
                    # doc.f[k] under the compiled for-in: the current
                    # entry value — only of the object the loop
                    # enumerates
                    if ".".join(parts) != self._inkey[1]:
                        raise JSCompileError(
                            f"doc.{'.'.join(parts)}"
                            f"[{self._inkey[0]}] indexes a different "
                            "object than the for-in target "
                            f"doc.{self._inkey[1]} — outside the "
                            "compiled subset; the interpreter tier "
                            "runs it"
                        )
                    self.i += 3
                    return ("elem", self._inkey[1])
                if (
                    self._idx is not None
                    and self._at("[")
                    and self.i + 1 < len(self.toks)
                    and self.toks[self.i + 1][1] == self._idx[0]
                    and self.i + 2 < len(self.toks)
                    and self.toks[self.i + 2][1] == "]"
                ):
                    # doc.f[i] under the compiled for-loop: the
                    # current element — only of the array the loop
                    # is bounded by
                    if ".".join(parts) != self._idx[1]:
                        raise JSCompileError(
                            f"doc.{'.'.join(parts)}[{self._idx[0]}] "
                            "indexes a different array than the "
                            f"loop bound doc.{self._idx[1]} — "
                            "outside the compiled subset; the "
                            "interpreter tier runs it"
                        )
                    self.i += 3
                    return ("elem", self._idx[1])
                if len(parts) >= 2 and parts[-1] == "length":
                    # string length property (JS .length)
                    return ("strlen", ".".join(parts[:-1]))
                # nested paths carry as a dotted name: the typed
                # compiler rejects them (flat parquet columns), the
                # variant compiler (raw JSON docs) maps them to a
                # '$.a.b' extraction path
                return ("doc", ".".join(parts))
            if tok == "new":
                # compiled subset: new Date(doc.<tsfield>) followed by
                # a getter call (handled in computed()).  Any other
                # constructor/argument shape interprets.
                _k2, ctor, coff = self._next()
                if ctor != "Date" or not self._eat("("):
                    raise JSCompileError(
                        f"only new Date(doc.<field>) is compilable "
                        f"(at offset {coff}); the interpreter tier "
                        "runs other constructors"
                    )
                arg = self._expr()
                self._expect(")")
                if arg[0] != "doc":
                    raise JSCompileError(
                        "new Date() over a computed argument is "
                        "outside the compiled subset; the "
                        "interpreter tier runs it"
                    )
                return ("newdate", arg[1])
            if tok == "Math" and self._at("."):
                self._next()
                _k, name, noff = self._next()
                if _k != "ident" or not self._eat("("):
                    raise JSCompileError(
                        f"expected Math.<fn>(…) at offset {noff}"
                    )
                args = []
                while not self._eat(")"):
                    args.append(self._expr())
                    self._eat(",")
                return ("math", name, args)
            raise JSCompileError(
                f"unsupported identifier {tok!r} at offset {off} (only "
                "'doc' field references, Math.<fn>() calls and literals "
                "are compilable)"
            )
        if tok == "(":
            e = self._expr()
            self._expect(")")
            return e
        if tok == "[":
            items = []
            while not self._eat("]"):
                items.append(self._expr())
                self._eat(",")
            return ("arr", items)
        if tok == "{":
            obj = {}
            while not self._eat("}"):
                kkind, ktok, koff = self._next()
                if kkind == "str":
                    ktok = _unquote(ktok)
                elif kkind != "ident":
                    raise JSCompileError(
                        f"unsupported object key {ktok!r} at {koff}"
                    )
                self._expect(":")
                obj[ktok] = self._expr()
                self._eat(",")
            return ("obj", obj)
        raise JSCompileError(
            f"unsupported expression {tok!r} at offset {off}"
        )

    def _field_path(self, off: int) -> str:
        parts = []
        while True:
            if self._at(".") and not (
                self.i + 1 < len(self.toks)
                and self.toks[self.i + 1][0] == "ident"
                and self.i + 2 < len(self.toks)
                and self.toks[self.i + 2][1] == "("
            ):
                self._next()
                kind, tok, _ = self._next()
                if kind != "ident":
                    raise JSCompileError(
                        f"expected field name after 'doc.' at {off}"
                    )
                parts.append(tok)
            elif self._at("["):
                save = self.i
                self._next()
                kind, tok, _ = self._next()
                if kind == "str" and self._eat("]"):
                    parts.append(_unquote(tok))
                else:  # doc[expr] — not a static field ref; rewind
                    self.i = save
                    break
            else:
                break
        if not parts:
            raise JSCompileError(
                f"bare 'doc' reference at offset {off} is not compilable"
            )
        return parts


# ---------------------------------------------------------------------------
# AST → MapSpec
# ---------------------------------------------------------------------------

_ISO_SQL = 'date_format({col}, "yyyy-MM-dd\'T\'HH:mm:ss")'


def _sql_str(s: str) -> str:
    return "'" + s.replace("'", "''") + "'"


_REGEX_SPECIALS = set("\\.^$*+?()[]{}|")


def _literal_regex(pat: str, flags: str) -> tuple[str, str, bool]:
    """Classify an anchored-literal JS regex: ('exact'|'prefix'|
    'suffix'|'contains', literal, case_insensitive).  Anything else
    (other flags, any special char in the body) raises JSCompileError
    → the interpreter tier (functions/jsregex.py) runs the full regex.

    The bare ``u`` flag is admitted (round 8): on a special-free
    literal body u-mode changes nothing — Spark's UTF8String
    startswith/contains compare code points exactly like u-mode —
    while ``g`` stays excluded even here (test() on a g-regex is
    STATEFUL: alternating results via lastIndex).

    ``i`` is admitted too (round 8) and compiles to a JVM
    ``rlike '(?i)…'`` predicate instead of sinking the whole view to
    the interpreter tier: Java's default CASE_INSENSITIVE folds
    US-ASCII ONLY — bit-exactly the ECMAScript non-u-mode
    Canonicalize for ASCII patterns, and the same deviation contract
    the interpreter pins with ``re.IGNORECASE | re.ASCII``
    (jsregex.py module docstring).  ``lower()``/``upper()`` rewrites
    would NOT be exact: full-Unicode folding matches 'İ'/'K' where
    JS does not."""
    if any(f not in "ui" for f in flags) or \
            len(set(flags)) != len(flags):
        # duplicates (/a/ii) are a JS SyntaxError — fall back to the
        # interpreter tier, whose lexer validates and stays loud
        raise JSCompileError(
            "regex flags are outside the compiled subset"
        )
    body = pat
    prefix = body.startswith("^")
    if prefix:
        body = body[1:]
    suffix = body.endswith("$")
    if suffix:
        body = body[:-1]
    if any(c in _REGEX_SPECIALS for c in body):
        raise JSCompileError(
            "only anchored-literal regex patterns compile; the "
            "interpreter tier runs the rest"
        )
    mode = {(True, True): "exact", (True, False): "prefix",
            (False, True): "suffix",
            (False, False): "contains"}[(prefix, suffix)]
    return mode, body, "i" in flags


def _regex_pred_sql(mode: str, lit: str, recv: str,
                    ci: bool = False) -> str:
    if ci:
        # Java regex via rlike: (?i) is ASCII-only by default (the
        # exact JS non-u folding); \A/\z are the absolute anchors
        # (Java's $ would also match before a trailing \n); \Q…\E
        # quotes the literal (special-free by construction, but
        # quoting is free).  Backslashes double for the SQL-literal
        # parser.
        rx = "(?i)"
        if mode in ("exact", "prefix"):
            rx += r"\A"
        rx += "\\Q" + lit + "\\E"
        if mode in ("exact", "suffix"):
            rx += r"\z"
        return f"({recv} RLIKE {_sql_str(rx.replace(chr(92), chr(92) * 2))})"
    p = _sql_str(lit)
    if mode == "exact":
        return f"({recv} = {p})"
    if mode == "prefix":
        return f"startswith({recv}, {p})"
    if mode == "suffix":
        return f"endswith({recv}, {p})"
    return f"contains({recv}, {p})"


def _sql_num(v: float) -> str:
    """JS number literal → SQL.  A bare ``0.5`` in Spark SQL text is
    DECIMAL(1,1), so literal-vs-literal arithmetic would run in
    decimal (``0.5 / 3`` → 0.166667, scale 6) instead of JS IEEE-754
    doubles; the explicit double cast (constant-folded by Catalyst,
    so comparisons stay pushable literals) keeps every compiled
    expression in double arithmetic."""
    return f"cast({float(v)!r} as double)"


class _Compiler:
    def __init__(self, table: str, schema,
                 variant_types: dict[str, str] | None = None,
                 variant_iso: set[str] | None = None) -> None:
        from mapreduce_spark.sources.docs import TABLES

        self.table = table
        self.t = TABLES[table]
        # variant mode (functions/jsvariant.py): raw doc sources have
        # one dynamic doc_json column; field kinds come from sampled
        # inference and extraction is drift-guarded variant_get SQL.
        # variant_iso: string fields whose sampled values are all
        # strict-ISO — eligible for compiled new Date() bucketing
        self.variant_types = variant_types
        self.variant_iso = variant_iso or set()
        self.types = (
            {}
            if schema is None
            else {f.name: f.dataType.simpleString() for f in schema}
        )
        # null-guards accumulated while compiling ONE emit: a JS method
        # call on null THROWS, and upstream tryMap turns a throwing map
        # fn into a skipped doc.  Each entry is ``(ctx, guard_sql)``:
        # ``ctx`` (SQL or None) is the short-circuit context gating
        # whether the site is EVALUATED at all — the right side of
        # ``&&`` runs only when the left was truthy, of ``||`` only
        # when it was falsy — so a guard contributes `NOT ctx OR
        # guard` (no requirement when the site is never reached).
        self.pending_guards: list[tuple[str | None, str]] = []
        self._guard_ctx: list[str] = []
        # ToNumber-context SQL for ternary nodes, keyed by AST node
        # id: JS applies ToNumber(null)=0 PER TAKEN BRANCH, so a
        # ternary consumed as a numeric operand coalesces each
        # field/literal branch individually instead of treating the
        # whole CASE as a computed (non-finite-encoding) expression
        self._tonum: dict[int, str] = {}

    def _push_guard(self, sql: str) -> None:
        ctx = " AND ".join(self._guard_ctx) if self._guard_ctx else None
        self.pending_guards.append((ctx, sql))

    # -- computed expressions (arithmetic + string methods) -------------

    _STR_METHODS = ("substring", "slice", "toLowerCase", "toUpperCase",
                    "indexOf", "startsWith", "endsWith", "includes")

    _DATE_GETTER_SQL = {
        # JS getter → SQL over a (coalesced) timestamp ts; UTC == the
        # pinned session timezone, so both variants compile the same.
        # Spark dayofweek is Sunday=1, JS getDay is Sunday=0.
        "getFullYear": "year({ts})", "getUTCFullYear": "year({ts})",
        "getMonth": "(month({ts}) - 1)",        # JS month INDEX
        "getUTCMonth": "(month({ts}) - 1)",
        "getDate": "day({ts})", "getUTCDate": "day({ts})",
        "getDay": "(dayofweek({ts}) - 1)",
        "getUTCDay": "(dayofweek({ts}) - 1)",
        "getHours": "hour({ts})", "getUTCHours": "hour({ts})",
        "getMinutes": "minute({ts})", "getUTCMinutes": "minute({ts})",
        "getSeconds": "second({ts})", "getUTCSeconds": "second({ts})",
    }

    def _date_getter(self, field: str, name: str,
                     args: list) -> tuple[str, str]:
        """``new Date(doc.ts).getUTCFullYear()`` and friends over a
        TYPED timestamp column → plain JVM date functions (pushdown-
        and partition-prune-friendly — the Spark-idiomatic date
        bucketing).  The interpreter sees the doc-space rendered ISO
        string (second precision, UTC), so only getters invariant
        under second-truncation compile; getTime / getMilliseconds /
        the serializers interpret.  A NULL column is JS null →
        ToNumber 0 → the epoch (so the receiver coalesces), matching
        ``new Date(null)``."""
        if args:
            raise JSCompileError(f"Date {name}() takes no arguments")
        kind, sql = self.field(field)
        if kind == "str" and self.variant_types is not None \
                and field in self.variant_iso:
            # raw-doc ISO string (sampled all-ISO): parse JVM-side
            # with a drift guard — a non-ISO tail value raises and the
            # engine falls back to the interpreter (JS would produce
            # an Invalid Date → NaN getters; the interpreter
            # reproduces that exactly)
            from mapreduce_spark.functions.jsvariant import (
                DRIFT_MARK,
                ISO_RE,
            )

            err = (
                f"raise_error('[{DRIFT_MARK}] doc.{field} is not a "
                "valid strict-ISO date string — interpreter tier "
                "required')"
            )
            # shape guard (regex) + validity guard (try_cast: a
            # shape-valid '2024-13-45' is a JS Invalid Date → NaN
            # getters, which only the interpreter reproduces)
            sql = (
                f"(CASE WHEN {sql} IS NULL THEN "
                "cast(NULL as timestamp) "
                f"WHEN NOT {sql} RLIKE '{ISO_RE}' THEN {err} "
                f"WHEN try_cast({sql} as timestamp) IS NULL THEN {err} "
                f"ELSE cast({sql} as timestamp) END)"
            )
            kind = "iso"
        if kind != "iso":
            raise JSCompileError(
                f"new Date(doc.{field}) over a {kind} field is "
                "outside the compiled subset (typed timestamp "
                "columns only); the interpreter tier runs it"
            )
        tpl = self._DATE_GETTER_SQL.get(name)
        if tpl is None:
            if name == "getTimezoneOffset":
                return "num", "cast(0.0 as double)"
            raise JSCompileError(
                f"Date.prototype.{name}() is outside the compiled "
                "subset; the interpreter tier runs it"
            )
        ts = f"coalesce({sql}, timestamp '1970-01-01 00:00:00')"
        return "num", f"cast({tpl.format(ts=ts)} as double)"

    def _num_operand(self, ast: Any, sql: str) -> str:
        """Numeric operand SQL with JS ToNumber(null)=0 applied to
        SOURCE nulls only.  Computed sub-expressions keep SQL null
        propagation: their null encodes a folded non-finite (JS would
        carry Infinity/NaN forward and JSON-stringify to null).
        Ternaries use their per-branch ToNumber form (cached during
        ``computed``): the taken branch decides the coalescing, so
        ``c ? 3 : doc.n`` over null ``doc.n`` is 0, not null."""
        if id(ast) in self._tonum:
            return self._tonum[id(ast)]
        return (
            f"coalesce({sql}, 0.0)"
            if ast[0] in ("doc", "lit", "elem", "epos")
            else sql
        )

    def computed(self, ast: Any) -> tuple[str, str]:
        """('bin'|'method'|…) AST → (kind, sql) with JS semantics."""
        tag = ast[0]
        if tag == "lit":
            v = ast[1]
            if isinstance(v, bool) or v is None:
                raise JSCompileError(
                    "booleans/null are not compilable inside computed "
                    "expressions"
                )
            if isinstance(v, (int, float)):
                return "num", _sql_num(v)
            return "str", _sql_str(v)
        if tag == "doc":
            kind, sql = self.field(ast[1])
            if kind == "iso":  # doc space renders ISO strings
                return "str", _ISO_SQL.format(col=sql)
            return kind, sql
        if tag == "elem":
            return self.elem_ref(ast)
        if tag == "epos":
            return self.epos_ref()
        if tag == "ekey":
            return self.ekey_ref()
        if tag == "bin":
            op, l, r = ast[1], ast[2], ast[3]
            (lk, ls) = self.computed(l)
            (rk, rs) = self.computed(r)
            if op == "+" and lk == rk == "str":
                # JS `+` does string concat only when an operand IS a
                # string after ToPrimitive: null + 'a' → 'nulla', but
                # null + null → numeric 0.  Concat is therefore
                # compiled only when one side is statically
                # non-null — a literal, or a method result (null
                # receivers are throw-guarded away).  Two nullable
                # fields could both be null at runtime, flipping the
                # RESULT KIND per row; that stays on the interpreter.
                def _nonnull_str(a: Any) -> bool:
                    # ekey: object keys are non-null strings
                    return a[0] in ("lit", "method", "ekey")

                if not (_nonnull_str(l) or _nonnull_str(r)):
                    raise JSCompileError(
                        "string + between two nullable fields is "
                        "outside the compiled subset (JS null + null "
                        "is numeric 0, not 'nullnull'); the "
                        "interpreter tier runs it exactly"
                    )
                return "str", (
                    f"concat(coalesce({ls}, 'null'), "
                    f"coalesce({rs}, 'null'))"
                )
            if lk == rk == "num":
                # JS arithmetic coerces null to 0 (never throws) — but
                # ONLY source nulls (doc fields / literals).  A null
                # coming out of a computed sub-expression is a folded
                # non-finite (by-zero division, sqrt(neg), pow
                # overflow): JS would propagate Infinity/NaN through
                # further arithmetic and stringify the result to null,
                # so SQL null-propagation (x + NULL = NULL) is the
                # faithful compilation and coalescing it to 0 would
                # diverge.
                l0, r0 = self._num_operand(l, ls), self._num_operand(
                    r, rs
                )
                if op in ("+", "-", "*"):
                    return "num", f"({l0} {op} {r0})"
                if op == "/":
                    # True IEEE-754 division, carried through: JS x/0
                    # → ±Infinity (sign from both operands, -0.0
                    # divisor detected via its string form), 0/0 →
                    # NaN.  Non-finites flow onward like JS doubles —
                    # x / Infinity is 0, NOT null — and fold to JSON
                    # null only at the emit boundary
                    # (mapphase.fold_nonfinite), exactly where
                    # JSON.stringify folds them.  Spark's `/` can't
                    # produce them itself (zero divisor → NULL/error),
                    # so the zero-divisor case is constructed.
                    return "num", (
                        f"(CASE WHEN {r0} = 0 THEN "
                        f"(CASE WHEN {l0} = 0 OR isnan({l0}) "
                        "THEN cast('NaN' as double) "
                        f"WHEN ({l0} > 0) = (NOT startswith("
                        f"cast({r0} as string), '-')) "
                        "THEN cast('Infinity' as double) "
                        "ELSE cast('-Infinity' as double) END) "
                        f"ELSE {l0} / {r0} END)"
                    )
                if op == "%":
                    # JS remainder: sign of the dividend (Spark/Java
                    # match for finite operands); the IEEE corners are
                    # constructed — x % 0 and Inf % x → NaN, finite x
                    # % ±Infinity → x — and carried like division
                    inf = "cast('Infinity' as double)"
                    return "num", (
                        f"(CASE WHEN {r0} = 0 OR abs({l0}) = {inf} "
                        "THEN cast('NaN' as double) "
                        f"WHEN abs({r0}) = {inf} THEN {l0} "
                        f"ELSE {l0} % {r0} END)"
                    )
            raise JSCompileError(
                f"operator {op!r} between {lk} and {rk} operands is "
                "outside the subset (same-kind operands only; JS "
                "mixed-type coercion differs from SQL)"
            )
        if tag == "ternary":
            # JS evaluates ONLY the taken branch, so each branch's
            # throw-guards are gated on the condition's truth value
            # via the same short-circuit context machinery as &&/||
            c_sql = f"({self.cond(ast[1])})"
            c_true = f"COALESCE({c_sql}, false)"
            self._guard_ctx.append(c_true)
            try:
                tk, ts = self.computed(ast[2])
            finally:
                self._guard_ctx.pop()
            self._guard_ctx.append(f"(NOT {c_true})")
            try:
                fk, fs = self.computed(ast[3])
            finally:
                self._guard_ctx.pop()
            if tk != fk:
                raise JSCompileError(
                    f"ternary branches of different kinds ({tk} vs "
                    f"{fk}) are outside the compilable subset"
                )
            if tk == "num":
                # per-branch ToNumber form for numeric consumers (see
                # _num_operand) — built here where branch SQL exists
                self._tonum[id(ast)] = (
                    f"(CASE WHEN {c_true} "
                    f"THEN {self._num_operand(ast[2], ts)} "
                    f"ELSE {self._num_operand(ast[3], fs)} END)"
                )
            return tk, (
                f"(CASE WHEN {c_true} THEN {ts} ELSE {fs} END)"
            )
        if tag == "strlen":
            kind, sql = self.field(ast[1])
            if kind == "iso":
                # rendered ISO strings have a fixed 19-char form —
                # but JS null.length still throws, so the null guard
                # applies exactly as on plain string fields
                self._push_guard(f"({sql} IS NOT NULL)")
                return "num", "19.0"
            if kind != "str":
                raise JSCompileError(
                    f".length on a {kind} field is outside the subset "
                    "(string length only)"
                )
            # JS: null.length throws → tryMap skips the doc
            self._push_guard(f"({sql} IS NOT NULL)")
            return "num", f"cast(length({sql}) as double)"
        if tag == "math":
            name, args = ast[1], ast[2]
            compiled = []
            for a in args:
                k, s = self.computed(a)
                if k != "num":
                    raise JSCompileError(
                        f"Math.{name}() over a {k} operand is outside "
                        "the subset"
                    )
                compiled.append(self._num_operand(a, s))
            n = len(compiled)
            if name in ("floor", "ceil", "abs", "sqrt", "round") \
                    and n == 1:
                x = compiled[0]

                def ieee(int_sql: str) -> str:
                    # Spark's floor/ceil(double) return BIGINT, so a
                    # non-finite input would overflow to ±Long.MIN
                    # and a finite |x| ≥ 2^63 saturates — JS passes
                    # NaN/±Infinity through unchanged, and every
                    # double with |x| ≥ 2^53 is already integral, so
                    # both cases return x itself
                    return (
                        f"(CASE WHEN isnan({x}) OR abs({x}) >= "
                        f"cast(9007199254740992.0 as double) THEN {x} "
                        f"ELSE {int_sql} END)"
                    )

                if name == "floor":
                    return "num", ieee(f"cast(floor({x}) as double)")
                if name == "ceil":
                    return "num", ieee(f"cast(ceil({x}) as double)")
                if name == "abs":
                    return "num", f"abs({x})"
                if name == "sqrt":
                    # IEEE: sqrt(negative) = NaN, carried (folds to
                    # JSON null at the emit boundary)
                    return "num", f"sqrt({x})"
                # JS Math.round: half-up toward +Infinity (round(-2.5)
                # = -2) — Spark's round() is half-away-from-zero, so
                # compile the definition instead
                return "num", ieee(f"cast(floor({x} + 0.5) as double)")
            if name == "pow" and n == 2:
                # Java/Spark power() IS IEEE Math.pow = JS semantics;
                # NaN/Infinity corners (neg^frac, overflow, 0^neg)
                # carry like JS doubles and fold at the emit boundary
                return "num", f"power({compiled[0]}, {compiled[1]})"
            raise JSCompileError(
                f"Math.{name}() with {n} argument(s) is outside the "
                "compilable subset (floor/ceil/abs/sqrt/round/pow)"
            )
        if tag == "method":
            base, name, args = ast[1], ast[2], ast[3]
            if base[0] == "elem":
                # a null ELEMENT's method throw skips the doc's
                # REMAINING emits in JS (earlier elements stand) —
                # a per-row filter cannot reproduce that partial-doc
                # semantic, so direct element receivers interpret.
                # Computed receivers built FROM the element (concat
                # etc.) are non-null by construction and compile.
                raise JSCompileError(
                    f".{name}() directly on a forEach element is "
                    "outside the compiled subset (null-element throw "
                    "semantics); the interpreter tier runs it"
                )
            if base[0] == "newdate":
                return self._date_getter(base[1], name, args)
            if base[0] == "regexlit":
                # /pat/.test(s): anchored-literal patterns only →
                # pushable startswith/endswith/contains/equality; JS
                # coerces a null argument via ToString ('null')
                if name != "test" or len(args) != 1:
                    raise JSCompileError(
                        f"RegExp.prototype.{name} is outside the "
                        "compiled subset (the interpreter runs it)"
                    )
                mode, lit, ci = _literal_regex(base[1], base[2])
                ak, asql = self.computed(args[0])
                if ak != "str":
                    raise JSCompileError(
                        f".test() over a {ak} argument is outside "
                        "the compiled subset"
                    )
                if args[0][0] in ("doc", "elem"):
                    asql = f"coalesce({asql}, 'null')"
                return "bool", _regex_pred_sql(mode, lit, asql, ci)
            if (
                name == "match"
                and len(args) == 1
                and args[0][0] == "regexlit"
            ):
                # s.match(/pat/): array-or-null in JS — compiled ONLY
                # for truthiness/null-comparison consumption (kind
                # 'matchbool'); key/value positions reject the kind
                # and fall back to the interpreter
                mode, lit, ci = _literal_regex(args[0][1], args[0][2])
                bk, bs = self.computed(base)
                if bk != "str":
                    raise JSCompileError(
                        f".match() on a {bk} receiver is outside the "
                        "compiled subset"
                    )
                if base[0] == "doc":
                    # JS: null.match() throws → tryMap skips the doc
                    self._push_guard(f"({bs} IS NOT NULL)")
                return "matchbool", _regex_pred_sql(mode, lit, bs, ci)
            bk, bs = self.computed(base)
            if bk != "str" or name not in self._STR_METHODS:
                raise JSCompileError(
                    f".{name}() on a {bk} receiver is outside the "
                    "compilable subset"
                )
            if base[0] == "doc":
                # JS: null.method() throws → tryMap skips the doc
                self._push_guard(f"({bs} IS NOT NULL)")
            if name == "toLowerCase":
                if args:
                    raise JSCompileError("toLowerCase() takes no args")
                return "str", f"lower({bs})"
            if name == "toUpperCase":
                if args:
                    raise JSCompileError("toUpperCase() takes no args")
                return "str", f"upper({bs})"
            if name in ("indexOf", "startsWith", "endsWith",
                        "includes"):
                # literal search string only (the ddoc idiom:
                # doc._id.indexOf('user:') === 0 type-scoping)
                if len(args) != 1 or args[0][0] != "lit" \
                        or not isinstance(args[0][1], str):
                    raise JSCompileError(
                        f".{name}() supports exactly one literal "
                        "string argument"
                    )
                pat = _sql_str(args[0][1])
                if name == "indexOf":
                    # JS 0-based, -1 for absent ≡ instr()-1 (1-based,
                    # 0 for absent); cmp() rewrites the === 0 /
                    # >= 0 / === -1 idioms to pushable
                    # startswith/contains predicates
                    return "num", (
                        f"cast(instr({bs}, {pat}) - 1 as double)"
                    )
                fn = {"startsWith": "startswith",
                      "endsWith": "endswith",
                      "includes": "contains"}[name]
                return "bool", f"{fn}({bs}, {pat})"
            # substring/slice with literal non-negative offsets (the
            # common prefix/infix idiom); negative/swapped/dynamic
            # args are out of the subset
            lits = []
            for a in args:
                if a[0] != "lit" or not isinstance(a[1], (int, float)) \
                        or a[1] < 0 or a[1] != int(a[1]):
                    raise JSCompileError(
                        f".{name}() supports literal non-negative "
                        "integer offsets only"
                    )
                lits.append(int(a[1]))
            if len(lits) == 1:
                return "str", f"substr({bs}, {lits[0] + 1})"
            if len(lits) == 2 and lits[0] <= lits[1]:
                return "str", (
                    f"substr({bs}, {lits[0] + 1}, {lits[1] - lits[0]})"
                )
            raise JSCompileError(
                f".{name}() expects (start[, end]) with start <= end"
            )
        raise JSCompileError(
            f"unsupported computed expression {tag!r}"
        )

    def elem_ref(self, ast: Any) -> tuple[str, str]:
        """forEach element / for-in entry value → (elem kind, guarded
        extraction SQL) over the explode output column
        (jsvariant.elem_value_sql — the guard is identical: entry
        values drift-check per row exactly like array elements)."""
        if self.variant_types is None:
            raise JSCompileError(
                "forEach over a typed table is outside the compiled "
                "subset (raw doc sources only); the Python map path "
                "runs it"
            )
        f = ast[1]
        kind = self.variant_types.get(f)
        if kind is None or ":" not in kind \
                or kind.split(":", 1)[1] == "any":
            raise JSCompileError(
                f"doc.{f} has no inferred element kind in the "
                "sampled corpus"
            )
        from mapreduce_spark.functions.jsvariant import elem_value_sql

        ekind = kind.split(":", 1)[1]
        return ekind, elem_value_sql(f, ekind)

    def ekey_ref(self) -> tuple[str, str]:
        """for-in loop variable → the object-entry key column (always
        a non-null JS string — JSON object keys may be empty but
        never null)."""
        if self.variant_types is None:
            raise JSCompileError(
                "a compiled for-in over a typed table is outside "
                "the compiled subset (raw doc sources only); the "
                "Python map path runs it"
            )
        from mapreduce_spark.functions.jsvariant import EKEY_COL

        return "str", EKEY_COL

    def epos_ref(self) -> tuple[str, str]:
        """for-loop index variable → the posexplode position column
        (always a non-null, non-NaN JS number)."""
        if self.variant_types is None:
            raise JSCompileError(
                "a compiled for-loop over a typed table is outside "
                "the compiled subset (raw doc sources only); the "
                "Python map path runs it"
            )
        from mapreduce_spark.functions.jsvariant import EPOS_COL

        return "num", f"cast({EPOS_COL} as double)"

    def field(self, name: str) -> tuple[str, str]:
        """doc field → (kind, raw-SQL expr) in the doc space."""
        if name == "_id":
            args = ", ".join(self.t.pk)
            fmt = self.t.id_format.replace("'", "''")
            return "str", f"format_string('{fmt}', {args})"
        if name in ("_rev", "_deleted"):
            raise JSCompileError(
                f"doc.{name} is engine metadata and not compilable"
            )
        if self.variant_types is not None:
            from mapreduce_spark.functions.jsvariant import (
                variant_field_sql,
            )

            kind = self.variant_types.get(name)
            if kind is None:
                raise JSCompileError(
                    f"doc.{name} has no inferred scalar kind in the "
                    "sampled corpus"
                )
            return kind, variant_field_sql(name, kind)
        dt = self.types.get(name)
        if dt is None:
            raise JSCompileError(
                f"doc.{name} does not exist on table {self.table!r} "
                f"(fields: {sorted(self.types)})"
            )
        if dt == "string":
            return "str", name
        if dt in ("double", "float", "int", "bigint", "smallint",
                  "tinyint") or dt.startswith("decimal"):
            return "num", name
        if dt in ("timestamp", "date", "timestamp_ntz"):
            return "iso", name
        if dt == "boolean":
            return "bool", name
        raise JSCompileError(
            f"doc.{name} has type {dt} — not compilable as a key/value"
        )

    # -- key ------------------------------------------------------------
    def key_component(self, ast: Any) -> tuple:
        tag = ast[0]
        if tag == "lit":
            v = ast[1]
            if v is None:
                return ("null", "null")
            if isinstance(v, bool):
                return ("bool", "true" if v else "false")
            if isinstance(v, (int, float)):
                return ("num", _sql_num(v))
            return ("str", _sql_str(v))
        if tag == "doc":
            return self.field(ast[1])
        if tag == "elem":
            return self.elem_ref(ast)
        if tag == "epos":
            return self.epos_ref()
        if tag == "ekey":
            return self.ekey_ref()
        if tag in ("bin", "method", "strlen", "math", "ternary"):
            kind, sql = self.computed(ast)
            if kind not in ("num", "str", "bool", "iso"):
                raise JSCompileError(
                    f"a {kind} expression is not a compilable key "
                    "component (e.g. .match() returns an array)"
                )
            return kind, sql
        raise JSCompileError(
            f"unsupported key component {tag!r} (scalars, doc fields "
            "and computed expressions only; arrays cannot nest)"
        )

    def key(self, ast: Any) -> Any:
        if ast[0] == "arr":
            return [self.key_component(a) for a in ast[1]]
        return self.key_component(ast)

    # -- value ----------------------------------------------------------
    def value(self, ast: Any) -> Any:
        tag = ast[0]
        if tag == "lit":
            v = ast[1]
            if v is None:
                return None
            if isinstance(v, bool):
                return ("bool", "true" if v else "false")
            if isinstance(v, (int, float)):
                return ("num", _sql_num(v))
            return ("str", _sql_str(v))
        if tag == "doc":
            kind, sql = self.field(ast[1])
            if kind == "iso":
                return ("str", _ISO_SQL.format(col=sql))
            return (kind, sql)
        if tag == "elem":
            return self.elem_ref(ast)
        if tag == "epos":
            return self.epos_ref()
        if tag == "ekey":
            return self.ekey_ref()
        if tag in ("bin", "method", "strlen", "math", "ternary"):
            kind, sql = self.computed(ast)
            if kind not in ("num", "str", "bool"):
                raise JSCompileError(
                    f"a {kind} expression is not a compilable emitted "
                    "value (e.g. .match() returns an array)"
                )
            return kind, sql
        if tag == "arr":
            exprs = []
            for a in ast[1]:
                if a[0] == "lit" and isinstance(a[1], (int, float)) \
                        and not isinstance(a[1], bool):
                    exprs.append(_sql_num(a[1]))
                elif a[0] == "doc":
                    kind, sql = self.field(a[1])
                    if kind != "num":
                        raise JSCompileError(
                            "value arrays must be numeric (CouchDB _sum "
                            f"shape); doc.{a[1]} is {kind}"
                        )
                    exprs.append(sql)
                elif a[0] == "elem":
                    kind, sql = self.elem_ref(a)
                    if kind != "num":
                        raise JSCompileError(
                            "value arrays must be numeric (CouchDB "
                            f"_sum shape); the element is {kind}"
                        )
                    exprs.append(sql)
                elif a[0] == "epos":
                    exprs.append(self.epos_ref()[1])
                elif a[0] in ("bin", "method", "strlen", "math",
                              "ternary"):
                    kind, sql = self.computed(a)
                    if kind != "num":
                        raise JSCompileError(
                            "value arrays must be numeric (CouchDB "
                            f"_sum shape); element is {kind}"
                        )
                    exprs.append(sql)
                else:
                    raise JSCompileError(
                        "value arrays may contain numbers, numeric doc "
                        "fields and numeric computed expressions only"
                    )
            return ("num_arr", exprs)
        if tag == "obj":
            obj = ast[1]
            if set(obj) == {"_id"} and obj["_id"][0] == "doc":
                kind, sql = self.field(obj["_id"][1])
                if kind == "str":
                    return ("link", sql)
            if "_id" in obj:
                # upstream treats ANY object value carrying _id as a
                # linked document; only the pure {_id: doc.field}
                # shape compiles — the interpreter tier handles the
                # mixed form with full link semantics
                raise JSCompileError(
                    "object values containing _id are linked "
                    "documents; only {_id: doc.<string field>} "
                    "compiles"
                )
            # flat object value of compilable scalars (the common
            # {total: doc.x, count: 1} accumulator-feed shape)
            members = []
            for mname, a in obj.items():
                mv = self.value(a)
                if mv is None:
                    members.append((mname, ("null", "null")))
                elif mv[0] in ("num", "str", "bool"):
                    members.append((mname, mv))
                else:
                    raise JSCompileError(
                        "object value members must be scalars "
                        f"(member {mname!r} is {mv[0]})"
                    )
            return ("obj", members)
        raise JSCompileError(f"unsupported value expression {tag!r}")

    # -- guards ----------------------------------------------------------
    def cond(self, ast: Any) -> str:
        tag = ast[0]
        if tag == "and":
            # JS && short-circuits: the right side (and any throwing
            # method site in it) is EVALUATED only when the left was
            # truthy — record that as the guard context so a null
            # receiver on the right doesn't impose its guard on docs
            # that never reach it (coalesce: SQL NULL left ≡ JS falsy)
            ls = self.cond(ast[1])
            self._guard_ctx.append(f"COALESCE(({ls}), false)")
            try:
                rs = self.cond(ast[2])
            finally:
                self._guard_ctx.pop()
            return f"({ls}) AND ({rs})"
        if tag == "or":
            # JS || evaluates the right side only when the left was
            # FALSY (NULL included)
            ls = self.cond(ast[1])
            self._guard_ctx.append(f"(NOT COALESCE(({ls}), false))")
            try:
                rs = self.cond(ast[2])
            finally:
                self._guard_ctx.pop()
            return f"({ls}) OR ({rs})"
        if tag == "not":
            # null-safe: JS `!undefined` is true, but SQL NOT(NULL) is
            # NULL (row dropped) — coalesce the inner condition to
            # false first so a missing/null field lands in the negated
            # branch exactly like the JS interpreter path (and the
            # compiled else-guard ≡ JS else)
            return f"NOT COALESCE(({self.cond(ast[1])}), false)"
        if tag == "truthy":
            kind, sql = self._operand(ast[1])
            if kind in ("bool", "matchbool"):
                return f"({sql})"
            if kind == "num":
                # JS Boolean(NaN) is FALSE, but Spark NaN <> 0 is
                # true — null a computed NaN out first (doc fields
                # are JSON numbers, never NaN)
                if ast[1][0] not in ("doc", "lit", "elem", "epos"):
                    sql = f"nanvl({sql}, cast(null as double))"
                return f"({sql} IS NOT NULL AND {sql} <> 0)"
            if kind == "str":
                return f"({sql} IS NOT NULL AND {sql} <> '')"
            return f"({sql} IS NOT NULL)"
        if tag == "cmp":
            op, l, r = ast[1], ast[2], ast[3]
            idiom = self._indexof_idiom(op, l, r)
            if idiom is not None:
                return idiom
            sql_op = {"===": "=", "==": "=", "!==": "<>", "!=": "<>",
                      "<": "<", "<=": "<=", ">": ">", ">=": ">="}[op]
            # null comparisons → IS [NOT] NULL
            for a, b in ((l, r), (r, l)):
                if b == ("lit", None):
                    if op not in ("===", "==", "!==", "!="):
                        raise JSCompileError(
                            "null is only comparable with equality"
                        )
                    k, sql = self._operand(a)
                    if k == "matchbool":
                        # s.match(/re/) === null ⟺ no match (the
                        # predicate is boolean, never SQL NULL — the
                        # null-receiver case is throw-guarded away)
                        if op in ("!==", "!="):
                            return f"COALESCE(({sql}), false)"
                        return f"(NOT COALESCE(({sql}), false))"
                    neg = "NOT " if op in ("!==", "!=") else ""
                    return f"({sql} IS {neg}NULL)"
            (lk, ls), (rk, rs) = self._operand(l), self._operand(r)
            if {lk, rk} not in ({"num"}, {"str"}, {"bool"},
                                {"iso", "str"}, {"iso"}):
                raise JSCompileError(
                    f"comparison between {lk} and {rk} operands is not "
                    "compilable (JS coercion is out of the subset)"
                )
            if "iso" in (lk, rk):  # compare in ISO-string space
                ls = _ISO_SQL.format(col=ls) if lk == "iso" else ls
                rs = _ISO_SQL.format(col=rs) if rk == "iso" else rs

            def _cmpable(a: Any, sql: str) -> str:
                # Spark ORDERS NaN as the greatest double and treats
                # NaN = NaN as true; JS NaN compares false to
                # everything.  Computed operands carry real IEEE
                # non-finites now — null a NaN out at RELATIONAL
                # sites (NULL compares falsy; real JS nulls never
                # reach a relational un-coalesced).
                if lk == rk == "num" and a[0] not in ("doc", "lit",
                                                      "elem", "epos"):
                    return f"nanvl({sql}, cast(null as double))"
                return sql

            computed_num = lk == rk == "num" and (
                l[0] not in ("doc", "lit", "elem", "epos")
                or r[0] not in ("doc", "lit", "elem", "epos")
            )
            # JS null comparison semantics vs SQL three-valued logic:
            # - `null !== lit` is TRUE in JS, but SQL `<>` yields NULL
            #   and drops the row → inequality always compiles
            #   null-safe (NOT <=>)
            # - `null === null` is TRUE in JS → equality between two
            #   FIELDS compiles null-safe (<=>); against a literal the
            #   plain `=` already matches JS (both falsy on null) and
            #   stays pushable as EqualTo
            # - a COMPUTED numeric side may carry NaN, which equals
            #   NOTHING in JS (not even itself) while Spark's <=>
            #   would both match NaN<=>NaN and conflate a nanvl'd NaN
            #   with a true null — so equality over computed numbers
            #   guards with isnan() on the RAW operands instead
            if computed_num and op in ("===", "==", "!==", "!="):
                eq = (
                    f"(coalesce(NOT (isnan({ls}) OR isnan({rs})), "
                    f"true) AND ({ls} <=> {rs}))"
                )
                if op in ("!==", "!="):
                    return f"(NOT {eq})"
                return eq
            if op in ("!==", "!="):
                return f"(NOT ({ls} <=> {rs}))"
            if op in ("===", "==") and l[0] != "lit" and r[0] != "lit":
                return f"({ls} <=> {rs})"
            ls, rs = _cmpable(l, ls), _cmpable(r, rs)
            # - relational over NUMBERS coerces null to 0 in JS
            #   (ToNumber).  With a literal side the null outcome is
            #   known at compile time: fold it to a pushable
            #   `x op lit [OR x IS NULL]`; field-vs-field coalesces
            #   source nulls (a computed operand's NaN is nulled by
            #   _cmpable; its Infinity compares natively like JS)
            if lk == rk == "num" and op in ("<", "<=", ">", ">="):
                import operator as _op

                py = {"<": _op.lt, "<=": _op.le,
                      ">": _op.gt, ">=": _op.ge}[op]

                def _litval(a):
                    return (
                        float(a[1])
                        if a[0] == "lit"
                        and isinstance(a[1], (int, float))
                        and not isinstance(a[1], bool)
                        else None
                    )

                rl, rr = _litval(l), _litval(r)
                if l[0] in ("doc", "elem") and rr is not None:
                    base = f"({ls} {sql_op} {rs})"
                    return (f"({base} OR {ls} IS NULL)"
                            if py(0.0, rr) else base)
                if r[0] in ("doc", "elem") and rl is not None:
                    base = f"({ls} {sql_op} {rs})"
                    return (f"({base} OR {rs} IS NULL)"
                            if py(rl, 0.0) else base)
                ls = _cmpable(l, self._num_operand(l, ls))
                rs = _cmpable(r, self._num_operand(r, rs))
            if lk != "num" and op in ("<", "<=", ">", ">="):
                # STRING-space relational (str / rendered-iso): two JS
                # strings compare lexically — SQL matches — but a null
                # field flips JS to NUMERIC comparison (ToNumber(null)
                # = 0 vs ToNumber(other)).  Against a LITERAL the null
                # outcome folds at compile time into a pushable
                # `x op lit [OR x IS NULL]` (only numeric-looking
                # literals like '' or '12' can make it true — NaN
                # comparisons are false, matching the plain SQL drop).
                # A nullable field against a runtime string (another
                # field, a method result) cannot be folded: the
                # interpreter tier runs it exactly.
                import math as _math
                import operator as _op

                py = {"<": _op.lt, "<=": _op.le,
                      ">": _op.gt, ">=": _op.ge}[op]

                def _slit(a):
                    return (
                        a[1]
                        if a[0] == "lit" and isinstance(a[1], str)
                        else None
                    )

                sides = ((l, ls, r, rs, lambda t: py(0.0, t)),
                         (r, rs, l, ls, lambda t: py(t, 0.0)))
                for fld, fsql, other, osql, null_out in sides:
                    if fld[0] != "doc":
                        continue
                    lit = _slit(other)
                    if lit is None:
                        raise JSCompileError(
                            "relational between a nullable string "
                            "field and a runtime string is outside "
                            "the compiled subset (JS null compares "
                            "numerically); the interpreter tier runs "
                            "it exactly"
                        )
                    t = _js_num(lit)
                    base = f"({ls} {sql_op} {rs})"
                    if not _math.isnan(t) and null_out(t):
                        return f"({base} OR {fsql} IS NULL)"
                    return base
            return f"({ls} {sql_op} {rs})"
        raise JSCompileError(f"unsupported condition {tag!r}")

    def _indexof_idiom(self, op: str, l: Any, r: Any) -> str | None:
        """``x.indexOf(lit) === 0`` and friends → pushable
        startswith/contains predicates.

        The generic path compiles indexOf to ``instr()-1`` — correct
        but opaque to parquet pushdown; the canonical CouchDB
        type-scoping guard (``doc._id.indexOf('user:') === 0``)
        becomes a ``StartsWith`` the scan can prune on.  Shapes
        outside the table (e.g. ``> 0``) return None and take the
        generic numeric comparison."""

        def is_idx(a: Any) -> bool:
            return (
                a[0] == "method" and a[2] == "indexOf"
                and len(a[3]) == 1 and a[3][0][0] == "lit"
                and isinstance(a[3][0][1], str)
            )

        def lit01(a: Any) -> bool:
            return (
                a[0] == "lit"
                and isinstance(a[1], (int, float))
                and not isinstance(a[1], bool)
                and float(a[1]) in (0.0, -1.0)
            )

        if is_idx(l) and lit01(r):
            m, n = l, float(r[1])
        elif is_idx(r) and lit01(l):
            m, n = r, float(l[1])
            op = {"<": ">", ">": "<", "<=": ">=", ">=": "<="}.get(
                op, op
            )
        else:
            return None
        shape = {
            ("===", 0.0): "pre", ("==", 0.0): "pre",
            ("!==", 0.0): "npre", ("!=", 0.0): "npre",
            (">=", 0.0): "has", (">", -1.0): "has",
            ("!==", -1.0): "has", ("!=", -1.0): "has",
            ("===", -1.0): "nhas", ("==", -1.0): "nhas",
            ("<", 0.0): "nhas", ("<=", -1.0): "nhas",
        }.get((op, n))
        if shape is None:
            return None
        bk, bs = self.computed(m[1])
        if bk != "str":
            raise JSCompileError(
                f".indexOf() on a {bk} receiver is outside the "
                "compilable subset"
            )
        if m[1][0] == "doc":
            # JS: null.indexOf() throws → tryMap skips the doc
            self._push_guard(f"({bs} IS NOT NULL)")
        pat = _sql_str(m[3][0][1])
        return {
            "pre": f"startswith({bs}, {pat})",
            "npre": f"(NOT startswith({bs}, {pat}))",
            "has": f"contains({bs}, {pat})",
            "nhas": f"(NOT contains({bs}, {pat}))",
        }[shape]

    def _operand(self, ast: Any) -> tuple[str, str]:
        if ast[0] == "doc":
            return self.field(ast[1])
        if ast[0] == "elem":
            return self.elem_ref(ast)
        if ast[0] == "epos":
            return self.epos_ref()
        if ast[0] == "ekey":
            return self.ekey_ref()
        if ast[0] in ("bin", "method", "strlen", "math", "ternary"):
            return self.computed(ast)
        if ast[0] == "lit":
            v = ast[1]
            if isinstance(v, bool):
                return "bool", ("true" if v else "false")
            if isinstance(v, (int, float)):
                return "num", _sql_num(v)
            if isinstance(v, str):
                return "str", _sql_str(v)
        raise JSCompileError(
            f"unsupported comparison operand {ast!r}"
        )


def compile_js_map(source: str, table: str, schema,
                   variant_types: dict[str, str] | None = None,
                   variant_iso: set[str] | None = None) -> Any:
    """JS map-function source → MapSpec (or list of MapSpecs).

    ``schema``: the RAW table schema (``load_table(...).schema``) —
    field kinds (str/num/iso/bool) are inferred from it, mirroring the
    doc-space conversion in ``sources.docs.as_docs``.  With
    ``variant_types`` (raw doc sources, functions/jsvariant.py) the
    schema is ignored and fields extract via drift-guarded
    ``variant_get`` SQL instead.

    Raises :class:`JSCompileError` (a QueryParseError) for any
    construct outside the subset — see module docstring.
    """
    from mapreduce_spark.operators.mapphase import MapSpec

    emits = _Parser(source).parse()
    if not emits:
        raise JSCompileError(
            "map function contains no emit() call — a view with no "
            "emits indexes nothing"
        )
    # array-emit (forEach) views: every emit site must live inside
    # ONE forEach statement — mixed inside/outside (or two loops)
    # makes per-doc emit ordinals depend on the array LENGTH of
    # earlier loops, which a static MapSpec cannot express.  The
    # single-loop case compiles to posexplode with
    # emit_ord = element_pos * n_sites + site (order-equivalent to
    # the interpreter's dense per-doc ordinal for the (key, id,
    # emit_ord) collation — only relative order matters).
    marks = [
        next((g for g in guards
              if isinstance(g, tuple)
              and g[0] in ("foreach", "forloop", "forin")), None)
        for guards, _k, _v in emits
    ]
    foreach_field: str | None = None
    forin = False
    if any(m is not None for m in marks):
        if not all(m is not None for m in marks) \
                or len({m[2] for m in marks}) != 1:
            raise JSCompileError(
                "emits both inside and outside a forEach (or across "
                "two forEach loops) are outside the compiled subset "
                "(data-dependent emit ordinals); the interpreter "
                "tier runs it"
            )
        if variant_types is None:
            raise JSCompileError(
                "forEach over a typed table is outside the compiled "
                "subset (raw doc sources only); the Python map path "
                "runs it"
            )
        foreach_field = marks[0][1]
        forin = marks[0][0] == "forin"
    if forin:
        # Soundness condition for the object-entry explode: variant
        # dictionary order (lexicographic) differs from JS property
        # order (integer-like keys numerically first, then insertion
        # order), so the compiled tier is only order-equivalent when
        # collation TIES across iterations are impossible — i.e. the
        # bare loop key (unique per doc) is itself a key component.
        # Anything else (constant keys, transformed keys) runs on the
        # interpreter, which iterates in true JS order.
        def _bare_ekey(k: Any) -> bool:
            return k == ("ekey",) or (
                isinstance(k, tuple) and k[0] == "arr"
                and any(a == ("ekey",) for a in k[1])
            )

        if not all(_bare_ekey(key_ast) for _g, key_ast, _v in emits):
            raise JSCompileError(
                "for-in emits compile only when the loop key is "
                "itself a key component (emit order across object "
                "keys is otherwise observable); the interpreter "
                "tier runs it"
            )
    c = _Compiler(table, schema, variant_types=variant_types,
                  variant_iso=variant_iso)
    specs = []
    # A JS throw (method call on a null field) aborts ALL remaining
    # emits of the doc — upstream tryMap semantics — so each emit's
    # method-null guards also carry into every LATER emit, conditioned
    # on the guard site actually being evaluated (an emit whose if-
    # conds are false never evaluates its key/value, hence never
    # throws).
    carried: list[str] = []

    def _where_conjunct(ctx: str | None, g: str) -> str:
        # for THIS emit: the guard must hold only when its site is
        # actually evaluated (&&/|| short-circuit context)
        return g if ctx is None else f"(NOT ({ctx}) OR {g})"

    def _survive_conjunct(prior: list[str], ctx: str | None,
                          g: str) -> str:
        # for LATER emits: the doc dies iff the site was reached AND
        # threw.  Reached iff all prior if-conds were JS-truthy (NULL
        # counts as falsy — hence the COALESCE; SQL NOT(NULL) would
        # wrongly drop the row) and the short-circuit context held.
        reach = list(prior)
        if ctx is not None:
            reach.append(ctx)
        if not reach:
            return g
        return (
            f"(NOT COALESCE(({' AND '.join(reach)}), false) OR {g})"
        )

    def _elem_dependent(ctx: str | None, gsql: str) -> bool:
        from mapreduce_spark.functions.jsvariant import (
            EKEY_COL,
            ELEM_COL,
            EPOS_COL,
        )

        both = gsql + (ctx or "")
        return (ELEM_COL in both or EPOS_COL in both
                or EKEY_COL in both)

    n_sites = len(emits)
    for site, (guards, key_ast, value_ast) in enumerate(emits):
        conds: list[str] = []     # doc-level WHERE conjuncts
        econds: list[str] = []    # element-level (post-explode)
        survive: list[str] = []   # throw-free conjuncts for later emits
        prior: list[str] = []     # if-conds evaluated before a site
        in_elem = False           # past the forEach marker
        body_throws = False       # throw guards arising inside the loop
        for g in guards:
            if isinstance(g, tuple) \
                    and g[0] in ("foreach", "forloop", "forin"):
                in_elem = True
                continue
            c.pending_guards = []
            cg = f"({c.cond(g)})"
            mg = list(dict.fromkeys(c.pending_guards))
            for ctx, gsql in mg:
                if _elem_dependent(ctx, gsql):
                    # a throw for element i kills elements > i too —
                    # a per-row filter cannot reproduce that partial-
                    # array semantic
                    raise JSCompileError(
                        "an element-dependent throw site inside "
                        "forEach is outside the compiled subset; the "
                        "interpreter tier runs it"
                    )
                body_throws = body_throws or in_elem
                (econds if in_elem else conds).append(
                    _where_conjunct(ctx, gsql)
                )
                # a throw at this site kills later emits — but only
                # when the site is actually reached
                survive.append(_survive_conjunct(prior, ctx, gsql))
            prior.append(cg)
            (econds if in_elem else conds).append(cg)
        c.pending_guards = []
        key = c.key(key_ast)
        value = c.value(value_ast)
        mg = list(dict.fromkeys(c.pending_guards))
        for ctx, gsql in mg:
            if foreach_field is not None:
                if _elem_dependent(ctx, gsql):
                    raise JSCompileError(
                        "an element-dependent throw site inside "
                        "forEach is outside the compiled subset; the "
                        "interpreter tier runs it"
                    )
                body_throws = True
                econds.append(_where_conjunct(ctx, gsql))
            else:
                conds.append(_where_conjunct(ctx, gsql))
            survive.append(_survive_conjunct(prior, ctx, gsql))
        if body_throws and n_sites > 1:
            # a doc-constant throw at one site still truncates the
            # OTHER sites' element loops mid-array in JS; only the
            # single-site shape filters identically
            raise JSCompileError(
                "a throw site inside a multi-emit forEach body is "
                "outside the compiled subset; the interpreter tier "
                "runs it"
            )
        all_conds = list(dict.fromkeys(carried + conds))
        if foreach_field is None:
            specs.append(
                MapSpec(table, key, value,
                        where=" AND ".join(all_conds)
                        if all_conds else None)
            )
        else:
            from mapreduce_spark.functions.jsvariant import (
                forin_object_sql,
                variant_array_sql,
            )

            econds = list(dict.fromkeys(econds))
            explode = (
                (forin_object_sql(foreach_field), n_sites, site,
                 "obj")
                if forin
                else (variant_array_sql(foreach_field), n_sites,
                      site)
            )
            specs.append(
                MapSpec(
                    table, key, value,
                    where=" AND ".join(all_conds)
                    if all_conds else None,
                    explode=explode,
                    explode_where=" AND ".join(econds)
                    if econds else None,
                )
            )
        carried = list(dict.fromkeys(carried + survive))
    # size backstop: the IEEE CASE templates repeat each operand up
    # to 3×, so a pathologically deep arithmetic chain grows the
    # compiled SQL ~3^depth — past a sane bound the interpreter tier
    # is both correct and cheaper than Catalyst parsing megabytes of
    # expression text
    for spec in specs:
        kparts = (
            [sql for _, sql in spec.key]
            if isinstance(spec.key, list) else [spec.key[1]]
        )
        total = sum(map(len, kparts)) + len(spec.where or "") + (
            len(str(spec.value[1])) if spec.value else 0
        ) + len(spec.explode_where or "") + (
            len(spec.explode[0]) if spec.explode else 0
        )
        if total > 200_000:
            raise JSCompileError(
                "compiled expression exceeds the size bound (deeply "
                "nested arithmetic); the interpreter tier runs it"
            )
    return specs[0] if len(specs) == 1 else specs


def looks_like_js(obj: Any) -> bool:
    """True for a ('table', 'function(doc) {…}') JS map definition."""
    return (
        isinstance(obj, (tuple, list))
        and len(obj) == 2
        and isinstance(obj[0], str)
        and isinstance(obj[1], str)
        and obj[1].lstrip().startswith("function")
    )


# ---------------------------------------------------------------------------
# AST → Python map function (raw doc sources)
# ---------------------------------------------------------------------------

class _Undefined:
    """JS ``undefined`` sentinel.  A pickle-stable singleton: compiled
    reduce ASTs containing the ``undefined`` literal ship to executors
    inside closures, and identity checks (``is _UNDEF``) must survive
    the round-trip — a plain ``object()`` deserializes to a NEW
    instance and silently breaks them."""

    _inst = None

    def __new__(cls):
        if cls._inst is None:
            cls._inst = super().__new__(cls)
        return cls._inst

    def __reduce__(self):
        return (_Undefined, ())

    def __repr__(self) -> str:  # pragma: no cover
        return "undefined"


_UNDEF = _Undefined()  # JS `undefined` (absent doc field)


class _MapThrow(Exception):
    """The interpreted map fn hit a JS runtime throw (e.g. a method
    call on null/undefined) — upstream tryMap catches it and skips the
    doc, keeping whatever was emitted before the throw."""


def _js_substring(s: str, i: float, j: float | None) -> str:
    # JS String.prototype.substring: NaN/negative → 0, clamp to
    # length, swapped args swap back
    n = len(s)
    a = 0 if i != i else max(0, min(int(i), n))
    b = n if j is None else (0 if j != j else max(0, min(int(j), n)))
    if a > b:
        a, b = b, a
    return s[a:b]


def _js_slice(s: str, i: float, j: float | None) -> str:
    # JS String.prototype.slice: negatives count from the end
    n = len(s)
    a = int(i) if i == i else 0
    b = n if j is None else (int(j) if j == j else 0)
    if a < 0:
        a = max(0, n + a)
    if b < 0:
        b = max(0, n + b)
    a, b = min(a, n), min(b, n)
    return s[a:b] if a < b else ""


_CSM = None  # cached jsreduce._call_str_method (circular import)


_ELEM_KEY = "\x00elem"  # forEach element binding inside the doc dict
_EPOS_KEY = "\x00epos"  # for-loop index binding inside the doc dict
_EKEY_KEY = "\x00ekey"  # for-in key binding inside the doc dict


def es_own_keys(obj: dict) -> list:
    """Own enumerable keys in ES OrdinaryOwnPropertyKeys order --
    the order JS for-in / Object.keys observe: canonical array-index
    keys ('0', '1', ..., no leading zeros, < 2^32-1) ascending
    NUMERICALLY first, then the remaining string keys in insertion
    order.  Python dicts preserve JSON insertion order, so only the
    integer-like keys need hoisting."""
    def _index_key(k) -> bool:
        return (
            isinstance(k, str) and k.isascii() and k.isdigit()
            and (k == "0" or not k.startswith("0"))
            and int(k) < 2 ** 32 - 1
        )

    idx = sorted((k for k in obj if _index_key(k)), key=int)
    taken = set(idx)
    return idx + [k for k in obj if k not in taken]


def _ev(ast: Any, doc: dict) -> Any:
    tag = ast[0]
    if tag == "lit":
        return ast[1]
    if tag == "doc":
        return doc.get(ast[1], _UNDEF) if isinstance(doc, dict) else _UNDEF
    if tag == "elem":
        return doc.get(_ELEM_KEY, _UNDEF) if isinstance(doc, dict) \
            else _UNDEF
    if tag == "epos":
        return doc.get(_EPOS_KEY, _UNDEF) if isinstance(doc, dict) \
            else _UNDEF
    if tag == "ekey":
        return doc.get(_EKEY_KEY, _UNDEF) if isinstance(doc, dict) \
            else _UNDEF
    if tag == "arr":
        return [_ev(a, doc) for a in ast[1]]
    if tag == "obj":
        return {k: _ev(a, doc) for k, a in ast[1].items()}
    if tag == "ternary":
        return _ev(
            ast[2] if _cond_eval(ast[1], doc) else ast[3], doc
        )
    if tag == "strlen":
        v = doc.get(ast[1], _UNDEF) if isinstance(doc, dict) else _UNDEF
        if v is None or v is _UNDEF:
            raise _MapThrow("cannot read .length of null/undefined")
        if isinstance(v, str):
            return float(len(v))
        if isinstance(v, list):
            return float(len(v))
        return math.nan  # JS: (5).length is undefined → NaN in math
    if tag == "math":
        name, args = ast[1], [_js_num(_ev(a, doc)) for a in ast[2]]
        if name == "floor" and len(args) == 1:
            x = args[0]
            return x if math.isnan(x) or math.isinf(x) \
                else float(math.floor(x))
        if name == "ceil" and len(args) == 1:
            x = args[0]
            return x if math.isnan(x) or math.isinf(x) \
                else float(math.ceil(x))
        if name == "abs" and len(args) == 1:
            return abs(args[0])
        if name == "sqrt" and len(args) == 1:
            x = args[0]
            return math.sqrt(x) if x >= 0 else math.nan
        if name == "round" and len(args) == 1:
            # JS: half-up toward +Infinity
            x = args[0]
            return x if math.isnan(x) or math.isinf(x) \
                else float(math.floor(x + 0.5))
        if name == "pow" and len(args) == 2:
            try:
                return float(pow(args[0], args[1]))
            except (OverflowError, ValueError, ZeroDivisionError):
                # JS Math.pow never throws: 0^neg → Infinity,
                # overflow → ±Infinity (sign: neg base ^ odd int),
                # neg^fraction → NaN
                if args[0] == 0.0 and args[1] < 0:
                    return math.inf
                if args[0] < 0 and args[1] != int(args[1]):
                    return math.nan
                neg = args[0] < 0 and int(args[1]) % 2 == 1
                return -math.inf if neg else math.inf
        raise JSCompileError(f"Math.{name}() is outside the subset")
    if tag == "bin":
        op = ast[1]
        a, b = _ev(ast[2], doc), _ev(ast[3], doc)
        if op == "+":
            return _js_add(a, b)
        if op == "-":
            return _js_num(a) - _js_num(b)
        if op == "*":
            return _js_num(a) * _js_num(b)
        if op == "/":
            # JS x/0 → ±Infinity, 0/0 → NaN; non-finite values
            # serialize to JSON null downstream (JSON.stringify)
            na, nb = _js_num(a), _js_num(b)
            if nb == 0.0:
                return (
                    math.nan if na == 0.0 or math.isnan(na)
                    else math.copysign(math.inf, na) *
                    math.copysign(1.0, nb)
                )
            return na / nb
        if op == "%":
            # JS remainder: sign of the dividend; x % 0 → NaN
            na, nb = _js_num(a), _js_num(b)
            if nb == 0.0 or math.isnan(na) or math.isnan(nb) \
                    or math.isinf(na):
                return math.nan
            return math.fmod(na, nb)
        raise JSCompileError(f"unsupported operator {op!r}")
    if tag == "method":
        recv = _ev(ast[1], doc)
        name, args = ast[2], [_ev(a, doc) for a in ast[3]]
        if recv is None or recv is _UNDEF:
            raise _MapThrow(f"cannot call .{name}() on null/undefined")
        if not isinstance(recv, str):
            raise _MapThrow(f".{name}() on a non-string value")
        # ONE string-method implementation across both interpreter
        # tiers (jsreduce._call_str_method — resolved lazily because
        # jsreduce imports this module at load time, then cached:
        # this runs once per method call per doc)
        global _CSM
        if _CSM is None:
            from mapreduce_spark.functions.jsreduce import (
                _call_str_method,
            )

            _CSM = _call_str_method
        return _CSM(recv, name, args)
    raise JSCompileError(f"unsupported expression {tag!r}")


def _js_num(v: Any) -> float:
    """JS ToNumber over the subset's value space (NaN for the rest)."""
    import math

    if hasattr(v, "js_number_value"):  # JSDate: the time value
        return v.js_number_value()
    if isinstance(v, bool):
        return 1.0 if v else 0.0
    if isinstance(v, (int, float)):
        return float(v)
    if v is None:
        return 0.0
    if isinstance(v, str):
        s = v.strip()
        if not s:
            return 0.0
        try:
            return float(s)
        except ValueError:
            return math.nan
    return math.nan  # undefined, arrays, objects


def _js_str(v: Any) -> str:
    """JS ToString over the subset's value space."""
    if v is _UNDEF:
        return "undefined"
    if v is None:
        return "null"
    if isinstance(v, bool):
        return "true" if v else "false"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        if v == int(v) and abs(v) < 1e21:
            return str(int(v))
        return repr(v)
    if isinstance(v, int):
        return str(v)
    if isinstance(v, list):
        return ",".join("" if x is None or x is _UNDEF else _js_str(x)
                        for x in v)
    if isinstance(v, dict):
        return "[object Object]"
    return str(v)


def _js_add(a: Any, b: Any) -> Any:
    # a Date's ToPrimitive DEFAULT hint is string (the one JS object
    # where `date + x` concatenates), unlike its number-hinted
    # relational comparisons
    if hasattr(a, "to_json_value"):
        a = _js_str(a)
    if hasattr(b, "to_json_value"):
        b = _js_str(b)
    if isinstance(a, str) or isinstance(b, str):
        return _js_str(a) + _js_str(b)
    return _js_num(a) + _js_num(b)


def _truthy(v: Any) -> bool:
    if v is _UNDEF or v is None or v is False:
        return False
    if isinstance(v, bool):
        return v
    if isinstance(v, (int, float)):
        return v != 0 and v == v  # 0 and NaN are falsy
    if isinstance(v, str):
        return v != ""
    return True  # arrays/objects are truthy, even empty


def _js_eq(a: Any, b: Any) -> bool:
    """Strict equality (===) over the subset's value space."""
    if a is _UNDEF or b is _UNDEF:
        return a is b
    if a is None or b is None:
        return a is None and b is None
    if isinstance(a, bool) or isinstance(b, bool):
        return isinstance(a, bool) and isinstance(b, bool) and a is b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    if isinstance(a, str) and isinstance(b, str):
        return a == b
    return a is b  # non-primitives: JS reference equality


def _js_rel(op: str, a: Any, b: Any) -> bool:
    """JS abstract relational comparison: two strings compare
    lexically (UTF-16 code units ≈ Python str compare for the BMP);
    everything else goes through ToNumber — null → 0, booleans → 0/1,
    undefined/non-numeric strings → NaN, and any NaN makes the
    comparison False.  (Round 6: previously null operands were
    blanket-False, which diverged from both JS and the compiled
    path's ToNumber(null)=0 relational folding.)"""
    if isinstance(a, str) and isinstance(b, str):
        x, y = a, b
    else:
        x, y = _js_num(a), _js_num(b)
        if x != x or y != y:  # NaN never compares
            return False
    if op == "<":
        return x < y
    if op == ">":
        return x > y
    if op == "<=":
        return x <= y
    return x >= y


def _cond_eval(ast: Any, doc: dict) -> bool:
    tag = ast[0]
    if tag == "and":
        return _cond_eval(ast[1], doc) and _cond_eval(ast[2], doc)
    if tag == "or":
        return _cond_eval(ast[1], doc) or _cond_eval(ast[2], doc)
    if tag == "not":
        return not _cond_eval(ast[1], doc)
    if tag == "truthy":
        return _truthy(_ev(ast[1], doc))
    if tag == "cmp":
        op, l, r = ast[1], ast[2], ast[3]
        a, b = _ev(l, doc), _ev(r, doc)
        if op in ("===", "=="):
            return _js_eq(a, b)
        if op in ("!==", "!="):
            return not _js_eq(a, b)
        return _js_rel(op, a, b)
    raise JSCompileError(f"unsupported condition {tag!r}")


def _de_undef(v: Any) -> Any:
    """Emit boundary: undefined → null as a scalar and inside arrays;
    object members holding undefined are DROPPED (JSON.stringify
    semantics).  NaN/±Infinity → null, exactly as JSON.stringify (and
    collate.py's key rule) produce — never the non-standard
    'NaN'/'Infinity' JSON tokens.  Numbers widen to float — JS numbers
    are doubles, and this keeps a ddoc's view identical whether it ran
    the interpreted or the MapSpec-compiled path (which casts to
    double JVM-side)."""
    if v is _UNDEF:
        return None
    if isinstance(v, bool):
        return v
    if isinstance(v, int):
        return float(v)
    if isinstance(v, float):
        return v if math.isfinite(v) else None
    if isinstance(v, list):
        return [_de_undef(x) for x in v]
    if isinstance(v, dict):
        return {k: _de_undef(x) for k, x in v.items() if x is not _UNDEF}
    if hasattr(v, "to_json_value"):
        # JSDate: toJSON() at every serialization boundary — emit keys
        # (pouchdb-collate normalizeKey: Date → date.toJSON()), emit
        # values and reduce returns (JSON.stringify calls toJSON)
        return v.to_json_value()
    if hasattr(v, "last_index"):
        # JSRegExp: JSON.stringify(/re/) is '{}' — no own enumerable
        # properties — and normalizeKey treats it the same way
        return {}
    return v


class JSMapFunction:
    """A compiled JS map fn as a picklable Python callable.

    The compile target for RAW doc sources (``DocTable.raw_json``):
    field types there are dynamic per document, so instead of a typed
    MapSpec the parsed AST is interpreted over each doc dict with JS
    subset semantics — strict equality, JS truthiness, undefined for
    absent fields, the JSON.stringify undefined boundary.  Runs on the
    Arrow-batched Python map path.

    ``__repr__`` is the source itself so the registry signature
    (plans/registry.definition_repr) stays stable across processes —
    a closure's repr would embed a memory address and re-registering
    the same ddoc would spuriously rebuild the view.
    """

    def __init__(self, source: str) -> None:
        self.source = source
        self._emits = _Parser(source).parse()
        if not self._emits:
            raise JSCompileError(
                "map function contains no emit() call — a view with "
                "no emits indexes nothing"
            )

    def __call__(self, doc: dict, emit) -> None:
        try:
            for guards, key_ast, value_ast in self._emits:
                mark = next(
                    (g for g in guards
                     if isinstance(g, tuple)
                     and g[0] in ("foreach", "forloop", "forin")),
                    None,
                )
                if mark is None:
                    if all(_cond_eval(g, doc) for g in guards):
                        emit(
                            _de_undef(_ev(key_ast, doc)),
                            _de_undef(_ev(value_ast, doc)),
                        )
                    continue
                # forEach emit: pre-marker guards gate the loop, the
                # rest evaluate per element under the binding
                pre: list = []
                post: list = []
                past = False
                for g in guards:
                    if isinstance(g, tuple) \
                            and g[0] in ("foreach", "forloop",
                                         "forin"):
                        past = True
                        continue
                    (post if past else pre).append(g)
                if not all(_cond_eval(g, doc) for g in pre):
                    continue
                arr = (
                    doc.get(mark[1], _UNDEF)
                    if isinstance(doc, dict) else _UNDEF
                )
                keys: list | None = None
                if mark[0] == "forin":
                    # for (k in doc.f): objects enumerate own keys in
                    # ES order, arrays/strings their index strings;
                    # null/undefined/primitives iterate zero times
                    # (for-in never throws — but the Object.keys
                    # spelling, marked 'throw', does on null)
                    if (arr is None or arr is _UNDEF) \
                            and len(mark) > 3:
                        raise _MapThrow(
                            f"Object.keys(doc.{mark[1]}) on "
                            "null/undefined"
                        )
                    if isinstance(arr, dict):
                        keys = es_own_keys(arr)
                        arr = [arr[k] for k in keys]
                    elif isinstance(arr, (list, str)):
                        keys = [str(i) for i in range(len(arr))]
                        arr = list(arr)
                    else:
                        keys, arr = [], []
                elif mark[0] == "foreach":
                    if not isinstance(arr, list):
                        # null/undefined/scalar .forEach throws in JS
                        raise _MapThrow(
                            f"doc.{mark[1]}.forEach is not a function"
                        )
                elif not isinstance(arr, list):
                    # C-style loop: `i < doc.f.length` only THROWS
                    # when doc.f is null/undefined; a string bound
                    # indexes characters; any other scalar has
                    # length === undefined → zero iterations
                    if arr is None or arr is _UNDEF:
                        raise _MapThrow(
                            f"cannot read .length of doc.{mark[1]}"
                        )
                    arr = list(arr) if isinstance(arr, str) else []
                for pos, el in enumerate(arr):
                    docv = dict(doc)
                    docv[_ELEM_KEY] = el
                    docv[_EPOS_KEY] = float(pos)
                    if keys is not None:
                        docv[_EKEY_KEY] = keys[pos]
                    if all(_cond_eval(g, docv) for g in post):
                        emit(
                            _de_undef(_ev(key_ast, docv)),
                            _de_undef(_ev(value_ast, docv)),
                        )
        except _MapThrow:
            # upstream tryMap: a throwing map fn skips the doc's
            # remaining emits (earlier emits stand), not the build
            return

    def __repr__(self) -> str:
        return f"JSMapFunction({self.source!r})"


def compile_js_map_fn(source: str):
    """JS map source → interpreted Python map fn.

    Prefers the statement-level interpreter (functions/jsmap.py —
    var/for/closures, split/parseInt/JSON/…); sources it
    cannot parse fall back to this module's narrow expression
    interpreter so its error message (naming the construct) surfaces.
    """
    from mapreduce_spark.functions.jsmap import JSMapFunctionFull
    from mapreduce_spark.functions.jsreduce import (
        JSReduceError,
        JSRuntimeThrow,
    )

    try:
        return JSMapFunctionFull(source)
    except JSRuntimeThrow:
        raise
    except JSReduceError:
        return JSMapFunction(source)
