"""User-registered raw CouchDB-style doc sources (register_table +
DocTable.raw_json): the switchover path for a real PouchDB user — their
data is (_id, _rev, _deleted, seq, doc_json) rows, not typed fixture
tables.  Covers the Python map path (parsed body in, CouchDB doc shape),
the structured Variant path, include_docs verbatim bodies, and
incremental maintenance including deletion tombstones."""

import json

import pytest
from pyspark.sql import functions as F

from mapreduce_spark.engine import Engine
from mapreduce_spark.operators.mapphase import MapSpec
from mapreduce_spark.sources.docs import TABLES, raw_doc_table, register_table

N = 40


def _doc(i: int, *, score=None, deleted=False) -> dict:
    body = {
        "_id": f"doc-{i:04d}",
        "_rev": f"1-{i:032x}",
        "type": "post" if i % 3 else "comment",
        "score": score if score is not None else float(i % 7),
        "tags": [f"t{i % 4}", f"t{i % 5}"],
    }
    return {
        "_id": body["_id"],
        "_rev": body["_rev"],
        "_deleted": deleted,
        "seq": i,
        "doc_json": json.dumps(body, separators=(",", ":")),
    }


@pytest.fixture()
def raw_env(spark, tmp_path):
    register_table(raw_doc_table("userdocs"))
    sf = tmp_path / "sf"
    sf.mkdir()
    rows = [_doc(i) for i in range(1, N + 1)]
    spark.createDataFrame(
        rows,
        "_id string, _rev string, _deleted boolean, seq long, "
        "doc_json string",
    ).write.mode("overwrite").parquet(str(sf / "userdocs.parquet"))
    eng = Engine(spark, str(sf), str(tmp_path / "views"))
    yield eng, sf, rows
    TABLES.pop("userdocs", None)


def _mk_map_by_type():
    # local scope so cloudpickle ships it by value (test modules are
    # not importable on executors)
    def map_by_type(doc, emit):
        # CouchDB map input shape: parsed body with _id/_rev present
        assert doc["_id"].startswith("doc-")
        assert doc["_rev"].startswith(("1-", "2-"))
        emit(doc["type"], doc["score"])

    return map_by_type


def test_raw_python_map_reduce(raw_env):
    eng, _, rows = raw_env
    map_by_type = _mk_map_by_type()
    res = eng.query(
        {"map": ("userdocs", map_by_type), "reduce": "_sum"}, group=True
    )
    got = {r["key"]: r["value"] for r in res.rows()}
    exp = {}
    for r in rows:
        b = json.loads(r["doc_json"])
        exp[b["type"]] = exp.get(b["type"], 0.0) + b["score"]
    assert got == pytest.approx(exp)


def test_raw_structured_variant_map(raw_env):
    """MapSpec over the raw body via Variant extraction — the JVM-only
    path for raw sources, guard pushed into the scan."""
    eng, _, rows = raw_env
    spec = MapSpec(
        "userdocs",
        ("str", "variant_get(parse_json(doc_json), '$.type', 'string')"),
        ("num", "variant_get(parse_json(doc_json), '$.score', 'double')"),
        where="variant_get(parse_json(doc_json), '$.score', 'double') > 3",
    )
    res = eng.query({"map": spec, "reduce": "_count"}, group=True)
    got = {r["key"]: r["value"] for r in res.rows()}
    exp = {}
    for r in rows:
        b = json.loads(r["doc_json"])
        if b["score"] > 3:
            exp[b["type"]] = exp.get(b["type"], 0) + 1
    assert got == exp


def test_raw_include_docs_verbatim(raw_env):
    eng, _, rows = raw_env
    map_by_type = _mk_map_by_type()
    res = eng.query({"map": ("userdocs", map_by_type)},
                    key="comment", include_docs=True)
    out = res.rows()
    assert out
    stored = {r["_id"]: json.loads(r["doc_json"]) for r in rows}
    for r in out:
        assert r["doc"] == stored[r["id"]]
        assert r["doc"]["_rev"].startswith("1-")


def test_raw_incremental_with_delete(raw_env, spark, tmp_path):
    eng, sf, rows = raw_env
    map_by_type = _mk_map_by_type()
    eng.put_design("d", {"by_type": {"map": ("userdocs", map_by_type),
                                     "reduce": "_count"}})
    eng.update_view("d/by_type")
    before = {
        r["key"]: r["value"]
        for r in eng.query("d/by_type", group=True, update=False).rows()
    }

    # v2: one edit (score bump, new rev/seq), one delete, one new doc
    v2 = rows + [
        dict(_doc(3, score=99.0), seq=N + 1, _rev="2-" + "0" * 32),
        dict(_doc(6, deleted=True), seq=N + 2),
        _doc(N + 3),
    ]
    spark.createDataFrame(
        v2,
        "_id string, _rev string, _deleted boolean, seq long, "
        "doc_json string",
    ).write.mode("overwrite").parquet(str(sf / "userdocs.parquet"))

    got = {
        r["key"]: r["value"]
        for r in eng.query("d/by_type", group=True).rows()
    }
    # from-scratch truth over the post-change corpus
    eng2 = Engine(spark, str(sf), str(tmp_path / "views2"))
    exp = {
        r["key"]: r["value"]
        for r in eng2.query(
            {"map": ("userdocs", map_by_type), "reduce": "_count"},
            group=True,
        ).rows()
    }
    assert got == exp and got != before
    # the deleted doc's emit is gone
    n_del = eng.query("d/by_type", key="comment", reduce=False,
                      update=False)
    assert all(r["id"] != "doc-0006" for r in n_del.rows())
