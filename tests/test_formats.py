"""Source-format adapters: the engine must produce identical results
whether a table lives as parquet, JSON-lines, or CSV."""

import pytest

from mapreduce_spark.engine import Engine
from mapreduce_spark.operators.mapphase import MapSpec
from mapreduce_spark.sources.docs import load_table
from mapreduce_spark.sources.formats import convert_table, export_table


def _rows(res):
    return sorted(
        (
            tuple(r["key"]) if isinstance(r["key"], list) else r["key"],
            round(r["value"], 6) if isinstance(r["value"], float)
            else r["value"],
        )
        for r in res.rows()
    )


@pytest.mark.parametrize("fmt", ["json", "csv"])
def test_engine_runs_identically_off_converted_sources(
    spark, sf_dir, tmp_path, fmt
):
    alt = str(tmp_path / fmt)
    for tbl in ("orders", "nation"):
        convert_table(spark, sf_dir, tbl, alt, fmt)
    view = {
        "map": MapSpec("orders", ("str", "o_orderpriority"),
                       ("num", "o_totalprice"),
                       where="o_orderstatus = 'O'"),
        "reduce": "_sum",
    }
    want = _rows(Engine(spark, sf_dir,
                        str(tmp_path / "p")).query(view, group=True))
    got = _rows(Engine(spark, alt,
                       str(tmp_path / "a")).query(view, group=True))
    assert got == want and want
    # timestamp round trip: an iso-keyed range query over orders
    rng = {"map": MapSpec("orders", ("iso", "o_orderdate"),
                          ("num", "o_totalprice"))}
    w2 = Engine(spark, sf_dir, str(tmp_path / "p2")).query(
        rng, startkey="1995-01-01", endkey="1995-03-31", limit=50
    ).rows()
    g2 = Engine(spark, alt, str(tmp_path / "a2")).query(
        rng, startkey="1995-01-01", endkey="1995-03-31", limit=50
    ).rows()
    assert [(r["key"], r["id"]) for r in g2] == [
        (r["key"], r["id"]) for r in w2
    ] and w2


def test_json_roundtrip_preserves_json_string_cols(spark, sf_dir,
                                                   tmp_path):
    """events.props is a JSON *string* column in the raw schema; a
    JSON-lines round trip must bring it back as a string (quoted on
    write, normalized on read)."""
    alt = str(tmp_path / "j")
    convert_table(spark, sf_dir, "events", alt, "json")
    back = load_table(spark, alt, "events")
    assert back.schema["props"].dataType.simpleString() == "string"
    assert back.schema["ts"].dataType.simpleString().startswith(
        "timestamp"
    )
    a = load_table(spark, sf_dir, "events").select(
        "event_id", "props"
    ).orderBy("event_id").collect()
    b = back.select("event_id", "props").orderBy("event_id").collect()
    import json as _json

    assert [(r.event_id, _json.loads(r.props)) for r in a] == [
        (r.event_id, _json.loads(r.props)) for r in b
    ]


def test_csv_rejects_array_tables(spark, sf_dir, tmp_path):
    emb = load_table(spark, sf_dir, "embeddings")
    with pytest.raises(ValueError, match="array"):
        export_table(emb, str(tmp_path / "e.csv"), "csv",
                     table="embeddings")
