"""Streaming maintenance (M1-as-a-stream) and windowed aggregates."""

import os
import shutil

import pytest
from pyspark.sql import functions as F

from mapreduce_spark.operators.mapphase import MapSpec
from mapreduce_spark.streaming import (
    file_changes_stream,
    maintain_view,
    windowed_reduce,
)

VIEW = {
    "map": MapSpec(
        "lineitem",
        [("str", "l_returnflag"), ("str", "l_linestatus")],
        ("num", "l_quantity"),
    ),
    "reduce": "_sum",
}


def _rows(res):
    return sorted(
        (tuple(r["key"]), round(r["value"], 6)) for r in res.rows()
    )


def test_stream_maintained_view_equals_batch(engine, spark, sf_dir,
                                             tmp_path):
    """Feed lineitem through a file stream in two chunks; the
    stream-maintained persisted view must equal a one-shot temporary
    build (incremental == rebuild, through the streaming path)."""
    raw = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    chunk1 = raw.filter(F.col("l_orderkey") % 2 == 0)
    chunk2 = raw.filter(F.col("l_orderkey") % 2 == 1)
    chunk1.coalesce(1).write.mode("append").parquet(in_dir)

    engine.put_design("s", {"v": VIEW})
    stream = file_changes_stream(spark, in_dir, "lineitem")
    ckpt = str(tmp_path / "ckpt")
    q = maintain_view(engine, "s/v", stream, ckpt)
    q.awaitTermination(120)

    partial = engine.query("s/v", group_level=2, stale="ok")
    assert len(partial.rows()) > 0

    chunk2.coalesce(1).write.mode("append").parquet(in_dir)
    stream2 = file_changes_stream(spark, in_dir, "lineitem")
    q2 = maintain_view(engine, "s/v", stream2, ckpt)
    q2.awaitTermination(120)

    got = engine.query("s/v", group_level=2, stale="ok")
    want = engine.query(VIEW, group_level=2)  # temporary full build
    assert _rows(got) == _rows(want)


def test_stream_maintained_view_survives_midstream_crash(
        engine, spark, sf_dir, tmp_path):
    """VERDICT r12 #8: kill-and-restart recovery for maintain_view.

    Simulates the worst crash point — the driver dies AFTER a
    micro-batch's update_view applied its delta to the view store but
    BEFORE Spark committed the source offsets.  On restart from the
    same checkpointLocation, Spark REPLAYS that batch, so the engine
    applies the same changes twice; the tombstone-before-insert
    convergence property must make the replay harmless and the final
    view hash-equal to a one-shot rebuild."""
    raw = spark.read.parquet(f"{sf_dir}/lineitem.parquet")
    in_dir = str(tmp_path / "in")
    os.makedirs(in_dir)
    # 6 files → 6 micro-batches (maxFilesPerTrigger=1)
    for m in range(6):
        (raw.filter(F.col("l_orderkey") % 6 == m)
            .coalesce(1).write.mode("append").parquet(in_dir))

    engine.put_design("s", {"v": VIEW})
    ckpt = str(tmp_path / "ckpt")

    applies = {"n": 0}
    real_update = engine.update_view

    def crash_after_third_apply(vdef, **kw):
        out = real_update(vdef, **kw)
        applies["n"] += 1
        if applies["n"] == 3:
            # state is already in the store; the offset commit for
            # this batch never happens
            raise RuntimeError("simulated crash after apply")
        return out

    engine.update_view = crash_after_third_apply
    try:
        q = maintain_view(
            engine, "s/v",
            file_changes_stream(spark, in_dir, "lineitem"), ckpt)
        with pytest.raises(Exception, match="simulated crash"):
            q.awaitTermination(120)
            raise AssertionError("stream did not fail")
    finally:
        engine.update_view = real_update

    crashed_applies = applies["n"]
    assert crashed_applies == 3

    # restart: same checkpoint, fresh stream handle (a new driver)
    def counting(vdef, **kw):
        applies["n"] += 1
        return real_update(vdef, **kw)

    engine.update_view = counting
    try:
        q2 = maintain_view(
            engine, "s/v",
            file_changes_stream(spark, in_dir, "lineitem"), ckpt)
        q2.awaitTermination(120)
    finally:
        engine.update_view = real_update

    # the crashed batch replayed: 6 files need 6 commits, the third
    # ran twice
    assert applies["n"] >= 7

    got = engine.query("s/v", group_level=2, stale="ok")
    want = engine.query(VIEW, group_level=2)  # temporary full build
    assert _rows(got) == _rows(want)


def test_windowed_reduce_stream_matches_batch(spark, sf_dir, tmp_path):
    """The same windowed_reduce over a stream (complete mode) and over
    the static DataFrame must agree — Spark's unified batch/stream
    semantics, pinned."""
    from mapreduce_spark.sources.docs import (
        load_table,
        nanos_as_long,
        ts_to_micros,
    )

    src = f"{sf_dir}/events.parquet"
    batch = load_table(spark, sf_dir, "events")
    want = sorted(
        map(
            tuple,
            windowed_reduce(
                batch, ts_col="ts", window="1 day",
                keys=["event_type"], value_col="value",
            ).collect(),
        )
    )

    # stream side: nanos parquet needs the legacy conf for the WHOLE
    # stream lifetime (footers re-resolve per micro-batch) — explicit
    # scoped opt-in (the file source wants a directory, so stage a copy)
    stream_dir = str(tmp_path / "events_in")
    os.makedirs(stream_dir)
    shutil.copy(src, os.path.join(stream_dir, "part-0.parquet"))
    with nanos_as_long(spark):
        raw_schema = spark.read.parquet(src).schema
        stream = ts_to_micros(
            spark.readStream.schema(raw_schema).parquet(stream_dir),
            "events",
        )
        agg = windowed_reduce(
            stream, ts_col="ts", window="1 day", keys=["event_type"],
            value_col="value",
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("win_test")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = sorted(map(tuple, spark.sql("SELECT * FROM win_test").collect()))
    assert got == want
    assert len(got) > 0


def test_session_reduce_stream_matches_batch(spark, sf_dir, tmp_path):
    """session_window over a stream (complete mode) == the batch run
    on the same data."""
    from mapreduce_spark.sources.docs import (
        load_table,
        nanos_as_long,
        ts_to_micros,
    )
    from mapreduce_spark.streaming import session_reduce

    src = f"{sf_dir}/events.parquet"
    batch = load_table(spark, sf_dir, "events")
    want = sorted(
        map(
            tuple,
            session_reduce(
                batch, ts_col="ts", gap="30 minutes",
                keys=["user_id"], value_col="value",
            ).collect(),
        )
    )
    assert want, "fixture should produce sessions"

    stream_dir = str(tmp_path / "sess_in")
    os.makedirs(stream_dir)
    shutil.copy(src, os.path.join(stream_dir, "part-0.parquet"))
    with nanos_as_long(spark):
        raw_schema = spark.read.parquet(src).schema
        stream = ts_to_micros(
            spark.readStream.schema(raw_schema).parquet(stream_dir),
            "events",
        )
        agg = session_reduce(
            stream, ts_col="ts", gap="30 minutes", keys=["user_id"],
            value_col="value",
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("sess_test")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "sess_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
    got = sorted(
        map(tuple, spark.sql("SELECT * FROM sess_test").collect())
    )
    assert got == want


def test_watermark_drops_late_rows_in_append_mode(spark, tmp_path):
    """Late-data semantics: in append mode a window finalizes once the
    watermark passes its end; a row arriving after that is DROPPED.
    Two micro-batches (maxFilesPerTrigger=1): batch 1 advances the
    watermark past the 09:00 window, batch 2's 09:30 straggler must
    not resurrect it."""
    in_dir = str(tmp_path / "late_in")
    os.makedirs(in_dir)
    schema = "ts timestamp, k string, v double"

    def write_file(name, rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

    import datetime as dt

    T = lambda h, m: dt.datetime(2026, 1, 1, h, m)  # noqa: E731

    def run(name):
        out: list = []
        stream = spark.readStream.schema(schema).parquet(in_dir)
        agg = windowed_reduce(
            stream, ts_col="ts", window="1 hour", keys=["k"],
            value_col="v", watermark="1 hour",
        )
        q = (
            agg.writeStream.foreachBatch(
                lambda df, _id: out.extend(df.collect())
            )
            .outputMode("append")
            .option("checkpointLocation", str(tmp_path / "late_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return {
            (r.window_start.hour, round(r.sum_v, 1)) for r in out
        }

    # run 1: max event time 12:00 → watermark 11:00; availableNow's
    # flush batch finalizes the 09:00 window with the on-time 1.0 row
    write_file("f1", [(T(9, 15), "a", 1.0), (T(12, 0), "a", 2.0)])
    assert run("late_run1") == {(9, 1.0)}
    # run 2 (same checkpoint): the 09:30 straggler is behind the
    # watermark → dropped outright (its window already closed); the
    # 12:00 window stays open, so nothing is emitted at all
    write_file("f2", [(T(9, 30), "a", 100.0), (T(12, 10), "a", 3.0)])
    assert run("late_run2") == set()
    # run 3: a 15:00 event closes the 12:00 window — it contains ONLY
    # the on-time rows (2.0 + 3.0); the dropped 100.0 never resurfaces
    write_file("f3", [(T(15, 0), "a", 5.0)])
    assert run("late_run3") == {(12, 5.0)}


def test_running_totals_stateful_across_batches(spark, sf_dir,
                                                tmp_path):
    """applyInPandasWithState carries per-key state across
    micro-batches: after draining a 2-file stream the running totals
    equal a plain batch groupBy."""
    from mapreduce_spark.sources.docs import nanos_as_long
    from mapreduce_spark.streaming import running_totals

    with nanos_as_long(spark):
        raw = spark.read.parquet(f"{sf_dir}/events.parquet")
        in_dir = str(tmp_path / "rt_in")
        os.makedirs(in_dir)
        # rewritten files carry plain INT64 — the stream below needs
        # no legacy conf
        raw.filter(F.col("event_id") % 2 == 0).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)
        raw.filter(F.col("event_id") % 2 == 1).coalesce(1).write.mode(
            "append"
        ).parquet(in_dir)

    stream = (
        spark.readStream.schema(raw.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(in_dir)
    )
    out = running_totals(stream, key_col="event_type",
                         value_col="value")
    q = (
        out.writeStream.format("memory")
        .queryName("rt_test")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "rt_ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    # update mode appends one row per key per batch; the LAST row per
    # key is the final running total
    rows = spark.sql("SELECT * FROM rt_test").collect()
    final = {}
    for r in rows:  # memory sink preserves batch order
        final[r.key] = (r.total_cnt, round(r.total_sum, 6))
    want = {
        r.event_type: (r.cnt, round(r.sum_v, 6))
        for r in raw.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.sum("value").alias("sum_v"),
        )
        .collect()
    }
    assert final == want


def test_stream_raw_changes_feed_maintenance(spark, tmp_path):
    """A raw CouchDB-style changes feed ((_id,_rev,_deleted,seq,
    doc_json) files landing in a directory) streams into a maintained
    view: edits supersede, deletes tombstone, and the result converges
    with a from-scratch build over the full log."""
    import json

    from mapreduce_spark.engine import Engine
    from mapreduce_spark.sources.docs import (
        TABLES,
        raw_doc_table,
        register_table,
    )

    register_table(raw_doc_table("feed"))
    try:
        sf = tmp_path / "sf"
        sf.mkdir()
        in_dir = str(sf / "feed.parquet")
        schema = ("_id string, _rev string, _deleted boolean, "
                  "seq long, doc_json string")

        def doc(i, kind, score, *, seq, rev="1-r", deleted=False):
            return {
                "_id": f"d{i:03d}", "_rev": rev, "_deleted": deleted,
                "seq": seq,
                "doc_json": json.dumps(
                    {"_id": f"d{i:03d}", "kind": kind, "score": score}
                ),
            }

        batch1 = [doc(i, "a" if i % 2 else "b", float(i), seq=i)
                  for i in range(1, 31)]
        spark.createDataFrame(batch1, schema).coalesce(1) \
            .write.mode("append").parquet(in_dir)

        eng = Engine(spark, str(sf), str(tmp_path / "views"))
        spec = MapSpec(
            "feed",
            ("str", "variant_get(parse_json(doc_json), '$.kind', "
                    "'string')"),
            ("num", "variant_get(parse_json(doc_json), '$.score', "
                    "'double')"),
        )
        eng.put_design("s", {"by_kind": {"map": spec, "reduce": "_sum"}})
        stream = file_changes_stream(spark, in_dir, "feed")
        ckpt = str(tmp_path / "ckpt")
        maintain_view(eng, "s/by_kind", stream,
                      ckpt).awaitTermination(120)
        first = _rows(eng.query("s/by_kind", group=True, update=False))

        # batch 2: edit d001 (score 1000), delete d002, add d031
        batch2 = [
            doc(1, "a", 1000.0, seq=31, rev="2-r"),
            doc(2, "b", 0.0, seq=32, rev="2-r", deleted=True),
            doc(31, "b", 7.5, seq=33),
        ]
        spark.createDataFrame(batch2, schema).coalesce(1) \
            .write.mode("append").parquet(in_dir)
        stream = file_changes_stream(spark, in_dir, "feed")
        maintain_view(eng, "s/by_kind", stream,
                      ckpt).awaitTermination(120)
        got = _rows(eng.query("s/by_kind", group=True, update=False))
        assert got != first

        # from-scratch truth over the whole log (latest-per-_id)
        eng2 = Engine(spark, str(sf), str(tmp_path / "views2"))
        exp = _rows(eng2.query({"map": spec, "reduce": "_sum"},
                               group=True))
        assert got == exp
    finally:
        TABLES.pop("feed", None)


# ---------------------------------------------------------------------------
# streaming dedup
# ---------------------------------------------------------------------------

def test_stream_exact_dedup_matches_batch(spark, sf_dir, tmp_path):
    """Stateful stream dedup keeps exactly one row per content
    fingerprint — the same fp set as the deterministic batch rule."""
    from mapreduce_spark.streaming.dedup import stream_exact_dedup

    src = f"{sf_dir}/documents.parquet"
    base = spark.read.parquet(src)
    # plant exact duplicates: 20 docs re-ingested under higher ids
    batch = base.unionByName(
        base.filter(F.col("doc_id") < 20)
        .withColumn("doc_id", F.col("doc_id") + 100000)
    )
    planted = str(tmp_path / "docs_planted")
    batch.write.parquet(planted)
    batch = spark.read.parquet(planted)
    src = planted
    b = stream_exact_dedup(batch, text="text", id_col="doc_id")
    want_fps = sorted(r["fp"] for r in b.select("fp").collect())
    assert len(want_fps) == len(set(want_fps))
    # the batch rule is keep-FIRST: every kept id is the min of its
    # fp-group
    grp = batch.select(
        F.md5("text").alias("fp"), "doc_id"
    ).groupBy("fp").agg(F.min("doc_id").alias("min_id"))
    kept = {(r["fp"], r["doc_id"]) for r in b.select("fp", "doc_id").collect()}
    assert kept == {(r["fp"], r["min_id"]) for r in grp.collect()}

    schema = batch.schema
    stream = spark.readStream.schema(schema).parquet(planted)
    out = stream_exact_dedup(stream, text="text", id_col="doc_id")
    q = (
        out.writeStream.format("memory").queryName("dedup_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_dd"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = [r["fp"] for r in spark.sql(
        "SELECT fp FROM dedup_test").collect()]
    assert sorted(got) == want_fps  # one row per fp, same fp set
    assert len(want_fps) < batch.count()  # fixture has exact dups


def test_incremental_minhash_dedup_replays_two_step_rule(
        spark, sf_dir, tmp_path):
    """foreachBatch near-dup dedup over two batches equals a
    driver-side replay of the rule (drop index near-dups, then keep
    one representative per within-batch component) on EXACT Jaccard
    pairs — minhash candidates are recall-1 on this fixture (pinned
    by test_minhash_equals_exact_jaccard)."""
    from mapreduce_spark.extensions import dedup as bdedup
    from mapreduce_spark.streaming.dedup import incremental_minhash_dedup

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mid = 250
    b1 = docs.filter(F.col("doc_id") < mid)
    b2 = docs.filter(F.col("doc_id") >= mid)
    idx_dir = str(tmp_path / "sig_idx")
    handle = incremental_minhash_dedup(idx_dir, 0.5)
    handle(b1, 0)
    handle(b1, 0)  # micro-batch RETRY must be idempotent
    handle(b2, 1)
    got = sorted(
        r["doc_id"]
        for r in spark.read.parquet(idx_dir).select("doc_id").collect()
    )
    assert len(got) == len(set(got))

    # driver-side replay on exact pairs
    pairs = {
        frozenset((r.id_a, r.id_b))
        for r in bdedup.jaccard_pairs(docs, 0.5).collect()
    }
    def near(a, b):
        return frozenset((a, b)) in pairs
    kept = []
    for ids in (
        sorted(r["doc_id"] for r in b1.select("doc_id").collect()),
        sorted(r["doc_id"] for r in b2.select("doc_id").collect()),
    ):
        novel = [d for d in ids
                 if not any(near(d, k) for k in kept)]
        # connected components among novel, keep min of each
        from tests.test_extensions import _uf_min_labels
        edges = [(a, b) for a in novel for b in novel
                 if a < b and near(a, b)]
        labels = _uf_min_labels(edges)
        kept.extend(d for d in novel if labels.get(d, d) == d)
    assert got == sorted(kept)
    assert len(got) < docs.count()  # something was deduped


def test_stream_exact_dedup_ttl_path(spark, tmp_path):
    """With an event-time column the stream dedup takes the
    watermark-TTL route (dropDuplicatesWithinWatermark): duplicates
    arriving within the delay are dropped, output is one row per
    fingerprint."""
    from mapreduce_spark.streaming.dedup import stream_exact_dedup

    rows = [
        (1, "alpha beta", "2026-01-01 10:00:00"),
        (2, "alpha beta", "2026-01-01 10:10:00"),   # dup within TTL
        (3, "gamma delta", "2026-01-01 10:20:00"),
        (4, "alpha beta", "2026-01-01 10:25:00"),   # dup within TTL
        (5, "epsilon", "2026-01-01 11:00:00"),
    ]
    src = str(tmp_path / "ttl_in")
    df = spark.createDataFrame(
        rows, "doc_id long, text string, ts string"
    ).withColumn("ts", F.col("ts").cast("timestamp"))
    df.write.parquet(src)
    stream = spark.readStream.schema(
        spark.read.parquet(src).schema).parquet(src)
    out = stream_exact_dedup(
        stream, text="text", id_col="doc_id", ts_col="ts",
        watermark="1 hour",
    )
    q = (
        out.writeStream.format("memory").queryName("ttl_test")
        .outputMode("append")
        .option("checkpointLocation", str(tmp_path / "ckpt_ttl"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("SELECT fp, doc_id FROM ttl_test").collect()
    fps = [r["fp"] for r in got]
    assert len(fps) == len(set(fps)) == 3
