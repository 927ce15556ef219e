"""Decontamination + corpus-repeated n-gram operators
(extensions/decontam.py) — known-answer checks, short-doc edge
cases, and the 100 TB plan shape."""

import pytest
from pyspark.sql import functions as F

from mapreduce_spark.extensions import decontam


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "a b c d e"),          # grams: abc bcd cde
        (1, "a b c x y"),          # abc bcx cxy
        (2, "q r s t"),            # qrs rst
        (3, "z z"),                # too short for n=3 → 0 grams
        (4, "a b c d e"),          # exact dup of 0
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _by_id(df):
    return {r["doc_id"]: r.asDict() for r in df.collect()}


def test_contamination_known_answers(docs, spark):
    bench = docs.filter(F.col("doc_id") == 0)  # grams abc bcd cde
    got = _by_id(decontam.contamination(docs, bench, n=3))
    assert got[0]["ngrams"] == 3 and got[0]["contam_hits"] == 3
    assert got[0]["contamination"] == 1.0
    assert got[1]["contam_hits"] == 1          # only 'a b c'
    assert got[1]["contamination"] == pytest.approx(1 / 3)
    assert got[2]["contam_hits"] == 0
    assert got[2]["contamination"] == 0.0
    # a doc with no full window survives with zero totals, not a
    # dropped row
    assert got[3] == {"doc_id": 3, "ngrams": 0, "contam_hits": 0,
                      "contamination": 0.0}
    assert got[4]["contamination"] == 1.0
    assert len(got) == 5


def test_contamination_shuffle_join_path(docs):
    bench = docs.filter(F.col("doc_id") == 0)
    small = decontam.contamination(docs, bench, n=3,
                                   broadcast_benchmark=False)
    big = decontam.contamination(docs, bench, n=3)
    assert _by_id(small) == _by_id(big)


def test_repeated_ngrams_known_answers(docs):
    got = _by_id(decontam.repeated_ngrams(docs, n=3, min_df=2))
    # 'a b c' is in docs 0, 1, 4; 'b c d'/'c d e' in 0 and 4
    assert got[0]["rep_hits"] == 3 and got[0]["rep_fraction"] == 1.0
    assert got[4]["rep_hits"] == 3
    assert got[1]["rep_hits"] == 1
    assert got[1]["rep_fraction"] == pytest.approx(1 / 3)
    assert got[2]["rep_hits"] == 0 and got[2]["rep_fraction"] == 0.0
    assert got[3]["ngrams"] == 0 and got[3]["rep_fraction"] == 0.0
    # min_df above every df: nothing repeated
    none = _by_id(decontam.repeated_ngrams(docs, n=3, min_df=4))
    assert all(v["rep_hits"] == 0 for v in none.values())


def test_plan_shape(docs):
    """The scale contract: the corpus side of contamination pays ONE
    wide exchange (the per-doc re-group) — the benchmark probe is a
    broadcast hash join — and nothing runs in Python.

    Asserted on a clean cache: repeated_ngrams persists its postings
    frame (by design, like the minhash shingle frame), and Spark's
    CacheManager substitutes any later identical subtree with the
    cached blocks — legitimate reuse, but it would make this test's
    InMemory check depend on test order rather than on
    contamination's own plan."""
    docs.sparkSession.catalog.clearCache()
    c = decontam.contamination(docs, docs.limit(1), n=3)
    p = c._jdf.queryExecution().executedPlan().toString()
    assert p.count("BroadcastHashJoin") == 1
    assert p.count("Exchange hashpartitioning") <= 2  # bench distinct
    # (small side) + the per-doc re-group; corpus scan shuffles once
    assert "EvalPython" not in p and "InMemory" not in p
    r = decontam.repeated_ngrams(docs, n=3)
    p2 = r._jdf.queryExecution().executedPlan().toString()
    assert "EvalPython" not in p2
    # partial aggregation runs before the gram-count exchange — the
    # skew absorber for hot stopword grams
    assert p2.count("HashAggregate") >= 4
