"""Byte-level BPE tokenizer + pack_sequences real-tokenizer hook
(VERDICT r13 #5): encoder invariants, and the packing invariants
(no bin overflow, exact offsets, stream contiguity) under genuine
subword counts rather than the count-equivalent test hook."""

import pytest
from pyspark.sql import functions as F

from mapreduce_spark.extensions import sampling
from mapreduce_spark.extensions.bpe import BPETokenizer


@pytest.fixture(scope="module")
def tok():
    return BPETokenizer()


def test_encode_decode_round_trip(tok):
    for s in (
        "the fast key order sort table scan merge",
        "internationalization shenanigans",   # fully out-of-vocab
        "naïve café — déjà vu ☃",              # multi-byte UTF-8
        "x",
        "",
    ):
        ids = tok.encode(s)
        assert tok.decode(ids) == " ".join(s.split())
        assert all(isinstance(i, int) and 0 <= i < 256 + len(tok.ranks)
                   for i in ids)


def test_encoder_is_subword_not_word(tok):
    """In-vocab fixture words compress to one token; unseen words
    split into multiple trained fragments (never an error) — i.e. it
    behaves like BPE, not like a word counter."""
    assert tok.count("scan") == 1
    assert tok.count("scan scan scan") == 3
    oov = tok.count("internationalization")
    assert oov > 1, "unseen word must split into subword fragments"
    assert oov <= len(" internationalization".encode())  # never worse than bytes


def test_count_batch_contract(tok):
    got = list(tok.count_batch([None, "", "the fast", "scan"]))
    assert got == [0, 0, 2, 1]


def test_merge_order_respected(tok):
    """Greedy lowest-rank-first merging: encoding any training-corpus
    word must reproduce exactly the training segmentation (single
    token, since training converged on this corpus)."""
    for w in ("the", "window", "batch", "stream", "spark"):
        assert tok.count(w) == 1, w


def test_pack_sequences_invariants_under_bpe(spark, sf_dir, tok):
    """Packing with real BPE counts: per-stratum offsets are the exact
    prefix sums of the BPE counts in md5 order (no bin overflow: every
    off < budget; bin == floor(cum_start/budget); stream contiguous)."""
    budget = 256
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "lang", "text"
    )
    out = sampling.pack_sequences(
        docs, budget, token_count_fn=tok.count_batch,
        stratum_col="lang", id_col="doc_id",
    ).select("doc_id", "lang", "bin", "off").collect()
    texts = {r["doc_id"]: (r["lang"], r["text"])
             for r in docs.collect()}

    import hashlib

    def rank(doc_id):  # sampling._rank_key replica: md5("id:salt")
        return hashlib.md5(f"{doc_id}:".encode()).hexdigest()

    by_stratum = {}
    for doc_id, (lang, text) in texts.items():
        by_stratum.setdefault(lang, []).append(doc_id)
    want = {}
    for lang, ids in by_stratum.items():
        ids.sort(key=lambda d: (rank(d), d))
        cum = 0
        for d in ids:
            want[d] = (cum // budget, cum % budget)
            cum += tok.count(texts[d][1])
    got = {r["doc_id"]: (r["bin"], r["off"]) for r in out}
    assert got == want
    assert all(off < budget for _, off in got.values())
