"""Text analysis operators over the ``documents`` table.

All hot-path expressions are JVM-side (``pyspark.sql.functions`` only:
split / transform / filter / aggregate / md5) so they run inside
whole-stage codegen with full column pruning — a scan of ``documents``
for token counting reads exactly the ``text`` column.  Hashing is
``md5`` everywhere because Spark and DuckDB implement it identically,
which makes every operator here value-checkable against a SQL oracle.

Scale notes (100 TB): every operator below is a narrow map over the
corpus — no shuffle, no driver traffic; throughput is bounded by
parquet scan + codegen'd string ops.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Whitespace tokens — the fixture corpus is space-separated ASCII.
def tokens(text: Column | str = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


# BPE-ish subword-boundary tokens: word pieces + isolated punctuation.
BPE_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def bpe_tokens(text: Column | str = "text") -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.regexp_extract_all(c, F.lit(BPE_RE), 0)


def shingles(n: int, text: Column | str = "text") -> Column:
    """Distinct word n-gram shingles, pure JVM (transform over a
    sequence of start offsets; no explode, no Python)."""
    w = tokens(text)
    grams = F.transform(
        F.sequence(F.lit(1), F.size(w) - F.lit(n - 1)),
        lambda i: F.concat_ws(" ", F.slice(w, i, F.lit(n))),
    )
    return F.array_distinct(
        F.when(F.size(w) >= n, grams).otherwise(
            F.array().cast("array<string>")
        )
    )


# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic.  Deliberately small + deterministic (oracle-replicable).
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "and", "of", "to", "in", "is"),
    "es": ("el", "la", "de", "que", "y", "los", "es"),
    "fr": ("le", "la", "de", "et", "un", "les", "est"),
    "de": ("der", "die", "das", "und", "ein", "ist", "zu"),
}


def _ratio_in(w: Column, words: tuple[str, ...]) -> Column:
    """Fraction of tokens contained in ``words`` (duplicates count)."""
    hits = F.size(
        F.filter(w, lambda x: x.isin(*[F.lit(s) for s in words]))
    )
    return hits / F.greatest(F.size(w), F.lit(1))


def lang_scores(text: Column | str = "text") -> dict[str, Column]:
    w = tokens(text)
    return {lang: _ratio_in(w, sw) for lang, sw in LANG_STOPWORDS.items()}


def lang_id(text: Column | str = "text") -> tuple[Column, Column]:
    """(predicted_lang, score) — argmax stopword-ratio; ties break in
    fixed lang order; all-zero scores → 'und' (undetermined)."""
    scores = lang_scores(text)
    best_lang, best_score = F.lit("und"), F.lit(0.0)
    # iterate in fixed order; strict > keeps the earlier lang on ties
    for lang, sc in scores.items():
        take = sc > best_score
        best_lang = F.when(take, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(take, sc).otherwise(best_score)
    return best_lang, best_score


def quality_features(df: DataFrame, text: str = "text") -> DataFrame:
    """Per-doc quality features + a composite [0,1] quality score.

    Features follow the usual pretraining-corpus filters (length,
    mean word length, stopword ratio, alpha ratio, distinct-token
    ratio); the composite is a fixed deterministic blend so the
    operator is oracle-checkable.
    """
    w = tokens(text)
    n_tok = F.size(w)
    n_chars = F.length(F.col(text))
    mean_len = (n_chars - (n_tok - 1)) / F.greatest(n_tok, F.lit(1))
    stop_ratio = _ratio_in(w, LANG_STOPWORDS["en"])
    distinct_ratio = F.size(F.array_distinct(w)) / F.greatest(
        n_tok, F.lit(1)
    )
    alpha_ratio = F.length(
        F.regexp_replace(F.col(text), r"[^A-Za-z]", "")
    ) / F.greatest(n_chars, F.lit(1))
    length_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    quality = (
        F.lit(0.35) * length_score
        + F.lit(0.25) * distinct_ratio
        + F.lit(0.25) * alpha_ratio
        + F.lit(0.15) * F.least(stop_ratio * 5, F.lit(1.0))
    )
    return df.select(
        "doc_id",
        n_tok.cast("long").alias("n_tokens"),
        F.size(bpe_tokens(text)).cast("long").alias("n_bpe_tokens"),
        F.round(mean_len, 4).alias("mean_tok_len"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(distinct_ratio, 4).alias("distinct_ratio"),
        F.round(quality, 4).alias("quality"),
    )


def fingerprints(df: DataFrame, text: str = "text",
                 n: int = 3) -> DataFrame:
    """Document fingerprints: full-text md5 + a rolling-window content
    fingerprint (min md5 over word n-gram shingles — a 1-permutation
    MinHash, robust to doc reordering at the margins)."""
    sh = shingles(n, text)
    rolling = F.array_min(
        F.transform(sh, lambda s: F.substring(F.md5(s), 1, 16))
    )
    return df.select(
        "doc_id",
        F.md5(F.col(text)).alias("text_md5"),
        F.coalesce(rolling, F.lit("")).alias("rolling_fp"),
    )


def repetition_features(df: DataFrame, text: str = "text") -> DataFrame:
    """Per-doc repetition signals — the published pretraining-corpus
    repetition filters (Gopher-style rules, public papers): the
    fraction of duplicated word bigrams and the frequency share of
    the single most repeated token.  Both are narrow single-scan JVM
    expressions (zip_with bigrams; a per-distinct-token filter count
    — O(distinct·n) per doc, fine at document scale), no shuffle, and
    exactly mirrored in DuckDB list functions for the oracle."""
    w = tokens(text)
    n = F.size(w)
    pair_len = F.greatest(n - 1, F.lit(0))
    bi = F.zip_with(
        F.slice(w, 1, pair_len),
        F.slice(w, 2, pair_len),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    dup_bigram = F.when(
        F.size(bi) > 0,
        F.lit(1.0) - F.size(F.array_distinct(bi)) / F.size(bi),
    ).otherwise(F.lit(0.0))
    counts = F.transform(
        F.array_distinct(w),
        lambda t: F.size(F.filter(w, lambda x: x == t)),
    )
    top_token = F.coalesce(
        F.array_max(counts) / F.greatest(n, F.lit(1)),
        F.lit(0.0),
    )
    return df.select(
        "doc_id",
        F.round(dup_bigram, 4).alias("dup_bigram_ratio"),
        F.round(top_token, 4).alias("top_token_ratio"),
    )
