"""Text-analysis / deduplication column-expression toolkit.

Training-data pipeline operators over a text column — all pure Catalyst
higher-order functions (transform/filter/aggregate on arrays), no UDFs:

- tokenization (whitespace + BPE-ish regex),
- word n-gram shingles,
- MinHash signatures (md5-based, engine-portable), LSH bands,
- SimHash (md5-bit votes),
- quality metrics (stopword ratio, word stats),
- marker-word language id.

Everything has a DuckDB SQL twin in queries_text.py so the driver's oracle
can verify each operator end-to-end.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

BPE_ISH_RE = r"[a-z]+|[0-9]+|[^a-z0-9\s]"

STOPWORDS = ("the", "and", "of", "to", "a", "in", "is")
LANG_MARKERS = {
    "de": ("der", "die", "und", "nicht", "ist"),
    "en": ("the", "and", "of", "to", "a"),
    "fr": ("le", "la", "et", "les", "des"),
}


def words_expr(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def shingles_expr(words: Column, n: int = 3) -> Column:
    """Word n-grams as an array (null if fewer than n words)."""
    idx = F.sequence(F.lit(0), F.size(words) - n)
    joined = F.transform(
        idx,
        lambda i: F.concat_ws(
            " ", *[F.element_at(words, (i + j + 1).cast("int")) for j in range(n)]
        ),
    )
    return F.when(F.size(words) >= n, joined)


def minhash_expr(shingles: Column, seed: int) -> Column:
    """One MinHash component: lexicographic min of seeded md5 hex digests.
    Hex-string min is engine-portable (no 64-bit parsing needed)."""
    return F.array_min(
        F.transform(shingles, lambda s: F.md5(F.concat(F.lit(f"{seed}|"), s)))
    )


def fingerprint_expr(shingles: Column) -> Column:
    """Winnowing-style document fingerprint: min shingle hash."""
    return F.array_min(F.transform(shingles, F.md5))


def stopword_count_expr(words: Column, stopwords=STOPWORDS) -> Column:
    return F.size(F.filter(words, lambda w: w.isin(*stopwords)))


def marker_count_expr(words: Column, markers) -> Column:
    return F.size(F.filter(words, lambda w: w.isin(*markers)))


def lang_pred_expr(words: Column) -> Column:
    c_de = marker_count_expr(words, LANG_MARKERS["de"])
    c_en = marker_count_expr(words, LANG_MARKERS["en"])
    c_fr = marker_count_expr(words, LANG_MARKERS["fr"])
    return (
        F.when((c_de > c_en) & (c_de > c_fr), F.lit("de"))
        .when(c_fr > c_en, F.lit("fr"))
        .otherwise(F.lit("en"))
    )
