"""Text-analysis operators for large-scale training-data pipelines.

These extend the crawl engine with the document-processing surface a
100 TB web-text corpus needs (driver brief: language-ID, quality
scoring, token counting, fingerprinting).  Everything is built-in
Column expressions (JVM, whole-stage codegen) — no Python in the hot
path — so each scales linearly with executors.

All operators run over a ``documents(doc_id, text, lang, source,
n_chars)`` table and are DuckDB-oracle checkable (each has a matching
ANSI-SQL statement in __spark_entry__.oracle_sql).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny embedded stopword sets per language — deterministic heuristic
# language-ID by stopword hit-rate (classic n-gram/stopword approach).
STOPWORDS = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "for", "with", "are"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "fr": ("le", "la", "les", "et", "est", "pas", "une", "pour", "avec", "dans"),
    "es": ("el", "la", "los", "y", "es", "no", "una", "por", "con", "para"),
}

# BPE-ish token regex: word pieces, numbers, or single non-space symbols.
TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens_col(text: Column) -> Column:
    """Whitespace tokens (simple) — split + drop empties."""
    return F.filter(F.split(F.coalesce(text, F.lit("")), r"\s+"),
                    lambda t: t != "")


def token_count_col(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens_col(text))


def bpe_ish_token_count_col(text: Column) -> Column:
    """Count of TOKEN_REGEX matches (regexp_count is JVM-side)."""
    return F.regexp_count(F.coalesce(text, F.lit("")), F.lit(TOKEN_REGEX))


def stopword_ratio_col(text: Column, lang: str = "en") -> Column:
    """Fraction of whitespace tokens that are stopwords of ``lang``."""
    toks = F.transform(tokens_col(text), lambda t: F.lower(t))
    hits = F.size(F.filter(toks, lambda t: t.isin(*STOPWORDS[lang])))
    n = F.size(toks)
    return F.when(n > 0, hits.cast("double") / n).otherwise(F.lit(0.0))


def language_id_col(text: Column) -> Column:
    """Heuristic language ID: the language with the max stopword ratio;
    'und' (undetermined) when no stopwords hit at all."""
    ratios = [(lang, stopword_ratio_col(text, lang)) for lang in STOPWORDS]
    best = None
    best_ratio = None
    # greatest() over the ratio columns, then match which produced it
    greatest = F.greatest(*[r for _, r in ratios])
    expr = F.when(greatest <= 0.0, F.lit("und"))
    for lang, r in ratios:
        expr = expr.when(r == greatest, F.lit(lang))
    return expr.otherwise(F.lit("und"))


def punct_ratio_col(text: Column) -> Column:
    """Punctuation chars / total chars."""
    t = F.coalesce(text, F.lit(""))
    n = F.length(t)
    punct = F.length(F.regexp_replace(t, r"[^.,;:!?'\"()\[\]{}-]", ""))
    return F.when(n > 0, punct.cast("double") / n).otherwise(F.lit(0.0))


def mean_word_len_col(text: Column) -> Column:
    toks = tokens_col(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return F.when(F.size(toks) > 0,
                  total.cast("double") / F.size(toks)).otherwise(F.lit(0.0))


def quality_score_col(text: Column, lang: str = "en") -> Column:
    """Composite [0,1] quality heuristic: length band + stopword presence
    + sane punctuation + sane mean word length.  Deterministic, pure
    Column arithmetic — the shape of a Gopher/C4-style quality rule."""
    n_chars = F.length(F.coalesce(text, F.lit("")))
    len_ok = F.when((n_chars >= 200) & (n_chars <= 100000), 1.0) \
              .when(n_chars >= 50, 0.5).otherwise(0.0)
    sw = stopword_ratio_col(text, lang)
    sw_ok = F.when(sw >= 0.05, F.lit(1.0)).otherwise(sw * 20.0)
    punct = punct_ratio_col(text)
    punct_ok = F.when(punct <= 0.2, 1.0).otherwise(0.0)
    mwl = mean_word_len_col(text)
    mwl_ok = F.when((mwl >= 3.0) & (mwl <= 10.0), 1.0).otherwise(0.0)
    return F.round((len_ok + sw_ok + punct_ok + mwl_ok) / 4.0, 6)


def fingerprint_col(text: Column) -> Column:
    """Document fingerprint: xxhash64 of the whitespace-normalized,
    lowercased text (content-defined identity for exact dedup across
    formatting differences)."""
    norm = F.lower(F.regexp_replace(
        F.regexp_replace(F.coalesce(text, F.lit("")), r"\s+", " "),
        r"^\s+|\s+$", ""))
    return F.xxhash64(norm)


def analyze_documents(docs: DataFrame, lang: str = "en") -> DataFrame:
    """All text metrics in one projection (single pass over the scan)."""
    return docs.select(
        "doc_id",
        token_count_col(F.col("text")).alias("n_tokens"),
        bpe_ish_token_count_col(F.col("text")).alias("n_bpe_tokens"),
        F.round(stopword_ratio_col(F.col("text"), lang), 6).alias("stopword_ratio"),
        F.round(punct_ratio_col(F.col("text")), 6).alias("punct_ratio"),
        F.round(mean_word_len_col(F.col("text")), 6).alias("mean_word_len"),
        quality_score_col(F.col("text"), lang).alias("quality_score"),
        language_id_col(F.col("text")).alias("lang_id"),
        fingerprint_col(F.col("text")).alias("fingerprint"),
    )


def winnow_fingerprints_col(text: Column, k: int = 5,
                            window: int = 4) -> Column:
    """MOSS winnowing (Schleimer et al., SIGMOD 2003 — public paper):
    hash every char k-gram of the normalized text, take the minimum per
    sliding window of ``window`` consecutive gram hashes, distinct + sort.
    Guarantees any shared substring of length >= k + window - 1 yields a
    shared fingerprint — the standard local document-fingerprinting
    scheme for near-dup/plagiarism detection.

    Hashes are 60-bit md5 prefixes (conv(substring(md5(g),1,15),16,10))
    so the DuckDB oracle reproduces them bit-for-bit; pure Column
    expressions, no Python in the path.  Docs with fewer than
    k + window - 1 chars yield an empty fingerprint list (no full
    window exists)."""
    norm = F.lower(F.regexp_replace(
        F.regexp_replace(F.coalesce(text, F.lit("")), r"\s+", " "),
        r"^\s+|\s+$", ""))
    n_grams = F.length(norm) - (k - 1)
    idx = F.when(n_grams >= 1, F.sequence(F.lit(1), n_grams)) \
           .otherwise(F.array().cast("array<int>"))
    hashes = F.transform(
        idx, lambda i: F.conv(
            F.substring(F.md5(norm.substr(i, F.lit(k))), 1, 15), 16, 10)
        .cast("long"))
    n_windows = F.size(hashes) - (window - 1)
    widx = F.when(n_windows >= 1, F.sequence(F.lit(1), n_windows)) \
            .otherwise(F.array().cast("array<int>"))
    minima = F.transform(widx,
                         lambda j: F.array_min(F.slice(hashes, j, window)))
    return F.array_sort(F.array_distinct(minima))
