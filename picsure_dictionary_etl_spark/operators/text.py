"""Text-analysis operators for training-data pipelines over the
``documents`` table: language-ID heuristic, quality scoring, token
counting, fingerprinting.

All scoring is built-in-expression only (codegen'd regex/string ops) so
it (a) runs at 100 TB without Python overhead and (b) has an exact
DuckDB oracle twin. Patterns are deliberately shared with
``__spark_entry__.oracle_sql``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword marker sets for the n-gram/stopword
# language-ID heuristic. Real pipelines plug in fastText/CLD3 via a
# pandas UDF; the heuristic is the dependency-free scale path.
LANG_MARKERS = {
    "en": r"\b(the|of|and|to|a)\b",
    "de": r"\b(der|die|das|und|ist)\b",
    "fr": r"\b(le|la|les|et|est)\b",
    "es": r"\b(el|la|los|y|es)\b",
}

TOKEN_REGEX = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"  # BPE-ish pre-tokenizer
PUNCT_REGEX = r"[^A-Za-z0-9\s]"


def _count_matches(col: Column, pattern: str) -> Column:
    return F.size(F.regexp_extract_all(col, F.lit(pattern), F.lit(0)))


def lang_scores(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Stopword-marker hit counts per language + argmax language guess.
    Deterministic tie-break: language-name order."""
    out = df
    for lang, pat in sorted(LANG_MARKERS.items()):
        out = out.withColumn(f"score_{lang}", _count_matches(F.col(text_col), pat))
    best = F.greatest(*[F.col(f"score_{lang}") for lang in sorted(LANG_MARKERS)])
    guess = F.lit(None).cast("string")
    for lang in sorted(LANG_MARKERS, reverse=True):
        guess = F.when(F.col(f"score_{lang}") == best, F.lit(lang)).otherwise(guess)
    return out.withColumn("lang_guess", F.when(best > 0, guess))


def quality_features(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Length / token / punctuation / stopword features for quality
    filtering (the C4-style heuristics used by large-corpus cleaners)."""
    txt = F.col(text_col)
    n_chars = F.length(txt)
    tokens = F.split(F.trim(txt), r"\s+")
    n_tokens = F.when(F.trim(txt) == "", 0).otherwise(F.size(tokens))
    n_punct = _count_matches(txt, PUNCT_REGEX)
    n_stop = _count_matches(F.lower(txt), LANG_MARKERS["en"])
    return df.select(
        "*",
        n_chars.alias("n_chars_calc"),
        n_tokens.alias("n_tokens"),
        n_punct.alias("n_punct"),
        F.round(n_punct / F.greatest(n_chars, F.lit(1)), 6).alias("punct_ratio"),
        F.round(n_stop / F.greatest(n_tokens, F.lit(1)), 6).alias("stopword_ratio"),
        F.round(n_chars / F.greatest(n_tokens, F.lit(1)), 6).alias("mean_token_len"),
    )


def token_counts(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace tokens + BPE-ish regex pre-tokens per document."""
    txt = F.col(text_col)
    ws = F.when(F.trim(txt) == "", 0).otherwise(F.size(F.split(F.trim(txt), r"\s+")))
    bpe = _count_matches(txt, TOKEN_REGEX)
    return df.select("*", ws.alias("ws_tokens"), bpe.alias("bpe_tokens"))


def fingerprint(df: DataFrame, text_col: str = "text", out_col: str = "fingerprint") -> DataFrame:
    """Normalized document fingerprint: md5 over lowercased text with
    non-alphanumerics squeezed to single spaces — stable under
    whitespace/punct jitter (the cheap cousin of SimHash; exact-dup
    grouping key)."""
    norm = F.trim(F.regexp_replace(F.lower(F.col(text_col)), r"[^a-z0-9]+", " "))
    return df.withColumn(out_col, F.md5(norm))
