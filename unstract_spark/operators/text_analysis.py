"""Text-analysis operators for training-data pipelines.

Language-ID (stopword heuristic), quality scoring, token counting,
document fingerprinting. All pure Column expressions — whole-stage
codegen, zero Python, embarrassingly parallel (no shuffle): the shape
that processes 100 TB at scan speed.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny deterministic stopword sets per language. Word-boundary regexes are
# kept RE2/Java-compatible so the SQL oracle computes the identical score.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "is", "to"],
    "fr": ["le", "la", "et", "les", "des"],
    "de": ["der", "die", "und", "das", "ist"],
    "es": ["el", "que", "los", "una", "las"],
}


def _marker_count(text: Column, words: list[str]) -> Column:
    # \b boundaries are zero-width, so consecutive stopwords all count
    # (a consuming "(^| )...( |$)" group would eat the separating space)
    rx = "\\b(" + "|".join(words) + ")\\b"
    return F.regexp_count(F.lower(text), F.lit(rx))


def lang_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic language-ID: arg-max of per-language marker-word hits.

    'und' (undetermined) when nothing matches. greatest()-based argmax
    keeps it a single projection.
    """
    scores = {lang: _marker_count(F.col(text_col), ws) for lang, ws in LANG_MARKERS.items()}
    best = F.greatest(*scores.values())
    # argmax with deterministic tie-break: alphabetical, first max wins
    pred = F.lit(None).cast("string")
    for lang in sorted(scores):
        pred = F.when(pred.isNotNull(), pred).when(
            (scores[lang] == best) & (best > 0), F.lit(lang)
        )
    pred = F.coalesce(pred, F.lit("und"))
    return docs.select(
        F.col(id_col),
        *[scores[lang].alias(f"hits_{lang}") for lang in sorted(scores)],
        pred.alias("pred_lang"),
    )


def token_count_ws(text: Column) -> Column:
    """Whitespace token count (0 for empty/blank)."""
    return F.when(F.length(F.trim(text)) == 0, 0).otherwise(
        F.size(F.split(F.trim(text), "\\s+"))
    )


def token_count_bpe_ish(text: Column) -> Column:
    """BPE-ish token estimate: runs of letters, digits, or single symbols.

    The regex `[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]` approximates a byte-pair
    tokenizer's word/number/punct splits well enough for budget
    accounting (the reference estimates tokens as bytes/1.3 —
    tools/classifier/src/main.py token-budget truncation).
    """
    return F.regexp_count(text, F.lit("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"))


def quality_features(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document quality features + composite score in [0, 1].

    Features follow the standard web-corpus filters: length, mean word
    length, punctuation density, digit density, stopword density.
    """
    t = F.col(text_col)
    n_chars = F.length(t)
    n_tokens = token_count_ws(t)
    n_punct = F.regexp_count(t, F.lit("[.,;:!?]"))
    n_digit = F.regexp_count(t, F.lit("[0-9]"))
    n_stop = _marker_count(t, LANG_MARKERS["en"])
    mean_word_len = (n_chars / F.greatest(n_tokens, F.lit(1))).cast("double")
    punct_ratio = (n_punct / F.greatest(n_chars, F.lit(1))).cast("double")
    digit_ratio = (n_digit / F.greatest(n_chars, F.lit(1))).cast("double")
    stop_ratio = (n_stop / F.greatest(n_tokens, F.lit(1))).cast("double")
    length_ok = F.when((n_chars >= 50) & (n_chars <= 100000), 1.0).otherwise(0.0)
    word_len_ok = F.when((mean_word_len >= 2.0) & (mean_word_len <= 12.0), 1.0).otherwise(0.0)
    punct_ok = F.when(punct_ratio <= 0.2, 1.0).otherwise(0.0)
    digit_ok = F.when(digit_ratio <= 0.3, 1.0).otherwise(0.0)
    score = (length_ok + word_len_ok + punct_ok + digit_ok) / F.lit(4.0)
    return docs.select(
        F.col(id_col),
        n_chars.alias("n_chars_m"),
        n_tokens.alias("n_tokens"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(digit_ratio, 4).alias("digit_ratio"),
        F.round(stop_ratio, 4).alias("stop_ratio"),
        score.alias("quality_score"),
    )


def fingerprints(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Document fingerprints: exact sha, normalized md5, prefix hash.

    The prefix hash (first 64 normalized chars) is a cheap rolling-hash
    stand-in that catches boilerplate-prefix duplicates.
    """
    t = F.col(text_col)
    norm = F.trim(F.regexp_replace(F.regexp_replace(F.lower(t), "[^a-z0-9 ]", ""), " +", " "))
    return docs.select(
        F.col(id_col),
        F.sha2(t, 256).alias("sha_exact"),
        F.md5(norm).alias("md5_norm"),
        F.md5(F.substring(norm, 1, 64)).alias("prefix_hash"),
    )
