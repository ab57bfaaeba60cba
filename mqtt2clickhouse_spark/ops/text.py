"""Text-analysis operators over a string column: tokenization, token
counting, quality scoring, language identification, fingerprinting.

All pure Column expressions (JVM-side, codegen'd) — they compose into any
DataFrame plan and scale linearly; no shuffle is introduced by the
operators themselves.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: tiny embedded stopword lists for the n-gram language heuristic
_LANG_MARKERS = {
    "en": ["the", "and", "of", "to", "in"],
    "de": ["der", "die", "und", "das", "ist"],
    "fr": ["le", "la", "les", "et", "est"],
    "es": ["el", "la", "los", "que", "es"],
}


def tokens(text: Column) -> Column:
    """Whitespace tokenization (lowercased, empty tokens dropped)."""
    return F.filter(F.split(F.lower(text), r"\s+"), lambda x: x != F.lit(""))


def token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("long")


def bpe_ish_token_count(text: Column) -> Column:
    """Token count under a BPE-ish split: each run of [a-z0-9] is one
    token and each punctuation character is its own token (a cheap proxy
    for LLM token budgeting at corpus scale).  Computed without regex
    lookarounds so the DuckDB (RE2) oracle can mirror it exactly."""
    lowered = F.lower(text)
    word_runs = F.size(
        F.filter(F.split(lowered, r"[^a-z0-9]+"), lambda x: x != F.lit(""))
    ).cast("long")
    punct_chars = F.length(F.regexp_replace(lowered, r"[a-z0-9\s]", "")).cast("long")
    return word_runs + punct_chars


def word_occurrences(text: Column, word: str) -> Column:
    """Count whole-word occurrences via length differencing (identical
    semantics in DuckDB for oracle parity — no regex engine involved)."""
    padded = F.concat(F.lit(" "), F.lower(text), F.lit(" "))
    needle = f" {word} "
    return (
        (F.length(padded) - F.length(F.replace(padded, F.lit(needle), F.lit(""))))
        / F.lit(len(needle))
    ).cast("long")


def lang_scores(text: Column) -> dict[str, Column]:
    """Marker-word score per language."""
    out = {}
    for lang, words in _LANG_MARKERS.items():
        score = None
        for w in words:
            c = word_occurrences(text, w)
            score = c if score is None else score + c
        out[lang] = score
    return out


def quality_features(text: Column) -> dict[str, Column]:
    """Length / punctuation / alpha-ratio features used for corpus
    quality filtering."""
    n_chars = F.length(text).cast("long")
    toks = tokens(text)
    n_tokens = F.size(toks).cast("long")
    total_token_len = F.length(F.replace(F.lower(text), F.lit(" "), F.lit(""))).cast(
        "long"
    )
    alpha_chars = F.length(F.regexp_replace(F.lower(text), "[^a-z]", "")).cast("long")
    return {
        "n_chars": n_chars,
        "n_tokens": n_tokens,
        "avg_token_len": F.round(
            total_token_len / F.nullif(n_tokens, F.lit(0)).cast("double"), 4
        ),
        "alpha_ratio": F.round(
            alpha_chars / F.nullif(n_chars, F.lit(0)).cast("double"), 4
        ),
        "quality_score": F.round(
            F.least(F.lit(1.0), n_tokens / F.lit(100.0))
            * (alpha_chars / F.nullif(n_chars, F.lit(0)).cast("double")),
            4,
        ),
    }


def fingerprint(text: Column) -> Column:
    """Deterministic document fingerprint: md5 of the
    whitespace-normalized lowercased text.  (The rolling-hash variant for
    shingle fingerprints lives in ops.dedup.hash32.)"""
    return F.md5(F.regexp_replace(F.lower(text), r"\s+", " "))


def doc_lines(text: Column) -> Column:
    """Non-empty trimmed lines of the document (split on newline)."""
    return F.filter(
        F.transform(F.split(text, r"\n"), lambda ln: F.trim(ln)),
        lambda ln: ln != F.lit(""),
    )


def repetition_features(text: Column) -> dict[str, Column]:
    """Gopher-style within-document repetition signals (Rae et al. 2021,
    "Scaling Language Models", table A1): the fraction of duplicate
    lines and the fraction of characters inside duplicate lines.  Pure
    Column expressions — map-only, no shuffle; the companion top-bigram
    fraction needs a per-doc aggregation and lives in the query layer
    (``quality_repetition``).

    A doc with no lines scores 0.0 (nothing repeated), matching the
    coalesce in the DuckDB oracle.
    """
    ls = doc_lines(text)
    n_lines = F.size(ls).cast("long")
    n_distinct = F.size(F.array_distinct(ls)).cast("long")
    chars = lambda arr: F.aggregate(  # noqa: E731
        arr, F.lit(0).cast("long"), lambda acc, x: acc + F.length(x)
    )
    total_chars = chars(ls)
    distinct_chars = chars(F.array_distinct(ls))
    return {
        "n_lines": n_lines,
        "dup_line_frac": F.round(
            F.coalesce(
                (n_lines - n_distinct) / F.nullif(n_lines, F.lit(0)).cast("double"),
                F.lit(0.0),
            ),
            4,
        ),
        "dup_char_frac": F.round(
            F.coalesce(
                (total_chars - distinct_chars)
                / F.nullif(total_chars, F.lit(0)).cast("double"),
                F.lit(0.0),
            ),
            4,
        ),
    }


def word_bigrams(text: Column) -> Column:
    """ALL word bigrams of the lowercased text, duplicates preserved
    (repetition counting needs multiplicity — contrast
    ``word_shingles``, which dedupes)."""
    toks = tokens(text)
    n = F.greatest(F.size(toks) - F.lit(1), F.lit(0))
    return F.when(
        n > 0,
        F.transform(
            F.sequence(F.lit(1), n), lambda i: F.concat_ws(" ", F.slice(toks, i, 2))
        ),
    ).otherwise(F.array().cast("array<string>"))

