"""Text-analysis operators for a training-data pipeline, Spark-SQL-native.

Every function here is a pure Column expression (whole-stage codegen, no
Python) chosen so an identical ANSI-SQL form exists for the DuckDB oracle:
token counting, quality scoring, language-ID heuristic, fingerprinting.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# stopword markers per language for the n-gram/stopword heuristic;
# chosen to be expressible as plain substring counts in any SQL dialect
LANG_MARKERS = {
    "en": [" the ", " and ", " of "],
    "de": [" der ", " und ", " die "],
    "fr": [" le ", " et ", " la "],
    "es": [" el ", " de la ", " que "],
}


def _count_sub(text: Column, sub: str) -> Column:
    """Occurrences of `sub` in text via length arithmetic (portable SQL)."""
    return (
        F.length(text) - F.length(F.replace(text, F.lit(sub), F.lit("")))
    ) / F.lit(len(sub))


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    t = F.trim(text)
    return F.when(F.length(t) == 0, F.lit(0)).otherwise(
        F.size(F.split(t, r"\s+"))
    )


# GPT-2-style pre-tokenization pattern, restricted to constructs whose
# semantics agree between Java regex (Spark) and RE2 (DuckDB): contraction
# suffixes, letter runs, digit runs, other-symbol runs, whitespace runs —
# each optionally preceded by one space.  Token COUNTS from this pattern
# approximate BPE token counts well enough for budget accounting, with
# zero Python in the hot path.
BPE_SPLIT_PATTERN = (
    r"'s|'t|'re|'ve|'m|'ll|'d"
    r"| ?[A-Za-z]+| ?[0-9]+| ?[^\sA-Za-z0-9']+"
)


def token_count_bpe(text: Column) -> Column:
    """BPE-ish token count: number of pre-tokenizer matches (whitespace
    is skipped by the scan — both Java regex and RE2 use leftmost-first
    alternation, so Spark and the DuckDB oracle count identically).
    Pure Column expression, zero Python."""
    t = F.coalesce(text, F.lit(""))
    return F.regexp_count(t, F.lit(BPE_SPLIT_PATTERN)).cast("long")


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are basic punctuation."""
    cleaned = F.regexp_replace(text, r"[.,!?;:()\[\]\"']", "")
    return (F.length(text) - F.length(cleaned)) / F.greatest(
        F.length(text), F.lit(1)
    )


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    low = F.lower(text)
    total = None
    for m in LANG_MARKERS[lang]:
        c = _count_sub(low, m)
        total = c if total is None else total + c
    return total / F.greatest(token_count(text), F.lit(1))


def quality_score(text: Column) -> Column:
    """Composite quality heuristic in [0, 1]: length, punctuation sanity,
    stopword presence — the usual cheap pre-filter for web-scale corpora."""
    length_score = F.least(F.length(text) / F.lit(500.0), F.lit(1.0))
    punct = punct_ratio(text)
    punct_score = F.when(punct > 0.2, F.lit(0.0)).otherwise(1.0 - punct * 5.0 / 2.0)
    stop_score = F.least(stopword_ratio(text) * F.lit(10.0), F.lit(1.0))
    return F.round(
        (length_score + punct_score + stop_score) / F.lit(3.0), 6
    )


def lang_id(text: Column) -> Column:
    """Argmax over per-language stopword marker counts; 'und' if none."""
    low = F.lower(text)
    scores = {
        lang: sum(
            (_count_sub(low, m) for m in marks), start=F.lit(0.0)
        )
        for lang, marks in LANG_MARKERS.items()
    }
    best_score = F.greatest(*scores.values())
    out = F.lit("und")
    # deterministic tie-break: language order en, de, fr, es
    for lang in reversed(list(LANG_MARKERS)):
        out = F.when(
            (scores[lang] > 0) & (scores[lang] == best_score), F.lit(lang)
        ).otherwise(out)
    return out


def fingerprint(text: Column) -> Column:
    """Document fingerprint: md5 of the whitespace-normalized lowercase
    text (md5 exists verbatim in DuckDB for the oracle)."""
    norm = F.regexp_replace(F.lower(F.trim(text)), r"\s+", " ")
    return F.md5(norm)
