"""Text-analysis primitives for the LLM data pipeline: tokenization,
language-ID heuristic, quality scoring, token statistics, fingerprinting.

Everything here is a composition of built-in Catalyst expressions (no
Python UDFs), so the operators run inside whole-stage codegen and scale
linearly with input — the 100 TB posture. Each primitive has an exact SQL
twin used by the DuckDB oracle; the STOPWORDS table below is the single
source of truth for both sides.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Deliberately small: the heuristic must be cheap at scale, and
# the operator contract is determinism, not linguistic accuracy.
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "that", "it", "for"],
    "de": ["der", "die", "das", "und", "ist", "von", "mit", "für", "auf", "ein"],
    "fr": ["le", "la", "les", "et", "est", "de", "un", "une", "dans", "pour"],
    "es": ["el", "la", "los", "las", "y", "es", "de", "un", "una", "para"],
    "zh": ["的", "是", "了", "在", "和", "有", "我", "不", "这", "也"],
}

LANG_ORDER = ("en", "de", "fr", "es", "zh")


def tokens(text: Column) -> Column:
    """Lowercased whitespace tokens."""
    return F.split(F.lower(text), r"\s+")


def sql_tokens(text_sql: str) -> str:
    return f"regexp_split_to_array(lower({text_sql}), '\\s+')"


def distinct_tokens(text: Column) -> Column:
    return F.array_distinct(tokens(text))


def stopword_hits(text: Column, lang: str) -> Column:
    """Distinct stopwords of `lang` present in the text."""
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(distinct_tokens(text), sw))


def sql_stopword_hits(text_sql: str, lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return f"len(list_intersect(list_distinct({sql_tokens(text_sql)}), [{words}]))"


def lang_scores(text: Column) -> dict[str, Column]:
    """Per-language stopword-coverage score in [0, 1]."""
    n = F.greatest(F.size(distinct_tokens(text)), F.lit(1))
    return {
        lang: (stopword_hits(text, lang).cast("double") / n).alias(f"score_{lang}")
        for lang in LANG_ORDER
    }


def sql_lang_score(text_sql: str, lang: str) -> str:
    n = f"greatest(len(list_distinct({sql_tokens(text_sql)})), 1)"
    return f"(CAST({sql_stopword_hits(text_sql, lang)} AS DOUBLE) / {n})"


def predicted_lang(text: Column) -> Column:
    """Argmax language over the stopword scores; first-in-LANG_ORDER wins
    ties (identical tie rule in the SQL twin)."""
    scores = lang_scores(text)
    best = F.greatest(*scores.values())
    expr = F.lit(LANG_ORDER[-1])
    for lang in reversed(LANG_ORDER[:-1]):
        expr = F.when(scores[lang] == best, F.lit(lang)).otherwise(expr)
    return expr


def sql_predicted_lang(text_sql: str) -> str:
    score_sqls = {lang: sql_lang_score(text_sql, lang) for lang in LANG_ORDER}
    best = "greatest(" + ", ".join(score_sqls.values()) + ")"
    expr = f"'{LANG_ORDER[-1]}'"
    for lang in reversed(LANG_ORDER[:-1]):
        expr = f"CASE WHEN {score_sqls[lang]} = {best} THEN '{lang}' ELSE {expr} END"
    return expr


def punct_ratio(text: Column) -> Column:
    """Fraction of characters that are not alphanumeric/space."""
    stripped = F.regexp_replace(F.lower(text), r"[a-z0-9 ]", "")
    return F.length(stripped).cast("double") / F.greatest(F.length(text), F.lit(1))


SQL_PUNCT_RATIO = (
    "CAST(length(regexp_replace(lower({t}), '[a-z0-9 ]', '', 'g')) AS DOUBLE)"
    " / greatest(length({t}), 1)"
)


def quality_score(text: Column) -> Column:
    """Deterministic composite quality score in [0, 1]:
    0.3 * length saturation (100 tokens) + 0.4 * English-stopword coverage
    + 0.3 * (1 - punctuation ratio). Mirrors SQL_QUALITY_SCORE exactly."""
    n_tok = F.size(tokens(text)).cast("double")
    len_part = F.least(n_tok / 100.0, F.lit(1.0))
    n_dist = F.greatest(F.size(distinct_tokens(text)), F.lit(1))
    stop_part = stopword_hits(text, "en").cast("double") / n_dist
    return F.round(0.3 * len_part + 0.4 * stop_part + 0.3 * (1.0 - punct_ratio(text)), 6)


def sql_quality_score(t: str) -> str:
    len_part = f"least(CAST(len({sql_tokens(t)}) AS DOUBLE) / 100.0, 1.0)"
    stop_part = (
        f"CAST({sql_stopword_hits(t, 'en')} AS DOUBLE)"
        f" / greatest(len(list_distinct({sql_tokens(t)})), 1)"
    )
    punct = SQL_PUNCT_RATIO.format(t=t)
    return f"round(0.3 * {len_part} + 0.4 * {stop_part} + 0.3 * (1.0 - {punct}), 6)"


def normalized_text(text: Column) -> Column:
    """Canonical form for fingerprinting: lowercase, collapsed whitespace."""
    return F.trim(F.regexp_replace(F.lower(text), r"\s+", " "))


def fingerprint(text: Column) -> Column:
    """128-bit content fingerprint of the normalized text (md5 hex)."""
    return F.md5(normalized_text(text))


def sql_fingerprint(t: str) -> str:
    return f"md5(trim(regexp_replace(lower({t}), '\\s+', ' ', 'g')))"
