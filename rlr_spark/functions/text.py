"""Text-analysis column functions for large-scale corpus pipelines.

All pure column expressions (JVM-side, whole-stage codegen) — language-ID
heuristic, quality scoring, token counting, and document fingerprinting.
Designed so each has an exactly-equivalent ANSI-SQL form for the DuckDB
oracle (no floating hash libraries, no Python in the hot path).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small marker-stopword lists per language (public common words). The
# heuristic is deliberately tiny: count marker hits per language, argmax.
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "with", "from", "this"],
    "de": ["und", "der", "die", "das", "nicht"],
    "fr": ["les", "des", "avec", "pour", "dans"],
    "es": ["los", "las", "por", "para", "como"],
}

EN_STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "for",
    "with", "at", "by", "from", "is", "are", "was", "this", "that", "it",
]

#: BPE-ish pre-tokenizer: word pieces or single non-space symbols — the
#: usual GPT-2-style pre-split shape, as a plain regex.
BPE_ISH_PATTERN = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"


def tokens(text: Column) -> Column:
    t = F.trim(text)
    return F.when(
        t.isNull() | (t == ""), F.array().cast("array<string>")
    ).otherwise(F.split(t, r"\s+"))


def token_count(text: Column) -> Column:
    """Whitespace token count."""
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column) -> Column:
    """Count of BPE-ish pre-tokenizer pieces (regexp_extract_all based)."""
    return F.size(F.regexp_extract_all(F.coalesce(text, F.lit("")), F.lit(BPE_ISH_PATTERN), F.lit(0)))


def punct_ratio(text: Column) -> Column:
    """Fraction of non-space characters that are not alphanumeric."""
    t = F.coalesce(text, F.lit(""))
    nonspace = F.length(F.regexp_replace(t, r"\s", ""))
    punct = F.length(F.regexp_replace(t, r"[A-Za-z0-9\s]", ""))
    return F.when(nonspace == 0, F.lit(0.0)).otherwise(
        punct.cast("double") / nonspace.cast("double")
    )


def _count_in(toks: Column, words: list[str]) -> Column:
    # single-arg lambda on purpose: F.filter feeds the array index to a
    # second parameter, which is never what a membership test wants
    arr = F.array(*[F.lit(w) for w in words])

    def member(x: Column) -> Column:
        return F.array_contains(arr, x)

    return F.size(F.filter(toks, member))


def stopword_ratio(text: Column, stopwords: list[str] | None = None) -> Column:
    """Fraction of whitespace tokens that are (lower-cased) stopwords."""
    toks = tokens(F.lower(text))
    hits = _count_in(toks, stopwords or EN_STOPWORDS)
    n = F.size(toks)
    return F.when(n == 0, F.lit(0.0)).otherwise(hits.cast("double") / n.cast("double"))


def quality_score(text: Column) -> Column:
    """Composite [0,1] quality heuristic: reasonable length, low punct
    noise, some stopword mass (English-biased, as in public web-corpus
    filters — length/punct/stopword ratios)."""
    n = token_count(text).cast("double")
    len_term = F.least(n / F.lit(50.0), F.lit(1.0))  # saturates at 50 tokens
    punct_term = F.lit(1.0) - F.least(punct_ratio(text) * 5, F.lit(1.0))
    stop_term = F.least(stopword_ratio(text) * 5, F.lit(1.0))
    return F.round((len_term + punct_term + stop_term) / 3, 6)


def lang_scores(text: Column) -> dict[str, Column]:
    toks = tokens(F.lower(text))
    return {lang: _count_in(toks, markers) for lang, markers in LANG_MARKERS.items()}


def lang_id(text: Column, default: str = "en") -> Column:
    """Argmax of marker-hit counts; ties broken by language-code order —
    deterministic and SQL-expressible (a chain of CASE WHEN)."""
    scores = lang_scores(text)
    langs = sorted(scores)  # deterministic tie-break: alphabetical
    best_lang = F.lit(default)
    best_score = F.lit(0)
    for lang in langs:
        s = scores[lang]
        cond = s > best_score
        best_lang = F.when(cond, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(cond, s).otherwise(best_score)
    return best_lang


_FP_MOD = 1_000_000_007
_FP_BASE = 31


def fingerprint(text: Column) -> Column:
    """Polynomial rolling hash over the document's characters,
    ``h = (h*31 + ascii(ch)) mod 1e9+7`` — a deterministic
    SQL-expressible document fingerprint (same formula runs in DuckDB
    via list_reduce for the oracle). Intermediate stays < 2^63 so ANSI
    mode never overflows."""
    t = F.coalesce(text, F.lit(""))
    return F.aggregate(
        F.sequence(F.lit(1), F.length(t)),
        F.lit(0).cast("long"),
        lambda acc, i: F.pmod(acc * _FP_BASE + F.ascii(F.substring(t, i, 1)), F.lit(_FP_MOD)),
    )


def fingerprint_sql(col: str = "text") -> str:
    """The DuckDB-equivalent expression for :func:`fingerprint`."""
    return (
        f"list_reduce(list_prepend(0::BIGINT, list_transform(range(1, length({col})+1), "
        f"i -> ascii(substr({col}, i::INTEGER, 1)))), "
        f"(acc, ch) -> (acc * {_FP_BASE} + ch) % {_FP_MOD})"
    )
