"""Text-analysis expressions for large-scale corpus pipelines.

All pure Catalyst column expressions (JVM-side, whole-stage codegen —
no Python UDFs), so they scan at parquet speed on 100 TB:

- tokenization + token counting (whitespace and BPE-ish regex)
- language-ID by stopword-hit ratio over per-language lexicons
- quality scoring (length / stopword / punctuation components)
- document fingerprinting (polynomial rolling hash)
- k-character shingles (shared with the dedup operators)

Every function has an exactly-equivalent DuckDB SQL form (used by the
oracle harness); the constants below are exported so the SQL is
generated from the same lexicons.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Small per-language stopword lexicons (public common-word lists).
STOPWORDS: dict[str, tuple[str, ...]] = {
    "en": ("the", "a", "of", "and", "to", "in", "is", "it", "that", "was"),
    "de": ("der", "die", "das", "und", "ist", "ein", "eine", "zu", "den", "von"),
    "fr": ("le", "la", "les", "et", "est", "un", "une", "de", "du", "que"),
    "es": ("el", "la", "los", "y", "es", "un", "una", "de", "del", "que"),
}

# BPE-ish token pattern: letter runs, digit runs, single punctuation.
TOKEN_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"

FP_MOD = 1_000_000_007
FP_BASE = 31


def tokens(text: Column) -> Column:
    """Whitespace tokens, lowercased. DuckDB equivalent:
    ``string_split_regex(lower(text), '\\s+')``."""
    return F.split(F.lower(text), r"\s+")


def token_count(text: Column) -> Column:
    """Whitespace token count (cast long for oracle schema parity)."""
    return F.size(tokens(text)).cast("long")


def bpe_token_count(text: Column) -> Column:
    """Sub-word-ish token count via TOKEN_PATTERN. DuckDB:
    ``len(regexp_extract_all(text, pattern))``."""
    return F.regexp_count(text, F.lit(TOKEN_PATTERN)).cast("long")


def stopword_ratio(text: Column, lang: str = "en") -> Column:
    """Fraction of whitespace tokens in the language's stopword set."""
    toks = tokens(text)
    sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    # count every occurrence, not just distinct words
    occ = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
    return (occ / F.greatest(F.size(toks), F.lit(1))).cast("double")


def punct_ratio(text: Column) -> Column:
    """Punctuation chars / total chars."""
    n = F.length(text)
    p = F.length(F.regexp_replace(text, "[A-Za-z0-9\\s]", ""))
    return (p / F.greatest(n, F.lit(1))).cast("double")


def language_id(text: Column) -> Column:
    """Argmax stopword-hit ratio across STOPWORDS; ties and zero scores
    resolve to 'und'. Deterministic: languages are scanned in sorted
    order and a strictly-greater score is required to switch."""
    toks = tokens(text)
    best_lang = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(STOPWORDS):
        sw = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
        score = F.size(F.filter(toks, lambda t: F.array_contains(sw, t)))
        switch = score > best_score
        best_lang = F.when(switch, F.lit(lang)).otherwise(best_lang)
        best_score = F.when(switch, score).otherwise(best_score)
    return best_lang


def quality_score(text: Column) -> Column:
    """Composite quality in [0,1]:
    0.4·min(len/500,1) + 0.4·stopword_ratio(en) + 0.2·(1-punct_ratio)."""
    len_score = F.least(F.length(text) / F.lit(500.0), F.lit(1.0))
    return (F.lit(0.4) * len_score
            + F.lit(0.4) * stopword_ratio(text, "en")
            + F.lit(0.2) * (F.lit(1.0) - punct_ratio(text))).cast("double")


def fingerprint(text: Column) -> Column:
    """Polynomial rolling hash of the whole document:
    ``h = fold(chars, h*31 + code mod 1e9+7)`` — engine-portable
    (same value in DuckDB via list_reduce), unlike xxhash64."""
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * FP_BASE + F.ascii(c)) % FP_MOD,
    )


def shingles(text: Column, k: int = 5) -> Column:
    """Distinct k-character shingles. DuckDB equivalent:
    ``list_distinct(list_transform(generate_series(1, greatest(length(t)-k+1,1)),
    i -> substr(t, i, k)))``."""
    idx = F.sequence(F.lit(1), F.greatest(F.length(text) - (k - 1), F.lit(1)))
    return F.array_distinct(
        F.transform(idx, lambda i: F.substr(text, i, F.lit(k))))


# ------------------------------------------------------ oracle SQL builders

def stopword_ratio_sql(text: str, lang: str = "en") -> str:
    words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
    return (
        f"(CAST(len(list_filter(string_split_regex(lower({text}), '\\s+'), "
        f"t -> t IN ({words}))) AS DOUBLE) / "
        f"greatest(len(string_split_regex(lower({text}), '\\s+')), 1))")


def punct_ratio_sql(text: str) -> str:
    return (
        f"(CAST(length(regexp_replace({text}, '[A-Za-z0-9\\s]', '', 'g')) "
        f"AS DOUBLE) / greatest(length({text}), 1))")


def language_id_sql(text: str) -> str:
    """Same scan order + strict-greater switch as language_id()."""
    toks = f"string_split_regex(lower({text}), '\\s+')"
    expr_lang, expr_score = "'und'", "0"
    for lang in sorted(STOPWORDS):
        words = ", ".join(f"'{w}'" for w in STOPWORDS[lang])
        score = f"len(list_filter({toks}, t -> t IN ({words})))"
        expr_lang = (f"CASE WHEN {score} > {expr_score} "
                     f"THEN '{lang}' ELSE {expr_lang} END")
        expr_score = (f"CASE WHEN {score} > {expr_score} "
                      f"THEN {score} ELSE {expr_score} END")
    return expr_lang


def quality_score_sql(text: str) -> str:
    return (
        f"(0.4 * least(length({text}) / 500.0, 1.0) "
        f"+ 0.4 * {stopword_ratio_sql(text)} "
        f"+ 0.2 * (1.0 - {punct_ratio_sql(text)}))")


def fingerprint_sql(text: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform(string_split({text}, ''), c -> CAST(ascii(c) AS BIGINT))), "
        f"(acc, c) -> (acc * {FP_BASE} + c) % {FP_MOD})")


def shingles_sql(text: str, k: int = 5) -> str:
    return (
        f"list_distinct(list_transform("
        f"generate_series(1, greatest(length({text})-{k - 1}, 1)), "
        f"i -> substr({text}, i, {k})))")
