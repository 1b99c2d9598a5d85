"""Text-analysis column builders for LLM-data pipelines (north-star scope;
no counterpart in the reference — it has no string surface at all).

All pure ``pyspark.sql.functions`` compositions: JVM-side, codegen-friendly,
zero Python in the hot path.  Each has an exact DuckDB mirror used by the
oracle queries in operators/tier3.py.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "token_count",
    "stopword_count",
    "stopword_count_toks",
    "avg_token_len_toks",
    "alpha_ratio",
    "avg_token_len",
    "char_fingerprint",
    "LANG_STOPWORDS",
    "lang_scores",
    "lang_pred",
]


def tokens(col: Column) -> Column:
    """Whitespace tokens with empties dropped (mirror:
    ``list_filter(regexp_split_to_array(x,'\\s+'), t -> t != '')``)."""
    return F.filter(F.split(col, r"\s+"), lambda t: t != "")


def token_count(col: Column) -> Column:
    return F.size(tokens(col)).cast("long")


def stopword_count(col: Column, words: Sequence[str]) -> Column:
    return stopword_count_toks(tokens(col), words)


def stopword_count_toks(toks: Column, words: Sequence[str]) -> Column:
    """Stopword hits over an ALREADY-tokenized array column.  Use this
    when a query needs several token-derived signals: tokenizing is a
    regex split of the full text, and inline helpers embed one split per
    signal reference (text_lang_id's when-chain embedded NINE — measured
    2.97 s vs 0.53 s at sf0.1).  Stage ``tokens(text)`` as a column once,
    then derive."""
    lst = F.array(*[F.lit(w) for w in words])
    return F.size(F.filter(toks, lambda t: F.array_contains(lst, t))).cast("long")


def avg_token_len_toks(toks: Column) -> Column:
    """Mean token length over an already-tokenized array column (see
    stopword_count_toks for why staging matters)."""
    total = F.aggregate(toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t))
    return F.try_divide(total, F.size(toks))


def alpha_ratio(col: Column) -> Column:
    """Share of [a-z] characters — a standard cheap quality signal.
    try_divide: empty documents yield null instead of aborting the whole
    job under ANSI mode's DIVIDE_BY_ZERO."""
    return F.try_divide(F.length(F.regexp_replace(col, "[^a-z]", "")), F.length(col))


def avg_token_len(col: Column) -> Column:
    toks = tokens(col)
    total = F.aggregate(
        toks, F.lit(0).cast("long"), lambda acc, t: acc + F.length(t)
    )
    # try_divide: whitespace-only documents have zero tokens → null.
    return F.try_divide(total, F.size(toks))


# Rolling polynomial hash over characters, mod 1e9+7 — a deterministic,
# engine-portable document fingerprint (unlike xxhash64, DuckDB can mirror
# it exactly: list_reduce(list_prepend(0, codes), (a,c)->(a*31+c)%p)).
_FP_MOD = 1_000_000_007


def char_fingerprint(col: Column) -> Column:
    # split('') materializes the char array in ONE pass; the previous
    # per-index substring() form re-scanned the string per character
    # (O(n²) on UTF8String) and was 4× slower at sf0.1 — same value,
    # verified bit-for-bit against the old form and the DuckDB mirror.
    codes = F.transform(F.split(col, ""), lambda c: F.ascii(c).cast("long"))
    return F.aggregate(
        codes, F.lit(0).cast("long"), lambda acc, c: (acc * 31 + c) % _FP_MOD
    )


# Tiny distinctive-stopword lists: a classic n-gram/stopword language-ID
# heuristic (scores are exact set-membership counts → oracle-mirrorable).
LANG_STOPWORDS = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "und", "das", "ist"),
    "es": ("el", "la", "de", "que", "y"),
}


def lang_scores(col: Column) -> dict[str, Column]:
    return {lang: stopword_count(col, words) for lang, words in LANG_STOPWORDS.items()}


def lang_pred(col: Column) -> Column:
    """argmax over language scores with a fixed tie order (en > de > es >
    unknown) so the prediction is deterministic."""
    s = lang_scores(col)
    return (
        F.when((s["en"] >= s["de"]) & (s["en"] >= s["es"]) & (s["en"] > 0), "en")
        .when((s["de"] >= s["es"]) & (s["de"] > 0), "de")
        .when(s["es"] > 0, "es")
        .otherwise("unknown")
    )


# BPE-ish pre-tokenizer: letter runs | digit runs | single symbol — the
# standard pre-tokenization split (GPT-2-style) before merges; identical
# regex semantics in Java (Spark) and RE2 (DuckDB) for this class set.
BPE_SPLIT_RE = r"[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]"


def bpe_tokens(col: Column) -> Column:
    return F.regexp_extract_all(col, F.lit(BPE_SPLIT_RE), 0)


def bpe_token_count(col: Column) -> Column:
    return F.size(bpe_tokens(col)).cast("long")
