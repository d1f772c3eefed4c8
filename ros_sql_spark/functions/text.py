"""Text-analysis functions for LLM-data pipelines (engine extensions;
the reference has no text processing — SURVEY.md §2.2/§2.3).

All functions are pure Spark SQL expressions (JVM, codegen) — no UDFs.
Cross-engine discipline: hashes go through md5 (the one digest Spark and
DuckDB share); 60-bit integers are built from 15 hex digits so they fit
a signed BIGINT identically in both engines.

CollapseProject hazard (see operators/dedup.py): any per-token pipeline
referenced from a multi-iteration lambda gets re-inlined per iteration.
Everything here folds token hashes ONCE via F.aggregate.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column

__all__ = [
    "tokens",
    "token_hash60",
    "simhash",
    "detect_lang",
    "STOPWORDS",
    "avg_token_len",
    "punct_ratio",
    "stopword_ratio",
    "token_count_bpe",
    "fingerprint",
    "BPE_TOKEN_RE",
]

SIMHASH_BITS = 60  # 15 hex digits of md5 → fits signed 64-bit in both engines

# BPE-ish pre-tokenizer: letter runs, digit runs, single other non-space.
BPE_TOKEN_RE = r"[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]"

# Tiny per-language stopword lists (language-ID heuristic: argmax of
# stopword hits; deterministic tie order en > de > es > fr > zh).
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "with", "for", "on"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "mit", "ein", "von", "zu"],
    "es": ["el", "la", "los", "las", "es", "y", "de", "que", "en", "por"],
    "fr": ["le", "la", "les", "et", "est", "dans", "pour", "que", "une", "des"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "就", "不", "人"],
}


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens(text_col: Column | str) -> Column:
    """Lowercased whitespace tokens (array<string>)."""
    return F.split(F.lower(_c(text_col)), " ")


def token_hash60(tok: Column) -> Column:
    """Deterministic 60-bit hash of a token, identical in Spark and DuckDB.

    Spark:  conv(substr(md5(t),1,15), 16, 10)::bigint
    DuckDB: CAST(concat('0x', substr(md5(t),1,15)) AS BIGINT)
    """
    return F.conv(F.substring(F.md5(tok.cast("binary")), 1, 15), 16, 10).cast(
        "bigint"
    )


def simhash(tokens_col: Column | str, bits: int = SIMHASH_BITS) -> Column:
    """SimHash document fingerprint (near-dup signature) as a BIGINT.

    bit j of the result = 1 iff sum over tokens of ±1 (sign of bit j of
    the token's 60-bit hash) is positive.  Token multiplicity counts —
    repeated tokens weigh more, the classic Charikar formulation.

    Single-fold structure: hash each token once, then one aggregate pass
    updates all ``bits`` counters per token (zip_with); a second fold
    packs the sign vector into one BIGINT.
    """
    toks = _c(tokens_col)
    dims = F.sequence(F.lit(0), F.lit(bits - 1))  # constant-folded
    # shiftright/shiftleft via call_function: the pyspark wrappers only
    # accept a literal int shift amount, but j here is a lambda variable.
    counts = F.aggregate(
        F.transform(toks, token_hash60),
        F.array_repeat(F.lit(0).cast("bigint"), bits),
        lambda acc, h: F.zip_with(
            acc,
            dims,
            lambda a, j: a
            + F.when(
                F.call_function("shiftright", h, j.cast("int")).bitwiseAND(
                    F.lit(1)
                )
                == 1,
                1,
            )
            .otherwise(-1)
            .cast("bigint"),
        ),
    )
    return F.aggregate(
        F.zip_with(
            counts,
            dims,
            lambda c, j: F.when(
                c > 0,
                F.call_function(
                    "shiftleft", F.lit(1).cast("bigint"), j.cast("int")
                ),
            ).otherwise(F.lit(0).cast("bigint")),
        ),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v,
    )


def _stopword_hits(toks: Column, lang: str) -> Column:
    wl = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    return F.size(F.array_intersect(F.array_distinct(toks), wl))


def detect_lang(text_col: Column | str) -> Column:
    """n-gram/stopword language-ID heuristic → lang code or 'und'.

    Scores each language by distinct-stopword hits; argmax with the
    deterministic tie order en > de > es > fr > zh; 'und' when no
    stopword matches at all.
    """
    toks = tokens(text_col)
    scores = {lang: _stopword_hits(toks, lang) for lang in STOPWORDS}
    best = F.greatest(*scores.values())
    expr = F.lit("und")
    # build the when-chain in reverse so earlier languages win ties
    for lang in reversed(list(STOPWORDS)):
        expr = F.when((scores[lang] == best) & (best > 0), F.lit(lang)).otherwise(
            expr
        )
    return expr


def avg_token_len(tokens_col: Column | str) -> Column:
    """Mean token length (double; round at the call site for parity)."""
    toks = _c(tokens_col)
    total = F.aggregate(
        F.transform(toks, lambda t: F.length(t)),
        F.lit(0).cast("bigint"),
        lambda acc, v: acc + v.cast("bigint"),
    )
    return total.cast("double") / F.size(toks).cast("double")


def punct_ratio(text_col: Column | str) -> Column:
    """Non-alphanumeric-non-space chars / total chars."""
    c = _c(text_col)
    return F.regexp_count(c, F.lit(r"[^A-Za-z0-9\s]")).cast("double") / F.length(
        c
    ).cast("double")


def stopword_ratio(tokens_col: Column | str, lang: str = "en") -> Column:
    """Fraction of tokens (with multiplicity) that are stopwords."""
    toks = _c(tokens_col)
    wl = F.array(*[F.lit(w) for w in STOPWORDS[lang]])
    hits = F.size(F.filter(toks, lambda t: F.array_contains(wl, t)))
    return hits.cast("double") / F.size(toks).cast("double")


def token_count_bpe(text_col: Column | str) -> Column:
    """Token count under the BPE-ish pre-tokenizer regex."""
    return F.size(F.regexp_extract_all(_c(text_col), F.lit(BPE_TOKEN_RE), 0)).cast(
        "bigint"
    )


def fingerprint(text_col: Column | str) -> Column:
    """Order-insensitive content fingerprint: md5 over the sorted distinct
    token set.  Two docs with permuted wording share a fingerprint —
    a cheap bag-of-words dedup key."""
    toks = tokens(text_col)
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(toks)))
    return F.md5(canon.cast("binary"))
