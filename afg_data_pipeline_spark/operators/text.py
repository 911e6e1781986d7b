"""Text-analysis operators for LLM-data pipelines (north star,
BASELINE.json: "text analysis" + SURVEY.md §7 Phase 5).

All JVM-side native expressions — tokenization, ratios, language-ID
scoring, and fingerprinting run inside whole-stage codegen with no
Python in the hot path, so a 100 TB documents scan is one
projection pass. The DuckDB oracle twins use the same regex/list
semantics (verified: regexp_split_to_array ≡ split, list_filter
counting keeps duplicates, regexp_replace needs the 'g' flag).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword
# heuristic language-ID (public-knowledge word lists).
STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "is"],
    "de": ["der", "die", "das", "und", "ist"],
    "fr": ["le", "la", "et", "les", "est"],
    "es": ["el", "la", "los", "y", "es"],
}

PUNCT_CLASS = "[.,!?;:]"
# BPE-ish pre-tokenizer: letter runs, digit runs, or single
# non-space symbols — the classic GPT-2-style regex shape.
BPE_PATTERN = "[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]"


def tokens(col: str = "text") -> Column:
    """Whitespace tokenization (split on \\s+ of trimmed text)."""
    return F.split(F.trim(F.col(col)), "\\s+")


def token_count(col: str = "text") -> Column:
    return F.size(tokens(col)).cast("bigint")


def distinct_token_count(col: str = "text") -> Column:
    return F.size(F.array_distinct(tokens(col))).cast("bigint")


def stopword_count(col: str = "text", lang: str = "en") -> Column:
    stops = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    return F.size(
        F.filter(tokens(col), lambda t: F.array_contains(stops, t))
    ).cast("bigint")


def punct_count(col: str = "text") -> Column:
    return F.size(
        F.regexp_extract_all(F.col(col), F.lit(PUNCT_CLASS), F.lit(0))
    ).cast("bigint")


def bpe_token_count(col: str = "text") -> Column:
    """Token count under the BPE-ish pre-tokenizer regex."""
    return F.size(
        F.regexp_extract_all(F.col(col), F.lit(BPE_PATTERN), F.lit(0))
    ).cast("bigint")


def quality_score(col: str = "text") -> Column:
    """Deterministic [0,1] quality heuristic.

    0.4·stopword-ratio + 0.3·min(1, tokens/100) + 0.3·(1−punct
    density) — the standard length/stopword/punctuation trio of
    web-scale quality filters, all per-row IEEE-exact.
    """
    n_tok = token_count(col).cast("double")
    stop_ratio = stopword_count(col).cast("double") / n_tok
    len_score = F.least(F.lit(1.0), n_tok / F.lit(100.0))
    punct_density = punct_count(col).cast("double") / F.length(
        F.col(col)
    ).cast("double")
    return (
        F.lit(0.4) * stop_ratio
        + F.lit(0.3) * len_score
        + F.lit(0.3) * (F.lit(1.0) - punct_density)
    )


def lang_scores(col: str = "text") -> dict[str, Column]:
    """Per-language stopword-hit counts on the tokenized text."""
    toks = tokens(col)
    out = {}
    for lang, words in STOPWORDS.items():
        stops = F.array(*[F.lit(s) for s in words])
        out[lang] = F.size(
            F.filter(toks, lambda t: F.array_contains(stops, t))
        ).cast("bigint")
    return out


def lang_id(col: str = "text") -> Column:
    """Argmax language with fixed priority order on ties.

    The heuristic form of the reference-free language-ID stage of a
    training-data pipeline; ties resolve en>de>fr>es so the result
    is deterministic (and matches the CASE chain in the oracle).
    """
    scores = lang_scores(col)
    langs = list(STOPWORDS)
    expr = F.lit(langs[-1])
    # Build the CASE chain back-to-front: a language wins if its
    # score is >= every later language and > every earlier one is
    # encoded by evaluation order (first satisfied WHEN wins).
    expr = None
    mx = F.greatest(*[scores[lg] for lg in langs])
    for lg in langs:
        cond = scores[lg] == mx
        expr = (
            F.when(cond, F.lit(lg))
            if expr is None
            else expr.when(cond, F.lit(lg))
        )
    return expr


def doc_fingerprint(shingles: Column) -> Column:
    """Document fingerprint: min over the shingles' md5 hashes.

    A 1-permutation MinHash (the md5 ordering is the permutation):
    robust to word reordering beyond the shingle width, cheap to
    compare, and computable identically in any engine with md5 —
    rolling-hash fingerprinting re-expressed hash-first.
    """
    return F.array_min(F.transform(shingles, F.md5))


def shingle_expr(
    toks_col: str, k: int, out_sep: str = " "
) -> Column:
    """Word/char k-shingles of an array column (1-based element_at,
    matching DuckDB's 1-based list indexing for oracle parity)."""
    parts = ", ".join(
        f"element_at({toks_col}, i + {j})" for j in range(k)
    )
    return F.expr(
        f"""
        CASE WHEN size({toks_col}) < {k}
             THEN array(concat_ws('{out_sep}', {toks_col}))
        ELSE transform(
            sequence(1, size({toks_col}) - {k - 1}),
            i -> concat_ws('{out_sep}', {parts}))
        END
        """
    )


def text_stats(df: DataFrame, col: str = "text") -> DataFrame:
    """Full per-document stats projection (single codegen pass)."""
    return df.select(
        "doc_id",
        token_count(col).alias("n_tokens"),
        distinct_token_count(col).alias("n_distinct_tokens"),
        F.length(F.col(col)).cast("bigint").alias("n_chars_calc"),
        bpe_token_count(col).alias("n_bpe_tokens"),
        stopword_count(col).alias("n_stopwords"),
        punct_count(col).alias("n_punct"),
        quality_score(col).alias("quality"),
    )


def redact_pii(col: str = "text"):
    """PII scrubbing expression: emails, IPv4 addresses, and
    international-format phone numbers replaced by typed tags.

    Chained regexp_replace — native, codegen-friendly, one pass per
    pattern class. Patterns are deliberately conservative (standard
    pipeline practice: redact on clear syntactic evidence; entity
    NER is a model stage, not an engine stage). Order matters:
    emails first (phone regex could eat digit runs inside them
    otherwise), then IPs, then phones.
    """
    out = F.regexp_replace(
        F.col(col),
        r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
        "[EMAIL]",
    )
    out = F.regexp_replace(
        out,
        r"\b(?:\d{1,3}\.){3}\d{1,3}\b",
        "[IP]",
    )
    out = F.regexp_replace(
        out,
        r"\+\d{1,3}[ -]?\d{1,4}[ -]?\d{3,4}[ -]?\d{3,4}",
        "[PHONE]",
    )
    return out
