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


def quality_score_of(
    toks: Column, col: str = "text", lang: str = "en"
) -> Column:
    """quality_score over a pre-materialized token-array column.

    Callers that evaluate the score in a context WITHOUT
    subexpression elimination (interpreted generator inputs — the
    functions/gate.py single-evaluation gates) should project
    ``tokens(col)`` once and pass the column here: the plain
    ``quality_score`` re-splits the text once per counter (3×).
    Value-identical to ``quality_score`` by construction — same
    expression tree over the same token array, only the array's
    provenance (column vs inline split) differs.
    """
    n_tok = F.size(toks).cast("bigint").cast("double")
    stops = F.array(*[F.lit(s) for s in STOPWORDS[lang]])
    stop_ratio = (
        F.size(
            F.filter(toks, lambda t: F.array_contains(stops, t))
        )
        .cast("bigint")
        .cast("double")
        / n_tok
    )
    len_score = F.least(F.lit(1.0), n_tok / F.lit(100.0))
    punct_density = punct_count(col).cast("double") / F.length(
        F.col(col)
    ).cast("double")
    return (
        F.lit(0.4) * stop_ratio
        + F.lit(0.3) * len_score
        + F.lit(0.3) * (F.lit(1.0) - punct_density)
    )


def quality_score(col: str = "text") -> Column:
    """Deterministic [0,1] quality heuristic.

    0.4·stopword-ratio + 0.3·min(1, tokens/100) + 0.3·(1−punct
    density) — the standard length/stopword/punctuation trio of
    web-scale quality filters, all per-row IEEE-exact.
    """
    return quality_score_of(tokens(col), col)


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


def char_entropy_profile(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Per-document character-level Shannon entropy (bits/char):
    (id, n_chars_counted, entropy) — the classic gibberish /
    binary-paste / repeated-padding quality signal (very low
    entropy = repetition, very high = random noise).

    H = (ln(n) − (Σ_c cnt·ln(cnt)) / n) / ln 2 over per-char
    counts — the factored form needs ONE aggregate over the
    (doc, char) count table instead of materializing
    probabilities. The inner sum is quantized to
    round(cnt·ln(cnt)·1e9) and accumulated as exact BIGINT
    (cnt ≤ doc length ~1e4 → addend ≤ 1e14, far under 2^63 even
    for million-char docs), because decimal casts of irrational
    doubles are NOT portable across engines (see
    operators/tfidf.py) while integer rounding of the same double
    is. The outer expression is then scalar double ops on exact
    integers — deterministic on any engine. ln, not log2: natural
    log is bit-identical between Spark and DuckDB (verified over
    2..2000), while log2 differs in the last ulp for ~25% of
    inputs; the bits conversion divides by a LITERAL ln 2 on both
    sides.

    Scale: explode(chars) → groupBy(id, char) partial-aggregates
    map-side (alphabet-bounded fanin), then one per-doc combine.
    """
    chars = df.select(
        F.col(id_col).alias("id"),
        F.explode(F.split(F.col(text_col), "")).alias("c"),
    ).filter(F.length("c") > 0)
    counts = chars.groupBy("id", "c").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    q = F.round(
        F.col("cnt").cast("double")
        * F.log(F.col("cnt").cast("double"))
        * F.lit(1e9),
        0,
    ).cast("bigint")
    per = counts.groupBy("id").agg(
        F.sum("cnt").alias("n"),
        F.sum(q).alias("qsum"),
    )
    ln2 = 0.6931471805599453
    h = (
        F.log(F.col("n").cast("double"))
        - F.col("qsum").cast("double")
        / F.lit(1e9)
        / F.col("n").cast("double")
    ) / F.lit(ln2)
    # ln() can differ by 1 ulp between JVM Math.log and libm, so
    # the final score is snapped to a 1e-9 grid through an integer
    # round (cross-engine-stable; straddle risk ~1e-12/row).
    hq = F.round(h * F.lit(1e9), 0).cast("bigint").cast(
        "double"
    ) / F.lit(1e9)
    return per.select(
        "id",
        F.col("n").alias("n_chars_counted"),
        hq.alias("entropy"),
    )


def chunk_documents(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 200,
    stride: int = 150,
) -> DataFrame:
    """Sliding-window document chunking for training-sequence prep:
    (id, chunk_idx, chunk_text, n_chunk_chars), chunks of ``size``
    chars every ``stride`` chars (overlap = size − stride). The
    last chunk may be shorter; a doc shorter than ``size`` yields
    exactly one chunk. Pure native expressions (length / sequence /
    explode / substring) — character-indexed identically in Spark
    and DuckDB (both 1-based, code-point semantics).

    Scale: the explode expands each row by ~len/stride — bounded
    and uniform (no skew amplification), so the parquet scan's
    partitioning carries through; no shuffle at all.
    """
    if stride <= 0 or size <= 0:
        raise ValueError("size and stride must be positive")
    n = F.length(F.col(text_col))
    k_max = F.floor(
        (
            F.greatest(n - F.lit(size), F.lit(0))
            + F.lit(stride - 1)
        )
        / F.lit(stride)
    ).cast("int")
    out = df.select(
        F.col(id_col).alias("id"),
        F.col(text_col).alias("__text"),
        F.explode(F.sequence(F.lit(0), k_max)).alias("chunk_idx"),
    )
    chunk = F.expr(
        f"substring(__text, 1 + chunk_idx * {stride}, {size})"
    )
    return out.select(
        "id",
        F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
        chunk.alias("chunk_text"),
    ).withColumn("n_chunk_chars", F.length("chunk_text"))


def content_defined_chunks(
    docs,
    k: int = 3,
    divisor: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Content-defined chunking (the LBFS/FastCDC idea applied at
    token granularity): a chunk boundary falls BEFORE every token
    position whose k-token window hashes to 0 mod ``divisor``, so
    boundaries are a pure function of LOCAL content — insert or
    delete a paragraph and every chunk outside it keeps its exact
    identity, which fixed-size chunking cannot do. Chunks average
    ``divisor`` tokens; corpus-wide identical chunks are then
    found by digest, giving offset-robust BLOCK-level dedup — the
    tier between whole-doc hashing and Lee-et-al span counting.

    Output: (id, chunk_idx, chunk_digest, n_chunk_tokens) — one
    row per chunk, chunk_idx 0-based in document order,
    chunk_digest = md5 of the space-joined chunk tokens.

    Portability: the boundary predicate decodes the first two hex
    digits of md5(gram) (instr over the hex alphabet — the same
    engine-portable trick as operators/contrastive; no xxhash in
    DuckDB, no conv()) and tests % divisor == 0. Scale shape: one
    gram stream (bounded explode, pre-repartitioned), a per-doc
    cumulative-sum window for chunk ids, and a per-(doc, chunk)
    ordered rebuild — shuffles on (id) only; chunk digests are
    computed AFTER the rebuild on ~divisor-token strings.
    """
    from pyspark.sql import Window

    par = docs.sparkSession.sparkContext.defaultParallelism
    # Filter on the RAW column, not the derived array: split() of a
    # non-null trimmed string always has >= 1 element ([""]  for
    # empty text), so `size(t) >= 1` only ever excluded null-text
    # rows — but as a derived-column predicate it pushed to the
    # scan with the full split expression inlined, re-running the
    # regex per row (the r10 inferred/pushed-filter class).
    base = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col).alias("id"),
        F.split(F.trim(F.col(text_col)), r"\s+").alias("t"),
    )
    toks = (
        base.repartition(par)
        .select(
            "id",
            F.size("t").alias("n"),
            # outer + isNotNull: the non-outer generate would infer
            # size(t) > 0 and push another split-bearing filter
            # below the exchange; split elements are never null and
            # the array is never empty, so the row set is identical.
            F.posexplode_outer("t").alias("pos0", "tok"),
            "t",
        )
        .filter(F.col("tok").isNotNull())
        .select(
            "id",
            "n",
            "t",
            "tok",
            (F.col("pos0") + 1).alias("pos"),
        )
        .select(
            "id",
            "pos",
            "tok",
            F.when(
                F.col("pos") + F.lit(k - 1) <= F.col("n"),
                F.md5(
                    F.concat_ws(
                        " ", F.expr(f"slice(t, pos, {k})")
                    )
                ),
            ).alias("gh"),
        )
    )
    hexv = (
        "(instr('0123456789abcdef', substr(gh, 1, 1)) - 1) * 16"
        " + instr('0123456789abcdef', substr(gh, 2, 1)) - 1"
    )
    flagged = toks.withColumn(
        "boundary",
        F.when(
            F.col("gh").isNotNull()
            & (F.expr(f"pmod({hexv}, {divisor})") == 0)
            & (F.col("pos") > 1),
            F.lit(1),
        ).otherwise(F.lit(0)),
    )
    wdoc = Window.partitionBy("id").orderBy("pos")
    chunked = flagged.withColumn(
        "chunk_idx",
        F.sum("boundary").over(
            wdoc.rowsBetween(
                Window.unboundedPreceding, Window.currentRow
            )
        ),
    )
    return (
        chunked.groupBy("id", "chunk_idx")
        .agg(
            F.md5(
                F.expr(
                    "array_join(transform("
                    " array_sort(collect_list(struct(pos, tok))),"
                    " x -> x.tok), ' ')"
                )
            ).alias("chunk_digest"),
            F.count(F.lit(1)).alias("n_chunk_tokens"),
        )
        .select(
            "id",
            F.col("chunk_idx").cast("bigint").alias("chunk_idx"),
            "chunk_digest",
            F.col("n_chunk_tokens").cast("bigint").alias(
                "n_chunk_tokens"
            ),
        )
    )
