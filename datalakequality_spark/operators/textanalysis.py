"""Text analysis for training-data pipelines: token counting, quality
scoring, language ID, document fingerprinting.

Everything is a pure JVM column expression (split / regexp_count /
array_intersect) — whole-stage codegen end to end, no UDFs — so these
run at scan speed on 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# small, fixed stopword sets per language for the n-gram/stopword
# language-ID heuristic (distinct-hit voting; CJK detected by script)
STOPWORDS = {
    "en": ["the", "and", "of", "to", "a", "in", "is", "that", "for", "it"],
    "es": ["el", "la", "de", "que", "y", "en", "los", "del", "las", "por"],
    "de": ["der", "die", "und", "das", "nicht", "von", "ist", "mit", "den", "im"],
    "fr": ["le", "la", "les", "de", "et", "des", "un", "une", "du", "est"],
}

_PUNCT_RE = r"[!-/:-@\[-`{-~]"  # ASCII punctuation ranges
_CJK_RE = r"[一-鿿]"


def tokens_of(col: Column) -> Column:
    """Whitespace tokens of non-empty text (empty string → empty array,
    matching the intuitive count rather than Spark's split quirk)."""
    t = F.trim(col)
    return F.when(F.length(t) == 0, F.array().cast("array<string>")).otherwise(
        F.split(F.lower(t), r"\s+")
    )


def token_count(col: Column) -> Column:
    return F.size(tokens_of(col))


def bpe_ish_token_count(col: Column) -> Column:
    """Sub-word-ish token estimate without a tokenizer model: count
    regex word pieces + digits + punctuation marks (a deterministic
    proxy for BPE token counts, useful for budget accounting)."""
    return (
        F.regexp_count(col, F.lit(r"[A-Za-z]{1,4}"))
        + F.regexp_count(col, F.lit(r"\d"))
        + F.regexp_count(col, F.lit(_PUNCT_RE))
    )


def with_text_stats(df: DataFrame, text_col: str, prefix: str = "") -> DataFrame:
    """Append per-document stats columns: n_chars, n_tokens,
    avg_token_len, punct_ratio, digit_ratio, stopword_ratio (English),
    and a [0,1] quality score."""
    c = F.col(text_col)
    toks = tokens_of(c)
    n_chars = F.length(c)
    n_tokens = F.size(toks)
    safe_chars = F.greatest(n_chars, F.lit(1))
    safe_tokens = F.greatest(n_tokens, F.lit(1))

    stop_arr = F.array(*[F.lit(w) for w in STOPWORDS["en"]])
    stop_hits = F.size(F.filter(toks, lambda t: F.array_contains(stop_arr, t)))

    punct_ratio = F.regexp_count(c, F.lit(_PUNCT_RE)) / safe_chars
    digit_ratio = F.regexp_count(c, F.lit(r"\d")) / safe_chars
    stopword_ratio = stop_hits / safe_tokens
    avg_token_len = (n_chars - (n_tokens - 1)) / safe_tokens

    # quality heuristic: long enough, readable word lengths, some
    # stopwords (natural language), not punctuation/digit noise
    quality = (
        F.least(n_tokens / F.lit(20.0), F.lit(1.0)) * 0.3
        + F.when((avg_token_len >= 3) & (avg_token_len <= 10), 0.3).otherwise(0.0)
        + F.least(stopword_ratio * 3.0, F.lit(1.0)) * 0.2
        + (F.lit(1.0) - F.least(punct_ratio * 4.0, F.lit(1.0))) * 0.1
        + (F.lit(1.0) - F.least(digit_ratio * 4.0, F.lit(1.0))) * 0.1
    )

    p = prefix
    return df.withColumns(
        {
            f"{p}n_chars": n_chars,
            f"{p}n_tokens": n_tokens,
            f"{p}avg_token_len": F.round(avg_token_len, 6),
            f"{p}punct_ratio": F.round(punct_ratio, 6),
            f"{p}digit_ratio": F.round(digit_ratio, 6),
            f"{p}stopword_ratio": F.round(stopword_ratio, 6),
            f"{p}quality": F.round(quality, 6),
        }
    )


def lang_id(col: Column) -> Column:
    """Heuristic language ID: CJK script share first, else the language
    whose stopword set has the most DISTINCT hits; ties resolve in the
    fixed order en, es, de, fr; no hits at all → 'und'."""
    toks = F.array_distinct(tokens_of(col))
    scores = {
        lang: F.size(
            F.array_intersect(toks, F.array(*[F.lit(w) for w in words]))
        )
        for lang, words in STOPWORDS.items()
    }
    cjk = F.regexp_count(col, F.lit(_CJK_RE))
    best = F.greatest(*scores.values())
    expr = F.when(cjk > F.length(col) * 0.2, F.lit("zh")).when(
        best == 0, F.lit("und")
    )
    for lang in ["en", "es", "de", "fr"]:
        expr = expr.when(scores[lang] == best, F.lit(lang))
    return expr


def pack_chunks(
    df: DataFrame,
    id_col: str,
    n_tok_col: Column | str,
    window: int = 2048,
) -> DataFrame:
    """Fixed-window chunking for context-length preparation: a document
    of N tokens becomes ceil(N/window) chunk rows (doc_id, chunk_id,
    chunk_tokens), the last chunk holding the remainder. Zero-token
    docs emit one empty chunk (so no document silently disappears).

    Pure explode of a generated index sequence — map-side only, no
    shuffle; at 100 TB this parallelizes with the scan. The actual
    token-array slicing (``F.slice(tokens, ...)``) composes on top when
    the tokens column is materialized; this operator owns the chunk
    arithmetic.
    """
    n = F.col(n_tok_col) if isinstance(n_tok_col, str) else n_tok_col
    n_chunks = F.greatest(F.ceil(n / F.lit(window)), F.lit(1)).cast("int")
    exploded = df.select(
        F.col(id_col),
        n.alias("__n_tok"),
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("chunk_id"),
    )
    return exploded.select(
        id_col,
        "chunk_id",
        F.least(
            F.col("__n_tok") - F.col("chunk_id") * window, F.lit(window)
        ).cast("int").alias("chunk_tokens"),
    )


def content_fingerprint(col: Column) -> Column:
    """Exact-content fingerprint: 64-bit hash of the
    whitespace-normalized, lowercased text — the exact-dedup key."""
    normalized = F.regexp_replace(F.lower(F.trim(col)), r"\s+", " ")
    return F.xxhash64(normalized)


def winnow_fingerprint(col: Column, k: int = 5) -> Column:
    """Winnowing-style robust fingerprint: minimum k-gram hash of the
    normalized text (stable under local edits elsewhere in the doc)."""
    from .dedup import word_shingles

    sh = word_shingles(col, k)
    return F.when(
        F.size(sh) > 0, F.array_min(F.transform(sh, lambda s: F.xxhash64(s)))
    ).otherwise(content_fingerprint(col))
