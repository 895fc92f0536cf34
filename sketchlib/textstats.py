"""Text-analysis operators for training-data pipelines: language ID,
quality scoring, token counting, document fingerprinting.

All deterministic, all expressible as Catalyst expressions (and as
ANSI SQL for the DuckDB oracles) — no UDFs in these paths.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

# tiny deterministic stopword lists (heuristic language ID)
STOPWORDS = {
    "en": ["the", "a", "of", "and", "to", "in", "is"],
    "es": ["el", "la", "de", "que", "y", "en", "un"],
    "de": ["der", "die", "das", "und", "ist", "ein", "zu"],
    "fr": ["le", "la", "de", "et", "un", "est", "que"],
}

TOKEN_SPLIT = r"\s+"
# BPE-ish word/number/punct segmentation (GPT-2-style simplification)
BPE_ISH = r"[a-z]+|[0-9]+|[^a-z0-9\s]"


def _stopword_hits(lang: str):
    """Count of tokens that are stopwords of ``lang``."""
    words = STOPWORDS[lang]
    toks = F.split(F.lower(F.col("text")), TOKEN_SPLIT)
    return F.size(F.filter(toks, lambda t: t.isin(*words)))


def language_id(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Heuristic language ID: argmax of per-language stopword hits,
    ties broken by language name, 'und' when no stopword matched."""
    langs = sorted(STOPWORDS)
    scored = df.select(id_col, "text",
                       *[_stopword_hits(lg).alias(f"hits_{lg}")
                         for lg in langs])
    best = F.greatest(*[F.col(f"hits_{lg}") for lg in langs])
    pred = F.lit("und")
    for lg in reversed(langs):  # earlier langs win ties
        pred = F.when((F.col(f"hits_{lg}") == best) & (best > 0),
                      F.lit(lg)).otherwise(pred)
    return scored.select(id_col, pred.alias("pred_lang"),
                         best.alias("stopword_hits"))


def token_stats(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Whitespace-token and BPE-ish-piece counts per document."""
    toks = F.split(F.lower(F.col("text")), TOKEN_SPLIT)
    return df.select(
        id_col,
        F.size(F.filter(toks, lambda t: t != "")).alias("n_tokens"),
        F.size(F.regexp_extract_all(F.lower(F.col("text")),
                                    F.lit(BPE_ISH), 0)).alias("n_bpe_pieces"),
        F.length("text").alias("n_chars"),
    )


def quality_score(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Deterministic quality heuristics: token count, mean token
    length, stopword ratio, non-alnum ratio, composite score in [0,1].
    Ratios floored to 6 decimals for cross-engine comparability."""
    toks = F.split(F.lower(F.col("text")), TOKEN_SPLIT)
    n_tok = F.size(F.filter(toks, lambda t: t != ""))
    n_chars = F.length("text")
    n_alnum = F.length(F.regexp_replace(F.lower(F.col("text")),
                                        "[^a-z0-9]", ""))
    sw = None
    for lg in sorted(STOPWORDS):
        h = _stopword_hits(lg)
        sw = h if sw is None else sw + h
    r6 = lambda c: F.floor(c * 1e6) / 1e6  # noqa: E731
    mean_tok_len = (n_chars - (n_tok - 1)) / n_tok  # separators removed
    stop_ratio = sw / n_tok
    alnum_ratio = n_alnum / n_chars
    len_ok = F.when((n_tok >= 5) & (n_tok <= 5000), F.lit(1.0)).otherwise(F.lit(0.0))
    score = (0.4 * len_ok
             + 0.3 * F.least(stop_ratio * F.lit(10.0), F.lit(1.0))
             + 0.3 * alnum_ratio)
    return df.select(
        id_col,
        n_tok.alias("n_tokens"),
        r6(mean_tok_len).alias("mean_token_len"),
        r6(stop_ratio).alias("stopword_ratio"),
        r6(alnum_ratio).alias("alnum_ratio"),
        r6(score).alias("quality_score"),
    )


def fingerprints(df: DataFrame, id_col: str = "doc_id") -> DataFrame:
    """Content fingerprints: md5 of normalized text plus a positional
    rolling-hash-style signature (xxhash64 of 8-token windows, min/max
    kept) for shift-robust matching."""
    toks = F.split(F.lower(F.col("text")), TOKEN_SPLIT)
    windows = F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - 8, F.lit(0))),
        lambda i: F.xxhash64(F.array_join(F.slice(toks, i + 1, 8), " ")))
    return df.select(
        id_col,
        F.md5(F.lower(F.col("text"))).alias("md5_fp"),
        F.array_min(windows).alias("winhash_min"),
        F.array_max(windows).alias("winhash_max"),
    )
