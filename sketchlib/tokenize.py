"""Transcript tokenization — entirely JVM-side (Catalyst built-ins).

Maps the reference's FASTA rolling tokenizer (include/ocm.h:526-584)
onto the transcripts data model from BASELINE.json ``input_hint``:
``(conv_id, turn_idx, role, text, tool, ts)``. Tokens are namespaced
strings (``w:`` words, ``t:`` tools, ``r:`` roles) hashed to 64 bits
with Spark's built-in ``xxhash64`` — no Python in this path, so the
whole stage stays inside whole-stage codegen and the parquet scan only
reads the referenced columns.

The sketch key is the int64 xxhash64 value reinterpreted as uint64 in
the numpy kernels (two's-complement bit pattern is preserved
end-to-end). DuckDB oracles operate on the token *strings*, never the
hashes, so hash parity with DuckDB is not required.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

WORD_SPLIT = r"\s+"


def word_tokens(df: DataFrame, text_col: str = "text",
                extra_cols: tuple[str, ...] = ()) -> DataFrame:
    """One row per whitespace word of ``text_col``, lowercased,
    namespaced ``w:``; empty strings dropped."""
    keep = [F.col(c) for c in extra_cols]
    return (
        df.select(*keep,
                  F.explode(F.split(F.lower(F.col(text_col)), WORD_SPLIT))
                   .alias("raw"))
          .filter(F.col("raw") != "")
          .select(*keep, F.concat(F.lit("w:"), F.col("raw")).alias("token"))
    )


def transcript_tokens(df: DataFrame,
                      words: bool = True,
                      tools: bool = True,
                      roles: bool = True) -> DataFrame:
    """Token stream ``(conv_id, token, token_u64)`` for a transcripts
    DataFrame — the engine's equivalent of the reference's k-mer stream
    (one sketch update per row)."""
    parts = []
    if words:
        parts.append(word_tokens(df, "text", ("conv_id",)))
    if tools:
        parts.append(
            df.filter(F.col("tool").isNotNull())
              .select("conv_id",
                      F.concat(F.lit("t:"), F.col("tool")).alias("token")))
    if roles:
        parts.append(
            df.select("conv_id",
                      F.concat(F.lit("r:"), F.col("role")).alias("token")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.withColumn("token_u64", F.xxhash64("token"))


def balanced_repartition(df: DataFrame, n: int) -> DataFrame:
    """Perfectly balanced round-robin repartition. Sketch builds don't
    need key co-location (merge is associative & commutative), so the
    strongest anti-skew move is to not partition by key at all — a hot
    conversation's tokens spread evenly. AQE alone cannot rebalance the
    input of a custom aggregation."""
    return df.repartition(n)


def salted_repartition(df: DataFrame, n: int, key: str = "conv_id",
                       salt_col: str = "turn_idx", buckets: int = 64) -> DataFrame:
    """Keyed-but-salted repartition for operators that *do* group per
    key (e.g. per-conversation kernels): hash on ``(key, salt_col %
    buckets)`` so a hot key splits across up to ``buckets`` partitions.
    Note a constant salt would NOT help — same key ⇒ same partition;
    the salt must vary within the key."""
    return df.repartition(
        n, F.xxhash64(F.col(key), F.col(salt_col) % F.lit(buckets)))
