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
    (one sketch update per row).

    Single-scan design: all token kinds are built as one array per
    turn and exploded once. A union of three per-kind scans would read
    the input 3x and triple the map-task count — the driver's
    task-launch path is serial, so at 128-partition inputs the extra
    256 tasks per pass cost more than the tokenization itself
    (measured: 3.7s -> ~1.3s map stage at local[32]).

    The namespacing ("w:" words / "t:" tools / "r:" roles) is carried
    as a small int hashed alongside the value (multi-column xxhash64)
    rather than a string concat — at 10^8 updates/pass the concat's
    per-token byte copy is pure memory-bandwidth waste. The readable
    ``token`` string column is still provided, but lazily: select it
    and Catalyst computes the concat, don't and it's pruned."""
    st = lambda k, v: F.struct(F.lit(k).cast("int").alias("kind"),  # noqa: E731
                               v.alias("val"))
    empty = F.array().cast("array<struct<kind:int,val:string>>")
    per_turn = []
    if words:
        # coalesce: a NULL text must yield an empty word array, not a
        # NULL one — F.concat is null-intolerant, so a NULL element
        # would nullify the whole per-turn token array and silently
        # drop the turn's tool/role tokens too
        per_turn.append(F.coalesce(
            F.transform(
                F.filter(F.split(F.lower(F.col("text")), WORD_SPLIT),
                         lambda x: x != ""),
                lambda x: st(0, x)),
            empty))
    if tools:
        per_turn.append(
            F.when(F.col("tool").isNotNull(),
                   F.array(st(1, F.col("tool"))))
             .otherwise(empty))
    if roles:
        per_turn.append(F.array(st(2, F.col("role"))))
    tokens = per_turn[0] if len(per_turn) == 1 else F.concat(*per_turn)
    prefix = F.element_at(F.array(F.lit("w:"), F.lit("t:"), F.lit("r:")),
                          F.col("tk.kind") + 1)
    return (df.select("conv_id", F.explode(tokens).alias("tk"))
              .select("conv_id",
                      F.concat(prefix, F.col("tk.val")).alias("token"),
                      F.xxhash64("tk.kind", "tk.val").alias("token_u64")))


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
