"""Per-conversation aggregate statistics over transcript tables.

The payload-level profile a transcript pipeline computes before any
curation decision: turns, role mix, tool usage, duration, text volume
— one Tungsten hash aggregation keyed by ``conv_id`` (map-side
combined; conditional counts are ``SUM(CASE)`` expressions, token
counts reuse the whitespace-token convention of
``sketchlib/textstats.py``), entirely whole-stage codegen. At 10^12
turns this is ONE shuffle of partial aggregates bounded by
|conversations|, not |turns|.

Hot conversations are no hazard here (unlike order-dependent kernels):
a hot conv_id's partials still combine map-side, so the reducer sees
one partial per upstream partition, not one row per turn.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["conversation_stats"]


def conversation_stats(df: DataFrame,
                       conv_col: str = "conv_id",
                       turn_col: str = "turn_idx",
                       role_col: str = "role",
                       text_col: str = "text",
                       tool_col: str = "tool",
                       ts_col: str = "ts") -> DataFrame:
    """One row per conversation:

    (conv_id, n_turns, n_user, n_assistant, n_tool_turns,
    n_distinct_tools, n_words, duration_s, first_turn, last_turn).

    NULL text counts 0 words; NULL tool rows don't contribute tools —
    the same null tolerance the tokenizer guarantees (ADVICE round-1
    fix: a tool-call turn with NULL text must still be counted)."""
    words = F.when(
        F.col(text_col).isNull() | (F.trim(F.col(text_col)) == ""),
        F.lit(0)).otherwise(
        F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
    return (df.groupBy(F.col(conv_col).alias("conv_id"))
            .agg(F.count(F.lit(1)).alias("n_turns"),
                 F.sum((F.col(role_col) == "user").cast("long"))
                  .alias("n_user"),
                 F.sum((F.col(role_col) == "assistant").cast("long"))
                  .alias("n_assistant"),
                 F.sum((F.col(role_col) == "tool").cast("long"))
                  .alias("n_tool_turns"),
                 F.count_distinct(F.col(tool_col))
                  .alias("n_distinct_tools"),
                 F.sum(words).alias("n_words"),
                 (F.unix_timestamp(F.max(ts_col))
                  - F.unix_timestamp(F.min(ts_col))).alias("duration_s"),
                 F.min(turn_col).alias("first_turn"),
                 F.max(turn_col).alias("last_turn")))
