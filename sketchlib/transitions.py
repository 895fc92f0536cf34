"""Sequence-transition analytics over keyed, ordered event streams.

The transcript payload is a keyed sequence (conv_id, turn_idx ->
role/tool); the first-order structure a pipeline reports on it is the
transition matrix — how often does `user` hand off to `assistant`,
which tools follow which roles, what state loops exist. One window
function and one aggregation, entirely JVM-side:

    LAG(state) OVER (PARTITION BY key ORDER BY order_cols)
    GROUP BY (prev, curr)

Scale shape: the window shuffles once on the key (the same exchange a
per-key sort already needs — at 10^12 turns this is the minimum
possible data movement for an order-dependent statistic), the bigram
aggregation is a Tungsten hash agg with map-side combine over at most
|states|^2 groups. Hot keys: a single conversation's turns must sit in
one task for the LAG (order-dependence is irreducible); the
hot-conversation guard is the generator-side cap on turns per conv,
not salting — documented at sketchlib/tokenize.py:salted_repartition
for the statistics that CAN salt.

First row of each key has prev=NULL; ``drop_first=True`` (default)
drops it — the bigram stream has exactly (len-1) entries per key —
while ``drop_first=False`` keeps it as a '^' start-of-sequence state
(language-model convention).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["transition_counts", "sequence_ngrams"]

START = "^"


def transition_counts(df: DataFrame, key_col: str,
                      order_cols: list[str], state_col: str,
                      drop_first: bool = True,
                      with_prob: bool = True) -> DataFrame:
    """(prev_state, state, n_transitions [, prob]) over every keyed
    sequence in ``df``; ``prob`` is row-normalized (P[curr | prev],
    one double division — deterministic, hash-stable)."""
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    lagged = df.select(
        F.lag(F.col(state_col)).over(w).alias("prev_state"),
        F.col(state_col).alias("state"))
    if drop_first:
        lagged = lagged.filter(F.col("prev_state").isNotNull())
    else:
        # fillna with a string is a silent no-op on non-string columns
        # — the '^' START convention only exists for string states
        if dict(df.dtypes)[state_col] != "string":
            raise ValueError(
                "drop_first=False requires a string state column "
                "(the '^' start marker has no value in "
                f"{dict(df.dtypes)[state_col]})")
        lagged = lagged.fillna({"prev_state": START})
    counts = (lagged.groupBy("prev_state", "state")
              .agg(F.count(F.lit(1)).alias("n_transitions")))
    if with_prob:
        totals = Window.partitionBy("prev_state")
        counts = counts.withColumn(
            "prob",
            F.col("n_transitions") / F.sum("n_transitions").over(totals))
    return counts


def sequence_ngrams(df: DataFrame, key_col: str,
                    order_cols: list[str], state_col: str,
                    n: int = 3) -> DataFrame:
    """Order-``n`` state n-grams per keyed sequence: one row per
    (state_{i-n+1}, ..., state_i) window with its occurrence count —
    the sequence-mining generalization of :func:`transition_counts`
    (n=2). Windows that would cross a sequence start are dropped, so
    every key contributes exactly ``max(0, len-n+1)`` n-grams.

    Plan shape: n-1 LAG columns over the SAME window specification —
    Catalyst evaluates them in one Window operator over one key
    exchange — then a Tungsten hash agg over at most |states|^n
    groups. No self-joins, no explode."""
    w = Window.partitionBy(key_col).orderBy(*[F.col(c) for c in order_cols])
    cols = [F.lag(F.col(state_col), n - 1 - i).over(w).alias(f"s{i}")
            for i in range(n - 1)]
    cols.append(F.col(state_col).alias(f"s{n - 1}"))
    lagged = df.select(*cols)
    for i in range(n - 1):
        lagged = lagged.filter(F.col(f"s{i}").isNotNull())
    return (lagged.groupBy(*[f"s{i}" for i in range(n)])
            .agg(F.count(F.lit(1)).alias("n_occurrences")))
