"""Estimate-quality analysis — the engine's version of the reference's
pandas script (reference: output/analysis.py:1-16), as one distributed
DataFrame job instead of a driver-side pandas pass:

- one-sided guarantee violations: rows with ``true > est`` (must be 0
  when truth is the inserted multiset — SURVEY.md §5.2);
- RMSE of (est - true);
- Spearman rank correlation: Pearson correlation of the two rank
  columns (average-rank ties), computed with window ranks + ``corr``.

Scale note: the global ``Window.orderBy`` rank stage funnels the whole
RESULT table through one task (Spark's documented behavior for an
unpartitioned window). That is acceptable here by design — the input
is a query-result table (thousands to millions of rows), not the raw
corpus; for corpus-sized rank correlation, replace the window rank
with a sort + ``zipWithIndex``-style distributed ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F


def estimate_metrics(df: DataFrame, true_col: str = "true_count",
                     est_col: str = "estimated_count") -> dict:
    """Returns {n, n_violations, rmse, spearman} for a result table of
    (…, true_col, est_col) rows — analysis.py's three checks."""

    def avg_rank(col: str):
        # average rank for ties == (rank + (count_in_tie - 1) / 2)
        w_rank = Window.orderBy(F.col(col))
        w_tie = Window.partitionBy(F.col(col))
        return (F.rank().over(w_rank)
                + (F.count("*").over(w_tie) - 1) / 2.0)

    ranked = df.select(
        F.col(true_col).cast("double").alias("t"),
        F.col(est_col).cast("double").alias("e"),
    ).withColumn("rt", avg_rank("t")).withColumn("re", avg_rank("e"))

    row = ranked.agg(
        F.count("*").alias("n"),
        F.sum(F.when(F.col("t") > F.col("e"), 1).otherwise(0))
         .alias("n_violations"),
        F.sqrt(F.avg((F.col("e") - F.col("t")) ** 2)).alias("rmse"),
        F.corr("rt", "re").alias("spearman"),
    ).collect()[0]
    return {"n": int(row["n"]),
            "n_violations": int(row["n_violations"]),
            "rmse": float(row["rmse"]),
            "spearman": float(row["spearman"])}
