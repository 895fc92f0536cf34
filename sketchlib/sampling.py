"""Deterministic sampling operators for training-data pipelines.

Picking a training mix out of a 100 TB corpus needs samples that are
(a) *weighted* (quality score, domain weight), (b) *reproducible*
(same seed => same sample on any cluster, any partitioning), and
(c) *cheap* (no shuffle of the full corpus for a k-row answer). The
reference side-steps this (its inputs fit one machine); at corpus
scale it is a first-class operator.

Algorithm: Efraimidis–Spirakis A-Res ("Weighted random sampling with
a reservoir", IPL 97(5), 2006) — draw u_i ~ U(0,1) per row, give the
row key u_i^(1/w_i), keep the k largest keys: the result is exactly a
weight-proportional sample WITHOUT replacement. Two engineering
choices make it deterministic and engine-portable:

- u_i is *hash-derived*, not random: the first 13 hex chars of
  ``md5(seed, id...)`` form a 52-bit integer v (exact in IEEE754
  double), and ``u = (v + 0.5) / 2^52``, strictly inside (0,1). Both
  Spark and DuckDB compute the identical md5 and the identical exact
  double, so the *oracle can recompute the same sample* — the driver
  query is gated on strict equality even in the true sampling regime
  (k << n), not just an exact-regime pose.
- ranking uses ``ln(u)/w`` (monotone in u^(1/w)) with the row id as
  a total-order tiebreaker; for uniform sampling (no weight) the rank
  key is ``u`` itself — no transcendental at all.

Scale shape: ``weighted_sample`` is ``ORDER BY key LIMIT k``, which
Catalyst plans as TakeOrderedAndProject — each task keeps a local
top-k heap and only k rows per task ever move (plan-asserted in
tests/test_sampling.py); no full-corpus shuffle, no Python.
``stratified_sample`` ranks inside each stratum with one hash
exchange on the strata columns; the priority column is computed in
whole-stage codegen either way.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["with_sample_priority", "weighted_sample", "stratified_sample"]

_SEP = "\x1f"  # unit separator; DuckDB spells it chr(31)
_TWO52 = float(1 << 52)


def with_sample_priority(df: DataFrame, id_cols: list[str],
                         weight_col: str | None = None,
                         seed: int = 0,
                         out_col: str = "priority") -> DataFrame:
    """Add the deterministic E-S rank key (descending = sampled first).

    Weighted: ``ln(u)/w`` (w must be > 0; equals u^(1/w) in rank
    order). Uniform: ``u``. u is md5-derived from (seed, id_cols) so
    the key — and therefore the sample — is a pure function of row
    identity, reproducible across engines, partitionings, and runs.
    """
    h = F.md5(F.concat_ws(
        _SEP, F.lit(str(seed)),
        *[F.col(c).cast("string") for c in id_cols]))
    v = F.conv(F.substring(h, 1, 13), 16, 10).cast("double")
    u = (v + F.lit(0.5)) / F.lit(_TWO52)
    key = u if weight_col is None else F.log(u) / F.col(weight_col)
    return df.withColumn(out_col, key)


def weighted_sample(df: DataFrame, k: int, id_cols: list[str],
                    weight_col: str | None = None,
                    seed: int = 0) -> DataFrame:
    """k-row weight-proportional sample without replacement
    (uniform when ``weight_col`` is None). Plans as
    TakeOrderedAndProject: per-task top-k, only k rows per task cross
    the wire — the right shape at any corpus size."""
    p = with_sample_priority(df, id_cols, weight_col, seed)
    return (p.orderBy(F.desc("priority"),
                      *[F.asc(c) for c in id_cols])
            .limit(k).drop("priority"))


def stratified_sample(df: DataFrame, strata_cols: list[str], k: int,
                      id_cols: list[str],
                      weight_col: str | None = None,
                      seed: int = 0) -> DataFrame:
    """Per-stratum k-row E-S sample: every stratum contributes its
    own top-k by the same deterministic key (window rank inside one
    hash exchange on the strata). Hot strata are bounded by the same
    argument as any keyed window; for pathological single-stratum
    skew, sample the stratum alone with :func:`weighted_sample`."""
    p = with_sample_priority(df, id_cols, weight_col, seed)
    w = (Window.partitionBy(*strata_cols)
         .orderBy(F.desc("priority"), *[F.asc(c) for c in id_cols]))
    return (p.withColumn("__rn", F.row_number().over(w))
            .filter(F.col("__rn") <= k)
            .drop("__rn", "priority"))
