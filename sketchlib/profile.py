"""One-scan table profiler: a per-column sketch panel over any table.

The operation every large-pipeline owner runs before anything else:
"what is in this table?" — per column, how many values, how many
distinct, what does the distribution look like. At 100 TB the naive
answer (one ``SELECT COUNT(DISTINCT c) ...`` job per column) re-reads
the corpus once PER COLUMN; this module pays the corpus scan once:

1. **melt**: one JVM-side projection turns the profiled columns into a
   tall ``(column, kh, num)`` stream via ``stack`` — ``kh`` is the
   per-column ``xxhash64`` (NULL for NULL values, so null semantics
   match SQL's ``COUNT(DISTINCT)``), ``num`` the value cast to double
   for numeric columns (NULL otherwise). Catalyst prunes the parquet
   scan to exactly the profiled columns (``ReadSchema``) and the melt
   is whole-stage-codegen — no Python touches row data here.
2. **exact panel**: one Tungsten hash aggregation over the melt gives
   per-column ``n_values`` / exact ``n_distinct`` (the profile's
   correctness gate; at true 100 TB scale you would drop this leg and
   keep only the sketches).
3. **sketch panel**: per-column HLL (distinct estimate) and — for
   numeric columns — KLL quantiles, built via the salted grouped
   aggregation harness; blobs stay distributed until the final
   #columns-row assembly.

The melt is cached so legs 2-3 share the single source scan; its size
is ``#profiled_columns x rows x ~24 B`` — column-pruned and far
smaller than re-scanning wide parquet per column. Reference parity:
this is the profiling workflow the reference's ``analysis.py`` +
truth-count files (output/analysis.py:1-16, input/*.22counts.txt)
perform by hand for one column, generalized to whole tables.
"""

from __future__ import annotations

from functools import partial
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import NumericType

from sketchlib.aggregate import build_grouped_sketches
from sketchlib.sketches.base import deserialize
from sketchlib.sketches.hll import HyperLogLog
from sketchlib.sketches.kll import KLL

__all__ = ["melt_for_profile", "profile_table"]


def melt_for_profile(df: DataFrame, columns: list[str]) -> DataFrame:
    """Tall ``(column string, kh long, num double)`` stream, one row
    per (row, profiled column); ``kh``/``num`` are NULL for NULL
    values so downstream counts match SQL null semantics."""
    types = {f.name: f.dataType for f in df.schema}
    parts = []
    for c in columns:
        is_num = isinstance(types[c], NumericType)
        num = f"CAST(`{c}` AS DOUBLE)" if is_num else "CAST(NULL AS DOUBLE)"
        parts.append(f"'{c}', IF(`{c}` IS NULL, CAST(NULL AS BIGINT), "
                     f"xxhash64(`{c}`)), {num}")
    stack = (f"stack({len(columns)}, {', '.join(parts)}) "
             "AS (column, kh, num)")
    return df.selectExpr(stack)


def _hll_est(sk: object) -> float:
    return float(sk.estimate())


def profile_table(spark: SparkSession, df: DataFrame,
                  columns: list[str] | None = None,
                  qs: tuple[float, ...] = (0.5,),
                  hll_p: int = 13, kll_k: int | None = None,
                  exact: bool = True,
                  salt_buckets: int | None = 8) -> DataFrame:
    """Profile ``columns`` (default: all atomic columns) of ``df``.

    Returns one row per column:
    ``(column, n_values, n_distinct, approx_distinct, within_bound,
    p<q>...)`` — ``n_distinct`` exact (omitted when ``exact=False``,
    the pure-sketch regime for corpus-scale tables), ``within_bound``
    the HLL error-bound gate, ``p<q>`` KLL quantiles for numeric
    columns (NULL otherwise; rank-exact whenever ``kll_k`` >= rows,
    which is how the driver query poses it for its strict oracle).
    """
    if columns is None:
        columns = [f.name for f in df.schema
                   if not f.dataType.typeName() in
                   ("array", "map", "struct", "binary")]
    melted = melt_for_profile(df, columns).cache()
    try:
        hll_bound = 6 * 1.03896 / ((1 << hll_p) ** 0.5)

        # leg 2: exact panel, one JVM aggregation
        if exact:
            ex = {r["column"]: r for r in
                  (melted.groupBy("column")
                   .agg(F.count("kh").alias("n_values"),
                        F.count_distinct("kh").alias("n_distinct"))
                   ).collect()}
        else:
            nv = {r["column"]: r["n"] for r in
                  melted.groupBy("column")
                  .agg(F.count("kh").alias("n")).collect()}

        # leg 3a: per-column HLL blobs (distributed build, #cols blobs)
        hlls = {r["column"]: deserialize(bytes(r["sketch"])) for r in
                build_grouped_sketches(
                    melted.filter(F.col("kh").isNotNull()), ["column"],
                    "kh", partial(HyperLogLog, hll_p),
                    salt_buckets=salt_buckets,
                    pre_distinct=True).collect()}

        # leg 3b: per-numeric-column KLL blobs
        num_melt = melted.filter(F.col("num").isNotNull())
        if kll_k is None:
            kll_k = 1 << 11
        klls = {r["column"]: deserialize(bytes(r["sketch"])) for r in
                build_grouped_sketches(num_melt, ["column"], "num",
                                       partial(KLL, kll_k), as_u64=False,
                                       salt_buckets=salt_buckets).collect()}

        rows = []
        for c in columns:
            if exact:
                n_values = int(ex[c]["n_values"]) if c in ex else 0
                n_distinct = int(ex[c]["n_distinct"]) if c in ex else 0
            else:
                n_values, n_distinct = int(nv.get(c, 0)), None
            est = _hll_est(hlls[c]) if c in hlls else 0.0
            ok = (None if not exact else
                  abs(est - n_distinct) <= hll_bound * max(n_distinct, 1))
            quants = tuple(
                float(klls[c].quantile(q)) if c in klls else None
                for q in qs)
            rows.append((c, n_values, n_distinct, float(est), ok) + quants)
    finally:
        melted.unpersist()

    qcols = ", ".join(f"p{str(q).replace('.', '_')} double" for q in qs)
    schema = ("column string, n_values long, n_distinct long, "
              f"approx_distinct double, within_bound boolean, {qcols}")
    return spark.createDataFrame(rows, schema)
