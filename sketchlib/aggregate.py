"""Generic distributed sketch aggregation harness.

This is the library's "physical plan" for mergeable sketches — the
partial/final aggregate model the reference library implies with its
elementwise merges (reference: include/ccm.h:401-407 sum for CM,
include/hll.h:957-991 max for HLL, include/bf.h:515-539 OR for Bloom),
expressed Spark-natively:

    tokens DF ──mapInPandas──▶ one serialized partial per partition
              ──treeReduce──▶ one merged blob on the driver

- the per-partition kernel consumes Arrow batches and updates a numpy
  sketch — no per-row Python;
- the merge is associative & commutative, so partition order never
  matters (CM arrays are bit-exact under any partitioning);
- ``treeReduce`` keeps driver fan-in bounded for wide clusters: at
  1000 executors a 56 MB CM sketch merges in O(log) waves instead of
  1000 blobs hitting the driver;
- grouped builds (one sketch per key) go through ``applyInPandas``
  with a hash-partitioned groupBy — Catalyst plans the exchange.

``pyspark.sql.Aggregator`` (typed UDAF) is JVM/Scala-only; this
harness is the Python-native equivalent and is the documented physical
strategy (SURVEY.md §4).
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from sketchlib.sketches.base import deserialize, merge_blobs


def _as_u64(series: pd.Series) -> np.ndarray:
    """Reinterpret an int64 Arrow column as uint64 (bit pattern kept)."""
    arr = series.to_numpy()
    if arr.dtype == np.int64:
        return arr.view(np.uint64)
    return arr.astype(np.uint64, copy=False)


def build_sketch(df: DataFrame, col: str, factory: Callable[[], object],
                 tree_depth: int = 2, as_u64: bool = True):
    """Build one merged sketch over ``df[col]``.

    ``factory`` must be a picklable zero-arg callable returning a fresh
    sketch (e.g. ``partial(CountMin, cfg)``). Returns the deserialized
    merged sketch on the driver.
    """

    def partial_build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sk = factory()
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vals = _as_u64(pdf[col]) if as_u64 else pdf[col].to_numpy()
            sk.update(vals)
        yield pd.DataFrame({"sketch": [sk.to_bytes()]})

    blobs = df.select(col).mapInPandas(partial_build, schema="sketch binary")
    rdd = blobs.rdd.map(lambda r: bytes(r.sketch))
    merged = rdd.treeReduce(merge_blobs, depth=tree_depth)
    return deserialize(merged)


def build_grouped_sketches(df: DataFrame, key_cols: list[str], col: str,
                           factory: Callable[[], object],
                           as_u64: bool = True) -> DataFrame:
    """One sketch per key group: ``(key..., sketch binary)`` DataFrame.

    Uses applyInPandas (hash exchange on the keys planned by Catalyst);
    suitable when the number of groups is large and results stay
    distributed (e.g. per-language token sketches).
    """

    def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
        sk = factory()
        vals = _as_u64(pdf[col]) if as_u64 else pdf[col].to_numpy()
        sk.update(vals)
        head = pdf.iloc[:1][key_cols].copy()
        head["sketch"] = [sk.to_bytes()]
        return head

    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema if f.name in key_cols)
    return (df.select(*key_cols, col)
              .groupBy(*key_cols)
              .applyInPandas(per_group, schema=f"{key_schema}, sketch binary"))
