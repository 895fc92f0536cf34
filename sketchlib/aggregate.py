"""Generic distributed sketch aggregation harness.

This is the library's "physical plan" for mergeable sketches — the
partial/final aggregate model the reference library implies with its
elementwise merges (reference: include/ccm.h:401-407 sum for CM,
include/hll.h:957-991 max for HLL, include/bf.h:515-539 OR for Bloom),
expressed Spark-natively:

    tokens DF ──mapInPandas──▶ one serialized partial per partition
              ──repartition(w) + mapInPandas──▶ w tree-merged blobs
              ──Arrow collect──▶ driver folds w blobs

Design notes (these were measured, not guessed):
- everything stays on the DataFrame/Arrow path; an earlier
  ``df.rdd``+``treeReduce`` variant spent minutes pickling 60 MB blobs
  through the Py4J row path — the Arrow collect is ~10x faster;
- partial blobs serialize counters at the narrowest lossless integer
  width (see cm._pack_u64), cutting merge traffic 2-8x;
- the tree stage bounds driver fan-in for wide clusters: at 1000
  executors the driver folds ``tree_width`` blobs, not 1000;
- the per-partition kernel consumes Arrow batches and updates a numpy
  sketch — no per-row Python;
- merges are associative & commutative, so partition order never
  matters (CM arrays are bit-exact under any partitioning).

``pyspark.sql.Aggregator`` (typed UDAF) is JVM/Scala-only; this harness
is the Python-native equivalent and is the documented physical strategy
(SURVEY.md §4).
"""

from __future__ import annotations

from typing import Callable, Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame

from sketchlib.sketches.base import deserialize


def _as_u64(series: pd.Series) -> np.ndarray:
    """Reinterpret an int64 Arrow column as uint64 (bit pattern kept)."""
    arr = series.to_numpy()
    if arr.dtype == np.int64:
        return arr.view(np.uint64)
    return arr.astype(np.uint64, copy=False)


def _fold_blob_rows(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    acc = None
    for pdf in batches:
        for b in pdf["sketch"]:
            sk = deserialize(bytes(b))
            acc = sk if acc is None else acc.merge(sk)
    if acc is not None:
        yield pd.DataFrame({"sketch": [acc.to_bytes()]})


def build_sketch(df: DataFrame, col: str, factory: Callable[[], object],
                 tree_width: int = 8, as_u64: bool = True,
                 pre_aggregate: bool = False,
                 kernel_partitions: int | None = None,
                 weight_col: str | None = None):
    """Build one merged sketch over ``df[col]``.

    ``factory`` must be a picklable zero-arg callable returning a fresh
    sketch (e.g. ``partial(CountMin, cfg)``). Returns the deserialized
    merged sketch on the driver.

    ``pre_aggregate=True`` is the scale path for frequency sketches:
    a JVM-side ``groupBy(col).count()`` (Tungsten hash agg with
    map-side combine) collapses the stream to |distinct| weighted rows
    before any Python runs, and the kernel consumes
    ``update_weighted(values, counts)``. The counting work happens in
    whole-stage codegen; Python only sketches distinct keys. Requires
    the sketch to implement ``update_weighted`` (CountMin /
    OfflineCountMin do; HLL/Bloom don't need it — duplicates are
    idempotent for them, so plain dedup would do instead).

    ``weight_col`` (pre_aggregate only) makes the build WEIGHTED:
    per-key weight = ``SUM(weight_col)`` instead of ``COUNT(*)`` —
    still one Tungsten hash agg, still |distinct| Python rows. This is
    the hook for time-decayed frequency (sketchlib/decay.py) and any
    other per-row-weighted statistic; weights must be integral (CM
    counters are int64).
    """
    from pyspark.sql import functions as F

    if weight_col is not None and not pre_aggregate:
        raise ValueError("weight_col requires pre_aggregate=True")
    if pre_aggregate:
        # kernel parallelism follows the cluster, not the merge fan-in:
        # at 10^9 distinct keys the weighted-update kernel is the
        # heavy stage and must use every core; the blob fold below
        # then reduces the partial count to ``tree_width`` before the
        # driver sees anything (bounded driver fan-in at any scale)
        if weight_col is None:
            grouped = (df.select(col).groupBy(col)
                       .agg(F.count("*").alias("__cnt")))
        else:
            # NULL-weight rows contribute nothing (and a key whose
            # rows are all NULL-weight drops out) — without the
            # filter, SUM over an all-NULL key yields a NULL __cnt
            # that reaches the numpy kernel as NaN and corrupts it
            grouped = (df.select(col, weight_col)
                       .filter(F.col(weight_col).isNotNull())
                       .groupBy(col)
                       .agg(F.sum(weight_col).cast("long")
                            .alias("__cnt")))
        if kernel_partitions is not None:
            grouped = grouped.repartition(kernel_partitions)

        def partial_build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            # one kernel call per partition (not per Arrow batch) so
            # order-sensitive kernels (conservative CM) are a pure
            # function of the partition's multiset — reproducible
            # regardless of Arrow batch sizing
            vs, ws = [], []
            for pdf in batches:
                if len(pdf) == 0:
                    continue
                vs.append(_as_u64(pdf[col]) if as_u64
                          else pdf[col].to_numpy())
                ws.append(pdf["__cnt"].to_numpy())
            if vs:
                sk = factory()
                sk.update_weighted(np.concatenate(vs), np.concatenate(ws))
                yield pd.DataFrame({"sketch": [sk.to_bytes()]})

        blobs = grouped.mapInPandas(partial_build, schema="sketch binary")
        if kernel_partitions is None or kernel_partitions > tree_width:
            blobs = (blobs.repartition(tree_width)
                     .mapInPandas(_fold_blob_rows, schema="sketch binary"))
        folded = blobs.toPandas()
        acc = None
        for b in folded["sketch"]:
            sk = deserialize(bytes(b))
            acc = sk if acc is None else acc.merge(sk)
        return acc if acc is not None else factory()

    def partial_build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        sk = factory()
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vals = _as_u64(pdf[col]) if as_u64 else pdf[col].to_numpy()
            sk.update(vals)
        yield pd.DataFrame({"sketch": [sk.to_bytes()]})

    src = df.select(col)
    if kernel_partitions is not None:
        src = src.repartition(kernel_partitions)
    blobs = src.mapInPandas(partial_build, schema="sketch binary")
    if kernel_partitions is None or kernel_partitions > tree_width:
        blobs = (blobs.repartition(tree_width)
                 .mapInPandas(_fold_blob_rows, schema="sketch binary"))
    folded = blobs.toPandas()
    acc = None
    for b in folded["sketch"]:
        sk = deserialize(bytes(b))
        acc = sk if acc is None else acc.merge(sk)
    if acc is None:
        acc = factory()
    return acc


def build_grouped_sketches(df: DataFrame, key_cols: list[str], col: str,
                           factory: Callable[[], object],
                           as_u64: bool = True,
                           salt_buckets: int | None = None,
                           pre_aggregate: bool = False,
                           pre_distinct: bool = False,
                           weight_col: str | None = None) -> DataFrame:
    """One sketch per key group: ``(key..., sketch binary)`` DataFrame.

    Uses applyInPandas (hash exchange on the keys planned by Catalyst);
    suitable when the number of groups is large and results stay
    distributed (e.g. per-language token sketches).

    ``salt_buckets`` is the hot-key defense: with it, aggregation runs
    in two stages — partial sketches per ``(key, salt)`` where salt =
    ``pmod(xxhash64(col), salt_buckets)`` splits a hot key's rows
    across up to ``salt_buckets`` tasks, then a second (tiny: one blob
    per key-salt) exchange merges blobs per key. Merges are
    associative & commutative, so the result is identical to the
    unsalted plan for order-independent sketches (bit-exact for plain
    CM / HLL / Bloom / count-sketch). AQE's skew handling cannot split
    a single group of a custom aggregation — the salt must be in the
    grouping key, which is exactly what this does.

    ``pre_aggregate`` / ``pre_distinct`` are the grouped analogs of
    :func:`build_sketch`'s scale path — see
    :func:`build_grouped_sketches_multi`.

    Implemented as the single-factory case of
    :func:`build_grouped_sketches_multi` so the salting and merge
    machinery exist in exactly one place.
    """
    return build_grouped_sketches_multi(
        df, key_cols, col, {"sketch": factory},
        as_u64=as_u64, salt_buckets=salt_buckets,
        pre_aggregate=pre_aggregate,
        pre_distinct=pre_distinct,
        weight_col=weight_col).drop("name")


def finalize_grouped(grouped: DataFrame, finalize: Callable[[object], object],
                     out_col: str, out_type: str = "double") -> DataFrame:
    """Finalize grouped sketch blobs *distributed*: replace the
    ``sketch`` column with ``finalize(sketch)`` via mapInPandas, so at
    10^5+ groups the estimates never funnel through the driver (the
    driver-side collect-and-rebuild anti-pattern). ``finalize`` must be
    picklable (module-level function or partial)."""
    key_fields = [f for f in grouped.schema if f.name != "sketch"]
    key_names = [f.name for f in key_fields]
    schema = (", ".join(f"{f.name} {f.dataType.simpleString()}"
                        for f in key_fields)
              + f", {out_col} {out_type}")

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            out = pdf[key_names].copy()
            out[out_col] = [finalize(deserialize(bytes(b)))
                            for b in pdf["sketch"]]
            yield out

    return grouped.mapInPandas(per_batch, schema=schema)


def pairwise_grouped(grouped: DataFrame,
                     compare: Callable[[object, object], tuple],
                     out_schema: str,
                     key_col: str | None = None,
                     block_cols: list[str] | tuple = (),
                     pair_filter=None,
                     num_partitions: int | None = None,
                     deser: Callable[[bytes], object] = deserialize,
                     max_pairs: int = 2_000_000,
                     n_groups_hint: int | None = None) -> DataFrame:
    """Distributed pairwise comparison over a grouped sketch-blob table
    ``(key..., sketch binary)``: one output row per unordered pair
    ``key_a < key_b`` (within each ``block_cols`` stratum), columns
    ``(block..., key_a, key_b, *out_schema)`` where the values come
    from ``compare(sketch_a, sketch_b)`` (must return a tuple matching
    ``out_schema``; must be picklable — module-level fn or partial).

    This replaces the driver-side ``{k: deser(b) for ...
    grouped.collect()}`` + nested-loop anti-pattern: at 10^4-10^5
    groups the blobs would funnel through (and be compared on) the
    driver. Scale shape here instead:

    - the PAIR SET is enumerated over a keys-only projection (the
      skinny side is broadcast; blobs are never broadcast), then
      optionally narrowed by ``pair_filter`` (a Column over
      ``key_a``/``key_b``/block cols) *before* any sketch bytes move;
    - blobs are attached by two shuffled equi-joins (each blob is
      replicated once per pair it participates in — inherent to
      pairwise output, not a plan defect);
    - ``compare`` runs inside ``mapInPandas`` on executors; the driver
      sees only the final comparison rows.

    Pairwise output is inherently O(|groups|^2) per stratum — at large
    group counts callers must bound it with ``block_cols`` (compare
    only within a stratum, e.g. LSH bucket / estimator name) and/or
    ``pair_filter``; that is a semantic choice the helper can't make.
    ``max_pairs`` enforces it (round-4 scale guard): when the
    unfiltered per-stratum pair count exceeds it, the call FAILS with
    guidance unless a ``pair_filter`` brings the actual pair count
    back under the cap (verified by a keys-only count — no blob ever
    moves first). An accidental all-pairs enumeration at 10^5 groups
    (~5*10^9 pairs) is therefore an immediate error, not a hung job.
    ``n_groups_hint`` lets a caller that KNOWS its group count (e.g.
    the per-language queries: 4 langs) skip the guard's count job when
    ``hint*(hint-1)/2 <= max_pairs`` — the count job is trivial at
    scale but is a fixed extra Spark job a 1-second query shouldn't
    pay. The hint is an upper bound on total group rows; an honest
    hint is the caller's contract (a wrong huge-understating hint
    reintroduces the unbounded enumeration the guard exists to stop).
    """
    from pyspark.sql import functions as F

    cols = grouped.columns
    if "sketch" not in cols:
        raise ValueError("grouped must have a 'sketch' binary column")
    # grouped feeds three legs below (keys projection + two blob
    # attaches); without a persist Catalyst re-runs the expensive
    # applyInPandas grouped build up to 3x (round-3 ADVICE).  Bounded
    # registry, so repeated calls don't accumulate cache forever.
    from sketchlib.cache import scoped_persist
    grouped = scoped_persist(grouped)
    block_cols = list(block_cols)
    if key_col is None:
        rest = [c for c in cols
                if c != "sketch" and c not in block_cols]
        if len(rest) != 1:
            raise ValueError(f"ambiguous key column among {rest}; "
                             "pass key_col=")
        key_col = rest[0]
    types = {f.name: f.dataType.simpleString() for f in grouped.schema}

    keys = grouped.select(*block_cols, F.col(key_col).alias("__k"))
    ka = keys.select(*block_cols, F.col("__k").alias("key_a"))
    kb = keys.select(*[F.col(c).alias(f"__b_{c}") for c in block_cols],
                     F.col("__k").alias("key_b"))
    cond = F.col("key_a") < F.col("key_b")
    for c in block_cols:
        cond = cond & (F.col(c) == F.col(f"__b_{c}"))
    kp = (F.broadcast(ka).join(kb, cond)
          .drop(*[f"__b_{c}" for c in block_cols]))
    if pair_filter is not None:
        kp = kp.filter(pair_filter)

    # scale guard: bound the materialized pair set BEFORE any blob
    # moves. Per-stratum group counts are one cheap agg over the
    # keys-only projection; the exact filtered count is only computed
    # when the unfiltered bound already exceeds the cap.
    if (max_pairs is not None and n_groups_hint is not None
            and n_groups_hint * (n_groups_hint - 1) // 2 <= max_pairs):
        max_pairs = None  # hinted small: no count job needed
    if max_pairs is not None:
        strata = (keys.groupBy(*block_cols).agg(F.count("*").alias("n"))
                  if block_cols else
                  keys.agg(F.count("*").alias("n")))
        worst = int(strata.agg(F.sum(
            F.col("n") * (F.col("n") - 1) / 2).alias("p")).collect()[0]["p"]
            or 0)
        if worst > max_pairs:
            if pair_filter is None:
                raise ValueError(
                    f"pairwise_grouped would enumerate ~{worst:,} pairs "
                    f"(> max_pairs={max_pairs:,}); bound the pair set "
                    "with block_cols (compare within strata) and/or "
                    "pair_filter, or raise max_pairs explicitly if you "
                    "really want an all-pairs run")
            actual = kp.count()
            if actual > max_pairs:
                raise ValueError(
                    f"pairwise_grouped pair_filter still keeps "
                    f"{actual:,} pairs (> max_pairs={max_pairs:,}); "
                    "tighten the filter/blocking or raise max_pairs")

    blob_a = grouped.select(*block_cols, F.col(key_col).alias("key_a"),
                            F.col("sketch").alias("__sk_a"))
    blob_b = grouped.select(*block_cols, F.col(key_col).alias("key_b"),
                            F.col("sketch").alias("__sk_b"))
    pairs = (kp.join(blob_a, ["key_a", *block_cols])
             .join(blob_b, ["key_b", *block_cols]))
    if num_partitions:
        pairs = pairs.repartition(num_partitions, "key_a", "key_b")

    out_names = [p.strip().split()[0]
                 for p in out_schema.split(",") if p.strip()]
    schema = (", ".join([f"{c} {types[c]}" for c in block_cols]
                        + [f"key_a {types[key_col]}",
                           f"key_b {types[key_col]}"])
              + ", " + out_schema)
    carry = [*block_cols, "key_a", "key_b"]

    def per_batch(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vals = [compare(deser(bytes(a)), deser(bytes(b)))
                    for a, b in zip(pdf["__sk_a"], pdf["__sk_b"])]
            out = pdf[carry].copy()
            for i, name in enumerate(out_names):
                out[name] = [v[i] for v in vals]
            yield out

    return pairs.mapInPandas(per_batch, schema=schema)


def build_grouped_sketches_multi(df: DataFrame, key_cols: list[str],
                                 col: str,
                                 factories: dict[str, Callable[[], object]],
                                 as_u64: bool = True,
                                 salt_buckets: int | None = None,
                                 pre_aggregate: bool = False,
                                 pre_distinct: bool = False,
                                 weight_col: str | None = None
                                 ) -> DataFrame:
    """SEVERAL named sketches per key group in ONE scan:
    ``(key..., name string, sketch binary)`` DataFrame.

    The grouped analog of :func:`build_sketches_multi` — a panel of
    estimators over the same per-group key stream (e.g. HyperMinHash +
    b-bit MinHash per language) pays the shuffle once instead of once
    per estimator. Same hot-key salting as
    :func:`build_grouped_sketches`; merges are associative &
    commutative, so per-name results are identical to independent
    build_grouped_sketches calls for order-independent sketches
    (tested).

    Scale paths (mirroring :func:`build_sketch`): ``pre_aggregate=True``
    collapses the stream JVM-side to ``groupBy(key..., col).count()``
    (Tungsten hash agg, map-side combine) and feeds the kernels
    ``update_weighted(values, counts)`` — Python input is bounded by
    |distinct (key, value)|, not |rows|; every factory must implement
    ``update_weighted``. ``pre_distinct=True`` instead dedups
    ``(key..., col)`` JVM-side and keeps the plain ``update`` kernel —
    for duplicate-INsensitive sketches (HLL / MinHash / SetSketch /
    PCSA / Bloom), where a repeated value is a no-op by definition.
    Both are bit-exact vs the unreduced stream for order-independent
    sketches; pre-collapse happens BEFORE salting, so weighted rows
    are never split across salt buckets.

    ``weight_col`` (pre_aggregate only, mirroring :func:`build_sketch`)
    makes the grouped build WEIGHTED: per-(key, value) weight =
    ``SUM(weight_col)`` instead of ``COUNT(*)`` — the hook for grouped
    time-decayed statistics; weights must be integral."""
    from pyspark.sql import functions as F

    if pre_aggregate and pre_distinct:
        raise ValueError("pre_aggregate and pre_distinct are exclusive")
    if weight_col is not None and not pre_aggregate:
        raise ValueError("weight_col requires pre_aggregate=True")

    names = sorted(factories)
    key_schema = ", ".join(
        f"{f.name} {f.dataType.simpleString()}"
        for f in df.schema if f.name in key_cols)
    out_schema = f"{key_schema}, name string, sketch binary"

    if pre_aggregate:
        if weight_col is None:
            df = (df.select(*key_cols, col).groupBy(*key_cols, col)
                  .agg(F.count("*").alias("__cnt")))
        else:
            # NULL-weight rows contribute nothing (see build_sketch:
            # an all-NULL key would otherwise reach the kernel as NaN)
            df = (df.select(*key_cols, col, weight_col)
                  .filter(F.col(weight_col).isNotNull())
                  .groupBy(*key_cols, col)
                  .agg(F.sum(weight_col).cast("long").alias("__cnt")))
    elif pre_distinct:
        df = df.select(*key_cols, col).distinct()
    else:
        df = df.select(*key_cols, col)

    def _per_group(group_cols: list[str]):
        def per_group(pdf: pd.DataFrame) -> pd.DataFrame:
            vals = _as_u64(pdf[col]) if as_u64 else pdf[col].to_numpy()
            wts = pdf["__cnt"].to_numpy() if pre_aggregate else None
            head = pdf.iloc[:1][group_cols]
            out = (head.loc[head.index.repeat(len(names))]
                   .reset_index(drop=True))
            blobs = []
            for name in names:
                sk = factories[name]()
                if pre_aggregate:
                    sk.update_weighted(vals, wts)
                else:
                    sk.update(vals)
                blobs.append(sk.to_bytes())
            out["name"] = names
            out["sketch"] = blobs
            return out
        return per_group

    if not salt_buckets:
        return (df.groupBy(*key_cols)
                  .applyInPandas(_per_group(key_cols), schema=out_schema))

    def merge_group(pdf: pd.DataFrame) -> pd.DataFrame:
        acc = None
        for b in pdf["sketch"]:
            sk = deserialize(bytes(b))
            acc = sk if acc is None else acc.merge(sk)
        head = pdf.iloc[:1][key_cols + ["name"]].copy()
        head["sketch"] = [acc.to_bytes()]
        return head

    salted = df.withColumn("__salt",
                           F.pmod(F.xxhash64(col), F.lit(salt_buckets)))
    partials = (salted.groupBy(*key_cols, "__salt")
                .applyInPandas(_per_group(key_cols + ["__salt"]),
                               schema=f"{key_schema}, __salt bigint, "
                                      "name string, sketch binary")
                .drop("__salt"))
    return (partials.groupBy(*key_cols, "name")
            .applyInPandas(merge_group, schema=out_schema))


def _merge_blob_group(pdf: pd.DataFrame) -> pd.DataFrame:
    """applyInPandas kernel: fold one group's blobs into one."""
    acc = None
    for b in pdf["sketch"]:
        sk = deserialize(bytes(b))
        acc = sk if acc is None else acc.merge(sk)
    head = pdf.iloc[:1].drop(columns=["sketch"]).copy()
    head["sketch"] = [acc.to_bytes()]
    return head


def _merge_to_level(grouped: DataFrame, keys: list[str],
                    key_fields: dict[str, str],
                    tree_width: int) -> DataFrame:
    """Merge a grouped sketch table down to granularity ``keys``
    (empty = grand total via a tree_width-way parallel fold; the
    repartition(1) barrier — NOT coalesce — keeps the fold stage its
    own parallel stage and ships only tree_width folded blobs to the
    final task)."""
    if keys:
        schema = ", ".join(f"{k} {key_fields[k]}" for k in keys) \
            + ", sketch binary"
        return (grouped.select(*keys, "sketch").groupBy(*keys)
                .applyInPandas(_merge_blob_group, schema=schema))
    return (grouped.select("sketch").repartition(tree_width)
            .mapInPandas(_fold_blob_rows, schema="sketch binary")
            .repartition(1)
            .mapInPandas(_fold_blob_rows, schema="sketch binary"))


def rollup_grouped_sketches(grouped: DataFrame,
                            key_cols: list[str],
                            tree_width: int = 8) -> DataFrame:
    """SQL ``ROLLUP`` over an already-built grouped sketch table —
    the hypertable-rollup pattern: level *i* is produced by MERGING
    level *i+1*'s blobs (never by rescanning the base data), so a
    full (k1..kn), (k1..kn-1), …, () hierarchy costs ONE base scan
    plus n tiny blob-count shuffles. Requires an order-independent
    merge (HLL max / Bloom OR / CM sum / MinHash trim — every
    registered sketch except the strict sequential kernels), for which
    each level is bit-identical to a direct build at that granularity.

    Input: ``(k1..kn, sketch binary)`` at the finest granularity
    (:func:`build_grouped_sketches` output). Output: the union of all
    n+1 levels with rolled-up key columns NULL, exactly the row set
    ``GROUP BY ROLLUP (k1..kn)`` produces — finalize with
    :func:`finalize_grouped` and compare against a GROUPING-SETS
    oracle. The grand-total level folds through ``tree_width``
    partitions before the final single-task merge, so driver-free
    fan-in stays bounded at any group count."""
    from pyspark.sql import functions as F

    key_fields = {f.name: f.dataType.simpleString()
                  for f in grouped.schema if f.name != "sketch"}
    assert list(key_fields) == key_cols, (list(key_fields), key_cols)

    levels = [_pad_keys(grouped, key_cols, key_cols, key_fields)]
    cur = grouped
    for i in range(len(key_cols) - 1, -1, -1):
        keys = key_cols[:i]
        cur = _merge_to_level(cur, keys, key_fields, tree_width)
        levels.append(_pad_keys(cur, keys, key_cols, key_fields))
    out = levels[0]
    for lv in levels[1:]:
        out = out.unionByName(lv)
    return out


def _pad_keys(df: DataFrame, present: list[str], key_cols: list[str],
              key_fields: dict[str, str]) -> DataFrame:
    """NULL-pad rolled-up key columns to the full key schema."""
    from pyspark.sql import functions as F

    cols = [F.col(k) if k in present
            else F.lit(None).cast(key_fields[k]).alias(k)
            for k in key_cols]
    return df.select(*cols, "sketch")


def cube_grouped_sketches(grouped: DataFrame,
                          key_cols: list[str],
                          tree_width: int = 8) -> DataFrame:
    """``GROUP BY CUBE`` analog of :func:`rollup_grouped_sketches`:
    one row set per SUBSET of ``key_cols`` (2^n grouping sets), every
    coarser set merged from the finest level's blobs — still ONE base
    scan; each subset costs one shuffle over |group| blobs, not a
    rescan. Same order-independence requirement and bit-exactness
    guarantee as rollup."""
    from itertools import combinations

    key_fields = {f.name: f.dataType.simpleString()
                  for f in grouped.schema if f.name != "sketch"}
    assert list(key_fields) == key_cols, (list(key_fields), key_cols)

    out = _pad_keys(grouped, key_cols, key_cols, key_fields)
    for r in range(len(key_cols) - 1, -1, -1):
        for keys in combinations(key_cols, r):
            lvl = _merge_to_level(grouped, list(keys), key_fields,
                                  tree_width)
            out = out.unionByName(
                _pad_keys(lvl, list(keys), key_cols, key_fields))
    return out


def build_sketches_multi(df: DataFrame, col: str,
                         factories: dict[str, Callable[[], object]],
                         tree_width: int = 8, as_u64: bool = True,
                         pre_aggregate: bool = False) -> dict[str, object]:
    """Build SEVERAL named sketches over ``df[col]`` in ONE scan.

    The 100 TB motivation: the scan is the expensive stage (BENCH/
    BASELINE.md measures ~88% of build wall in scan/agg), and a user
    who wants HLL + CM + Bloom + quantiles over the same key stream
    should pay it once, not once per sketch. Each partition updates
    every factory's partial from the same Arrow batches; partials
    shuffle keyed by sketch name, so the fold stage is one task per
    sketch and the driver folds ``tree_width`` blobs per name — the
    same bounded fan-in as build_sketch, multiplied only by the number
    of sketches.

    ``pre_aggregate=True`` additionally collapses the stream to
    (key, count) JVM-side first and requires every factory's sketch to
    implement ``update_weighted`` (duplicate-sensitive counting
    sketches); with ``False`` plain ``update`` is used (safe for any
    sketch, required for multiplicity-insensitive ones only when fed
    raw streams).

    Returns {name: merged sketch}; for order-independent kernels
    (every registered sketch except the strict conservative/offline
    paths) results are bit-identical to independent build_sketch calls
    per factory (tested).
    """
    from pyspark.sql import functions as F

    names = sorted(factories)
    if pre_aggregate:
        src = (df.select(col).groupBy(col)
               .agg(F.count("*").alias("__cnt")))
    else:
        src = df.select(col)

    def partial_build(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        vs, ws = [], []
        for pdf in batches:
            if len(pdf) == 0:
                continue
            vs.append(_as_u64(pdf[col]) if as_u64 else pdf[col].to_numpy())
            if pre_aggregate:
                ws.append(pdf["__cnt"].to_numpy())
        if not vs:
            return
        vals = np.concatenate(vs)
        wts = np.concatenate(ws) if pre_aggregate else None
        out_names, out_blobs = [], []
        for name in names:
            sk = factories[name]()
            if pre_aggregate:
                sk.update_weighted(vals, wts)
            else:
                sk.update(vals)
            out_names.append(name)
            out_blobs.append(sk.to_bytes())
        yield pd.DataFrame({"name": out_names, "sketch": out_blobs})

    def fold_named(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        accs: dict[str, object] = {}
        for pdf in batches:
            for name, b in zip(pdf["name"], pdf["sketch"]):
                sk = deserialize(bytes(b))
                accs[name] = sk if name not in accs \
                    else accs[name].merge(sk)
        if accs:
            yield pd.DataFrame({
                "name": list(accs),
                "sketch": [s.to_bytes() for s in accs.values()]})

    blobs = src.mapInPandas(partial_build, schema="name string, sketch binary")
    folded = (blobs.repartition(tree_width * len(names), "name")
              .mapInPandas(fold_named, schema="name string, sketch binary")
              .toPandas())
    out: dict[str, object] = {}
    for name, b in zip(folded["name"], folded["sketch"]):
        sk = deserialize(bytes(b))
        out[name] = sk if name not in out else out[name].merge(sk)
    missing = set(names) - set(out)
    for name in missing:  # empty input
        out[name] = factories[name]()
    return out
