"""Distributed connected components over a pair/edge DataFrame.

The dedup operators (sketchlib/dedup.py) emit near-duplicate PAIRS;
a training-data pipeline needs CLUSTERS — the transitive closure of
those pairs — so it can keep one canonical representative per group
and drop the rest. The reference has no graph operator (its dedup
surface stops at sketch membership); this is pipeline glue the same
way sampling and profiling are.

Algorithm: alternating large-star / small-star (Kiveris, Lattanzi,
Mirrokni, Rastogi, Vassilvitskii — "Connected Components in MapReduce
and Beyond", SoCC'14). Each phase is ONE shuffle (a groupBy on the
edge source); the edge set converges to a disjoint union of stars
centered at each component's minimum node id in O(log n) rounds —
unlike naive min-label propagation, whose round count is the graph
DIAMETER (a 10^6-long chain of pairwise-near docs would need 10^6
shuffles; large/small-star needs ~20). Each phase re-points edges
rather than multiplying them (small-star transiently emits at most
one extra center edge per node before dedup, so a round stays within
~2x the pair count), and re-pointing toward minima only shrinks the
set — at 100 TB the cost driver is the pair-generation stage
upstream, not this closure.

Iterative-plan hygiene: every round's edge DataFrame is persisted and
`localCheckpoint`-ed so the lineage (and the Catalyst plan Spark must
re-optimize per action) stays O(1) deep instead of O(rounds); on a
real cluster with executor loss concerns use
`spark.sparkContext.setCheckpointDir` + `.checkpoint()` instead —
the call site is the single `_truncate` helper.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["connected_components", "duplicate_clusters"]


def _truncate(df: DataFrame) -> DataFrame:
    """Cut lineage between iterations (see module docstring)."""
    return df.localCheckpoint(eager=True)


def _signature(e: DataFrame) -> tuple[int, int]:
    """Order-insensitive (count, hash-xor) fingerprint of an edge set —
    two longs per round instead of a full set-difference join. XOR
    (not SUM, which overflows longs under ANSI mode) is safe because
    each phase emits a DISTINCT edge set, so nothing self-cancels."""
    row = e.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.bit_xor(F.xxhash64("u", "v")), F.lit(0)).alias("h"),
    ).collect()[0]
    return int(row["n"]), int(row["h"])


def _large_star(e: DataFrame) -> DataFrame:
    """Connect every neighbor v > u to m = min(N(u) ∪ {u})."""
    b = (e.select("u", "v")
         .union(e.select(F.col("v").alias("u"), F.col("u").alias("v")))
         .where(F.col("u") != F.col("v"))
         .distinct())
    m = (b.groupBy("u").agg(F.min("v").alias("mn"))
         .select("u", F.least("mn", "u").alias("m")))
    return (b.join(m, "u")
            .where(F.col("v") > F.col("u"))
            .select(F.col("v").alias("u"), F.col("m").alias("v"))
            .where(F.col("u") != F.col("v"))
            .distinct())


def _small_star(e: DataFrame) -> DataFrame:
    """Orient edges toward smaller ids, then connect each node's
    smaller neighbors (and the node itself) to their minimum."""
    o = (e.select(F.greatest("u", "v").alias("u"),
                  F.least("u", "v").alias("v"))
         .where(F.col("u") != F.col("v"))
         .distinct())
    m = o.groupBy("u").agg(F.min("v").alias("m"))
    re_point = (o.join(m, "u")
                .select(F.col("v").alias("u"), F.col("m").alias("v")))
    center = m.select(F.col("u"), F.col("m").alias("v"))
    return (re_point.union(center)
            .where(F.col("u") != F.col("v"))
            .distinct())


def _local_union_find(pairs: list[tuple[int, int]]) -> dict[int, int]:
    """Driver-local union-find (path-halving + min-label roots)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in pairs:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    return {n: find(n) for n in parent}


def connected_components(edges: DataFrame,
                         src: str = "id_a", dst: str = "id_b",
                         nodes: DataFrame | None = None,
                         max_rounds: int = 50,
                         local_threshold: int = 100_000) -> DataFrame:
    """Resolve an undirected edge list into components.

    Returns ``(node, component)`` where ``component`` is the MINIMUM
    node id in the node's component — a deterministic, engine-portable
    labeling (a DuckDB recursive CTE produces the identical column).

    ``nodes`` (optional, one column named like ``src``) adds isolated
    nodes: anything not touched by an edge maps to itself. Node ids
    must be integral (orderable); ``src``/``dst`` name the edge
    endpoint columns.

    Adaptive regime split (the same broadcast-threshold-style split
    sketchlib/offline.py uses for tiny key spaces): an edge set at or
    under ``local_threshold`` is union-found on the driver in one pass
    (~16 bytes/edge of driver memory, microseconds at the default
    100k) instead of paying several Spark jobs per star round — after
    LSH-blocked dedup of a small corpus the pair graph is often tiny
    even when the corpus is not. Anything larger runs the distributed
    star algorithm; ``local_threshold=0`` forces it (the tests do).
    """
    e = _truncate(edges.select(F.col(src).cast("long").alias("u"),
                               F.col(dst).cast("long").alias("v"))
                  .where(F.col("u") != F.col("v"))
                  .distinct())

    # endpoints derive from the TRUNCATED edge set (the upstream pair
    # generation — often the expensive stage — runs exactly once) and
    # stay lazy: they feed a single join at the end
    endpoints = (e.select(F.col("u").alias("node"))
                 .union(e.select(F.col("v").alias("node")))
                 .distinct())
    if nodes is not None:
        endpoints = (nodes.select(F.col(nodes.columns[0]).cast("long")
                                  .alias("node"))
                     .union(endpoints).distinct())
    sig = _signature(e)
    if sig[0] <= local_threshold:
        comp = _local_union_find(
            [(r["u"], r["v"]) for r in e.collect()])
        star = [(n, c) for n, c in comp.items() if n != c]
        parent = e.sparkSession.createDataFrame(
            star or [(-1, -1)], "node long, component long")
        if not star:
            parent = parent.where(F.lit(False))
    else:
        for _ in range(max_rounds):
            e = _truncate(_small_star(_large_star(e)))
            new_sig = _signature(e)
            if new_sig == sig:
                break
            sig = new_sig
        else:
            raise RuntimeError(f"connected_components: no fixpoint in "
                               f"{max_rounds} rounds (n_edges={sig[0]})")

        # fixpoint edge set = disjoint stars (child -> component min)
        parent = e.select(F.col("u").alias("node"),
                          F.col("v").alias("component"))
    return (endpoints.join(parent, "node", "left")
            .select("node",
                    F.coalesce("component", "node").alias("component")))


def duplicate_clusters(pairs: DataFrame, docs: DataFrame | None = None,
                       id_col: str = "doc_id", **cc_kwargs) -> DataFrame:
    """Near-duplicate pairs -> per-document cluster assignment with a
    canonical representative: ``(doc_id, component, is_representative)``
    where the representative is the cluster's minimum id (the doc a
    pipeline KEEPS; the rest are dropped). ``docs`` (optional) adds
    pair-free documents as singleton clusters of themselves."""
    nodes = docs.select(id_col) if docs is not None else None
    comp = connected_components(pairs, nodes=nodes, **cc_kwargs)
    return comp.select(
        F.col("node").alias(id_col),
        "component",
        (F.col("node") == F.col("component")).alias("is_representative"))
