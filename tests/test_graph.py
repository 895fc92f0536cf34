"""Connected components (sketchlib/graph.py) vs an in-process
union-find ground truth, including the shapes that break naive
label propagation (long chains) and the dedup-cluster wrapper."""

from __future__ import annotations

import random

from pyspark.sql import functions as F

from sketchlib.graph import connected_components, duplicate_clusters


def _union_find(nodes, edges):
    parent = {n: n for n in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        ru, rv = find(u), find(v)
        if ru != rv:
            parent[max(ru, rv)] = min(ru, rv)
    # component label = min node id in the component
    comp = {}
    for n in nodes:
        comp.setdefault(find(n), []).append(n)
    return {n: min(members) for members in comp.values() for n in members}


def _cc_spark(spark, nodes, edges, local_threshold=0):
    # local_threshold=0 forces the distributed star algorithm; the
    # driver-local fast path is exercised separately
    e = spark.createDataFrame(
        [(u, v) for u, v in edges] or [(None, None)],
        "id_a long, id_b long").where(F.col("id_a").isNotNull())
    nd = spark.createDataFrame([(n,) for n in nodes], "node long")
    out = connected_components(e, nodes=nd, local_threshold=local_threshold)
    return {r["node"]: r["component"] for r in out.collect()}


def test_basic_components(spark):
    nodes = [1, 2, 3, 10, 11, 99]
    edges = [(1, 2), (2, 3), (10, 11)]
    expect = {1: 1, 2: 1, 3: 1, 10: 10, 11: 10, 99: 99}
    assert _cc_spark(spark, nodes, edges) == expect
    # driver-local fast path: identical output
    assert _cc_spark(spark, nodes, edges, local_threshold=10) == expect
    # edge-free graph: everything a singleton, both regimes
    singletons = {n: n for n in nodes}
    assert _cc_spark(spark, nodes, []) == singletons
    assert _cc_spark(spark, nodes, [], local_threshold=10) == singletons


def test_long_chain_converges_logarithmically(spark, monkeypatch):
    # a 128-node path has diameter 127: naive min-label propagation
    # needs 127 rounds, large/small-star needs O(log n). Pin the
    # round count (measured: 8 = log2(128) + 1 confirmation round)
    # so a regression back to diameter-bound behavior fails loudly.
    import sketchlib.graph as G
    rounds = [0]
    orig = G._small_star

    def counting(e):
        rounds[0] += 1
        return orig(e)

    monkeypatch.setattr(G, "_small_star", counting)
    n = 128
    got = _cc_spark(spark, list(range(n)),
                    [(i, i + 1) for i in range(n - 1)])
    assert got == {i: 0 for i in range(n)}
    assert rounds[0] <= 10


def test_random_graphs_match_union_find(spark):
    for seed in (7, 41, 137):
        rng = random.Random(seed)
        n = 60
        nodes = list(range(n))
        edges = [(rng.randrange(n), rng.randrange(n)) for _ in range(45)]
        edges = [(u, v) for u, v in edges if u != v]
        assert _cc_spark(spark, nodes, edges) == _union_find(nodes, edges)


def test_duplicate_clusters_representatives(spark):
    pairs = spark.createDataFrame(
        [(5, 9), (9, 12), (30, 31)], "id_a long, id_b long")
    docs = spark.createDataFrame(
        [(i,) for i in (5, 9, 12, 30, 31, 77)], "doc_id long")
    rows = {r["doc_id"]: (r["component"], r["is_representative"])
            for r in duplicate_clusters(pairs, docs=docs).collect()}
    assert rows == {5: (5, True), 9: (5, False), 12: (5, False),
                    30: (30, True), 31: (30, False), 77: (77, True)}
    # the docs a pipeline keeps = exactly one representative per cluster
    keeps = [d for d, (_, rep) in rows.items() if rep]
    assert sorted(keeps) == [5, 30, 77]
