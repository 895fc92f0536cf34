"""PCSA sibling (L19) + weighted t-digest (pre-aggregate scale path)."""

from __future__ import annotations

import numpy as np

from sketchlib.sketches.pcsa import PCSA
from sketchlib.sketches.tdigest import TDigest


def test_pcsa_estimate_and_or_merge():
    vals = np.arange(200000, dtype=np.uint64)
    whole = PCSA(256)
    whole.update(vals)
    est = whole.estimate()
    assert abs(est - 200000) / 200000 < 0.15   # FM error ~0.78/sqrt(n_maps)

    parts = np.array_split(vals, 7)
    acc = None
    for p_ in parts[::-1]:
        p = PCSA(256)
        p.update(p_)
        acc = p if acc is None else acc.merge(p)
    assert (acc.maps == whole.maps).all()       # OR merge bit-exact
    # idempotent on duplicates
    dup = PCSA(256)
    dup.update(vals)
    dup.update(vals)
    assert (dup.maps == whole.maps).all()


def test_pcsa_blob_roundtrip():
    p = PCSA(64, seed=9)
    p.update(np.arange(1000, dtype=np.uint64))
    rt = PCSA.from_bytes(p.to_bytes())
    assert rt.seed == 9 and (rt.maps == p.maps).all()


def test_tdigest_weighted_equals_expanded():
    rng = np.random.default_rng(4)
    vals = rng.integers(1, 51, 40000).astype(np.float64)  # discrete col
    uniq, cnt = np.unique(vals, return_counts=True)

    expanded = TDigest(delta=200)
    expanded.update(vals)
    weighted = TDigest(delta=200)
    weighted.update_weighted(uniq, cnt)

    assert weighted.count == expanded.count == 40000
    for q in [0.01, 0.25, 0.5, 0.75, 0.99]:
        exact = np.quantile(vals, q)
        qw = weighted.quantile(q)
        qe = expanded.quantile(q)
        # both within a small rank-error band of exact; discrete steps
        # of this column are 1.0 wide
        assert abs(qw - exact) <= 1.5, (q, qw, exact)
        assert abs(qe - exact) <= 1.5, (q, qe, exact)


def test_tdigest_weighted_via_spark_preaggregate(spark):
    from sketchlib import queries as Q
    li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
    qs = [0.1, 0.5, 0.9]
    plain = {r.q: r.value for r in Q.sketch_quantiles(
        spark, li, "l_quantity", qs, kind="tdigest").collect()}
    pre = {r.q: r.value for r in Q.sketch_quantiles(
        spark, li, "l_quantity", qs, kind="tdigest",
        pre_aggregate=True).collect()}
    exact = li.selectExpr(
        *[f"percentile(l_quantity, {q}) AS p{i}"
          for i, q in enumerate(qs)]).collect()[0]
    for i, q in enumerate(qs):
        assert abs(pre[q] - exact[i]) <= 1.5
        assert abs(plain[q] - exact[i]) <= 1.5
