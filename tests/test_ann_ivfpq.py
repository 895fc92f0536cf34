"""IVF-PQ composition (round 5): ivfpq_index / ann_topk_ivfpq — the
FAISS-style cell-routed codes scan that serves 10^12-vector corpora.
Gates: full-probe equivalence to the plain PQ scan, partial-probe
cluster recall, index layout, and the scale-invariance that makes the
recall-guaranteed driver oracle strict.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from sketchlib.ann import (ann_topk_ivfpq, ann_topk_pq, ivf_assign,
                           ivf_train, ivfpq_index, pq_encode, pq_train)

DIM = 32


def _clustered(spark, n_clusters=8, per=30, seed=3):
    rng = np.random.default_rng(seed)
    cents = rng.normal(size=(n_clusters, DIM))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    rows, vid = [], 0
    for c in range(n_clusters):
        for _ in range(per):
            v = cents[c] + 0.05 * rng.normal(size=DIM)
            rows.append((vid, c, v.tolist()))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, cluster int, embedding array<double>")


def test_full_probe_equals_plain_pq(spark):
    """nprobe >= nlist scans every cell: the IVF routing must be a
    pure no-op and the result identical to ann_topk_pq."""
    df = _clustered(spark)
    cents = ivf_train(df, nlist=4, iters=3)
    books = pq_train(df, m=4, kcent=16, iters=3)
    idx = ivfpq_index(df, cents, books)
    qs = df.filter(F.col("vec_id") < 5)
    a = [(r["query_id"], r["neighbor_id"]) for r in
         ann_topk_ivfpq(idx, qs, cents, books, k=5, nprobe=4).collect()]
    b = [(r["query_id"], r["neighbor_id"]) for r in
         ann_topk_pq(pq_encode(df, books), qs, books, k=5).collect()]
    assert a == b


def test_partial_probe_cluster_recall(spark):
    """nprobe=1 on well-separated clusters: every returned neighbor
    comes from the query's own cluster (the cell it probes)."""
    df = _clustered(spark, n_clusters=8, per=30)
    cents = ivf_train(df, nlist=8, iters=4)
    books = pq_train(df, m=8, kcent=32, iters=4)
    idx = ivfpq_index(df, cents, books)
    qs = df.filter(F.col("vec_id") % 30 == 0)
    rows = ann_topk_ivfpq(idx, qs, cents, books, k=5, nprobe=1).collect()
    cl = {r["vec_id"]: r["cluster"] for r in
          df.select("vec_id", "cluster").collect()}
    assert len(rows) == 8 * 5
    same = sum(cl[r["query_id"]] == cl[r["neighbor_id"]] for r in rows)
    assert same / len(rows) >= 0.95


def test_index_layout_and_keep_cols(spark):
    df = _clustered(spark, 4, 20)
    cents = ivf_train(df, nlist=4, iters=2)
    books = pq_train(df, m=4, kcent=16, iters=2)
    idx = ivfpq_index(df, cents, books)
    assert set(idx.columns) == {"vec_id", "codes", "cell"}
    rows = idx.collect()
    assert len(rows) == 80
    assert all(0 <= r["cell"] < 4 for r in rows)
    assert all(len(r["codes"]) == 4 for r in rows)
    # cells agree with a standalone assignment pass
    want = {r["vec_id"]: r["ivf_cluster"] for r in
            ivf_assign(df, cents).collect()}
    assert all(want[r["vec_id"]] == r["cell"] for r in rows)


def test_scaled_copies_share_cell_and_codes(spark):
    """Power-of-two scaled copies unit-normalize bit-exactly to the
    original, so they land in ITS cell with ITS codes — the property
    the strict driver oracle rests on."""
    df = _clustered(spark, 4, 20)
    cents = ivf_train(df, nlist=4, iters=2)
    books = pq_train(df, m=4, kcent=16, iters=2)
    copies = df.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 1000).alias("vec_id"), "cluster",
        F.transform("embedding", lambda x: x * 8.0).alias("embedding"))
    idx = {r["vec_id"]: (r["cell"], tuple(r["codes"])) for r in
           ivfpq_index(df.unionByName(copies), cents, books).collect()}
    for q in range(3):
        assert idx[q] == idx[q + 1000]
