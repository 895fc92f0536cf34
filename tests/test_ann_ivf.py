"""IVF (inverted-file) ANN tests — sketchlib/ann.py ivf_* path.

Three guarantees:
- full probe (nprobe == nlist) is EXACTLY the brute-force top-k —
  the whole train/assign/probe/rerank machinery degrades to exact;
- quantizer training is deterministic (bit-exact across runs);
- on cluster-structured data with one seed point per cluster among
  the init ids, nprobe=1 already recovers the exact top-k while
  scanning only the query's own cell (the genuine approximate regime),
  and scaled copies of a query share its cell assignment bit-exactly.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib import ann as A

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return (spark.read.parquet(f"{SF}/embeddings.parquet")
            .withColumn("embedding",
                        F.col("embedding").cast("array<double>"))
            .cache())


def _pairs(pdf):
    return {(int(r.query_id), int(r.neighbor_id)) for r in pdf.itertuples()}


def test_ivf_full_probe_equals_bruteforce(spark, emb):
    """nprobe == nlist probes every cell => the candidate set is the
    whole corpus => results must match the exact baseline (set-wise;
    sims within one 1e-6 rounding step of the floored baseline)."""
    qs = emb.filter(F.col("vec_id") < 5)
    bf = A.cosine_topk(emb, qs, k=5).toPandas()
    ivf = A.ann_topk_ivf(emb, qs, k=5, nlist=8, nprobe=8,
                         iters=2).toPandas()
    assert _pairs(ivf) == _pairs(bf)
    bf_sim = {(r.query_id, r.neighbor_id): r.sim for r in bf.itertuples()}
    for r in ivf.itertuples():
        assert abs(bf_sim[(r.query_id, r.neighbor_id)] - r.sim) \
            <= 1e-6 + 1e-9


def test_ivf_train_deterministic(spark, emb):
    c1 = A.ivf_train(emb, nlist=8, iters=3)
    c2 = A.ivf_train(emb, nlist=8, iters=3)
    assert c1.shape == (8, 64)
    assert np.array_equal(c1, c2)
    assert np.allclose(np.linalg.norm(c1, axis=1), 1.0)


def _clustered_corpus(spark, n_clusters=8, per_cluster=30, dim=64,
                      noise=0.05, seed=11):
    """Well-separated unit clusters around orthogonal axes; ids 0..7
    are one clean seed point per cluster (so deterministic id-based
    init starts with the right cells), the rest are noisy members."""
    rng = np.random.default_rng(seed)
    rows = []
    for c in range(n_clusters):
        center = np.zeros(dim)
        center[c] = 1.0
        rows.append((c, center.tolist()))
    vid = n_clusters
    for c in range(n_clusters):
        for _ in range(per_cluster - 1):
            v = np.zeros(dim)
            v[c] = 1.0
            v += noise * rng.standard_normal(dim)
            rows.append((vid, v.tolist()))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_ivf_nprobe1_exact_on_clustered_data(spark):
    """With separated clusters, every true neighbor lives in the
    query's own cell: nprobe=1 must reproduce the exact top-k while
    its candidate join touches only ~1/nlist of the corpus."""
    corpus = _clustered_corpus(spark).cache()
    qs = corpus.filter(F.col("vec_id") < 4)
    cents = A.ivf_train(corpus, nlist=8, iters=3)
    bf = A.cosine_topk(corpus, qs, k=5).toPandas()
    ivf = A.ann_topk_ivf(corpus, qs, k=5, nprobe=1,
                         centroids=cents).toPandas()
    assert _pairs(ivf) == _pairs(bf)
    # the probe really is partial: each cell holds ~30 of 240 vectors
    assigned = A.ivf_assign(corpus, cents).groupBy("ivf_cluster").count()
    counts = {r["ivf_cluster"]: r["count"] for r in assigned.collect()}
    assert len(counts) == 8
    assert max(counts.values()) < 240 // 4


def test_ivf_scaled_copy_shares_cell_bitexact(spark):
    """Power-of-two scaling preserves the coarse-cell assignment
    bit-exactly (the invariant the strict driver oracle for
    ann_ivf_topk rests on)."""
    corpus = _clustered_corpus(spark)
    cents = A.ivf_train(corpus, nlist=8, iters=2)
    scaled = corpus.withColumn(
        "embedding", F.transform("embedding", lambda x: x * 8.0))
    a = A.ivf_assign(corpus, cents).select("vec_id", "ivf_cluster")
    b = (A.ivf_assign(scaled, cents)
         .select("vec_id", F.col("ivf_cluster").alias("c2")))
    assert a.join(b, "vec_id").filter(
        F.col("ivf_cluster") != F.col("c2")).count() == 0
