"""ANN + embedding-dedup operator tests.

Covers the SRP-LSH scale path (sketchlib/ann.py) and the
embedding-cosine near-dup dedup (sketchlib/dedup.py): sign-invariance
of SRP signatures under positive scaling, agreement of the LSH
candidate re-rank with the brute-force baseline on its candidate set,
and exact==lsh equality for scaled-copy near-dups.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib import ann as A
from sketchlib import dedup as D

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet").cache()


def test_srp_signature_scale_invariant(spark, emb):
    base = A.srp_signatures(emb, n_bits=8, n_tables=4).select(
        "vec_id", "srp_sigs")
    scaled = A.srp_signatures(
        emb.withColumn("embedding",
                       F.transform(F.col("embedding").cast("array<double>"),
                                   lambda x: x * 3.0)),
        n_bits=8, n_tables=4).select("vec_id",
                                     F.col("srp_sigs").alias("srp_sigs2"))
    j = base.join(scaled, "vec_id")
    assert j.filter(F.col("srp_sigs") != F.col("srp_sigs2")).count() == 0


def test_lsh_topk_subset_of_bruteforce_order(spark, emb):
    """Every (query, neighbor) the LSH variant returns must carry the
    same exact cosine the brute-force baseline computes, and ranks
    must be consistent with sim ordering."""
    qs = emb.filter(F.col("vec_id") < 5)
    bf = A.cosine_topk(emb, qs, k=50).toPandas()
    lsh = A.ann_topk_lsh(emb, qs, k=5).toPandas()
    bf_sim = {(r.query_id, r.neighbor_id): r.sim for r in bf.itertuples()}
    for r in lsh.itertuples():
        key = (r.query_id, r.neighbor_id)
        if key in bf_sim:  # brute floors, LSH rounds: <= one 1e-6 step
            assert abs(bf_sim[key] - r.sim) <= 1e-6 + 1e-9
    for qid, grp in lsh.groupby("query_id"):
        sims = grp.sort_values("rank")["sim"].to_numpy()
        assert (np.diff(sims) <= 1e-12).all()


def test_embedding_near_dup_exact_vs_lsh(spark, emb):
    base = emb.withColumn("embedding",
                          F.col("embedding").cast("array<double>"))
    copies = (base.filter(F.col("vec_id") % 20 == 0)
              .withColumn("vec_id", F.col("vec_id") + 1_000_000)
              .withColumn("embedding",
                          F.transform("embedding", lambda x: x * 2.0)))
    corpus = base.unionByName(copies)
    exact = (D.embedding_near_dup_pairs(corpus, 0.99, method="exact")
             .orderBy("id_a", "id_b").toPandas())
    lsh = (D.embedding_near_dup_pairs(corpus, 0.99, method="lsh")
           .orderBy("id_a", "id_b").toPandas())
    n_copies = copies.count()
    assert len(exact) == n_copies
    assert (exact["cos_sim"] == 1.0).all()
    assert exact.values.tolist() == lsh.values.tolist()
