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


# ---------------------------------------------------------------- SemDeDup


@pytest.fixture(scope="module")
def dup_corpus(spark, emb):
    """embeddings + exact-cosine-1.0 scaled copies of every 20th."""
    base = emb.withColumn("embedding",
                          F.col("embedding").cast("array<double>"))
    copies = (base.filter(F.col("vec_id") % 20 == 0)
              .withColumn("vec_id", F.col("vec_id") + 1_000_000)
              .withColumn("embedding",
                          F.transform("embedding", lambda x: x * 2.0)))
    return base.unionByName(copies).cache()


def _mod_assign(corpus, k=8):
    return corpus.select(
        "vec_id",
        ((F.col("vec_id") % 1_000_000) % k).cast("int").alias("cluster"))


def test_semantic_dup_pairs_equals_within_cluster_bruteforce(spark,
                                                             dup_corpus):
    """Per-cluster matmul pairs == brute-force pairs restricted to the
    same cluster (SemDeDup misses cross-cluster pairs BY DESIGN)."""
    assign = _mod_assign(dup_corpus)
    tagged = dup_corpus.join(assign, "vec_id")
    got = (D.semantic_dup_pairs(tagged, 0.99)
           .orderBy("id_a", "id_b").toPandas())
    cl = {r.vec_id: r.cluster for r in assign.collect()}
    brute = (D.embedding_near_dup_pairs(dup_corpus, 0.99, method="exact")
             .orderBy("id_a", "id_b").toPandas())
    want = brute[[cl[a] == cl[b] for a, b in
                  zip(brute.id_a, brute.id_b)]].reset_index(drop=True)
    assert got.values.tolist() == want.values.tolist()
    # copies land in their original's cluster -> all 25 pairs survive
    assert len(got) == dup_corpus.filter(
        F.col("vec_id") >= 1_000_000).count()


def test_semantic_dup_pairs_blocking_invariant(spark, dup_corpus):
    """The blocked matmul (tiny block_rows) returns the identical pair
    set as one big block — blocking is purely a memory lever."""
    tagged = dup_corpus.join(_mod_assign(dup_corpus, k=2), "vec_id")
    one = (D.semantic_dup_pairs(tagged, 0.99, block_rows=4096)
           .orderBy("id_a", "id_b").toPandas())
    tiny = (D.semantic_dup_pairs(tagged, 0.99, block_rows=7)
            .orderBy("id_a", "id_b").toPandas())
    assert one.values.tolist() == tiny.values.tolist()


def test_semdedup_min_id_keep_set(spark, dup_corpus):
    out = (D.semdedup(dup_corpus, 0.99, assign=_mod_assign(dup_corpus))
           .orderBy("vec_id").toPandas())
    n = dup_corpus.count()
    n_copies = dup_corpus.filter(F.col("vec_id") >= 1_000_000).count()
    assert len(out) == n
    # every copy collapses onto its original (the component min)
    dups = out[~out.keep]
    assert len(dups) == n_copies
    assert (dups.vec_id - 1_000_000 == dups.component).all()
    # keep rows are exactly the component minima, one per component
    assert out.groupby("component")["keep"].sum().eq(1).all()
    assert (out[out.keep].vec_id == out[out.keep].component).all()


def test_semdedup_centroid_far_keeps_most_atypical(spark, dup_corpus):
    """k-means path + the paper's keep rule: exactly one keeper per
    component, and within a multi-member component the keeper has the
    LOWEST centroid cosine (ties to lower id)."""
    out = D.semdedup(dup_corpus, 0.99, nlist=8, keep="centroid_far")
    pdf = out.toPandas()
    assert len(pdf) == dup_corpus.count()
    assert pdf.groupby("component")["keep"].sum().eq(1).all()
    # scaled copy and original have identical unit vectors -> identical
    # cent_sim -> tie broken to the LOWER id (the original)
    multi = pdf[pdf.groupby("component")["vec_id"].transform("size") > 1]
    keepers = multi[multi.keep].set_index("component")["vec_id"]
    mins = multi.groupby("component")["vec_id"].min()
    assert (keepers.sort_index() == mins.sort_index()).all()


def test_semdedup_rejects_bad_args(spark, dup_corpus):
    with pytest.raises(ValueError, match="centroid_far"):
        D.semdedup(dup_corpus, 0.99, assign=_mod_assign(dup_corpus),
                   keep="centroid_far")
    with pytest.raises(ValueError, match="keep rule"):
        D.semdedup(dup_corpus, 0.99, assign=_mod_assign(dup_corpus),
                   keep="nope")
