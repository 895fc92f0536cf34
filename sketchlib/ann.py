"""Similarity search over embedding columns.

Brute-force cosine top-k as the exact baseline and an LSH-bucketed
(random hyperplane / SRP) variant as the scale path. Both stay
JVM-side: dot products via ``aggregate(zip_with(...))``; the LSH
variant turns the cross join into an equi-join on bucket signature.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import DataFrame, SparkSession, Window, functions as F


def _norm(col):
    return F.sqrt(F.aggregate(col, F.lit(0.0),
                              lambda acc, x: acc + x.cast("double") * x.cast("double")))


def _dot(a, b):
    return F.aggregate(F.zip_with(a, b, lambda x, y:
                                  x.cast("double") * y.cast("double")),
                       F.lit(0.0), lambda acc, x: acc + x)


def cosine_topk(df: DataFrame, queries: DataFrame, k: int,
                id_col: str = "vec_id", vec_col: str = "embedding",
                sim_decimals: int = 6) -> DataFrame:
    """Exact top-k cosine neighbors of each query vector (brute force —
    the correctness baseline; O(nq * n) dot products, JVM-side).

    Output: (query_id, neighbor_id, sim) with sim floored to
    ``sim_decimals``; ranking by (sim desc, neighbor_id asc); the
    query itself excluded.
    """
    base = df.select(F.col(id_col).alias("neighbor_id"),
                     F.col(vec_col).alias("v"),
                     _norm(F.col(vec_col)).alias("nv"))
    q = queries.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"),
                       _norm(F.col(vec_col)).alias("nq"))
    joined = (q.crossJoin(F.broadcast(base))
               .filter(F.col("neighbor_id") != F.col("query_id"))
               .withColumn("sim", _dot(F.col("qv"), F.col("v"))
                           / (F.col("nq") * F.col("nv"))))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc())
    return (joined.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("query_id", "neighbor_id",
                    (F.floor(F.col("sim") * (10 ** sim_decimals))
                     / (10 ** sim_decimals)).alias("sim"),
                    F.col("rn").alias("rank")))


def srp_signatures(df: DataFrame, n_bits: int = 16, seed: int = 7,
                   dim: int = 64, id_col: str = "vec_id",
                   vec_col: str = "embedding") -> DataFrame:
    """Signed-random-projection LSH signature (Charikar 2002): bit i =
    sign(v . r_i) for fixed seeded Gaussian hyperplanes. Vectors with
    high cosine share many bits => bucket on the signature."""
    rng = np.random.default_rng(seed)
    planes = rng.standard_normal((n_bits, dim))
    sig = None
    for i in range(n_bits):
        arr = F.array(*[F.lit(float(x)) for x in planes[i]])
        bit = F.when(_dot(F.col(vec_col), arr) > 0, F.lit(1)).otherwise(F.lit(0))
        sig = bit if sig is None else sig * 2 + bit
    return df.select(id_col, vec_col, sig.alias("srp_sig"))


def ann_topk_lsh(df: DataFrame, queries: DataFrame, k: int,
                 n_bits: int = 12, n_tables: int = 4, seed: int = 7,
                 dim: int = 64, id_col: str = "vec_id",
                 vec_col: str = "embedding") -> DataFrame:
    """Approximate top-k: union of ``n_tables`` SRP bucket joins, exact
    cosine re-rank inside the candidate set. At scale this replaces the
    cross join with equi-joins on (table, signature)."""
    cand = None
    for t in range(n_tables):
        base = srp_signatures(df, n_bits, seed + t, dim, id_col, vec_col)
        qs = srp_signatures(queries, n_bits, seed + t, dim, id_col, vec_col)
        c = (qs.select(F.col(id_col).alias("query_id"),
                       F.col(vec_col).alias("qv"), "srp_sig")
               .join(base.select(F.col(id_col).alias("neighbor_id"),
                                 F.col(vec_col).alias("v"), "srp_sig"),
                     "srp_sig")
               .filter(F.col("neighbor_id") != F.col("query_id"))
               .select("query_id", "qv", "neighbor_id", "v"))
        cand = c if cand is None else cand.unionByName(c)
    cand = cand.dropDuplicates(["query_id", "neighbor_id"])
    scored = cand.withColumn(
        "sim", _dot(F.col("qv"), F.col("v"))
        / (_norm(F.col("qv")) * _norm(F.col("v"))))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sim").desc(), F.col("neighbor_id").asc())
    return (scored.withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= k)
            .select("query_id", "neighbor_id",
                    (F.floor(F.col("sim") * 1e6) / 1e6).alias("sim"),
                    F.col("rn").alias("rank")))
