"""Corpus search: BM25 top-k retrieval over the documents table.

A training-data-pipeline primitive (query-focused corpus slicing,
eval-set mining, targeted decontamination): score every document
against a bag of query terms with Okapi BM25 (Robertson et al., TREC-3;
the ``ln(1 + (N - df + 0.5)/(df + 0.5))`` non-negative idf variant
Lucene uses) and keep the top k.

100 TB shape — pure Catalyst, no UDFs, no driver data paths:
- the full token stream is aggregated ONCE per doc for document
  lengths (map-side combined count by doc_id);
- term frequencies are filtered to the query terms BEFORE their
  (doc, token) aggregate, so the tf shuffle carries only matching
  rows (|terms| is tiny; the filter is pushed into the scan stage);
- per-term document frequencies are a |terms|-row aggregate joined
  back by broadcast;
- the final ranking is sum-per-doc + TakeOrderedAndProject (only k
  rows reach the driver).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["bm25_scores", "bm25_topk"]


def bm25_scores(docs: DataFrame, query_terms: list[str],
                k1: float = 1.2, b: float = 0.75,
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, score) for every document matching >= 1 query term."""
    from sketchlib.dedup import normalized_tokens

    toks = normalized_tokens(docs, id_col=id_col, text_col=text_col) \
        .select(id_col, "token")
    dl = toks.groupBy(id_col).agg(F.count("*").alias("dl"))
    tf = (toks.filter(F.col("token").isin(list(query_terms)))
          .groupBy(id_col, "token").agg(F.count("*").alias("tfc")))
    dft = tf.groupBy("token").agg(
        F.countDistinct(id_col).alias("dft"))
    stats = dl.agg(F.count("*").alias("n"), F.avg("dl").alias("avgdl"))
    idf = F.log(F.lit(1.0) + (F.col("n") - F.col("dft") + 0.5)
                / (F.col("dft") + 0.5))
    tf_part = (F.col("tfc") * (k1 + 1)
               / (F.col("tfc")
                  + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))))
    return (tf.join(dl, id_col)
            .join(F.broadcast(dft), "token")
            .crossJoin(F.broadcast(stats))
            .select(id_col, (idf * tf_part).alias("part"))
            .groupBy(id_col)
            .agg(F.sum("part").alias("score")))


def bm25_topk(docs: DataFrame, query_terms: list[str], k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              id_col: str = "doc_id",
              text_col: str = "text") -> DataFrame:
    """Top-``k`` (doc_id, score) by BM25, deterministic tie-break on
    doc_id. The orderBy+limit lowers to TakeOrderedAndProject — only
    ``k`` rows ever leave the executors."""
    return (bm25_scores(docs, query_terms, k1, b, id_col, text_col)
            .orderBy(F.col("score").desc(), F.col(id_col))
            .limit(k))
