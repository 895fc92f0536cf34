"""Corpus search: BM25 top-k retrieval over the documents table.

A training-data-pipeline primitive (query-focused corpus slicing,
eval-set mining, targeted decontamination): score every document
against a bag of query terms with Okapi BM25 (Robertson et al., TREC-3;
the ``ln(1 + (N - df + 0.5)/(df + 0.5))`` non-negative idf variant
Lucene uses) and keep the top k.

100 TB shape — pure Catalyst, no UDFs, no driver data paths, ONE
corpus scan:
- the exploded token stream is aggregated ONCE per document, with the
  per-term tf columns PIVOTED into the same Tungsten hash aggregate
  (``count(when(token = t))`` per query term — |terms| is small, so
  the aggregate row stays narrow and fully map-side combined);
- the per-document table is persisted and reduced once more for the
  corpus stats (N, avgdl, per-term document frequencies) — a 1-row
  broadcast, not a join graph;
- scoring is a codegen column expression over (tf_i, dl, stats);
  the final cut is TakeOrderedAndProject (only k rows reach the
  driver).

Two shuffles total: the per-doc aggregate and the 1-row stats
reduction — versus the naive five-table join formulation's seven.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

__all__ = ["bm25_scores", "bm25_topk"]


def bm25_scores(docs: DataFrame, query_terms: list[str],
                k1: float = 1.2, b: float = 0.75,
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """(doc_id, score) for every document matching >= 1 query term."""
    from sketchlib.cache import scoped_persist
    from sketchlib.dedup import normalized_tokens

    terms = list(query_terms)
    if not terms:
        raise ValueError("query_terms must be non-empty")
    toks = normalized_tokens(docs, id_col=id_col, text_col=text_col) \
        .select(id_col, "token")
    # scoped_persist: scanned by both the stats aggregate and the final
    # scoring plan; bounded registry per round-3 ADVICE
    per_doc = scoped_persist(toks.groupBy(id_col).agg(
        F.count("*").alias("dl"),
        *[F.count(F.when(F.col("token") == t, 1)).alias(f"tf_{i}")
          for i, t in enumerate(terms)]))
    stats = per_doc.agg(
        F.count("*").alias("n"), F.avg("dl").alias("avgdl"),
        *[F.count(F.when(F.col(f"tf_{i}") > 0, 1)).alias(f"dft_{i}")
          for i in range(len(terms))])

    def idf(i):
        return F.log(F.lit(1.0)
                     + (F.col("n") - F.col(f"dft_{i}") + 0.5)
                     / (F.col(f"dft_{i}") + 0.5))

    def part(i):
        tfc = F.col(f"tf_{i}")
        return F.when(tfc > 0, idf(i) * tfc * (k1 + 1)
                      / (tfc + k1 * (1 - b
                                     + b * F.col("dl")
                                     / F.col("avgdl")))) \
                .otherwise(F.lit(0.0))

    score = part(0)
    for i in range(1, len(terms)):
        score = score + part(i)
    matched = F.greatest(*[F.col(f"tf_{i}") for i in range(len(terms))]) \
        if len(terms) > 1 else F.col("tf_0")
    return (per_doc.crossJoin(F.broadcast(stats))
            .filter(matched > 0)
            .select(id_col, score.alias("score")))


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
