"""Substring-level (span) duplication detection — the signal behind
exact-substring training-data dedup (Lee et al. 2021, "Deduplicating
Training Data Makes Language Models Better", arXiv:2107.06499).

The reference pipeline there builds a single-machine suffix array; the
distributed analog used at corpus scale is rolling fixed-width token
windows hashed and counted — any substring of >= width duplicated
tokens is caught by at least one duplicated window, so width-w window
counting has perfect recall for duplicated runs >= w tokens (and by
construction finds nothing shorter). This module implements that
analog Spark-first:

- every stage is Catalyst expressions (split/slice/md5/explode) — no
  Python in the hot path;
- the span stream has exactly one row per token position, so its
  volume equals the tokenize stream every other operator already
  shuffles (NOT width x tokens: the window hash is computed inside
  ``transform`` before the explode);
- per-doc coverage merges duplicated-span intervals with the
  gaps-and-islands window trick (partitioned BY DOC, so window state
  is bounded by document length, never corpus length);
- md5 is the window fingerprint so a SQL engine (the DuckDB oracle)
  reproduces hashes bit-for-bit.

At 100 TB: span hashing is a narrow map over the scan; the duplicate
count is one hash aggregation keyed by a 128-bit hash (uniform keys —
no skew salting needed); the coverage join is hash-semi on span_hash.
Driver never sees row data.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

TOKEN_SPLIT = r"\s+"


def _tok_array(text_col: str):
    """Lowercased whitespace tokens as an array, empties dropped —
    element-for-element what DuckDB's
    list_filter(string_split_regex(lower(text),'\\s+'), x -> x <> '')
    produces."""
    return F.filter(F.split(F.lower(F.col(text_col)), TOKEN_SPLIT),
                    lambda x: x != "")


def span_hashes(docs: DataFrame, width: int = 10,
                id_col: str = "doc_id",
                text_col: str = "text") -> DataFrame:
    """``(id, start, span_hash)`` — md5 of every width-token window
    (space-rejoined), one row per 0-based start position. Documents
    shorter than ``width`` emit nothing. The hash is computed inside
    the array ``transform`` so only (16-byte hash, int) rows — never
    width-replicated token text — reach the explode/shuffle."""
    toks = _tok_array(text_col)
    n = F.size(toks)
    windows = F.when(
        n >= width,
        F.transform(F.sequence(F.lit(1), n - width + 1),
                    lambda i: F.md5(F.concat_ws(" ", F.slice(toks, i,
                                                             width))))
    ).otherwise(F.array().cast("array<string>"))
    return (docs.select(F.col(id_col), windows.alias("w"))
            .select(id_col,
                    F.posexplode("w").alias("start", "span_hash")))


def duplicated_spans(docs: DataFrame, width: int = 10,
                     min_count: int = 2, id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Span-level duplicate table: every width-token window occurring
    at least ``min_count`` times corpus-wide (within-doc repeats
    count), with occurrence / distinct-doc counts and the minimum
    holding doc. One shuffle: the hash aggregation on span_hash."""
    return (span_hashes(docs, width, id_col, text_col)
            .groupBy("span_hash")
            .agg(F.count("*").alias("n_occurrences"),
                 F.countDistinct(id_col).alias("n_docs"),
                 F.min(id_col).alias("first_doc"))
            .filter(F.col("n_occurrences") >= min_count))


def span_dup_coverage(docs: DataFrame, width: int = 10,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """Per-document duplicated-substring coverage: the fraction of
    token positions lying inside at least one corpus-duplicated
    width-token window — THE drop/trim signal of substring-level
    dedup (Lee et al. 2021 cut any duplicated substring; pipelines
    since filter on coverage fraction).

    Plan: span table (one row/token) -> self-duplicate semi-join on
    span_hash -> per-doc interval union via gaps-and-islands (window
    partitioned by doc: running max of interval end, new island when
    a start clears it) -> one sum per doc. Returns
    ``(id, n_tokens, covered, coverage_frac)`` for covered docs;
    frac is floor(1e6*covered/n_tokens)/1e6 so any SQL engine
    reproduces the rounding exactly."""
    spans = span_hashes(docs, width, id_col, text_col)
    dup = (spans.groupBy("span_hash")
           .agg(F.count("*").alias("cnt"))
           .filter(F.col("cnt") >= 2)
           .select("span_hash"))
    hits = (spans.join(dup, "span_hash")
            .select(id_col, F.col("start"),
                    (F.col("start") + width).alias("end")))

    w = Window.partitionBy(id_col).orderBy("start")
    prev_max = F.max("end").over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    island = F.sum(
        F.when(prev_max.isNull() | (F.col("start") > prev_max), 1)
        .otherwise(0)).over(w.rowsBetween(Window.unboundedPreceding, 0))
    covered = (hits.withColumn("island", island)
               .groupBy(id_col, "island")
               .agg(F.min("start").alias("s"), F.max("end").alias("e"))
               .groupBy(id_col)
               .agg(F.sum(F.col("e") - F.col("s")).alias("covered")))

    n_tok = docs.select(id_col,
                        F.size(_tok_array(text_col)).alias("n_tokens"))
    return (covered.join(n_tok, id_col)
            .select(id_col,
                    F.col("n_tokens").cast("long").alias("n_tokens"),
                    F.col("covered").cast("long").alias("covered"),
                    (F.floor(F.col("covered") * 1_000_000
                             / F.col("n_tokens"))
                     / 1_000_000).alias("coverage_frac")))
