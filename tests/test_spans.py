"""Substring-level (span) duplication operators (sketchlib/spans.py):
rolling-window hashing recall, interval-union coverage vs a
brute-force position-set computation, and the short-doc guard.
"""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import functions as F

from sketchlib import spans as S

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def corpus(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    copies = (docs.filter(F.col("doc_id") % 10 == 0)
              .withColumn("doc_id", F.col("doc_id") + 1_000_000))
    return docs.unionByName(copies).cache()


def test_span_hashes_one_row_per_position(spark, corpus):
    got = S.span_hashes(corpus, width=10)
    per_doc = got.groupBy("doc_id").count()
    toks = corpus.select(
        "doc_id",
        F.size(F.filter(F.split(F.lower("text"), r"\s+"),
                        lambda x: x != "")).alias("n"))
    j = per_doc.join(toks, "doc_id").toPandas()
    # n - width + 1 windows for docs with n >= width
    assert (j["count"] == j["n"] - 9).all()
    # short docs emit nothing (dropped entirely, not negative counts)
    short = toks.filter(F.col("n") < 10).join(got, "doc_id").count()
    assert short == 0


def test_duplicated_spans_catch_planted_copies(spark, corpus):
    """Every window of a fully-duplicated doc occurs >= 2x, so each
    planted doc's whole span set appears in the duplicate table."""
    dup = S.duplicated_spans(corpus, width=10).cache()
    spans = S.span_hashes(corpus, width=10)
    planted = spans.filter(F.col("doc_id") >= 1_000_000)
    missing = planted.join(dup, "span_hash", "left_anti").count()
    assert missing == 0
    # and min_count filters: every returned row really has >= 2 hits
    assert dup.filter(F.col("n_occurrences") < 2).count() == 0


def test_coverage_equals_bruteforce_position_union(spark, corpus):
    """Gaps-and-islands interval union == the W x explode brute force
    (distinct covered positions), doc by doc."""
    W = 10
    got = (S.span_dup_coverage(corpus, width=W)
           .orderBy("doc_id").toPandas())
    spans = S.span_hashes(corpus, width=W)
    dup = (spans.groupBy("span_hash").count()
           .filter(F.col("count") >= 2).select("span_hash"))
    brute = (spans.join(dup, "span_hash")
             .select("doc_id",
                     F.explode(F.sequence(
                         F.col("start"),
                         F.col("start") + W - 1)).alias("pos"))
             .distinct().groupBy("doc_id")
             .agg(F.count("*").alias("covered"))
             .orderBy("doc_id").toPandas())
    assert got[["doc_id", "covered"]].values.tolist() == \
        brute[["doc_id", "covered"]].values.tolist()
    # planted full-duplicates cover every token exactly
    full = got[got.doc_id >= 1_000_000]
    assert (full.covered == full.n_tokens).all()
    assert (full.coverage_frac == 1.0).all()


def test_coverage_respects_fraction_rounding(spark, corpus):
    got = S.span_dup_coverage(corpus, width=10).toPandas()
    import math
    for r in got.itertuples():
        assert r.coverage_frac == math.floor(
            r.covered * 1_000_000 / r.n_tokens) / 1_000_000
        assert 0 < r.covered <= r.n_tokens


def test_coverage_deterministic_with_collided_doc_ids(spark):
    """Round-5 regression: two docs sharing a doc_id (a corpus-union
    artifact — the sf1 gate hit it when re-keyed copies collided with
    the scaled snapshot's id range) create duplicate (id, start)
    interval rows; without a DISTINCT before the island window the
    ROWS frame runs over a non-total order and the covered sum is
    implementation-defined (observed run-to-run drift in DuckDB).
    Pinned: duplicates contribute nothing, covered <= max text extent,
    and the result is stable across repeated runs."""
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        (1, base + " one two three"),      # 13 tokens
        (1, base + " four five"),          # same id, different text
        (2, base + " one two three"),      # duplicates doc 1's windows
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    outs = [sorted(map(tuple, S.span_dup_coverage(df, width=10)
                       .select("doc_id", "n_tokens", "covered")
                       .collect()))
            for _ in range(3)]
    assert outs[0] == outs[1] == outs[2]
    for doc_id, n_tokens, covered in outs[0]:
        assert covered <= max(13, n_tokens)
