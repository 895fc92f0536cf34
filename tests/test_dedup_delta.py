"""Incremental (delta-mode) MinHash-LSH dedup against a stored index
(round 5, VERDICT item 6): the daily operation of a 100 TB pipeline.

Gates:
- delta run == full recompute restricted to pairs touching the delta
  (the semantic contract that makes the incremental path trustworthy);
- with a parquet-backed index, the delta plan never scans the
  historical corpus file — only the delta and the index tables.
"""

from __future__ import annotations

import re

from pyspark.sql import functions as F

from sketchlib import dedup as D

from tests.conftest import plan_of

SF = "/root/testdata/sf0.001"
THR = 0.9


def _split(spark):
    docs = spark.read.parquet(SF + "/documents.parquet")
    # +1e9 re-key: above every sf's historical id range (sf1 ~9e6)
    new = (docs.filter(F.col("doc_id") % 10 == 0)
           .withColumn("doc_id", F.col("doc_id") + 1_000_000_000))
    return docs, new


def test_delta_equals_full_recompute_restricted(spark):
    docs, new = _split(spark)
    sh_old = D.shingles(docs, hashed=True)
    idx = D.minhash_band_index(shingle_df=sh_old)
    delta = {(r["id_a"], r["id_b"], r["jaccard"]) for r in
             D.minhash_dedup_delta(new, idx, sh_old, THR).collect()}

    full = D.minhash_dedup_pairs(docs.unionByName(new), THR)
    want = {(r["id_a"], r["id_b"], r["jaccard"]) for r in
            full.filter((F.col("id_a") >= 1_000_000_000)
                        | (F.col("id_b") >= 1_000_000_000)).collect()}
    assert delta == want
    assert len(delta) > 0  # the construction guarantees exact dups


def test_delta_plan_never_scans_historical_corpus(spark, tmp_path):
    """The whole point of the stored index: with the index persisted to
    parquet, tomorrow's run reads the DELTA and the INDEX — a plan that
    still scans the historical corpus text would be a silent full
    recompute at 100 TB."""
    docs, new = _split(spark)
    corpus_p = str(tmp_path / "hist_corpus.parquet")
    bands_p = str(tmp_path / "band_index.parquet")
    sh_p = str(tmp_path / "shingle_index.parquet")
    docs.write.parquet(corpus_p)
    hist = spark.read.parquet(corpus_p)
    sh_old = D.shingles(hist, hashed=True)
    sh_old.write.parquet(sh_p)
    D.minhash_band_index(shingle_df=sh_old).write.parquet(bands_p)

    delta_p = str(tmp_path / "delta.parquet")
    new.write.parquet(delta_p)

    out = D.minhash_dedup_delta(
        spark.read.parquet(delta_p),
        spark.read.parquet(bands_p),
        spark.read.parquet(sh_p), THR)
    plan = plan_of(out)
    assert "hist_corpus" not in plan
    assert "delta.parquet" in plan
    assert "band_index" in plan and "shingle_index" in plan
    # and it still finds the dup pairs (every 10th doc duplicated)
    n = out.count()
    assert n >= hist.filter(F.col("doc_id") % 10 == 0).count()


def test_band_index_shape(spark):
    docs, _ = _split(spark)
    idx = D.minhash_band_index(docs.limit(20), bands=16)
    rows = idx.collect()
    assert {r["band"] for r in rows} == set(range(16))
    per_doc = {}
    for r in rows:
        per_doc.setdefault(r["doc_id"], set()).add(r["band"])
    assert all(len(b) == 16 for b in per_doc.values())


def test_two_day_loop_equals_full_recompute(spark):
    """The complete daily cycle: day-1 delta dedups against the
    historical index and APPENDS to it (minhash_index_append); day-2's
    delta then sees both the original corpus and day-1's docs. The
    union of the three runs' pairs must equal one full recompute over
    everything — i.e. incremental processing loses nothing across
    days, including day-1 x day-2 cross pairs."""
    docs = spark.read.parquet(SF + "/documents.parquet")
    day1 = (docs.filter(F.col("doc_id") % 10 == 0)
            .withColumn("doc_id", F.col("doc_id") + 1_000_000_000))
    day2 = (docs.filter(F.col("doc_id") % 10 == 5)
            .withColumn("doc_id", F.col("doc_id") + 2_000_000_000))
    # also make day2 overlap day1: a copy of one day-1 doc
    dup_of_day1 = day1.filter(F.col("doc_id") == 1_000_000_000).select(
        (F.col("doc_id") + 2_000_000_000).alias("doc_id"), "text")
    day2 = (day2.select("doc_id", "text")
            .unionByName(dup_of_day1))

    sh0 = D.shingles(docs, hashed=True)
    bi0 = D.minhash_band_index(shingle_df=sh0)
    p1 = D.minhash_dedup_delta(day1, bi0, sh0, THR)
    bi1, sh1 = D.minhash_index_append(bi0, sh0, day1)
    p2 = D.minhash_dedup_delta(day2, bi1, sh1, THR)

    got = {(r["id_a"], r["id_b"]) for r in p1.collect()} \
        | {(r["id_a"], r["id_b"]) for r in p2.collect()}
    full = D.minhash_dedup_pairs(
        docs.select("doc_id", "text")
        .unionByName(day1.select("doc_id", "text"))
        .unionByName(day2), THR)
    want = {(r["id_a"], r["id_b"]) for r in
            full.filter((F.col("id_a") >= 1_000_000_000)
                        | (F.col("id_b") >= 1_000_000_000)).collect()}
    assert got == want
    # the day1 x day2 cross pair exists and was found by the DAY-2 run
    assert any(a == 1_000_000_000 and b == 3_000_000_000
               for a, b in {(r["id_a"], r["id_b"])
                            for r in p2.collect()})
