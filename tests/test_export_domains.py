"""Training-data export (sketchlib/export.py) and URL/domain curation
(sketchlib/textstats.py): temperature mixture weights, deterministic
sampling/sharding, write_shards round-trip, domain extraction."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sketchlib.export import (mixture_weights, shuffle_shard,
                              temperature_sample, write_shards)
from sketchlib.textstats import blocklist_filter, domain_stats, extract_domain

from .conftest import n_shuffles, plan_of


def _docs(spark, n=300):
    # lang mass: en 2/3, de 1/4, fi 1/12 (tail)
    return spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.when(F.col("id") % 12 < 8, "en")
         .when(F.col("id") % 12 < 11, "de")
         .otherwise("fi").alias("lang"))


def test_mixture_weights_formula(spark):
    df = _docs(spark)
    w = {r["lang"]: r["mix_weight"]
         for r in mixture_weights(df, "lang", alpha=0.5)
         .select("lang", "mix_weight").distinct().collect()}
    assert w["en"] == pytest.approx((8 / 12) ** -0.5)
    assert w["fi"] == pytest.approx((1 / 12) ** -0.5)
    # alpha=1 is the natural distribution: all weights 1
    w1 = {r["mix_weight"]
          for r in mixture_weights(df, "lang", alpha=1.0)
          .select("mix_weight").distinct().collect()}
    assert w1 == {1.0}


def test_temperature_sample_upsamples_tail_and_is_deterministic(spark):
    df = _docs(spark, 600)
    s = temperature_sample(df, "lang", 120, ["doc_id"], alpha=0.5, seed=3)
    rows = sorted(r["doc_id"] for r in s.collect())
    assert len(rows) == 120
    # deterministic under a different partitioning
    rows2 = sorted(r["doc_id"] for r in temperature_sample(
        df.repartition(7), "lang", 120, ["doc_id"],
        alpha=0.5, seed=3).collect())
    assert rows == rows2
    # tail language exceeds its natural share (1/12 of 120 = 10)
    n_fi = s.filter(F.col("lang") == "fi").count()
    assert n_fi > 10
    # plan shape: per-task top-k, no corpus-wide sort exchange
    assert "TakeOrderedAndProject" in plan_of(s)


def test_shuffle_shard_deterministic_and_balanced(spark):
    df = spark.range(4000).select(F.col("id").alias("doc_id"))
    sh = shuffle_shard(df, ["doc_id"], 16, seed=5)
    a = {r["doc_id"]: (r["shard"], r["shard_key"]) for r in sh.collect()}
    b = {r["doc_id"]: (r["shard"], r["shard_key"])
         for r in shuffle_shard(df.repartition(11), ["doc_id"], 16,
                                seed=5).collect()}
    assert a == b
    counts = sh.groupBy("shard").count().collect()
    assert len(counts) == 16
    assert all(150 < r["count"] < 350 for r in counts)  # 250 +- binomial
    # a different seed reshuffles
    c = {r["doc_id"]: r["shard"]
         for r in shuffle_shard(df, ["doc_id"], 16, seed=6).collect()}
    assert any(c[k] != a[k][0] for k in c)


def test_write_shards_roundtrip_sorted(spark, tmp_path):
    df = spark.range(500).select(F.col("id").alias("doc_id"))
    out = str(tmp_path / "shards")
    write_shards(df, out, ["doc_id"], 4, seed=9)
    back = spark.read.parquet(out)
    assert back.count() == 500
    assert sorted(r["doc_id"] for r in back.collect()) == list(range(500))
    # within every shard file, rows are stored in shard_key order
    import glob

    import pyarrow.parquet as pq
    for shard_dir in glob.glob(f"{out}/shard=*"):
        for f in glob.glob(f"{shard_dir}/*.parquet"):
            keys = pq.read_table(f, columns=["shard_key"])["shard_key"]
            keys = keys.to_pylist()
            assert keys == sorted(keys)


@pytest.mark.parametrize("url,want", [
    ("https://www.example.com/a?b=c", "example.com"),
    ("http://docs.example.com:8080/x", "example.com"),
    ("https://news.site.co.uk/p", "site.co.uk"),
    ("ftp://another.org", "another.org"),
    ("https://localhost/x", "localhost"),
    ("not a url", ""),
])
def test_extract_domain_cases(spark, url, want):
    df = spark.createDataFrame([(url,)], ["url"])
    got = df.select(extract_domain(F.col("url")).alias("d")).collect()[0]
    assert got["d"] == want


def test_blocklist_and_domain_stats(spark):
    rows = [(1, "https://a.example.com/x", "t1"),
            (2, "https://b.example.com/y", "tt2"),
            (3, "https://www.bad.net/z", "t3"),
            (4, "https://site.co.uk/w", "t4")]
    df = spark.createDataFrame(rows, ["doc_id", "url", "text"])
    kept = blocklist_filter(df, ["bad.net"])
    assert sorted(r["doc_id"] for r in kept.collect()) == [1, 2, 4]
    stats = {r["domain"]: r for r in domain_stats(kept).collect()}
    assert stats["example.com"]["n_docs"] == 2
    assert stats["example.com"]["n_hosts"] == 2
    assert stats["example.com"]["sum_chars"] == 5
    assert stats["site.co.uk"]["n_docs"] == 1
    # narrow until the aggregation: the COUNT(DISTINCT host) plans as
    # the standard two-phase distinct agg — exchange on (domain, host)
    # then on domain — and nothing else shuffles
    assert n_shuffles(plan_of(domain_stats(kept))) == 2
