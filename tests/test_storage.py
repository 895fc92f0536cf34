"""Bucketed-layout plan proofs: storing a table hash-clustered on its
key must make the shuffle disappear from joins and aggregations on
that key — the write-once / join-many contract of
sketchlib/storage.py.
"""

from __future__ import annotations

import pytest

from sketchlib.storage import read_table, write_bucketed
from tests.conftest import n_shuffles as _shuffles, plan_of as _plan

SF = "/root/testdata/sf0.001"


@pytest.fixture()
def bucketed_docs(spark, tmp_path):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    write_bucketed(docs.select("doc_id", "lang", "n_chars"),
                   "b_docs", "doc_id", n_buckets=4,
                   path=str(tmp_path / "b_docs"))
    write_bucketed(docs.select("doc_id", "source"),
                   "b_quality", "doc_id", n_buckets=4,
                   path=str(tmp_path / "b_quality"))
    yield
    spark.sql("DROP TABLE IF EXISTS b_docs")
    spark.sql("DROP TABLE IF EXISTS b_quality")


def test_bucketed_join_has_no_shuffle(spark, bucketed_docs):
    a, b = read_table(spark, "b_docs"), read_table(spark, "b_quality")
    # large-side join on the bucket key: force the non-broadcast path
    # (the regime bucketing is for) and require zero shuffle exchanges
    joined = a.hint("merge").join(b, "doc_id")
    plan = _plan(joined)
    assert "SortMergeJoin" in plan
    assert _shuffles(plan) == 0, plan[:1200]

    # correctness: same rows as the unbucketed join
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    expected = (docs.select("doc_id", "lang", "n_chars")
                .join(docs.select("doc_id", "source"), "doc_id").count())
    assert joined.count() == expected


def test_bucketed_groupby_has_no_shuffle(spark, bucketed_docs):
    from pyspark.sql import functions as F
    agg = (read_table(spark, "b_docs")
           .groupBy("doc_id").agg(F.sum("n_chars").alias("s")))
    plan = _plan(agg)
    assert _shuffles(plan) == 0, plan[:1200]
    assert agg.count() == spark.read.parquet(
        f"{SF}/documents.parquet").select("doc_id").distinct().count()


def test_unbucketed_join_does_shuffle(spark, bucketed_docs):
    """Control: the same merge join WITHOUT the bucketed layout plans
    a hash-repartition exchange — i.e. the test above is detecting the
    layout, not a quirk of the data size."""
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    j = (docs.select("doc_id", "lang").hint("merge")
         .join(docs.select("doc_id", "source"), "doc_id"))
    assert _shuffles(_plan(j)) == 2  # one per join side
