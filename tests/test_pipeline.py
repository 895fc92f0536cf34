"""Composed curation pipeline (sketchlib/pipeline.py).

Stage semantics on a corpus with planted defects: exact duplicates,
benchmark-contaminated docs, and low-quality docs must each be gone
from the final manifest; survivors must pack into full windows.
"""

import pytest
from pyspark.sql import functions as F

from sketchlib.pipeline import curate, exact_dedup_keep, quality_keep

GOOD = "the quick brown fox jumps over the lazy dog near the old river"
BENCH = "alpha beta gamma delta epsilon zeta eta theta iota kappa"


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        ("a1", "en", GOOD + " one"),
        ("a2", "en", GOOD + " two"),
        ("dup", "en", GOOD + " one"),          # exact dup of a1
        ("contam", "en", BENCH + " tail"),     # shares >=5 3-grams
        ("junk", "en", "!!! ??? ... ---"),     # fails alnum majority
        ("short", "en", "hi"),                 # fails min tokens
        ("b1", "de", GOOD + " drei und so"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "lang", "text"])
    bench = spark.createDataFrame([("x", BENCH)], ["doc_id", "text"])
    return docs, bench


def test_exact_dedup_keeps_min_id(spark, corpus):
    docs, _ = corpus
    kept = {r["doc_id"] for r in exact_dedup_keep(docs).collect()}
    assert "a1" in kept and "dup" not in kept  # 'a1' < 'dup'


def test_quality_keep_integer_predicates(spark, corpus):
    docs, _ = corpus
    kept = {r["doc_id"] for r in quality_keep(docs).collect()}
    assert "junk" not in kept and "short" not in kept
    assert "a1" in kept and "contam" in kept


def test_curate_end_to_end(spark, corpus):
    docs, bench = corpus
    m = curate(docs, bench, k=10, max_len=5, min_overlap=5).collect()
    ids = {r["doc_id"] for r in m}
    assert ids == {"a1", "a2", "b1"}  # dup/contam/junk/short all gone
    per_seq = {}
    for r in m:
        per_seq[r["seq_id"]] = (per_seq.get(r["seq_id"], 0)
                                + r["tok_to"] - r["tok_from"])
    last = max(per_seq)
    assert all(v == 5 for s, v in per_seq.items() if s != last)


def test_curate_respects_k(spark, corpus):
    docs, bench = corpus
    m = curate(docs, bench, k=1, max_len=100, min_overlap=5)
    assert m.select("doc_id").distinct().count() == 1


def test_quality_keep_is_unicode_aware(spark):
    """Non-Latin scripts must pass the alnum-majority test: the class
    is Unicode \\p{L}\\p{N}, not ASCII [a-z0-9] (an ASCII class would
    silently drop every Cyrillic/CJK doc before the mixture sample)."""
    rows = [
        ("ru", "привет мир как дела сегодня вечером"),
        ("zh", "你好 世界 这是 一个 测试 文档"),
        ("junk", "!!! ??? ... --- ***"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    kept = {r["doc_id"] for r in quality_keep(docs, min_tokens=5).collect()}
    assert kept == {"ru", "zh"}
