"""DSIR importance resampling (sketchlib/dsir.py).

Properties tested (Xie et al., NeurIPS 2023, hashed n-gram form):
- featurization multiplicity (one row per uni+bigram occurrence);
- the fitted log-ratio really is the two add-one-smoothed models'
  difference (checked vs a pure-python reimplementation);
- selection is deterministic, partitioning-invariant, and exactly k;
- documents resembling the target corpus receive higher importance
  weight than off-target documents (the point of the method).
"""

import math

import pytest
from pyspark.sql import functions as F

from sketchlib.dsir import (_log_ratio, dsir_select, importance_scores,
                            ngram_buckets)

TARGET = [("t%d" % i, "the quick brown fox jumps over the lazy dog")
          for i in range(8)]
ON = [("on%d" % i, "quick brown fox and the lazy dog sleep") for i in range(6)]
OFF = [("off%d" % i, "zzz qqq xxx vvv kkk www yyy uuu nnn mmm")
       for i in range(6)]


@pytest.fixture(scope="module")
def corpora(spark):
    raw = spark.createDataFrame(ON + OFF, ["doc_id", "text"])
    target = spark.createDataFrame(TARGET, ["doc_id", "text"])
    return raw, target


def test_ngram_multiplicity(spark):
    df = spark.createDataFrame([("a", "x y x")], ["doc_id", "text"])
    feat = ngram_buckets(df, n_buckets=1 << 20)
    # 3 unigrams + 2 bigrams, multiplicity kept
    assert feat.count() == 5
    # repeated unigram 'x' maps to one bucket twice
    assert feat.groupBy("bucket").count().filter("count >= 2").count() >= 1


def test_log_ratio_matches_pure_python(spark, corpora):
    raw, target = corpora
    B = 64
    lr = _log_ratio(ngram_buckets(target, n_buckets=B),
                    ngram_buckets(raw, n_buckets=B), B)
    # reimplement from the collected feature streams
    tb = [r["bucket"] for r in ngram_buckets(target, n_buckets=B).collect()]
    rb = [r["bucket"] for r in ngram_buckets(raw, n_buckets=B).collect()]
    for b in range(B):
        want = (math.log((tb.count(b) + 1.0) / (len(tb) + B))
                - math.log((rb.count(b) + 1.0) / (len(rb) + B)))
        assert lr[b] == pytest.approx(want, abs=1e-12)


def test_on_target_docs_score_higher(spark, corpora):
    raw, target = corpora
    s = {r["doc_id"]: r["logw"]
         for r in importance_scores(raw, target, n_buckets=256).collect()}
    assert min(s[d] for d, _ in ON) > max(s[d] for d, _ in OFF)


def test_select_k_deterministic_and_partition_invariant(spark, corpora):
    raw, target = corpora
    a = sorted(r["doc_id"]
               for r in dsir_select(raw, target, 5, n_buckets=256).collect())
    b = sorted(r["doc_id"] for r in dsir_select(
        raw.repartition(7), target.repartition(3), 5,
        n_buckets=256).collect())
    assert len(a) == 5 and a == b


def test_select_prefers_on_target(spark, corpora):
    raw, target = corpora
    # top-k by weight without Gumbel noise: pure preference order
    sel = dsir_select(raw, target, 6, n_buckets=256, gumbel=False)
    ids = {r["doc_id"] for r in sel.collect()}
    assert ids == {d for d, _ in ON}


def test_lm_scores_rank_typical_above_gibberish(spark):
    from sketchlib.dsir import lm_scores
    typical = [("t%d" % i, "the quick brown fox jumps over the lazy dog")
               for i in range(20)]
    odd = [("g", "zq xv jk wq pz lr mn bt")]
    df = spark.createDataFrame(typical + odd, ["doc_id", "text"])
    s = {r["doc_id"]: r["lm_score"] for r in lm_scores(df).collect()}
    assert all(s["t%d" % i] > s["g"] for i in range(20))
    # n_grams = unigrams + bigrams
    n = {r["doc_id"]: r["n_grams"] for r in lm_scores(df).collect()}
    assert n["g"] == 8 + 7
