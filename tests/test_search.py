"""BM25 top-k corpus retrieval (sketchlib/search.py, round 3).

The value gate is the DuckDB oracle (bm25_topk_docs, strict at both
sfs); here: a hand-checked tiny corpus, the monotonicity contract, and
the plan shape (TakeOrdered cut, no UDFs, tf filter before its agg).
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from sketchlib.search import bm25_scores, bm25_topk

from .conftest import plan_of

DOCS = [
    (0, "spark shuffles data across the cluster"),
    (1, "spark spark spark tuning guide"),
    (2, "a long document about gardens and flowers and trees " * 5),
    (3, "cluster management notes"),
]


def _bm25_ref(term_counts, dl, n, avgdl, dfts, k1=1.2, b=0.75):
    s = 0.0
    for t, tfc in term_counts.items():
        idf = math.log(1 + (n - dfts[t] + 0.5) / (dfts[t] + 0.5))
        s += idf * tfc * (k1 + 1) / (tfc + k1 * (1 - b + b * dl / avgdl))
    return s


def test_bm25_matches_hand_computation(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: r["score"]
           for r in bm25_scores(docs, ["spark", "cluster"]).collect()}
    lens = {i: len(t.lower().split()) for i, t in DOCS}
    n, avgdl = 4, sum(lens.values()) / 4
    dfts = {"spark": 2, "cluster": 2}
    exp = {
        0: _bm25_ref({"spark": 1, "cluster": 1}, lens[0], n, avgdl, dfts),
        1: _bm25_ref({"spark": 3}, lens[1], n, avgdl, dfts),
        3: _bm25_ref({"cluster": 1}, lens[3], n, avgdl, dfts),
    }
    assert set(got) == set(exp)  # doc 2 matches nothing => absent
    for i, v in exp.items():
        assert got[i] == pytest.approx(v, rel=1e-12), i


def test_bm25_topk_orders_and_cuts(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    top = bm25_topk(docs, ["spark", "cluster"], k=2).collect()
    assert len(top) == 2
    assert top[0]["score"] >= top[1]["score"]
    # tf saturation: doc 0 matching BOTH terms once outranks doc 1
    # repeating one term 3x (k1 bounds the repeated-term payoff)
    assert [r["doc_id"] for r in top] == [0, 1]


def test_bm25_plan_shape(spark):
    docs = spark.createDataFrame(DOCS, "doc_id long, text string")
    plan = plan_of(bm25_topk(docs, ["spark"], k=5))
    assert "TakeOrderedAndProject" in plan
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
    # the tf leg filters to the query terms before aggregating: the
    # filter shows up as a pushed predicate on token IN (...)
    assert "spark" in plan
