"""Token-budget corpus selection (sketchlib/export.py
select_within_budget, round 3): greedy best-quality prefix under a
global token budget via a DISTRIBUTED prefix sum.

The value gate is the budget_select_docs strict oracle (SQL SUM OVER
prefix, green at both sfs); here: exact prefix semantics on a known
corpus, the budget edge cases, and the scale shape (no SinglePartition
window anywhere in the plan — the classic wrong way to cumsum).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from sketchlib.export import select_within_budget

from .conftest import plan_of


def _corpus(spark):
    # quality descends with id; 10 docs x 10 tokens each
    rows = [(i, 1.0 - i / 100.0, 10) for i in range(10)]
    return spark.createDataFrame(
        rows, "doc_id long, quality_score double, n_tokens long")


def test_exact_prefix(spark):
    got = select_within_budget(_corpus(spark), budget=35).collect()
    # 10+10+10 = 30 <= 35; adding the 4th doc (40) overflows
    assert [r["doc_id"] for r in got] == [0, 1, 2]
    assert [r["cum_tokens"] for r in got] == [10, 20, 30]


def test_budget_edges(spark):
    corpus = _corpus(spark)
    assert select_within_budget(corpus, budget=9).count() == 0
    assert select_within_budget(corpus, budget=10).count() == 1
    assert select_within_budget(corpus, budget=10_000).count() == 10


def test_ties_break_on_id(spark):
    rows = [(5, 0.5, 10), (1, 0.5, 10), (3, 0.5, 10), (2, 0.9, 10)]
    df = spark.createDataFrame(
        rows, "doc_id long, quality_score double, n_tokens long")
    got = select_within_budget(df, budget=30).collect()
    # 2 (q=.9) first, then ids ascending among the .5 ties
    assert [r["doc_id"] for r in sorted(got,
                                        key=lambda r: r["cum_tokens"])] \
        == [2, 1, 3]


def test_no_single_partition_window(spark):
    plan = plan_of(select_within_budget(_corpus(spark), budget=35,
                                        partitions=4))
    assert "SinglePartition" not in plan
    assert "Window" not in plan  # cumsum is numpy-per-partition, not a window