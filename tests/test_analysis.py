"""estimate_metrics vs pandas (reference output/analysis.py parity)."""

from __future__ import annotations

import numpy as np
import pandas as pd

from sketchlib.analysis import estimate_metrics


def test_metrics_match_pandas(spark):
    rng = np.random.default_rng(9)
    true = rng.integers(1, 500, 400)
    est = true + rng.integers(0, 30, 400)      # CM-style overestimates
    est[::50] = true[::50] - 1                  # inject violations
    pdf = pd.DataFrame({"true_count": true, "estimated_count": est})

    m = estimate_metrics(spark.createDataFrame(pdf))
    assert m["n"] == 400
    assert m["n_violations"] == int((true > est).sum()) == 8
    rmse = float(np.sqrt(((est - true) ** 2).mean()))
    assert abs(m["rmse"] - rmse) < 1e-9
    # pandas' spearman needs scipy (absent here): rank-then-pearson is
    # the definition, so compare against that directly
    rt = pdf["true_count"].rank(method="average")
    re_ = pdf["estimated_count"].rank(method="average")
    spearman = rt.corr(re_, method="pearson")
    assert abs(m["spearman"] - spearman) < 1e-9


def test_scalable_ranks_match_window_path(spark):
    """The distributed-rank path must reproduce the window path
    exactly — heavy ties + Zipf skew so range partitions are uneven
    and tie groups straddle values."""
    rng = np.random.default_rng(17)
    true = rng.zipf(1.5, 3000).clip(max=2000)   # skewed, many ties
    est = true + rng.integers(0, 5, 3000)
    pdf = pd.DataFrame({"true_count": true.astype(int),
                        "estimated_count": est.astype(int)})
    df = spark.createDataFrame(pdf).repartition(7)

    base = estimate_metrics(df)
    scal = estimate_metrics(df, scalable=True)
    assert scal["n"] == base["n"]
    assert scal["n_violations"] == base["n_violations"]
    assert abs(scal["rmse"] - base["rmse"]) < 1e-9
    assert abs(scal["spearman"] - base["spearman"]) < 1e-12

    # rank table itself: one row per distinct value, mean-tie ranks
    from sketchlib.analysis import avg_ranks
    rt = {r["t"]: r["rank"] for r in
          avg_ranks(df.selectExpr("cast(true_count as double) t"),
                    "t", n_ranges=5).collect()}
    expected = pd.Series(true).rank(method="average")
    for v, grp in pd.Series(true).groupby(pd.Series(true)):
        assert abs(rt[float(v)] - expected[grp.index].iloc[0]) < 1e-9


def test_metrics_on_reference_golden_query_csv(spark):
    """Run the metrics job on the committed golden query output — the
    same file the reference's analysis.py would consume."""
    import os
    fix = os.path.join(os.path.dirname(__file__), "fixtures",
                       "golden_occm_n4_w1024_q.csv")
    df = spark.read.option("header", True).csv(fix)
    m = estimate_metrics(df)
    assert m["n"] == 3361
    # truth-file semantics (N-containing k-mers never inserted) mean
    # violations exist vs this file — the documented reference gotcha
    assert m["n_violations"] > 0
    assert 0 < m["spearman"] <= 1


def test_null_and_unparseable_rows_are_dropped(spark):
    """A malformed/missing metric value must not poison RMSE (NaN) or
    crash the scalable rank path — both paths drop it and report the
    same n over the clean rows."""
    df = spark.createDataFrame(
        [("a", 5, 4), ("b", None, 2), ("c", 5, None), ("d", 2, 2)],
        "kmer string, true_count int, estimated_count int")
    for scalable in (False, True):
        m = estimate_metrics(df, scalable=scalable)
        assert m["n"] == 2
        assert m["n_violations"] == 1       # (5, 4): true > est
        assert m["rmse"] == m["rmse"]       # not NaN


def test_empty_and_nan_inputs_are_safe(spark):
    """Header-only CSV (zero clean rows) returns n=0 with None metrics
    instead of a TypeError; NaN values are dropped like nulls (they
    would poison RMSE and the scalable path's offset ordering)."""
    empty = spark.createDataFrame(
        [], "kmer string, true_count int, estimated_count int")
    for scalable in (False, True):
        m = estimate_metrics(empty, scalable=scalable)
        assert m == {"n": 0, "n_violations": 0,
                     "rmse": None, "spearman": None}

    df = spark.createDataFrame(
        [(1.0, 2.0), (float("nan"), 3.0), (4.0, float("nan")), (5.0, 4.0)],
        "true_count double, estimated_count double")
    for scalable in (False, True):
        m = estimate_metrics(df, scalable=scalable)
        assert m["n"] == 2
        assert m["n_violations"] == 1    # (5, 4)
        assert m["rmse"] == m["rmse"]    # not NaN
