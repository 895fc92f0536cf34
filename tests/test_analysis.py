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
