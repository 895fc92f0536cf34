"""Drift-monitor queries: CM snapshot drift and KLL two-sample KS.

Both are exact-regime gated here against the in-Spark exact
computation at sf0.001; the cross-engine DuckDB check lives in
tools/compare_oracle.py (both queries are strict entries there).
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

import __spark_entry__ as E

SF = "/root/testdata/sf0.001"


def test_cm_drift_matches_exact_conditional_counts(spark):
    got = {r["key"]: (r["cnt_old"], r["cnt_new"], r["delta"])
           for r in E.q_cm_drift_user_freq(spark, SF).collect()}
    ev = spark.read.parquet(f"{SF}/events.parquet")
    exact = (ev.groupBy("user_id")
             .agg(F.sum(F.when(F.dayofmonth("ts") <= 15, 1)
                        .otherwise(0)).alias("old"),
                  F.sum(F.when(F.dayofmonth("ts") > 15, 1)
                        .otherwise(0)).alias("new"))
             .collect())
    want = {r["user_id"]: (r["old"], r["new"], r["new"] - r["old"])
            for r in exact if abs(r["new"] - r["old"]) >= 3}
    assert got == want


def test_kll_ks_drift_matches_empirical_ks(spark):
    got = {r["lang"]: r["ks"]
           for r in E.q_kll_ks_drift_langs(spark, SF).collect()}
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    pdf = docs.select("lang", F.length("text").alias("v")).toPandas()
    base = np.sort(pdf[pdf.lang == "en"].v.to_numpy().astype(float))
    assert len(got) >= 1
    for lang, ks in got.items():
        other = np.sort(pdf[pdf.lang == lang].v.to_numpy().astype(float))
        pts = np.union1d(base, other)
        fa = np.searchsorted(base, pts, side="right") / base.size
        fb = np.searchsorted(other, pts, side="right") / other.size
        exact = float(np.abs(fa - fb).max())
        assert ks == pytest.approx(np.floor(exact * 1e6) / 1e6, abs=0)
