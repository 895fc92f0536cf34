"""Conversation stats (sketchlib/convstats.py): pandas recount parity
on the synthetic transcripts, null-text and null-tool tolerance, plan
stays a single partial+final hash aggregation."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from sketchlib.convstats import conversation_stats
from sketchlib.synth import transcripts


@pytest.fixture(scope="module")
def tdf(spark):
    return transcripts(spark, 200, seed=5, partitions=8).cache()


def test_matches_pandas_recount(spark, tdf):
    got = (conversation_stats(tdf).toPandas()
           .sort_values("conv_id").reset_index(drop=True))
    pdf = tdf.toPandas()
    g = pdf.groupby("conv_id")
    import numpy as np
    want_words = g["text"].apply(
        lambda s: int(sum(len(str(t).split()) for t in s
                          if t is not None and str(t).strip())))
    assert got.set_index("conv_id")["n_words"].sort_index().tolist() == \
        want_words.sort_index().tolist()
    assert got.set_index("conv_id")["n_turns"].sort_index().tolist() == \
        g.size().sort_index().tolist()
    want_tools = g["tool"].nunique(dropna=True)
    assert got.set_index("conv_id")["n_distinct_tools"].sort_index()\
        .tolist() == want_tools.sort_index().tolist()
    dur = (g["ts"].max().dt.floor("s") - g["ts"].min().dt.floor("s"))
    assert got.set_index("conv_id")["duration_s"].sort_index().tolist() \
        == [int(d.total_seconds()) for d in dur.sort_index()]


def test_null_text_and_tool_rows_counted(spark):
    base = dt.datetime(2026, 1, 1)
    df = spark.createDataFrame(
        [("c1", 0, "user", "hi there", None, base),
         ("c1", 1, "tool", None, "tool_07", base + dt.timedelta(seconds=5)),
         ("c1", 2, "assistant", "  ", None, base + dt.timedelta(seconds=9))],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    row = conversation_stats(df).collect()[0]
    assert row["n_turns"] == 3          # null-text turn still counted
    assert row["n_tool_turns"] == 1
    assert row["n_distinct_tools"] == 1
    assert row["n_words"] == 2          # '', None contribute 0
    assert row["duration_s"] == 9


def test_plan_is_one_partial_final_agg(spark, tdf):
    import re
    df = conversation_stats(tdf)
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")
    assert "ArrowEvalPython" not in plan.split("MapInPandas")[-1] \
        and "BatchEvalPython" not in plan  # synth generator aside,
    # the stats themselves stay JVM-side; count_distinct adds its
    # dedup level, so the plan is exactly two exchanges — the
    # (conv_id, tool) distinct layer and the conv_id final — each fed
    # by a map-side partial HashAggregate
    exchanges = re.findall(r"[(](\d+)[)] Exchange", plan)
    assert len(exchanges) == 2
    first_agg = re.search(r"[(](\d+)[)] HashAggregate", plan)
    assert int(first_agg.group(1)) < int(exchanges[0])
