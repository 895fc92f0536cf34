"""Iceberg-style catalog adapter: snapshot commits, time travel, and
sketch builds against snapshot-scoped reads."""

from __future__ import annotations

from functools import partial

from pyspark.sql import functions as F

from sketchlib.aggregate import build_sketch
from sketchlib.iceberg import IcebergishCatalog
from sketchlib.sketches.cm import CMConfig, CountMin
from sketchlib.synth import transcripts
from sketchlib.tokenize import transcript_tokens


def test_append_time_travel_and_sketch_build(spark, tmp_path):
    cat = IcebergishCatalog(str(tmp_path / "warehouse"))
    t1 = transcripts(spark, 30, seed=1, partitions=2)
    t2 = transcripts(spark, 30, seed=2, partitions=2)

    s1 = cat.append("transcripts", t1)
    s2 = cat.append("transcripts", t2)
    assert cat.snapshots("transcripts") == [s1, s2]
    assert cat.current_snapshot("transcripts") == s2

    n1 = t1.count()
    n2 = t2.count()
    # time travel: snapshot s1 sees only the first append
    assert cat.load_table(spark, "transcripts", s1).count() == n1
    assert cat.load_table(spark, "transcripts").count() == n1 + n2

    # sketch built from a snapshot read equals one built from the raw df
    cfg = CMConfig(np_bits=14, nh=3, seed=7, conservative=False)
    from_snap = build_sketch(
        transcript_tokens(cat.load_table(spark, "transcripts", s1)),
        "token_u64", partial(CountMin, cfg), pre_aggregate=True)
    from_raw = build_sketch(transcript_tokens(t1), "token_u64",
                            partial(CountMin, cfg), pre_aggregate=True)
    assert (from_snap.core == from_raw.core).all()


def test_overwrite_drops_previous_files(spark, tmp_path):
    cat = IcebergishCatalog(str(tmp_path / "wh"))
    a = spark.range(10).withColumn("v", F.lit("a"))
    b = spark.range(5).withColumn("v", F.lit("b"))
    cat.append("t", a)
    cat.overwrite("t", b)
    cur = cat.load_table(spark, "t")
    assert cur.count() == 5
    assert cur.select("v").distinct().collect()[0][0] == "b"
