"""Time-decayed frequency (sketchlib/decay.py).

Gates: integer halving weights match a pandas recount exactly at
collision-free width; merge/partitioning invariance; clamping at both
ends; the weighted build path (aggregate.build_sketch weight_col)
equals a driver-side weighted CM.
"""

import datetime as dt

import numpy as np
import pandas as pd
import pytest
from pyspark.sql import functions as F

from sketchlib.decay import decayed_frequency, decay_weight_col
from sketchlib.sketches.cm import CMConfig, CountMin


@pytest.fixture(scope="module")
def ev(spark):
    base = dt.datetime(2026, 3, 1, 0, 0, 0)
    rows = []
    rng = np.random.default_rng(3)
    for i in range(4000):
        key = f"k{int(rng.integers(0, 50)):02d}"
        age_h = int(rng.integers(0, 24 * 40))  # up to 40 days old
        rows.append((key, base - dt.timedelta(hours=age_h)))
    return spark.createDataFrame(rows, "key string, ts timestamp").cache()


def exact_decayed(pdf: pd.DataFrame, landmark, half_life_s, max_buckets=8):
    age = (landmark - pdf["ts"]).dt.total_seconds()
    bucket = np.clip(np.floor(age / half_life_s).astype(int),
                     0, max_buckets)
    w = np.right_shift(1 << max_buckets, bucket.to_numpy())
    return pd.Series(w).groupby(pdf["key"]).sum()


def test_decayed_matches_exact_recount(spark, ev):
    hl = 7 * 86400
    got = (decayed_frequency(spark, ev, "key", "ts", hl,
                             CMConfig(16, 5, 137, True))
           .toPandas().set_index("key")["decayed_count_scaled"]
           .sort_index())
    pdf = ev.toPandas()
    landmark = pdf["ts"].max()
    want = exact_decayed(pdf, landmark, hl).sort_index()
    assert got.to_numpy().tolist() == want.to_numpy().tolist()


def test_partitioning_invariant(spark, ev):
    hl = 7 * 86400
    a = (decayed_frequency(spark, ev.repartition(1), "key", "ts", hl,
                           CMConfig(16, 5, 137, True)).toPandas()
         .sort_values("key").reset_index(drop=True))
    b = (decayed_frequency(spark, ev.repartition(17), "key", "ts", hl,
                           CMConfig(16, 5, 137, True)).toPandas()
         .sort_values("key").reset_index(drop=True))
    assert a.equals(b)


def test_weight_clamps(spark):
    base = dt.datetime(2026, 3, 1)
    df = spark.createDataFrame(
        [(base + dt.timedelta(days=1),),   # future => bucket 0
         (base,),                          # fresh => 256
         (base - dt.timedelta(days=365),)  # ancient => 1
         ], "ts timestamp")
    got = [r[0] for r in
           df.select(decay_weight_col("ts", base, 7 * 86400)).collect()]
    assert got == [256, 256, 1]


def test_weighted_build_equals_driver_weighted_cm(spark, ev):
    from functools import partial

    from sketchlib.aggregate import build_sketch
    cfg = CMConfig(12, 5, 137, True)
    hashed = ev.select(F.xxhash64("key").alias("kh"),
                       F.lit(3).alias("w"))
    sk = build_sketch(hashed, "kh", partial(CountMin, cfg),
                      pre_aggregate=True, weight_col="w")
    pdf = hashed.toPandas()
    ref = CountMin(cfg)
    g = pdf.groupby("kh")["w"].sum()
    ref.update_weighted(g.index.to_numpy().astype(np.uint64),
                        g.to_numpy().astype(np.int64))
    ks = g.index.to_numpy().astype(np.uint64)
    assert np.array_equal(sk.estimate(ks), ref.estimate(ks))


def test_weight_col_requires_pre_aggregate(spark, ev):
    from functools import partial

    from sketchlib.aggregate import build_sketch
    with pytest.raises(ValueError):
        build_sketch(ev.select(F.xxhash64("key").alias("kh"),
                               F.lit(1).alias("w")),
                     "kh", partial(CountMin, CMConfig(8, 3, 1, True)),
                     weight_col="w")


def test_decayed_top_k_exact_regime(spark, ev):
    from sketchlib.decay import decayed_top_k
    hl = 7 * 86400
    got = decayed_top_k(spark, ev, "key", "ts", hl, k=10,
                        summary_k=1 << 12).toPandas()
    pdf = ev.toPandas()
    want = (exact_decayed(pdf, pdf["ts"].max(), hl)
            .rename("w").reset_index()
            .sort_values(["w", "key"], ascending=[False, True])
            .head(10).reset_index(drop=True))
    assert got["key"].tolist() == want["key"].tolist()
    assert got["decayed_count_scaled"].tolist() == want["w"].tolist()
    assert got["rk"].tolist() == list(range(1, 11))


def test_grouped_weighted_build_matches_recount(spark, ev):
    """weight_col through the salted grouped path: per-group MG in the
    exact regime equals a pandas weighted recount."""
    from functools import partial

    from pyspark.sql import functions as F

    from sketchlib.aggregate import build_grouped_sketches
    from sketchlib.sketches.base import deserialize
    from sketchlib.sketches.mg import MisraGries

    grp = ev.withColumn("g", (F.xxhash64("key") % 3).cast("int"))
    src = grp.select("g", F.xxhash64("key").alias("kh"),
                     F.lit(5).alias("w"))
    grouped = build_grouped_sketches(src, ["g"], "kh",
                                     partial(MisraGries, 1 << 10),
                                     salt_buckets=4, pre_aggregate=True,
                                     weight_col="w").collect()
    pdf = src.toPandas()
    for row in grouped:
        sk = deserialize(bytes(row["sketch"]))
        import numpy as np
        vals, counts = sk.items()
        want = pdf[pdf["g"] == row["g"]].groupby("kh")["w"].sum()
        got = dict(zip(vals.view(np.int64), counts))
        assert got == {int(k): int(v) for k, v in want.items()}


def test_grouped_weight_col_requires_pre_aggregate(spark, ev):
    from functools import partial

    from pyspark.sql import functions as F

    from sketchlib.aggregate import build_grouped_sketches
    from sketchlib.sketches.mg import MisraGries
    import pytest as _pt
    with _pt.raises(ValueError):
        build_grouped_sketches(
            ev.select(F.lit("g").alias("g"),
                      F.xxhash64("key").alias("kh"),
                      F.lit(1).alias("w")),
            ["g"], "kh", partial(MisraGries, 8), weight_col="w")


def test_null_ts_rows_contribute_nothing(spark):
    """NULL ts => NULL weight => the row is dropped from the weighted
    build instead of reaching the kernel as NaN; a key whose EVERY row
    has NULL ts is dropped from the probe too (round-3 oracle-semantics
    fix: the DuckDB SUM(weight) GROUP BY oracle yields no row for such
    keys, so 'absent', not 'present with 0', is the gate-consistent
    output)."""
    import datetime as _dt
    base = _dt.datetime(2026, 3, 1)
    df = spark.createDataFrame(
        [("a", base), ("a", None), ("b", None)],
        "key string, ts timestamp")
    got = (decayed_frequency(spark, df, "key", "ts", 7 * 86400,
                             CMConfig(10, 3, 137, True), landmark=base)
           .toPandas().set_index("key")["decayed_count_scaled"])
    assert got["a"] == 256        # the one live row
    assert "b" not in got.index   # all-NULL key: dropped like the oracle


def test_huge_age_ratio_still_minimum_weight(spark):
    """floor(age/half_life) >= 2^31 must clamp to the minimum weight,
    not wrap negative and get FULL weight."""
    import datetime as _dt
    landmark = _dt.datetime(2200, 1, 1)
    df = spark.createDataFrame(
        [(_dt.datetime(1970, 1, 2),)], "ts timestamp")
    got = df.select(decay_weight_col("ts", landmark, 1).alias("w")) \
            .collect()[0]["w"]
    assert got == 1
