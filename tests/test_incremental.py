"""Incremental sketch-table maintenance: refresh == full rebuild.

The invariant under test is the associative-merge identity
``sketch(old ∪ delta) == merge(sketch(old), sketch(delta))`` carried
through the Icebergish snapshot machinery: blobs after an incremental
refresh must be BIT-IDENTICAL to a from-scratch build over the whole
table (order-independent sketches), and the watermark/overwrite
bookkeeping must never double-count or silently miss data.
"""

from __future__ import annotations

from functools import partial

import pytest
from pyspark.sql import functions as F

from sketchlib.aggregate import build_grouped_sketches_multi
from sketchlib.iceberg import IcebergishCatalog
from sketchlib.incremental import (load_sketch_table, probe_grouped,
                                   refresh_sketch_table)
from sketchlib.sketches.base import deserialize
from sketchlib.sketches.cm import CMConfig, CountMin
from sketchlib.sketches.hll import HyperLogLog
from sketchlib.synth import transcripts
from sketchlib.tokenize import word_tokens


FACTORIES = {
    "cm": partial(CountMin, CMConfig(np_bits=12, nh=3, seed=137,
                                     conservative=False)),
    "hll": partial(HyperLogLog, 12),
}


def _prep(df):
    return (word_tokens(df, extra_cols=("role",))
            .withColumn("token_u64", F.xxhash64("token")))


def _blob_map(df) -> dict:
    return {(r["role"], r["name"]): bytes(r["sketch"])
            for r in df.collect()}


def test_incremental_refresh_equals_full_rebuild(spark, tmp_path):
    cat = IcebergishCatalog(str(tmp_path / "wh"))
    t1 = transcripts(spark, 30, seed=21, partitions=3)
    t2 = transcripts(spark, 25, seed=22, partitions=2)

    cat.append("tr", t1)
    r1 = refresh_sketch_table(
        spark, cat, "tr", "tr_sketches", ["role"], "token_u64",
        FACTORIES, prepare=_prep)
    assert r1["mode"] == "initial"

    cat.append("tr", t2)
    r2 = refresh_sketch_table(
        spark, cat, "tr", "tr_sketches", ["role"], "token_u64",
        FACTORIES, prepare=_prep)
    assert r2["mode"] == "incremental"
    assert r2["source_snapshot"] == cat.current_snapshot("tr")

    incremental = _blob_map(cat.load_table(spark, "tr_sketches"))
    full = _blob_map(build_grouped_sketches_multi(
        _prep(cat.load_table(spark, "tr")), ["role"], "token_u64",
        FACTORIES))
    assert incremental.keys() == full.keys()
    for k in full:
        assert incremental[k] == full[k], f"blob mismatch for {k}"

    # blob round-trip stability backs the untouched-group passthrough
    for b in full.values():
        assert deserialize(b).to_bytes() == b


def test_refresh_is_noop_without_new_snapshots(spark, tmp_path):
    cat = IcebergishCatalog(str(tmp_path / "wh"))
    cat.append("tr", transcripts(spark, 10, seed=5, partitions=2))
    refresh_sketch_table(spark, cat, "tr", "sk", ["role"], "token_u64",
                         FACTORIES, prepare=_prep)
    before = cat.current_snapshot("sk")
    r = refresh_sketch_table(spark, cat, "tr", "sk", ["role"],
                             "token_u64", FACTORIES, prepare=_prep)
    assert r["mode"] == "noop"
    assert cat.current_snapshot("sk") == before


def test_source_overwrite_triggers_full_rebuild(spark, tmp_path):
    cat = IcebergishCatalog(str(tmp_path / "wh"))
    cat.append("tr", transcripts(spark, 20, seed=7, partitions=2))
    refresh_sketch_table(spark, cat, "tr", "sk", ["role"], "token_u64",
                         FACTORIES, prepare=_prep)

    replacement = transcripts(spark, 15, seed=8, partitions=2)
    cat.overwrite("tr", replacement)
    r = refresh_sketch_table(spark, cat, "tr", "sk", ["role"],
                             "token_u64", FACTORIES, prepare=_prep)
    assert r["mode"] == "rebuild"

    rebuilt = _blob_map(cat.load_table(spark, "sk"))
    full = _blob_map(build_grouped_sketches_multi(
        _prep(replacement), ["role"], "token_u64", FACTORIES))
    assert rebuilt == full


def test_incremental_scan_rejects_overwrite_range(spark, tmp_path):
    cat = IcebergishCatalog(str(tmp_path / "wh"))
    s1 = cat.append("t", transcripts(spark, 8, seed=1, partitions=1))
    cat.overwrite("t", transcripts(spark, 8, seed=2, partitions=1))
    with pytest.raises(ValueError, match="not append-only"):
        cat.load_incremental(spark, "t", s1)


def test_probe_grouped_exact_at_collision_free_width(spark, tmp_path):
    """CM at collision-free width => per-(role, token) estimates equal
    exact counts, via the distributed cogroup probe (no driver-side
    blob collection)."""
    cat = IcebergishCatalog(str(tmp_path / "wh"))
    # collision-free regime: ~2k distinct tokens per role vs w=2^18
    # cells x 5 rows => P(some key collides in every row) ~ 1e-7
    wide = {"cm": partial(CountMin, CMConfig(np_bits=18, nh=5, seed=137,
                                             conservative=False))}
    t1 = transcripts(spark, 15, seed=31, partitions=2)
    t2 = transcripts(spark, 10, seed=32, partitions=2)
    cat.append("tr", t1)
    refresh_sketch_table(spark, cat, "tr", "sk", ["role"], "token_u64",
                         wide, prepare=_prep)
    cat.append("tr", t2)
    refresh_sketch_table(spark, cat, "tr", "sk", ["role"], "token_u64",
                         wide, prepare=_prep)

    toks = _prep(cat.load_table(spark, "tr"))
    probes = toks.select("role", "token", "token_u64").distinct()
    sk_df = load_sketch_table(spark, cat, "sk", name="cm")
    est = probe_grouped(probes, sk_df, ["role"], "token_u64")

    exact = toks.groupBy("role", "token").count()
    joined = est.join(exact, ["role", "token"])
    bad = joined.filter(F.col("est_count") != F.col("count")).count()
    assert bad == 0
    assert est.count() == exact.count()
