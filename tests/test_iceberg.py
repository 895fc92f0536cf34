"""Iceberg-style catalog adapter: snapshot commits, time travel, and
sketch builds against snapshot-scoped reads."""

from __future__ import annotations

import json
import os
from functools import partial

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.aggregate import build_sketch
from sketchlib.iceberg import IcebergishCatalog
from sketchlib.offline import build_offline_from_table
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


def test_snapshot_pinned_resume_ignores_appends(spark, tmp_path):
    """A resumed multi-pass build must read the snapshot it STARTED
    from, not the table's current snapshot: the collision table from
    the completed passes is only meaningful against that data."""
    cat = IcebergishCatalog(str(tmp_path / "wh"))
    s1 = cat.append("tr", transcripts(spark, 25, seed=11, partitions=2))
    cfg = CMConfig(np_bits=9, nh=3, seed=5, conservative=True)
    rounds = 2

    # uninterrupted reference build over snapshot s1
    ref_dir = str(tmp_path / "ckpt_ref")
    ref, used = build_offline_from_table(
        spark, cat, "tr", cfg, rounds, checkpoint_dir=ref_dir,
        local_threshold=0)
    assert used == s1

    # interrupted build: keep only the first committed pass
    cut_dir = str(tmp_path / "ckpt_cut")
    import shutil
    shutil.copytree(ref_dir, cut_dir)
    with open(os.path.join(cut_dir, "manifest.json")) as fh:
        m = json.load(fh)
    assert len(m["snapshots"]) == rounds  # occm: one pass per round
    m["snapshots"] = m["snapshots"][:1]
    with open(os.path.join(cut_dir, "manifest.json"), "w") as fh:
        json.dump(m, fh)

    # the table advances between interruption and resume
    s2 = cat.append("tr", transcripts(spark, 25, seed=12, partitions=2))
    assert cat.current_snapshot("tr") == s2

    resumed, used2 = build_offline_from_table(
        spark, cat, "tr", cfg, rounds, checkpoint_dir=cut_dir,
        local_threshold=0)
    assert used2 == s1  # pinned, not current
    np.testing.assert_array_equal(ref.core, resumed.core)
    np.testing.assert_array_equal(ref.collision, resumed.collision)

    # an explicit conflicting snapshot against an existing pin refuses
    with pytest.raises(ValueError, match="pins input snapshot"):
        build_offline_from_table(spark, cat, "tr", cfg, rounds,
                                 checkpoint_dir=cut_dir, snapshot_id=s2)

    # a fresh (unpinned) build over the grown table sees both appends
    sk2, used3 = build_offline_from_table(
        spark, cat, "tr", cfg, rounds,
        checkpoint_dir=str(tmp_path / "ckpt_new"), local_threshold=0)
    assert used3 == s2
    assert int(sk2.core.sum()) > int(ref.core.sum())


def test_resume_checkpoint_snapshot_mismatch_raises(spark, tmp_path):
    """Checkpoints record the input snapshot; build_offline refuses to
    splice passes built from different inputs."""
    cat = IcebergishCatalog(str(tmp_path / "wh"))
    s1 = cat.append("tr", transcripts(spark, 20, seed=3, partitions=2))
    cfg = CMConfig(np_bits=8, nh=3, seed=9, conservative=True)
    ckpt = str(tmp_path / "ckpt")
    build_offline_from_table(spark, cat, "tr", cfg, 2,
                             checkpoint_dir=ckpt, local_threshold=0)

    # sabotage the pin (simulates a store written by an older job
    # against different data) and resume: the per-snapshot record
    # still carries s1, so the splice is refused
    from sketchlib.checkpoint_io import CheckpointStore
    s2 = cat.append("tr", transcripts(spark, 20, seed=4, partitions=2))
    store = CheckpointStore(ckpt)
    pin_key = [k for k in store._read_manifest()["pins"]][0]
    store.set_pin(pin_key, s2)
    with pytest.raises(ValueError, match="built from input snapshot"):
        build_offline_from_table(spark, cat, "tr", cfg, 2,
                                 checkpoint_dir=ckpt, local_threshold=0)


def test_overwrite_drops_previous_files(spark, tmp_path):
    cat = IcebergishCatalog(str(tmp_path / "wh"))
    a = spark.range(10).withColumn("v", F.lit("a"))
    b = spark.range(5).withColumn("v", F.lit("b"))
    cat.append("t", a)
    cat.overwrite("t", b)
    cur = cat.load_table(spark, "t")
    assert cur.count() == 5
    assert cur.select("v").distinct().collect()[0][0] == "b"


def test_bad_snapshot_id_does_not_poison_checkpoint_dir(spark, tmp_path):
    """A typo'd --snapshot must fail BEFORE being pinned: pinning it
    would wedge the checkpoint dir (every later run resolves the bogus
    pin; the correct id then trips the pin-conflict check)."""
    cat = IcebergishCatalog(str(tmp_path / "wh"))
    s1 = cat.append("tr", transcripts(spark, 15, seed=7, partitions=2))
    cfg = CMConfig(np_bits=8, nh=3, seed=1, conservative=True)
    ckpt = str(tmp_path / "ckpt")
    with pytest.raises(FileNotFoundError):
        build_offline_from_table(spark, cat, "tr", cfg, 2,
                                 checkpoint_dir=ckpt,
                                 snapshot_id="snap-no-such",
                                 local_threshold=0)
    # the dir is still usable: the next run pins the real snapshot
    sk, used = build_offline_from_table(spark, cat, "tr", cfg, 2,
                                        checkpoint_dir=ckpt,
                                        local_threshold=0)
    assert used == s1
    assert int(sk.core.sum()) > 0


def test_fully_checkpointed_resume_runs_no_input_scan(spark, tmp_path):
    """A resume whose every pass is already committed must not touch
    the input: feed it a DataFrame that raises on evaluation and
    assert the build still returns the checkpointed sketch."""
    import pandas as pd

    from sketchlib.offline import build_offline
    from sketchlib.tokenize import transcript_tokens

    toks = transcript_tokens(transcripts(spark, 15, seed=8, partitions=2))
    cfg = CMConfig(np_bits=8, nh=3, seed=2, conservative=True)
    ckpt = str(tmp_path / "ckpt")
    full = build_offline(toks, "token_u64", cfg, 2, checkpoint_dir=ckpt,
                         pre_aggregate=True, input_snapshot="s1")

    def boom(batches):
        raise RuntimeError("input was scanned during a complete resume")
        yield  # pragma: no cover

    poisoned = (spark.range(10)
                .selectExpr("id AS token_u64")
                .mapInPandas(boom, schema="token_u64 long"))
    resumed = build_offline(poisoned, "token_u64", cfg, 2,
                            checkpoint_dir=ckpt, pre_aggregate=True,
                            input_snapshot="s1")
    np.testing.assert_array_equal(full.core, resumed.core)
    np.testing.assert_array_equal(full.collision, resumed.collision)
