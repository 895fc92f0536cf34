"""Distributed offline OCM/OCCM builds + checkpoint/resume lineage."""

from __future__ import annotations

import json
import os

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.offline import build_offline
from sketchlib.sketches.cm import CMConfig, OfflineCountMin
from sketchlib.synth import transcripts
from sketchlib.tokenize import transcript_tokens

ROUNDS = 3


@pytest.fixture(scope="module")
def tokens(spark):
    df = transcripts(spark, 200, seed=11, partitions=5)
    t = transcript_tokens(df).cache()
    t.count()
    return t


@pytest.fixture(scope="module")
def vals(tokens):
    return (tokens.select("token_u64").toPandas()["token_u64"]
            .to_numpy().view(np.uint64))


def _sim_plain_ocm(vals, cfg, rounds):
    """Driver-side frozen-state simulation of the distributed plain-OCM
    semantics (collision marking against frozen previous-round state)."""
    sim = OfflineCountMin(cfg)
    for r in range(rounds):
        if r > 0:
            flags = sim.mark_collisions_batch(vals, r, sim.core, sim.collision)
            sim.collision = np.maximum(
                sim.collision, np.where(flags, np.int32(r - 1), np.int32(0)))
        sim.clear_core()
        sim.update_count_batch(vals)
    return sim


def test_plain_ocm_distributed_bitexact_vs_frozen_sim(tokens, vals):
    cfg = CMConfig(np_bits=10, nh=5, seed=137, conservative=False)
    dist = build_offline(tokens.repartition(7), "token_u64", cfg, ROUNDS)
    sim = _sim_plain_ocm(vals, cfg, ROUNDS)
    np.testing.assert_array_equal(dist.collision, sim.collision)
    np.testing.assert_array_equal(dist.core, sim.core)


def test_ocm_one_sided_guarantee_and_improvement(tokens, vals):
    u, true = np.unique(vals, return_counts=True)
    cfg = CMConfig(np_bits=9, nh=5, seed=137, conservative=False)
    ocm = build_offline(tokens, "token_u64", cfg, ROUNDS)
    est = ocm.estimate(u)
    assert (est >= true.astype(np.uint64)).all()
    # refinement should not be worse on aggregate than round-0 (plain CM)
    plain = build_offline(tokens, "token_u64", cfg, 1)
    err_ocm = (est - true).astype(np.float64).mean()
    err_plain = (plain.estimate(u) - true).astype(np.float64).mean()
    assert err_ocm <= err_plain + 1e-9


def test_occm_distributed_bounds(tokens, vals):
    u, true = np.unique(vals, return_counts=True)
    cfg = CMConfig(np_bits=9, nh=5, seed=137, conservative=True)
    occm = build_offline(tokens.repartition(6), "token_u64", cfg, ROUNDS)
    est = occm.estimate(u)
    assert (est >= true.astype(np.uint64)).all()


def test_checkpoint_resume_bitexact(tokens, tmp_path):
    cfg = CMConfig(np_bits=9, nh=3, seed=42, conservative=False)
    d1 = str(tmp_path / "ckpt_full")
    full = build_offline(tokens, "token_u64", cfg, ROUNDS, checkpoint_dir=d1)

    # simulate an interruption: keep only the first 2 committed passes
    import shutil
    d2 = str(tmp_path / "ckpt_cut")
    shutil.copytree(d1, d2)
    with open(os.path.join(d2, "manifest.json")) as fh:
        m = json.load(fh)
    assert len(m["snapshots"]) == 2 * ROUNDS - 1  # count + (coll+count)*(n-1)
    m["snapshots"] = m["snapshots"][:2]
    with open(os.path.join(d2, "manifest.json"), "w") as fh:
        json.dump(m, fh)

    resumed = build_offline(tokens, "token_u64", cfg, ROUNDS,
                            checkpoint_dir=d2)
    np.testing.assert_array_equal(full.core, resumed.core)
    np.testing.assert_array_equal(full.collision, resumed.collision)


def test_lineage_records_every_partition_once(tokens, tmp_path):
    cfg = CMConfig(np_bits=8, nh=3, seed=1, conservative=True)
    d = str(tmp_path / "ckpt_lineage")
    build_offline(tokens.repartition(9), "token_u64", cfg, 2,
                  checkpoint_dir=d)
    snaps = sorted(os.listdir(os.path.join(d, "snapshots")))
    assert snaps
    for s in snaps:
        with open(os.path.join(d, "snapshots", s)) as fh:
            meta = json.load(fh)
        pids = [e["partition_id"] for e in meta["lineage"]]
        assert sorted(pids) == list(range(9)), s
        assert meta["metrics"]["max_counter"] > 0
        assert sum(e["rows"] for e in meta["lineage"]) > 0

def test_local_fastpath_bitexact_vs_distributed(spark, tokens):
    """The small-key-space driver-local round loop must reproduce the
    distributed pre-aggregated build bit-exactly (the batch kernels
    are order-independent, so one partition == local)."""
    from sketchlib.offline import build_offline as bo
    for conservative in (False, True):
        cfg = CMConfig(10, 3, 7, conservative)
        local = bo(tokens, "token_u64", cfg, 3, pre_aggregate=True,
                   local_threshold=10_000_000)
        dist = bo(tokens.coalesce(1), "token_u64", cfg, 3,
                  pre_aggregate=True, local_threshold=0)
        assert (local.core == dist.core).all(), conservative
        assert (local.collision == dist.collision).all(), conservative
