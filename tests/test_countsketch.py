"""Count-sketch sibling (reference include/ccm.h:412-588 semantics)."""

from __future__ import annotations

import numpy as np
import pytest

from sketchlib.sketches.countsketch import CountSketch


def _stream(seed=7, n=20000, zipf=1.3):
    rng = np.random.default_rng(seed)
    return rng.zipf(zipf, n).astype(np.uint64) % 5000


def test_exact_in_collision_free_regime():
    vals = np.arange(100, dtype=np.uint64)
    counts = np.arange(1, 101, dtype=np.int64)
    cs = CountSketch(np_bits=16, nh=5)
    cs.update_weighted(vals, counts)
    assert (cs.estimate(vals) == counts).all()


def test_deletions_cancel():
    cs = CountSketch(np_bits=12, nh=5)
    s = _stream()
    cs.update(s)
    cs.update_weighted(s, np.full(len(s), -1, dtype=np.int64))
    keys = np.unique(s)
    assert (cs.estimate(keys) == 0).all()


def test_merge_sum_bitexact_any_partitioning():
    s = _stream(n=30000)
    whole = CountSketch(np_bits=10, nh=5)
    whole.update(s)
    rng = np.random.default_rng(3)
    parts = np.array_split(s, 7)
    order = rng.permutation(7)
    acc = None
    for i in order:
        p = CountSketch(np_bits=10, nh=5)
        p.update(parts[i])
        acc = p if acc is None else acc.merge(p)
    assert (acc.core == whole.core).all()


def test_two_sided_error_bound():
    """|err| <= ||f||_2 / sqrt(w) holds per estimate w.h.p.; assert the
    99th percentile within 4x the bound (median-of-5-rows tightens)."""
    s = _stream(n=50000)
    keys, true = np.unique(s, return_counts=True)
    cs = CountSketch(np_bits=8, nh=5)
    cs.update(s)
    err = np.abs(cs.estimate(keys).astype(float) - true)
    l2 = float(np.sqrt((true.astype(float) ** 2).sum()))
    bound = l2 / np.sqrt(1 << 8)
    assert np.quantile(err, 0.99) <= 4 * bound
    # unbiased: signed mean error near zero relative to the bound
    signed = cs.estimate(keys).astype(float) - true
    assert abs(signed.mean()) <= bound


def test_roundtrip_bytes():
    cs = CountSketch(np_bits=8, nh=3, seed=99)
    cs.update(_stream(n=1000))
    rt = CountSketch.from_bytes(cs.to_bytes())
    assert rt.seed == 99 and (rt.core == cs.core).all()
    assert (rt.estimate(np.arange(50, dtype=np.uint64))
            == cs.estimate(np.arange(50, dtype=np.uint64))).all()
