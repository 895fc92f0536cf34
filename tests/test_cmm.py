"""Count-mean-min estimator (L5 — reference include/ccm.h:822-837 is
unfinished; semantics from Deng & Rafiei CIKM'07)."""

from __future__ import annotations

import numpy as np

from sketchlib.sketches.cm import CMConfig, CountMin

_RNG = np.random.default_rng(7)


def _zipf_stream(n: int, vocab: int, a: float = 1.3) -> np.ndarray:
    v = _RNG.zipf(a, size=n)
    return (v % vocab).astype(np.uint64)


def test_cmm_exact_at_collision_free_width():
    vals = _zipf_stream(20_000, 200)
    keys, cnts = np.unique(vals, return_counts=True)
    cfg = CMConfig(np_bits=16, nh=5, seed=137, conservative=False)
    sk = CountMin(cfg)
    sk.update(vals)
    n = float(vals.size)
    w = float(cfg.width)
    expect = np.clip(cnts - (n - cnts) / (w - 1.0), 0.0,
                     cnts.astype(np.float64))
    got = sk.estimate_mean_min(keys)
    assert np.array_equal(got, expect)


def test_cmm_beats_min_estimator_under_load():
    """In a loaded sketch the noise-corrected median should have lower
    absolute error than the one-sided min estimate, and never exceed
    it (the clamp)."""
    vals = _zipf_stream(200_000, 5_000)
    keys, cnts = np.unique(vals, return_counts=True)
    cfg = CMConfig(np_bits=10, nh=5, seed=137, conservative=False)
    sk = CountMin(cfg)
    sk.update(vals)
    est_min = sk.estimate(keys).astype(np.float64)
    est_cmm = sk.estimate_mean_min(keys)
    assert np.all(est_cmm <= est_min)
    assert np.all(est_cmm >= 0.0)
    err_min = np.abs(est_min - cnts).mean()
    err_cmm = np.abs(est_cmm - cnts).mean()
    assert err_cmm < err_min


def test_cmm_merge_invariant():
    """The estimator reads only the (sum-merged) core, so a merged
    build equals a sequential one bit-for-bit."""
    vals = _zipf_stream(30_000, 500)
    cfg = CMConfig(np_bits=12, nh=5, seed=137, conservative=False)
    whole = CountMin(cfg)
    whole.update(vals)
    a, b = CountMin(cfg), CountMin(cfg)
    a.update(vals[: 11_000])
    b.update(vals[11_000:])
    a.merge(b)
    keys = np.unique(vals)
    assert np.array_equal(whole.estimate_mean_min(keys),
                          a.estimate_mean_min(keys))
