"""fold(n) width-halving — the last vendored-operator gap (reference
include/ccm.h:576-588 csbase_t::fold) plus the CM analog.

Gates:
- count-sketch: build(w).fold(n) is BIT-IDENTICAL to build(w >> n)
  (positions are low np_bits, sign is width-independent bit 63, both
  linear), and fold commutes with merge;
- plain CM: same bit-exactness + fold/merge commutation;
- conservative CM: nonlinear, so no bit-exactness claim — instead the
  one-sided guarantee survives (fold().estimate >= true count) and the
  folded estimate never shrinks (per-row sums dominate the originals).
"""

from __future__ import annotations

import numpy as np
import pytest

from sketchlib.sketches.cm import CMConfig, CountMin
from sketchlib.sketches.countsketch import CountSketch


def _stream(seed: int, n: int = 5000, universe: int = 700):
    rng = np.random.default_rng(seed)
    # zipf-ish so some keys are heavy
    vals = rng.zipf(1.3, size=n) % universe
    return vals.astype(np.uint64)


def test_countsketch_fold_equals_direct_build():
    vals = _stream(1)
    big = CountSketch(10, 5, 137)
    big.update(vals)
    small = CountSketch(8, 5, 137)
    small.update(vals)
    assert np.array_equal(big.fold(2).core, small.core)
    # estimator parity follows, but assert it anyway end-to-end
    probe = np.unique(vals)[:100]
    assert np.array_equal(big.fold(2).estimate(probe),
                          small.estimate(probe))


def test_countsketch_fold_commutes_with_merge():
    a, b = CountSketch(9, 5, 137), CountSketch(9, 5, 137)
    a.update(_stream(2))
    b.update(_stream(3))
    fold_then_merge = a.fold(1).merge(b.fold(1)).core.copy()
    merge_then_fold = a.merge(b).fold(1).core
    assert np.array_equal(fold_then_merge, merge_then_fold)


def test_countsketch_fold_range_checks():
    sk = CountSketch(4, 3, 137)
    with pytest.raises(ValueError):
        sk.fold(0)
    with pytest.raises(ValueError):
        sk.fold(5)


def test_cm_plain_fold_equals_direct_build():
    vals = _stream(4)
    big = CountMin(CMConfig(10, 5, 137, False))
    big.update(vals)
    small = CountMin(CMConfig(7, 5, 137, False))
    small.update(vals)
    folded = big.fold(3)
    assert folded.config.np_bits == 7
    assert np.array_equal(folded.core, small.core)


def test_cm_plain_fold_commutes_with_merge():
    cfg = CMConfig(9, 5, 137, False)
    a, b = CountMin(cfg), CountMin(cfg)
    a.update(_stream(5))
    b.update(_stream(6))
    fm = a.fold(1).merge(b.fold(1)).core.copy()
    mf = a.merge(b).fold(1).core
    assert np.array_equal(fm, mf)


def test_cm_conservative_fold_keeps_one_sided_bound():
    vals = _stream(7, n=20000, universe=500)
    sk = CountMin(CMConfig(9, 5, 137, True))
    sk.update(vals, strict_order=True)
    probe, true = np.unique(vals, return_counts=True)
    base = sk.estimate(probe).astype(np.int64)
    for n in (1, 2, 3):
        est = sk.fold(n).estimate(probe).astype(np.int64)
        # one-sided CM guarantee survives folding
        assert (est >= true).all()
        # folding only adds nonnegative aliased mass per row
        assert (est >= base).all()
