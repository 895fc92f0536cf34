"""DDSketch (reference include/dd.h; paper semantics — the vendored
implementation is unfinished, see sketchlib/sketches/dd.py docstring).

Checks: relative-error guarantee at the engine rank-quantile spec,
bit-exact merge under arbitrary partitionings (no-collapse regime),
weighted==unweighted, bounded memory under collapse, blob roundtrip.
"""

import numpy as np
import pytest

from sketchlib.sketches.dd import DDSketch


def _exact_rank_quantile(vals: np.ndarray, q: float) -> float:
    s = np.sort(vals)
    rank = max(1, int(np.ceil(q * s.size)))
    return float(s[rank - 1])


QS = [0.01, 0.1, 0.25, 0.5, 0.75, 0.9, 0.99]


def test_relative_error_bound_lognormal():
    rng = np.random.default_rng(7)
    vals = rng.lognormal(mean=3.0, sigma=2.0, size=200_000)
    sk = DDSketch(alpha=0.01, max_bins=8192)
    sk.update(vals)
    for q in QS:
        exact = _exact_rank_quantile(vals, q)
        est = sk.quantile(q)
        assert abs(est - exact) <= 0.01 * abs(exact) + 1e-12, q


def test_relative_error_bound_signed():
    rng = np.random.default_rng(11)
    vals = np.concatenate([rng.lognormal(1.0, 1.5, 50_000),
                           -rng.lognormal(0.5, 1.5, 50_000)])
    rng.shuffle(vals)
    sk = DDSketch(alpha=0.02, max_bins=8192)
    sk.update(vals)
    for q in QS:
        exact = _exact_rank_quantile(vals, q)
        est = sk.quantile(q)
        assert abs(est - exact) <= 0.02 * abs(exact) + 1e-12, q


def test_merge_bit_exact_any_partitioning():
    rng = np.random.default_rng(3)
    vals = rng.lognormal(2.0, 1.0, 30_000)
    whole = DDSketch(alpha=0.01)
    whole.update(vals)
    for seed in range(3):
        r = np.random.default_rng(seed)
        perm = r.permutation(vals.size)
        parts = np.array_split(vals[perm], r.integers(2, 9))
        sks = []
        for p in parts:
            s = DDSketch(alpha=0.01)
            s.update(p)
            sks.append(s)
        r.shuffle(sks)
        merged = sks[0]
        for s in sks[1:]:
            merged = merged.merge(s)
        assert merged.count == whole.count
        assert merged.mink == whole.mink
        np.testing.assert_array_equal(merged.bins, whole.bins)
        assert merged.min == whole.min and merged.max == whole.max
        assert merged.sum == pytest.approx(whole.sum, rel=1e-12)


def test_weighted_equals_unweighted():
    rng = np.random.default_rng(5)
    vals = rng.lognormal(1.0, 1.0, 500).round(2)
    uniq, cnt = np.unique(vals, return_counts=True)
    a = DDSketch()
    a.update(vals)
    b = DDSketch()
    b.update_weighted(uniq, cnt)
    assert a.count == b.count and a.mink == b.mink
    np.testing.assert_array_equal(a.bins, b.bins)
    assert a.quantiles(QS).tolist() == b.quantiles(QS).tolist()


def test_collapse_bounds_memory_keeps_upper_quantiles():
    rng = np.random.default_rng(13)
    vals = rng.lognormal(0.0, 2.0, 100_000)  # ~8 decades of range
    sk = DDSketch(alpha=0.01, max_bins=600)
    sk.update(vals)
    assert sk.bins.size <= 600
    # collapse eats the LOW end only: quantiles whose rank falls above
    # the collapsed first bin stay within the alpha guarantee
    collapsed_frac = sk.bins[0] / sk.count
    assert collapsed_frac < 0.25  # sanity: most mass uncollapsed
    for q in (0.5, 0.9, 0.99):
        assert q > collapsed_frac
        exact = _exact_rank_quantile(vals, q)
        assert abs(sk.quantile(q) - exact) <= 0.01 * exact + 1e-12


def test_blob_roundtrip():
    rng = np.random.default_rng(17)
    sk = DDSketch(alpha=0.015, max_bins=1024)
    sk.update(rng.lognormal(1.0, 2.0, 10_000))
    blob = sk.to_bytes()
    back = DDSketch.from_bytes(blob)
    assert back.count == sk.count and back.mink == sk.mink
    np.testing.assert_array_equal(back.bins, sk.bins)
    assert back.quantiles(QS).tolist() == sk.quantiles(QS).tolist()
    from sketchlib.sketches.base import deserialize
    assert isinstance(deserialize(blob), DDSketch)


def test_zero_and_small_values_key_zero():
    sk = DDSketch(alpha=0.01, min_value=1e-9)
    sk.update(np.array([0.0, 1e-12, -1e-12, 0.0]))
    assert sk.count == 4
    assert sk.quantile(0.5) == 0.0
