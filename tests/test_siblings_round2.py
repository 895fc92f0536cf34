"""Round-2 sibling batch: 4-wise count-sketch, one-perm b-bit MinHash,
counting (weighted) MinHash, sliding-window CM, FilterHLL, HyperBitBit,
ModSketch."""

from __future__ import annotations

import numpy as np
import pytest

from sketchlib.sketches.base import deserialize
from sketchlib.sketches.bbmh import OnePermMinHash
from sketchlib.sketches.cs4w import CountSketch4W, _mulmod61
from sketchlib.sketches.gadgets import FilterHLL, HyperBitBit, ModSketch
from sketchlib.sketches.swcm import SlidingWindowCM
from sketchlib.sketches.wmh import CountingMinHash

RNG = np.random.default_rng(11)
P61 = (1 << 61) - 1


def test_mulmod61_matches_bigint():
    a = RNG.integers(0, P61, 5000, dtype=np.uint64)
    b = RNG.integers(0, P61, 5000, dtype=np.uint64)
    got = _mulmod61(a, b)
    exp = np.array([(int(x) * int(y)) % P61 for x, y in zip(a, b)],
                   dtype=np.uint64)
    assert (got == exp).all()


def test_cs4w_exact_at_collision_free_width_and_merge():
    keys = np.arange(500, dtype=np.uint64)
    cnts = RNG.integers(1, 100, 500)
    a = CountSketch4W(16, 5, 137)
    a.update_weighted(keys[:250], cnts[:250])
    b = CountSketch4W(16, 5, 137)
    b.update_weighted(keys[250:], cnts[250:])
    m = deserialize(a.to_bytes()).merge(deserialize(b.to_bytes()))
    assert (m.estimate(keys) == cnts).all()
    # unbiased two-sided sketch: deletions cancel exactly
    m.update_weighted(keys, -cnts)
    assert (m.estimate(keys) == 0).all()


def test_oneperm_minhash_cardinality_and_jaccard():
    n = 100_000
    vals = RNG.integers(0, 1 << 62, n, dtype=np.uint64)
    sk = OnePermMinHash(10)
    sk.update(vals)
    assert abs(sk.cardinality() - n) <= 0.2 * n  # rse ~ 1/sqrt(1024)
    a = OnePermMinHash(10)
    a.update(vals[:75_000])
    b = OnePermMinHash(10)
    b.update(vals[25_000:])
    # true jaccard ~ 50k/100k
    assert abs(a.jaccard(b) - 0.5) <= 0.12
    # b-bit comparison stays in range and near the full-width value
    assert abs(a.jaccard(b, b=8) - a.jaccard(b)) <= 0.15
    # merge == union build (bit-exact elementwise-min algebra)
    u = deserialize(a.to_bytes()).merge(deserialize(b.to_bytes()))
    direct = OnePermMinHash(10)
    direct.update(vals)
    assert (u.mins == direct.mins).all()


def test_counting_minhash_weighted_jaccard_exact_regime():
    keys = np.arange(300, dtype=np.uint64)
    wa = RNG.integers(0, 10, 300)
    wb = RNG.integers(0, 10, 300)
    A = CountingMinHash(4096)
    A.update_weighted(keys, wa)
    B = CountingMinHash(4096)
    B.update_weighted(keys, wb)
    both = (wa > 0) | (wb > 0)
    true_j = np.minimum(wa, wb)[both].sum() / np.maximum(wa, wb)[both].sum()
    assert A.weighted_jaccard(B) == pytest.approx(true_j, abs=1e-12)
    # multiplicities ADD on merge (multiset union across partitions)
    m = deserialize(A.to_bytes()).merge(deserialize(A.to_bytes()))
    assert m.total_weight() == 2 * int(wa.sum())


def test_sliding_window_cm_tracks_trailing_window_exactly():
    w = 1000
    stream = RNG.integers(0, 50, 5000).astype(np.uint64)
    sk = SlidingWindowCM(w, np_bits=14, nh=5)
    # feed in uneven chunks to exercise ring wraparound
    for chunk in np.array_split(stream, [7, 300, 1100, 1101, 2600, 4999]):
        sk.update(chunk)
    keys = np.arange(50, dtype=np.uint64)
    exact = np.bincount(stream[-w:].astype(np.int64), minlength=50)
    assert (sk.estimate(keys) == exact).all()
    with pytest.raises(NotImplementedError):
        sk.merge(sk)


def test_filterhll_counts_only_heavy_keys():
    keys = np.arange(20_000, dtype=np.uint64)
    counts = np.where(keys % 4 == 0, 5, 1)  # 5000 heavy keys
    sk = FilterHLL(p=14, threshold=2)
    sk.update_weighted(keys, counts)
    n_heavy = int((counts >= 2).sum())
    assert abs(sk.estimate() - n_heavy) <= 6 * 1.03896 / 128 * n_heavy
    # merge: OR/max algebra, duplicate-insensitive
    m = deserialize(sk.to_bytes()).merge(deserialize(sk.to_bytes()))
    assert m.estimate() == sk.estimate()


def test_hyperbitbit_order_of_magnitude():
    for n in (50_000, 1_000_000):
        sk = HyperBitBit()
        sk.update(RNG.integers(0, 1 << 62, n, dtype=np.uint64))
        est = sk.estimate()
        assert n / 2.2 <= est <= n * 2.2  # hbb is a coarse estimator
    back = deserialize(sk.to_bytes())
    assert back.estimate() == sk.estimate()


def test_modsketch_cardinality_and_union():
    n = 200_000
    vals = RNG.integers(0, 1 << 62, n, dtype=np.uint64)
    a = ModSketch(64)
    a.update(vals[:120_000])
    b = ModSketch(64)
    b.update(vals[80_000:])
    u = deserialize(a.to_bytes()).merge(deserialize(b.to_bytes()))
    assert abs(u.cardinality() - n) <= 0.1 * n
    exact = ModSketch(1)
    exact.update(vals)
    assert exact.cardinality() == len(np.unique(vals))
