"""Sketch set algebra (HLL union/intersection, CM min-intersect, Bloom
XOR), MinHash bottom-k, and HeavyKeeper recall."""

from __future__ import annotations

import numpy as np
import pytest

from sketchlib.sketches.base import deserialize
from sketchlib.sketches.bloom import BloomFilter
from sketchlib.sketches.cm import CMConfig, CountMin
from sketchlib.sketches.hk import HeavyKeeper
from sketchlib.sketches.hll import HyperLogLog
from sketchlib.sketches.mh import MinHashBottomK

RNG = np.random.default_rng(7)


def _sets(n_a, n_b, n_i):
    a_only = RNG.integers(0, 1 << 62, n_a - n_i, dtype=np.uint64)
    b_only = RNG.integers(0, 1 << 62, n_b - n_i, dtype=np.uint64) + (1 << 62)
    both = RNG.integers(0, 1 << 62, n_i, dtype=np.uint64) + (2 << 62)
    return (np.concatenate([a_only, both]), np.concatenate([b_only, both]),
            a_only, b_only, both)


def test_hll_union_and_joint_mle_within_bounds():
    va, vb, *_ = _sets(60_000, 40_000, 20_000)
    A = HyperLogLog(14)
    A.update(va)
    B = HyperLogLog(14)
    B.update(vb)
    true_u = 80_000
    true_i = 20_000
    bound = 6 * A.relative_error
    assert abs(A.union_size(B) - true_u) <= bound * true_u
    oa, ob, inter = A.joint_estimates(B)
    assert abs(inter - true_i) <= bound * true_u
    assert abs(oa - 40_000) <= bound * true_u
    assert abs(ob - 20_000) <= bound * true_u
    # symmetric and non-mutating
    assert A.intersection_size(B) == pytest.approx(B.intersection_size(A),
                                                   rel=1e-9)


def test_cm_intersect_exact_at_collision_free_width():
    cfg = CMConfig(np_bits=16, nh=5, seed=137, conservative=False)
    keys = np.arange(200, dtype=np.uint64)
    cnt_a = RNG.integers(1, 50, keys.size)
    cnt_b = RNG.integers(1, 50, keys.size)
    A = CountMin(cfg)
    A.update_weighted(keys, cnt_a)
    B = CountMin(cfg)
    B.update_weighted(keys[::2], cnt_b[::2])  # B misses odd keys
    inter = A.intersect(B)
    expect = np.where(np.arange(200) % 2 == 0,
                      np.minimum(cnt_a, cnt_b), 0)
    assert (inter.estimate(keys) == expect).all()
    # inputs not mutated
    assert (A.estimate(keys) == cnt_a).all()


def test_bloom_xor_and_sparse_roundtrip():
    a_keys = RNG.integers(0, 1 << 63, 500, dtype=np.uint64)
    b_keys = np.concatenate([a_keys[:200],  # shared
                             RNG.integers(0, 1 << 63, 300,
                                          dtype=np.uint64) + (1 << 63)])
    A = BloomFilter(22, 4, 1009)
    A.update(a_keys)
    B = BloomFilter(22, 4, 1009)
    B.update(b_keys)
    X = A.xor(B)
    # shared keys cancel; one-sided keys survive (collision-free here)
    assert not X.contains(a_keys[:200]).any()
    assert X.contains(a_keys[200:]).all()
    assert X.contains(b_keys[200:]).all()
    # sparse blob v2 roundtrip is lossless and far smaller than dense
    blob = A.to_bytes()
    assert len(blob) < (1 << 22) // 8 // 2
    back = deserialize(blob)
    assert (back.words == A.words).all()


def test_minhash_bottomk_merge_algebra_and_exact_regime():
    va, vb, a_only, b_only, both = _sets(3000, 2000, 1000)
    k = 8192  # >= |union| => exact regime
    A = MinHashBottomK(k)
    A.update(va)
    B = MinHashBottomK(k)
    B.update(vb)
    true_j = 1000 / 4000
    assert A.jaccard(B) == pytest.approx(true_j, abs=1e-12)
    assert A.cardinality() == 3000.0  # exact below k
    # merge algebra: commutative + duplicate-insensitive, bit-exact
    m1 = deserialize(A.to_bytes()).merge(deserialize(B.to_bytes()))
    m2 = deserialize(B.to_bytes()).merge(deserialize(A.to_bytes()))
    assert (m1.values == m2.values).all()
    assert m1.cardinality() == 4000.0


def test_minhash_bottomk_estimators_in_sketch_regime():
    n = 200_000
    vals = RNG.integers(0, 1 << 63, n, dtype=np.uint64)
    sk = MinHashBottomK(1024)
    sk.update(vals)
    # bottom-k cardinality rse ~ 1/sqrt(k) => 6 sigma ~ 19%
    assert abs(sk.cardinality() - n) <= 6 / np.sqrt(1024) * n
    # jaccard of two half-overlapping sets
    A = MinHashBottomK(1024)
    A.update(vals[:150_000])
    B = MinHashBottomK(1024)
    B.update(vals[50_000:])
    jac = A.jaccard(B)
    # true jaccard ~ 100k/200k = 0.5 (values distinct whp)
    assert abs(jac - 0.5) <= 0.1


def test_minhash_bottomk_set_algebra_exact_regime():
    va, vb, a_only, b_only, both = _sets(3000, 2000, 1000)
    k = 8192  # >= |union| => every estimator is the exact integer
    A = MinHashBottomK(k)
    A.update(va)
    B = MinHashBottomK(k)
    B.update(vb)
    assert A.union_cardinality(B) == 4000.0
    assert A.intersection_cardinality(B) == 1000.0
    assert A.difference_cardinality(B) == 2000.0  # |A \ B|
    assert B.difference_cardinality(A) == 1000.0  # |B \ A|
    # symmetry of the symmetric pieces
    assert A.union_cardinality(B) == B.union_cardinality(A)
    assert A.intersection_cardinality(B) == B.intersection_cardinality(A)


def test_minhash_bottomk_set_algebra_sketch_regime():
    n = 200_000
    vals = RNG.integers(0, 1 << 63, n, dtype=np.uint64)
    A = MinHashBottomK(1024)
    A.update(vals[:150_000])
    B = MinHashBottomK(1024)
    B.update(vals[50_000:])
    # union ~ 200k, inter ~ 100k, each diff ~ 50k (values distinct whp);
    # rse ~ 1/sqrt(k) on the union estimate plus binomial sampling on
    # the fractions => generous 6-sigma style tolerances
    assert abs(A.union_cardinality(B) - 200_000) <= 0.2 * 200_000
    assert abs(A.intersection_cardinality(B) - 100_000) <= 0.2 * 200_000
    assert abs(A.difference_cardinality(B) - 50_000) <= 0.2 * 200_000
    # consistency: the three pieces partition the union estimate exactly
    total = (A.intersection_cardinality(B) + A.difference_cardinality(B)
             + B.difference_cardinality(A))
    assert total == pytest.approx(A.union_cardinality(B), rel=1e-9)


def test_heavykeeper_zipf_topk_recall():
    # Zipf(1.3) over 50k keys, 500k samples: top-20 must be recovered
    n_keys, n = 50_000, 500_000
    ranks = np.arange(1, n_keys + 1)
    probs = 1.0 / ranks ** 1.3
    probs /= probs.sum()
    sample = RNG.choice(n_keys, size=n, p=probs).astype(np.uint64)
    exact_keys, exact_counts = np.unique(sample, return_counts=True)
    top20 = exact_keys[np.argsort(exact_counts)[::-1][:20]]

    # distributed: 8 partitions, merged
    merged = None
    for part in np.array_split(sample, 8):
        hk = HeavyKeeper(12, 4, 137)
        hk.update(part)
        merged = hk if merged is None else merged.merge(hk)
    est = merged.estimate(exact_keys)
    sel = exact_keys[np.argsort(est)[::-1][:20]]
    assert set(top20.tolist()) <= set(sel.tolist())
    # estimates of the true top-20 are within 5% (heavy cells stable)
    top_mask = np.isin(exact_keys, top20)
    rel = np.abs(est[top_mask].astype(float)
                 - exact_counts[top_mask]) / exact_counts[top_mask]
    assert rel.max() <= 0.05


def test_heavykeeper_blob_roundtrip():
    hk = HeavyKeeper(8, 3, 42)
    hk.update(RNG.integers(0, 1 << 60, 10_000, dtype=np.uint64))
    back = deserialize(hk.to_bytes())
    assert (back.fps == hk.fps).all()
    assert (back.cnts == hk.cnts).all()
    assert back.decay_b == hk.decay_b


def test_counting_bloom_power_of_two_estimates_and_merge():
    from sketchlib.sketches.cbf import CountingBloom

    keys = np.arange(100, dtype=np.uint64)
    counts = np.array([1, 2, 3, 7, 8, 9, 100, 1000] * 12 + [5] * 4)
    cb = CountingBloom(16, 4, 16, 137)
    cb.update_weighted(keys, counts)
    est = cb.estimate(keys)
    expect = 2 ** np.floor(np.log2(counts)).astype(np.int64)
    assert (est == expect).all()
    assert (cb.estimate(keys + 10_000) == 0).all()  # absent keys
    # per-layer OR merge: duplicate-insensitive, commutative
    blob = cb.to_bytes()
    back = deserialize(blob)
    assert (back.words == cb.words).all()
    m = deserialize(blob).merge(deserialize(blob))
    assert (m.estimate(keys) == expect).all()


def test_count_min_log_power_of_two_and_merge():
    from sketchlib.sketches.cml import CountMinLog

    keys = np.arange(100, dtype=np.uint64)
    counts = np.array([1, 2, 3, 7, 8, 9, 100, 1000] * 12 + [5] * 4)
    ml = CountMinLog(16, 5, 137)
    ml.update_weighted(keys, counts)
    expect = 2 ** np.floor(np.log2(counts)).astype(np.int64)
    assert (ml.estimate(keys) == expect).all()
    assert ml.cells.dtype == np.uint8  # 8x memory win vs u64 counters
    blob = ml.to_bytes()
    back = deserialize(blob)
    assert (back.cells == ml.cells).all()
    # max merge: idempotent, commutative
    m = deserialize(blob).merge(deserialize(blob))
    assert (m.estimate(keys) == expect).all()


def test_misra_gries_exact_regime_and_roundtrip():
    from sketchlib.sketches.base import deserialize
    from sketchlib.sketches.mg import MisraGries

    vals = RNG.integers(0, 800, 30000, dtype=np.uint64)
    mg = MisraGries(1024)
    mg.update(vals)
    u, c = np.unique(vals, return_counts=True)
    # no trim fired (k >= distinct): every count exact, n carried
    assert (mg.estimate(u) == c).all()
    assert mg.n == vals.size
    rt = deserialize(mg.to_bytes())
    assert (rt.estimate(u) == c).all() and rt.n == mg.n
    # untracked key -> 0
    assert mg.estimate(np.array([10**12], dtype=np.uint64))[0] == 0


def test_misra_gries_merge_tree_bound():
    """Mergeable-summaries guarantee: one-sided undercount <= n/(k+1)
    across an arbitrary merge tree (7 uneven partitions, k=64)."""
    from sketchlib.sketches.mg import MisraGries

    zipf = (RNG.zipf(1.4, 300_000) % 20_000).astype(np.uint64)
    parts = np.array_split(zipf, [1000, 5000, 40_000, 41_000,
                                  150_000, 299_000])
    acc = None
    for p in parts:
        s = MisraGries(64)
        s.update(p)
        s = MisraGries.from_bytes(s.to_bytes())
        acc = s if acc is None else acc.merge(s)
    u, c = np.unique(zipf, return_counts=True)
    est = acc.estimate(u)
    assert (est <= c).all()                       # never overcounts
    assert (c - est <= acc.error_bound()).all()   # Thm 1 bound
    assert acc.n == zipf.size
    assert acc.values.size <= 64
    # the true heavy hitters (count > n/(k+1)) are all tracked
    heavy = u[c > acc.error_bound()]
    assert np.isin(heavy, acc.values).all()
