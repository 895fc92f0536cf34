"""Hypothesis-driven merge-algebra properties (SURVEY.md §5.5(2)).

For every order-independent sketch: splitting a stream into arbitrary
partitions and merging the partials in an arbitrary order must
reproduce the sequential sketch BIT-EXACTLY — the north rule's
``merge(a,b) == merge(b,a)`` requirement, checked over randomized
partitionings rather than a couple of hand-picked ones.
"""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from sketchlib.sketches.bloom import BloomFilter
from sketchlib.sketches.cm import CMConfig, CountMin
from sketchlib.sketches.countsketch import CountSketch
from sketchlib.sketches.hll import HyperLogLog

_STREAM = np.random.default_rng(11).integers(
    0, 4000, 25000).astype(np.uint64)


def _partials(factory, cuts: list[int], order: list[int]):
    bounds = sorted({0, len(_STREAM), *cuts})
    parts = [_STREAM[a:b] for a, b in zip(bounds, bounds[1:])]
    acc = None
    for i in order:
        if i >= len(parts):
            continue
        sk = factory()
        sk.update(parts[i])
        acc = sk if acc is None else acc.merge(sk)
    return acc


partition_strategy = st.lists(
    st.integers(min_value=1, max_value=len(_STREAM) - 1),
    min_size=1, max_size=8)
order_strategy = st.permutations(list(range(9)))


@settings(max_examples=25, deadline=None)
@given(cuts=partition_strategy, order=order_strategy)
def test_plain_cm_partition_invariant(cuts, order):
    whole = CountMin(CMConfig(10, 5, 7, conservative=False))
    whole.update(_STREAM)
    merged = _partials(
        lambda: CountMin(CMConfig(10, 5, 7, conservative=False)),
        cuts, list(order))
    assert (merged.core == whole.core).all()


@settings(max_examples=25, deadline=None)
@given(cuts=partition_strategy, order=order_strategy)
def test_hll_partition_invariant(cuts, order):
    whole = HyperLogLog(12)
    whole.update(_STREAM)
    merged = _partials(lambda: HyperLogLog(12), cuts, list(order))
    assert (merged.registers == whole.registers).all()


@settings(max_examples=25, deadline=None)
@given(cuts=partition_strategy, order=order_strategy)
def test_bloom_partition_invariant(cuts, order):
    whole = BloomFilter(14, 4)
    whole.update(_STREAM)
    merged = _partials(lambda: BloomFilter(14, 4), cuts, list(order))
    assert (merged.words == whole.words).all()


@settings(max_examples=25, deadline=None)
@given(cuts=partition_strategy, order=order_strategy)
def test_countsketch_partition_invariant(cuts, order):
    whole = CountSketch(10, 5)
    whole.update(_STREAM)
    merged = _partials(lambda: CountSketch(10, 5), cuts, list(order))
    assert (merged.core == whole.core).all()


@settings(max_examples=15, deadline=None)
@given(seed=st.integers(min_value=0, max_value=2**31 - 1),
       cuts=partition_strategy)
def test_conservative_cm_bounds_any_partitioning(seed, cuts):
    """Conservative CM is order-dependent, so distributed builds are
    not bit-exact — but the one-sided guarantee and the plain-CM upper
    bound must survive ANY partitioning (SURVEY.md §7.5)."""
    rng = np.random.default_rng(seed)
    stream = rng.zipf(1.4, 8000).astype(np.uint64) % 1500
    keys, true = np.unique(stream, return_counts=True)
    bounds = sorted({0, len(stream), *[c % len(stream) for c in cuts if 0 < c % len(stream)]})
    cfg = CMConfig(8, 5, 7, conservative=True)
    acc = None
    for a, b in zip(bounds, bounds[1:]):
        sk = CountMin(cfg)
        sk.update(stream[a:b])
        acc = sk if acc is None else acc.merge(sk)
    plain = CountMin(CMConfig(8, 5, 7, conservative=False))
    plain.update(stream)
    est = acc.estimate(keys)
    assert (est >= true).all()                      # one-sided guarantee
    assert (est <= plain.estimate(keys)).all()      # <= plain CM


@settings(max_examples=15, deadline=None)
@given(cuts=partition_strategy, order=order_strategy)
def test_minhash_bottomk_partition_invariant(cuts, order):
    from sketchlib.sketches.mh import MinHashBottomK
    whole = MinHashBottomK(512)
    whole.update(_STREAM)
    merged = _partials(lambda: MinHashBottomK(512), cuts, list(order))
    assert (merged.values == whole.values).all()


@settings(max_examples=15, deadline=None)
@given(cuts=partition_strategy, order=order_strategy)
def test_counting_minhash_partition_invariant(cuts, order):
    from sketchlib.sketches.wmh import CountingMinHash
    whole = CountingMinHash(512)
    whole.update(_STREAM)
    merged = _partials(lambda: CountingMinHash(512), cuts, list(order))
    assert (merged.values == whole.values).all()
    assert (merged.weights == whole.weights).all()


@settings(max_examples=15, deadline=None)
@given(cuts=partition_strategy, order=order_strategy)
def test_oneperm_minhash_partition_invariant(cuts, order):
    from sketchlib.sketches.bbmh import OnePermMinHash
    whole = OnePermMinHash(8)
    whole.update(_STREAM)
    merged = _partials(lambda: OnePermMinHash(8), cuts, list(order))
    assert (merged.mins == whole.mins).all()


@settings(max_examples=15, deadline=None)
@given(cuts=partition_strategy, order=order_strategy)
def test_hyperminhash_partition_invariant(cuts, order):
    from sketchlib.sketches.hmh import HyperMinHash
    whole = HyperMinHash(8, 10)
    whole.update(_STREAM)
    merged = _partials(lambda: HyperMinHash(8, 10), cuts, list(order))
    assert (merged.ranks == whole.ranks).all()
    assert (merged.mants == whole.mants).all()


@settings(max_examples=15, deadline=None)
@given(cuts=partition_strategy, order=order_strategy)
def test_setsketch_partition_invariant(cuts, order):
    from sketchlib.sketches.setsketch import SetSketch
    whole = SetSketch(8, base=1.2)
    whole.update(_STREAM)
    merged = _partials(lambda: SetSketch(8, base=1.2), cuts, list(order))
    assert (merged.registers == whole.registers).all()


@settings(max_examples=10, deadline=None)
@given(cuts=partition_strategy, order=order_strategy)
def test_counting_bloom_partition_invariant(cuts, order):
    """cbf layers are duplicate-insensitive ORs, but the layer a key
    reaches depends on its per-partition weight, so the merged sketch
    is a LOWER bound of the whole-stream build: every bit set in the
    merged filter is set in the sequential one."""
    from sketchlib.sketches.cbf import CountingBloom
    whole = CountingBloom(14, 3, 12)
    whole.update(_STREAM)
    merged = _partials(lambda: CountingBloom(14, 3, 12), cuts, list(order))
    assert (merged.words & ~whole.words).sum() == 0  # subset of bits
    # layer 0 (seen-at-all) is exactly order-independent
    assert (merged.words[0] == whole.words[0]).all()


@settings(max_examples=15, deadline=None)
@given(cuts=partition_strategy, order=order_strategy)
def test_ddsketch_partition_invariant(cuts, order):
    """DDSketch bucket-add merge is exact integer math: bit-exact
    under any partitioning while no collapse triggers (max_bins large
    enough for the stream's key range)."""
    from sketchlib.sketches.dd import DDSketch
    whole = DDSketch(alpha=0.02, max_bins=4096)
    whole.update(_STREAM.astype(np.float64))
    merged = _partials(lambda: DDSketch(alpha=0.02, max_bins=4096),
                       cuts, list(order))
    assert merged.count == whole.count and merged.mink == whole.mink
    assert (merged.bins == whole.bins).all()


@settings(max_examples=25, deadline=None)
@given(cuts=partition_strategy, order=order_strategy)
def test_misra_gries_exact_regime_partition_invariant(cuts, order):
    """k >= |distinct| => no trim ever fires => every count exact and
    the merged summary is partition/order-invariant bit-exactly."""
    from functools import partial

    from sketchlib.sketches.mg import MisraGries
    factory = partial(MisraGries, 4096)  # stream has <= 4000 distinct
    seq = factory()
    seq.update(_STREAM)
    acc = _partials(factory, cuts, order)
    assert np.array_equal(*(np.sort(s.values) for s in (acc, seq)))
    sv, sc = seq.items()
    av, ac = acc.items()
    assert np.array_equal(sv, av) and np.array_equal(sc, ac)


@settings(max_examples=25, deadline=None)
@given(cuts=partition_strategy, order=order_strategy)
def test_misra_gries_bound_any_merge_tree(cuts, order):
    """Trimming regime (k << distinct): for EVERY key,
    true - n/(k+1) <= est <= true over arbitrary merge trees —
    Agarwal et al. Mergeable Summaries Thm 1."""
    from functools import partial

    from sketchlib.sketches.mg import MisraGries
    k = 64
    factory = partial(MisraGries, k)
    acc = _partials(factory, cuts, order)
    keys, true_counts = np.unique(_STREAM, return_counts=True)
    est = acc.estimate(keys)
    slack = acc.n / (k + 1)
    assert np.all(est <= true_counts)
    assert np.all(est >= true_counts - slack)


@settings(max_examples=25, deadline=None)
@given(cuts=partition_strategy, order=order_strategy)
def test_packed_cm_partition_invariant(cuts, order):
    """Round 3: the bit-packed plain-CM core is merge-algebra-identical
    to the uint64 CountMin under ANY partitioning/merge order (both
    are linear; packing is storage, not semantics)."""
    from sketchlib.sketches.packedcm import CountMinPacked

    cfg = CMConfig(10, 5, 7, conservative=False)
    whole = CountMin(cfg)
    whole.update(_STREAM)
    merged = _partials(lambda: CountMinPacked(cfg, nbits=32),
                       cuts, list(order))
    assert (merged.to_unpacked().core == whole.core).all()


@settings(max_examples=25, deadline=None)
@given(cuts=partition_strategy, order=order_strategy,
       n=st.integers(min_value=1, max_value=3))
def test_countsketch_fold_commutes_with_any_merge_tree(cuts, order, n):
    """Round 3: fold(n) is a linear map, so folding the partials then
    merging equals merging then folding — and both equal the direct
    build at the smaller width — under ANY partitioning/merge order."""
    whole = CountSketch(10 - n, 5, 7)
    whole.update(_STREAM)
    merged = _partials(lambda: CountSketch(10, 5, 7), cuts, list(order))
    assert (merged.fold(n).core == whole.core).all()
