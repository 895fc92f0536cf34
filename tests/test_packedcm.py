"""Bit-packed CM counters (reference compact::vector, include/
ccm.h:33-42 — the last declared-skip of SURVEY §1.1, closed round 3).

Gates:
- PackedVector get/set roundtrip vs a plain array at awkward widths
  (fields spanning word boundaries, shared words, width 64 edge);
- CountMinPacked (conservative AND plain) is BIT-IDENTICAL to the
  uint64 CountMin when no counter overflows, under arbitrary
  partitioned merge trees;
- blob size shrinks by ~64/nbits;
- serialization roundtrip through the blob registry.
"""

from __future__ import annotations

import numpy as np
import pytest

from sketchlib.sketches.base import deserialize
from sketchlib.sketches.cm import CMConfig, CountMin
from sketchlib.sketches.packedcm import CountMinPacked, PackedVector


@pytest.mark.parametrize("nbits", [1, 5, 8, 13, 31, 63, 64])
def test_packed_vector_roundtrip(nbits):
    rng = np.random.default_rng(nbits)
    n = 999
    ref = rng.integers(0, 2, size=n).astype(np.uint64) if nbits == 1 else \
        rng.integers(0, min(1 << nbits, 2**63), size=n).astype(np.uint64)
    pv = PackedVector(nbits, n)
    pv.encode_all(ref)
    assert np.array_equal(pv.decode_all(), ref)
    # scattered update of a random subset, including word-sharing pairs
    idx = rng.choice(n, size=200, replace=False)
    vals = rng.integers(0, min(1 << nbits, 2**63),
                        size=200).astype(np.uint64)
    pv.set(idx, vals)
    ref[idx] = vals & pv.mask
    assert np.array_equal(pv.decode_all(), ref)
    assert np.array_equal(pv.get(idx), ref[idx])


def _stream(seed, n=4000, universe=300):
    rng = np.random.default_rng(seed)
    return (rng.zipf(1.4, size=n) % universe).astype(np.uint64)


@pytest.mark.parametrize("conservative", [True, False])
def test_packed_cm_bit_identical_to_plain(conservative):
    cfg = CMConfig(8, 5, 137, conservative)
    a, b = CountMin(cfg), CountMinPacked(cfg, nbits=16)
    for seed in (1, 2, 3):  # three partitions, merged
        u, c = np.unique(_stream(seed), return_counts=True)
        a.update_weighted(u, c.astype(np.int64))
        b.update_weighted(u, c.astype(np.int64))
    assert np.array_equal(b.to_unpacked().core, a.core)
    probe = np.arange(300, dtype=np.uint64)
    assert np.array_equal(b.estimate(probe), a.estimate(probe))


def test_packed_cm_merge_matches_plain_merge():
    cfg = CMConfig(8, 3, 137, True)
    pa, pb = CountMinPacked(cfg, 16), CountMinPacked(cfg, 16)
    ca, cb = CountMin(cfg), CountMin(cfg)
    for sk, seed in ((pa, 10), (pb, 11), (ca, 10), (cb, 11)):
        sk.update(_stream(seed))
    merged = pa.merge(pb).to_unpacked().core
    assert np.array_equal(merged, ca.merge(cb).core)


def test_packed_blob_shrinks_and_roundtrips():
    cfg = CMConfig(12, 5, 137, True)
    wide = CountMin(cfg)
    # nbits=16: the zipf hot key's count (~1.5k) must fit the counter
    # (overflow wraps mod 2^nbits by contract, which would diverge)
    packed = CountMinPacked(cfg, nbits=16)
    vals = _stream(7)
    u, c = np.unique(vals, return_counts=True)
    wide.update_weighted(u, c.astype(np.int64))
    packed.update_weighted(u, c.astype(np.int64))
    blob = packed.to_bytes()
    # 16-bit counters ~ 1/4 the raw uint64 core (5*4096*8 bytes)
    assert len(blob) < 5 * 4096 * 8 / 3
    back = deserialize(blob)
    assert isinstance(back, CountMinPacked)
    assert np.array_equal(back.to_unpacked().core, wide.core)
    assert np.array_equal(back.pv.words, packed.pv.words)


def test_packed_wraps_mod_2b_documented():
    cfg = CMConfig(4, 3, 137, False)
    sk = CountMinPacked(cfg, nbits=4)
    one = np.array([7], dtype=np.uint64)
    for _ in range(17):  # 17 > 2^4-1 => wraps, like compact::vector
        sk.update(one)
    assert sk.estimate(one)[0] == 17 % 16
