"""Counter-based RNG streams for the opt-in probabilistic sketch paths.

The reference's HeavyKeeper / counting-Bloom / count-min-log update
rules flip biased coins per occurrence (reference: include/hk.h:168-207
``random_sample(count)``, include/cbf.h:58-70 promotion coin,
include/update.h:35-72 ``PowerOfTwo``).  The repo's default variants
replace those coins with their expectation so the strict driver gates
hold; the ``probabilistic=True`` paths restore the randomized
semantics using a COUNTER-BASED stream (splitmix64 over
(seed, key, draw#)) — the same trick as cws.py's ``_slot_rng`` — so a
given (seed, value) replays identically regardless of partitioning or
batch boundaries: reproducible randomness, no global RNG state.

``Geometric(p)`` draws give the number of Bernoulli(p) trials up to
and including the first success — the standard inversion
``ceil(ln u / ln(1-p))`` — which lets a weighted update consume w
occurrences in O(successes) instead of O(w) coin flips.
"""

from __future__ import annotations

import math

import numpy as np

_U64 = np.uint64
_GOLD = 0x9E3779B97F4A7C15
_MIX1 = 0xBF58476D1CE4E5B9
_MIX2 = 0x94D049BB133111EB
_MASK = (1 << 64) - 1


def _splitmix_int(z: int) -> int:
    """splitmix64 finalizer on plain ints (scalar path)."""
    z = (z + _GOLD) & _MASK
    z = ((z ^ (z >> 30)) * _MIX1) & _MASK
    z = ((z ^ (z >> 27)) * _MIX2) & _MASK
    return z ^ (z >> 31)


class CounterRNG:
    """Deterministic uniform stream keyed by (seed, key): draw ``i`` is
    a pure function of (seed, key, i)."""

    __slots__ = ("base", "ctr")

    def __init__(self, seed: int, key: int):
        self.base = _splitmix_int((int(seed) * _MIX1 + int(key) * _MIX2)
                                  & _MASK)
        self.ctr = 0

    def uniform(self) -> float:
        """Uniform in (0, 1] (never 0 — safe under log)."""
        self.ctr += 1
        h = _splitmix_int((self.base + self.ctr * _GOLD) & _MASK)
        return ((h >> 11) + 1) / float(1 << 53)

    def geometric(self, p: float) -> int:
        """Number of Bernoulli(p) trials up to and including the first
        success; inversion method. p must be in (0, 1]."""
        if p >= 1.0:
            return 1
        u = self.uniform()
        # uniform() has support (0, 1]; at u == 1.0 (prob 2^-53)
        # ceil(log(1)/log1p(-p)) = ceil(-0.0) = 0, i.e. "success
        # before any trial" — callers assume >= 1 trial
        return max(1, int(math.ceil(math.log(u) / math.log1p(-p))))
