"""Published CM ε–δ guarantee (Cormode & Muthukrishnan 2005):

with width w and depth d, for every key: est >= true (one-sided), and
Pr[est - true >= (e/w) * N] <= e^-d. Asserted on seeded Zipf streams
across multiple hash seeds, with the violation fraction compared to
δ = e^-d plus sampling slack. This is the §5.5(3) bound test scoped to
the distributed-mergeable plain CM (any partitioning — partials merged
in random order)."""

from __future__ import annotations

import math

import numpy as np
import pytest

from sketchlib.sketches.cm import CMConfig, CountMin

W_BITS = 9          # w = 512 — deliberately loaded
DEPTH = 4
E = math.e


def _stream(seed: int, n: int = 60000) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return (rng.zipf(1.25, n) % 20000).astype(np.uint64)


@pytest.mark.parametrize("hash_seed", [3, 137, 9999])
def test_cm_one_sided_and_epsilon_delta(hash_seed):
    s = _stream(hash_seed * 7 + 1)
    keys, true = np.unique(s, return_counts=True)
    n_total = len(s)

    # distributed build: random partitioning, random merge order
    rng = np.random.default_rng(hash_seed)
    parts = np.array_split(s, 9)
    acc = None
    for i in rng.permutation(9):
        p = CountMin(CMConfig(W_BITS, DEPTH, hash_seed, conservative=False))
        p.update(parts[i])
        acc = p if acc is None else acc.merge(p)

    est = acc.estimate(keys).astype(np.int64)
    err = est - true.astype(np.int64)
    assert (err >= 0).all()                      # one-sided, always

    eps_n = math.ceil(E * n_total / (1 << W_BITS))
    delta = E ** (-DEPTH)                        # ~0.018
    violations = float((err > eps_n).mean())
    # sampling slack: 3 sigma of a Bernoulli(delta) over len(keys) trials
    slack = 3 * math.sqrt(delta * (1 - delta) / len(keys))
    assert violations <= delta + slack, (violations, delta, slack)


def test_conservative_never_worse_than_plain_bound():
    """Conservative CM inherits the plain-CM ε–δ bound (est_cons <=
    est_plain pointwise), distributed with sum merge."""
    s = _stream(42)
    keys, true = np.unique(s, return_counts=True)
    plain = CountMin(CMConfig(W_BITS, DEPTH, 21, conservative=False))
    plain.update(s)
    parts = np.array_split(s, 5)
    acc = None
    for p_ in parts:
        p = CountMin(CMConfig(W_BITS, DEPTH, 21, conservative=True))
        p.update(p_)
        acc = p if acc is None else acc.merge(p)
    est_c = acc.estimate(keys)
    est_p = plain.estimate(keys)
    assert (est_c >= true).all()
    assert (est_c <= est_p).all()
