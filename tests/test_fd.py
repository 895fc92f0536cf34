"""Frequent Directions matrix sketch (sketchlib/sketches/fd.py).

Liberty KDD'13 / Ghashami et al. SICOMP'16 guarantees:
- 0 <= x^T (A^T A - B^T B) x <= ||A||_F^2 / ell (deterministic);
- merging two sketches preserves the same bound;
- exact regime: no shrink ever fires => gram == A^T A, bit-exact on
  integer-valued inputs under any partitioning (the strict-gate
  regime the driver query uses);
- blob round trip; ell > d never loops (rank-exact compression).
"""

import numpy as np
import pytest
from pyspark.sql import functions as F

from sketchlib.sketches.base import deserialize
from sketchlib.sketches.fd import FrequentDirections


@pytest.fixture(scope="module")
def lowrank():
    rng = np.random.default_rng(7)
    return rng.normal(size=(3000, 64)) @ np.diag(np.linspace(3, 0.1, 64))


def test_fd_deterministic_bound_and_psd(lowrank):
    A = lowrank
    fd = FrequentDirections(16, 64)
    fd.update(A)
    diff = A.T @ A - fd.gram()
    assert np.linalg.norm(diff, 2) <= (A ** 2).sum() / 16
    assert np.linalg.eigvalsh(diff).min() >= -1e-6  # underestimate

    x = np.random.default_rng(0).normal(size=64)
    assert fd.quad_form(x) == pytest.approx(float(x @ fd.gram() @ x),
                                            rel=1e-9)


def test_fd_merge_preserves_bound(lowrank):
    A = lowrank
    parts = np.array_split(A, 7)
    acc = None
    for p in parts:
        s = FrequentDirections(16, 64)
        s.update(p)
        s = deserialize(s.to_bytes())        # blob round trip en route
        acc = s if acc is None else acc.merge(s)
    diff = A.T @ A - acc.gram()
    assert np.linalg.norm(diff, 2) <= (A ** 2).sum() / 16
    assert acc.rows.shape[0] <= 32


def test_fd_ell_above_dim_is_exact_and_terminates():
    rng = np.random.default_rng(3)
    A = rng.normal(size=(5000, 8))
    fd = FrequentDirections(32, 8)             # ell > d: rank-exact
    fd.update(A)
    assert fd.rows.shape[0] <= 2 * 32          # buffer invariant
    assert np.allclose(fd.gram(), A.T @ A, rtol=1e-9)


def test_fd_exact_regime_bitexact_any_partitioning():
    rng = np.random.default_rng(5)
    X = rng.integers(-100, 100, size=(60, 16)).astype(float)
    want = X.T @ X
    for splits in (1, 3, 7):
        acc = None
        for p in np.array_split(X, splits):
            s = FrequentDirections(64, 16)
            if len(p):
                s.update(p)
            acc = s if acc is None else acc.merge(s)
        assert np.array_equal(acc.gram(), want)


def test_fd_distributed_build_exact(spark):
    from functools import partial

    from sketchlib.aggregate import build_sketch

    rng = np.random.default_rng(11)
    X = rng.integers(-50, 50, size=(200, 8)).astype(float)
    df = spark.createDataFrame(
        [(x.tolist(),) for x in X], "v array<double>").repartition(9)
    fd = build_sketch(df, "v", partial(FrequentDirections, 256, 8),
                      as_u64=False)
    assert np.array_equal(fd.gram(), X.T @ X)
