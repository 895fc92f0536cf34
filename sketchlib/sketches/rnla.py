"""RNLA kit — count-sketch transform and tensor sketch for vectors.

Semantics follow the reference's vendored randomized-numerical-linear-
algebra module (reference: include/rnla.h): compress dense/sparse
vectors with the count-sketch transform S·x (one hashed, signed
accumulation per coordinate — Charikar et al.; inner products are
preserved in expectation: E[<Sx, Sy>] = <x, y>), and sketch OUTER
products via the tensor sketch (Pham & Pagh, KDD 2013): the
count-sketch of x ⊗ y equals the circular convolution of the
individual count-sketches, computed in O(d log d) with FFT.

These are stateless linear transforms (the "sketch" is the output
vector, mergeable by plain addition since S is linear), so the API is
functional: ``cs_transform`` / ``tensor_sketch`` + ``dot`` on the
compressed representations.
"""

from __future__ import annotations

import numpy as np

from sketchlib.hashing import wang_hash_u64

_U64 = np.uint64


def _hash_sign(dim: int, out_dim: int, seed: int):
    idx = np.arange(dim, dtype=np.uint64)
    h = wang_hash_u64(idx ^ _U64(seed))
    cols = (h % _U64(out_dim)).astype(np.int64)
    signs = np.where((h >> _U64(63)) & _U64(1), 1.0, -1.0)
    return cols, signs


def cs_transform(x: np.ndarray, out_dim: int, seed: int = 7) -> np.ndarray:
    """Count-sketch transform S·x: coordinate i adds s(i)·x[i] into
    bucket h(i). Linear: cs(x + y) = cs(x) + cs(y), so compressed
    vectors merge by addition; E[<Sx, Sy>] = <x, y> with variance
    ~ ||x||^2 ||y||^2 / out_dim."""
    x = np.asarray(x, dtype=np.float64)
    cols, signs = _hash_sign(x.size, out_dim, seed)
    out = np.zeros(out_dim, dtype=np.float64)
    np.add.at(out, cols, signs * x)
    return out


def cs_transform_batch(X: np.ndarray, out_dim: int,
                       seed: int = 7) -> np.ndarray:
    """(n, d) -> (n, out_dim) via one scatter-add per column group —
    the Arrow-batch form used inside pandas UDFs."""
    X = np.asarray(X, dtype=np.float64)
    cols, signs = _hash_sign(X.shape[1], out_dim, seed)
    out = np.zeros((X.shape[0], out_dim), dtype=np.float64)
    np.add.at(out, (slice(None), cols), signs[None, :] * X)
    return out


def tensor_sketch(x: np.ndarray, y: np.ndarray, out_dim: int,
                  seed: int = 7) -> np.ndarray:
    """Count-sketch of the outer product x ⊗ y without materializing
    it: FFT-domain product of the two independent count-sketches
    (circular convolution theorem — Pham & Pagh 2013).
    E[<ts(x1,y1), ts(x2,y2)>] = <x1,x2> · <y1,y2>."""
    cx = np.fft.rfft(cs_transform(x, out_dim, seed))
    cy = np.fft.rfft(cs_transform(y, out_dim, seed + 1))
    return np.fft.irfft(cx * cy, n=out_dim)


def dot(a: np.ndarray, b: np.ndarray) -> float:
    """Inner product of compressed representations — the estimator of
    the original inner product."""
    return float(np.dot(a, b))
