"""Consistent weighted sampling — weighted-Jaccard MinHash.

Semantics follow the reference's vendored CWS module (reference:
include/mult.h:24-176), which implements Ioffe, "Improved Consistent
Sampling, Weighted Minhash and L1 Sketching" (ICDM 2010) — the
published algorithm this implementation codes directly from:

for each hash slot k and feature f with weight w > 0:
    r, c ~ Gamma(2, 1),  beta ~ U(0, 1)   (seeded per (k, f))
    t  = floor(ln(w)/r + beta)
    y  = exp(r * (t - beta))
    a  = c / (y * exp(r))
sample_k = argmin_f a;  signature stores (f, t_f)

P[sample_k(A) == sample_k(B)] = J_w(A, B) — the weighted Jaccard
sum-min/sum-max — so the collision fraction of two signatures is an
unbiased estimator. Merge over disjoint feature spaces is undefined
(a CWS signature summarizes one weighted vector), so this class is a
per-entity signature (like SimHash/SRP), not a mergeable stream
sketch; it plugs into grouped pipelines the same way the dedup
signatures do.
"""

from __future__ import annotations

import numpy as np

_U64 = np.uint64


def _splitmix(z: np.ndarray) -> np.ndarray:
    """splitmix64 finalizer (Steele/Lea/Flood) — a counter-based mixer
    good enough for the CWS variates (bias checked empirically against
    exact weighted Jaccard across seeds)."""
    with np.errstate(over="ignore"):
        z = z + _U64(0x9E3779B97F4A7C15)
        z = (z ^ (z >> _U64(30))) * _U64(0xBF58476D1CE4E5B9)
        z = (z ^ (z >> _U64(27))) * _U64(0x94D049BB133111EB)
        return z ^ (z >> _U64(31))


def _slot_rng(seed: int, k: int, feats: np.ndarray) -> np.ndarray:
    """Deterministic per-(slot, feature) uniforms, fully vectorized:
    each feature's variates depend only on (seed, slot, feature) —
    the consistency property CWS requires (a feature's sample must not
    change with which other features are present)."""
    with np.errstate(over="ignore"):
        base = (feats.astype(_U64) * _U64(0x9E3779B97F4A7C15)
                + _U64(k) * _U64(0xBF58476D1CE4E5B9)
                + _U64(seed) * _U64(0xD6E8FEB86659FD93))
    out = np.empty((5, feats.size), dtype=np.float64)
    for i in range(5):
        with np.errstate(over="ignore"):
            h = _splitmix(_splitmix(base + _U64(i) * _U64(0x94D049BB133111EB)))
        out[i] = (h >> _U64(11)).astype(np.float64) / float(1 << 53)
    return out


class CWSSignature:
    """Weighted-MinHash signature of one sparse weighted vector."""

    def __init__(self, n_hashes: int = 64, seed: int = 7):
        self.n_hashes = n_hashes
        self.seed = seed

    def signature(self, feats: np.ndarray, weights: np.ndarray):
        """(n_hashes, 2) int64 array of (feature, t) samples."""
        feats = np.asarray(feats, dtype=np.int64)
        weights = np.asarray(weights, dtype=np.float64)
        keep = weights > 0
        feats, weights = feats[keep], weights[keep]
        assert feats.size > 0
        sig = np.empty((self.n_hashes, 2), dtype=np.int64)
        logw = np.log(weights)
        for k in range(self.n_hashes):
            u = _slot_rng(self.seed, k, feats)
            tiny = 1e-12
            # Gamma(2,1) via inverse-free sum of two exponentials
            r = -np.log(np.maximum(u[0], tiny)) \
                - np.log(np.maximum(u[1], tiny))
            c = -np.log(np.maximum(u[2], tiny)) \
                - np.log(np.maximum(u[3], tiny))
            beta = u[4]
            t = np.floor(logw / r + beta)
            y = np.exp(r * (t - beta))
            a = c / (y * np.exp(r))
            j = int(np.argmin(a))
            sig[k, 0] = feats[j]
            sig[k, 1] = int(t[j])
        return sig

    @staticmethod
    def similarity(sig_a: np.ndarray, sig_b: np.ndarray) -> float:
        """Collision fraction — unbiased estimate of weighted
        Jaccard."""
        eq = (sig_a[:, 0] == sig_b[:, 0]) & (sig_a[:, 1] == sig_b[:, 1])
        return float(eq.mean())
