"""Count-min sketch family: plain, conservative, and offline (OCM/OCCM).

Re-implements the semantics of the reference's ``ccmbase``
(reference: include/ocm.h:13-236) and ``ocmbase``
(reference: include/ocm.h:242-586) as vectorized numpy kernels designed
for Spark's partial/final aggregation model:

- geometry: counter table ``core`` of shape ``(nh, 2**np_bits)`` uint64;
  cell for value ``v`` in row ``r`` is ``wang(v ^ seed_r) & mask``
  (reference position formula include/ocm.h:289-293);
- seeds from ``mt19937_64(seed + 4)`` with ``nh`` forced odd
  (include/ocm.h:266-274) — bit-exact, see sketchlib.hashing;
- plain update: +1 every row (include/ocm.h:46-56) — fully
  order-independent, so a distributed build (per-partition partials,
  elementwise-sum merge) is **bit-exact** vs any sequential order;
- conservative update: +1 only on cells at the row-set minimum
  (include/ocm.h:57-67) — order-dependent; the distributed build is
  equivalent to *some* sequential order of the same multiset, so the
  one-sided guarantee (est >= true) and the CM epsilon-delta bound hold;
  ``strict_order=True`` reproduces the reference's stream order
  bit-for-bit (used by the golden tests);
- merge: elementwise sum, matching the vendored library's CM merge
  (reference: include/ccm.h:401-407, include/update.h:29-33) —
  associative and commutative.

Offline variants (OCM plain / OCCM conservative, multi-round with a
per-cell collision table) live in :class:`OfflineCountMin`; the round
orchestration is in sketchlib.offline.
"""

from __future__ import annotations

import io
import struct
from dataclasses import dataclass

import numpy as np

from sketchlib.hashing import derive_seeds, row_positions

_U64 = np.uint64


@dataclass(frozen=True)
class CMConfig:
    np_bits: int
    nh: int
    seed: int = 137
    conservative: bool = True

    @property
    def nh_odd(self) -> int:
        return self.nh + (1 if self.nh % 2 == 0 else 0)

    @property
    def width(self) -> int:
        return 1 << self.np_bits


def _sorted_unique(vals: np.ndarray):
    """Sort the batch and collapse to (unique values, multiplicities)."""
    vals = np.asarray(vals, dtype=_U64)
    u, counts = np.unique(vals, return_counts=True)
    return u, counts.astype(np.int64)


def _combine_weighted(vals: np.ndarray, weights) -> tuple:
    """Combine (value, count) pairs with possibly repeated values."""
    vals = np.asarray(vals, dtype=_U64)
    weights = np.asarray(weights, dtype=np.int64)
    order = np.argsort(vals, kind="stable")
    sv, sc = vals[order], weights[order]
    u, starts = np.unique(sv, return_index=True)
    csum = np.concatenate(([0], np.cumsum(sc)))
    counts = csum[np.append(starts[1:], sv.shape[0])] - csum[starts]
    return u, counts


_NARROW = [(np.uint8, 0), (np.uint16, 1), (np.uint32, 2), (np.uint64, 3)]
_CODE_DTYPE = {c: d for d, c in _NARROW}
_SPARSE_BIT = 0x80


def _pack_u64(arr: np.ndarray) -> tuple[int, bytes]:
    """Serialize a uint64-semantics array compactly.

    Two layers, both measured to matter for merge traffic:
    - narrowest lossless integer width (partial counters are tiny);
    - sparse (int64 indices + values) when mostly zero — a partition's
      partial CM at w=2^20 is typically ~5% nonzero, so this is the
      difference between ~15 MB and ~2 MB per partial blob.
    Code byte: low 2 bits = value dtype, high bit = sparse flag.
    """
    flat = arr.reshape(-1)
    mx = int(flat.max()) if flat.size else 0
    code = next(c for dt, c in _NARROW if mx <= np.iinfo(dt).max)
    dt = _CODE_DTYPE[code]
    nz = np.flatnonzero(flat)
    dense_bytes = flat.size * np.dtype(dt).itemsize
    sparse_bytes = nz.size * (8 + np.dtype(dt).itemsize) + 8
    if sparse_bytes < dense_bytes:
        payload = (struct.pack("<Q", nz.size) + nz.tobytes()
                   + flat[nz].astype(dt).tobytes())
        return code | _SPARSE_BIT, payload
    return code, flat.astype(dt).tobytes()


def _unpack_u64(code: int, data: bytes, offset: int, count: int,
                shape) -> tuple[np.ndarray, int]:
    """Returns (array, bytes consumed)."""
    dt = _CODE_DTYPE[code & 0x03]
    if code & _SPARSE_BIT:
        (nnz,) = struct.unpack_from("<Q", data, offset)
        idx = np.frombuffer(data, dtype=np.int64, offset=offset + 8,
                            count=nnz)
        vals = np.frombuffer(data, dtype=dt,
                             offset=offset + 8 + nnz * 8, count=nnz)
        out = np.zeros(count, dtype=_U64)
        out[idx] = vals
        used = 8 + nnz * (8 + np.dtype(dt).itemsize)
        return out.reshape(shape), used
    arr = np.frombuffer(data, dtype=dt, offset=offset, count=count)
    return arr.astype(_U64).reshape(shape), count * np.dtype(dt).itemsize


class CountMin:
    """Single-pass CM sketch (plain or conservative update)."""

    MAGIC = b"SKCM"

    def __init__(self, config: CMConfig, core: np.ndarray | None = None):
        self.config = config
        self.seeds = derive_seeds(config.seed, config.nh)
        nh = config.nh_odd
        if core is None:
            core = np.zeros((nh, config.width), dtype=_U64)
        assert core.shape == (nh, config.width)
        self.core = core

    # ------------------------------------------------------------- update
    def update(self, vals: np.ndarray, strict_order: bool = False) -> None:
        if len(vals) == 0:
            return
        vals = np.asarray(vals, dtype=_U64)
        if not self.config.conservative:
            self._update_plain(vals)
        elif strict_order:
            self._update_conservative_strict(vals)
        else:
            u, counts = _sorted_unique(vals)
            self._apply_conservative(u, counts)

    def update_weighted(self, vals: np.ndarray, counts: np.ndarray) -> None:
        """Weighted update: ``counts[i]`` occurrences of ``vals[i]``.

        The scale path: the caller pre-aggregates the token stream with
        a JVM-side ``groupBy(col).count()`` (map-side combine), so the
        Python kernel sees |distinct| weighted rows instead of |stream|
        rows. Bit-exact vs unweighted for the plain variant; for the
        conservative variant it equals processing each value's
        occurrences consecutively (a valid sequential order — the
        documented batch semantics)."""
        if len(vals) == 0:
            return
        vals, counts = _combine_weighted(vals, counts)
        if not self.config.conservative:
            cols = row_positions(vals, self.seeds, self.config.np_bits)
            w = self.config.width
            for r in range(self.core.shape[0]):
                self.core[r] += np.bincount(
                    cols[r].astype(np.int64), weights=counts, minlength=w
                ).astype(_U64)
        else:
            self._apply_conservative(vals, counts)

    def _update_plain(self, vals: np.ndarray) -> None:
        # bincount per row == one +1 per (row, cell) hit; order-free.
        cols = row_positions(vals, self.seeds, self.config.np_bits)
        w = self.config.width
        for r in range(self.core.shape[0]):
            self.core[r] += np.bincount(
                cols[r].astype(np.int64), minlength=w
            ).astype(_U64)

    def _update_conservative_strict(self, vals: np.ndarray) -> None:
        """Reference stream order (include/ocm.h:57-67), with bit-exact
        adjacent-duplicate collapsing: c consecutive updates of one value
        raise its row-set minimum by exactly c."""
        cols = row_positions(vals, self.seeds, self.config.np_bits)
        rows = np.arange(self.core.shape[0])
        core = self.core
        n = vals.shape[0]
        i = 0
        while i < n:
            j = i + 1
            while j < n and vals[j] == vals[i]:
                j += 1
            p = cols[:, i]
            v = core[rows, p]
            core[rows, p] = np.maximum(v, v.min() + _U64(j - i))
            i = j

    def _apply_conservative(self, u: np.ndarray, counts: np.ndarray) -> None:
        """Vectorized conservative update of (unique value, count) pairs.

        Equivalent to *some* sequential order of the multiset: values
        whose cell sets are disjoint from every other value in the batch
        commute, so they are applied simultaneously; the (rare at
        realistic widths) cell-sharing values are applied sequentially
        afterwards. c consecutive updates of one value raise its row-set
        minimum by exactly c: new_v = max(v, min(v) + c).
        """
        cols = row_positions(u, self.seeds, self.config.np_bits)  # (nh, U)
        nh = self.core.shape[0]
        w = self.config.width
        # global flat cell ids to detect cross-value cell sharing
        flat = (cols + (np.arange(nh, dtype=_U64)[:, None] << _U64(self.config.np_bits)))
        cells, cell_counts = np.unique(flat, return_counts=True)
        shared = cells[cell_counts > 1]
        if shared.size:
            conflicted = np.isin(flat, shared).any(axis=0)
        else:
            conflicted = np.zeros(u.shape[0], dtype=bool)
        core_flat = self.core.reshape(-1)

        free = ~conflicted
        if free.any():
            P = flat[:, free].astype(np.int64)          # (nh, Uf)
            V = core_flat[P]                             # gather
            m = V.min(axis=0) + counts[free].astype(_U64)
            core_flat[P] = np.maximum(V, m[None, :])
        if conflicted.any():
            idxs = np.flatnonzero(conflicted)
            for t in idxs:
                p = flat[:, t].astype(np.int64)
                v = core_flat[p]
                core_flat[p] = np.maximum(v, v.min() + _U64(counts[t]))

    # ------------------------------------------------------------ queries
    def estimate(self, vals: np.ndarray) -> np.ndarray:
        """Point estimate: min over rows (include/ocm.h:71-83)."""
        vals = np.asarray(vals, dtype=_U64)
        if vals.size == 0:
            return np.empty(0, dtype=_U64)
        cols = row_positions(vals, self.seeds, self.config.np_bits)
        rows = np.arange(self.core.shape[0])[:, None]
        return self.core[rows, cols.astype(np.int64)].min(axis=0)

    def estimate_mean_min(self, vals: np.ndarray) -> np.ndarray:
        """Count-mean-min point estimate (L5).

        The vendored library declares this sketch but never finished
        it — the reference ``cmmbase_t`` constructor throws
        ``NotImplementedError`` (reference: include/ccm.h:822-837) —
        so semantics here follow the published algorithm (Deng &
        Rafiei, CIKM 2007, "New estimation algorithms for streaming
        data: count-min can do more"): per row subtract the expected
        collision noise ``(N - cell) / (w - 1)`` where ``N`` is the
        total update count (recovered exactly as any row's sum — every
        plain update increments each row once), take the median over
        the (odd) row count, and clamp into ``[0, CM-min]``. Unbiased
        where plain CM is one-sided; intended for plain (non-
        conservative) cores.
        """
        vals = np.asarray(vals, dtype=_U64)
        if vals.size == 0:
            return np.empty(0, dtype=np.float64)
        cols = row_positions(vals, self.seeds, self.config.np_bits)
        rows = np.arange(self.core.shape[0])[:, None]
        cells = self.core[rows, cols.astype(np.int64)].astype(np.float64)
        n_total = self.core.sum(axis=1).astype(np.float64)[:, None]
        w = float(self.config.width)
        corrected = cells - (n_total - cells) / (w - 1.0)
        med = np.median(corrected, axis=0)
        return np.clip(med, 0.0, cells.min(axis=0))

    # -------------------------------------------------------------- merge
    def fold(self, n: int = 1) -> "CountMin":
        """CM analog of count-sketch ``fold`` (include/ccm.h:576-588):
        per row, sum cells whose positions alias modulo the new width
        ``w >> n`` (positions are the low ``np_bits`` hash bits, so the
        aliasing is exact).

        PLAIN CM: ``build(w).fold(n)`` is bit-identical to
        ``build(w >> n)`` (both are linear in the update stream) and
        fold commutes with merge. CONSERVATIVE CM: folding a
        conservative-built core is NOT the same array as building
        conservatively at the smaller width (the update rule is
        nonlinear), but the one-sided guarantee survives: every cell a
        key maps to is >= its true count, and summing the nonnegative
        aliased cell keeps it so — ``fold().estimate(x) >= true(x)``,
        property-tested."""
        if not 1 <= n <= self.config.np_bits:
            raise ValueError(f"fold n={n} out of range for "
                             f"np_bits={self.config.np_bits}")
        cfg = CMConfig(self.config.np_bits - n, self.config.nh,
                       self.config.seed, self.config.conservative)
        core = (self.core.reshape(self.core.shape[0], -1, cfg.width)
                .sum(axis=1, dtype=_U64))
        return CountMin(cfg, core)

    def merge(self, other: "CountMin") -> "CountMin":
        assert self.config == other.config
        self.core += other.core
        return self

    def intersect(self, other: "CountMin") -> "CountMin":
        """Elementwise-min intersection (reference include/ccm.h:393-400
        ``&=``): estimates on the result upper-bound the multiset
        intersection ``min(count_A(k), count_B(k))`` per key, and equal
        it exactly when both sketches are collision-free. Returns a new
        sketch; neither input is mutated."""
        assert self.config == other.config
        return CountMin(self.config, np.minimum(self.core, other.core))

    # ---------------------------------------------------------- serialize
    def to_bytes(self) -> bytes:
        """Internal versioned blob (shipped between executors/driver);
        counters stored at the narrowest lossless width."""
        buf = io.BytesIO()
        c = self.config
        code, payload = _pack_u64(self.core)
        buf.write(self.MAGIC)
        buf.write(struct.pack("<BIIQBB", 2, c.np_bits, c.nh, c.seed,
                              1 if c.conservative else 0, code))
        buf.write(payload)
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountMin":
        assert data[:4] == cls.MAGIC
        _, np_bits, nh, seed, cons, code = struct.unpack_from("<BIIQBB",
                                                              data, 4)
        cfg = CMConfig(np_bits, nh, seed, bool(cons))
        off = 4 + struct.calcsize("<BIIQBB")
        core, _ = _unpack_u64(code, data, off, cfg.nh_odd * cfg.width,
                              (cfg.nh_odd, cfg.width))
        return cls(cfg, core)

    # -------------------------------------------- reference interchange IO
    def save_reference(self, path: str) -> None:
        """Reference binary format (include/ocm.h:216-233): little-endian
        ``np:u32, nh:u32, seed:u64`` header then row-major core u64s."""
        with open(path, "wb") as fh:
            fh.write(struct.pack("<IIQ", self.config.np_bits,
                                 self.config.nh_odd, self.config.seed))
            fh.write(self.core.astype("<u8").tobytes())

    @classmethod
    def load_reference(cls, path: str, conservative: bool = True) -> "CountMin":
        with open(path, "rb") as fh:
            np_bits, nh, seed = struct.unpack("<IIQ", fh.read(16))
            core = np.fromfile(fh, dtype="<u8", count=nh << np_bits)
        cfg = CMConfig(np_bits, nh, seed, conservative)
        return cls(cfg, core.astype(_U64).reshape(nh, 1 << np_bits))


class OfflineCountMin:
    """Offline CM (OCM plain / OCCM conservative) with a per-cell
    collision table, matching ``ocmbase`` (include/ocm.h:242-586).

    Per-item strict kernels replicate the reference's in-pass mutation
    order exactly (golden tests); the batch kernels used by the
    distributed build freeze the collision table per pass and merge
    collision flags by elementwise max — a documented order-independent
    variant that preserves the one-sided guarantee (SURVEY.md §7.5).
    """

    MAGIC = b"SKOC"

    def __init__(self, config: CMConfig,
                 core: np.ndarray | None = None,
                 collision: np.ndarray | None = None):
        self.config = config
        self.seeds = derive_seeds(config.seed, config.nh)
        nh = config.nh_odd
        if core is None:
            core = np.zeros((nh, config.width), dtype=_U64)
        if collision is None:
            collision = np.zeros((nh, config.width), dtype=np.int32)
        self.core = core
        self.collision = collision

    def clear_core(self) -> None:
        """Zero counters, keep collisions (include/ocm.h:277-281)."""
        self.core[:] = 0

    def _positions(self, vals: np.ndarray) -> np.ndarray:
        return row_positions(np.asarray(vals, dtype=_U64), self.seeds,
                             self.config.np_bits).astype(np.int64)

    # --------------------------------------------------- strict kernels
    def update_count_strict(self, vals, round_: int, total_round: int) -> None:
        """OCM plain offline count (include/ocm.h:283-299): increment
        every cell whose collision equals the row-set min collision."""
        cols = self._positions(vals)
        rows = np.arange(self.core.shape[0])
        for i in range(cols.shape[1]):
            p = cols[:, i]
            col = self.collision[rows, p]
            mc = col.min()
            sel = col == mc
            self.core[rows[sel], p[sel]] += _U64(1)

    def update_collision_strict(self, vals, round_: int, total_round: int) -> None:
        """OCM collision marking (include/ocm.h:350-377), with the
        reference's in-pass mutation of the collision table."""
        cols = self._positions(vals)
        rows = np.arange(self.core.shape[0])
        for i in range(cols.shape[1]):
            p = cols[:, i]
            col = self.collision[rows, p]
            if col.min() >= round_ - 2:
                v = self.core[rows, p]
                over = v > v.min()
                self.collision[rows[over], p[over]] = round_ - 1

    def update_count_collision_strict(self, vals, round_: int,
                                      total_round: int) -> None:
        """OCCM combined conservative count + in-pass collision marking
        (include/ocm.h:301-348)."""
        cols = self._positions(vals)
        rows = np.arange(self.core.shape[0])
        for i in range(cols.shape[1]):
            p = cols[:, i]
            col = self.collision[rows, p]
            mc = col.min()
            if mc < round_ - 1:
                sel = col == mc
                v = self.core[rows[sel], p[sel]]
                mn = v.min()
                at = v == mn
                self.core[rows[sel][at], p[sel][at]] = mn + _U64(1)
            else:
                v = self.core[rows, p]
                mn = v.min()
                if round_ < total_round:
                    over = v > mn
                    self.collision[rows[over], p[over]] = round_
                at = v == mn
                self.core[rows[at], p[at]] = mn + _U64(1)

    # ---------------------------------------------------- batch kernels
    def update_count_batch(self, vals, weights=None) -> None:
        """OCM plain offline count with the collision table frozen for
        the pass: per value, +count on cells at min collision. Given a
        frozen collision table this is order-independent, so partials
        sum-merge exactly like plain CM."""
        vals = np.asarray(vals, dtype=_U64)
        if vals.size == 0:
            return
        if weights is None:
            u, counts = _sorted_unique(vals)
        else:
            u, counts = _combine_weighted(vals, weights)
        cols = self._positions(u)                          # (nh, U)
        rows = np.arange(self.core.shape[0])[:, None]
        col = self.collision[rows, cols]                   # (nh, U)
        sel = col == col.min(axis=0)[None, :]
        add = np.where(sel, counts[None, :], 0).astype(_U64)
        np.add.at(self.core, (rows.repeat(cols.shape[1], 1), cols), add)

    def mark_collisions_batch(self, vals, round_: int,
                              prev_core: np.ndarray,
                              prev_collision: np.ndarray) -> np.ndarray:
        """Order-independent collision marking against *frozen* previous
        round state; returns a boolean flag array to max-merge."""
        vals = np.asarray(vals, dtype=_U64)
        flags = np.zeros_like(self.collision, dtype=bool)
        if vals.size == 0:
            return flags
        u, _ = _sorted_unique(vals)
        cols = self._positions(u)
        rows = np.arange(self.core.shape[0])[:, None]
        col = prev_collision[rows, cols]
        eligible = col.min(axis=0) >= round_ - 2
        if not eligible.any():
            return flags
        cols_e = cols[:, eligible]
        v = prev_core[rows, cols_e]
        over = v > v.min(axis=0)[None, :]
        r_idx = np.broadcast_to(rows, cols_e.shape)[over]
        flags[r_idx, cols_e[over]] = True
        return flags

    def update_count_collision_batch(self, vals, round_: int,
                                     total_round: int,
                                     weights=None) -> None:
        """OCCM conservative count with per-batch sorted-unique ordering
        (equivalent to some sequential order of the batch).

        Vectorized like the conservative CM batch kernel: tokens whose
        cell sets are disjoint from every other token in the batch
        commute, so both OCCM branches apply to all of them at once;
        the rare cell-sharing tokens fall back to a sequential loop.
        For a run of c duplicates the count rule collapses to
        new_v = max(v, min(v over branch set) + c), and the branch-2
        collision marks are exactly the first iteration's (v > min)
        cells — later iterations mark a subset.
        """
        vals = np.asarray(vals, dtype=_U64)
        if vals.size == 0:
            return
        if weights is None:
            u, counts = _sorted_unique(vals)
        else:
            u, counts = _combine_weighted(vals, weights)
        nh = self.core.shape[0]
        cols = self._positions(u)                       # (nh, U) int64
        flat = cols + (np.arange(nh, dtype=np.int64)[:, None]
                       << self.config.np_bits)
        cells, cell_counts = np.unique(flat, return_counts=True)
        shared = cells[cell_counts > 1]
        conflicted = (np.isin(flat, shared).any(axis=0) if shared.size
                      else np.zeros(u.shape[0], dtype=bool))
        core_flat = self.core.reshape(-1)
        coll_flat = self.collision.reshape(-1)
        rows = np.arange(nh)

        free = ~conflicted
        if free.any():
            P = flat[:, free]                            # (nh, Uf)
            C = coll_flat[P]                             # collisions
            V = core_flat[P]                             # counts
            cnt = counts[free].astype(_U64)
            mc = C.min(axis=0)
            b1 = mc < round_ - 1
            if b1.any():
                selmask = (C == mc[None, :]) & b1[None, :]
                big = np.iinfo(np.uint64).max
                vmin = np.where(selmask, V, _U64(big)).min(axis=0)
                target = np.where(selmask, vmin[None, :] + cnt[None, :],
                                  _U64(0))
                new = np.maximum(V, target)
                core_flat[P[:, b1]] = new[:, b1]
            b2 = ~b1
            if b2.any():
                P2 = P[:, b2]
                V2 = V[:, b2]
                mn = V2.min(axis=0)
                if round_ < total_round:
                    over = V2 > mn[None, :]
                    coll_flat[P2[over]] = np.int32(round_)
                core_flat[P2] = np.maximum(
                    V2, mn[None, :] + counts[free][b2].astype(_U64))
        if conflicted.any():
            for t in np.flatnonzero(conflicted):
                p = flat[:, t]
                col = coll_flat[p]
                mc = col.min()
                c = _U64(counts[t])
                if mc < round_ - 1:
                    sel = col == mc
                    v = core_flat[p[sel]]
                    core_flat[p[sel]] = np.maximum(v, v.min() + c)
                else:
                    v = core_flat[p]
                    mn = v.min()
                    if round_ < total_round:
                        over = v > mn
                        coll_flat[p[over]] = np.int32(round_)
                    core_flat[p] = np.maximum(v, mn + c)

    # ------------------------------------------------------------ query
    def estimate(self, vals: np.ndarray) -> np.ndarray:
        """Min count restricted to min-collision cells
        (include/ocm.h:379-399)."""
        vals = np.asarray(vals, dtype=_U64)
        if vals.size == 0:
            return np.empty(0, dtype=_U64)
        cols = self._positions(vals)
        rows = np.arange(self.core.shape[0])[:, None]
        col = self.collision[rows, cols]
        v = self.core[rows, cols]
        mask = col == col.min(axis=0)[None, :]
        big = np.iinfo(np.uint64).max
        return np.where(mask, v, _U64(big)).min(axis=0)

    # ------------------------------------------------------------ merge
    def merge(self, other: "OfflineCountMin") -> "OfflineCountMin":
        """Sum counts, max collisions (monotone flags) — SURVEY.md §7.5."""
        assert self.config == other.config
        self.core += other.core
        np.maximum(self.collision, other.collision, out=self.collision)
        return self

    # -------------------------------------------------------- serialize
    def to_bytes(self) -> bytes:
        buf = io.BytesIO()
        c = self.config
        code, payload = _pack_u64(self.core)
        # collision values are round numbers (tiny, mostly zero early)
        assert self.collision.min() >= 0
        ccode, cpayload = _pack_u64(self.collision.astype(_U64))
        buf.write(self.MAGIC)
        buf.write(struct.pack("<BIIQBBB", 3, c.np_bits, c.nh, c.seed,
                              1 if c.conservative else 0, code, ccode))
        buf.write(payload)
        buf.write(cpayload)
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "OfflineCountMin":
        assert data[:4] == cls.MAGIC
        _, np_bits, nh, seed, cons, code, ccode = struct.unpack_from(
            "<BIIQBBB", data, 4)
        cfg = CMConfig(np_bits, nh, seed, bool(cons))
        off = 4 + struct.calcsize("<BIIQBBB")
        nh_o, w = cfg.nh_odd, cfg.width
        core, used = _unpack_u64(code, data, off, nh_o * w, (nh_o, w))
        off += used
        collision, _ = _unpack_u64(ccode, data, off, nh_o * w, (nh_o, w))
        return cls(cfg, core, collision.astype(np.int32))

    # ------------------------------------------- reference interchange IO
    def save_reference(self, path: str) -> None:
        """Reference format (include/ocm.h:443-466): header, core u64s,
        then collision values each written as int32."""
        with open(path, "wb") as fh:
            fh.write(struct.pack("<IIQ", self.config.np_bits,
                                 self.config.nh_odd, self.config.seed))
            fh.write(self.core.astype("<u8").tobytes())
            fh.write(self.collision.astype("<i4").tobytes())

    @classmethod
    def load_reference(cls, path: str, conservative: bool = True) -> "OfflineCountMin":
        with open(path, "rb") as fh:
            np_bits, nh, seed = struct.unpack("<IIQ", fh.read(16))
            n = nh << np_bits
            core = np.fromfile(fh, dtype="<u8", count=n)
            collision = np.fromfile(fh, dtype="<i4", count=n)
        cfg = CMConfig(np_bits, nh, seed, conservative)
        w = 1 << np_bits
        return cls(cfg, core.astype(_U64).reshape(nh, w),
                   collision.astype(np.int32).reshape(nh, w))
