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
            self._update_conservative_batch(vals)

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

    def _update_conservative_batch(self, vals: np.ndarray) -> None:
        """Vectorized conservative update of a batch.

        Equivalent to *some* sequential order of the batch: the batch is
        collapsed to (unique value, count) pairs; values whose cell sets
        are disjoint from every other value in the batch commute, so they
        are applied simultaneously; the (rare at realistic widths)
        cell-sharing values are applied sequentially afterwards.
        c consecutive updates of one value raise its row-set minimum by
        exactly c: new_v = max(v, min(v) + c).
        """
        u, counts = _sorted_unique(vals)
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

    # -------------------------------------------------------------- merge
    def merge(self, other: "CountMin") -> "CountMin":
        assert self.config == other.config
        self.core += other.core
        return self

    # ---------------------------------------------------------- serialize
    def to_bytes(self) -> bytes:
        """Internal versioned blob (shipped between executors/driver)."""
        buf = io.BytesIO()
        c = self.config
        buf.write(self.MAGIC)
        buf.write(struct.pack("<BIIQB", 1, c.np_bits, c.nh, c.seed,
                              1 if c.conservative else 0))
        buf.write(self.core.tobytes())
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountMin":
        assert data[:4] == cls.MAGIC
        _, np_bits, nh, seed, cons = struct.unpack_from("<BIIQB", data, 4)
        cfg = CMConfig(np_bits, nh, seed, bool(cons))
        off = 4 + struct.calcsize("<BIIQB")
        core = np.frombuffer(data, dtype=_U64, offset=off).reshape(
            cfg.nh_odd, cfg.width).copy()
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
    def update_count_batch(self, vals) -> None:
        """OCM plain offline count with the collision table frozen for
        the pass: per value, +count on cells at min collision. Given a
        frozen collision table this is order-independent, so partials
        sum-merge exactly like plain CM."""
        vals = np.asarray(vals, dtype=_U64)
        if vals.size == 0:
            return
        u, counts = _sorted_unique(vals)
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
                                     total_round: int) -> None:
        """OCCM conservative count with per-batch sorted-unique ordering
        (equivalent to some sequential order of the batch)."""
        vals = np.asarray(vals, dtype=_U64)
        if vals.size == 0:
            return
        u, counts = _sorted_unique(vals)
        cols = self._positions(u)
        rows = np.arange(self.core.shape[0])
        for t in range(u.shape[0]):
            p = cols[:, t]
            col = self.collision[rows, p]
            mc = col.min()
            c = _U64(counts[t])
            if mc < round_ - 1:
                sel = col == mc
                v = self.core[rows[sel], p[sel]]
                self.core[rows[sel], p[sel]] = np.maximum(v, v.min() + c)
            else:
                v = self.core[rows, p]
                mn = v.min()
                if round_ < total_round:
                    over = v > mn
                    self.collision[rows[over], p[over]] = round_
                self.core[rows, p] = np.maximum(v, mn + c)

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
        buf.write(self.MAGIC)
        buf.write(struct.pack("<BIIQB", 1, c.np_bits, c.nh, c.seed,
                              1 if c.conservative else 0))
        buf.write(self.core.tobytes())
        buf.write(self.collision.tobytes())
        return buf.getvalue()

    @classmethod
    def from_bytes(cls, data: bytes) -> "OfflineCountMin":
        assert data[:4] == cls.MAGIC
        _, np_bits, nh, seed, cons = struct.unpack_from("<BIIQB", data, 4)
        cfg = CMConfig(np_bits, nh, seed, bool(cons))
        off = 4 + struct.calcsize("<BIIQB")
        nh_o, w = cfg.nh_odd, cfg.width
        core = np.frombuffer(data, dtype=_U64, offset=off,
                             count=nh_o * w).reshape(nh_o, w).copy()
        off += nh_o * w * 8
        collision = np.frombuffer(data, dtype=np.int32, offset=off,
                                  count=nh_o * w).reshape(nh_o, w).copy()
        return cls(cfg, core, collision)

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
