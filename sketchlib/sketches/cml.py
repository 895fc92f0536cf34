"""Count-min-log — CM with power-of-two log counters (8-bit cells).

Semantics follow the reference's vendored probabilistic CM
(reference: include/update.h:35-83 ``PowerOfTwo`` updater inside
``pccm_t``, ccm.h): each cell holds a log-counter; an occurrence
increments the cell with probability ``2^-cell``; the estimate is
``1 << (cell - 1)`` (update.h:80-82). The payoff is memory: 8-bit
cells vs 64-bit exact counters — 8x smaller tables for the same
(w, d) geometry, at power-of-two count resolution.

Determinism: as with the CountingBloom and HeavyKeeper siblings, the
coin flips are replaced by their expectation — a weighted update of w
occurrences sets ``cell = max(cell, floor(log2(w)) + 1)`` — so the
sketch is a pure function of the (value, weight) multiset. Through
the harness's ``pre_aggregate`` path (global per-key counts) the
estimate at collision-free width is exactly the largest power of two
<= count, giving the driver query a strict SQL oracle. Merge is
elementwise max (monotone log-counters; the reference's merge,
update.h:73-78, is max with a stochastic +1 correction we drop for
determinism — documented divergence).
"""

from __future__ import annotations

import struct

import numpy as np

from sketchlib.hashing import derive_seeds, row_positions

_U64 = np.uint64


class CountMinLog:
    MAGIC = b"SKML"

    def __init__(self, np_bits: int = 16, nh: int = 5, seed: int = 137,
                 cells: np.ndarray | None = None):
        self.np_bits = np_bits
        self.nh = nh
        self.seed = seed
        self.w = 1 << np_bits
        self.seeds = derive_seeds(seed, nh)[:nh]
        self.cells = cells if cells is not None \
            else np.zeros((nh, self.w), dtype=np.uint8)

    def update(self, vals: np.ndarray) -> None:
        if len(vals) == 0:
            return
        u, c = np.unique(np.asarray(vals, dtype=_U64), return_counts=True)
        self.update_weighted(u, c)

    def update_weighted(self, vals: np.ndarray, counts: np.ndarray) -> None:
        vals = np.asarray(vals, dtype=_U64)
        counts = np.asarray(counts, dtype=np.int64)
        keep = counts > 0
        vals, counts = vals[keep], counts[keep]
        if vals.size == 0:
            return
        level = (np.floor(np.log2(counts)).astype(np.int64) + 1)
        level = np.minimum(level, 255).astype(np.uint8)
        cols = row_positions(vals, self.seeds, self.np_bits)
        for i in range(self.nh):
            np.maximum.at(self.cells[i], cols[i].astype(np.int64), level)

    def estimate(self, vals: np.ndarray) -> np.ndarray:
        """min log-cell over rows -> 1 << (v-1), 0 when v == 0
        (update.h:80-82)."""
        vals = np.asarray(vals, dtype=_U64)
        if vals.size == 0:
            return np.empty(0, dtype=np.int64)
        cols = row_positions(vals, self.seeds, self.np_bits)
        rows = np.arange(self.nh)[:, None]
        v = self.cells[rows, cols.astype(np.int64)].min(axis=0) \
            .astype(np.int64)
        return np.where(v > 0, 1 << np.maximum(v - 1, 0), 0)

    def merge(self, other: "CountMinLog") -> "CountMinLog":
        assert (self.np_bits, self.nh, self.seed) == \
            (other.np_bits, other.nh, other.seed)
        np.maximum(self.cells, other.cells, out=self.cells)
        return self

    def to_bytes(self) -> bytes:
        return (self.MAGIC
                + struct.pack("<BIIQ", 1, self.np_bits, self.nh, self.seed)
                + self.cells.tobytes())

    @classmethod
    def from_bytes(cls, data: bytes) -> "CountMinLog":
        assert data[:4] == cls.MAGIC
        _, np_bits, nh, seed = struct.unpack_from("<BIIQ", data, 4)
        off = 4 + struct.calcsize("<BIIQ")
        cells = np.frombuffer(data, dtype=np.uint8, offset=off,
                              count=nh << np_bits).reshape(nh, -1).copy()
        return cls(np_bits, nh, seed, cells)
