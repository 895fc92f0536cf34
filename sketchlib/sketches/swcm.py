"""Sliding-window count-min — frequencies over the last W items.

Semantics follow the reference's vendored ``SlidingWindow`` CM wrapper
(reference: include/ccm.h:840-869): a ring buffer of the last W hashed
items over a non-conservative CM that supports deletions
(ccm.h:358-369): adding item W+1 subtracts the oldest. Estimates
therefore reflect exactly the trailing window, and are exact at
collision-free width.

This is an inherently SEQUENTIAL gadget (the window is defined by
arrival order), so it is per-stream/per-partition state — the
distributed analogs are the event-time windowed sketch sink and the
per-key stateful stream in sketchlib/streaming.py. No cross-partition
merge is defined (the reference defines none either); ``merge``
raises.
"""

from __future__ import annotations

import numpy as np

from sketchlib.hashing import derive_seeds, row_positions

_U64 = np.uint64


class SlidingWindowCM:
    def __init__(self, window: int, np_bits: int = 16, nh: int = 5,
                 seed: int = 137):
        assert window >= 1
        self.window = window
        self.np_bits = np_bits
        self.nh = nh
        self.seed = seed
        self.seeds = derive_seeds(seed, nh)[:nh]
        self.core = np.zeros((nh, 1 << np_bits), dtype=np.int64)
        self.ring = np.zeros(window, dtype=_U64)
        self.head = 0
        self.count = 0  # items ever seen

    def _apply(self, vals: np.ndarray, delta: int) -> None:
        if vals.size == 0:
            return
        cols = row_positions(vals, self.seeds, self.np_bits)
        for i in range(self.nh):
            np.add.at(self.core[i], cols[i].astype(np.int64), delta)

    def update(self, vals: np.ndarray) -> None:
        """Append items in order; evicts beyond the window."""
        vals = np.asarray(vals, dtype=_U64)
        for start in range(0, vals.size, self.window):
            chunk = vals[start:start + self.window]
            n = chunk.size
            idx = (self.head + np.arange(n)) % self.window
            # a slot about to be overwritten holds a live (in-window)
            # item iff the ring has wrapped there: all slots once
            # count >= window, else exactly slots < count
            if self.count >= self.window:
                evict = np.ones(n, dtype=bool)
            else:
                evict = idx < self.count
            self._apply(self.ring[idx[evict]], -1)
            self._apply(chunk, +1)
            self.ring[idx] = chunk
            self.head = (self.head + n) % self.window
            self.count += n

    def estimate(self, vals: np.ndarray) -> np.ndarray:
        vals = np.asarray(vals, dtype=_U64)
        if vals.size == 0:
            return np.empty(0, dtype=np.int64)
        cols = row_positions(vals, self.seeds, self.np_bits)
        rows = np.arange(self.nh)[:, None]
        est = self.core[rows, cols.astype(np.int64)].min(axis=0)
        return np.maximum(est, 0)

    def merge(self, other):  # noqa: ANN001
        raise NotImplementedError(
            "sliding windows are arrival-order state; the reference "
            "defines no merge (ccm.h:840-869) — use the event-time "
            "windowed sink (sketchlib.streaming) for distributed "
            "window aggregation")
