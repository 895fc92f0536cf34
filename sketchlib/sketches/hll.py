"""HyperLogLog with Ertl's improved estimator.

Semantics follow the reference's vendored HLL (reference:
include/hll.h): register index = top ``p`` hash bits (hll.h:761),
register value = ``clz(((h << 1) | 1) << (p - 1)) + 1`` (hll.h:715),
elementwise-max merge (hll.h:957-991). The estimator is the
ERTL_IMPROVED path (hll.h:228-237, σ/τ helpers hll.h:22-50), i.e.
Algorithm 6 of Ertl, "New cardinality estimation algorithms for
HyperLogLog sketches" (arXiv:1702.01284) — a published algorithm,
implemented here from the paper.

Expected relative standard error ≈ 1.03896 / sqrt(m) (hll.h:739).
Values are WangHash-mixed on update so callers can feed raw token
hashes or small integers alike.
"""

from __future__ import annotations

import math
import struct

import numpy as np

from sketchlib.hashing import clz64, wang_hash_u64

_U64 = np.uint64


def _sigma(x: float) -> float:
    """Ertl Alg. 6 helper: sum_{k>=1} x^(2^k) * 2^(k-1) + x."""
    if x == 1.0:
        return math.inf
    y = 1.0
    z = x
    while True:
        x = x * x
        z_prev = z
        z += x * y
        y += y
        if z == z_prev:
            return z


def _tau(x: float) -> float:
    if x == 0.0 or x == 1.0:
        return 0.0
    y = 1.0
    z = 1.0 - x
    while True:
        x = math.sqrt(x)
        z_prev = z
        y *= 0.5
        z -= (1.0 - x) ** 2 * y
        if z == z_prev:
            return z


class HyperLogLog:
    MAGIC = b"SKHL"

    def __init__(self, p: int = 14, registers: np.ndarray | None = None):
        assert 4 <= p <= 18
        self.p = p
        self.m = 1 << p
        if registers is None:
            registers = np.zeros(self.m, dtype=np.uint8)
        self.registers = registers

    def update(self, vals: np.ndarray) -> None:
        if len(vals) == 0:
            return
        h = wang_hash_u64(np.asarray(vals, dtype=_U64))
        idx = (h >> _U64(64 - self.p)).astype(np.int64)
        # rank of the remaining q bits, sentinel bit keeps clz bounded
        rest = ((h << _U64(1)) | _U64(1)) << _U64(self.p - 1)
        rank = (clz64(rest) + 1).astype(np.uint8)
        np.maximum.at(self.registers, idx, rank)

    def merge(self, other: "HyperLogLog") -> "HyperLogLog":
        assert self.p == other.p
        np.maximum(self.registers, other.registers, out=self.registers)
        return self

    def estimate(self) -> float:
        q = 64 - self.p
        counts = np.bincount(self.registers, minlength=q + 2)
        m = float(self.m)
        z = m * _tau(1.0 - counts[q + 1] / m)
        for k in range(q, 0, -1):
            z = 0.5 * (z + counts[k])
        z += m * _sigma(counts[0] / m)
        alpha_inf = 1.0 / (2.0 * math.log(2.0))
        return alpha_inf * m * m / z

    @property
    def relative_error(self) -> float:
        return 1.03896 / math.sqrt(self.m)

    def to_bytes(self) -> bytes:
        """Blob format v2: sparse (index,rank) pairs when <1/5 of the
        registers are set, else dense — the reference library's
        sparse-then-dense promotion (reference include/sparse.h) applied
        where it matters for us: partial blobs shuffled/collected during
        grouped merges, where low-cardinality groups dominate."""
        nz = np.flatnonzero(self.registers)
        if nz.size * 5 < self.registers.size:
            idx = nz.astype("<u4")
            vals = self.registers[nz]
            return (self.MAGIC + struct.pack("<BII", 2, self.p, nz.size)
                    + idx.tobytes() + vals.tobytes())
        return (self.MAGIC + struct.pack("<BI", 1, self.p)
                + self.registers.tobytes())

    @classmethod
    def from_bytes(cls, data: bytes) -> "HyperLogLog":
        assert data[:4] == cls.MAGIC
        ver, p = struct.unpack_from("<BI", data, 4)
        if ver == 2:
            _, _, n = struct.unpack_from("<BII", data, 4)
            off = 4 + struct.calcsize("<BII")
            idx = np.frombuffer(data, dtype="<u4", offset=off, count=n)
            vals = np.frombuffer(data, dtype=np.uint8,
                                 offset=off + 4 * n, count=n)
            regs = np.zeros(1 << p, dtype=np.uint8)
            regs[idx] = vals
            return cls(p, regs)
        off = 4 + struct.calcsize("<BI")
        regs = np.frombuffer(data, dtype=np.uint8, offset=off,
                             count=1 << p).copy()
        return cls(p, regs)
