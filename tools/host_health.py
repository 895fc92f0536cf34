"""20-second host-window health probe — run BEFORE trusting any
benchmark number from this sandbox.

Load average is NOT a sufficient window check here: we have measured
windows where load avg sat at ~2 (just the bench's own processes) yet
the same job ran 30-50% below clean-window rates. The probe below
exposes the two degradation mechanisms directly:

- single-core rate vs the healthy baseline (~270 M elem-ops/s): low
  means hypervisor steal/throttle even if /proc/stat steal reads ~0;
- 8-proc aggregate vs the healthy baseline (~2,100 M elem-ops/s) and
  the machine-wide sys%: in degraded windows parallel memory-bound
  work collapses to ~700 M with ~19% of all 32 cores burning in
  KERNEL time (page management amplified by host memory pressure),
  while user time stays tiny.

Exit code 0 = window looks clean, 1 = degraded (print says why).
Baselines measured in a verified-clean window (BENCH/BASELINE.md
hardware-ceiling table; 1-proc 274 M, 8-proc 2,147 M elem-ops/s).
"""

from __future__ import annotations

import multiprocessing as mp
import sys
import time

import numpy as np

BASE_1P = 270.0   # M elem-ops/s, healthy single proc
BASE_8P = 2100.0  # M elem-ops/s, healthy 8-proc aggregate


def _burn(q, seconds: float = 8.0):
    x = np.arange(5_000_000, dtype=np.uint64)
    _ = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
    t0 = time.time()
    reps = 0
    while time.time() - t0 < seconds:
        y = (x ^ (x >> np.uint64(33))) * np.uint64(0xFF51AFD7ED558CCD)
        y ^= y >> np.uint64(33)
        reps += 1
    q.put(reps * 15.0 / (time.time() - t0))  # 3 passes x 5M = 15M ops/rep


def _stat():
    with open("/proc/stat") as fh:
        return list(map(int, fh.readline().split()[1:]))


def _run(nproc: int) -> tuple[float, float, float]:
    q = mp.Queue()
    ps = [mp.Process(target=_burn, args=(q,)) for _ in range(nproc)]
    a = _stat()
    for p in ps:
        p.start()
    for p in ps:
        p.join()
    b = _stat()
    d = [v2 - v1 for v1, v2 in zip(a, b)]
    tot = sum(d) or 1
    mops = sum(q.get() for _ in ps)
    return mops, 100.0 * d[2] / tot, 100.0 * d[7] / tot  # sys%, steal%


def probe() -> dict:
    """Machine-readable window verdict — importable by bench.py's
    record gate (round-5 protocol: a bench run refuses to record in a
    window this probe calls degraded). Rates are the verdict; the
    probe's own fork/alloc traffic puts ~10% sys on a healthy host, so
    sys% alone never fails a window — it is kept as the diagnostic of
    WHY a low rate is low."""
    m1, sys1, steal1 = _run(1)
    m8, sys8, steal8 = _run(8)
    r1, r8 = m1 / BASE_1P, m8 / BASE_8P
    return {"m1_mops": round(m1), "m8_mops": round(m8),
            "r1": round(r1, 3), "r8": round(r8, 3),
            "sys1_pct": round(sys1, 1), "sys8_pct": round(sys8, 1),
            "steal8_pct": round(steal8, 1),
            "clean": bool(r1 >= 0.85 and r8 >= 0.80)}


def main() -> int:
    p = probe()
    print(f"1-proc: {p['m1_mops']:6.0f} M ops/s ({100*p['r1']:.0f}% of "
          f"clean) sys {p['sys1_pct']:.1f}%")
    print(f"8-proc: {p['m8_mops']:6.0f} M ops/s ({100*p['r8']:.0f}% of "
          f"clean) sys {p['sys8_pct']:.1f}% steal {p['steal8_pct']:.1f}%")
    print("WINDOW:", "CLEAN — benchmark numbers trustworthy" if p["clean"]
          else "DEGRADED — do not record benchmark numbers from this window")
    return 0 if p["clean"] else 1


if __name__ == "__main__":
    raise SystemExit(main())
