"""Two-parallelism scaling benchmark (BASELINE.json north rule,
sandbox variant): run the same sketch-build job at local[N] and
local[4N] on identical input and report throughput at both plus the
scaling efficiency (throughput_4N / throughput_N) / 4.

Each parallelism level runs in a fresh subprocess (own JVM) so
executor-thread counts are honest. Results are appended to
BENCH/BASELINE.md and printed as JSON.

Usage: python tools/bench_scaling.py [n_convs] [low_cpus]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

WORKER = r"""
import json, os, sys, time
sys.path.insert(0, {root!r})
from functools import partial
from sketchlib.session import get_spark
from sketchlib.synth import transcripts
from sketchlib.tokenize import transcript_tokens, balanced_repartition
from sketchlib.aggregate import build_sketch
from sketchlib.sketches.cm import CMConfig, CountMin

cpus = {cpus}
n_convs = {n_convs}
# identical data layout at both parallelism levels (same input and
# shuffle partition counts) — only the executor-thread count varies,
# mirroring an N-executor vs 4N-executor cluster reading one table
PARTS = 128
spark = get_spark("scaling-bench", cpus=cpus, shuffle_partitions=PARTS)
spark.sparkContext.setLogLevel("ERROR")
tdf = transcripts(spark, n_convs, seed=42, partitions=PARTS).cache()
n_turns = tdf.count()
n_updates = transcript_tokens(tdf).count()
cfg = CMConfig(np_bits=20, nh=7, seed=137, conservative=True)
# timed job = the full engine pipeline: tokenize (JVM) -> pre-aggregate
# (Tungsten hash agg) -> weighted sketch kernels -> merge. Generation
# is cached out; 2 warm-up reps (codegen JIT), then median of 5 —
# steady-state, robust to the sandbox's page-fault/GC noise.
for _ in range(2):
    build_sketch(transcript_tokens(tdf), "token_u64", partial(CountMin, cfg),
                 pre_aggregate=True)
times = []
for _ in range(5):
    t0 = time.time()
    build_sketch(transcript_tokens(tdf), "token_u64",
                 partial(CountMin, cfg), pre_aggregate=True)
    times.append(time.time() - t0)
times.sort()
med = times[len(times) // 2]
print(json.dumps({{"cpus": cpus, "n_turns": n_turns,
                   "n_updates": n_updates, "sec": med,
                   "all_sec": [round(t, 2) for t in times],
                   "turns_per_sec": n_turns / med,
                   "updates_per_sec": n_updates / med}}))
spark.stop()
"""


def run_level(cpus: int, n_convs: int) -> dict:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    code = WORKER.format(root=root, cpus=cpus, n_convs=n_convs)
    out = subprocess.run([sys.executable, "-c", code], capture_output=True,
                         text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    n_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 20000
    low = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    rounds = int(sys.argv[3]) if len(sys.argv) > 3 else 2
    high = low * 4
    # interleave the two levels across fresh JVMs and keep each level's
    # best round: the sandbox is a shared VM whose effective CPU drifts
    # minute-to-minute, and pairing adjacent runs + best-of cancels that
    lo = hi = None
    for _ in range(rounds):
        l = run_level(low, n_convs)
        h = run_level(high, n_convs)
        if lo is None or l["sec"] < lo["sec"]:
            lo = l
        if hi is None or h["sec"] < hi["sec"]:
            hi = h
    eff = (hi["updates_per_sec"] / lo["updates_per_sec"]) / (high / low)
    result = {"low": lo, "high": hi, "scaling_efficiency": round(eff, 3)}
    print(json.dumps(result))

    os.makedirs("BENCH", exist_ok=True)
    with open("BENCH/BASELINE.md", "a") as fh:
        fh.write(
            f"\n## Scaling run (local[{low}] vs local[{high}], "
            f"{lo['n_turns']} turns, {lo['n_updates']} updates, "
            f"conservative CM w=2^20 h=7)\n\n"
            f"| parallelism | build sec | turns/sec | updates/sec |\n"
            f"|---|---|---|---|\n"
            f"| local[{low}] | {lo['sec']:.2f} | {lo['turns_per_sec']:.0f} "
            f"| {lo['updates_per_sec']:.0f} |\n"
            f"| local[{high}] | {hi['sec']:.2f} | {hi['turns_per_sec']:.0f} "
            f"| {hi['updates_per_sec']:.0f} |\n\n"
            f"Scaling efficiency (throughput_{high}/throughput_{low})/"
            f"{high // low} = **{eff:.3f}**\n")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
