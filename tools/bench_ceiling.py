"""8->32 ceiling isolation (round-2 verdict item 8): decompose the
sketch-build pipeline into its JVM leg and its Python-kernel leg and
measure each separately at local[8] vs local[32], plus a small-core
kernel variant that removes most of the kernel's memory traffic.

Hypotheses the experiment separates:
  H1 (host memory bandwidth): both legs degrade similarly, and the
     small-core (L2-resident) kernel variant scales BETTER than the
     big-core variant — the wall is bytes/s, not the GIL, not Spark.
  H2 (Python-worker overhead): the kernel leg scales much worse than
     the JVM leg regardless of core size.

Legs (each in a fresh subprocess/JVM, 2 warm-ups, median of 5):
  jvm    — tokenize + Tungsten hash-aggregate over 2.1 M transcript
           turns (134 M token updates), no Python anywhere;
  kern20 — weighted conservative-CM kernel (w=2^20: 56 MB core per
           partition — far beyond L2, heavy scatter traffic) over 20 M
           pre-generated distinct keys, 128 kernel partitions;
  kern14 — identical except w=2^14 (917 KB core: cache-resident).

Usage: python tools/bench_ceiling.py [out_md]
Appends a markdown section to BENCH/BASELINE.md by default.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, sys, time
sys.path.insert(0, {root!r})
from functools import partial
from pyspark.sql import functions as F
from sketchlib.session import get_spark

leg = {leg!r}
cpus = {cpus}
PARTS = 128
spark = get_spark("ceiling-bench", cpus=cpus, shuffle_partitions=PARTS)
spark.sparkContext.setLogLevel("ERROR")

if leg == "jvm":
    from sketchlib.synth import transcripts
    from sketchlib.tokenize import transcript_tokens
    tdf = transcripts(spark, 65000, seed=42, partitions=PARTS).cache()
    tdf.count()
    def job():
        (transcript_tokens(tdf).groupBy("token_u64")
         .agg(F.count("*").alias("c"))
         .agg(F.sum("c")).collect())
else:
    from sketchlib.aggregate import build_sketch
    from sketchlib.sketches.cm import CMConfig, CountMin
    np_bits = 20 if leg == "kern20" else 14
    cfg = CMConfig(np_bits=np_bits, nh=7, seed=137, conservative=True)
    keys = (spark.range(0, 20_000_000, 1, PARTS)
            .select(F.xxhash64("id").alias("k"),
                    F.lit(1).alias("w")).cache())
    keys.count()
    def job():
        build_sketch(keys, "k", partial(CountMin, cfg),
                     pre_aggregate=True, weight_col="w",
                     kernel_partitions=PARTS)

for _ in range(2):
    job()
times = []
for _ in range(5):
    t0 = time.time(); job(); times.append(time.time() - t0)
times.sort()
print(json.dumps({{"leg": leg, "cpus": cpus,
                   "sec": times[len(times) // 2],
                   "all_sec": [round(t, 2) for t in times]}}))
spark.stop()
"""


def run(leg: str, cpus: int) -> dict:
    code = WORKER.format(root=ROOT, leg=leg, cpus=cpus)
    out = subprocess.run([sys.executable, "-c", code],
                         capture_output=True, text=True, check=True)
    return json.loads(out.stdout.strip().splitlines()[-1])


def main() -> int:
    out_md = sys.argv[1] if len(sys.argv) > 1 else \
        os.path.join(ROOT, "BENCH", "BASELINE.md")
    results = {}
    # interleave 8/32 per leg so host drift hits both levels equally
    for leg in ["jvm", "kern20", "kern14"]:
        for cpus in [8, 32]:
            r = run(leg, cpus)
            results[(leg, cpus)] = r
            print(json.dumps(r))
    lines = ["", "## 8->32 ceiling isolation (tools/bench_ceiling.py)", ""]
    lines.append("| leg | local[8] sec | local[32] sec | speedup | "
                 "8->32 efficiency |")
    lines.append("|---|---|---|---|---|")
    for leg in ["jvm", "kern20", "kern14"]:
        a, b = results[(leg, 8)], results[(leg, 32)]
        sp = a["sec"] / b["sec"]
        lines.append(f"| {leg} | {a['sec']:.2f} {a['all_sec']} | "
                     f"{b['sec']:.2f} {b['all_sec']} | {sp:.2f}x | "
                     f"{sp / 4:.2f} |")
    text = "\n".join(lines) + "\n"
    print(text)
    with open(out_md, "a") as f:
        f.write(text)
    return 0


if __name__ == "__main__":
    sys.exit(main())
