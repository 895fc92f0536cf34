"""Data-scale trend for the MinHash+LSH dedup pipeline: run
minhash_dedup_pairs end-to-end over 1x / Rx replicated corpora and
report wall, pairs, and per-doc cost.

Construction keeps the work HONESTLY linear in the replication factor:
copy j of the corpus prefixes every token with ``c<j>`` (regex at the
scan), so copies are disjoint in shingle space — each copy reproduces
the original corpus's near-dup structure internally and shares nothing
across copies. Input Rx => candidates Rx => verified pairs exactly Rx.
A plain replication (identical text) would instead grow output pairs
quadratically in R and measure pair-explosion, not the engine.

Usage: python tools/bench_dedup_scale.py [sf_dir] [reps ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def tagged_corpus(docs, r: int):
    """Union of r token-tagged copies with disjoint doc_id ranges."""
    parts = []
    for j in range(r):
        parts.append(docs.select(
            (F.col("doc_id") + j * 10_000_000).alias("doc_id"),
            F.regexp_replace(F.lower("text"), r"(\S+)", f"c{j}$1")
            .alias("text")))
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    reps = [int(x) for x in sys.argv[2:]] or [1, 4, 8]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    from sketchlib import dedup as D
    from sketchlib.session import get_spark

    spark = get_spark("dedup-scale", cpus=cpus,
                      shuffle_partitions=max(cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()

    # warm-up: shingle + python-worker paths, untimed
    D.minhash_dedup_pairs(docs.limit(200), 0.7).count()

    print(f"| reps | docs | wall s | pairs | ms/doc |")
    print(f"|---|---|---|---|---|")
    rows = []
    for r in reps:
        corpus = tagged_corpus(docs, r)
        nd = n_docs * r
        best = None
        for _ in range(2):  # best-of-2 (shared-VM drift protocol)
            t0 = time.time()
            pairs = D.minhash_dedup_pairs(corpus, 0.7).count()
            dt = time.time() - t0
            best = dt if best is None or dt < best else best
        rows.append((r, nd, best, pairs))
        print(f"| {r}x | {nd} | {best:.2f} | {pairs} "
              f"| {1000 * best / nd:.3f} |")
    if len(rows) >= 2:
        (r0, n0, t0_, p0), (r1, n1, t1_, p1) = rows[0], rows[-1]
        print(f"\nscale {n1 / n0:.0f}x data -> {t1_ / t0_:.2f}x wall "
              f"(linear would be {n1 / n0:.0f}x); pairs {p0} -> {p1} "
              f"(expected exactly {p0 * n1 // n0})")
    spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
