"""Measured evidence that sketch-table refresh is O(delta), not
O(history) — the scaling claim behind sketchlib/incremental.py.

Protocol: two Icebergish source tables with histories H and 4H
conversations (deterministic synth transcripts), the SAME delta
appended to each; time `refresh_sketch_table` (mode=incremental) on
both, plus the from-scratch rebuild at each history size. At 100 TB
the refresh:rebuild gap is the difference between an hourly-updatable
sketch table and one frozen at build time; here we show the incremental
refresh cost stays ~flat while rebuild cost grows ~linearly with
history.

Noise discipline: this sandbox's effective CPU drifts (see
BENCH/BASELINE.md "host windows"); each timed leg runs twice
interleaved across the two history sizes and keeps the best, the same
protocol as tools/bench_scaling.py.

Usage: python tools/bench_incremental.py [H_convs] [delta_convs]
Prints one JSON line.
"""

from __future__ import annotations

import json
import shutil
import sys
import tempfile
import time
from functools import partial

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402

from sketchlib.iceberg import IcebergishCatalog  # noqa: E402
from sketchlib.incremental import refresh_sketch_table  # noqa: E402
from sketchlib.session import get_spark  # noqa: E402
from sketchlib.sketches.cm import CMConfig, CountMin  # noqa: E402
from sketchlib.sketches.hll import HyperLogLog  # noqa: E402
from sketchlib.synth import transcripts  # noqa: E402


def prep(df):
    """Per-role token-hash stream (explode once, hash JVM-side)."""
    words = F.split(F.lower(F.coalesce(F.col("text"), F.lit(""))), r"\s+")
    return (df.select("role", F.explode(words).alias("w"))
              .filter(F.col("w") != "")
              .select("role", F.xxhash64("w").alias("kh")))


FACTORIES = {
    "cm": partial(CountMin, CMConfig(np_bits=16, nh=5, seed=137,
                                     conservative=False)),
    "hll": partial(HyperLogLog, 12),
}


def main() -> None:
    h_convs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    d_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 5_000
    spark = get_spark("bench-incremental")

    roots = []

    def make_catalog(n_hist: int, seed: int) -> IcebergishCatalog:
        root = tempfile.mkdtemp(prefix=f"inc_{n_hist}_")
        roots.append(root)
        cat = IcebergishCatalog(root)
        cat.append("src", transcripts(spark, n_hist, seed=seed))
        # initial (full) build — timed: the rebuild-at-this-history leg
        t0 = time.time()
        refresh_sketch_table(spark, cat, "src", "sk", ["role"], "kh",
                             FACTORIES, prepare=prep)
        build_s = time.time() - t0
        cat.append("src", transcripts(spark, d_convs, seed=999))
        return cat, build_s

    def refresh_once(cat: IcebergishCatalog) -> float:
        """Time one incremental refresh, then rewind the sketch table
        so the run is repeatable (re-point current to the pre-refresh
        snapshot)."""
        import json as _json
        import os
        tdir = cat._tdir("sk")
        with open(os.path.join(tdir, "catalog.json")) as fh:
            before = _json.load(fh)
        t0 = time.time()
        stats = refresh_sketch_table(spark, cat, "src", "sk", ["role"],
                                     "kh", FACTORIES, prepare=prep)
        dt = time.time() - t0
        assert stats["mode"] == "incremental", stats
        with open(os.path.join(tdir, "catalog.json"), "w") as fh:
            _json.dump(before, fh)
        return dt

    (cat1, build1a) = make_catalog(h_convs, seed=42)
    (cat4, build4a) = make_catalog(4 * h_convs, seed=43)

    # interleaved best-of-2 for each timed leg
    incr1 = min(refresh_once(cat1), refresh_once(cat1))
    incr4 = min(refresh_once(cat4), refresh_once(cat4))

    n_hist1 = cat1.load_table(spark, "src").count()
    n_hist4 = cat4.load_table(spark, "src").count()

    flatness = incr4 / incr1              # ~1.0 == O(delta) refresh
    rebuild_ratio = build4a / build1a     # ~4.0 == O(history) rebuild
    speedup_at_4h = build4a / incr4       # what the refresh buys

    out = {
        "metric": "incremental sketch-table refresh vs rebuild",
        "h_convs": h_convs, "delta_convs": d_convs,
        "rows_hist_h": n_hist1, "rows_hist_4h": n_hist4,
        "rebuild_s_at_h": round(build1a, 3),
        "rebuild_s_at_4h": round(build4a, 3),
        "incremental_s_at_h": round(incr1, 3),
        "incremental_s_at_4h": round(incr4, 3),
        "refresh_flatness_4h_over_h": round(flatness, 3),
        "rebuild_growth_4h_over_h": round(rebuild_ratio, 3),
        "refresh_speedup_vs_rebuild_at_4h": round(speedup_at_4h, 2),
    }
    print(json.dumps(out))
    for r in roots:
        shutil.rmtree(r, ignore_errors=True)


if __name__ == "__main__":
    main()
