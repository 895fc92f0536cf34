"""sf1 gate for the embedding near-dup queries (round-4 VERDICT item
5 follow-up): at sf1 (20k base vectors -> ~21k corpus) the DuckDB
oracle — an O(n^2) ``list_cosine_similarity`` nested join — does not
finish in sandbox time (>25 min, killed), while BOTH engine paths
complete in seconds.  The oracle is the bottleneck, not the engine, so
the sf1 gate here is ENGINE CROSS-VALIDATION: the exact brute-force
path and the SRP-LSH blocked path are independent implementations
(cross join + cosine vs signature bucketing + verify join) whose
outputs must be ROW-IDENTICAL; each remains strictly DuckDB-gated at
sf0.001/0.01 (driver) and sf0.1/sf1-subset regimes where the oracle is
feasible.

Prints one JSON line and appends to the round-4 sf1 sweep log.
"""

from __future__ import annotations

import json
import sys
import time

sys.path.insert(0, "/root/repo")

SF1 = "/root/repo/testdata_sf1"


def main() -> int:
    import __spark_entry__ as E
    from sketchlib.session import get_spark

    spark = get_spark("emb-sf1-crosscheck", cpus=16, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()

    t0 = time.time()
    exact = qs["dedup_embedding"](spark, SF1).toPandas()
    t_exact = time.time() - t0
    t0 = time.time()
    lsh = qs["dedup_embedding_lsh"](spark, SF1).toPandas()
    t_lsh = time.time() - t0

    cols = sorted(exact.columns)
    a = exact[cols].sort_values(cols).reset_index(drop=True)
    b = lsh[cols].sort_values(cols).reset_index(drop=True)
    same = a.equals(b)
    rec = {
        "check": "dedup_embedding exact == dedup_embedding_lsh @ sf1",
        "rows_exact": len(exact), "rows_lsh": len(lsh),
        "identical": bool(same),
        "sec_exact": round(t_exact, 1), "sec_lsh": round(t_lsh, 1),
    }
    print(json.dumps(rec))
    with open("/root/repo/BENCH/logs/sweep_r4_sf1_scale_sensitive.log",
              "a") as fh:
        status = "OK       " if same and len(exact) else "MISMATCH "
        fh.write(f"[{status}] dedup_embedding~dedup_embedding_lsh sf1 "
                 f"engine-crosscheck: {len(exact)} rows identical="
                 f"{same} (exact {t_exact:.1f}s, lsh {t_lsh:.1f}s; "
                 "DuckDB O(n^2) oracle infeasible at this sf — "
                 "engine cross-validation gate)\n")
    spark.stop()
    return 0 if same and len(exact) else 1


if __name__ == "__main__":
    raise SystemExit(main())
