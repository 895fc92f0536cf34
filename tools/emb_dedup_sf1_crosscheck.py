"""sf1 gate for the embedding near-dup queries (round-4 VERDICT item
5 follow-up): at sf1 (20k base vectors -> 21k corpus) the DuckDB
oracle — an O(n^2) ``list_cosine_similarity`` nested join — does not
finish in sandbox time (>25 min, killed), and the repo's own
method='exact' path is documented oracle-only (broadcast nested loop
whose pair stream replicates both vectors ~450 GB through Arrow at
this n).  The engine's SCALE path is SRP-LSH; its sf1 gate here is an
INDEPENDENT dense-linear-algebra reference: the 21k x 128 matrix (21
MB) is collected once and the full cosine matrix computed via one
BLAS matmul, pairs >= threshold extracted in numpy — a completely
separate code path from the distributed signature-bucketing join.
Row-identical output = the LSH path loses nothing at sf1.

Prints one JSON line and appends to the round-4 sf1 sweep log.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

SF1 = "/root/repo/testdata_sf1"
THR = 0.99


def main() -> int:
    import __spark_entry__ as E
    from sketchlib.session import get_spark

    spark = get_spark("emb-sf1-crosscheck", cpus=16, shuffle_partitions=32)
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.time()
    lsh = E.queries()["dedup_embedding_lsh"](spark, SF1).toPandas()
    t_lsh = time.time() - t0

    # independent reference: dense BLAS cosine over the same corpus
    from __spark_entry__ import _emb_dup_corpus, _t
    corpus = _emb_dup_corpus(_t(spark, SF1, "embeddings")).toPandas()
    t0 = time.time()
    ids = corpus["vec_id"].to_numpy()
    M = np.stack(corpus["embedding"].to_numpy())
    Mn = M / np.linalg.norm(M, axis=1, keepdims=True)
    S = Mn @ Mn.T
    iu, ju = np.triu_indices(len(ids), k=1)
    hit = S[iu, ju] >= THR
    ia, ib = ids[iu[hit]], ids[ju[hit]]
    swap = ia > ib
    ia2 = np.where(swap, ib, ia)
    ib2 = np.where(swap, ia, ib)
    ref = sorted(zip(ia2.tolist(), ib2.tolist(),
                     np.round(S[iu, ju][hit], 6).tolist()))
    t_ref = time.time() - t0

    got = sorted(zip(lsh["id_a"].tolist(), lsh["id_b"].tolist(),
                     lsh["cos_sim"].tolist()))
    same = got == ref
    rec = {
        "check": "dedup_embedding_lsh @ sf1 vs dense-BLAS reference",
        "rows_lsh": len(got), "rows_ref": len(ref),
        "identical": bool(same),
        "sec_lsh": round(t_lsh, 1), "sec_ref": round(t_ref, 1),
    }
    print(json.dumps(rec))
    with open("/root/repo/BENCH/logs/sweep_r4_sf1_scale_sensitive.log",
              "a") as fh:
        status = "OK       " if same and len(got) else "MISMATCH "
        fh.write(f"[{status}] dedup_embedding_lsh sf1 vs dense-BLAS "
                 f"reference: {len(got)} rows identical={same} "
                 f"(lsh {t_lsh:.1f}s, blas ref {t_ref:.1f}s; DuckDB "
                 "O(n^2) list-cosine oracle infeasible at this sf)\n")
    spark.stop()
    return 0 if same and len(got) else 1


if __name__ == "__main__":
    raise SystemExit(main())
