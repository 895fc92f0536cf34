"""Dump the optimized physical plans of the headline driver-contract
queries to BENCH/PLANS.md, with the scale-critical properties called
out per query (pushdown, pruning, broadcast vs sort-merge joins,
partial aggregation, TakeOrderedAndProject, exchange count).

The point is reviewability: tests/test_plans.py *asserts* the
properties; this file lets a human read the actual plans the
assertions pin.

Usage: python tools/plan_audit.py [sf_dir]
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")

AUDITED = [
    # query name -> one-line why-this-plan-scales note
    ("cm_conservative_user_freq",
     "pre-aggregate partial+final hash agg collapses the stream to "
     "|distinct| rows before any Python; broadcast-blob probe, no join"),
    ("heavy_hitter_tokens",
     "map-side combine + TakeOrderedAndProject (bounded heap), no full "
     "sort"),
    ("dedup_minhash",
     "banded equi-join on (band, key); verify join restricted to "
     "candidate ids before any payload join"),
    ("dedup_embedding_lsh",
     "SRP bucket join carries ids only; vectors joined back once; "
     "numpy matmul cosine in one pandas UDF"),
    ("ann_ivf_topk",
     "IVF cluster-probe: candidate equi-join on coarse cell carries "
     "ids only; assignment/probe are narrow pandas-UDF maps; exact "
     "re-rank joins vectors back once (queries broadcast)"),
    ("swcm_recent_user_freq",
     "sequential gadget: one explicit repartition(1) + in-partition "
     "sort; key re-attach broadcasts"),
    ("pcbf_user_freq",
     "same pre-aggregate + broadcast-probe shape as every point-"
     "frequency sibling"),
    ("dedup_clusters",
     "pair graph built once off the localCheckpointed fingerprint "
     "table (16-bit-chunk blocked self-join, no cross join); closure "
     "is driver-local union-find under the 100k-edge threshold, "
     "O(log n)-round alternating star above it — the printed plan is "
     "the final representative join over the materialized edge set"),
    ("dsir_select",
     "joinless codegen element_at scoring into the B-element log-ratio "
     "literal; partial+final score sum; TakeOrderedAndProject select; "
     "the only join is the k-row id join back to raw (broadcast)"),
    ("pack_manifest",
     "two-phase global cumsum with ONE shuffle: the uniform md5 key's "
     "high bits form an order-preserving bucket, so the window's own "
     "hashpartitioning(bkt) exchange is the only one — no range "
     "exchange, no SinglePartition window; offsets broadcast back; "
     "manifest explode is map-side"),
    ("fd_gram_embeddings",
     "Frequent Directions build: one corpus scan -> per-partition "
     "Arrow-batch FD partials -> tree-folded ell x d blobs; the gram "
     "finalize is driver-side on a d x d matrix"),
    ("curation_pipeline",
     "five stages, one plan: fingerprint hash-agg + semi-join (the "
     "only corpus exchange), broadcast Bloom decontam prefilter, "
     "narrow integer quality predicate, TakeOrderedAndProject "
     "mixture sample, single-shuffle skinny-table packing; the two "
     "fan-out points persist"),
    ("cm_drift_user_freq",
     "snapshot drift: both CM builds use the pre-aggregate shape; the "
     "returned plan is the union-of-distinct-keys probe with BOTH "
     "snapshot blobs broadcast — two chained ArrowEvalPython column "
     "annotations, no join between snapshots"),
    ("bloom_antijoin_lineitem",
     "anti-join dual: Bloom-rejected rows are definite orphans and "
     "bypass the join (zero shuffle for the bulk); only maybes take "
     "the exact anti-join"),
    ("decayed_top_users_per_type",
     "grouped weighted build: JVM SUM(decay weight) per (type, user) "
     "feeds salted MG partials; distributed finalize; the only "
     "broadcast is the |hot|-row pair table join-back"),
    ("skew_join_priority",
     "skew-split join: MG-detected hot keys take an explicit "
     "BroadcastHashJoin (the skewed mass never shuffles) while the "
     "cold remainder takes the ordinary shuffle join; union of the "
     "two is row-identical to the plain join"),
    ("range_buckets_price",
     "bucket id is a chain of codegen (col > bound) comparisons over "
     "broadcast-literal KLL bounds — no UDF, no join; the count is a "
     "partial+final hash agg over <= n_buckets groups"),
    ("event_transitions",
     "one hash exchange on the sequence key feeds the LAG window (the "
     "minimum movement for an order-dependent statistic); bigram agg "
     "is map-side-combined over <= |states|^2 groups"),
    ("top_customers_window",
     "dim side broadcasts (no sort-merge join)"),
    ("pricing_summary",
     "filter pushed to the parquet scan; scan schema pruned"),
    # round-3 additions
    ("bm25_topk_docs",
     "pure Catalyst BM25 in ONE corpus scan: per-term tf columns "
     "pivoted into the single per-doc Tungsten aggregate, corpus "
     "stats reduced to a 1-row broadcast, codegen scoring, "
     "TakeOrderedAndProject cut — 2 exchanges total, no UDF anywhere"),
    ("cm_packed_user_freq",
     "bit-packed conservative CM rides the identical pre-aggregate + "
     "broadcast-probe shape as the uint64 sibling; only the blob "
     "payload shrinks (64/nbits)"),
    ("minhash_jaccard_langs",
     "distributed pairwise finalize (round 3): keys-only broadcast "
     "pair enumeration, blobs attached by two shuffled equi-joins, "
     "jaccard computed in mapInPandas — no driver blob collect"),
    ("multimodal_wav_stats",
     "real WAV decode: generator and decoder are two chained "
     "mapInPandas over the range scan — a 0-exchange narrow pipeline"),
    # round-4 additions
    ("psi_value_drift",
     "round-4 fix: ONE events scan — both half-KLLs come from a "
     "single grouped build keyed on the early/late flag (was two "
     "filtered build_sketch scans); driver work is two blob "
     "deserializes"),
    ("setsim_siblings_langs",
     "estimator panel off ONE grouped pass "
     "(build_grouped_sketches_multi); pairwise compare stratified by "
     "estimator name; round 4 persists the grouped blobs so the "
     "salted build runs once, not 3x"),
    ("multimodal_png_stats",
     "real zlib-compressed PNG decode (DEFLATE + CRC walk + all-five-"
     "filter unfilter) in chained mapInPandas — 0-exchange narrow "
     "pipeline, codec cost stays inside the Arrow batch kernel"),
    ("multimodal_gif_stats",
     "real GIF87a LZW decode (12-bit dict growth, CLEAR resets, "
     "sub-block reassembly) in chained mapInPandas — same 0-exchange "
     "shape"),
    ("profile_orders",
     "one-scan per-column profiler: melt -> exact panel + HLL "
     "distinct + KLL quantiles off one cached stream"),
    ("filterhll_repeated_shingles",
     "threshold-distinct over shingles: pre-distinct JVM-side, "
     "grouped sketch build, no driver funnel"),
    # round-5 additions
    ("ann_pq_topk",
     "PQ/ADC: codebooks+LUTs ride the closure, corpus scan touches "
     "CODES only, per-batch local top-k, window-rank global cut — "
     "the corpus never shuffles; train init is TakeOrderedAndProject "
     "(no global sort / window / count job)"),
    ("ann_ivfpq_topk",
     "IVF-PQ: probed-cell union becomes a Catalyst isin filter on the "
     "(id, cell, codes) scan (partition-prunable when the index is "
     "stored partitioned by cell); LUTs + probe sets ride the "
     "closure; per-batch local top-k; corpus never shuffles"),
    ("dedup_minhash_delta",
     "incremental LSH dedup: only the DELTA is shingled/signed; "
     "candidates = delta band self-join UNION band join against the "
     "stored index; verify reads delta shingles + semi-joined matched "
     "old shingles — historical text never scanned"),
    ("multimodal_jpeg_stats",
     "real baseline-JPEG decode (canonical Huffman, zigzag/dequant, "
     "float64 IDCT) in chained mapInPandas — same 0-exchange narrow "
     "shape as the WAV/BMP/PNG/GIF codecs"),
]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    import __spark_entry__ as E
    from sketchlib.session import get_spark

    spark = get_spark("plan-audit", cpus=4, shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    qs = E.queries()
    out = ["# Optimized physical plans (headline queries)\n",
           f"\nGenerated by tools/plan_audit.py at {sf_dir}; the "
           "properties named per query are pinned by "
           "tests/test_plans.py.\n"]
    for name, note in AUDITED:
        df = qs[name](spark, sf_dir)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted")
        n_exchange = len(re.findall(r"\(\d+\) Exchange", plan))
        out.append(f"\n## {name}\n\n*{note}* — "
                   f"{n_exchange} exchange(s) in the final plan.\n\n"
                   "```\n" + plan.strip() + "\n```\n")
    with open("BENCH/PLANS.md", "w") as fh:
        fh.write("".join(out))
    print(f"wrote BENCH/PLANS.md ({len(AUDITED)} plans)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
