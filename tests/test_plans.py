"""Physical-plan regression guards: the properties that make the
queries scale must be visible in the optimized plan, not assumed.

- parquet filter pushdown + column pruning reach the scan;
- small-side joins broadcast (no sort-merge join for the dim side);
- the sketch-build pre-aggregate runs as a Tungsten partial+final
  hash aggregate (map-side combine before the exchange).
"""

from __future__ import annotations

from pyspark.sql import functions as F

import __spark_entry__ as E

from tests.conftest import plan_of as _plan

SF = "/root/testdata/sf0.001"


def test_pricing_summary_pushdown_and_pruning(spark):
    plan = _plan(E.queries()["pricing_summary"](spark, SF))
    assert "PushedFilters" in plan and "l_shipdate" in plan.split(
        "PushedFilters")[1][:200]
    # projection pruning: the scan schema must not include l_comment
    read_schema = plan.split("ReadSchema")[1][:400]
    assert "l_comment" not in read_schema
    assert "l_extendedprice" in read_schema


def test_top_customers_broadcasts_dim_side(spark):
    plan = _plan(E.queries()["top_customers_window"](spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_sketch_preaggregate_has_partial_agg(spark):
    from sketchlib.tokenize import transcript_tokens
    tdf = spark.read.parquet(f"{SF}/events.parquet")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from sketchlib import dedup as D
    toks = D.normalized_tokens(docs)
    plan = _plan(toks.groupBy("token").agg(F.count("*").alias("c")))
    import re
    # map-side combine: the HashAggregate step carrying partial_count
    # must have a smaller step number than the Exchange step
    m = re.search(r"\((\d+)\) HashAggregate[^(]*partial_count", plan)
    x = re.search(r"\((\d+)\) Exchange", plan)
    assert m and x, plan[:500]
    assert int(m.group(1)) < int(x.group(1))


def test_heavy_hitters_uses_bounded_heap_not_full_sort(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    from sketchlib import dedup as D
    from sketchlib import queries as Q
    plan = _plan(Q.heavy_hitters(D.normalized_tokens(docs), "token", 5))
    assert "TakeOrderedAndProject" in plan   # per-partition heap + k-merge
    assert "partial_count" in plan           # map-side combine
    assert "Sort " not in plan               # never a full sort


def test_embedding_lsh_candidates_carry_ids_only(spark):
    """The SRP bucket self-join and pair dedup must not carry vector
    payloads — only ids cross that shuffle (round-2 plan fix)."""
    from sketchlib import dedup as D
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    df = D.embedding_near_dup_pairs(
        emb.select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("embedding")), 0.99, method="lsh")
    plan = _plan(df)
    # the dedup of candidate pairs aggregates on exactly (id_a, id_b):
    # a payload-carrying dedup would list va/vb in its aggregate keys
    import re
    m = re.search(r"Keys \[\d+\]: \[([^\]]*id_a[^\]]*)\]", plan)
    assert m, plan[:800]
    assert "va" not in m.group(1) and "vb" not in m.group(1)


def test_ivf_candidates_carry_ids_only_and_broadcast_queries(spark):
    """The IVF candidate equi-join on coarse cell and the pair dedup
    carry ids only; the exact re-rank broadcasts the query vectors."""
    from sketchlib import ann as A
    emb = (spark.read.parquet(f"{SF}/embeddings.parquet")
           .select("vec_id", F.col("embedding").cast("array<double>")
                   .alias("embedding")))
    qs = emb.filter(F.col("vec_id") < 3)
    cents = A.ivf_train(emb, nlist=4, iters=1)
    plan = _plan(A.ann_topk_ivf(emb, qs, k=3, nprobe=2, centroids=cents))
    import re
    m = re.search(r"Keys \[\d+\]: \[([^\]]*query_id[^\]]*)\]", plan)
    assert m, plan[:800]
    assert "embedding" not in m.group(1) and " v#" not in m.group(1)
    assert "BroadcastHashJoin" in plan


def test_hk_recount_broadcasts_topk(spark):
    """heavy_hitters_hk's exact recount joins the scan against the
    k selected keys via broadcast, never a shuffle join."""
    from sketchlib import queries as Q
    ev = spark.read.parquet(f"{SF}/events.parquet")
    keyed = ev.select(F.floor(F.sqrt("event_id")).cast("long")
                      .cast("string").alias("hkey"))
    plan = _plan(Q.heavy_hitters_hk(keyed, "hkey", 5, np_bits=8, nh=3))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pcbf_probe_is_broadcast_no_probe_shuffle(spark):
    """The sibling point-frequency queries probe via a broadcast blob
    inside one pandas UDF: the probe side must be a single projection
    over the distinct-key aggregate — no join, no extra exchange
    beyond the distinct's own."""
    plan = _plan(E.queries()["pcbf_user_freq"](spark, SF))
    assert "Join" not in plan  # broadcast-variable probe, not a join


def test_vac_spectrum_single_scan_posexplode(spark):
    plan = _plan(E.queries()["vac_user_spectrum"](spark, SF))
    assert "Generate posexplode" in plan or "posexplode" in plan
    assert "Join" not in plan


def test_swcm_single_sorted_partition_shape(spark):
    """SWCM is sequential by definition: the stream leg must show one
    round-robin repartition(1) + in-partition sort, and the key
    re-attach must broadcast (150 distinct users)."""
    plan = _plan(E.queries()["swcm_recent_user_freq"](spark, SF))
    assert "REPARTITION_BY_NUM" in plan
    assert "Sort " in plan
    assert "SortMergeJoin" not in plan


def test_dsir_scoring_has_no_join_and_takeordered(spark):
    """DSIR scoring must be a joinless codegen lookup (element_at into
    the log-ratio literal) feeding a partial+final hash aggregate; the
    selection must plan as TakeOrderedAndProject, not a full sort.
    The only join allowed is the final k-row id join back to raw."""
    from sketchlib.dsir import dsir_select
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    sel = dsir_select(docs.select("doc_id", "lang", "text"),
                      docs.filter(F.col("lang") == "en")
                          .select("doc_id", "text"),
                      50, n_buckets=256, seed=0)
    plan = _plan(sel)
    assert "TakeOrderedAndProject" in plan
    assert "SortMergeJoin" not in plan
    assert plan.count("HashAggregate") >= 2  # partial + final score sum
    # scoring leg: one join NODE total (the k-row select join, which
    # broadcasts); formatted plans print each node twice (tree +
    # detail), so one node == 2 occurrences
    assert plan.count("BroadcastHashJoin") == 2
    assert "ShuffledHashJoin" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_packing_no_single_partition_window(spark):
    """The global cumsum must be the two-phase form: ONE hash exchange
    on the order-preserving key-prefix bucket + a bucket-partitioned
    window — never a window over one global partition (Exchange
    SinglePartition), and no second (range) exchange either."""
    from sketchlib.packing import doc_offsets, pack_manifest
    from sketchlib.textstats import token_stats
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    nt = token_stats(docs).select("doc_id", "n_tokens")
    plan = _plan(pack_manifest(nt, 2048))
    assert "SinglePartition" not in plan
    assert "rangepartitioning" not in plan.lower()
    assert "Generate explode" in plan or "explode" in plan
    # every data exchange in the offsets job is the single
    # hashpartitioning(bkt) shuffle (AQE prints it twice: initial +
    # final plan); anything else (range, single-partition) is a
    # regression
    off_plan = _plan(doc_offsets(nt))
    import re
    kinds = set(re.findall(r"(\w+partitioning)\(\w+", off_plan))
    assert kinds == {"hashpartitioning"}
    assert "hashpartitioning(bkt" in off_plan


def test_cm_drift_probe_has_no_join_between_snapshots(spark):
    """The drift probe annotates the distinct-key set with both
    snapshot estimates via broadcast blobs — two chained pandas-UDF
    column evals, never a join between the two snapshot builds."""
    plan = _plan(E.queries()["cm_drift_user_freq"](spark, SF))
    assert "SortMergeJoin" not in plan
    assert "BroadcastHashJoin" not in plan
    assert "ArrowEvalPython" in plan
    # the probe's only exchanges: union-distinct agg + final sort
    import re
    assert len(re.findall(r"\(\d+\) Exchange", plan)) <= 2, plan[:400]


def test_skew_split_join_hot_side_broadcasts(spark):
    """The hot side must plan an explicit BroadcastHashJoin even with
    auto-broadcast off; the union's cold side keeps a non-broadcast
    join (the split would be pointless if everything broadcast)."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        plan = _plan(E.queries()["skew_join_priority"](spark, SF))
        assert "BroadcastHashJoin" in plan
        assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_range_buckets_stays_jvm_side(spark):
    """Bucket assignment is chained codegen comparisons — no Python
    eval node, no join anywhere in the counting plan."""
    plan = _plan(E.queries()["range_buckets_price"](spark, SF))
    assert "ArrowEvalPython" not in plan
    assert "BatchEvalPython" not in plan
    assert "Join" not in plan


def test_event_transitions_single_key_exchange_before_window(spark):
    """The per-key LAG window consumes exactly one hashpartitioning
    exchange on the sequence key; the bigram agg partials before its
    exchange (map-side combine)."""
    import re
    plan = _plan(E.queries()["event_transitions"](spark, SF))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    key_ex = re.findall(r"hashpartitioning\(user_id", plan)
    assert len(key_ex) == 1
    m = re.search(r"\((\d+)\) HashAggregate[^(]*partial_count", plan)
    assert m is not None


def test_multimodal_wav_zero_exchange_pipeline(spark):
    """Round 3: WAV generate + decode are two chained mapInPandas over
    the range scan — a narrow 0-exchange pipeline (the orderBy at the
    driver contract's tail is the only sort and costs one exchange at
    most; the decode itself must not shuffle)."""
    from sketchlib.multimodal import synthetic_wav_media, wav_amplitude_stats
    df = wav_amplitude_stats(synthetic_wav_media(spark, 16, partitions=4))
    plan = _plan(df)
    assert "Exchange" not in plan


def test_multimodal_bmp_zero_exchange_pipeline(spark):
    from sketchlib.multimodal import bmp_pixel_stats, synthetic_bmp_media
    df = bmp_pixel_stats(synthetic_bmp_media(spark, 16, partitions=4))
    plan = _plan(df)
    assert "Exchange" not in plan


def test_bm25_single_corpus_scan(spark):
    """Round 3: the pivoted BM25 plan reads the documents table ONCE
    for scoring plus once for the (cached) per-doc stats reduction —
    the plan must show at most 2 parquet scans and exactly 2 shuffle
    exchanges, with no Python eval anywhere."""
    import re
    plan = _plan(E.queries()["bm25_topk_docs"](spark, SF))
    assert "ArrowEvalPython" not in plan and "BatchEvalPython" not in plan
    assert "TakeOrderedAndProject" in plan
    assert len(re.findall(r"\(\d+\) Exchange", plan)) == 2


def test_multimodal_png_zero_exchange_pipeline(spark):
    """Round 4: PNG generate + decode are chained mapInPandas over the
    range scan — same narrow 0-exchange shape as the WAV/BMP paths;
    the zlib inflate/unfilter must not introduce any shuffle."""
    from sketchlib.multimodal import png_pixel_stats, synthetic_png_media
    df = png_pixel_stats(synthetic_png_media(spark, 16, partitions=4))
    plan = _plan(df)
    assert "Exchange" not in plan


def test_psi_drift_grouped_build_single_events_scan(spark):
    """Round 4 (VERDICT item 2): the PSI drift query's sketch build
    must read `events` ONCE — both half-KLLs come from one grouped
    build keyed on the early/late flag, not two filtered build_sketch
    scans. Pinned on the grouped-build plan (the query's own result is
    a driver-built table, so the scan lives in this inner plan)."""
    import re
    from functools import partial as _p

    from sketchlib.aggregate import build_grouped_sketches
    from sketchlib.sketches.kll import KLL

    ev = spark.read.parquet(SF + "/events.parquet")
    vals = ev.select((F.dayofmonth("ts") <= 15).alias("old"),
                     F.col("value").cast("double").alias("v"))
    grouped = build_grouped_sketches(vals, ["old"], "v", _p(KLL, 1 << 12),
                                     as_u64=False, salt_buckets=4)
    plan = _plan(grouped)
    # count detail-section scan nodes, not tree-diagram lines
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1


def test_multimodal_gif_zero_exchange_pipeline(spark):
    from sketchlib.multimodal import gif_pixel_stats, synthetic_gif_media
    df = gif_pixel_stats(synthetic_gif_media(spark, 16, partitions=4))
    plan = _plan(df)
    assert "Exchange" not in plan


def test_pq_init_sample_no_window_sort_or_exchange(spark):
    """Round 5 (VERDICT item 2): pq_train's centroid init must not
    funnel the training set through a single-task global sort. The
    seeded-hash take-k compiles to TakeOrderedAndProject (local
    per-partition top-k + driver merge) with no Window, Sort, or
    Exchange node in the plan."""
    from sketchlib.ann import _pq_init_sample

    emb = spark.read.parquet(SF + "/embeddings.parquet")
    plan = _plan(_pq_init_sample(emb, 64, "vec_id", "embedding"))
    assert "TakeOrderedAndProject" in plan
    assert "Window" not in plan
    assert "Exchange" not in plan
    import re
    # no standalone Sort node (TakeOrderedAndProject's internal bounded
    # heap is not a Sort operator)
    assert not re.findall(r"\(\d+\) Sort\b", plan)


def test_multimodal_jpeg_zero_exchange_pipeline(spark):
    from sketchlib.multimodal import jpeg_pixel_stats, synthetic_jpeg_media
    df = jpeg_pixel_stats(synthetic_jpeg_media(spark, 16, partitions=4))
    plan = _plan(df)
    assert "Exchange" not in plan


def test_multimodal_flac_zero_exchange_pipeline(spark):
    from sketchlib.multimodal import (flac_amplitude_stats,
                                      synthetic_flac_media)
    df = flac_amplitude_stats(synthetic_flac_media(spark, 12,
                                                   partitions=4))
    plan = _plan(df)
    assert "Exchange" not in plan
