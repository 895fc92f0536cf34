"""Training-data export operators: mixture (temperature) sampling and
deterministic shuffle-sharding.

The last mile of a 100 TB training pipeline is (a) choosing HOW MUCH
of each source/language goes into the mix and (b) writing the chosen
rows as a globally shuffled, shard-balanced set of files whose content
AND order are a pure function of (corpus, seed) — so a re-run on a
different cluster, partitioning, or engine produces byte-identical
shards. The reference has no analog (its corpora fit one machine);
at corpus scale both are first-class operators.

Mixture sampling follows the multilingual "temperature" rule
(Arivazhagan et al. 2019, §4.2; used verbatim by mT5 and XLM-R):
a group with mass fraction p_g is sampled proportional to p_g^alpha,
i.e. each ROW gets weight p_g^(alpha-1) — alpha=1 keeps the natural
distribution, alpha=0 equalizes groups, alpha in (0,1) up-samples the
tail. The draw itself reuses the deterministic Efraimidis–Spirakis
key from :mod:`sketchlib.sampling` (md5-derived u, engine-portable),
so the SAMPLE — not just its size — is reproducible and the driver
query is strict-equality gated against DuckDB in the true sampling
regime.

Shuffle-sharding derives a 52-bit integer v = md5(seed, id)[:13 hex]
per row; ``shard = v % n_shards`` and v is the within-shard sort key.
One exchange (repartition on shard) + sortWithinPartitions — there is
deliberately NO global sort: at 100 TB a total order is a needless
range-exchange; determinism only needs a per-shard total order, which
the (v, id) key gives exactly. Shards are hash-balanced (±O(sqrt)
binomial jitter), and the whole layout is again a pure function of
(ids, seed), which the export_shards driver query gates with a
positional checksum the oracle recomputes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from sketchlib.sampling import weighted_sample

__all__ = ["mixture_weights", "temperature_sample", "shuffle_shard",
           "write_shards", "select_within_budget"]

_SEP = "\x1f"  # unit separator; DuckDB spells it chr(31)


def select_within_budget(scored: DataFrame, budget: int,
                         quality_col: str = "quality_score",
                         tokens_col: str = "n_tokens",
                         id_col: str = "doc_id",
                         partitions: int | None = None) -> DataFrame:
    """Greedy quality-first corpus selection under a global token
    budget: walk documents in ``(quality desc, id asc)`` order and keep
    the maximal prefix whose running token total stays <= ``budget``
    (the standard "best docs until the budget is full" curation rule;
    the first overflowing doc and everything after it are excluded).

    100 TB shape — a distributed prefix sum, NOT a single-partition
    window: ``repartitionByRange`` on the sort key gives ordered
    partitions (one range exchange, the minimum any global order
    needs); each partition computes its local cumsum in one numpy pass;
    the |partitions| per-partition totals — scalars, not rows — are
    exclusive-prefix-summed on the driver and broadcast back as a
    literal map; the final filter is codegen. Only k selected ids flow
    onward; the corpus never collects anywhere.

    Returns ``(id, quality, tokens, cum_tokens)`` for the selected
    prefix, ordered by id."""
    import pandas as pd
    from pyspark import TaskContext

    src = scored.select(F.col(id_col).alias("id"),
                        F.col(quality_col).alias("q"),
                        F.col(tokens_col).cast("long").alias("t"))
    n_parts = partitions or src.sparkSession.sparkContext.defaultParallelism
    rp = src.repartitionByRange(n_parts, F.col("q").desc(), F.col("id"))

    def local_cumsum(batches):
        pid = TaskContext.get().partitionId()
        parts = [pdf for pdf in batches if len(pdf)]
        if not parts:
            return
        pdf = pd.concat(parts, ignore_index=True)
        pdf = pdf.sort_values(["q", "id"],
                              ascending=[False, True],
                              kind="mergesort").reset_index(drop=True)
        pdf["local_cum"] = pdf["t"].cumsum()
        pdf["pid"] = pid
        yield pdf

    from sketchlib.cache import scoped_persist

    # scoped_persist: scanned twice (totals collect + final plan); the
    # bounded registry prevents unbounded cache accumulation across
    # repeated calls in a long-lived session (round-3 ADVICE).
    local = scoped_persist(rp.mapInPandas(
        local_cumsum,
        schema="id long, q double, t long, local_cum long, pid int"))
    # |partitions| scalar totals -> exclusive prefix offsets (driver
    # folds P numbers, bounded at any data scale); the range
    # partitioner orders partitions by the same (q desc, id) key the
    # local sort uses, so offset[pid] is exact
    totals = {r["pid"]: r["s"] for r in
              local.groupBy("pid").agg(F.sum("t").alias("s")).collect()}
    off, offsets = 0, {}
    for pid in sorted(totals):
        offsets[pid] = off
        off += totals[pid]
    omap = F.create_map(
        *[F.lit(x) for pid in offsets for x in (pid, offsets[pid])])
    return (local
            .withColumn("cum_tokens", F.col("local_cum")
                        + omap[F.col("pid")])
            .filter(F.col("cum_tokens") <= budget)
            .select(F.col("id").alias(id_col),
                    F.col("q").alias(quality_col),
                    F.col("t").alias(tokens_col), "cum_tokens")
            .orderBy(id_col))


def mixture_weights(df: DataFrame, group_col: str, alpha: float,
                    out_col: str = "mix_weight") -> DataFrame:
    """Attach the temperature-sampling row weight p_g^(alpha-1).

    One tiny aggregate (|groups| rows) broadcast-joined back — the
    corpus is scanned once and never shuffled. The group-mass window
    runs over the counts table, not the corpus.
    """
    counts = df.groupBy(group_col).agg(F.count("*").alias("__n"))
    counts = counts.withColumn(
        "__p", F.col("__n") / F.sum("__n").over(Window.partitionBy()))
    w = counts.select(
        group_col,
        F.pow(F.col("__p"), F.lit(alpha - 1.0)).alias(out_col))
    return df.join(F.broadcast(w), group_col)


def temperature_sample(df: DataFrame, group_col: str, k: int,
                       id_cols: list[str], alpha: float = 0.5,
                       seed: int = 0) -> DataFrame:
    """k-row temperature-balanced sample without replacement:
    E-S weighted sampling with w = p_g^(alpha-1). Plans as
    TakeOrderedAndProject over the weight-joined scan — per-task
    top-k, no corpus shuffle."""
    w = mixture_weights(df, group_col, alpha)
    return (weighted_sample(w, k, id_cols, weight_col="mix_weight",
                            seed=seed)
            .drop("mix_weight"))


def shuffle_shard(df: DataFrame, id_cols: list[str], n_shards: int,
                  seed: int = 0) -> DataFrame:
    """Add deterministic ``shard`` (int) and ``shard_key`` (52-bit
    long) columns: a seeded global shuffle expressed as data, not as
    an action. ``shard_key`` is md5-derived exactly like the sampling
    u (engine-portable), so shard assignment and within-shard order
    are reproducible anywhere."""
    h = F.md5(F.concat_ws(
        _SEP, F.lit(str(seed)),
        *[F.col(c).cast("string") for c in id_cols]))
    v = F.conv(F.substring(h, 1, 13), 16, 10).cast("long")
    return (df.withColumn("shard_key", v)
              .withColumn("shard",
                          (v % F.lit(n_shards)).cast("int")))


def write_shards(df: DataFrame, path: str, id_cols: list[str],
                 n_shards: int, seed: int = 0,
                 fmt: str = "parquet") -> None:
    """Materialize the deterministic shuffle: one hash exchange on
    ``shard``, per-shard sort by (shard_key, ids), one file per shard
    (partitionBy keeps the shard id in the layout). No global sort,
    no driver collect."""
    out = shuffle_shard(df, id_cols, n_shards, seed)
    # sort leads with the partition column: dynamic-partition writes
    # require child ordering on (shard), and if the requirement isn't
    # already satisfied the writer inserts its own NON-STABLE sort by
    # shard alone, destroying the shard_key order (observed)
    (out.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", "shard_key", *id_cols)
        .write.mode("overwrite").partitionBy("shard")
        .format(fmt).save(path))
