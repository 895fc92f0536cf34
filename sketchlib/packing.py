"""Sequence packing: chop a shuffled document stream into fixed-length
training sequences (the concat-and-chop packing every GPT/Llama-style
pretraining pipeline runs between curation and the data loader).

Semantics: documents are laid out in a deterministic global shuffle
order (52-bit md5 key, id tiebreak — same engine-portable recipe as
:mod:`sketchlib.export`), concatenated token-wise, and chopped into
windows of exactly ``max_len`` tokens. A document whose tokens span a
window boundary contributes a slice to each window it touches. The
output manifest ``(seq_id, doc_id, start, tok_from, tok_to)`` is what
a training loader consumes: sequence ``seq_id`` is the concatenation
of its rows' ``text_tokens[tok_from:tok_to)`` in (seq_id, start)
order — ``start`` (the doc's global offset) is part of the manifest
precisely so that order is recoverable from the output alone.

Scale shape (the 100 TB view): the corpus is scanned ONCE, projecting
only (id, token count) — KBs per million docs; everything after runs
on that skinny table. The global exclusive cumulative sum (each doc's
start offset in the virtual concatenation) is computed WITHOUT a
single-partition window: the uniform md5 key's high bits give an
order-preserving, hash-balanced bucket, one hash exchange of the
skinny table feeds a per-bucket window cumsum, then one scalar per
bucket reaches the driver and comes back as a broadcast offset — the
two-phase rank pattern of :mod:`sketchlib.analysis`, minus even the
range exchange (the key is uniform by construction, so fixed-width
key ranges are already balanced).
The window explode is map-side (`sequence` + `explode`), so the
manifest costs no further shuffle. No Python runs anywhere.

Determinism: start offsets, window ids, and slice bounds are pure
functions of (ids, token counts, seed) — reproducible across
partitionings, clusters, and engines; the ``pack_manifest`` driver
query is strict-equality gated against DuckDB recomputing the same
layout with window functions.

The reference has no analog (alorchhota/ocm is a sketch library); the
operator belongs to the SURVEY §2.3 "beyond the reference" pipeline
set alongside dedup / decontam / mixture sampling / DSIR / sharding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

__all__ = ["doc_offsets", "pack_sequences", "pack_manifest"]

_SEP = "\x1f"  # unit separator; DuckDB spells it chr(31)


def _order_key(id_col: str, seed: int) -> F.Column:
    """52-bit md5 shuffle key — exact in IEEE754 double, identical in
    Spark and DuckDB (same construction as sketchlib.sampling)."""
    return F.conv(F.substring(
        F.md5(F.concat_ws(_SEP, F.lit(f"pack{seed}"),
                          F.col(id_col).cast("string"))), 1, 13),
        16, 10).cast("long")


def doc_offsets(df: DataFrame, id_col: str = "doc_id",
                ntok_col: str = "n_tokens", seed: int = 0,
                n_ranges: int = 64) -> DataFrame:
    """(id, ntok, start): each document's exclusive token offset in the
    virtual concatenation under the deterministic shuffle order.

    The shuffle key is uniform by construction (md5), so instead of a
    range exchange followed by the window's OWN hash exchange (two
    shuffles of the skinny table), the bucket is a fixed-width key
    range computed by integer division: ``bkt = k div ceil(2^52 /
    n_ranges)`` is order-preserving in k, hash-balanced, and safe for
    any n_ranges (an earlier ``(k * n_ranges) >> 52`` form overflowed
    int64 — an ANSI-mode ArithmeticException — once n_ranges exceeded
    2048). Per-bucket token totals come from a map-side-combined SUM
    over the skinny projection (no window, no caching); only the
    result's own window cumsum pays the single hashpartitioning(bkt)
    exchange. The skinny projection is evaluated twice (totals job +
    result consumption) rather than persisted: nothing is left pinned
    in storage memory after the call, and callers packing a derived
    plan they'd rather not recompute can persist it themselves."""
    spark = df.sparkSession
    nb = max(1, n_ranges)
    step = ((1 << 52) + nb - 1) // nb
    base = (df.select(F.col(id_col).alias("id"),
                      F.col(ntok_col).cast("long").alias("ntok"))
              .withColumn("k", _order_key("id", seed))
              .withColumn("bkt", F.expr(f"k div {step}").cast("int")))
    # one total per non-empty bucket; buckets are key ranges, so
    # bucket order IS global key order
    totals = sorted(
        (r["bkt"], r["tot"]) for r in
        base.groupBy("bkt").agg(F.sum("ntok").alias("tot")).collect())
    offsets, acc = [], 0
    for bkt, tot in totals:
        offsets.append((bkt, acc))
        acc += tot
    off = spark.createDataFrame(offsets or [(0, 0)], "bkt int, off long")
    cum = F.sum("ntok").over(Window.partitionBy("bkt").orderBy("k", "id"))
    return (base.withColumn("cum", cum)
            .join(F.broadcast(off), "bkt")
            .select(F.col("id").alias(id_col), "ntok",
                    (F.col("off") + F.col("cum") - F.col("ntok"))
                    .alias("start")))


def pack_sequences(df: DataFrame, max_len: int, id_col: str = "doc_id",
                   ntok_col: str = "n_tokens", seed: int = 0,
                   n_ranges: int = 64) -> DataFrame:
    """(id, ntok, start, first_seq, last_seq): the window span each
    non-empty document's tokens fall into. Zero-token documents occupy
    no window and are dropped."""
    off = doc_offsets(df, id_col, ntok_col, seed, n_ranges)
    return (off.filter(F.col("ntok") > 0)
            .select(id_col, "ntok", "start",
                    F.floor(F.col("start") / max_len).alias("first_seq"),
                    F.floor((F.col("start") + F.col("ntok") - 1) / max_len)
                    .alias("last_seq")))


def pack_manifest(df: DataFrame, max_len: int, id_col: str = "doc_id",
                  ntok_col: str = "n_tokens", seed: int = 0,
                  n_ranges: int = 64) -> DataFrame:
    """The loader manifest: one row per (sequence, contributing doc)
    with the in-document token slice [tok_from, tok_to) that lands in
    that sequence. Every sequence except the last holds exactly
    ``max_len`` tokens. Map-side explode — no extra shuffle."""
    pk = pack_sequences(df, max_len, id_col, ntok_col, seed, n_ranges)
    m = pk.select(id_col, "ntok", "start",
                  F.explode(F.sequence("first_seq", "last_seq"))
                  .alias("seq_id"))
    lo = F.greatest(F.lit(0), F.col("seq_id") * max_len - F.col("start"))
    hi = F.least(F.col("ntok"),
                 (F.col("seq_id") + 1) * max_len - F.col("start"))
    # `start` stays in the manifest: within a sequence the loader
    # orders contributing docs by it — without the column the
    # concatenation order of docs wholly contained in one window
    # would be unrecoverable (the shuffle key is private to packing)
    return m.select("seq_id", id_col, "start", lo.alias("tok_from"),
                    hi.alias("tok_to"))
