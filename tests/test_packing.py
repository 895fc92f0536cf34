"""Sequence packing (sketchlib/packing.py).

Invariants: offsets are a permutation layout (disjoint, gap-free,
summing to the corpus token total), every window except the last holds
exactly max_len tokens, slices tile each document exactly once, the
layout is partitioning-invariant, and the whole thing matches a pure
python reimplementation on the same shuffle key.
"""

import hashlib

import pytest
from pyspark.sql import functions as F

from sketchlib.packing import doc_offsets, pack_manifest, pack_sequences

L = 7


def _key(doc_id, seed=0):
    h = hashlib.md5(f"pack{seed}\x1f{doc_id}".encode()).hexdigest()
    return int(h[:13], 16)


@pytest.fixture(scope="module")
def docs(spark):
    rows = [("d%02d" % i, (i * 13) % 11) for i in range(40)]  # some 0-tok
    return spark.createDataFrame(rows, ["doc_id", "n_tokens"]), dict(rows)


def test_offsets_match_pure_python(spark, docs):
    df, rows = docs
    got = {r["doc_id"]: r["start"] for r in doc_offsets(df).collect()}
    order = sorted(rows, key=lambda d: (_key(d), d))
    acc, want = 0, {}
    for d in order:
        want[d] = acc
        acc += rows[d]
    assert got == want


def test_offsets_partition_invariant(spark, docs):
    df, _ = docs
    a = sorted(map(tuple, doc_offsets(df, n_ranges=64).collect()))
    b = sorted(map(tuple, doc_offsets(df.repartition(13),
                                      n_ranges=3).collect()))
    assert a == b


def test_windows_full_except_last(spark, docs):
    df, rows = docs
    m = pack_manifest(df, L)
    per_seq = {r["seq_id"]: r["tot"]
               for r in m.groupBy("seq_id")
               .agg(F.sum(F.col("tok_to") - F.col("tok_from"))
                    .alias("tot")).collect()}
    total = sum(rows.values())
    assert sorted(per_seq) == list(range(len(per_seq)))  # gap-free ids
    last = max(per_seq)
    assert all(v == L for s, v in per_seq.items() if s != last)
    assert sum(per_seq.values()) == total
    assert per_seq[last] == total - L * last


def test_slices_tile_each_document(spark, docs):
    df, rows = docs
    m = pack_manifest(df, L).collect()
    by_doc = {}
    for r in m:
        by_doc.setdefault(r["doc_id"], []).append(
            (r["seq_id"], r["tok_from"], r["tok_to"]))
    for d, n in rows.items():
        if n == 0:
            assert d not in by_doc
            continue
        sl = sorted(by_doc[d])
        assert sl[0][1] == 0 and sl[-1][2] == n
        for (s0, _, hi0), (s1, lo1, _) in zip(sl, sl[1:]):
            assert s1 == s0 + 1 and lo1 == hi0  # contiguous slices


def test_pack_sequences_span_consistent(spark, docs):
    df, _ = docs
    for r in pack_sequences(df, L).collect():
        assert r["first_seq"] == r["start"] // L
        assert r["last_seq"] == (r["start"] + r["ntok"] - 1) // L
        assert r["first_seq"] <= r["last_seq"]


def test_offsets_large_n_ranges_no_overflow(spark, docs):
    """n_ranges beyond 2048 must not overflow the bucket arithmetic
    (the old (k * n_ranges) >> 52 form threw under ANSI mode); results
    are bucketing-invariant."""
    df, _ = docs
    a = sorted(map(tuple, doc_offsets(df, n_ranges=64).collect()))
    b = sorted(map(tuple, doc_offsets(df, n_ranges=100000).collect()))
    assert a == b


def test_manifest_orders_within_sequence_by_start(spark, docs):
    """The manifest must carry enough to reconstruct each training
    sequence: within a seq_id, sorting rows by `start` concatenates
    doc slices in layout order, tiling [0, max_len) exactly."""
    df, _ = docs
    rows = pack_manifest(df, 16).collect()
    by_seq = {}
    for r in rows:
        by_seq.setdefault(r["seq_id"], []).append(r)
    last = max(by_seq)
    for sid, rs in by_seq.items():
        rs.sort(key=lambda r: r["start"])
        pos = 0
        for r in rs:
            # slice lands at (start + tok_from) - sid*16 within the seq
            assert r["start"] + r["tok_from"] - sid * 16 == pos
            pos += r["tok_to"] - r["tok_from"]
        if sid != last:
            assert pos == 16
