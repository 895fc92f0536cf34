"""Final sibling group: pcbf, VACSketch, CWS, HyperMinHash, SetSketch,
RNLA kit."""

from __future__ import annotations

import numpy as np
import pytest

from sketchlib.sketches.base import deserialize
from sketchlib.sketches.cws import CWSSignature
from sketchlib.sketches.hmh import HyperMinHash
from sketchlib.sketches.pcbf import PCBF
from sketchlib.sketches.rnla import (cs_transform, cs_transform_batch, dot,
                                     tensor_sketch)
from sketchlib.sketches.setsketch import SetSketch
from sketchlib.sketches.vac import VACSketch

RNG = np.random.default_rng(21)


def test_pcbf_multiplicity_and_stage_cardinalities():
    keys = np.arange(12_000, dtype=np.uint64)
    counts = np.where(keys % 3 == 0, 9, 1)  # 4000 keys at weight 9
    sk = PCBF(n_stages=6, bf_p=18, hll_p=12)
    sk.update_weighted(keys, counts)
    est = sk.est_count(keys)
    expect = 2 ** np.floor(np.log2(counts)).astype(np.int64)
    assert (est == expect).all()
    cards = sk.stage_cardinalities()
    # stage 0: all 12k keys; stages 1..3 (count>=2,4,8): the 4000 heavy
    bound = 6 * 1.03896 / (1 << 6)  # hll_p=12 => sqrt(m)=64
    assert abs(cards[0] - 12_000) <= bound * 12_000
    for s in (1, 2, 3):
        assert abs(cards[s] - 4_000) <= bound * 4_000
    m = deserialize(sk.to_bytes()).merge(deserialize(sk.to_bytes()))
    assert (m.est_count(keys) == expect).all()


def test_vacsketch_spectrum_halves_per_layer():
    keys = np.arange(500, dtype=np.uint64)
    counts = RNG.integers(1, 1000, 500)
    a = VACSketch(6, np_bits=14, nh=5)
    a.update_weighted(keys[:250], counts[:250])
    b = VACSketch(6, np_bits=14, nh=5)
    b.update_weighted(keys[250:], counts[250:])
    m = deserialize(a.to_bytes()).merge(deserialize(b.to_bytes()))
    spec = m.spectrum(keys)
    for i in range(6):
        assert (spec[i] == (counts >> i)).all()  # collision-free width


def test_cws_estimates_weighted_jaccard():
    feats = np.arange(200)
    wa = RNG.integers(0, 10, 200).astype(float)
    wb = RNG.integers(0, 10, 200).astype(float)
    both = (wa > 0) | (wb > 0)
    true_j = np.minimum(wa, wb)[both].sum() / np.maximum(wa, wb)[both].sum()
    cw = CWSSignature(512, seed=5)
    sa = cw.signature(feats[wa > 0], wa[wa > 0])
    sb = cw.signature(feats[wb > 0], wb[wb > 0])
    est = CWSSignature.similarity(sa, sb)
    sigma = np.sqrt(true_j * (1 - true_j) / 512)
    assert abs(est - true_j) <= 6 * sigma
    # consistency: identical inputs collide on every slot
    assert CWSSignature.similarity(sa, sa) == 1.0


def test_hyperminhash_cardinality_jaccard_intersection():
    n_a, n_b, n_i = 40_000, 30_000, 15_000
    a_only = RNG.integers(0, 1 << 62, n_a - n_i, dtype=np.uint64)
    b_only = RNG.integers(0, 1 << 62, n_b - n_i,
                          dtype=np.uint64) + (1 << 62)
    both = RNG.integers(0, 1 << 62, n_i, dtype=np.uint64) + (2 << 62)
    A = HyperMinHash(12, 12)
    A.update(np.concatenate([a_only, both]))
    B = HyperMinHash(12, 12)
    B.update(np.concatenate([b_only, both]))
    assert abs(A.cardinality() - n_a) <= 0.1 * n_a
    true_j = n_i / (n_a + n_b - n_i)
    assert abs(A.jaccard(B) - true_j) <= 0.08
    assert abs(A.intersection_size(B) - n_i) <= 0.3 * n_i
    # merge == union build, bit-exact
    u = deserialize(A.to_bytes()).merge(deserialize(B.to_bytes()))
    direct = HyperMinHash(12, 12)
    direct.update(np.concatenate([a_only, b_only, both]))
    assert (u.ranks == direct.ranks).all()
    assert (u.mants == direct.mants).all()


def test_setsketch_cardinality_and_base2_hll_equivalence():
    n = 300_000
    vals = RNG.integers(0, 1 << 62, n, dtype=np.uint64)
    for base in (2.0, 1.2):
        sk = SetSketch(12, base=base)
        sk.update(vals)
        assert abs(sk.cardinality() - n) <= 0.1 * n, base
    a = SetSketch(12, base=1.2)
    a.update(vals[:200_000])
    b = SetSketch(12, base=1.2)
    b.update(vals[100_000:])
    u = deserialize(a.to_bytes()).merge(deserialize(b.to_bytes()))
    direct = SetSketch(12, base=1.2)
    direct.update(vals)
    assert (u.registers == direct.registers).all()


def test_rnla_count_sketch_preserves_inner_products():
    d, out = 4096, 1024
    x = RNG.standard_normal(d)
    y = RNG.standard_normal(d)
    ests = [dot(cs_transform(x, out, seed=s), cs_transform(y, out, seed=s))
            for s in range(11)]
    est = float(np.median(ests))
    true = float(np.dot(x, y))
    tol = 6 * np.linalg.norm(x) * np.linalg.norm(y) / np.sqrt(out)
    assert abs(est - true) <= tol
    # linearity: cs(x+y) == cs(x) + cs(y) exactly
    np.testing.assert_allclose(cs_transform(x + y, out),
                               cs_transform(x, out) + cs_transform(y, out),
                               rtol=1e-12)
    # batch form matches the single-vector form
    B = np.stack([x, y])
    np.testing.assert_allclose(cs_transform_batch(B, out),
                               np.stack([cs_transform(x, out),
                                         cs_transform(y, out)]), rtol=1e-12)


def test_rnla_tensor_sketch_outer_product_inner_products():
    d, out = 256, 4096
    x1, y1 = RNG.standard_normal(d), RNG.standard_normal(d)
    x2, y2 = RNG.standard_normal(d), RNG.standard_normal(d)
    ests = [dot(tensor_sketch(x1, y1, out, seed=s),
                tensor_sketch(x2, y2, out, seed=s)) for s in range(11)]
    est = float(np.median(ests))
    true = float(np.dot(x1, x2) * np.dot(y1, y2))
    scale = (np.linalg.norm(x1) * np.linalg.norm(y1)
             * np.linalg.norm(x2) * np.linalg.norm(y2))
    assert abs(est - true) <= 8 * scale / np.sqrt(out)


def test_new_sketches_through_spark_harness(spark):
    """End-to-end through the generic distributed harness: the new
    sketch classes must build via mapInPandas partials + blob-registry
    merges on executors and agree with a local sequential build."""
    from functools import partial as _p

    from pyspark.sql import functions as F

    from sketchlib.aggregate import build_grouped_sketches, build_sketch
    from sketchlib.sketches.hmh import HyperMinHash
    from sketchlib.sketches.mh import MinHashBottomK
    from sketchlib.sketches.setsketch import SetSketch

    ev = (spark.read.parquet("/root/testdata/sf0.01/events.parquet")
          .select(F.xxhash64("user_id").alias("kh")))
    local_vals = ev.toPandas()["kh"].to_numpy().view(np.uint64)

    for factory in (_p(HyperMinHash, 10, 8), _p(SetSketch, 10, 1.5),
                    _p(MinHashBottomK, 4096)):
        dist = build_sketch(ev.repartition(7), "kh", factory)
        seq = factory()
        seq.update(local_vals)
        # order-independent merges => bit-identical state
        assert dist.to_bytes() == seq.to_bytes(), factory

    # grouped path with salting
    evk = (spark.read.parquet("/root/testdata/sf0.01/events.parquet")
           .select("event_type", F.xxhash64("user_id").alias("kh")))
    grouped = build_grouped_sketches(evk, ["event_type"], "kh",
                                     _p(MinHashBottomK, 4096),
                                     salt_buckets=4)
    rows = {r["event_type"]: r["sketch"] for r in grouped.collect()}
    assert len(rows) == 5
    from sketchlib.sketches.base import deserialize
    pdf = evk.toPandas()
    for et, blob in rows.items():
        seq = MinHashBottomK(4096)
        seq.update(pdf[pdf.event_type == et]["kh"].to_numpy()
                   .view(np.uint64))
        assert deserialize(bytes(blob)).to_bytes() == seq.to_bytes()
