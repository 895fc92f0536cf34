"""Bit-exactness of the numpy CM/OCM kernels vs golden artifacts
produced by the reference binaries (committed in tests/fixtures/;
generated once from /root/reference/{cm,ocm} at k=22, h=7, w=1024,
seed=137 on the reference's own rymv dataset).

Golden commands (run once, outputs committed):
  cm  count [-c] -k 22 -h 7 -w 1024 -o golden_*.bin -fa rymv.sim.fa
  ocm count [-c] -k 22 -h 7 -w 1024 -n 4 -t 1 -o golden_*.bin -fa ...
  {cm,ocm} query -f golden_*.bin -q rymv.sim.22counts.txt -o *_q.csv
"""

from __future__ import annotations

import csv
import os

import numpy as np
import pytest

from sketchlib.fasta import encode_kmer, file_kmers
from sketchlib.sketches.cm import CMConfig, CountMin, OfflineCountMin

FX = os.path.join(os.path.dirname(__file__), "fixtures")
FA = os.path.join(FX, "rymv.sim.fa")
# The ocm binary's 100 KB chunked reader processes uninitialized buffer
# bytes past EOF (include/ocm.h:532-541: the read loop scans the full
# chunk even on a short final read), inserting garbage k-mers. The OCM /
# OCCM goldens were therefore generated against rymv.guard.fa — the same
# file with a trailing ">eofguard" header (no newline) so isInHeader
# stays true across the stale tail; verified to make the binary insert
# exactly the clean 56,534-update stream.
FA_GUARD = os.path.join(FX, "rymv.guard.fa")
K, NH, NP_BITS, SEED, ROUNDS = 22, 7, 10, 137, 4


@pytest.fixture(scope="module")
def stream() -> np.ndarray:
    """The exact insertion stream (fwd + revcomp interleaved)."""
    return file_kmers(FA, K, canonicalize=True)


def queries():
    out = []
    with open(os.path.join(FX, "rymv.sim.22counts.txt")) as fh:
        for line in fh:
            parts = line.split()
            if len(parts) >= 2:
                out.append((parts[0], int(parts[1])))
    return out


def golden_csv(name):
    res = {}
    with open(os.path.join(FX, name)) as fh:
        rd = csv.reader(fh)
        next(rd)
        for kmer, true_c, est in rd:
            res[kmer] = int(est)
    return res


def test_stream_size(stream):
    # 28,267 windows x 2 (canonicalization) measured from the reference
    assert stream.shape[0] == 56534


def test_plain_cm_core_bitexact(stream):
    cm = CountMin(CMConfig(NP_BITS, NH, SEED, conservative=False))
    cm.update(stream)
    golden = CountMin.load_reference(
        os.path.join(FX, "golden_cm_plain_w1024.bin"), conservative=False)
    assert golden.config.np_bits == NP_BITS and golden.config.nh_odd == NH
    np.testing.assert_array_equal(cm.core, golden.core)


def test_plain_cm_partitioned_bitexact(stream):
    """Plain CM is order-independent: partials + sum-merge == sequential."""
    rng = np.random.default_rng(7)
    perm = rng.permutation(stream.shape[0])
    parts = np.array_split(stream[perm], 5)
    partials = []
    for p in parts:
        cm = CountMin(CMConfig(NP_BITS, NH, SEED, conservative=False))
        cm.update(p)
        partials.append(cm)
    merged = partials[0]
    for p in partials[1:]:
        merged.merge(p)
    golden = CountMin.load_reference(
        os.path.join(FX, "golden_cm_plain_w1024.bin"), conservative=False)
    np.testing.assert_array_equal(merged.core, golden.core)


def test_conservative_cm_strict_bitexact(stream):
    cm = CountMin(CMConfig(NP_BITS, NH, SEED, conservative=True))
    cm.update(stream, strict_order=True)
    golden = CountMin.load_reference(
        os.path.join(FX, "golden_cm_cons_w1024.bin"))
    np.testing.assert_array_equal(cm.core, golden.core)


def test_query_csv_bitexact(stream):
    """Estimates on the committed query set match the reference's own
    query output CSVs for plain and conservative CM."""
    qs = queries()
    enc = np.array([encode_kmer(k) for k, _ in qs], dtype=np.uint64)
    for bin_name, csv_name, cons in [
        ("golden_cm_plain_w1024.bin", "golden_cm_plain_w1024_q.csv", False),
        ("golden_cm_cons_w1024.bin", "golden_cm_cons_w1024_q.csv", True),
    ]:
        cm = CountMin.load_reference(os.path.join(FX, bin_name), cons)
        est = cm.estimate(enc)
        gold = golden_csv(csv_name)
        for (kmer, _), e in zip(qs, est):
            assert int(e) == gold[kmer], (bin_name, kmer)


def _exact_counts(stream):
    u, c = np.unique(stream, return_counts=True)
    return dict(zip(u.tolist(), c.tolist()))


def test_conservative_batch_bounds(stream):
    """The distributed-order conservative kernel keeps the one-sided
    guarantee and never exceeds plain CM."""
    cons = CountMin(CMConfig(NP_BITS, NH, SEED, conservative=True))
    # simulate distributed: shuffled split into 8 partitions, sum-merge
    rng = np.random.default_rng(3)
    perm = rng.permutation(stream.shape[0])
    for p in np.array_split(stream[perm], 8):
        part = CountMin(CMConfig(NP_BITS, NH, SEED, conservative=True))
        part.update(p)
        if cons is None:
            cons = part
        else:
            cons.merge(part)
    plain = CountMin(CMConfig(NP_BITS, NH, SEED, conservative=False))
    plain.update(stream)
    exact = _exact_counts(stream)
    keys = np.fromiter(exact.keys(), dtype=np.uint64)
    est_c = cons.estimate(keys)
    est_p = plain.estimate(keys)
    true = np.fromiter((exact[int(k)] for k in keys), dtype=np.uint64)
    assert (est_c >= true).all()
    assert (est_c <= est_p).all()


def _ocm_build_strict(stream, conservative: bool) -> OfflineCountMin:
    """Replicate the reference round loop (main.cpp:35-90), including the
    OCCM quirk that its r>0 pre-pass is functionally dead (SURVEY.md O16)."""
    ocm = OfflineCountMin(CMConfig(NP_BITS, NH, SEED, conservative))
    for r in range(ROUNDS):
        if not conservative:
            if r > 0:
                ocm.update_collision_strict(stream, r, 0)
            ocm.clear_core()
            ocm.update_count_strict(stream, r, 0)
        else:
            ocm.clear_core()
            ocm.update_count_collision_strict(stream, r, ROUNDS)
    return ocm


@pytest.mark.parametrize("conservative,binname", [
    (False, "golden_ocm_n4_w1024.bin"),
    (True, "golden_occm_n4_w1024.bin"),
])
def test_offline_strict_bitexact(conservative, binname):
    guard_stream = file_kmers(FA_GUARD, K, canonicalize=True)
    assert guard_stream.shape[0] == 56534
    ocm = _ocm_build_strict(guard_stream, conservative)
    golden = OfflineCountMin.load_reference(os.path.join(FX, binname),
                                            conservative)
    np.testing.assert_array_equal(ocm.core, golden.core)
    np.testing.assert_array_equal(ocm.collision, golden.collision)


def test_reference_roundtrip(tmp_path, stream):
    cm = CountMin(CMConfig(NP_BITS, NH, SEED, conservative=False))
    cm.update(stream[:1000])
    p = str(tmp_path / "x.bin")
    cm.save_reference(p)
    back = CountMin.load_reference(p, conservative=False)
    np.testing.assert_array_equal(cm.core, back.core)
    blob = cm.to_bytes()
    back2 = CountMin.from_bytes(blob)
    np.testing.assert_array_equal(cm.core, back2.core)
