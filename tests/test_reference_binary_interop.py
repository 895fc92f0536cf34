"""End-to-end interchange: a DISTRIBUTED sketch build, saved in the
reference's binary format, consumed by the reference C++ binary.

Plain-CM distributed builds are bit-exact vs sequential under any
partitioning (sum merge), so the reference `cm query` output over our
distributed sketch must equal the committed golden CSV byte-for-byte.
Skipped when the reference binaries aren't present (they are never
required for the rest of the suite).
"""

from __future__ import annotations

import os
import subprocess
from functools import partial

import pandas as pd
import pytest

from sketchlib.aggregate import build_sketch
from sketchlib.fasta import file_kmers
from sketchlib.sketches.cm import CMConfig, CountMin

REF = "/root/reference"
FIX = os.path.join(os.path.dirname(__file__), "fixtures")


@pytest.mark.skipif(not os.path.exists(f"{REF}/cm"),
                    reason="reference binary not present")
def test_distributed_plain_cm_readable_by_reference_binary(spark, tmp_path):
    kmers = file_kmers(os.path.join(FIX, "rymv.sim.fa"), 22,
                       canonicalize=True)
    df = spark.createDataFrame(
        pd.DataFrame({"k": kmers.astype("int64")})).repartition(7)
    cfg = CMConfig(10, 7, 137, conservative=False)
    sk = build_sketch(df, "k", partial(CountMin, cfg), pre_aggregate=True)

    sketch_path = str(tmp_path / "dist.bin")
    out_path = str(tmp_path / "q.csv")
    sk.save_reference(sketch_path)
    subprocess.run(
        [f"{REF}/cm", "query", "-f", sketch_path,
         "-q", f"{REF}/input/rymv.sim.22counts.txt", "-o", out_path],
        cwd=str(tmp_path), check=True, capture_output=True)
    with open(out_path, "rb") as a, \
            open(os.path.join(FIX, "golden_cm_plain_w1024_q.csv"),
                 "rb") as b:
        assert a.read() == b.read()
