"""Wall-vs-sf slope table: compare two bench.py JSON outputs (e.g.
sf0.1 vs sf1 = 10x data) and report per-query and per-family wall
ratios. A query whose wall grows faster than the data decade is
super-linear and needs a plan look.

Usage: python tools/bench_slopes.py small.json big.json [data_ratio]
Prints markdown; exit code 0 always (analysis, not a gate).
"""

from __future__ import annotations

import json
import sys

FAMILIES = {
    "cm_": "frequency sketches", "occm": "frequency sketches",
    "cmm": "frequency sketches", "cml": "frequency sketches",
    "cbf": "frequency sketches", "pcbf": "frequency sketches",
    "cs4w": "frequency sketches", "cs_fold": "frequency sketches",
    "countsketch": "frequency sketches", "swcm": "frequency sketches",
    "vac": "frequency sketches", "estimate_quality": "frequency sketches",
    "heavy_hitter": "heavy hitters", "mg_": "heavy hitters",
    "hll": "cardinality/set", "cardinality": "cardinality/set",
    "filterhll": "cardinality/set", "distinct": "cardinality/set",
    "minhash": "set similarity", "setsim": "set similarity",
    "wmh": "set similarity", "cws": "set similarity",
    "bloom": "bloom/joins", "join": "bloom/joins", "skew": "bloom/joins",
    "asof": "bloom/joins", "range_join": "bloom/joins",
    "kll": "quantiles/drift", "ddsketch": "quantiles/drift",
    "tdigest": "quantiles/drift", "psi": "quantiles/drift",
    "range_buckets": "quantiles/drift", "profile": "quantiles/drift",
    "dedup": "dedup", "semdedup": "dedup", "simhash": "dedup",
    "dup_span": "dedup", "decontam": "dedup",
    "ann_": "ANN", "rnla": "linear algebra", "fd_": "linear algebra",
    "lang_id": "text pipeline", "quality": "text pipeline",
    "repetition": "text pipeline", "pii": "text pipeline",
    "domain": "text pipeline", "training_mix": "text pipeline",
    "dsir": "text pipeline", "lm_scores": "text pipeline",
    "pack_": "text pipeline", "curation": "text pipeline",
    "token_stats": "text pipeline", "doc_fingerprints": "text pipeline",
    "export": "text pipeline",
    "decayed": "decay", "event_": "transitions",
    "weighted_sample": "sampling", "stratified": "sampling",
    "pricing": "SQL breadth", "top_customers": "SQL breadth",
    "user_sessions": "SQL breadth",
    "multimodal": "multimodal",
    "cm_build": "build legs", "conv_stats": "build legs",
    "occm_build": "build legs",
}


def family(q: str) -> str:
    for pre, fam in FAMILIES.items():
        if q.startswith(pre):
            return fam
    return "other"


def main() -> int:
    small = json.load(open(sys.argv[1]))
    big = json.load(open(sys.argv[2]))
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 10.0
    qs, qb = small["queries"], big["queries"]
    common = sorted(set(qs) & set(qb))
    fams: dict[str, list] = {}
    print(f"| query | t(small) | t(big) | wall ratio ({ratio:g}x data) |")
    print("|---|---|---|---|")
    rows = []
    for q in common:
        r = qb[q] / qs[q] if qs[q] > 0 else float("inf")
        rows.append((r, q))
        fams.setdefault(family(q), []).append((qs[q], qb[q]))
    for r, q in sorted(rows, reverse=True):
        flag = " **SUPER-LINEAR**" if r > ratio else ""
        print(f"| {q} | {qs[q]:.2f} | {qb[q]:.2f} | {r:.2f}x{flag} |")
    print()
    print("| family | sum t(small) | sum t(big) | wall ratio |")
    print("|---|---|---|---|")
    for fam in sorted(fams):
        a = sum(x for x, _ in fams[fam])
        b = sum(y for _, y in fams[fam])
        print(f"| {fam} | {a:.2f} | {b:.2f} | {b / a:.2f}x |")
    tot_a = sum(qs[q] for q in common)
    tot_b = sum(qb[q] for q in common)
    print(f"| **total** | {tot_a:.2f} | {tot_b:.2f} | "
          f"{tot_b / tot_a:.2f}x |")
    return 0


if __name__ == "__main__":
    sys.exit(main())
