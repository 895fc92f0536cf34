"""Deterministic data scaler: build an sf1-shaped dataset (10x sf0.1)
for DATA-SCALING measurements (BENCH wall-vs-sf slopes).

The driver only ships sf{0.001,0.01,0.1}; the round-2 verdict asks for
one more decade of scaling evidence. Naive row replication would lie to
the dedup/similarity family (every doc would gain 9 exact clones =>
candidate-pair counts grow ~45x instead of ~10x), so each copy k gets
its own key space and decorrelated content:

- fact keys shift by k * stride per key domain (FKs stay consistent
  within a copy — the TPC-H scaling convention: more orders/customers/
  parts over the same date range and dimension tables);
- events: new user population per copy (user_id shift), same time
  range => 10x stream density, per-user streams preserved;
- documents: every 3rd token is salted with the copy tag, so EVERY
  3-gram shingle contains a salted token and cross-copy MinHash/SimHash
  similarity collapses to ~0, while the within-copy duplicate structure
  (the every-10th-doc clones injected by the dedup queries) scales
  exactly like the base data;
- embeddings: vectors are np.roll'ed by 7k dims per copy — norms and
  within-copy geometry are exactly preserved, cross-copy cosine decorrelates.

Usage: python tools/make_scaled_data.py [src_dir] [out_dir] [n_copies]
Defaults: /root/testdata/sf0.1 -> /root/repo/testdata_sf1, 10 copies.
Output is ~170 MB and gitignored — regenerate on demand (deterministic,
no RNG anywhere).
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

STRIDES = {
    "c_custkey": 10**7, "o_orderkey": 10**8, "o_custkey": 10**7,
    "l_orderkey": 10**8, "l_partkey": 10**6, "l_suppkey": 10**5,
    "p_partkey": 10**6, "s_suppkey": 10**5,
    "event_id": 10**8, "user_id": 10**6,
    "doc_id": 10**6, "vec_id": 10**5,
}
COPY_AS_IS = {"region", "nation"}


def _salt_text(text: str, k: int) -> str:
    toks = text.split(" ")
    tag = f"c{k}"
    return " ".join(t + tag if j % 3 == 0 else t
                    for j, t in enumerate(toks))


def scale_table(name: str, df: pd.DataFrame, n_copies: int) -> pd.DataFrame:
    if name in COPY_AS_IS:
        return df
    out = []
    for k in range(n_copies):
        c = df.copy()
        for col, stride in STRIDES.items():
            if col in c.columns:
                c[col] = c[col] + k * stride
        if name == "documents" and k > 0:
            c["text"] = [_salt_text(t, k) for t in c["text"]]
            c["n_chars"] = [len(t) for t in c["text"]]
        if name == "embeddings" and k > 0:
            c["embedding"] = [np.roll(np.asarray(e, dtype=np.float32),
                                      7 * k).tolist()
                              for e in c["embedding"]]
        out.append(c)
    return pd.concat(out, ignore_index=True)


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    dst = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/testdata_sf1"
    n_copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(dst, exist_ok=True)
    for name in ["region", "nation", "customer", "supplier", "part",
                 "orders", "lineitem", "events", "documents",
                 "embeddings"]:
        t = pq.read_table(f"{src}/{name}.parquet")
        base_schema = t.schema
        df = t.to_pandas()
        scaled = scale_table(name, df, n_copies)
        out = pa.Table.from_pandas(scaled, schema=base_schema,
                                   preserve_index=False)
        pq.write_table(out, f"{dst}/{name}.parquet")
        print(f"{name}: {len(df)} -> {len(scaled)} rows")
    return 0


if __name__ == "__main__":
    sys.exit(main())
