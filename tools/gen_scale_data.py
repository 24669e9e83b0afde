"""Generate scale-test data: sfN = K x sf0.1, written to scratch.

The 100 TB design claims in this repo rest on plan audits at sf0.1;
this script produces a 10x (or Kx) corpus so the claims can be
MEASURED: per-query sf1/sf0.1 wall-clock ratios (see SCALE_r10.json).

Replication rules (deterministic, seed-fixed — no wall-clock or global
RNG):
- region/nation: dimension tables, copied verbatim.
- fact/dim tables with synthetic keys (customer, supplier, part,
  orders, lineitem, events): K replicas with every key column offset by
  replica * stride (stride = max(key)+1), so join fan-outs, group
  cardinalities, and key distributions scale linearly and referential
  integrity holds across replicas (an orders replica joins exactly its
  lineitem replica).
- documents: replica 0 verbatim; replicas r>0 word-shuffle each text
  with rng(seed=(r, doc_id)) — token/length distributions (and hence
  shingle counts, Gopher stats, tokenizer workloads) are preserved,
  but shingle SETS diverge, so the corpus keeps the sf0.1 property of
  being near-duplicate-free instead of making every document a 10-way
  exact dup (which would quadratically blow up every dedup operator
  and measure a different workload).
- embeddings: replica 0 verbatim; replicas r>0 perturbed with
  N(0, 0.05) noise from rng(seed=(r,)) — distinct vectors, same scale,
  near-dup-free like the source.

Timestamps ride through pyarrow untouched (the source tables store
TIMESTAMP(MICROS) — verified against the sf0.01 parquet footers;
pandas/pyarrow round-trips the physical type exactly), so the engine
reads the same physical type as /root/testdata.

Usage: python tools/gen_scale_data.py [K] [SRC] [DST]
       (defaults: 10 /root/testdata/sf0.1 /tmp/xgbspark_scale/sf1)
"""

from __future__ import annotations

import os
import sys

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

KEYS = {
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}
COPY = ["region", "nation"]
# key strides must be consistent ACROSS tables (o_custkey offsets must
# match c_custkey offsets), so they come from the key's home table
KEY_HOME = {
    "o_orderkey": ("orders", "o_orderkey"),
    "o_custkey": ("customer", "c_custkey"),
    "l_orderkey": ("orders", "o_orderkey"),
    "l_partkey": ("part", "p_partkey"),
    "l_suppkey": ("supplier", "s_suppkey"),
}


def _shuffle_words(text: str, rng: np.random.Generator) -> str:
    words = text.split(" ")
    rng.shuffle(words)
    return " ".join(words)


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    src = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    dst = sys.argv[3] if len(sys.argv) > 3 else "/tmp/xgbspark_scale/sf1"
    os.makedirs(dst, exist_ok=True)

    tables = {t: pq.read_table(f"{src}/{t}.parquet")
              for t in list(KEYS) + COPY}
    strides: dict[str, int] = {}
    for t, keys in KEYS.items():
        for c in keys:
            home_t, home_c = KEY_HOME.get(c, (t, c))
            strides[c] = int(pa.compute.max(
                tables[home_t][home_c]).as_py()) + 1

    for t in COPY:
        pq.write_table(tables[t], f"{dst}/{t}.parquet")
        print(f"{t}: copied {tables[t].num_rows} rows")

    for t, keys in KEYS.items():
        schema = tables[t].schema
        pdf = tables[t].to_pandas()
        reps = []
        for r in range(k):
            rep = pdf.copy(deep=False)
            for c in keys:
                rep[c] = pdf[c] + r * strides[c]
            if t == "documents" and r > 0:
                texts = [
                    _shuffle_words(tx, np.random.default_rng([r, did]))
                    for did, tx in zip(pdf["doc_id"], pdf["text"])
                ]
                rep["text"] = texts
                rep["n_chars"] = [len(tx) for tx in texts]
            if t == "embeddings" and r > 0:
                rng = np.random.default_rng([r])
                rep["embedding"] = [
                    (v + rng.standard_normal(len(v)) * 0.05).astype(
                        np.float32)
                    for v in pdf["embedding"]
                ]
            reps.append(rep)
        out = pd.concat(reps, ignore_index=True)
        pq.write_table(pa.Table.from_pandas(out, schema=schema,
                                            preserve_index=False),
                       f"{dst}/{t}.parquet")
        print(f"{t}: {len(pdf)} -> {len(out)} rows")


if __name__ == "__main__":
    main()
