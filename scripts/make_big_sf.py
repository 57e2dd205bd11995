#!/usr/bin/env python3
"""Deterministic 10x scale-up of an sf directory for LOCAL BENCHMARKING
ONLY (the driver generates its own large SF; this exists so optimization
A/Bs can run at driver-bench scale after the driver's sf1.0 directory was
cleaned up).  Never used by bench.py or any oracle.

Replication design (timing-representative, not statistically identical
to the driver's generator):

- key columns get a per-replica offset of ``replica * (max_key + 1)`` so
  every replica is a self-consistent copy of the relational graph (joins
  keep per-replica selectivity; group counts scale ~10x).
- ``documents.text`` is perturbed per replica at the WORD level (vowel
  substitution 'e' -> replica-specific vowel cluster) so replica texts
  share almost no shingles with each other — a suffix-only perturbation
  left replicas near-identical, which inflated LSH/near-dup candidate
  pairs ~45x per doc vs a real larger corpus.  n_chars is recomputed.
- ``embeddings.embedding`` is rotated per replica (coordinates rolled by
  ``replica`` positions) so cross-replica cosine looks random while
  norms and the overall geometry are preserved — a tiny nudge would have
  left replicas near-duplicate and exploded banded near-dup pairs.
- row-group sizing mirrors the driver's sf1.0 files (lineitem ~1M rows
  per group, orders ~750k, everything else one group) so scan-split
  behaviour matches what the driver bench would see.

Usage: python scripts/make_big_sf.py [--src /root/testdata/sf0.1]
       [--dst /root/bigdata/sf1.0x] [--factor 10]
"""

from __future__ import annotations

import argparse
import os
from pathlib import Path

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

KEY_COLS = {
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "customer": ["c_custkey"],
    "part": ["p_partkey"],
    "supplier": ["s_suppkey"],
    "documents": ["doc_id"],
    "events": ["event_id", "user_id"],
    "embeddings": ["vec_id"],
}

COPY_ONLY = {"nation", "region"}

ROW_GROUP_ROWS = {"lineitem": 1_000_000, "orders": 750_000}


def scale_table(src: Path, dst: Path, table: str, factor: int) -> None:
    t = pq.read_table(src / f"{table}.parquet")
    if table in COPY_ONLY:
        pq.write_table(t, dst / f"{table}.parquet")
        print(f"{table}: copied {t.num_rows} rows")
        return
    offsets = {}
    for k in KEY_COLS.get(table, []):
        offsets[k] = pc.max(t[k]).as_py() + 1
    replicas = []
    for r in range(factor):
        cols = {}
        for name in t.column_names:
            col = t[name]
            if name in offsets and r > 0:
                col = pc.add(col, pa.scalar(r * offsets[name], type=col.type))
                col = col.cast(t.schema.field(name).type)
            cols[name] = col
        if table == "documents" and r > 0:
            sub = ["a", "i", "o", "u", "y", "ae", "eo", "ei", "ea"][(r - 1) % 9]
            txt = pc.replace_substring(cols["text"].cast(pa.string()), "e", sub)
            txt = pc.binary_join_element_wise(txt, f" r{r}", "")
            cols["text"] = txt
            cols["n_chars"] = pc.utf8_length(txt).cast(pa.int64())
        if table == "embeddings" and r > 0:
            import numpy as np

            emb = cols["embedding"].combine_chunks()
            flat = emb.values.to_numpy(zero_copy_only=False).copy()
            dim = len(emb[0])
            mat = np.roll(flat.reshape(-1, dim), r, axis=1).ravel()
            cols["embedding"] = pa.ListArray.from_arrays(
                emb.offsets, pa.array(mat, type=pa.float32())
            ).cast(t.schema.field("embedding").type)
        replicas.append(pa.table(cols, schema=t.schema))
    big = pa.concat_tables(replicas)
    pq.write_table(
        big,
        dst / f"{table}.parquet",
        row_group_size=ROW_GROUP_ROWS.get(table, big.num_rows),
    )
    print(f"{table}: {t.num_rows} -> {big.num_rows} rows")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dst", default="/root/bigdata/sf1.0x")
    ap.add_argument("--factor", type=int, default=10)
    args = ap.parse_args()
    src, dst = Path(args.src), Path(args.dst)
    os.makedirs(dst, exist_ok=True)
    for table in sorted(p.stem for p in src.glob("*.parquet")):
        scale_table(src, dst, table, args.factor)
    (dst / "_DONE").touch()


if __name__ == "__main__":
    main()
