#!/usr/bin/env python3
"""Run EVERY registry query against a skew-augmented corpus and report
wall time — the sweep that found the O(n^2) Slice.eval landmine.

The corpus is sf0.001 with `documents` replaced by a stressed table:
the original 500 docs + 10 mega-docs (50k words each, ~100x median)
+ a corpus-wide hot boilerplate chunk on 25% of docs.  Other tables
are symlinked unchanged.  No oracle comparison here (the corpus is
synthetic-stressed); the check is completion + wall time + row sanity.

Usage: python scripts/skew_soak.py [--base /root/testdata/sf0.001]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

SLOW_S = 60.0  # flag anything slower than this


def build_skew_dir(spark, base: str) -> str:
    out = tempfile.mkdtemp(prefix="skew_soak_")
    for t in "region nation customer supplier part orders lineitem events embeddings".split():
        src = f"{base}/{t}.parquet"
        if os.path.exists(src):
            os.symlink(src, f"{out}/{t}.parquet")
    docs = spark.read.parquet(f"{base}/documents.parquet")
    boiler = " all rights reserved contact the site admin for removal requests"
    from pyspark.sql import functions as F

    stressed = docs.withColumn(
        "text",
        F.when(F.col("doc_id") % 4 == 0, F.concat("text", F.lit(boiler))).otherwise(
            F.col("text")
        ),
    )
    mega_text = " ".join(f"megaword{j}" for j in range(50_000))
    mega = spark.createDataFrame(
        [(1_000_000 + i, mega_text + f" unique tail {i}", "en", "synthetic",
          len(mega_text)) for i in range(10)],
        schema=docs.schema,
    )
    stressed.unionByName(mega).coalesce(4).write.parquet(f"{out}/documents.parquet")
    return out


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", default="/root/testdata/sf0.001")
    ap.add_argument("--only", nargs="*")
    args = ap.parse_args()

    from swift_readability_spark.operators import registry
    from swift_readability_spark.pipeline.session import build_session

    spark = build_session(
        app_name="skew-soak", master="local[8]", shuffle_partitions=8
    )
    sf_dir = build_skew_dir(spark, args.base)
    print(f"skew corpus at {sf_dir}", flush=True)

    reg = registry()
    names = args.only or list(reg)
    slow, failed = [], []
    for name in names:
        builder, _oracle = reg[name]
        try:
            df = builder(spark, sf_dir)
            # noop sink: forces FULL materialization of every column.
            # A plain count() lets Catalyst prune expensive output
            # expressions — which is exactly how the Slice.eval
            # quadratic stayed invisible.  Only the noop write is
            # timed; the row-sanity count runs outside the clock (it
            # is a second, pruned execution).
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            n = df.count()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: {str(e)[:160]}", flush=True)
            failed.append(name)
            continue
        mark = " <-- SLOW" if dt > SLOW_S else ""
        print(f"{name:36s} {dt:7.2f}s  {n} rows{mark}", flush=True)
        if dt > SLOW_S:
            slow.append((name, dt))
    print(f"\n{len(names) - len(failed)}/{len(names)} completed; "
          f"slow(>{SLOW_S:.0f}s): {slow or 'none'}; failed: {failed or 'none'}")
    sys.exit(1 if failed or slow else 0)


if __name__ == "__main__":
    main()
