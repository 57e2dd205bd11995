#!/usr/bin/env python3
"""Capture .explain('formatted') for registry queries into plans/<tag>/.

Usage: python scripts/capture_plans.py --tag r07 --suffix before [query ...]
"""

from __future__ import annotations

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tag", default="r07")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("queries", nargs="*")
    args = ap.parse_args()

    from swift_readability_spark.operators import registry
    from swift_readability_spark.pipeline.session import build_session

    reg = registry()
    names = args.queries or list(reg)
    outdir = Path(__file__).resolve().parent.parent / "plans" / args.tag
    outdir.mkdir(parents=True, exist_ok=True)
    spark = build_session(app_name="capture-plans", shuffle_partitions=8)
    try:
        for name in names:
            builder, _ = reg[name]
            df = builder(spark, args.sf)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            (outdir / f"{name}_{args.suffix}.txt").write_text(plan)
            print(f"wrote {name}_{args.suffix}.txt")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
