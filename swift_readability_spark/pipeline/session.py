"""SparkSession builder tuned for the extraction workload.

Scale design (targets a 1000-executor cluster even though tests run on
local[N]):

- AQE on: post-shuffle coalescing + skew-join splitting re-plan the
  shuffles the corpus layer introduces.
- Arrow exchange on with a bounded records-per-batch so one Python
  batch never holds more than a few documents (mega-doc protection —
  a 100 MB document must not share a batch with 9 more).
- shuffle.partitions sized by caller (cores at local scale; thousands
  at cluster scale).
- parquet maxPartitionBytes left at 128 MB: scan tasks stay
  executor-memory-sized at any corpus size.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

# Records per Arrow batch crossing the JVM<->Python boundary.  Too
# small and per-batch round-trip overhead dominates (64 measured ~3x
# slower than 512 on the extraction stage); too large and a batch of
# big documents blows worker memory.  Re-tuned in round 2 after the
# core got ~1.5x faster per doc (transfer overhead became a larger
# share): 512 measured +7% over 256 at sf0.1/local[32], 1024 only +1%
# more.  512 x heavy-threshold (256 KiB) bounds a light-path batch at
# ~128 MiB (4 GiB across 32 workers worst-case); mega-docs are routed
# to their own partitions where a batch holds only a handful of rows.
ARROW_MAX_RECORDS_PER_BATCH = 512


def ensure_package_on_workers(spark: SparkSession) -> None:
    """Make ``swift_readability_spark`` importable in executor Python
    workers regardless of the driver's cwd/PYTHONPATH: zip the package
    once and ship it via addPyFile (the programmatic equivalent of
    ``spark-submit --py-files``).  Idempotent per session."""
    marker = "swift_readability_spark.workers_ready"
    try:
        if spark.conf.get(marker, None) == "1":
            return
    except Exception:  # noqa: BLE001
        pass
    import tempfile
    import zipfile
    from pathlib import Path

    pkg_dir = Path(__file__).resolve().parent.parent
    # rebuild per session (cheap, ~40 files): a cached zip would ship
    # stale code to workers after the package changes on disk
    fd, zip_name = tempfile.mkstemp(
        prefix="swift_readability_spark_pkg_", suffix=".zip"
    )
    import os

    os.close(fd)
    with zipfile.ZipFile(zip_name, "w") as zf:
        for py in sorted(pkg_dir.rglob("*.py")):
            zf.write(py, py.relative_to(pkg_dir.parent))
    spark.sparkContext.addPyFile(zip_name)
    spark.conf.set(marker, "1")


def build_session(
    app_name: str = "swift-readability-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    cores = os.cpu_count() or 8
    master = master or f"local[{cores}]"
    if shuffle_partitions is None:
        # at local scale: one shuffle partition per core; on a real
        # cluster, pass ~2-3x total executor cores instead
        n = master[master.find("[") + 1 : master.find("]")] if "[" in master else ""
        shuffle_partitions = cores if n in ("", "*") else int(n)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # floor on SCAN parallelism, sized from actual cluster
        # parallelism (shuffle_partitions == cores locally, executor
        # cores on a cluster): Spark derives the split size as
        # max(openCost, min(maxPartitionBytes, totalBytes/minPartitionNum)),
        # so a 26 MB single-file table splits across cores (row-group
        # granularity permitting) while a 100-TB scan still gets full
        # 128 MB splits — scale-adaptive, not a local constant
        # (guide §6: input split size).
        .config("spark.sql.files.minPartitionNum", str(shuffle_partitions))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config(
            "spark.sql.execution.arrow.maxRecordsPerBatch",
            str(ARROW_MAX_RECORDS_PER_BATCH),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
