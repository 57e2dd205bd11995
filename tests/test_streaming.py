"""Structured Streaming extraction: Trigger.AvailableNow drains the
input directory in micro-batches and matches the batch job's results."""

import pyspark.sql.functions as F

from swift_readability_spark.pipeline.streaming import run_extraction_stream


def test_stream_matches_batch(spark, corpus_dir, tmp_path_factory):
    out = tmp_path_factory.mktemp("stream")
    docs = spark.read.parquet(corpus_dir + "/documents.parquet").filter(
        F.col("doc_id").startswith("syn-")
    )
    n = docs.count()
    # stream source must be a directory of files
    src = str(out / "src")
    docs.repartition(4).write.mode("overwrite").parquet(src)

    run_extraction_stream(
        spark,
        src,
        str(out / "extracted"),
        str(out / "lineage"),
        n_partitions=4,
        checkpoint_path=str(out / "ckpt"),
    )
    extracted = spark.read.parquet(str(out / "extracted"))
    assert extracted.count() == n
    assert extracted.filter(F.col("error").isNotNull()).count() == 0
    lineage = spark.read.parquet(str(out / "lineage"))
    assert lineage.agg(F.sum("doc_count")).collect()[0][0] == n

    # restart with AvailableNow over the same checkpoint: no re-processing
    run_extraction_stream(
        spark,
        src,
        str(out / "extracted"),
        str(out / "lineage"),
        n_partitions=4,
        checkpoint_path=str(out / "ckpt"),
    )
    assert spark.read.parquet(str(out / "extracted")).count() == n


def test_rate_limited_microbatches(spark, corpus_dir, tmp_path_factory):
    """maxFilesPerTrigger bounds each micro-batch; the drain still
    covers everything exactly once."""
    out = tmp_path_factory.mktemp("ratelim")
    docs = spark.read.parquet(corpus_dir + "/documents.parquet").filter(
        F.col("doc_id").startswith("syn-")
    )
    n = docs.count()
    src = str(out / "src")
    docs.repartition(4).write.mode("overwrite").parquet(src)

    run_extraction_stream(
        spark,
        src,
        str(out / "extracted"),
        str(out / "lineage"),
        n_partitions=4,
        checkpoint_path=str(out / "ckpt"),
        max_files_per_trigger=1,
    )
    extracted = spark.read.parquet(str(out / "extracted"))
    assert extracted.count() == n
    assert extracted.select("doc_id").distinct().count() == n
    # one run_id per micro-batch: at least 4 (one per file)
    assert extracted.select("run_id").distinct().count() >= 4
