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


def test_windowed_stream_matches_batch_twin(spark):
    """Watermarked event-time window (real stateful streaming agg):
    complete mode equals the batch twin exactly; append mode emits
    exactly the windows finalized by the final watermark."""
    from swift_readability_spark.operators.relational import events_windowed_counts
    from swift_readability_spark.pipeline.streaming import run_windowed_stream

    sf = "/root/testdata/sf0.001"
    batch = {
        (r["window_start"], r["window_end"], r["event_type"]): (
            r["n_events"],
            r["total_value"],
        )
        for r in events_windowed_counts(spark, sf).collect()
    }

    complete = {
        (r["window_start"], r["window_end"], r["event_type"]): (
            r["n_events"],
            r["total_value"],
        )
        for r in run_windowed_stream(
            spark,
            sf + "/events.parquet",
            query_name="win_complete",
            output_mode="complete",
        ).collect()
    }
    assert complete == batch

    appended = {
        (r["window_start"], r["window_end"], r["event_type"]): (
            r["n_events"],
            r["total_value"],
        )
        for r in run_windowed_stream(
            spark,
            sf + "/events.parquet",
            query_name="win_append",
            output_mode="append",
        ).collect()
    }
    # append mode: a window is emitted iff the final watermark
    # (max ts - 2h) passed its end; everything emitted matches batch
    assert appended
    assert set(appended) < set(batch)  # the open tail is withheld
    for k, v in appended.items():
        assert batch[k] == v
    max_ts = max(ws for ws, _we, _t in batch)
    assert all(we <= max_ts for _ws, we, _t in appended)


def test_stream_checkpoint_resume_no_duplicates(spark, corpus_dir, tmp_path_factory):
    """Restart-resume: a second AvailableNow run over the SAME
    checkpoint processes only files that arrived since the first run —
    no document is extracted twice (the file-source offsets live in
    the checkpoint; lineage double-bookkeeping stays idempotent)."""
    out = tmp_path_factory.mktemp("ckpt")
    src = str(out / "src")
    cp = str(out / "checkpoint")
    docs = spark.read.parquet(corpus_dir + "/documents.parquet").filter(
        F.col("doc_id").startswith("syn-")
    )
    first = docs.limit(8)
    first.coalesce(1).write.mode("append").parquet(src)

    run_extraction_stream(
        spark, src, str(out / "ext"), str(out / "lin"),
        checkpoint_path=cp, run_id="ck",
    )
    n_first = spark.read.parquet(str(out / "ext")).count()
    assert n_first == 8

    # more files arrive; restart with the SAME checkpoint
    rest = docs.join(first.select("doc_id"), "doc_id", "left_anti")
    rest.coalesce(1).write.mode("append").parquet(src)
    run_extraction_stream(
        spark, src, str(out / "ext"), str(out / "lin"),
        checkpoint_path=cp, run_id="ck",
    )
    final = spark.read.parquet(str(out / "ext"))
    assert final.count() == docs.count()  # nothing reprocessed
    assert final.select("doc_id").distinct().count() == docs.count()


def test_dedup_stream_matches_batch_twin(spark, tmp_path_factory):
    """dropDuplicatesWithinWatermark over the replayed feed keeps
    exactly one delivery per event_id — the surviving rows equal the
    events_dedup_replayed batch twin (minus its delivery count)."""
    from swift_readability_spark.operators.relational import (
        events_dedup_replayed,
    )
    from swift_readability_spark.pipeline.streaming import run_dedup_stream

    sf = "/root/testdata/sf0.001"
    out = tmp_path_factory.mktemp("dedupstream")
    e = spark.read.parquet(sf + "/events.parquet")
    replayed = e.unionByName(e.filter(F.col("event_id") % 10 == 0))
    src = str(out / "src")
    replayed.repartition(4).write.mode("overwrite").parquet(src)

    streamed = run_dedup_stream(spark, src, query_name="dedup_events_t")
    batch = events_dedup_replayed(spark, sf)

    assert streamed.count() == batch.count() == e.count()
    # exact row equivalence on the shared columns
    cols = ["event_id", "ts", "user_id", "event_type", "value"]
    s_rows = sorted(map(tuple, streamed.select(*cols).collect()))
    b_rows = sorted(map(tuple, batch.select(*cols).collect()))
    assert s_rows == b_rows
    # the planted redeliveries really were duplicates
    dup = batch.filter(F.col("n_deliveries") == 2).count()
    assert dup == e.filter(F.col("event_id") % 10 == 0).count() > 0
