"""Stateful streaming sessionization (applyInPandasWithState) must
agree with the batch window-function implementation."""

import pyspark.sql.functions as F

from swift_readability_spark.pipeline.sessionize import (
    sessionize_batch,
    sessionize_stream,
)


def test_stream_sessions_match_batch(spark, tmp_path_factory):
    out = tmp_path_factory.mktemp("sess")
    events = (
        spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        .filter(F.col("user_id") < 20)
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    src = str(out / "src")
    events.repartition(2).write.mode("overwrite").parquet(src)

    stream = spark.readStream.schema(events.schema).format("parquet").load(src)
    query = (
        sessionize_stream(stream)
        .writeStream.format("memory")
        .queryName("sessions_out")
        .option("checkpointLocation", str(out / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    streamed = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in spark.sql("SELECT * FROM sessions_out").collect()
    }

    batch_rows = sessionize_batch(events).collect()
    batch = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r in batch_rows
    }
    # append mode emits only CLOSED sessions; each user's final session
    # stays open in state, so streamed == batch minus last-per-user
    last_per_user = {}
    for r in batch_rows:
        cur = last_per_user.get(r["user_id"])
        if cur is None or r["session_start"] > cur[1]:
            last_per_user[r["user_id"]] = (r, r["session_start"])
    open_sessions = {
        (r["user_id"], r["session_start"], r["session_end"], r["n_events"])
        for r, _ in last_per_user.values()
    }
    assert streamed == batch - open_sessions
    assert len(streamed) > 0
