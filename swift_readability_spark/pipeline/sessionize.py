"""Custom stateful streaming operator: session windows via
``applyInPandasWithState``.

The reference has no streaming surface (SURVEY.md §2.10); this is the
corpus-level extension for event streams: per-user sessionization with
a gap timeout, state carried across micro-batches.  The same grouping
logic runs in batch mode (``sessionize_batch``) so tests can assert
stream == batch.
"""

from __future__ import annotations

import datetime as _dt

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

SESSION_GAP_MINUTES = 30

SESSION_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)
# STATE SCHEMA v2 (round 5): total_value DoubleType -> total_cents
# LongType.  applyInPandasWithState persists this struct inside the
# streaming checkpoint, so a long-lived job restarting from a
# checkpoint written by the v1 code would misread (or fail to decode)
# its saved state — DISCARD existing streaming checkpoints when
# upgrading across this boundary (ADVICE r05).  Bump _STATE_VERSION on
# any future field change and keep this note current.
_STATE_VERSION = 2
_STATE_SCHEMA = T.StructType(
    [
        T.StructField("session_start", T.DoubleType()),
        T.StructField("session_end", T.DoubleType()),
        T.StructField("n_events", T.LongType()),
        # exact integer cents — float accumulation in arrival order
        # would diverge from the batch twin's exact integer sum
        T.StructField("total_cents", T.LongType()),
    ]
)


def _sessionize_group(key, pdf_iter, state: GroupState):
    """Emit closed sessions; keep the open session in state.

    total_value accumulates EXACT integer cents (math.floor(v*100+0.5)
    — the same IEEE expression the batch twin and the DuckDB oracle
    evaluate), so stream == batch holds bit-for-bit regardless of
    accumulation order."""
    import math

    (user_id,) = key
    gap = SESSION_GAP_MINUTES * 60.0
    if state.exists:
        start, end, n, total_c = state.get
    else:
        start = end = None
        n, total_c = 0, 0
    closed = []
    for pdf in pdf_iter:
        pdf = pdf.sort_values("ts")
        for ts, value in zip(pdf["ts"], pdf["value"]):
            t = ts.timestamp()
            cents = int(math.floor(float(value) * 100.0 + 0.5))
            if start is None:
                start = end = t
                n, total_c = 1, cents
            elif t - end > gap:
                closed.append((start, end, n, total_c))
                start = end = t
                n, total_c = 1, cents
            else:
                end = t
                n += 1
                total_c += cents
    if start is not None:
        state.update((start, end, n, total_c))
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [_dt.datetime.utcfromtimestamp(c[0]) for c in closed],
                "session_end": [_dt.datetime.utcfromtimestamp(c[1]) for c in closed],
                "n_events": [c[2] for c in closed],
                "total_value": [c[3] / 100.0 for c in closed],
            }
        )


def sessionize_stream(events_stream: DataFrame) -> DataFrame:
    """Streaming sessionization (open sessions stay in state until the
    gap elapses on a later batch)."""
    from .session import ensure_package_on_workers

    ensure_package_on_workers(events_stream.sparkSession)
    return events_stream.groupBy("user_id").applyInPandasWithState(
        _sessionize_group,
        outputStructType=SESSION_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def sessionize_batch(events: DataFrame) -> DataFrame:
    """Batch-mode reference implementation: gap-based session ids via
    window functions (native Catalyst plan, no Python)."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("user_id").orderBy("ts")
    gap = SESSION_GAP_MINUTES * 60
    # ts may be TIMESTAMP_NTZ: go through LTZ (session tz = UTC) to
    # get epoch seconds, matching DuckDB's epoch()
    epoch = F.col("ts").cast("timestamp").cast("long")
    with_gap = events.withColumn(
        "_new_session",
        (
            epoch - F.lag(epoch, 1, -(10**12)).over(w) > gap
        ).cast("int"),
    ).withColumn("_session_id", F.sum("_new_session").over(w))
    return (
        with_gap.groupBy("user_id", "_session_id")
        .agg(
            F.min("ts").alias("session_start"),
            F.max("ts").alias("session_end"),
            F.count("*").alias("n_events"),
            # exact integer cents (operators/common.py discipline):
            # matches the streaming twin's integer accumulator and the
            # DuckDB oracle bit-for-bit on any partitioning
            F.expr(
                "CAST(sum(CAST(CAST(floor((value) * 100 + 0.5) AS BIGINT)"
                " AS DECIMAL(28,0))) AS DOUBLE) / 100.0"
            ).alias("total_value"),
        )
        .drop("_session_id")
    )
