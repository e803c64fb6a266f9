"""Streaming surface tests: checkpointed file-stream ingest (exactly-once),
watermarked windowed aggregation, stateful sessionization."""

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from gcp_datalake_pipeline_spark.plans.queries import load_table
from gcp_datalake_pipeline_spark.streaming.events import (
    drain_available_now,
    hourly_event_counts,
    sessionize_stream,
)
from gcp_datalake_pipeline_spark.streaming.ingest import run_streaming_ingest

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture()
def tmpdir():
    d = tempfile.mkdtemp(prefix="engine_stream_")
    yield d
    shutil.rmtree(d, ignore_errors=True)


def test_streaming_ingest_exactly_once(catalog, tmpdir):
    landing = os.path.join(tmpdir, "landing")
    ckpt = os.path.join(tmpdir, "ckpt")
    os.makedirs(landing)
    shutil.copy("tests/fixtures/empresas_20251001.csv", landing)

    p1 = run_streaming_ingest(catalog, landing, ckpt)
    assert len(p1) == 1
    assert catalog.read("empresa").count() == 3
    # SCD2 history rides the same foreachBatch pipeline: one open version
    # per carrier after the first load.
    hist = catalog.read("empresa_history")
    assert hist.count() == 3 and all(r["is_current"] for r in hist.collect())

    # Re-run with no new files: checkpoint prevents reprocessing.
    p2 = run_streaming_ingest(catalog, landing, ckpt)
    assert p2 == []

    # Drop the dependent files; only they get processed, in order.
    shutil.copy("tests/fixtures/conductores_20251001.csv", landing)
    shutil.copy("tests/fixtures/vehiculos_20251001.csv", landing)
    p3 = run_streaming_ingest(catalog, landing, ckpt)
    assert [os.path.basename(p) for p in p3] == [
        "vehiculos_20251001.csv",
        "conductores_20251001.csv",
    ]
    assert catalog.read("conductor").count() == 4
    assert catalog.read("vehiculo").count() == 3


def test_hourly_event_counts_stream_matches_batch(spark, tmpdir):
    events = load_table(spark, SF_DIR, "events").select(
        "event_id", "ts", "user_id", "event_type", "value"
    )
    batch = {
        (r["hour_start"], r["event_type"]): (r["n_events"], r["total_value"])
        for r in hourly_event_counts(events).collect()
    }

    src_dir = os.path.join(tmpdir, "events_src")
    events.write.parquet(src_dir)
    stream = spark.readStream.schema(events.schema).parquet(src_dir)
    q = (
        hourly_event_counts(stream)
        .writeStream.format("memory")
        .queryName("hourly_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt"))
        .start()
    )
    q.awaitTermination()
    # append mode emits only watermark-closed windows; every emitted window
    # must match the batch result exactly
    emitted = spark.sql("select * from hourly_test").collect()
    assert len(emitted) > 0
    for r in emitted:
        key = (r["hour_start"], r["event_type"])
        assert batch[key] == (r["n_events"], r["total_value"])


def test_sessionize_stream_matches_batch_session_count(spark, tmpdir):
    """Stateful sessionization over an availableNow stream; closed sessions
    must agree with the batch gap-based definition (user_sessions query)."""
    events = load_table(spark, SF_DIR, "events").select("user_id", "ts", "ts_ns")

    src_dir = os.path.join(tmpdir, "events_src")
    events.select("user_id", "ts").write.parquet(src_dir)
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src_dir)
    q = (
        sessionize_stream(stream, timeout_ms=1000)
        .writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(tmpdir, "ckpt"))
        .start()
    )
    # drain_available_now watches the state store and stops the query once
    # every session (including tails) has flushed via the 1 s timeout.
    assert drain_available_now(q, poll_s=1.0, max_wait_s=240.0)
    streamed = spark.sql(
        "select user_id, count(*) closed from sessions_test group by user_id"
    ).collect()

    # batch truth: sessions per user (closed + the open tail one)
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts_ns")
    prev = F.lag("ts_ns").over(w)
    batch = {
        r["user_id"]: r["n"]
        for r in events.withColumn(
            "new_s",
            F.when(prev.isNull() | (F.col("ts_ns") - prev > 1800 * 10**9), 1).otherwise(0),
        )
        .groupBy("user_id")
        .agg(F.sum("new_s").alias("n"))
        .collect()
    }
    assert len(streamed) > 0
    # a full drain means EVERY session flushed, tails included
    assert {r["user_id"]: r["closed"] for r in streamed} == batch


def test_dedup_stream_matches_batch_distinct(spark, tmpdir):
    """Streaming dedup (watermark-bounded state) must surface each
    (user_id, event_type) key exactly once — same key set as batch
    dropDuplicates."""
    from gcp_datalake_pipeline_spark.streaming.events import dedup_stream

    events = load_table(spark, SF_DIR, "events").select(
        "user_id", "event_type", "ts"
    )
    src = os.path.join(tmpdir, "dd_src")
    events.write.parquet(src)
    stream = spark.readStream.schema(
        "user_id long, event_type string, ts timestamp"
    ).parquet(src)
    q = (
        dedup_stream(stream, ["user_id", "event_type"])
        .writeStream.format("memory")
        .queryName("dedup_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(tmpdir, "dd_ckpt"))
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["event_type"])
        for r in spark.sql("select user_id, event_type from dedup_test").collect()
    }
    want = {
        (r["user_id"], r["event_type"])
        for r in dedup_stream(events, ["user_id", "event_type"]).collect()
    }
    assert got == want
    n = spark.sql("select count(*) c from dedup_test").first()["c"]
    assert n == len(want)  # exactly once per key


def test_correlate_streams_within_matches_batch(spark, tmpdir):
    """Stream-stream interval join (clicks x errors within 60 s per user,
    watermark-bounded state) must produce exactly the batch pair set."""
    from gcp_datalake_pipeline_spark.streaming.events import (
        correlate_streams_within,
    )

    events = load_table(spark, SF_DIR, "events").select(
        "event_id", "user_id", "event_type", "ts"
    )
    clicks = events.filter("event_type = 'click'")
    errors = events.filter("event_type = 'error'")
    want = {
        (r["event_id"], r["event_id_r"])
        for r in correlate_streams_within(
            clicks, errors, "user_id", tolerance_s=86400, watermark="2 days"
        ).collect()
    }

    cdir, edir = os.path.join(tmpdir, "c"), os.path.join(tmpdir, "e")
    clicks.write.parquet(cdir)
    errors.write.parquet(edir)
    schema = "event_id long, user_id long, event_type string, ts timestamp"
    cs = spark.readStream.schema(schema).parquet(cdir)
    es = spark.readStream.schema(schema).parquet(edir)
    q = (
        correlate_streams_within(
            cs, es, "user_id", tolerance_s=86400, watermark="2 days"
        )
        .select("event_id", "event_id_r")
        .writeStream.format("memory")
        .queryName("corr_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .option("checkpointLocation", os.path.join(tmpdir, "corr_ckpt"))
        .start()
    )
    q.awaitTermination(180)
    got = {
        (r["event_id"], r["event_id_r"])
        for r in spark.sql("select * from corr_test").collect()
    }
    assert len(want) > 0
    assert got == want
