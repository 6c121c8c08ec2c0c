"""applyInPandasWithState sessionization (custom stateful streaming op)."""

from pyspark.sql import functions as F

from importpipeline_spark.streaming.stateful import host_sessions_stream
from importpipeline_spark.index.pagesgen import PAGES_SCHEMA


def test_host_sessionization(spark, tmp_path):
    inp = str(tmp_path / "in")
    rows = [
        # host A: two sessions separated by > GAP (1800s)
        ("https://a.example/1", "2024-01-01 00:00:00"),
        ("https://a.example/2", "2024-01-01 00:10:00"),
        ("https://a.example/3", "2024-01-01 02:00:00"),
        # host B: one session
        ("https://b.example/1", "2024-01-01 00:00:00"),
        ("https://b.example/2", "2024-01-01 00:05:00"),
    ]
    df = spark.createDataFrame(rows, "url string, ts string").select(
        "url",
        F.to_timestamp("ts").alias("warc_ts"),
        F.lit(b"").alias("html"),
        F.lit("x").alias("text"),
        F.lit("en").alias("lang"),
    )
    df.write.parquet(inp)

    stream = (
        spark.readStream.schema(PAGES_SCHEMA)
        .parquet(inp)
        .select("url", "warc_ts")
    )
    sessions = host_sessions_stream(stream)
    q = (
        sessions.writeStream.format("memory")
        .queryName("sessions")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    # processing-time timeouts keep the query alive beyond the available
    # data (it waits to fire them), so await with a bound and stop
    import time

    deadline = time.time() + 90
    while time.time() < deadline:
        if spark.sql("select * from sessions").count() > 0:
            break
        time.sleep(1)
    q.stop()
    got = spark.sql("select * from sessions").collect()
    # closed sessions emitted mid-stream: host A's first session (the second
    # stays open in state until timeout; availableNow ends before that)
    by_host = {}
    for r in got:
        by_host.setdefault(r.host, []).append(r)
    assert "a.example" in by_host
    a0 = by_host["a.example"][0]
    assert a0.n_pages == 2
    assert a0.session_start.minute == 0 and a0.session_end.minute == 10
