"""Structured Streaming ingest: exactly-once incremental processing via
checkpoint (the streaming form of the reference's incremental import)."""

import os

from pyspark.sql import functions as F

from importpipeline_spark.index.pagesgen import gen_pages_df
from importpipeline_spark.streaming.ingest import (
    run_ingest_available_now,
    stream_pages,
    windowed_lang_counts,
)


def test_incremental_ingest_exactly_once(spark, tmp_path):
    inp = str(tmp_path / "in")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    gen_pages_df(spark, 100, seed=42, partitions=2).write.mode("append").parquet(inp)
    run_ingest_available_now(spark, inp, out, ckpt)
    first = spark.read.parquet(out)
    assert first.count() == 100
    assert first.select("doc_id").distinct().count() == 100

    # batch 2: rows 100..149 arrive as new files; rerun processes ONLY them
    gen_pages_df(spark, 150, seed=42, partitions=2).where(
        F.col("url") > ""
    ).exceptAll(gen_pages_df(spark, 100, seed=42, partitions=2)).write.mode(
        "append"
    ).parquet(inp)
    run_ingest_available_now(spark, inp, out, ckpt)
    second = spark.read.parquet(out)
    assert second.count() == 150
    assert second.select("doc_id").distinct().count() == 150
    # extraction output matches the batch path byte-for-byte
    golden = {
        r.url: r.text
        for r in gen_pages_df(spark, 150, seed=42, partitions=2)
        .select("url", "text")
        .collect()
    }
    for r in second.select("url", "text").collect():
        assert r.text == golden[r.url]


def test_windowed_lang_counts_schema(spark, tmp_path):
    inp = str(tmp_path / "in2")
    gen_pages_df(spark, 50, seed=42, partitions=1).write.parquet(inp)
    stream = stream_pages(spark, inp)
    agg = windowed_lang_counts(stream, window="1 hour", watermark="2 hours")
    assert agg.isStreaming
    q = (
        agg.writeStream.format("memory")
        .queryName("wincounts")
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    rows = spark.sql("select * from wincounts").collect()
    assert sum(r.n_pages for r in rows) == 50
    assert {c for c in agg.columns} == {"window_start", "window_end", "lang", "n_pages"}
