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


def test_windowed_lang_counts_values_match_batch(spark, tmp_path):
    """Per-(window, lang) streaming counts must equal the batch groupBy over
    the same data — not just the grand total. Crawl times are spread over
    ~6 hours so the assertion covers MULTIPLE 1h windows (the generator's
    raw timestamps span only minutes — a single window would let wrong
    window-bucketing pass)."""
    inp = str(tmp_path / "in3")
    pages = gen_pages_df(spark, 80, seed=11, partitions=2).withColumn(
        "warc_ts",
        F.col("warc_ts")
        + (F.abs(F.xxhash64("url")) % 6).cast("int") * F.expr("INTERVAL 1 HOUR"),
    )
    pages.write.parquet(inp)
    agg = windowed_lang_counts(stream_pages(spark, inp), window="1 hour",
                               watermark="2 hours")
    q = (
        agg.writeStream.format("memory").queryName("winvals")
        .outputMode("complete").trigger(availableNow=True).start()
    )
    q.awaitTermination()
    got = {
        (r.window_start, r.window_end, r.lang): r.n_pages
        for r in spark.sql("select * from winvals").collect()
    }
    exp = {
        (r.w.start, r.w.end, r.lang): r.n
        for r in pages.groupBy(
            F.window("warc_ts", "1 hour").alias("w"), "lang"
        ).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert len({k[0] for k in exp}) >= 4, "fixture must span multiple windows"
    assert got == exp


def test_watermark_drops_late_rows(spark, tmp_path):
    """Append-mode watermark semantics across checkpointed runs: a second
    availableNow run whose rows are 25h older than the persisted watermark
    must emit nothing (late data dropped deterministically), while the first
    run emits exactly the batch-computable finalized windows."""
    inp = str(tmp_path / "late_in")
    outp = str(tmp_path / "late_out")
    ckpt = str(tmp_path / "late_ckpt")

    # spread crawl times over ~8 hours so several 1h windows finalize
    fresh = gen_pages_df(spark, 60, seed=3, partitions=1).withColumn(
        "warc_ts",
        F.col("warc_ts")
        + (F.abs(F.xxhash64("url")) % 8).cast("int")
        * F.expr("INTERVAL 1 HOUR"),
    )
    fresh.write.mode("append").parquet(inp)

    def run_once():
        agg = windowed_lang_counts(
            stream_pages(spark, inp), window="1 hour", watermark="1 hour"
        )
        q = (
            agg.writeStream.format("parquet")
            .option("path", outp)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        return spark.read.parquet(outp)

    r1 = run_once()
    hi = fresh.agg(F.max("warc_ts")).first()[0]
    emitted = {
        (r.window_start, r.window_end, r.lang): r.n_pages for r in r1.collect()
    }
    # append mode finalizes exactly the windows ending at or before
    # watermark = max event time - 1h; values match the batch groupBy
    batch = {
        (r.w.start, r.w.end, r.lang): r.n
        for r in fresh.groupBy(F.window("warc_ts", "1 hour").alias("w"), "lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    import datetime

    expected = {
        k: v for k, v in batch.items()
        if k[1] <= hi - datetime.timedelta(hours=1)
    }
    assert emitted == expected
    assert len(emitted) > 0

    # batch 2: rows 25h older than everything seen -> beyond the persisted
    # watermark -> dropped; the output must not change
    fresh.limit(10).withColumn(
        "warc_ts", F.col("warc_ts") - F.expr("INTERVAL 25 HOURS")
    ).write.mode("append").parquet(inp)
    r2 = run_once()
    assert r2.count() == r1.count()


def test_streaming_index_maintenance(spark, tmp_path):
    """foreachBatch → update_index keeps the physical index rank-identical
    to a full rebuild over everything that has arrived; the checkpoint makes
    a second run with no new files a no-op."""
    from importpipeline_spark.index.store import open_index, write_index
    from importpipeline_spark.index.wand import bm25_topk_wand
    from importpipeline_spark.streaming.ingest import (
        run_streaming_index_maintenance,
    )

    inp = str(tmp_path / "arrivals")
    root = str(tmp_path / "idx")
    ckpt = str(tmp_path / "ckpt")

    initial = gen_pages_df(spark, 200, seed=42, partitions=4)
    write_index(spark, initial, root, n_shards=4)

    # arrival 1: 50 new urls land as stream files
    gen_pages_df(spark, 250, seed=42, partitions=4).exceptAll(initial).write.mode(
        "append"
    ).parquet(inp)
    run_streaming_index_maintenance(spark, inp, root, ckpt)
    assert open_index(root).stats["n_docs"] == 250

    # arrival 2: 30 more
    gen_pages_df(spark, 280, seed=42, partitions=4).exceptAll(
        gen_pages_df(spark, 250, seed=42, partitions=4)
    ).write.mode("append").parquet(inp)
    run_streaming_index_maintenance(spark, inp, root, ckpt)
    pidx = open_index(root)
    assert pidx.stats["n_docs"] == 280

    # rank-identical to a batch build over the full corpus
    full_root = str(tmp_path / "full")
    pidx_full = write_index(
        spark, gen_pages_df(spark, 280, seed=42, partitions=4), full_root,
        n_shards=4,
    )
    for q in ("the", "of and", "ebakaba8"):
        a = bm25_topk_wand(spark, pidx, q, k=10).collect()
        b = bm25_topk_wand(spark, pidx_full, q, k=10).collect()
        assert [(r.doc_id, r.score) for r in a] == [
            (r.doc_id, r.score) for r in b
        ], q

    # no new files → checkpoint skips everything, stats unchanged
    run_streaming_index_maintenance(spark, inp, root, ckpt)
    assert open_index(root).stats["n_docs"] == 280


def test_streaming_dedup_across_batches_and_restarts(spark, tmp_path):
    """Streaming exact dedup: the first arrival of each content digest
    passes; a duplicate arriving in a LATER run (new file, different url,
    same content) is dropped because the dedup state survives via the
    checkpoint."""
    from importpipeline_spark.streaming.ingest import run_streaming_dedup

    inp = str(tmp_path / "din")
    out = str(tmp_path / "dout")
    ckpt = str(tmp_path / "dckpt")

    base = gen_pages_df(spark, 30, seed=42, partitions=1)
    base.write.mode("append").parquet(inp)
    run_streaming_dedup(spark, inp, out, ckpt)
    first = spark.read.parquet(out)
    assert first.count() == 30
    assert first.select("digest").distinct().count() == 30

    # batch 2: 10 content-duplicates under NEW urls + 5 genuinely new docs
    dups = base.limit(10).withColumn(
        "url", F.concat(F.col("url"), F.lit("_mirror"))
    )
    fresh = gen_pages_df(spark, 35, seed=42, partitions=1).exceptAll(
        gen_pages_df(spark, 30, seed=42, partitions=1)
    )
    dups.unionByName(fresh).write.mode("append").parquet(inp)
    run_streaming_dedup(spark, inp, out, ckpt)
    second = spark.read.parquet(out)
    # only the 5 fresh docs got through; the 10 mirrors were deduped
    assert second.count() == 35
    assert second.select("digest").distinct().count() == 35
    assert second.where(F.col("url").endswith("_mirror")).count() == 0
