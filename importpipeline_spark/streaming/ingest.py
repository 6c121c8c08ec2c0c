"""Structured Streaming ingestion.

The reference has no true streaming (bounded batch iteration over files —
SURVEY.md §2.12); its incremental import = last-run-date file filtering +
per-record existence checks. Here the same flow is expressed as a Structured
Streaming job: a file-source stream of page batches → the identical Arrow
extraction/tokenization UDFs → checkpointed append sink. The checkpoint gives
exactly-once file processing — the streaming-native version of the
RunAdministration last-OK-run bookkeeping
(/root/reference/ImportPipeline/RunAdministration/RunAdministrations.cs:276-280).

``Trigger.AvailableNow`` turns the same query into a resumable batch job —
run it on a schedule and it processes exactly the new files since the last
checkpoint, mirroring the reference's incremental import entry point
(SURVEY.md §3.2).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..html.udfs import html_to_text_udf
from ..index.pagesgen import PAGES_SCHEMA
from ..text.tokenizer import tokenize_udf


def stream_pages(spark: SparkSession, input_path: str) -> DataFrame:
    """File-source stream of pages parquet batches (new files only)."""
    return (
        spark.readStream.schema(PAGES_SCHEMA)
        .option("maxFilesPerTrigger", 16)
        .parquet(input_path)
    )


def stream_docs(pages_stream: DataFrame, doc_id_mode: str = "hash") -> DataFrame:
    """Streaming extraction: the same Arrow UDFs as the batch build.
    ``doc_id_mode`` must match the target index's recorded mode
    (stats.json ``doc_id_mode``) — mixing id schemes in one store indexes
    the same url under two ids."""
    from ..index.build import doc_id_expr

    return (
        pages_stream.withColumn("text", html_to_text_udf(F.col("html")))
        .withColumn("doc_id", doc_id_expr(doc_id_mode))
        .withColumn("tokens", tokenize_udf(F.col("text")))
        .withColumn(
            "doc_len",
            F.when(F.col("tokens").isNull(), F.lit(0))
            .otherwise(F.size("tokens"))
            .cast("int"),
        )
        .select("doc_id", "url", "warc_ts", "text", "doc_len", "lang")
    )


def run_ingest_available_now(
    spark: SparkSession, input_path: str, output_path: str, checkpoint: str
) -> None:
    """Process all files not yet seen by the checkpoint, then stop
    (exactly-once incremental batch)."""
    docs = stream_docs(stream_pages(spark, input_path))
    q = (
        docs.writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def windowed_lang_counts(
    pages_stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours"
) -> DataFrame:
    """Watermarked windowed aggregation over crawl time — late pages beyond
    the watermark are dropped deterministically."""
    return (
        pages_stream.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window).alias("w"), "lang")
        .agg(F.count(F.lit(1)).alias("n_pages"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "lang",
            "n_pages",
        )
    )


def streaming_dedup(
    docs_stream: DataFrame,
    text_col: str = "text",
    watermark: str | None = None,
    ts_col: str = "warc_ts",
) -> DataFrame:
    """Streaming exact content dedup: the FIRST arrival of each content
    digest passes, later duplicates are dropped — across micro-batches and
    (via the checkpoint) across restarts. This is the crawl-frontier shape
    of dedup_exact: the batch op dedups a corpus at rest, this one dedups
    the corpus as it arrives, so downstream training-data sinks only ever
    see one copy.

    State sizing is the explicit dial: ``watermark=None`` keeps one digest
    (16 bytes + key overhead) per distinct document forever — exact global
    dedup, state linear in corpus size, the practical trade for a frontier
    that must never re-emit. A watermark switches to
    ``dropDuplicatesWithinWatermark``: state is bounded by the event-time
    horizon, and duplicates separated by more than the watermark may BOTH
    pass (re-crawl storms are caught; month-apart re-crawls are not — pair
    with the batch dedup sweep for those).
    """
    d = docs_stream.withColumn("digest", F.md5(F.col(text_col)))
    if watermark is None:
        return d.dropDuplicates(["digest"])
    return d.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(
        ["digest"]
    )


def run_streaming_dedup(
    spark: SparkSession,
    input_path: str,
    output_path: str,
    checkpoint: str,
    watermark: str | None = None,
) -> None:
    """Extract + streaming-dedup newly-arrived page files into a parquet
    sink (exactly-once via the checkpoint; AvailableNow → scheduled
    catch-up job)."""
    docs = stream_docs(stream_pages(spark, input_path))
    q = (
        streaming_dedup(docs, watermark=watermark)
        .writeStream.format("parquet")
        .option("path", output_path)
        .option("checkpointLocation", checkpoint)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def run_streaming_index_maintenance(
    spark: SparkSession,
    input_path: str,
    index_root: str,
    checkpoint: str,
) -> None:
    """Streaming index maintenance: every micro-batch of newly-arrived page
    files is applied to the physical index through the incremental update
    path (foreachBatch → segments.update_index).

    Layered exactly-once: the stream checkpoint guarantees each FILE is
    consumed once, and update_index's ExistState classification makes any
    re-delivered PAGE idempotent (ExistSame is skipped), so a crash between
    the sink and the checkpoint commit cannot corrupt the index — the batch
    is simply re-applied. ``Trigger.AvailableNow`` makes the same query a
    scheduled catch-up job; a continuous trigger makes it a live maintainer.
    The index must exist (write_index/build_index_resumable over the initial
    corpus) before maintenance starts.
    """
    from ..index.segments import update_index

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        update_index(
            spark, index_root, batch_df,
            run_id=f"stream-{batch_id}", input_snapshot=f"batch-{batch_id}",
        )

    q = (
        stream_pages(spark, input_path)
        .writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
