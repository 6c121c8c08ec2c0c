"""Query path: BM25 top-k.

The reference delegates querying to ElasticSearch (match query construction in
Endpoints/ESIndexDocType.cs:193-202; analysis + BM25 + top-k run inside ES).
Here the exhaustive DataFrame path *is* the rank oracle: tokenize the query
with the same analyzer as indexing, join query terms against the tf table,
compute BM25 (k1=1.2, b=0.75) in float64 SQL expressions, and take
``orderBy(score DESC, doc_id ASC).limit(k)`` — Catalyst plans this as
TakeOrderedAndProject (no full sort materialization).

The compressed/block-max WAND path (importpipeline_spark.index.wand) must be
rank-identical to this.
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..text.tokenizer import tokenize_scalar
from .build import K1, B, LogicalIndex, bm25_contrib_expr, idf_expr


def analyze_query(query: str) -> List[str]:
    """Query text → unique terms, analyzer spec v1 (same path as indexing)."""
    toks = tokenize_scalar(query) or []
    seen, out = set(), []
    for t in toks:
        if t not in seen:
            seen.add(t)
            out.append(t)
    return out


def bm25_topk_exhaustive(
    spark: SparkSession,
    index: LogicalIndex,
    query: str,
    k: int = 10,
    k1: float = K1,
    b: float = B,
) -> DataFrame:
    """Exhaustive BM25 top-k over the logical index. Returns
    (doc_id, score) ordered by (score DESC, doc_id ASC), ≤ k rows.

    Plan shape: broadcast the (tiny) query-term×idf table into the tf scan,
    join doclen, aggregate per doc, TakeOrderedAndProject — one shuffle on
    doc_id for the final aggregate (tf is already keyed by doc_id if persisted
    from the build, so AQE usually removes the exchange).
    """
    terms = analyze_query(query)
    n = index.stats["n_docs"]
    avgdl = index.stats["avgdl"] or 1.0
    if not terms or n == 0:
        return spark.createDataFrame([], "doc_id long, score double")

    qterms = spark.createDataFrame([(t,) for t in terms], "term string")
    # dictionary lookup: df per query term (broadcast both ways — tiny)
    qdf = F.broadcast(
        index.term_df.join(F.broadcast(qterms), "term", "inner").withColumn(
            "idf", idf_expr(F.col("df").cast("double"), n)
        )
    )
    contrib = (
        index.tf.join(qdf, "term", "inner")
        .join(index.doclen, "doc_id", "inner")
        .withColumn(
            "contrib",
            bm25_contrib_expr(F.col("tf"), F.col("doc_len"), F.col("idf"), avgdl, k1, b),
        )
    )
    return (
        contrib.groupBy("doc_id")
        .agg(F.sum("contrib").alias("score"))
        .orderBy(F.col("score").desc(), F.col("doc_id").asc())
        .limit(k)
    )


def bm25_topk_batch(
    spark: SparkSession,
    index: LogicalIndex,
    queries: List[tuple],
    k: int = 10,
) -> DataFrame:
    """Batch variant: queries = [(query_id, query_string)]. One job for the
    whole query set — query terms become a broadcast table keyed by query_id,
    per-query top-k via window rank (scales to large query workloads)."""
    from pyspark.sql.window import Window

    n = index.stats["n_docs"]
    avgdl = index.stats["avgdl"] or 1.0
    rows = []
    for qid, q in queries:
        for t in analyze_query(q):
            rows.append((qid, t))
    if not rows or n == 0:
        return spark.createDataFrame([], "query_id int, doc_id long, score double, rank int")
    qterms = spark.createDataFrame(rows, "query_id int, term string")
    qdf = F.broadcast(
        index.term_df.join(F.broadcast(qterms), "term", "inner").withColumn(
            "idf", idf_expr(F.col("df").cast("double"), n)
        )
    )
    contrib = (
        index.tf.join(qdf, "term", "inner")
        .join(index.doclen, "doc_id", "inner")
        .withColumn(
            "contrib",
            bm25_contrib_expr(F.col("tf"), F.col("doc_len"), F.col("idf"), avgdl, K1, B),
        )
    )
    scored = contrib.groupBy("query_id", "doc_id").agg(F.sum("contrib").alias("score"))
    w = Window.partitionBy("query_id").orderBy(F.col("score").desc(), F.col("doc_id").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "doc_id", "score", "rank")
    )
