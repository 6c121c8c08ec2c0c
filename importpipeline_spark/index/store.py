"""Physical index: build + persist the compressed posting store.

Layout (parquet; Iceberg-ready — the same frames can go to ``writeTo`` on a
cluster with an Iceberg catalog):

    <root>/docs/        doc_id, url, warc_ts, text, doc_len, lang
    <root>/doclen/      shard, doc_id, doc_len            (partitioned by shard)
    <root>/postings/    term, block_id, n, min_doc, max_doc, docs_enc,
                        tfs_enc, max_tf, max_score        (partitioned by shard,
                        sorted by term within files → row-group term pruning)
    <root>/terms/       term, df                          (the dictionary)
    <root>/stats.json   n_docs, avgdl, total_tokens, analyzer, k1, b, n_shards

Replaces the ES index + mapping template of the reference
(Endpoints/ESIndexDefinitions.cs:312-541). The "optimize to N segments" step
(ESIndexDefinitions.cs:452-458) maps to sortWithinPartitions + per-shard file
coalescing at write time.

Skew story: the build groups by (term, shard) — shard is a doc-range salt, so
a head term's postings are split across all shards and no single task sees
more than one shard of any term (two-level: per-shard encode here, shard-local
WAND + k-row global merge at query time). Shard count is the knob that holds
at 1000× data: shards scale with corpus size, per-shard group size stays
bounded by the doc-range width.
"""

from __future__ import annotations

import json
import os
from dataclasses import dataclass
from typing import Iterable

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..text.tokenizer import ANALYZER_VERSION
from .build import (
    K1,
    B,
    LogicalIndex,
    bm25_contrib_expr,
    build_logical_index,
    idf_expr,
    shard_of,
)
from .codec import BLOCK_SIZE, encode_blocks, to_u64

POSTINGS_SCHEMA = (
    "term string, shard int, block_id int, n int, min_doc long, max_doc long, "
    "docs_enc binary, tfs_enc binary, max_tf int, max_score double"
)


def _encode_group(key, pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map kernel: one (term, shard) posting list → block rows."""
    term, shard = key
    u = to_u64(pdf["doc_id"].to_numpy(dtype=np.int64))
    order = np.argsort(u, kind="stable")
    u = u[order]
    tfs = pdf["tf"].to_numpy(dtype=np.int64)[order]
    scores = pdf["contrib"].to_numpy(dtype=np.float64)[order]
    rows = encode_blocks(u, tfs, scores, BLOCK_SIZE)
    out = pd.DataFrame(
        rows,
        columns=[
            "block_id", "n", "min_doc", "max_doc",
            "docs_enc", "tfs_enc", "max_tf", "max_score",
        ],
    )
    out.insert(0, "shard", np.int32(shard))
    out.insert(0, "term", term)
    return out


def build_postings_df(index: LogicalIndex, n_shards: int) -> DataFrame:
    """tf ⋈ doclen ⋈ dictionary → per-(term,shard) encoded blocks.

    The BM25 contribution for block-max metadata is computed JVM-side
    (bm25_contrib_expr) before the grouped-map encode.
    """
    n = index.stats["n_docs"]
    avgdl = index.stats["avgdl"] or 1.0
    dict_df = index.term_df.withColumn(
        "idf", idf_expr(F.col("df").cast("double"), n)
    ).select("term", "idf")
    scored = (
        index.tf.join(index.doclen, "doc_id", "inner")
        .join(dict_df, "term", "inner")
        .withColumn(
            "contrib",
            bm25_contrib_expr(F.col("tf"), F.col("doc_len"), F.col("idf"), avgdl),
        )
        .withColumn("shard", shard_of(F.col("doc_id"), n_shards))
        .select("term", "shard", "doc_id", "tf", "contrib")
    )
    return scored.groupBy("term", "shard").applyInPandas(
        _encode_group, POSTINGS_SCHEMA
    )


@dataclass
class PhysicalIndex:
    root: str
    stats: dict

    @property
    def postings_path(self) -> str:
        return os.path.join(self.root, "postings")

    @property
    def doclen_path(self) -> str:
        return os.path.join(self.root, "doclen")

    @property
    def terms_path(self) -> str:
        return os.path.join(self.root, "terms")

    @property
    def docs_path(self) -> str:
        return os.path.join(self.root, "docs")


def write_index(
    spark: SparkSession,
    pages: DataFrame,
    root: str,
    n_shards: int = 16,
    write_docs: bool = True,
) -> PhysicalIndex:
    """Full build: pages → physical index at ``root``."""
    index = build_logical_index(pages, cache=True)
    postings = build_postings_df(index, n_shards)
    (
        postings.repartition(n_shards, "shard")
        .sortWithinPartitions("term", "block_id")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(os.path.join(root, "postings"))
    )
    (
        index.doclen.withColumn("shard", shard_of(F.col("doc_id"), n_shards))
        .repartition(n_shards, "shard")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(os.path.join(root, "doclen"))
    )
    index.term_df.write.mode("overwrite").parquet(os.path.join(root, "terms"))
    if write_docs:
        index.docs.drop("tokens").write.mode("overwrite").parquet(
            os.path.join(root, "docs")
        )
    stats = dict(
        index.stats,
        analyzer=ANALYZER_VERSION,
        k1=K1,
        b=B,
        n_shards=n_shards,
        block_size=BLOCK_SIZE,
    )
    os.makedirs(root, exist_ok=True)
    with open(os.path.join(root, "stats.json"), "w") as f:
        json.dump(stats, f)
    index.docs.unpersist()
    index.tf.unpersist()
    return PhysicalIndex(root=root, stats=stats)


def open_index(root: str) -> PhysicalIndex:
    with open(os.path.join(root, "stats.json")) as f:
        stats = json.load(f)
    return PhysicalIndex(root=root, stats=stats)
