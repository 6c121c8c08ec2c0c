#!/usr/bin/env python
"""Extra benchmarks: per-stage isolation of the hot paths (guide §1.4 noop
sink), used to attribute wall time inside the graded probes. NOT part of the
driver contract — bench.py stays the graded artifact.

    python bench_extra.py build      # decompose write_index
    python bench_extra.py pretrain   # decompose the corpus pipeline stages
    python bench_extra.py queries    # headline queries with noop sink
"""

from __future__ import annotations

import json
import os
import sys
import time

import pyspark.sql.functions as F


def _noop(df):
    df.write.format("noop").mode("overwrite").save()


def _t(label, fn, out):
    t0 = time.perf_counter()
    r = fn()
    sec = round(time.perf_counter() - t0, 3)
    out[label] = sec
    print(f"[extra] {label:40s} {sec:8.3f}s", file=sys.stderr, flush=True)
    return r


def build_breakdown():
    from importpipeline_spark.session import get_spark
    from importpipeline_spark.index.build import build_docs_and_tf, shard_of
    from importpipeline_spark.index.store import (
        _postings_from_sharded,
        write_index,
    )

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("bench-extra", cores=cpus,
                      shuffle_partitions=max(32, cpus))
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "60000"))
    pages_path = f"/tmp/bench_idx/pages_{n_docs}"
    if not os.path.exists(pages_path):
        from importpipeline_spark.index.pagesgen import write_pages

        write_pages(spark, pages_path, n_docs)
    pages = spark.read.parquet(pages_path)
    out = {}
    # warmup (worker pool imports + codegen) exactly like bench.py
    spark.range(0, 1_000_000, 1, cpus).agg(F.sum("id")).collect()
    from importpipeline_spark.index.build import build_docs_and_tf as _b

    _b(pages.limit(4000)).count()

    spark.sparkContext.setJobDescription("extra: pages scan only")
    _t("pages_scan_noop", lambda: _noop(pages), out)
    spark.sparkContext.setJobDescription("extra: fused extract+tokenize+count")
    fused = build_docs_and_tf(pages).select("doc_id", "doc_len", "tf_pairs")
    for _ in range(2):
        _t("fused_noop", lambda: _noop(fused), out)
    spark.sparkContext.setJobDescription("extra: fused+exchange")
    sharded = fused.withColumn("shard", shard_of(F.col("doc_id"), 64)) \
        .repartition(64, "shard")
    _t("fused_exchange_noop", lambda: _noop(sharded), out)
    spark.sparkContext.setJobDescription("extra: + encode cogroup")
    sh_p = sharded.persist()
    _t("fused_exchange_persist", lambda: _noop(sh_p), out)
    postings = _postings_from_sharded(sh_p)
    _t("encode_noop_from_cache", lambda: _noop(postings), out)
    sh_p.unpersist()
    spark.sparkContext.setJobDescription("extra: full write_index x2")
    import shutil

    for i in range(2):
        shutil.rmtree("/tmp/bench_extra_idx", ignore_errors=True)
        _t(f"write_index_{i}", lambda: write_index(
            spark, pages, "/tmp/bench_extra_idx", n_shards=64,
            write_docs=False), out)
    shutil.rmtree("/tmp/bench_extra_idx", ignore_errors=True)
    print(json.dumps({"probe": "build_breakdown", "stages": out}))
    spark.stop()


if __name__ == "__main__":
    mode = sys.argv[1] if len(sys.argv) > 1 else "build"
    if mode == "build":
        build_breakdown()
