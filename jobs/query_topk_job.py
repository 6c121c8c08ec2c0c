"""spark-submit entry point: batch BM25 top-k over a built index.

    spark-submit --master <cluster-or-local> \
        --py-files importpipeline_spark.zip \
        jobs/query_topk_job.py \
        --root /data/index --queries queries.txt --k 10 --out /data/results

One index pass for the WHOLE query file (block-max WAND per shard with a
shared decode cache; global merge is a k-row-per-query window) — the
amortized query-workload shape. Results are rank-identical to the exhaustive
BM25 oracle (verified in tests/ against an independent scalar oracle).
"""

from __future__ import annotations

import argparse
import os

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", required=True)
    ap.add_argument("--queries", required=True, help="one query per line")
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default=None,
                    help="parquet output path (default: print to stdout)")
    args = ap.parse_args()

    spark = SparkSession.builder.appName("importpipeline-query-topk").getOrCreate()
    from importpipeline_spark.index.store import open_index
    from importpipeline_spark.index.wand import bm25_topk_wand_batch

    # --deploy-mode cluster: ship the file with --files queries.txt and pass
    # --queries queries.txt; SparkFiles resolves it on whichever node the
    # driver landed. A plain local path still works in client mode.
    qpath = args.queries
    if not os.path.exists(qpath):
        from pyspark import SparkFiles

        staged = SparkFiles.get(os.path.basename(qpath))
        if os.path.exists(staged):
            qpath = staged
    with open(qpath) as f:
        queries = [(i, line.strip()) for i, line in enumerate(f) if line.strip()]
    pidx = open_index(args.root)
    out = bm25_topk_wand_batch(spark, pidx, queries, k=args.k)
    if args.out:
        out.write.mode("overwrite").parquet(args.out)
    else:
        for r in out.collect():
            print(f"{r.query_id}\t{r.rank}\t{r.doc_id}\t{r.score!r}")
    spark.stop()


if __name__ == "__main__":
    main()
