"""spark-submit entry point: incremental, snapshot-isolated index update.

Completes the lifecycle next to build_index_job/query_topk_job: a published
store directory holds immutable generations plus an atomic CURRENT pointer
(Iceberg-snapshot-shaped — README "Snapshot-isolated publishing"). The first
submission initializes the store; every later submission applies a new pages
snapshot as a copy-on-write generation and flips CURRENT only on success, so
concurrent readers always see a complete index and a crashed update changes
nothing:

    spark-submit --master <cluster-or-local> \
        --py-files importpipeline_spark.zip \
        jobs/update_index_job.py \
        --input /data/pages_snapN --store /data/index_store \
        --run-id runN --input-snapshot snapN

Only pages whose content actually changed (ExistState classification) cause
shard re-encodes; results are rank-identical to a full rebuild over the new
snapshot (block-max metadata is stats-independent —
importpipeline_spark/index/segments.py).
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="pages snapshot path/name")
    ap.add_argument("--format", default="parquet")
    ap.add_argument("--store", required=True,
                    help="published store root (generations + CURRENT)")
    ap.add_argument("--n-shards", type=int, default=64,
                    help="doc-range shards (first submission only)")
    ap.add_argument("--run-id", default="run1")
    ap.add_argument("--input-snapshot", default="snap1")
    ap.add_argument("--keep-generations", type=int, default=2)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("importpipeline-update-index").getOrCreate()
    from importpipeline_spark.index.segments import (
        init_published_index,
        update_index_published,
    )
    from importpipeline_spark.sinks.writers import current_generation

    pages = spark.read.format(args.format).load(args.input)
    if current_generation(args.store) is None:
        pidx = init_published_index(
            spark, pages, args.store, n_shards=args.n_shards,
            run_id=args.run_id, input_snapshot=args.input_snapshot,
        )
        action = "init"
    else:
        pidx = update_index_published(
            spark, args.store, pages, run_id=args.run_id,
            input_snapshot=args.input_snapshot,
            keep_generations=args.keep_generations,
        )
        action = "update"
    print(json.dumps({
        "action": action,
        "store": args.store,
        "generation": pidx.root,
        "n_docs": pidx.stats["n_docs"],
        "avgdl": pidx.stats["avgdl"],
    }))
    spark.stop()


if __name__ == "__main__":
    main()
