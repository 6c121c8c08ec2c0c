"""spark-submit entry point: crawled pages → deduplicated, filtered,
scrubbed training corpus — the full pretraining data pipeline as ONE job
composing the engine's operators:

    extract (quarantined)            html/udfs + index/build
    → quality gate                   text/analysis + operators/pretrain
      (token bounds, repetition)
    → exact dedup                    operators/dedup.dedup_exact
    → near-dup dedup                 minhash-LSH pairs → connected
                                     components → smallest-id survivor
    → decontamination (optional)     operators/pretrain.contamination_hits
    → PII scrub                      operators/pretrain.scrub_pii
    → stratified sampling (optional) operators/pretrain.corpus_sample
    → parquet corpus + one JSON stats line per stage (the run report)

    zip -r importpipeline_spark.zip importpipeline_spark
    spark-submit --master <cluster-or-local> \
        --py-files importpipeline_spark.zip \
        jobs/pretrain_corpus_job.py \
        --input /data/pages --output /data/corpus \
        --benchmark /data/evalset --sample '{"en": 0.5, "de": 0.25}'

Every stage is the operator's documented scale shape (capped LSH buckets,
broadcast benchmark join, map-side sampling filter); the stage counts in
the report are the same numbers a 100-TB run would log for data lineage.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="pages table path")
    ap.add_argument("--output", required=True, help="corpus output path")
    ap.add_argument("--benchmark", default=None,
                    help="optional eval-set path (text column) for "
                         "n-gram decontamination")
    ap.add_argument("--sample", default=None,
                    help="optional JSON {lang: fraction} stratified budget")
    ap.add_argument("--min-tokens", type=int, default=5)
    ap.add_argument("--max-tokens", type=int, default=1_000_000)
    ap.add_argument("--max-dup-word-frac", type=float, default=0.9)
    ap.add_argument("--max-top2gram-frac", type=float, default=0.5)
    ap.add_argument("--neardup-threshold", type=float, default=0.8)
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("importpipeline-pretrain-corpus").getOrCreate()
    from importpipeline_spark.index.build import build_docs_safe
    from importpipeline_spark.operators.dedup import (
        dedup_exact,
        minhash_lsh_pairs,
        neardup_survivors,
        release_cache,
    )
    from importpipeline_spark.operators.pretrain import (
        contamination_hits,
        corpus_sample,
        repetition_signals,
        scrub_pii,
    )

    stats: dict[str, int] = {}
    pages = spark.read.parquet(args.input)

    # 1. extraction with per-record quarantine
    docs, errors = build_docs_safe(pages)
    docs = docs.drop("tokens").persist()
    stats["extracted"] = docs.count()
    stats["quarantined"] = errors.count()

    # 2. quality gate: token bounds + repetition signals
    rep = repetition_signals(docs, "text", "doc_id")
    good_ids = rep.where(
        (F.col("n_words") >= args.min_tokens)
        & (F.col("n_words") <= args.max_tokens)
        & (F.col("dup_word_frac") <= args.max_dup_word_frac)
        & (F.col("top_2gram_char_frac") <= args.max_top2gram_frac)
    ).select("doc_id")
    docs2 = docs.join(good_ids, "doc_id", "left_semi").persist()
    stats["after_quality"] = docs2.count()
    docs.unpersist()

    # 3. exact dedup (smallest doc_id survives)
    docs3 = dedup_exact(docs2, "text", "doc_id").persist()
    stats["after_exact_dedup"] = docs3.count()
    docs2.unpersist()

    # 4. near-dup dedup: LSH candidate pairs → components → survivors
    pairs = minhash_lsh_pairs(
        docs3, "text", "doc_id", threshold=args.neardup_threshold
    )
    pairs = pairs.persist()
    n_pairs = pairs.count()
    stats["neardup_pairs"] = n_pairs
    if n_pairs:
        docs4 = neardup_survivors(docs3, pairs).persist()
    else:
        docs4 = docs3
    stats["after_neardup"] = docs4.count()
    release_cache(pairs)
    pairs.unpersist()

    # 5. optional decontamination against a benchmark/eval table
    if args.benchmark:
        bench = spark.read.parquet(args.benchmark)
        hits = contamination_hits(docs4, bench, "text", "doc_id")
        clean_ids = hits.where(~F.col("contaminated")).select("doc_id")
        docs5 = docs4.join(clean_ids, "doc_id", "left_semi").persist()
        stats["after_decontamination"] = docs5.count()
    else:
        docs5 = docs4

    # 6. PII scrub (map-side), 7. optional stratified sampling
    out = docs5.withColumn("text", scrub_pii(F.col("text")))
    if args.sample:
        out = corpus_sample(
            out, json.loads(args.sample), "lang", "doc_id", seed=args.seed
        )
    out.write.mode("overwrite").parquet(args.output)
    stats["written"] = spark.read.parquet(args.output).count()

    print(json.dumps({"job": "pretrain_corpus", **stats}))
    spark.stop()


if __name__ == "__main__":
    main()
