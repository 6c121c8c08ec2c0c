"""spark-submit entry point: crawled pages → deduplicated, filtered,
scrubbed training corpus — the full pretraining data pipeline as ONE job
composing the engine's operators:

    extract (quarantined)            html/udfs + index/build
    → quality gate                   text/analysis + operators/pretrain
      (token bounds, repetition)
    → boilerplate removal            operators/dedup.boilerplate_ngrams
      (mine cross-doc spans, strip)  + strip_boilerplate
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
``run_pipeline`` is the library surface (bench.py times it as the
``pretrain_corpus`` probe); ``main`` is the spark-submit CLI wrapper.
"""

from __future__ import annotations

import argparse
import json

from pyspark.sql import SparkSession, functions as F


def run_pipeline(
    spark: SparkSession,
    pages,
    output: str,
    benchmark_path: str | None = None,
    sample: dict | None = None,
    min_tokens: int = 5,
    max_tokens: int = 1_000_000,
    max_dup_word_frac: float = 0.9,
    max_top2gram_frac: float = 0.5,
    neardup_threshold: float = 0.8,
    boilerplate_df_frac: float = 0.3,
    decon_ngram: int = 8,
    token_budget: int | None = None,
    seed: int = 1,
) -> dict:
    """Run the whole corpus pipeline; returns the per-stage count report.

    ``boilerplate_df_frac``: a word trigram present in more than this
    fraction of the post-quality corpus is treated as boilerplate and
    stripped from every document (0 disables the stage). The threshold is a
    document-frequency fraction rather than an absolute count so the same
    configuration means the same thing at any corpus size.

    ``decon_ngram``: decontamination overlap length — 8 words by default
    (the published decontamination passes use 8-13-gram overlap; trigrams
    flag most of any same-language corpus as contaminated).

    ``token_budget``: optional final cut — keep the longest documents until
    the cumulative token count reaches the budget (select_token_budget's
    distributed prefix sum; applied after sampling).
    """
    from importpipeline_spark.index.build import build_docs_safe
    from importpipeline_spark.operators.dedup import (
        boilerplate_ngrams,
        dedup_exact,
        minhash_lsh_pairs,
        neardup_survivors,
        release_cache,
        strip_boilerplate,
    )
    from importpipeline_spark.operators.pretrain import (
        contamination_hits,
        corpus_sample,
        repetition_signals,
        scrub_pii,
        select_token_budget,
    )
    from importpipeline_spark.text.analysis import token_count

    import time as _time

    stats: dict[str, int] = {}
    _t = _time.perf_counter()

    def _lap(key: str) -> None:
        # per-stage wall time in the report (sec_*): the run report should
        # say WHERE a slow run spent its time, not just what it kept
        nonlocal _t
        stats[f"sec_{key}"] = round(_time.perf_counter() - _t, 1)
        _t = _time.perf_counter()

    # 1. extraction with per-record quarantine. cache=True shares ONE
    # extraction pass between the docs and errors sides (counting both
    # would otherwise run the Arrow extraction UDF over the whole corpus
    # twice — at 100 TB that doubles the most expensive stage); the shared
    # cache is released as soon as both counts are in and docs has its own
    # (html-free, token-free) cache.
    docs, errors = build_docs_safe(pages, cache=True)
    extract_cache = docs.cached_deps
    docs = docs.drop("tokens").persist()
    # the two counts are independent jobs over the shared extraction cache —
    # concurrent submission overlaps their job floors (r8); the docs count
    # is submitted first so FIFO materializes the shared cache through it
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=2) as _ex:
        _f_docs = _ex.submit(docs.count)
        _f_err = _ex.submit(errors.count)
        stats["extracted"] = _f_docs.result()
        stats["quarantined"] = _f_err.result()
    for _c in extract_cache:
        _c.unpersist()
    _lap("extract")

    # 2. quality gate: token bounds + repetition signals. The gate below
    # reads only n_words / dup_word_frac / top_2gram_char_frac, so only the
    # word and 2-gram unit kinds are exploded and counted (r8) — lines and
    # 3-grams were ~40% of the shuffled unit volume, computed then dropped.
    rep = repetition_signals(docs, "text", "doc_id", kinds=("w", "g2"))
    good_ids = rep.where(
        (F.col("n_words") >= min_tokens)
        & (F.col("n_words") <= max_tokens)
        & (F.col("dup_word_frac") <= max_dup_word_frac)
        & (F.col("top_2gram_char_frac") <= max_top2gram_frac)
    ).select("doc_id")
    docs2 = docs.join(good_ids, "doc_id", "left_semi").persist()
    stats["after_quality"] = docs2.count()
    docs.unpersist()
    _lap("quality")

    # 3. boilerplate removal: mine cross-document repeated trigrams above
    # the df-fraction threshold, strip every covered token (exact per-doc
    # drop accounting — the report records total tokens removed)
    bp_ckpt = None
    if boilerplate_df_frac and stats["after_quality"]:
        min_df = max(2, int(boilerplate_df_frac * stats["after_quality"]))
        mined = boilerplate_ngrams(
            docs2, "text", "doc_id", n=3, min_df=min_df
        ).persist()
        stats["boilerplate_ngrams"] = mined.count()
        if stats["boilerplate_ngrams"]:
            stripped = strip_boilerplate(docs2, mined, "text", "doc_id", n=3)
            # EAGER localCheckpoint, not persist: every downstream action
            # (LSH bucket caps, pairs count, each CC round, decon, the final
            # write) re-analyzes its full logical plan, and the strip plan's
            # nested higher-order-function trees cost seconds PER ACTION to
            # re-analyze — measured as a scale-independent 4-30x slowdown of
            # every stage after this one (CLAUDE.md 10, same failure class
            # as the CC loop livelock). Checkpointing truncates the logical
            # plan to a LogicalRDD and doubles as the stage materialization.
            bp_ckpt = (
                docs2.drop("text")
                .join(stripped.select("doc_id", "text", "n_removed"), "doc_id")
                .localCheckpoint()
            )
            stats["boilerplate_tokens_removed"] = int(
                bp_ckpt.agg(F.sum("n_removed")).first()[0] or 0
            )
            docs2.unpersist()
            docs2 = bp_ckpt.drop("n_removed")
        else:
            stats["boilerplate_tokens_removed"] = 0
        mined.unpersist()
        _lap("boilerplate")

    # 4. exact dedup (smallest doc_id survives)
    docs3 = dedup_exact(docs2, "text", "doc_id").persist()
    stats["after_exact_dedup"] = docs3.count()
    docs2.unpersist()
    _lap("exact_dedup")

    # 5. near-dup dedup: LSH candidate pairs → components → survivors
    pairs = minhash_lsh_pairs(
        docs3, "text", "doc_id", threshold=neardup_threshold
    )
    pairs = pairs.persist()
    n_pairs = pairs.count()
    stats["neardup_pairs"] = n_pairs
    _lap("neardup_pairs")
    if n_pairs:
        docs4 = neardup_survivors(docs3, pairs).persist()
    else:
        docs4 = docs3
    stats["after_neardup"] = docs4.count()
    _lap("neardup_components")
    release_cache(pairs)
    pairs.unpersist()

    # 6. optional decontamination against a benchmark/eval table
    if benchmark_path:
        bench = spark.read.parquet(benchmark_path)
        hits = contamination_hits(docs4, bench, "text", "doc_id",
                                  n=decon_ngram)
        clean_ids = hits.where(~F.col("contaminated")).select("doc_id")
        docs5 = docs4.join(clean_ids, "doc_id", "left_semi").persist()
        stats["after_decontamination"] = docs5.count()
        _lap("decontamination")
    else:
        docs5 = docs4

    # 7. PII scrub (map-side), 8. optional stratified sampling
    out = docs5.withColumn("text", scrub_pii(F.col("text")))
    if sample:
        out = corpus_sample(out, sample, "lang", "doc_id", seed=seed)
    tb = None
    pre_budget = None
    if token_budget:
        # persist the scrubbed+sampled+tokenized frame ONCE: the budget
        # path reads it three times (the skinny prefix-sum exchange, the
        # threshold-filtered write, the kept-token stat) and each pass
        # would otherwise re-run the PII regex chain over the corpus
        pre_budget = out.withColumn(
            "__nt", token_count(F.col("text")).cast("long")
        ).persist()
        # keep the RAW select_token_budget handle: .drop() returns a new
        # DataFrame without the Python-side cached_deps attribute, so
        # releasing must go through tb, not out (ADVICE r4)
        tb = select_token_budget(pre_budget, token_budget, "__nt", "__nt",
                                 "doc_id")
        out = tb.drop("__nt")
        # select_token_budget's driver jobs (range sampling, totals,
        # threshold aggs) materialized pre_budget — so this lap holds the
        # PII scrub + sampling evaluation AND the budget cut; the next lap
        # is the write alone
        _lap("budget_cut")
    out.write.mode("overwrite").parquet(output)
    stats["written"] = spark.read.parquet(output).count()
    if tb is not None:
        # the budget's effect, observable in the run report: kept token
        # mass (≤ token_budget by construction; the skinny prefix-sum
        # relation is still cached, so this is one cheap agg)
        stats["written_tokens"] = int(
            tb.agg(F.sum("__nt")).first()[0] or 0
        )
    # the write materialized everything downstream of docs3/docs4/docs5 —
    # release every cache still pinned (shared bench/pytest sessions run
    # this pipeline repeatedly; leaked caches accumulate). unpersist is
    # idempotent, so the docs5-is-docs4 / docs4-is-docs3 aliases are fine.
    if tb is not None:
        release_cache(tb)
    if pre_budget is not None:
        pre_budget.unpersist()
    release_cache(docs4)  # neardup survivors' checkpointed CC labels
    docs5.unpersist()
    docs4.unpersist()
    docs3.unpersist()
    if bp_ckpt is not None:
        # localCheckpoint blocks live outside the CacheManager — free them
        # deterministically (unpersist above is a no-op for them; otherwise
        # repeated run_pipeline calls in a shared session accumulate
        # executor storage until a driver GC)
        from importpipeline_spark.operators.dedup import release_checkpoint

        release_checkpoint(bp_ckpt)
    _lap("scrub_sample_write")
    return stats


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
    ap.add_argument("--boilerplate-df-frac", type=float, default=0.3,
                    help="strip trigrams present in more than this fraction "
                         "of documents (0 disables)")
    ap.add_argument("--decon-ngram", type=int, default=8,
                    help="decontamination word n-gram overlap length")
    ap.add_argument("--token-budget", type=int, default=None,
                    help="optional final cut: keep longest docs until this "
                         "cumulative token count")
    ap.add_argument("--seed", type=int, default=1)
    args = ap.parse_args()

    spark = SparkSession.builder.appName("importpipeline-pretrain-corpus").getOrCreate()
    stats = run_pipeline(
        spark,
        spark.read.parquet(args.input),
        args.output,
        benchmark_path=args.benchmark,
        sample=json.loads(args.sample) if args.sample else None,
        min_tokens=args.min_tokens,
        max_tokens=args.max_tokens,
        max_dup_word_frac=args.max_dup_word_frac,
        max_top2gram_frac=args.max_top2gram_frac,
        neardup_threshold=args.neardup_threshold,
        boilerplate_df_frac=args.boilerplate_df_frac,
        decon_ngram=args.decon_ngram,
        token_budget=args.token_budget,
        seed=args.seed,
    )
    print(json.dumps({"job": "pretrain_corpus", **stats}))
    spark.stop()


if __name__ == "__main__":
    main()
