#!/usr/bin/env python
"""Benchmark harness.

Default mode: runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS], plus an index-build
throughput probe, and prints ONE JSON line:
    {"metric": "docs_indexed_per_sec", "value": N, "unit": "docs/sec",
     "queries": {...per-query sec...}, "sf": 0.1}

Scaling mode (north rule evidence — two "cluster sizes" as two local
parallelism levels on identical input):
    python bench.py --scaling        # runs build at local[8] and local[32]
                                     # via subprocesses, writes BENCH/BASELINE.md

Build-only worker (used by --scaling; one JVM per measurement):
    python bench.py --build-only --cores 8 --docs 60000
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.abspath(__file__))
HEADLINE = [
    "mapreduce_undup_agg",
    "topk_orders",
    "fieldmerge_events",
    "term_freq_top20",
    "dedup_exact",
    "cosine_topk",
    "quality_by_lang",
    "bm25_topk_docs",
]
WAND_QUERIES = ["the", "of and", "the ebakaba8 equababa1", "der die und"]


def _sf_of(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_build(cores: int, n_docs: int, out_root: str) -> dict:
    """One full index build (generate → extract → tokenize → postings) at a
    given parallelism. Generation cost is excluded by materializing pages
    first (the build reads parquet, like production reads Iceberg)."""
    from importpipeline_spark.session import get_spark
    from importpipeline_spark.index.pagesgen import write_pages
    from importpipeline_spark.index.store import write_index
    from importpipeline_spark.index.wand import bm25_topk_wand

    spark = get_spark("bench-build", cores=cores, shuffle_partitions=max(64, cores * 2))
    pages_path = os.path.join(out_root, "pages")
    if not os.path.exists(pages_path):
        write_pages(spark, pages_path, n_docs)
    # split the input wide enough to feed every core through the CPU-heavy
    # extraction/tokenization stages (small parquet files pack into few
    # splits; a cluster would get this from its input split planning)
    pages = spark.read.parquet(pages_path).repartition(cores * 3)
    idx_root = os.path.join(out_root, f"index_c{cores}")
    shutil.rmtree(idx_root, ignore_errors=True)
    t0 = time.perf_counter()
    # shard count sized for the larger parallelism level so BOTH runs use the
    # identical layout (the cluster-size comparison must hold data constant)
    pidx = write_index(spark, pages, idx_root, n_shards=64, write_docs=False)
    build_sec = time.perf_counter() - t0
    bm25_topk_wand(spark, pidx, "warmup", k=10).collect()  # JIT/codegen warmup
    t0 = time.perf_counter()
    for q in WAND_QUERIES:
        bm25_topk_wand(spark, pidx, q, k=10).collect()
    query_sec = (time.perf_counter() - t0) / len(WAND_QUERIES)
    spark.stop()
    return {
        "cores": cores,
        "n_docs": n_docs,
        "build_sec": round(build_sec, 3),
        "docs_per_sec": round(n_docs / build_sec, 1),
        "wand_query_sec": round(query_sec, 3),
    }


def scaling(n_docs: int, out_root: str = "/tmp/bench_scaling") -> None:
    os.makedirs(out_root, exist_ok=True)
    results = []
    for cores in (8, 32):
        proc = subprocess.run(
            [sys.executable, __file__, "--build-only", "--cores", str(cores),
             "--docs", str(n_docs), "--out", out_root],
            capture_output=True, text=True, cwd=REPO,
        )
        line = proc.stdout.strip().splitlines()[-1]
        results.append(json.loads(line))
    thr_n, thr_4n = results[0]["docs_per_sec"], results[1]["docs_per_sec"]
    eff = (thr_4n / thr_n) / 4.0
    md = f"""# BENCH/BASELINE.md — measured numbers

Index build (pages parquet → extract → tokenize → postings/doclen/terms),
identical input ({n_docs} docs), two parallelism levels on one host
(sandbox proxy for N vs 4N executors per the driver instruction).

| parallelism | build sec | docs/sec | WAND query sec (avg of {len(WAND_QUERIES)}) |
|---|---|---|---|
| local[8]  (N)  | {results[0]['build_sec']} | {thr_n} | {results[0]['wand_query_sec']} |
| local[32] (4N) | {results[1]['build_sec']} | {thr_4n} | {results[1]['wand_query_sec']} |

**Scaling efficiency** = (thr@4N / thr@N) / 4 = **{eff:.3f}** (target ≥ 0.8).
"""
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)
    print(json.dumps({"metric": "scaling_efficiency", "value": round(eff, 3),
                      "unit": "ratio", "results": results}))


def headline() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    from importpipeline_spark.session import get_spark
    import __spark_entry__ as entry_mod

    spark = get_spark("bench", cores=cpus, shuffle_partitions=max(32, cpus))
    qmap = entry_mod.queries()
    times = {}
    total = 0.0
    for name in HEADLINE:
        t0 = time.perf_counter()
        qmap[name](spark, sf_dir).collect()
        sec = time.perf_counter() - t0
        times[name] = round(sec, 3)
        total += sec

    # index-build throughput probe (size scaled to keep bench < ~3 min)
    n_docs = int(os.environ.get("SPARK_GRAFT_BENCH_DOCS", "60000"))
    out_root = "/tmp/bench_idx"
    os.makedirs(out_root, exist_ok=True)
    from importpipeline_spark.index.pagesgen import write_pages
    from importpipeline_spark.index.store import write_index
    from importpipeline_spark.index.wand import bm25_topk_wand

    pages_path = os.path.join(out_root, f"pages_{n_docs}")
    if not os.path.exists(pages_path):
        write_pages(spark, pages_path, n_docs)
    pages = spark.read.parquet(pages_path)
    idx_root = os.path.join(out_root, "index")
    shutil.rmtree(idx_root, ignore_errors=True)
    t0 = time.perf_counter()
    pidx = write_index(spark, pages, idx_root, n_shards=64, write_docs=False)
    build_sec = time.perf_counter() - t0
    times["index_build"] = round(build_sec, 3)
    t0 = time.perf_counter()
    for q in WAND_QUERIES:
        bm25_topk_wand(spark, pidx, q, k=10).collect()
    times["wand_query_avg"] = round((time.perf_counter() - t0) / len(WAND_QUERIES), 3)
    total += build_sec

    print(json.dumps({
        "metric": "docs_indexed_per_sec",
        "value": round(n_docs / build_sec, 1),
        "unit": "docs/sec",
        "queries": times,
        "sf": _sf_of(sf_dir),
        "total_sec": round(total, 3),
        "cores": cpus,
        "bench_docs": n_docs,
    }))
    spark.stop()


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--build-only", action="store_true")
    ap.add_argument("--scaling", action="store_true")
    ap.add_argument("--cores", type=int, default=8)
    ap.add_argument("--docs", type=int, default=60000)
    ap.add_argument("--out", default="/tmp/bench_scaling")
    args = ap.parse_args()
    if args.build_only:
        print(json.dumps(run_build(args.cores, args.docs, args.out)))
    elif args.scaling:
        scaling(args.docs, args.out)
    else:
        headline()
