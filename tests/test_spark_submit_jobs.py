"""The north-rule execution contract: the SAME job runs via
``spark-submit --py-files importpipeline_spark.zip`` with no repo on the
python path — build an index, then query it, in two separate submissions
(separate JVMs), exactly as a cluster would run them."""

import json
import os
import shutil
import subprocess
import zipfile

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SPARK_SUBMIT = shutil.which("spark-submit") or "/opt/spark/bin/spark-submit"

pytestmark = pytest.mark.skipif(
    not os.path.exists(SPARK_SUBMIT),
    reason="spark-submit binary not available on this host",
)


def _zip_package(dest_dir: str) -> str:
    zpath = os.path.join(dest_dir, "importpipeline_spark.zip")
    pkg = os.path.join(REPO, "importpipeline_spark")
    with zipfile.ZipFile(zpath, "w") as z:
        for base, _, files in os.walk(pkg):
            if "__pycache__" in base:
                continue
            for f in files:
                p = os.path.join(base, f)
                z.write(p, os.path.relpath(p, REPO))
    return zpath


def _submit(args, cwd):
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the ONLY package source
    proc = subprocess.run(
        [SPARK_SUBMIT, "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=8",
         "--conf", "spark.ui.enabled=false",
         "--conf", "spark.sql.session.timeZone=UTC",
         *args],
        capture_output=True, text=True, cwd=cwd, env=env, timeout=420,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    return proc.stdout


def test_spark_submit_build_then_query(spark, tmp_path):
    # stage the input pages with the test session (plays the role of the
    # upstream crawl table)
    from importpipeline_spark.index.pagesgen import write_pages

    pages_path = str(tmp_path / "pages")
    write_pages(spark, pages_path, 800)

    workdir = str(tmp_path / "work")  # NOT the repo: no implicit imports
    os.makedirs(workdir)
    zpath = _zip_package(workdir)
    root = str(tmp_path / "idx")

    out = _submit(
        ["--py-files", zpath, os.path.join(REPO, "jobs", "build_index_job.py"),
         "--input", pages_path, "--root", root, "--n-shards", "4",
         "--run-id", "submit1", "--input-snapshot", "snapS"],
        cwd=workdir,
    )
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["n_docs"] == 800
    assert stats["segments"] == 4
    assert stats["lineage_docs"] == 800

    qfile = str(tmp_path / "q.txt")
    with open(qfile, "w") as f:
        f.write("the\nof and\n")
    out = _submit(
        ["--py-files", zpath, os.path.join(REPO, "jobs", "query_topk_job.py"),
         "--root", root, "--queries", qfile, "--k", "5"],
        cwd=workdir,
    )
    rows = [line.split("\t") for line in out.strip().splitlines()
            if line.count("\t") == 3]
    assert len(rows) == 10  # 2 queries × top-5
    # rank-identical to the in-process WAND path (same index, same engine)
    from importpipeline_spark.index.store import open_index
    from importpipeline_spark.index.wand import bm25_topk_wand

    pidx = open_index(root)
    expect = [
        (qid, rank, r.doc_id)
        for qid, q in enumerate(["the", "of and"])
        for rank, r in enumerate(bm25_topk_wand(spark, pidx, q, k=5).collect(), 1)
    ]
    got = [(int(r[0]), int(r[1]), int(r[2])) for r in rows]
    assert sorted(got) == sorted(expect)


def test_spark_submit_update_lifecycle(spark, tmp_path):
    """Third lifecycle leg via spark-submit: init a published store, apply an
    incremental snapshot (copy-on-write generation + CURRENT flip), query the
    published generation — all in separate JVMs with the zip as the only
    package source."""
    from importpipeline_spark.index.pagesgen import gen_pages_df

    snap1 = str(tmp_path / "snap1")
    snap2 = str(tmp_path / "snap2")
    gen_pages_df(spark, 500, seed=42).write.parquet(snap1)
    gen_pages_df(spark, 600, seed=42).write.parquet(snap2)  # 500 same + 100 new

    workdir = str(tmp_path / "work")
    os.makedirs(workdir)
    zpath = _zip_package(workdir)
    store = str(tmp_path / "store")
    job = os.path.join(REPO, "jobs", "update_index_job.py")

    out = _submit(
        ["--py-files", zpath, job, "--input", snap1, "--store", store,
         "--n-shards", "4", "--run-id", "r1", "--input-snapshot", "s1"],
        cwd=workdir,
    )
    first = json.loads(out.strip().splitlines()[-1])
    assert first["action"] == "init" and first["n_docs"] == 500

    out = _submit(
        ["--py-files", zpath, job, "--input", snap2, "--store", store,
         "--run-id", "r2", "--input-snapshot", "s2"],
        cwd=workdir,
    )
    second = json.loads(out.strip().splitlines()[-1])
    assert second["action"] == "update" and second["n_docs"] == 600
    assert second["generation"] != first["generation"]

    # the published generation answers queries rank-identically to the
    # in-process engine on the same index
    from importpipeline_spark.index.segments import open_current_index
    from importpipeline_spark.index.wand import bm25_topk_wand

    pidx = open_current_index(store)
    assert pidx.root.rstrip("/") == second["generation"].rstrip("/")
    qfile = str(tmp_path / "q.txt")
    with open(qfile, "w") as f:
        f.write("the\n")
    out = _submit(
        ["--py-files", zpath, os.path.join(REPO, "jobs", "query_topk_job.py"),
         "--root", pidx.root, "--queries", qfile, "--k", "5"],
        cwd=workdir,
    )
    rows = [line.split("\t") for line in out.strip().splitlines()
            if line.count("\t") == 3]
    expect = [r.doc_id for r in bm25_topk_wand(spark, pidx, "the", k=5).collect()]
    assert [int(r[2]) for r in rows] == expect


def test_spark_submit_pretrain_corpus_pipeline(spark, tmp_path):
    """The full training-corpus pipeline as ONE spark-submit job: extract →
    quality gate → exact dedup → near-dup dedup → decontamination → PII
    scrub → corpus parquet, with a per-stage stats report."""
    from pyspark.sql import functions as F

    from importpipeline_spark.index.pagesgen import gen_pages_df

    base = gen_pages_df(spark, 200, seed=42, partitions=2)
    pages_path = str(tmp_path / "ppages")
    base.write.parquet(pages_path)
    # 20 exact content duplicates under new urls
    base.limit(20).withColumn(
        "url", F.concat(F.col("url"), F.lit("_mirror"))
    ).write.mode("append").parquet(pages_path)
    # benchmark/eval set: the texts of 5 never-mirrored docs
    bench_path = str(tmp_path / "bench")
    base.orderBy("url").limit(60).orderBy(F.desc("url")).limit(5).select(
        "text"
    ).write.parquet(bench_path)

    workdir = str(tmp_path / "work2")
    os.makedirs(workdir)
    zpath = _zip_package(workdir)
    out_path = str(tmp_path / "corpus")

    out = _submit(
        ["--py-files", zpath,
         os.path.join(REPO, "jobs", "pretrain_corpus_job.py"),
         "--input", pages_path, "--output", out_path,
         "--benchmark", bench_path],
        cwd=workdir,
    )
    stats = json.loads(out.strip().splitlines()[-1])
    assert stats["extracted"] == 220
    assert stats["quarantined"] == 0
    assert stats["after_quality"] == 220  # synthetic docs pass the gate
    # no trigram reaches the 30% df threshold on the uniform corpus — the
    # stage must report its (empty) mining honestly, not skip silently
    assert stats["boilerplate_ngrams"] == 0
    assert stats["boilerplate_tokens_removed"] == 0
    assert stats["after_exact_dedup"] == 200  # 20 mirrors collapsed
    assert stats["after_neardup"] <= stats["after_exact_dedup"]
    # the 5 benchmark-source docs (at least) are contaminated and dropped
    assert stats["after_decontamination"] <= stats["after_neardup"] - 4
    assert stats["written"] == stats["after_decontamination"]

    corpus = spark.read.parquet(out_path)
    assert corpus.count() == stats["written"]
    # content-unique and text column present post-scrub
    assert corpus.select(F.md5("text")).distinct().count() == corpus.count()
