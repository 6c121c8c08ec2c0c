"""Incremental index update: rebuild only affected shards; results must be
rank- and score-identical to a full rebuild over the merged corpus."""

import pytest
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from importpipeline_spark.index.pagesgen import gen_pages_df
from importpipeline_spark.index.segments import update_index
from importpipeline_spark.index.store import write_index
from importpipeline_spark.index.wand import bm25_topk_wand

N1 = 400
N_RECRAWL = 40
N_NEW = 60

QUERIES = ["the", "of and", "ebakaba8", "the ebakaba8 equababa1", "der die und"]


def _snapshot2(spark):
    """Re-crawls of urls 0..40 with NEW content (+1 day), unchanged 40..400,
    plus new urls 400..460."""
    base = gen_pages_df(spark, N1 + N_NEW, seed=42, partitions=8)
    donor = (
        gen_pages_df(spark, N_RECRAWL, seed=99, partitions=4)
        .select(F.col("url").alias("d_url"), F.col("html").alias("d_html"),
                F.col("text").alias("d_text"))
        .withColumn("rn", F.row_number().over(Window.orderBy("d_url")))
    )
    orig = base.withColumn("rn", F.row_number().over(Window.orderBy("url")))
    recrawled = (
        orig.where(F.col("rn") <= N_RECRAWL)
        .join(donor, "rn")
        .select(
            "url",
            (F.col("warc_ts") + F.expr("INTERVAL 1 DAY")).alias("warc_ts"),
            F.col("d_html").alias("html"),
            F.col("d_text").alias("text"),
            "lang",
        )
    )
    rest = orig.where(F.col("rn") > N_RECRAWL).drop("rn")
    return recrawled.unionByName(rest)


@pytest.fixture(scope="module")
def indexes(spark, tmp_path_factory):
    root_inc = str(tmp_path_factory.mktemp("inc"))
    root_full = str(tmp_path_factory.mktemp("full"))
    snap1 = gen_pages_df(spark, N1, seed=42, partitions=8)
    write_index(spark, snap1, root_inc, n_shards=8)
    snap2 = _snapshot2(spark)
    pidx_inc = update_index(spark, root_inc, snap2)
    # full rebuild over exactly the merged corpus (snap2 covers everything)
    pidx_full = write_index(spark, snap2, root_full, n_shards=8)
    return pidx_inc, pidx_full


def test_stats_match_full_rebuild(indexes):
    pidx_inc, pidx_full = indexes
    assert pidx_inc.stats["n_docs"] == pidx_full.stats["n_docs"] == N1 + N_NEW
    assert pidx_inc.stats["avgdl"] == pidx_full.stats["avgdl"]
    assert pidx_inc.stats["total_tokens"] == pidx_full.stats["total_tokens"]


@pytest.mark.parametrize("query", QUERIES)
def test_rank_identical_to_full_rebuild(indexes, spark, query):
    pidx_inc, pidx_full = indexes
    a = bm25_topk_wand(spark, pidx_inc, query, k=10).collect()
    b = bm25_topk_wand(spark, pidx_full, query, k=10).collect()
    assert [(r.doc_id, r.score) for r in a] == [(r.doc_id, r.score) for r in b]


def test_dictionary_matches_full_rebuild(indexes, spark):
    pidx_inc, pidx_full = indexes
    ta = {
        r.term: r.df
        for r in spark.read.parquet(pidx_inc.terms_path).collect()
    }
    tb = {
        r.term: r.df
        for r in spark.read.parquet(pidx_full.terms_path).collect()
    }
    assert ta == tb


def test_noop_update(indexes, spark):
    pidx_inc, _ = indexes
    # re-applying the same snapshot changes nothing (all ExistSame)
    before = pidx_inc.stats["n_docs"]
    snap2 = _snapshot2(spark)
    out = update_index(spark, pidx_inc.root, snap2, run_id="run3")
    assert out.stats["n_docs"] == before
