"""Distributed extraction: Arrow UDF output must be byte-identical to the
independently-constructed goldens, at any partitioning."""

from pyspark.sql import functions as F

from importpipeline_spark.html.udfs import html_to_text_udf, make_abstract_udf
from importpipeline_spark.index.pagesgen import gen_pages_df


def test_extraction_matches_golden(spark):
    pages = gen_pages_df(spark, 600, seed=42, partitions=7)
    out = pages.withColumn("got", html_to_text_udf(F.col("html")))
    bad = out.where(~F.col("got").eqNullSafe(F.col("text"))).count()
    assert bad == 0


def test_generation_partition_invariant(spark):
    a = gen_pages_df(spark, 200, seed=42, partitions=3).orderBy("url").collect()
    b = gen_pages_df(spark, 200, seed=42, partitions=11).orderBy("url").collect()
    assert a == b
    # urls unique
    assert len({r.url for r in a}) == 200


def test_abstract_udf(spark):
    pages = gen_pages_df(spark, 50, seed=42, partitions=2)
    out = pages.select(
        "text", make_abstract_udf(80, 10)(F.col("text")).alias("abs")
    ).collect()
    for r in out:
        if r.text is not None and len(r.text) > 90:
            assert r.abs.endswith(" …")
            assert len(r.abs) <= 92
        else:
            assert r.abs == r.text
