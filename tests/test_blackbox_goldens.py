"""Committed golden-file blackbox tests — the reference's FileTestBase
pattern (/root/reference/ImportPipeline/UnitTests/FileTestBase.cs:59-69:
byte-identical comparison of produced outputs against committed goldens),
applied to the full import → index → query flow.

Goldens live in tests/goldens/ and were produced once by the engine itself;
any change to extraction, analysis, codec, scoring, or tie-breaking that
shifts a single byte or rank fails here.
"""

import json
import os

import pytest

from importpipeline_spark.html.udfs import html_to_text_udf
from importpipeline_spark.index.pagesgen import gen_pages_df
from importpipeline_spark.index.serve import LocalSearcher
from importpipeline_spark.index.store import write_index

GOLDEN_DIR = os.path.join(os.path.dirname(__file__), "goldens")
N = 120


def test_extraction_goldens_byte_identical(spark):
    with open(os.path.join(GOLDEN_DIR, "extracted_texts.json")) as f:
        expected = json.load(f)
    pages = gen_pages_df(spark, N, seed=42, partitions=4)
    got = {
        r.url: r.t
        for r in pages.select(
            "url", html_to_text_udf("html").alias("t")
        ).collect()
    }
    assert len(got) == len(expected) == N
    for url, text in expected.items():
        assert got[url] == text, f"extraction drifted for {url}"


def test_topk_goldens_rank_and_score_identical(spark, tmp_path):
    with open(os.path.join(GOLDEN_DIR, "topk_results.json")) as f:
        expected = json.load(f)
    root = str(tmp_path / "idx")
    pages = gen_pages_df(spark, N, seed=42, partitions=4)
    pidx = write_index(spark, pages, root, n_shards=4)
    # exact counter assertions (BlackboxTest.checkDataSourceStats pattern —
    # UnitTests/BlackboxTest.cs:54-66)
    assert pidx.stats["n_docs"] == N
    searcher = LocalSearcher(root)
    for q, rows in expected.items():
        got = searcher.search(q, 10)
        assert [[d, s] for d, s in got] == rows, f"top-k drifted for {q!r}"
