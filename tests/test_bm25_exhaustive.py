"""Rank-identity: Spark exhaustive BM25 vs the independent numpy oracle.

Query set per FIXTURES.md §3: head/mid/tail 1-term, multi-term conjunctions,
diacritic + mixed-case variants (exercise the analyzer), out-of-vocabulary.
"""

import pytest

from importpipeline_spark.index.build import build_logical_index
from importpipeline_spark.index.pagesgen import gen_pages_df
from importpipeline_spark.index.search import analyze_query, bm25_topk_batch, bm25_topk_exhaustive
from importpipeline_spark.text.tokenizer import tokenize_scalar

from bm25_oracle import OracleIndex

N_DOCS = 800

QUERIES = [
    (1, "the"),                     # head term
    (2, "of and"),                  # two head terms
    (3, "ebakaba8"),                # mid/tail term
    (4, "the ebakaba8 equababa1"),  # mixed head+tail conjunction
    (5, "Chélütmân0"),  # diacritics + case → analyzer folding
    (6, "zzzznotaword"),            # OOV → empty result
    (7, "der die und"),             # de stopwords
    (8, "elütsopo7 egicoco6"),
]


@pytest.fixture(scope="module")
def index_and_oracle(spark):
    pages = gen_pages_df(spark, N_DOCS, seed=42, partitions=8)
    idx = build_logical_index(pages)
    docs_local = [
        (r.doc_id, r.tokens or [])
        for r in idx.docs.select("doc_id", "tokens").collect()
    ]
    oracle = OracleIndex(docs_local)
    return idx, oracle


def test_no_docid_collisions(index_and_oracle):
    idx, oracle = index_and_oracle
    assert idx.docs.select("doc_id").distinct().count() == N_DOCS


def test_stats_match(index_and_oracle):
    idx, oracle = index_and_oracle
    assert idx.stats["n_docs"] == oracle.n
    assert idx.stats["avgdl"] == pytest.approx(oracle.avgdl, rel=1e-12)


@pytest.mark.parametrize("qid,query", QUERIES)
def test_rank_identical_topk(index_and_oracle, spark, qid, query):
    idx, oracle = index_and_oracle
    expected = oracle.topk(analyze_query(query), k=10)
    got = bm25_topk_exhaustive(spark, idx, query, k=10).collect()
    assert [r.doc_id for r in got] == [d for d, _ in expected], f"query={query!r}"
    for r, (_, s) in zip(got, expected):
        assert r.score == pytest.approx(s, rel=1e-9, abs=1e-12)


def test_batch_matches_single(index_and_oracle, spark):
    idx, oracle = index_and_oracle
    res = bm25_topk_batch(spark, idx, QUERIES, k=10).collect()
    by_q = {}
    for r in res:
        by_q.setdefault(r.query_id, []).append(r)
    for qid, query in QUERIES:
        expected = oracle.topk(analyze_query(query), k=10)
        rows = sorted(by_q.get(qid, []), key=lambda r: r.rank)
        assert [r.doc_id for r in rows] == [d for d, _ in expected], f"qid={qid}"


def test_analyzer_scalar_matches_distributed(index_and_oracle, spark):
    idx, _ = index_and_oracle
    sample = idx.docs.select("text", "tokens").limit(100).collect()
    for r in sample:
        assert tokenize_scalar(r.text) == (list(r.tokens) if r.tokens is not None else None)
