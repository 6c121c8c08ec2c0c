"""Physical-plan regression tests — pin the scale properties PLANS.md
documents, so a refactor that silently loses pushdown, broadcast, partial
aggregation, or heap-based top-k fails CI instead of resurfacing as a
100×-scale bottleneck.

Assertions target the optimized/executed plan text, not timings: plan shape
is deterministic, timing is not.
"""

import io
from contextlib import redirect_stdout

import pytest
from pyspark.sql import functions as F

SF_DIR = "/root/testdata/sf0.01"


def plan_of(df, mode: str = "formatted") -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain(mode)
    return buf.getvalue()


@pytest.fixture(scope="module")
def small_index(spark, tmp_path_factory):
    from importpipeline_spark.index.pagesgen import gen_pages_df
    from importpipeline_spark.index.store import write_index

    root = str(tmp_path_factory.mktemp("plans_idx"))
    pages = gen_pages_df(spark, 600, seed=21)
    return write_index(spark, pages, root, n_shards=4)


def test_posting_scan_pushdown(spark, small_index):
    """PLANS.md §1: the query-term filter reaches the parquet scan
    (PushedFilters) and shard pruning reaches the partition filters."""
    from importpipeline_spark.index.wand import bm25_topk_wand

    plan = plan_of(bm25_topk_wand(spark, small_index, "the of"))
    assert "PushedFilters" in plan
    assert "In(term" in plan or "EqualTo(term" in plan, plan
    assert "PartitionFilters" in plan


def test_wand_plan_shape(spark, small_index):
    """PLANS.md §2: cogrouped kernel per shard, k-row global merge via
    TakeOrderedAndProject — never a full sort of the corpus."""
    from importpipeline_spark.index.wand import bm25_topk_wand

    plan = plan_of(bm25_topk_wand(spark, small_index, "the of", k=10))
    assert "FlatMapCoGroupsInPandas" in plan
    assert "TakeOrderedAndProject" in plan
    # exactly the two exchanges feeding the cogroup (postings + doclen);
    # the k-row merge must not add a third shuffle
    assert plan.count("Exchange hashpartitioning") <= 2, plan


def test_exhaustive_bm25_broadcasts(spark, small_index):
    """PLANS.md §3: query-terms and idf tables broadcast into the tf scan;
    top-k via TakeOrderedAndProject."""
    from importpipeline_spark.index.build import build_logical_index
    from importpipeline_spark.index.pagesgen import gen_pages_df
    from importpipeline_spark.index.search import bm25_topk_exhaustive

    lidx = build_logical_index(gen_pages_df(spark, 400, seed=22))
    plan = plan_of(bm25_topk_exhaustive(spark, lidx, "the of", k=10))
    assert "BroadcastHashJoin" in plan
    assert "TakeOrderedAndProject" in plan


def test_mapreduce_partial_aggregation(spark):
    """PLANS.md §4: undup aggregates get map-side combine — a partial and a
    final HashAggregate pair around one exchange."""
    import __spark_entry__ as em

    plan = plan_of(em.queries()["mapreduce_undup_agg"](spark, SF_DIR))
    assert plan.count("HashAggregate") >= 2, plan


def test_contract_topk_no_global_window(spark):
    """PLANS.md §8: no contract query plans an unpartitioned WindowExec over
    unbounded input — top-k is TakeOrderedAndProject first, then the ≤k
    survivors are numbered inside one intentional single partition."""
    import __spark_entry__ as em

    for name in ("term_freq_top20", "topk_orders", "bm25_topk_docs"):
        plan = plan_of(em.queries()[name](spark, SF_DIR))
        # these queries use no window at all: rank = TakeOrderedAndProject
        # then monotonically_increasing_id in one ≤k-row partition
        assert "Window" not in plan, (
            f"{name} plans a window:\n{plan}"
        )
        assert "TakeOrderedAndProject" in plan, name


def test_global_topk_is_heap_based(spark):
    """PLANS.md §5: orderBy().limit() plans as TakeOrderedAndProject (per-
    partition heap + driver merge), not Sort + GlobalLimit over a full sort."""
    df = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .orderBy(F.col("o_totalprice").desc())
        .limit(5)
    )
    plan = plan_of(df)
    assert "TakeOrderedAndProject" in plan


def test_scan_prunes_columns(spark):
    """A 2-column projection must reach the scan as a 2-column ReadSchema —
    reading all columns for a narrow projection is wrong at any scale."""
    df = spark.read.parquet(f"{SF_DIR}/lineitem.parquet").select(
        "l_orderkey", "l_quantity"
    )
    plan = plan_of(df)
    seg = plan[plan.index("ReadSchema"):].splitlines()[0]
    assert "l_orderkey" in seg and "l_quantity" in seg
    assert "l_comment" not in seg and "l_shipdate" not in seg


def test_ngram_cap_clean_plan_untouched(spark):
    """PLANS.md §9: the eager hot-shingle detection must leave the candidate
    plan UNTOUCHED when nothing is hot — no size aggregation, no semi/anti
    join beyond the one inverted-index self-join."""
    from importpipeline_spark.operators.dedup import ngram_jaccard_pairs

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    got = ngram_jaccard_pairs(docs, "text", "doc_id", n=3, threshold=0.5)
    assert got.cap_reports[0].dropped_buckets == 0
    plan = plan_of(got)
    assert "LeftSemi" not in plan and "LeftAnti" not in plan, plan


def test_pretrain_ops_plan_shapes(spark):
    """PLANS.md §15: repetition = two exchanges (unit partial-agg + per-doc
    agg), zero windows; corpus_sample = pure map-side filter, zero
    exchanges; contamination joins never plan a cartesian product."""
    import __spark_entry__ as entry_mod

    rep = entry_mod.queries()["repetition_signals"](spark, SF_DIR)
    plan = plan_of(rep)
    # formatted mode prints each operator in the tree AND the details block;
    # "Exchange (" matches only the tree lines — one per exchange
    assert plan.count("Exchange (") == 2, plan
    assert "Window" not in plan

    samp = entry_mod.queries()["corpus_sample"](spark, SF_DIR)
    plan = plan_of(samp)
    assert "Exchange" not in plan, plan

    cont = entry_mod.queries()["contamination_screen"](spark, SF_DIR)
    plan = plan_of(cont)
    assert "Cartesian" not in plan and "BroadcastNestedLoop" not in plan


def test_minhash_verification_single_shingle_pass(spark):
    """The exact-Jaccard verification joins the shingle relation on BOTH
    candidate sides (id_a and id_b); it must be computed once and served
    from cache — two independent corpus shingling scans at 100 TB was
    VERDICT r3 'What's wrong #3'."""
    from importpipeline_spark.operators.dedup import (
        minhash_lsh_pairs,
        release_cache,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").limit(200)
    got = minhash_lsh_pairs(docs, "text", "doc_id", num_hashes=16, bands=8)
    plan = plan_of(got)
    # both verification join sides read the persisted shingle relation:
    # formatted-plan tree has (at least) two InMemoryTableScan entries over
    # the sh cache + one over the signature cache, and NO un-cached
    # re-shingling (a second Project computing word_shingles would appear
    # as a scan of the documents parquet outside the cached subtrees)
    assert plan.count("InMemoryTableScan") >= 3, plan
    assert len(got.cached_deps) == 2
    release_cache(got)


def _nodes_above_cache(df):
    """Physical-plan node names from the root down to (and including) the
    first InMemoryTableScan on each branch — i.e. everything OUTSIDE the
    cached subtree. An Exchange here means the cache's partitioning was not
    reused."""
    node = df._jdf.queryExecution().executedPlan()
    if node.nodeName() == "AdaptiveSparkPlan":
        node = node.initialPlan()
    names = []

    def rec(n):
        nm = n.nodeName()
        names.append(nm)
        if "InMemoryTableScan" in nm:
            return
        ch = n.children()
        for i in range(ch.size()):
            rec(ch.apply(i))

    rec(node)
    return names


def test_build_outputs_share_one_exchange(spark):
    """r6 (VERDICT r5 #2): write_index's outputs — postings cogroup, docs
    table, doclen — all derive from ONE corpus-volume exchange (the
    shard repartition that feeds the cache). The cogroup's two sides and
    both writes must sit directly on the cached partitioning with no
    further Exchange; a regression re-introduces a full-text shuffle per
    output at 100 TB."""
    from importpipeline_spark.index.build import build_docs_and_tf, shard_of
    from importpipeline_spark.index.pagesgen import gen_pages_df
    from importpipeline_spark.index.store import _postings_from_sharded

    pages = gen_pages_df(spark, 200, seed=5)
    fused = build_docs_and_tf(pages)
    sharded = (
        fused.withColumn("shard", shard_of(F.col("doc_id"), 4))
        .repartition(4, "shard")
        .persist()
    )
    try:
        sharded.count()
        cg = _nodes_above_cache(_postings_from_sharded(sharded))
        assert "FlatMapCoGroupsInPandas" in cg, cg
        assert sum("InMemoryTableScan" in n for n in cg) == 2, cg
        assert not any("Exchange" in n for n in cg), cg

        docs_write = _nodes_above_cache(sharded.drop("tf_pairs"))
        assert not any("Exchange" in n for n in docs_write), docs_write

        dl_write = _nodes_above_cache(
            sharded.select("shard", "doc_id", "doc_len")
            .sortWithinPartitions("doc_id")
        )
        assert not any("Exchange" in n for n in dl_write), dl_write
    finally:
        sharded.unpersist()
