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


def test_crash_recovery_mid_update(spark, tmp_path):
    """Kill at the worst windows of update_index → recover_update restores a
    consistent index; re-applying the snapshot completes the update and
    matches a full rebuild."""
    import json
    import os
    import shutil

    from importpipeline_spark.index.segments import recover_update

    root = str(tmp_path / "crashidx")
    snap1 = gen_pages_df(spark, 200, seed=42, partitions=4)
    write_index(spark, snap1, root, n_shards=4)
    snap2 = gen_pages_df(spark, 230, seed=42, partitions=4)

    # window A: crash right after the docs swap + marker (postings stale)
    # simulate: do the merge/swap by hand the way update_index orders it
    docs = os.path.join(root, "docs")
    changed = snap2.join(
        spark.read.parquet(docs).select("url"), "url", "left_anti"
    )
    from importpipeline_spark.index.build import build_docs_safe, shard_of
    from pyspark.sql import functions as F

    cdocs, _ = build_docs_safe(changed)
    cdocs = cdocs.drop("tokens")
    affected = sorted(
        int(r.s)
        for r in cdocs.select(shard_of(F.col("doc_id"), 4).alias("s"))
        .distinct().collect()
    )
    # mirror the real staging (r5 partitioned docs layout: logical schema
    # has no shard column; the staged tmp is written partitioned by it)
    merged = spark.read.parquet(docs).drop("shard").unionByName(cdocs)
    (
        merged.withColumn("shard", shard_of(F.col("doc_id"), 4))
        .write.mode("overwrite").partitionBy("shard").parquet(docs + ".tmp")
    )
    with open(os.path.join(root, "update.json"), "w") as f:
        json.dump({"affected": affected, "n_shards": 4,
                   "run_id": "crash", "input_snapshot": "snap2"}, f)
    os.rename(docs, docs + ".old")
    os.rename(docs + ".tmp", docs)
    # --- "crash" here: docs merged, marker present, postings stale ---
    assert recover_update(spark, root)
    assert not os.path.exists(os.path.join(root, "update.json"))

    # recovered index must equal a full rebuild over snap2
    full_root = str(tmp_path / "fullidx")
    pidx_full = write_index(spark, snap2, full_root, n_shards=4)
    from importpipeline_spark.index.store import open_index

    pidx_rec = open_index(root)
    assert pidx_rec.stats["n_docs"] == pidx_full.stats["n_docs"] == 230
    for q in ("the", "of and", "ebakaba8"):
        a = bm25_topk_wand(spark, pidx_rec, q, k=10).collect()
        b = bm25_topk_wand(spark, pidx_full, q, k=10).collect()
        assert [(r.doc_id, r.score) for r in a] == [(r.doc_id, r.score) for r in b]

    # window B: docs dir missing mid-rename → rolled forward from tmp
    os.rename(docs, docs + ".tmp")
    assert recover_update(spark, root)
    assert os.path.exists(docs)


def test_noop_update(indexes, spark):
    pidx_inc, _ = indexes
    # re-applying the same snapshot changes nothing (all ExistSame)
    before = pidx_inc.stats["n_docs"]
    snap2 = _snapshot2(spark)
    out = update_index(spark, pidx_inc.root, snap2, run_id="run3")
    assert out.stats["n_docs"] == before


def _topk(spark, pidx, k=10):
    return [
        (r.doc_id, r.score)
        for q in QUERIES
        for r in bm25_topk_wand(spark, pidx, q, k=k).collect()
    ]


def test_published_update_snapshot_isolation(spark, tmp_path):
    """Readers see the OLD index or the NEW index, never a mix: a reader that
    resolved CURRENT before an update keeps complete pre-update results; a
    crash mid-update leaves CURRENT (and its generation) untouched."""
    import os

    from importpipeline_spark.index import segments as seg
    from importpipeline_spark.index.segments import (
        init_published_index,
        open_current_index,
        update_index_published,
    )

    store = str(tmp_path / "store")
    snap1 = gen_pages_df(spark, N1, seed=42, partitions=8)
    init_published_index(spark, snap1, store, n_shards=8)

    reader_old = open_current_index(store)  # resolves CURRENT now
    before = _topk(spark, reader_old)

    # crash mid-update (after the docs swap inside the new generation,
    # before the delta-generation commit): CURRENT must not move and the
    # old generation must stay fully intact
    real_commit = seg._commit_delta_gen
    def boom(*a, **kw):
        raise RuntimeError("injected mid-update crash")
    seg._commit_delta_gen = boom
    try:
        with pytest.raises(RuntimeError, match="injected"):
            update_index_published(spark, store, _snapshot2(spark))
    finally:
        seg._commit_delta_gen = real_commit
    assert open_current_index(store).root == reader_old.root
    assert _topk(spark, open_current_index(store)) == before

    # successful update: the pre-flip reader still serves complete OLD
    # results from its immutable generation; a fresh reader sees the NEW one
    pidx_new = update_index_published(spark, store, _snapshot2(spark))
    assert _topk(spark, reader_old) == before
    reader_new = open_current_index(store)
    assert reader_new.root == pidx_new.root != reader_old.root
    assert reader_new.stats["n_docs"] == N1 + N_NEW

    # the new generation is rank-identical to an in-place update (same
    # engine path), and the old generation was GC-able only after publish
    gens = [d for d in os.listdir(store) if d.startswith("gen=")]
    assert len(gens) == 2  # keep_generations=2: old + new retained


def test_published_gc_protects_live_generation(spark, tmp_path):
    """An orphaned generation dir (hard-killed update) must not count toward
    keep_generations and evict the predecessor readers still hold."""
    import os

    from importpipeline_spark.index.segments import (
        init_published_index,
        open_current_index,
        update_index_published,
    )

    store = str(tmp_path / "store")
    snap1 = gen_pages_df(spark, 50, seed=42, partitions=2)
    gen_a = init_published_index(spark, snap1, store, n_shards=4).root
    # fake a crash orphan that sorts NEWEST (worst case for naive keep-last-k)
    orphan = os.path.join(store, "gen=99999999_999999_999999")
    os.makedirs(orphan)
    snap2 = gen_pages_df(spark, 60, seed=42, partitions=2)
    gen_b = update_index_published(spark, store, snap2, keep_generations=2).root
    assert os.path.isdir(gen_a), "live predecessor evicted by orphan"
    assert os.path.isdir(gen_b)
    assert not os.path.isdir(orphan), "crash orphan not cleaned"
    assert open_current_index(store).root == gen_b


def test_delete_from_index_rank_identical(spark, tmp_path):
    """Deleting docs re-encodes only their shards; results equal a full
    rebuild over the surviving corpus — including df/idf shifts (deleted
    docs must stop matching AND stop influencing scores)."""
    from pyspark.sql import functions as SF

    from importpipeline_spark.index.segments import delete_from_index

    root = str(tmp_path / "delidx")
    pages = gen_pages_df(spark, 300, seed=42, partitions=4)
    write_index(spark, pages, root, n_shards=4)

    # delete 40 docs, deliberately including current top hits for 'the'
    top = bm25_topk_wand(
        spark, __import__("importpipeline_spark.index.store",
                          fromlist=["open_index"]).open_index(root),
        "the", k=5,
    ).collect()
    doomed_ids = {r.doc_id for r in top[:3]}
    docs = spark.read.parquet(f"{root}/docs")
    doomed_urls = docs.where(SF.col("doc_id").isin(list(doomed_ids))).select("url")
    more = docs.orderBy("doc_id").limit(37).select("url")
    # materialize: the lazy plan references the pre-delete docs files, which
    # the delete replaces — re-evaluating it afterwards would read gone files
    urls = sorted({r.url for r in doomed_urls.unionByName(more).collect()})
    del_urls = spark.createDataFrame([(u,) for u in urls], "url string")
    n_del = len(urls)

    pidx = delete_from_index(spark, root, del_urls)
    assert pidx.stats["n_docs"] == 300 - n_del

    survivors = pages.join(del_urls, "url", "left_anti")
    full_root = str(tmp_path / "delfull")
    pidx_full = write_index(spark, survivors, full_root, n_shards=4)
    assert pidx.stats["avgdl"] == pidx_full.stats["avgdl"]
    for q in QUERIES:
        a = bm25_topk_wand(spark, pidx, q, k=10).collect()
        b = bm25_topk_wand(spark, pidx_full, q, k=10).collect()
        assert [(r.doc_id, r.score) for r in a] == [
            (r.doc_id, r.score) for r in b
        ], q
    got_ids = {
        r.doc_id for r in bm25_topk_wand(spark, pidx, "the", k=10).collect()
    }
    assert not (got_ids & doomed_ids)

    # deleting urls that don't exist is a no-op
    ghost = spark.createDataFrame([("u_ghost",)], "url string")
    pidx2 = delete_from_index(spark, root, ghost, run_id="del2")
    assert pidx2.stats["n_docs"] == 300 - n_del


def test_update_docs_merge_is_cow_per_shard(spark, tmp_path):
    """r5 partitioned docs layout: an update's docs merge stages ONLY the
    affected shards' rows and HARD-LINKS every other shard directory —
    pinned by inode identity, so a regression to a full-corpus rewrite
    (new inodes everywhere) fails loudly. A host re-crawl on a
    host_locality index must also touch only that host's shard(s)."""
    import os

    from importpipeline_spark.index.pagesgen import gen_pages_df

    root = str(tmp_path / "cowidx")
    pages = gen_pages_df(spark, 2000, seed=9, partitions=8, profile="web")
    write_index(spark, pages, root, n_shards=16, write_docs=True,
                doc_id_mode="host_locality")
    docs_dir = os.path.join(root, "docs")

    def inodes():
        out = {}
        for d in os.listdir(docs_dir):
            if d.startswith("shard="):
                p = os.path.join(docs_dir, d)
                out[d] = {f: os.stat(os.path.join(p, f)).st_ino
                          for f in os.listdir(p) if f.endswith(".parquet")}
        return out

    before = inodes()
    assert len(before) >= 2, "web corpus must span multiple shard dirs"

    host = F.parse_url(F.col("url"), F.lit("HOST"))
    top = (pages.groupBy(host.alias("h")).count()
           .orderBy(F.col("count").desc(), F.col("h").asc()).first())
    upd = pages.where(host == top["h"]).withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 2 HOURS"))
    pidx = update_index(spark, root, upd, run_id="cow1", input_snapshot="c1")
    after = inodes()

    rewritten = [d for d in before if after.get(d) != before[d]]
    hard_linked = [d for d in before if after.get(d) == before[d]]
    # one host -> one contiguous id range -> at most 2 boundary shards
    assert 1 <= len(rewritten) <= 2, (rewritten, hard_linked)
    assert hard_linked, "unaffected shards must be linked, not rewritten"
    assert pidx.stats["n_docs"] == 2000

    # the merged table still reads back complete and url-unique
    from importpipeline_spark.index.store import read_docs

    docs = read_docs(spark, root)
    assert docs.count() == 2000
    assert docs.select("url").distinct().count() == 2000
    assert "shard" not in docs.columns


def test_termdf_sidecar_dictionary_is_postings_free(indexes, spark, tmp_path):
    """r6 (VERDICT r5 #3): the update path's dictionary derives from the
    per-shard term-df sidecars ONLY — content-identical to the full
    rebuild's dictionary, and computable with the postings directory moved
    away (proves the refresh never scans block metadata across shards)."""
    import os

    from importpipeline_spark.index.segments import (
        _derive_dictionary_from_sidecars,
    )

    pidx_inc, pidx_full = indexes

    def frame(root):
        df = spark.read.parquet(os.path.join(root, "terms"))
        return sorted((r.term, r.df, tuple(r.shards)) for r in df.collect())

    upd = frame(pidx_inc.root)
    assert upd == frame(pidx_full.root)

    moved = os.path.join(pidx_inc.root, "postings_moved")
    os.rename(os.path.join(pidx_inc.root, "postings"), moved)
    try:
        out = str(tmp_path / "terms_chk")
        _derive_dictionary_from_sidecars(spark, pidx_inc.root, out)
        chk = sorted(
            (r.term, r.df, tuple(r.shards))
            for r in spark.read.parquet(out).collect()
        )
    finally:
        os.rename(moved, os.path.join(pidx_inc.root, "postings"))
    assert chk == upd


def test_termdf_update_touches_only_affected_shards(spark, tmp_path):
    """A narrow (host-bursty) REBUILD-strategy update must leave every
    unaffected shard's term-df sidecar file untouched on disk (same
    inodes) — the sidecar refresh is O(affected shards), like the docs COW
    merge. (The default delta strategy is stricter still — it touches NO
    base sidecar at all — pinned in test_delta_segments.py.)"""
    import os

    from importpipeline_spark.index.pagesgen import gen_pages_df

    root = str(tmp_path / "tdidx")
    pages = gen_pages_df(spark, 2000, seed=9, partitions=8, profile="web")
    write_index(spark, pages, root, n_shards=16, write_docs=True,
                doc_id_mode="host_locality")
    td_dir = os.path.join(root, "termdf")

    def inodes():
        out = {}
        for d in os.listdir(td_dir):
            if d.startswith("shard="):
                p = os.path.join(td_dir, d)
                out[d] = {f: os.stat(os.path.join(p, f)).st_ino
                          for f in os.listdir(p) if f.endswith(".parquet")}
        return out

    before = inodes()
    assert len(before) >= 2
    host = F.parse_url(F.col("url"), F.lit("HOST"))
    top = (pages.groupBy(host.alias("h")).count()
           .orderBy(F.col("count").desc(), F.col("h").asc()).first())
    upd = pages.where(host == top["h"]).withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 2 HOURS"))
    update_index(spark, root, upd, run_id="td1", input_snapshot="t1",
                 strategy="rebuild")
    after = inodes()
    rewritten = [d for d in before if after.get(d) != before[d]]
    untouched = [d for d in before if after.get(d) == before[d]]
    assert 1 <= len(rewritten) <= 2, (rewritten, untouched)
    assert untouched


def test_termdf_migration_on_legacy_index(spark, tmp_path):
    """An index without sidecars (pre-r6 layout) migrates at its first
    update: termdf is backfilled for ALL shards from the post-rebuild
    postings and the dictionary still matches a full rebuild."""
    import os
    import shutil

    from importpipeline_spark.index.pagesgen import gen_pages_df

    root = str(tmp_path / "legacy")
    pages = gen_pages_df(spark, 200, seed=3, partitions=4)
    write_index(spark, pages, root, n_shards=4)
    shutil.rmtree(os.path.join(root, "termdf"))  # simulate pre-r6 index

    upd = pages.where(F.xxhash64("url") % 5 == 0).withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 2 HOURS"))
    update_index(spark, root, upd, run_id="mig1", input_snapshot="m1")
    assert os.path.isdir(os.path.join(root, "termdf"))

    full_root = str(tmp_path / "legacy_full")
    write_index(spark, pages.join(upd.select("url"), "url", "left_anti")
                .unionByName(upd), full_root, n_shards=4)

    def frame(r):
        df = spark.read.parquet(os.path.join(r, "terms"))
        return sorted((x.term, x.df, tuple(x.shards)) for x in df.collect())

    assert frame(root) == frame(full_root)


def test_update_existence_probe_is_partition_pruned(spark, tmp_path):
    """r6: the update path's existence probe (classify/incremental_pages)
    scans ONLY the shards the incoming urls' ids map to — doc_id = f(url)
    is deterministic, so an existing copy cannot live anywhere else. Pinned
    two ways: the physical plan carries a shard PartitionFilter, and the
    pruned classification equals the unpruned one."""
    import io
    import os
    from contextlib import redirect_stdout

    from importpipeline_spark.index.pagesgen import gen_pages_df
    from importpipeline_spark.index.segments import (
        _docs_pruned_to_shards,
        _shards_of_urls,
        incremental_pages,
    )
    from importpipeline_spark.index.store import read_docs

    root = str(tmp_path / "pruneidx")
    pages = gen_pages_df(spark, 1000, seed=4, partitions=8, profile="web")
    write_index(spark, pages, root, n_shards=16, write_docs=True,
                doc_id_mode="host_locality")

    host = F.parse_url(F.col("url"), F.lit("HOST"))
    top = (pages.groupBy(host.alias("h")).count()
           .orderBy(F.col("count").desc(), F.col("h").asc()).first())
    upd = pages.where(host == top["h"]).withColumn(
        "warc_ts", F.col("warc_ts") + F.expr("INTERVAL 2 HOURS"))

    in_shards = _shards_of_urls(upd, "host_locality", 16)
    assert 1 <= len(in_shards) <= 2  # one host → contiguous id range
    old_docs = read_docs(spark, root)
    probe = _docs_pruned_to_shards(spark, root, old_docs, in_shards)

    buf = io.StringIO()
    with redirect_stdout(buf):
        incremental_pages(upd, probe).explain("formatted")
    plan = buf.getvalue()
    assert "PartitionFilters" in plan
    assert "shard" in plan.split("PartitionFilters", 1)[1][:200], plan

    got = sorted(r.url for r in incremental_pages(upd, probe).collect())
    want = sorted(r.url for r in incremental_pages(upd, old_docs).collect())
    assert got == want and len(got) == int(top["count"])

    # and the full update over the pruned path stays rank-identical
    pidx = update_index(spark, root, upd, run_id="pr1", input_snapshot="p1")
    merged = pages.join(upd.select("url"), "url", "left_anti").unionByName(upd)
    full_root = str(tmp_path / "prunefull")
    pidx_full = write_index(spark, merged, full_root, n_shards=16,
                            write_docs=True, doc_id_mode="host_locality")
    a = [(r.doc_id, round(r.score, 6))
         for r in bm25_topk_wand(spark, pidx, "the", k=10).collect()]
    b = [(r.doc_id, round(r.score, 6))
         for r in bm25_topk_wand(spark, pidx_full, "the", k=10).collect()]
    assert a == b
