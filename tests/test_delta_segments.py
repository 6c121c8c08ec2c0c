"""LSM-style delta segments (r7): update/delete cost O(update bytes).

The delta strategy (segments.update_index / delete_from_index default)
writes each change as an immutable per-shard delta generation — same codec
as the base — plus signed term-df adjustments; query kernels mask shadowed
base entries via the owner-generation rule (deltas.py) and compaction folds
deltas back into the base (the reference's delegated ES/Lucene segment
model incl. optimize-to-N — ESIndexDefinitions.cs:452-458).

Pinned here: the base segment is never touched by a delta update (inode
identity across ALL shards), rank/score/dictionary identity with a full
rebuild across multiple generations and deletes, every crash window of the
commit protocol, the compaction threshold, and delete-then-re-add.
(The default-strategy rank-identity and COW/docs tests in
test_incremental_update.py exercise this path too.)
"""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from importpipeline_spark.index import deltas as dmod
from importpipeline_spark.index import segments as seg
from importpipeline_spark.index.pagesgen import gen_pages_df
from importpipeline_spark.index.segments import (
    compact_deltas,
    delete_from_index,
    recover_update,
    update_index,
)
from importpipeline_spark.index.serve import LocalSearcher
from importpipeline_spark.index.store import open_index, write_index
from importpipeline_spark.index.wand import bm25_topk_wand

QUERIES = ["the", "of and", "ebakaba8", "the ebakaba8 equababa1"]


def _topk(spark, pidx, k=10):
    return [
        (r.doc_id, r.score)
        for q in QUERIES
        for r in bm25_topk_wand(spark, pidx, q, k=k).collect()
    ]


def _terms(spark, root):
    df = __import__("pyspark.sql", fromlist=["x"])  # noqa: F841 (readable)
    rows = spark.read.parquet(os.path.join(root, "terms")).collect()
    return sorted((r.term, r.df, tuple(r.shards)) for r in rows)


def _recrawl(pages, frac_mod: int, hours: int):
    return pages.where(F.xxhash64("url") % frac_mod == 0).withColumn(
        "warc_ts", F.col("warc_ts") + F.expr(f"INTERVAL {hours} HOURS")
    )


def _inodes(root, table):
    out = {}
    base = os.path.join(root, table)
    for d in os.listdir(base):
        if d.startswith("shard="):
            p = os.path.join(base, d)
            out[d] = {
                f: os.stat(os.path.join(p, f)).st_ino
                for f in os.listdir(p)
                if f.endswith(".parquet")
            }
    return out


def test_delta_update_leaves_base_segment_untouched(spark, tmp_path):
    """The whole point of the LSM path: an update rewrites NO base postings,
    doclen, or termdf file in ANY shard (inode identity everywhere), yet
    stays rank-identical to a full rebuild — so update compute is bounded by
    the update, not the affected shards."""
    root = str(tmp_path / "idx")
    pages = gen_pages_df(spark, 300, seed=7, partitions=4)
    write_index(spark, pages, root, n_shards=4)
    before = {t: _inodes(root, t) for t in ("postings", "doclen", "termdf")}

    upd = _recrawl(pages, 5, 2)
    n_upd = upd.count()
    assert n_upd > 10
    pidx = update_index(spark, root, upd, run_id="d1", input_snapshot="s1")

    after = {t: _inodes(root, t) for t in ("postings", "doclen", "termdf")}
    assert after == before, "delta update must not rewrite any base file"
    assert pidx.stats["delta_gens"] == [1]
    assert os.path.isdir(os.path.join(root, "delta_postings", "gen=1"))
    assert os.path.isdir(os.path.join(root, "delta_doclen", "gen=1"))
    assert os.path.isdir(os.path.join(root, "delta_termdf", "gen=1"))

    full_root = str(tmp_path / "full")
    merged = pages.join(upd.select("url"), "url", "left_anti").unionByName(upd)
    pidx_full = write_index(spark, merged, full_root, n_shards=4)
    assert pidx.stats["n_docs"] == pidx_full.stats["n_docs"] == 300
    assert pidx.stats["avgdl"] == pidx_full.stats["avgdl"]
    assert _topk(spark, pidx) == _topk(spark, pidx_full)
    assert _terms(spark, root) == _terms(spark, full_root)


def test_multi_generation_delete_and_readd(spark, tmp_path):
    """Three generations (update, delete, re-add) stay rank/dictionary-
    identical to a full rebuild at every step; a deleted doc is masked out
    of every older segment and comes back searchable when re-added."""
    root = str(tmp_path / "idx")
    pages = gen_pages_df(spark, 250, seed=11, partitions=4)
    write_index(spark, pages, root, n_shards=4)

    # gen 1: recrawl a slice with donor content
    donor = gen_pages_df(spark, 250, seed=77, partitions=4).select(
        "url", F.col("html").alias("d_html"), F.col("text").alias("d_text")
    )
    upd = (
        pages.join(donor, "url")
        .where(F.xxhash64("url") % 4 == 0)
        .select(
            "url",
            (F.col("warc_ts") + F.expr("INTERVAL 1 DAY")).alias("warc_ts"),
            F.col("d_html").alias("html"),
            F.col("d_text").alias("text"),
            "lang",
        )
    )
    pidx = update_index(spark, root, upd, run_id="g1", input_snapshot="g1")
    corpus = pages.join(upd.select("url"), "url", "left_anti").unionByName(upd)

    # gen 2: delete 30 docs, deliberately including updated ones
    del_urls_list = sorted(
        r.url
        for r in spark.read.parquet(os.path.join(root, "docs"))
        .orderBy("doc_id").limit(30).select("url").collect()
    )
    del_urls = spark.createDataFrame([(u,) for u in del_urls_list], "url string")
    pidx = delete_from_index(spark, root, del_urls, run_id="g2")
    corpus = corpus.join(del_urls, "url", "left_anti")
    assert pidx.stats["delta_gens"] == [1, 2]
    full_root = str(tmp_path / "full2")
    pidx_full = write_index(spark, corpus, full_root, n_shards=4)
    assert pidx.stats["n_docs"] == pidx_full.stats["n_docs"]
    assert pidx.stats["avgdl"] == pidx_full.stats["avgdl"]
    assert _topk(spark, pidx) == _topk(spark, pidx_full)
    assert _terms(spark, root) == _terms(spark, full_root)

    # gen 3: re-add 10 of the deleted urls (NotExist again) with new content
    readd = (
        pages.join(
            spark.createDataFrame(
                [(u,) for u in del_urls_list[:10]], "url string"
            ),
            "url",
        )
        .withColumn("warc_ts", F.col("warc_ts") + F.expr("INTERVAL 3 DAY"))
    )
    pidx = update_index(spark, root, readd, run_id="g3", input_snapshot="g3")
    corpus = corpus.unionByName(readd)
    assert pidx.stats["delta_gens"] == [1, 2, 3]
    full_root = str(tmp_path / "full3")
    pidx_full = write_index(spark, corpus, full_root, n_shards=4)
    assert pidx.stats["n_docs"] == pidx_full.stats["n_docs"]
    assert _topk(spark, pidx) == _topk(spark, pidx_full)
    assert _terms(spark, root) == _terms(spark, full_root)

    # the driver-local searcher reads the same delta state bit-identically
    ls = LocalSearcher(root)
    for q in QUERIES:
        assert ls.search(q, k=10) == [
            (r.doc_id, r.score)
            for r in bm25_topk_wand(spark, pidx_full, q, k=10).collect()
        ]


def test_delta_crash_windows_roll_forward_or_back(spark, tmp_path):
    """Every kill window of the delta commit protocol recovers to a
    consistent state: pre-marker → clean rollback (staging swept); between
    marker and docs swap → rolled forward; post-swap pre-commit → rolled
    forward. Forward recoveries match a full rebuild exactly."""
    snap1 = gen_pages_df(spark, 200, seed=42, partitions=4)
    snap2 = gen_pages_df(spark, 230, seed=42, partitions=4)
    full_root = str(tmp_path / "full")
    want = _topk(spark, write_index(spark, snap2, full_root, n_shards=4))

    # window: post-swap, pre-delta-commit
    root = str(tmp_path / "c")
    write_index(spark, snap1, root, n_shards=4)
    real_commit = seg._commit_delta_gen

    def boom(*a, **kw):
        raise RuntimeError("injected")

    seg._commit_delta_gen = boom
    try:
        with pytest.raises(RuntimeError, match="injected"):
            update_index(spark, root, snap2)
    finally:
        seg._commit_delta_gen = real_commit
    assert os.path.exists(os.path.join(root, "update.json"))
    assert recover_update(spark, root)
    pidx = open_index(root)
    assert pidx.stats["n_docs"] == 230 and pidx.stats["delta_gens"] == [1]
    assert _topk(spark, pidx) == want

    # window: marker written, docs swap not yet performed
    root = str(tmp_path / "b")
    write_index(spark, snap1, root, n_shards=4)
    real_swap = seg._swap_docs_under_marker

    def swap_crash(r, payload):
        marker = seg._update_marker(r)
        with open(marker + ".tmp", "w") as f:
            json.dump(payload, f)
        os.replace(marker + ".tmp", marker)
        raise RuntimeError("injected-preswap")

    seg._swap_docs_under_marker = swap_crash
    try:
        with pytest.raises(RuntimeError, match="injected-preswap"):
            update_index(spark, root, snap2)
    finally:
        seg._swap_docs_under_marker = real_swap
    assert recover_update(spark, root)
    pidx = open_index(root)
    assert pidx.stats["n_docs"] == 230
    assert _topk(spark, pidx) == want

    # window: staging done but no marker → rollback; re-apply completes
    root = str(tmp_path / "a")
    write_index(spark, snap1, root, n_shards=4)
    real_stage = seg._deltas.stage_update_delta

    def stage_crash(*a, **kw):
        real_stage(*a, **kw)
        raise RuntimeError("injected-premarker")

    seg._deltas.stage_update_delta = stage_crash
    try:
        with pytest.raises(RuntimeError, match="injected-premarker"):
            update_index(spark, root, snap2)
    finally:
        seg._deltas.stage_update_delta = real_stage
    assert not os.path.exists(os.path.join(root, "update.json"))
    recover_update(spark, root)
    assert not os.path.isdir(os.path.join(root, "delta_staging"))
    assert open_index(root).stats["n_docs"] == 200  # clean pre-update state
    pidx = update_index(spark, root, snap2)
    assert pidx.stats["n_docs"] == 230 and _topk(spark, pidx) == want


def test_compaction_folds_and_auto_triggers(spark, tmp_path):
    """compact_deltas folds every generation into the base (delta_gens
    empties, delta dirs gone for those shards) with unchanged results; the
    per-shard generation count triggers auto-compaction at compact_after;
    a kill mid-compaction is repaired by recover_update."""
    root = str(tmp_path / "idx")
    pages = gen_pages_df(spark, 250, seed=5, partitions=4)
    write_index(spark, pages, root, n_shards=4)

    corpus = pages
    for i in range(2):
        upd = _recrawl(pages, 6 + i, i + 1)
        update_index(spark, root, upd, run_id=f"u{i}", input_snapshot=f"s{i}",
                     compact_after=None)
        corpus = corpus.join(upd.select("url"), "url", "left_anti").unionByName(upd)
    pidx = open_index(root)
    assert pidx.stats["delta_gens"] == [1, 2]

    # kill mid-compaction → marker-driven recovery completes the fold
    real_rb = seg._rebuild_shards

    def rb_crash(*a, **kw):
        raise RuntimeError("injected-compact")

    seg._rebuild_shards = rb_crash
    try:
        with pytest.raises(RuntimeError, match="injected-compact"):
            compact_deltas(spark, root)
    finally:
        seg._rebuild_shards = real_rb
    assert recover_update(spark, root)
    pidx = open_index(root)
    assert pidx.stats["delta_gens"] == []
    assert not dmod.shard_gen_map(root)

    full_root = str(tmp_path / "full")
    pidx_full = write_index(spark, corpus, full_root, n_shards=4)
    assert _topk(spark, pidx) == _topk(spark, pidx_full)
    assert _terms(spark, root) == _terms(spark, full_root)

    # auto-compaction: third update with compact_after=3 folds its shards
    upd = _recrawl(pages, 3, 9)
    for i in range(3):
        u = upd.withColumn("warc_ts",
                           F.col("warc_ts") + F.expr(f"INTERVAL {i} MINUTE"))
        pidx = update_index(spark, root, u, run_id=f"a{i}",
                            input_snapshot=f"as{i}", compact_after=3)
        corpus = corpus.join(u.select("url"), "url", "left_anti").unionByName(u)
    sgm = dmod.shard_gen_map(root)
    assert all(len(g) < 3 for g in sgm.values()), sgm
    full_root2 = str(tmp_path / "full2")
    assert _topk(spark, pidx) == _topk(
        spark, write_index(spark, corpus, full_root2, n_shards=4)
    )


def test_delete_only_generation_masks_without_postings(spark, tmp_path):
    """A delete writes no delta postings — only doclen tombstones + termdf
    decrements — and the readers (distributed + local) handle a generation
    with a missing delta_postings table."""
    root = str(tmp_path / "idx")
    pages = gen_pages_df(spark, 200, seed=13, partitions=4)
    write_index(spark, pages, root, n_shards=4)
    urls = sorted(
        r.url
        for r in spark.read.parquet(os.path.join(root, "docs"))
        .orderBy("doc_id").limit(25).select("url").collect()
    )
    del_urls = spark.createDataFrame([(u,) for u in urls], "url string")
    pidx = delete_from_index(spark, root, del_urls)
    assert pidx.stats["delta_gens"] == [1]
    assert not os.path.isdir(os.path.join(root, "delta_postings", "gen=1"))
    assert os.path.isdir(os.path.join(root, "delta_doclen", "gen=1"))

    survivors = pages.join(del_urls, "url", "left_anti")
    full_root = str(tmp_path / "full")
    pidx_full = write_index(spark, survivors, full_root, n_shards=4)
    assert pidx.stats["n_docs"] == pidx_full.stats["n_docs"]
    assert pidx.stats["avgdl"] == pidx_full.stats["avgdl"]
    assert _topk(spark, pidx) == _topk(spark, pidx_full)
    assert _terms(spark, root) == _terms(spark, full_root)
    ls = LocalSearcher(root)
    for q in QUERIES:
        assert ls.search(q, k=10) == [
            (r.doc_id, r.score)
            for r in bm25_topk_wand(spark, pidx_full, q, k=10).collect()
        ]


def test_forced_sweep_masks_shadowed_docs(spark, tmp_path, monkeypatch):
    """The interval-sweep branch (normally reserved for >500k-posting
    candidate sets) must apply owner-generation masking identically to the
    exhaustive branch: force it on a delta index (update + delete
    generations) and require bit-identity with a full rebuild, through
    both the distributed kernel and the local searcher. Overlapping
    base/delta blocks of the same term also exercise the sweep's interval
    arithmetic under range overlap."""
    import importpipeline_spark.index.wand as wand_mod

    root = str(tmp_path / "idx")
    pages = gen_pages_df(spark, 250, seed=21, partitions=4)
    write_index(spark, pages, root, n_shards=4)
    upd = _recrawl(pages, 4, 5)
    update_index(spark, root, upd, run_id="fs1", input_snapshot="fs1")
    corpus = pages.join(upd.select("url"), "url", "left_anti").unionByName(upd)
    del_urls_list = sorted(
        r.url
        for r in spark.read.parquet(os.path.join(root, "docs"))
        .orderBy("doc_id").limit(20).select("url").collect()
    )
    del_urls = spark.createDataFrame([(u,) for u in del_urls_list], "url string")
    pidx = delete_from_index(spark, root, del_urls, run_id="fs2")
    corpus = corpus.join(del_urls, "url", "left_anti")
    assert pidx.stats["delta_gens"] == [1, 2]

    full_root = str(tmp_path / "full")
    pidx_full = write_index(spark, corpus, full_root, n_shards=4)

    monkeypatch.setattr(wand_mod, "_EXHAUSTIVE_CUTOFF", 0)
    assert _topk(spark, pidx) == _topk(spark, pidx_full)
    ls = LocalSearcher(root)
    for q in QUERIES:
        got = ls.search(q, k=10)
        want = [
            (r.doc_id, r.score)
            for r in bm25_topk_wand(spark, pidx_full, q, k=10).collect()
        ]
        assert got == want, q
        # the sweep must actually have run (blocks candidate accounting on)
        assert ls.last_stats["blocks_total"] > 0


def test_compact_published_snapshot_isolated(spark, tmp_path):
    """Compaction on the published lifecycle happens in a NEW generation:
    a reader holding the pre-compaction CURRENT keeps serving its delta-
    bearing snapshot unchanged, the new generation is fully folded, and
    results are identical on both."""
    from importpipeline_spark.index.segments import (
        compact_index_published,
        init_published_index,
        open_current_index,
        update_index_published,
    )

    store = str(tmp_path / "store")
    pages = gen_pages_df(spark, 200, seed=31, partitions=4)
    init_published_index(spark, pages, store, n_shards=4)
    upd = _recrawl(pages, 5, 1)
    update_index_published(spark, store, upd)

    reader_old = open_current_index(store)
    assert reader_old.stats["delta_gens"] == [1]
    before = _topk(spark, reader_old)

    pidx_c = compact_index_published(spark, store)
    assert pidx_c.stats["delta_gens"] == []
    reader_new = open_current_index(store)
    assert reader_new.root != reader_old.root
    assert reader_new.stats["delta_gens"] == []
    assert not dmod.shard_gen_map(reader_new.root)

    # the old snapshot still serves, delta dirs intact; results identical
    assert reader_old.stats["delta_gens"] == [1]
    assert os.path.isdir(os.path.join(reader_old.root, "delta_postings"))
    assert _topk(spark, reader_old) == before
    assert _topk(spark, reader_new) == before

    # no deltas → no-op (same generation stays CURRENT)
    again = compact_index_published(spark, store)
    assert again.root == reader_new.root


def test_random_op_sequence_with_midstream_compaction(spark, tmp_path):
    """Seeded pseudo-random sequence of updates/deletes/re-adds with
    compact_after=2, so auto-compaction fires MID-sequence and later delta
    generations stack on the freshly folded base — every step must stay
    rank/stats-identical to a full rebuild of the evolving corpus. One in
    three updates uses strategy="rebuild" explicitly, interleaving the
    re-encode path (which must purge its shards' delta data) with live
    generations."""
    import random

    root = str(tmp_path / "idx")
    pages = gen_pages_df(spark, 160, seed=17, partitions=4)
    write_index(spark, pages, root, n_shards=4)
    all_urls = sorted(r.url for r in pages.select("url").collect())
    live = dict.fromkeys(all_urls, 0)  # url -> bump hours (0 = original)
    rng = random.Random(99)

    def corpus():
        gone = [u for u, b in live.items() if b is None]
        out = pages
        if gone:
            out = out.join(
                spark.createDataFrame([(u,) for u in gone], "url string"),
                "url", "left_anti",
            )
        return out

    bump = 0
    for step in range(5):
        op = rng.choice(["update", "delete", "readd"])
        if op == "update":
            alive = [u for u, b in live.items() if b is not None]
            sel = sorted(rng.sample(alive, 25))
            bump += 1
            upd = pages.join(
                spark.createDataFrame([(u,) for u in sel], "url string"), "url"
            ).withColumn(
                "warc_ts", F.col("warc_ts") + F.expr(f"INTERVAL {bump} HOURS")
            )
            strat = rng.choice(["delta", "delta", "rebuild"])
            update_index(spark, root, upd, run_id=f"r{step}",
                         input_snapshot=f"s{step}", strategy=strat,
                         compact_after=2)
            for u in sel:
                live[u] = bump
        elif op == "delete":
            alive = [u for u, b in live.items() if b is not None]
            sel = sorted(rng.sample(alive, 15))
            delete_from_index(
                spark, root,
                spark.createDataFrame([(u,) for u in sel], "url string"),
                run_id=f"r{step}", compact_after=2,
            )
            for u in sel:
                live[u] = None
        else:
            gone = [u for u, b in live.items() if b is None]
            if not gone:
                continue
            sel = sorted(rng.sample(gone, min(8, len(gone))))
            bump += 1
            upd = pages.join(
                spark.createDataFrame([(u,) for u in sel], "url string"), "url"
            ).withColumn(
                "warc_ts", F.col("warc_ts") + F.expr(f"INTERVAL {bump} HOURS")
            )
            update_index(spark, root, upd, run_id=f"r{step}",
                         input_snapshot=f"s{step}", compact_after=2)
            for u in sel:
                live[u] = bump

    # compact_after=2 must have fired at least once mid-sequence
    sgm = dmod.shard_gen_map(root)
    assert all(len(g) < 3 for g in sgm.values()), sgm

    # NOTE: bumped warc_ts never changes content here (same html), so the
    # final corpus text equals the original rows minus deletions
    pidx = open_index(root)
    full_root = str(tmp_path / "full")
    pidx_full = write_index(spark, corpus(), full_root, n_shards=4)
    assert pidx.stats["n_docs"] == pidx_full.stats["n_docs"]
    assert pidx.stats["avgdl"] == pidx_full.stats["avgdl"]
    assert _topk(spark, pidx) == _topk(spark, pidx_full)
    assert _terms(spark, root) == _terms(spark, full_root)
