"""LSM-style delta posting segments for the incremental update path.

The r1-r6 update path re-encoded every AFFECTED shard from the merged docs
table — correct and bounded, but O(affected-shard bytes) of re-tokenize +
re-encode to absorb even a 1k-doc re-crawl (the one remaining at-scale
ceiling, VERDICT r6 "What's wrong #3"). This module makes update cost
O(update bytes) by mirroring the reference's delegated ES/Lucene segment
model (immutable per-shard delta segments + query-time merge + background
compaction, incl. the exposed optimize-to-N-segments —
ImportPipeline/Endpoints/ESIndexDefinitions.cs:452-458, 195-196):

  <root>/delta_postings/gen=G/shard=N/   posting blocks, SAME codec/schema
                                         as the base segment
  <root>/delta_doclen/gen=G/shard=N/     (doc_id, doc_len) rows of the docs
                                         (re)written at generation G;
                                         doc_len = -1 is a DELETE tombstone
  <root>/delta_termdf/gen=G/shard=N/     signed (term, df) adjustments:
                                         +df of the new versions, -df of the
                                         live versions they shadow

Ownership rule (the whole merge semantics): a doc's OWNER generation is the
highest generation holding a doclen row for it (base = generation 0). Query
kernels mask a doc out of any posting block whose generation is lower than
its owner generation, and resolve doc_len from the owner row; a -1 owner row
masks the doc everywhere. Replaced docs therefore need no explicit tombstone
— their new doclen row IS the tombstone for every older posting entry.

Commit protocol: a generation is staged completely under
<root>/delta_staging/ BEFORE the update marker is written, renamed into
place after the docs swap, and becomes reader-visible only when stats.json
(atomic replace) lists it in ``delta_gens`` — the same marker + recovery
discipline as the rebuild path (segments.recover_update rolls a mid-delta
crash forward; a pre-marker crash leaves only swept staging garbage).

Compaction folds a shard's base + deltas into a fresh base segment by
re-encoding from the merged docs table — exactly the existing
``_rebuild_shards`` primitive, which purges that shard's delta subdirs in
the same marker-protected window; generations left with no shard data are
dropped from ``delta_gens``. ``segments.compact_deltas`` is the
optimize-to-N analogue, and updates auto-compact shards that accumulate
more than ``compact_after`` generations.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession, functions as F

from .build import build_tf, shard_of
from .store import POSTINGS_SCHEMA, _encode_shard

DELTA_TABLES = ("delta_postings", "delta_doclen", "delta_termdf")


def delta_table_path(root: str, table: str) -> str:
    return os.path.join(root, table)


def gen_path(root: str, table: str, gen: int) -> str:
    return os.path.join(root, table, f"gen={int(gen)}")


def staging_path(root: str, table: str) -> str:
    return os.path.join(root, "delta_staging", table)


def next_gen(stats: dict) -> int:
    """Next generation number. delta_gens only ever shrinks via compaction,
    which never renumbers, and ``last_gen`` records the high-water mark so a
    fully-compacted index does not reuse a generation number an old reader
    snapshot might still associate with removed data."""
    prev = [int(g) for g in stats.get("delta_gens", [])]
    prev.append(int(stats.get("last_gen", 0)))
    return max(prev) + 1


def committed_gens(stats: dict) -> list[int]:
    return sorted(int(g) for g in stats.get("delta_gens", []))


def discard_staging(root: str) -> None:
    shutil.rmtree(os.path.join(root, "delta_staging"), ignore_errors=True)


def commit_staged_gen(root: str, gen: int) -> None:
    """Rename staged delta tables into their gen=G directories. Idempotent:
    a prior attempt's completed renames are skipped (recovery re-runs this);
    a table with no staged data (e.g. a delete writes no postings) is simply
    absent for that generation."""
    for table in DELTA_TABLES:
        src = staging_path(root, table)
        dst = gen_path(root, table, gen)
        if os.path.isdir(dst):
            continue
        if os.path.isdir(src):
            os.makedirs(os.path.dirname(dst), exist_ok=True)
            os.rename(src, dst)
    discard_staging(root)


def shard_gen_map(root: str) -> dict:
    """shard -> set of generations holding on-disk delta data for it (union
    across the three delta tables; doclen is authoritative — every delta
    write includes doclen rows — but postings/termdf are scanned too so a
    half-purged crash window never hides data)."""
    out: dict = {}
    for table in DELTA_TABLES:
        base = delta_table_path(root, table)
        if not os.path.isdir(base):
            continue
        for g in os.listdir(base):
            if not g.startswith("gen="):
                continue
            gen = int(g.split("=", 1)[1])
            gdir = os.path.join(base, g)
            for s in os.listdir(gdir):
                if s.startswith("shard="):
                    out.setdefault(int(s.split("=", 1)[1]), set()).add(gen)
    return out


def live_gens_on_disk(root: str) -> set:
    """Generations that still hold data for at least one shard."""
    gens: set = set()
    for g in shard_gen_map(root).values():
        gens |= g
    return gens


def purge_shards(root: str, shards) -> None:
    """Remove the given shards' delta data from every generation (compaction
    commit: the freshly re-encoded base now carries the folded state).
    Idempotent; emptied gen directories are removed so live_gens_on_disk and
    readers converge."""
    doomed = {int(s) for s in shards}
    for table in DELTA_TABLES:
        base = delta_table_path(root, table)
        if not os.path.isdir(base):
            continue
        for g in list(os.listdir(base)):
            if not g.startswith("gen="):
                continue
            gdir = os.path.join(base, g)
            for s in list(os.listdir(gdir)):
                if s.startswith("shard=") and int(s.split("=", 1)[1]) in doomed:
                    shutil.rmtree(os.path.join(gdir, s), ignore_errors=True)
            if not any(e.startswith("shard=") for e in os.listdir(gdir)):
                shutil.rmtree(gdir, ignore_errors=True)


def _signed_termdf(new_tf: DataFrame | None, old_docs_tok: DataFrame | None,
                   n_shards: int) -> DataFrame | None:
    """Per-(shard, term) signed df adjustment: +1 per (new doc, term) pair,
    -1 per (shadowed live doc, term) pair. Both sides are O(update) — the
    shadowed versions' terms come from re-tokenizing exactly the replaced
    docs' stored text (same pinned analyzer as indexing, so the decrements
    equal what the base postings actually count)."""
    parts = []
    if new_tf is not None:
        parts.append(
            new_tf.groupBy("shard", "term").agg(
                F.count(F.lit(1)).alias("df")
            )
        )
    if old_docs_tok is not None:
        old_tf = build_tf(old_docs_tok).withColumn(
            "shard", shard_of(F.col("doc_id"), n_shards)
        )
        parts.append(
            old_tf.groupBy("shard", "term").agg(
                (-F.count(F.lit(1))).alias("df")
            )
        )
    if not parts:
        return None
    df = parts[0]
    for p in parts[1:]:
        df = df.unionByName(p)
    return (
        df.groupBy("shard", "term").agg(F.sum("df").alias("df"))
        .where(F.col("df") != 0)
        .select("term", "df", "shard")
    )


def stage_update_delta(
    spark: SparkSession,
    root: str,
    changed_docs_tok: DataFrame,
    old_replaced: DataFrame | None,
    n_shards: int,
) -> None:
    """Stage one UPDATE generation under <root>/delta_staging/.

    ``changed_docs_tok``: the new/updated docs WITH their ``tokens`` column
    (persisted by the caller — every job here is O(update)).
    ``old_replaced``: the live docs-table rows being shadowed (for the
    termdf decrements); None/empty when every incoming url is new.
    """
    from concurrent.futures import ThreadPoolExecutor

    from ..text.tokenizer import tokenize_udf

    discard_staging(root)
    # tf must be MATERIALIZED before the concurrent writes fan out: all
    # three derive from it (or from the caller-persisted changed docs), and
    # racing the first materialization from three threads would run the
    # tokenize/count pass redundantly
    tf = build_tf(changed_docs_tok).withColumn(
        "shard", shard_of(F.col("doc_id"), n_shards)
    ).persist()
    tf.count()
    # BOTH dl-side key columns renamed: tf and dl share the cached
    # changed-docs parent, whose lineage contains the classification join —
    # Spark's ambiguous-self-join check rejects the cogroup otherwise (same
    # constraint as the full build's single-exchange cogroup).
    dl = changed_docs_tok.select(
        F.col("doc_id").alias("dl_doc_id"), "doc_len"
    ).withColumn("dl_shard", shard_of(F.col("dl_doc_id"), n_shards))

    def _w_postings():
        out = (
            tf.groupBy("shard")
            .cogroup(dl.groupBy("dl_shard"))
            .applyInPandas(lambda l, r: _encode_shard(l, r), POSTINGS_SCHEMA)
        )
        # no projection between the cogroup and its sink (Spark 4.1 prunes
        # the cogroup INPUT columns otherwise); shard partitions out at write
        out.write.mode("overwrite").partitionBy("shard").parquet(
            staging_path(root, "delta_postings")
        )

    def _w_doclen():
        (
            changed_docs_tok.select("doc_id", "doc_len")
            .withColumn("shard", shard_of(F.col("doc_id"), n_shards))
            .repartition(n_shards, "shard")
            .sortWithinPartitions("doc_id")
            .write.mode("overwrite").partitionBy("shard")
            .parquet(staging_path(root, "delta_doclen"))
        )

    def _w_termdf():
        old_tok = None
        if old_replaced is not None:
            old_tok = old_replaced.withColumn(
                "tokens", tokenize_udf(F.col("text"))
            )
        td = _signed_termdf(tf, old_tok, n_shards)
        if td is not None:
            (
                td.repartition(n_shards, "shard")
                .sortWithinPartitions("term")
                .write.mode("overwrite").partitionBy("shard")
                .parquet(staging_path(root, "delta_termdf"))
            )

    # the three staging writes are independent jobs over cached inputs —
    # submit them concurrently (job submission is thread-safe; same pattern
    # as write_index's output fan-out) so their fixed scheduling/IO tails
    # overlap instead of summing — at O(update) data the job floor IS most
    # of the staging wall
    try:
        with ThreadPoolExecutor(max_workers=3) as pool:
            futs = [pool.submit(f) for f in (_w_postings, _w_doclen, _w_termdf)]
            errs = []
            for f in futs:
                try:
                    f.result()
                except Exception as e:  # join all before surfacing
                    errs.append(e)
            if errs:
                raise errs[0]
    finally:
        # also on failure: a staging error must not leak the persisted tf
        # relation in the session's block manager (ADVICE r7)
        tf.unpersist()


def stage_delete_delta(
    spark: SparkSession,
    root: str,
    doomed_docs: DataFrame,
    n_shards: int,
) -> None:
    """Stage one DELETE generation: doclen tombstones (doc_len = -1) plus
    termdf decrements from the doomed docs' stored text. No postings —
    deletion is pure masking until compaction folds it into the base."""
    from ..text.tokenizer import tokenize_udf

    discard_staging(root)
    (
        doomed_docs.select("doc_id", F.lit(-1).alias("doc_len"))
        .withColumn("shard", shard_of(F.col("doc_id"), n_shards))
        .repartition(n_shards, "shard")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite").partitionBy("shard")
        .parquet(staging_path(root, "delta_doclen"))
    )
    doomed_tok = doomed_docs.withColumn("tokens", tokenize_udf(F.col("text")))
    td = _signed_termdf(None, doomed_tok, n_shards)
    if td is not None:
        (
            td.repartition(n_shards, "shard")
            .sortWithinPartitions("term")
            .write.mode("overwrite").partitionBy("shard")
            .parquet(staging_path(root, "delta_termdf"))
        )
