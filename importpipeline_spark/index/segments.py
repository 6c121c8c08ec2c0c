"""Segment/checkpoint-resumable index build with per-partition lineage.

Mirrors the reference's RunAdministration design
(/root/reference/ImportPipeline/RunAdministration/RunAdministration.cs:36-52:
one record per run with state + counters; eviction/merge
RunAdministrations.cs:155-240) as a ``segments`` lineage table, and its
incremental ExistState skip logic
(Endpoints/ESIndexDocType.cs:73-118 → NotExist/ExistOlder/ExistSame/ExistNewer;
gate Datasources/StreamDatasourceBase.cs:110-134) as snapshot anti-joins.

Build shape:
  phase A (once per run): docs + doclen + terms + stats written to the index
  root — the global-stats pass.
  phase B (resumable loop): segments (= doc-range shards) are encoded in
  BATCHES of ``batch_size`` per Spark job — one cogroup keyed by shard, so a
  batch of K segments runs as K parallel tasks (a cluster stays busy), while
  each segment still commits its own lineage row (resume granularity stays
  per-segment). A restarted run reads the lineage, skips finished segments,
  and rebuilds only the missing ones — final index bit-identical to an
  uninterrupted run, including kills mid-batch (files land before lineage;
  an un-lineaged segment is deterministically re-encoded on resume).
  Verified in tests.

Errors are quarantined per record (mirrors ESEndpoint.SaveError,
Endpoints/ESEndpoint.cs:457-471) into <root>/errors/.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
from datetime import datetime, timezone

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..text.tokenizer import ANALYZER_VERSION
from . import deltas as _deltas
from .build import (
    K1,
    B,
    build_docs_and_tf_safe,
    build_docs_safe,
    build_tf,
    corpus_stats,
    doc_id_expr,
    shard_of,
)
from .codec import BLOCK_SIZE
from .store import (
    POSTINGS_SCHEMA,
    PhysicalIndex,
    _encode_shard,
    termdf_from_postings,
    termdf_from_tf,
    write_termdf_sidecars,
    write_terms_dictionary_from_termdf,
)

SEGMENTS_SCHEMA = (
    "run_id string, segment_id int, input_snapshot string, n_docs long, "
    "n_postings long, status string, started_ts timestamp, "
    "finished_ts timestamp, metrics map<string,long>"
)


def _count_error_urls(spark: SparkSession, root: str) -> int:
    """Run-level error counter = DISTINCT failed urls in the quarantine.

    The errors dir is an append-only log (a page that keeps failing is
    re-quarantined on every retry — by design, each run's failures are
    recorded); the COUNTER must not inflate under the retry workflows
    crash-recovery encourages, so it counts distinct urls, not log rows."""
    p = os.path.join(root, "errors")
    if not os.path.exists(p):
        return 0
    try:
        return int(spark.read.parquet(p).select("url").distinct().count())
    except Exception as e:
        # only the empty-quarantine case (no parquet footers yet → schema
        # inference fails) legitimately means zero; a corrupt/unreadable
        # quarantine must NOT silently report n_errors=0
        if not any(f.endswith(".parquet") for f in os.listdir(p)):
            return 0
        raise RuntimeError(
            f"error quarantine at {p} exists but could not be read"
        ) from e


def _write_stats_atomic(root: str, stats: dict) -> None:
    tmp = os.path.join(root, "stats.json.tmp")
    with open(tmp, "w") as f:
        json.dump(stats, f)
    os.replace(tmp, os.path.join(root, "stats.json"))


def _seg_dir(root: str) -> str:
    return os.path.join(root, "segments")


def _seg_path(root: str, segment_id: int) -> str:
    return os.path.join(root, "postings", f"shard={segment_id}")


def _encode_shard_with_counters(tf_pdf, dl_pdf, counters_dir: str):
    """Cogrouped encode kernel that also emits this segment's lineage
    counters as a tiny sidecar JSON, written executor-side next to the batch
    output. This folds what used to be a separate per-batch Spark job (a
    full re-read + aggregation of batch_tmp) into the encode pass itself:
    the counters are aggregates of the kernel's own output (blocks, Σn,
    distinct terms) plus the doclen side's row count (= the segment's doc
    count, killing the former up-front per-shard count job too). Content is
    deterministic and the rename is atomic, so task retries and speculative
    duplicates are harmless; the tmp name carries the pid so two concurrent
    attempts never collide mid-write.

    Filesystem assumption: the sidecars land under the index root, which
    must be a filesystem BOTH driver and executors see — the same contract
    this layout already requires everywhere (the driver os.rename()s
    executor-written parquet into place at every segment commit), so no new
    deployment constraint. _read_counters refuses to silently zero a
    segment that visibly produced postings."""
    out = _encode_shard(tf_pdf, dl_pdf)
    shard = None
    if not tf_pdf.empty:
        shard = int(tf_pdf["shard"].iloc[0])
    elif not dl_pdf.empty:
        shard = int(dl_pdf["shard"].iloc[0])
    if shard is not None:
        rec = {
            "blocks": int(len(out)),
            "postings": int(out["n"].sum()) if len(out) else 0,
            "terms": int(out["term"].nunique()) if len(out) else 0,
            "n_docs": int(len(dl_pdf)),
        }
        os.makedirs(counters_dir, exist_ok=True)
        tmp = os.path.join(counters_dir, f".shard_{shard}.{os.getpid()}.tmp")
        with open(tmp, "w") as f:
            json.dump(rec, f)
        os.replace(tmp, os.path.join(counters_dir, f"shard_{shard}.json"))
    return out


def _read_counters(counters_dir: str, segment_id: int,
                   seg_path: str | None = None) -> dict:
    p = os.path.join(counters_dir, f"shard_{segment_id}.json")
    if not os.path.exists(p):
        if seg_path is not None and any(
            f.endswith(".parquet") for f in os.listdir(seg_path)
        ):
            # the segment demonstrably produced postings but its sidecar is
            # missing → the executors wrote somewhere the driver can't see.
            # All-zero lineage counters would be silent corruption of the
            # run report; fail loudly instead.
            raise RuntimeError(
                f"segment {segment_id} has postings but no counter sidecar "
                f"at {p}; the index root must be a filesystem shared by "
                "driver and executors (the same requirement the segment "
                "file renames already impose)"
            )
        # doc range with no group at all (no docs, no postings)
        return {"blocks": 0, "postings": 0, "terms": 0, "n_docs": 0}
    with open(p) as f:
        return json.load(f)


def read_lineage(spark: SparkSession, root: str) -> DataFrame | None:
    p = _seg_dir(root)
    if not os.path.exists(p) or not any(
        f.endswith(".json") for f in os.listdir(p)
    ):
        return None
    # explicit schema: per-segment counters + metrics map (mirrors
    # DatasourceReport — ImportReport.cs:92-209)
    return spark.read.schema(SEGMENTS_SCHEMA).json(p)


def _finished_segments(root: str, input_snapshot: str | None = None) -> set[int]:
    """Segment ids whose lineage row says status=ok — restricted to rows built
    from the SAME input_snapshot when one is given. A lineage row from a
    different snapshot must not be treated as done: resuming over different
    input would otherwise silently produce a mixed stale/fresh index."""
    p = _seg_dir(root)
    done = set()
    if not os.path.exists(p):
        return done
    for f in os.listdir(p):
        if f.endswith(".json"):
            with open(os.path.join(p, f)) as fh:
                row = json.load(fh)
            if row.get("status") != "ok":
                continue
            if input_snapshot is not None and row.get("input_snapshot") != input_snapshot:
                continue
            done.add(int(row["segment_id"]))
    return done


def _append_lineage(root: str, row: dict) -> None:
    p = _seg_dir(root)
    os.makedirs(p, exist_ok=True)
    tmp = os.path.join(p, f".seg_{row['segment_id']}.tmp")
    with open(tmp, "w") as f:
        json.dump(row, f)
    # atomic per-segment commit (the reference's save-after-each-run —
    # ImportEngine.cs:455)
    os.replace(tmp, os.path.join(p, f"seg_{row['segment_id']}.json"))


def build_index_resumable(
    spark: SparkSession,
    pages: DataFrame,
    root: str,
    n_shards: int = 16,
    run_id: str = "run1",
    input_snapshot: str = "snap1",
    fail_after_segment: int | None = None,
    dict_files: int = 4,
    batch_size: int | None = None,
    doc_id_mode: str = "hash",
) -> PhysicalIndex:
    """Segmented, resumable physical index build.

    ``fail_after_segment`` injects a crash between segment commits (tests
    only; with batching this exercises the mid-batch kill window — some of a
    batch's segments lineage-committed, the rest not).
    ``batch_size`` = segments encoded per Spark job (default: the session's
    defaultParallelism, i.e. fill the cluster); each job runs its batch as
    parallel per-shard tasks. Re-invoking with the same root resumes: phase
    A is recomputed only if its outputs are missing; finished segments
    (lineage status=ok for the same input_snapshot) are skipped.
    """
    os.makedirs(root, exist_ok=True)
    stats_path = os.path.join(root, "stats.json")
    docs_path = os.path.join(root, "docs")
    phase_a_done = os.path.exists(stats_path) and os.path.exists(docs_path)
    if phase_a_done:
        with open(stats_path) as f:
            prev = json.load(f)
        if prev.get("input_snapshot") != input_snapshot:
            raise ValueError(
                f"index at {root} was built from input_snapshot="
                f"{prev.get('input_snapshot')!r}, not {input_snapshot!r}; "
                "use update_index for incremental changes or a fresh root"
            )
        if prev.get("doc_id_mode", "hash") != doc_id_mode:
            raise ValueError(
                f"index at {root} was built with doc_id_mode="
                f"{prev.get('doc_id_mode', 'hash')!r}, not {doc_id_mode!r}"
            )

    docs_cached = None
    docs = None
    pool = None
    phase_a_futures = None
    if not phase_a_done:
        from concurrent.futures import ThreadPoolExecutor

        # ONE fused Arrow pass (extract+tokenize+tf) with quarantine — the
        # same kernel shape as write_index; the shared raw parent is what
        # gets cached so docs and errors writes don't re-extract
        docs, errors, raw = build_docs_and_tf_safe(pages, doc_id_mode)
        raw = raw.persist()
        docs_cached = raw
        # the four phase-A outputs are independent jobs over the cached raw
        # AND independent of phase B's posting batches: submit them
        # concurrently (job submission is thread-safe) and only JOIN them
        # after the batch loop. stats.json — the phase-A-done marker — is
        # written last; a crash before it simply reruns phase A on resume,
        # while already-lineaged segments stay skipped.
        def _w_docs():
            # same partitioned layout as store.write_index: docs/shard=N/,
            # so later update/delete merges stage per shard (COW)
            (
                docs.drop("tf_pairs")
                .withColumn("shard", shard_of(F.col("doc_id"), n_shards))
                .repartition(n_shards, "shard")
                .write.mode("overwrite")
                .partitionBy("shard")
                .parquet(docs_path)
            )

        def _w_errors():
            errors.write.mode("overwrite").parquet(os.path.join(root, "errors"))

        def _w_doclen():
            (
                docs.select("doc_id", "doc_len")
                .withColumn("shard", shard_of(F.col("doc_id"), n_shards))
                .repartition(n_shards, "shard")
                .sortWithinPartitions("doc_id")
                .write.mode("overwrite")
                .partitionBy("shard")
                .parquet(os.path.join(root, "doclen"))
            )

        pool = ThreadPoolExecutor(max_workers=4)
        phase_a_futures = [
            pool.submit(_w_docs),
            pool.submit(_w_errors),
            pool.submit(_w_doclen),
            pool.submit(corpus_stats, docs),
        ]
        stats = None
    else:
        with open(stats_path) as f:
            stats = json.load(f)

    batch_tmp = os.path.join(root, "postings_batch_tmp")

    def _finalize_phase_a(block: bool) -> dict | None:
        """Join the concurrent phase-A jobs and write stats.json (the
        phase-A-done marker). With block=False, only finalizes if every
        future already finished — called between batches so the marker lands
        as early as possible (a crash after it never re-extracts on resume).
        """
        if not (block or all(f.done() for f in phase_a_futures)):
            return None
        errs = []
        for f in phase_a_futures:
            try:
                f.result()
            except Exception as e:  # surfaced after all have settled
                errs.append(e)
        pool.shutdown()
        if errs:
            raise errs[0]
        cs = phase_a_futures[3].result()
        s = dict(
            cs,
            analyzer=ANALYZER_VERSION,
            k1=K1,
            b=B,
            n_shards=n_shards,
            block_size=BLOCK_SIZE,
            doc_id_mode=doc_id_mode,
            run_id=run_id,
            input_snapshot=input_snapshot,
            # run-level error counter (ImportReport.cs:92-209 'errors')
            n_errors=_count_error_urls(spark, root),
        )
        _write_stats_atomic(root, s)
        return s

    # EVERYTHING phase-B — including its setup Spark jobs (docs re-read on
    # resume, the per-shard doc-count job) — runs inside one guard: any exit,
    # success or failure, first joins the concurrent phase-A futures (a
    # caller that immediately resumes must not race still-running background
    # writes) and releases the caches.
    tf_cached = None
    pos = 0
    dict_done = False
    dict_future = None
    dict_pool = None
    try:
        # phase B: per-segment postings (segment == doc-range shard); only
        # segments recorded ok FOR THIS INPUT SNAPSHOT count as finished
        done = _finished_segments(root, input_snapshot)
        if docs is not None:
            # fresh run: phase A's fused pass is still cached — tf is a
            # plain JVM explode of its tf_pairs (no second Python pass)
            tf = docs.select(
                "doc_id", F.explode("tf_pairs").alias("p")
            ).select(
                "doc_id", F.col("p.term").alias("term"), F.col("p.tf").alias("tf")
            )
            dl_src = docs
        else:
            # resume: tf is recomputed from the persisted docs' text (docs
            # parquet stores text, not tokens, to stay lean; only the
            # missing segments' shards are actually encoded below)
            from ..text.tokenizer import tokenize_udf
            from .store import read_docs

            docs_df = read_docs(spark, root)
            docs_tok = docs_df.withColumn("tokens", tokenize_udf(F.col("text")))
            tf = build_tf(docs_tok)
            dl_src = docs_df
        tf = tf.withColumn("shard", shard_of(F.col("doc_id"), n_shards))
        dl = dl_src.select(
            F.col("doc_id").alias("dl_doc_id"), "doc_len"
        ).withColumn("shard", shard_of(F.col("dl_doc_id"), n_shards))

        todo = [s for s in range(n_shards) if s not in done]
        if batch_size is None:
            # two task waves per batch job: keeps every core busy with
            # straggler absorption while halving the commit barriers
            batch_size = max(1, 2 * spark.sparkContext.defaultParallelism)
        # on RESUME, tf goes through a Python tokenize pass — cache it
        # across batches. (Fresh runs explode the already-cached fused
        # tf_pairs JVM-side, cheaper per batch than materializing the
        # exploded relation.)
        if docs is None and len(todo) > batch_size:
            tf = tf.persist()
            tf_cached = tf
        counters_dir = os.path.join(root, "postings_batch_counters")
        if todo:
            # dictionary + term-df sidecars depend only on the tf relation,
            # not on any posting batch — run the chain CONCURRENTLY with the
            # batch loop (r8; it used to run after it, two full explode+agg
            # passes on the critical path). ONE termdf aggregation feeds
            # both outputs: sidecars first, then the global dictionary from
            # the skinny persisted termdf (byte-compatible with the
            # from-tf/from-postings derivations — asserted in
            # tests/test_segments.py). Crash windows are unchanged: termdf
            # lands via tmp + atomic rename, and a run that dies with
            # either output missing re-derives on resume (dict_done stays
            # False until the chain joins cleanly).
            from concurrent.futures import ThreadPoolExecutor as _TPE

            def _dict_chain():
                termdf = termdf_from_tf(tf).persist()
                try:
                    td_tmp = os.path.join(root, "termdf.tmp")
                    shutil.rmtree(td_tmp, ignore_errors=True)
                    write_termdf_sidecars(termdf, td_tmp, n_shards)
                    td_path = os.path.join(root, "termdf")
                    shutil.rmtree(td_path, ignore_errors=True)
                    os.rename(td_tmp, td_path)
                    write_terms_dictionary_from_termdf(
                        termdf, os.path.join(root, "terms"), dict_files
                    )
                finally:
                    termdf.unpersist()

            dict_pool = _TPE(max_workers=1)
            dict_future = dict_pool.submit(_dict_chain)
        for start in range(0, len(todo), batch_size):
            batch = todo[start:start + batch_size]
            started = datetime.now(timezone.utc).isoformat()
            seg_tf = tf.where(F.col("shard").isin(batch))
            seg_dl = dl.where(F.col("shard").isin(batch))
            # ONE cogroup job for the whole batch: keyed by shard, so the K
            # segments encode as K parallel tasks. The kernel's output keeps
            # the shard column and is written partitionBy(shard) with NO
            # projection in between — Spark 4.1's optimizer would push a
            # .drop/.select through FlatMapCoGroupsInPandas and strip needed
            # columns from the cogroup INPUT pdfs (observed: doc_id
            # vanishing from the dl side).
            out = (
                seg_tf.groupBy("shard")
                .cogroup(seg_dl.groupBy("shard"))
                .applyInPandas(
                    lambda l, r: _encode_shard_with_counters(l, r, counters_dir),
                    POSTINGS_SCHEMA,
                )
            )
            shutil.rmtree(batch_tmp, ignore_errors=True)
            out.write.mode("overwrite").partitionBy("shard").parquet(batch_tmp)
            # commit each segment: files into place FIRST, lineage row after
            # — a kill between the two just re-encodes that segment on
            # resume (deterministic, so the final bytes are identical).
            # Counters come from the kernel's sidecars (no extra job).
            for seg in batch:
                path = _seg_path(root, seg)
                os.makedirs(os.path.dirname(path), exist_ok=True)
                shutil.rmtree(path, ignore_errors=True)
                src = os.path.join(batch_tmp, f"shard={seg}")
                if os.path.exists(src):
                    os.rename(src, path)
                else:  # doc range with no postings at all
                    os.makedirs(path, exist_ok=True)
                m = _read_counters(counters_dir, seg, seg_path=path)
                _append_lineage(
                    root,
                    {
                        "run_id": run_id,
                        "segment_id": seg,
                        "input_snapshot": input_snapshot,
                        "n_docs": m["n_docs"],
                        "n_postings": m["postings"],
                        "status": "ok",
                        "started_ts": started,
                        "finished_ts": datetime.now(timezone.utc).isoformat(),
                        # per-segment metrics (mirrors DatasourceReport
                        # counters — ImportReport.cs:92-209)
                        "metrics": {
                            "blocks": m["blocks"],
                            "distinct_terms": m["terms"],
                        },
                    },
                )
                if fail_after_segment is not None and pos >= fail_after_segment:
                    raise RuntimeError(f"injected failure after segment {seg}")
                pos += 1
            shutil.rmtree(batch_tmp, ignore_errors=True)
            if stats is None:
                stats = _finalize_phase_a(block=False)
        shutil.rmtree(counters_dir, ignore_errors=True)
        if dict_future is not None:
            # join the overlapped dictionary/termdf chain (derived from the
            # still-live tf relation — one aggregation over the cache, never
            # a re-read of every posting segment from disk. Correct on
            # partial resumes too: tf covers the WHOLE docs table, and every
            # on-disk segment is an encode of this same input snapshot —
            # _finished_segments filters by snapshot; a mismatch raises up
            # front).
            dict_future.result()
            dict_done = True
    finally:
        if dict_pool is not None:
            if not dict_done and dict_future is not None:
                # exception in flight: join quietly so the crash propagates
                # unmasked; a half-written dictionary re-derives on resume
                try:
                    dict_future.result()
                except Exception:
                    pass
            dict_pool.shutdown()
        # join the concurrent phase-A jobs BEFORE leaving (even on the
        # crash path: a caller that immediately resumes must not race
        # still-running background writes), then release the caches —
        # crash/resume cycles must not accumulate pinned corpus copies
        if stats is None and phase_a_futures is not None:
            if sys.exc_info()[1] is not None:
                # an exception is in flight: join quietly so it propagates
                # unmasked; stats.json stays unwritten → phase A reruns
                for f in phase_a_futures:
                    try:
                        f.result()
                    except Exception:
                        pass
                pool.shutdown()
            else:
                stats = _finalize_phase_a(block=True)
        if tf_cached is not None:
            tf_cached.unpersist()
        if docs_cached is not None:
            docs_cached.unpersist()

    if not dict_done:
        # nothing-to-do resume (all segments lineaged; e.g. the prior run
        # died between the last segment commit and the dictionary write):
        # derive from the on-disk posting segments — tf was never computed,
        # and re-tokenizing the whole corpus just for the dictionary would
        # cost more than the posting-metadata scan
        _derive_dictionary(spark, root, dict_files)
        _backfill_termdf(spark, root, n_shards)

    return PhysicalIndex(root=root, stats=stats)


def _derive_dictionary(spark: SparkSession, root: str, dict_files: int = 4,
                       out_path: str | None = None) -> None:
    """Dictionary from the on-disk posting segments. An index whose every
    document quarantined (or was deleted) has posting dirs with no parquet
    footers at all — schema inference fails, but the correct dictionary is
    simply empty, so write one with the right schema instead of failing a
    build that already committed its lineage."""
    from .store import write_terms_dictionary

    p = os.path.join(root, "postings")
    target = out_path or os.path.join(root, "terms")
    try:
        postings = spark.read.option("basePath", p).parquet(p)
    except Exception:
        (
            spark.createDataFrame(
                [], "term string, df long, shards array<int>"
            ).write.mode("overwrite").parquet(target)
        )
        return
    write_terms_dictionary(postings, target, dict_files)


def _backfill_termdf(spark: SparkSession, root: str, n_shards: int) -> None:
    """(Re)derive ALL shards' term-df sidecars from on-disk posting block
    metadata into root/termdf via tmp + atomic rename. Used to migrate a
    pre-sidecar index at its first update and by the dictionary-from-disk
    recovery path. Idempotent; a crash mid-write leaves termdf absent, which
    simply re-triggers the backfill."""
    p = os.path.join(root, "postings")
    tmp = os.path.join(root, "termdf.tmp")
    shutil.rmtree(tmp, ignore_errors=True)
    try:
        postings = spark.read.option("basePath", p).parquet(p)
    except Exception:
        # an index whose every document quarantined/deleted: the correct
        # sidecar state is "no rows" — an empty directory
        os.makedirs(tmp, exist_ok=True)
    else:
        write_termdf_sidecars(termdf_from_postings(postings), tmp, n_shards)
    target = os.path.join(root, "termdf")
    shutil.rmtree(target, ignore_errors=True)
    os.rename(tmp, target)


def _derive_dictionary_from_sidecars(spark: SparkSession, root: str,
                                     out_path: str,
                                     dict_files: int = 4,
                                     delta_gens=None) -> None:
    """Dictionary from the per-shard term-df sidecars ONLY — never touches
    the postings files (pinned in tests: derivation still works with the
    postings directory moved away). The aggregation input is the skinny
    (shard, term, df) table; the update path keeps it current per shard
    (_rebuild_shards), so this is the O(affected-shards)-update dictionary
    refresh VERDICT r5 #3 asked for.

    With delta generations (r7 LSM update path) the base sidecars describe
    the base postings' block metadata and each generation's sidecar carries
    SIGNED adjustments (+new versions, -shadowed versions); the live df per
    (shard, term) is their sum, and a shard drops out of a term's shard
    list when its net df reaches 0 — exactly the state a full rebuild's
    dictionary would record. Without deltas the base table is passed
    through un-aggregated (the r6 fast path)."""
    if delta_gens is None:
        try:
            with open(os.path.join(root, "stats.json")) as f:
                delta_gens = json.load(f).get("delta_gens", [])
        except FileNotFoundError:
            delta_gens = []
    frames = []
    p = os.path.join(root, "termdf")
    try:
        frames.append(
            spark.read.option("basePath", p).parquet(p)
            .select("term", F.col("df").cast("long").alias("df"), "shard")
        )
    except Exception:
        pass
    dp = os.path.join(root, "delta_termdf")
    if delta_gens and os.path.isdir(dp):
        try:
            d = spark.read.option("basePath", dp).parquet(dp)
            frames.append(
                d.where(F.col("gen").isin([int(g) for g in delta_gens]))
                .select("term", F.col("df").cast("long").alias("df"), "shard")
            )
        except Exception:
            pass
    if not frames:
        (
            spark.createDataFrame([], "term string, df long, shards array<int>")
            .write.mode("overwrite").parquet(out_path)
        )
        return
    termdf = frames[0]
    for extra in frames[1:]:
        termdf = termdf.unionByName(extra)
    if len(frames) > 1:
        termdf = (
            termdf.groupBy("shard", "term").agg(F.sum("df").alias("df"))
            .where(F.col("df") > 0)
            .select("term", "df", "shard")
        )
    write_terms_dictionary_from_termdf(termdf, out_path, dict_files)


# ---- incremental import (ExistState semantics) ----

def _rebuild_shards(spark, root: str, affected, n_shards: int,
                    run_id: str, input_snapshot: str) -> None:
    """Re-encode postings + doclen partitions for the given shards from the
    CURRENT docs table. Idempotent (deterministic encode), so safe to re-run
    during crash recovery.

    All affected shards encode in ONE cogroup job (keyed by shard → one
    parallel task per shard) and one doclen write; the per-shard directory
    swaps happen afterwards. A kill mid-swap is covered by the caller's
    marker protocol (recover_update re-runs the whole rebuild)."""
    from ..text.tokenizer import tokenize_udf

    affected = sorted(int(s) for s in affected)
    docs_df = spark.read.parquet(os.path.join(root, "docs"))
    if "shard" in docs_df.columns:
        # partitioned layout: the filter hits the physical partition
        # column, so the scan lists/reads ONLY the affected shard dirs
        docs_aff = docs_df.where(F.col("shard").isin(affected)).drop("shard")
    else:
        sh = shard_of(F.col("doc_id"), n_shards)
        docs_aff = docs_df.where(sh.isin(affected))
    docs_tok = docs_aff.withColumn("tokens", tokenize_udf(F.col("text")))
    tf = build_tf(docs_tok).withColumn("shard", shard_of(F.col("doc_id"), n_shards))
    dl = docs_aff.select(F.col("doc_id").alias("dl_doc_id"), "doc_len").withColumn(
        "shard", shard_of(F.col("dl_doc_id"), n_shards)
    )

    started = datetime.now(timezone.utc).isoformat()
    # no projection between applyInPandas and the write (Spark 4.1 would push
    # the pruning into the cogroup inputs); the shard column partitions out
    out = (
        tf.groupBy("shard")
        .cogroup(dl.groupBy("shard"))
        .applyInPandas(lambda l, r: _encode_shard(l, r), POSTINGS_SCHEMA)
    )
    post_tmp = os.path.join(root, "postings_rebuild_tmp")
    shutil.rmtree(post_tmp, ignore_errors=True)
    out.write.mode("overwrite").partitionBy("shard").parquet(post_tmp)
    dl_tmp = os.path.join(root, "doclen_rebuild_tmp")
    shutil.rmtree(dl_tmp, ignore_errors=True)
    (
        dl.select(F.col("dl_doc_id").alias("doc_id"), "doc_len", "shard")
        .repartition(max(1, len(affected)), "shard")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(dl_tmp)
    )
    ndocs = {
        int(r.shard): int(r["count"])
        for r in dl.groupBy("shard").count().collect()
    }
    # refresh the affected shards' term-df sidecars from the freshly encoded
    # postings (block-metadata columns of post_tmp only — column-pruned,
    # affected shards only). Skipped when the index predates sidecars: the
    # caller's _refresh_stats_terms migration backfills ALL shards from the
    # post-swap on-disk state instead, which is strictly fresher.
    termdf_tmp = os.path.join(root, "termdf_rebuild_tmp")
    shutil.rmtree(termdf_tmp, ignore_errors=True)
    has_termdf = os.path.isdir(os.path.join(root, "termdf"))
    if has_termdf:
        try:
            post_aff = spark.read.option("basePath", post_tmp).parquet(post_tmp)
        except Exception:
            post_aff = None  # every affected shard emptied → no sidecar rows
        if post_aff is not None:
            write_termdf_sidecars(
                termdf_from_postings(post_aff), termdf_tmp,
                max(1, len(affected)),
            )

    for seg in affected:
        path = _seg_path(root, seg)
        shutil.rmtree(path, ignore_errors=True)
        src = os.path.join(post_tmp, f"shard={seg}")
        if os.path.exists(src):
            os.rename(src, path)
        else:  # every doc of this shard was deleted
            os.makedirs(path, exist_ok=True)
        dl_path = os.path.join(root, "doclen", f"shard={seg}")
        shutil.rmtree(dl_path, ignore_errors=True)
        dl_src = os.path.join(dl_tmp, f"shard={seg}")
        if os.path.exists(dl_src):
            os.rename(dl_src, dl_path)
        else:
            os.makedirs(dl_path, exist_ok=True)
        if has_termdf:
            td_path = os.path.join(root, "termdf", f"shard={seg}")
            shutil.rmtree(td_path, ignore_errors=True)
            td_src = os.path.join(termdf_tmp, f"shard={seg}")
            if os.path.exists(td_src):
                os.rename(td_src, td_path)
            # an emptied shard's sidecar state is simply no directory
        _append_lineage(
            root,
            {
                "run_id": run_id,
                "segment_id": int(seg),
                "input_snapshot": input_snapshot,
                "n_docs": ndocs.get(seg, 0),
                "n_postings": None,
                "status": "ok",
                "started_ts": started,
                "finished_ts": datetime.now(timezone.utc).isoformat(),
                "metrics": {"incremental": 1},
            },
        )
    shutil.rmtree(post_tmp, ignore_errors=True)
    shutil.rmtree(dl_tmp, ignore_errors=True)
    shutil.rmtree(termdf_tmp, ignore_errors=True)
    # the freshly encoded base now carries these shards' full live state —
    # their delta-segment data (postings/doclen/termdf across ALL
    # generations) is folded and must go, or queries would double-count.
    # Still inside the caller's marker window: a crash here re-runs the
    # whole (idempotent) rebuild + purge.
    _deltas.purge_shards(root, affected)


def _docs_shard_totals(spark, root: str, n_shards: int, shards=None) -> dict:
    """Per-shard (n_docs, total_tokens) from the CURRENT docs table —
    recomputed from state, never delta-applied, so callers stay idempotent
    under crash/retry. With the partitioned docs layout and ``shards``
    given, the scan partition-prunes to those directories only."""
    docs_df = spark.read.parquet(os.path.join(root, "docs"))
    if "shard" in docs_df.columns:
        key = F.col("shard")
    else:
        key = shard_of(F.col("doc_id"), n_shards)
    if shards is not None:
        docs_df = docs_df.where(key.isin([int(s) for s in shards]))
    rows = docs_df.groupBy(key.alias("s")).agg(
        F.count(F.lit(1)).alias("n"), F.sum("doc_len").alias("t")
    ).collect()
    return {int(r.s): (int(r.n), int(r.t or 0)) for r in rows}


def _refresh_stats_terms(spark, root: str, run_id: str, input_snapshot: str,
                         affected=None, new_gen=None) -> dict:
    """Recompute global stats (exact-int avgdl) and the dictionary from the
    current docs table + posting block metadata. Idempotent.

    Stats come from per-shard subtotals kept in stats.json (``shard_stats``):
    with ``affected`` given, only those shards' subtotals are re-scanned
    (partition-pruned) and the rest reused — the global agg per update was
    an O(corpus) doc_len scan for two numbers. Recovery stays correct
    because affected subtotals are recomputed FROM the current docs table,
    not delta-applied; re-running produces identical values. An index
    without recorded subtotals (pre-r5 stats.json) migrates with one full
    per-shard scan."""
    from concurrent.futures import ThreadPoolExecutor

    with open(os.path.join(root, "stats.json")) as f:
        stats = json.load(f)
    n_shards = int(stats["n_shards"])
    # delta-generation bookkeeping first (driver-side directory walk — the
    # dictionary derivation below needs the final gen list): the atomic
    # stats.json replace below IS the reader-visible commit of ``new_gen``
    # (its directories were renamed into place by the caller/recovery before
    # this runs); generations whose data compaction fully folded into the
    # base drop out. Idempotent — everything derives from the marker +
    # on-disk state.
    gens = {int(g) for g in stats.get("delta_gens", [])}
    if new_gen is not None:
        gens.add(int(new_gen))
        stats["last_gen"] = max(int(stats.get("last_gen", 0)), int(new_gen))
    gens &= _deltas.live_gens_on_disk(root)
    stats["delta_gens"] = sorted(gens)
    # a pre-sidecar index migrates with one full backfill from the on-disk
    # postings BEFORE the fan-out (idempotent under crash/retry: both the
    # backfill and the sidecar refresh recompute from state)
    if not os.path.isdir(os.path.join(root, "termdf")):
        _backfill_termdf(spark, root, n_shards)

    # the three Spark pieces — per-shard doc subtotals, the error-url count,
    # and the dictionary rebuild from the sidecars — are independent jobs:
    # submit them concurrently so their fixed job floors overlap (r8; they
    # ran back-to-back and were most of the per-update fixed cost)
    shard_stats = {
        int(k): (int(v[0]), int(v[1]))
        for k, v in stats.get("shard_stats", {}).items()
    }
    terms_tmp = os.path.join(root, "terms.tmp")
    shutil.rmtree(terms_tmp, ignore_errors=True)

    def _totals():
        if affected is None or not shard_stats:
            return _docs_shard_totals(spark, root, n_shards)
        fresh = _docs_shard_totals(spark, root, n_shards, shards=affected)
        merged = dict(shard_stats)
        for s in affected:
            merged.pop(int(s), None)
        merged.update(fresh)
        return merged

    def _dict():
        # dictionary from the per-shard term-df sidecars (kept current for
        # affected shards by _rebuild_shards) — never a block-metadata scan
        # of all shards
        _derive_dictionary_from_sidecars(spark, root, out_path=terms_tmp,
                                         delta_gens=stats["delta_gens"])

    with ThreadPoolExecutor(max_workers=3) as ex:
        f_tot = ex.submit(_totals)
        f_err = ex.submit(_count_error_urls, spark, root)
        f_dic = ex.submit(_dict)
        shard_stats = f_tot.result()
        n_errors = f_err.result()
        f_dic.result()
    n = sum(v[0] for v in shard_stats.values())
    t = sum(v[1] for v in shard_stats.values())
    stats.update(
        n_docs=n,
        total_tokens=t,
        avgdl=(t / n) if n else 0.0,
        shard_stats={str(k): list(v) for k, v in sorted(shard_stats.items())},
        run_id=run_id,
        input_snapshot=input_snapshot,
        n_errors=n_errors,
    )
    terms_path = os.path.join(root, "terms")
    shutil.rmtree(terms_path, ignore_errors=True)
    os.rename(terms_tmp, terms_path)
    _write_stats_atomic(root, stats)
    return stats


def _update_marker(root: str) -> str:
    return os.path.join(root, "update.json")


def _write_docs_tmp_cow(spark, docs_path: str, merged_affected,
                        affected, n_shards: int) -> None:
    """Stage the post-merge docs table at ``docs_path + '.tmp'``, copying
    nothing that did not change.

    ``merged_affected`` must hold exactly the post-merge rows of the
    ``affected`` shards (logical schema, no shard column). Partitioned
    layout (docs/shard=N/): those rows are written partitioned and every
    OTHER shard directory is hard-linked from the live table — the publish
    path's copy-on-write (_copy_index_tree), so staging cost is O(affected
    shards) + O(#files) link syscalls, not a corpus rewrite. A flat
    (pre-partitioned) docs table cannot be merged per shard; the caller
    passes the FULL merge as ``merged_affected`` with ``affected=None``
    and this migrates it to the partitioned layout in one rewrite. Either
    way the caller's whole-dir marker+rename swap — and recover_update —
    apply unchanged on top: a crash mid-staging leaves docs.tmp garbage
    that recovery sweeps, never a half-merged live table.

    (The hard-link copy is _copy_index_tree — the generation-publish COW
    primitive; on filesystems without links it degrades to file copies of
    the unchanged shards, still never a Spark job.)"""
    from .store import docs_is_sharded

    docs_tmp = docs_path + ".tmp"
    shutil.rmtree(docs_tmp, ignore_errors=True)
    out = merged_affected.withColumn(
        "shard", shard_of(F.col("doc_id"), n_shards)
    )
    if affected is not None and docs_is_sharded(docs_path):
        aff = {int(a) for a in affected}
        (
            out.repartition(max(1, len(aff)), "shard")
            .write.mode("overwrite").partitionBy("shard").parquet(docs_tmp)
        )
        for e in os.listdir(docs_path):
            if e.startswith("shard=") and int(e.split("=", 1)[1]) not in aff:
                _copy_index_tree(
                    os.path.join(docs_path, e), os.path.join(docs_tmp, e)
                )
    else:
        (
            out.repartition(n_shards, "shard")
            .write.mode("overwrite").partitionBy("shard").parquet(docs_tmp)
        )


def _shards_of_urls(with_urls: DataFrame, doc_id_mode: str,
                    n_shards: int) -> list:
    """Doc-range shards the given urls' ids map to. doc_id = f(url) is
    deterministic and mode-recorded, so an incoming url's EXISTING copy (if
    any) can only live in the shard its id maps to — existence probes can
    therefore partition-prune the docs scan to these shards before any
    join. One skinny job over the update input (urls only, no extraction)."""
    return sorted(
        int(r.s)
        for r in with_urls.select(
            shard_of(doc_id_expr(doc_id_mode), n_shards).alias("s")
        ).distinct().collect()
    )


def _docs_pruned_to_shards(spark, root: str, old_docs: DataFrame,
                           shards: list) -> DataFrame:
    """The docs table restricted to the given shards — on the partitioned
    layout the filter hits the physical partition column, so the scan
    lists/reads ONLY those shard directories (update cost stays O(update),
    not O(corpus)). Flat legacy layouts fall back to the full table."""
    from .store import docs_is_sharded

    docs_path = os.path.join(root, "docs")
    if docs_is_sharded(docs_path):
        return (
            spark.read.parquet(docs_path)
            .where(F.col("shard").isin([int(s) for s in shards]))
            .drop("shard")
        )
    return old_docs


def recover_update(spark: SparkSession, root: str) -> bool:
    """Crash recovery for an interrupted update_index / delete_from_index /
    compact_deltas. Returns True if a recovery was performed.

    - docs dir missing: roll the docs swap forward (docs.tmp present) or back
      (docs.old present).
    - rebuild-mode marker (no ``mode`` field — also every pre-r7 marker):
      re-run the affected-shard rebuild + stats/terms refresh against the
      CURRENT docs table. If the crash happened before the docs swap, this
      re-encodes identical bytes (deterministic) — a consistent pre-update
      state; after the swap, it completes the update.
    - delta-mode marker: the generation was FULLY staged before the marker
      was written, so recovery always rolls forward — finish the docs swap
      if the crash interrupted it, rename the staged generation into place
      (idempotent), and refresh stats/dictionary, which atomically commits
      the generation to ``delta_gens``.
    - no marker: any staging/tmp leftovers are pre-commit garbage — swept.
    """
    docs_path = os.path.join(root, "docs")
    docs_tmp = docs_path + ".tmp"
    docs_old = docs_path + ".old"
    marker = _update_marker(root)
    recovered = False
    if not os.path.exists(docs_path):
        if os.path.exists(docs_tmp):
            os.rename(docs_tmp, docs_path)  # roll forward to merged docs
        elif os.path.exists(docs_old):
            os.rename(docs_old, docs_path)  # roll back to previous docs
        else:
            raise FileNotFoundError(f"index at {root} has no docs table")
        recovered = True
    if os.path.exists(marker):
        with open(marker) as f:
            mk = json.load(f)
        if mk.get("mode") == "delta":
            if os.path.exists(docs_tmp):
                # crash between marker and swap: complete the swap (the
                # staged merge is the full post-update docs state)
                shutil.rmtree(docs_old, ignore_errors=True)
                os.rename(docs_path, docs_old)
                os.rename(docs_tmp, docs_path)
            _deltas.commit_staged_gen(root, int(mk["gen"]))
            _refresh_stats_terms(spark, root, mk["run_id"],
                                 mk["input_snapshot"],
                                 affected=mk["affected"],
                                 new_gen=int(mk["gen"]))
        else:
            _rebuild_shards(
                spark, root, mk["affected"], int(mk["n_shards"]),
                mk["run_id"], mk["input_snapshot"],
            )
            _refresh_stats_terms(spark, root, mk["run_id"],
                                 mk["input_snapshot"], affected=mk["affected"])
        os.remove(marker)
        recovered = True
    shutil.rmtree(docs_old, ignore_errors=True)
    shutil.rmtree(docs_tmp, ignore_errors=True)
    _deltas.discard_staging(root)
    return recovered


def _swap_docs_under_marker(root: str, marker_payload: dict) -> None:
    """marker (atomic) → docs→docs.old → docs.tmp→docs. Shared by both
    update strategies; every crash window is covered by recover_update."""
    marker = _update_marker(root)
    mk_tmp = marker + ".tmp"
    with open(mk_tmp, "w") as f:
        json.dump(marker_payload, f)
    os.replace(mk_tmp, marker)
    docs_path = os.path.join(root, "docs")
    docs_old = docs_path + ".old"
    shutil.rmtree(docs_old, ignore_errors=True)
    os.rename(docs_path, docs_old)
    os.rename(docs_path + ".tmp", docs_path)


# patchable seam (tests inject post-swap crashes here); recovery calls
# deltas.commit_staged_gen directly
_commit_delta_gen = _deltas.commit_staged_gen


def _maybe_autocompact(spark, root: str, affected, compact_after,
                       run_id: str, input_snapshot: str,
                       stats: dict) -> PhysicalIndex:
    """Fold shards that accumulated >= compact_after delta generations back
    into their base segments (the LSM compaction trigger)."""
    if compact_after:
        sg = _deltas.shard_gen_map(root)
        crowded = [s for s in affected if len(sg.get(int(s), ())) >= compact_after]
        if crowded:
            return compact_deltas(spark, root, crowded,
                                  run_id=f"{run_id}-compact",
                                  input_snapshot=input_snapshot)
    return PhysicalIndex(root=root, stats=stats)


def update_index(
    spark: SparkSession,
    root: str,
    new_pages: DataFrame,
    run_id: str = "run2",
    input_snapshot: str = "snap2",
    strategy: str = "delta",
    compact_after: int | None = 8,
) -> PhysicalIndex:
    """Incremental index update: re-index only what changed.

    1. classify the snapshot against the existing docs table
       (ExistState semantics — skip ExistSame/ExistNewer); the probe is
       partition-pruned to the shards the incoming urls' ids map to;
    2. merge the docs table (crash-safe swap: tmp write → marker → renames,
       with recover_update rolling an interrupted swap forward or back);
    3. index the changed docs:
       - ``strategy="delta"`` (default, r7): encode ONLY the changed docs
         into an immutable delta generation (same codec); query kernels
         mask shadowed base entries via the owner-generation rule and
         compaction folds deltas into the base past ``compact_after``
         generations per shard (deltas.py). CPU cost is O(update bytes);
         the only O(affected-shard) work left is columnar IO (the docs COW
         merge + the old-version term scan), with zero re-tokenize /
         re-encode of unchanged docs.
       - ``strategy="rebuild"``: re-encode every affected shard from the
         merged docs (the r1-r6 path; also the compaction primitive).
    4. refresh global stats from per-shard subtotals and the dictionary
       from the (base + delta) term-df sidecar tables — never a
       block-metadata scan across shards.

    Either strategy is rank-identical to a full rebuild over the merged
    corpus; a kill at ANY point leaves the index recoverable via
    recover_update (invoked automatically on the next call) — verified in
    tests, including mid-delta-commit crash windows.
    """
    if strategy not in ("delta", "rebuild"):
        raise ValueError(f"unknown update strategy: {strategy!r}")
    recover_update(spark, root)

    with open(os.path.join(root, "stats.json")) as f:
        stats = json.load(f)
    n_shards = int(stats["n_shards"])
    docs_path = os.path.join(root, "docs")
    from .store import docs_is_sharded, read_docs

    old_docs = read_docs(spark, root)

    # the existence probe joins on url, and an incoming url's existing copy
    # can only live in the shard its (mode-recorded) id maps to — so the
    # classification scan prunes to the incoming ids' shards instead of
    # reading url+warc_ts across the whole corpus (r6; the last O(corpus)
    # read on the update path)
    in_shards = _shards_of_urls(
        new_pages, stats.get("doc_id_mode", "hash"), n_shards
    )
    old_probe = _docs_pruned_to_shards(spark, root, old_docs, in_shards)
    changed_pages = incremental_pages(new_pages, old_probe)
    # derive changed docs' ids the way THIS index was built (stats records
    # the mode): a hash-id derivation over a host_locality index would
    # re-index every changed url under a second id and strand the old
    # postings un-rebuilt
    # cache=True: the errors write and the changed-docs materialization
    # share ONE extraction pass over the update (r8 — uncached, the safe
    # extraction UDF ran twice over every changed page)
    changed_docs, errors = build_docs_safe(
        changed_pages, stats.get("doc_id_mode", "hash"), cache=True
    )
    extract_cache = getattr(changed_docs, "cached_deps", [])
    if strategy == "rebuild":
        changed_docs = changed_docs.drop("tokens")
    # (delta keeps ``tokens``: the generation's postings/termdf derive from
    # them without a second Python tokenize pass over the update)
    changed_docs = changed_docs.persist()
    # quarantine records are appended BEFORE the no-change early return:
    # if every changed page failed extraction, changed_docs is empty but the
    # errors still belong in <root>/errors/
    errors.write.mode("append").parquet(os.path.join(root, "errors"))
    n_changed = changed_docs.count()
    for _c in extract_cache:
        _c.unpersist()
    if n_changed == 0:
        changed_docs.unpersist()
        # the quarantine may still have grown (every changed page failed):
        # keep the error counter truthful AND attribute it to THIS run
        n_errors = _count_error_urls(spark, root)
        if n_errors != stats.get("n_errors"):
            stats.update(
                n_errors=n_errors, run_id=run_id, input_snapshot=input_snapshot
            )
            _write_stats_atomic(root, stats)
        return PhysicalIndex(root=root, stats=stats)

    affected = sorted(
        int(r.s)
        for r in changed_docs.select(
            shard_of(F.col("doc_id"), n_shards).alias("s")
        ).distinct().collect()
    )

    # merged docs table → tmp (staged BEFORE the marker). Only the AFFECTED
    # shards' rows are merged and written — a changed url can never move
    # shards (doc_id = f(url) is deterministic), so per-shard merges are
    # closed and the staging helper hard-links everything else (COW):
    # staging cost is O(affected shards), not a corpus rewrite. On a
    # partitioned layout the filter is on the physical partition column,
    # so the scan reads only the affected shard directories.
    sharded = docs_is_sharded(docs_path)
    old_aff = _docs_pruned_to_shards(spark, root, old_docs, affected)

    merged_aff = old_aff.join(
        changed_docs.select("url"), "url", "left_anti"
    ).unionByName(changed_docs.drop("tokens"))
    if strategy == "delta":
        gen = _deltas.next_gen(stats)
        # live versions being shadowed — their stored text re-tokenizes to
        # exactly the terms the base postings count, giving the signed
        # term-df adjustments (O(update) CPU; see deltas.stage_update_delta)
        old_replaced = old_aff.join(
            changed_docs.select("url"), "url", "left_semi"
        )
        # the delta staging and the docs COW merge are independent
        # pre-marker steps over the cached changed docs — overlap them (r8;
        # both are swept/rolled back identically on a pre-marker crash, so
        # their relative order never mattered)
        from concurrent.futures import ThreadPoolExecutor as _TPE

        with _TPE(max_workers=2) as _ex:
            f_stage = _ex.submit(_deltas.stage_update_delta, spark, root,
                                 changed_docs, old_replaced, n_shards)
            f_cow = _ex.submit(_write_docs_tmp_cow, spark, docs_path,
                               merged_aff, affected if sharded else None,
                               n_shards)
            errs = []
            for f in (f_stage, f_cow):
                try:
                    f.result()
                except Exception as e:
                    errs.append(e)
            if errs:
                raise errs[0]
    else:
        _write_docs_tmp_cow(spark, docs_path, merged_aff,
                            affected if sharded else None, n_shards)
    changed_docs.unpersist()

    payload = {"affected": affected, "n_shards": n_shards,
               "run_id": run_id, "input_snapshot": input_snapshot}
    if strategy == "delta":
        payload.update(mode="delta", gen=gen)
    _swap_docs_under_marker(root, payload)

    if strategy == "delta":
        _commit_delta_gen(root, gen)
        stats = _refresh_stats_terms(spark, root, run_id, input_snapshot,
                                     affected=affected, new_gen=gen)
    else:
        _rebuild_shards(spark, root, affected, n_shards, run_id,
                        input_snapshot)
        stats = _refresh_stats_terms(spark, root, run_id, input_snapshot,
                                     affected=affected)
    os.remove(_update_marker(root))
    shutil.rmtree(docs_path + ".old", ignore_errors=True)
    if strategy == "delta":
        return _maybe_autocompact(spark, root, affected, compact_after,
                                  run_id, input_snapshot, stats)
    return PhysicalIndex(root=root, stats=stats)


def delete_from_index(
    spark: SparkSession,
    root: str,
    urls: DataFrame,
    run_id: str = "del1",
    input_snapshot: str = "del1",
    strategy: str = "delta",
    compact_after: int | None = 8,
) -> PhysicalIndex:
    """Per-record delete on the physical index (the reference's delete action
    reaching the store — ESIndexDocType.cs delete path): drop every doc whose
    url appears in ``urls``. ``strategy="delta"`` (default) writes one
    tombstone generation — doclen rows with doc_len = -1 mask the doomed
    docs out of every older segment, and signed term-df adjustments keep
    df/idf exact — O(delete bytes), no re-encode until compaction.
    ``strategy="rebuild"`` re-encodes the affected shards (the r1-r6 path).
    Same crash-safe swap+marker protocol as update_index; results equal a
    full rebuild over the survivors (including df/idf shifts).

    ``urls`` must not lazily depend on this index's own docs table (the
    delete replaces those files; a caller-side plan re-evaluated afterwards
    would read gone paths) — pass a materialized or independent frame."""
    if strategy not in ("delta", "rebuild"):
        raise ValueError(f"unknown delete strategy: {strategy!r}")
    recover_update(spark, root)

    with open(os.path.join(root, "stats.json")) as f:
        stats = json.load(f)
    n_shards = int(stats["n_shards"])
    docs_path = os.path.join(root, "docs")
    from .store import docs_is_sharded, read_docs

    old_docs = read_docs(spark, root)

    urls_only = urls.select("url").distinct()
    # same pruning as update_index's existence probe: a doomed url's doc can
    # only live in the shard its (mode-recorded) id maps to
    cand_shards = _shards_of_urls(
        urls_only, stats.get("doc_id_mode", "hash"), n_shards
    )
    probe = _docs_pruned_to_shards(spark, root, old_docs, cand_shards)
    doomed = probe.join(urls_only, "url", "left_semi").persist()
    affected = sorted(
        int(r.s)
        for r in doomed.select(
            shard_of(F.col("doc_id"), n_shards).alias("s")
        ).distinct().collect()
    )
    if not affected:
        doomed.unpersist()
        return PhysicalIndex(root=root, stats=stats)

    # survivors of the affected shards only; everything else hard-links
    # (COW staging — same shape as update_index's merge)
    sharded = docs_is_sharded(docs_path)
    base = _docs_pruned_to_shards(spark, root, old_docs, affected)
    merged_aff = base.join(urls_only, "url", "left_anti")
    gen = None
    if strategy == "delta":
        gen = _deltas.next_gen(stats)
        # tombstone staging and the survivors COW merge are independent
        # pre-marker steps — overlap them (r8; same crash semantics as
        # update_index's overlapped staging)
        from concurrent.futures import ThreadPoolExecutor as _TPE

        with _TPE(max_workers=2) as _ex:
            f_stage = _ex.submit(_deltas.stage_delete_delta, spark, root,
                                 doomed, n_shards)
            f_cow = _ex.submit(_write_docs_tmp_cow, spark, docs_path,
                               merged_aff, affected if sharded else None,
                               n_shards)
            errs = []
            for f in (f_stage, f_cow):
                try:
                    f.result()
                except Exception as e:
                    errs.append(e)
            if errs:
                raise errs[0]
    else:
        _write_docs_tmp_cow(spark, docs_path, merged_aff,
                            affected if sharded else None, n_shards)
    doomed.unpersist()

    payload = {"affected": affected, "n_shards": n_shards,
               "run_id": run_id, "input_snapshot": input_snapshot}
    if strategy == "delta":
        payload.update(mode="delta", gen=gen)
    _swap_docs_under_marker(root, payload)

    if strategy == "delta":
        _commit_delta_gen(root, gen)
        stats = _refresh_stats_terms(spark, root, run_id, input_snapshot,
                                     affected=affected, new_gen=gen)
    else:
        _rebuild_shards(spark, root, affected, n_shards, run_id,
                        input_snapshot)
        stats = _refresh_stats_terms(spark, root, run_id, input_snapshot,
                                     affected=affected)
    os.remove(_update_marker(root))
    shutil.rmtree(docs_path + ".old", ignore_errors=True)
    if strategy == "delta":
        return _maybe_autocompact(spark, root, affected, compact_after,
                                  run_id, input_snapshot, stats)
    return PhysicalIndex(root=root, stats=stats)


def compact_deltas(
    spark: SparkSession,
    root: str,
    shards=None,
    run_id: str = "compact",
    input_snapshot: str | None = None,
) -> PhysicalIndex:
    """Fold delta generations into the base segments — the reference's
    delegated optimize-to-N-segments (ESIndexDefinitions.cs:452-458) over
    this layout. For each given shard (default: every shard holding delta
    data) the base is re-encoded from the merged docs table and the shard's
    delta data is purged in the same marker-protected window
    (_rebuild_shards); generations left without data drop out of
    ``delta_gens``. Deterministic and idempotent: a kill mid-compaction is
    repaired by recover_update re-running the rebuild, and the result is
    bit-identical to a fresh full build over the same corpus."""
    recover_update(spark, root)
    with open(os.path.join(root, "stats.json")) as f:
        stats = json.load(f)
    n_shards = int(stats["n_shards"])
    sg = _deltas.shard_gen_map(root)
    todo = sorted(sg) if shards is None else sorted(
        int(s) for s in shards if int(s) in sg
    )
    if not todo:
        return PhysicalIndex(root=root, stats=stats)
    if input_snapshot is None:
        input_snapshot = stats.get("input_snapshot", "compact")

    # rebuild-mode marker: recovery re-runs the fold against current docs
    marker = _update_marker(root)
    mk_tmp = marker + ".tmp"
    with open(mk_tmp, "w") as f:
        json.dump({"affected": todo, "n_shards": n_shards,
                   "run_id": run_id, "input_snapshot": input_snapshot}, f)
    os.replace(mk_tmp, marker)

    _rebuild_shards(spark, root, todo, n_shards, run_id, input_snapshot)
    stats = _refresh_stats_terms(spark, root, run_id, input_snapshot,
                                 affected=todo)
    os.remove(marker)
    return PhysicalIndex(root=root, stats=stats)


# ---- published (snapshot-isolated) index lifecycle ----
#
# update_index above mutates an index root in place: crash-safe (marker
# protocol + recover_update) but a CONCURRENT reader mid-update can observe a
# mixed state (new docs + not-yet-rebuilt postings). The published lifecycle
# below gives Iceberg-style snapshot isolation on top of it: every update
# builds a NEW generation directory that hard-links the unchanged files of
# the current one (no data copy; a changed shard is rewritten as fresh
# inodes, never mutating the old generation), then atomically flips the
# CURRENT pointer (sinks/writers.py publish_generation — the reference's
# alias-flip, ESIndexDefinitions.cs:375-541). A reader that resolved CURRENT
# before the flip keeps a complete, immutable index; one that resolves after
# sees the complete new one — never a mix. On object storage (no hard links)
# the same layout is expressed with manifest files instead — this mirrors the
# Iceberg snapshot-commit shape, which is not installable in this sandbox.


def _copy_index_tree(src: str, dst: str) -> None:
    """Recreate src's directory tree at dst with hard links to its files
    (falls back to copy when the filesystem refuses links)."""

    def _link_or_copy(s: str, d: str) -> None:
        try:
            os.link(s, d)
        except OSError:
            shutil.copy2(s, d)

    shutil.copytree(src, dst, copy_function=_link_or_copy)


def _new_gen_path(store_root: str) -> str:
    stamp = datetime.now(timezone.utc).strftime("%Y%m%d_%H%M%S_%f")
    return os.path.join(store_root, f"gen={stamp}")


def init_published_index(
    spark: SparkSession,
    pages: DataFrame,
    store_root: str,
    n_shards: int = 16,
    run_id: str = "run1",
    input_snapshot: str = "snap1",
    doc_id_mode: str = "hash",
) -> PhysicalIndex:
    """First generation: full build into gen=<stamp>/ then publish."""
    from ..sinks.writers import publish_generation

    os.makedirs(store_root, exist_ok=True)
    gen = _new_gen_path(store_root)
    pidx = build_index_resumable(
        spark, pages, gen, n_shards=n_shards, run_id=run_id,
        input_snapshot=input_snapshot, doc_id_mode=doc_id_mode,
    )
    publish_generation(store_root, gen)
    return pidx


def open_current_index(store_root: str) -> PhysicalIndex:
    from ..sinks.writers import current_generation
    from .store import open_index

    cur = current_generation(store_root)
    if cur is None:
        raise FileNotFoundError(f"no published generation under {store_root}")
    return open_index(cur)


def update_index_published(
    spark: SparkSession,
    store_root: str,
    new_pages: DataFrame,
    run_id: str = "run2",
    input_snapshot: str = "snap2",
    keep_generations: int = 2,
) -> PhysicalIndex:
    """Snapshot-isolated incremental update: copy-on-write generation +
    atomic CURRENT flip. A crash at ANY point leaves CURRENT untouched (the
    old generation stays complete and immutable); re-running produces a fresh
    generation. Old generations beyond ``keep_generations`` are removed after
    a successful publish (never the one just published)."""
    from ..sinks.writers import current_generation, publish_generation

    cur = current_generation(store_root)
    if cur is None:
        raise FileNotFoundError(f"no published generation under {store_root}")
    new_gen = _new_gen_path(store_root)
    _copy_index_tree(cur, new_gen)
    try:
        pidx = update_index(
            spark, new_gen, new_pages, run_id=run_id,
            input_snapshot=input_snapshot,
        )
    except BaseException:
        # abandoned generation: CURRENT never moved, readers unaffected
        shutil.rmtree(new_gen, ignore_errors=True)
        raise
    publish_generation(store_root, new_gen)
    # GC: NEVER remove the generation just published or the one readers may
    # still hold (the pre-flip CURRENT) — a hard-killed update can leave an
    # orphaned gen dir on disk, and counting it toward keep_generations could
    # otherwise evict the live predecessor. Beyond those two protected dirs,
    # keep the newest (keep_generations - 2) others; single-writer contract
    # makes everything else (older published gens, crash orphans) disposable.
    if keep_generations > 0:
        gens = sorted(
            os.path.join(store_root, d)
            for d in os.listdir(store_root)
            if d.startswith("gen=") and os.path.isdir(os.path.join(store_root, d))
        )
        protected = {new_gen, cur}
        others = [g for g in gens if g not in protected]
        spare = max(0, keep_generations - len(protected))
        for g in others[: len(others) - spare if spare else None]:
            shutil.rmtree(g, ignore_errors=True)
    return pidx


def compact_index_published(
    spark: SparkSession,
    store_root: str,
    shards=None,
    run_id: str = "compact",
    keep_generations: int = 2,
) -> PhysicalIndex:
    """Snapshot-isolated compaction: fold delta generations inside a NEW
    COW generation directory and atomically flip CURRENT — readers of the
    published generation never observe the fold in progress (compact_deltas
    mutates a root in place, which is only safe under the single-writer /
    no-concurrent-reader contract). Same crash story as
    update_index_published: an abandoned generation leaves CURRENT
    untouched."""
    from ..sinks.writers import current_generation, publish_generation

    cur = current_generation(store_root)
    if cur is None:
        raise FileNotFoundError(f"no published generation under {store_root}")
    if not _deltas.shard_gen_map(cur):
        return open_current_index(store_root)  # nothing to fold
    new_gen = _new_gen_path(store_root)
    _copy_index_tree(cur, new_gen)
    try:
        pidx = compact_deltas(spark, new_gen, shards=shards, run_id=run_id)
    except BaseException:
        shutil.rmtree(new_gen, ignore_errors=True)
        raise
    publish_generation(store_root, new_gen)
    if keep_generations > 0:
        gens = sorted(
            os.path.join(store_root, d)
            for d in os.listdir(store_root)
            if d.startswith("gen=") and os.path.isdir(os.path.join(store_root, d))
        )
        protected = {new_gen, cur}
        others = [g for g in gens if g not in protected]
        spare = max(0, keep_generations - len(protected))
        for g in others[: len(others) - spare if spare else None]:
            shutil.rmtree(g, ignore_errors=True)
    return pidx


def classify_snapshot(
    new_pages: DataFrame, existing_docs: DataFrame
) -> DataFrame:
    """Adds ``exist_state`` per incoming url:
    NotExist / ExistOlder / ExistSame / ExistNewer — the reference's
    existence probe (ESIndexDocType.cs:73-118) as one batch left join instead
    of a per-record network round-trip."""
    ex = existing_docs.select(
        F.col("url").alias("url"), F.col("warc_ts").alias("old_ts")
    )
    joined = new_pages.join(ex, "url", "left")
    state = (
        F.when(F.col("old_ts").isNull(), "NotExist")
        .when(F.col("old_ts") < F.col("warc_ts"), "ExistOlder")
        .when(F.col("old_ts") == F.col("warc_ts"), "ExistSame")
        .otherwise("ExistNewer")
    )
    return joined.withColumn("exist_state", state).drop("old_ts")


def incremental_pages(new_pages: DataFrame, existing_docs: DataFrame) -> DataFrame:
    """Pages to (re)index: new urls + re-crawls newer than the indexed copy
    (skip ExistSame/ExistNewer — StreamDatasourceBase.cs:110-134)."""
    classified = classify_snapshot(new_pages, existing_docs)
    return classified.where(
        F.col("exist_state").isin("NotExist", "ExistOlder")
    ).drop("exist_state")
