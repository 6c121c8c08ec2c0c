"""Block-max WAND top-k over the compressed posting store.

Query lifecycle (rebuild of the reference's delegated ES search path —
Endpoints/ESIndexDocType.cs:193-202; analysis chain index.config.js:66-76):

  query string → analyzer v1 (same UDF path as indexing) → dictionary lookup
  (terms parquet, predicate-pushed) → posting scan pruned to query terms
  (partitioned by doc-range shard; term predicate pushed to row groups) →
  per-shard block-max pruned scoring inside applyInPandas (numpy) → global
  top-k merge: orderBy(score DESC, doc_id ASC).limit(k) over ≤ k·shards rows.

Pruning strategy — *interval-sweep block-max* (exact, fully vectorized):
block boundaries of all query terms cut the shard's doc-id space into
elementary intervals; each interval's upper bound is the sum of the covering
blocks' max scores (the classic block-max WAND bound, Ding & Suel 2011,
computed here with a difference array instead of per-doc pivoting so the hot
path stays in numpy). Intervals are processed in descending-bound order,
scoring candidates exactly and maintaining the running top-k threshold θ;
processing stops when the next bound < θ. Docs in skipped intervals provably
can't enter the top-k (bounds get a 1+1e-12 safety margin against float
summation-order effects). Scores accumulate per doc in ascending term order
(float64), bit-identical to the exhaustive oracle.
"""

from __future__ import annotations

import math
from typing import Dict, List

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .build import K1, B
from .codec import from_u64, to_u64, varint_decode
from .search import analyze_query
from .store import PhysicalIndex

_UB_MARGIN = 1.0 + 1e-12

CAND_SCHEMA = "doc_id long, score double"


def _lucene_idf(df: int, n: int) -> float:
    return math.log(1.0 + (n - df + 0.5) / (df + 0.5))


def make_wand_kernel(
    idf_map: Dict[str, float], avgdl: float, k: int, k1: float = K1, b: float = B
):
    """Builds the per-shard cogrouped kernel: (postings, doclen) → ≤k rows."""
    terms_sorted = sorted(idf_map)
    tcode_map = {t: i for i, t in enumerate(terms_sorted)}
    idf_arr = np.array([idf_map[t] for t in terms_sorted], dtype=np.float64)

    def kernel(post_pdf: pd.DataFrame, dl_pdf: pd.DataFrame) -> pd.DataFrame:
        if post_pdf.empty or dl_pdf.empty:
            return pd.DataFrame({"doc_id": [], "score": []}).astype(
                {"doc_id": "int64", "score": "float64"}
            )
        # doclen lookup arrays (sorted by doc key)
        dl_u = to_u64(dl_pdf["doc_id"].to_numpy(dtype=np.int64))
        dl_order = np.argsort(dl_u)
        dl_u = dl_u[dl_order]
        dl_v = dl_pdf["doc_len"].to_numpy(dtype=np.float64)[dl_order]

        nb = len(post_pdf)
        min_u = post_pdf["min_doc"].to_numpy(dtype=np.int64).view(np.uint64)
        max_u = post_pdf["max_doc"].to_numpy(dtype=np.int64).view(np.uint64)
        ns = post_pdf["n"].to_numpy(dtype=np.int64)
        tcodes = post_pdf["term"].map(tcode_map).to_numpy(dtype=np.int64)
        docs_enc = post_pdf["docs_enc"].to_numpy(dtype=object)
        tfs_enc = post_pdf["tfs_enc"].to_numpy(dtype=object)
        # per-block upper bound from stats-independent metadata: the BM25
        # contribution is ↑ in tf and ↓ in dl, so score(max_tf, min_dl)
        # bounds every member under the *current* global stats — blocks stay
        # valid when incremental updates shift N/avgdl/df
        max_tf = post_pdf["max_tf"].to_numpy(dtype=np.float64)
        min_dl = post_pdf["min_dl"].to_numpy(dtype=np.float64)
        ms = (
            idf_arr[tcodes]
            * max_tf
            * (k1 + 1.0)
            / (max_tf + k1 * (1.0 - b + b * min_dl / avgdl))
        ) * _UB_MARGIN

        # elementary intervals over the shard's doc space
        points = np.unique(np.concatenate([min_u, max_u + np.uint64(1)]))
        i0 = np.searchsorted(points, min_u, side="left")
        i1 = np.searchsorted(points, max_u + np.uint64(1), side="left")
        n_iv = len(points) - 1
        diff = np.zeros(n_iv + 1, dtype=np.float64)
        np.add.at(diff, i0, ms)
        np.add.at(diff, i1, -ms)
        ub = np.cumsum(diff)[:n_iv]

        iv_blocks: List[List[int]] = [[] for _ in range(n_iv)]
        for bi in range(nb):
            for j in range(i0[bi], i1[bi]):
                iv_blocks[j].append(bi)

        order_iv = np.argsort(-ub, kind="stable")
        top_docs = np.empty(0, dtype=np.uint64)
        top_scores = np.empty(0, dtype=np.float64)
        theta = -np.inf
        decoded: Dict[int, tuple] = {}

        def decode(bi: int):
            got = decoded.get(bi)
            if got is not None:
                return got
            deltas = varint_decode(docs_enc[bi], int(ns[bi]))
            du = min_u[bi] + np.cumsum(deltas, dtype=np.uint64)
            tf = varint_decode(tfs_enc[bi], int(ns[bi])).astype(np.float64)
            dl = dl_v[np.searchsorted(dl_u, du)]
            idf = idf_arr[tcodes[bi]]
            contrib = idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * dl / avgdl))
            decoded[bi] = (du, contrib)
            return decoded[bi]

        for j in order_iv:
            bound = ub[j]
            if bound <= 0.0:
                break
            if len(top_scores) == k and bound < theta:
                break
            lo, hi = points[j], points[j + 1]
            # ascending term order → canonical float accumulation per doc
            blocks = sorted(iv_blocks[j], key=lambda bi: tcodes[bi])
            d_parts, c_parts = [], []
            for bi in blocks:
                du, contrib = decode(bi)
                s0 = np.searchsorted(du, lo, side="left")
                s1 = np.searchsorted(du, hi, side="left")
                if s0 == s1:
                    continue
                d_parts.append(du[s0:s1])
                c_parts.append(contrib[s0:s1])
            if not d_parts:
                continue
            docs = np.concatenate(d_parts)
            contribs = np.concatenate(c_parts)
            srt = np.argsort(docs, kind="stable")  # stable: keeps term order per doc
            docs = docs[srt]
            contribs = contribs[srt]
            starts = np.nonzero(np.concatenate(([True], docs[1:] != docs[:-1])))[0]
            seg_docs = docs[starts]
            # strictly sequential left-to-right per-segment summation (ascending
            # term order) — np.add.reduceat would use pairwise reduction and
            # drift a ulp from the oracle's accumulation order
            lengths = np.diff(np.concatenate((starts, [len(docs)])))
            seg_scores = np.zeros(len(starts), dtype=np.float64)
            for p in range(int(lengths.max())):
                m = lengths > p
                seg_scores[m] += contribs[starts[m] + p]
            # merge into running top-k (tie-break: score DESC, doc ASC)
            all_docs = np.concatenate([top_docs, seg_docs])
            all_scores = np.concatenate([top_scores, seg_scores])
            ord2 = np.lexsort((all_docs, -all_scores))[:k]
            top_docs = all_docs[ord2]
            top_scores = all_scores[ord2]
            if len(top_scores) == k:
                theta = top_scores[-1]

        return pd.DataFrame(
            {"doc_id": from_u64(top_docs), "score": top_scores}
        )

    return kernel


def bm25_topk_wand(
    spark: SparkSession,
    pidx: PhysicalIndex,
    query: str,
    k: int = 10,
) -> DataFrame:
    """Top-k via the compressed store. Rank-identical to the exhaustive path."""
    terms = analyze_query(query)
    n = pidx.stats["n_docs"]
    avgdl = pidx.stats["avgdl"] or 1.0
    empty = spark.createDataFrame([], CAND_SCHEMA)
    if not terms or n == 0:
        return empty
    # dictionary lookup (predicate pushed into the terms parquet scan)
    dict_rows = (
        spark.read.parquet(pidx.terms_path)
        .where(F.col("term").isin(terms))
        .collect()
    )
    idf_map = {r.term: _lucene_idf(int(r.df), n) for r in dict_rows}
    if not idf_map:
        return empty
    postings = spark.read.parquet(pidx.postings_path).where(
        F.col("term").isin(list(idf_map))
    )
    # shard pruning: tail terms touch few shards — read their doc-length
    # partitions only (partition-pruned parquet scan). The tiny distinct()
    # job reads postings metadata already filtered by the term predicate.
    shards = [r.shard for r in postings.select("shard").distinct().collect()]
    if not shards:
        return empty
    postings = postings.where(F.col("shard").isin(shards))
    doclen = spark.read.parquet(pidx.doclen_path).where(F.col("shard").isin(shards))
    kernel = make_wand_kernel(idf_map, avgdl, k)
    cands = (
        postings.groupBy("shard")
        .cogroup(doclen.groupBy("shard"))
        .applyInPandas(lambda l, r: kernel(l, r), CAND_SCHEMA)
    )
    return cands.orderBy(F.col("score").desc(), F.col("doc_id").asc()).limit(k)
