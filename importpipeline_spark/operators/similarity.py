"""Similarity search over embedding columns (array<float>).

- brute-force cosine top-k: JVM-side F.aggregate/zip_with dot products —
  exact baseline, one pass over the table, TakeOrderedAndProject top-k.
- LSH-bucketed ANN (random hyperplanes): deterministic projection vectors
  (seeded per plane), sign-bit bucket code, candidates share a bucket in at
  least one of several code books; exact cosine on candidates only. This is
  the 100-TB path: bucketing is a groupBy, per-bucket work is bounded.
- IVF-style variant: coarse centroids via deterministic sampling + one
  assignment pass (kmeans-lite), probe nearest cells only.
"""

from __future__ import annotations

from typing import Iterator, List, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from .dedup import DEFAULT_MAX_BUCKET, _cap_buckets


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, v: acc + v,
        )
    )


def cosine_topk_bruteforce(
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k against one query vector. Returns (id, cosine)."""
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    qn = float(np.linalg.norm(np.asarray(query_vec, dtype=np.float64)))
    cos = (_dot(F.col(vec_col), q) / (_norm(F.col(vec_col)) * F.lit(qn))).alias("cosine")
    return (
        df.select(F.col(id_col), cos)
        .orderBy(F.col("cosine").desc(), F.col(id_col).asc())
        .limit(k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> List[List[float]]:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).tolist()


def lsh_bucket_code(vec_col, planes: List[List[float]]):
    """Sign-bit code over random hyperplanes → long bucket id."""
    code = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        proj = _dot(vec_col, F.array(*[F.lit(float(x)) for x in p]))
        code = code + F.when(proj > 0, F.lit(1 << i).cast("long")).otherwise(F.lit(0).cast("long"))
    return code


def cosine_topk_lsh(
    spark: SparkSession,
    df: DataFrame,
    query_vec: Sequence[float],
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 8,
    n_tables: int = 4,
    seed: int = 42,
    multiprobe: bool = False,
) -> DataFrame:
    """ANN: score only vectors sharing an LSH bucket with the query in any of
    n_tables code books. Approximate (recall tested vs brute force).

    ``multiprobe=True`` additionally probes, per table, every bucket at
    hamming distance 1 from the query's code (flip one sign bit) — the
    standard multi-probe LSH recall boost (near misses land one bit away far
    more often than d bits away), costing n_planes extra bucket probes per
    table instead of extra tables. The probe set stays a map-side isin
    filter, so the scale shape is unchanged."""
    dim = len(query_vec)
    qv = np.asarray(query_vec, dtype=np.float64)
    keep = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + t)
        qcode = 0
        for i, p in enumerate(planes):
            if float(np.dot(qv, np.asarray(p))) > 0:
                qcode |= 1 << i
        code = lsh_bucket_code(F.col(vec_col), planes)
        if multiprobe:
            probes = [qcode] + [qcode ^ (1 << i) for i in range(n_planes)]
            cond = code.isin(probes)
        else:
            cond = code == F.lit(qcode)
        keep = cond if keep is None else (keep | cond)
    cands = df.where(keep)
    return cosine_topk_bruteforce(cands, query_vec, k, vec_col, id_col)


def _make_assign_udf(spark: SparkSession, centroids: List[List[float]]):
    """cell = argmax cosine vs a BROADCAST numpy centroid matrix, computed in
    one Arrow-batched matmul per batch. At real IVF sizes (thousands of
    cells × hundreds of dims) this replaces an n_cells-wide literal
    expression tree with a (batch × dim) @ (dim × n_cells) BLAS call.

    Returns (udf, broadcast handle) — the caller destroys the broadcast once
    every plan using the udf has executed (a multi-MB matrix per Lloyd round
    would otherwise pin driver+executor memory for the session lifetime)."""
    M = np.asarray(centroids, dtype=np.float64)
    norms = np.linalg.norm(M, axis=1)
    norms[norms == 0.0] = 1.0
    bc = spark.sparkContext.broadcast(M / norms[:, None])

    @F.pandas_udf("int")
    def assign(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
        Mn = bc.value.T  # (dim, n_cells)
        for s in batches:
            X = np.stack(s.to_numpy())  # (batch, dim); x-norm cancels in argmax
            yield pd.Series(np.argmax(X @ Mn, axis=1).astype("int32"))

    return assign, bc


def ivf_build(
    df: DataFrame,
    n_cells: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """IVF coarse quantizer: deterministic kmeans-lite.

    Init = the n_cells vectors with the smallest ids (deterministic, no RNG
    on data); ``iters`` Lloyd rounds. Per round: assignment is a map-side
    pandas_udf against the broadcast centroid matrix (no expression tree, no
    per-row Python); the centroid update is ONE grouped applyInPandas whose
    output is n_cells rows of array<double> — the only thing pulled to the
    driver per round is that n_cells×dim matrix, the same thing MLlib KMeans
    collects between Lloyd rounds (the next round's broadcast needs it).
    Returns (df + 'cell' column, centroids).
    """
    spark = df.sparkSession
    seed_rows = df.orderBy(F.col(id_col).asc()).limit(n_cells).collect()
    centroids = [[float(x) for x in r[vec_col]] for r in seed_rows]

    def mean_kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        X = np.stack(pdf["__v"].to_numpy())
        return pd.DataFrame(
            {"cell": pdf["cell"].iloc[:1], "centroid": [X.mean(axis=0).tolist()]}
        )

    for _ in range(iters):
        assign, bc = _make_assign_udf(spark, centroids)
        assigned = df.select(
            F.col(vec_col).alias("__v"), assign(F.col(vec_col)).alias("cell")
        )
        rows = (
            assigned.groupBy("cell")
            .applyInPandas(mean_kernel, "cell int, centroid array<double>")
            .collect()  # ≤ n_cells rows — the per-round broadcast payload
        )
        bc.destroy()  # round done; don't pin a matrix per round forever
        new_c = [list(c) for c in centroids]
        for r in rows:
            new_c[int(r.cell)] = [float(x) for x in r.centroid]
        centroids = new_c
    # the final assignment's broadcast must outlive the returned lazy frame;
    # it is handed to the caller via broadcast_deps so long-lived sessions
    # can destroy it once the frame is materialized (dedup.release_cache)
    assign, final_bc = _make_assign_udf(spark, centroids)
    out = df.withColumn("cell", assign(F.col(vec_col)))
    out.broadcast_deps = [final_bc]
    return out, centroids


def cosine_topk_ivf(
    df_with_cells: DataFrame,
    centroids: List[List[float]],
    query_vec: Sequence[float],
    k: int = 10,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN via IVF: probe the n_probe cells whose centroids are nearest the
    query; exact cosine within probed cells only."""
    q = np.asarray(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q) or 1.0
    sims = []
    for i, c in enumerate(centroids):
        cv = np.asarray(c, dtype=np.float64)
        cn = np.linalg.norm(cv) or 1.0
        sims.append((float(cv @ q) / (cn * qn), i))
    probe = [i for _, i in sorted(sims, reverse=True)[:n_probe]]
    cands = df_with_cells.where(F.col("cell").isin(probe))
    return cosine_topk_bruteforce(cands, query_vec, k, vec_col, id_col)


def embedding_neardup_pairs(
    df: DataFrame,
    threshold: float = 0.95,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = 12,
    n_tables: int = 3,
    seed: int = 42,
    max_bucket_size: int | None = DEFAULT_MAX_BUCKET,
    log_dropped: bool = True,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via hyperplane-LSH blocking +
    exact cosine verification on candidates.

    ``max_bucket_size`` cuts degenerate buckets (e.g. zero vectors all land
    in code 0 of every table) before the within-bucket self-join — see
    dedup._cap_buckets. None = uncapped. The result carries ``cap_reports``
    (per-table drop counts) and ``cached_deps`` (release with
    dedup.release_cache after materializing)."""

    first = df.select(F.size(vec_col).alias("d")).first()
    dim = int(first.d)
    base = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), _norm(F.col(vec_col)).alias("nrm")
    )
    cands = None
    cap_reports, cached = [], []
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + t)
        # persist per table: the bucket-code projection feeds the eager
        # hot-bucket detection and both self-join sides
        coded = base.withColumn(
            "bucket", lsh_bucket_code(F.col("v"), planes)
        ).persist()
        cached.append(coded)
        coded, rep = _cap_buckets(coded, ["bucket"], max_bucket_size, log_dropped)
        cap_reports.append(rep)
        a, b = coded.alias("a"), coded.alias("b")
        pair = a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.id") < F.col("b.id")),
        ).select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.v").alias("va"),
            F.col("b.v").alias("vb"),
            F.col("a.nrm").alias("na"),
            F.col("b.nrm").alias("nb"),
        )
        cands = pair if cands is None else cands.unionByName(pair)
    cands = cands.dropDuplicates(["id_a", "id_b"])
    out = (
        cands.withColumn("cosine", _dot("va", "vb") / (F.col("na") * F.col("nb")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
    out.cap_reports = cap_reports
    out.cached_deps = cached
    return out
