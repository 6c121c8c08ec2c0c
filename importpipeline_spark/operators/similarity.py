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

from typing import List, Sequence

import numpy as np
from pyspark.sql import DataFrame, SparkSession, functions as F


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


def _assign_cell(vec_col, centroids: List[List[float]]):
    """cell = argmax cosine vs broadcast centroid list (JVM-side exprs)."""
    sims = []
    for c in centroids:
        cn = float(np.linalg.norm(np.asarray(c, dtype=np.float64))) or 1.0
        sims.append(_dot(vec_col, F.array(*[F.lit(float(x)) for x in c])) / F.lit(cn))
    arr = F.array(*sims)
    return (F.array_position(arr, F.array_max(arr)) - 1).cast("int")


def ivf_build(
    df: DataFrame,
    n_cells: int = 16,
    iters: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
):
    """IVF coarse quantizer: deterministic kmeans-lite.

    Init = the n_cells vectors with the smallest ids (deterministic, no RNG
    on data); `iters` Lloyd rounds where assignment is a broadcast argmax and
    centroid recompute is one explode+groupBy per round. Returns
    (df + 'cell' column, centroids). Scale path: assignment is map-side; the
    only wide op per round is the per-(cell, dim) mean.
    """
    seed_rows = df.orderBy(F.col(id_col).asc()).limit(n_cells).collect()
    centroids = [[float(x) for x in r[vec_col]] for r in seed_rows]
    for _ in range(iters):
        assigned = df.withColumn("cell", _assign_cell(F.col(vec_col), centroids))
        means = (
            assigned.select("cell", F.posexplode(vec_col).alias("dim", "v"))
            .groupBy("cell", "dim")
            .agg(F.avg("v").alias("m"))
            .collect()
        )
        new_c = [list(c) for c in centroids]
        by_cell: dict = {}
        for r in means:
            by_cell.setdefault(r.cell, {})[r.dim] = r.m
        for cell, dims in by_cell.items():
            for d, m in dims.items():
                new_c[cell][d] = float(m)
        centroids = new_c
    out = df.withColumn("cell", _assign_cell(F.col(vec_col), centroids))
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
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via hyperplane-LSH blocking +
    exact cosine verification on candidates."""
    first = df.select(F.size(vec_col).alias("d")).first()
    dim = int(first.d)
    base = df.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"), _norm(F.col(vec_col)).alias("nrm")
    )
    cands = None
    for t in range(n_tables):
        planes = _hyperplanes(dim, n_planes, seed + t)
        coded = base.withColumn("bucket", lsh_bucket_code(F.col("v"), planes))
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
    return (
        cands.withColumn("cosine", _dot("va", "vb") / (F.col("na") * F.col("nb")))
        .where(F.col("cosine") >= threshold)
        .select("id_a", "id_b", "cosine")
    )
