"""Post-processor equivalents: sort, top-k, unique, repeat, map-reduce/undup.

The reference's entire post-processing machine
(/root/reference/ImportPipeline/PostProcessors/*) collapses into declarative
DataFrame ops — the hash fan-out + per-bucket sort + spill of
MapReduceProcessor (MapReduceProcessor.cs:43-330,
FileBasedMapperWriters.cs:43-137) *is* Spark's shuffle; Catalyst supplies
partial+final aggregation, external sort and AQE skew handling for free.

Key-typing semantics preserved from JComparer (PostProcessors/JComparer.cs):
- case-insensitive keys sort/group on lower(col)        (JComparer.cs:195-268)
- empty string ≡ null for keys                          (JComparer.cs:125-139)
- nulls first on ascending (reference: null < any value, JComparer.cs:277-303)
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import List, Optional

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.window import Window


@dataclass
class SortKey:
    """KeyAndType equivalent (PostProcessors/KeyAndType.cs:38)."""

    field: str
    typed: str = "string"  # string|int|long|double|date
    descending: bool = False
    case_insensitive: bool = False

    def expr(self) -> Column:
        c = F.col(self.field)
        if self.typed == "string":
            c = F.nullif(c, F.lit(""))  # empty ≡ null (JComparer.cs:125-139)
            if self.case_insensitive:
                c = F.lower(c)
        elif self.typed in ("int", "long"):
            c = c.cast("long")
        elif self.typed == "double":
            c = c.cast("double")
        elif self.typed == "date":
            c = c.cast("timestamp")
        return c

    def order(self) -> Column:
        e = self.expr()
        # null < any value (JComparer.cs:277-303): nulls first asc, last desc
        return e.desc_nulls_last() if self.descending else e.asc_nulls_first()


def sort_processor(df: DataFrame, keys: List[SortKey]) -> DataFrame:
    """SortProcessor (PostProcessors/SortProcessor.cs:71-234) minus the
    undup step — see map_reduce for undup."""
    return df.orderBy(*[k.order() for k in keys])


def top_processor(
    df: DataFrame, keys: List[SortKey], n: int, per_group: Optional[List[str]] = None
) -> DataFrame:
    """TopProcessor (PostProcessors/TopProcessor.cs:38-115): global top-N via
    TakeOrderedAndProject; per-group top-N via window row_number (the
    reference's priority queue generalized)."""
    order = [k.order() for k in keys]
    if per_group is None:
        return df.orderBy(*order).limit(n)
    w = Window.partitionBy(*per_group).orderBy(*order)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= n)
        .drop("__rn")
    )


def unique_processor(
    df: DataFrame, keys: List[SortKey], order_by: Optional[List[SortKey]] = None
) -> DataFrame:
    """UniqueProcessor (PostProcessors/UniqueProcessor.cs:35-99): first record
    per typed key tuple wins. The reference's 'first' is input order; in a
    distributed setting 'first' must be defined by an explicit order_by —
    pass the same keys the upstream sort used."""
    key_exprs = [k.expr().alias(f"__k{i}") for i, k in enumerate(keys)]
    if order_by is None:
        return df.dropDuplicates([k.field for k in keys])
    w = Window.partitionBy(*key_exprs).orderBy(*[k.order() for k in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


def repeat_processor(df: DataFrame, n: int) -> DataFrame:
    """RepeatProcessor (PostProcessors/RepeatProcessor.cs:35-76): emit each
    record n times with a copy index."""
    return df.withColumn(
        "copy_id", F.explode(F.sequence(F.lit(0), F.lit(n - 1)))
    )


# ---- map-reduce / undup actions ----

@dataclass
class UndupAction:
    """UndupActions (PostProcessors/UndupActions.cs:78-270)."""

    kind: str  # add|max|min|mean|count|first
    field: Optional[str] = None
    dest: Optional[str] = None
    int_mode: bool = False  # mean: integer division (UndupActions.cs:171-191)

    def agg(self) -> Column:
        d = self.dest or self.field
        c = F.col(self.field) if self.field else None
        if self.kind == "add":
            return F.sum(c).alias(d)
        if self.kind == "max":
            return F.max(c).alias(d)
        if self.kind == "min":
            return F.min(c).alias(d)
        if self.kind == "mean":
            if self.int_mode:
                # integer division semantics (UndupActions.cs:171-191)
                return F.floor(F.sum(c.cast("long")) / F.count(c)).cast("long").alias(d)
            return F.avg(c).alias(d)
        if self.kind == "count":
            return F.count(F.lit(1)).alias(d)
        if self.kind == "first":
            return F.first(c).alias(d)
        raise ValueError(f"unknown undup action {self.kind!r}")


def map_reduce(
    df: DataFrame,
    undup_keys: List[SortKey],
    actions: List[UndupAction],
) -> DataFrame:
    """MapReduceProcessor (PostProcessors/MapReduceProcessor.cs:43-330).

    The reference's fan-out hash + bucket sort + adjacent-group undup is
    semantically groupBy(undup_keys).agg(...) — Catalyst plans partial
    (map-side) + final aggregation, which is the fan-out/combine the
    reference hand-rolled. Typed/CI/empty≡null key semantics preserved via
    SortKey.expr().
    """
    keys = [k.expr().alias(k.field) for k in undup_keys]
    return df.groupBy(*keys).agg(*[a.agg() for a in actions])


def map_reduce_passthrough_split(
    df: DataFrame, undup_keys: List[SortKey], max_null_index: int
):
    """max_null_index bypass (MapReduceProcessor.cs:293-301,
    FileBasedMapperWriters.cs:146-163): records whose first-null-key index
    exceeds max_null_index skip the shuffle. Returns (to_shuffle, passthrough).
    """
    first_null = F.coalesce(
        *[
            F.when(undup_keys[i].expr().isNull(), F.lit(i))
            for i in range(len(undup_keys))
        ],
        F.lit(len(undup_keys)),
    )
    passthrough = df.where(first_null > max_null_index)
    to_shuffle = df.where(first_null <= max_null_index)
    return to_shuffle, passthrough
