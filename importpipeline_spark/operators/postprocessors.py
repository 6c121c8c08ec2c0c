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
from typing import Callable, List, Optional

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import StructType
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
    """UndupActions (PostProcessors/UndupActions.cs:78-270).

    kind="script" is UndupScriptAction (UndupActions.cs:100-153): ``fn``
    receives the group's records as a pandas DataFrame (sorted by
    ``order_by``; aggregate columns from the other actions already applied)
    and returns the records to emit for that group — an empty frame is the
    reference's ctx.ActionFlags=Skip, None means the default undup emit (the
    group's first record). See map_reduce."""

    kind: str  # add|max|min|mean|count|first|script
    field: Optional[str] = None
    dest: Optional[str] = None
    int_mode: bool = False  # mean: integer division (UndupActions.cs:171-191)
    fn: Optional[Callable[[pd.DataFrame], Optional[pd.DataFrame]]] = None

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
    order_by: Optional[List[SortKey]] = None,
) -> DataFrame:
    """MapReduceProcessor (PostProcessors/MapReduceProcessor.cs:43-330).

    The reference's fan-out hash + bucket sort + adjacent-group undup is
    semantically groupBy(undup_keys).agg(...) — Catalyst plans partial
    (map-side) + final aggregation, which is the fan-out/combine the
    reference hand-rolled. Typed/CI/empty≡null key semantics preserved via
    SortKey.expr().

    With a kind="script" action (UndupScriptAction, UndupActions.cs:100-153;
    blackbox usage UnitTests/data/blackbox/import.xml:84 — "skip groups of
    size 1") the plan switches to groupBy(keys).applyInPandas: each group's
    records — intra-group order pinned by ``order_by`` (required; the
    reference's record order is the upstream sorter's) — get the aggregate
    actions applied as group-level columns, then ``fn`` decides what to emit.
    The reference wrote aggregates onto the group's FIRST record and emitted
    that record unless the script set Skip; here the aggregate is visible on
    every record handed to the script and the default emit (fn returns None)
    is the first record — observably identical output. This stays one
    shuffle: partial aggregation is lost (the script needs whole groups), but
    that is inherent to an arbitrary per-group function.
    """
    script_actions = [a for a in actions if a.kind == "script"]
    agg_actions = [a for a in actions if a.kind != "script"]
    if not script_actions:
        keys = [k.expr().alias(k.field) for k in undup_keys]
        return df.groupBy(*keys).agg(*[a.agg() for a in actions])

    if len(script_actions) > 1:
        raise ValueError("at most one script undup action per map_reduce")
    fn = script_actions[0].fn
    if fn is None:
        raise ValueError("script undup action requires fn")
    if order_by is None:
        raise ValueError(
            "script undup action requires order_by — a distributed group has "
            "no input order; pin the order the reference's sorter provided"
        )

    # output schema: the record columns + aggregate dest columns typed by the
    # same Catalyst agg expressions the non-script path uses (limit(0) probe
    # is plan-only, no job)
    out_schema = StructType(list(df.schema.fields))
    if agg_actions:
        probe = df.limit(0).groupBy().agg(*[a.agg() for a in agg_actions]).schema
        for f in probe.fields:
            out_schema = out_schema.add(f)
    agg_names = [f.name for f in out_schema.fields[len(df.schema.fields):]]

    record_cols = list(df.columns)
    sort_cols = [f"__ob{i}" for i in range(len(order_by))]
    sort_asc = [not k.descending for k in order_by]
    key_aliases = [f"__mk{i}" for i in range(len(undup_keys))]
    with_keys = df.select(
        *record_cols,
        *[k.expr().alias(a) for k, a in zip(undup_keys, key_aliases)],
        *[k.expr().alias(a) for k, a in zip(order_by, sort_cols)],
    )

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        # multi-key stable sort, last key first; null < any value
        # (JComparer.cs:277-303): nulls first asc, last desc — per key
        for col_name, asc in reversed(list(zip(sort_cols, sort_asc))):
            pdf = pdf.sort_values(
                col_name, ascending=asc, kind="mergesort",
                na_position="first" if asc else "last",
            )
        pdf = pdf[record_cols].reset_index(drop=True)
        for a in agg_actions:
            d = a.dest or a.field
            col = pdf[a.field] if a.field else None
            if a.kind == "add":
                v = col.sum(min_count=1)  # all-null → null, like F.sum
            elif a.kind == "max":
                v = col.max()
            elif a.kind == "min":
                v = col.min()
            elif a.kind == "mean":
                if a.int_mode:
                    # floor(sum(per-value truncations)/count-of-non-null) —
                    # identical to the agg path's F.sum(c.cast('long'))/F.count
                    # (UndupActions.cs:171-191); all-null group → null
                    cnt = int(col.count())
                    if cnt == 0:
                        v = None
                    else:
                        import numpy as _np

                        v = int(
                            _np.trunc(
                                col.dropna().to_numpy(dtype="float64")
                            ).sum()
                        ) // cnt
                else:
                    v = col.mean()
            elif a.kind == "count":
                v = len(pdf)
            elif a.kind == "first":
                v = col.iloc[0]
            else:
                raise ValueError(f"unknown undup action {a.kind!r}")
            pdf[d] = v
        out = fn(pdf)
        if out is None:
            out = pdf.iloc[:1]
        return out

    return (
        with_keys.groupBy(*key_aliases)
        .applyInPandas(lambda pdf: kernel(pdf), out_schema)
    )


def skip_singleton_groups(pdf: pd.DataFrame) -> Optional[pd.DataFrame]:
    """The reference blackbox suite's script body (import.xml:84-88):
    ``if (len == 1) ctx.ActionFlags = _ActionFlags.Skip`` — drop groups with
    a single record, default-emit the rest."""
    return pdf.iloc[0:0] if len(pdf) == 1 else None


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
