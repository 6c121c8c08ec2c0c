"""The reference's Condition mini-language as Spark Column predicates.

Reference: string-parsed ``"field,op,value"`` conditions —
/root/reference/ImportPipeline/Conditions/Condition.cs:103-164; typed
compares 38-79 (String ordinal w/ optional case-insensitivity,
StringCondition 213-254; LongCondition 365-397; DoubleCondition 331-363),
IsNull 167-179, IsNullOrEmpty 180-211, SubString 256-290, Regex 292-328,
Not modifier 38/74-79.

Null semantics: in reference conditions a null field compares as -1 (less
than any value — Condition.cs:227-231), which matches Spark's null-safe
handling here by explicit isNull branches.
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_OPS = {"eq", "ne", "lt", "lte", "gt", "gte", "null", "nullorempty",
        "substring", "regex"}


def condition(
    field: str,
    op: str,
    value=None,
    *,
    typed: str = "string",
    case_insensitive: bool = False,
    negate: bool = False,
) -> Column:
    """Build a predicate Column. ``typed`` ∈ {string,int,long,double,date}."""
    op = op.lower()
    if op not in _OPS:
        raise ValueError(f"unknown condition op {op!r}")
    c = F.col(field)
    if op == "null":
        pred = c.isNull()
    elif op == "nullorempty":
        pred = c.isNull() | (c.cast("string") == F.lit(""))
    elif op == "substring":
        pred = (
            F.lower(c).contains(str(value).lower())
            if case_insensitive
            else c.contains(value)
        )
    elif op == "regex":
        pred = c.rlike(value)
    else:
        if typed in ("int", "long"):
            c = c.cast("long")
            v = F.lit(int(value))
        elif typed == "double":
            c = c.cast("double")
            v = F.lit(float(value))
        elif typed == "date":
            c = c.cast("timestamp")
            v = F.lit(value).cast("timestamp")
        else:
            if case_insensitive:
                c = F.lower(c)
                v = F.lit(str(value).lower())
            else:
                v = F.lit(value)
        pred = {
            "eq": c == v,
            "ne": c != v,
            "lt": c < v,
            "lte": c <= v,
            "gt": c > v,
            "gte": c >= v,
        }[op]
        # null field → compares as -1: less than any value (Condition.cs:227-231)
        if op in ("lt", "lte", "ne"):
            pred = pred | F.col(field).isNull()
        elif op in ("eq", "gt", "gte"):
            pred = pred & F.col(field).isNotNull()
    return ~pred if negate else pred


def parse_condition(spec: str, **kw) -> Column:
    """Parse ``"field,op,value"`` (Condition.cs:103-164)."""
    parts = spec.split(",", 2)
    field = parts[0].strip()
    op = parts[1].strip() if len(parts) > 1 else "nullorempty"
    negate = False
    if op.startswith("not"):
        negate, op = True, op[3:].strip()
    value = parts[2] if len(parts) > 2 else None
    return condition(field, op, value, negate=negate, **kw)
