"""Endpoint equivalents (SURVEY.md §2.2): JSON/CSV/text writers + the
generation/atomic-publish lifecycle.

| reference | file:line | here |
|---|---|---|
| JsonEndpoint  | Endpoints/JsonEndPoint.cs:37-150 | write_json |
| CsvEndpoint   | Endpoints/CsvEndpoint.cs:36-208  | write_csv |
| TextEndpoint  | Endpoints/TextEndpoint.cs:36-150 | write_text (format_string) |
| generations + alias flip | Endpoints/ESIndexDefinitions.cs:375-541 | write_generation / publish_generation |
| optimize to N segments | ESIndexDefinitions.cs:452-458 | compact() (sortWithinPartitions+coalesce) |
"""

from __future__ import annotations

import os
from datetime import datetime, timezone

from pyspark.sql import DataFrame, functions as F


def write_json(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """NDJSON writer (JsonEndPoint.cs:37-150; array/root modes are trivially
    post-processable and intentionally not reproduced)."""
    df.write.mode(mode).json(path)


def write_csv(df: DataFrame, path: str, header: bool = True,
              mode: str = "overwrite") -> None:
    df.write.mode(mode).option("header", str(header).lower()).csv(path)


def write_text(df: DataFrame, path: str, fmt: str, cols: list,
               mode: str = "overwrite") -> None:
    """Format-string text writer (TextEndpoint.cs:36-150)."""
    df.select(F.format_string(fmt, *[F.col(c) for c in cols]).alias("value")).write.mode(
        mode
    ).text(path)


def write_generation(df: DataFrame, root: str, fmt: str = "parquet") -> str:
    """Date-suffixed generation write (ESIndexDefinitions.cs:459-541):
    data lands in <root>/gen=<utc-stamp>/; publish flips the 'current'
    pointer afterwards — crash between the two leaves the old generation
    intact (the reference's alias-flip atomicity)."""
    stamp = datetime.now(timezone.utc).strftime("%Y%m%d_%H%M%S_%f")
    gen_path = os.path.join(root, f"gen={stamp}")
    df.write.mode("errorifexists").format(fmt).save(gen_path)
    return gen_path


def publish_generation(root: str, gen_path: str) -> None:
    """Atomic pointer flip: write CURRENT file naming the live generation."""
    tmp = os.path.join(root, ".CURRENT.tmp")
    with open(tmp, "w") as f:
        f.write(os.path.basename(gen_path))
    os.replace(tmp, os.path.join(root, "CURRENT"))


def current_generation(root: str) -> str | None:
    p = os.path.join(root, "CURRENT")
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return os.path.join(root, f.read().strip())


def compact(df: DataFrame, path: str, sort_cols: list, n_files: int) -> None:
    """'Optimize to N segments' (ESIndexDefinitions.cs:452-458): rewrite with
    a target file count, sorted within files for row-group pruning."""
    (
        df.repartition(n_files)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(path)
    )
