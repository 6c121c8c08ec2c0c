"""Endpoint equivalents (SURVEY.md §2.2): JSON/CSV/text writers + the
generation/atomic-publish lifecycle.

| reference | file:line | here |
|---|---|---|
| JsonEndpoint  | Endpoints/JsonEndPoint.cs:37-150 | write_json |
| CsvEndpoint   | Endpoints/CsvEndpoint.cs:36-208  | write_csv |
| TextEndpoint  | Endpoints/TextEndpoint.cs:36-150 | write_text (format_string) |
| generations + alias flip | Endpoints/ESIndexDefinitions.cs:375-541 | write_generation / publish_generation |
| optimize to N segments | ESIndexDefinitions.cs:452-458 | compact() (sortWithinPartitions+coalesce) |
| CommandEndpoint | Endpoints/CommandEndpoint.cs:37-260 | write_command (exec/delete/copy/move per record) |
"""

from __future__ import annotations

import os
import shlex
import string
from datetime import datetime, timezone

from pyspark.sql import DataFrame, functions as F


class _QuotingFormatter(string.Formatter):
    """str.format-compatible formatter that shell-quotes each substituted
    field AFTER its format spec is applied — ``{0:d}`` still formats the
    original int, and only the rendered text is quoted."""

    def format_field(self, value, format_spec):
        return shlex.quote(format(value, format_spec))


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


def write_command(
    df: DataFrame,
    op: str,
    fields: list,
    cmd: str | None = None,
    src: str | None = None,
    dst: str | None = None,
    working_dir: str | None = None,
    errors_as_warning: bool = False,
    timeout_s: int = 10,
    quote_args: bool = True,
) -> None:
    """CommandEndpoint (Endpoints/CommandEndpoint.cs:37-260): execute a
    side-effecting command per record — ``op`` is one of the reference's
    command kinds ``exec``/``delete``/``copy``/``move``. Templates use
    ``{0}``/``{1}`` placeholders filled from ``fields`` of each record
    (Invariant.Format over @arguments, CommandEndpoint.cs:124-141).

    Spark shape: the side effects run EXECUTOR-side via foreachPartition
    (one task per partition bounds process fan-out — the action equivalent
    of a sink); a nonzero exit / failed file op raises and fails the task
    (the reference's BMException) unless ``errors_as_warning``
    (CommandEndpoint.cs:143-150), which logs to stderr and continues.
    exec gets the reference's 10s default timeout (CommandEndpoint.cs:175).

    Injection safety: exec interpolates FIELD VALUES into a shell line, so
    by default every substituted field is shell-quoted AFTER its format
    spec renders (``quote_args=True``) — a crawled column containing
    ``; rm -rf`` lands as an inert literal argument, and ``{0:d}`` style
    specs keep working on the original typed value. Templates must NOT
    pre-quote their placeholders in this mode (write ``grep {0} log``, not
    ``grep "{0}" log`` — the quoting is added for you). The reference
    formats raw values into a ``cmd /c`` line
    (CommandEndpoint.cs:124-141); that behavior is available as the
    explicit opt-in ``quote_args=False`` for templates that embed a value
    inside an already-quoted context — only use it over
    trusted/validated columns.

    UPGRADE NOTE (behavior change, r3): ``quote_args=True`` became the
    default. A template that PRE-QUOTES its placeholders (``grep "{0}"
    log``) now renders doubly-quoted arguments — drop the manual quotes, or
    pass ``quote_args=False`` to keep the r2 raw-format behavior. A
    quoted-placeholder pattern in the template triggers a loud stderr
    warning at call time rather than failing silently.

    Retry caveat: a failed/speculative Spark task RE-RUNS its whole
    partition, so commands must be idempotent (touch/copy-overwrite are;
    move/delete fail their second run — pair them with errors_as_warning or
    disable speculation for non-idempotent ops). The reference's single-
    threaded accumulator loop (CommandEndpoint.cs:85-99) had no retries, so
    this is the one semantic the distributed shape adds.
    """
    if op not in ("exec", "delete", "copy", "move"):
        raise ValueError(f"unknown command op: {op}")
    if op == "exec" and cmd is None:
        raise ValueError("exec requires cmd")
    if op in ("delete", "copy", "move") and src is None:
        raise ValueError(f"{op} requires src")
    if op in ("copy", "move") and dst is None:
        raise ValueError(f"{op} requires dst")
    if op == "exec" and quote_args and any(
        q + "{" in cmd or "}" + q in cmd for q in ("'", '"')
    ):
        import sys as _s

        print(
            "write_command: template appears to pre-quote a placeholder "
            f"({cmd!r}) but quote_args=True already shell-quotes every "
            "substituted field — remove the manual quotes or pass "
            "quote_args=False (see docstring upgrade note)",
            file=_s.stderr,
        )
    sel = df.select(*fields)

    def run_partition(rows):
        import os as _os
        import shutil as _shutil
        import subprocess as _sp
        import sys as _sys

        def issue(msg):
            if errors_as_warning:
                print(f"write_command warning: {msg}", file=_sys.stderr)
            else:
                raise RuntimeError(msg)

        def resolve(template, parms):
            p = template.format(*parms)
            return _os.path.join(working_dir, p) if working_dir else p

        for row in rows:
            parms = ["" if v is None else v for v in row]
            try:
                if op == "exec":
                    if quote_args:
                        actual = _QuotingFormatter().vformat(cmd, parms, {})
                    else:
                        actual = cmd.format(*parms)
                    proc = _sp.run(
                        actual, shell=True, cwd=working_dir,
                        capture_output=True, timeout=timeout_s,
                    )
                    if proc.returncode != 0:
                        issue(
                            f"{actual!r} ended with rc={proc.returncode}: "
                            f"{(proc.stderr or b'')[:500]!r}"
                        )
                elif op == "delete":
                    _os.remove(resolve(src, parms))
                elif op == "copy":
                    _shutil.copyfile(resolve(src, parms), resolve(dst, parms))
                else:  # move
                    _shutil.move(resolve(src, parms), resolve(dst, parms))
            except RuntimeError:
                raise
            except Exception as e:
                issue(str(e))

    sel.foreachPartition(run_partition)


def compact(df: DataFrame, path: str, sort_cols: list, n_files: int) -> None:
    """'Optimize to N segments' (ESIndexDefinitions.cs:452-458): rewrite with
    a target file count, sorted within files for row-group pruning."""
    (
        df.repartition(n_files)
        .sortWithinPartitions(*sort_cols)
        .write.mode("overwrite")
        .parquet(path)
    )
