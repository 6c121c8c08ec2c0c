"""Datasource equivalents (SURVEY.md §2.1) — thin, opinionated wrappers over
Spark's native readers that reproduce the reference's datasource options.

| reference | file:line | here |
|---|---|---|
| CsvDatasource   | Datasources/CsvDatasource.cs:38-328   | read_csv |
| TextDatasource  | Datasources/TextDatasource.cs:37-148  | read_text_lines / read_text_keyvalues |
| JsonDatasource  | Datasources/JsonDatasource.cs:45-199  | read_json |
| XmlDatasource   | Datasources/XmlDatasource.cs:44-148   | read_xml_elements (xpath funcs) |
| FileNameDatasource | Datasources/FileNameDatasource.cs:35-51 | read_file_names |
| WebStreamProvider | StreamProviders/WebStreamProvider.cs:34-104 | read_http |
| ShellStreamProvider | StreamProviders/ShellStreamProvider.cs:15-560 | read_shell_lines |
| ExcelDatasource | Datasources/ExcelDatasource.cs:38-181 | read_excel |
| SqlDatasource | Datasources/SqlDatasource.cs:35-291 | read_jdbc |
| TikaDS/HtmlDatasource | Datasources/TikaDataSource.cs:45-294 | read_html_files (binaryFile + extraction UDF) |
| file enumeration filters | StreamProviders/FileStreamDirectory.cs:33-293 | glob + modifiedAfter options |

All return DataFrames; Catalyst handles pushdown/pruning on every path.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, SparkSession, functions as F

from ..html.udfs import html_to_text_udf


def read_csv(
    spark: SparkSession,
    path: str,
    sep: str = ",",
    quote: str = '"',
    escape: str = "\\",
    comment: Optional[str] = None,
    header: bool = True,
    trim: bool = False,
    lenient: bool = True,
    startat: int = 0,
    sort_col: Optional[str] = None,
    sort_desc: bool = False,
) -> DataFrame:
    """CsvDatasource: delim/quote/escape/comment chars, header modes,
    lenient/trim, startat offset, optional single-column pre-sort
    (CsvDatasource.cs:38-328; sort path 209-285)."""
    opts = {
        "sep": sep,
        "quote": quote,
        "escape": escape,
        "header": str(header).lower(),
        "mode": "PERMISSIVE" if lenient else "FAILFAST",
        "ignoreLeadingWhiteSpace": str(trim).lower(),
        "ignoreTrailingWhiteSpace": str(trim).lower(),
    }
    if comment:
        opts["comment"] = comment
    df = spark.read.options(**opts).csv(path)
    if startat > 0:
        # startat is defined in FILE order (CsvDatasource.cs semantics), which
        # only exists within a single partition: collapse to one partition
        # before numbering (startat is a small-config-file construct; large
        # inputs shouldn't use it)
        df = (
            df.coalesce(1)
            .withColumn("__rid", F.monotonically_increasing_id())
            .where(F.col("__rid") >= startat)
            .drop("__rid")
        )
    if sort_col:
        # reference pre-sort is single-column ordinal-CI (CsvDatasource.cs:209-285)
        key = F.lower(F.col(sort_col))
        df = df.orderBy(key.desc() if sort_desc else key.asc())
    return df


def read_text_lines(
    spark: SparkSession, path: str, maxread: Optional[int] = None
) -> DataFrame:
    """TextDatasource mode=lines (TextDatasource.cs:37-148)."""
    df = spark.read.text(path)
    return df.limit(maxread) if maxread else df


def read_text_keyvalues(spark: SparkSession, path: str) -> DataFrame:
    """TextDatasource mode=values: ``key: value`` lines → (key, value)
    (TextDatasource.cs:37-148). Continuation lines (no ':') are not merged —
    distributed line order is not defined; upstream should pre-join them."""
    df = spark.read.text(path)
    kv = F.split(F.col("value"), ":", 2)
    # F.get returns null when the line has no ':' (strict getItem would throw)
    return df.select(
        F.trim(F.get(kv, 0)).alias("key"),
        F.trim(F.get(kv, 1)).alias("val"),
    ).where(F.col("val").isNotNull())


def read_json(
    spark: SparkSession,
    path: str,
    object_per_line: bool = True,
    schema: Optional[str] = None,
) -> DataFrame:
    """JsonDatasource: NDJSON (objectperline) or whole-file JSON incl.
    array-of-records (JsonDatasource.cs:45-199)."""
    reader = spark.read
    if schema:
        reader = reader.schema(schema)
    return reader.json(path, multiLine=not object_per_line)


def read_xml_elements(spark: SparkSession, path: str, xpath: str,
                      multiline: bool = True) -> DataFrame:
    """XmlDatasource via xpath functions over raw text (XmlDatasource.cs:44-148).
    Whole-file XML → one row per file, xpath extraction columns added by the
    caller with F.xpath_* on the ``xml`` column."""
    df = (
        spark.read.format("binaryFile").load(path)
        .select(
            F.col("path"),
            F.decode(F.col("content"), "utf-8").alias("xml"),
        )
    )
    return df.withColumn("values", F.xpath(F.col("xml"), F.lit(xpath)))


def read_file_names(spark: SparkSession, glob: str,
                    modified_after: Optional[str] = None) -> DataFrame:
    """FileNameDatasource: one record per matched file, metadata only
    (FileNameDatasource.cs:35-51); min-date incremental filter mirrors
    FileStreamDirectory.cs:130-136."""
    reader = spark.read.format("binaryFile")
    if modified_after:
        reader = reader.option("modifiedAfter", modified_after)
    return reader.load(glob).select("path", "length", "modificationTime")


def read_jdbc(
    spark: SparkSession,
    url: str,
    table_or_query: str,
    properties: Optional[dict] = None,
    partition_column: Optional[str] = None,
    lower_bound: Optional[int] = None,
    upper_bound: Optional[int] = None,
    num_partitions: int = 8,
    timeout_s: int = 0,
) -> DataFrame:
    """SqlDatasource/MysqlDatasource/OdbcDatasource equivalent
    (Datasources/SqlDatasource.cs:35-291): table or query scan over JDBC with
    per-query timeout and parallel range partitioning (the scalable form of
    the reference's single-connection EmitRecords loop)."""
    props = dict(properties or {})
    if timeout_s:
        props["queryTimeout"] = str(timeout_s)
    reader = spark.read.format("jdbc").option("url", url)
    if table_or_query.lstrip().lower().startswith("select"):
        reader = reader.option("query", table_or_query)
    else:
        reader = reader.option("dbtable", table_or_query)
    if partition_column is not None:
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    for k, v in props.items():
        reader = reader.option(k, v)
    return reader.load()


def read_http(
    spark: SparkSession,
    urls,
    root: Optional[str] = None,
    headers: Optional[dict] = None,
    timeout_s: int = 30,
    lenient: bool = True,
    n_partitions: Optional[int] = None,
) -> DataFrame:
    """WebStreamProvider equivalent (StreamProviders/WebStreamProvider.cs:34-104):
    an HTTP(S) URL set fetched DISTRIBUTED, one connection per record,
    Arrow-batched — the scalable form of the reference's per-stream
    CreateStream loop.

    ``urls`` is a list of url strings or a DataFrame with a ``url`` column;
    relative urls resolve against ``root`` (the reference's ``@root``
    attribute). Returns ``(url, status, content binary, content_type,
    length, error)``. Failures (connection refused, 4xx/5xx) are captured
    per-record into ``status``/``error`` when ``lenient`` (the errorhandler
    quarantine pattern, BMWebException otherwise re-raised as-is).
    ``.gz`` payloads are transparently decompressed (mirroring the gz stream
    wrapping, FileBasedMapperWriters.cs:62-81).

    Scale note: fetch fan-out = one task per partition and ``n_partitions``
    bounds concurrent connections cluster-wide (the reference's
    ``maxparallel`` async-queue knob); at 100 TB the url table is just
    another DataFrame, so the same call shards across every executor.
    """
    from urllib.parse import urljoin

    if isinstance(urls, DataFrame):
        url_df = urls.select(F.col("url").cast("string"))
    else:
        url_df = spark.createDataFrame([(u,) for u in urls], "url string")
    url_df = url_df.repartition(n_partitions or 8)
    out_schema = (
        "url string, status int, content binary, content_type string, "
        "length long, error string"
    )
    hdrs = dict(headers or {})
    rootv = root

    def fetch(batches):
        import gzip
        import urllib.error
        import urllib.request

        import pandas as pd

        for pdf in batches:
            rows = []
            for u in pdf["url"]:
                full = urljoin(rootv, u) if rootv else u
                status, content, ctype, err = None, None, None, None
                try:
                    req = urllib.request.Request(full, headers=hdrs)
                    with urllib.request.urlopen(req, timeout=timeout_s) as resp:
                        content = resp.read()
                        status = resp.status
                        ctype = resp.headers.get("Content-Type")
                    base_ctype = (ctype or "").split(";")[0].strip()
                    if full.endswith(".gz") or base_ctype == "application/gzip":
                        content = gzip.decompress(content)
                except urllib.error.HTTPError as e:
                    status, err = e.code, f"HTTP {e.code}: {e.reason}"
                    content = None
                except Exception as e:  # URLError, timeout, bad gzip …
                    err = f"{type(e).__name__}: {e}"
                    # invariant: error set ⇒ content null (a gzip failure
                    # after a 200 fetch must not leak compressed bytes to a
                    # consumer filtering on status)
                    content = None
                if err is not None and not lenient:
                    raise RuntimeError(f"fetch failed for {full}: {err}")
                rows.append(
                    (
                        full,
                        status,
                        content,
                        ctype,
                        len(content) if content is not None else None,
                        err,
                    )
                )
            yield pd.DataFrame(
                rows,
                columns=[
                    "url", "status", "content", "content_type", "length", "error",
                ],
            )

    return url_df.mapInPandas(fetch, out_schema)


def read_shell_lines(
    spark: SparkSession,
    cmd,
    args: Optional[str] = None,
    via_shell: bool = False,
    ok_errors: tuple = (),
    ignore_errors: tuple = (),
    stderr_to_stdout: bool = False,
    timeout_s: int = 300,
    n_partitions: int = 8,
) -> DataFrame:
    """ShellStreamProvider equivalent (StreamProviders/ShellStreamProvider.cs:
    15-560): run a command and expose its stdout lines as a DataFrame.

    Exit-code contract mirrors the reference's ProcessResultTypes
    (ShellStreamProvider.cs:66-69): 0 and ``ok_errors`` yield records,
    ``ignore_errors`` yields a null stream (empty frame, no failure),
    anything else raises. ``via_shell`` = the reference's ``@viashell``
    (string through the shell; mutually exclusive with ``args``),
    ``stderr_to_stdout`` = ``@stderr_to_stdout``.

    The process runs once, driver-side — a stream provider is config-level
    input acquisition (one process per provider in the reference too); its
    output is immediately distributed over ``n_partitions`` so everything
    downstream is executor-parallel. For per-record commands at scale, land
    the output to files and use the file readers instead.
    """
    import subprocess

    if via_shell and args is not None:
        raise ValueError("args cannot be specified when via_shell=True")
    if via_shell:
        argv = cmd
    else:
        argv = [cmd] if isinstance(cmd, str) else list(cmd)
        argv += args.split() if args else []
    proc = subprocess.run(
        argv,
        shell=via_shell,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT if stderr_to_stdout else subprocess.PIPE,
        timeout=timeout_s,
    )
    rc = proc.returncode
    if rc != 0 and rc not in ok_errors:
        if rc in ignore_errors:
            return spark.createDataFrame([], "line_no long, line string")
        raise RuntimeError(
            f"shell provider exited {rc}: {(proc.stderr or b'')[:500]!r}"
        )
    lines = proc.stdout.decode("utf-8", errors="replace").splitlines()
    return spark.createDataFrame(
        list(enumerate(lines)), "line_no long, line string"
    ).repartition(n_partitions)


def read_html_files(spark: SparkSession, glob: str) -> DataFrame:
    """TikaDS/HtmlDatasource replacement: binaryFile scan + Arrow extraction
    UDF (TikaDataSource.cs:45-294 without the external Tika service)."""
    return (
        spark.read.format("binaryFile")
        .load(glob)
        .select(
            F.col("path").alias("url"),
            F.col("modificationTime").alias("warc_ts"),
            F.col("content").alias("html"),
        )
        .withColumn("text", html_to_text_udf(F.col("html")))
    )


def _xlsx_col_index(cell_ref: str) -> int:
    """'BC12' → 0-based column index (54)."""
    n = 0
    for ch in cell_ref:
        if not ch.isalpha():
            break
        n = n * 26 + (ord(ch.upper()) - ord("A") + 1)
    return n - 1


def _parse_xlsx(path: str):
    """Minimal stdlib XLSX parse (xlsx = zipped SpreadsheetML) →
    {sheet_name: [[cell-or-None, …], …]}. Handles shared strings, inline
    strings, formula-cached strings, and numeric cells (kept as their raw
    text — typing is the converter layer's job, as in the reference)."""
    import xml.etree.ElementTree as ET
    import zipfile

    NS = "{http://schemas.openxmlformats.org/spreadsheetml/2006/main}"
    NS_R = "{http://schemas.openxmlformats.org/officeDocument/2006/relationships}"
    NS_REL = "{http://schemas.openxmlformats.org/package/2006/relationships}"
    with zipfile.ZipFile(path) as z:
        shared = []
        if "xl/sharedStrings.xml" in z.namelist():
            root = ET.fromstring(z.read("xl/sharedStrings.xml"))
            for si in root.findall(f"{NS}si"):
                shared.append("".join(t.text or "" for t in si.iter(f"{NS}t")))
        rels = {}
        rel_root = ET.fromstring(z.read("xl/_rels/workbook.xml.rels"))
        for rel in rel_root.findall(f"{NS_REL}Relationship"):
            rels[rel.get("Id")] = rel.get("Target").lstrip("/")
        wb = ET.fromstring(z.read("xl/workbook.xml"))
        sheets = {}
        for sh in wb.iter(f"{NS}sheet"):
            target = rels[sh.get(f"{NS_R}id")]
            if not target.startswith("xl/"):
                target = "xl/" + target
            ws = ET.fromstring(z.read(target))
            rows = []
            for row in ws.iter(f"{NS}row"):
                cells: list = []
                for c in row.findall(f"{NS}c"):
                    idx = _xlsx_col_index(c.get("r", ""))
                    while len(cells) <= idx:
                        cells.append(None)
                    ctype = c.get("t", "n")
                    if ctype == "inlineStr":
                        is_el = c.find(f"{NS}is")
                        val = "".join(
                            t.text or "" for t in is_el.iter(f"{NS}t")
                        ) if is_el is not None else None
                    else:
                        v = c.find(f"{NS}v")
                        val = None if v is None else v.text
                        if ctype == "s" and val is not None:
                            val = shared[int(val)]
                    cells[idx] = val
                rows.append(cells)
            sheets[sh.get("name")] = rows
    return sheets


def read_excel(
    spark: SparkSession,
    path: str,
    sheets: Optional[str] = None,
    headers_at: int = -1,
    start_at: int = 0,
    prefix: Optional[str] = None,
) -> DataFrame:
    """ExcelDatasource equivalent (Datasources/ExcelDatasource.cs:38-181):
    XLSX sheet scan with a case-insensitive sheet-name regex (@sheets), a
    header row (@headersat; missing/blank header → ``f<idx>``, headers
    lowercased — prepareEventKeys, ExcelDatasource.cs:47-69), and a
    @startat data offset. All cells surface as strings (typing is the
    converter layer, as in the reference).

    The workbook is parsed driver-side with the stdlib (xlsx = zipped XML —
    no Excel libraries in this environment); like read_csv's startat mode
    this is a small-config-file construct: the parse is a one-shot driver
    cost and the returned DataFrame is distributed.
    """
    import re as _re

    if 0 <= headers_at and headers_at >= start_at:
        # == is also an error: the header row would be re-emitted as data
        raise ValueError(
            f"headers_at ({headers_at}) should be < start_at ({start_at})"
        )
    expr = _re.compile(sheets, _re.IGNORECASE) if sheets else None
    out_rows = []
    all_cols: list[str] = ["sheet"]
    for name, rows in _parse_xlsx(path).items():
        if expr is not None and not expr.search(name):
            continue
        n_cols = max((len(r) for r in rows), default=0)
        headers = rows[headers_at] if 0 <= headers_at < len(rows) else []
        cols = []
        for i in range(n_cols):
            h = headers[i] if i < len(headers) else None
            h = h.strip().lower() if h and h.strip() else None
            cols.append(h if h is not None else f"f{i}")
        for c in cols:
            if c not in all_cols:
                all_cols.append(c)
        for r in rows[start_at:]:
            rec = {"sheet": (prefix or name).lower()}
            for i, c in enumerate(cols):
                rec[c] = r[i] if i < len(r) else None
            out_rows.append(rec)
    pdf_rows = [[rec.get(c) for c in all_cols] for rec in out_rows]
    schema = ", ".join(f"`{c}` string" for c in all_cols)
    return spark.createDataFrame(pdf_rows, schema)
