"""Datasource equivalents (SURVEY.md §2.1) — thin, opinionated wrappers over
Spark's native readers that reproduce the reference's datasource options.

| reference | file:line | here |
|---|---|---|
| CsvDatasource   | Datasources/CsvDatasource.cs:38-328   | read_csv |
| TextDatasource  | Datasources/TextDatasource.cs:37-148  | read_text_lines / read_text_keyvalues |
| JsonDatasource  | Datasources/JsonDatasource.cs:45-199  | read_json |
| XmlDatasource   | Datasources/XmlDatasource.cs:44-148   | read_xml_elements (xpath funcs) |
| FileNameDatasource | Datasources/FileNameDatasource.cs:35-51 | read_file_names |
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
