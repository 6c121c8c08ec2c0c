"""Datasource/endpoint equivalents (SURVEY.md §2.1/§2.2)."""

import glob
import os

from pyspark.sql import functions as F

from importpipeline_spark.sinks.writers import (
    compact,
    current_generation,
    publish_generation,
    write_csv,
    write_generation,
    write_json,
    write_text,
)
from importpipeline_spark.sources.readers import (
    read_csv,
    read_file_names,
    read_html_files,
    read_json,
    read_text_keyvalues,
    read_text_lines,
)


def test_csv_roundtrip(spark, tmp_path):
    p = str(tmp_path / "c")
    df = spark.createDataFrame(
        [("a", 1), ("B", 2), ("c", 3)], "name string, v int"
    )
    write_csv(df, p, header=True)
    got = read_csv(spark, p, header=True)
    assert got.count() == 3
    # pre-sort: ordinal case-insensitive single column (CsvDatasource.cs:209-285)
    names = [r.name for r in read_csv(spark, p, header=True, sort_col="name").collect()]
    assert names == ["a", "B", "c"]
    names_d = [
        r.name
        for r in read_csv(spark, p, header=True, sort_col="name", sort_desc=True).collect()
    ]
    assert names_d == ["c", "B", "a"]


def test_csv_options(spark, tmp_path):
    p = tmp_path / "opt.csv"
    p.write_text("# comment line\nx;1\ny;2\n")
    got = read_csv(spark, str(p), sep=";", comment="#", header=False)
    assert got.count() == 2


def test_text_modes(spark, tmp_path):
    p = tmp_path / "t.txt"
    p.write_text("line one\nline two\nline three\n")
    assert read_text_lines(spark, str(p)).count() == 3
    assert read_text_lines(spark, str(p), maxread=2).count() == 2

    kv = tmp_path / "kv.txt"
    kv.write_text("key1: value one\nkey2: value two\nnot-a-kv-line\n")
    got = {r.key: r.val for r in read_text_keyvalues(spark, str(kv)).collect()}
    assert got == {"key1": "value one", "key2": "value two"}


def test_json_modes(spark, tmp_path):
    nd = tmp_path / "d.ndjson"
    nd.write_text('{"a": 1}\n{"a": 2}\n')
    assert read_json(spark, str(nd), object_per_line=True).count() == 2
    whole = tmp_path / "w.json"
    whole.write_text('[{"a": 1}, {"a": 2}, {"a": 3}]')
    assert read_json(spark, str(whole), object_per_line=False).count() == 3


def test_file_names_and_html(spark, tmp_path):
    (tmp_path / "a.html").write_text("<html><body><p>hello world</p></body></html>")
    (tmp_path / "b.html").write_text("plain text, not enough tags")
    meta = read_file_names(spark, str(tmp_path / "*.html"))
    assert meta.count() == 2
    assert set(meta.columns) == {"path", "length", "modificationTime"}
    docs = read_html_files(spark, str(tmp_path / "*.html"))
    by_name = {os.path.basename(r.url): r.text for r in docs.collect()}
    assert by_name["a.html"] == "hello world"
    assert by_name["b.html"] == "plain text, not enough tags"  # passthrough


def test_xml_elements(spark, tmp_path):
    from importpipeline_spark.sources.readers import read_xml_elements

    p = tmp_path / "d.xml"
    p.write_text(
        "<root><item><name>alpha</name></item><item><name>beta</name></item></root>"
    )
    got = read_xml_elements(spark, str(p), "/root/item/name/text()")
    row = got.first()
    assert list(row.values) == ["alpha", "beta"]


def test_normalize_udf(spark):
    from importpipeline_spark.text.tokenizer import normalize_udf

    df = spark.createDataFrame([("Café Über señor",), (None,)], "s string")
    got = [r.n for r in df.select(normalize_udf(F.col("s")).alias("n")).collect()]
    assert got == ["Cafe Uber senor", None]


def test_categorizer_array_match(spark):
    from importpipeline_spark.functions.categorizer import (
        Category,
        apply_categories,
        sel_any_element,
    )

    df = spark.createDataFrame(
        [(1, ["x", "spam"]), (2, ["ok"]), (3, [])],
        "id int, tags array<string>",
    )
    cats = [
        Category(sel_any_element("tags", lambda t: t == F.lit("spam")), "flagged")
    ]
    got = {r.id: r.cat for r in apply_categories(df, cats, "cat").collect()}
    assert got == {1: "flagged", 2: None, 3: None}


def test_json_text_writers(spark, tmp_path):
    df = spark.createDataFrame([("x", 1), ("y", 2)], "s string, v int")
    jp = str(tmp_path / "j")
    write_json(df, jp)
    assert spark.read.json(jp).count() == 2
    tp = str(tmp_path / "t")
    write_text(df, tp, "%s=%d", ["s", "v"])
    lines = {r.value for r in spark.read.text(tp).collect()}
    assert lines == {"x=1", "y=2"}


def test_generations_atomic_publish(spark, tmp_path):
    root = str(tmp_path / "gens")
    os.makedirs(root)
    df1 = spark.createDataFrame([(1,)], "v int")
    g1 = write_generation(df1, root)
    publish_generation(root, g1)
    assert current_generation(root) == g1
    # second generation: publish flips pointer; old data intact
    df2 = spark.createDataFrame([(2,), (3,)], "v int")
    g2 = write_generation(df2, root)
    assert current_generation(root) == g1  # not yet published
    publish_generation(root, g2)
    assert current_generation(root) == g2
    assert spark.read.parquet(g1).count() == 1
    assert spark.read.parquet(current_generation(root)).count() == 2


def test_compact(spark, tmp_path):
    p = str(tmp_path / "cmp")
    df = spark.range(0, 1000, 1, 16).withColumn("k", F.col("id") % 7)
    compact(df, p, sort_cols=["k"], n_files=2)
    files = glob.glob(os.path.join(p, "*.parquet"))
    assert len(files) == 2
    assert spark.read.parquet(p).count() == 1000


def test_jdbc_derby_roundtrip(spark, tmp_path):
    """read_jdbc against a REAL embedded database: Apache Derby ships in
    Spark's jars, so the JDBC reader (SqlDatasource equivalent) is exercised
    end-to-end — plain scan, range-partitioned scan, and query mode."""
    from importpipeline_spark.sources.readers import read_jdbc

    # keep Derby's derby.log out of the repo cwd
    spark._jvm.System.setProperty("derby.system.home", str(tmp_path))
    url = f"jdbc:derby:{tmp_path}/jdbc_db;create=true"
    props = {"driver": "org.apache.derby.jdbc.EmbeddedDriver"}
    src = spark.range(0, 100).select(
        F.col("id").alias("id"), (F.col("id") * 2).alias("v")
    )
    src.write.jdbc(url, "T1", mode="overwrite", properties=props)

    got = read_jdbc(spark, url, "T1", properties=props)
    rows = {(int(r[0]), int(r[1])) for r in got.collect()}
    assert rows == {(i, 2 * i) for i in range(100)}

    parts = read_jdbc(
        spark, url, "T1", properties=props,
        partition_column="ID", lower_bound=0, upper_bound=100, num_partitions=4,
    )
    assert parts.rdd.getNumPartitions() == 4
    assert {int(r[0]) for r in parts.collect()} == set(range(100))

    # Spark's JDBC writer quotes identifiers, so Derby stores them
    # case-sensitively lowercase — quote them in query mode
    q = read_jdbc(
        spark, url, 'SELECT "id" FROM T1 WHERE "id" < 10', properties=props
    )
    assert sorted(int(r[0]) for r in q.collect()) == list(range(10))


def test_gz_compressed_sources(spark, tmp_path):
    """Remote/compressed stream providers (SURVEY §2.1): the reference's gz
    stream wrapper maps to Hadoop's transparent codec handling — the SAME
    readers consume .gz files with no code change. (HTTP is covered for real
    by test_http_stream_provider; SSH needs an sshd, out of sandbox reach.)"""
    import gzip

    from importpipeline_spark.sources.readers import (
        read_csv,
        read_json,
        read_text_lines,
    )

    csv_gz = tmp_path / "t.csv.gz"
    with gzip.open(csv_gz, "wt") as f:
        f.write("a,b\n1,x\n2,y\n")
    got = read_csv(spark, str(csv_gz))
    assert sorted((int(r.a), r.b) for r in got.collect()) == [(1, "x"), (2, "y")]

    txt_gz = tmp_path / "t.txt.gz"
    with gzip.open(txt_gz, "wt") as f:
        f.write("line one\nline two\n")
    assert read_text_lines(spark, str(txt_gz)).count() == 2

    json_gz = tmp_path / "t.ndjson.gz"
    with gzip.open(json_gz, "wt") as f:
        f.write('{"k": 1}\n{"k": 2}\n')
    assert sorted(r.k for r in read_json(spark, str(json_gz)).collect()) == [1, 2]


def _write_test_xlsx(path):
    """Hand-rolled minimal XLSX (zip of SpreadsheetML) — independent of the
    reader's parser."""
    import zipfile

    ct = """<?xml version="1.0"?>
<Types xmlns="http://schemas.openxmlformats.org/package/2006/content-types">
 <Default Extension="rels" ContentType="application/vnd.openxmlformats-package.relationships+xml"/>
 <Default Extension="xml" ContentType="application/xml"/>
 <Override PartName="/xl/workbook.xml" ContentType="application/vnd.openxmlformats-officedocument.spreadsheetml.sheet.main+xml"/>
</Types>"""
    root_rels = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/officeDocument" Target="xl/workbook.xml"/>
</Relationships>"""
    wb = """<?xml version="1.0"?>
<workbook xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main"
 xmlns:r="http://schemas.openxmlformats.org/officeDocument/2006/relationships">
 <sheets>
  <sheet name="Orders2024" sheetId="1" r:id="rId1"/>
  <sheet name="Notes" sheetId="2" r:id="rId2"/>
 </sheets>
</workbook>"""
    wb_rels = """<?xml version="1.0"?>
<Relationships xmlns="http://schemas.openxmlformats.org/package/2006/relationships">
 <Relationship Id="rId1" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet1.xml"/>
 <Relationship Id="rId2" Type="http://schemas.openxmlformats.org/officeDocument/2006/relationships/worksheet" Target="worksheets/sheet2.xml"/>
</Relationships>"""
    shared = """<?xml version="1.0"?>
<sst xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main" count="3" uniqueCount="3">
 <si><t>Name</t></si><si><t>alpha</t></si><si><t>beta</t></si>
</sst>"""
    # header row at 1 (0-based 0), data from row 2; B header blank → f1;
    # C2 inline string, sparse row 3 (missing B)
    sheet1 = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1"><c r="A1" t="s"><v>0</v></c><c r="C1" t="inlineStr"><is><t>Qty</t></is></c></row>
  <row r="2"><c r="A2" t="s"><v>1</v></c><c r="B2"><v>1.5</v></c><c r="C2"><v>10</v></c></row>
  <row r="3"><c r="A3" t="s"><v>2</v></c><c r="C3"><v>20</v></c></row>
 </sheetData>
</worksheet>"""
    sheet2 = """<?xml version="1.0"?>
<worksheet xmlns="http://schemas.openxmlformats.org/spreadsheetml/2006/main">
 <sheetData>
  <row r="1"><c r="A1" t="inlineStr"><is><t>note one</t></is></c></row>
 </sheetData>
</worksheet>"""
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("[Content_Types].xml", ct)
        z.writestr("_rels/.rels", root_rels)
        z.writestr("xl/workbook.xml", wb)
        z.writestr("xl/_rels/workbook.xml.rels", wb_rels)
        z.writestr("xl/sharedStrings.xml", shared)
        z.writestr("xl/worksheets/sheet1.xml", sheet1)
        z.writestr("xl/worksheets/sheet2.xml", sheet2)


def test_excel_reader(spark, tmp_path):
    """ExcelDatasource equivalent: sheet regex, header row (blank header →
    f<idx>, lowercased), startat offset, shared/inline/numeric cells, sparse
    rows."""
    from importpipeline_spark.sources.readers import read_excel

    p = str(tmp_path / "t.xlsx")
    _write_test_xlsx(p)

    got = read_excel(spark, p, sheets="^orders", headers_at=0, start_at=1)
    rows = {r.name: r for r in got.collect()}
    assert set(got.columns) == {"sheet", "name", "f1", "qty"}
    assert set(rows) == {"alpha", "beta"}
    assert rows["alpha"].f1 == "1.5" and rows["alpha"].qty == "10"
    assert rows["beta"].f1 is None and rows["beta"].qty == "20"  # sparse row
    assert rows["alpha"].sheet == "orders2024"

    both = read_excel(spark, p)  # no filter, no headers: raw rows
    assert both.count() == 4  # 3 + 1
    assert "f0" in both.columns

    import pytest as _pytest
    with _pytest.raises(ValueError, match="headers_at"):
        read_excel(spark, p, headers_at=2, start_at=1)


def test_http_stream_provider(spark, tmp_path):
    """WebStreamProvider (StreamProviders/WebStreamProvider.cs:34-104)
    exercised against a REAL http server (stdlib, loopback): distributed
    fetch, @root-relative resolution, gz transparency, and the lenient
    per-record error capture (BMWebException → quarantine columns)."""
    import functools
    import gzip
    import http.server
    import threading

    from importpipeline_spark.sources.readers import read_http

    (tmp_path / "a.txt").write_bytes(b"hello world")
    (tmp_path / "t.csv").write_bytes(b"a,b\n1,x\n2,y\n")
    (tmp_path / "z.gz").write_bytes(gzip.compress(b"compressed payload"))
    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=str(tmp_path)
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}/"

        # absolute urls: exact bytes back, per-url status
        got = {
            r.url: r
            for r in read_http(
                spark, [base + "a.txt", base + "t.csv", base + "z.gz"]
            ).collect()
        }
        assert got[base + "a.txt"].content == b"hello world"
        assert got[base + "a.txt"].status == 200
        assert got[base + "t.csv"].length == len(b"a,b\n1,x\n2,y\n")
        assert got[base + "z.gz"].content == b"compressed payload"  # gz-transparent
        assert all(r.error is None for r in got.values())

        # @root-relative resolution (WebStreamProvider.cs:45-47)
        rel = read_http(spark, ["a.txt"], root=base).collect()
        assert rel[0].url == base + "a.txt" and rel[0].content == b"hello world"

        # lenient: a 404 is captured per-record, fetch job still succeeds
        bad = read_http(spark, [base + "missing.txt"]).collect()[0]
        assert bad.status == 404 and bad.content is None
        assert "404" in bad.error

        # strict: the same failure raises (BMWebException semantics)
        import pytest as _pytest

        with _pytest.raises(Exception, match="fetch failed"):
            read_http(spark, [base + "missing.txt"], lenient=False).collect()

        # DataFrame input composes with the rest of the engine
        url_df = spark.createDataFrame([(base + "a.txt",)], "url string")
        assert read_http(spark, url_df).collect()[0].content == b"hello world"
    finally:
        srv.shutdown()


def test_shell_stream_provider(spark):
    """ShellStreamProvider (StreamProviders/ShellStreamProvider.cs:15-560):
    command stdout → records; the reference's exit-code classes (@ok_errors
    accepted, @ignore_errors → null stream, others fail) and
    @viashell/@stderr_to_stdout semantics."""
    import pytest as _pytest

    from importpipeline_spark.sources.readers import read_shell_lines

    got = read_shell_lines(spark, "printf 'alpha\\nbeta\\n'", via_shell=True)
    assert [r.line for r in got.orderBy("line_no").collect()] == ["alpha", "beta"]

    # argv form (no shell)
    got = read_shell_lines(spark, ["printf", "x\\ny\\n"])
    assert got.count() == 2

    # ok_errors: the listed nonzero code still yields the stream
    got = read_shell_lines(
        spark, "printf 'z\\n'; exit 3", via_shell=True, ok_errors=(3,)
    )
    assert [r.line for r in got.collect()] == ["z"]

    # ignore_errors: null stream (empty frame, no failure)
    got = read_shell_lines(
        spark, "exit 4", via_shell=True, ignore_errors=(4,)
    )
    assert got.count() == 0 and got.columns == ["line_no", "line"]

    # any other nonzero code raises
    with _pytest.raises(RuntimeError, match="exited 5"):
        read_shell_lines(spark, "exit 5", via_shell=True)

    # stderr_to_stdout merges streams (reference @stderr_to_stdout)
    got = read_shell_lines(
        spark, "echo out; echo err 1>&2", via_shell=True, stderr_to_stdout=True
    )
    assert {r.line for r in got.collect()} == {"out", "err"}

    # @viashell excludes @args (ShellStreamProvider.cs:77)
    with _pytest.raises(ValueError, match="args"):
        read_shell_lines(spark, "echo", args="x", via_shell=True)


def test_command_endpoint(spark, tmp_path):
    """CommandEndpoint (Endpoints/CommandEndpoint.cs:37-260): per-record
    exec/delete/copy/move with {0}-formatted arguments from record fields,
    errors-as-warning vs hard failure."""
    import os

    import pytest as _pytest

    from importpipeline_spark.sinks.writers import write_command

    names = ["r1", "r2", "r3"]
    df = spark.createDataFrame([(n,) for n in names], "name string")

    # exec: one command per record (touch), executor-side
    write_command(
        df, "exec", ["name"], cmd="touch {0}.flag", working_dir=str(tmp_path)
    )
    assert all(os.path.exists(tmp_path / f"{n}.flag") for n in names)

    # copy then move then delete, all record-driven
    write_command(df, "copy", ["name"], src="{0}.flag", dst="{0}.copy",
                  working_dir=str(tmp_path))
    assert all(os.path.exists(tmp_path / f"{n}.copy") for n in names)
    write_command(df, "move", ["name"], src="{0}.copy", dst="{0}.moved",
                  working_dir=str(tmp_path))
    assert all(os.path.exists(tmp_path / f"{n}.moved") for n in names)
    assert not any(os.path.exists(tmp_path / f"{n}.copy") for n in names)
    write_command(df, "delete", ["name"], src="{0}.flag",
                  working_dir=str(tmp_path))
    assert not any(os.path.exists(tmp_path / f"{n}.flag") for n in names)

    # nonzero rc fails the job (BMException semantics)…
    with _pytest.raises(Exception, match="rc=7"):
        write_command(df, "exec", ["name"], cmd="exit 7")

    # …unless errors_as_warning (CommandEndpoint.cs:143-150)
    write_command(df, "exec", ["name"], cmd="exit 7", errors_as_warning=True)

    # missing-file delete follows the same error contract
    with _pytest.raises(Exception, match="gone"):
        write_command(df, "delete", ["name"], src="gone-{0}",
                      working_dir=str(tmp_path))
    write_command(df, "delete", ["name"], src="gone-{0}",
                  working_dir=str(tmp_path), errors_as_warning=True)


def test_shell_list_cmd_with_args(spark):
    from importpipeline_spark.sources.readers import read_shell_lines

    got = read_shell_lines(spark, ["echo", "a"], args="b c")
    assert [r.line for r in got.collect()] == ["a b c"]


def test_http_bad_gzip_is_a_clean_error_row(spark, tmp_path):
    """error set ⇒ content null, even when the fetch itself succeeded:
    a 200 response whose .gz body is not valid gzip must not leak the
    compressed bytes to consumers filtering on status."""
    import functools
    import http.server
    import threading

    from importpipeline_spark.sources.readers import read_http

    (tmp_path / "broken.gz").write_bytes(b"this is not gzip")
    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=str(tmp_path)
    )
    srv = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}/"
        r = read_http(spark, [base + "broken.gz"]).collect()[0]
        assert r.status == 200 and r.content is None and "BadGzipFile" in r.error
    finally:
        srv.shutdown()
