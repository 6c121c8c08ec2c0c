"""Operator units: undup/agg vs pandas oracle (FIXTURES.md §5), typed sort
semantics (JComparer), conditions, categorizer, converters."""

import pandas as pd
import pytest
from pyspark.sql import functions as F

from importpipeline_spark.functions.categorizer import (
    Category,
    apply_categories,
    sel_range,
    sel_regex,
)
from importpipeline_spark.functions.conditions import condition, parse_condition
from importpipeline_spark.functions.converters import (
    arr_count,
    arr_first,
    arr_flatten,
    arr_last,
    datepart,
    null_if_empty,
    replace_list,
    split_semicolon,
    to_date_multi,
    to_double,
    trim_white,
)
from importpipeline_spark.operators.postprocessors import (
    SortKey,
    UndupAction,
    map_reduce,
    map_reduce_passthrough_split,
    repeat_processor,
    sort_processor,
    top_processor,
    unique_processor,
)


@pytest.fixture(scope="module")
def events_df(spark):
    # k1 int, k2 string (with '' and null), v long, d double — FIXTURES.md §5
    rows = [
        (1, "a", 10, 1.5), (1, "a", 20, 2.5), (1, "A", 5, None),
        (1, "", 7, 0.5), (1, None, 9, 4.0),
        (2, "b", None, 3.0), (2, "b", 40, 1.0),
        (None, "c", 8, 2.0), (3, "c", 3, 9.0),
    ]
    return spark.createDataFrame(rows, "k1 int, k2 string, v long, d double")


def test_undup_actions_vs_pandas(events_df):
    got = (
        map_reduce(
            events_df,
            undup_keys=[SortKey("k1", "int")],
            actions=[
                UndupAction("add", "v", "sum_v"),
                UndupAction("max", "v", "max_v"),
                UndupAction("min", "v", "min_v"),
                UndupAction("mean", "v", "mean_v_int", int_mode=True),
                UndupAction("count", dest="cnt"),
            ],
        )
        .orderBy(F.col("k1").asc_nulls_first())
        .toPandas()
    )
    pdf = events_df.toPandas()
    oracle = (
        pdf.groupby("k1", dropna=False)
        .agg(sum_v=("v", "sum"), max_v=("v", "max"), min_v=("v", "min"),
             cnt=("v", "size"))
        .reset_index()
        .sort_values("k1", na_position="first")
    )
    assert got["sum_v"].fillna(-1).tolist() == oracle["sum_v"].fillna(-1).tolist()
    assert got["max_v"].fillna(-1).tolist() == oracle["max_v"].fillna(-1).tolist()
    assert got["min_v"].fillna(-1).tolist() == oracle["min_v"].fillna(-1).tolist()
    assert got["cnt"].tolist() == oracle["cnt"].tolist()
    # int mean = floor(sum/count-of-non-null) (UndupActions.cs:171-191)
    assert got.loc[got.k1 == 1, "mean_v_int"].iloc[0] == (10 + 20 + 5 + 7 + 9) // 5
    assert got.loc[got.k1 == 2, "mean_v_int"].iloc[0] == 40  # one non-null


def test_ci_key_grouping(events_df):
    # case-insensitive + empty≡null key semantics (JComparer.cs:125-139, 195-268)
    got = map_reduce(
        events_df.where(F.col("k1") == 1),
        undup_keys=[SortKey("k2", "string", case_insensitive=True)],
        actions=[UndupAction("count", dest="cnt")],
    ).collect()
    d = {r.k2: r.cnt for r in got}
    assert d["a"] == 3  # 'a','a','A' fold together
    assert d[None] == 2  # '' and null merge


def test_undup_script_action(events_df):
    """UndupScriptAction (UndupActions.cs:100-153): the blackbox 'skip groups
    of size 1' body + aggregates applied before the script, default emit =
    first record in order_by order."""
    from importpipeline_spark.operators.postprocessors import skip_singleton_groups

    got = (
        map_reduce(
            events_df,
            undup_keys=[SortKey("k1", "int")],
            actions=[
                UndupAction("count", dest="cnt"),
                UndupAction("add", "v", "sum_v"),
                UndupAction("script", fn=skip_singleton_groups),
            ],
            order_by=[SortKey("v", "long"), SortKey("d", "double")],
        )
        .orderBy(F.col("k1").asc_nulls_first())
        .toPandas()
    )
    # groups: k1=1 (5 rows), k1=2 (2 rows), k1=3 (1 row), k1=None (1 row)
    # singletons (3, None) are skipped; emit = first record by (v asc nulls
    # first, d asc)
    assert got["k1"].tolist() == [1, 2]
    assert got["cnt"].tolist() == [5, 2]
    assert got["sum_v"].tolist() == [51, 40]
    # k1=1 first record by v asc: v=5; k1=2: v=None sorts first (null < any)
    assert got.loc[0, "v"] == 5
    assert pd.isna(got.loc[1, "v"])


def test_undup_script_custom_fn(events_df):
    """An fn that rewrites the emitted records (not just skip/keep): emit ALL
    records of groups larger than 2, tagged with the group count."""
    def explode_big_groups(pdf):
        return pdf if len(pdf) > 2 else pdf.iloc[0:0]

    got = map_reduce(
        events_df,
        undup_keys=[SortKey("k1", "int")],
        actions=[UndupAction("count", dest="cnt"),
                 UndupAction("script", fn=explode_big_groups)],
        order_by=[SortKey("v", "long")],
    ).toPandas()
    assert got["k1"].unique().tolist() == [1]
    assert len(got) == 5
    assert got["cnt"].tolist() == [5] * 5
    # order within the group is the order_by order
    assert got["v"].fillna(-1).tolist() == sorted(
        got["v"].fillna(-1).tolist()
    )


def test_undup_script_requires_order(events_df):
    from importpipeline_spark.operators.postprocessors import skip_singleton_groups

    with pytest.raises(ValueError, match="order_by"):
        map_reduce(
            events_df,
            undup_keys=[SortKey("k1", "int")],
            actions=[UndupAction("script", fn=skip_singleton_groups)],
        )


def test_sort_processor_semantics(spark):
    df = spark.createDataFrame(
        [("b", 1), ("A", 2), ("", 3), (None, 4), ("a", 5)],
        "s string, i int",
    )
    got = [
        r.i
        for r in sort_processor(
            df, [SortKey("s", "string", case_insensitive=True), SortKey("i", "int")]
        ).collect()
    ]
    # nulls (incl. '') first, then a/A (CI, tie → i), then b
    assert got == [3, 4, 2, 5, 1]

    got_desc = [
        r.i
        for r in sort_processor(
            df,
            [SortKey("s", "string", case_insensitive=True, descending=True),
             SortKey("i", "int")],
        ).collect()
    ]
    assert got_desc == [1, 2, 5, 3, 4]


def test_top_and_unique_and_repeat(spark):
    df = spark.createDataFrame(
        [(g, i, i * 10) for g in ("x", "y") for i in range(5)],
        "g string, i int, v int",
    )
    top2 = top_processor(df, [SortKey("v", "int", descending=True)], 2)
    assert [r.v for r in top2.collect()] == [40, 40]
    per_group = top_processor(
        df, [SortKey("v", "int", descending=True)], 2, per_group=["g"]
    )
    assert per_group.count() == 4
    uniq = unique_processor(
        df, keys=[SortKey("g")], order_by=[SortKey("v", "int", descending=True)]
    )
    assert {(r.g, r.v) for r in uniq.collect()} == {("x", 40), ("y", 40)}
    rep = repeat_processor(df.limit(1), 3)
    assert [r.copy_id for r in rep.collect()] == [0, 1, 2]


def test_max_null_index_split(spark):
    df = spark.createDataFrame(
        [("a", "b"), ("a", None), (None, "b")], "x string, y string"
    )
    to_shuffle, passthrough = map_reduce_passthrough_split(
        df, [SortKey("x"), SortKey("y")], max_null_index=0
    )
    # records whose FIRST null key index > 0 pass through... index 0 null → shuffle
    assert to_shuffle.count() == 1  # (None, 'b'): first-null-index 0 <= 0
    assert passthrough.count() == 2


def test_conditions(spark):
    df = spark.createDataFrame(
        [("abc", 5, None), ("ABC", 15, 2.0), (None, 8, 3.0), ("", 20, 4.0)],
        "s string, i long, d double",
    )
    assert df.where(condition("s", "eq", "abc", case_insensitive=True)).count() == 2
    assert df.where(condition("s", "nullorempty")).count() == 2
    assert df.where(condition("i", "gt", 9, typed="long")).count() == 2
    # null compares as -1 → less than any value (Condition.cs:227-231)
    assert df.where(condition("d", "lt", 2.5, typed="double")).count() == 2
    assert df.where(condition("s", "substring", "b")).count() == 1  # case-sensitive
    assert df.where(condition("s", "substring", "b", case_insensitive=True)).count() == 2
    assert df.where(condition("s", "regex", "^a")).count() == 1
    assert df.where(parse_condition("s,noteq,abc")).count() == 3


def test_categorizer_nested(spark):
    df = spark.createDataFrame(
        [(5, "STEEL"), (15, "BRASS POLISHED"), (40, "BRASS"), (25, "TIN")],
        "size int, typ string",
    )
    cats = [
        Category(sel_range("size", hi=10), "small"),
        Category(
            sel_range("size", lo=11),
            "big",
            sub=[Category(sel_regex("typ", "BRASS"), "big-brass")],
        ),
    ]
    got = {
        (r.size): r.cat
        for r in apply_categories(df, cats, "cat", mode="overwrite").collect()
    }
    assert got == {5: "small", 15: "big-brass", 40: "big-brass", 25: "big"}
    app = {
        r.size: r.cat
        for r in apply_categories(df, cats, "cat", mode="append").collect()
    }
    assert app[15] == "big;big-brass"


def test_converters(spark):
    df = spark.createDataFrame(
        [(" x ;y; z ", "1,234.5", "2024-03-05T10:00:00", "  ", "20240305")],
        "s string, num string, dt string, blank string, ymd string",
    )
    r = df.select(
        split_semicolon(F.col("s")).alias("parts"),
        to_double(F.col("num")).alias("d"),
        to_date_multi(F.col("dt")).alias("ts"),
        trim_white(F.col("blank")).alias("tw"),
        null_if_empty(F.lit("")).alias("ne"),
        to_date_multi(F.col("ymd")).alias("ts2"),
        datepart(to_date_multi(F.col("dt")), "y").alias("yy"),
    ).first()
    assert list(r.parts) == ["x", "y", "z"]
    assert r.d == 1234.5
    assert r.ts is not None and r.ts.year == 2024 and r.ts.month == 3
    assert r.tw is None and r.ne is None
    assert r.ts2 is not None and r.ts2.day == 5
    assert r.yy == 2024

    arr = df.select(F.split(F.lit("a;b;c"), ";").alias("a")).select(
        arr_flatten(F.col("a"), "|").alias("fl"),
        arr_first(F.col("a")).alias("f"),
        arr_last(F.col("a")).alias("l"),
        arr_count(F.col("a")).alias("n"),
    ).first()
    assert (arr.fl, arr.f, arr.l, arr.n) == ("a|b|c", "a", "c", 3)

    rep = df.select(
        replace_list(F.lit("hello world"), [("hello", "hi"), ("world", "earth")]).alias("r"),
        replace_list(F.lit("aAa"), [("a+", "X")], regex=True).alias("rx"),
    ).first()
    assert rep.r == "hi earth"
    assert rep.rx == "XAX"


def test_epoch_seconds_parse(spark):
    df = spark.createDataFrame([("1700000000",)], "e string")
    r = df.select(to_date_multi(F.col("e")).alias("ts")).first()
    assert r.ts is not None and r.ts.year == 2023


def test_to_long_int64_exact(spark):
    from importpipeline_spark.functions.converters import to_long

    df = spark.createDataFrame(
        [("9007199254740993", "1,234", "12.9")], "big string, grp string, dec string"
    )
    r = df.select(
        to_long(F.col("big")).alias("b"),
        to_long(F.col("grp")).alias("g"),
        to_long(F.col("dec")).alias("d"),
    ).first()
    assert r.b == 9007199254740993  # > 2^53: double round-trip would corrupt
    assert r.g == 1234
    assert r.d == 12


def test_analyzer_astral_mn_parity():
    from importpipeline_spark.text.tokenizer import tokenize_scalar, tokenize_series
    import pandas as pd

    # U+1D167 MUSICAL SYMBOL COMBINING TREMOLO-1 is Mn outside the BMP:
    # index-side (vectorized) and query-side (scalar) must agree
    s = "a\U0001D167b café"
    assert tokenize_scalar(s) == list(tokenize_series(pd.Series([s]))[0])
    assert tokenize_scalar(s) == ["ab", "cafe"]


def test_normalize_fast_path_parity():
    """r8: strip_diacritics takes three routes per row (pure-ASCII identity,
    ≤U+024F translate table, full NFD→drop-Mn→NFC) — a mixed batch must be
    byte-identical to the scalar reference on every route and route-boundary
    (bare Mn mark, beyond-Latin composables, Hangul jamo recomposition)."""
    import pandas as pd

    from importpipeline_spark.text.normalize import (
        strip_diacritics,
        strip_diacritics_scalar,
    )
    from importpipeline_spark.text.tokenizer import tokenize_scalar, tokenize_series

    cases = [
        "plain ascii",            # route 0: identity
        "café straße ǟ ý ø Å",    # route 1: translate table (≤ U+024F)
        "é combining",      # route 2: standalone Mn (U+0301 > U+024F)
        "가 jamo",      # route 2: NFC recomposes non-Mn starters
        "ガ katakana ガ",  # route 2: Mn dakuten recomposition
        "mixed é 中文",           # route 2: Latin + CJK in one string
        None,
        "",
    ]
    ser = pd.Series(cases, dtype=object)
    stripped = strip_diacritics(ser)
    for c, v in zip(cases, stripped):
        assert strip_diacritics_scalar(c) == v, c
    toks = tokenize_series(ser)
    for c, v in zip(cases, toks):
        got = None if v is None or isinstance(v, float) else list(v)
        assert tokenize_scalar(c) == got, c
    # the jamo pair must actually recompose (the property that makes the
    # translate table unsafe beyond U+024F — pin that the slow path runs)
    assert strip_diacritics_scalar("가") == "가"


def test_html_url_encode_decode(spark):
    from importpipeline_spark.functions.converters import (
        html_decode_udf,
        html_encode_udf,
        url_decode,
        url_encode,
    )

    df = spark.createDataFrame(
        [("a & b <c>", "x y&z=1", "a%20%26%20b", "x &amp; &eacute;")],
        "raw string, url string, enc string, ent string",
    )
    r = df.select(
        html_encode_udf(F.col("raw")).alias("he"),
        html_decode_udf(F.col("ent")).alias("hd"),
        url_encode(F.col("url")).alias("ue"),
        url_decode(F.col("enc")).alias("ud"),
    ).first()
    assert r.he == "a &amp; b &lt;c&gt;"
    assert r.hd == "x & é"
    assert "%26" in r.ue or "%3D" in r.ue
    assert r.ud == "a & b"


def test_json_decode_and_format(spark):
    from importpipeline_spark.functions.converters import format_string, json_decode

    df = spark.createDataFrame([('{"k": 7, "s": "hi"}', 3.5)], "j string, v double")
    r = df.select(
        json_decode(F.col("j"), "k int, s string").alias("o"),
        format_string("v=%.1f!", F.col("v")).alias("f"),
    ).first()
    assert r.o.k == 7 and r.o.s == "hi"
    assert r.f == "v=3.5!"


def test_perl_regex(spark):
    """PerlRegex (PerlRegex.cs:29-82): the reference's own unit test
    (UnitTests/PerlRegexTests.cs — '^(.*)' → 'x$1' gives 'xabc'), delimiter
    freedom, match mode, and error cases."""
    from importpipeline_spark.functions.converters import (
        parse_perl_regex,
        perl_regex_match,
        perl_regex_replace,
    )

    df = spark.createDataFrame([("abc",), (None,), ("a b c",)], "s string")
    got = df.select(
        perl_regex_replace(F.col("s"), "s/^(.*)/x$1/").alias("anch"),
        perl_regex_replace(F.col("s"), "s/(.*)/x$1/").alias("unanch"),
        perl_regex_replace(F.col("s"), "s# #_#").alias("delim"),
        perl_regex_match(F.col("s"), "m/b/").alias("hasb"),
    ).collect()
    assert got[0].anch == "xabc"
    # without ^ the empty match at the end also fires (reference test's note)
    assert got[0].unanch == "xabcx"
    assert got[2].delim == "a_b_c"
    assert got[1].anch is None and got[1].hasb is False  # null guards
    assert [r.hasb for r in got] == [True, False, True]

    with pytest.raises(ValueError, match="not a replace"):
        parse_perl_regex("m/x/", must_replace=True)
    with pytest.raises(ValueError, match="Invalid PerlRegex"):
        parse_perl_regex("x/a/b/")
    with pytest.raises(ValueError, match="Invalid PerlRegex"):
        parse_perl_regex("s")


def test_undup_script_int_mean_parity(spark):
    """The script path's int-mode mean must equal the agg path's
    floor(sum(per-value truncations)/count) on fractional values, and yield
    null for all-null groups instead of crashing."""
    df = spark.createDataFrame(
        [(1, 1.5), (1, 0.6), (1, None), (2, None), (2, None),
         (2, None), (3, -1.5), (3, -0.6)],
        "k int, x double",
    )
    agg = {
        r.k: r.m
        for r in map_reduce(
            df, [SortKey("k", "int")],
            [UndupAction("mean", "x", "m", int_mode=True),
             UndupAction("count", dest="c")],
        ).collect()
    }
    script = {
        r.k: r.m
        for r in map_reduce(
            df, [SortKey("k", "int")],
            [UndupAction("mean", "x", "m", int_mode=True),
             UndupAction("count", dest="c"),
             UndupAction("script", fn=lambda pdf: None)],
            order_by=[SortKey("x", "double")],
        ).collect()
    }
    assert agg == script
    assert agg[1] == 0       # floor((1+0)/2)
    assert agg[2] is None    # all-null group
    assert agg[3] == -1      # floor((-1+0)/2) = -1 (floor, not trunc)
