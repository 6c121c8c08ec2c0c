"""Golden tests for the HTML→text extraction spec.

Mirrors the reference's blackbox philosophy (byte-identical goldens —
/root/reference/ImportPipeline/UnitTests/FileTestBase.cs:59-69) applied to
HtmlProcessor.GetText semantics (Html/HtmlProcessor.cs:274-339).
Cases from FIXTURES.md §4.
"""

import pytest

from importpipeline_spark.html.htmltext import (
    extract_text,
    get_abstract_from_text,
    html_to_text,
    quess_is_html,
)
from importpipeline_spark.index.pagesgen import gen_page


# ---- inline vs block spacing (HtmlProcessor.cs:292-303) ----

@pytest.mark.parametrize(
    "html,expected",
    [
        ("a<b>b</b>c", "abc"),
        ("a<div>b</div>c", "a b c"),
        ("a<span>b</span>c", "abc"),
        ("a<p>b</p><p>c</p>", "a b c"),  # no double space at block boundaries
        ("<div><div>a</div></div>b", "a b"),
        ("a<div></div>b", "a b"),  # childless block appends only opening blank
        ("a<br>b", "ab"),  # br is inline
        ("a<hr>b", "a b"),  # hr is block, void
        ("a <b>b</b> c", "a b c"),  # text-node whitespace preserved
    ],
)
def test_inline_block_spacing(html, expected):
    assert extract_text(html) == expected


# ---- unwanted tags dropped entirely (HtmlProcessor.cs:458) ----

@pytest.mark.parametrize(
    "html,expected",
    [
        ("a<style>.x{}</style>b", "ab"),
        ("a<script>var x=1;</script>b", "ab"),
        ("a<noscript>no</noscript>b", "ab"),
        ("a<object>o</object>b", "ab"),
        ("<style>only style</style>", None),
    ],
)
def test_unwanted_dropped(html, expected):
    assert extract_text(html) == expected


# ---- entity decode before append (HtmlProcessor.cs:279) ----

@pytest.mark.parametrize(
    "html,expected",
    [
        ("x &amp; y", "x & y"),
        ("caf&eacute;", "café"),
        ("dots&#x2026;", "dots…"),
        ("a&nbsp;b", "a\xa0b"),
    ],
)
def test_entity_decode(html, expected):
    assert extract_text(html) == expected


# ---- leading/trailing whitespace (HtmlProcessor.cs:280-284, 317-330) ----

def test_leading_trailing_trim():
    assert extract_text("  \r\n\t hello world \t\r\n ") == "hello world"
    assert extract_text("   \r\n \t ") is None
    assert extract_text("") is None
    # leading whitespace trimmed only while output is empty
    assert extract_text("<div>  a</div>") == "a"
    assert extract_text("a<div>  b</div>") == "a   b"
    # NBSP is NOT in TRIMCHARS — survives trailing trim
    assert extract_text("a&nbsp;") == "a\xa0"


# ---- comments ignored (HtmlProcessor.cs:289) ----

def test_comments_ignored():
    assert extract_text("a<!-- hidden -->b") == "ab"
    assert extract_text("<!-- only -->") is None


# ---- no-body / body handling (HtmlProcessor.cs:83-87) ----

def test_body_selection():
    html = "<html><head><title>T</title></head><body><p>content</p></body></html>"
    # head content (title) not extracted — walk starts at body
    assert extract_text(html) == "content"
    # no body element → whole document is walked
    assert extract_text("<p>a</p><p>b</p>") == "a b"


def test_ws_only_text_nodes_removed_when_head_present():
    # with a <head>, whitespace-only text nodes are removed document-wide
    # (HtmlProcessor.cs:95-97) → no stray newlines between blocks
    html = (
        "<html><head><title>t</title></head><body>\n"
        "<p>a</p>\n<p>b</p>\n</body></html>"
    )
    assert extract_text(html) == "a b"


def test_head_removes_ws_between_inline():
    # documented gluing semantics: with <head>, the bare ' ' text node between
    # two inline elements is whitespace-only → removed → words glued
    html = (
        "<html><head><title>t</title></head><body>"
        "<p>x <b>y</b> <b>z</b></p></body></html>"
    )
    assert extract_text(html) == "x yz"
    # without <head>, the space survives
    assert extract_text("<p>x <b>y</b> <b>z</b></p>") == "x y z"


def test_email_entry_undup():
    # keep the div.email-entry with the most descendants (HtmlProcessor.cs:126-158)
    html = (
        "<html><head><title>m</title></head><body>"
        '<div class="email-entry"><p>short</p></div>'
        '<div class="email-entry"><p>long one</p><p>second para</p></div>'
        "</body></html>"
    )
    assert extract_text(html) == "long one second para"


# ---- passthrough (QuessIsHtml, HtmlProcessor.cs:160-182) ----

def test_quess_is_html():
    assert not quess_is_html(None)
    assert not quess_is_html("")
    assert not quess_is_html("plain text with no tags at all")
    assert not quess_is_html("a < b and c > d")  # only 2 tag chars
    assert quess_is_html("<p></p><p></p>")  # 4 '<'/'>' + 2×(2 bonus for '/>'... )
    assert quess_is_html("<a><b><c><d>")  # 8 tag chars
    # self-closing bonus: '/>' counts '>' + 2 extra (HtmlProcessor.cs:176)
    assert quess_is_html("<br/><br/>")  # 1+3 + 1+3 = 8
    assert not quess_is_html("<i>x</i><b>y")  # 6 tag chars, '/' not before '>'
    # beyond 1000 chars of non-tag text → false
    assert not quess_is_html("x" * 1100 + "<a><b><c><d>")


def test_html_to_text_passthrough():
    plain = "just words here nothing else at all"
    assert html_to_text(plain) == plain
    assert html_to_text(None) is None
    assert html_to_text("") == ""


# ---- abstract (GetAbstractFromText, HtmlProcessor.cs:222-265) ----

def test_abstract():
    # short text returned unchanged
    assert get_abstract_from_text("short", 100, 10) == "short"
    assert get_abstract_from_text(None, 100, 10) is None
    # sentence boundary preferred, nearest to maxLength
    text = "aaaa. bbbb. cccc. dddd. eeee. ffff. gggg. hhhh."
    out = get_abstract_from_text(text, 20, 6)
    assert out.endswith(" …")
    cut = out[:-2]
    assert text.startswith(cut)
    # the char at the cut position is a sentence end within ±delta of 20
    assert text[len(cut)] in ".?!"
    assert 14 <= len(cut) < 26
    # word boundary fallback when no sentence end in window
    text2 = "word " * 20
    out2 = get_abstract_from_text(text2.strip(), 22, 4)
    assert out2.endswith(" …")
    # hard cut when neither boundary exists
    text3 = "x" * 100
    out3 = get_abstract_from_text(text3, 20, 5)
    assert out3 == "x" * 19 + " …"


# ---- generator golden round-trip: parser vs independently-built golden ----

def test_generator_goldens_scalar():
    for row_id in range(400):
        row = gen_page(row_id, seed=42)
        html = row["html"].decode("utf-8")
        got = html_to_text(html)
        assert got == row["text"], (
            f"row {row_id}: extraction mismatch\n got={got!r}\n exp={row['text']!r}"
        )


def test_generator_deterministic():
    a = gen_page(123, seed=42)
    b = gen_page(123, seed=42)
    assert a == b
    c = gen_page(123, seed=43)
    assert a != c
