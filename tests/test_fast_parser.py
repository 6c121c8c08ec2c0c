"""Fast-path HTML parser must be DOM-identical to the stdlib-based builder
whenever it accepts an input (else it must raise and fall back)."""

import random

from importpipeline_spark.html import htmltext as H
from importpipeline_spark.index.pagesgen import gen_page


def _tree(node):
    if isinstance(node, H._Text):
        return ("T", node.raw)
    if isinstance(node, H._Comment):
        return ("C",)
    return (
        "E",
        node.tag,
        tuple(sorted((node.attrs or {}).items())),
        tuple(_tree(c) for c in node.children),
    )


def _check(html):
    try:
        a = _tree(H._fast_parse(html))
    except H._FastUnsupported:
        return False
    b = _tree(H._parse_html_stdlib(html))
    assert a == b, f"DOM mismatch for {html!r}"
    return True


def test_corpus_differential():
    accepted = 0
    for i in range(800):
        if _check(gen_page(i, 42)["html"].decode()):
            accepted += 1
    # the fast path must actually cover the corpus (perf relies on it)
    assert accepted >= 780


def test_edge_cases_differential():
    cases = [
        "a<b>b</b>c", "a<div>b</div>c", "a<div></div>b", "a<br>b", "a<hr>b",
        "x &amp; y", "caf&eacute;", "a&nbsp;b", "<style>.x{}</style>b",
        "a<script>var x=1 < 2;</script>b", "<br/><br/>", "<P>Upper</P>",
        "<html><head><title>T</title></head><body><p>c</p></body></html>",
        "<p>a</p><!-- c --><p>b</p>", "<!DOCTYPE html><p>a</p>",
        '<div class="email-entry"><p>x</p></div>', "<p >spaces</p >",
        "<input type='text' value=bare>", "<p>unclosed <b>bold",
        "", "   ", "plain text", '<a href="x?a=1&amp;b=2">l</a>',
    ]
    for h in cases:
        _check(h)


def test_script_near_close_matches_stdlib():
    # '</scriptx>' is NOT an end tag for <script>: stdlib keeps it as data;
    # the fast path must agree or bail (never leak script content)
    html = "<body><p>x</p><script>var a=1;</scriptx> LEAKED </script><p>y</p></body>"
    assert H.extract_text(html) == "x y"
    _check(html)  # equal DOM or fast-path bail — both acceptable
    # exact close with whitespace still terminates
    _check("<p>a</p><script>s</script ><p>b</p>")


def test_fuzz_differential():
    rng = random.Random(17)
    pieces = [
        "<p>", "</p>", "<div>", "</div>", "<b>", "</b>", "text ", "&amp;",
        "<br>", "<!-- c -->", "<script>x<y</script>", "<span a=1>", "</span>",
        "<", ">", "a<b", '"', "'", "<i>", "</i>", "&eacute;", "\n",
        "<style>s</style>", "<em x='y'>", "</em>", "<!doctype html>",
    ]
    n_accepted = 0
    for _ in range(400):
        h = "".join(rng.choice(pieces) for _ in range(rng.randint(1, 25)))
        if _check(h):
            n_accepted += 1
    # most mutations parse on the fast path and all agree; bails are fine
    assert n_accepted > 100
