"""Pretraining filters (operators/pretrain.py): hand-computed repetition
signals on crafted docs (multi-line, degenerate, empty) + contamination
screen edges. The exact SQL oracles at sf0.01/sf0.001 cover the bulk path;
these pin the corner semantics."""

import pytest
from pyspark.sql import functions as F

from importpipeline_spark.operators.pretrain import (
    contamination_hits,
    repetition_signals,
)


@pytest.fixture(scope="module")
def crafted(spark):
    rows = [
        (1, "a a a b"),          # word dups + repeated 2-gram
        (2, "x y z"),            # all-distinct
        (3, "l1\nl2\nl1\n\n"),   # duplicate lines; empty lines filtered
        (4, ""),                 # empty doc
        (5, "solo"),             # too short for any n-gram
        (6, None),               # NULL text (unextractable doc)
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_repetition_signals_hand_computed(crafted):
    got = {r.doc_id: r for r in repetition_signals(crafted).collect()}
    assert set(got) == {1, 2, 3, 4, 5, 6}

    r1 = got[1]  # "a a a b": words a,a,a,b; 2-grams "a a"×2,"a b"; chars 7
    assert (r1.n_words, r1.n_chars) == (4, 7)
    assert r1.dup_word_frac == round(3 / 4, 4)
    assert r1.dup_line_frac == 0.0  # one line, not duplicated
    assert r1.top_2gram_char_frac == round(2 * 3 / 7, 4)   # "a a" twice
    assert r1.top_3gram_char_frac == round(1 * 5 / 7, 4)

    r2 = got[2]  # "x y z": nothing repeats; top grams still have mass
    assert r2.dup_word_frac == 0.0
    assert r2.top_2gram_char_frac == round(3 / 5, 4)
    assert r2.top_3gram_char_frac == 1.0  # the whole doc is one 3-gram

    # doc 3: Spark's trim strips only SPACES, but _toks filters empty tokens,
    # so the trailing "\n\n" mints NO phantom token: [l1, l2, l1] — 3 words,
    # l1 duplicated (the old behavior kept a 4th empty token; ADVICE r3)
    r3 = got[3]
    assert (r3.n_words, r3.n_chars) == (3, 10)
    assert r3.dup_line_frac == round(2 / 3, 4)  # empty lines filtered
    assert r3.dup_word_frac == round(2 / 3, 4)
    assert r3.top_2gram_char_frac == round(5 / 10, 4)  # "l1 l2" / "l2 l1"
    assert r3.top_3gram_char_frac == round(8 / 10, 4)  # "l1 l2 l1"

    r4 = got[4]  # empty: everything zero, nothing NULL
    assert (r4.n_words, r4.n_chars) == (0, 0)
    assert (r4.dup_word_frac, r4.dup_line_frac) == (0.0, 0.0)
    assert (r4.top_2gram_char_frac, r4.top_3gram_char_frac) == (0.0, 0.0)

    r5 = got[5]  # single word: no n-grams to repeat
    assert (r5.n_words, r5.dup_word_frac) == (1, 0.0)
    assert (r5.top_2gram_char_frac, r5.top_3gram_char_frac) == (0.0, 0.0)

    r6 = got[6]  # NULL text behaves exactly like an empty doc
    assert (r6.n_words, r6.n_chars) == (0, 0)
    assert (r6.dup_word_frac, r6.dup_line_frac) == (0.0, 0.0)
    assert (r6.top_2gram_char_frac, r6.top_3gram_char_frac) == (0.0, 0.0)



def test_repetition_signals_kinds_subset(crafted):
    """r8: kinds=("w","g2") must reproduce the default's word/2-gram columns
    exactly (the corpus pipeline's quality gate reads only those) while
    emitting zeros for the skipped kinds."""
    full = {r.doc_id: r for r in repetition_signals(crafted).collect()}
    sub = {r.doc_id: r
           for r in repetition_signals(crafted, kinds=("w", "g2")).collect()}
    assert set(sub) == set(full)
    for d in full:
        assert sub[d].n_words == full[d].n_words
        assert sub[d].n_chars == full[d].n_chars
        assert sub[d].dup_word_frac == full[d].dup_word_frac
        assert sub[d].top_2gram_char_frac == full[d].top_2gram_char_frac
        assert sub[d].dup_line_frac == 0.0
        assert sub[d].top_3gram_char_frac == 0.0

def test_contamination_screen_edges(crafted):
    bench = crafted.where(F.col("doc_id") == 1).select("doc_id", "text")
    got = {r.doc_id: r for r in
           contamination_hits(crafted, bench, "text", "doc_id", n=3).collect()}
    # every doc appears exactly once, even zero-hit / empty / NULL ones
    assert set(got) == {1, 2, 3, 4, 5, 6}
    # doc 1 shares both of its distinct 3-grams with the benchmark (itself)
    assert got[1].n_hits == 2 and got[1].contaminated
    for d in (2, 3, 4, 5, 6):
        assert got[d].n_hits == 0 and not got[d].contaminated


def test_contamination_partial_overlap(spark):
    docs = spark.createDataFrame(
        [(1, "p q r s t"), (2, "u v w")], "doc_id long, text string"
    )
    bench = spark.createDataFrame(
        [(100, "q r s zzz")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in
           contamination_hits(docs, bench, n=3).collect()}
    # doc 1's distinct 3-grams: "p q r","q r s","r s t" — only "q r s" is in
    # the benchmark's {"q r s","r s zzz"}
    assert got[1].n_hits == 1 and got[1].contaminated
    assert got[2].n_hits == 0 and not got[2].contaminated


def test_corpus_sample_deterministic_and_nested(spark):
    from importpipeline_spark.operators.pretrain import corpus_sample

    rows = [(i, "en" if i % 3 else "de") for i in range(3000)]
    df = spark.createDataFrame(rows, "doc_id long, lang string")

    frac = {"en": 0.5, "de": 0.25}
    a = {r.doc_id for r in corpus_sample(df, frac, seed=7).collect()}
    b = {r.doc_id for r in corpus_sample(df, frac, seed=7).collect()}
    assert a == b  # same seed → identical corpus, independent of execution

    # realized fractions track targets (low-discrepancy hash over dense ids)
    n_en = sum(1 for i in a if i % 3)
    n_de = sum(1 for i in a if not i % 3)
    assert abs(n_en / 2000 - 0.5) < 0.05
    assert abs(n_de / 1000 - 0.25) < 0.05

    # shrinking a stratum's budget gives a strictly NESTED sample
    smaller = {r.doc_id for r in
               corpus_sample(df, {"en": 0.25, "de": 0.25}, seed=7).collect()}
    assert smaller <= a

    # different seed → a genuinely different PERMUTATION, not a rotation of
    # the same one: overlap between two seeds' samples must sit near the
    # budget fraction (what an independent draw gives), for several seed
    # pairs — an affine (id+seed)*K hash fails this with ~99% overlap
    for s2 in (8, 57, 1001):
        c = {r.doc_id for r in corpus_sample(df, frac, seed=s2).collect()}
        en_a = {i for i in a if i % 3}
        en_c = {i for i in c if i % 3}
        overlap = len(en_a & en_c) / max(1, len(en_a))
        assert 0.35 < overlap < 0.65, (s2, overlap)

    # strata without a budget are dropped entirely
    only_en = corpus_sample(df, {"en": 0.5}, seed=7)
    assert only_en.where(F.col("lang") == "de").count() == 0

    # negative ids (xxhash64 doc ids) are handled via pmod, not %
    neg = spark.createDataFrame(
        [(-5_000_000_123, "en"), (-1, "en")], "doc_id long, lang string"
    )
    assert corpus_sample(neg, {"en": 1.0}, seed=1).count() == 2


def test_pii_scrub_and_counts(spark):
    from importpipeline_spark.operators.pretrain import pii_counts, scrub_pii

    rows = [
        (1, "mail a.b+c@ex-ample.co.uk and 192.168.1.200 then +44 20 7946 0958 done"),
        (2, "no pii here at all"),
        (3, "two mails x@y.io z@w.org one ip 8.8.8.8"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r for r in df.select(
        "doc_id", scrub_pii(F.col("text")).alias("s"),
        pii_counts(F.col("text")).alias("c")).collect()}

    s1 = got[1].s
    assert "<EMAIL>" in s1 and "<IP>" in s1 and "<PHONE>" in s1
    assert "a.b+c@" not in s1 and "192.168" not in s1 and "7946" not in s1
    assert s1.startswith("mail <EMAIL> and <IP> then <PHONE> done")
    assert (got[1].c.n_emails, got[1].c.n_ips, got[1].c.n_phones) == (1, 1, 1)

    assert got[2].s == "no pii here at all"
    assert (got[2].c.n_emails, got[2].c.n_ips, got[2].c.n_phones) == (0, 0, 0)

    assert got[3].s == "two mails <EMAIL> <EMAIL> one ip <IP>"
    assert (got[3].c.n_emails, got[3].c.n_ips, got[3].c.n_phones) == (2, 1, 0)


def test_select_token_budget(spark):
    """Distributed prefix-sum budget cut: equals the scalar prefix
    computation, composes (smaller budget ⊂ larger), is independent of the
    range-partition count, and never plans a single-partition window."""
    import io
    from contextlib import redirect_stdout

    from importpipeline_spark.operators.pretrain import (
        select_token_budget,
    )
    from importpipeline_spark.operators.dedup import release_cache

    rows = [(i, (i * 37) % 100 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")

    # scalar reference: prefix of (n_tokens DESC, doc_id ASC) under budget
    ordered = sorted(rows, key=lambda r: (-r[1], r[0]))
    def prefix(budget):
        out, acc = set(), 0
        for d, n in ordered:
            if acc + n > budget:
                break
            acc += n
            out.add(d)
        return out

    for budget in (0, 500, 5000, 10**9):
        got = select_token_budget(df, budget, "n_tokens", "n_tokens",
                                  num_partitions=8)
        ids = {r.doc_id for r in got.collect()}
        assert ids == prefix(budget), budget
        release_cache(got)

    # partition-count independence (range boundaries don't change the set)
    for p in (1, 3, 64):
        got = select_token_budget(df, 5000, "n_tokens", "n_tokens",
                                  num_partitions=p)
        assert {r.doc_id for r in got.collect()} == prefix(5000), p
        release_cache(got)

    # nested budgets compose
    small = select_token_budget(df, 2000, "n_tokens", "n_tokens")
    large = select_token_budget(df, 8000, "n_tokens", "n_tokens")
    s_ids = {r.doc_id for r in small.collect()}
    l_ids = {r.doc_id for r in large.collect()}
    assert s_ids <= l_ids
    release_cache(small)
    release_cache(large)

    # plan discipline: the window is partitioned by the range-partition id —
    # no single-partition exchange anywhere
    got = select_token_budget(df, 5000, "n_tokens", "n_tokens")
    buf = io.StringIO()
    with redirect_stdout(buf):
        got.explain("formatted")
    assert "SinglePartition" not in buf.getvalue()
    release_cache(got)


def test_select_token_budget_zero_token_boundary(spark):
    """ADVICE r6 boundary case: ZERO-token docs whose priorities fall
    between the last fitting positive doc and an overshooting one must
    survive (their cumulative sum still fits) even when they occupy
    zero-total range partitions between q and p* — the r6 cut (q's last
    row) silently dropped them; the r7 cut scans the gap partitions."""
    from importpipeline_spark.operators.dedup import release_cache
    from importpipeline_spark.operators.pretrain import select_token_budget

    rows = (
        [(i, 1000 - i, 100) for i in range(10)]          # 10 × 100 tokens
        + [(100 + i, 900 - i, 0) for i in range(190)]    # zero-token run
        + [(500, 10, 10_000)]                            # overshoots
    )
    df = spark.createDataFrame(rows, "doc_id long, prio long, n_tokens long")

    ordered = sorted(rows, key=lambda r: (-r[1], r[0]))

    def prefix(budget):
        out, acc = set(), 0
        for d, _p, n in ordered:
            if acc + n > budget:
                break
            acc += n
            out.add(d)
        return out

    # budget 1000: every zero-token doc fits exactly at the boundary; the
    # overshooting doc defines p* whose first row can never survive
    for parts in (8, 32, 64):
        for budget in (1000, 950, 450):
            got = select_token_budget(df, budget, "n_tokens", "prio",
                                      num_partitions=parts)
            ids = {r.doc_id for r in got.collect()}
            assert ids == prefix(budget), (parts, budget)
            release_cache(got)


def test_pipeline_boilerplate_stage(spark, tmp_path):
    """run_pipeline's boilerplate stage: a footer present in 60% of pages
    is mined at the 30% df-fraction threshold and stripped from every
    document, with exact token drop accounting; the clean docs survive
    byte-identical. Pages use the plain-text passthrough (html == text
    bytes), so extraction is the identity."""
    import os
    import sys

    sys.path.insert(0, os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))))
    from jobs.pretrain_corpus_job import run_pipeline

    footer = "subscribe to our newsletter today"
    rows = []
    for i in range(50):
        # body fully unique per doc so ONLY the footer's trigrams repeat
        body = f"unique{i} body{i} words{i} number{i} alpha{i} beta{i} gamma{i} delta{i}"
        text = f"{body} {footer}" if i % 5 < 3 else body
        rows.append((f"https://h{i % 7}.example/p/{i}", text))
    pages = spark.createDataFrame(rows, "url string, text string").select(
        "url",
        F.current_timestamp().alias("warc_ts"),
        F.encode("text", "utf-8").alias("html"),
        F.lit("en").alias("lang"),
    )
    out = str(tmp_path / "corpus")
    stats = run_pipeline(spark, pages, out, boilerplate_df_frac=0.3,
                         neardup_threshold=0.95)
    assert stats["extracted"] == 50
    # footer in 30/50 docs = 60% > 30%: its 3 trigrams are mined
    assert stats["boilerplate_ngrams"] == 3
    assert stats["boilerplate_tokens_removed"] == 30 * 5
    corpus = {r.url: r.text for r in spark.read.parquet(out).collect()}
    assert len(corpus) == 50
    for url, text in corpus.items():
        assert "subscribe" not in text and "newsletter" not in text
    # a doc that never had the footer is untouched
    assert corpus["https://h0.example/p/35"] == (
        "unique35 body35 words35 number35 alpha35 beta35 gamma35 delta35"
    )

    # optional final token-budget cut: re-run with a 100-token budget —
    # the written corpus's total whitespace tokens must fit it, docs chosen
    # longest-first (all stripped docs are 8 tokens → 12 docs fit)
    out2 = str(tmp_path / "corpus_budget")
    stats2 = run_pipeline(spark, pages, out2, boilerplate_df_frac=0.3,
                          neardup_threshold=0.95, token_budget=100)
    kept = spark.read.parquet(out2).collect()
    total = sum(len(r.text.split()) for r in kept)
    assert total <= 100
    assert stats2["written"] == len(kept) == 12  # 12 × 8 = 96 ≤ 100 < 104


def test_pii_phone_no_false_positives(spark):
    """The phone pattern must redact phone SHAPES, not every digit run: a
    measurement table, single-digit sequences, dates, and hyphenated ISBNs
    survive unredacted (the old \\+?\\d[\\d -]{7,}\\d destroyed all of them
    — VERDICT r3 'What's wrong #5')."""
    from importpipeline_spark.operators.pretrain import pii_counts, scrub_pii

    survive = [
        "1 2 3 4 5 6 7 8 9",
        "date 2026-08-17 here",
        "ts 2026-08-17 16:30:00 end",   # datetime: last group must be 3-4 digits
        "isbn 978-3-16-148410-0 ok",
        "readings: 12.5 13.7 14.9 16.02",
        "page 1 22 333",
        "pop 1 234 567 users",          # thousand-separated: no '+' / '-'
        "run 12 34 56 78 ok",           # all-2-digit groups (FR-style trade)
        "id A123456789 ok",             # digits embedded in an identifier:
                                        # no \b between 'A' and '1'
        "ref X99y1234567z",             # fully-embedded run
        "acct 1234567890123456 end",    # 16-digit run: longer than a phone,
                                        # no \b inside a run (documented
                                        # trade-off — card/account numbers
                                        # are not phone shapes)
    ]
    redact = [
        "+44 20 7946 0958",       # grouped international
        "0171-555-0123",          # hyphen groups
        "call 5551234567 now",    # plain 10-digit run
        "+1 555 010 0042",        # 1-digit country code
    ]
    rows = [(i, t) for i, t in enumerate(survive + redact)]
    df = spark.createDataFrame(rows, "i long, text string")
    got = {r.i: r for r in df.select(
        "i", scrub_pii(F.col("text")).alias("s"),
        pii_counts(F.col("text")).alias("c")).collect()}
    for i, t in enumerate(survive):
        assert got[i].s == t, (t, got[i].s)
        assert got[i].c.n_phones == 0
    for j in range(len(redact)):
        i = len(survive) + j
        assert "<PHONE>" in got[i].s, (redact[j], got[i].s)
        assert got[i].c.n_phones == 1

    # documented inherent trade-off: '.' IS a word boundary and Java/RE2
    # have no lookbehind, so a ≥7-digit decimal fraction redacts after the
    # dot. Pinned so a future "fix" that breaks real phones shows up here.
    frac = spark.createDataFrame([(0, "pi is 3.14159265 ok")], "i long, text string")
    assert frac.select(scrub_pii(F.col("text")).alias("s")).first().s == \
        "pi is 3.<PHONE> ok"
