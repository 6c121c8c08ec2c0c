"""Pretraining-corpus filters: repetition signals + benchmark decontamination.

Two ops every LLM training-data pipeline runs over its web corpus, expressed
Spark-first (extending SURVEY.md's training-data suite alongside
operators/dedup.py and text/analysis.py):

- ``repetition_signals``: per-document repetition metrics in the style of
  the Gopher quality rules (Rae et al. 2021, publicly described) — documents
  dominated by repeated lines/words/n-grams are template or degenerate text.
- ``contamination_hits``: flag documents sharing word n-grams with a
  benchmark/eval table (the standard n-gram-overlap decontamination pass).

Both are shuffle-conscious: repetition is ONE exchange keyed by
(doc_id, unit) with map-side partial aggregation (a head unit combines
before the shuffle); contamination is an equi-join on the shingle key whose
benchmark side is tiny by nature (AQE broadcasts it), never a cross join.

Tokenization matches the DuckDB oracles exactly: split on ``\\s+`` after
trim; n-grams joined with single spaces (same as dedup.word_shingles, but
NON-distinct — repetition is about multiplicity).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.window import Window

from .dedup import word_shingles


def _toks(text_col):
    # filter empties rather than relying on trim(): Spark's trim strips only
    # SPACES, so text ending in \n or \t used to leave a trailing
    # empty-string token that inflated n_words and minted phantom n-grams —
    # ubiquitous on real corpora where trailing newlines are the norm. The
    # DuckDB oracles apply the identical list_filter.
    return F.filter(
        F.split(F.trim(text_col), r"\s+"), lambda x: x != ""
    )


def _grams_all(toks, n: int):
    """All word n-grams (with multiplicity, unlike word_shingles).

    ``toks`` must be an already-materialized column or bound lambda variable
    — never an unbound split(...) expression, which Catalyst would re-split
    once per gram (O(L²) per row; see dedup.bind_once)."""
    k = F.size(toks) - (n - 1)
    return F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.array_join(F.slice(toks, i + 1, n), " "),
        ),
    ).otherwise(F.array())


def repetition_signals(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    kinds: tuple = ("w", "l", "g2", "g3"),
) -> DataFrame:
    """Per-document repetition metrics → (id, n_words, n_chars,
    dup_word_frac, dup_line_frac, top_2gram_char_frac, top_3gram_char_frac).

    - ``dup_word_frac``: fraction of word occurrences whose word appears
      more than once in the document (Σ count over words with count>1 ÷
      total words).
    - ``dup_line_frac``: same over ``\\n``-separated lines.
    - ``top_{2,3}gram_char_frac``: MAX over n-grams of
      (occurrences × gram character length) ÷ document character length —
      the character mass the single most repetitive n-gram could cover. The
      max-of-product formulation needs no tie-break (ties in count with
      different gram lengths give different products), so results are
      deterministic and oracle-hashable.

    Plan shape: every unit kind (word / line / 2-gram / 3-gram) goes through
    ONE shared explode → groupBy(doc_id, kind, unit-identity) with partial
    aggregation, then one groupBy(doc_id) — two exchanges total, no windows,
    no per-doc quadratic array ops. Two scale decisions (r5):

    - The token and line arrays are PROJECTED columns, so gram construction
      reads a bound reference per element instead of re-splitting the text
      per gram (the O(L²)-per-row lambda-rebinding trap; dedup.bind_once).
    - The shuffle key is ``xxhash64(unit)`` with ``length(unit)`` computed
      map-side, never the unit string: counts need only identity and the
      char-mass terms need only length, so shuffling 4 copies of the text
      as strings (≈4× corpus volume at 100 TB) buys nothing. Within a
      (doc, kind) group a 64-bit collision merges two unit counts —
      probability ≈ u²/2⁶⁴ for u distinct units per doc, ~5e-12 even at a
      pathological u = 10⁴ — accepted and documented; the DuckDB oracle
      groups by the unit string and the contract query stays hash-green.

    ``kinds`` (r8) restricts which unit kinds are exploded and counted —
    a consumer gating only on words + 2-grams (the corpus pipeline's
    quality stage) skips ~40% of the exploded unit volume. Omitted kinds'
    output columns are emitted as 0.0 so the schema is stable; the default
    computes everything (the contract query is unchanged).
    """
    # NULL text (quarantined/unextractable docs) counts as empty — the doc
    # still gets its zero-valued row, matching the oracle's COALESCE
    text = F.coalesce(F.col(text_col), F.lit(""))
    prepared = df.select(
        F.col(id_col).alias("id"),
        F.length(text).alias("n_chars"),
        _toks(text).alias("__toks"),
        F.filter(F.split(text, r"\n"), lambda x: F.trim(x) != "")
         .alias("__lines"),
    )
    toks, lines = F.col("__toks"), F.col("__lines")

    def unit(kind):
        return lambda u: F.struct(
            F.lit(kind).alias("kind"),
            F.xxhash64(u).alias("h"),
            F.length(u).alias("len"),
        )

    units = prepared.select(
        "id",
        "n_chars",
        F.size(toks).alias("n_words"),
        F.size(lines).alias("n_lines"),
        # explode_outer: a document with no units at all (empty text) must
        # still emit its zero-valued signals row
        F.explode_outer(
            F.concat(*(
                part
                for kind, part in (
                    ("w", F.transform(toks, unit("w"))),
                    ("l", F.transform(lines, unit("l"))),
                    ("g2", F.transform(_grams_all(toks, 2), unit("g2"))),
                    ("g3", F.transform(_grams_all(toks, 3), unit("g3"))),
                )
                if kind in kinds
            ))
        ).alias("u"),
    )
    counts = units.groupBy(
        "id", "n_chars", "n_words", "n_lines",
        F.col("u.kind").alias("kind"), F.col("u.h").alias("h"),
        F.col("u.len").alias("len"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    per_doc = counts.groupBy("id", "n_chars", "n_words", "n_lines").agg(
        F.sum(F.when((F.col("kind") == "w") & (F.col("cnt") > 1), F.col("cnt"))
              .otherwise(0)).alias("dup_words"),
        F.sum(F.when((F.col("kind") == "l") & (F.col("cnt") > 1), F.col("cnt"))
              .otherwise(0)).alias("dup_lines"),
        F.max(F.when(F.col("kind") == "g2",
                     F.col("cnt") * F.col("len")).otherwise(0)
              ).alias("top2_chars"),
        F.max(F.when(F.col("kind") == "g3",
                     F.col("cnt") * F.col("len")).otherwise(0)
              ).alias("top3_chars"),
    )
    z = F.lit(0.0)
    return per_doc.select(
        F.col("id").alias(id_col),
        F.col("n_words").cast("long").alias("n_words"),
        F.col("n_chars").cast("long").alias("n_chars"),
        F.round(
            F.when(F.col("n_words") > 0,
                   F.col("dup_words").cast("double") / F.col("n_words"))
            .otherwise(z), 4).alias("dup_word_frac"),
        F.round(
            F.when(F.col("n_lines") > 0,
                   F.col("dup_lines").cast("double") / F.col("n_lines"))
            .otherwise(z), 4).alias("dup_line_frac"),
        F.round(
            F.when(F.col("n_chars") > 0,
                   F.col("top2_chars").cast("double") / F.col("n_chars"))
            .otherwise(z), 4).alias("top_2gram_char_frac"),
        F.round(
            F.when(F.col("n_chars") > 0,
                   F.col("top3_chars").cast("double") / F.col("n_chars"))
            .otherwise(z), 4).alias("top_3gram_char_frac"),
    )


# PII scrubbing patterns — deliberately conservative regexes that parse
# identically under Java (Spark) and RE2 (DuckDB oracle): plain character
# classes, \b word bounds, bounded quantifiers; no lookaround/backrefs.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
# Phone-like shapes only — NOT any digit/space run (the old `\+?\d[\d -]{7,}\d`
# redacted measurement tables, ISBN lists, and "1 2 3 4 5 6 7 8 9"). Four
# alternatives, leftmost-first in both Java and RE2 (verified byte-identical
# on both engines, 19-case suite incl. timestamps/ISBNs/thousand-separators):
#   1. 4-5 segments whose LAST group has 3-4 digits ("+44 20 7946 0958") —
#      the last-group constraint is what rejects date+time stamps
#      ("2026-08-17 16:30:00" would otherwise parse as lead+3 groups);
#   2. plus-led 3-segment ("+1 555 010");
#   3. hyphen-separated 3-segment ("0171-555-0123") — requiring '+' or '-'
#      here is what rejects spaced thousand-separators ("1 234 567");
#   4. plain runs of 7-15 digits ("5551234567"), \b-delimited on BOTH sides:
#      the leading \b keeps digit runs embedded in alphanumeric identifiers
#      ("A123456789") intact, and the trailing one already rejected
#      mid-identifier suffixes. Both engines agree on \b.
# Trade-offs (documented, deliberate): all-2-digit-group formats (FR
# "01 23 45 67 89") and space-separated triplets without '+' are NOT
# redacted — they are indistinguishable from numeric prose. Standalone
# digit runs LONGER than 15 (card/account numbers, not phones) now survive
# whole (no \b inside a run; they used to lose a 15-digit suffix), and a
# ≥7-digit decimal fraction still redacts after the '.' ("3.<PHONE>") —
# '.' is a word boundary and Java/RE2 have no lookbehind to see past it.
PII_PHONE_RE = (
    r"\+?\b\d{1,4}(?:[ -]\d{2,4}){2,3}[ -]\d{3,4}\b"
    r"|\+\d{1,4}(?:[ -]\d{3,4}){2}\b"
    r"|\b\d{1,4}(?:-\d{3,4}){2}\b"
    r"|\b\d{7,15}\b"
)


def scrub_pii(text_col):
    """Redact emails → ``<EMAIL>``, IPv4 addresses → ``<IP>``, phone-like
    digit runs → ``<PHONE>`` (in that order — the earlier redactions remove
    the digit material the looser phone pattern would otherwise re-match).
    Pure JVM regexp_replace chain: map-side, no UDF, no shuffle."""
    c = F.regexp_replace(text_col, PII_EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, PII_IPV4_RE, "<IP>")
    return F.regexp_replace(c, PII_PHONE_RE, "<PHONE>")


def pii_counts(text_col):
    """(n_emails, n_ips, n_phones) audit struct — the numbers a scrubbing
    pass reports alongside the redacted corpus. Only n_emails is counted on
    the raw text; n_ips and n_phones are counted on the progressively
    redacted text (after_email / after_ip), mirroring scrub_pii's
    replacement order so each count equals the number of ``<TAG>`` tokens
    that stage actually inserted. Do NOT "fix" them to count the raw text:
    the looser phone pattern would re-count email/IP digit material."""
    after_email = F.regexp_replace(text_col, PII_EMAIL_RE, "<EMAIL>")
    after_ip = F.regexp_replace(after_email, PII_IPV4_RE, "<IP>")
    return F.struct(
        F.regexp_count(text_col, F.lit(PII_EMAIL_RE)).cast("long").alias("n_emails"),
        F.regexp_count(after_email, F.lit(PII_IPV4_RE)).cast("long").alias("n_ips"),
        F.regexp_count(after_ip, F.lit(PII_PHONE_RE)).cast("long").alias("n_phones"),
    )


# sample_hash constants: multiplicative hashing over exact 64-bit-safe
# integer arithmetic — (folded_id + seed) × Knuth's constant mod a large
# prime. max product ≈ 1e9 × 2.65e9 ≈ 2.7e18 < 2^63, so the SAME expression
# evaluates identically in any engine with 64-bit integers (the DuckDB
# oracle needs no xxhash builtin). For sequential ids this is a Weyl-style
# low-discrepancy sequence: realized fractions track targets closely.
_SAMPLE_RANGE = 1_000_000_000
_SAMPLE_MOD = 1_000_000_007
_KNUTH = 2_654_435_761


def sample_hash(id_col, seed: int = 1):
    """Deterministic pseudo-uniform double in [0, 1) from an id column.

    The multiplier itself is derived from the seed (driver-side), so two
    seeds give two genuinely different multiplicative permutations of the
    id space — NOT a constant rotation. (A naive ``(id + seed) * K`` is
    affine in the seed: changing it would shift every hash by the same
    constant and different "re-mixes" would be near-identical interval
    rotations; caught by measurement, pinned by the overlap test.)"""
    mult = (_KNUTH * (2 * seed + 1)) % _SAMPLE_MOD
    folded = F.pmod(id_col.cast("long"), F.lit(_SAMPLE_RANGE))
    h = F.pmod(
        (folded + F.lit(1)) * F.lit(mult) + F.lit(seed), F.lit(_SAMPLE_MOD)
    )
    return h.cast("double") / F.lit(float(_SAMPLE_MOD))


def corpus_sample(
    df: DataFrame,
    fractions: dict,
    strata_col: str = "lang",
    id_col: str = "doc_id",
    seed: int = 1,
) -> DataFrame:
    """Deterministic stratified corpus sampling (training-mix construction):
    keep a row iff ``sample_hash(id, seed) < fractions[stratum]``; strata
    absent from ``fractions`` are dropped.

    Why not ``df.sampleBy``: its Bernoulli draw depends on partitioning and
    task retries, so a speculative re-execution or a different cluster size
    yields a DIFFERENT corpus — unacceptable for reproducible training
    mixes. Hash-threshold sampling is a pure map-side filter (no shuffle, no
    RNG state): the same (id, seed) always makes the same keep decision, a
    different ``seed`` selects a different multiplicative permutation of the
    id space (pseudo-independent re-mix — measured overlap between two
    seeds' samples ≈ the budget fraction, as an independent draw would
    give), and nested budgets compose (fractions f1 < f2 give strictly
    nested samples for the same seed).
    """
    keep = None
    for k, v in fractions.items():
        cond = F.col(strata_col) == k
        keep = F.when(cond, float(v)) if keep is None else keep.when(cond, float(v))
    keep = keep.otherwise(0.0) if keep is not None else F.lit(0.0)
    return df.where(sample_hash(F.col(id_col), seed) < keep)


def select_token_budget(
    df: DataFrame,
    budget_tokens: int,
    n_tokens_col: str,
    order_col: str,
    id_col: str = "doc_id",
    num_partitions: int = 64,
) -> DataFrame:
    """Training-mix construction's final cut: keep the highest-priority
    documents whose CUMULATIVE token count fits ``budget_tokens`` — i.e.
    the prefix of the (``order_col`` DESC, ``id_col`` ASC) global order
    where the running Σ ``n_tokens_col`` stays ≤ budget.

    The naive formulation is a global running sum — a window with a global
    ORDER BY, which Spark executes in ONE partition (the single-partition
    sort this codebase bans). This is the classic distributed prefix-sum
    instead:

      1. ``repartitionByRange`` on the priority order (total order — the id
         tiebreak means no cross-partition ties);
      2. one small job: per-range-partition token totals → driver computes
         the P exclusive prefix offsets (P numbers, not data);
      3. per-partition running sum via a window PARTITIONED by the range
         partition id (bounded partitions, never global) + the broadcast
         offset → the global cumulative value, map-side.

    The kept set is deterministic across cluster sizes, retries, and range-
    sampling randomness: range boundaries only decide WHERE the prefix sum
    is split, never its value (the order is total, so every row's global
    cumulative Σ is partition-placement-independent). Keep rule: a doc
    survives iff its own cumulative total fits entirely (Σ ≤ budget) —
    budgets compose: a smaller budget's selection is a strict prefix of a
    larger one's.

    Only a SKINNY (id, priority, tokens) projection ever shuffles (r5):
    the prefix sum needs nothing else, so range-exchanging the full rows
    — document text included — was corpus-sized shuffle volume for a
    three-column computation. The cut point the prefix sum yields is a
    single (priority, id) threshold; because keep = a prefix of a total
    order, the final selection is a map-side comparison against that
    broadcast scalar on the ORIGINAL frame — the text never moves.

    Determinism contract: the final selection re-filters ``df`` itself, so
    ``df`` must be deterministic (persisted, or free of unseeded sampling /
    nondeterministic exprs) — otherwise the rows compared against the
    threshold need not be the rows the prefix sum ran over. Same contract
    as build_docs_safe; the in-repo caller persists its input.

    Job shape (r6 — VERDICT r5 #4 trimmed the fixed overhead): ONE
    per-range-partition totals job (which also short-circuits keep-all when
    the corpus fits the budget), then ONE job that scans only the crossing
    partition p*, its last non-empty predecessor q, and the zero-total gap
    partitions between them (r7, ADVICE r6: when p*'s first row overshoots,
    the true cut row may be a ZERO-token row in a gap partition — those
    rows' cumulative sums still fit, so the old q-last-row cut silently
    excluded them; gap partitions hold no data unless zero-token docs
    exist, so the widened scan is free in the common case) through a tiny
    grouped-kernel cumsum — never a window, never a global sort, and no
    job whose task count scales with num_partitions beyond the cached scan.
    """
    import pandas as pd
    from pyspark.sql.types import StructField, StructType

    # persist BEFORE the totals job: repartitionByRange SAMPLES its
    # boundaries, so an unpersisted plan could be re-sampled differently
    # between the totals job and the final query — offsets computed for one
    # partitioning applied to another would corrupt the cumulative sums.
    # The cache pins one materialized partitioning for both consumers
    # (released via release_cache(result) after materialization).
    cols = list(dict.fromkeys([id_col, order_col, n_tokens_col]))
    d = df.select(*cols).repartitionByRange(
        num_partitions, F.col(order_col).desc(), F.col(id_col).asc()
    ).withColumn("__pid", F.spark_partition_id()).persist()
    totals = {
        int(r["__pid"]): int(r["t"] or 0)
        for r in d.groupBy("__pid").agg(
            F.sum(F.col(n_tokens_col)).alias("t")
        ).collect()
        if int(r["t"] or 0) > 0
    }
    offsets, acc = {}, 0
    for pid in sorted(totals):
        offsets[pid] = acc
        acc += totals[pid]
    if acc <= budget_tokens:
        # the whole corpus fits: every row survives, no cut job at all
        out = df
        out.cached_deps = [d]
        return out
    # the crossing partition p*: first pid whose cumulative total exceeds
    # the budget (it has rows — crossing needs t > 0). If p*'s FIRST row
    # already overshoots, the true cut row is the last row at-or-before the
    # boundary: that may be a ZERO-token row living in a zero-total range
    # partition between the nearest non-empty predecessor q and p* (such a
    # row's cumulative sum still fits, so the true prefix includes it) —
    # the cut job therefore covers q, every gap partition, and p*. Gap
    # partitions are zero-total by construction (empty unless the input
    # contains zero-token docs), so the extra scan touches no data in the
    # common case.
    p_star = next(p for p in sorted(totals) if offsets[p] + totals[p] > budget_tokens)
    q = max((p for p in totals if p < p_star), default=None)
    gap_lo = 0 if q is None else q + 1
    scan_pids = ([] if q is None else [q]) + list(range(gap_lo, p_star + 1))
    off = {p: offsets[p_star] for p in range(gap_lo, p_star)}
    off[p_star] = offsets[p_star]
    if q is not None:
        off[q] = offsets[q]

    schema = StructType([
        StructField("__pid", d.schema["__pid"].dataType),
        d.schema[order_col],
        d.schema[id_col],
    ])

    def _cut(pdf: pd.DataFrame) -> pd.DataFrame:
        # per range partition: last globally-surviving row in the
        # (order DESC, id ASC) total order, or no row. Exact int cumsum;
        # survivors form a PREFIX (tokens ≥ 0 ⇒ cum nondecreasing).
        pid = int(pdf["__pid"].iloc[0])
        pdf = pdf.sort_values([order_col, id_col], ascending=[False, True])
        # int64 explicitly: an int32 tokens column would cumsum in int32
        # and overflow at corpus scale
        cum = pdf[n_tokens_col].to_numpy(dtype="int64").cumsum() + off[pid]
        keep = cum <= budget_tokens
        if not keep.any():
            return pd.DataFrame(columns=["__pid", order_col, id_col])
        i = int(keep.nonzero()[0][-1])
        return pd.DataFrame(
            {"__pid": [pid],
             order_col: [pdf[order_col].iloc[i]],
             id_col: [pdf[id_col].iloc[i]]}
        )

    cand = (
        d.where(F.col("__pid").isin(scan_pids))
        .groupBy("__pid")
        .applyInPandas(_cut, schema)
        .collect()
    )
    # q's last row always survives (offsets[p*] ≤ budget by construction),
    # so pick p*'s survivor when present, else q's; neither ⇒ empty keep.
    row = None
    for r in cand:
        if row is None or int(r["__pid"]) > int(row["__pid"]):
            row = r
    if row is None:
        keep = F.lit(False)
    else:
        cut_order, cut_id = row[order_col], row[id_col]
        keep = (F.col(order_col) > cut_order) | (
            (F.col(order_col) == cut_order) & (F.col(id_col) <= cut_id)
        )
    out = df.where(keep)
    out.cached_deps = [d]
    return out


def contamination_hits(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
) -> DataFrame:
    """Benchmark decontamination screen: for every document, how many of its
    DISTINCT word n-grams also appear in the benchmark table → (id, n_hits,
    contaminated). Documents with n_hits > 0 are the candidates a training
    pipeline drops or audits before training.

    Scale shape: both sides reduce to distinct shingles (per-doc distinct on
    the corpus side — word_shingles — and a global distinct on the benchmark
    side, which is tiny by nature: eval sets are thousands of rows, not
    billions), then ONE equi-join on the shingle key that AQE broadcasts,
    a partial-agg count per doc, and a left join back to keep zero-hit docs.
    Never a cross join; no collect of corpus data.
    """
    d_sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("s"),
    )
    b_sh = (
        benchmark.select(F.explode(word_shingles(F.col(text_col), n)).alias("s"))
        .distinct()
    )
    hits = d_sh.join(b_sh, "s").groupBy("id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(hits, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )


def contamination_attribution(
    docs: DataFrame,
    benchmark: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    bench_id_col: str = "bench_id",
    n: int = 3,
) -> DataFrame:
    """Decontamination with PROVENANCE: per document, the total distinct
    shared n-grams (as in ``contamination_hits``) plus WHICH benchmark item
    matched most — the audit column a real decontamination report needs
    ("doc X dropped because it overlaps eval item Y on k n-grams").

    Returns (id, n_hits, contaminated, top_bench_id, top_bench_hits);
    zero-hit documents keep NULL/0 attribution. Ties break deterministically
    on (shared-count DESC, bench_id ASC). Scale shape unchanged from the
    screen: the benchmark side is per-item-distinct shingles — still tiny,
    still broadcast by AQE; one equi-join produces (doc, bench_id, shingle),
    then two partial-aggregations (per (doc, bench) count, then per-doc
    max_by + distinct-shingle total) and a left join back.
    """
    d_sh = docs.select(
        F.col(id_col).alias("id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("s"),
    )
    b_sh = benchmark.select(
        F.col(bench_id_col).alias("bid"),
        F.explode(word_shingles(F.col(text_col), n)).alias("s"),
    ).distinct()
    joined = d_sh.join(b_sh, "s")
    per_bench = joined.groupBy("id", "bid").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    attrib = per_bench.groupBy("id").agg(
        F.max_by("bid", F.struct(F.col("cnt"), (-F.col("bid")).alias("nb")))
        .alias("top_bench_id"),
        F.max("cnt").alias("top_bench_hits"),
    )
    totals = joined.select("id", "s").distinct().groupBy("id").agg(
        F.count(F.lit(1)).alias("n_hits")
    )
    return (
        docs.select(F.col(id_col).alias("id"))
        .join(totals, "id", "left")
        .join(attrib, "id", "left")
        .select(
            F.col("id").alias(id_col),
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
            F.col("top_bench_id").cast("long").alias("top_bench_id"),
            F.coalesce(F.col("top_bench_hits"), F.lit(0)).cast("long")
            .alias("top_bench_hits"),
        )
    )
