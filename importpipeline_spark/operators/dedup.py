"""Deduplication suite for large-scale training-data pipelines.

Five strategies, all shuffle-conscious:

- exact:        hash-groupBy on a content digest (one shuffle, partial agg)
- ngram_jaccard: word-shingle inverted-index self-join (never a cross join:
                 pairs are generated only for docs sharing a shingle, the
                 standard "candidate-pair by posting" trick)
- minhash_lsh:  shingle → 64-bit hashes → k min-hash signature → banded LSH
                 buckets → candidate pairs verified with exact Jaccard
- simhash:      64-bit simhash of token hashes; near-dup = hamming ≤ r
- embedding:    cosine near-dup over a vector column (LSH-bucketed via
                 random hyperplanes; see similarity.py for the ANN variant)

All hashes are Spark built-ins (xxhash64, JVM-side) — no Python in the
candidate-generation hot path; verification joins are equi-joins Catalyst can
plan (broadcast or sort-merge + AQE skew handling).
"""

from __future__ import annotations

import logging
from dataclasses import dataclass
from typing import List, Optional, Tuple

from pyspark.sql import DataFrame, functions as F

logger = logging.getLogger(__name__)

# Default per-bucket size bound for the LSH-family candidate joins. A
# degenerate bucket (boilerplate pages, zero vectors, stop-shingles) makes the
# within-bucket self-join O(n²) in ONE task; members of buckets above the
# bound are excluded from candidate generation (the standard hot-bucket /
# stop-shingle cut). 10k members → ≤ 50M candidate rows per bucket worst
# case, which a single executor can still verify; pass None to uncap.
DEFAULT_MAX_BUCKET = 10_000

# hot buckets are pathological by definition — when more than this many exist
# we stop collecting their keys driver-side and fall back to a distributed
# semi-join on the OK buckets instead
_MAX_COLLECTED_HOT = 10_000


@dataclass(frozen=True)
class CapReport:
    """What a bucket-size cap actually cut — always computed, never silent.

    ``dropped_buckets``/``dropped_rows`` are exact counts of the buckets
    above the bound and their member rows (a member excluded from candidate
    generation can still pair through its other bands/tables)."""

    bucket_cols: Tuple[str, ...]
    max_bucket_size: Optional[int]
    dropped_buckets: int
    dropped_rows: int


def release_checkpoint(df: DataFrame) -> None:
    """Deterministically free the storage blocks of a localCheckpoint'd
    frame. ``unpersist()`` is a no-op for checkpointed frames (their blocks
    live outside the CacheManager); without this they linger until a driver
    GC lets the ContextCleaner run, accumulating executor storage across
    repeated pipeline runs in shared bench/pytest sessions. Only safe after
    the frame's consumers are fully materialized: a checkpoint has no
    lineage, so a post-release recompute FAILS rather than recomputes.
    No-op for non-checkpointed frames."""
    try:
        lp = df._jdf.queryExecution().logical()
        if lp.getClass().getSimpleName() == "LogicalRDD":
            lp.rdd().unpersist(False)
    except Exception:
        pass  # best-effort: never poison a cleanup path


def release_cache(df: DataFrame) -> None:
    """Release the resources a dedup/similarity operator pinned while
    building ``df``: unpersist frames attached as ``df.cached_deps``
    (including the blocks of localCheckpoint'd deps, e.g. the CC labels)
    and destroy broadcasts attached as ``df.broadcast_deps`` (e.g.
    ivf_build's centroid matrix). Call after the result is materialized
    (collect/write) in long-lived sessions — once released, the returned
    plan must not re-execute (checkpointed deps cannot recompute)."""
    for dep in getattr(df, "cached_deps", []):
        dep.unpersist()
        release_checkpoint(dep)
    for bc in getattr(df, "broadcast_deps", []):
        bc.destroy()


def _cap_buckets(
    rows: DataFrame,
    bucket_cols: List[str],
    max_bucket_size: Optional[int],
    log_dropped: bool = True,
    label: str = "bucket",
) -> Tuple[DataFrame, CapReport]:
    """Drop all members of buckets larger than max_bucket_size.

    Returns ``(filtered_rows, CapReport)``. The hot-bucket detection runs
    EAGERLY (one partial-agg groupBy job over ``rows`` — callers persist the
    expensive upstream first, so this job also primes that cache for the
    candidate join that follows). Eagerness buys two things at scale:

    - the common case (no bucket above the bound) leaves the candidate plan
      completely untouched — no size aggregation or semi-join shuffle inside
      the main query at all;
    - when hot buckets exist they are few by nature, so the cut becomes a
      BROADCAST anti-join on the collected hot keys instead of a shuffled
      semi-join against every ok bucket — and the drop counts are known and
      logged by default (no silent caps), with no recompute.

    Only past ``_MAX_COLLECTED_HOT`` hot buckets (adversarial input) does it
    fall back to the distributed ok-bucket semi-join.
    """
    if max_bucket_size is None:
        return rows, CapReport(tuple(bucket_cols), None, 0, 0)
    # NULL bucket keys can never produce a candidate pair (the downstream
    # self-joins are null-rejecting equi-joins), but the two cut branches
    # used to disagree on them (anti-join keeps NULLs, semi-join drops
    # them). Filter them up front so both branches — and the size
    # aggregation — see the same rows. Unreachable for today's hash-valued
    # keys; kept cheap (map-side IsNotNull) and consistent by construction.
    for c in bucket_cols:
        rows = rows.where(F.col(c).isNotNull())
    sizes = rows.groupBy(*bucket_cols).agg(F.count(F.lit(1)).alias("__bsz"))
    hot = sizes.where(F.col("__bsz") > max_bucket_size)
    hot_rows = hot.limit(_MAX_COLLECTED_HOT + 1).collect()
    if not hot_rows:
        return rows, CapReport(tuple(bucket_cols), max_bucket_size, 0, 0)
    if len(hot_rows) <= _MAX_COLLECTED_HOT:
        n_buckets = len(hot_rows)
        n_rows = sum(int(r["__bsz"]) for r in hot_rows)
        hot_df = rows.sparkSession.createDataFrame(
            [tuple(r[c] for c in bucket_cols) for r in hot_rows],
            rows.select(*bucket_cols).schema,
        )
        out = rows.join(F.broadcast(hot_df), bucket_cols, "left_anti")
    else:
        agg = hot.agg(
            F.count(F.lit(1)).alias("b"), F.sum("__bsz").alias("r")
        ).first()
        n_buckets, n_rows = int(agg.b), int(agg.r)
        ok = sizes.where(F.col("__bsz") <= max_bucket_size).select(*bucket_cols)
        out = rows.join(ok, bucket_cols, "left_semi")
    if log_dropped:
        logger.warning(
            "candidate generation dropped %d %s(s) larger than %d members "
            "(%d member rows); near-dups whose only shared %s was cut will "
            "not be emitted", n_buckets, label, max_bucket_size, n_rows, label,
        )
    return out, CapReport(
        tuple(bucket_cols), max_bucket_size, n_buckets, n_rows
    )


def exact_dup_groups(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact duplicate groups: md5 digest → groups with >1 member."""
    return (
        df.select(F.md5(F.col(text_col)).alias("digest"), F.col(id_col))
        .groupBy("digest")
        .agg(F.count(F.lit(1)).alias("n"), F.min(id_col).alias("keep_id"))
        .where(F.col("n") > 1)
    )


def dedup_exact(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep the smallest id per exact-content group (deterministic winner)."""
    w = (
        df.select(F.col(id_col), F.md5(F.col(text_col)).alias("digest"))
        .groupBy("digest")
        .agg(F.min(id_col).alias(id_col))
    )
    return df.join(w, id_col, "leftsemi")


def word_tokens(text_col):
    """The dedup-family tokenization: split on ``\\s+`` after trim. The ONE
    definition every shingle-position consumer shares — mining and stripping
    must agree on token positions byte-for-byte."""
    return F.split(F.trim(text_col), r"\s+")


def bind_once(expr, f):
    """Evaluate ``expr`` ONCE per row and hand it to ``f`` as an O(1) lambda
    variable — a ``transform`` over a one-element wrapper array.

    Why this exists: Catalyst evaluates a higher-order function's lambda body
    per element, and any non-trivial subexpression referenced inside the
    lambda is RE-EVALUATED on every invocation (there is no cross-invocation
    CSE). ``transform(seq, i -> slice(split(text), …))`` therefore re-splits
    the whole document once per output element — O(L²) per row, measured at
    21 s for a single 12k-token document. Binding the split result as a
    lambda variable makes each access a variable read: 120k tokens in ~1 s.
    """
    return F.get(F.transform(F.array(expr), f), 0)


def grams_of_tokens(toks_col, n: int = 3):
    """All word n-grams of an ALREADY-MATERIALIZED token-array column (a
    projected column or a bound lambda variable — never an unbound
    split(...) expression; see bind_once)."""
    k = F.size(toks_col) - (n - 1)
    return F.when(
        k > 0,
        F.transform(
            F.sequence(F.lit(0), k - 1),
            lambda i: F.array_join(F.slice(toks_col, i + 1, n), " "),
        ),
    ).otherwise(F.array())


def word_grams(text_col, n: int = 3):
    """All word n-grams in order WITH multiplicity (position i holds the
    gram starting at token i) — the positional base word_shingles and
    strip_boilerplate both build on. Linear in document length: the token
    array is bound once per row (bind_once), not re-split per gram."""
    return bind_once(word_tokens(text_col), lambda ts: grams_of_tokens(ts, n))


def word_shingles(text_col, n: int = 3):
    """Word n-gram shingles of a whitespace-tokenized text column (distinct)."""
    return F.array_distinct(word_grams(text_col, n))


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: Optional[int] = DEFAULT_MAX_BUCKET,
    log_dropped: bool = True,
) -> DataFrame:
    """Candidate pairs by shared shingle (inverted-index join), exact Jaccard.

    |A∩B| comes from counting shared shingles; |A∪B| = |A|+|B|−|A∩B|.
    Returns (id_a, id_b, jaccard) with id_a < id_b, jaccard ≥ threshold.

    ``max_shingle_df`` is the hot-shingle cut (the inverted-index analogue of
    the LSH family's bucket cap): a shingle present in d documents would
    contribute O(d²) pair rows to ONE join task, so shingles above the
    document-frequency bound are excluded from candidate generation (the
    standard stop-shingle cut; see _cap_buckets for the plan shape and the
    always-on drop accounting). Error is one-sided and bounded: a cut
    shingle contributes no intersection evidence while |A| and |B| keep
    their full sizes, so reported jaccard can only UNDER-estimate — pairs
    may be missed (they must share an above-bound shingle to be affected),
    never falsely emitted. ``None`` uncaps (exact result, skew-exposed).
    The result carries ``cap_reports`` with the exact cut counts.

    The join/count key is ``xxhash64(shingle)``, not the shingle string
    (r5): intersection counting needs only identity, and the self-join
    shuffles the exploded relation on both sides — hashing cuts that
    volume 2-3× (8 B vs a ~20 B trigram). A cross-document collision adds
    one phantom shared shingle: jaccard inflation ≤ 1/|union| (far below
    any real threshold, and a spurious pair would score 1/(na+nb−1) —
    never ≥ 0.5), probability ~(distinct shingles)²/2⁶⁴ per corpus.
    """
    sh = df.select(
        F.col(id_col).alias("id"), word_shingles(F.col(text_col), n).alias("sh")
    ).withColumn("n_sh", F.size("sh"))
    ex = sh.select(
        "id", "n_sh",
        F.explode(F.transform("sh", lambda s: F.xxhash64(s))).alias("s"),
    )
    cached = []
    if max_shingle_df is not None:
        # the eager hot-shingle detection plus both self-join sides would
        # otherwise each recompute the corpus-wide shingling — persist it
        # (released via release_cache, like the LSH callers' signatures)
        ex = ex.persist()
        cached.append(ex)
    ex, cap_report = _cap_buckets(
        ex, ["s"], max_shingle_df, log_dropped, label="shingle"
    )
    a = ex.alias("a")
    b = ex.alias("b")
    inter = (
        a.join(b, (F.col("a.s") == F.col("b.s")) & (F.col("a.id") < F.col("b.id")))
        .groupBy(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.n_sh").alias("na"),
            F.col("b.n_sh").alias("nb"),
        )
        .agg(F.count(F.lit(1)).alias("common"))
    )
    out = inter.select(
        "id_a",
        "id_b",
        (
            F.col("common").cast("double")
            / (F.col("na") + F.col("nb") - F.col("common")).cast("double")
        ).alias("jaccard"),
    ).where(F.col("jaccard") >= threshold)
    out.cap_reports = [cap_report]
    out.cached_deps = cached
    return out


def minhash_signature(df: DataFrame, text_col: str, id_col: str,
                      n: int = 3, num_hashes: int = 64) -> DataFrame:
    """MinHash signature: per permutation i, min over shingles of
    xxhash64(shingle, seed=i). Returns (id, sig array<long>)."""
    sh = df.select(
        F.col(id_col).alias("id"), F.explode(word_shingles(F.col(text_col), n)).alias("s")
    )
    mins = [
        F.min(F.xxhash64(F.col("s"), F.lit(i))).alias(f"h{i}")
        for i in range(num_hashes)
    ]
    agg = sh.groupBy("id").agg(*mins)
    return agg.select("id", F.array(*[f"h{i}" for i in range(num_hashes)]).alias("sig"))


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    num_hashes: int = 64,
    bands: int = 16,
    threshold: float = 0.5,
    max_bucket_size: Optional[int] = DEFAULT_MAX_BUCKET,
    log_dropped: bool = True,
) -> DataFrame:
    """LSH: split signature into bands; docs sharing any band bucket are
    candidates; candidates verified with exact shingle Jaccard.

    Scale path: candidate generation is a groupBy on (band, band-hash) — the
    only wide op; buckets above max_bucket_size are cut (see _cap_buckets)
    so one boilerplate bucket cannot go quadratic; verification touches
    candidate pairs only. The result carries ``cap_reports`` (exact drop
    counts) and ``cached_deps`` (release with release_cache after
    materializing).
    """
    rows_per_band = num_hashes // bands
    sig = minhash_signature(df, text_col, id_col, n, num_hashes).persist()
    band_rows = sig.select(
        "id",
        F.posexplode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda bi: F.xxhash64(
                    F.array_join(
                        F.transform(
                            F.slice(F.col("sig"), bi * rows_per_band + 1, rows_per_band),
                            lambda x: x.cast("string"),
                        ),
                        ",",
                    )
                ),
            )
        ).alias("band", "bucket"),
    )
    band_rows, cap_report = _cap_buckets(
        band_rows, ["band", "bucket"], max_bucket_size, log_dropped
    )
    a = band_rows.alias("a")
    b = band_rows.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"))
        .distinct()
    )
    # verify candidates with exact Jaccard on shingle sets. The shingle
    # relation feeds BOTH join sides (id_a and id_b): persist it so the
    # corpus is shingled once, not once per side — at 100 TB the two scans
    # are the cost, not the few-candidate join. Released with the signature
    # cache via release_cache(result). The cached sets hold xxhash64(sh),
    # not the strings (r5): set intersection needs only identity, hashes
    # shrink the cache 2-3× and make the intersect integer compares; a
    # collision perturbs one set size by 1 (jaccard shift ≤ 1/|union|,
    # probability ~(distinct shingles)²/2⁶⁴ per corpus).
    sh = df.select(
        F.col(id_col).alias("id"),
        F.transform(
            word_shingles(F.col(text_col), n), lambda s: F.xxhash64(s)
        ).alias("sh"),
    ).persist()
    verified = (
        cands.join(sh.withColumnRenamed("id", "id_a").withColumnRenamed("sh", "sh_a"), "id_a")
        .join(sh.withColumnRenamed("id", "id_b").withColumnRenamed("sh", "sh_b"), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
            / F.size(F.array_union("sh_a", "sh_b")).cast("double"),
        )
        .select("id_a", "id_b", "jaccard")
        .where(F.col("jaccard") >= threshold)
    )
    verified.cap_reports = [cap_report]
    verified.cached_deps = [sig, sh]
    return verified


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """64-bit SimHash over whitespace tokens (JVM-side bit arithmetic).

    For each bit position b: sign = Σ_tokens (bit_b(xxhash64(token)) ? +1 : −1);
    simhash bit b = sign > 0.
    """
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("t")
    ).withColumn("h", F.xxhash64("t"))
    bit_sums = toks.groupBy("id").agg(
        *[
            F.sum(
                F.when(F.shiftright(F.col("h"), b).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"b{b}")
            for b in range(64)
        ]
    )
    sim = F.lit(0).cast("long")
    for b in range(64):
        sim = sim.bitwiseOR(
            F.when(F.col(f"b{b}") > 0, F.lit(1).cast("long")).otherwise(F.lit(0).cast("long"))
            * F.lit(1 << b).cast("long")
            if b < 63
            else F.when(F.col(f"b{b}") > 0, F.lit(-(1 << 63)).cast("long")).otherwise(F.lit(0).cast("long"))
        )
    return bit_sums.select("id", sim.alias("simhash"))


def simhash_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 8,
    n_bands: int = 4,
    max_bucket_size: Optional[int] = DEFAULT_MAX_BUCKET,
    log_dropped: bool = True,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Candidate generation: pigeonhole band blocking over ``n_bands`` equal
    bit-slices of the 64-bit code — two codes within hamming ≤ n_bands−1
    are GUARANTEED to share at least one exact band (some band holds none of
    the flipped bits); for larger radii recall is heuristic. Pick
    n_bands > max_hamming for deterministic recall (narrower bands = bigger
    buckets = more candidates — the standard precision/recall dial).
    """
    if 64 % n_bands:
        raise ValueError("n_bands must divide 64")
    width = 64 // n_bands
    band_mask = (1 << width) - 1
    sh = simhash(df, text_col, id_col)
    bands = sh.select(
        "id",
        "simhash",
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned(F.col("simhash"), b * width).bitwiseAND(
                        F.lit(band_mask)
                    )
                    for b in range(n_bands)
                ]
            )
        ).alias("band", "bucket"),
    )
    # persist: the 64-bit-sum simhash aggregation above is the expensive
    # part, and it feeds the size agg, the semi-join, and BOTH self-join
    # sides — without the cache each consumer recomputes it
    bands = bands.persist()
    capped, cap_report = _cap_buckets(
        bands, ["band", "bucket"], max_bucket_size, log_dropped
    )
    a, b = capped.alias("a"), capped.alias("b")
    cands = (
        a.join(
            b,
            (F.col("a.band") == F.col("b.band"))
            & (F.col("a.bucket") == F.col("b.bucket"))
            & (F.col("a.id") < F.col("b.id")),
        )
        .select(
            F.col("a.id").alias("id_a"),
            F.col("b.id").alias("id_b"),
            F.col("a.simhash").alias("sh_a"),
            F.col("b.simhash").alias("sh_b"),
        )
        .distinct()
    )
    out = cands.withColumn(
        "hamming", F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    ).where(F.col("hamming") <= max_hamming).select("id_a", "id_b", "hamming")
    out.cap_reports = [cap_report]
    out.cached_deps = [bands]
    return out


def neardup_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
) -> DataFrame:
    """Connected components over near-dup pairs → (id, component_id) with
    component_id = the smallest member id. This is the step between pair
    generation (ngram_jaccard/minhash/simhash/embedding_neardup) and the
    actual KEEP decision: a near-dup relation is rarely transitive-closed,
    so dropping "the larger id of each pair" both over- and under-deletes —
    the canonical survivor must be chosen per component.

    Algorithm: min-label propagation (the standard large-graph CC shape —
    e.g. Kiveris et al.'s hash-to-min family): every node starts labeled
    with itself; each round takes the min of its own and its neighbors'
    labels; fixpoint after ≤ diameter rounds (near-dup components are
    shallow — mostly pairs/stars — so a handful of rounds suffices at any
    corpus size). Each round is one join + one partial-agg groupBy on the
    node key; the per-round fixpoint check is a count on the frame the next
    round needs anyway (same driver-loop shape as the IVF Lloyd rounds).
    Raises if max_iter rounds don't converge (pathological chain longer
    than max_iter).

    LOGICAL-plan truncation is load-bearing, not hygiene: ``persist()``
    caches the physical result but Catalyst still re-analyzes the full
    LOGICAL lineage every round, and each round references the previous
    labels TWICE (the propagation join and the fixpoint check), so plan
    size grows ~2^rounds × the size of ``pairs``' own lineage. Fed by a
    real pair generator (minhash → cap → verification joins over an
    extracted corpus) the optimizer livelocked for MINUTES of driver CPU
    on a 6-pair input before any job was submitted (caught by jstack:
    dag-scheduler idle, one runnable thread burning 150 s of CPU in
    analysis). EAGER ``localCheckpoint`` at the loop boundary (cutting the
    pair-generation lineage out of every round) and per round (cutting
    round t out of round t+1) makes every round's analyzed plan O(1); the
    materialization it forces is work the fixpoint count was about to do
    anyway.
    """
    edges = pairs.select(F.col(id_a).alias("a"), F.col(id_b).alias("b"))
    # no .distinct(): the per-round F.min aggregation is insensitive to
    # duplicate edges, so deduplicating would be a wasted full shuffle of
    # the largest relation
    edges = edges.unionByName(
        edges.select(F.col("b").alias("a"), F.col("a").alias("b"))
    ).localCheckpoint()
    labels = (
        edges.select(F.col("a").alias("id")).distinct()
        .withColumn("label", F.col("id"))
        .localCheckpoint()
    )
    for it in range(max_iter):
        nb_min = (
            edges.join(labels, edges["a"] == labels["id"])
            .groupBy(F.col("b").alias("nid"))
            .agg(F.min("label").alias("nb_min"))
        )
        new_labels = (
            labels.join(nb_min, labels["id"] == nb_min["nid"], "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce("nb_min", F.col("label"))
                ).alias("label"),
            )
        ).localCheckpoint()
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .where(F.col("n.label") != F.col("o.label"))
            .count()
        )
        labels.unpersist()
        labels = new_labels
        if changed == 0:
            break
    else:
        edges.unpersist()  # don't leak caches on the failure path
        labels.unpersist()
        raise RuntimeError(
            f"neardup_components did not converge in {max_iter} rounds"
        )
    edges.unpersist()
    out = labels.select(F.col("id"), F.col("label").alias("component_id"))
    # NOTE on reclamation: unpersist() is a no-op for localCheckpoint'd
    # frames (their blocks live outside the CacheManager); each round's
    # superseded checkpoint is reclaimed by Spark's ContextCleaner once the
    # Python reference drops (promptly — refcounted py4j handles), so at
    # most two checkpoints (edges + current labels) are live at any time.
    # cached_deps still carries the final labels so release_cache keeps its
    # uniform contract; dropping the result reference is what frees it.
    out.cached_deps = [labels]
    return out


def neardup_survivors(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Near-dup KEEP decision: drop every component member except the
    smallest id (deterministic winner, mirroring dedup_exact). Documents in
    no pair survive untouched — one broadcast-friendly anti-join against
    the non-canonical members."""
    comps = neardup_components(pairs, id_a, id_b)
    losers = comps.where(F.col("id") != F.col("component_id")).select(
        F.col("id").alias(id_col)
    )
    out = df.join(losers, id_col, "left_anti")
    # forward the components' persisted labels so release_cache(result)
    # can free them after materialization (CLAUDE.md rule 8)
    out.cached_deps = getattr(comps, "cached_deps", [])
    return out


def boilerplate_ngrams(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    min_df: int = 2,
) -> DataFrame:
    """Cross-document repeated-span mining (boilerplate detection): word
    n-grams appearing in ≥ ``min_df`` distinct documents, with their document
    frequency — the spans a pretraining pipeline strips because they are
    template/boilerplate rather than content.

    Scale shape (r5): the classic two-pass heavy-hitter design. Each
    document contributes a shingle at most once (word_shingles is per-doc
    distinct), so a plain count after explode IS document frequency — but a
    one-pass ``groupBy(ngram)`` shuffles every tail gram's STRING once
    (map-side combine only compresses repeats within a partition, and df=1
    grams — the vast majority — have none): ~3× corpus volume of string
    shuffle at 100 TB, the same unit-string mistake repetition_signals
    fixed this round. Instead:

    - Pass 1 counts df on a 128-bit composite hash (two independent
      xxhash64 seeds): the count shuffle carries 16 bytes per distinct
      gram per partition, never the text. 128 bits, not 64, because this
      key is CORPUS-scoped (unlike repetition_signals' per-doc scope):
      at ~10^13 distinct grams a 64-bit key expects millions of
      collisions, a 128-bit one ~1e-13.
    - Pass 2 re-derives the grams map-side (stateless recompute of the
      explode — CPU over the cached/columnar text, no shuffle) and joins
      the survivors back to recover their strings. The join is left
      unhinted: a real mined set is thousands of spans, so AQE broadcasts
      it and the corpus side never shuffles; in the pathological
      everything-is-duplicated + min_df=2 case AQE falls back to a
      shuffle join, which is no worse than the one-pass string groupBy.
      The final per-string agg's map-side combine emits at most
      |survivors| rows per partition.

    Returns (ngram, df); output is identical to the one-pass formulation
    (the DuckDB contract oracle still groups by the raw string).
    """
    grams = df.select(
        F.explode(word_shingles(F.col(text_col), n)).alias("ngram")
    )
    h = [F.xxhash64("ngram").alias("h1"),
         F.xxhash64("ngram", F.lit(1)).alias("h2")]
    surviving = (
        grams.select(*h)
        .groupBy("h1", "h2")
        .agg(F.count(F.lit(1)).alias("df"))
        .where(F.col("df") >= min_df)
    )
    return (
        grams.select("ngram", *h)
        .join(surviving, ["h1", "h2"])
        .groupBy("ngram")
        .agg(F.max("df").alias("df"))
    )


def strip_boilerplate(
    df: DataFrame,
    mined: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    ngram_col: str = "ngram",
) -> DataFrame:
    """Remove mined boilerplate spans from documents — the pipeline step
    between ``boilerplate_ngrams`` (which only FINDS the spans) and dedup:
    a token is dropped iff it is covered by at least one occurrence of a
    mined word n-gram; surviving tokens are re-joined with single spaces.

    Position-coverage semantics (rather than greedy scan-and-replace) are
    deliberately order-independent: overlapping occurrences union their
    covered positions, so the result is deterministic, partitioning-proof,
    and exactly reproducible in SQL (the DuckDB oracle re-derives the same
    covered-position set). Tokenization matches word_shingles (split on
    ``\\s+`` after trim) so mining and stripping agree on positions.

    Scale shape: one posexplode of the documents' n-gram occurrences, ONE
    equi-join against the mined relation (broadcast when small — a real
    boilerplate list is thousands of spans, not billions), one partial-agg
    groupBy(doc) collecting covered starts, and one join back. The per-doc
    token filter is ``array_except(sequence(0, L-1), covered)``: Spark's
    ArrayExcept hashes the covered array once and scans the index sequence,
    so the cost is O(tokens + covered positions) per document — linear even
    for a long page that is mostly boilerplate (a per-token
    ``array_contains(covered, i)`` would be O(tokens × covered), quadratic
    on exactly the adversarial pages the stripper exists for; pinned by
    tests/test_dedup.py::test_strip_boilerplate_mostly_covered_long_doc).
    Documents with no boilerplate hit pass through the left join
    untouched. Returns ``df``'s id + stripped ``text_col`` +
    ``n_removed`` (token drop count for drop accounting — never silent).
    """
    toks = word_tokens(F.col(text_col))
    occ = df.select(
        F.col(id_col).alias("id"),
        F.posexplode(word_grams(F.col(text_col), n)).alias("s", "g"),
    )
    hits = occ.join(
        mined.select(F.col(ngram_col).alias("g")).distinct(), "g"
    ).groupBy("id").agg(F.collect_set("s").alias("starts"))
    base = df.select(F.col(id_col).alias("id"), toks.alias("ts"))
    joined = base.join(hits, "id", "left")
    covered = F.coalesce(
        F.array_distinct(
            F.flatten(
                F.transform(
                    F.col("starts"), lambda s: F.sequence(s, s + (n - 1))
                )
            )
        ),
        F.array().cast("array<integer>"),
    )
    # all indices 0..L-1, guarded: sequence(0, -1) would DESCEND, not be empty
    all_idx = F.when(
        F.size("ts") > 0, F.sequence(F.lit(0), F.size("ts") - 1)
    ).otherwise(F.array().cast("array<integer>"))
    keep_idx = F.array_except(all_idx, covered)  # hash-set probe, order-kept
    kept = F.transform(keep_idx, lambda i: F.element_at(F.col("ts"), i + 1))
    return joined.select(
        F.col("id").alias(id_col),
        F.array_join(kept, " ").alias(text_col),
        (F.size("ts") - F.size(kept)).cast("long").alias("n_removed"),
    )
