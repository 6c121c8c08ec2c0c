"""Dedup + similarity suites: exactness of the SQL-expressible paths and
recall of the LSH paths vs exact baselines."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from importpipeline_spark.operators.dedup import (
    dedup_exact,
    exact_dup_groups,
    minhash_lsh_pairs,
    ngram_jaccard_pairs,
    simhash_pairs,
)
from importpipeline_spark.operators.similarity import (
    cosine_topk_bruteforce,
    cosine_topk_lsh,
    embedding_neardup_pairs,
)
from importpipeline_spark.text.analysis import lang_id_scores, quality_features


@pytest.fixture(scope="module")
def corpus(spark):
    rng = np.random.default_rng(11)
    vocab = [f"w{i}" for i in range(300)]
    rows = []
    for i in range(80):
        words = [vocab[j] for j in rng.integers(0, 300, size=30)]
        rows.append((i, " ".join(words)))
    # near dups: ids 1000+i share all but one token with doc i (i<10)
    for i in range(10):
        words = rows[i][1].split()
        words[5] = "CHANGED"
        rows.append((1000 + i, " ".join(words)))
    # exact dups of docs 20..24
    for i in range(20, 25):
        rows.append((2000 + i, rows[i][1]))
    return spark.createDataFrame(rows, "doc_id long, text string")


def _exact_jaccard_pairs(df, threshold):
    # the EXACT reference set: cap explicitly off
    got = ngram_jaccard_pairs(
        df, "text", "doc_id", n=3, threshold=threshold, max_shingle_df=None
    )
    return {(r.id_a, r.id_b): r.jaccard for r in got.collect()}


def test_exact_dedup(corpus):
    groups = exact_dup_groups(corpus, "text", "doc_id").collect()
    assert len(groups) == 5
    assert all(g.n == 2 for g in groups)
    keep = dedup_exact(corpus, "text", "doc_id")
    assert keep.count() == corpus.count() - 5
    # deterministic winner: smallest doc_id survives
    kept_ids = {r.doc_id for r in keep.select("doc_id").collect()}
    for i in range(20, 25):
        assert i in kept_ids and (2000 + i) not in kept_ids


def test_ngram_jaccard_finds_neardups(corpus):
    pairs = _exact_jaccard_pairs(corpus, 0.5)
    for i in range(10):
        assert (i, 1000 + i) in pairs, f"missing near-dup pair {i}"
        assert 0.5 <= pairs[(i, 1000 + i)] < 1.0
    for i in range(20, 25):
        assert pairs[(i, 2000 + i)] == 1.0


def test_minhash_lsh_recall(corpus):
    exact = set(_exact_jaccard_pairs(corpus, 0.5))
    got = minhash_lsh_pairs(
        corpus, "text", "doc_id", n=3, num_hashes=64, bands=16, threshold=0.5
    )
    found = {(r.id_a, r.id_b) for r in got.collect()}
    # verification step makes precision exact; recall should be high
    assert found <= exact
    recall = len(found & exact) / len(exact)
    assert recall >= 0.9, f"recall {recall}"


def test_simhash_neardups(corpus):
    got = simhash_pairs(corpus, "text", "doc_id", max_hamming=12)
    found = {(r.id_a, r.id_b) for r in got.collect()}
    exact_dups = {(i, 2000 + i) for i in range(20, 25)}
    # exact dups have hamming 0 → must all be found
    assert exact_dups <= found


@pytest.fixture(scope="module")
def skewed_corpus(spark):
    """Adversarial skew: 300 byte-identical boilerplate docs (one degenerate
    LSH bucket in every band) + 50 normal docs."""
    rows = [(i, "spark shuffle partition skew boilerplate page text " * 4)
            for i in range(300)]
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(500)]
    for i in range(50):
        words = [vocab[j] for j in rng.integers(0, 500, size=30)]
        rows.append((1000 + i, " ".join(words)))
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_minhash_bucket_cap_bounds_candidates(skewed_corpus, caplog):
    import logging

    with caplog.at_level(logging.WARNING,
                         logger="importpipeline_spark.operators.dedup"):
        got = minhash_lsh_pairs(
            skewed_corpus, max_bucket_size=50, log_dropped=True
        )
        hot = got.where((F.col("id_a") < 300) & (F.col("id_b") < 300)).count()
    # the degenerate bucket is cut: zero quadratic pair blow-up …
    assert hot == 0
    # … and the cut is reported, never silent
    assert any("dropped" in r.message for r in caplog.records)
    # sanity: with the cap lifted the same docs DO pair up (the cap, not a
    # hashing accident, is what removed them)
    sub = skewed_corpus.where(F.col("doc_id") < 20)
    assert minhash_lsh_pairs(sub, max_bucket_size=None).count() == 190


def test_ngram_shingle_cap_bounds_candidates(skewed_corpus, caplog):
    """The exact-Jaccard path's stop-shingle cut (mirror of the LSH bucket
    cap): a shingle in 300 docs would emit O(300²) pair rows in one task;
    above the df bound it is excluded from candidate generation, with exact
    drop accounting attached to the result."""
    import logging

    with caplog.at_level(logging.WARNING,
                         logger="importpipeline_spark.operators.dedup"):
        got = ngram_jaccard_pairs(skewed_corpus, max_shingle_df=50)
        hot = got.where((F.col("id_a") < 300) & (F.col("id_b") < 300)).count()
    # the hot shingles are cut: zero quadratic pair blow-up …
    assert hot == 0
    # … the cut is logged BY DEFAULT and its exact size is attached
    assert any("dropped" in r.message for r in caplog.records)
    rep = got.cap_reports[0]
    assert rep.dropped_buckets > 0
    assert rep.dropped_rows >= 300
    # sanity: with the cap lifted the same docs DO pair up (the cut, not a
    # tokenization accident, removed them)
    sub = skewed_corpus.where(F.col("doc_id") < 20)
    uncapped = ngram_jaccard_pairs(sub, max_shingle_df=None)
    assert uncapped.count() == 190
    assert uncapped.cap_reports[0].dropped_buckets == 0


def test_cap_reports_and_release_cache(corpus):
    """Zero-drop runs report zero; cached deps are exposed and releasable."""
    from importpipeline_spark.operators.dedup import release_cache

    got = minhash_lsh_pairs(corpus, max_bucket_size=10_000)
    got.collect()
    assert [r.dropped_buckets for r in got.cap_reports] == [0]
    assert got.cached_deps  # the persisted signature relation
    assert all(d.is_cached for d in got.cached_deps)
    release_cache(got)
    assert all(not d.is_cached for d in got.cached_deps)


def test_simhash_bucket_cap_bounds_candidates(skewed_corpus):
    got = simhash_pairs(skewed_corpus, max_hamming=3, max_bucket_size=50)
    hot = got.where((F.col("id_a") < 300) & (F.col("id_b") < 300)).count()
    assert hot == 0
    sub = skewed_corpus.where(F.col("doc_id") < 20)
    assert simhash_pairs(sub, max_hamming=3, max_bucket_size=None).count() == 190


def test_embedding_bucket_cap_bounds_candidates(spark):
    # 300 identical vectors → one degenerate bucket per table; 50 random
    rng = np.random.default_rng(7)
    same = rng.standard_normal(16).astype(np.float32)
    rows = [(i, [float(x) for x in same]) for i in range(300)]
    base = rng.standard_normal((50, 16)).astype(np.float32)
    rows += [(1000 + i, [float(x) for x in base[i]]) for i in range(50)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = embedding_neardup_pairs(df, threshold=0.99, max_bucket_size=50)
    hot = got.where((F.col("id_a") < 300) & (F.col("id_b") < 300)).count()
    assert hot == 0
    sub = df.where(F.col("vec_id") < 20)
    assert embedding_neardup_pairs(
        sub, threshold=0.99, max_bucket_size=None
    ).count() == 190


@pytest.fixture(scope="module")
def vectors(spark):
    rng = np.random.default_rng(5)
    base = rng.standard_normal((200, 16)).astype(np.float32)
    rows = [(i, [float(x) for x in base[i]]) for i in range(200)]
    return spark.createDataFrame(rows, "vec_id long, embedding array<float>"), base


def test_cosine_bruteforce_matches_numpy(vectors):
    df, base = vectors
    q = base[0].astype(np.float64)
    sims = (base.astype(np.float64) @ q) / (
        np.linalg.norm(base.astype(np.float64), axis=1) * np.linalg.norm(q)
    )
    order = sorted(range(1, 200), key=lambda i: (-sims[i], i))[:10]
    got = cosine_topk_bruteforce(
        df.where(F.col("vec_id") != 0), [float(x) for x in base[0]], k=10
    ).collect()
    assert [r.vec_id for r in got] == order
    for r in got:
        assert r.cosine == pytest.approx(sims[r.vec_id], rel=1e-6)


def test_lsh_ann_recall(vectors, spark):
    df, base = vectors
    got_exact = cosine_topk_bruteforce(
        df.where(F.col("vec_id") != 0), [float(x) for x in base[0]], k=10
    ).collect()
    got_ann = cosine_topk_lsh(
        spark, df.where(F.col("vec_id") != 0), [float(x) for x in base[0]],
        k=10, n_planes=6, n_tables=8,
    ).collect()
    exact_ids = [r.vec_id for r in got_exact]
    ann_ids = {r.vec_id for r in got_ann}
    recall = len(ann_ids & set(exact_ids)) / len(exact_ids)
    assert recall >= 0.5, f"ANN recall {recall}"
    # ANN scores are exact cosines (verification is exact on candidates)
    exact_map = {r.vec_id: r.cosine for r in got_exact}
    for r in got_ann:
        if r.vec_id in exact_map:
            assert r.cosine == pytest.approx(exact_map[r.vec_id], rel=1e-9)


def test_ivf_ann_recall(vectors, spark):
    from importpipeline_spark.operators.similarity import cosine_topk_ivf, ivf_build

    df, base = vectors
    with_cells, centroids = ivf_build(df, n_cells=8, iters=2)
    got_exact = cosine_topk_bruteforce(
        df.where(F.col("vec_id") != 0), [float(x) for x in base[0]], k=10
    ).collect()
    got_ivf = cosine_topk_ivf(
        with_cells.where(F.col("vec_id") != 0), centroids,
        [float(x) for x in base[0]], k=10, n_probe=4,
    ).collect()
    recall = len({r.vec_id for r in got_ivf} & {r.vec_id for r in got_exact}) / 10
    assert recall >= 0.5, f"IVF recall {recall}"
    # all cells assigned in range
    cells = {r.cell for r in with_cells.select("cell").distinct().collect()}
    assert cells <= set(range(8))


def test_ivf_partial_probe_recall_on_planted_clusters(spark):
    """The ivf_ann_partial contract invariant (r5): on the planted-cluster
    derivation of the fixture embeddings (c = vec_id % 8, v' = 10·e_c +
    0.1·v), ivf_build's deterministic smallest-id init seeds one centroid
    per planted cluster (rest's 8 smallest ids are 1..8, covering every
    residue), Lloyd converges to a planted-cluster↔cell BIJECTION, and
    partial-probe recall is 10/10 from n_probe=1 up. Re-measure at sf0.001
    AND sf0.01 before touching any parameter here (CLAUDE.md §6)."""
    from importpipeline_spark.operators.similarity import cosine_topk_ivf, ivf_build

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    c = (F.col("vec_id") % 8).cast("int")
    cvec = F.transform(
        "embedding",
        lambda x, i: F.when(i == c, F.lit(10.0)).otherwise(F.lit(0.0))
        + F.lit(0.1) * x.cast("double"),
    )
    clustered = emb.select("vec_id", cvec.alias("embedding"))
    qvec = [float(x)
            for x in clustered.where(F.col("vec_id") == 0).first().embedding]
    rest = clustered.where(F.col("vec_id") != 0).persist()
    bf = {r.vec_id for r in cosine_topk_bruteforce(rest, qvec, k=10).collect()}
    with_cells, centroids = ivf_build(rest, n_cells=8, iters=3)
    wc = with_cells.persist()
    # bijection: every planted cluster maps to exactly one cell, all distinct
    m = {}
    for r in wc.select((F.col("vec_id") % 8).alias("pc"), "cell").distinct().collect():
        m.setdefault(r.pc, set()).add(r.cell)
    assert all(len(v) == 1 for v in m.values()), m
    assert len({next(iter(v)) for v in m.values()}) == 8, m
    for npr in (1, 2):
        ann = {r.vec_id for r in
               cosine_topk_ivf(wc, centroids, qvec, k=10, n_probe=npr).collect()}
        assert len(bf & ann) == 10, (npr, sorted(bf - ann))
    rest.unpersist()
    wc.unpersist()


def test_ivf_real_sizes(spark):
    """IVF at realistic quantizer sizes (256 cells × 128 dims): the broadcast
    numpy assignment path must stay fast and correct — clustered data should
    land whole clusters in the same cell, and probing enough cells must reach
    recall ≥ 0.9 on a clustered query."""
    from importpipeline_spark.operators.similarity import cosine_topk_ivf, ivf_build

    rng = np.random.default_rng(13)
    centers = rng.standard_normal((32, 128))
    X = np.repeat(centers, 64, axis=0) + rng.standard_normal((2048, 128)) * 0.05
    rows = [(i, [float(v) for v in X[i]]) for i in range(len(X))]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    with_cells, centroids = ivf_build(df, n_cells=256, iters=2)
    assert len(centroids) == 256
    q = [float(v) for v in X[0]]
    got_exact = cosine_topk_bruteforce(df.where(F.col("vec_id") != 0), q, k=10).collect()
    got_ivf = cosine_topk_ivf(
        with_cells.where(F.col("vec_id") != 0), centroids, q, k=10, n_probe=16
    ).collect()
    recall = len({r.vec_id for r in got_ivf} & {r.vec_id for r in got_exact}) / 10
    assert recall >= 0.9, f"IVF recall {recall}"

    # the final assignment broadcast is handed back for lifecycle control:
    # after materialization, release_cache destroys it (no session-lifetime
    # pinned centroid matrices)
    from importpipeline_spark.operators.dedup import release_cache

    assert with_cells.broadcast_deps
    release_cache(with_cells)
    import pytest as _pytest

    with _pytest.raises(Exception):  # destroyed broadcast is unusable
        with_cells.broadcast_deps[0].value


def test_embedding_neardup(spark):
    rng = np.random.default_rng(9)
    base = rng.standard_normal((50, 16)).astype(np.float32)
    rows = [(i, [float(x) for x in base[i]]) for i in range(50)]
    # near-dups: 100+i ≈ i with tiny noise
    for i in range(5):
        v = base[i] + rng.standard_normal(16).astype(np.float32) * 0.01
        rows.append((100 + i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    got = embedding_neardup_pairs(df, threshold=0.98, n_planes=8, n_tables=6)
    found = {(r.id_a, r.id_b) for r in got.collect()}
    hits = sum((i, 100 + i) in found for i in range(5))
    assert hits >= 4, f"found {hits}/5 near-dup pairs"


def test_lang_id_on_documents(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
    pred = lang_id_scores(docs, "text")
    assert "lang_pred" in pred.columns
    assert pred.where(F.col("lang_pred").isNull()).count() == 0


def test_quality_features_ranges(spark):
    docs = spark.read.parquet("/root/testdata/sf0.01/documents.parquet").limit(100)
    qf = quality_features(docs, "text").collect()
    for r in qf:
        assert 0.0 <= r.quality_score <= 1.0
        assert r.n_tokens > 0
        assert 0.0 <= r.punct_ratio <= 1.0


def test_boilerplate_ngrams_vs_pandas(spark):
    """boilerplate_ngrams == a hand-rolled per-doc-distinct trigram doc
    frequency; per-doc repeats must count once."""
    from importpipeline_spark.operators.dedup import boilerplate_ngrams

    rows = [
        (1, "a b c a b c x"),      # "a b c" twice in ONE doc → counts once
        (2, "z a b c q"),
        (3, "a b c"),
        (4, "no overlap here at all"),
        (5, "sh"),                  # shorter than n → no shingles
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {(r.ngram, r.df) for r in boilerplate_ngrams(df, n=3, min_df=2).collect()}

    from collections import Counter
    c = Counter()
    for _, text in rows:
        toks = text.split()
        c.update({" ".join(toks[i:i + 3]) for i in range(len(toks) - 2)})
    expect = {(g, n) for g, n in c.items() if n >= 2}
    assert got == expect
    assert ("a b c", 3) in got  # doc 1 contributed exactly once


def test_boilerplate_ngrams_two_pass_randomized(spark):
    """The r5 two-pass heavy-hitter miner (hash count + string recovery)
    must equal the scalar per-doc-distinct doc-frequency reference on
    random corpora across n / min_df — pins the refactor's output
    invariance beyond the single hand-built fixture."""
    import random

    from collections import Counter

    from importpipeline_spark.operators.dedup import boilerplate_ngrams

    rng = random.Random(1234)
    vocab = [f"w{i}" for i in range(30)]
    for trial, (n, min_df) in enumerate([(2, 2), (3, 2), (3, 5), (4, 3)]):
        rows = [
            (i, " ".join(rng.choice(vocab)
                         for _ in range(rng.randint(0, 40))))
            for i in range(120)
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {(r.ngram, r.df)
               for r in boilerplate_ngrams(df, n=n, min_df=min_df).collect()}
        c = Counter()
        for _, text in rows:
            toks = text.split() if text.strip() else []
            c.update({" ".join(toks[i:i + n])
                      for i in range(len(toks) - n + 1)})
        expect = {(g, k) for g, k in c.items() if k >= min_df}
        assert got == expect, (trial, n, min_df,
                               sorted(got ^ expect)[:5])


def test_strip_boilerplate_planted(spark):
    """Position-coverage removal: overlapping occurrences union, non-hit
    docs pass through untouched, short docs are safe, and the drop count is
    exact."""
    from importpipeline_spark.operators.dedup import (
        boilerplate_ngrams,
        strip_boilerplate,
    )

    bp = "subscribe to our newsletter"
    rows = [
        (1, f"{bp} real content one"),
        (2, f"more real content {bp}"),
        (3, f"{bp} middle text {bp}"),   # two occurrences in one doc
        (4, "totally clean document text"),
        (5, "sh"),                        # shorter than n
        (6, "subscribe to our subscribe to our newsletter"),  # overlap
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    mined = boilerplate_ngrams(df, n=4, min_df=2)
    assert {r.ngram for r in mined.collect()} == {bp}
    got = {r.doc_id: r for r in
           strip_boilerplate(df, mined, n=4).collect()}
    assert got[1].text == "real content one" and got[1].n_removed == 4
    assert got[2].text == "more real content" and got[2].n_removed == 4
    assert got[3].text == "middle text" and got[3].n_removed == 8
    assert got[4].text == "totally clean document text"
    assert got[4].n_removed == 0
    assert got[5].text == "sh" and got[5].n_removed == 0
    # doc 6: "subscribe to our subscribe to our newsletter" — the mined
    # 4-gram occurs once starting at token 3; tokens 3..6 drop, the leading
    # "subscribe to our" (not followed by "newsletter") survives
    assert got[6].text == "subscribe to our" and got[6].n_removed == 4
    assert set(got) == {1, 2, 3, 4, 5, 6}


def test_strip_boilerplate_mostly_covered_long_doc(spark):
    """Adversarial scale shape (ADVICE r4): a long document that is almost
    entirely boilerplate must strip in time linear in its length. The old
    per-token ``array_contains(covered, i)`` filter was O(tokens × covered)
    — ~1.4e10 comparisons for this 120k-token fully-covered page; the
    array_except hash-probe rewrite is O(tokens + covered). The bound here
    (30 s wall for the whole job) fails the quadratic shape by an order of
    magnitude while leaving huge headroom for a loaded host."""
    import time

    from importpipeline_spark.operators.dedup import strip_boilerplate

    L = 120_000  # tokens; every position covered by a mined trigram
    rows = [
        (1, "a b c " * (L // 3)),
        (2, "clean words only here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    mined = spark.createDataFrame(
        [("a b c",), ("b c a",), ("c a b",)], "ngram string"
    )
    t0 = time.monotonic()
    got = {r.doc_id: r for r in strip_boilerplate(df, mined, n=3).collect()}
    elapsed = time.monotonic() - t0
    assert got[1].text == "" and got[1].n_removed == L
    assert got[2].text == "clean words only here" and got[2].n_removed == 0
    assert elapsed < 30, f"strip took {elapsed:.1f}s — quadratic shape?"


def test_contamination_attribution_edges(spark):
    """Provenance: per-doc best-matching benchmark item, deterministic
    tie-break (count DESC, bench_id ASC), NULL attribution for clean docs,
    totals identical to contamination_hits."""
    from importpipeline_spark.operators.pretrain import (
        contamination_attribution,
        contamination_hits,
    )

    docs = spark.createDataFrame(
        [(1, "p q r s t u"),      # shares 2 grams w/ bench 10, 1 w/ 20
         (2, "x y z w"),          # clean
         (3, "p q r")],           # one gram, ties bench 10 vs 30 → min id
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(10, "p q r s zz"),      # grams: p q r / q r s / r s zz
         (20, "s t u zz2"),       # grams: s t u / t u zz2
         (30, "p q r")],          # gram: p q r
        "bench_id long, text string",
    )
    got = {r.doc_id: r for r in contamination_attribution(
        docs, bench, n=3).collect()}
    # doc 1 distinct grams: pqr qrs rst stu — pqr+qrs in b10 (2), stu in
    # b20 (1), pqr in b30 (1) → n_hits=3 (pqr, qrs, stu), top = b10
    assert got[1].n_hits == 3 and got[1].contaminated
    assert got[1].top_bench_id == 10 and got[1].top_bench_hits == 2
    assert got[2].n_hits == 0 and not got[2].contaminated
    assert got[2].top_bench_id is None and got[2].top_bench_hits == 0
    # doc 3: "p q r" matches b10 and b30 with count 1 each → smallest id
    assert got[3].top_bench_id == 10 and got[3].top_bench_hits == 1
    # totals agree with the screen variant
    screen = {r.doc_id: r.n_hits for r in contamination_hits(
        docs, bench, n=3).collect()}
    assert {d: r.n_hits for d, r in got.items()} == screen


def test_neardup_components_and_survivors(spark):
    """Min-label propagation over near-dup pairs: chains (multi-round
    propagation), stars, triangles — and the per-component KEEP decision."""
    from importpipeline_spark.operators.dedup import (
        neardup_components,
        neardup_survivors,
    )

    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),        # chain: label 1 travels 3 hops
         (10, 11),                      # plain pair
         (20, 21), (21, 22), (20, 22)], # triangle
        "id_a long, id_b long",
    )
    comps = {r.id: r.component_id for r in neardup_components(pairs).collect()}
    assert comps == {1: 1, 2: 1, 3: 1, 4: 1,
                     10: 10, 11: 10,
                     20: 20, 21: 20, 22: 20}

    docs = spark.createDataFrame(
        [(i,) for i in (1, 2, 3, 4, 5, 10, 11, 20, 21, 22)], "doc_id long"
    )
    kept = {r.doc_id for r in neardup_survivors(docs, pairs).collect()}
    # smallest id per component survives; unpaired doc 5 is untouched
    assert kept == {1, 5, 10, 20}

    with pytest.raises(RuntimeError, match="converge"):
        neardup_components(pairs, max_iter=1)
