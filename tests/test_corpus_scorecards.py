"""Semantics of the corpus-scorecard operators added round 5:

* source_overlap — cross-source near-dup flow matrix with COMBINATORIAL
  pair counting (member pairs never materialize; a B-copy exact-dup group
  split across sources contributes arithmetic weights, not B^2/2 rows).
* unigram_logprob — CCNet-style unigram LM quality proxy (Wenzek et al.
  2020): mean ln p(token) under the corpus's own unigram distribution.

Oracle equality vs DuckDB is covered by test_driver_contract; these pin
the hand-computable semantics and the non-quadratic counting shape.
"""

import math

import pytest
from pyspark.sql import functions as F

from newocr_spark.analytics.dedup import source_overlap
from newocr_spark.analytics.textstats import unigram_logprob


@pytest.fixture(scope="module")
def mirrored(spark):
    """Two sources mirroring one page (3 copies in A, 2 in B) plus one
    near-dup variant in B and an unrelated doc in C."""
    page = "shared boilerplate page body with many common words inside"
    rows = [
        (0, page, "srcA"),
        (1, page, "srcA"),
        (2, page, "srcA"),
        (3, page, "srcB"),
        (4, page, "srcB"),
        # same page with one word changed: near-dup of the group above
        (5, page.replace("many", "several"), "srcB"),
        (6, "a totally different document about unrelated matters", "srcC"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, source string")


def test_source_overlap_counts_are_combinatorial(mirrored):
    out = {
        (r.source_a, r.source_b): r
        for r in source_overlap(mirrored, threshold=0.5).collect()
    }
    # within-group exact copies: C(3,2)=3 pairs inside A, C(2,2)=1 in B,
    # 3*2=6 across A/B — all jaccard 1.0
    assert out[("srcA", "srcA")].n_pairs == 3
    assert out[("srcA", "srcA")].avg_jaccard == 1.0
    # cross-group near-dup (doc 5) adds 2 more A<->B... no: doc5 is in B,
    # so it adds 3 pairs to (A,B) at the verified jaccard and 2 pairs
    # inside (B,B); the exact copies add 6 to (A,B) and 1 to (B,B)
    ab = out[("srcA", "srcB")]
    bb = out[("srcB", "srcB")]
    assert ab.n_pairs == 6 + 3
    assert bb.n_pairs == 1 + 2
    # weighted means mix jaccard-1.0 exact pairs with the variant's j<1
    j = (ab.avg_jaccard * 9 - 6.0) / 3  # recovered rep-pair jaccard
    assert 0.5 <= j < 1.0
    # avg_jaccard is round(...,6); recovery amplifies that by 3x / 1.5x
    assert abs((bb.avg_jaccard * 3 - 1.0) / 2 - j) < 5e-6
    # the unrelated source pairs with nothing
    assert not any("srcC" in k for k in out)


def test_source_overlap_member_pairs_never_materialize(spark):
    # 400 exact copies of one page split over two sources: flow counts are
    # C(200,2) within each and 200*200 across, but the plan's only
    # pair-shaped frame is over CANONICAL reps (1 per distinct text), so
    # the flows frame stays at O(sources^2) rows per group
    n = 400
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"),
        F.lit("one boilerplate page duplicated across two mirrors").alias("text"),
        F.when(F.col("id") % 2 == 0, "m1").otherwise("m2").alias("source"),
    )
    out = {
        (r.source_a, r.source_b): r.n_pairs
        for r in source_overlap(docs, threshold=0.5).collect()
    }
    half = n // 2
    assert out[("m1", "m1")] == half * (half - 1) // 2
    assert out[("m2", "m2")] == half * (half - 1) // 2
    assert out[("m1", "m2")] == half * half


def test_unigram_logprob_hand_computed(spark):
    # corpus: doc0 = "a a b", doc1 = "b c"; totals: a=2, b=2, c=1, T=5
    docs = spark.createDataFrame(
        [(0, "a a b"), (1, "b c")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in unigram_logprob(docs).collect()}
    lp = lambda c: math.log(c / 5.0)
    exp0 = (2 * lp(2) + lp(2)) / 3
    exp1 = (lp(2) + lp(1)) / 2
    assert got[0].n_tokens == 3 and got[1].n_tokens == 2
    assert abs(got[0].logprob - round(exp0, 6)) < 1e-9
    assert abs(got[1].logprob - round(exp1, 6)) < 1e-9
    # rarer tokens => lower logprob
    assert got[1].logprob < got[0].logprob


def test_unigram_logprob_flags_gibberish(spark):
    # ten fluent docs sharing a vocabulary vs one doc of unique noise:
    # the noise doc must rank strictly lowest — the CCNet tail
    fluent = [(i, "the quick brown fox jumps over the lazy dog") for i in range(10)]
    noise = [(99, "zxqv kjhw pqrs wvut mlkj")]
    docs = spark.createDataFrame(fluent + noise, "doc_id long, text string")
    rows = unigram_logprob(docs).collect()
    worst = min(rows, key=lambda r: r.logprob)
    assert worst.doc_id == 99


def test_quality_buckets_thirds_and_ordering(spark):
    # 9 docs with strictly distinct LM scores split 3/3/3; the bucket
    # order must follow the score order (head = best-scoring third)
    from newocr_spark.analytics.textstats import quality_buckets

    # doc i repeats a common word i times then adds one rare word, so
    # logprob increases monotonically with i (more mass on the common tok)
    docs = spark.createDataFrame(
        [(i, ("common " * (i + 1)) + f"rare{i}") for i in range(9)],
        "doc_id long, text string",
    )
    rows = {r.doc_id: r for r in quality_buckets(docs).collect()}
    assert len(rows) == 9
    by_score = sorted(rows.values(), key=lambda r: -r.logprob)
    assert [r.bucket for r in by_score] == ["head"] * 3 + ["middle"] * 3 + ["tail"] * 3
    # head really is the HIGH-logprob (low-perplexity) end
    assert min(r.logprob for r in by_score[:3]) > max(r.logprob for r in by_score[6:])


def test_quality_buckets_ties_share_a_bucket(spark):
    # 6 identical docs + 3 distinct worse ones: the 6 tie on logprob and
    # must all land in ONE bucket (value-granularity rule), even though a
    # rank-based ntile would split them across head and middle
    from newocr_spark.analytics.textstats import quality_buckets

    same = [(i, "common common common word") for i in range(6)]
    worse = [(10 + i, f"odd{i} strange{i} rare{i}") for i in range(3)]
    docs = spark.createDataFrame(same + worse, "doc_id long, text string")
    rows = {r.doc_id: r.bucket for r in quality_buckets(docs).collect()}
    tied = {rows[i] for i in range(6)}
    assert tied == {"head"}


def test_mixture_weights_sqrt_temperature(spark):
    """sqrt-temperature mixing: small sources get MORE than proportional
    weight, large sources less; weights sum to 1; epochs = budget*weight/
    n_tok so the upsampled small source repeats more often."""
    from newocr_spark.analytics.textstats import mixture_weights

    docs = spark.createDataFrame(
        [(i, "tok " * 100, "big") for i in range(16)]
        + [(100 + i, "tok " * 100, "small") for i in range(1)],
        "doc_id bigint, text string, source string",
    )
    out = {r.source: r for r in mixture_weights(docs, token_budget=1700).collect()}
    assert out["big"].n_tok == 1600 and out["small"].n_tok == 100
    assert abs(out["big"].weight + out["small"].weight - 1.0) < 1e-9
    # proportional shares are 16/17 and 1/17; sqrt flattens to 4/5 and 1/5
    assert abs(out["big"].weight - 0.8) < 1e-6
    assert abs(out["small"].weight - 0.2) < 1e-6
    # the small source is upsampled past one epoch at this budget
    assert out["small"].epochs > 1.0 > out["big"].epochs
    assert abs(out["small"].epochs - 1700 * 0.2 / 100) < 1e-5


def test_winnow_fingerprints_guarantee_and_density(spark):
    """Schleimer et al. 2003: any shared substring of >= w + k - 1 tokens
    must contribute at least one shared fingerprint; the sketch is much
    smaller than the full k-gram set."""
    from newocr_spark.analytics.textstats import winnow_fingerprints

    k, w = 4, 4
    shared = " ".join(f"s{i}" for i in range(k + w - 1))  # exactly w+k-1
    a = "alpha beta gamma " + shared + " delta epsilon"
    b = "one two three four five " + shared + " six"
    c = " ".join(f"u{i}" for i in range(30))  # no overlap with a or b
    docs = spark.createDataFrame(
        [(1, a), (2, b), (3, c)], "doc_id bigint, text string"
    )
    rows = winnow_fingerprints(docs, k=k, w=w).collect()
    fps = {}
    for r in rows:
        fps.setdefault(r.doc_id, set()).add(r.fp)
    assert fps[1] & fps[2]            # guarantee: shared fingerprint
    assert not (fps[1] & fps[3]) and not (fps[2] & fps[3])
    # density: far fewer fingerprints than k-grams (30-3 grams in doc 3)
    assert len(fps[3]) < 27


def test_winnow_fingerprints_short_doc_edges(spark):
    from newocr_spark.analytics.textstats import winnow_fingerprints

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c d"), (3, "a b c d e")],
        "doc_id bigint, text string",
    )
    out = {}
    for r in winnow_fingerprints(docs, k=4, w=4).collect():
        out.setdefault(r.doc_id, []).append(r.fp)
    assert 1 not in out                 # < k tokens: no k-grams, no rows
    assert len(out[2]) == 1             # m=1 < w: one window over all
    assert len(out[3]) == 1             # m=2 < w: window min collapses


def test_source_quota_caps_by_lm_score_with_tie_fate(spark):
    """Per-source cap: the k best LM-scoring docs keep per source, ties
    straddling the cap share fate (all admitted), and the window never
    ranks across sources. Corpus unigram counts: 'the' x6, the rare*
    tokens x1, src_b's shared sentence tokens x2 — so within src_a the
    ordering is doc 1 (all common) > doc 2 > docs 3 == 4 (all-hapax tie),
    and src_b's identical docs tie exactly."""
    from newocr_spark.analytics.textstats import source_quota

    rows = [
        (1, "the the the the", "src_a"),
        (2, "the the rare1", "src_a"),
        (3, "rare2 rare3", "src_a"),
        (4, "rare4 rare5 rare6", "src_a"),
        (5, "same words here exactly", "src_b"),
        (6, "same words here exactly", "src_b"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = {r.doc_id: r for r in source_quota(docs, k=2).collect()}
    kept_a = sorted(d for d in (1, 2, 3, 4) if out[d].keep)
    assert kept_a == [1, 2]
    assert out[3].n_better == 2 and out[4].n_better == 2  # hapax tie
    assert out[3].logprob == out[4].logprob
    # src_b identical docs tie at rank 0; k=1 admits BOTH (ties share fate)
    out1 = {r.doc_id: r for r in source_quota(docs, k=1).collect()}
    assert out1[5].keep and out1[6].keep
    assert out1[5].n_better == 0 and out1[6].n_better == 0
    assert sum(out1[d].keep for d in (1, 2, 3, 4)) == 1  # only doc 1
    # k=3 straddles the src_a hapax tie: both 3 and 4 admitted
    out3 = {r.doc_id: r for r in source_quota(docs, k=3).collect()}
    assert out3[3].keep and out3[4].keep


def test_source_kl_zero_for_matching_source_positive_for_skewed(spark):
    """KL(P_s || P_corpus) is ~0 when a source's token distribution
    matches the mixture and strictly positive when it concentrates mass;
    hand-checked against the closed form on a tiny corpus."""
    import math

    from newocr_spark.analytics.textstats import source_kl

    # two sources with IDENTICAL distributions -> corpus == each -> KL 0
    rows = [
        (1, "aa bb cc dd", "s1"),
        (2, "aa bb cc dd", "s2"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = {r.source: r for r in source_kl(docs).collect()}
    assert out["s1"].kl_nats == 0.0 and out["s2"].kl_nats == 0.0
    assert out["s1"].n_tokens == 4 and out["s1"].n_types == 4

    # skewed source: s1 = {aa:2}, s2 = {aa:1, bb:1}; corpus = {aa:3, bb:1}
    # KL(s1) = 1*ln(1/(3/4)) = ln(4/3); KL(s2) = .5*ln(.5/.75)+.5*ln(.5/.25)
    rows = [(1, "aa aa", "s1"), (2, "aa bb", "s2")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, source string")
    out = {r.source: r for r in source_kl(docs).collect()}
    assert abs(out["s1"].kl_nats - round(math.log(4 / 3), 6)) < 1e-9
    expect_s2 = 0.5 * math.log(0.5 / 0.75) + 0.5 * math.log(0.5 / 0.25)
    assert abs(out["s2"].kl_nats - round(expect_s2, 6)) < 1e-9


def test_lang_confusion_diagonal_and_mislabeled_slice(spark):
    """Correctly-labeled docs land on the diagonal; a 'de'-labeled slice
    full of English stopwords shows up as the (de, en) off-diagonal cell
    with the right within-language rate."""
    from newocr_spark.analytics.textstats import lang_confusion

    en = "the of and to in is was"
    de = "der die und das ist nicht ein"
    rows = (
        [(i, en, "en") for i in range(4)]
        + [(10 + i, de, "de") for i in range(2)]
        + [(20 + i, en, "de") for i in range(2)]  # mislabeled shard
    )
    docs = spark.createDataFrame(rows, "doc_id bigint, text string, lang string")
    out = {(r.lang, r.lang_pred): r for r in lang_confusion(docs).collect()}
    assert out[("en", "en")].n_docs == 4
    assert out[("en", "en")].frac_of_lang == 1.0
    assert out[("de", "de")].n_docs == 2
    assert out[("de", "en")].n_docs == 2
    assert out[("de", "de")].frac_of_lang == 0.5
    assert out[("de", "en")].frac_of_lang == 0.5
    assert ("en", "de") not in out
