"""DSIR importance-resampling semantics (curation.dsir_weights, Xie et
al. 2023): hashed unigram+bigram features, add-1-smoothed target/raw
bucket models, deterministic top-fraction selection with value-rank tie
handling. Oracle equality vs DuckDB is covered by test_driver_contract;
these pin the hand-computable behavior on a corpus with a known target
signal."""

import math

import pytest

from newocr_spark.analytics.curation import dsir_weights


@pytest.fixture(scope="module")
def bilingual(spark):
    """8 docs in a 'target' dialect (distinct vocab), 8 in another, plus
    4 mixed docs sharing both vocabularies."""
    t_words = "alpha beta gamma delta epsilon zeta".split()
    o_words = "uno dos tres cuatro cinco seis".split()
    rows = []
    for i in range(8):
        rows.append((i, " ".join(t_words[(i + j) % 6] for j in range(12)), "en"))
    for i in range(8):
        rows.append(
            (100 + i, " ".join(o_words[(i + j) % 6] for j in range(12)), "es")
        )
    for i in range(4):
        mix = [t_words[j % 6] if j % 2 else o_words[j % 6] for j in range(12)]
        rows.append((200 + i, " ".join(mix), "es"))
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_dsir_ranks_target_vocabulary_highest(bilingual):
    out = {r.doc_id: r for r in dsir_weights(bilingual, target_lang="en").collect()}
    assert len(out) == 20
    t_w = [out[i].logweight for i in range(8)]
    o_w = [out[100 + i].logweight for i in range(8)]
    m_w = [out[200 + i].logweight for i in range(4)]
    # pure target vocab outranks mixed outranks pure other vocab
    assert min(t_w) > max(m_w) > max(o_w)
    # n_grams = unigrams + bigrams = 12 + 11
    assert all(out[i].n_grams == 23 for i in out)


def test_dsir_selects_top_fraction_with_tie_sharing(bilingual):
    out = {r.doc_id: r.selected for r in dsir_weights(
        bilingual, target_lang="en", select_num=1, select_den=4
    ).collect()}
    # 20 docs, top quarter = 5 by strict-above rank; the target docs all
    # score in a tight band above everything else — selected docs are a
    # subset of the 8 target docs and at least 5 (ties share fate)
    sel = {i for i, s in out.items() if s}
    assert sel <= set(range(8))
    assert len(sel) >= 5
    # half/half split selects all target docs and nothing else
    out2 = {r.doc_id: r.selected for r in dsir_weights(
        bilingual, target_lang="en", select_num=1, select_den=2
    ).collect()}
    assert {i for i, s in out2.items() if s} >= set(range(8))


def test_dsir_weight_is_zero_when_target_is_everything(spark):
    """If the target slice IS the whole corpus, p_t == p_r bucket-for-
    bucket and every logweight is exactly 0 (smoothing included)."""
    docs = spark.createDataFrame(
        [(i, f"w{i % 3} w{(i + 1) % 3} common", "en") for i in range(6)],
        "doc_id long, text string, lang string",
    )
    rows = dsir_weights(docs, target_lang="en").collect()
    assert all(r.logweight == 0.0 for r in rows)
    # rank rule: nobody scores strictly above anybody -> everyone selected
    assert all(r.selected for r in rows)


def test_dsir_single_token_docs_have_no_bigrams(spark):
    docs = spark.createDataFrame(
        [(0, "solo", "en"), (1, "a b c", "es")],
        "doc_id long, text string, lang string",
    )
    out = {r.doc_id: r.n_grams for r in dsir_weights(docs).collect()}
    assert out == {0: 1, 1: 5}
