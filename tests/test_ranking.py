"""Unit tests for the lexical ranking operators (analytics/ranking.py):
TF-IDF top-terms and BM25 against hand-computed formula values on a tiny
corpus (the driver contract separately certifies both against DuckDB at
sf0.01 via tfidf_topterms / bm25_search)."""

import math

import pytest

from newocr_spark.analytics import ranking as R

DOCS = [
    (0, "spark spark window"),
    (1, "hash table"),
    (2, "spark hash hash hash"),
    (3, "vector"),
]


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def _idf_smooth(n_docs, df):
    return math.log((n_docs + 1.0) / (df + 1.0)) + 1.0


def test_tfidf_values_and_ranks(docs):
    rows = {
        (r.doc_id, r.term): r
        for r in R.tfidf_topterms(docs, k=3).collect()
    }
    # df: spark=2, window=1, hash=2, table=1, vector=1; N=4
    exp = {
        (0, "spark"): (2, 2, 1),   # (tf, df, rnk)
        (0, "window"): (1, 1, 2),
        (1, "hash"): (1, 2, 2),    # table idf 1.916 > hash idf 1.511
        (1, "table"): (1, 1, 1),
        (2, "hash"): (3, 2, 1),
        (2, "spark"): (1, 2, 2),
        (3, "vector"): (1, 1, 1),
    }
    assert set(rows) == set(exp)
    for (doc, term), (tf, df, rnk) in exp.items():
        r = rows[(doc, term)]
        assert r.tf == tf
        assert r.rnk == rnk
        assert r.tfidf == round(tf * _idf_smooth(4, df), 6)


def test_tfidf_k_truncates(docs, spark):
    wide = spark.createDataFrame(
        [(0, "a b c d e f")], ["doc_id", "text"]
    )
    out = R.tfidf_topterms(wide, k=2).collect()
    # all six terms tie on tfidf -> term-ascending tiebreak keeps a, b
    assert sorted((r.term, r.rnk) for r in out) == [("a", 1), ("b", 2)]


def _bm25_contrib(tf, df, doclen, n_docs, avgdl, k1=1.2, b=0.75):
    idf = math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))
    return idf * tf * (k1 + 1.0) / (tf + k1 * (1.0 - b + b * doclen / avgdl))


def test_bm25_scores(docs):
    out = {
        r.doc_id: r
        for r in R.bm25_search(docs, query_terms=("spark", "hash")).collect()
    }
    # doclens 3,2,4,1 -> avgdl 2.5; spark df=2, hash df=2; d3 never scores
    assert set(out) == {0, 1, 2}
    exp = {
        0: _bm25_contrib(2, 2, 3, 4, 2.5),
        1: _bm25_contrib(1, 2, 2, 4, 2.5),
        2: _bm25_contrib(1, 2, 4, 4, 2.5) + _bm25_contrib(3, 2, 4, 4, 2.5),
    }
    for doc_id, score in exp.items():
        assert out[doc_id].bm25 == round(score, 6)
    assert out[2].n_terms_hit == 2
    assert out[0].n_terms_hit == 1


def test_bm25_topk_cutoff(docs):
    out = R.bm25_search(docs, query_terms=("spark", "hash"), topk=1).collect()
    assert len(out) == 1
    assert out[0].doc_id == 2  # highest aggregate score


def test_no_hit_query_is_empty(docs):
    assert R.bm25_search(docs, query_terms=("absent",)).count() == 0
