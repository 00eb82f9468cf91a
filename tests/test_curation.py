"""Round-3 curation operators (analytics/curation.py): semantic checks
beyond the driver-contract oracle parity (test_driver_contract.py runs
each query vs its DuckDB oracle automatically)."""

import pytest
from pyspark.sql import functions as F

from newocr_spark.analytics import curation as C


def test_pii_scrub_redacts_and_counts(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail bob.smith@corp.example.org now call 555-1234 "
                "or 555 6789 host 192.168.0.1 done"),
            (2, "no pii here at all"),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in C.pii_scrub(docs).collect()}
    r1 = out[1]
    assert (r1.n_emails, r1.n_phones, r1.n_ips) == (1, 2, 1)
    assert "<EMAIL>" in r1.clean_text and "<PHONE>" in r1.clean_text
    assert "<IP>" in r1.clean_text
    assert "bob.smith" not in r1.clean_text
    assert "192.168.0.1" not in r1.clean_text
    r2 = out[2]
    assert (r2.n_emails, r2.n_phones, r2.n_ips) == (0, 0, 0)
    assert r2.clean_text == "no pii here at all"


def test_decontaminate_flags_overlapping_doc(spark):
    bench_text = "alpha beta gamma delta epsilon zeta eta theta"
    rows = [
        (0, bench_text),                        # doc_id % 53 == 0 → benchmark
        (1, bench_text + " extra tail words"),  # heavy overlap → flagged
        (2, "completely different content with no shared bigrams at all"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r.n_overlap for r in C.decontaminate(docs).collect()}
    assert 1 in got and got[1] >= 3
    assert 2 not in got
    assert 0 not in got  # the benchmark itself is never flagged


def test_stratified_sample_deterministic_and_rate_shaped(spark):
    docs = spark.createDataFrame(
        [(i, f"text {i}", ["en", "zh"][i % 2]) for i in range(2000)],
        "doc_id bigint, text string, lang string",
    )
    a = {r.doc_id for r in C.stratified_sample(docs).collect()}
    b = {r.doc_id for r in C.stratified_sample(docs).collect()}
    assert a == b  # hash-based: no RNG state, identical across runs
    en = {i for i in a if i % 2 == 0}
    zh = {i for i in a if i % 2 == 1}
    assert len(en) == 1000          # en rate 1.0 keeps everything
    assert 40 <= len(zh) <= 180     # zh rate 0.1 of 1000, hash-uniform


def test_pack_sequences_contiguous_stream(spark):
    docs = spark.createDataFrame(
        [(i, "word " * (10 + i % 7)) for i in range(300)],
        "doc_id bigint, text string",
    )
    out = C.pack_sequences(docs, budget=64, n_shards=4).collect()
    by_shard = {}
    for r in out:
        by_shard.setdefault(r.shard, []).append(r)
    assert set(by_shard) == {0, 1, 2, 3}
    for shard, rows in by_shard.items():
        rows.sort(key=lambda r: r.tok_offset)
        # contiguous token stream: each offset = previous offset + n_tok
        off = 0
        for r in rows:
            assert r.tok_offset == off
            assert r.seq_id == off // 64
            off += r.n_tok
