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
    # realistic default n=8: only a verbatim multi-token quote overlaps
    bench_text = " ".join(f"w{i}" for i in range(20))  # 13 distinct 8-grams
    rows = [
        (0, bench_text),                        # doc_id % 53 == 0 → benchmark
        (1, bench_text + " extra tail words"),  # quotes all 13 → flagged
        (2, " ".join(f"z{i}" for i in range(20))),  # disjoint → clean
        # shares a few words but no 8-token run → clean at n=8
        (3, "w0 w1 w2 unrelated w5 w6 w7 filler w9 w10 w11 pad w13 w14"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    got = {r.doc_id: r.n_overlap for r in C.decontaminate(docs).collect()}
    assert got == {1: 13}  # benchmark itself never flagged; partial overlap clean


def test_with_contamination_injects_deterministic_quotes(spark):
    docs = spark.createDataFrame(
        [(i, " ".join(f"d{i}t{j}" for j in range(20))) for i in range(120)],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r.text for r in C._with_contamination(docs).collect()}
    base = {r.doc_id: r.text for r in docs.collect()}
    # doc 10: 10 % 7 == 3, b_key = (10 % 10) * 53 = 0 → quotes doc 0
    assert out[10] == base[10] + " " + " ".join(base[0].split()[:16])
    # doc 31: 31 % 7 == 3, b_key = (31 % 10) * 53 = 53 → quotes doc 53
    assert out[31] == base[31] + " " + " ".join(base[53].split()[:16])
    # non-selected docs unchanged
    assert out[11] == base[11]
    # injected docs get flagged at n=8 (16-token quote → 9 shared 8-grams)
    flagged = {r.doc_id for r in C.decontaminate(C._with_contamination(docs)).collect()}
    assert 10 in flagged and 31 in flagged and 11 not in flagged


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


def test_pack_sequences_doc_spans_boundary(spark):
    # n_tok (30) > budget (8): every doc necessarily spans >= 4 sequences
    docs = spark.createDataFrame(
        [(i, "word " * 30) for i in range(6)], "doc_id bigint, text string"
    )
    rows = C.pack_sequences(docs, budget=8, n_shards=2).collect()
    assert rows
    for r in rows:
        assert r.end_seq_id == (r.tok_offset + max(r.n_tok, 1) - 1) // 8
        assert r.n_seqs == r.end_seq_id - r.seq_id + 1
        assert r.n_seqs >= 4  # 30 tokens over 8-token sequences
    # the manifest explodes exactly the occupied range, per doc
    man = C.pack_manifest(docs, budget=8, n_shards=2).collect()
    by_doc = {}
    for m in man:
        by_doc.setdefault(m.doc_id, set()).add(m.seq_id)
    for r in rows:
        assert by_doc[r.doc_id] == set(range(r.seq_id, r.end_seq_id + 1))
    # within a shard the occupied sequences tile the stream: no gaps
    for shard in (0, 1):
        seqs = {m.seq_id for m in man if m.shard == shard}
        if seqs:
            assert seqs == set(range(0, max(seqs) + 1))


def test_pack_sequences_empty_doc_occupies_one_sequence(spark):
    docs = spark.createDataFrame(
        [(1, "a b c"), (2, ""), (3, "d e")], "doc_id bigint, text string"
    )
    rows = {r.doc_id: r for r in C.pack_sequences(docs, budget=4, n_shards=1).collect()}
    assert rows[2].n_tok == 0
    assert rows[2].n_seqs == 1
    assert rows[2].end_seq_id == rows[2].seq_id


def test_repetition_stats_flags_self_repeating_doc(spark):
    from newocr_spark.analytics.textstats import repetition_stats

    docs = spark.createDataFrame(
        [
            (1, "spam " * 20),                                  # one token repeated
            (2, " ".join(f"u{i}" for i in range(20))),          # all-unique
            (3, "buy now " * 10),                               # repeated bigram
            (4, "x"),                                           # single token: no bigrams
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in repetition_stats(docs).collect()}
    assert out[1].top_tok_frac == 1.0 and not out[1].keep
    assert out[2].dup_tok_frac == 0.0 and out[2].keep
    assert out[3].top_bigram_frac > 0.4 and not out[3].keep
    assert out[4].top_bigram_frac == 0.0 and out[4].dup_bigram_frac == 0.0


def test_bucketed_packing_splits_only_oversized_docs(spark):
    """On a long-doc fixture the contiguous stream splits whichever docs
    straddle boundaries, while the length-bucketed layout splits ONLY
    docs longer than the budget — the trade pack_efficiency reports."""
    from newocr_spark.analytics.curation import (
        pack_bucketed,
        pack_efficiency,
        pack_sequences,
    )

    budget = 64
    # letter-only words: the BPE-ish pre-tokenizer splits letter/digit
    # runs, so "w0" would count as TWO tokens
    word = "tok"
    rows = (
        # 40 docs of 48 tokens: straddle boundaries in a contiguous
        # stream (48 does not divide 64) but pack 1-per-seq bucketed
        [(i, " ".join(word for _ in range(48))) for i in range(40)]
        # 3 oversized docs (150 tokens > budget): split in BOTH modes
        + [(100 + i, " ".join(word for _ in range(150))) for i in range(3)]
    )
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    cont = pack_sequences(docs, budget=budget, n_shards=4)
    buck = pack_bucketed(docs, budget=budget, n_shards=4)
    n_split_cont = cont.filter("n_seqs > 1").count()
    n_split_buck = buck.filter("n_seqs > 1").count()
    assert n_split_buck == 3  # exactly the oversized docs
    assert n_split_cont > n_split_buck  # the stream splits normal docs too
    # bucketed seq ids are dense, non-overlapping per shard: every
    # sequence holds at most floor(budget / n_tok) docs
    from pyspark.sql import functions as F

    occupancy = (
        buck.filter("n_tok <= 64")
        .select("shard", F.explode(F.sequence("seq_id", "end_seq_id")).alias("s"))
        .groupBy("shard", "s")
        .count()
    )
    assert occupancy.filter(F.col("count") > 64 // 48).count() == 0

    eff = {r.mode: r for r in pack_efficiency(docs, budget=budget, n_shards=4).collect()}
    assert eff["contiguous"].n_split_docs == n_split_cont
    assert eff["bucketed"].n_split_docs == 3
    # contiguous is denser (zero padding except stream tails); bucketed
    # pays padding for its no-split guarantee
    assert eff["contiguous"].efficiency >= eff["bucketed"].efficiency
    assert eff["bucketed"].efficiency > 0.5


def test_pasted_paragraph_flips_keep_only_under_char_fractions(spark):
    """The Gopher duplicate-n-gram CHARACTER rules catch long-range
    self-copy the count-based gates can't: a 20-token paragraph pasted 3x
    inside 240 unique filler tokens keeps top_tok/top_bigram/dup_bigram
    under their thresholds (the paste is a tiny share of COUNTS) while its
    duplicate 5..10-grams own a large share of the doc's CHARACTERS."""
    from newocr_spark.analytics.textstats import (
        REP_DUP_BIGRAM_MAX,
        REP_DUP_NGRAM_MAX,
        REP_TOP_BIGRAM_MAX,
        REP_TOP_TOK_MAX,
        repetition_stats,
    )

    para = " ".join(f"paragraph{i}" for i in range(20))
    filler = " ".join(f"filler{i}" for i in range(240))
    pasted = f"{para} {filler} {para} {para}"
    docs = spark.createDataFrame(
        [(1, pasted), (2, filler)], "doc_id bigint, text string"
    )
    out = {r.doc_id: r for r in repetition_stats(docs).collect()}
    r = out[1]
    # every pre-battery gate passes individually...
    assert r.top_tok_frac <= REP_TOP_TOK_MAX
    assert r.top_bigram_frac <= REP_TOP_BIGRAM_MAX
    assert r.dup_bigram_frac <= REP_DUP_BIGRAM_MAX
    # ...but the pasted paragraph owns most of the doc through its
    # duplicate long n-grams, and only the char-fraction rules see it
    assert r.dup_5gram_char_frac > REP_DUP_NGRAM_MAX[5]
    assert r.dup_10gram_char_frac > REP_DUP_NGRAM_MAX[10]
    assert not r.keep
    assert out[2].keep and out[2].dup_5gram_char_frac == 0.0


def test_crossdoc_substrings_coverage(spark):
    """ExactSubstr-style cross-doc duplicated-substring coverage (Lee et
    al. 2022): a boilerplate paragraph pasted into several otherwise-unique
    docs is flagged with exact interval-union token coverage; document-level
    dedup would keep every one of these docs."""
    from newocr_spark.analytics.textstats import crossdoc_substrings

    boiler = " ".join(f"b{i}" for i in range(10))  # 10-token boilerplate
    docs = spark.createDataFrame(
        [
            (1, boiler + " " + " ".join(f"x{i}" for i in range(10))),
            (2, " ".join(f"y{i}" for i in range(10)) + " " + boiler),
            (3, " ".join(f"z{i}" for i in range(30))),   # unique
            (4, "tiny doc"),                             # < window tokens
            (5, boiler + " tail"),                       # shares boiler too
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in crossdoc_substrings(docs, window=8).collect()}
    # boilerplate is 10 tokens -> 3 windows of 8, all shared across docs
    # 1/2/5; interval union covers exactly the 10 boilerplate tokens
    for d in (1, 2, 5):
        assert out[d].n_dup_windows == 3, out[d]
        assert out[d].dup_tokens == 10, out[d]
    assert out[1].n_tok == 20 and out[1].dup_token_frac == 0.5 and out[1].keep
    assert out[2].dup_token_frac == 0.5 and out[2].keep
    # doc 5 is 11 tokens: 10/11 duplicated -> gated out at max_frac 0.5
    assert out[5].n_tok == 11 and not out[5].keep
    assert out[3].n_dup_windows == 0 and out[3].dup_tokens == 0 and out[3].keep
    assert out[4].n_windows == 0 and out[4].dup_token_frac == 0.0 and out[4].keep


def test_crossdoc_substrings_linear_in_copies(spark):
    """Window rows are linear in corpus size: B exact copies contribute B
    window rows each, never B^2 candidates — the gate has no pairwise term
    (unlike the pairs-producing dedup family), so duplicate-heavy corpora
    cannot blow it up."""
    from newocr_spark.analytics.textstats import crossdoc_substrings

    page = " ".join(f"w{i}" for i in range(12))
    docs = spark.createDataFrame(
        [(i, page) for i in range(50)], "doc_id bigint, text string"
    )
    out = crossdoc_substrings(docs, window=8).collect()
    assert len(out) == 50
    assert all(r.dup_tokens == 12 and r.dup_token_frac == 1.0 and not r.keep
               for r in out)


def test_crossdoc_cut_keeps_one_canonical_copy(spark):
    """crossdoc_cut removes duplicated spans from every doc EXCEPT the
    canonical owner (min doc_id) — Lee et al. 2022's actual ExactSubstr
    treatment, vs the gate's whole-doc drop."""
    from newocr_spark.analytics.textstats import crossdoc_cut

    boiler = " ".join(f"b{i}" for i in range(10))
    u1 = " ".join(f"x{i}" for i in range(10))
    u2 = " ".join(f"y{i}" for i in range(10))
    docs = spark.createDataFrame(
        [
            (1, f"{boiler} {u1}"),      # canonical owner (min doc_id)
            (2, f"{u2} {boiler}"),      # loses the boilerplate
            (3, boiler),                # duplicated in full -> cut to empty
            (4, "short doc"),           # untouched
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in crossdoc_cut(docs, window=8).collect()}
    assert out[1].clean_text == f"{boiler} {u1}" and out[1].n_cut == 0
    assert out[1].kept_copy
    assert out[2].clean_text == u2 and out[2].n_cut == 10
    assert not out[2].kept_copy
    assert out[3].clean_text == "" and out[3].n_cut == 10
    assert out[4].clean_text == "short doc" and out[4].n_cut == 0
    # corpus-wide: exactly one copy of the boilerplate text survives
    survivors = [r.clean_text for r in out.values() if boiler in r.clean_text]
    assert len(survivors) == 1


def test_crossdoc_cut_overlapping_owners_never_lose_all_copies(spark):
    """Regression (review finding): per-window ownership with naive
    interval-union cutting deletes EVERY copy when duplicated spans with
    different owners overlap — doc 1 owns gram B but is a non-owner of the
    overlapping gram A, so a naive cut removes its protected copy while
    doc 2's copy of B is cut because doc 1 'owns' it. The owner-protected
    sweep must keep doc 1's occurrence of B intact."""
    from newocr_spark.analytics.textstats import crossdoc_cut

    a = [f"a{i}" for i in range(1, 9)]          # gram A = a1..a8
    b = [f"b{i}" for i in range(1, 5)]
    docs = spark.createDataFrame(
        [
            (0, " ".join(a)),                    # owns A
            (1, " ".join(a + b)),                # owns B = a5..a8 b1..b4
            (2, " ".join(a[4:] + b)),            # non-owner of B
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in crossdoc_cut(docs, window=8).collect()}
    # doc 0: canonical copy of A survives verbatim
    assert out[0].clean_text == " ".join(a) and out[0].n_cut == 0
    # doc 1: only the A-prefix outside its owned B-occurrence is cut —
    # its canonical copy of B (a5..a8 b1..b4) survives
    assert out[1].clean_text == " ".join(a[4:] + b), out[1]
    assert out[1].n_cut == 4 and out[1].kept_copy
    # doc 2: pure non-owner duplicate of B — cut to nothing
    assert out[2].clean_text == "" and out[2].n_cut == 8
    # corpus-wide: both duplicated grams survive somewhere
    survivors = " || ".join(r.clean_text for r in out.values())
    assert " ".join(a) in survivors and " ".join(a[4:] + b) in survivors


def test_crossdoc_cut_passes_untouched_docs_verbatim(spark):
    """Docs the cut never touches keep their original whitespace exactly
    (no token-rejoin normalization); only cut docs are rebuilt."""
    from newocr_spark.analytics.textstats import crossdoc_cut

    boiler = " ".join(f"b{i}" for i in range(10))
    weird = "para1\n\npara2\t tabbed   runs"
    docs = spark.createDataFrame(
        [
            (1, f"{boiler} one"),
            (2, f"{boiler} two"),
            (3, weird),
            (4, ""),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in crossdoc_cut(docs, window=8).collect()}
    assert out[3].clean_text == weird and out[3].n_cut == 0
    assert out[4].clean_text == "" and out[4].n_cut == 0
    assert out[1].n_cut == 0 and out[1].kept_copy      # owner keeps verbatim
    assert out[1].clean_text == f"{boiler} one"
    assert out[2].n_cut == 10 and out[2].clean_text == "two"


def test_c4_clean_line_rules(spark):
    """Each C4 line rule in isolation: terminal punctuation, minimum word
    count, and the javascript blocklist (Raffel et al. 2020 §2.2)."""
    from newocr_spark.analytics.curation import c4_clean

    good = "alpha beta gamma delta epsilon zeta."
    docs = spark.createDataFrame(
        [
            (1, f"{good}\nno terminal punctuation here at all\n"
                f"short line.\nenable JavaScript to proceed now please.\n"
                f"second good sentence stays right here!\n"
                f"third good sentence stays right here?"),
        ],
        "doc_id bigint, text string",
    )
    r = c4_clean(docs).collect()[0]
    assert r.n_lines == 6 and r.n_kept == 3
    assert r.clean_text.splitlines() == [
        good,
        "second good sentence stays right here!",
        "third good sentence stays right here?",
    ]
    assert r.n_sentences == 3 and r.keep


def test_c4_clean_page_rules(spark):
    """Page-level drops: < 3 sentences, curly brace, lorem ipsum, and the
    blocklist term — each checked on the raw text, not the cleaned text."""
    from newocr_spark.analytics.curation import c4_clean

    s = "a perfectly fine kept sentence here"
    three = f"{s} one.\n{s} two.\n{s} three."
    docs = spark.createDataFrame(
        [
            (1, three),
            (2, f"{s} one.\n{s} two."),                  # only 2 sentences
            (3, f"{three}\nfunction f() {{ return 1 }}"),  # code brace
            (4, f"{three}\nLOREM IPSUM dolor sit amet now."),
            (5, f"{three}\nthis mentions unsafeword in passing."),
        ],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in c4_clean(docs).collect()}
    assert out[1].keep
    assert not out[2].keep and out[2].n_sentences == 2
    assert not out[3].keep          # brace is a raw-text check
    assert not out[4].keep          # case-insensitive lorem ipsum
    assert not out[5].keep          # blocklist term
    # the poison lines themselves never reach clean_text unless they pass
    # the line rules — doc 3's brace line lacks terminal punctuation
    assert "{" not in out[3].clean_text


def test_c4_clean_empty_and_short_docs(spark):
    from newocr_spark.analytics.curation import c4_clean

    docs = spark.createDataFrame(
        [(1, ""), (2, "one two."), (3, "x")],
        "doc_id bigint, text string",
    )
    out = {r.doc_id: r for r in c4_clean(docs).collect()}
    for r in out.values():
        assert r.n_kept == 0 and not r.keep and r.clean_text == ""


def test_chunk_windows_overlap_and_trailing_coverage(spark):
    from newocr_spark.analytics.curation import chunk_windows

    words = [f"w{i}" for i in range(100)]
    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id bigint, text string"
    )
    out = sorted(
        chunk_windows(docs, window=64, stride=48).collect(),
        key=lambda r: r.chunk_id,
    )
    # ceil((100-64)/48) = 1 extra chunk -> 2 chunks at starts 0 and 48
    assert [r.tok_start for r in out] == [0, 48]
    assert out[0].chunk_text.split() == words[:64] and out[0].n_tok == 64
    # the last chunk is shorter but covers through the final token
    assert out[1].chunk_text.split() == words[48:] and out[1].n_tok == 52
    # overlap region: stride < window means 16 tokens appear in both
    assert set(out[0].chunk_text.split()) & set(out[1].chunk_text.split()) \
        == set(words[48:64])


def test_chunk_windows_short_doc_single_chunk(spark):
    from newocr_spark.analytics.curation import chunk_windows

    docs = spark.createDataFrame(
        [(1, "a b c"), (2, "")], "doc_id bigint, text string"
    )
    out = {(r.doc_id, r.chunk_id): r for r in chunk_windows(docs).collect()}
    assert len(out) == 2
    assert out[(1, 0)].chunk_text == "a b c" and out[(1, 0)].n_tok == 3
    assert out[(2, 0)].chunk_text == "" and out[(2, 0)].n_tok == 1


def test_chunk_windows_rejects_bad_stride(spark):
    import pytest as _pytest

    from newocr_spark.analytics.curation import chunk_windows

    docs = spark.createDataFrame([(1, "a")], "doc_id bigint, text string")
    with _pytest.raises(ValueError):
        chunk_windows(docs, window=8, stride=9)
    with _pytest.raises(ValueError):
        chunk_windows(docs, window=8, stride=0)


def _gq_row(spark, text, doc_id=1):
    from newocr_spark.analytics.textstats import gopher_quality

    docs = spark.createDataFrame([(doc_id, text)], "doc_id bigint, text string")
    return gopher_quality(docs).collect()[0]


def test_gopher_quality_each_rule_in_isolation(spark):
    """Each Gopher table-A1 quality rule (Rae et al. 2021) flips exactly
    its own gate on a page built to violate only that rule."""
    # 60 alpha words incl. two required stop words -> passes everything
    base = " ".join(["alpha", "beta", "gamma", "delta"] * 14 + ["of", "and"]) 
    r = _gq_row(spark, base)
    assert r.keep and r.n_words == 58 and r.ok_word_count
    # word count below 50
    r = _gq_row(spark, "of and " + " ".join(["word"] * 10))
    assert not r.ok_word_count and r.ok_mean_word_len and not r.keep
    # mean word length below 3 (single-char spam)
    r = _gq_row(spark, base + " " + " ".join(["x"] * 120))
    assert not r.ok_mean_word_len and r.ok_word_count and not r.keep
    # symbol-to-word ratio: 10 hashes against 58 words > 0.1
    r = _gq_row(spark, base + " " + " ".join(["#"] * 10))
    assert not r.ok_symbol_ratio and not r.keep
    # ellipsis occurrences count toward the symbol ratio too
    r = _gq_row(spark, base + " " + " ".join(["..."] * 10))
    assert not r.ok_symbol_ratio
    # bullet lines >= 90%: every line bulleted
    bulleted = "\n".join(f"- {base}" for _ in range(5))
    r = _gq_row(spark, bulleted)
    assert not r.ok_bullet_lines and not r.keep
    # one bullet line of five is fine
    r = _gq_row(spark, "\n".join([base, f"- {base}", base, base, base]))
    assert r.ok_bullet_lines and r.keep
    # ellipsis-ended lines >= 30%: two of five
    r = _gq_row(spark, "\n".join([base + "...", base, base + "...", base, base]))
    assert not r.ok_ellipsis_lines and not r.keep
    # alpha-word fraction < 80%: 20 numeric words against 58
    r = _gq_row(spark, base + " " + " ".join(["12345"] * 20))
    assert not r.ok_alpha_words and not r.keep
    # fewer than 2 required stop words
    r = _gq_row(spark, " ".join(["alpha", "beta", "gamma", "delta"] * 15))
    assert not r.ok_stopwords and r.req_stopwords == 0 and not r.keep


def test_gopher_quality_integer_gate_boundaries(spark):
    """The published thresholds hold with exact integer arithmetic at the
    boundary: exactly 50 words passes (>=), exactly 0.1 symbol ratio
    passes (<=), exactly 80% alpha passes (>=), exactly 30% ellipsis
    lines and exactly 90% bullet lines fail (strict <)."""
    w48 = " ".join(["word"] * 48)  # + of/and = 50 words
    r = _gq_row(spark, f"of and {w48}")
    assert r.ok_word_count and r.n_words == 50
    # 6 hashes on 54 base words: 60 words total, ratio exactly 0.1 -> pass
    r = _gq_row(spark, f"of and {w48} word word word word "
                + " ".join(["#"] * 6))
    assert r.n_words == 60 and r.ok_symbol_ratio
    # 7 hashes on 63 words total: 70 > 63 -> fail
    r = _gq_row(spark, f"of and {w48} word word word word "
                + " ".join(["#"] * 7) + " word word")
    assert r.n_words == 63 and not r.ok_symbol_ratio
    # exactly 80% alpha: 40 alpha + 10 numeric = 50 words -> pass (>=)
    r = _gq_row(spark, "of and " + " ".join(["word"] * 38)
                + " " + " ".join(["12345"] * 10))
    assert r.n_words == 50 and r.ok_alpha_words
    # 39 alpha of 50 -> fail
    r = _gq_row(spark, "of and " + " ".join(["word"] * 37)
                + " " + " ".join(["12345"] * 11))
    assert r.n_words == 50 and not r.ok_alpha_words
    # exactly 30% ellipsis-ended lines (3 of 10) -> fail (strict <)
    line = f"of and {w48}"
    r = _gq_row(spark, "\n".join([line + "..."] * 3 + [line] * 7))
    assert r.n_lines == 10 and not r.ok_ellipsis_lines
    r = _gq_row(spark, "\n".join([line + "..."] * 2 + [line] * 8))
    assert r.ok_ellipsis_lines
    # exactly 90% bullet lines (9 of 10) -> fail (strict <)
    r = _gq_row(spark, "\n".join([f"- {line}"] * 9 + [line]))
    assert not r.ok_bullet_lines
    r = _gq_row(spark, "\n".join([f"- {line}"] * 8 + [line] * 2))
    assert r.ok_bullet_lines


def test_gopher_page_synthesis_classes_fire_expected_rules(spark):
    """The deterministic page synthesis sends each doc_id%53 class to
    exactly its intended violation at corpus level (sf0.001)."""
    from newocr_spark.analytics.textstats import (
        _with_gopher_page,
        gopher_quality,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = gopher_quality(_with_gopher_page(docs)).toPandas()
    cls = out.doc_id % 53
    assert not out[cls == 1].ok_bullet_lines.any()
    assert not out[cls == 2].ok_ellipsis_lines.any()
    assert not out[cls == 3].ok_symbol_ratio.any()
    assert out[cls == 3].ok_alpha_words.all()  # '#' spam stays >= 80% alpha
    assert not out[cls == 4].ok_alpha_words.any()
    assert not out[cls == 5].ok_stopwords.any()
    assert not out[cls == 6].ok_word_count.any()
    assert not out[cls == 7].ok_mean_word_len.any()
    normal = out[~cls.isin(range(1, 8))]
    assert normal.keep.all() and len(normal) > 0


def test_line_dedup_owner_keeps_copy_others_cut(spark):
    """CCNet line dedup (Wenzek et al. 2020 §4.1): a banner in >= 2
    distinct docs is removed everywhere EXCEPT the minimum doc_id; unique
    lines and empty lines always survive; a line repeated twice within
    the owner doc passes through verbatim (ownership is per-doc)."""
    from newocr_spark.analytics.curation import line_dedup

    banner = "Subscribe to our newsletter today"
    rows = [
        (1, f"unique alpha one\n{banner}\n{banner}\nunique alpha two"),
        (2, f"unique beta one\n{banner}\nunique beta two"),
        (3, f"{banner}\nunique gamma"),
        (4, "nothing shared here\n\nafter an empty line"),
        (5, "nothing shared here either"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in line_dedup(docs).collect()}
    # owner (doc 1) keeps BOTH copies verbatim
    assert out[1].clean_text == rows[0][1]
    assert out[1].n_removed == 0
    # non-owners lose the banner, keep everything else in order
    assert out[2].clean_text == "unique beta one\nunique beta two"
    assert out[2].n_removed == 1
    assert out[3].clean_text == "unique gamma"
    assert out[3].n_removed == 1 and out[3].frac_removed == 0.5
    # empty lines and unique lines untouched
    assert out[4].clean_text == rows[3][1] and out[4].n_removed == 0
    assert out[5].clean_text == rows[4][1]


def test_line_dedup_normalization_and_full_cut(spark):
    """Matching is on the NORMALIZED line (lower + trim + whitespace
    collapse), and a doc that is nothing but someone else's boilerplate
    cuts to the empty string rather than disappearing."""
    from newocr_spark.analytics.curation import line_dedup

    rows = [
        (10, "Cookie   Notice Applies\nreal content ten"),
        (11, "  cookie notice APPLIES  "),
        (12, "other real content"),
    ]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    out = {r.doc_id: r for r in line_dedup(docs).collect()}
    assert out[10].n_removed == 0  # owner despite different surface form
    assert out[11].clean_text == "" and out[11].n_removed == 1
    assert out[11].frac_removed == 1.0
    assert out[12].n_removed == 0


def test_decon_report_attributes_leak_to_the_right_bench_doc(spark):
    """Attribution must name the exact benchmark doc whose quote leaked:
    the injection plants bench doc (doc_id%10)*53's first 16 tokens into
    docs with doc_id%7==3, so every reported (doc_id, bench_id) pair must
    satisfy that arithmetic, agree with decontaminate's flag set, and
    carry n_overlap >= 3."""
    from newocr_spark.analytics.curation import (
        _with_contamination, decon_report, decontaminate,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    injected = _with_contamination(docs)
    rep = decon_report(injected).collect()
    assert len(rep) > 0
    by_doc = {}
    for r in rep:
        assert r.bench_id % 53 == 0  # attribution targets bench docs only
        assert r.n_overlap >= 3
        by_doc.setdefault(r.doc_id, set()).add(r.bench_id)
    # every INJECTED doc's attribution includes its true planted source
    # (the corpus also contains natural near-dups of bench docs — e.g.
    # doc 50 ~ doc 0 — which are legitimately flagged and attributed, so
    # the report is a superset keyed by real shingle overlap, and its
    # doc set must equal decontaminate's flag set exactly)
    injected_flagged = [d for d in by_doc if d % 7 == 3]
    assert injected_flagged
    for d in injected_flagged:
        assert (d % 10) * 53 in by_doc[d]
    flagged = {r.doc_id for r in decontaminate(injected).collect()}
    assert set(by_doc) == flagged
