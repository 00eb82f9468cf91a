"""Corpus-curation operators a large-scale training-data pipeline needs
beyond dedup/quality: PII scrubbing, benchmark decontamination,
deterministic stratified sampling, and training-sequence packing.

All four are Spark-first: narrow JVM regexp maps where possible, one
bounded broadcast join for decontamination, one shuffle-by-shard window
for packing. Every operator has a DuckDB oracle (queries.py) built from
the same shared primitives the dedup family uses (H60_SQL md5-hash,
shingles_sql, the BPE-ish pre-tokenizer) so results are bit-comparable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import H60_SQL, TOKENS_SQL, _h60, _shingles, _tokens, shingles_sql
from .textstats import BPE_ISH

# Shared Java-regex ∩ RE2 subset (no backrefs, no lookaround) so the Spark
# plan and the DuckDB oracle run the LITERAL same patterns.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE = r"\b\d{3}[- ]\d{4}\b"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def _with_pii(docs: DataFrame) -> DataFrame:
    """Deterministically inject PII into the synthetic corpus (it contains
    none): the injected text is a pure function of (doc_id, text), so the
    oracle reconstructs the identical input in SQL."""
    return docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"), F.col("doc_id").cast("string"),
            F.lit("@mail.example.com or 555-"),
            F.lpad(F.pmod(F.col("doc_id"), F.lit(10000)).cast("string"), 4, "0"),
            F.lit(" from 10.0."),
            F.pmod(F.col("doc_id"), F.lit(256)).cast("string"),
            F.lit(".7"),
        ).alias("text"),
    )


def pii_scrub(docs: DataFrame) -> DataFrame:
    """Redact emails, phone-like numbers and IPv4s — one narrow JVM
    regexp map per doc, no shuffle, no Python. Returns per-doc redaction
    counts plus the scrubbed text.

    Counts are PROGRESSIVE: emails are counted on the raw text, phones on
    the email-scrubbed text, IPs on the email+phone-scrubbed text — each
    count equals the number of placeholders its replace actually inserts
    (a digit run inside an email's local part can look phone-shaped but is
    swallowed by <EMAIL>, so counting every pattern on the raw text could
    report more matches than placeholders). The oracle mirrors the same
    staging."""
    n = lambda t, pat: F.size(F.regexp_extract_all(t, F.lit(pat), F.lit(0)))
    t0 = F.col("text")
    t1 = F.regexp_replace(t0, F.lit(EMAIL_RE), F.lit("<EMAIL>"))
    t2 = F.regexp_replace(t1, F.lit(PHONE_RE), F.lit("<PHONE>"))
    t3 = F.regexp_replace(t2, F.lit(IPV4_RE), F.lit("<IP>"))
    return docs.select(
        "doc_id",
        n(t0, EMAIL_RE).alias("n_emails"),
        n(t1, PHONE_RE).alias("n_phones"),
        n(t2, IPV4_RE).alias("n_ips"),
        t3.alias("clean_text"),
    )


def pii_scrub_sql() -> str:
    synth = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
        "'@mail.example.com or 555-' || "
        "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || "
        "' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'"
    )
    return f"""
    WITH injected AS (SELECT doc_id, {synth} AS text FROM documents),
    s1 AS (
      SELECT doc_id, text AS t0,
             regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g') AS t1
      FROM injected
    ),
    s2 AS (
      SELECT doc_id, t0, t1,
             regexp_replace(t1, '{PHONE_RE}', '<PHONE>', 'g') AS t2
      FROM s1
    )
    SELECT doc_id,
           len(regexp_extract_all(t0, '{EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(t1, '{PHONE_RE}')) AS n_phones,
           len(regexp_extract_all(t2, '{IPV4_RE}')) AS n_ips,
           regexp_replace(t2, '{IPV4_RE}', '<IP>', 'g') AS clean_text
    FROM s2
    """


def _with_contamination(
    docs: DataFrame,
    bench_mod: int = 53,
    quote_tokens: int = 16,
    inject_mod: int = 7,
    inject_rem: int = 3,
) -> DataFrame:
    """Deterministically inject benchmark leakage into the synthetic corpus
    for the decontamination contract query: docs with
    ``doc_id % inject_mod == inject_rem`` get the first ``quote_tokens``
    tokens of a deterministically chosen benchmark doc
    (``doc_id % 10 * bench_mod``) appended verbatim — the literal
    train-on-eval contamination the operator exists to catch. The synthetic
    corpus's ~30-word vocabulary makes NATURAL 8-gram overlap essentially
    zero (measured: 0 docs at sf0.01), so without injection a realistic-n
    contract query would certify an empty result. Pure function of
    (doc_id, corpus): the oracle reconstructs the identical input in SQL."""
    bench = docs.filter(F.pmod(F.col("doc_id"), F.lit(bench_mod)) == 0).select(
        F.col("doc_id").alias("b_id"),
        F.array_join(F.slice(_tokens(F.col("text")), 1, quote_tokens), " ").alias(
            "quote"
        ),
    )
    keyed = docs.select(
        "doc_id", "text",
        (F.pmod(F.col("doc_id"), F.lit(10)) * bench_mod).alias("b_key"),
    )
    inject = (F.pmod(F.col("doc_id"), F.lit(inject_mod)) == inject_rem) & F.col(
        "quote"
    ).isNotNull()
    return (
        keyed.join(F.broadcast(bench), F.col("b_key") == F.col("b_id"), "left")
        .select(
            "doc_id",
            F.when(inject, F.concat_ws(" ", F.col("text"), F.col("quote")))
            .otherwise(F.col("text"))
            .alias("text"),
        )
    )


def contamination_sql(
    bench_mod: int = 53,
    quote_tokens: int = 16,
    inject_mod: int = 7,
    inject_rem: int = 3,
) -> str:
    """DuckDB mirror of `_with_contamination` (yields (doc_id, text))."""
    return f"""
    SELECT d.doc_id,
           CASE WHEN d.doc_id % {inject_mod} = {inject_rem}
                     AND q.quote IS NOT NULL
                THEN d.text || ' ' || q.quote ELSE d.text END AS text
    FROM documents d
    LEFT JOIN (
      SELECT doc_id AS b_id,
             array_to_string(({TOKENS_SQL})[1:{quote_tokens}], ' ') AS quote
      FROM documents WHERE doc_id % {bench_mod} = 0
    ) q ON q.b_id = (d.doc_id % 10) * {bench_mod}
    """


def decontaminate(
    docs: DataFrame,
    n: int = 8,
    min_overlap: int = 3,
    bench_mod: int = 53,
    bench_docs: DataFrame | None = None,
) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing >= min_overlap
    distinct n-gram shingles with a benchmark/eval set (here the
    deterministic slice doc_id % bench_mod == 0 stands in for the eval
    suite).

    The default is 8-gram shingles: published decontamination practice uses
    long exact n-grams (GPT-3's appendix C uses 13-grams; the Llama/PaLM
    reports use 8-10-gram overlap) because short shingles flag everything —
    on any real corpus nearly every bigram of an eval doc occurs somewhere
    in training data, so n=2 reduces the stage to "drop most of the
    corpus". n stays a parameter for corpus-specific tuning.

    ``bench_docs`` is the frame the benchmark slice is CUT FROM
    (default: ``docs`` itself). Pass the ORIGINAL pre-dedup corpus here
    whenever ``docs`` has already been deduplicated: near-dup resolution
    keeps the minimum doc_id per cluster, so a training doc that
    duplicates an eval doc can ABSORB it — the eval doc vanishes from
    the post-dedup frame, its shingles vanish from the bench set, and
    the contaminated training doc sails through. Building the bench set
    from the pre-dedup frame closes that whitewashing hole.

    100 TB shape: the benchmark shingle set is SMALL by definition (eval
    suites are thousands of docs) → distinct + broadcast; the corpus side
    is one narrow shingle map + a broadcast semi-join + one count
    aggregate — the corpus never self-joins and never shuffles its text."""
    is_bench = F.pmod(F.col("doc_id"), F.lit(bench_mod)) == 0
    bench_src = bench_docs if bench_docs is not None else docs
    bench_sh = (
        _shingles(bench_src.filter(is_bench), n)
        .select("shingle").distinct()
    )
    train_sh = _shingles(docs.filter(~is_bench), n)
    hits = train_sh.join(F.broadcast(bench_sh), "shingle")
    return (
        hits.groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))  # shingles are distinct per doc
        .filter(F.col("n_overlap") >= min_overlap)
        .select("doc_id", "n_overlap")
    )


def decontaminate_sql(
    n: int = 8,
    min_overlap: int = 3,
    bench_mod: int = 53,
    contaminated: bool = False,
) -> str:
    """Oracle; contaminated=True runs over the `_with_contamination`
    reconstruction (the registered contract query's input)."""
    if contaminated:
        pre = f"injected AS ({contamination_sql(bench_mod)}), "
        src = "injected"
    else:
        pre, src = "", "documents"
    return f"""
    WITH {pre}sh AS ({shingles_sql(n, src)}),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {bench_mod} = 0),
    train AS (SELECT * FROM sh WHERE doc_id % {bench_mod} != 0)
    SELECT t.doc_id, count(*) AS n_overlap
    FROM train t JOIN bench b ON b.shingle = t.shingle
    GROUP BY t.doc_id
    HAVING count(*) >= {min_overlap}
    """


def decon_report(
    docs: DataFrame, n: int = 8, min_overlap: int = 3, bench_mod: int = 53
) -> DataFrame:
    """Decontamination ATTRIBUTION: per (training doc, benchmark doc)
    pair, how many distinct n-gram shingles they share — the report an
    eval owner actually reads ("which eval items leaked, and where")
    before deciding whether a hit is verbatim leakage or a shared
    idiom. `decontaminate` answers "drop this doc?"; this answers "drop
    WHY" — published contamination studies (GPT-3 appendix C, the
    PaLM/Llama overlap analyses) report exactly this per-benchmark
    breakdown.

    Output: (doc_id, bench_id, n_overlap) with n_overlap >= min_overlap
    — n_overlap counts DISTINCT shared shingles per pair (each side's
    shingle set is already distinct, so the pair join yields one row per
    shared shingle). The per-PAIR threshold is stricter than
    `decontaminate`'s per-doc total: a doc spreading its overlap thinly
    across many bench docs can be flagged there yet have no single pair
    reach min_overlap here — by design (attribution answers "which eval
    doc", and a sub-threshold pair is not evidence against any one).

    100 TB shape: identical to `decontaminate` — the benchmark side now
    carries (bench_id, shingle) instead of bare shingles, still small by
    definition (eval suites), still distinct + broadcast; the corpus side
    is the same narrow shingle map + broadcast equi-join, never a
    self-join. The only growth is the per-pair aggregate key (doc_id,
    bench_id), bounded by hits x eval size."""
    is_bench = F.pmod(F.col("doc_id"), F.lit(bench_mod)) == 0
    bench_sh = (
        _shingles(docs.filter(is_bench), n)
        .select(F.col("doc_id").alias("bench_id"), "shingle")
        .distinct()
    )
    train_sh = _shingles(docs.filter(~is_bench), n)
    return (
        train_sh.join(F.broadcast(bench_sh), "shingle")
        .groupBy("doc_id", "bench_id")
        .agg(F.count("*").alias("n_overlap"))
        .filter(F.col("n_overlap") >= min_overlap)
        .select("doc_id", "bench_id", "n_overlap")
    )


def decon_report_sql(
    n: int = 8,
    min_overlap: int = 3,
    bench_mod: int = 53,
    contaminated: bool = False,
) -> str:
    """Oracle; contaminated=True runs over the `_with_contamination`
    reconstruction (the registered contract query's input)."""
    if contaminated:
        pre = f"injected AS ({contamination_sql(bench_mod)}), "
        src = "injected"
    else:
        pre, src = "", "documents"
    return f"""
    WITH {pre}sh AS ({shingles_sql(n, src)}),
    bench AS (SELECT DISTINCT doc_id AS bench_id, shingle FROM sh
              WHERE doc_id % {bench_mod} = 0),
    train AS (SELECT * FROM sh WHERE doc_id % {bench_mod} != 0)
    SELECT t.doc_id, b.bench_id, count(*) AS n_overlap
    FROM train t JOIN bench b ON b.shingle = t.shingle
    GROUP BY t.doc_id, b.bench_id
    HAVING count(*) >= {min_overlap}
    """


# per-language keep rates for the sampling demo (the mechanism, not the
# policy: a real pipeline reads these from a config/dim table)
SAMPLE_RATES = {"en": 1.0, "de": 0.5, "es": 0.25, "fr": 0.25, "zh": 0.1}
SAMPLE_DEFAULT = 0.05


def stratified_sample(docs: DataFrame) -> DataFrame:
    """Deterministic per-language downsampling — the data-mixing step of a
    pre-training pipeline. Keep decision = md5-derived hash bucket of the
    doc_id against the language's rate: reproducible across runs/clusters
    (no RNG state), uniform within stratum, and a pure narrow filter —
    Catalyst pushes it into the scan; nothing shuffles."""
    rate = F.lit(SAMPLE_DEFAULT)
    for lang, r in sorted(SAMPLE_RATES.items()):
        rate = F.when(F.col("lang") == lang, F.lit(r)).otherwise(rate)
    bucket = F.pmod(_h60(F.col("doc_id").cast("string")), F.lit(1000))
    return (
        docs.select("doc_id", "lang", bucket.alias("bucket"), rate.alias("rate"))
        .filter(F.col("bucket") < F.col("rate") * 1000)
        .select("doc_id", "lang", "bucket")
    )


def stratified_sample_sql() -> str:
    cases = " ".join(
        f"WHEN '{lang}' THEN {r}" for lang, r in sorted(SAMPLE_RATES.items())
    )
    h = H60_SQL.format(x="CAST(doc_id AS VARCHAR)")
    return f"""
    WITH rated AS (
      SELECT doc_id, lang,
             {h} % 1000 AS bucket,
             CASE lang {cases} ELSE {SAMPLE_DEFAULT} END AS rate
      FROM documents
    )
    SELECT doc_id, lang, bucket FROM rated WHERE bucket < rate * 1000
    """


def pack_sequences(
    docs: DataFrame, budget: int = 512, n_shards: int = 8
) -> DataFrame:
    """Training-sequence packing: lay the corpus out as a contiguous token
    stream per shard (deterministic hash order) and report, per doc, the
    fixed-size training sequences it occupies:

      seq_id      — sequence holding the doc's FIRST token
      end_seq_id  — sequence holding the doc's LAST token (== seq_id when
                    the doc fits inside one sequence; a doc with
                    n_tok > budget necessarily spans several)
      n_seqs      — end_seq_id - seq_id + 1

    An empty doc (n_tok == 0) occupies the single sequence its offset
    lands in. `pack_manifest` explodes this into one row per (doc,
    sequence) for consumers that need the reverse mapping (what fills
    sequence k).

    100 TB shape: ONE shuffle (by shard) + one within-shard running-sum
    window; shard count scales with the cluster, the window never sees
    more than a shard. Token counts are the BPE-ish pre-tokenizer's — a
    narrow JVM regexp, computed before the shuffle so only (doc_id,
    n_tok) rides the exchange."""
    from pyspark.sql import Window

    h = _h60(F.col("doc_id").cast("string"))
    base = docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH), F.lit(0))).alias(
            "n_tok"
        ),
        F.pmod(h, F.lit(n_shards)).alias("shard"),
        h.alias("h"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    packed = base.select(
        "doc_id", "shard", "n_tok",
        F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("tok_offset"),
    )
    last_tok = F.col("tok_offset") + F.greatest(F.col("n_tok"), F.lit(1)) - 1
    return packed.select(
        "doc_id", "shard", "n_tok", "tok_offset",
        F.floor(F.col("tok_offset") / budget).cast("long").alias("seq_id"),
        F.floor(last_tok / budget).cast("long").alias("end_seq_id"),
    ).withColumn("n_seqs", F.col("end_seq_id") - F.col("seq_id") + 1)


def pack_sequences_sql(budget: int = 512, n_shards: int = 8) -> str:
    h = H60_SQL.format(x="CAST(doc_id AS VARCHAR)")
    # CASTs: DuckDB's windowed SUM returns HUGEINT and its floor() a
    # DOUBLE — both must be pinned to BIGINT to hash-match Spark's longs
    # (same class of fix as lag_arith in round 1).
    return f"""
    WITH base AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '{BPE_ISH}')) AS n_tok,
             {h} % {n_shards} AS shard,
             {h} AS h
      FROM documents
    ),
    packed AS (
      SELECT doc_id, shard, n_tok,
             CAST(COALESCE(SUM(n_tok) OVER (
               PARTITION BY shard ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS tok_offset
      FROM base
    ),
    spans AS (
      SELECT doc_id, shard, n_tok, tok_offset,
             CAST(floor(tok_offset / {budget}) AS BIGINT) AS seq_id,
             CAST(floor((tok_offset + greatest(n_tok, 1) - 1) / {budget})
                  AS BIGINT) AS end_seq_id
      FROM packed
    )
    SELECT doc_id, shard, n_tok, tok_offset, seq_id, end_seq_id,
           end_seq_id - seq_id + 1 AS n_seqs
    FROM spans
    """


def pack_manifest(
    docs: DataFrame, budget: int = 512, n_shards: int = 8
) -> DataFrame:
    """Packed-sequence manifest: one row per (doc, occupied sequence) —
    the reverse mapping of `pack_sequences` ("what fills sequence k"), the
    layout a training loader actually consumes. The explode fans each doc
    to its n_seqs sequences (almost always 1), so the output is barely
    larger than the input and no extra shuffle is added."""
    packed = pack_sequences(docs, budget, n_shards)
    return packed.select(
        "doc_id", "shard",
        F.explode(F.sequence(F.col("seq_id"), F.col("end_seq_id"))).alias("seq_id"),
    )


def pack_manifest_sql(budget: int = 512, n_shards: int = 8) -> str:
    return f"""
    WITH packed AS ({pack_sequences_sql(budget, n_shards)})
    SELECT doc_id, shard,
           UNNEST(generate_series(seq_id, end_seq_id)) AS seq_id
    FROM packed
    """


def pack_bucketed(
    docs: DataFrame, budget: int = 512, n_shards: int = 8
) -> DataFrame:
    """Length-aware NO-SPLIT packing — the layout loaders prefer when
    split-rate matters more than padding: within a shard, docs of equal
    token count share sequences (floor(budget / n_tok) docs per
    sequence, deterministic hash order), so no document crosses a
    sequence boundary; only docs LONGER than the budget split, into
    dedicated runs of ceil(n_tok / budget) sequences. The contiguous
    stream (`pack_sequences`) stays the default and the densest (its
    padding is zero but it splits any doc straddling a boundary);
    `pack_efficiency` reports both sides of that trade per mode.

    100 TB shape: the same ONE shuffle by shard as the contiguous mode,
    plus a per-(shard, length) row_number window and a per-shard
    prefix-sum over the DISTINCT slot list (slots ≈ sequences, far
    fewer rows than docs); only (doc_id, n_tok) ever rides an exchange.

    Output mirrors pack_sequences: (doc_id, shard, n_tok, seq_id,
    end_seq_id, n_seqs) — seq ids are per-shard, dense, non-overlapping."""
    from pyspark.sql import Window

    h = _h60(F.col("doc_id").cast("string"))
    base = docs.select(
        "doc_id",
        F.size(F.regexp_extract_all(F.col("text"), F.lit(BPE_ISH), F.lit(0))).alias(
            "n_tok"
        ),
        F.pmod(h, F.lit(n_shards)).alias("shard"),
        h.alias("h"),
    ).withColumn("eff", F.greatest(F.col("n_tok"), F.lit(1)))
    w_rn = Window.partitionBy("shard", "eff").orderBy("h", "doc_id")
    k = F.floor(F.lit(budget) / F.col("eff"))  # docs per sequence (eff <= budget)
    is_over = F.col("eff") > budget
    d = base.withColumn("rn", F.row_number().over(w_rn)).select(
        "doc_id", "shard", "n_tok", "eff",
        F.when(is_over, F.col("rn") - 1)
        .otherwise(F.floor((F.col("rn") - 1) / k))
        .cast("long")
        .alias("slot_idx"),
        F.when(is_over, F.ceil(F.col("eff") / F.lit(budget)))
        .otherwise(F.lit(1))
        .cast("long")
        .alias("width"),
    )
    slots = d.select("shard", "eff", "slot_idx", "width").distinct()
    w_slot = (
        Window.partitionBy("shard")
        .orderBy("eff", "slot_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    slot_base = slots.withColumn(
        "seq_base", F.coalesce(F.sum("width").over(w_slot), F.lit(0))
    ).drop("width")
    return (
        d.join(slot_base, ["shard", "eff", "slot_idx"])
        .select(
            "doc_id", "shard", "n_tok",
            F.col("seq_base").cast("long").alias("seq_id"),
            (F.col("seq_base") + F.col("width") - 1).cast("long").alias("end_seq_id"),
            F.col("width").alias("n_seqs"),
        )
    )


def pack_bucketed_sql(budget: int = 512, n_shards: int = 8) -> str:
    h = H60_SQL.format(x="CAST(doc_id AS VARCHAR)")
    return f"""
    WITH base AS (
      SELECT doc_id,
             len(regexp_extract_all(text, '{BPE_ISH}')) AS n_tok,
             {h} % {n_shards} AS shard,
             {h} AS h,
             greatest(len(regexp_extract_all(text, '{BPE_ISH}')), 1) AS eff
      FROM documents
    ),
    rn AS (
      SELECT *, row_number() OVER (PARTITION BY shard, eff ORDER BY h, doc_id)
             AS rn
      FROM base
    ),
    d AS (
      SELECT doc_id, shard, n_tok, eff,
             CAST(CASE WHEN eff > {budget} THEN rn - 1
                       ELSE floor((rn - 1) / floor({budget} * 1.0 / eff)) END
                  AS BIGINT) AS slot_idx,
             CAST(CASE WHEN eff > {budget} THEN ceil(eff * 1.0 / {budget})
                       ELSE 1 END AS BIGINT) AS width
      FROM rn
    ),
    slots AS (SELECT DISTINCT shard, eff, slot_idx, width FROM d),
    sb AS (
      SELECT shard, eff, slot_idx, width,
             CAST(COALESCE(SUM(width) OVER (
               PARTITION BY shard ORDER BY eff, slot_idx
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS BIGINT) AS seq_base
      FROM slots
    )
    SELECT d.doc_id, d.shard, d.n_tok,
           sb.seq_base AS seq_id,
           sb.seq_base + sb.width - 1 AS end_seq_id,
           sb.width AS n_seqs
    FROM d
    JOIN sb ON sb.shard = d.shard AND sb.eff = d.eff
           AND sb.slot_idx = d.slot_idx
    """


def pack_efficiency(
    docs: DataFrame, budget: int = 512, n_shards: int = 8
) -> DataFrame:
    """Packing-layout scorecard: one row per mode with the two numbers a
    training-loader owner actually trades off — sequence budget
    utilization (tokens / (budget x sequences)) and split-rate (docs
    crossing a sequence boundary). The contiguous stream is maximally
    dense but splits boundary-straddling docs; the length-bucketed
    layout splits only docs longer than the budget, paying padding.

    (mode, n_docs, n_tokens, n_seqs, n_split_docs, efficiency)"""
    out = None
    for mode, layout in (
        ("contiguous", pack_sequences(docs, budget, n_shards)),
        ("bucketed", pack_bucketed(docs, budget, n_shards)),
    ):
        per_shard = layout.groupBy("shard").agg(
            (F.max("end_seq_id") + 1).alias("shard_seqs")
        )
        seqs = per_shard.agg(F.sum("shard_seqs").alias("n_seqs"))
        stats = layout.agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum(F.when(F.col("n_seqs") > 1, 1).otherwise(0)).alias(
                "n_split_docs"
            ),
        )
        row = stats.crossJoin(seqs).select(
            F.lit(mode).alias("mode"),
            "n_docs", "n_tokens", "n_seqs", "n_split_docs",
            F.round(
                F.col("n_tokens") / (F.lit(budget) * F.col("n_seqs")), 6
            ).alias("efficiency"),
        )
        out = row if out is None else out.unionByName(row)
    return out


def pack_efficiency_sql(budget: int = 512, n_shards: int = 8) -> str:
    def mode_sql(mode: str, layout_sql: str) -> str:
        return f"""
        SELECT '{mode}' AS mode,
               CAST(count(*) AS BIGINT) AS n_docs,
               CAST(sum(n_tok) AS BIGINT) AS n_tokens,
               (SELECT CAST(sum(ms + 1) AS BIGINT)
                FROM (SELECT shard, max(end_seq_id) AS ms
                      FROM ({layout_sql}) GROUP BY shard)) AS n_seqs,
               CAST(sum(CASE WHEN n_seqs > 1 THEN 1 ELSE 0 END) AS BIGINT)
                 AS n_split_docs,
               round(sum(n_tok) * 1.0 /
                     ({budget} * (SELECT sum(ms + 1)
                                  FROM (SELECT shard, max(end_seq_id) AS ms
                                        FROM ({layout_sql}) GROUP BY shard))),
                     6) AS efficiency
        FROM ({layout_sql})
        """

    return (
        mode_sql("contiguous", pack_sequences_sql(budget, n_shards))
        + " UNION ALL "
        + mode_sql("bucketed", pack_bucketed_sql(budget, n_shards))
    )


def dsir_weights(
    docs: DataFrame,
    target_lang: str = "en",
    k_buckets: int = 1024,
    select_num: int = 1,
    select_den: int = 4,
) -> DataFrame:
    """DSIR-style data selection via importance resampling (Xie et al.
    2023, "Data Selection for Language Models via Importance Resampling"):
    score every raw document by how much more likely its hashed n-gram
    features are under a TARGET distribution than under the raw-corpus
    distribution, then keep the top select_num/select_den fraction by
    log-importance weight. The target model here is fit on the corpus's
    own `lang == target_lang` slice (at production scale it would be fit
    on a separate high-quality corpus — the predicate is the only coupling
    and the two model frames are plain bucket histograms either way).

    Features are the paper's hashed n-grams: unigrams + bigrams of
    lowercased whitespace tokens, bucketed by md5-derived h60 % k_buckets.
    Both bag-of-buckets models use add-1 smoothing over the k buckets, so

        logweight(d) = sum_b c_d[b] * (ln p_t[b] - ln p_r[b])
                     = sum_b c_d[b] * (ln(c_t[b]+1) - ln(c_r[b]+1))
                       + n_grams(d) * (ln(R+k) - ln(T+k)).

    Selection replaces the paper's Gumbel-noise sampling with the exact
    deterministic rank rule this repo's quality_buckets uses: a doc is
    selected iff strictly fewer than num/den of all docs score ABOVE its
    (6-dp rounded) logweight — ties share fate, no RNG state, and the
    whole decision is reproducible in pure SQL.

    Output: (doc_id, n_grams, logweight, selected).

    100 TB shape: grams never travel un-reduced — they hash-aggregate to
    (doc_id, bucket) counts immediately (per-doc key space is bounded by
    k_buckets, and md5 bucketing spreads the shuffle evenly no matter how
    skewed the vocabulary is); both model frames are <= k_buckets rows and
    broadcast; the corpus totals ride a single-row broadcast crossJoin;
    and the selection threshold comes from a (logweight, count) value
    histogram whose key space the 6-dp rounding bounds — the only ORDER BY
    window runs over distinct values, never over docs. No global sort, no
    quadratic anything. No reference analogue (NewOCR has no curation
    ops) — public-practice citation only."""
    toks = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    n = F.size(toks)
    bi = F.zip_with(
        F.slice(toks, 1, F.greatest(n - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(n - 1, F.lit(0))),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    grams = docs.select(
        "doc_id",
        (F.col("lang") == target_lang).alias("is_t"),
        F.explode(F.concat(toks, bi)).alias("gram"),
    ).select(
        "doc_id",
        "is_t",
        F.pmod(_h60(F.col("gram")), F.lit(k_buckets)).alias("bucket"),
    )
    # ONE reduced frame feeds every aggregate below (is_t is constant
    # per doc so it rides the (doc_id, bucket) key for free), and it
    # materializes ONCE at a checkpoint seam: raw/tgt/tots/lwf all
    # branch off it, and per-branch column pruning makes the optimized
    # subtrees differ, so exchange reuse alone cannot dedupe them — each
    # branch would re-run the tokenize+explode+hash corpus scan (the
    # dominant cost at crawl scale). The seam stores only the already-
    # reduced (doc_id, bucket, c, is_t) rows — <= k_buckets per doc —
    # reliably under a configured checkpoint dir (cluster case),
    # executor-locally otherwise (local/test sessions).
    from .dedup import stage_checkpoint

    db = stage_checkpoint(
        grams.groupBy("doc_id", "bucket").agg(
            F.count("*").alias("c"), F.max("is_t").alias("is_t")
        )
    )
    raw = db.groupBy("bucket").agg(F.sum("c").alias("c_r"))
    tgt = db.filter("is_t").groupBy("bucket").agg(
        F.sum("c").alias("c_t")
    )
    tots = db.agg(
        F.sum("c").alias("r_tot"),
        F.sum(F.when(F.col("is_t"), F.col("c")).otherwise(0)).alias("t_tot"),
    )
    model = raw.join(tgt, "bucket", "left").select(
        "bucket",
        (
            F.log(F.coalesce(F.col("c_t"), F.lit(0)) + F.lit(1))
            - F.log(F.col("c_r") + F.lit(1))
        ).alias("llr"),
    )
    lwf = (
        db.join(F.broadcast(model), "bucket")
        .groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_grams"),
            F.sum(F.col("c") * F.col("llr")).alias("s"),
        )
        .crossJoin(F.broadcast(tots))
        .select(
            "doc_id",
            "n_grams",
            F.round(
                F.col("s")
                + F.col("n_grams")
                * (
                    F.log(F.col("r_tot") + F.lit(k_buckets))
                    - F.log(F.col("t_tot") + F.lit(k_buckets))
                ),
                6,
            ).alias("logweight"),
        )
    )
    from .textstats import value_rank

    vals = lwf.groupBy("logweight").agg(F.count("*").alias("cnt"))
    tot = vals.agg(F.sum("cnt").alias("tot"))
    ranked = value_rank(vals, "logweight").crossJoin(F.broadcast(tot))
    return lwf.join(F.broadcast(ranked), "logweight").select(
        "doc_id",
        "n_grams",
        "logweight",
        (F.col("n_above") * F.lit(select_den) < F.col("tot") * F.lit(select_num)).alias(
            "selected"
        ),
    )


def chunk_windows(
    docs: DataFrame, window: int = 64, stride: int = 48
) -> DataFrame:
    """Sliding-window chunking: split each document's token stream into
    fixed-size windows with overlap (stride < window) — the standard
    retrieval/eval preprocessing step (RAG passage windows, BERT-style
    striding), and the within-doc complement to `pack_sequences` (which
    concatenates ACROSS docs; this splits WITHIN one).

    Chunk starts are 0, stride, 2*stride, ...; the last chunk starts at
    the final multiple of stride still inside the doc, so trailing tokens
    are never dropped (it may be shorter than `window`). A doc shorter
    than one window yields exactly one chunk; an empty doc yields one
    empty chunk (chunk_text '', n_tok counts the ''-token like the
    packing family does).

    Output: (doc_id, chunk_id, tok_start, n_tok, chunk_text).

    100 TB shape: one in-codegen projection — `transform(sequence(...))`
    builds every window as a token-array slice inside whole-stage codegen,
    then ONE posexplode generates chunk rows; no shuffle, no Python, no
    window function. Row count multiplies by ~n_tok/stride, which is the
    operator's contract (each chunk is a training/retrieval unit).
    No reference analogue (NewOCR has no curation ops) — public-practice
    citation only."""
    if not (0 < stride <= window):
        # stride > window would skip tokens between chunks; the
        # trailing-coverage invariant (last start + window >= n) needs it
        raise ValueError(f"stride must be in (0, window]: {stride}, {window}")
    toks = _tokens(F.col("text"))
    n = F.size(toks)
    # number of stride steps AFTER the first chunk: ceil((n-window)/stride)
    # clamped at 0 — integer arithmetic only, identical in both engines
    extra = F.greatest(
        F.lit(0),
        -F.floor(-(n - F.lit(window)) / F.lit(stride)).cast("int"),
    )
    chunks = F.transform(
        F.sequence(F.lit(0), extra),
        lambda i: F.array_join(
            F.slice(toks, i * stride + 1, window), " "
        ),
    )
    return docs.select(
        "doc_id", F.posexplode(chunks).alias("chunk_id", "chunk_text")
    ).select(
        "doc_id",
        F.col("chunk_id").cast("long").alias("chunk_id"),
        (F.col("chunk_id") * stride).cast("long").alias("tok_start"),
        F.size(F.split(F.col("chunk_text"), r"\s+")).cast("long").alias("n_tok"),
        "chunk_text",
    )


def chunk_windows_sql(window: int = 64, stride: int = 48) -> str:
    """Oracle: identical slicing in DuckDB (range() per doc replaces
    posexplode; same ceil-division chunk count, same list_slice)."""
    return f"""
    WITH t AS (
      SELECT doc_id, {TOKENS_SQL} AS toks FROM documents
    ),
    n AS (
      SELECT doc_id, toks,
             greatest(0, CAST(-floor((-(len(toks) - {window}))
                                     / {stride}.0) AS INT)) AS extra
      FROM t
    ),
    c AS (
      SELECT doc_id, unnest(range(0, extra + 1)) AS chunk_id, toks
      FROM n
    )
    SELECT doc_id,
           CAST(chunk_id AS BIGINT) AS chunk_id,
           CAST(chunk_id * {stride} AS BIGINT) AS tok_start,
           CAST(len(string_split_regex(
             array_to_string(list_slice(toks, chunk_id * {stride} + 1,
                                        chunk_id * {stride} + {window}), ' '),
             '\\s+')) AS BIGINT) AS n_tok,
           array_to_string(list_slice(toks, chunk_id * {stride} + 1,
                                      chunk_id * {stride} + {window}), ' ')
             AS chunk_text
    FROM c
    """


C4_MIN_WORDS = 5
C4_MIN_SENTENCES = 3
C4_BADWORDS = ("unsafeword",)  # stand-in blocklist; production swaps the list


def _with_page(docs: DataFrame) -> DataFrame:
    """Deterministically synthesize a multi-line web page from each doc
    (the synthetic corpus is single-line word soup with no punctuation, so
    the C4 line rules would be vacuous on it). Every line is a pure
    function of (doc_id, text), so the oracle reconstructs the identical
    page in SQL:

      l1  8 words + '.'            -> kept
      l2  3 words + '.'            -> dropped (< C4_MIN_WORDS)
      l3  8 words, '?' only when doc_id % 3 != 0 -> dropped for % 3 == 0
      l4  a 'please enable javascript' banner    -> dropped (blocklist)
      l5  8 words + '!'            -> kept
      l6  8 words + '.'            -> omitted when doc_id % 17 == 2, so
          those pages fail the 3-sentence page rule
      poison lines (page-level drops, raw-text checks):
          % 11 == 5 a '{'-brace css fragment, % 13 == 7 'Lorem ipsum ...',
          % 19 == 4 a C4_BADWORDS term."""
    toks = F.split(F.col("text"), " ")
    seg = lambda start, n: F.array_join(F.slice(toks, start, n), " ")
    did = F.col("doc_id")
    return docs.select(
        "doc_id",
        F.concat_ws(
            "\n",
            F.concat(seg(1, 8), F.lit(".")),
            F.concat(seg(9, 3), F.lit(".")),
            F.concat(
                seg(12, 8),
                F.when(did % 3 == 0, F.lit("")).otherwise(F.lit("?")),
            ),
            F.lit("Please enable javascript to continue reading this page."),
            F.concat(seg(20, 8), F.lit("!")),
            F.when(did % 17 == 2, F.lit(None)).otherwise(
                F.concat(seg(28, 8), F.lit("."))
            ),
            F.when(did % 11 == 5, F.lit("css template { margin: 0 }")),
            F.when(
                did % 13 == 7,
                F.lit("Lorem ipsum dolor sit amet consectetur adipiscing."),
            ),
            F.when(
                did % 19 == 4,
                F.lit(f"this page mentions {C4_BADWORDS[0]} explicitly."),
            ),
        ).alias("text"),
    )


def c4_clean(docs: DataFrame) -> DataFrame:
    """C4-style page cleaning (Raffel et al. 2020, "Exploring the Limits
    of Transfer Learning...", §2.2 — the public rule set behind the C4
    corpus): keep only lines that end in a terminal punctuation mark, have
    at least C4_MIN_WORDS words, and do not mention 'javascript'; drop the
    whole page when the CLEANED text has fewer than C4_MIN_SENTENCES
    sentences, or the RAW text contains a curly brace (code), the phrase
    'lorem ipsum' (placeholder boilerplate), or a blocklist term.

    Output: (doc_id, clean_text, n_lines, n_kept, n_sentences, keep).

    100 TB shape: one narrow in-codegen projection per doc — split /
    higher-order filter / array_join / regexp_count are all JVM
    expressions, so there is no shuffle, no Python, and nothing but the
    two needed columns in the scan. Filter composes BEFORE the dedup
    stages in a real pipeline (cheapest gate first). No reference analogue
    (NewOCR has no curation ops) — public-practice citation only."""

    def line_ok(l):
        t = F.trim(l)
        return (
            t.rlike(r'[.!?"]$')
            & (F.size(F.split(t, r"\s+")) >= C4_MIN_WORDS)
            & ~F.lower(t).contains("javascript")
        )

    lines = F.split(F.col("text"), "\n")
    kept = F.filter(lines, line_ok)
    clean = F.array_join(kept, "\n")
    low = F.lower(F.col("text"))
    bad = F.lit(False)
    for w in C4_BADWORDS:
        bad = bad | low.contains(w)
    return docs.select(
        "doc_id",
        clean.alias("clean_text"),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept"),
        F.regexp_count(clean, F.lit(r"[.!?]")).cast("long").alias("n_sentences"),
        (
            (F.regexp_count(clean, F.lit(r"[.!?]")) >= C4_MIN_SENTENCES)
            & ~F.col("text").contains("{")
            & ~low.contains("lorem ipsum")
            & ~bad
        ).alias("keep"),
    )


def _page_cte_sql() -> str:
    """The `_with_page` synthesis as DuckDB CTEs (`t`, `page`) — shared by
    every oracle that runs over the synthesized multi-line pages.

    coalesce: list_slice past the end of a short doc is NULL in DuckDB
    but an empty array in Spark's F.slice — both must render ''."""
    seg = lambda start, last: (
        f"coalesce(array_to_string(list_slice(toks, {start}, {last}), ' '), '')"
    )
    badword = C4_BADWORDS[0]
    return f"""
    t AS (
      SELECT doc_id, string_split(text, ' ') AS toks FROM documents
    ),
    page AS (
      SELECT doc_id,
             concat_ws(chr(10),
               {seg(1, 8)} || '.',
               {seg(9, 11)} || '.',
               {seg(12, 19)} ||
                 CASE WHEN doc_id % 3 = 0 THEN '' ELSE '?' END,
               'Please enable javascript to continue reading this page.',
               {seg(20, 27)} || '!',
               CASE WHEN doc_id % 17 = 2 THEN NULL
                    ELSE {seg(28, 35)} || '.' END,
               CASE WHEN doc_id % 11 = 5
                    THEN 'css template {{ margin: 0 }}' END,
               CASE WHEN doc_id % 13 = 7
                    THEN 'Lorem ipsum dolor sit amet consectetur adipiscing.'
                    END,
               CASE WHEN doc_id % 19 = 4
                    THEN 'this page mentions {badword} explicitly.' END
             ) AS text
      FROM t
    )"""


def c4_clean_sql() -> str:
    """Oracle: the identical page synthesis, line filter, and page rules
    in DuckDB (list_filter lambda mirrors the Spark higher-order filter;
    both engines run the LITERAL same RE2∩Java regexes)."""
    badword = C4_BADWORDS[0]
    return f"""
    WITH {_page_cte_sql()},
    f AS (
      SELECT doc_id, text,
             string_split(text, chr(10)) AS lines,
             list_filter(
               string_split(text, chr(10)),
               l -> regexp_matches(trim(l), '[.!?"]$')
                    AND len(string_split_regex(trim(l), '\\s+'))
                        >= {C4_MIN_WORDS}
                    AND NOT contains(lower(l), 'javascript')
             ) AS kept
      FROM page
    )
    SELECT doc_id,
           array_to_string(kept, chr(10)) AS clean_text,
           CAST(len(lines) AS BIGINT) AS n_lines,
           CAST(len(kept) AS BIGINT) AS n_kept,
           CAST(len(regexp_extract_all(array_to_string(kept, chr(10)),
                                       '[.!?]')) AS BIGINT) AS n_sentences,
           len(regexp_extract_all(array_to_string(kept, chr(10)), '[.!?]'))
               >= {C4_MIN_SENTENCES}
           AND NOT contains(text, '{{')
           AND NOT contains(lower(text), 'lorem ipsum')
           AND NOT contains(lower(text), '{badword}') AS keep
    FROM f
    """


def dsir_weights_sql(
    target_lang: str = "en",
    k_buckets: int = 1024,
    select_num: int = 1,
    select_den: int = 4,
) -> str:
    """Oracle: the identical hashed-bucket models and rank rule in DuckDB
    (same md5 h60, same add-1 smoothing, same 6-dp rounded value ranks)."""
    h = H60_SQL.format(x="gram")
    return f"""
    WITH t AS (
      SELECT doc_id, lang = '{target_lang}' AS is_t,
             string_split_regex(lower(trim(text)), '\\s+') AS toks
      FROM documents
    ),
    g AS (
      SELECT doc_id, is_t,
             unnest(list_concat(
               toks,
               list_transform(range(1, len(toks)),
                              i -> toks[i] || ' ' || toks[i + 1])
             )) AS gram
      FROM t
    ),
    b AS (SELECT doc_id, is_t, ({h}) % {k_buckets} AS bucket FROM g),
    db AS (SELECT doc_id, bucket, count(*) AS c FROM b GROUP BY 1, 2),
    raw AS (SELECT bucket, sum(c) AS c_r FROM db GROUP BY bucket),
    tgt AS (SELECT bucket, count(*) AS c_t FROM b WHERE is_t GROUP BY bucket),
    tots AS (SELECT count(*) AS r_tot,
                    sum(CASE WHEN is_t THEN 1 ELSE 0 END) AS t_tot FROM b),
    model AS (
      SELECT r.bucket, ln(coalesce(tg.c_t, 0) + 1) - ln(r.c_r + 1) AS llr
      FROM raw r LEFT JOIN tgt tg USING (bucket)
    ),
    lwf AS (
      SELECT db.doc_id, CAST(sum(db.c) AS BIGINT) AS n_grams,
             round(sum(db.c * m.llr)
                   + sum(db.c) * (ln(tots.r_tot + {k_buckets})
                                  - ln(tots.t_tot + {k_buckets})), 6)
               AS logweight
      FROM db JOIN model m USING (bucket), tots
      GROUP BY db.doc_id, tots.r_tot, tots.t_tot
    ),
    vals AS (SELECT logweight, count(*) AS cnt FROM lwf GROUP BY logweight),
    ranked AS (
      SELECT logweight,
             sum(cnt) OVER (ORDER BY logweight DESC
                            ROWS UNBOUNDED PRECEDING) - cnt AS n_above
      FROM vals
    ),
    tot AS (SELECT sum(cnt) AS tot FROM vals)
    SELECT lwf.doc_id, lwf.n_grams, lwf.logweight,
           r.n_above * {select_den} < t.tot * {select_num} AS selected
    FROM lwf JOIN ranked r USING (logweight), tot t
    """


LINE_DEDUP_MIN_DOCS = 2


def line_dedup(docs: DataFrame, min_docs: int = LINE_DEDUP_MIN_DOCS) -> DataFrame:
    """CCNet-style line-level corpus dedup (Wenzek et al. 2020, §4.1):
    a line (paragraph) whose normalized form appears in >= min_docs
    DISTINCT documents is boilerplate — navigation banners, cookie
    notices, footer legalese — and is removed from every document except
    one canonical copy (the minimum doc_id that carries it, keeping the
    corpus lossless the way `crossdoc_cut` keeps one owner per duplicated
    substring). CCNet reports this single stage removes ~70% of raw
    Common Crawl text, so it composes FIRST among the text-rewriting
    stages in a real pipeline (document-level dedup cannot see it: the
    surrounding unique text makes every page hash-distinct).

    Normalization is lower + trim + whitespace-collapse; empty lines are
    never dedup candidates. The same line twice in the OWNER doc stays
    intact (the owner's text passes through verbatim for those keys).

    Output: (doc_id, clean_text, n_lines, n_removed, frac_removed).

    100 TB shape: lines reduce in-codegen to xxhash64 longs, so the
    exploded frame carries (doc_id, pos, k64) — text NEVER rides an
    exchange. One (k64) hash-aggregate with map-side partials (distinct
    docs + min owner), one equi-join back (the duplicated-key side is the
    small one: boilerplate keys ≪ total lines), one (doc_id) aggregate
    collecting cut positions, and the rebuild is a JVM higher-order
    indexed filter over split(text) after an equi-join on doc_id — the
    crossdoc_cut exchange discipline. No pairwise term anywhere: B copies
    of a banner cost B exploded rows, never B² pairs."""
    norm = lambda l: F.regexp_replace(F.lower(F.trim(l)), r"\s+", " ")
    lines = F.split(F.col("text"), "\n")
    ex = docs.select(
        "doc_id", F.posexplode(lines).alias("pos", "line")
    ).select(
        "doc_id",
        "pos",
        F.xxhash64(norm(F.col("line"))).alias("k64"),
        (norm(F.col("line")) != "").alias("nonempty"),
    )
    keyed = ex.filter("nonempty").drop("nonempty")
    dup = (
        keyed.groupBy("k64")
        .agg(
            F.countDistinct("doc_id").alias("n_docs"),
            F.min("doc_id").alias("owner"),
        )
        .filter(F.col("n_docs") >= min_docs)
    )
    cuts = (
        keyed.join(dup, "k64")
        .filter(F.col("doc_id") != F.col("owner"))
        .groupBy("doc_id")
        .agg(F.sort_array(F.collect_set("pos")).alias("cut_pos"))
    )
    cut = F.coalesce(F.col("cut_pos"), F.array().cast("array<int>"))
    kept = F.filter(lines, lambda l, i: ~F.array_contains(cut, i))
    n_lines = F.size(lines)
    n_removed = F.size(cut)
    return (
        docs.join(cuts, "doc_id", "left")
        .select(
            "doc_id",
            F.array_join(kept, "\n").alias("clean_text"),
            n_lines.cast("long").alias("n_lines"),
            n_removed.cast("long").alias("n_removed"),
            F.round(n_removed / n_lines, 6).alias("frac_removed"),
        )
    )


def line_dedup_sql(min_docs: int = LINE_DEDUP_MIN_DOCS) -> str:
    """Oracle: the identical page synthesis, normalization, ownership and
    indexed-filter rebuild in DuckDB. The oracle groups on the normalized
    LINE STRING itself where Spark groups on its xxhash64 (transport
    optimization only) — output equality certifies the keying. DuckDB
    lambda indexes are 1-based (Spark's are 0-based); each engine's cut
    positions use its own convention, and positions never leave the
    engine."""
    return f"""
    WITH {_page_cte_sql()},
    f AS (SELECT doc_id, string_split(text, chr(10)) AS lines FROM page),
    ex AS (
      SELECT doc_id,
             unnest(range(1, len(lines) + 1)) AS pos,
             unnest(lines) AS line
      FROM f
    ),
    keyed AS (
      SELECT doc_id, pos,
             regexp_replace(lower(trim(line)), '\\s+', ' ', 'g') AS nl
      FROM ex
      WHERE regexp_replace(lower(trim(line)), '\\s+', ' ', 'g') <> ''
    ),
    dup AS (
      SELECT nl, min(doc_id) AS owner
      FROM keyed GROUP BY nl
      HAVING count(DISTINCT doc_id) >= {min_docs}
    ),
    cuts AS (
      SELECT k.doc_id, list_sort(list(DISTINCT k.pos)) AS cut_pos
      FROM keyed k JOIN dup d USING (nl)
      WHERE k.doc_id <> d.owner
      GROUP BY k.doc_id
    )
    SELECT f.doc_id,
           -- array_to_string of an EMPTY list is NULL in DuckDB but '' in
           -- Spark's array_join: coalesce the fully-cut-doc case
           coalesce(array_to_string(
             list_filter(f.lines,
               (l, i) -> NOT list_contains(
                 coalesce(c.cut_pos, CAST([] AS BIGINT[])), i)),
             chr(10)), '') AS clean_text,
           CAST(len(f.lines) AS BIGINT) AS n_lines,
           CAST(len(coalesce(c.cut_pos, CAST([] AS BIGINT[]))) AS BIGINT)
             AS n_removed,
           round(len(coalesce(c.cut_pos, CAST([] AS BIGINT[]))) * 1.0
                 / len(f.lines), 6) AS frac_removed
    FROM f LEFT JOIN cuts c USING (doc_id)
    """
