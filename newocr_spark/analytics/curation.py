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

from .dedup import H60_SQL, _h60, _shingles, shingles_sql
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
    counts plus the scrubbed text (emails first: their local parts can
    contain digit runs the other patterns would double-count)."""
    n = lambda pat: F.size(F.regexp_extract_all(F.col("text"), F.lit(pat), F.lit(0)))
    scrubbed = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("text"), F.lit(EMAIL_RE), F.lit("<EMAIL>")),
            F.lit(PHONE_RE), F.lit("<PHONE>"),
        ),
        F.lit(IPV4_RE), F.lit("<IP>"),
    )
    return docs.select(
        "doc_id",
        n(EMAIL_RE).alias("n_emails"),
        n(PHONE_RE).alias("n_phones"),
        n(IPV4_RE).alias("n_ips"),
        scrubbed.alias("clean_text"),
    )


def pii_scrub_sql() -> str:
    synth = (
        "text || ' contact user' || CAST(doc_id AS VARCHAR) || "
        "'@mail.example.com or 555-' || "
        "lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || "
        "' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.7'"
    )
    return f"""
    WITH injected AS (SELECT doc_id, {synth} AS text FROM documents)
    SELECT doc_id,
           len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
           len(regexp_extract_all(text, '{PHONE_RE}')) AS n_phones,
           len(regexp_extract_all(text, '{IPV4_RE}')) AS n_ips,
           regexp_replace(
             regexp_replace(
               regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
               '{PHONE_RE}', '<PHONE>', 'g'),
             '{IPV4_RE}', '<IP>', 'g') AS clean_text
    FROM injected
    """


def decontaminate(
    docs: DataFrame, n: int = 2, min_overlap: int = 3, bench_mod: int = 53
) -> DataFrame:
    """Benchmark decontamination: flag training docs sharing >= min_overlap
    distinct n-gram shingles with a benchmark/eval set (here the
    deterministic slice doc_id % bench_mod == 0 stands in for the eval
    suite). 100 TB shape: the benchmark shingle set is SMALL by definition
    (eval suites are thousands of docs) → distinct + broadcast; the corpus
    side is one narrow shingle map + a broadcast semi-join + one count
    aggregate — the corpus never self-joins and never shuffles its text."""
    is_bench = F.pmod(F.col("doc_id"), F.lit(bench_mod)) == 0
    bench_sh = (
        _shingles(docs.filter(is_bench), n).select("shingle").distinct()
    )
    train_sh = _shingles(docs.filter(~is_bench), n)
    hits = train_sh.join(F.broadcast(bench_sh), "shingle")
    return (
        hits.groupBy("doc_id")
        .agg(F.count("*").alias("n_overlap"))  # shingles are distinct per doc
        .filter(F.col("n_overlap") >= min_overlap)
        .select("doc_id", "n_overlap")
    )


def decontaminate_sql(n: int = 2, min_overlap: int = 3, bench_mod: int = 53) -> str:
    return f"""
    WITH sh AS ({shingles_sql(n)}),
    bench AS (SELECT DISTINCT shingle FROM sh WHERE doc_id % {bench_mod} = 0),
    train AS (SELECT * FROM sh WHERE doc_id % {bench_mod} != 0)
    SELECT t.doc_id, count(*) AS n_overlap
    FROM train t JOIN bench b ON b.shingle = t.shingle
    GROUP BY t.doc_id
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
    stream per shard (deterministic hash order) and assign each doc the
    fixed-size training sequence its first token lands in.

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
    return base.select(
        "doc_id", "shard", "n_tok",
        F.coalesce(F.sum("n_tok").over(w), F.lit(0)).alias("tok_offset"),
    ).select(
        "doc_id", "shard", "n_tok", "tok_offset",
        F.floor(F.col("tok_offset") / budget).cast("long").alias("seq_id"),
    )


def pack_sequences_sql(budget: int = 512, n_shards: int = 8) -> str:
    h = H60_SQL.format(x="CAST(doc_id AS VARCHAR)")
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
             COALESCE(SUM(n_tok) OVER (
               PARTITION BY shard ORDER BY h, doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS tok_offset
      FROM base
    )
    SELECT doc_id, shard, n_tok, tok_offset,
           CAST(floor(tok_offset / {budget}) AS BIGINT) AS seq_id
    FROM packed
    """
