#!/usr/bin/env python
"""Cluster entry point: end-to-end training-corpus curation via
spark-submit.

  python scripts/package.py
  spark-submit --py-files dist/newocr_spark.zip jobs/curate_job.py \\
      --documents s3://bucket/documents --output s3://bucket/curated \\
      --benchmark-mod 53 --seq-budget 2048 --shards 4096

Pipeline (each stage is the registered contract operator, so the whole
job is declarative where the operator is, and shapes are the 100 TB ones
documented in analytics/curation.py / analytics/dedup.py):

  [--url-dedup] URL-level dedup at ingest (RefinedWeb, Penedo et al.
      2023 §3.2: URL dedup BEFORE content dedup): collapse re-crawls by
      canonical URL keeping the longest fetch, over the input's real
      ``url`` column — MinHash never sees N copies of one page.
  [--c4-gate] C4 heuristic cleaning FIRST (Raffel et al. 2020): line
      filter + page rules rewrite each doc's text and drop junk pages
      before anything else runs — the cheapest gate, and running it at
      ingest keeps every downstream signature (band index, shingles,
      fingerprints) consistent between history and future increments,
      which all pass the same deterministic cleaner. Opt-in: the rules
      assume web-page text with punctuation.
  [--gopher-gate] Gopher document-quality gate (Rae et al. 2021 table
      A1, the non-repetition half via textstats.gopher_quality): drop
      pages failing the published word-count / mean-word-length /
      symbol-ratio / bullet- and ellipsis-line / alpha-word /
      required-stop-word rules. Also one in-codegen projection — runs
      right after C4 so both cheap gates fire before any shuffle stage.
      Opt-in for the same reason C4 is: the rules assume natural-language
      web text.
  [incremental mode] gate the input against a persisted band-signature
      index (--band-index; dedup.incremental_neardup) — a daily crawl
      increment never re-LSHes history; docs colliding with any indexed
      band are near-dups of prior ingests and drop here. The bands of
      every doc admitted past ALL quality gates (computed on its
      original, pre-cut/pre-scrub text) union into the index at
      --write-band-index (must differ from --band-index: parquet can't
      overwrite its own input — an Iceberg store would append instead),
      making re-crawls idempotent across job runs; quality-rejected docs
      stay out of the index so their re-crawls re-gate on their own
      merits.
  → near-dup cluster resolution (MinHash-LSH → connected components;
      exact duplicates are collapsed by content hash BEFORE banding, so
      boilerplate-heavy crawls — 30-50% exact copies — never produce
      B^2 band candidates; --max-bucket-size additionally sidelines
      pathological buckets of distinct texts)
    → keep one doc per cluster (doc_id == cluster_id), all singletons
    → drop the benchmark slice itself AND training docs contaminated by
      it (broadcast shingle semi-join) — eval docs must never reach the
      packed training output
    → drop self-repeating docs (Gopher-style repetition gate; the rule
      cross-doc dedup can't express)
    → drop docs mostly made of cross-doc duplicated substrings
      (ExactSubstr-style windowed coverage, Lee et al. 2022 — boilerplate
      paragraphs pasted across otherwise-unique pages survive both the
      document-level dedup above and the within-doc gate); or, with
      --crossdoc-mode cut, remove the duplicated spans themselves and
      keep one canonical copy corpus-wide (the paper's actual treatment)
    → [--dsir-target-lang] DSIR importance selection (Xie et al. 2023):
      keep the top --dsir-keep fraction of surviving docs by hashed
      n-gram importance weight against the target-language slice —
      distribution-matching selection, run on the cleaned survivors'
      text before any rewriting stage touches it
    → PII scrub (narrow JVM regexp map)
    → per-language stratified sample (hash-bucket filter, no RNG state)
    → pack into fixed-budget training sequences (one shuffle by shard,
      one within-shard running-sum window; docs longer than the budget
      span end_seq_id/n_seqs sequences)
    → write parquet partitioned by shard

At 10^12-document scale: --shards sizes the packing shuffle (pick
shards >> executor count); set spark.sparkContext.setCheckpointDir so the
cluster-resolution rounds use RELIABLE checkpoints (dedup._iter_checkpoint
flips automatically when a dir is configured).
"""

from __future__ import annotations

import argparse


def _swap_text(kept, frame, text_col: str, count_col: str | None = None):
    """Swap ``kept``'s text for a rewrite stage's output column: join on
    doc_id, adopt ``text_col`` as the new text. With ``count_col``, docs
    the rewrite EMPTIED (count_col > 0 and blank text) drop while
    untouched docs (count_col == 0) pass verbatim — and docs that were
    already empty before the stage stay. One definition so the
    drop-on-empty rule cannot drift between the rewrite stages."""
    from pyspark.sql import functions as F

    joined = kept.join(frame, "doc_id")
    drop = ["text"]
    if count_col is not None:
        joined = joined.filter(
            (F.col(count_col) == 0)
            | (F.length(F.trim(text_col)) > 0)
        )
        drop.append(count_col)
    return joined.drop(*drop).withColumnRenamed(text_col, "text")


def main(argv: list[str] | None = None, spark=None) -> int:
    """Returns the curated doc count. ``argv``/``spark`` are injectable so
    the e2e test (tests/test_curate_job.py) can drive the exact
    spark-submit composition in-process; a real submit passes neither."""
    p = argparse.ArgumentParser()
    p.add_argument("--documents", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--dedup-threshold", type=float, default=0.5)
    p.add_argument("--max-bucket-size", type=int, default=None)
    p.add_argument("--benchmark-mod", type=int, default=53)
    p.add_argument("--decon-n", type=int, default=8)
    p.add_argument("--min-overlap", type=int, default=3)
    p.add_argument("--seq-budget", type=int, default=2048)
    p.add_argument("--shards", type=int, default=4096)
    p.add_argument("--no-repetition-gate", action="store_true")
    p.add_argument("--no-crossdoc-gate", action="store_true")
    p.add_argument("--crossdoc-max-frac", type=float, default=None)
    p.add_argument(
        "--crossdoc-mode", choices=("gate", "cut"), default="gate",
        help="gate: drop docs whose duplicated coverage exceeds the "
        "threshold; cut: remove the duplicated spans themselves, keeping "
        "at least one canonical copy corpus-wide (Lee et al. 2022 "
        "ExactSubstr treatment; owner-protected, so overlapping spans "
        "cannot delete every copy) and dropping docs cut to nothing. "
        "Note: docs the cut touches are whitespace-normalized by the "
        "token-boundary rebuild; untouched docs pass through verbatim",
    )
    p.add_argument(
        "--dsir-target-lang", default=None,
        help="enable DSIR importance selection (curation.dsir_weights) "
        "with this language's slice as the target distribution",
    )
    p.add_argument(
        "--dsir-keep", default="1/4",
        help="fraction of docs DSIR keeps, as NUM/DEN integers (rank rule "
        "is exact integer arithmetic; ties share fate)",
    )
    p.add_argument(
        "--url-dedup", action="store_true",
        help="collapse re-crawls by canonical URL FIRST (RefinedWeb "
        "§3.2 stage order: URL dedup before content dedup), keeping "
        "the longest fetch per canonical URL (web/extract.url_dedup_pages)"
        "; requires a 'url' column in the input table",
    )
    p.add_argument(
        "--c4-gate", action="store_true",
        help="run C4 heuristic cleaning (curation.c4_clean) before every "
        "other stage: junk pages drop, surviving pages keep only their "
        "clean lines (assumes web-page text with punctuation)",
    )
    p.add_argument(
        "--source-quota", type=int, default=None, metavar="K",
        help="cap each source at its K best docs by CCNet LM score "
        "(textstats.source_quota; ties share fate, so a tie straddling "
        "the cap admits the whole tie). Runs with the selection stages "
        "(after DSIR, before the text rewrites)",
    )
    p.add_argument(
        "--line-dedup", action="store_true",
        help="cut corpus-duplicated lines (CCNet-style, curation.line_dedup) "
        "from every surviving doc except each line's minimum-doc_id owner; "
        "docs cut to nothing drop. Runs after selection (it is corpus-"
        "state-dependent, so it must not feed signatures or DSIR weights) "
        "and before the PII scrub",
    )
    p.add_argument(
        "--gopher-gate", action="store_true",
        help="drop pages failing the Gopher table-A1 quality rules "
        "(textstats.gopher_quality) right after the C4 stage (assumes "
        "natural-language web text)",
    )
    p.add_argument("--checkpoint-dir", default=None)
    p.add_argument("--band-index", default=None)
    p.add_argument("--write-band-index", default=None)
    args = p.parse_args(argv)
    if args.crossdoc_mode == "cut" and args.crossdoc_max_frac is not None:
        raise SystemExit(
            "--crossdoc-max-frac applies to the drop gate only; "
            "--crossdoc-mode cut removes spans unconditionally "
            "(pass one or the other)"
        )
    try:
        dsir_num, dsir_den = (int(x) for x in args.dsir_keep.split("/"))
        if dsir_num <= 0 or dsir_den <= 0:
            raise ValueError
    except ValueError:
        raise SystemExit("--dsir-keep must be NUM/DEN positive integers")
    if args.write_band_index and args.write_band_index == args.band_index:
        raise SystemExit(
            "--write-band-index must differ from --band-index (parquet "
            "cannot overwrite its own input; an Iceberg store would append)"
        )
    # positive-value checks: ANSI mode off turns a zero divisor/modulus
    # into NULL, so --seq-budget 0 would write null seq ids and
    # --shards 0 a single __HIVE_DEFAULT_PARTITION__ — silent layout
    # corruption instead of an error
    if args.seq_budget <= 0:
        raise SystemExit("--seq-budget must be a positive token count")
    if args.shards <= 0:
        raise SystemExit("--shards must be positive")
    if args.source_quota is not None and args.source_quota <= 0:
        raise SystemExit(
            "--source-quota must be positive (0 would silently keep "
            "nothing from any source)"
        )

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    from newocr_spark.analytics import curation as C
    from newocr_spark.analytics.dedup import (
        band_index, dup_clusters, incremental_neardup, stage_checkpoint,
    )

    owns_session = spark is None
    if owns_session:
        spark = SparkSession.builder.appName("newocr-curate").getOrCreate()
    if args.checkpoint_dir:
        spark.sparkContext.setCheckpointDir(args.checkpoint_dir)

    docs = spark.read.parquet(args.documents)

    # pre-flight column checks: fail BEFORE the expensive dedup/gate
    # stages materialize (the eager stage checkpoint would otherwise run
    # hours of work and then die on an unresolved column in a late
    # selection stage)
    required = ["doc_id", "text", "lang"]  # lang: sample + output layout
    missing = [c for c in required if c not in docs.columns]
    if missing:
        raise SystemExit(f"input table is missing required columns {missing}")
    if args.source_quota is not None and "source" not in docs.columns:
        raise SystemExit(
            "--source-quota requires a 'source' column in the input table"
        )

    # -2. URL-level dedup at ingest (opt-in; RefinedWeb §3.2 order: URL
    # dedup BEFORE content dedup): collapse re-crawls by canonical URL,
    # keeping the longest fetch, so MinHash never sees N copies of one
    # page. Runs before even C4 — it needs no text semantics, and every
    # later stage (signatures, band index, DSIR) sees one fetch per page.
    if args.url_dedup:
        if "url" not in docs.columns:
            raise SystemExit(
                "--url-dedup requires a 'url' column in the input table"
            )
        from newocr_spark.web.extract import url_dedup_pages

        keep = url_dedup_pages(
            docs.select("doc_id", "url", F.length("text").alias("n_chars"))
        ).select(F.col("keep_doc_id").alias("doc_id"))
        docs = docs.join(keep, "doc_id", "semi")

    # -1. C4 cleaning first (opt-in): one in-codegen projection, so it is
    # the cheapest stage and everything downstream — including the band
    # index and future increments, which pass the same deterministic
    # cleaner — operates on consistently cleaned text.
    if args.c4_gate:
        c4 = C.c4_clean(docs).filter(F.col("keep")).select(
            "doc_id", F.col("clean_text").alias("_c4_text")
        )
        # no count_col: c4_clean's keep already dropped emptied pages
        docs = _swap_text(docs, c4, "_c4_text")

    # -0.5. Gopher quality gate (opt-in): the second in-codegen-only gate —
    # drop-only (no rewrite), so it composes with C4 in either order; both
    # run before anything that shuffles.
    if args.gopher_gate:
        from newocr_spark.analytics.textstats import gopher_quality

        bad = gopher_quality(docs).filter(~F.col("keep")).select("doc_id")
        docs = docs.join(bad, "doc_id", "left_anti")

    # 0. incremental mode: gate against the persisted band index — docs
    # near-duplicating PRIOR ingests drop before any heavy stage runs
    if args.band_index:
        seen = spark.read.parquet(args.band_index)
        admitted = (
            incremental_neardup(docs, seen)
            .filter(F.col("keep"))
            .select("doc_id")
        )
        docs = docs.join(admitted, "doc_id", "left_semi")

    # 1. near-dup clusters: drop every clustered doc except its canonical
    clusters = dup_clusters(
        docs,
        threshold=args.dedup_threshold,
        max_bucket_size=args.max_bucket_size,
    )
    drop_dups = clusters.filter(F.col("doc_id") != F.col("cluster_id")).select(
        "doc_id"
    )
    kept = docs.join(drop_dups, "doc_id", "left_anti")

    # 2. benchmark decontamination: drop the benchmark slice itself (eval
    # docs are not training data) and every training doc overlapping it.
    # --benchmark-mod 0 disables the stage. --decon-n defaults to the
    # realistic 8-gram setting (analytics/curation.py:decontaminate);
    # tune --min-overlap per corpus.
    if args.benchmark_mod > 0:
        # bench_docs = the PRE-dedup corpus: stage 1 keeps the minimum
        # doc_id per cluster, so a training doc that near-duplicates an
        # eval doc can absorb it out of `kept` — building the bench
        # shingle set from `kept` would then let the contaminated doc
        # through (the whitewashing hole); the pre-dedup frame can't lose
        # eval docs that way
        contaminated = C.decontaminate(
            kept,
            n=args.decon_n,
            min_overlap=args.min_overlap,
            bench_mod=args.benchmark_mod,
            bench_docs=docs,
        ).select("doc_id")
        kept = kept.filter(
            F.pmod(F.col("doc_id"), F.lit(args.benchmark_mod)) != 0
        ).join(contaminated, "doc_id", "left_anti")

    # 2b. within-doc repetition gate (Gopher-style): a self-repeating doc
    # is unique corpus-wide, so no dedup stage can catch it
    if not args.no_repetition_gate:
        from newocr_spark.analytics.textstats import repetition_stats

        reps = repetition_stats(kept).filter(~F.col("keep")).select("doc_id")
        kept = kept.join(reps, "doc_id", "left_anti")

    # 2c. cross-doc duplicated-substring gate (ExactSubstr-style, Lee et
    # al. 2022, arXiv:2107.06499): a boilerplate paragraph pasted into
    # thousands of otherwise-unique pages survives cluster resolution
    # (the docs are not near-dups of each other) and the within-doc gate
    # (nothing repeats inside any one doc); window-level coverage is the
    # rule that catches it. O(total tokens) — no pairwise term, so the
    # duplicate-heavy crawls the exact-collapse above protects against
    # cannot blow this stage up either.
    if not args.no_crossdoc_gate:
        if args.crossdoc_mode == "cut":
            from newocr_spark.analytics.textstats import crossdoc_cut

            cut = crossdoc_cut(kept).select(
                "doc_id", F.col("clean_text").alias("_xd_text"), "n_cut"
            )
            # untouched docs (n_cut == 0) pass their original text through
            # verbatim (crossdoc_cut only rebuilds docs it actually cut);
            # drop a doc only when the CUT emptied it — a doc that was
            # already empty stays, exactly as in gate mode
            kept = _swap_text(kept, cut, "_xd_text", "n_cut")
        else:
            from newocr_spark.analytics.textstats import (
                CROSSDOC_MAX_FRAC, crossdoc_substrings,
            )

            frac = (
                args.crossdoc_max_frac
                if args.crossdoc_max_frac is not None
                else CROSSDOC_MAX_FRAC
            )
            xd = (
                crossdoc_substrings(kept, max_frac=frac)
                .filter(~F.col("keep"))
                .select("doc_id")
            )
            kept = kept.join(xd, "doc_id", "left_anti")

    # Stage boundary: every gate above rebuilt `kept` by joining a frame
    # derived FROM `kept` back onto it, so the logical plan references the
    # prior stage's tree twice per gate — exponential plan growth the
    # driver pays at compile time (a 1 GiB driver heap dies here once the
    # selection stages below stack on top). Cut the lineage once so the
    # index write, DSIR, scrub, sample, and pack all plan against a flat
    # materialized scan; reliable checkpoint under --checkpoint-dir.
    kept = stage_checkpoint(kept)

    # 2d. the index covers the docs admitted PAST every quality gate:
    # future increments near-duplicating anything admitted here are
    # suppressed at stage 0, while quality-gated docs are genuinely left
    # out — their re-crawls re-gate cheaply on their own merits instead of
    # being suppressed by a rejected ancestor. Bands are computed on the
    # survivors' ORIGINAL text (semi-join back to the input): the crossdoc
    # cut and the PII scrub below rewrite text, but future increments
    # arrive as raw crawls and must collide with raw-text signatures.
    if args.write_band_index:
        cover = docs.join(kept.select("doc_id"), "doc_id", "left_semi")
        if args.benchmark_mod > 0:
            # eval pages never train, but their bands MUST be indexed:
            # a later increment's re-crawl of an eval page arrives under
            # a FRESH doc_id the id-mod filter cannot see, so without
            # indexed bands it would pass stage 0 and train — the
            # cross-run half of the "eval docs never reach the packed
            # output" invariant
            cover = cover.unionByName(
                docs.filter(
                    F.pmod(F.col("doc_id"), F.lit(args.benchmark_mod)) == 0
                )
            )
        new_bands = band_index(cover)
        if args.band_index:
            new_bands = spark.read.parquet(args.band_index).unionByName(
                new_bands
            )
        new_bands.write.mode("overwrite").parquet(args.write_band_index)

    # 2e. DSIR importance selection: keep the docs that look most like the
    # target distribution. Runs on the cleaned survivors — after dedup and
    # the quality gates (selection should not waste budget re-admitting
    # what those stages reject) and before the scrub/pack rewrites (the
    # weight model must see the text future raw crawls will look like).
    if args.dsir_target_lang:
        selected = (
            C.dsir_weights(
                kept,
                target_lang=args.dsir_target_lang,
                select_num=dsir_num,
                select_den=dsir_den,
            )
            .filter(F.col("selected"))
            .select("doc_id")
        )
        kept = kept.join(selected, "doc_id", "left_semi")

    # 2e'. per-source quality quota (opt-in): cap over-crawled sources at
    # their K best LM-scoring survivors. A selection stage like DSIR —
    # it must see the pre-rewrite text — and corpus-state-dependent like
    # it, so it also stays after the band-index write.
    if args.source_quota is not None:
        from newocr_spark.analytics.textstats import source_quota

        capped = (
            source_quota(kept, k=args.source_quota)
            .filter(F.col("keep"))
            .select("doc_id")
        )
        kept = kept.join(capped, "doc_id", "left_semi")

    # 2f. CCNet line-level boilerplate cut (opt-in): remove lines that
    # appear in >= 2 distinct surviving docs from every doc but each
    # line's minimum-doc_id owner. Runs HERE — after the band-index write
    # and DSIR (both must see per-doc-deterministic text: this stage's
    # output depends on corpus state, so a re-crawled doc would otherwise
    # sign/weigh differently depending on what else was in the batch) and
    # before the scrub/pack rewrites. Docs the cut empties drop, as in
    # crossdoc cut mode; already-empty docs stay.
    if args.line_dedup:
        ld = C.line_dedup(kept).select(
            "doc_id", F.col("clean_text").alias("_ld_text"), "n_removed"
        )
        kept = _swap_text(kept, ld, "_ld_text", "n_removed")

    # 3. PII scrub (keeps every doc; swaps text for the scrubbed version)
    scrubbed = C.pii_scrub(kept).select(
        "doc_id", F.col("clean_text").alias("text"), "n_emails", "n_phones", "n_ips"
    )
    kept = kept.drop("text").join(scrubbed, "doc_id")

    # 4. per-language stratified sample (deterministic hash buckets)
    sampled = C.stratified_sample(kept).select("doc_id")
    kept = kept.join(sampled, "doc_id", "left_semi")

    # 5. pack into fixed-budget training sequences, write sharded
    packed = C.pack_sequences(kept, budget=args.seq_budget, n_shards=args.shards)
    out = kept.join(packed, "doc_id").select(
        "doc_id", "lang", "text", "n_emails", "n_phones", "n_ips",
        "shard", "seq_id", "end_seq_id", "n_seqs", "n_tok", "tok_offset",
    )
    out.write.mode("overwrite").partitionBy("shard").parquet(args.output)

    n = spark.read.parquet(args.output).count()
    print(f"curated {n} docs -> {args.output}")
    if owns_session:
        spark.stop()
    return n


if __name__ == "__main__":
    main()
