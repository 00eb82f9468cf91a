#!/usr/bin/env python
"""Cluster entry point: per-domain fetch schedule via spark-submit —
the loop-closing composition of the crawl tier: link-discovery frontier
(q_crawl_frontier) + sitemap advertisement (q_sitemap_delta, 'new'
rows) merged under ONE RFC 9309 politeness gate and Crawl-delay
schedule per domain.

  python scripts/package.py
  spark-submit --py-files dist/newocr_spark.zip jobs/crawl_schedule_job.py \\
      --sf-dir s3://bucket/crawl_tables --output s3://bucket/schedule

Merge law (per domain):
  1. link-discovered URLs first, in frontier rank order (reference
     count is the demand signal — these are pages the corpus itself
     links to);
  2. then sitemap-advertised never-crawled URLs by the site's own
     hints: priority DESC, lastmod DESC (freshest first), url ASC;
  3. every row gets the RFC 9309 longest-match verdict from the SAME
     rule set (robots_rules/robots_gate_urls — a sitemap listing does
     not override robots.txt, RFC 9309 §2.3), and the k-th ALLOWED row
     per domain fetches at (k-1)*crawl_delay seconds. Disallowed rows
     carry no slot. Because link rows precede sitemap rows, their
     fetch_at equals q_robots_gate's standalone schedule exactly — the
     e2e test asserts that identity.

Output: (domain, url, source, n_refs, rank, priority, lastmod,
allowed, matched_rule, crawl_delay, fetch_at) parquet.

100 TB shape: both inputs are the already-engineered operators (narrow
parse + one hash-aggregate each); the merge is a unionByName of
id-sized rows, the gate join broadcasts the tiny rule set, and the
schedule window shuffles only (domain, url, ordering keys) — text
never rides any exchange.
"""

from __future__ import annotations

import argparse


def main(argv: list[str] | None = None, spark=None) -> int:
    """Returns the scheduled (allowed) row count (argv/spark injectable
    for the in-process e2e test, same pattern as curate_job)."""
    p = argparse.ArgumentParser()
    p.add_argument("--sf-dir", required=True,
                   help="directory holding documents.parquet")
    p.add_argument("--output", required=True)
    p.add_argument("--per-domain", type=int, default=None,
                   help="frontier politeness cap (default: operator's)")
    p.add_argument("--no-sitemap", action="store_true",
                   help="schedule only the link-discovered frontier")
    args = p.parse_args(argv)

    from pyspark.sql import SparkSession, Window
    from pyspark.sql import functions as F

    from newocr_spark.web.extract import (
        FRONTIER_PER_DOMAIN,
        q_robots_gate,
        q_sitemap_delta,
        robots_delays,
        robots_gate_urls,
        robots_rules,
        robots_sitemaps,
    )

    owns_session = spark is None
    if owns_session:
        spark = SparkSession.builder.appName(
            "newocr-crawl-schedule"
        ).getOrCreate()

    per_domain = (
        args.per_domain if args.per_domain is not None else FRONTIER_PER_DOMAIN
    )
    links = q_robots_gate(
        spark, args.sf_dir, per_domain=per_domain
    ).select(
        "domain", "url", F.lit("link").alias("source"), "n_refs", "rank",
        F.lit(None).cast("double").alias("priority"),
        F.lit(None).cast("string").alias("lastmod"),
        "allowed", "matched_rule", "crawl_delay",
    )

    if args.no_sitemap:
        merged = links
    else:
        new = q_sitemap_delta(spark, args.sf_dir).filter(
            F.col("status") == "new"
        ).select("domain", "url", "priority", "lastmod")
        # a URL can be BOTH link-discovered and sitemap-advertised
        # (sitemap_delta checks the crawled set, not the frontier);
        # the link row wins — it carries the demand signal — so the
        # sitemap side anti-joins away any (domain, url) already
        # scheduled, keeping one fetch slot per URL
        new = new.join(
            links.select("domain", "url"), ["domain", "url"], "left_anti"
        )
        # trust only sitemaps the domain itself advertises in robots.txt
        # (RFC 9309 §2.4 discovery): a domain whose robots carries no
        # Sitemap directive contributes no sitemap rows
        advertised = robots_sitemaps(new.select("domain")).select("domain")
        new = new.join(F.broadcast(advertised), "domain", "left_semi")
        # the sitemap rows pass the SAME robots gate (a sitemap listing
        # does not override robots.txt) — rules + parsed Crawl-delays
        # rebuilt over the union of domains so a sitemap-only domain
        # still gets its rule set
        doms = links.select("domain").unionByName(new.select("domain"))
        sm = robots_gate_urls(
            new, robots_rules(doms), robots_delays(doms)
        ).select(
            "domain", "url", F.lit("sitemap").alias("source"),
            F.lit(None).cast("long").alias("n_refs"),
            F.lit(None).cast("int").alias("rank"),
            "priority", "lastmod", "allowed", "matched_rule", "crawl_delay",
        )
        merged = links.unionByName(sm)

    # ONE dense Crawl-delay schedule per domain over the merged order:
    # link rows first (rank asc), then sitemap rows (priority desc,
    # lastmod desc, url asc); only ALLOWED rows consume slots
    w = (
        Window.partitionBy("domain")
        .orderBy(
            (F.col("source") == "sitemap").cast("int"),
            F.asc_nulls_last("rank"),
            F.desc_nulls_last("priority"),
            F.desc_nulls_last("lastmod"),
            F.asc("url"),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    fetch_seq = F.sum(F.col("allowed").cast("long")).over(w)
    schedule = merged.select(
        "*",
        F.when(
            F.col("allowed"),
            ((fetch_seq - 1) * F.col("crawl_delay")).cast("long"),
        ).alias("fetch_at"),
    )
    schedule.write.mode("overwrite").parquet(args.output)
    out = spark.read.parquet(args.output)
    n_allowed = out.filter("allowed").count()
    print({
        "scheduled": n_allowed,
        "blocked": out.filter("NOT allowed").count(),
        "sitemap_rows": out.filter("source = 'sitemap'").count(),
    })
    if owns_session:
        spark.stop()
    return n_allowed


if __name__ == "__main__":
    main()
