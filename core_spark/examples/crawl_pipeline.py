"""crawl-pipeline: the crawl-planning tier composed end to end —
the discovery-side sibling of media_pipeline (which curates fetched
bytes; this plans which bytes to fetch).

Shape: one Arrow `mapInPandas` pass per document builds and walks
that document's discovery surface — the host's real robots.txt
(functions/robots.py) whose global ``Sitemap:`` line seeds
discovery, then the two-level sitemap tree it names
(functions/sitemap.py) — emitting one candidate row per discovered
URL with its politeness verdict and crawl delay, in the order a
real crawler works: robots first, sitemaps second. Everything after
the parse is JVM-declarative, the way a 100 TB frontier actually
runs:

1. discovered URLs arrive MESSY (tracking params, fragments) and are
   canonicalized (functions/urls.py) — the dedup key;
2. exact dedup on the canonical URL (groupBy min, the q_dedup_exact
   shape) — a frontier must never fetch the same resource twice;
3. the robots verdict drops disallowed paths (here: one of the
   host's two sitemap subtrees, hash-picked per host, so the gate is
   structurally load-bearing, not a random sprinkle);
4. per-host politeness scheduling: fetch_at = (position - 1) x
   crawl_delay over a host-partitioned window — one hash exchange on
   host, the only shuffle besides the dedup.

The output IS the fetch schedule: (host, url, lastmod, pos,
fetch_at_s), freshest-first within each host. Feed it to the WARC
writer (q_cc_cdx is the index it produces) and the loop closes.

Reference parity: gazette consumers would run this as a shard
pipeline over a `frontier` topic; this module is the batch form, and
plans/queryable_state.q_bfs_frontier is the streaming form — the
SAME two stages (discover_candidates as the shard transform, its
candidate rows appended to a `frontier/candidates` journal;
schedule_frontier served over the journal read), so streaming
maintenance ≡ batch by construction and the driver hash-checks it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from core_spark.io import load_table, spread

AGENT = "core-spark-bot"


def discover_candidates(docs: DataFrame) -> DataFrame:
    """Discovery stage: documents → one MESSY candidate row per
    discovered URL (host, url, canon, lastmod, allowed, delay_s),
    robots-seeded, sitemap-walked, canonicalized — the map-side Arrow
    pass shared by the batch plan (plan_crawl) and the streaming
    frontier shard (plans/queryable_state.q_bfs_frontier), so
    streaming maintenance is provably the same discovery as batch."""

    def discover(batches):
        import hashlib

        import pandas as pd

        from core_spark.functions.robots import parse_robots
        from core_spark.functions.sitemap import (
            build_sitemap_fixture,
            parse_sitemap,
        )
        from core_spark.functions.urls import canonical_url

        for pdf in batches:
            rows = []
            for text in pdf["text"]:
                digest = hashlib.md5(text.encode("utf-8")).hexdigest()
                index, children = build_sitemap_fixture(digest)
                host = f"ex{digest[0:2]}.com"
                hh = int(hashlib.md5(host.encode()).hexdigest()[0], 16)
                delay = 1 + int(digest[1], 16) % 4
                # per-host policy: even-hash hosts fence /s1, odd
                # fence /s0 — so BOTH sitemap subtrees (and the
                # lastmod-less url child 1 carries) survive somewhere
                index_url = f"https://{host}/sitemap_index.xml"
                robots = (
                    f"# robots for {host}\n"
                    f"Sitemap: {index_url}\n"
                    "User-agent: *\n"
                    f"Disallow: /s{hh % 2}\n"
                    f"Crawl-delay: {delay}\n"
                )
                pol = parse_robots(robots, agent=AGENT)
                # discovery starts FROM robots.txt: its global
                # Sitemap line names the index (the real crawl
                # order: robots first, sitemaps second)
                fetched = {index_url: index, **children}
                (seed,) = pol.sitemaps
                idx = parse_sitemap(fetched[seed])
                for loc in idx["sitemaps"]:
                    for u in parse_sitemap(children[loc])["urls"]:
                        # discovered URLs arrive messy: session junk
                        # a canonicalizer must strip
                        messy = (
                            u["loc"]
                            + "?utm_source=sitemap&gclid=x#frag"
                        )
                        path = u["loc"].split(host, 1)[1]
                        ok, _rule = pol.decide(path)
                        rows.append(
                            (
                                host,
                                messy,
                                canonical_url(messy),
                                u["lastmod"],
                                bool(ok),
                                pol.crawl_delay or 0,
                            )
                        )
            yield pd.DataFrame(
                rows,
                columns=[
                    "host", "url", "canon", "lastmod", "allowed",
                    "delay_s",
                ],
            )

    return docs.select("text").mapInPandas(
        discover,
        schema=(
            "host string, url string, canon string, lastmod string,"
            " allowed boolean, delay_s long"
        ),
    )


def schedule_frontier(with_canon: DataFrame) -> DataFrame:
    """Scheduling stage: candidate rows → deduplicated, robots-gated,
    politeness-scheduled fetch plan (host, url, lastmod, pos,
    fetch_at_s). Order-independent over its input (groupBy dedup +
    deterministic per-host window), so it serves identically from a
    batch discovery pass or from a journal of streamed candidate
    deltas."""
    # exact frontier dedup on the canonical key, keeping the freshest
    # lastmod a duplicate discovery carried
    deduped = with_canon.groupBy("host", "canon").agg(
        F.max("lastmod").alias("lastmod"),
        F.min(F.col("allowed").cast("int")).cast("boolean").alias(
            "allowed"
        ),
        F.max("delay_s").alias("delay_s"),
    )

    gated = deduped.where("allowed")
    w = Window.partitionBy("host").orderBy(
        F.col("lastmod").desc_nulls_last(), F.col("canon")
    )
    return (
        gated.select(
            "host",
            F.col("canon").alias("url"),
            "lastmod",
            F.row_number().over(w).cast("long").alias("pos"),
            ((F.row_number().over(w) - 1) * F.col("delay_s"))
            .cast("long")
            .alias("fetch_at_s"),
        )
        .orderBy("host", "pos")
    )


def plan_crawl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Documents → deduplicated, robots-gated, politeness-scheduled
    fetch plan (the batch composition of the two stages above)."""
    docs = spread(load_table(spark, sf_dir, "documents"))
    return schedule_frontier(discover_candidates(docs))
