"""Queryable-state declared queries: results served FROM a fenced
SQL materialization, not from the source scan.

The reference's most-used consumer pattern is "materialize the stream
into a SQL store inside the consumer transaction, serve reads from
the table" — bike-share runs entirely on it
(examples/bike-share/application.go:134-199, consumer/store_sql.go).
q_bike_cycles is that pattern end-to-end: events (bike rides, with
user_id as the bike and event_type as the station) land in a sqlite
`rides` table through SQLStore's fence-checkpointed commit, and the
cycle detection runs as SQL *against the store* (the QueryCycleStmt
analog), so the driver's hash check covers the whole
materialize-then-serve path, not just a Spark plan.

100 TB shape: the store holds one shard's serving state — here the
ride log of the queried key-range — while the fleet-scale work
(routing, aggregation) stays in Spark. The materialization streams
via toLocalIterator (one-partition-bounded memory); see
streaming/store_sql.py for the sizing contract.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from core_spark.io import load_table
from core_spark.plans.registry import query
from core_spark.streaming.store_sql import SQLStore

def serve_pages(df: DataFrame, keys: list[str], page_size: int):
    """Keyset-paginated serve over a materialized state DataFrame:
    yields lists of Rows, each collected by a `LIMIT page_size`
    request, with the continuation predicate `(k1,k2,..) > last`
    (lexicographic on the key tuple) instead of OFFSET — so the next
    page is a pushed-down range probe the storage layer can prune,
    not a re-scan of an ever-growing prefix. The key tuple must be
    non-null and unique per row (it IS the cursor).

    Reference parity: gazette gateways page journal reads by offset
    ranges per request (broker/protocol/protocol.proto ReadRequest
    offset/endOffset); this is the relational twin — a serve tier
    never materializes more than one page per request, whatever the
    frontier/store size.
    """
    if page_size <= 0:
        raise ValueError("page_size must be positive")
    ordered = df.orderBy(*keys)
    last = None
    while True:
        page = ordered
        if last is not None:
            after, eq = F.lit(False), F.lit(True)
            for k, v in zip(keys, last):
                after = after | (eq & (F.col(k) > F.lit(v)))
                eq = eq & (F.col(k) == F.lit(v))
            page = ordered.filter(after)
        rows = page.limit(page_size).collect()
        if not rows:
            return
        yield rows
        if len(rows) < page_size:
            return
        last = [rows[-1][k] for k in keys]


_CYCLES_SQL = """
WITH r AS (
  SELECT user_id, station,
         FIRST_VALUE(station) OVER (
           PARTITION BY user_id ORDER BY event_id) AS start_station
  FROM rides)
SELECT user_id,
       COUNT(*) AS rides,
       SUM(CASE WHEN station = start_station THEN 1 ELSE 0 END) - 1
         AS returns
FROM r GROUP BY user_id
HAVING SUM(CASE WHEN station = start_station THEN 1 ELSE 0 END) - 1 >= 1
ORDER BY user_id
"""


@query(
    "q_bike_cycles",
    oracle="""
    WITH r AS (
      SELECT user_id, event_type AS station,
             FIRST_VALUE(event_type) OVER (
               PARTITION BY user_id ORDER BY event_id) AS start_station
      FROM events)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS rides,
           CAST(SUM(CASE WHEN station = start_station THEN 1 ELSE 0 END) - 1
                AS BIGINT) AS returns
    FROM r GROUP BY user_id
    HAVING SUM(CASE WHEN station = start_station THEN 1 ELSE 0 END) - 1 >= 1
    ORDER BY user_id
    """,
)
def q_bike_cycles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bike-share cycles through the remote-SQL store: materialize the
    ride log into sqlite under the gazette_checkpoints fence, then
    serve "bikes that returned to their start station" from the TABLE
    (count of returns to the first-seen station per bike, bikes with
    >= 1 return). The cycle aggregate snapshots into a store-side
    serving table ONCE (SQLStore.snapshot) and reads drain it by
    keyset-paginated requests (SQLStore.query_pages — LIMIT + a
    key-range probe on the primary key, never OFFSET, never a whole-
    table fetch), so the serve tier's memory is one page whatever
    the store size. The DuckDB oracle computes the same thing
    straight from the events parquet — a hash match proves the
    materialization is lossless AND the store-side SQL agrees with
    the declarative form. Reference: QueryCycleStmt served from the
    SQLStore, examples/bike-share/application.go:134-199."""
    tmp = tempfile.mkdtemp(prefix="bike_store_")
    try:
        store = SQLStore(os.path.join(tmp, "state.db"), shard="cycles-0")
        rides = load_table(spark, sf_dir, "events").select(
            "event_id",
            "user_id",
            F.col("event_type").alias("station"),
        )
        store.materialize("rides", rides, batch_id=0, key_cols=("event_id",))
        store.snapshot("cycles", _CYCLES_SQL)
        rows = [
            r
            for page in store.query_pages(
                "cycles", keys=("user_id",), page_size=256
            )
            for r in page
        ]
        store.close()
        return spark.createDataFrame(
            [(int(u), int(r), int(c)) for u, r, c in rows],
            "user_id bigint, rides bigint, returns bigint",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _cms_serve_oracle() -> str:
    from core_spark.plans.sketches import _cms_oracle

    return _cms_oracle()


@query("q_cms_serve", oracle=_cms_serve_oracle())
def q_cms_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming sketch maintenance served from its journal
    materialization, end-to-end under the driver's hash check: the
    event stream is tailed by a REAL shard run (run_shard →
    FencedJournalSink), each micro-batch appends its partial Count-Min
    deltas as a fragment, and the heavy-hitter answer is served by
    summing the JOURNAL's counters — never by re-sketching the source.
    Because the counters are integers under a portable seeded-md5
    family, streaming maintenance ≡ batch exactly, so the DuckDB
    oracle (the same SQL as q_cms_heavy, straight off the parquet)
    hash-checks the whole materialize→serve path: a lost batch, a
    duplicated delta, or a fence violation all change the counters and
    fail the match. Reference: the materialized word-count pattern
    (examples/word-count/word_count.go:109-153) + the consumer
    transaction loop (consumer/transaction.go:22-113).

    100 TB shape: deltas are d×w = 1024 rows per micro-batch no matter
    the batch size (the mergeable fixed-memory summary); the serve
    side reads only the delta journal, so query cost scales with
    batches, and compaction (Journal.compact) folds history."""
    import shutil as _sh
    import tempfile as _tf

    from pyspark.sql import functions as _F

    from core_spark.plans.sketches import _cms_pairs
    from core_spark.sources.journal import Journal
    from core_spark.streaming.shard import ShardConfig, run_shard

    work = _tf.mkdtemp(prefix="cms_serve_")
    try:
        src = os.path.join(work, "src")
        load_table(spark, sf_dir, "events").select("user_id").repartition(
            4
        ).write.parquet(src)

        cfg = ShardConfig(
            source_glob=os.path.join(src, "*.parquet"),
            source_schema="user_id bigint",
            out_root=os.path.join(work, "out"),
            out_journal="cms/deltas",
            shard_id="cms-serve-0",
            checkpoint_dir=os.path.join(work, "ckpt"),
            max_files_per_trigger=2,  # >1 fragment => merge is exercised
        )

        def cms_deltas(df):
            return (
                df.select(_F.col("user_id").cast("string").alias("key"))
                .select(_F.explode(_cms_pairs(_F.col("key"))).alias("p"))
                .groupBy("p.r", "p.c")
                .agg(_F.count("*").cast("bigint").alias("cnt"))
            )

        run_shard(spark, cfg, cms_deltas).awaitTermination(300)

        # serve FROM the journal: counters = sum of committed deltas
        j = Journal(os.path.join(work, "out"), "cms/deltas")
        counters = (
            j.read(spark)
            .groupBy("r", "c")
            .agg(_F.sum("cnt").cast("bigint").alias("cnt"))
        )

        keyed = load_table(spark, sf_dir, "events").select(
            _F.col("user_id").cast("string").alias("key")
        )
        keys = keyed.groupBy("key").agg(
            _F.count("*").cast("bigint").alias("exact_cnt")
        )
        kp = keys.select(
            "key", "exact_cnt", _F.explode(_cms_pairs(_F.col("key"))).alias("p")
        ).select("key", "exact_cnt", "p.r", "p.c")
        out = (
            kp.join(_F.broadcast(counters), ["r", "c"])
            .groupBy("key", "exact_cnt")
            .agg(_F.min("cnt").alias("est_cnt"))
            .orderBy(_F.desc("est_cnt"), "key")
            .limit(20)
        )
        # the journal read is lazy: drain before the temp dir holding
        # the fragments disappears — through the PAGED serve path
        # like every other storage-backed serve (`key` is the unique
        # cursor; the top-20 is bounded by construction, but the
        # serve-tier invariant stays uniform: no request
        # materializes more than one page).
        rows = [
            r for pg in serve_pages(out, ["key"], page_size=8) for r in pg
        ]
        return spark.createDataFrame(rows, out.schema)
    finally:
        _sh.rmtree(work, ignore_errors=True)


_FRONTIER_ORACLE = """
    WITH p AS (
      SELECT doc_id,
             substr(md5(text), 1, 2) AS h2,
             CAST('0x' || substr(md5(text), 1, 1) AS BIGINT) % 3 AS e0,
             CAST('0x' || substr(md5(text), 2, 1) AS BIGINT) % 3 AS e1,
             2020 + CAST('0x' || substr(md5(text), 3, 1) AS BIGINT) % 6
               AS y,
             CAST('0x' || substr(md5(text), 4, 1) AS BIGINT) AS d3,
             CAST('0x' || substr(md5(text), 5, 1) AS BIGINT) AS d4,
             1 + CAST('0x' || substr(md5(text), 2, 1) AS BIGINT) % 4
               AS delay_s
      FROM documents
    ),
    c AS (SELECT *, unnest([0, 1]) AS ch FROM p),
    n AS (
      SELECT *, 2 + CASE WHEN ch = 0 THEN e0 ELSE e1 END AS nurl
      FROM c
    ),
    u AS (SELECT *, unnest(range(nurl)) AS i FROM n),
    cand AS (
      SELECT 'ex' || h2 || '.com' AS host,
             'https://ex' || h2 || '.com/s' || CAST(ch AS VARCHAR)
               || '/p' || CAST(i AS VARCHAR) AS canon,
             CASE WHEN ch = 1 AND i = nurl - 1 THEN NULL
                  ELSE strftime(make_date(CAST(y AS INT),
                         CAST(1 + (d3 + i) % 12 AS INT),
                         CAST(1 + (d4 + 2 * i + ch) % 28 AS INT)),
                       '%Y-%m-%d')
             END AS lastmod,
             ch <> CAST('0x' || substr(md5('ex' || h2 || '.com'), 1, 1)
                        AS BIGINT) % 2 AS allowed,
             delay_s
      FROM u
    ),
    ded AS (
      SELECT host, canon, max(lastmod) AS lastmod,
             CAST(min(CAST(allowed AS INT)) AS BOOLEAN) AS allowed,
             max(delay_s) AS delay_s
      FROM cand GROUP BY host, canon
    ),
    w AS (
      SELECT host, canon AS url, lastmod, delay_s,
             ROW_NUMBER() OVER (PARTITION BY host
               ORDER BY lastmod DESC NULLS LAST, canon) AS pos
      FROM ded WHERE allowed
    )
    SELECT host, url, lastmod, CAST(pos AS BIGINT) AS pos,
           CAST((pos - 1) * delay_s AS BIGINT) AS fetch_at_s
    FROM w ORDER BY host, pos
"""


@query("q_bfs_frontier", oracle=_FRONTIER_ORACLE)
def q_bfs_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming crawl FRONTIER maintained as a shard and served from
    its journal — the fourth storage-backed streaming query beside
    q_bike_cycles (SQL store), q_cms_serve (sketch journal) and
    q_bands_serve (LSH index journal), and the streaming form of
    examples/crawl_pipeline.plan_crawl: documents stream through a
    REAL shard run (run_shard → FencedJournalSink) whose transform is
    the SAME discovery kernel the batch plan uses
    (discover_candidates: robots-seeded sitemap walk → messy URL →
    canonical key), each micro-batch appending its candidate rows to
    a `frontier/candidates` journal; the fetch schedule is then
    served by running the SAME scheduling stage (schedule_frontier:
    canonical-key dedup → robots gate → per-host politeness window)
    over the JOURNAL READ — never by re-discovering the source.
    Discovery rows are deterministic per document and scheduling is
    order-independent, so streaming maintenance ≡ batch plan_crawl
    exactly, and the DuckDB oracle (the fixture arithmetic straight
    off the parquet — md5-derived hosts, sitemap url enumeration,
    per-host robots fence ch <> md5(host)%2, politeness delay) hash
    -checks the whole maintain→serve path: a lost batch drops URLs
    and shifts every politeness slot after it.

    Reference parity: the frontier-as-shard is the gazette consumer
    shape (ShardSpec = streaming query instance,
    consumer/protocol/protocol.proto:55-233) — discovered URLs land
    in a journal topic, the scheduler is a read-committed consumer of
    it.

    100 TB shape: the journal carries one bounded row per discovered
    URL (never page bytes); dedup and the politeness window shuffle
    on host — the natural crawl partitioning — and compaction folds
    re-discoveries; serve cost scales with the frontier, not the
    crawl history."""
    import shutil as _sh
    import tempfile as _tf

    from core_spark.examples.crawl_pipeline import (
        discover_candidates,
        schedule_frontier,
    )
    from core_spark.sources.journal import Journal
    from core_spark.streaming.shard import ShardConfig, run_shard

    docs = load_table(spark, sf_dir, "documents")
    work = _tf.mkdtemp(prefix="frontier_serve_")
    try:
        src = os.path.join(work, "src")
        docs.select("doc_id", "text").repartition(4).write.parquet(src)

        cfg = ShardConfig(
            source_glob=os.path.join(src, "*.parquet"),
            source_schema="doc_id long, text string",
            out_root=os.path.join(work, "out"),
            out_journal="frontier/candidates",
            shard_id="frontier-0",
            checkpoint_dir=os.path.join(work, "ckpt"),
            max_files_per_trigger=2,  # >1 batch => incremental upkeep
        )

        run_shard(spark, cfg, discover_candidates).awaitTermination(300)

        # serve FROM the journal: the scheduler never re-discovers
        j = Journal(os.path.join(work, "out"), "frontier/candidates")
        cands = j.read(spark).select(
            "host", "url", "canon", "lastmod", "allowed", "delay_s"
        )
        out = schedule_frontier(cands)
        # the journal read is lazy: drain before the temp dir holding
        # the fragments disappears — through the PAGED serve path
        # ((host, pos) is the unique cursor), so no single request
        # materializes more than one page however large the frontier.
        rows = [
            r
            for pg in serve_pages(out, ["host", "pos"], page_size=256)
            for r in pg
        ]
        return spark.createDataFrame(rows, out.schema)
    finally:
        _sh.rmtree(work, ignore_errors=True)


def _dedup_index_serve_oracle() -> str:
    from core_spark.plans.llmops import DUCK_MINHASH_CTES

    return f"""
    WITH {DUCK_MINHASH_CTES},
    bc AS (
      SELECT n.doc_id AS doc_new, ix.doc_id AS doc_idx
      FROM bands n JOIN bands ix
        ON n.b = ix.b AND n.sig = ix.sig
       AND n.doc_id % 10 = 0 AND ix.doc_id % 10 <> 0
      GROUP BY n.doc_id, ix.doc_id
    ),
    vbc AS (
      SELECT c.doc_new FROM bc c
      JOIN sh sa ON c.doc_new = sa.doc_id
      JOIN sh sb ON c.doc_idx = sb.doc_id
      WHERE len(list_intersect(sa.sh, sb.sh)) * 10
        >= (len(sa.sh) + len(sb.sh) - len(list_intersect(sa.sh, sb.sh))) * 7
    ),
    nc AS (SELECT doc_new, COUNT(*) AS n_corpus FROM vbc GROUP BY doc_new)
    SELECT d.doc_id,
           CAST(COALESCE(nc.n_corpus, 0) AS BIGINT) AS n_corpus,
           CASE WHEN COALESCE(nc.n_corpus, 0) > 0 THEN 'dup_of_corpus'
                ELSE 'unique' END AS status
    FROM documents d LEFT JOIN nc ON d.doc_id = nc.doc_new
    WHERE d.doc_id % 10 = 0
    ORDER BY d.doc_id
    """


@query("q_bands_serve", oracle=_dedup_index_serve_oracle())
def q_bands_serve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Streaming near-dup INDEX maintenance served from its journal
    materialization — the third storage-backed streaming query beside
    q_bike_cycles (SQL store) and q_cms_serve (sketch journal), and
    the executable form of the claim q_dup_ingest's docstring makes
    ("at 100 TB the corpus's banded rows are a persisted index
    updated as batches commit, not recomputed"): the corpus
    (doc_id%10<>0) streams through a REAL shard run (run_shard →
    FencedJournalSink) that appends each micro-batch's banded MinHash
    signatures to an `lshidx/bands` journal; a probe batch
    (doc_id%10=0) then classifies itself against the JOURNAL-READ
    index via lsh_probe + exact-Jaccard verify. Banded signatures are
    deterministic per document, so streaming maintenance ≡ direct
    batch banding and the DuckDB oracle (the q_dup_ingest corpus tier
    straight off the parquet) hash-checks the whole
    maintain→serve path — a batch lost to a fence violation or a
    missed fragment drops candidates and flips verdicts.

    100 TB shape: the index journal carries (doc_id, band, sig) rows
    only — bounded per doc by the band count, compacted by
    Journal.compact, bloom-indexable on sig; probes touch the index
    via the (band, sig) bucket join, never the corpus text."""
    import shutil as _sh
    import tempfile as _tf

    from core_spark.operators.dedup import (
        banded_signatures,
        lsh_probe,
        minhash_signatures,
        verify_jaccard,
    )
    from core_spark.plans.llmops import _BANDS, _MINHASH_K, _ROWS
    from core_spark.sources.journal import Journal
    from core_spark.streaming.shard import ShardConfig, run_shard

    docs = load_table(spark, sf_dir, "documents")
    work = _tf.mkdtemp(prefix="lsh_serve_")
    try:
        src = os.path.join(work, "src")
        docs.filter(F.col("doc_id") % 10 != 0).select(
            "doc_id", "text"
        ).repartition(4).write.parquet(src)

        cfg = ShardConfig(
            source_glob=os.path.join(src, "*.parquet"),
            source_schema="doc_id long, text string",
            out_root=os.path.join(work, "out"),
            out_journal="lshidx/bands",
            shard_id="lsh-serve-0",
            checkpoint_dir=os.path.join(work, "ckpt"),
            max_files_per_trigger=2,  # >1 batch => incremental upkeep
        )

        def index_deltas(df):
            return banded_signatures(
                minhash_signatures(df, k=_MINHASH_K),
                bands=_BANDS,
                rows=_ROWS,
            )

        run_shard(spark, cfg, index_deltas).awaitTermination(300)

        # serve FROM the journal: the probe never re-bands the corpus
        j = Journal(os.path.join(work, "out"), "lshidx/bands")
        index = j.read(spark).select("doc_id", "band", "sig")

        batch = docs.filter(F.col("doc_id") % 10 == 0)
        banded_b = banded_signatures(
            minhash_signatures(batch, k=_MINHASH_K),
            bands=_BANDS,
            rows=_ROWS,
        )
        cand = lsh_probe(banded_b, index).select(
            F.col("doc_new").alias("doc_a"),
            F.col("doc_idx").alias("doc_b"),
        )
        thr = F.col("inter") * 10 >= F.col("uni") * 7
        n_corpus = (
            verify_jaccard(cand, docs)
            .filter(thr)
            .groupBy("doc_a")
            .agg(F.count("*").alias("n_corpus"))
        )
        out = (
            batch.select("doc_id")
            .join(n_corpus, batch.doc_id == n_corpus.doc_a, "left")
            .select(
                "doc_id",
                F.coalesce("n_corpus", F.lit(0))
                .cast("bigint")
                .alias("n_corpus"),
                F.when(
                    F.coalesce("n_corpus", F.lit(0)) > 0,
                    F.lit("dup_of_corpus"),
                )
                .otherwise(F.lit("unique"))
                .alias("status"),
            )
            .orderBy("doc_id")
        )
        # journal read is lazy: drain before the temp dir goes —
        # through the paged serve path (doc_id cursor): one row per
        # queried doc, never more than a page per request
        rows = [
            r
            for pg in serve_pages(out, ["doc_id"], page_size=256)
            for r in pg
        ]
        return spark.createDataFrame(rows, out.schema)
    finally:
        _sh.rmtree(work, ignore_errors=True)
