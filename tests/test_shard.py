"""Shard runner: word-count-shaped pipeline (tail journal → per-batch
grouped deltas → fenced out-journal), with restart/resume and no
duplication — the consumer-transaction loop end-to-end."""

import os

from pyspark.sql import functions as F

from core_spark.sources.journal import Journal
from core_spark.streaming.shard import ShardConfig, run_shard


def _write_chunk(spark, src, name, words):
    spark.createDataFrame([(w,) for w in words], "word string").coalesce(
        1
    ).write.parquet(os.path.join(src, name))


def test_shard_word_count_resume(spark, tmp_path):
    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_chunk(spark, src, "c0.parquet", ["a", "b", "a"])
    _write_chunk(spark, src, "c1.parquet", ["b", "c"])

    cfg = ShardConfig(
        source_glob=src + "/*",
        source_schema="word string",
        out_root=str(tmp_path / "out"),
        out_journal="wc/deltas",
        shard_id="shard-0",
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )

    def deltas(df):
        return df.groupBy("word").agg(F.count("*").alias("cnt"))

    q = run_shard(spark, cfg, deltas)
    q.awaitTermination(120)

    j = Journal(str(tmp_path / "out"), "wc/deltas")
    totals = {
        r.word: r.total
        for r in j.read(spark)
        .groupBy("word")
        .agg(F.sum("cnt").alias("total"))
        .collect()
    }
    assert totals == {"a": 2, "b": 2, "c": 1}

    # restart with no new input: nothing re-emitted
    cfg2 = ShardConfig(**cfg.__dict__)  # new incarnation: fence auto-bumps
    run_shard(spark, cfg2, deltas).awaitTermination(120)
    assert j.read(spark).count() == j.read(spark).dropDuplicates().count()
    totals2 = {
        r.word: r.total
        for r in j.read(spark).groupBy("word").agg(F.sum("cnt").alias("total")).collect()
    }
    assert totals2 == totals

    # new chunk after restart: only the delta lands
    _write_chunk(spark, src, "c2.parquet", ["c", "c"])
    cfg3 = ShardConfig(**cfg.__dict__)
    run_shard(spark, cfg3, deltas).awaitTermination(120)
    totals3 = {
        r.word: r.total
        for r in j.read(spark).groupBy("word").agg(F.sum("cnt").alias("total")).collect()
    }
    assert totals3 == {"a": 2, "b": 2, "c": 3}


def test_shard_streaming_cms_maintenance(spark, tmp_path):
    """Streaming sketch maintenance = the deltas pattern applied to a
    mergeable summary: each micro-batch emits partial Count-Min
    counters into the out-journal; the materialized sketch is one
    groupBy-sum over the journal and equals the batch-built sketch
    EXACTLY (integer counters + deterministic hash family — no
    approximation drift across the batch/stream boundary)."""
    from core_spark.plans.sketches import _CMS_D, _CMS_W, _cms_pairs

    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_chunk(spark, src, "c0.parquet", ["u1", "u2", "u1"])
    _write_chunk(spark, src, "c1.parquet", ["u3", "u1", "u2"])

    cfg = ShardConfig(
        source_glob=src + "/*",
        source_schema="word string",
        out_root=str(tmp_path / "out"),
        out_journal="cms/deltas",
        shard_id="cms-0",
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )

    def cms_deltas(df):
        return (
            df.select(F.explode(_cms_pairs(F.col("word"))).alias("p"))
            .select("p.r", "p.c")
            .groupBy("r", "c")
            .agg(F.count("*").alias("cnt"))
        )

    run_shard(spark, cfg, cms_deltas).awaitTermination(120)
    j = Journal(str(tmp_path / "out"), "cms/deltas")
    streamed = {
        (r.r, r.c): r.total
        for r in j.read(spark)
        .groupBy("r", "c")
        .agg(F.sum("cnt").alias("total"))
        .collect()
    }

    batch_df = spark.createDataFrame(
        [("u1",), ("u2",), ("u1",), ("u3",), ("u1",), ("u2",)], "word string"
    )
    batch = {
        (r.r, r.c): r.total
        for r in batch_df.select(
            F.explode(_cms_pairs(F.col("word"))).alias("p")
        )
        .select("p.r", "p.c")
        .groupBy("r", "c")
        .agg(F.count("*").cast("bigint").alias("total"))
        .collect()
    }
    assert streamed == batch
    assert sum(streamed.values()) == 6 * _CMS_D  # every row hashed d times
    assert all(0 <= c < _CMS_W for (_r, c) in streamed)


def test_await_offset_read_your_writes(spark, tmp_path):
    """Offset-granular read-through barrier (Stat RPC analog,
    consumer/shard_api.go:24-51): append to the SOURCE journal while
    the shard runs, await_offset on the append's end offset, then
    query the materialization — the row must be visible, because the
    rt register commits in the same manifest CAS as the batch."""
    from core_spark.streaming.shard import await_offset

    root = str(tmp_path / "journals")
    src = Journal(root, "in/events")
    src.append(
        spark.createDataFrame([(k,) for k in range(5)], "k long")
    )

    cfg = ShardConfig(
        source_glob=None,
        source_schema=None,
        out_root=root,
        out_journal="out/mat",
        shard_id="s0",
        checkpoint_dir=str(tmp_path / "ckpt"),
        source_root=root,
        source_journal="in/events",
        trigger_seconds=0.5,
    )
    q = run_shard(spark, cfg, lambda df: df.select("k"))
    try:
        # first barrier: the pre-existing rows
        rt = await_offset(root, "out/mat", "s0", "in/events", 5, timeout=90)
        assert rt >= 5

        # read-your-writes: append mid-run, await its end offset
        frag = src.append(spark.createDataFrame([(99,)], "k long"))
        rt = await_offset(
            root, "out/mat", "s0", "in/events", frag.end, timeout=90
        )
        assert rt >= frag.end
        out = Journal(root, "out/mat").read(spark)
        assert out.filter(F.col("k") == 99).count() == 1

        # an offset beyond the write head does not resolve
        import pytest as _pytest

        with _pytest.raises(TimeoutError, match="read-through"):
            await_offset(
                root, "out/mat", "s0", "in/events", frag.end + 1000,
                timeout=1.5,
            )
    finally:
        q.stop()


def test_shard_streaming_bottomk_quantile_maintenance(spark, tmp_path):
    """The bottom-k quantile sample (q_approx_quantile) maintained
    through the shard runner: each micro-batch emits its OWN bottom-k
    rows per group; the materialized sketch is bottom-k over the
    journal union and equals the batch-built sketch EXACTLY — the
    mergeability property (merge = k smallest of the union) across
    the batch/stream boundary, like the CMS test above."""
    from pyspark.sql.window import Window

    K = 4
    HEXPR = (
        "CAST(conv(substring(md5(CAST(key AS STRING)), 1, 15), 16, 10) "
        "AS BIGINT)"
    )

    def bottomk(df):
        w = Window.partitionBy("grp").orderBy("h", "key")
        return (
            df.withColumn("h", F.expr(HEXPR))
            .withColumn("rn", F.row_number().over(w))
            .filter(F.col("rn") <= K)
            .select("grp", "key", "value", "h")
        )

    src = str(tmp_path / "src")
    os.makedirs(src)
    rows = [("g1", i, float(i * 7 % 13)) for i in range(10)] + [
        ("g2", 100 + i, float(i)) for i in range(3)
    ]

    def write(name, chunk):
        spark.createDataFrame(
            chunk, "grp string, key long, value double"
        ).coalesce(1).write.parquet(os.path.join(src, name))

    write("c0.parquet", rows[:5])
    write("c1.parquet", rows[5:])

    cfg = ShardConfig(
        source_glob=src + "/*",
        source_schema="grp string, key long, value double",
        out_root=str(tmp_path / "out"),
        out_journal="qsk/deltas",
        shard_id="qsk-0",
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    run_shard(spark, cfg, bottomk).awaitTermination(120)

    j = Journal(str(tmp_path / "out"), "qsk/deltas")
    streamed = {
        (r.grp, r.key, r.value)
        for r in bottomk(j.read(spark).drop("h")).collect()
    }
    batch = {
        (r.grp, r.key, r.value)
        for r in bottomk(
            spark.createDataFrame(rows, "grp string, key long, value double")
        ).collect()
    }
    assert streamed == batch
    assert len({k for g, k, v in streamed if g == "g1"}) == K
    assert len({k for g, k, v in streamed if g == "g2"}) == 3  # < K: exact


def test_shard_maintains_lsh_index_journal(spark, tmp_path):
    """The 'persisted index updated as batches commit' claim of
    q_dup_ingest/q_incr_dedup, executable: the shard runner streams
    document chunks and appends their banded MinHash signatures to a
    journal; a new batch then probes the JOURNAL-READ index with
    lsh_probe and flags its corpus near-dup — and the journal index
    equals the direct batch computation over everything streamed."""
    from core_spark.operators.dedup import (
        banded_signatures,
        lsh_probe,
        minhash_signatures,
        verify_jaccard,
    )

    text_a = "the quick brown fox jumps over the lazy dog again and again"
    corpus = [
        (1, text_a),
        (2, "completely different words about spark shuffles and joins"),
        (3, "a third document with its own unrelated content stream"),
        (4, "yet another unrelated piece of text for the index"),
    ]

    src = str(tmp_path / "src")
    os.makedirs(src)

    def write(name, rows):
        spark.createDataFrame(rows, "doc_id long, text string").coalesce(
            1
        ).write.parquet(os.path.join(src, name))

    write("c0.parquet", corpus[:2])
    write("c1.parquet", corpus[2:])

    cfg = ShardConfig(
        source_glob=src + "/*",
        source_schema="doc_id long, text string",
        out_root=str(tmp_path / "out"),
        out_journal="lshidx/bands",
        shard_id="lsh-0",
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )

    def index_deltas(df):
        return banded_signatures(minhash_signatures(df, k=16), bands=4, rows=4)

    run_shard(spark, cfg, index_deltas).awaitTermination(120)

    j = Journal(str(tmp_path / "out"), "lshidx/bands")
    index = j.read(spark).select("doc_id", "band", "sig")

    # journal index == direct computation over everything streamed
    direct = banded_signatures(
        minhash_signatures(
            spark.createDataFrame(corpus, "doc_id long, text string"), k=16
        ),
        bands=4,
        rows=4,
    )
    assert {tuple(r) for r in index.collect()} == {
        tuple(r) for r in direct.collect()
    }

    # probe a new batch against the journal index: the near-copy of
    # doc 1 is flagged, the unique doc is not
    batch = spark.createDataFrame(
        [(100, text_a + " with one extra tail"), (101, "nothing like it at all")],
        "doc_id long, text string",
    )
    banded_b = banded_signatures(minhash_signatures(batch, k=16), 4, 4)
    cand = lsh_probe(banded_b, index)
    everything = spark.createDataFrame(
        corpus, "doc_id long, text string"
    ).unionByName(batch)
    hits = (
        verify_jaccard(
            cand.select(
                F.col("doc_new").alias("doc_a"),
                F.col("doc_idx").alias("doc_b"),
            ),
            everything,
        )
        .filter(F.col("inter") * 10 >= F.col("uni") * 7)
        .collect()
    )
    assert {(r.doc_a, r.doc_b) for r in hits} == {(100, 1)}


def test_shard_maintains_bloom_index(spark, tmp_path):
    """A streaming materialization whose out-journal spec lists
    bloom_columns gets per-fragment bloom filters with NO sink code:
    the fenced append builds them like any append. Equality reads on
    the materialization then prune micro-batch fragments that
    provably lack the value — data skipping over streaming output."""
    from core_spark.catalog import CatalogStore, JournalSpec
    from core_spark.sources.journal import _bloom_may_contain

    src = str(tmp_path / "src")
    os.makedirs(src)
    _write_chunk(spark, src, "c0.parquet", ["alpha", "beta"])
    _write_chunk(spark, src, "c1.parquet", ["gamma", "delta"])

    out_root = str(tmp_path / "out")
    CatalogStore(out_root).apply(
        upserts=(JournalSpec(name="blm/stream", bloom_columns=("word",)),)
    )
    cfg = ShardConfig(
        source_glob=src + "/*",
        source_schema="word string",
        out_root=out_root,
        out_journal="blm/stream",
        shard_id="blm-0",
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    run_shard(spark, cfg, lambda df: df).awaitTermination(120)

    j = Journal(out_root, "blm/stream")
    m = j.manifest()
    data_frags = [f for f in m.fragments if f.n_records > 0]
    assert len(data_frags) >= 2
    assert all("word" in f.blooms for f in data_frags)
    # each batch's filter holds its own words, not the other batch's
    hits = [
        [
            _bloom_may_contain(f.blooms["word"], w)
            for f in data_frags
        ]
        for w in ("alpha", "gamma")
    ]
    assert all(any(h) for h in hits)
    # pruned equality read returns exactly the matching rows
    got = j.read(spark, where=[("word", "=", "gamma")]).collect()
    assert [r.word for r in got] == ["gamma"]


def test_shard_streaming_centroid_maintenance(spark, tmp_path):
    """Streaming class-centroid maintenance: per-batch (label, dim)
    integer-micro sums flow into the out-journal; the materialized
    groupBy-sum equals the batch centroid sums EXACTLY (summation-
    order-proof integers — the q_label_centroid discipline), so a
    nearest-class-mean model can be served incrementally."""
    micro = (
        "CAST(FLOOR(CAST(val AS DOUBLE) * 1000000) AS BIGINT)"
    )

    def chunk(name, rows):
        spark.createDataFrame(
            rows, "label int, embedding array<float>"
        ).coalesce(1).write.parquet(os.path.join(src, name))

    src = str(tmp_path / "src")
    os.makedirs(src)
    chunk("c0.parquet", [(0, [0.5, 1.5]), (1, [2.0, -1.0])])
    chunk("c1.parquet", [(0, [1.0, 0.25]), (1, [0.125, 3.0]), (0, [2.0, 2.0])])

    def deltas(df):
        return (
            df.select("label", F.posexplode("embedding").alias("dim", "val"))
            .select("label", "dim", F.expr(micro).alias("m"))
            .groupBy("label", "dim")
            .agg(F.sum("m").alias("sum_micro"), F.count("*").alias("n"))
        )

    cfg = ShardConfig(
        source_glob=src + "/*",
        source_schema="label int, embedding array<float>",
        out_root=str(tmp_path / "out"),
        out_journal="centroids/deltas",
        shard_id="cent-0",
        checkpoint_dir=str(tmp_path / "ckpt"),
        max_files_per_trigger=1,
    )
    run_shard(spark, cfg, deltas).awaitTermination(120)

    j = Journal(str(tmp_path / "out"), "centroids/deltas")
    streamed = {
        (r.label, r.dim): (r.s, r.n)
        for r in j.read(spark)
        .groupBy("label", "dim")
        .agg(F.sum("sum_micro").alias("s"), F.sum("n").alias("n"))
        .collect()
    }
    batch = {
        (r.label, r.dim): (r.s, r.n)
        for r in deltas(spark.read.parquet(src + "/*"))
        .groupBy("label", "dim")
        .agg(F.sum("sum_micro").alias("s"), F.sum("n").alias("n"))
        .collect()
    }
    assert streamed == batch
    # the served centroid (floor mean) for label 0, dim 0:
    # floor((500000 + 1000000 + 2000000) / 3) micros
    s, n = streamed[(0, 0)]
    assert (s - ((s % n) + n) % n) // n == 1_166_666
