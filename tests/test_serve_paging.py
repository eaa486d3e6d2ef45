"""Keyset-paginated serve: the queryable-state serve tier's bounded-
materialization contract — each request collects at most page_size
rows, continuation is a key-range predicate (never OFFSET), and the
page stream reassembles the exact ordered result."""

from pyspark.sql import functions as F

from core_spark.plans.queryable_state import serve_pages


def test_pages_are_bounded_and_reassemble(spark):
    df = spark.range(0, 537).select(
        (F.col("id") % 7).cast("string").alias("host"),
        F.col("id").alias("pos"),
    )
    pages = list(serve_pages(df, ["host", "pos"], page_size=50))
    assert all(len(p) <= 50 for p in pages)
    assert sum(len(p) for p in pages) == 537
    flat = [(r["host"], r["pos"]) for pg in pages for r in pg]
    want = [
        (r["host"], r["pos"])
        for r in df.orderBy("host", "pos").collect()
    ]
    assert flat == want  # no row lost or duplicated at page seams


def test_continuation_crosses_duplicate_leading_keys(spark):
    # every row shares host 'a' except one 'b' — the cursor must
    # advance on the second key, not skip the rest of 'a'
    rows = [("a", i) for i in range(23)] + [("b", 0)]
    df = spark.createDataFrame(rows, "host string, pos long")
    pages = list(serve_pages(df, ["host", "pos"], page_size=5))
    assert [len(p) for p in pages] == [5, 5, 5, 5, 4]
    flat = [(r["host"], r["pos"]) for pg in pages for r in pg]
    assert flat == sorted(rows)


def test_page_size_must_be_positive(spark):
    import pytest

    df = spark.range(3)
    with pytest.raises(ValueError):
        next(serve_pages(df, ["id"], page_size=0))


# ------------------------------------------- store-side keyset pages
def test_sqlstore_query_pages_bounded_and_exact(tmp_path):
    """The sqlite twin of serve_pages: one LIMIT probe per request,
    row-value continuation on the key tuple, keys leading each row."""
    from core_spark.streaming.store_sql import SQLStore

    store = SQLStore(str(tmp_path / "s.db"), shard="pages-0")
    store._conn.execute(
        "CREATE TABLE t (host TEXT, pos INTEGER, v TEXT,"
        " PRIMARY KEY (host, pos))"
    )
    rows = [(f"h{i % 7}", i, f"v{i}") for i in range(537)]
    store._conn.executemany("INSERT INTO t VALUES (?,?,?)", rows)
    store._conn.commit()
    pages = list(store.query_pages("t", keys=("host", "pos"), page_size=50))
    assert all(len(p) <= 50 for p in pages)
    assert sum(len(p) for p in pages) == 537
    flat = [(h, p, v) for pg in pages for h, p, v in pg]
    assert flat == sorted(rows)  # no loss/dup at page seams
    store.close()


def test_sqlstore_query_pages_validates(tmp_path):
    import pytest as _pytest

    from core_spark.streaming.store_sql import SQLStore

    store = SQLStore(str(tmp_path / "s.db"), shard="pages-1")
    store._conn.execute("CREATE TABLE t (a INTEGER PRIMARY KEY, b TEXT)")
    store._conn.commit()
    with _pytest.raises(ValueError, match="positive"):
        next(store.query_pages("t", keys=("a",), page_size=0))
    with _pytest.raises(ValueError, match="cursor keys"):
        next(store.query_pages("t", keys=("nope",), page_size=5))
    store.close()


def test_snapshot_then_pages_serves_aggregate(tmp_path):
    """The q_bike_cycles shape: aggregate ONCE into a serving table,
    drain it in pages — the serve path never fetches the whole
    result in one request."""
    from core_spark.streaming.store_sql import SQLStore

    store = SQLStore(str(tmp_path / "s.db"), shard="snap-0")
    store._conn.execute("CREATE TABLE raw (k INTEGER, x INTEGER)")
    store._conn.executemany(
        "INSERT INTO raw VALUES (?,?)", [(i % 13, i) for i in range(200)]
    )
    store._conn.commit()
    n = store.snapshot(
        "agg", "SELECT k, COUNT(*) AS n, SUM(x) AS s FROM raw GROUP BY k"
    )
    assert n == 13
    pages = list(store.query_pages("agg", keys=("k",), page_size=4))
    assert [len(p) for p in pages] == [4, 4, 4, 1]
    got = {k: (c, s) for pg in pages for k, c, s in pg}
    want = {
        k: (
            len([i for i in range(200) if i % 13 == k]),
            sum(i for i in range(200) if i % 13 == k),
        )
        for k in range(13)
    }
    assert got == want
    # refresh replaces, not appends
    assert store.snapshot("agg", "SELECT 1 AS k, 1 AS n, 1 AS s") == 1
    store.close()
