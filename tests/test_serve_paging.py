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
