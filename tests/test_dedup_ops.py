"""Focused pins for the r14 MinHash single-text-pass restructure
(operators/dedup.py): minhash_signatures' explode_outer form must
keep the r1 contract — every doc gets a signature, shingle-less docs
(< 3 tokens) get the all-zero one — and the shared-`shingles`
parameter must be a pure plan optimization (identical results)."""

from pyspark.sql import functions as F

from core_spark.operators.dedup import (
    _with_shingles,
    minhash_signatures,
    verify_jaccard,
)

DOCS = [
    (1, ""),  # empty text -> split yields [''] -> no shingles
    (2, "one"),  # 1 token
    (3, "two tokens"),  # 2 tokens
    (4, "a b c d e"),  # 3 shingles
    (5, "a b c d e"),  # exact dup of 4
    (6, "x y z"),  # single shingle
]


def _docs(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def test_minhash_every_doc_gets_signature_zero_for_shingleless(spark):
    docs = _docs(spark)
    rows = {r.doc_id: r.mh for r in minhash_signatures(docs, k=16).collect()}
    assert set(rows) == {1, 2, 3, 4, 5, 6}
    for d in (1, 2, 3):  # < 3 tokens: the explode_outer null row
        assert rows[d] == [0] * 16, f"doc {d} must get the zero signature"
    assert rows[4] == rows[5]  # identical text, identical signature
    assert rows[4] != [0] * 16
    assert all(len(mh) == 16 for mh in rows.values())


def test_minhash_precomputed_shingles_identical(spark):
    docs = _docs(spark)
    sh = _with_shingles(docs, "text", [F.col("doc_id")])
    default = sorted(
        minhash_signatures(docs, k=8).collect(), key=lambda r: r.doc_id
    )
    shared = sorted(
        minhash_signatures(docs, k=8, shingles=sh).collect(),
        key=lambda r: r.doc_id,
    )
    assert [tuple(r) for r in default] == [tuple(r) for r in shared]


def test_verify_jaccard_precomputed_shingles_identical(spark):
    docs = _docs(spark)
    cand = spark.createDataFrame(
        [(4, 5), (4, 6)], "doc_a long, doc_b long"
    )
    sh = _with_shingles(docs, "text", [F.col("doc_id")])
    base = sorted(
        verify_jaccard(cand, docs).collect(), key=lambda r: (r.doc_a, r.doc_b)
    )
    shared = sorted(
        verify_jaccard(cand, docs, shingles=sh).collect(),
        key=lambda r: (r.doc_a, r.doc_b),
    )
    assert [tuple(r) for r in base] == [tuple(r) for r in shared]
    by_pair = {(r.doc_a, r.doc_b): (r.inter, r.uni) for r in base}
    assert by_pair[(4, 5)] == (3, 3)  # identical docs: J = 1
    assert by_pair[(4, 6)][0] == 0  # disjoint shingles
