"""Invariant checks for the r5 packing/composition tier beyond the
DuckDB oracle (which shares derivations with the Spark side)."""

from pyspark.sql import functions as F

from core_spark.plans.packing import _CAP, _OVL_K
from core_spark.plans.registry import REGISTRY
from tests.conftest import SF_SMOKE


def test_seq_pack_conservation_and_fill(spark):
    """Packing must conserve tokens exactly: per-sequence fills sum to
    the corpus token count, every sequence except the last is full to
    CAP, and doc starts across sequences count every document once."""
    out = REGISTRY["q_doc_pack"].fn(spark, SF_SMOKE).collect()
    docs = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    total = docs.select(
        F.sum(F.size(F.split("text", " "))).alias("n")
    ).collect()[0]["n"]
    n_docs = docs.count()

    assert sum(r.n_tokens for r in out) == total
    assert sum(r.n_starts for r in out) == n_docs
    seqs = sorted(r.seq_id for r in out)
    assert seqs == list(range(len(seqs)))  # dense, gap-free
    for r in out:
        if r.seq_id != seqs[-1]:
            assert r.n_tokens == _CAP, r
        assert r.n_docs >= 1


def test_overlap_matrix_estimates_track_exact_jaccard(spark, tmp_path):
    """Controlled overlap: sources sharing half their documents must
    estimate a higher Jaccard than disjoint sources, and exact
    containment bounds hold (estimate in [0, 1e6], identical sketches
    -> 1e6)."""
    import os

    rows = []
    # s0 and s1 share 40 of 80 docs; s2 is disjoint.
    for i in range(80):
        rows.append((i, f"shared text {i}" if i < 40 else f"s0 only {i}", "en", "s0", 10))
    for i in range(80):
        rows.append(
            (1000 + i, f"shared text {i}" if i < 40 else f"s1 only {i}", "en", "s1", 10)
        )
    for i in range(80):
        rows.append((2000 + i, f"s2 text {i}", "en", "s2", 10))
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(d, "documents.parquet"))

    out = {
        (r.source_a, r.source_b): r.jaccard_micro
        for r in REGISTRY["q_corpus_overlap"].fn(spark, d).collect()
    }
    # true J(s0, s1) = 40 / 120 = 0.333; disjoint pairs = 0
    est = out[("s0", "s1")] / 1e6
    assert 0.15 <= est <= 0.55, est
    assert out[("s0", "s2")] == 0 and out[("s1", "s2")] == 0
    for v in out.values():
        assert 0 <= v <= 1_000_000
    # k_used respects the sketch bound
    ks = {
        (r.source_a, r.source_b): r.k_used
        for r in REGISTRY["q_corpus_overlap"].fn(spark, d).collect()
    }
    assert all(k <= _OVL_K for k in ks.values())


def test_span_scrub_flags_planted_duplicate_span(spark, tmp_path):
    """Winnowing guarantee end-to-end: two docs sharing a 48-char span
    (>= k + w - 1 = 23) both get a scrub entry covering at least one
    16-char gram of the span; unrelated docs get none; per-doc spans
    never overlap (dup_chars <= doc length)."""
    import os

    span = "the quick brown fox jumps over the lazy dog 0123"  # 48 chars
    rows = [
        (0, f"AAAA unique prefix zero {span} unique suffix zero", "en", "s", 10),
        (1, f"BBBB totally different head {span} and tail one", "en", "s", 10),
        (2, "no shared content here at all, just plain words", "en", "s", 10),
    ]
    d = str(tmp_path)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.parquet(os.path.join(d, "documents.parquet"))

    out = {r.doc_id: r for r in REGISTRY["q_doc_span_scrub"].fn(spark, d).collect()}
    assert 0 in out and 1 in out and 2 not in out
    for doc_id, text in ((0, rows[0][1]), (1, rows[1][1])):
        r = out[doc_id]
        assert r.dup_chars >= 16, r  # at least one shared selected gram
        assert r.dup_chars <= len(text)
        assert r.n_spans >= 1 and r.n_prints >= 1


def test_train_order_is_a_dense_permutation_per_epoch(spark):
    """Each epoch's positions are exactly 0..n-1 (dense, gap-free)
    and the two epochs are genuinely different permutations."""
    out = REGISTRY["q_curriculum_order"].fn(spark, SF_SMOKE).collect()
    by_epoch: dict = {}
    for r in out:
        by_epoch.setdefault(r.epoch, {})[r.doc_id] = r.pos
    assert set(by_epoch) == {0, 1}
    n = len(by_epoch[0])
    for e, m in by_epoch.items():
        assert sorted(m.values()) == list(range(n)), e
    assert by_epoch[0] != by_epoch[1]  # independent salted shuffles
