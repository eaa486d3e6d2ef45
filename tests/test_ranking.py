"""Ranking-tier invariants beyond the DuckDB oracle: independent
Python recomputation for TF-IDF/BM25 on a collected smoke corpus, and
structural properties for the hopping-window and anomaly queries."""

from collections import Counter

from pyspark.sql import functions as F

from core_spark.io import load_table
from core_spark.plans.ranking import _BM25_TERMS, q_bm25, q_doc_tfidf
from core_spark.plans.registry import REGISTRY
from tests.conftest import SF_SMOKE


def _corpus(spark):
    return {
        r.doc_id: r.text.split(" ")
        for r in load_table(spark, SF_SMOKE, "documents").collect()
    }


def test_tfidf_matches_python_reference(spark):
    docs = _corpus(spark)
    n = len(docs)
    df = Counter()
    tfs = {}
    for doc_id, toks in docs.items():
        tf = Counter(toks)
        tfs[doc_id] = tf
        for term in tf:
            df[term] += 1

    want = {}
    for doc_id, tf in tfs.items():
        scored = sorted(
            ((t, c, c * ((n * 1_000_000) // df[t])) for t, c in tf.items()),
            key=lambda x: (-x[2], x[0]),
        )[:3]
        want[doc_id] = {(t, c, s) for t, c, s in scored}

    got = {}
    for r in q_doc_tfidf(spark, SF_SMOKE).collect():
        got.setdefault(r.doc_id, set()).add((r.term, r.tf, r.score))
    assert got == want


def test_bm25_matches_python_reference(spark):
    docs = _corpus(spark)
    dls = {d: len(t) for d, t in docs.items()}
    s, n = sum(dls.values()), len(docs)
    tf = {
        d: {q: t.count(q) for q in _BM25_TERMS if q in t}
        for d, t in docs.items()
    }
    df = Counter(q for terms in tf.values() for q in terms)

    scores = {}
    for d, terms in tf.items():
        if not terms:
            continue
        total = 0
        for q, c in terms.items():
            idf_milli = ((n - df[q] + 1) * 1000) // (df[q] + 1)
            total += (idf_milli * 22 * c * s) // (
                (10 * c * s) + (3 * s) + (9 * dls[d] * n)
            )
        scores[d] = total
    want = sorted(scores.items(), key=lambda kv: (-kv[1], kv[0]))[:10]

    got = [(r.doc_id, r.score) for r in q_bm25(spark, SF_SMOKE).collect()]
    assert sorted(got, key=lambda kv: (-kv[1], kv[0])) == want


def test_hopping_counts_every_event_twice(spark):
    events = load_table(spark, SF_SMOKE, "events")
    per_type = {
        r.event_type: r.c
        for r in events.groupBy("event_type").agg(F.count("*").alias("c")).collect()
    }
    hop = REGISTRY["q_hopping"].fn(spark, SF_SMOKE)
    got = {
        r.event_type: r.total
        for r in hop.groupBy("event_type").agg(F.sum("n").alias("total")).collect()
    }
    assert got == {t: 2 * c for t, c in per_type.items()}
    # window starts are 1h apart and each window spans 2h
    starts = sorted({r.win_us for r in hop.collect()})
    assert all((b - a) % 3_600_000_000 == 0 for a, b in zip(starts, starts[1:]))


def test_anomaly_matches_python_reference(spark):
    events = load_table(spark, SF_SMOKE, "events").collect()
    by_type = {}
    for r in events:
        deci = round(r.value * 10)
        by_type.setdefault(r.event_type, []).append((r.event_id, deci))
    want = set()
    for rows in by_type.values():
        n = len(rows)
        s = sum(d for _, d in rows)
        q = sum(d * d for _, d in rows)
        for eid, d in rows:
            if (d * n - s) ** 2 > 9 * (n * q - s * s):
                want.add(eid)
    got = {r.event_id for r in REGISTRY["q_anomaly"].fn(spark, SF_SMOKE).collect()}
    assert got == want
