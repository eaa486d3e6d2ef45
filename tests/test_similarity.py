"""ANN tiers vs the exact baseline: determinism and recall floors for
hyperplane LSH and IVF over the embeddings table."""

from pyspark.sql import functions as F

from core_spark.io import load_table
from core_spark.operators.similarity import ann_ivf, ann_lsh, knn_bruteforce
from tests.conftest import SF_SMOKE


def _topk(df):
    out = {}
    for r in df.collect():
        out.setdefault(r.qid, set()).add(r.vec_id)
    return out


def test_ivf_recall_vs_bruteforce(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    exact = _topk(knn_bruteforce(queries, emb, k=3))
    ivf = _topk(ann_ivf(queries, emb, k=3, n_cells=16, nprobe=2))

    hits = total = 0
    for qid, want in exact.items():
        got = ivf.get(qid, set())
        hits += len(want & got)
        total += len(want)
    recall = hits / total
    # random synthetic embeddings are ANN-hostile; the probe of 2/16
    # cells still has to find a meaningful share of true neighbors
    assert recall >= 0.2, f"IVF recall {recall:.2f} below floor"
    # determinism: a second run returns the identical result
    again = _topk(ann_ivf(queries, emb, k=3, n_cells=16, nprobe=2))
    assert again == ivf


def test_ivf_every_query_gets_k(spark):
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    out = ann_ivf(queries, emb, k=3, n_cells=16, nprobe=2)
    counts = {r.qid: r.n for r in out.groupBy("qid").agg(F.count("*").alias("n")).collect()}
    assert set(counts) == set(range(10))
    assert all(n <= 3 for n in counts.values())
    # nprobe=2 over cells of ~N/16 vectors: every query should find
    # at least k candidates in this corpus
    assert all(n == 3 for n in counts.values())


def test_lsh_vs_ivf_both_subsets_of_plausible(spark):
    """Both ANN tiers return only pairs that exist in the corpus and
    never self-pairs."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    ids = {r.vec_id for r in emb.select("vec_id").collect()}
    for df in (
        ann_lsh(queries, emb, k=3, n_planes=8, dims=64),
        ann_ivf(queries, emb, k=3),
    ):
        for r in df.collect():
            assert r.vec_id in ids and r.vec_id != r.qid
