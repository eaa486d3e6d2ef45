"""q_bayes_quality learns when there is something to learn.

The registered query trains on the synthetic corpus, whose languages
all draw from one shared vocabulary — real-valued NB collapses to the
class prior there, and the integer-quantized operator must do the
same (that equivalence is the oracle's job). This test gives the SAME
operator a corpus with genuine class-conditional vocabulary and pins
that it separates the classes — the learning machinery (per-class
token counts, Laplace smoothing, priors, symmetric bit-length margin)
is real, the production fixture just has nothing to learn.
"""

import duckdb
import pytest

from core_spark.plans.registry import REGISTRY

TABLES = (
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
)


@pytest.fixture(scope="module")
def vocab_sf(tmp_path_factory):
    """An sf dir whose documents have class-conditional vocabulary:
    'en' docs speak breakfast, everything else speaks infrastructure,
    with a handful of shared stopwords and a few mixed-in loanwords
    so the margin isn't degenerate."""
    import shutil

    src = "/root/testdata/sf0.001"
    sf = tmp_path_factory.mktemp("nb") / "sf"
    sf.mkdir()
    for t in TABLES:
        shutil.copy(f"{src}/{t}.parquet", sf / f"{t}.parquet")

    en_vocab = ["toast", "jam", "butter", "scone", "tea", "crumpet"]
    xx_vocab = ["conduit", "gasket", "flange", "valve", "manifold"]
    shared = ["the", "a", "and"]
    rows = []
    for i in range(120):
        en = i % 2 == 0
        vocab = en_vocab if en else xx_vocab
        loan = (xx_vocab if en else en_vocab)[i % 5]
        words = [vocab[(i + k) % len(vocab)] for k in range(12)]
        words += [shared[k % 3] for k in range(4)]
        if i % 7 == 0:  # sparse cross-class loanwords
            words.append(loan)
        rows.append(
            (i, " ".join(words), "en" if en else "fr", "srcT",
             len(" ".join(words)))
        )
    import pandas as pd

    docs = pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )
    con = duckdb.connect()
    con.register("nbdocs", docs)
    con.execute(
        "COPY (SELECT doc_id, text, lang, source,"
        " CAST(n_chars AS BIGINT) AS n_chars FROM nbdocs)"
        f" TO '{sf / 'documents.parquet'}' (FORMAT parquet)"
    )
    con.close()
    return str(sf)


def test_nb_separates_distinct_vocabularies(spark, vocab_sf):
    q = REGISTRY["q_bayes_quality"]
    out = {r.doc_id: r for r in q.fn(spark, vocab_sf).collect()}
    assert len(out) == 120
    correct = sum(
        1 for r in out.values() if r.pred_en == r.label_en
    )
    assert correct / len(out) > 0.95, f"{correct}/120 correct"
    # margins carry real signal, not a constant prior
    margins = {r.margin_bits for r in out.values()}
    assert len(margins) > 2
    assert max(abs(r.margin_bits) for r in out.values()) > 20


def test_nb_margin_products_inside_int64(spark, vocab_sf):
    """The documented envelope: (max class word count + 1) *
    (class tokens + V) must stay far below 2^63 — assert the proxy
    on both the constructed corpus and the real sf0.001 fixture."""
    from pyspark.sql import functions as F

    from core_spark.io import load_table

    for sf in (vocab_sf, "/root/testdata/sf0.001"):
        docs = load_table(spark, sf, "documents")
        toks = docs.select(
            F.explode(F.split("text", " ")).alias("w")
        ).filter(F.col("w") != "")
        stats = toks.groupBy("w").count().agg(
            F.max("count").alias("cmax"), F.sum("count").alias("tot"),
            F.count("*").alias("v"),
        ).collect()[0]
        assert (stats.cmax + 1) * (stats.tot + stats.v) < 2**62
