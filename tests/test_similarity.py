"""ANN tiers vs the exact baseline: determinism and recall floors for
hyperplane LSH and IVF over the embeddings table."""

import pytest

from pyspark.sql import functions as F

from core_spark.io import load_table
from core_spark.operators.similarity import (
    ann_ivf,
    ann_lsh,
    embed_near_dup,
    knn_bruteforce,
)
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


def _brute_pairs(spark, emb, threshold):
    """All-pairs twin of embed_near_dup's exact tier — the identical
    normalized-dot expression, so boundary rounding agrees."""
    from core_spark.operators.similarity import SPARK_DOT, SPARK_NORM

    vn = f"transform(v, x -> CAST(x AS DOUBLE) / ({SPARK_NORM.format(a='v')}))"
    base = emb.select(
        F.col("vec_id"), F.col("embedding").alias("v")
    ).select("vec_id", F.expr(vn).alias("vn"))
    a = base.select(F.col("vec_id").alias("a_id"), F.col("vn").alias("an"))
    b = base.select(F.col("vec_id").alias("b_id"), F.col("vn").alias("bn"))
    sim = f"round({SPARK_DOT.format(a='an', b='bn')}, 6)"
    return {
        (r.a_id, r.b_id)
        for r in a.join(b, F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", F.expr(sim).alias("sim"))
        .filter(F.col("sim") >= threshold)
        .collect()
    }


def test_embed_near_dup_precision_and_recall(spark):
    """Every returned pair truly clears the threshold (precision 1.0 —
    candidates are exact-verified), and banded SRP-LSH recovers a
    meaningful share of the brute-force pairs even on i.i.d. random
    vectors, the LSH-hostile case (P[plane agrees] ~0.61 at the 0.35
    threshold vs ~0.86 at a realistic 0.9 near-dup bar)."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    truth = _brute_pairs(spark, emb, 0.35)
    got = {
        (r.a_id, r.b_id)
        for r in embed_near_dup(emb, threshold=0.35).collect()
    }
    assert got <= truth, f"false positives: {sorted(got - truth)[:5]}"
    recall = len(got) / len(truth)
    assert recall >= 0.5, f"recall {recall:.2f} below floor ({len(truth)} true)"
    # ordered pairs, no self-pairs, deduped across bands
    assert all(a < b for a, b in got)
    assert len(got) == embed_near_dup(emb, threshold=0.35).count()


def test_embed_near_dup_tighter_bands_trade_recall(spark):
    """More planes per band shrink buckets: the candidate set (and so
    the result) can only lose pairs, never gain false ones."""
    emb = load_table(spark, SF_SMOKE, "embeddings")
    coarse = {
        (r.a_id, r.b_id)
        for r in embed_near_dup(emb, threshold=0.35, planes_per_band=4).collect()
    }
    truth = _brute_pairs(spark, emb, 0.35)
    fine = {
        (r.a_id, r.b_id)
        for r in embed_near_dup(emb, threshold=0.35, planes_per_band=8).collect()
    }
    assert fine <= truth
    assert len(fine) <= len(coarse)


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


def test_chunk_windows_cover_every_token(spark):
    """Chunking property: with size 32 / stride 24 the windows cover
    every token position, overlaps are exactly 8 tokens between
    consecutive full chunks, and chunk token counts reconstruct the
    document's token count."""
    from core_spark.plans.registry import REGISTRY
    from tests.conftest import SF_SMOKE

    from core_spark.io import load_table
    import pyspark.sql.functions as F

    chunks = REGISTRY["q_chunk"].fn(spark, SF_SMOKE).toPandas()
    docs = (
        load_table(spark, SF_SMOKE, "documents")
        .select("doc_id", F.size(F.split("text", " ")).alias("n"))
        .toPandas()
        .set_index("doc_id")["n"]
    )
    for doc_id, g in chunks.groupby("doc_id"):
        g = g.sort_values("chunk_id")
        n = int(docs.loc[doc_id])
        # every position covered: last chunk must reach the end
        last_start = int(g["chunk_id"].iloc[-1]) * 24
        assert last_start + int(g["chunk_tokens"].iloc[-1]) == n, doc_id
        # all but the last chunk are full-size
        assert (g["chunk_tokens"].iloc[:-1] == 32).all(), doc_id
        # consecutive full chunks overlap by 8 tokens
        if len(g) > 1:
            assert last_start < n <= last_start + 32, doc_id


def test_kmv_estimate_within_error_bound(spark):
    """The KMV sketch is deterministic (oracle-checked elsewhere);
    this checks it's also a *good* sketch: relative error within
    4 standard errors (4/sqrt(k-1) ~ 50% at k=64) of the exact
    distinct count for every group large enough to engage the
    sketch, and exact for groups below k."""
    from core_spark.plans.registry import REGISTRY
    from tests.conftest import SF_SMOKE

    rows = REGISTRY["q_kmv_distinct"].fn(spark, SF_SMOKE).collect()
    assert rows
    for r in rows:
        if r.kth_hash == -1:  # fewer than k distinct: exact by design
            assert r.est_distinct == r.exact_distinct
        else:
            rel = abs(r.est_distinct - r.exact_distinct) / r.exact_distinct
            assert rel < 0.5, (r.l_returnflag, r.est_distinct, r.exact_distinct)


def test_semdedup_drops_planted_duplicates(spark):
    """A planted exact copy of a corpus vector must share its cell and
    be dropped (cos = 1 to a lower id); the copy's source must be
    kept; every cell keeps its lowest-id member."""
    import pyspark.sql.functions as F

    from core_spark.io import load_table
    from core_spark.operators.similarity import semdedup
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    base = semdedup(emb, threshold=0.3, n_cells=16).toPandas()
    src = int(base.loc[base["kept"], "vec_id"].max())  # a surviving vector
    clone = emb.filter(F.col("vec_id") == src).withColumn(
        "vec_id", F.lit(100000).cast("long")
    )
    out = semdedup(emb.unionByName(clone), threshold=0.3, n_cells=16).toPandas()
    byid = out.set_index("vec_id")
    assert byid.loc[100000, "cell"] == byid.loc[src, "cell"]
    assert not byid.loc[100000, "kept"]
    assert byid.loc[100000, "max_prior"] == 1.0
    assert byid.loc[src, "kept"]
    # per-cell minimum id always survives (its max_prior is sentinel)
    firsts = out.loc[out.groupby("cell")["vec_id"].idxmin()]
    assert firsts["kept"].all()
    assert (firsts["max_prior"] == -2.0).all()


def test_semdedup_zero_vector_is_inert(spark):
    """An all-zero embedding must not NaN-poison its cell: it keeps
    itself (dot 0 with everything) and every other vector's verdict
    is unchanged."""
    import pyspark.sql.functions as F

    from core_spark.io import load_table
    from core_spark.operators.similarity import semdedup
    from tests.conftest import SF_SMOKE

    emb = load_table(spark, SF_SMOKE, "embeddings")
    base = semdedup(emb, threshold=0.3, n_cells=16).toPandas()
    zero = emb.limit(1).select(
        F.lit(200000).cast("long").alias("vec_id"),
        F.expr("transform(embedding, x -> CAST(0.0 AS FLOAT))").alias(
            "embedding"
        ),
        "label",
    )
    out = semdedup(
        emb.unionByName(zero), threshold=0.3, n_cells=16
    ).toPandas()
    byid = out.set_index("vec_id")
    assert byid.loc[200000, "kept"]  # dissimilar to everything
    merged = out[out["vec_id"] != 200000].set_index("vec_id")
    basei = base.set_index("vec_id")
    assert (merged["kept"] == basei["kept"]).all()
    assert (merged["max_prior"] == basei["max_prior"]).all()


def test_hard_negatives_matches_bruteforce_within_cell(spark):
    """The per-cell kernel's different-label top-k must equal an
    independent numpy brute force over the same cell assignment —
    including distance ties broken by id and labels with no
    negatives available (singleton-label cells emit nothing for
    queries whose cell holds only their own label)."""
    import numpy as np

    from core_spark.operators.similarity import (
        hard_negatives,
        ivf_assign,
        ivf_centroids,
    )

    rng = np.random.default_rng(11)
    n, dim = 40, 8
    vecs = rng.integers(-999, 999, size=(n, dim)) / 1000.0
    vecs[5] = vecs[9]  # exact duplicate -> guaranteed cosine tie
    labels = [i % 3 for i in range(n)]
    df = spark.createDataFrame(
        [
            (i, [float(np.float32(x)) for x in vecs[i]], labels[i])
            for i in range(n)
        ],
        "vec_id long, embedding array<float>, label int",
    )

    got = {
        (r.qid, r.vec_id): (r.neg_label, r.sim)
        for r in hard_negatives(df, k=2, n_cells=4).collect()
    }

    # independent reference: reuse the engine's cell assignment (the
    # quantizer is not under test here), then numpy-normalize + dot
    c = df.selectExpr("vec_id", "embedding as _v")
    cells = {
        r.vec_id: r.cell
        for r in ivf_assign(
            c, ivf_centroids(df, 4), "_v", "vec_id", 1
        ).collect()
    }
    norm = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12)
    want = {}
    for q in range(n):
        cand = [
            j
            for j in range(n)
            if j != q and cells[j] == cells[q] and labels[j] != labels[q]
        ]
        scored = sorted(
            ((-(norm[q] @ norm[j]).round(9), j) for j in cand)
        )[:2]
        for negd, j in scored:
            want[(q, j)] = labels[j]
    assert set(got) == set(want)
    for key, (neg_label, sim) in got.items():
        assert neg_label == want[key]
        assert -1.000001 <= sim <= 1.000001


def test_embed_near_dup_auto_width_tracks_corpus(spark):
    """planes_per_band="auto" holds expected bucket occupancy
    constant: small corpora degrade to the default width (identical
    results), and the width grows as log2(n/target) — the property
    that keeps candidate work linear at 100x (the r6 probe caught
    the fixed-width kernel going quadratic there)."""
    import math

    from pyspark.sql import functions as F

    from core_spark.operators.similarity import embed_near_dup

    # deterministic little corpus: md5-derived vectors
    n = 400
    vecs = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.expr(
            "transform(sequence(0, 15), i -> "
            "CAST((CAST(conv(substring(md5(concat(CAST(id AS STRING), ':',"
            " CAST(i AS STRING))), 1, 8), 16, 10) AS BIGINT) % 2000 - 1000)"
            " / 1000.0 AS FLOAT))"
        ).alias("embedding"),
    )
    fixed = embed_near_dup(
        vecs, threshold=0.3, dims=16, planes_per_band=4
    ).collect()
    auto = embed_near_dup(
        vecs, threshold=0.3, dims=16, planes_per_band="auto"
    ).collect()
    # n=400 < 16*256 so auto resolves to the same 4-plane bands
    assert sorted(map(tuple, auto)) == sorted(map(tuple, fixed))

    # the width formula itself
    for n_c, want in [(100, 4), (4096, 4), (16 * 256 + 1, 5),
                      (200_000, 10), (10**9, 22)]:
        got = max(4, math.ceil(math.log2(max(2.0, n_c / 256))))
        assert got == want, (n_c, got)


def test_embed_near_dup_tiled_kernel_equals_untiled(spark):
    """A bucket larger than one tile must produce the identical pair
    set (the blocked enumeration is a memory bound, not a semantic
    change): force everything into few buckets with 1-plane bands and
    compare against brute force."""
    import numpy as np

    from pyspark.sql import functions as F

    from core_spark.operators.similarity import embed_near_dup

    n, dims = 300, 8
    rng = np.random.default_rng(3)
    data = [(i, [float(x) for x in rng.uniform(-1, 1, dims)])
            for i in range(n)]
    vecs = spark.createDataFrame(
        data, "vec_id long, embedding array<float>"
    )
    got = {
        (r.a_id, r.b_id): r.sim
        for r in embed_near_dup(
            vecs, threshold=0.5, dims=dims, bands=2, planes_per_band=1
        ).collect()
    }
    # brute force over float32-cast vectors (the Spark side reads
    # array<float>), rounded like the operator
    import itertools

    v = np.array([np.array(e, dtype=np.float32).astype(np.float64)
                  for _i, e in data])
    v = v / np.linalg.norm(v, axis=1, keepdims=True)
    # 1-plane bands: pair candidates = same sign bucket in either band
    from core_spark.operators.similarity import hyperplanes

    planes = [hyperplanes(1, dims, seed=f"nd:{b}") for b in range(2)]
    raw = np.array([np.array(e, dtype=np.float32).astype(np.float64)
                    for _i, e in data])
    expect = {}
    for i, j in itertools.combinations(range(n), 2):
        cand = any(
            (raw[i] @ np.array(p[0]) >= 0) == (raw[j] @ np.array(p[0]) >= 0)
            for p in planes
        )
        if not cand:
            continue
        sim = round(float(v[i] @ v[j]), 6)
        if sim >= 0.5:
            expect[(i, j)] = sim
    assert set(got) == set(expect)


def test_semdedup_tiled_prior_multi_tile_and_auto(spark):
    """Force one cell larger than a kernel tile (n > 2048) and check
    the blocked prior against an untiled numpy reference; also pin
    that n_cells="auto" floors to the default at demo scale."""
    import numpy as np

    from pyspark.sql import functions as F

    from core_spark.operators.similarity import SEMDEDUP_SENTINEL, semdedup

    n, dims = 2200, 8
    rng = np.random.default_rng(9)
    mat = rng.uniform(-1, 1, (n, dims))
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in mat[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    # n_cells=1: every vector in one cell -> the kernel must tile
    got = {
        r.vec_id: r.max_prior
        for r in semdedup(vecs, threshold=0.9, n_cells=1).collect()
    }
    v = np.array([np.array([np.float32(x) for x in mat[i]], dtype=np.float64)
                  for i in range(n)])
    nrm = np.linalg.norm(v, axis=1)
    nrm[nrm == 0] = 1.0
    v = v / nrm[:, None]
    s = v @ v.T
    for j in range(n):
        want = SEMDEDUP_SENTINEL if j == 0 else round(float(s[:j, j].max()), 6)
        assert abs(got[j] - want) < 2e-6, (j, got[j], want)

    small = vecs.limit(200)
    a = sorted(map(tuple, semdedup(small, n_cells="auto").collect()))
    b = sorted(map(tuple, semdedup(small, n_cells=16).collect()))
    assert a == b


def test_ivf_assign_kernel_agrees_with_join_form(spark):
    """The Arrow argmax kernel (scale path: rows stay linear, the
    n x C surface is in-kernel flops) must assign every vector to the
    same cell as the oracle-pinned join formulation — same
    dimension-major fold, same rounded-cosine + lowest-cent_id
    tie-break."""
    import numpy as np

    from pyspark.sql import functions as F

    from core_spark.operators.similarity import (
        ivf_assign,
        ivf_assign_kernel,
        ivf_centroids,
    )

    n, dims = 700, 16
    rng = np.random.default_rng(21)
    vecs = spark.createDataFrame(
        [(i, [float(x) for x in rng.uniform(-1, 1, dims)])
         for i in range(n)],
        "vec_id long, embedding array<float>",
    )
    c = vecs.select("vec_id", F.col("embedding").alias("_v"))
    cents = ivf_centroids(vecs, 24)
    join_form = {
        r.vec_id: r.cell
        for r in ivf_assign(c, cents, "_v", "vec_id", 1).collect()
    }
    kernel = {
        r.vec_id: r.cell
        for r in ivf_assign_kernel(c, cents, "_v", "vec_id").collect()
    }
    assert kernel == join_form


def test_auto_width_formula_matches_duckdb_across_decades():
    """The scale-safe queries hash-check only if Python's auto band
    width / cell count (similarity.py) and the oracle's scalar CTE
    (llmops.py) agree at EVERY corpus size — pin the two formulas
    against each other across the decades the engine targets."""
    import math

    import duckdb

    from core_spark.plans.llmops import _DUCK_CELLS, _DUCK_ND_W

    sizes = [
        1, 2, 255, 256, 257, 511, 512, 513, 1023, 1024, 1025, 2048,
        4096, 4097, 5000, 65536, 65537, 200_000, 1_000_000,
        10_000_000, 4_294_967_296,
    ]
    from core_spark.plans.sketches import _DUCK_BLOOM_M, _bloom_auto_m

    for n in sizes:
        py_w = max(4, math.ceil(math.log2(max(2.0, n / 256))))
        py_c = max(16, n // 1024)
        py_m = _bloom_auto_m(n)
        exprs = f"{_DUCK_ND_W} AS w, {_DUCK_CELLS} AS c, {_DUCK_BLOOM_M} AS m"
        got = duckdb.sql(
            f"SELECT {exprs} FROM (SELECT unnest(range({n})))"
            if n <= 1_000_000
            else "SELECT " + exprs.replace("COUNT(*)", str(n))
        ).fetchone()
        assert got == (py_w, py_c, py_m), (
            f"n={n}: duck={got} py=({py_w}, {py_c}, {py_m})"
        )


@pytest.mark.slow
def test_dedup_embed_auto_oracle_holds_in_dynamic_width_region(spark):
    """At driver scales the auto width resolves to the demo value
    (4); this is the cross-engine check IN the dynamic region: a 5000
    -vector corpus (width 5, 19 cells) run through the registered
    q_auto_embed_dedup / q_cell_semdedup Spark paths AND their
    DuckDB oracles — the hash-exactness claim the queries make at
    scale, exercised where fixed and auto genuinely diverge."""
    import math

    import numpy as np
    import pandas as pd
    import duckdb

    from core_spark.plans.registry import REGISTRY
    from tests.oracle_check import _normalize

    n, dims = 5000, 64
    assert max(4, math.ceil(math.log2(max(2.0, n / 256)))) == 5
    rng = np.random.default_rng(7)
    base = rng.standard_normal((n, dims)).astype(np.float32)
    # plant near-dups so the pair set is non-trivial
    for i in range(0, 400, 2):
        base[i + 1] = base[i] + 0.05 * rng.standard_normal(dims).astype(
            np.float32
        )
    pdf = pd.DataFrame(
        {
            "vec_id": np.arange(n, dtype=np.int64),
            "embedding": [r for r in base],
            "label": (np.arange(n) % 7).astype(np.int32),
        }
    )
    import tempfile, os

    with tempfile.TemporaryDirectory() as td:
        con = duckdb.connect()
        con.register("pdf", pdf)
        con.execute(
            "COPY (SELECT vec_id, CAST(embedding AS FLOAT[]) AS embedding,"
            " label FROM pdf) TO "
            f"'{os.path.join(td, 'embeddings.parquet')}' (FORMAT PARQUET)"
        )
        con.execute(
            "CREATE VIEW embeddings AS SELECT * FROM "
            f"'{os.path.join(td, 'embeddings.parquet')}'"
        )
        for name in ("q_auto_embed_dedup", "q_cell_semdedup"):
            q = REGISTRY[name]
            got = _normalize(q.fn(spark, td).toPandas())
            want = _normalize(con.execute(q.oracle).df())
            assert len(got) == len(want), (
                f"{name}: rows {len(got)} vs {len(want)}"
            )
            assert got.equals(want), f"{name}: value mismatch in auto region"
        con.close()


def test_knn_filtered_equals_brute_force_within_label(spark):
    """Filtered search == brute force over the label-filtered corpus,
    per query — the equi-join predicate loses nothing."""
    from pyspark.sql import functions as F

    from core_spark.operators.similarity import knn_bruteforce, knn_filtered

    emb = spark.createDataFrame(
        [
            (i, [float((i * 7 + d * 3) % 11 - 5) for d in range(8)], i % 3)
            for i in range(60)
        ],
        "vec_id long, embedding array<float>, label int",
    )
    queries = emb.filter(F.col("vec_id") < 4)
    got = {
        (r.qid, r.vec_id, r.sim)
        for r in knn_filtered(queries, emb, on=["label"], k=3).collect()
    }
    want = set()
    for q in queries.collect():
        sub = emb.filter(F.col("label") == q.label)
        for r in knn_bruteforce(
            queries.filter(F.col("vec_id") == q.vec_id), sub, k=3
        ).collect():
            want.add((r.qid, r.vec_id, r.sim))
    assert got == want
