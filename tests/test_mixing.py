"""Water-filling allocation: the closed-form window formulation in
plans/mixing.py must equal an imperative reference on arbitrary
domain tables (the oracle shares the formulation, so test_oracle
alone could not catch a shared derivation bug)."""

import pytest

from hypothesis import given, settings
from hypothesis import strategies as st

from core_spark.plans.mixing import _MIX_DEN, _MIX_NUM, waterfill_alloc


def reference_waterfill(tokens: list[int]) -> list[int]:
    """Imperative water-filling: largest integer level L with
    sum(min(n_i, L)) <= B, then +1 leftovers to the capped domains
    in sorted order."""
    total = sum(tokens)
    budget = total * _MIX_NUM // _MIX_DEN
    order = sorted(range(len(tokens)), key=lambda i: (tokens[i], i))
    if budget >= total:
        return list(tokens)
    lo, hi = 0, max(tokens)
    while lo < hi:  # binary-search the level
        mid = (lo + hi + 1) // 2
        if sum(min(n, mid) for n in tokens) <= budget:
            lo = mid
        else:
            hi = mid - 1
    level = lo
    alloc = [min(n, level) for n in tokens]
    rem = budget - sum(alloc)
    for i in order:
        if rem == 0:
            break
        if tokens[i] > level:
            alloc[i] += 1
            rem -= 1
    assert rem == 0
    return alloc


@settings(max_examples=30, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=10_000), min_size=1, max_size=12)
)
@pytest.mark.slow
def test_waterfill_matches_reference(spark, tokens):
    rows = [(f"src{i:02d}", n) for i, n in enumerate(tokens)]
    df = spark.createDataFrame(rows, "source string, n_tokens long")
    got = {
        r["source"]: r["alloc_tokens"]
        for r in waterfill_alloc(df).collect()
    }
    want = reference_waterfill(tokens)
    assert got == {f"src{i:02d}": a for i, a in enumerate(want)}


def test_waterfill_caps_and_exhausts_budget(spark):
    tokens = [5, 50, 500, 5000]
    df = spark.createDataFrame(
        [(f"s{i}", n) for i, n in enumerate(tokens)],
        "source string, n_tokens long",
    )
    out = {r["source"]: r["alloc_tokens"] for r in waterfill_alloc(df).collect()}
    budget = sum(tokens) * _MIX_NUM // _MIX_DEN
    assert sum(out.values()) == budget
    # small domains fully funded, the big one capped
    assert out["s0"] == 5 and out["s1"] == 50 and out["s2"] == 500
    assert out["s3"] < 5000


# --------------------------------------------------------------- bpe train
def _reference_bpe(words: list[str], rounds: int):
    """Imperative reference for q_bpe_train's semantics: weighted
    adjacent-pair counts over the vocab, winner by (count desc, pair
    asc) among p1 != p2, leftmost-greedy merge application."""
    from collections import Counter

    vocab = Counter(w for w in words if len(w) >= 2)
    segs = {w: [c for c in w] for w in vocab}
    merges = []
    for _ in range(rounds):
        counts = Counter()
        for w, cnt in vocab.items():
            s = segs[w]
            for i in range(len(s) - 1):
                if s[i] != s[i + 1]:
                    counts[(s[i], s[i + 1])] += cnt
        if not counts:
            break
        n_max = max(counts.values())
        p1, p2 = min(p for p, n in counts.items() if n == n_max)
        merges.append((p1, p2, n_max))
        for w, s in segs.items():
            out, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == p1 and s[i + 1] == p2:
                    out.append(p1 + p2)
                    i += 2
                else:
                    out.append(s[i])
                    i += 1
            segs[w] = out
    return merges


@settings(max_examples=10, deadline=None)
@given(
    st.lists(
        st.text(alphabet="abcd", min_size=2, max_size=6),
        min_size=3,
        max_size=30,
    )
)
@pytest.mark.slow
def test_bpe_train_matches_imperative_reference(spark, words):
    """The declarative merge rounds (position-local array expression +
    one-row broadcast winner) must equal an imperative leftmost-greedy
    BPE on arbitrary vocabularies — the Spark and DuckDB formulations
    share the expression, so the oracle alone can't catch a shared
    derivation bug. Exercises overlap-adjacent runs ('abab', 'aabb')
    the corpus data may not."""
    import os
    import tempfile

    from core_spark.plans.registry import REGISTRY

    want = _reference_bpe(words, rounds=3)
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(0, " ".join(words), "en", "src0", len(words))],
            "doc_id long, text string, lang string, source string, n_chars long",
        ).coalesce(1).write.parquet(os.path.join(d, "documents.parquet"))
        got = [
            (r.p1, r.p2, r.n_merge)
            for r in REGISTRY["q_bpe_train"].fn(spark, d).collect()
        ]
    assert got == want, (words, got, want)
