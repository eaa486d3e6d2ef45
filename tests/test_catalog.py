"""Catalog: Python-side selector matching must agree with the Spark
column predicate (label_extensions.go:246-352 semantics)."""

import pytest

from core_spark.catalog import (
    FIXTURE_JOURNALS,
    LabelSelector,
    journals_df,
)

SELECTORS = [
    LabelSelector(include={"message-type": ("bike_share.Ride",)}),
    LabelSelector(include={"region": ()}),  # any value of the name
    LabelSelector(exclude={"region": ("eu-west1",)}),
    LabelSelector(include={"content-type": ("application/x-ndjson",)},
                  exclude={"tier": ("ops",)}),
    LabelSelector(prefix_includes={"prefix": ("examples/word-count/",)}),
    LabelSelector(include={"name": ("ops/metrics",)}),
    LabelSelector(include={"message-type": ("stream_sum.Chunk", "stream_sum.Sum")}),
]


@pytest.mark.parametrize("sel", SELECTORS)
def test_python_and_spark_agree(spark, sel):
    py = {s.name for s in FIXTURE_JOURNALS if sel.matches(s)}
    sp = {
        r.name
        for r in journals_df(spark).filter(sel.to_column()).select("name").collect()
    }
    assert py == sp
    assert py, f"selector matched nothing: {sel}"  # fixtures cover each case


def test_exclude_only_rejects():
    sel = LabelSelector(include={"tier": ("ops",)}, exclude={"region": ()})
    # ops/metrics has a region label -> excluded; ops/broker-logs doesn't
    assert {s.name for s in FIXTURE_JOURNALS if sel.matches(s)} == {
        "ops/broker-logs"
    }
