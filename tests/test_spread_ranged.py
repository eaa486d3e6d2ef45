"""spread_ranged + sortWithinPartitions == orderBy (r13 opt).

The kernel-query presentation-sort conversion (io.py:spread_ranged)
rests on two guarantees this file pins executably:

1. Range-partitioning the INPUT by the leading sort key and sorting
   within partitions yields the identical total row order as a global
   orderBy — for any per-row fan-out kernel that passes the key
   through (equal keys land in one partition; partitions collect in
   range order).
2. The converted plan really is kernel-runs-once: no Exchange may
   appear ABOVE the Python stage (the global orderBy spelling put a
   rangepartitioning Exchange there, whose bound sampling executed
   the kernel subtree a second time).
"""

from typing import Iterator

import pandas as pd

from core_spark.io import spread_ranged
from core_spark.plans.registry import REGISTRY
from tests.conftest import SF_SMOKE


def test_ranged_local_sort_equals_global_orderby(spark):
    # local def: pickled by value, so Python workers need no import
    def _fanout(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # 1..(k%3+1) output rows per input row, deliberately emitted
        # in REVERSE sub-order so only the within-partition sort can
        # restore the global (k, j) order.
        for pdf in batches:
            rows = []
            for k in pdf["k"]:
                n = int(k) % 3 + 1
                for j in reversed(range(n)):
                    rows.append((int(k), j))
            yield pd.DataFrame(rows, columns=["k", "j"])

    df = spark.range(0, 997).selectExpr(
        "cast(pmod(id * 2654435761, 1000003) as long) as k"
    )
    ranged = (
        spread_ranged(df, "k")
        .mapInPandas(_fanout, schema="k long, j long")
        .sortWithinPartitions("k", "j")
    )
    global_sorted = (
        df.repartition(32)
        .mapInPandas(_fanout, schema="k long, j long")
        .orderBy("k", "j")
    )
    assert [tuple(r) for r in ranged.collect()] == [
        tuple(r) for r in global_sorted.collect()
    ]


def test_spread_width_is_core_budget_locally_and_byte_scaled(spark):
    """r14 size-aware spread width (io.py:_spread_width): local
    fixture-sized inputs must keep width == defaultParallelism (the
    committed plans/bench numbers depend on it), while the byte term
    takes over for corpus-scale estimates."""
    from core_spark.io import (
        _SPREAD_TARGET_BYTES,
        _SPREAD_UNKNOWN,
        _spread_width,
        load_table,
    )

    cores = spark.sparkContext.defaultParallelism
    docs = load_table(spark, SF_SMOKE, "documents")
    assert _spread_width(docs) == cores  # ~KBs: core budget wins
    # A kernel output (non-estimable stats) must not explode the width.
    def _ident(batches):
        yield from batches

    k = docs.select("doc_id").mapInPandas(_ident, schema="doc_id long")
    assert _spread_width(k) == cores
    # The scale arm of the formula itself (pure arithmetic contract):
    est = 100 * _SPREAD_TARGET_BYTES
    assert max(cores, min(1_000_000, est // _SPREAD_TARGET_BYTES)) == max(
        cores, 100
    )
    assert _SPREAD_UNKNOWN > 1 << 40  # sanity: petabyte inputs still scale


def test_converted_query_has_no_exchange_above_kernel(spark):
    # representative converted query: q_cc_pdf (the conversion's
    # prototype) — the formatted plan must place every Exchange
    # BELOW the (fused) MapInPandas stage.
    df = REGISTRY["q_cc_pdf"].fn(spark, SF_SMOKE)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
            "formatted"
        )
    )
    tree = plan.split("\n\n")[0]
    lines = [ln for ln in tree.splitlines() if ln.strip()]
    kernel_rows = [
        i for i, ln in enumerate(lines) if "MapInPandas" in ln
    ]
    exchange_rows = [i for i, ln in enumerate(lines) if "Exchange" in ln]
    assert kernel_rows and exchange_rows
    # formatted tree prints root first: "above" = smaller index
    assert min(exchange_rows) > max(kernel_rows), (
        "an Exchange sits above the kernel stage — the presentation "
        "sort regressed to the double-executing global orderBy:\n"
        + tree
    )
    assert "rangepartitioning" in plan.lower(), (
        "input exchange lost its range keying:\n" + plan
    )
