"""Bucketized range join — non-equi time joins without the scale
killer.

A naive `l JOIN r ON r.ts BETWEEN l.ts - w AND l.ts` has no equi-key,
so Catalyst can only plan BroadcastNestedLoopJoin (or a cartesian) —
O(|l|·|r|) compared rows, the canonical 100 TB trap. The standard
bucketization fixes the shape: quantize time into buckets exactly one
window wide, probe each left row's bucket AND its predecessor (a
lookback strictly shorter than one bucket width can only span two),
equi-join on the bucket id, then apply the exact range predicate to
the candidates. The join becomes a plain shuffled hash/sort-merge
join keyed on bucket; compared rows drop from |l|·|r| to
Σ_b n_b·(n_b + n_{b-1}) — linear in data for bounded density.

Reference parity: gazette/core has no relational join tier at all
(SURVEY §2.4 — joins are composition patterns); this extends the
engine's join family the same way q_asof does, per the superset brief.
The plan shape (no nested-loop, bucket-keyed exchange) is pinned in
tests/test_plans.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_lookback_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    window_us: int,
    left_cols: list[str],
    right_cols: list[str],
) -> DataFrame:
    """Candidate pairs where right_ts ∈ [left_ts - window_us,
    left_ts), i.e. strictly-prior rows within the lookback window.

    Returns `left_cols` + `right_cols` for every qualifying pair.
    Times compare in integer microseconds (engine-portable; no float
    epoch). `window_us` is also the bucket width — the two-bucket
    probe is only correct for lookbacks ≤ one bucket, which this
    enforces by construction.

    `left_cols` and `right_cols` must be disjoint and must not use the
    reserved internal names — a general-purpose operator fails loudly
    here rather than emitting ambiguous or silently-dropped columns.
    """
    reserved = {"_bkt", "_lt", "_rt"}
    overlap = set(left_cols) & set(right_cols)
    if overlap:
        raise ValueError(
            f"left_cols and right_cols overlap on {sorted(overlap)}; "
            "alias one side before joining"
        )
    bad = (set(left_cols) | set(right_cols)) & reserved
    if bad:
        raise ValueError(f"column names {sorted(bad)} are reserved internals")

    def _bkt(ts_name: str) -> Column:
        # integer DIV, not float division — double loses sub-window
        # precision once unix_micros crosses 2^52 and misbuckets rows
        # at bucket boundaries (repo convention, e.g. the hour buckets
        # in plans/sketches.py z-order)
        return F.expr(f"unix_micros({ts_name}) DIV {window_us}")

    l_t = F.unix_micros(F.col(left_ts))
    probe = left.select(
        *left_cols,
        l_t.alias("_lt"),
        F.explode(
            F.array(_bkt(left_ts), _bkt(left_ts) - 1)
        ).alias("_bkt"),
    )
    build = right.select(
        *right_cols,
        F.unix_micros(F.col(right_ts)).alias("_rt"),
        _bkt(right_ts).alias("_bkt"),
    )
    return (
        probe.join(build, "_bkt")
        .filter(
            (F.col("_rt") < F.col("_lt"))
            & (F.col("_rt") >= F.col("_lt") - F.lit(window_us))
        )
        .drop("_bkt", "_lt", "_rt")
    )
