"""Local twin of the driver's correctness gate: run a registered query
on Spark and its oracle on DuckDB over the same parquet, compare
row-count + schema-arity + order-insensitive values (columns sorted by
name, rows sorted lexicographically, exact string equality)."""

from __future__ import annotations

import os

import duckdb
import pandas as pd

from core_spark.io import TABLES
from core_spark.plans.registry import REGISTRY


def duck_connection(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for col in df.columns:
        df[col] = df[col].map(lambda v: "∅" if v is None or v != v else str(v))
    df = df.sort_values(by=list(df.columns), kind="mergesort").reset_index(drop=True)
    return df


def compare(spark, name: str, sf_dir: str) -> None:
    q = REGISTRY[name]
    assert q.oracle is not None, f"{name} has no oracle"
    got = _normalize(q.fn(spark, sf_dir).toPandas())
    con = duck_connection(sf_dir)
    want = _normalize(con.execute(q.oracle).df())
    con.close()

    assert list(got.columns) == list(want.columns), (
        f"{name}: column mismatch {list(got.columns)} vs {list(want.columns)}"
    )
    assert len(got) == len(want), f"{name}: rowcount {len(got)} vs {len(want)}"
    diff_mask = (got.to_numpy() != want.to_numpy()).any(axis=1)
    if diff_mask.any():
        sample = pd.concat(
            [got[diff_mask].head(5), want[diff_mask].head(5)],
            keys=["spark", "duckdb"],
        )
        raise AssertionError(f"{name}: value mismatch\n{sample}")
