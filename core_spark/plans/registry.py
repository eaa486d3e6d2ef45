"""Registry of declared queries.

Each entry pairs a Spark-side callable `(spark, sf_dir) -> DataFrame`
with an equivalent ANSI-SQL oracle string DuckDB runs on the same
parquet tables. The driver compares row-count + schema + order-
insensitive value hash, sorting columns by name — so every computed
column is aliased identically on both sides.

Queries whose semantics are not SQL-expressible (streaming stateful
ops) register with oracle=None and get a weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    name: str
    fn: QueryFn
    oracle: str | None
    doc: str | None


REGISTRY: dict[str, Query] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a declared query with its DuckDB oracle."""

    def deco(fn: QueryFn) -> QueryFn:
        REGISTRY[name] = Query(name=name, fn=fn, oracle=oracle, doc=fn.__doc__)
        return fn

    return deco
