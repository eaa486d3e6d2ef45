"""Query plan library: the declared query set (SURVEY.md §2.9) plus the
LLM-data-pipeline superset, each as a (Spark callable, DuckDB oracle SQL)
pair registered in `core_spark.plans.registry.REGISTRY`."""

from core_spark.plans.registry import REGISTRY, Query, query

# Import for registration side effects.
from core_spark.plans import relational  # noqa: E402,F401
from core_spark.plans import message  # noqa: E402,F401
from core_spark.plans import llmops  # noqa: E402,F401
from core_spark.plans import streaming_queries  # noqa: E402,F401
from core_spark.plans import superset  # noqa: E402,F401
from core_spark.plans import multimodal_queries  # noqa: E402,F401
from core_spark.plans import journal_queries  # noqa: E402,F401
from core_spark.plans import tpch_deep  # noqa: E402,F401
from core_spark.plans import curation  # noqa: E402,F401
from core_spark.plans import scrub  # noqa: E402,F401
from core_spark.plans import sketches  # noqa: E402,F401
from core_spark.plans import ranking  # noqa: E402,F401
from core_spark.plans import queryable_state  # noqa: E402,F401
from core_spark.plans import mixing  # noqa: E402,F401
from core_spark.plans import clustering  # noqa: E402,F401
from core_spark.plans import packing  # noqa: E402,F401

__all__ = ["REGISTRY", "Query", "query"]
