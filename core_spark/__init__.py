"""core_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of gazette/core (see SURVEY.md).

Spark-first design: the logical plan is declared with the DataFrame/SQL
API and Catalyst/Tungsten pick the physical strategy. Custom code exists
only where Gazette's message protocol has no Spark built-in (the
read-committed sequencer, the exactly-once sink protocol, the label
catalog) plus the LLM-data-pipeline operator superset (dedup families,
similarity search, text analysis, multimodal columns).

Layout:
  session     — SparkSession factory tuned for local[N] and cluster use
  io          — testdata loaders / view registration
  catalog     — JournalSpec/ShardSpec model, labels, selector matching
  functions/  — column-expression libraries (uuid, hashing, text)
  operators/  — sequencer (read-committed dedup), dedup families,
                similarity search, windows
  sources/    — journal directory layout: writer, fragment index, pruning
  plans/      — the declared query registry (Spark side + DuckDB oracles)
  streaming/  — streaming read-committed view, exactly-once sink, publisher
  multimodal/ — binary-column plumbing with stubbed codecs
"""

from core_spark.session import get_spark

__all__ = ["get_spark"]
