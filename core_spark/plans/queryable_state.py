"""Queryable-state declared queries: results served FROM a fenced
SQL materialization, not from the source scan.

The reference's most-used consumer pattern is "materialize the stream
into a SQL store inside the consumer transaction, serve reads from
the table" — bike-share runs entirely on it
(examples/bike-share/application.go:134-199, consumer/store_sql.go).
q_bike_cycles is that pattern end-to-end: events (bike rides, with
user_id as the bike and event_type as the station) land in a sqlite
`rides` table through SQLStore's fence-checkpointed commit, and the
cycle detection runs as SQL *against the store* (the QueryCycleStmt
analog), so the driver's hash check covers the whole
materialize-then-serve path, not just a Spark plan.

100 TB shape: the store holds one shard's serving state — here the
ride log of the queried key-range — while the fleet-scale work
(routing, aggregation) stays in Spark. The materialization streams
via toLocalIterator (one-partition-bounded memory); see
streaming/store_sql.py for the sizing contract.
"""

from __future__ import annotations

import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from core_spark.io import load_table
from core_spark.plans.registry import query
from core_spark.streaming.store_sql import SQLStore

_CYCLES_SQL = """
WITH r AS (
  SELECT user_id, station,
         FIRST_VALUE(station) OVER (
           PARTITION BY user_id ORDER BY event_id) AS start_station
  FROM rides)
SELECT user_id,
       COUNT(*) AS rides,
       SUM(CASE WHEN station = start_station THEN 1 ELSE 0 END) - 1
         AS returns
FROM r GROUP BY user_id
HAVING SUM(CASE WHEN station = start_station THEN 1 ELSE 0 END) - 1 >= 1
ORDER BY user_id
"""


@query(
    "q_bike_cycles",
    oracle="""
    WITH r AS (
      SELECT user_id, event_type AS station,
             FIRST_VALUE(event_type) OVER (
               PARTITION BY user_id ORDER BY event_id) AS start_station
      FROM events)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS rides,
           CAST(SUM(CASE WHEN station = start_station THEN 1 ELSE 0 END) - 1
                AS BIGINT) AS returns
    FROM r GROUP BY user_id
    HAVING SUM(CASE WHEN station = start_station THEN 1 ELSE 0 END) - 1 >= 1
    ORDER BY user_id
    """,
)
def q_bike_cycles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bike-share cycles through the remote-SQL store: materialize the
    ride log into sqlite under the gazette_checkpoints fence, then
    serve "bikes that returned to their start station" from the TABLE
    (count of returns to the first-seen station per bike, bikes with
    >= 1 return). The DuckDB oracle computes the same thing straight
    from the events parquet — a hash match proves the materialization
    is lossless AND the store-side SQL agrees with the declarative
    form. Reference: QueryCycleStmt served from the SQLStore,
    examples/bike-share/application.go:134-199."""
    tmp = tempfile.mkdtemp(prefix="bike_store_")
    try:
        store = SQLStore(os.path.join(tmp, "state.db"), shard="cycles-0")
        rides = load_table(spark, sf_dir, "events").select(
            "event_id",
            "user_id",
            F.col("event_type").alias("station"),
        )
        store.materialize("rides", rides, batch_id=0, key_cols=("event_id",))
        rows = store.query(_CYCLES_SQL)
        store.close()
        return spark.createDataFrame(
            [(int(u), int(r), int(c)) for u, r, c in rows],
            "user_id bigint, rides bigint, returns bigint",
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
