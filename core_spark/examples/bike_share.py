"""bike-share: CSV ride ingestion, windowed retention, cycle
detection, history API.

Reference: examples/bike-share — CSV rides journal (attach-uuids
stamped), SQLite-materialized state with: newest-20-per-bike retention
(sql_statements.go:54-58), recursive-CTE cycle detection (:64-103),
ride-history point lookups (:108-110), served via a query API.

Engine form: rides ingest through the CSV framing + attach_uuids; the
materialized state is the rides journal itself (windowed views replace
the windowed DELETE — retention is a *view* here, since journals are
immutable); queries are the same SQL over it.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window as W

RIDE_SCHEMA = (
    "bike_id long, start_time timestamp, end_time timestamp, "
    "start_station int, end_station int, trip_duration long"
)


def ingest_rides(spark: SparkSession, csv_lines: DataFrame) -> DataFrame:
    """Decode ride CSV lines and stamp ingest UUIDs
    (gazctl attach-uuids → csv framing, csv_framing.go:26-46)."""
    from core_spark.functions.framing import decode_journal
    from core_spark.streaming.publisher import attach_uuids

    decoded = decode_journal(
        csv_lines.withColumn("payload", F.encode("line", "UTF-8")),
        "text/csv",
        RIDE_SCHEMA,
    )
    return attach_uuids(
        decoded, producer_seed=F.lit("bike-share-ingest"), order=F.col("off")
    )


def recent_rides(rides: DataFrame, keep: int = 20) -> DataFrame:
    """Newest-`keep` rides per bike (the windowed DELETE as a view,
    sql_statements.go:54-58)."""
    w = W.partitionBy("bike_id").orderBy(
        F.desc("start_time"), F.desc("trip_duration")
    )
    return rides.withColumn("_rn", F.row_number().over(w)).filter(
        F.col("_rn") <= keep
    ).drop("_rn")


def bike_history(rides: DataFrame, bike_id: int) -> DataFrame:
    """Ride history point lookup (sql_statements.go:108-110)."""
    return rides.filter(F.col("bike_id") == bike_id).orderBy("start_time")


def detect_cycles(spark: SparkSession, rides: DataFrame, max_depth: int = 20) -> DataFrame:
    """Has this bike's recent path returned to its origin station?
    (recursive CTE, sql_statements.go:64-103)."""
    rides.createOrReplaceTempView("_bs_rides")
    return spark.sql(f"""
        WITH RECURSIVE ordered AS (
          SELECT * FROM (
            SELECT bike_id, end_station,
                   ROW_NUMBER() OVER (
                     PARTITION BY bike_id
                     ORDER BY start_time DESC, trip_duration DESC) AS rn
            FROM _bs_rides
          ) WHERE rn <= {max_depth}
        ),
        path(bike_id, rn, station, start_station, depth) AS (
          SELECT bike_id, rn, end_station, end_station, 1
          FROM ordered WHERE rn = 1
          UNION ALL
          SELECT o.bike_id, o.rn, o.end_station, p.start_station, p.depth + 1
          FROM path p JOIN ordered o
            ON o.bike_id = p.bike_id AND o.rn = p.rn + 1
          WHERE p.depth < {max_depth}
            AND (p.depth = 1 OR p.station <> p.start_station)
        )
        SELECT bike_id,
               MAX(depth) AS path_len,
               MAX(CASE WHEN depth > 1 AND station = start_station
                        THEN 1 ELSE 0 END) AS has_cycle
        FROM path GROUP BY bike_id
    """)
