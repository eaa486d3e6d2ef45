"""Journal as a first-class Spark data source (batch + streaming).

This is the MessageProducer override point made real
(consumer/interfaces.go:117-141: an application replacing the default
message production path; SURVEY §2.7): instead of tailing a file glob,
`spark.readStream.format("journal")` consumes a journal through its
OWN manifest — offsets are journal byte/record offsets, micro-batch
planning is fragment pruning, and progress is exactly the reference's
read-through offset.

Built on the Spark 4 Python Data Source API:
- batch: one InputPartition per fragment; each task reads its
  fragment's parquet via pyarrow and yields Arrow RecordBatches
  (zero row-at-a-time Python).
- streaming: offsets are {"next": <journal offset>}; latestOffset()
  re-reads the manifest (the tail poll — broker/read_api.go's blocking
  read maps to Spark's trigger loop); partitions(start, end) prunes to
  fragments overlapping [start, end) and clamps rows by `_offset`, so
  a micro-batch reads only new data.

Everything is defined inside the `journal_datasource()` factory so
cloudpickle ships the classes BY VALUE — executors never import
core_spark (the factory is self-contained: stdlib + pyarrow +
pyspark). Register per session:

    spark.dataSource.register(journal_datasource())
    df = (spark.read.format("journal")
          .option("root", root).option("name", "apps/j1").load())

Fragments written with a Hive path-postfix (partitionBy) are not
served by this source — use Journal.read, which goes through Spark's
native partition discovery.
"""

from __future__ import annotations


def journal_datasource():
    """Return the DataSource class for spark.dataSource.register()."""
    import json
    import os

    from pyspark.sql.datasource import (
        DataSource,
        DataSourceReader,
        DataSourceStreamReader,
        InputPartition,
    )

    def _latest_manifest(journal_root: str) -> dict:
        mdir = os.path.join(journal_root, "_manifest")
        versions = [
            int(f[1:-5])
            for f in os.listdir(mdir)
            if f.startswith("v") and f.endswith(".json")
        ]
        if not versions:
            return {"version": 0, "next_offset": 0, "fragments": []}
        with open(os.path.join(mdir, f"v{max(versions)}.json")) as fh:
            return json.load(fh)

    def _fragment_files(journal_root: str, frag: dict) -> list[str]:
        base = os.path.join(journal_root, frag["path"])
        out = []
        for dirpath, _dirs, files in os.walk(base):
            out.extend(
                os.path.join(dirpath, f)
                for f in files
                if f.endswith(".parquet")
            )
        return sorted(out)

    class FragPartition(InputPartition):
        def __init__(self, files: list[str], begin: int, end: int):
            self.files = files
            self.begin = begin  # clamp: serve _offset in [begin, end)
            self.end = end

    def _read_partition(part: FragPartition, field_names: list[str]):
        import pyarrow.compute as pc
        import pyarrow.parquet as pq

        for path in part.files:
            table = pq.read_table(path)
            mask = pc.and_(
                pc.greater_equal(table["_offset"], part.begin),
                pc.less(table["_offset"], part.end),
            )
            table = table.filter(mask).select(field_names)
            yield from table.to_batches()

    class _Reader(DataSourceReader):
        def __init__(self, journal_root: str, schema):
            self.journal_root = journal_root
            self.field_names = [f.name for f in schema.fields]

        def partitions(self):
            m = _latest_manifest(self.journal_root)
            return [
                FragPartition(
                    _fragment_files(self.journal_root, f), f["begin"], f["end"]
                )
                for f in m["fragments"]
            ]

        def read(self, partition: FragPartition):
            yield from _read_partition(partition, self.field_names)

    class _StreamReader(DataSourceStreamReader):
        def __init__(self, journal_root: str, schema):
            self.journal_root = journal_root
            self.field_names = [f.name for f in schema.fields]

        def initialOffset(self) -> dict:
            return {"next": 0}

        def latestOffset(self) -> dict:
            # the tail poll: re-list the manifest each trigger
            return {"next": _latest_manifest(self.journal_root)["next_offset"]}

        def partitions(self, start: dict, end: dict):
            lo, hi = start["next"], end["next"]
            if lo >= hi:
                return []
            m = _latest_manifest(self.journal_root)
            return [
                FragPartition(
                    _fragment_files(self.journal_root, f),
                    max(f["begin"], lo),
                    min(f["end"], hi),
                )
                for f in m["fragments"]
                if f["end"] > lo and f["begin"] < hi
            ]

        def read(self, partition: FragPartition):
            yield from _read_partition(partition, self.field_names)

        def commit(self, end: dict) -> None:
            pass  # progress is durable in the query checkpoint

    class JournalSource(DataSource):
        """format("journal"): options root=<journals root>,
        name=<journal name>."""

        @classmethod
        def name(cls) -> str:
            return "journal"

        def _journal_root(self) -> str:
            root = self.options.get("root")
            jname = self.options.get("name")
            if not root or not jname:
                raise ValueError(
                    "journal source requires options root=<dir> and "
                    "name=<journal name>"
                )
            return os.path.join(root, jname)

        def schema(self):
            import pyarrow.parquet as pq
            from pyspark.sql.pandas.types import from_arrow_schema

            jroot = self._journal_root()
            m = _latest_manifest(jroot)
            if not m["fragments"]:
                raise ValueError(f"journal {jroot} has no fragments")
            first = _fragment_files(jroot, m["fragments"][0])[0]
            return from_arrow_schema(pq.read_schema(first))

        def reader(self, schema):
            return _Reader(self._journal_root(), schema)

        def streamReader(self, schema):
            return _StreamReader(self._journal_root(), schema)

    return JournalSource
