"""Remote-SQL store: exactly-once materialization of micro-batches
into a SQL database guarded by the `gazette_checkpoints` fence row.

Reference mapping (consumer/store_sql.go:12-146):
- A table `gazette_checkpoints(shard_fqn PRIMARY KEY, fence, checkpoint)`
  holds one row per shard. RestoreCheckpoint increments `fence` and
  reads the checkpoint inside one transaction, so every new store
  incarnation holds a strictly-larger fence (store_sql.go:67-90).
- Each commit updates the checkpoint `WHERE fence = <held fence>`;
  zero rows affected means a newer primary bumped the fence — the
  zombie's transaction rolls back having published nothing
  ("checkpoint fence was updated (ie, by a new primary)",
  store_sql.go:120-133). Application rows and the checkpoint commit
  in the SAME transaction, which is the whole point: state and
  progress can never diverge.

Spark shape: the store is a `foreachBatch` target — the micro-batch
id is the transaction id, mirroring FencedJournalSink (sink.py) with
the database replacing the journal manifest as the fencing authority.
Batches at or below the restored checkpoint are idempotently skipped
(Spark re-delivers the last batch after restart); the skip path still
verifies the fence so a zombie can't even pretend success.

The driver binds one sqlite3 (stdlib) connection per shard. That is
the reference's own topology — SQLStore binds one shard to one DB
transaction stream — and sizes the same way at 100 TB: this store is
the *queryable-state / read-your-writes endpoint* for per-shard
aggregates (node-width by construction: counters, windows, recent-N
state), NOT a corpus sink. Corpus-scale output goes through the
journal/parquet sinks (partition-parallel); what lands here is the
post-aggregation stream, and rows stream driver-side via
`toLocalIterator()` so memory stays one-partition-bounded. Any
DB-API driver with the same BEGIN semantics (Postgres via a JDBC-side
twin) slots in: the store only needs UPDATE-rowcount CAS.
"""

from __future__ import annotations

import json
import sqlite3
from collections.abc import Callable, Sequence

from pyspark.sql import DataFrame

CHECKPOINT_DDL = """
CREATE TABLE IF NOT EXISTS gazette_checkpoints (
  shard_fqn  TEXT    PRIMARY KEY NOT NULL,
  fence      INTEGER NOT NULL,
  checkpoint BLOB    NOT NULL
);
"""

_SPARK_TO_SQL = {
    "bigint": "INTEGER",
    "int": "INTEGER",
    "smallint": "INTEGER",
    "tinyint": "INTEGER",
    "boolean": "INTEGER",
    "double": "REAL",
    "float": "REAL",
    "string": "TEXT",
    "binary": "BLOB",
}


class FencedOff(RuntimeError):
    """A newer primary bumped this shard's fence; the holder must die."""


class SQLStore:
    """Fence-checkpointed SQL materialization for one shard.

    Usage (batch or `writeStream.foreachBatch`):

        store = SQLStore("/path/state.db", shard="cycles-0")
        stream.writeStream.foreachBatch(
            store.sink("rides", key_cols=("event_id",))).start()

    then query the DB directly — the bike-share pattern of serving
    reads from the materialized table
    (examples/bike-share/application.go:134-199).
    """

    def __init__(self, db_path: str, shard: str):
        self.db_path = db_path
        self.shard = shard
        # check_same_thread=False: foreachBatch invokes the sink from
        # the streaming-query thread, not the constructor's. Safe —
        # micro-batches are strictly sequential, so the connection is
        # never used by two threads at once.
        self._conn = sqlite3.connect(
            db_path, timeout=30, isolation_level=None,
            check_same_thread=False,
        )
        self._conn.execute(CHECKPOINT_DDL)
        self.fence, self.checkpoint = self._restore()

    # ------------------------------------------------------------ restore
    def _restore(self) -> tuple[int, dict]:
        """RestoreCheckpoint (store_sql.go:67-90): bump the fence and
        read the checkpoint in one transaction. A first-ever restore
        INSERTs the row at fence 1 with an empty checkpoint."""
        cur = self._conn.cursor()
        cur.execute("BEGIN IMMEDIATE")
        try:
            cur.execute(
                "UPDATE gazette_checkpoints SET fence = fence + 1 "
                "WHERE shard_fqn = ?",
                (self.shard,),
            )
            row = cur.execute(
                "SELECT fence, checkpoint FROM gazette_checkpoints "
                "WHERE shard_fqn = ?",
                (self.shard,),
            ).fetchone()
            if row is None:
                cur.execute(
                    "INSERT INTO gazette_checkpoints "
                    "(shard_fqn, fence, checkpoint) VALUES (?, 1, ?)",
                    (self.shard, json.dumps({})),
                )
                fence, cp = 1, {}
            else:
                fence, cp = int(row[0]), json.loads(row[1])
            cur.execute("COMMIT")
            return fence, cp
        except BaseException:
            cur.execute("ROLLBACK")
            raise

    @property
    def committed_batch(self) -> int:
        return int(self.checkpoint.get("batch", -1))

    # ------------------------------------------------------------- commit
    def commit_batch(
        self,
        batch_id: int,
        apply_fn: Callable[[sqlite3.Cursor], None],
        extra_checkpoint: dict | None = None,
    ) -> bool:
        """Run `apply_fn` and the checkpoint update in ONE transaction
        (StartCommit, store_sql.go:94-138). Returns False when the
        batch is already committed (idempotent re-delivery). Raises
        FencedOff when a newer incarnation holds the fence — on the
        skip path too: a zombie may not even report success."""
        if batch_id <= self.committed_batch:
            held = self._conn.execute(
                "SELECT fence FROM gazette_checkpoints WHERE shard_fqn = ?",
                (self.shard,),
            ).fetchone()
            if held is None or int(held[0]) != self.fence:
                raise FencedOff(
                    f"shard {self.shard}: checkpoint fence was updated "
                    "(ie, by a new primary)"
                )
            return False

        cp = dict(self.checkpoint)
        cp.update(extra_checkpoint or {})
        cp["batch"] = batch_id
        cur = self._conn.cursor()
        cur.execute("BEGIN IMMEDIATE")
        try:
            apply_fn(cur)
            cur.execute(
                "UPDATE gazette_checkpoints SET checkpoint = ? "
                "WHERE shard_fqn = ? AND fence = ?",
                (json.dumps(cp), self.shard, self.fence),
            )
            if cur.rowcount == 0:
                raise FencedOff(
                    f"shard {self.shard}: checkpoint fence was updated "
                    "(ie, by a new primary)"
                )
            cur.execute("COMMIT")
        except BaseException:
            cur.execute("ROLLBACK")
            raise
        self.checkpoint = cp
        return True

    # -------------------------------------------------------- materialize
    def ensure_table(self, table: str, df: DataFrame,
                     key_cols: Sequence[str] = ()) -> list[str]:
        """CREATE TABLE IF NOT EXISTS mirroring the DataFrame schema
        (the reference leaves app DDL to the application; we derive it
        so tests/examples stay terse). Returns the column order."""
        cols = []
        for name, dtype in df.dtypes:
            base = dtype.split("(")[0]
            sql_t = _SPARK_TO_SQL.get(base)
            if sql_t is None:
                # timestamps/dates/decimals arrive stringified — the
                # store holds serving state, not a typed lakehouse
                sql_t = "TEXT"
            cols.append((name, sql_t))
        pk = (
            f", PRIMARY KEY ({', '.join(key_cols)})" if key_cols else ""
        )
        self._conn.execute(
            f"CREATE TABLE IF NOT EXISTS {table} ("
            + ", ".join(f"{n} {t}" for n, t in cols)
            + pk
            + ")"
        )
        return [n for n, _ in cols]

    def materialize(
        self,
        table: str,
        df: DataFrame,
        batch_id: int,
        key_cols: Sequence[str] = (),
        chunk: int = 10_000,
    ) -> bool:
        """Upsert one micro-batch into `table` under the fence, in the
        same transaction as the checkpoint. Rows stream through
        `toLocalIterator()` — driver memory stays bounded by one
        partition, and the aggregate feeding a queryable-state store
        is node-width by design (see module docstring)."""
        names = self.ensure_table(table, df, key_cols)
        verb = "INSERT OR REPLACE" if key_cols else "INSERT"
        stmt = (
            f"{verb} INTO {table} ({', '.join(names)}) "
            f"VALUES ({', '.join('?' for _ in names)})"
        )
        plain = df.select(*names)

        def apply(cur: sqlite3.Cursor) -> None:
            buf: list[tuple] = []
            for row in plain.toLocalIterator():
                buf.append(tuple(
                    v if isinstance(v, (int, float, str, bytes, type(None)))
                    else str(v)
                    for v in row
                ))
                if len(buf) >= chunk:
                    cur.executemany(stmt, buf)
                    buf.clear()
            if buf:
                cur.executemany(stmt, buf)

        return self.commit_batch(batch_id, apply)

    def sink(self, table: str, key_cols: Sequence[str] = ()):
        """`foreachBatch`-shaped callable."""

        def write(df: DataFrame, batch_id: int) -> None:
            self.materialize(table, df, batch_id, key_cols=key_cols)

        return write

    def snapshot(self, table: str, sql: str) -> int:
        """Materialize a derived serving snapshot: DROP + CREATE
        ``table`` AS the given SELECT over this store's state, and
        return its row count. The bike-share QueryCycleStmt pattern
        with a paging-friendly twist — the aggregate runs ONCE
        store-side, then reads drain it through query_pages instead
        of re-running the aggregate per request or collecting it
        whole."""
        self._conn.execute(f"DROP TABLE IF EXISTS {table}")
        self._conn.execute(f"CREATE TABLE {table} AS {sql}")
        self._conn.commit()
        return self._conn.execute(
            f"SELECT COUNT(*) FROM {table}"
        ).fetchone()[0]

    # -------------------------------------------------------------- reads
    def query(self, sql: str, params: Sequence = ()) -> list[tuple]:
        """Serve a read from the materialized state (the bike-share
        QueryCycleStmt pattern). Reads see only committed state —
        sqlite gives snapshot isolation per statement."""
        return list(self._conn.execute(sql, params))

    def query_pages(
        self,
        table: str,
        keys: Sequence[str],
        page_size: int,
        columns: Sequence[str] | None = None,
    ):
        """Keyset-paginated serve over a materialized table: yields
        lists of rows, each fetched by ONE `LIMIT page_size` probe
        with a `(k1,k2,..) > (v1,v2,..)` continuation predicate
        (never OFFSET — sqlite row-value comparison walks the
        primary-key b-tree range directly, so page N costs the same
        as page 1 whatever the table size). The key tuple must be
        unique per row: it IS the cursor, and yielded rows lead with
        the key columns (the cursor slice is positional). The
        relational twin of
        gazette's offset-ranged journal reads
        (broker/protocol/protocol.proto ReadRequest offset/
        endOffset) — the serve tier never materializes more than one
        page per request."""
        if page_size <= 0:
            raise ValueError("page_size must be positive")
        if columns is None:
            info = self._conn.execute(
                f"PRAGMA table_info({table})"
            ).fetchall()
            columns = [r[1] for r in info]
        missing = [k for k in keys if k not in columns]
        if missing:
            raise ValueError(f"cursor keys {missing} not in the page")
        # keys lead the row so the cursor slice is positional-stable
        columns = list(keys) + [c for c in columns if c not in keys]
        cols = ", ".join(columns)
        order = ", ".join(keys)
        tup = "(" + ", ".join(keys) + ")"
        ph = "(" + ", ".join("?" for _ in keys) + ")"
        last: tuple | None = None
        while True:
            if last is None:
                rows = list(self._conn.execute(
                    f"SELECT {cols} FROM {table} ORDER BY {order}"
                    f" LIMIT {int(page_size)}"
                ))
            else:
                rows = list(self._conn.execute(
                    f"SELECT {cols} FROM {table} WHERE {tup} > {ph}"
                    f" ORDER BY {order} LIMIT {int(page_size)}",
                    last,
                ))
            if not rows:
                return
            yield rows
            if len(rows) < page_size:
                return
            last = tuple(rows[-1][: len(keys)])

    def close(self) -> None:
        self._conn.close()
