"""Relational upsert sink + incremental source (SURVEY S7/S8).

The reference bridges Kafka <-> Postgres with Connect JDBC connectors:
upsert sink keyed on the record key with auto-created tables
(config/sink-passangers_per_route.json:9-18), and an incrementing-id source
polling ``route_suppliers`` (config/route-suppliers.json:9-13,
sql/create_tables.sql:2-19). Spark-first realization:

  S7 sink   -> ``DbUpsertSink``: a foreachBatch writer that upserts each
               micro-batch (or batch frame) by key via per-partition DBAPI
               connections — INSERT ... ON CONFLICT (key) DO UPDATE, the
               syntax shared by Postgres / SQLite / DuckDB. Naturally
               idempotent (same key -> same final row), which is exactly
               why the reference's at-least-once delivery is safe.
  S8 source -> ``IncrementalSource``: remembers the max id seen and reads
               only ``id > last_max`` per poll.

Scale notes: upserts run on the EXECUTORS (df.foreachPartition — one
connection per partition, rows streamed, nothing collected); cap fan-in
with ``max_writers`` for databases that dislike concurrent writers (SQLite
needs 1; Postgres takes dozens). The incremental reader here is the
driver-side DBAPI variant sized for dimension tables like route_suppliers;
a fact-sized source should use spark.read.jdbc with partitionColumn
bounds instead — same interface, swap the reader.

Uses DBAPI connection factories instead of JVM JDBC jars so the whole path
is testable in-container (tests/test_jdbc.py runs it against SQLite).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

_SQL_TYPES = {
    T.StringType(): "TEXT",
    T.IntegerType(): "INTEGER",
    T.LongType(): "BIGINT",
    T.DoubleType(): "DOUBLE PRECISION",
    T.FloatType(): "REAL",
    T.BooleanType(): "BOOLEAN",
    T.DateType(): "DATE",
    T.TimestampType(): "TIMESTAMP",
}


def _sql_type(dt: T.DataType) -> str:
    return _SQL_TYPES.get(dt, "TEXT")


def create_table_ddl(schema: T.StructType, table: str,
                     key_cols: list[str]) -> str:
    """Auto-create DDL, the analogue of the Connect sink's
    auto.create/auto.evolve (sink-passangers_per_route.json:16-17)."""
    cols = ", ".join(f"{f.name} {_sql_type(f.dataType)}" for f in schema.fields)
    pk = f", PRIMARY KEY ({', '.join(key_cols)})" if key_cols else ""
    return f"CREATE TABLE IF NOT EXISTS {table} ({cols}{pk})"


# DBAPI drivers disagree on the bind-parameter marker: sqlite3/duckdb use
# qmark ('?'), psycopg2/psycopg (the real-Postgres drivers the reference's
# Connect sink ultimately writes through) use format ('%s'). Sinks/sources
# take a ``paramstyle`` and render the right marker so the SAME upsert
# logic runs against the in-container stand-ins and a live Postgres
# (integration/docker-compose.yml + tests/test_postgres_e2e.py).
_PLACEHOLDER = {"qmark": "?", "format": "%s"}


def upsert_sql(columns: list[str], table: str, key_cols: list[str],
               paramstyle: str = "qmark") -> str:
    ph = _PLACEHOLDER[paramstyle]
    placeholders = ", ".join(ph for _ in columns)
    collist = ", ".join(columns)
    if not key_cols:
        return f"INSERT INTO {table} ({collist}) VALUES ({placeholders})"
    sets = ", ".join(f"{c} = excluded.{c}" for c in columns if c not in key_cols)
    conflict = ", ".join(key_cols)
    return (f"INSERT INTO {table} ({collist}) VALUES ({placeholders}) "
            f"ON CONFLICT ({conflict}) DO UPDATE SET {sets}")


class DbUpsertSink:
    """S7: key-upsert writer. Use ``.process`` as a foreachBatch target for
    streams, or call it directly with a batch DataFrame.

    ``connect_fn`` is a picklable zero-arg factory returning a DBAPI
    connection (e.g. ``lambda: sqlite3.connect(path)``); it runs on the
    executors, once per partition.
    """

    def __init__(self, table: str, key_cols: list[str],
                 connect_fn: Callable, max_writers: int | None = None,
                 paramstyle: str = "qmark"):
        if paramstyle not in _PLACEHOLDER:
            raise ValueError(f"unsupported paramstyle {paramstyle!r}; "
                             f"one of {sorted(_PLACEHOLDER)}")
        self.table = table
        self.key_cols = key_cols
        self.connect_fn = connect_fn
        self.max_writers = max_writers
        self.paramstyle = paramstyle
        self._created = False

    def _ensure_table(self, schema: T.StructType) -> None:
        """Auto-create, then auto-EVOLVE: when the batch schema carries
        columns the existing table lacks, issue ALTER TABLE ADD COLUMN
        for each (added nullable — they can never join the primary key).
        This is the Connect sink's ``auto.evolve=true`` behavior
        (config/sink-passangers_per_route.json:16-17): a mid-stream
        schema widening keeps upserting instead of failing. Runs per
        micro-batch (cheap: one LIMIT-0 describe) because widening can
        arrive on ANY batch, not just the first."""
        con = self.connect_fn()
        try:
            # cursor-level execution is the DBAPI-portable path:
            # connection.execute is a sqlite3/duckdb convenience that
            # psycopg2 (real Postgres) does not provide
            cur = con.cursor()
            if not self._created:
                cur.execute(
                    create_table_ddl(schema, self.table, self.key_cols))
                con.commit()
                self._created = True
            cur.execute(f"SELECT * FROM {self.table} LIMIT 0")
            existing = {d[0].lower() for d in cur.description}
            added = False
            for f in schema.fields:
                if f.name.lower() not in existing:
                    cur.execute(f"ALTER TABLE {self.table} ADD COLUMN "
                                f"{f.name} {_sql_type(f.dataType)}")
                    added = True
            if added:
                con.commit()
        finally:
            con.close()

    def process(self, batch_df: DataFrame, batch_id: int = 0) -> None:
        self._ensure_table(batch_df.schema)
        table, key_cols = self.table, self.key_cols
        columns = list(batch_df.columns)
        connect_fn = self.connect_fn
        sql = upsert_sql(columns, table, key_cols, self.paramstyle)

        def write_partition(rows: Iterator) -> None:
            first = next(rows, None)
            if first is None:
                return
            con = connect_fn()
            try:
                cur = con.cursor()
                cur.execute(sql, tuple(first[c] for c in columns))
                for row in rows:
                    cur.execute(sql, tuple(row[c] for c in columns))
                con.commit()
            finally:
                con.close()

        df = batch_df
        if self.max_writers:
            df = df.coalesce(self.max_writers)
        df.foreachPartition(write_partition)


class IncrementalSource:
    """S8: incrementing-id poll source. Each ``poll`` returns only rows
    with id > the max id already seen, as a DataFrame (driver-side DBAPI
    read — sized for dimension tables; swap in spark.read.jdbc with
    partitionColumn for fact-sized sources)."""

    def __init__(self, spark: SparkSession, connect_fn: Callable,
                 table: str, id_col: str = "id",
                 paramstyle: str = "qmark"):
        if paramstyle not in _PLACEHOLDER:
            raise ValueError(f"unsupported paramstyle {paramstyle!r}; "
                             f"one of {sorted(_PLACEHOLDER)}")
        self.spark = spark
        self.connect_fn = connect_fn
        self.table = table
        self.id_col = id_col
        self.paramstyle = paramstyle
        self.last_max: int = -1
        self._schema: T.StructType | None = None

    def poll(self) -> DataFrame:
        con = self.connect_fn()
        try:
            cur = con.cursor()
            cur.execute(
                f"SELECT * FROM {self.table} WHERE {self.id_col} > "
                f"{_PLACEHOLDER[self.paramstyle]} "
                f"ORDER BY {self.id_col}", (self.last_max,))
            names = [d[0] for d in cur.description]
            rows = cur.fetchall()
        finally:
            con.close()
        if rows:
            self.last_max = max(r[names.index(self.id_col)] for r in rows)
            df = self.spark.createDataFrame(rows, schema=names)
            self._schema = df.schema
            return df
        # empty poll: schema can't be inferred from zero rows — reuse the
        # last seen schema (or an all-string one on a cold, empty table)
        schema = self._schema or T.StructType(
            [T.StructField(n, T.StringType(), True) for n in names])
        return self.spark.createDataFrame([], schema)

    def partitioned_options(self, url: str, upper_bound: int,
                            num_partitions: int = 32,
                            fetch_size: int = 10_000) -> dict[str, str]:
        """The fact-scale form of ``poll``: option map for a PARTITIONED
        ``spark.read.jdbc`` scan of the same incremental slice
        (id > last_max), split into ``num_partitions`` executor-side
        range reads on the id column — the 100 TB shape, where the
        driver-side DBAPI poll above is only right for dimension-sized
        tables like the reference's route_suppliers
        (config/route-suppliers.json:9-13).

        The incremental predicate is pushed into the dbtable subquery, so
        every partition's generated WHERE clause ANDs onto rows the
        database already filtered by index. Usage:
        ``spark.read.format("jdbc").options(**src.partitioned_options(
        url, upper)).load()``; after the batch lands, advance
        ``last_max`` to the max id it contained. upper_bound is a plain
        ``SELECT MAX(id)`` the caller runs (stale is fine — rows landing
        after it are picked up by the next poll)."""
        lower = self.last_max + 1
        if upper_bound < lower:
            upper_bound = lower
        # subquery alias must be a bare identifier — a schema-qualified
        # source table ('public.route_suppliers') would otherwise produce
        # an invalid dotted alias
        alias = self.table.replace(".", "_").replace('"', "")
        return {
            "url": url,
            "dbtable": (f"(SELECT * FROM {self.table} "
                        f"WHERE {self.id_col} > {self.last_max}) "
                        f"AS {alias}_inc"),
            "partitionColumn": self.id_col,
            "lowerBound": str(lower),
            "upperBound": str(upper_bound),
            "numPartitions": str(num_partitions),
            "fetchsize": str(fetch_size),
        }
