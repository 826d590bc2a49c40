"""Sinks beyond parquet: the reference's batched JDBC upsert (W2+W3).

The reference's actual sink is a Spring Batch ``JdbcBatchItemWriter`` —
1000-row batches (W1, ``NytimesBatchProcessorApplication.kt:88``) of
``INSERT ... ON CONFLICT ... DO NOTHING`` (``…kt:90-96,138-141,175-178``).
This module reproduces those semantics executor-side:

- ``jdbc_upsert_sink``: ``foreachPartition`` + a DB-API connection
  factory executing the reference's literal conflict-ignoring insert in
  ``batch_size`` chunks. The factory is serialized to executors, so each
  partition opens its own connection (the scale-correct shape: N
  parallel writers, no driver funnel). Tests inject ``sqlite3`` (stdlib);
  production injects psycopg2/mysqlclient with the same signature.
- ``write_jdbc_append``: the built-in Spark JDBC datasource path for
  plain appends (needs a JDBC driver jar on the classpath — not bundled
  in this container, so exercised only via the DB-API sink's tests).

Scale notes: per-partition batched inserts mean the database sees
(partitions x batch) round trips; size partitions so each transaction
stays in the DB's sweet spot (the reference chose 1000). For true
at-scale upserts prefer the anti-join + append parquet/table path
(ingest.upsert_append) and keep JDBC for serving-DB export only.
"""

from __future__ import annotations

from collections.abc import Callable, Iterator
from typing import Any

from pyspark.sql import DataFrame, Row

# The reference's chunk-per-transaction size (…kt:88).
DEFAULT_BATCH_SIZE = 1000


def conflict_ignore_sql(
    table: str, columns: list[str], keys: list[str], *, paramstyle: str = "qmark"
) -> str:
    """The W3 statement: INSERT that silently skips rows whose unique key
    already exists — ``ON CONFLICT (keys) DO NOTHING``
    (``…kt:138-141``). sqlite spells it ``OR IGNORE``; both are emitted
    from the same shape so tests (sqlite) and production (postgres) run
    the identical pipeline code."""
    ph = "?" if paramstyle == "qmark" else "%s"
    collist = ", ".join(columns)
    values = ", ".join([ph] * len(columns))
    if paramstyle == "qmark":  # sqlite dialect
        return f"INSERT OR IGNORE INTO {table} ({collist}) VALUES ({values})"
    keylist = ", ".join(keys)
    return (
        f"INSERT INTO {table} ({collist}) VALUES ({values}) "
        f"ON CONFLICT ({keylist}) DO NOTHING"
    )


def jdbc_upsert_sink(
    df: DataFrame,
    table: str,
    keys: list[str],
    connection_factory: Callable[[], Any],
    *,
    batch_size: int = DEFAULT_BATCH_SIZE,
    paramstyle: str = "qmark",
) -> None:
    """Write ``df`` into a relational table with the reference's exact
    sink semantics: batched, transactional per chunk, first-write-wins
    on the unique key. Executor-side — each partition streams its rows
    through ``executemany`` in ``batch_size`` chunks and commits per
    chunk (the reference's chunk-transaction boundary, E1)."""
    columns = df.columns
    sql = conflict_ignore_sql(table, columns, keys, paramstyle=paramstyle)

    def _write_partition(rows: Iterator[Row]) -> None:
        conn = connection_factory()
        try:
            cur = conn.cursor()
            buf: list[tuple] = []
            for row in rows:
                buf.append(tuple(row))
                if len(buf) >= batch_size:
                    cur.executemany(sql, buf)
                    conn.commit()
                    buf.clear()
            if buf:
                cur.executemany(sql, buf)
                conn.commit()
        finally:
            conn.close()

    df.foreachPartition(_write_partition)


def write_jdbc_append(
    df: DataFrame, url: str, table: str, properties: dict[str, str], *, batch_size: int = DEFAULT_BATCH_SIZE
) -> None:
    """Plain append through Spark's JDBC datasource (W2 without the
    conflict clause — Spark's writer cannot emit ON CONFLICT; pair with
    a unique index + jdbc_upsert_sink when dedup must live in the DB).
    Requires the target's JDBC driver jar on the executor classpath."""
    df.write.mode("append").option("batchsize", str(batch_size)).jdbc(
        url, table, properties=properties
    )
