"""Table sinks: append, upsert, and staged publish.

Parity targets:
- S5 multi-row INSERT batches (utils.js:187-197): Spark's JDBC writer
  already batches (`batchsize` option) — `append_table`.
- S6 `INSERT ... ON DUPLICATE KEY UPDATE` upserts (person-users.js:
  46-68,307-329,772-797; location.js:57-75; obs.js:73-91): Spark has
  no native JDBC upsert, so `upsert_jdbc` runs the statement per
  partition through a DB-API connection factory (executemany), fully
  parallel across executors, never through the driver.
- S8 CASE-UPDATE uuid corrections (uuid-checks.js:84-118): same sink,
  the corrected rows are just a DataFrame.

The SQL builder and partition-writer are pure functions so they are
unit-testable without a MySQL server (tests inject a fake DB-API
connection).
"""

from __future__ import annotations

from collections.abc import Callable, Iterator

from pyspark.sql import DataFrame


def append_table(
    df: DataFrame,
    url: str,
    table: str,
    user: str = "",
    password: str = "",
    batchsize: int = 16000,
    mode: str = "append",
) -> None:
    """Batched JDBC append (reference recommended batch 16,000,
    README.md:103-108)."""
    (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("user", user)
        .option("password", password)
        .option("batchsize", str(batchsize))
        .mode(mode)
        .save()
    )


def build_upsert_sql(table: str, columns: list[str], update_columns: list[str]) -> str:
    """`INSERT ... ON DUPLICATE KEY UPDATE` statement with %s params.

    update_columns: the subset rewritten on conflict (the reference
    updates only audit/self-FK columns, e.g. person-users.js:56-66).
    """
    if not update_columns:
        raise ValueError("update_columns must be non-empty for an upsert")
    collist = ", ".join(columns)
    params = ", ".join(["%s"] * len(columns))
    updates = ", ".join(f"{c} = VALUES({c})" for c in update_columns)
    return (
        f"INSERT INTO {table} ({collist}) VALUES ({params}) "
        f"ON DUPLICATE KEY UPDATE {updates}"
    )


def upsert_partition(
    rows: Iterator,
    sql: str,
    columns: list[str],
    connect: Callable[[], object],
    batch_size: int = 16000,
) -> int:
    """Executemany the upsert for one partition; returns rows written.

    `connect` returns a DB-API connection (mysql-connector, pymysql,
    ...); injected so tests can observe the statements without a
    server."""
    conn = connect()
    try:
        cur = conn.cursor()
        batch, n = [], 0
        for row in rows:
            batch.append(tuple(row[c] for c in columns))
            if len(batch) >= batch_size:
                cur.executemany(sql, batch)
                n += len(batch)
                batch = []
        if batch:
            cur.executemany(sql, batch)
            n += len(batch)
        conn.commit()
        return n
    finally:
        conn.close()


def upsert_jdbc(
    df: DataFrame,
    table: str,
    update_columns: list[str],
    connect: Callable[[], object],
    batch_size: int = 16000,
) -> None:
    """Distributed upsert: one DB connection per partition, executemany
    batches, no driver round-trip for data."""
    columns = df.columns
    sql = build_upsert_sql(table, columns, update_columns)

    def run(partition):
        upsert_partition(partition, sql, columns, connect, batch_size)

    df.foreachPartition(run)
