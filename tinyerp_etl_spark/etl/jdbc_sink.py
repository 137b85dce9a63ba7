"""Relational (JDBC) sink — the engine's analog of the reference's
PostgreSQL writer.

The reference lands every entity in PostgreSQL through psycopg2:
batched INSERTs via ``execute_values`` (tiny_api_v2_cliente.py:8) and
idempotent upserts via ``INSERT ... ON CONFLICT DO UPDATE``
(tiny_api_v2_cliente.py:123, :198), over a connection built with
retry/keepalive settings (:62-78). On Spark the same contract maps to:

- batch insert  -> ``df.write.jdbc`` (executors open parallel
  connections; ``batchsize`` plays the role of ``execute_values``'s
  page size, ``numPartitions`` caps the connection fan-in so a
  1000-executor cluster cannot open 1000 sessions against one DB),
- upsert        -> stage the increment into a side table with
  ``df.write.jdbc`` (distributed), then one driver-side ``MERGE INTO``
  statement moves it into the target transactionally — the set-based
  equivalent of ON CONFLICT DO UPDATE, with the data path staying on
  the executors and only DDL-sized control statements on the driver,
- read          -> ``spark.read.jdbc`` with an explicit partition
  column/bounds so the scan parallelizes instead of draining the
  table through one connection.

Tests exercise the full round trip against embedded Derby (bundled
with Spark); any JDBC-compliant database works by swapping url/driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: Conservative default write fan-in: a big cluster must not DDoS the
#: relational store with one connection per core.
DEFAULT_WRITE_PARTITIONS = 8
DEFAULT_BATCH_SIZE = 1000


def _quoted(cols: list[str]) -> list[str]:
    return ['"' + c + '"' for c in cols]


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    driver: str | None = None,
    num_partitions: int = DEFAULT_WRITE_PARTITIONS,
    batch_size: int = DEFAULT_BATCH_SIZE,
    properties: dict[str, str] | None = None,
) -> None:
    """Batch INSERT (reference: execute_values, tiny_api_v2_cliente.py:8).

    Executors write in parallel, ``num_partitions`` bounding the
    connection count and ``batch_size`` the rows per round trip.
    ``properties`` carries user/password and any other connection
    options to the executor-side connections — the distributed data
    path needs credentials just as much as the driver-side MERGE leg.
    """
    writer = (
        df.coalesce(num_partitions)
        .write.mode(mode)
        .option("batchsize", str(batch_size))
    )
    props = dict(properties or {})
    if driver:
        props["driver"] = driver
    writer.jdbc(url, table, mode=mode, properties=props)


def read_jdbc(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    partition_column: str | None = None,
    lower_bound: int | None = None,
    upper_bound: int | None = None,
    num_partitions: int = DEFAULT_WRITE_PARTITIONS,
    properties: dict[str, str] | None = None,
) -> DataFrame:
    """Parallel JDBC scan. Always pass partition bounds for real tables
    — without them the whole table drains through ONE connection."""
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    if driver:
        reader = reader.option("driver", driver)
    if partition_column is not None:
        if lower_bound is None or upper_bound is None:
            raise ValueError(
                "partition_column requires explicit lower_bound and upper_bound"
            )
        reader = (
            reader.option("partitionColumn", partition_column)
            .option("lowerBound", str(lower_bound))
            .option("upperBound", str(upper_bound))
            .option("numPartitions", str(num_partitions))
        )
    return reader.load()


def _connect(
    spark: SparkSession,
    url: str,
    driver: str | None,
    properties: dict[str, str] | None,
):
    """Open a driver-side JDBC connection honoring driver + credentials.

    ``Class.forName`` registers drivers that don't self-register via
    SPI; user/password and any other connection properties ride a
    ``java.util.Properties`` — the same knobs the executor-side
    ``df.write.jdbc`` path accepts.
    """
    jvm = spark._jvm
    if driver:
        jvm.java.lang.Class.forName(driver)
    props = jvm.java.util.Properties()
    for k, v in (properties or {}).items():
        props.setProperty(k, v)
    return jvm.java.sql.DriverManager.getConnection(url, props)


def _run_statement(
    spark: SparkSession,
    url: str,
    sql: str,
    driver: str | None = None,
    properties: dict[str, str] | None = None,
) -> None:
    """Execute one control-plane SQL statement on the driver.

    Data never flows here — this is the MERGE/DDL leg only, the same
    division of labor as the reference's cursor.execute for control
    statements vs execute_values for data (tiny_api_v2_cliente.py:123).
    """
    conn = _connect(spark, url, driver, properties)
    try:
        stmt = conn.createStatement()
        try:
            stmt.executeUpdate(sql)
        finally:
            stmt.close()
    finally:
        conn.close()


def _table_exists(
    spark: SparkSession,
    url: str,
    table: str,
    driver: str | None = None,
    properties: dict[str, str] | None = None,
) -> bool:
    conn = _connect(spark, url, driver, properties)
    try:
        # unquoted identifiers fold to upper case in Derby/ANSI dialects
        rs = conn.getMetaData().getTables(None, None, table.upper(), None)
        try:
            return bool(rs.next())
        finally:
            rs.close()
    finally:
        conn.close()


def upsert_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    keys: list[str],
    driver: str | None = None,
    staging_table: str | None = None,
    num_partitions: int = DEFAULT_WRITE_PARTITIONS,
    properties: dict[str, str] | None = None,
) -> None:
    """Idempotent key-based upsert — the reference's ON CONFLICT DO
    UPDATE contract (tiny_api_v2_cliente.py:123, :198) on Spark.

    The increment lands in ``staging_table`` via a distributed JDBC
    write, then one set-based ``MERGE INTO`` statement applies it:
    matched keys update, new keys insert. A key-only table (every
    column in ``keys``) degenerates to insert-if-absent — the MERGE
    drops its WHEN MATCHED clause, since an empty UPDATE SET is a
    syntax error. Running the same increment twice leaves the target
    unchanged (at-least-once safe, op #22).
    """
    spark = df.sparkSession
    staging = staging_table or f"{table}_staging"
    write_jdbc(
        df, url, staging, mode="overwrite", driver=driver,
        num_partitions=num_partitions, properties=properties,
    )
    cols = list(df.columns)
    non_keys = [c for c in cols if c not in keys]
    on = " AND ".join(f't."{k}" = s."{k}"' for k in keys)
    insert_cols = ", ".join(_quoted(cols))
    insert_vals = ", ".join(f's."{c}"' for c in cols)
    matched = ""
    if non_keys:
        set_clause = ", ".join(f'"{c}" = s."{c}"' for c in non_keys)
        matched = f"WHEN MATCHED THEN UPDATE SET {set_clause} "
    if not _table_exists(spark, url, table, driver, properties):
        # create an empty target with the staging schema (distributed
        # write of zero rows — keeps type mapping identical)
        write_jdbc(
            df.limit(0), url, table, mode="append", driver=driver,
            num_partitions=1, properties=properties,
        )
    _run_statement(
        spark,
        url,
        f"MERGE INTO {table} t USING {staging} s ON {on} "
        f"{matched}"
        f"WHEN NOT MATCHED THEN INSERT ({insert_cols}) VALUES ({insert_vals})",
        driver,
        properties,
    )
