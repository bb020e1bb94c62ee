"""Relational (JDBC) measurement source, Spark-first.

The reference polls PostgreSQL for traceroute measurements on a single
task: it refreshes the TracerouteMeta stream library, then per stream
issues `getTracerouteData(stream, lastMeasurementTime)` range queries
and advances a per-stream offset map held in checkpointed state
(reference: flink/sources/PostgresTracerouteSourceFunction.scala:76-170,
connectors/postgres/PostgresConnection.scala). That is a hand-rolled,
parallelism-1 partitioned range scan.

The Spark shape is the built-in partitioned JDBC reader: ONE reader
with ``partitionColumn/lowerBound/upperBound/numPartitions`` issues the
same per-range queries from N executors in parallel, and Catalyst
pushes the time predicates into the generated SQL (the reference's
chunking loop becomes WHERE-clause pushdown). The per-stream offset
map is subsumed by the checkpoint manifest (plans/manifest.py), which
records the time range each completed partition covered — resume
simply lower-bounds the next scan, identical semantics to
``lastMeasurementTimes``.

The sandbox has no PostgreSQL server, so these builders are exercised
by option-construction tests (tests/test_sources.py) rather than a live
round trip; against a real database they are plain ``spark.read.jdbc``
plans.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def jdbc_range_scan(
    spark: SparkSession,
    url: str,
    table: str,
    time_column: str,
    start_ts: str,
    end_ts: str,
    n_partitions: int = 16,
    properties: dict | None = None,
):
    """Partitioned relational range scan: the PostgresTracerouteSource
    catch-up query as one parallel JDBC read. ``table`` may be a table
    name or a pushdown subquery alias. Boundary semantics mirror the
    reference's catch-up scan: start exclusive, end inclusive — applied
    as a WHERE predicate in the pushed-down subquery so the database
    never ships rows outside the window."""
    dbtable = (
        f"(SELECT * FROM {table} "
        f"WHERE {time_column} > '{start_ts}' "
        f"AND {time_column} <= '{end_ts}') AS t"
    )
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", dbtable)
        .option("partitionColumn", time_column)
        .option("lowerBound", start_ts)
        .option("upperBound", end_ts)
        .option("numPartitions", str(n_partitions))
        # the reference's 1000-row chunking, as the driver's fetch size
        .option("fetchsize", "1000")
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader


def traceroute_meta_dim(
    spark: SparkSession, url: str, properties: dict | None = None
):
    """The stream library refresh (getAllTracerouteMeta): a small
    dimension read — broadcast it into the measurement join exactly as
    operators/enrich.py does with parquet-backed meta."""
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", "streams.traceroute")
    )
    for k, v in (properties or {}).items():
        reader = reader.option(k, v)
    return reader


def load(reader) -> DataFrame:
    """Execute a reader built above (separate so tests can inspect the
    constructed plan without a live database)."""
    return reader.load()
