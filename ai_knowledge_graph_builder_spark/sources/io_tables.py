"""Table IO: bucketed (co-located) tables and the Iceberg-ready seam.

At 100 TB the graph tables are re-joined constantly (triple assembly J8,
anti-joins J7, retrieval J10). Writing them BUCKETED by the join key means
every subsequent equi-join on that key is exchange-free — the shuffle is
paid once at write time. ``save_bucketed``/``read_table`` use the session
catalog (parquet datasource tables locally); on a cluster with an Iceberg
catalog the same calls become ``writeTo(...).partitionedBy(bucket(N, key))``
— the storage layer is isolated here so swapping is a one-file change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def save_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
) -> None:
    """Write df as a bucketed, sorted managed table (Spark native bucketing;
    Iceberg analog: ``partitionedBy(bucket(num_buckets, col))``)."""
    w = df.write.mode("overwrite").bucketBy(num_buckets, *bucket_cols)
    w = w.sortBy(*(sort_cols or bucket_cols))
    w.saveAsTable(table)


def read_table(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def is_exchange_free_join(joined: DataFrame) -> bool:
    """True when the physical plan for ``joined`` contains no shuffle
    exchange — the co-located-join check used by tests and plan audits."""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    return "Exchange" not in plan or plan.count("Exchange") == plan.count("BroadcastExchange")
