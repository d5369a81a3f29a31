"""Bucketed tables: equi-joins on the bucket key run without a shuffle."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from ai_knowledge_graph_builder_spark.sources.io_tables import (
    is_exchange_free_join,
    read_table,
    save_bucketed,
)


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # warehouse dir is a static conf — set in session.py (outside the repo).
    # The in-memory catalog is fresh each session but the location persists:
    # clear leftovers so mode("overwrite") can re-create the tables.
    import shutil

    for t in ("b_edges", "b_nodes"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        shutil.rmtree(f"/tmp/kg-spark-warehouse/{t}", ignore_errors=True)
    edges = spark.range(0, 10000).select(
        F.concat(F.lit("e"), (F.col("id") % 500).cast("string")).alias("src"),
        F.lit("REL").alias("predicate"),
        F.concat(F.lit("e"), ((F.col("id") * 7) % 500).cast("string")).alias("dst"),
    )
    nodes = spark.range(0, 500).select(
        F.concat(F.lit("e"), F.col("id").cast("string")).alias("id"),
        F.concat(F.lit("name"), F.col("id").cast("string")).alias("name"),
    )
    save_bucketed(edges, "b_edges", ["src"], num_buckets=8)
    save_bucketed(nodes, "b_nodes", ["id"], num_buckets=8)
    return spark


def test_bucketed_join_is_exchange_free(bucketed):
    spark = bucketed
    e = read_table(spark, "b_edges")
    n = read_table(spark, "b_nodes").withColumnRenamed("id", "src")
    j = e.join(n.hint("merge"), "src")
    j.count()  # force final (AQE) plan
    assert is_exchange_free_join(j), j._jdf.queryExecution().executedPlan().toString()[:800]
    # sanity: result correct
    assert j.count() == 10000


def test_unbucketed_join_shuffles(bucketed):
    spark = bucketed
    e = spark.table("b_edges")
    n = spark.range(0, 500).select(
        F.concat(F.lit("e"), F.col("id").cast("string")).alias("src"),
        F.lit("x").alias("name"),
    )
    j = e.join(n.hint("merge"), "src")
    j.count()
    assert not is_exchange_free_join(j)
