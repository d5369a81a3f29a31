"""The KG tables are plain Spark SQL citizens: register and query with SQL."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="module")
def kg_views(spark, corpus):
    from ai_knowledge_graph_builder_spark.plans.pipeline import run_kg_pipeline

    dfs = {k: spark.createDataFrame(corpus[k]) for k in
           ["pages", "doc_meta", "registry", "employees", "assignments", "policies"]}
    out = run_kg_pipeline(spark, dfs["pages"], dfs["registry"], dfs["doc_meta"],
                          dfs["employees"], dfs["assignments"], dfs["policies"])
    out["triples"].createOrReplaceTempView("kg_triples")
    out["nodes"].createOrReplaceTempView("kg_nodes")
    out["edges"].createOrReplaceTempView("kg_edges")
    return spark


def test_sql_over_triples(kg_views):
    spark = kg_views
    rows = spark.sql("""
        SELECT predicate, count(*) AS n,
               round(avg(confidence), 2) AS avg_conf
        FROM kg_triples GROUP BY predicate ORDER BY predicate
    """).collect()
    assert {r["predicate"] for r in rows} >= {"REPORTS_TO", "WORKS_ON", "OWNS"}

    flagged = spark.sql("""
        SELECT t.subject_name, t.object_name
        FROM kg_triples t WHERE t.flagged ORDER BY 1, 2 LIMIT 5
    """).collect()
    assert flagged  # planted contradictions surface via plain SQL

    two_hop = spark.sql("""
        SELECT a.subject_name AS emp, a.object_name AS mgr, b.object_name AS mgr2
        FROM kg_triples a JOIN kg_triples b
          ON a.object_id = b.subject_id
         AND a.predicate = 'REPORTS_TO' AND b.predicate = 'REPORTS_TO'
        LIMIT 5
    """).collect()
    assert two_hop  # multi-hop graph traversal as a SQL self-join
