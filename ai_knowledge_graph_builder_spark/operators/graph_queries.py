"""Query-time graph consumers (the reference's phase 9/10 read path,
minus the LLM): basic-fact lookups, 1-hop context expansion, orphan checks,
summary counts.

Reference: rag_system.py:323-393 (J9 basic-fact Cypher lookups),
rag_system.py:531-567 (J10 per-entity 1-hop expansion, ≤10 edges, excluding
MENTIONS/SENT/SENT_TO), neo4j_loader.py:481-489 (A9 orphan nodes),
entity_extractor.py:532-537 (A6 triple summary counts).

All are declarative DataFrame ops over the materialized nodes/edges/triples
tables — the point of the engine: what took per-entity Cypher round-trips is
a broadcast join or window here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .graph import EXCLUDED_PREDICATES


def basic_fact_lookup(triples: DataFrame, subject_name: str, predicate: str) -> DataFrame:
    """J9: 'who does X report to' style point lookup (rag_system.py:323-341).
    CONTAINS-match on the subject name, LIMIT 1 per the reference."""
    return (
        triples.filter(
            F.col("subject_name").contains(subject_name)
            & (F.col("predicate") == predicate)
        )
        .select("subject_name", "predicate", "object_name", "confidence")
        .orderBy("subject_id", "object_id")
        .limit(1)
    )


def one_hop_context(edges: DataFrame, nodes: DataFrame, entity_ids: DataFrame, k: int = 10) -> DataFrame:
    """J10: per entity, up to k outgoing semantic edges with names
    (rag_system.py:531-567). entity_ids: DataFrame with column `id` —
    broadcast (it is the ≤5 retrieved entities of a query)."""
    e = edges.filter(~F.col("predicate").isin(*EXCLUDED_PREDICATES))
    hits = e.join(F.broadcast(entity_ids.select(F.col("id").alias("src"))), "src")
    w = Window.partitionBy("src").orderBy("predicate", "dst")
    topk = hits.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    n = F.broadcast(nodes.select("id", "name"))
    return (
        topk.join(n.withColumnRenamed("id", "src").withColumnRenamed("name", "src_name"), "src")
        .join(n.withColumnRenamed("id", "dst").withColumnRenamed("name", "dst_name"), "dst")
        .select("src", "src_name", "predicate", "dst", "dst_name", "confidence")
    )


def orphan_nodes(nodes: DataFrame, edges: DataFrame) -> DataFrame:
    """A9: nodes with no edge in either direction, counted by type
    (neo4j_loader.py:481-489)."""
    touched = edges.select(F.col("src").alias("id")).unionAll(
        edges.select(F.col("dst").alias("id"))
    )
    return (
        nodes.join(touched, "id", "left_anti")
        .groupBy("node_type")
        .agg(F.count(F.lit(1)).alias("n_orphans"))
    )


def triple_summary(triples: DataFrame) -> DataFrame:
    """A6: ground-truth / inferred / flagged counts
    (entity_extractor.py:532-537)."""
    return triples.agg(
        F.count(F.lit(1)).alias("total"),
        F.sum(F.when(F.col("confidence") == 1.0, 1).otherwise(0)).alias("ground_truth"),
        F.sum(F.when(F.col("inferred"), 1).otherwise(0)).alias("inferred"),
        F.sum(F.when(F.col("flagged"), 1).otherwise(0)).alias("flagged"),
    )


def structured_triple_text(triples: DataFrame) -> DataFrame:
    """P6: 'Subject: X | Predicate: Y | Object: Z | Confidence: C' projection
    (embedding_generator.py:142-151)."""
    return triples.select(
        "subject_id",
        "predicate",
        "object_id",
        F.format_string(
            "Subject: %s | Predicate: %s | Object: %s | Confidence: %s",
            "subject_name", "predicate", "object_name",
            F.col("confidence").cast("string"),
        ).alias("structured_text"),
    )


def source_manifest(triples: DataFrame, chunks: DataFrame | None = None) -> DataFrame:
    """A8: per-source-file usage counts — used_in_triples / used_in_chunks
    (rag_system.py:713-751 builds this per answer over the retrieved items;
    here it is the engine-wide manifest: one partial+final hash agg per
    table, full-outer merged on the file name)."""
    t = triples.groupBy(F.col("source").alias("file")).agg(
        F.count(F.lit(1)).alias("used_in_triples")
    )
    if chunks is None:
        return t.withColumn("used_in_chunks", F.lit(0).cast("long"))
    c = chunks.groupBy(F.col("url").alias("file")).agg(
        F.count(F.lit(1)).alias("used_in_chunks")
    )
    return t.join(c, "file", "full").select(
        "file",
        F.coalesce("used_in_triples", F.lit(0)).alias("used_in_triples"),
        F.coalesce("used_in_chunks", F.lit(0)).alias("used_in_chunks"),
    )


def export_graph_csv(nodes: DataFrame, edges: DataFrame, out_dir: str) -> None:
    """S8: nodes.csv / edges.csv export (neo4j_loader.py:417-430); the
    map-typed props column is JSON-encoded for CSV compatibility."""
    nodes.withColumn("props", F.to_json("props")).write.mode("overwrite").option(
        "header", True
    ).csv(f"{out_dir}/nodes")
    edges.withColumn("props", F.to_json("props")).write.mode("overwrite").option(
        "header", True
    ).csv(f"{out_dir}/edges")
