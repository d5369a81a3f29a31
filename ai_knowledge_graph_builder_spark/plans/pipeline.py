"""End-to-end document→triples plan (the reference's phases 6-7 as one DAG).

The reference runs each phase as a subprocess communicating through files and
Neo4j (run_pipeline.py:150-155); here the whole flow is a single declarative
DataFrame DAG — Catalyst sees every stage, so filters/pruning push into the
scan and the only materialization points are the ones we choose (the
checkpointed table stages in plans/checkpoint.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from ..operators.extraction import extract_documents
from ..operators.graph import (
    assemble_triples,
    contradiction_edges,
    cooccurrence_pairs,
    ground_truth_edges,
    infer_edges,
    registry_nodes,
    shadow_entities,
)
from ..operators.linking import build_alias_table, resolve_mentions
from ..operators.mentions import detect_mentions


def run_kg_pipeline(
    spark: SparkSession,
    pages: DataFrame,
    registry: DataFrame,
    doc_meta: DataFrame | None = None,
    employees: DataFrame | None = None,
    assignments: DataFrame | None = None,
    policies: DataFrame | None = None,
    gazetteer: list[tuple[str, str]] | None = None,
    broadcast_nodes: bool = True,
) -> dict[str, DataFrame]:
    """Run the full flow lazily; returns the named DataFrames. Callers decide
    what to materialize (tests collect, the checkpointed runner writes
    committed parquet stages)."""
    documents = extract_documents(pages, doc_meta)
    # persist the NER output: everything downstream (exact/fuzzy/external
    # linking, MENTIONS table, co-occurrence) fans out from here, and the
    # extraction+NER UDF chain is the most expensive thing to recompute
    mentions_raw = detect_mentions(documents, gazetteer).persist()

    aliases = build_alias_table(registry)
    mentions, external_nodes = resolve_mentions(mentions_raw, aliases)
    mentions = mentions.persist()

    nodes = registry_nodes(registry).unionByName(external_nodes)
    if doc_meta is not None:
        nodes = nodes.unionByName(shadow_entities(doc_meta))

    base_edges = None
    if employees is not None and assignments is not None and policies is not None:
        base_edges = ground_truth_edges(employees, assignments, policies)
    if doc_meta is not None:
        flagged = contradiction_edges(doc_meta, registry_nodes(registry))
        base_edges = flagged if base_edges is None else base_edges.unionByName(flagged)

    cooccur = cooccurrence_pairs(mentions)
    if base_edges is None:
        base_edges = spark.createDataFrame([], infer_edges(cooccur, _empty_edges(spark)).schema)
    inferred = infer_edges(cooccur, base_edges)
    edges = base_edges.unionByName(inferred)

    triples = assemble_triples(edges, nodes, broadcast_nodes=broadcast_nodes)
    return {
        "documents": documents,
        "mentions": mentions,
        "aliases": aliases,
        "nodes": nodes,
        "edges": edges,
        "cooccur": cooccur,
        "triples": triples,
    }


def _empty_edges(spark: SparkSession) -> DataFrame:
    from ..schemas import EDGES

    return spark.createDataFrame([], EDGES)
