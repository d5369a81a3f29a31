"""Canonicalization extensions: components, external-entity clustering,
pronoun-to-antecedent resolution."""

from __future__ import annotations

import pandas as pd
from pyspark.sql import functions as F

from ai_knowledge_graph_builder_spark.functions.embed import encode_texts
from ai_knowledge_graph_builder_spark.operators.canonical import (
    apply_canonical_remap,
    cluster_external_entities,
    connected_components,
    resolve_pronouns,
)


def test_connected_components(spark):
    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("x", "y"), ("z", "z2")], ["a", "b"]
    )
    comp = {r["id"]: r["rep"] for r in connected_components(edges).collect()}
    assert comp["a"] == comp["b"] == comp["c"] == "a"
    assert comp["x"] == comp["y"] == "x"
    assert comp["z"] == comp["z2"] == "z"


def test_cluster_external_entities_precision_safety(spark):
    # ext_a / ext_b share nearly identical names → merge; canonical emp_001
    # is close to ext_c → ext_c remaps ONTO the canonical id; two canonicals
    # (emp_001, emp_002) must never merge even with identical names.
    names = {
        "ext_a": "global tech review board",
        "ext_b": "global tech review",
        "ext_c": "alice johnson",
        "emp_001": "alice johnson",
        "emp_002": "alice johnson",
    }
    nodes = spark.createDataFrame(
        [(k, v, "ExternalEntity" if k.startswith("ext") else "Employee")
         for k, v in names.items()],
        ["id", "name", "node_type"],
    )
    emb = encode_texts(list(names.values()), 64)
    embeddings = spark.createDataFrame(
        pd.DataFrame({"item_id": list(names.keys()), "embedding": [e.tolist() for e in emb]})
    )
    remap = {r["id"]: r["canonical_id"]
             for r in cluster_external_entities(nodes, embeddings, tau=0.8,
                                                bands=32, rows_per_band=4).collect()}
    # ext_b merges into ext_a (min id), ext_c onto a canonical employee
    assert remap.get("ext_b") == "ext_a"
    assert remap.get("ext_c") in ("emp_001", "emp_002")
    # canonicals never remapped
    assert "emp_001" not in remap and "emp_002" not in remap


def test_apply_canonical_remap(spark):
    edges = spark.createDataFrame(
        [("ext_b", "WORKS_ON", "proj_1", 0.5, "s", False, True),
         ("ext_a", "WORKS_ON", "proj_1", 0.5, "s", False, True)],
        ["src", "predicate", "dst", "confidence", "source", "flagged", "inferred"],
    )
    remap = spark.createDataFrame([("ext_b", "ext_a")], ["id", "canonical_id"])
    out = apply_canonical_remap(edges, remap).collect()
    assert len(out) == 1 and out[0]["src"] == "ext_a"


def test_resolve_pronouns(spark):
    docs = spark.createDataFrame(
        [("u1", "report", "Alice Johnson shipped the feature. She also wrote docs. "
                          "Bob Chen reviewed. He approved quickly.", 20)],
        ["url", "doc_type", "extracted_text", "word_count"],
    )
    mentions = spark.createDataFrame(
        [("u1", "PERSON", "canonical", 0, "emp_alice", 0),
         ("u1", "PERSON", "canonical", 57, "emp_bob", 1)],
        ["url", "label", "resolution_type", "start", "resolved_id", "mention_idx"],
    )
    out = sorted(
        resolve_pronouns(docs, mentions).collect(), key=lambda r: r["start"]
    )
    assert [r["text"] for r in out] == ["She", "He"]
    assert out[0]["resolved_id"] == "emp_alice"
    assert out[1]["resolved_id"] == "emp_bob"
    assert all(r["resolution_method"] == "pronoun_antecedent" for r in out)
