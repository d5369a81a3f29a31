"""M2-M4: Spark pipeline output == plain-pandas reference oracle (exact).

The P/R >= 0.95 driver criterion is checked here as exact set equality on
(subject_name, predicate, object_name) — precision == recall == 1.0 — plus
full-row parity for mentions and triples, since every nondeterminism is
pinned (SURVEY.md §7.4)."""

from __future__ import annotations

import pytest

from ai_knowledge_graph_builder_spark.functions.ner import RuleNER
from ai_knowledge_graph_builder_spark.plans.oracle import run_oracle
from ai_knowledge_graph_builder_spark.plans.pipeline import run_kg_pipeline


@pytest.fixture(scope="module")
def oracle_result(corpus):
    return run_oracle(corpus, RuleNER())


@pytest.fixture(scope="module")
def spark_result(spark, corpus):
    dfs = {k: spark.createDataFrame(corpus[k]) for k in
           ["pages", "doc_meta", "registry", "employees", "assignments",
            "policies", "emails"]}
    return run_kg_pipeline(
        spark,
        pages=dfs["pages"],
        registry=dfs["registry"],
        doc_meta=dfs["doc_meta"],
        employees=dfs["employees"],
        assignments=dfs["assignments"],
        policies=dfs["policies"],
        emails=dfs["emails"],
    )


def _mention_key(r):
    return (r["url"], r["mention_idx"], r["text"], r["label"], r["resolved_id"],
            r["resolution_method"], r["resolution_type"], round(float(r["confidence"]), 4))


def test_corpus_exercises_all_paths(oracle_result):
    m = oracle_result["mentions"]
    methods = set(m["resolution_method"])
    assert {"exact_match", "fuzzy_match", "external_entity"} <= methods, methods
    t = oracle_result["triples"]
    assert (t["inferred"]).any(), "no inferred triples — corpus too sparse"
    assert (t["flagged"]).any(), "no flagged (contradiction) triples"
    preds = set(t["predicate"])
    assert "WORKS_ON" in preds and "REPORTS_TO" in preds and "OWNS" in preds
    # all five A4 rules fire (entity_extractor.py:430-450)
    inferred_preds = set(t[t["inferred"]]["predicate"])
    assert inferred_preds == {"WORKS_ON", "USES", "GOVERNED_BY", "REFERENCES", "COMPLIES_WITH"}, inferred_preds
    # both WORKS_ON confidence tiers (>=5 → 0.7, >=3 → 0.6)
    works_conf = set(t[t["inferred"] & (t["predicate"] == "WORKS_ON")]["confidence"])
    assert {0.6, 0.7} <= works_conf, works_conf


def test_mentions_parity(spark_result, oracle_result):
    got = {_mention_key(r.asDict()) for r in spark_result["mentions"].collect()}
    want = {_mention_key(r) for r in oracle_result["mentions"].to_dict("records")}
    assert got == want, (
        f"spark-only={sorted(got - want)[:5]} oracle-only={sorted(want - got)[:5]}"
    )


def test_triples_exact_parity(spark_result, oracle_result):
    cols = ["subject_id", "subject_name", "subject_type", "predicate", "object_id",
            "object_name", "object_type", "source", "flagged", "inferred", "text"]

    def key(d):
        return tuple(d[c] for c in cols) + (round(float(d["confidence"]), 4),)

    got = {key(r.asDict()) for r in spark_result["triples"].collect()}
    want = {key(r) for r in oracle_result["triples"].to_dict("records")}
    assert got == want, (
        f"spark-only={sorted(got - want)[:5]} oracle-only={sorted(want - got)[:5]}"
    )


def test_triple_spo_precision_recall(spark_result, oracle_result):
    """The driver metric: P/R on (subject_name, predicate, object_name)."""
    got = {(r["subject_name"], r["predicate"], r["object_name"])
           for r in spark_result["triples"].collect()}
    want = {(r["subject_name"], r["predicate"], r["object_name"])
            for r in oracle_result["triples"].to_dict("records")}
    tp = len(got & want)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(want) if want else 0.0
    assert precision == 1.0 and recall == 1.0, (precision, recall)


def test_nodes_parity(spark_result, oracle_result):
    got = {(r["id"], r["name"], r["node_type"]) for r in spark_result["nodes"].collect()}
    want = {(r["id"], r["name"], r["node_type"])
            for r in oracle_result["nodes"].to_dict("records")}
    assert got == want, (
        f"spark-only={sorted(got - want)[:5]} oracle-only={sorted(want - got)[:5]}"
    )


def _edge_key(r):
    props = r["props"] or {}
    return (r["src"], r["predicate"], r["dst"], round(float(r["confidence"]), 4),
            r["source"], bool(r["flagged"]), bool(r["inferred"]),
            tuple(sorted(props.items())))


def test_full_edge_set_parity(spark_result, oracle_result):
    """The COMPLETE graph edge set — ground truth, contradiction, inferred,
    NER MENTIONS (D1 first-wins), metadata MENTIONS (J5 exists-gated),
    shadow MENTIONS, SENT/SENT_TO (J4) — matches the loop-by-loop oracle
    row for row, props included."""
    got = {_edge_key(r.asDict()) for r in spark_result["edges"].collect()}
    want = {_edge_key(r) for r in oracle_result["edges"].to_dict("records")}
    assert got == want, (
        f"spark-only={sorted(got - want)[:4]} oracle-only={sorted(want - got)[:4]}"
    )
    # every family present (non-vacuous)
    preds = {k[1] for k in got}
    sources = {k[4] for k in got}
    assert {"MENTIONS", "SENT", "SENT_TO"} <= preds, preds
    assert {"phase7_extraction", "metadata", "phase6_shadow", "emails_metadata"} <= sources


def test_mention_edges_first_wins(spark_result):
    """D1: one edge per (doc, entity, surface text) — MERGE absorbed every
    later duplicate."""
    from collections import Counter

    ment = [r for r in spark_result["edges"].collect()
            if r["predicate"] == "MENTIONS" and r["source"] == "phase7_extraction"]
    keys = Counter((r["src"], r["dst"], r["props"]["mention_text"]) for r in ment)
    assert ment and max(keys.values()) == 1


def test_orphan_parity(spark, spark_result, oracle_result):
    """A9: orphan counts per node type on the FULL graph (MENTIONS/SENT
    included) match the oracle's no-edge-in-either-direction scan
    (neo4j_loader.py:481-489)."""
    from ai_knowledge_graph_builder_spark.operators.graph_queries import orphan_nodes

    got = {r["node_type"]: r["n_orphans"]
           for r in orphan_nodes(spark_result["nodes"], spark_result["edges"]).collect()}
    e = oracle_result["edges"]
    touched = set(e["src"]) | set(e["dst"])
    want: dict[str, int] = {}
    for n in oracle_result["nodes"].to_dict("records"):
        if n["id"] not in touched:
            want[n["node_type"]] = want.get(n["node_type"], 0) + 1
    assert got == want, (got, want)


def test_external_entities_respect_threshold(oracle_result):
    ext = oracle_result["mentions"]
    ext = ext[ext["resolution_type"] == "external"]
    counts = ext.groupby(ext["text"].str.lower().str.strip()).size()
    assert (counts >= 2).all()


def test_parity_at_larger_scale(spark):
    """P/R stability: exact SPO parity holds on a 3x corpus (different rng
    draws, more co-occurrence density, more fuzzy/external collisions)."""
    from ai_knowledge_graph_builder_spark.sources.corpus import generate_corpus

    big = generate_corpus(seed=7, waves=10, n_emails=40, n_external=10,
                          filler_max_words=80)
    dfs = {k: spark.createDataFrame(big[k]) for k in
           ["pages", "doc_meta", "registry", "employees", "assignments",
            "policies", "emails"]}
    out = run_kg_pipeline(spark, dfs["pages"], dfs["registry"], dfs["doc_meta"],
                          dfs["employees"], dfs["assignments"], dfs["policies"],
                          emails=dfs["emails"])
    got = {(r["subject_name"], r["predicate"], r["object_name"])
           for r in out["triples"].collect()}
    want = {(r["subject_name"], r["predicate"], r["object_name"])
            for r in run_oracle(big, RuleNER())["triples"].to_dict("records")}
    tp = len(got & want)
    assert got and tp / len(got) == 1.0 and tp / len(want) == 1.0, (
        len(got), len(want), sorted(got ^ want)[:4]
    )
