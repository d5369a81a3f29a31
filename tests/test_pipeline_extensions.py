"""North-rule pipeline extensions: pronouns, canonicalization, chunks —
and the invariant that they never degrade the reference-parity triple set."""

from __future__ import annotations

import pytest

from ai_knowledge_graph_builder_spark.plans.pipeline import (
    run_kg_pipeline,
    run_kg_pipeline_checkpointed,
)


@pytest.fixture(scope="module")
def dfs(spark, corpus):
    return {k: spark.createDataFrame(corpus[k]) for k in
            ["pages", "doc_meta", "registry", "employees", "assignments", "policies"]}


def test_pronoun_pass_preserves_triples(spark, dfs):
    base = run_kg_pipeline(spark, dfs["pages"], dfs["registry"], dfs["doc_meta"],
                           dfs["employees"], dfs["assignments"], dfs["policies"])
    ext = run_kg_pipeline(spark, dfs["pages"], dfs["registry"], dfs["doc_meta"],
                          dfs["employees"], dfs["assignments"], dfs["policies"],
                          with_pronouns=True)
    pron = ext["mentions"].filter("resolution_method = 'pronoun_antecedent'")
    rows = pron.collect()
    assert rows, "corpus plants 'They ...' after team mentions — expected pronoun mentions"
    assert all(r["label"] == "PERSON" and r["resolved_id"] for r in rows)
    key = lambda r: (r["subject_id"], r["predicate"], r["object_id"])
    assert {key(r) for r in ext["triples"].collect()} == {key(r) for r in base["triples"].collect()}


def test_checkpointed_with_chunks_and_canonicalization(spark, dfs, tmp_path):
    out, resumed = run_kg_pipeline_checkpointed(
        spark, str(tmp_path / "ext"), dfs["pages"], dfs["registry"], "ext-v1",
        doc_meta=dfs["doc_meta"], employees=dfs["employees"],
        assignments=dfs["assignments"], policies=dfs["policies"],
        with_chunks=True, with_canonicalization=True,
    )
    assert out["chunks"].count() > 0
    emb = out["embeddings"].limit(5).collect()
    assert emb and all(len(r["embedding"]) == 384 for r in emb)
    # canonicalized edges exist and triples assembled from them
    assert out["edges_canonical"].count() > 0
    n_triples = out["triples"].count()
    assert n_triples > 0
    # canonicalization must not lose canonical-entity triples: every
    # ground-truth (confidence 1.0) triple survives
    gt = out["triples"].filter("confidence = 1.0").count()
    base_gt = out["edges"].filter("confidence = 1.0").count()
    assert gt == base_gt
