"""M6: committed-stage checkpoint + lineage + resume semantics.

Simulates the kill/resume scenario: a first run is interrupted after the
mentions stage committed (later stages' manifests removed = never written);
the restarted run must skip every committed stage (build functions not
re-invoked — observed via unchanged manifests) and produce the identical
final triple set."""

from __future__ import annotations

import json
import shutil
from pathlib import Path

import pytest

from ai_knowledge_graph_builder_spark.plans.checkpoint import (
    COMMIT_FILE,
    read_manifest,
    run_stage,
)
from ai_knowledge_graph_builder_spark.plans.pipeline import run_kg_pipeline_checkpointed


@pytest.fixture()
def spark_dfs(spark, corpus):
    return {k: spark.createDataFrame(corpus[k]) for k in
            ["pages", "doc_meta", "registry", "employees", "assignments", "policies"]}


def _run(spark, dfs, base):
    return run_kg_pipeline_checkpointed(
        spark, str(base), dfs["pages"], dfs["registry"], corpus_fingerprint="test-v1",
        doc_meta=dfs["doc_meta"], employees=dfs["employees"],
        assignments=dfs["assignments"], policies=dfs["policies"],
    )


def test_stage_commit_and_skip(spark, tmp_path):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(10).withColumnRenamed("id", "k")

    d = tmp_path / "stage"
    df1, resumed1 = run_stage(spark, d, "s1", "fp-a", build, key_col="k")
    assert not resumed1 and calls["n"] == 1 and df1.count() == 10
    df2, resumed2 = run_stage(spark, d, "s1", "fp-a", build, key_col="k")
    assert resumed2 and calls["n"] == 1 and df2.count() == 10
    # input changed → rebuild
    _, resumed3 = run_stage(spark, d, "s1", "fp-b", build, key_col="k")
    assert not resumed3 and calls["n"] == 2

    m = read_manifest(d)
    assert m["row_count"] == 10
    assert all({"split", "row_count", "checksum"} <= set(r) for r in m["lineage"])


def test_kill_resume_identical_triples(spark, spark_dfs, tmp_path):
    full = tmp_path / "full"
    out_full, resumed_full = _run(spark, spark_dfs, full)
    assert not any(resumed_full.values())
    want = {tuple(r) for r in out_full["triples"].collect()}

    # "killed" run: copy only the stages that had committed before the kill
    killed = tmp_path / "killed"
    killed.mkdir()
    for stage in ["documents", "mentions_raw", "mentions"]:
        shutil.copytree(full / stage, killed / stage)

    out2, resumed2 = _run(spark, spark_dfs, killed)
    assert resumed2["documents"] and resumed2["mentions_raw"] and resumed2["mentions"]
    assert not resumed2["edges"] and not resumed2["triples"]
    got = {tuple(r) for r in out2["triples"].collect()}
    assert got == want

    # committed manifests untouched by the resume (not rebuilt)
    m1 = json.loads((full / "mentions" / COMMIT_FILE).read_text())
    m2 = json.loads((killed / "mentions" / COMMIT_FILE).read_text())
    assert m1["lineage"] == m2["lineage"] and m1["committed_at"] == m2["committed_at"]


def test_checkpointed_matches_in_memory(spark, spark_dfs, corpus, tmp_path):
    """The committed-stage plan and the lazy in-memory plan agree with the
    pandas oracle triple set."""
    from ai_knowledge_graph_builder_spark.functions.ner import RuleNER
    from ai_knowledge_graph_builder_spark.plans.oracle import run_oracle

    out, _ = _run(spark, spark_dfs, tmp_path / "ck")
    got = {(r["subject_name"], r["predicate"], r["object_name"])
           for r in out["triples"].collect()}
    want = {(r["subject_name"], r["predicate"], r["object_name"])
            for r in run_oracle(corpus, RuleNER())["triples"].to_dict("records")}
    assert got == want


def test_integrity_check_detects_corruption(spark, tmp_path):
    from ai_knowledge_graph_builder_spark.plans.checkpoint import verify_stage_integrity

    d = tmp_path / "s"
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(1000).withColumnRenamed("id", "k")

    run_stage(spark, d, "s", "fp", build, key_col="k")
    assert verify_stage_integrity(spark, d)

    # corrupt: drop one data file (simulates partial loss after commit)
    victim = sorted(d.glob("*.parquet"))[0]
    victim.unlink()
    assert not verify_stage_integrity(spark, d)

    # plain resume would trust the snapshot; verify_integrity rebuilds
    _, resumed = run_stage(spark, d, "s", "fp", build, key_col="k")
    assert resumed and calls["n"] == 1
    df, resumed2 = run_stage(spark, d, "s", "fp", build, key_col="k", verify_integrity=True)
    assert not resumed2 and calls["n"] == 2 and df.count() == 1000
    assert verify_stage_integrity(spark, d)
