"""Golden-query harness — the reference's phase-10 validation, answered
purely from the materialized graph (no LLM).

Reference: generate_golden_queries.py derives 100-200 queries from the
ground-truth CSVs (basic_fact :202-251, relationship :253-327, quantitative
:329-393, negative :569-617); validate_rag.py scores answers against them.
Here golden queries are derived from the same corpus ground truth and
answered with set-oriented joins against the triples table; scoring is exact
set equality per category — every graph-answerable category must hit 1.0
because the whole pipeline is deterministic.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F


def generate_golden_queries(corpus: dict[str, pd.DataFrame]) -> pd.DataFrame:
    """(id, category, question, subject_name, predicate, expected array,
    should_succeed) derived from the structured ground truth — the
    generate_golden_queries.py analog."""
    employees = corpus["employees"]
    by_id = {e["id"]: e for e in employees.to_dict("records")}
    projects = {p["id"]: p for p in corpus["projects"].to_dict("records")}
    rows = []

    # basic_fact: manager lookups (generate_golden_queries.py:202-251)
    for e in employees.to_dict("records"):
        if e.get("manager_id"):
            rows.append(
                dict(qid=f"bf_{e['id']}", category="basic_fact",
                     question=f"Who does {e['full_name']} report to?",
                     subject_name=e["full_name"], predicate="REPORTS_TO",
                     expected=[by_id[e["manager_id"]]["full_name"]],
                     should_succeed=True)
            )

    # relationship: project teams from assignments (:253-327)
    team: dict[str, list[str]] = {}
    for a in corpus["assignments"].to_dict("records"):
        team.setdefault(a["project_id"], []).append(by_id[a["employee_id"]]["full_name"])
    for pid, members in team.items():
        rows.append(
            dict(qid=f"rel_{pid}", category="relationship",
                 question=f"Who works on {projects[pid]['name']}?",
                 subject_name=None, predicate="WORKS_ON",
                 expected=sorted(set(members)), should_succeed=True,
                 object_name=projects[pid]["name"])
        )

    # quantitative: per-employee project counts (:329-393)
    per_emp: dict[str, int] = {}
    for a in corpus["assignments"].to_dict("records"):
        per_emp[a["employee_id"]] = per_emp.get(a["employee_id"], 0) + 1
    for eid, cnt in sorted(per_emp.items()):
        rows.append(
            dict(qid=f"qt_{eid}", category="quantitative",
                 question=f"How many projects does {by_id[eid]['full_name']} work on?",
                 subject_name=by_id[eid]["full_name"], predicate="WORKS_ON",
                 expected=[str(cnt)], should_succeed=True)
        )

    # negative: must return nothing (:569-617)
    rows.append(dict(qid="neg_1", category="negative",
                     question="Who does Nonexistent Person report to?",
                     subject_name="Nonexistent Person", predicate="REPORTS_TO",
                     expected=[], should_succeed=False))
    rows.append(dict(qid="neg_2", category="negative",
                     question="Who works on Project Vaporware?",
                     subject_name=None, predicate="WORKS_ON", expected=[],
                     should_succeed=False, object_name="Vaporware"))
    return pd.DataFrame(rows)


def answer_golden_queries(spark: SparkSession, golden: pd.DataFrame, triples: DataFrame) -> pd.DataFrame:
    """Answer every golden query with ONE pass per predicate shape (set-
    oriented — no per-question round trips, unlike rag_system.py:323-393)."""
    # ground-truth edges only (confidence == 1.0) mirror the CSV derivation
    gt = triples.filter(F.col("confidence") == 1.0).select(
        "subject_name", "predicate", "object_name"
    ).persist()

    out = []
    subj_qs = golden[golden["subject_name"].notna()]
    if len(subj_qs):
        qdf = spark.createDataFrame(
            subj_qs[["qid", "subject_name", "predicate"]]
        )
        hits = (
            qdf.join(gt, ["subject_name", "predicate"], "left")
            .groupBy("qid")
            .agg(F.sort_array(F.collect_set("object_name")).alias("answers"))
            .collect()
        )
        by_qid = {r["qid"]: r["answers"] for r in hits}
        for q in subj_qs.to_dict("records"):
            ans = by_qid.get(q["qid"], [])
            if q["category"] == "quantitative":
                ans = [str(len(ans))] if ans else []
            out.append({**q, "answer": ans})

    obj_qs = golden[golden["subject_name"].isna()]
    if len(obj_qs):
        qdf = spark.createDataFrame(obj_qs[["qid", "object_name", "predicate"]])
        hits = (
            qdf.join(gt, ["object_name", "predicate"], "left")
            .groupBy("qid")
            .agg(F.sort_array(F.collect_set("subject_name")).alias("answers"))
            .collect()
        )
        by_qid = {r["qid"]: r["answers"] for r in hits}
        for q in obj_qs.to_dict("records"):
            out.append({**q, "answer": by_qid.get(q["qid"], [])})
    return pd.DataFrame(out)


def score_golden(answered: pd.DataFrame) -> dict[str, float]:
    """Exact-match accuracy per category (validate_rag.py scoring analog;
    graph categories must be 1.0 — config/pipeline.yaml:131-143 requires
    ≥0.75 overall / ≥0.80 graph for the reference's fuzzier LLM pipeline)."""
    scores: dict[str, list[float]] = {}
    for q in answered.to_dict("records"):
        got = sorted(q["answer"]) if isinstance(q["answer"], list) else []
        want = sorted(q["expected"])
        ok = float(got == want) if q["should_succeed"] else float(got == [])
        scores.setdefault(q["category"], []).append(ok)
    return {k: sum(v) / len(v) for k, v in sorted(scores.items())}
