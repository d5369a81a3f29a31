"""Weighted answer-quality scoring — the reference's validate_rag.py
AnswerQualityChecker re-expressed (weights 0.40 keyword coverage / 0.30
completeness / 0.20 accuracy / 0.10 relevance; validate_rag.py:95-113), with
the same lenient kernels: synonym partial credit (:142-166), word-overlap
fallback (:158-167), no-info phrase handling (:175-192), capitalized-entity /
number accuracy split 0.6/0.4 (:222-250), and question-type relevance
heuristics (:252-287).

Driver-side pure functions: scoring runs over per-question strings — the
golden-question relation is broadcast-sized by construction, so this never
touches a document-scale relation. The heuristics ARE the spec here (same
adjudication as U7/P11): behavioral parity is the goal, the code is
restructured.
"""

from __future__ import annotations

import re

WEIGHTS = {  # validate_rag.py:95-100
    "keyword_coverage": 0.40,
    "completeness": 0.30,
    "accuracy": 0.20,
    "relevance": 0.10,
}

# per-category pass thresholds (config/pipeline.yaml:135-143; the reference's
# config names map onto the 11 generator categories; default 0.70 per
# validate_rag.py:619)
CATEGORY_THRESHOLDS = {
    "basic_fact": 0.80,       # graph_simple
    "relationship": 0.85,     # project_team
    "semantic": 0.85,         # policy_ownership
    "contradiction": 1.0,     # contradiction_test (keep strict)
    "edge_case": 0.90,        # person_only_query
    "complex": 0.85,          # hybrid_complex
}
DEFAULT_THRESHOLD = 0.70

_SYNONYMS = {  # validate_rag.py:142-150
    "manager": ["supervisor", "boss", "reports to", "oversees"],
    "department": ["dept", "team", "division"],
    "role": ["position", "title", "job"],
    "works on": ["assigned to", "working on", "assigned"],
    "individual contributor": ["ic", "contributor", "team member"],
}

_NO_INFO = [  # validate_rag.py:176-179
    "i don't have", "i don't know", "no information",
    "unable to find", "not sure", "unclear", "insufficient information",
]

_STOP = {"the", "a", "an", "is", "are", "in", "on", "at", "to", "for", "of", "and", "or"}


def keyword_coverage(answer: str, keywords: list[str], expected: str) -> float:
    """Lenient keyword check: direct / half-words partial (0.5) / synonym
    (0.7) credit, 30%-overlap concept fallback."""
    if not keywords:
        return 1.0
    answer_lower, expected_lower = answer.lower(), expected.lower()
    found = 0.0
    for kw in keywords:
        kw_lower = kw.lower()
        if kw_lower in answer_lower:
            found += 1
            continue
        kw_words = kw_lower.split()
        if len(kw_words) > 1:
            hits = sum(1 for w in kw_words if w in answer_lower)
            if hits >= len(kw_words) / 2:
                found += 0.5
                continue
        for key, syns in _SYNONYMS.items():
            if key in kw_lower and any(s in answer_lower for s in syns):
                found += 0.7
                break
    if found == 0:
        exp_words = set(expected_lower.split()) - {"the", "a", "an", "is", "are", "in", "on"}
        overlap = len(exp_words & set(answer_lower.split()))
        if exp_words and overlap >= len(exp_words) * 0.3:
            found = len(keywords) * 0.3
    return min(1.0, found / len(keywords))


def completeness(answer: str, question: str, expected: str) -> float:
    """No-info phrase cross-matrix, then stopword-pruned overlap with a
    +0.2 complete-sentence boost at ≥0.3 overlap."""
    answer_lower, expected_lower = answer.lower(), expected.lower()
    has_no_info = any(p in answer_lower for p in _NO_INFO)
    expects_no_info = any(p in expected_lower for p in ["n/a", "not", "no ", "none"])
    if has_no_info and expects_no_info:
        return 0.8
    if has_no_info:
        return 0.2
    if expects_no_info:
        return 0.3
    exp_words = set(expected_lower.split()) - _STOP
    ans_words = set(answer_lower.split()) - _STOP
    if not exp_words:
        return 0.8
    base = len(exp_words & ans_words) / len(exp_words)
    if base >= 0.3 and answer.endswith(".") and len(answer.split()) >= 3:
        base = min(1.0, base + 0.2)
    return min(1.0, base)


def accuracy(answer: str, expected: str) -> float:
    """Capitalized-entity overlap (0.6) + number overlap (0.4); an absent
    side scores 0.8 (nothing to check)."""
    ent_re = r"\b[A-Z][a-z]+(?:\s+[A-Z][a-z]+)*\b"
    exp_ents, ans_ents = set(re.findall(ent_re, expected)), set(re.findall(ent_re, answer))
    entity_score = (len(exp_ents & ans_ents) / len(exp_ents)) if exp_ents else 0.8
    exp_nums, ans_nums = set(re.findall(r"\b\d+\b", expected)), set(re.findall(r"\b\d+\b", answer))
    number_score = (len(exp_nums & ans_nums) / len(exp_nums)) if exp_nums else 0.8
    return entity_score * 0.6 + number_score * 0.4


def relevance(question: str, answer: str) -> float:
    """Question-type heuristics: who→person present, what→≥3 words,
    department/role keyword lists, default 0.7 unless no-info."""
    q, a = question.lower(), answer.lower()
    if q.startswith("who"):
        return 0.9 if re.search(r"\b[A-Z][a-z]+\s+[A-Z][a-z]+\b", answer) else 0.5
    if q.startswith("what"):
        return 0.8 if len(answer.split()) >= 3 else 0.4
    if "department" in q:
        depts = ["engineering", "sales", "marketing", "hr", "finance",
                 "operations", "product", "data", "it", "legal"]
        return 0.9 if any(d in a for d in depts) else 0.5
    if "role" in q or "position" in q:
        roles = ["manager", "director", "engineer", "developer", "analyst",
                 "lead", "head", "chief", "specialist", "coordinator", "contributor"]
        return 0.9 if any(r in a for r in roles) else 0.5
    return 0.7 if "i don't" not in a else 0.5


def weighted_score(
    question: str, answer: str, expected: str, keywords: list[str] | None = None
) -> tuple[float, dict[str, float]]:
    """The 0.40/0.30/0.20/0.10 weighted total + per-check scores.
    ``keywords`` defaults to the expected answer's items split on commas."""
    if keywords is None:
        keywords = [k.strip() for k in expected.split(",") if k.strip()]
    scores = {
        "keyword_coverage": keyword_coverage(answer, keywords, expected),
        "completeness": completeness(answer, question, expected),
        "accuracy": accuracy(answer, expected),
        "relevance": relevance(question, answer),
    }
    total = sum(scores[k] * w for k, w in WEIGHTS.items())
    return total, scores


def render_answer(items: list[str]) -> str:
    """Answer-set → sentence, the shape the reference scores (an extractive
    answer naming every item): 'A, B, C.' or the no-info sentence."""
    if not items:
        return "I don't have that information."
    return ", ".join(items) + "."
