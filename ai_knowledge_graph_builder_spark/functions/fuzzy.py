"""Fuzzy alias scoring — real difflib, plus an exact-safe blocking prefilter.

The reference scores every unresolved mention against EVERY alias with
``SequenceMatcher(None, mention, alias).ratio()`` and keeps the running max
with strict ``>`` — i.e. the FIRST alias (dict insertion order) achieving the
max wins (entity_extractor.py:272-283). Acceptance threshold 0.90
(config/pipeline.yaml:56).

We run the identical difflib call (bit-identical scores, autojunk included —
SURVEY.md §7.4 risk 3) but prune aliases that provably cannot reach the
threshold: ``ratio() == 2*M/(len_a+len_b) <= 2*min(len)/(len_a+len_b)``, so a
pair with ``2*min/(la+lb) < threshold`` can never be accepted. Pruned aliases
also can never change the selected argmax of an accepted mention: any accepted
best score is >= threshold > every pruned score, and the strict-> running max
ignores non-improving candidates. Hence blocking is exact.
"""

from __future__ import annotations

from difflib import SequenceMatcher


def best_alias_match(
    mention_text: str,
    aliases: list[str],
    threshold: float = 0.90,
) -> tuple[str | None, float]:
    """First-max argmax over aliases in insertion order; returns
    (alias or None, best_score). ``aliases`` MUST be in dict insertion order
    (entity_extractor.py:277-282)."""
    la = len(mention_text)
    best: str | None = None
    best_score = 0.0
    for alias in aliases:
        lb = len(alias)
        denom = la + lb
        if denom == 0:
            score = 1.0  # difflib defines ratio('', '') == 1.0
        elif 2.0 * min(la, lb) / denom < threshold:
            # cannot reach threshold; see module docstring for exactness proof
            continue
        else:
            score = SequenceMatcher(None, mention_text, alias).ratio()
        if score > best_score:
            best_score = score
            best = alias
    if best_score < threshold:
        return None, best_score
    return best, best_score
