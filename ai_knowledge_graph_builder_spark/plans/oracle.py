"""Plain-pandas/stdlib reference oracle for the document→triples flow.

A faithful, loop-by-loop reimplementation of the reference's phase 6-7
semantics (neo4j_loader.py + entity_extractor.py) in ~200 lines of driver
Python, sharing the SAME pure kernels (extract_text, RuleNER detector,
stable external ids) as the Spark pipeline. pytest asserts the Spark
pipeline's mention/edge/triple sets equal this oracle's output exactly
(P/R == 1.0 target; SURVEY.md §5).

Arrival-order conventions (SURVEY.md §7.4 risk 2): documents are processed in
sorted(url) order (reference: sorted(glob), neo4j_loader.py:252-269); mentions
within a document in span order; the alias dict uses plain-assignment
last-wins with first-insertion key order (entity_extractor.py:119-149).
"""

from __future__ import annotations

from collections import defaultdict
from difflib import SequenceMatcher

import pandas as pd

from ..functions.hashing import external_entity_id, stable_hash64
from ..functions.html import extract_text
from ..functions.ner import NER_LABELS

RESOLUTION_THRESHOLD = 0.90  # config/pipeline.yaml:56
COOCCUR_THRESHOLD = 3  # config/pipeline.yaml:60
EXTERNAL_ENTITY_THRESHOLD = 2  # config/pipeline.yaml:63
EXCLUDED_PREDICATES = {"MENTIONS", "SENT", "SENT_TO"}  # entity_extractor.py:459


def infer_relationship_type(type1: str, type2: str, count: int):
    """entity_extractor.py:430-450 verbatim semantics."""
    if type1 == "emp" and type2 == "proj":
        if count >= 5:
            return "WORKS_ON", 0.7
        if count >= 3:
            return "WORKS_ON", 0.6
    elif type1 == "proj" and type2 == "prod":
        if count >= 3:
            return "USES", 0.6
    elif type1 == "proj" and type2 == "pol":
        if count >= 2:
            return "GOVERNED_BY", 0.5
    elif type1 == "pol" and type2 == "reg":
        if count >= 2:
            return "REFERENCES", 0.5
    elif type1 == "prod" and type2 == "reg":
        if count >= 2:
            return "COMPLIES_WITH", 0.5
    return None, 0.0


NODE_TYPE_BY_ETYPE = {
    "employee": "Employee",
    "project": "Project",
    "product": "Product",
    "policy": "Policy",
    "regulation": "Regulation",
}


def run_oracle(corpus: dict[str, pd.DataFrame], detector) -> dict[str, pd.DataFrame]:
    """Run phases 6-7 on a generate_corpus() fixture set with the given
    mention detector. Returns documents / mentions / nodes / edges / triples
    pandas DataFrames."""
    pages = corpus["pages"].sort_values("url")
    meta = {m["url"]: m for m in corpus["doc_meta"].to_dict("records")}
    registry = corpus["registry"]

    # ---- phase 6: documents (neo4j_loader.py:243-299) ---------------------
    documents = []
    for row in pages.itertuples(index=False):
        text = extract_text(row.html)
        m = meta.get(row.url, {})
        documents.append(
            {
                "url": row.url,
                "doc_type": m.get("doc_type"),
                "extracted_text": text,
                "word_count": len(text.split()),
                "confidence": m.get("confidence_alignment", 1.0),
                "has_contradictions": bool(m.get("contradictions")),
            }
        )

    # ---- nodes from registry (neo4j_loader.py:100-145) --------------------
    nodes: dict[str, dict] = {}
    for r in registry.itertuples(index=False):
        name = r.full_name if isinstance(r.full_name, str) and r.full_name else r.name
        nodes[r.entity_id] = {
            "id": r.entity_id,
            "name": name,
            "node_type": NODE_TYPE_BY_ETYPE[r.entity_type],
            "confidence": 1.0,
            "source": "registry",
        }
    registry_ids = set(nodes)  # phase-6 graph state for the J5 exists-check

    # ---- Document nodes (neo4j_loader.py:286-299) --------------------------
    for d in documents:
        nodes[d["url"]] = {
            "id": d["url"], "name": d["url"], "node_type": "Document",
            "confidence": d["confidence"] if d["confidence"] is not None else 1.0,
            "source": d["doc_type"] or "document",
        }

    # ---- ground-truth edges (neo4j_loader.py:151-213) ---------------------
    edges: list[dict] = []
    for e in corpus["employees"].to_dict("records"):
        if e.get("manager_id"):
            edges.append(_edge(e["employee_id"] if "employee_id" in e else e["id"],
                               "REPORTS_TO", e["manager_id"], 1.0, "employees.csv"))
    for a in corpus["assignments"].to_dict("records"):
        edges.append(_edge(a["employee_id"], "WORKS_ON", a["project_id"], 1.0,
                           "project_assignments.csv", props={"role": a["role"]}))
    for p in corpus["policies"].to_dict("records"):
        if p.get("owner_id"):
            edges.append(_edge(p["owner_id"], "OWNS", p["id"] if "id" in p else p["policy_id"],
                               1.0, "policies.csv"))

    # ---- SENT / SENT_TO from email metadata (neo4j_loader.py:301-344) ------
    emp_by_email = {
        e["email"]: e["id"] for e in corpus["employees"].to_dict("records")
    }
    for e in corpus.get("emails", pd.DataFrame()).to_dict("records"):
        if e["from_email"] in emp_by_email:
            edges.append(_edge(emp_by_email[e["from_email"]], "SENT", e["url"], 1.0,
                               "emails_metadata",
                               props={"timestamp": e["ts"], "subject": e["subject"]}))
        if e["to_email"] in emp_by_email:
            edges.append(_edge(e["url"], "SENT_TO", emp_by_email[e["to_email"]], 1.0,
                               "emails_metadata", props={"timestamp": e["ts"]}))

    # ---- metadata MENTIONS behind entity-exists (neo4j_loader.py:346-366) --
    for m in corpus["doc_meta"].to_dict("records"):
        for em in m.get("entities_mentioned") or []:
            if em["id"] in registry_ids:
                edges.append(_edge(m["url"], "MENTIONS", em["id"], 0.9, "metadata",
                                   props={"mention_text": em["mention_text"],
                                          "extraction_method": "metadata"}))

    # ---- contradiction edges (neo4j_loader.py:368-386): flagged WORKS_ON ---
    for m in corpus["doc_meta"].to_dict("records"):
        for c in m.get("contradictions") or []:
            if c["type"] == "project_assignment" and c["document_value"] in registry_ids:
                edges.append(
                    _edge(c["entity"], "WORKS_ON", c["document_value"], 0.3,
                          m["url"], flagged=True,
                          props={"contradiction_reason": c["explanation"],
                                 "extraction_method": "contradiction"})
                )

    # ---- shadow entities + their flagged MENTIONS (neo4j_loader.py:388-414);
    # docs in sorted(url) order so "first creating doc" matches the engine's
    # min(url); ids content-derived (operators/graph.shadow_entities)
    for m in sorted(corpus["doc_meta"].to_dict("records"), key=lambda r: r["url"]):
        for c in m.get("contradictions") or []:
            if c["type"] in ("product_mention", "policy_reference"):
                name = c.get("document_value") or c.get("entity")
                sid = f"shadow_{stable_hash64(name) % 100000:05d}"
                if sid in nodes:
                    continue
                nodes[sid] = {
                    "id": sid, "name": name, "node_type": "ShadowEntity",
                    "confidence": 0.3, "source": m["url"],
                }
                edges.append(_edge(m["url"], "MENTIONS", sid, 0.4, "phase6_shadow",
                                   flagged=True, props={"mention_text": name}))

    # ---- alias dict (entity_extractor.py:119-151): plain dict assignment ---
    entity_lookup: dict[str, str] = {}
    for r in registry.itertuples(index=False):
        if r.entity_type == "employee":
            entity_lookup[r.full_name.lower()] = r.entity_id
            entity_lookup[r.first_name.lower()] = r.entity_id
            entity_lookup[r.last_name.lower()] = r.entity_id
            entity_lookup[f"mr. {r.last_name.lower()}"] = r.entity_id
            entity_lookup[f"ms. {r.last_name.lower()}"] = r.entity_id
        elif r.entity_type == "project":
            entity_lookup[r.name.lower()] = r.entity_id
            entity_lookup[f"project {r.name.lower()}"] = r.entity_id
        elif r.entity_type == "regulation":
            entity_lookup[r.name.lower()] = r.entity_id
            if isinstance(r.full_name, str) and r.full_name:
                entity_lookup[r.full_name.lower()] = r.entity_id
        else:
            entity_lookup[r.name.lower()] = r.entity_id

    # ---- STEP 1: NER extraction (entity_extractor.py:154-194) -------------
    extracted = []
    for d in documents:
        if d["word_count"] <= 0:
            continue
        for mi, ent in enumerate(detector(d["extracted_text"])):
            if ent.label in NER_LABELS:
                extracted.append(
                    {
                        "url": d["url"],
                        "doc_type": d["doc_type"],
                        "mention_idx": mi,
                        "text": ent.text,
                        "label": ent.label,
                        "start": ent.start,
                        "end": ent.end,
                    }
                )

    # ---- STEP 2: resolution (entity_extractor.py:196-270) -----------------
    resolved = []
    external_mentions: dict[str, list[dict]] = defaultdict(list)
    for m in extracted:
        norm = m["text"].lower().strip()
        if norm in entity_lookup:
            resolved.append({**m, "resolved_id": entity_lookup[norm],
                             "resolution_method": "exact_match",
                             "resolution_type": "canonical", "confidence": 0.95})
            continue
        best_match, best_score = None, 0.0
        for alias in entity_lookup.keys():  # first-insertion key order
            score = SequenceMatcher(None, norm, alias).ratio()
            if score > best_score:
                best_score, best_match = score, alias
        if best_match and best_score >= RESOLUTION_THRESHOLD:
            resolved.append({**m, "resolved_id": entity_lookup[best_match],
                             "resolution_method": "fuzzy_match",
                             "resolution_type": "canonical",
                             "confidence": round(best_score, 2)})
        else:
            external_mentions[norm].append(m)

    for norm, ms in external_mentions.items():
        if len(ms) >= EXTERNAL_ENTITY_THRESHOLD:
            ext_id = external_entity_id(norm, ms[0]["label"])
            if ext_id not in nodes:
                nodes[ext_id] = {"id": ext_id, "name": norm,
                                 "node_type": "ExternalEntity", "confidence": 0.4,
                                 "source": "phase7_extraction"}
            for m in ms:
                resolved.append({**m, "resolved_id": ext_id,
                                 "resolution_method": "external_entity",
                                 "resolution_type": "external", "confidence": 0.4})

    # ---- STEP 3: NER MENTIONS edges, first-wins MERGE on (doc, entity,
    # mention_text) — ON CREATE keeps the FIRST mention's confidence/position
    # in arrival order (entity_extractor.py:310-353)
    seen_mention_keys: set[tuple] = set()
    for m in resolved:
        key = (m["url"], m["resolved_id"], m["text"])
        if key in seen_mention_keys:
            continue
        seen_mention_keys.add(key)
        edges.append(_edge(m["url"], "MENTIONS", m["resolved_id"], m["confidence"],
                           "phase7_extraction",
                           props={"mention_text": m["text"],
                                  "position": str(m["start"]),
                                  "extraction_method": "rule_ner",
                                  "resolution_type": m["resolution_type"]}))

    # ---- STEP 4: co-occurrence (entity_extractor.py:355-379) --------------
    doc_entities: dict[str, list[str]] = defaultdict(list)
    for m in resolved:
        if m["resolution_type"] == "canonical":
            doc_entities[m["url"]].append(m["resolved_id"])
    cooccur: dict[tuple[str, str], int] = defaultdict(int)
    for _url, eids in doc_entities.items():
        uniq = list(set(eids))
        for i, e1 in enumerate(uniq):
            for e2 in uniq[i + 1 :]:
                cooccur[(e1, e2)] += 1
                cooccur[(e2, e1)] += 1

    # ---- STEP 5: inference (entity_extractor.py:381-424) ------------------
    existing = {(e["src"], e["predicate"], e["dst"]) for e in edges}
    for (e1, e2), count in cooccur.items():
        if count < COOCCUR_THRESHOLD:
            continue
        rel, conf = infer_relationship_type(e1.split("_")[0], e2.split("_")[0], count)
        if rel and (e1, rel, e2) not in existing:
            edges.append(_edge(e1, rel, e2, conf, "phase7_inference",
                               inferred=True,
                               props={"cooccurrence_count": str(count),
                                      "extraction_method": "co_occurrence"}))
            existing.add((e1, rel, e2))

    # ---- STEP 6: triples (entity_extractor.py:452-499) --------------------
    triples = []
    for e in edges:
        if e["predicate"] in EXCLUDED_PREDICATES:
            continue
        s, o = nodes.get(e["src"]), nodes.get(e["dst"])
        if s is None or o is None:
            continue
        triples.append(
            {
                "subject_id": s["id"], "subject_name": s["name"],
                "subject_type": s["node_type"], "predicate": e["predicate"],
                "object_id": o["id"], "object_name": o["name"],
                "object_type": o["node_type"], "confidence": e["confidence"],
                "source": e["source"], "flagged": e["flagged"],
                "inferred": e["inferred"],
                "text": f"{s['name']} {e['predicate'].replace('_', ' ').lower()} {o['name']}",
            }
        )

    return {
        "documents": pd.DataFrame(documents),
        "mentions": pd.DataFrame(resolved),
        "nodes": pd.DataFrame(list(nodes.values())),
        "edges": pd.DataFrame(edges),
        "triples": pd.DataFrame(triples),
    }


def _edge(src, predicate, dst, confidence, source, flagged=False, inferred=False, props=None):
    return {
        "src": src, "predicate": predicate, "dst": dst,
        "confidence": confidence, "source": source,
        "flagged": flagged, "inferred": inferred, "props": props or {},
    }
