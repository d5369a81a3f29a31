"""D1/J4/J5 + Document nodes: the non-semantic edge families that complete
the reference's published graph (its 777-relationship demo graph counts
MENTIONS / SENT / SENT_TO alongside the semantic triples).

Reference semantics:

- Document nodes: one per ingested document with filename/word_count props
  (neo4j_loader.py:286-299).
- D1 NER MENTIONS edges: per resolved mention,
  ``MERGE (d)-[m:MENTIONS {mention_text}]->(e)`` with ON CREATE — i.e.
  first-wins per (document, entity, surface text), keeping the FIRST
  mention's confidence/position in arrival order
  (entity_extractor.py:310-353).
- J5 metadata MENTIONS edges: the doc metadata's declared
  ``entities_mentioned`` list → confidence-0.9 MENTIONS edges, CREATEd only
  when the target entity exists (neo4j_loader.py:346-366). This ingest runs
  BEFORE phase 7, so the exists-check sees only registry/structured nodes.
- J4 SENT / SENT_TO edges: email metadata joined to employees by address;
  ``(Employee)-[:SENT {timestamp, subject}]->(Document)`` and
  ``(Document)-[:SENT_TO {timestamp}]->(Employee)``; an address with no
  matching employee emits nothing (neo4j_loader.py:301-344).
- Shadow MENTIONS: each ShadowEntity gets one flagged MENTIONS edge from the
  document that created it (neo4j_loader.py:406-411).

Spark realization / scale notes: D1 is one partial+final hash aggregation
keyed by (url, resolved_id, text) with the winner picked by explicit
``min_by(…, mention_idx)`` — no window, no physical-order reliance. J4/J5
join against broadcast dimensions (employees / registry nodes). Document
nodes are a projection of the documents table. Nothing here shuffles the
mention relation more than once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

MENTION_EXTRACTION_METHOD = "rule_ner"  # reference: 'spacy_ner' (entity_extractor.py:338)


def document_nodes(documents: DataFrame) -> DataFrame:
    """One Document node per document (neo4j_loader.py:286-299); id = url
    (replaces the reference's filename-derived doc_id)."""
    return documents.select(
        F.col("url").alias("id"),
        F.col("url").alias("name"),
        F.lit("Document").alias("node_type"),
        F.coalesce(F.col("confidence"), F.lit(1.0)).alias("confidence"),
        F.coalesce(F.col("doc_type"), F.lit("document")).alias("source"),
        F.map_from_arrays(
            F.array(F.lit("word_count")),
            F.array(F.col("word_count").cast("string")),
        ).alias("props"),
    )


def mention_edges(mentions_resolved: DataFrame) -> DataFrame:
    """D1: (Document)-[MENTIONS {mention_text}]->(Entity) with MERGE-on-
    (doc, entity, text) first-wins semantics: the FIRST mention in arrival
    order — min mention_idx, the explicit (url, mention_idx) global order key
    (schemas.py) — contributes confidence and position; later duplicates of
    the same surface text in the same document are absorbed."""
    first = F.min_by(
        F.struct("confidence", "start", "resolution_type"), F.col("mention_idx")
    ).alias("first")
    g = mentions_resolved.groupBy("url", "resolved_id", "text").agg(first)
    return g.select(
        F.col("url").alias("src"),
        F.lit("MENTIONS").alias("predicate"),
        F.col("resolved_id").alias("dst"),
        F.col("first.confidence").alias("confidence"),
        F.lit("phase7_extraction").alias("source"),
        F.lit(False).alias("flagged"),
        F.lit(False).alias("inferred"),
        F.map_from_arrays(
            F.array(F.lit("mention_text"), F.lit("position"),
                    F.lit("extraction_method"), F.lit("resolution_type")),
            F.array(F.col("text"), F.col("first.start").cast("string"),
                    F.lit(MENTION_EXTRACTION_METHOD), F.col("first.resolution_type")),
        ).alias("props"),
    )


def metadata_mention_edges(doc_meta: DataFrame, registry_nodes: DataFrame) -> DataFrame:
    """J5: declared entities_mentioned → confidence-0.9 MENTIONS edges behind
    the entity-exists gate (left_semi against the registry node set — the
    phase-6 graph state, which predates external/shadow creation)."""
    m = doc_meta.select(
        "url", F.explode(F.coalesce("entities_mentioned", F.array())).alias("m")
    )
    m = m.join(
        F.broadcast(registry_nodes.select(F.col("id").alias("eid"))),
        m["m.id"] == F.col("eid"),
        "left_semi",
    )
    return m.select(
        F.col("url").alias("src"),
        F.lit("MENTIONS").alias("predicate"),
        F.col("m.id").alias("dst"),
        F.lit(0.9).alias("confidence"),
        F.lit("metadata").alias("source"),
        F.lit(False).alias("flagged"),
        F.lit(False).alias("inferred"),
        F.map_from_arrays(
            F.array(F.lit("mention_text"), F.lit("extraction_method")),
            F.array(F.col("m.mention_text"), F.lit("metadata")),
        ).alias("props"),
    )


def sent_edges(emails: DataFrame, employees: DataFrame) -> DataFrame:
    """J4: emails metadata × employees-by-address (broadcast dimension) →
    SENT (employee → document) and SENT_TO (document → employee) edges; an
    unmatched address emits nothing (inner joins)."""
    emp = F.broadcast(employees.select(F.col("email"), F.col("id").alias("emp_id")))

    sent = emails.join(emp, emails["from_email"] == emp["email"]).select(
        F.col("emp_id").alias("src"),
        F.lit("SENT").alias("predicate"),
        F.col("url").alias("dst"),
        F.lit(1.0).alias("confidence"),
        F.lit("emails_metadata").alias("source"),
        F.lit(False).alias("flagged"),
        F.lit(False).alias("inferred"),
        F.map_from_arrays(
            F.array(F.lit("timestamp"), F.lit("subject")),
            F.array(F.col("ts"), F.col("subject")),
        ).alias("props"),
    )
    sent_to = emails.join(emp, emails["to_email"] == emp["email"]).select(
        F.col("url").alias("src"),
        F.lit("SENT_TO").alias("predicate"),
        F.col("emp_id").alias("dst"),
        F.lit(1.0).alias("confidence"),
        F.lit("emails_metadata").alias("source"),
        F.lit(False).alias("flagged"),
        F.lit(False).alias("inferred"),
        F.map_from_arrays(F.array(F.lit("timestamp")), F.array(F.col("ts"))).alias("props"),
    )
    return sent.unionByName(sent_to)


def shadow_mention_edges(shadow_nodes: DataFrame) -> DataFrame:
    """Flagged MENTIONS edge from the document that created each shadow
    entity (neo4j_loader.py:406-411); shadow_nodes carries the creating doc
    in its ``source`` column (operators/graph.shadow_entities)."""
    return shadow_nodes.select(
        F.col("source").alias("src"),
        F.lit("MENTIONS").alias("predicate"),
        F.col("id").alias("dst"),
        F.lit(0.4).alias("confidence"),
        F.lit("phase6_shadow").alias("source"),
        F.lit(True).alias("flagged"),
        F.lit(False).alias("inferred"),
        F.map_from_arrays(F.array(F.lit("mention_text")), F.array(F.col("name"))).alias("props"),
    )
