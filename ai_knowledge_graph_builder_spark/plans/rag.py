"""Retrieval layer — the reference's phase-9 RAG read path minus the LLM.

Reference flow (rag_system.py:170-296): embed the question, FAISS top-k over
triple embeddings (k=10) and chunk embeddings (k=15) with similarity ≥ 0.15
(config/pipeline.yaml:117-119), 1-hop graph context for ≤5 retrieved entity
ids (:531-567), then prompt an LLM. Here retrieval + context are DataFrame
ops over the materialized tables; the "answer" is the extractive top-triple
text (deterministic — no generation model in this environment; the LLM call
is a pluggable seam on top of ``retrieve``'s output).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, functions as F

from ..functions.embed import DIM, encode_texts
from ..operators.graph_queries import one_hop_context
from ..operators.similarity import cosine_topk_join

TRIPLE_K = 10  # config/pipeline.yaml:117
CHUNK_K = 15  # config/pipeline.yaml:118
MIN_SIMILARITY = 0.15  # config/pipeline.yaml:119
MIN_SOURCES = 1  # rag_system.py:55 (min_sources_threshold)
CONTRADICTION_PENALTY = 0.15  # rag_system.py:702 (capped at 0.3)
CSV_BOOST = 0.15  # rag_system.py:706 (capped at 0.30)

# U7: question words skipped by the person-name heuristic
# (rag_system.py:467-469)
_QUESTION_STOPWORDS = frozenset(
    ["who", "what", "is", "the", "does", "work", "in", "manager",
     "department", "role", "position", "s", "'s"]
)


def extract_person_name(query: str) -> str | None:
    """U7: capitalized-word person-name extraction from a question
    (rag_system.py:460-484): skip question stopwords, keep capitalized
    words with possessives stripped, return the first two (or one)."""
    name_words = []
    for word in query.split():
        if word.lower() in _QUESTION_STOPWORDS:
            continue
        if word and word[0].isupper():
            name_words.append(word.rstrip("'s"))
    if len(name_words) >= 2:
        return " ".join(name_words[:2])
    return name_words[0] if name_words else None


def detect_contradictions(triples: list[dict], chunks: list[dict]) -> list[dict]:
    """Contradiction scan over the retrieved items (rag_system.py:569-596):
    flagged triples (severity high) + chunks whose source document carries
    contradictions (severity medium)."""
    out = [
        {"type": "triple", "severity": "high", "source": t.get("source", "unknown")}
        for t in triples
        if t.get("flagged")
    ]
    out += [
        {"type": "chunk", "severity": "medium", "source": c.get("doc_filename", "unknown")}
        for c in chunks
        if c.get("has_contradictions")
    ]
    return out


def calculate_confidence(
    triples: list[dict], chunks: list[dict], contradictions: list[dict]
) -> float:
    """A7 full parity (rag_system.py:688-711): base = mean of the retrieved
    triples' stored confidences PLUS every retrieved item's similarity score;
    −0.15 per contradiction capped at 0.3; +0.15 per csv-sourced triple
    capped at 0.30; clamped to [0, 1], rounded to 3."""
    if not triples and not chunks:
        return 0.0
    triple_confidences = [t.get("confidence", 0.5) for t in triples]
    similarity_scores = [t.get("similarity_score", 0.5) for t in triples] + [
        c.get("similarity_score", 0.5) for c in chunks
    ]
    pool = triple_confidences + similarity_scores
    base = sum(pool) / len(pool) if pool else 0.5
    penalty = min(len(contradictions) * CONTRADICTION_PENALTY, 0.3)
    csv_count = sum(1 for t in triples if "csv" in str(t.get("source_file", t.get("source", ""))).lower())
    boost = min(csv_count * CSV_BOOST, 0.30)
    return max(0.0, min(1.0, round(base - penalty + boost, 3)))


def clean_answer(answer: str) -> str:
    """P11: answer cleanup (rag_system.py:674-686) — collapse blank lines,
    strip, capitalize the first character."""
    import re

    answer = re.sub(r"\n\s*\n+", "\n", answer).strip()
    if answer and answer[0].islower():
        answer = answer[0].upper() + answer[1:]
    return answer


class GraphRetriever:
    """Retrieval over the committed KG tables. All inputs are DataFrames;
    embeddings carry (item_id, kind, embedding) per operators/chunks.py."""

    def __init__(
        self,
        spark: SparkSession,
        triples: DataFrame,
        embeddings: DataFrame,
        nodes: DataFrame | None = None,
        edges: DataFrame | None = None,
        chunk_meta: DataFrame | None = None,
    ):
        self.spark = spark
        self.triples = triples
        self.triple_emb = embeddings.filter(F.col("kind") == "triple").persist()
        self.chunk_emb = embeddings.filter(F.col("kind") == "chunk").persist()
        self.nodes = nodes
        self.edges = edges
        # optional per-chunk document metadata (item_id, doc_filename,
        # has_contradictions) — feeds contradiction detection (J6 analog)
        self.chunk_meta = chunk_meta

    def _query_df(self, question: str) -> DataFrame:
        vec = encode_texts([question], DIM)[0].tolist()
        return self.spark.createDataFrame(
            pd.DataFrame({"query_id": ["q0"], "embedding": [vec]})
        )

    def retrieve(self, question: str, triple_k: int = TRIPLE_K, chunk_k: int = CHUNK_K,
                 min_sim: float = MIN_SIMILARITY) -> dict[str, DataFrame]:
        q = self._query_df(question)
        top_triples = cosine_topk_join(self.triple_emb, q, triple_k, min_score=min_sim)
        top_chunks = cosine_topk_join(self.chunk_emb, q, chunk_k, min_score=min_sim)

        # join retrieved triple keys back to the triple rows
        keyed = self.triples.withColumn(
            "item_id", F.concat_ws("|", "subject_id", "predicate", "object_id")
        )
        triple_hits = keyed.join(
            F.broadcast(top_triples.select("item_id", "score", "rank")), "item_id"
        ).orderBy("rank")

        out = {"triples": triple_hits, "chunks": top_chunks}
        if self.nodes is not None and self.edges is not None:
            # 1-hop context for the top ≤5 retrieved entity ids
            # (rag_system.py:539-548)
            ids = (
                triple_hits.orderBy("rank")
                .select(F.col("subject_id").alias("id"))
                .limit(5)
            )
            # U7: the question's extracted person name seeds the context too
            # (the reference's direct factual-lookup path, rag_system.py:
            # 460-484 → 323-341): CONTAINS-match against node names
            name = extract_person_name(question)
            if name:
                ids = ids.unionByName(
                    self.nodes.filter(F.col("name").contains(name)).select("id").limit(5)
                ).distinct()
            out["graph_context"] = one_hop_context(self.edges, self.nodes, ids)
        return out

    def answer(self, question: str, min_sources: int = MIN_SOURCES) -> dict:
        """Deterministic extractive answer: the best-ranked triple's natural
        text, scored with the reference confidence formula
        (rag_system.py:688-711) — mean of triple confidences + all similarity
        scores, contradiction penalty, csv-source boost — plus the
        min-sources sufficiency gate (rag_system.py:211-216, 255-257)."""
        r = self.retrieve(question)
        trows = [x.asDict() for x in r["triples"].collect()]
        for t in trows:
            t["similarity_score"] = t.get("score", 0.5)
        chunk_df = r["chunks"]
        if self.chunk_meta is not None:
            chunk_df = chunk_df.join(F.broadcast(self.chunk_meta), "item_id", "left")
        crows = [x.asDict() for x in chunk_df.collect()]
        for c in crows:
            c["similarity_score"] = c.get("score", 0.5)

        total_sources = len(trows) + len(crows)
        if total_sources == 0:
            # no-source response (rag_system.py:215-217)
            return {"answer": None, "confidence": 0.0, "sources": [],
                    "contradictions": [], "has_sufficient_sources": False}
        contradictions = detect_contradictions(trows, crows)
        conf = calculate_confidence(trows, crows, contradictions)
        best = min(trows, key=lambda t: t["rank"]) if trows else None
        return {
            "answer": clean_answer(best["text"]) if best else None,  # P11
            "confidence": conf,
            "sources": [(t["text"], round(t["similarity_score"], 4))
                        for t in sorted(trows, key=lambda t: t["rank"])[:3]],
            "contradictions": contradictions,
            "has_sufficient_sources": total_sources >= min_sources,
        }
