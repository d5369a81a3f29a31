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
    ):
        self.spark = spark
        self.triples = triples
        self.triple_emb = embeddings.filter(F.col("kind") == "triple").persist()
        self.chunk_emb = embeddings.filter(F.col("kind") == "chunk").persist()
        self.nodes = nodes
        self.edges = edges

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

    def answer(self, question: str) -> dict:
        """Deterministic extractive answer: the best-ranked triple's natural
        text + mean similarity confidence (rag_system.py:688-711 analog
        without the LLM term)."""
        r = self.retrieve(question)
        rows = r["triples"].limit(3).collect()
        if not rows:
            return {"answer": None, "confidence": 0.0, "sources": []}
        conf = sum(x["score"] for x in rows) / len(rows)
        return {
            "answer": clean_answer(rows[0]["text"]),  # P11 cleanup
            "confidence": round(min(max(conf, 0.0), 1.0), 4),
            "sources": [(x["text"], round(x["score"], 4)) for x in rows],
        }
