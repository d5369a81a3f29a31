"""U2/U3: chunking + embedding operators vs pure-kernel oracle."""

from __future__ import annotations

import numpy as np
from pyspark.sql import functions as F

from ai_knowledge_graph_builder_spark.functions.chunking import chunk_text
from ai_knowledge_graph_builder_spark.functions.embed import encode_texts
from ai_knowledge_graph_builder_spark.operators.chunks import chunk_documents, embed_chunks


def test_chunk_kernel_reference_semantics():
    # <= chunk_size: one chunk, ORIGINAL text (newlines preserved)
    text = "a b\nc d"
    [c] = chunk_text(text, chunk_size=10, overlap=2)
    assert c.text == text and c.start_word == 0 and c.end_word == 4
    # sliding windows, stride size-overlap, final window emitted once
    words = [f"w{i}" for i in range(25)]
    chunks = chunk_text(" ".join(words), chunk_size=10, overlap=2)
    assert [(c.start_word, c.end_word) for c in chunks] == [(0, 10), (8, 18), (16, 25)]
    assert chunks[-1].text == " ".join(words[16:25])


def test_chunk_documents_matches_kernel(spark, corpus):
    from ai_knowledge_graph_builder_spark.operators.extraction import extract_documents

    pages = spark.createDataFrame(corpus["pages"])
    docs = extract_documents(pages)
    got = {
        (r["url"], r["chunk_index"], r["start_word"], r["end_word"], r["text"])
        for r in chunk_documents(docs, chunk_size=60, overlap=15).collect()
    }
    want = set()
    for row in corpus["pages"].itertuples(index=False):
        for c in chunk_text(row.text, chunk_size=60, overlap=15):
            want.add((row.url, c.chunk_index, c.start_word, c.end_word, c.text))
    assert got == want


def test_embed_chunks_deterministic_and_normalized(spark, corpus):
    from ai_knowledge_graph_builder_spark.operators.extraction import extract_documents

    pages = spark.createDataFrame(corpus["pages"][:10])
    chunks = chunk_documents(extract_documents(pages))
    rows = embed_chunks(chunks).collect()
    assert rows and all(len(r["embedding"]) == 384 for r in rows)
    by_id = {r["item_id"]: np.array(r["embedding"], dtype=np.float32) for r in rows}
    for v in by_id.values():
        assert abs(float(np.linalg.norm(v)) - 1.0) < 1e-3
    # spot-check equality with the pure kernel
    chunk_rows = chunks.collect()
    texts = {f"{r['url']}_chunk_{r['chunk_index']:04d}": r["text"] for r in chunk_rows}
    some_id = sorted(by_id)[0]
    kernel = encode_texts([texts[some_id]], 384)[0]
    assert np.allclose(by_id[some_id], kernel, atol=1e-5)


def test_chunk_boundaries_query_matches_kernel():
    """The chunk_boundaries driver query computes (chunk_index, start_word,
    end_word, word_count) with JVM arithmetic instead of running chunk_text
    per document (r7: the Arrow round trip of the text payload cost more
    than the whole query) — this pins that formula to the REAL kernel for
    every word count from empty through many full windows."""
    import math

    from ai_knowledge_graph_builder_spark.functions.chunking import chunk_text

    size, overlap, stride = 40, 10, 30
    for n in range(0, 301):
        text = " ".join(f"w{i}" for i in range(n))
        want = [
            (c.chunk_index, c.start_word, c.end_word, c.word_count)
            for c in chunk_text(text, chunk_size=size, overlap=overlap)
        ]
        n_chunks = 1 if n <= size else math.ceil((n - size) / stride) + 1
        got = [
            (ci, ci * stride, min(ci * stride + size, n), min(ci * stride + size, n) - ci * stride)
            for ci in range(n_chunks)
        ]
        assert got == want, (n, got[:3], want[:3])
