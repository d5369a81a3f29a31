"""Document chunking — exact reference semantics (embedding_generator.py:208-266).

Rules (chunk_size=500, overlap=100 ⇒ stride 400; config/pipeline.yaml:86-87):
- words = Python ``text.split()`` (whitespace runs; SURVEY.md §7.4 risk 4)
- if len(words) <= chunk_size: ONE chunk whose text is the ORIGINAL text
  (newlines preserved — embedding_generator.py:216-232)
- else sliding windows [start, start+size), text = " ".join(words),
  advancing by (size - overlap); loop breaks when a window reaches the end
  (embedding_generator.py:262-265), so the final partial window is emitted
  once and never duplicated.
"""

from __future__ import annotations

from typing import NamedTuple

CHUNK_SIZE = 500
CHUNK_OVERLAP = 100


class Chunk(NamedTuple):
    chunk_index: int
    start_word: int
    end_word: int
    text: str
    word_count: int


def chunk_text(text: str, chunk_size: int = CHUNK_SIZE, overlap: int = CHUNK_OVERLAP) -> list[Chunk]:
    words = text.split()
    if len(words) <= chunk_size:
        return [Chunk(0, 0, len(words), text, len(words))]
    out: list[Chunk] = []
    chunk_index = 0
    start = 0
    n = len(words)
    while start < n:
        end = min(start + chunk_size, n)
        cw = words[start:end]
        out.append(Chunk(chunk_index, start, end, " ".join(cw), len(cw)))
        if end == n:
            break
        start += chunk_size - overlap
        chunk_index += 1
    return out


def chunk_id(url: str, chunk_index: int) -> str:
    """Reference id format ``{doc_id}_chunk_{index:04d}``
    (embedding_generator.py:219)."""
    return f"{url}_chunk_{chunk_index:04d}"
