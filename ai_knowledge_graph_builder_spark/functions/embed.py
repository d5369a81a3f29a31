"""Sentence-embedding kernel: pinned deterministic stub + gated real model.

The reference embeds triple texts and chunks with SentenceTransformers
all-MiniLM-L6-v2 (384-d) and L2-normalizes for cosine/IndexFlatIP
(embedding_generator.py:287-331). sentence-transformers is not available in
this environment, so the default encoder is a deterministic hashed
bag-of-words projection: each token maps to a fixed pseudo-random ±1 vector
derived from its md5 digest; a text's embedding is the L2-normalized token
sum. It is machine-independent (no numpy RNG state), order-insensitive like
a BoW, and preserves enough token overlap structure to exercise every
downstream operator (top-k, LSH banding, clustering) with testable recall.

``try_sentence_transformer`` returns the real model's encode when installed.
"""

from __future__ import annotations

import hashlib

import numpy as np

DIM = 384  # all-MiniLM-L6-v2 dimension (config/pipeline.yaml:81)


def _token_vector(token: str, dim: int) -> np.ndarray:
    # md5 → bytes → ±1 per bit, tiled to dim. Pure function of the token.
    need = (dim + 7) // 8
    buf = b""
    salt = 0
    while len(buf) < need:
        buf += hashlib.md5(f"{salt}\x00{token}".encode("utf-8")).digest()
        salt += 1
    bits = np.unpackbits(np.frombuffer(buf[:need], dtype=np.uint8))[:dim]
    return bits.astype(np.float32) * 2.0 - 1.0


def token_sum_vectors(texts: list[str], dim: int = DIM) -> np.ndarray:
    """(n, dim) float32 raw hashed-BoW token sums (no normalization). The
    values are exact small integers, so cosine over these vectors is
    bit-reproducible across engines — the property the driver-oracle
    chunk-retrieval query relies on; cosine is scale-invariant, so ranking
    is identical to the normalized ``encode_texts`` output."""
    out = np.zeros((len(texts), dim), dtype=np.float32)
    cache: dict[str, np.ndarray] = {}
    for i, t in enumerate(texts):
        acc = out[i]
        for tok in t.lower().split():
            v = cache.get(tok)
            if v is None:
                v = _token_vector(tok, dim)
                cache[tok] = v
            acc += v
    return out


def encode_texts(texts: list[str], dim: int = DIM) -> np.ndarray:
    """(n, dim) float32, L2-normalized rows (embedding_generator.py:315-316)."""
    return l2_normalize(token_sum_vectors(texts, dim))


def l2_normalize(mat: np.ndarray) -> np.ndarray:
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0.0] = 1.0
    return (mat / norms).astype(np.float32)


def try_sentence_transformer(model: str = "all-MiniLM-L6-v2"):
    """Gated real-model encoder (reference parity when installed)."""
    try:  # pragma: no cover - library absent in this environment
        from sentence_transformers import SentenceTransformer

        m = SentenceTransformer(model)

        def encode(texts: list[str], dim: int = DIM) -> np.ndarray:
            emb = m.encode(texts, convert_to_numpy=True).astype(np.float32)
            return l2_normalize(emb)

        return encode
    except Exception:
        return None
