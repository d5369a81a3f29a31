"""Multimodal columns: opaque binary payloads + typed metadata, with the
Spark-side plumbing (schema, partitioning, Arrow batch shape) real and the
codec layer stubbed.

A 100 TB training-data pipeline carries images/audio/video as `binary`
columns beside their metadata. The real decoders (PIL/ffmpeg/torchaudio) are
not in this container, so the codec boundary is a narrow, swappable function
table: each stub parses only the deterministic KGB1 container header written
by ``encode_payload`` and raises ``NotImplementedError`` for real media —
making the seam to production decoders explicit while everything around it
(mapInPandas batching, metadata structs, frame-sample fan-out, filter
pushdown on typed metadata) is genuinely exercised.

KGB1 container (synthetic fixture format):
  bytes 0-3   magic b"KGB1"
  byte  4     modality: 0=image, 1=audio, 2=video
  bytes 5-8   width / sample-rate / width      (uint32 BE)
  bytes 9-12  height / n-samples / height      (uint32 BE)
  bytes 13-16 channels / channels / n-frames   (uint32 BE)
  bytes 17+   payload (deterministic pseudo-random content bytes)
"""

from __future__ import annotations

import hashlib
import struct
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

MAGIC = b"KGB1"
MODALITIES = ("image", "audio", "video")


def encode_payload(modality: str, a: int, b: int, c: int, seed: str) -> bytes:
    """Deterministic synthetic media blob (fixture generator)."""
    m = MODALITIES.index(modality)
    body = hashlib.sha256(f"{modality}:{a}:{b}:{c}:{seed}".encode()).digest() * 4
    return MAGIC + struct.pack(">BIII", m, a, b, c) + body


def _parse_header(blob: bytes) -> tuple[str, int, int, int]:
    if blob[:4] != MAGIC:
        raise NotImplementedError(
            "real media decoding (PIL/ffmpeg) is not available in this "
            "environment — only KGB1 fixture blobs are decodable; swap this "
            "function for the production codec"
        )
    m, a, b, c = struct.unpack(">BIII", blob[4:17])
    return MODALITIES[m], a, b, c


MEDIA_META_SCHEMA = (
    "item_id string, modality string, dim_a int, dim_b int, dim_c int, "
    "n_bytes long, content_digest string"
)


def extract_media_metadata(media: DataFrame, id_col: str = "item_id", blob_col: str = "payload") -> DataFrame:
    """binary → typed metadata struct (decode-header stage of an ingest
    pipeline). Runs as one Arrow-batched pass; only metadata leaves the
    worker — the blob is never shuffled."""
    src = media.select(F.col(id_col).alias("item_id"), F.col(blob_col).alias("payload"))

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = {k: [] for k in ("item_id", "modality", "dim_a", "dim_b", "dim_c", "n_bytes", "content_digest")}
            for item_id, blob in zip(pdf["item_id"], pdf["payload"]):
                modality, a, b, c = _parse_header(bytes(blob))
                rows["item_id"].append(item_id)
                rows["modality"].append(modality)
                rows["dim_a"].append(a)
                rows["dim_b"].append(b)
                rows["dim_c"].append(c)
                rows["n_bytes"].append(len(blob))
                rows["content_digest"].append(hashlib.md5(bytes(blob)).hexdigest())
            yield pd.DataFrame(rows)

    return src.mapInPandas(_meta, MEDIA_META_SCHEMA)


def sample_video_frames(media: DataFrame, every_n: int = 2, id_col: str = "item_id", blob_col: str = "payload") -> DataFrame:
    """Frame-sampling fan-out: one row per sampled frame with a
    deterministic frame digest (stand-in for the decoded tensor). Real
    decoders plug into ``_frame_bytes``."""
    src = media.select(F.col(id_col).alias("item_id"), F.col(blob_col).alias("payload"))

    def _frame_bytes(blob: bytes, frame_idx: int) -> bytes:
        # production: ffmpeg seek+decode; fixture: slice of the body keyed
        # by frame index
        body = blob[17:]
        return hashlib.sha256(body + struct.pack(">I", frame_idx)).digest()

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, idxs, digests = [], [], []
            for item_id, blob in zip(pdf["item_id"], pdf["payload"]):
                blob = bytes(blob)
                modality, _a, _b, n_frames = _parse_header(blob)
                if modality != "video":
                    continue
                for fi in range(0, n_frames, every_n):
                    ids.append(item_id)
                    idxs.append(fi)
                    digests.append(_frame_bytes(blob, fi).hex()[:16])
            yield pd.DataFrame({"item_id": ids, "frame_idx": pd.array(idxs, dtype="int32"),
                                "frame_digest": digests})

    return src.mapInPandas(_sample, "item_id string, frame_idx int, frame_digest string")


def synth_media_df(spark, n: int = 60, seed: str = "kg") -> DataFrame:
    """Deterministic fixture table of mixed-modality blobs."""
    rows = []
    for i in range(n):
        modality = MODALITIES[i % 3]
        a, b, c = 64 + (i % 5) * 32, 48 + (i % 7) * 16, 4 + i % 9
        rows.append(
            {"item_id": f"m{i:04d}", "modality_true": modality,
             "payload": encode_payload(modality, a, b, c, seed)}
        )
    return spark.createDataFrame(pd.DataFrame(rows))


def resize_images(
    media: DataFrame,
    width: int,
    height: int,
    id_col: str = "item_id",
    blob_col: str = "payload",
) -> DataFrame:
    """Image resize stage: binary → binary at the target dimensions, one
    Arrow-batched pass, blob never shuffled. The fixture 'codec' re-encodes
    the KGB1 header with the target dims and derives the body
    deterministically from (source body, target dims); the production
    decoder (PIL ``Image.resize`` / cv2) plugs into ``_resize_bytes``.
    Non-image rows are dropped (the stage is modality-typed upstream)."""
    src = media.select(F.col(id_col).alias("item_id"), F.col(blob_col).alias("payload"))

    def _resize_bytes(blob: bytes) -> bytes | None:
        modality, _a, _b, channels = _parse_header(blob)
        if modality != "image":
            return None
        body = hashlib.sha256(blob[17:] + struct.pack(">II", width, height)).digest() * 4
        return MAGIC + struct.pack(">BIII", 0, width, height, channels) + body

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, blobs = [], []
            for item_id, blob in zip(pdf["item_id"], pdf["payload"]):
                out = _resize_bytes(bytes(blob))
                if out is not None:
                    ids.append(item_id)
                    blobs.append(out)
            yield pd.DataFrame({"item_id": ids, "payload": blobs})

    return src.mapInPandas(_resize, "item_id string, payload binary")


def extract_media_features(
    media: DataFrame,
    dim: int = 64,
    id_col: str = "item_id",
    blob_col: str = "payload",
) -> DataFrame:
    """Feature-extraction stage: binary → fixed-dim float vector (the
    embedding-model seam — CLIP/wav2vec/VideoMAE plug in here). The fixture
    features are the pinned ±1 md5 direction of the blob's content digest
    (functions/embed kernel), so downstream similarity/dedup operators
    consume the column exactly as they would a real encoder's output."""
    from ..functions.embed import _token_vector

    src = media.select(F.col(id_col).alias("item_id"), F.col(blob_col).alias("payload"))

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            ids, vecs = [], []
            for item_id, blob in zip(pdf["item_id"], pdf["payload"]):
                blob = bytes(blob)
                _parse_header(blob)  # codec seam: foreign blobs raise here
                digest = hashlib.md5(blob).hexdigest()
                ids.append(item_id)
                vecs.append([float(x) for x in _token_vector(digest, dim)])
            yield pd.DataFrame({"item_id": ids, "embedding": vecs})

    return src.mapInPandas(_feat, "item_id string, embedding array<double>")
