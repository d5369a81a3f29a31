"""U1: NER mention detection as an Arrow-vectorized flat-map.

Reference: driver loop ``nlp(text)`` per document, keeping spans labelled
PERSON/ORG/PRODUCT/GPE/LAW (entity_extractor.py:154-194). Here: one
``mapInPandas`` over documents; the detector (RuleNER, or spaCy when
installed) is constructed once per Python worker and reused across Arrow
batches — the per-executor model-singleton pattern (SURVEY.md §7.4 risk 5).

Long pages are NOT chunked before NER here because the rule detector is
O(len); a spaCy-backed detector would wrap itself with
``functions.chunking.chunk_text`` and offset-shift the spans (north rule
"chunked mention detection").
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions.ner import NER_LABELS, RuleNER

MENTION_SCHEMA = (
    "url string, doc_type string, mention_idx int, text string, "
    "label string, start int, end int"
)

# per-worker detector cache: (id of gazetteer tuple) → detector
_DETECTOR_CACHE: dict = {}


def _get_detector(gazetteer: tuple[tuple[str, str], ...] | None):
    det = _DETECTOR_CACHE.get(gazetteer)
    if det is None:
        det = RuleNER(list(gazetteer) if gazetteer else None)
        _DETECTOR_CACHE[gazetteer] = det
    return det


def detect_mentions(
    documents: DataFrame,
    gazetteer: list[tuple[str, str]] | None = None,
) -> DataFrame:
    """documents → mentions_raw (MENTIONS_RAW schema). Applies the
    word_count > 0 filter (P1 — entity_extractor.py:161) and the NER label
    filter (P2 — entity_extractor.py:176)."""
    gaz = tuple(gazetteer) if gazetteer else None
    src = documents.filter(F.col("word_count") > 0).select("url", "doc_type", "extracted_text")

    def _detect(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        detector = _get_detector(gaz)
        for pdf in batches:
            urls, dts, idxs, texts, labels, starts, ends = [], [], [], [], [], [], []
            for url, doc_type, text in zip(pdf["url"], pdf["doc_type"], pdf["extracted_text"]):
                for mi, m in enumerate(detector(text)):
                    if m.label not in NER_LABELS:
                        continue
                    urls.append(url)
                    dts.append(doc_type)
                    idxs.append(mi)
                    texts.append(m.text)
                    labels.append(m.label)
                    starts.append(m.start)
                    ends.append(m.end)
            yield pd.DataFrame(
                {
                    "url": pd.array(urls, dtype="string"),
                    "doc_type": pd.array(dts, dtype="string"),
                    "mention_idx": pd.array(idxs, dtype="int32"),
                    "text": pd.array(texts, dtype="string"),
                    "label": pd.array(labels, dtype="string"),
                    "start": pd.array(starts, dtype="int32"),
                    "end": pd.array(ends, dtype="int32"),
                }
            )

    return src.mapInPandas(_detect, MENTION_SCHEMA)


def extract_and_detect(
    pages: DataFrame,
    gazetteer: list[tuple[str, str]] | None = None,
    presalted: bool = False,
) -> DataFrame:
    """Fused S3-S5 + U1: pages(url, html) → mentions_raw in ONE Arrow pass.

    Semantics are exactly ``extract_documents → detect_mentions`` (pytest
    asserts set equality), but the heavy payload crosses the JVM↔Python
    boundary ONCE: the unfused chain ships html into Python, the extracted
    text back to the JVM, then the same text into Python again — 3× the
    byte traffic on the memory bus, which is the binding constraint of the
    scaling criterion (BENCH.md control probes). Use the unfused pair when
    the documents table must materialize (checkpointed stage runs); use this
    when mentions are the only consumer (streaming micro-batches, slice
    benchmarks, single-shot jobs)."""
    from ..functions.html import extract_text

    gaz = tuple(gazetteer) if gazetteer else None
    src = pages.select("url", "html")
    if not presalted:
        n = 4 * src.sparkSession.sparkContext.defaultParallelism
        src = src.repartition(n, F.pmod(F.xxhash64("url"), F.lit(n)))

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        detector = _get_detector(gaz)
        for pdf in batches:
            urls, dts, idxs, texts, labels, starts, ends = [], [], [], [], [], [], []
            for url, html in zip(pdf["url"], pdf["html"]):
                text = extract_text(html)
                if len(text.split()) <= 0:  # P1 wc>0 filter
                    continue
                for mi, m in enumerate(detector(text)):
                    if m.label not in NER_LABELS:
                        continue
                    urls.append(url)
                    dts.append(None)
                    idxs.append(mi)
                    texts.append(m.text)
                    labels.append(m.label)
                    starts.append(m.start)
                    ends.append(m.end)
            yield pd.DataFrame(
                {
                    "url": pd.array(urls, dtype="string"),
                    "doc_type": pd.array(dts, dtype="string"),
                    "mention_idx": pd.array(idxs, dtype="int32"),
                    "text": pd.array(texts, dtype="string"),
                    "label": pd.array(labels, dtype="string"),
                    "start": pd.array(starts, dtype="int32"),
                    "end": pd.array(ends, dtype="int32"),
                }
            )

    return src.mapInPandas(_run, MENTION_SCHEMA)


def synthesize_extract_and_detect(
    docs: DataFrame,
    gazetteer: list[tuple[str, str]] | None = None,
    presalted: bool = False,
) -> DataFrame:
    """Fused corpus synthesis + S3-S5 + U1: documents(doc_id, text) →
    mentions_raw in ONE Arrow pass.

    Semantics are exactly ``load_pages → extract_and_detect`` (pytest
    asserts set equality): url = doc://%08d, html = render_html("doc %d",
    text), text' = extract_text(html), then the P1 wc>0 filter and NER.
    The round-6 flagship ran the synthesis and the extraction as TWO
    mapInPandas nodes in the same stage, so the rendered html payload —
    the widest column in the pipeline — crossed Python→JVM→Python between
    them for no reason; here it is born and consumed inside one Python
    worker pass and the only boundary traffic is (doc_id, text) in and the
    mention rows out. Use ``load_pages`` + ``extract_and_detect`` when the
    pages relation itself must materialize."""
    from ..functions.html import extract_text, render_html

    gaz = tuple(gazetteer) if gazetteer else None
    src = docs.select("doc_id", "text")
    if not presalted:
        n = 4 * src.sparkSession.sparkContext.defaultParallelism
        src = src.repartition(n, F.pmod(F.xxhash64("doc_id"), F.lit(n)))

    def _run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        detector = _get_detector(gaz)
        for pdf in batches:
            urls, dts, idxs, texts, labels, starts, ends = [], [], [], [], [], [], []
            for doc_id, doc_text in zip(pdf["doc_id"], pdf["text"]):
                i = int(doc_id)
                text = extract_text(render_html(f"doc {i}", doc_text))
                if len(text.split()) <= 0:  # P1 wc>0 filter
                    continue
                url = f"doc://{i:08d}"
                for mi, m in enumerate(detector(text)):
                    if m.label not in NER_LABELS:
                        continue
                    urls.append(url)
                    dts.append(None)
                    idxs.append(mi)
                    texts.append(m.text)
                    labels.append(m.label)
                    starts.append(m.start)
                    ends.append(m.end)
            yield pd.DataFrame(
                {
                    "url": pd.array(urls, dtype="string"),
                    "doc_type": pd.array(dts, dtype="string"),
                    "mention_idx": pd.array(idxs, dtype="int32"),
                    "text": pd.array(texts, dtype="string"),
                    "label": pd.array(labels, dtype="string"),
                    "start": pd.array(starts, dtype="int32"),
                    "end": pd.array(ends, dtype="int32"),
                }
            )

    return src.mapInPandas(_run, MENTION_SCHEMA)
