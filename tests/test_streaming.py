"""Streaming ingestion: incremental file batches produce exactly the batch
pipeline's mentions; restarts don't re-ingest processed files."""

from __future__ import annotations

from ai_knowledge_graph_builder_spark.operators.extraction import extract_documents
from ai_knowledge_graph_builder_spark.operators.linking import build_alias_table, resolve_mentions
from ai_knowledge_graph_builder_spark.operators.mentions import detect_mentions
from ai_knowledge_graph_builder_spark.streaming.ingest import stream_mentions


def _mention_key(r):
    return (r["url"], r["mention_idx"], r["text"], r["resolved_id"], r["resolution_method"])


def test_incremental_stream_matches_batch(spark, corpus, tmp_path):
    # increments must arrive in event-time order: the watermark advanced by
    # batch 1 DROPS older pages as late data (observed:
    # numRowsDroppedByWatermark) — which is the intended re-crawl semantics
    pages_pd = corpus["pages"].sort_values("warc_ts").reset_index(drop=True)
    registry = spark.createDataFrame(corpus["registry"])
    in_dir, out_dir, ck = str(tmp_path / "in"), str(tmp_path / "out"), str(tmp_path / "ck")

    half = len(pages_pd) // 2
    spark.createDataFrame(pages_pd.iloc[:half]).coalesce(1).write.mode("append").parquet(in_dir)

    q = stream_mentions(spark, in_dir, out_dir, ck, registry)
    q.awaitTermination(120)
    n1 = spark.read.parquet(out_dir).count()
    assert n1 > 0

    # second increment lands; resumed stream processes ONLY the new files
    spark.createDataFrame(pages_pd.iloc[half:]).coalesce(1).write.mode("append").parquet(in_dir)
    q2 = stream_mentions(spark, in_dir, out_dir, ck, registry)
    q2.awaitTermination(120)

    got = {_mention_key(r) for r in spark.read.parquet(out_dir).collect()}
    assert len(got) > n1

    # batch reference over the full corpus
    docs = extract_documents(spark.createDataFrame(pages_pd))
    raw = detect_mentions(docs, None).persist()
    raw.count()
    batch_mentions, _ = resolve_mentions(raw, build_alias_table(registry))
    want = {_mention_key(r) for r in batch_mentions.collect()}
    # exact/fuzzy resolutions are per-document → identical incrementally.
    # A1 external entities are frequency-gated per BATCH, so external rows
    # may differ between one-shot and split ingestion; compare canonical.
    got_canon = {k for k in got if k[4] in ("exact_match", "fuzzy_match")}
    want_canon = {k for k in want if k[4] in ("exact_match", "fuzzy_match")}
    assert got_canon == want_canon

    # restart with no new files → nothing re-ingested
    q3 = stream_mentions(spark, in_dir, out_dir, ck, registry)
    q3.awaitTermination(120)
    assert spark.read.parquet(out_dir).count() == len(got)
