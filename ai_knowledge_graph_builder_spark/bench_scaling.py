"""Scaling-efficiency probe: the SAME KG-pipeline job at two parallelism
levels on the same (replicated) input — the sandbox stand-in for N vs 4N
executors (BASELINE.json north_rule).

The sf corpus is replicated deterministically (doc_id × replica suffix) so the
job is large enough that per-document work, not session/codegen overhead,
dominates; both runs use identical input and plan."""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from .driver_queries import (
    build_alias_table,
    cooccurrence_pairs,
    detect_mentions,
    flagship_gazetteer,
    flagship_registry_df,
    infer_edges,
    resolve_mentions,
)
from .operators.extraction import extract_documents
from .plans.pipeline import _empty_edges


def replicated_pages(spark, sf_dir: str, replicas: int):
    """documents × replicas → pages; html synthesized in the same
    mapInPandas pass that the pipeline will immediately consume."""
    from collections.abc import Iterator

    import pandas as pd

    from .functions.html import render_html

    # the base parquet is a single file (= one input split): repartition
    # BEFORE the explode so page synthesis parallelizes across all cores
    docs = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .select("doc_id", "text", "lang")
        .repartition(spark.sparkContext.defaultParallelism)
        .withColumn("rep", F.explode(F.sequence(F.lit(0), F.lit(replicas - 1))))
    )

    def _mk(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            urls = [f"doc://{d:08d}-{r:04d}" for d, r in zip(pdf["doc_id"], pdf["rep"])]
            htmls = [render_html(u, t) for u, t in zip(urls, pdf["text"])]
            yield pd.DataFrame({"url": urls, "html": htmls, "text": pdf["text"], "lang": pdf["lang"]})

    return docs.mapInPandas(_mk, "url string, html binary, text string, lang string")


def timed_kg_run(spark, sf_dir: str, replicas: int, work_dir: str | None = None) -> tuple[float, int]:
    """Time the PRODUCTION path: checkpointed stages materialized to parquet
    (plans/checkpoint.py), exactly what a cluster run does. Stage tables are
    written under ``work_dir`` (a fresh temp dir by default)."""
    import shutil
    import tempfile

    from .operators.graph import cooccurrence_pairs as _cooccur, infer_edges as _infer
    from .plans.checkpoint import run_stage

    wd = work_dir or tempfile.mkdtemp(prefix="kg-bench-")
    pages = replicated_pages(spark, sf_dir, replicas)
    registry = flagship_registry_df(spark)
    aliases = build_alias_table(registry)

    t0 = time.perf_counter()
    documents, _ = run_stage(
        spark, f"{wd}/documents", "documents", "bench",
        lambda: extract_documents(pages), key_col="url",
    )
    mentions_raw, _ = run_stage(
        spark, f"{wd}/mentions_raw", "mentions_raw", "bench",
        lambda: detect_mentions(documents, flagship_gazetteer()), key_col="url",
    )
    mentions, _ = run_stage(
        spark, f"{wd}/mentions", "mentions", "bench",
        lambda: resolve_mentions(mentions_raw, aliases)[0], key_col="url",
    )
    inferred, _ = run_stage(
        spark, f"{wd}/edges", "edges", "bench",
        lambda: _infer(_cooccur(mentions), _empty_edges(spark)), key_col="src",
    )
    inferred.count()
    elapsed = time.perf_counter() - t0

    base = spark.read.parquet(f"{sf_dir}/documents.parquet").count()
    if work_dir is None:
        shutil.rmtree(wd, ignore_errors=True)
    return elapsed, base * replicas
