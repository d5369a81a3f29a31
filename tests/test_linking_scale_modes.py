"""Open-vocabulary linking: the size-guarded broadcast→shuffle fallback.

The gazetteer fixtures bound distinct mention norms by the dictionary, so
the norm-keyed side outputs (fuzzy scores, external entities) are always
broadcast-joined back onto the mention relation. The production path is
open-vocabulary NER over web text (entity_extractor.py:169-190), where
distinct unresolved surface forms grow with the corpus — broadcasting that
relation OOMs the driver at 100 TB. resolve_mentions therefore counts the
distinct unresolved norms (free — per_norm is already materialized) and
switches the join-backs to sort-merge joins above NORM_BROADCAST_LIMIT.

These tests run the SAME open-vocab corpus through both modes and assert
(a) the plan shapes actually differ as designed, and (b) the resolved
mention relation and external-node set are row-identical — the mode switch
is a pure physical-plan decision.
"""

from __future__ import annotations

import contextlib
import io

import pytest

from ai_knowledge_graph_builder_spark.operators.extraction import extract_documents
from ai_knowledge_graph_builder_spark.operators.linking import (
    build_alias_table,
    resolve_mentions,
)
from ai_knowledge_graph_builder_spark.operators.mentions import detect_mentions


def _plan(df) -> str:
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


@pytest.fixture(scope="module")
def open_vocab(spark, corpus):
    from ai_knowledge_graph_builder_spark.sources.corpus import open_vocab_pages

    pages = spark.createDataFrame(open_vocab_pages(n_docs=200, uniques_per_doc=12))
    docs = extract_documents(pages)
    # open-vocabulary mode: no gazetteer — the cap-run rules fire on the
    # unique TitleCase surface forms, exactly like a statistical NER would
    mentions_raw = detect_mentions(docs).persist()
    mentions_raw.count()
    aliases = spark.createDataFrame(corpus["registry"]).transform(build_alias_table).persist()
    yield mentions_raw, aliases
    mentions_raw.unpersist()
    aliases.unpersist()


def test_fixture_is_genuinely_open_vocabulary(spark, open_vocab):
    """Distinct unresolved norms must dwarf the alias table (≥10x) or the
    fixture isn't exercising the regime the guard exists for."""
    from pyspark.sql import functions as F

    mentions_raw, aliases = open_vocab
    n_alias = aliases.count()
    norms = mentions_raw.select(F.lower(F.trim("text")).alias("norm")).distinct()
    unresolved = norms.join(
        aliases.select(F.col("alias").alias("norm")), "norm", "left_anti"
    ).count()
    assert unresolved >= 10 * n_alias, (unresolved, n_alias)


def test_modes_have_the_designed_plan_shapes(open_vocab):
    mentions_raw, aliases = open_vocab
    resolved_b, _ = resolve_mentions(mentions_raw, aliases, broadcast_norm_limit=10**9)
    resolved_s, _ = resolve_mentions(mentions_raw, aliases, broadcast_norm_limit=0)
    pb, ps = _plan(resolved_b), _plan(resolved_s)
    # broadcast mode: norm join-backs broadcast; no shuffle join anywhere
    assert "BroadcastHashJoin" in pb and "SortMergeJoin" not in pb, pb
    # shuffle mode: the join-backs are sort-merge on norm (the exact-match
    # dictionary join stays broadcast — the alias table is always small)
    assert "SortMergeJoin" in ps, ps
    assert "BroadcastNestedLoopJoin" not in pb and "BroadcastNestedLoopJoin" not in ps


def test_modes_produce_identical_results(open_vocab):
    mentions_raw, aliases = open_vocab
    res_b, ext_b = resolve_mentions(mentions_raw, aliases, broadcast_norm_limit=10**9)
    res_s, ext_s = resolve_mentions(mentions_raw, aliases, broadcast_norm_limit=0)
    key = lambda r: tuple(str(v) for v in r)
    assert sorted(map(key, res_b.collect())) == sorted(map(key, res_s.collect()))
    assert sorted(map(key, ext_b.collect())) == sorted(map(key, ext_s.collect()))
    # sanity: all three cascade tiers are populated in this corpus
    methods = {r["resolution_method"] for r in res_b.select("resolution_method").distinct().collect()}
    assert methods == {"exact_match", "fuzzy_match", "external_entity"}, methods
