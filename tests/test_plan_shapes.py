"""Physical-plan assertions for the headline queries — the properties the
100 TB design depends on, checked against `.explain` output so a regression
in plan shape (lost pushdown, lost pruning, a surprise cartesian) fails CI,
not just the benchmark.

These parse `explain("formatted")` / the executed-plan string, which is
stable for the asserted substrings (scan ReadSchema / PushedFilters,
join strategy node names) across Spark 3.4-4.x.
"""

from __future__ import annotations

import pytest

SF_DIR = "/root/testdata/sf0.001"


def plan_str(df) -> str:
    """Capture df.explain('formatted') as a string."""
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_flagship_scan_prunes_columns(spark):
    """The documents scan under the flagship reads ONLY (doc_id, text) —
    the two columns the fused synthesis+extraction+NER pass consumes (r7:
    lang dropped with the standalone pages stage). A scan shipping more
    columns into the opaque Arrow operator would drag the whole table
    across the memory bus at 100 TB."""
    from ai_knowledge_graph_builder_spark.driver_queries import kg_inferred_triples

    p = plan_str(kg_inferred_triples(spark, SF_DIR))
    scan = [ln for ln in p.splitlines() if "ReadSchema" in ln]
    assert scan, p
    for ln in scan:
        assert "title" not in ln and "embedding" not in ln and "lang" not in ln, ln
        # the projection is exactly the two columns the synthesis needs
        assert "doc_id" in ln and "text" in ln, ln


def test_flagship_no_cartesian_and_broadcast_linking(spark):
    """Alias/fuzzy/external joins must be broadcast (dictionary-sized dims);
    nothing in the flagship may plan a cartesian product."""
    from ai_knowledge_graph_builder_spark.driver_queries import kg_inferred_triples

    p = plan_str(kg_inferred_triples(spark, SF_DIR))
    assert "CartesianProduct" not in p, p
    assert "BroadcastHashJoin" in p and "BroadcastNestedLoopJoin" not in p, p
    # r7: the J7 anti-join against the empty edge set must be OPTIMIZED
    # AWAY (empty LocalRelation → PropagateEmptyRelation), not planned as
    # a real join — createDataFrame([], schema) regressing to an
    # RDD-backed empty relation re-plans a full SortMergeJoin with an
    # Exchange + Sort of the candidate side per orientation branch
    assert "SortMergeJoin" not in p and "LeftAnti" not in p, p


def test_filter_pushdown_reaches_parquet(spark):
    """A predicate on a scanned column must appear in PushedFilters — the
    free Catalyst win the engine is designed around."""
    from pyspark.sql import functions as F

    df = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter(F.col("o_orderstatus") == "F")
        .select("o_orderkey", "o_orderstatus")
    )
    p = plan_str(df)
    assert "PushedFilters" in p, p
    pushed = [ln for ln in p.splitlines() if "PushedFilters" in ln]
    assert any("o_orderstatus" in ln for ln in pushed), pushed


def test_topk_uses_takeordered_or_window(spark):
    """top_customers (T3 LIMIT shape) must not plan a global sort of the
    full relation followed by collect — TakeOrderedAndProject (or a
    window-ranked exchange) is the scale-safe form."""
    from ai_knowledge_graph_builder_spark.driver_queries import top_customers

    p = plan_str(top_customers(spark, SF_DIR))
    assert ("TakeOrderedAndProject" in p) or ("Window" in p), p


def test_cooccurrence_has_no_join(spark):
    """The rewritten A3 pair expansion is narrow (collect_set + explode):
    the mention relation must shuffle exactly twice (per-doc agg + pair agg)
    and plan NO join at all."""
    from pyspark.sql import functions as F

    from ai_knowledge_graph_builder_spark.operators.graph import cooccurrence_pairs

    m = spark.createDataFrame(
        [("u1", "e1", "canonical"), ("u1", "e2", "canonical"), ("u2", "e1", "canonical")],
        "url string, resolved_id string, resolution_type string",
    )
    df = cooccurrence_pairs(m)
    import re

    p = plan_str(df)
    assert "Join" not in p, p
    # count physical Exchange NODES (the "(n) Exchange" detail headers), not
    # every tree/Input line that mentions one
    n_exchanges = len(re.findall(r"^\(\d+\) Exchange", p, flags=re.M))
    assert n_exchanges <= 2, p


@pytest.mark.parametrize("qname", ["quality_score", "doc_fingerprint", "token_stats"])
def test_text_queries_stay_jvm_side(spark, qname):
    """The JVM-only text operators must not plan ANY Python evaluation node
    (whole-stage-codegen path; Python would be the 10-100x slow path)."""
    from ai_knowledge_graph_builder_spark.driver_queries import QUERIES

    p = plan_str(QUERIES[qname](spark, SF_DIR))
    assert "Python" not in p, p


def test_minhash_signatures_single_aggregation_no_seed_shuffle(spark):
    """The r5 minhash fusion: all k per-doc minhashes must come from ONE
    partial/final groupBy(id) — a plan that shuffles a (id, seed)- or
    (id, band)-keyed relation has regressed to the k-times-shuffle-volume
    long format, invisible at test scale and dominant at corpus scale."""
    from pyspark.sql import functions as F

    from ai_knowledge_graph_builder_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
        token_shingles,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        F.col("doc_id").cast("string").alias("doc_id"), "text"
    )
    sh = token_shingles(docs, "doc_id", "text")
    cand = lsh_candidate_pairs(minhash_signatures(sh, 16), 4, 4)
    p = plan_str(cand)
    # banding is projection-only: no exchange may partition by seed/band
    exchanges = [ln for ln in p.splitlines() if "Arguments: hashpartitioning" in ln]
    assert exchanges, p
    for ln in exchanges:
        assert "seed" not in ln, ln
    # the candidate join partitions on (band, band_sig); the only id-keyed
    # aggregation is the single signature groupBy — HashAggregate over id
    # appears as partial+final once, with no (id, seed) grouping anywhere
    assert "seed#" not in p, "seed column resurfaced — long format is back"


def test_ivf_fixed_codebook_assignment_is_projection_only(spark):
    """The r5 IVF rewrite: with a fixed codebook, the item→cell assignment
    must be a pure projection (literal-array dot argmax inside codegen) —
    no crossJoin of items×centroids and no per-item window sort. A plan
    with a nested-loop join or an items-side exchange before the cell
    column has regressed to the explode-×-n_cells shape, whose shuffle
    volume scales with n_cells at 10^9+ items."""
    from pyspark.sql import functions as F

    from ai_knowledge_graph_builder_spark.operators.similarity import ivf_topk_join

    # a prior test's persisted embeddings relation would swap the parquet
    # scans for InMemoryTableScans and break the scan-count assertion
    spark.catalog.clearCache()
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").select(
        F.col("vec_id").cast("string").alias("item_id"),
        F.col("embedding"),
    )
    centroids = [[1.0 if d % 16 == c else -1.0 for d in range(64)] for c in range(16)]
    queries = emb.limit(3).select(F.col("item_id").alias("query_id"), "embedding")
    out = ivf_topk_join(emb, queries, k=5, n_probe=4, centroids=centroids)
    p = plan_str(out)
    assert "CartesianProduct" not in p, p
    # the ONLY nested-loop join allowed is the broadcast of the tiny
    # query×centroid table; the items side must not appear under one
    nl = [ln for ln in p.splitlines() if "NestedLoop" in ln]
    for ln in nl:
        assert "Broadcast" in ln, ln
    # exactly two parquet scans in the whole plan: the items side (feeding
    # the assignment projection directly) and the limit-3 query side — a
    # third scan would mean the items relation is read again to pick cells
    import re

    scans = re.findall(r"^\(\d+\) Scan parquet", p, flags=re.M)
    assert len(scans) == 2, p


def test_repetition_stats_single_scan_zero_agg_projection(spark):
    """repetition_stats computes token AND bigram tops from ONE parquet
    scan as a PURE PROJECTION (sorted-array longest-run fold): no Join, no
    Generate/explode, no HashAggregate, and the only Exchange is the
    round-robin spread of the tiny single-split test scan — a regression
    to the explode → two-level-agg shape shuffles the whole gram relation
    (~2 rows per token), which at 100 TB is the entire query cost."""
    import re

    from ai_knowledge_graph_builder_spark.driver_queries import repetition_stats

    spark.catalog.clearCache()
    p = plan_str(repetition_stats(spark, SF_DIR))
    assert len(re.findall(r"^\(\d+\) Scan parquet", p, flags=re.M)) == 1, p
    assert "Join" not in p, p
    assert "Generate" not in p, p
    assert "HashAggregate" not in p, p
    exchanges = re.findall(r"^\(\d+\) Exchange", p, flags=re.M)
    assert len(exchanges) <= 1, p
    if exchanges:
        assert "RoundRobinPartitioning" in p, p


def test_media_verbs_shuffle_free_and_blob_never_shuffled(spark):
    """The multimodal verb chains (synthesize → decode/sample/resize/
    feature-extract → project) are pure mapInPandas pipelines: no Exchange
    anywhere (a shuffle would move the binary payload across the cluster —
    the one thing the 100 TB design forbids for blob columns), no join, and
    the frame fan-out happens inside the Arrow worker, not via explode."""
    from ai_knowledge_graph_builder_spark.driver_queries import (
        media_features,
        media_frames,
        media_resize,
    )

    spark.catalog.clearCache()
    for fn in (media_frames, media_resize, media_features):
        p = plan_str(fn(spark, SF_DIR))
        assert "Exchange" not in p, (fn.__name__, p)
        assert "Join" not in p, (fn.__name__, p)


def test_dedup_release_unpersists_shingles(spark):
    """dedup.release(result) must unpersist the shingle relation the
    operator cached for its own multi-consumption (ADVICE r5 #4) — the
    session's cached-relation count returns to its prior level."""
    from pyspark.sql import functions as F

    from ai_knowledge_graph_builder_spark.operators import dedup

    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    docs = (
        spark.read.parquet(f"{SF_DIR}/documents.parquet")
        .limit(40)
        .select(F.col("doc_id").cast("string").alias("doc_id"), "text")
    )
    pairs = dedup.minhash_dedup_pairs(docs, "doc_id", "text", tau=0.5)
    pairs.count()  # materialize (populates the persisted shingles)
    assert jsc.getPersistentRDDs().size() > before
    dedup.release(pairs)
    assert jsc.getPersistentRDDs().size() == before
