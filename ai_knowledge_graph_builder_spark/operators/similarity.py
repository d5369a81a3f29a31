"""J11/T3 + the north rule's LSH-banded cosine join.

- ``cosine_topk_join``: exact brute-force top-k against a set of query
  vectors (FAISS IndexFlatIP analog, rag_system.py:486-517) — correct at any
  k, O(n·q); the baseline and the verifier for the LSH path.
- ``lsh_cosine_join``: banded random-hyperplane signatures → self-join on
  (band, signature) → exact cosine verification ≥ τ. The hyperplanes are
  ±1 vectors derived from md5 (machine/RNG-independent); candidate
  generation is a pure equi-join so Catalyst/AQE handle skew and the
  verify step only touches candidate pairs. This is SURVEY.md §7.3(a):
  Spark ML has no cosine LSH (BucketedRandomProjectionLSH is Euclidean,
  MinHashLSH is Jaccard), so it is hand-rolled from DataFrame primitives.

Scale: signatures are b rows per item (b≈8-32); the join key (band, sig)
has ~2^r distinct values per band — choose r so buckets stay bounded
(default r=8 ⇒ 256 buckets/band; raise r when n grows so buckets stay bounded). Exact verification is a pandas-UDF numpy dot
over Arrow batches.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..functions.embed import _token_vector


def _planes(n_planes: int, dim: int) -> np.ndarray:
    """Deterministic ±1 hyperplanes from the md5 token-vector kernel."""
    return np.stack([_token_vector(f"lsh-plane:{i}", dim) for i in range(n_planes)])


def lsh_signatures(
    items: DataFrame,
    id_col: str = "item_id",
    vec_col: str = "embedding",
    bands: int = 16,
    rows_per_band: int = 8,
    dim: int | None = None,
) -> DataFrame:
    """(id, vec) → (id, band, sig): one packed-int signature per band."""
    n_planes = bands * rows_per_band

    def _sig(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        planes = None
        for pdf in batches:
            if len(pdf) == 0:
                continue
            mat = np.array(list(pdf[vec_col]), dtype=np.float32)
            if planes is None:
                planes = _planes(n_planes, mat.shape[1]).astype(np.float32)
            bits = (mat @ planes.T) > 0  # (n, planes)
            weights = (1 << np.arange(rows_per_band, dtype=np.int64))
            ids, bnds, sigs = [], [], []
            for b in range(bands):
                seg = bits[:, b * rows_per_band : (b + 1) * rows_per_band]
                packed = seg @ weights
                ids.extend(pdf[id_col])
                bnds.extend([b] * len(pdf))
                sigs.extend(packed.tolist())
            yield pd.DataFrame({"item_id": ids, "band": bnds, "sig": sigs})

    return items.select(F.col(id_col).alias(id_col), vec_col).mapInPandas(
        _sig, f"{id_col} string, band int, sig long"
    )


def _cosine_pairs_udf(left_vec: str, right_vec: str):
    def f(a: pd.Series, b: pd.Series) -> pd.Series:
        ma = np.array(list(a), dtype=np.float64)
        mb = np.array(list(b), dtype=np.float64)
        dots = np.einsum("ij,ij->i", ma, mb)
        na = np.linalg.norm(ma, axis=1)
        nb = np.linalg.norm(mb, axis=1)
        denom = na * nb
        denom[denom == 0.0] = 1.0
        return pd.Series(dots / denom)

    return F.pandas_udf(f, "double")(F.col(left_vec), F.col(right_vec))


def lsh_cosine_join(
    items: DataFrame,
    tau: float,
    id_col: str = "item_id",
    vec_col: str = "embedding",
    bands: int = 16,
    rows_per_band: int = 8,
) -> DataFrame:
    """All pairs (a, b), a < b, with exact cosine >= tau among LSH candidate
    pairs. Recall < 1 by construction (tunable via bands/rows); precision is
    exact because every candidate is verified."""
    sigs = lsh_signatures(items, id_col, vec_col, bands, rows_per_band)
    a = sigs.select(F.col(id_col).alias("a"), "band", "sig")
    b = sigs.select(F.col(id_col).alias("b"), "band", "sig")
    cand = (
        a.join(b, ["band", "sig"])
        .filter(F.col("a") < F.col("b"))
        .select("a", "b")
        .distinct()
    )
    vecs = items.select(F.col(id_col), F.col(vec_col))
    pairs = (
        cand.join(vecs.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va")), "a")
        .join(vecs.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb")), "b")
    )
    scored = pairs.select("a", "b", _cosine_pairs_udf("va", "vb").alias("cosine"))
    return scored.filter(F.col("cosine") >= tau)


def brute_force_cosine_pairs(
    items: DataFrame,
    tau: float,
    id_col: str = "item_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact O(n²) verifier for lsh_cosine_join recall measurements."""
    a = items.select(F.col(id_col).alias("a"), F.col(vec_col).alias("va"))
    b = items.select(F.col(id_col).alias("b"), F.col(vec_col).alias("vb"))
    pairs = a.join(b, F.col("a") < F.col("b"))
    return pairs.select("a", "b", _cosine_pairs_udf("va", "vb").alias("cosine")).filter(
        F.col("cosine") >= tau
    )


def cosine_topk_join(
    items: DataFrame,
    queries: DataFrame,
    k: int,
    item_id: str = "item_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    min_score: float | None = None,
) -> DataFrame:
    """Exact top-k per query (broadcast the query side — it is small by
    definition; rag_system.py:497,506 uses k=10/15 with τ=0.15)."""
    from pyspark.sql import Window

    q = queries.select(F.col(query_id), F.col(vec_col).alias("qv"))
    it = items.select(F.col(item_id), F.col(vec_col).alias("iv"))
    scored = it.crossJoin(F.broadcast(q)).select(
        query_id, item_id, _cosine_pairs_udf("iv", "qv").alias("score")
    )
    if min_score is not None:
        scored = scored.filter(F.col("score") >= min_score)
    w = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(item_id))
    return scored.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= k)


def ivf_topk_join(
    items: DataFrame,
    queries: DataFrame,
    k: int,
    n_cells: int = 16,
    n_probe: int = 4,
    item_id: str = "item_id",
    query_id: str = "query_id",
    vec_col: str = "embedding",
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-style ANN: a coarse quantizer assigns every item to a cell; each
    query probes only its ``n_probe`` nearest cells and runs the exact cosine
    top-k inside them. The cluster-pruned analog of a FAISS IVFFlat index
    (the reference uses exact IndexFlatIP at 59 docs;
    embedding_generator.py:319-327 — this is the 10^12-scale path).

    The quantizer is a seeded KMeans by default; pass ``centroids`` to use a
    fixed pre-trained codebook instead (FAISS supports exactly this split —
    train once offline, assign at scale). With equal-norm centroids the
    cosine argmax used here equals the Euclidean argmin KMeans would assign.

    Recall < 1 by construction (tunable via n_probe); scoring is exact within
    probed cells. The centroid table is broadcast-sized (n_cells rows)."""
    spark = items.sparkSession
    if centroids is not None:
        # Assignment is a pure projection: the codebook is a plan literal and
        # the argmax runs per-row inside whole-stage codegen — items are
        # never shuffled or crossJoined to pick their cell (the alternative
        # — explode ×n_cells + window — shuffles n_cells rows per item,
        # which at 10^9+ items is the dominant cost of building the index).
        # The literals are the L2-NORMALIZED centroids, so the dot argmax
        # equals the cosine argmax for ANY codebook (the item's own norm is
        # constant across cells) — real pre-trained KMeans centroids have
        # unequal norms, and a raw-dot argmax would assign items to cells
        # the query-side cosine probe doesn't rank first. array_position
        # takes the FIRST max, i.e. ties go to the lower cell id, matching
        # the query-side row_number ordering.
        import math

        def _unit(c):
            n = math.sqrt(sum(float(x) * float(x) for x in c))
            return [float(x) / n for x in c] if n > 0 else [0.0 for _ in c]

        cent_lit = F.array(*[
            F.array(*[F.lit(x) for x in _unit(c)]) for c in centroids
        ])
        dots = F.transform(
            cent_lit,
            lambda c: F.aggregate(
                F.zip_with(F.col(vec_col), c, lambda x, y: x.cast("double") * y),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ),
        )
        assigned = items.select(
            F.col(item_id), F.col(vec_col),
            (F.array_position(dots, F.array_max(dots)) - 1).cast("int").alias("cell"),
        )
        cent_df = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(centroids)],
            "cell int, centroid array<double>",
        )
    else:
        from pyspark.ml.clustering import KMeans
        from pyspark.ml.functions import array_to_vector

        it = items.select(F.col(item_id), F.col(vec_col)).withColumn(
            "features", array_to_vector(F.col(vec_col).cast("array<double>"))
        )
        km = KMeans(k=n_cells, seed=seed, featuresCol="features", predictionCol="cell")
        model = km.fit(it)
        assigned = model.transform(it).select(item_id, vec_col, "cell")
        cent_df = spark.createDataFrame(
            [(i, [float(x) for x in c]) for i, c in enumerate(model.clusterCenters())],
            ["cell", "centroid"],
        )

    q = queries.select(F.col(query_id), F.col(vec_col).alias("qv"))
    # rank cells per query by centroid cosine; keep n_probe
    from pyspark.sql import Window

    qc = q.crossJoin(F.broadcast(cent_df)).select(
        query_id, "qv", "cell",
        _cosine_pairs_udf("qv", "centroid").alias("cell_score"),
    )
    w = Window.partitionBy(query_id).orderBy(F.desc("cell_score"), F.asc("cell"))
    probed = qc.withColumn("crank", F.row_number().over(w)).filter(F.col("crank") <= n_probe)

    cand = probed.select(query_id, "qv", "cell").join(assigned, "cell")
    scored = cand.select(
        query_id, item_id, _cosine_pairs_udf(vec_col, "qv").alias("score")
    )
    w2 = Window.partitionBy(query_id).orderBy(F.desc("score"), F.asc(item_id))
    return scored.withColumn("rank", F.row_number().over(w2)).filter(F.col("rank") <= k)
