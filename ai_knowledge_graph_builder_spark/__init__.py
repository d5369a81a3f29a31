"""PySpark-native knowledge-graph construction engine.

A from-scratch re-implementation of the data-processing semantics of
Blemmer146/AI-Knowledge-Graph-Builder (reference at /root/reference, cited by
file:line throughout) on idiomatic Spark: DataFrame/SQL plans optimized by
Catalyst, vectorized pandas/Arrow UDFs for the per-document compute (NER,
chunking, embedding, fuzzy scoring), explicit partitioning for 100 TB-scale
inputs, and parquet/Iceberg-style committed table stages with per-partition
lineage and checkpoint resume.

Layout
------
- ``functions/``  pure deterministic kernels shared by the Spark pipeline and
  the plain-pandas test oracle (HTML→text, rule NER, stable hashes, chunking,
  embedding stub, difflib scoring).
- ``sources/``    corpus synthesis + table IO (committed parquet stages).
- ``operators/``  the relational/KG operators (linking, co-occurrence,
  inference, triple assembly, dedup, similarity, text stats).
- ``plans/``      end-to-end pipeline orchestration + lineage/resume.
"""

__version__ = "0.1.0"
