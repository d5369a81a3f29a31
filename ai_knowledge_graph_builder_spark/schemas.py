"""Fixed StructType schemas for every table in the pipeline (SURVEY.md §1).

The reference is schemaless-at-runtime (Python dicts / Neo4j property bags /
JSON — e.g. mention dicts at entity_extractor.py:177-186, triple JSON at
entity_extractor.py:474-492). Here every stage has one explicit schema,
declared once and enforced on read/write.
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Primary input: Common-Crawl-style pages (BASELINE.json input_hint)
# ---------------------------------------------------------------------------
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),  # oracle column (byte-identity)
        T.StructField("lang", T.StringType(), True),
    ]
)

# documents = pages + extracted text/word_count (Document node analog,
# neo4j_loader.py:286-293)
DOCUMENTS = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        # document processing order is sorted(url) — the url itself is the
        # ordering key (replaces the reference's sorted(glob) arrival order,
        # neo4j_loader.py:252-269); no global rank column is materialized.
        T.StructField("doc_type", T.StringType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("extracted_text", T.StringType(), True),
        T.StructField("word_count", T.IntegerType(), True),
        T.StructField("confidence", T.DoubleType(), True),
        T.StructField("has_contradictions", T.BooleanType(), True),
    ]
)

# entity registry (entities.json analog, entity_extractor.py:110-151)
REGISTRY = T.StructType(
    [
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("entity_type", T.StringType(), False),  # employee/project/...
        T.StructField("name", T.StringType(), False),
        T.StructField("full_name", T.StringType(), True),  # employees + regulations
        T.StructField("first_name", T.StringType(), True),
        T.StructField("last_name", T.StringType(), True),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
        T.StructField("insertion_idx", T.LongType(), False),  # registry order
    ]
)

# alias dictionary (broadcast side; entity_extractor.py:119-149)
ALIASES = T.StructType(
    [
        T.StructField("alias", T.StringType(), False),
        T.StructField("entity_id", T.StringType(), False),
        T.StructField("insertion_idx", T.LongType(), False),  # dict-order semantics:
        # last-wins on collision, first-max on fuzzy ties (SURVEY.md §7.4)
    ]
)

# raw NER mentions (entity_extractor.py:177-186)
MENTIONS_RAW = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("doc_type", T.StringType(), True),
        T.StructField("mention_idx", T.IntegerType(), False),  # span order in doc;
        # (url, mention_idx) is the global arrival order used for every
        # "first mention wins" semantic (A1/D1 — SURVEY.md §7.4 risk 2)
        T.StructField("text", T.StringType(), False),
        T.StructField("label", T.StringType(), False),
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
    ]
)

# resolved mentions (entity_extractor.py:208-259)
MENTIONS_RESOLVED = T.StructType(
    MENTIONS_RAW.fields
    + [
        T.StructField("resolved_id", T.StringType(), True),
        T.StructField("resolution_method", T.StringType(), True),  # exact_match/
        # fuzzy_match/external_entity
        T.StructField("resolution_type", T.StringType(), True),  # canonical/external
        T.StructField("confidence", T.DoubleType(), True),
    ]
)

# graph nodes (typed Neo4j nodes → one DataFrame; neo4j_loader.py:100-145)
NODES = T.StructType(
    [
        T.StructField("id", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("node_type", T.StringType(), False),  # Employee/Project/...
        T.StructField("confidence", T.DoubleType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# graph edges (typed Neo4j relationships; neo4j_loader.py:161-206,
# entity_extractor.py:405-415)
EDGES = T.StructType(
    [
        T.StructField("src", T.StringType(), False),
        T.StructField("predicate", T.StringType(), False),
        T.StructField("dst", T.StringType(), False),
        T.StructField("confidence", T.DoubleType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("flagged", T.BooleanType(), False),
        T.StructField("inferred", T.BooleanType(), False),
        T.StructField("props", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# SPO triples (entity_extractor.py:474-492), flattened: nested subject/object
# structs become prefixed columns so the table is parquet/SQL friendly.
TRIPLES = T.StructType(
    [
        T.StructField("subject_id", T.StringType(), False),
        T.StructField("subject_name", T.StringType(), True),
        T.StructField("subject_type", T.StringType(), True),
        T.StructField("predicate", T.StringType(), False),
        T.StructField("object_id", T.StringType(), False),
        T.StructField("object_name", T.StringType(), True),
        T.StructField("object_type", T.StringType(), True),
        T.StructField("confidence", T.DoubleType(), True),
        T.StructField("source", T.StringType(), True),
        T.StructField("flagged", T.BooleanType(), False),
        T.StructField("inferred", T.BooleanType(), False),
        T.StructField("text", T.StringType(), True),
    ]
)

# chunks (embedding_generator.py:219-260)
CHUNKS = T.StructType(
    [
        T.StructField("chunk_id", T.StringType(), False),
        T.StructField("url", T.StringType(), False),
        T.StructField("chunk_index", T.IntegerType(), False),
        T.StructField("start_word", T.IntegerType(), False),
        T.StructField("end_word", T.IntegerType(), False),
        T.StructField("text", T.StringType(), False),
        T.StructField("word_count", T.IntegerType(), False),
    ]
)

# embeddings (embedding_generator.py:287-305; 384-d MiniLM analog)
EMBEDDINGS = T.StructType(
    [
        T.StructField("item_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # triple|chunk
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
    ]
)

# per-partition lineage rows (north rule: input split, counts, checksums)
LINEAGE = T.StructType(
    [
        T.StructField("stage", T.StringType(), False),
        T.StructField("partition_id", T.IntegerType(), False),
        T.StructField("row_count", T.LongType(), False),
        T.StructField("checksum", T.StringType(), True),  # xor/sum of row hashes
        T.StructField("min_key", T.StringType(), True),
        T.StructField("max_key", T.StringType(), True),
    ]
)
