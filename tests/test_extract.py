"""M1: byte-identical HTML→text extraction (north-rule per-row invariant)."""

from __future__ import annotations

import string

from hypothesis import given, settings, strategies as st

from ai_knowledge_graph_builder_spark.functions.html import extract_text, render_html, word_count
from ai_knowledge_graph_builder_spark.sources.corpus import generate_corpus

# characters the corpus generator can emit in document text
_TEXT_ALPHABET = string.ascii_letters + string.digits + " .,:;!?()&<>'\"-\n"


def test_roundtrip_simple():
    text = "Hello World.\nSecond paragraph with <angle> & ampersand."
    assert extract_text(render_html("t", text)) == text


def test_roundtrip_empty_paragraphs():
    text = "a\n\nb\n"
    assert extract_text(render_html("t", text)) == text


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=_TEXT_ALPHABET, max_size=400))
def test_roundtrip_property(text):
    assert extract_text(render_html("title", text)) == text


def test_extract_drops_head_script_style():
    html = (
        b"<html><head><title>T</title><style>p{}</style></head>"
        b"<body><script>var x=1;</script><p>keep</p><!-- c --></body></html>"
    )
    assert extract_text(html) == "keep"


def test_corpus_pages_byte_identity(corpus):
    """Every synthesized page round-trips byte-for-byte (plain Python path)."""
    for row in corpus["pages"].itertuples(index=False):
        assert extract_text(row.html) == row.text, row.url


def test_word_count_python_semantics():
    # runs of whitespace, leading/trailing — Python str.split() semantics
    assert word_count("  a  b\t\nc  ") == 3
    assert word_count("") == 0
    assert word_count("\n\n") == 0


def test_spark_extraction_matches_oracle_column(spark, corpus):
    """The mapInPandas path reproduces the text column byte-identically
    (verify_extraction returns zero mismatch rows)."""
    from ai_knowledge_graph_builder_spark.operators.extraction import verify_extraction

    pages = spark.createDataFrame(corpus["pages"])
    assert verify_extraction(pages).count() == 0
