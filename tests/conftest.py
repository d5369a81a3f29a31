from __future__ import annotations

import sys
from pathlib import Path

import pytest

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

from ai_knowledge_graph_builder_spark.session import get_spark  # noqa: E402


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kg-spark-tests", master="local[4]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus():
    from ai_knowledge_graph_builder_spark.sources.corpus import generate_corpus

    return generate_corpus(seed=42, waves=5, n_emails=20, n_external=6, filler_max_words=120)
