"""Property tests for the proof-critical pure kernels.

The length-band prefilter in fuzzy matching claims EXACT equivalence to the
reference's naive argmax (operators depend on it at scale); the chunker
claims full coverage with fixed stride. Hypothesis hunts for counterexamples.
"""

from __future__ import annotations

from difflib import SequenceMatcher

from hypothesis import given, settings, strategies as st

from ai_knowledge_graph_builder_spark.functions.chunking import chunk_text
from ai_knowledge_graph_builder_spark.functions.fuzzy import best_alias_match

_WORD = st.text(alphabet="abcdefgh ", min_size=0, max_size=24)


def _naive(mention: str, aliases: list[str], threshold: float):
    """entity_extractor.py:272-283 verbatim: strict-> running max in order,
    accept at >= threshold."""
    best, best_score = None, 0.0
    for a in aliases:
        s = SequenceMatcher(None, mention, a).ratio()
        if s > best_score:
            best_score, best = s, a
    if best is not None and best_score >= threshold:
        return best, best_score
    return None, best_score


@settings(max_examples=300, deadline=None)
@given(_WORD, st.lists(_WORD, min_size=1, max_size=12))
def test_blocked_fuzzy_equals_naive(mention, aliases):
    got_alias, got_score = best_alias_match(mention, aliases, 0.90)
    want_alias, want_score = _naive(mention, aliases, 0.90)
    assert got_alias == want_alias
    if want_alias is not None:
        assert abs(got_score - want_score) < 1e-12


@settings(max_examples=300, deadline=None)
@given(st.lists(st.text(alphabet="abc", min_size=1, max_size=5), max_size=60),
       st.integers(min_value=2, max_value=20), st.integers(min_value=1, max_value=10))
def test_chunker_invariants(words, size, overlap):
    if overlap >= size:
        overlap = size - 1
    text = " ".join(words)
    chunks = chunk_text(text, chunk_size=size, overlap=overlap)
    n = len(text.split())
    # full coverage, fixed stride, bounded sizes, final chunk reaches the end
    assert chunks[0].start_word == 0
    assert chunks[-1].end_word == n
    for c in chunks:
        assert 0 < c.end_word - c.start_word <= size or n == 0
    for a, b in zip(chunks, chunks[1:]):
        assert b.start_word == a.start_word + (size - overlap)
        assert b.start_word < a.end_word or overlap == 0  # overlap holds
    # chunk word lists reassemble the original word sequence
    if n > 0:
        allwords = text.split()
        for c in chunks:
            assert c.text.split() == allwords[c.start_word : c.end_word]


from hypothesis import given, settings, strategies as st


@settings(max_examples=200, deadline=None)
@given(
    times=st.lists(st.integers(min_value=0, max_value=100_000), min_size=1, max_size=60),
    cuts=st.lists(st.integers(min_value=0, max_value=60), max_size=5),
    gap=st.integers(min_value=1, max_value=5_000),
)
def test_session_fold_chunking_invariant(times, cuts, gap):
    """fold_sessions is associative over chronological chunk splits: folding
    chunk-by-chunk with the carried open session (what applyInPandasWithState
    does across micro-batches) must equal one-shot sessionization."""
    from ai_knowledge_graph_builder_spark.streaming.sessions import fold_sessions

    secs = sorted(times)
    one_shot_closed, one_shot_open = fold_sessions(secs, None, gap)

    bounds = sorted({min(c, len(secs)) for c in cuts} | {0, len(secs)})
    closed, open_s = [], None
    for lo, hi in zip(bounds, bounds[1:]):
        c, open_s = fold_sessions(secs[lo:hi], open_s, gap)
        closed.extend(c)
    assert closed == one_shot_closed
    assert open_s == one_shot_open


def test_corpus_integrity_checks_catch_planted_faults():
    """validate_corpus (gen_data_str.py:579-661 analog) passes on the real
    generator and flags each fault class when planted."""
    import pytest

    from ai_knowledge_graph_builder_spark.sources.corpus import (
        generate_corpus,
        validate_corpus,
    )

    c = generate_corpus(seed=42, waves=1, n_emails=5, n_external=2)
    counts = validate_corpus(c)
    assert counts["employees"] == 30 and counts["pages"] == len(c["pages"])

    dup = {k: v.copy() for k, v in c.items()}
    dup["employees"].loc[1, "id"] = dup["employees"].loc[0, "id"]
    with pytest.raises(AssertionError, match="duplicate ids in employees"):
        validate_corpus(dup)

    dangling = {k: v.copy() for k, v in c.items()}
    dangling["employees"].loc[2, "manager_id"] = "emp_999"
    with pytest.raises(AssertionError, match="dangling manager_id"):
        validate_corpus(dangling)

    notuniq = {k: v.copy() for k, v in c.items()}
    notuniq["employees"].loc[3, "first_name"] = notuniq["employees"].loc[4, "first_name"]
    with pytest.raises(AssertionError, match="first names not unique"):
        validate_corpus(notuniq)

    drift = {k: v.copy() for k, v in c.items()}
    drift["products"] = drift["products"].iloc[:-1]
    with pytest.raises(AssertionError, match="count mismatch for product"):
        validate_corpus(drift)


def test_canonical_url_cases(spark):
    """The URL canonicalizer's full contract on hand-picked edge cases:
    scheme/host lowercasing (path case preserved), fragment stripping,
    default-port removal only for the matching scheme, tracking-param
    removal with separator repair (leading, trailing, consecutive), the
    xutm_ non-match, and trailing-slash semantics (a slash before the
    query string is NOT trailing)."""
    import pandas as pd

    from pyspark.sql import functions as F

    from ai_knowledge_graph_builder_spark.functions.urlnorm import canonical_url

    cases = [
        ("https://Example.COM/Path/Page", "https://example.com/Path/Page"),
        ("HTTPS://example.com:443/a?x=1#frag", "https://example.com/a?x=1"),
        ("http://Example.com:80/", "http://example.com"),
        ("http://example.com:8080/a", "http://example.com:8080/a"),
        ("https://a.com/p?utm_source=x", "https://a.com/p"),
        ("https://a.com/p?utm_a=1&utm_b=2&id=3", "https://a.com/p?id=3"),
        ("https://a.com/p?id=3&utm_a=1&utm_b=2", "https://a.com/p?id=3"),
        ("https://a.com/p?xutm_a=1", "https://a.com/p?xutm_a=1"),
        ("https://a.com/p?gclid=g&fbclid=f", "https://a.com/p"),
        ("https://a.com/p/?id=1", "https://a.com/p/?id=1"),
        ("https://a.com/p/", "https://a.com/p"),
        ("https://a.com/p#a?utm_x=1", "https://a.com/p"),
        ("http://a.com:80?q=1", "http://a.com?q=1"),
    ]
    df = spark.createDataFrame(pd.DataFrame({"url": [c[0] for c in cases]}))
    got = [r["c"] for r in df.select(canonical_url(F.col("url")).alias("c")).collect()]
    assert got == [c[1] for c in cases], list(zip(got, [c[1] for c in cases]))


def test_canonical_url_idempotent_and_invariant(spark):
    """Canonicalization is a projection onto its own image: applying it
    twice equals applying it once, and every output satisfies the
    invariants (no fragment, lowercase scheme+host, no default port, no
    tracking params, no dangling separators, no trailing slash) — checked
    over the full cross product of surface forms in ONE Spark pass."""
    import itertools
    import re

    import pandas as pd
    from pyspark.sql import functions as F

    from ai_knowledge_graph_builder_spark.functions.urlnorm import canonical_url

    urls = [
        f"{scheme}://{host}{port}{path}{query}{frag}"
        for scheme, host, port, path, query, frag in itertools.product(
            ["http", "HTTP", "https"],
            ["a.com", "A.Com"],
            ["", ":80", ":443", ":8080"],
            ["", "/", "/P/q", "/P/q/"],
            ["", "?utm_a=1", "?id=2&utm_a=1&utm_b=2", "?utm_a=1&id=2", "?id=2"],
            ["", "#f"],
        )
    ]
    df = spark.createDataFrame(pd.DataFrame({"url": urls}))
    out = df.select(
        "url",
        canonical_url(F.col("url")).alias("c1"),
        canonical_url(canonical_url(F.col("url"))).alias("c2"),
    ).collect()
    host_re = re.compile(r"^[a-z+.0-9-]+://[a-z0-9.-]*(:[0-9]+)?(?=[/?#]|$)")
    for r in out:
        assert r["c1"] == r["c2"], (r["url"], r["c1"], r["c2"])
        c = r["c1"]
        assert "#" not in c, c
        assert host_re.match(c), c
        # default ports only for their own scheme: http://host:443 stays
        assert not re.match(r"^http://[^/?#]*:80([/?#]|$)", c), c
        assert not re.match(r"^https://[^/?#]*:443([/?#]|$)", c), c
        assert "utm_" not in c and "gclid" not in c and "fbclid" not in c, c
        assert not c.endswith("?") and not c.endswith("&"), c
        assert "?&" not in c and "&&" not in c, c
        assert not c.endswith("/") or c.endswith("://"), c


def test_rulener_alternation_fast_path_equivalence():
    """The single-alternation gazetteer scan (engaged only for gazetteers
    of single alphanumeric tokens, where matches provably cannot overlap)
    produces byte-identical mentions to the per-phrase finditer loop under
    the same global sweep — including duplicate-phrase first-wins labels,
    case-insensitive hits inside cap-run candidates, and prefix tokens
    (al / alpha / alphabeta)."""
    import random
    import re

    from ai_knowledge_graph_builder_spark.functions.ner import RuleNER

    gaz = [("alpha", "ORG"), ("beta", "PERSON"), ("alpha", "LAW"),
           ("al", "GPE"), ("alphabeta", "PRODUCT"), ("x1", "ORG")]
    fast = RuleNER(gaz)
    assert fast._gaz_pat is not None
    # reference: per-phrase candidates + the same non-gazetteer detectors
    pats = [(re.compile(r"(?<![0-9A-Za-z])" + re.escape(p) + r"(?![0-9A-Za-z])",
                        re.IGNORECASE), l) for p, l in gaz]
    base = RuleNER(None)

    def reference(text):
        cands = []
        for pat, label in pats:
            for m in pat.finditer(text):
                cands.append((m.start(), m.end(), m.group(0), label, 0))
        for mm in base(text):
            prio = 1 if mm.text.startswith(("Mr.", "Ms.", "Mrs.", "Dr.")) else 2
            cands.append((mm.start, mm.end, mm.text, mm.label, prio))
        cands.sort(key=lambda c: (c[0], -(c[1] - c[0]), c[4]))
        out, cur = [], -1
        for s, e, t, l, _ in cands:
            if s >= cur:
                out.append((t, l, s, e))
                cur = e
        return out

    rng = random.Random(11)
    # includes Unicode case-fold traps (ſ folds to s): such documents must
    # route to the per-phrase loop — review found the alternation both
    # diverges (fold matches can overlap across ASCII boundaries) and
    # KeyErrors (matched text whose .lower() is not a label key) on them
    words = ["alpha", "beta", "gamma", "ALPHA", "Alpha", "Beta", "x1", "al",
             "alphabeta", "Mr.", "Dr. Alpha", "ſal", "alſbeta", "X-alſx1"]
    for _ in range(1200):
        t = " ".join(rng.choice(words) for _ in range(rng.randint(1, 12)))
        got = [(m.text, m.label, m.start, m.end) for m in fast(t)]
        assert got == reference(t), t

    # the direct crash regression: ASCII gazetteer, fold-matching text
    crash = RuleNER([("sun", "ORG")])
    assert [(m.text, m.label) for m in crash("a ſun b")] == [("ſun", "ORG")]

    # multi-word, punctuated, or non-ASCII phrases must NOT take the fast
    # path (overlaps / fold divergence possible)
    assert RuleNER([("alpha beta", "ORG")])._gaz_pat is None
    assert RuleNER([("a-b", "ORG")])._gaz_pat is None
    assert RuleNER([("café", "ORG")])._gaz_pat is None
