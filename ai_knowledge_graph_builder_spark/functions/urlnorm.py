"""URL canonicalization for Common-Crawl-style corpora.

The north-rule input is a table of web pages keyed by url; real crawls
carry the same page under many surface forms (scheme/host case, default
ports, tracking parameters, fragments, trailing slashes). Canonicalizing
BEFORE url-keyed dedup/partitioning is the standard first step of a
training-data pipeline (the reference keys documents by filename and never
needs this; it is part of the beyond-reference LLM-pipeline surface).

Pure built-in-function implementation — a single codegen'd projection, no
UDF, so it runs JVM-side at scan speed and the same regex chain is
reproducible in any RE2/Java-regex engine (no lookaround, no backrefs in
patterns; the driver oracle re-implements it in DuckDB SQL).

Normalization steps, in order:
1. strip the fragment (``#...``);
2. lowercase the scheme and host (chars up to the first ``/``, ``?`` after
   ``://``) — path and query case is significant and preserved;
3. drop default ports (``:80`` for http, ``:443`` for https);
4. drop tracking parameters (``utm_*``, ``gclid``, ``fbclid``) and repair
   the separators (dangling ``?``/``&``);
5. strip one trailing slash (``.../path/`` == ``.../path``, ``host/`` ==
   ``host``).
"""

from __future__ import annotations

from pyspark.sql import Column, functions as F

_TRACKING = r"([?&])(utm_[A-Za-z0-9_]*|gclid|fbclid)=[^&#]*"


def canonical_url(url: Column) -> Column:
    """Canonical form of ``url`` as a single whole-stage-codegen projection."""
    u = F.regexp_replace(url, r"#.*$", "")
    # lowercase scheme://host[:port] only; keep path/query case
    pref = F.regexp_extract(u, r"^([^:/?#]+://[^/?#]*)", 1)
    u = F.concat(F.lower(pref), F.substr(u, F.length(pref) + F.lit(1)))
    for scheme, port in (("http", "80"), ("https", "443")):
        # the port may be followed by a path, a query, or nothing —
        # enumerated explicitly because RE2 (the oracle engine) has no
        # lookahead
        u = F.regexp_replace(u, rf"^({scheme}://[^:/?#]*):{port}/", r"$1/")
        u = F.regexp_replace(u, rf"^({scheme}://[^:/?#]*):{port}\?", r"$1?")
        u = F.regexp_replace(u, rf"^({scheme}://[^:/?#]*):{port}$", r"$1")
    # each match consumes its LEADING separator and leaves it behind
    # (``$1``), so consecutive tracking params reduce to runs of ``?&``/
    # ``&&`` that the two repair passes collapse — this avoids lookbehind
    # (absent in RE2) while never matching inside a longer parameter name
    u = F.regexp_replace(u, _TRACKING, r"$1")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"\?&", "?")
    u = F.regexp_replace(u, r"[?&]$", "")
    return F.regexp_replace(u, r"/$", "")
