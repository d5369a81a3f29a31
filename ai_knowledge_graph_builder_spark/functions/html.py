"""Deterministic HTML → text extraction (the reference's S3-S5 analog).

The reference extracts text from docx ("\\n".join(paragraphs),
neo4j_loader.py:215-222), txt (raw read, :224-231) and pdf (page concat,
:233-241). The north rule replaces those with one pure
``extract_text(html: bytes) -> str`` over Common-Crawl-style page bytes that
must be byte-identical per url to the `text` column of the pages table.

The extraction contract (fixed, versioned — changing any rule is a breaking
change to the byte-identity oracle):

1. decode utf-8 (errors="replace")
2. drop <head>…</head>, <script>…</script>, <style>…</style>, comments
3. a closing block tag (</p> </div> </h1-6> </li> </tr> </table>) or <br>
   emits "\\n"
4. all remaining tags are dropped
5. HTML entities are unescaped (html.unescape)
6. exactly one trailing "\\n" is stripped if present

``render_html`` is the inverse used by the corpus generator: for any text
with no character in "<>&" escaping round-trips, and
``extract_text(render_html(title, text)) == text`` byte-for-byte.
"""

from __future__ import annotations

import html as _htmllib
import re

_DROP_SECTIONS = re.compile(
    r"(?is)<head\b[^>]*>.*?</head>|<script\b[^>]*>.*?</script>"
    r"|<style\b[^>]*>.*?</style>|<!--.*?-->"
)
_NEWLINE_TAGS = re.compile(r"(?i)</(?:p|div|h[1-6]|li|tr|table|ul|ol)\s*>|<br\s*/?>")
_ANY_TAG = re.compile(r"(?s)<[^>]*>")


def extract_text(html: bytes) -> str:
    """Pure deterministic page-bytes → text. See module docstring for the
    contract; reference analog: neo4j_loader.py:215-241."""
    s = html.decode("utf-8", errors="replace")
    s = _DROP_SECTIONS.sub("", s)
    s = _NEWLINE_TAGS.sub("\n", s)
    s = _ANY_TAG.sub("", s)
    s = _htmllib.unescape(s)
    if s.endswith("\n"):
        s = s[:-1]
    return s


def render_html(title: str, text: str) -> bytes:
    """Deterministic inverse of extract_text for corpus synthesis: one <p>
    per "\\n"-separated paragraph, no inter-tag whitespace."""
    paras = text.split("\n")
    body = "".join(f"<p>{_escape(p)}</p>" for p in paras)
    doc = (
        "<html><head><title>"
        + _escape(title)
        + '</title><meta charset="utf-8"></head><body>'
        + body
        + "</body></html>"
    )
    return doc.encode("utf-8")


def _escape(s: str) -> str:
    return s.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def word_count(text: str) -> int:
    """Python str.split() word count — exact reference semantics
    (neo4j_loader.py:219,227,237); NOT Spark split() (SURVEY.md §7.4)."""
    return len(text.split())
