"""Web-page text extraction (SURVEY.md §2.2 N1).

``extract_text_batch`` is a stateless zero-copy-in ``map_batches``
transform over Arrow batches: html binary → extracted text, plus the
contents of any ``application/geo+json`` script blocks.

The extraction contract (and the generator in sources/pages.py) is:
text = the HTML-unescaped contents of the <p> blocks, joined by
newlines. The north rule's per-row invariant is that this equals the
``text`` column byte-for-byte per url.
"""

from __future__ import annotations

import html as html_mod
import re

import pyarrow as pa
import pyarrow.compute as pc

_P_RE = re.compile(r"<p>(.*?)</p>", re.S)
_GEOJSON_SCRIPT_RE = re.compile(
    r'<script type="application/geo\+json">(.*?)</script>', re.S
)

# html.unescape is a multi-thousand-entity regex sub with a Python
# callback (~25 µs per block) — the dominant extract cost. When every
# '&' in a block is one of the five html.escape outputs, five chained
# C-level str.replace calls are EQUIVALENT to unescape's single pass
# (&amp; last, so no replacement output is re-processed — both are
# single-pass left-to-right); any other '&' falls back to the real
# unescape.
_SIMPLE_ENT_GUARD = re.compile(r"&(?!(?:amp|lt|gt|quot|#x27);)")


def _unescape_block(m: str) -> str:
    if "&" not in m:
        return m
    if _SIMPLE_ENT_GUARD.search(m):
        return html_mod.unescape(m)
    return (
        m.replace("&lt;", "<").replace("&gt;", ">")
        .replace("&quot;", '"').replace("&#x27;", "'")
        .replace("&amp;", "&")
    )


def extract_text_from_html(html: bytes) -> str:
    """Recover the text channel from page html (N1, byte-identical)."""
    s = html.decode("utf-8", errors="replace")
    return "\n".join(_unescape_block(m) for m in _P_RE.findall(s))


def extract_script_geojson(html: bytes) -> list[str]:
    """geo+json script payloads (a second mining channel)."""
    s = html.decode("utf-8", errors="replace")
    return _GEOJSON_SCRIPT_RE.findall(s)


def extract_text_batch(batch: pa.Table) -> pa.Table:
    """map_batches(extract_text_batch, batch_format="pyarrow").

    Adds ``extracted_text`` (from html) and ``script_geojson``
    (list<string>). The html column is dropped afterwards — downstream
    stages only carry the text channel (column pruning at the earliest
    point the bytes are no longer needed).

    Hot-path notes: each page decodes ONCE (the two channel scans
    share the decoded string), and ``html.unescape`` — a multi-pattern
    regex substitution — only runs on <p> blocks that contain '&'
    (identity otherwise, by definition of HTML entity escaping).
    """
    htmls = batch["html"]
    texts = []
    scripts = []
    for buf in htmls:
        s = buf.as_py().decode("utf-8", errors="replace")
        texts.append("\n".join(_unescape_block(m) for m in _P_RE.findall(s)))
        scripts.append(_GEOJSON_SCRIPT_RE.findall(s))
    out = batch.drop_columns(["html"])
    out = out.append_column("extracted_text", pa.array(texts, pa.string()))
    out = out.append_column(
        "script_geojson", pa.array(scripts, pa.list_(pa.string()))
    )
    return out


def verify_extraction_batch(batch: pa.Table) -> pa.Table:
    """Per-batch check of the north-rule invariant: extracted_text ==
    text, vectorized; emits a boolean column ``text_identical``."""
    eq = pc.equal(batch["extracted_text"], batch["text"])
    return batch.append_column("text_identical", eq)
