"""GeoJSON candidate mining from free text (SURVEY.md §2.2 N2).

Finds embedded GeoJSON documents in arbitrary text: a compiled regex
locates ``"type": "<GeoJSON type>"`` tokens, a bounded backward brace
scan finds the enclosing ``{``, and ``json.JSONDecoder.raw_decode``
validates/extents the candidate. Overlapping candidates are collapsed
to the outermost document (a Feature inside a mined FeatureCollection
is not re-emitted).

Stateful pieces (compiled regex, decoder) live in the ``GeoJsonMiner``
class so map_batches can run it as an actor pool with setup done once
per actor.
"""

from __future__ import annotations

import json
import re

import pyarrow as pa

_TYPE_TOKEN = re.compile(
    r'"type"\s*:\s*"(Feature|FeatureCollection|Point|MultiPoint|LineString|'
    r'MultiLineString|Polygon|MultiPolygon|GeometryCollection)"'
)

_MAX_BACKSCAN = 65536  # bytes to walk back looking for the opening brace


def lenient_value_end(text: str, start: int):
    """End offset (exclusive) of ONE brace-balanced JSON-ish value at
    ``start``, tolerating lexical junk inside strings (escape pairs
    consumed blindly, raw control chars allowed) — the span a
    recovering lexer (core/jsontext.recover_json_text) would consume.
    None if the value never balances."""
    depth = 0
    i = start
    n = len(text)
    in_str = False
    while i < n:
        c = text[i]
        if in_str:
            if c == "\\":
                i += 2
                continue
            if c == '"':
                in_str = False
        else:
            if c == '"':
                in_str = True
            elif c == "{" or c == "[":
                depth += 1
            elif c == "}" or c == "]":
                depth -= 1
                if depth == 0:
                    return i + 1
        i += 1
    return None


def find_candidates(text: str) -> list[tuple[int, int, str]]:
    """→ [(start, end, doc_text)] of embedded JSON docs that carry a
    GeoJSON type token, outermost-only, left to right.

    Candidates that fail STRICT decode get one recovery attempt: a
    lenient span scan + recover_json_text re-parse (the streaming
    lexer's U+FFFD splice behavior, jsone.ml:327-420) — so a web page
    embedding ``{"a":"b\\qc", "type":"Feature", ...}`` still mines the
    OUTER document instead of just its well-formed innards."""
    from ..core.jsontext import recover_json_text

    decoder = json.JSONDecoder()
    out: list[tuple[int, int, str]] = []
    last_end = -1
    for m in _TYPE_TOKEN.finditer(text):
        if m.start() < last_end:
            continue  # inside an already-mined doc
        start = _enclosing_brace(text, m.start())
        found = False
        while start is not None and not found:
            if start < last_end:
                break
            try:
                _, end = decoder.raw_decode(text, start)
                out.append((start, end, text[start:end]))
                last_end = end
                found = True
                continue
            except ValueError:
                pass
            except RecursionError:
                # pathologically deep candidate: skip this token rather
                # than crash the worker (the parse stage records the
                # same verdict for any candidate that does decode)
                break
            # strict decode failed: recoverable-per-the-reference doc?
            end = lenient_value_end(text, start)
            if end is not None and end > m.start():
                span = text[start:end]
                try:
                    json.loads(recover_json_text(span))
                    out.append((start, end, span))
                    last_end = end
                    found = True
                    continue
                except (ValueError, RecursionError):
                    pass
            # brace was inside a string or unbalanced: try the next
            # enclosing brace further left
            start = _enclosing_brace(text, start - 1)
    return out


def _enclosing_brace(text: str, pos: int):
    """Nearest ``{`` at balance +1 scanning left from pos (bounded)."""
    depth = 0
    lo = max(0, pos - _MAX_BACKSCAN)
    for i in range(pos, lo - 1, -1):
        c = text[i]
        if c == "}":
            depth += 1
        elif c == "{":
            if depth == 0:
                return i
            depth -= 1
    return None


class GeoJsonMiner:
    """Actor-pool stage: one row per mined candidate.

    Input columns: url, warc_ts, lang, extracted_text, script_geojson.
    Output: url, warc_ts, lang, cand_idx, cand_source ('text'|'script'),
    cand_start, cand_text.
    """

    def __init__(self, text_column: str = "extracted_text"):
        self.text_column = text_column

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls, tss, langs, idxs, srcs, starts, docs = [], [], [], [], [], [], []
        texts = batch[self.text_column].to_pylist()
        scripts = (
            batch["script_geojson"].to_pylist()
            if "script_geojson" in batch.column_names
            else [[] for _ in texts]
        )
        url_col = batch["url"].to_pylist()
        ts_col = batch["warc_ts"].to_pylist()
        lang_col = batch["lang"].to_pylist()
        for row, text in enumerate(texts):
            n = 0
            for start, _end, doc in find_candidates(text):
                urls.append(url_col[row])
                tss.append(ts_col[row])
                langs.append(lang_col[row])
                idxs.append(n)
                srcs.append("text")
                starts.append(start)
                docs.append(doc)
                n += 1
            for s in scripts[row] or []:
                urls.append(url_col[row])
                tss.append(ts_col[row])
                langs.append(lang_col[row])
                idxs.append(n)
                srcs.append("script")
                starts.append(-1)
                docs.append(s)
                n += 1
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "warc_ts": pa.array(tss, pa.timestamp("us")),
                "lang": pa.array(langs, pa.string()),
                "cand_idx": pa.array(idxs, pa.int32()),
                "cand_source": pa.array(srcs, pa.string()),
                "cand_start": pa.array(starts, pa.int64()),
                "cand_text": pa.array(docs, pa.string()),
            }
        )
