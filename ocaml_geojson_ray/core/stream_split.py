"""Incremental FeatureCollection splitter (SURVEY.md §2.1 T7).

The reference's geojsone parses one document as a LEXEME STREAM so a
multi-GB FeatureCollection never materializes a whole DOM
(src/geojsone/geojsone.ml:68-116 decode_single_object / maps fold one
feature at a time). The Ray-native restatement: a single-pass scanner
that walks the text once, yields each element of the TOP-LEVEL
``features`` array as its own small document, and returns the rest of
the document (with ``"features":[]`` spliced in) as a small meta doc
for bbox / foreign-member parsing.

Peak memory is O(largest single feature + non-features members), not
O(document DOM) — the DOM blow-up (~10× text size in Python objects)
is the thing that kills a worker on a giant doc, and per-feature
parsing bounds it.

The scanner is lexically tolerant (escape pairs consumed blindly, raw
control chars allowed) so recoverable-per-the-reference documents
(jsontext.recover_json_text) split the same way they parse.
"""

from __future__ import annotations

from typing import Iterable, Iterator


class NotACollection(Exception):
    """No top-level ``"features": [...]`` member found."""


def iter_features_text(chunks: Iterable[str]) -> Iterator[tuple[str, str]]:
    """→ yields ("feature", <element text>) for each element of the
    top-level features array, then ONE ("meta", <doc with features:[]>).

    ``chunks``: any iterable of text pieces (a whole string in a list,
    a file read in blocks, ...). Raises NotACollection when the first
    top-level object has no ``features`` array (caller falls back to
    whole-doc parse).
    """
    buf = ""
    pos = 0
    depth = 0
    in_str = False
    esc = False
    meta: list[str] = []
    last_name = None  # most recent complete depth-1 member name string
    name_start = -1
    state = "preamble"  # preamble | expect_colon | expect_array | features | postamble
    elem_start = -1
    chunk_iter = iter(chunks)

    def refill() -> bool:
        nonlocal buf, pos, elem_start, name_start
        # drop consumed prefix to keep the buffer bounded
        keep_from = pos
        if state == "features" and elem_start >= 0:
            keep_from = min(keep_from, elem_start)
        if state == "preamble" and name_start >= 0:
            keep_from = min(keep_from, name_start)
        if keep_from > 0:
            if state in ("preamble", "postamble") and keep_from > pos:
                keep_from = pos
            meta_cut = buf[:keep_from]
            if state in ("preamble", "postamble"):
                meta.append(meta_cut)
            elif meta_cut and state not in ("features",):
                meta.append(meta_cut)
            buf = buf[keep_from:]
            pos -= keep_from
            if elem_start >= 0:
                elem_start -= keep_from
            if name_start >= 0:
                name_start -= keep_from
        for piece in chunk_iter:
            if piece:
                buf += piece
                return True
        return False

    def cur() -> str | None:
        nonlocal pos
        while pos >= len(buf):
            if not refill():
                return None
        return buf[pos]

    # ---- preamble: copy to meta until the depth-1 "features" colon+[ --
    while True:
        c = cur()
        if c is None:
            # whole doc consumed without a features array
            raise NotACollection()
        if in_str:
            if esc:
                esc = False
            elif c == "\\":
                esc = True
            elif c == '"':
                in_str = False
                if depth == 1 and state == "preamble":
                    last_name = buf[name_start + 1 : pos]
            pos += 1
            continue
        if c == '"':
            in_str = True
            if depth == 1 and state == "preamble":
                name_start = pos
            pos += 1
            continue
        if state == "expect_array":
            if c in " \t\r\n":
                pos += 1
                continue
            if c == "[":
                # entering the features array: meta gets everything up
                # to AND including this '[' ... we splice ']' at close
                meta.append(buf[:pos + 1])
                buf = buf[pos + 1 :]
                pos = 0
                state = "features"
                elem_start = -1
                break
            state = "preamble"
            continue  # not an array: keep scanning (same char, new state)
        if c == ":":
            if depth == 1 and last_name == "features":
                state = "expect_array"
            pos += 1
            continue
        if c in "{[":
            depth += 1
        elif c in "}]":
            depth -= 1
        pos += 1

    # ---- features array: yield elements one by one --------------------
    edepth = 0
    while True:
        c = cur()
        if c is None:
            raise NotACollection()  # unterminated array: not splittable
        if in_str:
            if esc:
                esc = False
            elif c == "\\":
                esc = True
            elif c == '"':
                in_str = False
            pos += 1
            continue
        if c == '"':
            if elem_start < 0 and edepth == 0:
                # bare STRING element: only container elements split
                # cleanly (a primitive would vanish from both streams
                # and flip the reference's error verdict) — bail to the
                # whole-doc path
                raise NotACollection()
            in_str = True
            pos += 1
            continue
        if edepth == 0 and c == "]":
            # array closed; splice and move to postamble
            meta.append("]")
            buf = buf[pos + 1 :]
            pos = 0
            state = "postamble"
            break
        if edepth == 0 and (c == "," or c in " \t\r\n"):
            pos += 1
            continue
        if elem_start < 0:
            if c not in "{[":
                # primitive element (null / number / bool): not
                # splittable — fall back so verdicts match the
                # whole-doc parse exactly
                raise NotACollection()
            elem_start = pos
        if c in "{[":
            edepth += 1
        elif c in "}]":
            edepth -= 1
            if edepth == 0:
                yield "feature", buf[elem_start : pos + 1]
                buf = buf[pos + 1 :]
                pos = 0
                elem_start = -1
                continue
        pos += 1

    # ---- postamble: the rest is meta; a DUPLICATE top-level "features"
    # key would make json.loads of the original doc keep the LAST array
    # while we split the FIRST — detect and bail ------------------------
    tail = buf[pos:] + "".join(chunk_iter)
    if _has_toplevel_features_key(tail):
        raise NotACollection()
    meta.append(tail)
    yield "meta", "".join(meta)


def _name_is_features(raw: str) -> bool:
    """Compare a raw (still-escaped) member name against "features"
    AFTER JSON string decoding, so shadowing spellings like
    "\\u0066eatures" are caught. Undecodable names count as a match —
    the caller bails to the whole-doc path, which is always safe."""
    if raw == "features":
        return True
    if "\\" not in raw:
        return False
    import json as _json

    try:
        return _json.loads('"' + raw + '"') == "features"
    except Exception:
        return True


def _has_toplevel_features_key(tail: str) -> bool:
    """True if the postamble (depth-1 continuation of the root object)
    contains another ``"features"`` member name at depth 1 (any JSON
    escape spelling of it — names are decoded before comparing)."""
    depth = 1  # we are inside the root object
    in_str = False
    esc = False
    name_start = -1
    i = 0
    n = len(tail)
    while i < n:
        c = tail[i]
        if in_str:
            if esc:
                esc = False
            elif c == "\\":
                esc = True
            elif c == '"':
                in_str = False
                if depth == 1 and name_start >= 0:
                    name = tail[name_start + 1 : i]
                    # a depth-1 string followed (after ws) by ':' is a
                    # member name
                    j = i + 1
                    while j < n and tail[j] in " \t\r\n":
                        j += 1
                    if j < n and tail[j] == ":" and _name_is_features(name):
                        return True
                name_start = -1
        elif c == '"':
            in_str = True
            if depth == 1:
                name_start = i
        elif c in "{[":
            depth += 1
        elif c in "}]":
            depth -= 1
        i += 1
    return False


def split_collection_text(doc: str):
    """Convenience over one in-memory string: → (feature_texts_iter,
    meta_text) lazily; raises NotACollection if not splittable."""
    feats = []
    meta = None
    for kind, text in iter_features_text([doc]):
        if kind == "feature":
            feats.append(text)
        else:
            meta = text
    return feats, meta
