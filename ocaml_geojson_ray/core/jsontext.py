"""Canonical JSON text layer.

Reproduces the byte-level serialization rules of the reference's
incremental encoder (reference: src/geojsone/vendor/jsone/jsone.ml):

- numbers encode with C ``%.16g`` (jsone.ml:815-819), so ``40.0`` →
  ``40`` and ``125.6`` → ``125.6``;
- string escapes: only ``"`` (0x22), ``\\`` (0x5C) and newline (0x0A)
  get two-byte escapes; any other control char <= 0x1F becomes
  ``\\u00XX`` with uppercase hex (jsone.ml:769-796); everything else is
  raw UTF-8;
- minified by default (no whitespace, jsone.ml:930); pretty mode indents
  two spaces per nesting level (jsone.ml:751-767).

Decoding matches the reference's DOM layer (ezjsone.ml:201-215): every
JSON number becomes a double (ints are parsed via ``parse_int=float``).

JSON values are plain Python: None / bool / float / str / list / dict
(dicts preserve insertion order, standing in for the reference's assoc
lists).
"""

from __future__ import annotations

import json
from typing import Any


def _reject_constant(name: str) -> float:
    # RFC 4627 has no NaN/Infinity; the reference's lexer errors on them.
    raise ValueError(f"invalid JSON constant {name}")


def loads_json(text: str | bytes) -> Any:
    """Parse JSON text into a value under the reference's "all numbers
    are doubles" model (ezjsone.ml:201-215, jsone.ml:424-433).

    Performance note: ints are kept as Python ints here (passing
    ``parse_int=float`` would disable CPython's C scanner, ~3× slower
    on number-heavy GeoJSON); every consumer treats int and float
    uniformly as "a JSON number" — the parser accepts both where the
    reference expects `Float, ``json_equal`` compares them numerically,
    and the serializer formats both through ``%.16g`` — so verdicts and
    bytes are identical to the doubles-only model. Raises ``ValueError``
    on malformed input (the DOM path's Parse_error, ezjsone.ml:174).
    """
    if isinstance(text, (bytes, bytearray)):
        # Transport decode: BOM-tolerant UTF-8 with U+FFFD replacement
        # (uutfe.ml:940-980 replaces malformed sequences rather than failing).
        text = decode_transport(bytes(text))
    return json.loads(text, parse_constant=_reject_constant)


def decode_transport(data: bytes) -> str:
    """UTF transport decode with BOM sniffing and U+FFFD replacement.

    Reference: uutfe.ml:948-980 guesses UTF-8/16BE/16LE from the BOM /
    first bytes and replaces malformed sequences with U+FFFD
    (uutfe.ml:35).
    """
    if data[:3] == b"\xef\xbb\xbf":
        return data[3:].decode("utf-8", errors="replace")
    if data[:2] == b"\xfe\xff":
        return data[2:].decode("utf-16-be", errors="replace")
    if data[:2] == b"\xff\xfe":
        return data[2:].decode("utf-16-le", errors="replace")
    return data.decode("utf-8", errors="replace")


_ESCAPE_MAP = {}
for _c in range(0x20):
    _ESCAPE_MAP[_c] = "\\u00%02X" % _c
_ESCAPE_MAP[0x22] = '\\"'
_ESCAPE_MAP[0x5C] = "\\\\"
_ESCAPE_MAP[0x0A] = "\\n"
_ESCAPE_TABLE = {chr(k): v for k, v in _ESCAPE_MAP.items()}

import re as _re

_NEEDS_ESCAPE = _re.compile(r'["\\\x00-\x1f]')


def escape_string(s: str) -> str:
    """jsone's escape set (jsone.ml:769-796): ``"``, ``\\``, ``\\n`` short;
    other C0 controls as uppercase ``\\u00XX``; all else raw."""
    if _NEEDS_ESCAPE.search(s) is None:
        return s
    return s.translate(_ESCAPE_MAP)


def format_float(f: float) -> str:
    """C ``%.16g`` float formatting (jsone.ml:815-819)."""
    return "%.16g" % f


def dumps_json(value: Any, minify: bool = True) -> str:
    """Serialize a JSON value with the reference encoder's byte rules.

    ``minify=True`` (the encoder default, jsone.ml:930) emits no
    whitespace; pretty mode uses 2-space indents with a space after
    ``:`` and newlines between items (jsone.ml:751-767, 839-900).
    """
    out: list[str] = []
    if minify:
        _emit_min(value, out)
    else:
        _emit_pretty(value, out, 0)
    return "".join(out)


def _emit_min(v: Any, out: list[str]) -> None:
    if v is None:
        out.append("null")
    elif v is True:
        out.append("true")
    elif v is False:
        out.append("false")
    elif isinstance(v, float):
        out.append(format_float(v))
    elif isinstance(v, int):  # tolerated on input; model normalizes to float
        out.append(format_float(float(v)))
    elif isinstance(v, str):
        out.append('"')
        out.append(escape_string(v))
        out.append('"')
    elif isinstance(v, (list, tuple)):
        # fast path for numeric leaf arrays (coordinate rows dominate
        # GeoJSON payloads); bool is an int subtype, so types must be
        # exactly float before the %.16g join
        if v and type(v[0]) is float and all(type(x) is float for x in v):
            out.append("[")
            out.append(",".join(["%.16g" % x for x in v]))
            out.append("]")
            return
        out.append("[")
        for i, item in enumerate(v):
            if i:
                out.append(",")
            _emit_min(item, out)
        out.append("]")
    elif isinstance(v, dict):
        out.append("{")
        for i, (k, item) in enumerate(v.items()):
            if i:
                out.append(",")
            out.append('"')
            out.append(escape_string(k))
            out.append('":')
            _emit_min(item, out)
        out.append("}")
    else:
        raise TypeError(f"not a JSON value: {type(v)!r}")


def _emit_pretty(v: Any, out: list[str], nest: int) -> None:
    pad = "  " * (nest + 1)
    if isinstance(v, (list, tuple)):
        if not v:
            out.append("[]")
            return
        out.append("[")
        for i, item in enumerate(v):
            out.append(",\n" if i else "\n")
            out.append(pad)
            _emit_pretty(item, out, nest + 1)
        out.append("\n")
        out.append("  " * nest)
        out.append("]")
    elif isinstance(v, dict):
        if not v:
            out.append("{}")
            return
        out.append("{")
        for i, (k, item) in enumerate(v.items()):
            out.append(",\n" if i else "\n")
            out.append(pad)
            # jsone pretty member: `"name": value` (w_name then u_sp,
            # jsone.ml:855-861)
            out.append('"')
            out.append(escape_string(k))
            out.append('": ')
            _emit_pretty(item, out, nest + 1)
        out.append("\n")
        out.append("  " * nest)
        out.append("}")
    else:
        _emit_min(v, out)


def json_equal(a: Any, b: Any) -> bool:
    """Structural JSON equality with float tolerance-free comparison,
    treating int/float encodings of the same number as equal (the
    reference model has only doubles)."""
    if isinstance(a, bool) or isinstance(b, bool):
        return a is b
    if isinstance(a, (int, float)) and isinstance(b, (int, float)):
        return float(a) == float(b)
    if isinstance(a, dict) and isinstance(b, dict):
        if len(a) != len(b):
            return False
        return all(k in b and json_equal(v, b[k]) for k, v in a.items())
    if isinstance(a, (list, tuple)) and isinstance(b, (list, tuple)):
        return len(a) == len(b) and all(json_equal(x, y) for x, y in zip(a, b))
    return a == b
