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


_HEX = set("0123456789abcdefABCDEF")
_VALID_ESC = set('"\\/bfnrtu')


def recover_json_text(text: str) -> str:
    """Lexical error recovery mirroring the reference's streaming lexer
    (src/geojsone/vendor/jsone/jsone.ml): inside string literals,

    - an invalid escape (``\\q``) splices U+FFFD and continues, both
      chars consumed (jsone.ml:390-397 ``r_escape`` default branch);
    - a raw C0 control char splices U+FFFD (jsone.ml:416-420);
    - ``\\u`` with a non-hex digit splices U+FFFD and consumes the
      offending char — even a closing quote — discarding the partial
      value (jsone.ml:327-342);
    - a lone low surrogate splices U+FFFD (jsone.ml:353);
    - a high surrogate not followed by ``\\uDC00-\\uDFFF`` splices
      U+FFFD; when the low half is present but out of range, only
      U+FFFD is emitted and the decoded half is discarded
      (jsone.ml:345-362).

    Valid ``\\uXXXX`` of a NON-surrogate decodes to its scalar — here we
    deliberately follow upstream jsonm / the reference's DOM engine
    (ezjsone + real jsonm in test/geojson), not the vendored effects
    port's quirk at jsone.ml:352-353 which would turn every such escape
    into U+FFFD; no reference test pins that branch, and following it
    would corrupt ordinary escapes in otherwise-recoverable documents.

    The output is strict JSON *at the lexical level*; structural errors
    (unexpected values, unclosed containers) remain — the reference
    aborts on those too (ezjsone.ml:57-59 raises on the first Error
    lexeme). Callers re-parse the repaired text and fall back to the
    original strict error if it still fails.
    """
    out = []
    push = out.append
    i = 0
    n = len(text)
    in_str = False
    while i < n:
        c = text[i]
        if not in_str:
            push(c)
            if c == '"':
                in_str = True
            i += 1
            continue
        # inside a string literal
        if c == '"':
            push(c)
            in_str = False
            i += 1
        elif ord(c) < 0x20:
            push("�")
            i += 1
        elif c == "\\":
            if i + 1 >= n:
                push("�")  # r_escape at EOI: default branch
                i = n
                break
            e = text[i + 1]
            if e != "u":
                if e in _VALID_ESC:
                    push(c)
                    push(e)
                else:
                    push("�")
                i += 2
            else:
                u, j = _scan_u_hex(text, i + 2)
                if u is None:
                    push("�")
                    i = j
                elif u < 0xD800 or u > 0xDFFF:
                    push(text[i : j])  # keep the valid escape verbatim
                    i = j
                elif u > 0xDBFF:
                    push("�")  # lone low surrogate
                    i = j
                else:  # high surrogate: need \uDC00-\uDFFF next
                    if j < n and text[j] == "\\":
                        j += 1  # backslash consumed (jsone.ml:356)
                        if j < n and text[j] == "u":
                            u2, j2 = _scan_u_hex(text, j + 1)
                            if u2 is not None and 0xDC00 <= u2 <= 0xDFFF:
                                push(text[i : j2])  # valid pair verbatim
                            else:
                                push("�")  # half(s) discarded
                            i = j2
                        else:
                            push("�")  # next char NOT consumed
                            i = j
                    else:
                        push("�")  # next char NOT consumed
                        i = j
        else:
            push(c)
            i += 1
    return "".join(out)


def _scan_u_hex(text: str, i: int):
    """Scan 4 hex digits at ``text[i:]``. → (value, next_index) on
    success; (None, next_index) on a non-hex digit, where next_index
    consumes the digits seen PLUS the offending char (jsone.ml:330-342:
    error → baddc u_rep → readc)."""
    n = len(text)
    u = 0
    for k in range(4):
        if i + k >= n:
            return None, n
        c = text[i + k]
        if c not in _HEX:
            return None, i + k + 1
        u = u * 16 + int(c, 16)
    return u, i + 4


def loads_json_recovering(text: str | bytes):
    """→ (value, recovered). Strict parse first (the hot path); on
    failure, one recovery pass over the text (see recover_json_text),
    re-raising the ORIGINAL strict error if the repaired text still
    doesn't parse (structural errors are not recoverable — matching
    ezjsone.ml:57-59 aborting on the first Error lexeme)."""
    if isinstance(text, (bytes, bytearray)):
        text = decode_transport(bytes(text))
    try:
        return json.loads(text, parse_constant=_reject_constant), False
    except ValueError as e:
        orig = e
    try:
        return (
            json.loads(recover_json_text(text), parse_constant=_reject_constant),
            True,
        )
    except ValueError:
        raise orig from None


# valid UTF-8 FIRST bytes (uutfe.ml's utf_8_len table, nonzero rows):
# ASCII, C2-DF, E0-EF, F0-F4
_UTF8_STARTER = bytearray(256)
for _b in list(range(0x80)) + list(range(0xC2, 0xF5)):
    _UTF8_STARTER[_b] = 1


def decode_transport(data: bytes) -> str:
    """UTF transport decode with BOM sniffing, BOM-less UTF-16
    guessing, and U+FFFD replacement.

    Reference: uutfe.ml:414-430 (r_encoding) guesses from ≤3 bytes:
    the three BOMs; then ``00 p`` → UTF-16BE and ``p 00`` → UTF-16LE
    (an ASCII-leading BOM-less UTF-16 text — every JSON doc starts
    ASCII); then any valid UTF-8 first byte → UTF-8; any other 2-byte
    prefix → UTF-16BE. Malformed sequences become U+FFFD (uutfe.ml:35)
    rather than failing.
    """
    if data[:3] == b"\xef\xbb\xbf":
        return data[3:].decode("utf-8", errors="replace")
    if data[:2] == b"\xfe\xff":
        return data[2:].decode("utf-16-be", errors="replace")
    if data[:2] == b"\xff\xfe":
        return data[2:].decode("utf-16-le", errors="replace")
    if len(data) >= 2:
        if data[0] == 0 and data[1] > 0:
            return data.decode("utf-16-be", errors="replace")
        if data[0] > 0 and data[1] == 0:
            return data.decode("utf-16-le", errors="replace")
        if not _UTF8_STARTER[data[0]]:
            return data.decode("utf-16-be", errors="replace")
    return data.decode("utf-8", errors="replace")


_ENCODINGS = {
    "utf-8": ("utf-8", b"\xef\xbb\xbf"),
    "utf-16-be": ("utf-16-be", b"\xfe\xff"),
    "utf-16-le": ("utf-16-le", b"\xff\xfe"),
}


def encode_transport(text: str, encoding: str = "utf-8",
                     bom: bool = False) -> bytes:
    """UTF transport encode — the encoder side of uutfe (the reference
    can EMIT UTF-16, not just read it: uutfe.ml:1040+ encode_utf_8 /
    encode_utf_16be / encode_utf_16le emit scalar values byte-by-byte;
    UTF-16 supplementary planes as surrogate pairs, which is exactly
    the standard codec behavior). As in Uutf, the encoder never writes
    a BOM on its own — ``bom=True`` prepends the mark explicitly, and
    ``decode_transport`` round-trips all six (encoding × bom) forms.
    """
    try:
        codec, mark = _ENCODINGS[encoding]
    except KeyError:
        raise ValueError(f"unsupported transport encoding: {encoding!r}")
    out = text.encode(codec)
    return mark + out if bom else out


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
