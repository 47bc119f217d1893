"""Text analysis stages: language-ID, quality scoring, token counting,
document fingerprinting (core large-scale training-data operators; all
stateful setup — compiled regexes, stopword/profile tables — happens
once per actor in __init__).
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pyarrow as pa

_WORD_RE = re.compile(r"\w+", re.UNICODE)
# RE2's default \w is ASCII — tokenizers feeding ORACLE-CHECKED queries
# (LangId, QualityScore stop ratio) use this so engine/SQL parity is
# definitional, not corpus-contingent
_ASCII_WORD_RE = re.compile(r"[0-9A-Za-z_]+")


def word_char_mask(cps: np.ndarray) -> np.ndarray:
    """ASCII \\w class ([0-9A-Za-z_]) over a uint32 codepoint array —
    exactly RE2's default \\w, which is what the DuckDB oracle's
    regexp functions use."""
    return (
        ((cps >= 48) & (cps <= 57))
        | ((cps >= 65) & (cps <= 90))
        | ((cps >= 97) & (cps <= 122))
        | (cps == 95)
    )
# a BPE-ish subword splitter: runs of letters, digits, or single punct
_BPE_RE = re.compile(r"[A-Za-z]+|\d+|[^\sA-Za-z\d]")

# tiny per-language stopword profiles (n-gram heuristic langid)
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "fr": {"le", "la", "les", "de", "des", "et", "un", "une", "est", "que"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "nicht", "mit", "zu"},
    "es": {"el", "la", "los", "de", "y", "un", "una", "es", "que", "en"},
    "pt": {"o", "a", "os", "de", "e", "um", "uma", "é", "que", "em"},
    "it": {"il", "la", "gli", "di", "e", "un", "una", "è", "che", "per"},
}


class TextStats:
    """Actor-pool stage: per-document token/char/quality columns.

    Emitted columns (all SQL-mirrorable for the oracle):
      n_tokens      — whitespace-token count  (len(text.split()))
      n_words       — \\w+ match count
      n_chars_obs   — len(text)
      avg_word_len  — total word chars / word count (0 when no words)
      upper_ratio   — uppercase chars / total chars
      digit_ratio   — digit chars / total chars
    """

    def __init__(self):
        self.word = _WORD_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n_tok = np.empty(len(texts), dtype=np.int64)
        n_words = np.empty(len(texts), dtype=np.int64)
        n_chars = np.empty(len(texts), dtype=np.int64)
        awl = np.empty(len(texts), dtype=np.float64)
        upr = np.empty(len(texts), dtype=np.float64)
        dig = np.empty(len(texts), dtype=np.float64)
        for i, t in enumerate(texts):
            # one codepoint array per doc; all class tests vectorized
            # (ASCII classes — exactly RE2's \w/[A-Z]/[0-9], which is
            # what the DuckDB oracle computes; the old per-char
            # isupper()/isdigit() loop was the profile hotspot)
            cps = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            n_tok[i] = len(t.split())
            is_w = word_char_mask(cps)
            wc = int(is_w.sum())
            # \w+ match count = number of True-runs in the mask
            if len(is_w):
                nw = int(is_w[0]) + int((is_w[1:] & ~is_w[:-1]).sum())
            else:
                nw = 0
            n_words[i] = nw
            n_chars[i] = len(t)
            awl[i] = (wc / nw) if nw else 0.0
            n = len(t) or 1
            upr[i] = int(((cps >= 65) & (cps <= 90)).sum()) / n
            dig[i] = int(((cps >= 48) & (cps <= 57)).sum()) / n
        for name, arr, typ in (
            ("n_tokens", n_tok, pa.int64()),
            ("n_words", n_words, pa.int64()),
            ("n_chars_obs", n_chars, pa.int64()),
            ("avg_word_len", awl, pa.float64()),
            ("upper_ratio", upr, pa.float64()),
            ("digit_ratio", dig, pa.float64()),
        ):
            batch = batch.append_column(name, pa.array(arr, typ))
        return batch


class LangId:
    """Actor-pool stage: stopword-profile language ID (n-gram heuristic).

    Profiles are built once per actor. Emits ``lang_pred`` and
    ``lang_score`` (hit ratio of the winning profile; 'und' when no
    profile scores > 0).
    """

    def __init__(self):
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}
        self.word = _ASCII_WORD_RE  # matches the oracle's RE2 \w

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        preds, scores = [], []
        for t in texts:
            toks = [w.lower() for w in self.word.findall(t)]
            if not toks:
                preds.append("und")
                scores.append(0.0)
                continue
            best_lang, best = "und", 0.0
            for lang, prof in self.profiles.items():
                s = sum(1 for w in toks if w in prof) / len(toks)
                if s > best:
                    best_lang, best = lang, s
            preds.append(best_lang if best > 0 else "und")
            scores.append(best)
        batch = batch.append_column("lang_pred", pa.array(preds, pa.string()))
        return batch.append_column("lang_score", pa.array(scores, pa.float64()))


class QualityScore:
    """Composite quality score in [0, 1]: length band + word-shape +
    symbol penalties (deterministic; documented components so it can be
    re-derived)."""

    def __init__(self, stop_langs=("en",)):
        self.stop = frozenset().union(*(_LANG_PROFILES[l] for l in stop_langs))
        self.word = _ASCII_WORD_RE  # matches the oracle's RE2 \w

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        out = np.empty(len(texts), dtype=np.float64)
        for i, t in enumerate(texts):
            # char classes on the codepoint array with the RE2/ASCII
            # definitions the SQL oracle uses ([A-Za-z0-9], \s) —
            # definitional parity instead of corpus-contingent
            cps = np.frombuffer(t.encode("utf-32-le"), dtype=np.uint32)
            is_w = word_char_mask(cps)
            if len(is_w):
                nw = int(is_w[0]) + int((is_w[1:] & ~is_w[:-1]).sum())
            else:
                nw = 0
            n = len(t)
            if not nw or n < 10:
                out[i] = 0.0
                continue
            wc = int(is_w.sum())
            length_band = min(1.0, nw / 50.0)
            awl = wc / nw
            shape = 1.0 if 2.0 <= awl <= 12.0 else 0.3
            low = [w.lower() for w in self.word.findall(t)]
            stop_ratio = sum(1 for w in low if w in self.stop) / len(low)
            stop_term = min(1.0, stop_ratio * 4.0)
            alnum = int((((cps >= 48) & (cps <= 57))
                         | ((cps >= 65) & (cps <= 90))
                         | ((cps >= 97) & (cps <= 122))).sum())
            space = int(np.isin(cps, np.asarray(
                [9, 10, 12, 13, 32], dtype=np.uint32)).sum())
            sym = (n - alnum - space) / n
            sym_pen = 1.0 - min(1.0, sym * 3.0)
            out[i] = round(0.4 * length_band + 0.2 * shape + 0.2 * stop_term
                           + 0.2 * sym_pen, 6)
        return batch.append_column("quality", pa.array(out, pa.float64()))


class TokenCounter:
    """BPE-ish token counting: letters runs / digit runs / single
    punctuation marks (compiled once per actor)."""

    def __init__(self):
        self.bpe = _BPE_RE

    def __call__(self, batch: pa.Table) -> pa.Table:
        texts = batch["text"].to_pylist()
        n = np.asarray([len(self.bpe.findall(t)) for t in texts], dtype=np.int64)
        return batch.append_column("n_bpe_tokens", pa.array(n, pa.int64()))


def fingerprint_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Document fingerprints: md5 content hash (SQL-mirrorable:
    DuckDB md5()) + a 64-bit rolling hash over words (Karp-Rabin,
    base 1000003 mod 2^61-1, reproducible in SQL with bigint math)."""
    texts = batch[text_col].to_pylist()
    md5s = [hashlib.md5(t.encode("utf-8")).hexdigest() for t in texts]
    MOD = (1 << 61) - 1
    BASE = 1000003
    rolls = np.empty(len(texts), dtype=np.int64)
    wh_memo: dict = {}
    for i, t in enumerate(texts):
        h = 0
        for w in t.split():
            wh = wh_memo.get(w)
            if wh is None:
                wh = int(hashlib.md5(w.encode("utf-8")).hexdigest()[:15], 16)
                if len(wh_memo) < (1 << 20):
                    wh_memo[w] = wh
            h = (h * BASE + wh) % MOD
        rolls[i] = h
    batch = batch.append_column("content_md5", pa.array(md5s, pa.string()))
    return batch.append_column("rolling_hash", pa.array(rolls, pa.int64()))
