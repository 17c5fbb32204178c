"""Text kernels: tokenization, n-grams, rule measurements, scrubbing.

These are the graft analogues of the reference's per-record feature/artifact
kernels (eeg_features.py:18-40 count_muscle_artifacts, :42-71
spectral_features) re-expressed over transcripts, plus the regex scrub
surface required by the north rule. Every kernel is pure and shared verbatim
between the Ray stages and the single-process oracle, so distributed and
oracle runs agree byte-for-byte (SURVEY.md §7.4 "scrubber exactness").

Scrub patterns are RE2-compatible (no lookbehind/backrefs) so the DuckDB
oracle can reproduce them with ``regexp_replace(..., 'g')`` exactly.
"""

from __future__ import annotations

import re

import numpy as np

from data_quality_ray.synth.corpora import (
    EMAIL_MASK,
    ID_MASK,
    PHONE_MASK,
    TOX_MASK,
    TOXIC_LEXICON,
)

# ---------------------------------------------------------------------------
# Tokenization
# ---------------------------------------------------------------------------

WS_RE = re.compile(r"\s+")
# BPE-ish pretokenizer (GPT-2 style, simplified to RE2-compatible syntax):
# word pieces, numbers, punctuation runs.
BPE_RE = re.compile(r"[A-Za-zÀ-ÿ]+|[0-9]+|[^\sA-Za-zÀ-ÿ0-9]+")


def ws_tokens(text: str) -> list[str]:
    t = text.strip()
    return WS_RE.split(t) if t else []


def bpe_tokens(text: str) -> list[str]:
    return BPE_RE.findall(text)


# ---------------------------------------------------------------------------
# Rule measurements (vectorized over a list/array of strings)
# ---------------------------------------------------------------------------

_SYMBOL_RE = re.compile(r"[^0-9A-Za-zÀ-ÿ\s]")
_DIGIT_RE = re.compile(r"[0-9]")


def symbol_counts(texts: list[str]) -> np.ndarray:
    """Count of punctuation/symbol/digit chars per text (int)."""
    out = np.empty(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        out[i] = len(_SYMBOL_RE.findall(t)) + len(_DIGIT_RE.findall(t))
    return out


def symbol_density(texts: list[str]) -> np.ndarray:
    """Fraction of chars that are punctuation/symbols/digits."""
    counts = symbol_counts(texts)
    lens = char_lengths(texts)
    return np.where(lens > 0, counts / np.maximum(lens, 1), 1.0)


def repetition_ratio(texts: list[str]) -> np.ndarray:
    """1 − (distinct tokens / total tokens): 0 = all distinct, →1 = one loop.

    Graft analogue of the artifact counter (eeg_features.py:18-40): a cheap
    per-record "how much of this is the same thing over and over" measure.
    Calibrated: clean synthetic text ≤ ~0.35, looped text ≥ ~0.75.
    """
    out = np.empty(len(texts), dtype=np.float64)
    for i, t in enumerate(texts):
        toks = ws_tokens(t.lower())
        if len(toks) < 4:
            out[i] = 0.0
            continue
        out[i] = 1.0 - len(set(toks)) / len(toks)
    return out


def char_lengths(texts: list[str]) -> np.ndarray:
    return np.fromiter((len(t) for t in texts), dtype=np.int64, count=len(texts))


# ---------------------------------------------------------------------------
# PII / toxicity scrub (ordered, idempotent, RE2-compatible)
# ---------------------------------------------------------------------------

EMAIL_RE_STR = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PHONE_RE_STR = r"\+[0-9]{1,2} [0-9]{3}-[0-9]{3}-[0-9]{4}"
ID_RE_STR = r"\b[0-9]{3}-[0-9]{2}-[0-9]{4}\b"
# longest-first alternation so python re (leftmost-first) and RE2 agree
TOX_RE_STR = r"\b(?:" + "|".join(sorted(TOXIC_LEXICON, key=len, reverse=True)) + r")\b"

_EMAIL_RE = re.compile(EMAIL_RE_STR)
_PHONE_RE = re.compile(PHONE_RE_STR)
_ID_RE = re.compile(ID_RE_STR)
_TOX_RE = re.compile(TOX_RE_STR, re.IGNORECASE)

# Fixed, total order of scrub rules — (name, compiled, replacement, sql_pattern)
SCRUB_RULES: list[tuple[str, re.Pattern, str, str]] = [
    ("email", _EMAIL_RE, EMAIL_MASK, EMAIL_RE_STR),
    ("phone", _PHONE_RE, PHONE_MASK, PHONE_RE_STR),
    ("id", _ID_RE, ID_MASK, ID_RE_STR),
    ("tox", _TOX_RE, TOX_MASK, TOX_RE_STR),
]


# "does ANY rule match" prefilter: one scan decides whether a row needs the
# ordered 4-pass rewrite at all (most corpus rows are clean). Scoped (?i:)
# keeps the tox branch case-insensitive without affecting the PII branches.
ANY_SCRUB_RE = re.compile(
    "|".join([EMAIL_RE_STR, PHONE_RE_STR, ID_RE_STR, f"(?i:{TOX_RE_STR})"])
)


def scrub_one(text: str) -> tuple[str, bool, bool]:
    """Apply all scrub rules in order. Returns (scrubbed, had_pii, had_tox)."""
    had_pii = False
    for name, pat, mask, _ in SCRUB_RULES[:3]:
        text, n = pat.subn(mask, text)
        had_pii = had_pii or n > 0
    text, n_tox = _TOX_RE.subn(TOX_MASK, text)
    return text, had_pii, n_tox > 0


def scrub_sql_expr(col: str) -> str:
    """DuckDB expression equivalent to :func:`scrub_one` on column ``col``."""
    expr = col
    for name, _, mask, pat in SCRUB_RULES[:3]:
        expr = f"regexp_replace({expr}, '{pat}', '{mask}', 'g')"
    # RE2 case-insensitive flag for the toxicity alternation
    expr = f"regexp_replace({expr}, '(?i){TOX_RE_STR}', '{TOX_MASK}', 'g')"
    return expr


# ---------------------------------------------------------------------------
# Fingerprinting
# ---------------------------------------------------------------------------


def normalize_for_fingerprint(text: str) -> str:
    """Lowercase + whitespace-collapse normalization (SQL-reproducible)."""
    return WS_RE.sub(" ", text.strip()).lower()
