"""Text analysis scalar functions (SURVEY.md O8 tokenizer / O12 stopwords;
reference: src/parse.cpp word scanning, etc/stopwords/*) plus the
training-data-pipeline text ops (language-ID heuristic, quality scoring,
token counting, document fingerprinting).

The tokenizer rule is pinned to be exactly reproducible in ANSI SQL
(DuckDB oracle):   tokens(text) = non-empty pieces of
``regexp_split_to_array(lower(text), '[^a-z0-9]+')``.
"""

from __future__ import annotations

import re

import numpy as np

__all__ = [
    "TOKEN_SPLIT_PATTERN",
    "tokenize",
    "token_count_many",
    "STOPWORDS_EN",
    "stopwords_for",
    "langid_scores",
    "quality_features",
    "fingerprint64",
]

TOKEN_SPLIT_PATTERN = "[^a-z0-9]+"
_SPLIT_RE = re.compile(TOKEN_SPLIT_PATTERN)

# Small fixed stopword lists (reference ships etc/stopwords/* files; these
# play the same role — broadcast once, filtered vectorized).
STOPWORDS_EN = frozenset(
    "the and of a to in is it you that he was for on are as with his they i "
    "at be this have from or one had by word but not what all were we when "
    "your can said there use an each which she do how their if".split()
)
_STOPWORDS_DE = frozenset(
    "der die das und ist in zu den von mit nicht ein eine als auch es an "
    "werden aus er hat dass sie nach wird bei um am sind noch wie einem "
    "über einen so zum".split()
)
_STOPWORDS_FR = frozenset(
    "le la les de des du et est un une dans que qui pour sur avec ne se pas "
    "plus par au il elle nous vous ils sont être cette aux ou où donc".split()
)

_LANG_STOPS = {"en": STOPWORDS_EN, "de": _STOPWORDS_DE, "fr": _STOPWORDS_FR}


def stopwords_for(lang: str | None) -> frozenset:
    """Per-language stopword list (the reference's per-charset/language
    etc/stopwords/* files, SURVEY O12): a known language gets its own
    list; unknown/missing languages fall back to English (pinned)."""
    return _LANG_STOPS.get(lang or "en", STOPWORDS_EN)


def tokenize(text: str) -> list[str]:
    """Pinned tokenizer: lowercase, split on non-[a-z0-9], drop empties."""
    return [t for t in _SPLIT_RE.split(text.lower()) if t]


def token_count_many(texts: list[str]) -> np.ndarray:
    return np.fromiter((len(tokenize(t or "")) for t in texts), dtype=np.int64, count=len(texts))


def langid_scores(text: str) -> tuple[str, float]:
    """N-gram-free stopword-overlap language heuristic over {en, de, fr}
    (the langmap-.lm role of the reference, SURVEY O7). Returns
    (best_lang, confidence = best_hits / tokens). Deterministic."""
    toks = tokenize(text)
    if not toks:
        return "und", 0.0
    best_lang, best_hits = "und", 0
    for lang in ("en", "de", "fr"):  # fixed order => deterministic ties
        hits = sum(1 for t in toks if t in _LANG_STOPS[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang, best_hits / len(toks)


def quality_features(text: str) -> tuple[int, int, float, float, float]:
    """(n_chars, n_tokens, mean_token_len, stopword_ratio, alnum_ratio) —
    the length/punctuation/stopword quality signals a training-data
    pipeline filters on."""
    n_chars = len(text)
    toks = tokenize(text)
    n_tokens = len(toks)
    if n_tokens == 0:
        return n_chars, 0, 0.0, 0.0, 0.0
    mean_len = sum(len(t) for t in toks) / n_tokens
    stop_ratio = sum(1 for t in toks if t in STOPWORDS_EN) / n_tokens
    alnum = sum(1 for c in text if c.isalnum())
    alnum_ratio = alnum / n_chars if n_chars else 0.0
    return n_chars, n_tokens, mean_len, stop_ratio, alnum_ratio


_FP_BASE = np.uint64(1099511628211)
_MASK = np.uint64(0xFFFFFFFFFFFFFFFF)


def fingerprint64(text: str) -> int:
    """Order-sensitive rolling document fingerprint over the token stream
    (polynomial rolling hash, 64-bit wraparound). int64 bit pattern."""
    h = np.uint64(0xCBF29CE484222325)
    with np.errstate(over="ignore"):
        for t in tokenize(text):
            th = np.uint64(0x9E3779B97F4A7C15)
            for b in t.encode("utf-8"):
                th = (th ^ np.uint64(b)) * _FP_BASE
            h = (h * _FP_BASE) ^ th
    v = int(h)
    return v - (1 << 64) if v >= (1 << 63) else v
