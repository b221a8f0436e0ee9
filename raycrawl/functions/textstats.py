"""Text analysis kernels for large-scale training-data pipelines.

Vectorized (numpy / compiled-regex) per-batch functions intended to run
inside ``map_batches``: token counting, language-ID heuristic, quality
scoring, document fingerprinting. All deterministic and seedless.

The token regex is deliberately ASCII-explicit so the DuckDB oracle
(`regexp_extract_all`) tokenizes byte-identically.
"""

from __future__ import annotations

import re

import numpy as np

# BPE-ish word/punct tokenizer — keep in sync with TOKEN_REGEX_SQL.
TOKEN_REGEX = re.compile(r"[A-Za-z0-9_]+|[^A-Za-z0-9_\s]")
TOKEN_REGEX_SQL = "[A-Za-z0-9_]+|[^A-Za-z0-9_ \\t\\n\\r]"

PUNCT_REGEX = re.compile(r"[^A-Za-z0-9\s]")

_STOPWORDS = {
    "en": {"the", "a", "of", "and", "to", "in", "is", "it", "that", "for"},
    "de": {"der", "die", "das", "und", "ist", "ein", "eine", "zu", "mit"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "de", "dans"},
    "es": {"el", "la", "los", "y", "es", "un", "una", "de", "en", "que"},
}


def token_count(text: str) -> int:
    return len(TOKEN_REGEX.findall(text))


def token_counts_batch(texts) -> np.ndarray:
    findall = TOKEN_REGEX.findall
    return np.fromiter((len(findall(t)) for t in texts), dtype=np.int64,
                       count=len(texts))


def punct_counts_batch(texts) -> np.ndarray:
    findall = PUNCT_REGEX.findall
    return np.fromiter((len(findall(t)) for t in texts), dtype=np.int64,
                       count=len(texts))


def langid(text: str) -> str:
    """N-gram-free stopword-ratio language heuristic: highest stopword
    hit-rate wins; ties broken by fixed language order; no hits -> 'und'."""
    words = text.lower().split()
    if not words:
        return "und"
    best_lang, best_hits = "und", 0
    for lang in ("en", "de", "fr", "es"):  # fixed order = deterministic ties
        hits = sum(1 for w in words if w in _STOPWORDS[lang])
        if hits > best_hits:
            best_lang, best_hits = lang, hits
    return best_lang


def quality_score(text: str) -> float:
    """Heuristic quality in [0,1]: length band + word length sanity +
    punctuation ratio (the usual pretraining-filter features)."""
    n = len(text)
    if n == 0:
        return 0.0
    words = text.split()
    n_words = len(words)
    if n_words == 0:
        return 0.0
    mean_wl = (n - (n_words - 1)) / n_words
    punct = len(PUNCT_REGEX.findall(text))
    punct_ratio = punct / n
    score = 1.0
    if n < 32 or n > 100_000:
        score *= 0.5
    if mean_wl < 2 or mean_wl > 12:
        score *= 0.5
    if punct_ratio > 0.2:
        score *= 0.5
    return round(score, 4)


_FP_BASE = np.uint64(1099511628211)
_FP_OFFSET = np.uint64(14695981039346656037)


def fingerprint(text: str) -> int:
    """FNV-1a rolling hash over the utf-8 bytes -> int64 (doc
    fingerprint for shard-stable sampling / dedup bucketing)."""
    h = _FP_OFFSET
    for b in text.encode("utf-8"):
        h = (h ^ np.uint64(b)) * _FP_BASE
    return int(h & np.uint64(0x7FFF_FFFF_FFFF_FFFF))


def fingerprints_batch(texts) -> np.ndarray:
    return np.fromiter((fingerprint(t) for t in texts), dtype=np.int64,
                       count=len(texts))
