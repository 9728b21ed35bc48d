r"""Tokenization primitives matching the reference's semantics.

Reference: ``src/utils.rs:16`` (``Regex::new(r"\w+")``, Rust Unicode ``\w``)
and ``src/utils.rs:43-50`` (per-token ``to_ascii_lowercase`` then Snowball
English stem).  Python ``re``'s ``\w`` is Unicode-aware like Rust's, unlike
Java's default — which is why exactness-gated paths tokenize in Python
(SURVEY.md §2.2-M1) while pure-Spark text analytics may use
``F.regexp_extract_all`` (ASCII inputs are identical either way).
"""

from __future__ import annotations

import re
from functools import lru_cache

from .stemmer import stem

_TOKEN_RE = re.compile(r"\w+")

_ASCII_LOWER = {c: c.lower() for c in "ABCDEFGHIJKLMNOPQRSTUVWXYZ"}
_ASCII_LOWER_TRANS = str.maketrans(_ASCII_LOWER)


def ascii_lower(s: str) -> str:
    """ASCII-only lowercase, mirroring Rust ``to_ascii_lowercase``
    (non-ASCII letters are left untouched)."""
    return s.translate(_ASCII_LOWER_TRANS)


def tokenize(text: str) -> list[str]:
    """``\\w+`` find-all, each token ASCII-lowercased."""
    return [ascii_lower(t) for t in _TOKEN_RE.findall(text)]


@lru_cache(maxsize=65536)
def _stem_cached(token: str) -> str:
    return stem(token)


def tokenize_and_stem(text: str) -> list[str]:
    """Tokenize then Snowball-English-stem each token
    (reference ``utils.rs:43-50``)."""
    return [_stem_cached(t) for t in tokenize(text)]
