from .stemmer import stem
from .text import ascii_lower, tokenize, tokenize_and_stem
from .tfidf import TfidfIndex, build_index, best_match_index, best_match_indices, vectorize_query

__all__ = [
    "stem",
    "ascii_lower",
    "tokenize",
    "tokenize_and_stem",
    "TfidfIndex",
    "build_index",
    "best_match_index",
    "best_match_indices",
    "vectorize_query",
]
