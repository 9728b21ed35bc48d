"""Exact TF-IDF index + cosine argmax matching kernel.

Formulas are the reference's, not Spark ML's (`pyspark.ml.feature.IDF` uses
``ln((N+1)/(df+1))`` — different numbers, different argmax):

* vocabulary: first-seen order over corpus docs (``utils.rs:65-78``)
* ``df(term)`` = number of docs containing the term (set per doc)
* weight(doc, term) = ``(count / len(doc_tokens)) * ln(num_docs / df)``
  — no smoothing, natural log (``utils.rs:102-104``)
* query vectors use the CORPUS vocabulary and doc-freqs; OOV terms are
  dropped from the vector but still count in the ``len(doc_tokens)``
  denominator (``utils.rs:84-117``, ``utils.rs:151-167``)
* cosine = ``dot / (doc_norm * query_norm)``, 0.0 if either norm is 0
  (``utils.rs:52-60``)
* argmax: strict ``>`` scan in doc order => ties -> LOWEST corpus index;
  all-zero scores -> index 0 (``utils.rs:169-191``)

The scoring kernel is an inverted index (term -> posting list) accumulated
with numpy — result-equivalent to the reference's brute-force scan
including tie-breaks (validated in SURVEY.md §4.3), ~70x faster.  Summation
order is term-index ascending, mirroring sprs's sorted-index sparse dot, so
floats are bit-compatible with the reference's.
"""

from __future__ import annotations

import math
from dataclasses import dataclass

import numpy as np

from .text import tokenize_and_stem


@dataclass
class TfidfIndex:
    """Posting-list (CSC-like) form of the reference's CSR doc matrix."""

    term_to_idx: dict  # term -> column index (first-seen order)
    idf: np.ndarray  # float64[num_terms], ln(num_docs / df)
    term_ptr: np.ndarray  # int64[num_terms + 1]
    post_doc: np.ndarray  # int32[nnz] doc indices, ascending within a term
    post_weight: np.ndarray  # float64[nnz]
    doc_norms: np.ndarray  # float64[num_docs]
    num_docs: int

    @property
    def num_terms(self) -> int:
        return len(self.term_to_idx)


def build_index(docs: list[str]) -> TfidfIndex:
    """Build the corpus index (reference ``build_tfidf_index``,
    ``utils.rs:62-117``).  Driver-side, ~0.6 s for the 17,772-doc KB."""
    tokenized = [tokenize_and_stem(d) for d in docs]

    term_to_idx: dict[str, int] = {}
    doc_freq: dict[str, int] = {}
    for doc in tokenized:
        for term in doc:
            if term not in term_to_idx:
                term_to_idx[term] = len(term_to_idx)
        for term in set(doc):
            doc_freq[term] = doc_freq.get(term, 0) + 1

    num_docs = len(docs)
    num_terms = len(term_to_idx)
    idf = np.zeros(num_terms, dtype=np.float64)
    for term, tidx in term_to_idx.items():
        idf[tidx] = math.log(num_docs / doc_freq[term])

    # Per-doc sparse rows, sorted by term index (sprs CSR column order), so
    # norms accumulate in the same order as the reference's sparse dot.
    rows_t: list[np.ndarray] = []
    rows_w: list[np.ndarray] = []
    doc_norms = np.zeros(num_docs, dtype=np.float64)
    for doc_idx, doc in enumerate(tokenized):
        counts: dict[str, int] = {}
        for term in doc:
            counts[term] = counts.get(term, 0) + 1
        n = len(doc)
        tidxs = np.fromiter(
            (term_to_idx[t] for t in counts), dtype=np.int64, count=len(counts)
        )
        cnts = np.fromiter(counts.values(), dtype=np.float64, count=len(counts))
        order = np.argsort(tidxs)
        tidxs = tidxs[order]
        weights = (cnts[order] / n) * idf[tidxs] if n else cnts[order]
        rows_t.append(tidxs)
        rows_w.append(weights)
        doc_norms[doc_idx] = math.sqrt(float(np.dot(weights, weights)))

    # Transpose to posting lists: for each term, (doc_idx, weight) with
    # doc_idx ascending (stable counting sort by term).
    all_t = np.concatenate(rows_t) if rows_t else np.zeros(0, dtype=np.int64)
    all_w = np.concatenate(rows_w) if rows_w else np.zeros(0, dtype=np.float64)
    all_d = np.concatenate(
        [np.full(len(r), i, dtype=np.int32) for i, r in enumerate(rows_t)]
    ) if rows_t else np.zeros(0, dtype=np.int32)
    order = np.argsort(all_t, kind="stable")  # stable => doc order preserved
    all_t = all_t[order]
    term_ptr = np.zeros(num_terms + 1, dtype=np.int64)
    np.add.at(term_ptr, all_t + 1, 1)
    term_ptr = np.cumsum(term_ptr)

    return TfidfIndex(
        term_to_idx=term_to_idx,
        idf=idf,
        term_ptr=term_ptr,
        post_doc=all_d[order],
        post_weight=all_w[order],
        doc_norms=doc_norms,
        num_docs=num_docs,
    )


def vectorize_query(index: TfidfIndex, text: str) -> tuple[np.ndarray, np.ndarray, float]:
    """Query -> (sorted term idxs, weights, norm).  OOV terms dropped from
    the vector but included in the tf denominator (``utils.rs:101-103``)."""
    tokens = tokenize_and_stem(text)
    n = len(tokens)
    if n == 0:
        return (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64), 0.0)
    counts: dict[str, int] = {}
    for t in tokens:
        counts[t] = counts.get(t, 0) + 1
    t2i = index.term_to_idx
    pairs = [(t2i[t], c) for t, c in counts.items() if t in t2i]
    if not pairs:
        return (np.zeros(0, dtype=np.int64), np.zeros(0, dtype=np.float64), 0.0)
    pairs.sort()  # term-index ascending == sprs sorted-index order
    tidxs = np.array([p[0] for p in pairs], dtype=np.int64)
    weights = (
        np.array([p[1] for p in pairs], dtype=np.float64) / n
    ) * index.idf[tidxs]
    norm = math.sqrt(float(np.dot(weights, weights)))
    return tidxs, weights, norm


def best_match_index(index: TfidfIndex, text: str) -> int:
    """Argmax doc index for one query (reference ``utils.rs:169-191``):
    strict ``>`` in doc order -> ties & all-zero both resolve to the lowest
    index (0 when nothing scores)."""
    tidxs, weights, qnorm = vectorize_query(index, text)
    if qnorm <= 0.0:
        return 0
    scores = np.zeros(index.num_docs, dtype=np.float64)
    touched: list[np.ndarray] = []
    for tidx, w in zip(tidxs, weights):
        lo, hi = index.term_ptr[tidx], index.term_ptr[tidx + 1]
        docs = index.post_doc[lo:hi]
        scores[docs] += w * index.post_weight[lo:hi]
        touched.append(docs)
    if not touched:
        return 0
    cand = np.unique(np.concatenate(touched))  # sorted ascending
    vals = scores[cand] / (index.doc_norms[cand] * qnorm)
    best = int(np.argmax(vals))  # first occurrence == lowest doc index
    if vals[best] <= 0.0:
        return 0
    return int(cand[best])


def best_match_indices(index: TfidfIndex, texts: list[str]) -> list[int]:
    """Vectorized batch form of :func:`best_match_index` sharing one scores
    buffer (reset via touched set, not reallocation)."""
    scores = np.zeros(index.num_docs, dtype=np.float64)
    out: list[int] = []
    for text in texts:
        tidxs, weights, qnorm = vectorize_query(index, text)
        if qnorm <= 0.0:
            out.append(0)
            continue
        touched: list[np.ndarray] = []
        for tidx, w in zip(tidxs, weights):
            lo, hi = index.term_ptr[tidx], index.term_ptr[tidx + 1]
            docs = index.post_doc[lo:hi]
            scores[docs] += w * index.post_weight[lo:hi]
            touched.append(docs)
        if not touched:
            out.append(0)
            continue
        cand = np.unique(np.concatenate(touched))
        vals = scores[cand] / (index.doc_norms[cand] * qnorm)
        best = int(np.argmax(vals))
        out.append(int(cand[best]) if vals[best] > 0.0 else 0)
        scores[cand] = 0.0
    return out
