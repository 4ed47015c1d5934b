"""Embedding retrieval: the faiss-replacement top-k inner-product search.

The reference retrieves prompt modifiers and image styles/media via
faiss-cpu flat inner-product indices over <=400x768 embedding matrices
(reference utils/embedding_index.py:1-41, prompt.py:55-68,
utils/anvil_utils.py:75-95).  At this scale an exact matmul top-k is faster
than any ANN structure; on TPU it is one MXU call (SURVEY.md §2 native-code
statement).  A C++ SIMD implementation (runtime/native) provides the
host-side path when JAX dispatch overhead matters; both produce identical
results.
"""

from __future__ import annotations

import functools
import os
from typing import Optional, Tuple

import numpy as np


class EmbeddingIndex:
    """Exact inner-product top-k over a (N, D) embedding matrix."""

    def __init__(self, embeddings: np.ndarray, use_native: bool = True):
        self.embeddings = np.ascontiguousarray(embeddings, dtype=np.float32)
        self._native = _load_native() if use_native else None

    @staticmethod
    def from_npy(path: str, use_native: bool = True) -> "EmbeddingIndex":
        return EmbeddingIndex(np.load(path), use_native=use_native)

    def search(self, queries: np.ndarray, k: int) -> Tuple[np.ndarray, np.ndarray]:
        """(Q, D) queries -> (scores (Q,k), indices (Q,k)), descending —
        faiss `index.search` signature (reference embedding_index.py:37-41)."""
        queries = np.ascontiguousarray(queries, dtype=np.float32)
        if queries.ndim == 1:
            queries = queries[None]
        k = min(k, self.embeddings.shape[0])
        if self._native is not None:
            return self._native(queries, self.embeddings, k)
        scores = queries @ self.embeddings.T
        idx = np.argpartition(-scores, kth=k - 1, axis=1)[:, :k]
        part = np.take_along_axis(scores, idx, axis=1)
        order = np.argsort(-part, axis=1)
        idx = np.take_along_axis(idx, order, axis=1)
        return np.take_along_axis(scores, idx, axis=1), idx


@functools.lru_cache()
def _native_lib():
    import ctypes

    path = os.path.join(
        os.path.dirname(__file__), "..", "runtime", "native", "libipindex.so"
    )
    if not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.ip_topk.restype = None
    lib.ip_topk.argtypes = [
        ctypes.POINTER(ctypes.c_float),  # queries (Q, D)
        ctypes.POINTER(ctypes.c_float),  # base (N, D)
        ctypes.c_int,  # Q
        ctypes.c_int,  # N
        ctypes.c_int,  # D
        ctypes.c_int,  # k
        ctypes.POINTER(ctypes.c_float),  # out scores (Q, k)
        ctypes.POINTER(ctypes.c_int),  # out indices (Q, k)
    ]
    return lib


def _load_native():
    lib = _native_lib()
    if lib is None:
        return None
    import ctypes

    def search(queries, base, k):
        q, d = queries.shape
        n = base.shape[0]
        scores = np.empty((q, k), np.float32)
        idx = np.empty((q, k), np.int32)
        lib.ip_topk(
            queries.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            base.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            q, n, d, k,
            scores.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            idx.ctypes.data_as(ctypes.POINTER(ctypes.c_int)),
        )
        return scores, idx.astype(np.int64)

    return search


def build_embedding_index(
    embeddings: np.ndarray, save_path: Optional[str] = None
) -> EmbeddingIndex:
    """Reference `build_embedding_index` analog (embedding_index.py:6-29):
    here an index is just the L2-contiguous matrix; persist as .npy."""
    index = EmbeddingIndex(embeddings)
    if save_path:
        np.save(save_path, index.embeddings)
    return index
