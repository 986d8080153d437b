"""Shared Arrow-side cosine-similarity kernel primitives (VERDICT r6
#6): the sequential-dimension accumulation discipline, extracted so
every ``applyInPandas`` similarity kernel (SemDeDup's per-cluster pair
search, the k-NN join's per-cell gram matrix, and any future verify
stage) shares ONE implementation of the float contract instead of
re-deriving it.

BIT-EXACTNESS CONTRACT (the reason these helpers exist — do not
"optimize" them into single BLAS calls):

Every accumulation over vector DIMENSIONS runs as an explicit Python
loop over ``d`` — ``acc = 0.0; acc += x_0·y_0; acc += x_1·y_1; …`` —
vectorized ACROSS pairs/rows but sequential WITHIN a vector. That is
the exact IEEE-754 evaluation order of

* the DuckDB oracle's sequential HOF fold
  (``list_sum(list_zip … x*y)`` / ``aggregate(zip_with(a, b, …))``),
* the JVM ``F.aggregate``/``F.zip_with`` formulation these kernels
  replace above the Arrow threshold,

so a query may switch between the JVM expression path and the Arrow
kernel path (adaptive thresholds do) without a single ULP of drift —
the property the cross-path parity tests pin. A BLAS dot (pairwise/
blocked summation) would be faster and *almost always* round the same,
and the oracle gate would flicker on the documents where it doesn't.

All helpers take a float64 matrix ``E`` of shape (n, dim); rows are
vectors.
"""

from __future__ import annotations

import numpy as np


def seq_sq_norms(E: np.ndarray) -> np.ndarray:
    """Per-row squared norms, dim-sequential: 0 + x0² + x1² + …"""
    n2 = np.zeros(E.shape[0])
    for i in range(E.shape[1]):
        col = E[:, i]
        n2 += col * col
    return n2


def seq_dot_pairs(E: np.ndarray, ia: np.ndarray,
                  ib: np.ndarray) -> np.ndarray:
    """Dot products of the row pairs (ia[k], ib[k]), dim-sequential and
    vectorized across pairs."""
    acc = np.zeros(len(ia))
    for i in range(E.shape[1]):
        col = E[:, i]
        acc += col[ia] * col[ib]
    return acc


def seq_gram(E: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(full n×n gram matrix, per-row squared norms), both accumulated
    dim-sequentially in one pass — the per-cell k-NN shape, where every
    row needs every other row anyway."""
    n = E.shape[0]
    S = np.zeros((n, n))
    n2 = np.zeros(n)
    for i in range(E.shape[1]):
        col = E[:, i]
        S += col[:, None] * col[None, :]
        n2 += col * col
    return S, n2


def cosine_pairs(E: np.ndarray, ia: np.ndarray,
                 ib: np.ndarray) -> np.ndarray:
    """Cosine of the row pairs (ia[k], ib[k]) under the sequential-dim
    contract: dot / (‖a‖·‖b‖), norms from :func:`seq_sq_norms`."""
    nr = np.sqrt(seq_sq_norms(E))
    return seq_dot_pairs(E, ia, ib) / (nr[ia] * nr[ib])
