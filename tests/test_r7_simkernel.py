"""Shared sequential-dim kernel contract (VERDICT r6 #6): both
formulations — pairwise dots and the full gram matrix — must produce
BIT-IDENTICAL similarities for the same row pairs, because call sites
(SemDeDup pair search, k-NN gram) may disagree on which shape they use
while the oracle replays one sequential fold."""

import numpy as np

from python_cdc_component_spark.operators.llm.simkernel import (
    cosine_pairs, seq_dot_pairs, seq_gram, seq_sq_norms)


def _mat(n=37, d=19, seed=7):
    rng = np.random.RandomState(seed)
    return rng.uniform(-1, 1, size=(n, d)).astype(np.float64)


def test_gram_equals_pair_dots_bitwise():
    E = _mat()
    S, n2 = seq_gram(E)
    ia, ib = np.triu_indices(E.shape[0], 1)
    dots = seq_dot_pairs(E, ia, ib)
    assert np.array_equal(S[ia, ib], dots), \
        "gram and pairwise dots diverged — IEEE order broke"
    assert np.array_equal(n2, seq_sq_norms(E))


def test_cosine_pairs_matches_sequential_fold():
    """cosine_pairs must equal the explicit scalar sequential fold
    (the oracle's evaluation order) to the last bit."""
    E = _mat(n=12, d=23, seed=3)
    ia, ib = np.triu_indices(12, 1)
    got = cosine_pairs(E, ia, ib)
    for k in range(len(ia)):
        a, b = E[ia[k]], E[ib[k]]
        dot = 0.0
        na = 0.0
        nb = 0.0
        for i in range(E.shape[1]):
            dot += a[i] * b[i]
            na += a[i] * a[i]
            nb += b[i] * b[i]
        want = dot / (np.sqrt(na) * np.sqrt(nb))
        assert got[k] == want, (k, got[k], want)
