"""Pin the GEMM-form k-means/encode against the subtract-square
formulation it replaced (r13; ADVICE r13 #2).

The r13 rewrite of ``train_pq_codebooks`` / ``_pq_encode_mat`` switched
per-iteration distances to GEMM-form ``||a||^2 - 2ab + ||b||^2`` and
cluster means to bincount accumulation. Equality was verified manually;
this test pins it: a reference implementation using the ORIGINAL
broadcast (n, k, d) subtract-square distances and boolean-mask means
must produce BIT-identical codebooks and codes on a fixed seed/fixture.
FP argmin near-ties or a summation-order drift would fail here before
an oracle ever sees it.
"""

import numpy as np
import pytest

from flink_examples_spark.operators.similarity import (
    _pq_encode_mat,
    train_pq_codebooks,
)


def _reference_books(x, m, n_codes, n_iter, seed):
    """The pre-r13 trainer loop: broadcast subtract-square distances +
    per-centroid boolean-mask means."""
    x = x / np.linalg.norm(x, axis=1, keepdims=True)
    dim = x.shape[1]
    d_sub = dim // m
    rng = np.random.default_rng(seed)
    books = np.empty((m, n_codes, d_sub), dtype=np.float64)
    for s in range(m):
        sub = x[:, s * d_sub:(s + 1) * d_sub]
        cent = sub[
            rng.choice(len(sub), size=min(n_codes, len(sub)), replace=False)
        ].copy()
        for _ in range(n_iter):
            diff = sub[:, None, :] - cent[None, :, :]
            d2 = (diff * diff).sum(axis=2)
            assign = np.argmin(d2, axis=1)
            for c in range(len(cent)):
                mask = assign == c
                if mask.any():
                    cent[c] = sub[mask].mean(axis=0)
        books[s, : len(cent)] = cent
        if len(cent) < n_codes:
            books[s, len(cent):] = cent[0]
    return books


def _reference_codes(x, books):
    m, _, d_sub = books.shape
    codes = np.empty((x.shape[0], m), dtype=np.int64)
    for s in range(m):
        sub = x[:, s * d_sub:(s + 1) * d_sub]
        diff = sub[:, None, :] - books[s][None, :, :]
        codes[:, s] = np.argmin((diff * diff).sum(axis=2), axis=1)
    return codes


def _fixture_mat(n, dim, seed=7):
    rng = np.random.default_rng(seed)
    # clustered + a few exact-duplicate rows so argmin ties genuinely
    # occur (identical rows MUST pick identical centroids either way)
    centers = rng.normal(size=(8, dim))
    x = centers[rng.integers(0, 8, size=n)] + 0.05 * rng.normal(
        size=(n, dim)
    )
    x[10] = x[3]
    x[17] = x[3]
    return x


@pytest.mark.parametrize("m,n_codes", [(8, 16), (16, 64), (4, 8)])
def test_trainer_matches_subtract_square_form(spark, m, n_codes):
    x = _fixture_mat(300, 64)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    got = train_pq_codebooks(
        df, m=m, n_codes=n_codes, n_train=300, n_iter=10, seed=42
    )
    want = _reference_books(x, m=m, n_codes=n_codes, n_iter=10, seed=42)
    assert np.array_equal(got, want), (
        "GEMM-form trainer diverged from subtract-square reference"
    )


@pytest.mark.parametrize("m,n_codes", [(8, 16), (16, 64)])
def test_encode_matches_subtract_square_form(spark, m, n_codes):
    x = _fixture_mat(300, 64, seed=11)
    xn = x / np.linalg.norm(x, axis=1, keepdims=True)
    df = spark.createDataFrame(
        [(i, [float(v) for v in row]) for i, row in enumerate(x)],
        "vec_id long, embedding array<double>",
    )
    books = train_pq_codebooks(
        df, m=m, n_codes=n_codes, n_train=300, n_iter=5, seed=42
    )
    got = _pq_encode_mat(xn, books)
    want = _reference_codes(xn, books)
    assert np.array_equal(got, want), (
        "GEMM-form encoder diverged from subtract-square reference"
    )
