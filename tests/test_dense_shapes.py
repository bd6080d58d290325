"""Cross-batch-shape contract for the bf16 dense index.

Batched and single-row bf16 matmuls tile differently on TPU, so exactly- or
nearly-tied scores can ORDER differently between batch shapes (documented in
BASELINE.md). The contract pinned here: top-k MEMBERSHIP may differ between
batch shapes only among candidates whose exact (f32) score sits within bf16
rounding distance of the k-th score — i.e. only boundary near-ties may move,
never a clearly-in or clearly-out document.
"""

import numpy as np

from easyrag_tpu.index.dense import DenseIndex, l2_normalize

# bf16 keeps 8 mantissa bits; inputs are rounded once and accumulation is
# f32, so per-score error is a few ulps of the summand magnitudes. Scores
# here are cosines in [-1, 1]: 2**-7 absolute covers it with margin.
BF16_TOL = 2.0**-7


def test_bf16_crossshape_membership_contract():
    rng = np.random.default_rng(3)
    n, d, b, k = 512, 128, 8, 32
    matrix = l2_normalize(rng.normal(size=(n, d)).astype(np.float32))
    queries = l2_normalize(rng.normal(size=(b, d)).astype(np.float32))
    index = DenseIndex.build(matrix, dtype="bfloat16")

    _, idx_batch = index.query(queries, k)
    idx_single = np.stack(
        [index.query(queries[i : i + 1], k)[1][0] for i in range(b)]
    )

    exact = queries @ matrix.T  # f32 oracle scores
    for r in range(b):
        moved = set(idx_batch[r].tolist()) ^ set(idx_single[r].tolist())
        if not moved:
            continue
        kth = np.sort(exact[r])[::-1][k - 1]
        for i in moved:
            assert abs(exact[r, i] - kth) <= BF16_TOL, (
                f"row {r}: doc {i} moved across batch shapes but its exact "
                f"score {exact[r, i]:.6f} is not a near-tie of the k-th "
                f"{kth:.6f}"
            )


def test_bf16_crossshape_membership_with_ties():
    """Deliberately duplicated rows (exact ties straddling the k boundary):
    membership differences must still be confined to the tied band."""
    rng = np.random.default_rng(4)
    n, d, k = 256, 64, 16
    base = l2_normalize(rng.normal(size=(n // 2, d)).astype(np.float32))
    matrix = np.concatenate([base, base])  # every score appears twice
    queries = l2_normalize(rng.normal(size=(4, d)).astype(np.float32))
    index = DenseIndex.build(matrix, dtype="bfloat16")

    _, idx_batch = index.query(queries, k)
    idx_single = np.stack(
        [index.query(queries[i : i + 1], k)[1][0] for i in range(4)]
    )
    exact = queries @ matrix.T
    for r in range(4):
        moved = set(idx_batch[r].tolist()) ^ set(idx_single[r].tolist())
        kth = np.sort(exact[r])[::-1][k - 1]
        for i in moved:
            assert abs(exact[r, i] - kth) <= BF16_TOL
