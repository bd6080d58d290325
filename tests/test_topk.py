"""Exactness of ``topk_desc_reference_order`` across its three internal
paths (single-stage, two-stage chunked, chunk-max pruned), including
adversarial ties — the policy is ``argsort(kind="stable")[::-1]``:
descending value, ties by descending index.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from easyrag_tpu.ops.topk import _PRUNE_CH, topk_desc_reference_order


def _oracle(scores: np.ndarray, k: int):
    order = np.argsort(scores, axis=-1, kind="stable")[..., ::-1][..., :k]
    vals = np.take_along_axis(scores, order, axis=-1)
    return vals, order


@pytest.mark.parametrize(
    "n,k",
    [
        (64, 9),  # single-stage
        (8192, 300),  # two-stage chunked (pruning not profitable)
        (8192, 288),  # chunk-max pruned
        (20000, 288),  # the bench operating point (pruned)
        (4096, 17),  # pruned, tiny k
    ],
)
def test_paths_match_stable_argsort_oracle(n, k):
    rng = np.random.default_rng(n + k)
    cases = {
        "random": rng.normal(size=(5, n)).astype(np.float32),
        # heavy exact ties: a handful of distinct values
        "tied": rng.choice(
            np.array([-1.0, 0.0, 0.5, 2.0], np.float32), size=(5, n)
        ),
        # constant rows: every element ties
        "constant": np.full((2, n), 3.25, np.float32),
    }
    # -inf rows (the score<=0 drop) and a full -inf row
    inf = rng.normal(size=(3, n)).astype(np.float32)
    inf[inf < 0.5] = -np.inf
    inf[2] = -np.inf
    cases["neg_inf"] = inf
    for name, arr in cases.items():
        v, i = topk_desc_reference_order(jnp.asarray(arr), k)
        ev, ei = _oracle(arr, k)
        np.testing.assert_array_equal(np.asarray(v), ev, err_msg=name)
        np.testing.assert_array_equal(np.asarray(i), ei, err_msg=name)


def test_pruned_path_is_selected_at_bench_point():
    # guard: the operating-point shapes actually take the pruned path
    n, k = 20000, 288
    assert n % _PRUNE_CH == 0 and k <= n // _PRUNE_CH and 2 * k * _PRUNE_CH <= n


def test_k_larger_than_n_clamps():
    arr = np.array([[3.0, 1.0, 2.0]], np.float32)
    v, i = topk_desc_reference_order(jnp.asarray(arr), 10)
    np.testing.assert_array_equal(np.asarray(v), [[3.0, 2.0, 1.0]])
    np.testing.assert_array_equal(np.asarray(i), [[0, 2, 1]])
