"""On-device Hungarian matcher vs scipy's C++ LSAP oracle."""

import numpy as np
import pytest
from scipy.optimize import linear_sum_assignment

import jax.numpy as jnp

from wildlifemapper_tpu.ops.lsap import matching_cost_pad, solve_lsap


def _total_cost(c, rows, cols):
    return c[rows, cols].sum()


@pytest.mark.parametrize("n", [4, 16, 51, 64])
def test_square_lsap_matches_scipy(n, rng):
    c = rng.normal(size=(8, n, n)).astype(np.float32) * 10
    got = np.asarray(solve_lsap(jnp.asarray(c)))
    for i in range(c.shape[0]):
        r, cc = linear_sum_assignment(c[i])
        want = c[i][r, cc].sum()
        have = c[i][np.arange(n), got[i]].sum()
        # assignment must be a permutation with the optimal cost
        assert len(set(got[i].tolist())) == n
        np.testing.assert_allclose(have, want, rtol=1e-5, atol=1e-4)


def test_square_lsap_with_ties(rng):
    # integer costs create massive ties; optima may differ but costs must not
    c = rng.integers(0, 3, size=(4, 32, 32)).astype(np.float32)
    got = np.asarray(solve_lsap(jnp.asarray(c)))
    for i in range(4):
        r, cc = linear_sum_assignment(c[i])
        np.testing.assert_allclose(
            c[i][np.arange(32), got[i]].sum(), c[i][r, cc].sum(), atol=1e-5)


@pytest.mark.parametrize("num_valid", [0, 1, 7, 51, 60, 64])
def test_rectangular_embedding_matches_scipy(num_valid, rng):
    """DETR regime: Q=51 queries, T=64 padded target slots, `num_valid` real
    targets — must equal scipy's rectangular optimum on the real submatrix."""
    q, t = 51, 64
    cost = rng.normal(size=(2, q, t)).astype(np.float32) * 5
    valid = np.zeros((2, t), dtype=bool)
    valid[:, :num_valid] = True

    square = matching_cost_pad(jnp.asarray(cost), jnp.asarray(valid))
    row_to_col = np.asarray(solve_lsap(square))[:, :q]

    for b in range(2):
        if num_valid == 0:
            continue
        sub = cost[b][:, :num_valid]
        r, cc = linear_sum_assignment(sub)
        want = sub[r, cc].sum()
        matched = row_to_col[b] < num_valid
        have = cost[b][np.arange(q)[matched], row_to_col[b][matched]].sum()
        assert matched.sum() == min(q, num_valid)
        np.testing.assert_allclose(have, want, rtol=1e-5, atol=1e-3)


def test_nonfinite_costs_terminate():
    """NaN/inf cost rows (e.g. transient bf16 overflow upstream) must
    produce a terminating, valid-permutation assignment — never a hang
    inside jit (the reference's scipy raises instead, matcher.py:80)."""
    rng = np.random.default_rng(3)
    cost = rng.normal(size=(4, 8, 8)).astype(np.float32)
    cost[0, 2, :] = np.nan          # full NaN row
    cost[1, :, 5] = np.inf          # inf column
    cost[2] = np.nan                # entire matrix NaN
    cost[3, 0, 0] = -np.inf
    out = np.asarray(solve_lsap(jnp.asarray(cost)))
    for b in range(4):
        assert sorted(out[b].tolist()) == list(range(8)), out[b]


def test_nonfinite_sanitization_matches_scipy_on_clean_entries():
    """After nan_to_num, the assignment equals scipy's on the sanitized
    matrix (termination AND optimality of the sanitized problem)."""
    from scipy.optimize import linear_sum_assignment

    rng = np.random.default_rng(4)
    cost = rng.normal(size=(6, 6)).astype(np.float32)
    cost[1, 3] = np.nan
    cost[4, :2] = np.inf
    sanitized = np.nan_to_num(cost, nan=1e9, posinf=1e9, neginf=-1e9)
    rows, cols = linear_sum_assignment(sanitized)
    ours = np.asarray(solve_lsap(jnp.asarray(cost)[None]))[0]
    np.testing.assert_allclose(sanitized[rows, cols].sum(),
                               sanitized[np.arange(6), ours].sum(),
                               rtol=1e-5)


def test_bounded_transposed_matching_equals_scipy_rectangular():
    """The criterion's fast path (transposed square + row loop bounded by
    the last valid index) must reproduce scipy's rectangular optimum —
    including non-prefix valid masks and the T_valid > Q regime."""
    from scipy.optimize import linear_sum_assignment

    from wildlifemapper_tpu.ops.lsap import matching_cost_pad

    rng = np.random.default_rng(5)
    for trial in range(25):
        q = int(rng.integers(2, 7))
        t = int(rng.integers(2, 12))
        b = 3
        cost = rng.normal(size=(b, q, t)).astype(np.float32)
        valid = rng.random((b, t)) < 0.6            # non-prefix holes
        if trial == 0:
            valid[:] = False                        # no targets at all
        square = np.asarray(matching_cost_pad(
            jnp.asarray(cost), jnp.asarray(valid))).transpose(0, 2, 1)
        last_valid = int(np.max(np.where(valid, np.arange(t)[None] + 1, 0)))
        t2q = np.asarray(solve_lsap(jnp.asarray(square),
                                    jnp.int32(last_valid)))
        s = square.shape[1]
        for bi in range(b):
            vidx = np.where(valid[bi])[0]
            if len(vidx) == 0:
                continue
            rect = cost[bi][:, vidx]                # (Q, T_valid)
            rows, cols = linear_sum_assignment(rect)
            want = rect[rows, cols].sum()
            got = 0.0
            n_real = 0
            for k, tgt in enumerate(vidx):
                col = t2q[bi, tgt]
                if col < q:
                    got += rect[col, k]
                    n_real += 1
            assert n_real == len(rows), (trial, bi, n_real, len(rows))
            np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5,
                                       err_msg=f"trial {trial} b={bi}")
