"""Batched linear-sum-assignment (Hungarian matching) on device.

The reference ships the cost matrix to the CPU and solves per-image with
scipy's C++ Jonker-Volgenant (matcher.py:77-80) — a device->host->device
round trip in the middle of every training step. Here the square LSAP is
solved *inside* the jitted step with a JV shortest-augmenting-path
implementation built from `lax.while_loop`/`fori_loop` (static shapes,
vmapped over the batch). The per-column relaxation scan is a vector op, so
the TPU executes O(n) sequential steps of O(n) vector work per row.

Rectangular DETR matching (51 queries x T targets) is embedded in a square
matrix (see `matching_cost_pad`): dummy rows/cols carry 0 cost except
dummy-row x real-col which carries +BIG, which provably reproduces scipy's
rectangular optimum for the real entries in both the T<=Q and T>Q regimes.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_INF = jnp.float32(1e18)


def _solve_single(cost: jnp.ndarray, n_rows=None) -> jnp.ndarray:
    """JV shortest augmenting path for one square (n, n) f32 cost matrix.

    Returns row_to_col (n,) int32: the optimal column for each row.

    n_rows (traced scalar, default n) bounds the outer row loop: JV is
    incremental, so after processing rows [0, n_rows) the assignment is
    optimal for that row subset — the caller may stop early when the
    remaining rows are all-zero padding whose assignment it never reads
    (see solve_lsap docstring). Unprocessed rows' entries are garbage.
    """
    n = cost.shape[0]
    if n_rows is None:
        n_rows = n

    def solve_row(i, carry):
        # p[j]: row matched to column j (col 0 is the virtual start), -1 free.
        # u: row potentials (n + 1 slots; slot n is a scatter dump).
        # v: column potentials (n + 1).
        p, u, v = carry
        p = p.at[0].set(i)

        def search_cond(st):
            j0, it, _, _, _, p_, _, _ = st
            # `it <= n` bounds the loop: each iteration consumes one unused
            # column, so a finite cost matrix terminates in <= n+1 steps; a
            # non-finite one (e.g. transient bf16 overflow upstream) must
            # not hang inside jit — it exits here and the caller's NaN-loss
            # guard trips instead (scipy raises in the reference,
            # matcher.py:80).
            return jnp.logical_and(p_[j0] != -1, it <= n)

        def search_body(st):
            j0, it, used, minv, way, p_, u_, v_ = st
            used = used.at[j0].set(True)
            i0 = p_[j0]
            # Relax all unused real columns against row i0.
            cur = cost[i0] - u_[i0] - v_[1:]
            upd = jnp.logical_and(~used[1:], cur < minv)
            minv = jnp.where(upd, cur, minv)
            way = jnp.where(upd, j0, way)
            masked = jnp.where(used[1:], _INF, minv)
            j1 = jnp.argmin(masked).astype(jnp.int32) + 1
            delta = masked[j1 - 1]
            # Dual update: used columns' rows gain delta, their columns lose
            # it; unused columns' tentative distances shrink by delta.
            rows_hit = jnp.where(used, p_, n)
            u_ = u_.at[rows_hit].add(delta, mode="drop")
            v_ = v_ - delta * used.astype(v_.dtype)
            minv = minv - delta * (~used[1:]).astype(minv.dtype)
            return j1, it + 1, used, minv, way, p_, u_, v_

        used0 = jnp.zeros(n + 1, dtype=bool)
        minv0 = jnp.full(n, _INF)
        way0 = jnp.zeros(n, dtype=jnp.int32)
        j0, _, _, _, way, p, u, v = jax.lax.while_loop(
            search_cond, search_body,
            (jnp.int32(0), jnp.int32(0), used0, minv0, way0, p, u, v))

        # Augment along the alternating path back to the virtual column
        # (path length <= n; the same hang-proofing bound applies).
        def aug_cond(st):
            j0_, it_, _ = st
            return jnp.logical_and(j0_ != 0, it_ <= n)

        def aug_body(st):
            j0_, it_, p_ = st
            j1_ = way[j0_ - 1]
            p_ = p_.at[j0_].set(p_[j1_])
            return j1_, it_ + 1, p_

        _, _, p = jax.lax.while_loop(aug_cond, aug_body, (j0, jnp.int32(0), p))
        return p, u, v

    p0 = jnp.full(n + 1, -1, dtype=jnp.int32)
    u0 = jnp.zeros(n + 1, dtype=jnp.float32)
    v0 = jnp.zeros(n + 1, dtype=jnp.float32)
    p, _, _ = jax.lax.fori_loop(0, n_rows, solve_row, (p0, u0, v0))

    col_to_row = p[1:]
    row_to_col = jnp.zeros(n, dtype=jnp.int32)
    row_to_col = row_to_col.at[col_to_row].set(
        jnp.arange(n, dtype=jnp.int32), mode="drop")
    return row_to_col


@functools.partial(jax.jit, static_argnames=())
def solve_lsap(cost: jnp.ndarray, n_rows=None) -> jnp.ndarray:
    """Batched square LSAP. cost: (B, n, n) f32 -> row_to_col (B, n) int32.

    Gradients do not flow through the assignment (DETR semantics: the match
    is a constant of the loss).

    n_rows (optional traced scalar, shared across the batch) stops the
    serial row loop early. The JV outer loop is the whole cost of the
    on-device matcher (each row is an O(n) sequential augmenting search,
    ~8000 tiny while-iterations per train step at S=128), and DETR batches
    rarely have more than a couple dozen real targets: the criterion
    transposes the square so rows are *targets* (valid slots first) and
    passes max(last valid index)+1, cutting the loop ~10x. Exactness: after
    k rows JV's assignment is optimal for rows [0, k) x all columns, and
    the skipped rows are all-zero padding rows whose assignment the caller
    never reads (any optimum places them on zero-cost columns without
    displacing processed rows onto worse entries — total cost would rise).

    Non-finite entries are sanitized to large finite values first: a NaN/inf
    cost (transient bf16 overflow upstream) must yield SOME terminating
    assignment so the surrounding train step completes and the NaN-loss
    guard (train/loop.py) fires — never a hang inside jit. The reference's
    scipy path raises instead (matcher.py:80)."""
    cost = jax.lax.stop_gradient(cost.astype(jnp.float32))
    cost = jnp.nan_to_num(cost, nan=1e9, posinf=1e9, neginf=-1e9)
    return jax.vmap(_solve_single, in_axes=(0, None))(cost, n_rows)


def matching_cost_pad(cost: jnp.ndarray, target_valid: jnp.ndarray,
                      big: float = 100.0) -> jnp.ndarray:
    """Embed a (B, Q, T) rectangular DETR cost into a (B, S, S) square one.

    S = max(Q, T). Padding scheme (exactness argument in the module
    docstring):
      real row  x real col  -> cost
      real row  x dummy col -> 0
      dummy row x real col  -> +big   (forces real targets onto real queries)
      dummy row x dummy col -> 0

    `big` must exceed the DETR cost range (|5*L1| <= 20 plus |class| <= 1
    plus |2*giou| <= 4, so range < 28) but stay SMALL in f32 terms: when
    more targets than queries force some onto +big dummy entries, the JV
    dual potentials reach `big` scale and the solver can only resolve cost
    differences above big * 2^-23. The original 1e6 rounded away ~0.06 of
    real matching cost (measured: a 60-target/51-query instance matched
    0.034 worse than scipy); 100 keeps resolution at ~1e-5 while still
    dominating every real entry.
    """
    b, q, t = cost.shape
    s = max(q, t)
    real_row = jnp.arange(s) < q                     # (S,)
    valid_col = jnp.zeros((b, s), dtype=bool).at[:, :t].set(target_valid)
    padded = jnp.zeros((b, s, s), dtype=cost.dtype)
    padded = padded.at[:, :q, :t].set(
        jnp.where(target_valid[:, None, :], cost, 0.0))
    # dummy rows on valid columns
    dummy_row_pen = jnp.where(
        jnp.logical_and(~real_row[None, :, None], valid_col[:, None, :]),
        jnp.float32(big), 0.0)
    return padded + dummy_row_pen
