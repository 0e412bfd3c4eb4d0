"""Distributed tridiagonal solver (SPIKE algorithm) for spatially sharded
grids.

The implicit solves (classic ghost-layer step, MIZ Newton) couple the whole
latitude line; when the grid axis is sharded over a mesh the solve must be
distributed. SPIKE partitioning: with the line split into P contiguous
blocks of size m, each shard solves three *local* systems against its block
``A_j`` —

    A_j g = d_local          (particular solution)
    A_j v = b_j e_1          (left coupling spike,  b_j = lo[first])
    A_j w = c_j e_m          (right coupling spike, c_j = up[last])

so that ``x_j = g - v * y_left - w * y_right`` where ``y`` are the 2P
interface unknowns (first/last element of each block). The interface system
is tiny (2P x 2P); every shard assembles it redundantly from an
``all_gather`` of six scalars per shard and solves it densely — one
collective per solve, everything else local.

Local solves use the same row-scaled PCR as the single-chip path; the three
right-hand sides share the factorization sweep by batching.
"""
from __future__ import annotations

import jax.numpy as jnp
from jax import lax

from .tridiag import pcr_solve

__all__ = ["spike_tridiag_solve"]


def spike_tridiag_solve(lo, di, up, b, axis_name: str):
    """Solve a global tridiagonal system whose bands/rhs are sharded along
    the last axis over ``axis_name`` (call inside ``shard_map``).

    ``lo/di/up/b`` are the *local* blocks, shape ``(..., m)``; ``lo`` of the
    first global row and ``up`` of the last must be 0 (standard boundary).
    The off-block couplings are the local blocks' own first ``lo`` and last
    ``up`` entries. Returns the local block of the solution.
    """
    P = lax.psum(1, axis_name)
    j = lax.axis_index(axis_name)
    m = b.shape[-1]
    dtype = b.dtype
    batch = b.shape[:-1]

    b_cpl = lo[..., :1]  # coupling to previous block's last unknown
    c_cpl = up[..., -1:]  # coupling to next block's first unknown
    # interior bands: zero the couplings so the local system is closed
    lo_l = jnp.concatenate([jnp.zeros_like(b_cpl), lo[..., 1:]], axis=-1)
    up_l = jnp.concatenate([up[..., :-1], jnp.zeros_like(c_cpl)], axis=-1)

    # three local solves with shared bands: [particular | left spike | right spike]
    e1 = jnp.zeros(b.shape, dtype).at[..., 0].set(1.0)
    em = jnp.zeros(b.shape, dtype).at[..., -1].set(1.0)
    rhs = jnp.stack([b, b_cpl * e1, c_cpl * em], axis=-2)  # (..., 3, m)
    sol = pcr_solve(
        lo_l[..., None, :], di[..., None, :], up_l[..., None, :], rhs
    )
    g, v, w = sol[..., 0, :], sol[..., 1, :], sol[..., 2, :]

    # interface system: unknowns y = [x_first^0, x_last^0, ..., x_first^{P-1}, x_last^{P-1}]
    #   x_first = g[0]   - v[0]   y_prev_last - w[0]   y_next_first
    #   x_last  = g[m-1] - v[m-1] y_prev_last - w[m-1] y_next_first
    locals_ = jnp.stack(
        [g[..., 0], g[..., -1], v[..., 0], v[..., -1], w[..., 0], w[..., -1]],
        axis=-1,
    )  # (..., 6)
    allq = lax.all_gather(locals_, axis_name)  # (P, ..., 6)
    # move P next to the interface dimension: (..., P, 6)
    allq = jnp.moveaxis(allq, 0, -2)
    g0 = allq[..., 0]
    gm = allq[..., 1]
    v0 = allq[..., 2]
    vm = allq[..., 3]
    w0 = allq[..., 4]
    wm = allq[..., 5]

    n2 = 2 * P
    eye = jnp.eye(n2, dtype=dtype)
    M = jnp.broadcast_to(eye, batch + (n2, n2)).copy() if batch else eye
    # row 2p   (x_first^p):  + v0^p * y[2p-1] + w0^p * y[2p+2]
    # row 2p+1 (x_last^p):   + vm^p * y[2p-1] + wm^p * y[2p+2]
    rows_first = 2 * jnp.arange(P)
    rows_last = rows_first + 1
    M = M.at[..., rows_first[1:], rows_last[:-1]].add(v0[..., 1:])
    M = M.at[..., rows_last[1:], rows_last[:-1]].add(vm[..., 1:])
    M = M.at[..., rows_first[:-1], rows_first[1:]].add(w0[..., :-1])
    M = M.at[..., rows_last[:-1], rows_first[1:]].add(wm[..., :-1])
    rhs_y = jnp.stack([g0, gm], axis=-1).reshape(batch + (n2,))
    y = jnp.linalg.solve(M, rhs_y[..., None])[..., 0]

    y_prev_last = jnp.where(j > 0, y[..., jnp.maximum(2 * j - 1, 0)], 0.0)
    y_next_first = jnp.where(j < P - 1, y[..., jnp.minimum(2 * j + 2, n2 - 1)], 0.0)
    return g - v * y_prev_last[..., None] - w * y_next_first[..., None]
