"""Pallas TPU kernel: fused batched PCR tridiagonal solve.

Profiling the ensemble hot loop (BENCH_NOTES.md) shows the XLA-lowered PCR
sweeps dominating device time: each of the ~8 elimination sweeps lowers to
its own fused kernel, so every Newton iteration round-trips the ``(K, nx)``
bands through HBM ~12 times. This kernel runs the entire solve — row
scaling, all sweeps, the final divide — in VMEM in one launch.

Numerics are identical to :func:`..ops.tridiag.pcr_solve`: the grid is
padded to a lane multiple with identity rows (``di = 1``, zero off-diagonals
and rhs), which reproduces the zero-filled-shift semantics of the unpadded
solver exactly, so results match the XLA path bitwise per lane.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .pallas_newton import _pcr, default_interpret, pad_to_lanes

__all__ = ["pallas_pcr_solve"]


def _kernel(lo_ref, di_ref, up_ref, b_ref, out_ref, *, steps: int):
    out_ref[:] = _pcr(lo_ref[:], di_ref[:], up_ref[:], b_ref[:], steps)


@functools.partial(jax.jit, static_argnames=("interpret",))
def pallas_pcr_solve(lo, di, up, b, interpret: bool = False):
    """Solve batched tridiagonal systems ``(K, n)`` in one fused kernel.

    Bands may be ``(n,)`` (shared) or ``(K, n)``; the rhs fixes ``K``.
    """
    K, n = b.shape
    nxp = pad_to_lanes(n)
    dtype = b.dtype
    steps = max(1, math.ceil(math.log2(nxp)))
    Kt = min(K, 256)
    Kp = ((K + Kt - 1) // Kt) * Kt

    def pad(v, fill):
        v = jnp.broadcast_to(v, (K, n))
        return jnp.pad(v, ((0, Kp - K), (0, nxp - n)), constant_values=fill)

    args = (pad(lo, 0.0), pad(di, 1.0), pad(up, 0.0), pad(b, 0.0))
    spec = pl.BlockSpec((Kt, nxp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, steps=steps),
        grid=(Kp // Kt,),
        out_shape=jax.ShapeDtypeStruct((Kp, nxp), dtype),
        in_specs=[spec] * 4,
        out_specs=spec,
        interpret=interpret,
    )(*args)
    return out[:K, :n]
