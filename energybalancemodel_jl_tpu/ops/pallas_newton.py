"""Pallas TPU kernel: fused Newton solve of the MIZ surface-temperature
equation for a batch of ensemble members.

The XLA path (:func:`..models.miz.solve_T0`) runs Newton as a
``lax.while_loop``; every iteration's intermediates (residual, Jacobian
bands, PCR sweeps) round-trip through HBM between fused kernels. This kernel
keeps the entire iteration state in VMEM: for a ``(B, nxp)`` tile it
evaluates the residual, assembles the tridiagonal Jacobian, solves it by
parallel cyclic reduction (log2(nxp) fully-vectorized sweeps along the lane
axis), applies the clipped update, and repeats for a fixed number of
iterations — one kernel launch, one HBM read and one write of the batch.

Layout: members on sublanes, grid cells on lanes; ``nx`` is padded to a lane
multiple (128) with identity rows (zero stencil bands, ``h = hmin``), so the
padded columns decouple and are discarded by the caller.

Semantics: fixed iteration count (no convergence test — converged lanes take
Newton steps of ~0 and stay put), float32. Warm-started from the scan carry
like the XLA path; used as the ``solver='pallas'`` fast path for throughput
configs. Residual/Jacobian formulas mirror ``T0eq``
(/root/reference/src/miz.jl:33-45).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["pallas_solve_T0", "pad_to_lanes", "default_interpret"]

LANES = 128


def default_interpret() -> bool:
    """Run the kernel in interpreter mode off-TPU (CPU tests/virtual mesh)."""
    return jax.default_backend() != "tpu"


def pad_to_lanes(n: int) -> int:
    return ((n + LANES - 1) // LANES) * LANES


def _shift_lane(v, s):
    """Shift along the last (lane) axis with zero fill; static ``s``."""
    n = v.shape[-1]
    if s == 0 or abs(s) >= n:
        return jnp.zeros_like(v) if abs(s) >= n else v
    pad = [(0, 0)] * (v.ndim - 1)
    if s > 0:
        return jnp.pad(v, pad + [(s, 0)])[..., :n]
    return jnp.pad(v, pad + [(0, -s)])[..., -n:]


def _pcr(lo, di, up, b, steps):
    """Row-scaled parallel cyclic reduction (same scheme as
    :func:`..ops.tridiag.pcr_solve`, inlined for the kernel)."""
    one = jnp.ones((), dtype=b.dtype)
    inv = one / di
    lo = lo * inv
    up = up * inv
    b = b * inv
    di = jnp.ones_like(di)

    def shift_di(d, s):
        shifted = _shift_lane(d, s)
        mask = _shift_lane(jnp.ones_like(d), s)
        return shifted + (one - mask)

    def safe_div(num, den):
        return jnp.where(den == 0, jnp.zeros_like(num), num / jnp.where(den == 0, one, den))

    s = 1
    for _ in range(steps):
        di_m = shift_di(di, s)
        di_p = shift_di(di, -s)
        alpha = safe_div(-lo, di_m)
        beta = safe_div(-up, di_p)
        b = b + alpha * _shift_lane(b, s) + beta * _shift_lane(b, -s)
        di = di + alpha * _shift_lane(up, s) + beta * _shift_lane(lo, -s)
        lo = alpha * _shift_lane(lo, s)
        up = beta * _shift_lane(up, -s)
        s *= 2
    return b / di


def _kernel(
    scal_ref,  # SMEM (8,): k, Tm, A, B, ai, f, max_step, n_pad_cols(unused)
    T0_ref, hp_ref, Tw_ref, phi_ref, insol_ref,
    D_ref, glo_ref, gdi_ref, gup_ref,
    out_ref,
    *, iters: int, pcr_steps: int,
):
    k = scal_ref[0]
    Tm = scal_ref[1]
    A = scal_ref[2]
    B = scal_ref[3]
    ai = scal_ref[4]
    f = scal_ref[5]
    max_step = scal_ref[6]

    T0 = T0_ref[:]
    hp = hp_ref[:]
    Tw = Tw_ref[:]
    phi = phi_ref[:]
    solar_ice = ai * insol_ref[:]
    D = D_ref[:]  # (B, 1) per-member diffusivity
    glo = glo_ref[:]
    gdi = gdi_ref[:]
    gup = gup_ref[:]
    k_over_h = k / hp
    one_m_phi_Tw = (1.0 - phi) * Tw

    def body(_, T0):
        Ti = jnp.minimum(T0, Tm)
        Tb = Ti * phi + one_m_phi_Tw
        dTb = D * (
            glo * _shift_lane(Tb, 1) + gdi * Tb + gup * _shift_lane(Tb, -1)
        )
        r = k_over_h * (Tm - T0) + solar_ice + ((-A) - B * (T0 - Tm)) + dTb + f
        g = phi * (T0 < Tm).astype(T0.dtype)
        jlo = D * glo * _shift_lane(g, 1)
        jdi = -k_over_h - B + D * gdi * g
        jup = D * gup * _shift_lane(g, -1)
        delta = _pcr(jlo, jdi, jup, -r, pcr_steps)
        delta = jnp.clip(delta, -max_step, max_step)
        delta = jnp.where(jnp.isfinite(delta), delta, jnp.zeros_like(delta))
        return T0 + delta

    T0 = jax.lax.fori_loop(0, iters, body, T0, unroll=True)
    out_ref[:] = T0


@functools.partial(
    jax.jit, static_argnames=("iters", "nx", "interpret")
)
def pallas_solve_T0(
    T0, hp, Tw, phi, insol, glo, gdi, gup, D, k, Tm, A, B, ai, f,
    max_step=50.0, iters: int = 6, nx: int = None, interpret: bool = False,
):
    """Fused Newton T0 solve for a batch.

    Parameters: ``T0, hp, Tw, phi, insol`` of shape ``(K, nx)``; stencil
    bands ``glo/gdi/gup`` ``(nx,)``; ``D`` per-member ``(K,)``; scalars
    ``k..f``. Returns the updated ``T0`` of shape ``(K, nx)``.
    """
    K, n = T0.shape
    if nx is None:
        nx = n
    nxp = pad_to_lanes(nx)
    dtype = T0.dtype
    pcr_steps = max(1, math.ceil(math.log2(nxp)))

    # tile the batch over the grid so each block's working set fits VMEM
    Kt = min(K, 256)
    Kp = ((K + Kt - 1) // Kt) * Kt

    def pad(v, fill):
        return jnp.pad(
            v, ((0, Kp - K), (0, nxp - nx)), constant_values=fill
        )

    hmin_fill = 1.0  # any positive value; padded rows are identity-decoupled
    args = (
        pad(T0, 0.0),
        pad(hp, hmin_fill),
        pad(Tw, 0.0),
        pad(phi, 0.0),
        pad(insol, 0.0),
        jnp.pad(jnp.asarray(D, dtype)[:, None], ((0, Kp - K), (0, 0))),
        jnp.pad(glo, (0, nxp - nx))[None, :].astype(dtype),
        jnp.pad(gdi, (0, nxp - nx))[None, :].astype(dtype),
        jnp.pad(gup, (0, nxp - nx))[None, :].astype(dtype),
    )
    scal = jnp.stack(
        [jnp.asarray(v, dtype) for v in (k, Tm, A, B, ai, f, max_step, 0.0)]
    )
    batch_spec = pl.BlockSpec((Kt, nxp), lambda i: (i, 0), memory_space=pltpu.VMEM)
    band_spec = pl.BlockSpec((1, nxp), lambda i: (0, 0), memory_space=pltpu.VMEM)
    d_spec = pl.BlockSpec((Kt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(_kernel, iters=iters, pcr_steps=pcr_steps),
        grid=(Kp // Kt,),
        out_shape=jax.ShapeDtypeStruct((Kp, nxp), dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            batch_spec, batch_spec, batch_spec, batch_spec, batch_spec,
            d_spec, band_spec, band_spec, band_spec,
        ],
        out_specs=batch_spec,
        interpret=interpret,
    )(scal, *args)
    return out[:K, :nx]
