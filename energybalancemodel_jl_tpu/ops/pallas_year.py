"""Pallas TPU kernel: fused whole-year MIZ integration.

The batch-native hot loop (BENCH_NOTES.md) still pays per-step HBM traffic:
every ``lax.scan`` step reads and writes the ``(K, nx)`` carry plus ten
seasonal accumulators between fused XLA kernels. At nx = 180 the entire
working set of a 128-member block — prognostic state, Newton warm start,
seasonal accumulators, even the full ``(nt, nx)`` insolation table — fits in
VMEM with room to spare. This kernel therefore runs the *whole year*
(``nt`` physics steps, each with its warm-started adaptive Newton solve and
PCR tridiagonal solves) in one launch per block: HBM sees one read of the
carry and one write of the carry + seasonal storage per simulated year.

The physics is not re-implemented: the kernel body calls
:func:`..models.miz.step` — the exact function the XLA path scans — on
VMEM-resident values. Per-step semantics (update order, masking, Newton
tolerances; reference /root/reference/src/miz.jl:150-196) are shared by
construction; only the iteration *grouping* of the adaptive Newton loop
differs (the while-loop convergence test reduces over a K-block instead of
the full batch), which perturbs converged iterates below the solve tolerance
only.

Storage semantics mirror the seasonal-only ``make_year_fn`` mode
(annual sums accumulated per step, winter/summer snapshots at the tick
indices, reference ``savesol!`` /root/reference/src/infrastructure.jl:549-589).

Layout: members on sublanes, grid cells on lanes, ``nx`` padded to a lane
multiple with benign decoupled columns (zero stencil bands), ``K`` padded to
the block size with zero-state members.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..solutions import Seasonal
from ..utils.collection import Collection
from .pallas_newton import default_interpret, pad_to_lanes

__all__ = ["pallas_miz_year", "default_interpret"]

# scan-carry fields of the MIZ model (models/miz.py init_carry)
CARRY_KEYS = ("Ei", "Ew", "h", "D", "phi", "T0")
# recorded solution variables, in ModelSpec order
OUT_VARS = ("E", "T", "h", "Ei", "Ew", "Ti", "Tw", "D", "phi", "n")
# scalar physical parameters the step function reads (diffusivity D is
# per-member and rides in VMEM instead)
SCAL_NAMES = (
    "k", "Tm", "A", "B", "ai", "Fb", "cw", "m1",
    "Lf", "alpha", "rl", "Dmin", "Dmax", "hmin", "kappa",
)
# extra SMEM scalars appended after SCAL_NAMES: statics-derived Tm^m2
# (hoisted so the kernel needs no float power, which Mosaic cannot lower)
N_SCAL = len(SCAL_NAMES) + 1


def _kernel(
    scal_ref,   # SMEM (len(SCAL_NAMES),)
    f_ref,      # SMEM (nt,) forcing per step
    cin_ref,    # VMEM (6, Kt, nxp) carry in
    insol_ref,  # VMEM (nt, nxp) insolation table
    rows_ref,   # VMEM (4, nxp): aw, glo, gdi, gup
    dv_ref,     # VMEM (Kt, 1) per-member diffusivity
    cout_ref,   # VMEM (6, Kt, nxp) carry out
    wint_ref,   # VMEM (10, Kt, nxp) winter snapshot
    summ_ref,   # VMEM (10, Kt, nxp) summer snapshot
    avg_ref,    # VMEM (10, Kt, nxp) annual mean
    conv_ref,   # VMEM (Kt, 1) block convergence flag (replicated rows)
    *, nt: int, w0: int, s0: int, dt: float, cfg,
):
    from ..models import miz

    dtype = cin_ref.dtype
    Kt, nxp = cin_ref.shape[1], cin_ref.shape[2]

    par = Collection({n: scal_ref[i] for i, n in enumerate(SCAL_NAMES)})
    par["D"] = dv_ref[:]  # (Kt, 1) broadcasts against (Kt, nxp) state
    stat = Collection(
        aw=rows_ref[0:1],
        glo=rows_ref[1:2],
        gdi=rows_ref[2:3],
        gup=rows_ref[3:4],
        dt=dt,
        Tm_pow_m2=scal_ref[len(SCAL_NAMES)],
    )
    carry0 = Collection({k: cin_ref[j] for j, k in enumerate(CARRY_KEYS)})
    # annual sums accumulate in the output ref itself (read-modify-write per
    # step) rather than in the loop carry — saves 10 (Kt, nxp) buffers of
    # scoped VMEM, which is what lets a 128-row block fit
    for i in range(len(OUT_VARS)):
        avg_ref[i] = jnp.zeros((Kt, nxp), dtype)

    def body(t, state):
        carry, conv = state
        xs = Collection(insol=insol_ref[pl.ds(t, 1), :], f=f_ref[t])
        carry, out = miz.step(carry, xs, stat, par, cfg)
        out = dict(out)
        conv = jnp.minimum(conv, out.pop("newton_converged"))
        for i, k in enumerate(OUT_VARS):
            avg_ref[i] = avg_ref[i] + out[k]

        @pl.when(t == w0)
        def _():
            for i, k in enumerate(OUT_VARS):
                wint_ref[i] = out[k]

        @pl.when(t == s0)
        def _():
            for i, k in enumerate(OUT_VARS):
                summ_ref[i] = out[k]

        return carry, conv

    carry, conv = jax.lax.fori_loop(
        0, nt, body, (carry0, jnp.ones((), dtype))
    )
    for j, k in enumerate(CARRY_KEYS):
        cout_ref[j] = carry[k]
    for i in range(len(OUT_VARS)):
        # same `sum / nt` arithmetic as the XLA seasonal storage path
        avg_ref[i] = avg_ref[i] / jnp.asarray(float(nt), dtype)
    conv_ref[:] = jnp.full(conv_ref.shape, conv, dtype)


def _round_up(n: int, m: int) -> int:
    return ((n + m - 1) // m) * m


@functools.partial(
    jax.jit, static_argnames=("st", "cfg", "block_k", "interpret")
)
def pallas_miz_year(carry, par, fyear, st, cfg, block_k: int = 128,
                    interpret: bool = False):
    """Run one MIZ model year for a ``(K, nx)`` ensemble in fused blocks.

    Drop-in twin of the seasonal-only ``make_year_fn`` signature:
    ``(carry, par, fyear) -> (carry, Seasonal, converged, None)`` with
    ``par`` a Collection of scalars plus an optionally ``(K,)``-swept
    diffusivity ``D`` (sweep other parameters with the vmap engine).
    """
    import dataclasses

    from ..models import miz

    # inside the kernel everything is already VMEM-resident: the nested
    # Pallas PCR launch ('pcr_fused') and the fixed-iteration Newton kernel
    # ('pallas') are meaningless here — normalize to the inline PCR solve
    if cfg.solver != "pcr":
        cfg = dataclasses.replace(cfg, solver="pcr")

    dtype = carry["Ei"].dtype
    K, nx = carry["Ei"].shape
    nxp = pad_to_lanes(nx)
    Kt = min(block_k, _round_up(K, 8))
    Kp = _round_up(K, Kt)
    nt = st.nt
    w0 = st.winter_inx - 1  # reference tick indices are 1-based
    s0 = st.summer_inx - 1

    par = Collection({k: jnp.asarray(v, dtype=dtype) for k, v in par.items()})
    D = par["D"]
    Dv = jnp.broadcast_to(jnp.reshape(D, (-1, 1))[:, :1], (K, 1)) \
        if jnp.ndim(D) > 0 else jnp.full((K, 1), D, dtype=dtype)
    scal = []
    for name in SCAL_NAMES:
        v = par[name]
        if jnp.ndim(v) != 0:
            raise ValueError(
                f"the fused year kernel requires scalar parameter {name!r} "
                "(only 'D' may be per-member); use the vmap engine to sweep it"
            )
        scal.append(v)

    stat = miz.statics(st, par, dtype)
    scal.append(jnp.asarray(stat["Tm_pow_m2"], dtype))
    scal = jnp.stack(scal)

    def pad_kx(v, fill=0.0):
        return jnp.pad(v, ((0, Kp - K), (0, nxp - nx)), constant_values=fill)

    def pad_lane(v):
        return jnp.pad(jnp.asarray(v, dtype), (0, nxp - nx))

    cin = jnp.stack([pad_kx(jnp.asarray(carry[k], dtype)) for k in CARRY_KEYS])
    insol = jnp.pad(stat.insol, ((0, 0), (0, nxp - nx)))
    rows = jnp.stack(
        [pad_lane(stat.aw), pad_lane(stat.glo), pad_lane(stat.gdi), pad_lane(stat.gup)]
    )
    Dvp = jnp.pad(Dv, ((0, Kp - K), (0, 0)))
    f = jnp.asarray(fyear, dtype=dtype)

    nb = Kp // Kt
    smem = pl.BlockSpec(memory_space=pltpu.SMEM)
    blk6 = pl.BlockSpec((6, Kt, nxp), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    blk10 = pl.BlockSpec((10, Kt, nxp), lambda i: (0, i, 0), memory_space=pltpu.VMEM)
    cout, wint, summ, avg, conv = pl.pallas_call(
        functools.partial(
            _kernel, nt=nt, w0=w0, s0=s0, dt=st.dt, cfg=cfg
        ),
        grid=(nb,),
        out_shape=(
            jax.ShapeDtypeStruct((6, Kp, nxp), dtype),
            jax.ShapeDtypeStruct((10, Kp, nxp), dtype),
            jax.ShapeDtypeStruct((10, Kp, nxp), dtype),
            jax.ShapeDtypeStruct((10, Kp, nxp), dtype),
            jax.ShapeDtypeStruct((Kp, 1), dtype),
        ),
        in_specs=[
            smem,
            smem,
            blk6,
            pl.BlockSpec((nt, nxp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((4, nxp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Kt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            blk6,
            blk10,
            blk10,
            blk10,
            pl.BlockSpec((Kt, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(scal, f, cin, insol, rows, Dvp)

    new_carry = Collection(
        {k: cout[j, :K, :nx] for j, k in enumerate(CARRY_KEYS)}
    )
    seasonal = Seasonal(
        winter=Collection({k: wint[i, :K, :nx] for i, k in enumerate(OUT_VARS)}),
        summer=Collection({k: summ[i, :K, :nx] for i, k in enumerate(OUT_VARS)}),
        avg=Collection({k: avg[i, :K, :nx] for i, k in enumerate(OUT_VARS)}),
    )
    return new_carry, seasonal, jnp.min(conv), None
