"""On-chip probe: WHERE does the fused noisy year's +0.34 s/yr go?

Round-5 findings so far (same-process interleaved A/Bs, K=8192,
canonical grid):

* batch #1 (bench_layers): keys-generated, XLA-table, serial-OU and
  assoc-OU arms ALL cost ~0.92 s/yr vs a 0.584 det control — refuting
  the round-4 attribution (+250 operand / +200 recurrence): removing
  the operand and the recurrence each moved NOTHING.
* batch #2 (this script, phase 1): with a LOOP-INVARIANT zero table the
  noisy kernel costs the SAME as the det kernel (x_det 1.004 / 1.002 /
  1.001 for dynamic / static-row-0 / first-tile reads) — the per-step
  dynamic sublane slice and the buffer residency are FREE.

So the cost lives in what phase 1 held constant: the PER-YEAR FRESHNESS
of the noise operand (a new producer every scan iteration) and/or the
OU-mode kernel structure (eta carry + output). Phase 2 arms:

  det          — control
  const_tab    — loop-invariant zero table (phase-1 'dyn'; expect ~det)
  fresh_tab    — the r4 production table: vmapped jax.random.normal per
                 year (fresh (nt, K) producer per scan iteration)
  fresh_gen    — in-kernel generation from per-year folded keys (fresh
                 (K, 2) operand only)
  ou_const     — OU-mode kernel (serial recurrence + eta out) on a
                 loop-invariant table
  ou_fresh_gen — full production serial arm (keys + in-kernel OU)

Reading: fresh_tab >> const_tab isolates operand freshness; ou_const >>
const_tab isolates the OU kernel structure; ou_fresh_gen should
reproduce batch #1's 0.92/0.58 ratio as the cross-check.

RESOLVED (phases 3-7, BENCH_NOTES "phases 3-7"): every structural
ingredient measures AT the det floor at scale=0 — including the actual
production chunk fn (x_det 1.024). The entire +0.43 s/yr is the PHYSICS
of noise: real weather kicks the Newton warm starts and the block-max
adaptive solve needs ~60% more iterations (driver scale=1: 1.635;
synthetic ou_full scale=1: 1.616 — same). There is no recoverable
engineering overhead in the fused noisy path; the phase-2 "freshness"
reading was XLA-schedule-dependent and did not reproduce.

Run on an idle host, in the background, never timeout-killed.
EBM_PROBE_PHASE=1 re-runs the phase-1 read-pattern arms;
EBM_PROBE_PHASE=2 the phase-2 freshness arms; default = the final
(phase-7) arm set.
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ.setdefault(
    "JAX_COMPILATION_CACHE_DIR",
    os.path.join(os.path.dirname(__file__), "..", ".jax_cache"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax import lax  # noqa: E402

try:
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
except Exception:
    pass

import energybalancemodel_jl_tpu as ebm  # noqa: E402
import energybalancemodel_jl_tpu.ops.pallas_year as py  # noqa: E402
from energybalancemodel_jl_tpu.models.base import (  # noqa: E402
    StepConfig, get_model)
from energybalancemodel_jl_tpu.utils.collection import Collection  # noqa: E402

K = int(os.environ.get("EBM_BENCH_K", "8192"))
Y1, Y2, YPD = 8, 16, 8


def make_runner(mode, probe=None, scale_val=0.0):
    """Chunked runner for one arm. ``mode`` selects the noise plumbing;
    ``probe`` (phase 1) selects the in-kernel read pattern via the
    trace-time ``_NOISE_READ_PROBE`` global — each arm jits the
    UNWRAPPED kernel in its own closure (the module-level jit cache
    would let the first-traced arm win otherwise) and holds the global
    set for the duration of every call."""
    nx, nt = (int(v) for v in
              os.environ.get("EBM_PROBE_ST", "180,2000").split(","))
    st = ebm.SpaceTime.sin(nx, nt, 1)
    dtype = jnp.float32
    cfg = StepConfig(solver="pcr", newton_abstol=0.5, newton_reltol=1e-4,
                     newton_max_step=50.0)
    par = Collection(ebm.default_parameters("MIZ"))
    par_j = Collection({k: jnp.asarray(v, dtype) for k, v in par.items()})
    par_j["D"] = jnp.asarray(np.linspace(0.55, 0.65, K), dtype)
    spec = get_model("MIZ")
    carry0 = spec.init_carry(ebm.zeros_init(st), st, dtype)
    carry0 = Collection({k: jnp.broadcast_to(v, (K,) + v.shape)
                         for k, v in carry0.items()})
    fyear = jnp.zeros(st.nt, dtype=dtype)
    noise_const = jnp.zeros((st.nt, K), dtype)
    base_key = jax.random.PRNGKey(0)
    keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(
        jnp.arange(K, dtype=jnp.uint32))
    rho = jnp.asarray(0.97, dtype)
    scale0 = jnp.asarray(scale_val, dtype)
    eta0 = jnp.zeros((K,), dtype)
    raw_year = py.pallas_miz_year.__wrapped__  # un-jitted
    interp = py.default_interpret()

    from energybalancemodel_jl_tpu.utils.numerics import hemispheric_mean

    x_row = jnp.asarray(st.x, dtype)

    def year(c, yi, eta=None, fy=None, scale=None):
        kw = {}
        if mode in ("const_tab", "ou_const"):
            kw["noise"] = noise_const
        elif mode == "fresh_tab":
            draw = lambda k_: jax.random.normal(
                jax.random.fold_in(k_, yi), (st.nt,), dtype)
            kw["noise"] = jax.vmap(draw, out_axes=1)(keys)
        elif mode in ("fresh_gen", "ou_fresh_gen", "ou_eta_carry",
                      "ou_full", "ou_full_frowxs", "ou_full_scalearg",
                      "mimic_jitkern", "mimic_dropseas"):
            kw["noise_keys"] = jax.vmap(
                lambda k_: jax.random.fold_in(k_, yi))(keys)
        elif mode == "ou_xs_keys":
            kw["noise_keys"] = yi  # pre-folded (K, 2) fed via scan xs
        if mode.startswith("ou") or mode.startswith("mimic"):
            kw["noise_ou"] = (rho,
                              scale if scale is not None else scale0,
                              eta if eta is not None else eta0)
        yr_fn = (py.pallas_miz_year if mode == "mimic_jitkern"
                 else raw_year)
        c, seas, _conv, eta_out = yr_fn(
            c, par_j, fy if fy is not None else fyear, st, cfg,
            layout="xk", interpret=interp, **kw)
        return c, seas, eta_out

    yi0 = (jax.vmap(lambda k_: jax.random.fold_in(k_, 0))(keys)
           if mode == "ou_xs_keys" else jnp.asarray(0, jnp.uint32))
    year_j = jax.jit(lambda c: year(c, yi0)[:2])
    carry_eta = mode in ("ou_eta_carry", "ou_full", "ou_full_frowxs",
                         "ou_full_scalearg", "mimic_jitkern",
                         "mimic_dropseas")
    with_area = mode.startswith("ou_full") or mode.startswith("mimic")
    drop_seas = mode == "mimic_dropseas"
    frow_xs = mode == "ou_full_frowxs"
    frows_chunk = jnp.zeros((YPD, st.nt), dtype)
    scale_arg = (jnp.asarray(0.0, dtype)
                 if mode == "ou_full_scalearg" else None)

    @jax.jit
    def chunk(c, seas, eta, y0, scale):
        if mode == "ou_xs_keys":
            xs = jax.vmap(
                lambda yi: jax.vmap(
                    lambda k_: jax.random.fold_in(k_, yi))(keys)
            )(y0 + jnp.arange(YPD, dtype=jnp.uint32))  # (YPD, K, 2)
        else:
            xs = y0 + jnp.arange(YPD, dtype=jnp.uint32)
            if frow_xs:
                xs = (xs, frows_chunk)

        def body(cs, x):
            if drop_seas:
                c, eta = cs
            else:
                c, _, eta = cs
            yi, fy = x if frow_xs else (x, None)
            c, seas_o, eta_out = year(c, yi, eta if carry_eta else None,
                                      fy, scale)
            out = None
            if with_area:
                out = 2.0 * jnp.pi * hemispheric_mean(
                    jnp.nan_to_num(seas_o.avg["phi"]), x_row)
            new_eta = eta_out if carry_eta else eta
            if drop_seas:
                # the driver pattern: seasonal NOT carried — each year's
                # store is consumed by the area reduction and dropped
                return (c, new_eta), out
            return (c, seas_o, new_eta), out

        if drop_seas:
            (c, eta), outs = lax.scan(body, (c, eta), xs)
        else:
            (c, seas, eta), outs = lax.scan(body, (c, seas, eta), xs)
        return c, seas, eta, outs

    state = {}

    def run(years):
        py._NOISE_READ_PROBE = probe
        try:
            t0 = time.time()
            if "c" not in state:
                state["c"], state["s"] = year_j(carry0)
            c, seas, eta = state["c"], state["s"], eta0
            done = 0
            while done < years:
                c, seas, eta, _outs = chunk(
                    c, seas, eta, jnp.asarray(done + 1, jnp.uint32),
                    scale_arg)
                done += YPD
            if with_area:
                np.asarray(_outs)  # sync on the per-year reductions
            else:
                np.asarray(seas.avg["E"])
            return time.time() - t0
        finally:
            py._NOISE_READ_PROBE = None

    return run


def make_driver_runner(scale_val=1.0):
    """The ACTUAL production chunk fn (_transition_fused_loop_fn) under
    the probe's marginal scheme — the in-window ground truth the
    synthetic arms are compared against. If this reads ~1.58 x_det while
    ou_full reads ~1.0, the gap is in the driver's remaining specifics;
    if it reads ~1.0 the earlier 0.92 s/yr was window-borne."""
    from energybalancemodel_jl_tpu.models.base import default_step_config
    from energybalancemodel_jl_tpu.stochastic import (
        _transition_fused_loop_fn)

    nx, nt = (int(v) for v in
              os.environ.get("EBM_PROBE_ST", "180,2000").split(","))
    st = ebm.SpaceTime.sin(nx, nt, 1)
    dtype = jnp.float32
    cfg = default_step_config("float32")
    par = Collection(ebm.default_parameters("MIZ"))
    par_run = Collection({k: jnp.asarray(v, dtype) for k, v in
                          par.items()})
    par_run["D"] = jnp.asarray(np.linspace(0.55, 0.65, K), dtype)
    spec = get_model("MIZ")
    carry0 = spec.init_carry(ebm.zeros_init(st), st, dtype)
    carry0 = Collection({k: jnp.broadcast_to(v, (K,) + v.shape)
                         for k, v in carry0.items()})
    base_key = jax.random.PRNGKey(0)
    keys = jax.vmap(lambda i: jax.random.fold_in(base_key, i))(
        jnp.arange(K, dtype=jnp.uint32))
    f_off = jnp.zeros((K,), dtype)
    frows = jnp.zeros((YPD, st.nt), dtype)
    rho, scale = 0.97, jnp.asarray(scale_val, dtype)
    run_fn = _transition_fused_loop_fn("MIZ", st, cfg, "float32", "avg",
                                       (), py.default_interpret(), 128,
                                       "keys", "serial")
    state = {}

    def run(years):
        t0 = time.time()
        if "c" not in state:
            state["c"], state["e"] = carry0, jnp.zeros((K,), dtype)
        c, eta = state["c"], state["e"]
        zeros_k = jnp.zeros((K,), dtype)
        done = 0
        while done < years:
            c, eta, areas, _means, _conv, _cross = run_fn(
                c, eta, keys, par_run, f_off, frows,
                jnp.asarray(done, jnp.int32), YPD, rho, scale,
                zeros_k, zeros_k)
            done += YPD
        np.asarray(areas)
        return time.time() - t0

    return run


def main():
    print(f"devices: {jax.devices()}", flush=True)
    np.asarray(jnp.ones((8, 128)) @ jnp.ones((128, 8)))  # claim

    if os.environ.get("EBM_PROBE_PHASE") == "1":
        arms = {
            "det": make_runner("det"),
            "dyn": make_runner("const_tab"),
            "static0": make_runner("const_tab", "static0"),
            "mod8": make_runner("const_tab", "mod8"),
        }
    elif os.environ.get("EBM_PROBE_PHASE") == "sigma":
        # the amplitude curve of the Newton-physics cost: the production
        # chunk fn at increasing per-step noise scale vs the det control
        arms = {
            "det": make_runner("det"),
            "driver_s025": make_driver_runner(0.25),
            "driver_s05": make_driver_runner(0.5),
            "driver_s1": make_driver_runner(1.0),
            "driver_s2": make_driver_runner(2.0),
            "driver_s4": make_driver_runner(4.0),
        }
    elif os.environ.get("EBM_PROBE_PHASE") == "2":
        arms = {
            "det": make_runner("det"),
            "const_tab": make_runner("const_tab"),
            "fresh_tab": make_runner("fresh_tab"),
            "fresh_gen": make_runner("fresh_gen"),
            "ou_const": make_runner("ou_const"),
            "ou_fresh_gen": make_runner("ou_fresh_gen"),
        }
    else:
        # phase 3: with phase 2 showing freshness costs ~0.17 s/yr
        # SIZE-INDEPENDENTLY and the OU structure free, separate the
        # production driver's remaining ingredients: scan-xs-fed
        # pre-folded keys (is xs slicing "fresh"?), the eta carry
        # (kernel eta output -> next pars stack = a fresh pars operand
        # per year), and the per-year area reduction (ou_full =
        # everything the real driver does minus label bookkeeping)
        arms = {
            "det": make_runner("det"),
            "ou_fresh_gen": make_runner("ou_fresh_gen"),
            "ou_xs_keys": make_runner("ou_xs_keys"),
            "ou_eta_carry": make_runner("ou_eta_carry"),
            "ou_full": make_runner("ou_full"),
            "ou_full_s1": make_runner("ou_full", scale_val=1.0),
            "driver_s0": make_driver_runner(0.0),
            "driver": make_driver_runner(),
        }
    for name, run in arms.items():
        run(Y1)  # compile + warm
        print(f"warmed {name}", flush=True)
    cycles = int(os.environ.get("EBM_BENCH_CYCLES", "3"))
    res = {n: [] for n in arms}
    for _ in range(cycles):
        for n, run in arms.items():
            t1, t2 = run(Y1), run(Y2)
            res[n].append((t2 - t1) / (Y2 - Y1))
    ctrl = float(np.median(res["det"]))
    for n in arms:
        med = float(np.median(res[n]))
        print(json.dumps({
            "arm": n, "marginal_s_per_year": med,
            "samples": [round(v, 4) for v in res[n]],
            "x_det": med / ctrl,
            "window": time.strftime("%Y-%m-%d %H:%M:%S"),
        }), flush=True)


if __name__ == "__main__":
    main()
