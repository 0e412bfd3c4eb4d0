"""On-chip probe: WHERE does the fused noisy year's +0.34 s/yr go?

Round-5 finding (bench_layers interleaved A/B): keys-generated,
XLA-table, serial-OU and assoc-OU noisy arms ALL cost ~0.92 s/yr against
a 0.584 det control in the same window — so the round-4 attribution
(+250 ms/yr operand materialization, +200 ms/yr serial recurrence) is
refuted: removing the operand entirely (in-kernel generation) and the
recurrence (log-depth precompute) moved NOTHING. The remaining common
element is the per-step read ``noise_ref[pl.ds(t, 1), :]`` — a dynamic
sublane slice into an (nt_pad, Kt) VMEM buffer — plus the buffer's VMEM
residency itself. This probe separates those with same-process
interleaved arms (plain-noisy mode, zero table: deterministic dynamics,
identical physics work):

  det      — no noise argument at all (control)
  dyn      — production read: dynamic slice at t
  static0  — static row-0 read (same buffer resident; no dynamism)
  mod8     — dynamic slice folded into the first tile (same dynamism;
             tests whether buffer HEIGHT matters to the lowered access)

Interpretation: static0 >> dyn-cost-drop => the slice's dynamism is the
cost (pursue tile-aligned group reads / 8-step inner unroll); static0 ~
dyn => the cost is buffer residency or the extra row add (pursue VMEM
layout or accept the floor).

Run on an idle host, in the background, never timeout-killed.
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


def make_runner(noisy: bool, probe):
    """Build a chunked runner whose traces bake in ``probe``.

    ``pallas_miz_year`` is module-jitted with a SHARED cache, which
    would let the first-traced arm win for all; instead each arm jits
    the unwrapped function in its own closure, and ``run`` holds the
    probe global set for the duration of every call so whichever call
    triggers tracing sees it."""
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
    noise = jnp.zeros((st.nt, K), dtype) if noisy else None
    raw_year = py.pallas_miz_year.__wrapped__  # un-jitted
    interp = py.default_interpret()

    def year(c):
        c, seas, _conv, _ = raw_year(c, par_j, fyear, st, cfg,
                                     layout="xk", noise=noise,
                                     interpret=interp)
        return c, seas

    year_j = jax.jit(year)

    @jax.jit
    def chunk(c, seas):
        def body(cs, _):
            c, _s = cs
            return year(c), None

        (c, seas), _ = lax.scan(body, (c, seas), None, length=YPD)
        return c, seas

    state = {}

    def run(years):
        py._NOISE_READ_PROBE = probe
        try:
            t0 = time.time()
            if "c" not in state:
                state["c"], state["s"] = year_j(carry0)
            c, seas = state["c"], state["s"]
            done = 0
            while done < years:
                c, seas = chunk(c, seas)
                done += YPD
            np.asarray(seas.avg["E"])
            return time.time() - t0
        finally:
            py._NOISE_READ_PROBE = None

    return run


def main():
    print(f"devices: {jax.devices()}", flush=True)
    np.asarray(jnp.ones((8, 128)) @ jnp.ones((128, 8)))  # claim

    arms = {
        "det": make_runner(False, None),
        "dyn": make_runner(True, None),
        "static0": make_runner(True, "static0"),
        "mod8": make_runner(True, "mod8"),
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
