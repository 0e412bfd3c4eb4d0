"""Adjoint parameter sensitivities — a capability beyond the reference.

The integrator is reverse-differentiable (implicit-diff Newton root, guarded
masked divisions), so one backward pass yields the sensitivity of any
diagnostic to every physical parameter simultaneously — the adjoint method
used in variational data assimilation. Here: sensitivities of the
annual-mean, hemispherically-integrated temperature and ice area to the
diffusivity D, OLR parameters A and B, and ocean heat flux Fb, each checked
against central finite differences.

Caveat (printed by the script): like any chaotic system, gradients are
meaningful over short horizons (one to two years); over long horizons their
variance explodes through the ice-edge mask flips, so long-horizon
calibration needs ensemble/smoothed objectives rather than pointwise
adjoints.

    python examples/adjoint_sensitivity.py
"""
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp  # noqa: E402

import energybalancemodel_jl_tpu as ebm  # noqa: E402
from energybalancemodel_jl_tpu.integrate import make_year_fn  # noqa: E402
from energybalancemodel_jl_tpu.models.base import StepConfig, get_model  # noqa: E402


def main(fast=False):
    # fast=True: CI-sized — smaller grid, two parameters, one diagnostic;
    # the active ice edge needs nx >= 16/nt >= 150 (CLAUDE.md: coarser
    # zeros-init configs are gradient-DEAD — fully frozen, locally flat)
    st = ebm.SpaceTime.sin(16, 150, 1) if fast else ebm.SpaceTime.sin(32, 200, 1)
    spec = get_model("MIZ")
    cfg = StepConfig(newton_abstol=1e-11, newton_reltol=1e-9)
    year = make_year_fn("MIZ", st, cfg, "float64", False)
    base = ebm.default_parameters("MIZ")
    fyear = jnp.zeros(st.nt)
    x = jnp.asarray(st.x)

    def diagnostics(par):
        carry = spec.init_carry(ebm.zeros_init(st), st, jnp.float64)
        carry, seasonal, _c, _ = year(carry, par, fyear)
        T = jnp.nan_to_num(seasonal.avg["T"])
        phi = jnp.nan_to_num(seasonal.avg["phi"])
        hemi = lambda v: jnp.sum((v[:-1] + v[1:]) * (x[1:] - x[:-1]) / 2.0)
        return dict(mean_T=hemi(T), ice_area=2.0 * jnp.pi * hemi(phi))

    names = ("D", "A") if fast else ("D", "A", "B", "Fb")

    def scalar_fn(diag):
        def f(values):
            par = ebm.Collection({k: jnp.float64(v) for k, v in base.items()})
            for n, v in zip(names, values):
                par[n] = v
            return diagnostics(par)[diag]
        return f

    values = jnp.asarray([base[n] for n in names], dtype=jnp.float64)
    print(f"{'diagnostic':>10} {'param':>6} {'adjoint dJ/dp':>16} {'finite diff':>16}")
    for diag in (("mean_T",) if fast else ("mean_T", "ice_area")):
        f = scalar_fn(diag)
        grads = jax.jit(jax.grad(f))(values)
        for i, n in enumerate(names):
            eps = 1e-6 * max(abs(float(values[i])), 1.0)
            vp = values.at[i].add(eps)
            vm = values.at[i].add(-eps)
            fd = (float(f(vp)) - float(f(vm))) / (2 * eps)
            print(f"{diag:>10} {n:>6} {float(grads[i]):16.6f} {fd:16.6f}")
            assert abs(float(grads[i]) - fd) <= 1e-2 * max(abs(fd), 1e-3), (diag, n)
    print("\nall adjoint sensitivities match finite differences")
    print("note: gradients are horizon-limited (chaotic dynamics) — use 1-2 "
          "year windows; long-horizon calibration needs smoothed objectives")


if __name__ == "__main__":
    main()
