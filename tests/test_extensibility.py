"""Framework extensibility: registering a new model family.

The reference's extension point is multiple dispatch — defining a new
``step!(::Val{:MyModel}, ...)`` method (/root/reference/src/infrastructure.jl:594).
Here a model is a :class:`ModelSpec` of pure functions; registering one makes
it available to ``integrate``, the ensemble engines, and the storage
machinery with no other changes.
"""
import jax.numpy as jnp
import numpy as np
import pytest

import energybalancemodel_jl_tpu as ebm
from energybalancemodel_jl_tpu.models.base import ModelSpec, register_model
from energybalancemodel_jl_tpu.ops.diffusion import diffusion_bands
from energybalancemodel_jl_tpu.utils.collection import Collection


def _make_toy_model():
    """Pure diffusive relaxation: dT/dt = D∇²T - lambda T."""

    def statics(st, par, dtype):
        geom = diffusion_bands(st)
        return Collection(
            glo=jnp.asarray(geom.lo, dtype), gdi=jnp.asarray(geom.di, dtype),
            gup=jnp.asarray(geom.up, dtype), dt=st.dt,
        )

    def init_carry(init, st, dtype):
        return Collection(T=jnp.asarray(init["T"], dtype=dtype))

    def step_inputs(stat, fyear):
        return dict(f=fyear)

    def step(carry, xs, stat, par, cfg):
        T = carry["T"]
        lap = par["D"] * (
            stat.glo * jnp.roll(T, 1, -1) + stat.gdi * T + stat.gup * jnp.roll(T, -1, -1)
        )
        T = T + stat.dt * (lap - par["lam"] * T + xs["f"])
        return Collection(T=T), Collection(T=T)

    return register_model(
        ModelSpec(
            name="ToyDiffusion",
            statics=statics, init_carry=init_carry, step=step,
            step_inputs=step_inputs,
            solution_vars=("T",), init_vars=("T",),
        )
    )


_make_toy_model()


def test_registered_model_integrates():
    # explicit diffusion stability: D * max(lambda) * dt < 0.5 with
    # lambda ~ 1/dx^2 = nx^2
    st = ebm.SpaceTime.identity(24, 200, 2)
    par = Collection(D=0.02, lam=2.0)
    init = Collection(T=np.sin(np.pi * st.x) * 10.0)
    sols = ebm.integrate("ToyDiffusion", st, ebm.Forcing(0.0), par, init,
                         lastonly=False, progress=False)
    assert sols.raw["T"].shape == (400, 24)
    # relaxation decays the field
    assert np.abs(sols.raw["T"][-1]).max() < np.abs(init["T"]).max() * 0.1
    assert sols.seasonal.avg["T"].shape == (2, 24)


def test_registered_model_in_ensemble():
    from energybalancemodel_jl_tpu.parallel import ensemble_integrate
    from energybalancemodel_jl_tpu.parallel.ensemble import batched_parameters

    st = ebm.SpaceTime.identity(16, 100, 1)
    par_b = batched_parameters(Collection(D=0.02, lam=2.0), {"lam": [1.0, 2.0, 4.0]})
    init = Collection(T=np.ones(st.nx) * 5.0)
    ens = ensemble_integrate("ToyDiffusion", st, ebm.Forcing(0.0), par_b, init)
    assert ens.n_members == 3
    # stronger relaxation -> smaller annual-mean field
    means = ens.seasonal.avg["T"][:, 0, :].mean(axis=1)
    assert np.all(np.diff(means) < 0)
