"""Differentiability: reverse-mode AD through the full integrator.

A capability with no reference analog: the MIZ surface-temperature Newton
solve carries an implicit-function-theorem custom VJP (AD flows through the
root, not the iteration), and every masked division uses denominator guards
that are primal-identical but cotangent-safe — so ``jax.grad`` of any
diagnostic with respect to any physical parameter works, enabling
gradient-based calibration.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from energybalancemodel_jl_tpu import (
    Collection,
    SpaceTime,
    default_parameters,
    zeros_init,
)
from energybalancemodel_jl_tpu.integrate import make_year_fn
from energybalancemodel_jl_tpu.models.base import StepConfig, get_model


def year_loss_fn(model, st, init_builder):
    spec = get_model(model)
    cfg = StepConfig(newton_abstol=1e-11, newton_reltol=1e-9)
    year = make_year_fn(model, st, cfg, "float64", False)
    base = default_parameters(model)
    fyear = jnp.zeros(st.nt)

    def loss(**overrides):
        par = Collection({k: jnp.float64(v) for k, v in base.items()})
        par.update(overrides)
        carry = spec.init_carry(init_builder(st, base), st, jnp.float64)
        carry, seasonal, _conv, _ = year(carry, par, fyear)
        return jnp.sum(jnp.nan_to_num(seasonal.avg["E"]))

    return loss


def check_grad(loss, name, value, eps, rtol):
    g = float(jax.grad(lambda v: loss(**{name: v}))(jnp.float64(value)))
    fd = float(
        (loss(**{name: jnp.float64(value + eps)}) - loss(**{name: jnp.float64(value - eps)}))
        / (2 * eps)
    )
    assert np.isfinite(g), f"grad wrt {name} is not finite"
    assert abs(g - fd) <= rtol * max(abs(fd), 1e-6), (name, g, fd)
    return g


class TestMIZGradients:
    @pytest.mark.parametrize("name,value,eps", [
        ("D", 0.6, 1e-6),
        ("A", 193.0, 1e-5),
        ("Fb", 4.0, 1e-6),
    ])
    def test_grad_matches_finite_difference(self, name, value, eps):
        st = SpaceTime.sin(16, 50, 1)
        loss = year_loss_fn("MIZ", st, lambda st, base: zeros_init(st, "MIZ"))
        check_grad(loss, name, value, eps, rtol=1e-3)

    def test_grad_through_multiple_years(self):
        st = SpaceTime.sin(12, 40, 1)
        spec = get_model("MIZ")
        cfg = StepConfig(newton_abstol=1e-11, newton_reltol=1e-9)
        year = make_year_fn("MIZ", st, cfg, "float64", False)
        base = default_parameters("MIZ")
        fyear = jnp.zeros(st.nt)

        def loss(D):
            par = Collection({k: jnp.float64(v) for k, v in base.items()})
            par["D"] = D
            carry = spec.init_carry(zeros_init(st), st, jnp.float64)
            for _ in range(2):  # two chained years
                carry, seasonal, _c, _ = year(carry, par, fyear)
            return jnp.sum(jnp.nan_to_num(seasonal.avg["phi"]))

        g = float(jax.grad(loss)(jnp.float64(0.6)))
        eps = 1e-6
        fd = float((loss(jnp.float64(0.6 + eps)) - loss(jnp.float64(0.6 - eps))) / (2 * eps))
        assert np.isfinite(g)
        assert abs(g - fd) <= 1e-3 * max(abs(fd), 1e-6)


class TestClassicGradients:
    def test_grad_wrt_D(self):
        st = SpaceTime.identity(16, 1000, 1)
        par0 = default_parameters("Classic")

        def init_builder(st, base):
            E0 = np.full(st.nx, 30.0)
            return Collection(E=E0, Tg=E0 / par0["cw"])

        loss = year_loss_fn("Classic", st, init_builder)
        check_grad(loss, "D", 0.6, 1e-6, rtol=1e-3)

    def test_grad_with_albedo_hole_init(self):
        """E = 0 init exercises the guarded kLf/E lanes."""
        st = SpaceTime.identity(12, 1000, 1)
        loss = year_loss_fn(
            "Classic", st,
            lambda st, base: Collection(E=np.zeros(st.nx), Tg=np.zeros(st.nx)),
        )
        g = float(jax.grad(lambda v: loss(A=v))(jnp.float64(193.0)))
        assert np.isfinite(g)
