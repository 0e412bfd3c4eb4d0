"""Explicit tests for the reference quirks catalogued in SURVEY.md §2 —
each is a silent-divergence source the rebuild must reproduce exactly."""
import jax.numpy as jnp
import numpy as np
import pytest

from energybalancemodel_jl_tpu import (
    Collection,
    SpaceTime,
    default_parameters,
)
from energybalancemodel_jl_tpu.models.base import StepConfig, get_model


def miz_step_once(carry_np, par, st, t_index=0, f=0.0, dtype=jnp.float64):
    spec = get_model("MIZ")
    parj = Collection({k: jnp.asarray(v, dtype) for k, v in par.items()})
    stat = spec.statics(st, parj, dtype)
    carry = Collection({k: jnp.asarray(v, dtype) for k, v in carry_np.items()})
    xs = dict(insol=stat.insol[t_index], f=jnp.asarray(f, dtype))
    new_carry, out = spec.step(carry, xs, stat, parj, StepConfig())
    return (
        {k: np.asarray(v) for k, v in new_carry.items()},
        {k: np.asarray(v) for k, v in out.items() if k != "newton_converged"},
    )


def test_Dt_lateral_melt_precedence():
    """``D_t``'s melt term is ``-(pi/2)*alpha*wlat`` (Julia precedence of
    ``-pi / 2.0*par.alpha * wlat``, /root/reference/src/miz.jl:141) — NOT the
    physically-suggestive ``-pi/(2 alpha) * wlat``. Verified by isolating the
    term: no welding (kappa=0), no freezing (warm water => psiEw=0 => Ql=0),
    no pancakes (dn=0), mid-range D so the clamp is inactive."""
    nx = 8
    st = SpaceTime.sin(nx, 100, 1)
    par = Collection(default_parameters("MIZ"))
    par["kappa"] = 0.0  # disable welding
    Tw_target = 2.0  # warm water -> lateral melt, no freezing
    phi = np.full(nx, 0.5)
    h = np.full(nx, 1.0)
    D0 = np.full(nx, 80.0)  # mid-range: clamp [Dmin, Dmax] inactive
    Ei = -par.Lf * h * phi  # consistent with phi = -Ei/(Lf h)
    Ew = Tw_target * (1.0 - phi) * par.cw
    carry = dict(Ei=Ei, Ew=Ew, h=h, D=D0, phi=phi, T0=np.zeros(nx))
    new_carry, out = miz_step_once(carry, par, st)

    wl = par.m1 * (Tw_target - par.Tm ** par.m2)
    dt = st.dt
    expected_quirk = D0 + (-np.pi / 2.0 * par.alpha * wl) * dt
    expected_physical = D0 + (-np.pi / (2.0 * par.alpha) * wl) * dt
    # rD before averaging; dn == 0 here so average(rD, Dmin, n, 0) == rD
    np.testing.assert_allclose(out["D"], expected_quirk, rtol=1e-10)
    assert abs(out["D"][0] - expected_physical[0]) > 1e-3  # quirk != physics


def test_wlat_exponent_binds_to_Tm():
    """``wlat = m1*(Tw - Tm^m2)`` — the exponent binds to Tm only
    (/root/reference/src/miz.jl:71). With Tm = 0.5 the quirk value is
    m1*(Tw - 0.5^1.36), not m1*(Tw - Tm)^1.36."""
    nx = 8
    st = SpaceTime.sin(nx, 100, 1)
    par = Collection(default_parameters("MIZ"))
    par["kappa"] = 0.0
    par["Tm"] = 0.5
    phi = np.full(nx, 0.5)
    h = np.full(nx, 1.0)
    D0 = np.full(nx, 80.0)
    Tw_target = 3.0
    Ei = -par.Lf * h * phi
    Ew = (Tw_target - par.Tm) * (1.0 - phi) * par.cw  # water_temp = Tm + Ew/((1-phi)cw)
    carry = dict(Ei=Ei, Ew=Ew, h=h, D=D0, phi=phi, T0=np.zeros(nx))
    _, out = miz_step_once(carry, par, st)
    wl_quirk = par.m1 * (Tw_target - par.Tm ** par.m2)
    expected = D0 + (-np.pi / 2.0 * par.alpha * wl_quirk) * st.dt
    np.testing.assert_allclose(out["D"], expected, rtol=1e-10)


def test_classic_stored_T_uses_pre_update_E():
    """``vars.T`` is computed from the pre-update enthalpy (classic.jl:51
    before :53): from E>0 the stored T equals E_old/cw even though E moves
    within the step."""
    from energybalancemodel_jl_tpu.models import classic as C

    nx = 10
    st = SpaceTime.identity(nx, 1000, 1)
    par = default_parameters("Classic")
    parj = Collection({k: jnp.float64(v) for k, v in par.items()})
    stat = C.statics(st, parj, jnp.float64)
    E0 = np.full(nx, 98.0)
    carry = Collection(E=jnp.asarray(E0), Tg=jnp.asarray(E0 / par.cw))
    xs = dict(S_i=stat.S[0], S_ip1=stat.S[1], f=jnp.float64(0.0))
    new_carry, out = C.step(carry, xs, stat, parj, StepConfig())
    np.testing.assert_allclose(np.asarray(out["T"]), E0 / par.cw, rtol=1e-12)
    assert not np.allclose(np.asarray(new_carry["E"]), E0)  # E did change


def test_classic_uses_uniform_diffop_on_sin_grid():
    """The classic model always builds its implicit matrix from the
    uniform-grid operator (classic.jl:21 calls get_diffop(nx) regardless of
    the grid map) — reproduced: statics bands match uniform bands even for a
    sin grid."""
    from energybalancemodel_jl_tpu.models import classic as C

    st = SpaceTime.sin(24, 100, 1)
    par = default_parameters("Classic")
    parj = Collection({k: jnp.float64(v) for k, v in par.items()})
    stat = C.statics(st, parj, jnp.float64)
    uni = C.uniform_bands(st.nx)
    expected_klo = -(st.dt * par.D) * uni.lo / par.cg
    np.testing.assert_allclose(np.asarray(stat.klo), expected_klo, rtol=1e-12)


def test_concentration_clamps_upper_only():
    """``concentration`` clamps phi above 1 but allows any value below
    (miz.jl:74-80): a large negative Ei with small h gives phi == 1."""
    nx = 8
    st = SpaceTime.sin(nx, 100, 1)
    par = default_parameters("MIZ")
    h = np.full(nx, 0.5)
    Ei = np.full(nx, -100.0)  # -Ei/(Lf h) = 21 >> 1 -> clamped to 1
    carry = dict(Ei=Ei, Ew=np.zeros(nx), h=h, D=np.full(nx, 10.0),
                 phi=np.full(nx, 1.0), T0=np.zeros(nx))
    _, out = miz_step_once(carry, par, st)
    assert (out["phi"] <= 1.0).all()
    assert out["phi"].max() == 1.0
