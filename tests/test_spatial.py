"""Spatially sharded full-model integration (8-device virtual mesh):
halo-exchange stencils + distributed SPIKE tridiagonal solves must reproduce
the single-device run."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import shard_map
from jax.sharding import Mesh, PartitionSpec as P

import energybalancemodel_jl_tpu as ebm
from energybalancemodel_jl_tpu.ops.spike import spike_tridiag_solve
from energybalancemodel_jl_tpu.parallel.spatial import grid_mesh, spatial_integrate


def zn(a):
    a = np.array(a, copy=True)
    a[np.isnan(a)] = 0.0
    return a


class TestSpike:
    def test_matches_dense(self, rng):
        n = 64
        lo = rng.normal(size=n); up = rng.normal(size=n)
        lo[0] = 0.0; up[-1] = 0.0
        di = np.abs(lo) + np.abs(up) + 1.0 + rng.uniform(0, 1, n)
        b = rng.normal(size=n)
        A = np.diag(di) + np.diag(lo[1:], -1) + np.diag(up[:-1], 1)
        mesh = Mesh(np.array(jax.devices()), ("x",))
        fn = jax.jit(shard_map(
            lambda *a: spike_tridiag_solve(*a, axis_name="x"),
            mesh=mesh, in_specs=(P("x"),) * 4, out_specs=P("x"),
        ))
        out = np.asarray(fn(*(jnp.asarray(v) for v in (lo, di, up, b))))
        np.testing.assert_allclose(out, np.linalg.solve(A, b), rtol=1e-10, atol=1e-12)

    def test_batched(self, rng):
        n, K = 32, 4
        lo = rng.normal(size=n); up = rng.normal(size=n)
        lo[0] = 0.0; up[-1] = 0.0
        di = np.abs(lo) + np.abs(up) + 1.0
        b = rng.normal(size=(K, n))
        A = np.diag(di) + np.diag(lo[1:], -1) + np.diag(up[:-1], 1)
        mesh = Mesh(np.array(jax.devices()), ("x",))
        fn = jax.jit(shard_map(
            lambda *a: spike_tridiag_solve(*a, axis_name="x"),
            mesh=mesh, in_specs=(P(None, "x"),) * 4, out_specs=P(None, "x"),
        ))
        lo2, di2, up2 = (np.broadcast_to(v, (K, n)).copy() for v in (lo, di, up))
        out = np.asarray(fn(*(jnp.asarray(v) for v in (lo2, di2, up2, b))))
        for k in range(K):
            np.testing.assert_allclose(out[k], np.linalg.solve(A, b[k]),
                                       rtol=1e-10, atol=1e-12)


class TestSpatialIntegrate:
    def test_miz_matches_unsharded(self):
        st = ebm.SpaceTime.sin(64, 100, 2)
        par = ebm.default_parameters("MIZ")
        ref = ebm.integrate("MIZ", st, ebm.Forcing(0.0), par, ebm.zeros_init(st),
                            lastonly=False, progress=False)
        shr = spatial_integrate("MIZ", st, ebm.Forcing(0.0), par,
                                ebm.zeros_init(st), mesh=grid_mesh(), lastonly=False)
        for k in ("E", "phi", "h", "Ti", "Tw", "D", "n", "T", "Ei", "Ew"):
            np.testing.assert_allclose(
                zn(shr.raw[k]), zn(ref.raw[k]), rtol=1e-8, atol=1e-9, err_msg=k
            )
        for season in ("winter", "summer", "avg"):
            np.testing.assert_allclose(
                zn(getattr(shr.seasonal, season)["E"]),
                zn(getattr(ref.seasonal, season)["E"]),
                rtol=1e-8, atol=1e-9, err_msg=season,
            )

    def test_classic_matches_unsharded(self):
        st = ebm.SpaceTime.identity(64, 1000, 1)
        par = ebm.default_parameters("Classic")
        E0 = np.full(st.nx, 30.0)
        init = ebm.Collection(E=E0, Tg=E0 / par.cw)
        ref = ebm.integrate("Classic", st, ebm.Forcing(0.0), par, init,
                            lastonly=False, progress=False)
        shr = spatial_integrate("Classic", st, ebm.Forcing(0.0), par, init,
                                mesh=grid_mesh(), lastonly=False)
        for k in ("E", "T", "h"):
            np.testing.assert_allclose(
                zn(shr.raw[k]), zn(ref.raw[k]), rtol=1e-8, atol=1e-9, err_msg=k
            )

    def test_uneven_shards_rejected(self):
        st = ebm.SpaceTime.sin(30, 10, 1)
        with pytest.raises(ValueError, match="divide evenly"):
            spatial_integrate("MIZ", st, ebm.Forcing(0.0),
                              ebm.default_parameters("MIZ"), ebm.zeros_init(st),
                              mesh=grid_mesh())
