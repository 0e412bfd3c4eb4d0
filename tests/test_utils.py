"""Utilities layer tests (Collection, numerics, safehouse, progress)."""
import io

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from energybalancemodel_jl_tpu.utils import (
    Collection,
    Progress,
    condset,
    crossmean,
    hemispheric_mean,
    house,
    nan_to_zero,
    reprhex,
    retrieve,
    safehouse,
    unique_id,
    zeroref,
)


class TestCollection:
    def test_dot_access(self):
        c = Collection(D=0.6, A=193.0)
        assert c.D == 0.6
        c.F = 0.0
        assert c["F"] == 0.0
        with pytest.raises(AttributeError):
            _ = c.missing

    def test_pytree(self):
        c = Collection(a=jnp.ones(3), b=jnp.zeros(3))
        doubled = jax.tree_util.tree_map(lambda x: 2 * x, c)
        assert isinstance(doubled, Collection)
        np.testing.assert_array_equal(doubled.a, 2 * np.ones(3))

    def test_jit_through(self):
        c = Collection(x=jnp.arange(4.0))

        @jax.jit
        def f(coll):
            return Collection(y=coll.x * 2)

        out = f(c)
        np.testing.assert_array_equal(out["y"], np.arange(4.0) * 2)


class TestNumerics:
    def test_crossmean(self):
        stack = np.array([[1.0, 2.0], [3.0, 4.0]])
        np.testing.assert_allclose(crossmean(stack), [2.0, 3.0])

    def test_crossmean_nan_propagates(self):
        stack = np.array([[1.0, np.nan], [3.0, 4.0]])
        out = np.asarray(crossmean(stack))
        assert out[0] == 2.0 and np.isnan(out[1])

    def test_hemispheric_mean_matches_trapezoid(self, rng):
        x = np.sort(rng.uniform(0, 1, 50))
        v = rng.normal(size=50)
        expected = np.trapezoid(v, x)
        np.testing.assert_allclose(float(hemispheric_mean(v, x)), expected, rtol=1e-12)

    def test_condset_zeroref(self):
        v = jnp.array([1.0, -2.0, 3.0])
        np.testing.assert_array_equal(condset(v, 0.0, v < 0), [1.0, 0.0, 3.0])
        ref = jnp.array([1.0, 0.0, 2.0])
        np.testing.assert_array_equal(zeroref(v, ref), [1.0, 0.0, 3.0])
        np.testing.assert_array_equal(
            nan_to_zero(jnp.array([jnp.nan, 1.0])), [0.0, 1.0]
        )


class TestSafehouse:
    def test_house_and_retrieve(self):
        sh = safehouse(object())
        val = [1, 2, 3]
        refugee = house("x", val, sh)
        val.append(4)  # deep copy protects against mutation
        assert retrieve(refugee.id, sh).value == [1, 2, 3]
        assert retrieve("x", sh)[0].value == [1, 2, 3]

    def test_multiple_refugees_per_name(self):
        sh = safehouse(object())
        for i in range(3):
            house("x", i, sh)
        assert [r.value for r in retrieve("x", sh)] == [0, 1, 2]

    def test_unique_id_is_32bit(self):
        i = unique_id()
        assert 0 <= i < 2**32
        assert len(reprhex(i)) == 8


class TestProgress:
    def test_runs_without_tty(self):
        prog = Progress(10, "Test", stream=io.StringIO())
        for i in range(11):
            prog.update(i)
        assert prog.current == 10

    def test_rate(self):
        prog = Progress(5, stream=io.StringIO())
        prog.update(0)
        prog.update(5)
        assert prog.rate >= 0


class TestPersistent:
    def test_state_persists_across_calls(self):
        from energybalancemodel_jl_tpu.utils import persistent

        @persistent(count=0, cache=None)
        def counter(state, x):
            state["count"] += 1
            if state["cache"] is None:
                state["cache"] = x * 2
            return state["count"], state["cache"]

        assert counter(10) == (1, 20)
        assert counter(99) == (2, 20)  # cache kept from first call
        assert counter.state["count"] == 2
