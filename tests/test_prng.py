"""Bitwise contract of ops/prng.py against jax.random itself.

The fused transitions engine's in-kernel draw generation is only
admissible if it reproduces ``jax.random.normal``'s draws EXACTLY — the
engines' identical-weather contract (stochastic.py module docstring)
anchors the stochastic oracle tests on it. These tests pin the pure-XLA
replication; the Mosaic (in-kernel) side is pinned by the interpret-mode
kernel tests in test_pallas_year.py and the on-chip tpu_check stage.

The exhaustive test exploits that the draw pipeline maps bits through
``bits >> 9`` — only 2^23 distinct mantissa patterns exist, so EVERY
float the pipeline can ever produce is checked, not a sample.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from energybalancemodel_jl_tpu.ops import prng


def _keys_for(seed: int, members: int, year: int):
    """The stochastic.py keying contract: fold member then year."""
    base = jax.random.PRNGKey(seed)
    keys = jax.vmap(lambda i: jax.random.fold_in(base, i))(
        jnp.arange(members, dtype=jnp.uint32))
    return jax.vmap(lambda k: jax.random.fold_in(k, year))(keys)


class TestNormalTable:
    @pytest.mark.parametrize("nt", [1, 7, 200, 2000])
    def test_bitwise_vs_jax_random_normal(self, nt):
        keys = _keys_for(seed=7, members=5, year=3)
        ref = jax.vmap(
            lambda k: jax.random.normal(k, (nt,), jnp.float32),
            out_axes=1)(keys)
        mine = jax.jit(prng.normal_table, static_argnums=1)(
            jax.random.key_data(keys) if hasattr(jax.random, "key_data")
            else keys, nt)
        assert mine.shape == (nt, 5)
        assert np.array_equal(np.asarray(ref).view(np.int32),
                              np.asarray(mine).view(np.int32))

    def test_members_independent_of_batch(self):
        """Member k's column only depends on its own key — the property
        that makes sharded draws exactly equal unsharded ones."""
        keys = _keys_for(seed=1, members=6, year=0)
        full = prng.normal_table(keys, 50)
        half = prng.normal_table(keys[3:], 50)
        assert np.array_equal(np.asarray(full[:, 3:]), np.asarray(half))


class TestExhaustive:
    def test_every_mantissa_bitwise(self):
        """All 2^23 bit patterns the pipeline can see: the replicated
        Giles-polynomial chain == the lax.erf_inv chain, bitwise."""
        def jax_chain(bits):
            lo = np.nextafter(np.float32(-1.0), np.float32(0.0),
                              dtype=np.float32)
            hi = np.float32(1.0)
            fb = lax.shift_right_logical(bits, np.uint32(9)) \
                | np.uint32(0x3F800000)
            floats = lax.bitcast_convert_type(fb, jnp.float32) \
                - jnp.float32(1.0)
            u = lax.max(lo, floats * (hi - lo) + lo)
            return jnp.float32(np.sqrt(2)) * lax.erf_inv(u)

        bits = jnp.arange(0, 2 ** 23, dtype=jnp.uint32) << 9
        a = np.asarray(jax.jit(jax_chain)(bits))
        b = np.asarray(jax.jit(prng.normal_from_bits)(bits))
        assert np.array_equal(a.view(np.int32), b.view(np.int32))
        # sanity: the extremes are large-but-finite normals
        assert np.all(np.isfinite(b))
        assert np.abs(b).max() > 5.0


class TestThreefry:
    def test_known_cipher_vector(self):
        """Threefry-2x32 known-answer test (the Random123 reference
        vector for zero key/counter) — guards the round constants."""
        z = jnp.zeros((1,), jnp.uint32)
        o0, o1 = prng.threefry2x32(z, z, z, z)
        # reference value from the Random123 distribution's kat_vectors
        assert int(o0[0]) == 0x6B200159
        assert int(o1[0]) == 0x99BA4EFE

    def test_matches_fold_in_composition(self):
        """fold_in(key, y) == threefry(key, threefry_seed(y)) — the
        driver-side year fold stays in XLA, but this pins the contract
        the in-kernel generator's keys are produced by."""
        base = jax.random.PRNGKey(42)
        folded = jax.random.fold_in(base, 9)
        kd = np.asarray(jax.random.key_data(base), np.uint32)
        seed_words = np.array([0, 9], np.uint32)  # threefry_seed(9)
        o0, o1 = prng.threefry2x32(
            jnp.full((1,), kd[0]), jnp.full((1,), kd[1]),
            jnp.full((1,), seed_words[0]), jnp.full((1,), seed_words[1]))
        fd = np.asarray(jax.random.key_data(folded), np.uint32)
        assert int(o0[0]) == int(fd[0]) and int(o1[0]) == int(fd[1])
