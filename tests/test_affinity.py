"""Affinity builders: parity with the oracle kernel and the fused
Pallas/XLA matmul paths."""

import numpy as np
import pytest

import jax.numpy as jnp

import oracle_numpy as O
from nle_tpu.ops.affinity import (
    affinity_block,
    affinity_matmul_xla,
    bandwidth_weights,
    features,
)
from nle_tpu.ops.pallas.affinity_kernel import affinity_matmul_pallas


def _setup(rng, h=12, w=16, nr=3, nc=4, hx=40.0, hy=25.0, dtype=jnp.float64):
    chan = rng.integers(0, 256, (h, w)).astype(np.float64)
    perm, Ka_o, Kab_o = O.compute_kernel(chan, nr, nc, hx, hy)
    from nle_tpu.ops.sampling import sample_grid

    g = sample_grid(h, w, nr, nc)
    flat = jnp.asarray(chan.reshape(-1), dtype)
    y = flat[g.perm]
    rr = jnp.asarray(g.perm // w, dtype)
    cc = jnp.asarray(g.perm % w, dtype)
    f = features(rr, cc, y)
    sw, pw = bandwidth_weights(hx, hy, dtype)
    return f, sw, pw, g.n_samples, Ka_o, Kab_o


def test_affinity_block_matches_oracle(rng):
    f, sw, pw, p, Ka_o, Kab_o = _setup(rng)
    fa, fb = f[:p], f[p:]
    np.testing.assert_allclose(np.asarray(affinity_block(fa, fa, sw, pw)), Ka_o, atol=1e-13)
    np.testing.assert_allclose(
        np.asarray(affinity_block(fa, fb, sw, pw)), Kab_o, atol=1e-13
    )


def test_affinity_block_diag_exact_one(rng):
    f, sw, pw, p, _, _ = _setup(rng)
    Ka = np.asarray(affinity_block(f[:p], f[:p], sw, pw))
    np.testing.assert_array_equal(np.diag(Ka), np.ones(p))
    np.testing.assert_array_equal(Ka, Ka.T)


def test_affinity_f32_close_to_f64(rng):
    # The raw-difference form keeps integer squares exact in f32; only the
    # final two scalings round (~2-3 ulp argument error).
    f, sw, pw, p, Ka_o, _ = _setup(rng, dtype=jnp.float32)
    Ka32 = np.asarray(affinity_block(f[:p], f[:p], sw, pw), np.float64)
    np.testing.assert_allclose(Ka32, Ka_o, rtol=5e-6)


def test_affinity_matmul_xla_fuses_correctly(rng):
    f, sw, pw, p, Ka_o, Kab_o = _setup(rng)
    B = jnp.asarray(rng.standard_normal((p, 7)))
    got = affinity_matmul_xla(f[:p], f[p:], B, sw, pw, tile=64)
    np.testing.assert_allclose(np.asarray(got), Kab_o.T @ np.asarray(B), atol=1e-12)


def test_affinity_matmul_pallas_interpret(rng):
    # Pallas kernel in interpreter mode on CPU against the oracle blocks.
    f, sw, pw, p, _, Kab_o = _setup(rng, dtype=jnp.float32)
    B = jnp.asarray(rng.standard_normal((p, 5)), jnp.float32)
    got = affinity_matmul_pallas(f[:p], f[p:], B, sw, pw, interpret=True)
    want = Kab_o.T @ np.asarray(B, np.float64)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-4)
