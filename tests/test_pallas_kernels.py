"""Interpreter-mode coverage for the Pallas kernels that otherwise only
execute on real TPU hardware (the large-image capacity path and the manual
Sinkhorn kernel's wrapper plumbing)."""

import numpy as np
import pytest

import jax.numpy as jnp

from nle_tpu.ops.pallas.scaled_matmul_kernel import (
    scaled_gram_pallas,
    scaled_matmul_pallas,
)
from nle_tpu.ops.pallas.sinkhorn_kernel import padded_shape


@pytest.fixture()
def padded_factor(rng):
    n, m = 1500, 37
    npad, mpad = padded_shape(n, m, tile=1024)
    phi = np.zeros((npad, mpad), np.float32)
    phi[:n, :m] = rng.standard_normal((n, m)).astype(np.float32)
    c = np.zeros((npad, 1), np.float32)
    c[5:n, 0] = rng.random(n - 5).astype(np.float32)
    return jnp.asarray(phi), jnp.asarray(c), n, m


def test_scaled_gram_matches_dense(padded_factor):
    phi, c, n, m = padded_factor
    got = np.asarray(scaled_gram_pallas(phi, c, interpret=True))[:m, :m]
    # f64 reference: both `got` and a dense f32 numpy product carry their own
    # summation-order noise over n=1500 terms, so comparing the two f32 results
    # at ~eps tolerance is flaky (fails for some session-rng draw orders).
    cphi = np.asarray(c).astype(np.float64) * np.asarray(phi).astype(np.float64)
    want = (cphi.T @ cphi)[:m, :m]
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=1e-4)


def test_scaled_matmul_matches_dense(padded_factor, rng):
    phi, c, n, m = padded_factor
    kpad = 128
    B = np.zeros((phi.shape[1], kpad), np.float32)
    B[:m, :7] = rng.standard_normal((m, 7)).astype(np.float32)
    got = np.asarray(scaled_matmul_pallas(phi, c, jnp.asarray(B), interpret=True))
    want = ((np.asarray(c).astype(np.float64) * np.asarray(phi).astype(np.float64))
            @ B.astype(np.float64))
    np.testing.assert_allclose(got[:n, :7], want[:n, :7], rtol=2e-4, atol=1e-4)


def test_padded_shape_rule():
    assert padded_shape(1, 1) == (2048, 128)
    assert padded_shape(2048, 128) == (2048, 128)
    assert padded_shape(2049, 129) == (4096, 256)


def test_affinity_ptiled_matches_xla(rng):
    """p > MAX_PALLAS_P takes the p-tiled accumulating kernel."""
    from nle_tpu.ops.affinity import affinity_matmul_xla, bandwidth_weights, features
    from nle_tpu.ops.pallas.affinity_kernel import (
        MAX_PALLAS_P,
        affinity_matmul_pallas,
    )

    p, q, m = MAX_PALLAS_P + 176, 1400, 260
    rows = jnp.asarray(rng.integers(0, 200, p + q), jnp.float32)
    cols = jnp.asarray(rng.integers(0, 200, p + q), jnp.float32)
    y = jnp.asarray(rng.integers(0, 256, p + q), jnp.float32)
    f = features(rows, cols, y)
    sw, pw = bandwidth_weights(500.0, 20.0)
    B = jnp.asarray(rng.standard_normal((p, m)).astype(np.float32) * 0.1)
    want = np.asarray(affinity_matmul_xla(f[:p], f[p:], B, sw, pw))
    got = np.asarray(affinity_matmul_pallas(f[:p], f[p:], B, sw, pw, interpret=True))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_sinkhorn_fused_bf16_polish_matches_f32():
    """The mixed-precision Sinkhorn schedule (leading bf16 iterations +
    trailing f32 polish) stays within its documented error bound of the
    all-f32 trajectory (contraction polishes the bf16 rounding)."""
    from nle_tpu.ops.pallas.sinkhorn_kernel import sinkhorn_vectors_fused
    from nle_tpu.ops.sinkhorn import sinkhorn_vectors

    # Local generator: the session rng's draw order feeds other tests.
    rng = np.random.default_rng(7)
    n, m = 1500, 24
    # A realistic positive low-rank factor: affinity-like columns.
    phi = np.abs(rng.standard_normal((n, m))).astype(np.float32) * 0.3 + 0.05
    lam = np.linspace(1.0, 0.2, m).astype(np.float32)
    r_ref, c_ref = sinkhorn_vectors(jnp.asarray(phi), jnp.asarray(lam), 8, 1e-10)
    # This synthetic factor contracts slowly (~0.75/iter), so the polish
    # leaves ~1e-3 relative error here; real affinity factors land much
    # closer, and the hard gate is golden PSNR (tools/golden_sweep.py).
    r, c = sinkhorn_vectors_fused(jnp.asarray(phi), jnp.asarray(lam), 8,
                                  1e-10, interpret=True, n=n, bf16_iters=6)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref), rtol=5e-3)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref), rtol=5e-3)
    # All-f32 through the same driver stays at f32 noise.
    r, c = sinkhorn_vectors_fused(jnp.asarray(phi), jnp.asarray(lam), 8,
                                  1e-10, interpret=True, n=n, bf16_iters=0)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref), rtol=5e-5)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref), rtol=5e-5)


def test_resolve_bf16_iters_policy(monkeypatch):
    from nle_tpu.ops.pallas.sinkhorn_kernel import _resolve_bf16_iters

    monkeypatch.delenv("NLE_SINKHORN_BF16", raising=False)
    assert _resolve_bf16_iters(10, None) == 0   # OFF by default (fidelity)
    assert _resolve_bf16_iters(10, 5) == 5      # explicit arg enables
    assert _resolve_bf16_iters(10, 99) == 10
    monkeypatch.setenv("NLE_SINKHORN_BF16", "auto")
    assert _resolve_bf16_iters(10, None) == 8
    assert _resolve_bf16_iters(4, None) == 2
    assert _resolve_bf16_iters(3, None) == 0    # too few to amortize the copy
    monkeypatch.setenv("NLE_SINKHORN_BF16", "off")
    assert _resolve_bf16_iters(10, None) == 0
    monkeypatch.setenv("NLE_SINKHORN_BF16", "all")
    assert _resolve_bf16_iters(10, None) == 10
    monkeypatch.setenv("NLE_SINKHORN_BF16", "3")
    assert _resolve_bf16_iters(10, None) == 3
