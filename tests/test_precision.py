"""Stage-2 dot-precision policy (ops/precision.py).

The golden gates certify the fidelity of the auto default end to end;
these tests pin the resolution logic (env -> per-site mode), the 3-pass
split's error class, and the f64 passthrough guard.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from nle_tpu.ops.precision import (
    dot_general_3pass,
    split_bf16,
    stage2_dots,
    stage2_gram,
    stage2_matmul,
)


def test_auto_is_exact_on_cpu(monkeypatch):
    # The suite runs on the CPU backend (conftest): auto must resolve to
    # exact dots at EVERY site — on CPU there is no MXU-pass wall and the
    # split would be pure fidelity downside.
    monkeypatch.delenv("NLE_STAGE2_DOTS", raising=False)
    assert stage2_dots("phi") == "highest"
    assert stage2_dots("gram") == "highest"
    assert stage2_dots("v") == "highest"


def test_forced_site_list(monkeypatch):
    monkeypatch.setenv("NLE_STAGE2_DOTS", "gram,v")
    assert stage2_dots("gram") == "high"
    assert stage2_dots("v") == "high"
    # The phi site is never split by a gram,v list — the CPU bisection
    # showed splitting it collapses bird to 8.3 dB.
    assert stage2_dots("phi") == "highest"
    monkeypatch.setenv("NLE_STAGE2_DOTS", "highest")
    assert all(stage2_dots(s) == "highest" for s in ("phi", "gram", "v"))
    monkeypatch.setenv("NLE_STAGE2_DOTS", "high")
    assert all(stage2_dots(s) == "high" for s in ("phi", "gram", "v"))


def test_bad_values_raise(monkeypatch):
    monkeypatch.setenv("NLE_STAGE2_DOTS", "bogus")
    with pytest.raises(ValueError):
        stage2_dots("gram")
    monkeypatch.setenv("NLE_STAGE2_DOTS", "gram,nope")
    with pytest.raises(ValueError):
        stage2_dots("gram")
    monkeypatch.delenv("NLE_STAGE2_DOTS", raising=False)
    with pytest.raises(ValueError):
        stage2_dots("not-a-site")


def test_split_bf16_reconstructs_16_bits():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((64, 64)).astype(np.float32))
    hi, lo = split_bf16(x)
    err = np.abs(np.asarray(hi, np.float64) + np.asarray(lo, np.float64)
                 - np.asarray(x, np.float64))
    # hi + lo captures the top 16 mantissa bits: remainder <= |x| * 2^-16
    # (a few ulp slack for the double rounding).
    assert float(np.max(err / (np.abs(np.asarray(x)) + 1e-30))) < 3 * 2**-16


def test_3pass_error_class():
    rng = np.random.default_rng(1)
    k = 600
    a = rng.random((256, k)).astype(np.float32)        # affinity-like
    b = rng.standard_normal((k, 128)).astype(np.float32)
    want = np.asarray(a, np.float64) @ np.asarray(b, np.float64)
    got = np.asarray(dot_general_3pass(
        jnp.asarray(a), jnp.asarray(b), (((1,), (0,)), ((), ()))))
    exact32 = np.asarray(jnp.dot(jnp.asarray(a), jnp.asarray(b)))
    # Error relative to the accumulated term magnitude (row x col norms):
    # ~3 * 2^-16 per product, random accumulation over k terms.
    scale = (np.linalg.norm(a, axis=1)[:, None]
             * np.linalg.norm(b, axis=0)[None, :])
    rel = np.max(np.abs(got - want) / scale)
    assert rel < 1e-3
    # And the split actually engaged (bitwise different from exact f32).
    assert not np.array_equal(got, exact32)


def test_f64_passthrough_is_exact(monkeypatch):
    # Forcing high must NOT touch f64 operands (the golden-oracle runs).
    # x64 is enabled globally by conftest (jax.experimental.enable_x64 was
    # removed in JAX 0.9).
    monkeypatch.setenv("NLE_STAGE2_DOTS", "high")
    rng = np.random.default_rng(2)
    a = jnp.asarray(rng.standard_normal((32, 48)), jnp.float64)
    b = jnp.asarray(rng.standard_normal((48, 16)), jnp.float64)
    assert a.dtype == jnp.float64
    # rtol 1e-12: XLA's f64 dot and NumPy's differ in summation order
    # (~1e-13 observed); an accidental f32 narrowing would be ~1e-7.
    got = np.asarray(stage2_matmul(a, b, "gram"))
    want = np.asarray(a) @ np.asarray(b)
    np.testing.assert_allclose(got, want, rtol=1e-12)
    g = np.asarray(stage2_gram(a))
    np.testing.assert_allclose(g, np.asarray(a).T @ np.asarray(a),
                               rtol=1e-12)


def test_forced_gram_matches_3pass(monkeypatch):
    # stage2_gram under a forced split reproduces dot_general_3pass
    # exactly (same decomposition, contract over rows).
    monkeypatch.setenv("NLE_STAGE2_DOTS", "gram")
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal((128, 64)).astype(np.float32))
    got = np.asarray(stage2_gram(a))
    want = np.asarray(dot_general_3pass(a, a, (((0,), (0,)), ((), ()))))
    np.testing.assert_array_equal(got, want)


def test_auto_splits_only_in_kernel_sites(monkeypatch):
    """The auto rule splits gram/v only at IN-KERNEL sites (the scaled
    Pallas kernels): the XLA small-path split measured ~1% speed for a
    15 dB golden-margin cost on taj-denoise (r4 chip bisection). Forced
    modes still apply everywhere."""
    monkeypatch.delenv("NLE_STAGE2_DOTS", raising=False)
    assert stage2_dots("gram", on_tpu=True) == "highest"
    assert stage2_dots("v", on_tpu=True) == "highest"
    assert stage2_dots("gram", on_tpu=True, in_kernel=True) == "high"
    assert stage2_dots("v", on_tpu=True, in_kernel=True) == "high"
    assert stage2_dots("phi", on_tpu=True, in_kernel=True) == "highest"
    monkeypatch.setenv("NLE_STAGE2_DOTS", "gram,v")
    assert stage2_dots("gram", on_tpu=True) == "high"   # forced: everywhere
