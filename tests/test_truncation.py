"""Eps-truncation (m < p) behavior: the balanced-block boundary moves to m,
matching the reference's p = phi.cols() quirk end-to-end."""

import numpy as np
import pytest

import jax.numpy as jnp

import oracle_numpy as O
from nle_tpu.ops.pipeline import apply_filter, train_filter


@pytest.fixture(scope="module")
def smooth_channel():
    # A smooth gradient with huge bandwidths -> strongly low-rank Ka.
    base = np.linspace(0, 255, 20)[None, :] + np.linspace(0, 50, 16)[:, None]
    return np.rint(np.clip(base, 0, 255)).astype(np.float64)


ARGS = (4, 5, 1e4, 1e4, 10, 5)


def test_truncates_below_p(smooth_channel):
    perm, Ka, Kab = O.compute_kernel(smooth_channel, *ARGS[:2], ARGS[2], ARGS[3])
    lam, _ = O.nystrom_approximation(Ka, Kab)
    assert lam.size < Ka.shape[0], "fixture must actually truncate"


def test_f64_matches_oracle_under_truncation(smooth_channel):
    V_o, S_o = O.train_filter(smooth_channel, *ARGS)
    V, S = train_filter(smooth_channel, *ARGS, dtype=jnp.float64, use_pallas=False)
    V, S = np.asarray(V), np.asarray(S)
    # The oracle drops rank-deficient trailing eigenpairs; we keep them as
    # exact-zero columns. Eigenvalues within ~1e-9 of the eps boundary may
    # legitimately differ (factored vs dense Wab rounding flips them across
    # the cutoff), so compare with that slack and only the well-separated
    # prefix of the filter action.
    j = S_o.size
    assert S.shape[0] >= j
    np.testing.assert_allclose(S[:j], S_o, atol=5e-9)
    np.testing.assert_array_equal(S[j:], np.zeros(S.size - j))
    np.testing.assert_array_equal(V[:, j:], np.zeros_like(V[:, j:]))
    # On this (deliberately) near-rank-1 fixture everything below the top
    # eigenvalue is in a chaotic near-degenerate subspace where even two f64
    # evaluation orders differ at ~1e-5; compare only the well-conditioned
    # top eigenpair's action tightly.
    live = S_o > 1e-3
    fS = O.transform_eigenvalues(S_o[live], [2, 3, 4, 1])
    out_o = O.apply_filter(V_o[:, live], fS, smooth_channel)
    out = np.asarray(
        apply_filter(
            jnp.asarray(V[:, :j][:, live]), jnp.asarray(fS), jnp.asarray(smooth_channel)
        )
    )
    np.testing.assert_allclose(out, out_o, atol=1e-6)


def test_f32_close_under_truncation(smooth_channel):
    V_o, S_o = O.train_filter(smooth_channel, *ARGS)
    V, S = train_filter(smooth_channel.astype(np.float32), *ARGS, use_pallas=False)
    live = S_o > 1e-3  # see f64 test: below this the subspace is chaotic
    fS = O.transform_eigenvalues(S_o[live], [2, 3, 4, 1])
    out_o = O.apply_filter(V_o[:, live], fS, smooth_channel)
    out = np.asarray(
        apply_filter(
            jnp.asarray(np.asarray(V)[:, : S_o.size][:, live]),
            jnp.asarray(fS, jnp.float32),
            jnp.asarray(smooth_channel, jnp.float32),
        )
    )
    assert np.abs(out - out_o).max() < 0.1
