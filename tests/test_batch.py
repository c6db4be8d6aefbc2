"""Pipelined multi-image training must reproduce per-image train_filter."""

import numpy as np
import pytest

import jax.numpy as jnp

from nle_tpu.models.batch import train_filters_pipelined
from nle_tpu.ops.pipeline import apply_filter, train_filter
from nle_tpu.ops.transform import transform_eigenvalues


def test_pipelined_matches_single():
    rng = np.random.default_rng(5)
    chans = [rng.integers(0, 256, (30, 40)).astype(np.float32)
             for _ in range(3)]
    flts = train_filters_pipelined(chans, 4, 5, 40.0, 20.0, 8, 4)
    _assert_matches_single(chans, flts)


def test_past_capacity_falls_back_to_sequential(monkeypatch):
    """Past the two-phi lookahead ceiling the pipelined trainer must
    train sequentially (streaming-capable) and still yield filters
    equivalent to per-image train_filter."""
    import nle_tpu.models.batch as batch_mod

    monkeypatch.setattr(batch_mod, "fits_pipeline",
                        lambda n, nr, nc: False)
    rng = np.random.default_rng(6)
    chans = [rng.integers(0, 256, (30, 40)).astype(np.float32)
             for _ in range(2)]
    flts = train_filters_pipelined(chans, 4, 5, 40.0, 20.0, 8, 4)
    _assert_matches_single(chans, flts)


def _assert_matches_single(chans, flts):
    w = [1.0, 2.0, 1.5, 1.2]
    for chan, flt in zip(chans, flts):
        V1, S1 = train_filter(chan, 4, 5, hx=40.0, hy=20.0,
                              n_sinkhorn_iter=8, n_eig_vectors=4)
        np.testing.assert_allclose(np.asarray(flt.eigvals), np.asarray(S1),
                                   rtol=1e-5, atol=1e-8)
        # compare the filter action (eigvec sign freedom)
        Vp = flt.eigvecs_pixel_order()
        fS = transform_eigenvalues(jnp.asarray(S1), w)
        out_p = np.asarray(apply_filter(jnp.asarray(Vp), fS, jnp.asarray(chan)))
        out_1 = np.asarray(apply_filter(V1, fS, jnp.asarray(chan)))
        assert np.abs(out_p - out_1).max() < 1e-3


def test_iter_is_lazy_on_streaming_producers():
    """train_filters_iter must not materialize a lazy producer: with the
    one-image lookahead, the first filter arrives after pulling at most
    two frames — a long stream's tail stays unproduced until needed."""
    from nle_tpu.models.batch import train_filters_iter

    rng = np.random.default_rng(0)
    frames = [rng.integers(0, 256, (20, 24)).astype(np.float32)
              for _ in range(6)]
    pulled = []

    def producer():
        for i, f in enumerate(frames):
            pulled.append(i)
            yield f

    it = train_filters_iter(producer(), 3, 4, 100.0, 30.0, 3, 3)
    first = next(it)
    assert first.eigvecs.shape[0] == 20 * 24
    assert len(pulled) <= 3, pulled   # first + lookahead, not the stream
    rest = list(it)
    assert len(rest) == 5 and len(pulled) == 6


def test_iter_mixed_shapes_raise():
    from nle_tpu.models.batch import train_filters_iter

    rng = np.random.default_rng(1)
    frames = [rng.integers(0, 256, (20, 24)).astype(np.float32),
              rng.integers(0, 256, (24, 20)).astype(np.float32)]
    with pytest.raises(ValueError, match="same-shape"):
        list(train_filters_iter(frames, 3, 4, 100.0, 30.0, 3, 3))


def test_iter_degenerate_stage1_raises_cleanly():
    """A NaN-poisoned frame must raise a clean ValueError from stage 1
    (scipy's finiteness check), never an obscure zero-width stage-2 crash.
    (True m == 0 is unreachable for finite inputs — trace(Ka) = p forces
    an eigenvalue >= 1 — but submit() guards it as defense-in-depth,
    mirroring train_filter.)"""
    from nle_tpu.models.batch import train_filters_iter

    bad = np.full((20, 24), np.nan, np.float32)
    with pytest.raises(ValueError):
        list(train_filters_iter([bad], 3, 4, 100.0, 30.0, 3, 3))


def test_reuse_delta_warm_start():
    """Opt-in temporal warm-start (VERDICT r4 #8): frames within the
    L-delta threshold of the last TRAINED frame reuse its filter; a frame
    past the threshold retrains and becomes the new reference."""
    from nle_tpu.models.batch import train_filters_iter

    rng = np.random.default_rng(7)
    base = rng.integers(0, 256, (30, 40)).astype(np.float32)
    other = rng.integers(0, 256, (30, 40)).astype(np.float32)
    chans = [base, np.clip(base + 1, 0, 255), other,
             np.clip(other + 1, 0, 255)]
    flts = list(train_filters_iter(chans, 4, 5, 40.0, 20.0, 8, 4,
                                   reuse_delta=3.0))
    assert len(flts) == 4
    assert flts[1] is flts[0]          # within threshold -> reused
    assert flts[2] is not flts[0]      # big change -> retrained
    assert flts[3] is flts[2]          # near the NEW reference -> reused
    # Default (no reuse_delta): every frame trains its own filter.
    flts0 = list(train_filters_iter(chans, 4, 5, 40.0, 20.0, 8, 4))
    assert all(a is not b for a, b in zip(flts0, flts0[1:]))


def test_reuse_delta_sequential_fallback(monkeypatch):
    import nle_tpu.models.batch as batch_mod

    monkeypatch.setattr(batch_mod, "fits_pipeline",
                        lambda *a, **k: False)
    rng = np.random.default_rng(8)
    base = rng.integers(0, 256, (30, 40)).astype(np.float32)
    chans = [base, np.clip(base + 1, 0, 255)]
    flts = list(batch_mod.train_filters_iter(
        chans, 4, 5, 40.0, 20.0, 8, 4, reuse_delta=3.0))
    assert flts[1] is flts[0]


def test_lookahead_schedules_match():
    """lookahead=2 must yield the SAME filters in the same order as the
    classic schedule (only submission timing differs)."""
    from nle_tpu.models.batch import train_filters_iter

    rng = np.random.default_rng(9)
    chans = [rng.integers(0, 256, (30, 40)).astype(np.float32)
             for _ in range(4)]
    f1 = list(train_filters_iter(chans, 4, 5, 40.0, 20.0, 8, 4,
                                 lookahead=1))
    f2 = list(train_filters_iter(chans, 4, 5, 40.0, 20.0, 8, 4,
                                 lookahead=2))
    assert len(f1) == len(f2) == 4
    for a, b in zip(f1, f2):
        np.testing.assert_array_equal(np.asarray(a.eigvals),
                                      np.asarray(b.eigvals))
        np.testing.assert_array_equal(np.asarray(a.eigvecs),
                                      np.asarray(b.eigvecs))
