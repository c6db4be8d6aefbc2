"""Runtime validity guard for the int16 Sinkhorn carrier (VERDICT r4 #2).

The carrier's documented failure domain — inputs that pack many decades of
dynamic range into single phi columns (uniform noise at small hx) — now
trips a crush-fraction statistic computed inside the quantizer's sweep and
riding the rc fetch; the host guard then retrains through the bit-pinned
f32 carrier with warn-and-continue logging. Thresholds from
tools/exp_carrier_domain.py: all 10 README configs <= 0.09 crushed,
failure domain >= 0.32; default threshold 0.2.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nle_tpu.ops.affinity import bandwidth_weights
from nle_tpu.ops.pallas.sinkhorn_kernel import (
    carrier_crush_frac,
    int16_forced_on,
    resolve_int16_guard,
)
from nle_tpu.ops.pipeline import (
    bucket_m,
    check_carrier_guard,
    ka_eigh_host64,
    pack_stage1,
    train_filter_stage2a,
)
from nle_tpu.ops.sampling import sample_grid


def test_crush_frac_counts_only_nonzero_entries():
    phi = jnp.asarray([[1000.0, 2.0],
                       [0.5, 1.0],      # 0.5 < scale0/2? scale0 ~ 0.0305
                       [0.0, 0.0],      # exact zeros never count
                       [0.001, 2.0]])   # 0.001 crushed in col 0
    scale = jnp.asarray([1000.0 / 32767, 2.0 / 32767])
    # col 0: nonzero {1000, 0.5, 0.001}; crushed iff |x| < scale0/2
    # = 0.01526 -> only 0.001. col 1: {2, 1, 2} all >= scale1/2. Total
    # nonzero = 6, crushed = 1.
    frac = float(carrier_crush_frac(phi, scale))
    assert abs(frac - 1.0 / 6.0) < 1e-6


def test_crush_frac_zero_matrix():
    phi = jnp.zeros((4, 2))
    scale = jnp.ones((2,))
    assert float(carrier_crush_frac(phi, scale)) == 0.0


def test_guard_resolver(monkeypatch):
    monkeypatch.delenv("NLE_INT16_GUARD", raising=False)
    assert resolve_int16_guard() == 0.2
    monkeypatch.setenv("NLE_INT16_GUARD", "off")
    assert resolve_int16_guard() is None
    monkeypatch.setenv("NLE_INT16_GUARD", "0.35")
    assert resolve_int16_guard() == 0.35
    monkeypatch.setenv("NLE_INT16_GUARD", "bogus")
    with pytest.raises(ValueError, match="NLE_INT16_GUARD"):
        resolve_int16_guard()
    monkeypatch.setenv("NLE_INT16_GUARD", "1.5")
    with pytest.raises(ValueError, match="threshold"):
        resolve_int16_guard()
    monkeypatch.delenv("NLE_SINKHORN_INT16", raising=False)
    assert not int16_forced_on()
    monkeypatch.setenv("NLE_SINKHORN_INT16", "on")
    assert int16_forced_on()
    monkeypatch.setenv("NLE_SINKHORN_INT16", "auto")
    assert not int16_forced_on()


def _rc(stat, mb=8):
    rc = np.zeros((3, mb))
    rc[2, :] = -1.0
    rc[2, 0] = stat
    return rc


def test_check_carrier_guard_decisions(monkeypatch, caplog):
    import logging

    monkeypatch.delenv("NLE_INT16_GUARD", raising=False)
    monkeypatch.delenv("NLE_SINKHORN_INT16", raising=False)
    # Legacy/streaming (2, mb) rc: no statistic, never trips.
    assert not check_carrier_guard(np.zeros((2, 8)))
    # Sentinel -1: carrier did not engage.
    assert not check_carrier_guard(_rc(-1.0))
    # In-domain.
    assert not check_carrier_guard(_rc(0.05))
    # Out-of-domain: warn + re-dispatch.
    with caplog.at_level(logging.WARNING):
        assert check_carrier_guard(_rc(0.5))
    assert "validity domain" in caplog.text
    # Operator forced the carrier on: warn only, no fallback.
    monkeypatch.setenv("NLE_SINKHORN_INT16", "on")
    caplog.clear()
    with caplog.at_level(logging.WARNING):
        assert not check_carrier_guard(_rc(0.5))
    assert "forced on" in caplog.text
    # Guard disabled.
    monkeypatch.setenv("NLE_SINKHORN_INT16", "auto")
    monkeypatch.setenv("NLE_INT16_GUARD", "off")
    assert not check_carrier_guard(_rc(0.9))


def test_sharded_guard_trips(monkeypatch, caplog):
    """The sharded trainer's guard follows the same policy on the psum'd
    per-element statistic (parallel/sharded.py _sharded_guard_trips).
    On CPU meshes the carrier only engages when forced on (where the
    override wins), so the fallback branch is exercised here directly;
    the TPU-mesh in-situ path shares every line but the fetch."""
    import logging

    from nle_tpu.parallel.sharded import _sharded_guard_trips

    monkeypatch.delenv("NLE_INT16_GUARD", raising=False)
    monkeypatch.delenv("NLE_SINKHORN_INT16", raising=False)
    assert not _sharded_guard_trips(jnp.asarray([0.01, 0.08]))
    with caplog.at_level(logging.WARNING):
        assert _sharded_guard_trips(jnp.asarray([0.01, 0.5]))
    assert "retraining this group" in caplog.text
    monkeypatch.setenv("NLE_SINKHORN_INT16", "on")
    caplog.clear()
    with caplog.at_level(logging.WARNING):
        assert not _sharded_guard_trips(jnp.asarray([0.5]))
    assert "forced on" in caplog.text
    monkeypatch.setenv("NLE_SINKHORN_INT16", "auto")
    monkeypatch.setenv("NLE_INT16_GUARD", "off")
    assert not _sharded_guard_trips(jnp.asarray([0.9]))


@pytest.fixture(scope="module")
def noise_problem():
    """The documented failure-domain repro: uniform noise at small hx
    (ROADMAP r4 carrier note) prepared for direct stage-2a dispatch."""
    rng = np.random.default_rng(0)
    h = w = 120
    L = rng.uniform(0, 255, size=(h, w)).astype(np.float64)
    hx, hy = 5.0, 30.0
    grid = sample_grid(h, w, 10, 10)
    p = grid.n_samples
    Um64, lam64, _ = ka_eigh_host64(
        L[grid.sel_rows, grid.sel_cols], grid.sel_rows, grid.sel_cols,
        hx, hy, 1e-10)
    m = lam64.shape[0]
    mb = bucket_m(m, p)
    y = jnp.asarray(L.reshape(-1)[grid.perm].astype(np.float32))
    rr = jnp.asarray((grid.perm // w).astype(np.float32))
    cc = jnp.asarray((grid.perm % w).astype(np.float32))
    sw, pw = bandwidth_weights(hx, hy)
    s1 = jnp.asarray(pack_stage1(Um64, lam64, mb=mb))
    return dict(y=y, rr=rr, cc=cc, s1=s1, sw=sw, pw=pw, p=p, mb=mb,
                n=grid.n_pixels)


def _stage2a(prob, **kw):
    return train_filter_stage2a(
        prob["y"], prob["rr"], prob["cc"], prob["s1"], prob["sw"],
        prob["pw"], p=prob["p"], mb=prob["mb"], n_sinkhorn_iter=10,
        eps=1e-10, use_pallas=True, interpret=True, **kw)


def test_noise_repro_trips_guard_and_f32_fallback_matches(noise_problem):
    """End-to-end on the repro: the quantized dispatch's statistic crosses
    the default threshold, check_carrier_guard orders the fallback, and
    the int16=False re-dispatch IS the plain f32 trajectory (bitwise vs a
    from-scratch f32 run — the bit-pinned machinery baseline)."""
    prob = noise_problem
    small = False   # force the non-small fused branch (carrier + split)
    rc_q, _, factor_q, _ = _stage2a(prob, small=small, split=True)
    rc_q = np.asarray(rc_q, np.float64)
    assert isinstance(factor_q, tuple)          # split layout engaged
    crush = rc_q[2, 0]
    assert crush > 0.2, f"repro no longer trips the guard (crush={crush})"
    assert check_carrier_guard(rc_q)
    # The guard's fallback dispatch…
    rc_f, sb_f, factor_f, c_f = _stage2a(prob, small=small, split=False,
                                         int16=False)
    rc_f = np.asarray(rc_f, np.float64)
    assert rc_f[2, 0] == -1.0                   # no carrier -> sentinel
    assert not check_carrier_guard(rc_f)
    # …equals the forced-f32 run bit-for-bit (same program, same inputs).
    with jax.disable_jit(False):
        os.environ["NLE_SINKHORN_INT16"] = "off"
        try:
            rc_ref, sb_ref, _, _ = _stage2a(prob, small=small, split=False)
        finally:
            del os.environ["NLE_SINKHORN_INT16"]
    np.testing.assert_array_equal(rc_f[:2], np.asarray(rc_ref)[:2])
    np.testing.assert_array_equal(np.asarray(sb_f), np.asarray(sb_ref))
    # Trajectory sanity: balancing vectors finite and nonnegative.
    assert np.isfinite(rc_f[:2]).all()
    assert (rc_f[:2] >= 0).all()


def test_real_image_stat_stays_in_domain():
    """A structured (real-image-like) channel keeps the statistic well
    under the threshold — the guard must not fire on the populations the
    golden gates cover (measured <= 0.09 on all 10 README configs)."""
    rng = np.random.default_rng(1)
    h = w = 96
    yy, xx = np.mgrid[0:h, 0:w]
    L = np.clip(120 + 60 * np.sin(xx / 11.0) + 40 * np.cos(yy / 7.0)
                + rng.normal(0, 6, (h, w)), 0, 255)
    hx, hy = 100.0, 30.0
    grid = sample_grid(h, w, 8, 8)
    p = grid.n_samples
    Um64, lam64, _ = ka_eigh_host64(
        L[grid.sel_rows, grid.sel_cols], grid.sel_rows, grid.sel_cols,
        hx, hy, 1e-10)
    mb = bucket_m(lam64.shape[0], p)
    prob = dict(
        y=jnp.asarray(L.reshape(-1)[grid.perm].astype(np.float32)),
        rr=jnp.asarray((grid.perm // w).astype(np.float32)),
        cc=jnp.asarray((grid.perm % w).astype(np.float32)),
        s1=jnp.asarray(pack_stage1(Um64, lam64, mb=mb)),
        sw=bandwidth_weights(hx, hy)[0], pw=bandwidth_weights(hx, hy)[1],
        p=p, mb=mb)
    rc, _, _, _ = _stage2a(prob, small=False, split=True)
    rc = np.asarray(rc, np.float64)
    stat = rc[2, 0]
    assert 0.0 <= stat < 0.2, stat
    assert not check_carrier_guard(rc)
