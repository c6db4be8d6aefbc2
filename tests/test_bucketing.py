"""m-bucketed stage-2 compiles: the kept rank m is data-dependent, so
stage 2 compiles per rank BUCKET mb = bucket_m(m, p) with the true m traced
(ops/pipeline.py). These tests pin (a) the bucket rule, (b) result
equivalence with the exact-m compile on every stage-2 path, and (c) that
ranks within one bucket actually share a compiled program."""

import logging

import numpy as np
import pytest

import jax.numpy as jnp

from nle_tpu.ops.pipeline import (
    bucket_m,
    ka_eigh_host64,
    pack_stage1,
    train_filter,
    train_filter_stage2a,
    train_filter_stage2b,
)
from nle_tpu.ops.sampling import sample_grid


def test_bucket_m_rule(monkeypatch):
    monkeypatch.setenv("NLE_M_BUCKET", "128")
    assert bucket_m(1, 30) == 30       # capped at p for small grids
    assert bucket_m(30, 30) == 30
    assert bucket_m(1, 600) == 128
    assert bucket_m(128, 600) == 128
    assert bucket_m(129, 600) == 256
    assert bucket_m(517, 600) == 600   # round-up crosses p -> cap
    monkeypatch.setenv("NLE_M_BUCKET", "1")
    assert bucket_m(37, 600) == 37     # disabled: exact rank
    monkeypatch.setenv("NLE_M_BUCKET", "64")
    assert bucket_m(37, 600) == 64


def test_pack_stage1_roundtrip_and_uinv_recompute():
    """pack_stage1 ships [Um; lam; m-digits] only; _unpack_stage1 must
    recover Um/lam/m exactly and recompute Uinv = Um/lam as the plain f32
    division of the ROUNDED operands (zero on the padded columns)."""
    from nle_tpu.ops.pipeline import _unpack_stage1

    rng = np.random.default_rng(0)
    p, m, mb = 12, 7, 10
    Um64 = rng.standard_normal((p, m))
    lam64 = np.sort(rng.uniform(1e-8, 2.0, m))[::-1].copy()
    packed = pack_stage1(Um64, lam64, mb=mb)
    assert packed.shape == (p + 2, mb)
    Um, lam, Uinv, m_dyn = _unpack_stage1(jnp.asarray(packed), p)
    assert int(m_dyn) == m
    np.testing.assert_array_equal(np.asarray(Um)[:, :m],
                                  Um64.astype(np.float32))
    np.testing.assert_array_equal(np.asarray(lam)[:m],
                                  lam64.astype(np.float32))
    expect = Um64.astype(np.float32) / lam64.astype(np.float32)[None, :]
    np.testing.assert_array_equal(np.asarray(Uinv)[:, :m], expect)
    np.testing.assert_array_equal(np.asarray(Uinv)[:, m:], 0.0)
    np.testing.assert_array_equal(np.asarray(Um)[:, m:], 0.0)
    # m > 255 exercises the second base-256 digit.
    p2, m2 = 300, 257
    packed2 = pack_stage1(np.ones((p2, m2)), np.ones(m2), mb=m2)
    assert int(_unpack_stage1(jnp.asarray(packed2), p2)[3]) == m2


def test_submit_sb_fetch_resolves_f64():
    """The async Sb fetch resolves to the bit-exact f64 matrix for any
    bucket size (incl. odd, non-tile-aligned mb)."""
    from nle_tpu.ops.pipeline import submit_sb_fetch

    rng = np.random.default_rng(1)
    for mb in (1, 5, 128, 131):
        a = rng.standard_normal((mb, mb)).astype(np.float32)
        sb = a @ a.T  # symmetric
        out = submit_sb_fetch(jnp.asarray(sb))()
        assert out.dtype == np.float64
        np.testing.assert_array_equal(out, sb.astype(np.float64))


@pytest.fixture()
def truncating_image():
    """An (image, params) pair whose Ka spectrum truncates (m < p), so the
    balanced-block boundary genuinely moves inside the bucket."""
    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, (80, 90)).astype(np.float32)
    hx, hy = 3000.0, 300.0
    grid = sample_grid(80, 90, 5, 6)
    _, lam64, _ = ka_eigh_host64(
        img.astype(np.float64)[grid.sel_rows, grid.sel_cols],
        grid.sel_rows, grid.sel_cols, hx, hy, 1e-10)
    m, p = lam64.shape[0], grid.n_samples
    assert 0 < m < p, "fixture must truncate"
    return img, hx, hy


def _run(img, hx, hy, **kw):
    V, S = train_filter(img, 5, 6, hx, hy, 6, 4, **kw)
    return np.asarray(V), np.asarray(S)


def test_bucketed_matches_exact_dense(truncating_image, monkeypatch):
    img, hx, hy = truncating_image
    monkeypatch.setenv("NLE_M_BUCKET", "1")
    V0, S0 = _run(img, hx, hy)
    monkeypatch.setenv("NLE_M_BUCKET", "128")
    V1, S1 = _run(img, hx, hy)
    # Identical algebra; only XLA's shape-dependent reduction strategy may
    # differ (f32 noise).
    np.testing.assert_allclose(V1, V0, rtol=2e-5, atol=1e-7)
    np.testing.assert_allclose(S1, S0, rtol=5e-5, atol=1e-8)


def test_bucketed_matches_exact_streaming(truncating_image, monkeypatch):
    img, hx, hy = truncating_image
    monkeypatch.setenv("NLE_M_BUCKET", "1")
    V0, S0 = _run(img, hx, hy, streaming=True)
    monkeypatch.setenv("NLE_M_BUCKET", "128")
    V1, S1 = _run(img, hx, hy, streaming=True)
    np.testing.assert_allclose(V1, V0, rtol=2e-4, atol=5e-6)
    np.testing.assert_allclose(S1, S0, rtol=5e-5, atol=1e-8)


def _stage2_manual(img, nr, nc, hx, hy, mb_env, monkeypatch, *, fused,
                   small=None):
    """Drive stage 2a/2b directly (the TPU fused path via interpret=True)
    and finish with the host chain, returning packed-order V."""
    from nle_tpu.ops.affinity import bandwidth_weights
    from nle_tpu.ops.orthogonalize import host_chain64
    from nle_tpu.ops.pipeline import bucket_m as _bm, stage2_dense_small

    monkeypatch.setenv("NLE_M_BUCKET", mb_env)
    # These tests verify BUCKETING semantics (masks, boundaries, shapes) by
    # comparing the fused branch against the XLA branch at f32 noise; pin
    # the now-default int16 Sinkhorn stream off so its ~2^-16 quantization
    # does not blur the comparison (that mode has its own gates:
    # test_sinkhorn_fused_int16_tracks_f32 + the TPU golden sweep).
    monkeypatch.setenv("NLE_SINKHORN_INT16", "off")
    h, w = img.shape
    grid = sample_grid(h, w, nr, nc)
    p = grid.n_samples
    Um64, lam64, Uinv64 = ka_eigh_host64(
        img.astype(np.float64)[grid.sel_rows, grid.sel_cols],
        grid.sel_rows, grid.sel_cols, hx, hy, 1e-10)
    m = lam64.shape[0]
    mb = _bm(m, p)
    y = jnp.asarray(img.reshape(-1)[grid.perm])
    rr = jnp.asarray((grid.perm // w).astype(np.float32))
    cc = jnp.asarray((grid.perm % w).astype(np.float32))
    sw, pw = bandwidth_weights(hx, hy)
    s1 = jnp.asarray(pack_stage1(Um64, lam64, mb=mb))
    if small is None:
        small = stage2_dense_small(grid.n_pixels, mb)
    rc, sb, factor, c_rest = train_filter_stage2a(
        y, rr, cc, s1, sw, pw, p=p, mb=mb, n_sinkhorn_iter=6, eps=1e-10,
        use_pallas=fused, interpret=fused, small=small)
    rc_np = np.asarray(rc, np.float64)
    rt, ct = rc_np[0][:m], rc_np[1][:m]
    Sb = np.asarray(sb, np.float64)[:m, :m]
    k = min(4, m)
    phi_top = Um64[:m]
    Ga = phi_top * lam64[None, :]
    RGa = rt[:, None] * Ga
    Wa = RGa @ (ct[:, None] * phi_top).T
    Va, GrT, Sq = host_chain64(Wa, RGa, Sb, k, 1e-10)
    va_np = np.zeros((mb, 2 * k))
    va_np[:m, :k] = Va
    va_np[:m, k:] = GrT
    scaled = (not fused) or small
    V = train_filter_stage2b(
        factor, c_rest, jnp.asarray(va_np, jnp.float32),
        n=grid.n_pixels, mb=mb, scaled=scaled, interpret=fused)
    return np.asarray(V), Sq, m, mb


def test_bucketed_fused_path_matches_xla(truncating_image, monkeypatch):
    """The TPU fused-kernel branch (padded phi + fused Sinkhorn + Pallas
    gram/matmul, run in interpreter mode) agrees with the XLA branch under
    bucketing."""
    img, hx, hy = truncating_image
    Vx, Sx, m, mb = _stage2_manual(img, 5, 6, hx, hy, "128", monkeypatch,
                                   fused=False)
    Vf, Sf, mf, mbf = _stage2_manual(img, 5, 6, hx, hy, "128", monkeypatch,
                                     fused=True)
    assert (m, mb) == (mf, mbf) and m < mb
    np.testing.assert_allclose(Sf, Sx, rtol=5e-5, atol=1e-8)
    np.testing.assert_allclose(Vf, Vx, rtol=5e-4, atol=2e-5)


def test_bucketed_fused_large_image_path(truncating_image, monkeypatch):
    """small=False forces the large-image branch (scaling fused into the
    Pallas gram/matmul kernels; phi is the only N-scale buffer)."""
    img, hx, hy = truncating_image
    Vx, Sx, _, _ = _stage2_manual(img, 5, 6, hx, hy, "128", monkeypatch,
                                  fused=False)
    Vf, Sf, _, _ = _stage2_manual(img, 5, 6, hx, hy, "128", monkeypatch,
                                  fused=True, small=False)
    np.testing.assert_allclose(Sf, Sx, rtol=5e-5, atol=1e-8)
    np.testing.assert_allclose(Vf, Vx, rtol=5e-4, atol=2e-5)


def test_ranks_share_compiled_program(monkeypatch, caplog):
    """Two images whose kept ranks differ but land in one bucket reuse the
    same stage-2a executable (no recompile; the whole point of bucketing)."""
    monkeypatch.setenv("NLE_M_BUCKET", "128")
    rng = np.random.default_rng(5)
    img1 = rng.integers(0, 256, (120, 130)).astype(np.float32)
    img2 = np.clip(img1 + rng.normal(0, 25, img1.shape), 0, 255
                   ).astype(np.float32)
    hx, hy = 5000.0, 60.0
    grid = sample_grid(120, 130, 7, 8)
    ms = []
    for img in (img1, img2):
        _, lam64, _ = ka_eigh_host64(
            img.astype(np.float64)[grid.sel_rows, grid.sel_cols],
            grid.sel_rows, grid.sel_cols, hx, hy, 1e-10)
        ms.append(lam64.shape[0])
    assert ms[0] != ms[1], f"fixture ranks coincide ({ms}); change the seed"
    assert bucket_m(ms[0], grid.n_samples) == bucket_m(ms[1], grid.n_samples)
    with caplog.at_level(logging.ERROR):   # silence truncation warnings
        train_filter(img1, 7, 8, hx, hy, 4, 4)
        size_after_first = train_filter_stage2a._cache_size()
        train_filter(img2, 7, 8, hx, hy, 4, 4)
    assert train_filter_stage2a._cache_size() == size_after_first


def test_pack_stage1_device_matches_host():
    """pack_stage1_device (the stage1='device' on-device assembly) must
    produce the exact layout pack_stage1 defines — one packing contract,
    two implementations, pinned against each other (incl. a rank needing
    two base-256 digits)."""
    from nle_tpu.ops.pipeline import pack_stage1_device

    rng = np.random.default_rng(1)
    for p, m, mb in [(12, 7, 10), (300, 260, 384)]:
        Um64 = rng.standard_normal((p, m))
        lam64 = np.sort(rng.uniform(1e-8, 2.0, m))[::-1].copy()
        host = pack_stage1(Um64, lam64, mb=mb)
        dev = pack_stage1_device(
            jnp.asarray(Um64, jnp.float32), jnp.asarray(lam64, jnp.float32),
            m, mb, jnp.float32)
        np.testing.assert_array_equal(np.asarray(dev), host)


def test_split_buffer_stage2_matches_assembled_int16(monkeypatch):
    """The split-buffer stage 2 (r4: Um and phi_b never concatenated —
    the int16 default's layout, resolve_split_stage2) reproduces the
    assembled int16 trajectory to quantization class: rc within ~2^-16
    amplification, the filter ACTION sub-gray-level. Also pins the
    protocol pieces: the (2, p) rc, the tuple factor, and the host-packed
    [top; GrT] upload."""
    cv2 = pytest.importorskip("cv2")
    monkeypatch.setenv("NLE_SINKHORN_INT16", "on")
    from nle_tpu.ops.affinity import bandwidth_weights
    from nle_tpu.ops.pipeline import (
        apply_filter,
        host_orthogonalize,
        pack_stage2b_upload,
        train_filter_stage2b,
    )
    from nle_tpu.ops.transform import transform_eigenvalues

    img = cv2.imread("/root/reference/data/bird.bmp")
    L = cv2.cvtColor(img, cv2.COLOR_BGR2Lab)[..., 0][:150, :180]
    L = L.astype(np.float32)
    nr, nc, hx, hy, iters, kk = 6, 8, 300.0, 30.0, 10, 8
    h, w = L.shape
    grid = sample_grid(h, w, nr, nc)
    p = grid.n_samples
    Um64, lam64, _ = ka_eigh_host64(
        L.astype(np.float64)[grid.sel_rows, grid.sel_cols],
        grid.sel_rows, grid.sel_cols, hx, hy, 1e-10)
    m = lam64.shape[0]
    mb = bucket_m(m, p)
    y = jnp.asarray(L.reshape(-1)[grid.perm])
    rr = jnp.asarray((grid.perm // w).astype(np.float32))
    cc = jnp.asarray((grid.perm % w).astype(np.float32))
    sw, pw = bandwidth_weights(hx, hy)
    s1 = jnp.asarray(pack_stage1(Um64, lam64, mb=mb))

    def run(small):
        rc, sb, factor, c_rest = train_filter_stage2a(
            y, rr, cc, s1, sw, pw, p=p, mb=mb, n_sinkhorn_iter=iters,
            eps=1e-10, use_pallas=True, interpret=True, small=small)
        split = isinstance(factor, tuple)
        rc_np = np.asarray(rc, np.float64)
        k = min(kk, m)
        va_np, Sq = host_orthogonalize(
            rc_np, np.asarray(sb, np.float64), Um64, lam64, m, mb, k, 1e-10)
        va = jnp.asarray(
            pack_stage2b_upload(split, va_np, rc_np, Um64, m, p, k),
            jnp.float32)
        V = train_filter_stage2b(factor, c_rest, va, n=grid.n_pixels,
                                 mb=mb, scaled=small, interpret=True)
        return np.asarray(V), np.asarray(Sq), split, rc_np

    V_a, S_a, split_a, rc_a = run(small=True)    # assembled int16 (small)
    V_s, S_s, split_s, rc_s = run(small=False)   # split layout
    assert not split_a and split_s
    # Row 2 carries the carrier crush statistic (rides the rc fetch);
    # rows 0/1 are the balancing vectors as before.
    assert rc_s.shape == (3, p)
    assert 0.0 <= rc_s[2, 0] <= 1.0      # int16 engaged on both layouts
    assert 0.0 <= rc_a[2, 0] <= 1.0
    assert np.abs(rc_s[:2, :mb] - rc_a[:2, :mb]).max() < 1e-3
    fS = transform_eigenvalues(jnp.asarray(S_a), [2.0, 3.0, 4.0, 1.0])
    o_a = np.asarray(apply_filter(jnp.asarray(V_a), fS, y))
    o_s = np.asarray(apply_filter(jnp.asarray(V_s), fS, y))
    assert np.abs(o_s - o_a).max() < 2.0
