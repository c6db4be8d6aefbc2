"""End-to-end train_filter parity with the fp64 oracle, f32 accuracy, and
model-layer guard behavior."""

import numpy as np
import pytest

import jax.numpy as jnp

import oracle_numpy as O
from nle_tpu.models.filter import NLEFilter, TrainedFilter
from nle_tpu.ops.pipeline import apply_filter, train_filter

ARGS = (3, 4, 50.0, 30.0, 10, 5)  # nr, nc, hx, hy, iters, k


@pytest.fixture(scope="module")
def chan():
    rng = np.random.default_rng(7)
    return rng.integers(0, 256, (24, 32)).astype(np.float64)


@pytest.fixture(scope="module")
def oracle_vs(chan):
    return O.train_filter(chan, *ARGS)


def test_f64_matches_oracle(chan, oracle_vs):
    V_o, S_o = oracle_vs
    V, S = train_filter(chan, *ARGS, dtype=jnp.float64, use_pallas=False)
    np.testing.assert_allclose(np.asarray(S), S_o, atol=1e-12)
    np.testing.assert_allclose(np.abs(np.asarray(V)), np.abs(V_o), atol=1e-10)
    # Output is sign-invariant: compare the filtered channel.
    fS = O.transform_eigenvalues(S_o, [2, 3, 4, 1])
    out_o = O.apply_filter(V_o, fS, chan)
    out = np.asarray(apply_filter(V, jnp.asarray(fS), jnp.asarray(chan)))
    np.testing.assert_allclose(out, out_o, atol=1e-9)


def test_f32_close_to_oracle(chan, oracle_vs):
    V_o, S_o = oracle_vs
    V, S = train_filter(chan.astype(np.float32), *ARGS, use_pallas=False)
    fS = O.transform_eigenvalues(S_o, [2, 3, 4, 1])
    out_o = O.apply_filter(V_o, fS, chan)
    out = np.asarray(
        apply_filter(V, jnp.asarray(fS, jnp.float32), jnp.asarray(chan, jnp.float32))
    )
    # sub-LSB agreement on a [0,255]-scale channel
    assert np.abs(out - out_o).max() < 0.1


def test_filter_eigvecs_orthonormal(chan):
    # V^T V == I holds *exactly* only when Wa is exactly symmetric (the
    # reference's unit test constructs it so); in the real pipeline Wa is
    # asymmetric at ~1e-5 after finitely many Sinkhorn rounds
    # (src/filter.cpp:496 leaves it unsymmetrized), and V inherits that
    # deviation — in the reference implementation as well.
    V, S = train_filter(chan, *ARGS, dtype=jnp.float64, use_pallas=False)
    V = np.asarray(V)
    nz = np.asarray(S) != 0
    np.testing.assert_allclose(
        V[:, nz].T @ V[:, nz], np.eye(int(nz.sum())), atol=1e-3
    )


def test_train_rejects_oversampling(chan):
    with pytest.raises(ValueError):
        train_filter(chan, 100, 4, 50.0, 30.0, 5, 5)


class TestNLEFilterModel:
    def _image(self, rng, h=24, w=32):
        return rng.integers(0, 256, (h, w, 3), np.uint8)

    def test_enhance_runs_and_changes_image(self, rng):
        img = self._image(rng)
        f = NLEFilter()
        f.train_for_enhancement(img, 3, 4, 100, 30, 10, 5)
        out = f.enhance(img, [2.0, 3.0, 4.0, 1.0])
        assert out.shape == img.shape and out.dtype == np.uint8

    def test_enhance_guards(self, rng):
        img = self._image(rng)
        f = NLEFilter()
        f.train_for_enhancement(img, 3, 4, 100, 30, 5, 5)
        with pytest.raises(ValueError, match="Can only enhance RGB image"):
            f.enhance(img[..., 0:1], [1.0])
        with pytest.raises(ValueError, match="different size"):
            f.enhance(self._image(rng, 12, 16), [1.0])
        with pytest.raises(ValueError, match="must match"):
            f.apply(np.zeros((5, 5)), np.ones(5))

    def test_untrained_raises(self):
        with pytest.raises(RuntimeError):
            NLEFilter().enhance(np.zeros((4, 4, 3), np.uint8), [1.0])

    def test_denoise_runs(self, rng):
        img = self._image(rng)
        f = NLEFilter()
        f.train_for_denoise(img, 3, 4, 100, 30, 5, 5, 10, 10)
        out = f.denoise(img, 2.0, 10, 10)
        assert out.shape == img.shape and out.dtype == np.uint8

    def test_training_upload_reused_for_edit(self, rng):
        """The train->edit flow reuses the training channel's device buffer
        (one tunnel upload saved per edit): the cache must be populated and
        taken for the training image, bypassed for a different image, and
        both paths must agree bitwise with a cache-free filter."""
        img = self._image(rng)
        f = NLEFilter()
        trained = f.train_for_enhancement(img, 3, 4, 100, 30, 10, 5)
        assert f._packed_y_cache is not None
        assert trained.y_cache is f._packed_y_cache

        # Spy: the cached branch passes the cached device buffer (1-D);
        # the bypass branch uploads fresh (N, 1).
        from nle_tpu.models import filter as filter_mod

        seen = []
        orig = filter_mod.apply_filter_u8

        def spy(eigvecs, scale, y):
            seen.append(y)
            return orig(eigvecs, scale, y)

        filter_mod.apply_filter_u8, saved = spy, orig
        try:
            out_cached = f.enhance(img, [2.0, 3.0, 4.0, 1.0])
            assert seen[-1] is f._packed_y_cache[1]
            img2 = self._image(rng)
            out_other = f.enhance(img2, [2.0, 3.0, 4.0, 1.0])
            assert seen[-1] is not f._packed_y_cache[1]
        finally:
            filter_mod.apply_filter_u8 = saved

        # A cache-free filter (fresh wrapper around the bare eigensystem)
        # must agree bitwise on both images.
        bare = TrainedFilter(trained.eigvecs, trained.eigvals, trained.nrows,
                             trained.ncols, perm=trained.perm)
        g = NLEFilter(trained=bare)
        assert g._packed_y_cache is None
        np.testing.assert_array_equal(out_cached,
                                      g.enhance(img, [2.0, 3.0, 4.0, 1.0]))
        np.testing.assert_array_equal(out_other,
                                      g.enhance(img2, [2.0, 3.0, 4.0, 1.0]))

    def test_save_load_roundtrip(self, rng, tmp_path):
        img = self._image(rng)
        f = NLEFilter()
        f.train_for_enhancement(img, 3, 4, 100, 30, 5, 5)
        path = str(tmp_path / "filter.npz")
        f.trained.save(path)
        g = NLEFilter(trained=TrainedFilter.load(path))
        np.testing.assert_array_equal(
            f.enhance(img, [2, 3, 4, 1]), g.enhance(img, [2, 3, 4, 1])
        )


def test_identity_weights_near_identity(rng):
    """With all weights 1, f(S) == 1 for every eigenvalue, so the filter
    reduces to V V^T — a projection; applying it to a vector already in the
    span returns it unchanged."""
    chan = rng.integers(0, 256, (16, 20)).astype(np.float64)
    V, S = train_filter(chan, *ARGS, dtype=jnp.float64, use_pallas=False)
    from nle_tpu.ops.transform import transform_eigenvalues

    fS = transform_eigenvalues(S, [1.0, 1.0])
    np.testing.assert_allclose(np.asarray(fS)[np.asarray(S) != 0], 1.0, atol=1e-12)


def test_stage1_device_host64_chain(rng):
    """stage1='device' with the default host64-chain stage 2: the device-
    resident eigensystem is padded/bucketed on device (no host re-upload)
    and the pipeline completes; on a well-conditioned config the result
    stays close to the all-host64 default (the f32 eigh picks a slightly
    different basis, so only the filter action is comparable)."""
    from nle_tpu.ops.transform import transform_eigenvalues

    img = rng.integers(0, 256, (40, 50)).astype(np.float32)
    args = (4, 5, 50.0, 30.0, 8, 4)
    V_h, S_h = train_filter(img, *args)
    V_d, S_d = train_filter(img, *args, stage1="device")
    np.testing.assert_allclose(np.asarray(S_d), np.asarray(S_h),
                               rtol=1e-3, atol=1e-5)
    w = jnp.asarray([1.0, 2.0, 1.5, 1.1], jnp.float32)
    out_h = np.asarray(apply_filter(V_h, transform_eigenvalues(S_h, w),
                                    jnp.asarray(img)))
    out_d = np.asarray(apply_filter(V_d, transform_eigenvalues(S_d, w),
                                    jnp.asarray(img)))
    assert np.abs(out_d - out_h).max() < 0.5


def test_training_is_deterministic(rng):
    """The sanitizer/race-detection analog of the reference's single-thread
    guarantee (SURVEY §5): two identical train runs produce BITWISE-equal
    filters — jit programs are deterministic, the host-f64 chain is
    sequential, and the async Sb fetch cannot reorder arithmetic."""
    chan = rng.integers(0, 256, (48, 56)).astype(np.float32)
    V1, S1 = train_filter(chan, 5, 6, 200.0, 30.0, 8, 5)
    V2, S2 = train_filter(chan, 5, 6, 200.0, 30.0, 8, 5)
    np.testing.assert_array_equal(np.asarray(V1), np.asarray(V2))
    np.testing.assert_array_equal(np.asarray(S1), np.asarray(S2))


def test_streaming_vb_slab_chunked_matches(monkeypatch):
    """The slab-chunked streaming Vb build (the >6 MP memory fix — the
    Pallas builder's 128-lane-padded output is 512 B/pixel whatever k is)
    must be BIT-identical to the whole-image call: each output row is an
    independent dot over the p samples."""
    import jax

    import nle_tpu.ops.pipeline as pipe

    rng = np.random.default_rng(11)
    chan = rng.integers(0, 256, (40, 64)).astype(np.float32)
    args = (chan, 4, 5, 40.0, 20.0, 6, 4)
    V0, S0 = pipe.train_filter(*args, streaming=True)
    V0, S0 = np.asarray(V0), np.asarray(S0)
    monkeypatch.setattr(pipe, "_VB_BUILD_BYTES_LIMIT", 0)
    monkeypatch.setattr(pipe, "_VB_SLAB_ROWS", 512)
    jax.clear_caches()   # same shapes would reuse the unchunked trace
    try:
        V1, S1 = pipe.train_filter(*args, streaming=True)
        np.testing.assert_array_equal(np.asarray(S1), S0)
        np.testing.assert_array_equal(np.asarray(V1), V0)
    finally:
        jax.clear_caches()  # drop the tiny-slab traces for later tests


def test_sb_tri_pack_roundtrip(monkeypatch):
    """NLE_SB_TRI block pack: the reassembled matrix equals the exact Sb
    on the lower triangle AND the diagonal blocks, and equals the lower's
    transpose elsewhere; on a symmetric input the round trip is exact."""
    import jax.numpy as jnp

    import nle_tpu.ops.pipeline as pipe

    rng = np.random.default_rng(12)
    for mb in (600, 640, 128, 130):
        A = rng.normal(size=(mb, mb))
        A = A + 1e-9 * rng.normal(size=(mb, mb))   # slightly asymmetric
        packed = np.asarray(pipe._pack_sb_tri_blocks(
            jnp.asarray(A, jnp.float32), mbp=-(-mb // 128) * 128),
            np.float64)
        R = pipe._unpack_sb_tri(packed, mb)
        A32 = A.astype(np.float32).astype(np.float64)
        tril = np.tril_indices(mb)
        np.testing.assert_array_equal(R[tril], A32[tril])
        # Expected: diagonal blocks exact (upper halves included);
        # strictly-upper BLOCKS are the mirrored lower blocks.
        mbp = -(-mb // 128) * 128
        nb = mbp // 128
        Ap = np.zeros((mbp, mbp))
        Ap[:mb, :mb] = A32
        E = Ap.copy()
        for bi in range(nb):
            for bj in range(bi + 1, nb):
                E[bi * 128:(bi + 1) * 128, bj * 128:(bj + 1) * 128] = \
                    Ap[bj * 128:(bj + 1) * 128, bi * 128:(bi + 1) * 128].T
        np.testing.assert_array_equal(R, E[:mb, :mb])
        S = (A + A.T).astype(np.float32)
        packed_s = np.asarray(pipe._pack_sb_tri_blocks(
            jnp.asarray(S), mbp=-(-mb // 128) * 128), np.float64)
        np.testing.assert_array_equal(
            pipe._unpack_sb_tri(packed_s, mb), S.astype(np.float64))
    # submit_sb_fetch auto-detects the packed layout by shape and
    # reassembles; an exactly-symmetric input round-trips exactly.
    sb = jnp.asarray((A + A.T).astype(np.float32))
    packed_dev = pipe._pack_sb_tri_blocks(sb, mbp=-(-mb // 128) * 128)
    got = pipe.submit_sb_fetch(packed_dev)()
    np.testing.assert_array_equal(got[:mb, :mb],
                                  np.asarray(sb, np.float64))
    monkeypatch.setenv("NLE_SB_TRI", "bogus")
    import pytest

    with pytest.raises(ValueError, match="NLE_SB_TRI"):
        pipe.resolve_sb_tri()


def test_sb_tri_train_filter_end_to_end(monkeypatch):
    """NLE_SB_TRI=on must leave train_filter's output BITWISE unchanged:
    the host chain's Cholesky congruence reads only Sb's lower triangle
    (ops/orthogonalize.py _scaled_congruence), which the block pack ships
    exactly — proven on the real chip by a bit-identical full golden
    sweep (GOLDEN_TPU r5)."""
    from nle_tpu.ops.pipeline import train_filter

    rng = np.random.default_rng(13)
    chan = rng.integers(0, 256, (40, 64)).astype(np.float32)
    monkeypatch.setenv("NLE_SB_TRI", "off")
    V0, S0 = train_filter(chan, 4, 5, 40.0, 20.0, 8, 4)
    monkeypatch.setenv("NLE_SB_TRI", "on")
    V1, S1 = train_filter(chan, 4, 5, 40.0, 20.0, 8, 4)
    np.testing.assert_array_equal(np.asarray(S1), np.asarray(S0))
    np.testing.assert_array_equal(np.asarray(V1), np.asarray(V0))


def test_sb_fetch_3d_group_not_misdetected():
    """The tri-pack auto-detection requires ndim == 2: the sharded
    trainer's (B, mb, mb) group Sb must pass through as a FULL fetch even
    when B is a multiple of 128 and mb == 128 (review r5 finding)."""
    import jax.numpy as jnp

    import nle_tpu.ops.pipeline as pipe

    rng = np.random.default_rng(15)
    group = rng.normal(size=(256, 128, 128)).astype(np.float32)
    got = pipe.submit_sb_fetch(jnp.asarray(group))()
    np.testing.assert_array_equal(got, group.astype(np.float64))


def test_reuse_delta_uint8_channels():
    """uint8 channels must not wrap around in the reuse comparison: a
    ±1-jitter u8 pair is 'near' (mean |delta| ~1), not ~128 (review r5
    finding — unsigned subtraction is modular)."""
    from nle_tpu.models.batch import train_filters_iter

    rng = np.random.default_rng(16)
    base = rng.integers(0, 256, (30, 40), dtype=np.uint8)
    near = np.clip(base.astype(np.int16) - 1, 0, 255).astype(np.uint8)
    flts = list(train_filters_iter([base, near], 4, 5, 40.0, 20.0, 8, 4,
                                   reuse_delta=3.0))
    assert flts[1] is flts[0]
