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


def test_sinkhorn_fused_bf16_polish_matches_f32(monkeypatch):
    """The mixed-precision Sinkhorn schedule (leading bf16 iterations +
    trailing f32 polish) stays within its documented error bound of the
    all-f32 trajectory (contraction polishes the bf16 rounding)."""
    from nle_tpu.ops.pallas.sinkhorn_kernel import sinkhorn_vectors_fused
    from nle_tpu.ops.sinkhorn import sinkhorn_vectors

    # This test characterizes the bf16 schedule against the TRUE f32
    # stream; pin the now-default int16 mode off (it has its own test).
    monkeypatch.setenv("NLE_SINKHORN_INT16", "off")

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


def test_sinkhorn_fused_int16_tracks_f32(monkeypatch):
    """The opt-in int16 per-column-scaled Sinkhorn stream stays at
    ~quantization-level error of the all-f32 XLA trajectory on an
    affinity-like factor WITH the Nystrom column structure (columns
    spanning decades — the axis that makes a per-ROW scale fail
    catastrophically; see _resolve_int16). Measured ~3e-5 here; bf16 on
    the same shape sits at ~1e-3. The hard gate is golden PSNR
    (tools/exp_int16_sinkhorn.py: all 10 README configs within ~2 dB of
    f32, several above it)."""
    import jax.numpy as jnp

    from nle_tpu.ops.pallas.sinkhorn_kernel import sinkhorn_vectors_fused
    from nle_tpu.ops.sinkhorn import sinkhorn_vectors

    rng = np.random.default_rng(7)
    n, m = 1500, 24
    base = np.abs(rng.standard_normal((n, m))).astype(np.float32) * 0.3 + 0.05
    colscale = np.geomspace(1.0, 1e4, m).astype(np.float32)
    phi = base * colscale[None, :]
    lam = (np.linspace(1.0, 0.2, m) / colscale.astype(np.float64) ** 2
           ).astype(np.float32)
    r_ref, c_ref = sinkhorn_vectors(jnp.asarray(phi), jnp.asarray(lam),
                                    8, 1e-10)
    monkeypatch.setenv("NLE_SINKHORN_INT16", "on")
    r, c = sinkhorn_vectors_fused(jnp.asarray(phi), jnp.asarray(lam),
                                  8, 1e-10, interpret=True, n=n)
    np.testing.assert_allclose(np.asarray(r), np.asarray(r_ref), rtol=5e-4)
    np.testing.assert_allclose(np.asarray(c), np.asarray(c_ref), rtol=5e-4)


def test_resolve_int16_policy(monkeypatch):
    import pytest

    from nle_tpu.ops.pallas.sinkhorn_kernel import _resolve_int16

    monkeypatch.delenv("NLE_SINKHORN_INT16", raising=False)
    assert _resolve_int16(0) is True      # ON by default (2.1x in situ,
    assert _resolve_int16(3) is False     # golden-gated); bf16 lead keeps
    monkeypatch.setenv("NLE_SINKHORN_INT16", "on")  # its f32 polish
    assert _resolve_int16(0) is True
    assert _resolve_int16(3) is False
    monkeypatch.setenv("NLE_SINKHORN_INT16", "off")
    assert _resolve_int16(0) is False
    monkeypatch.setenv("NLE_SINKHORN_INT16", "quick")
    with pytest.raises(ValueError, match="NLE_SINKHORN_INT16"):
        _resolve_int16(0)


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


def test_scaled_fits_vmem_bounds():
    """The fused dense Sb/Vb kernels' VMEM gate: ordinary rank buckets fit,
    dense-sampling-grid buckets (the (Mpad, Mpad) accumulator past ~1400)
    do not — those must route to cphi/streaming instead of dying in
    Mosaic's compile-time VMEM check."""
    from nle_tpu.ops.pallas.scaled_matmul_kernel import scaled_fits_vmem

    # Measured v5e boundary (2026-08-18 compile probes): OK through 1280,
    # Mosaic VMEM failure from 1408.
    assert scaled_fits_vmem(640)
    assert scaled_fits_vmem(1280)
    assert not scaled_fits_vmem(1408)
    assert not scaled_fits_vmem(2048)


def test_packed_chunk_respects_vmem_frame():
    """The pair-packed int16 Sinkhorn stream's chunk sizing must account
    the in-VMEM lo/hi f32 unpack temps on top of the int32 DMA slots: an
    earlier variant sized by the DMA slots alone compiled a 25.2 MB
    kernel frame on the real chip at the 1 MP serving shape — past the
    16 MB scoped-VMEM limit — which interpret-mode tests cannot catch.
    Pin the formula instead."""
    from nle_tpu.ops.pallas.sinkhorn_kernel import _packed_chunk

    def frame(c, mpad):  # 2 int32 DMA slots + 2x2 live f32 unpack temps
        return 24 * c * mpad

    for tile, mpad in [(1024, 128), (1024, 640), (1024, 1280),
                       (512, 2432), (256, 4096)]:
        nh = 4 * tile  # npad // 2 for an 8-tile-row phi
        c = _packed_chunk(tile, nh, mpad)
        assert frame(c, mpad) <= 12 * 2**20, (tile, mpad, c)
        assert nh % c == 0
        assert c >= 128
    # The 1 MP p=600 serving shape: tile//2 words (= tile logical rows,
    # half the f32 bytes per DMA) fits the frame budget.
    assert _packed_chunk(1024, 499712, 640) == 512
    # Very wide factors shrink the packed chunk further.
    assert _packed_chunk(1024, 499712, 4096) == 128


def test_stage2_dense_small_wide_bucket_falls_back():
    """Sizes in the fused-dense byte window whose rank bucket is too wide
    for the fused kernels take the cphi branch (and train_filter prefers
    streaming there) — never the unguarded Pallas dispatch."""
    from nle_tpu.ops.pipeline import stage2_dense_small

    # 0.6 MP x mb=2048: ~5 GB phi — above NLE_CPHI_BYTES, fused window —
    # but the fused kernels cannot fit VMEM at that width.
    assert stage2_dense_small(600_000, 2048)
    # Ordinary serving size: the FUSED branch since r4 (NLE_CPHI_BYTES
    # default 64 MiB — the in-kernel 3-pass split made the fused scaled
    # gram/matmul faster than the materialized cphi: same-session stream
    # A/B 2.82 vs 2.61 MP/s at 1 MP).
    assert not stage2_dense_small(1_000_000, 640)
    # Genuinely tiny problems keep the cphi branch (Pallas fixed
    # overheads outweigh the copy below ~64 MiB of phi).
    assert stage2_dense_small(30_000, 128)
    # Large image, ordinary bucket: the fused branch stays available.
    assert not stage2_dense_small(3_000_000, 640)


def test_sinkhorn_manual_rejects_nondivisible_rows():
    import jax.numpy as jnp
    import pytest

    from nle_tpu.ops.pallas.sinkhorn_kernel import sinkhorn_halfstep_manual

    phi = jnp.ones((2560, 128), jnp.float32)
    t = jnp.ones((128,), jnp.float32)
    with pytest.raises(ValueError, match="multiple of chunk"):
        sinkhorn_halfstep_manual(phi, t, 1e-10, chunk=1024, interpret=True)


def test_resolve_bf16_env_off_is_authoritative(monkeypatch):
    """An EXPLICIT NLE_SINKHORN_BF16=off kills the fidelity-risky mode even
    when code passes bf16_iters; an unset env defers to the argument."""
    from nle_tpu.ops.pallas.sinkhorn_kernel import _resolve_bf16_iters

    monkeypatch.setenv("NLE_SINKHORN_BF16", "off")
    assert _resolve_bf16_iters(10, 5) == 0      # operator override wins
    monkeypatch.setenv("NLE_SINKHORN_BF16", "4")
    assert _resolve_bf16_iters(10, 0) == 4      # integer env authoritative
    monkeypatch.delenv("NLE_SINKHORN_BF16", raising=False)
    assert _resolve_bf16_iters(10, 5) == 5


def test_sinkhorn_kernel_env_validated(monkeypatch):
    import jax.numpy as jnp
    import pytest

    from nle_tpu.ops.pallas.sinkhorn_kernel import sinkhorn_vectors_fused

    monkeypatch.setenv("NLE_SINKHORN_KERNEL", "pallas")   # typo'd value
    phi = jnp.ones((64, 8), jnp.float32)
    lam = jnp.ones((8,), jnp.float32)
    with pytest.raises(ValueError, match="NLE_SINKHORN_KERNEL"):
        sinkhorn_vectors_fused(phi, lam, 3, 1e-10, interpret=True)


def test_sinkhorn_auto_kernel_matches_manual(monkeypatch, rng):
    """The NLE_SINKHORN_KERNEL=auto pipelined kernel (striped accumulator,
    traced-index stores) must agree with the manual default — previously
    untested anywhere, even in interpret mode."""
    import jax.numpy as jnp

    from nle_tpu.ops.pallas.sinkhorn_kernel import (
        padded_shape,
        sinkhorn_halfstep_manual,
        sinkhorn_halfstep_pallas,
        sinkhorn_vectors_fused,
    )

    n, m = 500, 7
    npad, mpad = padded_shape(n, m, tile=256)
    phi = np.zeros((npad, mpad), np.float32)
    phi[:n, :m] = rng.random((n, m)) + 0.1
    t = np.zeros(mpad, np.float32)
    t[:m] = rng.random(m) + 0.1
    x_a, s_a = sinkhorn_halfstep_pallas(
        jnp.asarray(phi), jnp.asarray(t), 1e-10, interpret=True, tile=256)
    x_m, s_m = sinkhorn_halfstep_manual(
        jnp.asarray(phi), jnp.asarray(t), 1e-10, chunk=256, interpret=True)
    np.testing.assert_allclose(np.asarray(x_a), np.asarray(x_m),
                               rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(s_a), np.asarray(s_m),
                               rtol=1e-6, atol=1e-7)
    # And the non-divisible guard matches the manual twin's.
    import pytest

    with pytest.raises(ValueError, match="padded_shape"):
        sinkhorn_halfstep_pallas(jnp.ones((300, 128), jnp.float32),
                                 jnp.ones((128,), jnp.float32), 1e-10,
                                 interpret=True, tile=256)
    # Full fused driver under the auto kernel agrees with the manual one.
    # Pin the manual driver to f32 — the auto kernel is f32-only, and the
    # default int16 stream would compare quantized vs unquantized
    # trajectories instead of the two kernels.
    monkeypatch.setenv("NLE_SINKHORN_INT16", "off")
    monkeypatch.setenv("NLE_SINKHORN_KERNEL", "auto")
    r_a, c_a = sinkhorn_vectors_fused(jnp.asarray(phi[:n, :m]),
                                      jnp.asarray(t[:m]), 4, 1e-10,
                                      interpret=True, tile=256)
    monkeypatch.setenv("NLE_SINKHORN_KERNEL", "manual")
    r_m, c_m = sinkhorn_vectors_fused(jnp.asarray(phi[:n, :m]),
                                      jnp.asarray(t[:m]), 4, 1e-10,
                                      interpret=True, tile=256)
    np.testing.assert_allclose(np.asarray(r_a), np.asarray(r_m),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(c_a), np.asarray(c_m),
                               rtol=1e-5, atol=1e-6)


def test_quantize_pack_fused_bitwise_matches_two_step():
    """The one-pass quantize_pack_int16 must be BIT-EQUAL to
    quantize_int16 + pack_pairs_int32 (it exists purely to keep the f32
    qf intermediate out of HBM; any arithmetic drift would silently move
    the int16 trajectory)."""
    import numpy as np

    from nle_tpu.ops.pallas.sinkhorn_kernel import (
        pack_pairs_int32,
        quantize_int16,
        quantize_pack_int16,
    )

    rng = np.random.default_rng(11)
    phi = (rng.standard_normal((256, 128)).astype(np.float32)
           * np.logspace(-5, 4, 128, dtype=np.float32)[None, :])
    phi[-13:] = 0.0
    qf, scale_a, colmax_a = quantize_int16(jnp.asarray(phi))
    want = pack_pairs_int32(qf)
    got, scale_b, colmax_b = quantize_pack_int16(jnp.asarray(phi))
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))
    np.testing.assert_array_equal(np.asarray(scale_a), np.asarray(scale_b))
    np.testing.assert_array_equal(np.asarray(colmax_a),
                                  np.asarray(colmax_b))


def test_stage2_split_knob(monkeypatch):
    """NLE_STAGE2_SPLIT: auto follows the int16 resolve, off forces the
    assembled layout, bogus values fail loudly (a typo'd knob must not
    silently select a layout in an A/B)."""
    from nle_tpu.ops.pallas.sinkhorn_kernel import resolve_split_stage2

    monkeypatch.delenv("NLE_STAGE2_SPLIT", raising=False)
    monkeypatch.setenv("NLE_SINKHORN_INT16", "on")
    assert resolve_split_stage2(10)
    monkeypatch.setenv("NLE_STAGE2_SPLIT", "off")
    assert not resolve_split_stage2(10)
    monkeypatch.setenv("NLE_STAGE2_SPLIT", "auto")
    monkeypatch.setenv("NLE_SINKHORN_INT16", "off")
    assert not resolve_split_stage2(10)   # no carrier -> no split layout
    monkeypatch.setenv("NLE_STAGE2_SPLIT", "on")
    with pytest.raises(ValueError):
        resolve_split_stage2(10)   # on + no carrier: contradiction errors
    monkeypatch.setenv("NLE_STAGE2_SPLIT", "bogus")
    monkeypatch.setenv("NLE_SINKHORN_INT16", "on")
    with pytest.raises(ValueError):
        resolve_split_stage2(10)


def test_affinity_direct_write_padded_rows_masked():
    """out_rows direct-write contract (interpret mode): rows >= q and
    columns >= m are EXACT zeros — pad features are zeros, which would
    otherwise produce nonzero affinities against real samples — and the
    true rows match the sliced form bit-for-bit."""
    from nle_tpu.ops.pallas.affinity_kernel import (
        TILE_Q,
        affinity_matmul_pallas,
    )

    rng = np.random.default_rng(14)
    p, q, m = 24, 700, 20
    fa = jnp.asarray(rng.integers(0, 50, (p, 3)).astype(np.float32))
    fb = jnp.asarray(rng.integers(0, 50, (q, 3)).astype(np.float32))
    B = jnp.asarray(rng.normal(size=(p, m)).astype(np.float32))
    out_rows = -(-q // TILE_Q) * TILE_Q + TILE_Q   # extra pad tile
    full = np.asarray(affinity_matmul_pallas(
        fa, fb, B, 2e-4, 1e-3, interpret=True, out_rows=out_rows))
    assert full.shape[0] == out_rows and full.shape[1] % 128 == 0
    assert (full[q:] == 0).all()           # masked tail rows
    assert (full[:, m:] == 0).all()        # zero-pad columns
    sliced = np.asarray(affinity_matmul_pallas(
        fa, fb, B, 2e-4, 1e-3, interpret=True))
    np.testing.assert_array_equal(full[:q, :m], sliced)
