"""Shard-consistency: the sharded pipeline on the virtual 8-device CPU mesh
must agree with the single-device pipeline."""

import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from nle_tpu.ops.pipeline import apply_filter, train_filter
from nle_tpu.ops.transform import transform_eigenvalues
from nle_tpu.parallel.sharded import (
    apply_filter_sharded,
    make_mesh,
    train_filter_sharded,
)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)

ARGS = (3, 4, 50.0, 30.0, 10, 5)


@pytest.fixture(scope="module")
def batch(rng=None):
    rng = np.random.default_rng(3)
    return rng.integers(0, 256, (2, 24, 32)).astype(np.float32)


def _single(batch):
    outs = [train_filter(c, *ARGS, use_pallas=False) for c in batch]
    return (
        np.stack([np.asarray(v) for v, _ in outs]),
        np.stack([np.asarray(s) for _, s in outs]),
    )


@pytest.mark.parametrize("n_data,n_pixel", [(1, 8), (2, 4), (1, 1)])
def test_sharded_matches_single_device(batch, n_data, n_pixel):
    mesh = make_mesh(n_data, n_pixel)
    V_s, S_s = train_filter_sharded(batch, *ARGS, mesh)
    V_1, S_1 = _single(batch)
    # f32 psum reduction order differs from the single-device matmul order;
    # ~1e-5 relative wobble on S is expected.
    np.testing.assert_allclose(np.asarray(S_s), S_1, rtol=2e-4, atol=1e-5)
    # eigenvector sign is solver-dependent; compare the filter action
    w = [2.0, 3.0, 4.0, 1.0]
    for i in range(batch.shape[0]):
        fS = transform_eigenvalues(jnp.asarray(S_1[i]), w)
        out_1 = np.asarray(apply_filter(jnp.asarray(V_1[i]), fS, jnp.asarray(batch[i])))
        out_s = np.asarray(
            apply_filter(jnp.asarray(V_s[i]), fS, jnp.asarray(batch[i]))
        )
        assert np.abs(out_s - out_1).max() < 0.05


def test_sharded_matches_single_with_truncation():
    """Regression: when the Ka spectrum truncates (m < p), the sharded path
    must use the same host-f64 orthogonalization chain as the single-device
    path — the f32 device chain diverges by whole gray levels."""
    cv2 = pytest.importorskip("cv2")
    img = cv2.imread("/root/reference/data/bird.bmp")
    L = cv2.cvtColor(img, cv2.COLOR_BGR2Lab)[:120, :100, 0].astype(np.float32)
    args = (6, 8, 1000.0, 20.0, 10, 10)
    V1, S1 = train_filter(L, *args, use_pallas=False)
    Vs, Ss = train_filter_sharded(L[None], *args, make_mesh(1, 8))
    fS = transform_eigenvalues(S1, [1.0, 5.0, 5.0, 1.0])
    o1 = np.asarray(apply_filter(V1, fS, jnp.asarray(L)))
    os_ = np.asarray(
        apply_filter(Vs[0][:, : np.asarray(S1).size], fS, jnp.asarray(L))
    )
    assert np.abs(o1 - os_).max() < 0.2


def test_sharded_apply_matches(batch):
    mesh = make_mesh(1, 8)
    V, S = train_filter(batch[0], *ARGS, use_pallas=False)
    fS = transform_eigenvalues(S, [2.0, 3.0, 4.0, 1.0])
    out_1 = np.asarray(apply_filter(V, fS, jnp.asarray(batch[0])))
    out_s = np.asarray(apply_filter_sharded(V, fS, jnp.asarray(batch[0]), mesh))
    np.testing.assert_allclose(out_s, out_1, atol=1e-3)


@pytest.mark.parametrize("n_data,n_pixel", [(1, 8), (2, 4)])
def test_sharded_streaming_matches_single_device(batch, n_data, n_pixel):
    """The phi-free streaming sharded trainer (affinity recomputed per
    sweep, interpret-mode kernels on CPU) agrees with the single-device
    dense pipeline."""
    mesh = make_mesh(n_data, n_pixel)
    V_s, S_s = train_filter_sharded(batch, *ARGS, mesh, streaming=True)
    V_1, S_1 = _single(batch)
    np.testing.assert_allclose(np.asarray(S_s), S_1, rtol=2e-4, atol=1e-5)
    w = [2.0, 3.0, 4.0, 1.0]
    for i in range(batch.shape[0]):
        fS = transform_eigenvalues(jnp.asarray(S_1[i]), w)
        out_1 = np.asarray(
            apply_filter(jnp.asarray(V_1[i]), fS, jnp.asarray(batch[i])))
        out_s = np.asarray(
            apply_filter(jnp.asarray(V_s[i]), fS, jnp.asarray(batch[i])))
        assert np.abs(out_s - out_1).max() < 0.05


def test_sharded_varied_ranks_share_bucket():
    """Two batch elements whose kept ranks differ (m = 25 and 23 at p = 30)
    land in ONE rank bucket: they run through a single shard_map group with
    per-element traced m, and each matches the single-device pipeline."""
    from nle_tpu.ops.pipeline import bucket_m, ka_eigh_host64
    from nle_tpu.ops.sampling import sample_grid

    rng = np.random.default_rng(3)
    img1 = rng.integers(0, 256, (80, 90)).astype(np.float32)
    img2 = np.clip(img1 + rng.normal(0, 20, img1.shape), 0, 255
                   ).astype(np.float32)
    args = (5, 6, 3000.0, 300.0, 6, 4)
    grid = sample_grid(80, 90, 5, 6)
    ms = []
    for im in (img1, img2):
        _, lam, _ = ka_eigh_host64(
            im.astype(np.float64)[grid.sel_rows, grid.sel_cols],
            grid.sel_rows, grid.sel_cols, 3000.0, 300.0, 1e-10)
        ms.append(lam.shape[0])
    p = grid.n_samples
    assert ms[0] != ms[1] and max(ms) < p
    assert bucket_m(ms[0], p) == bucket_m(ms[1], p)

    batch = np.stack([img1, img2])
    V_s, S_s = train_filter_sharded(batch, *args, make_mesh(2, 4))
    w = [2.0, 3.0, 4.0, 1.0]
    for i in range(2):
        V1, S1 = train_filter(batch[i], *args, use_pallas=False)
        k = np.asarray(S1).size
        np.testing.assert_allclose(np.asarray(S_s[i])[:k], np.asarray(S1),
                                   rtol=2e-4, atol=1e-5)
        fS = transform_eigenvalues(S1, w)
        out_1 = np.asarray(apply_filter(V1, fS, jnp.asarray(batch[i])))
        out_s = np.asarray(apply_filter(V_s[i][:, :k], fS,
                                        jnp.asarray(batch[i])))
        assert np.abs(out_s - out_1).max() < 0.05


def test_sharded_mixed_buckets_pad_to_data_axis(monkeypatch):
    """Batch elements in DIFFERENT rank buckets form groups smaller than
    the 'data' axis; the trainer pads groups by repeating an element
    instead of crashing in shard_map (regression)."""
    monkeypatch.setenv("NLE_M_BUCKET", "1")   # exact ranks -> per-m groups
    rng = np.random.default_rng(3)
    img1 = rng.integers(0, 256, (80, 90)).astype(np.float32)
    img2 = np.clip(img1 + rng.normal(0, 20, img1.shape), 0, 255
                   ).astype(np.float32)
    args = (5, 6, 3000.0, 300.0, 6, 4)
    batch = np.stack([img1, img2])
    V_s, S_s = train_filter_sharded(batch, *args, make_mesh(2, 4))
    w = [2.0, 3.0, 4.0, 1.0]
    for i in range(2):
        V1, S1 = train_filter(batch[i], *args, use_pallas=False)
        k = np.asarray(S1).size
        np.testing.assert_allclose(np.asarray(S_s[i])[:k], np.asarray(S1),
                                   rtol=2e-4, atol=1e-5)
        fS = transform_eigenvalues(S1, w)
        out_1 = np.asarray(apply_filter(V1, fS, jnp.asarray(batch[i])))
        out_s = np.asarray(apply_filter(V_s[i][:, :k], fS,
                                        jnp.asarray(batch[i])))
        assert np.abs(out_s - out_1).max() < 0.05


def test_sharded_streaming_rejects_non_f32(batch):
    """Same contract as the single-chip twin: the streaming Pallas kernels
    compute in f32, so a non-f32 dtype must fail fast with a clear error
    (not a Mosaic trace error or silent bf16 affinity arithmetic)."""
    mesh = make_mesh(1, 8)
    with pytest.raises(ValueError, match="float32-only"):
        train_filter_sharded(batch, *ARGS, mesh, streaming=True,
                             dtype=jnp.float64)


def test_sharded_factored_stores_u8_pack_and_caches_apply_state(batch):
    """8-bit training channels keep their uint8 pack in y_train (4x smaller
    checkpoints, same rule as the single-chip factored trainer), and
    repeated sharded applies reuse the per-(filter, mesh) sharded device
    state instead of re-uploading the feature blocks."""
    from nle_tpu.parallel.sharded import apply_filter_factored_sharded

    mesh = make_mesh(2, 4)
    flts = train_filter_sharded(batch, *ARGS, mesh, streaming=True,
                                factored=True)
    assert all(f.y_train.dtype == np.uint8 for f in flts)

    fS = transform_eigenvalues(flts[0].eigvals, [2.0, 3.0, 4.0, 1.0])
    out1 = apply_filter_factored_sharded(flts[0], batch[0], fS, mesh)
    state = flts[0]._dev_sharded
    assert state is not None and state[0] is mesh
    out2 = apply_filter_factored_sharded(flts[0], batch[0], fS, mesh)
    assert flts[0]._dev_sharded is state      # cache reused, not rebuilt
    np.testing.assert_array_equal(out1, out2)
    # And the sharded apply agrees with the filter's own single-chip apply.
    ref = flts[0].apply(batch[0], fS)
    assert np.abs(out1 - ref).max() < 0.05


# ---- int16 Sinkhorn carrier on the mesh (VERDICT r3 item 2) ----


def test_split_xla_twin_matches_packed_kernel_interpret():
    """sinkhorn_halfstep_split_xla is the plain-XLA twin the CPU-mesh
    int16 trainer runs; it must reproduce the packed kernel's split
    arithmetic (same quantized operands, same dropped l*l term — only the
    accumulation order differs)."""
    from nle_tpu.ops.pallas.sinkhorn_kernel import (
        pack_pairs_int32,
        quantize_int16,
        sinkhorn_halfstep_manual,
        sinkhorn_halfstep_split_xla,
    )

    rng = np.random.default_rng(7)
    n, m = 512, 128
    # Columns spanning decades, like phi's Nystrom 1/lam columns.
    phi = (rng.standard_normal((n, m)).astype(np.float32)
           * np.logspace(-4, 3, m, dtype=np.float32)[None, :])
    phi[-37:] = 0.0   # pad-like zero rows must stay exactly zero
    t = rng.standard_normal((m,)).astype(np.float32)
    qf, scale, _ = quantize_int16(jnp.asarray(phi))
    tq = scale * jnp.asarray(t)

    x_k, s_k = sinkhorn_halfstep_manual(
        pack_pairs_int32(qf), tq, 1e-10, chunk=128, interpret=True)
    x_x, s_x = sinkhorn_halfstep_split_xla(
        qf.astype(jnp.int32), tq, 1e-10)

    np.testing.assert_allclose(np.asarray(x_k), np.asarray(x_x),
                               rtol=1e-5, atol=0)
    assert np.all(np.asarray(x_x)[-37:] == 0.0)
    # s entries cancel (signed x against signed columns): bound the
    # difference against the accumulated TERM magnitude — in Q units,
    # since both s vectors are Q^T x (the same entry-vs-term distinction
    # ops/precision.py's error analysis leans on).
    term = (np.linalg.norm(np.asarray(x_x))
            * np.linalg.norm(np.asarray(qf), axis=0) + 1e-30)
    assert float(np.max(np.abs(np.asarray(s_k) - np.asarray(s_x)) / term)) \
        < 1e-5


def test_sharded_int16_matches_single_device(monkeypatch):
    """NLE_SINKHORN_INT16=on forces the carrier through the XLA twin on
    the CPU mesh. REAL image crops, not uniform noise: the carrier's
    validity domain is spatially-coherent images (on random noise at
    hx=50 phi entries span ~12 decades WITHIN a column and int16's 4.5
    decades destroy the trajectory — measured r4; the same is true of the
    golden-gated single-chip carrier). On images, the quantization
    trajectory (<= colmax * 2^-16) amplified through the chaotic chain
    stays sub-gray-level (measured 0.01-0.49 on these crops); a
    structural port bug measures in the hundreds."""
    cv2 = pytest.importorskip("cv2")
    monkeypatch.setenv("NLE_SINKHORN_INT16", "on")
    img = cv2.imread("/root/reference/data/bird.bmp")
    L = cv2.cvtColor(img, cv2.COLOR_BGR2Lab)[..., 0].astype(np.float32)
    # Two crops whose kept ranks differ (m = 44 and 47 at p = 48):
    # exercises the traced-m masks under the quantized body too.
    crops = np.stack([L[:120, :160], L[40:160, 100:260]])
    args = (6, 8, 300.0, 30.0, 10, 8)
    mesh = make_mesh(2, 4)
    V_s, S_s = train_filter_sharded(crops, *args, mesh)
    w = [2.0, 3.0, 4.0, 1.0]
    for i in range(2):
        V1, S1 = train_filter(crops[i], *args, use_pallas=False)
        fS = transform_eigenvalues(S1, w)
        out_1 = np.asarray(apply_filter(V1, fS, jnp.asarray(crops[i])))
        out_s = np.asarray(
            apply_filter(jnp.asarray(V_s[i]), fS, jnp.asarray(crops[i])))
        assert np.abs(out_s - out_1).max() < 2.0


def test_sharded_int16_off_is_bitwise_f32(batch, monkeypatch):
    """=off restores the exact f32 sharded trajectory (the machinery
    baseline tools/check_tpu_sharded.py pins)."""
    monkeypatch.setenv("NLE_SINKHORN_INT16", "off")
    mesh = make_mesh(1, 8)
    V_a, S_a = train_filter_sharded(batch[:1], *ARGS, mesh)
    monkeypatch.delenv("NLE_SINKHORN_INT16")
    # auto on a CPU mesh also resolves to the f32 path.
    V_b, S_b = train_filter_sharded(batch[:1], *ARGS, mesh)
    np.testing.assert_array_equal(np.asarray(V_a), np.asarray(V_b))
    np.testing.assert_array_equal(np.asarray(S_a), np.asarray(S_b))


# ---- Golden gate through the sharded trainer (VERDICT r3 item 5) ----


@pytest.mark.parametrize("int16", ["off", "on"], ids=["f32", "int16"])
def test_sharded_golden_flower(int16, monkeypatch):
    """The cheapest README config (flower, 10 20 100 30 50 30) trained
    through train_filter_sharded on the 8-device mesh must clear the SAME
    45 dB reference-golden gate the single-chip path is held to
    (tests/test_golden.py) — agreement with the single-device result
    (above) cannot catch a correlated sharded/single bug; the reference
    image can. Runs both carriers: the default f32 mesh path and the
    forced int16 twin."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    import oracle_numpy as O

    cv2 = pytest.importorskip("cv2")
    monkeypatch.setenv("NLE_SINKHORN_INT16", int16)
    from nle_tpu.models.filter import NLEFilter, TrainedFilter

    img = cv2.imread("/root/reference/data/flower-50.bmp")
    gold = cv2.imread("/root/reference/data/flower-filtered.png")
    f = NLEFilter()
    lab = f._to_lab(img)
    L = lab[..., 0].astype(np.float32)
    V, S = train_filter_sharded(L[None], 10, 20, 100.0, 30.0, 50, 30,
                                make_mesh(1, 8))
    trained = NLEFilter(TrainedFilter(
        jnp.asarray(V[0]), jnp.asarray(S[0]), L.shape[0], L.shape[1],
        perm=None))
    out = trained.enhance(img, [2.0, 3.0, 4.0, 1.0])
    psnr = O.psnr(out, gold)
    assert psnr >= 45.0, f"sharded flower ({int16}): {psnr:.2f} dB"


# ---- ICI scaling invariants (compiled-program analysis, VERDICT r2 #5) ----
#
# The capacity/scaling story claims per-shard memory is O(nb_local) and all
# cross-shard traffic is m-sized. Correctness tests alone cannot catch a
# regression that re-materializes an N-sized replicated buffer inside the
# shard_map body (results would still match); these tests inspect the
# COMPILED program instead: XLA's memory analysis at n_pixel in {2, 8} and
# the all-reduce operand shapes in the optimized HLO.

def _compiled_2a(n_pixel: int, streaming: bool, mb: int, nb_pad: int):
    from nle_tpu.parallel.sharded import (
        _sharded_2a_step,
        _sharded_2a_step_streaming,
    )

    p = mb
    mesh = make_mesh(1, n_pixel)
    if streaming:
        step = _sharded_2a_step_streaming(mesh, p, mb, 3, 1e-10, True)
    else:
        step = _sharded_2a_step(mesh, p, mb, 3, 1e-10, False)
    args = (
        jnp.zeros((1, p, mb)), jnp.zeros((1, mb)), jnp.zeros((1, p, mb)),
        jnp.zeros((1,), jnp.int32), jnp.zeros((1, p, 3)),
        jnp.zeros((1, nb_pad, 3)), jnp.zeros((1, nb_pad)),
        jnp.float32(1.0), jnp.float32(1.0),
    )
    return step.lower(*args).compile()


# Probe sizes: large enough that the O(nb_local) term dominates each
# path's fixed overhead (dense materializes phi (nb_local, mb) so it
# needs the bigger nb; the streaming path's interpret-mode temps dwarf
# its constants already at 8k pixels and 16 ranks). The dense probe grew
# 1<<16 -> 1<<18 when the Sb gram moved to a transpose-free dot_general
# (_local_gram): one fewer nb-sized temp made the ~4 MB fixed overhead
# visible at the old probe.
_PROBES = {False: (64, 1 << 18), True: (16, 1 << 13)}


@pytest.mark.parametrize("streaming", [False, True], ids=["dense", "stream"])
def test_sharded_per_shard_memory_scales_inverse_in_pixel_axis(streaming):
    """Per-device temp memory of the 2a trainer must shrink ~1/n_pixel:
    going 2 -> 8 shards divides the N-sized working set by ~4. A replicated
    N-sized buffer sneaking into the body would pin the ratio near 1."""
    mb, nb_pad = _PROBES[streaming]
    t2 = _compiled_2a(2, streaming, mb, nb_pad) \
        .memory_analysis().temp_size_in_bytes
    t8 = _compiled_2a(8, streaming, mb, nb_pad) \
        .memory_analysis().temp_size_in_bytes
    ratio = t2 / max(1, t8)
    assert ratio > 2.5, (t2, t8, ratio)


@pytest.mark.parametrize("streaming", [False, True], ids=["dense", "stream"])
def test_sharded_collective_payloads_are_m_sized(streaming):
    """Every cross-shard all-reduce in the compiled 2a program carries at
    most O(mb^2) elements (the Sb gram) — never an N-sized payload. A
    regression that psums a pixel-sized buffer across ICI fails here."""
    import re

    mb, nb_pad = _PROBES[streaming]
    compiled = _compiled_2a(8, streaming, mb, nb_pad)
    nb_local = nb_pad // 8
    shapes = []
    for line in compiled.as_text().splitlines():
        m = re.search(r"=\s+\S*?\[([\d,]*)\][^=]*?\ball-reduce(?:-start)?\(",
                      line)
        if m:
            dims = [int(d) for d in m.group(1).split(",") if d]
            shapes.append(dims)
    assert shapes, "no all-reduce found — did psum lowering change?"
    cap = mb * mb  # batch=1: the (mb, mb) Sb gram is the largest legal
    for dims in shapes:
        n_elem = int(np.prod(dims)) if dims else 1
        assert n_elem <= cap, (dims, shapes)
        assert n_elem < nb_local, (dims, nb_local)
