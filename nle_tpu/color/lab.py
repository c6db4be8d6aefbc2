"""BGR <-> CIE Lab conversion matching OpenCV's 8-bit convention, in JAX.

The reference trains and edits in OpenCV's 8-bit Lab space
(cv::COLOR_BGR2Lab on CV_8U, reference src/filter.cpp:423,440,463):
L is scaled to [0, 255] (L * 255/100) and a, b are offset by +128 — the
"8-bit scaling trap" flagged at reference src/enhance.cpp:41-42.

Forward conversion (`bgr_to_lab_u8`) reimplements OpenCV's *fixed-point
integer* pipeline and is bit-exact against cv2 (validated on 4M+ random
pixels and every image in the reference data set): sRGB gamma LUT scaled to
255*8, integer XYZ matrix at 12-bit shift with D65 white-point division
folded in, a 3072-entry cube-root LUT at 15-bit shift (computed in float32
— that detail matters for exactness), and round-half-up descales.
Bit-exactness is load-bearing: filter training is chaotically sensitive to
the L channel (a +-1 LSB difference on ~15% of pixels costs ~25 dB of
golden-image PSNR — see tests/test_golden.py).

The inverse (`lab_to_bgr_u8`) reimplements OpenCV's Lab2RGBinteger
fixed-point pipeline (BASE = 2^14 L->y/f(y) tables, integer a/b scaling,
f-inverse table, 12-bit XYZ->RGB matrix, 4096-entry inverse-gamma LUT) and
is bit-exact against cv2 on the FULL 256^3 Lab cube (all 50,331,648 output
channel values verified equal; tests/test_color.py samples this, the
NLE_RUN_FULL_GOLDEN suite checks the whole cube). The float-formula forward
(`bgr_to_lab_u8_float`) agrees with cv2 within +-2 LSB.

All functions are jittable and operate on uint8 arrays (HWC, BGR order,
matching cv::imread).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# D65 reference white (OpenCV's constants).
_XN = 0.950456
_ZN = 1.088754
# sRGB <-> linear
_SRGB_T = 0.04045
_SRGB_INV_T = 0.0031308
# CIE Lab
_T0 = 0.008856
_CBRT_T = 6.0 / 29.0
_KAPPA = 903.3

# ---- OpenCV 8-bit fixed-point tables (computed once at import) ----
_GAMMA_SHIFT = 3
_LAB_SHIFT = 12
_LAB_SHIFT2 = _LAB_SHIFT + _GAMMA_SHIFT  # 15
_GSCALE = 255 * (1 << _GAMMA_SHIFT)      # 2040


def _build_tables():
    i = np.arange(256, dtype=np.float64) / 255.0
    lin = np.where(i > _SRGB_T, ((i + 0.055) / 1.055) ** 2.4, i / 12.92)
    gamma_tab = np.round(_GSCALE * lin).astype(np.int32)

    # OpenCV builds this table in float32; reproducing that is required for
    # bit-exactness at a handful of rounding boundaries.
    j = np.arange(3072, dtype=np.float32) / np.float32(_GSCALE)
    f = np.where(
        j < np.float32(_T0),
        j * np.float32(7.787) + np.float32(16.0 / 116.0),
        np.cbrt(j),
    )
    cbrt_tab = np.round(np.float32(1 << _LAB_SHIFT2) * f).astype(np.int32)

    D65 = np.array([_XN, 1.0, _ZN])
    M = np.array(
        [
            [0.412453, 0.357580, 0.180423],
            [0.212671, 0.715160, 0.072169],
            [0.019334, 0.119193, 0.950227],
        ]
    )
    coeffs = np.round((1 << _LAB_SHIFT) * M / D65[:, None]).astype(np.int32)
    return gamma_tab, cbrt_tab, coeffs


_GAMMA_TAB, _CBRT_TAB, _XYZ_COEFFS = _build_tables()
_L_SCALE = (116 * 255 + 50) // 100
_L_SHIFT = -((16 * 255 * (1 << _LAB_SHIFT2) + 50) // 100)


def _descale(x, n):
    return (x + (1 << (n - 1))) >> n


@jax.jit
def bgr_to_lab_u8(bgr_u8: jax.Array) -> jax.Array:
    """(H, W, 3) uint8 BGR -> (H, W, 3) uint8 Lab, bit-exact vs OpenCV."""
    gamma = jnp.asarray(_GAMMA_TAB)
    cbrt = jnp.asarray(_CBRT_TAB)
    C = _XYZ_COEFFS
    idx = bgr_u8.astype(jnp.int32)
    b = jnp.take(gamma, idx[..., 0])
    g = jnp.take(gamma, idx[..., 1])
    r = jnp.take(gamma, idx[..., 2])
    fX = jnp.take(cbrt, jnp.clip(
        _descale(r * C[0, 0] + g * C[0, 1] + b * C[0, 2], _LAB_SHIFT), 0, 3071))
    fY = jnp.take(cbrt, jnp.clip(
        _descale(r * C[1, 0] + g * C[1, 1] + b * C[1, 2], _LAB_SHIFT), 0, 3071))
    fZ = jnp.take(cbrt, jnp.clip(
        _descale(r * C[2, 0] + g * C[2, 1] + b * C[2, 2], _LAB_SHIFT), 0, 3071))
    L = _descale(_L_SCALE * fY + _L_SHIFT, _LAB_SHIFT2)
    a = _descale(500 * (fX - fY) + 128 * (1 << _LAB_SHIFT2), _LAB_SHIFT2)
    bb = _descale(200 * (fY - fZ) + 128 * (1 << _LAB_SHIFT2), _LAB_SHIFT2)
    lab = jnp.stack([L, a, bb], axis=-1)
    return jnp.clip(lab, 0, 255).astype(jnp.uint8)


def _srgb_to_linear(c):
    return jnp.where(c > _SRGB_T, ((c + 0.055) / 1.055) ** 2.4, c / 12.92)


def _f(t):
    return jnp.where(t > _T0, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)


@jax.jit
def bgr_to_lab_u8_float(bgr_u8: jax.Array) -> jax.Array:
    """Float-formula forward conversion (within 1-2 LSB of OpenCV)."""
    x = bgr_u8.astype(jnp.float32) / 255.0
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    r, g, b = _srgb_to_linear(r), _srgb_to_linear(g), _srgb_to_linear(b)
    X = 0.412453 * r + 0.357580 * g + 0.180423 * b
    Y = 0.212671 * r + 0.715160 * g + 0.072169 * b
    Z = 0.019334 * r + 0.119193 * g + 0.950227 * b
    fX = _f(X / _XN)
    fY = _f(Y)
    fZ = _f(Z / _ZN)
    L = jnp.where(Y > _T0, 116.0 * jnp.cbrt(Y) - 16.0, _KAPPA * Y)
    a = 500.0 * (fX - fY) + 128.0
    bb = 200.0 * (fY - fZ) + 128.0
    L8 = L * (255.0 / 100.0)
    lab = jnp.stack([L8, a, bb], axis=-1)
    return jnp.clip(jnp.rint(lab), 0, 255).astype(jnp.uint8)


@jax.jit
def lab_to_bgr_u8(lab_u8: jax.Array) -> jax.Array:
    """(H, W, 3) uint8 Lab (OpenCV 8-bit scaling) -> (H, W, 3) uint8 BGR.

    Integer LUT pipeline, bit-exact vs cv2 (same tables as the host twin
    `lab_to_bgr_u8_np`). All intermediates fit int32, but the headroom is
    under ONE bit: worst-case |C @ (x,y,z)| ~= 1.41e9 ~= 2^30.4 (row 0 at
    the ab-table maximum 88218) against the 2^31 signed limit — do not
    widen _ISHIFT/_IBASE without re-deriving this bound.
    """
    idx = lab_u8.astype(jnp.int32)
    y = jnp.take(jnp.asarray(_IY_TAB), idx[..., 0])
    ify = jnp.take(jnp.asarray(_IFY_TAB), idx[..., 0])
    adiv = jnp.take(jnp.asarray(_IADIV_TAB), idx[..., 1])
    bdiv = jnp.take(jnp.asarray(_IBDIV_TAB), idx[..., 2])
    ab = jnp.asarray(_IAB_TAB)
    # Index clamps as in the C twin (labcolor.c): zero margin at offset 0.
    top = len(_IAB_TAB) - 1
    x = jnp.take(ab, jnp.clip(ify + adiv - _IMIN_AB, 0, top))
    z = jnp.take(ab, jnp.clip(ify - bdiv - _IMIN_AB, 0, top))
    C = _ICOEFFS.astype(np.int32)
    half = 1 << (_ISHIFT - 1)
    hi = (1 << _IGAMMA_BITS) - 1
    gamma = jnp.asarray(_IGAMMA_TAB)
    ro = jnp.clip((C[0, 0] * x + C[0, 1] * y + C[0, 2] * z + half) >> _ISHIFT, 0, hi)
    go = jnp.clip((C[1, 0] * x + C[1, 1] * y + C[1, 2] * z + half) >> _ISHIFT, 0, hi)
    bo = jnp.clip((C[2, 0] * x + C[2, 1] * y + C[2, 2] * z + half) >> _ISHIFT, 0, hi)
    return jnp.stack(
        [jnp.take(gamma, bo), jnp.take(gamma, go), jnp.take(gamma, ro)], axis=-1
    )


_NATIVE = None


def _native():
    """The C host kernels (nle_tpu/native), or None."""
    global _NATIVE
    if _NATIVE is None:
        try:
            from nle_tpu import native as nat

            _NATIVE = nat if nat.load() is not None else False
        except Exception:
            _NATIVE = False
    return _NATIVE or None


def bgr_to_lab_u8_np(bgr_u8: np.ndarray) -> np.ndarray:
    """Host twin of `bgr_to_lab_u8` (same tables, bit-exact vs OpenCV).
    Used by the model layer for images that live on the host anyway (file
    I/O) to avoid device round trips. Dispatches to the C kernel
    (nle_tpu/native/labcolor.c) when a compiler is available; the NumPy
    fallback is int32 throughout — every intermediate fits (max |value| <
    2^25) and int64 temps double the conversion time at megapixel sizes."""
    nat = _native()
    if nat is not None and bgr_u8.ndim == 3 and bgr_u8.shape[2] == 3:
        return nat.bgr2lab_u8(bgr_u8, _GAMMA_TAB, _CBRT_TAB, _XYZ_COEFFS,
                              _L_SCALE, _L_SHIFT)
    b = np.take(_GAMMA_TAB, bgr_u8[..., 0])
    g = np.take(_GAMMA_TAB, bgr_u8[..., 1])
    r = np.take(_GAMMA_TAB, bgr_u8[..., 2])
    C = _XYZ_COEFFS
    half = np.int32(1 << (_LAB_SHIFT - 1))
    half2 = np.int32(1 << (_LAB_SHIFT2 - 1))

    ix = (r * C[0, 0] + g * C[0, 1] + b * C[0, 2] + half) >> _LAB_SHIFT
    fX = np.take(_CBRT_TAB, np.clip(ix, 0, 3071))
    ix = (r * C[1, 0] + g * C[1, 1] + b * C[1, 2] + half) >> _LAB_SHIFT
    fY = np.take(_CBRT_TAB, np.clip(ix, 0, 3071))
    ix = (r * C[2, 0] + g * C[2, 1] + b * C[2, 2] + half) >> _LAB_SHIFT
    fZ = np.take(_CBRT_TAB, np.clip(ix, 0, 3071))
    out = np.empty(bgr_u8.shape, np.uint8)
    L = (np.int32(_L_SCALE) * fY + np.int32(_L_SHIFT) + half2) >> _LAB_SHIFT2
    np.clip(L, 0, 255, out=L)
    out[..., 0] = L
    a = (np.int32(500) * (fX - fY) + np.int32(128 << _LAB_SHIFT2) + half2) >> _LAB_SHIFT2
    np.clip(a, 0, 255, out=a)
    out[..., 1] = a
    bb = (np.int32(200) * (fY - fZ) + np.int32(128 << _LAB_SHIFT2) + half2) >> _LAB_SHIFT2
    np.clip(bb, 0, 255, out=bb)
    out[..., 2] = bb
    return out


# ---- Inverse (Lab -> BGR) fixed-point tables ----
# OpenCV's Lab2RGBinteger pipeline at BASE = 2^14, bit-exact vs cv2 on the
# full 256^3 Lab cube (verified exhaustively; reconstructed empirically by
# coordinate-descent fitting of each table against cv2 5.0 outputs — every
# table reduced to the closed forms below). ~10x faster on the host than
# pow()-based float math, and the integer form is what the C kernel and the
# jitted TPU path share.
_IBASE = 1 << 14
_IMIN_AB = -8145          # == min(ify - bdiv): offset 0 lands EXACTLY on
                          # the table start (zero margin — keep clamps)
_IGAMMA_BITS = 12         # inverse-gamma LUT index width
_ISHIFT = 14              # descale: (BASE * 2^12 matrix) -> 2^12 index


def _build_inverse_tables():
    # L -> (y, f(y)) at BASE scale. Constructed in float32 (like OpenCV's
    # softfloat tables) — the rounding domain matters for a few entries.
    f32 = np.float32
    li = (f32(np.arange(256)) * f32(100) / f32(255)).astype(f32)
    kappa = f32(np.float32(24389) / np.float32(27))  # 903.3 (exact CIE)
    y_lin = li / kappa
    ify_lin = f32(f32(841) / f32(108)) * y_lin + f32(f32(16) / f32(116))
    ify_cub = (li + f32(16)) / f32(116)
    y_cub = ify_cub * ify_cub * ify_cub
    lin = li <= f32(8.0)  # L* threshold: kappa * (6/29)^3 == 8 exactly
    y_tab = np.rint(np.where(lin, y_lin, y_cub) * f32(_IBASE)).astype(np.int32)
    ify_tab = np.rint(np.where(lin, ify_lin, ify_cub) * f32(_IBASE)).astype(np.int32)

    # f-inverse table over the full reachable f-value range, pure integer
    # construction with C-style truncation toward zero (matches OpenCV):
    # linear branch (f <= 6/29): (v - 16/116) * 108/841; else v^3.
    idx = np.arange(_IMIN_AB, _IBASE * 9 // 4 + _IMIN_AB, dtype=np.int64)
    c2 = (_IBASE * 16 // 116) * 108 // 841
    q = np.abs(idx * 108) // 841
    lin_v = np.where(idx < 0, -q, q) - c2
    cube_v = ((idx * idx) // _IBASE) * idx // _IBASE
    ab_tab = np.where(idx <= 3389, lin_v, cube_v).astype(np.int32)

    inv_m = np.array(
        [
            [3.240479, -1.537150, -0.498535],
            [-0.969256, 1.875992, 0.041556],
            [0.055648, -0.204043, 1.057311],
        ],
        dtype=np.float32,
    )
    white = np.array([_XN, 1.0, _ZN], dtype=np.float32)
    coeffs = np.rint(
        np.float64(inv_m * white[None, :]) * (1 << _LAB_SHIFT)
    ).astype(np.int64)

    g = np.arange(1 << _IGAMMA_BITS, dtype=np.float64) / (1 << _IGAMMA_BITS)
    srgb = np.where(g > _SRGB_INV_T, 1.055 * g ** (1.0 / 2.4) - 0.055, 12.92 * g)
    gamma_tab = np.clip(np.rint(srgb * 255.0), 0, 255).astype(np.uint8)

    # a/b (raw uint8) -> fixed-point a*BASE/500 - 128*BASE/500 (resp. /200);
    # OpenCV's mult-shift approximations, reproduced exactly.
    u = np.arange(256, dtype=np.int64)
    adiv_tab = (((5 * u * 53687 + (1 << 7)) >> 13) - 128 * _IBASE // 500).astype(np.int32)
    bdiv_tab = (((u * 41943 + (1 << 4)) >> 9) - 128 * _IBASE // 200 + 1).astype(np.int32)
    return y_tab, ify_tab, ab_tab, coeffs, gamma_tab, adiv_tab, bdiv_tab


(_IY_TAB, _IFY_TAB, _IAB_TAB, _ICOEFFS, _IGAMMA_TAB,
 _IADIV_TAB, _IBDIV_TAB) = _build_inverse_tables()


def lab_to_bgr_u8_np(lab_u8: np.ndarray) -> np.ndarray:
    """Host NumPy twin of `lab_to_bgr_u8` (bit-exact vs cv2, see header)."""
    nat = _native()
    if nat is not None and lab_u8.ndim == 3 and lab_u8.shape[2] == 3:
        return nat.lab2bgr_u8(lab_u8, _IY_TAB, _IFY_TAB, _IAB_TAB, _IMIN_AB,
                              _ICOEFFS, _IGAMMA_TAB, _IADIV_TAB, _IBDIV_TAB)
    L = lab_u8[..., 0].astype(np.int32)
    y = _IY_TAB[L].astype(np.int64)
    ify = _IFY_TAB[L]
    adiv = _IADIV_TAB[lab_u8[..., 1]]
    bdiv = _IBDIV_TAB[lab_u8[..., 2]]
    # Same index clamps as the C twin (labcolor.c): the table has ZERO
    # margin at offset 0 (_IMIN_AB note), so without the clamp a future
    # 1-LSB table-rounding change would wrap -1 to the LAST entry silently.
    top = len(_IAB_TAB) - 1
    x = _IAB_TAB[np.clip(ify + adiv - _IMIN_AB, 0, top)].astype(np.int64)
    z = _IAB_TAB[np.clip(ify - bdiv - _IMIN_AB, 0, top)].astype(np.int64)
    C = _ICOEFFS
    half = 1 << (_ISHIFT - 1)
    hi = (1 << _IGAMMA_BITS) - 1
    ro = np.clip((C[0, 0] * x + C[0, 1] * y + C[0, 2] * z + half) >> _ISHIFT, 0, hi)
    go = np.clip((C[1, 0] * x + C[1, 1] * y + C[1, 2] * z + half) >> _ISHIFT, 0, hi)
    bo = np.clip((C[2, 0] * x + C[2, 1] * y + C[2, 2] * z + half) >> _ISHIFT, 0, hi)
    return np.stack(
        [_IGAMMA_TAB[bo], _IGAMMA_TAB[go], _IGAMMA_TAB[ro]], axis=-1
    )


def luminance_channel(bgr_u8: jax.Array) -> jax.Array:
    """8-bit Lab L channel as float — the training signal.

    Semantics of `getLuminanceChannel` (reference src/filter.cpp:460-469):
    BGR -> 8-bit Lab -> L channel -> float. Values are integer-valued floats
    in [0, 255].
    """
    return bgr_to_lab_u8(bgr_u8)[..., 0].astype(jnp.float32)


def y_channel(bgr_u8: jax.Array) -> jax.Array:
    """BGR -> YUV Y channel (semantics of `getYChannel`,
    reference src/filter.cpp:471-478; unused by the pipelines there but part
    of the API surface). OpenCV's 8-bit Y uses BT.601 fixed-point weights."""
    x = bgr_u8.astype(jnp.int32)
    b, g, r = x[..., 0], x[..., 1], x[..., 2]
    # OpenCV: Y = (R*4899 + G*9617 + B*1868 + (1<<13)) >> 14
    y = (r * 4899 + g * 9617 + b * 1868 + (1 << 13)) >> 14
    return jnp.clip(y, 0, 255).astype(jnp.uint8)
