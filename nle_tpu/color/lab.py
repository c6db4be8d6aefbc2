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

The inverse (`lab_to_bgr_u8`) and the float-formula forward
(`bgr_to_lab_u8_float`) follow the standard float pipeline and agree with
cv2 within +-2 LSB; the inverse only shapes the *output* image (it never
feeds training), where +-1 costs only ~1 dB against the 45 dB gate.

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


def _linear_to_srgb(c):
    c = jnp.clip(c, 0.0, 1.0)
    return jnp.where(c > _SRGB_INV_T, 1.055 * c ** (1.0 / 2.4) - 0.055, 12.92 * c)


def _f(t):
    return jnp.where(t > _T0, jnp.cbrt(t), 7.787 * t + 16.0 / 116.0)


def _f_inv(t):
    return jnp.where(t > _CBRT_T, t**3, (t - 16.0 / 116.0) / 7.787)


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
    """(H, W, 3) uint8 Lab (OpenCV 8-bit scaling) -> (H, W, 3) uint8 BGR."""
    lab = lab_u8.astype(jnp.float32)
    L = lab[..., 0] * (100.0 / 255.0)
    a = lab[..., 1] - 128.0
    b = lab[..., 2] - 128.0
    fY = (L + 16.0) / 116.0
    fX = fY + a / 500.0
    fZ = fY - b / 200.0
    Y = jnp.where(L > _KAPPA * _T0, fY**3, L / _KAPPA)
    X = _f_inv(fX) * _XN
    Z = _f_inv(fZ) * _ZN
    r = 3.240479 * X - 1.537150 * Y - 0.498535 * Z
    g = -0.969256 * X + 1.875992 * Y + 0.041556 * Z
    bl = 0.055648 * X - 0.204043 * Y + 1.057311 * Z
    out = jnp.stack(
        [_linear_to_srgb(bl), _linear_to_srgb(g), _linear_to_srgb(r)], axis=-1
    )
    return jnp.clip(jnp.rint(out * 255.0), 0, 255).astype(jnp.uint8)


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
# Integer LUT pipeline analogous to OpenCV's Lab2RGBinteger at BASE = 2^14:
# agrees with cv2 within +-1 LSB on ~3% of pixels (the float formula has the
# same agreement rate; OpenCV's own interior quantization is the remaining
# difference) and is ~10x faster on the host than pow()-based float math.
_IBASE = 1 << 14


def _build_inverse_tables():
    i = np.arange(256, dtype=np.float32)
    li = i * np.float32(100.0 / 255.0)
    lthresh = np.float32(_T0 * _KAPPA)
    y_lo = li / np.float32(_KAPPA)
    ify_lo = y_lo * np.float32(7.787) + np.float32(16.0 / 116.0)
    ify_hi = (li + np.float32(16.0)) / np.float32(116.0)
    y = np.where(li <= lthresh, y_lo, ify_hi.astype(np.float64) ** 3)
    ify = np.where(li <= lthresh, ify_lo, ify_hi)
    y_tab = np.round(np.float64(y) * _IBASE).astype(np.int32)
    ify_tab = np.round(np.float64(ify) * _IBASE).astype(np.int32)

    min_ab = -2 * _IBASE
    idx = np.arange(min_ab, 3 * _IBASE)
    v = idx.astype(np.float64) / _IBASE
    fxz = np.where(v <= _CBRT_T, (v - 16.0 / 116.0) / 7.787, v**3)
    ab_tab = np.round(fxz * _IBASE).astype(np.int32)

    inv_m = np.array(
        [
            [3.240479, -1.537150, -0.498535],
            [-0.969256, 1.875992, 0.041556],
            [0.055648, -0.204043, 1.057311],
        ]
    )
    white = np.array([_XN, 1.0, _ZN])
    coeffs = np.round(_IBASE * inv_m * white[None, :]).astype(np.int64)

    g = np.arange(_IBASE + 1, dtype=np.float64) / _IBASE
    srgb = np.where(g > _SRGB_INV_T, 1.055 * g ** (1.0 / 2.4) - 0.055, 12.92 * g)
    gamma_tab = np.clip(np.round(srgb * 255.0), 0, 255).astype(np.uint8)
    return y_tab, ify_tab, ab_tab, min_ab, coeffs, gamma_tab


_IY_TAB, _IFY_TAB, _IAB_TAB, _IMIN_AB, _ICOEFFS, _IGAMMA_TAB = _build_inverse_tables()


def lab_to_bgr_u8_np(lab_u8: np.ndarray) -> np.ndarray:
    """Host NumPy twin of `lab_to_bgr_u8` (integer LUT pipeline)."""
    nat = _native()
    if nat is not None and lab_u8.ndim == 3 and lab_u8.shape[2] == 3:
        return nat.lab2bgr_u8(lab_u8, _IY_TAB, _IFY_TAB, _IAB_TAB, _IMIN_AB,
                              _ICOEFFS, _IGAMMA_TAB)
    L = lab_u8[..., 0].astype(np.int32)
    a = lab_u8[..., 1].astype(np.int32) - 128
    b = lab_u8[..., 2].astype(np.int32) - 128
    y = _IY_TAB[L].astype(np.int64)
    ify = _IFY_TAB[L]
    adiv = np.round(a * (_IBASE / 500.0)).astype(np.int32)
    bdiv = np.round(b * (_IBASE / 200.0)).astype(np.int32)
    x = _IAB_TAB[np.clip(ify + adiv - _IMIN_AB, 0, _IAB_TAB.size - 1)].astype(np.int64)
    z = _IAB_TAB[np.clip(ify - bdiv - _IMIN_AB, 0, _IAB_TAB.size - 1)].astype(np.int64)
    C = _ICOEFFS
    half = 1 << 13
    ro = np.clip((C[0, 0] * x + C[0, 1] * y + C[0, 2] * z + half) >> 14, 0, _IBASE)
    go = np.clip((C[1, 0] * x + C[1, 1] * y + C[1, 2] * z + half) >> 14, 0, _IBASE)
    bo = np.clip((C[2, 0] * x + C[2, 1] * y + C[2, 2] * z + half) >> 14, 0, _IBASE)
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
