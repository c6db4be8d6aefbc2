"""Host-side image file I/O (decode/encode only — all math is on device).

Images are exchanged as (H, W, 3) uint8 BGR arrays, matching the reference's
cv::imread/imwrite contract (reference src/enhance.cpp:33,47). Uses OpenCV
when present, else Pillow.
"""

from __future__ import annotations

import numpy as np

try:
    import cv2

    _HAVE_CV2 = True
except Exception:  # pragma: no cover
    _HAVE_CV2 = False


def _pil_to_bgr(im) -> np.ndarray:
    # cv2.imread applies EXIF orientation (IMREAD_COLOR default); the PIL
    # path must match or the two backends return rotated-differently
    # arrays for the same phone JPEG.
    from PIL import ImageOps

    im = ImageOps.exif_transpose(im)
    rgb = np.asarray(im.convert("RGB"))
    return rgb[..., ::-1].copy()


def imread_bgr(path: str) -> np.ndarray:
    if _HAVE_CV2:
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(f"Failed to read file from {path}")
        return img
    from PIL import Image

    try:
        im = Image.open(path)
        # PIL decodes lazily: a truncated-but-identifiable file passes
        # Image.open and raises OSError only inside convert(), so the
        # decode must sit INSIDE the try for the error contract to hold.
        return _pil_to_bgr(im)
    except FileNotFoundError:
        raise
    except Exception as e:
        # cv2 returns None for corrupt files and the caller contract is
        # FileNotFoundError (the CLIs catch exactly that to print the
        # reference's "Failed to read file from ..." message) — keep the
        # two backends' error surface identical.
        raise FileNotFoundError(f"Failed to read file from {path}") from e


def imdecode_bgr(data: bytes) -> np.ndarray:
    """Decode encoded image bytes (PNG/BMP/JPEG...) to (H, W, 3) uint8 BGR.

    Undecodable input raises ValueError — ALWAYS: cv2.imdecode returns
    None for most garbage but raises cv2.error (not a ValueError) on an
    EMPTY buffer, which would surface as a 500 in the HTTP layer instead
    of the input-validation 400 (found by the endpoint fuzz test)."""
    if _HAVE_CV2:
        try:
            img = cv2.imdecode(np.frombuffer(data, np.uint8),
                               cv2.IMREAD_COLOR)
        except cv2.error as e:
            raise ValueError(f"Could not decode image bytes: {e}") from e
        if img is None:
            raise ValueError("Could not decode image bytes")
        return img
    import io

    from PIL import Image

    try:
        im = Image.open(io.BytesIO(data))
        # Decode INSIDE the try: PIL is lazy, so truncated payloads raise
        # OSError only at convert() time — outside the try they would
        # escape as a 500 instead of the input-validation 400.
        return _pil_to_bgr(im)
    except Exception as e:
        # Match the cv2 branch's error class (PIL raises
        # UnidentifiedImageError, an OSError, which HTTP handlers do not
        # map to 400).
        raise ValueError("Could not decode image bytes") from e


def imencode_png(img_bgr_u8: np.ndarray) -> bytes:
    """Encode a (H, W, 3) uint8 BGR array as PNG bytes."""
    img = np.asarray(img_bgr_u8)
    if _HAVE_CV2:
        ok, buf = cv2.imencode(".png", img)
        if not ok:
            raise ValueError("PNG encode failed")
        return buf.tobytes()
    import io

    from PIL import Image

    out = io.BytesIO()
    Image.fromarray(img[..., ::-1]).save(out, "PNG")
    return out.getvalue()


def imwrite_bgr(path: str, img_bgr_u8: np.ndarray) -> None:
    img = np.asarray(img_bgr_u8)
    if _HAVE_CV2:
        if not cv2.imwrite(path, img):
            raise IOError(f"Failed to write {path}")
        return
    from PIL import Image

    Image.fromarray(img[..., ::-1]).save(path)
