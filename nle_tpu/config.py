"""Precision and tolerance policy.

The reference is float64 end-to-end with an absolute eigenvalue cutoff
EPS = 1e-10 (reference include/filter.hpp:12-14). Empirically (golden-image
sweeps in tests/test_golden.py) the same 1e-10 cutoff is also the right
choice at float32: raising it to "f32 noise level" (1e-5) *loses* ~7 dB
because the informative tail of the Ka spectrum is discarded, while keeping
near-noise eigenvalues is harmless — every downstream product re-multiplies
the amplified Lambda^{-1} factors by Lambda, cancelling the amplification.
"""

from __future__ import annotations

# Reference absolute cutoff (include/filter.hpp:14), used for all dtypes.
EPS = 1e-10


def default_eps(dtype) -> float:
    """Eigenvalue/reciprocal cutoff (dtype currently does not change it)."""
    del dtype
    return EPS


def enable_persistent_cache() -> str | None:
    """Point JAX at an on-disk compilation cache (idempotent).

    Stage 2 is compiled per (image shape, p, m) and the remote-compile TPU
    service takes minutes per new program; the persistent cache removes
    that cost for every shape seen before (measured: 400 s -> seconds on a
    fresh process). Directory from NLE_JAX_CACHE_DIR (default
    ~/.cache/nle_tpu/jax; "off" disables). Returns the directory or None.
    """
    import os

    path = os.environ.get("NLE_JAX_CACHE_DIR",
                          os.path.expanduser("~/.cache/nle_tpu/jax"))
    if path.lower() in ("off", "0", "none", ""):
        return None
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:  # cache is an optimization, never a failure
        return None
    return path

