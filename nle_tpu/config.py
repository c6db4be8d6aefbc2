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

import jax.numpy as jnp

# Reference absolute cutoff (include/filter.hpp:14), used for all dtypes.
EPS = 1e-10


def default_eps(dtype) -> float:
    """Eigenvalue/reciprocal cutoff (dtype currently does not change it)."""
    del dtype
    return EPS

