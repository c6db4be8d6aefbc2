"""utils/transfer.fetch: threaded chunked device->host transfer must be
value-identical to np.asarray for every shape class it special-cases."""

import numpy as np

import jax.numpy as jnp

from nle_tpu.utils.transfer import _SMALL_BYTES, fetch


def test_fetch_matches_asarray(rng):
    big_rows = (_SMALL_BYTES // 4) + 4097   # crosses the chunking threshold
    cases = [
        np.float32(3.5),                              # scalar
        rng.random(7).astype(np.float32),             # tiny
        rng.random(big_rows).astype(np.float32),      # chunked 1-D
        rng.random((big_rows // 8, 8)).astype(np.float32),  # chunked 2-D
        rng.integers(0, 255, big_rows, dtype=np.uint8),     # u8 below thresh
        rng.integers(0, 255, 5 * _SMALL_BYTES, dtype=np.uint8),  # u8 chunked
        # tiny leading dim, huge rows: the on-device-flatten path
        rng.integers(0, 255, (2, 3 * _SMALL_BYTES), dtype=np.uint8),
        # many small rows: the zero-extra-HBM leading-axis path
        rng.random((big_rows // 2, 3)).astype(np.float32),
    ]
    for x in cases:
        d = jnp.asarray(x)
        got = fetch(d)
        np.testing.assert_array_equal(got, np.asarray(d))
        assert got.dtype == x.dtype if hasattr(x, "dtype") else True


def test_fetch_passthrough_numpy():
    x = np.arange(10)
    assert fetch(x) is x
