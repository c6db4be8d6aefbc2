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
        # many big rows (>= _MIN_LEAD_CHUNKS leading): one-row-per-request
        # leading-axis path — must NOT flatten (no transient HBM double)
        rng.integers(0, 255, (9, 3 * _SMALL_BYTES), dtype=np.uint8),
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


def test_fetch_chunk_pool_is_distinct():
    """fetch()'s chunk copies must not share transfer_pool(): a fetch
    submitted AS a transfer_pool task blocks on its chunk futures, so a
    shared bounded pool deadlocks once every worker holds such a fetch."""
    from nle_tpu.utils import transfer as T

    assert T.transfer_pool() is not T._pool()


def test_fetch_inside_transfer_pool_at_saturation():
    """_WORKERS concurrent >4 MB fetches running as transfer_pool tasks
    (the models/factored.py multi-channel pattern, scaled up) must all
    complete — with a shared pool this deadlocks and times out."""
    import jax.numpy as jnp

    from nle_tpu.utils.transfer import _WORKERS, fetch, transfer_pool

    xs = [jnp.arange(2_000_000, dtype=jnp.float32) + i
          for i in range(_WORKERS)]
    futs = [transfer_pool().submit(fetch, x) for x in xs]
    outs = [f.result(timeout=120) for f in futs]
    for i, o in enumerate(outs):
        assert o.shape == (2_000_000,)
        assert o[5] == 5.0 + i
