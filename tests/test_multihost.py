"""Multi-process distributed runtime (nle_tpu/parallel/distributed.py):
the jax.distributed half of the parallel story — 2-process localhost CPU
coordination (Gloo), global-mesh staging, cross-process bucket agreement,
and result assembly must reproduce the single-process pipeline."""

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_multihost_single_process_path_matches_pipeline():
    """In-process (process_count=1) run of the multihost trainer over the
    global mesh: staging, bucket agreement, SPMD step, and V assembly all
    exercise the same code the 2-process path runs, minus the TCP
    coordinator — cheap enough for every suite run."""
    from nle_tpu.ops.pipeline import train_filter
    from nle_tpu.parallel.distributed import (
        make_global_mesh,
        train_filters_multihost,
    )

    mesh = make_global_mesh()
    assert mesh.shape["data"] == 1 and mesh.shape["pixel"] >= 8

    rng = np.random.default_rng(11)
    batch = rng.integers(0, 256, (2, 24, 32)).astype(np.float32)
    args = (3, 4, 50.0, 30.0, 5, 5)
    results = train_filters_multihost(batch, *args, mesh)
    assert len(results) == 2
    for chan, (V, S) in zip(batch, results):
        V1, S1 = train_filter(chan, *args, use_pallas=False)
        V1, S1 = np.asarray(V1), np.asarray(S1)
        np.testing.assert_allclose(S, S1, rtol=2e-4, atol=1e-5)
        signs = np.sign(np.sum(V * V1, axis=0))
        signs[signs == 0] = 1.0
        assert np.abs(V * signs - V1).max() < 5e-3


def test_multihost_multi_step_batch():
    """B_local > 1: images train one-per-step in order; each result
    matches its own single-process train. Exercises the per-step bucket
    agreement loop (different images can land in different buckets)."""
    from nle_tpu.ops.pipeline import train_filter
    from nle_tpu.parallel.distributed import (
        make_global_mesh,
        train_filters_multihost,
    )

    mesh = make_global_mesh()
    rng = np.random.default_rng(21)
    batch = np.stack([
        rng.integers(0, 256, (24, 32)).astype(np.float32),
        np.full((24, 32), 128.0, np.float32),   # degenerate: rank-deficient
        rng.integers(0, 256, (24, 32)).astype(np.float32),
    ])
    args = (3, 4, 50.0, 30.0, 5, 5)
    results = train_filters_multihost(batch, *args, mesh, streaming=True)
    assert len(results) == 3
    for chan, (V, S) in zip(batch, results):
        V1, S1 = train_filter(chan, *args, use_pallas=False)
        S1 = np.asarray(S1)[: S.shape[0]]
        np.testing.assert_allclose(S, S1, rtol=2e-4, atol=1e-5)


def test_multihost_factored_matches_dense():
    """factored=True returns V-free FactoredFilters whose eigvals and
    apply match the dense multihost result (capacity path symmetry with
    the single-process mesh trainer)."""
    import jax.numpy as jnp

    from nle_tpu.ops.transform import transform_eigenvalues
    from nle_tpu.parallel.distributed import (
        make_global_mesh,
        train_filters_multihost,
    )

    mesh = make_global_mesh()
    rng = np.random.default_rng(5)
    chan = rng.integers(0, 256, (1, 24, 32)).astype(np.float32)
    args = (3, 4, 50.0, 30.0, 5, 5)
    [(V, S)] = train_filters_multihost(chan, *args, mesh)
    (flt,) = train_filters_multihost(chan, *args, mesh,
                                     streaming=True, factored=True)
    np.testing.assert_allclose(np.asarray(flt.eigvals), S,
                               rtol=2e-4, atol=1e-5)
    fS = transform_eigenvalues(jnp.asarray(S), [2.0, 3.0, 4.0, 1.0])
    out_f = flt.apply(chan[0], np.asarray(fS))
    ref = V @ (np.asarray(fS) * (V.T @ chan[0].reshape(-1)))
    assert np.abs(out_f.reshape(-1) - ref).max() < 0.1
    with pytest.raises(ValueError, match="streaming"):
        train_filters_multihost(chan, *args, mesh, factored=True)


def test_multihost_two_process_localhost():
    """The full 2-process path: spawn two workers against an ephemeral
    localhost coordinator; each trains one image over the (2, 2) global
    mesh (dense AND streaming) and asserts it matches its own
    single-process result. Failure in either worker fails here."""
    from nle_tpu.parallel.distributed import run_localhost_workers

    run_localhost_workers(2, local_devices=2)


def test_multihost_config_mismatch_fails_loudly():
    """A caller that breaks the SPMD contract (different params across
    processes) must get a ValueError, not a collective deadlock. With one
    process the check is trivially satisfied — exercise the failure path
    by faking a mismatched all-gather."""
    from unittest import mock

    from nle_tpu.parallel import distributed

    rng = np.random.default_rng(0)
    batch = rng.integers(0, 256, (1, 24, 32)).astype(np.float32)
    with mock.patch(
            "jax.experimental.multihost_utils.process_allgather",
            side_effect=lambda x: np.stack([np.asarray(x),
                                            np.asarray(x) + 1])):
        with pytest.raises(ValueError, match="config mismatch"):
            distributed.train_filters_multihost(
                batch, 3, 4, 50.0, 30.0, 5, 5,
                distributed.make_global_mesh())


def test_parallel_package_lazy_exports():
    """nle_tpu.parallel exposes the multi-process half lazily (importing
    the package must not pull jax.distributed wiring; __getattr__ resolves
    on first touch) and rejects unknown names."""
    import nle_tpu.parallel as par

    assert callable(par.make_global_mesh)
    assert callable(par.train_filters_multihost)
    with pytest.raises(AttributeError):
        par.no_such_symbol


def test_multihost_four_process_localhost():
    """4 processes x 2 local devices — the (4, 2) global mesh (VERDICT r3
    #7): shakes out process-count assumptions the 2-process run cannot
    (make_global_mesh uniformity over >2 rows, 4-way bucket agreement
    with TWO processes per divergence side, result assembly when a
    process's row is in the middle of the device list). Each worker runs
    the full selfcheck: dense + streaming + factored + the mixed-bucket
    phase in BOTH stage-2 variants."""
    from nle_tpu.parallel.distributed import run_localhost_workers

    run_localhost_workers(4, local_devices=2, timeout=900.0)
