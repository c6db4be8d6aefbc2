"""Multi-process (multi-host) distributed training — the `jax.distributed`
half of the parallel story (SURVEY.md §5 distributed-comm row).

The reference is strictly single-process (no NCCL/MPI/Gloo anywhere,
reference CMakeLists.txt:40-46); this is new capability. Layout follows
the scaling-book recipe for a workload whose batch elements are fully
independent images:

- 'data' axis  = the PROCESS axis (one mesh row per host). Image batches
  are data-parallel across hosts, and because each nonlocal filter is
  trained on ONE image, no collective ever crosses this axis — DCN
  carries only program-launch coordination, exactly the "DCN only for
  multi-host batch-of-images" plan.
- 'pixel' axis = each host's LOCAL devices (its ICI domain). All real
  communication — Sinkhorn's phi^T x psums, the Sb gram psum
  (parallel/sharded.py) — stays on this axis, i.e. intra-host ICI.

Per training step every process contributes one image: stage 1 (the host
f64 Ka eigensystem) runs process-locally; the processes agree on a common
rank BUCKET via a tiny m all-gather (m-bucketing already makes shapes
static in mb with the true m traced, ops/pipeline.py, so padding smaller
elements into the step's max bucket is free); the SPMD stage-2 program —
the SAME cached shard_map steps the single-process mesh trainer uses —
runs over the global mesh; the host orthogonalization chain and the final
V assembly are process-local again (every device row a process needs is
addressable, because its images' shards live on its own devices).

Multi-host hardware does not exist here; the 2-process localhost CPU
path (tests/test_multihost.py, `dryrun_multihost`) exercises the full
wiring: jax.distributed.initialize + Gloo coordination, global-mesh
make_array_from_process_local_data staging, cross-process bucket
agreement, SPMD execution, and addressable-shard result assembly.

Worker entry (used by the test and __graft_entry__.dryrun_multihost):

    python -m nle_tpu.parallel.distributed --selfcheck \
        --coordinator=localhost:PORT --nproc=N --pid=I [--local-devices=2]
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize(coordinator_address: str, num_processes: int,
               process_id: int, *, local_devices: int | None = None,
               platform: str | None = None) -> None:
    """jax.distributed.initialize with the platform/device-count config
    applied FIRST (they must precede backend initialization; on this
    machine sitecustomize pins JAX_PLATFORMS=axon, so the cpu test path
    must force the platform via config, not env)."""
    if platform is not None:
        jax.config.update("jax_platforms", platform)
    if local_devices is not None:
        jax.config.update("jax_num_cpu_devices", int(local_devices))
    jax.distributed.initialize(coordinator_address, num_processes,
                               process_id)


def make_global_mesh() -> Mesh:
    """('data', 'pixel') mesh over ALL processes' devices: row i = process
    i's local devices, so the 'data' axis is the process/DCN axis and
    'pixel' stays inside each host's ICI domain."""
    devs = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n_proc = jax.process_count()
    n_local = len(devs) // n_proc
    # Per-process uniformity, not just total divisibility: 3+1 devices
    # over 2 processes reshapes "evenly" but row 1 would mix two hosts'
    # devices — 'pixel' collectives would cross DCN and a process's
    # addressable shards would span two data rows (_local_row breaks).
    counts = {}
    for d in devs:
        counts[d.process_index] = counts.get(d.process_index, 0) + 1
    if len(set(counts.values())) != 1 or n_proc * n_local != len(devs):
        raise RuntimeError(
            f"uneven device counts across processes: {counts} "
            f"({len(devs)} devices over {n_proc} processes)")
    return Mesh(np.array(devs).reshape(n_proc, n_local), ("data", "pixel"))


def _local_row(arr, pixel_axis: int | None = None) -> np.ndarray:
    """This process's 'data' row of a global array, as a host array.

    P('data')-sharded (replicated over 'pixel'): any addressable shard is
    the row. P('data', 'pixel')-sharded: concatenate this process's pixel
    shards in pixel order along `pixel_axis`.

    Shard data comes back through utils.transfer.fetch — on the
    tunnel-attached TPU a bare np.asarray of an N-sized device buffer hits
    the latency-bound single-request path (~0.2-4 MB/s vs fetch's ~40,
    CLAUDE.md transfer rule); on CPU fetch degrades to a plain copy."""
    from nle_tpu.utils.transfer import fetch, transfer_pool

    shards = arr.addressable_shards
    if pixel_axis is None:
        return fetch(shards[0].data)
    shards = sorted(shards,
                    key=lambda s: s.index[pixel_axis].start or 0)
    # Dedup replicated copies (same pixel offset on several devices), then
    # fetch the distinct shards concurrently on the transfer pool.
    seen, distinct = set(), []
    for s in shards:
        off = s.index[pixel_axis].start or 0
        if off in seen:
            continue
        seen.add(off)
        distinct.append(s)
    futs = [transfer_pool().submit(fetch, s.data) for s in distinct]
    return np.concatenate([f.result() for f in futs], axis=pixel_axis)


def train_filters_multihost(
    channels_local,
    n_row_samples: int,
    n_col_samples: int,
    hx: float,
    hy: float,
    n_sinkhorn_iter: int,
    n_eig_vectors: int,
    mesh: Mesh | None = None,
    *,
    eps: float | None = None,
    streaming: bool = False,
    factored: bool = False,
):
    """Train this process's batch of channels (B_local, H, W), one image
    per process per SPMD step, over the global mesh. Every process must
    pass the same B_local and identical (shape, params) — asserted via
    all-gather, because a divergent process would deadlock the SPMD
    program. Returns [(V (N, k_i), S (k_i,)), ...] host arrays for the
    LOCAL images (pixel-order rows, same contract as
    ops/pipeline.train_filter).

    factored=True (requires streaming=True): returns V-free
    FactoredFilters instead — the multi-host capacity path; no (N, k)
    eigenvector build happens anywhere (models/factored.py)."""
    from jax.experimental import multihost_utils

    from nle_tpu.config import default_eps
    from nle_tpu.ops.affinity import bandwidth_weights
    from nle_tpu.ops.pipeline import (
        bucket_m,
        ka_eigh_host64,
    )
    from nle_tpu.ops.sampling import sample_grid
    from nle_tpu.parallel.sharded import (
        _build_feats_step,
        _coord_rest_arrays,
        _sharded_2a_step,
        _sharded_2a_step_streaming,
        _sharded_2b_streaming,
        element_host_chain,
        factored_from_pieces,
    )
    from nle_tpu.utils.logging import logger, warn_truncation
    from nle_tpu.utils.transfer import transfer_pool

    if factored and not streaming:
        raise ValueError(
            "factored=True requires streaming=True (same contract as "
            "parallel/sharded.py train_filter_sharded).")
    if mesh is None:
        mesh = make_global_mesh()
    channels_local = np.asarray(channels_local, np.float32)
    b_local, nrows, ncols = channels_local.shape
    eps = float(default_eps(jnp.float32) if eps is None else eps)
    # Config agreement: EVERY parameter that shapes the compiled SPMD
    # program or its math (incl. hx/hy/eps, which bake into the jitted
    # step, and the streaming/factored mode switches) all-gathered over
    # DCN. A mismatch means the caller broke the SPMD contract; fail
    # loudly on every process rather than deadlocking in a collective or
    # silently training under inconsistent params.
    # float32 on the HOST first: process_allgather ships through the f32
    # device path (x64 off), so comparing f64 originals against the
    # round-tripped values would mismatch on every non-representable
    # float (eps=1e-10 was the first casualty). Quantizing both sides
    # identically keeps the equality exact.
    cfg = np.array([b_local, nrows, ncols, n_row_samples, n_col_samples,
                    n_sinkhorn_iter, n_eig_vectors,
                    float(hx), float(hy), eps,
                    float(bool(streaming)), float(bool(factored))],
                   np.float32)
    cfg_all = np.asarray(multihost_utils.process_allgather(cfg), np.float32)
    if not (cfg_all == cfg[None, :]).all():
        raise ValueError(
            f"multihost config mismatch across processes: {cfg_all}")

    grid = sample_grid(nrows, ncols, n_row_samples, n_col_samples)
    p = grid.n_samples
    n = grid.n_pixels
    nb = n - p
    n_pixel = mesh.shape["pixel"]
    nb_pad = -(-nb // n_pixel) * n_pixel
    sw, pw = bandwidth_weights(hx, hy)
    dt = np.float32

    rr_a = (grid.perm[:p] // ncols).astype(dt)
    cc_a = (grid.perm[:p] % ncols).astype(dt)
    rr_rest, cc_rest = _coord_rest_arrays(grid, mesh, jnp.float32, nb_pad)
    on_tpu = mesh.devices.flat[0].platform == "tpu"
    interpret = not on_tpu
    sh_data = NamedSharding(mesh, P("data"))
    sh_dp = NamedSharding(mesh, P("data", "pixel"))

    out = []
    for step_i in range(b_local):
        chan = channels_local[step_i]
        flat = chan.reshape(-1)[grid.perm].astype(dt)
        Um64, lam64, Uinv64 = ka_eigh_host64(
            chan[grid.sel_rows, grid.sel_cols].astype(np.float64),
            grid.sel_rows, grid.sel_cols, hx, hy, eps)
        m = lam64.shape[0]
        warn_truncation(p, m, eps)
        # Bucket agreement: the step's SPMD shapes must match across
        # processes — use the max bucket (smaller elements pad into it;
        # their true m is traced, so results are unchanged).
        m_all = multihost_utils.process_allgather(np.array([m], np.int64))
        mb = max(bucket_m(int(mi), p) for mi in m_all.ravel())
        if factored:
            # V-free: no global eigenvector build follows, so each process
            # keeps its OWN k = min(n_eig, m) (no cross-process truncation
            # — same rule as the single-process factored mesh trainer).
            k_step = min(n_eig_vectors, m)
        else:
            k_step = min(n_eig_vectors, int(m_all.min()))
            if k_step < n_eig_vectors:
                logger.warning(
                    "Multihost step %d: kept rank %d on some process "
                    "limits every process's eigenvector count to %d "
                    "(requested %d).",
                    step_i, int(m_all.min()), k_step, n_eig_vectors)

        def padded(a64, arr1d=False):
            pad = ((0, mb - a64.shape[-1]),) if arr1d else (
                (0, 0), (0, mb - a64.shape[-1]))
            return jax.make_array_from_process_local_data(
                sh_data, np.pad(a64, pad).astype(dt)[None])

        Um = padded(Um64)
        lam_m = padded(lam64, arr1d=True)
        Uinv = padded(Uinv64)
        m_arr = jax.make_array_from_process_local_data(
            sh_data, np.array([m], np.int32))
        fa_g = jax.make_array_from_process_local_data(
            sh_data, np.stack([rr_a, cc_a, flat[:p]], axis=-1)[None])
        yb_l = np.zeros((1, nb_pad), dt)
        yb_l[0, :nb] = flat[p:]
        yb_g = jax.make_array_from_process_local_data(sh_dp, yb_l)
        fb_g, mask_g = _build_feats_step(mesh, nb, nb_pad)(
            yb_g, rr_rest, cc_rest)

        if streaming:
            step = _sharded_2a_step_streaming(
                mesh, p, mb, n_sinkhorn_iter, eps, interpret)
        else:
            step = _sharded_2a_step(
                mesh, p, mb, n_sinkhorn_iter, eps, on_tpu)
        with jax.default_matmul_precision("highest"):
            rp, cp, Sb, cphib = step(
                Um, lam_m, Uinv, m_arr, fa_g, fb_g, mask_g, sw, pw)

        # Sb rides the transfer pool concurrently with the blocking rp/cp
        # fetches and resolves only inside host_orthogonalize (after its
        # eig(Wa) work) — the same fetch-overlap protocol as the
        # single-process trainers (ops/pipeline.py submit_sb_fetch).
        sb_fut = transfer_pool().submit(lambda: _local_row(Sb)[0])
        rp64 = _local_row(rp)[0].astype(np.float64)
        cp64 = _local_row(cp)[0].astype(np.float64)
        va_np, Sq, GrT, top = element_host_chain(
            rp64, cp64, (lambda: sb_fut.result()),
            Um64, lam64, m, mb, k_step, eps, dt)

        if factored:
            cbl_np = _local_row(cphib, pixel_axis=1)[0, :nb]
            out.append(factored_from_pieces(
                chan, grid, hx, hy, cp64, cbl_np, top,
                (Uinv64 @ GrT).astype(np.float32),
                Sq[:k_step].astype(np.float32)))
            continue

        grt_g = jax.make_array_from_process_local_data(
            sh_data, va_np[:, k_step:2 * k_step].astype(dt)[None])
        with jax.default_matmul_precision("highest"):
            if streaming:
                B = jnp.einsum("bpm,bmk->bpk", Uinv, grt_g)
                Vb = _sharded_2b_streaming(mesh, interpret)(
                    fa_g, fb_g, cphib, B, sw, pw)
            else:
                Vb = jnp.einsum("bnm,bmk->bnk", cphib, grt_g)
        Vb_np = _local_row(Vb, pixel_axis=1)[0, :nb, :]

        V = np.zeros((n, k_step), dt)
        V[grid.perm[:p], :] = top[:, :k_step]
        V[grid.perm[p:], :] = Vb_np
        out.append((V, Sq[:k_step].astype(dt)))
    return out


def _selfcheck(coordinator: str, nproc: int, pid: int,
               local_devices: int) -> None:
    """Worker body for the 2-process localhost CPU check: train one tiny
    image per process over the global mesh (dense AND streaming) and
    compare against the SINGLE-PROCESS pipeline result computed locally.
    Exits nonzero on any mismatch."""
    initialize(coordinator, nproc, pid, local_devices=local_devices,
               platform="cpu")
    mesh = make_global_mesh()
    assert mesh.shape["data"] == nproc, mesh
    rng = np.random.default_rng(7 + pid)   # distinct image per process
    chan = rng.integers(0, 256, (24, 32)).astype(np.float32)
    args = (3, 4, 50.0, 30.0, 5, 5)

    def assert_v_matches(V, V_ref, tol, tag):
        # Eigenvector sign is per-column arbitrary; compare up to sign.
        signs = np.sign(np.sum(V * V_ref, axis=0))
        signs[signs == 0] = 1.0
        err = np.abs(V * signs - V_ref).max()
        assert err < tol, (tag, err)

    results = {}
    for streaming in (False, True):
        (V, S), = train_filters_multihost(
            chan[None], *args, mesh, streaming=streaming)
        results[streaming] = (V, S)

    # Reference: the plain single-device pipeline on this process's image.
    from nle_tpu.ops.pipeline import train_filter

    V1, S1 = train_filter(chan, *args, use_pallas=False)
    V1, S1 = np.asarray(V1), np.asarray(S1)
    for streaming, (V, S) in results.items():
        tag = "streaming" if streaming else "dense"
        assert np.allclose(S, S1, rtol=2e-4, atol=1e-5), (
            tag, S, S1)
        assert_v_matches(V, V1, 5e-3, tag)

    # V-free factored capacity path over the same global mesh.
    from nle_tpu.ops.transform import transform_eigenvalues

    (flt,) = train_filters_multihost(
        chan[None], *args, mesh, streaming=True, factored=True)
    assert np.allclose(np.asarray(flt.eigvals), S1[: flt.eigvals.shape[0]],
                       rtol=2e-4, atol=1e-5)
    fS = transform_eigenvalues(flt.eigvals, [2.0, 3.0, 4.0, 1.0])
    out_f = flt.apply(chan, fS)
    V, S = results[False]
    fS1 = np.asarray(transform_eigenvalues(jnp.asarray(S),
                                           [2.0, 3.0, 4.0, 1.0]))
    ref = V @ (fS1 * (V.T @ chan.reshape(-1)))
    assert np.abs(out_f.reshape(-1) - ref).max() < 0.1, (
        np.abs(out_f.reshape(-1) - ref).max())
    # Bucket-divergence phase: the processes deliberately land in
    # DIFFERENT rank buckets (p=150: the random image keeps m=150 ->
    # bucket 150, the flat one m~64 -> bucket 128), so the step runs at
    # the MAX bucket and the deficient process executes with mb larger
    # than its own natural bucket — the zero-padded-columns/traced-m
    # contract that no single-process test can reach (the mesh trainer
    # groups per bucket and never mixes them).
    chan2 = (np.full((40, 45), 77.0, np.float32) if pid % 2
             else rng.integers(0, 256, (40, 45)).astype(np.float32))
    args2 = (10, 15, 30.0, 30.0, 4, 5)
    if nproc > 1:
        from jax.experimental import multihost_utils

        from nle_tpu.ops.pipeline import bucket_m, ka_eigh_host64
        from nle_tpu.ops.sampling import sample_grid

        g2 = sample_grid(40, 45, 10, 15)
        _, lam2, _ = ka_eigh_host64(
            chan2[g2.sel_rows, g2.sel_cols].astype(np.float64),
            g2.sel_rows, g2.sel_cols, 30.0, 30.0, 1e-10)
        buckets = {int(bucket_m(int(mi), g2.n_samples)) for mi in
                   multihost_utils.process_allgather(
                       np.array([lam2.shape[0]])).ravel()}
        assert len(buckets) > 1, (
            f"bucket-divergence phase is vacuous: all buckets {buckets}")
    V1b, S1b = train_filter(chan2, *args2, use_pallas=False)
    V1b, S1b = np.asarray(V1b), np.asarray(S1b)
    # Looser than the full-rank phase above: a truncating chain (m=64 of
    # 150 kept) amplifies the cross-implementation f32 noise — the
    # single-process MESH trainer at its OWN bucket already differs from
    # train_filter by ~5e-4 relative here (measured), so this is the
    # noise class, not an mb-padding defect (the forced-larger-bucket run
    # measured CLOSER to train_filter than the own-bucket one).
    # BOTH stage-2 variants run the mixed-bucket phase (VERDICT r3 #7:
    # the streaming body's max-bucket padding contract has its own mpad
    # plumbing — _train_2a_streaming — that the dense run cannot cover).
    for streaming in (False, True):
        (V2, S2), = train_filters_multihost(chan2[None], *args2, mesh,
                                            streaming=streaming)
        k2 = S2.shape[0]
        tag = f"divergent-bucket-{'stream' if streaming else 'dense'}"
        # The streaming body recomputes affinity tiles per sweep (its own
        # association order), stacking a second noise source on the
        # truncating chain: measured ~1% on the flat image's smallest
        # kept eigenvalues (vs ~5e-4 dense). Structural mask/padding bugs
        # measure order-unity; gate each variant at its own class.
        rtol, atol, vtol = ((2e-2, 1e-3, 5e-2) if streaming
                            else (2e-3, 1e-4, 2e-2))
        assert np.allclose(S2, S1b[:k2], rtol=rtol, atol=atol), (
            tag, S2, S1b)
        assert_v_matches(V2, V1b[:, :k2], vtol, tag)
    print(f"multihost selfcheck pid={pid}/{nproc}: ok "
          f"(dense + streaming + factored + divergent-bucket x "
          f"{{dense,stream}} match single-process)", flush=True)


def run_localhost_workers(n_proc: int, local_devices: int = 2,
                          timeout: float = 600.0) -> None:
    """Spawn n_proc worker subprocesses running _selfcheck against a
    coordinator on an ephemeral localhost port; raise if any fails. This
    is the `dryrun_multihost` body (and the test harness)."""
    import os
    import socket
    import subprocess
    import sys

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    procs = []
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)   # local_devices is set via config
    for i in range(n_proc):
        procs.append(subprocess.Popen(
            [sys.executable, "-m", "nle_tpu.parallel.distributed",
             "--selfcheck", f"--coordinator=localhost:{port}",
             f"--nproc={n_proc}", f"--pid={i}",
             f"--local-devices={local_devices}"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            env=env,
            cwd=("/root/repo" if os.path.isdir("/root/repo") else None)))
    fails = []
    for i, proc in enumerate(procs):
        try:
            out, _ = proc.communicate(timeout=timeout)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise RuntimeError(
                f"multihost worker {i} timed out after {timeout}s")
        if proc.returncode != 0:
            fails.append((i, proc.returncode, out[-2000:]))
    if fails:
        raise RuntimeError(f"multihost workers failed: {fails}")


def main() -> int:
    import sys

    coordinator, nproc, pid, local_devices = None, 2, 0, 2
    selfcheck = False
    for a in sys.argv[1:]:
        if a == "--selfcheck":
            selfcheck = True
        elif a.startswith("--coordinator="):
            coordinator = a.split("=", 1)[1]
        elif a.startswith("--nproc="):
            nproc = int(a.split("=", 1)[1])
        elif a.startswith("--pid="):
            pid = int(a.split("=", 1)[1])
        elif a.startswith("--local-devices="):
            local_devices = int(a.split("=", 1)[1])
        else:
            print(f"unknown argument {a!r}", file=sys.stderr)
            return 2
    if not selfcheck or coordinator is None:
        print("usage: python -m nle_tpu.parallel.distributed --selfcheck "
              "--coordinator=HOST:PORT --nproc=N --pid=I "
              "[--local-devices=K]", file=sys.stderr)
        return 2
    _selfcheck(coordinator, nproc, pid, local_devices)
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
