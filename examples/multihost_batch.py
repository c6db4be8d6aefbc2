"""Multi-process (multi-host) batch training demo.

Spawns N localhost worker processes coordinated by jax.distributed (the
same wiring a real multi-host deployment uses — swap the localhost
coordinator for host 0's address and drop --local-devices to use each
host's real chips). Each process trains its own images over the global
('data'=process, 'pixel'=local-device) mesh and reports timing.

    python examples/multihost_batch.py [--nproc=2]

Worker mode (spawned internally; also how a real deployment launches):

    python examples/multihost_batch.py --worker \
        --coordinator=HOST:PORT --nproc=N --pid=I
"""

import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def worker(coordinator: str, nproc: int, pid: int) -> None:
    import numpy as np

    from nle_tpu.parallel.distributed import (
        initialize,
        make_global_mesh,
        train_filters_multihost,
    )

    # Localhost demo: force CPU with 2 virtual devices per process. A real
    # multi-host run drops both kwargs and uses the host's chips.
    initialize(coordinator, nproc, pid, local_devices=2, platform="cpu")
    mesh = make_global_mesh()
    rng = np.random.default_rng(pid)
    batch = rng.integers(0, 256, (2, 64, 64)).astype(np.float32)
    t0 = time.time()
    results = train_filters_multihost(batch, 6, 6, 200.0, 30.0, 10, 5, mesh)
    dt = time.time() - t0
    for i, (V, S) in enumerate(results):
        print(f"process {pid}: image {i} -> V {V.shape}, top eigvalue "
              f"{float(S[0]):.4f}", flush=True)
    print(f"process {pid}: trained {len(results)} images in {dt:.1f}s over "
          f"mesh {dict(zip(mesh.axis_names, mesh.devices.shape))}",
          flush=True)


def main() -> int:
    if "--worker" in sys.argv:
        coordinator = nproc = pid = None
        for a in sys.argv[1:]:
            if a.startswith("--coordinator="):
                coordinator = a.split("=", 1)[1]
            elif a.startswith("--nproc="):
                nproc = int(a.split("=", 1)[1])
            elif a.startswith("--pid="):
                pid = int(a.split("=", 1)[1])
        worker(coordinator, nproc, pid)
        return 0
    nproc = 2
    for a in sys.argv[1:]:
        if a.startswith("--nproc="):
            nproc = int(a.split("=", 1)[1])
    import socket

    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.abspath(__file__), "--worker",
             f"--coordinator=localhost:{port}", f"--nproc={nproc}",
             f"--pid={i}"])
        for i in range(nproc)
    ]
    rc = 0
    for p in procs:
        p.wait(timeout=600)
        rc |= p.returncode
    return rc


if __name__ == "__main__":
    sys.exit(main())
