"""Batched multi-device filter training over a ('data', 'pixel') mesh.

Runs on real chips when several are attached, or on a virtual CPU mesh:

    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python examples/multichip_batch.py
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np


def main():
    # Platform choice must happen BEFORE any backend initialization:
    # jax.config.update("jax_platforms", ...) is a no-op once jax.devices()
    # has run. Under the pinned single-chip axon platform, a CPU mesh needs
    # the non-default cpu backend, reachable only by asking for it first.
    import jax

    if "--platform=cpu" in sys.argv:
        jax.config.update("jax_platforms", "cpu")
    devices = jax.devices()
    if len(devices) < 2:
        try:
            devices = jax.devices("cpu")
        except RuntimeError:
            print("fewer than 2 devices and no cpu backend reachable; "
                  "re-run with --platform=cpu and "
                  "XLA_FLAGS=--xla_force_host_platform_device_count=8",
                  file=sys.stderr)
            return
    import jax.numpy as jnp

    from nle_tpu.color.lab import bgr_to_lab_u8_np
    from nle_tpu.ops.transform import transform_eigenvalues
    from nle_tpu.parallel.sharded import (
        apply_filter_sharded,
        make_mesh,
        train_filter_sharded,
    )
    from nle_tpu.utils.imageio import imread_bgr

    n = len(devices)
    n_data = 2 if n % 2 == 0 and n >= 4 else 1
    mesh = make_mesh(n_data, n // n_data, devices=devices)
    print(f"mesh: data={n_data} x pixel={n // n_data} on {devices[0].platform}")

    img = imread_bgr("/root/reference/data/flower-50.bmp")
    L = bgr_to_lab_u8_np(img)[..., 0].astype(np.float32)
    batch = np.stack([L] * n_data)  # e.g. frames of a burst / video

    V, S = train_filter_sharded(batch, 10, 20, 100.0, 30.0, 10, 10, mesh)
    print("trained filters:", V.shape, S.shape)

    fS = transform_eigenvalues(S[0], [2.0, 3.0, 4.0, 1.0])
    out = apply_filter_sharded(V[0], fS, jnp.asarray(batch[0]), mesh)
    print("sharded apply ok:", out.shape, float(jnp.abs(out).max()))


if __name__ == "__main__":
    main()
