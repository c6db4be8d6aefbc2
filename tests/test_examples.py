"""Smoke tests for the six documented examples/ flows (VERDICT r4 #5).

Each script runs in a subprocess on the cpu platform with small inputs,
asserting exit 0 and the expected output artifacts — so the documented
entry flows cannot silently drift from the APIs they demonstrate
(models/batch.py and serving both changed in r4 with zero example
coverage). These are smoke tests: fidelity is the golden gates' job.
"""

import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
EX = os.path.join(REPO, "examples")


def _run(argv, timeout=300):
    proc = subprocess.run(
        [sys.executable] + argv, cwd=REPO, timeout=timeout,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        env=dict(os.environ, JAX_PLATFORMS=""),
    )
    assert proc.returncode == 0, (
        f"{argv[0]} rc={proc.returncode}:\n"
        + "\n".join(proc.stdout.splitlines()[-30:]))
    return proc.stdout


@pytest.fixture(scope="module")
def tiny_image(tmp_path_factory):
    """A small structured BGR image on disk (flat noise trains fine but a
    gradient+texture keeps the eigensystem non-degenerate)."""
    import cv2

    path = str(tmp_path_factory.mktemp("examples") / "tiny.png")
    rng = np.random.default_rng(7)
    h, w = 48, 64
    yy, xx = np.mgrid[0:h, 0:w]
    base = (96 + 64 * np.sin(xx / 9.0) + 32 * np.cos(yy / 7.0)
            + rng.normal(0, 12, (h, w)))
    img = np.stack([base + 10, base, base - 10], axis=-1)
    cv2.imwrite(path, np.clip(img, 0, 255).astype(np.uint8))
    return path


def test_filter_reuse(tiny_image, tmp_path):
    out = str(tmp_path / "reuse")
    log = _run([os.path.join(EX, "filter_reuse.py"), "--platform=cpu",
                tiny_image, out])
    assert "trained and saved filter" in log
    names = os.listdir(out)
    for want in ("boost_detail.png", "flatten.png", "sharpen_mid.png"):
        assert want in names
    assert any(n.startswith("filter-") and n.endswith(".npz")
               for n in names)
    # Second run hits the serialized-filter cache — the workflow the
    # example exists to demonstrate.
    log2 = _run([os.path.join(EX, "filter_reuse.py"), "--platform=cpu",
                 tiny_image, out])
    assert "loaded filter from" in log2


def test_huge_image(tiny_image, tmp_path):
    dst = str(tmp_path / "huge.png")
    log = _run([os.path.join(EX, "huge_image.py"), tiny_image, dst,
                "--mp=0.05", "--platform=cpu"])
    assert os.path.exists(dst)
    assert "MP/s" in log


def test_multichip_batch():
    log = _run([os.path.join(EX, "multichip_batch.py"), "--platform=cpu"])
    assert "sharded apply ok" in log


def test_multihost_batch():
    log = _run([os.path.join(EX, "multihost_batch.py"), "--nproc=2"],
               timeout=600)
    assert "process 0: trained" in log
    assert "process 1: trained" in log


def test_serve_http_shim():
    # The shim re-exports the package server; its documented smoke path is
    # the selftest (train+enhance through a real socket, PSNR-gated
    # internally).
    log = _run([os.path.join(EX, "serve_http.py"), "--selftest",
                "--platform=cpu"], timeout=600)
    assert "selftest" in log.lower() or "ok" in log.lower()


def test_serving_stream():
    log = _run([os.path.join(EX, "serving_stream.py"), "--n=2",
                "--platform=cpu"], timeout=600)
    assert "trained 2 filters" in log
    assert "edited 2 frames" in log
