"""Shared CLI plumbing: flag parsing layered on top of the reference's
positional contract, precision control, and debug outputs."""

from __future__ import annotations

import contextlib
import os
import sys

_FLAG_DOC = """Optional named flags (extensions beyond the reference CLI):
  --precision=float32|float64   compute dtype (float64 needs CPU/x64)
  --eps=EPS                     eigenvalue/reciprocal cutoff override
  --no-pallas                   force the XLA path (no Pallas kernels)
  --factored                    V-free factored filter (capacity mode: the
                                (N, k) eigvec matrix is never built; edits
                                recompute affinities per apply)
  --save-filter=PATH            save trained filter (V, S) to .npz
  --debug-eigvecs=DIR           dump min-max-rescaled eigenvector images
  --platform=cpu|tpu            select JAX platform
  --profile=DIR                 capture a jax.profiler trace of the run
  --check-nans                  abort on NaN in any device computation
  --stage1=host64|topk|device   Ka eigensolver (topk = the reference's
                                USE_SPECTRA iterative solver)
  --reuse-delta=D               (nle-batch) temporal warm-start: a frame
                                whose mean |L delta| vs the last trained
                                frame is <= D reuses that frame's filter
                                (opt-in; trades filter freshness for
                                throughput on near-static streams)
  --show                        display the result in a blocking window
                                (the reference's imshow/waitKey end
                                behavior; needs a display)
  --verbose                     stage progress + timings on stderr"""


# Flags that require `--name=value`; the rest are boolean switches.
_VALUE_FLAGS = frozenset(
    {"precision", "eps", "save-filter", "debug-eigvecs", "platform",
     "profile", "stage1", "reuse-delta"})
_BOOL_FLAGS = frozenset({"no-pallas", "check-nans", "verbose", "factored",
                         "show"})


def add_common_flags() -> str:
    return _FLAG_DOC


def split_flags(argv):
    """Separate `--name[=value]` flags from positional args."""
    pos, flags = [], {}
    for a in argv:
        if a.startswith("--"):
            body = a[2:]
            if "=" in body:
                k, v = body.split("=", 1)
                flags[k] = v
            else:
                flags[body] = True
        else:
            pos.append(a)
    return pos, flags


def validate_flags(flags) -> str | None:
    """Reject unknown or malformed flags BEFORE any expensive work — a
    silently ignored typo (--no-palas) would otherwise run minutes of
    remote-compile training with defaults, and a valueless --save-filter
    would crash only after the training completed."""
    for k, v in flags.items():
        if k not in _VALUE_FLAGS and k not in _BOOL_FLAGS:
            return f"Unknown flag --{k}"
        if k in _VALUE_FLAGS and v is True:
            return f"Flag --{k} requires a value (--{k}=...)"
        if k in _BOOL_FLAGS and v is not True:
            return f"Flag --{k} takes no value"
    # A typo'd solver name would otherwise fall through train_filter's
    # dispatch into the f32 on-device branch and silently degrade the
    # fidelity-critical eigenbasis after minutes of training.
    if flags.get("stage1") not in (None, "host64", "topk", "device"):
        return (f"Flag --stage1={flags['stage1']} invalid "
                "(expected host64|topk|device)")
    if flags.get("precision") not in (None, "float32", "float64"):
        return (f"Flag --precision={flags['precision']} invalid "
                "(expected float32|float64)")
    if "reuse-delta" in flags:
        try:
            if not float(flags["reuse-delta"]) >= 0:   # rejects NaN too
                raise ValueError
        except ValueError:
            return (f"Flag --reuse-delta={flags['reuse-delta']} invalid "
                    "(expected a nonnegative float)")
    return None


def pop_op(flags):
    """Extract the shared `--op=enhance|denoise` flag used by the editing
    CLIs (nle-apply, nle-batch). Must run BEFORE validate_flags (which
    rejects --op as unknown — it is meaningless on the training CLIs).
    Returns (op, error_message_or_None)."""
    op = flags.pop("op", "enhance")
    if op not in ("enhance", "denoise"):
        return op, f"Flag --op={op} invalid (expected enhance|denoise)"
    return op, None


def warn_inapplicable(prog: str, flags, names) -> None:
    """Warn (loudly, stderr) about known-but-inapplicable flags the caller
    will ignore — a silently dropped --save-filter would let the user
    believe a file was written."""
    hit = sorted(set(flags) & set(names))
    if hit:
        print(f"{prog}: ignoring flag(s) not applicable here: "
              + ", ".join(f"--{f}" for f in hit), file=sys.stderr)


def apply_common_flags(flags) -> None:
    """Process flags that must act before JAX computes anything."""
    from nle_tpu.config import enable_persistent_cache

    enable_persistent_cache()
    if "platform" in flags:
        import jax

        # Some environments pin JAX_PLATFORMS via sitecustomize; the config
        # knob wins over the env var.
        jax.config.update("jax_platforms", flags["platform"])
    if flags.get("precision") == "float64":
        import jax

        jax.config.update("jax_enable_x64", True)
    if flags.get("check-nans"):
        # Debug aid for the numerically fragile Nystrom chain
        # (reference README.md:96-98 instability note).
        import jax

        jax.config.update("jax_debug_nans", True)
    if flags.get("verbose"):
        import logging

        logging.basicConfig(level=logging.DEBUG,
                            format="%(name)s %(levelname)s %(message)s")


@contextlib.contextmanager
def profiled(flags):
    """jax.profiler trace around the run when --profile=DIR is given."""
    out_dir = flags.get("profile")
    if not out_dir:
        yield
        return
    import jax

    with jax.profiler.trace(out_dir):
        yield


def make_filter(flags):
    from nle_tpu.models.filter import NLEFilter

    kwargs = {}
    if "eps" in flags:
        kwargs["eps"] = float(flags["eps"])
    if flags.get("no-pallas"):
        kwargs["use_pallas"] = False
    if flags.get("factored"):
        kwargs["factored"] = True
    if "stage1" in flags:
        kwargs["stage1"] = flags["stage1"]
    if flags.get("precision") == "float64":
        import jax.numpy as jnp

        kwargs["dtype"] = jnp.float64
    return NLEFilter(**kwargs)


def done_line(flags) -> str:
    """The reference's completion message is "Done. Press any key in
    result window to exit." (reference src/enhance.cpp:45,
    src/denoise.cpp:43) — accurate only when a blocking result window
    follows. Print it verbatim under --show (strict stdout parity);
    headless runs say just "Done." (no window exists to press a key in)."""
    return ("Done. Press any key in result window to exit."
            if flags.get("show") else "Done.")


def maybe_show(result, flags, title: str = "Output image") -> None:
    """Optional strict-parity end behavior: the reference blocks on an
    imshow/waitKey(-1) window after writing the output (reference
    src/enhance.cpp:47-49, src/filter.cpp:504-511). Headless is the
    default; --show restores the blocking window where a display exists."""
    if not flags.get("show"):
        return
    if not (os.environ.get("DISPLAY") or os.environ.get("WAYLAND_DISPLAY")
            or sys.platform == "darwin"):
        # cv2.imshow can hard-abort (not raise) on display-less builds —
        # probe the environment instead of trying and catching.
        print("--show: no display available; the output was written to "
              "disk.", file=sys.stderr)
        return
    try:
        import cv2

        cv2.imshow(title, result)
        cv2.waitKey(-1)
        cv2.destroyAllWindows()
    except Exception as e:
        print(f"--show: cannot open a display window ({e}); the output "
              "was written to disk.", file=sys.stderr)


def maybe_dump_eigvecs(flt, flags) -> None:
    """Headless replacement for the reference's debug imshow of the first
    <=5 eigenvectors (src/filter.cpp:504-511)."""
    out_dir = flags.get("debug-eigvecs")
    if not out_dir:
        return
    import numpy as np

    from nle_tpu.utils.imageio import imwrite_bgr
    from nle_tpu.utils.visualize import eigvec_images

    os.makedirs(out_dir, exist_ok=True)
    t = flt.trained
    if not hasattr(t, "eigvecs"):
        print("--debug-eigvecs: factored filters store no eigenvector "
              "matrix; skipping dumps.", file=sys.stderr)
        return
    V = t.eigvecs_pixel_order()
    S = np.asarray(t.eigvals)
    for i, img in enumerate(eigvec_images(t, V=V)):
        v = V[:, i]
        print(
            f"Eigvec {i} eigval: {S[i]} minCoeff: {v.min()} maxCoeff: {v.max()}",
            file=sys.stderr,
        )
        imwrite_bgr(os.path.join(out_dir, f"eigvec_{i}.png"),
                    np.repeat(img[..., None], 3, axis=-1))
