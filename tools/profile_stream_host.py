"""In-situ host-side breakdown of the bench STREAM loop.

Runs bench.py's exact stream schedule (pipelined train_filters_iter +
interleaved 4-thread edits) with wall-clock accumulators wrapped around
every host-side piece, so the ROADMAP-19 "stream is host-bound" claim can
be attributed to specific milliseconds:

  stage1.ka_build    f64 Ka affinity build (p x p exp)
  stage1.eigh        dsyevd(p) on the host
  stage1.pack_chan   N-sized permute of the L channel (+ u8 check)
  stage1.pack_up     pack_stage1 + jnp.asarray uploads + 2a dispatch
  lab.fwd            BGR->Lab (C kernel) per frame (channel producer)
  rc.wait            blocking rc fetch (device slack shows up HERE)
  host.chain         host_orthogonalize (eig(Wa)+E+3 GEMMs+eig(Q))
  stage2b.dispatch   va upload + stage-2b dispatch
  edit.enhance       consumer-thread NLEFilter.enhance (device apply +
                     result fetch + Lab round trip), summed across pool

Main-thread pieces are the serial per-frame host cost; rc.wait is the
device-bound slack (if ~0, the stream is host-bound). Usage:

  cd /root/repo && python tools/profile_stream_host.py [--mp=1.0]
      [--repeats=8] [--passes=2] [--platform=cpu]
"""

import json
import os
import sys
import threading
import time
from collections import defaultdict

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


class Acc:
    def __init__(self):
        self.t = defaultdict(float)
        self.n = defaultdict(int)
        self.lock = threading.Lock()

    def add(self, key, dt):
        with self.lock:
            self.t[key] += dt
            self.n[key] += 1

    def wrap(self, key, fn):
        def wrapped(*a, **kw):
            t0 = time.perf_counter()
            out = fn(*a, **kw)
            self.add(key, time.perf_counter() - t0)
            return out
        return wrapped

    def snapshot(self):
        with self.lock:
            return dict(self.t), dict(self.n)

    def reset(self):
        with self.lock:
            self.t.clear()
            self.n.clear()


def main():
    mp_target = 1.0
    repeats = 8
    passes = 2
    platform = None
    for a in sys.argv[1:]:
        if a.startswith("--mp="):
            mp_target = float(a.split("=", 1)[1])
        elif a.startswith("--repeats="):
            repeats = int(a.split("=", 1)[1])
        elif a.startswith("--passes="):
            passes = int(a.split("=", 1)[1])
        elif a.startswith("--platform="):
            platform = a.split("=", 1)[1]
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    from nle_tpu.config import enable_persistent_cache

    enable_persistent_cache()

    import numpy as np

    from bench_input import load_input
    from nle_tpu.color.lab import bgr_to_lab_u8_np, lab_to_bgr_u8_np
    from nle_tpu.models.filter import NLEFilter
    import nle_tpu.models.batch as batch
    import nle_tpu.ops.pipeline as pipe

    acc = Acc()

    # --- instrument the pipeline's host pieces (patch in BOTH modules:
    # models/batch imported the names by value) ---
    orig_build_ka = pipe._build_ka64
    orig_eigh64 = pipe._eigh64

    def ka_eigh_host64(y_sel, rows_sel, cols_sel, hx, hy, eps):
        t0 = time.perf_counter()
        Ka = orig_build_ka(y_sel, rows_sel, cols_sel, hx, hy)
        t1 = time.perf_counter()
        lam, U = orig_eigh64(Ka)
        t2 = time.perf_counter()
        acc.add("stage1.ka_build", t1 - t0)
        acc.add("stage1.eigh", t2 - t1)
        lam = lam[::-1]
        U = U[:, ::-1]
        m = int(np.count_nonzero(lam >= eps)) if lam.size else 0
        U_m = U[:, :m]
        lam_m = lam[:m]
        return U_m, lam_m, U_m / lam_m[None, :]

    batch.ka_eigh_host64 = ka_eigh_host64
    batch.pack_channel = acc.wrap("stage1.pack_chan", pipe.pack_channel)
    batch.host_orthogonalize = acc.wrap("host.chain", pipe.host_orthogonalize)
    batch.train_filter_stage2a = acc.wrap("stage1.pack_up",
                                          pipe.train_filter_stage2a)
    batch.train_filter_stage2b = acc.wrap("stage2b.dispatch",
                                          pipe.train_filter_stage2b)

    # rc wait: patch finish()'s blocking fetch via np.asarray is too broad —
    # instead wrap the whole finish-side by timing inside a shim generator.
    img = load_input(mp_target)
    mp = img.shape[0] * img.shape[1] / 1e6
    params = (20, 30, 500.0, 10.0, 50, 50)
    weights = [4.0, 3.0, 4.0, 1.0]

    rng = np.random.default_rng(0)
    frames_bgr = []
    span = np.arange(-2 * repeats, 2 * repeats + 1)
    for d in rng.choice(span, size=repeats, replace=False):
        lab = bgr_to_lab_u8_np(img)
        lab[..., 0] = np.clip(lab[..., 0].astype(np.int32) + int(d),
                              0, 255).astype(np.uint8)
        frames_bgr.append(lab_to_bgr_u8_np(lab))

    # time the blocking rc fetch: wrap np.asarray only for device arrays of
    # the rc shape inside batch.finish — simplest faithful hook is patching
    # the module's np with a proxy. Narrower: patch submit_sb_fetch to
    # return a timed resolver, and time rc via a monkeypatched np.asarray
    # in the batch module namespace.
    real_np_asarray = np.asarray

    class NPProxy:
        def __getattr__(self, name):
            return getattr(np, name)

        @staticmethod
        def asarray(x, *a, **kw):
            if hasattr(x, "addressable_shards"):  # device array: rc fetch
                t0 = time.perf_counter()
                out = real_np_asarray(x, *a, **kw)
                acc.add("rc.wait", time.perf_counter() - t0)
                return out
            return real_np_asarray(x, *a, **kw)

    batch.np = NPProxy()

    def run_stream():
        from concurrent.futures import ThreadPoolExecutor

        def channels():
            for b in frames_bgr:
                t0 = time.perf_counter()
                lab = bgr_to_lab_u8_np(b)
                ch = lab[..., 0].astype(np.float32)
                acc.add("lab.fwd", time.perf_counter() - t0)
                yield ch

        def edit(i, flt):
            t0 = time.perf_counter()
            out = NLEFilter(trained=flt).enhance(frames_bgr[i], weights)
            acc.add("edit.enhance", time.perf_counter() - t0)
            return out

        out = [None] * repeats
        with ThreadPoolExecutor(4) as ex:
            futs = [
                ex.submit(lambda i=i, flt=flt: out.__setitem__(
                    i, edit(i, flt)))
                for i, flt in enumerate(
                    batch.train_filters_iter(channels(), *params))
            ]
            for f in futs:
                f.result()
        assert all(o is not None for o in out)
        return out

    run_stream()  # warmup/compile
    acc.reset()
    results = []
    for _ in range(passes):
        acc.reset()
        t0 = time.perf_counter()
        run_stream()
        wall = time.perf_counter() - t0
        t, n = acc.snapshot()
        per_frame = {k: 1e3 * v / repeats for k, v in sorted(t.items())}
        main_keys = ("stage1.ka_build stage1.eigh stage1.pack_chan "
                     "stage1.pack_up lab.fwd host.chain stage2b.dispatch "
                     "rc.wait").split()
        main_ms = sum(per_frame.get(k, 0.0) for k in main_keys)
        results.append({
            "wall_s": round(wall, 3),
            "mps": round(repeats * mp / wall, 3),
            "frame_ms": round(1e3 * wall / repeats, 1),
            "main_thread_ms_per_frame": round(main_ms, 1),
            "per_frame_ms": {k: round(v, 1) for k, v in per_frame.items()},
            "calls": n,
        })
        print(json.dumps(results[-1]), flush=True)
    best = min(results, key=lambda r: r["wall_s"])
    print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
    main()
