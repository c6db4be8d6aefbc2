"""Real-chip load check for the HTTP serving stack.

The serving tests (tests/test_serve_http.py) run on the virtual CPU
backend; the coalescing trainer's pipelined schedule — HTTP request
threads queueing into one `train_filters_iter` stream, each request's
edit interleaving with the next frames' device training — only meets the
real chip (dispatch latency, tunnel fetches, the device lock) here. This
tool starts the service in-process on the DEFAULT platform (axon = the
single real chip), fires CONCURRENT /enhance requests over real sockets,
and asserts:

  - every response decodes to a (H, W, 3) image of the input shape;
  - the unjittered frame's response is BIT-IDENTICAL to a direct
    in-process ``NLEFilter`` train+enhance of the same frame (the server
    path and the library path may not diverge — the CPU selftest proves
    the same equality for the /train + /apply route);
  - two byte-identical requests get byte-identical responses
    (determinism through the coalescer under concurrency);
  - /metrics shows the concurrent requests actually coalesced into
    pipelined batches (batched_filters > train_batches).

Inputs reuse the headline bench's frames (tools/bench_input.py rock2 at
1 MP, rock2 golden params) so the persistent compile cache from bench.py
makes this cheap. Run from /root/repo (the axon plugin needs that cwd):

    python tools/check_tpu_serving.py            # one JSON line; rc 0 = ok
    python tools/check_tpu_serving.py --platform=cpu --mp=0.05 --n=4

Record the chip result to SERVING_TPU_CHECK.json (verify skill).
"""

import json
import os
import sys
import threading
import time
import urllib.request
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

PARAMS = (20, 30, 500.0, 10.0, 50, 50)   # rock2 golden config (bench.py)
WEIGHTS = "4,3,4,1"


def _frames(img, n):
    """n distinct same-shape BGR frames: frame 0 unjittered (the
    bit-exactness reference), frame 1 a byte-copy of frame 0 (the
    determinism pair), the rest exposure-jittered as bench.py does."""
    import numpy as np

    from nle_tpu.color.lab import bgr_to_lab_u8_np, lab_to_bgr_u8_np

    rng = np.random.default_rng(0)
    frames = [img, img.copy()]
    span = [d for d in range(-2 * n, 2 * n + 1) if d != 0]
    for d in rng.choice(span, size=max(0, n - 2), replace=False):
        lab = bgr_to_lab_u8_np(img)
        lab[..., 0] = np.clip(lab[..., 0].astype(np.int32) + int(d),
                              0, 255).astype(np.uint8)
        frames.append(lab_to_bgr_u8_np(lab))
    return frames[:n]


def main() -> int:
    mp_target = 1.0
    n = 8
    for a in sys.argv[1:]:
        if a.startswith("--platform="):
            import jax

            jax.config.update("jax_platforms", a.split("=", 1)[1])
        elif a.startswith("--mp="):
            mp_target = float(a.split("=", 1)[1])
        elif a.startswith("--n="):
            n = int(a.split("=", 1)[1])
    if n < 4:
        raise SystemExit("--n must be >= 4 (reference + determinism pair + "
                         "two distinct frames for the eviction phase)")

    import numpy as np

    from nle_tpu.config import enable_persistent_cache

    enable_persistent_cache()
    from bench_input import load_input

    from nle_tpu.models.filter import NLEFilter
    from nle_tpu.serving.http import make_server
    from nle_tpu.utils.imageio import imdecode_bgr, imencode_png

    img = load_input(mp_target)
    mp = img.shape[0] * img.shape[1] / 1e6
    frames = _frames(img, n)
    bodies = [imencode_png(f) for f in frames]
    weights = [float(x) for x in WEIGHTS.split(",")]

    # Phase 0 (VERDICT r3 item 4): boot-warmup latency evidence. BEFORE
    # anything in this process compiles the serving programs, run the
    # server-boot warmup for the request shape (what `nle-serve
    # --warmup=H,W,nr,nc,iters,k` executes) — with the persistent compile
    # cache it costs seconds, not the minutes a cold shape pays — then
    # time the FIRST real request against steady state. A warmed boot
    # must put the first request within ~2x of steady state (gate at 3x:
    # tunnel wall varies +-15% and the first request also pays one-time
    # host-side caches like the Lab LUT build).
    from nle_tpu.serving.http import run_warmup

    warm_secs = run_warmup([(img.shape[0], img.shape[1], PARAMS[0],
                             PARAMS[1], PARAMS[4], PARAMS[5])])[0]

    srv = make_server()
    port = srv.server_address[1]
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{port}"
        cfg = (f"nr={PARAMS[0]}&nc={PARAMS[1]}&hx={PARAMS[2]:g}"
               f"&hy={PARAMS[3]:g}&iters={PARAMS[4]}&k={PARAMS[5]}"
               f"&w={WEIGHTS}")

        def post(body):
            req = urllib.request.Request(f"{base}/enhance?{cfg}", data=body)
            with urllib.request.urlopen(req, timeout=1800) as r:
                return r.read()

        # The first-request timing must run BEFORE anything else in this
        # process touches the serving programs — the library-path
        # reference training below compiles the very same stage-2a/2b +
        # edit jits, which would warm the process caches and make this
        # gate pass even if run_warmup warmed nothing.
        t0 = time.perf_counter()
        post(bodies[-1])   # the warmed server's FIRST request
        first_req_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        post(bodies[-1])
        steady_req_s = time.perf_counter() - t0
        warmed_ok = first_req_s <= 3.0 * steady_req_s

        # Library-path reference for frame 0 (trained OUTSIDE the server
        # so a server-side defect cannot cancel out of the comparison).
        ref_filter = NLEFilter()
        ref_filter.train_for_enhancement(frames[0], *PARAMS)
        ref_out = ref_filter.enhance(frames[0], weights)

        t0 = time.perf_counter()
        with ThreadPoolExecutor(n) as ex:
            outs = list(ex.map(post, bodies))
        wall = time.perf_counter() - t0

        decoded = [imdecode_bgr(o) for o in outs]
        assert all(d.shape == img.shape for d in decoded), \
            [d.shape for d in decoded]
        exact = bool(np.array_equal(decoded[0], ref_out))
        deterministic = outs[0] == outs[1]
        with urllib.request.urlopen(f"{base}/metrics", timeout=30) as r:
            m = json.loads(r.read())
        coalesced = m["batched_filters"] > m["train_batches"]
        psnr_vs_ref = 99.0 if exact else float(
            10 * np.log10(255.0 ** 2 / np.mean(
                (decoded[0].astype(np.float64) - ref_out.astype(np.float64))
                ** 2)))
        # Byte-budget eviction on the real chip: keep 3 named filters under
        # a budget that holds ~1.5 of them — training b and c evicts a
        # (device buffers free; checkpoint fetched over the tunnel), and a
        # later /apply for a must reload from spill and return bytes
        # IDENTICAL to the pre-eviction edit.
        import tempfile

        from nle_tpu.models.filter import TrainedFilter

        one = TrainedFilter(
            eigvecs=ref_filter.trained.eigvecs,
            eigvals=ref_filter.trained.eigvals,
            nrows=img.shape[0], ncols=img.shape[1]).nbytes()
        budget = int(1.5 * one)
        tcfg = cfg.rsplit("&w=", 1)[0]
        with tempfile.TemporaryDirectory(prefix="nle-evict-") as spill:
            srv2 = make_server(max_filter_bytes=budget, spill_dir=spill)
            port2 = srv2.server_address[1]
            threading.Thread(target=srv2.serve_forever, daemon=True).start()
            try:
                base2 = f"http://127.0.0.1:{port2}"

                def call(path, body):
                    req = urllib.request.Request(f"{base2}{path}", data=body)
                    with urllib.request.urlopen(req, timeout=1800) as r:
                        return r.read()

                call(f"/train?name=a&{tcfg}", bodies[0])
                out_a1 = call(f"/apply?name=a&w={WEIGHTS}", bodies[0])
                call(f"/train?name=b&{tcfg}", bodies[2])
                call(f"/train?name=c&{tcfg}", bodies[3])
                with urllib.request.urlopen(f"{base2}/metrics",
                                            timeout=30) as r:
                    m2 = json.loads(r.read())["filters"]
                out_a2 = call(f"/apply?name=a&w={WEIGHTS}", bodies[0])
                evict_ok = (m2["evictions"] >= 1
                            and m2["resident_bytes"] <= budget
                            and out_a1 == out_a2)
            finally:
                srv2.shutdown()

        ok = (exact and deterministic and coalesced
              and m["errors"] == 0 and m["trains"] == n + 2
              and evict_ok and warmed_ok)
        print(json.dumps({
            "ok": bool(ok), "n": n, "mp": round(mp, 3),
            "wall_s": round(wall, 3),
            "mp_per_s": round(n * mp / wall, 3),
            "boot_warmup_s": round(warm_secs, 3),
            "first_request_s": round(first_req_s, 3),
            "steady_request_s": round(steady_req_s, 3),
            "warmed_first_within_3x": bool(warmed_ok),
            "exact_match": exact, "psnr_vs_library": round(psnr_vs_ref, 2),
            "deterministic": bool(deterministic),
            "train_batches": m["train_batches"],
            "batched_filters": m["batched_filters"],
            "errors": m["errors"],
            "evict_reload_exact": bool(evict_ok),
            "evictions": m2["evictions"],
            # Actual HBM from the /metrics device_memory report (PJRT
            # memory_stats): peak bytes the load phase really touched on
            # the 16 GB chip — the operator-facing complement to the
            # accounted resident_bytes the byte-LRU enforces. null where
            # the PJRT plugin reports no stats (this machine's axon tunnel
            # returns None; standard TPU/GPU PJRT backends report real
            # numbers).
            "peak_hbm_bytes": max(
                (row.get("peak_bytes_in_use", 0)
                 for row in m.get("device_memory", {}).values()),
                default=None),
        }))
        return 0 if ok else 1
    finally:
        srv.shutdown()


if __name__ == "__main__":
    sys.exit(main())
