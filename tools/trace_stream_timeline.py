"""Per-frame TUNNEL timeline of the bench stream (VERDICT r4 #1).

The r4 stream accounting assigned the ~100 ms/frame residual between the
device arithmetic ceiling (~3.4 MP/s) and the measured stream (2.4-2.8)
to tunnel occupancy BY SUBTRACTION. This tool records actual per-request
SPANS — wall-clock (t0, t1) plus bytes for every host<->device
interaction of the stream schedule — so the claim is either pinned with
direct evidence or falsified:

  up.chan      y u8 channel upload (batch.submit jnp.asarray)
  up.stage1    packed stage-1 upload (f32 (p+2, mb))
  disp.2a      stage-2a dispatch call (host-side span of the jitted call)
  rc.wait      blocking rc fetch (device slack + ~30 ms latency)
  sb.ready     pooled Sb probe: submit -> value computed (+~30 ms latency)
  sb.link      pooled Sb bulk transfer AFTER the probe (~pure link time)
  up.va        stage-2b [top;GrT] upload
  disp.2b      stage-2b dispatch
  edit.ready   consumer-thread probe: edit value computed
  edit.link    consumer-thread u8 result bulk transfer (~pure link time)

Output: one JSON object with per-pass aggregates and the full event list
(kind, t0_ms, t1_ms, ms, bytes, frame) relative to pass start. Aggregates
include per-kind busy ms/frame, the UNION busy time of all transfer-kind
spans (the link cannot move two requests' bytes at once), and implied
bandwidths. rc.wait and the *.ready probes are kept out of
the union (they are mostly device slack, not link) — the union of
up.*/sb.link/edit.link bounds the pure transfer occupancy from below.

Usage (real chip, ONE TPU job at a time):
  cd /root/repo && python tools/trace_stream_timeline.py [--mp=1.0]
      [--repeats=8] [--passes=2] [--out=TIMELINE_STREAM.json]
"""

import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np


class Spans:
    def __init__(self):
        self.events = []
        self.lock = threading.Lock()
        self.t_base = time.perf_counter()
        self.frame = -1          # producer-side frame counter

    def reset(self):
        with self.lock:
            self.events = []
            self.t_base = time.perf_counter()
            self.frame = -1

    def add(self, kind, t0, t1, nbytes=0, frame=None):
        with self.lock:
            self.events.append({
                "kind": kind,
                "t0_ms": round(1e3 * (t0 - self.t_base), 2),
                "t1_ms": round(1e3 * (t1 - self.t_base), 2),
                "ms": round(1e3 * (t1 - t0), 2),
                "bytes": int(nbytes),
                "frame": self.frame if frame is None else frame,
            })

    def wrap(self, kind, fn, nbytes_of=None):
        def wrapped(*a, **kw):
            t0 = time.perf_counter()
            out = fn(*a, **kw)
            t1 = time.perf_counter()
            nb = nbytes_of(a, out) if nbytes_of else 0
            self.add(kind, t0, t1, nb)
            return out
        return wrapped


def union_ms(events, kinds):
    iv = sorted((e["t0_ms"], e["t1_ms"]) for e in events
                if e["kind"] in kinds)
    total = 0.0
    cur_a = cur_b = None
    for a, b in iv:
        if cur_b is None or a > cur_b:
            if cur_b is not None:
                total += cur_b - cur_a
            cur_a, cur_b = a, b
        else:
            cur_b = max(cur_b, b)
    if cur_b is not None:
        total += cur_b - cur_a
    return total


def main():
    mp_target = 1.0
    repeats = 8
    passes = 2
    out_path = None
    for a in sys.argv[1:]:
        if a.startswith("--mp="):
            mp_target = float(a.split("=", 1)[1])
        elif a.startswith("--repeats="):
            repeats = int(a.split("=", 1)[1])
        elif a.startswith("--passes="):
            passes = int(a.split("=", 1)[1])
        elif a.startswith("--out="):
            out_path = a.split("=", 1)[1]
        elif a.startswith("--platform="):
            import jax

            jax.config.update("jax_platforms", a.split("=", 1)[1])
    from nle_tpu.config import enable_persistent_cache

    enable_persistent_cache()

    from bench_input import load_input
    from nle_tpu.color.lab import bgr_to_lab_u8_np, lab_to_bgr_u8_np
    from nle_tpu.models.filter import NLEFilter
    import nle_tpu.models.batch as batch
    import nle_tpu.models.filter as fmod
    import nle_tpu.ops.pipeline as pipe
    import jax.numpy as jnp

    sp = Spans()

    # --- uploads: proxy batch.jnp so submit()'s jnp.asarray calls are
    # timed and classified by payload (u8 1-D = channel; f32 2-D = stage-1
    # pack). finish()'s va upload goes through the same proxy (f32 2-D,
    # much smaller) — disambiguated by a thread-local flag set in the
    # wrapped stage-2b dispatch path below.
    real_jnp_asarray = jnp.asarray
    in_finish = threading.local()

    class JnpProxy:
        def __getattr__(self, name):
            return getattr(jnp, name)

        @staticmethod
        def asarray(x, *a, **kw):
            if isinstance(x, np.ndarray):
                kind = None
                if x.dtype == np.uint8:
                    kind = "up.chan"
                elif x.ndim == 2 and x.dtype in (np.float32, np.float64):
                    kind = ("up.va" if getattr(in_finish, "on", False)
                            else "up.stage1")
                if kind:
                    # Bare asarray span (no block_until_ready: that waits
                    # behind queued COMPUTE on a FIFO device queue and
                    # would misattribute device-busy time to the link).
                    # On this tunnel asarray itself pays the upload
                    # (~650 MB/s measured by exactly this timing).
                    t0 = time.perf_counter()
                    out = real_jnp_asarray(x, *a, **kw)
                    sp.add(kind, t0, time.perf_counter(), x.nbytes)
                    return out
            return real_jnp_asarray(x, *a, **kw)

    batch.jnp = JnpProxy()

    # --- dispatches + rc fetch + frame counting ---
    real_2a = pipe.train_filter_stage2a

    def wrapped_2a(*a, **kw):
        sp.frame += 1
        t0 = time.perf_counter()
        out = real_2a(*a, **kw)
        sp.add("disp.2a", t0, time.perf_counter())
        return out

    batch.train_filter_stage2a = wrapped_2a

    real_2b = pipe.train_filter_stage2b

    def wrapped_2b(*a, **kw):
        t0 = time.perf_counter()
        out = real_2b(*a, **kw)
        sp.add("disp.2b", t0, time.perf_counter())
        in_finish.on = False
        return out

    batch.train_filter_stage2b = wrapped_2b

    real_chain = pipe.host_orthogonalize

    def wrapped_chain(*a, **kw):
        t0 = time.perf_counter()
        out = real_chain(*a, **kw)
        sp.add("host.chain", t0, time.perf_counter())
        in_finish.on = True      # next f32 2-D upload is the va pack
        return out

    batch.host_orthogonalize = wrapped_chain

    real_np_asarray = np.asarray

    class NPProxy:
        def __getattr__(self, name):
            return getattr(np, name)

        @staticmethod
        def asarray(x, *a, **kw):
            if hasattr(x, "addressable_shards"):   # device rc fetch
                t0 = time.perf_counter()
                out = real_np_asarray(x, *a, **kw)
                sp.add("rc.wait", t0, time.perf_counter(), out.nbytes)
                return out
            return real_np_asarray(x, *a, **kw)

    batch.np = NPProxy()

    # --- Sb fetch: wrap the pooled transfer itself. A fetch of an async
    # device value first WAITS for the value: to separate device slack
    # from pure link time, a 1-element probe fetch (~30 ms latency) runs
    # first ("sb.ready" = dispatch->computed+latency), then the bulk
    # transfer ("sb.link" ~ pure link occupancy). ---
    def wrapped_sb(sb_dev):
        def timed():
            t0 = time.perf_counter()
            np.asarray(sb_dev[:1, :1])
            t1 = time.perf_counter()
            out = pipe.transfer_fetch(sb_dev)
            t2 = time.perf_counter()
            sp.add("sb.ready", t0, t1)
            sp.add("sb.link", t1, t2, out.nbytes)
            arr = np.asarray(out, np.float64)
            if (arr.shape[1] == 128 and arr.shape[0] % 128 == 0
                    and arr.shape[0] != arr.shape[1]):
                # NLE_SB_TRI default: stage 2a ships the lower-triangle
                # block pack — reassemble like pipe.submit_sb_fetch does.
                ntri = arr.shape[0] // 128
                nb = int((np.sqrt(8 * ntri + 1) - 1) / 2)
                arr = pipe._unpack_sb_tri(arr, nb * 128)
            return arr

        fut = pipe.transfer_pool().submit(timed)
        return fut.result

    batch.submit_sb_fetch = wrapped_sb

    # --- edit-side u8 fetch (consumer threads): same ready/link split ---
    real_fetch = fmod.fetch

    def wrapped_fetch(arr):
        t0 = time.perf_counter()
        try:
            np.asarray(arr[:1])
        except Exception:
            pass
        t1 = time.perf_counter()
        out = real_fetch(arr)
        t2 = time.perf_counter()
        sp.add("edit.ready", t0, t1, frame=-2)
        sp.add("edit.link", t1, t2, getattr(out, "nbytes", 0), frame=-2)
        return out

    fmod.fetch = wrapped_fetch

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

    def run_stream():
        from concurrent.futures import ThreadPoolExecutor

        def channels():
            for b in frames_bgr:
                yield bgr_to_lab_u8_np(b)[..., 0].astype(np.float32)

        def edit(i, flt):
            t0 = time.perf_counter()
            out = NLEFilter(trained=flt).enhance(frames_bgr[i], weights)
            sp.add("edit.total", t0, time.perf_counter(), frame=i)
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

    run_stream()   # warmup/compile pass
    transfer_kinds = ("up.chan", "up.stage1", "up.va", "sb.link",
                      "edit.link")
    results = []
    for _ in range(passes):
        sp.reset()
        t0 = time.perf_counter()
        run_stream()
        wall = time.perf_counter() - t0
        events = sorted(sp.events, key=lambda e: e["t0_ms"])
        per_kind = {}
        for e in events:
            d = per_kind.setdefault(e["kind"],
                                    {"ms": 0.0, "bytes": 0, "n": 0})
            d["ms"] += e["ms"]
            d["bytes"] += e["bytes"]
            d["n"] += 1
        for k, d in per_kind.items():
            d["ms_per_frame"] = round(d["ms"] / repeats, 1)
            d["ms"] = round(d["ms"], 1)
            if d["bytes"] and d["ms"]:
                d["MBps"] = round(d["bytes"] / 1e6 / (d["ms"] / 1e3), 1)
        link_busy = union_ms(events, transfer_kinds)
        link_busy_rc = union_ms(events, transfer_kinds + ("rc.wait",))
        res = {
            "mp": round(mp, 3),
            "repeats": repeats,
            "wall_s": round(wall, 3),
            "mps": round(repeats * mp / wall, 3),
            "frame_ms": round(1e3 * wall / repeats, 1),
            "per_kind": per_kind,
            "link_busy_ms_per_frame": round(link_busy / repeats, 1),
            "link_busy_with_rc_ms_per_frame": round(
                link_busy_rc / repeats, 1),
            "events": events,
        }
        results.append(res)
        print(json.dumps({k: v for k, v in res.items()
                          if k != "events"}), flush=True)
    if out_path:
        best = min(results, key=lambda r: r["wall_s"])
        with open(out_path, "w") as f:
            json.dump(best, f, indent=1)
        print(f"wrote {out_path}", flush=True)


if __name__ == "__main__":
    main()
