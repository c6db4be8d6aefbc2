"""Serving soak: sustained mixed traffic against an in-process server.

Hammers one nle-serve instance (CPU by default) with a random mix of
/train, /apply, /enhance, DELETE, and /metrics from several client
threads for a bounded duration, under a deliberately small filter byte
budget so eviction/spill/reload churns the whole time. Asserts at the
end:

  - no 5xx was ever returned (4xx for races on deleted names are
    legitimate);
  - accounted resident bytes stayed within the budget;
  - the server thread count did not grow without bound (no leak);
  - /healthz still answers ok.

Usage (CPU, ~60 s default):

    python tools/soak_serving.py [--seconds=60] [--threads=4]

Prints one JSON line; rc 0 = ok.
"""

import json
import os
import sys
import threading
import time
import urllib.error
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    seconds = 60.0
    n_threads = 4
    platform_set = False
    for a in sys.argv[1:]:
        if a.startswith("--seconds="):
            seconds = float(a.split("=", 1)[1])
        elif a.startswith("--threads="):
            n_threads = int(a.split("=", 1)[1])
        elif a.startswith("--platform="):
            import jax

            jax.config.update("jax_platforms", a.split("=", 1)[1])
            platform_set = True
        else:
            print(f"unknown argument {a!r}", file=sys.stderr)
            return 2
    if not platform_set:
        import jax

        jax.config.update("jax_platforms", "cpu")

    import tempfile

    import numpy as np

    from nle_tpu.serving.http import make_server
    from nle_tpu.utils.imageio import imencode_png

    rng0 = np.random.default_rng(0)
    img = rng0.integers(0, 256, (40, 50, 3), dtype=np.uint8)
    png = imencode_png(img)
    cfg = "nr=4&nc=5&hx=50&hy=30&iters=3&k=3"
    budget = 100 << 10   # ~2 of these ~44 KB filters: constant churn

    with tempfile.TemporaryDirectory(prefix="nle-soak-") as spill:
        srv = make_server(max_filters=64, spill_dir=spill,
                          max_filter_bytes=budget)
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        stop = time.monotonic() + seconds
        counts = {"ok": 0, "4xx": 0}
        counts_lock = threading.Lock()
        errors: list = []
        peak_bytes = [0]
        names = [f"s{i}" for i in range(8)]

        def client(seed: int):
            rng = np.random.default_rng(seed)
            try:
                while time.monotonic() < stop:
                    op = int(rng.integers(5))
                    name = names[int(rng.integers(len(names)))]
                    if op == 0:
                        url, data, method = (f"{base}/train?name={name}&{cfg}",
                                             png, "POST")
                    elif op == 1:
                        url, data, method = (
                            f"{base}/apply?name={name}&w=1,2,2,1", png,
                            "POST")
                    elif op == 2:
                        url, data, method = (
                            f"{base}/enhance?{cfg}&w=1,2,2,1", png, "POST")
                    elif op == 3:
                        url, data, method = (f"{base}/filters?name={name}",
                                             None, "DELETE")
                    else:
                        url, data, method = f"{base}/metrics", None, "GET"
                    req = urllib.request.Request(url, data=data,
                                                 method=method)
                    try:
                        with urllib.request.urlopen(req, timeout=300) as r:
                            body = r.read()
                            if url.endswith("/metrics"):
                                f = json.loads(body)["filters"]
                            else:
                                f = None
                            # Locked read-modify-write: a lost max() update
                            # could silently drop an over-budget
                            # observation — the exact signal this soak
                            # exists to catch.
                            with counts_lock:
                                counts["ok"] += 1
                                if f is not None:
                                    peak_bytes[0] = max(
                                        peak_bytes[0], f["resident_bytes"])
                    except urllib.error.HTTPError as e:
                        e.read()
                        if 400 <= e.code < 500:
                            with counts_lock:
                                counts["4xx"] += 1  # deleted-name races etc.
                        else:
                            errors.append((url, e.code))
            except Exception as e:   # transport faults are failures too
                errors.append((type(e).__name__, str(e)[:200]))

        threads_before = threading.active_count()
        workers = [threading.Thread(target=client, args=(s,))
                   for s in range(n_threads)]
        for w in workers:
            w.start()
        for w in workers:
            w.join(seconds + 600)
        # Let in-flight spill saves settle before the final probes.
        time.sleep(1.0)
        with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
            healthz_ok = json.loads(r.read())["ok"]
        with urllib.request.urlopen(f"{base}/metrics", timeout=30) as r:
            m = json.loads(r.read())
        srv.shutdown()
        threads_after = threading.active_count()
        ok = (not errors and healthz_ok
              and peak_bytes[0] <= budget
              and m["filters"]["resident_bytes"] <= budget
              and threads_after <= threads_before + n_threads + 8)
        print(json.dumps({
            "ok": bool(ok), "seconds": seconds, "threads": n_threads,
            "requests_ok": counts["ok"], "requests_4xx": counts["4xx"],
            "server_5xx_or_transport": errors[:5],
            "peak_resident_bytes": peak_bytes[0], "budget": budget,
            "evictions": m["filters"]["evictions"],
            "healthz_ok": bool(healthz_ok),
            "threads_before": threads_before, "threads_after": threads_after,
        }))
        return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
