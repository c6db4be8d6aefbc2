"""Pool soak: sustained mixed traffic through the nle-serve-pool router,
with a WORKER CRASH injected mid-soak.

The single-server soak (tools/soak_serving.py) proves one nle-serve
instance survives eviction churn; this drives the multi-worker deployment
shape end to end: N CPU workers behind the sticky-routing front door
(nle_tpu/serving/pool.py), random /train + /apply + /enhance + DELETE +
/metrics from several client threads, and at ~40% elapsed one worker is
SIGKILLed (no SIGTERM checkpoint sweep — the hard-crash case). Asserts:

  - the ROUTER never returns a 5xx other than 502 worker-unreachable,
    and every 502 falls inside the crash->recovery window (the router's
    designed degraded mode while the supervisor restarts the worker);
  - 502s STOP once the worker is back (recovery actually completes
    under live traffic);
  - the supervisor's restart shows in aggregated /metrics
    (restarts >= 1) and final /healthz is ok across all workers;
  - a named filter CHECKPOINTED on the killed worker before the crash
    is served again after recovery (spill-dir warm restart), with
    /apply bytes identical to the pre-crash edit;
  - aggregate accounted resident bytes stay within n_workers * budget.

Clients treat 4xx as legitimate (deleted-name races; names whose only
copy was resident in the killed worker are lost exactly like a
single-server crash).

Usage (CPU workers; ~60 s default):

    python tools/soak_pool.py [--seconds=60] [--threads=4] [--workers=2]

Prints one JSON line; rc 0 = ok.
"""

import json
import os
import sys
import tempfile
import threading
import time
import urllib.error
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main() -> int:
    seconds = 60.0
    n_threads = 4
    n_workers = 2
    for a in sys.argv[1:]:
        if a.startswith("--seconds="):
            seconds = float(a.split("=", 1)[1])
        elif a.startswith("--threads="):
            n_threads = int(a.split("=", 1)[1])
        elif a.startswith("--workers="):
            n_workers = int(a.split("=", 1)[1])
        else:
            print(f"unknown argument {a!r}", file=sys.stderr)
            return 2

    import numpy as np

    from nle_tpu.serving.pool import WorkerPool, make_pool_server
    from nle_tpu.utils.imageio import imencode_png

    rng0 = np.random.default_rng(0)
    img = rng0.integers(0, 256, (40, 50, 3), dtype=np.uint8)
    png = imencode_png(img)
    cfg = "nr=4&nc=5&hx=50&hy=30&iters=3&k=3"
    budget = 100 << 10   # ~2 of these ~44 KB filters per worker: churn

    with tempfile.TemporaryDirectory(prefix="nle-pool-soak-") as spill:
        pool = WorkerPool(
            n_workers,
            ["--platform=cpu", f"--max-filter-bytes={budget}"],
            spill_root=spill)
        pool.start()
        srv = make_pool_server(pool)
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        threading.Thread(target=srv.serve_forever, daemon=True).start()
        t_start = time.monotonic()
        stop = t_start + seconds
        kill_at = t_start + 0.4 * seconds
        counts = {"ok": 0, "4xx": 0, "502": 0}
        lock = threading.Lock()
        errors: list = []
        last_502 = [0.0]
        names = [f"s{i}" for i in range(8)]

        # Pre-crash pinned filter: train "pin" (sticky-routed to whichever
        # worker owns its hash), capture its /apply bytes, then force a
        # checkpoint to disk by DELETE-free eviction churn... simpler and
        # deterministic: train it, apply it, and train enough other names
        # that the byte budget evicts "pin" to spill (eviction writes the
        # checkpoint) BEFORE the kill.
        def call(method, path, data=None, timeout=300):
            req = urllib.request.Request(f"{base}{path}", data=data,
                                         method=method)
            with urllib.request.urlopen(req, timeout=timeout) as r:
                return r.read()

        call("POST", f"/train?name=pin&{cfg}", png)
        pin_ref = call("POST", "/apply?name=pin&w=1,2,2,1", png)
        # The kill only tests warm recovery if the victim OWNS pin — use
        # the router's own sticky pick. Evicting pin to disk (the eviction
        # writes its checkpoint) likewise needs fills routed to the SAME
        # worker: filter candidate names by the router's hash.
        victim = pool.pick("/train", "name=pin")
        filled = 0
        for i in range(64):
            if pool.pick("/train", f"name=fill{i}") is victim:
                call("POST", f"/train?name=fill{i}&{cfg}", png)
                filled += 1
                if filled >= 3:
                    break
        assert filled >= 3, "hash never routed 3 fills to pin's worker"

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
                            r.read()
                            with lock:
                                counts["ok"] += 1
                    except urllib.error.HTTPError as e:
                        e.read()
                        now = time.monotonic()
                        if 400 <= e.code < 500:
                            with lock:
                                counts["4xx"] += 1
                        elif e.code == 502:
                            with lock:
                                counts["502"] += 1
                                last_502[0] = max(last_502[0], now)
                            if not (kill_at - 1.0 <= now):
                                errors.append(("502 before crash", url))
                        else:
                            errors.append((url, e.code))
            except Exception as e:   # transport faults to the ROUTER fail
                errors.append((type(e).__name__, str(e)[:200]))

        workers = [threading.Thread(target=client, args=(s,))
                   for s in range(n_threads)]
        for w in workers:
            w.start()

        # Crash injection: SIGKILL one worker process via its Popen handle
        # (never by pattern). The supervisor sweep restarts it and its
        # spill dir warm-restarts the checkpointed names.
        time.sleep(max(0.0, kill_at - time.monotonic()))
        victim.proc.kill()
        t_kill = time.monotonic()

        for w in workers:
            w.join(seconds + 600)
        # Recovery probe: the supervisor polls every 1 s and wait_ready
        # blocks until /healthz — give it a bounded grace, then the pinned
        # filter must serve identical bytes wherever it lives.
        deadline = time.monotonic() + 120
        recovered = False
        while time.monotonic() < deadline:
            try:
                views = json.loads(call("GET", "/healthz", timeout=30))
                if views["ok"]:
                    recovered = True
                    break
            except Exception:
                pass
            time.sleep(1.0)
        pin_after = None
        try:
            pin_after = call("POST", "/apply?name=pin&w=1,2,2,1", png)
        except urllib.error.HTTPError as e:
            e.read()
            errors.append(("pin lost after recovery", e.code))
        m = json.loads(call("GET", "/metrics", timeout=30))
        srv.shutdown()
        pool.stop()

        pin_exact = pin_after == pin_ref
        ok = (not errors and recovered and pin_exact
              and m["restarts"] >= 1
              and m["resident_bytes"] <= n_workers * budget)
        print(json.dumps({
            "ok": bool(ok), "seconds": seconds, "threads": n_threads,
            "workers": n_workers,
            "requests_ok": counts["ok"], "requests_4xx": counts["4xx"],
            "requests_502_during_recovery": counts["502"],
            "recovery_s": (round(last_502[0] - t_kill, 1)
                           if last_502[0] else 0.0),
            "unexpected_errors": errors[:5],
            "restarts": m["restarts"],
            "pin_filter_exact_after_crash": bool(pin_exact),
            "resident_bytes": m["resident_bytes"],
            "budget_total": n_workers * budget,
            "healthz_recovered": bool(recovered),
        }))
        return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
