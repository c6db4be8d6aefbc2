"""Multi-worker serving pool (nle_tpu/serving/pool.py): routing semantics
(sticky named-filter hash, stateless round-robin), metric aggregation, and
crash-restart recovery over real worker processes on CPU."""

import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

cv2 = pytest.importorskip("cv2")

CFG = "nr=4&nc=5&hx=50&hy=30&iters=3&k=3"


@pytest.fixture(scope="module")
def pool_server(tmp_path_factory):
    from nle_tpu.serving.pool import WorkerPool, make_pool_server

    spill_root = str(tmp_path_factory.mktemp("pool-spill"))
    pool = WorkerPool(2, ["--platform=cpu"], spill_root=spill_root)
    pool.start()
    srv = make_pool_server(pool, max_bytes=1 << 20)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}", pool
    srv.shutdown()
    pool.stop()


@pytest.fixture(scope="module")
def small_png():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (40, 50, 3), dtype=np.uint8)
    ok, buf = cv2.imencode(".png", img)
    assert ok
    return img, buf.tobytes()


def _post(url, data, timeout=300):
    return urllib.request.urlopen(
        urllib.request.Request(url, data=data), timeout=timeout)


def test_pool_healthz(pool_server):
    base, pool = pool_server
    with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
        meta = json.loads(r.read())
    assert meta["ok"] and meta["workers"] == 2


def test_pool_round_robin_enhance(pool_server, small_png):
    """Stateless one-shots succeed through the router and land on BOTH
    workers (round-robin): after 4 requests each worker's /metrics shows
    at least one /enhance."""
    base, pool = pool_server
    img, png = small_png
    outs = []
    for _ in range(4):
        with _post(f"{base}/enhance?{CFG}&w=1,2,2,1", png) as r:
            outs.append(cv2.imdecode(np.frombuffer(r.read(), np.uint8),
                                     cv2.IMREAD_COLOR))
    for o in outs[1:]:
        np.testing.assert_array_equal(o, outs[0])   # deterministic
    counts = []
    for w in pool.workers:
        with urllib.request.urlopen(
                f"http://127.0.0.1:{w.port}/metrics", timeout=30) as r:
            m = json.loads(r.read())
        counts.append(m["endpoints"].get("/enhance", {}).get("count", 0))
    assert all(c >= 1 for c in counts), counts


def test_pool_sticky_named_filters(pool_server, small_png):
    """/train then /apply for the same name route to the same worker, so
    the kept filter is found; a name-hash mismatch would 400."""
    base, pool = pool_server
    img, png = small_png
    for name in ("alpha", "beta", "gamma"):
        with _post(f"{base}/train?name={name}&{CFG}", png) as r:
            assert json.loads(r.read())["name"] == name
        with _post(f"{base}/apply?name={name}&w=1,2,2,1", png) as r:
            out = cv2.imdecode(np.frombuffer(r.read(), np.uint8),
                               cv2.IMREAD_COLOR)
        assert out.shape == img.shape
    # The pool healthz advertises the union of worker namespaces.
    with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
        names = json.loads(r.read())["filters"]
    assert {"alpha", "beta", "gamma"} <= set(names)
    # Unknown names surface the worker's 400 through the router.
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{base}/apply?name=nope&w=1,1", png)
    assert ei.value.code == 400
    # DELETE routes sticky too.
    req = urllib.request.Request(f"{base}/filters?name=gamma",
                                 method="DELETE")
    with urllib.request.urlopen(req, timeout=30) as r:
        assert json.loads(r.read())["deleted"] == "gamma"


def test_pool_metrics_aggregate(pool_server, small_png):
    base, pool = pool_server
    with urllib.request.urlopen(f"{base}/metrics", timeout=30) as r:
        m = json.loads(r.read())
    assert m["trains"] >= 1 and m["edits"] >= 1
    assert len(m["workers"]) == 2
    assert "resident_bytes" in m


def test_pool_front_door_size_limit(pool_server):
    base, pool = pool_server
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{base}/enhance?{CFG}", b"x" * (2 << 20))
    assert ei.value.code == 413


def test_pool_auth_passthrough(tmp_path, small_png):
    """Worker bearer-token auth works through the router: the
    Authorization header is forwarded (it is not a hop-by-hop header), so
    a locked pool 401s without the token and serves with it."""
    from nle_tpu.serving.pool import WorkerPool, make_pool_server

    _, png = small_png
    pool = WorkerPool(1, ["--platform=cpu", "--token=sek"])
    pool.start()
    srv = make_pool_server(pool)
    threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"{base}/enhance?{CFG}&w=1,1", png)
        assert ei.value.code == 401
        req = urllib.request.Request(f"{base}/enhance?{CFG}&w=1,1",
                                     data=png)
        req.add_header("Authorization", "Bearer sek")
        with urllib.request.urlopen(req, timeout=300) as r:
            assert r.status == 200
    finally:
        srv.shutdown()
        pool.stop()


def test_pool_delete_bad_content_length(pool_server):
    """Malformed Content-Length on DELETE gets a clean 400 + close (never
    a silent n=0 that would desync the keep-alive stream)."""
    import http.client

    base, pool = pool_server
    host, port = base.removeprefix("http://").split(":")
    conn = http.client.HTTPConnection(host, int(port), timeout=30)
    try:
        conn.putrequest("DELETE", "/filters?name=x")
        conn.putheader("Content-Length", "abc")
        conn.endheaders()
        resp = conn.getresponse()
        assert resp.status == 400
        assert "Content-Length" in json.loads(resp.read())["error"]
    finally:
        conn.close()


def test_pool_worker_env_substitution(tmp_path):
    """--worker-env values template the worker index (the device-pinning
    hook); every worker also gets NLE_POOL_WORKER_INDEX."""
    from nle_tpu.serving.pool import WorkerPool

    pool = WorkerPool(3, [], worker_env={"FAKE_DEVICE": "dev{i}"})
    assert [w.env_extra["FAKE_DEVICE"] for w in pool.workers] == \
        ["dev0", "dev1", "dev2"]


def test_pool_router_fuzz_no_5xx_or_desync(pool_server, small_png):
    """Malformed traffic through the router gets clean 4xx JSON from the
    worker (or the front door), never a 5xx or a connection desync."""
    _, png = small_png
    probes = [
        ("POST", "/enhance", b"not an image"),           # 400 decode
        ("POST", "/enhance?nr=x&nc=2&hx=1&hy=1", png),   # 400 params
        ("POST", "/apply?name=%00%ff&w=1", png),         # 400 unknown name
        ("POST", "/nope", png),                          # 404 route
        ("POST", "/train?nr=2", png),                    # 400 missing params
    ]
    base, pool = pool_server
    for method, path, body in probes:
        req = urllib.request.Request(f"{base}{path}", data=body,
                                     method=method)
        # Every probe is malformed: a 200 would mean garbage input was
        # silently "processed" — as much a regression as a 5xx.
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=120)
        body_out = ei.value.read()
        assert 400 <= ei.value.code < 500, (path, ei.value.code,
                                            body_out[:200])
        assert "error" in json.loads(body_out), body_out[:200]
    # The pool is still healthy afterwards.
    with urllib.request.urlopen(f"{base}/healthz", timeout=30) as r:
        assert json.loads(r.read())["ok"]


def test_pool_worker_restart_recovers_filters(pool_server, small_png):
    """SIGTERM a worker that holds a named filter: the supervisor restarts
    it, warm restart recovers the checkpointed filter from its spill dir,
    and /apply keeps working through the router."""
    import time

    base, pool = pool_server
    img, png = small_png
    name = "sticky-restart"
    with _post(f"{base}/train?name={name}&{CFG}", png) as r:
        r.read()
    with _post(f"{base}/apply?name={name}&w=1,2,2,1", png) as r:
        want = r.read()
    w = pool.pick("/train", f"name={name}")
    old_proc = w.proc
    w.terminate()              # graceful: worker checkpoints to spill dir
    old_proc.wait(timeout=60)
    deadline = time.monotonic() + 120
    while time.monotonic() < deadline:
        if w.alive() and w.proc is not old_proc:
            try:
                w.wait_ready(timeout=5)
                break
            except RuntimeError:
                pass
        time.sleep(0.3)
    assert w.alive() and w.proc is not old_proc, "supervisor did not restart"
    with _post(f"{base}/apply?name={name}&w=1,2,2,1", png) as r:
        got = r.read()
    assert got == want         # recovered filter, identical bytes
    assert pool.workers[w.idx].restarts >= 1


def test_pool_forwards_warmup_to_workers(tmp_path):
    """--warmup passes through to every worker process (each worker
    pre-traces before binding its port); a malformed spec fails the POOL
    boot, not N worker processes later."""
    import sys
    from unittest import mock

    from nle_tpu.serving import pool as P

    with mock.patch.object(sys, "argv",
                           ["nle-serve-pool", "--warmup=bogus"]):
        # Same clean usage-path exit as any other bad argument — a typo'd
        # spec must not traceback past the argv parser.
        assert P.main() == 2

    w = P._Worker(0, 41234, ["--warmup=32,48,3,4,4,3", "--platform=cpu"],
                  str(tmp_path / "spill-0"))
    # The REAL spawn argv (build_argv is what spawn executes) embeds the
    # warmup flag, the port, and the spill dir — a regression dropping
    # argv_extra from the spawn command fails here, not just in prod.
    argv = w.build_argv()
    assert "--warmup=32,48,3,4,4,3" in argv
    # Pass-through worker flags ride the same assembly (--reuse-delta
    # is the serving-side temporal warm-start knob).
    w2 = P._Worker(1, 41235, ["--reuse-delta=4", "--platform=cpu"], None)
    assert "--reuse-delta=4" in w2.build_argv()
    assert "--port=41234" in argv
    assert f"--spill-dir={tmp_path / 'spill-0'}" in argv
    assert argv[1:3] == ["-m", "nle_tpu.serving.http"]


def test_pool_ready_deadlines_scale_with_warmup_specs():
    """The warmed boot deadlines scale per --warmup spec (a multi-spec
    warmup on a cold remote-compile cache can exceed a flat 1800 s), and
    --ready-timeout overrides both (ADVICE r4)."""
    from nle_tpu.serving import pool as P

    plain = P.WorkerPool(1, ["--platform=cpu"])
    assert not plain._warmup
    one = P.WorkerPool(1, ["--warmup=32,48,3,4", "--platform=cpu"])
    assert one._warmup
    assert one._cold_deadline == 1800.0 and one._warm_deadline == 600.0
    three = P.WorkerPool(
        1, ["--warmup=32,48,3,4", "--warmup=64,48,3,4",
            "--warmup=32,64,3,4", "--platform=cpu"])
    assert three._cold_deadline == 3 * 1800.0
    assert three._warm_deadline == 3 * 600.0
    forced = P.WorkerPool(1, ["--warmup=32,48,3,4", "--platform=cpu"],
                          ready_timeout=42.0)
    assert forced._cold_deadline == 42.0 and forced._warm_deadline == 42.0
    # The override applies to PLAIN (non-warmup) boots/restarts too
    # (review r5: it was silently ignored there).
    plain_forced = P.WorkerPool(1, ["--platform=cpu"], ready_timeout=42.0)
    assert plain_forced._plain_deadline == 42.0
    assert P.WorkerPool(1, ["--platform=cpu"])._plain_deadline == 120.0


def test_pool_rejects_bad_ready_timeout():
    import sys
    from unittest import mock

    from nle_tpu.serving import pool as P

    for bad in ("--ready-timeout=abc", "--ready-timeout=-5"):
        with mock.patch.object(sys, "argv", ["nle-serve-pool", bad]):
            assert P.main() == 2
