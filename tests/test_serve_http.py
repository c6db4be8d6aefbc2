"""The HTTP edit service (nle_tpu/serving/http.py, imported here via the
examples/serve_http.py compatibility shim): routing, train-once /
edit-many state, and error surfacing over real sockets. The full golden
PSNR path is `python -m nle_tpu.serving.http --selftest --platform=cpu`
(~30 s, exercised by the verify skill)."""

import json
import os
import sys
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "examples"))

cv2 = pytest.importorskip("cv2")


@pytest.fixture(scope="module")
def server():
    import serve_http

    srv = serve_http.make_server()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _png_bytes(img_bgr):
    ok, buf = cv2.imencode(".png", img_bgr)
    assert ok
    return buf.tobytes()


@pytest.fixture(scope="module")
def small_png():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (40, 50, 3), dtype=np.uint8)
    return img, _png_bytes(img)


def _post(url, data, timeout=300):
    return urllib.request.urlopen(
        urllib.request.Request(url, data=data), timeout=timeout)


def test_healthz(server):
    with urllib.request.urlopen(f"{server}/healthz", timeout=10) as r:
        meta = json.loads(r.read())
    assert meta["ok"] and "platform" in meta


def test_train_then_apply(server, small_png):
    img, png = small_png
    cfg = "nr=4&nc=5&hx=50&hy=30&iters=5&k=4"
    with _post(f"{server}/train?name=t1&{cfg}", png) as r:
        meta = json.loads(r.read())
    assert meta == {"name": "t1", "k": 4, "mode": "enhance",
                    "shape": [40, 50]}
    with _post(f"{server}/apply?name=t1&w=1,2,2,1", png) as r:
        assert r.headers["Content-Type"] == "image/png"
        out = cv2.imdecode(np.frombuffer(r.read(), np.uint8),
                           cv2.IMREAD_COLOR)
    assert out.shape == img.shape
    # one-shot /enhance with the same params gives the identical edit
    with _post(f"{server}/enhance?{cfg}&w=1,2,2,1", png) as r:
        out2 = cv2.imdecode(np.frombuffer(r.read(), np.uint8),
                            cv2.IMREAD_COLOR)
    np.testing.assert_array_equal(out, out2)


def test_denoise_roundtrip(server, small_png):
    img, png = small_png
    with _post(f"{server}/denoise?nr=4&nc=5&hx=50&hy=30&iters=3&k=3"
               "&shrink=2", png) as r:
        out = cv2.imdecode(np.frombuffer(r.read(), np.uint8),
                           cv2.IMREAD_COLOR)
    assert out.shape == img.shape


def test_errors_are_http_400(server, small_png):
    _, png = small_png
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{server}/apply?name=missing&w=1,1,1,1", png)
    assert ei.value.code == 400
    assert "missing" in json.loads(ei.value.read())["error"]
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{server}/enhance?nr=4&nc=5&hx=50&hy=30", b"not an image")
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{server}/nope", png)
    assert ei.value.code == 404


def test_bad_content_length_is_http_400(server):
    """Non-numeric or negative Content-Length gets a clean 400 (never an
    unhandled int() crash, never a blocking rfile.read(-1))."""
    import http.client

    host, port = server.removeprefix("http://").split(":")
    for bad in ("abc", "-5"):
        conn = http.client.HTTPConnection(host, int(port), timeout=10)
        try:
            conn.putrequest("POST", "/enhance?nr=2&nc=2&hx=50&hy=30")
            conn.putheader("Content-Length", bad)
            conn.endheaders()
            resp = conn.getresponse()
            assert resp.status == 400
            assert "Content-Length" in json.loads(resp.read())["error"]
        finally:
            conn.close()


def test_concurrent_enhance_coalesces(server, small_png):
    """Concurrent same-shape /enhance requests ride one pipelined batch
    (nle_tpu/serving/http.py _CoalescingTrainer) and each equals the
    sequential result."""
    img, png = small_png
    cfg = "nr=4&nc=5&hx=50&hy=30&iters=5&k=4&w=1,2,2,1"
    with _post(f"{server}/enhance?{cfg}", png) as r:
        want = r.read()
    results = [None] * 3
    def hit(i):
        with _post(f"{server}/enhance?{cfg}", png) as r:
            results[i] = r.read()
    threads = [threading.Thread(target=hit, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    for got in results:
        assert got == want


def test_metrics_endpoint(server, small_png):
    """/metrics counts trains/edits and reports per-endpoint latency."""
    _, png = small_png
    with _post(f"{server}/enhance?nr=4&nc=5&hx=50&hy=30&iters=3&k=3"
               "&w=1,1,1,1", png) as r:
        r.read()
    with urllib.request.urlopen(f"{server}/metrics", timeout=10) as r:
        m = json.loads(r.read())
    assert m["trains"] >= 1 and m["edits"] >= 1
    e = m["endpoints"]["/enhance"]
    assert e["count"] >= 1 and e["last_sec"] > 0 and "mean_sec" in e
    # Latency quantiles over the sliding sample window.
    assert 0 < e["p50_sec"] <= e["p99_sec"]
    assert "_lat" not in e   # the raw reservoir never leaks into the JSON
    assert "resident" in m["filters"]
    # Actual accelerator memory: always a dict; per-device rows only where
    # the PJRT backend exposes memory_stats (CPU typically reports {}).
    assert isinstance(m["device_memory"], dict)
    for row in m["device_memory"].values():
        assert row.get("bytes_in_use", 0) >= 0


def test_metrics_quantiles_window():
    """P50/P99 come from a nearest-rank sliding window: skewed tails show
    in P99 but not P50, and the ring buffer stays bounded."""
    from nle_tpu.serving.http import _Metrics

    m = _Metrics()
    for i in range(2000):
        m.record("/x", 0.001 if i % 100 else 5.0, True)
    snap = m.snapshot()["endpoints"]["/x"]
    assert snap["p50_sec"] == 0.001
    assert snap["p99_sec"] == 5.0
    assert len(m.endpoints["/x"]["_lat"]) <= m._LAT_WINDOW


@pytest.fixture()
def locked_server(tmp_path):
    import serve_http

    srv = serve_http.make_server(
        token="sekrit", max_bytes=1 << 20, max_filters=2,
        spill_dir=str(tmp_path / "spill"))
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{srv.server_address[1]}"
    srv.shutdown()


def _post_auth(url, data, token=None, timeout=300):
    req = urllib.request.Request(url, data=data)
    if token:
        req.add_header("Authorization", f"Bearer {token}")
    return urllib.request.urlopen(req, timeout=timeout)


def test_auth_required(locked_server, small_png):
    """POSTs without (or with a wrong) bearer token get 401; probes stay
    open."""
    _, png = small_png
    cfg = "nr=4&nc=5&hx=50&hy=30&iters=3&k=3"
    for tok in (None, "wrong"):
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post_auth(f"{locked_server}/train?name=a&{cfg}", png, tok)
        assert ei.value.code == 401
    with urllib.request.urlopen(f"{locked_server}/healthz", timeout=10) as r:
        assert json.loads(r.read())["ok"]
    with _post_auth(f"{locked_server}/train?name=a&{cfg}", png,
                    "sekrit") as r:
        assert json.loads(r.read())["k"] == 3
    with urllib.request.urlopen(f"{locked_server}/metrics", timeout=10) as r:
        assert json.loads(r.read())["rejected"] >= 2


def test_request_size_limit(locked_server, small_png):
    """Bodies above max_bytes are refused with 413 before any decoding."""
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post_auth(f"{locked_server}/enhance?nr=2&nc=2&hx=50&hy=30",
                   b"x" * (2 << 20), "sekrit")
    assert ei.value.code == 413


def test_lru_eviction_spills_and_reloads(locked_server, small_png):
    """max_filters=2: training a third filter spills the LRU one to disk;
    a later /apply for it reloads transparently (same bytes)."""
    _, png = small_png
    cfg = "nr=4&nc=5&hx=50&hy=30&iters=3&k=3"
    for name in ("f1", "f2"):
        with _post_auth(f"{locked_server}/train?name={name}&{cfg}", png,
                        "sekrit") as r:
            r.read()
    with _post_auth(f"{locked_server}/apply?name=f1&w=1,2,2,1", png,
                    "sekrit") as r:
        want = r.read()
    with _post_auth(f"{locked_server}/train?name=f3&{cfg}", png,
                    "sekrit") as r:
        r.read()
    with urllib.request.urlopen(f"{locked_server}/metrics", timeout=10) as r:
        m = json.loads(r.read())["filters"]
    assert (m["resident"], m["spilled"]) == (2, 1)
    assert m["evictions"] >= 1 and m["resident_bytes"] > 0
    # All three names remain applicable; f2 (the spilled LRU victim)
    # reloads from disk — same filter, same bytes (all three were trained
    # on identical input/params).
    with urllib.request.urlopen(f"{locked_server}/healthz", timeout=10) as r:
        assert json.loads(r.read())["filters"] == ["f1", "f2", "f3"]
    with _post_auth(f"{locked_server}/apply?name=f2&w=1,2,2,1", png,
                    "sekrit") as r:
        got = r.read()
    assert got == want


def test_factored_query_param(server, small_png):
    """factored=1 trains a V-free filter; /train + /apply keep and reuse
    it like any other."""
    img, png = small_png
    cfg = "nr=4&nc=5&hx=50&hy=30&iters=5&k=4&factored=1"
    with _post(f"{server}/train?name=vfree&{cfg}", png) as r:
        meta = json.loads(r.read())
    assert meta["k"] == 4
    with _post(f"{server}/apply?name=vfree&w=1,2,2,1", png) as r:
        out = cv2.imdecode(np.frombuffer(r.read(), np.uint8),
                           cv2.IMREAD_COLOR)
    assert out.shape == img.shape
    with _post(f"{server}/enhance?{cfg}&w=1,2,2,1", png) as r:
        out2 = cv2.imdecode(np.frombuffer(r.read(), np.uint8),
                            cv2.IMREAD_COLOR)
    np.testing.assert_array_equal(out2, out)


def test_lru_clean_eviction_skips_resave(tmp_path, small_png):
    """A reloaded-and-unmodified filter must NOT be re-serialized when it
    is evicted again (round-robin /apply over max_filters+1 names would
    otherwise pay a device fetch + npz compress per request)."""
    import serve_http

    store = serve_http._FilterStore(max_filters=1,
                                    spill_dir=str(tmp_path / "s"))

    class FakeTrained:
        def __init__(self):
            self.saves = 0

        def save(self, path):
            self.saves += 1
            open(path, "wb").write(b"x")

    class FakeFilter:
        def __init__(self):
            self.trained = FakeTrained()

    f1, f2 = FakeFilter(), FakeFilter()
    store.put("a", f1)
    store.put("b", f2)          # evicts a -> 1 save
    assert f1.trained.saves == 1
    # Reload "a" without modifying it (monkey: load_filter would hit the
    # real loader — intercept by injecting the resident entry the way a
    # reload leaves it: present AND on disk).
    store._resident["a"] = f1
    store._on_disk.add("a")
    store._spilled.discard("a")
    with store._lock:
        victims = store._pick_victims_locked()  # over capacity: evicts LRU
    store._save_victims(victims)
    # Neither filter was re-saved for a clean eviction of "a".
    assert f1.trained.saves == 1
    store.put("a", f1)          # fresh training invalidates the checkpoint
    store.put("c", FakeFilter())
    assert f1.trained.saves == 2


def test_apply_denoise_op(server, small_png):
    """/apply?op=denoise runs the GLIDE application of a kept filter."""
    img, png = small_png
    cfg = "nr=4&nc=5&hx=50&hy=30&iters=5&k=4"
    with _post(f"{server}/train?name=dn&{cfg}", png) as r:
        r.read()
    with _post(f"{server}/apply?name=dn&op=denoise&shrink=2", png) as r:
        out = cv2.imdecode(np.frombuffer(r.read(), np.uint8),
                           cv2.IMREAD_COLOR)
    assert out.shape == img.shape
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{server}/apply?name=dn&op=sharpen", png)
    assert ei.value.code == 400


def test_train_mode_denoise_matches_oneshot(server, small_png):
    """/train?mode=denoise trains on the bilateral-prefiltered L (the
    reference's trainForDenoise), so the kept filter + /apply?op=denoise
    reproduces the one-shot /denoise byte-for-byte; an enhancement-trained
    filter does NOT (it trained on raw L)."""
    img, png = small_png
    cfg = "nr=4&nc=5&hx=50&hy=30&iters=5&k=4"
    with _post(f"{server}/train?name=dnm&mode=denoise&{cfg}", png) as r:
        meta = json.loads(r.read())
    assert meta["mode"] == "denoise"
    with _post(f"{server}/apply?name=dnm&op=denoise&shrink=2", png) as r:
        out = cv2.imdecode(np.frombuffer(r.read(), np.uint8),
                           cv2.IMREAD_COLOR)
    with _post(f"{server}/denoise?{cfg}&shrink=2", png) as r:
        oneshot = cv2.imdecode(np.frombuffer(r.read(), np.uint8),
                               cv2.IMREAD_COLOR)
    np.testing.assert_array_equal(out, oneshot)
    # raw-L training (the default mode) gives a different filter
    with _post(f"{server}/train?name=dnm2&{cfg}", png) as r:
        r.read()
    with _post(f"{server}/apply?name=dnm2&op=denoise&shrink=2", png) as r:
        out_raw = cv2.imdecode(np.frombuffer(r.read(), np.uint8),
                               cv2.IMREAD_COLOR)
    assert not np.array_equal(out_raw, oneshot)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{server}/train?name=bad&mode=sharpen&{cfg}", png)
    assert ei.value.code == 400


def test_access_log_lines(tmp_path, small_png):
    """One JSON line per request with status/latency/byte counts."""
    import io

    import serve_http

    buf = io.StringIO()
    srv = serve_http.make_server(access_log=buf)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        _, png = small_png
        with _post(f"{base}/enhance?nr=4&nc=5&hx=50&hy=30&iters=3&k=3"
                   "&w=1,1,1,1", png) as r:
            r.read()
        with pytest.raises(urllib.error.HTTPError):
            _post(f"{base}/nope", png)
    finally:
        srv.shutdown()
    lines = [json.loads(x) for x in buf.getvalue().splitlines()]
    assert len(lines) == 2
    # Line ORDER across two connections is racy (the first handler thread
    # can lose the GIL between writing its response and logging it, while
    # the second connection's handler logs first) — match lines by path.
    by_path = {x["path"].split("?")[0]: x for x in lines}
    ok = by_path["/enhance"]
    assert (ok["status"] == 200 and ok["ms"] > 0
            and ok["bytes_in"] == len(png)
            and ok["bytes_out"] > 0 and ok["method"] == "POST")
    assert by_path["/nope"]["status"] == 404


def test_coalescer_midbatch_failure_releases_trained(monkeypatch):
    """If the pipelined batch dies after yielding some filters, the
    already-trained requests keep their filters and only the untrained
    remainder get the error; every waiter is released and the worker can
    serve a fresh batch afterwards (serving/http.py _drain)."""
    import nle_tpu.models.batch as batch_mod
    from nle_tpu.serving.http import _CoalescingTrainer

    calls = {"n": 0}

    def fake_iter(channels, *params, **kwargs):
        calls["n"] += 1
        if calls["n"] == 1:
            yield "filter-0"
            raise RuntimeError("chip fell over")
        for i in range(len(channels)):
            yield f"ok-{i}"

    monkeypatch.setattr(batch_mod, "train_filters_iter", fake_iter)
    # _drain does a late `from nle_tpu.models.batch import ...`, so the
    # module attribute patch above is what it sees.
    trainer = _CoalescingTrainer(threading.Lock())
    img = np.zeros((8, 9, 3), np.uint8)
    params = (2, 2, 50.0, 30.0, 2, 2)

    results = [None] * 3
    def hit(i):
        try:
            # train_enhancement returns (filter, lab); the filter is the
            # part the batch semantics are about.
            results[i] = trainer.train_enhancement(img, params)[0]
        except RuntimeError as e:
            results[i] = e
    threads = [threading.Thread(target=hit, args=(i,)) for i in range(3)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=30)
    assert not any(t.is_alive() for t in threads), "a waiter was stranded"
    got_filters = [r for r in results if r == "filter-0"]
    got_errors = [r for r in results if isinstance(r, RuntimeError)]
    # At least the first queued request trained; the batch tail errored.
    # (Thread arrival order decides how many coalesced into batch 1 —
    # later arrivals may land in a SECOND, succeeding batch.)
    assert got_filters or any(isinstance(r, str) and r.startswith("ok-")
                              for r in results)
    assert len(got_filters) + len(got_errors) + sum(
        1 for r in results if isinstance(r, str) and r.startswith("ok-")
    ) == 3
    # The worker must still serve a fresh request after the failure.
    assert trainer.train_enhancement(img, params)[0] == "ok-0"


def test_apply_validates_before_decode(server):
    """Cheap checks (op, name) precede the image decode: a bogus op with an
    undecodable body must surface the op error, proving no decode ran."""
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{server}/apply?name=whatever&op=sharpen", b"notanimage")
    assert ei.value.code == 400
    assert "unknown op" in ei.value.read().decode()


class _FakeTrained:
    def __init__(self, fail):
        self.fail = fail
        self.saved = []

    def save(self, path):
        if self.fail:
            raise OSError("disk full")
        self.saved.append(path)
        with open(path, "wb") as f:
            f.write(b"ckpt")


class _FakeFilter:
    def __init__(self, fail=False):
        self.trained = _FakeTrained(fail)


def test_spill_save_failure_keeps_filter_resident(tmp_path):
    """A failed eviction save (disk full, ...) must neither raise into the
    unrelated request that triggered it nor lose the filter: the victim is
    reinstated (temporary capacity overflow) and stays servable."""
    from nle_tpu.serving.http import _FilterStore

    store = _FilterStore(max_filters=1, spill_dir=str(tmp_path))
    a, b = _FakeFilter(fail=True), _FakeFilter()
    store.put("a", a)
    store.put("b", b)          # evicts a; its save fails; must not raise
    assert store.get("a") is a  # still the live object, no reload
    assert store.get("b") is b
    assert "a" not in store._on_disk
    assert "a" not in store._saving


def test_stale_spill_save_does_not_mark_on_disk(tmp_path):
    """A re-train racing a slow eviction save: the save of the OLD filter
    must not mark the name as checkpointed (a later clean eviction of the
    NEW filter would skip its save and /apply would reload STALE state)."""
    from nle_tpu.serving.http import _FilterStore

    store = _FilterStore(max_filters=1, spill_dir=str(tmp_path))
    old, new = _FakeFilter(), _FakeFilter()
    store.put("x", old)
    # Freeze the moment _pick_victims_locked chose `old` but the
    # out-of-lock save has not run yet:
    with store._lock:
        store._resident.pop("x")
        store._saving["x"] = old
        store._spilled.add("x")
    victims = [("x", old)]
    store.put("x", new)           # re-train invalidates the pending save
    store._save_victims(victims)  # the slow save completes only now
    assert "x" not in store._on_disk
    assert old.trained.saved == []   # skipped outright, not just unmarked
    assert store.get("x") is new


def test_stalled_spill_save_cannot_overwrite_newer_checkpoint(tmp_path):
    """The device lock is not FIFO: an old eviction save that passed its
    pre-check and then WAITED on the device lock must re-validate inside
    the lock — while it waited, a re-train + re-eviction may have queued
    and completed a save of the NEWER filter, and writing now would
    overwrite that fresh checkpoint while _on_disk still marks it valid
    (silent stale serves on the next reload)."""
    from nle_tpu.serving.http import _FilterStore

    class _HookLock:
        """Context manager whose next __enter__ runs a one-shot hook —
        deterministically interleaving 'the world moved on' into the
        window between the pre-check and the lock acquisition."""

        def __init__(self):
            self.hook = None

        def __enter__(self):
            hook, self.hook = self.hook, None
            if hook:
                hook()

        def __exit__(self, *a):
            return False

    lock = _HookLock()
    store = _FilterStore(max_filters=1, spill_dir=str(tmp_path),
                         device_lock=lock)
    old, new, other = _FakeFilter(), _FakeFilter(), _FakeFilter()
    store.put("x", old)

    def world_moves_on():
        # While the old save waits for the device lock: x is re-trained
        # (invalidating the pending save) and then evicted again, and the
        # NEW filter's save completes first.
        store.put("x", new)       # evicts 'other'... nothing else resident
        store.put("z", other)     # evicts x -> queues + completes new save

    lock.hook = world_moves_on
    store.put("y", _FakeFilter())  # evicts x (old) -> the stalled save

    path = store._path("x")
    # Saves write to a tmp name then os.replace onto path (atomic vs
    # concurrent reloads): exactly one write, by the NEW filter.
    assert len(new.trained.saved) == 1
    assert new.trained.saved[0].startswith(path + ".tmp-")
    assert old.trained.saved == []           # never overwritten by old
    assert "x" in store._on_disk
    # x's live object is gone (cleanly evicted); the next get() would
    # reload from the checkpoint — which must be the NEW one.
    assert "x" in store._spilled and "x" not in store._saving
    with open(path, "rb") as fh:
        assert fh.read() == b"ckpt"


def test_filter_store_concurrent_stress(tmp_path):
    """Hammer the store from many threads (put/get/healthz-names mix over a
    small namespace with capacity 2, so evictions + spills + reloads churn
    constantly). Guards the locking protocol: no exception may escape, and
    every name must end resident, mid-save, or reloadable-from-disk."""
    import threading

    import jax.numpy as jnp

    from nle_tpu.models.filter import NLEFilter, TrainedFilter
    from nle_tpu.serving.http import _FilterStore

    def tiny_filter(tag: float):
        # Real (tiny) TrainedFilter so spill saves write genuine npz
        # checkpoints and reloads round-trip through load_filter.
        return NLEFilter(trained=TrainedFilter(
            eigvecs=jnp.full((6, 2), tag, jnp.float32),
            eigvals=jnp.ones((2,), jnp.float32), nrows=2, ncols=3))

    device_lock = threading.Lock()
    store = _FilterStore(max_filters=2, spill_dir=str(tmp_path),
                         device_lock=device_lock)
    names = [f"n{i}" for i in range(5)]
    errors = []

    def worker(seed):
        rng = np.random.default_rng(seed)
        try:
            for it in range(150):
                name = names[int(rng.integers(len(names)))]
                op = rng.integers(4)   # put / get / names+stats / delete
                if op == 0:
                    store.put(name, tiny_filter(float(seed * 1000 + it)))
                elif op == 1:
                    try:
                        store.get(name)
                    except KeyError:
                        pass  # never trained yet — legitimate
                elif op == 3:
                    try:
                        store.delete(name)
                    except KeyError:
                        pass  # unknown / already deleted — legitimate
                else:
                    store.names()
                    st = store.stats()
                    assert st["resident_bytes"] >= 0
        except Exception as e:  # pragma: no cover - failure path
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(s,)) for s in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(60)
    assert not errors, errors
    # Every previously-put name is still accounted for somewhere.
    listed = set(store.names())
    for name in listed:
        assert (name in store._resident or name in store._saving
                or os.path.exists(store._path(name)))


def test_http_fuzz_malformed_requests_never_500(server, small_png):
    """Randomized malformed-request hammer over the real socket: arbitrary
    param/body combinations must map to the input-validation classes
    (400/404), never to a 500 or a dead server. Valid-image bodies use a
    tiny train config so the occasional well-formed draw stays cheap."""
    _, png = small_png
    tiny = np.random.default_rng(1).integers(0, 256, (8, 9, 3), np.uint8)
    tiny_png = _png_bytes(tiny)
    rng = np.random.default_rng(7)
    paths = ["/enhance", "/denoise", "/train", "/apply", "/nope"]
    params = ["", "nr=2&nc=2&hx=50&hy=30&iters=2&k=2", "nr=abc&nc=2",
              "nr=2", "w=1,2,x", "w=", "name=%00weird", "op=explode",
              "shrink=-1", "sigma_color=0", "factored=maybe", "k=-3",
              "nr=0&nc=0&hx=50&hy=30", "nr=99&nc=99&hx=50&hy=30"]
    bodies = [b"", b"garbage", tiny_png, png[:40]]
    seen_500 = []
    for _ in range(60):
        path = paths[int(rng.integers(len(paths)))]
        q = params[int(rng.integers(len(params)))]
        body = bodies[int(rng.integers(len(bodies)))]
        url = f"{server}{path}" + (f"?{q}" if q else "")
        try:
            with _post(url, body, timeout=120) as r:
                assert r.status == 200
        except urllib.error.HTTPError as e:
            if e.code >= 500:
                seen_500.append((url, len(body), e.code, e.read()[:200]))
            e.read()
    assert not seen_500, seen_500
    # The server survived: a normal request still succeeds.
    with _post(f"{server}/enhance?nr=2&nc=2&hx=50&hy=30&iters=2&k=2"
               "&w=1,1", tiny_png) as r:
        assert r.status == 200


def test_delete_filter(server, small_png):
    """DELETE /filters removes a kept filter from memory AND disk; a later
    /apply for the name is a clean 400, a second DELETE a 404."""
    _, png = small_png
    cfg = "nr=4&nc=5&hx=50&hy=30&iters=3&k=3"
    with _post(f"{server}/train?name=zap&{cfg}", png) as r:
        r.read()

    def _delete(name):
        return urllib.request.urlopen(urllib.request.Request(
            f"{server}/filters?name={name}", method="DELETE"), timeout=30)

    with _delete("zap") as r:
        assert json.loads(r.read())["deleted"] == "zap"
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{server}/apply?name=zap&w=1,1", png)
    assert ei.value.code == 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _delete("zap")
    assert ei.value.code == 404
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(urllib.request.Request(
            f"{server}/nope?name=zap", method="DELETE"), timeout=30)
    assert ei.value.code == 404
    # DELETE traffic is metered like the POST endpoints.
    with urllib.request.urlopen(f"{server}/metrics", timeout=10) as r:
        eps = json.loads(r.read())["endpoints"]
    assert eps["/filters"]["count"] >= 2 and eps["/filters"]["errors"] >= 1


def test_delete_requires_auth(locked_server, small_png):
    _, png = small_png
    cfg = "nr=4&nc=5&hx=50&hy=30&iters=3&k=3"
    with _post_auth(f"{locked_server}/train?name=d&{cfg}", png,
                    "sekrit") as r:
        r.read()
    req = urllib.request.Request(f"{locked_server}/filters?name=d",
                                 method="DELETE")
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30)
    assert ei.value.code == 401
    req.add_header("Authorization", "Bearer sekrit")
    with urllib.request.urlopen(req, timeout=30) as r:
        assert json.loads(r.read())["deleted"] == "d"


def test_delete_removes_spilled_checkpoint(tmp_path):
    """Deleting a SPILLED filter unlinks its checkpoint + sidecar, so a
    warm restart does not resurrect it."""
    from nle_tpu.serving.http import _FilterStore

    store = _FilterStore(max_filters=1, spill_dir=str(tmp_path))
    store.put("a", _FakeFilter())
    store.put("b", _FakeFilter())   # spills "a" to disk
    store.delete("a")
    assert store.names() == ["b"]
    assert not list(tmp_path.glob("*"))  # a's npz + sidecar both gone
    assert _FilterStore(max_filters=1,
                        spill_dir=str(tmp_path)).names() == []


class _SizedTrained(_FakeTrained):
    def __init__(self, nb):
        super().__init__(False)
        self._nb = nb

    def nbytes(self):
        return self._nb


class _SizedFilter:
    def __init__(self, nb):
        self.trained = _SizedTrained(nb)


def test_byte_budget_evicts_by_bytes(tmp_path):
    """Residency is bounded by accounted BYTES, not just count: 3 large
    filters blow a budget that holds 25 small ones, and eviction keeps the
    store under budget while every name stays servable via spill."""
    from nle_tpu.serving.http import _FilterStore

    budget = 100 << 20
    small, large = 4 << 20, 40 << 20    # ~0.1 MP k=10 vs multi-MP filters
    store = _FilterStore(max_filters=100, spill_dir=str(tmp_path),
                         max_bytes=budget)
    sizes = {}
    for i in range(30):
        nb = large if i % 3 == 0 else small
        sizes[f"f{i}"] = nb
        store.put(f"f{i}", _SizedFilter(nb))
        st = store.stats()
        assert st["resident_bytes"] <= budget, (i, st)
    st = store.stats()
    assert st["evictions"] > 0
    assert st["resident"] + st["spilled"] == 30   # nothing lost
    assert sorted(store.names()) == sorted(sizes)
    # Count cap still applies as a secondary bound.
    store2 = _FilterStore(max_filters=2, spill_dir=str(tmp_path / "s2"),
                          max_bytes=budget)
    for i in range(5):
        store2.put(f"g{i}", _SizedFilter(small))
    assert store2.stats()["resident"] == 2


def test_byte_budget_all_names_stay_servable(tmp_path, monkeypatch):
    """After byte-budget evictions, get() on an evicted name reloads it
    (spill makes the budget bound capacity, not the namespace)."""
    from nle_tpu.models import filter as filter_mod
    from nle_tpu.serving.http import _FilterStore

    store = _FilterStore(max_filters=100, spill_dir=str(tmp_path),
                         max_bytes=10 << 20)
    for i in range(4):
        store.put(f"f{i}", _SizedFilter(6 << 20))   # each pair over budget
    assert store.stats()["resident"] == 1
    monkeypatch.setattr(filter_mod, "load_filter_host", lambda path: {})
    monkeypatch.setattr(
        filter_mod, "filter_from_host",
        lambda arrays: _SizedTrained(6 << 20))
    for i in range(4):
        assert store.get(f"f{i}") is not None
        # Reloads re-enter the byte accounting and re-evict.
        assert store.stats()["resident_bytes"] <= 10 << 20


def test_metrics_report_resident_bytes(server, small_png):
    """Real trained filters report nonzero accounted bytes in /metrics."""
    _, png = small_png
    cfg = "nr=4&nc=5&hx=50&hy=30&iters=3&k=3"
    with _post(f"{server}/train?name=bytes1&{cfg}", png) as r:
        r.read()
    with urllib.request.urlopen(f"{server}/metrics", timeout=10) as r:
        filters = json.loads(r.read())["filters"]
    # 40x50 px, k=3: eigvecs 2000*3*4 B + perm 2000*8 B + caches — small
    # but decidedly nonzero and below 1 MB.
    assert 0 < filters["resident_bytes"] < (1 << 20) * filters["resident"]
    assert "evictions" in filters and "max_bytes" in filters


def test_trained_filter_nbytes_accounting():
    """nbytes() covers the eigvecs + perm + transfer cache (TrainedFilter)
    and the factored pieces incl. the lazy _dev uploads (FactoredFilter)."""
    import jax.numpy as jnp

    from nle_tpu.models.factored import FactoredFilter
    from nle_tpu.models.filter import TrainedFilter

    n, k, p = 1000, 5, 16
    t = TrainedFilter(
        eigvecs=jnp.zeros((n, k), jnp.float32),
        eigvals=jnp.zeros((k,), jnp.float32),
        nrows=25, ncols=40, perm=np.arange(n))
    base = n * k * 4 + k * 4 + n * 8
    assert t.nbytes() == base
    t.y_cache = (np.zeros(n, np.uint8), jnp.zeros(n, jnp.uint8))
    assert t.nbytes() == base + 2 * n

    f = FactoredFilter(
        y_train=np.zeros(n, np.uint8), c=jnp.zeros(n, jnp.float32),
        v_head=jnp.zeros((p, k), jnp.float32),
        w=jnp.zeros((p, k), jnp.float32),
        eigvals=jnp.zeros((k,), jnp.float32), nrows=25, ncols=40,
        hx=10.0, hy=10.0, perm=np.arange(n))
    expect = n + n * 8 + n * 4 + 2 * p * k * 4 + k * 4 + 3 * n * 4
    assert f.nbytes() == expect


def test_delete_without_spill_dir_stays_dirless(small_png):
    """delete() on a store that never spilled must not lazily mkdtemp a
    spill directory (which would also flip the shutdown sweep from instant
    exit to a checkpoint pass)."""
    from nle_tpu.serving.http import _FilterStore

    store = _FilterStore(max_filters=8, spill_dir=None)
    store.put("a", _FakeFilter())
    store.delete("a")
    assert store._spill_dir is None
    assert store.names() == []


def test_delete_racing_retrain_keeps_new_checkpoint(tmp_path):
    """A /train of the same name that slips in while delete() waits for the
    device lock must win: delete re-checks for re-creation before unlinking,
    so the NEW filter's checkpoint survives (previously it was unlinked and
    the re-trained filter was permanently lost)."""
    import threading

    from nle_tpu.serving.http import _FilterStore

    fired = []

    class HookLock:
        """Device lock that runs a one-shot hook when delete() tries to
        acquire it — emulating the non-FIFO window where a re-train +
        checkpoint write slips in ahead of the waiting delete."""

        def __init__(self):
            self._l = threading.RLock()
            self.hook = None

        def __enter__(self):
            if self.hook is not None and not fired:
                fired.append(1)
                self.hook()
            self._l.acquire()
            return self

        def __exit__(self, *a):
            self._l.release()

        # _FilterStore treats the device lock as a context manager only.

    lock = HookLock()
    store = _FilterStore(max_filters=8, spill_dir=str(tmp_path),
                         device_lock=lock)
    old, new = _FakeFilter(), _FakeFilter()
    store.put("x", old)
    store.checkpoint_all()          # old checkpoint on disk

    def retrain():
        store.put("x", new)
        store.checkpoint_all()      # new checkpoint written before unlink

    lock.hook = retrain
    store.delete("x")               # hook fires while waiting for the lock
    assert fired
    # The re-created filter and its checkpoint must both survive.
    assert store.get("x") is new
    npz = tmp_path / (store._stem("x") + ".npz")
    assert npz.exists()
    assert _FilterStore(max_filters=8,
                        spill_dir=str(tmp_path)).names() == ["x"]


def test_reload_racing_delete_raises_keyerror(tmp_path, monkeypatch):
    """A cold reload whose checkpoint is unlinked by a concurrent DELETE
    between the spilled-check and np.load must surface as KeyError (HTTP
    400 unknown-name), not FileNotFoundError (500)."""
    from nle_tpu.models import filter as filter_mod
    from nle_tpu.serving.http import _FilterStore

    store = _FilterStore(max_filters=1, spill_dir=str(tmp_path))
    store.put("a", _FakeFilter())
    store.put("b", _FakeFilter())   # spills "a" to disk
    real_load = filter_mod.load_filter_host

    def load_after_delete(path):
        store.delete("a")           # unlinks the npz first
        return real_load(path)

    monkeypatch.setattr(filter_mod, "load_filter_host", load_after_delete)
    with pytest.raises(KeyError):
        store.get("a")


def test_delete_with_body_keeps_connection_in_sync(server, small_png):
    """A DELETE carrying a body on a keep-alive connection must not desync
    the next request on that connection (body bytes must be drained, or the
    connection closed — never parsed as the next request line)."""
    import http.client

    _, png = small_png
    cfg = "nr=4&nc=5&hx=50&hy=30&iters=3&k=3"
    with _post(f"{server}/train?name=db&{cfg}", png) as r:
        r.read()
    host, port = server.removeprefix("http://").split(":")
    conn = http.client.HTTPConnection(host, int(port), timeout=30)
    try:
        body = b"GET /healthz HTTP/1.1\r\n\r\n" * 4  # hostile: looks like a request
        conn.request("DELETE", "/filters?name=db", body=body)
        resp = conn.getresponse()
        assert resp.status == 200
        assert json.loads(resp.read())["deleted"] == "db"
        # Second request on the same connection parses cleanly (the server
        # may have closed the connection after draining — also in-sync).
        try:
            conn.request("GET", "/healthz")
            resp2 = conn.getresponse()
            assert resp2.status == 200
            assert json.loads(resp2.read())["ok"]
        except (http.client.HTTPException, OSError):
            pass  # clean close is an acceptable way to stay in sync
    finally:
        conn.close()


def test_checkpoint_all_then_warm_restart(tmp_path):
    """Graceful shutdown writes every RESIDENT filter (not just LRU
    evictions); a restarted store on the same dir recovers the full
    namespace. Already-current checkpoints are skipped on a second call."""
    from nle_tpu.serving.http import _FilterStore

    store = _FilterStore(max_filters=8, spill_dir=str(tmp_path))
    store.put("a", _FakeFilter())
    store.put("b", _FakeFilter())
    assert store.checkpoint_all() == 2
    assert store.checkpoint_all() == 0   # nothing stale to write
    store2 = _FilterStore(max_filters=8, spill_dir=str(tmp_path))
    assert store2.names() == ["a", "b"]


def test_checkpoint_all_covers_inflight_eviction(tmp_path):
    """An evictee whose background spill save has not completed (_saving)
    is still in the namespace; graceful shutdown must checkpoint it too —
    daemon save threads die with the process mid-write."""
    from nle_tpu.serving.http import _FilterStore

    store = _FilterStore(max_filters=8, spill_dir=str(tmp_path))
    f = _FakeFilter()
    # The state _pick_victims_locked leaves while the save is in flight.
    store._saving["x"] = f
    store._spilled.add("x")
    assert store.checkpoint_all() == 1
    assert _FilterStore(max_filters=8,
                        spill_dir=str(tmp_path)).names() == ["x"]


def test_spill_dir_warm_restart(tmp_path, monkeypatch):
    """Filters spilled by a previous server process are recovered when a
    new store points at the same --spill-dir: the URL-hostile name comes
    back via the .name sidecar and get() reloads the checkpoint. Filters
    that were resident-only (never checkpointed) are NOT advertised."""
    import serve_http
    from nle_tpu.models import filter as filter_mod

    store = serve_http._FilterStore(max_filters=1, spill_dir=str(tmp_path))
    a, b = _FakeFilter(), _FakeFilter()
    store.put("scene/1?x=%00", a)   # URL-hostile name
    store.put("b", b)               # evicts + spills the first
    assert "scene/1?x=%00" in store.names()

    # "Restart": a fresh store over the same directory.
    store2 = serve_http._FilterStore(max_filters=2, spill_dir=str(tmp_path))
    assert store2.names() == ["scene/1?x=%00"]
    sentinel = object()
    monkeypatch.setattr(filter_mod, "load_filter_host",
                        lambda path: ("host", path))
    monkeypatch.setattr(filter_mod, "filter_from_host", lambda t: sentinel)
    assert store2.get("scene/1?x=%00").trained is sentinel
    with pytest.raises(KeyError):
        store2.get("b")             # resident-only in the old process

    # Foreign/truncated files in the spill dir must be ignored — including
    # non-UTF-8 sidecars (truncated mid multi-byte char): one bad file must
    # never prevent the server from booting.
    (tmp_path / ("f" * 40 + ".name")).write_text("mismatched")
    (tmp_path / "junk.name").write_text("x")
    (tmp_path / ("a" * 40 + ".name")).write_bytes(b"\xff\xfe\xfd")
    store3 = serve_http._FilterStore(max_filters=2, spill_dir=str(tmp_path))
    assert store3.names() == ["scene/1?x=%00"]


def test_reload_racing_retrain_returns_fresh_filter(tmp_path, monkeypatch):
    """A cold reload that straddles a re-train (+ re-eviction) must not
    install the pre-re-train checkpoint bytes as authoritative: the
    generation check detects the interleaving and retries the load."""
    import serve_http
    from nle_tpu.models import filter as filter_mod

    store = serve_http._FilterStore(max_filters=1, spill_dir=str(tmp_path))
    a0, a1, b1, b2 = (_FakeFilter() for _ in range(4))
    store.put("a", a0)
    store.put("b", b1)            # evicts a0 -> checkpoint C0 on disk

    gate = threading.Event()      # blocks the reload mid-np.load
    loads = []

    def fake_load(path):
        loads.append(path)
        if len(loads) == 1:
            gate.wait(10)         # the world moves on while we "read C0"
            return a0.trained     # stale bytes
        return a1.trained         # fresh checkpoint C1

    # The store splits loading into load_filter_host (disk, patched to
    # block — that is where the race window lives) + filter_from_host
    # (device upload, patched to pass the sentinel through).
    monkeypatch.setattr(filter_mod, "load_filter_host", fake_load)
    monkeypatch.setattr(filter_mod, "filter_from_host", lambda t: t)
    result = {}

    def reader():
        result["f"] = store.get("a")

    t = threading.Thread(target=reader)
    t.start()
    # Wait for the reader to enter the (blocked) load.
    for _ in range(100):
        if loads:
            break
        threading.Event().wait(0.01)
    assert loads, "reader never reached load_filter"
    store.put("a", a1)            # re-train (gen bump; evicts b1)
    store.put("b", b2)            # evicts a1 -> fresh checkpoint C1
    gate.set()                    # the stale load completes only now
    t.join(10)
    assert not t.is_alive()
    # The reader must serve the re-trained filter, never the stale C0 copy.
    assert result["f"].trained is a1.trained
    assert len(loads) == 2        # retried after the generation mismatch


def test_enhance_big_image_falls_back_to_streaming_path(small_png,
                                                        monkeypatch):
    """Images past the pipelined trainer's dense two-phi ceiling must route
    through the per-request trainer (which auto-selects streaming) instead
    of OOMing in the dense-only coalescer."""
    import serve_http

    # The real predicate, on real numbers: a 4 MP image at a 600-sample
    # grid blows 2x phi; the 40x50 test image does not.
    class _Shape:
        def __init__(self, h, w):
            self.shape = (h, w, 3)

    assert serve_http._Service._too_big_to_pipeline(
        _Shape(2000, 2000), (20, 30, 100.0, 30.0, 10, 5))
    assert not serve_http._Service._too_big_to_pipeline(
        _Shape(40, 50), (3, 4, 100.0, 30.0, 5, 4))

    # Force the fallback on a small image: the endpoint must still serve a
    # valid enhancement through the per-request path.
    monkeypatch.setattr(serve_http._Service, "_too_big_to_pipeline",
                        staticmethod(lambda img, params: True))
    srv = serve_http.make_server()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{srv.server_address[1]}"
        img, png = small_png
        with _post(f"{base}/enhance?nr=3&nc=4&hx=100&hy=30&iters=5&k=4"
                   f"&w=2,3,4,1", png) as r:
            out = cv2.imdecode(np.frombuffer(r.read(), np.uint8),
                               cv2.IMREAD_COLOR)
        assert out.shape == img.shape
        # The fallback trains per-request, not via the coalescer.
        with urllib.request.urlopen(f"{base}/metrics", timeout=10) as r:
            m = json.loads(r.read())
        assert m["endpoints"]["/enhance"]["count"] == 1
    finally:
        srv.shutdown()


def test_stalled_client_connection_times_out(monkeypatch):
    """A client that stops transmitting mid-body must not pin a server
    thread forever: the handler's socket timeout closes the connection."""
    import socket
    import time as time_mod

    import serve_http

    monkeypatch.setenv("NLE_SERVE_SOCKET_TIMEOUT", "1")
    srv = serve_http.make_server()
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        s = socket.create_connection(
            ("127.0.0.1", srv.server_address[1]), timeout=10)
        s.sendall(b"POST /enhance HTTP/1.1\r\nHost: x\r\n"
                  b"Content-Length: 100000\r\n\r\npartial")
        s.settimeout(10)
        t0 = time_mod.monotonic()
        # The server must close the connection (EOF) well before the
        # client would have finished never-sending the body.
        data = b"x"
        while data:
            data = s.recv(4096)
        assert time_mod.monotonic() - t0 < 8
        s.close()
    finally:
        srv.shutdown()


def test_main_rejects_unknown_arguments(monkeypatch, capsys):
    """A typo'd flag must not silently start the server — `--tokn=x`
    ignored would mean an UNAUTHENTICATED service."""
    import serve_http

    monkeypatch.setattr(sys, "argv", ["nle-serve", "--tokn=secret"])
    with pytest.raises(SystemExit) as e:
        serve_http.main()
    assert e.value.code == 2
    err = capsys.readouterr().err
    assert "unknown argument" in err and "--tokn=secret" in err


def test_parse_warmup_spec():
    """--warmup grammar: H,W,nr,nc[,iters[,k]] with defaults matching the
    /enhance query defaults (iters=10, k=5); malformed specs fail loudly
    (a silently-dropped warmup would reintroduce the minutes-long first
    compile it exists to prevent)."""
    import serve_http

    assert serve_http.parse_warmup_spec("64,48,3,4") == (64, 48, 3, 4, 10, 5)
    assert serve_http.parse_warmup_spec("1024,1024,20,30,50") == \
        (1024, 1024, 20, 30, 50, 5)
    assert serve_http.parse_warmup_spec("100,200,8,10,12,7") == \
        (100, 200, 8, 10, 12, 7)
    for bad in ("64,48,3", "a,b,c,d", "64,48,3,4,5,6,7", "64,0,3,4", ""):
        with pytest.raises(ValueError):
            serve_http.parse_warmup_spec(bad)
    # Through main(): the usage-message exit(2) path, not a traceback —
    # same contract as every other malformed argument.
    import sys
    from unittest import mock

    with mock.patch.object(sys, "argv", ["nle-serve", "--warmup=1024x768"]):
        with pytest.raises(SystemExit) as e:
            serve_http.main()
    assert e.value.code == 2


def test_run_warmup_traces_request_path():
    """run_warmup drives the real coalescing + edit flow: after warming a
    spec, a server request with the SAME (shape, grid, iters, k) hits only
    already-traced programs. On CPU we can't time compiles meaningfully;
    assert instead that the warmup executes end-to-end and the subsequent
    request round-trips correctly (the chip-side latency evidence lives in
    tools/check_tpu_serving.py)."""
    import serve_http

    times = serve_http.run_warmup([(48, 64, 3, 4, 5, 4)])
    assert len(times) == 1 and times[0] > 0

    srv = serve_http.make_server()
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        rng = np.random.default_rng(1)
        img = rng.integers(0, 256, (48, 64, 3)).astype(np.uint8)
        ok, png = cv2.imencode(".png", img)
        assert ok
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/enhance?nr=3&nc=4&iters=5&k=4"
            "&hx=500&hy=10&w=2,3,4,1", data=png.tobytes())
        with urllib.request.urlopen(req, timeout=120) as r:
            out = cv2.imdecode(
                np.frombuffer(r.read(), np.uint8), cv2.IMREAD_COLOR)
        assert out.shape == img.shape
    finally:
        srv.shutdown()


def test_coalescing_trainer_reuse_delta():
    """--reuse-delta: near-identical frames in one coalesced batch share
    a filter (the temporal warm-start, models/batch.py); distinct frames
    keep their own."""
    import threading

    import numpy as np

    from nle_tpu.serving.http import _CoalescingTrainer

    rng = np.random.default_rng(21)
    base = rng.integers(0, 256, (30, 40, 3)).astype(np.uint8)
    near = base.copy()
    near[..., :] = np.clip(near.astype(np.int16) + 1, 0, 255).astype(np.uint8)
    far = rng.integers(0, 256, (30, 40, 3)).astype(np.uint8)
    params = (4, 5, 40.0, 20.0, 6, 4)

    import time

    def run_batch(pairs, trainer):
        """Coalesce the given requests into one batch (pre-queued under
        the held cv). Enqueue ORDER between threads is arbitrary — pick
        pairs whose expectation is order-invariant."""
        results = {}

        def go(name, img):
            results[name] = trainer.train_enhancement(img, params)[0]

        threads = [threading.Thread(target=go, args=(n, im))
                   for n, im in pairs]
        with trainer._cv:
            for t in threads:
                t.start()
            time.sleep(0.3)
        for t in threads:
            t.join(timeout=120)
        return results

    trainer = _CoalescingTrainer(threading.Lock(), reuse_delta=3.0)
    # Near-identical pair: whichever trains first, the other reuses it.
    r = run_batch([("base", base), ("near", near)], trainer)
    assert r["near"] is r["base"]
    # Distinct pair: each trains its own filter.
    r = run_batch([("base", base), ("far", far)], trainer)
    assert r["far"] is not r["base"]
    # Default (no reuse_delta): even near-identical frames train apart.
    trainer0 = _CoalescingTrainer(threading.Lock())
    r = run_batch([("base", base), ("near", near)], trainer0)
    assert r["near"] is not r["base"]
