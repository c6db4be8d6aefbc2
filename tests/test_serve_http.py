"""The HTTP edit service (examples/serve_http.py): routing, train-once /
edit-many state, and error surfacing over real sockets. The full golden
PSNR path is `python examples/serve_http.py --selftest --platform=cpu`
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
    assert meta == {"name": "t1", "k": 4, "shape": [40, 50]}
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


def test_concurrent_enhance_coalesces(server, small_png):
    """Concurrent same-shape /enhance requests ride one pipelined batch
    (examples/serve_http.py _CoalescingTrainer) and each equals the
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
