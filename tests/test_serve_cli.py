"""Serving CLI (cli/serve.py): warm jitted pipeline + request batching.

The reference has no server; its eval fan-out reloads and recompiles per
run (`stage2_batchtest_rcdms_model.py:457-468`). These tests run the tiny
synthetic pipeline on CPU behind a real HTTP server."""

import base64
import io
import json
import threading
import urllib.request

import numpy as np
import pytest

from rcdms_tpu.cli.serve import parse_args, serve

# the module fixture compiles a whole tiny pipeline (~70 s cold) — full
# suite only; the fast lane keeps the serve logic covered via parse_args
# unit tests elsewhere
pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def server():
    args = parse_args(["--port", "0", "--max-batch", "2",
                       "--max-wait-ms", "120", "--synthetic",
                       "--num-inference-steps", "2"])
    ready = threading.Event()
    box = []
    t = threading.Thread(target=serve, args=(args,),
                         kwargs=dict(ready_event=ready, httpd_box=box),
                         daemon=True)
    t.start()
    assert ready.wait(timeout=300), "server failed to start"
    httpd, story_server = box[0]
    yield f"http://127.0.0.1:{httpd.server_address[1]}", story_server
    httpd.shutdown()


def _post(url, payload, timeout=300):
    req = urllib.request.Request(
        url + "/generate", data=json.dumps(payload).encode(),
        headers={"Content-Type": "application/json"})
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return json.loads(r.read())


def _captions(f):
    return [f"caption {i}" for i in range(f)]


def test_healthz_and_single_request(server):
    url, srv = server
    with urllib.request.urlopen(url + "/healthz", timeout=60) as r:
        health = json.loads(r.read())
    assert health["status"] == "ok"
    f = health["num_frames"]
    assert 1 in health["compiled"]  # warmup compiled batch 1

    out = _post(url, {"captions": _captions(f), "seed": 7})
    assert len(out["frames"]) == f
    from PIL import Image

    img = Image.open(io.BytesIO(base64.b64decode(out["frames"][0])))
    assert img.size == (health["image_size"], health["image_size"])
    assert np.asarray(img).ndim == 3


def test_reference_frame_and_errors(server):
    url, srv = server
    f = srv.ds_cfg.num_frames
    size = srv.ds_cfg.image_size
    ref = np.random.default_rng(0).integers(0, 255, (size, size, 3),
                                            dtype=np.uint8)
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(ref).save(buf, format="PNG")
    out = _post(url, {"captions": _captions(f),
                      "reference_frames":
                          [base64.b64encode(buf.getvalue()).decode()]})
    assert len(out["frames"]) == f

    # wrong caption count -> 400, server stays up
    try:
        _post(url, {"captions": ["only one"]})
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    # valid base64 that is not an image -> 400 (UnidentifiedImageError is
    # an OSError, which the handler must catch), not a connection reset
    try:
        _post(url, {"captions": _captions(f),
                    "reference_frames":
                        [base64.b64encode(b"not an image").decode()]})
        assert False, "expected HTTPError"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    with urllib.request.urlopen(url + "/healthz", timeout=60) as r:
        assert json.loads(r.read())["status"] == "ok"


def test_concurrent_requests_batch(server):
    url, srv = server
    f = srv.ds_cfg.num_frames
    results = [None, None]

    def call(i):
        results[i] = _post(url, {"captions": _captions(f), "seed": i})

    threads = [threading.Thread(target=call, args=(i,)) for i in range(2)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=300)
    assert all(r is not None and len(r["frames"]) == f for r in results)
    # with max-wait 120ms the two in-flight requests usually coalesce;
    # assert the server is at least CAPABLE of batching (compiled batch 2
    # when it happened) without making the test timing-flaky
    assert max(r["batch_size"] for r in results) in (1, 2)


def test_backpressure_503():
    """A saturated queue returns 503 instead of queueing unboundedly."""
    import urllib.error

    args = parse_args(["--port", "0", "--max-batch", "1",
                       "--max-queue", "1", "--synthetic",
                       "--num-inference-steps", "1"])
    from rcdms_tpu.cli.serve import StoryServer

    srv = StoryServer(args.eval, args.max_batch, args.max_wait_ms,
                      max_queue=1)
    # do NOT start the worker: submissions pile up
    f = srv.ds_cfg.num_frames
    from rcdms_tpu.cli.common import build_story_inputs

    inputs = build_story_inputs([f"c{i}" for i in range(f)], [], "",
                                srv.dataset, srv.ds_cfg)
    assert srv.submit(inputs, 0) is not None   # fills the queue
    assert srv.submit(inputs, 1) is None       # saturated -> 503 path


def test_precompile_exits_without_serving(tmp_path, monkeypatch):
    """`serve --precompile` warms the pipeline into the persistent compile
    cache and returns WITHOUT binding a port (the host-provisioning
    cold-start mitigation). The cache dir must be populated."""
    monkeypatch.setenv("RCDMS_COMPILE_CACHE", str(tmp_path / "cache"))
    args = parse_args(["--precompile", "--synthetic",
                       "--num-inference-steps", "1"])
    box = []
    serve(args, httpd_box=box)   # returns synchronously, no server thread
    assert box == []             # never reached ThreadingHTTPServer
    cache = tmp_path / "cache"
    assert cache.is_dir() and any(cache.iterdir()), \
        "persistent compile cache not populated"
