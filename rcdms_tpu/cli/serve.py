"""Story-generation HTTP server: a persistent process holding the jitted
two-stage pipeline warm, with dynamic request batching.

    python -m rcdms_tpu.cli.serve --port 8500 \
        --sd-pretrained ... --prior-pretrained ... --vision-pretrained ... \
        [--max-batch 4] [--max-wait-ms 50]

The reference has no serving path at all — its closest analogue is the
one-shot multiprocess eval fan-out (`stage2_batchtest_rcdms_model.py:
457-468`), which pays model load + compile per run. This server compiles
once per batch size and amortizes it across requests; TPU execution is
serialized through a single dispatch thread (JAX programs already saturate
the chip), while HTTP handling is threaded.

API:
  GET  /healthz   -> {"status": "ok", "num_frames": f, "compiled": [...],
                      "served": N, "pending": N, "avg_latency_s": s}
  POST /generate  -> body {"captions": [str x f],
                           "reference_frames": [base64 PNG, ...],  # 0..f
                           "negative_prompt": str, "seed": int}
                  -> {"frames": [base64 PNG x f], "latency_s": float,
                      "batch_size": int}

Backpressure: more than --max-queue pending requests -> 503 (callers
should retry with backoff) instead of unbounded latency growth.

Batching semantics: requests arriving within --max-wait-ms are stacked
into one program call (up to --max-batch). Each request keeps its own
conditioning; the noise key is folded from every request's seed, so a
request's pixels depend on its batch companions — pin --max-batch 1 if
byte-exact per-seed reproducibility across calls is required.

All model/source flags are delegated to the evaluate CLI's parser
(--synthetic runs the tiny random pipeline for smoke tests)."""

from __future__ import annotations

import argparse
import base64
import io
import json
import queue
import threading
import time
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import jax
import numpy as np


def parse_args(argv=None):
    from rcdms_tpu.cli.evaluate import parse_args as eval_args

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", type=int, default=8500)
    p.add_argument("--max-batch", type=int, default=4)
    p.add_argument("--max-wait-ms", type=float, default=50.0,
                   help="how long to hold a request open for batch fill")
    p.add_argument("--max-queue", type=int, default=64,
                   help="pending-request cap; beyond it /generate "
                        "returns 503 (backpressure) instead of growing "
                        "latency unboundedly")
    p.add_argument("--precompile", action="store_true",
                   help="build + compile the batch-1 pipeline into the "
                        "persistent compile cache (RCDMS_COMPILE_CACHE or "
                        "~/.cache/jax), then exit WITHOUT serving — run "
                        "once at host-provisioning time so a fresh serve "
                        "process starts from a cache hit instead of the "
                        "full XLA pass (cold-start mitigation, VERDICT "
                        "r4 #3)")
    args, rest = p.parse_known_args(argv)
    args.eval = eval_args(rest)
    return args


def _png_b64(frame_u8: np.ndarray) -> str:
    from PIL import Image

    buf = io.BytesIO()
    Image.fromarray(frame_u8).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def _decode_b64_image(data: str) -> np.ndarray:
    from PIL import Image

    raw = base64.b64decode(data)
    return np.asarray(Image.open(io.BytesIO(raw)).convert("RGB"))


class _Request:
    __slots__ = ("inputs", "seed", "done", "frames", "error", "batch_size",
                 "t0")

    def __init__(self, inputs, seed):
        self.inputs = inputs
        self.seed = seed
        self.done = threading.Event()
        self.frames = None
        self.error = None
        self.batch_size = 0
        self.t0 = time.monotonic()


class StoryServer:
    """Owns the pipeline, the request queue, and the single dispatch
    thread that batches and executes requests."""

    def __init__(self, ev_args, max_batch: int, max_wait_ms: float,
                 max_queue: int = 64):
        from rcdms_tpu.cli.evaluate import build_pipeline

        self.pipeline, self.params, self.dataset, self.ds_cfg = \
            build_pipeline(ev_args)
        self.max_batch = max(1, max_batch)
        self.max_wait_s = max_wait_ms / 1e3
        self.generate = jax.jit(self.pipeline.generate)
        # story-independent conditioning (uncond caption, white/black mask
        # embeds), memoized per distinct negative-prompt row — halves the
        # per-story encoder work (sample/pipeline.py::CondCache). Batches
        # mixing different negative prompts fall back to the uncached
        # program (generate's cond_cache is one row for the whole batch).
        self._cond_caches: dict = {}
        self.compiled_batches = set()
        self.queue: "queue.Queue[_Request]" = queue.Queue(
            maxsize=max(1, max_queue))
        self.served = 0
        self.total_latency_s = 0.0
        self._stop = threading.Event()
        self.worker = threading.Thread(target=self._loop, daemon=True)

    def warmup(self):
        """Compile batch 1 before accepting traffic."""
        from rcdms_tpu.cli.common import build_story_inputs

        f = self.ds_cfg.num_frames
        inputs = build_story_inputs(["warmup"] * f, [], "", self.dataset,
                                    self.ds_cfg)
        cache = self._cond_cache(np.asarray(inputs.tokens_s1_u[0, 0]))
        out, _ = self.generate(self.params, inputs, jax.random.PRNGKey(0),
                               cache)
        np.asarray(out)  # force through the device pipeline
        self.compiled_batches.add(1)

    def start(self):
        self.worker.start()

    def stop(self):
        self._stop.set()

    def submit(self, inputs, seed: int):
        """Enqueue, or return None when the server is saturated
        (backpressure -> 503)."""
        req = _Request(inputs, seed)
        try:
            self.queue.put_nowait(req)
        except queue.Full:
            return None
        return req

    def _take_batch(self):
        try:
            first = self.queue.get(timeout=0.2)
        except queue.Empty:
            return []
        batch = [first]
        deadline = time.monotonic() + self.max_wait_s
        while len(batch) < self.max_batch:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                batch.append(self.queue.get(timeout=remaining))
            except queue.Empty:
                break
        return batch

    def _loop(self):
        while not self._stop.is_set():
            batch = self._take_batch()
            if not batch:
                continue
            try:
                self._run(batch)
            except Exception as e:  # surface to every waiter
                for r in batch:
                    r.error = f"{type(e).__name__}: {e}"
                    r.done.set()

    def _cond_cache(self, row: "np.ndarray"):
        from rcdms_tpu.cli.common import cond_cache_from_row

        k = row.tobytes()
        if k not in self._cond_caches:
            self._cond_caches[k] = cond_cache_from_row(
                self.pipeline, self.params, self.ds_cfg, row)
        return self._cond_caches[k]

    def _run(self, batch):
        stacked = jax.tree_util.tree_map(
            lambda *xs: np.concatenate(xs, axis=0),
            *[r.inputs for r in batch])
        key = jax.random.PRNGKey(np.uint32(batch[0].seed))
        for r in batch[1:]:
            key = jax.random.fold_in(key, np.uint32(r.seed))
        rows = np.asarray(stacked.tokens_s1_u)
        rows = rows.reshape(-1, rows.shape[-1])
        if (rows == rows[0]).all():
            frames, _ = self.generate(self.params, stacked, key,
                                      self._cond_cache(rows[0]))
        else:
            frames, _ = self.generate(self.params, stacked, key)
        frames = np.asarray(frames)  # (b, f, H, W, 3) float in [0, 1]
        self.compiled_batches.add(len(batch))
        u8 = np.clip(np.round(frames * 255.0), 0, 255).astype(np.uint8)
        # stats mutate only here, on the single dispatch thread (handler
        # threads doing += would race and lose updates)
        for i, r in enumerate(batch):
            r.frames = u8[i]
            r.batch_size = len(batch)
            self.total_latency_s += time.monotonic() - r.t0
            r.done.set()
        self.served += len(batch)


def make_handler(server: StoryServer):
    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet
            pass

        def _reply(self, code: int, obj: dict):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path != "/healthz":
                return self._reply(404, {"error": "not found"})
            self._reply(200, {
                "status": "ok",
                "num_frames": server.ds_cfg.num_frames,
                "image_size": server.ds_cfg.image_size,
                "compiled": sorted(server.compiled_batches),
                "served": server.served,
                "pending": server.queue.qsize(),
                "avg_latency_s": round(
                    server.total_latency_s / max(1, server.served), 4),
            })

        def do_POST(self):
            if self.path != "/generate":
                return self._reply(404, {"error": "not found"})
            try:
                n = int(self.headers.get("Content-Length", 0))
                body = json.loads(self.rfile.read(n) or b"{}")
                captions = body["captions"]
                refs = [_decode_b64_image(d)
                        for d in body.get("reference_frames", [])]
                seed = int(body.get("seed", 0))
                from rcdms_tpu.cli.common import build_story_inputs

                inputs = build_story_inputs(
                    captions, refs, body.get("negative_prompt", ""),
                    server.dataset, server.ds_cfg)
            except (KeyError, ValueError, TypeError, OSError) as e:
                # OSError covers PIL.UnidentifiedImageError (valid base64
                # that is not a decodable image)
                return self._reply(400, {"error": str(e)})
            t0 = time.monotonic()
            req = server.submit(inputs, seed)
            if req is None:
                return self._reply(503, {"error": "server saturated; "
                                         "retry later"})
            req.done.wait()
            if req.error is not None:
                return self._reply(500, {"error": req.error})
            latency = time.monotonic() - t0
            self._reply(200, {
                "frames": [_png_b64(f) for f in req.frames],
                "latency_s": round(latency, 4),
                "batch_size": req.batch_size,
            })

    return Handler


def serve(args, *, ready_event=None, httpd_box=None):
    from rcdms_tpu.cli.common import enable_persistent_compile_cache

    cache_dir = enable_persistent_compile_cache()
    server = StoryServer(args.eval, args.max_batch, args.max_wait_ms,
                         args.max_queue)
    print("compiling batch-1 pipeline...", flush=True)
    t0 = time.monotonic()
    server.warmup()
    print(f"warm in {time.monotonic() - t0:.1f}s", flush=True)
    if getattr(args, "precompile", False):
        print(f"precompile done; compile cache populated at {cache_dir}",
              flush=True)
        return
    server.start()
    httpd = ThreadingHTTPServer((args.host, args.port),
                                make_handler(server))
    if httpd_box is not None:
        httpd_box.append((httpd, server))
    print(f"serving on http://{args.host}:{httpd.server_address[1]}",
          flush=True)
    if ready_event is not None:
        ready_event.set()
    try:
        httpd.serve_forever()
    finally:
        server.stop()


def main(argv=None):
    serve(parse_args(argv))


if __name__ == "__main__":
    main()
