"""Online inference server: checkpoint or StableHLO artifact -> HTTP.

The reference ends at training; its only "serving" is the matplotlib viz
harness (``util/viz.py``, SURVEY.md §3.4). This CLI is the production
counterpart: one compiled static-batch XLA program behind a dynamic
micro-batching queue (serving.MicroBatcher) — concurrent requests are
coalesced up to ``--batch_size`` and answered from a single device
dispatch, never a per-request compile.

Endpoints (stdlib ThreadingHTTPServer; one handler thread per connection,
all funneling into the batcher):

* ``GET /healthz`` — liveness + compile warm-up state.
* ``GET /info`` — model/input contract (kind, canvas, batch, config).
* ``GET /stats`` — serving counters (requests, dispatches, mean batch
  fill, per-dispatch latency p50/p99, queue depth).
* ``POST /predict`` — body = ``.npy`` bytes, uint8 ``(n, canvas, canvas,
  C)``; response ``.npy`` float32 (pooled features for an MAE checkpoint,
  class logits for a finetune/linprobe checkpoint). ``Accept:
  application/json`` returns a JSON list instead.
* ``POST /predict_image`` — body = encoded image (JPEG/PNG...); decoded,
  resized to the canvas, served as a batch of one; JSON response. 3-channel
  models only.

Usage:
    python -m cross_scale_mae_tpu.cli.serve --ckpt <run>/checkpoints \
        --batch_size 64 --port 8901
    python -m cross_scale_mae_tpu.cli.serve --artifact enc.stablehlo
"""

from __future__ import annotations

import argparse
import io
import json
import threading

import numpy as np


def get_args_parser():
    p = argparse.ArgumentParser("Cross-Scale MAE inference server (TPU)",
                                add_help=False)
    src = p.add_mutually_exclusive_group(required=True)
    src.add_argument("--ckpt", default=None,
                     help="checkpoint dir (MAE pretrain -> features, "
                          "finetune/linprobe -> logits, auto-detected)")
    src.add_argument("--artifact", default=None,
                     help="serve an exported .stablehlo (baked weights; "
                          "reads the .json sidecar for the input contract)")
    p.add_argument("--step", default=None, type=int)
    p.add_argument("--pool", default="cls", choices=["cls", "mean", "tokens"])
    p.add_argument("--dataset_type", default="fmow_rgb")
    p.add_argument("--canvas_scale", default=None, type=float)
    p.add_argument("--batch_size", default=64, type=int,
                   help="static compiled batch = max coalesced request rows")
    p.add_argument("--max_delay_ms", default=5.0, type=float,
                   help="batching window: how long a request waits for "
                        "co-riders before dispatch")
    p.add_argument("--batch_buckets", default=None, type=int, nargs="+",
                   help="compiled batch sizes (largest must equal "
                        "--batch_size): each dispatch pads to the SMALLEST "
                        "bucket that fits instead of always to the max — "
                        "cuts low-load latency for a few extra compiles "
                        "(e.g. --batch_buckets 8 16 64). In-process --ckpt "
                        "serving (an artifact has its shapes fixed at "
                        "export; use a --symbolic_batch export instead)")
    p.add_argument("--host", default="127.0.0.1")
    p.add_argument("--port", default=8901, type=int)
    p.add_argument("--no_warmup", action="store_true",
                   help="skip the compile-before-accept warm-up call")
    p.add_argument("--max_request_mb", default=256, type=int,
                   help="reject request bodies larger than this (413)")
    p.add_argument("--max_queue_rows", default=None, type=int,
                   help="backpressure: reject new requests (429) once this "
                        "many rows are queued for the device (default "
                        "32x the compiled batch; 0 = unbounded)")
    p.add_argument("--deadline_ms", default=30000.0, type=float,
                   help="per-request end-to-end budget: requests not "
                        "answered within this window get 504 and are "
                        "purged from the queue (0 = no deadline)")
    p.add_argument("--quantize", default=None, choices=["int8"],
                   help="weight-only int8 for in-process --ckpt serving "
                        "(quant.py): 4x less weight HBM traffic per dispatch")
    p.add_argument("--native_kernels", action="store_true",
                   help="keep the checkpoint's attention implementation "
                        "(Pallas kernel on TPU) instead of the portable "
                        "XLA lowering — in-process --ckpt serving only")
    p.add_argument("--data_parallel", action="store_true",
                   help="shard each compiled batch over all local devices "
                        "(params replicated; --batch_size must divide by "
                        "the device count) — in-process --ckpt serving")
    return p


def build_app(args, model=None):
    """Load the model (unless one is injected, e.g. by benchmarks), warm
    it, and return (HTTPServer, batcher)."""
    from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

    from cross_scale_mae_tpu.serving import (
        DeadlineExceededError,
        MicroBatcher,
        QueueFullError,
        build_serving_model,
        load_artifact,
    )
    from cross_scale_mae_tpu.utils.logging import rank0_print

    if args.artifact and args.native_kernels:
        raise SystemExit(
            "--native_kernels applies to in-process --ckpt serving; an "
            "exported artifact's lowering is fixed at export time")
    if args.artifact and args.quantize:
        raise SystemExit(
            "--quantize applies to in-process --ckpt serving; quantize an "
            "artifact at export time (cli/export.py --quantize int8)")
    if args.artifact and args.data_parallel:
        raise SystemExit(
            "--data_parallel applies to in-process --ckpt serving; an "
            "exported artifact's device layout is fixed at export time")
    if args.artifact and args.batch_buckets:
        raise SystemExit(
            "--batch_buckets applies to in-process --ckpt serving; an "
            "artifact's input shapes are fixed at export time (export "
            "with --symbolic_batch for shape-flexible artifacts)")
    if args.batch_buckets and args.data_parallel:
        raise SystemExit(
            "--batch_buckets and --data_parallel don't compose: the "
            "data-parallel program pins one sharded batch shape")
    if model is not None:
        pass
    elif args.artifact:
        model = load_artifact(args.artifact)
        if model.batch_size is None:
            # Polymorphic artifact: batch freely, cap coalescing at the
            # CLI batch size so one giant request can't starve the queue.
            model = model.__class__(model.fn, model.canvas, model.channels,
                                    args.batch_size, model.kind, model.meta)
    else:
        model = build_serving_model(
            args.ckpt, args.step, pool=args.pool,
            dataset_type=args.dataset_type, canvas_scale=args.canvas_scale,
            batch_size=args.batch_size,
            portable=not args.native_kernels,
            quantize=args.quantize,
            data_parallel=args.data_parallel,
        )

    buckets = getattr(args, "batch_buckets", None)
    if buckets and model.batch_size is not None \
            and max(buckets) != model.batch_size:
        raise SystemExit(
            f"largest --batch_buckets entry {max(buckets)} must equal "
            f"--batch_size {model.batch_size}")
    state = {"warm": False}
    if not args.no_warmup:
        # Pay the XLA compiles before the socket opens, not on request one
        # (one program per bucket when --batch_buckets is given).
        for b in sorted(set(buckets or [model.batch_size])):
            zeros = np.zeros(
                (b, model.canvas, model.canvas, model.channels), np.uint8)
            model.fn(zeros)
        state["warm"] = True

    max_queue_rows = getattr(args, "max_queue_rows", None)
    if max_queue_rows is None and model.batch_size is not None:
        max_queue_rows = 32 * model.batch_size
    if max_queue_rows == 0:
        max_queue_rows = None
    deadline_ms = getattr(args, "deadline_ms", 0.0) or None
    batcher = MicroBatcher(model.fn, model.batch_size, model.canvas,
                           model.channels, max_delay_ms=args.max_delay_ms,
                           buckets=buckets, max_queue_rows=max_queue_rows,
                           deadline_ms=deadline_ms)

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, fmt, *a):  # quiet per-request stderr spam
            pass

        def _send(self, code, body: bytes, ctype: str):
            self.send_response(code)
            self.send_header("Content-Type", ctype)
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def _json(self, code, obj):
            self._send(code, json.dumps(obj).encode(), "application/json")

        def do_GET(self):
            if self.path == "/healthz":
                self._json(200, {"ok": True, "warm": state["warm"],
                                 "kind": model.kind})
            elif self.path == "/info":
                self._json(200, {
                    "kind": model.kind,
                    "input": [model.batch_size, model.canvas, model.canvas,
                              model.channels],
                    "max_delay_ms": args.max_delay_ms,
                    "max_queue_rows": batcher.max_queue_rows,
                    "deadline_ms": deadline_ms,
                    **model.meta,
                })
            elif self.path == "/stats":
                self._json(200, batcher.stats())
            else:
                self._json(404, {"error": f"no route {self.path}"})

        def do_POST(self):
            n = int(self.headers.get("Content-Length", 0))
            if n > args.max_request_mb * 1024 * 1024:
                self._json(413, {"error": f"request body {n} bytes exceeds "
                                          f"--max_request_mb "
                                          f"{args.max_request_mb}"})
                return
            body = self.rfile.read(n)
            try:
                if self.path == "/predict":
                    arr = np.load(io.BytesIO(body), allow_pickle=False)
                    out = batcher.submit(np.ascontiguousarray(arr))
                    if "application/json" in self.headers.get("Accept", ""):
                        self._json(200, {"output": out.tolist()})
                    else:
                        buf = io.BytesIO()
                        np.save(buf, out)
                        self._send(200, buf.getvalue(),
                                   "application/octet-stream")
                elif self.path == "/predict_image":
                    if model.channels != 3:
                        self._json(400, {"error": "image endpoint serves "
                                                  "3-channel models only"})
                        return
                    from PIL import Image

                    with Image.open(io.BytesIO(body)) as im:
                        arr = np.asarray(im.convert("RGB").resize(
                            (model.canvas, model.canvas), Image.BICUBIC))
                    out = batcher.submit(arr[None].astype(np.uint8))
                    self._json(200, {"output": out[0].tolist()})
                else:
                    self._json(404, {"error": f"no route {self.path}"})
            except (ValueError, OSError, EOFError) as e:
                # malformed npy/image bodies (np.load raises EOFError on an
                # empty buffer, PIL raises UnidentifiedImageError <: OSError)
                self._json(400, {"error": str(e)})
            except QueueFullError as e:
                # backpressure: the device queue is at --max_queue_rows
                self.send_response(429)
                body = json.dumps({"error": str(e)}).encode()
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Retry-After", "1")
                self.end_headers()
                self.wfile.write(body)
            except DeadlineExceededError as e:
                self._json(504, {"error": str(e)})
            except RuntimeError as e:
                self._json(503, {"error": str(e)})
            except Exception as e:  # noqa: BLE001 — last resort: answer 500
                # rather than killing the handler thread mid-response (the
                # client would see a bare connection reset, no diagnostics)
                self._json(500, {"error": f"{type(e).__name__}: {e}"})

    server = ThreadingHTTPServer((args.host, args.port), Handler)
    rank0_print(
        f"serving {model.kind} model on http://{args.host}:{server.server_address[1]} "
        f"(batch {model.batch_size}, canvas {model.canvas}, "
        f"window {args.max_delay_ms} ms)")
    return server, batcher


def main(args) -> dict:
    import signal

    server, batcher = build_app(args)
    stop = threading.Event()

    def handle(_sig, _frm):
        stop.set()
        threading.Thread(target=server.shutdown, daemon=True).start()

    signal.signal(signal.SIGTERM, handle)
    signal.signal(signal.SIGINT, handle)
    try:
        server.serve_forever()
    finally:
        batcher.close()
        server.server_close()
    return {"stopped": True}


if __name__ == "__main__":
    main(get_args_parser().parse_args())
