"""HTTP serving layer under concurrent load: latency + coalescing.

What a deployer asks of ``cli/serve.py`` that ``bench_serving.py`` (raw
artifact dispatch) can't answer: what do request latency and aggregate
throughput look like through the HTTP + micro-batching stack, and does the
batcher actually coalesce under concurrency (mean batch fill > rows per
request / max_batch)?

Method: build the encoder ServingModel in-process (no checkpoint needed),
mount it on the real ``cli/serve.build_app`` HTTP server on an ephemeral
port, then sweep client concurrency; each client thread posts ``.npy``
uint8 batches back-to-back. Reports per-request p50/p99 latency, aggregate
imgs/s, and the server's own /stats (dispatch count, mean fill).

Run (CPU smoke): python benchmarks/bench_serve_http.py --platform cpu \
    --model mae_vit_tiny --input_size 16 --patch_size 8 --dtype float32
Run (TPU):       python benchmarks/bench_serve_http.py
"""

from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
import time
import urllib.request

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="mae_vit_base")
    ap.add_argument("--input_size", type=int, default=128)
    ap.add_argument("--patch_size", type=int, default=16)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--batch_size", type=int, default=64,
                    help="server-side static compiled batch")
    ap.add_argument("--rows", type=int, default=8,
                    help="rows per client request")
    ap.add_argument("--concurrency", type=int, nargs="+", default=[1, 4, 16])
    ap.add_argument("--requests", type=int, default=32,
                    help="requests per client thread")
    ap.add_argument("--max_delay_ms", type=float, default=5.0)
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (smoke: cpu); sitecustomize "
                         "pins jax_platforms, so JAX_PLATFORMS alone "
                         "does not take (tests/conftest.py recipe)")
    ap.add_argument("--batch_buckets", type=int, nargs="+", default=None,
                    help="compiled batch-size buckets (largest == "
                         "--batch_size): measures the low-load latency win")
    ap.add_argument("--quantize", default=None, choices=["int8"],
                    help="weight-only int8 (quant.py): measures the "
                         "low-batch HBM-bandwidth claim")
    args = ap.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import jax.numpy as jnp

    from cross_scale_mae_tpu.cli import serve
    from cross_scale_mae_tpu.configs import get_mae_config
    from cross_scale_mae_tpu.data.datasets import FMOW_RGB_MEAN, FMOW_RGB_STD
    from cross_scale_mae_tpu.models import mae_encode, mae_init
    from cross_scale_mae_tpu.ops.augment import make_eval_preprocess
    from cross_scale_mae_tpu.serving import ServingModel

    cfg = get_mae_config(
        args.model, input_size=args.input_size, patch_size=args.patch_size,
        compute_dtype=args.dtype, attention_impl="xla",
    )
    params, _ = mae_init(jax.random.key(0), cfg)
    canvas = int(round(cfg.input_size / 0.875))
    preprocess = make_eval_preprocess(
        FMOW_RGB_MEAN, FMOW_RGB_STD, cfg.input_size, dtype=cfg.compute_dtype)

    if args.quantize == "int8":
        from cross_scale_mae_tpu.quant import (
            dequantize_params,
            quantize_params_int8,
        )

        qparams = jax.device_put(quantize_params_int8(params))

        @jax.jit
        def forward_q(qp, imgs):
            feats = mae_encode(
                dequantize_params(qp, cfg.compute_dtype), cfg,
                preprocess(imgs))
            return jnp.mean(feats[:, 1:], axis=1).astype(jnp.float32)

        def run(imgs):
            return np.asarray(forward_q(qparams, imgs))
    else:
        # Params as a jit ARGUMENT, not a closure constant: closed-over
        # arrays are baked into the lowered module, which balloons the
        # compile payload (the axon remote-compile tunnel rejects a
        # ViT-B's ~100 MB of baked weights with HTTP 413).
        params_dev = jax.device_put(params)

        @jax.jit
        def forward(p, imgs):
            feats = mae_encode(p, cfg, preprocess(imgs))
            return jnp.mean(feats[:, 1:], axis=1).astype(jnp.float32)

        def run(imgs):
            return np.asarray(forward(params_dev, imgs))

    model = ServingModel(
        run, canvas, 3, args.batch_size, "mae", {"source": "bench"},
    )
    serve_argv = ["--ckpt", "_injected_", "--port", "0", "--batch_size",
                  str(args.batch_size), "--max_delay_ms",
                  str(args.max_delay_ms)]
    if args.batch_buckets:
        serve_argv += ["--batch_buckets"] + [str(b) for b in args.batch_buckets]
    sargs = serve.get_args_parser().parse_args(serve_argv)
    server, batcher = serve.build_app(sargs, model=model)
    threading.Thread(target=server.serve_forever, daemon=True).start()
    base = f"http://127.0.0.1:{server.server_address[1]}"

    body = io.BytesIO()
    np.save(body, np.random.default_rng(0).integers(
        0, 256, (args.rows, canvas, canvas, 3), np.uint8))
    payload = body.getvalue()

    def client(lat: list):
        for _ in range(args.requests):
            t0 = time.perf_counter()
            req = urllib.request.Request(
                base + "/predict", data=payload, method="POST")
            with urllib.request.urlopen(req) as r:
                r.read()
            lat.append((time.perf_counter() - t0) * 1e3)

    results = []
    for conc in args.concurrency:
        s0 = json.load(urllib.request.urlopen(base + "/stats"))
        lats: list[list] = [[] for _ in range(conc)]
        threads = [threading.Thread(target=client, args=(lats[i],))
                   for i in range(conc)]
        t0 = time.perf_counter()
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        wall = time.perf_counter() - t0
        s1 = json.load(urllib.request.urlopen(base + "/stats"))
        flat = sorted(x for sub in lats for x in sub)
        n_req = len(flat)
        row = {
            "concurrency": conc,
            "imgs_per_sec": round(n_req * args.rows / wall, 1),
            "latency_ms_p50": round(flat[n_req // 2], 1),
            "latency_ms_p99": round(flat[min(n_req - 1, int(0.99 * n_req))], 1),
            "dispatches": s1["dispatches"] - s0["dispatches"],
            "mean_fill_rows": round(
                n_req * args.rows / max(1, s1["dispatches"] - s0["dispatches"]),
                1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    server.shutdown()
    batcher.close()
    server.server_close()
    best = max(r["imgs_per_sec"] for r in results)
    tag = args.model.replace("mae_vit_", "vit")
    if args.quantize:
        tag += f"_{args.quantize}"
    print(json.dumps({
        "metric": f"http_serving_imgs_per_sec_{tag}_{args.input_size}px",
        "value": best, "unit": "imgs/sec/chip", "rows": results}))


if __name__ == "__main__":
    main()
