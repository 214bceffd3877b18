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
    ap.add_argument("--burst", action="store_true",
                    help="mixed-size burst scenario: every client fires "
                         "randomly-sized requests back-to-back; reports "
                         "p50/p99 per size class plus 429/504 counts "
                         "(exercises --max_queue_rows/--deadline_ms "
                         "backpressure under overload)")
    ap.add_argument("--burst_sizes", type=int, nargs="+",
                    default=[1, 4, 16, 64],
                    help="row-count classes the burst mixes")
    ap.add_argument("--burst_concurrency", type=int, default=24)
    ap.add_argument("--max_queue_rows", type=int, default=None,
                    help="server backpressure bound (default 32x batch)")
    ap.add_argument("--deadline_ms", type=float, default=30000.0,
                    help="server per-request deadline")
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
                  str(args.max_delay_ms), "--deadline_ms",
                  str(args.deadline_ms)]
    if args.max_queue_rows is not None:
        serve_argv += ["--max_queue_rows", str(args.max_queue_rows)]
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

    if args.burst:
        _burst_scenario(base, args, canvas)
        server.shutdown()
        batcher.close()
        server.server_close()
        return

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


def _burst_scenario(base: str, args, canvas: int) -> None:
    """Mixed-size burst: ``burst_concurrency`` clients each fire
    ``requests`` randomly-sized posts with no pacing. Reports per-size-class
    and overall p50/p99 (successful requests only) plus the 429/504 counts
    — the tail-latency + backpressure picture a deployer needs
    (VERDICT r3 next-7)."""
    rng = np.random.default_rng(7)
    payloads = {}
    for n in args.burst_sizes:
        buf = io.BytesIO()
        np.save(buf, rng.integers(0, 256, (n, canvas, canvas, 3), np.uint8))
        payloads[n] = buf.getvalue()

    s0 = json.load(urllib.request.urlopen(base + "/stats"))
    records: list[list[tuple[int, int, float]]] = [
        [] for _ in range(args.burst_concurrency)
    ]

    def client(i: int):
        crng = np.random.default_rng(100 + i)
        for _ in range(args.requests):
            n = int(crng.choice(args.burst_sizes))
            t0 = time.perf_counter()
            req = urllib.request.Request(
                base + "/predict", data=payloads[n], method="POST")
            try:
                with urllib.request.urlopen(req) as r:
                    r.read()
                    code = r.status
            except urllib.error.HTTPError as e:
                e.read()
                code = e.code
            records[i].append((n, code, (time.perf_counter() - t0) * 1e3))

    threads = [threading.Thread(target=client, args=(i,))
               for i in range(args.burst_concurrency)]
    t0 = time.perf_counter()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.perf_counter() - t0
    s1 = json.load(urllib.request.urlopen(base + "/stats"))

    flat = [r for sub in records for r in sub]
    ok = [r for r in flat if r[1] == 200]
    codes: dict[int, int] = {}
    for _, code, _ in flat:
        codes[code] = codes.get(code, 0) + 1

    def pcts(lats):
        lats = sorted(lats)
        if not lats:
            return None, None
        return (round(lats[len(lats) // 2], 1),
                round(lats[min(len(lats) - 1, int(0.99 * len(lats)))], 1))

    per_size = {}
    for n in args.burst_sizes:
        p50, p99 = pcts([lat for rows, code, lat in ok if rows == n])
        per_size[str(n)] = {"p50_ms": p50, "p99_ms": p99,
                            "n_ok": sum(1 for rows, code, _ in ok
                                        if rows == n)}
    p50_all, p99_all = pcts([lat for _, _, lat in ok])
    print(json.dumps({
        "metric": "http_burst_mixed_p99_ms",
        "value": p99_all,
        "unit": "ms",
        "p50_ms": p50_all,
        "imgs_per_sec": round(sum(rows for rows, _, _ in ok) / wall, 1),
        "status_counts": codes,
        "per_size": per_size,
        "server_stats": {k: s1[k] - s0.get(k, 0) if isinstance(s1[k], int)
                         else s1[k]
                         for k in ("dispatches", "rejected_full",
                                   "deadline_expired", "dispatch_ms_p99")},
    }))


if __name__ == "__main__":
    main()
