"""Serving core: checkpoint/artifact -> callable forward + micro-batcher.

The reference has no serving story (its only inference surface is the
matplotlib viz harness, ``util/viz.py`` — SURVEY.md §3.4). This module is
the TPU-native one, shared by ``cli/export.py`` (ahead-of-time StableHLO
artifact) and ``cli/serve.py`` (online HTTP inference):

* :func:`prepare_serving` — rebuild a checkpoint (MAE pretrain -> pooled
  features, finetune/linprobe -> class logits, auto-detected from the
  config sidecar) as a pure ``forward(params, uint8_canvas)`` with the
  train-time eval preprocessing (normalize + center-crop) fused in.
* :func:`load_artifact` — deserialize an exported ``.stablehlo`` module
  (+ its ``.json`` sidecar) back into the same shape of callable, so a
  server can run from the portable artifact without the checkpoint.
* :class:`MicroBatcher` — dynamic request batching onto ONE static-shape
  XLA program. TPU-first serving rule: the compiled step wants a fixed
  batch; concurrent requests are coalesced up to ``max_batch`` (padding
  the remainder), never recompiled per request size.
"""

from __future__ import annotations

import dataclasses
import json
import os
import threading
import time
from typing import Any, Callable, Optional

import numpy as np


@dataclasses.dataclass
class ServingModel:
    """A ready-to-call serving head with its input contract."""

    fn: Callable[[np.ndarray], np.ndarray]  # (B,canvas,canvas,C)u8 -> f32
    canvas: int
    channels: int
    batch_size: Optional[int]  # static batch; None = polymorphic
    kind: str                  # 'mae' | 'classifier'
    meta: dict


def prepare_serving(
    ckpt: str,
    step: Optional[int] = None,
    pool: str = "cls",
    dataset_type: str = "fmow_rgb",
    canvas_scale: Optional[float] = None,
    portable: bool = True,
):
    """Checkpoint -> (forward(params, imgs), params, cfg, kind, canvas, C).

    ``forward`` takes a raw uint8 canvas batch and returns float32 pooled
    features (MAE run) or class logits (classifier run) — the exact graph
    ``cli/export.py`` lowers into the portable artifact. With
    ``portable=True`` (the export default) attention is forced onto the
    XLA path so the graph lowers on every platform (numerically identical
    to the Pallas kernels, tests/test_models.py); ``portable=False``
    (in-process TPU serving, ``cli/serve.py --native_kernels``) keeps the
    checkpoint's attention choice — the Pallas kernel where it trained.
    """
    import jax.numpy as jnp

    from cross_scale_mae_tpu.data.datasets import (
        DATASET_STATS,
        normalize_on_device_for,
    )
    from cross_scale_mae_tpu.ops.augment import make_eval_preprocess
    from cross_scale_mae_tpu.utils.checkpoint import (
        checkpoint_kind,
        checkpoint_meta,
        latest_step,
        restore_classifier_host,
    )

    if step is None:
        step = latest_step(ckpt)
    kind = checkpoint_kind(checkpoint_meta(ckpt, step))

    model_state = None
    if kind == "classifier":
        params, model_state, cfg = restore_classifier_host(ckpt, step)
    else:
        from cross_scale_mae_tpu.viz import prepare_model

        params, _state, cfg = prepare_model(ckpt, step)
        # Serving runs the unmasked encoder only (mae_encode): drop the
        # decoder/predictor subtrees. A baked module DCEs them anyway, but
        # sidecar-weights forms (--no_bake_weights, --quantize int8) ship
        # every leaf that stays in the tree — for ViT-B the decoder is
        # ~3.5x the encoder's parameter bytes.
        keep = {"patch_embed", "cls_token", "encoder_blocks"}
        if cfg.apply_encoder_norm:
            keep.add("encoder_norm")
        params = {k: v for k, v in params.items() if k in keep}
    if portable and cfg.attention_impl != "xla":
        cfg = cfg.replace(attention_impl="xla")

    if dataset_type not in DATASET_STATS:
        raise SystemExit(
            f"unknown dataset_type {dataset_type!r}; "
            f"known: {sorted(DATASET_STATS)}"
        )
    mean, std = DATASET_STATS[dataset_type]
    # Host-normalized families (SentinelNormalize) must NOT get a second
    # on-device normalize; the flag lives on the dataset classes
    # (single source of truth, data/datasets.py).
    normalize = normalize_on_device_for(dataset_type)
    if normalize and len(mean) != cfg.input_channels:
        raise SystemExit(
            f"dataset_type {dataset_type} has {len(mean)}-channel stats "
            f"but the checkpoint expects {cfg.input_channels} channels"
        )
    scale = canvas_scale
    if scale is None:
        # The eval pipeline's Resize(input/0.875) + CenterCrop for inputs
        # <= 224 (util/datasets.py:140-158 equivalent).
        scale = 1.0 / 0.875 if cfg.input_size <= 224 else 1.0
    canvas = int(round(cfg.input_size * scale))

    preprocess = make_eval_preprocess(
        mean, std, cfg.input_size, normalize=normalize,
        dtype=cfg.compute_dtype,
    )

    if kind == "classifier":
        from cross_scale_mae_tpu.models.vit import vit_apply

        def forward(p, imgs):
            # BN-head running stats (linprobe) ride along as constants —
            # eval semantics.
            logits, _ = vit_apply(
                p, model_state, cfg, preprocess(imgs), train=False
            )
            return logits.astype(jnp.float32)
    else:
        from cross_scale_mae_tpu.models import mae_encode

        def forward(p, imgs):
            feats = mae_encode(p, cfg, preprocess(imgs))
            if pool == "cls":
                out = feats[:, 0]
            elif pool == "mean":
                out = jnp.mean(feats[:, 1:], axis=1)
            else:
                out = feats
            return out.astype(jnp.float32)

    return forward, params, cfg, kind, canvas, cfg.input_channels


def build_serving_model(
    ckpt: str,
    step: Optional[int] = None,
    pool: str = "cls",
    dataset_type: str = "fmow_rgb",
    canvas_scale: Optional[float] = None,
    batch_size: int = 64,
    portable: bool = True,
    quantize: Optional[str] = None,
    data_parallel: bool = False,
) -> ServingModel:
    """In-process serving head: one jitted static-batch program.

    ``quantize='int8'`` stores matmul kernels as int8 + per-channel scales
    (weight-only; quant.py) — dequantize happens inside the jitted forward
    and fuses into the matmuls, so HBM holds the 4x-smaller weights.

    ``data_parallel=True`` shards the compiled batch over ALL local
    devices (1-D ``Mesh('data')``, params replicated): the micro-batcher
    still coalesces requests onto one static-shape program, but each
    dispatch splits its rows across the mesh — TPU-pod serving is the
    same program at a bigger ``batch_size``. No-op on a single chip."""
    import jax

    forward, params, cfg, kind, canvas, c = prepare_serving(
        ckpt, step, pool, dataset_type, canvas_scale, portable=portable
    )
    batch_sh = repl = None
    n_dev = None
    if data_parallel:
        from jax.sharding import Mesh, NamedSharding, PartitionSpec

        devs = jax.devices()
        n_dev = len(devs)
        if batch_size % n_dev:
            raise SystemExit(
                f"--batch_size {batch_size} must be divisible by the device "
                f"count {n_dev} for data-parallel serving")
        mesh = Mesh(np.asarray(devs), ("data",))
        batch_sh = NamedSharding(mesh, PartitionSpec("data"))
        repl = NamedSharding(mesh, PartitionSpec())
    quant_info = None
    if quantize == "int8":
        from cross_scale_mae_tpu.quant import (
            dequantize_params,
            quantize_params_int8,
            quantized_bytes,
        )

        # The codes must be jit ARGUMENTS, not closure constants: eager
        # trace-time ops on constants would fold the dequantize back to a
        # full-precision array (HBM win lost). As arguments the int8 tree
        # lives on device and XLA fuses cast*scale into each matmul read.
        qparams = jax.device_put(quantize_params_int8(params), repl)
        qb, fb = quantized_bytes(qparams)
        quant_info = {"scheme": "int8_weight_only", "bytes": qb,
                      "fp32_bytes": fb}
        jit_kw = ({"in_shardings": (repl, batch_sh),
                   "out_shardings": batch_sh} if data_parallel else {})
        jitted_q = jax.jit(lambda qp, imgs: forward(
            dequantize_params(qp, cfg.compute_dtype), imgs), **jit_kw)

        def fn(imgs: np.ndarray) -> np.ndarray:
            return np.asarray(jitted_q(qparams, imgs))

    elif quantize is not None:
        raise SystemExit(f"unknown quantization scheme {quantize!r}")
    elif data_parallel:
        # Params become an explicit replicated argument so the sharding is
        # pinned, not left to GSPMD's constant propagation.
        params_dev = jax.device_put(params, repl)
        jitted_dp = jax.jit(forward, in_shardings=(repl, batch_sh),
                            out_shardings=batch_sh)

        def fn(imgs: np.ndarray) -> np.ndarray:
            return np.asarray(jitted_dp(params_dev, imgs))

    else:
        # Params as a jit ARGUMENT, not a closure constant: closed-over
        # arrays get baked into the lowered module as constants, which
        # balloons the compile payload (a remote-compile transport — e.g.
        # the axon tunnel — rejects ViT-B's ~100 MB of baked weights) and
        # re-traces if the params object is rebuilt.
        params_dev = jax.device_put(params)
        jitted = jax.jit(forward)

        def fn(imgs: np.ndarray) -> np.ndarray:
            return np.asarray(jitted(params_dev, imgs))

    meta = {
        "source": "checkpoint", "ckpt": ckpt, "kind": kind,
        "pool": pool if kind == "mae" else "n/a (classifier head)",
        "dataset_type": dataset_type,
        "input": [batch_size, canvas, canvas, c],
        "quantize": quant_info,
        "data_parallel": n_dev,
        "model_config": json.loads(cfg.to_json()),
    }
    return ServingModel(fn, canvas, c, batch_size, kind, meta)


def load_artifact(path: str) -> ServingModel:
    """Exported ``.stablehlo`` (+ ``.json`` sidecar) -> ServingModel.

    Serves all three export forms: baked weights (self-contained module),
    ``--no_bake_weights`` (fp params in ``.params.npz``), and
    ``--quantize int8`` (int8 codes in ``.q8.npz``; the dequantize is part
    of the module and fuses into the matmuls on device). The ``.json``
    sidecar carries the input contract the exporter verified against.
    """
    import jax
    import jax.numpy as jnp
    from jax import export as jexport

    with open(path, "rb") as f:
        reloaded = jexport.deserialize(f.read())
    try:
        with open(path + ".json") as f:
            meta = json.load(f)
    except FileNotFoundError:
        raise SystemExit(
            f"{path}.json sidecar not found next to the artifact; "
            "cli/export.py writes it — serve from the original export"
        )
    weights = meta.get("weights", "baked")
    wtree = None
    if isinstance(weights, str) and weights != "baked":
        from cross_scale_mae_tpu.utils.checkpoint import load_flat_npz

        if not os.path.exists(weights):  # exported on another host?
            local = path + (".q8.npz" if weights.endswith(".q8.npz")
                            else ".params.npz")
            if not os.path.exists(local):
                raise SystemExit(
                    f"weights sidecar not found: {weights} (nor {local})")
            weights = local
        wtree = jax.device_put(load_flat_npz(weights))
    b, canvas, _, c = meta["input"]

    if wtree is None:
        def fn(imgs: np.ndarray) -> np.ndarray:
            return np.asarray(reloaded.call(jnp.asarray(imgs)))
    else:
        def fn(imgs: np.ndarray) -> np.ndarray:
            return np.asarray(reloaded.call(wtree, jnp.asarray(imgs)))

    meta = dict(meta, source="artifact", artifact=path)
    return ServingModel(fn, int(canvas), int(c), b if b is None else int(b),
                        meta["kind"], meta)


class QueueFullError(RuntimeError):
    """Backpressure: the batcher queue is at ``max_queue_rows`` (HTTP 429)."""


class DeadlineExceededError(RuntimeError):
    """The request missed its end-to-end ``deadline_ms`` (HTTP 504)."""


class MicroBatcher:
    """Coalesce concurrent requests onto one static-batch compiled call.

    ``submit`` blocks the calling (HTTP handler) thread until its rows are
    computed. A single worker drains the queue: it waits up to
    ``max_delay_ms`` for more rows to arrive (latency/throughput knob),
    takes up to ``max_batch`` rows, pads the tail request to the static
    shape, runs ``fn`` once, and scatters the slices back. With a
    polymorphic-batch artifact (``max_batch=None``) padding is skipped.

    ``buckets`` (sorted ascending, max == ``max_batch``) trades a few
    extra compiles for low-load latency: each dispatch pads only to the
    SMALLEST bucket that fits its rows instead of always to ``max_batch``
    — a lone 8-row request rides a batch-8 program, not a 7/8-padding
    batch-64 one. TPU-idiomatic dynamic batching: still a handful of
    static shapes (jit specializes per bucket), never per-request shapes.
    """

    def __init__(self, fn, max_batch: Optional[int], canvas: int,
                 channels: int, max_delay_ms: float = 5.0,
                 buckets: Optional[list[int]] = None,
                 max_queue_rows: Optional[int] = None,
                 deadline_ms: Optional[float] = None):
        self._fn = fn
        self.max_batch = max_batch
        # Backpressure (VERDICT r3 next-7): without a queue bound, a stalled
        # device grows the queue without limit; without a deadline, every
        # waiting handler thread blocks forever. ``max_queue_rows`` rejects
        # at submit time (QueueFullError -> HTTP 429, bounding memory);
        # ``deadline_ms`` is a per-request END-TO-END budget — expired
        # requests are purged from the queue before wasting device time,
        # and a submit whose rows never come back in time raises
        # DeadlineExceededError (-> HTTP 504) instead of hanging.
        self.max_queue_rows = max_queue_rows
        self._deadline = None if deadline_ms is None else deadline_ms / 1e3
        if buckets is not None:
            buckets = sorted(set(int(b) for b in buckets))
            if not buckets or any(b < 1 for b in buckets):
                raise ValueError(f"bad batch buckets {buckets}")
            if max_batch is None:
                raise ValueError("buckets need a static max_batch")
            if buckets[-1] != max_batch:
                raise ValueError(
                    f"largest bucket {buckets[-1]} must equal the compiled "
                    f"max batch {max_batch}")
        self.buckets = buckets
        self._shape = (canvas, canvas, channels)
        self._delay = max_delay_ms / 1e3
        self._cv = threading.Condition()
        self._queue: list[dict[str, Any]] = []
        self._closed = False
        # Serving observability: dispatch counts, batch fill, and a ring of
        # recent per-dispatch wall times (device time incl. padding waste).
        self._stats_lock = threading.Lock()
        self._n_requests = 0
        self._n_rows = 0
        self._n_dispatches = 0
        self._rows_dispatched = 0
        self._rows_padded = 0  # sum of dispatched (bucket) batch sizes
        self._rejected_full = 0
        self._deadline_expired = 0
        self._dispatch_ms: list[float] = []  # ring, newest last
        self._worker = threading.Thread(target=self._run, daemon=True)
        self._worker.start()

    def stats(self) -> dict:
        """Counters + latency percentiles over the recent-dispatch ring."""
        with self._stats_lock:
            lat = sorted(self._dispatch_ms)
            n = len(lat)
            pct = (lambda q: round(lat[min(n - 1, int(q * n))], 2)) if n \
                else (lambda q: None)
            fill = (self._rows_dispatched / self._rows_padded
                    if self._rows_padded and self.max_batch else None)
            return {
                "requests": self._n_requests,
                "rows": self._n_rows,
                "dispatches": self._n_dispatches,
                "mean_batch_fill": round(fill, 3) if fill is not None else None,
                "dispatch_ms_p50": pct(0.50),
                "dispatch_ms_p99": pct(0.99),
                "queue_depth": len(self._queue),
                "rejected_full": self._rejected_full,
                "deadline_expired": self._deadline_expired,
            }

    def submit(self, imgs: np.ndarray) -> np.ndarray:
        if imgs.ndim != 4 or imgs.shape[1:] != self._shape:
            raise ValueError(
                f"expected (n, {', '.join(map(str, self._shape))}) uint8, "
                f"got {imgs.shape}")
        if imgs.dtype != np.uint8:
            raise ValueError(f"expected uint8 input, got {imgs.dtype}")
        if len(imgs) == 0:
            # Never let a zero-row request reach the device: it would still
            # dispatch a fully-padded batch (pure padding waste).
            raise ValueError("empty batch: need at least one row")
        out: list[Optional[np.ndarray]] = []
        done = threading.Event()
        chunk = self.max_batch or len(imgs)
        parts = [imgs[i:i + chunk] for i in range(0, len(imgs), chunk)] or [imgs]
        deadline = (
            None if self._deadline is None
            else time.monotonic() + self._deadline
        )
        entries: list[dict[str, Any]] = []
        with self._cv:
            if self._closed:
                raise RuntimeError("batcher is closed")
            if self.max_queue_rows is not None:
                queued = sum(len(e["rows"]) for e in self._queue)
                if queued + len(imgs) > self.max_queue_rows:
                    with self._stats_lock:
                        self._rejected_full += 1
                    raise QueueFullError(
                        f"queue full: {queued} rows queued + {len(imgs)} "
                        f"requested > max_queue_rows={self.max_queue_rows}; "
                        f"retry later")
            with self._stats_lock:
                self._n_requests += 1
                self._n_rows += len(imgs)
            pending = len(parts)
            state = {"left": pending}
            for part in parts:
                out.append(None)

                def make_cb(slot):
                    def cb(result):
                        out[slot] = result
                        state["left"] -= 1
                        if state["left"] == 0:
                            done.set()
                    return cb

                entry = {"rows": part, "cb": make_cb(len(out) - 1),
                         "deadline": deadline}
                entries.append(entry)
                self._queue.append(entry)
            self._cv.notify()
        if deadline is None:
            done.wait()
        elif not done.wait(timeout=max(deadline - time.monotonic(), 0.0)):
            # End-to-end budget blown. Pull our still-queued entries so the
            # worker never wastes a dispatch on them; anything already in
            # flight will complete into `out`, which nobody reads.
            with self._cv:
                for entry in entries:
                    if entry in self._queue:
                        self._queue.remove(entry)
            with self._stats_lock:
                self._deadline_expired += 1
            raise DeadlineExceededError(
                f"request exceeded deadline_ms="
                f"{self._deadline * 1e3:.0f} before completing")
        for part in out:
            if isinstance(part, Exception):
                raise part
        return np.concatenate(out, axis=0)

    def close(self):
        with self._cv:
            self._closed = True
            self._cv.notify()
        self._worker.join(timeout=5)

    def _run(self):
        while True:
            with self._cv:
                while not self._queue and not self._closed:
                    self._cv.wait()
                if self._closed and not self._queue:
                    return
                # Purge already-expired requests before spending device time
                # on them; their waiters get the deadline error via cb.
                if self._deadline is not None:
                    now = time.monotonic()
                    expired = [
                        e for e in self._queue
                        if e["deadline"] is not None and e["deadline"] <= now
                    ]
                    for e in expired:
                        self._queue.remove(e)
                    if expired:
                        with self._stats_lock:
                            self._deadline_expired += len(expired)
                        for e in expired:
                            e["cb"](DeadlineExceededError(
                                "request expired in queue (deadline_ms="
                                f"{self._deadline * 1e3:.0f})"))
                    if not self._queue:
                        continue
                # Brief coalescing window: let concurrent handlers enqueue.
                if self._delay > 0 and self.max_batch:
                    deadline = time.monotonic() + self._delay
                    while (sum(len(e["rows"]) for e in self._queue)
                           < self.max_batch and not self._closed):
                        left = deadline - time.monotonic()
                        if left <= 0:
                            break
                        self._cv.wait(timeout=left)
                batch, used = [], []
                budget = self.max_batch or sum(
                    len(e["rows"]) for e in self._queue)
                while self._queue and budget >= len(self._queue[0]["rows"]):
                    e = self._queue.pop(0)
                    budget -= len(e["rows"])
                    batch.append(e["rows"])
                    used.append(e)
                if not batch:  # head larger than budget cannot happen
                    # (submit() chunks to max_batch), but stay safe
                    e = self._queue.pop(0)
                    batch, used = [e["rows"]], [e]
            rows = np.concatenate(batch, axis=0)
            n = len(rows)
            target = self.max_batch
            if target and self.buckets:
                target = next(b for b in self.buckets if b >= n)
            if target and n < target:
                pad = np.zeros((target - n, *rows.shape[1:]), rows.dtype)
                rows = np.concatenate([rows, pad], axis=0)
            t0 = time.monotonic()
            try:
                result = self._fn(rows)[:n]
                with self._stats_lock:
                    self._n_dispatches += 1
                    self._rows_dispatched += n
                    self._rows_padded += target or n
                    self._dispatch_ms.append((time.monotonic() - t0) * 1e3)
                    if len(self._dispatch_ms) > 512:
                        del self._dispatch_ms[:-512]
            except Exception as e:  # deliver the failure to the waiters
                for entry in used:
                    entry["cb"](e)
                continue
            off = 0
            for entry in used:
                entry["cb"](result[off:off + len(entry["rows"])])
                off += len(entry["rows"])
