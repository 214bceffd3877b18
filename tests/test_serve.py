"""Online inference server (cli/serve.py + serving.py).

The reference has no serving surface (SURVEY.md §3.4); these tests pin
ours: the HTTP server answers from the same graph the export path lowers,
the micro-batcher coalesces concurrent requests into one static-batch
dispatch, and malformed input fails with a 4xx instead of a crash.
"""

import io
import json
import threading
import urllib.request

import numpy as np
import pytest


# ---------------------------------------------------------------- batcher

class TestMicroBatcher:
    def _make(self, max_batch=8, delay=30.0):
        from cross_scale_mae_tpu.serving import MicroBatcher

        calls = []

        def fn(rows):
            calls.append(len(rows))
            return rows[..., 0, 0, 0].astype(np.float32) * 2.0

        return MicroBatcher(fn, max_batch, 4, 3, max_delay_ms=delay), calls

    def test_coalesces_concurrent_requests(self):
        b, calls = self._make()
        outs = {}

        def post(i):
            imgs = np.full((2, 4, 4, 3), i, np.uint8)
            outs[i] = b.submit(imgs)

        threads = [threading.Thread(target=post, args=(i,)) for i in (1, 2, 3)]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
        b.close()
        # All three landed, each with its own rows (no cross-request mixing).
        for i in (1, 2, 3):
            np.testing.assert_allclose(outs[i], np.full(2, 2.0 * i))
        # Coalescing actually happened: fewer dispatches than requests
        # (each dispatch is padded to the static max_batch=8).
        assert len(calls) < 3 and all(c == 8 for c in calls)

    def test_buckets_dispatch_smallest_fitting(self):
        # --batch_buckets semantics: a dispatch pads to the SMALLEST
        # compiled bucket that fits its rows, not always to max_batch.
        from cross_scale_mae_tpu.serving import MicroBatcher

        calls = []

        def fn(rows):
            calls.append(len(rows))
            return rows[..., 0, 0, 0].astype(np.float32) * 2.0

        b = MicroBatcher(fn, 8, 4, 3, max_delay_ms=0.0, buckets=[2, 4, 8])
        one = b.submit(np.full((1, 4, 4, 3), 5, np.uint8))
        np.testing.assert_allclose(one, [10.0])
        assert calls[-1] == 2  # 1 row -> bucket 2, not 8
        three = b.submit(np.full((3, 4, 4, 3), 7, np.uint8))
        np.testing.assert_allclose(three, np.full(3, 14.0))
        assert calls[-1] == 4  # 3 rows -> bucket 4
        stats = b.stats()
        b.close()
        # fill accounting uses the PADDED bucket sizes: (1+3)/(2+4)
        np.testing.assert_allclose(stats["mean_batch_fill"], 4 / 6, atol=1e-3)

    def test_bucket_validation(self):
        from cross_scale_mae_tpu.serving import MicroBatcher

        with pytest.raises(ValueError, match="must equal"):
            MicroBatcher(lambda r: r, 8, 4, 3, buckets=[2, 4])
        with pytest.raises(ValueError, match="max_batch"):
            MicroBatcher(lambda r: r, None, 4, 3, buckets=[2, 4])

    def test_oversize_request_is_chunked(self):
        b, calls = self._make(max_batch=4, delay=0.0)
        imgs = np.arange(10, dtype=np.uint8).repeat(4 * 4 * 3).reshape(
            10, 4, 4, 3)
        out = b.submit(imgs)
        b.close()
        np.testing.assert_allclose(out, imgs[:, 0, 0, 0] * 2.0)
        assert sum(calls) >= 10  # 3 padded dispatches of 4

    def test_bad_shape_rejected(self):
        b, _ = self._make()
        with pytest.raises(ValueError, match="expected"):
            b.submit(np.zeros((2, 5, 5, 3), np.uint8))
        with pytest.raises(ValueError, match="uint8"):
            b.submit(np.zeros((2, 4, 4, 3), np.float32))
        # Zero rows must not reach the device (it would dispatch a fully
        # padded batch); rejected like any other bad input -> HTTP 400.
        with pytest.raises(ValueError, match="empty batch"):
            b.submit(np.zeros((0, 4, 4, 3), np.uint8))
        b.close()

    def test_fn_failure_propagates_to_caller(self):
        from cross_scale_mae_tpu.serving import MicroBatcher

        def fn(rows):
            raise RuntimeError("device fell over")

        b = MicroBatcher(fn, 4, 4, 3, max_delay_ms=0.0)
        with pytest.raises(RuntimeError, match="fell over"):
            b.submit(np.zeros((2, 4, 4, 3), np.uint8))
        b.close()

    def test_overload_bounded_queue_rejects_429(self):
        """A stalled device must NOT grow the queue without limit: once
        max_queue_rows is reached, submit fails fast with QueueFullError
        and the queued-row count stays bounded (VERDICT r3 next-7)."""
        from cross_scale_mae_tpu.serving import MicroBatcher, QueueFullError

        release = threading.Event()

        def stalled_fn(rows):
            release.wait(timeout=30)
            return rows[..., 0, 0, 0].astype(np.float32)

        b = MicroBatcher(stalled_fn, 4, 4, 3, max_delay_ms=0.0,
                         max_queue_rows=8)
        # First request occupies the device (worker pops it off the queue
        # and blocks inside fn); give it a moment to get there.
        t0 = threading.Thread(
            target=lambda: b.submit(np.zeros((4, 4, 4, 3), np.uint8)))
        t0.start()
        deadline = __import__("time").monotonic() + 5
        while b.stats()["queue_depth"] > 0:
            assert __import__("time").monotonic() < deadline
        # Fill the queue to the bound with background waiters.
        waiters = []
        for _ in range(2):
            t = threading.Thread(
                target=lambda: b.submit(np.zeros((4, 4, 4, 3), np.uint8)))
            t.start()
            waiters.append(t)
        deadline = __import__("time").monotonic() + 5
        while b.stats()["queue_depth"] < 2:
            assert __import__("time").monotonic() < deadline
        # Queue is at 8 rows: the next request must be rejected, not queued.
        with pytest.raises(QueueFullError):
            b.submit(np.zeros((1, 4, 4, 3), np.uint8))
        stats = b.stats()
        assert stats["rejected_full"] == 1
        assert stats["queue_depth"] * 4 <= 8  # bounded memory
        release.set()
        t0.join(timeout=10)
        for t in waiters:
            t.join(timeout=10)
        b.close()

    def test_deadline_expired_raises_504_error(self):
        """A request that cannot be answered inside deadline_ms raises
        DeadlineExceededError instead of blocking the handler forever."""
        import time as _time

        from cross_scale_mae_tpu.serving import (
            DeadlineExceededError,
            MicroBatcher,
        )

        release = threading.Event()

        def slow_fn(rows):
            release.wait(timeout=30)
            return rows[..., 0, 0, 0].astype(np.float32)

        b = MicroBatcher(slow_fn, 4, 4, 3, max_delay_ms=0.0,
                         deadline_ms=150.0)
        # Occupy the device so the second request waits in the queue.
        t0 = threading.Thread(
            target=lambda: b.submit(np.zeros((4, 4, 4, 3), np.uint8)))
        t0.start()
        _time.sleep(0.05)
        start = _time.monotonic()
        with pytest.raises(DeadlineExceededError):
            b.submit(np.zeros((2, 4, 4, 3), np.uint8))
        elapsed = _time.monotonic() - start
        assert elapsed < 5.0, "deadline did not bound the wait"
        assert b.stats()["deadline_expired"] >= 1
        # The expired entry was purged: nothing left in the queue.
        release.set()
        t0.join(timeout=10)
        assert b.stats()["queue_depth"] == 0
        b.close()

    def test_deadline_not_hit_on_fast_path(self):
        from cross_scale_mae_tpu.serving import MicroBatcher

        b = MicroBatcher(
            lambda rows: rows[..., 0, 0, 0].astype(np.float32),
            4, 4, 3, max_delay_ms=0.0, deadline_ms=10_000.0,
            max_queue_rows=64,
        )
        out = b.submit(np.zeros((3, 4, 4, 3), np.uint8))
        assert out.shape == (3,)
        stats = b.stats()
        assert stats["deadline_expired"] == 0 and stats["rejected_full"] == 0
        b.close()


# ------------------------------------------------------------ HTTP server

@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    from cross_scale_mae_tpu.cli import pretrain

    out = str(tmp_path_factory.mktemp("serve") / "pt")
    args = pretrain.get_args_parser().parse_args([
        "--model", "mae_vit_tiny", "--dataset_type", "synthetic",
        "--synthetic_len", "32", "--input_size", "16", "--patch_size", "8",
        "--batch_size", "16", "--epochs", "1", "--warmup_epochs", "0",
        "--ckpt_interval", "1", "--output_dir", out,
        "--compute_dtype", "float32", "--log_interval", "2",
    ])
    res = pretrain.main(args)
    import os

    return os.path.join(res["output_dir"], "checkpoints")


@pytest.fixture()
def served(tiny_ckpt):
    from cross_scale_mae_tpu.cli import serve

    args = serve.get_args_parser().parse_args([
        "--ckpt", tiny_ckpt, "--pool", "mean", "--batch_size", "4",
        "--port", "0", "--max_delay_ms", "2",
    ])
    server, batcher = serve.build_app(args)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    yield base
    server.shutdown()
    batcher.close()
    server.server_close()


def _post(url, body, headers=None):
    req = urllib.request.Request(url, data=body, method="POST",
                                 headers=headers or {})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, r.read(), r.headers.get("Content-Type")
    except urllib.error.HTTPError as e:
        return e.code, e.read(), e.headers.get("Content-Type")


def test_http_backpressure_429_and_deadline_504():
    """End-to-end overload behavior through the real HTTP stack: a stalled
    model makes the server answer 429 (queue full, Retry-After set) and 504
    (deadline) instead of hanging handlers / growing memory."""
    import time as _time

    from cross_scale_mae_tpu.cli import serve
    from cross_scale_mae_tpu.serving import ServingModel

    release = threading.Event()

    def stalled_fn(rows):
        release.wait(timeout=30)
        return rows[..., 0, 0, 0].astype(np.float32)

    model = ServingModel(stalled_fn, 4, 3, 4, "mae", {})
    args = serve.get_args_parser().parse_args([
        "--ckpt", "unused", "--batch_size", "4", "--port", "0",
        "--max_delay_ms", "0", "--no_warmup",
        "--max_queue_rows", "4", "--deadline_ms", "400",
    ])
    server, batcher = serve.build_app(args, model=model)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    base = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        def npy(n):
            buf = io.BytesIO()
            np.save(buf, np.zeros((n, 4, 4, 3), np.uint8))
            return buf.getvalue()

        # Request 1 occupies the device; request 2 fills the queue. Both
        # will end in 504 (the model never answers inside the deadline).
        results = {}

        def post_bg(key, n):
            results[key] = _post(base + "/predict", npy(n))

        t1 = threading.Thread(target=post_bg, args=("first", 4))
        t1.start()
        deadline = _time.monotonic() + 5
        while batcher.stats()["dispatches"] == 0 and batcher.stats()[
                "queue_depth"] == 0 and _time.monotonic() < deadline:
            _time.sleep(0.01)
        t2 = threading.Thread(target=post_bg, args=("second", 4))
        t2.start()
        deadline = _time.monotonic() + 5
        while batcher.stats()["queue_depth"] < 1 \
                and _time.monotonic() < deadline:
            _time.sleep(0.01)

        # Queue is at max_queue_rows: an immediate third request gets 429.
        code, body, _ = _post(base + "/predict", npy(1))
        assert code == 429, (code, body)
        assert b"queue full" in body

        # The queued request times out with 504 inside its 400 ms budget.
        t2.join(timeout=10)
        assert results["second"][0] == 504, results["second"]
        release.set()
        t1.join(timeout=10)
        # The in-flight request either completed (200) or also hit the
        # deadline first (504) depending on scheduling; both are bounded.
        assert results["first"][0] in (200, 504)
        stats = json.loads(
            urllib.request.urlopen(base + "/stats").read())
        assert stats["rejected_full"] >= 1
        assert stats["deadline_expired"] >= 1
    finally:
        release.set()
        server.shutdown()
        batcher.close()
        server.server_close()


@pytest.mark.slow
class TestServeHTTP:
    def test_healthz_info_predict_roundtrip(self, served, tiny_ckpt):
        with urllib.request.urlopen(served + "/healthz") as r:
            h = json.loads(r.read())
        assert h["ok"] and h["warm"] and h["kind"] == "mae"
        with urllib.request.urlopen(served + "/info") as r:
            info = json.loads(r.read())
        canvas = info["input"][1]
        assert canvas == int(round(16 / 0.875))

        rng = np.random.default_rng(0)
        imgs = rng.integers(0, 256, (3, canvas, canvas, 3), np.uint8)
        buf = io.BytesIO()
        np.save(buf, imgs)
        code, body, ctype = _post(served + "/predict", buf.getvalue())
        assert code == 200 and ctype == "application/octet-stream"
        out = np.load(io.BytesIO(body))
        assert out.shape[0] == 3 and np.isfinite(out).all()

        # The HTTP answer equals the in-process forward (same graph).
        from cross_scale_mae_tpu.serving import build_serving_model

        model = build_serving_model(tiny_ckpt, pool="mean", batch_size=4)
        want = model.fn(np.concatenate(
            [imgs, np.zeros((1, canvas, canvas, 3), np.uint8)]))[:3]
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)

        # JSON negotiation.
        code, body, ctype = _post(served + "/predict", buf.getvalue(),
                                  {"Accept": "application/json"})
        assert code == 200 and ctype == "application/json"
        assert np.allclose(np.asarray(json.loads(body)["output"]), out,
                           atol=1e-6)

        # Observability: the two predicts above are counted, with latency
        # percentiles from the dispatch ring.
        with urllib.request.urlopen(served + "/stats") as r:
            stats = json.loads(r.read())
        assert stats["requests"] >= 2 and stats["rows"] >= 6
        assert stats["dispatches"] >= 2
        assert stats["dispatch_ms_p50"] is not None
        assert 0 < stats["mean_batch_fill"] <= 1

    def test_predict_image_and_errors(self, served):
        from PIL import Image

        im = Image.fromarray(
            np.random.default_rng(1).integers(0, 256, (20, 20, 3), np.uint8))
        buf = io.BytesIO()
        im.save(buf, format="PNG")
        code, body, _ = _post(served + "/predict_image", buf.getvalue())
        assert code == 200
        out = json.loads(body)["output"]
        assert np.isfinite(np.asarray(out)).all()

        # Wrong shape -> 400 with a readable message, server stays up.
        bad = io.BytesIO()
        np.save(bad, np.zeros((2, 5, 5, 3), np.uint8))
        code, body, _ = _post(served + "/predict", bad.getvalue())
        assert code == 400 and b"expected" in body
        code, _, _ = _post(served + "/nope", b"")
        assert code == 404
        # Oversized body -> 413 before any buffering.
        code, body, _ = _post(served + "/predict", b"x",
                              {"Content-Length": str(10 * 1024 ** 3)})
        assert code == 413
        # Garbage/empty bodies -> 400, never a handler crash.
        for junk in (b"", b"garbage" * 10, b"\x93NUMPY corrupt"):
            code, _, _ = _post(served + "/predict", junk)
            assert code == 400, junk
            code, _, _ = _post(served + "/predict_image", junk)
            assert code == 400, junk
        with urllib.request.urlopen(served + "/healthz") as r:
            assert json.loads(r.read())["ok"]
        with urllib.request.urlopen(served + "/healthz") as r:
            assert json.loads(r.read())["ok"]


@pytest.mark.slow
def test_native_kernels_keeps_checkpoint_attention(tiny_ckpt, tmp_path):
    """portable=False keeps the checkpoint's attention implementation (the
    Pallas kernel on TPU); portable=True forces the XLA lowering. Same
    numerics either way (interpret-mode kernel on CPU)."""
    import json
    import shutil

    from cross_scale_mae_tpu.cli import serve
    from cross_scale_mae_tpu.serving import build_serving_model
    from cross_scale_mae_tpu.utils.checkpoint import latest_step

    ck = str(tmp_path / "ck")
    shutil.copytree(tiny_ckpt, ck)
    step = latest_step(ck)
    meta_path = f"{ck}/meta-{step}.json"
    meta = json.load(open(meta_path))
    meta["config"]["attention_impl"] = "pallas"
    json.dump(meta, open(meta_path, "w"))

    portable = build_serving_model(ck, pool="mean", batch_size=2)
    native = build_serving_model(ck, pool="mean", batch_size=2,
                                 portable=False)
    assert portable.meta["model_config"]["attention_impl"] == "xla"
    assert native.meta["model_config"]["attention_impl"] == "pallas"
    imgs = np.random.default_rng(3).integers(
        0, 256, (2, portable.canvas, portable.canvas, 3), np.uint8)
    np.testing.assert_allclose(portable.fn(imgs), native.fn(imgs),
                               rtol=1e-4, atol=1e-4)

    # --native_kernels is a checkpoint-serving knob; artifacts are fixed.
    args = serve.get_args_parser().parse_args(
        ["--artifact", "x.stablehlo", "--native_kernels"])
    with pytest.raises(SystemExit, match="native_kernels"):
        serve.build_app(args)


@pytest.mark.slow
def test_data_parallel_serving_matches_single_device(tiny_ckpt):
    """--data_parallel shards the compiled serving batch over the device
    mesh (8 virtual CPU devices here) with replicated params; answers must
    match the single-device program, fp and int8 alike."""
    import jax

    from cross_scale_mae_tpu.serving import build_serving_model

    n_dev = jax.device_count()
    assert n_dev >= 2, "conftest forces an 8-device CPU mesh"
    single = build_serving_model(tiny_ckpt, pool="mean", batch_size=n_dev * 2)
    dp = build_serving_model(tiny_ckpt, pool="mean", batch_size=n_dev * 2,
                             data_parallel=True)
    assert dp.meta["data_parallel"] == n_dev
    imgs = np.random.default_rng(5).integers(
        0, 256, (n_dev * 2, dp.canvas, dp.canvas, 3), np.uint8)
    np.testing.assert_allclose(dp.fn(imgs), single.fn(imgs),
                               rtol=1e-5, atol=1e-5)

    # int8 + data-parallel compose: same answers as single-device int8.
    q_single = build_serving_model(tiny_ckpt, pool="mean",
                                   batch_size=n_dev * 2, quantize="int8")
    q_dp = build_serving_model(tiny_ckpt, pool="mean", batch_size=n_dev * 2,
                               quantize="int8", data_parallel=True)
    np.testing.assert_allclose(q_dp.fn(imgs), q_single.fn(imgs),
                               rtol=1e-5, atol=1e-5)

    # Batch not divisible by the mesh is a loud config error.
    with pytest.raises(SystemExit, match="divisible"):
        build_serving_model(tiny_ckpt, pool="mean", batch_size=n_dev + 1,
                            data_parallel=True)

    # The artifact path's layout is fixed at export; flag combination is
    # rejected up front.
    from cross_scale_mae_tpu.cli import serve

    args = serve.get_args_parser().parse_args(
        ["--artifact", "x.stablehlo", "--data_parallel"])
    with pytest.raises(SystemExit, match="data_parallel"):
        serve.build_app(args)


@pytest.mark.slow
def test_serve_from_artifact_matches_checkpoint(tiny_ckpt, tmp_path):
    """--artifact serves the exported StableHLO module; answers must match
    the checkpoint-backed server bit-for-bit (same lowered graph)."""
    from cross_scale_mae_tpu.cli import export as export_cli
    from cross_scale_mae_tpu.cli import serve
    from cross_scale_mae_tpu.serving import build_serving_model

    art = str(tmp_path / "enc.stablehlo")
    export_cli.main(export_cli.get_args_parser().parse_args([
        "--ckpt", tiny_ckpt, "--output", art, "--pool", "mean",
        "--batch_size", "4"]))

    args = serve.get_args_parser().parse_args([
        "--artifact", art, "--port", "0", "--max_delay_ms", "0"])
    server, batcher = serve.build_app(args)
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        base = f"http://127.0.0.1:{server.server_address[1]}"
        with urllib.request.urlopen(base + "/info") as r:
            info = json.loads(r.read())
        assert info["source"] == "artifact"
        canvas = info["input"][1]
        imgs = np.random.default_rng(2).integers(
            0, 256, (2, canvas, canvas, 3), np.uint8)
        buf = io.BytesIO()
        np.save(buf, imgs)
        code, body, _ = _post(base + "/predict", buf.getvalue())
        assert code == 200
        got = np.load(io.BytesIO(body))
        model = build_serving_model(tiny_ckpt, pool="mean", batch_size=4)
        want = model.fn(np.concatenate(
            [imgs, np.zeros((2, canvas, canvas, 3), np.uint8)]))[:2]
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    finally:
        server.shutdown()
        batcher.close()
        server.server_close()
