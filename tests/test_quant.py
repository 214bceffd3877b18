"""Weight-only int8 quantization (quant.py + serve/export integration).

Beyond-reference serving capability: matmul kernels stored int8 with
per-output-channel scales, dequantized inside the jitted forward. Pins the
round-trip error bound, which leaves are (not) quantized, output fidelity
on a real model, and the 4x artifact-size win.
"""

import json
import os

import numpy as np
import pytest

import jax


def _tree_paths(tree, prefix=""):
    if isinstance(tree, dict):
        for k, v in tree.items():
            yield from _tree_paths(v, f"{prefix}{k}/")
    else:
        yield prefix[:-1], tree


class TestQuantizeParams:
    def test_roundtrip_error_bounded_per_channel(self):
        from cross_scale_mae_tpu.quant import (
            dequantize_params,
            quantize_params_int8,
        )

        rng = np.random.default_rng(0)
        w = rng.normal(size=(64, 32)).astype(np.float32) * np.geomspace(
            0.01, 10.0, 32)  # widely varying per-channel magnitudes
        params = {"mlp": {"kernel": w, "bias": np.zeros(32, np.float32)}}
        q = quantize_params_int8(params)
        assert q["mlp"]["kernel"]["__int8__"].dtype == np.int8
        assert q["mlp"]["kernel"]["scale"].shape == (1, 32)
        back = np.asarray(dequantize_params(q)["mlp"]["kernel"])
        # Symmetric rounding: |err| <= scale/2 per channel, NOT global —
        # the small channels must not inherit the big channels' step.
        step = np.max(np.abs(w), axis=0) / 127.0
        assert (np.abs(back - w) <= step / 2 + 1e-7).all()
        # Bias untouched.
        assert isinstance(q["mlp"]["bias"], np.ndarray)

    def test_only_kernels_quantized(self):
        from cross_scale_mae_tpu.configs import get_mae_config
        from cross_scale_mae_tpu.models import mae_init
        from cross_scale_mae_tpu.quant import quantize_params_int8

        cfg = get_mae_config("mae_vit_tiny", input_size=16, patch_size=8,
                             compute_dtype="float32")
        params, _ = mae_init(jax.random.key(0), cfg)
        q = quantize_params_int8(params)
        quantized, kept = set(), set()
        for path, leaf in _tree_paths(q):
            if path.endswith("__int8__"):
                quantized.add(path.rsplit("/", 2)[0])
            elif not path.endswith("scale"):
                kept.add(path)
        # Every 2D+ kernel went int8; embeddings/biases/norms stayed.
        assert any("patch_embed" in p for p in quantized)
        assert any("qkv" in p for p in quantized)
        # (sin-cos pos tables are trace-time constants, not params)
        assert "cls_token" in kept and "mask_token" in kept
        assert not any(p.endswith("bias") for p in quantized)

    def test_stacked_kernels_get_per_layer_scales(self):
        from cross_scale_mae_tpu.quant import quantize_params_int8

        w = np.random.default_rng(1).normal(size=(4, 16, 8)).astype(
            np.float32)
        q = quantize_params_int8({"blocks": {"fc1": {"kernel": w}}})
        assert q["blocks"]["fc1"]["kernel"]["scale"].shape == (4, 1, 8)

    def test_model_outputs_close_to_fp(self):
        from cross_scale_mae_tpu.configs import get_mae_config
        from cross_scale_mae_tpu.models import mae_encode, mae_init
        from cross_scale_mae_tpu.quant import (
            dequantize_params,
            quantize_params_int8,
        )

        cfg = get_mae_config("mae_vit_tiny", input_size=16, patch_size=8,
                             compute_dtype="float32")
        params, _ = mae_init(jax.random.key(0), cfg)
        imgs = jax.numpy.asarray(np.random.default_rng(2).normal(
            size=(2, 16, 16, 3)).astype(np.float32))
        fp = np.asarray(mae_encode(params, cfg, imgs)).reshape(2, -1)
        qp = dequantize_params(quantize_params_int8(params), "float32")
        qt = np.asarray(mae_encode(qp, cfg, imgs)).reshape(2, -1)
        cos = (fp * qt).sum(-1) / (
            np.linalg.norm(fp, axis=-1) * np.linalg.norm(qt, axis=-1))
        assert cos.min() > 0.999, cos


@pytest.mark.slow
class TestQuantIntegration:
    @pytest.fixture(scope="class")
    def tiny_ckpt(self, tmp_path_factory):
        from cross_scale_mae_tpu.cli import pretrain

        out = str(tmp_path_factory.mktemp("quant") / "pt")
        res = pretrain.main(pretrain.get_args_parser().parse_args([
            "--model", "mae_vit_tiny", "--dataset_type", "synthetic",
            "--synthetic_len", "32", "--input_size", "16",
            "--patch_size", "8", "--batch_size", "16", "--epochs", "1",
            "--warmup_epochs", "0", "--ckpt_interval", "1",
            "--output_dir", out, "--compute_dtype", "float32",
            "--log_interval", "2",
        ]))
        return os.path.join(res["output_dir"], "checkpoints")

    def test_export_quantized_artifact(self, tiny_ckpt, tmp_path):
        from cross_scale_mae_tpu.cli import export as export_cli

        fp_out = str(tmp_path / "fp.stablehlo")
        q_out = str(tmp_path / "q8.stablehlo")
        base = ["--ckpt", tiny_ckpt, "--pool", "mean", "--batch_size", "4"]
        m_fp = export_cli.main(export_cli.get_args_parser().parse_args(
            base + ["--output", fp_out]))
        m_q = export_cli.main(export_cli.get_args_parser().parse_args(
            base + ["--output", q_out, "--quantize", "int8"]))
        assert m_q["verified"] == "roundtrip"
        assert m_q["quantize"]["cosine_vs_fp_min"] > 0.999
        # The weights ship as int8 codes: total deployment payload
        # (module + .q8.npz sidecar) shrinks toward 1/4 of the fp-baked
        # artifact. A trace-time constant-folding regression would inflate
        # this right back to ~1x.
        sidecar = m_q["weights"]
        assert sidecar.endswith(".q8.npz") and os.path.exists(sidecar)
        total = m_q["bytes"] + os.path.getsize(sidecar)
        assert total < 0.45 * m_fp["bytes"], (total, m_fp["bytes"])
        # --quantize already implies the sidecar form.
        with pytest.raises(SystemExit, match="sidecar"):
            export_cli.main(export_cli.get_args_parser().parse_args(
                base + ["--output", q_out, "--quantize", "int8",
                        "--no_bake_weights"]))

        # The quantized artifact is servable (load_artifact wires the
        # sidecar tree back into the module's (qparams, imgs) signature).
        from cross_scale_mae_tpu.serving import load_artifact

        model = load_artifact(q_out)
        imgs = np.random.default_rng(5).integers(
            0, 256, (4, model.canvas, model.canvas, 3), np.uint8)
        out = model.fn(imgs)
        assert out.shape[0] == 4 and np.isfinite(out).all()

    def test_quantized_classifier_keeps_argmax(self, tiny_ckpt, tmp_path):
        """Classifier checkpoints quantize too (head kernel int8, BN-head
        stats fp); predicted classes must survive weight-only int8."""
        from cross_scale_mae_tpu.cli import export as export_cli
        from cross_scale_mae_tpu.cli import finetune
        from cross_scale_mae_tpu.serving import (
            build_serving_model,
            load_artifact,
        )

        out = str(tmp_path / "ft")
        res = finetune.main(finetune.get_args_parser().parse_args([
            "--model", "vit_base_patch16", "--embed_dim", "128",
            "--depth", "4", "--num_heads", "8", "--input_size", "16",
            "--patch_size", "8", "--finetune", tiny_ckpt,
            "--dataset_type", "synthetic", "--synthetic_len", "32",
            "--nb_classes", "3", "--batch_size", "16", "--epochs", "1",
            "--warmup_epochs", "0", "--output_dir", out,
            "--compute_dtype", "float32", "--log_interval", "2",
        ]))
        ck = os.path.join(res["output_dir"], "checkpoints")
        art = str(tmp_path / "cls_q8.stablehlo")
        meta = export_cli.main(export_cli.get_args_parser().parse_args(
            ["--ckpt", ck, "--output", art, "--batch_size", "4",
             "--quantize", "int8"]))
        assert meta["kind"] == "classifier"
        assert meta["verified"] == "roundtrip"
        model = load_artifact(art)
        fp = build_serving_model(ck, batch_size=4)
        imgs = np.random.default_rng(6).integers(
            0, 256, (4, model.canvas, model.canvas, 3), np.uint8)
        lq = model.fn(imgs)
        lf = fp.fn(imgs)
        assert lq.shape == (4, 3)
        np.testing.assert_array_equal(lq.argmax(-1), lf.argmax(-1))

    def test_serve_quantized_matches_fp(self, tiny_ckpt):
        from cross_scale_mae_tpu.serving import build_serving_model

        fp = build_serving_model(tiny_ckpt, pool="mean", batch_size=4)
        q8 = build_serving_model(tiny_ckpt, pool="mean", batch_size=4,
                                 quantize="int8")
        assert q8.meta["quantize"]["scheme"] == "int8_weight_only"
        assert (q8.meta["quantize"]["bytes"]
                < 0.5 * q8.meta["quantize"]["fp32_bytes"])
        imgs = np.random.default_rng(4).integers(
            0, 256, (4, fp.canvas, fp.canvas, 3), np.uint8)
        a = fp.fn(imgs).reshape(4, -1)
        b = q8.fn(imgs).reshape(4, -1)
        cos = (a * b).sum(-1) / (
            np.linalg.norm(a, axis=-1) * np.linalg.norm(b, axis=-1))
        assert cos.min() > 0.999
