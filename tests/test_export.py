"""Serving-export CLI: checkpoint -> StableHLO artifact -> reload parity.

The reference has no serving path at all (SURVEY.md §3.4); this pins the
TPU-native one: exported modules must roundtrip through serialize/
deserialize and reproduce the in-process encoder on raw uint8 input, for
both baked-weights and sidecar-params forms, plus the polymorphic-batch
variant.
"""

import os

import numpy as np
import pytest


@pytest.fixture(scope="module")
def tiny_ckpt(tmp_path_factory):
    from cross_scale_mae_tpu.cli import pretrain

    out = str(tmp_path_factory.mktemp("export") / "pt")
    args = pretrain.get_args_parser().parse_args([
        "--model", "mae_vit_tiny", "--dataset_type", "synthetic",
        "--synthetic_len", "32", "--input_size", "16", "--patch_size", "8",
        "--batch_size", "16", "--epochs", "1", "--warmup_epochs", "0",
        "--ckpt_interval", "1", "--output_dir", out,
        "--compute_dtype", "float32", "--log_interval", "2",
    ])
    res = pretrain.main(args)
    return os.path.join(res["output_dir"], "checkpoints")


@pytest.mark.slow
@pytest.mark.parametrize("mode", ["baked", "sidecar", "symbolic"])
def test_export_roundtrip(tiny_ckpt, tmp_path, mode):
    from cross_scale_mae_tpu.cli import export as export_cli

    out = str(tmp_path / f"enc_{mode}.stablehlo")
    argv = ["--ckpt", tiny_ckpt, "--output", out, "--pool", "mean",
            "--batch_size", "4"]
    if mode == "sidecar":
        argv.append("--no_bake_weights")
    if mode == "symbolic":
        argv.append("--symbolic_batch")
    meta = export_cli.main(export_cli.get_args_parser().parse_args(argv))
    # main() already asserts reload-vs-inprocess parity; check artifacts.
    assert os.path.exists(out) and meta["bytes"] > 0
    assert os.path.exists(out + ".json")
    assert meta["verified"] == "roundtrip"
    # Eval-pipeline parity: the input spec is the eval canvas, so the
    # center-crop branch of make_eval_preprocess is live in the module.
    assert meta["input"][1] == int(round(16 / 0.875))
    if mode == "sidecar":
        sidecar = np.load(out + ".params.npz")
        assert len(sidecar.files) > 5


@pytest.mark.slow
def test_symbolic_batch_serves_multiple_sizes(tiny_ckpt, tmp_path):
    from jax import export as jexport

    import jax.numpy as jnp

    from cross_scale_mae_tpu.cli import export as export_cli

    out = str(tmp_path / "poly.stablehlo")
    export_cli.main(export_cli.get_args_parser().parse_args([
        "--ckpt", tiny_ckpt, "--output", out, "--symbolic_batch",
    ]))
    reloaded = jexport.deserialize(open(out, "rb").read())
    rng = np.random.default_rng(1)
    canvas = int(round(16 / 0.875))  # eval-canvas input spec (export.py)
    for b in (1, 3, 8):
        imgs = rng.integers(0, 256, (b, canvas, canvas, 3), np.uint8)
        feats = reloaded.call(jnp.asarray(imgs))
        assert np.asarray(feats).shape[0] == b
        assert np.isfinite(np.asarray(feats)).all()


@pytest.fixture(scope="module")
def tiny_cls_ckpt(tiny_ckpt, tmp_path_factory):
    """A finetuned-classifier checkpoint derived from the MAE fixture."""
    from cross_scale_mae_tpu.cli import finetune

    out = str(tmp_path_factory.mktemp("export") / "ft")
    args = finetune.get_args_parser().parse_args([
        "--model", "vit_base_patch16", "--embed_dim", "128", "--depth", "4",
        "--num_heads", "8", "--input_size", "16", "--patch_size", "8",
        "--finetune", tiny_ckpt, "--dataset_type", "synthetic",
        "--synthetic_len", "32", "--nb_classes", "3", "--batch_size", "16",
        "--epochs", "1", "--warmup_epochs", "0", "--output_dir", out,
        "--compute_dtype", "float32", "--log_interval", "2",
    ])
    res = finetune.main(args)
    return os.path.join(res["output_dir"], "checkpoints")


@pytest.mark.slow
def test_export_classifier_logits(tiny_cls_ckpt, tmp_path):
    """A finetune checkpoint auto-detects as kind=classifier and exports a
    logits artifact (uint8 canvas -> eval preprocess -> ViT -> nb_classes),
    roundtrip-verified against the in-process forward."""
    from cross_scale_mae_tpu.cli import export as export_cli

    out = str(tmp_path / "cls.stablehlo")
    meta = export_cli.main(export_cli.get_args_parser().parse_args(
        ["--ckpt", tiny_cls_ckpt, "--output", out, "--batch_size", "4"]
    ))
    assert meta["kind"] == "classifier"
    assert meta["verified"] == "roundtrip"
    assert meta["output_dim"] == 3  # class logits, not features


@pytest.mark.slow
def test_restore_on_different_device_count(tiny_ckpt):
    """Serving topology != training topology: a checkpoint written on the
    8-device conftest mesh must open in a 1-device process. Template-less
    StandardRestore used to rebuild the SAVED shardings and raise
    'available devices are different'; restore_arrays_host restores to
    host numpy instead (utils/checkpoint.py)."""
    import subprocess
    import sys

    code = (
        "import os, sys\n"
        "os.environ['XLA_FLAGS'] = "
        "'--xla_force_host_platform_device_count=1'\n"
        "import jax\n"
        "jax.config.update('jax_platforms', 'cpu')\n"
        "assert jax.device_count() == 1\n"
        "from cross_scale_mae_tpu.viz import prepare_model\n"
        "params, state, cfg = prepare_model(sys.argv[1])\n"
        "print('RESTORED', cfg.dim_model)\n"
    )
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = ""
    out = subprocess.run(
        [sys.executable, "-c", code, tiny_ckpt],
        capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        env=env,
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "RESTORED" in out.stdout
