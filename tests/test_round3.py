"""Round-3 regression tests for housekeeping fixes (VERDICT r2 / ADVICE r2):
flat_blocks numerical equivalence, the centralized scoped-VMEM budget
helper, and the perf gate's hardware guard."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_flat_blocks_matches_standard_path():
    """run_blocks_flat (models/layers.py) is an experimental layout that
    flattens (N, L, D) -> (N*L, D) between attention calls; it must be
    numerically identical to the standard path (it was measured slower and
    kept for evidence — but untested code in a core module rots)."""
    from cross_scale_mae_tpu.configs import get_mae_config
    from cross_scale_mae_tpu.models import mae_init
    from cross_scale_mae_tpu.models.mae import mae_forward_encoder

    base = get_mae_config(
        "mae_vit_tiny", input_size=16, patch_size=8, mask_ratio=0.0,
        compute_dtype="float32", attention_impl="xla",
    )
    flat = base.replace(flat_blocks=True)
    params, _ = mae_init(jax.random.key(0), base)
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 16, 16, 3)), jnp.float32
    )
    enc_a, _, _ = mae_forward_encoder(params, base, imgs, rng=jax.random.key(1))
    enc_b, _, _ = mae_forward_encoder(params, flat, imgs, rng=jax.random.key(1))
    np.testing.assert_allclose(
        np.asarray(enc_a), np.asarray(enc_b), atol=1e-5
    )


def test_flat_blocks_v3_matches_standard_path():
    """Round 5 wires the v3 natural-layout Pallas kernel onto the flat
    (N*L, D) carry (VERDICT r4 §weak-7: the two fastest paths were mutually
    exclusive). Numerics must match the standard v3 path exactly — only
    the layout around the kernel changes. (CPU: kernel in interpret mode.)"""
    from cross_scale_mae_tpu.configs import get_mae_config
    from cross_scale_mae_tpu.models import mae_init
    from cross_scale_mae_tpu.models.mae import mae_forward_encoder

    base = get_mae_config(
        "mae_vit_tiny", input_size=16, patch_size=8, mask_ratio=0.0,
        compute_dtype="float32", attention_impl="pallas_v3",
    )
    flat = base.replace(flat_blocks=True)
    params, _ = mae_init(jax.random.key(0), base)
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(2, 16, 16, 3)), jnp.float32
    )
    enc_a, _, _ = mae_forward_encoder(params, base, imgs, rng=jax.random.key(1))
    enc_b, _, _ = mae_forward_encoder(params, flat, imgs, rng=jax.random.key(1))
    np.testing.assert_allclose(np.asarray(enc_a), np.asarray(enc_b), atol=1e-5)


def test_flat_blocks_rejects_unsupported_attention():
    from cross_scale_mae_tpu.configs import get_mae_config
    from cross_scale_mae_tpu.models import mae_init
    from cross_scale_mae_tpu.models.mae import mae_forward_encoder

    cfg = get_mae_config(
        "mae_vit_tiny", input_size=16, patch_size=8,
        compute_dtype="float32", attention_impl="linformer",
    ).replace(flat_blocks=True)
    params, _ = mae_init(jax.random.key(0), cfg)
    imgs = jnp.zeros((2, 16, 16, 3), jnp.float32)
    with pytest.raises(NotImplementedError):
        mae_forward_encoder(params, cfg, imgs, rng=jax.random.key(1))


class TestScopedVmemHelper:
    def test_env_parsing_libtpu(self, monkeypatch):
        from cross_scale_mae_tpu import _parse_scoped_vmem_env

        monkeypatch.setenv("LIBTPU_INIT_ARGS",
                           "--xla_tpu_scoped_vmem_limit_kib=30000")
        assert _parse_scoped_vmem_env() == 30000

    def test_env_parsing_xla_flags_channel(self, monkeypatch):
        """ADVICE r2: a limit set through XLA_FLAGS must be seen too."""
        from cross_scale_mae_tpu import _parse_scoped_vmem_env

        monkeypatch.delenv("LIBTPU_INIT_ARGS", raising=False)
        monkeypatch.setenv("XLA_FLAGS",
                           "--foo --xla_tpu_scoped_vmem_limit_kib=20480")
        assert _parse_scoped_vmem_env() == 20480

    def test_env_parsing_absent(self, monkeypatch):
        from cross_scale_mae_tpu import _parse_scoped_vmem_env

        monkeypatch.delenv("LIBTPU_INIT_ARGS", raising=False)
        monkeypatch.delenv("XLA_FLAGS", raising=False)
        assert _parse_scoped_vmem_env() is None

    def test_group3_reads_helper(self):
        """_group3_for keys its budget off the package helper, and the
        helper reflects what package init actually decided."""
        import cross_scale_mae_tpu as pkg
        from cross_scale_mae_tpu.ops.attention import _group3_for

        assert pkg.scoped_vmem_limit_kib() in (16384, 24576) or (
            pkg.scoped_vmem_limit_kib() > 0
        )
        g = _group3_for(n=256, l=65, three_d=3 * 768, itemsize=2, bwd=True)
        assert g in (1, 2, 4, 8, 16, 32)


def test_perf_gate_skips_on_wrong_hardware(tmp_path):
    """check_regression must SKIP (rc 0, no bench run) when the local
    hardware doesn't match expected.json's recorded device kind/count
    (tests run on CPU, which never matches the recorded TPU)."""
    # sitecustomize pins the axon platform; force CPU via jax.config (the
    # env var alone is overridden — tests/conftest.py recipe).
    driver = (
        "import jax; jax.config.update('jax_platforms', 'cpu');"
        "import runpy, sys; sys.argv = ['check_regression.py'];"
        "runpy.run_path('benchmarks/check_regression.py', run_name='__main__')"
    )
    out = subprocess.run(
        [sys.executable, "-c", driver],
        capture_output=True, text=True, timeout=300, cwd=REPO,
        env=dict(os.environ),
    )
    assert out.returncode == 0, out.stdout + out.stderr
    assert "SKIP: hardware" in out.stdout


@pytest.mark.slow
def test_pretrain_val_img_path_recon_plots(tmp_path):
    """--val_img_path: user-chosen validation images drive the per-epoch
    reconstruction plots (main_pretrain.py:590-626)."""
    from PIL import Image

    from cross_scale_mae_tpu.cli import pretrain

    imgdir = tmp_path / "val_imgs"
    imgdir.mkdir()
    rng = np.random.default_rng(0)
    # Non-square image on purpose: prepare_image must square-resize it.
    for name, hw in (("a", (20, 20)), ("b", (16, 28))):
        Image.fromarray(
            rng.integers(0, 256, hw + (3,), np.uint8)
        ).save(imgdir / f"{name}.png")

    out = str(tmp_path / "pt")
    # --val_img_path alone implies plotting (no --plot_recon).
    args = pretrain.get_args_parser().parse_args([
        "--model", "mae_vit_tiny", "--dataset_type", "synthetic",
        "--synthetic_len", "32", "--input_size", "16", "--patch_size", "8",
        "--batch_size", "16", "--epochs", "1", "--warmup_epochs", "0",
        "--ckpt_interval", "1", "--output_dir", out,
        "--compute_dtype", "float32", "--log_interval", "2",
        "--val_img_path", str(imgdir),
    ])
    res = pretrain.main(args)
    recon = os.path.join(res["output_dir"], "reconstructions")
    files = sorted(os.listdir(recon))
    assert files == ["epoch_0000_a.png", "epoch_0000_b.png"]


def test_expected_json_has_proxy_band():
    with open(os.path.join(REPO, "benchmarks", "expected.json")) as f:
        expected = json.load(f)
    lo, hi = expected["proxy_band"]["baseline_measured_proxy"]
    rec = expected["recorded"]["baseline_measured_proxy"]
    assert lo < rec < hi
    assert expected["device_kind"] and expected["device_count"] >= 1
