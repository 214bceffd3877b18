"""Seeded classifier config-space fuzz (downstream ViT + mixup targets).

Companion to tests/test_config_fuzz.py for the finetune/linprobe side:
every sampled combination of (global_pool x bn_head x drop_path x gelu x
scan/unroll x attention impl x freeze_backbone) must produce finite
cross-entropy loss and — when not frozen — nonzero finite gradients into
the backbone; frozen probes must have EXACTLY zero backbone gradients.
Separately fuzzes the mixup/cutmix target builder across modes.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cross_scale_mae_tpu.configs import get_vit_config
from cross_scale_mae_tpu.models.vit import vit_apply, vit_init

FUZZ_SEED = 31415
N_SAMPLES = 10

AXES = {
    "global_pool": [False, True],
    "use_bn_head": [False, True],
    "drop_path_rate": [0.0, 0.2],
    "gelu": ["tanh", "exact", "exact_tanhbwd"],
    "scan_blocks": [True, False],
    "attention_impl": ["xla", "pallas", "local"],
    "freeze_backbone": [False, True],
}


def _sample():
    rng = np.random.default_rng(FUZZ_SEED)
    seen, combos = set(), []
    while len(combos) < N_SAMPLES:
        pick = {k: v[rng.integers(len(v))] for k, v in AXES.items()}
        key = tuple(sorted((k, str(v)) for k, v in pick.items()))
        if key not in seen:
            seen.add(key)
            combos.append(pick)
    return combos


@pytest.mark.slow
@pytest.mark.parametrize(
    "pick", _sample(),
    ids=lambda p: f"{'gp' if p['global_pool'] else 'cls'}-"
                  f"{p['attention_impl']}-"
                  f"{'frozen' if p['freeze_backbone'] else 'full'}")
def test_fuzzed_classifier_trains(pick):
    freeze = pick.pop("freeze_backbone")
    cfg = get_vit_config(
        "vit_base_patch16", input_size=16, patch_size=8, embed_dim=32,
        depth=2, num_heads=4, num_classes=5, compute_dtype="float32",
        **pick,
    )
    params, state = vit_init(jax.random.key(0), cfg)
    imgs = jnp.asarray(
        np.random.default_rng(1).normal(size=(4, 16, 16, 3)), jnp.float32)
    labels = jnp.asarray([0, 1, 2, 3])

    def loss_of(p):
        logits, _ = vit_apply(p, state, cfg, imgs, train=True,
                              rng=jax.random.key(2),
                              freeze_backbone=freeze)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32))
        return -jnp.mean(jnp.take_along_axis(logp, labels[:, None], 1))

    loss, grads = jax.value_and_grad(loss_of)(params)
    assert np.isfinite(float(loss)), cfg
    backbone_g = float(sum(
        jnp.sum(jnp.abs(g))
        for g in jax.tree.leaves(grads["blocks"])))
    head_g = float(sum(
        jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(grads["head"])))
    assert np.isfinite(head_g) and head_g > 0, cfg
    if freeze:
        assert backbone_g == 0.0, cfg  # stop_gradient must be total
    else:
        assert np.isfinite(backbone_g) and backbone_g > 0, cfg


@pytest.mark.parametrize("mode", ["batch", "pair", "elem"])
def test_fuzzed_mixup_targets(mode):
    from cross_scale_mae_tpu.train.mixup import mixup_cutmix

    imgs = jnp.asarray(
        np.random.default_rng(2).uniform(size=(8, 16, 16, 3)), jnp.float32)
    labels = jnp.asarray(np.arange(8) % 4)
    out, targets = mixup_cutmix(
        jax.random.key(3), imgs, labels, num_classes=4,
        mixup_alpha=0.8, cutmix_alpha=1.0, prob=1.0, switch_prob=0.5,
        smoothing=0.1, mode=mode)
    assert out.shape == imgs.shape
    assert targets.shape == (8, 4)
    # Rows are probability distributions regardless of mode/smoothing.
    np.testing.assert_allclose(np.asarray(targets.sum(1)), 1.0, atol=1e-5)
    assert np.isfinite(np.asarray(out)).all()
