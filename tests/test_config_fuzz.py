"""Seeded config-space fuzz: every sampled flag combination must train.

The reference's config surface is an argparse namespace splatted into
permissive ``**kwargs`` constructors — invalid combinations fail deep
inside a run (or silently no-op). Our typed-config equivalent should
instead be total: ANY combination the CLI can express must produce a
finite loss and nonzero finite gradients. This fuzz samples the
cross-product axes that no hand-written test enumerates together
(variant x recon loss x norm_pix x gelu x scan/unroll x remat x crop
mode x reduction x attention impl x perceptual).

Deterministic: the sample set is fixed by FUZZ_SEED, so a failure
reproduces bit-for-bit. Runs on the CPU mesh (tests/conftest.py); tiny
16 px / patch-8 shapes keep the per-config compile ~seconds.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cross_scale_mae_tpu.configs import _VARIANTS, get_mae_config
from cross_scale_mae_tpu.models import mae_init
from cross_scale_mae_tpu.models.mae import mae_loss_fn

FUZZ_SEED = 20260817
N_SAMPLES = 14

AXES = {
    "variant": list(_VARIANTS),
    # ssim/ms_ssim need >= 160 px inputs (reference constraint) — covered
    # by tests/test_ssim_golden.py; keep the fuzz at pixel losses + bce.
    "loss": ["mse", "l2", "mae", "l1", "bce"],
    "norm_pix_loss": [False, True],
    "gelu": ["tanh", "exact", "exact_tanhbwd"],
    "scan_blocks": [True, False],
    "remat": [False, True],
    "ms_per_sample_crop": [True, False],
    "ms_decoder_loss_reduction": ["sum", "mean"],
    "attention_impl": ["xla", "pallas", "local"],
    "use_perceptual": [False, True],
}


def _sample_configs():
    rng = np.random.default_rng(FUZZ_SEED)
    seen = set()
    combos = []
    while len(combos) < N_SAMPLES:
        pick = {k: v[rng.integers(len(v))] for k, v in AXES.items()}
        key = tuple(sorted((k, str(v)) for k, v in pick.items()))
        if key in seen:
            continue
        seen.add(key)
        combos.append(pick)
    return combos


@pytest.mark.slow
@pytest.mark.parametrize("pick", _sample_configs(),
                         ids=lambda p: f"{p['variant'] or 'baseline'}-"
                                       f"{p['loss']}-{p['attention_impl']}")
def test_fuzzed_config_trains(pick):
    variant = pick.pop("variant")
    name = f"mae_vit_tiny_{variant}" if variant else "mae_vit_tiny"
    # Perceptual loss needs multiples of the VGG pooling stride; 16 px with
    # a random trunk works (losses/perceptual.py handles tiny inputs).
    cfg = get_mae_config(
        name, input_size=16, patch_size=8, mask_ratio=0.5,
        compute_dtype="float32", **pick,
    )
    params, state = mae_init(jax.random.key(0), cfg)
    imgs = jnp.asarray(
        np.random.default_rng(1).normal(size=(4, 16, 16, 3)), jnp.float32)

    def loss_of(p):
        return mae_loss_fn(p, state, cfg, imgs, jax.random.key(2)).loss

    loss, grads = jax.value_and_grad(loss_of)(params)
    assert np.isfinite(float(loss)), cfg
    gsum = float(sum(jnp.sum(jnp.abs(g)) for g in jax.tree.leaves(grads)))
    assert np.isfinite(gsum) and gsum > 0, cfg
