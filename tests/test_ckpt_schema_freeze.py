"""Checkpoint schema freeze: the committed golden artifact must restore.

``tests/golden/ckpt_v1/`` is a few-hundred-KB Orbax checkpoint of a
miniature-but-structurally-complete MsLdCeCd TrainState (one real optimizer
step; both predictors + BN state; config sidecar) committed in round 5.
Every future round must keep restoring it — the ``gelu`` /
``sequence_parallel`` rehydration shims in ``configs.from_json``
(configs.py) prove schema drift is live, and this artifact turns the next
drift from a silent break into a red test (VERDICT r4 §next-9).

If one of these tests fails after an intentional schema change: add a
back-compat shim so the OLD artifact still restores (the fix is never to
regenerate the artifact — users hold old checkpoints).
"""

from __future__ import annotations

import json
import os

import numpy as np
import pytest

import jax
import jax.numpy as jnp

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "ckpt_v1")


@pytest.fixture(scope="module")
def golden_meta():
    from cross_scale_mae_tpu.utils.checkpoint import checkpoint_meta

    assert os.path.isdir(GOLDEN), "golden artifact missing from the repo"
    return checkpoint_meta(GOLDEN, 1)


def test_sidecar_config_rehydrates(golden_meta):
    """The config sidecar must rebuild the exact MAEConfig — every field the
    artifact was written with survives from_json (with documented shims)."""
    from cross_scale_mae_tpu.configs import MAEConfig

    cfg = MAEConfig.from_json(json.dumps(golden_meta["config"]))
    assert cfg.dim_model == 8 and cfg.decoder_embed_dim == 8
    assert cfg.use_cd_pred and cfg.use_ce_ntxent and cfg.multi_scale
    assert cfg.input_size == 16 and cfg.patch_size == 8
    assert golden_meta["epoch"] == 0 and golden_meta["step"] == 1


def test_full_trainstate_restore_and_forward(golden_meta):
    """restore_checkpoint into a freshly-built template (the resume path),
    then recompute the recorded golden forward loss on the restored params."""
    from cross_scale_mae_tpu.configs import MAEConfig
    from cross_scale_mae_tpu.models import mae_init
    from cross_scale_mae_tpu.models.mae import mae_loss_fn
    from cross_scale_mae_tpu.train import (
        TrainState, build_optimizer, warmup_half_cosine,
    )
    from cross_scale_mae_tpu.utils.checkpoint import restore_checkpoint

    cfg = MAEConfig.from_json(json.dumps(golden_meta["config"]))
    sched = warmup_half_cosine(1e-3, 0.0, 0, 1, 10)
    params, mstate = mae_init(jax.random.key(0), cfg)
    tx = build_optimizer(params, sched, weight_decay=0.05)
    template = TrainState.create(params, mstate, tx)

    state, meta = restore_checkpoint(GOLDEN, template)
    assert int(jax.device_get(state.step)) == 1
    assert meta["epoch"] == 0

    with open(os.path.join(GOLDEN, "golden_values.json")) as f:
        golden = json.load(f)
    batch = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 16, 16, 3)), jnp.float32
    )
    out = mae_loss_fn(state.params, state.model_state, cfg, batch,
                      jax.random.key(2), train=False)
    assert float(out.loss) == pytest.approx(
        golden["loss_after_restore"], abs=1e-5
    )


def test_host_numpy_restore(golden_meta):
    """restore_arrays_host (the viz/export/serving loader — no TrainState
    template, any device topology) must keep opening the old artifact."""
    from cross_scale_mae_tpu.utils.checkpoint import restore_arrays_host

    restored, step = restore_arrays_host(GOLDEN)
    assert step == 1
    assert set(restored) == {"params", "model_state"}
    # Schema spine of the params tree — renaming any of these keys breaks
    # every existing checkpoint.
    expected_keys = {
        "patch_embed", "cls_token", "mask_token", "encoder_blocks",
        "encoder_norm", "decoder_embed", "decoder_blocks", "decoder_norm",
        "decoder_pred", "predictor_cd",
    }
    assert expected_keys <= set(restored["params"]), sorted(restored["params"])
    assert "predictor_cd" in restored["model_state"]
    for leaf in jax.tree.leaves(restored["params"]):
        assert isinstance(leaf, np.ndarray)
