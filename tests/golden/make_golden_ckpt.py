"""One-off generator for the frozen checkpoint-schema artifact.

Writes ``tests/golden/ckpt_v1/`` — a few-KB Orbax checkpoint of a miniature
MAE TrainState after ONE real optimizer step, with the config sidecar. The
artifact is COMMITTED; tests/test_ckpt_schema_freeze.py must restore it on
every future toolchain. Do NOT regenerate casually: replacing the artifact
resets the compatibility clock and defeats the freeze (VERDICT r4 §next-9
— the gelu/sequence_parallel rehydration shims in configs.from_json are
live proof schema drift happens). If a schema change is truly required,
regenerate AND add a back-compat shim + note in docs/VALIDATION.md.

Run from the repo root:
    XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python tests/golden/make_golden_ckpt.py
"""

from __future__ import annotations

import json
import os
import shutil

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp

HERE = os.path.dirname(os.path.abspath(__file__))
OUT = os.path.join(HERE, "ckpt_v1")


def golden_config():
    from cross_scale_mae_tpu.configs import get_mae_config

    # Miniature but structurally complete: full MsLdCeCd objective (both
    # predictors + their BN state), fp32, xla attention — every schema
    # element present, few-KB params.
    return get_mae_config(
        "mae_vit_tiny_MsLdCeCd", input_size=16, patch_size=8,
        dim_model=8, encoder_num_layers=1, encoder_num_heads=2,
        decoder_embed_dim=8, decoder_num_layers=1, decoder_num_heads=2,
        predictor_hidden_size=8, compute_dtype="float32",
        attention_impl="xla",
    )


def golden_state_and_batch():
    from cross_scale_mae_tpu.configs import TrainConfig
    from cross_scale_mae_tpu.models import mae_init
    from cross_scale_mae_tpu.train import (
        TrainState, build_optimizer, warmup_half_cosine,
    )
    from cross_scale_mae_tpu.train.pretrain import make_pretrain_step

    cfg = golden_config()
    tcfg = TrainConfig(epochs=1, warmup_epochs=0, blr=1e-3)
    sched = warmup_half_cosine(1e-3, 0.0, 0, 1, 10)
    params, mstate = mae_init(jax.random.key(0), cfg)
    tx = build_optimizer(params, sched, weight_decay=0.05)
    state = TrainState.create(params, mstate, tx)
    step = make_pretrain_step(cfg, tcfg, sched, donate=False)
    batch = jnp.asarray(
        np.random.default_rng(0).normal(size=(4, 16, 16, 3)), jnp.float32
    )
    state, _ = step(state, batch, jax.random.key(1))
    return cfg, state, batch


def main():
    from cross_scale_mae_tpu.models.mae import mae_loss_fn
    from cross_scale_mae_tpu.utils.checkpoint import save_checkpoint

    cfg, state, batch = golden_state_and_batch()
    if os.path.isdir(OUT):
        shutil.rmtree(OUT)
    save_checkpoint(OUT, 1, state, config_json=cfg.to_json(),
                    extra={"epoch": 0})
    # Golden forward value on the SAVED params: the freeze test recomputes
    # this after restore — pins both the byte-level restore and that the
    # current model code still interprets the params identically.
    out = mae_loss_fn(state.params, state.model_state, cfg, batch,
                      jax.random.key(2), train=False)
    golden = {"loss_after_restore": float(out.loss)}
    with open(os.path.join(OUT, "golden_values.json"), "w") as f:
        json.dump(golden, f, indent=1)
    size_kb = sum(
        os.path.getsize(os.path.join(r, f))
        for r, _, fs in os.walk(OUT) for f in fs
    ) / 1024
    print(f"wrote {OUT} ({size_kb:.0f} KiB), golden {golden}")


if __name__ == "__main__":
    main()
