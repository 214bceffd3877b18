"""Sequence parallelism (Megatron SP) — numerics + structure.

``cfg.sequence_parallel`` pins the residual stream's token axis to the
'model' mesh axis between blocks (models/layers.sp_constrain). It is an
execution-layout knob: losses, grads and eval logits must be IDENTICAL to
the plain-TP plan, while the lowered program carries strictly more sharding
annotations (the constraint custom-calls) and the compiled program reshapes
the sequence at block boundaries (all-gathers) instead of all-reducing
full-size activations.

No reference equivalent (the reference is single-strategy NCCL DDP,
main_pretrain.py:417-420) — this is part of the TPU-native scaling surface
(SURVEY.md §2 parallelism table).
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs the 8-device virtual mesh"
)


def _mesh():
    from cross_scale_mae_tpu.parallel import make_mesh

    return make_mesh(jax.devices()[:8], model_parallel=2)


def _flagship_pair(flat_blocks: bool = False):
    from cross_scale_mae_tpu.configs import get_mae_config

    cfg = get_mae_config(
        "mae_vit_tiny_MsLdCeCd", input_size=32, patch_size=8,
        compute_dtype="float32", attention_impl="xla",
        flat_blocks=flat_blocks,
    )
    return cfg, cfg.replace(sequence_parallel=True)


def _run_pretrain(cfg, mesh, imgs):
    from cross_scale_mae_tpu.configs import TrainConfig
    from cross_scale_mae_tpu.models import mae_init
    from cross_scale_mae_tpu.parallel import batch_sharding, shard_train_state
    from cross_scale_mae_tpu.train import (
        TrainState, build_optimizer, warmup_half_cosine,
    )
    from cross_scale_mae_tpu.train.pretrain import make_pretrain_step

    tcfg = TrainConfig(epochs=1, warmup_epochs=0, blr=1e-4)
    sched = warmup_half_cosine(1e-4, 0.0, 0, 1, 10)
    params, mstate = mae_init(jax.random.key(0), cfg)
    tx = build_optimizer(params, sched, weight_decay=0.05)
    state = TrainState.create(params, mstate, tx)
    state = shard_train_state(mesh, state, tensor_parallel=True)
    step = make_pretrain_step(cfg, tcfg, sched, donate=False, mesh=mesh)
    batch = jax.device_put(imgs, batch_sharding(mesh))
    new_state, metrics = step(state, batch, jax.random.key(1))
    lowered = step.lower(state, batch, jax.random.key(1))
    return new_state, metrics, lowered


@pytest.fixture(scope="module")
def tp_vs_sp():
    mesh = _mesh()
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(16, 32, 32, 3)), jnp.float32
    )
    cfg_tp, cfg_sp = _flagship_pair()
    out = {}
    for name, cfg in (("tp", cfg_tp), ("sp", cfg_sp)):
        out[name] = _run_pretrain(cfg, mesh, imgs)
    return out


def test_sp_loss_matches_tp(tp_vs_sp):
    """SP is a layout, not a model: the MsLdCeCd loss must match plain TP
    to float tolerance (summation order may differ across collectives)."""
    l_tp = float(tp_vs_sp["tp"][1]["loss"])
    l_sp = float(tp_vs_sp["sp"][1]["loss"])
    assert abs(l_tp - l_sp) < 2e-5, (l_tp, l_sp)


def test_sp_params_match_tp_after_step(tp_vs_sp):
    """One full optimizer step lands on the same params. Tolerance: grads
    differ only in float summation ORDER (reduce-scatter vs all-reduce),
    but AdamW's g/sqrt(v) near init can amplify a ~1e-7 grad wiggle to
    ~1e-5 on the param — well below the 1e-4 update scale."""
    p_tp = tp_vs_sp["tp"][0].params
    p_sp = tp_vs_sp["sp"][0].params
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(p_tp),
        jax.tree_util.tree_leaves_with_path(p_sp),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=3e-5,
            err_msg=jax.tree_util.keystr(path),
        )


def test_sp_adds_sharding_constraints(tp_vs_sp):
    """The lowered (pre-optimization) program must carry MORE sharding
    annotations under SP — the in-model constraints are the feature; if
    they silently drop out, SP degrades to plain TP with no error.

    Dialect-robust (round-4 lesson, VERDICT r4 §weak-1): Shardy-era
    toolchains lower with_sharding_constraint to ``sdy.sharding_constraint``
    ops; pre-Shardy lowerings emit ``Sharding`` custom-calls. Count both
    token families and require SP > TP in at least one — asserting on the
    legacy token alone made this guard silently dead under Shardy (both
    counts 0, 0 > 0 fails even though the constraints were present)."""
    tp_txt = tp_vs_sp["tp"][2].as_text()
    sp_txt = tp_vs_sp["sp"][2].as_text()
    counts = {
        tok: (tp_txt.count(tok), sp_txt.count(tok))
        for tok in ("sdy.sharding_constraint", "Sharding")
    }
    # The token must actually appear somewhere under SP (else the toolchain
    # moved to a third spelling and this guard is dead again — fail loudly).
    assert any(sp > 0 for _, sp in counts.values()), counts
    assert any(sp > tp for tp, sp in counts.values()), counts


def test_sp_resharding_collectives_in_compiled_program(tp_vs_sp):
    """Compiled SP program re-gathers the sequence-sharded residual at
    attention boundaries: all-gather count strictly above plain TP's.
    (On TPU the partial->sequence-sharded step lowers to reduce-scatter;
    the CPU backend expresses it as all-reduce + slice, so we assert the
    robust direction: more gathers, gradient sync still present.)"""
    c = {
        k: {
            op: v[2].compile().as_text().count(op)
            for op in ("all-reduce", "all-gather", "reduce-scatter")
        }
        for k, v in tp_vs_sp.items()
    }
    assert c["sp"]["all-gather"] > c["tp"]["all-gather"], c
    assert c["sp"]["all-reduce"] >= 1, c


def test_sp_flat_blocks_matches(tp_vs_sp):
    """The flat (N*L, D) carry shards the fused token axis over BOTH mesh
    axes — same loss again."""
    mesh = _mesh()
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(16, 32, 32, 3)), jnp.float32
    )
    _, cfg_sp_flat = _flagship_pair(flat_blocks=True)
    _, metrics, _ = _run_pretrain(cfg_sp_flat, mesh, imgs)
    l_ref = float(tp_vs_sp["tp"][1]["loss"])
    assert abs(float(metrics["loss"]) - l_ref) < 2e-5, (
        float(metrics["loss"]), l_ref,
    )


def test_sp_classifier_train_and_eval():
    """Finetune step + psum'd eval under SP match the plain-TP classifier."""
    from cross_scale_mae_tpu.configs import TrainConfig, get_vit_config
    from cross_scale_mae_tpu.models.vit import vit_init
    from cross_scale_mae_tpu.parallel import batch_sharding, shard_train_state
    from cross_scale_mae_tpu.train import (
        TrainState, build_optimizer, warmup_half_cosine,
    )
    from cross_scale_mae_tpu.train.classify import (
        make_classify_train_step, make_eval_step,
    )

    mesh = _mesh()
    rng = np.random.default_rng(1)
    imgs = jnp.asarray(rng.normal(size=(16, 32, 32, 3)), jnp.float32)
    labels = jnp.asarray(rng.integers(0, 10, size=(16,)), jnp.int32)
    tcfg = TrainConfig(
        epochs=1, warmup_epochs=0, blr=1e-4, label_smoothing=0.0,
        mixup=0.0, cutmix=0.0,
    )
    sched = warmup_half_cosine(1e-4, 0.0, 0, 1, 10)
    losses, evals = {}, {}
    for name, sp in (("tp", False), ("sp", True)):
        # Tiny dims via overrides: the registry carries only the reference's
        # base/large/huge presets (models_vit.py:63-99).
        cfg = get_vit_config(
            "vit_base_patch16", input_size=32, patch_size=8, num_classes=10,
            embed_dim=64, depth=2, num_heads=4,
            compute_dtype="float32", sequence_parallel=sp,
            drop_path_rate=0.0,
        )
        params, mstate = vit_init(jax.random.key(0), cfg)
        tx = build_optimizer(params, sched, weight_decay=0.05)
        state = shard_train_state(
            mesh, TrainState.create(params, mstate, tx), tensor_parallel=True
        )
        step = make_classify_train_step(
            cfg, tcfg, sched, donate=False, mesh=mesh
        )
        b = jax.device_put(imgs, batch_sharding(mesh))
        _, m = step(state, b, labels, jax.random.key(2))
        losses[name] = float(m["loss"])
        ev = make_eval_step(cfg, mesh=mesh)(
            state.params, state.model_state, b, labels
        )
        evals[name] = float(ev["acc1"])
    assert abs(losses["tp"] - losses["sp"]) < 2e-5, losses
    assert evals["tp"] == evals["sp"], evals


def test_sp_requires_mesh_at_build():
    """Forgetting mesh= must fail at build time with an actionable message,
    not at trace time inside XLA."""
    from cross_scale_mae_tpu.configs import TrainConfig
    from cross_scale_mae_tpu.train import warmup_half_cosine
    from cross_scale_mae_tpu.train.pretrain import make_pretrain_step

    cfg_sp = _flagship_pair()[1]
    with pytest.raises(ValueError, match="mesh"):
        make_pretrain_step(
            cfg_sp, TrainConfig(), warmup_half_cosine(1e-4, 0.0, 0, 1, 10)
        )


def test_sp_cli_guard_requires_model_parallel(tmp_path):
    """All three training CLIs must reject --sequence_parallel without a
    model axis at argument-validation time (before any device work)."""
    from cross_scale_mae_tpu.cli import finetune, linprobe, pretrain

    for mod in (pretrain, finetune, linprobe):
        args = mod.get_args_parser().parse_args([
            "--sequence_parallel", "--dataset_type", "synthetic",
            "--output_dir", str(tmp_path / mod.__name__.rsplit(".", 1)[-1]),
        ])
        with pytest.raises(SystemExit, match="model_parallel"):
            mod.main(args)


def test_sp_dropped_on_rehydration():
    """Checkpoint configs rehydrate with sequence_parallel=False — viz and
    serving consumers run without a mesh context and must not inherit a
    training-run layout flag (see MAEConfig.from_json)."""
    from cross_scale_mae_tpu.configs import MAEConfig, ViTClassifierConfig

    cfg = _flagship_pair()[1]
    assert cfg.sequence_parallel
    assert not MAEConfig.from_json(cfg.to_json()).sequence_parallel
    v = ViTClassifierConfig(sequence_parallel=True)
    assert not ViTClassifierConfig.from_json(v.to_json()).sequence_parallel
