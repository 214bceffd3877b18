"""Multi-device tests on the simulated 8-device CPU mesh (conftest.py).

Exercises the DDP-equivalent path (batch sharded on 'data', params
replicated, XLA-inserted gradient reduction) and the tensor-parallel hook.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from cross_scale_mae_tpu.configs import TrainConfig, get_mae_config
from cross_scale_mae_tpu.models import mae_init
from cross_scale_mae_tpu.parallel import (
    batch_sharding,
    make_mesh,
    param_shardings,
    shard_train_state,
)
from cross_scale_mae_tpu.train import TrainState, build_optimizer, warmup_half_cosine
from cross_scale_mae_tpu.train.pretrain import make_pretrain_step


@pytest.fixture(scope="module")
def tiny_setup():
    cfg = get_mae_config(
        "mae_vit_tiny_MsLd", input_size=16, patch_size=8, compute_dtype="float32"
    )
    tcfg = TrainConfig(epochs=1, warmup_epochs=0, blr=1e-3)
    params, mstate = mae_init(jax.random.key(0), cfg)
    sched = warmup_half_cosine(1e-3, 0.0, 0, 1, 10)
    tx = build_optimizer(params, sched)
    state = TrainState.create(params, mstate, tx)
    return cfg, tcfg, sched, state


def test_eight_devices_visible():
    assert jax.device_count() == 8


def test_data_parallel_step(tiny_setup):
    cfg, tcfg, sched, state = tiny_setup
    mesh = make_mesh(model_parallel=1)
    state = shard_train_state(mesh, state, tensor_parallel=False)
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(16, 16, 16, 3)).astype(np.float32)
    )
    imgs = jax.device_put(imgs, batch_sharding(mesh))
    step = make_pretrain_step(cfg, tcfg, sched, donate=False)
    new_state, metrics = step(state, imgs, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    # Params remain replicated after the update.
    k = new_state.params["patch_embed"]["kernel"]
    assert k.sharding.is_fully_replicated


@pytest.mark.slow
def test_data_parallel_matches_single_device(tiny_setup):
    cfg, tcfg, sched, state = tiny_setup
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(16, 16, 16, 3)).astype(np.float32)
    )
    step = make_pretrain_step(cfg, tcfg, sched, donate=False)

    # Single device
    s1, m1 = step(state, imgs, jax.random.key(0))

    # 8-way data parallel
    mesh = make_mesh(model_parallel=1)
    state8 = shard_train_state(mesh, state, tensor_parallel=False)
    imgs8 = jax.device_put(imgs, batch_sharding(mesh))
    s8, m8 = step(state8, imgs8, jax.random.key(0))

    np.testing.assert_allclose(float(m1["loss"]), float(m8["loss"]), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(s1.params["decoder_pred"]["bias"]),
        np.asarray(s8.params["decoder_pred"]["bias"]),
        atol=1e-6,
    )


def test_tensor_parallel_shardings(tiny_setup):
    cfg, tcfg, sched, state = tiny_setup
    mesh = make_mesh(model_parallel=2)
    assert mesh.shape == {"data": 4, "model": 2}
    shardings = param_shardings(mesh, state.params, tensor_parallel=True)
    qkv = shardings["encoder_blocks"]["attn"]["qkv"]["kernel"]
    assert qkv.spec == P(None, None, "model")
    proj = shardings["encoder_blocks"]["attn"]["proj"]["kernel"]
    assert proj.spec == P(None, "model", None)
    assert shardings["cls_token"].spec == P()


@pytest.mark.slow
def test_shard_map_ddp_step(tiny_setup):
    # Manual-SPMD DDP mode: reference per-device semantics + pallas-capable.
    from cross_scale_mae_tpu.train.pretrain import make_pretrain_step_shard_map

    cfg, tcfg, sched, state = tiny_setup
    mesh = make_mesh(model_parallel=1)
    state_r = shard_train_state(mesh, state, tensor_parallel=False)
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(16, 16, 16, 3)).astype(np.float32)
    )
    batch = jax.device_put(imgs, batch_sharding(mesh))
    step = make_pretrain_step_shard_map(cfg, tcfg, sched, mesh, donate=False)
    new_state, metrics = step(state_r, batch, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    assert np.isfinite(float(metrics["grad_norm"]))
    # params stay replicated and actually moved
    k = new_state.params["patch_embed"]["kernel"]
    assert k.sharding.is_fully_replicated
    assert not np.allclose(
        np.asarray(k), np.asarray(state.params["patch_embed"]["kernel"])
    )

    # pallas attention works under shard_map (interpret mode on CPU)
    cfg_p = cfg.replace(attention_impl="pallas")
    step_p = make_pretrain_step_shard_map(cfg_p, tcfg, sched, mesh, donate=False)
    _, metrics_p = step_p(state_r, batch, jax.random.key(0))
    assert np.isfinite(float(metrics_p["loss"]))


@pytest.mark.slow
def test_zero1_optimizer_sharding(tiny_setup):
    cfg, tcfg, sched, state = tiny_setup
    mesh = make_mesh(model_parallel=1)
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(16, 16, 16, 3)).astype(np.float32)
    )
    step = make_pretrain_step(cfg, tcfg, sched, donate=False)

    base_state = shard_train_state(mesh, state, tensor_parallel=False)
    z_state = shard_train_state(mesh, state, tensor_parallel=False, zero1=True)
    # Moments are actually sharded
    mu_leaf = None
    for leaf in jax.tree.leaves(z_state.opt_state):
        if hasattr(leaf, "shape") and leaf.size > 1024:
            mu_leaf = leaf
            break
    assert mu_leaf is not None and not mu_leaf.sharding.is_fully_replicated

    batch = jax.device_put(imgs, batch_sharding(mesh))
    s_base, m_base = step(base_state, batch, jax.random.key(0))
    s_zero, m_zero = step(z_state, batch, jax.random.key(0))
    np.testing.assert_allclose(
        float(m_base["loss"]), float(m_zero["loss"]), rtol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(s_base.params["decoder_pred"]["bias"]),
        np.asarray(s_zero.params["decoder_pred"]["bias"]),
        atol=1e-6,
    )


def test_fsdp_param_shardings(tiny_setup):
    cfg, tcfg, sched, state = tiny_setup
    mesh = make_mesh(model_parallel=2)
    sh = param_shardings(mesh, state.params, tensor_parallel=True, fsdp=True)
    # Large TP-sharded leaf also shards over 'data' on a different axis:
    # stacked fc1 kernel (layers, in, out) -> TP puts 'model' on out, FSDP
    # puts 'data' on the largest remaining divisible axis.
    fc1 = sh["encoder_blocks"]["mlp"]["fc1"]["kernel"].spec
    assert "model" in fc1 and "data" in fc1, fc1
    # Large non-TP leaf shards over 'data' alone.
    pe = sh["patch_embed"]["kernel"].spec
    assert "data" in pe and "model" not in pe, pe
    # Small leaves (cls token, norm scales) stay replicated.
    assert sh["cls_token"].spec == P()
    # fsdp + zero1 is redundant and rejected.
    with pytest.raises(ValueError):
        shard_train_state(mesh, state, zero1=True, fsdp=True)


@pytest.mark.slow
def test_fsdp_matches_replicated_dp(tiny_setup):
    """FSDP (ZeRO-3 param+moment storage) is a layout change, not a numerics
    change: one step under FSDP equals one step under replicated DP, and the
    params/moments really are stored sharded (per-device shard < global)."""
    cfg, tcfg, sched, state = tiny_setup
    mesh = make_mesh(model_parallel=1)
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(16, 16, 16, 3)).astype(np.float32)
    )
    step = make_pretrain_step(cfg, tcfg, sched, donate=False)

    base_state = shard_train_state(mesh, state, tensor_parallel=False)
    f_state = shard_train_state(mesh, state, tensor_parallel=False, fsdp=True)

    k = f_state.params["encoder_blocks"]["mlp"]["fc1"]["kernel"]
    assert not k.sharding.is_fully_replicated
    shard = k.addressable_shards[0].data
    assert shard.size < k.size  # genuinely 1/N storage
    # Adam moments follow the param layout (ZeRO-3 subsumes ZeRO-1).
    m_leaf = None
    for (pth, leaf) in jax.tree_util.tree_leaves_with_path(f_state.opt_state):
        if hasattr(leaf, "shape") and leaf.shape == k.shape:
            m_leaf = leaf
            break
    assert m_leaf is not None and not m_leaf.sharding.is_fully_replicated

    batch = jax.device_put(imgs, batch_sharding(mesh))
    s_base, m_base = step(base_state, batch, jax.random.key(0))
    s_fsdp, m_fsdp = step(f_state, batch, jax.random.key(0))
    np.testing.assert_allclose(
        float(m_base["loss"]), float(m_fsdp["loss"]), rtol=1e-6
    )
    # atol: the gradient reduction changes shape (all-reduce -> per-shard
    # reduce-scatter), so elements with near-zero grads see a different
    # float summation order — and at step 1 Adam's update is lr*g/(|g|+eps),
    # which turns an epsilon-scale grad difference into an O(lr) update
    # difference. Observed: 1 / 262144 elements at 8.9e-5 (lr=1e-3).
    np.testing.assert_allclose(
        np.asarray(s_base.params["encoder_blocks"]["mlp"]["fc1"]["kernel"]),
        np.asarray(s_fsdp.params["encoder_blocks"]["mlp"]["fc1"]["kernel"]),
        atol=2e-4,
    )
    # Layout preserved through the update (stays FSDP for step 2).
    assert not s_fsdp.params["encoder_blocks"]["mlp"]["fc1"][
        "kernel"].sharding.is_fully_replicated


def test_fsdp_shards_bf16_mu(tiny_setup):
    """--fsdp x --adam_mu_dtype bfloat16: the bf16 first moment must still
    follow its param's FSDP layout. Regression for the (shape, dtype)-keyed
    opt-state lookup that silently replicated any moment whose dtype differs
    from its param (quadrupling per-chip mu HBM on an 8-way data axis)."""
    cfg, tcfg, sched, state = tiny_setup
    mesh = make_mesh(model_parallel=1)
    tx16 = build_optimizer(state.params, sched, mu_dtype="bfloat16")
    state16 = TrainState.create(state.params, state.model_state, tx16)
    f_state = shard_train_state(mesh, state16, tensor_parallel=False, fsdp=True)

    k = f_state.params["encoder_blocks"]["mlp"]["fc1"]["kernel"]
    assert not k.sharding.is_fully_replicated
    mu_leaf = nu_leaf = None
    for leaf in jax.tree.leaves(f_state.opt_state):
        if hasattr(leaf, "shape") and leaf.shape == k.shape:
            if leaf.dtype == jnp.bfloat16:
                mu_leaf = leaf
            elif leaf.dtype == jnp.float32:
                nu_leaf = leaf
    assert mu_leaf is not None and nu_leaf is not None
    assert mu_leaf.sharding == k.sharding, (mu_leaf.sharding, k.sharding)
    assert nu_leaf.sharding == k.sharding


@pytest.mark.slow
def test_tensor_parallel_step_runs(tiny_setup):
    cfg, tcfg, sched, state = tiny_setup
    mesh = make_mesh(model_parallel=2)
    state_tp = shard_train_state(mesh, state, tensor_parallel=True)
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(8, 16, 16, 3)).astype(np.float32)
    )
    imgs = jax.device_put(imgs, batch_sharding(mesh))
    step = make_pretrain_step(cfg, tcfg, sched, donate=False)
    new_state, metrics = step(state_tp, imgs, jax.random.key(0))
    assert np.isfinite(float(metrics["loss"]))
    # TP sharding is preserved through the update.
    k = new_state.params["encoder_blocks"]["mlp"]["fc1"]["kernel"]
    assert not k.sharding.is_fully_replicated


@pytest.mark.slow
def test_checkpoint_restores_across_mesh_change(tiny_setup, tmp_path):
    """Topology-change resume: a checkpoint written under a TP x DP mesh
    restores (and trains on) a pure-DP mesh, and vice versa. The reference
    cannot do this at all — DDP checkpoints are rank-agnostic only because
    everything is replicated (util/misc.py:358-411); here optimizer/params
    shardings genuinely differ between the two meshes (ZeRO-1 shards
    moments over 'data')."""
    from cross_scale_mae_tpu.utils.checkpoint import (
        restore_checkpoint,
        save_checkpoint,
    )

    cfg, tcfg, sched, state = tiny_setup
    imgs = jnp.asarray(
        np.random.default_rng(0).normal(size=(16, 16, 16, 3)).astype(np.float32)
    )
    step = make_pretrain_step(cfg, tcfg, sched, donate=False)

    # Train 2 steps on a {'data': 4, 'model': 2} mesh with ZeRO-1 sharding.
    mesh_a = make_mesh(model_parallel=2)
    state_a = shard_train_state(mesh_a, state, tensor_parallel=True, zero1=True)
    batch_a = jax.device_put(imgs, batch_sharding(mesh_a))
    for _ in range(2):
        state_a, m_a = step(state_a, batch_a, jax.random.key(0))
    save_checkpoint(str(tmp_path / "ckpt"), 2, state_a)

    # Restore into a fresh {'data': 8} pure-DP replicated layout.
    mesh_b = make_mesh(model_parallel=1)
    template = shard_train_state(mesh_b, state, tensor_parallel=False)
    restored, _meta = restore_checkpoint(str(tmp_path / "ckpt"), template)
    assert int(restored.step) == 2
    # Values equal regardless of layout.
    np.testing.assert_allclose(
        np.asarray(restored.params["patch_embed"]["kernel"]),
        np.asarray(state_a.params["patch_embed"]["kernel"]),
        atol=0,
    )
    # New layout is really in effect and training continues.
    assert restored.params["patch_embed"]["kernel"].sharding.is_fully_replicated
    batch_b = jax.device_put(imgs, batch_sharding(mesh_b))
    cont, m_b = step(restored, batch_b, jax.random.key(1))
    assert np.isfinite(float(m_b["loss"]))

    # And the reverse direction with FSDP: the same replicated-era values
    # restore into a fully-sharded (ZeRO-3) layout and train.
    template_f = shard_train_state(
        mesh_b, state, tensor_parallel=False, fsdp=True
    )
    restored_f, _ = restore_checkpoint(str(tmp_path / "ckpt"), template_f)
    kf = restored_f.params["encoder_blocks"]["mlp"]["fc1"]["kernel"]
    assert not kf.sharding.is_fully_replicated
    np.testing.assert_allclose(
        np.asarray(restored_f.params["patch_embed"]["kernel"]),
        np.asarray(state_a.params["patch_embed"]["kernel"]),
        atol=0,
    )
    cont_f, m_f = step(restored_f, batch_b, jax.random.key(1))
    assert np.isfinite(float(m_f["loss"]))


def test_make_mesh_shapes_and_slice_divisibility():
    from cross_scale_mae_tpu.parallel import make_mesh

    m = make_mesh(model_parallel=2)
    assert m.devices.shape == (4, 2) and m.axis_names == ("data", "model")
    # num_slices participates in divisibility checks even on the CPU
    # fallback path (virtual devices carry no DCN topology).
    m2 = make_mesh(model_parallel=2, num_slices=2)
    assert m2.devices.shape == (4, 2)
    with pytest.raises(AssertionError):
        make_mesh(model_parallel=2, num_slices=3)
