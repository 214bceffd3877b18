"""Adam moment-dtype experiments: equivalence + bounded divergence.

``scale_by_adam_moment_dtypes`` (train/optim.py) exists because optax's
``adamw`` exposes only ``mu_dtype`` and the optimizer-pass HBM case
(VALIDATION §5) needs a bf16 SECOND moment too. Two guards:

1. At fp32/fp32 the custom chain must be numerically indistinguishable from
   ``optax.adamw`` — the experiment's control arm IS the production rule.
2. With bf16 moments the parameter trajectory must stay within a bounded
   envelope of the fp32 trajectory over a real multi-step MAE run (lockstep
   divergence), so flipping the flag cannot silently train a different
   model. The bound is deliberately loose (storage rounding compounds) but
   catches sign/scale bugs instantly.
"""

from __future__ import annotations

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def _tiny_setup(mu_dtype=None, nu_dtype=None, use_optax_ref=False):
    from cross_scale_mae_tpu.configs import TrainConfig, get_mae_config
    from cross_scale_mae_tpu.models import mae_init
    from cross_scale_mae_tpu.train import (
        TrainState, build_optimizer, warmup_half_cosine,
    )
    from cross_scale_mae_tpu.train.pretrain import make_pretrain_step

    cfg = get_mae_config(
        "mae_vit_tiny_MsLdCeCd", input_size=32, patch_size=8,
        compute_dtype="float32", attention_impl="xla",
    )
    tcfg = TrainConfig(epochs=1, warmup_epochs=0, blr=1e-3)
    sched = warmup_half_cosine(1e-3, 0.0, 0, 1, 100)
    params, mstate = mae_init(jax.random.key(0), cfg)
    if use_optax_ref:
        import optax

        from cross_scale_mae_tpu.train.optim import wd_mask

        tx = optax.adamw(
            learning_rate=sched, b1=0.9, b2=0.95, eps=1e-8,
            weight_decay=0.05, mask=wd_mask(params),
        )
    else:
        tx = build_optimizer(
            params, sched, weight_decay=0.05,
            mu_dtype=mu_dtype,
            # nu_dtype=fp32 still routes through the custom scale_by_adam
            # (None means "use optax.adamw") — that is exactly the
            # control-arm equivalence this file pins.
            nu_dtype=nu_dtype,
        )
    state = TrainState.create(params, mstate, tx)
    step = make_pretrain_step(cfg, tcfg, sched, donate=False)
    return state, step


def _run(state, step, n_steps, imgs):
    losses = []
    for i in range(n_steps):
        state, metrics = step(state, imgs, jax.random.key(7))
        losses.append(float(metrics["loss"]))
    return state, losses


@pytest.fixture(scope="module")
def batch():
    rng = np.random.default_rng(3)
    return jnp.asarray(rng.normal(size=(8, 32, 32, 3)), jnp.float32)


def test_custom_adam_matches_optax_transform_level():
    """Control arm, transformation level: the custom ``scale_by_adam`` at
    fp32/fp32 must match ``optax.scale_by_adam`` to float reassociation
    noise (1-2 ulp of the O(1) Adam updates) on every update of a 10-step
    synthetic-gradient run. Measured 2.4e-7 max on this toolchain."""
    import optax

    from cross_scale_mae_tpu.train.optim import scale_by_adam_moment_dtypes

    rng = np.random.default_rng(0)
    params = {
        "w": jnp.asarray(rng.normal(size=(64, 32)), jnp.float32),
        "b": jnp.asarray(rng.normal(size=(32,)), jnp.float32),
    }
    ref = optax.scale_by_adam(b1=0.9, b2=0.95, eps=1e-8)
    cus = scale_by_adam_moment_dtypes(
        b1=0.9, b2=0.95, eps=1e-8, mu_dtype="float32", nu_dtype="float32"
    )
    s_ref, s_cus = ref.init(params), cus.init(params)
    for _ in range(10):
        g = jax.tree.map(
            lambda p: jnp.asarray(rng.normal(size=p.shape), jnp.float32), params
        )
        u_ref, s_ref = ref.update(g, s_ref, params)
        u_cus, s_cus = cus.update(g, s_cus, params)
        for a, b in zip(jax.tree.leaves(u_ref), jax.tree.leaves(u_cus)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=1e-6
            )


def test_custom_adam_matches_optax_fp32(batch):
    """Control arm, model level: whole-chain fp32/fp32 vs optax.adamw over
    5 real MAE steps. Adam near init amplifies 1-ulp update reassociation
    (g/sqrt(v) trajectories fork), so the bound here is the amplified one —
    measured 1.1e-5 max param diff on this toolchain; 1e-4 allowed. The
    tight per-update equality lives in the transform-level test above."""
    s_opt, step_opt = _tiny_setup(use_optax_ref=True)
    s_cus, step_cus = _tiny_setup(mu_dtype="float32", nu_dtype="float32")
    s_opt, l_opt = _run(s_opt, step_opt, 5, batch)
    s_cus, l_cus = _run(s_cus, step_cus, 5, batch)
    np.testing.assert_allclose(l_opt, l_cus, rtol=0, atol=1e-5)
    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(s_opt.params),
        jax.tree_util.tree_leaves_with_path(s_cus.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=0, atol=1e-4,
            err_msg=jax.tree_util.keystr(path),
        )


@pytest.mark.parametrize("mu_dtype,nu_dtype", [
    ("bfloat16", None),            # optax path (mu_dtype only)
    ("bfloat16", "bfloat16"),      # custom path, both moments bf16
])
def test_bf16_moments_bounded_divergence(batch, mu_dtype, nu_dtype):
    """Lockstep divergence vs fp32 stays inside the update-scale envelope.

    30 steps at lr 1e-3: cumulative update magnitude is O(30 * 1e-3 * ||u||)
    per leaf with unit-RMS Adam updates; bf16 moment storage perturbs each
    step's direction by O(2^-8) relatively. Allow 10% relative drift on the
    final params and require the loss curves to track within 5%."""
    s_ref, step_ref = _tiny_setup()
    s_bf, step_bf = _tiny_setup(mu_dtype=mu_dtype, nu_dtype=nu_dtype)
    s_ref, l_ref = _run(s_ref, step_ref, 30, batch)
    s_bf, l_bf = _run(s_bf, step_bf, 30, batch)

    assert l_bf[-1] < l_bf[0], "bf16-moment run must still be training"
    np.testing.assert_allclose(l_ref, l_bf, rtol=0.05)

    for (path, a), (_, b) in zip(
        jax.tree_util.tree_leaves_with_path(s_ref.params),
        jax.tree_util.tree_leaves_with_path(s_bf.params),
    ):
        a, b = np.asarray(a, np.float64), np.asarray(b, np.float64)
        denom = np.linalg.norm(a) + 1e-12
        rel = np.linalg.norm(a - b) / denom
        assert rel < 0.10, (jax.tree_util.keystr(path), rel)


def test_bf16_nu_state_dtype(batch):
    """The flag must actually shrink the stored moments (both bf16)."""
    s_bf, step_bf = _tiny_setup(mu_dtype="bfloat16", nu_dtype="bfloat16")
    s_bf, _ = _run(s_bf, step_bf, 1, batch)

    from cross_scale_mae_tpu.train.optim import ScaleByAdamState

    adam_states = [
        s for s in jax.tree.leaves(
            s_bf.opt_state, is_leaf=lambda x: isinstance(x, ScaleByAdamState)
        )
        if isinstance(s, ScaleByAdamState)
    ]
    assert adam_states, "custom ScaleByAdamState not found in opt_state"
    for st in adam_states:
        for leaf in jax.tree.leaves(st.mu) + jax.tree.leaves(st.nu):
            assert leaf.dtype == jnp.bfloat16, leaf.dtype
