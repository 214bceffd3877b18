"""Model-level tests: forward shapes, loss composition, param counts, init stats."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from cross_scale_mae_tpu.configs import get_mae_config, get_vit_config
from cross_scale_mae_tpu.models import (
    mae_apply,
    mae_encode,
    mae_init,
    mae_loss_fn,
    vit_apply,
    vit_init,
)

TINY = get_mae_config(
    "mae_vit_tiny", input_size=32, patch_size=8, compute_dtype="float32"
)


def _count(params):
    return sum(int(np.prod(p.shape)) for p in jax.tree.leaves(params))


def make_imgs(n=4, size=32, c=3, seed=0):
    rng = np.random.default_rng(seed)
    return jnp.asarray(rng.normal(size=(n, size, size, c)).astype(np.float32))


class TestBaseline:
    def test_forward_shapes(self):
        params, state = mae_init(jax.random.key(0), TINY)
        out = mae_apply(params, TINY, make_imgs(), jax.random.key(1))
        n, l, pdim = 4, TINY.num_patches, TINY.patch_dim
        assert out.pred.shape == (n, l, pdim)
        assert out.mask.shape == (n, l)
        assert np.isfinite(float(out.loss))
        # 0=keep 1=masked, counts set by mask_ratio
        np.testing.assert_allclose(
            np.asarray(out.mask.sum(axis=1)), l - TINY.len_keep
        )

    def test_param_count_matches_formula(self):
        cfg = TINY
        params, _ = mae_init(jax.random.key(0), cfg)
        d, dd, L = cfg.dim_model, cfg.decoder_embed_dim, cfg.num_patches
        pd = cfg.patch_dim

        def block_params(dim):
            return (
                2 * 2 * dim                        # 2 LN
                + dim * 3 * dim + 3 * dim          # qkv
                + dim * dim + dim                  # proj
                + dim * 4 * dim + 4 * dim          # fc1
                + 4 * dim * dim + dim              # fc2
            )

        expect = (
            pd * d + d                             # patch embed
            + d + dd                               # cls + mask tokens
            + cfg.encoder_num_layers * block_params(d)
            + 2 * d                                # encoder_norm
            + d * dd + dd                          # decoder embed
            + cfg.decoder_num_layers * block_params(dd)
            + 2 * dd                               # decoder norm
            + dd * pd + pd                         # decoder pred
        )
        assert _count(params) == expect

    @pytest.mark.slow
    def test_vit_base_param_count_reference_scale(self):
        # ViT-B/16 at 224: encoder params should be ~85.8M like the reference
        # preset (models_mae/__init__.py:42-49 with timm blocks).
        cfg = get_mae_config("mae_vit_base", input_size=224, patch_size=16)
        params, _ = mae_init(jax.random.key(0), cfg)
        total = _count(params)
        assert 110e6 < total < 115e6  # encoder 85.8M + decoder ~26M

    def test_init_statistics(self):
        params, _ = mae_init(jax.random.key(0), TINY)
        cls = np.asarray(params["cls_token"])
        assert abs(cls.std() - 0.02) < 0.01
        w = np.asarray(params["encoder_blocks"]["attn"]["qkv"]["kernel"])
        # xavier uniform bound for (d, 3d)
        limit = np.sqrt(6.0 / (TINY.dim_model + 3 * TINY.dim_model))
        assert np.abs(w).max() <= limit + 1e-6
        b = np.asarray(params["encoder_blocks"]["attn"]["qkv"]["bias"])
        assert (b == 0).all()

    @pytest.mark.slow
    def test_unrolled_matches_scanned(self):
        # Execution-plan choice must not change numerics (incl. gradients).
        cfg_u = TINY.replace(scan_blocks=False)
        params, state = mae_init(jax.random.key(0), TINY)
        imgs = make_imgs()
        loss_s = mae_loss_fn(params, state, TINY, imgs, jax.random.key(1)).loss
        loss_u = mae_loss_fn(params, state, cfg_u, imgs, jax.random.key(1)).loss
        np.testing.assert_allclose(float(loss_s), float(loss_u), rtol=1e-6)
        g_s = jax.grad(
            lambda p: mae_loss_fn(p, state, TINY, imgs, jax.random.key(1)).loss
        )(params)
        g_u = jax.grad(
            lambda p: mae_loss_fn(p, state, cfg_u, imgs, jax.random.key(1)).loss
        )(params)
        for a, b in zip(jax.tree.leaves(g_s), jax.tree.leaves(g_u)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)

    def test_mae_encode_deterministic_features(self):
        params, _ = mae_init(jax.random.key(0), TINY)
        imgs = make_imgs()
        feats = mae_encode(params, TINY, imgs)
        assert feats.shape == (4, TINY.num_patches + 1, TINY.dim_model)
        np.testing.assert_array_equal(
            np.asarray(feats), np.asarray(mae_encode(params, TINY, imgs))
        )

    def test_mask_seed_reproducible(self):
        params, _ = mae_init(jax.random.key(0), TINY)
        imgs = make_imgs()
        o1 = mae_apply(params, TINY, imgs, jax.random.key(5))
        o2 = mae_apply(params, TINY, imgs, jax.random.key(5))
        np.testing.assert_array_equal(np.asarray(o1.mask), np.asarray(o2.mask))
        np.testing.assert_allclose(float(o1.loss), float(o2.loss))


class TestVariants:
    @pytest.mark.parametrize(
        "variant,terms",
        [
            ("MsLd", {"loss_d"}),
            ("MsLdLe", {"loss_d", "loss_e"}),
            ("MsLdCe", {"loss_d", "loss_ce_pred"}),
            ("MsLdCd", {"loss_d", "loss_cd"}),
            ("MsLdCeCd", {"loss_d", "loss_cd", "loss_ce"}),
            ("MsLdLeCd", {"loss_d", "loss_e", "loss_cd"}),
        ],
    )
    def test_loss_terms(self, variant, terms):
        cfg = get_mae_config(
            f"mae_vit_tiny_{variant}", input_size=32, patch_size=8,
            compute_dtype="float32",
        )
        params, state = mae_init(jax.random.key(0), cfg)
        out = mae_loss_fn(params, state, cfg, make_imgs(), jax.random.key(1))
        assert set(out.losses) == terms
        total = sum(float(v) for v in out.losses.values())
        np.testing.assert_allclose(float(out.loss), total, rtol=1e-5)
        assert np.isfinite(float(out.loss))

    def test_consistent_mask(self):
        cfg = get_mae_config(
            "mae_vit_tiny_MsLd", input_size=32, patch_size=8,
            compute_dtype="float32",
        )
        params, state = mae_init(jax.random.key(0), cfg)
        imgs = make_imgs()

        # With consistent_mask the two views share per-sample masks. Verify
        # via the internal noise path: run loss twice with the same key.
        out_a = mae_loss_fn(
            params, state, cfg, imgs, jax.random.key(3), consistent_mask=True
        )
        out_b = mae_loss_fn(
            params, state, cfg, imgs, jax.random.key(3), consistent_mask=False
        )
        # Same key: the original-view mask is identical either way.
        np.testing.assert_array_equal(np.asarray(out_a.mask), np.asarray(out_b.mask))

    def test_ms_decoder_loss_mean_halves(self):
        base = get_mae_config(
            "mae_vit_tiny_MsLd", input_size=32, patch_size=8,
            compute_dtype="float32",
        )
        params, state = mae_init(jax.random.key(0), base)
        imgs = make_imgs()
        sum_out = mae_loss_fn(params, state, base, imgs, jax.random.key(1))
        mean_cfg = base.replace(ms_decoder_loss_reduction="mean")
        mean_out = mae_loss_fn(params, state, mean_cfg, imgs, jax.random.key(1))
        np.testing.assert_allclose(
            float(mean_out.losses["loss_d"]),
            float(sum_out.losses["loss_d"]) / 2,
            rtol=1e-5,
        )

    def test_predictor_bn_state_updates(self):
        cfg = get_mae_config(
            "mae_vit_tiny_MsLdCd", input_size=32, patch_size=8,
            compute_dtype="float32",
        )
        params, state = mae_init(jax.random.key(0), cfg)
        out = mae_loss_fn(params, state, cfg, make_imgs(), jax.random.key(1))
        before = np.asarray(state["predictor_cd"]["bn"]["mean"])
        after = np.asarray(out.state["predictor_cd"]["bn"]["mean"])
        assert not np.allclose(before, after)


class TestClassifier:
    @pytest.mark.slow
    def test_cls_and_global_pool_paths(self):
        for gp in (False, True):
            cfg = get_vit_config(
                "vit_base_patch16", input_size=32, num_classes=10,
                global_pool=gp, depth=2, compute_dtype="float32",
            )
            params, state = vit_init(jax.random.key(0), cfg)
            logits, _ = vit_apply(params, state, cfg, make_imgs())
            assert logits.shape == (4, 10)
            assert np.isfinite(np.asarray(logits)).all()
            assert ("fc_norm" in params) == gp
            assert ("norm" in params) != gp

    def test_bn_head_state(self):
        cfg = get_vit_config(
            "vit_base_patch16", input_size=32, num_classes=10, depth=2,
            use_bn_head=True, global_pool=True, compute_dtype="float32",
        )
        params, state = vit_init(jax.random.key(0), cfg)
        logits, new_state = vit_apply(
            params, state, cfg, make_imgs(), train=True
        )
        assert not np.allclose(
            np.asarray(state["head_bn"]["mean"]),
            np.asarray(new_state["head_bn"]["mean"]),
        )

    def test_drop_path_train_vs_eval(self):
        cfg = get_vit_config(
            "vit_base_patch16", input_size=32, num_classes=10, depth=2,
            drop_path_rate=0.5, compute_dtype="float32",
        )
        params, state = vit_init(jax.random.key(0), cfg)
        imgs = make_imgs()
        eval_logits, _ = vit_apply(params, state, cfg, imgs, train=False)
        t1, _ = vit_apply(params, state, cfg, imgs, train=True, rng=jax.random.key(1))
        t2, _ = vit_apply(params, state, cfg, imgs, train=True, rng=jax.random.key(2))
        assert not np.allclose(np.asarray(t1), np.asarray(t2))
        assert np.isfinite(np.asarray(t1)).all()


class TestAttentionImpls:
    def test_pallas_matches_xla(self):
        from cross_scale_mae_tpu.ops.attention import pallas_mha, xla_mha

        rng = np.random.default_rng(0)
        q = jnp.asarray(rng.normal(size=(2, 16, 4, 8)).astype(np.float32))
        k = jnp.asarray(rng.normal(size=(2, 16, 4, 8)).astype(np.float32))
        v = jnp.asarray(rng.normal(size=(2, 16, 4, 8)).astype(np.float32))
        ref = xla_mha(q, k, v)
        got = pallas_mha(q, k, v, interpret=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref), atol=1e-5)

    def test_local_and_fourier_variants(self):
        # Flag-surface parity with the reference's --attention choices.
        from cross_scale_mae_tpu.ops.attention import fourier_mix, local_mha, xla_mha

        rng = np.random.default_rng(2)
        q, k, v = (
            jnp.asarray(rng.normal(size=(2, 12, 4, 8)).astype(np.float32))
            for _ in range(3)
        )
        local = local_mha(q, k, v, window=5)
        assert local.shape == q.shape
        # window >= 2L-1 == full attention
        wide = local_mha(q, k, v, window=2 * 12 + 1)
        np.testing.assert_allclose(
            np.asarray(wide), np.asarray(xla_mha(q, k, v)), atol=1e-5
        )
        fm = fourier_mix(q)
        assert fm.shape == q.shape and np.isfinite(np.asarray(fm)).all()

        # Full model runs with each variant
        for impl in ("local", "fourier_mix"):
            cfg = TINY.replace(attention_impl=impl)
            params, state = mae_init(jax.random.key(0), cfg)
            out = mae_apply(params, cfg, make_imgs(), jax.random.key(1))
            assert np.isfinite(float(out.loss))

    def test_parameterized_variants(self):
        # linformer/orthoformer/nystrom (xFormers names, main_pretrain.py:
        # 101-119): shape/finiteness + approximation sanity.
        from cross_scale_mae_tpu.ops.attention import (
            linformer_mha,
            nystrom_mha,
            orthoformer_mha,
            xla_mha,
        )

        rng = np.random.default_rng(4)
        n, l, h, hd = 2, 48, 4, 8
        q, k, v = (
            jnp.asarray(rng.normal(size=(n, l, h, hd)).astype(np.float32))
            for _ in range(3)
        )
        exact = np.asarray(xla_mha(q, k, v))

        e = jnp.asarray(rng.normal(size=(l, l // 4)).astype(np.float32)) * 0.3
        f = jnp.asarray(rng.normal(size=(l, l // 4)).astype(np.float32)) * 0.3
        lin = linformer_mha(q, k, v, e, f)
        assert lin.shape == q.shape and np.isfinite(np.asarray(lin)).all()
        # declared seq_len longer than actual L: rows are sliced
        e_big = jnp.concatenate([e, e], axis=0)
        f_big = jnp.concatenate([f, f], axis=0)
        np.testing.assert_allclose(
            np.asarray(linformer_mha(q, k, v, e_big, f_big)),
            np.asarray(lin), atol=1e-6,
        )

        # Nystrom approximation improves monotonically with landmarks
        # (iid-gaussian inputs are the hardest case for landmark means).
        corrs = []
        for m in (8, 24):
            ny = np.asarray(nystrom_mha(q, k, v, num_landmarks=m))
            assert np.isfinite(ny).all()
            corrs.append(np.corrcoef(ny.ravel(), exact.ravel())[0, 1])
        assert corrs[1] > corrs[0] and corrs[1] > 0.9, corrs
        # L <= landmarks falls back to exact
        np.testing.assert_allclose(
            np.asarray(nystrom_mha(q, k, v, num_landmarks=64)), exact,
            atol=1e-5,
        )

        ot = np.asarray(orthoformer_mha(q, k, v, num_landmarks=16))
        assert ot.shape == q.shape and np.isfinite(ot).all()
        np.testing.assert_allclose(
            np.asarray(orthoformer_mha(q, k, v, num_landmarks=64)), exact,
            atol=1e-5,
        )

    @pytest.mark.slow
    def test_variant_models_train(self):
        # Full MAE forward + grad with each parameterized variant (linformer
        # carries learned E/F per block).
        for impl in ("linformer", "orthoformer", "nystrom"):
            cfg = TINY.replace(attention_impl=impl)
            params, state = mae_init(jax.random.key(0), cfg)
            if impl == "linformer":
                e = params["encoder_blocks"]["attn"]["e_proj"]
                assert e.shape[1] == cfg.num_patches + 1  # stacked layers
            out = mae_apply(params, cfg, make_imgs(), jax.random.key(1))
            assert np.isfinite(float(out.loss))
            g = jax.grad(
                lambda p: mae_apply(p, cfg, make_imgs(), jax.random.key(1)).loss
            )(params)
            gsum = float(
                sum(jnp.sum(jnp.abs(x)) for x in jax.tree.leaves(g))
            )
            assert np.isfinite(gsum) and gsum > 0

    def test_pallas_v2_qkv_matches_xla_fwd_and_vjp(self):
        # v2: transpose-free qkv-layout kernel (EXPERIMENTAL — crashes this
        # toolchain's Mosaic compiler on TPU, kept for a future toolchain;
        # see benchmarks/probe_mosaic.py findings table). Interpreter-mode
        # numerics must stay correct so the kernel is ready when the
        # toolchain fixes land.
        from cross_scale_mae_tpu.ops.attention import pallas_mha_qkv, xla_mha

        rng = np.random.default_rng(5)
        n, l, h, hd = 2, 16, 4, 8
        qkv = jnp.asarray(
            rng.normal(size=(n, l, 3 * h, hd)).astype(np.float32))

        def ref(q4):
            return xla_mha(q4[:, :, :h], q4[:, :, h:2 * h], q4[:, :, 2 * h:])

        got = pallas_mha_qkv(qkv, h, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref(qkv)),
                                   atol=1e-5)
        g_ref = jax.grad(lambda q4: (ref(q4) ** 2).sum())(qkv)
        g_v2 = jax.grad(
            lambda q4: (pallas_mha_qkv(q4, h, True) ** 2).sum()
        )(qkv)
        np.testing.assert_allclose(np.asarray(g_v2), np.asarray(g_ref),
                                   atol=1e-5)

    def test_pallas_v3_matches_xla_fwd_and_vjp(self):
        # v3: natural-layout kernel on the raw qkv projection output.
        from cross_scale_mae_tpu.ops.attention import pallas_mha_v3, xla_mha

        rng = np.random.default_rng(3)
        n, l, h, hd = 2, 16, 4, 8
        d = h * hd
        qkv = jnp.asarray(rng.normal(size=(n, l, 3 * d)).astype(np.float32))

        def ref(q3):
            r = q3.reshape(n, l, 3, h, hd)
            return xla_mha(r[:, :, 0], r[:, :, 1], r[:, :, 2]).reshape(n, l, d)

        got = pallas_mha_v3(qkv, h, True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(ref(qkv)),
                                   atol=1e-5)
        g_ref = jax.grad(lambda q3: (ref(q3) ** 2).sum())(qkv)
        g_v3 = jax.grad(
            lambda q3: (pallas_mha_v3(q3, h, True) ** 2).sum()
        )(qkv)
        np.testing.assert_allclose(np.asarray(g_v3), np.asarray(g_ref),
                                   atol=1e-5)

    def test_pallas_v3_full_model_and_sharded(self):
        # End-to-end MAE loss with the v3 kernel, on the 8-device mesh via
        # the custom_partitioning wrapper (GSPMD path).
        from jax.sharding import NamedSharding, PartitionSpec as P

        from cross_scale_mae_tpu.parallel import make_mesh

        cfg = TINY.replace(attention_impl="pallas_v3")
        params, state = mae_init(jax.random.key(0), cfg)
        imgs = make_imgs(8)  # divisible over the 8-way data axis
        out = mae_apply(params, cfg, imgs, jax.random.key(1))
        assert np.isfinite(float(out.loss))

        mesh = make_mesh(model_parallel=1)
        imgs8 = jax.device_put(imgs, NamedSharding(mesh, P("data")))
        loss8 = jax.jit(
            lambda p, x: mae_apply(p, cfg, x, jax.random.key(1)).loss
        )(params, imgs8)
        np.testing.assert_allclose(float(loss8), float(out.loss), rtol=1e-5)

    def test_pallas_vjp_matches_xla(self):
        from cross_scale_mae_tpu.ops.attention import pallas_mha, xla_mha

        rng = np.random.default_rng(1)
        q, k, v = (
            jnp.asarray(rng.normal(size=(2, 16, 4, 8)).astype(np.float32))
            for _ in range(3)
        )
        g_ref = jax.grad(
            lambda q, k, v: (xla_mha(q, k, v) ** 2).sum(), argnums=(0, 1, 2)
        )(q, k, v)
        g_pal = jax.grad(
            lambda q, k, v: (pallas_mha(q, k, v, interpret=True) ** 2).sum(),
            argnums=(0, 1, 2),
        )(q, k, v)
        for a, b in zip(g_ref, g_pal):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


class TestGeluFastBwd:
    """Fast-backward exact GELU (layers.gelu_exact_fastbwd, round 5).

    The strict-parity flagship leg pays ~15% for exact-erf GELU; most of it
    is the backward re-deriving the erf over the (N, L, 4D) activation.
    ``gelu='exact_tanhbwd'`` keeps the forward BIT-IDENTICAL to
    ``jax.nn.gelu(approximate=False)`` (torch nn.GELU / timm Block,
    MAE_ViT_Baseline.py:160-188) and swaps only the backward for the
    tanh-GELU derivative (+7.3% flagship, VALIDATION.md 5b).
    Exhaustiveness note: bf16 has 65536 bit patterns, so forward
    bit-exactness is checked on ALL of them, not a sample.
    """

    def test_forward_bit_exact_all_bf16(self):
        from cross_scale_mae_tpu.models import layers

        bits = np.arange(65536, dtype=np.uint16)
        x = jnp.asarray(bits).view(jnp.bfloat16)
        ref = jax.jit(lambda v: jax.nn.gelu(v, approximate=False))(x)
        ref_nan = np.isnan(np.asarray(ref, np.float32))
        out = jax.jit(layers.gelu_exact_fastbwd)(x)
        assert np.array_equal(ref_nan, np.isnan(np.asarray(out, np.float32)))
        mism = (
            np.asarray(ref.view(jnp.uint16)) != np.asarray(out.view(jnp.uint16))
        ) & ~ref_nan
        assert int(mism.sum()) == 0, f"{int(mism.sum())} mismatches"

    def test_backward_within_one_bf16_ulp(self):
        from cross_scale_mae_tpu.models import layers

        xs = jnp.asarray(np.linspace(-8, 8, 50001), jnp.bfloat16)
        g_ref = jax.jit(
            jax.grad(lambda v: jax.nn.gelu(v, approximate=False).sum())
        )(xs)
        g_new = jax.jit(
            jax.grad(lambda v: layers.gelu_exact_fastbwd(v).sum())
        )(xs)
        dev = np.max(np.abs(
            np.asarray(g_ref, np.float32) - np.asarray(g_new, np.float32)
        ))
        # measured max 2^-7 = one bf16 ulp at |grad|~1
        assert dev <= 2 ** -7 + 1e-9, f"{dev}"

    def test_model_plumbing_and_config_roundtrip(self):
        from cross_scale_mae_tpu.configs import GELU_MODES, MAEConfig

        imgs = make_imgs()
        cfg = TINY.replace(gelu="exact_tanhbwd")
        params, _mstate = mae_init(jax.random.key(0), cfg)
        out = mae_apply(params, cfg, imgs, jax.random.key(1))
        assert np.isfinite(float(out.loss))
        # exact forward => loss identical to gelu='exact'
        out_e = mae_apply(
            params, TINY.replace(gelu="exact"), imgs, jax.random.key(1)
        )
        np.testing.assert_allclose(
            float(out.loss), float(out_e.loss), rtol=0, atol=0
        )
        back = MAEConfig.from_json(cfg.to_json())
        assert back.gelu == "exact_tanhbwd"
        assert "exact_tanhbwd" in GELU_MODES
        with pytest.raises(ValueError):
            MAEConfig.from_json(TINY.replace(gelu="nope").to_json())
