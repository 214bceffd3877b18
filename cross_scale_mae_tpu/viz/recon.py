"""Reconstruction visualization + multi-model metric sweeps.

Re-implements ``util/viz.py`` (624 LoC): checkpoint discovery + model rebuild
from stored config (``:27-89``), single-image masked reconstruction
(``:141-206``), per-epoch reconstruction plots (called from
``main_pretrain.py:590-626``), noise-injection robustness sweeps
(``:123-137``, ``:319-498``). This is the reference's only inference path
(SURVEY.md §3.4).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional, Sequence

import numpy as np

import jax
import jax.numpy as jnp

from cross_scale_mae_tpu.configs import MAEConfig
from cross_scale_mae_tpu.models.mae import mae_apply, mae_init
from cross_scale_mae_tpu.ops.image import normalize_images
from cross_scale_mae_tpu.ops.patchify import unpatchify
from cross_scale_mae_tpu.utils.metrics import calc_metric


def prepare_model(
    ckpt_dir: str, step: Optional[int] = None
) -> tuple[dict, dict, MAEConfig]:
    """Load the newest (or given-step) checkpoint and rebuild the model from
    its stored config (util/viz.py:27-89 'config travels with checkpoint')."""
    from cross_scale_mae_tpu.utils.checkpoint import latest_step

    step = step if step is not None else latest_step(ckpt_dir)
    assert step is not None, f"no checkpoint found in {ckpt_dir}"
    meta_path = os.path.join(os.path.abspath(ckpt_dir), f"meta-{step}.json")
    with open(meta_path) as f:
        meta = json.load(f)
    from cross_scale_mae_tpu.utils.checkpoint import checkpoint_kind

    if checkpoint_kind(meta) != "mae":
        raise SystemExit(
            f"{ckpt_dir} is a finetune/linprobe (classifier) checkpoint; "
            "this surface rebuilds MAE pretrain runs — use cli/export or "
            "cli/serve for classifier checkpoints")
    cfg = MAEConfig.from_json(json.dumps(meta["config"]))
    params, state = mae_init(jax.random.key(0), cfg)
    # Restore to HOST numpy (viz doesn't know the training optimizer's
    # state structure, and the checkpoint may have been written under a
    # different device topology — FSDP/TP mesh, multi-host) and keep
    # params/model_state only.
    from cross_scale_mae_tpu.utils.checkpoint import restore_arrays_host

    restored, _ = restore_arrays_host(ckpt_dir, step)
    params = jax.tree.map(
        lambda t, r: jnp.asarray(r, t.dtype), params, restored["params"]
    )
    model_state = jax.tree.map(
        lambda t, r: jnp.asarray(r, t.dtype), state, restored["model_state"]
    )
    return params, model_state, cfg


def prepare_image(
    path_or_array, cfg: MAEConfig, mean: Sequence[float], std: Sequence[float]
) -> jnp.ndarray:
    """Image file/array -> normalized (1, H, W, C) batch (util/viz.py:92-121)."""
    if isinstance(path_or_array, (str, os.PathLike)):
        from PIL import Image

        with Image.open(path_or_array) as im:
            arr = np.asarray(im.convert("RGB").resize(
                (cfg.input_size, cfg.input_size), Image.BICUBIC
            ))
    else:
        arr = np.asarray(path_or_array)
    x = arr.astype(np.float32) / 255.0
    x = normalize_images(jnp.asarray(x), mean, std)
    return x[None]


def add_noise(
    img: jnp.ndarray, rng: jax.Array, kind: str = "gaussian", amount: float = 0.1
) -> jnp.ndarray:
    """Input-noise injection for robustness sweeps (util/viz.py:123-137)."""
    if kind == "gaussian":
        return img + amount * jax.random.normal(rng, img.shape, img.dtype)
    if kind == "salt_pepper":
        u = jax.random.uniform(rng, img.shape[:-1])[..., None]
        img = jnp.where(u < amount / 2, img.min(), img)
        return jnp.where(u > 1 - amount / 2, img.max(), img)
    raise ValueError(f"unknown noise kind {kind!r}")


def run_one_image(
    params: dict,
    cfg: MAEConfig,
    img: jnp.ndarray,
    rng: jax.Array,
    mask_ratio: Optional[float] = None,
) -> dict[str, np.ndarray]:
    """Masked reconstruction of one (or a batch of) image(s)
    (util/viz.py:141-206). Returns originals/recon/masked/paste composites
    in normalized space, NHWC."""
    if mask_ratio is not None:
        cfg = cfg.replace(mask_ratio=mask_ratio)
    out = mae_apply(params, cfg, img, rng)
    recon = unpatchify(
        np.asarray(out.pred, np.float32), cfg.patch_size, cfg.input_channels
    )
    mask_img = unpatchify(
        jnp.repeat(out.mask[:, :, None], cfg.patch_dim, axis=-1),
        cfg.patch_size, cfg.input_channels,
    )
    mask_img = np.asarray(mask_img)
    img_np = np.asarray(img, np.float32)
    return {
        "original": img_np,
        "mask": mask_img,  # 1 = reconstructed
        "masked": img_np * (1 - mask_img),
        "recon": np.asarray(recon),
        "paste": img_np * (1 - mask_img) + np.asarray(recon) * mask_img,
        "loss": float(out.loss),
    }


def plot_reconstruction(
    result: dict[str, np.ndarray],
    save_path: str,
    mean: Sequence[float],
    std: Sequence[float],
    title: str = "",
):
    """4-panel original/masked/recon/paste figure (util/viz.py:231-316)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    mean = np.asarray(mean)
    std = np.asarray(std)

    def show(ax, x, name):
        x = np.clip(x * std + mean, 0, 1)
        ax.imshow(x)
        ax.set_title(name, fontsize=9)
        ax.axis("off")

    fig, axes = plt.subplots(1, 4, figsize=(10, 3))
    show(axes[0], result["original"][0], "original")
    show(axes[1], result["masked"][0], "masked")
    show(axes[2], result["recon"][0], "reconstruction")
    show(axes[3], result["paste"][0], "recon + visible")
    if title:
        fig.suptitle(title, fontsize=10)
    os.makedirs(os.path.dirname(save_path) or ".", exist_ok=True)
    fig.savefig(save_path, bbox_inches="tight", dpi=120)
    plt.close(fig)


def run_eval(
    models: dict[str, tuple[dict, MAEConfig]],
    images: Sequence[jnp.ndarray],
    mean: Sequence[float],
    std: Sequence[float],
    metrics: Sequence[str] = ("mse", "ssim"),
    noise_kinds: Sequence[Optional[str]] = (None,),
    noise_amount: float = 0.1,
    mask_ratio: float = 0.75,
    seed: int = 0,
) -> dict[str, dict[str, float]]:
    """Multi-model x multi-metric x noise sweep (util/viz.py:319-498).

    models: name -> (params, cfg). Returns name -> {metric[_noise]: value}
    averaged over images, computed on un-normalized [0,1] composites.
    """
    mean_a = np.asarray(mean)
    std_a = np.asarray(std)
    results: dict[str, dict[str, float]] = {}
    for name, (params, cfg) in models.items():
        scores: dict[str, list[float]] = {}
        for i, img in enumerate(images):
            for kind in noise_kinds:
                rng = jax.random.key(seed * 7919 + i)
                x = img if kind is None else add_noise(
                    img, jax.random.fold_in(rng, 1), kind, noise_amount
                )
                out = run_one_image(params, cfg, x, rng, mask_ratio)
                orig01 = np.clip(out["original"] * std_a + mean_a, 0, 1)
                paste01 = np.clip(out["paste"] * std_a + mean_a, 0, 1)
                for m in metrics:
                    key = m if kind is None else f"{m}_{kind}"
                    scores.setdefault(key, []).append(
                        calc_metric(orig01, paste01, m)
                    )
        results[name] = {k: float(np.mean(v)) for k, v in scores.items()}
    return results
