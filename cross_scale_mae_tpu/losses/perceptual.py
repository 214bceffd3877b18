"""VGG16-style perceptual (feature + Gram style) loss in JAX.

The reference carries ``util/vggloss.py`` (VGG16 feature-L1 + optional Gram
style loss) as an optional capability — it is defined but never wired in.
This module rebuilds it TPU-natively:

* The VGG16 feature trunk (conv1_1 .. conv4_3, the ``features[:23]`` slice of
  torchvision's VGG16 used at ``util/vggloss.py:11-14``) is implemented as
  plain NHWC convolutions with tap points after blocks (relu1_2, relu2_2,
  relu3_3, relu4_3).
* Weights: pretrained torchvision weights can be imported with
  :func:`load_torch_vgg16_features` (zero-egress environments won't have
  them); otherwise :func:`init_vgg16_params` gives a He-initialized *random*
  trunk. Random-feature perceptual losses are a known-good signal
  (random-VGG perceptual loss literature), and the loss stays deterministic
  under a fixed seed — but it is NOT numerically the torchvision loss.
  Document which one a run used.
"""

from __future__ import annotations

from typing import Any, Sequence

import numpy as np

import jax
import jax.numpy as jnp

# (out_channels, num_convs) per VGG16 stage that vggloss.py taps.
_VGG16_STAGES = ((64, 2), (128, 2), (256, 3), (512, 3))
_IMAGENET_MEAN = (0.485, 0.456, 0.406)
_IMAGENET_STD = (0.229, 0.224, 0.225)


def init_vgg16_params(rng: jax.Array, in_channels: int = 3) -> dict:
    """He-init random VGG16 trunk parameters (NHWC, HWIO kernels)."""
    params: dict[str, Any] = {}
    c_in = in_channels
    keys = jax.random.split(rng, sum(n for _, n in _VGG16_STAGES))
    k = 0
    for stage, (c_out, n_convs) in enumerate(_VGG16_STAGES):
        for conv in range(n_convs):
            fan_in = 3 * 3 * c_in
            w = jax.random.normal(keys[k], (3, 3, c_in, c_out), jnp.float32)
            w = w * np.sqrt(2.0 / fan_in)
            params[f"conv{stage}_{conv}"] = {
                "kernel": w,
                "bias": jnp.zeros((c_out,), jnp.float32),
            }
            c_in = c_out
            k += 1
    return params


def load_torch_vgg16_features(path: str) -> dict:
    """Import torchvision VGG16 ``features`` weights from a .pth state dict.

    Accepts either a full VGG16 state dict (keys ``features.N.weight``) or a
    bare features module dump. Kernel layout converts OIHW -> HWIO.
    """
    import torch  # CPU torch is available in the image

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    # torchvision indices of the conv layers inside `features` up to conv4_3
    conv_idx = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21]
    params: dict[str, Any] = {}
    flat = 0
    for stage, (_, n_convs) in enumerate(_VGG16_STAGES):
        for conv in range(n_convs):
            i = conv_idx[flat]
            key_w = f"features.{i}.weight" if f"features.{i}.weight" in sd else f"{i}.weight"
            key_b = key_w.replace("weight", "bias")
            w = jnp.asarray(sd[key_w].numpy().transpose(2, 3, 1, 0))
            b = jnp.asarray(sd[key_b].numpy())
            params[f"conv{stage}_{conv}"] = {"kernel": w, "bias": b}
            flat += 1
    return params


def _conv_relu(x: jnp.ndarray, p: dict) -> jnp.ndarray:
    dn = jax.lax.conv_dimension_numbers(
        x.shape, p["kernel"].shape, ("NHWC", "HWIO", "NHWC")
    )
    x = jax.lax.conv_general_dilated(
        x, p["kernel"].astype(x.dtype), (1, 1), "SAME", dimension_numbers=dn
    )
    return jax.nn.relu(x + p["bias"].astype(x.dtype))


def _max_pool_2x(x: jnp.ndarray) -> jnp.ndarray:
    return jax.lax.reduce_window(
        x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
    )


def vgg16_features(params: dict, x: jnp.ndarray) -> list[jnp.ndarray]:
    """Tap activations after each stage's last relu (vggloss.py block splits)."""
    taps = []
    for stage, (_, n_convs) in enumerate(_VGG16_STAGES):
        for conv in range(n_convs):
            x = _conv_relu(x, params[f"conv{stage}_{conv}"])
        taps.append(x)
        if stage < len(_VGG16_STAGES) - 1:
            x = _max_pool_2x(x)
    return taps


def perceptual_loss(
    params: dict,
    pred: jnp.ndarray,
    target: jnp.ndarray,
    feature_layers: Sequence[int] = (0, 1, 2, 3),
    style_layers: Sequence[int] = (),
    resize_to: int | None = 224,
) -> jnp.ndarray:
    """Feature-L1 (+ optional Gram style L1) between NHWC images in [0,1].

    Mirrors util/vggloss.py:28-55: ImageNet-normalize, optional bilinear
    resize to 224, L1 over tapped activations.
    """
    from cross_scale_mae_tpu.ops.image import normalize_images, resize

    pred = pred.astype(jnp.float32)
    target = target.astype(jnp.float32)
    if pred.shape[-1] != 3:
        pred = jnp.repeat(pred[..., :1], 3, axis=-1)
        target = jnp.repeat(target[..., :1], 3, axis=-1)
    pred = normalize_images(pred, _IMAGENET_MEAN, _IMAGENET_STD)
    target = normalize_images(target, _IMAGENET_MEAN, _IMAGENET_STD)
    if resize_to is not None and pred.shape[1] != resize_to:
        pred = resize(pred, resize_to, method="linear")
        target = resize(target, resize_to, method="linear")
    feats_p = vgg16_features(params, pred)
    feats_t = vgg16_features(params, target)
    loss = jnp.float32(0.0)
    for i, (fp, ft) in enumerate(zip(feats_p, feats_t)):
        if i in feature_layers:
            loss += jnp.mean(jnp.abs(fp - ft))
        if i in style_layers:
            n, h, w, c = fp.shape
            ap = fp.reshape(n, h * w, c)
            at = ft.reshape(n, h * w, c)
            gram_p = jnp.einsum("nxc,nxd->ncd", ap, ap)
            gram_t = jnp.einsum("nxc,nxd->ncd", at, at)
            loss += jnp.mean(jnp.abs(gram_p - gram_t))
    return loss
