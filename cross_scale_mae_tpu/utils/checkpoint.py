"""Checkpoint save/restore with config-in-checkpoint (Orbax).

Replaces ``util/misc.py:358-411`` (rank-0 ``torch.save`` of
{model, optimizer, epoch, scaler, args}). The TPU equivalent keeps the two
properties the reference relies on:

* **config travels with the checkpoint** — ``viz.prepare_model``
  (util/viz.py:74-79) rebuilds the model from ckpt-stored args; here a
  ``config.json`` is written beside each step directory;
* resume restores params + optimizer + epoch (and, fixed relative to the
  reference, the epoch loop actually *uses* it — main_pretrain.py:554-555
  ignores its own restored start_epoch).
"""

from __future__ import annotations

import json
import os
from typing import Any, Optional

import jax
import numpy as np

import orbax.checkpoint as ocp


def _abs(path: str) -> str:
    return os.path.abspath(os.path.expanduser(path))


def save_checkpoint(
    ckpt_dir: str,
    step: int,
    train_state,
    config_json: Optional[str] = None,
    extra: Optional[dict[str, Any]] = None,
) -> None:
    """Write {params, model_state, opt_state, step} (+ config sidecar)."""
    ckpt_dir = _abs(ckpt_dir)
    if jax.process_index() == 0:
        os.makedirs(ckpt_dir, exist_ok=True)
    payload = {
        "params": train_state.params,
        "model_state": train_state.model_state,
        "opt_state": train_state.opt_state,
        "step": train_state.step,
    }
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        mgr.save(step, args=ocp.args.StandardSave(payload))
        mgr.wait_until_finished()
    if jax.process_index() == 0:
        meta = {"step": int(step)}
        if extra:
            meta.update(extra)
        if config_json is not None:
            meta["config"] = json.loads(config_json)
        with open(os.path.join(ckpt_dir, f"meta-{step}.json"), "w") as f:
            json.dump(meta, f)


def latest_step(ckpt_dir: str) -> Optional[int]:
    ckpt_dir = _abs(ckpt_dir)
    if not os.path.isdir(ckpt_dir):
        return None
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        return mgr.latest_step()


def restore_checkpoint(ckpt_dir: str, train_state, step: Optional[int] = None):
    """Restore into the (abstract or concrete) train_state template.
    Returns (train_state, meta dict)."""
    ckpt_dir = _abs(ckpt_dir)
    template = {
        "params": train_state.params,
        "model_state": train_state.model_state,
        "opt_state": train_state.opt_state,
        "step": train_state.step,
    }
    with ocp.CheckpointManager(ckpt_dir) as mgr:
        step = step if step is not None else mgr.latest_step()
        assert step is not None, f"no checkpoints in {ckpt_dir}"
        restored = mgr.restore(step, args=ocp.args.StandardRestore(template))
    meta_path = os.path.join(ckpt_dir, f"meta-{step}.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    return (
        train_state.replace(
            params=restored["params"],
            model_state=restored["model_state"],
            opt_state=restored["opt_state"],
            step=restored["step"],
        ),
        meta,
    )


def restore_arrays_host(
    ckpt_dir: str,
    step: Optional[int] = None,
    subset: Optional[tuple] = ("params", "model_state"),
):
    """Restore a checkpoint's leaves as HOST numpy arrays, ignoring the
    device topology it was saved under.

    Inference-side loaders (``viz.prepare_model``, the export CLIs, embed)
    have no TrainState template; a template-less ``StandardRestore()``
    tries to rebuild the *saved* shardings and fails whenever the current
    process exposes a different device set (e.g. a checkpoint written on an
    8-device FSDP mesh opened on a 1-device host). Restoring to numpy
    sidesteps device placement entirely; callers ``jnp.asarray`` what they
    need.

    ``subset`` names the top-level keys to read (default: params +
    model_state — what every inference caller needs). Adam moments are ~2x
    the params; skipping ``opt_state`` cuts disk reads and peak host RAM by
    ~3x for export/viz. Pass ``subset=None`` for the full tree. Returns
    (restored dict, step)."""
    ckpt_dir = _abs(ckpt_dir)
    if step is None:
        step = latest_step(ckpt_dir)
    assert step is not None, f"no checkpoints in {ckpt_dir}"
    path = os.path.join(ckpt_dir, str(step), "default")
    ckptr = ocp.PyTreeCheckpointer()
    meta = ckptr.metadata(path).item_metadata
    tree = getattr(meta, "tree", meta)  # orbax version differences
    kwargs = {}
    if subset is not None:
        tree = {k: v for k, v in tree.items() if k in subset}
        kwargs["item"] = tree
        kwargs["transforms"] = {}  # partial restore: only keys in `item`
    restore_args = jax.tree.map(
        lambda _: ocp.RestoreArgs(restore_type=np.ndarray), tree
    )
    restored = ckptr.restore(
        path, args=ocp.args.PyTreeRestore(restore_args=restore_args, **kwargs)
    )
    return restored, step


def checkpoint_meta(ckpt_dir: str, step: int) -> dict:
    """Read the config sidecar (``meta-{step}.json``) written next to every
    checkpoint; ``{}`` when absent (pre-sidecar or foreign checkpoints)."""
    meta_path = os.path.join(_abs(ckpt_dir), f"meta-{step}.json")
    if not os.path.exists(meta_path):
        return {}
    import json

    with open(meta_path) as f:
        return json.load(f)


def checkpoint_kind(meta: dict) -> str:
    """'classifier' (finetune/linprobe run) or 'mae' (pretrain run).

    Single source of truth for the sidecar-schema rule both export CLIs
    rely on: MAE pretrain configs carry ``dim_model``, classifier configs
    carry ``embed_dim``."""
    return "classifier" if "embed_dim" in meta.get("config", {}) else "mae"


def restore_classifier_host(ckpt_dir: str, step: Optional[int] = None):
    """Rebuild a finetune/linprobe run from its config sidecar — the
    classifier analogue of ``viz.prepare_model`` (host-numpy restore, so
    any training topology opens on any serving device set). Returns
    (params, model_state, cfg)."""
    import json

    import jax
    import jax.numpy as jnp

    from cross_scale_mae_tpu.configs import ViTClassifierConfig
    from cross_scale_mae_tpu.models.vit import vit_init

    if step is None:
        step = latest_step(ckpt_dir)
    assert step is not None, f"no checkpoints in {ckpt_dir}"
    meta = checkpoint_meta(ckpt_dir, step)
    if "config" not in meta:
        raise FileNotFoundError(
            f"no config sidecar meta-{step}.json in {ckpt_dir} "
            "(classifier restore rebuilds the model from it)")
    cfg = ViTClassifierConfig.from_json(json.dumps(meta["config"]))
    params, state = vit_init(jax.random.key(0), cfg)
    restored, _ = restore_arrays_host(ckpt_dir, step)
    params = jax.tree.map(
        lambda t, r: jnp.asarray(r, t.dtype), params, restored["params"])
    state = jax.tree.map(
        lambda t, r: jnp.asarray(r, t.dtype), state, restored["model_state"])
    return params, state, cfg


def save_params_npz(path: str, params: Any, config_json: Optional[str] = None):
    """Portable single-file export (flat npz of numpy leaves) — the analogue
    of shipping a .pth; used for released-weight interchange."""
    flat = {}
    for kp, leaf in jax.tree_util.tree_leaves_with_path(params):
        key = "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in kp)
        flat[key] = np.asarray(leaf)
    if config_json is not None:
        flat["__config__"] = np.frombuffer(config_json.encode(), np.uint8)
    np.savez(path, **flat)


def load_flat_npz(path: str) -> Any:
    """Rebuild the nested dict tree from a ``save_params_npz`` file without
    a template ('/'-joined keys -> nesting). Serving-side loader for
    sidecar-weights artifacts (incl. int8-quantized trees, whose
    ``__int8__``/``scale`` nodes are plain dict levels here)."""
    data = np.load(path)
    tree: dict = {}
    for key in data.files:
        if key == "__config__":
            continue
        node = tree
        parts = key.split("/")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = data[key]
    return tree


def load_params_npz(path: str, params_template: Any) -> tuple[Any, Optional[str]]:
    data = np.load(path)
    config_json = None
    if "__config__" in data:
        config_json = bytes(data["__config__"]).decode()

    def fill(kp, leaf):
        key = "/".join(str(getattr(p, "key", getattr(p, "name", p))) for p in kp)
        arr = data[key]
        assert arr.shape == leaf.shape, (key, arr.shape, leaf.shape)
        return arr.astype(leaf.dtype)

    return jax.tree_util.tree_map_with_path(fill, params_template), config_json
