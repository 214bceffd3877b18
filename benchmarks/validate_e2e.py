"""End-to-end learning validation on a learnable JPEG dataset (real TPU).

Reproduces the round-1 validation recipe (docs/VALIDATION.md §1) with the
CURRENT defaults (tanh GELU, pallas attention where selected): generate a
synthetic-but-learnable JPEG dataset (4 classes with distinct hue/stripe
patterns), pretrain a tiny Cross-Scale MAE through the native C++ loader,
then linear-probe the frozen encoder. Success = linprobe val top-1 >= 90%
(round 1 hit 100%); chance is 25%.

Run: python benchmarks/validate_e2e.py [--workdir /tmp/csmae_e2e]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def make_dataset(root: str, n_per_class: int = 400, size: int = 64):
    """4 classes: (hue x stripe orientation). Deterministic."""
    from PIL import Image

    rng = np.random.default_rng(0)
    os.makedirs(root, exist_ok=True)
    rows_train, rows_val = [], []
    for cls in range(4):
        hue = np.array([(200, 60, 60), (60, 200, 60), (60, 60, 200),
                        (200, 200, 60)][cls], np.float32)
        vertical = cls % 2 == 0
        for i in range(n_per_class):
            base = rng.normal(0, 18, (size, size, 3)).astype(np.float32)
            idx = np.arange(size)[:, None] if vertical else np.arange(size)[None, :]
            stripes = ((idx // 8) % 2).astype(np.float32)
            if not vertical:
                stripes = stripes.T if stripes.shape[0] != size else stripes
            img = base + hue * (0.6 + 0.4 * stripes[..., None])
            arr = np.clip(img, 0, 255).astype(np.uint8)
            name = f"c{cls}_{i:04d}.jpg"
            Image.fromarray(arr).save(os.path.join(root, name), quality=92)
            (rows_val if i % 5 == 0 else rows_train).append((cls, name))
    for split, rows in (("train", rows_train), ("val", rows_val)):
        with open(os.path.join(root, f"{split}.csv"), "w") as f:
            f.write("category,image_path\n")
            for cls, name in rows:
                f.write(f"{cls},{name}\n")
    return (os.path.join(root, "train.csv"), os.path.join(root, "val.csv"),
            len(rows_train), len(rows_val))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/csmae_e2e")
    ap.add_argument("--epochs", type=int, default=20)
    ap.add_argument("--probe_epochs", type=int, default=15)
    args = ap.parse_args()

    shutil.rmtree(args.workdir, ignore_errors=True)
    data = os.path.join(args.workdir, "data")
    train_csv, val_csv, n_train, n_val = make_dataset(data)
    print(f"dataset: {n_train} train / {n_val} val", flush=True)

    from cross_scale_mae_tpu.cli import linprobe, pretrain

    pt_out = os.path.join(args.workdir, "pretrain")
    res = pretrain.main(pretrain.get_args_parser().parse_args([
        "--model", "mae_vit_tiny_MsLdCeCd", "--dataset_type", "fmow_rgb",
        "--train_path", train_csv, "--input_size", "64", "--patch_size", "8",
        "--batch_size", "128", "--epochs", str(args.epochs),
        "--warmup_epochs", "2", "--ckpt_interval", str(args.epochs),
        "--unroll_blocks", "--attention_impl", "pallas_v3",
        "--output_dir", pt_out, "--log_interval", "10",
    ]))
    ckpt = os.path.join(res["output_dir"], "checkpoints")
    print(f"pretrain: {res['steps']} steps, "
          f"final {res['last_metrics']}", flush=True)

    lp_out = os.path.join(args.workdir, "linprobe")
    res2 = linprobe.main(linprobe.get_args_parser().parse_args([
        "--model", "vit_base_patch16", "--embed_dim", "128", "--depth", "4",
        "--num_heads", "8", "--input_size", "64", "--patch_size", "8",
        "--finetune", ckpt, "--dataset_type", "fmow_rgb",
        "--train_path", train_csv, "--test_path", val_csv,
        "--nb_classes", "4", "--batch_size", "128",
        "--epochs", str(args.probe_epochs), "--warmup_epochs", "1",
        "--blr", "20", "--output_dir", lp_out, "--log_interval", "10",
    ]))
    out = {"pretrain_steps": res["steps"],
           "pretrain_final": {k: float(v) for k, v in res["last_metrics"].items()},
           "linprobe_max_acc": float(res2["max_acc"])}
    print(json.dumps(out), flush=True)
    assert out["linprobe_max_acc"] >= 90.0, "linear probe below 90% top-1"
    print("E2E VALIDATION OK", flush=True)


if __name__ == "__main__":
    main()
