"""SSL-transfer ablation round 2: shape-CONFIGURATION classes + finetune arm.

Follow-up to benchmarks/transfer_ablation.py, whose measured result was an
honest negative: on texture-frequency classes, a linear probe on a RANDOM
frozen tiny ViT beats the pretrained one — random patch projections are
near-ideal texture bases, so toy-scale frozen probes cannot rank SSL
encoders on texture tasks (docs/VALIDATION.md §8).

This script attacks the two confounds that analysis identified:

1. **Dataset**: classes are defined by spatial CONFIGURATION, not texture.
   Four area-matched shapes (disk / annulus / cross / two parallel bars)
   at random position + rotation on a random-grating background with
   shared gain + pixel noise. Pooled first-order and orientation
   statistics are (near-)class-uninformative by construction — the
   cross vs parallel-bars pair in particular shares bar width, total
   area, and edge-orientation distribution, differing only in
   arrangement. Texture shortcuts that random-Fourier patch features
   excel at are gone.

2. **Protocol**: adds the classic low-label FINETUNE arm (pretrained init
   vs random init, identical recipe — cli/finetune.py, the reference
   main_finetune.py math). SSL gains are canonically largest here, and
   finetuning sidesteps the frozen-probe pathology entirely (the head no
   longer has to be linear in whatever basis the trunk happens to span).

Both arms run with identical hyperparameters and seeds; results are
recorded in docs/VALIDATION.md §8 whichever way they come out.

Run: python benchmarks/transfer_ablation_shapes.py
       [--workdir /tmp/csmae_ablate_shapes] [--platform cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import numpy as np

from transfer_ablation import run_probe, subset_csv

CLASSES = ("disk", "annulus", "cross", "parallel")
AREA = 400.0  # px^2, matched across classes
SIZE = 64


def _shape_mask(cls: int, size: int, cx: float, cy: float, theta: float):
    """Boolean mask for one area-matched shape at (cx, cy), rotated theta."""
    coord = np.arange(size, dtype=np.float32)
    yy, xx = np.meshgrid(coord, coord, indexing="ij")
    # Shape-frame coordinates (rotate the frame by -theta around the center).
    dx, dy = xx - cx, yy - cy
    u = dx * np.cos(theta) + dy * np.sin(theta)
    v = -dx * np.sin(theta) + dy * np.cos(theta)
    if cls == 0:  # disk, pi r^2 = AREA
        r2 = AREA / np.pi
        return u * u + v * v <= r2
    if cls == 1:  # annulus, outer R=15, inner chosen for area match
        R = 15.0
        ri2 = R * R - AREA / np.pi
        rr = u * u + v * v
        return (rr <= R * R) & (rr >= ri2)
    w = 6.0
    if cls == 2:  # cross: two orthogonal bars, 2wL - w^2 = AREA
        L = (AREA + w * w) / (2 * w)
        return ((np.abs(u) <= w / 2) & (np.abs(v) <= L / 2)) | (
            (np.abs(v) <= w / 2) & (np.abs(u) <= L / 2))
    # parallel: two bars along v, 2wL = AREA, centers at u = +-d
    L, d = AREA / (2 * w), 8.0
    return ((np.abs(u - d) <= w / 2) | (np.abs(u + d) <= w / 2)) & (
        np.abs(v) <= L / 2)


def make_dataset(root: str, n_per_class: int = 400, size: int = SIZE,
                 seed: int = 0):
    """Area-matched shapes on random-grating backgrounds (see module doc)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)
    rows_train, rows_val = [], []
    coord = np.arange(size, dtype=np.float32) - size / 2
    yy, xx = np.meshgrid(coord, coord, indexing="ij")
    margin = 20  # max shape half-extent (~L/2 + slack); keeps shapes inside
    for cls in range(len(CLASSES)):
        for i in range(n_per_class):
            # Background: random grating (period/angle/phase all nuisance,
            # same distribution for every class).
            period = rng.uniform(5, 18)
            bg_theta = rng.uniform(0, np.pi)
            phase = rng.uniform(0, 2 * np.pi)
            proj = xx * np.cos(bg_theta) + yy * np.sin(bg_theta)
            bg = 0.5 + 0.18 * np.sin(2 * np.pi * proj / period + phase)
            # Foreground: brightness offset inside the shape mask.
            cx = rng.uniform(margin, size - margin)
            cy = rng.uniform(margin, size - margin)
            theta = rng.uniform(0, np.pi)
            mask = _shape_mask(cls, size, cx, cy, theta)
            img = bg + 0.35 * mask
            gain = rng.uniform(0.55, 0.95)  # shared across channels
            arr = np.broadcast_to(img[..., None], (size, size, 3))
            arr = arr * gain * 200.0 + rng.normal(0, 15, (size, size, 3))
            arr = np.clip(arr, 0, 255).astype(np.uint8)
            name = f"{CLASSES[cls]}_{i:04d}.jpg"
            Image.fromarray(arr).save(os.path.join(root, name), quality=92)
            (rows_val if i % 5 == 0 else rows_train).append((cls, name))
    for split, rows in (("train", rows_train), ("val", rows_val)):
        with open(os.path.join(root, f"{split}.csv"), "w") as f:
            f.write("category,image_path\n")
            for cls, name in rows:
                f.write(f"{cls},{name}\n")
    return (os.path.join(root, "train.csv"), os.path.join(root, "val.csv"),
            len(rows_train), len(rows_val))


def make_constellation_dataset(root: str, n_classes: int = 62,
                               n_per_class: int = 400, size: int = SIZE,
                               seed: int = 0, dots: int = 5):
    """Class-RICH configuration dataset: each class is a fixed constellation.

    Built for the §8c positive control (VERDICT r4 §next-6): with 4 classes
    the NT-Xent denominator is mostly FALSE negatives (any two random
    samples are same-class with p=1/4), which structurally penalizes the
    contrastive term. 62 classes mimic fMoW's label space (util/datasets.py
    fMoW has 62 categories) and make the negatives pool honest (p=1/62).

    Class definition: ``dots`` disk centers drawn ONCE per class (class-
    seeded) inside the unit disc, min-separation enforced by rejection.
    Each image renders that constellation under a random global rotation /
    scale / translation on the same random-grating background as
    ``make_dataset`` — classification requires recognizing the spatial
    CONFIGURATION; no texture or area cue separates classes (total disk
    area is identical across classes)."""
    from PIL import Image

    rng = np.random.default_rng(seed)
    os.makedirs(root, exist_ok=True)

    # Per-class constellations (unit-disc coordinates, min separation 0.55).
    constellations = []
    for cls in range(n_classes):
        crng = np.random.default_rng(1_000_003 * (seed + 1) + cls)
        pts: list[np.ndarray] = []
        while len(pts) < dots:
            p = crng.uniform(-1, 1, 2)
            if np.linalg.norm(p) > 1:
                continue
            if pts and min(np.linalg.norm(p - q) for q in pts) < 0.55:
                continue
            pts.append(p)
        constellations.append(np.stack(pts))

    dot_r2 = (AREA / dots) / np.pi  # per-dot radius^2, area-matched total
    coord = np.arange(size, dtype=np.float32)
    yy, xx = np.meshgrid(coord, coord, indexing="ij")
    coord_c = coord - size / 2
    yyc, xxc = np.meshgrid(coord_c, coord_c, indexing="ij")
    rows_train, rows_val = [], []
    for cls in range(n_classes):
        base_pts = constellations[cls]
        for i in range(n_per_class):
            period = rng.uniform(5, 18)
            bg_theta = rng.uniform(0, np.pi)
            phase = rng.uniform(0, 2 * np.pi)
            proj = xxc * np.cos(bg_theta) + yyc * np.sin(bg_theta)
            bg = 0.5 + 0.18 * np.sin(2 * np.pi * proj / period + phase)

            theta = rng.uniform(0, 2 * np.pi)
            scale = rng.uniform(14.0, 20.0)  # unit disc -> px
            rot = np.array([[np.cos(theta), -np.sin(theta)],
                            [np.sin(theta), np.cos(theta)]], np.float32)
            margin = scale + 4
            cx = rng.uniform(margin, size - margin)
            cy = rng.uniform(margin, size - margin)
            centers = base_pts @ rot.T * scale + np.array([cx, cy])

            mask = np.zeros((size, size), bool)
            for px, py in centers:
                mask |= (xx - px) ** 2 + (yy - py) ** 2 <= dot_r2
            img = bg + 0.35 * mask
            gain = rng.uniform(0.55, 0.95)
            arr = np.broadcast_to(img[..., None], (size, size, 3))
            arr = arr * gain * 200.0 + rng.normal(0, 15, (size, size, 3))
            arr = np.clip(arr, 0, 255).astype(np.uint8)
            name = f"c{cls:02d}_{i:04d}.jpg"
            Image.fromarray(arr).save(os.path.join(root, name), quality=92)
            (rows_val if i % 5 == 0 else rows_train).append((cls, name))
    for split, rows in (("train", rows_train), ("val", rows_val)):
        with open(os.path.join(root, f"{split}.csv"), "w") as f:
            f.write("category,image_path\n")
            for cls, name in rows:
                f.write(f"{cls},{name}\n")
    return (os.path.join(root, "train.csv"), os.path.join(root, "val.csv"),
            len(rows_train), len(rows_val))


def run_finetune(ckpt: str, train_csv: str, val_csv: str, out_dir: str,
                 epochs: int, batch_size: int = 32,
                 blr: float = 5e-3, seed: int = 0,
                 eval_interval: int = 1, nb_classes: int = 4) -> float:
    """Reference finetune recipe (layer-decay AdamW) on the tiny encoder."""
    from cross_scale_mae_tpu.cli import finetune

    res = finetune.main(finetune.get_args_parser().parse_args([
        "--model", "vit_base_patch16", "--embed_dim", "128", "--depth", "4",
        "--num_heads", "8", "--input_size", str(SIZE), "--patch_size", "8",
        "--finetune", ckpt, "--dataset_type", "fmow_rgb",
        "--train_path", train_csv, "--test_path", val_csv,
        "--nb_classes", str(nb_classes), "--batch_size", str(batch_size),
        "--epochs", str(epochs), "--warmup_epochs", "5", "--seed", str(seed),
        "--blr", str(blr), "--output_dir", out_dir, "--log_interval", "50",
        "--eval_interval", str(eval_interval),
    ]))
    return float(res["max_acc"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/csmae_ablate_shapes")
    ap.add_argument("--epochs", type=int, default=80,
                    help="pretrain epochs over the 1280-image train split")
    ap.add_argument("--probe_epochs", type=int, default=15)
    ap.add_argument("--ft_epochs", type=int, default=60)
    ap.add_argument("--ft_labels", type=int, default=50,
                    help="labels per class for the low-label finetune arm")
    ap.add_argument("--ft_blr", type=float, default=5e-3,
                    help="finetune base lr. MEASURED: the reference recipe "
                         "default (1e-3 -> lr 1.25e-4 at bs 32) is "
                         "optimization-bound at this scale — BOTH inits sit "
                         "at chance with train loss pinned at ln(4); 5e-3 "
                         "trains (random init 95.6%% full-label)")
    ap.add_argument("--ft_full_epochs", type=int, default=30,
                    help="epochs for the full-label finetune arm")
    ap.add_argument("--attention", default="xla",
                    help="pretrain attention impl (xla runs everywhere; "
                         "pallas_v3 on TPU)")
    ap.add_argument("--platform", default=None,
                    help="force a jax platform (CPU run: cpu). sitecustomize "
                         "pins jax_platforms at import, so the env var alone "
                         "does not take (tests/conftest.py recipe)")
    ap.add_argument("--reuse", action="store_true",
                    help="reuse existing dataset + pretrain checkpoint")
    ap.add_argument("--seed", type=int, default=0,
                    help="seeds the dataset generator AND every training "
                         "arm (pretrain/probe/finetune) — run several "
                         "seeds for error bars")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    pt_out = os.path.join(args.workdir, "pretrain")
    ckpt_marker = os.path.join(args.workdir, "ckpt_path.txt")
    if not (args.reuse and os.path.exists(ckpt_marker)):
        shutil.rmtree(args.workdir, ignore_errors=True)
    data = os.path.join(args.workdir, "data")
    train_csv, val_csv, n_train, n_val = make_dataset(data, seed=args.seed)
    print(f"dataset: {n_train} train / {n_val} val (classes {CLASSES}, "
          f"area-matched {AREA:.0f} px^2)", flush=True)

    # Cross-Scale MAE pretrain on the unlabeled train split.
    if args.reuse and os.path.exists(ckpt_marker):
        lines = open(ckpt_marker).read().splitlines()
        ckpt = lines[0].strip()
        ckpt_seed = int(lines[1]) if len(lines) > 1 else None
        if ckpt_seed != args.seed:
            raise SystemExit(
                f"--reuse with --seed {args.seed} but the reused pretrain "
                f"checkpoint was built with seed {ckpt_seed}: the probe/"
                f"finetune data would not match the pretrain data and the "
                f"ablation would be confounded. Re-run without --reuse or "
                f"pass --seed {ckpt_seed}.")
        print(f"reusing pretrain checkpoint: {ckpt} (seed {ckpt_seed})",
              flush=True)
    else:
        from cross_scale_mae_tpu.cli import pretrain

        res = pretrain.main(pretrain.get_args_parser().parse_args([
            "--model", "mae_vit_tiny_MsLdCeCd", "--dataset_type", "fmow_rgb",
            "--train_path", train_csv, "--input_size", str(SIZE),
            "--patch_size", "8",
            "--batch_size", "128", "--epochs", str(args.epochs),
            "--warmup_epochs", "2", "--ckpt_interval", str(args.epochs),
            "--unroll_blocks", "--attention_impl", args.attention,
            "--seed", str(args.seed),
            "--output_dir", pt_out, "--log_interval", "100",
        ]))
        ckpt = os.path.join(res["output_dir"], "checkpoints")
        with open(ckpt_marker, "w") as f:
            f.write(f"{ckpt}\n{args.seed}")
        print(f"pretrain: {res['steps']} steps, final {res['last_metrics']}",
              flush=True)

    # Arm 1: frozen linear probe, full labels (same recipe as the texture
    # ablation: random control vs pretrained).
    acc_random = run_probe("", train_csv, val_csv,
                           os.path.join(args.workdir, "probe_random"),
                           args.probe_epochs, seed=args.seed)
    print(f"probe RANDOM frozen encoder: {acc_random:.2f}%", flush=True)
    acc_pre = run_probe(ckpt, train_csv, val_csv,
                        os.path.join(args.workdir, "probe_pretrained"),
                        args.probe_epochs, seed=args.seed)
    print(f"probe PRETRAINED frozen encoder: {acc_pre:.2f}%", flush=True)

    # Arm 2: low-label finetune, pretrained init vs random init.
    low_csv = subset_csv(train_csv, args.ft_labels,
                         os.path.join(args.workdir, "ft_low.csv"))
    ft_random = run_finetune("", low_csv, val_csv,
                             os.path.join(args.workdir, "ft_random"),
                             args.ft_epochs, blr=args.ft_blr, seed=args.seed)
    print(f"finetune from RANDOM init ({args.ft_labels}/class): "
          f"{ft_random:.2f}%", flush=True)
    ft_pre = run_finetune(ckpt, low_csv, val_csv,
                          os.path.join(args.workdir, "ft_pretrained"),
                          args.ft_epochs, blr=args.ft_blr, seed=args.seed)
    print(f"finetune from PRETRAINED init ({args.ft_labels}/class): "
          f"{ft_pre:.2f}%", flush=True)

    # Arm 3: full-label finetune (sanity anchor: proves the dataset is
    # learnable by this recipe, and measures init quality without the
    # label-starvation confound).
    ftf_random = run_finetune("", train_csv, val_csv,
                              os.path.join(args.workdir, "ftf_random"),
                              args.ft_full_epochs, blr=args.ft_blr,
                              seed=args.seed)
    print(f"FULL-label finetune from RANDOM init: {ftf_random:.2f}%",
          flush=True)
    ftf_pre = run_finetune(ckpt, train_csv, val_csv,
                           os.path.join(args.workdir, "ftf_pretrained"),
                           args.ft_full_epochs, blr=args.ft_blr,
                           seed=args.seed)
    print(f"FULL-label finetune from PRETRAINED init: {ftf_pre:.2f}%",
          flush=True)

    out = {
        "probe_random_top1": acc_random, "probe_pretrained_top1": acc_pre,
        "probe_gain_points": acc_pre - acc_random,
        "ft_random_top1": ft_random, "ft_pretrained_top1": ft_pre,
        "ft_gain_points": ft_pre - ft_random,
        "ft_full_random_top1": ftf_random, "ft_full_pretrained_top1": ftf_pre,
        "ft_full_gain_points": ftf_pre - ftf_random,
        "ft_labels_per_class": args.ft_labels, "ft_blr": args.ft_blr,
        "seed": args.seed,
    }
    print(json.dumps(out), flush=True)
    print("SHAPE-TRANSFER ABLATION RECORDED "
          "(docs/VALIDATION.md §8 for interpretation)", flush=True)


if __name__ == "__main__":
    main()
