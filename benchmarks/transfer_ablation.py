"""SSL-transfer ablation: pretrained vs random frozen encoder (real TPU).

The north star's accuracy half (BASELINE.md: linprobe top-1 parity) cannot
be tested directly in this image (no fMoW data, no released checkpoints,
zero egress) — docs/VALIDATION.md §1's 100%-linprobe dataset is linearly
separable by hue, so it proves the *pipeline* learns but not that
*pretraining transfers*. This script closes that gap with a controlled
ablation on a dataset built to defeat pixel-linear shortcuts:

4 classes = sinusoidal stripe PERIOD {4, 6, 9, 14} px, with per-image
random orientation (H/V), random phase, random per-channel hue gain and
pixel noise. Mean color / any fixed pixel is class-uninformative by
construction; telling classes apart needs local-frequency features.

Protocol (identical probe hyperparams, same seed, same frozen-BN LARS
head — cli/linprobe.py, the reference main_linprobe.py recipe):
  A. linear probe on a RANDOM frozen encoder  (control; --finetune "")
  B. linear probe on the SAME architecture pretrained with Cross-Scale
     MAE (MsLdCeCd) on the unlabeled train split

MEASURED RESULT (v5e chip, 2026-08-17 — recorded in docs/VALIDATION.md):
the control WINS at this scale. Axis-aligned hue/stripe design: random
93.1% vs pretrained 88.1%. This harder rotated-grating design: random
95.3% vs pretrained 93.4% (tiny encoder, 800 pretrain steps, 1280
images). Random ViT patch projections act as random-Fourier features —
near-ideal linear bases for low-level texture tasks — so a toy-scale
probe CANNOT discriminate SSL quality in either direction; published
SSL gains appear at real dataset/model/step scale (fMoW: unavailable in
this zero-egress image). The script therefore asserts only that the
MECHANISM works (both probes converge far above chance, pretrain losses
decrease); accuracy parity with the reference rests on the numeric
lockstep-equivalence chain (tests/test_train_equivalence.py).

LOW-LABEL REGIME (also measured, also uninformative at this scale): SSL
gains classically appear at low label fractions, so the script also
probes with --probe_labels per class (default 25 -> 100 labeled images).
Measured: BOTH arms sit at chance (random 28-32% vs pretrained 25-26%,
chance 25%; probe train loss pinned at ln(4) across blr 20 and blr 2,
10x epochs) — with tens of samples the LARS/BN-head probe optimization
itself is the bottleneck, before representation quality can matter.
Recorded as part of the same scoping fact: NO toy-scale probe protocol
tried (full-label x2 designs, low-label x2 lrs) can rank SSL encoders.

Run: python benchmarks/transfer_ablation.py [--workdir /tmp/csmae_ablate]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

PERIODS = (5, 8, 12, 18)


def make_dataset(root: str, n_per_class: int = 400, size: int = 64):
    """Texture-frequency classes; nuisance angle/phase/contrast/noise.

    Gratings at a uniformly random ANGLE (not axis-aligned), closer
    periods, no hue shortcut (shared channel gain), heavy pixel noise:
    the first design (axis-aligned, distinct hues) probed at 93% on a
    RANDOM frozen encoder — too shallow to measure transfer."""
    from PIL import Image

    rng = np.random.default_rng(0)
    os.makedirs(root, exist_ok=True)
    rows_train, rows_val = [], []
    coord = np.arange(size, dtype=np.float32) - size / 2
    yy, xx = np.meshgrid(coord, coord, indexing="ij")
    for cls, period in enumerate(PERIODS):
        for i in range(n_per_class):
            phase = rng.uniform(0, 2 * np.pi)
            theta = rng.uniform(0, np.pi)
            proj = xx * np.cos(theta) + yy * np.sin(theta)
            wave = 0.5 + 0.5 * np.sin(2 * np.pi * proj / period + phase)
            gain = rng.uniform(0.55, 0.95)  # shared across channels
            img = np.broadcast_to(wave[..., None], (size, size, 3))
            arr = img * gain * 200.0 + rng.normal(0, 25, (size, size, 3))
            arr = np.clip(arr + 25.0, 0, 255).astype(np.uint8)
            name = f"p{period}_{i:04d}.jpg"
            Image.fromarray(arr).save(os.path.join(root, name), quality=92)
            (rows_val if i % 5 == 0 else rows_train).append((cls, name))
    for split, rows in (("train", rows_train), ("val", rows_val)):
        with open(os.path.join(root, f"{split}.csv"), "w") as f:
            f.write("category,image_path\n")
            for cls, name in rows:
                f.write(f"{cls},{name}\n")
    return (os.path.join(root, "train.csv"), os.path.join(root, "val.csv"),
            len(rows_train), len(rows_val))


def subset_csv(train_csv: str, per_class: int, out_path: str) -> str:
    """First `per_class` rows of each class — the low-label probe regime.

    SSL gains are classically measured at low label fractions (the full-label
    probes above saturate: random ViT projections already separate texture
    classes given enough labeled data). With ~tens of labels the head must
    generalize from features alone, which is where pretrained features can
    show an advantage a random trunk lacks."""
    import collections

    # Relative image paths resolve against the CSV's own directory
    # (data/datasets.py FmowRgbDataset), so a subset written to the workdir
    # must carry ABSOLUTE paths or every row points at a nonexistent file.
    base = os.path.dirname(os.path.abspath(train_csv))
    kept = collections.Counter()
    with open(train_csv) as f, open(out_path, "w") as out:
        out.write(f.readline())  # header
        for line in f:
            cls, path = line.rstrip("\n").split(",", 1)
            if kept[cls] < per_class:
                kept[cls] += 1
                if not os.path.isabs(path):
                    path = os.path.join(base, path)
                out.write(f"{cls},{path}\n")
    return out_path


def run_probe(ckpt: str, train_csv: str, val_csv: str, out_dir: str,
              epochs: int, batch_size: int = 128, blr: float = 20.0,
              seed: int = 0, eval_interval: int = 1,
              nb_classes: int = 4) -> float:
    from cross_scale_mae_tpu.cli import linprobe

    res = linprobe.main(linprobe.get_args_parser().parse_args([
        "--model", "vit_base_patch16", "--embed_dim", "128", "--depth", "4",
        "--num_heads", "8", "--input_size", "64", "--patch_size", "8",
        "--finetune", ckpt, "--dataset_type", "fmow_rgb",
        "--train_path", train_csv, "--test_path", val_csv,
        "--nb_classes", str(nb_classes), "--batch_size", str(batch_size),
        "--epochs", str(epochs), "--warmup_epochs", "1", "--seed", str(seed),
        "--blr", str(blr), "--output_dir", out_dir, "--log_interval", "20",
        "--eval_interval", str(eval_interval),
    ]))
    return float(res["max_acc"])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/csmae_ablate")
    ap.add_argument("--epochs", type=int, default=80)
    ap.add_argument("--probe_epochs", type=int, default=15)
    ap.add_argument("--probe_labels", type=int, default=25,
                    help="labels per class for the low-label probe")
    ap.add_argument("--probe_blr", type=float, default=2.0,
                    help="base lr for the low-label probes (the full-label "
                         "blr=20 oscillates at tiny batch/step counts: the "
                         "head cannot even fit 100 train samples with it)")
    ap.add_argument("--reuse", action="store_true",
                    help="reuse an existing workdir's dataset + pretrain "
                         "checkpoint (skips ~10 min when iterating on the "
                         "probe protocol)")
    ap.add_argument("--skip_full", action="store_true",
                    help="skip the two full-label probes (low-label only)")
    args = ap.parse_args()

    pt_out = os.path.join(args.workdir, "pretrain")
    ckpt_marker = os.path.join(args.workdir, "ckpt_path.txt")
    if not (args.reuse and os.path.exists(ckpt_marker)):
        shutil.rmtree(args.workdir, ignore_errors=True)
    data = os.path.join(args.workdir, "data")
    train_csv, val_csv, n_train, n_val = make_dataset(data)
    print(f"dataset: {n_train} train / {n_val} val "
          f"(periods {PERIODS})", flush=True)

    acc_random = acc_pre = None
    if not args.skip_full:
        # A. Control: random frozen encoder, identical probe recipe.
        acc_random = run_probe("", train_csv, val_csv,
                               os.path.join(args.workdir, "probe_random"),
                               args.probe_epochs)
        print(f"probe on RANDOM frozen encoder: {acc_random:.2f}%", flush=True)

    # B. Cross-Scale MAE pretrain on the unlabeled train split.
    if args.reuse and os.path.exists(ckpt_marker):
        ckpt = open(ckpt_marker).read().strip()
        print(f"reusing pretrain checkpoint: {ckpt}", flush=True)
    else:
        from cross_scale_mae_tpu.cli import pretrain

        res = pretrain.main(pretrain.get_args_parser().parse_args([
            "--model", "mae_vit_tiny_MsLdCeCd", "--dataset_type", "fmow_rgb",
            "--train_path", train_csv, "--input_size", "64",
            "--patch_size", "8",
            "--batch_size", "128", "--epochs", str(args.epochs),
            "--warmup_epochs", "2", "--ckpt_interval", str(args.epochs),
            "--unroll_blocks", "--attention_impl", "pallas_v3",
            "--output_dir", pt_out, "--log_interval", "20",
        ]))
        ckpt = os.path.join(res["output_dir"], "checkpoints")
        with open(ckpt_marker, "w") as f:
            f.write(ckpt)
        print(f"pretrain: {res['steps']} steps, final {res['last_metrics']}",
              flush=True)

    if not args.skip_full:
        acc_pre = run_probe(ckpt, train_csv, val_csv,
                            os.path.join(args.workdir, "probe_pretrained"),
                            args.probe_epochs)
        print(f"probe on PRETRAINED frozen encoder: {acc_pre:.2f}%",
              flush=True)

    # Low-label regime: same protocol, but the probe head sees only
    # `--probe_labels` examples per class (eval stays the full val split).
    low_csv = subset_csv(train_csv, args.probe_labels,
                         os.path.join(args.workdir, "probe_low.csv"))
    low_bs = max(4, min(32, args.probe_labels * len(PERIODS) // 2))
    acc_random_low = run_probe("", low_csv, val_csv,
                               os.path.join(args.workdir, "probe_random_low"),
                               args.probe_epochs * 10, batch_size=low_bs,
                               blr=args.probe_blr)
    acc_pre_low = run_probe(ckpt, low_csv, val_csv,
                            os.path.join(args.workdir, "probe_pre_low"),
                            args.probe_epochs * 10, batch_size=low_bs,
                            blr=args.probe_blr)
    print(f"low-label ({args.probe_labels}/class) probe: "
          f"random {acc_random_low:.2f}% vs pretrained {acc_pre_low:.2f}%",
          flush=True)

    out = {"probe_random_top1": acc_random, "probe_pretrained_top1": acc_pre,
           "low_label_random_top1": acc_random_low,
           "low_label_pretrained_top1": acc_pre_low,
           "low_label_gain_points": acc_pre_low - acc_random_low}
    if not args.skip_full:
        out["gain_points"] = acc_pre - acc_random
    print(json.dumps(out), flush=True)
    # Mechanism checks only (see module docstring): chance is 25%.
    if not args.skip_full:
        assert acc_pre >= 60.0, "pretrained probe failed to converge"
        assert acc_random >= 60.0, "control probe failed to converge"
    print("TRANSFER ABLATION RECORDED (see docstring for interpretation)",
          flush=True)


if __name__ == "__main__":
    main()
