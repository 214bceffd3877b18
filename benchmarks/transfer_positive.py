"""SSL-transfer POSITIVE control: the §8a protocol at 40x the data scale.

docs/VALIDATION.md §8/§8a recorded three honest negatives and pinned the
cause: 80 epochs of MsLdCeCd on 1,280 images overfits reconstruction —
SSL pretraining 3 orders of magnitude below its intended data scale is
actively harmful (expected MAE-family behavior). This script varies THAT
factor and only that factor: the identical shape-configuration dataset
(area-matched disk/annulus/cross/parallel on random-grating backgrounds,
transfer_ablation_shapes.make_dataset), scaled to ~40k unlabeled training
images, pretrained ~15-20k optimizer steps on the real chip — the
"mid-scale" regime VERDICT r3 asked for.

Arms (each evaluated at 3 probe/finetune seeds for error bars):
  * frozen linear probe, full labels  (reference linprobe recipe)
  * frozen linear probe, low labels (100/class — the regime where SSL
    features matter most; blr 2.0 per transfer_ablation's measured
    low-label probe lr)
  * low-label finetune (100 labels/class, blr 5e-3 — the measured
    trainable lr from §8a)
against three trunk inits:
  * random (control)
  * MsLd-pretrained (dual-scale reconstruction only — the Ce/Cd ablation)
  * MsLdCeCd-pretrained (the full objective)

If the SSL ordering flips at this scale (pretrained > random beyond the
seed band, full objective >= MsLd), the §8a negative is confirmed as a
data-scale effect and the framework has a positive transfer control. The
result is recorded in docs/VALIDATION.md §8b whichever way it comes out.

Run (TPU, ~1.5-2 h): python benchmarks/transfer_positive.py
Smoke (CPU):  python benchmarks/transfer_positive.py --platform cpu \
    --n_per_class 40 --epochs 2 --probe_epochs 2 --ft_epochs 2 --seeds 1
"""

from __future__ import annotations

import argparse
import json
import os
import sys

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))
sys.path.insert(0, _HERE)

import numpy as np

from transfer_ablation import run_probe, subset_csv
from transfer_ablation_shapes import (
    SIZE,
    make_constellation_dataset,
    make_dataset,
    run_finetune,
)


def pretrain(model: str, train_csv: str, out_dir: str, epochs: int,
             batch_size: int, attention: str, seed: int) -> str:
    from cross_scale_mae_tpu.cli import pretrain as pt

    res = pt.main(pt.get_args_parser().parse_args([
        "--model", model, "--dataset_type", "fmow_rgb",
        "--train_path", train_csv, "--input_size", str(SIZE),
        "--patch_size", "8", "--batch_size", str(batch_size),
        "--epochs", str(epochs), "--warmup_epochs", "3",
        "--ckpt_interval", str(epochs), "--unroll_blocks",
        "--attention_impl", attention, "--seed", str(seed),
        "--output_dir", out_dir, "--log_interval", "200",
    ]))
    print(f"pretrain[{model}]: {res['steps']} steps, "
          f"final {res['last_metrics']}", flush=True)
    return os.path.join(res["output_dir"], "checkpoints")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workdir", default="/tmp/csmae_transfer_positive")
    ap.add_argument("--n_per_class", type=int, default=12500,
                    help="images per class (1/5 go to val): default gives "
                         "40k unlabeled train images (shapes); for "
                         "--dataset constellations use ~800 for the same "
                         "total")
    ap.add_argument("--dataset", default="shapes",
                    choices=["shapes", "constellations"],
                    help="shapes = 4 configuration classes (the §8b "
                         "protocol); constellations = --n_classes fixed "
                         "dot constellations (the §8c protocol: honest "
                         "NT-Xent negatives pool, VERDICT r4 §next-6)")
    ap.add_argument("--n_classes", type=int, default=62,
                    help="constellation class count (fMoW's label space)")
    ap.add_argument("--epochs", type=int, default=60,
                    help="pretrain epochs (60 x ~312 steps = ~19k steps at "
                         "bs 128 over 40k images)")
    ap.add_argument("--batch_size", type=int, default=128)
    ap.add_argument("--probe_epochs", type=int, default=15)
    ap.add_argument("--probe_low_epochs", type=int, default=60,
                    help="low-label probe epochs (400 labels, bs 64 -> 6 "
                         "steps/epoch; 60 epochs ~= the full-label probe's "
                         "step count)")
    ap.add_argument("--probe_low_blr", type=float, default=2.0,
                    help="low-label probe base lr (blr 20 oscillates at "
                         "tiny step counts, transfer_ablation --probe_blr)")
    ap.add_argument("--ft_epochs", type=int, default=150,
                    help="low-label finetune epochs (400 labels, bs 32 -> "
                         "~1.9k steps; §8a showed short runs are "
                         "optimization-bound)")
    ap.add_argument("--ft_labels", type=int, default=100)
    ap.add_argument("--ft_blr", type=float, default=5e-3)
    ap.add_argument("--seeds", type=int, default=3,
                    help="probe/finetune seeds per arm (error bars)")
    ap.add_argument("--attention", default="pallas_v3",
                    help="pretrain attention impl (xla off-TPU)")
    ap.add_argument("--platform", default=None)
    ap.add_argument("--data_seed", type=int, default=0)
    ap.add_argument("--reuse", action="store_true",
                    help="reuse existing dataset + pretrain checkpoints "
                         "in --workdir")
    ap.add_argument("--inits", default="random,msld,msldcecd",
                    help="comma list of trunk inits to run this invocation "
                         "(stage the arms across sessions; results merge "
                         "via --results_json)")
    ap.add_argument("--val_subset", type=int, default=0,
                    help="evaluate probes/finetunes on this many val images "
                         "(0 = all 10k). 2000 keeps the std err ~1pt while "
                         "cutting the per-epoch eval 5x")
    ap.add_argument("--probe_eval_interval", type=int, default=1)
    ap.add_argument("--ft_eval_interval", type=int, default=1)
    ap.add_argument("--results_json", default="",
                    help="append each finished arm to this json-lines file "
                         "(crash-safe: a dead session loses at most the "
                         "in-flight arm)")
    args = ap.parse_args()

    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)

    data = os.path.join(args.workdir, "data")
    marker = os.path.join(args.workdir, "ready.json")
    if args.reuse and os.path.exists(marker):
        meta = json.load(open(marker))
        assert meta.get("dataset", "shapes") == args.dataset, (
            f"--reuse across dataset kinds ({meta.get('dataset')} vs "
            f"{args.dataset}) would confound the comparison")
        assert meta["data_seed"] == args.data_seed, (
            f"--reuse across data seeds ({meta['data_seed']} vs "
            f"{args.data_seed}) would confound the comparison")
        # Pin the label-space/corpus shape too: a reused constellation
        # corpus with a different --n_classes would silently mismatch the
        # probe/finetune head size (out-of-range labels can never be
        # predicted), and a different --n_per_class mislabels
        # n_unlabeled_train in the record. (.get: markers written before
        # these keys existed stay usable at their own defaults.)
        if args.dataset == "constellations":
            assert meta.get("n_classes", args.n_classes) == args.n_classes, (
                f"--reuse across class counts ({meta.get('n_classes')} vs "
                f"{args.n_classes}) would size the heads wrong")
        assert meta.get("n_per_class", args.n_per_class) == args.n_per_class, (
            f"--reuse across corpus sizes ({meta.get('n_per_class')} vs "
            f"{args.n_per_class}) would misreport n_unlabeled_train")
        train_csv, val_csv = meta["train_csv"], meta["val_csv"]
        ckpts = meta["ckpts"]
        print(f"reusing dataset + checkpoints from {args.workdir}",
              flush=True)
    else:
        import shutil

        shutil.rmtree(args.workdir, ignore_errors=True)
        os.makedirs(args.workdir, exist_ok=True)
        ncls = 4 if args.dataset == "shapes" else args.n_classes
        print(f"generating {ncls * args.n_per_class} images ...", flush=True)
        if args.dataset == "shapes":
            train_csv, val_csv, n_train, n_val = make_dataset(
                data, n_per_class=args.n_per_class, seed=args.data_seed)
        else:
            train_csv, val_csv, n_train, n_val = make_constellation_dataset(
                data, n_classes=args.n_classes,
                n_per_class=args.n_per_class, seed=args.data_seed)
        print(f"dataset: {n_train} train / {n_val} val", flush=True)
        ckpts = {}
        for model in ("mae_vit_tiny_MsLd", "mae_vit_tiny_MsLdCeCd"):
            ckpts[model] = pretrain(
                model, train_csv, os.path.join(args.workdir, model),
                args.epochs, args.batch_size, args.attention,
                seed=args.data_seed,
            )
        with open(marker, "w") as f:
            json.dump({"data_seed": args.data_seed, "dataset": args.dataset,
                       "n_classes": ncls, "n_per_class": args.n_per_class,
                       "train_csv": train_csv, "val_csv": val_csv,
                       "ckpts": ckpts}, f)

    nb_classes = 4 if args.dataset == "shapes" else args.n_classes

    inits = {
        "random": "",
        "msld": ckpts["mae_vit_tiny_MsLd"],
        "msldcecd": ckpts["mae_vit_tiny_MsLdCeCd"],
    }
    selected = [s.strip() for s in args.inits.split(",") if s.strip()]
    unknown = set(selected) - set(inits)
    if unknown:
        raise SystemExit(f"--inits {sorted(unknown)} not in {sorted(inits)}")
    inits = {k: inits[k] for k in selected}
    low_csv = subset_csv(train_csv, args.ft_labels,
                         os.path.join(args.workdir, "ft_low.csv"))
    if args.val_subset:
        # Deterministic evaluation subset (same file for every arm).
        eval_csv = os.path.join(args.workdir, f"val_{args.val_subset}.csv")
        if not os.path.exists(eval_csv):
            with open(val_csv) as f:
                lines = f.readlines()
            # Absolutize: relative paths resolve against the CSV's own
            # directory, and this subset lives in the workdir, not data/.
            base = os.path.dirname(os.path.abspath(val_csv))

            def _abs(line: str) -> str:
                cls, path = line.rstrip("\n").split(",", 1)
                if not os.path.isabs(path):
                    path = os.path.join(base, path)
                return f"{cls},{path}\n"

            rng = np.random.default_rng(args.data_seed)
            keep = rng.permutation(len(lines) - 1)[:args.val_subset]
            with open(eval_csv, "w") as f:
                f.write(lines[0])
                f.writelines(_abs(lines[1 + i]) for i in sorted(keep))
    else:
        eval_csv = val_csv

    # Arm-level resume: a (arm, init, seed) already recorded in
    # --results_json is not re-run — a dead session resumes from the
    # in-flight arm, not from scratch (18 arm-units x ~10 min each).
    done: dict[tuple, float] = {}
    if args.results_json and os.path.exists(args.results_json):
        with open(args.results_json) as f:
            for line in f:
                r = json.loads(line)
                done[(r["arm"], r["init"], r["seed"])] = r["acc"]
        if done:
            print(f"resuming: {len(done)} arm(s) already recorded in "
                  f"{args.results_json}", flush=True)

    def record(arm: str, name: str, seed: int, acc: float):
        print(f"{arm}[{name}] seed {seed}: {acc:.2f}%", flush=True)
        if args.results_json:
            with open(args.results_json, "a") as f:
                f.write(json.dumps({"arm": arm, "init": name, "seed": seed,
                                    "acc": acc}) + "\n")

    results: dict[str, dict[str, list[float]]] = {
        "probe_full": {}, "probe_low": {}, "ft_low": {},
    }
    for name, ckpt in inits.items():
        for arm in results:
            results[arm][name] = []
        for seed in range(args.seeds):
            key = ("probe_full", name, seed)
            if key not in done:
                done[key] = run_probe(
                    ckpt, train_csv, eval_csv,
                    os.path.join(args.workdir, f"probe_{name}_s{seed}"),
                    args.probe_epochs, seed=seed,
                    eval_interval=args.probe_eval_interval,
                    nb_classes=nb_classes)
                record(*key, done[key])
            results["probe_full"][name].append(done[key])
            key = ("probe_low", name, seed)
            if key not in done:
                done[key] = run_probe(
                    ckpt, low_csv, eval_csv,
                    os.path.join(args.workdir, f"probelow_{name}_s{seed}"),
                    args.probe_low_epochs, batch_size=64,
                    blr=args.probe_low_blr, seed=seed,
                    eval_interval=max(args.probe_eval_interval * 4, 1),
                    nb_classes=nb_classes)
                record(*key, done[key])
            results["probe_low"][name].append(done[key])
            key = ("ft_low", name, seed)
            if key not in done:
                done[key] = run_finetune(
                    ckpt, low_csv, eval_csv,
                    os.path.join(args.workdir, f"ft_{name}_s{seed}"),
                    args.ft_epochs, blr=args.ft_blr, seed=seed,
                    eval_interval=args.ft_eval_interval,
                    nb_classes=nb_classes)
                record(*key, done[key])
            results["ft_low"][name].append(done[key])

    summary = {}
    for arm, by_init in results.items():
        summary[arm] = {
            name: {"mean": round(float(np.mean(v)), 2),
                   "std": round(float(np.std(v)), 2),
                   "runs": v}
            for name, v in by_init.items()
        }
    out = {
        "dataset": args.dataset,
        "n_classes": nb_classes,
        "n_unlabeled_train": nb_classes * args.n_per_class * 4 // 5,
        "pretrain_epochs": args.epochs,
        "ft_labels_per_class": args.ft_labels,
        "seeds": args.seeds,
        "results": summary,
    }
    print(json.dumps(out), flush=True)
    # markdown table for docs/VALIDATION.md §8b (staged invocations only
    # carry the --inits columns they ran)
    cols = [k for k in ("random", "msld", "msldcecd") if k in inits]
    print("\n| arm | " + " | ".join(cols) + " |", file=sys.stderr)
    print("|" + "---|" * (len(cols) + 1), file=sys.stderr)
    for arm in ("probe_full", "probe_low", "ft_low"):
        row = " | ".join(
            f"{summary[arm][k]['mean']:.1f} ± {summary[arm][k]['std']:.1f}"
            for k in cols)
        print(f"| {arm} | {row} |", file=sys.stderr)


if __name__ == "__main__":
    main()
