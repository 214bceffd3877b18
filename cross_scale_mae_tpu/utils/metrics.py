"""Metrics: smoothed meters, classification metrics, reconstruction metrics.

Re-implements the reference's observability kit:

* ``SmoothedValue`` / ``MetricLogger`` (``util/misc.py:26-190``) — windowed
  meters with iter/data timing and throughput. Cross-process sync is
  unnecessary here: metrics come out of the jitted step already reduced
  across the mesh (SURVEY.md §5 "observability").
* top-1/top-5 accuracy, macro/micro F1 and mIoU from an accumulated
  confusion matrix (``engine_finetune.py:154-236`` uses sklearn per-epoch;
  a confusion matrix is one pass and no dependency).
* reconstruction metric registry (``util/metrics.py:13-56``) with direction
  flags, backed by the JAX SSIM/MS-SSIM ops.
"""

from __future__ import annotations

import time
from collections import defaultdict, deque
from typing import Iterable, Optional

import numpy as np


class SmoothedValue:
    """Track a series with a smoothing window (util/misc.py:26-86)."""

    def __init__(self, window_size: int = 20, fmt: str = "{median:.4f} ({global_avg:.4f})"):
        self.deque: deque = deque(maxlen=window_size)
        self.total = 0.0
        self.count = 0
        self.fmt = fmt

    def update(self, value: float, n: int = 1):
        self.deque.append(value)
        self.count += n
        self.total += value * n

    @property
    def median(self) -> float:
        return float(np.median(self.deque)) if self.deque else 0.0

    @property
    def avg(self) -> float:
        return float(np.mean(self.deque)) if self.deque else 0.0

    @property
    def global_avg(self) -> float:
        return self.total / max(self.count, 1)

    @property
    def max(self) -> float:
        return max(self.deque) if self.deque else 0.0

    @property
    def value(self) -> float:
        return self.deque[-1] if self.deque else 0.0

    def __str__(self) -> str:
        return self.fmt.format(
            median=self.median, avg=self.avg, global_avg=self.global_avg,
            max=self.max, value=self.value,
        )


class MetricLogger:
    """Epoch-loop logger with ETA and imgs/sec (util/misc.py:89-190)."""

    def __init__(self, delimiter: str = "  ", print_fn=print):
        self.meters: dict[str, SmoothedValue] = defaultdict(SmoothedValue)
        self.delimiter = delimiter
        self.print_fn = print_fn

    def update(self, **kwargs):
        for k, v in kwargs.items():
            self.meters[k].update(float(v))

    def __getattr__(self, name):
        if name in self.meters:
            return self.meters[name]
        raise AttributeError(name)

    def __str__(self):
        return self.delimiter.join(
            f"{name}: {meter}" for name, meter in self.meters.items()
        )

    def log_every(self, iterable, print_freq: int, header: str = "",
                  total: Optional[int] = None):
        """Yields items while tracking iter/data time and printing progress."""
        i = 0
        total = total if total is not None else getattr(iterable, "__len__", lambda: None)()
        start = time.time()
        end = time.time()
        iter_time = SmoothedValue(fmt="{avg:.4f}")
        data_time = SmoothedValue(fmt="{avg:.4f}")
        for obj in iterable:
            data_time.update(time.time() - end)
            yield obj
            iter_time.update(time.time() - end)
            if i % print_freq == 0 or (total is not None and i == total - 1):
                if total:
                    eta = iter_time.global_avg * (total - i - 1)
                    eta_str = time.strftime("%H:%M:%S", time.gmtime(int(eta)))
                    self.print_fn(
                        f"{header} [{i}/{total}] eta: {eta_str} {self} "
                        f"time: {iter_time} data: {data_time}"
                    )
                else:
                    self.print_fn(
                        f"{header} [{i}] {self} time: {iter_time} data: {data_time}"
                    )
            i += 1
            end = time.time()
        elapsed = time.time() - start
        self.print_fn(
            f"{header} Total time: "
            f"{time.strftime('%H:%M:%S', time.gmtime(int(elapsed)))} "
            f"({elapsed / max(i, 1):.4f} s / it)"
        )


# --------------------------------------------------------- classification


def accuracy_topk(logits: np.ndarray, labels: np.ndarray,
                  topk: Iterable[int] = (1, 5)) -> list[float]:
    """Top-k accuracies in percent (timm util.accuracy contract)."""
    out = []
    order = np.argsort(-logits, axis=1)
    for k in topk:
        hit = (order[:, :k] == labels[:, None]).any(axis=1)
        out.append(float(hit.mean()) * 100.0)
    return out


class ConfusionMatrix:
    """Streaming confusion matrix; derives acc / F1 / mIoU at epoch end."""

    def __init__(self, num_classes: int):
        self.num_classes = num_classes
        self.mat = np.zeros((num_classes, num_classes), np.int64)

    def update(self, preds: np.ndarray, labels: np.ndarray):
        idx = labels.astype(np.int64) * self.num_classes + preds.astype(np.int64)
        self.mat += np.bincount(
            idx, minlength=self.num_classes ** 2
        ).reshape(self.num_classes, self.num_classes)

    @property
    def accuracy(self) -> float:
        return float(np.trace(self.mat)) / max(self.mat.sum(), 1)

    def f1(self, average: str = "macro") -> float:
        """Macro/micro F1 (engine_finetune.py:177-181 uses sklearn)."""
        tp = np.diag(self.mat).astype(np.float64)
        fp = self.mat.sum(axis=0) - tp
        fn = self.mat.sum(axis=1) - tp
        if average == "micro":
            p = tp.sum() / max(tp.sum() + fp.sum(), 1e-12)
            r = tp.sum() / max(tp.sum() + fn.sum(), 1e-12)
            return float(2 * p * r / max(p + r, 1e-12))
        with np.errstate(divide="ignore", invalid="ignore"):
            p = np.where(tp + fp > 0, tp / (tp + fp), 0.0)
            r = np.where(tp + fn > 0, tp / (tp + fn), 0.0)
            f1 = np.where(p + r > 0, 2 * p * r / (p + r), 0.0)
        return float(f1.mean())

    def miou(self) -> float:
        """Mean IoU over classes present (engine_finetune.py:226-236)."""
        tp = np.diag(self.mat).astype(np.float64)
        denom = self.mat.sum(axis=0) + self.mat.sum(axis=1) - tp
        present = denom > 0
        if not present.any():
            return 0.0
        return float((tp[present] / denom[present]).mean())


# --------------------------------------------------------- reconstruction


def _to_nhwc(x):
    import jax.numpy as jnp

    return jnp.asarray(x, jnp.float32)


def _mse(x, y):
    import jax.numpy as jnp

    return float(jnp.mean((_to_nhwc(x) - _to_nhwc(y)) ** 2))


def _mae(x, y):
    import jax.numpy as jnp

    return float(jnp.mean(jnp.abs(_to_nhwc(x) - _to_nhwc(y))))


def _l1(x, y):
    import jax.numpy as jnp

    return float(jnp.sum(jnp.abs(_to_nhwc(x) - _to_nhwc(y))))


def _l2(x, y):
    import jax.numpy as jnp

    return float(jnp.sum((_to_nhwc(x) - _to_nhwc(y)) ** 2))


def _ssim(x, y):
    from cross_scale_mae_tpu.ops.ssim import ssim

    return float(ssim(_to_nhwc(x), _to_nhwc(y), data_range=1.0))


def _ms_ssim(x, y):
    from cross_scale_mae_tpu.ops.ssim import ms_ssim

    return float(ms_ssim(_to_nhwc(x), _to_nhwc(y), data_range=1.0))


METRICS_DICT = {
    # Mirrors util/metrics.py:13-46 including direction flags.
    "mse": {"full_name": "Mean Squared Error", "is_lower_better": True, "fn": _mse},
    "mae": {"full_name": "Mean Absolute Error", "is_lower_better": True, "fn": _mae},
    "l1": {"full_name": "L1 Norm", "is_lower_better": True, "fn": _l1},
    "l2": {"full_name": "L2 Norm", "is_lower_better": True, "fn": _l2},
    "ssim": {
        "full_name": "Structural Similarity Index",
        "is_lower_better": False, "fn": _ssim,
    },
    "ms_ssim": {
        # Needs image size > 160 (util/metrics.py:39-40).
        "full_name": "Multi-Scale Structural Similarity Index",
        "is_lower_better": False, "fn": _ms_ssim,
    },
}


def calc_metric(x, y, metric_name: str) -> float:
    """NHWC inputs in [0,1]; aliases ssd->l2, sad->l1 (util/metrics.py:49-56)."""
    name = metric_name.lower()
    name = {"ssd": "l2", "sad": "l1"}.get(name, name)
    return METRICS_DICT[name]["fn"](x, y)
