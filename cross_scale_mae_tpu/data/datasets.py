"""Host-side dataset indexes and decoders.

Re-designs ``util/datasets.py`` (626 LoC of torchvision transform pipelines)
around the TPU split of work:

* **Host**: build the (path, label) index, decode compressed images, resize
  to a fixed uint8 canvas (static shapes for batching).
* **Device**: everything else — normalize, flips, RandomResizedCrop — runs
  inside the jitted train step (ops/image.py), replacing the CPU transform
  chain at ``util/datasets.py:123-158`` (the reference's #2 hot loop,
  SURVEY.md §3).

Dataset classes mirror the reference inventory: fMoW-RGB CSV
(``util/datasets.py:161-210``), COCO glob (``:213-234``), EuroSAT txt
(``:489-564``), fMoW-Sentinel CSV (``:320-487``), NAIP .npy tiles
(``util/naip_loader.py``) — with the reference's defects fixed (its
``rasterio.open`` NameError at ``:412,546``; NAIP's import-time hardcoded
paths at ``naip_loader.py:12-14``).

Per-channel stats are carried verbatim from the reference for numeric parity.
"""

from __future__ import annotations

import csv
import os
from dataclasses import dataclass
from glob import glob
from typing import Any, Optional, Sequence

import numpy as np

# Reference stats (util/datasets.py:167-168, 215-216, 322-352, 490-519).
FMOW_RGB_MEAN = (0.43392888, 0.43578541, 0.40744025)
FMOW_RGB_STD = (0.19828456, 0.19250111, 0.19454683)
COCO_MEAN = (0.47004986, 0.44683802, 0.40762289)
COCO_STD = (0.24388726, 0.23901215, 0.24204848)
SENTINEL_MEAN = (
    1370.19151926, 1184.3824625, 1120.77120066, 1136.26026392, 1263.73947144,
    1645.40315151, 1846.87040806, 1762.59530783, 1972.62420416, 582.72633433,
    14.77112979, 1732.16362238, 1247.91870117,
)
SENTINEL_STD = (
    633.15169573, 650.2842772, 712.12507725, 965.23119807, 948.9819932,
    1108.06650639, 1258.36394548, 1233.1492281, 1364.38688993, 472.37967789,
    14.3114637, 1310.36996126, 1087.6020813,
)

DATASET_STATS: dict[str, tuple] = {
    "fmow_rgb": (FMOW_RGB_MEAN, FMOW_RGB_STD),
    "coco": (COCO_MEAN, COCO_STD),
    "fmow_sentinel": (SENTINEL_MEAN, SENTINEL_STD),
    "euro_sat": (SENTINEL_MEAN, SENTINEL_STD),
    "naip": ((0.5, 0.5, 0.5), (0.5, 0.5, 0.5)),
    "synthetic": (FMOW_RGB_MEAN, FMOW_RGB_STD),
    "fmow_temporal": (FMOW_RGB_MEAN, FMOW_RGB_STD),
}


def _resize_uint8(img: "np.ndarray", size: int) -> np.ndarray:
    """Bicubic resize of an HWC uint8 array to (size, size) via PIL."""
    from PIL import Image

    if img.shape[0] == size and img.shape[1] == size:
        return img
    if img.ndim == 3 and img.shape[2] in (1, 3, 4):
        pil = Image.fromarray(img.squeeze() if img.shape[2] == 1 else img)
        out = np.asarray(pil.resize((size, size), Image.BICUBIC))
        return out.reshape(size, size, -1)
    # Multi-band: resize each band (rarely hit; bands loop on host).
    bands = [
        np.asarray(
            Image.fromarray(img[..., i]).resize((size, size), Image.BICUBIC)
        )
        for i in range(img.shape[2])
    ]
    return np.stack(bands, axis=-1)


class Dataset:
    """Index + per-item decode. Subclasses fill paths/labels and `_load_raw`."""

    mean: tuple = FMOW_RGB_MEAN
    std: tuple = FMOW_RGB_STD
    in_c: int = 3
    normalize_on_device: bool = True

    def __init__(self, canvas_size: int):
        self.canvas_size = canvas_size
        self.paths: list[str] = []
        self.labels: np.ndarray = np.zeros((0,), np.int32)

    def __len__(self) -> int:
        return len(self.paths)

    @property
    def num_classes(self) -> int:
        return int(self.labels.max()) + 1 if len(self.labels) else 0

    def check_paths(self, *extra_lists: list) -> None:
        """Fail fast on missing files instead of decoding garbage later.

        Index-file datasets resolve relative paths against the index's own
        directory; an index written elsewhere (a label subset, an eval
        split) silently points every row at a nonexistent file, and the
        decode layer's zero-fill policy then feeds constant images to
        training — a chance-accuracy failure that surfaces hours later.
        torch's DataLoader would crash in the worker at first __getitem__
        (the reference's de-facto behavior); crashing at construction with
        the resolved paths is strictly more debuggable.
        """
        missing = []
        for plist in (self.paths, *extra_lists):
            for p in plist:
                if not os.path.exists(p):
                    missing.append(p)
                    if len(missing) >= 5:
                        break
            if len(missing) >= 5:
                break
        if missing:
            raise FileNotFoundError(
                f"{type(self).__name__}: dataset index points at missing "
                f"files, e.g. {missing[:3]} — relative paths resolve "
                f"against the index file's directory; an index written to "
                f"another directory must use absolute paths"
            )

    def _load_raw(self, index: int) -> np.ndarray:
        """Returns HWC uint8 (any spatial size)."""
        from PIL import Image

        with Image.open(self.paths[index]) as im:
            im = im.convert("RGB")
            arr = np.asarray(im)
        return arr

    def load(self, index: int) -> tuple[np.ndarray, int]:
        img = self._load_raw(index)
        img = _resize_uint8(img, self.canvas_size)
        return img, int(self.labels[index])


class FmowRgbDataset(Dataset):
    """fMoW-RGB CSV: col0 = label (int), col1 = relative/absolute path
    (util/datasets.py:161-210)."""

    mean, std = FMOW_RGB_MEAN, FMOW_RGB_STD

    def __init__(self, csv_path: str, canvas_size: int):
        super().__init__(canvas_size)
        base = os.path.dirname(csv_path)
        paths, labels = [], []
        with open(csv_path, newline="") as f:
            reader = csv.reader(f)
            header = next(reader)  # header row (pandas header=0, :181)
            for row in reader:
                if not row:
                    continue
                label, path = row[0], row[1]
                paths.append(path if os.path.isabs(path) else os.path.join(base, path))
                labels.append(int(label))
        self.paths = paths
        self.labels = np.asarray(labels, np.int32)
        self.check_paths()


class GlobDataset(Dataset):
    """Unlabeled recursive glob (the reference's COCO pretraining loader,
    util/datasets.py:213-234). Label is always 0."""

    mean, std = COCO_MEAN, COCO_STD

    def __init__(self, root: str, canvas_size: int, pattern: str = "**/*.jpg"):
        super().__init__(canvas_size)
        self.paths = sorted(glob(os.path.join(root, pattern), recursive=True))
        self.labels = np.zeros((len(self.paths),), np.int32)


def sentinel_normalize(img: np.ndarray, mean: Sequence[float], std: Sequence[float]):
    """SentinelNormalize (util/datasets.py:302-317): linear map of
    [mean-2std, mean+2std] to [0, 255], clipped."""
    mean = np.asarray(mean, np.float32)
    std = np.asarray(std, np.float32)
    lo, hi = mean - 2 * std, mean + 2 * std
    out = (img.astype(np.float32) - lo) * 255.0 / (hi - lo)
    return np.clip(out, 0, 255).astype(np.uint8)


class _MultibandMixin:
    """Shared band handling for Sentinel/EuroSAT (masked/dropped bands,
    util/datasets.py:431-441)."""

    masked_bands: Optional[Sequence[int]] = None
    dropped_bands: Optional[Sequence[int]] = None
    # Explicit opt-in for the native loader's in-worker mask -> 2-sigma
    # SentinelNormalize -> drop pipeline. A TIFF-backed dataset WITHOUT this
    # flag stays on the Python path (native engagement must never change
    # normalization semantics implicitly).
    sentinel_norm = True

    def _mask_bands(self, img: np.ndarray) -> np.ndarray:
        """Masked bands are replaced with the band mean on the RAW image,
        *before* SentinelNormalize (util/datasets.py:431-436) — which maps
        the masked band to ~127 after the 2σ rescale. Assigning raw-unit
        means into the normalized uint8 array would overflow."""
        if self.masked_bands is not None:
            img = img.astype(np.float32, copy=True)
            for b in self.masked_bands:
                img[..., b] = float(np.asarray(self.mean)[b])
        return img

    def _drop_bands(self, img: np.ndarray) -> np.ndarray:
        if self.dropped_bands is not None:
            keep = [i for i in range(img.shape[-1]) if i not in self.dropped_bands]
            img = img[..., keep]
        return img

    def _read_geotiff(self, path: str) -> np.ndarray:
        """Multi-band GeoTIFF read: rasterio if present, else tifffile, else
        the native libtiff decoder (data/native), else PIL.

        The reference hard-requires rasterio (and crashes on its own
        ``rasterio.open`` NameError, util/datasets.py:412,546); here the
        backend is pluggable, the native C++ path needs no optional deps,
        and the error is explicit.
        """
        try:
            import rasterio  # type: ignore

            with rasterio.open(path) as f:
                return f.read().transpose(1, 2, 0)  # CHW -> HWC
        except ImportError:
            pass
        try:
            import tifffile  # type: ignore

            arr = tifffile.imread(path)
            return arr if arr.ndim == 3 else arr[..., None]
        except ImportError:
            pass
        from cross_scale_mae_tpu.data import native

        arr = native.read_tiff(path)
        if arr is not None:
            return arr
        from PIL import Image

        with Image.open(path) as im:
            arr = np.asarray(im)
        return arr if arr.ndim == 3 else arr[..., None]


class EurosatDataset(_MultibandMixin, Dataset):
    """EuroSAT 13-band txt filelist (util/datasets.py:489-564). Labels come
    from the parent directory name, mapped to sorted category ids."""

    mean, std = SENTINEL_MEAN, SENTINEL_STD
    in_c = 13
    normalize_on_device = False  # SentinelNormalize happens host-side

    def __init__(
        self,
        file_path: str,
        canvas_size: int,
        masked_bands: Optional[Sequence[int]] = None,
        dropped_bands: Optional[Sequence[int]] = None,
    ):
        super().__init__(canvas_size)
        with open(file_path) as f:
            self.paths = [line.strip() for line in f if line.strip()]
        cats = sorted({os.path.basename(os.path.dirname(p)) for p in self.paths})
        cat_id = {c: i for i, c in enumerate(cats)}
        self.labels = np.asarray(
            [cat_id[os.path.basename(os.path.dirname(p))] for p in self.paths],
            np.int32,
        )
        self.check_paths()
        self.masked_bands = masked_bands
        self.dropped_bands = dropped_bands
        if dropped_bands:
            self.in_c = 13 - len(dropped_bands)

    def _load_raw(self, index: int) -> np.ndarray:
        img = self._mask_bands(self._read_geotiff(self.paths[index]))
        img = sentinel_normalize(img, self.mean, self.std)
        return self._drop_bands(img)


class SentinelDataset(_MultibandMixin, Dataset):
    """fMoW-Sentinel CSV with category/location/timestamp columns
    (util/datasets.py:320-487). Categories map to sorted ids; year filtering
    mirrors the reference's ``years`` arg."""

    mean, std = SENTINEL_MEAN, SENTINEL_STD
    in_c = 13
    normalize_on_device = False

    def __init__(
        self,
        csv_path: str,
        canvas_size: int,
        years: Optional[Sequence[int]] = None,
        categories: Optional[Sequence[str]] = None,
        masked_bands: Optional[Sequence[int]] = None,
        dropped_bands: Optional[Sequence[int]] = None,
    ):
        super().__init__(canvas_size)
        import pandas as pd

        df = pd.read_csv(csv_path)
        if categories is not None:
            df = df[df["category"].isin(categories)]
        if years is not None and "timestamp" in df:
            df = df[
                df["timestamp"].astype(str).str[:4].astype(int).isin(list(years))
            ]
        cats = sorted(df["category"].unique())
        cat_id = {c: i for i, c in enumerate(cats)}
        base = os.path.dirname(csv_path)
        self.paths = [
            p if os.path.isabs(p) else os.path.join(base, p)
            for p in df["image_path"].tolist()
        ]
        self.labels = np.asarray([cat_id[c] for c in df["category"]], np.int32)
        self.check_paths()
        self.masked_bands = masked_bands
        self.dropped_bands = dropped_bands
        if dropped_bands:
            self.in_c = 13 - len(dropped_bands)

    def _load_raw(self, index: int) -> np.ndarray:
        img = self._mask_bands(self._read_geotiff(self.paths[index]))
        img = sentinel_normalize(img, self.mean, self.std)
        return self._drop_bands(img)


class NaipDataset(Dataset):
    """NAIP .npy tile loader (util/naip_loader.py) without the module-level
    hardcoded paths: tiles + a labels csv (`path,label`) are explicit args.
    Tiles are uint8 HWC or CHW arrays."""

    def __init__(self, index_csv: str, canvas_size: int):
        super().__init__(canvas_size)
        base = os.path.dirname(index_csv)
        paths, labels = [], []
        with open(index_csv, newline="") as f:
            for row in csv.reader(f):
                if not row or row[0] == "path":
                    continue
                p = row[0]
                paths.append(p if os.path.isabs(p) else os.path.join(base, p))
                labels.append(int(row[1]))
        self.paths = paths
        self.labels = np.asarray(labels, np.int32)
        self.check_paths()

    def _load_raw(self, index: int) -> np.ndarray:
        arr = np.load(self.paths[index])
        if arr.ndim == 3 and arr.shape[0] in (1, 3, 4) and arr.shape[0] < arr.shape[2]:
            arr = arr.transpose(1, 2, 0)  # CHW -> HWC
        if arr.dtype != np.uint8:
            arr = np.clip(arr, 0, 255).astype(np.uint8)
        return arr


class FmowTemporalDataset(Dataset):
    """fMoW temporal pairs: two views of the same site at different times.

    Repaired implementation of ``Dataset_fmow_temporal``
    (util/datasets.py:237-294) — the reference class is dead code: it reads
    ``self.image_arr`` / ``self.label_arr`` that no __init__ ever sets,
    stacks undefined ``img_as_tensor_1/2/3`` locals, and returns an
    undefined ``ts`` (so instantiating it crashes on first __getitem__).
    This version keeps its intent (CSV of same-site image pairs + capture
    timestamps; __getitem__ -> (frames, timestamps, label)) with a working
    schema, addressed by column NAME instead of the reference's fragile
    ``iloc`` positions:

      required columns: ``category`` (int label), ``image_path``,
      ``image_path2``, ``timestamp``, ``timestamp2`` (ISO-8601-ish,
      ``YYYY-MM-DD[THH...]``); extra metadata columns (site, region,
      sensor, ...) are ignored.

    ``load`` returns a (2, S, S, C) uint8 stack — frame 0 is the anchor,
    frame 1 the cross-temporal view (the multi-scale pretrain objective
    accepts it in place of the on-device crop, models/mae.py). Pairs are
    re-ordered CHRONOLOGICALLY at construction (frame 0 = earlier capture)
    regardless of CSV column order. Parsed timestamp features live in
    ``self.timestamps`` (N, 2, 3) int32 with the reference's
    ``parse_timestamp`` encoding: [year - min_year, month - 1, hour]
    (util/datasets.py:287-292), min_year taken over both columns; consumed
    by the frame ordering, ``time_gaps_months`` and the gap-stratified
    temporal-consistency eval (viz/temporal.py, cli/evalviz
    ``--temporal_csv``).
    """

    mean, std = FMOW_RGB_MEAN, FMOW_RGB_STD
    temporal = True
    frames = 2

    def __init__(self, csv_path: str, canvas_size: int):
        super().__init__(canvas_size)
        base = os.path.dirname(csv_path)

        def _abs(p: str) -> str:
            return p if os.path.isabs(p) else os.path.join(base, p)

        with open(csv_path, newline="") as f:
            reader = csv.DictReader(f)
            rows = [r for r in reader if r and r.get("image_path")]
        for col in ("category", "image_path", "image_path2", "timestamp",
                    "timestamp2"):
            if rows and col not in rows[0]:
                raise ValueError(
                    f"fmow_temporal csv {csv_path!r} is missing column "
                    f"{col!r} (have {sorted(rows[0])})"
                )
        self.paths = [_abs(r["image_path"]) for r in rows]
        self.paths2 = [_abs(r["image_path2"]) for r in rows]
        self.labels = np.asarray([int(r["category"]) for r in rows], np.int32)
        self.check_paths(self.paths2)
        stamps = [(r["timestamp"], r["timestamp2"]) for r in rows]
        self.min_year = min(
            (int(t[:4]) for pair in stamps for t in pair), default=0
        )
        self.timestamps = np.asarray(
            [[self.parse_timestamp(t) for t in pair] for pair in stamps],
            np.int32,
        ).reshape(len(rows), 2, 3)
        # Chronological anchoring: frame 0 is always the EARLIER capture
        # (deterministic anchor semantics for the cross-temporal objective;
        # CSV column order is not trusted). Ordering compares the FULL
        # (year, month, day, hour) — the stored reference-encoding features
        # drop the day (util/datasets.py:287-292), which cannot anchor
        # same-month pairs. Consumers: load() frame order,
        # time_gaps_months(), and the gap-stratified consistency eval
        # (viz/temporal.py).
        def _order_key(stamp: str) -> tuple:
            return (
                int(stamp[:4]), int(stamp[5:7]),
                int(stamp[8:10]) if len(stamp) >= 10 else 1,
                int(stamp[11:13]) if len(stamp) >= 13 else 0,
            )

        for i in range(len(rows)):
            if _order_key(stamps[i][1]) < _order_key(stamps[i][0]):
                self.paths[i], self.paths2[i] = self.paths2[i], self.paths[i]
                self.timestamps[i] = self.timestamps[i, ::-1]

    def time_gaps_months(self) -> np.ndarray:
        """(N,) int32 capture gap in whole months per pair (>= 0 — pairs are
        chronologically ordered at construction; hour-of-day ignored).
        Feeds the time-gap-stratified temporal-consistency eval
        (viz/temporal.py) and its evalviz report."""
        t = self.timestamps
        return (
            (t[:, 1, 0] - t[:, 0, 0]) * 12 + (t[:, 1, 1] - t[:, 0, 1])
        ).astype(np.int32)

    @property
    def sample_shape(self) -> tuple[int, ...]:
        return (2, self.canvas_size, self.canvas_size, self.in_c)

    def parse_timestamp(self, stamp: str) -> np.ndarray:
        """[year - min_year, month - 1, hour] (util/datasets.py:287-292).
        Date-only stamps get hour 0."""
        year = int(stamp[:4])
        month = int(stamp[5:7])
        hour = int(stamp[11:13]) if len(stamp) >= 13 else 0
        return np.array([year - self.min_year, month - 1, hour], np.int32)

    def _decode(self, path: str) -> np.ndarray:
        from PIL import Image

        with Image.open(path) as im:
            arr = np.asarray(im.convert("RGB"))
        return _resize_uint8(arr, self.canvas_size)

    def load(self, index: int) -> tuple[np.ndarray, int]:
        pair = np.stack(
            [self._decode(self.paths[index]), self._decode(self.paths2[index])]
        )
        return pair, int(self.labels[index])


class SyntheticDataset(Dataset):
    """Deterministic random data for benchmarks/tests (no reference
    equivalent — the reference has no test data story at all, SURVEY.md §4)."""

    def __init__(
        self, n: int, canvas_size: int, channels: int = 3, num_classes: int = 62,
        seed: int = 0,
    ):
        super().__init__(canvas_size)
        self.in_c = channels
        self._n = n
        self._seed = seed
        self._num_classes = num_classes
        self.paths = [f"synthetic://{i}" for i in range(n)]
        self.labels = (
            np.random.default_rng(seed).integers(0, num_classes, n).astype(np.int32)
        )

    def load(self, index: int) -> tuple[np.ndarray, int]:
        rng = np.random.default_rng(self._seed * 1_000_003 + index)
        img = rng.integers(
            0, 256, (self.canvas_size, self.canvas_size, self.in_c), np.uint8
        )
        return img, int(self.labels[index])


_DATASET_CLASSES: dict[str, type] = {
    "fmow_rgb": FmowRgbDataset,
    "coco": GlobDataset,
    "euro_sat": EurosatDataset,
    "fmow_sentinel": SentinelDataset,
    "naip": NaipDataset,
    "synthetic": SyntheticDataset,
    "fmow_temporal": FmowTemporalDataset,
}


def normalize_on_device_for(dataset_type: str) -> bool:
    """Single source of truth for whether a dataset family's pipeline
    normalizes on device (True) or host-side in the loader (the
    SentinelNormalize families, False). Consumed by cli/export.py so the
    serving artifact bakes exactly the normalization the training
    pipeline did NOT already apply — a parallel hardcoded list there
    would silently drift when a family is added or renamed."""
    cls = _DATASET_CLASSES.get(dataset_type)
    if cls is None:
        raise ValueError(f"Invalid dataset type: {dataset_type}")
    return bool(getattr(cls, "normalize_on_device", True))


def build_dataset(
    dataset_type: str,
    is_train: bool,
    *,
    train_path: str = "",
    test_path: str = "",
    input_size: int = 128,
    canvas_scale: float = 1.0,
    masked_bands=None,
    dropped_bands=None,
    synthetic_len: int = 4096,
    **kw: Any,
) -> Dataset:
    """String-dispatch factory mirroring build_fmow_dataset
    (util/datasets.py:567-626).

    ``canvas_scale`` sets the host decode canvas relative to ``input_size``
    (>1 gives the on-device RandomResizedCrop more source pixels; the eval
    path wants 1/0.875 like util/datasets.py:140-148).
    """
    path = train_path if is_train else test_path
    canvas = int(round(input_size * canvas_scale))
    if dataset_type == "fmow_rgb":
        return FmowRgbDataset(path, canvas)
    if dataset_type == "coco":
        return GlobDataset(path, canvas)
    if dataset_type == "euro_sat":
        return EurosatDataset(path, canvas, masked_bands, dropped_bands)
    if dataset_type == "fmow_sentinel":
        return SentinelDataset(
            path, canvas, masked_bands=masked_bands, dropped_bands=dropped_bands, **kw
        )
    if dataset_type == "naip":
        return NaipDataset(path, canvas)
    if dataset_type == "synthetic":
        return SyntheticDataset(synthetic_len, canvas, **kw)
    if dataset_type == "fmow_temporal":
        return FmowTemporalDataset(path, canvas)
    raise ValueError(f"Invalid dataset type: {dataset_type}")
