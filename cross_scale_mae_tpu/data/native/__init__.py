"""ctypes bindings + on-demand build for the native C++ loader core.

No pybind11 in the image, so the C ABI (loader.cpp) is bound with ctypes.
The shared library builds lazily on first use (g++ -O3, cached next to the
source); a missing toolchain or libjpeg degrades gracefully to the Python
thread-pool loader (data/loader.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Iterator, Optional

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "loader.cpp")
_SO = os.path.join(_DIR, "libcsmae_loader.so")
_lock = threading.Lock()
_lib = None
_build_failed = False


def build_library(force: bool = False) -> str | None:
    """Compile loader.cpp -> libcsmae_loader.so. Returns path or None."""
    global _build_failed
    with _lock:
        if not force and os.path.exists(_SO) and (
            os.path.getmtime(_SO) >= os.path.getmtime(_SRC)
        ):
            return _SO
        if _build_failed and not force:
            return None
        cmd = [
            "g++", "-O3", "-march=native", "-shared", "-fPIC", "-std=c++17",
            "-pthread", "-ffp-contract=off",  # keep float op order == numpy
            _SRC, "-o", _SO, "-ljpeg", "-lpng", "-ltiff",
        ]
        try:
            subprocess.run(cmd, check=True, capture_output=True, timeout=180)
            return _SO
        except Exception:
            _build_failed = True
            return None


def get_library():
    global _lib
    if _lib is not None:
        return _lib
    so = build_library()
    if so is None:
        return None
    lib = ctypes.CDLL(so)
    lib.csmae_loader_create.restype = ctypes.c_void_p
    lib.csmae_loader_create.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.POINTER(ctypes.c_int32),
        ctypes.c_int64, ctypes.c_int, ctypes.c_int, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_uint64, ctypes.c_int,
        ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.csmae_loader_start_epoch.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.csmae_loader_next.restype = ctypes.c_int
    lib.csmae_loader_next.argtypes = [
        ctypes.c_void_p, ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.csmae_loader_batches_per_epoch.restype = ctypes.c_int64
    lib.csmae_loader_batches_per_epoch.argtypes = [ctypes.c_void_p]
    lib.csmae_loader_failed_count.restype = ctypes.c_int64
    lib.csmae_loader_failed_count.argtypes = [ctypes.c_void_p]
    lib.csmae_loader_destroy.argtypes = [ctypes.c_void_p]
    lib.csmae_decode_jpeg.restype = ctypes.c_int
    lib.csmae_decode_jpeg.argtypes = [
        ctypes.c_char_p, ctypes.c_int, ctypes.POINTER(ctypes.c_uint8)
    ]
    lib.csmae_loader_set_bands.argtypes = [
        ctypes.c_void_p, ctypes.c_int, ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
        ctypes.POINTER(ctypes.c_int32), ctypes.c_int,
    ]
    lib.csmae_tiff_info.restype = ctypes.c_int
    lib.csmae_tiff_info.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int32)
    ]
    lib.csmae_tiff_read_f32.restype = ctypes.c_int
    lib.csmae_tiff_read_f32.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_float), ctypes.c_int64
    ]
    _lib = lib
    return lib


def decode_jpeg(path: str, canvas: int) -> Optional[np.ndarray]:
    lib = get_library()
    if lib is None:
        return None
    out = np.empty((canvas, canvas, 3), np.uint8)
    ok = lib.csmae_decode_jpeg(
        path.encode(), canvas, out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8))
    )
    return out if ok else None


def read_tiff(path: str) -> Optional[np.ndarray]:
    """Raw multi-band TIFF read -> float32 HWC (the rasterio.read()
    equivalent; any uint/int 8/16/32 or float sample type, chunky or planar,
    striped or tiled, classic or BigTIFF). Returns None when the library or
    codec is unavailable."""
    lib = get_library()
    if lib is None:
        return None
    whc = np.zeros((3,), np.int32)
    if not lib.csmae_tiff_info(
        path.encode(), whc.ctypes.data_as(ctypes.POINTER(ctypes.c_int32))
    ):
        return None
    w, h, c = int(whc[0]), int(whc[1]), int(whc[2])
    out = np.empty((h, w, c), np.float32)
    ok = lib.csmae_tiff_read_f32(
        path.encode(), out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        out.size,  # reject a file whose size changed since the info call
    )
    return out if ok else None


class NativeJpegLoader:
    """Epoch iterator backed by the C++ worker pool."""

    def __init__(self, lib, handle, batch, canvas, channels):
        self._lib = lib
        self._handle = handle
        self.batch = batch
        self.canvas = canvas
        self.channels = channels

    @classmethod
    def maybe_create(cls, dataset, batch_size: int, loader) -> Optional["NativeJpegLoader"]:
        # JPEG/PNG-backed RGB datasets and multi-band TIFF datasets
        # (Sentinel/EuroSAT — opted in EXPLICITLY via the dataset's
        # ``sentinel_norm = True`` attribute, not inferred), shuffled
        # (train) or sequential (eval); everything else falls back to the
        # Python path.
        if len(dataset) == 0:
            return None
        if getattr(dataset, "temporal", False):
            # Frame-stack samples (T, S, S, C); the native ring decodes one
            # image per slot. Python path handles the pair decode.
            return None
        tiff_exts = (".tif", ".tiff")
        multiband = (
            getattr(dataset, "sentinel_norm", False)
            and all(p.lower().endswith(tiff_exts) for p in dataset.paths[:64])
        )
        if not multiband:
            if dataset.in_c != 3:
                return None
            exts = (".jpg", ".jpeg", ".png")
            if not all(p.lower().endswith(exts) for p in dataset.paths[:64]):
                return None
        lib = get_library()
        if lib is None:
            return None
        if multiband:
            # Probe-decode the first tile before claiming the dataset: an
            # unsupported codec/compression or a band-count mismatch must
            # fall back to the Python path (which may have rasterio), not
            # silently zero-fill batches.
            probe = read_tiff(dataset.paths[0])
            if probe is None or probe.shape[-1] != len(dataset.mean):
                return None
        n = len(dataset)
        channels = dataset.in_c
        c_paths = (ctypes.c_char_p * n)(*[p.encode() for p in dataset.paths])
        labels = np.ascontiguousarray(dataset.labels, np.int32)
        handle = lib.csmae_loader_create(
            ctypes.cast(c_paths, ctypes.POINTER(ctypes.c_char_p)),
            labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            n, batch_size, dataset.canvas_size, channels,
            loader.num_threads, 3, loader.seed, loader.shard_id,
            loader.num_shards, int(loader.drop_last), int(loader.shuffle),
        )
        if not handle:
            return None
        if multiband:
            # mask -> SentinelNormalize -> drop, same order as the Python
            # pipeline (data/datasets.py _load_raw).
            mean = np.ascontiguousarray(dataset.mean, np.float32)
            std = np.ascontiguousarray(dataset.std, np.float32)
            masked = np.ascontiguousarray(
                list(dataset.masked_bands or ()), np.int32
            )
            dropped = np.ascontiguousarray(
                list(dataset.dropped_bands or ()), np.int32
            )
            lib.csmae_loader_set_bands(
                handle, len(mean), 1,
                mean.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                std.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                masked.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(masked),
                dropped.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
                len(dropped),
            )
        obj = cls(lib, handle, batch_size, dataset.canvas_size, channels)
        obj._keepalive = c_paths  # paths are copied in C++, but be safe
        obj._shuffle = loader.shuffle
        return obj

    def epoch(self, epoch: int = 0) -> Iterator[tuple[np.ndarray, np.ndarray]]:
        # Snapshot BEFORE launching workers: the counter is cumulative and
        # on small datasets the pool can finish every decode before a
        # post-start read, making the delta silently 0.
        failed_before = self._lib.csmae_loader_failed_count(self._handle)
        self._lib.csmae_loader_start_epoch(self._handle, epoch)
        served = 0
        while True:
            imgs = np.empty((self.batch, self.canvas, self.canvas, self.channels),
                            np.uint8)
            labels = np.empty((self.batch,), np.int32)
            got = self._lib.csmae_loader_next(
                self._handle,
                imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                labels.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            )
            if got == 0:
                break
            served += got
            yield imgs[:got], labels[:got]
        failed = self._lib.csmae_loader_failed_count(self._handle) - failed_before
        if failed:
            # Failed decodes are zero-filled (torch DataLoader would crash
            # the worker instead) — make that loud, never silent; and when
            # the MAJORITY of an epoch is zero-filled the run is training on
            # garbage, so refuse to continue (datasets also fail fast on
            # missing files at construction, datasets.py check_paths).
            if failed * 2 >= max(served, 1):
                raise RuntimeError(
                    f"native loader: {failed}/{served} image(s) failed to "
                    f"decode this epoch — the dataset is effectively "
                    f"unreadable (corrupt files, unsupported format, or bad "
                    f"paths); refusing to train on zero-filled batches"
                )
            import warnings

            warnings.warn(
                f"native loader: {failed} image(s) failed to decode this "
                f"epoch and were zero-filled; check the dataset for corrupt "
                f"or unsupported files",
                stacklevel=2,
            )

    def __del__(self):
        try:
            self._lib.csmae_loader_destroy(self._handle)
        except Exception:
            pass
