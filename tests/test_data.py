"""Data pipeline tests: datasets, loader sharding/shuffling, native C++ decode."""

import os

import numpy as np
import pytest

from cross_scale_mae_tpu.data import (
    DataLoader,
    FmowRgbDataset,
    GlobDataset,
    NaipDataset,
    SyntheticDataset,
    build_dataset,
)
from cross_scale_mae_tpu.data.datasets import sentinel_normalize


@pytest.fixture(scope="module")
def jpeg_dir(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("jpegs")
    rng = np.random.default_rng(0)
    paths = []
    for i in range(12):
        arr = rng.integers(0, 256, (40 + 4 * i, 52, 3), np.uint8)
        p = d / f"img_{i:02d}.jpg"
        Image.fromarray(arr).save(p, quality=92)
        paths.append(str(p))
    csv_path = d / "index.csv"
    with open(csv_path, "w") as f:
        f.write("category,image_path\n")
        for i, p in enumerate(paths):
            f.write(f"{i % 3},{os.path.basename(p)}\n")
    return d, csv_path


class TestDatasets:
    def test_fmow_csv(self, jpeg_dir):
        d, csv_path = jpeg_dir
        ds = FmowRgbDataset(str(csv_path), canvas_size=32)
        assert len(ds) == 12
        assert ds.num_classes == 3
        img, label = ds.load(0)
        assert img.shape == (32, 32, 3) and img.dtype == np.uint8
        assert label == 0

    def test_glob(self, jpeg_dir):
        d, _ = jpeg_dir
        ds = GlobDataset(str(d), canvas_size=16)
        assert len(ds) == 12
        img, label = ds.load(3)
        assert img.shape == (16, 16, 3) and label == 0

    def test_naip_npy(self, tmp_path):
        rng = np.random.default_rng(0)
        rows = []
        for i in range(4):
            arr = rng.integers(0, 255, (3, 24, 24), np.uint8)  # CHW on purpose
            p = tmp_path / f"tile{i}.npy"
            np.save(p, arr)
            rows.append(f"{p},{i % 2}")
        index = tmp_path / "naip.csv"
        index.write_text("path,label\n" + "\n".join(rows) + "\n")
        ds = NaipDataset(str(index), canvas_size=24)
        img, label = ds.load(1)
        assert img.shape == (24, 24, 3) and label == 1

    def test_sentinel_normalize_midpoint(self):
        mean, std = (100.0,), (10.0,)
        img = np.full((2, 2, 1), 100.0, np.float32)
        out = sentinel_normalize(img, mean, std)
        # mean maps to midpoint 127.5 -> 127 after cast
        assert out.dtype == np.uint8
        assert np.all((out >= 127) & (out <= 128))

    def test_build_dataset_synthetic(self):
        ds = build_dataset("synthetic", True, input_size=16, synthetic_len=8)
        assert len(ds) == 8
        img, _ = ds.load(0)
        img2, _ = ds.load(0)
        np.testing.assert_array_equal(img, img2)  # deterministic


class TestLoader:
    def test_epoch_batches_and_determinism(self):
        ds = SyntheticDataset(64, 8, seed=1)
        dl = DataLoader(ds, 16, seed=5, num_threads=2, use_native=False)
        assert dl.steps_per_epoch() == 4
        a = [lab.copy() for _, lab in dl.epoch(0)]
        b = [lab.copy() for _, lab in dl.epoch(0)]
        c = [lab.copy() for _, lab in dl.epoch(1)]
        assert len(a) == 4
        np.testing.assert_array_equal(np.concatenate(a), np.concatenate(b))
        assert not np.array_equal(np.concatenate(a), np.concatenate(c))

    def test_sharding_disjoint_and_complete(self):
        ds = SyntheticDataset(64, 8, seed=1)
        seen = []
        for shard in range(4):
            dl = DataLoader(
                ds, 4, seed=9, shuffle=False, num_threads=1,
                shard_id=shard, num_shards=4, use_native=False,
            )
            for imgs, labels in dl.epoch(0):
                assert imgs.shape == (4, 8, 8, 3)
            idx = dl._epoch_indices(0)
            seen.append(idx)
        allidx = np.concatenate(seen)
        assert len(np.unique(allidx)) == 64

    def test_drop_last(self):
        ds = SyntheticDataset(30, 8, seed=1)
        dl = DataLoader(ds, 8, use_native=False)
        assert dl.steps_per_epoch() == 3
        dl2 = DataLoader(ds, 8, drop_last=False, use_native=False)
        assert dl2.steps_per_epoch() == 4


class TestNative:
    def test_native_decode_matches_pil(self, jpeg_dir):
        from cross_scale_mae_tpu.data.native import decode_jpeg, get_library

        if get_library() is None:
            pytest.skip("native loader not built")
        d, _ = jpeg_dir
        path = str(sorted(d.glob("*.jpg"))[0])
        out = decode_jpeg(path, 32)
        assert out is not None and out.shape == (32, 32, 3)
        from PIL import Image

        ref = np.asarray(Image.open(path).convert("RGB").resize((32, 32),
                                                                Image.BILINEAR))
        # Different resample path; just require strong agreement.
        assert np.mean(np.abs(out.astype(int) - ref.astype(int))) < 12

    def test_native_loader_epoch(self, jpeg_dir):
        from cross_scale_mae_tpu.data.native import get_library

        if get_library() is None:
            pytest.skip("native loader not built")
        d, csv_path = jpeg_dir
        ds = FmowRgbDataset(str(csv_path), canvas_size=32)
        dl = DataLoader(ds, 4, seed=3, num_threads=2)
        assert dl._native is not None, "native path should engage for JPEGs"
        batches = list(dl.epoch(0))
        assert len(batches) == 3
        for imgs, labels in batches:
            assert imgs.shape == (4, 32, 32, 3)
            assert imgs.dtype == np.uint8
            assert np.any(imgs > 0)
        # Deterministic across re-runs of the same epoch
        again = list(dl.epoch(0))
        np.testing.assert_array_equal(batches[0][1], again[0][1])
        # Covers all labels across epoch
        all_labels = sorted(np.concatenate([b[1] for b in batches]).tolist())
        assert len(all_labels) == 12

    def test_native_png_decode_matches_pil(self, tmp_path):
        # PNG path (round 2): lossless format => decode must match PIL up to
        # resample differences only.
        from cross_scale_mae_tpu.data.native import decode_jpeg, get_library

        if get_library() is None:
            pytest.skip("native loader not built")
        from PIL import Image

        rng = np.random.default_rng(7)
        arr = rng.integers(0, 256, (48, 48, 3), np.uint8)
        p = tmp_path / "img.png"
        Image.fromarray(arr).save(p)
        # Lossless format + canvas == native size => bit-exact decode.
        out = decode_jpeg(str(p), 48)  # dispatches on magic bytes
        assert out is not None
        np.testing.assert_array_equal(out, arr)
        # Downscale sanity (pointwise bilinear vs PIL's area filter differ
        # on noise; just require plausible content).
        small = decode_jpeg(str(p), 32)
        assert small.shape == (32, 32, 3) and small.std() > 20
        # gray robustness: L-mode PNG promotes to RGB
        gp = tmp_path / "gray.png"
        Image.fromarray(arr[..., 0]).save(gp)
        g = decode_jpeg(str(gp), 16)
        assert g is not None and (g[..., 0] == g[..., 1]).all()

    def test_native_loader_eval_sequential(self, jpeg_dir):
        # Round 2: the native path also serves unshuffled eval epochs
        # (drop_last=False, dataset order preserved).
        from cross_scale_mae_tpu.data.native import get_library

        if get_library() is None:
            pytest.skip("native loader not built")
        d, csv_path = jpeg_dir
        ds = FmowRgbDataset(str(csv_path), canvas_size=32)
        dl = DataLoader(ds, 5, shuffle=False, drop_last=False, num_threads=2)
        assert dl._native is not None, "native path should engage for eval"
        batches = list(dl.epoch(0))
        assert [len(b[1]) for b in batches] == [5, 5, 2]  # ragged tail kept
        got = np.concatenate([b[1] for b in batches])
        np.testing.assert_array_equal(got, ds.labels)  # dataset order
        # pixel parity with the Python fallback path (same decode backend
        # not required; just confirm non-trivial content per image)
        assert all(np.any(b[0] > 0) for b in batches)
