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

    def test_missing_files_fail_fast(self, tmp_path):
        """An index whose rows resolve to nonexistent files must raise at
        construction, not feed zero-filled batches hours later. Regression:
        a label-subset CSV written to a workdir kept the source CSV's
        relative paths, silently re-basing every image onto the workdir —
        all three r4 transfer-positive arms trained/evaluated on zeros."""
        csv = tmp_path / "index.csv"
        csv.write_text("category,image_path\n0,does_not_exist.jpg\n")
        with pytest.raises(FileNotFoundError, match="missing"):
            FmowRgbDataset(str(csv), canvas_size=32)

    def test_subset_csv_absolutizes_paths(self, jpeg_dir, tmp_path):
        """benchmarks.transfer_ablation.subset_csv writes a subset into a
        DIFFERENT directory; its rows must become absolute so they keep
        resolving against the source dataset."""
        import sys

        sys.path.insert(0, os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "benchmarks"))
        try:
            from transfer_ablation import subset_csv
        finally:
            sys.path.pop(0)
        _, csv_path = jpeg_dir
        out = subset_csv(str(csv_path), 2, str(tmp_path / "subset.csv"))
        ds = FmowRgbDataset(out, canvas_size=16)  # check_paths inside
        assert len(ds) == 6  # 2 per class x 3 classes
        img, _ = ds.load(0)
        assert img.shape == (16, 16, 3)

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

        # Native resample is PIL-parity bicubic (ADVICE r2); only the JPEG
        # DCT prescale path may differ slightly.
        ref = np.asarray(Image.open(path).convert("RGB").resize((32, 32),
                                                                Image.BICUBIC))
        assert np.mean(np.abs(out.astype(int) - ref.astype(int))) < 4

    def test_native_loader_survives_corrupt_files(self, tmp_path):
        """Corrupt/truncated/empty image files must not crash (or worse,
        segfault) the C++ workers: failed decodes are zero-filled, counted,
        and surfaced as a loud warning at epoch end — the reference's torch
        DataLoader would kill the worker process instead."""
        from PIL import Image

        from cross_scale_mae_tpu.data import DataLoader, FmowRgbDataset
        from cross_scale_mae_tpu.data.native import get_library

        if get_library() is None:
            pytest.skip("native loader not built")
        rng = np.random.default_rng(1)
        rows = []
        for i in range(6):
            p = tmp_path / f"ok_{i}.jpg"
            Image.fromarray(
                rng.integers(0, 256, (40, 40, 3), np.uint8)).save(p)
            rows.append((i % 3, p.name))
        corrupt = {
            "trunc.jpg": bytes.fromhex("ffd8ffe000104a46494600") + b"\0" * 40,
            "garbage.jpg": b"not an image" * 8,
            "empty.jpg": b"",
        }
        for name, blob in corrupt.items():
            (tmp_path / name).write_bytes(blob)
            rows.append((0, name))
        csv = tmp_path / "index.csv"
        with open(csv, "w") as f:
            f.write("category,image_path\n")
            for label, name in rows:
                f.write(f"{label},{name}\n")

        ds = FmowRgbDataset(str(csv), canvas_size=32)
        dl = DataLoader(ds, 4, seed=0, num_threads=2, drop_last=False)
        assert dl._native is not None, "native path should engage"
        with pytest.warns(UserWarning, match="failed"):
            batches = list(dl.epoch(0))
        total = sum(len(lbls) for _, lbls in batches)
        assert total == 9  # every row delivered, corrupt ones zero-filled
        # Second epoch still works (worker threads alive after failures).
        batches2 = list(dl.epoch(1))
        assert sum(len(l) for _, l in batches2) == 9

    def test_native_loader_majority_failure_raises(self, tmp_path):
        """When HALF OR MORE of an epoch fails to decode, zero-fill would
        mean training on garbage — the loader must refuse instead."""
        from PIL import Image

        from cross_scale_mae_tpu.data import DataLoader, FmowRgbDataset
        from cross_scale_mae_tpu.data.native import get_library

        if get_library() is None:
            pytest.skip("native loader not built")
        rng = np.random.default_rng(2)
        rows = []
        for i in range(2):
            p = tmp_path / f"ok_{i}.jpg"
            Image.fromarray(
                rng.integers(0, 256, (40, 40, 3), np.uint8)).save(p)
            rows.append((0, p.name))
        for i in range(4):
            (tmp_path / f"bad_{i}.jpg").write_bytes(b"not an image" * 8)
            rows.append((1, f"bad_{i}.jpg"))
        csv = tmp_path / "index.csv"
        with open(csv, "w") as f:
            f.write("category,image_path\n")
            for label, name in rows:
                f.write(f"{label},{name}\n")
        ds = FmowRgbDataset(str(csv), canvas_size=32)
        dl = DataLoader(ds, 3, seed=0, num_threads=2, drop_last=False)
        assert dl._native is not None, "native path should engage"
        with pytest.raises(RuntimeError, match="refusing"):
            list(dl.epoch(0))

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
        # Lossless + PIL-parity bicubic resampler: within 1 LSB of
        # PIL.resize(BICUBIC) at any scale (the shared resampler also serves
        # the multiband TIFF path, so this pins its parity too).
        for canvas in (32, 75):
            got = decode_jpeg(str(p), canvas)
            ref = np.asarray(Image.fromarray(arr).resize((canvas, canvas),
                                                         Image.BICUBIC))
            assert np.abs(got.astype(int) - ref.astype(int)).max() <= 1
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


def _write_tiff(path, arr, tiled=False):
    """Minimal uncompressed chunky little-endian TIFF writer (HWC array of
    uint8/uint16/float32) — rasterio/tifffile are not in the image, so tests
    generate multi-band fixtures by hand."""
    import struct

    h, w, c = arr.shape
    if arr.dtype == np.uint8:
        bps, fmt = 8, 1
    elif arr.dtype == np.uint16:
        bps, fmt = 16, 1
    elif arr.dtype == np.float32:
        bps, fmt = 32, 3
    else:
        raise ValueError(arr.dtype)
    if tiled:
        # single whole-image tile (w,h must be multiples of 16) — the
        # minimal tiled layout, enough to exercise TIFFReadTile
        assert arr.shape[0] % 16 == 0 and arr.shape[1] % 16 == 0
    data = np.ascontiguousarray(arr).tobytes()
    data_off = 8
    bps_arr_off = data_off + len(data)
    sf_arr_off = bps_arr_off + 2 * c
    ifd_off = sf_arr_off + 2 * c

    def entry(tag, typ, count, value):
        return struct.pack("<HHII", tag, typ, count, value)

    def short_val(tag, v):  # SHORT value packed into the value field
        return struct.pack("<HHIHH", tag, 3, 1, v, 0)

    entries = [
        short_val(256, w),                      # ImageWidth
        short_val(257, h),                      # ImageLength
        entry(258, 3, c, bps_arr_off if c > 2 else 0),  # BitsPerSample
        short_val(259, 1),                      # Compression: none
        short_val(262, 1),                      # Photometric: min-is-black
        short_val(277, c),                      # SamplesPerPixel
        short_val(284, 1),                      # PlanarConfig: chunky
        entry(339, 3, c, sf_arr_off if c > 2 else 0),  # SampleFormat
    ]
    if tiled:
        entries += [
            short_val(322, w),                  # TileWidth = whole image
            short_val(323, h),                  # TileLength
            entry(324, 4, 1, data_off),         # TileOffsets
            entry(325, 4, 1, len(data)),        # TileByteCounts
        ]
    else:
        entries += [
            entry(273, 4, 1, data_off),         # StripOffsets
            short_val(278, h),                  # RowsPerStrip
            entry(279, 4, 1, len(data)),        # StripByteCounts
        ]
    entries.sort(key=lambda e: int.from_bytes(e[:2], "little"))
    if c <= 2:  # inline small arrays
        entries[2] = struct.pack("<HHIHH", 258, 3, c, bps, bps if c == 2 else 0)
        entries[10] = struct.pack("<HHIHH", 339, 3, c, fmt, fmt if c == 2 else 0)
    with open(path, "wb") as f:
        f.write(struct.pack("<2sHI", b"II", 42, ifd_off))
        f.write(data)
        f.write(struct.pack(f"<{c}H", *([bps] * c)))
        f.write(struct.pack(f"<{c}H", *([fmt] * c)))
        f.write(struct.pack("<H", len(entries)))
        for e in entries:
            f.write(e)
        f.write(struct.pack("<I", 0))


class TestNativeTiff:
    """Round 2: multi-band GeoTIFF decode in C++ (Sentinel/EuroSAT path).
    Replaces the reference's rasterio dependency (util/datasets.py:412,546)."""

    def _skip_if_unbuilt(self):
        from cross_scale_mae_tpu.data.native import get_library

        if get_library() is None:
            pytest.skip("native loader not built")

    def test_raw_tiff_roundtrip_uint16(self, tmp_path):
        self._skip_if_unbuilt()
        from cross_scale_mae_tpu.data.native import read_tiff

        rng = np.random.default_rng(0)
        arr = rng.integers(0, 10000, (19, 23, 13), np.uint16)
        p = tmp_path / "bands.tif"
        _write_tiff(str(p), arr)
        out = read_tiff(str(p))
        assert out is not None and out.shape == (19, 23, 13)
        np.testing.assert_array_equal(out, arr.astype(np.float32))

    def test_raw_tiff_roundtrip_float32_and_gray(self, tmp_path):
        self._skip_if_unbuilt()
        from cross_scale_mae_tpu.data.native import read_tiff

        rng = np.random.default_rng(1)
        arr = rng.standard_normal((9, 7, 4)).astype(np.float32)
        p = tmp_path / "f32.tif"
        _write_tiff(str(p), arr)
        np.testing.assert_array_equal(read_tiff(str(p)), arr)
        gray = rng.integers(0, 255, (11, 5, 1), np.uint8)
        p2 = tmp_path / "gray.tif"
        _write_tiff(str(p2), gray)
        np.testing.assert_array_equal(read_tiff(str(p2)),
                                      gray.astype(np.float32))

    @pytest.fixture
    def eurosat_dir(self, tmp_path):
        rng = np.random.default_rng(2)
        from cross_scale_mae_tpu.data.datasets import SENTINEL_MEAN, SENTINEL_STD

        paths = []
        for cat in ("Forest", "River"):
            (tmp_path / cat).mkdir()
            for i in range(4):
                # uint16 (the real Sentinel-2 sample type) spanning
                # mean +- 2.5 sigma per band — exercises the boundary
                # pixels where normalize rounding differences would show
                arr = np.stack(
                    [
                        rng.uniform(max(m - 2.5 * s, 0), m + 2.5 * s, (16, 16))
                        for m, s in zip(SENTINEL_MEAN, SENTINEL_STD)
                    ],
                    axis=-1,
                ).astype(np.uint16)
                p = tmp_path / cat / f"t{i}.tif"
                _write_tiff(str(p), arr)
                paths.append(str(p))
        lst = tmp_path / "files.txt"
        lst.write_text("\n".join(paths) + "\n")
        return lst, paths

    def test_eurosat_native_read_matches_python_pipeline(self, eurosat_dir):
        self._skip_if_unbuilt()
        from cross_scale_mae_tpu.data.datasets import (
            EurosatDataset, SENTINEL_MEAN, SENTINEL_STD, sentinel_normalize,
        )
        from cross_scale_mae_tpu.data.native import read_tiff

        lst, paths = eurosat_dir
        ds = EurosatDataset(str(lst), canvas_size=16,
                            masked_bands=[1], dropped_bands=[0, 9])
        assert ds.in_c == 11
        img = ds._load_raw(0)  # native read_tiff backend under the hood
        raw = read_tiff(paths[0])
        raw[..., 1] = SENTINEL_MEAN[1]
        ref = sentinel_normalize(raw, SENTINEL_MEAN, SENTINEL_STD)
        keep = [i for i in range(13) if i not in (0, 9)]
        np.testing.assert_array_equal(img, ref[..., keep])

    def test_native_batch_loader_multiband(self, eurosat_dir):
        # The C++ batch pipeline (mask -> SentinelNormalize -> drop in the
        # worker) must match the Python per-item path bit-for-bit when the
        # tile is already at canvas size (no resample).
        self._skip_if_unbuilt()
        from cross_scale_mae_tpu.data.datasets import EurosatDataset

        lst, paths = eurosat_dir
        ds = EurosatDataset(str(lst), canvas_size=16,
                            masked_bands=[1], dropped_bands=[0, 9])
        dl = DataLoader(ds, 4, shuffle=False, drop_last=False, num_threads=2)
        assert dl._native is not None, "native path should engage for TIFFs"
        batches = list(dl.epoch(0))
        assert [b[0].shape for b in batches] == [(4, 16, 16, 11)] * 2
        flat = np.concatenate([b[0] for b in batches])
        ref = np.stack([ds.load(i)[0] for i in range(8)])
        np.testing.assert_array_equal(flat, ref)
        labels = np.concatenate([b[1] for b in batches])
        np.testing.assert_array_equal(labels, ds.labels)

    def test_tiled_tiff_roundtrip(self, tmp_path):
        # GDAL/COG tiles are the common GeoTIFF layout; libtiff tile path.
        self._skip_if_unbuilt()
        from cross_scale_mae_tpu.data.native import read_tiff

        rng = np.random.default_rng(5)
        arr = rng.integers(0, 10000, (16, 32, 13), np.uint16)
        p = tmp_path / "tiled.tif"
        _write_tiff(str(p), arr, tiled=True)
        out = read_tiff(str(p))
        assert out is not None
        np.testing.assert_array_equal(out, arr.astype(np.float32))

    def test_unreadable_tiff_falls_back_to_python(self, tmp_path):
        # A dataset whose tiles the native reader rejects must NOT engage
        # the C++ batch path (which would zero-fill) — probe-decode gate.
        self._skip_if_unbuilt()
        from cross_scale_mae_tpu.data.datasets import EurosatDataset

        bad = tmp_path / "Forest"
        bad.mkdir()
        (bad / "t0.tif").write_bytes(b"II*\x00garbage-not-a-tiff")
        lst = tmp_path / "files.txt"
        lst.write_text(str(bad / "t0.tif") + "\n")
        ds = EurosatDataset(str(lst), canvas_size=16)
        dl = DataLoader(ds, 1, shuffle=False, drop_last=False, num_threads=1)
        assert dl._native is None, "probe gate must refuse undecodable tiles"


class TestMaxShardSteps:
    def test_unequal_shards_round_up(self):
        ds = SyntheticDataset(9, canvas_size=8)
        dl0 = DataLoader(ds, 4, shuffle=False, drop_last=False,
                         shard_id=0, num_shards=2, num_threads=1)
        dl1 = DataLoader(ds, 4, shuffle=False, drop_last=False,
                         shard_id=1, num_shards=2, num_threads=1)
        assert dl0.steps_per_epoch() == 2  # shard of 5
        assert dl1.steps_per_epoch() == 1  # shard of 4
        # Every host must execute the LARGEST shard's batch count.
        assert dl0.max_shard_steps() == dl1.max_shard_steps() == 2

    def test_drop_last_equals_steps(self):
        ds = SyntheticDataset(64, canvas_size=8)
        dl = DataLoader(ds, 4, shuffle=True, drop_last=True,
                        shard_id=1, num_shards=2, num_threads=1)
        assert dl.max_shard_steps() == dl.steps_per_epoch()



def test_sentinel_csv_native_batch(tmp_path):
    # fMoW-Sentinel CSV format (category/timestamp/image_path + year
    # filtering) through the C++ multiband batch path.
    from cross_scale_mae_tpu.data.native import get_library

    if get_library() is None:
        pytest.skip("native loader not built")
    from cross_scale_mae_tpu.data.datasets import (
        SENTINEL_MEAN, SENTINEL_STD, SentinelDataset,
    )

    rng = np.random.default_rng(7)
    rows = []
    for i in range(6):
        arr = np.stack(
            [
                rng.uniform(max(m - 2 * s, 0), m + 2 * s, (8, 8))
                for m, s in zip(SENTINEL_MEAN, SENTINEL_STD)
            ],
            axis=-1,
        ).astype(np.uint16)
        p = tmp_path / f"s{i}.tif"
        _write_tiff(str(p), arr)
        year = 2015 + (i % 2)  # alternate 2015/2016
        cat = "airport" if i % 3 else "port"
        rows.append(f"{cat},{year}-06-01T00:00:00Z,{p.name}")
    csv_path = tmp_path / "sentinel.csv"
    csv_path.write_text(
        "category,timestamp,image_path\n" + "\n".join(rows) + "\n"
    )
    ds = SentinelDataset(str(csv_path), canvas_size=8, years=[2016])
    assert len(ds) == 3  # year filter kept half
    dl = DataLoader(ds, 2, shuffle=False, drop_last=False, num_threads=1)
    assert dl._native is not None
    batches = list(dl.epoch(0))
    flat = np.concatenate([b[0] for b in batches])
    ref = np.stack([ds.load(i)[0] for i in range(3)])
    np.testing.assert_array_equal(flat, ref)


def test_native_and_python_loaders_agree_on_shard_step_counts(tmp_path):
    """Awkward dataset sizes: both loader backends must give every shard the
    same steps_per_epoch (drop_last) and the same max_shard_steps (eval) —
    a native/python disagreement would desync a mixed-backend pod."""
    from PIL import Image

    from cross_scale_mae_tpu.data.datasets import FmowRgbDataset
    from cross_scale_mae_tpu.data.native import get_library

    if get_library() is None:
        pytest.skip("native loader not built")
    rng = np.random.default_rng(0)
    names = []
    for i in range(37):
        p = tmp_path / f"i{i:02d}.jpg"
        Image.fromarray(
            rng.integers(0, 255, (12, 12, 3), np.uint8)
        ).save(p, quality=90)
        names.append(p.name)
    csv = tmp_path / "x.csv"
    csv.write_text(
        "category,image_path\n" + "\n".join(f"0,{n}" for n in names) + "\n"
    )
    for drop_last, shuffle in ((True, True), (False, False)):
        counts = {}
        for backend in ("native", "python"):
            per_shard = []
            for sid in range(2):
                ds = FmowRgbDataset(str(csv), canvas_size=12)
                dl = DataLoader(
                    ds, 4, shuffle=shuffle, drop_last=drop_last,
                    shard_id=sid, num_shards=2, num_threads=1,
                    use_native=(backend == "native"),
                )
                if backend == "native":
                    assert dl._native is not None
                n_batches = len(list(dl.epoch(0)))
                per_shard.append(n_batches)
            counts[backend] = per_shard
        assert counts["native"] == counts["python"], (drop_last, counts)
        if drop_last:
            # 37 -> usable 32 -> 16/shard -> 4 batches on EVERY shard
            assert counts["python"] == [4, 4]
        else:
            # shards 19/18 -> ceil/4 = 5/5 (equal here; max_shard_steps
            # guards the unequal case, tested separately)
            assert counts["python"] == [5, 5]
