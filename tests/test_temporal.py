"""fMoW temporal pairs: dataset, loader, and the cross-temporal pretrain view.

The reference's ``Dataset_fmow_temporal`` (util/datasets.py:237-294) is dead
code (undefined ``image_arr``/``label_arr``/``ts``); these tests cover the
repaired implementation (data/datasets.FmowTemporalDataset) and its
integration as the multi-scale objective's second view (models/mae.py).
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from cross_scale_mae_tpu.configs import get_mae_config
from cross_scale_mae_tpu.data import DataLoader, FmowTemporalDataset, build_dataset
from cross_scale_mae_tpu.models.mae import mae_init, mae_loss_fn


@pytest.fixture(scope="module")
def temporal_csv(tmp_path_factory):
    from PIL import Image

    d = tmp_path_factory.mktemp("temporal")
    rng = np.random.default_rng(7)
    rows = ["category,image_path,image_path2,timestamp,timestamp2,site"]
    for i in range(10):
        for j, tag in enumerate("ab"):
            arr = rng.integers(0, 256, (36 + 2 * i, 44, 3), np.uint8)
            Image.fromarray(arr).save(d / f"img_{i:02d}{tag}.jpg", quality=92)
        rows.append(
            f"{i % 3},img_{i:02d}a.jpg,img_{i:02d}b.jpg,"
            f"{2014 + i % 4}-{1 + i % 12:02d}-05T{i % 24:02d}:30:00Z,"
            f"{2015 + i % 3}-07-05,site_{i}"
        )
    csv_path = d / "pairs.csv"
    csv_path.write_text("\n".join(rows) + "\n")
    return str(csv_path)


class TestDataset:
    def test_load_shapes_and_labels(self, temporal_csv):
        ds = FmowTemporalDataset(temporal_csv, canvas_size=24)
        assert len(ds) == 10 and ds.num_classes == 3
        assert ds.sample_shape == (2, 24, 24, 3)
        pair, label = ds.load(3)
        assert pair.shape == (2, 24, 24, 3) and pair.dtype == np.uint8
        assert label == 0
        # The two frames decode from distinct files.
        assert not np.array_equal(pair[0], pair[1])

    def test_timestamp_parsing(self, temporal_csv):
        ds = FmowTemporalDataset(temporal_csv, canvas_size=24)
        assert ds.timestamps.shape == (10, 2, 3)
        # min_year over BOTH columns: 2014 (row 0 col 0).
        assert ds.min_year == 2014
        # Row 0: frame 0 is 2014-01-05T00 -> [0, 0, 0]; frame 1 is
        # 2015-07-05 date-only -> [1, 6, 0] (reference encoding
        # [year-min_year, month-1, hour], util/datasets.py:287-292).
        np.testing.assert_array_equal(ds.timestamps[0, 0], [0, 0, 0])
        np.testing.assert_array_equal(ds.timestamps[0, 1], [1, 6, 0])
        # Row 5: 2015-06-05T05 -> [1, 5, 5].
        np.testing.assert_array_equal(ds.timestamps[5, 0], [1, 5, 5])

    def test_chronological_ordering(self, temporal_csv):
        """Pairs are re-anchored so frame 0 is the EARLIER capture, whatever
        the CSV column order — row 3 (2017-04 vs 2015-07) must swap."""
        ds = FmowTemporalDataset(temporal_csv, canvas_size=24)
        # Row 3's CSV order is reversed: timestamp=2017-04, timestamp2=2015-07.
        assert ds.paths[3].endswith("img_03b.jpg")
        assert ds.paths2[3].endswith("img_03a.jpg")
        # Row 0 (2014-01 vs 2015-07) keeps CSV order.
        assert ds.paths[0].endswith("img_00a.jpg")
        # After ordering every pair is non-decreasing in time.
        t = ds.timestamps
        assert np.all(
            (t[:, 1, 0] > t[:, 0, 0])
            | ((t[:, 1, 0] == t[:, 0, 0]) & (t[:, 1, 1] >= t[:, 0, 1]))
        )

    def test_same_month_ordering_uses_day(self, tmp_path):
        """Anchoring must compare the FULL date: the reference's
        parse_timestamp encoding drops the day (util/datasets.py:287-292),
        so a same-month pair whose later capture is earlier-in-CSV-order
        (June 30 before June 1, hours reversed) would otherwise anchor on
        the LATER frame."""
        from PIL import Image

        rng = np.random.default_rng(1)
        for tag in "ab":
            Image.fromarray(
                rng.integers(0, 256, (16, 16, 3), np.uint8)
            ).save(tmp_path / f"{tag}.png")
        csv_p = tmp_path / "pairs.csv"
        csv_p.write_text(
            "category,image_path,image_path2,timestamp,timestamp2\n"
            "0,a.png,b.png,2015-06-30T02:00:00,2015-06-01T20:00:00\n"
        )
        ds = FmowTemporalDataset(str(csv_p), canvas_size=16)
        # June 1 (b.png) is the earlier capture despite its later hour.
        assert ds.paths[0].endswith("b.png")
        assert ds.paths2[0].endswith("a.png")
        assert ds.time_gaps_months()[0] == 0

    def test_time_gaps_months(self, temporal_csv):
        ds = FmowTemporalDataset(temporal_csv, canvas_size=24)
        gaps = ds.time_gaps_months()
        assert gaps.shape == (10,) and gaps.dtype == np.int32
        assert np.all(gaps >= 0)
        assert gaps[0] == 18  # 2014-01 -> 2015-07
        assert gaps[3] == 21  # 2015-07 -> 2017-04 (swapped row)

    def test_missing_column_errors(self, temporal_csv, tmp_path):
        bad = tmp_path / "bad.csv"
        bad.write_text("category,image_path,timestamp\n0,x.jpg,2014-01-01\n")
        with pytest.raises(ValueError, match="image_path2"):
            FmowTemporalDataset(str(bad), canvas_size=24)

    def test_build_dataset_dispatch(self, temporal_csv):
        ds = build_dataset(
            "fmow_temporal", True, train_path=temporal_csv, input_size=16,
            canvas_scale=1.5,
        )
        assert isinstance(ds, FmowTemporalDataset)
        assert ds.canvas_size == 24


class TestLoader:
    def test_batch_shapes(self, temporal_csv):
        ds = FmowTemporalDataset(temporal_csv, canvas_size=24)
        loader = DataLoader(ds, batch_size=4, shuffle=True, seed=1)
        imgs, labels = next(iter(loader.epoch(0)))
        assert imgs.shape == (4, 2, 24, 24, 3) and imgs.dtype == np.uint8
        assert labels.shape == (4,) and labels.dtype == np.int32
        # Native C++ loader must not claim frame-stack datasets.
        assert loader._native is None

    def test_single_thread_matches_pool(self, temporal_csv):
        ds = FmowTemporalDataset(temporal_csv, canvas_size=24)
        a = next(iter(DataLoader(ds, 4, seed=3, num_threads=1).epoch(0)))
        b = next(iter(DataLoader(ds, 4, seed=3, num_threads=4).epoch(0)))
        np.testing.assert_array_equal(a[0], b[0])
        np.testing.assert_array_equal(a[1], b[1])


class TestTemporalObjective:
    def _cfg(self, **kw):
        return get_mae_config(
            "mae_vit_tiny_MsLdCeCd", input_size=16, patch_size=8,
            compute_dtype="float32", **kw,
        )

    def test_identical_frames_consistent_mask_zero_le(self):
        """Frame 1 == frame 0 + consistent mask => the two views' forwards
        are identical: loss_e == 0 and the per-view recon losses match."""
        cfg = get_mae_config(
            "mae_vit_tiny_MsLdLe", input_size=16, patch_size=8,
            compute_dtype="float32",
        )
        params, state = mae_init(jax.random.key(0), cfg)
        imgs = jax.random.normal(jax.random.key(1), (4, 16, 16, 3))
        pair = jnp.stack([imgs, imgs], axis=1)
        out = mae_loss_fn(
            params, state, cfg, pair, jax.random.key(2), consistent_mask=True
        )
        assert float(out.losses["loss_e"]) < 1e-10
        assert np.isfinite(float(out.loss))

    def test_distinct_frames_move_the_losses(self):
        cfg = self._cfg()
        params, state = mae_init(jax.random.key(0), cfg)
        f0 = jax.random.normal(jax.random.key(1), (4, 16, 16, 3))
        f1 = jax.random.normal(jax.random.key(2), (4, 16, 16, 3))
        same = mae_loss_fn(params, state, cfg, jnp.stack([f0, f0], 1),
                           jax.random.key(3), consistent_mask=True)
        diff = mae_loss_fn(params, state, cfg, jnp.stack([f0, f1], 1),
                           jax.random.key(3), consistent_mask=True)
        assert float(diff.losses["loss_cd"]) > float(same.losses["loss_cd"])
        assert np.isfinite(float(diff.loss))

    def test_gradients_flow(self):
        cfg = self._cfg()
        params, state = mae_init(jax.random.key(0), cfg)
        pair = jax.random.normal(jax.random.key(1), (2, 2, 16, 16, 3))

        def f(p):
            return mae_loss_fn(p, state, cfg, pair, jax.random.key(2)).loss

        grads = jax.grad(f)(params)
        leaves = jax.tree.leaves(grads)
        assert all(np.all(np.isfinite(g)) for g in leaves)
        assert any(float(jnp.abs(g).max()) > 0 for g in leaves)

    def test_single_scale_rejects_temporal(self):
        cfg = get_mae_config(
            "mae_vit_tiny", input_size=16, patch_size=8,
            compute_dtype="float32",
        )
        params, state = mae_init(jax.random.key(0), cfg)
        pair = jnp.zeros((2, 2, 16, 16, 3))
        with pytest.raises(ValueError, match="multi-scale"):
            mae_loss_fn(params, state, cfg, pair, jax.random.key(1))


class TestTemporalConsistencyEval:
    """viz/temporal.py: the timestamps' consumer (VERDICT r4 §next-7)."""

    def _cfg(self):
        return get_mae_config(
            "mae_vit_tiny_MsLdCeCd", input_size=16, patch_size=8,
            compute_dtype="float32",
        )

    def test_identical_pairs_cos_one(self, tmp_path):
        """Pairs whose two frames are the same file must score cos == 1."""
        from PIL import Image

        from cross_scale_mae_tpu.viz import temporal_consistency_by_gap

        rng = np.random.default_rng(0)
        rows = ["category,image_path,image_path2,timestamp,timestamp2"]
        for i in range(3):
            Image.fromarray(
                rng.integers(0, 256, (16, 16, 3), np.uint8)
            ).save(tmp_path / f"s{i}.png")
            rows.append(f"0,s{i}.png,s{i}.png,2014-0{i + 1}-01,2015-0{i + 1}-01")
        csv = tmp_path / "same.csv"
        csv.write_text("\n".join(rows) + "\n")
        ds = FmowTemporalDataset(str(csv), canvas_size=16)

        cfg = self._cfg()
        params, _ = mae_init(jax.random.key(0), cfg)
        rep = temporal_consistency_by_gap(params, cfg, ds, batch_size=2)
        assert rep["overall"]["n"] == 3
        assert rep["overall"]["mean_cos"] == pytest.approx(1.0, abs=1e-5)
        assert rep["gap_months"] == {"min": 12, "median": 12.0, "max": 12}

    def test_empty_pairs_csv_fails_loud(self, tmp_path):
        from cross_scale_mae_tpu.viz import temporal_consistency_by_gap

        csv_p = tmp_path / "empty.csv"
        csv_p.write_text(
            "category,image_path,image_path2,timestamp,timestamp2\n"
        )
        ds = FmowTemporalDataset(str(csv_p), canvas_size=16)
        cfg = self._cfg()
        params, _ = mae_init(jax.random.key(0), cfg)
        with pytest.raises(ValueError, match="no rows"):
            temporal_consistency_by_gap(params, cfg, ds)

    def test_evalviz_cli_temporal_report(self, temporal_csv, tmp_path):
        """--temporal_csv end-to-end: checkpoint -> evalviz -> sweep entry
        + temporal_gaps.json on disk (cli/evalviz.py:101-117)."""
        from cross_scale_mae_tpu.cli import evalviz
        from cross_scale_mae_tpu.train import TrainState, build_optimizer
        from cross_scale_mae_tpu.utils.checkpoint import save_checkpoint

        cfg = self._cfg()
        params, mstate = mae_init(jax.random.key(0), cfg)
        state = TrainState.create(
            params, mstate, build_optimizer(params, lambda s: 1e-3)
        )
        ckpt = str(tmp_path / "run" / "checkpoints")
        save_checkpoint(ckpt, 0, state, config_json=cfg.to_json())

        out = str(tmp_path / "viz")
        args = evalviz.get_args_parser().parse_args([
            "--ckpt", ckpt, "--metrics", "mse", "--out", out,
            "--temporal_csv", temporal_csv, "--temporal_batch", "4",
            "--temporal_gap_buckets", "12", "24",
        ])
        sweep = evalviz.main(args)
        (report,) = sweep["temporal_consistency"].values()
        assert report["overall"]["n"] == 10
        assert sum(b["n"] for b in report["buckets"].values()) == 10
        on_disk = json.load(
            open(os.path.join(out, "temporal_gaps.json"))
        )
        assert on_disk == sweep["temporal_consistency"]

    def test_report_structure_and_buckets(self, temporal_csv):
        from cross_scale_mae_tpu.viz import temporal_consistency_by_gap

        ds = FmowTemporalDataset(temporal_csv, canvas_size=24)
        cfg = self._cfg()
        params, _ = mae_init(jax.random.key(0), cfg)
        rep = temporal_consistency_by_gap(
            params, cfg, ds, batch_size=4, bucket_edges=(12, 24)
        )
        assert rep["overall"]["n"] == 10
        assert sum(b["n"] for b in rep["buckets"].values()) == 10
        gaps = ds.time_gaps_months()
        # bucket membership must follow the edges
        expected_mid = int(((gaps >= 12) & (gaps < 24)).sum())
        assert rep["buckets"]["12-23mo"]["n"] == expected_mid
        for b in rep["buckets"].values():
            assert -1.0 <= b["mean_cos"] <= 1.0


@pytest.mark.slow
class TestEndToEnd:
    def test_pretrain_on_temporal_pairs(self, temporal_csv, tmp_path):
        from cross_scale_mae_tpu.cli import pretrain

        args = pretrain.get_args_parser().parse_args([
            "--model", "mae_vit_tiny_MsLdCeCd", "--dataset_type",
            "fmow_temporal", "--train_path", temporal_csv,
            "--input_size", "16", "--patch_size", "8", "--batch_size", "8",
            "--epochs", "1", "--warmup_epochs", "0", "--ckpt_interval", "1",
            "--output_dir", str(tmp_path / "pt"),
            "--compute_dtype", "float32", "--log_interval", "1",
        ])
        res = pretrain.main(args)
        assert res["steps"] == 1  # 10 pairs, bs 8, drop_last
        assert np.isfinite(res["last_metrics"]["loss"])
        assert os.path.isdir(os.path.join(res["output_dir"], "checkpoints"))

    def test_single_view_model_rejected_at_cli(self, temporal_csv, tmp_path):
        from cross_scale_mae_tpu.cli import pretrain

        args = pretrain.get_args_parser().parse_args([
            "--model", "mae_vit_tiny", "--dataset_type", "fmow_temporal",
            "--train_path", temporal_csv, "--input_size", "16",
            "--patch_size", "8", "--batch_size", "4", "--epochs", "1",
            "--output_dir", str(tmp_path / "x"),
        ])
        with pytest.raises(SystemExit, match="multi-scale"):
            pretrain.main(args)
