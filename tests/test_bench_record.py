"""The bench record must survive a proxy-leg crash (VERDICT r3 weak-1).

Round 3's driver record was lost because a transient backend fault in the
reference-proxy leg crashed bench.py AFTER the headline number had been
measured. These tests pin the crash-safety contract: the headline JSON is
printed (flushed) before the proxy leg runs, the proxy gets one retry, and
a total proxy failure still exits 0 with a parseable headline record.

Also covers the analytic-FLOPs helper feeding the new ``mfu`` field.
"""

import io
import json
import sys

import pytest


def _run_main(monkeypatch, capsys, proxy_behavior, argv=("bench.py",),
              fused=None, goodput=None):
    import bench

    monkeypatch.setattr(
        bench, "run_fused", fused or (lambda *a, **k: 2400.0)
    )
    monkeypatch.setattr(
        bench, "run_goodput",
        goodput or (lambda *a, **k: {
            "goodput_imgs_per_sec_per_chip": 500.0,
            "goodput_host_cores": 1,
            "goodput_native_loader": True,
        }),
    )
    monkeypatch.setattr(bench, "run_ref_proxy", proxy_behavior)
    monkeypatch.setattr(sys, "argv", list(argv))
    bench.main()
    out = capsys.readouterr().out.strip().splitlines()
    return [json.loads(line) for line in out if line.startswith("{")]


def test_proxy_crash_still_emits_headline(monkeypatch, capsys):
    def always_fails(*a, **k):
        raise RuntimeError("FAILED_PRECONDITION: TPU backend error")

    records = _run_main(monkeypatch, capsys, always_fails)
    assert records, "no JSON record printed despite successful fused run"
    last = records[-1]
    assert last["value"] == 2400.0
    assert last["unit"] == "imgs/sec/chip"
    assert last["vs_baseline"] == pytest.approx(2400.0 / 380.0, abs=1e-3)
    assert "baseline_measured_proxy" not in last


def test_proxy_transient_fault_retried_once(monkeypatch, capsys):
    calls = {"n": 0}

    def fails_once(*a, **k):
        calls["n"] += 1
        if calls["n"] == 1:
            raise RuntimeError("transient axon fault")
        return 1600.0

    records = _run_main(monkeypatch, capsys, fails_once)
    assert calls["n"] == 2
    last = records[-1]
    assert last["baseline_measured_proxy"] == 1600.0
    assert last["vs_ref_proxy"] == pytest.approx(1.5, abs=1e-3)
    # the first printed line is the headline-only crash-safe record
    assert "baseline_measured_proxy" not in records[0]


def test_headline_printed_before_proxy_runs(monkeypatch, capsys):
    """Ordering contract: the record exists before the risky leg starts."""
    import bench

    seen_at_proxy_time = {}

    def proxy_checks_stdout(*a, **k):
        # capsys buffers stdout; anything printed so far is readable here.
        # Record the FIRST attempt only (the retry sees a drained buffer).
        seen_at_proxy_time.setdefault("out", capsys.readouterr().out)
        raise RuntimeError("die after checking")

    monkeypatch.setattr(bench, "run_fused", lambda *a, **k: 2400.0)
    monkeypatch.setattr(bench, "run_goodput", lambda *a, **k: {})
    monkeypatch.setattr(bench, "run_ref_proxy", proxy_checks_stdout)
    monkeypatch.setattr(sys, "argv", ["bench.py"])
    bench.main()
    assert '"value": 2400.0' in seen_at_proxy_time["out"]


def test_skip_proxy_single_record(monkeypatch, capsys):
    def never(*a, **k):  # pragma: no cover - must not be called
        raise AssertionError("proxy must not run with --skip_proxy")

    records = _run_main(
        monkeypatch, capsys, never,
        argv=("bench.py", "--skip_proxy", "--skip_exact", "--skip_goodput"),
    )
    assert len(records) == 1


def test_exact_gelu_leg_recorded(monkeypatch, capsys):
    """VERDICT r4 §next-2: BENCH records must carry BOTH numerics — the
    tanh-GELU headline AND the strict reference-parity exact-erf run."""
    calls = []

    def fused(steps, bpc, gelu="tanh", **kw):
        calls.append(gelu)
        return {"tanh": 2400.0, "exact": 2100.0, "exact_tanhbwd": 2200.0}[gelu]

    records = _run_main(
        monkeypatch, capsys, lambda *a, **k: 1600.0, fused=fused,
    )
    assert calls == ["tanh", "exact", "exact_tanhbwd"]
    last = records[-1]
    assert last["value"] == 2400.0
    assert last["value_exact_gelu"] == 2100.0
    assert last["vs_baseline_exact"] == pytest.approx(2100.0 / 380.0, abs=1e-3)
    # round-5 third leg: fastest strict-FORWARD-parity mode
    assert last["value_exact_tanhbwd"] == 2200.0
    if "mfu" in last:
        assert last["mfu_exact"] == pytest.approx(
            last["mfu"] * 2100.0 / 2400.0, abs=1e-3
        )
        assert last["mfu_exact_tanhbwd"] == pytest.approx(
            last["mfu"] * 2200.0 / 2400.0, abs=1e-3
        )


def test_exact_gelu_leg_crash_downgrades(monkeypatch, capsys):
    """A crash in the exact leg must not lose the headline record."""

    def fused(steps, bpc, gelu="tanh", **kw):
        if gelu == "exact":
            raise RuntimeError("axon fault")
        return 2400.0

    records = _run_main(
        monkeypatch, capsys, lambda *a, **k: 1600.0, fused=fused,
        argv=("bench.py", "--skip_goodput"),
    )
    last = records[-1]
    assert last["value"] == 2400.0
    assert "value_exact_gelu" not in last
    assert last["baseline_measured_proxy"] == 1600.0


def test_goodput_leg_recorded(monkeypatch, capsys):
    """VERDICT r4 §next-5: input-pipeline goodput recorded beside the
    device-only number, with the host-core count for context."""
    records = _run_main(
        monkeypatch, capsys, lambda *a, **k: 1600.0,
        argv=("bench.py", "--skip_exact"),
    )
    last = records[-1]
    assert last["goodput_imgs_per_sec_per_chip"] == 500.0
    assert last["goodput_host_cores"] == 1
    assert last["value"] == 2400.0  # headline unchanged by the goodput leg


def test_analytic_flops_match_documented_step_cost():
    """docs/VALIDATION.md §5 profiled ~9.8 useful TFLOP/step at b256 for
    the flagship config; the analytic count must land in that bracket."""
    from cross_scale_mae_tpu.configs import get_mae_config
    from cross_scale_mae_tpu.utils.flops import (
        mae_forward_flops_per_image, mae_train_flops_per_image, mfu,
    )

    cfg = get_mae_config("mae_vit_base_MsLdCeCd", input_size=128,
                         patch_size=16, mask_ratio=0.75)
    per_img = mae_train_flops_per_image(cfg)
    assert 9.0e12 <= per_img * 256 <= 11.0e12
    assert per_img == pytest.approx(3 * mae_forward_flops_per_image(cfg))

    # dual-scale must cost ~2x the single-scale trunk
    single = get_mae_config("mae_vit_base", input_size=128, patch_size=16,
                            mask_ratio=0.75)
    ratio = (mae_forward_flops_per_image(cfg)
             / mae_forward_flops_per_image(single))
    assert 1.9 < ratio < 2.2

    assert mfu(2400.0, per_img, "TPU v5 lite") == pytest.approx(
        2400.0 * per_img / 197e12)
    assert mfu(2400.0, per_img, "made-up accelerator") is None


def test_bench_headline_includes_mfu(monkeypatch, capsys):
    records = _run_main(monkeypatch, capsys, lambda *a, **k: 1600.0)
    head = records[0]
    assert "train_flops_per_image" in head
    # on the CPU test platform device_kind has no peak entry -> mfu omitted,
    # on TPU it must be present; either way the record stays parseable
    if "mfu" in head:
        assert 0.0 < head["mfu"] < 1.0
