"""True multi-PROCESS SPMD tests: 2 processes x 4 virtual CPU devices.

Everything else in tests/ simulates multi-chip inside ONE process (the
8-device conftest mesh), which can't catch multi-host-only bugs: the
host-local -> global batch assembly (make_array_from_process_local_data
vs device_put), per-host loader sharding, cross-process collectives
(gloo stands in for ICI/DCN), and the coordinator bootstrap
(parallel/dist.py, replacing util/misc.py:255-296).

Each test launches real subprocesses running the actual CLI main().
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port() -> str:
    import socket

    with socket.socket() as sock:
        sock.bind(("127.0.0.1", 0))
        return str(sock.getsockname()[1])

_DRIVER = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); out = sys.argv[2]; port = sys.argv[3]
from cross_scale_mae_tpu.cli import pretrain
args = pretrain.get_args_parser().parse_args([
    "--model", "mae_vit_tiny_MsLd", "--dataset_type", "synthetic",
    "--synthetic_len", "64", "--input_size", "16", "--patch_size", "8",
    "--batch_size", "32", "--epochs", "2", "--warmup_epochs", "0",
    "--ckpt_interval", "2", "--output_dir", out,
    "--compute_dtype", "float32", "--log_interval", "1",
    "--coordinator_address", "127.0.0.1:" + port,
    "--num_processes", "2", "--process_id", str(pid),
])
res = pretrain.main(args)
print("RESULT", pid, res["steps"], float(res["last_metrics"]["loss"]))
"""


@pytest.mark.slow
def test_two_process_pretrain_end_to_end(tmp_path):
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = ""
    port = _free_port()  # one coordinator port shared by both workers
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, "-c", _DRIVER, str(pid),
             str(tmp_path / "out"), port],  # SHARED dir, as on a real pod
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        ))
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"

    # Both hosts executed the same number of collective steps and agree on
    # the (pmean'd) loss — the multi-host desync failure mode is a hang or
    # divergent losses.
    results = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][-1]
        _, pid, steps, loss = line.split()
        results[int(pid)] = (int(steps), float(loss))
    # global batch 32 over 64 samples = 2 steps/epoch x 2 epochs
    assert results[0][0] == results[1][0] == 4
    assert np.isfinite(results[0][1])
    np.testing.assert_allclose(results[0][1], results[1][1], rtol=1e-6)

    # EXACTLY ONE run dir despite the +N anti-clobber logic (rank 0 picks,
    # broadcasts; independent probing used to race to run/ and run+1/ and
    # deadlock the collective Orbax save).
    runs = [p for p in (tmp_path / "out").iterdir() if p.is_dir()]
    assert len(runs) == 1, [p.name for p in runs]
    run0 = runs[0]
    assert (run0 / "log.jsonl").exists()
    rec = json.loads((run0 / "log.jsonl").read_text().splitlines()[-1])
    assert np.isfinite(rec["train_loss"])
    # The collectively-written checkpoint restores (no partial shards).
    assert (run0 / "checkpoints").is_dir()


_EVAL_DRIVER = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); out = sys.argv[2]; port = sys.argv[3]
from cross_scale_mae_tpu.cli import finetune
args = finetune.get_args_parser().parse_args([
    "--model", "vit_base_patch16", "--embed_dim", "64", "--depth", "2",
    "--num_heads", "4", "--input_size", "16", "--patch_size", "8",
    "--dataset_type", "synthetic", "--synthetic_len", "260",
    "--nb_classes", "3", "--batch_size", "8", "--epochs", "1",
    "--warmup_epochs", "0", "--output_dir", out, "--eval",
    "--compute_dtype", "float32", "--log_interval", "1",
    "--coordinator_address", "127.0.0.1:" + port,
    "--num_processes", "2", "--process_id", str(pid),
])
res = finetune.main(args)
print("RESULT", pid, res["acc1"], res["loss"], res["macro_f1"],
      res["micro_f1"], res["miou"])
"""

_EVAL_DRIVER_SINGLE = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
out = sys.argv[1]
from cross_scale_mae_tpu.cli import finetune
args = finetune.get_args_parser().parse_args([
    "--model", "vit_base_patch16", "--embed_dim", "64", "--depth", "2",
    "--num_heads", "4", "--input_size", "16", "--patch_size", "8",
    "--dataset_type", "synthetic", "--synthetic_len", "260",
    "--nb_classes", "3", "--batch_size", "8", "--epochs", "1",
    "--warmup_epochs", "0", "--output_dir", out, "--eval",
    "--compute_dtype", "float32", "--log_interval", "1",
])
res = finetune.main(args)
print("RESULT", 0, res["acc1"], res["loss"], res["macro_f1"],
      res["micro_f1"], res["miou"])
"""


@pytest.mark.slow
def test_two_process_eval_unequal_shards(tmp_path):
    """finetune.main inflates the synthetic eval split to
    max(synthetic_len // 4, 64) samples; 260 -> 65 eval samples over
    2 hosts at per-host batch 4 gives shards of 33 vs 32 = 9 vs 8
    collective eval steps. Without the max_shard_steps sync padding, the
    9-step host hangs in its last step. Both hosts must finish and agree
    on the global valid-weighted metrics."""
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = ""
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _EVAL_DRIVER, str(pid),
             str(tmp_path / "out"), port],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
    results = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][-1]
        _, pid, *vals = line.split()
        results[int(pid)] = tuple(float(v) for v in vals)
    # Both ranks agree on every global metric, including the F1/mIoU family
    # (the in-graph confusion matrix is psum'd, not per-host like the
    # reference's per-rank sklearn counts).
    np.testing.assert_allclose(results[0], results[1], rtol=1e-6)
    assert np.isfinite(results[0][1])

    # And the two-process global metrics equal a single-process run of the
    # identical eval (same seed/model/dataset): the global confusion matrix
    # must be exactly the union of both hosts' shards.
    single = subprocess.run(
        [sys.executable, "-c", _EVAL_DRIVER_SINGLE, str(tmp_path / "single")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert single.returncode == 0, single.stdout + single.stderr
    line = [ln for ln in single.stdout.splitlines()
            if ln.startswith("RESULT")][-1]
    single_vals = tuple(float(v) for v in line.split()[2:])
    np.testing.assert_allclose(results[0], single_vals, rtol=1e-5, atol=1e-4)


_SHARDMAP_RESUME_DRIVER = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); out = sys.argv[2]; port = sys.argv[3]
from cross_scale_mae_tpu.cli import pretrain

def run(extra):
    args = pretrain.get_args_parser().parse_args([
        "--model", "mae_vit_tiny_MsLd", "--dataset_type", "synthetic",
        "--synthetic_len", "64", "--input_size", "16", "--patch_size", "8",
        "--batch_size", "32", "--warmup_epochs", "0",
        "--ckpt_interval", "1", "--output_dir", out,
        "--compute_dtype", "float32", "--log_interval", "1",
        "--ddp_mode", "shard_map",
        "--coordinator_address", "127.0.0.1:" + port,
        "--num_processes", "2", "--process_id", str(pid),
    ] + extra)
    return pretrain.main(args)

r1 = run(["--epochs", "1"])
ckpt = os.path.join(r1["output_dir"], "checkpoints")
r2 = run(["--epochs", "2", "--resume", ckpt])
print("RESULT", pid, r1["steps"], r2["steps"],
      float(r2["last_metrics"]["loss"]))
"""


@pytest.mark.slow
def test_two_process_shard_map_and_resume(tmp_path):
    """shard_map DDP mode across real processes (manual SPMD + pmean over
    gloo), then a second invocation restoring the collectively-written
    checkpoint: resume must skip epoch 0 (1 epoch of new steps only) and
    both hosts must agree on the final loss."""
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = ""
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _SHARDMAP_RESUME_DRIVER, str(pid),
             str(tmp_path / "out"), port],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
    results = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][-1]
        _, pid, s1, s2, loss = line.split()
        results[int(pid)] = (int(s1), int(s2), float(loss))
    # 64 samples / global batch 32 = 2 steps per epoch; the resumed run
    # covers only epoch 1.
    assert results[0][:2] == results[1][:2] == (2, 2)
    np.testing.assert_allclose(results[0][2], results[1][2], rtol=1e-6)


_ZERO1_TP_DRIVER = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); out = sys.argv[2]; port = sys.argv[3]
from cross_scale_mae_tpu.cli import pretrain
args = pretrain.get_args_parser().parse_args([
    "--model", "mae_vit_tiny_MsLd", "--dataset_type", "synthetic",
    "--synthetic_len", "64", "--input_size", "16", "--patch_size", "8",
    "--batch_size", "32", "--epochs", "1", "--warmup_epochs", "0",
    "--ckpt_interval", "1", "--output_dir", out,
    "--compute_dtype", "float32", "--log_interval", "1",
    "--zero1", "--model_parallel", "2",
    "--coordinator_address", "127.0.0.1:" + port,
    "--num_processes", "2", "--process_id", str(pid),
])
res = pretrain.main(args)
print("RESULT", pid, res["steps"], float(res["last_metrics"]["loss"]))
"""


@pytest.mark.slow
def test_two_process_zero1_tensor_parallel(tmp_path):
    """ZeRO-1 (optimizer moments sharded over 'data') combined with 2-way
    tensor parallelism on a mesh that SPANS processes ({'data':4,'model':2}
    over 2 hosts x 4 devices): the optimizer update then reads moment
    shards living on both hosts. Completes + identical losses = the
    cross-host sharded-state path works end-to-end incl. the collective
    checkpoint save."""
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = ""
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _ZERO1_TP_DRIVER, str(pid),
             str(tmp_path / "out"), port],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
    results = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][-1]
        _, pid, steps, loss = line.split()
        results[int(pid)] = (int(steps), float(loss))
    assert results[0][0] == results[1][0] == 2
    assert np.isfinite(results[0][1])
    np.testing.assert_allclose(results[0][1], results[1][1], rtol=1e-6)


_EMBED_DRIVER = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); out = sys.argv[2]; port = sys.argv[3]
from cross_scale_mae_tpu.cli import embed, pretrain
res = pretrain.main(pretrain.get_args_parser().parse_args([
    "--model", "mae_vit_tiny", "--dataset_type", "synthetic",
    "--synthetic_len", "32", "--input_size", "16", "--patch_size", "8",
    "--batch_size", "16", "--epochs", "1", "--warmup_epochs", "0",
    "--ckpt_interval", "1", "--output_dir", out,
    "--compute_dtype", "float32", "--log_interval", "2",
    "--coordinator_address", "127.0.0.1:" + port,
    "--num_processes", "2", "--process_id", str(pid),
]))
ckpt = os.path.join(res["output_dir"], "checkpoints")
r2 = embed.main(embed.get_args_parser().parse_args([
    "--ckpt", ckpt, "--dataset_type", "synthetic", "--synthetic_len", "21",
    "--batch_size", "16", "--pool", "cls",
    "--output_dir", os.path.join(out, "feats"),
]))
print("RESULT", pid, r2["count"], r2["shape"][0], r2["shape"][1])
"""


@pytest.mark.slow
def test_two_process_embed(tmp_path):
    """Embedding extraction on a 2-process mesh: the replicated output
    sharding must let BOTH hosts fetch the full feature block (a batch-
    sharded output is not fully addressable on either host), and rank 0's
    features.npy must cover the whole dataset."""
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = ""
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _EMBED_DRIVER, str(pid),
             str(tmp_path / "out"), port],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][-1]
        _, _, count, rows, dim = line.split()
        assert (int(count), int(rows), int(dim)) == (21, 21, 128)
    feats = np.load(tmp_path / "out" / "feats" / "features.npy")
    assert feats.shape == (21, 128) and np.isfinite(feats).all()


_KILL_DRIVER = """
import os, sys, time
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); port = sys.argv[2]
from cross_scale_mae_tpu.parallel.dist import initialize_distributed
initialize_distributed("127.0.0.1:" + port, 2, pid)
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
sh = NamedSharding(mesh, P("data"))
f = jax.jit(lambda x: jnp.sum(x * 2), out_shardings=NamedSharding(mesh, P()))
g = jax.make_array_from_process_local_data(
    sh, np.arange(4, dtype=np.float32)
)
for i in range(1000):
    if pid == 1 and i == 3:
        os._exit(42)  # simulate a host crash, no cleanup
    float(f(g))
    print(f"STEP {i}", flush=True)
    time.sleep(1)
"""


@pytest.mark.slow
def test_peer_death_detected_not_hung(tmp_path):
    """Failure detection: when one host dies mid-job, the survivor must
    ABORT (coordination-service heartbeat timeout, ~100 s) rather than hang
    in the next collective forever. The reference has no failure detection
    at all (SURVEY.md §5) — a dead rank leaves torchrun peers blocked in
    NCCL until an external watchdog kills them."""
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = ""
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _KILL_DRIVER, str(pid), port],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    try:
        procs[1].communicate(timeout=300)
        assert procs[1].returncode == 42  # the simulated crash
        # Survivor must terminate on its own, with an error, within the
        # detection window (default heartbeat timeout ~100 s + margin).
        # The nonzero exit is the contract; the message wording is JAX-
        # internal and only loosely matched.
        out0 = procs[0].communicate(timeout=300)[0]
        assert procs[0].returncode not in (0, None), out0[-1500:]
        low = out0.lower()
        assert any(k in low for k in
                   ("unhealthy", "crash", "heartbeat", "disconnect")), \
            out0[-1500:]
    finally:
        for p in procs:  # never leak a hung survivor into the CI run
            if p.poll() is None:
                p.kill()


_SHRINK_WRITER = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); out = sys.argv[2]; port = sys.argv[3]
from cross_scale_mae_tpu.cli import pretrain
res = pretrain.main(pretrain.get_args_parser().parse_args([
    "--model", "mae_vit_tiny_MsLd", "--dataset_type", "synthetic",
    "--synthetic_len", "64", "--input_size", "16", "--patch_size", "8",
    "--batch_size", "32", "--epochs", "1", "--warmup_epochs", "0",
    "--ckpt_interval", "1", "--output_dir", out, "--zero1",
    "--compute_dtype", "float32", "--log_interval", "1",
    "--coordinator_address", "127.0.0.1:" + port,
    "--num_processes", "2", "--process_id", str(pid),
]))
print("WROTE", pid, res["output_dir"])
"""

_SHRINK_READER = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=8"
import jax
jax.config.update("jax_platforms", "cpu")
out, ckpt = sys.argv[1], sys.argv[2]
from cross_scale_mae_tpu.cli import pretrain
res = pretrain.main(pretrain.get_args_parser().parse_args([
    "--model", "mae_vit_tiny_MsLd", "--dataset_type", "synthetic",
    "--synthetic_len", "64", "--input_size", "16", "--patch_size", "8",
    "--batch_size", "32", "--epochs", "2", "--warmup_epochs", "0",
    "--ckpt_interval", "2", "--output_dir", out, "--resume", ckpt,
    "--compute_dtype", "float32", "--log_interval", "1",
]))
print("RESULT", res["steps"], float(res["last_metrics"]["loss"]))
"""


@pytest.mark.slow
def test_checkpoint_restores_after_pod_shrink(tmp_path):
    """Elastic topology: a checkpoint written COLLECTIVELY by 2 processes
    (ZeRO-1 moments sharded across both hosts' devices) restores in a
    single-process 8-device run, which trains exactly the remaining epoch.
    The reference cannot change world size across a resume at all (DDP
    state is replicated but the sampler/step accounting assumes the same
    rank count)."""
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = ""
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _SHRINK_WRITER, str(pid),
             str(tmp_path / "out"), port],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"writer {pid} failed:\n{out[-3000:]}"
    run_dir = [ln.split()[-1] for ln in outs[0].splitlines()
               if ln.startswith("WROTE")][-1]
    ckpt = os.path.join(run_dir, "checkpoints")

    reader = subprocess.run(
        [sys.executable, "-c", _SHRINK_READER,
         str(tmp_path / "out2"), ckpt],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert reader.returncode == 0, reader.stdout[-3000:] + reader.stderr[-2000:]
    line = [ln for ln in reader.stdout.splitlines()
            if ln.startswith("RESULT")][-1]
    steps, loss = int(line.split()[1]), float(line.split()[2])
    assert steps == 2  # epoch 0 skipped; only epoch 1 ran
    assert np.isfinite(loss)


_FSDP_TP_DRIVER = """
import os, sys
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")
pid = int(sys.argv[1]); out = sys.argv[2]; port = sys.argv[3]
from cross_scale_mae_tpu.cli import pretrain
args = pretrain.get_args_parser().parse_args([
    "--model", "mae_vit_tiny_MsLd", "--dataset_type", "synthetic",
    "--synthetic_len", "64", "--input_size", "16", "--patch_size", "8",
    "--batch_size", "32", "--epochs", "1", "--warmup_epochs", "0",
    "--ckpt_interval", "1", "--output_dir", out,
    "--compute_dtype", "float32", "--log_interval", "1",
    "--fsdp", "--model_parallel", "2",
    "--coordinator_address", "127.0.0.1:" + port,
    "--num_processes", "2", "--process_id", str(pid),
])
res = pretrain.main(args)
print("RESULT", pid, res["steps"], float(res["last_metrics"]["loss"]))
"""


@pytest.mark.slow
def test_two_process_fsdp_tensor_parallel(tmp_path):
    """FSDP (params+moments sharded over 'data') x 2-way TP on a mesh that
    SPANS processes: every forward all-gathers param shards living on both
    hosts, every backward reduce-scatters. Completes + identical losses +
    a collective checkpoint save of the cross-host-sharded params."""
    env = {k: v for k, v in os.environ.items() if k != "XLA_FLAGS"}
    env["JAX_PLATFORMS"] = ""
    port = _free_port()
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _FSDP_TP_DRIVER, str(pid),
             str(tmp_path / "out"), port],
            cwd=REPO, env=env,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
        )
        for pid in range(2)
    ]
    outs = [p.communicate(timeout=900)[0] for p in procs]
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out[-3000:]}"
    results = {}
    for out in outs:
        line = [ln for ln in out.splitlines() if ln.startswith("RESULT")][-1]
        _, pid, steps, loss = line.split()
        results[int(pid)] = (int(steps), float(loss))
    assert results[0][0] == results[1][0] == 2
    assert np.isfinite(results[0][1])
    np.testing.assert_allclose(results[0][1], results[1][1], rtol=1e-6)


@pytest.mark.slow
def test_elastic_launcher_kills_peer_shrinks_and_resumes(tmp_path, monkeypatch):
    """Full elastic drill through cli/launch.py: a 2-process pretrain run
    loses worker 1 mid-epoch (fault injection, CSM_FAULT_STEP), the
    launcher tears the wedged survivor down, relaunches at nprocs=1
    (--elastic lost-host semantics) resuming from the newest checkpoint,
    and the shrunk world finishes the remaining epochs."""
    from cross_scale_mae_tpu.cli import launch
    from cross_scale_mae_tpu.utils.checkpoint import latest_step

    workdir = tmp_path / "work"
    workdir.mkdir()
    # Worker env: the launcher passes os.environ through to the gang.
    # (Platform selection must go through the CLI's --jax_platforms flag,
    # not the JAX_PLATFORMS env var — this image's sitecustomize pins the
    # jax_platforms CONFIG to 'axon,cpu' at import, which beats the env.)
    monkeypatch.setenv("XLA_FLAGS", "--xla_force_host_platform_device_count=4")
    # Kill rank 1 hard at global step 3 (epoch 1, after epoch 0's
    # checkpoint), first launch attempt only.
    monkeypatch.setenv("CSM_FAULT_STEP", "3")
    monkeypatch.setenv("CSM_FAULT_PROCESS", "1")
    monkeypatch.setenv("CSM_FAULT_ATTEMPT", "1")

    args = launch.get_args_parser().parse_args([
        "--nprocs", "2", "--elastic", "--min_procs", "1",
        "--max_restarts", "2", "--workdir", str(workdir),
        "--grace_s", "5",
        "--",
        sys.executable, "-m", "cross_scale_mae_tpu.cli.pretrain",
        "--model", "mae_vit_tiny_MsLd", "--dataset_type", "synthetic",
        "--synthetic_len", "64", "--input_size", "16", "--patch_size", "8",
        "--batch_size", "32", "--epochs", "5", "--warmup_epochs", "0",
        "--ckpt_interval", "1", "--output_dir", str(workdir / "out"),
        "--compute_dtype", "float32", "--log_interval", "1",
        "--jax_platforms", "cpu",
    ])
    res = launch.main(args)
    assert res["success"], res
    assert res["attempts"] == 2 and res["restarts"] == 1
    assert res["final_nprocs"] == 1  # shrunk by the lost "host"

    state = json.loads((workdir / "launcher" / "state.json").read_text())
    assert state["attempt"] == 2 and state["nprocs"] == 1
    # The relaunch was pointed at the discovered checkpoint...
    assert state["cmd"][-2] == "--resume"

    log1 = (workdir / "launcher" / "attempt1.worker1.log").read_text()
    assert "[fault-injection]" in log1
    log2 = (workdir / "launcher" / "attempt2.worker0.log").read_text()
    assert "resumed from" in log2  # ...and actually resumed (epoch 1)

    # epoch 0 ran twice (pre-fault + recompute after resume-at-epoch-1) but
    # the final optimizer step count is exactly the 5-epoch schedule:
    # 2 steps/epoch x 5 (global batch is world-size-invariant).
    ckpts = launch.find_latest_checkpoints(str(workdir))
    assert ckpts is not None
    assert latest_step(ckpts) == 10
