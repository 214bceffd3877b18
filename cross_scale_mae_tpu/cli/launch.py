"""Elastic multi-process launcher: supervise, restart, shrink.

The reference's only launcher is ``torchrun --nproc_per_node=8``
(``train_distributed.sh:34``) and its failure story is "a rank failure
kills the job; recovery = manual restart with --resume" (SURVEY.md §5).
This CLI is the TPU-native supervisor that closes that gap:

* spawns ``--nprocs`` worker processes of ANY of this package's training
  CLIs, wiring the coordination-service flags (``--coordinator_address /
  --num_processes / --process_id``) the way torchrun wires ``RANK`` /
  ``WORLD_SIZE`` env vars;
* on a worker failure it tears the survivors down (SIGTERM first — the
  training CLIs checkpoint-and-exit on SIGTERM; SIGKILL after
  ``--grace_s`` for workers wedged in a collective waiting on the dead
  peer), then relaunches the whole gang resuming from the NEWEST
  checkpoint found under ``--workdir``;
* with ``--elastic`` each failed worker is treated as a lost host and the
  relaunch shrinks the world size by that many (never below
  ``--min_procs``) — topology-change resume is a supported checkpoint
  path (tests/test_parallel.py, tests/test_multiprocess.py), so training
  continues on the surviving capacity instead of waiting for a repair.

State is observable: ``<workdir>/launcher/state.json`` records the
current attempt, world size, coordinator address, and worker pids
(atomically rewritten per attempt); per-worker stdout/stderr land in
``<workdir>/launcher/attempt{K}.worker{I}.log``.

Usage (everything after ``--`` is the worker command; the launcher
appends the coordination flags and, on restarts, ``--resume <ckpts>``):

    python -m cross_scale_mae_tpu.cli.launch \
        --nprocs 2 --elastic --min_procs 1 --workdir runs/exp1 -- \
        python -m cross_scale_mae_tpu.cli.pretrain \
            --model mae_vit_base_MsLdCeCd --output_dir runs/exp1 ...
"""

from __future__ import annotations

import argparse
import json
import os
import signal
import socket
import subprocess
import sys
import time


def get_args_parser():
    p = argparse.ArgumentParser(
        "Cross-Scale MAE elastic launcher (TPU)", add_help=False)
    p.add_argument("--nprocs", type=int, required=True,
                   help="initial world size (one process per host/slice)")
    p.add_argument("--min_procs", type=int, default=1,
                   help="--elastic never shrinks the world below this")
    p.add_argument("--elastic", action="store_true",
                   help="on failure, relaunch with the world shrunk by the "
                        "number of failed workers (lost-host semantics) "
                        "instead of at the same size")
    p.add_argument("--max_restarts", type=int, default=3,
                   help="give up after this many relaunches")
    p.add_argument("--workdir", required=True,
                   help="where launcher state/logs live AND where restarts "
                        "look for the newest */checkpoints to resume from "
                        "(point the worker's --output_dir inside it)")
    p.add_argument("--grace_s", type=float, default=60.0,
                   help="SIGTERM->SIGKILL window for survivors of a failure "
                        "(they may be wedged in a collective with the dead "
                        "peer until the ~100 s heartbeat timeout)")
    p.add_argument("--coordinator_host", default="127.0.0.1",
                   help="host part of the coordination-service address the "
                        "workers are pointed at")
    p.add_argument("--resume_flag", default="--resume",
                   help="flag used to inject the discovered checkpoint dir "
                        "on restarts ('none' disables auto-resume)")
    p.add_argument("--poll_s", type=float, default=0.2)
    p.add_argument("cmd", nargs=argparse.REMAINDER,
                   help="worker command (prefix with --)")
    return p


def _free_port(host: str) -> int:
    with socket.socket() as sock:
        sock.bind((host, 0))
        return sock.getsockname()[1]


def _write_state(workdir: str, state: dict) -> None:
    """Atomic rewrite so observers never read a torn file."""
    path = os.path.join(workdir, "launcher", "state.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f, indent=1)
    os.replace(tmp, path)


def find_latest_checkpoints(workdir: str):
    """Newest ``*/checkpoints`` dir (by step, then mtime) under workdir.

    Training runs place checkpoints at ``<output_dir>/<run_name>/
    checkpoints`` (cli/pretrain.py); after a relaunch the +N anti-clobber
    suffix means each attempt writes to a FRESH run dir, so "resume from
    the newest step anywhere under the workdir" is the correct recovery
    rule across attempts.
    """
    from cross_scale_mae_tpu.utils.checkpoint import latest_step

    best = None  # (step, mtime, path)
    for root, dirs, _files in os.walk(workdir):
        if "launcher" in dirs:
            dirs.remove("launcher")
        for d in list(dirs):
            if d != "checkpoints":
                continue
            path = os.path.join(root, d)
            try:
                step = latest_step(path)
            except Exception:
                step = None
            if step is None:
                continue
            key = (step, os.path.getmtime(path))
            if best is None or key > best[:2]:
                best = (step, key[1], path)
            dirs.remove(d)  # no checkpoints nested under checkpoints
    return None if best is None else best[2]


def _spawn(cmd, nprocs, coordinator, attempt, logdir):
    procs = {}
    for i in range(nprocs):
        log = open(os.path.join(
            logdir, f"attempt{attempt}.worker{i}.log"), "w")
        env = dict(os.environ,
                   CSM_LAUNCH_ATTEMPT=str(attempt), CSM_WORKER_ID=str(i))
        full = list(cmd) + [
            "--coordinator_address", coordinator,
            "--num_processes", str(nprocs),
            "--process_id", str(i),
        ]
        procs[i] = (subprocess.Popen(
            full, stdout=log, stderr=subprocess.STDOUT, env=env), log)
    return procs


def main(args) -> dict:
    cmd = list(args.cmd)
    if cmd and cmd[0] == "--":
        cmd = cmd[1:]
    if not cmd:
        raise SystemExit("no worker command given (put it after --)")
    if args.min_procs < 1 or args.nprocs < args.min_procs:
        raise SystemExit("need nprocs >= min_procs >= 1")

    logdir = os.path.join(args.workdir, "launcher")
    os.makedirs(logdir, exist_ok=True)

    # The launcher itself must die gracefully: forward SIGTERM/SIGINT to
    # the gang (workers checkpoint-and-exit) and report.
    gang: dict = {}
    shutdown = {"flag": False}

    def _forward(signum, _frm):
        shutdown["flag"] = True
        for proc, _log in gang.values():
            if proc.poll() is None:
                proc.send_signal(signal.SIGTERM)

    prev = {}
    for sig in (signal.SIGTERM, signal.SIGINT):
        try:
            prev[sig] = signal.signal(sig, _forward)
        except ValueError:
            pass  # not in main thread (tests call main() directly)

    nprocs = args.nprocs
    attempt = 0
    restarts = 0
    try:
        while True:
            attempt += 1
            coordinator = (f"{args.coordinator_host}:"
                           f"{_free_port(args.coordinator_host)}")
            attempt_cmd = list(cmd)
            if attempt > 1 and args.resume_flag != "none":
                ckpts = find_latest_checkpoints(args.workdir)
                if ckpts is not None:
                    # Appended AFTER the user command: argparse last-wins,
                    # so this overrides any user-supplied resume source.
                    attempt_cmd += [args.resume_flag, ckpts]
            gang.clear()
            gang.update(_spawn(attempt_cmd, nprocs, coordinator, attempt,
                               logdir))
            _write_state(args.workdir, {
                "attempt": attempt, "nprocs": nprocs,
                "coordinator": coordinator,
                "pids": {str(i): p.pid for i, (p, _) in gang.items()},
                "cmd": attempt_cmd,
            })

            rcs: dict[int, int] = {}
            failed: set[int] = set()
            teardown_deadline = None
            while gang:
                time.sleep(args.poll_s)
                for i in list(gang):
                    proc, log = gang[i]
                    rc = proc.poll()
                    if rc is None:
                        continue
                    log.close()
                    del gang[i]
                    rcs[i] = rc
                    # Exits after WE started tearing down (or during a
                    # launcher shutdown) are consequences, not causes.
                    if rc != 0 and teardown_deadline is None \
                            and not shutdown["flag"]:
                        failed.add(i)
                if failed and gang and teardown_deadline is None:
                    for proc, _log in gang.values():
                        proc.send_signal(signal.SIGTERM)
                    teardown_deadline = time.monotonic() + args.grace_s
                if teardown_deadline is not None and gang \
                        and time.monotonic() > teardown_deadline:
                    for proc, _log in gang.values():
                        proc.kill()
                    teardown_deadline = float("inf")  # kill once

            if shutdown["flag"]:
                return {"success": False, "stopped": True,
                        "attempts": attempt, "final_nprocs": nprocs}
            if not failed and all(rc == 0 for rc in rcs.values()):
                return {"success": True, "attempts": attempt,
                        "final_nprocs": nprocs, "restarts": restarts}

            restarts += 1
            if restarts > args.max_restarts:
                raise SystemExit(
                    f"giving up after {args.max_restarts} restarts "
                    f"(failed workers {sorted(failed)}, rcs {rcs})")
            if args.elastic:
                nprocs = max(args.min_procs, nprocs - max(1, len(failed)))
            print(f"[launch] attempt {attempt} failed "
                  f"(workers {sorted(failed)}, rcs {rcs}); relaunching "
                  f"with nprocs={nprocs}", flush=True)
    finally:
        for proc, log in gang.values():
            if proc.poll() is None:
                proc.kill()
            log.close()
        for sig, h in prev.items():
            signal.signal(sig, h)


if __name__ == "__main__":
    res = main(get_args_parser().parse_args())
    sys.exit(0 if res.get("success") else 1)
