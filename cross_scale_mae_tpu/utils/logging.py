"""Run logging: rank-0 stdout, append-only jsonl, TensorBoard, wandb.

The reference's four channels (SURVEY.md §5): rank-0 print monkeypatch
(``util/misc.py:217-231``), TB scalars at epoch_1000x granularity
(``engine_pretrain.py:80-86``), wandb (``main_pretrain.py:496-548``), and
``log.jsonl`` (``main_pretrain.py:631-634``). Same surface here behind one
``RunLogger``; TB/wandb engage only if importable.
"""

from __future__ import annotations

import datetime
import json
import os
from typing import Any, Optional


def rank0_print(*args, **kwargs):
    import jax

    if jax.process_index() == 0:
        now = datetime.datetime.now().strftime("[%H:%M:%S.%f")[:-3] + "]"
        print(now, *args, **kwargs, flush=True)


def epoch_1000x(epoch_fractional: float) -> int:
    """The reference's TB x-axis calibration (engine_pretrain.py:82-86)."""
    return int(epoch_fractional * 1000)


class RunLogger:
    def __init__(
        self,
        output_dir: Optional[str],
        use_tensorboard: bool = False,
        use_wandb: bool = False,
        wandb_project: str = "cross_scale_mae_tpu",
        run_name: Optional[str] = None,
        config: Optional[dict] = None,
        wandb_entity: Optional[str] = None,
        wandb_id: Optional[str] = None,
    ):
        import jax

        self.is_main = jax.process_index() == 0
        self.output_dir = output_dir
        self._jsonl = None
        self._tb = None
        self._wandb = None
        if not self.is_main:
            return
        if output_dir:
            os.makedirs(output_dir, exist_ok=True)
            self._jsonl = open(os.path.join(output_dir, "log.jsonl"), "a")
            if config:
                # Persist the resolved run config locally (the reference only
                # embeds args in checkpoints, util/misc.py:358-379; wandb
                # config alone is lost on offline runs).
                with open(os.path.join(output_dir, "config.json"), "w") as f:
                    json.dump(config, f, indent=2, default=str)
        if use_tensorboard and output_dir:
            try:
                from torch.utils.tensorboard import SummaryWriter

                self._tb = SummaryWriter(log_dir=os.path.join(output_dir, "tb"))
            except ImportError:
                rank0_print("tensorboard unavailable; skipping TB logging")
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                # --wandb_id resumes a prior run (main_pretrain.py:510-530).
                wandb.init(project=wandb_project, entity=wandb_entity,
                           name=run_name, config=config or {},
                           id=wandb_id,
                           resume="allow" if wandb_id else None)
            except ImportError:
                rank0_print("wandb unavailable; skipping wandb logging")

    def log_step(self, step_1000x: int, metrics: dict[str, Any]):
        if not self.is_main:
            return
        if self._tb is not None:
            for k, v in metrics.items():
                self._tb.add_scalar(k, float(v), step_1000x)
        if self._wandb is not None:
            self._wandb.log({**{k: float(v) for k, v in metrics.items()},
                             "step_1000x": step_1000x})

    def log_epoch(self, payload: dict[str, Any]):
        """Append one epoch record to log.jsonl (main_pretrain.py:631-634)."""
        if not self.is_main or self._jsonl is None:
            return
        self._jsonl.write(json.dumps(payload) + "\n")
        self._jsonl.flush()

    def close(self):
        if self._jsonl is not None:
            self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
        if self._wandb is not None:
            self._wandb.finish()


def auto_output_dir(base: str, **config: Any) -> str:
    """Config-encoding run dir with +N anti-clobber suffix
    (main_pretrain.py:450-493).

    Multi-host: rank 0 resolves the suffix and BROADCASTS the final path —
    each rank probing the (shared) filesystem independently races: rank 1
    sees rank 0's fresh dir and picks +1, the ranks then write checkpoints
    to different directories and the collective Orbax save deadlocks
    (found by tests/test_multiprocess.py)."""
    import jax

    parts = [f"{k}_{v}" for k, v in config.items() if v is not None]
    name = "-".join(parts) if parts else "run"
    path = os.path.join(base, name)
    if jax.process_index() == 0:
        if os.path.exists(path):
            i = 1
            while os.path.exists(f"{path}+{i}"):
                i += 1
            path = f"{path}+{i}"
        # Claim it immediately so the broadcast value stays valid.
        os.makedirs(path, exist_ok=True)
    if jax.process_count() > 1:
        path = _broadcast_str(path)
    return path


def _broadcast_str(s: str, max_len: int = 1024) -> str:
    """Rank-0 string broadcast over the coordination service."""
    import jax
    import numpy as np
    from jax.experimental import multihost_utils

    buf = np.zeros((max_len,), np.uint8)
    b = s.encode()
    assert len(b) <= max_len, f"path too long to broadcast: {s!r}"
    buf[: len(b)] = np.frombuffer(b, np.uint8)
    out = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return bytes(out).rstrip(b"\x00").decode()
