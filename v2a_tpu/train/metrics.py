"""Metrics logging: stdout + JSONL + optional TensorBoard.

Capability-parity with the reference's wandb setup
(`scripts/train_libero_dp.py:152-161`, `lb_online_trainer_v7.py:630-655,
1314-1332`): scalar train metrics, buffer lengths, env-step counters, and
per-task rollout/success counters. wandb is not available in this
environment, so the primary sink is an append-only `metrics.jsonl` (easy to
tail/plot) with an optional tensorboardX writer; a wandb sink slots in
behind the same interface when present.
"""

from __future__ import annotations

import json
import os
import time
from typing import Dict, Optional


def per_task_metric_names(task: str):
    """The reference's per-task wandb keys (`make_wandb_dict_per_tk`,
    `lb_online_trainer_v7.py:1314-1323`): (rollout counter, success-vs-
    rollouts counter)."""
    return (
        f"explo/{task}-cnt_vid_rollouts",
        f"explo/{task}-cnt_explore_suc_vsR",
    )


class MetricsLogger:
    def __init__(self, workdir: str, use_tensorboard: bool = False,
                 use_wandb: bool = False, wandb_kwargs: Optional[dict] = None):
        os.makedirs(workdir, exist_ok=True)
        self.path = os.path.join(workdir, "metrics.jsonl")
        self._file = open(self.path, "a", buffering=1)
        self._tb = None
        self._wandb = None
        if use_tensorboard:
            try:
                from tensorboardX import SummaryWriter

                self._tb = SummaryWriter(os.path.join(workdir, "tb"))
            except Exception:
                self._tb = None
        if use_wandb:
            try:
                import wandb

                self._wandb = wandb
                wandb.init(**(wandb_kwargs or {}))
            except Exception:
                self._wandb = None

    def define_metric(self, name: str, step_metric: Optional[str] = None):
        """Custom metric axes (`lb_online_trainer_v7.py:1326-1332`
        `init_wandb_metrics`): the per-task success counters plot against
        that task's rollout counter rather than the global step. Forwards
        to `wandb.define_metric` when the wandb sink is live; recorded in
        the JSONL header either way so offline plotting can honor it."""
        record = {"_define_metric": name}
        if step_metric is not None:
            record["step_metric"] = step_metric
        self._file.write(json.dumps(record) + "\n")
        if self._wandb is not None:
            if step_metric is not None:
                self._wandb.define_metric(name, step_metric=step_metric)
            else:
                self._wandb.define_metric(name)

    def init_per_task_metrics(self, task_list):
        """Reference `init_wandb_metrics`: per task, `cnt_vid_rollouts` is
        itself an axis and `cnt_explore_suc_vsR` plots against it."""
        for tk in task_list:
            roll, suc = per_task_metric_names(tk)
            self.define_metric(roll)
            self.define_metric(suc, step_metric=roll)

    def log(self, metrics: Dict[str, float], step: int):
        record = {"step": int(step), "time": time.time()}
        for k, v in metrics.items():
            try:
                record[k] = float(v)
            except (TypeError, ValueError):
                record[k] = v
        self._file.write(json.dumps(record) + "\n")
        if self._tb is not None:
            for k, v in metrics.items():
                try:
                    self._tb.add_scalar(k, float(v), step)
                except (TypeError, ValueError):
                    pass
        if self._wandb is not None:
            self._wandb.log(metrics, step=step)

    def close(self):
        self._file.close()
        if self._tb is not None:
            self._tb.close()


class Timer:
    """Wall-clock delta timer (`diffuser/utils/luo_utils.py:37-46`)."""

    def __init__(self):
        self._start = time.time()

    def __call__(self, reset: bool = True) -> float:
        now = time.time()
        diff = now - self._start
        if reset:
            self._start = now
        return diff
