"""Checkpoint/resume via Orbax + JSON config snapshot.

Logical contents mirror the reference's `model-{milestone}.pt`
(`lb_online_trainer_v7.py:367-407`): step, env-step count, model params,
optimizer state, EMA params, rollout counters, and a version tag. Milestone
bucketing keeps the same `step // label_freq * label_freq` labels and
`n_saves` retention. The train->eval hyperparameter contract — the pickled
`Config` objects of `diffuser/utils/config.py:18-75` — becomes a plain JSON
snapshot (`config_snapshot.json`) written at experiment start and reread by
the evaluator.

There is no GradScaler state: bf16 training needs no loss scaling.
"""

from __future__ import annotations

import dataclasses
import json
import os
import re
from typing import Any, Dict, List, Optional

import jax
import numpy as np
import orbax.checkpoint as ocp

CKPT_PREFIX = "model-"
VERSION = 1


def _ckpt_dir(workdir: str, label: int) -> str:
    return os.path.join(os.path.abspath(workdir), f"{CKPT_PREFIX}{label}")


def available_labels(workdir: str) -> List[int]:
    if not os.path.isdir(workdir):
        return []
    labels = []
    for name in os.listdir(workdir):
        m = re.fullmatch(rf"{CKPT_PREFIX}(\d+)", name)
        if m:
            labels.append(int(m.group(1)))
    return sorted(labels)


def latest_label(workdir: str) -> Optional[int]:
    """`get_latest_epoch` counterpart (`diffuser/utils/serialization.py:
    25-34`)."""
    labels = available_labels(workdir)
    return labels[-1] if labels else None


def save_checkpoint(
    workdir: str,
    label: int,
    state: Any,
    extra: Optional[Dict[str, Any]] = None,
    n_saves: int = 5,
):
    """Save TrainState + host-side counters; prune to the newest `n_saves`
    labels (`config/libero/lb_tk8_65to72.py:155-158`)."""
    path = _ckpt_dir(workdir, label)
    ckptr = ocp.StandardCheckpointer()
    if os.path.exists(path):
        # same-label overwrite (milestone bucketing rewrites a bucket)
        import shutil

        shutil.rmtree(path)
    ckptr.save(path, jax.device_get(state))
    ckptr.wait_until_finished()
    meta = {"version": VERSION, "label": int(label)}
    meta.update(extra or {})
    with open(os.path.join(workdir, f"meta-{label}.json"), "w") as f:
        json.dump(_jsonify(meta), f, indent=1)

    for old in available_labels(workdir)[:-n_saves]:
        import shutil

        shutil.rmtree(_ckpt_dir(workdir, old), ignore_errors=True)
        try:
            os.remove(os.path.join(workdir, f"meta-{old}.json"))
        except FileNotFoundError:
            pass


def restore_checkpoint(workdir: str, target: Any, label: Optional[int] = None):
    """Restore (state, extra). `target` is a TrainState pytree template with
    correct shapes/dtypes."""
    if label is None:
        label = latest_label(workdir)
        if label is None:
            raise FileNotFoundError(f"no checkpoints under {workdir}")
    ckptr = ocp.StandardCheckpointer()
    state = ckptr.restore(_ckpt_dir(workdir, label), target)
    meta_path = os.path.join(workdir, f"meta-{label}.json")
    extra: Dict[str, Any] = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            extra = json.load(f)
    return state, extra


def _jsonify(obj):
    if isinstance(obj, dict):
        return {k: _jsonify(v) for k, v in obj.items()}
    if isinstance(obj, (list, tuple)):
        return [_jsonify(v) for v in obj]
    if isinstance(obj, (np.integer,)):
        return int(obj)
    if isinstance(obj, (np.floating,)):
        return float(obj)
    if dataclasses.is_dataclass(obj) and not isinstance(obj, type):
        return _jsonify(dataclasses.asdict(obj))
    return obj


def save_config_snapshot(workdir: str, config: Any, name: str = "config_snapshot.json"):
    os.makedirs(workdir, exist_ok=True)
    with open(os.path.join(workdir, name), "w") as f:
        json.dump(_jsonify(config), f, indent=1, default=str)


def load_config_snapshot(workdir: str, name: str = "config_snapshot.json") -> dict:
    with open(os.path.join(workdir, name)) as f:
        return json.load(f)
