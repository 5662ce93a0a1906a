"""wandb sink + per-task custom metric axes.

The reference logs per-task rollout/success counters with wandb
`define_metric` custom step axes (`lb_online_trainer_v7.py:1314-1332`:
`explo/{tk}-cnt_explore_suc_vsR` plots against that task's
`explo/{tk}-cnt_vid_rollouts`, not the global step) and `wandb.log(metrics,
step=...)` (`:654`). wandb is absent in this environment, so these tests
drive `MetricsLogger` against a recording stub module.
"""

import json
import sys
import types

from v2a_tpu.train.metrics import MetricsLogger, per_task_metric_names

TASKS = ["put the red mug on the plate", "open the drawer"]


class _StubWandb(types.ModuleType):
    def __init__(self):
        super().__init__("wandb")
        self.init_calls = []
        self.log_calls = []
        self.define_calls = []

    def init(self, **kwargs):
        self.init_calls.append(kwargs)

    def log(self, metrics, step=None):
        self.log_calls.append((dict(metrics), step))

    def define_metric(self, name, step_metric=None):
        self.define_calls.append((name, step_metric))


def _with_stub(tmp_path, fn):
    stub = _StubWandb()
    saved = sys.modules.get("wandb")
    sys.modules["wandb"] = stub
    try:
        logger = MetricsLogger(
            str(tmp_path), use_wandb=True,
            wandb_kwargs={"project": "Video-to-Action-Release",
                          "name": "exp0"},
        )
        fn(logger, stub)
        logger.close()
    finally:
        if saved is None:
            del sys.modules["wandb"]
        else:
            sys.modules["wandb"] = saved
    return stub


def test_wandb_init_and_log_flow(tmp_path):
    def run(logger, stub):
        assert stub.init_calls == [
            {"project": "Video-to-Action-Release", "name": "exp0"}
        ]
        logger.log({"train/loss": 0.5, "train/num_steps_in_env": 12}, step=100)

    stub = _with_stub(tmp_path, run)
    assert stub.log_calls == [
        ({"train/loss": 0.5, "train/num_steps_in_env": 12}, 100)
    ]
    # the JSONL sink records the same metrics regardless of wandb
    records = [
        json.loads(line) for line in open(tmp_path / "metrics.jsonl")
    ]
    assert records[-1]["train/loss"] == 0.5
    assert records[-1]["step"] == 100


def test_per_task_custom_axes(tmp_path):
    """`init_wandb_metrics` semantics: each task's success counter gets the
    task's rollout counter as its step metric."""

    def run(logger, stub):
        logger.init_per_task_metrics(TASKS)

    stub = _with_stub(tmp_path, run)
    expected = []
    for tk in TASKS:
        roll, suc = per_task_metric_names(tk)
        assert roll == f"explo/{tk}-cnt_vid_rollouts"
        assert suc == f"explo/{tk}-cnt_explore_suc_vsR"
        expected += [(roll, None), (suc, roll)]
    assert stub.define_calls == expected
    # offline JSONL header mirrors the definitions
    records = [
        json.loads(line) for line in open(tmp_path / "metrics.jsonl")
    ]
    defs = [r for r in records if "_define_metric" in r]
    assert [d["_define_metric"] for d in defs] == [n for n, _ in expected]
    assert defs[1]["step_metric"] == per_task_metric_names(TASKS[0])[0]


def test_no_wandb_is_silent(tmp_path):
    """use_wandb=True without an importable wandb degrades to JSONL-only
    (the reference hard-requires wandb; the rebuild must not)."""
    saved = sys.modules.get("wandb")
    sys.modules["wandb"] = None  # makes `import wandb` raise
    try:
        logger = MetricsLogger(str(tmp_path), use_wandb=True)
        logger.init_per_task_metrics(TASKS)
        logger.log({"train/loss": 1.0}, step=1)
        logger.close()
    finally:
        if saved is None:
            del sys.modules["wandb"]
        else:
            sys.modules["wandb"] = saved
    records = [
        json.loads(line) for line in open(tmp_path / "metrics.jsonl")
    ]
    assert records[-1]["train/loss"] == 1.0
