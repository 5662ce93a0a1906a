"""Config system: module loading, CLI overrides, snapshot round trip, and
the full entry-script path on the fake backend."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from v2a_tpu.config.experiment import (
    ExperimentConfig,
    apply_overrides,
    load_config_module,
    load_snapshot,
    parse_cli,
    save_snapshot,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
RELEASE_CFG = os.path.join(REPO, "v2a_tpu/config/libero/lb_tk8_65to72.py")
FAKE_CFG = os.path.join(REPO, "v2a_tpu/config/fake/fake_smoke.py")


def test_load_release_config_matches_reference_values():
    cfg = load_config_module(RELEASE_CFG)
    # spot-check against `config/libero/lb_tk8_65to72.py`
    assert cfg.dataset == "libero-8tk-65to72-v3"
    assert cfg.trainer.init_rand_steps == 10000
    assert cfg.trainer.n_train_steps == 200_000
    assert cfg.trainer.buf_sample_batch_size == 64
    assert cfg.policy.down_dims == (256, 512, 1024)
    assert cfg.video.channel_mult == (1, 2, 3, 4, 5)
    assert cfg.opt.lr == 1e-4 and cfg.opt.b1 == 0.95
    assert cfg.explore.act_down_val_range_per_tk[69] == (-0.99, -0.98)
    assert cfg.eval.n_seeds == 25 and cfg.eval.seed_start == 100
    assert cfg.config_fn == "lb_tk8_65to72"


def test_luotest_config_differs_only_in_init_rand_steps():
    rel = load_config_module(RELEASE_CFG)
    lt = load_config_module(
        os.path.join(REPO, "v2a_tpu/config/libero/lb_tk8_luotest.py")
    )
    assert lt.trainer.init_rand_steps == 100
    import dataclasses

    assert dataclasses.replace(
        lt.trainer, init_rand_steps=rel.trainer.init_rand_steps
    ) == rel.trainer


def test_cli_override_type_coercion():
    cfg = load_config_module(FAKE_CFG)
    out = apply_overrides(
        cfg,
        {
            "trainer.n_train_steps": "55",
            "seed": "7",
            "opt.lr": "3e-4",
            "trainer.enable_noExp": "false",
            "policy.down_dims": "(16, 32)",
        },
    )
    assert out.trainer.n_train_steps == 55
    assert out.seed == 7
    assert out.opt.lr == pytest.approx(3e-4)
    assert out.trainer.enable_noExp is False
    assert out.policy.down_dims == (16, 32)
    with pytest.raises(KeyError):
        apply_overrides(cfg, {"trainer.no_such_knob": "1"})


def test_parse_cli():
    path, over = parse_cli(
        ["--config", "a.py", "--trainer.save_freq", "5", "--seed", "2"]
    )
    assert path == "a.py"
    assert over == {"trainer.save_freq": "5", "seed": "2"}


def test_snapshot_round_trip(tmp_path):
    cfg = load_config_module(RELEASE_CFG)
    path = save_snapshot(cfg, str(tmp_path))
    assert os.path.basename(path) == "experiment_config.json"
    restored = load_snapshot(str(tmp_path))
    assert restored == cfg  # full dataclass equality incl. nested tuples
    # int keys of the grasp table survive the JSON round trip
    assert restored.explore.act_down_val_range_per_tk[65] == (-0.11, -0.10)


@pytest.mark.slow
def test_train_entry_script_fake_backend(tmp_path):
    """The real CLI surface: scripts/train.py on the hermetic config."""
    env = dict(
        os.environ,
        PYTHONPATH=REPO,
        JAX_PLATFORMS="cpu",
        PALLAS_AXON_POOL_IPS="",
    )
    proc = subprocess.run(
        [
            sys.executable, os.path.join(REPO, "scripts/train.py"),
            "--config", FAKE_CFG,
            "--logbase", str(tmp_path),
            "--trainer.n_train_steps", "8",
            "--trainer.video_explo_freq", "5",
            "--trainer.init_rand_steps", "2",
            "--trainer.save_freq", "4",
        ],
        capture_output=True, text=True, timeout=900, env=env,
        cwd=REPO,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert "smoke test loss" in proc.stdout
    assert "done at step 8" in proc.stdout
    # snapshot + checkpoint + metrics landed in the workdir
    workdirs = []
    for root, dirs, files in os.walk(tmp_path):
        if "experiment_config.json" in files:
            workdirs.append(root)
    assert len(workdirs) == 1
    files = set(os.listdir(workdirs[0]))
    assert any(f.startswith("model-") for f in files), files
    assert "metrics.jsonl" in files or any("metric" in f for f in files), files


def test_build_experiment_with_mesh_config(tmp_path):
    """mesh_axes/mesh_shape in the experiment config construct a real mesh
    and a sharded trainer through the production builder."""
    from v2a_tpu.config.experiment import ExperimentConfig
    from v2a_tpu.models.policy import PolicyConfig
    from v2a_tpu.train.build import build_experiment
    from v2a_tpu.train.trainer import TrainerConfig

    cfg = ExperimentConfig(
        dataset="fake-2tk-small-v0",
        env_backend="fake",
        logbase=str(tmp_path),
        mesh_axes=("dp", "tp"),
        mesh_shape=(2, 4),
        policy=PolicyConfig(
            image_size=(32, 32), down_dims=(32, 64), horizon=8,
            n_action_steps=4, num_train_timesteps=10,
            num_inference_steps=10, num_inference_steps_ddim=2,
        ),
        trainer=TrainerConfig(
            randsam_path="", min_len_uB=9, model_act_horizon=8,
            buf_sample_batch_size=8, n_train_steps=2,
        ),
    )
    trainer, policy, env_list, video_model = build_experiment(
        cfg, workdir=str(tmp_path / "wd"), with_video_model=False,
    )
    assert trainer.mesh is not None
    assert dict(trainer.mesh.shape) == {"dp": 2, "tp": 4}


def test_sample_video_cli_smoke(tmp_path):
    """scripts/sample_video.py --smoke: the standalone sampling CLI (the
    guided-diffusion image_sample surface at the video level) end-to-end."""
    import numpy as np

    from scripts.sample_video import main

    main(["--smoke", "1", "--n", "2", "--steps", "2",
          "--out", str(tmp_path), "--task", "pick up the bowl"])
    vids = np.load(tmp_path / "videos.npy")
    assert vids.shape[0] == 2 and vids.dtype == np.uint8
    assert vids.shape[-1] == 3
    assert (tmp_path / "video_0.png").exists()
