"""scripts/train_video.py — the standalone AVDC-style video-training
entry (reference `goal_diffusion.py:762` Trainer capability): hermetic
tiny run, checkpoint/resume, mesh parsing."""

import json
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

import train_video  # noqa: E402

from v2a_tpu.data.h5_ingest import write_randsam_file  # noqa: E402


@pytest.fixture
def clip_h5(tmp_path):
    rs = np.random.RandomState(0)
    eps = {}
    for tk in ["task a", "task b"]:
        items = []
        for _ in range(2):
            T = 14
            imgs = rs.randint(0, 255, (T + 1, 16, 16, 3), np.uint8)
            acts = rs.uniform(-1, 1, (T, 7)).astype(np.float32)
            items.append((imgs, acts))
        eps[tk] = items
    path = str(tmp_path / "clips.hdf5")
    write_randsam_file(path, eps, read_only=False)
    return path


def test_parse_mesh():
    assert train_video.parse_mesh("") is None
    mesh = train_video.parse_mesh("dp=4,tp=2")
    assert mesh.axis_names == ("dp", "tp")
    assert mesh.shape["dp"] == 4 and mesh.shape["tp"] == 2


TINY = [
    "--image-size", "16", "--frames", "3", "--stride", "2",
    "--model-channels", "32", "--channel-mult", "1,2",
    "--num-res-blocks", "1", "--attention-resolutions", "8",
    "--timesteps", "8", "--text-dim", "32",
    "--batch-size", "2", "--log-freq", "1",
]


@pytest.mark.slow
def test_cli_trains_saves_and_resumes(clip_h5, tmp_path, capsys):
    wd = str(tmp_path / "wd")
    train_video.main([
        "--data", clip_h5, "--workdir", wd,
        "--n-steps", "2", "--save-freq", "2", "--sample-after", *TINY,
    ])
    out = capsys.readouterr().out
    header = json.loads(out.splitlines()[0])
    assert header["tasks"] == ["task a", "task b"]
    assert header["clips"] == 4 and header["params"] > 0
    assert os.path.exists(os.path.join(wd, "validation_videos.npy"))
    vids = np.load(os.path.join(wd, "validation_videos.npy"))
    assert vids.shape == (2, 3, 16, 16, 3)

    # resume picks the milestone back up and trains on
    train_video.main([
        "--data", clip_h5, "--workdir", wd, "--resume",
        "--n-steps", "4", "--save-freq", "4", *TINY,
    ])
    assert "resumed at step 2" in capsys.readouterr().out


@pytest.mark.slow
def test_cli_mesh_and_remat_flags(clip_h5, tmp_path):
    wd = str(tmp_path / "wdm")
    train_video.main([
        "--data", clip_h5, "--workdir", wd, "--tasks", "task a",
        "--mesh", "dp=2,tp=2", "--use-checkpoint",
        "--remat-policy", "levels", "--schedule-sampler",
        "loss-second-moment", "--n-steps", "1", "--save-freq", "10", *TINY,
    ])
    # a milestone checkpoint landed (model-<step> + meta-<step>.json)
    assert any(d.startswith("model-") for d in os.listdir(wd)), os.listdir(wd)


def test_bench_policy_parsing():
    """Regression: after the tfused refactor, 'levels'/'mxu' were silently
    remapped to 'blocks' — the bench timed the wrong program under the
    right label. parse_policy must honor every policy string."""
    import bench_video_train as bvt

    assert bvt.parse_policy("off") == (False, False, "off")
    assert bvt.parse_policy("blocks") == (False, True, "blocks")
    assert bvt.parse_policy("levels") == (False, True, "levels")
    assert bvt.parse_policy("mxu") == (False, True, "mxu")
    assert bvt.parse_policy("tfused") == (True, False, "off")
    assert bvt.parse_policy("tfused-blocks") == (True, True, "blocks")
