"""Guided-diffusion script surface: hermetic end-to-end CLI runs.

Covers the reference's `flowdiffusion/guided_diffusion/scripts/*` CLIs
(SURVEY §2.9 row "guided-diffusion script surface") at tiny shapes:
train 2 steps -> resume -> sample -> NLL, super-res train/sample, and
classifier train + classifier-guided sampling.
"""

import importlib.util
import os
import sys

import jax
import jax.numpy as jnp
import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
GUIDED_SCRIPTS = os.path.join(REPO, "scripts", "guided")

MODEL_FLAGS = [
    "--image_size", "16", "--num_channels", "8", "--num_res_blocks", "1",
    "--attention_resolutions", "8", "--num_head_channels", "4",
    "--diffusion_steps", "10", "--noise_schedule", "cosine",
]
TRAIN_FLAGS = [
    "--batch_size", "4", "--lr", "1e-4", "--log_interval", "1",
    "--save_interval", "0", "--max_steps", "2",
]


def _load_cli(name):
    if GUIDED_SCRIPTS not in sys.path:
        sys.path.insert(0, GUIDED_SCRIPTS)
    spec = importlib.util.spec_from_file_location(
        f"guided_cli_{name}", os.path.join(GUIDED_SCRIPTS, f"{name}.py"))
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def image_dir(tmp_path_factory):
    """8 tiny npy images, 2 classes from the filename prefix."""
    d = tmp_path_factory.mktemp("imgs")
    rng = np.random.default_rng(0)
    for i in range(8):
        cls = "cat" if i % 2 else "dog"
        arr = rng.integers(0, 255, (16, 16, 3), np.uint8)
        np.save(d / f"{cls}_{i}.npy", arr)
    return str(d)


def test_image_data_labels_and_determinism(image_dir):
    from v2a_tpu.guided.image_data import area_downsample, load_data

    it = load_data(data_dir=image_dir, batch_size=4, image_size=16,
                   class_cond=True, deterministic=True)
    x, kw = next(it)
    assert x.shape == (4, 16, 16, 3) and x.min() >= -1 and x.max() <= 1
    # sorted class names: cat=0, dog=1; sorted file order puts cats first
    assert kw["y"].tolist() == [0, 0, 0, 0]
    x_dogs, kw_dogs = next(it)
    assert kw_dogs["y"].tolist() == [1, 1, 1, 1]
    x2, _ = next(load_data(data_dir=image_dir, batch_size=4, image_size=16,
                           class_cond=True, deterministic=True))
    np.testing.assert_array_equal(x, x2)

    # area downsample == mean over 2x2 boxes
    big = np.arange(4 * 4 * 4 * 1, dtype=np.float64).reshape(4, 4, 4, 1)
    small = area_downsample(big, 2)
    np.testing.assert_allclose(
        small[0, 0, 0, 0], big[0, :2, :2, 0].mean())


def test_image_train_resume_and_sample(image_dir, tmp_path):
    out = str(tmp_path / "out")
    train = _load_cli("image_train")
    train.main(MODEL_FLAGS + TRAIN_FLAGS + [
        "--data_dir", image_dir, "--class_cond", "True",
        "--out_dir", out, "--ema_rate", "0.5,0.9",
    ])
    ckpt = os.path.join(out, "model000002.pkl")
    assert os.path.exists(ckpt)
    assert os.path.exists(os.path.join(out, "ema_0.5_000002.pkl"))

    # resume from the snapshot
    train.main(MODEL_FLAGS + TRAIN_FLAGS + [
        "--data_dir", image_dir, "--class_cond", "True",
        "--out_dir", out, "--resume_checkpoint", ckpt,
    ])

    sample = _load_cli("image_sample")
    sample.main(MODEL_FLAGS + [
        "--model_path", ckpt, "--class_cond", "True",
        "--num_samples", "4", "--batch_size", "4",
        "--timestep_respacing", "5", "--out_dir", out,
    ])
    path = os.path.join(out, "samples_4x16x16x3.npz")
    with np.load(path) as obj:
        arr, labels = obj["arr_0"], obj["arr_1"]
    assert arr.dtype == np.uint8 and arr.shape == (4, 16, 16, 3)
    assert labels.shape == (4,)


def test_image_train_microbatch_and_learn_sigma(image_dir, tmp_path):
    out = str(tmp_path / "out")
    train = _load_cli("image_train")
    train.main(MODEL_FLAGS + TRAIN_FLAGS + [
        "--data_dir", image_dir, "--out_dir", out,
        "--microbatch", "2", "--learn_sigma", "True",
        "--schedule_sampler", "loss-second-moment",
    ])
    assert os.path.exists(os.path.join(out, "model000002.pkl"))


def test_image_nll(image_dir, tmp_path, capsys):
    out = str(tmp_path / "out")
    nll = _load_cli("image_nll")
    nll.main(MODEL_FLAGS + [
        "--data_dir", image_dir, "--num_samples", "2", "--batch_size", "2",
        "--out_dir", out,
    ])
    assert "bpd=" in capsys.readouterr().out
    for term in ("vb", "mse", "xstart_mse"):
        path = os.path.join(out, f"{term}_terms.npz")
        with np.load(path) as obj:
            assert np.isfinite(obj["arr_0"]).all()


def test_super_res_train_and_sample(image_dir, tmp_path):
    out = str(tmp_path / "out")
    sr_flags = [
        "--large_size", "16", "--small_size", "8", "--num_channels", "8",
        "--num_res_blocks", "1", "--attention_resolutions", "8",
        "--num_head_channels", "4", "--diffusion_steps", "10", "--noise_schedule", "cosine",
    ]
    train = _load_cli("super_res_train")
    train.main(sr_flags + TRAIN_FLAGS + [
        "--data_dir", image_dir, "--out_dir", out,
    ])
    ckpt = os.path.join(out, "model000002.pkl")
    assert os.path.exists(ckpt)

    base = np.random.default_rng(0).integers(0, 255, (3, 8, 8, 3), np.uint8)
    base_path = str(tmp_path / "base.npz")
    np.savez(base_path, base)

    sample = _load_cli("super_res_sample")
    sample.main(sr_flags + [
        "--model_path", ckpt, "--base_samples", base_path,
        "--num_samples", "3", "--batch_size", "2",
        "--timestep_respacing", "5", "--out_dir", out,
    ])
    with np.load(os.path.join(out, "samples_3x16x16x3.npz")) as obj:
        assert obj["arr_0"].shape == (3, 16, 16, 3)


def test_classifier_train_and_guided_sample(image_dir, tmp_path):
    out = str(tmp_path / "out")
    cls_flags = [
        "--image_size", "16", "--classifier_width", "8",
        "--classifier_depth", "1", "--classifier_attention_resolutions", "8",
        "--diffusion_steps", "10", "--noise_schedule", "cosine",
    ]
    train = _load_cli("classifier_train")
    train.main(cls_flags + [
        "--data_dir", image_dir, "--batch_size", "4", "--log_interval", "1",
        "--save_interval", "0", "--max_steps", "2", "--out_dir", out,
    ])
    cls_ckpt = os.path.join(out, "classifier000002.pkl")
    assert os.path.exists(cls_ckpt)

    sample = _load_cli("classifier_sample")
    sample.main(cls_flags + [
        "--num_channels", "8", "--num_res_blocks", "1",
        "--attention_resolutions", "8", "--num_head_channels", "4",
        "--classifier_path", cls_ckpt, "--classifier_scale", "2.0",
        "--num_samples", "2", "--batch_size", "2",
        "--timestep_respacing", "5", "--out_dir", out, "--use_ddim", "True",
    ])
    with np.load(os.path.join(out, "samples_2x16x16x3.npz")) as obj:
        assert obj["arr_0"].shape == (2, 16, 16, 3)


def test_encoder_unet_pools():
    from v2a_tpu.models.image_unet import EncoderUNet

    x = jnp.zeros((2, 16, 16, 3))
    t = jnp.zeros((2,), jnp.int32)
    for pool in ("adaptive", "attention", "spatial"):
        net = EncoderUNet(model_channels=8, out_channels=5,
                          num_res_blocks=1, attention_resolutions=(),
                          channel_mult=(1, 2), pool=pool)
        params = net.init(jax.random.PRNGKey(0), x, t)
        logits = net.apply(params, x, t)
        assert logits.shape == (2, 5)
        assert np.isfinite(np.asarray(logits)).all()
