"""Fréchet-distance metrics and the offline-dataset base."""

import numpy as np
import pytest

from v2a_tpu.data.h5_ingest import write_randsam_file
from v2a_tpu.envs.offline import OfflineDataset
from v2a_tpu.ops.fid import (
    feature_stats,
    fid,
    frechet_distance,
    inception_score,
)


def test_frechet_distance_zero_for_identical():
    rs = np.random.RandomState(0)
    feats = rs.randn(500, 8)
    mu, sigma = feature_stats(feats)
    assert frechet_distance(mu, sigma, mu, sigma) < 1e-8


def test_frechet_distance_grows_with_mean_shift():
    rs = np.random.RandomState(0)
    a = rs.randn(2000, 4)
    d_small = frechet_distance(*feature_stats(a), *feature_stats(a + 0.1))
    d_big = frechet_distance(*feature_stats(a), *feature_stats(a + 2.0))
    # analytic: FID for pure mean shift == |shift|^2 * dim
    assert d_small < d_big
    assert abs(d_big - 4.0 * 4) < 0.5


def test_fid_pipeline_with_feature_fn():
    rs = np.random.RandomState(1)
    real = rs.rand(64, 8, 8, 3).astype(np.float32)
    fake_same = real + rs.randn(*real.shape).astype(np.float32) * 0.01
    fake_diff = rs.rand(64, 8, 8, 3).astype(np.float32) * 0.2

    def feats(imgs):
        return imgs.reshape(len(imgs), -1)[:, :16]

    assert fid(real, fake_same, feats) < fid(real, fake_diff, feats)


def test_inception_score_bounds():
    rs = np.random.RandomState(0)
    # confident, diverse classifier -> high IS; uniform -> IS ~= 1
    n, k = 500, 10
    confident = np.full((n, k), -10.0)
    confident[np.arange(n), np.arange(n) % k] = 10.0
    uniform = np.zeros((n, k))
    is_conf, _ = inception_score(confident, splits=5)
    is_unif, _ = inception_score(uniform, splits=5)
    assert is_conf > 5.0
    assert abs(is_unif - 1.0) < 0.05


def test_offline_dataset_roundtrip(tmp_path):
    rs = np.random.RandomState(0)
    eps = {
        "task x": [
            (
                rs.randint(0, 255, (11, 8, 8, 3), np.uint8),
                rs.rand(10, 7).astype(np.float32),
            )
        ]
    }
    path = str(tmp_path / "d.hdf5")
    write_randsam_file(path, eps, read_only=False)
    ds = OfflineDataset(h5path=path)
    data = ds.get_dataset()
    assert set(data) == {"task x"}
    assert data["task x"]["observations"][0].shape == (11, 8, 8, 3)
    assert data["task x"]["actions"][0].shape == (10, 7)
    with pytest.raises(KeyError):
        ds.get_dataset(tasks=["nope"])
    with pytest.raises(FileNotFoundError):
        OfflineDataset(h5path=str(tmp_path / "missing.hdf5"))
