"""Fréchet-distance metrics and the offline-dataset base."""

import numpy as np
import pytest

from tests.test_convert import shim_module

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


def _load_ref_evaluator():
    """Import the reference evaluator with stubs for its TF/requests deps
    (only the numpy/scipy FIDStatistics math is exercised)."""
    import importlib
    import os
    import sys
    import types

    path = (
        "/root/reference/flowdiffusion/flowdiffusion/guided_diffusion/"
        "evaluations/evaluator.py"
    )
    if not os.path.exists(path):
        pytest.skip("reference checkout not available")
    for name in ("requests", "tqdm", "tqdm.auto"):
        if name not in sys.modules:
            mod = shim_module(name)
            if name == "tqdm.auto":
                mod.tqdm = lambda x, **k: x
            sys.modules[name] = mod
    if "tensorflow" not in sys.modules:
        tf = shim_module("tensorflow", package=True)
        compat = shim_module("tensorflow.compat", package=True)
        v1 = shim_module("tensorflow.compat.v1")
        tf.compat = compat
        compat.v1 = v1
        sys.modules["tensorflow"] = tf
        sys.modules["tensorflow.compat"] = compat
        sys.modules["tensorflow.compat.v1"] = v1
    spec = importlib.util.spec_from_file_location("gd_ref_evaluator", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_frechet_distance_golden_vs_reference_evaluator():
    """Our eigh-based PSD sqrt Fréchet distance vs the reference's scipy
    `FIDStatistics.frechet_distance` (`evaluator.py:67-115`)."""
    ev = _load_ref_evaluator()
    rs = np.random.RandomState(0)
    d = 16
    feats1 = rs.randn(200, d) @ rs.randn(d, d) * 0.3 + rs.randn(d)
    feats2 = rs.randn(180, d) @ rs.randn(d, d) * 0.4 + rs.randn(d) * 2

    from v2a_tpu.ops.fid import feature_stats, frechet_distance

    mu1, s1 = feature_stats(feats1)
    mu2, s2 = feature_stats(feats2)
    want = ev.FIDStatistics(mu1, s1).frechet_distance(
        ev.FIDStatistics(mu2, s2)
    )
    got = frechet_distance(mu1, s1, mu2, s2)
    np.testing.assert_allclose(got, want, rtol=1e-6)
    # identical stats -> ~0
    assert abs(frechet_distance(mu1, s1, mu1, s1)) < 1e-8


def test_fid_end_to_end_with_random_conv_extractor():
    """The shipped extractor makes `fid()` computable end-to-end: identical
    sets score ~0, disjoint distributions score clearly higher."""
    from v2a_tpu.ops.fid import fid, random_conv_features

    rs = np.random.RandomState(1)
    feats_fn = random_conv_features(seed=0, widths=(16, 32), feature_dim=64)
    real = rs.rand(64, 32, 32, 3).astype(np.float32)
    fake_same = real.copy()
    fake_shift = np.clip(real * 0.3 + 0.6, 0, 1)

    d_same = fid(real, fake_same, feats_fn, batch=32)
    d_shift = fid(real, fake_shift, feats_fn, batch=32)
    assert abs(d_same) < 1e-4
    assert d_shift > 10 * max(d_same, 1e-6)
    # deterministic across constructions
    feats_fn2 = random_conv_features(seed=0, widths=(16, 32), feature_dim=64)
    np.testing.assert_allclose(
        np.asarray(feats_fn(real[:4])), np.asarray(feats_fn2(real[:4])),
        rtol=1e-6,
    )


def test_precision_recall_manifold_semantics():
    from v2a_tpu.ops.fid import precision_recall

    rs = np.random.RandomState(2)
    ref = rs.randn(300, 8)
    # same distribution: both precision and recall high
    p, r = precision_recall(ref, rs.randn(300, 8))
    assert p > 0.75 and r > 0.75
    # samples collapsed onto one ref point: precision high, recall low
    collapsed = ref[:1] + 0.01 * rs.randn(300, 8)
    p2, r2 = precision_recall(ref, collapsed)
    assert p2 > 0.9
    assert r2 < 0.3
