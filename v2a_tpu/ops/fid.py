"""Fréchet distance (FID-style) sample-quality metrics in JAX/numpy.

Capability counterpart of the vendored guided-diffusion evaluator
(`guided_diffusion/evaluations/evaluator.py:1-653`, TF-v1 Inception FID /
sFID / IS / precision / recall — unused by the Libero pipeline, SURVEY
§2.9). This implementation is feature-extractor agnostic: pass any
`features_fn(images01) -> (N, D)` (e.g. the policy's ResNet18 trunk or an
Inception port) and compare feature distributions with the standard
Fréchet distance; `inception_score`-style entropy metrics work from any
classifier logits.
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import numpy as np


def feature_stats(feats: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    feats = np.asarray(feats, np.float64)
    mu = feats.mean(axis=0)
    sigma = np.cov(feats, rowvar=False)
    return mu, np.atleast_2d(sigma)


def _sqrtm_psd(mat: np.ndarray) -> np.ndarray:
    """Matrix square root of a (near-)PSD symmetric matrix via eigh."""
    vals, vecs = np.linalg.eigh((mat + mat.T) / 2.0)
    vals = np.clip(vals, 0.0, None)
    return (vecs * np.sqrt(vals)) @ vecs.T


def frechet_distance(
    mu1: np.ndarray, sigma1: np.ndarray, mu2: np.ndarray, sigma2: np.ndarray
) -> float:
    """FID = |mu1-mu2|^2 + Tr(s1 + s2 - 2 (s1 s2)^(1/2)); the cross term is
    computed as sqrtm(s1)^... using the symmetric-product identity so only
    PSD square roots are needed."""
    diff = mu1 - mu2
    s1_half = _sqrtm_psd(sigma1)
    cross = _sqrtm_psd(s1_half @ sigma2 @ s1_half)
    return float(diff @ diff + np.trace(sigma1 + sigma2 - 2.0 * cross))


def fid(
    real_images01: np.ndarray,
    fake_images01: np.ndarray,
    features_fn: Callable[[np.ndarray], np.ndarray],
    batch: int = 64,
) -> float:
    def extract(imgs):
        outs = []
        for i in range(0, len(imgs), batch):
            outs.append(np.asarray(features_fn(imgs[i : i + batch])))
        return np.concatenate(outs)

    mu1, s1 = feature_stats(extract(real_images01))
    mu2, s2 = feature_stats(extract(fake_images01))
    return frechet_distance(mu1, s1, mu2, s2)


def inception_score(
    logits: np.ndarray, splits: int = 10, eps: float = 1e-12
) -> Tuple[float, float]:
    """IS = exp(E_x KL(p(y|x) || p(y))) over classifier logits."""
    logits = np.asarray(logits, np.float64)
    probs = np.exp(logits - logits.max(axis=1, keepdims=True))
    probs /= probs.sum(axis=1, keepdims=True)
    scores = []
    for part in np.array_split(probs, splits):
        marginal = part.mean(axis=0, keepdims=True)
        kl = (part * (np.log(part + eps) - np.log(marginal + eps))).sum(axis=1)
        scores.append(np.exp(kl.mean()))
    return float(np.mean(scores)), float(np.std(scores))


def pairwise_sq_distances(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """Squared L2 distances, the reference `DistanceBlock` semantics
    (`evaluator.py:330-360`, TF `_batch_pairwise_distances`)."""
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    d = (
        (a * a).sum(1)[:, None]
        - 2.0 * a @ b.T
        + (b * b).sum(1)[None, :]
    )
    return np.maximum(d, 0.0)


def manifold_radii(feats: np.ndarray, nhood_size: int = 3) -> np.ndarray:
    """Radius of each point's manifold hypersphere = squared distance to its
    k-th nearest neighbor (`ManifoldEstimator.manifold_radii`
    `evaluator.py:249-281`; self-distance occupies rank 0)."""
    d = pairwise_sq_distances(feats, feats)
    part = np.partition(d, nhood_size, axis=1)
    return part[:, nhood_size]


def precision_recall(
    ref_feats: np.ndarray, sample_feats: np.ndarray, nhood_size: int = 3
) -> Tuple[float, float]:
    """Improved precision/recall (`compute_prec_recall` + `evaluate_pr`
    `evaluator.py:194-202,326-345`): precision = fraction of samples inside
    some reference hypersphere, recall = fraction of references inside some
    sample hypersphere."""
    radii_ref = manifold_radii(ref_feats, nhood_size)
    radii_sample = manifold_radii(sample_feats, nhood_size)
    d = pairwise_sq_distances(sample_feats, ref_feats)
    precision = float(np.mean(np.any(d <= radii_ref[None, :], axis=1)))
    recall = float(np.mean(np.any(d.T <= radii_sample[None, :], axis=1)))
    return precision, recall


# -- concrete feature extractor ----------------------------------------------


def random_conv_features(
    seed: int = 0,
    widths: Tuple[int, ...] = (64, 128, 256, 512),
    feature_dim: int = 768,
    dtype=None,
):
    """Deterministic random-projection conv feature extractor.

    The reference's evaluator uses the TF-v1 Inception pb graph downloaded
    at runtime (`evaluator.py:20-24`) — unavailable here (no network, no
    torchvision). This is the documented substitute: a fixed-seed He-init
    conv trunk (stride-2 stages, ReLU, global average pool, random linear
    head). Random conv features give a valid, reproducible Fréchet metric
    for *relative* comparisons of image distributions; numbers are NOT
    comparable to ImageNet-Inception FID. For Inception-calibrated FID pass
    converted weights through `fid(..., features_fn=...)` instead.

    Returns `features_fn(images01_nhwc_uint8_or_float) -> (N, feature_dim)`.
    """
    import jax
    import jax.numpy as jnp

    dtype = dtype or jnp.float32
    key = jax.random.PRNGKey(seed)
    params = []
    cin = 3
    for w in widths:
        key, k1 = jax.random.split(key)
        fan_in = 3 * 3 * cin
        kernel = jax.random.normal(k1, (3, 3, cin, w), dtype) * np.sqrt(
            2.0 / fan_in
        )
        params.append(kernel)
        cin = w
    key, k2 = jax.random.split(key)
    head = jax.random.normal(k2, (cin, feature_dim), dtype) * np.sqrt(
        1.0 / cin
    )

    @jax.jit
    def features_fn(images):
        x = jnp.asarray(images)
        if x.dtype == jnp.uint8:
            x = x.astype(dtype) / 255.0
        x = x.astype(dtype) * 2.0 - 1.0
        for kernel in params:
            x = jax.lax.conv_general_dilated(
                x, kernel, (2, 2), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            x = jax.nn.relu(x)
        x = x.mean(axis=(1, 2))
        return x @ head

    return features_fn
