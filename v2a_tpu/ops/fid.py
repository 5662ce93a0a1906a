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
