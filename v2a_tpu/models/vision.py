"""Vision encoder for the diffusion policy (Flax).

Re-design of the robomimic-derived stack the reference uses:
`ResNet18Conv` (fc/pool stripped) -> `SpatialSoftmax` (32 keypoints) ->
flatten -> Linear(64), duplicated per observation key and concatenated
(`diffuser/diffusion_policy/common/vision_nets.py:9-177`,
`common/base_nets.py:153-260`,
`model/multi_image_obs_encoder.py:11-212`).

TPU-first choices:
- NHWC layout throughout (XLA:TPU's native conv layout),
- BatchNorm is replaced by GroupNorm(features // 16) from the start — the
  reference performs this surgery post-hoc
  (`multi_image_obs_encoder.py:66-77`); here it is simply the norm layer,
- GroupNorm statistics in float32, conv compute in a configurable dtype
  (bf16 on TPU).
"""

from __future__ import annotations

from typing import Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn


class BasicBlock(nn.Module):
    """ResNet-v1 basic block with GroupNorm."""

    features: int
    strides: int = 1
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        residual = x
        y = nn.Conv(
            self.features, (3, 3), strides=(self.strides, self.strides),
            padding=1, use_bias=False, dtype=self.dtype, name="conv1",
        )(x)
        y = nn.GroupNorm(
            num_groups=self.features // 16, epsilon=1e-5, dtype=jnp.float32, name="norm1"
        )(y.astype(jnp.float32)).astype(self.dtype)
        y = nn.relu(y)
        y = nn.Conv(
            self.features, (3, 3), padding=1, use_bias=False,
            dtype=self.dtype, name="conv2",
        )(y)
        y = nn.GroupNorm(
            num_groups=self.features // 16, epsilon=1e-5, dtype=jnp.float32, name="norm2"
        )(y.astype(jnp.float32)).astype(self.dtype)
        if residual.shape != y.shape:
            residual = nn.Conv(
                self.features, (1, 1), strides=(self.strides, self.strides),
                use_bias=False, dtype=self.dtype, name="downsample_conv",
            )(residual)
            residual = nn.GroupNorm(
                num_groups=self.features // 16, epsilon=1e-5, dtype=jnp.float32,
                name="downsample_norm",
            )(residual.astype(jnp.float32)).astype(self.dtype)
        return nn.relu(y + residual)


class ResNet18Conv(nn.Module):
    """ResNet-18 trunk without avgpool/fc (`vision_nets.py:9-63`): output is
    the (B, H/32, W/32, 512) feature map."""

    dtype: jnp.dtype = jnp.float32
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    stage_features: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = nn.Conv(
            64, (7, 7), strides=(2, 2), padding=3, use_bias=False,
            dtype=self.dtype, name="conv1",
        )(x)
        x = nn.GroupNorm(epsilon=1e-5, num_groups=64 // 16, dtype=jnp.float32, name="norm1")(
            x.astype(jnp.float32)
        ).astype(self.dtype)
        x = nn.relu(x)
        import os

        if x.dtype == jnp.bfloat16 and os.environ.get("V2A_PACKED_POOL") == "1":
            # argmax-packed pool (ops/pool.py): measured DEAD on-chip —
            # 51.4 vs 76.7 steps/s (PERF.md round 3). The select-and-scatter
            # it replaces costs 0.56 ms, but the int32 reduce_window
            # forward + 4-term compare backward cost far more. Kept as an
            # equivalence-tested experiment flag only.
            from v2a_tpu.ops.pool import max_pool_3x3s2

            x = max_pool_3x3s2(x)
        elif os.environ.get("V2A_POOL_MASK_BWD") == "1":
            # hardware-path forward + all-ties compare backward
            # (ops/pool.py): replaces the 2 x 0.28 ms select-and-scatter.
            # DEVIATION: gradient flows to every tied max, not the first —
            # experiment flag only (see pool.py)
            from v2a_tpu.ops.pool import max_pool_3x3s2_maskbwd

            x = max_pool_3x3s2_maskbwd(x)
        else:
            x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for stage, (n_blocks, feats) in enumerate(
            zip(self.stage_sizes, self.stage_features)
        ):
            for block in range(n_blocks):
                strides = 2 if stage > 0 and block == 0 else 1
                x = BasicBlock(
                    feats, strides, self.dtype, name=f"layer{stage + 1}_{block}"
                )(x)
        return x


class SpatialSoftmax(nn.Module):
    """Soft-argmax keypoint pooling (Finn et al., DSAE) over an NHWC feature
    map: 1x1 conv to `num_kp` maps, per-map spatial softmax, expected (x, y)
    over a [-1, 1] grid. Mirrors `base_nets.py:153-260` with fixed
    temperature (the Libero config uses temperature=1.0, no noise, no
    variance output — yaml:72-77)."""

    num_kp: int = 32
    temperature: float = 1.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feature: jax.Array) -> jax.Array:
        b, h, w, c = feature.shape
        feature = nn.Conv(self.num_kp, (1, 1), dtype=self.dtype, name="kp_conv")(
            feature
        )
        # (B, H, W, K) -> (B, K, H*W); softmax in fp32
        flat = feature.transpose(0, 3, 1, 2).reshape(b, self.num_kp, h * w)
        attention = jax.nn.softmax(flat.astype(jnp.float32) / self.temperature, axis=-1)
        # reference meshgrid: pos_x varies along W, pos_y along H
        # (`base_nets.py:201-208`)
        pos_x, pos_y = np.meshgrid(
            np.linspace(-1.0, 1.0, w), np.linspace(-1.0, 1.0, h)
        )
        pos_x = jnp.asarray(pos_x.reshape(1, 1, h * w), dtype=jnp.float32)
        pos_y = jnp.asarray(pos_y.reshape(1, 1, h * w), dtype=jnp.float32)
        expected_x = jnp.sum(pos_x * attention, axis=-1)
        expected_y = jnp.sum(pos_y * attention, axis=-1)
        # stack to (B, K, 2) with (x, y) ordering as in `base_nets.py:255-258`
        return jnp.stack([expected_x, expected_y], axis=-1).astype(self.dtype)


class VisualCore(nn.Module):
    """Backbone -> SpatialSoftmax -> flatten -> Linear(feature_dimension)
    (`vision_nets.py:65-177`).

    `stage_sizes`/`stage_features` default to ResNet-18 (the release
    config); smaller stage tuples give the shallow trunks robomimic's
    configurable `VisualCore` supports (`vision_nets.py:65-90` takes the
    backbone class as config) — used by the hermetic learning tests where
    the full ResNet-18 would dominate CPU CI time."""

    feature_dimension: int = 64
    num_kp: int = 32
    dtype: jnp.dtype = jnp.float32
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    stage_features: Sequence[int] = (64, 128, 256, 512)

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        x = ResNet18Conv(
            dtype=self.dtype,
            stage_sizes=tuple(self.stage_sizes),
            stage_features=tuple(self.stage_features),
            name="backbone",
        )(x)
        x = SpatialSoftmax(num_kp=self.num_kp, dtype=self.dtype, name="pool")(x)
        x = x.reshape(x.shape[0], -1)
        return nn.Dense(self.feature_dimension, dtype=self.dtype, name="proj")(x)


_IMAGENET_MEAN = np.asarray([0.485, 0.456, 0.406], np.float32)
_IMAGENET_STD = np.asarray([0.229, 0.224, 0.225], np.float32)


class MultiImageObsEncoder(nn.Module):
    """Per-key VisualCore encoders (not shared), concatenated in sorted-key
    order (`multi_image_obs_encoder.py:130,144-196` sorts rgb keys, so for
    Libero the order is img_goal_1 then img_obs_1).

    Input: dict of (B, H, W, 3) images already normalized to [-1, 1].
    Output: (B, n_keys * feature_dimension).

    The optional preprocessing stages of the reference encoder — resize,
    center crop (eval-time; train uses random crop in the upstream
    diffusion-policy codebase), ImageNet normalization
    (`multi_image_obs_encoder.py:79-124`) — are all DISABLED in the Libero
    release config (asserted Identity at `:124`) but are part of the
    capability surface, so they are supported here. `imagenet_norm` expects
    inputs scaled to [0, 1]."""

    rgb_keys: Tuple[str, ...] = ("img_goal_1", "img_obs_1")
    feature_dimension: int = 64
    num_kp: int = 32
    dtype: jnp.dtype = jnp.float32
    resize_shape: Optional[Tuple[int, int]] = None
    crop_shape: Optional[Tuple[int, int]] = None
    imagenet_norm: bool = False
    stage_sizes: Sequence[int] = (2, 2, 2, 2)
    stage_features: Sequence[int] = (64, 128, 256, 512)

    def _preprocess(self, img: jax.Array) -> jax.Array:
        if self.resize_shape is not None:
            b = img.shape[0]
            rh, rw = self.resize_shape
            img = jax.image.resize(
                img, (b, rh, rw, img.shape[-1]), method="bilinear"
            )
        if self.crop_shape is not None:
            ch, cw = self.crop_shape
            h, w = img.shape[1], img.shape[2]
            top, left = (h - ch) // 2, (w - cw) // 2
            img = img[:, top : top + ch, left : left + cw, :]
        if self.imagenet_norm:
            img = (img - _IMAGENET_MEAN) / _IMAGENET_STD
        return img

    @nn.compact
    def __call__(self, obs: Dict[str, jax.Array]) -> jax.Array:
        feats = []
        for key in sorted(self.rgb_keys):
            img = self._preprocess(obs[key].astype(self.dtype))
            feats.append(
                VisualCore(
                    feature_dimension=self.feature_dimension,
                    num_kp=self.num_kp,
                    dtype=self.dtype,
                    stage_sizes=tuple(self.stage_sizes),
                    stage_features=tuple(self.stage_features),
                    name=f"enc_{key}",
                )(img)
            )
        return jnp.concatenate(feats, axis=-1)

    @property
    def output_dim(self) -> int:
        return len(self.rgb_keys) * self.feature_dimension
