"""InceptionV3 (pool3, 2048-d) feature trunk for Inception-calibrated FID.

Capability counterpart of the reference evaluator's TF-v1 Inception graph
(`guided_diffusion/evaluations/evaluator.py:20-24,582-600` downloads
`classify_image_graph_def.pb` at runtime — no network here). This module
instead consumes a torchvision-format `inception_v3` state dict from an
OFFLINE file: `convert_inception_state_dict` folds every BatchNorm into
its conv (inference-only) and returns a pure-JAX params tree;
`inception_features(path)` yields a `features_fn(images01) -> (N, 2048)`
that plugs into `v2a_tpu.ops.fid.fid`. The hermetic fallback
(`fid.random_conv_features`) remains for environments with no weights.

Preprocessing follows the pytorch-fid convention: NHWC images in [0, 1],
bilinear-resized to 299x299, scaled to [-1, 1]. Numbers computed with the
pytorch-fid Inception weights are then comparable to published FIDs.

The architecture below is the standard torchvision `inception_v3` graph
(stride-2 valid-padded stem, Mixed_5b..7c inception blocks, global average
pool) expressed declaratively so the weight converter, the forward pass,
and the synthetic-weight test generator all walk the SAME spec and cannot
drift apart.
"""

from __future__ import annotations

import dataclasses
from typing import Dict, List, Sequence, Tuple

import numpy as np

BN_EPS = 1e-3  # torchvision BasicConv2d BatchNorm2d(eps=0.001)


@dataclasses.dataclass(frozen=True)
class ConvSpec:
    name: str          # torchvision module path, e.g. "Mixed_5b.branch1x1"
    cin: int
    cout: int
    khw: Tuple[int, int]
    stride: int = 1
    pad: Tuple[int, int] = (0, 0)  # symmetric (ph, pw)


def _conv(name, cin, cout, k, stride=1, pad=0):
    kh, kw = (k, k) if isinstance(k, int) else k
    ph, pw = (pad, pad) if isinstance(pad, int) else pad
    return ConvSpec(name, cin, cout, (kh, kw), stride, (ph, pw))


def _inception_a(p: str, cin: int, pool: int) -> List[ConvSpec]:
    return [
        _conv(f"{p}.branch1x1", cin, 64, 1),
        _conv(f"{p}.branch5x5_1", cin, 48, 1),
        _conv(f"{p}.branch5x5_2", 48, 64, 5, pad=2),
        _conv(f"{p}.branch3x3dbl_1", cin, 64, 1),
        _conv(f"{p}.branch3x3dbl_2", 64, 96, 3, pad=1),
        _conv(f"{p}.branch3x3dbl_3", 96, 96, 3, pad=1),
        _conv(f"{p}.branch_pool", cin, pool, 1),
    ]


def _inception_b(p: str, cin: int) -> List[ConvSpec]:
    return [
        _conv(f"{p}.branch3x3", cin, 384, 3, stride=2),
        _conv(f"{p}.branch3x3dbl_1", cin, 64, 1),
        _conv(f"{p}.branch3x3dbl_2", 64, 96, 3, pad=1),
        _conv(f"{p}.branch3x3dbl_3", 96, 96, 3, stride=2),
    ]


def _inception_c(p: str, cin: int, c7: int) -> List[ConvSpec]:
    return [
        _conv(f"{p}.branch1x1", cin, 192, 1),
        _conv(f"{p}.branch7x7_1", cin, c7, 1),
        _conv(f"{p}.branch7x7_2", c7, c7, (1, 7), pad=(0, 3)),
        _conv(f"{p}.branch7x7_3", c7, 192, (7, 1), pad=(3, 0)),
        _conv(f"{p}.branch7x7dbl_1", cin, c7, 1),
        _conv(f"{p}.branch7x7dbl_2", c7, c7, (7, 1), pad=(3, 0)),
        _conv(f"{p}.branch7x7dbl_3", c7, c7, (1, 7), pad=(0, 3)),
        _conv(f"{p}.branch7x7dbl_4", c7, c7, (7, 1), pad=(3, 0)),
        _conv(f"{p}.branch7x7dbl_5", c7, 192, (1, 7), pad=(0, 3)),
        _conv(f"{p}.branch_pool", cin, 192, 1),
    ]


def _inception_d(p: str, cin: int) -> List[ConvSpec]:
    return [
        _conv(f"{p}.branch3x3_1", cin, 192, 1),
        _conv(f"{p}.branch3x3_2", 192, 320, 3, stride=2),
        _conv(f"{p}.branch7x7x3_1", cin, 192, 1),
        _conv(f"{p}.branch7x7x3_2", 192, 192, (1, 7), pad=(0, 3)),
        _conv(f"{p}.branch7x7x3_3", 192, 192, (7, 1), pad=(3, 0)),
        _conv(f"{p}.branch7x7x3_4", 192, 192, 3, stride=2),
    ]


def _inception_e(p: str, cin: int) -> List[ConvSpec]:
    return [
        _conv(f"{p}.branch1x1", cin, 320, 1),
        _conv(f"{p}.branch3x3_1", cin, 384, 1),
        _conv(f"{p}.branch3x3_2a", 384, 384, (1, 3), pad=(0, 1)),
        _conv(f"{p}.branch3x3_2b", 384, 384, (3, 1), pad=(1, 0)),
        _conv(f"{p}.branch3x3dbl_1", cin, 448, 1),
        _conv(f"{p}.branch3x3dbl_2", 448, 384, 3, pad=1),
        _conv(f"{p}.branch3x3dbl_3a", 384, 384, (1, 3), pad=(0, 1)),
        _conv(f"{p}.branch3x3dbl_3b", 384, 384, (3, 1), pad=(1, 0)),
        _conv(f"{p}.branch_pool", cin, 192, 1),
    ]


STEM: List[ConvSpec] = [
    _conv("Conv2d_1a_3x3", 3, 32, 3, stride=2),
    _conv("Conv2d_2a_3x3", 32, 32, 3),
    _conv("Conv2d_2b_3x3", 32, 64, 3, pad=1),
    _conv("Conv2d_3b_1x1", 64, 80, 1),
    _conv("Conv2d_4a_3x3", 80, 192, 3),
]

# (block builder, prefix, in-channels, extra arg) -> out channels
BLOCKS = [
    (_inception_a, "Mixed_5b", 192, 32, 256),
    (_inception_a, "Mixed_5c", 256, 64, 288),
    (_inception_a, "Mixed_5d", 288, 64, 288),
    (_inception_b, "Mixed_6a", 288, None, 768),
    (_inception_c, "Mixed_6b", 768, 128, 768),
    (_inception_c, "Mixed_6c", 768, 160, 768),
    (_inception_c, "Mixed_6d", 768, 160, 768),
    (_inception_c, "Mixed_6e", 768, 192, 768),
    (_inception_d, "Mixed_7a", 768, None, 1280),
    (_inception_e, "Mixed_7b", 1280, None, 2048),
    (_inception_e, "Mixed_7c", 2048, None, 2048),
]

FEATURE_DIM = 2048


def all_conv_specs() -> List[ConvSpec]:
    specs = list(STEM)
    for builder, prefix, cin, extra, _cout in BLOCKS:
        specs += builder(prefix, cin) if extra is None else builder(
            prefix, cin, extra
        )
    return specs


# -- weight conversion ------------------------------------------------------


def fold_bn(conv_w, gamma, beta, mean, var, eps=BN_EPS):
    """Fold an inference BatchNorm into the preceding conv: returns
    (kernel_hwio, bias). conv_w is torch OIHW."""
    conv_w = np.asarray(conv_w, np.float64)
    scale = np.asarray(gamma, np.float64) / np.sqrt(
        np.asarray(var, np.float64) + eps
    )
    w = conv_w * scale[:, None, None, None]
    b = np.asarray(beta, np.float64) - np.asarray(mean, np.float64) * scale
    # OIHW -> HWIO
    return (
        np.ascontiguousarray(w.transpose(2, 3, 1, 0)).astype(np.float32),
        b.astype(np.float32),
    )


def convert_inception_state_dict(sd: Dict[str, np.ndarray]) -> Dict:
    """torchvision `inception_v3` state dict -> {name: {kernel, bias}} with
    every BasicConv2d's BatchNorm folded in. Accepts torch tensors or numpy
    arrays; ignores fc/AuxLogits (features stop at the global pool)."""
    def get(k):
        if k not in sd:
            raise KeyError(f"inception state dict missing {k!r}")
        v = sd[k]
        return v.detach().cpu().numpy() if hasattr(v, "detach") else np.asarray(v)

    params = {}
    for spec in all_conv_specs():
        p = spec.name
        kernel, bias = fold_bn(
            get(f"{p}.conv.weight"), get(f"{p}.bn.weight"),
            get(f"{p}.bn.bias"), get(f"{p}.bn.running_mean"),
            get(f"{p}.bn.running_var"),
        )
        want = (*spec.khw, spec.cin, spec.cout)
        if kernel.shape != want:
            raise ValueError(
                f"{p}: converted kernel shape {kernel.shape} != {want}"
            )
        params[p] = {"kernel": kernel, "bias": bias}
    # classifier head (optional): kept so `inception_logits` can compute
    # Inception Score the way the reference evaluator does
    # (`evaluator.py:602-612` softmax output)
    if "fc.weight" in sd:
        params["fc"] = {
            "kernel": np.ascontiguousarray(
                get("fc.weight").T
            ).astype(np.float32),  # (2048, n_classes)
            "bias": get("fc.bias").astype(np.float32),
        }
    return params


def inception_logits(params: Dict, pooled: "np.ndarray") -> "np.ndarray":
    """Classifier logits from pool3 features (requires the checkpoint to
    carry the fc head)."""
    if "fc" not in params:
        raise KeyError("checkpoint has no fc head; Inception Score needs it")
    return np.asarray(pooled) @ params["fc"]["kernel"] + params["fc"]["bias"]


def load_inception_params(path: str) -> Dict:
    """Load + convert a torchvision inception_v3 state dict saved with
    `torch.save` (.pt/.pth) or a pre-converted `np.savez` archive."""
    if path.endswith(".npz"):
        flat = np.load(path)
        params = {}
        for key in flat.files:
            name, leaf = key.rsplit("/", 1)
            params.setdefault(name, {})[leaf] = flat[key]
        return params
    import torch

    sd = torch.load(path, map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return convert_inception_state_dict(sd)


def save_inception_params(params: Dict, path: str):
    np.savez(path, **{
        f"{name}/{leaf}": arr
        for name, leaves in params.items() for leaf, arr in leaves.items()
    })


# -- forward ----------------------------------------------------------------


def _apply_conv(params, spec: ConvSpec, x):
    import jax
    import jax.numpy as jnp

    p = params[spec.name]
    y = jax.lax.conv_general_dilated(
        x, jnp.asarray(p["kernel"], x.dtype),
        window_strides=(spec.stride, spec.stride),
        padding=[(spec.pad[0], spec.pad[0]), (spec.pad[1], spec.pad[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(y + jnp.asarray(p["bias"], x.dtype))


def _maxpool3s2(x):
    import jax.numpy as jnp
    from jax import lax

    return lax.reduce_window(
        x, -jnp.inf, lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


def _avgpool3s1p1(x):
    # torch AvgPool2d(3, stride=1, padding=1) default count_include_pad=True
    from jax import lax

    s = lax.reduce_window(
        x, 0.0, lax.add, (1, 3, 3, 1), (1, 1, 1, 1),
        [(0, 0), (1, 1), (1, 1), (0, 0)],
    )
    return s / 9.0


def _block(params, specs_by_name, names, x):
    return [
        _apply_conv(params, specs_by_name[n], x) for n in names
    ]


def inception_forward(
    params: Dict, images01, return_spatial: bool = False
) -> "np.ndarray":
    """NHWC float images in [0, 1] (any H, W) -> (N, 2048) pool3 features.

    `return_spatial=True` additionally returns the reference evaluator's
    sFID feature set (`evaluator.py:590-600` reads the first 7 channels of
    the TF graph's `mixed_6/conv` activation; the torchvision counterpart
    is the Mixed_6e block output): (N, 17*17*7) flattened spatial features.
    """
    import jax
    import jax.numpy as jnp

    specs = {s.name: s for s in all_conv_specs()}

    x = jnp.asarray(images01, jnp.float32)
    if x.ndim != 4 or x.shape[-1] != 3:
        raise ValueError(f"expected NHWC rgb images, got {x.shape}")
    if x.shape[1:3] != (299, 299):
        x = jax.image.resize(
            x, (x.shape[0], 299, 299, 3), method="bilinear"
        )
    x = x * 2.0 - 1.0  # pytorch-fid input convention

    c = lambda name, y: _apply_conv(params, specs[name], y)  # noqa: E731

    # stem
    x = c("Conv2d_1a_3x3", x)
    x = c("Conv2d_2a_3x3", x)
    x = c("Conv2d_2b_3x3", x)
    x = _maxpool3s2(x)
    x = c("Conv2d_3b_1x1", x)
    x = c("Conv2d_4a_3x3", x)
    x = _maxpool3s2(x)

    spatial = None
    for builder, p, _cin, _extra, _cout in BLOCKS:
        if builder is _inception_a:
            x = jnp.concatenate([
                c(f"{p}.branch1x1", x),
                c(f"{p}.branch5x5_2", c(f"{p}.branch5x5_1", x)),
                c(f"{p}.branch3x3dbl_3",
                  c(f"{p}.branch3x3dbl_2", c(f"{p}.branch3x3dbl_1", x))),
                c(f"{p}.branch_pool", _avgpool3s1p1(x)),
            ], axis=-1)
        elif builder is _inception_b:
            x = jnp.concatenate([
                c(f"{p}.branch3x3", x),
                c(f"{p}.branch3x3dbl_3",
                  c(f"{p}.branch3x3dbl_2", c(f"{p}.branch3x3dbl_1", x))),
                _maxpool3s2(x),
            ], axis=-1)
        elif builder is _inception_c:
            b77 = c(f"{p}.branch7x7_3",
                    c(f"{p}.branch7x7_2", c(f"{p}.branch7x7_1", x)))
            d = c(f"{p}.branch7x7dbl_1", x)
            for i in (2, 3, 4, 5):
                d = c(f"{p}.branch7x7dbl_{i}", d)
            x = jnp.concatenate([
                c(f"{p}.branch1x1", x), b77, d,
                c(f"{p}.branch_pool", _avgpool3s1p1(x)),
            ], axis=-1)
        elif builder is _inception_d:
            b33 = c(f"{p}.branch3x3_2", c(f"{p}.branch3x3_1", x))
            b773 = c(f"{p}.branch7x7x3_1", x)
            for i in (2, 3, 4):
                b773 = c(f"{p}.branch7x7x3_{i}", b773)
            x = jnp.concatenate([b33, b773, _maxpool3s2(x)], axis=-1)
        else:  # InceptionE
            b3 = c(f"{p}.branch3x3_1", x)
            b3 = jnp.concatenate([
                c(f"{p}.branch3x3_2a", b3), c(f"{p}.branch3x3_2b", b3)
            ], axis=-1)
            bd = c(f"{p}.branch3x3dbl_2", c(f"{p}.branch3x3dbl_1", x))
            bd = jnp.concatenate([
                c(f"{p}.branch3x3dbl_3a", bd), c(f"{p}.branch3x3dbl_3b", bd)
            ], axis=-1)
            x = jnp.concatenate([
                c(f"{p}.branch1x1", x), b3, bd,
                c(f"{p}.branch_pool", _avgpool3s1p1(x)),
            ], axis=-1)
        if p == "Mixed_6e" and return_spatial:
            spatial = x[..., :7].reshape(x.shape[0], -1)

    pooled = x.mean(axis=(1, 2))  # global average pool -> (N, 2048)
    return (pooled, spatial) if return_spatial else pooled


def inception_features(path: str, batch_jit: bool = True):
    """`features_fn(images01) -> (N, 2048)` from an offline weights file —
    plugs straight into `v2a_tpu.ops.fid.fid(..., features_fn=...)`."""
    import jax

    params = load_inception_params(path)
    fwd = jax.jit(inception_forward) if batch_jit else inception_forward

    def features_fn(images01):
        return np.asarray(fwd(params, np.asarray(images01)))

    return features_fn


# -- synthetic weights (tests / smoke) --------------------------------------


def synthetic_state_dict(seed: int = 0) -> Dict[str, np.ndarray]:
    """Random torchvision-format inception_v3 state dict (correct keys and
    shapes) for converter/forward tests without torchvision."""
    rs = np.random.RandomState(seed)
    sd = {}
    for spec in all_conv_specs():
        o, i = spec.cout, spec.cin
        kh, kw = spec.khw
        fan_in = i * kh * kw
        sd[f"{spec.name}.conv.weight"] = (
            rs.randn(o, i, kh, kw) * np.sqrt(2.0 / fan_in)
        ).astype(np.float32)
        sd[f"{spec.name}.bn.weight"] = rs.uniform(0.5, 1.5, o).astype(
            np.float32
        )
        sd[f"{spec.name}.bn.bias"] = (rs.randn(o) * 0.1).astype(np.float32)
        sd[f"{spec.name}.bn.running_mean"] = (
            rs.randn(o) * 0.1
        ).astype(np.float32)
        sd[f"{spec.name}.bn.running_var"] = rs.uniform(0.5, 1.5, o).astype(
            np.float32
        )
    return sd
