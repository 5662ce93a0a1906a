"""Perf lab: attribute the video U-Net forward-pass time to sub-components.

Times ONE jitted U-Net forward (not the 100-step chain) at the production
bench shape (batch 8, 7 frames, 128x128, bf16) under ablations:

  base        — the model as benchmarked
  no_attn     — attention_resolutions=() (removes all spatial attention)
  no_temporal — temporal convs inside PseudoConv3d skipped
  no_gn       — GroupNorm32 replaced by (SiLU of) identity
  conv_only   — all three ablations at once (spatial convs + glue only)

The difference base - no_X estimates component X's wall share (interactions
ignored). Timing forces a scalar readback per iteration (block_until_ready
does not reliably block through the axon tunnel, CLAUDE.md).

Usage: python scripts/perf_lab.py [variant ...]   (default: all)
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from v2a_tpu.models import video_unet
from v2a_tpu.models.video_unet import VideoUNet

BATCH, FRAMES, HW, TOKENS = 8, 7, 128, 16


def build(attn=(8, 16), fused=False):
    on_tpu = jax.devices()[0].platform != "cpu"
    return VideoUNet(
        in_channels=6, model_channels=128 if on_tpu else 32, out_channels=3,
        num_res_blocks=2, attention_resolutions=attn,
        channel_mult=(1, 2, 3, 4, 5), num_head_channels=32,
        task_token_dim=512, dtype=jnp.bfloat16 if on_tpu else jnp.float32,
        fused=fused,
    )


def time_forward(unet, label, iters=20):
    hw = HW if jax.devices()[0].platform != "cpu" else 32
    x = jax.random.normal(jax.random.PRNGKey(0), (BATCH, FRAMES, hw, hw, 6))
    t = jnp.full((BATCH,), 50, jnp.int32)
    e = jax.random.normal(jax.random.PRNGKey(1), (BATCH, TOKENS, 512)) * 0.1

    shapes = jax.eval_shape(lambda r: unet.init(r, x, t, e), jax.random.PRNGKey(0))
    rngs = iter(jax.random.split(jax.random.PRNGKey(0), 10_000))
    params = jax.tree_util.tree_map(
        lambda s: jax.random.normal(next(rngs), s.shape, s.dtype) * 0.02, shapes
    )

    fwd = jax.jit(lambda p, x, t, e: unet.apply(p, x, t, e))
    checksum = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))

    c0 = time.perf_counter()
    np.asarray(checksum(fwd(params, x, t, e)))  # compile+run
    compile_s = time.perf_counter() - c0

    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(checksum(fwd(params, x, t, e)))
    dt = (time.perf_counter() - t0) / iters
    print(f"{label:<12} fwd {dt * 1e3:8.2f} ms   (compile {compile_s:.0f}s)",
          flush=True)
    return dt


def conv_bench(iters=30):
    """Per-level 3x3 conv: XLA conv_general_dilated vs im2col matmul.

    The round-1 cost model measured the deep levels at 61/29 TFLOP/s vs the
    117 chip peak; im2col turns the 16^2/8^2 convs into one clean MXU matmul.
    """
    shapes = [
        ("L2", 56, 32, 32, 384),
        ("L3", 56, 16, 16, 512),
        ("L4", 56, 8, 8, 640),
        ("L4up", 56, 8, 8, 1280, 640),
    ]
    checksum = jax.jit(lambda y: jnp.sum(y.astype(jnp.float32)))
    for row in shapes:
        name, n, h, w, c = row[:5]
        d = row[5] if len(row) > 5 else c
        x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w, c), jnp.bfloat16)
        wgt = jax.random.normal(
            jax.random.PRNGKey(1), (3, 3, c, d), jnp.bfloat16
        ) * 0.02
        flops = 2 * 9 * c * d * h * w * n

        @jax.jit
        def xla_conv(x, wgt):
            return jax.lax.conv_general_dilated(
                x, wgt, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        @jax.jit
        def im2col(x, wgt):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            cols = [
                jax.lax.dynamic_slice(xp, (0, i, j, 0), (n, h, w, c))
                for i in range(3) for j in range(3)
            ]
            cat = jnp.concatenate(cols, -1).reshape(n * h * w, 9 * c)
            y = jax.lax.dot_general(
                cat, wgt.reshape(9 * c, d), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16,
            )
            return y.reshape(n, h, w, d)

        for label, fn in (("xla", xla_conv), ("im2col", im2col)):
            np.asarray(checksum(fn(x, wgt)))
            t0 = time.perf_counter()
            for _ in range(iters):
                np.asarray(checksum(fn(x, wgt)))
            dt = (time.perf_counter() - t0) / iters
            print(
                f"conv {name:<5} {label:<7} {dt * 1e3:7.3f} ms  "
                f"{flops / dt / 1e12:6.1f} TFLOP/s", flush=True,
            )


def main():
    known_ablate = ["base", "no_attn", "no_temporal", "no_gn", "conv_only"]
    want = sys.argv[1:] or known_ablate
    results = {}
    for name in want:
        if name == "convbench":
            conv_bench()
            continue
        if name == "fused":
            results[name] = time_forward(build(fused=True), name)
            continue
        video_unet.PERF_ABLATE_TEMPORAL = name in ("no_temporal", "conv_only")
        video_unet.PERF_ABLATE_GN = name in ("no_gn", "conv_only")
        attn = () if name in ("no_attn", "conv_only") else (8, 16)
        results[name] = time_forward(build(attn), name)
    video_unet.PERF_ABLATE_TEMPORAL = False
    video_unet.PERF_ABLATE_GN = False
    if "base" in results:
        b = results["base"]
        for name, v in results.items():
            if name != "base":
                print(f"  {name:<12} share ~= {(b - v) * 1e3:7.2f} ms")


if __name__ == "__main__":
    main()
