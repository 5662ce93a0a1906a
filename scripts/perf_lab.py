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

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


_TUNNEL_BASELINE = None


def _tunnel_baseline(iters=20):
    """Per-call dispatch+readback latency of the axon tunnel (~31 ms),
    measured with a trivial program; subtracted from chained timings."""
    global _TUNNEL_BASELINE
    if _TUNNEL_BASELINE is None:
        f = jax.jit(lambda s: s + 1.0)
        x = jnp.zeros(())
        np.asarray(f(x))
        t0 = time.perf_counter()
        for _ in range(iters):
            np.asarray(f(x))
        _TUNNEL_BASELINE = (time.perf_counter() - t0) / iters
        print(f"(tunnel baseline {_TUNNEL_BASELINE * 1e3:.1f} ms/call)",
              flush=True)
    return _TUNNEL_BASELINE


def _time_chained(fn, x, wgt, chain=20, iters=5):
    """Time `y = fn(y, wgt)` inside one jit via a TWO chain-length slope:
    dt = (t_long - t_short) / (len_long - len_short). The per-call tunnel
    round trip (~30 ms, and it DRIFTS by several ms between measurements —
    enough to fake >peak TFLOP/s on sub-ms ops) cancels exactly."""
    lens = (chain // 4, chain)

    def make(length):
        @jax.jit
        def run(x, wgt):
            def body(y, _):
                return fn(y, wgt), None
            y, _ = jax.lax.scan(body, x, None, length=length)
            return sum(
                jnp.sum(l.astype(jnp.float32))
                for l in jax.tree_util.tree_leaves(y)
            )
        return run

    runs = [make(n) for n in lens]
    for r in runs:
        np.asarray(r(x, wgt))  # compile+warm
    times = [0.0, 0.0]
    # interleave the two lengths so slow tunnel-latency drift hits both
    for _ in range(iters):
        for k, r in enumerate(runs):
            t0 = time.perf_counter()
            np.asarray(r(x, wgt))
            times[k] += time.perf_counter() - t0
    return max(times[1] - times[0], 1e-9) / iters / (lens[1] - lens[0])


def conv_bench():
    """Per-level 3x3 conv: XLA conv_general_dilated vs im2col matmul.

    The round-1 cost model measured the deep levels at 61/29 TFLOP/s vs the
    117 chip peak; im2col turns the 16^2/8^2 convs into one clean MXU matmul.
    """
    shapes = [
        ("L2", 56, 32, 32, 384),
        ("L3", 56, 16, 16, 512),
        ("L4", 56, 8, 8, 640),
    ]
    for name, n, h, w, c in shapes:
        x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w, c), jnp.bfloat16)
        wgt = jax.random.normal(
            jax.random.PRNGKey(1), (3, 3, c, c), jnp.bfloat16
        ) * 0.02
        flops = 2 * 9 * c * c * h * w * n

        def xla_conv(x, wgt):
            return jax.lax.conv_general_dilated(
                x, wgt, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def im2col(x, wgt):
            xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
            cols = [
                jax.lax.dynamic_slice(xp, (0, i, j, 0), (n, h, w, c))
                for i in range(3) for j in range(3)
            ]
            cat = jnp.concatenate(cols, -1).reshape(n * h * w, 9 * c)
            y = jax.lax.dot_general(
                cat, wgt.reshape(9 * c, c), (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.bfloat16,
            )
            return y.reshape(n, h, w, c)

        for label, fn in (("xla", xla_conv), ("im2col", im2col)):
            dt = _time_chained(fn, x, wgt)
            print(
                f"conv {name:<5} {label:<7} {dt * 1e3:7.3f} ms  "
                f"{flops / dt / 1e12:6.1f} TFLOP/s", flush=True,
            )


def affconv_bench():
    """Standalone deep-level conv: XLA conv emitter vs the fused
    affine+SiLU im2col Pallas kernel (`fused_affine_conv3x3`)."""
    from v2a_tpu.ops.resblock_kernels import fused_affine_conv3x3, spatial2_group

    shapes = [
        ("L0", 56, 128, 128, 128),
        ("L1", 56, 64, 64, 256),
        ("L2", 56, 32, 32, 384),
        ("L3", 56, 16, 16, 512),
        ("L4", 56, 8, 8, 640),
    ]
    for name, n, h, w, c in shapes:
        x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w, c), jnp.bfloat16)
        wgt = jax.random.normal(
            jax.random.PRNGKey(1), (3, 3, c, c), jnp.bfloat16
        ) * 0.02
        bias = jnp.zeros((c,), jnp.float32)
        a = jnp.ones((n, c), jnp.float32)
        bsh = jnp.zeros((n, c), jnp.float32)
        flops = 2 * 9 * c * c * h * w * n
        g = spatial2_group(n, h, w, c)

        def xla_conv(x, wgt):
            return jax.lax.conv_general_dilated(
                x, wgt, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def pallas_plain(x, wgt):
            return fused_affine_conv3x3(x, wgt, bias)

        def pallas_affine(x, wgt):
            return fused_affine_conv3x3(x, wgt, bias, a=a, b=bsh, silu=True)

        for label, fn in (
            ("xla", xla_conv),
            (f"pallas(g={g})", pallas_plain),
            ("pallas+aff", pallas_affine),
        ):
            try:
                dt = _time_chained(fn, x, wgt)
                print(
                    f"affconv {name:<4} {label:<12} {dt * 1e3:7.3f} ms  "
                    f"{flops / dt / 1e12:6.1f} TFLOP/s", flush=True,
                )
            except Exception as e:
                print(f"affconv {name} {label} FAILED: {str(e)[:140]}",
                      flush=True)


_DOT_RATE_CACHE = {}


def _dot_rate(m, k, n, streams=4):
    """Throughput ceiling of an (M,K)x(K,N) dot: `streams` INDEPENDENT
    serial chains advance together in one scan body, so MXU pipeline
    latency amortizes across them (a single serial chain measures LATENCY —
    13 TF/s at M=128 where the issue ceiling is far higher — because each
    link waits for the previous result). Independent streams match the
    kernel's situation: its per-tap dots are independent and only meet at
    the f32 accumulate."""
    key = (m, k, n)
    if key in _DOT_RATE_CACHE:
        return _DOT_RATE_CACHE[key]
    ys = tuple(
        jax.random.normal(jax.random.PRNGKey(i), (m, k), jnp.bfloat16)
        for i in range(streams)
    )
    w1 = jax.random.normal(jax.random.PRNGKey(91), (k, n), jnp.bfloat16) * 0.05
    w2 = jax.random.normal(jax.random.PRNGKey(92), (n, k), jnp.bfloat16) * 0.05

    def one(y, wa, wb):
        # bf16 MXU-native outputs: an f32 accumulate + astype would insert
        # per-link VPU converts that serialize with the dots and cap the
        # measured rate ~40% below the true issue ceiling (round-4 finding)
        z = jax.lax.dot_general(
            y, wa, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16,
        )
        return jax.lax.dot_general(
            z, wb, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.bfloat16,
        )

    def f(ys, wgt):
        wa, wb = wgt
        return tuple(one(y, wa, wb) for y in ys)

    # per-link flops streams*4mkn is tiny; the chain must be long enough
    # that the LONG-SHORT difference (~0.75*chain links) dwarfs the
    # multi-ms tunnel drift (CLAUDE.md): target ~2 TFLOP of difference
    chain = max(2000, int(2.7e12 / (streams * 4 * m * k * n)) // 4 * 4)
    dt = _time_chained(f, ys, (w1, w2), chain=chain, iters=8)
    rate = (streams * 4 * m * k * n) / dt
    _DOT_RATE_CACHE[key] = rate
    print(f"    dot ({m:6d},{k:4d})x({k:4d},{n:4d}) x{streams}  "
          f"{rate / 1e12:6.1f} TF/s", flush=True)
    return rate


def dot_ceiling_bench():
    """Independent-stream dot throughput at every per-tap shape the mega
    kernels issue (M = tp*W at the shipped band heights, K = C, N = D) —
    the honest per-shape speed-of-light for the fill/drain accounting.
    Also sweeps streams at the L0 shape to show the latency/throughput
    split."""
    for s in (1, 2, 4, 8):
        _DOT_RATE_CACHE.clear()
        _dot_rate(512, 128, 128, streams=s)
    _DOT_RATE_CACHE.clear()
    for m, k, n in (
        (512, 128, 128),   # L0 per-tap dot at tp=4
        (1024, 128, 128),  # L0 at tp=8
        (256, 256, 256),   # L1 per-tap dot at tp=4
        (512, 256, 256),   # L1 at tp=8
        (128, 384, 384),   # L2 shape (two-kernel path, tp=4 @ w=32)
        (896, 128, 128),   # L0 frame-folded (F*tp*W/8) reference point
    ):
        _dot_rate(m, k, n)


def mega_bench(levels=None):
    """Fill/drain accounting for the mega kernels (round-3 VERDICT item 2a).

    For each mega-kernel configuration of the headline net (per level:
    down-path in_conv, out_conv with residual+emb+stats, up-path in_conv
    with the K=2C skip concat), measure with the chained-slope harness:

      (1) the kernel at the shipped band height AND a tile_h sweep
          (divisor multiples/fractions of the picked band), and
      (2) the kernel's OWN dot speed-of-light: a standalone resident-weight
          chained dot at the exact per-tap shape (M=tp*W, K=C, N=D) — all
          dots in these configs share one shape since C==D — scaled to the
          kernel's analytic dot count 2*F*B*h*w*d*c*(9*parts + 3).

    gap = kernel / dot-SoL isolates everything that is NOT MXU dot issue
    (fill/drain, affine/SiLU VPU work, window DMA not hidden, one-hot row
    selects). A tile_h that closes a >10% gap re-picks the band for that
    level (V2A_MEGA_TILE_<level> override / picker change).
    """
    from v2a_tpu.ops import resblock_kernels as rk

    B, F = BATCH, FRAMES
    levels = levels or [("L0", 128, 128), ("L1", 64, 256), ("L2", 32, 384)]
    dot_rate = _dot_rate

    for name, h, c in levels:
        w = h
        hp, wp = rk.padded_hw(h, w)
        for variant, n_parts, with_out in (
            ("in_dn", 1, False), ("out", 1, True), ("in_up", 2, False),
        ):
            d = c
            cins = [c] * n_parts
            tp0 = rk.conv_tconv_band_rows(
                h, w, wp, cins, d, F, has_res=with_out)
            if not tp0:
                print(f"mega {name}.{variant}: not viable", flush=True)
                continue
            cand = sorted({
                t for t in (
                    max(tp0 // 4, 1), max(tp0 // 2, 1), tp0, tp0 * 2,
                    tp0 * 4,
                ) if t >= 1 and h % t == 0
            })
            flops = 2 * F * B * h * w * d * c * (9 * n_parts + 3)
            key = jax.random.PRNGKey(3)
            kernel = jax.random.normal(
                key, (3, 3, c, d), jnp.bfloat16) * 0.02
            aff_a = jnp.ones((B * F, c), jnp.float32)
            aff_b = jnp.zeros((B * F, c), jnp.float32)
            kbias = jnp.zeros((d,), jnp.float32)
            tkernel = jax.random.normal(
                jax.random.PRNGKey(4), (3, d, d), jnp.bfloat16) * 0.02
            tbias = jnp.zeros((d,), jnp.float32)
            emb = (jax.random.normal(jax.random.PRNGKey(5), (B, d),
                                     jnp.float32) * 0.1 if with_out else None)
            x0 = jax.random.normal(
                jax.random.PRNGKey(6), (B, F, hp, wp, c), jnp.bfloat16)

            for tp in cand:
                def run(y, wgt):
                    kern, tk = wgt
                    parts = [(y, kern, aff_a, aff_b)] * n_parts
                    out = rk.fused_conv_tconv_padded(
                        parts, kbias, tk, tbias, (h, w), emb=emb,
                        residual=y if with_out else None,
                        silu=True, want_stats=with_out, tile_h=tp,
                    )
                    y2 = out[0] if with_out else out
                    # keep the chain bounded (random weights would blow up)
                    return (y2 * 0.5).astype(jnp.bfloat16)

                try:
                    dt = _time_chained(run, x0, (kernel, tkernel),
                                       chain=20, iters=5)
                except Exception as e:  # Mosaic OOM etc.
                    print(f"mega {name}.{variant} tp={tp:3d}  FAILED: "
                          f"{str(e)[:110]}", flush=True)
                    continue
                rate = dot_rate(tp * w, c, d)
                sol = flops / rate
                mark = " <-- shipped" if tp == tp0 else ""
                print(
                    f"mega {name}.{variant} tp={tp:3d}  {dt * 1e3:7.3f} ms "
                    f"{flops / dt / 1e12:6.1f} TF/s  dotSoL {sol * 1e3:7.3f}"
                    f" ms  gap {dt / sol:5.2f}x{mark}", flush=True,
                )


def _winograd_conv(x, wgt):
    """Winograd F(2x2, 3x3) 3x3 SAME conv, all-XLA: 16 strided input slices
    -> separable B^T d B combos -> 16 batched (M, C) x (C, D) gemms -> A^T M A
    -> interleave. 2.25x fewer gemm FLOPs than direct conv; transform passes
    are elementwise. Exact in exact arithmetic."""
    n, h, w, c = x.shape
    d = wgt.shape[-1]
    nh, nw = h // 2, w // 2
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    # 16 strided patch-element slices, each (N, nh, nw, C)
    dd = [
        [
            jax.lax.slice(
                xp, (0, a, b, 0), (n, a + 2 * nh - 1, b + 2 * nw - 1, c),
                (1, 2, 2, 1),
            )
            for b in range(4)
        ]
        for a in range(4)
    ]
    f32 = jnp.float32
    dd = [[e.astype(f32) for e in row] for row in dd]
    # B^T rows: [1,0,-1,0], [0,1,1,0], [0,-1,1,0], [0,1,0,-1]
    def bt(v):  # combine a length-4 list along one axis
        return [
            v[0] - v[2],
            v[1] + v[2],
            v[2] - v[1],
            v[1] - v[3],
        ]

    t = [bt([dd[a][b] for a in range(4)]) for b in range(4)]  # t[b][a]
    v16 = []
    for a in range(4):
        row = bt([t[b][a] for b in range(4)])  # over b
        v16.append(row)  # v16[a][b]
    v = jnp.stack([v16[a][b] for a in range(4) for b in range(4)])
    v = v.reshape(16, n * nh * nw, c).astype(x.dtype)

    # weight transform G w G^T, G = [[1,0,0],[.5,.5,.5],[.5,-.5,.5],[0,0,1]]
    g = jnp.array(
        [[1, 0, 0], [0.5, 0.5, 0.5], [0.5, -0.5, 0.5], [0, 0, 1]], f32
    )
    u = jnp.einsum(
        "ai,bj,ijcd->abcd", g, g, wgt.astype(f32)
    ).reshape(16, c, d).astype(x.dtype)

    m = jnp.einsum(
        "tmc,tcd->tmd", v, u, preferred_element_type=f32
    ).reshape(4, 4, n, nh, nw, d)

    # A^T rows: [1,1,1,0], [0,1,-1,-1]
    def at(v4):
        return [v4[0] + v4[1] + v4[2], v4[1] - v4[2] - v4[3]]

    ta = [at([m[a, b] for a in range(4)]) for b in range(4)]  # ta[b][i]
    y = []
    for i in range(2):
        row = at([ta[b][i] for b in range(4)])  # over b -> j
        y.append(row)  # y[i][j]
    yy = jnp.stack([jnp.stack(y[i], 0) for i in range(2)], 0)
    # (2, 2, N, nh, nw, D) -> (N, nh, 2, nw, 2, D) -> (N, H, W, D)
    out = yy.transpose(2, 3, 0, 4, 1, 5).reshape(n, h, w, d)
    return out.astype(x.dtype)


def winograd_bench():
    """Winograd F(2x2,3x3) vs the XLA conv emitter at every level."""
    shapes = [
        ("L0", 56, 128, 128, 128),
        ("L1", 56, 64, 64, 256),
        ("L2", 56, 32, 32, 384),
        ("L3", 56, 16, 16, 512),
        ("L4", 56, 8, 8, 640),
    ]
    for name, n, h, w, c in shapes:
        x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w, c), jnp.bfloat16)
        wgt = jax.random.normal(
            jax.random.PRNGKey(1), (3, 3, c, c), jnp.bfloat16
        ) * 0.02
        flops = 2 * 9 * c * c * h * w * n

        def xla_conv(x, wgt):
            return jax.lax.conv_general_dilated(
                x, wgt, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        # numerics check once per shape (vs direct conv, bf16 tolerance)
        ref = np.asarray(xla_conv(x, wgt), np.float32)
        got = np.asarray(_winograd_conv(x, wgt), np.float32)
        scale = np.abs(ref).max() + 1e-6
        relerr = np.abs(ref - got).max() / scale
        for label, fn in (("xla", xla_conv), ("winograd", _winograd_conv)):
            dt = _time_chained(fn, x, wgt)
            print(
                f"wino {name:<4} {label:<9} {dt * 1e3:7.3f} ms  "
                f"{flops / dt / 1e12:6.1f} TFLOP/s(direct-equiv)"
                + (f"  relerr={relerr:.2e}" if label == "winograd" else ""),
                flush=True,
            )


def winograd_pallas_bench():
    """In-VMEM Pallas Winograd F(2x2,3x3) vs the direct Pallas band conv
    and the XLA emitter, chained slopes at the production level shapes.
    Decision threshold (round 3): ship-path integration only if the
    Winograd form beats spatial_conv3x3 by >=25% at L0/L1 (the in-chain
    inversion lesson: small standalone wins do not survive)."""
    from v2a_tpu.ops.resblock_kernels import spatial_conv3x3, winograd_conv3x3

    shapes = [
        ("L0", 56, 128, 128, 128),
        ("L1", 56, 64, 64, 256),
        ("L2", 56, 32, 32, 384),
    ]
    for name, n, h, w, c in shapes:
        x = jax.random.normal(jax.random.PRNGKey(0), (n, h, w, c), jnp.bfloat16)
        wgt = jax.random.normal(
            jax.random.PRNGKey(1), (3, 3, c, c), jnp.bfloat16
        ) * 0.02
        bias = jnp.zeros((c,), jnp.float32)
        flops = 2 * 9 * c * c * h * w * n

        def xla_conv(x, wgt):
            return jax.lax.conv_general_dilated(
                x, wgt, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        def pallas_direct(x, wgt):
            return spatial_conv3x3(x, wgt, bias)

        def pallas_wino(x, wgt):
            return winograd_conv3x3(x, wgt, bias)

        # numerics sanity once per shape (bf16 tolerance)
        ref = np.asarray(xla_conv(x, wgt), np.float32)
        got = np.asarray(pallas_wino(x, wgt), np.float32)
        relerr = np.abs(ref - got).max() / (np.abs(ref).max() + 1e-6)
        for label, fn in (
            ("xla", xla_conv), ("direct", pallas_direct), ("wino", pallas_wino)
        ):
            dt = _time_chained(fn, x, wgt)
            print(
                f"winop {name:<4} {label:<7} {dt * 1e3:7.3f} ms  "
                f"{flops / dt / 1e12:6.1f} TF/s(direct-equiv)"
                + (f"  relerr={relerr:.2e}" if label == "wino" else ""),
                flush=True,
            )


def tconv_bench():
    """Temporal conv formulations at every U-Net level shape: the transpose+
    conv1d production path vs the Pallas in-layout kernel (with and without
    fused emb/stats)."""
    from flax import linen as nn

    from v2a_tpu.ops.resblock_kernels import temporal_conv_fused

    shapes = [
        ("L0", 8, 7, 128, 128, 128),
        ("L1", 8, 7, 64, 64, 256),
        ("L2", 8, 7, 32, 32, 384),
        ("L3", 8, 7, 16, 16, 512),
        ("L4", 8, 7, 8, 8, 640),
    ]
    for name, b, f, h, w, c in shapes:
        x = jax.random.normal(
            jax.random.PRNGKey(0), (b, f, h, w, c), jnp.bfloat16
        )
        kernel = jax.random.normal(jax.random.PRNGKey(1), (3, c, c)) * 0.05
        bias = jnp.zeros((c,))
        emb = jax.random.normal(jax.random.PRNGKey(2), (b, c))
        conv = nn.Conv(c, (3,), padding=1, dtype=jnp.bfloat16)
        cparams = {"params": {"kernel": kernel, "bias": bias}}
        flops = 2 * 3 * c * c * h * w * b * f

        def transpose_form(x, _):
            t = x.transpose(0, 2, 3, 1, 4).reshape(b * h * w, f, c)
            t = conv.apply(cparams, t)
            return t.reshape(b, h, w, f, c).transpose(0, 3, 1, 2, 4)

        def pallas_form(x, _):
            return temporal_conv_fused(x, kernel, bias)

        def pallas_full(x, _):
            y, _stats = temporal_conv_fused(
                x, kernel, bias, emb=emb, want_stats=True
            )
            return y

        def conv2d_form(x, _):
            t = x.reshape(b, f, h * w, c)
            y = jax.lax.conv_general_dilated(
                t, kernel.reshape(3, 1, c, c).astype(jnp.bfloat16),
                (1, 1), [(1, 1), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return (y + bias.astype(jnp.bfloat16)).reshape(b, f, h, w, c)

        def conv2d_full(x, _):
            t = x.reshape(b, f, h * w, c)
            y = jax.lax.conv_general_dilated(
                t, kernel.reshape(3, 1, c, c).astype(jnp.bfloat16),
                (1, 1), [(1, 1), (0, 0)],
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            y = y + bias.astype(jnp.bfloat16) + emb[:, None, None, :].astype(
                jnp.bfloat16
            )
            yf = y.astype(jnp.float32)
            stats = jnp.stack([yf.sum(axis=2), (yf * yf).sum(axis=2)], axis=2)
            # keep the stats live without folding to a no-op
            y = y + (1e-30 * stats[:, :, :1, :]).astype(y.dtype)
            return y.reshape(b, f, h, w, c)

        for label, fn in (
            ("transpose", transpose_form),
            ("pallas", pallas_form),
            ("pallas+es", pallas_full),
            ("conv2d", conv2d_form),
            ("conv2d+es", conv2d_full),
        ):
            dt = _time_chained(fn, x, jnp.zeros(()))
            print(
                f"tconv {name:<4} {label:<10} {dt * 1e3:7.3f} ms  "
                f"{flops / dt / 1e12:6.1f} TFLOP/s", flush=True,
            )


def tconv_variants_bench():
    """Kernel-shape experiments for the temporal conv: the production
    per-frame concat form vs (a) one (F*tile, 3C) gemm per block, (b) three
    per-tap dots, (c) bigger tiles — hunting the 29-vs-117 TFLOP/s gap."""
    import functools

    from jax.experimental import pallas as pl

    shapes = [
        ("L0", 8, 7, 128 * 128, 128),
        ("L1", 8, 7, 64 * 64, 256),
        ("L4", 8, 7, 64, 640),
    ]

    def make_call(impl, tile, b, f, s, c):
        def kernel(x_ref, w_ref, o_ref):
            x = x_ref[0]  # (F, tile, C)
            w = w_ref[:]
            zeros = jnp.zeros((1,) + x.shape[1:], x.dtype)
            if impl == "all_frames":
                xm1 = jnp.concatenate([zeros, x[:-1]], axis=0)
                xp1 = jnp.concatenate([x[1:], zeros], axis=0)
                cat = jnp.concatenate([xm1, x, xp1], axis=-1).reshape(
                    f * tile, 3 * c
                )
                y = jax.lax.dot_general(
                    cat, w, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                o_ref[0] = y.reshape(f, tile, c).astype(o_ref.dtype)
            elif impl == "taps":
                w0, w1, w2 = w[:c], w[c:2 * c], w[2 * c:]
                for fi in range(f):
                    acc = jax.lax.dot_general(
                        x[fi], w1, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    if fi > 0:
                        acc += jax.lax.dot_general(
                            x[fi - 1], w0, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    if fi < f - 1:
                        acc += jax.lax.dot_general(
                            x[fi + 1], w2, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                    o_ref[0, fi] = acc.astype(o_ref.dtype)
            else:  # frame_concat (production)
                z2 = jnp.zeros(x.shape[1:], x.dtype)
                for fi in range(f):
                    xm1 = x[fi - 1] if fi > 0 else z2
                    xp1 = x[fi + 1] if fi < f - 1 else z2
                    cat = jnp.concatenate([xm1, x[fi], xp1], axis=-1)
                    y = jax.lax.dot_general(
                        cat, w, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                    o_ref[0, fi] = y.astype(o_ref.dtype)

        n_tiles = s // tile
        return pl.pallas_call(
            kernel,
            grid=(b, n_tiles),
            in_specs=[
                pl.BlockSpec((1, f, tile, c), lambda i, j: (i, 0, j, 0)),
                pl.BlockSpec((3 * c, c), lambda i, j: (0, 0)),
            ],
            out_specs=pl.BlockSpec((1, f, tile, c), lambda i, j: (i, 0, j, 0)),
            out_shape=jax.ShapeDtypeStruct((b, f, s, c), jnp.bfloat16),
        )

    for name, b, f, s, c in shapes:
        x = jax.random.normal(jax.random.PRNGKey(0), (b, f, s, c), jnp.bfloat16)
        w = (jax.random.normal(jax.random.PRNGKey(1), (3 * c, c)) * 0.05
             ).astype(jnp.bfloat16)
        flops = 2 * 3 * c * c * s * b * f
        base_tile = min(s, max(1024 * 1024 // (c * 2 * f), 8))
        # round to power of two dividing s
        t = 1
        while t * 2 <= base_tile and s % (t * 2) == 0:
            t *= 2
        for impl, tile in (
            ("frame_concat", t),
            ("all_frames", t),
            ("taps", t),
            ("all_frames", min(t * 2, s)),
            ("all_frames", min(t * 4, s)),
        ):
            if s % tile:
                continue
            try:
                call = make_call(impl, tile, b, f, s, c)
                dt = _time_chained(lambda y, _: call(y, w), x, jnp.zeros(()))
                print(
                    f"tconv2 {name} {impl:<13} tile={tile:<6}"
                    f" {dt * 1e3:7.3f} ms  {flops / dt / 1e12:6.1f} TFLOP/s",
                    flush=True,
                )
            except Exception as e:
                print(f"tconv2 {name} {impl} tile={tile} FAILED: "
                      f"{str(e)[:120]}", flush=True)


def trace_forward(fused=True, topk=30):
    """Capture an xplane trace of one U-Net forward and print the ops with
    the largest total device time (the round-1 GN-layout fix came from this
    view, PERF.md)."""
    unet = build(fused=fused)
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

    def run_once():
        np.asarray(checksum(fwd(params, x, t, e)))

    _trace_rollup(run_once, topk=topk)


def trace_chain(steps=20, topk=30):
    """Trace the HEADLINE program — the scanned DDIM chain exactly as
    bench.py compiles it (batch 8, bf16, shipped kernel defaults) — and
    print per-STEP device attribution (ms divided by `steps`).

    Round-3 lesson: standalone one-forward numbers (trace_forward and the
    raw-ms sweeps) do not predict in-chain behavior — tap-join won 8.7 ms
    standalone and lost 1.6 ms in-chain. Kernel decisions should be read
    off this view.
    """
    from v2a_tpu.ops.gaussian_diffusion import GaussianDiffusion
    from v2a_tpu.ops.schedules import DiffusionSchedule

    unet = build(fused=True)
    hw = HW if jax.devices()[0].platform != "cpu" else 32
    x_probe = jnp.zeros((1, FRAMES, hw, hw, 6))
    shapes = jax.eval_shape(
        lambda r: unet.init(
            r, x_probe, jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, TOKENS, 512)),
        ),
        jax.random.PRNGKey(0),
    )
    rngs = iter(jax.random.split(jax.random.PRNGKey(0), 10_000))
    params = jax.tree_util.tree_map(
        lambda s: jax.random.normal(next(rngs), s.shape, s.dtype) * 0.02,
        shapes,
    )
    default_unroll = "1" if video_unet.PERF_PADDED_STREAM else "4"
    diffusion = GaussianDiffusion(
        schedule=DiffusionSchedule.create(100, "cosine"),
        objective="pred_v", sampling_timesteps=steps,
        scan_unroll=int(os.environ.get("V2A_SCAN_UNROLL", default_unroll)),
    )
    rng = jax.random.PRNGKey(42)
    x_cond = jax.random.uniform(rng, (BATCH, 1, hw, hw, 3)) * 2.0 - 1.0
    task_embed = jax.random.normal(rng, (BATCH, TOKENS, 512)) * 0.1

    @jax.jit
    def sample(params, rng):
        return diffusion.sample(
            lambda x, t, e: unet.apply(params, x, t, e),
            rng, (BATCH, FRAMES, hw, hw, 3), x_cond, task_embed,
        )

    checksum = jax.jit(jnp.sum)

    def run_once():
        np.asarray(checksum(sample(params, rng)))

    _trace_rollup(run_once, topk=topk, per_run=steps, runs=1)


def trace_train(topk=30, chain=0):
    """xplane trace of the fused policy train step (bench_train's program).

    With chain=N > 0, traces a lax.scan of N sequential steps in ONE
    compiled program (bench_train's round-3 chained methodology) — the
    per-step device profile without the axon tunnel's per-dispatch gaps;
    printed ms are divided by N to stay per-step.
    """
    from v2a_tpu.models.policy import DiffusionPolicy, PolicyConfig
    from v2a_tpu.train.train_state import (
        EMAConfig, OptimizerConfig, TrainState, make_optimizer,
        make_train_step,
    )

    cfg = PolicyConfig(dtype="bfloat16")
    batch = 64
    policy = DiffusionPolicy.create(cfg)
    params = policy.init(jax.random.PRNGKey(0))
    tx = make_optimizer(OptimizerConfig())
    state = TrainState.create(params, tx)
    train_step = make_train_step(policy.loss, tx, EMAConfig())
    h, w = cfg.image_size
    rs = np.random.RandomState(0)
    batch_data = {
        "obs": {
            k: jnp.asarray(rs.rand(batch, h, w, 3), jnp.float32)
            for k in cfg.obs_keys
        },
        "action": jnp.asarray(
            rs.uniform(-1, 1, (batch, cfg.horizon, cfg.action_dim)),
            jnp.float32,
        ),
    }
    rng = jax.random.PRNGKey(1)

    if chain:
        n = int(chain)

        def chained(st, key, batch_const):
            def body(carry, i):
                out = train_step(carry, jax.random.fold_in(key, i), batch_const)
                return out.state, out.loss

            st, losses = jax.lax.scan(body, st, jnp.arange(n))
            return st, losses[-1]

        chain_fn = jax.jit(chained, donate_argnums=(0,))
        holder = {"state": state}

        def run_once():
            holder["state"], loss = chain_fn(holder["state"], rng, batch_data)
            np.asarray(loss)

        _trace_rollup(run_once, topk=topk, per_run=n)
        return

    step = jax.jit(train_step)

    def run_once():
        _s, loss, _g = step(state, rng, batch_data)
        np.asarray(loss)

    _trace_rollup(run_once, topk=topk)


def trace_vtrain(topk=40, batch=4, policy="off", chain=3):
    """xplane trace of the release-size VIDEO train step
    (bench_video_train's exact program: pred_v p_losses fwd+bwd + fused
    clip+AdamW + EMA, plain-XLA U-Net — the training path of
    `v2a_tpu/train/video_trainer.py`). VERDICT round-4 ask #2: attribute
    the 302 ms/step at B=4 against the ~129 ms fwd+bwd FLOP floor with the
    same per-bucket rigor the sampler got."""
    import importlib.util

    # main() zeroes the spatial2 flags for the forward ablations; the
    # TRAIN trace must run the shipped eligibility (the train_fused
    # routing shares `_spatial2_eligible` — with MIN_CH=0 every level
    # silently falls back to the plain path and the trace measures the
    # wrong program)
    video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = int(
        os.environ.get("V2A_SPATIAL2_MIN_CH", "128"))
    video_unet.PERF_PALLAS_SPATIAL2_MAX_S = int(
        os.environ.get("V2A_SPATIAL2_MAX_S", "16384"))
    video_unet.PERF_SKIP1X1_DOT = (
        os.environ.get("V2A_SKIP1X1_DOT", "1") == "1")

    spec = importlib.util.spec_from_file_location(
        "bench_video_train",
        os.path.join(os.path.dirname(os.path.abspath(__file__)),
                     "bench_video_train.py"),
    )
    bvt = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bvt)

    train_fused, use_ckpt, remat = bvt.parse_policy(policy)
    chain_fn, state, batch_data = bvt.build_step(
        use_ckpt, batch, 128, 128, chain,
        remat_policy=remat if use_ckpt else "blocks",
        train_fused=train_fused,
    )
    rng = jax.random.PRNGKey(1)
    holder = {"state": state}

    def run_once():
        holder["state"], loss = chain_fn(holder["state"], rng, batch_data)
        np.asarray(loss)

    _trace_rollup(run_once, topk=topk, per_run=chain, runs=1)


def _trace_rollup(run_once, topk=30, per_run=1, runs=3):
    div = runs * per_run
    import glob
    import tempfile

    run_once()  # compile

    logdir = tempfile.mkdtemp(prefix="v2a_trace_")
    with jax.profiler.trace(logdir):
        for _ in range(runs):
            run_once()

    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    files = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
    totals = {}
    line_totals = {}
    line_ops = {}
    for fname in files:
        xs = xplane_pb2.XSpace()
        with open(fname, "rb") as f:
            xs.ParseFromString(f.read())
        for plane in xs.planes:
            if "TPU" not in plane.name and "tpu" not in plane.name:
                continue
            ev_names = {k: v.name for k, v in plane.event_metadata.items()}
            for line in plane.lines:
                for ev in line.events:
                    name = ev_names.get(ev.metadata_id, "?")
                    totals[name] = totals.get(name, 0) + ev.duration_ps
                    line_totals[line.name] = (
                        line_totals.get(line.name, 0) + ev.duration_ps
                    )
                    ops = line_ops.setdefault(line.name, {})
                    ops[name] = ops.get(name, 0) + ev.duration_ps
    ranked = sorted(totals.items(), key=lambda kv: -kv[1])[:topk]
    total_ms = sum(totals.values()) / 1e9 / div
    print(f"trace: {len(totals)} distinct ops, {total_ms:.1f} ms "
          f"summed/fwd (overlaps double-count)")
    for name, ps in ranked:
        print(f"  {ps / 1e9 / div:8.2f} ms  {name[:110]}")
    # per-line view: the compute line's sum approximates wall time; DMA
    # lines overlap it. Top ops of each busy line, copies separated.
    print("-- per-line totals (ms/fwd) --")
    for lname, ps in sorted(line_totals.items(), key=lambda kv: -kv[1]):
        print(f"  {ps / 1e9 / div:8.1f}  {lname}")
    for lname, ps in sorted(line_totals.items(), key=lambda kv: -kv[1])[:4]:
        print(f"-- top ops on line '{lname}' --")
        for name, p in sorted(
            line_ops[lname].items(), key=lambda kv: -kv[1]
        )[:15]:
            print(f"  {p / 1e9 / div:8.2f} ms  {name[:100]}")

    # grouped serialized-line view: ops on the compute line ("XLA Ops")
    # summed by cleaned name (strip %, the "= ..." tail, and trailing .N) —
    # the custom-call names carry the originating module path, so this
    # attributes device time to components directly
    import re as _re

    busy = [ln for ln in line_totals
            if "Async" not in ln and ln not in ("XLA Modules", "Steps")]
    if busy:
        lname = max(busy, key=lambda ln: line_totals[ln])
        groups = {}
        for name, p in line_ops[lname].items():
            g = name.lstrip("%").split(" = ")[0]
            g = _re.sub(r"\.\d+$", "", g)
            groups[g] = groups.get(g, 0) + p
        print(f"-- grouped ops on line '{lname}' (ms/fwd) --")
        for g, p in sorted(groups.items(), key=lambda kv: -kv[1])[:40]:
            print(f"  {p / 1e9 / div:8.2f} ms  {g[:100]}")

    # category rollup: convs / pallas kernels / pure-relayout fusions /
    # other fusions / async copies
    import re

    cats = {}
    relayout_re = re.compile(
        r"fusion\([^)]*\{([\d,]+):"  # input layout
    )
    for name, ps in totals.items():
        ms = ps / 1e9 / div
        if "convolution" in name or "conv_general" in name:
            cat = "convolution"
        elif "temporal_conv_fused" in name or "tconv" in name:
            cat = "pallas_tconv"
        elif "group_norm" in name or "_stats_kernel" in name or "_apply_kernel" in name:
            cat = "pallas_gn"
        elif name.startswith("%copy") or "copy-start" in name or "copy-done" in name:
            cat = "copies(async,overlapped)"
        elif "fusion" in name:
            m_out = re.search(r"= \S+\{([\d,]+)", name)
            m_in = relayout_re.search(name)
            if (
                m_out and m_in and m_out.group(1) != m_in.group(1)
                and ".kind=kLoop" not in name
            ):
                cat = "fusion(layout-change)"
            else:
                cat = "fusion(other)"
        elif "slice" in name or "dynamic" in name:
            cat = "slice/dus"
        elif name.startswith("jit_"):
            cat = "TOTAL(jit)"
        else:
            cat = "misc"
        cats[cat] = cats.get(cat, 0.0) + ms
    print("-- category rollup (ms/fwd, overlaps double-count) --")
    for cat, ms in sorted(cats.items(), key=lambda kv: -kv[1]):
        print(f"  {ms:8.1f}  {cat}")


def main():
    known_ablate = ["base", "no_attn", "no_temporal", "no_gn", "conv_only"]
    want = sys.argv[1:] or known_ablate
    results = {}
    # zero the default-on perf flags so each variant measures exactly what
    # its name says; "fused_default" measures the shipped defaults
    defaults = (
        video_unet.PERF_PALLAS_SPATIAL2_MIN_CH, video_unet.PERF_SKIP1X1_DOT,
        video_unet.PERF_PALLAS_SPATIAL2_MAX_S,
    )
    video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = 0
    video_unet.PERF_SKIP1X1_DOT = False
    video_unet.PERF_PALLAS_SPATIAL2_MAX_S = 512
    for name in want:
        if name == "convbench":
            conv_bench()
            continue
        if name == "affconvbench":
            affconv_bench()
            continue
        if name == "dotbench":
            dot_ceiling_bench()
            continue
        if name.startswith("trace_vtrain"):
            # e.g. trace_vtrain:4:off or trace_vtrain:8:blocks
            parts = name.split(":")
            trace_vtrain(
                batch=int(parts[1]) if len(parts) > 1 else 4,
                policy=parts[2] if len(parts) > 2 else "off",
            )
            continue
        if name.startswith("trace_chain:"):
            # finer top-k, e.g. trace_chain:120 to split the fusion bucket
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = defaults[0]
            video_unet.PERF_SKIP1X1_DOT = defaults[1]
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S = defaults[2]
            trace_chain(topk=int(name.split(":")[1]))
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = 0
            video_unet.PERF_SKIP1X1_DOT = False
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S = 512
            continue
        if name == "megabench":
            mega_bench()
            continue
        if name.startswith("megabench:"):
            # e.g. megabench:L1 — one level only
            lv = {"L0": ("L0", 128, 128), "L1": ("L1", 64, 256),
                  "L2": ("L2", 32, 384)}[name.split(":")[1]]
            mega_bench(levels=[lv])
            continue
        if name == "winobench":
            winograd_bench()
            continue
        if name == "winobench2":
            winograd_pallas_bench()
            continue
        if name == "tconvbench":
            tconv_bench()
            continue
        if name == "tconvbench2":
            tconv_variants_bench()
            continue
        if name in ("trace", "trace_base"):
            trace_forward(fused=name == "trace")
            continue
        if name == "trace_sp2":
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = 512
            trace_forward(fused=True)
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = 0
            continue
        if name == "trace_train":
            trace_train()
            continue
        if name == "trace_train_chain":
            trace_train(chain=20)
            continue
        if name == "trace_chain":
            # the HEADLINE program under the shipped defaults
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = defaults[0]
            video_unet.PERF_SKIP1X1_DOT = defaults[1]
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S = defaults[2]
            trace_chain()
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = 0
            video_unet.PERF_SKIP1X1_DOT = False
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S = 512
            continue
        if name == "trace_default":
            # the shipped defaults (all-level banded + dot1x1)
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = defaults[0]
            video_unet.PERF_SKIP1X1_DOT = defaults[1]
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S = defaults[2]
            trace_forward(fused=True)
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = 0
            video_unet.PERF_SKIP1X1_DOT = False
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S = 512
            continue
        if name == "fused":
            results[name] = time_forward(build(fused=True), name)
            continue
        if name.startswith("fused_join_"):
            # V2A_TAPJOIN wide-dot restructurings under shipped defaults
            from v2a_tpu.ops import resblock_kernels as rbk

            old_tj = rbk.TAPJOIN
            rbk.TAPJOIN = name[len("fused_join_"):]
            jax.clear_caches()
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = defaults[0]
            video_unet.PERF_SKIP1X1_DOT = defaults[1]
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S = defaults[2]
            results[name] = time_forward(build(fused=True), name)
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = 0
            video_unet.PERF_SKIP1X1_DOT = False
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S = 512
            rbk.TAPJOIN = old_tj
            jax.clear_caches()
            continue
        if name == "default_noattn":
            # shipped defaults with attention removed: attention's share
            # UNDER the padded/mega kernels (the round-2 5.4 ms figure
            # predates them)
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = defaults[0]
            video_unet.PERF_SKIP1X1_DOT = defaults[1]
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S = defaults[2]
            results[name] = time_forward(build(attn=(), fused=True), name)
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = 0
            video_unet.PERF_SKIP1X1_DOT = False
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S = 512
            continue
        if name == "fused_default":
            # the shipped TPU defaults (spatial2 + dot1x1 per env)
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = defaults[0]
            video_unet.PERF_SKIP1X1_DOT = defaults[1]
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S = defaults[2]
            results[name] = time_forward(build(fused=True), name)
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = 0
            video_unet.PERF_SKIP1X1_DOT = False
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S = 512
            continue
        if name == "fused_attn":
            # shipped defaults + the one-kernel padded spatial attention
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = defaults[0]
            video_unet.PERF_SKIP1X1_DOT = defaults[1]
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S = defaults[2]
            video_unet.PERF_PALLAS_ATTN = True
            results[name] = time_forward(build(fused=True), name)
            video_unet.PERF_PALLAS_ATTN = False
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = 0
            video_unet.PERF_SKIP1X1_DOT = False
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S = 512
            continue
        if name == "fused_mega":
            # padded stream + the conv+tconv mega-kernel
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = defaults[0]
            video_unet.PERF_SKIP1X1_DOT = defaults[1]
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S = defaults[2]
            video_unet.PERF_PADDED_STREAM = True
            video_unet.PERF_MEGA_KERNEL = True
            results[name] = time_forward(build(fused=True), name)
            video_unet.PERF_MEGA_KERNEL = False
            video_unet.PERF_PADDED_STREAM = False
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = 0
            video_unet.PERF_SKIP1X1_DOT = False
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S = 512
            continue
        if name == "fused_stream":
            # padded + upconv + frame-streaming mega-kernel
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = defaults[0]
            video_unet.PERF_SKIP1X1_DOT = defaults[1]
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S = defaults[2]
            video_unet.PERF_PADDED_STREAM = True
            video_unet.PERF_MEGA_KERNEL = True
            video_unet.PERF_UPCONV = True
            video_unet.PERF_STREAM_KERNEL = True
            results[name] = time_forward(build(fused=True), name)
            video_unet.PERF_STREAM_KERNEL = False
            video_unet.PERF_UPCONV = False
            video_unet.PERF_MEGA_KERNEL = False
            video_unet.PERF_PADDED_STREAM = False
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = 0
            video_unet.PERF_SKIP1X1_DOT = False
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S = 512
            continue
        if name == "fused_upconv":
            # padded + mega + collapsed-parity upsample convs
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = defaults[0]
            video_unet.PERF_SKIP1X1_DOT = defaults[1]
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S = defaults[2]
            video_unet.PERF_PADDED_STREAM = True
            video_unet.PERF_MEGA_KERNEL = True
            video_unet.PERF_UPCONV = True
            results[name] = time_forward(build(fused=True), name)
            video_unet.PERF_UPCONV = False
            video_unet.PERF_MEGA_KERNEL = False
            video_unet.PERF_PADDED_STREAM = False
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = 0
            video_unet.PERF_SKIP1X1_DOT = False
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S = 512
            continue
        if name == "fused_padded":
            # shipped defaults + the padded-stream layout (L0-L2 pads
            # eliminated; see PERF_PADDED_STREAM)
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = defaults[0]
            video_unet.PERF_SKIP1X1_DOT = defaults[1]
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S = defaults[2]
            video_unet.PERF_PADDED_STREAM = True
            results[name] = time_forward(build(fused=True), name)
            video_unet.PERF_PADDED_STREAM = False
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = 0
            video_unet.PERF_SKIP1X1_DOT = False
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S = 512
            continue
        if name.startswith("fused_tbudget_"):
            # shipped defaults with the tconv S-tile VMEM budget overridden
            # (suffix in KB); clears jit caches so the new tile retraces
            from v2a_tpu.ops import resblock_kernels as rbk

            old_budget = rbk.TCONV_TILE_BUDGET
            rbk.TCONV_TILE_BUDGET = int(name[len("fused_tbudget_"):]) * 1024
            jax.clear_caches()
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = defaults[0]
            video_unet.PERF_SKIP1X1_DOT = defaults[1]
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S = defaults[2]
            results[name] = time_forward(build(fused=True), name)
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = 0
            video_unet.PERF_SKIP1X1_DOT = False
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S = 512
            rbk.TCONV_TILE_BUDGET = old_budget
            jax.clear_caches()
            continue
        if name.startswith("fused_spatial2_"):
            # deep-level fused affine+SiLU+3x3 Pallas conv for levels with
            # features >= N (e.g. fused_spatial2_512 = L3+L4)
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = int(
                name[len("fused_spatial2_"):]
            )
            results[name] = time_forward(build(fused=True), name)
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = 0
            continue
        if name.startswith("fused_sp2dot_"):
            # spatial2 deep conv + 1x1 skip convs as dots
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = int(
                name[len("fused_sp2dot_"):]
            )
            video_unet.PERF_SKIP1X1_DOT = True
            results[name] = time_forward(build(fused=True), name)
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = 0
            video_unet.PERF_SKIP1X1_DOT = False
            continue
        if name.startswith("fused_sp2all"):
            # banded Pallas conv everywhere (+ whole-frame at deep levels)
            suffix = name[len("fused_sp2all"):]
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = int(suffix) if suffix else 128
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S = 16384
            video_unet.PERF_SKIP1X1_DOT = True
            results[name] = time_forward(build(fused=True), name)
            video_unet.PERF_PALLAS_SPATIAL2_MIN_CH = 0
            video_unet.PERF_PALLAS_SPATIAL2_MAX_S = 512
            video_unet.PERF_SKIP1X1_DOT = False
            continue
        if name == "fused_dot1x1":
            video_unet.PERF_SKIP1X1_DOT = True
            results[name] = time_forward(build(fused=True), name)
            video_unet.PERF_SKIP1X1_DOT = False
            continue
        if name.startswith("fused_xla2d"):
            # temporal conv as an XLA (3,1)-kernel 2D conv when H*W >= N
            # (suffix; default 1 = everywhere) — zero Pallas boundaries
            suffix = name[len("fused_xla2d"):]
            video_unet.PERF_TCONV_XLA2D_MIN_S = int(suffix) if suffix else 1
            results[name] = time_forward(build(fused=True), name)
            video_unet.PERF_TCONV_XLA2D_MIN_S = 0
            continue
        if name == "fused_im2col":
            video_unet.PERF_SPATIAL_IM2COL = True
            results[name] = time_forward(build(fused=True), name)
            video_unet.PERF_SPATIAL_IM2COL = False
            continue
        if name == "fused_hw":
            video_unet.PERF_TCONV_HW = True
            results[name] = time_forward(build(fused=True), name)
            video_unet.PERF_TCONV_HW = False
            continue
        if name == "fused_spatial":
            video_unet.PERF_PALLAS_SPATIAL = True
            results[name] = time_forward(build(fused=True), name)
            video_unet.PERF_PALLAS_SPATIAL = False
            continue
        if name.startswith("fused_min"):
            video_unet.PERF_FUSED_MIN_CH = int(name[len("fused_min"):])
            results[name] = time_forward(build(fused=True), name)
            video_unet.PERF_FUSED_MIN_CH = 0
            continue
        if name == "base_im2col":
            video_unet.PERF_SPATIAL_IM2COL = True
            results[name] = time_forward(build(), name)
            video_unet.PERF_SPATIAL_IM2COL = False
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
