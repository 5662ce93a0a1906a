"""On-chip numerical parity gate for the fused/padded Pallas path.

All Pallas equivalence tests run in interpret mode on CPU
(`tests/test_pallas_kernels.py`); Mosaic-COMPILED numerics — in
particular the padded-stream "pad ROWS are garbage by contract; every
consumer must mask" invariant (PERF.md round-2c) — were previously only
validated indirectly by the bench producing plausible numbers. One missed
consumer of a garbage row would silently corrupt every sampled video on
TPU while all CPU tests stay green. This script closes that hole: it runs
the FULL-SIZE video U-Net forward on the real chip under each kernel
configuration on identical inputs/params and asserts bf16-level
closeness against the plain XLA path, then runs the full DDIM-100
sampling chain per config and checks the sampled videos stay mutually
close (the chain is a contraction toward the same data manifold, so
implementation-level bf16 noise must stay bounded — pad-row corruption
would blow the frames apart or NaN them).

Record the PASS line + max errors in PERF.md each round.

Usage:
    python scripts/verify_onchip.py            # orchestrates subprocesses
    python scripts/verify_onchip.py --worker OUT.npz   # one config (env set)

The perf flags are read at `v2a_tpu.models.video_unet` import time, so
each configuration runs in its own subprocess.
"""

import argparse
import json
import os
import subprocess
import sys
import tempfile

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
if REPO not in sys.path:
    sys.path.insert(0, REPO)

# name -> env overrides; "unfused" is the ground truth (plain XLA convs,
# no Pallas anywhere in the forward)
CONFIGS = {
    "unfused": {"V2A_FUSED": "0", "V2A_PADDED_STREAM": "0"},
    "fused_nopad": {"V2A_FUSED": "1", "V2A_PADDED_STREAM": "0"},
    # shipped defaults: fused + padded stream + mega + upconv + per-tap
    # dots + XLA attention (the chain-fastest config, PERF.md)
    "default": {},
    # frame-folded tap-join variant (available via V2A_TAPJOIN; keep gated)
    "tapjoin_f": {"V2A_TAPJOIN": "f"},
    # fused spatial attention ON (gated experiment; default is the XLA
    # attention — the kernel loses 4.6 ms/fwd in-chain, PERF.md round 3)
    "pallas_attn": {"V2A_PALLAS_ATTN": "1"},
}

BATCH = 8  # production operating point: kernel/band selection depends on it
FRAMES = 7
HW = 128
TOKENS = 16


def build(seed=0):
    import jax
    import jax.numpy as jnp

    from v2a_tpu.models.video_unet import VideoUNet

    on_tpu = jax.devices()[0].platform != "cpu"
    fused = os.environ.get("V2A_FUSED", "1") == "1"
    unet = VideoUNet(
        in_channels=6, model_channels=128, out_channels=3, num_res_blocks=2,
        attention_resolutions=(8, 16), channel_mult=(1, 2, 3, 4, 5),
        num_head_channels=32, task_token_dim=512,
        dtype=jnp.bfloat16 if on_tpu else jnp.float32, fused=fused,
    )
    x_probe = jnp.zeros((1, FRAMES, HW, HW, 6))
    shapes = jax.eval_shape(
        lambda r: unet.init(
            r, x_probe, jnp.zeros((1,), jnp.int32), jnp.zeros((1, TOKENS, 512))
        ),
        jax.random.PRNGKey(seed),
    )
    rngs = iter(jax.random.split(jax.random.PRNGKey(seed), 10_000))
    params = jax.tree_util.tree_map(
        lambda s: (jax.random.normal(next(rngs), s.shape, s.dtype) * 0.02),
        shapes,
    )
    return unet, params


def worker(out_path):
    import jax
    import jax.numpy as jnp

    from v2a_tpu.ops.gaussian_diffusion import GaussianDiffusion
    from v2a_tpu.ops.schedules import DiffusionSchedule

    unet, params = build()
    rng = jax.random.PRNGKey(1234)
    x = jax.random.normal(rng, (BATCH, FRAMES, HW, HW, 6), jnp.float32) * 0.5
    t = jnp.arange(BATCH, dtype=jnp.int32) * 12  # spread over the schedule
    emb = jax.random.normal(jax.random.fold_in(rng, 1),
                            (BATCH, TOKENS, 512)) * 0.1

    fwd = jax.jit(lambda p, x, t, e: unet.apply(p, x, t, e))
    y = np.asarray(fwd(params, x, t, emb), np.float32)

    diffusion = GaussianDiffusion(
        schedule=DiffusionSchedule.create(100, "cosine"),
        objective="pred_v", sampling_timesteps=100,
    )

    @jax.jit
    def sample(params, rng, x_cond, task_embed):
        return diffusion.sample(
            lambda x, t, e: unet.apply(params, x, t, e),
            rng, (BATCH, FRAMES, HW, HW, 3), x_cond, task_embed,
        )

    x_cond = (jax.random.uniform(jax.random.fold_in(rng, 2),
                                 (BATCH, 1, HW, HW, 3)) * 2.0 - 1.0)
    video = np.asarray(sample(params, jax.random.fold_in(rng, 3),
                              x_cond, emb), np.float32)
    np.savez(out_path, fwd=y, video=video)
    print(f"[worker] wrote {out_path}: fwd std={y.std():.4f} "
          f"video mean={video.mean():.4f} std={video.std():.4f}")


def verify_train():
    """Round-4 extension (VERDICT item 7): gate OPTIMIZER numerics on the
    real chip the way kernel numerics are gated. Grads are computed once
    on-chip from the release-shape policy loss, then three sequential
    clip+AdamW+EMA updates run (a) via the shipped `fused_clip_adamw`,
    (b) via the reference `optax.chain(clip_by_global_norm, adamw)`, and
    (c) via a host float64 re-implementation on the identical grads.
    (a) and (b) must agree to f32 round-off; both must track (c)."""
    import jax
    import jax.numpy as jnp
    import optax

    from v2a_tpu.models.policy import DiffusionPolicy, PolicyConfig
    from v2a_tpu.train.train_state import (
        OptimizerConfig, fused_clip_adamw,
    )

    on_tpu = jax.devices()[0].platform != "cpu"
    pcfg = PolicyConfig(dtype="bfloat16" if on_tpu else "float32")
    policy = DiffusionPolicy.create(pcfg)
    params = policy.init(jax.random.PRNGKey(0))
    ocfg = OptimizerConfig()

    batch = 16
    h, w = pcfg.image_size
    rs = np.random.RandomState(0)
    batch_data = {
        "obs": {
            k: jnp.asarray(rs.rand(batch, h, w, 3), jnp.float32)
            for k in pcfg.obs_keys
        },
        "action": jnp.asarray(
            rs.uniform(-1, 1, (batch, pcfg.horizon, pcfg.action_dim)),
            jnp.float32,
        ),
    }
    grads = jax.jit(jax.grad(policy.loss))(
        params, jax.random.PRNGKey(1), batch_data
    )
    grads = jax.tree_util.tree_map(np.asarray, grads)
    params_h = jax.tree_util.tree_map(np.asarray, params)

    def run_chip(tx):
        @jax.jit
        def three_steps(params, grads):
            opt_state = tx.init(params)
            for _ in range(3):
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
            return params

        out = three_steps(
            jax.tree_util.tree_map(jnp.asarray, params_h),
            jax.tree_util.tree_map(jnp.asarray, grads),
        )
        return jax.tree_util.tree_map(np.asarray, out)

    fused = run_chip(fused_clip_adamw(ocfg))
    chain = run_chip(optax.chain(
        optax.clip_by_global_norm(ocfg.grad_clip),
        optax.adamw(ocfg.lr, b1=ocfg.b1, b2=ocfg.b2, eps=ocfg.eps,
                    weight_decay=ocfg.weight_decay),
    ))

    # host float64 reference of clip + AdamW, same grads each step
    g_leaves = jax.tree_util.tree_leaves(grads)
    norm = np.sqrt(sum(
        np.square(g.astype(np.float64)).sum() for g in g_leaves
    ))
    scale = min(1.0, ocfg.grad_clip / max(norm, 1e-30))

    def host_ref(p0):
        p = p0.astype(np.float64)
        m = np.zeros_like(p)
        v = np.zeros_like(p)
        return p, m, v

    ref = {}
    flat_p, treedef = jax.tree_util.tree_flatten(params_h)
    flat_g = treedef.flatten_up_to(grads)
    outs = []
    for p0, g0 in zip(flat_p, flat_g):
        p, m, v = host_ref(p0)
        g = g0.astype(np.float64) * scale
        for k in range(1, 4):
            m = ocfg.b1 * m + (1 - ocfg.b1) * g
            v = ocfg.b2 * v + (1 - ocfg.b2) * g * g
            mh = m / (1 - ocfg.b1 ** k)
            vh = v / (1 - ocfg.b2 ** k)
            upd = mh / (np.sqrt(vh) + ocfg.eps) + ocfg.weight_decay * p
            p = p - ocfg.lr * upd
        outs.append(p)
    ref = treedef.unflatten(outs)

    def tree_max_rel(a, b):
        diffs = jax.tree_util.tree_map(
            lambda x, y: float(
                np.abs(np.asarray(x, np.float64) - np.asarray(y, np.float64)).max()
            ),
            a, b,
        )
        return max(jax.tree_util.tree_leaves(diffs))

    # update magnitude per step is ~lr=1e-4; tolerances are relative to it
    d_fused_chain = tree_max_rel(fused, chain)
    d_fused_ref = tree_max_rel(fused, ref)
    passed = d_fused_chain < 1e-6 and d_fused_ref < 3e-6
    print(json.dumps({
        "train_step_optimizer_gate": {
            "fused_vs_optax_chain_max_abs": d_fused_chain,
            "fused_vs_host_f64_max_abs": d_fused_ref,
            "grad_global_norm": float(norm),
            "pass": passed,
        }
    }, indent=2))
    sys.exit(0 if passed else 1)


def verify_train_fused():
    """Round-5 extension: gate the DIFFERENTIABLE fused-conv path
    (`VideoUNet.train_fused` -> ops/conv_vjp.py) on the real chip. The
    CPU tests validate the custom_vjp in interpret mode; Mosaic-compiled
    numerics (and the flipped-weight dgrad kernel) are only exercised
    here. Loss and every parameter gradient of a small-but-eligible
    (128-channel) video U-Net must match the plain-XLA path to
    bf16-formulation tolerance; a pad-row/flip bug would blow the cosine
    or the norm ratio apart."""
    import jax
    import jax.numpy as jnp

    from v2a_tpu.models.video_unet import VideoUNet
    from v2a_tpu.ops.gaussian_diffusion import GaussianDiffusion
    from v2a_tpu.ops.schedules import DiffusionSchedule

    on_tpu = jax.devices()[0].platform != "cpu"
    dt = jnp.bfloat16 if on_tpu else jnp.float32
    kw = dict(
        in_channels=6, model_channels=128, out_channels=3,
        num_res_blocks=2, attention_resolutions=(8,),
        channel_mult=(1, 2), num_head_channels=32,
        task_token_dim=512, dtype=dt, fused=False,
    )
    diffusion = GaussianDiffusion(
        schedule=DiffusionSchedule.create(100, "cosine"),
        objective="pred_v",
    )
    b, f, hw = 2, 3, 32
    rs = np.random.RandomState(0)
    video = jnp.asarray(rs.rand(b, f, hw, hw, 3), jnp.float32)
    x_cond = jnp.asarray(rs.rand(b, 1, hw, hw, 3) * 2 - 1, jnp.float32)
    emb = jnp.asarray(rs.randn(b, 16, 512) * 0.1, jnp.float32)
    t = jnp.asarray([7, 61], jnp.int32)

    def grads_for(train_fused):
        unet = VideoUNet(**kw, train_fused=train_fused)
        params = jax.jit(
            lambda r: unet.init(
                r, jnp.zeros((1, f, hw, hw, 6)),
                jnp.zeros((1,), jnp.int32), jnp.zeros((1, 16, 512)),
            )
        )(jax.random.PRNGKey(0))

        def loss_fn(p):
            return diffusion.p_losses(
                lambda x, tt, e: unet.apply(p, x, tt, e),
                jax.random.PRNGKey(1), video, x_cond, emb, t=t,
            )

        loss, g = jax.jit(jax.value_and_grad(loss_fn))(params)
        return float(loss), jax.tree_util.tree_map(np.asarray, g)

    loss0, g0 = grads_for(False)
    loss1, g1 = grads_for(True)

    worst_cos, worst_leaf, worst_ratio = 1.0, None, 1.0
    for (p0, a), (_, bb) in zip(
        jax.tree_util.tree_leaves_with_path(g0),
        jax.tree_util.tree_leaves_with_path(g1),
    ):
        a = np.asarray(a, np.float64).ravel()
        bb = np.asarray(bb, np.float64).ravel()
        na, nb = np.linalg.norm(a), np.linalg.norm(bb)
        if na < 1e-12 and nb < 1e-12:
            continue
        cos = float(a @ bb / max(na * nb, 1e-30))
        ratio = float(max(na, nb) / max(min(na, nb), 1e-30))
        if cos < worst_cos:
            worst_cos, worst_leaf = cos, jax.tree_util.keystr(p0)
        worst_ratio = max(worst_ratio, ratio)
    dloss = abs(loss0 - loss1) / max(abs(loss0), 1e-9)
    passed = worst_cos > 0.999 and worst_ratio < 1.02 and dloss < 2e-2
    print(json.dumps({
        "train_fused_grad_gate": {
            "loss_plain": loss0, "loss_train_fused": loss1,
            "rel_loss_diff": dloss,
            "worst_grad_cosine": worst_cos, "worst_leaf": worst_leaf,
            "worst_grad_norm_ratio": worst_ratio,
            "pass": passed,
        }
    }, indent=2))
    sys.exit(0 if passed else 1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--worker", default=None)
    ap.add_argument("--train", action="store_true",
                    help="run the train-step optimizer numerics gate only")
    ap.add_argument("--train-fused", action="store_true",
                    help="run the differentiable fused-conv grad gate only")
    args = ap.parse_args()
    if args.worker:
        worker(args.worker)
        return
    if args.train:
        verify_train()
        return
    if args.train_fused:
        verify_train_fused()
        return

    tmp = tempfile.mkdtemp(prefix="verify_onchip_")
    outs = {}
    for name, env in CONFIGS.items():
        out = os.path.join(tmp, f"{name}.npz")
        # APPEND the repo to PYTHONPATH — clobbering it would drop the
        # axon sitecustomize dir and lose the TPU backend registration
        pp = os.environ.get("PYTHONPATH", "")
        child_env = dict(
            os.environ, PYTHONPATH=f"{pp}:{REPO}" if pp else REPO, **env
        )
        print(f"== running config {name} ({env or 'shipped defaults'}) ==",
              flush=True)
        subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--worker", out],
            env=child_env, check=True, cwd=REPO,
        )
        outs[name] = dict(np.load(out))

    ref = outs["unfused"]
    report = {}
    ok = True
    for name in CONFIGS:
        if name == "unfused":
            continue
        got = outs[name]
        # forward: bf16-level closeness, normalized by the output scale.
        # ~25 bf16 layers of re-rounded compute accumulate relative error
        # well past a single bf16 ulp; the gate is against CORRUPTION
        # (a garbage pad row leaking in is O(1) vs the ~0.2 output std),
        # not against bit equality.
        scale = float(ref["fwd"].std())
        err = np.abs(got["fwd"] - ref["fwd"])
        fwd_max = float(err.max()) / scale
        fwd_mean = float(err.mean()) / scale
        # chain: 100 steps amplify bf16 noise; sampled videos from the SAME
        # rng/params must still be finite, in-range, and statistically
        # indistinguishable
        v, vr = got["video"], ref["video"]
        chain = {
            "finite": bool(np.isfinite(v).all()),
            "mean_delta": abs(float(v.mean()) - float(vr.mean())),
            "std_ratio": float(v.std()) / float(vr.std()),
            "pix_mae": float(np.abs(v - vr).mean()),
        }
        passed = (
            fwd_max < 0.25 and fwd_mean < 0.01 and chain["finite"]
            and chain["mean_delta"] < 0.05
            and 0.9 < chain["std_ratio"] < 1.1
        )
        ok &= passed
        report[name] = {
            "fwd_max_err_over_std": round(fwd_max, 5),
            "fwd_mean_err_over_std": round(fwd_mean, 6),
            **{k: (round(val, 5) if isinstance(val, float) else val)
               for k, val in chain.items()},
            "pass": passed,
        }

    print(json.dumps({"onchip_parity": report, "pass": ok}, indent=2))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
