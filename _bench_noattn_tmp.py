"""Attention ablation of the headline chain: attn=(8,16) vs attn=() on the
shipped defaults; DDIM-100 medians. Run AFTER /tmp/ab_train.sh finishes."""
import json, os, time
import jax, jax.numpy as jnp, numpy as np
from v2a_tpu.models.video_unet import VideoUNet
from v2a_tpu.ops.gaussian_diffusion import GaussianDiffusion
from v2a_tpu.ops.schedules import DiffusionSchedule

BATCH, FRAMES, HW, STEPS, TOKENS = 8, 7, 128, 100, 16

def run(attn):
    unet = VideoUNet(
        in_channels=6, model_channels=128, out_channels=3, num_res_blocks=2,
        attention_resolutions=attn, channel_mult=(1, 2, 3, 4, 5),
        num_head_channels=32, task_token_dim=512, dtype=jnp.bfloat16,
        fused=True,
    )
    x_probe = jnp.zeros((1, FRAMES, HW, HW, 6))
    shapes = jax.eval_shape(
        lambda r: unet.init(r, x_probe, jnp.zeros((1,), jnp.int32),
                            jnp.zeros((1, TOKENS, 512))), jax.random.PRNGKey(0))
    rngs = iter(jax.random.split(jax.random.PRNGKey(0), 10_000))
    params = jax.tree_util.tree_map(
        lambda s: jax.random.normal(next(rngs), s.shape, s.dtype) * 0.02, shapes)
    diffusion = GaussianDiffusion(
        schedule=DiffusionSchedule.create(100, "cosine"),
        objective="pred_v", sampling_timesteps=STEPS, scan_unroll=1)

    @jax.jit
    def sample(params, rng, x_cond, task_embed):
        return diffusion.sample(
            lambda x, t, e: unet.apply(params, x, t, e),
            rng, (BATCH, FRAMES, HW, HW, 3), x_cond, task_embed)

    rng = jax.random.PRNGKey(42)
    x_cond = jax.random.uniform(rng, (BATCH, 1, HW, HW, 3)) * 2.0 - 1.0
    task_embed = jax.random.normal(rng, (BATCH, TOKENS, 512)) * 0.1
    checksum = jax.jit(jnp.sum)
    np.asarray(checksum(sample(params, rng, x_cond, task_embed)))
    np.asarray(checksum(sample(params, jax.random.fold_in(rng, 9), x_cond, task_embed)))
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        np.asarray(checksum(sample(params, jax.random.fold_in(rng, i), x_cond, task_embed)))
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts))
    print(json.dumps({"attn": list(attn), "median_iter_s": round(med, 3),
                      "ms_per_fwd": round(med * 10, 2),
                      "iter_s": [round(t, 3) for t in ts]}), flush=True)

run((8, 16))
run(())
