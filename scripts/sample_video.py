"""Sample videos from a (converted) video diffusion checkpoint — the
guided-diffusion `scripts/image_sample.py` surface at the video level
(reference vendored CLI:
`flowdiffusion/flowdiffusion/guided_diffusion/scripts/image_sample.py`;
sampling semantics `flowdiffusion/flowdiffusion/goal_diffusion.py:583-650`).

Examples:

    # sample 4 videos from a converted checkpoint, conditioned on a frame
    python scripts/sample_video.py \
        --ckpt ckpts/libero/jax-model-180000.msgpack \
        --cond frame.png --task "put the bowl on the stove" \
        --n 4 --steps 100 --out samples/

    # hermetic smoke (random init, tiny model) — exercises the full path
    python scripts/sample_video.py --smoke 1 --out /tmp/vsamples

Outputs per sample: `video_{i}.png` (frame strip), `video_{i}.mp4` (when
imageio/ffmpeg are available), plus one `videos.npy` (B, F, H, W, 3 uint8).
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    import jax

    from v2a_tpu.config import parse_cli
    from v2a_tpu.data.img_utils import save_episode_mp4, save_episode_png
    from v2a_tpu.models.video_model import VideoModelConfig, VideoPredModel

    argv = list(argv if argv is not None else sys.argv[1:])
    _, kv = parse_cli(argv)
    out_dir = kv.get("out", "samples")
    os.makedirs(out_dir, exist_ok=True)
    n = int(kv.get("n", "1"))
    steps = int(kv.get("steps", "100"))
    var_temp = float(kv.get("var_temp", "1.0"))
    seed = int(kv.get("seed", "0"))
    smoke = kv.get("smoke", "0") == "1"
    tasks = [kv.get("task", "a robot arm completes the task")] * n

    if smoke:
        cfg = VideoModelConfig(
            image_size=(32, 32), model_channels=32, channel_mult=(1, 2),
            num_res_blocks=1, attention_resolutions=(2,), timesteps=10,
            sampling_timesteps=int(kv.get("steps", "2")), text_dim=64,
        )
        model = VideoPredModel(cfg, var_temp=var_temp)
        model.init(jax.random.PRNGKey(seed))
    else:
        ckpt = kv.get("ckpt")
        if not ckpt:
            raise SystemExit(__doc__)
        model = VideoPredModel(
            var_temp=var_temp, sampling_timesteps=steps
        )
        model.load_converted(ckpt, tokenizer_dir=kv.get("tokenizer"))

    h, w = model.config.image_size
    cond_path = kv.get("cond")
    if cond_path and cond_path.endswith(".npy"):
        cond = np.load(cond_path)
    elif cond_path:
        import imageio.v2 as imageio

        cond = np.asarray(imageio.imread(cond_path))[..., :3]
    else:
        # deterministic synthetic frame for smoke runs
        yy, xx = np.mgrid[0:h, 0:w]
        cond = np.stack([yy, xx, (yy + xx) // 2], -1).astype(np.uint8)
        cond = (cond * (255 // max(h + w, 1))).astype(np.uint8)
    if cond.ndim == 3:
        cond = cond[None]
    cond01 = cond.astype(np.float32) / 255.0
    if cond01.shape[1:3] != (h, w):
        raise SystemExit(
            f"conditioning frame is {cond01.shape[1:3]}, model wants {(h, w)}"
        )
    cond01 = np.broadcast_to(cond01[0], (n,) + cond01.shape[1:])

    videos = np.asarray(
        model.sample(jax.random.PRNGKey(seed), cond01, tasks)
    )  # (B, F, H, W, 3) in [0, 1]
    videos_u8 = (np.clip(videos, 0.0, 1.0) * 255).astype(np.uint8)
    np.save(os.path.join(out_dir, "videos.npy"), videos_u8)
    for i in range(n):
        save_episode_png(
            os.path.join(out_dir, f"video_{i}.png"), videos_u8[i]
        )
        try:
            save_episode_mp4(
                os.path.join(out_dir, f"video_{i}.mp4"), list(videos_u8[i]),
                fps=4,
            )
        except Exception:
            pass  # mp4 writer (ffmpeg) is optional
    print(
        f"[sample_video] wrote {n} videos "
        f"({videos_u8.shape[1]} frames, {h}x{w}) to {out_dir}"
    )


if __name__ == "__main__":
    main()
