"""Day-1 real-asset bring-up: one command from a reference checkpoint to a
verified eval episode, with a fail-fast PASS/FAIL manifest at every step.

Real assets (the release checkpoint + a local HF CLIP checkout):

    python scripts/bringup.py \
        --pt ckpts/libero/libero_ep20_bs12_aug/model-180000.pt \
        --clip /path/to/clip-vit-base-patch32 \
        --out-dir bringup_out

Synthetic stand-ins (CI; builds a SMALL reference-format torch checkpoint
from the live reference model tree plus a real-BPE synthetic CLIP, then
runs the identical pipeline):

    python scripts/bringup.py --synthetic --out-dir bringup_out

Steps (reference behaviors being brought up):
  1. assets    — checkpoint + CLIP weights + tokenizer files exist
  2. convert   — torch .pt -> msgpack (+ tokenizer bundle)
                 (`diffuser/models/video_model.py:38-46` EMA extraction)
  3. load      — `VideoPredModel.load_converted` incl. the real-tokenizer
                 fail-fast gate
  4. tokenizer — real-BPE fidelity probe (ids must differ from the hash
                 fallback; eos present; under vocab size)
  5. parity    — (synthetic only) converted flax forward vs the live torch
                 reference forward, atol 2e-4
  6. sample    — one video sampled end-to-end (`plan_lb.py:26-156` uses
                 exactly this surface before eval)
  7. eval      — one eval episode through `Evaluator.eval_1_env` with the
                 freshly loaded video model driving goal frames

Exit code 0 only if every step passes; the JSON manifest is printed and
written to <out-dir>/bringup_manifest.json.
"""

import argparse
import dataclasses
import json
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REF = "/root/reference/flowdiffusion/flowdiffusion"


# -- synthetic stand-ins ----------------------------------------------------

def _install_einops_exts_shim():
    """The reference imports `einops_exts`, absent here; shim the helpers
    it uses with plain einops (same shim as tests/test_convert.py)."""
    import types

    if "einops_exts" in sys.modules:
        return
    from einops import rearrange, repeat
    import torch.nn as nn

    mod = types.ModuleType("einops_exts")
    mod.rearrange_many = lambda ts, *a, **k: [rearrange(t, *a, **k) for t in ts]
    mod.repeat_many = lambda ts, *a, **k: [repeat(t, *a, **k) for t in ts]
    mod.check_shape = lambda t, p, **k: rearrange(t, f"{p} -> {p}", **k)

    tmod = types.ModuleType("einops_exts.torch")

    class EinopsToAndFrom(nn.Module):
        def __init__(self, from_pattern, to_pattern, fn):
            super().__init__()
            self.from_pattern, self.to_pattern = from_pattern, to_pattern
            self.fn = fn

        def forward(self, x, **kwargs):
            from einops import rearrange as rr

            shape_kwargs = dict(
                zip(self.from_pattern.split(), x.shape)
            )
            x = rr(x, f"{self.from_pattern} -> {self.to_pattern}")
            x = self.fn(x, **kwargs)
            return rr(
                x, f"{self.to_pattern} -> {self.from_pattern}", **{
                    k: v for k, v in shape_kwargs.items()
                    if k in self.from_pattern
                }
            )

    tmod.EinopsToAndFrom = EinopsToAndFrom
    mod.torch = tmod
    sys.modules["einops_exts"] = mod
    sys.modules["einops_exts.torch"] = tmod


SMALL = dict(
    model_channels=32, num_res_blocks=1, channel_mult=(1, 2),
    attention_resolutions=(2,), num_head_channels=32,
)

# The RELEASE model's parameter schema (`lb_video_model_utils.py:33-39`:
# 128 base channels, mult 1-5, 2 res blocks, attention at ds 8/16,
# 32-wide heads, 512-dim CLIP conditioning). The torch-oracle mode builds a
# random-weight checkpoint with EXACTLY the real `model-180000.pt` key
# names and tensor shapes (the model is fully convolutional, so the
# parameter tree is independent of image size / frame count — those are
# kept small purely for CPU wall-clock).
REAL = dict(
    model_channels=128, num_res_blocks=2, channel_mult=(1, 2, 3, 4, 5),
    attention_resolutions=(8, 16), num_head_channels=32,
)
REAL_TEXT_DIM = 512
SMALL_TEXT_DIM = 64


def small_config(real_shape: bool = False):
    from v2a_tpu.models.video_model import VideoModelConfig

    if real_shape:
        return VideoModelConfig(
            image_size=(32, 32), sample_per_seq=3, timesteps=100,
            sampling_timesteps=3, text_dim=REAL_TEXT_DIM, fused=False,
            **REAL,
        )
    return VideoModelConfig(
        image_size=(32, 32), sample_per_seq=4, timesteps=10,
        sampling_timesteps=10, text_dim=64, fused=False, **SMALL,
    )


def _bytes_to_unicode():
    """GPT-2/CLIP byte-level BPE base alphabet (public algorithm)."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, map(chr, cs)))


def make_synthetic_assets(out_dir, real_shape: bool = False):
    """Build (pt_path, clip_dir): a reference-format video checkpoint
    (weights from the LIVE reference `UNetModel`, so the converter is
    exercised against the real key schema) and a synthetic CLIP text tower
    with a real byte-level-BPE tokenizer (characters only, no merges).

    `real_shape=True` (the `--torch-oracle` mode) instantiates the torch
    model at the RELEASE parameter schema — every key name and tensor
    shape of the real `model-180000.pt` EMA state dict
    (`diffuser/models/video_model.py:38-46`) — so checkpoint-layout drift
    in the converter is impossible to miss before real assets arrive."""
    import torch
    import transformers

    if not os.path.isdir(REF):
        raise FileNotFoundError(
            f"--synthetic needs the reference tree at {REF} to build a "
            "reference-format checkpoint"
        )
    _install_einops_exts_shim()
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from guided_diffusion.guided_diffusion.unet import UNetModel

    model_kw = REAL if real_shape else SMALL
    text_dim = REAL_TEXT_DIM if real_shape else SMALL_TEXT_DIM
    torch.manual_seed(0)
    tm = UNetModel(
        image_size=(32, 32), in_channels=6, out_channels=3, dims=3,
        task_tokens=True, task_token_channels=text_dim, **model_kw,
    ).eval()
    # trainer checkpoint format: EMA U-Net under ema.ema_model.model.unet.*
    # (`diffuser/models/video_model.py:38-46`)
    ckpt = {
        "ema": {
            "ema_model.model.unet." + k: v
            for k, v in tm.state_dict().items()
        }
    }
    pt_path = os.path.join(out_dir, "synthetic-model-180000.pt")
    torch.save(ckpt, pt_path)

    # synthetic CLIP: matches ClipTextEncoder's module shape at width 64
    clip_dir = os.path.join(out_dir, "synthetic-clip")
    os.makedirs(clip_dir, exist_ok=True)
    ccfg = transformers.CLIPTextConfig(
        vocab_size=49408, hidden_size=text_dim, num_hidden_layers=12,
        num_attention_heads=8, intermediate_size=text_dim * 4,
        max_position_embeddings=77,
    )
    torch.manual_seed(1)
    clip = transformers.CLIPTextModel(ccfg).eval()
    torch.save(clip.state_dict(), os.path.join(clip_dir, "pytorch_model.bin"))

    # real BPE tokenizer assets: byte alphabet + </w> word-final variants +
    # specials; zero merges -> every word tokenizes to characters. Valid
    # CLIPTokenizer input, ids all << 49408.
    byte_alpha = list(_bytes_to_unicode().values())
    vocab = {}
    for tok in byte_alpha:
        vocab[tok] = len(vocab)
    for tok in byte_alpha:
        vocab[tok + "</w>"] = len(vocab)
    for tok in ("<|startoftext|>", "<|endoftext|>"):
        vocab[tok] = len(vocab)
    with open(os.path.join(clip_dir, "vocab.json"), "w") as f:
        json.dump(vocab, f)
    with open(os.path.join(clip_dir, "merges.txt"), "w") as f:
        f.write("#version: 0.2\n")
    return pt_path, clip_dir, tm


# -- the pipeline -----------------------------------------------------------

class Manifest:
    def __init__(self):
        self.steps = []
        self.ok = True

    def run(self, name, fn):
        t0 = time.time()
        entry = {"step": name}
        try:
            info = fn() or {}
            entry.update({"status": "PASS", **info})
        except Exception as e:  # noqa: BLE001 - manifest captures all
            self.ok = False
            entry.update({"status": "FAIL", "error": f"{type(e).__name__}: {e}"})
            traceback.print_exc()
        entry["seconds"] = round(time.time() - t0, 2)
        self.steps.append(entry)
        print(f"[{entry['status']}] {name} ({entry['seconds']}s)"
              + (f" — {entry.get('error')}" if "error" in entry else ""),
              flush=True)
        return entry["status"] == "PASS"


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--pt", default=None, help="reference model-*.pt")
    ap.add_argument("--clip", default=None, help="local HF CLIP dir")
    ap.add_argument("--out-dir", default="bringup_out")
    ap.add_argument("--synthetic", action="store_true",
                    help="build small synthetic stand-ins (CI mode)")
    ap.add_argument("--torch-oracle", action="store_true",
                    help="synthetic mode at the RELEASE parameter schema: "
                         "a random-weight torch EMA checkpoint with the "
                         "exact model-180000.pt key layout is built, "
                         "converted, and forward-parity-checked (slow on "
                         "CPU; catches converter layout drift before real "
                         "assets arrive)")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (synthetic default)")
    args = ap.parse_args(argv)
    if args.torch_oracle:
        args.synthetic = True

    os.makedirs(args.out_dir, exist_ok=True)
    if args.synthetic or args.cpu:
        os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
        import jax

        jax.config.update("jax_platforms", "cpu")

    import jax

    from v2a_tpu.models.video_model import VideoModelConfig, VideoPredModel

    man = Manifest()
    state = {}

    # 1. assets
    def step_assets():
        if args.synthetic:
            pt, clip, tm = make_synthetic_assets(
                args.out_dir, real_shape=args.torch_oracle
            )
            state["pt"], state["clip"], state["torch_ref"] = pt, clip, tm
            state["cfg"] = small_config(real_shape=args.torch_oracle)
        else:
            if not args.pt:
                raise ValueError("--pt required (or --synthetic)")
            state["pt"], state["clip"] = args.pt, args.clip
            state["cfg"] = VideoModelConfig()
        if not os.path.isfile(state["pt"]):
            raise FileNotFoundError(f"checkpoint missing: {state['pt']}")
        if state["clip"]:
            for req in ("pytorch_model.bin", "vocab.json", "merges.txt"):
                p = os.path.join(state["clip"], req)
                if not os.path.isfile(p):
                    raise FileNotFoundError(f"CLIP asset missing: {p}")
        return {"pt": state["pt"], "clip": state["clip"]}

    if not man.run("assets", step_assets):
        return finish(man, args)

    # 2. convert
    def step_convert():
        from v2a_tpu.convert.torch_import import convert_video_checkpoint

        out = os.path.join(args.out_dir, "jax-video-model.msgpack")
        params = convert_video_checkpoint(
            state["pt"], out, config=state["cfg"], clip_path=state["clip"]
        )
        state["msgpack"] = out
        n = sum(int(np.asarray(v).size)
                for v in jax.tree_util.tree_leaves(params))
        if n == 0:
            raise ValueError("conversion produced zero parameters")
        return {"params": n, "out": out,
                "has_text": "text" in params}

    if not man.run("convert", step_convert):
        return finish(man, args)

    # 3. load (exercises the real-tokenizer fail-fast gate)
    def step_load():
        model = VideoPredModel(state["cfg"])
        tok_dir = os.path.join(args.out_dir, "tokenizer")
        model.load_converted(
            state["msgpack"],
            tokenizer_dir=tok_dir if os.path.isdir(tok_dir) else None,
        )
        state["model"] = model
        return {"tokenizer_real": model.tokenizer.is_real}

    if not man.run("load", step_load):
        return finish(man, args)

    # 4. tokenizer fidelity
    def step_tokenizer():
        model = state["model"]
        probe = ["put the red mug on the plate"]
        ids, mask = model.tokenizer(probe)
        info = {"is_real": model.tokenizer.is_real,
                "probe_len": int(mask.sum())}
        if state["clip"]:
            if not model.tokenizer.is_real:
                raise RuntimeError("CLIP weights present but tokenizer is "
                                   "the hash fallback")
            from v2a_tpu.models.clip_text import HashTokenizer

            hids, _ = HashTokenizer()(probe)
            if np.array_equal(ids, hids):
                raise RuntimeError("real tokenizer produced the hash "
                                   "fallback's ids — assets are wrong")
            if int(ids.max()) >= 49408:
                raise RuntimeError(f"token id {int(ids.max())} out of vocab")
        return info

    if not man.run("tokenizer", step_tokenizer):
        return finish(man, args)

    # 5. parity (synthetic only: the live torch reference is in memory)
    def step_parity():
        if "torch_ref" not in state:
            return {"skipped": "real-asset mode; parity is covered by "
                               "tests/test_convert.py on the small model"}
        import torch

        from v2a_tpu.convert.torch_import import load_video_params

        tm = state["torch_ref"]
        params = load_video_params(state["msgpack"])
        model = state["model"]
        rs = np.random.RandomState(0)
        b, f, hw = 1, state["cfg"].video_future_horizon, 32
        x = rs.randn(b, 6, f, hw, hw).astype(np.float32)
        t = np.array([3])
        tokens = rs.randn(b, 5, state["cfg"].text_dim).astype(np.float32)
        with torch.no_grad():
            out_t = tm(torch.tensor(x), torch.tensor(t, dtype=torch.long),
                       torch.tensor(tokens)).numpy()
        out_f = np.asarray(model.unet.apply(
            params["unet"], x.transpose(0, 2, 3, 4, 1),
            t.astype(np.int32), tokens,
        )).transpose(0, 4, 1, 2, 3)
        err = float(np.abs(out_f - out_t).max())
        if err > 2e-3:
            raise AssertionError(f"forward parity max err {err}")
        return {"max_abs_err": err}

    if not man.run("parity", step_parity):
        return finish(man, args)

    # 6. sample one video
    def step_sample():
        model = state["model"]
        h, w = state["cfg"].image_size
        img01 = np.clip(
            np.random.RandomState(1).rand(1, h, w, 3).astype(np.float32), 0, 1
        )
        v = np.asarray(model.sample_u8(
            jax.random.PRNGKey(0), img01, ["put the red mug on the plate"]
        ))
        want = (1, state["cfg"].video_future_horizon, h, w, 3)
        if v.shape != want:
            raise AssertionError(f"video shape {v.shape} != {want}")
        if v.dtype != np.uint8:
            raise AssertionError(f"video dtype {v.dtype} != uint8")
        state["video_fn_model"] = model
        np.save(os.path.join(args.out_dir, "bringup_video.npy"), v)
        return {"shape": list(v.shape),
                "mean": round(float(v.mean()), 2)}

    if not man.run("sample", step_sample):
        return finish(man, args)

    # 7. one eval episode (fake env backend; the real LIBERO backend slots
    # into the same `Evaluator` surface)
    def step_eval():
        from v2a_tpu.envs.fake import FakeEnvList
        from v2a_tpu.eval.harness import EvalConfig, Evaluator

        model = state["model"]
        cfg = state["cfg"]
        h, w = cfg.image_size
        envs = FakeEnvList(num_tasks=1, img_hw=(h, w))

        def policy_fn(img_obs01, img_goal01):
            return np.zeros((4, 7), np.float32)

        rng_holder = {"rng": jax.random.PRNGKey(7)}

        def video_fn(img01, task):
            rng_holder["rng"], sub = jax.random.split(rng_holder["rng"])
            return np.asarray(model.sample_u8(sub, img01[None], [task])[0])

        ecfg = EvalConfig(
            n_seeds=1, eval_n_preds_betw_vframes=2, num_vid_pred_per_ep=1,
            use_vid_first_n_frames=2, n_acts_per_pred=4, vis=False,
        )
        ev = Evaluator(
            envs, policy_fn, video_fn,
            video_horizon=cfg.video_future_horizon, config=ecfg,
        )
        task = envs.task_list[0]
        env_idx = envs.seed_sets[task][0]
        envs.init_1_given_env(task, env_idx, e_seed=0)
        res = ev.eval_1_env(task, "agent", env_idx)
        envs.close_1_given_env(task, env_idx)
        if len(res.imgs) < 2:
            raise AssertionError("episode produced no rollout frames")
        return {"episode_frames": len(res.imgs),
                "videos_predicted": len(res.pred_videos)}

    man.run("eval", step_eval)
    return finish(man, args)


def finish(man, args):
    manifest = {"pass": man.ok, "steps": man.steps}
    path = os.path.join(args.out_dir, "bringup_manifest.json")
    with open(path, "w") as f:
        json.dump(manifest, f, indent=2)
    print(json.dumps(manifest))
    print(f"[bringup] {'PASS' if man.ok else 'FAIL'} — manifest at {path}")
    sys.exit(0 if man.ok else 1)


if __name__ == "__main__":
    main()
