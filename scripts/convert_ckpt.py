"""Convert reference torch checkpoints to v2a_tpu msgpack parameter files.

    # frozen video model (+ optional local CLIP weights dir)
    python scripts/convert_ckpt.py --kind video \
        --pt ckpts/libero/libero_ep20_bs12_aug/model-180000.pt \
        --out ckpts/libero/libero_ep20_bs12_aug/jax-model-180000.msgpack \
        [--clip path/to/clip-vit-base-patch32]

    # trained policy (from a reference trainer model-{milestone}.pt)
    python scripts/convert_ckpt.py --kind policy \
        --pt logs/.../model-200000.pt --out policy-200000.msgpack
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from v2a_tpu.convert import torch_import as ti


def main(argv=None):
    from v2a_tpu.config import parse_cli

    argv = list(argv if argv is not None else sys.argv[1:])
    _, kv = parse_cli(argv)
    args = {f"--{k}": v for k, v in kv.items()}
    kind = args.get("--kind", "video")
    pt = args.get("--pt")
    out = args.get("--out")
    if not pt or not out:
        raise SystemExit(__doc__)

    if kind == "video":
        params = ti.convert_video_checkpoint(
            pt, out, clip_path=args.get("--clip")
        )
        n = sum(
            v.size for v in _leaves(params)
        )
    elif kind == "policy":
        import torch

        ckpt = torch.load(pt, map_location="cpu")
        sd = ti.extract_policy_state(ckpt, use_ema=args.get("--ema", "1") == "1")
        params = ti.convert_policy(sd)
        ti.save_video_params(params, out)
        n = sum(v.size for v in _leaves(params))
    else:
        raise SystemExit(f"unknown --kind {kind!r}")
    print(f"[convert] {kind}: {n:,} params -> {out}")


def _leaves(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)


if __name__ == "__main__":
    main()
