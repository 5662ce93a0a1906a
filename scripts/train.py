"""Online-training entry point.

Counterpart of `scripts/train_libero_dp.py:29-167`:

    python scripts/train.py --config v2a_tpu/config/libero/lb_tk8_65to72.py \
        [--trainer.n_train_steps 1000] [--seed 3] ...

Flow: load config module -> apply CLI overrides -> build experiment
(env list + policy + frozen video model + trainer) -> smoke-test one
loss/grad on random tensors -> optionally resume -> train. The config
snapshot written to the workdir is the contract eval reloads from.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

from v2a_tpu.config import apply_overrides, load_config_module, parse_cli
from v2a_tpu.train.build import build_experiment


def main(argv=None):
    config_path, overrides = parse_cli(argv if argv is not None else sys.argv[1:])
    if not config_path:
        raise SystemExit("usage: train.py --config <config.py> [--key value]...")
    cfg = load_config_module(config_path)
    if overrides:
        cfg = apply_overrides(cfg, overrides)

    workdir = cfg.savepath()
    print(f"[train] workdir: {workdir}")
    trainer, policy, env_list, video_model = build_experiment(cfg, workdir)

    # smoke test: one loss+grad on random tensors before the loop
    # (`scripts/train_libero_dp.py:131-147`)
    h, w = cfg.policy.image_size
    rs = np.random.RandomState(0)
    batch = {
        "obs": {
            k: rs.rand(2, h, w, 3).astype(np.float32)
            for k in cfg.policy.obs_keys
        },
        "action": rs.uniform(
            -1, 1, (2, cfg.policy.horizon, cfg.policy.action_dim)
        ).astype(np.float32),
    }
    loss, grads = jax.value_and_grad(policy.loss)(
        trainer.state.params, jax.random.PRNGKey(0),
        jax.tree_util.tree_map(lambda x: jax.numpy.asarray(x), batch),
    )
    assert np.isfinite(float(loss)), "smoke test produced non-finite loss"
    print(f"[train] smoke test loss: {float(loss):.4f}")
    del grads

    if cfg.do_train_resume:
        try:
            trainer.load()
            print(f"[train] resumed from step {trainer.step}")
        except FileNotFoundError:
            print("[train] no checkpoint found; starting fresh")

    trainer.train()
    print(f"[train] done at step {trainer.step}")


if __name__ == "__main__":
    main()
