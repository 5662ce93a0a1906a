"""Frozen video-prediction model: CLIP text encode -> diffusion sample.

Re-design of `Video_PredModel` (`diffuser/models/video_model.py:9-85`) and
its factory `lb_get_video_model_gcp_v2`
(`diffuser/libero/lb_video_model_utils.py:13-66`). Key TPU-first changes:

- the entire sampler (text encode + 100-step denoise chain) is ONE jitted
  function per (batch, token-length) shape; the denoise loop is a
  `lax.scan` (see `ops/gaussian_diffusion.py`),
- video tensors are (B, F, H, W, 3) channels-last; the stacked-channel
  (B, 3*F, H, W) detour of the torch pipeline (`unet.py:211-222`) never
  materializes — the U-Net consumes video-form tensors directly with the
  conditioning frame tiled over F on the channel axis,
- batch the tasks: the reference samples one video at a time during
  exploration (`lb_online_trainer_v7.py:871-877`); `sample()` here takes
  the whole task batch.
"""

from __future__ import annotations

import dataclasses
import functools
from typing import Any, List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from v2a_tpu.models.clip_text import (
    ClipTextEncoder,
    ClipTokenizerWrapper,
    sanitize_task_strings,
)
from v2a_tpu.models.video_unet import VideoUNet
from v2a_tpu.ops.gaussian_diffusion import GaussianDiffusion
from v2a_tpu.ops.schedules import DiffusionSchedule


@jax.jit
def _quantize_u8(x01: jax.Array) -> jax.Array:
    """float [0,1] -> uint8 on device (truncating, like numpy astype)."""
    return (jnp.clip(x01, 0.0, 1.0) * 255.0).astype(jnp.uint8)


@dataclasses.dataclass(frozen=True)
class VideoModelConfig:
    """The factory surface of `lb_get_video_model_gcp_v2`
    (`lb_video_model_utils.py:13-52`) + `vid_diffusion` config
    (`config/libero/lb_tk8_65to72.py:40-47`)."""

    image_size: Tuple[int, int] = (128, 128)
    sample_per_seq: int = 8  # frames incl. the conditioning frame
    channels: int = 3
    timesteps: int = 100
    sampling_timesteps: int = 100
    objective: str = "pred_v"
    beta_schedule: str = "cosine"
    loss_type: str = "l2"
    min_snr_loss_weight: bool = True
    guidance_weight: float = 0.0
    var_temp: float = 1.0
    model_channels: int = 128
    channel_mult: Tuple[int, ...] = (1, 2, 3, 4, 5)
    num_res_blocks: int = 2
    attention_resolutions: Tuple[int, ...] = (8, 16)
    num_head_channels: int = 32
    text_dim: int = 512
    dtype: str = "float32"
    use_pallas_gn: bool = False
    # conditioning-frame channels when they differ from the predicted
    # channels (e.g. the MW flow variants: 2-channel flow conditioned on an
    # rgb frame, `flowdiffusion/flowdiffusion/unet.py:69-123`)
    cond_channels: Optional[int] = None
    # Pallas ResBlock-interior fusion; None = auto (on for TPU backends)
    fused: Optional[bool] = None
    # 'unet' = guided-diffusion family (Perceiver-pooled additive text
    # conditioning, the Libero release model); 'xattn' = diffusers family
    # (cross-attention conditioning, SURVEY §2.9 alternative backbone)
    backbone: str = "unet"

    @property
    def video_future_horizon(self) -> int:
        # channels/3 in the stacked formulation (`video_model.py:34`)
        return self.sample_per_seq - 1

    @property
    def compute_dtype(self):
        return jnp.dtype(self.dtype)


class VideoPredModel:
    """Holds the U-Net + text encoder modules and frozen params; exposes
    jitted `sample` and (for video-model finetuning parity) `loss`."""

    def __init__(
        self,
        config: Optional[VideoModelConfig] = None,
        tokenizer: Optional[ClipTokenizerWrapper] = None,
        var_temp: Optional[float] = None,
        sampling_timesteps: Optional[int] = None,
    ):
        self.config = config or VideoModelConfig()
        if var_temp is not None:
            self.config = dataclasses.replace(self.config, var_temp=var_temp)
        if sampling_timesteps is not None:
            self.config = dataclasses.replace(
                self.config, sampling_timesteps=sampling_timesteps
            )
        cfg = self.config

        cond_ch = cfg.cond_channels if cfg.cond_channels is not None else cfg.channels
        fused = cfg.fused
        if fused is None:
            fused = jax.default_backend() not in ("cpu",)
        if cfg.backbone == "unet":
            self.unet = VideoUNet(
                in_channels=cfg.channels + cond_ch,
                model_channels=cfg.model_channels,
                out_channels=cfg.channels,
                num_res_blocks=cfg.num_res_blocks,
                attention_resolutions=tuple(cfg.attention_resolutions),
                channel_mult=tuple(cfg.channel_mult),
                num_head_channels=cfg.num_head_channels,
                task_token_dim=cfg.text_dim,
                dtype=cfg.compute_dtype,
                use_pallas_gn=cfg.use_pallas_gn,
                fused=fused,
            )
        elif cfg.backbone == "xattn":
            from v2a_tpu.models.video_unet_xattn import VideoUNetXAttn

            self.unet = VideoUNetXAttn(
                in_channels=cfg.channels + cond_ch,
                out_channels=cfg.channels,
                block_out_channels=tuple(
                    cfg.model_channels * m for m in cfg.channel_mult
                ),
                layers_per_block=cfg.num_res_blocks,
                context_dim=cfg.text_dim,
                dtype=cfg.compute_dtype,
            )
        else:
            raise ValueError(f"unknown backbone {cfg.backbone!r}")
        self.text_encoder = ClipTextEncoder(
            width=cfg.text_dim,
            mlp_dim=cfg.text_dim * 4,
            dtype=cfg.compute_dtype,
        )
        self.tokenizer = tokenizer or ClipTokenizerWrapper()

        self.diffusion = GaussianDiffusion(
            schedule=DiffusionSchedule.create(cfg.timesteps, cfg.beta_schedule),
            objective=cfg.objective,
            sampling_timesteps=cfg.sampling_timesteps,
            guidance_weight=cfg.guidance_weight,
            var_temp=cfg.var_temp,
            loss_type=cfg.loss_type,
            min_snr_loss_weight=cfg.min_snr_loss_weight,
        )
        self.params: Any = None  # {'unet': ..., 'text': ...}

    # -- init / parameters -------------------------------------------------

    def init(self, rng: jax.Array) -> Any:
        cfg = self.config
        h, w = cfg.image_size
        f = cfg.video_future_horizon
        rng_u, rng_t = jax.random.split(rng)
        unet_params = self.unet.init(
            rng_u,
            jnp.zeros((1, f, h, w, cfg.channels + (
                cfg.cond_channels if cfg.cond_channels is not None
                else cfg.channels))),
            jnp.zeros((1,), jnp.int32),
            jnp.zeros((1, 4, cfg.text_dim)),
        )
        text_params = self.text_encoder.init(
            rng_t, jnp.zeros((1, 4), jnp.int32), jnp.ones((1, 4), jnp.int32)
        )
        self.params = {"unet": unet_params, "text": text_params}
        return self.params

    def load_converted(
        self, path: str, tokenizer_dir: Optional[str] = None,
        rng: Optional[jax.Array] = None,
    ) -> Any:
        """Load converted reference weights, refusing silently-broken
        combinations: real CLIP text weights REQUIRE the real BPE tokenizer
        (the hashing fallback maps words to unrelated token ids — the
        conditioning would be garbage with no error). `scripts/convert_ckpt
        --clip` bundles the tokenizer assets under `<out_dir>/tokenizer/`.
        """
        import os

        from v2a_tpu.convert.torch_import import load_video_params

        params = load_video_params(path)
        if tokenizer_dir and os.path.isdir(tokenizer_dir):
            self.tokenizer = ClipTokenizerWrapper(local_path=tokenizer_dir)
        if "text" in params and not self.tokenizer.is_real:
            raise RuntimeError(
                f"{path} holds converted CLIP text weights but only the "
                "hashing fallback tokenizer is available — refusing (the "
                "text conditioning would be garbage). Bundle the tokenizer "
                "assets (convert_ckpt.py --clip writes <out>/tokenizer/) or "
                "pass tokenizer_dir."
            )
        if "text" not in params:
            # unet-only conversion: keep a hermetic random text tower, which
            # is only consistent with the (equally hermetic) hash tokenizer
            init = self.init(rng if rng is not None else jax.random.PRNGKey(0))
            params["text"] = init["text"]
        self.params = params
        return self.params

    # -- text --------------------------------------------------------------

    def encode_batch_text(self, params, tasks: List[str]) -> jax.Array:
        """CLIP last_hidden_state for sanitized task strings
        (`video_model.py:49-53,63-66`)."""
        tasks = sanitize_task_strings(tasks)
        input_ids, mask = self.tokenizer(tasks)
        return self._encode_text_jit(
            params["text"], jnp.asarray(input_ids), jnp.asarray(mask)
        )

    @functools.partial(jax.jit, static_argnums=0)
    def _encode_text_jit(self, text_params, input_ids, mask):
        return self.text_encoder.apply(text_params, input_ids, mask)

    # -- sampling ----------------------------------------------------------

    def _model_fn(self, unet_params, for_training: bool = False):
        """`for_training=True` routes through the non-Pallas module: the
        fused kernels define no VJP (inference-only), and both variants
        share the identical parameter tree."""
        unet = self.unet
        if for_training and getattr(unet, "fused", False):
            unet = unet.clone(fused=False)

        def fn(x, t, task_embed):
            return unet.apply(unet_params, x, t, task_embed)

        return fn

    @functools.partial(jax.jit, static_argnums=(0, 4))
    def _sample_jit(self, params, rng, x_cond, batch_size, task_embed):
        cfg = self.config
        h, w = cfg.image_size
        shape = (batch_size, cfg.video_future_horizon, h, w, cfg.channels)
        # diffusion works in [-1, 1]; condition frame likewise
        x_cond_n = (x_cond * 2.0 - 1.0)[:, None]  # (B, 1, H, W, 3)
        return self.diffusion.sample(
            self._model_fn(params["unet"]), rng, shape, x_cond_n, task_embed
        )

    def shard_for_mesh(self, mesh) -> None:
        """Distribute the frozen sampler across a device mesh: wide
        parameter trailing dims shard over 'tp' (tensor parallelism — GSPMD
        inserts the activation collectives), the video batch over the dp
        axes. Call after init()/load_converted(); subsequent `sample()`
        calls run sharded."""
        if self.params is None:
            raise RuntimeError("call init() or load converted params first")
        from v2a_tpu.parallel.sharding import shard_train_state

        self.params = shard_train_state(self.params, mesh)
        self._mesh = mesh

    def sample(
        self, rng: jax.Array, x_conds: np.ndarray, tasks: List[str]
    ) -> jax.Array:
        """x_conds float [0,1] (B, H, W, 3); returns (B, F, H, W, 3) in
        [0, 1] (`GoalGaussianDiffusion.sample` clamps —
        `goal_diffusion.py:644-650`)."""
        if self.params is None:
            raise RuntimeError("call init() or load converted params first")
        if x_conds.shape[0] != len(tasks):
            raise ValueError("batch size mismatch between frames and tasks")
        task_embed = self.encode_batch_text(self.params, tasks)
        x = jnp.asarray(x_conds)
        mesh = getattr(self, "_mesh", None)
        if mesh is not None:
            from v2a_tpu.parallel.sharding import batch_sharding

            x = jax.device_put(x, batch_sharding(mesh))
            task_embed = jax.device_put(task_embed, batch_sharding(mesh))
        return self._sample_jit(
            self.params, rng, x, x_conds.shape[0], task_embed
        )

    def sample_u8(
        self, rng: jax.Array, x_conds: np.ndarray, tasks: List[str]
    ) -> jax.Array:
        """`sample()` quantized to uint8 ON DEVICE before any readback:
        (B, F, H, W, 3) uint8 frames. The explore/eval loops only ever
        consume uint8 frames, so transferring f32 wastes 4x device-to-host
        bandwidth (the reference pays the same f32 `.cpu()` cost,
        `lb_online_trainer_v7.py:891-910`); quantizing on device matches
        the host-side `(x * 255).astype(np.uint8)` truncation exactly
        because `sample()` already clamps to [0, 1]."""
        return _quantize_u8(self.sample(rng, x_conds, tasks))

    # -- chunked sampling (explore-cycle pipelining) ------------------------

    @functools.partial(jax.jit, static_argnums=0)
    def _sample_chunk_jit(self, params, img, x_cond_n, task_embed, inputs):
        return self.diffusion.sample_scan_chunk(
            self._model_fn(params["unet"]), img, inputs, x_cond_n, task_embed
        )

    @functools.partial(jax.jit, static_argnums=0)
    def _sample_finish_u8_jit(self, img):
        return _quantize_u8(self.diffusion.sample_finish(img))

    def sample_u8_stream(
        self, rng: jax.Array, x_conds: np.ndarray, tasks: List[str],
        n_chunks: int = 20,
    ) -> "VideoSampleStream":
        """An incrementally-dispatched `sample_u8`: the denoise chain is cut
        into `n_chunks` device programs that the caller pumps one at a time
        (`VideoSampleStream.pump`), so a single chip can interleave them
        with other work (the exploration rollout phase's policy programs —
        trainer `pipeline_explore`). Computes the exact `sample_u8`
        sequence: same key derivation, same step bodies, same clamp and
        uint8 quantization (`tests/test_explore_pipeline.py`)."""
        if self.params is None:
            raise RuntimeError("call init() or load converted params first")
        if x_conds.shape[0] != len(tasks):
            raise ValueError("batch size mismatch between frames and tasks")
        return VideoSampleStream(self, rng, x_conds, tasks, n_chunks)

    # -- training loss (video-model finetuning parity;
    #    `goal_diffusion.py:690-733`) --------------------------------------

    def loss(
        self,
        params,
        rng: jax.Array,
        video01: jax.Array,  # (B, F, H, W, 3) target frames in [0,1]
        x_cond01: jax.Array,  # (B, H, W, 3)
        task_embed: jax.Array,
    ) -> jax.Array:
        x_cond_n = (x_cond01 * 2.0 - 1.0)[:, None]
        return self.diffusion.p_losses(
            self._model_fn(params["unet"], for_training=True),
            rng, video01, x_cond_n, task_embed,
        )

    def param_count(self) -> int:
        return sum(
            int(np.prod(p.shape))
            for p in jax.tree_util.tree_leaves(self.params)
        )


class VideoSampleStream:
    """One guidance-video sampling chain, dispatched chunk by chunk.

    Created by `VideoPredModel.sample_u8_stream`. The constructor only
    derives the chain inputs (x_T + per-step keys — the same derivation as
    `sample()`); no denoise work is dispatched until `pump()`. `result_u8()`
    pumps any remaining chunks and returns the device uint8 array (readback
    happens at the caller's `np.asarray`)."""

    def __init__(self, model, rng, x_conds, tasks, n_chunks):
        cfg = model.config
        self._model = model
        self._params = model.params
        self._task_embed = model.encode_batch_text(model.params, list(tasks))
        h, w = cfg.image_size
        shape = (
            x_conds.shape[0], cfg.video_future_horizon, h, w, cfg.channels
        )
        x = jnp.asarray(x_conds)
        self._x_cond_n = (x * 2.0 - 1.0)[:, None]
        self._img, self._inputs = model.diffusion.sample_step_inputs(
            rng, shape
        )
        n_steps = int(self._inputs[1].shape[0])
        k = max(1, -(-n_steps // max(n_chunks, 1)))  # ceil
        self._bounds = [
            (a, min(a + k, n_steps)) for a in range(0, n_steps, k)
        ]
        self._next = 0
        self._result = None

    @property
    def chunks_left(self) -> int:
        return len(self._bounds) - self._next

    def pump(self, k: int = 1) -> bool:
        """Dispatch up to `k` pending chunks (non-blocking on accelerator
        backends — jax dispatch is async). Returns True while work remains."""
        while k > 0 and self._next < len(self._bounds):
            a, b = self._bounds[self._next]
            chunk = jax.tree_util.tree_map(
                lambda x: x[a:b], self._inputs
            )
            self._img = self._model._sample_chunk_jit(
                self._params, self._img, self._x_cond_n, self._task_embed,
                chunk,
            )
            self._next += 1
            k -= 1
        return self._next < len(self._bounds)

    def result_u8(self):
        """Finish the chain; returns the device uint8 video array."""
        if self._result is None:
            while self.pump(1):
                pass
            self.pump(0)  # no-op; keeps pump() the single dispatch site
            self._result = self._model._sample_finish_u8_jit(self._img)
            # drop chain state so buffers free as soon as callers let go
            self._img = self._inputs = None
        return self._result
