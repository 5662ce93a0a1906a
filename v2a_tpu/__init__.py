"""v2a_tpu — a TPU-native (JAX/XLA/Pallas/pjit) framework for grounding video
models to actions through goal-conditioned exploration.

This is a from-scratch, TPU-first re-design with the capabilities of the
reference implementation of "Grounding Video Models to Actions through Goal
Conditioned Exploration" (Luo & Du, arXiv 2411.07223). The reference is
PyTorch/CUDA; this package is built around:

- pure jitted compute functions (video diffusion sampling, policy loss,
  action sampling) over explicit parameter pytrees,
- `jax.sharding.Mesh` + NamedSharding for data-parallel scale-out over ICI,
- bf16 matmul/conv compute with fp32 parameters and normalization,
- host-side orchestration (simulator stepping, replay buffers, schedulers)
  in plain Python/numpy with an async host->HBM boundary.

Layout:
    ops/       diffusion schedules + samplers (two families), Pallas kernels
    models/    flax modules: 3D video U-Net, 1D action U-Net, vision encoder,
               CLIP text encoder, the policy and video-model wrappers
    data/      replay buffers, HDF5 ingestion, image preprocessing
    envs/      environment abstraction: fake CI backend + Libero adapter
    parallel/  mesh construction, sharding helpers, host->device prefetch
    train/     online trainer, train state, checkpointing, metrics
    eval/      evaluation harness (receding-horizon video replanning)
    config/    typed experiment configs + CLI override parser
    convert/   torch-checkpoint -> JAX parameter converters
"""

__version__ = "0.1.0"
