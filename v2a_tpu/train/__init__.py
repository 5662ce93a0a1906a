"""Training runtime: train state/steps, online trainer, exploration,
checkpointing, metrics."""
