"""Flax model definitions: the action-diffusion policy stack and the frozen
video-diffusion stack."""
