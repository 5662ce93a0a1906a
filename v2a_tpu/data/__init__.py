"""Host-side data layer: replay buffers, HDF5 ingestion, image utils."""

from v2a_tpu.data.replay_buffer import EpisodeBuffer, ReplayBuffer

__all__ = ["EpisodeBuffer", "ReplayBuffer"]
