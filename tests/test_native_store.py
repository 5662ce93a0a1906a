"""Native C++ episode store: window consistency, truncation, FIFO eviction,
determinism, and ReplayBuffer backend integration."""

import numpy as np
import pytest

from v2a_tpu.data.native_store import NativeEpisodeStore, native_available
from v2a_tpu.data.replay_buffer import ReplayBuffer

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native library not built (make -C native)"
)

H = W = 16


def _episode(ep_id: int, n_imgs: int):
    """Frames whose pixel [0,0,0] encodes the frame index and [0,0,1] the
    episode id; actions encode (frame, dim)."""
    imgs = np.zeros((n_imgs, H, W, 3), np.uint8)
    imgs[:, 0, 0, 0] = np.arange(n_imgs) % 256
    imgs[:, 0, 0, 1] = ep_id % 256
    acts = np.zeros((n_imgs - 1, 7), np.float32)
    acts[:, 0] = np.arange(n_imgs - 1)
    acts[:, 1] = ep_id
    return imgs, acts


def test_sampled_windows_are_consistent():
    store = NativeEpisodeStore(8, 100, (H, W), 7)
    for e in range(5):
        imgs, acts = _episode(e, 40 + e)
        store.add_episode(imgs, acts)
    assert len(store) == 5

    horizon = 16
    obs, goal, acts, slots = store.sample_batch(64, horizon, seed=7)
    for i in range(64):
        ep_id = obs[i, 0, 0, 1]
        start = int(obs[i, 0, 0, 0])
        assert goal[i, 0, 0, 1] == ep_id
        assert int(goal[i, 0, 0, 0]) == start + horizon
        np.testing.assert_array_equal(
            acts[i, :, 0], np.arange(start, start + horizon)
        )
        assert (acts[i, :, 1] == float(ep_id)).all()
        # start index within bounds: goal frame must exist
        assert start + horizon <= 40 + int(slots[i]) - 1


def test_determinism_and_seed_sensitivity():
    store = NativeEpisodeStore(4, 64, (H, W), 7)
    imgs, acts = _episode(1, 50)
    store.add_episode(imgs, acts)
    a1 = store.sample_batch(32, 8, seed=123)
    a2 = store.sample_batch(32, 8, seed=123)
    b = store.sample_batch(32, 8, seed=124)
    for x, y in zip(a1[:3], a2[:3]):
        np.testing.assert_array_equal(x, y)
    assert any((x != y).any() for x, y in zip(a1[:3], b[:3]))


def test_truncation_keeps_most_recent_frames():
    store = NativeEpisodeStore(2, max_len=20, img_hw=(H, W), act_dim=7)
    imgs, acts = _episode(3, 50)  # longer than max_len
    store.add_episode(imgs, acts)
    assert store.episode_len(0) == 20
    obs, goal, acts_s, _ = store.sample_batch(16, 5, seed=0)
    # only frames 30..49 survive
    assert (obs[:, 0, 0, 0] >= 30).all()
    assert (acts_s[:, :, 0] >= 30).all()


def test_fifo_eviction_and_total_added():
    store = NativeEpisodeStore(3, 64, (H, W), 7)
    for e in range(5):
        imgs, acts = _episode(e, 30)
        store.add_episode(imgs, acts)
    assert len(store) == 3
    assert store.total_added == 5
    obs, _, acts_s, _ = store.sample_batch(128, 4, seed=1)
    # only the 3 most recent episodes (ids 2,3,4) remain
    assert set(np.unique(obs[:, 0, 0, 1])) <= {2, 3, 4}


def test_short_episode_draw_raises():
    store = NativeEpisodeStore(2, 64, (H, W), 7)
    imgs, acts = _episode(0, 6)
    store.add_episode(imgs, acts)
    with pytest.raises(ValueError):
        store.sample_batch(4, horizon=10, seed=0)
    with pytest.raises(RuntimeError):
        NativeEpisodeStore(2, 64, (H, W), 7).sample_batch(1, 2, 0)


def test_replay_buffer_native_backend_end_to_end():
    buf = ReplayBuffer(4, max_len=64, min_len=10, sample_act_seq_len=8,
                       backend="native")
    rng = np.random.default_rng(0)
    for e in range(3):
        imgs, acts = _episode(e, 30)
        buf.add_episode(f"task{e}", "agent", 100 + e, imgs, acts,
                        is_success=e == 2)
    assert len(buf) == 3
    assert buf.backend == "native"
    batch = buf.sample_batch(16, rng)
    assert batch["img_obs"].shape == (16, H, W, 3)
    assert batch["action"].shape == (16, 8, 7)
    for i in range(16):
        ep_id = int(batch["img_obs"][i, 0, 0, 1])
        assert batch["task"][i] == f"task{ep_id}"
        assert batch["env_idx"][i] == 100 + ep_id
    # python backend yields the same schema
    buf_py = ReplayBuffer(4, max_len=64, min_len=10, sample_act_seq_len=8,
                          backend="python")
    imgs, acts = _episode(0, 30)
    buf_py.add_episode("t", "agent", 1, imgs, acts)
    b2 = buf_py.sample_batch(4, rng)
    assert set(b2) == set(batch)


def test_buffer_save_load_roundtrip(tmp_path):
    """Checkpointing: episodes + metadata round-trip through npz, both
    backends."""
    for backend in ("native", "python"):
        buf = ReplayBuffer(4, max_len=64, min_len=10, sample_act_seq_len=8,
                           backend=backend)
        for e in range(3):
            imgs, acts = _episode(e, 30)
            buf.add_episode(f"task{e}", "agent", 100 + e, imgs, acts,
                            is_success=e == 1)
        path = str(tmp_path / f"buf_{backend}.npz")
        buf.save(path)

        buf2 = ReplayBuffer(4, max_len=64, min_len=10, sample_act_seq_len=8,
                            backend=backend)
        buf2.load(path)
        assert len(buf2) == 3
        assert buf2.cnt_all_history_episodes == 3
        a = buf.export_episodes()
        b = buf2.export_episodes()
        for ea, eb in zip(a, b):
            np.testing.assert_array_equal(ea["imgs"], eb["imgs"])
            np.testing.assert_array_equal(ea["acts"], eb["acts"])
            assert ea["task"] == eb["task"]
            assert ea["is_success"] == eb["is_success"]


def test_export_episodes_order_after_eviction():
    buf = ReplayBuffer(3, max_len=64, min_len=10, backend="native")
    for e in range(5):
        imgs, acts = _episode(e, 30)
        buf.add_episode(f"task{e}", "agent", e, imgs, acts)
    eps = buf.export_episodes()
    # oldest-first: episodes 2, 3, 4 survive
    assert [e["task"] for e in eps] == ["task2", "task3", "task4"]
    assert [int(e["imgs"][0, 0, 0, 1]) for e in eps] == [2, 3, 4]
