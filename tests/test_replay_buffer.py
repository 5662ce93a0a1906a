"""Tests for the replay buffer and HDF5 ingestion layer."""

import numpy as np
import pytest

from v2a_tpu.data.h5_ingest import (
    H5IngestError,
    add_episodes_to_buffer,
    validate_and_clip_actions,
    write_randsam_file,
)
from v2a_tpu.data.replay_buffer import EpisodeBuffer, ReplayBuffer, merge_batches


def _episode(T=40, h=8, w=8, seed=0):
    rs = np.random.RandomState(seed)
    imgs = rs.randint(0, 255, (T + 1, h, w, 3), dtype=np.uint8)
    acts = rs.uniform(-1, 1, (T, 7)).astype(np.float32)
    return imgs, acts


def test_episode_validation():
    imgs, acts = _episode()
    with pytest.raises(ValueError):
        EpisodeBuffer("t", "c", 0, imgs[:-1], acts)  # length mismatch
    with pytest.raises(TypeError):
        EpisodeBuffer("t", "c", 0, imgs.astype(np.float32), acts)


def test_episode_truncation_keeps_most_recent():
    imgs, acts = _episode(T=50)
    ep = EpisodeBuffer("t", "c", 0, imgs, acts, max_len=31)
    assert len(ep.imgs) == 31 and len(ep.acts) == 30
    np.testing.assert_array_equal(ep.imgs[-1], imgs[-1])
    np.testing.assert_array_equal(ep.acts[-1], acts[-1])


def test_episode_continuity_check():
    imgs, acts = _episode(T=30)
    ep = EpisodeBuffer("t", "c", 0, imgs, acts, max_len=700)
    imgs2, acts2 = _episode(T=10, seed=1)
    imgs2[0] = imgs[-1]  # valid continuation
    ep.append_seq(imgs2, acts2)
    assert len(ep) == 41
    # broken continuity raises
    imgs3, acts3 = _episode(T=5, seed=2)
    with pytest.raises(ValueError, match="continuity"):
        ep.append_seq(imgs3, acts3)


def test_fifo_eviction_and_history_count():
    # inspects the python-backend deque directly
    buf = ReplayBuffer(max_episodes=3, min_len=5, backend="python")
    for i in range(5):
        imgs, acts = _episode(T=20, seed=i)
        buf.add_episode(f"task{i}", "cam", i, imgs, acts)
    assert len(buf) == 3
    assert buf.cnt_all_history_episodes == 5
    assert [ep.task for ep in buf.episodes] == ["task2", "task3", "task4"]


def test_sample_batch_hindsight_relabeling():
    buf = ReplayBuffer(max_episodes=10, min_len=5, sample_act_seq_len=16)
    imgs, acts = _episode(T=40)
    buf.add_episode("taskA", "agent", 7, imgs, acts)
    rng = np.random.default_rng(0)
    batch = buf.sample_batch(6, rng)
    assert batch["img_obs"].shape == (6, 8, 8, 3)
    assert batch["img_obs"].dtype == np.uint8
    assert batch["action"].shape == (6, 16, 7)
    assert batch["task"] == ["taskA"] * 6
    assert (batch["env_idx"] == 7).all()
    # verify the goal is exactly `horizon` steps after the start, with the
    # executed actions in between: reconstruct from the source episode
    for i in range(6):
        # find the start index by matching the obs frame
        matches = np.where(
            (imgs == batch["img_obs"][i]).all(axis=(1, 2, 3))
        )[0]
        assert len(matches) >= 1
        s = matches[0]
        np.testing.assert_array_equal(batch["img_goal"][i], imgs[s + 16])
        np.testing.assert_array_equal(batch["action"][i], acts[s : s + 16])


def test_sample_batch_short_episode_rejected():
    buf = ReplayBuffer(max_episodes=4, min_len=5, sample_act_seq_len=16)
    imgs, acts = _episode(T=10)
    buf.add_episode("t", "c", 0, imgs, acts)
    with pytest.raises(ValueError, match="horizon"):
        buf.sample_batch(2, np.random.default_rng(0))


def test_merge_batches():
    buf1 = ReplayBuffer(max_episodes=4, min_len=5)
    buf2 = ReplayBuffer(max_episodes=4, min_len=5)
    i1, a1 = _episode(T=30, seed=3)
    i2, a2 = _episode(T=30, seed=4)
    buf1.add_episode("rand", "c", 0, i1, a1)
    buf2.add_episode("vid", "c", 1, i2, a2)
    rng = np.random.default_rng(1)
    merged = merge_batches(
        [buf1.sample_batch(3, rng), buf2.sample_batch(5, rng)]
    )
    assert merged["img_obs"].shape[0] == 8
    assert merged["task"] == ["rand"] * 3 + ["vid"] * 5


def test_action_range_validation():
    acts = np.asarray([[0.0] * 7, [1.011] * 7], np.float32)
    amin, amax = np.full(7, -1.0, np.float32), np.full(7, 1.0, np.float32)
    out = validate_and_clip_actions(acts, amin, amax)
    assert out.max() <= 1.0
    bad = np.asarray([[1.5] * 7], np.float32)
    with pytest.raises(H5IngestError):
        validate_and_clip_actions(bad, amin, amax)


def test_h5_roundtrip(tmp_path):
    path = str(tmp_path / "randsam.hdf5")
    eps = {}
    for t in ("open the drawer", "close the jar"):
        eps[t] = [_episode(T=35, seed=hash(t) % 100 + k) for k in range(3)]
    write_randsam_file(path, eps, read_only=False)

    buf = ReplayBuffer(max_episodes=100, min_len=5)
    steps = add_episodes_to_buffer(
        path, buf, list(eps), 0, 2,
        act_min=np.full(7, -1.0, np.float32),
        act_max=np.full(7, 1.0, np.float32),
    )
    assert len(buf) == 4  # 2 eps x 2 tasks
    assert steps == 4 * 35
    # requesting beyond available episodes is a clean no-op
    steps2 = add_episodes_to_buffer(
        path, buf, list(eps), 2, 10,
        act_min=np.full(7, -1.0, np.float32),
        act_max=np.full(7, 1.0, np.float32),
    )
    assert len(buf) == 6 and steps2 == 2 * 35
