"""ctypes binding for the native episode store (`native/replay/
replay_store.cpp`).

`NativeEpisodeStore` keeps every episode in one preallocated C++ slab and
assembles hindsight batches with parallel memcpy — the accelerated backend
behind `ReplayBuffer(backend='native')`. Falls back cleanly when the shared
library has not been built (`make -C native`).
"""

from __future__ import annotations

import ctypes
import os
import threading
from typing import Optional, Tuple

import numpy as np

_LIB_PATH = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "_native",
    "libv2a_replay.so",
)

_lib = None
_lib_err: Optional[str] = None


def _load_lib():
    global _lib, _lib_err
    if _lib is not None or _lib_err is not None:
        return _lib
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        _lib_err = str(e)
        return None
    lib.v2a_store_create.restype = ctypes.c_void_p
    lib.v2a_store_create.argtypes = [ctypes.c_int64] * 6
    lib.v2a_store_destroy.argtypes = [ctypes.c_void_p]
    lib.v2a_store_len.restype = ctypes.c_int64
    lib.v2a_store_len.argtypes = [ctypes.c_void_p]
    lib.v2a_store_total_added.restype = ctypes.c_int64
    lib.v2a_store_total_added.argtypes = [ctypes.c_void_p]
    lib.v2a_store_add_episode.restype = ctypes.c_int64
    lib.v2a_store_add_episode.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float),
        ctypes.c_int64,
    ]
    lib.v2a_store_sample_batch.restype = ctypes.c_int32
    lib.v2a_store_sample_batch.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.c_int64,
        ctypes.c_uint64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_int64),
        ctypes.c_int32,
    ]
    lib.v2a_store_episode_len.restype = ctypes.c_int64
    lib.v2a_store_episode_len.argtypes = [ctypes.c_void_p, ctypes.c_int64]
    lib.v2a_store_get_episode.restype = ctypes.c_int32
    lib.v2a_store_get_episode.argtypes = [
        ctypes.c_void_p,
        ctypes.c_int64,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float),
    ]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load_lib() is not None


class NativeEpisodeStore:
    """One (image_shape, act_dim) store; thread-safe via a Python lock."""

    def __init__(
        self,
        max_episodes: int,
        max_len: int,
        img_hw: Tuple[int, int],
        act_dim: int,
        channels: int = 3,
        n_threads: int = 4,
    ):
        lib = _load_lib()
        if lib is None:
            raise RuntimeError(
                f"native replay library not built ({_lib_err}); "
                "run `make -C native`"
            )
        self._lib = lib
        self.h, self.w, self.c = img_hw[0], img_hw[1], channels
        self.act_dim = act_dim
        self.max_len = max_len
        self.n_threads = n_threads
        self._lock = threading.Lock()
        self._ptr = lib.v2a_store_create(
            max_episodes, max_len, self.h, self.w, self.c, act_dim
        )
        if not self._ptr:
            raise MemoryError("v2a_store_create failed")

    def __del__(self):
        ptr = getattr(self, "_ptr", None)
        if ptr:
            self._lib.v2a_store_destroy(ptr)
            self._ptr = None

    def __len__(self) -> int:
        return int(self._lib.v2a_store_len(self._ptr))

    @property
    def total_added(self) -> int:
        return int(self._lib.v2a_store_total_added(self._ptr))

    def add_episode(self, imgs: np.ndarray, acts: np.ndarray) -> int:
        imgs = np.ascontiguousarray(imgs, np.uint8)
        acts = np.ascontiguousarray(acts, np.float32)
        if imgs.shape[1:] != (self.h, self.w, self.c):
            raise ValueError(f"image shape {imgs.shape} != store shape")
        if acts.shape != (len(imgs) - 1, self.act_dim):
            raise ValueError("need (T, act_dim) actions for T+1 images")
        with self._lock:
            slot = self._lib.v2a_store_add_episode(
                self._ptr,
                imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                acts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                len(imgs),
            )
        if slot < 0:
            raise ValueError("add_episode rejected (need >= 2 images)")
        return int(slot)

    def sample_batch(self, batch: int, horizon: int, seed: int):
        """Returns (img_obs u8 (B,H,W,3), img_goal u8, action f32
        (B,horizon,Da), ep_slots i64 (B,))."""
        obs = np.empty((batch, self.h, self.w, self.c), np.uint8)
        goal = np.empty_like(obs)
        acts = np.empty((batch, horizon, self.act_dim), np.float32)
        slots = np.empty((batch,), np.int64)
        with self._lock:
            rc = self._lib.v2a_store_sample_batch(
                self._ptr, batch, horizon, ctypes.c_uint64(seed & (2**64 - 1)),
                obs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                goal.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                acts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                slots.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
                self.n_threads,
            )
        if rc == -2:
            raise RuntimeError("sampling from an empty store")
        if rc == -3:
            raise ValueError("an episode shorter than horizon+1 was drawn")
        if rc != 0:
            raise RuntimeError(f"native sample_batch failed (rc={rc})")
        return obs, goal, acts, slots

    def episode_len(self, live_idx: int) -> int:
        return int(self._lib.v2a_store_episode_len(self._ptr, live_idx))

    def get_episode(self, live_idx: int):
        """Copy one episode out: (imgs uint8 (T+1,H,W,C), acts f32 (T,Da))."""
        n = self.episode_len(live_idx)
        if n < 0:
            raise IndexError(f"live index {live_idx} out of range")
        imgs = np.empty((n, self.h, self.w, self.c), np.uint8)
        acts = np.empty((n - 1, self.act_dim), np.float32)
        with self._lock:
            rc = self._lib.v2a_store_get_episode(
                self._ptr, live_idx,
                imgs.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                acts.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
        if rc != 0:
            raise RuntimeError(f"get_episode failed (rc={rc})")
        return imgs, acts
