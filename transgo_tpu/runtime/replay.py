"""Host-side replay buffer.

Port of ``ReplayMemory_Random`` (/root/reference/replay_buffer.py:16-94) with
the same ring/write/sample semantics and the same segmented persistence
scheme, but stored as preallocated *typed* numpy arrays instead of an
object-dtype ndarray of tuples — sampling produces contiguous batches that
feed device transfer without per-row pickling.

Sample record (reference replay_buffer.py:26-27):
  observation [H, W, C] float32 (NHWC here; reference stores CHW),
  pi          [A] float32,
  win_z       scalar float32,
  own_z       [n] float32.

The prioritized variant (``ReplayMemory_PER`` + ``SegmentTree``,
replay_buffer.py:102-245) is dormant in the reference (never constructed —
the factory always returns the random buffer, replay_buffer.py:7-10);
:class:`PrioritizedReplayBuffer` provides the equivalent here.
"""

from __future__ import annotations

import pickle
from typing import Dict, Optional, Tuple

import numpy as np


class ReplayBuffer:
    """Uniform ring buffer (ReplayMemory_Random, replay_buffer.py:16-94)."""

    def __init__(self, capacity: int, board_size: int, channels: int,
                 num_actions: int | None = None, own_dim: int | None = None):
        self.capacity = int(capacity)
        self.board_size = board_size
        self.channels = channels
        n = board_size * board_size
        num_actions = num_actions or n + 1
        own_dim = own_dim or n
        self.obs = np.zeros(
            (self.capacity, board_size, board_size, channels), np.float32
        )
        self.pi = np.zeros((self.capacity, num_actions), np.float32)
        self.win_z = np.zeros((self.capacity,), np.float32)
        self.own_z = np.zeros((self.capacity, own_dim), np.float32)
        self.index = 0
        self.full = False
        self.last_save_index = 0
        self.load_index = 0

    def __len__(self):
        return self.capacity if self.full else self.index

    # ------------------------------------------------------------------
    def append_batch(self, obs, pi, win_z, own_z):
        """Vectorized ring write of k samples (append, replay_buffer.py:30-34)."""
        k = obs.shape[0]
        idx = (self.index + np.arange(k)) % self.capacity
        self.obs[idx] = obs
        self.pi[idx] = pi
        self.win_z[idx] = win_z
        self.own_z[idx] = own_z
        wrapped = self.index + k >= self.capacity
        self.index = int((self.index + k) % self.capacity)
        self.full = self.full or wrapped

    # ------------------------------------------------------------------
    def sample(self, batch_size: int, rng: np.random.Generator):
        """Uniform sample; without replacement when possible
        (sample, replay_buffer.py:36-47)."""
        size = len(self)
        if size == 0:
            raise ValueError("empty replay buffer")
        replace = size < batch_size
        idx = rng.choice(size, batch_size, replace=replace)
        return (
            self.obs[idx], self.pi[idx], self.win_z[idx], self.own_z[idx]
        )

    # ------------------------------------------------------------------
    # segmented persistence (save/load, replay_buffer.py:49-87)
    SEGMENT = 1_000_000
    MIN_DELTA = 300_000

    def save_segment(self) -> Optional[Dict]:
        """Full dump for small buffers; rolling 1M-sample window with
        since-last-save dedup for large ones."""
        if self.capacity <= 1_500_000:
            return {
                "buffer_capacity": self.capacity,
                "index": self.index,
                "full": self.full,
                "data": self._slice_all(),
                "save_len": self.capacity,
            }
        delta = self.index - self.last_save_index
        if 0 < delta < self.MIN_DELTA:
            return None
        if delta < 0 and self.index < self.MIN_DELTA:
            return None
        save_len = min(self.SEGMENT, self.index)
        sl = slice(self.index - save_len, self.index)
        self.last_save_index = self.index
        return {
            "buffer_capacity": self.capacity,
            "data": self._slice(sl),
            "save_len": save_len,
            "index": self.index,
        }

    def _slice(self, sl) -> Dict[str, np.ndarray]:
        return {
            "obs": self.obs[sl], "pi": self.pi[sl],
            "win_z": self.win_z[sl], "own_z": self.own_z[sl],
        }

    def _slice_all(self):
        return self._slice(slice(0, self.capacity))

    def load_segment(self, seg: Dict) -> bool:
        """Splice a saved segment back (load, replay_buffer.py:74-87).

        Full dumps additionally carry index/full and are restored exactly
        (the reference's load ignored them, resurrecting blank rows into the
        sampled range for partially-filled buffers — fixed here)."""
        data = seg["data"]
        save_len = seg["save_len"]
        if "full" in seg and save_len == self.capacity:
            sl = slice(0, self.capacity)
            self.obs[sl] = data["obs"]
            self.pi[sl] = data["pi"]
            self.win_z[sl] = data["win_z"]
            self.own_z[sl] = data["own_z"]
            self.index = int(seg["index"])
            self.full = bool(seg["full"])
            self.load_index = self.index
            return self.full
        if self.load_index + save_len < self.capacity:
            sl = slice(self.load_index, self.load_index + save_len)
            cut = save_len
            self.load_index += save_len
        else:
            cut = self.capacity - self.load_index
            sl = slice(self.load_index, self.capacity)
            self.load_index = 0
            self.full = True
        self.obs[sl] = data["obs"][:cut]
        self.pi[sl] = data["pi"][:cut]
        self.win_z[sl] = data["win_z"][:cut]
        self.own_z[sl] = data["own_z"][:cut]
        self.index = self.load_index
        return self.full

    def save_to(self, path) -> bool:
        seg = self.save_segment()
        if seg is None:
            return False
        with open(path, "wb") as f:
            pickle.dump(seg, f, protocol=4)
        return True

    def load_from(self, path) -> bool:
        with open(path, "rb") as f:
            seg = pickle.load(f)
        return self.load_segment(seg)

    def info(self) -> Dict:
        """replay_buffer.py:89-94."""
        return {
            "capacity": self.capacity, "index": self.index, "full": self.full
        }


class SumTree:
    """Vectorized binary sum-tree (SegmentTree, replay_buffer.py:170-245)."""

    def __init__(self, size: int):
        self.size = size
        self.index = 0
        self.full = False
        self.tree_start = 2 ** (size - 1).bit_length() - 1
        self.tree = np.zeros((self.tree_start + size,), np.float64)
        self.max = 1.0

    def _propagate(self, indices: np.ndarray):
        while True:
            parents = np.unique((indices - 1) // 2)
            children = parents[:, None] * 2 + np.array([1, 2])
            safe = np.minimum(children, len(self.tree) - 1)
            self.tree[parents] = self.tree[safe].sum(axis=1)
            if parents[0] == 0:
                return
            indices = parents

    def update(self, data_indices: np.ndarray, values: np.ndarray):
        idx = data_indices + self.tree_start
        self.tree[idx] = values
        self._propagate(idx)
        self.max = max(float(values.max()), self.max)

    def append(self, k: int, value: float):
        idx = (self.index + np.arange(k)) % self.size
        self.update(idx, np.full(k, value))
        self.index = int((self.index + k) % self.size)
        self.full = self.full or self.index == 0

    def find(self, values: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
        """Vectorized descent (replay_buffer.py:222-239)."""
        idx = np.zeros(values.shape, np.int64)
        v = values.copy()
        while True:
            children = idx[:, None] * 2 + np.array([1, 2])  # [k, 2]
            if children[0, 0] >= len(self.tree):
                break
            children = np.minimum(children, len(self.tree) - 1)
            left = self.tree[children[:, 0]]
            go_right = v > left
            idx = np.where(go_right, children[:, 1], children[:, 0])
            v = v - go_right * left
        data_idx = idx - self.tree_start
        return self.tree[idx], data_idx

    def total(self) -> float:
        return float(self.tree[0])


class PrioritizedReplayBuffer(ReplayBuffer):
    """Proportional PER over the typed ring
    (ReplayMemory_PER, replay_buffer.py:102-167)."""

    def __init__(self, capacity, board_size, channels,
                 num_actions: int | None = None, own_dim: int | None = None,
                 priority_exponent: float = 0.45):
        # priority_exponent default matches the reference's dormant PER
        # config (scale_train_live/configure.py:25)
        super().__init__(capacity, board_size, channels, num_actions, own_dim)
        self.priority_exponent = priority_exponent
        self.tree = SumTree(self.capacity)

    def append_batch(self, obs, pi, win_z, own_z):
        k = obs.shape[0]
        super().append_batch(obs, pi, win_z, own_z)
        self.tree.append(k, self.tree.max)

    def sample(self, batch_size: int, rng: np.random.Generator):
        total = self.tree.total()
        seg = total / batch_size
        starts = np.arange(batch_size) * seg
        for _ in range(64):
            vals = rng.uniform(0.0, seg, batch_size) + starts
            probs, idx = self.tree.find(vals)
            if (probs > 0).all() and (idx < self.capacity).all():
                break
        idx = np.clip(idx, 0, len(self) - 1)
        batch = (self.obs[idx], self.pi[idx], self.win_z[idx], self.own_z[idx])
        return batch + (idx,)

    def update_priorities(self, idx: np.ndarray, priorities: np.ndarray):
        self.tree.update(idx, priorities ** self.priority_exponent)
