"""On-device replay ring.

The host-side buffer (replay.py) is a faithful port of the reference's, but
on this hardware it makes every train step pay a host->device transfer of
the sampled batch — measured as the training loop's bottleneck (and the
experimental axon tunnel leaks host memory per transfer). Since self-play
trajectories are *already on device*, the TPU-native design keeps the ring
there too (SURVEY.md section 2.3: "or fully on-device replay for small 9x9
samples"):

- appends are jitted scatters of drained trajectory chunks (masked rows
  drop out of bounds);
- sampling fuses into the train step — sample + random D4 augmentation +
  SGD run as ONE jitted program with zero host traffic;
- storage is compact: binary feature planes as uint8, ownership labels as
  int8 (a 400K-sample 9x9 ring is ~450 MB of HBM).

Known deviation: sampling is uniform WITH replacement (the reference samples
without replacement when the buffer is large enough, replay_buffer.py:45);
at buffer >> batch the collision probability is negligible.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct


@struct.dataclass
class DeviceReplay:
    # obs rows are stored FLATTENED [cap, H*W*C]: TPU tiled layouts pad the
    # two minor dims (sublanes to 8, lanes to 128), so u8[cap, 9, 9, 10]
    # materializes as [cap, 16, 128] tiles — a 22x HBM blow-up that OOMs at
    # the reference's 1.5M capacity. Flat rows pad 810 -> 1024 lanes only.
    obs: jnp.ndarray     # uint8 [cap, H*W*C]
    pi: jnp.ndarray      # float32 [cap, A]
    win_z: jnp.ndarray   # float32 [cap]
    own_z: jnp.ndarray   # int8 [cap, own_dim]
    index: jnp.ndarray   # int32 write pointer
    full: jnp.ndarray    # bool
    obs_shape: Tuple[int, int, int] = struct.field(pytree_node=False)

    @property
    def capacity(self) -> int:
        return self.obs.shape[0]

    def size(self) -> jnp.ndarray:
        return jnp.where(self.full, self.capacity, self.index)


def device_replay_init(capacity: int, obs_size: int, channels: int,
                       num_actions: int, own_dim: int) -> DeviceReplay:
    return DeviceReplay(
        obs=jnp.zeros((capacity, obs_size * obs_size * channels), jnp.uint8),
        pi=jnp.zeros((capacity, num_actions), jnp.float32),
        win_z=jnp.zeros((capacity,), jnp.float32),
        own_z=jnp.zeros((capacity, own_dim), jnp.int8),
        index=jnp.zeros((), jnp.int32),
        full=jnp.zeros((), bool),
        obs_shape=(obs_size, obs_size, channels),
    )


def append_chunk(replay: DeviceReplay, obs, pi, win_z, own_z,
                 valid) -> DeviceReplay:
    """Ring-write the valid rows of a drained trajectory chunk.

    Args:
      obs:   uint8 [D, T, H, W, C]
      pi:    float32 [D, T, A]
      win_z: float32 [D, T]
      own_z: float32/int8 [D, T, own_dim]
      valid: bool [D, T] rows to store (game g's first length[g] moves of a
             finished game; everything else drops).
    """
    cap = replay.capacity
    flat_valid = valid.reshape(-1)
    k = flat_valid.shape[0]
    # pack valid rows to consecutive ring slots
    offset = jnp.cumsum(flat_valid.astype(jnp.int32)) - 1
    slot = (replay.index + offset) % cap
    slot = jnp.where(flat_valid, slot, cap)          # OOB -> dropped

    def wr(dst, src, dtype):
        flat = src.reshape((k,) + dst.shape[1:]).astype(dtype)
        return dst.at[slot].set(flat, mode="drop")

    n_new = jnp.sum(flat_valid.astype(jnp.int32))
    new_index = (replay.index + n_new) % cap
    wrapped = replay.index + n_new >= cap
    return replay.replace(
        obs=wr(replay.obs, obs, jnp.uint8),
        pi=wr(replay.pi, pi, jnp.float32),
        win_z=wr(replay.win_z, win_z, jnp.float32),
        own_z=wr(replay.own_z, own_z, jnp.int8),
        index=new_index,
        full=replay.full | wrapped,
    )


def sample(replay: DeviceReplay, key, batch_size: int):
    """Uniform sample (with replacement) -> float32 training batch."""
    size = jnp.maximum(replay.size(), 1)
    idx = jax.random.randint(key, (batch_size,), 0, size)
    return (
        replay.obs[idx]
        .reshape((batch_size,) + replay.obs_shape)
        .astype(jnp.float32),
        replay.pi[idx],
        replay.win_z[idx],
        replay.own_z[idx].astype(jnp.float32),
    )


def to_host_buffer(replay: DeviceReplay, host_buffer) -> None:
    """Copy the device ring into a host ReplayBuffer (for the segmented
    pickle persistence path)."""
    import numpy as np

    host_buffer.obs[:] = np.asarray(replay.obs, dtype=np.float32).reshape(
        (replay.capacity,) + replay.obs_shape
    )
    host_buffer.pi[:] = np.asarray(replay.pi)
    host_buffer.win_z[:] = np.asarray(replay.win_z)
    host_buffer.own_z[:] = np.asarray(replay.own_z, dtype=np.float32)
    host_buffer.index = int(replay.index)
    host_buffer.full = bool(replay.full)
