"""D4 (rotation/reflection) symmetry transforms for observations, policies
and ownership maps.

Re-implements the reference's 8x data augmentation (self_play.py:943-965):
four counter-clockwise rotations x optional left-right flip, with the pass
probability carried through untouched. The TPU design applies a *random*
symmetry at sample time by default (Config.augment_mode="sample") instead of
eagerly appending 8 copies per position.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def transform_plane(x: jnp.ndarray, sym: jnp.ndarray) -> jnp.ndarray:
    """Apply D4 symmetry ``sym`` in [0, 8) to trailing [..., H, W] dims.

    sym = k + 4*f: rotate 90° CCW ``k+1`` times (matching np.rot90 with
    i in [1..4], self_play.py:944), then fliplr if ``f``.
    """
    k = sym % 4 + 1
    f = sym // 4

    def rot(i, v):
        return jnp.rot90(v, 1, axes=(-2, -1))

    x = jax.lax.fori_loop(0, k, rot, x)
    return jax.lax.cond(f == 1, lambda v: jnp.flip(v, axis=-1), lambda v: v, x)


def transform_policy(pi: jnp.ndarray, sym: jnp.ndarray, size: int) -> jnp.ndarray:
    """Apply symmetry to a [..., size*size + 1] policy (pass kept aside)."""
    board, passp = pi[..., :-1], pi[..., -1:]
    board = transform_plane(
        board.reshape(board.shape[:-1] + (size, size)), sym
    ).reshape(board.shape)
    return jnp.concatenate([board, passp], axis=-1)


def transform_own(own: jnp.ndarray, sym: jnp.ndarray, size: int) -> jnp.ndarray:
    """Apply symmetry to a flat [..., size*size] ownership map."""
    return transform_plane(
        own.reshape(own.shape[:-1] + (size, size)), sym
    ).reshape(own.shape)


def _perm_table(size: int):
    """int32[8, size*size] flat-index permutation per D4 symmetry:
    out.flat[i] = in.flat[perm[s, i]] reproduces transform_plane(x, s).
    Computed once per board size with numpy at trace time."""
    import numpy as np

    n = size * size
    base = np.arange(n).reshape(size, size)
    perms = []
    for s in range(8):
        m = base
        for _ in range(s % 4 + 1):
            m = np.rot90(m)
        if s // 4:
            m = np.fliplr(m)
        perms.append(m.reshape(n))
    return jnp.asarray(np.stack(perms), jnp.int32)


def random_symmetry_batch(key, obs, pi, own, size: int):
    """Per-sample random D4 transform of an (obs[NHWC], pi, own) batch.

    One gather per tensor against a precomputed [8, H*W] permutation table
    — the rot90/flip formulation (transform_plane) vmapped over the batch
    lowers to a masked per-sample while_loop of full-array copies, which is
    the fused sample+augment+train step's avoidable overhead."""
    b, h, w, c = obs.shape
    n = size * size
    syms = jax.random.randint(key, (b,), 0, 8)
    perm = _perm_table(size)[syms]                       # [B, n]

    obs_t = jnp.take_along_axis(
        obs.reshape(b, n, c), perm[:, :, None], axis=1
    ).reshape(b, h, w, c)
    board_t = jnp.take_along_axis(pi[:, :n], perm, axis=1)
    pi_t = jnp.concatenate([board_t, pi[:, n:]], axis=1)
    own_t = jnp.take_along_axis(own, perm, axis=1)
    return obs_t, pi_t, own_t


def all_symmetries(obs_chw: jnp.ndarray, pi: jnp.ndarray, own: jnp.ndarray,
                   size: int):
    """All 8 transforms of one sample (reference eager augmentation parity).

    Args:
      obs_chw: [C, H, W] observation.
    Returns:
      (obs8 [8, C, H, W], pi8 [8, A], own8 [8, n])
    """
    outs = [
        (
            transform_plane(obs_chw, jnp.asarray(s)),
            transform_policy(pi, jnp.asarray(s), size),
            transform_own(own, jnp.asarray(s), size),
        )
        for s in range(8)
    ]
    return tuple(jnp.stack(t) for t in zip(*outs))
