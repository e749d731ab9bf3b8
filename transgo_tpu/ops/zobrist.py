"""Positional superko via Zobrist hashing (batched, optional).

The reference only enforces simple ko; its Zobrist machinery is commented
out (board.h:50-57, board.cc:45-75 "暂不支持"). This module supplies the
capability TPU-natively as an *opt-in* layer — default rules stay
reference-exact (the differential oracle suite depends on that).

Positions hash to two independent 32-bit Zobrist codes (64 bits of
collision resistance without requiring x64 mode). The forbidden-move mask
is computed for the whole board at once:

  h'(c) = h ^ Z[c, mover] ^ XOR{group-hash(g) : g enemy, in atari,
                                 adjacent to c}

where group hashes are XOR-reduced per group label via bit-plane popcount
parity (one one-hot MXU segment sum) — an atari group adjacent to an empty
c necessarily has its single liberty at c, so adjacency + liberties==1
identifies exactly the stones a play at c would capture. A candidate is forbidden iff h'(c)
matches any hash in the game's position history.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from flax import struct
from jax import lax

from transgo_tpu.ops.engine import BoardAnalysis, GoEngine
from transgo_tpu.ops.groups import (
    _pad1,
    label_onehot,
    root_read,
    segment_sum_by_label,
)
from transgo_tpu.ops.state import EMPTY, BoardSpec, GoState, opponent

_N_HASHES = 2


def _tables(spec: BoardSpec) -> jnp.ndarray:
    """uint32[n, 3, 2] Zobrist codes (color 0 row is zeros)."""
    if not hasattr(spec, "_ZOBRIST"):
        rng = np.random.default_rng(0xC0FFEE + spec.size)
        z = rng.integers(
            1, 2**32, size=(spec.num_points, 3, _N_HASHES), dtype=np.uint32
        )
        z[:, 0, :] = 0  # empty contributes nothing
        spec._ZOBRIST = jnp.asarray(z)
    return spec._ZOBRIST


def _xor_reduce(x: jnp.ndarray, axis: int) -> jnp.ndarray:
    return lax.reduce(
        x, jnp.uint32(0), lax.bitwise_xor, dimensions=(axis,)
    )


def position_hash(spec: BoardSpec, stones: jnp.ndarray) -> jnp.ndarray:
    """uint32[B, 2] positional hash of each board."""
    z = _tables(spec)                                   # [n, 3, 2]
    codes = z[jnp.arange(spec.num_points)[None, :],
              stones.astype(jnp.int32)]                 # [B, n, 2]
    return _xor_reduce(codes, axis=1)


@struct.dataclass
class SuperkoHistory:
    """Per-game ring of position hashes."""

    hashes: jnp.ndarray   # uint32[B, H, 2]
    count: jnp.ndarray    # int32[B] positions recorded


def superko_init(batch: int, spec: BoardSpec, max_moves: int,
                 initial: GoState | None = None) -> SuperkoHistory:
    h = jnp.zeros((batch, max_moves + 1, _N_HASHES), jnp.uint32)
    hist = SuperkoHistory(hashes=h, count=jnp.zeros((batch,), jnp.int32))
    if initial is not None:
        hist = superko_record(spec, hist, initial)
    return hist


def superko_record(spec: BoardSpec, hist: SuperkoHistory,
                   state: GoState) -> SuperkoHistory:
    """Append the state's position hash (call once per applied move)."""
    b = state.stones.shape[0]
    bar = jnp.arange(b)
    h = position_hash(spec, state.stones)
    idx = jnp.clip(hist.count, 0, hist.hashes.shape[1] - 1)
    return SuperkoHistory(
        hashes=hist.hashes.at[bar, idx].set(h),
        count=jnp.minimum(hist.count + 1, hist.hashes.shape[1]),
    )


def superko_forbidden(engine: GoEngine, state: GoState,
                      hist: SuperkoHistory,
                      analysis: BoardAnalysis | None = None) -> jnp.ndarray:
    """bool[B, n]: empty points whose play would recreate a previous
    position (positional superko)."""
    spec = engine.spec
    n = spec.num_points
    if analysis is None:
        analysis = engine.analyze(state)
    g = analysis.groups
    z = _tables(spec)
    b = state.stones.shape[0]
    player = state.next_player.astype(jnp.int32)
    opp = opponent(player)

    # per-stone group hash: XOR of member codes. XOR = per-bit popcount
    # parity, and the popcounts of all 64 bit planes fold in ONE one-hot
    # MXU segment sum by group label (boolean operands accumulate exactly
    # in f32; counts <= n <= 361) — no [B, n, n] reachability tensor.
    is_stone = state.stones > EMPTY
    codes = z[jnp.arange(n)[None, :], state.stones.astype(jnp.int32)]
    bitpos = jnp.arange(32, dtype=jnp.uint32)
    bits = ((codes[..., None] >> bitpos) & jnp.uint32(1)).astype(jnp.int32)
    bits = bits.reshape(b, n, _N_HASHES * 32)
    bits = jnp.where(is_stone[:, :, None], bits, 0)
    onehot = label_onehot(g.labels, n, valid=is_stone)
    agg = segment_sum_by_label(g.labels, bits, n, onehot=onehot)
    par = (agg.astype(jnp.int32) & 1)                    # [B, root, 64]
    # members read their group's 64 parity bits back through the same
    # one-hot (gather-free), then the bits recombine to two uint32 words
    stone_par = root_read(onehot, par).astype(jnp.uint32)
    stone_par = stone_par.reshape(b, n, _N_HASHES, 32)
    gxor = jnp.sum(
        stone_par << bitpos[None, None, None, :], axis=3, dtype=jnp.uint32
    )                                                    # [B, i, 2]

    # stones a play at empty c would capture: enemy groups in atari
    # adjacent to c (their single liberty is necessarily c)
    atari_enemy = (
        (state.stones == opp[:, None]) & (g.stone_libs == 1)
    )
    nbr = spec.NBR                                        # [n, 4]
    lbl_pad = _pad1(g.labels, jnp.int32(-1))
    nbr_lbl = lbl_pad[:, nbr]                             # [B, n, 4]
    cap_pad = _pad1(atari_enemy, False)
    nbr_cap = cap_pad[:, nbr]                             # [B, n, 4]
    # dedup groups appearing via multiple directions
    nl = jnp.where(nbr_cap, nbr_lbl, -1)
    d1 = nl[:, :, 1] == nl[:, :, 0]
    d2 = (nl[:, :, 2] == nl[:, :, 0]) | (nl[:, :, 2] == nl[:, :, 1])
    d3 = (
        (nl[:, :, 3] == nl[:, :, 0])
        | (nl[:, :, 3] == nl[:, :, 1])
        | (nl[:, :, 3] == nl[:, :, 2])
    )
    dup = jnp.stack([jnp.zeros_like(d1), d1, d2, d3], axis=2)
    use = nbr_cap & (nl >= 0) & ~dup                      # [B, n, 4]

    gxor_pad = jnp.concatenate(
        [gxor, jnp.zeros((b, 1, _N_HASHES), jnp.uint32)], axis=1
    )
    nbr_gxor = gxor_pad[:, nbr]                           # [B, n, 4, 2]
    cap_xor = _xor_reduce(
        jnp.where(use[..., None], nbr_gxor, jnp.uint32(0)), axis=2
    )                                                     # [B, n, 2]

    h = position_hash(spec, state.stones)                 # [B, 2]
    place = z[jnp.arange(n)[None, :], player[:, None]]    # [B, n, 2]
    h_cand = h[:, None, :] ^ place ^ cap_xor              # [B, n, 2]

    t_idx = jnp.arange(hist.hashes.shape[1])[None, :]
    valid = t_idx < hist.count[:, None]                   # [B, H]
    match = jnp.all(
        hist.hashes[:, None, :, :] == h_cand[:, :, None, :], axis=3
    )                                                     # [B, n, H]
    repeat = jnp.any(match & valid[:, None, :], axis=2)
    return repeat & (state.stones == 0)


def legal_board_no_superko(engine: GoEngine, state: GoState,
                           hist: SuperkoHistory,
                           analysis: BoardAnalysis | None = None):
    """Legal board mask with positional-superko repeats removed."""
    if analysis is None:
        analysis = engine.analyze(state)
    return analysis.legal_board & ~superko_forbidden(
        engine, state, hist, analysis
    )
