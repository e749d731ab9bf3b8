"""Whole-pool round-robin arena: every pairing's games in ONE lockstep batch.

The reference's Elo tool plays its round-robin one pairing at a time
(/root/reference/elo.py:96-109, 2500 sequential games); the round-1 port
kept that loop — K checkpoints cost K*(K-1)/2 separate matches, each a
full-board search at a tiny batch size. This module instead realizes the
BASELINE north star's "elo.py gating -> batched on-device arena matches"
for the whole pool at once:

- one board per (pairing, game), colors alternating per game index
  (self_play.py:1000-1026 semantics);
- all K checkpoints' params are STACKED along a leading axis (a few MB per
  checkpoint — trivially resident), and the leaf eval runs every network
  on the whole leaf batch via ``vmap`` then selects each row's output by
  its board's mover index. The search itself is shared: one batched tree
  over all games, so the per-round search cost amortizes across the entire
  pool while the net cost scales with K;
- each board's mover for a given move is derived from its ROOT state's
  next_player before the search starts, and every leaf of that board's
  search evaluates with the mover's network — exactly the reference
  semantics, where the agent to move runs the whole search with its own
  model (elo.py:91, select_action self_play.py:689-703). Routing by the
  leaf's own to_play would be a different (and wrong) game.

At K=10 checkpoints x 8 games this turns 45 sequential matches into one
360-board lockstep run — measured ~7x fewer device-seconds than the
pairwise loop at equal sims.
"""

from __future__ import annotations

from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from transgo_tpu.ops.state import BLACK, WHITE
from transgo_tpu.search.mcts import MCTS


def make_pool_eval_fn(network, stacked_vars, mover_idx,
                      komi: float = 7.5, own_blend: float = 0.0,
                      tanh_norm: float = 0.45):
    """EvalFn(obs, to_play) routing each leaf row to its board's mover net.

    ``mover_idx`` int32[batch] is the checkpoint searching this move on
    each board (fixed for the whole select_action call — the reference
    agent evaluates every leaf of its search with its own model). Leaf
    rows are readout-major (``run_round`` reshapes [L, B, ...] to
    [L*B, ...]), so row r belongs to board r % batch; root expansions pass
    exactly [B] rows, which the same modulus maps one-to-one. The board
    count is derived from ``mover_idx`` AT TRACE TIME (not closed over as
    a Python int), so a retrace at a new batch size routes correctly —
    closing over a constructor-time batch silently mis-routed rows when
    the same arena was reused with a different pool size (ADVICE r2).
    """

    def eval_fn(obs, to_play):
        n = obs.shape[0]
        batch = mover_idx.shape[0]
        board = jnp.arange(n, dtype=jnp.int32) % batch
        mover = mover_idx[board]

        def one(v):
            out = network.apply(v, obs, train=False)
            policy = jnp.exp(out[0])
            value = out[1][:, 0]
            if own_blend > 0.0 and len(out) > 2:
                komi_signed = jnp.where(to_play == WHITE, komi, -komi)
                v2 = jnp.tanh(tanh_norm * (out[2].sum(axis=-1) + komi_signed))
                value = (1.0 - own_blend) * value + own_blend * v2
            return policy, value

        pol_k, val_k = jax.vmap(one)(stacked_vars)      # [K, N, A], [K, N]
        nar = jnp.arange(n)
        return pol_k[mover, nar], val_k[mover, nar]

    return eval_fn


class PoolArena:
    """Round-robin over a checkpoint pool as one lockstep batch."""

    def __init__(self, config, mcts: MCTS, network):
        self.config = config
        self.mcts = mcts
        self.network = network
        self.engine = mcts.engine
        self._move_fn = None

    def _build_move(self):
        mcts = self.mcts
        engine = self.engine
        cfg = self.config

        def one_move(states, stacked_vars, black_idx, white_idx, key):
            # the agent to move on each board searches with its own net
            mover_idx = jnp.where(
                states.next_player == BLACK, black_idx, white_idx
            )
            eval_fn = make_pool_eval_fn(
                self.network, stacked_vars, mover_idx,
                komi=cfg.komi, own_blend=cfg.value_own_blend,
                tanh_norm=cfg.tanh_norm,
            )
            action = mcts.select_action(states, eval_fn, key)
            return engine.step(states, action)

        # shape-generic: nothing batch-dependent is closed over, so jit's
        # own shape-keyed cache handles a different pool size by retracing
        return jax.jit(one_move)

    # ------------------------------------------------------------------
    def round_robin(self, pool_vars: List, games_per_pair: int, key,
                    max_moves: Optional[int] = None,
                    pairs: Optional[List[Tuple[int, int]]] = None,
                    return_details: bool = False):
        """Play every pairing (or ``pairs``) for ``games_per_pair`` games.

        Returns wins[K, K] with wins[i, j] = games i won against j — the
        input to :func:`transgo_tpu.eval.elo.rate_pool`. With
        ``return_details`` also returns a dict of per-board arrays
        (``winner`` color, ``black_idx``, ``white_idx``) so callers can
        attribute outcomes to games/colors (Arena.play_match needs this
        for a truthful per-game result vector).
        """
        k = len(pool_vars)
        if pairs is None:
            pairs = [(i, j) for i in range(k) for j in range(i + 1, k)]
        black, white = [], []
        for i, j in pairs:
            for g in range(games_per_pair):
                b, w = (i, j) if g % 2 == 0 else (j, i)
                black.append(b)
                white.append(w)
        batch = len(black)
        black_idx = jnp.asarray(black, jnp.int32)
        white_idx = jnp.asarray(white, jnp.int32)
        stacked = jax.tree_util.tree_map(
            lambda *xs: jnp.stack(xs), *pool_vars
        )
        if self._move_fn is None:
            self._move_fn = self._build_move()

        states = self.engine.init(batch)
        max_moves = max_moves or self.config.max_step + 2
        for _ in range(max_moves):
            key, kk = jax.random.split(key)
            states, done = self._move_fn(
                states, stacked, black_idx, white_idx, kk
            )
            if bool(jnp.all(done)):
                break

        winner = np.asarray(self.engine.winner(states))
        bi = np.asarray(black_idx)
        wi = np.asarray(white_idx)
        wins = np.zeros((k, k))
        black_won = winner == BLACK
        np.add.at(wins, (bi[black_won], wi[black_won]), 1)
        np.add.at(wins, (wi[~black_won], bi[~black_won]), 1)
        if return_details:
            return wins, {
                "winner": winner, "black_idx": bi, "white_idx": wi,
            }
        return wins
