"""Batched arena matches and the evaluation gate.

Replaces the reference evaluator (SelfPlay.policy_evaluate,
self_play.py:986-1040): the challenger plays the frozen gate model for
``evaluate_games`` games with alternating colors, each move searched with a
fresh root at evaluation temperature 0.12 and no Dirichlet noise
(select_action, self_play.py:689-703). A clean sweep raises the gate score
by 100 and freezes the challenger as the new opponent
(self_play.py:1035-1038).

All games run in lockstep on device. Color assignment is fixed per game
GROUP (A holds black in the first half, white in the second) instead of
alternating within one batch: plies advance in lockstep, so within a group
the scheduled mover is the same for every board at every ply and only ONE
agent's search runs per move — half the compute of the round-1 version
that ran both searches and selected by mover mask.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from transgo_tpu.models.nets import TransGoNetwork
from transgo_tpu.ops.state import BLACK, WHITE, GoState
from transgo_tpu.search.mcts import MCTS


class MatchResult(NamedTuple):
    challenger_wins: np.ndarray  # bool per game
    win_ratio: float


class Arena:
    def __init__(self, config, mcts: MCTS, network: TransGoNetwork):
        self.config = config
        self.mcts = mcts
        self.network = network
        self.engine = mcts.engine
        self._move_fn = None

    def _eval_fn(self, variables):
        from transgo_tpu.search.evalfn import make_eval_fn

        return make_eval_fn(
            self.network, variables, komi=self.config.komi,
            own_blend=self.config.value_own_blend,
            tanh_norm=self.config.tanh_norm,
        )

    def _build_move(self):
        mcts = self.mcts
        engine = self.engine

        def one_move(states: GoState, vars_mover, key):
            action = mcts.select_action(
                states, self._eval_fn(vars_mover), key
            )
            return engine.step(states, action)

        return jax.jit(one_move)

    def _play_group(self, vars_black, vars_white, num_games: int, key,
                    max_moves: int):
        """One lockstep group with fixed colors; returns winner[G]."""
        states = self.engine.init(num_games)
        for ply in range(max_moves):
            vars_mover = vars_black if ply % 2 == 0 else vars_white
            key, k = jax.random.split(key)
            states, done = self._move_fn(states, vars_mover, k)
            if bool(jnp.all(done)):
                break
        return self.engine.winner(states)

    # ------------------------------------------------------------------
    def play_match(self, vars_a, vars_b, num_games: int, key,
                   max_moves: Optional[int] = None) -> MatchResult:
        """A vs B over ``num_games`` games, colors split half/half
        (the reference's per-game alternation, self_play.py:1000-1026,
        realized as two color-fixed lockstep groups)."""
        if self._move_fn is None:
            self._move_fn = self._build_move()
        max_moves = max_moves or self.config.max_step + 2
        ka, kb = jax.random.split(key)

        wins = []
        g1 = (num_games + 1) // 2
        g2 = num_games - g1
        if g1:
            winner = self._play_group(vars_a, vars_b, g1, ka, max_moves)
            wins.append(np.asarray(winner == BLACK))
        if g2:
            winner = self._play_group(vars_b, vars_a, g2, kb, max_moves)
            wins.append(np.asarray(winner == WHITE))
        a_wins = np.concatenate(wins)
        return MatchResult(a_wins, float(a_wins.mean()))

    # ------------------------------------------------------------------
    def evaluate_gate(self, current_vars, frozen_vars, evaluate_score: int,
                      key):
        """The 10-game gate (policy_evaluate): returns
        (win_ratio, new_score, promote) where promote means the frozen
        opponent should be replaced by the current model."""
        res = self.play_match(
            current_vars, frozen_vars, self.config.evaluate_games, key
        )
        promote = res.win_ratio == 1.0
        new_score = evaluate_score + (100 if promote else 0)
        return res.win_ratio, new_score, promote
