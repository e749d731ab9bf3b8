"""Batched arena matches and the evaluation gate.

Replaces the reference evaluator (SelfPlay.policy_evaluate,
self_play.py:986-1040): the challenger plays the frozen gate model for
``evaluate_games`` games with alternating colors, each move searched with a
fresh root at evaluation temperature 0.12 and no Dirichlet noise
(select_action, self_play.py:689-703). A clean sweep raises the gate score
by 100 and freezes the challenger as the new opponent
(self_play.py:1035-1038).

All games — both color assignments — run as ONE lockstep batch: each
board's mover for a move is derived from its root state's next_player and
the board's color assignment, and the shared batched search evaluates each
leaf row with its mover's network (the mover-routed eval of
eval.pool_arena, a 2-checkpoint pool). One group of N games plays ~L plies
once, vs the round-1 versions that either ran both agents' searches every
move (2x compute) or two color-fixed groups back to back (2x plies).
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import numpy as np

from transgo_tpu.models.nets import TransGoNetwork
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
        self._pool = None

    # ------------------------------------------------------------------
    def play_match(self, vars_a, vars_b, num_games: int, key,
                   max_moves: Optional[int] = None) -> MatchResult:
        """A vs B over ``num_games`` games, colors alternating per game
        index (the reference's per-game alternation,
        self_play.py:1000-1026), as one mover-routed lockstep batch."""
        from transgo_tpu.eval.pool_arena import PoolArena
        from transgo_tpu.ops.state import BLACK

        if self._pool is None:
            self._pool = PoolArena(self.config, self.mcts, self.network)
        wins, det = self._pool.round_robin(
            [vars_a, vars_b], num_games, key, max_moves=max_moves,
            pairs=[(0, 1)], return_details=True,
        )
        # true per-game attribution: game g's board has black_idx[g] as
        # black (0 = challenger A), so A won iff (winner==BLACK) matches
        # (black_idx==0)
        a_wins = (det["winner"] == BLACK) == (det["black_idx"] == 0)
        a_total = int(wins[0, 1])
        assert int(a_wins.sum()) == a_total
        return MatchResult(a_wins, a_total / max(1, num_games))

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
