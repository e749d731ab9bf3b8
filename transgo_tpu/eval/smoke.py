"""Smoke arenas: model vs random bot, model vs model.

Parity with the reference's misleadingly-named ``test_trans.py``: a
RandomBot opponent (test_trans.py:14-23 — uniform over legal-no-eye moves)
and two arena drivers, ``evaluate1`` (model vs model, test_trans.py:26-57)
and ``evaluate2`` (model vs random, test_trans.py:60-95), batched on device.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from transgo_tpu.ops.state import BLACK, WHITE, GoState
from transgo_tpu.search.evalfn import make_eval_fn
from transgo_tpu.search.mcts import MCTS


def random_bot_actions(engine, states: GoState, key) -> jnp.ndarray:
    """Uniform random over legal-no-own-eye moves + pass (RandomBot over
    getLegalNoEye, test_trans.py:17-23 — the C API always appends PASS,
    go_env.cc:186, so the reference bot may pass at any time)."""
    mask = engine.legal_no_eye_mask(states)
    logits = jnp.where(mask, 0.0, -jnp.inf)
    return jax.random.categorical(key, logits, axis=1).astype(jnp.int32)


class SmokeResult(NamedTuple):
    model_wins: np.ndarray
    win_ratio: float


def evaluate_vs_random(config, mcts: MCTS, network, variables,
                       num_games: int, key) -> SmokeResult:
    """Model (alternating colors) vs RandomBot (evaluate2,
    test_trans.py:60-95)."""
    engine = mcts.engine
    eval_fn = make_eval_fn(network, variables, komi=config.komi,
                           own_blend=config.value_own_blend,
                           tanh_norm=config.tanh_norm)
    states = engine.init(num_games)
    model_black = (jnp.arange(num_games) % 2) == 0

    @jax.jit
    def one_move(states, key):
        km, kr, ksel = jax.random.split(key, 3)
        model_act = mcts.select_action(states, eval_fn, km)
        rand_act = random_bot_actions(engine, states, kr)
        mover_is_model = jnp.where(
            model_black, states.next_player == BLACK,
            states.next_player == WHITE,
        )
        action = jnp.where(mover_is_model, model_act, rand_act)
        return engine.step(states, action)

    for _ in range(config.max_step + 2):
        key, k = jax.random.split(key)
        states, done = one_move(states, k)
        if bool(jnp.all(done)):
            break

    winner = engine.winner(states)
    wins = np.asarray(
        jnp.where(model_black, winner == BLACK, winner == WHITE)
    )
    return SmokeResult(wins, float(wins.mean()))
