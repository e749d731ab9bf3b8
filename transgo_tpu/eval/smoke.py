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
    test_trans.py:60-95).

    The model's search runs only on the half of the boards whose mover is
    the model this tick (VERDICT r3 weak #8: the old version searched every
    board every move, 2x the needed compute). All live boards share one
    next_player in this lockstep arena — players strictly alternate and
    terminated boards no-op — so the model half is static per tick parity:
    boards assigned BLACK move with the model on even ticks, the WHITE half
    on odd ticks. ``num_games`` must be even: an odd count would hand the
    model the extra BLACK board and run the search on an empty slice on odd
    ticks (ADVICE r4)."""
    if num_games % 2 != 0:
        raise ValueError(
            f"evaluate_vs_random needs an even num_games (got {num_games}):"
            " colors are assigned half/half and the search runs on one half"
            " per tick"
        )
    engine = mcts.engine
    eval_fn = make_eval_fn(network, variables, komi=config.komi,
                           own_blend=config.value_own_blend,
                           tanh_norm=config.tanh_norm)
    states = engine.init(num_games)
    half = num_games // 2
    model_black = jnp.arange(num_games) < half

    from functools import partial

    @partial(jax.jit, static_argnames="model_first")
    def one_move(states, key, model_first):
        km, kr = jax.random.split(key)
        sub = slice(0, half) if model_first else slice(half, num_games)
        sub_states = jax.tree_util.tree_map(lambda x: x[sub], states)
        model_act = mcts.select_action(sub_states, eval_fn, km)
        action = random_bot_actions(engine, states, kr)
        action = action.at[sub].set(model_act.astype(jnp.int32))
        # tick-parity soundness check (ADVICE r4): the half-batch search is
        # only valid while live boards' mover matches the tick parity; if
        # the engine ever rejected a sampled action without flipping
        # next_player, colors would silently desync for the rest of the
        # game. Returns the violation count so the host loop can assert.
        expect = jnp.int8(BLACK) if model_first else jnp.int8(WHITE)
        live = ~states.terminated
        desync = jnp.sum(
            (live & (states.next_player != expect)).astype(jnp.int32)
        )
        new_states, done = engine.step(states, action)
        return new_states, done, desync

    for t in range(config.max_step + 2):
        key, k = jax.random.split(key)
        # mover is BLACK on even ticks -> the model-as-BLACK half searches
        states, done, desync = one_move(states, k, model_first=(t % 2 == 0))
        if int(desync) != 0:
            raise AssertionError(
                f"smoke arena tick-parity desync on {int(desync)} boards at "
                f"tick {t}: a live board's next_player does not match the "
                "alternating-color schedule"
            )
        if bool(jnp.all(done)):
            break

    winner = engine.winner(states)
    wins = np.asarray(
        jnp.where(model_black, winner == BLACK, winner == WHITE)
    )
    return SmokeResult(wins, float(wins.mean()))
