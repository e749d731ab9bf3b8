"""Positional-superko tests (optional Zobrist layer, ops/zobrist.py)."""

import jax
import jax.numpy as jnp
import numpy as np

from transgo_tpu.ops import BLACK, GoEngine, WHITE
from transgo_tpu.ops.zobrist import (
    legal_board_no_superko,
    position_hash,
    superko_forbidden,
    superko_init,
    superko_record,
)


def test_position_hash_properties():
    eng = GoEngine(5, 0.0, 40)
    s0 = eng.init(2)
    h0 = np.asarray(position_hash(eng.spec, s0.stones))
    assert (h0[0] == h0[1]).all()          # same position, same hash
    s1, _ = eng.step(s0, jnp.array([12, 7]))
    h1 = np.asarray(position_hash(eng.spec, s1.stones))
    assert (h1[0] != h0[0]).any()
    assert (h1[0] != h1[1]).any()          # different moves differ
    # purely positional: the hash depends on the stones, not the move order
    stones = np.zeros((2, 25), np.int8)
    stones[:, 12] = 1
    stones[:, 7] = 2
    h2 = np.asarray(position_hash(eng.spec, jnp.asarray(stones)))
    assert (h2[0] == h2[1]).all()
    # ...and differs when a color flips
    stones[1, 7] = 1
    h3 = np.asarray(position_hash(eng.spec, jnp.asarray(stones)))
    assert (h3[0] != h3[1]).any()


def test_simple_ko_cycle_forbidden():
    """The classic ko recapture recreates the prior position — the superko
    mask must forbid it even after the simple-ko age expires."""
    eng = GoEngine(5, 0.0, 60)
    stones = np.zeros((1, 25), np.int8)
    for c in [1, 5, 11]:
        stones[0, c] = BLACK
    for c in [2, 8, 12, 6]:
        stones[0, c] = WHITE
    s = eng.init(1).replace(
        stones=jnp.asarray(stones),
        next_player=jnp.full((1,), BLACK, jnp.int8),
    )
    hist = superko_init(1, eng.spec, 60, initial=s)
    # black captures the ko at 7
    s2, _ = eng.step(s, jnp.array([7]))
    hist = superko_record(eng.spec, hist, s2)
    # white retaking at 6 would recreate the original position
    forb = np.asarray(superko_forbidden(eng, s2, hist))
    assert forb[0, 6]
    # and only that point is a repeat
    assert forb[0].sum() == 1
    legal = np.asarray(legal_board_no_superko(eng, s2, hist))
    assert not legal[0, 6]


def test_non_repeat_not_forbidden():
    eng = GoEngine(5, 0.0, 60)
    s = eng.init(1)
    hist = superko_init(1, eng.spec, 60, initial=s)
    s, _ = eng.step(s, jnp.array([12]))
    hist = superko_record(eng.spec, hist, s)
    forb = np.asarray(superko_forbidden(eng, s, hist))
    assert forb.sum() == 0


def test_jit_compatible():
    eng = GoEngine(5, 0.0, 60)
    s = eng.init(4)
    hist = superko_init(4, eng.spec, 60, initial=s)

    @jax.jit
    def step_with_superko(s, hist, a):
        analysis = eng.analyze(s)
        legal = legal_board_no_superko(eng, s, hist, analysis)
        s2, done = eng.step(s, a, analysis)
        hist2 = superko_record(eng.spec, hist, s2)
        return s2, hist2, legal

    s, hist, legal = step_with_superko(s, hist, jnp.array([12, 7, 3, 20]))
    assert np.asarray(legal).shape == (4, 25)
    assert int(hist.count[0]) == 2
