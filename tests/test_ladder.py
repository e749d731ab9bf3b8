"""Ladder reader: trigger conditions, working ladders, breakers.

The reference's checkLadder/checkLadderUseSearch (board.cc:987-1163) is dead
code with a broken victim-flee rule (see ops/ladder.py docstring); these
tests pin the *corrected* semantics: same trigger, same search discipline,
group-correct fleeing.
"""

import jax
import jax.numpy as jnp
import numpy as np

from transgo_tpu.ops import BLACK, GoEngine, WHITE
from transgo_tpu.ops.ladder import LadderReader
from transgo_tpu.ops.state import GoState


def c9(x, y):
    return y * 9 + x


def make_state(black, white, to_play=BLACK, batch=1):
    eng = GoEngine(9, komi=7.5, max_step=200)
    state = eng.init(batch)
    stones = np.zeros((batch, 81), np.int8)
    for c in black:
        stones[:, c] = BLACK
    for c in white:
        stones[:, c] = WHITE
    state = state.replace(
        stones=jnp.asarray(stones),
        next_player=jnp.full((batch,), to_play, jnp.int8),
    )
    return eng, state


# the canonical hane-atari shape: Black (2,2) in atari, flee at (3,2),
# one White chaser block {(2,1),(3,1)} with plenty of liberties
LADDER_BLACK = [c9(2, 2)]
LADDER_WHITE = [c9(1, 2), c9(2, 1), c9(2, 3), c9(3, 1)]
FLEE = c9(3, 2)


class TestTrigger:
    def test_working_ladder_is_read_as_capture(self):
        eng, state = make_state(LADDER_BLACK, LADDER_WHITE)
        reader = LadderReader(eng)
        out = np.asarray(
            jax.jit(reader.check_ladder)(state, jnp.asarray([FLEE]))
        )
        assert out[0] > 0, out

    def test_open_move_does_not_trigger(self):
        eng, state = make_state(LADDER_BLACK, LADDER_WHITE)
        reader = LadderReader(eng)
        # tengen has 4 empty neighbors -> self_liberty != 2 -> no trigger
        out = np.asarray(reader.check_ladder(state, jnp.asarray([c9(4, 4)])))
        assert out[0] == 0

    def test_pass_and_occupied_do_not_trigger(self):
        eng, state = make_state(LADDER_BLACK, LADDER_WHITE)
        reader = LadderReader(eng)
        out = np.asarray(reader.check_ladder(state, jnp.asarray([-1])))
        assert out[0] == 0
        out = np.asarray(
            reader.check_ladder(state, jnp.asarray([c9(2, 1)]))
        )
        assert out[0] == 0


class TestBreakers:
    def test_ladder_breaker_on_the_diagonal(self):
        # a Black stone on the ladder path gives the group liberties
        eng, state = make_state(
            LADDER_BLACK + [c9(5, 5)], LADDER_WHITE
        )
        reader = LadderReader(eng)
        out = np.asarray(reader.check_ladder(state, jnp.asarray([FLEE])))
        assert out[0] == 0, out

    def test_counter_atari_breaks_the_ladder(self):
        # the White stone at (2,3) is reduced to one liberty: after the
        # flee the victim can capture it instead of running
        eng, state = make_state(
            LADDER_BLACK + [c9(1, 3), c9(2, 4)], LADDER_WHITE
        )
        reader = LadderReader(eng)
        out = np.asarray(reader.check_ladder(state, jnp.asarray([FLEE])))
        assert out[0] == 0, out

    def test_batched_mixed_verdicts(self):
        eng, _ = make_state(LADDER_BLACK, LADDER_WHITE)
        reader = LadderReader(eng)
        stones = np.zeros((3, 81), np.int8)
        for c in LADDER_BLACK:
            stones[:, c] = BLACK
        for c in LADDER_WHITE:
            stones[:, c] = WHITE
        stones[1, c9(5, 5)] = BLACK          # breaker
        stones[2, c9(1, 3)] = BLACK          # counter-atari setup
        stones[2, c9(2, 4)] = BLACK
        state = eng.init(3).replace(
            stones=jnp.asarray(stones),
            next_player=jnp.full((3,), BLACK, jnp.int8),
        )
        out = np.asarray(
            reader.check_ladder(state, jnp.full((3,), FLEE, jnp.int32))
        )
        assert out[0] > 0 and out[1] == 0 and out[2] == 0, out

    def test_white_as_victim(self):
        # color-flipped working ladder
        white = [c9(2, 2)]
        black = [c9(1, 2), c9(2, 1), c9(2, 3), c9(3, 1)]
        eng, state = make_state(black, white, to_play=WHITE)
        reader = LadderReader(eng)
        out = np.asarray(reader.check_ladder(state, jnp.asarray([FLEE])))
        assert out[0] > 0, out
