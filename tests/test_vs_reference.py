"""Differential tests: JAX engine vs the GENUINE reference go_env.so.

Compiles the actual reference C++ (/root/reference/GoEnv/cpp_src — 9x9 —
and the scale_train_bound 7x7 vendored copy) exactly as its Makefile does,
binds it via transgo_tpu.native.reference, and replays random games applying
identical actions to both, comparing after every move:

  stones grid, next_player, step_count, last moves, ko fields, terminated,
  legal / no-eye masks, encode10 feature planes, territory + score,
  checkAction over all actions, and (9x9) the getSubEncode crops.

This upgrades the round-1 parity story (JAX vs our own oracle) to parity
against the reference implementation itself — the BASELINE.json north star
"env trajectories exactly match reference under fixed seed".

Skipped automatically when /root/reference is not present.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transgo_tpu.native.reference import ReferenceEnv, reference_available
from transgo_tpu.ops import GoEngine
from transgo_tpu.ops.features import (
    FeatureEncoder,
    nhwc_to_nchw,
    sub_encode,
)

pytestmark = pytest.mark.skipif(
    not reference_available(), reason="/root/reference sources not present"
)

# (size, komi, max_step): 9x9 from configure.py:13-16, 7x7 from
# scale_train_bound/GoEnv/environment.py:36-38.
_CONFIGS = {9: (7.5, 120), 7: (6.5, 74)}


@functools.lru_cache(maxsize=None)
def jitted(size):
    komi, max_step = _CONFIGS[size]
    eng = GoEngine(size, komi=komi, max_step=max_step)
    enc = FeatureEncoder(eng, 10)

    @jax.jit
    def snapshot(s):
        legal_full = eng.legal_action_mask_full(s)
        legal_shaped = eng.legal_action_mask(s)
        no_eye = eng.legal_no_eye_mask(s)
        feat = nhwc_to_nchw(enc(s))
        score, terr = eng.score_and_territory(s)
        return legal_full, legal_shaped, no_eye, feat, score, terr

    return eng, jax.jit(eng.step), snapshot


def _assert_state_parity(s, ref: ReferenceEnv, move_i: int):
    b = ref.board
    assert np.array_equal(np.asarray(s.stones[0]), ref.stones()), (
        f"stones diverged at move {move_i}"
    )
    assert int(s.next_player[0]) == int(b.next_player)
    assert int(s.step_count[0]) == int(b.step_count)
    assert int(s.last_move1[0]) == int(b.last_move1)
    assert int(s.last_move2[0]) == int(b.last_move2)
    assert int(s.ko_location[0]) == int(b.ko_location), (
        f"ko_location diverged at move {move_i}"
    )
    if int(b.ko_location) >= 0:
        assert int(s.ko_color[0]) == int(b.ko_color)
        assert int(s.ko_age[0]) == int(b.ko_age)
    assert bool(s.terminated[0]) == ref.terminated


@pytest.mark.parametrize(
    "size,seed",
    [(9, 0), (9, 1), (9, 2), (9, 3), (9, 4), (7, 10), (7, 11), (7, 12)],
)
def test_random_playout_parity_vs_reference(size, seed):
    eng, step, snapshot = jitted(size)
    komi, max_step = _CONFIGS[size]
    ref = ReferenceEnv(size, komi=komi, max_step=max_step)
    ref.reset()

    rng = np.random.default_rng(seed)
    s = eng.init(1)
    n = size * size

    for move_i in range(max_step + 2):
        _assert_state_parity(s, ref, move_i)

        legal_full, legal_shaped, no_eye, feat, score, terr = snapshot(s)

        ref_mask = ref.legal_mask()
        assert np.array_equal(np.asarray(legal_full)[0, :n], ref_mask), (
            f"legal mask diverged at move {move_i}"
        )
        # C-level getLegalAction always appends PASS (go_env.cc:162-163)
        assert bool(legal_full[0, n])
        # python-level pass-shaping (environment.py:126-127): PASS only
        # when it is the only legal move
        want_pass = not ref_mask.any()
        assert bool(legal_shaped[0, n]) == want_pass
        assert np.array_equal(np.asarray(legal_shaped)[0, :n], ref_mask)

        assert np.array_equal(
            np.asarray(no_eye)[0, :n], ref.legal_no_eye_mask()
        ), f"no-eye candidate mask diverged at move {move_i}"

        jax_feat = np.asarray(feat)[0]
        ref_feat = ref.encode()
        assert np.array_equal(jax_feat, ref_feat), (
            f"encode10 diverged at move {move_i}: planes "
            f"{np.nonzero((jax_feat != ref_feat).any(axis=(1, 2)))[0]}"
        )

        ref_score, ref_terr = ref.territory()
        assert float(score[0]) == ref_score, f"score diverged at move {move_i}"
        assert float(ref.score()) == ref_score
        assert np.array_equal(np.asarray(terr[0]), ref_terr), (
            f"territory diverged at move {move_i}"
        )

        if ref.terminated:
            break

        legal_idx = np.nonzero(ref_mask)[0]
        if len(legal_idx) == 0 or rng.random() < 0.05:
            action = n  # pass
        else:
            action = int(rng.choice(legal_idx))

        s, _ = step(s, jnp.array([action], jnp.int32))
        ref.step(action)
    else:
        pytest.fail("game did not terminate within max_step")

    assert ref.terminated and bool(s.terminated[0])


@pytest.mark.parametrize("size,seed", [(9, 21), (7, 22)])
def test_check_action_parity(size, seed):
    """checkAction (go_env.cc:84-88) over every action, several positions."""
    eng, step, snapshot = jitted(size)
    komi, max_step = _CONFIGS[size]
    ref = ReferenceEnv(size, komi=komi, max_step=max_step)
    ref.reset()
    rng = np.random.default_rng(seed)
    s = eng.init(1)
    n = size * size

    for move_i in range(40):
        legal_full = np.asarray(snapshot(s)[0])[0]
        for a in range(n):
            assert bool(legal_full[a]) == ref.check_action(a), (
                f"checkAction({a}) diverged at move {move_i}"
            )
        # reference quirk: C-level checkAction does NOT map MAX_COORD->PASS
        # (only Step_ does, go_env.cc:56-57), so checkAction(n) is always
        # False even though Step(n) always succeeds
        assert not ref.check_action(n)
        legal_idx = np.nonzero(legal_full[:n])[0]
        if len(legal_idx) == 0:
            break
        action = int(rng.choice(legal_idx))
        s, _ = step(s, jnp.array([action], jnp.int32))
        if ref.step(action):
            break


def test_sub_encode_parity():
    """getSubEncode 4-crop cut (board.cc:1166-1270) vs ops.features.sub_encode."""
    eng, step, snapshot = jitted(9)
    komi, max_step = _CONFIGS[9]
    ref = ReferenceEnv(9, komi=komi, max_step=max_step)
    ref.reset()
    rng = np.random.default_rng(33)
    enc = FeatureEncoder(eng, 10)
    s = eng.init(1)

    @jax.jit
    def crops(s):
        return sub_encode(enc(s), sub_size=7)

    for move_i in range(30):
        ref_sub = ref.sub_encode(ref.encode())  # [4, 10, 7, 7]
        jax_sub = np.asarray(nhwc_to_nchw(crops(s).reshape(4, 7, 7, 10)))
        assert np.array_equal(jax_sub, ref_sub), (
            f"sub_encode diverged at move {move_i}"
        )
        mask = ref.legal_mask()
        idx = np.nonzero(mask)[0]
        if len(idx) == 0:
            break
        action = int(rng.choice(idx))
        s, _ = step(s, jnp.array([action], jnp.int32))
        if ref.step(action):
            break


def test_illegal_actions_no_op_parity():
    """Illegal Step leaves the state unchanged in both (go_env.cc:75-78)."""
    eng, step, snapshot = jitted(9)
    komi, max_step = _CONFIGS[9]
    ref = ReferenceEnv(9, komi=komi, max_step=max_step)
    ref.reset()
    rng = np.random.default_rng(44)
    s = eng.init(1)
    for move_i in range(80):
        action = int(rng.integers(0, 82))
        s, _ = step(s, jnp.array([action], jnp.int32))
        ref.step(action)
        _assert_state_parity(s, ref, move_i)
        if ref.terminated:
            break
