"""Differential tests: JAX engine vs the independent C++ oracle.

Random playouts apply identical action sequences to both implementations and
compare stones, ko state, legal masks, feature planes, territory and score
after every move — the "golden game" strategy SURVEY.md section 4 prescribes
in place of the reference's absent test suite.
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transgo_tpu.native import Oracle
from transgo_tpu.ops import GoEngine
from transgo_tpu.ops.features import FeatureEncoder, nhwc_to_nchw


@functools.lru_cache(maxsize=None)
def jitted(size):
    max_step = size * size + 20
    komi = 7.5 if size == 9 else 5.5
    eng = GoEngine(size, komi=komi, max_step=max_step)
    enc = FeatureEncoder(eng, 10)

    @jax.jit
    def snapshot(s):
        """Everything we compare, in one compiled call."""
        legal = eng.legal_action_mask_full(s)
        feat = nhwc_to_nchw(enc(s))
        score, terr = eng.score_and_territory(s)
        raw = eng.raw_score(s)
        return legal, feat, score, terr, raw

    return eng, jax.jit(eng.step), snapshot, max_step, komi


@pytest.mark.parametrize("size,seed", [(5, 0), (5, 1), (9, 2), (7, 4), (13, 6)])
def test_random_playout_parity(size, seed):
    _run_random_playout_parity(size, seed)


def test_random_playout_parity_19x19():
    """Full-board differential at 19x19 (the label-propagation production
    path's largest size; VERDICT r2 item 5 done-criterion)."""
    _run_random_playout_parity(19, 8)


def _run_random_playout_parity(size, seed):
    eng, step, snapshot, max_step, komi = jitted(size)
    oracle = Oracle(size, komi=komi, max_step=max_step)
    oracle.reset()

    rng = np.random.default_rng(seed)
    s = eng.init(1)
    n = size * size

    for move_i in range(max_step + 2):
        assert np.array_equal(np.asarray(s.stones[0]), oracle.stones()), (
            f"stones diverged at move {move_i}"
        )
        assert int(s.ko_location[0]) == oracle.state.ko_location
        assert bool(s.terminated[0]) == oracle.terminated

        legal, feat, score, terr, raw = snapshot(s)
        jax_legal = np.asarray(legal)[0, :n]
        assert np.array_equal(jax_legal, oracle.legal_mask()), (
            f"legal mask diverged at move {move_i}"
        )
        jax_feat = np.asarray(feat)[0]
        oracle_feat = oracle.encode(10)
        assert np.array_equal(jax_feat, oracle_feat), (
            f"features diverged at move {move_i}: planes "
            f"{np.nonzero((jax_feat != oracle_feat).any(axis=(1, 2)))[0]}"
        )
        o_raw, o_terr = oracle.territory()
        signed = np.where(o_terr == 1, 1.0, np.where(o_terr == 2, -1.0, 0.0))
        assert np.array_equal(np.asarray(terr[0]), signed)
        assert float(raw[0]) == o_raw

        if oracle.terminated:
            break

        legal_idx = np.nonzero(jax_legal)[0]
        if len(legal_idx) == 0 or rng.random() < 0.05:
            action = n  # pass
        else:
            action = int(rng.choice(legal_idx))

        s, _ = step(s, jnp.array([action], jnp.int32))
        assert oracle.step(action)


def test_illegal_actions_rejected_identically():
    eng, step, snapshot, max_step, komi = jitted(5)
    oracle = Oracle(5, komi=komi, max_step=max_step)
    oracle.reset()
    rng = np.random.default_rng(7)
    s = eng.init(1)
    for _ in range(60):
        action = int(rng.integers(0, 26))
        s2, _ = step(s, jnp.array([action], jnp.int32))
        applied = oracle.step(action)
        if not applied:
            assert np.array_equal(
                np.asarray(s2.stones[0]), np.asarray(s.stones[0])
            )
            assert int(s2.step_count[0]) == int(s.step_count[0])
        s = s2
        assert np.array_equal(np.asarray(s.stones[0]), oracle.stones())
        if oracle.terminated:
            break
