"""Curriculum tests: live-window semantics, boundary seeding, transfer mix."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from transgo_tpu.curriculum import (
    LiveWindowEngine,
    make_transfer_eval_fn,
    scale_bound_config,
    scale_live_config,
)
from transgo_tpu.models import build_network
from transgo_tpu.ops.state import BLACK, WHITE


class TestLiveWindow:
    def _engine(self):
        return LiveWindowEngine(scale_live_config(selfplay_batch=2))

    def test_local_action_space(self):
        eng = self._engine()
        assert eng.spec.num_actions == 50
        s = eng.init(2)
        mask = np.asarray(eng.legal_action_mask(s))
        assert mask.shape == (2, 50)
        assert mask[:, :49].all() and not mask[:, 49].any()

    def test_local_step_maps_to_window(self):
        eng = self._engine()
        s = eng.init(1)
        # local action 8 = local (1,1) -> global (1,1) = coord 10
        s2, _ = eng.step(s, jnp.array([8]))
        stones = np.asarray(s2.stones[0]).reshape(9, 9)
        assert stones[1, 1] == BLACK
        assert stones.sum() == BLACK

    def test_moves_outside_window_unreachable(self):
        eng = self._engine()
        s = eng.init(1)
        g = np.asarray(eng._local_to_global)
        rows, cols = g // 9, g % 9
        assert (rows < 7).all() and (cols < 7).all()

    def test_random_init_seeds_ring(self):
        eng = self._engine()
        s = eng.init_random(4, jax.random.PRNGKey(0))
        stones = np.asarray(s.stones).reshape(4, 9, 9)
        ring = np.zeros((9, 9), bool)
        ring[7, :8] = True
        ring[:8, 7] = True
        for b in range(4):
            placed = stones[b] > 0
            count = placed.sum()
            assert 4 <= count <= 11, count
            assert (placed <= ring).all(), "stones off the boundary ring"
        # alternating colors: counts of black/white differ by at most 1
        for b in range(4):
            nb = (stones[b] == BLACK).sum()
            nw = (stones[b] == WHITE).sum()
            assert abs(int(nb) - int(nw)) <= 1

    def test_local_encode_shape(self):
        eng = self._engine()
        s = eng.init(2)
        obs = eng.encode_local(s)
        assert obs.shape == (2, 7, 7, 10)

    def test_own_labels_are_local(self):
        eng = self._engine()
        s = eng.init(2)
        _, terr = eng.score_and_territory(s)
        assert terr.shape == (2, 49)


class TestTransfer:
    def test_transfer_eval_shapes_and_blend(self):
        cfg = scale_live_config(board_size=9, num_features=8)
        cfg.board_size = 9
        main = build_network(cfg, "main")
        sub = build_network(cfg, "mini")
        mv = main.init(jax.random.PRNGKey(0))
        sv = sub.init(jax.random.PRNGKey(1))
        obs = jnp.zeros((3, 9, 9, 10))
        to_play = jnp.array([1, 2, 1], jnp.int8)

        f0 = make_transfer_eval_fn(cfg, main, mv, sub, sv, gamma=0.0)
        p0, v0 = jax.jit(f0)(obs, to_play)
        assert p0.shape == (3, 82) and v0.shape == (3,)

        f1 = make_transfer_eval_fn(cfg, main, mv, sub, sv, gamma=1.0)
        p1, v1 = jax.jit(f1)(obs, to_play)
        # gamma=1: policy is pure stitched sub-policy, normalized per row
        assert np.allclose(np.asarray(p1).sum(1), 1.0, atol=1e-4)
        assert not np.allclose(np.asarray(p0), np.asarray(p1))
        # komi sign flips with mover: boards 0 (black) and 1 (white) differ
        assert not np.isclose(float(v1[0]), float(v1[1]))
        assert np.isclose(float(v1[0]), float(v1[2]))

    def test_gamma_schedule_window(self):
        cfg = scale_bound_config()
        # reference: transfer active while train_step <= 3500
        # (self_play.py:803), gamma = exp(-t/1200) (configure.py:82-86)
        assert cfg.transfer_max_train_steps == 3500
        assert abs(cfg.value_ratio_by_frame(0) - 1.0) < 1e-9
        assert abs(
            cfg.value_ratio_by_frame(1200) - float(np.exp(-1))
        ) < 1e-9


@pytest.mark.slow
def test_scale_bound_pipeline_ticks(tmp_path):
    from transgo_tpu.curriculum import build_scale_bound_pipeline

    pipe = build_scale_bound_pipeline(
        max_step=8,
        num_simulation=4,
        parallel_readouts=1,
        selfplay_batch=2,
        num_features=8,
        batch_size=4,
        buffer_size=256,
        evaluate_num=10**9,
        results_path=str(tmp_path),
    )
    for _ in range(10):
        pipe.run_tick()
    assert pipe.now_play_games > 0
    assert int(pipe.dreplay.size()) > 0


@pytest.mark.slow
def test_scale_live_pipeline_ticks(tmp_path):
    from transgo_tpu.curriculum import build_scale_live_pipeline

    pipe = build_scale_live_pipeline(
        max_step=8,
        num_simulation=4,
        parallel_readouts=1,
        selfplay_batch=2,
        num_features=8,
        batch_size=4,
        buffer_size=256,
        evaluate_num=10**9,
        results_path=str(tmp_path),
    )
    for _ in range(10):
        pipe.run_tick()
    assert pipe.now_play_games > 0
    assert int(pipe.dreplay.size()) > 0
    assert pipe.dreplay.obs_shape == (7, 7, 10)
    assert pipe.dreplay.obs.shape[1:] == (7 * 7 * 10,)


def test_transfer_wired_into_pipeline(tmp_path):
    """VERDICT r1 item 2 end-to-end: scale-bound pretrain -> main pipeline
    with config.init_sub_model. At train step 0 the blended root priors
    differ from the no-transfer run; past the transfer window the pipeline
    switches back to the plain executables and matches it exactly."""
    from transgo_tpu.config import small_test_config
    from transgo_tpu.curriculum import build_scale_bound_pipeline
    from transgo_tpu.runtime.pipeline import TrainPipeline

    # ---- 1. tiny scale-bound pretrain producing the sub-model artifact ----
    pre = build_scale_bound_pipeline(
        quiet=True, max_step=8, num_simulation=2, selfplay_batch=2,
        num_features=8, batch_size=4, buffer_size=128,
        evaluate_num=10**9, results_path=str(tmp_path / "pre"),
    )
    pre.run_tick()
    variables = pre.learner.variables(pre.train_state)
    # a fresh-initialized net emits exactly-zero logits on the empty board
    # (zero input -> zero biases -> uniform policy), and the halved-seam
    # stitch is coverage-normalizing for uniform inputs — so an untrained
    # sub-model is invisible by construction. Perturb the params
    # deterministically to stand in for a converged pretrain.
    variables = {
        "params": jax.tree_util.tree_map(
            lambda x: x + 0.1 * jnp.cos(
                jnp.arange(x.size, dtype=jnp.float32)
            ).reshape(x.shape),
            variables["params"],
        ),
        "batch_stats": variables["batch_stats"],
    }
    pre._save_policy(variables, "sub_policy")
    sub_path = str(tmp_path / "pre" / "sub_policy")

    # ---- 2. main 9x9 pipeline with and without the sub-model ----
    def build(**over):
        cfg = small_test_config(
            board_size=9, local_board_size=7, max_step=12,
            num_simulation=4, parallel_readouts=2, selfplay_batch=2,
            num_features=8, batch_size=4, buffer_size=128,
            evaluate_num=10**9, sub_model_features=8,
            results_path=str(tmp_path / "main"), **over,
        )
        return TrainPipeline(cfg, quiet=True)

    plain = build()
    mixed = build(init_sub_model=sub_path)
    assert mixed.actor.sub_network is not None
    assert mixed._transfer_gamma() == pytest.approx(1.0)  # step 0

    # blended root priors differ from the plain run at step 0
    bar = np.arange(2)
    p_prior = np.asarray(plain.actor_state.tree.edge_prior)[
        bar, np.asarray(plain.actor_state.tree.root)
    ]
    m_prior = np.asarray(mixed.actor_state.tree.edge_prior)[
        bar, np.asarray(mixed.actor_state.tree.root)
    ]
    assert not np.allclose(p_prior, m_prior), (
        "transfer mix did not change root priors"
    )

    # the transfer executables actually run a tick
    mixed.run_tick()
    assert mixed.now_play_steps > 0

    # ---- 3. past the window: gamma off, identical to no-transfer ----
    late_plain = build(load_train_steps=4000)
    late_mixed = build(init_sub_model=sub_path, load_train_steps=4000)
    assert late_mixed._transfer_gamma() is None
    lp = np.asarray(late_plain.actor_state.tree.edge_prior)[
        bar, np.asarray(late_plain.actor_state.tree.root)
    ]
    lm = np.asarray(late_mixed.actor_state.tree.edge_prior)[
        bar, np.asarray(late_mixed.actor_state.tree.root)
    ]
    assert np.array_equal(lp, lm), (
        "past the window the search must be transfer-free"
    )
