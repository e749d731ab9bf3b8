"""Elo MLE and arena-gate tests."""

import numpy as np
import pytest

from transgo_tpu.eval.elo import calculate_ratings, elo_from_ratings, rate_pool


class TestElo:
    def test_two_agents_balanced(self):
        wins = np.array([[0, 10], [10, 0]])
        elo = rate_pool(wins)
        assert abs(elo[0] - elo[1]) < 1.0

    def test_dominant_agent_rated_higher(self):
        wins = np.array([[0, 9], [1, 0]])
        elo = rate_pool(wins)
        assert elo[1] < elo[0]
        # BT MLE: r0/r1 = 9 -> gap = 400*log10(9) ~ 381.6
        assert abs((elo[0] - elo[1]) - 400 * np.log10(9)) < 1.0

    def test_transitive_chain(self):
        # A beats B 3:1, B beats C 3:1 -> A > B > C
        wins = np.array([
            [0, 15, 0],
            [5, 0, 15],
            [0, 5, 0],
        ])
        elo = rate_pool(wins)
        assert elo[0] > elo[1] > elo[2]

    def test_anchor(self):
        wins = np.array([[0, 7, 2], [3, 0, 8], [8, 2, 0]])
        r = calculate_ratings(wins)
        assert r[0] == 1.0
        assert abs(elo_from_ratings(r)[0]) < 1e-9


@pytest.mark.slow
def test_arena_match_smoke():
    """A 2-game arena match runs end-to-end and a sweep gates correctly."""
    import jax
    from transgo_tpu.config import small_test_config
    from transgo_tpu.eval.arena import Arena
    from transgo_tpu.models import build_network
    from transgo_tpu.ops import GoEngine
    from transgo_tpu.search.mcts import MCTS, SearchMode

    cfg = small_test_config(
        board_size=5, max_step=10, num_simulation=4, parallel_readouts=2,
        num_features=8, evaluate_games=2,
    )
    eng = GoEngine(5, 2.5, 10)
    mcts = MCTS(cfg, eng, SearchMode.WP)
    net = build_network(cfg, "main")
    v1 = net.init(jax.random.PRNGKey(0))
    v2 = net.init(jax.random.PRNGKey(1))
    arena = Arena(cfg, mcts, net)
    res = arena.play_match(v1, v2, 2, jax.random.PRNGKey(2))
    assert res.challenger_wins.shape == (2,)
    ratio, score, promote = arena.evaluate_gate(
        v1, v2, 100, jax.random.PRNGKey(3)
    )
    assert score == (200 if ratio == 1.0 else 100)
    assert promote == (ratio == 1.0)


@pytest.mark.slow
def test_strength_cli_gate(tmp_path):
    """`transgo_tpu.cli strength` loads a policy checkpoint, plays the two
    gate arenas (vs random bot, vs fresh init) and returns PASS/FAIL."""
    import jax
    import orbax.checkpoint as ocp

    from transgo_tpu import cli
    from transgo_tpu.config import Config
    from transgo_tpu.models import build_network

    cfg = Config(board_size=5, num_features=8, max_step=10)
    net = build_network(cfg, "main")
    v = net.init(jax.random.PRNGKey(0))
    ckpt = (tmp_path / "policy").absolute()
    checkpointer = ocp.StandardCheckpointer()
    checkpointer.save(
        ckpt, {"params": v["params"], "batch_stats": v["batch_stats"]}
    )
    checkpointer.wait_until_finished()

    # a fresh-init "trained" net won't clear the gates; the command must
    # run both arenas and exit nonzero (FAIL) rather than crash
    with pytest.raises(SystemExit) as exc:
        cli.main([
            "strength", "--checkpoint", str(ckpt),
            "--games", "2", "--sims", "4",
            "--board-size", "5", "--features", "8", "--max-step", "10",
            "--min-vs-random", "1.1",  # unreachable -> deterministic FAIL
        ])
    assert exc.value.code == 1


def test_sweep_prior_keeps_ratings_finite():
    """A sweep sends raw MLE ratings to the iteration cap; the CLI's
    --prior virtual split keeps them finite and ordered."""
    import numpy as np

    wins = np.array([[0.0, 4.0], [0.0, 0.0]])  # agent 0 sweeps 4-0
    raw = rate_pool(wins)
    assert raw[1] < -2000  # divergent without regularization
    played = (wins + wins.T) > 0
    reg = rate_pool(wins + 0.25 * played)
    assert -1000 < reg[1] < 0  # finite, still clearly weaker
