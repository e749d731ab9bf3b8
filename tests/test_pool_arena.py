"""Pool arena: the whole Elo round-robin as one lockstep batch."""

import jax
import jax.numpy as jnp
import numpy as np

from transgo_tpu.config import small_test_config
from transgo_tpu.models import build_network
from transgo_tpu.ops import GoEngine
from transgo_tpu.search.mcts import MCTS, SearchMode


def _setup():
    cfg = small_test_config(
        board_size=5, max_step=10, num_simulation=8, parallel_readouts=2,
        num_features=8,
    )
    eng = GoEngine(cfg.board_size, cfg.komi, cfg.max_step)
    net = build_network(cfg, "main")
    mcts = MCTS(cfg, eng, SearchMode.WP)
    return cfg, eng, net, mcts


def test_pool_eval_routes_rows_to_mover_net():
    """Each leaf row's (policy, value) must equal the single-net eval of
    that board's mover checkpoint — the stacked vmap + select is exact."""
    from transgo_tpu.eval.pool_arena import make_pool_eval_fn
    from transgo_tpu.search.evalfn import make_eval_fn

    cfg, eng, net, mcts = _setup()
    v0 = net.init(jax.random.PRNGKey(0))
    v1 = jax.tree_util.tree_map(lambda x: x + 0.02, v0)
    stacked = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), v0, v1)

    batch = 4
    mover_idx = jnp.asarray([0, 1, 1, 0], jnp.int32)
    obs = jax.random.uniform(
        jax.random.PRNGKey(2), (batch * 2, 5, 5, 10)
    )  # two readouts' worth of rows, readout-major
    to_play = jnp.ones((batch * 2,), jnp.int8)

    pool_fn = make_pool_eval_fn(net, stacked, mover_idx, komi=cfg.komi)
    pol, val = pool_fn(obs, to_play)

    singles = [make_eval_fn(net, v, komi=cfg.komi) for v in (v0, v1)]
    for row in range(batch * 2):
        ck = int(mover_idx[row % batch])
        p_ref, v_ref = singles[ck](obs[row:row + 1], to_play[row:row + 1])
        assert np.allclose(np.asarray(pol[row]), np.asarray(p_ref[0]),
                           atol=1e-5), row
        assert np.allclose(float(val[row]), float(v_ref[0]), atol=1e-5), row

    # the batch is derived from mover_idx at trace time (ADVICE r2): the
    # SAME factory pattern at a different board count must route by the
    # new modulus, not a stale one
    mover_idx2 = jnp.asarray([1, 0, 1], jnp.int32)
    obs2, to_play2 = obs[: 3 * 2], to_play[: 3 * 2]
    pol2, val2 = make_pool_eval_fn(net, stacked, mover_idx2,
                                   komi=cfg.komi)(obs2, to_play2)
    for row in range(3 * 2):
        ck = int(mover_idx2[row % 3])
        p_ref, v_ref = singles[ck](obs2[row:row + 1], to_play2[row:row + 1])
        assert np.allclose(np.asarray(pol2[row]), np.asarray(p_ref[0]),
                           atol=1e-5), row
        assert np.allclose(float(val2[row]), float(v_ref[0]), atol=1e-5), row


def test_round_robin_accounting():
    """Every pairing plays exactly games_per_pair games with alternating
    colors; the wins matrix is complete and zero-diagonal."""
    from transgo_tpu.eval.pool_arena import PoolArena

    cfg, eng, net, mcts = _setup()
    pool = [net.init(jax.random.PRNGKey(i)) for i in range(3)]
    arena = PoolArena(cfg, mcts, net)
    wins = arena.round_robin(pool, games_per_pair=2,
                             key=jax.random.PRNGKey(7))
    assert wins.shape == (3, 3)
    assert np.all(np.diag(wins) == 0)
    games = wins + wins.T
    for i in range(3):
        for j in range(i + 1, 3):
            assert games[i, j] == 2, (i, j, wins)
    # feeds the Elo fitter
    from transgo_tpu.eval.elo import rate_pool

    elo = rate_pool(wins)
    assert elo.shape == (3,) and np.isfinite(elo).all() and elo[0] == 0.0


def test_pool_arena_reuse_across_batch_sizes():
    """Regression (VERDICT r2 weak #1): reusing one PoolArena with a
    different pairs x games count must produce exactly what a fresh arena
    produces — the cached move fn may not bake in the first call's batch."""
    from transgo_tpu.eval.pool_arena import PoolArena

    cfg, eng, net, mcts = _setup()
    pool3 = [net.init(jax.random.PRNGKey(i)) for i in range(3)]
    arena = PoolArena(cfg, mcts, net)
    wins_a = arena.round_robin(pool3, games_per_pair=2,
                               key=jax.random.PRNGKey(7))
    assert (wins_a + wins_a.T).sum() == 3 * 2 * 2

    # second call on the SAME arena: 2 checkpoints x 4 games (batch 4 != 6)
    pool2 = pool3[:2]
    key2 = jax.random.PRNGKey(9)
    wins_b, det = arena.round_robin(pool2, games_per_pair=4, key=key2,
                                    return_details=True)
    fresh = PoolArena(cfg, mcts, net)
    wins_fresh = fresh.round_robin(pool2, games_per_pair=4, key=key2)
    assert np.array_equal(wins_b, wins_fresh), (wins_b, wins_fresh)
    # colors alternate per game index and details attribute every board
    assert list(det["black_idx"]) == [0, 1, 0, 1]
    assert list(det["white_idx"]) == [1, 0, 1, 0]
    assert len(det["winner"]) == 4


def test_play_match_per_game_attribution():
    """Arena.play_match's per-game vector must reflect true winners and
    color assignment, not a fabricated first-k-true fill (ADVICE r2)."""
    from transgo_tpu.eval.arena import Arena
    from transgo_tpu.ops.state import BLACK

    cfg, eng, net, mcts = _setup()
    arena = Arena(cfg, mcts, net)
    va = net.init(jax.random.PRNGKey(0))
    vb = net.init(jax.random.PRNGKey(1))
    res = arena.play_match(va, vb, num_games=4, key=jax.random.PRNGKey(3))
    pool = arena._pool
    _, det = pool.round_robin([va, vb], 4, jax.random.PRNGKey(3),
                              return_details=True)
    expect = (det["winner"] == BLACK) == (det["black_idx"] == 0)
    assert np.array_equal(res.challenger_wins, expect)
    assert res.win_ratio == expect.mean()
