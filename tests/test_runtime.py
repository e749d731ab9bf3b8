"""Runtime tests: replay semantics, learner loss/optimizer, schedule
functions, ratio controller, and a short end-to-end pipeline run."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from transgo_tpu.config import Config, small_test_config
from transgo_tpu.models import build_network
from transgo_tpu.runtime.learner import Learner
from transgo_tpu.runtime.replay import PrioritizedReplayBuffer, ReplayBuffer


class TestReplay:
    def _mk(self, cap=32):
        return ReplayBuffer(cap, 5, 10)

    def _rows(self, k, seed=0):
        rng = np.random.default_rng(seed)
        return (
            rng.random((k, 5, 5, 10), np.float32),
            rng.random((k, 26), np.float32),
            rng.random(k).astype(np.float32),
            rng.random((k, 25)).astype(np.float32),
        )

    def test_ring_wraps(self):
        buf = self._mk(8)
        buf.append_batch(*self._rows(6))
        assert len(buf) == 6 and not buf.full
        buf.append_batch(*self._rows(6, 1))
        assert buf.full and len(buf) == 8 and buf.index == 4

    def test_sample_without_replacement(self):
        buf = self._mk(32)
        buf.append_batch(*self._rows(32))
        rng = np.random.default_rng(0)
        obs, pi, win, own = buf.sample(16, rng)
        assert obs.shape == (16, 5, 5, 10)

    def test_save_load_roundtrip(self, tmp_path):
        buf = self._mk(16)
        buf.append_batch(*self._rows(10))
        p = tmp_path / "seg.pkl"
        assert buf.save_to(p)
        buf2 = self._mk(16)
        buf2.load_from(p)
        assert np.array_equal(buf2.obs, buf.obs)
        assert buf2.index == buf.index

    def test_per_sampling(self):
        buf = PrioritizedReplayBuffer(64, 5, 10)
        buf.append_batch(*self._rows(40))
        rng = np.random.default_rng(0)
        obs, pi, win, own, idx = buf.sample(8, rng)
        assert obs.shape[0] == 8
        buf.update_priorities(idx, np.full(8, 2.0))
        assert buf.tree.total() > 40  # raised priorities propagate


class TestLearner:
    def _setup(self):
        cfg = small_test_config(board_size=5, num_features=16, batch_size=8)
        net = build_network(cfg, "main")
        v = net.init(jax.random.PRNGKey(0))
        learner = Learner(cfg, net)
        state = learner.init_state(v)
        rng = np.random.default_rng(0)
        pi = rng.random((8, 26)).astype(np.float32)
        pi /= pi.sum(1, keepdims=True)
        batch = (
            jnp.asarray(rng.integers(0, 2, (8, 5, 5, 10)).astype(np.float32)),
            jnp.asarray(pi),
            jnp.asarray(rng.choice([-1.0, 1.0], 8).astype(np.float32)),
            jnp.asarray(rng.choice([-1.0, 0.0, 1.0], (8, 25)).astype(np.float32)),
        )
        return cfg, learner, state, batch

    def test_loss_decreases(self):
        cfg, learner, state, batch = self._setup()
        step = jax.jit(learner.train_step)
        _, m0 = step(state, batch, 1e-2)
        for _ in range(30):
            state, m = step(state, batch, 1e-2)
        assert float(m["total_loss"]) < float(m0["total_loss"])

    def test_lr_injection(self):
        cfg, learner, state, batch = self._setup()
        step = jax.jit(learner.train_step)
        s1, _ = step(state, batch, 0.0)
        # lr 0 -> params unchanged (decay is inside the scaled update)
        d = jax.tree_util.tree_map(
            lambda a, b: float(jnp.abs(a - b).max()), state.params, s1.params
        )
        assert max(jax.tree_util.tree_leaves(d)) == 0.0

    def test_metrics_keys(self):
        cfg, learner, state, batch = self._setup()
        _, m = jax.jit(learner.train_step)(state, batch, 1e-3)
        assert set(m) == {
            "total_loss", "value_loss", "own_loss", "act_policy_loss",
            "entropy_loss", "td_error",
        }
        # per-sample TD errors for PER priority feedback
        assert m["td_error"].shape == (batch[0].shape[0],)
        assert (np.asarray(m["td_error"]) >= 0).all()


class TestSchedules:
    def test_ad_lr_halves_every_1500(self):
        cfg = Config()
        lr = 6.5e-5
        lr2 = cfg.ad_lr(1499, lr)
        assert lr2 == lr * 0.5
        assert cfg.ad_lr(1500, lr) == lr
        # floor: never below 0.25x initial
        assert cfg.ad_lr(2999, 0.5 * 0.5 * 6.5e-5) == 0.5 * 0.5 * 6.5e-5

    def test_ratio_ramp(self):
        cfg = Config()
        r = cfg.ad_train_play_ratio(5, 0.075)
        assert abs(r - 0.07501) < 1e-9
        assert cfg.ad_train_play_ratio(6, 0.075) == 0.075
        assert cfg.ad_train_play_ratio(5, 0.26) == 0.26

    def test_value_ratio_decay(self):
        cfg = Config()
        assert abs(cfg.value_ratio_by_frame(0) - 1.0) < 1e-9
        assert cfg.value_ratio_by_frame(5000) < 0.02

    def test_auto_defaults_per_board_size(self):
        """max_step / search_max_depth auto-scale with the board: the
        reference constants for 9x9/7x7 (configure.py:16,
        scale_train_bound/GoEnv/environment.py:37), ~1.5/point elsewhere."""
        assert Config(board_size=9).max_step == 120
        assert Config(board_size=7).max_step == 74
        assert Config(board_size=19).max_step == 542
        # auto depth cap: min(max_step + 2, 64) at <=9x9 — the flat 48
        # bound routinely late-game at 9x9 (VERDICT r2 weak #3)
        assert Config(board_size=9).search_max_depth == 64
        assert Config(board_size=5, max_step=30).search_max_depth == 32
        assert Config(board_size=19).search_max_depth == 96
        # explicit values always win
        c = Config(board_size=19, max_step=200, search_max_depth=30)
        assert (c.max_step, c.search_max_depth) == (200, 30)


@pytest.mark.slow
def test_pipeline_end_to_end(tmp_path):
    """Minimum end-to-end slice (SURVEY.md section 7 stage 4): self-play ->
    replay -> training -> checkpoint roundtrip on a tiny config."""
    cfg = small_test_config(
        board_size=5,
        max_step=12,
        num_simulation=8,
        selfplay_batch=4,
        num_features=8,
        batch_size=8,
        buffer_size=512,
        train_play_ratio=0.05,
        evaluate_num=10**9,
        results_path=str(tmp_path / "results"),
    )
    from transgo_tpu.runtime.pipeline import TrainPipeline

    pipe = TrainPipeline(cfg, quiet=True)
    for _ in range(16):
        pipe.run_tick()
    assert pipe.now_play_steps == 16 * 4
    assert pipe.now_play_games > 0, "no game finished in 16 ticks"
    assert int(pipe.dreplay.size()) > 0
    assert pipe.now_train_steps > 0

    ckpt = tmp_path / "ckpt"
    pipe.save_checkpoint(str(ckpt))
    pipe2 = TrainPipeline(cfg, quiet=True)
    pipe2.load_checkpoint(str(ckpt))
    assert pipe2.now_train_steps == pipe.now_train_steps
    assert pipe2.now_play_games == pipe.now_play_games
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        pipe.train_state.params, pipe2.train_state.params,
    )
    assert max(jax.tree_util.tree_leaves(d)) == 0.0


class TestContinuousActor:
    """play_tick: per-board move boundaries (one search round per tick, a
    board moves the tick its own visit target is hit) must reproduce
    play_move's per-move semantics — same visit budget, labels, lengths."""

    def _setup(self, **over):
        from transgo_tpu.models import build_network
        from transgo_tpu.ops import GoEngine
        from transgo_tpu.runtime.actor import SelfPlayActor
        from transgo_tpu.search.mcts import MCTS, SearchMode

        cfg = small_test_config(
            board_size=5, max_step=12, num_simulation=8, selfplay_batch=4,
            num_features=8, continuous_selfplay=True, **over,
        )
        eng = GoEngine(cfg.board_size, cfg.komi, cfg.max_step)
        net = build_network(cfg, "main")
        variables = net.init(jax.random.PRNGKey(0))
        mcts = MCTS(cfg, eng, SearchMode.WP)
        actor = SelfPlayActor(cfg, mcts, net)
        return cfg, actor, variables

    def test_games_complete_with_labels(self):
        cfg, actor, variables = self._setup()
        state = actor.init_state(variables, jax.random.PRNGKey(1))
        tick = jax.jit(actor.play_tick)
        reset = jax.jit(actor.reset_done)

        total_moves = 0
        finished = 0
        for _ in range(160):
            state, out = tick(state, variables)
            total_moves += int(np.asarray(out.moved).sum())
            done = np.asarray(out.done)
            if done.any():
                lengths = np.asarray(out.length)
                win = np.asarray(out.win_z)
                for b in np.nonzero(done)[0]:
                    k = int(lengths[b])
                    assert 0 < k <= cfg.max_step
                    # labels are +-1 on played moves, 0 beyond
                    assert set(np.unique(win[b, :k])) <= {-1.0, 1.0}
                    assert np.all(win[b, k:] == 0.0)
                    finished += 1
                state = reset(state, variables, out.done)
            if finished >= 4:
                break
        assert finished >= 4, f"only {finished} games finished"
        assert total_moves >= finished * 2

    def test_move_respects_visit_target(self):
        """A board only moves once its root collected num_simulation new
        visits (or the round cap hit) — never earlier."""
        from transgo_tpu.search.tree import VISIT

        cfg, actor, variables = self._setup()
        state = actor.init_state(variables, jax.random.PRNGKey(2))
        tick = jax.jit(actor.play_tick)
        for _ in range(12):
            bar = np.arange(cfg.selfplay_batch)
            tree = state.tree
            visits = np.asarray(
                tree.stats[bar, np.asarray(tree.root)][:, VISIT]
            )
            target = np.asarray(state.visit_target)
            rounds = np.asarray(state.move_rounds)
            state, out = tick(state, variables)
            moved = np.asarray(out.moved)
            early = moved & (visits < target) & (rounds < cfg.num_simulation)
            assert not early.any(), (visits, target, rounds)


class TestRunChunk:
    """The fused continuous loop: chunk_ticks rounds + on-device game reset
    + device-replay append per device call."""

    def _setup(self):
        from transgo_tpu.models import build_network
        from transgo_tpu.ops import GoEngine
        from transgo_tpu.runtime.actor import SelfPlayActor
        from transgo_tpu.runtime.device_replay import device_replay_init
        from transgo_tpu.search.mcts import MCTS, SearchMode

        cfg = small_test_config(
            board_size=5, max_step=12, num_simulation=8, selfplay_batch=4,
            num_features=8, continuous_selfplay=True,
            selfplay_chunk_ticks=8,
        )
        eng = GoEngine(cfg.board_size, cfg.komi, cfg.max_step)
        net = build_network(cfg, "main")
        variables = net.init(jax.random.PRNGKey(0))
        mcts = MCTS(cfg, eng, SearchMode.WP)
        actor = SelfPlayActor(cfg, mcts, net)
        dreplay = device_replay_init(
            256, 5, cfg.encode_state_channels, 26, actor.own_dim
        )
        return cfg, actor, variables, dreplay

    def test_games_land_in_device_replay(self):
        cfg, actor, variables, dreplay = self._setup()
        state = actor.init_state(variables, jax.random.PRNGKey(1))
        chunk = jax.jit(actor.run_chunk)

        games = moves = 0
        for _ in range(16):
            state, dreplay, stats = chunk(state, dreplay, variables)
            games += int(np.asarray(stats["games"]))
            moves += int(np.asarray(stats["moves"]))
            assert int(np.asarray(stats["backlog"])) >= 0
            if games >= 4:
                break
        assert games >= 4, f"only {games} games in 16 chunks"
        size = int(dreplay.size())
        assert size > 0
        # every appended row is a real position: win labels are +-1,
        # pi rows sum to ~1
        win = np.asarray(dreplay.win_z)[:size]
        assert set(np.unique(win)) <= {-1.0, 1.0}
        pi = np.asarray(dreplay.pi)[:size]
        assert np.allclose(pi.sum(axis=1), 1.0, atol=1e-4)
        # move accounting is consistent: each game contributed <= max_step
        # moves and the appended rows equal the finished games' lengths
        assert moves >= size
        assert size <= games * cfg.max_step

    def test_synchronized_finishes_defer_not_drop(self):
        """A first generation finishing in lockstep exceeds a 1-game append
        budget; the excess boards freeze and drain over later ticks — every
        game reaches the ring, none are lost (round-1 run_chunk dropped
        them)."""
        from transgo_tpu.models import build_network
        from transgo_tpu.ops import GoEngine
        from transgo_tpu.runtime.actor import SelfPlayActor
        from transgo_tpu.runtime.device_replay import device_replay_init
        from transgo_tpu.search.mcts import MCTS, SearchMode

        cfg = small_test_config(
            board_size=5, max_step=6, num_simulation=4, selfplay_batch=4,
            num_features=8, continuous_selfplay=True,
            selfplay_chunk_ticks=4, append_budget=1,
            # this test NEEDS the synchronized first-generation wave that
            # stagger_init exists to prevent
            stagger_init=False,
        )
        eng = GoEngine(cfg.board_size, cfg.komi, cfg.max_step)
        net = build_network(cfg, "main")
        variables = net.init(jax.random.PRNGKey(0))
        mcts = MCTS(cfg, eng, SearchMode.WP)
        actor = SelfPlayActor(cfg, mcts, net)
        assert actor.append_budget == 1
        dreplay = device_replay_init(
            256, 5, cfg.encode_state_channels, 26, actor.own_dim
        )
        state = actor.init_state(variables, jax.random.PRNGKey(1))
        chunk = jax.jit(actor.run_chunk)

        games = 0
        saw_backlog = False
        for _ in range(40):
            state, dreplay, stats = chunk(state, dreplay, variables)
            games += int(np.asarray(stats["games"]))
            saw_backlog |= int(np.asarray(stats["backlog"])) > 0
            if games >= 8 and not int(np.asarray(stats["backlog"])):
                break
        # with max_step=6 every first-generation game ends on the same tick
        # -> 4 pending vs budget 1 must have deferred at least once
        assert saw_backlog, "burst never exceeded the forced 1-game budget"
        assert games >= 8
        # ring rows == sum of drained game lengths: nothing lost or junk
        size = int(dreplay.size())
        assert size == games * cfg.max_step  # all games hit the move cap
        win = np.asarray(dreplay.win_z)[:size]
        assert set(np.unique(win)) <= {-1.0, 1.0}
        pi = np.asarray(dreplay.pi)[:size]
        assert np.allclose(pi.sum(axis=1), 1.0, atol=1e-4)


@pytest.mark.slow
def test_pipeline_continuous_end_to_end(tmp_path):
    """The pipeline on fused continuous self-play: games finish and append
    on device, counters follow the chunk stats, training catches up."""
    cfg = small_test_config(
        board_size=5,
        max_step=12,
        num_simulation=8,
        selfplay_batch=4,
        num_features=8,
        batch_size=8,
        buffer_size=512,
        train_play_ratio=0.05,
        evaluate_num=10**9,
        continuous_selfplay=True,
        selfplay_chunk_ticks=8,
        results_path=str(tmp_path / "results"),
    )
    from transgo_tpu.runtime.pipeline import TrainPipeline

    pipe = TrainPipeline(cfg, quiet=True)
    assert pipe._jit_chunk is not None  # fused path selected
    for _ in range(40):
        pipe.run_tick()
        if pipe.now_play_games >= 4 and pipe.now_train_steps > 0:
            break
    assert pipe.now_play_games >= 4, "no games finished under continuous mode"
    assert pipe.now_train_steps > 0
    assert int(pipe.dreplay.size()) > 0
    # at >=2 rounds per 8-sim move, moves per chunk are bounded well below
    # ticks * batch
    assert (
        pipe.now_play_steps
        <= pipe.tick * cfg.selfplay_chunk_ticks * cfg.selfplay_batch // 2
    )


def test_init_model_resumes_weights(tmp_path):
    """config.init_model loads a _save_policy artifact into a fresh
    pipeline (model-only resume, reference transgo.py:71-77)."""
    from transgo_tpu.runtime.pipeline import TrainPipeline

    cfg = small_test_config(
        board_size=5, max_step=12, num_simulation=8, selfplay_batch=4,
        num_features=8, batch_size=8, buffer_size=512,
        results_path=str(tmp_path / "results"),
    )
    pipe = TrainPipeline(cfg, quiet=True)
    variables = pipe.learner.variables(pipe.train_state)
    pipe._save_policy(variables, "current_policy")

    cfg2 = small_test_config(
        board_size=5, max_step=12, num_simulation=8, selfplay_batch=4,
        num_features=8, batch_size=8, buffer_size=512,
        results_path=str(tmp_path / "results2"),
        init_model=str(tmp_path / "results" / "current_policy"),
        seed=123,  # different init seed: params must still match
    )
    pipe2 = TrainPipeline(cfg2, quiet=True)
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()),
        pipe.train_state.params, pipe2.train_state.params,
    )
    assert max(jax.tree_util.tree_leaves(d)) == 0.0


def test_overlapped_tick_matches_sync_counters(tmp_path):
    """Overlapped dispatch (train burst + next chunk before reading the
    previous chunk's stats) must replay the exact same self-play schedule
    as the synchronous tick once flushed. Compared with training disabled:
    with training on, overlap legitimately phase-shifts the weight updates
    by one chunk, which perturbs subsequent searches (just as the
    reference's sleeping throttles had no fixed phase); the trained
    overlapped path is covered by test_pipeline_continuous_end_to_end."""
    from transgo_tpu.runtime.pipeline import TrainPipeline

    def build(overlap):
        cfg = small_test_config(
            board_size=5, max_step=12, num_simulation=8, selfplay_batch=4,
            num_features=8, batch_size=8, buffer_size=512,
            train_play_ratio=0.0, adjust_train_play_ratio=False,
            evaluate_num=10**9,
            continuous_selfplay=True, selfplay_chunk_ticks=8,
            overlap_train_selfplay=overlap,
            results_path=str(tmp_path / f"results_{overlap}"),
        )
        return TrainPipeline(cfg, quiet=True)

    sync = build(False)
    over = build(True)
    n = 12
    for _ in range(n):
        sync.run_tick()
        over.run_tick()
    # before the flush the overlapped counters lag by exactly one in-flight
    # chunk
    assert over._pending_stats is not None
    over.flush_pending()
    assert over.now_play_steps == sync.now_play_steps
    assert over.now_play_games == sync.now_play_games
    assert int(over.dreplay.size()) == int(sync.dreplay.size())


def test_overlapped_tick_trains(tmp_path):
    """Overlapped mode still trains once games exist, and the deferred
    controller converges to the ratio target."""
    from transgo_tpu.runtime.pipeline import TrainPipeline

    cfg = small_test_config(
        board_size=5, max_step=12, num_simulation=8, selfplay_batch=4,
        num_features=8, batch_size=8, buffer_size=512,
        train_play_ratio=0.05, adjust_train_play_ratio=False,
        evaluate_num=10**9,
        continuous_selfplay=True, selfplay_chunk_ticks=8,
        overlap_train_selfplay=True,
        results_path=str(tmp_path / "results"),
    )
    pipe = TrainPipeline(cfg, quiet=True)
    for _ in range(30):
        pipe.run_tick()
        if pipe.now_train_steps > 2:
            break
    pipe.flush_pending()
    assert pipe.now_train_steps > 0
    # controller keeps train/play within one chunk of the target
    assert (
        pipe.now_train_steps
        >= int(
            (pipe.now_play_steps - cfg.selfplay_chunk_ticks
             * cfg.selfplay_batch) * cfg.train_play_ratio
        )
    )


def test_per_priorities_updated_by_training(tmp_path):
    """use_per=True: the trainer feeds |value - win_z| TD errors back into
    the sum tree (the reference's PER was write-only, its update_priority
    had no caller)."""
    from transgo_tpu.runtime.pipeline import TrainPipeline

    cfg = small_test_config(
        board_size=5, max_step=12, num_simulation=8, selfplay_batch=4,
        num_features=8, batch_size=8, buffer_size=512,
        train_play_ratio=0.05, evaluate_num=10**9, use_per=True,
        results_path=str(tmp_path / "results"),
    )
    pipe = TrainPipeline(cfg, quiet=True)
    assert not pipe.use_device_replay  # PER lives in the host buffer
    for _ in range(40):
        pipe.run_tick()
        if pipe.now_train_steps >= 2:
            break
    assert pipe.now_train_steps >= 1, "training never engaged"
    # appends write a uniform max-priority per row; TD feedback from the
    # train step must have differentiated the sampled leaves
    tree = pipe.replay.tree
    leaves = tree.tree[tree.tree_start:tree.tree_start + len(pipe.replay)]
    assert len(np.unique(np.round(leaves, 10))) > 1, (
        "all priorities still at the append-time constant — "
        "update_priorities was never fed"
    )


def test_game_total_num_stops_training(tmp_path):
    """train() terminates once now_play_games reaches game_total_num (the
    reference driver's stop rule, transgo.py:136; the knob was dead in
    round 2)."""
    cfg = small_test_config(
        board_size=5, max_step=12, num_simulation=8, selfplay_batch=4,
        num_features=8, batch_size=8, buffer_size=512,
        continuous_selfplay=True, selfplay_chunk_ticks=8,
        evaluate_num=10**9, game_total_num=1,
        results_path=str(tmp_path / "results"),
    )
    from transgo_tpu.runtime.pipeline import TrainPipeline

    pipe = TrainPipeline(cfg, quiet=True)
    pipe.train(max_ticks=200, log_every=10**9)
    assert pipe.now_play_games >= 1
    assert pipe.tick < 200, "train() ran to max_ticks despite game_total_num"


def test_resume_telemetry_monotone(tmp_path):
    """After a checkpoint resume in a fresh pipeline, play_steps_per_s uses
    the process-local step delta and cum_seconds carries across segments
    (VERDICT r2 weak #4: restored cumulative steps over local elapsed time
    fabricated 1900+ moves/s spikes)."""
    import json

    cfg_kw = dict(
        board_size=5, max_step=12, num_simulation=8, selfplay_batch=4,
        num_features=8, batch_size=8, buffer_size=512,
        continuous_selfplay=True, selfplay_chunk_ticks=8,
        evaluate_num=10**9, train_play_ratio=0.05,
    )
    from transgo_tpu.runtime.pipeline import TrainPipeline

    cfg = small_test_config(results_path=str(tmp_path / "r1"), **cfg_kw)
    pipe = TrainPipeline(cfg, quiet=True)
    pipe.train(max_ticks=6, log_every=2)
    ckpt = str(tmp_path / "ckpt")
    pipe.save_checkpoint(ckpt)

    cfg2 = small_test_config(results_path=str(tmp_path / "r2"), **cfg_kw)
    pipe2 = TrainPipeline(cfg2, quiet=True)
    pipe2.load_checkpoint(ckpt)
    assert pipe2.now_play_steps == pipe.now_play_steps
    pipe2.train(max_ticks=pipe2.tick + 4, log_every=2)

    rows = [
        json.loads(ln)
        for ln in (tmp_path / "r2" / "metrics.jsonl").read_text().splitlines()
    ]
    rows = [r for r in rows if "play_steps_per_s" in r]
    assert rows, "no telemetry rows after resume"
    # resumed-segment rates reflect only this process's steps: strictly
    # fewer than the restored cumulative count allows
    for r in rows:
        local_possible = r["now_play_steps"] - pipe.now_play_steps
        assert r["play_steps_per_s"] * 1e-9 <= max(local_possible, 1)
        assert r["play_steps_per_s"] < 1e6
    # cum_seconds continues from the first segment rather than resetting
    assert rows[-1]["cum_seconds"] > 0


def test_lr_index_found_by_label_not_position():
    """_set_lr locates the inject_hyperparams stage by its hyperparams dict
    (VERDICT r3 weak #5: a hard-coded opt_state[2] silently broke if the
    optax.chain was ever reordered)."""
    import optax

    from transgo_tpu.runtime.learner import _find_lr_index

    cfg = small_test_config(board_size=5, num_features=8)
    net = build_network(cfg, "main")
    learner = Learner(cfg, net)
    assert learner._lr_index == 2  # current chain layout

    # a reordered/extended chain still resolves to the right stage
    tx = optax.chain(
        optax.inject_hyperparams(
            lambda learning_rate: optax.scale(-learning_rate)
        )(learning_rate=1e-3),
        optax.add_decayed_weights(1e-4),
    )
    assert _find_lr_index(tx.init(jnp.zeros(()))) == 0
    tx2 = optax.chain(optax.add_decayed_weights(1e-4), optax.scale(1.0))
    with pytest.raises(ValueError):
        _find_lr_index(tx2.init(jnp.zeros(())))

    # end-to-end: injection actually lands (lr=0 -> params frozen)
    v = net.init(jax.random.PRNGKey(0))
    state = learner.init_state(v)
    rng = np.random.default_rng(0)
    pi = rng.random((4, 26)).astype(np.float32)
    pi /= pi.sum(1, keepdims=True)
    batch = (
        jnp.asarray(rng.integers(0, 2, (4, 5, 5, 10)).astype(np.float32)),
        jnp.asarray(pi),
        jnp.asarray(rng.choice([-1.0, 1.0], 4).astype(np.float32)),
        jnp.asarray(rng.choice([-1.0, 0.0, 1.0], (4, 25)).astype(np.float32)),
    )
    s1, _ = jax.jit(learner.train_step)(state, batch, 0.0)
    d = jax.tree_util.tree_map(
        lambda a, b: float(jnp.abs(a - b).max()), state.params, s1.params
    )
    assert max(jax.tree_util.tree_leaves(d)) == 0.0


class TestStaggerInit:
    """config.stagger_init desynchronizes the first generation (VERDICT r3
    weak #3: all-B-boards-in-sync finishes starved the per-game LR/gate
    controllers for ~200 ticks at B=256)."""

    def _actor(self, **over):
        from transgo_tpu.models import build_network
        from transgo_tpu.ops import GoEngine
        from transgo_tpu.runtime.actor import SelfPlayActor
        from transgo_tpu.search.mcts import MCTS, SearchMode

        kw = dict(
            board_size=5, max_step=20, num_simulation=4, selfplay_batch=8,
            num_features=8, continuous_selfplay=True,
            selfplay_chunk_ticks=4,
        )
        kw.update(over)
        cfg = small_test_config(**kw)
        eng = GoEngine(cfg.board_size, cfg.komi, cfg.max_step)
        net = build_network(cfg, "main")
        variables = net.init(jax.random.PRNGKey(0))
        mcts = MCTS(cfg, eng, SearchMode.WP)
        return cfg, SelfPlayActor(cfg, mcts, net), variables

    def test_first_generation_starts_spread(self):
        from transgo_tpu.search.tree import gather_nodes

        cfg, actor, variables = self._actor()
        assert actor._stagger_max == cfg.max_step // 4
        state = actor.init_state(variables, jax.random.PRNGKey(3))
        roots = gather_nodes(state.tree, state.tree.root)
        sc = np.asarray(roots.step_count)
        # staggered openings: offsets within [0, max_step//4], not all equal
        assert (sc >= 1).all() and (sc <= 1 + cfg.max_step // 4).all()
        assert len(np.unique(sc)) > 1, sc
        # trajectories still start at slot 0
        assert (np.asarray(state.move_count) == 0).all()
        # no board terminated during its random opening
        assert not np.asarray(roots.terminated).any()

    def test_off_by_default_in_lockstep(self):
        cfg, actor, variables = self._actor(continuous_selfplay=False)
        assert actor._stagger_max == 0

    def test_finishes_spread_across_chunks(self):
        """First-generation completions must NOT all land in one chunk."""
        from transgo_tpu.runtime.device_replay import device_replay_init

        cfg, actor, variables = self._actor()
        dreplay = device_replay_init(
            512, 5, cfg.encode_state_channels, 26, actor.own_dim
        )
        state = actor.init_state(variables, jax.random.PRNGKey(4))
        chunk = jax.jit(actor.run_chunk)
        chunks_with_finishes = 0
        total = 0
        for _ in range(30):
            state, dreplay, stats = chunk(state, dreplay, variables)
            g = int(np.asarray(stats["games"]))
            chunks_with_finishes += g > 0
            total += g
            if total >= cfg.selfplay_batch:
                break
        assert total >= cfg.selfplay_batch
        assert chunks_with_finishes >= 2, (
            f"first generation finished in {chunks_with_finishes} chunk(s)"
        )


class TestCheckpointRing:
    """save_checkpoint's chunked ring readback + degrade-on-timeout
    (VERDICT r4 weak #1: the flagship run's final save wedged on a
    single-shot ~2 GB device readback)."""

    def _pipe(self, tmp_path, **over):
        from transgo_tpu.runtime.pipeline import TrainPipeline

        cfg = small_test_config(
            board_size=5, max_step=12, num_simulation=8, selfplay_batch=4,
            num_features=8, batch_size=8, buffer_size=over.pop(
                "buffer_size", 512
            ),
            continuous_selfplay=True, selfplay_chunk_ticks=4,
            evaluate_num=10**9,
            results_path=str(tmp_path / "results"), **over,
        )
        return TrainPipeline(cfg, quiet=True)

    def test_chunked_ring_roundtrip(self, tmp_path):
        """A partially-filled ring survives save->load exactly, via the
        sliced readback path (slice smaller than the live region)."""
        pipe = self._pipe(tmp_path, ring_save_slice_mb=1)
        for _ in range(30):
            pipe.run_tick()
            pipe.flush_pending()
            if pipe.now_play_games >= 2:
                break
        assert pipe.now_play_games >= 2
        size0 = int(pipe.dreplay.size())
        assert size0 > 0
        obs0 = np.asarray(pipe.dreplay.obs)
        pipe.save_checkpoint(str(tmp_path / "ck"))

        pipe2 = self._pipe(tmp_path)
        pipe2.load_checkpoint(str(tmp_path / "ck"))
        assert int(pipe2.dreplay.size()) == size0
        assert np.array_equal(np.asarray(pipe2.dreplay.obs), obs0)
        assert pipe2.now_play_games == pipe.now_play_games

    def test_timeout_degrades_to_light_checkpoint(self, tmp_path):
        """ring_save_timeout=0 forces the degrade path: the save must still
        land (params + opt_state + counters, no replay) and load back
        without corrupting the opt_state."""
        pipe = self._pipe(tmp_path)
        for _ in range(30):
            pipe.run_tick()
            pipe.flush_pending()
            if pipe.now_play_games >= 1:
                break
        pipe.config.ring_save_timeout = 0.0
        pipe.save_checkpoint(str(tmp_path / "ck_light"))

        pipe2 = self._pipe(tmp_path)
        ring_before = int(pipe2.dreplay.size())
        pipe2.load_checkpoint(str(tmp_path / "ck_light"))
        # counters restored; ring untouched (fresh)
        assert pipe2.now_play_games == pipe.now_play_games
        assert pipe2.now_train_steps == pipe.now_train_steps
        assert int(pipe2.dreplay.size()) == ring_before
        # restored opt_state must be usable: one train step runs
        if pipe2.now_play_games >= 1:
            pipe2._train_catchup()

    @pytest.mark.slow
    def test_production_size_ring_roundtrip(self, tmp_path):
        """The full production-capacity ring (1.5M x 9x9x10 uint8, ~2 GB)
        round-trips through the chunked save without wedging, in bounded
        time (the r4 incident scenario)."""
        import time as _time

        from transgo_tpu.runtime.device_replay import DeviceReplay
        from transgo_tpu.runtime.pipeline import TrainPipeline

        cfg = small_test_config(
            board_size=9, max_step=20, num_simulation=8, selfplay_batch=4,
            num_features=8, batch_size=8, buffer_size=1_500_000,
            continuous_selfplay=True, evaluate_num=10**9,
            results_path=str(tmp_path / "results"),
        )
        pipe = TrainPipeline(cfg, quiet=True)
        # fill 300K live rows with a recognizable pattern (device-side)
        live = 300_000
        r = pipe.dreplay
        obs = r.obs.at[:live].set(
            (jnp.arange(live, dtype=jnp.int32)[:, None] % 251).astype(
                jnp.uint8
            )
        )
        pipe.dreplay = DeviceReplay(
            obs=obs, obs_shape=r.obs_shape, pi=r.pi, win_z=r.win_z,
            own_z=r.own_z, index=jnp.int32(live), full=jnp.bool_(False),
        )
        t0 = _time.time()
        pipe.save_checkpoint(str(tmp_path / "big"))
        dt = _time.time() - t0
        assert dt < 240, f"production-ring save took {dt:.0f}s"

        pipe2 = TrainPipeline(cfg, quiet=True)
        pipe2.load_checkpoint(str(tmp_path / "big"))
        assert int(pipe2.dreplay.index) == live
        got = np.asarray(pipe2.dreplay.obs[live - 3:live])
        want = (np.arange(live - 3, live)[:, None] % 251).astype(np.uint8)
        assert np.array_equal(got, np.broadcast_to(want, got.shape))
