"""Batched self-play actor.

TPU-native replacement for the reference's 6 Ray ``SelfPlay`` actor processes
(self_play.py:881-983): one jitted "move tick" advances B games in lockstep —
search, action sampling, tree reuse, trajectory recording — and finished
games are labeled on device (win_z per mover, signed ownership,
self_play.py:929-940) and drained to the host replay buffer in fixed-size
chunks. Weight "broadcast" is passing the current params pytree into the
jitted step — the reference's per-game SharedStorage weight pull
(self_play.py:913) becomes a no-op.

Trajectory planes are stored as uint8 (all encoder planes are binary) to
keep the on-device footprint small at large B.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp
from flax import struct

from transgo_tpu.models.nets import TransGoNetwork
from transgo_tpu.ops.state import BLACK
from transgo_tpu.search.mcts import MCTS
from transgo_tpu.search.tree import (
    VISIT,
    Tree,
    gather_nodes,
    row_set,
)


@struct.dataclass
class ActorState:
    tree: Tree
    traj_obs: jnp.ndarray     # uint8 [B, T, H, W, C]
    traj_pi: jnp.ndarray      # float32 [B, T, A]
    traj_player: jnp.ndarray  # int8 [B, T]
    move_count: jnp.ndarray   # int32 [B]
    rng: jnp.ndarray          # PRNG key
    # continuous-mode bookkeeping (unused by the lockstep play_move path):
    visit_target: jnp.ndarray  # float32 [B] root-visit goal this move
    move_rounds: jnp.ndarray   # int32 [B] search rounds spent this move
    # fused-chunk bookkeeping: finished boards beyond a tick's append
    # budget freeze (no move, no search, trajectory intact) until a later
    # tick drains them — games are deferred, never dropped. Synchronized
    # finishes are real: the whole first generation hits max_step on the
    # same tick.
    await_drain: jnp.ndarray   # bool [B]


class TickOut(NamedTuple):
    done: jnp.ndarray     # bool [B] games that just finished
    length: jnp.ndarray   # int32 [B] moves in the finished game
    win_z: jnp.ndarray    # float32 [B, T] per-move outcome labels
    own_z: jnp.ndarray    # float32 [B, T, n] per-move ownership labels
    order: jnp.ndarray    # int32 [B] board indices, finished games first
    moved: jnp.ndarray    # bool [B] boards that played a move this tick


class DrainChunk(NamedTuple):
    obs: jnp.ndarray      # uint8 [D, T, H, W, C]
    pi: jnp.ndarray       # float32 [D, T, A]
    win_z: jnp.ndarray    # float32 [D, T]
    own_z: jnp.ndarray    # float32 [D, T, n]
    length: jnp.ndarray   # int32 [D]


class SelfPlayActor:
    def __init__(self, config, mcts: MCTS, network: TransGoNetwork,
                 drain_size: int = 8, sub_network=None, sub_vars=None):
        """``sub_network``/``sub_vars``: optional frozen 7x7 sub-model for
        scale transfer (reference self_play.py:884-899). When present, the
        jitted entry points accept a traced ``gamma`` blend weight and the
        leaf eval mixes the sub-model's stitched policy/value
        (curriculum.transfer); gamma=None falls back to the plain eval."""
        self.config = config
        self.mcts = mcts
        self.network = network
        self.sub_network = sub_network
        self.sub_vars = sub_vars
        self.engine = mcts.engine
        self.batch = config.selfplay_batch
        self.max_moves = config.max_step
        # continuous mode: per-board move boundaries (play_tick) instead of
        # the lockstep per-move search loop (play_move) — root noise is then
        # applied here (at each board's move start), never by the search
        self.continuous = bool(getattr(config, "continuous_selfplay", False))
        self.chunk_ticks = int(getattr(config, "selfplay_chunk_ticks", 16))
        # fused-chunk boundary cadence (see Config.selfplay_boundary_every)
        self.boundary_every = max(
            1, min(
                int(getattr(config, "selfplay_boundary_every", 1)),
                self.chunk_ticks,
            )
        )
        self.drain_size = min(drain_size, self.batch)
        # fused-chunk per-tick append budget: a full-batch synchronized
        # burst (the whole first generation hits max_step on the same tick)
        # drains in ceil(B/budget) ticks, the excess boards frozen via
        # ActorState.await_drain. Config.append_budget overrides (tests).
        self.append_budget = int(
            getattr(config, "append_budget", 0)
            or min(self.batch, max(32, self.batch // 8))
        )
        # trajectory shapes follow the search's observation/action space
        # (full board for the main run; the 7x7 window for scale_live)
        self.obs_size = mcts.encoder.obs_size
        self.num_actions = mcts.num_actions
        # own-label width probes the engine's territory output
        self.own_dim = int(
            self.engine.score_and_territory(self.engine.init(1))[1].shape[-1]
        )
        # engines with randomized game starts (LiveWindowEngine boundary
        # seeding) expose init_random(batch, key)
        if hasattr(self.engine, "init_random"):
            self._init_games = self.engine.init_random
        else:
            self._init_games = lambda b, key: self.engine.init(b)
        # first-generation desync (config.stagger_init): only plain
        # engines in continuous mode — the live-window engine already
        # randomizes starts, and lockstep mode has no wave problem.
        # Skipped when resuming from a trained policy (config.init_model;
        # load_checkpoint clears it too): uniform-random openings are fine
        # for a fresh net but pollute post-resume training targets and
        # depth probes with off-policy positions (ADVICE r4).
        self._stagger_max = (
            self.max_moves // 4
            if (
                getattr(config, "stagger_init", False)
                and self.continuous
                and not hasattr(self.engine, "init_random")
                and not getattr(config, "init_model", None)
            )
            else 0
        )

    # ------------------------------------------------------------------
    def _eval_fn(self, variables, gamma=None):
        """Leaf eval closure; with a sub-model and a traced ``gamma``,
        the WP scale-transfer mix (self_play.py:796-829). gamma is a
        traced scalar so the per-train-step decay (value_ratio_by_frame)
        never retraces the search program."""
        if gamma is not None and self.sub_network is not None:
            from transgo_tpu.curriculum.transfer import make_transfer_eval_fn

            return make_transfer_eval_fn(
                self.config, self.network, variables,
                self.sub_network, self.sub_vars, gamma,
            )
        from transgo_tpu.search.evalfn import make_eval_fn

        return make_eval_fn(
            self.network, variables, komi=self.config.komi,
            own_blend=self.config.value_own_blend,
            tanh_norm=self.config.tanh_norm,
        )

    # ------------------------------------------------------------------
    def _stagger_step(self, states, active, key):
        """One uniform-random legal opening move on ``active`` boards."""
        analysis = self.engine.analyze(states)
        mask = self.engine.legal_action_mask(states, analysis)
        logits = jnp.where(mask, 0.0, -jnp.inf)
        action = jax.random.categorical(key, logits, axis=-1)
        new_states, _ = self.engine.step(
            states, action.astype(jnp.int32), analysis
        )

        def pick(new, old):
            m = active.reshape(active.shape + (1,) * (old.ndim - 1))
            return jnp.where(m, new, old)

        return jax.tree_util.tree_map(pick, new_states, states)

    def _stagger_games(self, states, key):
        """Desynchronized first generation: board i opens with
        k_i ~ U{0..max_step//4} random legal moves before its first tree is
        built (config.stagger_init). The trajectory starts at the staggered
        position (move_count 0), so first-generation games are shorter by
        k_i moves and their completions spread across ~max_step//4 ticks;
        every later generation inherits the spread because a board's next
        game starts the tick its previous one drains. Traceable — called
        under the init_state jit (a fixed-round fori_loop)."""
        koff, key = jax.random.split(key)
        b = states.stones.shape[0]
        offsets = jax.random.randint(koff, (b,), 0, self._stagger_max + 1)

        def body(i, carry):
            states, key = carry
            key, kk = jax.random.split(key)
            return self._stagger_step(states, offsets > i, kk), key

        states, _ = jax.lax.fori_loop(
            0, self._stagger_max, body, (states, key)
        )
        return states

    def init_state(self, variables, key, gamma=None) -> ActorState:
        b = self.batch
        t = self.max_moves
        key, kgames, knoise, kstag = jax.random.split(key, 4)
        eval_fn = self._eval_fn(variables, gamma)

        # one jitted build: eager op-by-op dispatch of the stagger loop +
        # root evaluation took ~3.5 min per process at the production shape
        # through the tunneled device link; compiled it is seconds
        def build(kgames, kstag, knoise):
            games = self._init_games(b, kgames)
            if self._stagger_max > 0:
                games = self._stagger_games(games, kstag)
            tree = self.mcts.new_tree(b)
            tree = self.mcts.reset_root(tree, eval_fn, games)
            if self.continuous:
                tree = self.mcts.root_dirichlet(tree, knoise)
            return tree

        tree = jax.jit(build)(kgames, kstag, knoise)
        bar = jnp.arange(b)
        return ActorState(
            tree=tree,
            traj_obs=jnp.zeros(
                (b, t, self.obs_size, self.obs_size,
                 self.config.encode_state_channels),
                jnp.uint8,
            ),
            traj_pi=jnp.zeros((b, t, self.num_actions), jnp.float32),
            traj_player=jnp.zeros((b, t), jnp.int8),
            move_count=jnp.zeros((b,), jnp.int32),
            rng=key,
            visit_target=tree.stats[bar, tree.root, VISIT]
            + self.mcts.num_simulations,
            move_rounds=jnp.zeros((b,), jnp.int32),
            await_drain=jnp.zeros((b,), bool),
        )

    # ------------------------------------------------------------------
    def play_move(self, state: ActorState, variables,
                  gamma=None) -> Tuple[ActorState, TickOut]:
        """One move for every game (the body of continuous_self_play's inner
        loop, self_play.py:915-928). Pure — jit at the call site.

        The batch size is derived from the arrays (not config) so the same
        method body works on per-shard slices under shard_map."""
        b = state.move_count.shape[0]
        eval_fn = self._eval_fn(variables, gamma)
        key, kmove = jax.random.split(state.rng)

        root_states = gather_nodes(state.tree, state.tree.root)
        res = self.mcts.get_action_probs(state.tree, eval_fn, kmove)

        mc = jnp.clip(state.move_count, 0, self.max_moves - 1)
        traj_obs = row_set(
            state.traj_obs, mc, res.observation.astype(jnp.uint8)
        )
        traj_pi = row_set(state.traj_pi, mc, res.action_probs)
        traj_player = row_set(
            state.traj_player, mc, root_states.next_player
        )

        tree, done = self.mcts.advance(res.tree, res.action, eval_fn)
        move_count = state.move_count + 1

        # label finished games (self_play.py:929-940); the scoring flood
        # fill only runs on ticks where at least one game ended
        final_states = gather_nodes(tree, tree.root)

        def label(_):
            winner = self.engine.winner(final_states)          # [B]
            _, territory = self.engine.score_and_territory(final_states)
            return winner, territory

        def skip(_):
            return (
                jnp.zeros((b,), jnp.int8),
                jnp.zeros((b, self.own_dim), jnp.float32),
            )

        winner, territory = jax.lax.cond(jnp.any(done), label, skip, None)
        t_idx = jnp.arange(self.max_moves)[None, :]
        played = t_idx < move_count[:, None]
        win_z = jnp.where(
            traj_player == winner[:, None], 1.0, -1.0
        ) * played
        black_mover = traj_player == BLACK
        own_z = jnp.where(
            black_mover[:, :, None], territory[:, None, :],
            -territory[:, None, :],
        ) * played[:, :, None]

        order = jnp.argsort(~done)  # finished boards first, stable

        new_state = state.replace(
            tree=tree,
            traj_obs=traj_obs,
            traj_pi=traj_pi,
            traj_player=traj_player,
            move_count=move_count,
            rng=key,
        )
        return new_state, TickOut(
            done, move_count, win_z, own_z, order, jnp.ones((b,), bool)
        )

    # ------------------------------------------------------------------
    def _move_phase(self, state: ActorState, ksample):
        """Per-board move boundary: boards whose root hit the visit target
        (or the round cap) record pi/obs at their move slot, sample an
        action and advance their tree — everyone else passes through.

        Returns (state', ready, done, need_expand) where ``state'`` carries
        the merged tree WITHOUT root expansion/noise/targets (the caller
        batches those across advance and reset sites)."""
        b = state.move_count.shape[0]
        bar = jnp.arange(b)
        tree = state.tree

        root_visits = tree.stats[bar, tree.root, VISIT]
        ready = (
            (root_visits >= state.visit_target)
            | (state.move_rounds >= self.mcts.num_simulations)
        ) & ~state.await_drain  # frozen boards wait for their drain slot

        root_states = gather_nodes(tree, tree.root)
        counts, pi = self.mcts.action_statistics(tree)
        legal_root = tree.legal[bar, tree.root]
        none_left = ~jnp.any(counts > 0, axis=1)
        counts = jnp.where(
            none_left[:, None], legal_root.astype(counts.dtype), counts
        )
        pi = jnp.where(
            none_left[:, None],
            legal_root
            / jnp.maximum(legal_root.sum(axis=1, keepdims=True), 1),
            pi,
        )
        step = root_states.step_count.astype(jnp.float32)
        temp = self.config.epsilon_by_frame(step)
        action = self.mcts.sample_action(counts, temp, ksample)

        obs = self.mcts.encoder(root_states)
        mc = jnp.clip(state.move_count, 0, self.max_moves - 1)
        traj_obs = row_set(state.traj_obs, mc, obs.astype(jnp.uint8), ready)
        traj_pi = row_set(state.traj_pi, mc, pi, ready)
        traj_player = row_set(
            state.traj_player, mc, root_states.next_player, ready
        )
        move_count = state.move_count + ready.astype(jnp.int32)

        adv_tree, adv_done, adv_need = self.mcts.advance_raw(
            tree, action, valid=ready
        )

        def pick(new, old):
            m = ready.reshape(ready.shape + (1,) * (old.ndim - 1))
            return jnp.where(m, new, old)

        tree = jax.tree_util.tree_map(pick, adv_tree, tree)
        done = adv_done & ready
        need_expand = ready & adv_need

        state = state.replace(
            tree=tree,
            traj_obs=traj_obs,
            traj_pi=traj_pi,
            traj_player=traj_player,
            move_count=move_count,
        )
        return state, ready, done, need_expand

    def _label_done(self, state: ActorState, done):
        """(win_z[B, T], own_z[B, T, n]) terminal labels
        (self_play.py:929-940); only meaningful where ``done``."""
        b = done.shape[0]
        final_states = gather_nodes(state.tree, state.tree.root)
        winner = self.engine.winner(final_states)
        _, territory = self.engine.score_and_territory(final_states)
        t_idx = jnp.arange(self.max_moves)[None, :]
        played = t_idx < state.move_count[:, None]
        win_z = jnp.where(
            state.traj_player == winner[:, None], 1.0, -1.0
        ) * played
        black_mover = state.traj_player == BLACK
        own_z = jnp.where(
            black_mover[:, :, None], territory[:, None, :],
            -territory[:, None, :],
        ) * played[:, :, None]
        return win_z, own_z

    def _finish_move_setup(self, state: ActorState, moved, done, knoise):
        """Root noise + fresh visit target for boards starting a new move."""
        b = moved.shape[0]
        bar = jnp.arange(b)
        tree = self.mcts.root_dirichlet(state.tree, knoise, mask=moved)
        root_visits = tree.stats[bar, tree.root, VISIT]
        visit_target = jnp.where(
            done,
            0.0,  # idle until reset
            jnp.where(
                moved,
                root_visits + self.mcts.num_simulations,
                state.visit_target,
            ),
        )
        return state.replace(
            tree=tree,
            visit_target=visit_target,
            move_rounds=jnp.where(moved, 0, state.move_rounds),
        )

    def play_tick(self, state: ActorState, variables,
                  gamma=None) -> Tuple[ActorState, TickOut]:
        """Continuous self-play, host-drained variant: one search round per
        tick, with *per-board* move boundaries. A board plays its move the
        tick its own root hits the visit target — no board ever waits for
        the batch's slowest searcher, which is what flattens ``play_move``
        throughput at large B (every move there costs max-over-boards
        rounds; here the cost averages out across a game). Search semantics
        per move are identical to ``play_move``: same visit target
        (num_simulation new root visits, self_play.py:662-664), same round
        cap, same noise/temperature/pi rules.

        NOTE: each call costs a host round trip; production uses
        :meth:`run_chunk`, which scans this tick body on device and appends
        finished games straight into the device replay ring. Pure — jit at
        the call site."""
        b = state.move_count.shape[0]
        bar = jnp.arange(b)
        eval_fn = self._eval_fn(variables, gamma)
        key, kround, ksample, knoise = jax.random.split(state.rng, 4)
        state = state.replace(rng=key)

        state, ready, done, need_expand = self._move_phase(state, ksample)
        state = state.replace(
            tree=self.mcts._expand_roots(state.tree, eval_fn, need_expand)
        )
        state = self._finish_move_setup(state, ready & ~done, done, knoise)

        win_z, own_z = jax.lax.cond(
            jnp.any(done),
            lambda _: self._label_done(state, done),
            lambda _: (
                jnp.zeros((b, self.max_moves), jnp.float32),
                jnp.zeros((b, self.max_moves, self.own_dim), jnp.float32),
            ),
            None,
        )
        order = jnp.argsort(~done)

        # ---- search phase: one round for boards still below target ----
        tree = state.tree
        active = (
            tree.stats[bar, tree.root, VISIT] < state.visit_target
        ) & ~done
        tree = self.mcts.run_round(tree, eval_fn, kround, active)
        state = state.replace(
            tree=tree,
            move_rounds=state.move_rounds + active.astype(jnp.int32),
        )
        return state, TickOut(
            done, state.move_count, win_z, own_z, order, ready
        )

    # ------------------------------------------------------------------
    def run_chunk(self, state: ActorState, dreplay, variables,
                  gamma=None):
        """The production continuous loop: ``chunk_ticks`` fused ticks under
        one jit — move phase, on-device game reset, and device-replay append
        of finished games all inside a lax.scan, so the host syncs once per
        chunk (three scalars) instead of once per search round. This is what
        makes continuous mode pay off through a high-latency device link.

        Returns (state, dreplay, stats) with stats = {games, moves,
        backlog} int32 scalars: ``games`` counts games at DRAIN time (they
        enter the ring and the pipeline counters in the same tick) and
        ``backlog`` is the number of boards still frozen awaiting a drain
        slot at chunk end. Finished games beyond a tick's append budget
        are never dropped: their boards freeze (no move, no search,
        trajectory intact — see ActorState.await_drain) until a later
        tick drains them. Synchronized finishes are the norm, not a tail
        case: the entire first generation hits max_step on the same tick."""
        from transgo_tpu.runtime.device_replay import append_chunk

        b = self.batch
        bar = jnp.arange(b)
        eval_fn = self._eval_fn(variables, gamma)
        d = self.append_budget
        # boundary cadence: one boundary phase per k search rounds (the
        # boundary costs ~8x a round at the production shape — see
        # Config.selfplay_boundary_every). k=1 reproduces the original
        # one-boundary-per-round chunk exactly.
        k = self.boundary_every
        groups = max(1, self.chunk_ticks // k)

        def group(carry, _):
            state, dreplay, games, moves = carry
            key, kround, ksample, knoise, kgames = jax.random.split(
                state.rng, 5
            )
            state = state.replace(rng=key)

            state, ready, done, need_expand = self._move_phase(
                state, ksample
            )
            # pending = just finished this boundary + frozen from earlier;
            # the first d (stable order) drain now, the rest freeze
            pending = done | state.await_drain
            ranks = jnp.cumsum(pending.astype(jnp.int32)) - 1
            drained = pending & (ranks < d)

            def on_done(op):
                state, dreplay = op
                win_z, own_z = self._label_done(state, pending)
                # compact pending boards to the front, take the first d
                order = jnp.argsort(~pending)[:d]
                t_idx = jnp.arange(self.max_moves)[None, :]
                valid = pending[order][:, None] & (
                    t_idx < state.move_count[order][:, None]
                )
                dreplay = append_chunk(
                    dreplay,
                    state.traj_obs[order],
                    state.traj_pi[order],
                    win_z[order],
                    own_z[order],
                    valid,
                )
                # fresh games on the drained boards, searched immediately
                state = state.replace(
                    tree=self._fresh_roots(state.tree, drained, kgames),
                    move_count=jnp.where(drained, 0, state.move_count),
                )
                return state, dreplay

            state, dreplay = jax.lax.cond(
                jnp.any(pending), on_done, lambda op: op, (state, dreplay)
            )
            state = state.replace(await_drain=pending & ~drained)
            # one batched root eval for advance sites + reset sites; with
            # tree reuse most boundaries promote already-expanded subtrees,
            # so the whole eval skips under the batch-any cond
            need = need_expand | drained
            state = state.replace(
                tree=jax.lax.cond(
                    jnp.any(need),
                    lambda t: self.mcts._expand_roots(t, eval_fn, need),
                    lambda t: t,
                    state.tree,
                )
            )
            # drained boards start a fresh move (noise + visit target on the
            # new root); still-frozen boards get target 0 (idle)
            state = self._finish_move_setup(
                state, ready | drained, pending & ~drained, knoise
            )

            def round_body(st, i):
                tree = st.tree
                active = (
                    tree.stats[bar, tree.root, VISIT] < st.visit_target
                )
                tree = self.mcts.run_round(
                    tree, eval_fn, jax.random.fold_in(kround, i), active
                )
                return st.replace(
                    tree=tree,
                    move_rounds=st.move_rounds + active.astype(jnp.int32),
                ), None

            state, _ = jax.lax.scan(round_body, state, jnp.arange(k))

            return (
                state,
                dreplay,
                games + jnp.sum(drained.astype(jnp.int32)),
                moves + jnp.sum(ready.astype(jnp.int32)),
            ), None

        zero = jnp.int32(0)
        (state, dreplay, games, moves), _ = jax.lax.scan(
            group, (state, dreplay, zero, zero), None,
            length=groups,
        )
        return state, dreplay, {
            "games": games, "moves": moves,
            "backlog": jnp.sum(state.await_drain.astype(jnp.int32)),
            # cumulative depth-cap sit-outs (see Tree.depth_capped); the
            # pipeline diffs successive values for a per-chunk rate
            "depth_capped": jnp.sum(state.tree.depth_capped),
        }

    # ------------------------------------------------------------------
    def drain_chunk(self, state: ActorState, out: TickOut,
                    offset) -> DrainChunk:
        """Gather ``drain_size`` finished games' labeled trajectories,
        starting at rank ``offset`` in the finished-first ordering."""
        idx = jax.lax.dynamic_slice_in_dim(out.order, offset, self.drain_size)
        return DrainChunk(
            obs=state.traj_obs[idx],
            pi=state.traj_pi[idx],
            win_z=out.win_z[idx],
            own_z=out.own_z[idx],
            length=out.length[idx],
        )

    # ------------------------------------------------------------------
    def _fresh_roots(self, tree, done: jnp.ndarray, kgames):
        """Replace done boards' trees with a fresh single-root tree holding
        a new game (no root evaluation — caller batches the expand)."""
        b = done.shape[0]
        fresh = self.mcts.new_tree(b)
        fresh_states = self._init_games(b, kgames)

        def pick(new, old):
            d = done.reshape(done.shape + (1,) * (old.ndim - done.ndim))
            return jnp.where(d, new, old)

        depth_capped = tree.depth_capped  # telemetry survives game resets
        tree = jax.tree_util.tree_map(pick, fresh, tree)
        # done boards: allocate slot 0 as root holding a fresh board
        tree = tree.replace(
            node_count=jnp.where(done, 1, tree.node_count),
            root=jnp.where(done, 0, tree.root),
            depth_capped=depth_capped,
        )
        def wr(dst, src):
            # static slot-0 write (dynamic-update-slice, fuses cleanly)
            B = done.reshape(done.shape + (1,) * (src.ndim - done.ndim))
            return dst.at[:, 0].set(jnp.where(B, src, dst[:, 0]))

        return tree.replace(
            states=jax.tree_util.tree_map(
                lambda d, s: wr(d, s), tree.states, fresh_states
            )
        )

    def reset_done(self, state: ActorState, variables,
                   done: jnp.ndarray, gamma=None) -> ActorState:
        """Start fresh games on finished boards (reset_root per game,
        self_play.py:910)."""
        b = done.shape[0]
        bar = jnp.arange(b)
        key, kgames, knoise = jax.random.split(state.rng, 3)
        state = state.replace(rng=key)
        tree = self._fresh_roots(state.tree, done, kgames)
        tree = self.mcts._expand_roots(
            tree, self._eval_fn(variables, gamma), done
        )
        if self.continuous:
            tree = self.mcts.root_dirichlet(tree, knoise, mask=done)
        return state.replace(
            tree=tree,
            move_count=jnp.where(done, 0, state.move_count),
            visit_target=jnp.where(
                done,
                tree.stats[bar, tree.root, VISIT]
                + self.mcts.num_simulations,
                state.visit_target,
            ),
            move_rounds=jnp.where(done, 0, state.move_rounds),
        )
