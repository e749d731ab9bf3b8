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
from transgo_tpu.search.tree import Tree, gather_nodes


@struct.dataclass
class ActorState:
    tree: Tree
    traj_obs: jnp.ndarray     # uint8 [B, T, H, W, C]
    traj_pi: jnp.ndarray      # float32 [B, T, A]
    traj_player: jnp.ndarray  # int8 [B, T]
    move_count: jnp.ndarray   # int32 [B]
    rng: jnp.ndarray          # PRNG key


class TickOut(NamedTuple):
    done: jnp.ndarray     # bool [B] games that just finished
    length: jnp.ndarray   # int32 [B] moves in the finished game
    win_z: jnp.ndarray    # float32 [B, T] per-move outcome labels
    own_z: jnp.ndarray    # float32 [B, T, n] per-move ownership labels
    order: jnp.ndarray    # int32 [B] board indices, finished games first


class DrainChunk(NamedTuple):
    obs: jnp.ndarray      # uint8 [D, T, H, W, C]
    pi: jnp.ndarray       # float32 [D, T, A]
    win_z: jnp.ndarray    # float32 [D, T]
    own_z: jnp.ndarray    # float32 [D, T, n]
    length: jnp.ndarray   # int32 [D]


class SelfPlayActor:
    def __init__(self, config, mcts: MCTS, network: TransGoNetwork,
                 drain_size: int = 8):
        self.config = config
        self.mcts = mcts
        self.network = network
        self.engine = mcts.engine
        self.batch = config.selfplay_batch
        self.max_moves = config.max_step
        self.drain_size = min(drain_size, self.batch)
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

    # ------------------------------------------------------------------
    def _eval_fn(self, variables):
        from transgo_tpu.search.evalfn import make_eval_fn

        return make_eval_fn(
            self.network, variables, komi=self.config.komi,
            own_blend=self.config.value_own_blend,
            tanh_norm=self.config.tanh_norm,
        )

    # ------------------------------------------------------------------
    def init_state(self, variables, key) -> ActorState:
        b = self.batch
        t = self.max_moves
        key, kgames = jax.random.split(key)
        tree = self.mcts.new_tree(b)
        tree = self.mcts.reset_root(
            tree, self._eval_fn(variables), self._init_games(b, kgames)
        )
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
        )

    # ------------------------------------------------------------------
    def play_move(self, state: ActorState,
                  variables) -> Tuple[ActorState, TickOut]:
        """One move for every game (the body of continuous_self_play's inner
        loop, self_play.py:915-928). Pure — jit at the call site.

        The batch size is derived from the arrays (not config) so the same
        method body works on per-shard slices under shard_map."""
        b = state.move_count.shape[0]
        bar = jnp.arange(b)
        eval_fn = self._eval_fn(variables)
        key, kmove = jax.random.split(state.rng)

        root_states = gather_nodes(state.tree, state.tree.root)
        res = self.mcts.get_action_probs(state.tree, eval_fn, kmove)

        mc = jnp.clip(state.move_count, 0, self.max_moves - 1)
        traj_obs = state.traj_obs.at[bar, mc].set(
            res.observation.astype(jnp.uint8)
        )
        traj_pi = state.traj_pi.at[bar, mc].set(res.action_probs)
        traj_player = state.traj_player.at[bar, mc].set(
            root_states.next_player
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

        new_state = ActorState(
            tree=tree,
            traj_obs=traj_obs,
            traj_pi=traj_pi,
            traj_player=traj_player,
            move_count=move_count,
            rng=key,
        )
        return new_state, TickOut(done, move_count, win_z, own_z, order)

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
    def reset_done(self, state: ActorState, variables,
                   done: jnp.ndarray) -> ActorState:
        """Start fresh games on finished boards (reset_root per game,
        self_play.py:910)."""
        b = done.shape[0]
        key, kgames = jax.random.split(state.rng)
        state = state.replace(rng=key)
        fresh = self.mcts.new_tree(b)
        fresh_states = self._init_games(b, kgames)

        def pick(new, old):
            d = done.reshape(done.shape + (1,) * (old.ndim - done.ndim))
            return jnp.where(d, new, old)

        tree = jax.tree_util.tree_map(pick, fresh, state.tree)
        # done boards: allocate slot 0 as root holding a fresh board
        tree = tree.replace(
            node_count=jnp.where(done, 1, tree.node_count),
            root=jnp.where(done, 0, tree.root),
        )
        bar = jnp.arange(b)
        root0 = jnp.zeros((b,), jnp.int32)

        def wr(dst, src):
            cur = dst[bar, root0]
            B = done.reshape(done.shape + (1,) * (src.ndim - done.ndim))
            return dst.at[bar, root0].set(jnp.where(B, src, cur))

        tree = tree.replace(
            states=jax.tree_util.tree_map(
                lambda d, s: wr(d, s), tree.states, fresh_states
            )
        )
        tree = self.mcts._expand_roots(
            tree, self._eval_fn(variables), done
        )
        return state.replace(
            tree=tree,
            move_count=jnp.where(done, 0, state.move_count),
        )
