"""Live-window engine adapter: a 7x7 action space over a real 9x9 board.

Implements the scale_train_live environment semantics
(scale_train_live/GoEnv/environment.py:100-205) on top of the batched
engine:

- actions are LOCAL: 0..48 map to the top-left 7x7 window of the 9x9 board
  (local row*7+col -> global row*9+col, act_to_local_act/local_act_to_act,
  environment.py:124-205), 49 is pass;
- legality = global legality restricted to the window, pass only when no
  window move exists (getLocalAction, environment.py:128-141);
- observations are the 10-plane encoding cropped to the window
  (localEncode, environment.py:100-107);
- game start seeds randint(4, 11) stones on the boundary ring just outside
  the window (row==7 or col==7 with the other coordinate <= 7), drawn from
  legal points (get_random_init_action, environment.py:146-158 +
  reset_root, self_play.py:206-216).

The adapter satisfies the engine interface the search consumes (init /
analyze / legal_action_mask / step / winner / score_and_territory plus a
``spec`` with local ``num_actions`` but global state ``size``), so the same
batched MCTS runs unchanged in local action space.
"""

from __future__ import annotations

from types import SimpleNamespace

import jax
import jax.numpy as jnp
import numpy as np

from transgo_tpu.ops.engine import BoardAnalysis, GoEngine
from transgo_tpu.ops.features import FeatureEncoder
from transgo_tpu.ops.state import GoState


class LiveWindowEngine:
    def __init__(self, config):
        self.base = GoEngine(config.board_size, config.komi, config.max_step)
        self.config = config
        s, ls = config.board_size, config.local_board_size
        self.size = s
        self.local = ls
        # spec facade: edges in local action space, states on the full board
        self.spec = SimpleNamespace(
            size=s,                       # node-state storage size
            num_points=s * s,
            num_actions=ls * ls + 1,      # LOCAL actions
            pass_action=ls * ls,
        )
        # static local<->global coordinate tables
        loc = np.arange(ls * ls)
        self._local_to_global = jnp.asarray(
            (loc // ls) * s + (loc % ls), jnp.int32
        )
        grid = np.arange(s * s)
        rows, cols = grid // s, grid % s
        self._window_mask = jnp.asarray((rows < ls) & (cols < ls))
        # boundary ring: (row==ls and col<=ls) or (col==ls and row<=ls)
        self._ring_mask = jnp.asarray(
            ((rows == ls) & (cols <= ls)) | ((cols == ls) & (rows <= ls))
        )
        self._global_window_idx = jnp.asarray(
            np.nonzero(np.asarray((rows < ls) & (cols < ls)))[0], jnp.int32
        )
        self._encoder = FeatureEncoder(self.base, config.encode_state_channels)

    # ---- engine interface -------------------------------------------
    def init(self, batch: int) -> GoState:
        return self.base.init(batch)

    def init_random(self, batch: int, key) -> GoState:
        """Fresh boards with randint(4, 11) alternating stones seeded on
        the boundary ring (reset_root, scale_train_live/self_play.py:206-216:
        num = randint(local-3, local+4) inclusive)."""
        state = self.base.init(batch)
        kcount, kseed = jax.random.split(key)
        counts = jax.random.randint(
            kcount, (batch,), self.local - 3, self.local + 5
        )

        def body(i, carry):
            state, key = carry
            key, k = jax.random.split(key)
            analysis = self.base.analyze(state)
            ring_legal = analysis.legal_board & self._ring_mask[None, :]
            logits = jnp.where(ring_legal, 0.0, -jnp.inf)
            action = jax.random.categorical(k, logits, axis=1).astype(jnp.int32)
            new_state, _ = self.base.step(state, action, analysis)
            take = (i < counts) & jnp.any(ring_legal, axis=1)

            def pick(n, o):
                t = take.reshape(take.shape + (1,) * (o.ndim - 1))
                return jnp.where(t, n, o)

            return jax.tree_util.tree_map(pick, new_state, state), key

        state, _ = jax.lax.fori_loop(
            0, self.local + 4, body, (state, kseed)
        )
        return state

    def analyze(self, state: GoState, player=None) -> BoardAnalysis:
        return self.base.analyze(state, player)

    def legal_action_mask(self, state: GoState, analysis=None) -> jnp.ndarray:
        """bool[B, local_n+1] in LOCAL action space; pass iff no window
        move (getLocalAction, environment.py:128-141)."""
        if analysis is None:
            analysis = self.base.analyze(state)
        local_board = analysis.legal_board[:, self._global_window_idx]
        any_local = jnp.any(local_board, axis=1)
        return jnp.concatenate([local_board, ~any_local[:, None]], axis=1)

    def _to_global_action(self, local_action):
        n_local = self.local * self.local
        la = jnp.clip(local_action, 0, n_local)
        is_pass = (local_action == n_local) | (local_action < 0)
        g = self._local_to_global[jnp.clip(la, 0, n_local - 1)]
        action = jnp.where(
            is_pass, self.base.spec.num_points, g
        ).astype(jnp.int32)
        # preserve resign passthrough
        return jnp.where(local_action == -2, -2, action)

    def step(self, state: GoState, local_action, analysis=None):
        return self.base.step(state, self._to_global_action(local_action),
                              analysis)

    def step_trusted(self, state: GoState, local_action, stone_libs,
                     stone_size, labels):
        return self.base.step_trusted(
            state, self._to_global_action(local_action), stone_libs,
            stone_size, labels,
        )

    def winner(self, state: GoState):
        return self.base.winner(state)

    def score(self, state: GoState):
        return self.base.score(state)

    def score_and_territory(self, state: GoState):
        """Window-cropped signed territory (getScoreAndTerritory in the live
        env returns the local crop; labels are local,
        scale_train_live/self_play.py:270-274)."""
        score, terr = self.base.score_and_territory(state)
        b = terr.shape[0]
        local = terr.reshape(b, self.size, self.size)[
            :, : self.local, : self.local
        ]
        return score, local.reshape(b, self.local * self.local)

    def auto_reset(self, state: GoState):
        return self.base.auto_reset(state)

    # ---- local observation ------------------------------------------
    def encode_local(self, state: GoState, analysis=None) -> jnp.ndarray:
        """[B, local, local, C] window crop (localEncode)."""
        feats = self._encoder(state, analysis)
        return feats[:, : self.local, : self.local, :]


class LiveWindowEncoder:
    """FeatureEncoder-compatible callable producing window crops."""

    def __init__(self, engine: LiveWindowEngine):
        self.engine = engine
        self.obs_size = engine.local

    def __call__(self, state: GoState, analysis=None) -> jnp.ndarray:
        return self.engine.encode_local(state, analysis)
