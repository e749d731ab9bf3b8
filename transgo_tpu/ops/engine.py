"""The batched Go rules engine: legality, stepping, capture, ko, scoring.

TPU-native re-design of the reference play engine and env facade:

- legality     = FindAllValidMoves (board.cc:467-489) for the whole board at
                 once: one legal mask per board instead of 81 TryPlay calls;
- step         = Step_/Play (go_env.cc:51-80, board.cc:546-653): place the
                 stone, relabel, remove zero-liberty enemy groups — no
                 incremental block surgery;
- simple ko    = isGivingSimpleKo/isSimpleKoViolation (board.cc:163-213) with
                 the reference's exact age semantics (a pass does NOT age the
                 ko: Play returns before touching ko fields on special moves,
                 board.cc:554-558);
- scoring      = Tromp-Taylor by empty-region labeling instead of per-region
                 BFS (getTTScore, board.cc:822-958);
- termination  = two consecutive passes, resign, or step_count > max_step
                 (board.cc:656-661, go_env.cc:67).

All functions take and return batched arrays ([B, ...]); the whole engine is
jit-compatible with static shapes only.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from transgo_tpu.ops.groups import (
    GroupStats,
    _pad1,
    group_stats,
)
from transgo_tpu.ops.state import (
    BLACK,
    EMPTY,
    PASS,
    RESIGN,
    WALL,
    WHITE,
    BoardSpec,
    GoState,
    board_spec,
    opponent,
)

DAME = 3  # neutral point ownership (board.h:130)


class BoardAnalysis(NamedTuple):
    """Everything derivable from the stone grid that rules/features need."""

    groups: GroupStats
    self_lib: jnp.ndarray      # int32[B, n] empty neighbors of each point
    suicide: jnp.ndarray       # bool[B, n] playing here is suicide for *next_player*
    legal_board: jnp.ndarray   # bool[B, n] legal board moves for next_player


class GoEngine:
    """Stateless rules engine bound to a static board size / komi / max_step.

    One instance replaces both the C++ ``go_env.so`` and the ctypes ``GoEnv``
    wrapper (/root/reference/GoEnv/environment.py:32-199). Methods are pure
    and batched; wrap them in ``jax.jit`` at the call site.
    """

    def __init__(self, size: int = 9, komi: float = 7.5, max_step: int = 120):
        self.spec: BoardSpec = board_spec(size)
        self.size = size
        self.komi = komi
        self.max_step = max_step

    # ------------------------------------------------------------------
    def init(self, batch_size: int) -> GoState:
        """Fresh empty boards (Reset, go_env.cc:34-41)."""
        return GoState.new(batch_size, self.size)

    # ------------------------------------------------------------------
    def analyze(self, state: GoState,
                player: Optional[jnp.ndarray] = None) -> BoardAnalysis:
        """Group stats + legality for ``player`` (default: next_player)."""
        spec = self.spec
        n = spec.num_points
        stones = state.stones
        if player is None:
            player = state.next_player
        player = player.astype(jnp.int8)
        opp = opponent(player)

        g = group_stats(spec, stones)
        col_pad = _pad1(stones, WALL)
        nbr_col = col_pad[:, spec.NBR]                       # [B, n, 4]
        libs_pad = _pad1(g.stone_libs, jnp.int32(0))
        nbr_libs = libs_pad[:, spec.NBR]                      # [B, n, 4]

        is_empty = stones == EMPTY
        self_lib = jnp.sum(nbr_col == EMPTY, axis=2).astype(jnp.int32)

        # isSuicideMove (board.cc:130-158): no own liberty, no own neighbor
        # group with >1 libs, no enemy neighbor group in atari
        own_gt1 = jnp.any(
            (nbr_col == player[:, None, None]) & (nbr_libs > 1), axis=2
        )
        enemy_eq1 = jnp.any(
            (nbr_col == opp[:, None, None]) & (nbr_libs == 1), axis=2
        )
        suicide = is_empty & (self_lib == 0) & ~own_gt1 & ~enemy_eq1

        # isSimpleKoViolation (board.cc:198-200)
        coords = jnp.arange(n, dtype=jnp.int32)[None, :]
        ko_forbidden = (
            (state.ko_location[:, None] == coords)
            & (state.ko_age[:, None] == 0)
            & (state.ko_color[:, None] == player[:, None])
        )
        legal_board = is_empty & ~suicide & ~ko_forbidden
        return BoardAnalysis(g, self_lib, suicide, legal_board)

    # ------------------------------------------------------------------
    def legal_action_mask(
        self, state: GoState, analysis: Optional[BoardAnalysis] = None
    ) -> jnp.ndarray:
        """bool[B, n+1] search-action mask with the environment's
        pass-shaping rule: PASS is allowed only when it is the *only* legal
        move (GoEnv.getLegalAction, environment.py:121-129)."""
        if analysis is None:
            analysis = self.analyze(state)
        any_board = jnp.any(analysis.legal_board, axis=1)
        return jnp.concatenate(
            [analysis.legal_board, ~any_board[:, None]], axis=1
        )

    def legal_action_mask_full(
        self, state: GoState, analysis: Optional[BoardAnalysis] = None
    ) -> jnp.ndarray:
        """bool[B, n+1] with PASS always legal (C-level getLegalAction,
        go_env.cc:154-171 / checkAction semantics)."""
        if analysis is None:
            analysis = self.analyze(state)
        b = state.stones.shape[0]
        return jnp.concatenate(
            [analysis.legal_board, jnp.ones((b, 1), bool)], axis=1
        )

    # ------------------------------------------------------------------
    def step(
        self,
        state: GoState,
        action: jnp.ndarray,
        analysis: Optional[BoardAnalysis] = None,
    ) -> Tuple[GoState, jnp.ndarray]:
        """Apply one move per board (Step, go_env.cc:44-80).

        Args:
          action: int32[B]; ``0..n-1`` board points, ``n`` or ``PASS`` to
            pass, ``RESIGN`` to resign. An illegal action leaves that board
            unchanged (the reference prints and skips, go_env.cc:75-78), as
            does stepping a terminated board (go_env.cc:52-55).

        Returns:
          (new_state, done): done is the per-board terminated flag.
        """
        spec = self.spec
        n = spec.num_points
        b = state.stones.shape[0]
        barange = jnp.arange(b)
        player = state.next_player
        opp = opponent(player).astype(jnp.int8)

        action = action.astype(jnp.int32)
        c = jnp.where(action == n, PASS, action)
        is_pass = c == PASS
        is_resign = c == RESIGN
        special = is_pass | is_resign

        if analysis is None:
            analysis = self.analyze(state)
        g = analysis.groups

        cc = jnp.clip(c, 0, n - 1)
        in_range = (c >= 0) & (c < n)
        ok_play = in_range & analysis.legal_board[barange, cc]
        applied = (special | ok_play) & ~state.terminated
        return self._apply_move(
            state, c, applied, special,
            g.stone_libs.astype(jnp.int32), g.stone_size.astype(jnp.int32),
            g.labels.astype(jnp.int32),
        )

    def step_trusted(
        self,
        state: GoState,
        action: jnp.ndarray,
        stone_libs: jnp.ndarray,
        stone_size: jnp.ndarray,
        labels: jnp.ndarray,
    ) -> Tuple[GoState, jnp.ndarray]:
        """Apply pre-validated moves using cached per-stone group stats.

        The search only proposes actions from a node's stored legal mask, so
        re-deriving legality (a full board analysis) per step is wasted work;
        this variant trusts the caller and takes the pre-move position's
        per-stone liberties/sizes/group-ids (ko detection + capture
        resolution) as inputs, making the step entirely reachability-free.
        Still guards terminated boards and occupied points.
        """
        n = self.spec.num_points
        b = state.stones.shape[0]
        barange = jnp.arange(b)
        action = action.astype(jnp.int32)
        c = jnp.where(action == n, PASS, action)
        special = (c == PASS) | (c == RESIGN)
        cc = jnp.clip(c, 0, n - 1)
        in_range = (c >= 0) & (c < n)
        empty_at = state.stones[barange, cc] == EMPTY
        applied = (special | (in_range & empty_at)) & ~state.terminated
        return self._apply_move(
            state, c, applied, special,
            stone_libs.astype(jnp.int32), stone_size.astype(jnp.int32),
            labels.astype(jnp.int32),
        )

    def _apply_move(self, state, c, applied, special, stone_libs, stone_size,
                    labels):
        """Shared move executor (Play, board.cc:546-653)."""
        spec = self.spec
        n = spec.num_points
        b = state.stones.shape[0]
        barange = jnp.arange(b)
        player = state.next_player
        opp = opponent(player).astype(jnp.int8)
        cc = jnp.clip(c, 0, n - 1)

        # ---- pre-placement neighbor analysis at cc (ko detection,
        #      isGivingSimpleKo board.cc:163-194) ----
        nbr = spec.NBR[cc]                                   # [B, 4]
        col_pad = _pad1(state.stones, WALL)
        nbr_col = col_pad[barange[:, None], nbr]             # [B, 4]
        nbr_grp_libs = _pad1(stone_libs, jnp.int32(0))[barange[:, None], nbr]
        nbr_grp_size = _pad1(stone_size, jnp.int32(0))[barange[:, None], nbr]

        self_lib_c = jnp.sum(nbr_col == EMPTY, axis=1).astype(jnp.int32)
        own_adj = jnp.any(nbr_col == player[:, None], axis=1)
        ko_grp = (
            (nbr_col == opp[:, None])
            & (nbr_grp_libs == 1)
            & (nbr_grp_size == 1)
        )
        ko_cnt = jnp.sum(ko_grp, axis=1)
        # size-1 group ⇒ the neighbor coord *is* the group (its Block.start)
        ko_cand = jnp.max(jnp.where(ko_grp, nbr, -1), axis=1).astype(jnp.int16)
        giving_ko = (self_lib_c == 0) & ~own_adj & (ko_cnt == 1)

        # ---- play the stone and resolve captures ----
        # Capture without re-deriving connectivity (Play's KillOneBlock,
        # board.cc:242-264): an opponent group dies iff it is adjacent to cc
        # and had exactly one liberty pre-move — that liberty is necessarily
        # cc itself (cc was empty and adjacent to a member). Its stones are
        # exactly the points sharing its cached group id, so removal is one
        # [B, n, 4] compare instead of a full reachability pass.
        nbr_lbl = _pad1(labels, jnp.int32(-1))[barange[:, None], nbr]
        cap_nbr = (
            (nbr_col == opp[:, None]) & (nbr_grp_libs == 1)
        )                                                    # [B, 4]
        cap_ids = jnp.where(cap_nbr, nbr_lbl, jnp.int32(-9))
        captured = (state.stones == opp[:, None]) & jnp.any(
            labels[:, :, None] == cap_ids[:, None, :], axis=2
        )
        stones1 = state.stones.at[barange, cc].set(player)
        stones2 = jnp.where(captured, jnp.int8(EMPTY), stones1)

        play_ko_location = jnp.where(giving_ko, ko_cand, state.ko_location)
        play_ko_color = jnp.where(giving_ko, opp, state.ko_color)
        play_ko_age = jnp.where(
            giving_ko, jnp.int16(0), state.ko_age + jnp.int16(1)
        )

        # ---- merge play / special / rejected branches ----
        do_play = applied & ~special
        new_stones = jnp.where(do_play[:, None], stones2, state.stones)
        new_last2 = jnp.where(applied, state.last_move1, state.last_move2)
        new_last1 = jnp.where(applied, c.astype(jnp.int16), state.last_move1)
        new_step = state.step_count + applied.astype(jnp.int16)
        new_player = jnp.where(applied, opp, player).astype(jnp.int8)
        new_ko_location = jnp.where(
            do_play, play_ko_location, state.ko_location
        )
        new_ko_color = jnp.where(do_play, play_ko_color, state.ko_color)
        new_ko_age = jnp.where(do_play, play_ko_age, state.ko_age)

        # termination (board.cc:656-661 + go_env.cc:67 max-step cutoff)
        done_pass = (
            applied
            & (new_last1 == PASS)
            & (new_last2 == PASS)
            & (new_step > 1)
        )
        done_resign = applied & (new_last1 == RESIGN)
        done_maxstep = applied & (new_step > self.max_step)
        new_terminated = state.terminated | done_pass | done_resign | done_maxstep

        new_state = GoState(
            stones=new_stones,
            next_player=new_player,
            step_count=new_step,
            last_move1=new_last1,
            last_move2=new_last2,
            ko_location=new_ko_location,
            ko_color=new_ko_color,
            ko_age=new_ko_age,
            terminated=new_terminated,
        )
        return new_state, new_terminated

    # ------------------------------------------------------------------
    def auto_reset(self, state: GoState) -> GoState:
        """Replace terminated boards with fresh ones (self-play convenience;
        no reference equivalent — Ray actors re-called reset_root per game)."""
        fresh = GoState.new(state.stones.shape[0], self.size)
        done = state.terminated

        def pick(new, old):
            d = done.reshape(done.shape + (1,) * (old.ndim - done.ndim))
            return jnp.where(d, new, old)

        return jax.tree_util.tree_map(pick, fresh, state)

    # ------------------------------------------------------------------
    def territory(self, state: GoState) -> jnp.ndarray:
        """int8[B, n] point ownership: BLACK / WHITE / DAME
        (getTTScore territory output, board.cc:822-958)."""
        spec = self.spec
        stones = state.stones
        is_empty = stones == EMPTY

        # empty-region flood by min-label propagation, then ONE one-hot MXU
        # segment sum to see which stone colors each region touches — no
        # [B, n, n] tensor at any board size (the dense formulation burned
        # ~19 GB of HBM traffic per 4096-board analyze at 19x19)
        from transgo_tpu.ops.groups import (
            _DELTAS,
            _shift2d,
            propagate_group_values,
            propagate_min_labels,
            segment_sum_by_label,
        )

        n = spec.num_points
        b = stones.shape[0]
        h = w = spec.size
        sg = stones.reshape(b, h, w)
        is_empty_g = is_empty.reshape(b, h, w)
        # neighbor color planes as grid shifts (no gather HLO)
        nbr_col4 = [_shift2d(sg, dx, dy, WALL) for dx, dy in _DELTAS]
        linked = jnp.stack(
            [is_empty_g & (c == EMPTY) for c in nbr_col4], axis=-1
        ).reshape(b, n, 4)
        iota = jnp.arange(n, dtype=jnp.int32)[None, :]
        init = jnp.where(is_empty, iota, n)
        lbl = propagate_min_labels(spec, linked, init)    # [B, n]

        def _touch(color):
            t = nbr_col4[0] == color
            for c in nbr_col4[1:]:
                t = t | (c == color)
            return t.reshape(b, n)

        touch = jnp.stack(
            [_touch(BLACK), _touch(WHITE)], axis=-1
        ).astype(jnp.int32)                               # [B, n, 2]
        touch = jnp.where(is_empty[:, :, None], touch, 0)
        agg = segment_sum_by_label(lbl, touch, n)         # [B, root, 2]
        iota_r = jnp.arange(n, dtype=jnp.int32)[None]
        is_region_root = is_empty & (lbl == iota_r)
        root_rows = jnp.where(
            is_region_root[..., None], agg.astype(jnp.int32), 0
        )
        per = propagate_group_values(spec, linked, root_rows)
        rb = per[..., 0] > 0
        rw = per[..., 1] > 0

        empty_owner = jnp.where(
            rb & ~rw, BLACK, jnp.where(rw & ~rb, WHITE, DAME)
        ).astype(jnp.int8)
        return jnp.where(is_empty, empty_owner, stones)

    def raw_score(self, state: GoState) -> jnp.ndarray:
        """float32[B] Tromp-Taylor score before komi (getTTScore)."""
        terr = self.territory(state)
        return (
            jnp.sum(terr == BLACK, axis=1) - jnp.sum(terr == WHITE, axis=1)
        ).astype(jnp.float32)

    def score(self, state: GoState) -> jnp.ndarray:
        """float32[B] black-minus-white score including komi
        (getScore, go_env.cc:126-130)."""
        return self.raw_score(state) - self.komi

    def winner(self, state: GoState) -> jnp.ndarray:
        """int8[B]: BLACK if score > 0 else WHITE
        (GoEnv.getWinner, environment.py:118-119)."""
        return jnp.where(self.score(state) > 0, BLACK, WHITE).astype(jnp.int8)

    def fast_score(self, state: GoState) -> jnp.ndarray:
        """float32[B] heuristic score: stones + own true eyes, no region
        fill (getFastScore, board.cc:962-983; unofficial, reference-parity
        utility)."""
        from transgo_tpu.ops.features import true_eye_mask

        stones = state.stones
        te_b = true_eye_mask(self.spec, stones, BLACK)
        te_w = true_eye_mask(self.spec, stones, WHITE)
        black = jnp.sum(stones == BLACK, axis=1) + jnp.sum(te_b, axis=1)
        white = jnp.sum(stones == WHITE, axis=1) + jnp.sum(te_w, axis=1)
        return (black - white).astype(jnp.float32)

    def legal_no_eye_mask(
        self, state: GoState, analysis: Optional[BoardAnalysis] = None
    ) -> jnp.ndarray:
        """bool[B, n+1] candidate moves: legal, excluding the mover's own
        true eyes; PASS always included (FindAllCandidateMoves +
        getLegalNoEye, board.cc:492-517, go_env.cc:178-188)."""
        from transgo_tpu.ops.features import true_eye_mask

        if analysis is None:
            analysis = self.analyze(state)
        player = state.next_player
        te_b = true_eye_mask(self.spec, state.stones, BLACK)
        te_w = true_eye_mask(self.spec, state.stones, WHITE)
        own_eye = jnp.where(player[:, None] == BLACK, te_b, te_w)
        candidate = analysis.legal_board & ~own_eye
        b = state.stones.shape[0]
        return jnp.concatenate([candidate, jnp.ones((b, 1), bool)], axis=1)

    def score_and_territory(self, state: GoState):
        """(float32[B] score, float32[B, n] ownership in {1, 0, -1})
        (getTerritory, go_env.cc:136-149)."""
        terr = self.territory(state)
        signed = jnp.where(
            terr == BLACK, 1.0, jnp.where(terr == WHITE, -1.0, 0.0)
        ).astype(jnp.float32)
        score = (
            jnp.sum(terr == BLACK, axis=1) - jnp.sum(terr == WHITE, axis=1)
        ).astype(jnp.float32) - self.komi
        return score, signed
