"""Batched feature-plane extraction.

Re-implements the reference encoders (board_feature.cc:17-253 ``encode9/10/13``)
and eye/life analysis (board.cc:665-817) as whole-board tensor ops:

plane layout for ``encode10`` (board_feature.cc:213-223):
  0-2  own groups with 1 / 2 / >=3 liberties
  3-5  opponent groups with 1 / 2 / >=3 liberties
  6    last move (one-hot; zero plane after a pass)
  7    illegal: own suicide points + active simple-ko point
  8    own true eyes
  9    own living groups (two-true-eye heuristic, GivenBlockLives)

Output is NHWC ``[B, H, W, C]`` — the TPU-native layout (channels on the
128-lane minor dimension) — with an NCHW converter for parity tests against
the reference's ``[C, H, W]`` (environment.py:105-108).

The reference's known ``getStones`` assignment-as-comparison bug
(board_feature.cc:48) is *not* replicated; the function is unused by every
shipped encoder (SURVEY.md do-not-replicate list).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from transgo_tpu.ops.engine import BoardAnalysis, GoEngine
from transgo_tpu.ops.groups import (
    _OPP,
    _pad1,
    propagate_group_values,
    segment_sum_by_label,
    stone_links,
)
from transgo_tpu.ops.state import (
    BLACK,
    EMPTY,
    WALL,
    WHITE,
    BoardSpec,
    GoState,
    opponent,
)


def true_eye_mask(spec: BoardSpec, stones: jnp.ndarray, color: int) -> jnp.ndarray:
    """bool[B, n]: true eyes of ``color`` (isTrueEye, board.cc:711-714).

    eye      = empty & every on-board neighbor is ``color`` (board.cc:665-682;
               walls count as own)
    fake eye = edge/corner eye with >=1 enemy diagonal, or center eye with
               >=2 enemy diagonals (board.cc:685-708)
    """
    col_pad = _pad1(stones, WALL)
    nbr_col = col_pad[:, spec.NBR]                      # [B, n, 4]
    is_empty = stones == EMPTY

    eye = is_empty & jnp.all(
        (nbr_col == color) | (nbr_col == WALL), axis=2
    )

    diag_col = col_pad[:, spec.DIAG]                    # [B, n, 4]
    opp = opponent(color)
    num_opp = jnp.sum(diag_col == opp, axis=2)
    num_boundary = jnp.sum(~spec.DIAG_OK, axis=1)[None, :]  # static per point
    fake = ((num_boundary > 0) & (num_opp >= 1)) | (
        (num_boundary == 0) & (num_opp >= 2)
    )
    return eye & ~fake


def live_stone_mask(
    spec: BoardSpec,
    stones: jnp.ndarray,
    analysis: BoardAnalysis,
    color: int,
) -> jnp.ndarray:
    """bool[B, n]: stones of ``color`` whose group is alive
    (GivenBlockLives, board.cc:731-817).

    A group lives iff it has >=2 liberties and >=2 *qualified* candidate
    eyes, where a candidate eye is a true eye of the group's color adjacent
    to the group, and it qualifies when every on-board diagonal is either an
    own-colored stone or another candidate eye of the same group — except
    that a center eye may concede one diagonal (board.cc:808-809).

    Label-based formulation (no [B, n, n] tensors): every true eye ``e``
    carries up to 4 *slots*, one per adjacent own group (deduplicated by
    group label), each slot is qualified independently, and the per-group
    qualified-eye count folds through one one-hot MXU segment sum over the
    4n slots. Peak intermediate is O(B n) — the same label machinery the
    engine's group analysis runs on (ops/groups.py).
    """
    n = spec.num_points
    b = stones.shape[0]
    g = analysis.groups
    te = true_eye_mask(spec, stones, color)             # [B, n]
    own = stones == color

    lbl_pad = _pad1(g.labels, jnp.int32(-1))
    own_pad = _pad1(own, False)
    te_pad = _pad1(te, False)

    # slot s of eye e: the own group adjacent through direction s
    nbr_lbl = lbl_pad[:, spec.NBR]                      # [B, e, 4]
    nbr_own = own_pad[:, spec.NBR]
    slot_ok = te[:, :, None] & nbr_own
    slot_lbl = jnp.where(slot_ok, nbr_lbl, -1)          # [B, e, 4]
    # dedup: a group seen through several directions is one candidate
    d1 = slot_lbl[:, :, 1] == slot_lbl[:, :, 0]
    d2 = (slot_lbl[:, :, 2] == slot_lbl[:, :, 0]) | (
        slot_lbl[:, :, 2] == slot_lbl[:, :, 1]
    )
    d3 = (
        (slot_lbl[:, :, 3] == slot_lbl[:, :, 0])
        | (slot_lbl[:, :, 3] == slot_lbl[:, :, 1])
        | (slot_lbl[:, :, 3] == slot_lbl[:, :, 2])
    )
    dup = jnp.stack([jnp.zeros_like(d1), d1, d2, d3], axis=2)
    slot_ok = slot_ok & ~dup

    # qualify slot (e, s): every on-board diagonal f of e must be an own
    # stone or itself a candidate eye of the same group (a center eye may
    # concede one diagonal, board.cc:808-809). "f is a candidate eye of
    # group r" = true_eye[f] & some neighbor of f carries label r.
    nbr_tbl = jnp.concatenate(
        [spec.NBR, jnp.full((1, 4), n, spec.NBR.dtype)], axis=0
    )
    diag_nbr = nbr_tbl[spec.DIAG]                       # [e, 4(dd), 4] static
    diag_nbr_lbl = lbl_pad[:, diag_nbr]                 # [B, e, dd, 4]
    diag_own = own_pad[:, spec.DIAG]                    # [B, e, 4]
    diag_te = te_pad[:, spec.DIAG]                      # [B, e, 4]
    adj_r = jnp.any(
        diag_nbr_lbl[:, :, None, :, :] == slot_lbl[:, :, :, None, None],
        axis=4,
    )                                                   # [B, e, s, dd]
    f_cand = diag_te[:, :, None, :] & adj_r
    territory = (
        diag_own[:, :, None, :] | f_cand
    ) & spec.DIAG_OK[None, :, None, :]
    num_terr = jnp.sum(territory, axis=3)               # [B, e, s]
    num_boundary = jnp.sum(~spec.DIAG_OK, axis=1)[None, :, None]
    qualified = (
        ((num_boundary >= 1) & (num_boundary + num_terr == 4))
        | ((num_boundary == 0) & (num_terr >= 3))
    ) & slot_ok                                          # [B, e, s]

    # credit each qualified (e, s) slot to the member stone it came
    # through (j = NBR[e, s], the same first-direction pattern as the
    # liberty credits in ops/groups.group_stats), fold per group with one
    # one-hot matmul, and read back by max-propagation — gather-free
    qual_pad = jnp.concatenate(
        [qualified, jnp.zeros((b, 1, 4), bool)], axis=1
    )                                                    # [B, n+1, 4]
    credits = [qual_pad[:, spec.NBR[:, d], _OPP[d]] for d in range(4)]
    q = sum(c.astype(jnp.int32) for c in credits)
    q = jnp.where(own, q, 0)
    agg = segment_sum_by_label(g.labels, q[..., None], n)  # [B, root, 1]
    iota = jnp.arange(n, dtype=jnp.int32)[None]
    is_root = g.labels == iota
    root_rows = jnp.where(is_root[..., None], agg.astype(jnp.int32), 0)
    links = stone_links(spec, stones)
    qual_of_stone = propagate_group_values(spec, links, root_rows)[..., 0]
    return own & (g.stone_libs >= 2) & (qual_of_stone >= 2)


class FeatureEncoder:
    """encode9/10/13 (board_feature.cc:199-253) for a fixed engine/spec."""

    def __init__(self, engine: GoEngine, planes: int = 10):
        assert planes in (9, 10, 13), planes
        self.engine = engine
        self.spec = engine.spec
        self.planes = planes
        self.obs_size = engine.spec.size  # spatial side of the observation

    def __call__(
        self, state: GoState, analysis: Optional[BoardAnalysis] = None
    ) -> jnp.ndarray:
        """float32[B, H, W, planes] (NHWC)."""
        eng, spec = self.engine, self.spec
        n = spec.num_points
        if analysis is None:
            analysis = eng.analyze(state)
        g = analysis.groups
        stones = state.stones
        player = state.next_player
        opp = opponent(player)

        own = stones == player[:, None]
        other = stones == opp[:, None]
        libs = g.stone_libs

        planes = [
            own & (libs == 1),
            own & (libs == 2),
            own & (libs >= 3),
            other & (libs == 1),
            other & (libs == 2),
            other & (libs >= 3),
        ]

        coords = jnp.arange(n, dtype=jnp.int32)[None, :]
        last1 = (state.last_move1[:, None] == coords) & (
            state.last_move1[:, None] >= 0
        )

        # ko + suicide plane (getSimpleKoAndSuicide, board_feature.cc:69-89)
        ko_active = (state.ko_age[:, None] == 0) & (
            state.ko_location[:, None] == coords
        )
        ko_suicide = analysis.suicide | ko_active

        te_b = true_eye_mask(spec, stones, BLACK)
        te_w = true_eye_mask(spec, stones, WHITE)
        own_te = jnp.where(player[:, None] == BLACK, te_b, te_w)

        if self.planes == 9:
            planes += [last1, ko_suicide, own_te]
        elif self.planes == 10:
            live_b = live_stone_mask(spec, stones, analysis, BLACK)
            live_w = live_stone_mask(spec, stones, analysis, WHITE)
            own_live = jnp.where(player[:, None] == BLACK, live_b, live_w)
            planes += [last1, ko_suicide, own_te, own_live]
        else:  # 13 (board_feature.cc:238-253)
            last2 = (state.last_move2[:, None] == coords) & (
                state.last_move2[:, None] >= 0
            )
            opp_te = jnp.where(player[:, None] == BLACK, te_w, te_b)
            live_b = live_stone_mask(spec, stones, analysis, BLACK)
            live_w = live_stone_mask(spec, stones, analysis, WHITE)
            own_live = jnp.where(player[:, None] == BLACK, live_b, live_w)
            opp_live = jnp.where(player[:, None] == BLACK, live_w, live_b)
            planes += [last1, last2, ko_suicide, own_te, opp_te, own_live, opp_live]

        feats = jnp.stack(planes, axis=-1).astype(jnp.float32)  # [B, n, C]
        size = spec.size
        return feats.reshape(feats.shape[0], size, size, self.planes)


# ---------------------------------------------------------------------------
# Standalone per-plane extractors that no shipped encoder consumes — kept for
# component parity with board_feature.cc (getStones/getSimpleKo/getHistory*).
# ``last_placed`` (board.h:13) is maintained *outside* GoState by
# ``update_last_placed`` so the engine hot path carries no dead freight.


def stones_map(stones: jnp.ndarray, color) -> jnp.ndarray:
    """float32[B, n]: stones of ``color`` (getStones, board_feature.cc:44-53;
    the reference's ``=``-for-``==`` bug is fixed, not replicated)."""
    return (stones == color).astype(jnp.float32)


def simple_ko_map(spec: BoardSpec, state: GoState) -> jnp.ndarray:
    """float32[B, n]: the active simple-ko point, if any
    (getSimpleKo, board_feature.cc:56-66)."""
    coords = jnp.arange(spec.num_points, dtype=jnp.int32)[None, :]
    active = (state.ko_age[:, None] == 0) & (
        state.ko_location[:, None] == coords
    )
    return active.astype(jnp.float32)


def history_map1(spec: BoardSpec, state: GoState) -> jnp.ndarray:
    """float32[B, n]: one-hot last move (getHistoryMap1,
    board_feature.cc:92-101; zero plane after a pass/resign)."""
    coords = jnp.arange(spec.num_points, dtype=jnp.int32)[None, :]
    hit = (state.last_move1[:, None] == coords) & (
        state.last_move1[:, None] >= 0
    )
    return hit.astype(jnp.float32)


def history_map2(spec: BoardSpec, state: GoState) -> jnp.ndarray:
    """float32[B, n]: one-hot second-to-last move (getHistoryMap2,
    board_feature.cc:103-112)."""
    coords = jnp.arange(spec.num_points, dtype=jnp.int32)[None, :]
    hit = (state.last_move2[:, None] == coords) & (
        state.last_move2[:, None] >= 0
    )
    return hit.astype(jnp.float32)


def init_last_placed(batch: int, spec: BoardSpec) -> jnp.ndarray:
    """int16[B, n] zeros — clearBoard's memset of Info (board.cc:13-26)."""
    return jnp.zeros((batch, spec.num_points), jnp.int16)


def update_last_placed(
    spec: BoardSpec,
    last_placed: jnp.ndarray,
    prev_state: GoState,
    new_state: GoState,
) -> jnp.ndarray:
    """Advance the placement-step map across one ``engine.step``.

    Mirrors ``infos[c].last_placed = step_count`` at stone placement
    (board.cc:311,641 — written *before* step_count increments). Captured
    points keep their stale value, exactly like the reference (capture clears
    only color/id, board.cc:217-239); the color filter in
    :func:`history_map`/:func:`history_exp` hides them.
    """
    n = spec.num_points
    b = last_placed.shape[0]
    c = new_state.last_move1.astype(jnp.int32)
    # a stone went down this tick iff the step counter advanced and the
    # recorded move is an on-board coordinate (PASS/RESIGN are negative)
    placed = (c >= 0) & (new_state.step_count == prev_state.step_count + 1)
    scat = jnp.where(placed, c, n)  # off-board slots are dropped
    return last_placed.at[jnp.arange(b), scat].set(
        prev_state.step_count, mode="drop"
    )


def history_map(
    last_placed: jnp.ndarray, stones: jnp.ndarray, player
) -> jnp.ndarray:
    """float32[B, n]: placement step of ``player``'s stones — or of *every*
    point when ``player`` is EMPTY (getHistoryMap + PLAYER_OR_BOTH,
    board_feature.cc:14,114-125)."""
    sel = (stones == player) | (player == EMPTY)
    return jnp.where(sel, last_placed.astype(jnp.float32), 0.0)


def history_exp(
    last_placed: jnp.ndarray,
    stones: jnp.ndarray,
    step_count: jnp.ndarray,
    player,
) -> jnp.ndarray:
    """float32[B, n]: exp((placement - now) / 10) recency decay
    (getHistoryExp, board_feature.cc:128-139)."""
    sel = (stones == player) | (player == EMPTY)
    age = last_placed.astype(jnp.float32) - step_count.astype(jnp.float32)[:, None]
    return jnp.where(sel, jnp.exp(age / 10.0), 0.0)


def nhwc_to_nchw(x: jnp.ndarray) -> jnp.ndarray:
    """Convert to the reference's [B, C, H, W] layout (environment.py:106)."""
    return jnp.transpose(x, (0, 3, 1, 2))


def sub_encode(features_nhwc: jnp.ndarray, sub_size: int = 7,
               cut_num: int = 4) -> jnp.ndarray:
    """Cut [B, S, S, C] into overlapping quadrant crops [B, cut, sub, sub, C]
    (get_sub_encode, board.cc:1166-1270; cut order TL, TR, BL, BR[, center])."""
    s = features_nhwc.shape[1]
    iv = s - sub_size
    crops = [
        features_nhwc[:, :sub_size, :sub_size, :],
        features_nhwc[:, :sub_size, iv:, :],
        features_nhwc[:, iv:, :sub_size, :],
        features_nhwc[:, iv:, iv:, :],
    ]
    if cut_num == 5:
        t = iv // 2
        crops.append(features_nhwc[:, t:s - t, t:s - t, :])
    return jnp.stack(crops, axis=1)


def sub_to_global(sub_features: jnp.ndarray, board_size: int = 9,
                  local_board_size: int = 7) -> jnp.ndarray:
    """Stitch 4 per-quadrant [sub, sub] maps back to one [S, S] map, halving
    the overlap seams (WP_MCTS.sub_to_global_encode, self_play.py:832-854).

    Args:
      sub_features: [B, 4, sub*sub] or [B, 4, sub, sub].
    Returns:
      [B, S, S]
    """
    s, ls = board_size, local_board_size
    hi = (s + 1) // 2     # 5 for 9x9
    lo = (s - 1) // 2     # 4 for 9x9
    b = sub_features.shape[0]
    sub = sub_features.reshape(b, 4, ls, ls)

    out = jnp.zeros((b, s, s), sub.dtype)
    out = out.at[:, :hi, :hi].add(sub[:, 0, :hi, :hi])
    out = out.at[:, :hi, lo:].add(sub[:, 1, :hi, ls - hi:])
    out = out.at[:, lo:, :hi].add(sub[:, 2, ls - hi:, :hi])
    out = out.at[:, lo:, lo:].add(sub[:, 3, ls - hi:, ls - hi:])
    out = out.at[:, lo, :].mul(0.5)
    out = out.at[:, :, lo].mul(0.5)
    return out
