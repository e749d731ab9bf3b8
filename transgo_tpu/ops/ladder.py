"""Batched ladder (shicho) reading.

Counterpart of the reference's ``checkLadder``/``checkLadderUseSearch``
(/root/reference/GoEnv/cpp_src/board.cc:987-1163). Two things to know about
the original:

1. **It is dead code** — never called from go_env.cc or any Python
   (SURVEY.md §2.1), and
2. **as written it cannot read a ladder**: on the victim's turn it computes
   the flee point as the first empty neighbor of ``last_move1`` — the
   *attacker's* newest stone (board.cc:1076-1085) — but in every ladder
   geometry the victim group's remaining liberty is diagonal to that stone,
   so the reader chases a freshly invented stone instead of the victim
   group (its own ``"Ladder Search is wrong!!"`` printf at board.cc:1088 is
   reachable on normal shapes).

Following the do-not-replicate policy for unused-buggy reference code
(SURVEY.md §7, like ``getStones``'s ``=``-for-``==``), this module keeps the
reference's *intent* — trigger conditions, search discipline, bounds — and
fixes the group tracking:

- trigger (``checkLadder``, board.cc:1120-1145): the candidate move has
  exactly two empty neighbors, exactly one adjacent own block and it is in
  atari, exactly one adjacent enemy block and it has >=3 liberties;
- attacker turn (board.cc:996-1068): victim group at 1 liberty -> captured
  (return the search depth), >=3 -> escaped, at 2 -> block the escape point
  that has three empty neighbors (the osae rule); if neither qualifies, try
  both liberties depth-first (rare), forcing the first after
  ``MAX_LADDER_SEARCH=1024`` total calls;
- victim turn (board.cc:1069-1115): flee at the group's last liberty — of
  the *victim group*, not the attacker stone — and the ladder is broken if
  any attacker group adjacent to the victim group is itself in atari (the
  counter-capture rule, board.cc:1096-1107);
- every position examined counts one "call" against the 1024 cap.

The whole search runs as one ``lax.while_loop`` over the batch with an
explicit K-deep backtracking stack per board (the reference's recursion),
so it jits and batches like every other engine op.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from transgo_tpu.ops.groups import _pad1, group_stats
from transgo_tpu.ops.state import EMPTY, GoState, WALL, opponent

MAX_LADDER_SEARCH = 1024  # board.cc:986
STACK_DEPTH = 8           # branch points are rare (board.cc:1051 comment)


class _LoopState(NamedTuple):
    cur: GoState
    anchor: jnp.ndarray        # int32[B] a coord inside the victim group
    victim: jnp.ndarray        # int8[B] fleeing color
    depth: jnp.ndarray         # int32[B]
    num_call: jnp.ndarray      # int32[B]
    result: jnp.ndarray        # int32[B] -1 undecided / 0 escape / >0 depth
    fail_pending: jnp.ndarray  # bool[B] current line failed; pop or finish
    sp: jnp.ndarray            # int32[B] stack pointer
    stk_state: GoState         # stacked [B, K, ...]
    stk_move: jnp.ndarray      # int32[B, K] pending alternative move
    stk_depth: jnp.ndarray     # int32[B, K]
    iters: jnp.ndarray         # int32 scalar safety bound


def _pin(state: GoState) -> GoState:
    """Neutralize counters so simulation plays never trip max-step/pass
    termination (the reference simulates on a raw Board copy with no env
    facade, board.cc:1152-1161)."""
    return state.replace(
        step_count=jnp.ones_like(state.step_count),
        terminated=jnp.zeros_like(state.terminated),
    )


class LadderReader:
    """Batched ladder reader bound to a :class:`GoEngine`."""

    def __init__(self, engine):
        self.engine = engine
        self.spec = engine.spec

    # ------------------------------------------------------------------
    def _group_liberty_info(self, stones, anchor, victim):
        """(member[B,n], lib_mask[B,n], nlibs[B], counter_atari[B]).

        member: the victim group's stones; lib_mask: its liberty points;
        counter_atari: some attacker group adjacent to the victim group has
        exactly one liberty (the ladder-breaking counter-capture,
        board.cc:1096-1107).
        """
        spec = self.spec
        b, n = stones.shape
        bar = jnp.arange(b)
        g = group_stats(spec, stones)
        anchor_lbl = g.labels[bar, anchor]                  # [B]
        member = (
            (g.labels == anchor_lbl[:, None])
            & (anchor_lbl >= 0)[:, None]
            & (stones == victim[:, None])
        )                                                   # [B, n]
        mm_dtype = jnp.bfloat16  # boolean operands: exact at any n (ops/groups)
        adj = (
            jnp.matmul(
                member.astype(mm_dtype)[:, None, :],
                spec.ADJ[None].astype(mm_dtype),
                preferred_element_type=jnp.float32,
            )[:, 0, :]
            > 0.5
        )                                                   # [B, n] touches group
        lib_mask = adj & (stones == EMPTY)
        nlibs = jnp.sum(lib_mask, axis=1).astype(jnp.int32)
        attacker = opponent(victim)
        counter = jnp.any(
            adj & (stones == attacker[:, None]) & (g.stone_libs == 1), axis=1
        )
        return member, lib_mask, nlibs, counter

    def _first_two(self, mask):
        """First and second set coord of ``mask`` [B, n] (coordinate order)."""
        e0 = jnp.argmax(mask, axis=1).astype(jnp.int32)
        b, n = mask.shape
        mask2 = mask & (jnp.arange(n)[None, :] != e0[:, None])
        e1 = jnp.argmax(mask2, axis=1).astype(jnp.int32)
        return e0, e1

    def _freedom(self, stones, coord):
        """Empty-neighbor count of ``coord`` (board.cc:1025-1036)."""
        spec = self.spec
        b = stones.shape[0]
        nbr = spec.NBR[coord]                               # [B, 4]
        col = _pad1(stones, WALL)[jnp.arange(b)[:, None], nbr]
        return jnp.sum(col == EMPTY, axis=1).astype(jnp.int32)

    # ------------------------------------------------------------------
    def check_ladder(self, state: GoState, action: jnp.ndarray) -> jnp.ndarray:
        """int32[B]: 0 if ``action`` does not trigger a working ladder for
        the side to move; otherwise the capture depth (>0), as
        ``checkLadder`` returns (board.cc:1120-1163).

        ``action`` is the victim's candidate flee move (board points only;
        PASS/occupied/illegal -> 0).
        """
        engine, spec = self.engine, self.spec
        n = spec.num_points
        b = state.stones.shape[0]
        bar = jnp.arange(b)
        victim = state.next_player
        attacker = opponent(victim).astype(jnp.int8)

        action = action.astype(jnp.int32)
        on_board = (action >= 0) & (action < n)
        cc = jnp.clip(action, 0, n - 1)

        # ---- trigger: BlockId4 analysis of the pre-play position
        #      (checkLadder, board.cc:1120-1145) ----
        g = group_stats(spec, state.stones)
        nbr = spec.NBR[cc]                                  # [B, 4]
        col = _pad1(state.stones, WALL)[bar[:, None], nbr]
        nlib = _pad1(g.stone_libs, jnp.int32(0))[bar[:, None], nbr]
        self_lib = jnp.sum(col == EMPTY, axis=1)

        # distinct-block dedup via group labels: same[i, j] iff neighbor i
        # and neighbor j sit in one group (both stones => labels >= 0)
        safe_nbr = jnp.clip(nbr, 0, n - 1)
        nbr_grp = g.labels[bar[:, None], safe_nbr]          # [B, 4]
        same = (
            (nbr_grp[:, :, None] == nbr_grp[:, None, :])
            & (nbr_grp >= 0)[:, :, None]
        )                                                   # [B, 4, 4]
        tri = jnp.tril(jnp.ones((4, 4), bool), -1)[None]    # j < i

        def distinct(matches):
            dup = jnp.any(same & tri & matches[:, None, :], axis=2)
            first = matches & ~dup
            cnt = jnp.sum(first, axis=1)
            libs = jnp.max(jnp.where(first, nlib, 0), axis=1)
            return cnt, libs

        own_cnt, own_libs = distinct(col == victim[:, None])
        enemy_cnt, enemy_libs = distinct(col == attacker[:, None])

        analysis = engine.analyze(state)
        trigger = (
            on_board
            & analysis.legal_board[bar, cc]
            & (self_lib == 2)
            & (own_cnt == 1) & (own_libs == 1)
            & (enemy_cnt == 1) & (enemy_libs >= 3)
            & ~state.terminated
        )

        # ---- initial victim play (Play on a board copy, board.cc:1152-1156)
        start, _ = engine.step(_pin(state), cc, analysis)
        cur = jax.tree_util.tree_map(
            lambda played, orig: jnp.where(
                trigger.reshape(trigger.shape + (1,) * (orig.ndim - 1)),
                played, orig,
            ),
            _pin(start), _pin(state),
        )

        stk_state = jax.tree_util.tree_map(
            lambda x: jnp.broadcast_to(
                x[:, None], (b, STACK_DEPTH) + x.shape[1:]
            ).astype(x.dtype),
            cur,
        )
        loop = _LoopState(
            cur=cur,
            anchor=cc,
            victim=victim,
            depth=jnp.ones((b,), jnp.int32),
            num_call=jnp.zeros((b,), jnp.int32),
            result=jnp.where(trigger, -1, 0).astype(jnp.int32),
            fail_pending=jnp.zeros((b,), bool),
            sp=jnp.zeros((b,), jnp.int32),
            stk_state=stk_state,
            stk_move=jnp.zeros((b, STACK_DEPTH), jnp.int32),
            stk_depth=jnp.zeros((b, STACK_DEPTH), jnp.int32),
            iters=jnp.int32(0),
        )

        # generous safety bound: the call cap stops branching, stones only
        # accumulate on a finite board afterwards
        max_iters = MAX_LADDER_SEARCH + 2 * n + 2 * STACK_DEPTH

        def cond(s: _LoopState):
            return jnp.any(s.result < 0) & (s.iters < max_iters)

        loop = jax.lax.while_loop(cond, self._step, loop)
        # boards still undecided at the safety bound: no ladder proven
        return jnp.maximum(loop.result, 0)

    # ------------------------------------------------------------------
    def _step(self, s: _LoopState) -> _LoopState:
        """One examined position (== one checkLadderUseSearch call) or one
        backtrack pop, for every undecided board in lockstep."""
        engine, spec = self.engine, self.spec
        n = spec.num_points
        cur = s.cur
        b = cur.stones.shape[0]
        bar = jnp.arange(b)

        undecided = s.result < 0

        # ---- backtrack resolution ----
        do_pop = undecided & s.fail_pending & (s.sp > 0)
        result = jnp.where(
            undecided & s.fail_pending & (s.sp == 0), 0, s.result
        )
        undecided = result < 0
        spm1 = jnp.clip(s.sp - 1, 0, STACK_DEPTH - 1)
        cur = jax.tree_util.tree_map(
            lambda stk, c: jnp.where(
                do_pop.reshape(do_pop.shape + (1,) * (c.ndim - 1)),
                stk[bar, spm1], c,
            ),
            s.stk_state, cur,
        )
        pop_move = s.stk_move[bar, spm1]
        depth = jnp.where(do_pop, s.stk_depth[bar, spm1], s.depth)
        sp = s.sp - do_pop.astype(jnp.int32)

        # ---- examination (call entry, board.cc:989) ----
        examine = undecided & ~do_pop
        num_call = s.num_call + examine.astype(jnp.int32)

        member, lib_mask, nlibs, counter = self._group_liberty_info(
            cur.stones, s.anchor, s.victim
        )
        atk_turn = cur.next_player == opponent(s.victim)
        esc0, esc1 = self._first_two(lib_mask)

        # attacker to move (board.cc:996-1068)
        succ = examine & atk_turn & (nlibs <= 1)
        result = jnp.where(succ, depth, result)
        fail_now = examine & atk_turn & (nlibs >= 3)
        atk2 = examine & atk_turn & (nlibs == 2) & ~succ
        fail_now |= atk2 & counter  # victim counter-captures, ladder broken
        atk_go = atk2 & ~counter
        free0 = self._freedom(cur.stones, esc0)
        free1 = self._freedom(cur.stones, esc1)
        must = jnp.where(
            free0 == 3, esc0,
            jnp.where(
                free1 == 3, esc1,
                jnp.where(num_call >= MAX_LADDER_SEARCH, esc0, -1),
            ),
        )
        branch = atk_go & (must < 0)
        atk_move = jnp.where(must >= 0, must, esc0)

        # victim to move (board.cc:1069-1115)
        vic = examine & ~atk_turn
        fail_now |= vic & (nlibs != 1)   # attacker's last move was no atari
        fail_now |= vic & counter        # capture the attacker instead
        vic_go = vic & (nlibs == 1) & ~counter
        vic_move = esc0                  # the single remaining liberty

        play = (atk_go & ~fail_now) | vic_go | do_pop
        move = jnp.where(
            do_pop, pop_move, jnp.where(atk_turn, atk_move, vic_move)
        )

        # ---- push the untried branch (pre-play snapshot + esc1) ----
        push = branch & ~fail_now & (sp < STACK_DEPTH)
        slot = jnp.clip(sp, 0, STACK_DEPTH - 1)
        stk_state = jax.tree_util.tree_map(
            lambda stk, c: stk.at[bar, slot].set(
                jnp.where(
                    push.reshape(push.shape + (1,) * (c.ndim - 1)),
                    c, stk[bar, slot],
                )
            ),
            s.stk_state, cur,
        )
        stk_move = s.stk_move.at[bar, slot].set(
            jnp.where(push, esc1, s.stk_move[bar, slot])
        )
        stk_depth = s.stk_depth.at[bar, slot].set(
            jnp.where(push, depth, s.stk_depth[bar, slot])
        )
        sp = sp + push.astype(jnp.int32)

        # ---- play the chosen move ----
        stepped, _ = engine.step(cur, jnp.where(play, move, -5))
        applied = stepped.step_count > cur.step_count
        played = play & applied
        cur = jax.tree_util.tree_map(
            lambda new, old: jnp.where(
                played.reshape(played.shape + (1,) * (old.ndim - 1)),
                new, old,
            ),
            _pin(stepped), cur,
        )
        depth = depth + played.astype(jnp.int32)

        # an illegal victim flee means the group cannot be saved: captured
        # (the reference's TryPlay2-fails path returns 0 here — an artifact
        # of its broken flee targeting; a blocked flee IS a capture)
        vic_stuck = (vic_go | (do_pop & ~atk_turn)) & play & ~applied
        result = jnp.where(vic_stuck & (result < 0), depth, result)
        # an illegal attacker move fails that line (board.cc:1043,1059,1066)
        fail_pending = fail_now | (play & ~applied & ~vic_stuck)

        return _LoopState(
            cur=cur,
            anchor=s.anchor,
            victim=s.victim,
            depth=depth,
            num_call=num_call,
            result=result,
            fail_pending=fail_pending,
            sp=sp,
            stk_state=stk_state,
            stk_move=stk_move,
            stk_depth=stk_depth,
            iters=s.iters + 1,
        )
