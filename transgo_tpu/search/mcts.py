"""Batched MCTS with the reference's three search variants.

One engine, three scoring modes (static config), replacing the reference's
three near-identical classes in self_play.py:

- ``SearchMode.CLASSIC`` — conventional PUCT with additive virtual loss
  (class MCTS, self_play.py:335-572): UCB = c*P*sqrt(N)/(n+1) - Q, virtual
  loss added to value_sum along in-flight paths (self_play.py:514-532).
- ``SearchMode.WU`` — WU-UCT incomplete updates (class WU_UCT,
  self_play.py:98-332): UCB = c*P*sqrt(N+ons)/(n+ons+1) - Q with the
  unobserved-sample counter ``ons`` incremented along in-flight paths and
  reverted at completion (self_play.py:287-294). The reference's quirk that
  duplicate leaf selections never revert their ``ons`` (complete_update
  early-returns before revert, self_play.py:252-253 vs 275) is reproduced.
- ``SearchMode.WP`` — the production variance-augmented search (class
  WP_MCTS, self_play.py:575-875): UCB adds c2*sqrt(1+clip(var,0,3))
  (self_play.py:716-725) with Welford variance tracked per node
  (self_play.py:84-88), and supports small-board scale-transfer mixing of
  the sub-model's stitched policy/ownership (self_play.py:796-829).

Shared semantics faithfully carried over:

- leaf parallelism: ``parallel_readouts`` sequential descents whose
  incomplete updates influence each other, then ONE batched network call for
  all leaves, then in-order completions (run(), self_play.py:607-654) — on
  TPU the network call batches B*parallel_readouts leaves across all games;
- terminal leaves short-circuit with the true game outcome and are
  re-backed-up on every re-visit (self_play.py:638-642);
- pseudo-expansion: a selected new child is allocated unexpanded; priors are
  renormalized over the *leaf state's* legal actions at completion and every
  child's Q is seeded with minus the leaf's evaluated value
  (complete_update, self_play.py:727-755);
- duplicate completions of an already-expanded leaf are skipped without
  backup (self_play.py:732-734);
- visit-target loop: simulate until the root gains ``num_simulation`` visits
  beyond what tree reuse inherited (self_play.py:662-664);
- root Dirichlet(0.03) noise at fraction 0.25 over legal children
  (self_play.py:90-95);
- action sampling from visits^(1/T): counts of exactly 1 zeroed, self-play
  temperature 1.0 -> 0.65 by game step, evaluation temperature 0.12
  (self_play.py:666-683).

Known deviation (documented): the reference retries failed (terminal)
descents up to 2x parallel_readouts to fill its leaf batch
(self_play.py:616); we issue exactly ``parallel_readouts`` descents per
round — terminal hits still back up the true outcome, so the visit-target
loop compensates with more rounds.
"""

from __future__ import annotations

import enum
from typing import Callable, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from transgo_tpu.ops.engine import GoEngine
from transgo_tpu.ops.features import FeatureEncoder
from transgo_tpu.ops.state import GoState
from transgo_tpu.search.tree import (
    NULL,
    ONS,
    VISIT,
    VMEAN,
    VSUM,
    VVAR,
    Tree,
    gather_nodes,
    init_tree,
    onehot_rows,
    promote_subtree,
    write_node_states,
)


class SearchMode(str, enum.Enum):
    CLASSIC = "classic"
    WU = "wu"
    WP = "wp"


# eval_fn(obs[N, H, W, C], to_play int8[N]) -> (policy_probs[N, A], value[N])
# to_play lets wrappers apply player-signed komi corrections (the ownership
# value blend, scale_train_live/self_play.py:181-185, and the WP transfer
# value, self_play.py:802-815) — the planes themselves are player-relative.
EvalFn = Callable[[jnp.ndarray, jnp.ndarray], Tuple[jnp.ndarray, jnp.ndarray]]


class SearchResult(NamedTuple):
    action: jnp.ndarray        # int32[B] sampled move
    action_probs: jnp.ndarray  # float32[B, A] visit-count pi (untempered)
    observation: jnp.ndarray   # float32[B, H, W, C] root encoding
    tree: Tree


class PendingAlloc(NamedTuple):
    """Side table of this round's pseudo-expanded leaves, [B, L] each.

    The descent scan allocates up to one node per board per readout, but the
    big per-node arrays (edge_child pointers, parent links, terminal flags,
    embedded env states) are NOT written inside the scan — a one-hot masked
    rewrite of a [B, M, A] array costs a full HBM pass, and doing it per
    descent made the 4-descent scan ~4x more expensive than the walks
    themselves. Instead each descent records its allocation here, later
    descents overlay these entries where the tree arrays are stale (child
    lookup during the walk, UCB child stats, terminal short-circuit), and
    ``run_round`` installs everything in ONE fused pass per array after the
    scan. Stats rows ARE initialized in-descent ([B, M, 5] is small) so the
    WU/WP ``ons`` marks of pending leaves steer later descents exactly as
    the reference's pseudo-expanded nodes do (self_play.py:151-155, 287-294).
    """

    parent: jnp.ndarray   # int32 [B, L] parent node of the new leaf
    action: jnp.ndarray   # int32 [B, L] edge action
    slot: jnp.ndarray     # int32 [B, L] allocated node slot
    done: jnp.ndarray     # bool  [B, L] leaf state is terminal
    tvalue: jnp.ndarray   # float32 [B, L] terminal value (leaf perspective)
    valid: jnp.ndarray    # bool  [B, L] entry holds a real allocation

    @staticmethod
    def empty(b: int, l: int) -> "PendingAlloc":
        return PendingAlloc(
            parent=jnp.full((b, l), NULL, jnp.int32),
            action=jnp.full((b, l), NULL, jnp.int32),
            slot=jnp.full((b, l), NULL, jnp.int32),
            done=jnp.zeros((b, l), bool),
            tvalue=jnp.zeros((b, l), jnp.float32),
            valid=jnp.zeros((b, l), bool),
        )


class MCTS:
    """Stateless search bound to (engine, encoder, mode, Config)."""

    def __init__(self, config, engine: GoEngine, mode: SearchMode = SearchMode.WP,
                 max_nodes: Optional[int] = None, encoder=None):
        self.config = config
        self.engine = engine
        # engine may be a GoEngine or any adapter exposing the same surface
        # (e.g. curriculum.LiveWindowEngine with a local action space);
        # a custom encoder overrides the default full-board feature planes
        self.encoder = encoder or FeatureEncoder(
            engine, config.encode_state_channels
        )
        self.mode = SearchMode(mode)
        self.num_actions = engine.spec.num_actions
        self.max_nodes = max_nodes or config.max_nodes
        self.readouts = config.parallel_readouts
        self.num_simulations = config.num_simulation
        self.wu_loss = float(config.wu_loss)
        self.virtual_loss = float(config.virtual_loss)
        self.c_puct = float(config.c_puct)
        self.c1 = float(config.c_puct1)
        self.c2 = float(config.c_puct2)
        # scale_train recipes: unvisited children score Q=0 instead of the
        # main engines' Q = -(parent eval value) (self_play.py:29-36 vs
        # scale_train_live/self_play.py:149-156)
        self.child_init_zero = bool(getattr(config, "child_init_zero", False))
        # test hook: resolve UCB ties by lowest action index instead of
        # uniformly at random (the reference's np.random.choice,
        # self_play.py:708-714) — golden-search parity fixtures set this on
        # both sides so RNG-coupled tie-breaks never diverge
        self.deterministic_ties = bool(
            getattr(config, "deterministic_tie_break", False)
        )

    # ------------------------------------------------------------------
    def new_tree(self, batch: int) -> Tree:
        return init_tree(
            batch, self.max_nodes, self.num_actions, self.engine.spec.size
        )

    # ------------------------------------------------------------------
    def reset_root(self, tree: Tree, eval_fn: EvalFn,
                   states: Optional[GoState] = None) -> Tree:
        """Fresh tree rooted at ``states`` (default: empty boards), root
        evaluated and expanded (reset_root, self_play.py:595-605)."""
        b = tree.shape[0]
        tree = self.new_tree(b)
        if states is None:
            states = self.engine.init(b)
        root_idx = jnp.zeros((b,), jnp.int32)
        tree = tree.replace(node_count=jnp.ones((b,), jnp.int32))
        tree = write_node_states(tree, root_idx, states, jnp.ones((b,), bool))
        return self._expand_roots(tree, eval_fn, jnp.ones((b,), bool))

    def _expand_roots(self, tree: Tree, eval_fn: EvalFn,
                      need: jnp.ndarray) -> Tree:
        """Evaluate + expand root nodes where ``need`` (and not terminal)."""
        b = tree.shape[0]
        bar = jnp.arange(b)
        root = tree.root
        states = gather_nodes(tree, root)
        analysis = self.engine.analyze(states)
        legal = self.engine.legal_action_mask(states, analysis)
        obs = self.encoder(states, analysis)
        policy, value = eval_fn(obs, states.next_player)

        # root expansions keep the RAW policy values on legal actions — the
        # reference renormalizes over legal moves only in complete_update
        # (self_play.py:738-741); reset_root / update_with_action expand
        # with the un-renormalized softmax (self_play.py:600-605, 866-871),
        # so root priors sum to < 1 when the net puts mass on pass/illegal
        prior = jnp.where(legal, policy, 0.0)

        do = need & ~tree.terminal[bar, root]
        # one-hot masked root-row rewrites (see _path_onehot comment)
        m = tree.stats.shape[1]
        ids_m = jnp.arange(m, dtype=jnp.int32)[None, :]
        ohr = (ids_m == root[:, None]) & do[:, None]              # [B, M]
        ohc = ohr[:, :, None]
        tree = tree.replace(
            edge_prior=jnp.where(ohc, prior[:, None, :], tree.edge_prior),
            legal=jnp.where(ohc, legal[:, None, :], tree.legal),
            node_libs=jnp.where(
                ohc,
                analysis.groups.stone_libs.astype(jnp.int16)[:, None, :],
                tree.node_libs,
            ),
            node_size=jnp.where(
                ohc,
                analysis.groups.stone_size.astype(jnp.int16)[:, None, :],
                tree.node_size,
            ),
            node_group=jnp.where(
                ohc,
                analysis.groups.labels.astype(jnp.int16)[:, None, :],
                tree.node_group,
            ),
            init_value=jnp.where(
                ohr,
                0.0 if self.child_init_zero else -value[:, None],
                tree.init_value,
            ),
            expanded=tree.expanded | ohr,
        )
        return tree

    # ------------------------------------------------------------------
    def _child_stats(self, tree: Tree, node: jnp.ndarray,
                     pend: Optional[PendingAlloc] = None):
        """Per-action child stats of ``node`` int32[B], defaults for
        unallocated children (visits 0, ons 0, value_sum = parent's
        init_value, var 0). ``pend`` overlays this round's not-yet-installed
        child pointers so pending leaves' ``ons`` marks are visible."""
        b = node.shape[0]
        bar = jnp.arange(b)
        child = tree.edge_child[bar, node]                  # [B, A]
        if pend is not None:
            ids_a = jnp.arange(child.shape[1], dtype=child.dtype)[None, :]
            for j in range(pend.slot.shape[1]):
                hit = pend.valid[:, j] & (pend.parent[:, j] == node)
                oh = hit[:, None] & (ids_a == pend.action[:, j][:, None])
                child = jnp.where(oh, pend.slot[:, j][:, None], child)
        exists = child >= 0
        # one-hot MXU gather (negative pointers give zero rows, masked below)
        st = onehot_rows(tree.stats, child)               # [B, A, 5]
        cv = jnp.where(exists, st[..., VISIT], 0.0)
        cvs = jnp.where(
            exists, st[..., VSUM], tree.init_value[bar, node][:, None]
        )
        cons = jnp.where(exists, st[..., ONS], 0.0)
        cvar = jnp.where(exists, st[..., VVAR], 0.0)
        return child, exists, cv, cvs, cons, cvar

    def _ucb(self, tree: Tree, node: jnp.ndarray,
             pend: Optional[PendingAlloc] = None) -> jnp.ndarray:
        """float32[B, A] UCB scores; illegal actions -inf."""
        b = node.shape[0]
        bar = jnp.arange(b)
        _, _, cv, cvs, cons, cvar = self._child_stats(tree, node, pend)
        prior = tree.edge_prior[bar, node]
        legal = tree.legal[bar, node]
        pst = tree.stats[bar, node]                         # [B, 5]
        pv = pst[:, VISIT][:, None]
        pons = pst[:, ONS][:, None]
        q = cvs / (cv + 1.0)                                # child value()

        if self.mode == SearchMode.CLASSIC:
            # self_play.py:469-473
            score = (
                self.c_puct * prior * jnp.sqrt(pv) / (cv + 1.0) - q
            )
        elif self.mode == SearchMode.WU:
            # self_play.py:240-244
            score = (
                self.c_puct * prior * jnp.sqrt(pv + pons) / (cv + cons + 1.0)
                - q
            )
        else:  # WP, self_play.py:716-725
            var = jnp.clip(cvar, 0.0, 3.0)
            score = (
                self.c1 * prior * jnp.sqrt(pv + pons) / (cv + cons + 1.0)
                + self.c2 * jnp.sqrt(1.0 + var)
                - q
            )
        return jnp.where(legal, score, -jnp.inf)

    def _select_child(self, tree: Tree, node: jnp.ndarray,
                      noise, pend: Optional[PendingAlloc] = None
                      ) -> jnp.ndarray:
        """argmax UCB with uniform random tie-breaking
        (select_child, self_play.py:706-714). ``noise`` is a pre-drawn
        uniform [B, A] slab — drawing it here would put a multi-op threefry
        inside the descent while_loop body."""
        scores = self._ucb(tree, node, pend)
        max_score = jnp.max(scores, axis=1, keepdims=True)
        is_max = scores >= max_score
        return jnp.argmax(
            jnp.where(is_max, noise, -1.0), axis=1
        ).astype(jnp.int32)

    # ------------------------------------------------------------------
    # Path-based updates: the descent records the visited node chain, and
    # every backup/incomplete/revert is applied as a ONE-HOT MASKED rewrite
    # of the packed stats array. Row scatters with computed [B, D] indices
    # lower to sort-based scatter kernels on TPU that rewrite (and re-read)
    # far more than the touched rows; a broadcast compare
    # ``path[:, :, None] == iota(M)`` plus select/reduce instead fuses with
    # the stats update into a single elementwise pass over [B, M, 5]
    # (~1 MB at B=256) — measured ~10x less HBM traffic per round.
    # Path nodes are unique within a row (it's a tree path), so reducing
    # one-hot contributions over D is exact.

    def _path_onehot(self, path: jnp.ndarray, active, m: int):
        """(onpath bool[B, M], oh bool[B, D, M]) membership masks."""
        valid = (path >= 0) & active[:, None]
        ids = jnp.arange(m, dtype=path.dtype)
        oh = (path[:, :, None] == ids[None, None, :]) & valid[:, :, None]
        return jnp.any(oh, axis=1), oh

    def _backup(self, tree: Tree, path: jnp.ndarray, leaf_pos: jnp.ndarray,
                value, active) -> Tree:
        """Backpropagate ``value`` (leaf's perspective) along ``path``
        (backpropagate, self_play.py:758-764), with Welford variance updates
        in WP mode (Node_V.value_mean_var, self_play.py:84-88)."""
        b, d = path.shape
        m = tree.stats.shape[1]
        t = jnp.arange(d)[None, :]
        sign = jnp.where((leaf_pos[:, None] - t) % 2 == 0, 1.0, -1.0)
        if not isinstance(value, jnp.ndarray):
            value = jnp.full((b,), value, jnp.float32)
        dv = sign * value[:, None]                    # node-local signed value

        onpath, oh = self._path_onehot(path, active, m)
        # signed value landing on each path node (exact: rows are unique)
        dv_m = jnp.sum(jnp.where(oh, dv[:, :, None], 0.0), axis=1)  # [B, M]

        st = tree.stats
        vis = st[..., VISIT]
        vs = st[..., VSUM]
        vis_new = jnp.where(onpath, vis + 1.0, vis)
        vs_new = jnp.where(onpath, vs + dv_m, vs)
        if self.mode == SearchMode.WP:
            mean_new = jnp.where(onpath, vs_new / (vis_new + 1.0),
                                 st[..., VMEAN])
            var_new = jnp.where(
                onpath,
                st[..., VVAR]
                + (dv_m - st[..., VMEAN]) * (dv_m - mean_new),
                st[..., VVAR],
            )
        else:
            mean_new = st[..., VMEAN]
            var_new = st[..., VVAR]
        new_st = jnp.stack(
            [vis_new, vs_new, st[..., ONS], mean_new, var_new], axis=-1
        )
        return tree.replace(stats=new_st)

    def _incomplete(self, tree: Tree, path: jnp.ndarray, active,
                    sign: float) -> Tree:
        """In-flight path marking: classic adds a (non-alternating) virtual
        loss to value_sum (self_play.py:514-532); WU/WP bump ``ons``
        (self_play.py:767-774)."""
        m = tree.stats.shape[1]
        lane = VSUM if self.mode == SearchMode.CLASSIC else ONS
        delta = (
            sign * self.virtual_loss
            if self.mode == SearchMode.CLASSIC
            else sign * self.wu_loss
        )
        onpath, _ = self._path_onehot(path, active, m)
        lane_new = tree.stats[..., lane] + jnp.where(onpath, delta, 0.0)
        return tree.replace(
            stats=tree.stats.at[..., lane].set(lane_new)
        )

    # ------------------------------------------------------------------
    @property
    def max_depth(self) -> int:
        """Static bound on recorded path length. A path can never outlive
        the game (max_step), and Config.search_max_depth tightens it further
        because the path-scatter cost is proportional to the bound."""
        d = int(getattr(self.config, "search_max_depth", 0)) or (
            int(self.config.max_step) + 2
        )
        return min(d, int(self.config.max_step) + 2)

    def _descend(self, tree: Tree, key, active: jnp.ndarray,
                 pend: PendingAlloc, li):
        """One leaf selection per board.

        Returns (tree, pend', leaf_idx[B], needs_eval[B], path[B, D],
        leaf_pos[B], stepped GoState, alloc[B], slot[B], par[B], act[B],
        done[B], term_value[B]) with terminal leaves already backed up and
        incomplete updates applied to eval leaves.

        The leaf's board analysis, legal mask, observation, env state,
        parent link, terminal flag, and the parent's child pointer are NOT
        written here: later descents of the same round resolve them through
        the ``pend`` side table (see :class:`PendingAlloc`), and
        ``run_round`` installs them in ONE batched pass per array after the
        scan — four sequential full-array passes at batch B become one, and
        the L*B leaf analyses batch into one reachability/encoder call.
        Only the [B, M, 5] stats row is initialized in-descent (pending
        leaves' ``ons`` marks must steer the next descent).
        """
        b, m, a = tree.shape
        bar = jnp.arange(b)
        dmax = self.max_depth
        num_pend = pend.slot.shape[1]

        def cond(carry):
            _, depth, moving, _, _ = carry
            return jnp.any(moving) & (depth < dmax - 1)

        # tie-break noise for every depth, drawn once (threefry inside the
        # while body costs ~as much as the selection math itself)
        if self.deterministic_ties:
            # strictly decreasing by action index -> argmax picks the
            # lowest-indexed tied action
            noise_all = jnp.broadcast_to(
                (a - jnp.arange(a, dtype=jnp.float32)) / (a + 1.0),
                (dmax, b, a),
            )
        else:
            noise_all = jax.random.uniform(key, (dmax, b, a))

        def body(carry):
            cur, depth, moving, (sel_p, sel_a, sel_c), path = carry
            path = path.at[:, depth].set(jnp.where(moving, cur, NULL))
            noise = jax.lax.dynamic_index_in_dim(
                noise_all, depth, keepdims=False
            )
            act = self._select_child(tree, cur, noise, pend)
            child = tree.edge_child[bar, cur, act]
            # overlay this round's pending (not yet installed) child edges
            for j in range(num_pend):
                hit = (
                    pend.valid[:, j]
                    & (pend.parent[:, j] == cur)
                    & (pend.action[:, j] == act)
                )
                child = jnp.where(hit, pend.slot[:, j], child)
            child_ok = child >= 0
            safe_child = jnp.where(child_ok, child, 0)
            # pending slots are always unexpanded (completion happens after
            # the scan), so reading the stale `expanded` row is correct
            child_expanded = child_ok & tree.expanded[bar, safe_child]
            go = moving & child_expanded
            stop = moving & ~child_expanded
            sel_p = jnp.where(stop, cur, sel_p)
            sel_a = jnp.where(stop, act, sel_a)
            sel_c = jnp.where(stop, child, sel_c)
            cur = jnp.where(go, child, cur)
            return cur, depth + 1, go, (sel_p, sel_a, sel_c), path

        init = (
            tree.root,
            jnp.int32(0),
            active,
            (
                tree.root,
                jnp.zeros((b,), jnp.int32),
                jnp.full((b,), NULL, jnp.int32),
            ),
            jnp.full((b, dmax), NULL, jnp.int32),
        )
        _, _, still_moving, (par, act, existing), path = jax.lax.while_loop(
            cond, body, init
        )
        # boards whose descent exceeded the static depth bound sit this
        # round out (no selection was made for them); the search loop's
        # max_rounds guard keeps the move bounded regardless. Counted in
        # tree.depth_capped so sit-outs are never silent (the pipeline
        # reports the per-chunk rate).
        tree = tree.replace(
            depth_capped=tree.depth_capped + still_moving.astype(jnp.int32)
        )
        active = active & ~still_moving
        # walk length per board = number of recorded nodes; the leaf slots
        # in right after
        leaf_pos = jnp.sum(path >= 0, axis=1).astype(jnp.int32)
        leaf_pos = jnp.clip(leaf_pos, 0, dmax - 1)

        # env-step the selected edge using the parent's cached group stats
        # (selection only proposes legal actions, so no re-analysis).
        # Parents are always expanded nodes, never pending slots, so the
        # deferred state writes are invisible here.
        parent_states = gather_nodes(tree, par)
        par_libs = tree.node_libs[bar, par]
        par_size = tree.node_size[bar, par]
        par_group = tree.node_group[bar, par]
        stepped, done = self.engine.step_trusted(
            parent_states, act, par_libs, par_size, par_group
        )

        need_alloc = active & (existing < 0)
        new_idx = tree.node_count
        leaf = jnp.where(need_alloc, new_idx, jnp.where(active, existing, 0))
        safe_leaf = jnp.clip(leaf, 0, m - 1)

        al = need_alloc & (new_idx < m)
        leaf = jnp.where(active & (existing < 0) & ~al, 0, leaf)  # overflow guard
        safe_new = jnp.where(al, new_idx, 0)
        # scoring flood fill only when some board actually hit a terminal
        term_value = jax.lax.cond(
            jnp.any(done & active),
            lambda: jnp.where(
                stepped.next_player == self.engine.winner(stepped), 1.0, -1.0
            ).astype(jnp.float32),
            lambda: jnp.zeros((b,), jnp.float32),
        )
        # stats-row initialisation (one fused [B, M, 5] pass; slots may hold
        # stale data after subtree compaction). The new slot's expanded flag
        # needs no clear: every allocator (init_tree, promote_subtree,
        # _fresh_roots) leaves slots beyond node_count unexpanded, and its
        # init_value is written at completion (_complete writes the full
        # row's worth where `do`).
        ids_m = jnp.arange(m, dtype=jnp.int32)[None, :]
        ohn = (ids_m == safe_new[:, None]) & al[:, None]          # [B, M]
        seed = tree.init_value[bar, par]                           # child-Q
        new_row = jnp.stack(
            [jnp.zeros_like(seed), seed, jnp.zeros_like(seed),
             jnp.zeros_like(seed), jnp.zeros_like(seed)], axis=-1
        )                                                          # [B, 5]
        tree = tree.replace(
            node_count=tree.node_count + al.astype(jnp.int32),
            stats=jnp.where(ohn[:, :, None], new_row[:, None, :], tree.stats),
        )

        # complete the path with the leaf
        path = path.at[bar, leaf_pos].set(
            jnp.where(active, safe_leaf, NULL)
        )

        # terminal short-circuit flag: fresh allocations use the local step
        # result; re-selected leaves read the tree, overlaid with pending
        # entries from earlier descents this round
        is_term_prev = tree.terminal[bar, safe_leaf]
        tv_prev = tree.terminal_value[bar, safe_leaf]
        for j in range(num_pend):
            hit = pend.valid[:, j] & (safe_leaf == pend.slot[:, j])
            is_term_prev = jnp.where(hit, pend.done[:, j], is_term_prev)
            tv_prev = jnp.where(hit, pend.tvalue[:, j], tv_prev)
        is_term = active & jnp.where(al, done, is_term_prev)
        tv = jnp.where(al, term_value, tv_prev)

        # record this descent's allocation in the side table (column li)
        col = jnp.arange(num_pend, dtype=jnp.int32)[None, :] == li
        pend = PendingAlloc(
            parent=jnp.where(col, par[:, None], pend.parent),
            action=jnp.where(col, act[:, None], pend.action),
            slot=jnp.where(col, safe_new[:, None], pend.slot),
            done=jnp.where(col, done[:, None], pend.done),
            tvalue=jnp.where(col, term_value[:, None], pend.tvalue),
            valid=jnp.where(col, al[:, None], pend.valid),
        )

        # terminal leaves: back up the true outcome now (self_play.py:638-642)
        tree = self._backup(tree, path, leaf_pos, tv, is_term)

        needs_eval = active & ~is_term
        tree = self._incomplete(tree, path, needs_eval, +1.0)
        return (tree, pend, safe_leaf, needs_eval, path, leaf_pos, stepped,
                al, safe_new, par, act, done, term_value)

    # ------------------------------------------------------------------
    def _complete(self, tree: Tree, leaf, needs, policy, value, path,
                  leaf_pos, legal=None) -> Tree:
        """complete_update / incorporate_results (self_play.py:727-755).

        ``legal`` is the leaf's legal row if the caller already has it (the
        round computed it for every leaf this round); omitted, it is
        gathered from the tree."""
        b, m, a = tree.shape
        bar = jnp.arange(b)
        already = tree.expanded[bar, leaf]
        do = needs & ~already

        # reverts: WP/classic revert along the path regardless of duplicate
        # status (self_play.py:653, 406); WU leaks ons on duplicates
        # (self_play.py:252-253)
        revert_mask = needs if self.mode != SearchMode.WU else do
        tree = self._incomplete(tree, path, revert_mask, -1.0)

        if legal is None:
            legal = tree.legal[bar, leaf]
        scale = jnp.sum(jnp.where(legal, policy, 0.0), axis=1)
        ok = scale > 0
        prior = jnp.where(legal, policy, 0.0) / jnp.maximum(
            scale[:, None], 1e-12
        )
        setp = do & ok
        # one-hot masked row rewrites (see _path_onehot comment). The leaf's
        # edge rows may hold stale data from a compacted-away node (the
        # descent skips clearing rows of slots it allocates), so expansion
        # rewrites the full prior row (zeros when the policy had no mass on
        # legal moves) and resets the child-pointer row.
        ids_m = jnp.arange(m, dtype=jnp.int32)[None, :]
        ohl = ids_m == leaf[:, None]                              # [B, M]
        ohd = ohl & do[:, None]
        prior_row = jnp.where(ok[:, None], prior, 0.0)
        # init_value is written wherever `do` (not just `do & ok`): the
        # descent no longer pre-zeroes new slots, so expansion must clear
        # possibly-stale seeds even when the policy had no legal mass
        seed = (
            jnp.zeros_like(value) if self.child_init_zero else -value
        )
        iv_row = jnp.where(setp, seed, 0.0)
        tree = tree.replace(
            edge_prior=jnp.where(
                ohd[:, :, None], prior_row[:, None, :], tree.edge_prior
            ),
            edge_child=jnp.where(ohd[:, :, None], NULL, tree.edge_child),
            init_value=jnp.where(ohd, iv_row[:, None], tree.init_value),
            expanded=tree.expanded | ohd,
        )
        return self._backup(tree, path, leaf_pos, value, do)

    # ------------------------------------------------------------------
    def run_round(self, tree: Tree, eval_fn: EvalFn, key,
                  active: jnp.ndarray) -> Tree:
        """One run(): L descents -> one batched eval -> L completions
        (self_play.py:607-654). The descents/completions are lax.scans so
        the compiled program carries ONE descent body instead of L unrolled
        copies — a large compile-time win for the search program."""
        b = tree.shape[0]

        def descend_body(carry, i):
            tree, pend = carry
            (tree, pend, leaf, need, path, leaf_pos, stepped, al, slot,
             par, act, done, tval) = self._descend(
                tree, jax.random.fold_in(key, i), active, pend, i
            )
            return (tree, pend), (
                leaf, need, path, leaf_pos, stepped, al, slot, par, act,
                done, tval,
            )

        (tree, _), (leaf_t, need_t, path_t, pos_t, stepped_t, al_t, slot_t,
                    par_t, act_t, done_t, tval_t) = jax.lax.scan(
            descend_body,
            (tree, PendingAlloc.empty(b, self.readouts)),
            jnp.arange(self.readouts),
        )                                           # *_t: [L, B, ...]

        # ONE batched analysis/encoding of all L*B leaf states (deferred out
        # of the scan — see _descend docstring), then scatter the legal masks
        # and group caches into the slots the scan allocated
        flat_states = jax.tree_util.tree_map(
            lambda x: x.reshape((self.readouts * b,) + x.shape[2:]), stepped_t
        )
        leaf_analysis = self.engine.analyze(flat_states)
        leaf_legal = self.engine.legal_action_mask(flat_states, leaf_analysis)
        obs = self.encoder(flat_states, leaf_analysis)

        # install everything the descents deferred, ONE fused pass per array
        # (the L chained one-hot selects touch distinct slots, so order is
        # irrelevant and XLA fuses the chain into a single elementwise pass;
        # doing these inside the scan cost L full passes per array)
        m = tree.stats.shape[1]
        npts = self.engine.spec.num_points
        legal_t = leaf_legal.reshape(self.readouts, b, -1)
        libs_t = leaf_analysis.groups.stone_libs.astype(jnp.int16).reshape(
            self.readouts, b, npts
        )
        size_t = leaf_analysis.groups.stone_size.astype(jnp.int16).reshape(
            self.readouts, b, npts
        )
        group_t = leaf_analysis.groups.labels.astype(jnp.int16).reshape(
            self.readouts, b, npts
        )
        ids_m = jnp.arange(m, dtype=jnp.int32)[None, :]
        ids_a = jnp.arange(self.num_actions, dtype=jnp.int32)[None, :]
        legal_new, libs_new, size_new, group_new = (
            tree.legal, tree.node_libs, tree.node_size, tree.node_group
        )
        edge_child_new = tree.edge_child
        parent_new, paction_new = tree.parent, tree.parent_action
        term_new, tval_new = tree.terminal, tree.terminal_value
        states_new = tree.states
        for li in range(self.readouts):
            al = al_t[li]
            oh = (ids_m == slot_t[li][:, None]) & al[:, None]      # [B, M]
            ohc = oh[:, :, None]
            legal_new = jnp.where(ohc, legal_t[li][:, None, :], legal_new)
            libs_new = jnp.where(ohc, libs_t[li][:, None, :], libs_new)
            size_new = jnp.where(ohc, size_t[li][:, None, :], size_new)
            group_new = jnp.where(ohc, group_t[li][:, None, :], group_new)
            # parent's (par, act) edge gains the child pointer
            ohp = (
                (ids_m == par_t[li][:, None])[:, :, None]
                & (ids_a == act_t[li][:, None])[:, None, :]
                & al[:, None, None]
            )
            edge_child_new = jnp.where(
                ohp, slot_t[li][:, None, None], edge_child_new
            )
            parent_new = jnp.where(oh, par_t[li][:, None], parent_new)
            paction_new = jnp.where(oh, act_t[li][:, None], paction_new)
            term_new = jnp.where(oh, done_t[li][:, None], term_new)
            tval_new = jnp.where(oh, tval_t[li][:, None], tval_new)

            def upd(dst, src):
                o = oh.reshape(oh.shape + (1,) * (dst.ndim - oh.ndim))
                return jnp.where(
                    o, src[:, None] if src.ndim == 1 else src[:, None, ...],
                    dst,
                )

            states_new = jax.tree_util.tree_map(
                upd, states_new,
                jax.tree_util.tree_map(lambda x: x[li], stepped_t),
            )
        tree = tree.replace(
            legal=legal_new, node_libs=libs_new, node_size=size_new,
            node_group=group_new, edge_child=edge_child_new,
            parent=parent_new, parent_action=paction_new,
            terminal=term_new, terminal_value=tval_new, states=states_new,
        )

        policy, value = eval_fn(obs, flat_states.next_player)
        policy_t = policy.reshape(self.readouts, b, -1)
        value_t = value.reshape(self.readouts, b)

        # completions run unrolled (readouts is small and static): unlike a
        # lax.scan, the unrolled chain of one-hot masked updates fuses into
        # ~one elementwise pass per tree array instead of one per descent
        for li in range(self.readouts):
            tree = self._complete(
                tree, leaf_t[li], need_t[li], policy_t[li], value_t[li],
                path_t[li], pos_t[li], legal=legal_t[li],
            )
        return tree

    # ------------------------------------------------------------------
    def search(self, tree: Tree, eval_fn: EvalFn, key) -> Tree:
        """Visit-target simulation loop (self_play.py:662-664): run rounds
        until every board's root gained num_simulation visits."""
        b = tree.shape[0]
        bar = jnp.arange(b)
        start = tree.stats[bar, tree.root, VISIT]
        target = start + self.num_simulations

        # hard round bound: guarantees loop termination even if a board
        # degenerates into pure duplicate selections (which add no visits)
        max_rounds = self.num_simulations

        def cond(carry):
            tree, i = carry
            below = jnp.any(tree.stats[bar, tree.root, VISIT] < target)
            return below & (i < max_rounds)

        def body(carry):
            tree, i = carry
            active = tree.stats[bar, tree.root, VISIT] < target
            tree = self.run_round(
                tree, eval_fn, jax.random.fold_in(key, i), active
            )
            return tree, i + 1

        tree, _ = jax.lax.while_loop(cond, body, (tree, jnp.int32(0)))
        return tree

    # ------------------------------------------------------------------
    def root_dirichlet(self, tree: Tree, key,
                       mask: Optional[jnp.ndarray] = None) -> Tree:
        """Mix Dirichlet(alpha) noise into root priors over legal children
        (dirichlet_prior, self_play.py:90-95). ``mask`` bool[B] restricts
        the mix to a subset of boards (continuous mode noises each board's
        root when *its* move begins, not at a batch-wide move boundary)."""
        b, m, a = tree.shape
        bar = jnp.arange(b)
        cfg = self.config
        legal = tree.legal[bar, tree.root]
        gam = jax.random.gamma(
            key, cfg.dirichlet_alpha, shape=(b, a)
        )
        gam = jnp.where(legal, gam, 0.0)
        noise = gam / jnp.maximum(gam.sum(axis=1, keepdims=True), 1e-30)
        prior = tree.edge_prior[bar, tree.root]
        mixed = jnp.where(
            legal,
            prior * (1.0 - cfg.dirichlet_frac) + noise * cfg.dirichlet_frac,
            prior,
        )
        if mask is not None:
            mixed = jnp.where(mask[:, None], mixed, prior)
        ids_m = jnp.arange(m, dtype=jnp.int32)[None, :]
        ohr = (ids_m == tree.root[:, None])[:, :, None]  # one fused pass
        return tree.replace(
            edge_prior=jnp.where(ohr, mixed[:, None, :], tree.edge_prior)
        )

    # ------------------------------------------------------------------
    def action_statistics(self, tree: Tree):
        """(visit_counts[B, A], pi[B, A]) with ==1 counts zeroed
        (self_play.py:666-671)."""
        b = tree.shape[0]
        bar = jnp.arange(b)
        child = tree.edge_child[bar, tree.root]
        exists = child >= 0
        counts = jnp.where(
            exists,
            onehot_rows(tree.stats, child)[..., VISIT].astype(jnp.int32),
            0,
        )
        counts = jnp.where(counts == 1, 0, counts)
        pi = counts / jnp.maximum(counts.sum(axis=1, keepdims=True), 1)
        return counts, pi.astype(jnp.float32)

    def sample_action(self, counts, temperature, key) -> jnp.ndarray:
        """Sample from visits^(1/T) in log space (self_play.py:679-683)."""
        logc = jnp.where(counts > 0, jnp.log(counts.astype(jnp.float32)),
                         -jnp.inf)
        logits = logc / temperature[:, None]
        return jax.random.categorical(key, logits, axis=1).astype(jnp.int32)

    # ------------------------------------------------------------------
    def get_action_probs(self, tree: Tree, eval_fn: EvalFn, key,
                         is_selfplay: bool = True) -> SearchResult:
        """Full per-move pipeline (get_action_probs, self_play.py:657-687):
        optional root noise -> simulations -> pi -> tempered sample."""
        cfg = self.config
        b = tree.shape[0]
        bar = jnp.arange(b)
        knoise, ksearch, ksample = jax.random.split(key, 3)
        if is_selfplay:
            tree = self.root_dirichlet(tree, knoise)
        tree = self.search(tree, eval_fn, ksearch)
        counts, pi = self.action_statistics(tree)
        # degenerate guard: if every child count was zeroed (tiny sim budgets
        # spread one visit per child), fall back to uniform over legal moves
        # — the reference would divide by zero here (self_play.py:670-671)
        legal_root = tree.legal[jnp.arange(b), tree.root]
        none_left = ~jnp.any(counts > 0, axis=1)
        counts = jnp.where(
            none_left[:, None], legal_root.astype(counts.dtype), counts
        )
        pi = jnp.where(
            none_left[:, None],
            legal_root / jnp.maximum(
                legal_root.sum(axis=1, keepdims=True), 1
            ),
            pi,
        )

        root_states = gather_nodes(tree, tree.root)
        if is_selfplay:
            # temperature by game step (epsilon_by_frame, configure.py:75-79)
            step = root_states.step_count.astype(jnp.float32)
            temp = cfg.epsilon_by_frame(step)
        else:
            temp = jnp.full((b,), cfg.eval_temperature, jnp.float32)
        action = self.sample_action(counts, temp, ksample)
        obs = self.encoder(root_states)
        return SearchResult(action, pi, obs, tree)

    # ------------------------------------------------------------------
    def select_action(self, states: GoState, eval_fn: EvalFn,
                      key) -> jnp.ndarray:
        """Arena-style move choice: fresh root at ``states``, full search,
        no noise, evaluation temperature (select_action,
        self_play.py:689-703)."""
        b = states.stones.shape[0]
        tree = self.new_tree(b)
        tree = self.reset_root(tree, eval_fn, states)
        res = self.get_action_probs(tree, eval_fn, key, is_selfplay=False)
        return res.action

    # ------------------------------------------------------------------
    def advance(self, tree: Tree, action: jnp.ndarray,
                eval_fn: EvalFn) -> Tuple[Tree, jnp.ndarray]:
        """Play ``action`` at the root, reusing the chosen subtree
        (update_with_action, self_play.py:857-872).

        Returns (tree, done[B]). Boards whose chosen child was never
        allocated get a fresh root stepped from the old root state.
        """
        new_tree, done, need_expand = self.advance_raw(tree, action)
        new_tree = self._expand_roots(new_tree, eval_fn, need_expand)
        return new_tree, done

    def advance_raw(
        self, tree: Tree, action: jnp.ndarray,
        valid: Optional[jnp.ndarray] = None,
    ) -> Tuple[Tree, jnp.ndarray, jnp.ndarray]:
        """``advance`` without the root evaluation: returns
        (tree, done[B], need_expand[B]) so a fused caller can batch the
        expansion eval of several advance/reset sites into one network
        call (the continuous actor's per-tick move phase).

        ``valid`` bool[B]: boards whose advance the caller will actually
        keep (the continuous move phase advances every board and merges
        only the ready ones). The fresh-root slot-0 fill — a scoring flood
        fill + board re-analysis, by far the most expensive piece — then
        runs under a batch-any cond over valid empty boards only, which
        skips it on the common all-reused-subtree boundary instead of
        paying it for hypothetical advances that get discarded."""
        b, m, a = tree.shape
        bar = jnp.arange(b)
        old_root_states = gather_nodes(tree, tree.root)
        stepped, done = self.engine.step(old_root_states, action)

        if self.config.tree_reuse:
            new_tree = promote_subtree(tree, action)
        else:
            # tree_reuse=False: discard the searched tree — every move
            # starts from a fresh root. Marking all boards empty routes
            # them through the existing fresh-root path below (slots >= 1
            # hold unreachable stale data, same invariant that path
            # already relies on).
            new_tree = tree.replace(
                node_count=jnp.zeros((b,), jnp.int32),
                root=jnp.zeros((b,), jnp.int32),
            )
        empty = new_tree.node_count == 0
        if valid is not None:
            # non-kept boards never need their slot-0 filled: their merged
            # tree is the OLD one (caller's `pick` drops this advance)
            empty = empty & valid
        # allocate slot 0 for boards with no inherited subtree
        new_tree = new_tree.replace(
            node_count=jnp.maximum(new_tree.node_count, 1)
        )
        root0 = jnp.zeros((b,), jnp.int32)

        def _fill_slot0(nt: Tree) -> Tree:
            # fresh slot-0 init for empty boards (stale data is possible)
            def clr(x, fill):
                return x.at[:, 0].set(jnp.where(empty, fill, x[:, 0]))

            term_winner = self.engine.winner(stepped)
            term_value = jnp.where(
                stepped.next_player == term_winner, 1.0, -1.0
            ).astype(jnp.float32)
            stepped_analysis = self.engine.analyze(stepped)
            stepped_legal = self.engine.legal_action_mask(
                stepped, stepped_analysis
            )

            nt = nt.replace(
                stats=nt.stats.at[:, 0].set(
                    jnp.where(empty[:, None], 0.0, nt.stats[:, 0])
                ),
                init_value=clr(nt.init_value, 0.0),
                expanded=clr(nt.expanded, False),
                terminal=nt.terminal.at[:, 0].set(
                    jnp.where(empty, done, nt.terminal[:, 0])
                ),
                terminal_value=nt.terminal_value.at[:, 0].set(
                    jnp.where(empty, term_value, nt.terminal_value[:, 0])
                ),
                parent=clr(nt.parent, NULL),
                parent_action=clr(nt.parent_action, NULL),
                edge_child=nt.edge_child.at[:, 0].set(
                    jnp.where(empty[:, None], NULL, nt.edge_child[:, 0])
                ),
                edge_prior=nt.edge_prior.at[:, 0].set(
                    jnp.where(empty[:, None], 0.0, nt.edge_prior[:, 0])
                ),
                legal=nt.legal.at[:, 0].set(
                    jnp.where(
                        empty[:, None], stepped_legal, nt.legal[:, 0]
                    )
                ),
                node_libs=nt.node_libs.at[:, 0].set(
                    jnp.where(
                        empty[:, None],
                        stepped_analysis.groups.stone_libs.astype(jnp.int16),
                        nt.node_libs[:, 0],
                    )
                ),
                node_size=nt.node_size.at[:, 0].set(
                    jnp.where(
                        empty[:, None],
                        stepped_analysis.groups.stone_size.astype(jnp.int16),
                        nt.node_size[:, 0],
                    )
                ),
                node_group=nt.node_group.at[:, 0].set(
                    jnp.where(
                        empty[:, None],
                        stepped_analysis.groups.labels.astype(jnp.int16),
                        nt.node_group[:, 0],
                    )
                ),
            )
            return write_node_states(nt, root0, stepped, empty)

        # the fill (scoring flood fill + re-analysis + a slot-0 pass over
        # every tree array) only runs when some kept board actually starts
        # from an unallocated child — with tree reuse on, most boundaries
        # promote an existing subtree and skip all of it
        new_tree = jax.lax.cond(
            jnp.any(empty), _fill_slot0, lambda nt: nt, new_tree
        )
        # keep inherited root states authoritative: the reused child's stored
        # state is identical to `stepped` (deterministic engine)
        need_expand = ~new_tree.expanded[bar, new_tree.root]
        return new_tree, done, need_expand
