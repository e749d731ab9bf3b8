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

        scale = jnp.sum(jnp.where(legal, policy, 0.0), axis=1, keepdims=True)
        prior = jnp.where(legal, policy, 0.0) / jnp.maximum(scale, 1e-12)

        do = need & ~tree.terminal[bar, root]
        dm = do[:, None]
        tree = tree.replace(
            edge_prior=tree.edge_prior.at[bar, root].set(
                jnp.where(dm, prior, tree.edge_prior[bar, root])
            ),
            legal=tree.legal.at[bar, root].set(
                jnp.where(dm, legal, tree.legal[bar, root])
            ),
            node_libs=tree.node_libs.at[bar, root].set(
                jnp.where(
                    dm, analysis.groups.stone_libs.astype(jnp.int16),
                    tree.node_libs[bar, root],
                )
            ),
            node_size=tree.node_size.at[bar, root].set(
                jnp.where(
                    dm, analysis.groups.stone_size.astype(jnp.int16),
                    tree.node_size[bar, root],
                )
            ),
            init_value=tree.init_value.at[bar, root].set(
                jnp.where(
                    do,
                    0.0 if self.child_init_zero else -value,
                    tree.init_value[bar, root],
                )
            ),
            expanded=tree.expanded.at[bar, root].set(
                do | tree.expanded[bar, root]
            ),
        )
        return tree

    # ------------------------------------------------------------------
    def _child_stats(self, tree: Tree, node: jnp.ndarray):
        """Per-action child stats of ``node`` int32[B], defaults for
        unallocated children (visits 0, ons 0, value_sum = parent's
        init_value, var 0)."""
        b = node.shape[0]
        bar = jnp.arange(b)
        child = tree.edge_child[bar, node]                  # [B, A]
        exists = child >= 0
        safe = jnp.where(exists, child, 0)
        st = tree.stats[bar[:, None], safe]               # [B, A, 5]
        cv = jnp.where(exists, st[..., VISIT], 0.0)
        cvs = jnp.where(
            exists, st[..., VSUM], tree.init_value[bar, node][:, None]
        )
        cons = jnp.where(exists, st[..., ONS], 0.0)
        cvar = jnp.where(exists, st[..., VVAR], 0.0)
        return child, exists, cv, cvs, cons, cvar

    def _ucb(self, tree: Tree, node: jnp.ndarray) -> jnp.ndarray:
        """float32[B, A] UCB scores; illegal actions -inf."""
        b = node.shape[0]
        bar = jnp.arange(b)
        _, _, cv, cvs, cons, cvar = self._child_stats(tree, node)
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
                      key) -> jnp.ndarray:
        """argmax UCB with uniform random tie-breaking
        (select_child, self_play.py:706-714)."""
        scores = self._ucb(tree, node)
        max_score = jnp.max(scores, axis=1, keepdims=True)
        is_max = scores >= max_score
        noise = jax.random.uniform(key, scores.shape)
        return jnp.argmax(
            jnp.where(is_max, noise, -1.0), axis=1
        ).astype(jnp.int32)

    # ------------------------------------------------------------------
    # Path-based updates: the descent records the visited node chain, so
    # every backup/incomplete/revert is ONE gather + ONE scatter over the
    # [B, D] path matrix instead of a depth-long while_loop of tiny scatter
    # kernels (the reference's per-node Python walks, self_play.py:758-774).
    # Path nodes are unique within a row (it's a tree path), so
    # gather-compute-scatter is exact.

    def _backup(self, tree: Tree, path: jnp.ndarray, leaf_pos: jnp.ndarray,
                value, active) -> Tree:
        """Backpropagate ``value`` (leaf's perspective) along ``path``
        (backpropagate, self_play.py:758-764), with Welford variance updates
        in WP mode (Node_V.value_mean_var, self_play.py:84-88)."""
        b, d = path.shape
        m = tree.stats.shape[1]
        bar = jnp.arange(b)[:, None]
        valid = (path >= 0) & active[:, None]
        safe = jnp.clip(path, 0, m - 1)               # for gathers
        # scatters route invalid slots out of bounds, where XLA drops them —
        # clipping would collide with node 0 (usually the root)
        scat = jnp.where(valid, path, m)
        t = jnp.arange(d)[None, :]
        sign = jnp.where((leaf_pos[:, None] - t) % 2 == 0, 1.0, -1.0)
        if not isinstance(value, jnp.ndarray):
            value = jnp.full((b,), value, jnp.float32)
        dv = sign * value[:, None]                    # node-local signed value

        st = tree.stats[bar, safe]                    # [B, D, 5] one gather
        vis_new = st[..., VISIT] + 1.0
        vs_new = st[..., VSUM] + dv
        if self.mode == SearchMode.WP:
            mean_new = vs_new / (vis_new + 1.0)
            var_new = st[..., VVAR] + (dv - st[..., VMEAN]) * (dv - mean_new)
        else:
            mean_new = st[..., VMEAN]
            var_new = st[..., VVAR]
        new_st = jnp.stack(
            [vis_new, vs_new, st[..., ONS], mean_new, var_new], axis=-1
        )
        return tree.replace(
            stats=tree.stats.at[bar, scat].set(new_st, mode="drop")
        )

    def _incomplete(self, tree: Tree, path: jnp.ndarray, active,
                    sign: float) -> Tree:
        """In-flight path marking: classic adds a (non-alternating) virtual
        loss to value_sum (self_play.py:514-532); WU/WP bump ``ons``
        (self_play.py:767-774)."""
        b, d = path.shape
        m = tree.stats.shape[1]
        bar = jnp.arange(b)[:, None]
        valid = (path >= 0) & active[:, None]
        scat = jnp.where(valid, path, m)              # OOB slots are dropped
        lane = VSUM if self.mode == SearchMode.CLASSIC else ONS
        delta = (
            sign * self.virtual_loss
            if self.mode == SearchMode.CLASSIC
            else sign * self.wu_loss
        )
        return tree.replace(
            stats=tree.stats.at[bar, scat, lane].add(delta, mode="drop")
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

    def _descend(self, tree: Tree, key, active: jnp.ndarray):
        """One leaf selection per board.

        Returns (tree, leaf_idx[B], needs_eval[B], path[B, D], leaf_pos[B],
        obs[B, h, w, C]) with terminal leaves already backed up and
        incomplete updates applied to eval leaves.
        """
        b, m, a = tree.shape
        bar = jnp.arange(b)
        dmax = self.max_depth

        def cond(carry):
            _, depth, moving, _, _ = carry
            return jnp.any(moving) & (depth < dmax - 1)

        def body(carry):
            cur, depth, moving, (sel_p, sel_a, sel_c), path = carry
            path = path.at[:, depth].set(jnp.where(moving, cur, NULL))
            k = jax.random.fold_in(key, depth)
            act = self._select_child(tree, cur, k)
            child = tree.edge_child[bar, cur, act]
            child_ok = child >= 0
            safe_child = jnp.where(child_ok, child, 0)
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
        # max_rounds guard keeps the move bounded regardless
        active = active & ~still_moving
        # walk length per board = number of recorded nodes; the leaf slots
        # in right after
        leaf_pos = jnp.sum(path >= 0, axis=1).astype(jnp.int32)
        leaf_pos = jnp.clip(leaf_pos, 0, dmax - 1)

        # env-step the selected edge using the parent's cached group stats
        # (selection only proposes legal actions, so no re-analysis)
        parent_states = gather_nodes(tree, par)
        par_libs = tree.node_libs[bar, par]
        par_size = tree.node_size[bar, par]
        stepped, done = self.engine.step_trusted(
            parent_states, act, par_libs, par_size
        )

        need_alloc = active & (existing < 0)
        new_idx = tree.node_count
        leaf = jnp.where(need_alloc, new_idx, jnp.where(active, existing, 0))
        safe_leaf = jnp.clip(leaf, 0, m - 1)

        # allocate: full slot initialisation (slots may hold stale data
        # after subtree compaction)
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
        leaf_analysis = self.engine.analyze(stepped)
        leaf_legal = self.engine.legal_action_mask(stepped, leaf_analysis)
        obs = self.encoder(stepped, leaf_analysis)

        tree = tree.replace(
            node_count=tree.node_count + al.astype(jnp.int32),
            stats=tree.stats.at[bar, safe_new].set(
                jnp.where(
                    al[:, None],
                    jnp.stack(
                        [
                            jnp.zeros_like(tree.init_value[bar, par]),
                            tree.init_value[bar, par],  # child-Q seed
                            jnp.zeros_like(tree.init_value[bar, par]),
                            jnp.zeros_like(tree.init_value[bar, par]),
                            jnp.zeros_like(tree.init_value[bar, par]),
                        ],
                        axis=-1,
                    ),
                    tree.stats[bar, safe_new],
                )
            ),
            init_value=tree.init_value.at[bar, safe_new].set(
                jnp.where(al, 0.0, tree.init_value[bar, safe_new])
            ),
            expanded=tree.expanded.at[bar, safe_new].set(
                jnp.where(al, False, tree.expanded[bar, safe_new])
            ),
            terminal=tree.terminal.at[bar, safe_new].set(
                jnp.where(al, done, tree.terminal[bar, safe_new])
            ),
            terminal_value=tree.terminal_value.at[bar, safe_new].set(
                jnp.where(al, term_value, tree.terminal_value[bar, safe_new])
            ),
            parent=tree.parent.at[bar, safe_new].set(
                jnp.where(al, par, tree.parent[bar, safe_new])
            ),
            parent_action=tree.parent_action.at[bar, safe_new].set(
                jnp.where(al, act, tree.parent_action[bar, safe_new])
            ),
            edge_child=tree.edge_child.at[bar, par, act].set(
                jnp.where(al, new_idx, tree.edge_child[bar, par, act])
            ),
        )
        # clear the new node's edge row + write legal set and group caches
        tree = tree.replace(
            edge_child=tree.edge_child.at[bar, safe_new].set(
                jnp.where(
                    al[:, None], NULL, tree.edge_child[bar, safe_new]
                )
            ),
            edge_prior=tree.edge_prior.at[bar, safe_new].set(
                jnp.where(al[:, None], 0.0, tree.edge_prior[bar, safe_new])
            ),
            legal=tree.legal.at[bar, safe_new].set(
                jnp.where(al[:, None], leaf_legal, tree.legal[bar, safe_new])
            ),
            node_libs=tree.node_libs.at[bar, safe_new].set(
                jnp.where(
                    al[:, None],
                    leaf_analysis.groups.stone_libs.astype(jnp.int16),
                    tree.node_libs[bar, safe_new],
                )
            ),
            node_size=tree.node_size.at[bar, safe_new].set(
                jnp.where(
                    al[:, None],
                    leaf_analysis.groups.stone_size.astype(jnp.int16),
                    tree.node_size[bar, safe_new],
                )
            ),
        )
        tree = write_node_states(tree, safe_new, stepped, al)

        # complete the path with the leaf
        path = path.at[bar, leaf_pos].set(
            jnp.where(active, safe_leaf, NULL)
        )

        # terminal leaves: back up the true outcome now (self_play.py:638-642)
        is_term = active & tree.terminal[bar, safe_leaf]
        tv = tree.terminal_value[bar, safe_leaf]
        tree = self._backup(tree, path, leaf_pos, tv, is_term)

        needs_eval = active & ~is_term
        tree = self._incomplete(tree, path, needs_eval, +1.0)
        return tree, safe_leaf, needs_eval, path, leaf_pos, obs

    # ------------------------------------------------------------------
    def _complete(self, tree: Tree, leaf, needs, policy, value, path,
                  leaf_pos) -> Tree:
        """complete_update / incorporate_results (self_play.py:727-755)."""
        b, m, a = tree.shape
        bar = jnp.arange(b)
        already = tree.expanded[bar, leaf]
        do = needs & ~already

        # reverts: WP/classic revert along the path regardless of duplicate
        # status (self_play.py:653, 406); WU leaks ons on duplicates
        # (self_play.py:252-253)
        revert_mask = needs if self.mode != SearchMode.WU else do
        tree = self._incomplete(tree, path, revert_mask, -1.0)

        legal = tree.legal[bar, leaf]
        scale = jnp.sum(jnp.where(legal, policy, 0.0), axis=1)
        ok = scale > 0
        prior = jnp.where(legal, policy, 0.0) / jnp.maximum(
            scale[:, None], 1e-12
        )
        setp = do & ok
        tree = tree.replace(
            edge_prior=tree.edge_prior.at[bar, leaf].set(
                jnp.where(setp[:, None], prior, tree.edge_prior[bar, leaf])
            ),
            init_value=tree.init_value.at[bar, leaf].set(
                jnp.where(
                    setp,
                    0.0 if self.child_init_zero else -value,
                    tree.init_value[bar, leaf],
                )
            ),
            expanded=tree.expanded.at[bar, leaf].set(
                do | tree.expanded[bar, leaf]
            ),
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

        def descend_body(tree, i):
            tree, leaf, need, path, leaf_pos, obs = self._descend(
                tree, jax.random.fold_in(key, i), active
            )
            return tree, (leaf, need, path, leaf_pos, obs)

        tree, (leaf_t, need_t, path_t, pos_t, obs_t) = jax.lax.scan(
            descend_body, tree, jnp.arange(self.readouts)
        )                                           # *_t: [L, B, ...]

        # batched evaluation of all leaves across all boards (observations
        # were produced during the descents — no re-gather, no re-analysis)
        obs = obs_t.reshape((self.readouts * b,) + obs_t.shape[2:])
        flat_leaf = leaf_t.reshape(-1)              # L-major
        rep = jnp.tile(jnp.arange(b), self.readouts)
        to_play = tree.states.next_player[rep, flat_leaf]
        policy, value = eval_fn(obs, to_play)
        policy_t = policy.reshape(self.readouts, b, -1)
        value_t = value.reshape(self.readouts, b)

        def complete_body(tree, x):
            leaf, need, pol, val, path, leaf_pos = x
            return (
                self._complete(tree, leaf, need, pol, val, path, leaf_pos),
                None,
            )

        tree, _ = jax.lax.scan(
            complete_body, tree,
            (leaf_t, need_t, policy_t, value_t, path_t, pos_t),
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
        return tree.replace(
            edge_prior=tree.edge_prior.at[bar, tree.root].set(mixed)
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
            tree.stats[
                bar[:, None], jnp.where(exists, child, 0), VISIT
            ].astype(jnp.int32),
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
            temp = 0.65 + (1.0 - 0.65) * jnp.exp(-step / 10.0)
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
        self, tree: Tree, action: jnp.ndarray
    ) -> Tuple[Tree, jnp.ndarray, jnp.ndarray]:
        """``advance`` without the root evaluation: returns
        (tree, done[B], need_expand[B]) so a fused caller can batch the
        expansion eval of several advance/reset sites into one network
        call (the continuous actor's per-tick move phase)."""
        b, m, a = tree.shape
        bar = jnp.arange(b)
        old_root_states = gather_nodes(tree, tree.root)
        stepped, done = self.engine.step(old_root_states, action)

        new_tree = promote_subtree(tree, action)
        empty = new_tree.node_count == 0
        # allocate slot 0 for boards with no inherited subtree
        new_tree = new_tree.replace(
            node_count=jnp.maximum(new_tree.node_count, 1)
        )
        root0 = jnp.zeros((b,), jnp.int32)
        # fresh slot-0 init for empty boards (stale data is possible)
        def clr(x, fill):
            return x.at[:, 0].set(jnp.where(empty, fill, x[:, 0]))

        term_winner = self.engine.winner(stepped)
        term_value = jnp.where(
            stepped.next_player == term_winner, 1.0, -1.0
        ).astype(jnp.float32)
        stepped_analysis = self.engine.analyze(stepped)
        stepped_legal = self.engine.legal_action_mask(stepped, stepped_analysis)

        new_tree = new_tree.replace(
            stats=new_tree.stats.at[:, 0].set(
                jnp.where(empty[:, None], 0.0, new_tree.stats[:, 0])
            ),
            init_value=clr(new_tree.init_value, 0.0),
            expanded=clr(new_tree.expanded, False),
            terminal=new_tree.terminal.at[:, 0].set(
                jnp.where(empty, done, new_tree.terminal[:, 0])
            ),
            terminal_value=new_tree.terminal_value.at[:, 0].set(
                jnp.where(empty, term_value, new_tree.terminal_value[:, 0])
            ),
            parent=clr(new_tree.parent, NULL),
            parent_action=clr(new_tree.parent_action, NULL),
            edge_child=new_tree.edge_child.at[:, 0].set(
                jnp.where(empty[:, None], NULL, new_tree.edge_child[:, 0])
            ),
            edge_prior=new_tree.edge_prior.at[:, 0].set(
                jnp.where(empty[:, None], 0.0, new_tree.edge_prior[:, 0])
            ),
            legal=new_tree.legal.at[:, 0].set(
                jnp.where(empty[:, None], stepped_legal, new_tree.legal[:, 0])
            ),
            node_libs=new_tree.node_libs.at[:, 0].set(
                jnp.where(
                    empty[:, None],
                    stepped_analysis.groups.stone_libs.astype(jnp.int16),
                    new_tree.node_libs[:, 0],
                )
            ),
            node_size=new_tree.node_size.at[:, 0].set(
                jnp.where(
                    empty[:, None],
                    stepped_analysis.groups.stone_size.astype(jnp.int16),
                    new_tree.node_size[:, 0],
                )
            ),
        )
        new_tree = write_node_states(new_tree, root0, stepped, empty)
        # keep inherited root states authoritative: the reused child's stored
        # state is identical to `stepped` (deterministic engine)
        need_expand = ~new_tree.expanded[bar, new_tree.root]
        return new_tree, done, need_expand
