"""Array-based search-tree storage with subtree promotion.

The reference represents trees as Python object graphs (``Node_M``/``Node_V``,
self_play.py:12-95) and walks them per-simulation on the host — the UCB child
loop is its CPU hot spot (SURVEY.md section 3.2). Here a tree is a struct of
fixed-shape arrays with a leading batch dimension: B independent games each
own M node slots, and every tree operation (selection, expansion, backup,
re-rooting) is a batched gather/scatter that XLA compiles onto the TPU.

Node statistics cover all three reference node types:
``visit``/``value_sum`` (Node_M, self_play.py:12-48), ``ons`` for WU-UCT
incomplete updates (self_play.py:21), ``value_mean``/``value_var`` Welford
tracking for WP-MCTS (Node_V, self_play.py:84-88). Children live on edges:
``edge_prior``/``edge_child`` replace each node's ``children`` dict, and
``init_value`` implements the reference's child-Q initialisation to minus the
parent's evaluated value (self_play.py:29-36, 271).

Tree reuse across moves (``update_with_action``, self_play.py:857-872)
becomes :func:`promote_subtree`: mark the chosen child's subtree via
pointer-jumping reachability, then compact it to the front of the arrays.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
from flax import struct

from transgo_tpu.ops.state import GoState

NULL = -1  # no child / no parent sentinel

# lanes of the packed per-node statistics array `stats` [B, M, NUM_STATS]:
# packing lets every backup / incomplete-update / UCB read touch ONE
# gather/scatter instead of five — TPU scatters are the search's hot spot
VISIT, VSUM, ONS, VMEAN, VVAR = range(5)
NUM_STATS = 5


@struct.dataclass
class Tree:
    # packed per-node statistics float32 [B, M, NUM_STATS]:
    #   VISIT total_visit_count, VSUM value_sum, ONS WU-UCT unobserved
    #   samples, VMEAN/VVAR Welford tracking (WP). Visit counts stored as
    #   float32 (exact for any realistic count).
    stats: jnp.ndarray
    init_value: jnp.ndarray   # float32 child value_sum seed (-eval value)
    expanded: jnp.ndarray     # bool  real_expanded
    terminal: jnp.ndarray     # bool  node state is game-over
    terminal_value: jnp.ndarray  # float32 true outcome from node player's view
    parent: jnp.ndarray       # int32 [B, M]
    parent_action: jnp.ndarray  # int32 [B, M]
    # per-edge [B, M, A]
    edge_prior: jnp.ndarray   # float32
    edge_child: jnp.ndarray   # int32 node index or NULL
    legal: jnp.ndarray        # bool legal actions at the node
    # cached per-stone group stats of the node's position [B, M, n] int16 —
    # liberties, sizes, and group ids (min coordinate, == Block.start) let
    # the search step an edge with no re-analysis and no reachability pass
    node_libs: jnp.ndarray
    node_size: jnp.ndarray
    node_group: jnp.ndarray
    # embedded env states, batch shape [B, M]
    states: GoState
    # bookkeeping [B]
    node_count: jnp.ndarray   # int32 allocation pointer
    root: jnp.ndarray         # int32 root node index
    # telemetry [B]: descents that hit the static search_max_depth bound and
    # sat their round out (cumulative over the tree's lifetime; survives
    # subtree promotion so the runtime can report a per-chunk rate)
    depth_capped: jnp.ndarray  # int32

    @property
    def shape(self) -> Tuple[int, int, int]:
        return self.edge_prior.shape  # (B, M, A)

    # convenience read-only views (cold paths / tests; hot code gathers
    # `stats` once and slices lanes)
    @property
    def visit(self) -> jnp.ndarray:
        return self.stats[..., VISIT].astype(jnp.int32)

    @property
    def value_sum(self) -> jnp.ndarray:
        return self.stats[..., VSUM]

    @property
    def ons(self) -> jnp.ndarray:
        return self.stats[..., ONS]

    @property
    def value_mean(self) -> jnp.ndarray:
        return self.stats[..., VMEAN]

    @property
    def value_var(self) -> jnp.ndarray:
        return self.stats[..., VVAR]


def init_tree(batch: int, max_nodes: int, num_actions: int,
              board_size: int) -> Tree:
    b, m, a = batch, max_nodes, num_actions
    n = board_size * board_size
    return Tree(
        stats=jnp.zeros((b, m, NUM_STATS), jnp.float32),
        init_value=jnp.zeros((b, m), jnp.float32),
        expanded=jnp.zeros((b, m), bool),
        terminal=jnp.zeros((b, m), bool),
        terminal_value=jnp.zeros((b, m), jnp.float32),
        parent=jnp.full((b, m), NULL, jnp.int32),
        parent_action=jnp.full((b, m), NULL, jnp.int32),
        edge_prior=jnp.zeros((b, m, a), jnp.float32),
        edge_child=jnp.full((b, m, a), NULL, jnp.int32),
        legal=jnp.zeros((b, m, a), bool),
        node_libs=jnp.zeros((b, m, n), jnp.int16),
        node_size=jnp.zeros((b, m, n), jnp.int16),
        node_group=jnp.full((b, m, n), -1, jnp.int16),
        states=GoState.new((b, m), board_size),
        node_count=jnp.zeros((b,), jnp.int32),
        root=jnp.zeros((b,), jnp.int32),
        depth_capped=jnp.zeros((b,), jnp.int32),
    )


def row_get(src: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``src[b, idx[b]]`` for src [B, M, ...] — via a flat whole-row gather.

    ``src[bar, idx]`` / take_along_axis with broadcast indices lower to
    per-element gathers that run ~2 orders of magnitude below HBM bandwidth
    on TPU (measured in promote_subtree: 300ms vs 2ms); flattening
    (board, slot) into one row axis makes XLA move contiguous rows.
    """
    b, mdim = src.shape[:2]
    rows = jnp.arange(b) * mdim + jnp.clip(idx, 0, mdim - 1)
    return src.reshape((b * mdim,) + src.shape[2:])[rows]


def row_set(dst: jnp.ndarray, idx: jnp.ndarray, src: jnp.ndarray,
            mask=None) -> jnp.ndarray:
    """``dst[b, idx[b]] = src[b]`` (where mask) — flat whole-row scatter."""
    b, mdim = dst.shape[:2]
    rows = jnp.arange(b) * mdim + jnp.clip(idx, 0, mdim - 1)
    if mask is not None:
        rows = jnp.where(mask, rows, b * mdim)  # OOB -> dropped
    flat = dst.reshape((b * mdim,) + dst.shape[2:])
    return flat.at[rows].set(src, mode="drop").reshape(dst.shape)


def onehot_rows(src: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """``src[b, idx[b, k]]`` for src [B, M, K] and idx [B, A] -> [B, A, K],
    as a one-hot f32 MXU matmul.

    The native lowering of ``src[bar[:, None], idx]`` is a per-element
    gather that runs ~8x slower than the MXU form at search shapes
    (measured 195us vs 25us for [256, 484, 5] x [256, 82] on one chip).
    Precision HIGHEST keeps it bit-exact: each output row has exactly one
    nonzero term, and an f32x3-pass multiply of 1.0 is lossless, whereas
    the DEFAULT bf16 passes would truncate the gathered values.
    Out-of-range (negative) indices yield all-zero rows.
    """
    m = src.shape[1]
    oh = (
        idx[:, :, None] == jnp.arange(m, dtype=idx.dtype)[None, None, :]
    ).astype(jnp.float32)
    return jax.lax.dot_general(
        oh, src, (((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32,
    )


def gather_nodes(tree: Tree, idx: jnp.ndarray) -> GoState:
    """Pull one env state per board: idx int32[B] -> GoState[B, ...].

    Kept in ``x[bar, idx]`` form on purpose: this runs inside descent/backup
    loop bodies, where the flat-row reshape formulation (row_get) blows up
    XLA:TPU compile time (observed: play_move compile went from ~3 min to
    >10 min). The payload is one row per board, small enough that the
    element-gather path costs ~1.5 ms.
    """
    b = idx.shape[0]
    bar = jnp.arange(b)
    return jax.tree_util.tree_map(lambda x: x[bar, idx], tree.states)


def write_node_states(tree: Tree, idx: jnp.ndarray, states: GoState,
                      mask: jnp.ndarray, onehot=None) -> Tree:
    """Write per-board env states into node slots where mask holds.

    With ``onehot`` (bool[B, M], one row per board pre-masked), each state
    array is rewritten by one fused select pass — the cheap form for loop
    bodies (computed-index scatters lower to sort-based kernels on TPU).
    Without it, falls back to the per-element scatter form.
    """
    b = idx.shape[0]
    bar = jnp.arange(b)

    if onehot is not None:
        def upd(dst, src):
            oh = onehot.reshape(
                onehot.shape + (1,) * (dst.ndim - onehot.ndim)
            )
            return jnp.where(oh, src[:, None] if src.ndim == 1
                             else src[:, None, ...], dst)
    else:
        def upd(dst, src):
            cur = dst[bar, idx]
            m = mask.reshape(mask.shape + (1,) * (src.ndim - mask.ndim))
            return dst.at[bar, idx].set(jnp.where(m, src, cur))

    return tree.replace(
        states=jax.tree_util.tree_map(upd, tree.states, states)
    )


def subtree_mask(tree: Tree, new_root: jnp.ndarray) -> jnp.ndarray:
    """bool[B, M]: nodes whose ancestor chain reaches ``new_root``.

    Pointer-jumping on parent links: O(log M) gathers instead of a
    per-node walk.
    """
    b, m, _ = tree.shape
    bar = jnp.arange(b)[:, None]
    idx = jnp.arange(m)[None, :]
    alive = idx < tree.node_count[:, None]

    inside = (idx == new_root[:, None]) & alive
    # parent of unallocated/root slots -> self loop
    p = jnp.where(tree.parent >= 0, tree.parent, idx)
    hops = max(1, (m - 1).bit_length())
    # pointer-jump with one-hot matvecs on the MXU: take_along_axis on
    # [B, M] lowers to a per-element gather that measured 7+ ms per move at
    # B=256/M=164 for these 2x8 hops; the matmul form is <1 ms (one-term
    # sums against {0, 1} are exact, and indices <= M fit f32 exactly)
    for _ in range(hops):
        ohp = (
            p[:, :, None] == idx[:, None, :]
        ).astype(jnp.float32)                          # [B, M(i), M(src)]
        inside = inside | (
            jnp.einsum(
                "bim,bm->bi", ohp, inside.astype(jnp.float32),
                preferred_element_type=jnp.float32,
            )
            > 0.5
        )
        p = jnp.einsum(
            "bim,bm->bi", ohp, p.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
    return inside & alive


def promote_subtree(tree: Tree, action: jnp.ndarray) -> Tree:
    """Re-root each board's tree at ``edge_child[root, action]`` and compact.

    Boards whose chosen child was never allocated get an empty tree
    (node_count == 0); the caller must then allocate + expand a fresh root
    (reference update_with_action's unexpanded-child branch,
    self_play.py:861-871).
    """
    b, m, a = tree.shape
    bar = jnp.arange(b)
    child = tree.edge_child[bar, tree.root, action]          # [B]
    has_child = child >= 0
    safe_child = jnp.where(has_child, child, 0)

    keep = subtree_mask(tree, safe_child) & has_child[:, None]
    # dense renumbering: kept nodes pack to the front, order preserved
    new_idx = jnp.cumsum(keep.astype(jnp.int32), axis=1) - 1   # [B, M]
    new_idx = jnp.where(keep, new_idx, NULL)
    new_count = keep.sum(axis=1).astype(jnp.int32)

    # scatter-position per old node (into slot new_idx); use a gather-based
    # permutation instead: for each new slot j, which old node lands there?
    # old_of_new[j] = index of the j-th kept node
    order = jnp.argsort(
        jnp.where(keep, new_idx, m + jnp.arange(m)[None, :]), axis=1
    )                                                         # [B, M]

    # TPU-friendly row permutation: one-hot MATMUL on the MXU. Per-node rows
    # here are tiny (82 f32 / 81 int16 / 81 int8), which is the worst case
    # for every gather formulation — measured 15 ms per move at B=256 for
    # the flat whole-row gather this replaces, vs <1 ms as a batched
    # [M, M] @ [M, K] matmul. Exactness: each output row is a one-term sum
    # of f32 products against {0.0, 1.0}, and every integer payload fits
    # f32's exact range (indices <= M, coords <= n), so round-tripping
    # through f32 is lossless.
    ohf = (
        order[:, :, None] == jnp.arange(m, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.float32)                                     # [B, Mnew, Mold]

    def take(x):
        if x.ndim == 2:
            return (
                jnp.einsum(
                    "bnm,bm->bn", ohf, x.astype(jnp.float32),
                    preferred_element_type=jnp.float32,
                )
                .astype(x.dtype)
            )
        extra = x.shape[2:]
        k = 1
        for dsz in extra:
            k *= dsz
        y = jnp.matmul(
            ohf, x.reshape(b, m, k).astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        return y.astype(x.dtype).reshape((b, m) + extra)

    def remap2(ptr):  # [B, M] old node index -> new index, NULL passthrough
        # one-hot matvec (exact; see `take`): encode new_idx + 1 so both
        # "ptr is NULL" and "target not kept" decode to NULL via zero sums
        oh = (
            (ptr[:, :, None]
             == jnp.arange(m, dtype=jnp.int32)[None, None, :])
            & (ptr >= 0)[:, :, None]
        ).astype(jnp.float32)
        enc = jnp.where(new_idx >= 0, new_idx + 1, 0).astype(jnp.float32)
        return (
            jnp.einsum(
                "bim,bm->bi", oh, enc, preferred_element_type=jnp.float32
            ).astype(jnp.int32)
            - 1
        )

    new_parent = remap2(take(tree.parent))
    new_parent_action = take(tree.parent_action)

    # Rebuild child pointers from the permuted parent links instead of
    # remapping all M*A edges (the remap gather was the old hot spot):
    # edge_child[p, a] = j  iff  parent[j] = p and parent_action[j] = a —
    # the allocation invariant (_descend) makes (p, a) unique per j. As a
    # matmul (same reasoning as `take`): encode j+1 so empty cells' zero
    # sums decode to NULL.
    j_ids = jnp.broadcast_to(
        jnp.arange(m, dtype=jnp.int32)[None, :], (b, m)
    )
    valid = (new_parent >= 0) & (j_ids < new_count[:, None])
    parent_oh = (
        (new_parent[:, :, None]
         == jnp.arange(m, dtype=jnp.int32)[None, None, :])
        & valid[:, :, None]
    ).astype(jnp.float32)                                     # [B, Mj, Mp]
    act_j = (
        new_parent_action[:, :, None]
        == jnp.arange(a, dtype=jnp.int32)[None, None, :]
    ).astype(jnp.float32) * (j_ids + 1)[:, :, None].astype(jnp.float32)
    new_edge_child = (
        jnp.einsum(
            "bjp,bja->bpa", parent_oh, act_j,
            preferred_element_type=jnp.float32,
        ).astype(jnp.int32)
        - 1
    )

    new_tree = Tree(
        stats=take(tree.stats),
        init_value=take(tree.init_value),
        expanded=take(tree.expanded) & (jnp.arange(m)[None, :] < new_count[:, None]),
        terminal=take(tree.terminal),
        terminal_value=take(tree.terminal_value),
        parent=new_parent,
        parent_action=new_parent_action,
        edge_prior=take(tree.edge_prior),
        edge_child=new_edge_child,
        legal=take(tree.legal),
        node_libs=take(tree.node_libs),
        node_size=take(tree.node_size),
        node_group=take(tree.node_group),
        states=jax.tree_util.tree_map(take, tree.states),
        node_count=new_count,
        root=jnp.zeros((b,), jnp.int32),
        depth_capped=tree.depth_capped,
    )
    # new root has no parent
    new_tree = new_tree.replace(
        parent=new_tree.parent.at[:, 0].set(NULL),
        parent_action=new_tree.parent_action.at[:, 0].set(NULL),
    )
    return new_tree
